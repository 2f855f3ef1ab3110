"""Spark engine ↔ pure-oracle parity for extraction, comparison and
diff paths over the golden payloads (tabular embedding, FIXTURES.md
§B.4) plus seeded randomized requests.

Engine hashes are fetched through Spark itself (hash_lookup_via_spark)
so the oracle's feature vectors are bit-for-bit the engine's
(SURVEY.md §7 hard part (d)). Set canonicalization uses the engine rule
(canonical="features") on both sides; reference-exact Erlang ordering
is covered by tests/test_golden.py.
"""

import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from feat_spark.functions.hashing import hash_lookup_via_spark
from feat_spark.operators.compare import compare_frames, compare_value, DIFFERENCE
from feat_spark.operators.extract import extract, extract_value
from feat_spark.operators.paths import list_diff_fields
from feat_spark.schema import RESERVED, SetSchema, UnionSchema, is_accessor, is_nested

from fixtures_golden import OTHER_REQUEST, REQUEST, SCHEMA

ELEM_T = T.StructType(
    [
        T.StructField("meta", T.StructType([T.StructField("type", T.StringType())])),
        T.StructField("21", T.StringType()),
        T.StructField(
            "31", T.ArrayType(T.StructType([T.StructField("311", T.StringType())]))
        ),
        T.StructField(
            "41",
            T.StructType(
                [
                    T.StructField("411", T.ArrayType(T.StringType())),
                    T.StructField("412", T.StringType()),
                ]
            ),
        ),
        T.StructField("common_value", T.StringType()),
        T.StructField("common_value_2", T.StringType()),
        T.StructField("unused", T.LongType()),
    ]
)
PAYLOAD_T = T.StructType([T.StructField("1", T.ArrayType(ELEM_T))])

ROW_T = T.StructType(
    [T.StructField("req_id", T.StringType()), T.StructField("payload", PAYLOAD_T)]
)

LEAF_VALUES = [
    "common", "common_2", "other_common_2", "a_21", "a_21_other",
    "b_311_1", "b_311_2", "b_311_1_other", "b_311_2_other",
    "c_412", "c_412_other", "x1", "x2", "x3",
]


@pytest.fixture(scope="module")
def hash_fn(spark):
    lookup = hash_lookup_via_spark(spark, LEAF_VALUES)
    return lambda v: lookup[v]


def _frame(spark, requests):
    rows = [(f"r{i}", req) for i, req in enumerate(requests)]
    return spark.createDataFrame(rows, schema=ROW_T)


def _to_python(schema, value):
    """Collected Spark feature value → the oracle's python encoding."""
    if value is None:
        return None
    if is_accessor(schema):
        return value
    if is_nested(schema):
        return _to_python(schema[1], value)
    if isinstance(schema, SetSchema):
        return [[e["idx"], _to_python(schema.inner, e["f"])] for e in value]
    if isinstance(schema, UnionSchema):
        fid = value["variant"]
        if fid is None:
            return None
        inner: dict = {}
        for _v, spec in schema.variants.items():
            if isinstance(spec, tuple) and len(spec) == 2 and spec[0] == fid and isinstance(spec[1], dict):
                inner.update(spec[1])
        return [
            fid,
            {
                f: _to_python(e, value[f"v{fid}"][f"f{f}"])
                for f, e in sorted(inner.items())
                if e is not RESERVED
            },
        ]
    if isinstance(schema, dict):
        return {
            fid: _to_python(e, value[f"f{fid}"])
            for fid, e in sorted(schema.items())
            if e is not RESERVED
        }
    raise AssertionError(schema)


def test_spark_extract_matches_oracle_on_golden(spark, hash_fn):
    df = _frame(spark, [REQUEST, OTHER_REQUEST])
    out = extract(df, SCHEMA, "payload", "features").orderBy("req_id").collect()
    for row, req in zip(out, [REQUEST, OTHER_REQUEST]):
        got = _to_python(SCHEMA, row["features"].asDict(recursive=True))
        want = extract_value(SCHEMA, req, hash_fn=hash_fn, canonical="features")
        assert got == want, f"mismatch for {row['req_id']}"


def test_spark_compare_matches_oracle_on_golden(spark, hash_fn):
    new = extract(_frame(spark, [REQUEST]), SCHEMA, "payload", "features")
    old = extract(_frame(spark, [OTHER_REQUEST]), SCHEMA, "payload", "features")
    got = compare_frames(new, old, SCHEMA, on="req_id").collect()[0]

    f_new = extract_value(SCHEMA, REQUEST, hash_fn=hash_fn, canonical="features")
    f_old = extract_value(SCHEMA, OTHER_REQUEST, hash_fn=hash_fn, canonical="features")
    diff = compare_value(f_new, f_old)
    assert got["equal"] == (diff == {} or diff == DIFFERENCE and False)
    assert got["diff_total"] == (diff == DIFFERENCE)
    want_paths = list_diff_fields(SCHEMA, diff)
    got_paths = got["diff_paths"] if got["diff_paths"] is None else list(got["diff_paths"])
    assert got_paths == (None if want_paths == "all" else want_paths)


def test_spark_compare_reflexive(spark):
    feats = extract(_frame(spark, [REQUEST]), SCHEMA, "payload", "features")
    row = compare_frames(feats, feats, SCHEMA, on="req_id").collect()[0]
    assert row["equal"] and not row["diff_total"] and row["diff_paths"] is None


def test_spark_compare_asymmetric_undefined(spark):
    """New side adds common_value → no conflict; reversed direction
    conflicts (feat.erl:278-289)."""
    base = {"1": [{"meta": {"type": "a"}, "21": "a_21"}]}
    richer = {"1": [{"meta": {"type": "a"}, "21": "a_21", "common_value": "common"}]}
    f_base = extract(_frame(spark, [base]), SCHEMA, "payload", "features")
    f_rich = extract(_frame(spark, [richer]), SCHEMA, "payload", "features")
    fwd = compare_frames(f_rich, f_base, SCHEMA, on="req_id").collect()[0]
    assert fwd["equal"]
    rev = compare_frames(f_base, f_rich, SCHEMA, on="req_id").collect()[0]
    assert not rev["equal"]


def _random_request(rng: random.Random):
    variants = ["a", "a_other", "A", "b", "c", "unchanged", "zzz-unknown", None]
    elems = []
    for _ in range(rng.randint(0, 5)):
        variant = rng.choice(variants)
        elem: dict = {}
        if variant is not None:
            elem["meta"] = {"type": variant}
        if rng.random() < 0.7:
            elem["21"] = rng.choice(["a_21", "a_21_other", "x1"])
        if rng.random() < 0.5:
            elem["31"] = [
                {"311": rng.choice(["b_311_1", "b_311_2", "b_311_2_other", None])}
                for _ in range(rng.randint(0, 3))
            ]
        if rng.random() < 0.5:
            elem["41"] = {
                "411": [],
                "412": rng.choice(["c_412", "c_412_other", None]),
            }
        if rng.random() < 0.6:
            elem["common_value"] = rng.choice(["common", "x2"])
        if rng.random() < 0.4:
            elem["common_value_2"] = rng.choice(["common_2", "x3"])
        elems.append(elem)
    return {"1": elems} if rng.random() < 0.9 else {}


def test_spark_extract_and_compare_randomized(spark, hash_fn):
    """Seeded fuzz (mirrors the reference's PropEr harness intent,
    /root/reference/rebar.config:57-59): engine == oracle on extraction,
    verdicts and diff paths across random nested requests, including
    unknown variants, missing discriminators, empty sets and null leaves."""
    rng = random.Random(42)
    reqs_new = [_random_request(rng) for _ in range(40)]
    reqs_old = [_random_request(rng) for _ in range(40)]

    # drop leaf values the lookup doesn't know (None inside 311 arrays ok)
    new_df = extract(_frame(spark, reqs_new), SCHEMA, "payload", "features")
    old_df = extract(_frame(spark, reqs_old), SCHEMA, "payload", "features")

    got_new = {r["req_id"]: r["features"] for r in new_df.collect()}
    for i, req in enumerate(reqs_new):
        got = got_new[f"r{i}"]
        got = None if got is None else _to_python(SCHEMA, got.asDict(recursive=True))
        want = extract_value(SCHEMA, req, hash_fn=hash_fn, canonical="features")
        assert got == want, f"extract mismatch on request {i}: {req}"

    rows = {
        r["req_id"]: r
        for r in compare_frames(new_df, old_df, SCHEMA, on="req_id").collect()
    }
    for i, (rn, ro) in enumerate(zip(reqs_new, reqs_old)):
        fn = extract_value(SCHEMA, rn, hash_fn=hash_fn, canonical="features")
        fo = extract_value(SCHEMA, ro, hash_fn=hash_fn, canonical="features")
        diff = compare_value(fn, fo)
        row = rows[f"r{i}"]
        want_equal = isinstance(diff, dict) and len(diff) == 0
        assert row["equal"] == want_equal, f"verdict mismatch on pair {i}"
        if not want_equal:
            want = list_diff_fields(SCHEMA, diff)
            got = row["diff_paths"] if row["diff_paths"] is None else list(row["diff_paths"])
            assert got == (None if want == "all" else want), f"paths mismatch on pair {i}"
