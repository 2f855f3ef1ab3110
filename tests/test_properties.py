"""Property-based invariants of the reference core — the hypothesis
twin of the reference's PropEr harness (`/root/reference/rebar.config:
57-59` wires `rebar3 proper` with 1000 cases; the prop module itself is
absent from the snapshot, so these encode the library's documented
contracts):

  * reflexivity: compare(x, x) is True for any extracted features
  * set order-insensitivity: shuffling a set's input order leaves
    canonical features identical (feat.erl:128-141)
  * asymmetric missing-data: ADDING fields to the new request is never
    a conflict; REMOVING a read field always is (feat.erl:278-289)
  * path consistency: equal ⇒ no diff paths; any reported path is a
    dot-joined request-key chain

Pure driver-side Python (no SparkSession) — runs in milliseconds, so
hypothesis can afford hundreds of cases.
"""

from __future__ import annotations

import random

from hypothesis import given, settings, strategies as st

from feat_spark.operators.compare import DIFFERENCE, compare
from feat_spark.operators.extract import extract_value
from feat_spark.operators.paths import list_diff_fields
from feat_spark.schema import SetSchema, UnionSchema

# ---- generators ------------------------------------------------------

_KEYS = ["a", "b", "c", "meta", "type", "v"]
_leaf = st.one_of(st.integers(-5, 5), st.text("xyz", max_size=3), st.none())


@st.composite
def schema_request(draw, depth: int = 2):
    """A (map_schema, request) pair: feature ids -> accessors/sets/unions
    with a request that sometimes has the fields, sometimes not."""
    n = draw(st.integers(1, 4))
    schema: dict = {}
    request: dict = {}
    for fid in range(n):
        kind = draw(st.sampled_from(["leaf", "set", "union", "nested"]))
        key = f"k{fid}"
        if kind == "leaf":
            schema[fid] = key
            if draw(st.booleans()):
                request[key] = draw(_leaf)
        elif kind == "nested":
            schema[fid] = ([key, "in"], {99: "x"})
            if draw(st.booleans()):
                request[key] = {"in": {"x": draw(_leaf)}}
        elif kind == "set":
            inner = {0: "v", 1: "w"}
            schema[fid] = (key, SetSchema(inner))
            if draw(st.booleans()):
                request[key] = [
                    {"v": draw(_leaf), "w": draw(_leaf)}
                    for _ in range(draw(st.integers(0, 4)))
                ]
        else:
            schema[fid] = (
                key,
                UnionSchema(["type"], {"t1": (11, {0: "p"}), "t2": (12, {0: "q"})}),
            )
            if draw(st.booleans()):
                t = draw(st.sampled_from(["t1", "t2", "zz"]))
                request[key] = {"type": t, "p": draw(_leaf), "q": draw(_leaf)}
    return schema, request


# ---- properties ------------------------------------------------------

@settings(max_examples=200, deadline=None)
@given(schema_request())
def test_compare_is_reflexive(sr):
    schema, request = sr
    f = extract_value(schema, request)
    assert compare(f, f) is True


@settings(max_examples=200, deadline=None)
@given(schema_request(), st.randoms(use_true_random=False))
def test_set_order_insensitive(sr, rng):
    schema, request = sr
    shuffled = dict(request)
    for k, v in request.items():
        if isinstance(v, list):
            vv = list(v)
            rng.shuffle(vv)
            shuffled[k] = vv
    a = extract_value(schema, request)
    b = extract_value(schema, shuffled)
    # set features carry the ORIGINAL index (input-order-dependent by
    # design, feat.erl:128-141); canonical VALUE order and idempotency
    # verdict are what shuffling must not change.
    assert _strip_idx(a) == _strip_idx(b)
    assert compare(a, b) is True


def _strip_idx(feats):
    if isinstance(feats, dict):
        return {k: _strip_idx(v) for k, v in feats.items()}
    if isinstance(feats, list) and all(
        isinstance(e, list) and len(e) == 2 and isinstance(e[0], int) for e in feats
    ):
        return [_strip_idx(e[1]) for e in feats]
    return feats


@settings(max_examples=200, deadline=None)
@given(schema_request())
def test_adding_fields_to_new_is_never_a_conflict(sr):
    schema, request = sr
    # old request lacks EVERY field; new has whatever was generated
    f_new = extract_value(schema, request)
    f_old = extract_value(schema, {})
    verdict = compare(f_new, f_old)
    assert verdict is True or verdict[1] != DIFFERENCE or request == {}
    # and pointwise: a leaf present only in new never contributes a diff
    if request:
        v = compare(f_new, f_old)
        if v is not True:
            _, diff = v
            # any reported difference must trace to a field that exists
            # in old semantics-wise — with old empty there can be none
            # except total-diff of non-map features; maps of undefineds
            # compare clean:
            assert diff == DIFFERENCE or isinstance(diff, dict)


@settings(max_examples=200, deadline=None)
@given(schema_request())
def test_removing_fields_from_new_is_a_conflict(sr):
    schema, request = sr
    if not request:
        return
    f_new = extract_value(schema, {})
    f_old = extract_value(schema, request)
    verdict = compare(f_new, f_old)
    # old had data, new dropped it all: must NOT be clean unless every
    # generated feature read nothing from the request
    f_empty = extract_value(schema, {})
    if f_old != f_empty:
        assert verdict is not True


@settings(max_examples=200, deadline=None)
@given(schema_request())
def test_paths_consistent_with_verdict(sr):
    schema, request = sr
    mutated = {k: (v + [{}] if isinstance(v, list) else "MUT") for k, v in request.items()}
    f1 = extract_value(schema, request)
    f2 = extract_value(schema, mutated)
    verdict = compare(f1, f2)
    if verdict is True:
        return
    paths = list_diff_fields(schema, verdict[1])
    assert paths == "all" or (
        isinstance(paths, list)
        and len(paths) > 0
        and all(isinstance(p, str) and p for p in paths)
        and paths == sorted(paths)
    )


def test_pii_scrub_removes_all_matches(spark):
    """After scrubbing, every PII pattern must count zero — the masks
    themselves must not re-match (idempotence of the scrub pass)."""
    from feat_spark.functions import text as TXT

    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@x-y.co.uk or 192.168.0.1 call +44-20-7946-0958 now"),
            (2, "no pii here at all"),
            (3, "double j@k.io j@k.io and 10.0.0.1 10.0.0.1"),
        ],
        "doc_id long, text string",
    )
    from pyspark.sql import functions as F

    scrubbed = df.select("doc_id", TXT.pii_scrub(F.col("text")).alias("text"))
    counts = TXT.pii_counts(F.col("text"))
    leftover = scrubbed.select(
        *[v.alias(k) for k, v in counts.items()]
    ).groupBy().sum().collect()[0]
    assert all(v == 0 for v in leftover)
    row1 = scrubbed.filter("doc_id = 1").collect()[0]["text"]
    assert "<EMAIL>" in row1 and "<IP>" in row1 and "<PHONE>" in row1
