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


# ---------------------------------------------------------- round-3 ops

@settings(max_examples=200, deadline=None)
@given(
    st.dictionaries(
        st.sampled_from(["a", "b", "c", "d", "e"]),
        st.integers(min_value=1, max_value=10_000),
        min_size=2,
        max_size=5,
    ),
    st.data(),
)
def test_mixture_rates_properties(counts, data):
    """For any counts and positive weights: rates are valid basis
    points, the limiting stratum saturates (within 1bp of floor
    arithmetic), and expected keeps never exceed availability."""
    from feat_spark.operators.mixture import mixture_rates

    keys = sorted(counts)
    weights = {
        k: data.draw(st.integers(min_value=1, max_value=9), label=f"w_{k}")
        for k in keys
    }
    ckeys = {(k,): v for k, v in counts.items()}
    wkeys = {(k,): v for k, v in weights.items()}
    rates = mixture_rates(ckeys, wkeys)
    assert set(rates) == set(wkeys)
    assert all(0 <= bp <= 10000 for bp in rates.values())
    # keeps never exceed availability (floor can only shrink)
    for k, bp in rates.items():
        assert bp * ckeys[k] <= 10000 * ckeys[k]
    # the limiting stratum is kept (nearly) whole
    wsum = sum(wkeys.values())
    limiting = min(ckeys, key=lambda s: ckeys[s] / (wkeys[s] / wsum))
    assert rates[limiting] >= 9999


def test_canonical_text_idempotent_and_noise_invariant(spark):
    """canonical_text is a projection: applying it twice equals once,
    and case/punct/whitespace noise never changes the canonical form —
    checked over a batch of adversarial strings in one Spark job."""
    import random as _random

    from pyspark.sql import functions as F

    from feat_spark.functions.text import canonical_text

    rng = _random.Random(13)
    base_rows = []
    for i in range(60):
        words = [
            "".join(rng.choice("abcxyz019") for _ in range(rng.randint(1, 6)))
            for _ in range(rng.randint(0, 8))
        ]
        text = " ".join(words)
        noisy = "  ".join(
            w.upper() if rng.random() < 0.5 else w + rng.choice("!,.;?")
            for w in words
        )
        base_rows.append((i, text, " " + noisy + "!! "))
    df = spark.createDataFrame(base_rows, "id long, text string, noisy string")
    out = df.select(
        "id",
        canonical_text("text").alias("c1"),
        canonical_text(canonical_text("text")).alias("c2"),
        canonical_text("noisy").alias("cn"),
    ).collect()
    for r in out:
        assert r["c1"] == r["c2"], "not idempotent"
        assert r["c1"] == r["cn"], f"noise changed canonical form: {r}"


def test_session_funnel_matches_python_reference(spark):
    """Random event sequences: the operator's stage times must match a
    direct Python simulation of first-conversion semantics."""
    import random as _random

    from feat_spark.operators.funnel import session_funnel

    rng = _random.Random(29)
    stages = ("view", "click", "purchase")
    rows = []
    for sess in range(80):
        n = rng.randint(1, 8)
        for i in range(n):
            rows.append(
                (sess, 0, rng.choice(stages), float(rng.randint(1, 20)))
            )
    df = spark.createDataFrame(
        rows, "user_id long, session_id long, event_type string, ts double"
    )
    got = {
        r["user_id"]: (r["t_0"], r["t_1"], r["t_2"])
        for r in session_funnel(df, stages=stages).collect()
    }

    # python reference
    by_sess = {}
    for u, s, t, ts in rows:
        by_sess.setdefault(u, []).append((t, ts))
    want = {}
    for u, evs in by_sess.items():
        t0 = min((ts for t, ts in evs if t == "view"), default=None)
        if t0 is None:
            continue
        t1 = min((ts for t, ts in evs if t == "click" and ts >= t0), default=None)
        t2 = (
            min((ts for t, ts in evs if t == "purchase" and ts >= t1), default=None)
            if t1 is not None
            else None
        )
        want[u] = (t0, t1, t2)
    assert got == want
