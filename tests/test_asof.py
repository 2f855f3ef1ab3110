"""As-of join correctness vs the pandas ``pd.merge_asof`` oracle on the
deterministic synthetic transcripts (FIXTURES.md §A), across all three
physical strategies, plus tolerance, strict inequality, NULL-valued
attributes and the temporal-leakage perturbation property."""

import numpy as np
import pandas as pd
import pytest

from feat_spark.operators.asof import asof_join, detect_hot_keys
from feat_spark.plans.audit import assert_no_future_reads, truncation_invariance
from feat_spark.sources.synth import (
    synth_conv_attrs,
    synth_conv_attrs_pdf,
    synth_transcripts,
    synth_transcripts_pdf,
)


@pytest.fixture(scope="module")
def data(spark):
    left = synth_transcripts(spark, n_convs=40, mean_turns=12, seed=42)
    right = synth_conv_attrs(spark, n_convs=40, seed=42)
    lpdf = synth_transcripts_pdf(n_convs=40, mean_turns=12, seed=42)
    rpdf = synth_conv_attrs_pdf(n_convs=40, seed=42)
    return left, right, lpdf, rpdf


def _oracle(lpdf, rpdf, exact=True, tolerance=None, direction="backward"):
    lo = lpdf.sort_values("ts", kind="stable").reset_index(drop=True)
    ro = rpdf.sort_values("ts", kind="stable").reset_index(drop=True)
    out = pd.merge_asof(
        lo,
        ro,
        on="ts",
        by="conv_id",
        allow_exact_matches=exact,
        tolerance=pd.Timedelta(tolerance) if tolerance else None,
        direction=direction,
        suffixes=("", "_attr"),
    )
    return out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def _got(df):
    return (
        df.toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )


def _check(got, want):
    assert len(got) == len(want)
    assert got["conv_id"].tolist() == want["conv_id"].tolist()
    # attr_hash: nullable int64 — compare as float with NaN-aware allclose
    g = got["attr_hash"].astype("float64").to_numpy()
    w = want["attr_hash"].astype("float64").to_numpy()
    assert ((np.isnan(g) & np.isnan(w)) | (g == w)).all()
    gp = got["plan"].where(got["plan"].notna(), None).tolist()
    wp = want["plan"].where(want["plan"].notna(), None).tolist()
    assert gp == wp


@pytest.mark.parametrize("strategy", ["union_window", "broadcast", "skew_aware", "cogroup_pandas"])
def test_asof_matches_pandas(spark, data, strategy):
    left, right, lpdf, rpdf = data
    kwargs = {"hot_threshold": 30} if strategy == "skew_aware" else {}
    out = asof_join(left, right, on="conv_id", strategy=strategy, **kwargs)
    _check(_got(out), _oracle(lpdf, rpdf))


def test_asof_strict_inequality(spark, data):
    left, right, lpdf, rpdf = data
    out = asof_join(left, right, on="conv_id", allow_exact_matches=False)
    _check(_got(out), _oracle(lpdf, rpdf, exact=False))


def test_asof_tolerance(spark, data):
    left, right, lpdf, rpdf = data
    out = asof_join(left, right, on="conv_id", tolerance="3 days")
    _check(_got(out), _oracle(lpdf, rpdf, tolerance="3 days"))


def test_asof_null_attribute_values_still_win(spark, data):
    """A NULL attribute on the latest preceding row must override an
    older non-NULL row (struct packing, not raw ffill) — matches
    pd.merge_asof row semantics."""
    left, right, lpdf, rpdf = data
    from pyspark.sql import functions as F

    right2 = right.withColumn(
        "plan", F.when(F.col("attr_hash") % 3 == 0, None).otherwise(F.col("plan"))
    )
    rpdf2 = rpdf.copy()
    rpdf2.loc[rpdf2["attr_hash"] % 3 == 0, "plan"] = None
    out = asof_join(left, right2, on="conv_id")
    _check(_got(out), _oracle(lpdf, rpdf2))


@pytest.mark.parametrize("strategy", ["union_window", "broadcast", "skew_aware", "cogroup_pandas"])
@pytest.mark.parametrize("exact", [True, False])
def test_asof_equal_ts_ties(spark, strategy, exact):
    """Left and right rows at EXACTLY the same timestamp: exact=True must
    see the equal-ts right row, exact=False must not. The synthetic
    fixtures never produce equal ts across sides, so this is pinned
    explicitly (regression: union_window had the tie order inverted)."""
    import datetime as dt

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
    lpdf = pd.DataFrame(
        {"conv_id": ["a", "a", "a"], "turn_idx": [0, 1, 2],
         "ts": [t(5), t(7), t(9)]}
    )
    rpdf = pd.DataFrame(
        {"conv_id": ["a", "a", "a"], "ts": [t(5), t(6), t(9)],
         "attr_hash": [100, 200, 300], "plan": ["p1", "p2", "p3"]}
    )
    left = spark.createDataFrame(lpdf)
    right = spark.createDataFrame(rpdf)
    kwargs = {"hot_threshold": 1} if strategy == "skew_aware" else {}
    out = asof_join(
        left, right, on="conv_id", strategy=strategy,
        allow_exact_matches=exact, **kwargs,
    )
    _check(_got(out), _oracle(lpdf, rpdf, exact=exact))


@pytest.mark.parametrize("strategy", ["union_window", "broadcast", "skew_aware", "cogroup_pandas"])
@pytest.mark.parametrize("direction", ["forward", "nearest"])
def test_asof_directions_match_pandas(spark, data, strategy, direction):
    left, right, lpdf, rpdf = data
    kwargs = {"hot_threshold": 30} if strategy == "skew_aware" else {}
    out = asof_join(
        left, right, on="conv_id", strategy=strategy, direction=direction, **kwargs
    )
    _check(_got(out), _oracle(lpdf, rpdf, direction=direction))


@pytest.mark.parametrize("direction", ["forward", "nearest"])
@pytest.mark.parametrize("exact", [True, False])
def test_asof_direction_ties_and_duplicates(spark, direction, exact):
    """Equal left/right timestamps, duplicate right timestamps, and the
    nearest equal-distance tie — pinned vs pd.merge_asof for every
    (direction, exact) combination."""
    import datetime as dt

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
    lpdf = pd.DataFrame(
        {"conv_id": ["a"] * 4, "turn_idx": [0, 1, 2, 3],
         "ts": [t(4), t(10), t(16), t(30)]}
    )
    # duplicates at t8 (forward first-wins) and t12; t10 is equidistant
    # from t8 and t12; t16 has an exact-equal right row
    rpdf = pd.DataFrame(
        {"conv_id": ["a"] * 5,
         "ts": [t(8), t(8), t(12), t(16), t(20)],
         "attr_hash": [1, 2, 3, 4, 5],
         "plan": ["p1", "p2", "p3", "p4", "p5"]}
    )
    left = spark.createDataFrame(lpdf)
    right = spark.createDataFrame(rpdf)
    for strategy in ("union_window", "broadcast"):
        out = asof_join(
            left, right, on="conv_id", strategy=strategy,
            direction=direction, allow_exact_matches=exact,
        )
        _check(_got(out), _oracle(lpdf, rpdf, exact=exact, direction=direction))


@pytest.mark.parametrize("direction", ["forward", "nearest"])
def test_asof_direction_tolerance(spark, data, direction):
    left, right, lpdf, rpdf = data
    out = asof_join(
        left, right, on="conv_id", direction=direction, tolerance="3 days"
    )
    _check(_got(out), _oracle(lpdf, rpdf, tolerance="3 days", direction=direction))


def test_asof_no_future_reads(spark, data):
    left, right, _, _ = data
    out = asof_join(left, right, on="conv_id", include_matched_ts=True)
    checked = assert_no_future_reads(out, "ts", "matched_ts")
    assert checked > 0


def test_asof_leakage_perturbation(spark, data):
    """Mutating any right row with ts' > cutoff must not change features
    at rows with ts <= cutoff (FIXTURES.md §A oracle requirement)."""
    left, right, lpdf, _ = data
    from pyspark.sql import functions as F

    cutoff = lpdf["ts"].quantile(0.5)
    base = asof_join(
        left.filter(F.col("ts") <= F.lit(cutoff)), right, on="conv_id"
    )
    perturbed_right = right.withColumn(
        "plan",
        F.when(F.col("ts") > F.lit(cutoff), F.lit("MUTATED")).otherwise(F.col("plan")),
    ).withColumn(
        "attr_hash",
        F.when(F.col("ts") > F.lit(cutoff), F.lit(0)).otherwise(F.col("attr_hash")),
    )
    after = asof_join(
        left.filter(F.col("ts") <= F.lit(cutoff)), perturbed_right, on="conv_id"
    )
    assert base.exceptAll(after).count() == 0
    assert after.exceptAll(base).count() == 0


def test_truncation_invariance_of_asof(spark, data):
    left, right, lpdf, _ = data
    cutoff = lpdf["ts"].quantile(0.6)
    truncation_invariance(
        lambda src: asof_join(src, right, on="conv_id"), left, cutoff
    )


def test_detect_hot_keys(spark, data):
    left, _, lpdf, _ = data
    hot = {r["conv_id"] for r in detect_hot_keys(left, ["conv_id"], 50).collect()}
    want = set(lpdf.groupby("conv_id").size().loc[lambda s: s > 50].index)
    assert hot == want
    assert "conv-00000000" in hot  # the designated heavy hitter


def test_asof_forward_is_label_path_not_feature_path(spark, data):
    """direction='forward' attaches FUTURE outcomes (labels) by design:
    the feature-side leakage audit must reject it, and every matched
    timestamp must sit at-or-after the row's ts (the mirror property)."""
    from pyspark.sql import functions as F

    from feat_spark.plans.audit import LeakageError, assert_no_future_reads

    left, right, _, _ = data
    out = asof_join(
        left, right, on="conv_id", direction="forward", include_matched_ts=True
    )
    bad = out.filter(F.col("matched_ts") < F.col("ts")).count()
    assert bad == 0
    with pytest.raises(LeakageError):
        assert_no_future_reads(out, "ts", "matched_ts", allow_exact=False)


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@pytest.mark.parametrize("strategy", ["union_window", "broadcast"])
def test_null_ts_never_matches(spark, direction, strategy):
    """NULL timestamps never match, in either role, in any direction or
    strategy (advisor finding: under `ts desc` a NULL-ts left row sorted
    LAST in the forward union_window path, putting every right row in
    its frame and spuriously matching the earliest one)."""
    import datetime as dt

    t = dt.datetime(2024, 1, 1, 10)
    left = spark.createDataFrame(
        [("c1", 1, t), ("c1", 2, None), ("c2", 1, None)],
        "conv_id string, turn_idx int, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("c1", dt.datetime(2024, 1, 1, 9), 100),
            ("c1", None, 999),
            ("c2", None, 888),
        ],
        "conv_id string, ts timestamp, attr int",
    )
    out = asof_join(
        left, right, on="conv_id", strategy=strategy, direction=direction,
        value_cols=["attr"],
    )
    got = {(r["conv_id"], r["turn_idx"]): r["attr"] for r in out.collect()}
    # NULL-ts left rows: no match; NULL-ts right rows: invisible
    assert got[("c1", 2)] is None
    assert got[("c2", 1)] is None
    # the non-NULL row still matches normally (backward/nearest find 9:00)
    assert got[("c1", 1)] == (None if direction == "forward" else 100)
