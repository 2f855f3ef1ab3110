"""Late-round-4 batch T operators: streaming Count-Min maintenance,
Wilson proportion intervals, empirical-Bayes rate shrinkage,
l-diversity audits, Neyman sample allocation. Hand-computed vectors."""

import math
import os

from pyspark.sql import functions as F


# ----------------------------------------------------- stream CMS maintain


def test_stream_cms_merge_equals_one_shot(spark, tmp_path):
    import pandas as pd

    from feat_spark.operators.cms import countmin_topk
    from feat_spark.streaming.pipeline import (
        cms_state_topk,
        stream_maintain_cms,
    )

    src = str(tmp_path / "src")
    tgt = str(tmp_path / "state")
    os.makedirs(src)
    a = pd.DataFrame({"k": ["a"] * 5 + ["b"] * 2})
    b = pd.DataFrame({"k": ["a"] * 3 + ["c"] * 4})
    a.to_parquet(os.path.join(src, "p1.parquet"), index=False)
    b.to_parquet(os.path.join(src, "p2.parquet"), index=False)
    stream = (
        spark.readStream.schema("k string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    stream_maintain_cms(stream, tgt, "k", depth=3, width=64)
    got = {
        r["key"]: r["cms_est"]
        for r in cms_state_topk(spark, tgt, k=5, depth=3, width=64).collect()
    }
    both = spark.createDataFrame(
        [("a",)] * 8 + [("b",)] * 2 + [("c",)] * 4, ["k"]
    )
    want = {
        r["key"]: r["cms_est"]
        for r in countmin_topk(both, "k", k=5, depth=3, width=64).collect()
    }
    assert got == want
    assert got["a"] >= 8 and got["b"] >= 2 and got["c"] >= 4


# ------------------------------------------------------------ Wilson CI


def test_wilson_interval_known_value(spark):
    from feat_spark.operators.experiment import proportion_ci

    # 8/10 successes, z = 1.96: classic textbook Wilson bounds
    rows = [("g", 1)] * 8 + [("g", 0)] * 2
    df = spark.createDataFrame(rows, ["g", "y"])
    r = proportion_ci(df, "g", "y").collect()[0]
    z, n, p = 1.96, 10.0, 0.8
    z2 = z * z
    denom = 1 + z2 / n
    center = (p + z2 / (2 * n)) / denom
    half = z * math.sqrt(p * (1 - p) / n + z2 / (4 * n * n)) / denom
    assert abs(r["ci_low"] - (center - half)) < 1e-9
    assert abs(r["ci_high"] - (center + half)) < 1e-9
    assert r["rate"] == 0.8
    assert 0.0 <= r["ci_low"] < 0.8 < r["ci_high"] <= 1.0


def test_wilson_interval_stays_in_unit_range_at_extremes(spark):
    from feat_spark.operators.experiment import proportion_ci

    df = spark.createDataFrame([("a", 1), ("a", 1), ("b", 0)], ["g", "y"])
    out = {r["g"]: r for r in proportion_ci(df, "g", "y").collect()}
    assert out["a"]["rate"] == 1.0 and out["a"]["ci_high"] == 1.0
    assert out["a"]["ci_low"] > 0.0  # never the Wald collapse to [1,1]
    assert out["b"]["ci_low"] == 0.0 and out["b"]["ci_high"] < 1.0


# ------------------------------------------------------------- EB shrink


def test_eb_shrinks_small_keys_more(spark):
    from feat_spark.operators.encoding import eb_shrink_rates

    # three well-observed keys at 0.4/0.5/0.6 (spread -> real prior)
    # plus extreme 2-obs keys at 0 and 1
    rows = [("k4", 1)] * 40 + [("k4", 0)] * 60
    rows += [("big", i % 2) for i in range(100)]
    rows += [("k6", 1)] * 60 + [("k6", 0)] * 40
    rows += [("zero", 0), ("zero", 0), ("one", 1), ("one", 1)]
    df = spark.createDataFrame(rows, ["k", "y"])
    out = {r["key"]: r for r in eb_shrink_rates(df, "k", "y").collect()}
    assert out["big"]["prior_strength"] is not None
    # shrinkage moves extremes toward the prior mean...
    assert out["zero"]["shrunk_rate"] > out["zero"]["raw_rate"]
    assert out["one"]["shrunk_rate"] < out["one"]["raw_rate"]
    # ...and moves the well-observed key far less
    assert abs(out["big"]["shrunk_rate"] - out["big"]["raw_rate"]) < abs(
        out["one"]["shrunk_rate"] - out["one"]["raw_rate"]
    )


def test_eb_degenerate_corpus_returns_raw(spark):
    from feat_spark.operators.encoding import eb_shrink_rates

    # all keys identical rate -> zero variance -> no shrink
    rows = [("a", 1), ("a", 0), ("b", 1), ("b", 0)]
    df = spark.createDataFrame(rows, ["k", "y"])
    for r in eb_shrink_rates(df, "k", "y").collect():
        assert r["prior_strength"] is None
        assert r["shrunk_rate"] == r["raw_rate"] == 0.5


# ------------------------------------------------------------ l-diversity


def test_l_diversity_flags_homogeneous_groups(spark):
    from feat_spark.plans.audit import l_diversity_audit

    rows = [
        ("g1", "s1"), ("g1", "s1"), ("g1", "s1"),  # homogeneous
        ("g2", "s1"), ("g2", "s2"),  # diverse
    ]
    df = spark.createDataFrame(rows, ["q", "s"])
    out = l_diversity_audit(df, ["q"], "s", l=2).collect()
    assert len(out) == 1
    r = out[0]
    assert r["q"] == "g1" and r["n"] == 3
    assert r["n_distinct_sensitive"] == 1 and r["majority_share"] == 1.0


def test_l_diversity_counts_null_as_value(spark):
    from feat_spark.plans.audit import l_diversity_audit

    df = spark.createDataFrame(
        [("g", "x"), ("g", None)], ["q", "s"]
    )
    # two classes (x, NULL) -> diverse at l=2 -> no violation
    assert l_diversity_audit(df, ["q"], "s", l=2).count() == 0


# ------------------------------------------------------ Neyman allocation


def test_neyman_favors_volatile_strata(spark):
    from feat_spark.operators.sampling import neyman_allocation

    # stratum A: constant values (s=0); B: spread -> all budget to B
    rows = [("A", 100)] * 10 + [("B", v) for v in (0, 200) * 5]
    df = spark.createDataFrame(rows, ["s", "v"])
    out = {r["stratum"]: r for r in neyman_allocation(df, "s", "v", budget=100).collect()}
    assert out["A"]["stddev"] == 0.0 and out["A"]["alloc_n"] == 0
    assert out["B"]["alloc_n"] == 100


def test_neyman_allocation_matches_closed_form(spark):
    from feat_spark.operators.sampling import neyman_allocation

    # same value spread, 3x the rows: allocation ~3:1 up to the n-1
    # sample-variance correction — assert the exact closed form
    rows = [("big", v) for v in (0, 100) * 15]
    rows += [("small", v) for v in (0, 100) * 5]
    df = spark.createDataFrame(rows, ["s", "v"])
    out = {r["stratum"]: r for r in neyman_allocation(df, "s", "v", budget=100).collect()}
    s_big = math.sqrt((30 * 150_0000 - 1500 ** 2) / (30 * 29))
    s_small = math.sqrt((10 * 50_0000 - 500 ** 2) / (10 * 9))
    t = 30 * s_big + 10 * s_small
    assert out["big"]["alloc_n"] == math.floor(100.0 * 30 * s_big / t)
    assert out["small"]["alloc_n"] == math.floor(100.0 * 10 * s_small / t)
    assert out["big"]["alloc_n"] + out["small"]["alloc_n"] <= 100
