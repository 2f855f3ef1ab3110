"""CUPED adjustment and median/MAD outlier flags."""

import pytest

from pyspark.sql import functions as F


def test_cuped_removes_covariate_imbalance(spark):
    from feat_spark.operators.experiment import cuped_adjust

    # y = 3*x exactly, zero true treatment effect — but the variants
    # get imbalanced x by construction, so RAW means differ while the
    # CUPED means must coincide (rho2 = 1 removes everything).
    rows = []
    for i in range(200):
        x = float(10 + (i % 17))
        variant = 0 if i < 100 else 1
        if variant == 1:
            x += 5.0  # covariate imbalance
        rows.append((i, variant, x, 3.0 * x))
    df = spark.createDataFrame(rows, "unit long, variant int, x double, y double")
    out = {r["variant"]: r for r in cuped_adjust(df, "variant", "y", "x").collect()}
    assert out[0]["n_units"] == 100 and out[1]["n_units"] == 100
    # raw means differ by ~3*5 (plus the i%17 phase residue)
    assert out[1]["mean_y"] - out[0]["mean_y"] > 14.0
    assert out[0]["theta"] == pytest.approx(3.0, abs=1e-6)
    assert out[0]["rho2"] == pytest.approx(1.0, abs=1e-6)
    assert out[0]["mean_y_cuped"] == pytest.approx(out[1]["mean_y_cuped"], abs=1e-5)


def test_cuped_degenerate_covariate_falls_back(spark):
    from feat_spark.operators.experiment import cuped_adjust

    rows = [(i, i % 2, 7.0, float(i)) for i in range(20)]
    rows.append((99, 0, None, 5.0))  # null covariate -> dropped
    df = spark.createDataFrame(rows, "unit long, variant int, x double, y double")
    out = {r["variant"]: r for r in cuped_adjust(df, "variant", "y", "x").collect()}
    # constant x: theta = 0, adjusted == raw; the null-x unit dropped
    assert out[0]["theta"] == 0.0 and out[0]["rho2"] == 0.0
    assert out[0]["mean_y_cuped"] == out[0]["mean_y"]
    assert out[0]["n_units"] == 10 and out[1]["n_units"] == 10


def test_robust_outliers_flags_whale_not_tail(spark):
    from feat_spark.operators.profile import robust_outliers

    # group a: values 1..9 plus a 1000.0 whale. median = 5.5,
    # MAD = 2.5 -> threshold 3.5*MAD = 8.75; only the whale exceeds it.
    rows = [(i, "a", float(v)) for i, v in enumerate(range(1, 10))]
    rows.append((9, "a", 1000.0))
    # group b: constant -> MAD 0 -> no z, no flags
    rows += [(100 + i, "b", 4.0) for i in range(5)]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    out = {
        r["event_id"]: r
        for r in robust_outliers(df, "event_type", "value").collect()
    }
    flagged = [i for i, r in out.items() if r["is_outlier"]]
    assert flagged == [9]
    # z of value 1: (200 - 1100) / 500 = -1.8 in half-cent units
    assert out[0]["robust_z"] == pytest.approx(-1.8, abs=1e-9)
    for i in range(100, 105):
        assert out[i]["robust_z"] is None and out[i]["is_outlier"] is False
    # null values are excluded entirely
    df2 = df.withColumn(
        "value", F.when(F.col("event_id") == 3, None).otherwise(F.col("value"))
    )
    assert robust_outliers(df2, "event_type", "value").count() == len(rows) - 1


def test_variant_summary_exact_and_degenerate(spark):
    import math

    from feat_spark.operators.experiment import variant_summary

    rows = [(0, float(v)) for v in (1, 2, 3, 4)] + [(1, 10.0)]
    rows.append((0, None))  # null metric dropped
    df = spark.createDataFrame(rows, "variant int, y double")
    out = {r["variant"]: r for r in variant_summary(df, "variant", "y").collect()}
    a = out[0]
    assert a["n_units"] == 4 and a["mean_y"] == 2.5
    # sample sd of 1..4 = sqrt(5/3)
    assert a["sd_y"] == pytest.approx(math.sqrt(5 / 3), abs=1e-6)
    se = math.sqrt(5 / 3 / 4)
    assert a["se_y"] == pytest.approx(se, abs=1e-6)
    assert a["ci_lo"] == pytest.approx(2.5 - 1.96 * se, abs=1e-5)
    assert a["ci_hi"] == pytest.approx(2.5 + 1.96 * se, abs=1e-5)
    # singleton variant: NULL dispersion, honest mean
    b = out[1]
    assert b["n_units"] == 1 and b["mean_y"] == 10.0
    assert b["sd_y"] is None and b["ci_lo"] is None


def test_srm_check_detects_mismatch(spark):
    from feat_spark.operators.experiment import srm_check

    even = [(i, i % 2) for i in range(1000)]
    df = spark.createDataFrame(even, "id long, variant int")
    ok = srm_check(df, "variant", {0: 1, 1: 1}).collect()[0]
    assert ok["n_total"] == 1000 and ok["chi2"] == 0.0 and ok["srm"] is False
    # 600/400 split against 50/50: chi2 = (100^2/500)*2 = 40 -> SRM
    skew = [(i, 0 if i < 600 else 1) for i in range(1000)]
    bad = srm_check(
        spark.createDataFrame(skew, "id long, variant int"), "variant", {0: 1, 1: 1}
    ).collect()[0]
    assert bad["chi2"] == pytest.approx(40.0, abs=1e-6) and bad["srm"] is True
    # weighted allocation: 900/100 vs 9:1 is perfectly on-target
    w = [(i, 0 if i < 900 else 1) for i in range(1000)]
    onw = srm_check(
        spark.createDataFrame(w, "id long, variant int"), "variant", {0: 9, 1: 1}
    ).collect()[0]
    assert onw["chi2"] == pytest.approx(0.0, abs=1e-9) and onw["srm"] is False
    # unknown variant refuses to render a verdict
    unk = srm_check(df, "variant", {0: 1}).collect()[0]
    assert unk["chi2"] is None and unk["srm"] is None


def test_readability_formula(spark):
    from feat_spark.functions.text import readability_features

    df = spark.createDataFrame(
        [
            (1, "The cat sat. The dog ran!"),
            (2, "no terminator here"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    feats = readability_features("text")
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id", *(feats[k].alias(k) for k in feats)
        ).collect()
    }
    r1 = out[1]
    assert r1["n_words"] == 6 and r1["n_sentences"] == 2
    # vowel groups: e,a,a,e,o,a -> The(1) cat(1) sat(1) The(1) dog(1) ran(1)
    assert r1["n_syllables"] == 6
    expected = 206.835 - 1.015 * (6 / 2) - 84.6 * (6 / 6)
    assert r1["flesch"] == pytest.approx(expected, abs=1e-6)
    # no sentence terminator -> unscorable, counts still real
    assert out[2]["n_sentences"] == 0 and out[2]["flesch"] is None
    assert out[3]["n_words"] == 0 and out[3]["flesch"] is None


def test_histogram_bins_integer_edges(spark):
    from feat_spark.operators.profile import histogram_bins

    vals = [(i, float(i)) for i in range(0, 10)]  # 0..9 dollars
    df = spark.createDataFrame(vals, "id long, value double")
    out = {r["bin_id"]: r for r in histogram_bins(df, "value", n_bins=5).collect()}
    # cents 0..900, span 900: two values per bin, max value clipped in
    assert [out[b]["n"] for b in range(5)] == [2, 2, 2, 2, 2]
    assert out[0]["lo_cents"] == 0 and out[0]["hi_cents"] == 180
    assert out[4]["lo_cents"] == 720 and out[4]["hi_cents"] == 900
    assert out[0]["share"] == 0.2
    # degenerate span: one bin holding everything
    same = spark.createDataFrame([(1, 5.0), (2, 5.0)], "id long, value double")
    d = histogram_bins(same, "value", n_bins=5).collect()
    assert len(d) == 1 and d[0]["bin_id"] == 0 and d[0]["n"] == 2
    # all-null column: empty result, stable schema
    nul = spark.createDataFrame([(1, None)], "id long, value double")
    assert histogram_bins(nul, "value").count() == 0


def test_km_curve_textbook(spark):
    from feat_spark.operators.labels import km_curve

    rows = (
        [(1, True)] * 2                     # t=1: 2 events of 10 at risk
        + [(2, True), (2, False)]           # t=2: 1 event + 1 censor of 8
        + [(3, False)] * 2                  # t=3: censoring only
        + [(5, True)] * 4                   # t=5: everyone left exits
    )
    df = spark.createDataFrame(rows, "t long, observed boolean")
    out = {r["t"]: r for r in km_curve(df, "t", "observed").collect()}
    assert out[1]["n_at_risk"] == 10 and out[1]["survival"] == pytest.approx(0.8, abs=1e-6)
    assert out[2]["n_at_risk"] == 8
    assert out[2]["survival"] == pytest.approx(0.8 * (1 - 1 / 8), abs=1e-6)
    # censoring-only time: survival unchanged
    assert out[3]["survival"] == out[2]["survival"]
    # final time exhausts the risk set: survival exactly 0
    assert out[5]["n_at_risk"] == 4 and out[5]["survival"] == 0.0
