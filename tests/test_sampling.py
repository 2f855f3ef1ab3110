"""Deterministic hash sampling: layout-independence, stratum rates."""

import pytest
from pyspark.sql import functions as F

from feat_spark.operators.sampling import hash_sample, stratified_hash_sample


def test_hash_sample_deterministic_and_layout_independent(spark):
    e = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    a = {r["event_id"] for r in hash_sample(e, "event_id", 10).select("event_id").collect()}
    b = {
        r["event_id"]
        for r in hash_sample(e.repartition(17), "event_id", 10)
        .select("event_id")
        .collect()
    }
    assert a == b  # physical layout must not change the sampled set
    n = e.count()
    assert 0.05 * n <= len(a) <= 0.15 * n  # ~10%
    # a different salt draws an (almost surely) different set
    c = {r["event_id"] for r in hash_sample(e, "event_id", 10, salt="t").select("event_id").collect()}
    assert c != a


def test_stratified_rates(spark):
    e = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    out = stratified_hash_sample(
        e, "event_type", "event_id",
        {"purchase": 100, "click": 0}, default_pct=50,
    )
    got = {r["event_type"]: r["n"] for r in out.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    want_all = {r["event_type"]: r["n"] for r in e.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    assert got["purchase"] == want_all["purchase"]  # rate 100: keep all
    assert "click" not in got  # rate 0: keep none
    for t in ("view", "signup", "error"):
        assert 0.35 * want_all[t] <= got[t] <= 0.65 * want_all[t]  # ~50%


def test_assign_split_disjoint_exhaustive_stable(spark):
    from feat_spark.operators.sampling import assign_split

    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    out = assign_split(df, key="doc_id").toPandas()
    assert out["split"].notna().all()  # exhaustive
    counts = out.groupby("split").size().to_dict()
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]

    # growth stability: adding docs never changes existing assignments
    bigger = spark.createDataFrame([(i,) for i in range(1000)], "doc_id long")
    out2 = assign_split(bigger, key="doc_id").toPandas().set_index("doc_id")
    for _, r in out.iterrows():
        assert out2.loc[r["doc_id"], "split"] == r["split"]

    with pytest.raises(ValueError, match="sum to 100"):
        assign_split(df, key="doc_id", splits={"train": 80, "val": 10})


def test_canonical_text_variants_collapse(spark):
    from feat_spark.functions.text import canonical_text
    from pyspark.sql import functions as F

    rows = [
        (1, "Hello,   World! 42"),
        (2, "hello world 42"),
        (3, "HELLO WORLD 42!!!"),
        (4, "different text entirely"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {r["id"]: r["c"] for r in df.select("id", canonical_text("text").alias("c")).collect()}
    assert out[1] == out[2] == out[3] == "hello world 42"
    assert out[4] != out[1]


def test_incremental_lsh_pairs_cross_only(spark):
    from feat_spark.operators.dedup import (
        incremental_lsh_pairs,
        minhash_signatures,
        shingle_jaccard_pairs,
    )

    base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
    index = spark.createDataFrame(
        [(1, base), (2, "totally unrelated words nothing shared here at all ok")],
        "doc_id long, text string",
    )
    # new batch: a near-copy of doc 1, an exact copy of ANOTHER new doc
    # (new-vs-new must NOT pair), and an unrelated doc
    new = spark.createDataFrame(
        [(101, base + " extra"), (102, "clone text here for the new batch x y z"),
         (103, "clone text here for the new batch x y z")],
        "doc_id long, text string",
    )
    cand = incremental_lsh_pairs(
        minhash_signatures(new), minhash_signatures(index), k=16, bands=8
    )
    pairs = {(r["id_a"], r["id_b"]) for r in cand.collect()}
    assert (1, 101) in pairs
    assert all(a <= 2 and b >= 101 for a, b in pairs)  # strictly index x new

    verified = shingle_jaccard_pairs(
        index.unionByName(new), threshold=0.6, candidates=cand
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in verified} == {(1, 101)}


def test_cap_per_group_quota_and_layout_independence(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from feat_spark.functions.text import md5_long32
    from feat_spark.operators.sampling import cap_per_group

    # 3 groups: far over cap, exactly at cap, under cap
    rows = (
        [("big", i) for i in range(40)]
        + [("edge", i + 100) for i in range(10)]
        + [("small", i + 200) for i in range(3)]
    )
    df = spark.createDataFrame(rows, "grp string, id long")
    out = cap_per_group(df, group_col="grp", cap=10, key="id").toPandas()
    kept = out[out["kept"]].groupby("grp")["id"].count().to_dict()
    assert kept == {"big": 10, "edge": 10, "small": 3}
    assert len(out) == len(rows)  # every input row comes back, flagged

    # two-phase result == the plain one-window reference selection
    w = Window.partitionBy("grp").orderBy(
        md5_long32(F.concat_ws(":", F.lit("cap"), F.col("id").cast("string"))),
        F.col("id"),
    )
    ref = (
        df.withColumn("kept", F.row_number().over(w) <= 10)
        .toPandas()
        .set_index("id")["kept"]
    )
    got = out.set_index("id")["kept"]
    assert got.sort_index().equals(ref.sort_index())

    # layout-independent: a reshuffled input keeps the same ids
    out2 = cap_per_group(
        df.repartition(13, "id"), group_col="grp", cap=10, key="id"
    ).toPandas()
    assert set(out2[out2["kept"]]["id"]) == set(out[out["kept"]]["id"])


def test_source_curation_stats_blocks_rotten_source(spark):
    from feat_spark.plans.curation import source_curation_stats

    good = "the quick brown fox jumps over the lazy dog and then some more words " * 3
    rows = (
        [(f"g{i}", "good", good + str(i)) for i in range(5)]
        # 'dups': one distinct text repeated -> dup_frac 0.8
        + [(f"d{i}", "dups", good) for i in range(5)]
        # 'junk': pure punctuation noise -> quality ~0
        + [(f"j{i}", "junk", "!!! ??? ### $$$ %%% " + "@" * i) for i in range(5)]
    )
    df = spark.createDataFrame(rows, "doc_id string, source string, text string")
    out = (
        source_curation_stats(df, min_quality=0.2, max_dup_frac=0.5)
        .toPandas().set_index("source")
    )
    assert not out.loc["good", "blocked"]
    assert out.loc["good", "dup_frac"] == 0.0
    assert out.loc["dups", "blocked"] and out.loc["dups", "dup_frac"] == 0.8
    assert out.loc["junk", "blocked"] and out.loc["junk", "mean_quality"] < 0.2
    assert (out["n_docs"] == 5).all()
    assert out.loc["good", "pct_english"] == 1.0


def test_cap_per_group_and_impute_keep_null_groups(spark):
    """A NULL group is a real group: rows must survive the stats joins
    (null-safe equality), not silently vanish."""
    from feat_spark.operators.encoding import impute_group_mean
    from feat_spark.operators.sampling import cap_per_group

    rows = [(None, 1), (None, 2), (None, 3), ("a", 10)]
    df = spark.createDataFrame(rows, "grp string, id long")
    capped = cap_per_group(df, group_col="grp", cap=2, key="id").toPandas()
    assert len(capped) == 4
    nulls = capped[capped["grp"].isna()]
    assert len(nulls) == 3 and nulls["kept"].sum() == 2

    imp = impute_group_mean(
        spark.createDataFrame(
            [(None, 4.0), (None, None), ("a", 1.0)], "grp string, v double"
        ),
        col="v", group_col="grp",
    ).toPandas()
    assert len(imp) == 3
    filled = imp[imp["grp"].isna() & imp["v"].isna()]["v_imputed"].iloc[0]
    assert filled == 4.0


def test_weighted_hash_sample_proportional(spark):
    from pyspark.sql import functions as F

    from feat_spark.operators.sampling import weighted_hash_sample

    df = spark.range(0, 4000).select(
        F.col("id"),
        F.when(F.col("id") < 2000, 0.8).otherwise(0.2).alias("p"),
    )
    kept = weighted_hash_sample(df, key="id", p_col="p").toPandas()
    hi = (kept["id"] < 2000).sum()
    lo = (kept["id"] >= 2000).sum()
    assert abs(hi / 2000 - 0.8) < 0.05
    assert abs(lo / 2000 - 0.2) < 0.05
    # degenerate probabilities: 0 keeps nothing, 1 keeps everything
    z = df.withColumn("p", F.lit(0.0))
    assert weighted_hash_sample(z, "id", "p").count() == 0
    o = df.withColumn("p", F.lit(1.0))
    assert weighted_hash_sample(o, "id", "p").count() == 4000
    # layout-independent
    again = weighted_hash_sample(
        df.repartition(17), key="id", p_col="p"
    ).toPandas()
    assert set(again["id"]) == set(kept["id"])


def test_population_stability_detects_shift(spark):
    import numpy as np
    from pyspark.sql import functions as F

    from feat_spark.operators.profile import population_stability

    rng = np.random.default_rng(11)
    a = [(float(x),) for x in rng.normal(10, 2, 3000)]
    b_same = [(float(x),) for x in rng.normal(10, 2, 3000)]
    b_shift = [(float(x),) for x in rng.normal(14, 2, 3000)]
    ra = spark.createDataFrame(a, "value double")
    same = population_stability(
        ra, spark.createDataFrame(b_same, "value double"), "value"
    ).collect()[0]
    shift = population_stability(
        ra, spark.createDataFrame(b_shift, "value double"), "value"
    ).collect()[0]
    assert same["psi"] < 0.05          # same distribution: stable
    assert shift["psi"] > 0.5          # 2-sigma mean shift: act
    assert same["n_ref"] == 3000 and same["n_cur"] == 3000
    # disjoint supports: floored proportions keep PSI large but finite
    far = population_stability(
        ra,
        spark.createDataFrame([(1000.0 + i,) for i in range(500)], "value double"),
        "value",
    ).collect()[0]
    assert np.isfinite(far["psi"]) and far["psi"] > 1.0


def test_behavior_entropy_exact(spark):
    import math

    from feat_spark.operators.profile import behavior_entropy

    rows = (
        [(1, "a")] * 4 + [(1, "b")] * 4            # uniform over 2 cats
        + [(2, "a")] * 9                            # single category
        + [(3, "a")] * 1 + [(3, "b")] * 2 + [(3, "c")] * 5
    )
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    out = {
        r["user_id"]: r
        for r in behavior_entropy(df, "user_id", "event_type").collect()
    }
    assert out[1]["entropy"] == round(math.log(2), 6)
    assert out[1]["n_events"] == 8 and out[1]["n_cats"] == 2
    assert out[2]["entropy"] == 0.0 and out[2]["n_cats"] == 1
    h3 = math.log(8) - (1 * math.log(1) + 2 * math.log(2) + 5 * math.log(5)) / 8
    assert abs(out[3]["entropy"] - h3) < 1e-6
    # layout-independent: same bits after a reshuffle
    again = {
        r["user_id"]: r["entropy"]
        for r in behavior_entropy(
            df.repartition(7), "user_id", "event_type"
        ).collect()
    }
    assert all(again[u] == out[u]["entropy"] for u in out)


def test_temporal_split_embargo(spark):
    import datetime

    from pyspark.sql import functions as F

    from feat_spark.operators.sampling import temporal_split_embargo

    base = datetime.datetime(2024, 3, 10)
    rows = [
        (i, base + datetime.timedelta(hours=i)) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "id long, ts timestamp")
    cutoff = base + datetime.timedelta(hours=50)
    out = temporal_split_embargo(
        df, ts_col="ts", cutoff=cutoff, embargo_sec=10 * 3600
    )
    got = {r["id"]: r["split"] for r in out.collect()}
    for i in range(100):
        want = "train" if i < 40 else ("embargo" if i < 50 else "test")
        assert got[i] == want, (i, got[i])
    # epoch-int cutoff gives the identical labeling
    cutoff_us = int(
        (cutoff - datetime.datetime(1970, 1, 1)).total_seconds() * 1_000_000
    )
    got2 = {
        r["id"]: r["split"]
        for r in temporal_split_embargo(
            df, "ts", cutoff_us, 10 * 3600
        ).collect()
    }
    assert got2 == got
    # boundary row exactly at cutoff is test; exactly at train_end is embargo
    assert got[50] == "test" and got[40] == "embargo"
    # zero embargo degenerates to a plain 2-way split
    two = temporal_split_embargo(df, "ts", cutoff, 0)
    assert two.filter(F.col("split") == "embargo").count() == 0
