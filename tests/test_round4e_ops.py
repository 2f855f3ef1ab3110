"""Late-round-4 batch O operators: distributed sequential ids,
Bloom-pruned semi join, Adamic-Adar link prediction, embedding
covariance, daily linear interpolation. Hand-computed vectors
throughout."""

import math

from pyspark.sql import functions as F


def _rows(df, *order):
    if order:
        df = df.orderBy(*order)
    return [r.asDict() for r in df.collect()]


# ------------------------------------------------------- assign_sequential_ids


def test_sequential_ids_rank_order(spark):
    from feat_spark.operators.ids import assign_sequential_ids

    df = spark.createDataFrame(
        [(10,), (3,), (7,), (100,), (50,)], "k long"
    )
    out = {r["k"]: r["row_id"] for r in _rows(assign_sequential_ids(df, "k", n_buckets=2))}
    assert out == {3: 0, 7: 1, 10: 2, 50: 3, 100: 4}


def test_sequential_ids_single_bucket_and_empty(spark):
    from feat_spark.operators.ids import assign_sequential_ids

    df = spark.createDataFrame([(5,), (1,)], "k long")
    out = {r["k"]: r["row_id"] for r in _rows(assign_sequential_ids(df, "k", n_buckets=1))}
    assert out == {1: 0, 5: 1}
    empty = spark.createDataFrame([], "k long")
    assert assign_sequential_ids(empty, "k").count() == 0


# ------------------------------------------------------------- bloom_semi_join


def test_bloom_semi_join_exact(spark):
    from feat_spark.operators.bloom import bloom_semi_join

    big = spark.createDataFrame([(i,) for i in range(1, 11)], "k long")
    small = spark.createDataFrame([(2,), (5,), (9,)], "k long")
    out = sorted(r["k"] for r in bloom_semi_join(big, small, "k").collect())
    assert out == [2, 5, 9]


def test_bloom_semi_join_tiny_filter_still_exact(spark):
    # m_bits=64 at 40 keys: the Bloom stage is nearly all-pass (heavy
    # false positives) — the exact verify must still yield the semi join
    from feat_spark.operators.bloom import bloom_semi_join

    big = spark.createDataFrame([(i,) for i in range(200)], "k long")
    small = spark.createDataFrame([(i * 5,) for i in range(40)], "k long")
    out = sorted(
        r["k"]
        for r in bloom_semi_join(big, small, "k", m_bits=64, n_hashes=2).collect()
    )
    assert out == [i for i in range(200) if i % 5 == 0]


# ----------------------------------------------------------------- adamic_adar


def test_adamic_adar_square(spark):
    # 4-cycle 1-2-3-4-1: diagonals (1,3) and (2,4) share two deg-2
    # neighbors -> AA = 2/ln(2); adjacent pairs are excluded
    from feat_spark.operators.graph import adamic_adar

    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], "src long, dst long"
    )
    out = {
        (r["node_a"], r["node_b"]): (r["common_neighbors"], r["aa_score"])
        for r in _rows(adamic_adar(e))
    }
    aa = round(2.0 / math.log(2.0), 6)
    assert out == {(1, 3): (2, aa), (2, 4): (2, aa)}


def test_adamic_adar_path_and_hub_cap(spark):
    from feat_spark.operators.graph import adamic_adar

    # path a-b-c: (a,c) via b (deg 2) -> 1/ln 2
    e = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    out = _rows(adamic_adar(e))
    assert len(out) == 1
    assert out[0]["aa_score"] == round(1.0 / math.log(2.0), 6)
    # capping the middle at degree 1 removes the wedge entirely
    assert adamic_adar(e, max_degree=1).count() == 0


# ----------------------------------------------------- embedding_covariance


def test_embedding_covariance_closed_form(spark):
    from feat_spark.operators.vectors import embedding_covariance

    df = spark.createDataFrame(
        [([0.0, 1.0],), ([2.0, 3.0],)], "embedding array<float>"
    )
    out = {
        (r["dim_i"], r["dim_j"]): (r["n"], r["cov"])
        for r in _rows(embedding_covariance(df))
    }
    # means (1, 2); cov(0,0)=1, cov(0,1)=1, cov(1,1)=1
    assert out == {(0, 0): (2, 1.0), (0, 1): (2, 1.0), (1, 1): (2, 1.0)}


def test_embedding_covariance_max_dim(spark):
    from feat_spark.operators.vectors import embedding_covariance

    df = spark.createDataFrame(
        [([1.0, 2.0, 3.0],), ([1.0, 2.0, 3.0],)], "embedding array<float>"
    )
    out = _rows(embedding_covariance(df, max_dim=2))
    assert len(out) == 3  # upper triangle of 2x2
    assert all(r["cov"] == 0.0 for r in out)  # constant vectors


# ------------------------------------------------------------ interpolate_daily


def test_interpolate_daily_gap(spark):
    from feat_spark.operators.resample import interpolate_daily

    rows = [
        (1, "2024-01-01 10:00:00", 1.0, 100),
        (1, "2024-01-04 10:00:00", 4.0, 101),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, value double, event_id long"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = _rows(interpolate_daily(df, "user_id"), "day")
    assert [r["value_interp"] for r in out] == [1.0, 2.0, 3.0, 4.0]
    assert [r["observed"] for r in out] == [True, False, False, True]


def test_interpolate_daily_last_obs_wins(spark):
    from feat_spark.operators.resample import interpolate_daily

    # two observations same day: the later (ts, event_id) one is the
    # day's value
    rows = [
        (1, "2024-01-01 01:00:00", 5.0, 1),
        (1, "2024-01-01 23:00:00", 9.0, 2),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, value double, event_id long"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = _rows(interpolate_daily(df, "user_id"))
    assert len(out) == 1 and out[0]["value_interp"] == 9.0


# ------------------------------------------------------------ rendezvous_assign


def test_rendezvous_minimal_movement(spark):
    from feat_spark.operators.ids import rendezvous_assign

    df = spark.createDataFrame([(i,) for i in range(500)], "k long")
    a = {r["k"]: r["shard"] for r in rendezvous_assign(df, "k", ["s0", "s1", "s2", "s3"]).collect()}
    b = {r["k"]: r["shard"] for r in rendezvous_assign(df, "k", ["s0", "s1", "s2", "s3", "s4"]).collect()}
    moved = {k for k in a if a[k] != b[k]}
    # every moved key moved TO the new shard, never between old shards
    assert all(b[k] == "s4" for k in moved)
    # ~1/5 of keys move (binomial; generous envelope)
    assert 50 <= len(moved) <= 160
    # deterministic: re-run is identical
    again = {r["k"]: r["shard"] for r in rendezvous_assign(df, "k", ["s0", "s1", "s2", "s3"]).collect()}
    assert again == a


def test_rendezvous_single_shard(spark):
    from feat_spark.operators.ids import rendezvous_assign

    df = spark.createDataFrame([(1,), (2,)], "k long")
    out = rendezvous_assign(df, "k", ["only"]).collect()
    assert all(r["shard"] == "only" for r in out)


# --------------------------------------------------------------------- kcore


def test_kcore_triangle_with_tail(spark):
    from feat_spark.operators.graph import kcore

    # triangle 1-2-3 plus a pendant 3-4: the 2-core is the triangle
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4)], "src long, dst long"
    )
    out = {r["node"]: r["degree"] for r in kcore(e, k=2, rounds=2).collect()}
    assert out == {1: 2, 2: 2, 3: 2}


def test_kcore_chain_peels_to_nothing(spark):
    from feat_spark.operators.graph import kcore

    # a path has no 2-core; each round peels both endpoints
    e = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], "src long, dst long"
    )
    assert kcore(e, k=2, rounds=3).count() == 0


def test_kcore_fixed_rounds_superset(spark):
    from feat_spark.operators.graph import kcore

    # one round on a long path leaves an inner segment (superset of
    # the empty true 2-core) — the documented from-above contract
    e = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], "src long, dst long"
    )
    assert kcore(e, k=2, rounds=1).count() == 3  # nodes 2,3,4 survive


# ----------------------------------------------------------- segment_overlap


def test_segment_overlap_jaccard(spark):
    from feat_spark.operators.cooccur import segment_overlap

    rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (3, "c")]
    df = spark.createDataFrame(rows, "e long, s string")
    out = {
        (r["seg_a"], r["seg_b"]): (r["n_a"], r["n_b"], r["n_common"], r["jaccard"])
        for r in segment_overlap(df, "e", "s").collect()
    }
    assert out[("a", "b")] == (3, 2, 2, round(2 / 3, 6))
    assert out[("a", "c")] == (3, 1, 1, round(1 / 3, 6))
    assert ("b", "c") not in out  # no shared member


def test_segment_overlap_entity_cap(spark):
    from feat_spark.operators.cooccur import segment_overlap

    rows = [(1, "a"), (1, "b"), (1, "c"), (2, "a"), (2, "b")]
    df = spark.createDataFrame(rows, "e long, s string")
    out = {
        (r["seg_a"], r["seg_b"]): r["n_common"]
        for r in segment_overlap(df, "e", "s", max_segments_per_entity=2).collect()
    }
    # entity 1 (3 segments) dropped entirely; only entity 2's pair remains
    assert out == {("a", "b"): 1}


# ------------------------------------------------------- stream_interval_join


def test_stream_interval_join_batch_shape(spark):
    # the join CONDITION semantics on a batch frame (streaming wiring
    # is exercised end-to-end by the driver gate)
    from feat_spark.streaming.pipeline import stream_interval_join
    from pyspark.sql import functions as F

    l = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 10)], "user_id long, c_ts string, click_id long"
    ).withColumn("c_ts", F.col("c_ts").cast("timestamp"))
    r = spark.createDataFrame(
        [
            (1, "2024-01-01 01:00:00", 20),  # inside
            (1, "2024-01-01 05:00:00", 21),  # outside 4h
            (2, "2024-01-01 01:00:00", 22),  # wrong key
            (1, "2023-12-31 23:00:00", 23),  # before the click
        ],
        "user_id long, p_ts string, purchase_id long",
    ).withColumn("p_ts", F.col("p_ts").cast("timestamp"))
    out = stream_interval_join(l, r, "user_id", "c_ts", "p_ts", upper="4 hours")
    assert [row["purchase_id"] for row in out.collect()] == [20]


# --------------------------------------------------------------- hash_features


def test_hash_features_stable_and_null_safe(spark):
    from feat_spark.operators.encoding import hash_features

    df = spark.createDataFrame(
        [(1, "a", "x"), (2, "a", None), (3, "b", "x")],
        "id long, c1 string, c2 string",
    )
    out = hash_features(df, "id", ["c1", "c2"], n_features=8)
    rows = [(r["id"], r["bucket"], r["weight"]) for r in out.collect()]
    # id=2's NULL c2 contributes nothing: one token only
    assert sum(1 for i, _, _ in rows if i == 2) == 1
    # identical tokens hash identically across rows: c1=a buckets match
    a1 = {(b, w) for i, b, w in rows if i == 1}
    a2 = {(b, w) for i, b, w in rows if i == 2}
    assert a2 <= a1  # id 2's single (bucket, weight) appears in id 1's set
    assert all(w in (-1, 1) for _, _, w in rows)  # no collisions at this size


def test_hash_features_collision_sum(spark):
    from feat_spark.operators.encoding import hash_features

    # same token in both columns via equal prefixed strings is
    # impossible (prefix), but duplicate column listing forces the
    # collision path: weights sum
    df = spark.createDataFrame([(1, "a")], "id long, c1 string")
    out = hash_features(df, "id", ["c1", "c1"], n_features=8).collect()
    assert len(out) == 1 and out[0]["weight"] in (-2, 2)


# ------------------------------------------------------ join_cardinality_audit


def test_join_cardinality_audit(spark):
    from feat_spark.plans.audit import join_cardinality_audit

    l = spark.createDataFrame([(1,), (1,), (1,), (2,), (None,)], "k long")
    r = spark.createDataFrame([(1,), (1,), (3,)], "k long")
    out = [r_.asDict() for r_ in join_cardinality_audit(l, r, "k").collect()]
    # only key 1 is on both sides; nulls excluded
    assert out == [{"join_key": 1, "n_left": 3, "n_right": 2, "out_rows": 6}]


def test_join_cardinality_topk_order(spark):
    from feat_spark.plans.audit import join_cardinality_audit

    rows = [(k,) for k in [1, 1, 1, 2, 2, 3]]
    df = spark.createDataFrame(rows, "k long")
    out = join_cardinality_audit(df, df, "k", top_k=2).collect()
    assert [r["join_key"] for r in out] == [1, 2]
    assert [r["out_rows"] for r in out] == [9, 4]


# ----------------------------------------------------------- k_anonymity_audit


def test_k_anonymity_audit(spark):
    from feat_spark.plans.audit import k_anonymity_audit

    rows = [("a", 1)] * 5 + [("b", 1)] * 2 + [("c", None)]
    df = spark.createDataFrame(rows, "q1 string, q2 long")
    out = {
        (r["q1"], r["q2"]): (r["n"], r["risk"])
        for r in k_anonymity_audit(df, ["q1", "q2"], k=5).collect()
    }
    # group a (n=5) compliant; b (n=2) and the NULL-q2 group (n=1) violate
    assert out == {("b", 1): (2, 0.5), ("c", None): (1, 1.0)}


# ----------------------------------------------------------------- rolling_corr


def test_rolling_corr_perfect_and_anti(spark):
    from feat_spark.operators.rolling import rolling_corr

    rows = [(1, i, float(i), float(2 * i + 3), float(-i)) for i in range(5)]
    df = spark.createDataFrame(rows, "k long, i long, ts double, y1 double, y2 double")
    pos = rolling_corr(df, "k", ["i"], "y1", "y1", window=5).orderBy("i").collect()
    # self-correlation: NULL until min_periods, then exactly 1
    assert [r["r"] for r in pos] == [None, None, 1.0, 1.0, 1.0]
    anti = rolling_corr(df, "k", ["i"], "y1", "y2", window=5).orderBy("i").collect()
    assert [r["r"] for r in anti] == [None, None, -1.0, -1.0, -1.0]


def test_rolling_corr_zero_variance_null(spark):
    from feat_spark.operators.rolling import rolling_corr

    rows = [(1, i, 5.0, float(i)) for i in range(4)]
    df = spark.createDataFrame(rows, "k long, i long, x double, y double")
    out = rolling_corr(df, "k", ["i"], "x", "y", window=4).collect()
    assert all(r["r"] is None for r in out)  # constant x: undefined


# ---------------------------------------------------------- incremental rollup


def test_merge_rollup_identity(spark):
    from feat_spark.plans.incremental import build_rollup, merge_rollup
    from pyspark.sql import functions as F

    rows = [("a", 1.0), ("a", 2.0), ("a", 7.0), ("b", 5.0)]
    df = spark.createDataFrame(rows, "k string, v double").withColumn(
        "vd", F.col("v").cast("decimal(18,2)")
    )
    ms = [("n", "count", "v"), ("s", "sum", "vd"),
          ("lo", "min", "vd"), ("hi", "max", "vd")]
    old = build_rollup(df.filter("v < 3"), ["k"], ms)
    new = build_rollup(df.filter("v >= 3"), ["k"], ms)
    merged = {
        r["k"]: (r["n"], float(r["s"]), float(r["lo"]), float(r["hi"]))
        for r in merge_rollup(old, new, ["k"], ms).collect()
    }
    assert merged == {"a": (3, 10.0, 1.0, 7.0), "b": (1, 5.0, 5.0, 5.0)}


def test_build_rollup_rejects_non_algebraic(spark):
    import pytest

    from feat_spark.plans.incremental import build_rollup

    df = spark.createDataFrame([("a", 1.0)], "k string, v double")
    with pytest.raises(ValueError, match="not an algebraic"):
        build_rollup(df, ["k"], [("m", "median", "v")])


# --------------------------------------------------------------------- bitmap


def test_bitmap_overlap_matches_direct(spark):
    from feat_spark.operators.bitmap import bitmap_index, bitmap_intersect

    # entities straddle a word boundary (63/64) on purpose
    rows = [("a", 1), ("a", 63), ("a", 64), ("a", 200),
            ("b", 63), ("b", 64), ("b", 999),
            ("c", 5)]
    df = spark.createDataFrame(rows, "s string, e long")
    out = {
        (r["seg_a"], r["seg_b"]): r["n_common"]
        for r in bitmap_intersect(bitmap_index(df, "s", "e")).collect()
    }
    assert out == {("a", "b"): 2}  # 63 and 64; (a,c)/(b,c) share none


def test_bitmap_index_dedups_membership(spark):
    from feat_spark.operators.bitmap import bitmap_index, bitmap_intersect

    rows = [("a", 7), ("a", 7), ("b", 7)]
    df = spark.createDataFrame(rows, "s string, e long")
    out = bitmap_intersect(bitmap_index(df, "s", "e")).collect()
    assert len(out) == 1 and out[0]["n_common"] == 1


# ------------------------------------------------------------ time_travel_plan


def test_time_travel_plan_replay(spark):
    from feat_spark.sources.layout import time_travel_plan

    log = spark.createDataFrame(
        [
            (1, "f1", "add"),
            (2, "f1", "remove"),
            (3, "f1", "add"),     # re-added: visible at >=3
            (1, "f2", "add"),
            (4, "f2", "remove"),  # removed after the read point
            (5, "f3", "add"),     # added after the read point
        ],
        "snapshot_id long, path string, op string",
    )
    at3 = {r["path"]: r["added_at"] for r in time_travel_plan(log, 3).collect()}
    assert at3 == {"f1": 3, "f2": 1}
    at2 = {r["path"]: r["added_at"] for r in time_travel_plan(log, 2).collect()}
    assert at2 == {"f2": 1}  # f1's latest action at 2 is the remove
    at5 = {r["path"]: r["added_at"] for r in time_travel_plan(log, 5).collect()}
    assert at5 == {"f1": 3, "f3": 5}


# ------------------------------------------------------------ arrow_text_bytes


def test_arrow_text_bytes_multibyte(spark):
    from feat_spark.functions.udfs import arrow_text_bytes

    df = spark.createDataFrame(
        [(1, "abc"), (2, "café"), (3, "")], "doc_id long, text string"
    )
    out = {r["id"]: (r["n_bytes"], r["n_chars"])
           for r in arrow_text_bytes(df, "doc_id", "text").collect()}
    assert out == {1: (3, 3), 2: (5, 4), 3: (0, 0)}


# ------------------------------------------------------------ stratified_kfold


def test_stratified_kfold_balance(spark):
    from feat_spark.operators.sampling import stratified_kfold

    rows = [(i, "a" if i < 11 else "b") for i in range(18)]
    df = spark.createDataFrame(rows, "id long, s string")
    out = stratified_kfold(df, ["s"], "id", k=3).collect()
    from collections import Counter

    for stratum, size in (("a", 11), ("b", 7)):
        c = Counter(r["fold"] for r in out if r["s"] == stratum)
        assert sum(c.values()) == size
        assert max(c.values()) - min(c.values()) <= 1  # size-exact
    # frozen-random: stable across invocations
    again = stratified_kfold(df, ["s"], "id", k=3).collect()
    assert {(r["id"], r["fold"]) for r in again} == {
        (r["id"], r["fold"]) for r in out
    }


# ------------------------------------------------------------------ did_readout


def test_did_readout_hand_values(spark):
    from feat_spark.operators.experiment import did_readout

    rows = [
        (True, False, 10.0), (True, False, 20.0),   # T pre mean 15
        (True, True, 40.0),                          # T post mean 40
        (False, False, 5.0),                         # C pre mean 5
        (False, True, 10.0),                         # C post mean 10
    ]
    df = spark.createDataFrame(rows, "t boolean, p boolean, v double")
    out = did_readout(df, "t", "p", "v").collect()[0]
    assert out["mean_treat_pre"] == 15.0 and out["mean_treat_post"] == 40.0
    assert out["did"] == (40.0 - 15.0) - (10.0 - 5.0)


def test_did_readout_empty_cell_null(spark):
    from feat_spark.operators.experiment import did_readout

    rows = [(True, True, 1.0), (False, False, 2.0), (False, True, 3.0)]
    df = spark.createDataFrame(rows, "t boolean, p boolean, v double")
    out = did_readout(df, "t", "p", "v").collect()[0]
    assert out["mean_treat_pre"] is None and out["did"] is None


# --------------------------------------------------------------- centroid_drift


def test_centroid_drift_identical_and_orthogonal(spark):
    from feat_spark.operators.similarity import centroid_drift

    rows = [
        ("same", "pre", [1.0, 0.0]), ("same", "post", [1.0, 0.0]),
        ("orth", "pre", [1.0, 0.0]), ("orth", "post", [0.0, 1.0]),
        ("anti", "pre", [1.0, 0.0]), ("anti", "post", [-1.0, 0.0]),
        ("lonely", "pre", [1.0, 0.0]),  # no post: absent from output
    ]
    df = spark.createDataFrame(rows, "g string, p string, embedding array<float>")
    out = {r["g"]: r["drift_cosine"] for r in centroid_drift(df, "g", "p").collect()}
    assert out == {"same": 1.0, "orth": 0.0, "anti": -1.0}


# ------------------------------------------------------------ frame_sample_plan


def test_frame_sample_plan_midpoints(spark):
    from feat_spark.operators.multimodal import frame_sample_plan

    df = spark.createDataFrame([(1, 8.0), (2, 0.0)], "id long, dur double")
    out = [
        (r["frame_idx"], r["t_ms"])
        for r in frame_sample_plan(df, "id", "dur", k=4).orderBy("frame_idx").collect()
    ]
    # 8s at k=4: midpoints at 1s, 3s, 5s, 7s; zero-duration asset absent
    assert out == [(0, 1000), (1, 3000), (2, 5000), (3, 7000)]


# ----------------------------------------------------------------- dedup_report


def test_dedup_report_counts(spark):
    from feat_spark.operators.dedup import dedup_report

    comps = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 3), (4, 3)], "doc_id long, component long"
    )
    docs = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "a"), (4, "b"), (5, "b")],
        "doc_id long, source string",
    )
    out = {r["source"]: r for r in dedup_report(comps, docs, "source").collect()}
    # source a: 3 docs, 3 in clusters, 2 clusters -> 1 redundant
    a = out["a"]
    assert (a["n_docs"], a["n_dup_members"], a["n_clusters"]) == (3, 3, 2)
    assert a["dup_rate"] == round(1 / 3, 6)
    # source b: doc 4 clustered (cross-source cluster 3 counted here too)
    b = out["b"]
    assert (b["n_docs"], b["n_dup_members"], b["n_clusters"]) == (2, 1, 1)
    assert b["dup_rate"] == 0.0


# ------------------------------------------------------ dow_seasonality_strength


def test_dow_seasonality_extremes(spark):
    import datetime

    from feat_spark.operators.profile import dow_seasonality_strength

    base = datetime.datetime(2024, 1, 1)  # a Monday
    rows = []
    for d in range(28):
        ts = base + datetime.timedelta(days=d)
        dow = d % 7
        # key "seasonal": value fully determined by dow
        rows.append(("seasonal", ts, float(dow)))
        # key "flat": constant -> NULL eta2
        rows.append(("flat", ts, 5.0))
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    out = {r["k"]: r["eta2"] for r in dow_seasonality_strength(df, "k").collect()}
    assert out["seasonal"] == 1.0
    assert out["flat"] is None


# ------------------------------------------------------ stream_maintain_rollup


def test_stream_maintain_rollup_crash_shape(spark, tmp_path):
    # batch-path identity: applying two deltas sequentially through the
    # foreachBatch body's logic == one from-scratch rollup (the
    # streaming wiring is exercised end-to-end by the driver gate)
    from feat_spark.plans.incremental import build_rollup, merge_rollup
    from pyspark.sql import functions as F

    rows = [("a", 1.0), ("a", 2.0), ("b", 3.0), ("a", 4.0)]
    df = spark.createDataFrame(rows, "k string, v double").withColumn(
        "vd", F.col("v").cast("decimal(18,2)")
    )
    ms = [("n", "count", "v"), ("s", "sum", "vd")]
    b1, b2 = df.filter("v <= 2"), df.filter("v > 2")
    state = build_rollup(b1, ["k"], ms)
    state = merge_rollup(state, build_rollup(b2, ["k"], ms), ["k"], ms)
    got = {r["k"]: (r["n"], float(r["s"])) for r in state.collect()}
    want = {
        r["k"]: (r["n"], float(r["s"]))
        for r in build_rollup(df, ["k"], ms).collect()
    }
    assert got == want


# ------------------------------------------------------- daily_percentile_bands


def test_daily_bands_quartiles(spark):
    from feat_spark.operators.profile import daily_percentile_bands

    rows = [("a", "2024-01-01 0%d:00:00" % h, float(v))
            for h, v in enumerate([1, 2, 3, 4, 5])]
    df = spark.createDataFrame(rows, "k string, ts string, value double") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    out = daily_percentile_bands(df, "k").collect()[0]
    assert (out["n"], out["p25"], out["p50"], out["p75"]) == (5, 2.0, 3.0, 4.0)


# ------------------------------------------------------------ scd_overlap_audit


def test_scd_overlap_audit(spark):
    from feat_spark.plans.audit import scd_overlap_audit

    rows = [
        (1, 0, 5), (1, 5, 10),    # touching, NOT overlapping
        (1, 8, 12),               # overlaps previous (8 < 10)
        (2, 0, None), (2, 3, 7),  # open-ended row followed by another
        (3, 0, 4),                # clean singleton
    ]
    df = spark.createDataFrame(rows, "k long, valid_from long, valid_to long")
    out = {(r["k"], r["valid_from"]) for r in scd_overlap_audit(df, "k").collect()}
    assert out == {(1, 8), (2, 3)}


# ---------------------------------------------------------------- window_funnel


def test_window_funnel_depths(spark):
    from feat_spark.operators.funnel import window_funnel

    rows = [
        # user 1: full chain inside the window
        (1, "view", "2024-01-01 00:00:00"),
        (1, "click", "2024-01-01 00:10:00"),
        (1, "buy", "2024-01-01 00:20:00"),
        # user 2: step 3 lands outside the window of the only anchor
        (2, "view", "2024-01-01 00:00:00"),
        (2, "click", "2024-01-01 00:10:00"),
        (2, "buy", "2024-01-01 02:00:00"),
        # user 3: steps out of order -> depth 1
        (3, "click", "2024-01-01 00:00:00"),
        (3, "view", "2024-01-01 00:10:00"),
        # user 4: no anchor at all -> absent
        (4, "click", "2024-01-01 00:00:00"),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts string") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    out = {
        r["user_id"]: (r["n_anchors"], r["max_depth"])
        for r in window_funnel(df, ["view", "click", "buy"], window_s=3600).collect()
    }
    assert out == {1: (1, 3), 2: (1, 2), 3: (1, 1)}


def test_window_funnel_no_step_skipping(spark):
    from feat_spark.operators.funnel import window_funnel

    # step 3 present but step 2 missing: depth stays 1 (no skipping)
    rows = [
        (1, "view", "2024-01-01 00:00:00"),
        (1, "buy", "2024-01-01 00:10:00"),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts string") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    out = window_funnel(df, ["view", "click", "buy"], window_s=3600).collect()
    assert out[0]["max_depth"] == 1


# ------------------------------------------------------------ growth_accounting


def test_growth_accounting_classification(spark):
    import datetime

    from feat_spark.operators.funnel import growth_accounting

    base = datetime.datetime(2024, 1, 1)

    def t(d):
        return base + datetime.timedelta(days=d)

    rows = [
        (1, t(0)), (1, t(1)),            # new day0, retained day1
        (1, t(20)),                       # resurrected (gap 19 > 7)
        (2, t(1)),                        # new day1
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {r["day"]: (r["n_active"], r["n_new"], r["n_retained"], r["n_resurrected"])
           for r in growth_accounting(df).collect()}
    d0 = 19723  # 2024-01-01 epoch day
    assert out[d0] == (1, 1, 0, 0)
    assert out[d0 + 1] == (2, 1, 1, 0)
    assert out[d0 + 20] == (1, 0, 0, 1)
