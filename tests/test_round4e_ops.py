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
