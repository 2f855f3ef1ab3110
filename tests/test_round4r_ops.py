"""Late-round-4 batch CC operators: embedding health audits,
deterministic class rebalancing, holiday-distance features."""

import datetime

from pyspark.sql import functions as F


def _ts(s):
    return datetime.datetime.fromisoformat(s)


# --------------------------------------------------------- embedding_health


def test_embedding_health_counts_failures(spark):
    from feat_spark.operators.vectors import embedding_health

    rows = [
        (1, [3.0, 4.0]),        # norm2 = 25
        (2, [0.0, 0.0]),        # zero vector
        (3, None),              # null vector
        (4, [1.0, 0.0, 0.0]),   # dimension drift (3 dims), norm2 = 1
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    r = embedding_health(df, "embedding", "vec_id").collect()[0]
    assert r["n_rows"] == 4 and r["n_null"] == 1 and r["n_zero"] == 1
    assert r["n_dims_min"] == 2 and r["n_dims_max"] == 3
    # norms present: {0, 1, 25}; p50 -> rank 2 -> 1.0
    assert r["p50_norm2"] == 1.0 and r["p90_norm2"] == 25.0


# ------------------------------------------------------ class_balance_sample


def test_class_balance_keeps_minority_thins_majority(spark):
    from feat_spark.operators.sampling import class_balance_sample

    rows = [(i, 1) for i in range(50)] + [(i, 0) for i in range(50, 1050)]
    df = spark.createDataFrame(rows, ["id", "y"])
    out = class_balance_sample(df, "y", "id")
    got = out.groupBy("y").count().collect()
    c = {r["y"]: r["count"] for r in got}
    assert c[1] == 50  # every minority row survives
    # majority thinned to ~50 in expectation (hash Bernoulli: allow 3σ)
    assert 25 <= c[0] <= 85
    # determinism: same input -> identical sample
    a = sorted(r["id"] for r in out.collect())
    b = sorted(r["id"] for r in class_balance_sample(df.repartition(7), "y", "id").collect())
    assert a == b


# --------------------------------------------------------- holiday_distance


def test_holiday_distance_sign_and_nearest(spark):
    from feat_spark.operators.encoding import holiday_distance

    df = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00")),  # the holiday itself
            (2, _ts("2023-12-30T10:00:00")),  # 2 days BEFORE -> -2
            (3, _ts("2024-01-03T10:00:00")),  # 2 days after -> +2
            (4, _ts("2024-01-10T10:00:00")),  # nearer to Jan 15 -> -5
        ],
        ["id", "ts"],
    )
    out = {
        r["id"]: r["d"]
        for r in df.select(
            "id",
            holiday_distance(df, "ts", ["2024-01-01", "2024-01-15"]).alias("d"),
        ).collect()
    }
    assert out[1] == 0 and out[2] == -2 and out[3] == 2 and out[4] == -5


def test_holiday_distance_tie_resolves_ahead(spark):
    from feat_spark.operators.encoding import holiday_distance

    # exactly between Jan 1 and Jan 5 -> |d| = 2 both ways -> ahead (-2)
    df = spark.createDataFrame([(1, _ts("2024-01-03T00:00:00"))], ["id", "ts"])
    r = df.select(
        holiday_distance(df, "ts", ["2024-01-01", "2024-01-05"]).alias("d")
    ).collect()[0]
    assert r["d"] == -2
