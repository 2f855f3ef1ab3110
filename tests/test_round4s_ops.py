"""Late-round-4 batch DD operators: encoding-corruption audits and
time-to-nth-event labels. Hand-computed vectors."""

import datetime

from pyspark.sql import functions as F


def _ts(s):
    return datetime.datetime.fromisoformat(s)


# ---------------------------------------------------------- encoding_counts


def test_encoding_counts_each_category(spark):
    from feat_spark.functions.text import encoding_counts

    rows = [
        ("clean text",),
        ("bad � here �",),      # 2 replacement chars
        ("ctrl\x01and\x1f",),             # 2 control bytes
        ("cafÃ© mojibake",),    # 1 double-encoding digraph
        ("tab\tand\nnewline ok",),        # whitespace is NOT control
    ]
    df = spark.createDataFrame(rows, ["t"])
    c = encoding_counts("t")
    out = df.select(
        c["n_replacement"].alias("r"),
        c["n_control"].alias("c"),
        c["n_mojibake"].alias("m"),
    ).collect()
    assert [x["r"] for x in out] == [0, 2, 0, 0, 0]
    assert [x["c"] for x in out] == [0, 0, 2, 0, 0]
    assert [x["m"] for x in out] == [0, 0, 0, 1, 0]


# --------------------------------------------------------- time_to_nth_event


def test_time_to_nth_counts_distinct_times(spark):
    from feat_spark.operators.labels import time_to_nth_event

    base = _ts("2024-01-01T00:00:00")

    def ev(i, kind, hours):
        return (i, 1, kind, base + datetime.timedelta(hours=hours))

    rows = [
        ev(1, "view", 0),        # 3rd purchase after t=0 is at 30h
        ev(2, "purchase", 10),
        ev(3, "purchase", 20),
        ev(4, "purchase", 20),   # duplicate TIME — collapses
        ev(5, "purchase", 30),
        ev(6, "view", 25),       # only 1 distinct purchase time ahead
    ]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "event_type", "ts"])
    out = {
        r["id"]: r
        for r in time_to_nth_event(
            df, "user_id", "ts", "event_id",
            F.col("event_type") == "purchase", n=3,
            horizon_sec=100 * 3600,
        ).collect()
    }
    assert out[1]["observed"] is True
    assert out[1]["tte_sec"] == 30 * 3600
    # the purchase at t=10h sees distinct times {20,30} ahead: only 2
    assert out[2]["observed"] is False
    assert out[2]["tte_sec"] == 100 * 3600  # censored at horizon
    assert out[6]["observed"] is False


def test_time_to_nth_horizon_censors(spark):
    from feat_spark.operators.labels import time_to_nth_event

    base = _ts("2024-01-01T00:00:00")
    rows = [(1, 1, "view", base)] + [
        (i, 1, "purchase", base + datetime.timedelta(days=10 + i))
        for i in range(2, 5)
    ]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "event_type", "ts"])
    r = {
        x["id"]: x
        for x in time_to_nth_event(
            df, "user_id", "ts", "event_id",
            F.col("event_type") == "purchase", n=3, horizon_sec=86400,
        ).collect()
    }[1]
    assert r["observed"] is False and r["tte_sec"] == 86400


# ----------------------------------------------------------------- mrr_at_k


def test_mrr_first_hit_and_miss(spark):
    from feat_spark.operators.keywords import mrr_at_k

    ranked = spark.createDataFrame(
        [("q", f"i{r}", r) for r in range(1, 6)],
        ["query_id", "item", "rank"],
    )
    truth = spark.createDataFrame(
        [("q", "i3"), ("q", "i5"), ("m", "zz")], ["query_id", "item"]
    )
    out = {r["query_id"]: r for r in mrr_at_k(ranked, truth).collect()}
    assert out["q"]["first_hit_rank"] == 3
    assert abs(out["q"]["rr"] - 1 / 3) < 1e-8  # 9dp rounding
    assert out["q"]["success_at_k"] is True
    assert out["m"]["rr"] == 0.0 and out["m"]["success_at_k"] is False


# ----------------------------------------------------------- cms_join_size


def test_cms_join_size_one_sided_and_exact_rides(spark):
    from feat_spark.operators.cms import countmin_join_size

    a = spark.createDataFrame([("x",)] * 3 + [("y",)] * 2 + [("z",)], ["k"])
    b = spark.createDataFrame([("x",)] * 4 + [("y",)] * 1 + [("w",)] * 5, ["k"])
    r = countmin_join_size(a, b, "k", "k", depth=3, width=64).collect()[0]
    assert r["exact_join_rows"] == 3 * 4 + 2 * 1
    assert r["cms_estimate"] >= r["exact_join_rows"]


def test_cms_join_size_disjoint_keys(spark):
    from feat_spark.operators.cms import countmin_join_size

    a = spark.createDataFrame([("a",)] * 5, ["k"])
    b = spark.createDataFrame([("b",)] * 5, ["k"])
    r = countmin_join_size(a, b, "k", "k", depth=4, width=4096).collect()[0]
    assert r["exact_join_rows"] == 0
    # wide grid: with overwhelming probability no collision -> est 0
    assert r["cms_estimate"] == 0
