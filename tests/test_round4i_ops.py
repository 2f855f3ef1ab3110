"""Late-round-4 batch S operators: HDR-style mergeable quantile
sketches, Rand/ARI cluster agreement, rate/mix decomposition,
inactivity gap streaks, time-decay attribution. Hand-computed
vectors throughout."""

import datetime

from pyspark.sql import functions as F


def _rows(df, *order):
    if order:
        df = df.orderBy(*order)
    return [r.asDict() for r in df.collect()]


def _ts(s):
    return datetime.datetime.fromisoformat(s)


# ------------------------------------------------------------- hdr sketch


def test_hdr_bucket_edges_and_bound(spark):
    from feat_spark.operators.qsketch import hdr_buckets

    # v=157: major 8 (128..255), minor = 157*16 >> 7 - 16 = 3
    df = spark.createDataFrame([(157,), (128,), (255,)], ["v"])
    out = {r["major"]: r for r in hdr_buckets(df, "v").collect()}
    rows = _rows(hdr_buckets(df, "v"), "bucket")
    assert all(r["major"] == 8 for r in rows)
    minors = {r["minor"] for r in rows}
    assert minors == {0, 3, 15}  # 128 -> 0, 157 -> 3, 255 -> 15
    _ = out


def test_hdr_percentile_exact_on_powers_of_two(spark):
    from feat_spark.operators.qsketch import hdr_percentiles

    # ten copies each of 16 and 64: p50 -> bucket of 16 (edge 16.0),
    # p990 -> bucket of 64 (edge 64.0) — both exactly on edges
    df = spark.createDataFrame([(16,)] * 10 + [(64,)] * 10, ["v"])
    out = {r["p_milli"]: r for r in hdr_percentiles(df, "v", (500, 990)).collect()}
    assert out[500]["est"] == 16.0 and out[500]["target_rank"] == 10
    assert out[990]["est"] == 64.0


def test_hdr_relative_error_bound_holds(spark):
    from feat_spark.operators.qsketch import hdr_percentiles

    import math

    vals = [(v,) for v in range(1, 2000, 7)]
    df = spark.createDataFrame(vals, ["v"])
    sorted_vals = sorted(v for (v,) in vals)
    for r in hdr_percentiles(df, "v", (500, 900, 990)).collect():
        exact = sorted_vals[r["target_rank"] - 1]
        # lower-edge estimate: est <= exact < est * 17/16
        assert r["est"] <= exact < r["est"] * (17 / 16) + 1e-9, (
            r["p_milli"], r["est"], exact,
        )
    _ = math


def test_hdr_buckets_merge_by_addition(spark):
    from feat_spark.operators.qsketch import hdr_buckets

    a = spark.createDataFrame([(10,), (20,), (300,)], ["v"])
    b = spark.createDataFrame([(10,), (4000,)], ["v"])
    both = a.unionAll(b)
    merged = (
        hdr_buckets(a, "v")
        .unionAll(hdr_buckets(b, "v"))
        .groupBy("bucket", "major", "minor")
        .agg(F.sum("n").alias("n"))
    )
    direct = hdr_buckets(both, "v")
    assert sorted(_rows(merged), key=lambda r: r["bucket"]) == sorted(
        _rows(direct), key=lambda r: r["bucket"]
    )


# ------------------------------------------------------------- rand_index


def test_rand_index_perfect_and_known(spark):
    from feat_spark.operators.experiment import rand_index

    # identical clusterings -> RI = ARI = 1
    df = spark.createDataFrame(
        [(1, "x"), (1, "x"), (2, "y"), (2, "y")], ["p", "t"]
    )
    r = rand_index(df, "p", "t").collect()[0]
    assert r["ri"] == 1.0 and r["ari"] == 1.0
    assert r["n_pred_clusters"] == 2 and r["n_truth_clusters"] == 2


def test_rand_index_hand_value(spark):
    from feat_spark.operators.experiment import rand_index

    # classic vector: pred {a,a,b}, truth {x,y,y} on 3 items:
    # pairs: (1,2) together-pred/apart-truth, (2,3) apart/together,
    # (1,3) apart/apart -> RI = 1/3
    df = spark.createDataFrame(
        [(1, "a", "x"), (2, "a", "y"), (3, "b", "y")], ["i", "p", "t"]
    )
    r = rand_index(df.select("p", "t"), "p", "t").collect()[0]
    assert abs(r["ri"] - 1 / 3) < 1e-9
    assert r["ari"] < 0  # worse than chance


def test_rand_index_single_item_degenerate(spark):
    from feat_spark.operators.experiment import rand_index

    df = spark.createDataFrame([("a", "x")], ["p", "t"])
    r = rand_index(df, "p", "t").collect()[0]
    assert r["ri"] is None and r["ari"] is None


# -------------------------------------------------------------- mix_shift


def test_mix_shift_identity_and_pure_cases(spark):
    from feat_spark.operators.profile import mix_shift

    # seg s1: rate 100 in both periods, share shifts 50% -> 25%
    # seg s2: rate 200->300, share 50% -> 75%
    rows = [
        ("a", "s1", 10, 1000), ("a", "s2", 10, 2000),
        ("b", "s1", 5, 500), ("b", "s2", 15, 4500),
    ]
    df = spark.createDataFrame(rows, ["p", "seg", "n", "cents"])
    out = {r["segment"]: r for r in mix_shift(df, "p", "seg", "n", "cents").collect()}
    s1, s2 = out["s1"], out["s2"]
    assert s1["rate_effect"] == 0.0  # rate unchanged
    assert abs(s1["mix_effect"] - (0.25 - 0.5) * 100) < 1e-9
    assert abs(s2["rate_effect"] - 0.75 * 100) < 1e-9
    assert abs(s2["mix_effect"] - (0.75 - 0.5) * 200) < 1e-9
    # identity: effects sum to overall rate delta
    ra = (1000 + 2000) / 20
    rb = (500 + 4500) / 20
    tot = sum(r["rate_effect"] + r["mix_effect"] for r in out.values())
    assert abs(tot - (rb - ra)) < 1e-9


def test_mix_shift_new_segment_is_pure_mix(spark):
    from feat_spark.operators.profile import mix_shift

    rows = [("a", "old", 10, 1000), ("b", "old", 5, 500), ("b", "new", 5, 1500)]
    df = spark.createDataFrame(rows, ["p", "seg", "n", "cents"])
    out = {r["segment"]: r for r in mix_shift(df, "p", "seg", "n", "cents").collect()}
    new = out["new"]
    assert new["w_a"] == 0.0 and new["rate_effect"] == 0.0
    assert abs(new["mix_effect"] - 0.5 * 300) < 1e-9


# ------------------------------------------------------------- gap_streaks


def test_gap_streaks_hand_vector(spark):
    from feat_spark.operators.eventops import gap_streaks

    def ev(u, day):
        return (u, _ts(f"2024-01-{day:02d}T12:00:00"))

    # u1 active days 1,2,5,9: gaps 0, 2, 3 -> max 3, over-2 count 1
    # u2 single day: no gaps
    rows = [ev(1, 1), ev(1, 2), ev(1, 5), ev(1, 9), ev(2, 4)]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    out = {r["entity"]: r for r in gap_streaks(df, "user_id", alert_gap_days=2).collect()}
    assert out[1]["n_active_days"] == 4
    assert out[1]["max_gap_days"] == 3 and out[1]["n_gaps_over"] == 1
    assert out[2]["max_gap_days"] is None and out[2]["n_gaps_over"] == 0


# ------------------------------------------------------- time-decay model


def test_attribute_time_decay_weights(spark):
    from feat_spark.operators.attribution import attribute_time_decay

    # conversion at day 8 noon, value 10.00 (1000 cents):
    #   click 1h before   -> age 0d -> weight 128
    #   view  2d before   -> age 2d -> weight 32
    rows = [
        (1, 1, "purchase", _ts("2024-01-08T12:00:00"), 10.0),
        (2, 1, "click", _ts("2024-01-08T11:00:00"), 0.0),
        (3, 1, "view", _ts("2024-01-06T12:00:00"), 0.0),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "user_id", "event_type", "ts", "value"]
    )
    out = {r["touch_type"]: r for r in attribute_time_decay(df).collect()}
    sw = 128 + 32
    assert out["click"]["weight_sum"] == 128
    assert out["view"]["weight_sum"] == 32
    assert out["click"]["decay_micros"] == (1000 * 10000 * 128) // sw
    assert out["view"]["decay_micros"] == (1000 * 10000 * 32) // sw
    # click gets 4x the view's credit (2 days = 2 halvings)
    assert abs(out["click"]["decay_value"] / out["view"]["decay_value"] - 4) < 1e-6


def test_attribute_time_decay_outside_lookback_drops(spark):
    from feat_spark.operators.attribution import attribute_time_decay

    rows = [
        (1, 1, "purchase", _ts("2024-01-20T12:00:00"), 5.0),
        (2, 1, "click", _ts("2024-01-01T12:00:00"), 0.0),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "user_id", "event_type", "ts", "value"]
    )
    assert attribute_time_decay(df).count() == 0
