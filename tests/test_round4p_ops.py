"""Late-round-4 batch Z operators: last-k history as-of joins and
MAP@k retrieval evaluation. Hand-computed vectors."""

import datetime


def _ts(s):
    return datetime.datetime.fromisoformat(s)


# --------------------------------------------------------------- asof_lastk


def test_asof_lastk_carries_history_chain(spark):
    from feat_spark.operators.eventops import asof_lastk

    right = spark.createDataFrame(
        [
            ("u", _ts("2024-01-01T00:00:00"), 100),
            ("u", _ts("2024-01-05T00:00:00"), 200),
            ("u", _ts("2024-01-09T00:00:00"), 300),
        ],
        ["user_id", "ts", "cents"],
    )
    left = spark.createDataFrame(
        [
            (1, "u", _ts("2024-01-02T00:00:00")),  # only 100 visible
            (2, "u", _ts("2024-01-06T00:00:00")),  # 200, then 100
            (3, "u", _ts("2024-01-10T00:00:00")),  # 300, 200, 100
            (4, "u", _ts("2023-12-31T00:00:00")),  # nothing yet
        ],
        ["event_id", "user_id", "ts"],
    )
    out = {
        r["event_id"]: (r["last1"], r["last2"], r["last3"])
        for r in asof_lastk(left, right, on="user_id", value_col="cents", k=3).collect()
    }
    assert out[1] == (100, None, None)
    assert out[2] == (200, 100, None)
    assert out[3] == (300, 200, 100)
    assert out[4] == (None, None, None)


def test_asof_lastk_never_reads_forward(spark):
    from feat_spark.operators.eventops import asof_lastk

    right = spark.createDataFrame(
        [("u", _ts("2024-01-05T00:00:00"), 999)], ["user_id", "ts", "cents"]
    )
    left = spark.createDataFrame(
        [(1, "u", _ts("2024-01-04T23:59:59"))], ["event_id", "user_id", "ts"]
    )
    r = asof_lastk(left, right, on="user_id", value_col="cents", k=2).collect()[0]
    assert r["last1"] is None and r["last2"] is None


# ------------------------------------------------------------------ map_at_k


def _frames(spark, ranked_rows, truth_rows):
    a = spark.createDataFrame(ranked_rows, ["query_id", "item", "rank"])
    b = spark.createDataFrame(truth_rows, ["query_id", "item"])
    return a, b


def test_map_at_k_hand_values(spark):
    from feat_spark.operators.keywords import map_at_k

    ranked = [("q", f"i{r}", r) for r in range(1, 6)]
    # relevant: i1 and i3 -> AP = (1/1 + 2/3) / 2 = 5/6
    a, b = _frames(spark, ranked, [("q", "i1"), ("q", "i3")])
    r = map_at_k(a, b).collect()[0]
    assert r["n_rel"] == 2 and r["n_hits"] == 2
    assert abs(r["ap"] - 5 / 6) < 1e-9


def test_map_at_k_perfect_and_miss(spark):
    from feat_spark.operators.keywords import map_at_k

    ranked = [("q", f"i{r}", r) for r in range(1, 6)]
    a, b = _frames(spark, ranked, [("q", "i1"), ("q", "i2")])
    assert map_at_k(a, b).collect()[0]["ap"] == 1.0  # all hits up front
    a, b = _frames(spark, ranked, [("q", "zzz")])
    r = map_at_k(a, b).collect()[0]
    assert r["ap"] == 0.0 and r["n_hits"] == 0  # relevant but unretrieved


def test_map_at_k_order_sensitivity(spark):
    from feat_spark.operators.keywords import map_at_k

    truth = [("q", "x")]
    early, _ = _frames(spark, [("q", "x", 1), ("q", "y", 2)], truth)
    late, t = _frames(spark, [("q", "y", 1), ("q", "x", 2)], truth)
    ap_early = map_at_k(early, t).collect()[0]["ap"]
    ap_late = map_at_k(late, t).collect()[0]["ap"]
    assert ap_early == 1.0 and abs(ap_late - 0.5) < 1e-12
