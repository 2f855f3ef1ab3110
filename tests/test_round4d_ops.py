"""Late-round-4 batch D operators: skip-gram sequence pairs,
multi-touch attribution, level-shift change-point scan, RFM
segmentation. Hand-computed vectors throughout."""

import datetime

from pyspark.sql import functions as F


def _rows(df, *order):
    if order:
        df = df.orderBy(*order)
    return [r.asDict() for r in df.collect()]


# ------------------------------------------------------------ skipgram_pairs


def test_skipgram_pairs_window2(spark):
    from feat_spark.operators.cooccur import skipgram_pairs

    rows = [("u", i, t) for i, t in enumerate(["a", "b", "c", "a"])]
    df = spark.createDataFrame(rows, "k string, i long, t string")
    out = {
        (r["center"], r["context"]): r["n_pairs"]
        for r in _rows(skipgram_pairs(df, "k", ["i"], "t", window=2))
    }
    assert out == {
        ("a", "b"): 1,
        ("a", "c"): 1,
        ("b", "c"): 1,
        ("b", "a"): 1,
        ("c", "a"): 1,
    }


def test_skipgram_pairs_key_isolation(spark):
    from feat_spark.operators.cooccur import skipgram_pairs

    rows = [("u", 0, "a"), ("v", 1, "b")]
    df = spark.createDataFrame(rows, "k string, i long, t string")
    # window never crosses keys: no pair exists
    assert skipgram_pairs(df, "k", ["i"], "t", window=3).count() == 0


# ------------------------------------------------------ attribute_conversions


def _ev(rows, spark):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double"
    )


def test_attribution_linear_and_last(spark):
    from feat_spark.operators.attribution import attribute_conversions

    t0 = datetime.datetime(2024, 1, 10)

    def at(s):
        return t0 + datetime.timedelta(seconds=s)

    rows = [
        (1, at(0), 7, "click", 0.0),
        (2, at(10), 7, "view", 0.0),
        (3, at(20), 7, "purchase", 10.0),
        # second user: touch OUTSIDE the lookback -> conversion dropped
        (4, at(0), 8, "click", 0.0),
        (5, at(100_000), 8, "purchase", 5.0),
        # third user: conversion with no touch at all -> dropped
        (6, at(50), 9, "purchase", 3.0),
    ]
    out = {
        r["touch_type"]: r
        for r in _rows(
            attribute_conversions(_ev(rows, spark), lookback_s=3600)
        )
    }
    assert set(out) == {"click", "view"}
    # both touches split 1000 cents -> 5_000_000 micro-cents each
    assert out["click"]["linear_micros"] == 5_000_000
    assert out["view"]["linear_micros"] == 5_000_000
    assert out["view"]["linear_value"] == 5.0
    # the view is the LAST touch
    assert out["view"]["n_last"] == 1 and out["click"]["n_last"] == 0
    assert out["view"]["last_touch_cents"] == 1000
    assert out["click"]["last_touch_cents"] == 0


def test_attribution_floor_allocation(spark):
    from feat_spark.operators.attribution import attribute_conversions

    t0 = datetime.datetime(2024, 1, 10)

    def at(s):
        return t0 + datetime.timedelta(seconds=s)

    # 3 touches over 0.01 -> 1 cent -> 10000 micros div 3 = 3333 each
    rows = [
        (1, at(0), 7, "click", 0.0),
        (2, at(1), 7, "click", 0.0),
        (3, at(2), 7, "click", 0.0),
        (4, at(3), 7, "purchase", 0.01),
    ]
    out = _rows(attribute_conversions(_ev(rows, spark), lookback_s=3600))
    assert len(out) == 1
    assert out[0]["linear_micros"] == 3 * 3333  # floor residual = 1 micro


# ------------------------------------------------------------ changepoint_scan


def test_changepoint_level_shift(spark):
    from feat_spark.operators.profile import changepoint_scan

    base = datetime.datetime(2024, 1, 1)
    rows = []
    for d in range(14):
        n = 2 if d < 7 else 10
        for j in range(n):
            rows.append(("u", base + datetime.timedelta(days=d, minutes=j)))
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    out = _rows(changepoint_scan(df, "user_id", w=3, threshold=4.0), "day")
    assert len(out) == 14
    # first 3 days: left side too thin -> NULL, never flagged
    assert all(r["mean_shift"] is None for r in out[:3])
    assert not any(r["is_changepoint"] for r in out[:3])
    # the true shift day (idx 7): left = 2,2,2; right = 10,10,10
    assert out[7]["mean_shift"] == 8.0 and out[7]["is_changepoint"]
    # last 2 days: right side too thin -> NULL
    assert all(r["mean_shift"] is None for r in out[12:])
    # stable plateaus far from the shift never flag
    assert not out[4]["is_changepoint"] and not out[11]["is_changepoint"]


def test_changepoint_constant_series_silent(spark):
    from feat_spark.operators.profile import changepoint_scan

    base = datetime.datetime(2024, 1, 1)
    rows = [
        ("u", base + datetime.timedelta(days=d, minutes=j))
        for d in range(10)
        for j in range(3)
    ]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    out = _rows(changepoint_scan(df, "user_id", w=3), "day")
    assert not any(r["is_changepoint"] for r in out)
    mids = [r["mean_shift"] for r in out if r["mean_shift"] is not None]
    assert mids and all(m == 0.0 for m in mids)


# --------------------------------------------------------------- rfm_segments


def test_rfm_quartiles(spark):
    from feat_spark.operators.encoding import rfm_segments

    base = datetime.datetime(2024, 1, 1)
    rows = []
    for k, (ago, price) in enumerate(
        [(0, 100.0), (10, 200.0), (20, 300.0), (30, 400.0)], start=1
    ):
        rows.append((k, base + datetime.timedelta(days=30 - ago), price))
    df = spark.createDataFrame(
        rows, "o_custkey long, o_orderdate timestamp, o_totalprice double"
    )
    out = {r["o_custkey"]: r for r in _rows(rfm_segments(df))}
    # recencies 0/10/20/30 -> quartile cuts 7.5/15/22.5 -> scores 1..4
    assert [out[k]["r_q"] for k in (1, 2, 3, 4)] == [1, 2, 3, 4]
    assert [out[k]["m_q"] for k in (1, 2, 3, 4)] == [1, 2, 3, 4]
    # all frequencies tie at 1 -> everyone lands in ONE bucket
    assert [out[k]["f_q"] for k in (1, 2, 3, 4)] == [1, 1, 1, 1]
    assert out[1]["rfm"] == 111 and out[4]["rfm"] == 414
    assert out[4]["monetary_cents"] == 40000
    assert out[4]["recency_days"] == 30


def test_rfm_explicit_as_of(spark):
    from feat_spark.operators.encoding import rfm_segments

    base = datetime.datetime(2024, 1, 1)  # epoch day 19723
    df = spark.createDataFrame(
        [(1, base, 50.0)],
        "o_custkey long, o_orderdate timestamp, o_totalprice double",
    )
    out = _rows(rfm_segments(df, as_of_day=19723 + 5))
    assert out[0]["recency_days"] == 5


# ------------------------------------------------------------------ group_auc


def test_group_auc_perfect_anti_ties(spark):
    from feat_spark.operators.experiment import group_auc

    rows = (
        [("g", float(s), y) for s, y in [(1, 0), (2, 0), (3, 1), (4, 1)]]
        + [("b", float(s), y) for s, y in [(1, 1), (2, 1), (3, 0), (4, 0)]]
        + [("c", float(s), y) for s, y in [(1, 0), (1, 1), (2, 1)]]
        + [("d", 1.0, 1), ("d", 2.0, 1)]  # degenerate: no negatives
    )
    df = spark.createDataFrame(rows, "g string, score double, y long")
    out = {r["g"]: r for r in [r.asDict() for r in group_auc(df, "g", "score", "y").collect()]}
    assert out["g"]["auc"] == 1.0
    assert out["b"]["auc"] == 0.0
    # one tie across classes at score 1: AUC = (0.5 + 1) / 2
    assert out["c"]["auc"] == 0.75
    assert out["d"]["auc"] is None
    assert (out["g"]["n_pos"], out["g"]["n_neg"]) == (2, 2)


# ---------------------------------------------------------------- label_churn


def test_label_churn_gaps_and_censoring(spark):
    from feat_spark.operators.labels import label_churn
    import datetime

    base = datetime.datetime(2024, 1, 1)
    rows = [
        ("u", base + datetime.timedelta(days=d, hours=h))
        for d in (0, 3, 30)
        for h in (1, 2)  # two events per active day -> distinct() grain
    ]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    out = _rows(label_churn(df, "user_id", horizon_days=14), "day")
    assert [r["gap_days"] for r in out] == [3, 27, None]
    assert [r["is_churn"] for r in out] == [False, True, None]


# ------------------------------------------------------------ compaction_plan


def test_compaction_first_fit_bins(spark):
    from feat_spark.sources.layout import compaction_plan

    rows = [("p", f"f{i}", b) for i, b in enumerate([600, 300, 200, 100])] + [
        ("q", "g0", 50)
    ]
    df = spark.createDataFrame(rows, "part string, path string, bytes long")
    out = _rows(
        compaction_plan(df, "part", "path", "bytes", target_bytes=500),
        "part", F.col("bytes").desc(),
    )
    by_file = {r["path"]: r for r in out}
    # 600 fills bin 0 alone; 300+200 pack bin 1 exactly; 100 spills to 2
    assert by_file["f0"]["bin"] == 0 and by_file["f0"]["bin_bytes"] == 600
    assert by_file["f1"]["bin"] == 1 and by_file["f2"]["bin"] == 1
    assert by_file["f1"]["bin_bytes"] == 500 and by_file["f1"]["bin_files"] == 2
    assert by_file["f3"]["bin"] == 2
    # partitions plan independently
    assert by_file["g0"]["bin"] == 0


# --------------------------------------------------------------- basket_rules


def test_basket_rules_support_conf_lift(spark):
    from feat_spark.operators.cooccur import basket_rules

    rows = [(1, 1), (1, 2), (2, 1), (2, 2), (3, 1), (3, 3), (1, 1)]
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    out = _rows(basket_rules(df, min_support=2))
    assert len(out) == 1  # (1,3) has support 1 -> pruned
    r = out[0]
    assert (r["item_a"], r["item_b"], r["n_ab"]) == (1, 2, 2)
    assert (r["n_a"], r["n_b"]) == (3, 2)
    assert r["conf_ab"] == round(2 / 3, 6) and r["conf_ba"] == 1.0
    assert r["lift"] == 1.0  # 2*3/(3*2)


# --------------------------------------------------------- expectation_report


def test_expectation_report_all_kinds(spark):
    from feat_spark.plans.audit import expectation_report

    df = spark.createDataFrame(
        [
            (1, "a", 5.0),
            (2, "b", 50.0),
            (2, None, -1.0),  # dup id, null cat, below range
            (3, "z", None),   # cat outside set, null value
        ],
        "id long, cat string, v double",
    )
    out = {
        r["check"]: r
        for r in _rows(
            expectation_report(
                df,
                unique=[["id"]],
                not_null=["cat"],
                in_set={"cat": ["a", "b"]},
                between={"v": (0.0, 10.0)},
            )
        )
    }
    assert out["unique:id"]["n_violations"] == 1
    assert out["not_null:cat"]["n_violations"] == 1
    # NULL cat and 'z' both violate in_set
    assert out["in_set:cat"]["n_violations"] == 2
    # 50.0 out of range, -1.0 out of range, NULL violates
    assert out["between:v"]["n_violations"] == 3
    assert all(r["n_rows"] == 4 for r in out.values())
    assert not any(r["passed"] for r in out.values())


def test_expectation_report_clean_passes(spark):
    from feat_spark.plans.audit import expectation_report

    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, cat string")
    out = _rows(expectation_report(df, unique=[["id"]], not_null=["cat"]))
    assert all(r["passed"] for r in out)


# -------------------------------------------------------------- split_balance


def test_split_balance_smd(spark):
    from feat_spark.operators.experiment import split_balance

    rows = [("train", float(v), 1.0) for v in (1, 2, 3, 4)] + [
        ("test", float(v), 1.0) for v in (3, 4, 5, 6)
    ]
    df = spark.createDataFrame(rows, "split string, x double, c double")
    out = {
        r["feature"]: r
        for r in _rows(split_balance(df, "split", ["x", "c"]))
    }
    # means 2.5 vs 4.5, vars both 5/3 -> smd = -2/sqrt(5/3)
    assert out["x"]["mean_a"] == 2.5 and out["x"]["mean_b"] == 4.5
    assert out["x"]["smd"] == round(-2 / (5 / 3) ** 0.5, 6)
    # constant feature: zero pooled variance -> NULL
    assert out["c"]["smd"] is None


# ------------------------------------------------------- degree_assortativity


def test_assortativity_star_is_negative(spark):
    from feat_spark.operators.graph import degree_assortativity

    # star K_{1,3}: hub degree 3, leaves degree 1 -> r = -1
    df = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3)], "src long, dst long"
    )
    out = _rows(degree_assortativity(df))
    assert out[0]["n_stubs"] == 6
    assert out[0]["assortativity"] == -1.0


def test_assortativity_cycle_is_null(spark):
    from feat_spark.operators.graph import degree_assortativity

    # 3-cycle: all degrees 2 -> zero variance -> NULL
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (2, 1)], "src long, dst long"
    )  # includes a reverse duplicate to exercise canonicalization
    out = _rows(degree_assortativity(df))
    assert out[0]["n_stubs"] == 6
    assert out[0]["assortativity"] is None


# ------------------------------------------------------------------ ndcg_at_k


def test_ndcg_perfect_and_inverted(spark):
    import math
    from feat_spark.operators.keywords import ndcg_at_k

    ranked = spark.createDataFrame(
        [("q", "a", 1), ("q", "b", 2), ("p", "b", 1), ("p", "a", 2)],
        "query_id string, item string, rank long",
    )
    truth = spark.createDataFrame(
        [("q", "a", 3), ("q", "b", 1), ("p", "a", 3), ("p", "b", 1)],
        "query_id string, item string, rel long",
    )
    out = {r["query"]: r for r in _rows(ndcg_at_k(ranked, truth, k=3))}
    assert out["q"]["ndcg"] == 1.0  # ideal order
    ideal = 3 / math.log2(2) + 1 / math.log2(3)
    worst = 1 / math.log2(2) + 3 / math.log2(3)
    assert out["p"]["ndcg"] == round(
        round(worst, 10) / ideal, 6
    ) or abs(out["p"]["ndcg"] - worst / ideal) < 1e-6
    assert out["q"]["idcg"] == round(ideal, 6)


def test_ndcg_unjudged_items_gain_zero(spark):
    from feat_spark.operators.keywords import ndcg_at_k

    ranked = spark.createDataFrame(
        [("q", "x", 1), ("q", "a", 2)],
        "query_id string, item string, rank long",
    )
    truth = spark.createDataFrame(
        [("q", "a", 1)], "query_id string, item string, rel long"
    )
    out = _rows(ndcg_at_k(ranked, truth, k=2))
    import math
    # dcg = 0/log2(2) + 1/log2(3); idcg = 1/log2(2) = 1
    assert abs(out[0]["dcg"] - 1 / math.log2(3)) < 1e-6
    assert out[0]["idcg"] == 1.0


# ----------------------------------------------------------- parse_json_column


def test_parse_json_corrupt_vs_missing(spark):
    from feat_spark.operators.semistructured import parse_json_column

    df = spark.createDataFrame(
        [
            (1, '{"k": 7, "s": "x"}'),
            (2, '{"s": "y"}'),      # valid, k missing -> NULL k
            (3, "{not json"),        # corrupt
            (4, None),               # no payload at all: NOT corrupt
        ],
        "id long, props string",
    )
    out = {
        r["id"]: r
        for r in _rows(
            parse_json_column(df, "props", "k long, s string")
        )
    }
    assert (out[1]["k"], out[1]["s"], out[1]["is_corrupt"]) == (7, "x", False)
    assert out[2]["k"] is None and out[2]["is_corrupt"] is False
    assert out[3]["is_corrupt"] is True and out[3]["k"] is None
    assert out[4]["is_corrupt"] is False


# ---------------------------------------------------------------- split_leakage


def test_split_leakage_canonical_match(spark):
    from feat_spark.plans.audit import split_leakage

    df = spark.createDataFrame(
        [
            (1, "train", "Hello,  World!"),
            (2, "test", "hello world"),     # canonical dup across splits
            (3, "train", "hello world"),    # same content within train too
            (4, "test", "unique text"),
            (5, "train", "train only dup"),
            (6, "train", "train only dup"),  # dup but SAME split: no leak
        ],
        "doc_id long, split string, text string",
    )
    out = _rows(split_leakage(df, "split"))
    assert len(out) == 1
    assert out[0]["n_docs"] == 3 and out[0]["n_splits"] == 2
    assert out[0]["splits"] == "test,train"


# --------------------------------------------------------- business_days_between


def test_business_days_closed_form(spark):
    from feat_spark.operators.encoding import business_days_between
    import datetime

    def eday(y, m, d):
        return (datetime.date(y, m, d) - datetime.date(1970, 1, 1)).days

    rows = [
        # Mon 2024-01-01 .. Mon 2024-01-08 [s,e): 5 weekdays
        (1, eday(2024, 1, 1), eday(2024, 1, 8)),
        # Sat .. Mon: zero weekdays in [Sat, Mon)
        (2, eday(2024, 1, 6), eday(2024, 1, 8)),
        # Fri .. Sat: just Friday
        (3, eday(2024, 1, 5), eday(2024, 1, 6)),
        # empty interval
        (4, eday(2024, 1, 3), eday(2024, 1, 3)),
        # inverted -> NULL
        (5, eday(2024, 1, 8), eday(2024, 1, 1)),
        # two full weeks + Mon,Tue
        (6, eday(2024, 1, 1), eday(2024, 1, 17)),
    ]
    df = spark.createDataFrame(rows, "id long, s long, e long")
    out = {r["id"]: r["n_business_days"]
           for r in _rows(business_days_between(df, "s", "e"))}
    assert out == {1: 5, 2: 0, 3: 1, 4: 0, 5: None, 6: 12}


# -------------------------------------------------------------- rank_normalize


def test_rank_normalize_cdf_and_ties(spark):
    from feat_spark.operators.encoding import rank_normalize

    df = spark.createDataFrame(
        [("g", 1, 10.0), ("g", 2, 20.0), ("g", 3, 20.0), ("g", 4, 40.0),
         ("g", 5, None), ("h", 6, 7.0)],
        "grp string, id long, v double",
    )
    out = {r["id"]: r["pct"] for r in _rows(rank_normalize(df, "grp", "v"))}
    assert out[1] == 0.25
    # ties share the value-level CDF
    assert out[2] == 0.75 and out[3] == 0.75
    assert out[4] == 1.0
    assert out[5] is None
    # singleton group: its only value is the max
    assert out[6] == 1.0


# -------------------------------------------------------- stream_novelty_filter


def test_stream_novelty_filter_two_batches(spark, tmp_path_factory):
    import os
    import uuid
    import pandas as pd
    from feat_spark.streaming.pipeline import (
        run_to_memory,
        stream_novelty_filter,
    )

    d = str(tmp_path_factory.mktemp("novstream"))
    b1 = pd.DataFrame({"doc_id": [1, 2, 3], "h": ["a", "b", "c"]})
    b2 = pd.DataFrame({"doc_id": [4, 5, 6], "h": ["b", "d", "d"]})
    b1.to_parquet(os.path.join(d, "p1.parquet"), index=False)
    b2.to_parquet(os.path.join(d, "p2.parquet"), index=False)
    os.utime(os.path.join(d, "p2.parquet"))
    index = spark.createDataFrame([("a",), ("c",)], "h string")
    stream = (
        spark.readStream.schema("doc_id long, h string")
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    out = stream_novelty_filter(stream, index, ["h"])
    name = "t_nov_" + uuid.uuid4().hex[:8]
    run_to_memory(out, name)
    rows = sorted(r["doc_id"] for r in spark.table(name).collect())
    # 'a'/'c' indexed -> dropped; 'b' novel (twice: intra-stream dups
    # both pass by contract); both 'd's pass
    assert rows == [2, 4, 5, 6]


# ------------------------------------------------------------------ cohort_ltv


def test_cohort_ltv_curve(spark):
    import datetime
    from feat_spark.operators.funnel import cohort_ltv

    base = datetime.datetime(2024, 1, 1)

    def ev(eid, u, days, typ, v):
        return (eid, base + datetime.timedelta(days=days), u, typ, v)

    rows = [
        # cohort week W: users 1 and 2 first seen in week 0
        ev(1, 1, 0, "purchase", 10.0),
        ev(2, 2, 1, "click", 0.0),
        ev(3, 1, 7, "purchase", 5.0),     # age 1
        ev(4, 2, 8, "purchase", 2.5),     # age 1
        ev(5, 1, 21, "purchase", 1.0),    # age 3 (age 2 silent)
        # user 3: cohort week 1
        ev(6, 3, 9, "purchase", 4.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double"
    )
    out = {
        (r["cohort_week"], r["age_weeks"]): r
        for r in [x.asDict() for x in cohort_ltv(df).collect()]
    }
    w0 = min(k[0] for k in out)
    assert out[(w0, 0)]["revenue_cents"] == 1000
    assert out[(w0, 0)]["n_active"] == 2 and out[(w0, 0)]["cohort_size"] == 2
    assert out[(w0, 1)]["revenue_cents"] == 750
    assert out[(w0, 1)]["cum_revenue_cents"] == 1750
    assert out[(w0, 1)]["ltv"] == 8.75
    # silent week 2 absent; week 3 carries the running sum forward
    assert (w0, 2) not in out
    assert out[(w0, 3)]["cum_revenue_cents"] == 1850
    # second cohort independent
    assert out[(w0 + 1, 0)]["cohort_size"] == 1
    assert out[(w0 + 1, 0)]["ltv"] == 4.0


# ------------------------------------------------------------ period_over_period


def test_period_over_period_sparse_days(spark):
    import datetime
    from feat_spark.operators.profile import period_over_period

    base = datetime.datetime(2024, 1, 1)
    rows = []
    # day 0: 4 events; day 7: 6 events; day 8: 2 events (day 1 silent)
    for d, n in ((0, 4), (7, 6), (8, 2)):
        for j in range(n):
            rows.append(("u", base + datetime.timedelta(days=d, minutes=j)))
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    out = {r["day"] - 19723: r for r in
           [x.asDict() for x in period_over_period(df, "user_id").collect()]}
    assert out[0]["pct_change"] is None          # no prior week
    assert out[7]["n_prev"] == 4 and out[7]["pct_change"] == 0.5
    # day 1 was silent -> day 8 has NO prior row (not "previous observed")
    assert out[8]["n_prev"] is None and out[8]["pct_change"] is None


# -------------------------------------------------------------- cluster_medoids


def test_cluster_medoids_exemplar(spark):
    from feat_spark.operators.similarity import cluster_medoids

    rows = [
        (1, [0.0, 0.0], "a"),
        (2, [1.0, 1.0], "a"),
        (3, [0.4, 0.4], "a"),   # closest to mean (0.466.., 0.466..)
        (4, [9.0, 9.0], "b"),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label string")
    out = {r["label"]: r for r in
           [x.asDict() for x in cluster_medoids(df).collect()]}
    assert out["a"]["medoid_id"] == 3 and out["a"]["n_members"] == 3
    # singleton group is its own medoid at distance 0
    assert out["b"]["medoid_id"] == 4 and out["b"]["d2"] == 0.0


# ------------------------------------------------------------------ zorder_key


def test_zorder_interleaves_bits(spark):
    from feat_spark.sources.layout import zorder_key

    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1, 1), (3, 5)], "x long, y long"
    )
    out = {(r["x"], r["y"]): r["zkey"]
           for r in [q.asDict() for q in zorder_key(df, "x", "y").collect()]}
    assert out[(0, 0)] == 0
    assert out[(1, 0)] == 1      # x bit 0 -> zkey bit 0
    assert out[(0, 1)] == 2      # y bit 0 -> zkey bit 1
    assert out[(1, 1)] == 3
    # x=3 (11), y=5 (101): interleave -> y2 x2 y1 x1 y0 x0 = 1 0 0 1 1 1
    assert out[(3, 5)] == 0b100111


# ------------------------------------------------------------------ prune_files


def test_prune_files_overlap_and_null_stats(spark):
    from feat_spark.sources.layout import prune_files

    df = spark.createDataFrame(
        [
            ("f1", 0, 10, 100),     # overlaps [5, 20] -> keep
            ("f2", 11, 15, 200),    # inside -> keep
            ("f3", 30, 40, 400),    # disjoint -> skip
            ("f4", None, None, 800),  # no stats -> conservatively keep
            ("f5", 20, 25, 50),     # touches hi boundary -> keep
        ],
        "path string, lo long, hi long, bytes long",
    )
    out = {r["path"]: r
           for r in [q.asDict() for q in
                     prune_files(df, "lo", "hi", 5, 20).collect()]}
    assert [out[f]["keep"] for f in ("f1", "f2", "f3", "f4", "f5")] == [
        True, True, False, True, True
    ]
    assert out["f3"]["skipped_bytes"] == 400
    assert sum(r["skipped_bytes"] for r in out.values()) == 400


# ------------------------------------------------------- sequence_pattern_count


def test_sequence_pattern_regex_funnel(spark):
    import datetime
    from feat_spark.operators.funnel import sequence_pattern_count

    base = datetime.datetime(2024, 1, 1)
    seq_u = ["view", "click", "click", "purchase", "view", "purchase",
             "signup", "view", "click", "purchase"]
    rows = [
        (i, base + datetime.timedelta(minutes=i), "u", t)
        for i, t in enumerate(seq_u)
    ] + [(100, base, "w", "view")]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id string, event_type string"
    )
    out = {r["user_id"]: r for r in
           [q.asDict() for q in sequence_pattern_count(
               df, "user_id", "vc*p",
               {"view": "v", "click": "c", "purchase": "p"},
           ).collect()]}
    # u's string is "vccpvpsvcp" ('signup' -> '.'): vccp, vp, vcp = 3
    assert out["u"]["n_matches"] == 3
    assert out["u"]["n_events"] == 10 and not out["u"]["truncated"]
    assert out["w"]["n_matches"] == 0


def test_sequence_pattern_truncation_flag(spark):
    import datetime
    from feat_spark.operators.funnel import sequence_pattern_count

    base = datetime.datetime(2024, 1, 1)
    rows = [(i, base + datetime.timedelta(minutes=i), "u", "view")
            for i in range(5)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id string, event_type string"
    )
    out = [q.asDict() for q in sequence_pattern_count(
        df, "user_id", "v", {"view": "v"}, max_events=3
    ).collect()]
    assert out[0]["truncated"] is True
    assert out[0]["n_matches"] == 3  # counted on the truncated prefix


# --------------------------------------------------------------- hourly_profile


def test_hourly_profile_peak_and_tiebreak(spark):
    import datetime
    from feat_spark.operators.profile import hourly_profile

    base = datetime.datetime(2024, 1, 1)
    rows = []
    # hour 9: 3 events; hour 14: 3 events (tie -> smaller hour wins);
    # hour 20: 1 event
    for h, n in ((9, 3), (14, 3), (20, 1)):
        for j in range(n):
            rows.append(("u", base + datetime.timedelta(hours=h, minutes=j)))
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    out = [q.asDict() for q in hourly_profile(df, "user_id").collect()]
    r = out[0]
    assert r["n_total"] == 7 and r["n_hours_active"] == 3
    assert r["peak_hour"] == 9
    assert r["peak_share"] == round(3 / 7, 6)


# ------------------------------------------------------------ gini_concentration


def test_gini_equal_and_whale(spark):
    from feat_spark.operators.profile import gini_concentration

    rows = (
        [("eq", 10.0)] * 4
        + [("wh", 0.0), ("wh", 0.0), ("wh", 0.0), ("wh", 40.0)]
        + [("z", 0.0)]
    )
    df = spark.createDataFrame(rows, "grp string, value double")
    out = {r["grp"]: r for r in
           [q.asDict() for q in gini_concentration(df, "grp").collect()]}
    assert out["eq"]["gini"] == 0.0
    # one whale owns all: G = (2*4*4000 - 5*4000) / (4*4000) = 0.75
    assert out["wh"]["gini"] == 0.75
    assert out["wh"]["total_cents"] == 4000
    assert out["z"]["gini"] is None


# ------------------------------------------------------------ centroid_distances


def test_centroid_distances_upper_triangle(spark):
    from feat_spark.operators.similarity import centroid_distances

    rows = [
        (1, [0.0, 0.0], "a"), (2, [0.0, 0.0], "a"),
        (3, [3.0, 4.0], "b"),
        (4, [0.0, 1.0], "c"),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    )
    out = {(r["grp_a"], r["grp_b"]): r["d2"] for r in
           [q.asDict() for q in centroid_distances(df).collect()]}
    assert out[("a", "b")] == 25.0
    assert out[("a", "c")] == 1.0
    assert out[("b", "c")] == 9.0 + 9.0
    assert ("b", "a") not in out and len(out) == 3


# ---------------------------------------------------------------- funnel_latency


def test_funnel_latency_medians(spark):
    from feat_spark.operators.funnel import funnel_latency

    rows = [
        (0, 100, 500),       # t1-t0 = 100, t2-t1 = 400
        (0, 300, None),      # t1-t0 = 300, stalls
        (0, None, None),     # stalls at stage 0
    ]
    df = spark.createDataFrame(rows, "t_0 long, t_1 long, t_2 long")
    out = {r["transition"]: r for r in
           [q.asDict() for q in funnel_latency(
               df, ("view", "click", "purchase")).collect()]}
    assert out["view->click"]["n_completed"] == 2
    assert out["view->click"]["median_us"] == 200.0  # exact half
    assert out["view->click"]["mean_us"] == 200.0
    assert out["click->purchase"]["n_completed"] == 1
    assert out["click->purchase"]["median_us"] == 400.0


# --------------------------------------------------------------------- zipf_fit


def test_zipf_fit_perfect_power_law(spark):
    import math
    from feat_spark.operators.keywords import zipf_fit

    # freqs 12/6/4/3 = 12/r at ranks 1..4 -> slope exactly -1
    text = " ".join(["a"] * 12 + ["b"] * 6 + ["c"] * 4 + ["d"] * 3)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = [q.asDict() for q in zipf_fit(df, top_n=10).collect()]
    r = out[0]
    assert r["n_words"] == 4
    assert abs(r["slope"] - (-1.0)) < 1e-9
    assert r["intercept"] == round(math.log(12), 6)


# ------------------------------------------------------------ standardized_rates


def test_standardized_rates_simpson(spark):
    from feat_spark.operators.experiment import standardized_rates

    rows = []
    # Simpson setup: group A is mobile-heavy, B desktop-heavy.
    # Within EVERY stratum B's rate is higher, but A's crude rate wins.
    def add(grp, st, hits, n):
        for i in range(n):
            rows.append((grp, st, "purchase" if i < hits else "view"))
    add("A", "desktop", 9, 10)    # 0.90 on 10
    add("A", "mobile", 10, 90)    # 0.111 on 90
    add("B", "desktop", 85, 90)   # 0.944 on 90
    add("B", "mobile", 2, 10)     # 0.20 on 10
    df = spark.createDataFrame(rows, "grp string, device string, event_type string")
    out = {r["grp"]: r for r in
           [q.asDict() for q in standardized_rates(
               df, "grp", "device", "event_type = 'purchase'").collect()]}
    # crude: A = 19/100 = 0.19, B = 87/100 = 0.87
    assert out["A"]["crude_rate"] == 0.19 and out["B"]["crude_rate"] == 0.87
    # pooled strata: desktop 100/200, mobile 100/200 -> equal weights
    a_std = 0.5 * 0.9 + 0.5 * (10 / 90)
    b_std = 0.5 * (85 / 90) + 0.5 * 0.2
    assert abs(out["A"]["std_rate"] - a_std) < 1e-6
    assert abs(out["B"]["std_rate"] - b_std) < 1e-6
    # standardized, B wins — the paradox resolved
    assert out["B"]["std_rate"] > out["A"]["std_rate"]
    assert out["A"]["w_covered"] == 1.0


# --------------------------------------------------------------- confusion_stats


def test_confusion_stats_margins(spark):
    from feat_spark.operators.experiment import confusion_stats

    rows = [("a", "a")] * 3 + [("a", "b")] * 1 + [("b", "b")] * 2 + [
        ("b", "c")
    ]  # 'c' never a true label
    df = spark.createDataFrame(rows, "y string, p string")
    out = {r["cls"]: r for r in
           [q.asDict() for q in confusion_stats(df, "y", "p").collect()]}
    assert (out["a"]["n_true"], out["a"]["n_pred"], out["a"]["tp"]) == (4, 3, 3)
    assert out["a"]["precision"] == 1.0 and out["a"]["recall"] == 0.75
    assert out["a"]["f1"] == round(2 * 1 * 0.75 / 1.75, 6)
    # 'c': predicted once, never true -> precision 0, recall NULL
    assert out["c"]["precision"] == 0.0 and out["c"]["recall"] is None
    assert out["c"]["f1"] is None


# -------------------------------------------------------------- time_weighted_avg


def test_time_weighted_avg_locf(spark):
    import datetime
    from feat_spark.operators.encoding import time_weighted_avg

    base = datetime.datetime(2024, 1, 1)
    rows = [
        # $5 holds 1s, $1 holds 3s, final obs carries no weight
        (1, base, "u", 5.0),
        (2, base + datetime.timedelta(seconds=1), "u", 1.0),
        (3, base + datetime.timedelta(seconds=4), "u", 99.0),
        (4, base, "singleton", 7.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id string, value double"
    )
    out = {r["user_id"]: r for r in
           [q.asDict() for q in time_weighted_avg(df, "user_id").collect()]}
    assert out["u"]["twa"] == 2.0  # (5*1 + 1*3) / 4
    assert out["u"]["span_us"] == 4_000_000
    assert out["singleton"]["twa"] is None  # zero span


# ----------------------------------------------------------------- two_hop_reach


def test_two_hop_reach_path_graph(spark):
    from feat_spark.operators.graph import two_hop_reach

    # path 1-2-3-4-5
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "src long, dst long"
    )
    out = {r["node"]: r for r in
           [q.asDict() for q in two_hop_reach(df).collect()]}
    assert out[1]["reach2"] == 1        # only 3
    assert out[3]["reach2"] == 2        # 1 and 5
    assert out[3]["degree"] == 2
    assert all(r["pivots_capped"] == 0 for r in out.values())


def test_two_hop_reach_hub_cap(spark):
    from feat_spark.operators.graph import two_hop_reach

    # star center 0 with 4 leaves; cap degree 3 -> center can't pivot
    df = spark.createDataFrame(
        [(0, i) for i in (1, 2, 3, 4)], "src long, dst long"
    )
    out = {r["node"]: r for r in
           [q.asDict() for q in two_hop_reach(df, max_degree=3).collect()]}
    # leaves lose their (only) pivot: reach2 = 0 but capped flagged
    assert out[1]["reach2"] == 0 and out[1]["pivots_capped"] == 1
    assert out[0]["reach2"] == 0 and out[0]["pivots_capped"] == 0


# ------------------------------------------------------------------- burstiness


def test_burstiness_metronome_vs_bursty(spark):
    import datetime
    from feat_spark.operators.profile import burstiness

    base = datetime.datetime(2024, 1, 1)
    rows = []
    # metronome: constant 60s gaps -> sd 0 -> B = -1
    for i in range(5):
        rows.append((i, base + datetime.timedelta(minutes=i), "bot"))
    # bursty: 19 one-second gaps then a 100000s silence
    secs = list(range(20)) + [100019]
    for j, s in enumerate(secs):
        rows.append((10 + j, base + datetime.timedelta(seconds=s), "human"))
    # singleton gap -> NULL
    rows += [(20, base, "one"), (21, base + datetime.timedelta(seconds=5), "one")]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id string")
    out = {r["user_id"]: r for r in
           [q.asDict() for q in burstiness(df, "user_id").collect()]}
    assert out["bot"]["b"] == -1.0 and out["bot"]["n_gaps"] == 4
    assert out["human"]["b"] > 0.5 and out["human"]["n_gaps"] == 20
    assert out["one"]["b"] is None and out["one"]["n_gaps"] == 1


# --------------------------------------------------------- weighted_topk_sample


def test_weighted_topk_deterministic_and_sized(spark):
    from feat_spark.operators.sampling import weighted_topk_sample

    rows = [("g", i, float(1 + i % 3)) for i in range(30)] + [
        ("g", 99, 0.0),   # zero weight: excluded by contract
        ("h", 1, 2.0),    # under-k group: all rows kept
    ]
    df = spark.createDataFrame(rows, "grp string, id long, w double")
    out = [r.asDict() for r in
           weighted_topk_sample(df, "grp", "w", 5, "id").collect()]
    by_g = [r for r in out if r["grp"] == "g"]
    assert len(by_g) == 5
    assert all(r["id"] != 99 for r in by_g)
    assert [r["id"] for r in out if r["grp"] == "h"] == [1]
    # deterministic: second run identical
    out2 = [r.asDict() for r in
            weighted_topk_sample(df, "grp", "w", 5, "id").collect()]
    assert sorted(r["id"] for r in out) == sorted(r["id"] for r in out2)


# --------------------------------------------------------------------- fd_check


def test_fd_check_clean_and_violated(spark):
    from feat_spark.plans.audit import fd_check

    df = spark.createDataFrame(
        [(1, "a", "x"), (1, "a", "y"), (2, "b", "x"), (3, "a", "x")],
        "k long, cat string, other string",
    )
    out = {r["fd"]: r for r in
           [q.asDict() for q in fd_check(df, [("k", "cat"), ("k", "other")]).collect()]}
    # k -> cat holds (each k maps to one cat)
    assert out["k->cat"]["n_violating"] == 0
    assert out["k->cat"]["max_distinct"] == 1
    # k -> other violated by k=1 (x and y)
    assert out["k->other"]["n_violating"] == 1
    assert out["k->other"]["max_distinct"] == 2
    assert out["k->other"]["n_keys"] == 3


# ----------------------------------------------------------------- lorenz_curve


def test_lorenz_curve_whale(spark):
    from feat_spark.operators.profile import lorenz_curve

    # 4 users: 0,0,0,40 -> at point 5 (bottom half) share 0; whale at top
    rows = [("g", 0.0), ("g", 0.0), ("g", 0.0), ("g", 40.0)]
    df = spark.createDataFrame(rows, "grp string, value double")
    out = {r["point"]: r for r in
           [q.asDict() for q in lorenz_curve(df, "grp", n_points=4).collect()]}
    assert out[1]["cum_share"] == 0.0
    assert out[3]["cum_share"] == 0.0
    assert out[4]["cum_share"] == 1.0 and out[4]["cum_cents"] == 4000
    assert out[4]["n_rows"] == 4


# -------------------------------------------------------------- stream_apply_cdc


def test_stream_apply_cdc_latest_wins_across_batches(spark, tmp_path_factory):
    import os
    import pandas as pd
    from feat_spark.streaming.pipeline import stream_apply_cdc

    src = str(tmp_path_factory.mktemp("cdcsrc"))
    tgt = os.path.join(str(tmp_path_factory.mktemp("cdctgt")), "state")
    b1 = pd.DataFrame({
        "k": [1, 2, 4], "ts": [10, 10, 50],
        "v": ["a", "b", "new"], "op": ["U", "U", "U"],
    })
    b2 = pd.DataFrame({
        "k": [2, 1, 3, 4], "ts": [20, 20, 10, 20],
        "v": ["b2", "x", "c", "old"], "op": ["U", "D", "U", "U"],
    })
    b1.to_parquet(os.path.join(src, "p1.parquet"), index=False)
    b2.to_parquet(os.path.join(src, "p2.parquet"), index=False)
    os.utime(os.path.join(src, "p2.parquet"))
    stream = (
        spark.readStream.schema("k long, ts long, v string, op string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_apply_cdc(stream, tgt, "k", "ts", tiebreak_col="v")
    q.awaitTermination()
    rows = {r["k"]: r["v"] for r in spark.read.parquet(tgt).collect()}
    # k1 deleted by the later change; k2 upgraded; k3 inserted;
    # k4: batch2 carried an OLDER ts -> the batch-1 value must survive
    assert rows == {2: "b2", 3: "c", 4: "new"}


# ------------------------------------------------------------------- read_jsonl


def test_read_jsonl_corrupt_accounting(spark, tmp_path_factory):
    import os
    from feat_spark.sources.layout import read_jsonl

    d = str(tmp_path_factory.mktemp("jsonl"))
    with open(os.path.join(d, "part.jsonl"), "w") as f:
        f.write('{"id": 1, "v": 2.5}\n')
        f.write('{"id": 2}\n')            # missing key -> NULL column
        f.write('{broken\n')               # corrupt line
    out = {r["id"]: r for r in
           [q.asDict() for q in
            read_jsonl(spark, d, "id long, v double").collect()]}
    assert out[1]["v"] == 2.5 and out[1]["_corrupt_record"] is None
    assert out[2]["v"] is None and out[2]["_corrupt_record"] is None
    assert out[None]["_corrupt_record"] == "{broken"


# ------------------------------------------------------------------- cast_audit


def test_cast_audit_counts(spark):
    from feat_spark.operators.semistructured import cast_audit

    df = spark.createDataFrame(
        [("1", "x"), ("2.5", None), ("oops", "y"), (None, "3")],
        "a string, b string",
    )
    out = {(r["col"], r["target_type"]): r for r in
           [q.asDict() for q in
            cast_audit(df, [("a", "double"), ("b", "int")]).collect()]}
    ra = out[("a", "double")]
    assert (ra["n_rows"], ra["n_null_in"], ra["n_failed"]) == (4, 1, 1)
    rb = out[("b", "int")]
    assert (rb["n_null_in"], rb["n_failed"]) == (1, 2)  # x, y fail; 3 ok


# ------------------------------------------------------------------ cohens_kappa


def test_cohens_kappa_hand_vector(spark):
    from feat_spark.operators.experiment import cohens_kappa

    # classic 2x2: a=[y20,n5 / y10,n15]
    rows = (
        [("y", "y")] * 20 + [("y", "n")] * 5
        + [("n", "y")] * 10 + [("n", "n")] * 15
    )
    df = spark.createDataFrame(rows, "r1 string, r2 string")
    out = [q.asDict() for q in cohens_kappa(df, "r1", "r2").collect()][0]
    # po = 35/50; pe = (25*30 + 25*20)/2500 = 0.5; kappa = 0.4
    assert out["po"] == 0.7 and out["pe"] == 0.5
    assert out["kappa"] == round((0.7 - 0.5) / 0.5, 6) == 0.4


def test_cohens_kappa_degenerate_constant(spark):
    from feat_spark.operators.experiment import cohens_kappa

    df = spark.createDataFrame([("y", "y")] * 5, "r1 string, r2 string")
    out = [q.asDict() for q in cohens_kappa(df, "r1", "r2").collect()][0]
    assert out["kappa"] is None and out["po"] == 1.0


# ------------------------------------------------------------------- vacuum_plan


def test_vacuum_plan_refcounting(spark):
    from feat_spark.sources.layout import vacuum_plan

    rows = [
        (1, "old_only"), (1, "shared"),
        (2, "old_only"), (2, "mid"),
        (3, "shared"), (3, "live3"),
        (4, "live4"),
    ]
    df = spark.createDataFrame(rows, "snapshot_id long, path string")
    out = {r["path"]: r for r in
           [q.asDict() for q in vacuum_plan(df, keep_last=2).collect()]}
    # kept snaps: 3, 4. 'shared' referenced by snap 3 -> survives.
    assert set(out) == {"old_only", "mid"}
    assert out["old_only"]["n_expired_refs"] == 2
    assert out["old_only"]["last_snapshot"] == 2


# --------------------------------------------------------------- debounce_events


def test_debounce_islands(spark):
    import datetime
    from feat_spark.operators.eventops import debounce_events

    base = datetime.datetime(2024, 1, 1)
    secs = [0, 1, 2, 30, 31, 100]  # bursts: {0,1,2}, {30,31}, {100}
    rows = [(i, base + datetime.timedelta(seconds=s), "u")
            for i, s in enumerate(secs)]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id string")
    out = {r["event_id"]: r["kept"] for r in
           [q.asDict() for q in debounce_events(df, "user_id", gap_s=5).collect()]}
    assert out == {0: True, 1: False, 2: False, 3: True, 4: False, 5: True}


# -------------------------------------------------------------- neighbor_majority


def test_neighbor_majority_vote_and_tie(spark):
    from feat_spark.operators.graph import neighbor_majority

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (5, 2), (5, 3), (6, 7)],
        "src long, dst long",
    )
    labels = spark.createDataFrame(
        [(2, "a"), (3, "b"), (4, "a")], "node long, label string"
    )
    out = {r["node"]: r for r in
           [q.asDict() for q in neighbor_majority(edges, labels).collect()]}
    # node 1: neighbors a,b,a -> majority a
    assert out[1]["label"] == "a" and out[1]["n_votes"] == 2
    assert out[1]["n_labeled_neighbors"] == 3
    # node 5: one a one b -> tie -> smallest label 'a'
    assert out[5]["label"] == "a"
    # node 6/7: no labeled neighbors -> absent
    assert 6 not in out and 7 not in out
    # labeled nodes themselves get votes from their neighbors
    assert out[2]["n_labeled_neighbors"] == 0 if 2 in out else True
