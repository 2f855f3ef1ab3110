"""Windowed operators vs pandas oracles on the synthetic transcripts:
stable ordering, lag/lead, leakage-safe cumulative frames, ffill/bfill,
tumbling windows, top-k, sessionization (gap ids + native
session_window membership)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from feat_spark.operators.sessionize import session_agg, session_window_agg, sessionize
from feat_spark.operators.windows import (
    backward_fill,
    cumulative_features,
    forward_fill,
    lag_lead_features,
    top_k_per_group,
    tumbling_window_agg,
    with_stable_order,
)
from feat_spark.sources.synth import synth_transcripts, synth_transcripts_pdf


@pytest.fixture(scope="module")
def tdata(spark):
    df = synth_transcripts(spark, n_convs=30, mean_turns=15, seed=7)
    pdf = synth_transcripts_pdf(n_convs=30, mean_turns=15, seed=7)
    return df, pdf.sort_values(["conv_id", "turn_idx", "ts"]).reset_index(drop=True)


def _sorted_pdf(df):
    return (
        df.toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )


def test_stable_order(spark, tdata):
    """row_number over (turn_idx, ts) recovers per-conversation order
    despite scrambled file order (input_hint: stable ordering)."""
    df, pdf = tdata
    got = _sorted_pdf(with_stable_order(df))
    want = pdf.groupby("conv_id").cumcount() + 1
    assert got["turn_seq"].tolist() == want.tolist()
    # per-turn text equality under the stable ordering (BASELINE.json:15)
    assert got["text"].tolist() == pdf["text"].tolist()


def test_lag_lead(spark, tdata):
    df, pdf = tdata
    got = _sorted_pdf(lag_lead_features(df, ["text"], offsets=(1, 2)))
    g = pdf.groupby("conv_id")["text"]
    for k in (1, 2):
        want_lag = g.shift(k).where(lambda s: s.notna(), None).tolist()
        want_lead = g.shift(-k).where(lambda s: s.notna(), None).tolist()
        assert got[f"text_lag{k}"].where(got[f"text_lag{k}"].notna(), None).tolist() == want_lag
        assert got[f"text_lead{k}"].where(got[f"text_lead{k}"].notna(), None).tolist() == want_lead


def test_cumulative_leakage_safe(spark, tdata):
    df, pdf = tdata
    df2 = df.withColumn("text_len", F.length("text"))
    pdf2 = pdf.assign(text_len=pdf["text"].str.len())
    got = _sorted_pdf(
        cumulative_features(df2, {"text_len": ["sum", "count"]}, include_current=False)
    )
    g = pdf2.groupby("conv_id")["text_len"]
    want_sum = g.apply(lambda s: s.shift(1).expanding().sum()).reset_index(drop=True)
    want_cnt = g.apply(lambda s: s.shift(1).expanding().count()).reset_index(drop=True)
    gs = got["text_len_cum_sum"].astype("float64").to_numpy()
    ws = want_sum.astype("float64").to_numpy()
    assert ((np.isnan(gs) & np.isnan(ws)) | (gs == ws)).all()
    assert got["text_len_cum_count"].fillna(0).tolist() == want_cnt.fillna(0).tolist()


def test_ffill_bfill(spark, tdata):
    df, pdf = tdata
    got = _sorted_pdf(backward_fill(forward_fill(df, ["tool"]), ["tool"]))
    order = pdf.sort_values(["conv_id", "ts", "turn_idx"])
    w_ff = order.groupby("conv_id")["tool"].ffill()
    w_bf = order.groupby("conv_id")["tool"].bfill()
    want = order.assign(ff=w_ff, bf=w_bf).sort_values(["conv_id", "turn_idx"])
    assert got["tool_ffill"].where(got["tool_ffill"].notna(), None).tolist() == \
        want["ff"].where(want["ff"].notna(), None).tolist()
    assert got["tool_bfill"].where(got["tool_bfill"].notna(), None).tolist() == \
        want["bf"].where(want["bf"].notna(), None).tolist()


def test_tumbling_window(spark, tdata):
    df, pdf = tdata
    got = (
        tumbling_window_agg(
            df,
            [F.count(F.lit(1)).alias("n_turns"), F.sum(F.length("text")).alias("chars")],
            duration="1 hour",
            keys="conv_id",
        )
        .toPandas()
        .sort_values(["conv_id", "win_start"])
        .reset_index(drop=True)
    )
    want = (
        pdf.assign(win_start=pdf["ts"].dt.floor("1h"), chars=pdf["text"].str.len())
        .groupby(["conv_id", "win_start"])
        .agg(n_turns=("ts", "size"), chars=("chars", "sum"))
        .reset_index()
        .sort_values(["conv_id", "win_start"])
        .reset_index(drop=True)
    )
    assert got["n_turns"].tolist() == want["n_turns"].tolist()
    assert got["chars"].tolist() == want["chars"].tolist()
    assert got["win_start"].tolist() == want["win_start"].tolist()


def test_top_k_per_group(spark, tdata):
    df, pdf = tdata
    got = _sorted_pdf(
        top_k_per_group(df, 3, "conv_id", [F.col("turn_idx").asc()])
    )
    want = pdf.groupby("conv_id").head(0)  # placeholder shape
    want = pdf[pdf.groupby("conv_id")["turn_idx"].rank(method="first") <= 3]
    assert len(got) == len(want)
    assert got["turn_idx"].tolist() == want.sort_values(["conv_id", "turn_idx"])["turn_idx"].tolist()


def _oracle_sessions(pdf, gap_s=1800):
    order = pdf.sort_values(["conv_id", "ts", "turn_idx"]).copy()
    prev = order.groupby("conv_id")["ts"].shift(1)
    new = ((order["ts"] - prev).dt.total_seconds() > gap_s) | prev.isna()
    order["session_id"] = new.groupby(order["conv_id"]).cumsum().astype(int) - 1
    return order


def test_sessionize_gap_ids(spark, tdata):
    df, pdf = tdata
    got = (
        sessionize(df, gap="30 minutes")
        .toPandas()
        .sort_values(["conv_id", "ts", "turn_idx"])
        .reset_index(drop=True)
    )
    want = _oracle_sessions(pdf).reset_index(drop=True)
    assert got["session_id"].tolist() == want["session_id"].tolist()
    # sanity: gaps exist so sessions split somewhere
    assert got["session_id"].max() >= 1


def test_session_agg_matches_native_session_window(spark, tdata):
    """Gap-based batch sessionization groups rows exactly like Spark's
    native F.session_window (same membership, same session count)."""
    df, pdf = tdata
    ours = (
        session_agg(df, [F.count(F.lit(1)).alias("n")], gap="30 minutes")
        .toPandas()
        .sort_values(["conv_id", "session_start"])
        .reset_index(drop=True)
    )
    native = (
        session_window_agg(df, [F.count(F.lit(1)).alias("n")], gap="30 minutes")
        .toPandas()
        .sort_values(["conv_id", "session_start"])
        .reset_index(drop=True)
    )
    assert ours[["conv_id", "session_start", "n"]].values.tolist() == \
        native[["conv_id", "session_start", "n"]].values.tolist()
    want = (
        _oracle_sessions(pdf)
        .groupby(["conv_id", "session_id"])
        .agg(session_start=("ts", "min"), n=("ts", "size"))
        .reset_index()
        .sort_values(["conv_id", "session_start"])
        .reset_index(drop=True)
    )
    assert ours["n"].tolist() == want["n"].tolist()
    assert ours["session_start"].tolist() == want["session_start"].tolist()


def test_time_range_rolling_frame(spark, tdata):
    """rangeBetween time frame vs a brute-force pandas oracle, including
    duplicate timestamps (peers enter the frame together) and the
    strict include_current=False mode (excludes ALL rows at ts)."""
    from feat_spark.operators.windows import time_range_features

    df, pdf = tdata
    df = df.withColumn("n_chars", F.length("text").cast("long"))
    pdf = pdf.assign(n_chars=pdf["text"].str.len())
    dur = pd.Timedelta("45 minutes")

    for include_current in (True, False):
        out = time_range_features(
            df, {"n_chars": ["sum", "count"]}, duration="45 minutes",
            partition="conv_id", ts="ts", include_current=include_current,
        )
        got = _sorted_pdf(out.select("conv_id", "turn_idx", "ts",
                                     "n_chars_roll_sum", "n_chars_roll_count"))
        for _, row in got.iterrows():
            grp = pdf[pdf["conv_id"] == row["conv_id"]]
            if include_current:
                mask = (grp["ts"] >= row["ts"] - dur) & (grp["ts"] <= row["ts"])
            else:
                mask = (grp["ts"] >= row["ts"] - dur) & (grp["ts"] < row["ts"])
            want_n = int(grp.loc[mask, "n_chars"].notna().sum())
            got_n = 0 if pd.isna(row["n_chars_roll_count"]) else int(row["n_chars_roll_count"])
            assert got_n == want_n, (row["conv_id"], row["turn_idx"], include_current)
            if want_n:
                assert int(row["n_chars_roll_sum"]) == int(grp.loc[mask, "n_chars"].sum())


def test_sketch_accuracy(spark, tdata):
    """approx_count_distinct (HLL++) and percentile_approx are bounded
    vs their exact twins — the driver gate is rows-only for these, so
    the error bound lives here."""
    df, _ = tdata
    row = (
        df.select(
            F.approx_count_distinct("conv_id").alias("approx"),
            F.countDistinct("conv_id").alias("exact"),
            F.percentile_approx("turn_idx", 0.5, 1000).alias("p50a"),
            F.expr("percentile(turn_idx, 0.5)").alias("p50"),
        )
        .collect()[0]
    )
    assert abs(row.approx - row.exact) / row.exact <= 0.05
    # percentile_approx returns an actual element; exact percentile
    # interpolates between order statistics — allow one element gap
    assert abs(row.p50a - row.p50) <= 2.0


def test_rolling_zscore_leakage_safe_and_flags_outlier(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    from feat_spark.operators.windows import rolling_zscore

    # stable history then a spike; a second user interleaved
    vals = [10.0, 11.0, 9.0, 10.5, 9.5, 10.2, 9.8, 100.0, 10.1, 9.9]
    rows = [(1, i, float(i), v) for i, v in enumerate(vals)]
    rows += [(2, 100 + i, float(i), 5.0) for i in range(8)]
    df = spark.createDataFrame(rows, "user_id long, event_id long, t double, value double")
    df = df.withColumn("ts", F.timestamp_seconds("t"))
    out = (
        rolling_zscore(df, value_col="value", keys="user_id",
                       order=("ts", "event_id"), n=20, min_periods=5)
        .toPandas().sort_values("event_id")
    )
    u1 = out[out["user_id"] == 1].reset_index(drop=True)
    # first min_periods rows have no stats (strictly-preceding window)
    assert u1.loc[:4, "roll_mean"].isna().all()
    assert not u1.loc[:4, "is_anomaly"].any()
    # the spike at idx 7 is flagged; its neighbors are not
    assert bool(u1.loc[7, "is_anomaly"])
    assert not u1.loc[6, "is_anomaly"] and not u1.loc[8, "is_anomaly"]
    # stats replicate pandas' shifted rolling population moments
    s = pd.Series(vals)
    mean = s.shift(1).rolling(20, min_periods=5).mean()
    std = s.shift(1).rolling(20, min_periods=5).std(ddof=0)
    for i in range(5, len(vals)):
        assert abs(u1.loc[i, "roll_mean"] - mean[i]) < 1e-6
        assert abs(u1.loc[i, "roll_std"] - std[i]) < 1e-6
    # constant-history user: std = 0 -> z NULL, never anomalous
    u2 = out[out["user_id"] == 2]
    assert u2["zscore"].isna().all()
    assert not u2["is_anomaly"].any()


def test_profile_columns_single_pass_stats(spark):
    from feat_spark.operators.profile import profile_columns

    df = spark.createDataFrame(
        [(1, 10.0, "aa"), (2, None, "bbb"), (3, 10.0, None), (4, 7.5, "aa")],
        "id long, v double, s string",
    )
    out = (
        profile_columns(df, numeric_cols=("id", "v"), string_cols=("s",))
        .toPandas().set_index("column_name")
    )
    assert out.loc["id", "n"] == 4 and out.loc["id", "n_null"] == 0
    assert out.loc["id", "n_distinct"] == 4
    assert out.loc["id", "min_val"] == 1.0 and out.loc["id", "max_val"] == 4.0
    assert out.loc["v", "n_null"] == 1 and out.loc["v", "n_distinct"] == 2
    assert out.loc["s", "n_null"] == 1 and out.loc["s", "n_distinct"] == 2
    assert out.loc["s", "min_len"] == 2 and out.loc["s", "max_len"] == 3
    # numeric stats are NULL for string columns and vice versa
    import pandas as pd

    assert pd.isna(out.loc["s", "min_val"]) and pd.isna(out.loc["id", "min_len"])


def test_decayed_sum_halves_across_buckets(spark):
    from pyspark.sql import functions as F

    from feat_spark.operators.windows import decayed_sum

    # user 1: bucket 0 has 10+20; bucket 1 has an event seeing them
    # halved; bucket 3 sees them quartered again (2 halvings)
    day = 86400.0
    rows = [
        (1, 1, 0.0 * day, 10.0),
        (1, 2, 1.0 * day, 20.0),
        (1, 3, 8.0 * day, 40.0),   # next 7-day bucket
        (1, 4, 22.0 * day, 1.0),   # bucket 3: two more halvings
        (2, 5, 0.0 * day, 7.0),    # other user isolated
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, t double, value double")
    df = df.withColumn("ts", F.timestamp_seconds("t")).drop("t")
    out = (
        decayed_sum(df, value_col="value", keys="user_id",
                    ts="ts", half_life_days=7)
        .toPandas().set_index("event_id")["decayed_sum"]
    )
    assert out[1] != out[1]  # NaN: first row per user has no history
    assert out[2] == 10.0    # same bucket: undecayed
    assert out[3] == (10.0 + 20.0) * 0.5        # one boundary crossed
    assert out[4] == (10.0 + 20.0) * 0.125 + 40.0 * 0.25
    assert out[5] != out[5]


def test_transition_matrix_counts_and_probs(spark):
    from pyspark.sql import functions as F

    from feat_spark.operators.windows import transition_matrix

    # user 1: a->b->a->c ; user 2: a->b  => from 'a': b:2, c:1
    rows = [(1, 1, "a"), (1, 2, "b"), (1, 3, "a"), (1, 4, "c"),
            (2, 5, "a"), (2, 6, "b")]
    df = spark.createDataFrame(rows, "user_id long, event_id long, cat string")
    df = df.withColumn("ts", F.timestamp_seconds(F.col("event_id").cast("double")))
    out = transition_matrix(df, cat_col="cat", keys="user_id").toPandas()
    m = {(r.prev_cat, r.next_cat): (r.n_trans, r.prob) for r in out.itertuples()}
    assert m[("a", "b")] == (2, round(2 / 3, 6))
    assert m[("a", "c")] == (1, round(1 / 3, 6))
    assert m[("b", "a")] == (1, 1.0)
    # no cross-user transition (user2's 'a' never follows user1's 'c')
    assert ("c", "a") not in m
    assert sum(n for n, _ in m.values()) == 4


def test_skew_report_finds_heavy_hitter(spark):
    from feat_spark.operators.profile import skew_report

    rows = [(1, i) for i in range(80)] + [(k, 100 + k) for k in range(2, 22)]
    df = spark.createDataFrame(rows, "k long, x long")
    out = skew_report(df, key="k", topk=3).toPandas()
    assert list(out["rank"]) == [1, 2, 3]
    top = out.iloc[0]
    assert top["key_value"] == "1" and top["n"] == 80
    assert abs(top["share"] - 0.8) < 1e-9
    # 21 keys, mean count 100/21 -> the hot key is ~16.8x mean
    assert abs(top["x_mean"] - round(80 * 21 / 100.0, 6)) < 1e-9
    # ties broken by key_value ascending for determinism
    assert list(out["key_value"][1:]) == ["10", "11"]


def test_active_days_feature(spark):
    import datetime as dt

    from feat_spark.operators.windows import active_days_feature

    t0 = dt.datetime(2024, 3, 1, 12, 0)
    day = dt.timedelta(days=1)
    rows = [
        # user 1 active days 0,1,3,10 (two events on day 0)
        (1, 1, t0), (2, 1, t0 + dt.timedelta(hours=3)),
        (3, 1, t0 + day), (4, 1, t0 + 3 * day), (5, 1, t0 + 10 * day),
        # user 2: single day
        (6, 2, t0),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    out = (
        active_days_feature(df, keys="user_id", ts="ts", window_days=7)
        .toPandas().set_index("event_id")["active_days_7d"]
    )
    assert out[1] == 1 and out[2] == 1  # same-day events count the day once
    assert out[3] == 2
    assert out[4] == 3                  # days 0,1,3 within [day-6, day]
    assert out[5] == 1                  # day 10: window [4,10] has only day 10
    assert out[6] == 1


def test_interval_coverage_merge_semantics(spark):
    import datetime

    from feat_spark.operators.windows import interval_coverage

    t0 = datetime.datetime(2024, 5, 1)

    def iv(u, s, e):
        return (
            u,
            t0 + datetime.timedelta(seconds=s),
            t0 + datetime.timedelta(seconds=e),
        )

    rows = [
        # user 1: overlap [0,10)+[5,20) -> [0,20); touch [20,30) merges;
        # contained [2,3) adds nothing; zero-length [40,40) dropped;
        # disjoint [50,60) is its own island
        iv(1, 0, 10), iv(1, 5, 20), iv(1, 20, 30), iv(1, 2, 3),
        iv(1, 40, 40), iv(1, 50, 60),
        # user 2: a single interval
        iv(2, 0, 7),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, end_ts timestamp"
    )
    out = {
        r["user_id"]: r
        for r in interval_coverage(df, "user_id", "ts", "end_ts").collect()
    }
    assert out[1]["n_intervals"] == 5          # zero-length row dropped
    assert out[1]["n_merged"] == 2             # [0,30) and [50,60)
    assert out[1]["covered_us"] == (30 + 10) * 1_000_000
    assert out[2]["n_intervals"] == 1 and out[2]["n_merged"] == 1
    assert out[2]["covered_us"] == 7 * 1_000_000
    # layout-independent
    again = {
        r["user_id"]: r["covered_us"]
        for r in interval_coverage(
            df.repartition(5), "user_id", "ts", "end_ts"
        ).collect()
    }
    assert {u: v["covered_us"] for u, v in out.items()} == again


def test_sequence_audit_stats(spark):
    import datetime

    from feat_spark.plans.audit import sequence_audit

    t0 = datetime.datetime(2024, 5, 1)

    def ev(u, s, q):
        return (u, t0 + datetime.timedelta(seconds=s), q)

    rows = [
        # user 1: tie at s=10 (collision), id 5 then 3 at the tie
        # (inversion), 100s gap to s=110
        ev(1, 0, 1), ev(1, 10, 5), ev(1, 10, 3), ev(1, 110, 9),
        # user 2: singleton
        ev(2, 0, 7),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long")
    out = {
        r["user_id"]: r
        for r in sequence_audit(df, "user_id", "ts", "event_id").collect()
    }
    assert out[1]["n_events"] == 4
    assert out[1]["n_ts_collisions"] == 1
    # at the tie, order is (ts, event_id) -> 3 before 5, so no
    # inversion there; none elsewhere either
    assert out[1]["n_seq_inversions"] == 0
    assert out[1]["max_gap_us"] == 100 * 1_000_000
    assert out[2]["n_events"] == 1
    assert out[2]["n_ts_collisions"] == 0
    assert out[2]["n_seq_inversions"] == 0
    assert out[2]["max_gap_us"] == 0
    # a genuinely backwards id: later ts, smaller id
    df2 = spark.createDataFrame(
        [ev(3, 0, 10), ev(3, 5, 2)], "user_id long, ts timestamp, event_id long"
    )
    r3 = sequence_audit(df2, "user_id", "ts", "event_id").collect()[0]
    assert r3["n_seq_inversions"] == 1
