"""Driver contract for the spark-graft builder (PySpark target).

Every implemented operator from SURVEY.md §2 (plus the training-data
pipeline operators: dedup, similarity search, text analysis) gets a
``queries()`` entry backed by the engine code in ``feat_spark/`` and —
where ANSI-SQL-expressible — a bit-matching DuckDB ``oracle_sql()``
twin. Cross-engine float discipline:

* money/value sums go through ``decimal`` (exact) and cast to double
  only at the very end;
* cosine similarities / ratios are computed in double with identical
  left-to-right folds on both sides and rounded to 6dp;
* every computed column is aliased identically in Spark and SQL.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from feat_spark.operators import dedup as D
from feat_spark.operators import similarity as S
from feat_spark.operators.asof import asof_join
from feat_spark.operators.sessionize import session_agg, sessionize
from feat_spark.operators.windows import (
    backward_fill,
    cumulative_features,
    forward_fill,
    lag_lead_features,
    time_range_features,
    top_k_per_group,
    tumbling_window_agg,
    with_stable_order,
)
from feat_spark.functions import text as TXT
from feat_spark.session import configure_existing

_MOD = 2147483647
_HX = "('0x' || substr(md5({x}), 1, 8))::BIGINT"  # portable 32-bit hash


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    configure_existing(spark)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _events(spark, sf_dir) -> DataFrame:
    return _t(spark, sf_dir, "events")


# ---------------------------------------------------------------- as-of join

def _orders_rhs(spark, sf_dir) -> DataFrame:
    """Right side for the as-of join: orders deduped to one row per
    (custkey, orderdate) — keep max orderkey — so the match is unique
    and both engines agree on ties.

    r6: the dedup is a ``max(struct(o_orderkey, o_totalprice))``
    aggregate instead of a row_number window — same row selected
    (o_orderkey is the primary key, so the lexicographic struct max IS
    the max-orderkey row), but the agg is map-side combinable: the
    full-sort window pass over orders becomes a partial aggregate
    riding the same single exchange (guide §2.3 "aggregate before you
    shuffle")."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey", "o_orderdate")
        .agg(
            F.max(F.struct("o_orderkey", "o_totalprice")).alias("__top")
        )
        .select(
            F.col("o_custkey").alias("user_id"),
            F.col("o_orderdate").alias("ts"),
            F.col("__top.o_orderkey").alias("o_orderkey"),
            F.col("__top.o_totalprice").alias("o_totalprice"),
        )
    )


_ORDERS_RHS_SQL = """
  select o_custkey as user_id, o_orderdate as ts, o_orderkey, o_totalprice
  from orders
  qualify row_number() over (partition by o_custkey, o_orderdate
                             order by o_orderkey desc) = 1
"""


def _q_asof(strategy: str):
    def run(spark, sf_dir):
        left = _events(spark, sf_dir).select("event_id", "user_id", "ts")
        rhs = _orders_rhs(spark, sf_dir)
        out = asof_join(
            left, rhs, on="user_id", left_ts="ts", right_ts="ts",
            value_cols=["o_orderkey", "o_totalprice"], strategy=strategy,
            hot_threshold=50,
        )
        return out.select("event_id", "user_id", "ts", "o_orderkey", "o_totalprice")

    return run


_ASOF_SQL = f"""
with rhs as ({_ORDERS_RHS_SQL})
select e.event_id, e.user_id, e.ts, rhs.o_orderkey, rhs.o_totalprice
from events e
asof left join rhs on e.user_id = rhs.user_id and e.ts >= rhs.ts
"""


def _q_asof_dir(direction: str):
    def run(spark, sf_dir):
        left = _events(spark, sf_dir).select("event_id", "user_id", "ts")
        rhs = _orders_rhs(spark, sf_dir)
        out = asof_join(
            left, rhs, on="user_id", left_ts="ts", right_ts="ts",
            value_cols=["o_orderkey", "o_totalprice"], direction=direction,
        )
        return out.select("event_id", "user_id", "ts", "o_orderkey", "o_totalprice")

    return run


_ASOF_FWD_SQL = f"""
with rhs as ({_ORDERS_RHS_SQL})
select e.event_id, e.user_id, e.ts, rhs.o_orderkey, rhs.o_totalprice
from events e
asof left join rhs on e.user_id = rhs.user_id and e.ts <= rhs.ts
"""

_ASOF_NEAREST_SQL = f"""
with rhs as ({_ORDERS_RHS_SQL}),
b as (
  select e.event_id, e.user_id, e.ts,
         r.ts as bts, r.o_orderkey as bk, r.o_totalprice as bp
  from events e
  asof left join rhs r on e.user_id = r.user_id and e.ts >= r.ts),
f as (
  select e.event_id,
         r.ts as fts, r.o_orderkey as fk, r.o_totalprice as fp
  from events e
  asof left join rhs r on e.user_id = r.user_id and e.ts <= r.ts)
select b.event_id, b.user_id, b.ts,
       case when fts is null or (bts is not null and (b.ts - bts) <= (fts - b.ts))
            then bk else fk end as o_orderkey,
       case when fts is null or (bts is not null and (b.ts - bts) <= (fts - b.ts))
            then bp else fp end as o_totalprice
from b join f using (event_id)
"""


def _q_asof_tolerance(spark, sf_dir):
    left = _events(spark, sf_dir).select("event_id", "user_id", "ts")
    rhs = _orders_rhs(spark, sf_dir)
    out = asof_join(
        left, rhs, on="user_id", left_ts="ts", right_ts="ts",
        value_cols=["o_orderkey"], tolerance="90 days",
    )
    return out.select("event_id", "o_orderkey")


_ASOF_TOL_SQL = f"""
with rhs as ({_ORDERS_RHS_SQL})
select e.event_id,
       case when rhs.ts >= e.ts - interval '90 days'
            then rhs.o_orderkey end as o_orderkey
from events e
asof left join rhs on e.user_id = rhs.user_id and e.ts >= rhs.ts
"""


# ------------------------------------------------------------------- windows

def _q_stable_order(spark, sf_dir):
    df = with_stable_order(
        _events(spark, sf_dir), partition="user_id", order=("ts",),
        tiebreak=("event_id",), out_col="seq",
    )
    return df.select("event_id", F.col("seq").cast("long").alias("seq"))


def _q_lag_lead(spark, sf_dir):
    df = lag_lead_features(
        _events(spark, sf_dir), cols=["value"], offsets=[1, 2],
        partition="user_id", order=("ts",), tiebreak=("event_id",),
    )
    return df.select("event_id", "value_lag1", "value_lead1", "value_lag2", "value_lead2")


def _q_cumulative(spark, sf_dir):
    df = _events(spark, sf_dir).withColumn(
        "value_dec", F.col("value").cast("decimal(18,2)")
    )
    out = cumulative_features(
        df, {"value_dec": ["sum", "count"]},
        partition="user_id", order=("ts",), tiebreak=("event_id",),
    )
    return out.select(
        "event_id",
        F.col("value_dec_cum_sum").cast("double").alias("cum_value"),
        F.col("value_dec_cum_count").cast("long").alias("cum_n"),
    )


def _q_chunked_cumulative(spark, sf_dir):
    """Skew-proof cumulative frames (operators/chunked.py prefix-sum
    over order-aligned chunks, every task bounded by chunk_width rows
    of one key) — must be BIT-IDENTICAL to the plain running window,
    so the oracle is the same SQL as `cumulative`. The order column is
    epoch-micros (with_chunks needs a numeric order); 1-hour chunks
    force real multi-chunk recombination at gate scale."""
    from feat_spark.operators.chunked import chunked_cumulative

    e = (
        _events(spark, sf_dir)
        .withColumn("value_dec", F.col("value").cast("decimal(18,2)"))
        .withColumn("ts_us", F.unix_micros(F.col("ts").cast("timestamp")))
    )
    out = chunked_cumulative(
        e, {"value_dec": ["sum", "count"]}, partition="user_id",
        order_col="ts_us", tiebreak=("event_id",),
        chunk_width=3_600_000_000,
    )
    return out.select(
        "event_id",
        F.col("value_dec_cum_sum").cast("double").alias("cum_value"),
        F.col("value_dec_cum_count").cast("long").alias("cum_n"),
    )


def _q_ffill(spark, sf_dir):
    df = _events(spark, sf_dir).withColumn(
        "purchase_value",
        F.when(F.col("event_type") == "purchase", F.col("value")),
    )
    out = forward_fill(
        df, ["purchase_value"], partition="user_id", order=("ts",),
        tiebreak=("event_id",),
    )
    return out.select("event_id", F.col("purchase_value_ffill").alias("last_purchase_value"))


def _q_sessionize(spark, sf_dir):
    out = sessionize(
        _events(spark, sf_dir), gap="30 minutes", partition="user_id",
        ts="ts", tiebreak=("event_id",),
    )
    return out.select("event_id", F.col("session_id").cast("long").alias("session_id"))


def _q_session_agg(spark, sf_dir):
    df = _events(spark, sf_dir).withColumn(
        "value_dec", F.col("value").cast("decimal(18,2)")
    )
    out = session_agg(
        df,
        aggs=[
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value_dec").cast("double").alias("sum_value"),
        ],
        gap="30 minutes", partition="user_id", ts="ts", tiebreak=("event_id",),
    )
    return out.select(
        "user_id", F.col("session_id").cast("long").alias("session_id"),
        "session_start", "session_end", "n_events", "sum_value",
    )


def _q_tumbling(spark, sf_dir):
    df = _events(spark, sf_dir).withColumn(
        "value_dec", F.col("value").cast("decimal(18,2)")
    )
    out = tumbling_window_agg(
        df,
        aggs=[
            F.count(F.lit(1)).alias("n"),
            F.sum("value_dec").cast("double").alias("sum_value"),
        ],
        duration="1 hour", keys="user_id", ts="ts",
    )
    return out.select("user_id", "win_start", "win_end", "n", "sum_value")


def _stream_scratch(tag: str) -> str:
    import tempfile

    return tempfile.mkdtemp(prefix=f"featspark_{tag}_")


def _space_mtimes(d: str, names: list[str], gap_s: int = 60) -> None:
    """FileStreamSource orders micro-batches by file mtime; files written
    milliseconds apart can tie and arrive in either order. Pin it."""
    import time

    base = time.time() - gap_s * (len(names) + 1)
    for i, n in enumerate(names):
        t = base + i * gap_s
        os.utime(os.path.join(d, n), (t, t))


def _q_stream_turn_features(spark, sf_dir):
    """Streaming gate (SURVEY §2.10): a REAL streaming query — file
    source split into two micro-batches (maxFilesPerTrigger=1), the
    custom stateful operator (applyInPandasWithState) carrying running
    turn count + gap-session state across the batch boundary,
    availableNow trigger, memory sink. The oracle is the BATCH session
    SQL — this row is the driver-checked stream/batch parity claim
    (mirrors the reference's end-to-end eunit stance,
    /root/reference/test/feat_tests.erl:284-373).

    Timestamps exit as epoch-microsecond BIGINTs: the streamed ts
    round-trips pandas and re-enters as a session-tz timestamp, so a
    raw-rendered hash could disagree with the oracle's naive rendering
    even when the instants are identical."""
    import uuid

    from feat_spark.streaming.pipeline import (
        run_to_memory,
        stateful_turn_features,
    )

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    turns = (
        _events(spark, sf_dir)
        .select(
            F.col("user_id").cast("string").alias("conv_id"),
            F.row_number().over(w).cast("int").alias("turn_idx"),
            # watermarks require TIMESTAMP (session-tz); the session is
            # UTC-pinned so the instant is unchanged
            F.col("ts").cast("timestamp").alias("ts"),
        )
    )
    d = _stream_scratch("turnstream")
    # two files, each conversation's turns in order across them
    # (the operator's documented ordering contract)
    pdf = turns.toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    if getattr(pdf["ts"].dtype, "tz", None) is None:
        pdf["ts"] = pdf["ts"].dt.tz_localize("UTC")
    cut = len(pdf) // 2
    # micros + UTC annotation so the stream source reads TIMESTAMP back
    pq_opts = dict(index=False, coerce_timestamps="us",
                   allow_truncated_timestamps=True)
    pdf.iloc[:cut].to_parquet(os.path.join(d, "part1.parquet"), **pq_opts)
    pdf.iloc[cut:].to_parquet(os.path.join(d, "part2.parquet"), **pq_opts)
    _space_mtimes(d, ["part1.parquet", "part2.parquet"])

    stream = (
        spark.readStream.schema(turns.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    feats = stateful_turn_features(stream, gap="30 minutes")
    name = "stream_turns_" + uuid.uuid4().hex[:8]
    run_to_memory(feats, name)
    return spark.table(name).select(
        F.col("conv_id").cast("long").alias("user_id"),
        "turn_idx",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "turns_so_far",
        F.col("session_id").cast("long").alias("session_id"),
    )


_STREAM_TURNS_SQL = """
  with seq as (
    select user_id, ts,
           cast(row_number() over (partition by user_id
                                   order by ts, event_id) as int) as turn_idx
    from events),
  s as (
    select *, case when lag(ts) over (partition by user_id order by turn_idx) is null
                     or ts - lag(ts) over (partition by user_id order by turn_idx)
                        > interval '30 minutes'
              then 1 else 0 end as new_s
    from seq)
  select user_id, turn_idx, epoch_us(ts) as ts_us,
         cast(turn_idx as bigint) as turns_so_far,
         cast(sum(new_s) over (partition by user_id order by turn_idx
                               rows between unbounded preceding and current row)
              - 1 as bigint) as session_id
  from s
"""


def _q_stream_asof(spark, sf_dir):
    """Streaming gate #2: the stream-stream point-in-time join
    (stateful_asof_stream — turns ∪ attrs through ONE
    applyInPandasWithState with compacted attribute-history state)
    against the BATCH as-of oracle. Both sides land as file streams
    before the query starts, so batch 0 sees turns and attrs together —
    the in-order arrival the operator's contract requires."""
    import uuid

    from feat_spark.streaming.pipeline import run_to_memory, stateful_asof_stream

    left = _events(spark, sf_dir).select(
        "event_id", "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    rhs = _orders_rhs(spark, sf_dir).withColumn("ts", F.col("ts").cast("timestamp"))
    d = _stream_scratch("asofstream")
    tdir, adir = os.path.join(d, "turns"), os.path.join(d, "attrs")
    left.coalesce(1).write.mode("overwrite").parquet(tdir)
    rhs.coalesce(1).write.mode("overwrite").parquet(adir)

    turns_s = spark.readStream.schema(left.schema).parquet(tdir)
    attrs_s = spark.readStream.schema(rhs.schema).parquet(adir)
    out = stateful_asof_stream(
        turns_s, attrs_s, on="user_id", ts="ts",
        value_cols=["o_orderkey", "o_totalprice"],
    )
    name = "stream_asof_" + uuid.uuid4().hex[:8]
    run_to_memory(out, name)
    return spark.table(name).select(
        "event_id", "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "o_orderkey", "o_totalprice",
    )


_STREAM_ASOF_SQL = f"""
with rhs as ({_ORDERS_RHS_SQL})
select e.event_id, e.user_id, epoch_us(e.ts) as ts_us,
       rhs.o_orderkey, rhs.o_totalprice
from events e
asof left join rhs on e.user_id = rhs.user_id and e.ts >= rhs.ts
"""


def _q_stream_dedup(spark, sf_dir):
    """Streaming gate #3: exact dedup with BOUNDED state
    (withWatermark + dropDuplicatesWithinWatermark). The input stream
    carries every event once plus one-in-three events re-emitted BOTH
    within the first micro-batch and again in the second (intra- and
    cross-batch duplicates; duplicates are byte-identical so whichever
    arrival survives hashes the same). The watermark delay exceeds the
    corpus' ts span, so the run is exact and the batch ``distinct``
    oracle applies — while the state-evicting operator itself executes
    end to end across a real 2-micro-batch availableNow stream."""
    import uuid

    import pandas as pd

    from feat_spark.streaming.pipeline import run_to_memory, stream_exact_dedup

    e = _events(spark, sf_dir).select(
        "event_id", "user_id", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    pdf = e.toPandas().sort_values("event_id").reset_index(drop=True)
    if getattr(pdf["ts"].dtype, "tz", None) is None:
        pdf["ts"] = pdf["ts"].dt.tz_localize("UTC")
    dups = pdf[pdf["event_id"] % 3 == 0]
    cut = len(pdf) // 2
    part1 = pd.concat([pdf.iloc[:cut], dups[dups["event_id"] < int(pdf.iloc[cut]["event_id"])]])
    part2 = pd.concat([pdf.iloc[cut:], dups])
    d = _stream_scratch("dedupstream")
    pq_opts = dict(index=False, coerce_timestamps="us",
                   allow_truncated_timestamps=True)
    part1.to_parquet(os.path.join(d, "part1.parquet"), **pq_opts)
    part2.to_parquet(os.path.join(d, "part2.parquet"), **pq_opts)
    _space_mtimes(d, ["part1.parquet", "part2.parquet"])

    stream = (
        spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    out = stream_exact_dedup(stream, keys=["event_id"], ts_col="ts")
    name = "stream_dedup_" + uuid.uuid4().hex[:8]
    run_to_memory(out, name)
    return spark.table(name).select(
        "event_id", "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "value",
    )


def _q_feature_matrix(spark, sf_dir):
    """The declarative feature-matrix API (plans/features.py): ONE spec
    composing point-in-time attrs + stable order + lag + cumulative +
    trailing time window + sessionization — every constituent has its
    own gate; this row checks the COMPOSITION (the column set a real
    feature job materializes) against a single SQL twin."""
    from feat_spark.plans.features import (
        AsofSource,
        FeatureMatrixSpec,
        build_feature_matrix,
    )

    e = _events(spark, sf_dir).select(
        "event_id", "user_id", "ts", "value",
        F.col("value").cast("decimal(18,2)").alias("value_dec"),
    )
    rhs = _orders_rhs(spark, sf_dir)
    spec = FeatureMatrixSpec(
        entity="user_id", ts="ts", tiebreak=("event_id",),
        asof=[AsofSource(rhs, value_cols=["o_totalprice"])],
        lags={"value": [1]},
        cumulative={"value": ["count"]},
        rolling={"value_dec": {"duration": "1 hour", "fns": ["sum"]}},
        decay={"value": {"half_life_days": 7}},
        zscore={"value": {"n": 20, "min_periods": 5, "sigma": 3.0}},
        session_gap="30 minutes",
    )
    out = build_feature_matrix(e, spec)
    return out.select(
        "event_id", "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "o_totalprice",
        F.col("turn_seq").cast("long").alias("turn_seq"),
        "value_lag1",
        F.col("value_cum_count").cast("long").alias("value_cum_count"),
        F.col("value_dec_roll_sum").cast("double").alias("value_roll_sum"),
        "value_decay7d",
        "value_zscore",
        "value_is_anomaly",
        F.col("session_id").cast("long").alias("session_id"),
    )


def _q_leakage_audit(spark, sf_dir):
    """The north rule's leakage audit as a driver row (plans/audit.py
    `assert_no_future_reads` in frame form): as-of output with matched
    timestamps retained, aggregated per user into (rows, matched rows,
    FUTURE READS — provably zero, and the oracle recomputes the same
    zero from its own ASOF join — and max staleness). A regression that
    let any window/join peek forward flips n_future_reads and fails the
    hash."""
    left = _events(spark, sf_dir).select("event_id", "user_id", "ts")
    rhs = _orders_rhs(spark, sf_dir)
    j = asof_join(
        left, rhs, on="user_id", left_ts="ts", right_ts="ts",
        value_cols=["o_orderkey"], strategy="union_window",
        include_matched_ts=True,
    )
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    m_us = F.unix_micros(F.col("matched_ts").cast("timestamp"))
    return j.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("matched_ts").alias("n_matched"),
        F.sum(F.when(m_us > ts_us, 1).otherwise(0).cast("long")).alias(
            "n_future_reads"
        ),
        F.max(ts_us - m_us).alias("max_staleness_us"),
    )


def _q_quantile_bin(spark, sf_dir):
    """Equal-frequency discretization (operators/encoding.py): exact
    quartile boundaries -> 0-based bin per event; NULL values keep a
    NULL bin. The oracle recomputes boundaries with quantile_cont
    (bit-parity with Spark's exact percentile is already proven by the
    `percentiles` gate) and the same strictly-below count."""
    from feat_spark.operators.encoding import quantile_bin

    e = _events(spark, sf_dir)
    return quantile_bin(e, "value", n_bins=4).select("event_id", "value_bin")


def _q_target_encode(spark, sf_dir):
    """Leakage-safe categorical target encoding (operators/encoding.py):
    event_type encoded as the mean of value over strictly PRECEDING
    rows of the same type — the only target encoding valid for
    point-in-time training data (whole-corpus means leak the row's own
    label and the future). Decimal-sum/round discipline makes the
    running mean bit-replayable."""
    from feat_spark.operators.encoding import cumulative_target_encode

    e = _events(spark, sf_dir)
    out = cumulative_target_encode(
        e, cat_col="event_type", target_col="value",
        order=("ts",), tiebreak=("event_id",),
    )
    return out.select("event_id", "event_type", "event_type_te")


def _q_winsorize(spark, sf_dir):
    """Group-wise winsorization (operators/encoding.py): value clipped
    to event_type's exact [p05, p95]. One percentile aggregate keyed
    by the group; bounds broadcast back — the fact rows never
    reshuffle. Oracle recomputes bounds with quantile_cont and the
    same least/greatest clip."""
    from feat_spark.operators.encoding import winsorize

    e = _events(spark, sf_dir)
    out = winsorize(e, "value", group_col="event_type", lo=0.05, hi=0.95)
    return out.select("event_id", "event_type", "value", "value_wins")


def _q_rolling_zscore(spark, sf_dir):
    """Leakage-safe rolling z-score anomaly flag (operators/windows.py):
    each event scored against the 20 strictly-preceding observations
    of its user (decimal sum/sum-of-squares -> one-pass variance).
    The oracle replays the identical window and arithmetic."""
    from feat_spark.operators.windows import rolling_zscore

    e = _events(spark, sf_dir)
    out = rolling_zscore(
        e, value_col="value", keys="user_id", order=("ts", "event_id"),
        n=20, min_periods=5, sigma=3.0,
    )
    return out.select(
        "event_id", "roll_mean", "roll_std", "zscore", "is_anomaly"
    )


def _q_profile_columns(spark, sf_dir):
    """Single-pass column profiler (operators/profile.py): the events
    table melted into (name, dval, sval, isnull) structs and
    aggregated by column name — row/null/exact-distinct counts,
    numeric min/max, string length bounds, ONE scan for all five
    columns. The oracle recomputes each column's row independently."""
    from feat_spark.operators.profile import profile_columns

    e = _events(spark, sf_dir)
    return profile_columns(
        e,
        numeric_cols=("event_id", "user_id", "value"),
        string_cols=("event_type", "props"),
    )


def _q_decayed_sum(spark, sf_dir):
    """Half-life-decayed running sum (operators/windows.py): recency-
    weighted revenue per user over strictly preceding events. Decay
    steps at absolute 7-day bucket boundaries so every weight is a
    power of two — exact dyadic scaling, so the prefix-sum trick
    (0.5^k_row * sum 2^k_i * v_i) replays bit-for-bit in DuckDB."""
    from feat_spark.operators.windows import decayed_sum

    e = _events(spark, sf_dir)
    out = decayed_sum(
        e, value_col="value", keys="user_id", ts="ts",
        tiebreak=("event_id",), half_life_days=7,
    )
    return out.select("event_id", "decayed_sum")


def _q_transition_matrix(spark, sf_dir):
    """First-order Markov transition matrix of event_type per user
    (operators/windows.py): lag window -> pair counts -> row-normalized
    probabilities. The oracle replays lag, counts and normalization."""
    from feat_spark.operators.windows import transition_matrix

    e = _events(spark, sf_dir)
    return transition_matrix(
        e, cat_col="event_type", keys="user_id", order=("ts", "event_id")
    )


def _q_pagerank(spark, sf_dir):
    """Deterministic fixed-iteration PageRank (operators/graph.py)
    over the customer<->supplier bipartite graph mined from
    orders x lineitem. Contributions decimal-summed, ranks rounded to
    12dp per iteration, lineage checkpointed per round — the oracle
    unrolls all three iterations as CTEs and matches bit-for-bit."""
    from feat_spark.operators.graph import pagerank

    # broadcast the 2-column orders side (r6): the lineitem fact side
    # then never shuffles for the edge build — the old sort-merge paid
    # two exchanges+sorts before the graph loop even started. Same
    # edge set, bit-identical ranks.
    o = F.broadcast(
        _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = o.join(li, o["o_orderkey"] == li["l_orderkey"]).select(
        F.concat(F.lit("c:"), F.col("o_custkey").cast("string")).alias("src"),
        F.concat(F.lit("s:"), F.col("l_suppkey").cast("string")).alias("dst"),
    )
    return pagerank(edges, iters=3, damping=0.85)


def _q_calendar_features(spark, sf_dir):
    """Calendar feature block (operators/encoding.py): convention-free
    integer-arithmetic dow/hour ((days+3)%7 — engines disagree on week
    start; integers don't) plus the cyclical sin/cos hour encodings.
    Pure projection, zero shuffle; oracle replays the arithmetic."""
    from feat_spark.operators.encoding import calendar_features

    e = _events(spark, sf_dir)
    out = calendar_features(e, ts="ts")
    return out.select(
        "event_id", "dow", "hour", "is_weekend", "hour_sin", "hour_cos"
    )


def _q_impute_group_mean(spark, sf_dir):
    """Group-mean null imputation (operators/encoding.py): 'error'
    events get their value masked to NULL, then imputed from their
    event_type's non-null mean (decimal-summed). The missingness flag
    is kept. Oracle replays masking, means, and the coalesce."""
    from feat_spark.operators.encoding import impute_group_mean

    e = _events(spark, sf_dir).withColumn(
        "value",
        F.when(F.col("event_type") == "error", F.lit(None)).otherwise(
            F.col("value")
        ),
    )
    out = impute_group_mean(e, col="value", group_col="event_type")
    return out.select(
        "event_id", "event_type", "value", "value_was_null", "value_imputed"
    )


def _q_cohort_retention(spark, sf_dir):
    """Weekly cohort retention matrix (operators/funnel.py): users
    cohorted by first active absolute week, distinct-active counts per
    (cohort, offset), rates normalized by the offset-0 size. Oracle
    replays bucketing, cohorting, and normalization."""
    from feat_spark.operators.funnel import cohort_retention

    e = _events(spark, sf_dir)
    return cohort_retention(e, user_col="user_id", ts="ts", bucket_days=7)


def _q_active_days(spark, sf_dir):
    """Trailing-7-day distinct-active-days engagement feature
    (operators/windows.py active_days_feature): grain reduction to
    (user, day), a day-range COUNT window on the small frame, joined
    back to event grain — count(distinct) over a window exists in no
    engine; this is the scalable encoding of it."""
    from feat_spark.operators.windows import active_days_feature

    e = _events(spark, sf_dir)
    out = active_days_feature(e, keys="user_id", ts="ts", window_days=7)
    return out.select("event_id", "active_days_7d")


def _q_group_trend(spark, sf_dir):
    """Per-user closed-form OLS trend of value over time
    (operators/encoding.py group_linear_fit): five decimal sums per
    group + normal-equations combine — distributed fitting with no
    iteration and no driver loop. x is centered per group (kills the
    n*Sxx - Sx^2 cancellation at epoch scale). Oracle replays sums
    and combine bit-for-bit."""
    from feat_spark.operators.encoding import group_linear_fit

    e = _events(spark, sf_dir)
    x = F.expr("unix_micros(cast(ts as timestamp)) div 1000000")
    return group_linear_fit(e, x_col=x, y_col="value", group_col="user_id")


def _q_topk(spark, sf_dir):
    out = top_k_per_group(
        _events(spark, sf_dir), k=3, partition="user_id",
        order=[F.col("value").desc(), F.col("event_id").asc()],
    )
    return out.select("user_id", "event_id", "value")


def _q_bfill(spark, sf_dir):
    df = _events(spark, sf_dir).withColumn(
        "purchase_value",
        F.when(F.col("event_type") == "purchase", F.col("value")),
    )
    out = backward_fill(
        df, ["purchase_value"], partition="user_id", order=("ts",),
        tiebreak=("event_id",),
    )
    return out.select("event_id", F.col("purchase_value_bfill").alias("next_purchase_value"))


def _q_time_range_rolling(spark, sf_dir):
    """Time-range rolling frame: sum/count of value over the trailing
    hour per user — rangeBetween on unix_micros, peers-at-same-ts
    included by value (deterministic without a tiebreak)."""
    df = _events(spark, sf_dir).withColumn(
        "value_dec", F.col("value").cast("decimal(18,2)")
    )
    out = time_range_features(
        df, {"value_dec": ["sum", "count"]}, duration="1 hour",
        partition="user_id", ts="ts",
    )
    return out.select(
        "event_id",
        F.col("value_dec_roll_sum").cast("double").alias("roll_sum"),
        F.col("value_dec_roll_count").cast("long").alias("roll_n"),
    )


def _q_semi_join(spark, sf_dir):
    """Left-semi: customers having at least one big order (EXISTS)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 150000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_mktsegment"
    )


def _q_anti_join(spark, sf_dir):
    """Left-anti: customers with no order above 350k (NOT EXISTS) — the
    same shape the checkpoint resume uses to skip done partitions."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 350000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_acctbal"
    )


def _q_grouping_sets(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    o.createOrReplaceTempView("__orders_gs")
    return spark.sql(
        """
        select o_orderpriority, o_orderstatus, count(*) as n,
               cast(sum(cast(o_totalprice as decimal(18,4))) as double) as total
        from __orders_gs
        group by grouping sets ((o_orderpriority), (o_orderstatus), ())
        """
    )


def _q_range_join(spark, sf_dir):
    """Interval join: orders placed within 7 days before each event —
    equi key (user) + range predicate; counts per event."""
    e = _events(spark, sf_dir).select("event_id", "user_id", "ts")
    o = _t(spark, sf_dir, "orders")
    cond = (
        (e.user_id == o.o_custkey)
        & (o.o_orderdate <= e.ts)
        & (o.o_orderdate > e.ts - F.expr("INTERVAL 7 days"))
    )
    joined = e.join(o, cond, "left")
    return joined.groupBy("event_id").agg(
        F.count("o_orderkey").alias("n_recent_orders")
    )


def _q_cube(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.cube("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n")
    )


def _q_distinct_agg(spark, sf_dir):
    e = _events(spark, sf_dir)
    return e.groupBy("user_id").agg(
        F.countDistinct("event_type").alias("n_types"),
        F.count(F.lit(1)).alias("n_events"),
    )


def _q_except_all(spark, sf_dir):
    """Multiset difference (drift check): high-value pairs minus
    very-high-value pairs leaves the 50-80 band, duplicates preserved."""
    e = _events(spark, sf_dir)
    a = e.filter(F.col("value") > 50).select("user_id", "event_type")
    b = e.filter(F.col("value") > 80).select("user_id", "event_type")
    return a.exceptAll(b)


def _q_intersect_all(spark, sf_dir):
    e = _events(spark, sf_dir)
    a = e.filter(F.col("event_type") == "purchase").select("user_id")
    b = e.filter(F.col("event_type") == "error").select("user_id")
    return a.intersectAll(b)


def _q_percentiles(spark, sf_dir):
    e = _events(spark, sf_dir)
    return e.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 4).alias("p90"),
    )


def _q_sliding(spark, sf_dir):
    df = _events(spark, sf_dir)
    out = tumbling_window_agg(
        df, aggs=[F.count(F.lit(1)).alias("n")],
        duration="2 hours", slide="1 hour", keys="user_id", ts="ts",
    )
    return out.select("user_id", "win_start", "n")


def _q_partition_lineage(spark, sf_dir):
    """Per-partition lineage frame (north rule: 'per-partition lineage +
    rows/sec metrics') with a PORTABLE bucket hash so DuckDB reproduces
    the bucketing bit-for-bit — lineage itself is oracle-checked."""
    from feat_spark.functions.text import md5_long32
    from feat_spark.plans.lineage import partition_lineage, with_bucket

    e = _events(spark, sf_dir).withColumn(
        "purchase_value", F.when(F.col("event_type") == "purchase", F.col("value"))
    )
    b = with_bucket(
        e, key="user_id", n_buckets=16,
        hash_fn=lambda c: md5_long32(c.cast("string")),
    )
    out = partition_lineage(
        b, ts_col="ts", null_cols=["purchase_value"], key="user_id",
        exact_distinct=True,
    )
    # Timestamps leave the frame as epoch-microsecond BIGINTs: the driver
    # hashes raw cell values, and Spark (session-tz) vs DuckDB (naive)
    # render the same instant differently — integers can't disagree.
    # (unix_micros rejects TIMESTAMP_NTZ; cast first.)
    return out.select(
        F.col("_bucket").alias("bucket"), "rows_out",
        F.unix_micros(F.col("min_ts").cast("timestamp")).alias("min_ts_us"),
        F.unix_micros(F.col("max_ts").cast("timestamp")).alias("max_ts_us"),
        F.col("n_convs").alias("n_users"), "null_purchase_value",
    )


def _q_map_ops(spark, sf_dir):
    """Map-expression surface (SURVEY §2.9): per-user event-type count
    map via map_from_entries, probed with try_element_at (missing key →
    NULL, the reference's undefined semantics) and map_keys."""
    e = _events(spark, sf_dir)
    per = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    m = per.groupBy("user_id").agg(
        F.map_from_entries(F.collect_list(F.struct("event_type", "n"))).alias("m")
    )
    return m.select(
        "user_id",
        F.try_element_at("m", F.lit("purchase")).alias("n_purchase"),
        F.try_element_at("m", F.lit("error")).alias("n_error"),
        F.size(F.map_keys(F.col("m"))).alias("n_types"),
    )


def _q_salted_agg(spark, sf_dir):
    """Salted two-phase aggregation: bit-identical to the plain
    group-by (the oracle) while spreading hot keys across n_salts
    reducers — decimal sums so the re-association is exact."""
    from feat_spark.operators.salted import salted_group_agg

    e = _events(spark, sf_dir).withColumn(
        "value_dec", F.col("value").cast("decimal(18,2)")
    )
    out = salted_group_agg(
        e, "user_id", {"value_dec": ["sum", "count", "min", "max"]}, n_salts=8
    )
    return out.select(
        "user_id",
        F.col("value_dec_sum").cast("double").alias("sum_value"),
        F.col("value_dec_count").alias("n"),
        F.col("value_dec_min").cast("double").alias("min_value"),
        F.col("value_dec_max").cast("double").alias("max_value"),
    )


def _q_pivot(spark, sf_dir):
    """Pivot (long→wide): per-user event-type counts as columns."""
    kinds = ["click", "view", "purchase", "signup", "error"]
    e = _events(spark, sf_dir)
    out = e.groupBy("user_id").pivot("event_type", kinds).agg(F.count(F.lit(1)))
    return out.select(
        "user_id",
        *[F.coalesce(F.col(k), F.lit(0)).cast("long").alias(f"n_{k}") for k in kinds],
    )


def _q_ranking(spark, sf_dir):
    """Ranking family: rank/dense_rank/percent_rank over value ties,
    ntile over the fully-deterministic ordering."""
    e = _events(spark, sf_dir)
    w_ties = Window.partitionBy("user_id").orderBy(F.col("value").desc())
    w_det = Window.partitionBy("user_id").orderBy(
        F.col("value").desc(), F.col("event_id").asc()
    )
    return e.select(
        "event_id",
        F.rank().over(w_ties).cast("long").alias("rnk"),
        F.dense_rank().over(w_ties).cast("long").alias("drnk"),
        F.round(F.percent_rank().over(w_ties), 6).alias("prnk"),
        F.ntile(4).over(w_det).cast("long").alias("quartile"),
    )


def _q_word_explode(spark, sf_dir):
    """posexplode (UDTF-shaped lateral): one row per (doc, position,
    word)."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.posexplode(TXT.words("text")).alias("pos", "word")
    ).withColumn("pos", F.col("pos").cast("long"))


def _q_sketches(spark, sf_dir):
    """Sketch aggregates (HLL++ distinct, approximate percentile).

    The sketch values themselves are engine-specific bit patterns no
    external oracle can reproduce, so the query is structured around
    what IS checkable: the exact counterparts ride along, and the
    sketch estimates are exported only as error-bound booleans
    (|approx-exact| within the sketch's advertised tolerance). DuckDB
    recomputes the exact columns and asserts the booleans true — a
    broken sketch flips a boolean and reds the hash. Tighter error
    distributions are additionally bounded in pytest
    (test_windows::test_sketch_accuracy)."""
    e = _events(spark, sf_dir)
    agg = e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.percentile_approx("value", 0.5, 1000).alias("p50_approx"),
        F.countDistinct("user_id").alias("exact_users"),
        F.round(F.percentile("value", F.lit(0.5)), 4).alias("p50_exact"),
        F.count(F.lit(1)).alias("n"),
    )
    # HLL++ default rsd is 0.05 → 3-sigma bound 0.15 relative.
    # percentile_approx(accuracy=1000) on per-group row counts this size
    # is within one data element of the interpolated exact median.
    hll_ok = (
        F.abs(F.col("approx_users") - F.col("exact_users"))
        <= 0.15 * F.col("exact_users")
    )
    pct_ok = (
        F.abs(F.col("p50_approx") - F.col("p50_exact"))
        <= 0.1 * F.abs(F.col("p50_exact")) + F.lit(0.5)
    )
    return agg.select(
        "event_type", "n", "exact_users", "p50_exact",
        hll_ok.alias("hll_within_bounds"), pct_ok.alias("pct_within_bounds"),
    )


# ------------------------------------ reference-core: extract/compare/paths

def _payload_frames(spark, sf_dir):
    """Deterministic new/old nested payloads from events: `old` perturbs
    event_type (%7), drops k (%11: old-missing -> NOT a conflict), and
    `new` drops vb (%13: new-missing vs old-present -> conflict)."""
    e = _events(spark, sf_dir)
    k = F.get_json_object("props", "$.k")
    # floor, not cast: Spark double->long truncates, DuckDB rounds
    vb = F.floor(F.col("value") * 10).cast("long").cast("string")
    new = e.select(
        "event_id",
        F.struct(
            F.col("event_type").alias("event_type"),
            F.struct(k.alias("k")).alias("props"),
            F.when(F.col("event_id") % 13 != 0, vb).alias("vb"),
        ).alias("payload"),
    )
    old = e.select(
        "event_id",
        F.struct(
            F.when(F.col("event_id") % 7 == 0, F.concat(F.col("event_type"), F.lit("_x")))
            .otherwise(F.col("event_type")).alias("event_type"),
            F.struct(F.when(F.col("event_id") % 11 != 0, k).alias("k")).alias("props"),
            vb.alias("vb"),
        ).alias("payload"),
    )
    return new, old


def _q_feature_compare(spark, sf_dir):
    """feat's compare/2 + list_diff_fields/2 at table scale: extract
    feature vectors from nested new/old payloads, asymmetric-missing
    compare with diff minimization, report conflicting request paths.
    The outputs (equal / total-collapse / paths) are hash-algebra-free,
    so plain SQL can oracle them."""
    from feat_spark.operators.compare import compare_frames
    from feat_spark.operators.extract import compile_schema

    spec = {1: "event_type", 2: ["props", "k"], 3: "vb"}
    new, old = _payload_frames(spark, sf_dir)
    ptype = new.schema["payload"].dataType

    def feats(df):
        return df.select(
            "event_id", compile_schema(spec, F.col("payload"), ptype).alias("features")
        )

    out = compare_frames(feats(new), feats(old), spec, on="event_id")
    return out.select(
        "event_id", "equal", "diff_total",
        # concat_ws maps a NULL array to '' — keep the 'all' sentinel NULL
        F.when(
            F.col("diff_paths").isNotNull(), F.concat_ws(",", "diff_paths")
        ).alias("diff_paths_str"),
    )


def _q_feature_extract(spark, sf_dir):
    """feat:read/2 at table scale with the PORTABLE leaf hash: the raw
    feature vector itself is oracle-checked, not just the compare
    verdicts (the xxhash64 production hash is golden-tested instead —
    DuckDB cannot reproduce it)."""
    from feat_spark.operators.extract import compile_schema
    from feat_spark.functions.text import md5_long32

    spec = {1: "event_type", 2: ["props", "k"], 3: "vb"}
    new, _ = _payload_frames(spark, sf_dir)
    ptype = new.schema["payload"].dataType
    feats = compile_schema(spec, F.col("payload"), ptype, leaf_hash=md5_long32)
    return new.select("event_id", feats.alias("f")).select(
        "event_id",
        F.col("f.f1").alias("f1"),
        F.col("f.f2").alias("f2"),
        F.col("f.f3").alias("f3"),
    )


_FEATURE_EXTRACT_SQL = """
select event_id,
       ('0x' || substr(md5(event_type), 1, 8))::BIGINT as f1,
       ('0x' || substr(md5(json_extract_string(props, '$.k')), 1, 8))::BIGINT as f2,
       case when event_id % 13 != 0
            then ('0x' || substr(md5(cast(cast(floor(value * 10) as bigint) as varchar)), 1, 8))::BIGINT
       end as f3
from events
"""


_FEATURE_COMPARE_SQL = """
with base as (
  select event_id,
         event_type as n_et,
         json_extract_string(props, '$.k') as n_k,
         case when event_id % 13 != 0
              then cast(cast(floor(value * 10) as bigint) as varchar) end as n_vb,
         case when event_id % 7 = 0 then event_type || '_x'
              else event_type end as o_et,
         case when event_id % 11 != 0
              then json_extract_string(props, '$.k') end as o_k,
         cast(cast(floor(value * 10) as bigint) as varchar) as o_vb
  from events),
cmp as (
  select event_id,
         -- asymmetric rule (feat.erl:283-284): new-missing vs old-present
         -- conflicts; old-missing never does; else value equality
         case when n_et is null and o_et is not null then true
              when o_et is null then false
              else n_et != o_et end as c1,
         case when n_k is null and o_k is not null then true
              when o_k is null then false
              else n_k != o_k end as c2,
         case when n_vb is null and o_vb is not null then true
              when o_vb is null then false
              else n_vb != o_vb end as c3
  from base)
select event_id,
       not (c1 or c2 or c3) as equal,
       (c1 and c2 and c3) as diff_total,   -- minimization collapse
       case when (c1 or c2 or c3) and not (c1 and c2 and c3)
            then array_to_string(list_sort(list_filter(
                   [case when c1 then 'event_type' end,
                    case when c2 then 'props.k' end,
                    case when c3 then 'vb' end], x -> x is not null)), ',')
       end as diff_paths_str
from cmp
"""


def _q_feature_extract_union(spark, sf_dir):
    """Union-schema extraction at table scale (feat.erl:143-179): a
    tagged payload dispatches on its discriminator; unknown variants
    (signup/error) yield NULL features, known variants hash their own
    accessor. Compiled to a CASE/WHEN struct — zero Python at run time."""
    from feat_spark.operators.extract import compile_schema
    from feat_spark.schema import UnionSchema
    from feat_spark.functions.text import md5_long32

    e = _events(spark, sf_dir)
    k = F.get_json_object("props", "$.k")
    vb = F.floor(F.col("value") * 10).cast("long").cast("string")
    pay = e.select(
        "event_id",
        F.struct(
            F.col("event_type").alias("kind"), k.alias("x"), vb.alias("y")
        ).alias("payload"),
    )
    spec = UnionSchema(
        "kind",
        {"click": (10, {11: "x"}), "purchase": (20, {21: "y"}), "view": (30, {31: "x"})},
    )
    ptype = pay.schema["payload"].dataType
    feats = compile_schema(spec, F.col("payload"), ptype, leaf_hash=md5_long32)
    return pay.select("event_id", feats.alias("u")).select(
        "event_id",
        F.col("u.variant").alias("variant"),
        F.col("u.v10.f11").alias("h10"),
        F.col("u.v20.f21").alias("h20"),
        F.col("u.v30.f31").alias("h30"),
    )


def _q_feature_extract_set(spark, sf_dir):
    """Set-schema extraction at table scale (feat.erl:128-141): the
    first 8 words of each document as an unordered collection —
    canonically sorted by extracted features with original indices
    retained, emitted as 'idx:hash' pairs so plain SQL can twin it."""
    from feat_spark.operators.extract import compile_schema
    from feat_spark.schema import SetSchema
    from feat_spark.functions.text import md5_long32

    d = _t(spark, sf_dir, "documents")
    ws8 = F.slice(TXT.words("text"), 1, 8)
    pay = d.select(
        "doc_id",
        F.transform(ws8, lambda w: F.struct(w.alias("w"))).alias("payload"),
    )
    spec = SetSchema({5: "w"})
    ptype = pay.schema["payload"].dataType
    feats = compile_schema(spec, F.col("payload"), ptype, leaf_hash=md5_long32)
    return pay.select(
        "doc_id",
        F.array_join(
            F.transform(
                feats,
                lambda s: F.concat_ws(
                    ":",
                    s.getField("idx").cast("string"),
                    s.getField("f").getField("f5").cast("string"),
                ),
            ),
            ",",
        ).alias("set_features"),
    )


_FEATURE_EXTRACT_UNION_SQL = f"""
select event_id,
       case event_type when 'click' then 10 when 'purchase' then 20
                        when 'view' then 30 end as variant,
       case when event_type = 'click'
            then {_HX.format(x="json_extract_string(props, '$.k')")} end as h10,
       case when event_type = 'purchase'
            then {_HX.format(x="cast(cast(floor(value * 10) as bigint) as varchar)")} end as h20,
       case when event_type = 'view'
            then {_HX.format(x="json_extract_string(props, '$.k')")} end as h30
from events
"""


# ------------------------------------------------- extraction-style hashing

def _q_feature_hash(spark, sf_dir):
    df = _events(spark, sf_dir)
    return df.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_val"),
        F.md5(F.concat_ws("|", "event_type", "props")).alias("payload_hash"),
    )


# ------------------------------------------------------- relational coverage

def _q_q1(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,4)")
    disc = dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - dec("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc).cast("double").alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def _q_segment_revenue(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
            .cast("double")
            .alias("revenue"),
        )
    )


def _q_region_rollup(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
            .cast("double")
            .alias("total"),
        )
    )


def _q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: 3-way join (two broadcast dims into the lineitem
    fact), filtered both sides, grouped revenue, deterministic top-10."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-03-15").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-03-15").cast("timestamp")
    )
    dec = lambda col: F.col(col).cast("decimal(18,4)")
    rev = dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - dec("l_discount"))
    return (
        li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


def _q5_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 shape: 6-way join, region/nation/supplier/customer all
    broadcast, one shuffle for the final group-by."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    dec = lambda col: F.col(col).cast("decimal(18,4)")
    rev = dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - dec("l_discount"))
    return (
        li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


_Q3_SQL = """
  select l_orderkey,
         o_orderdate, o_orderpriority,
         cast(sum(cast(l_extendedprice as decimal(18,4)) *
                  (cast(1 as decimal(18,4)) - cast(l_discount as decimal(18,4)))) as double) as revenue
  from customer, orders, lineitem
  where c_mktsegment = 'BUILDING' and c_custkey = o_custkey and l_orderkey = o_orderkey
    and o_orderdate < timestamp '1997-03-15 00:00:00'
    and l_shipdate > timestamp '1997-03-15 00:00:00'
  group by l_orderkey, o_orderdate, o_orderpriority
  order by revenue desc, o_orderdate, l_orderkey
  limit 10
"""

_Q5_SQL = """
  select n_name,
         cast(sum(cast(l_extendedprice as decimal(18,4)) *
                  (cast(1 as decimal(18,4)) - cast(l_discount as decimal(18,4)))) as double) as revenue
  from customer, orders, lineitem, supplier, nation, region
  where c_custkey = o_custkey and l_orderkey = o_orderkey and l_suppkey = s_suppkey
    and c_nationkey = s_nationkey and s_nationkey = n_nationkey and n_regionkey = r_regionkey
    and r_name = 'ASIA'
    and o_orderdate >= timestamp '1997-01-01 00:00:00'
    and o_orderdate < timestamp '1998-01-01 00:00:00'
  group by n_name
"""


# ----------------------------------------------------------- text analysis

def _q_text_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        TXT.word_count("text").alias("n_words"),
        TXT.token_count("text").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars"),
        F.size(F.array_distinct(TXT.words("text"))).cast("long").alias("n_distinct_words"),
    )


def _q_lang_quality(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.round(TXT.stopword_ratio("text"), 6).alias("stop_ratio"),
        TXT.langid_en("text").alias("pred_lang"),
        TXT.quality_score("text").alias("quality"),
    )


def _q_repetition_stats(spark, sf_dir):
    """Within-document repetition (Gopher/Dolma-style filter signal):
    duplicate-2gram fraction + most-frequent-2gram share. Relational
    form — explode to (doc, gram) rows, two partial-agg group-bys —
    so a pathological document costs rows, not memory."""
    d = _t(spark, sf_dir, "documents")
    grams = d.select("doc_id", F.explode(TXT.raw_word_ngrams("text", 2)).alias("g"))
    per = grams.groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("c"))
    return (
        per.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_2grams"),
            F.count(F.lit(1)).alias("n_distinct_2grams"),
            F.max("c").alias("__maxc"),
        )
        .select(
            "doc_id",
            "n_2grams",
            "n_distinct_2grams",
            F.round(
                1 - F.col("n_distinct_2grams") / F.col("n_2grams"), 6
            ).alias("dup_2gram_frac"),
            F.round(F.col("__maxc") / F.col("n_2grams"), 6).alias("top_2gram_frac"),
        )
    )


def _q_pii_scrub(spark, sf_dir):
    """PII masking (emails / IPv4 / phone-like runs) with per-category
    counts — the standard pre-training scrub pass as a narrow map.
    The corpus carries no PII, so deterministic doc_id-derived tokens
    are injected first; both engines inject and scrub identically, and
    the scrubbed text is compared by md5."""
    d = _t(spark, sf_dir, "documents")
    injected = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"), F.col("doc_id").cast("string"),
            F.lit("@example.com at 10."),
            (F.col("doc_id") % 256).cast("string"), F.lit(".0.1 or +1-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 7, "0"),
        ).alias("text"),
    )
    counts = TXT.pii_counts(F.col("text"))
    scrubbed = TXT.pii_scrub(F.col("text"))
    return injected.select(
        "doc_id",
        counts["email"].alias("n_emails"),
        counts["ip"].alias("n_ips"),
        counts["phone"].alias("n_phones"),
        F.md5(scrubbed).alias("scrubbed_md5"),
        F.length(scrubbed).cast("long").alias("scrubbed_len"),
    )


def _q_quality_udf(spark, sf_dir):
    """Iterator pandas UDF twin of the column-expression quality score —
    same oracle SQL as lang_quality's quality column."""
    from feat_spark.functions.udfs import quality_score_udf

    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", quality_score_udf("text").alias("quality"))


def _q_value_spread_udf(spark, sf_dir):
    from feat_spark.functions.udfs import value_spread_udf

    e = _events(spark, sf_dir)
    return e.groupBy("user_id").agg(
        F.round(value_spread_udf("value"), 4).alias("spread")
    )


def _q_fingerprint(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", TXT.doc_fingerprint("text").alias("fingerprint"))


# ------------------------------------------------------------------- dedup

def _augmented_docs(spark, sf_dir) -> DataFrame:
    """documents ∪ near-duplicate copies (id+100000, last 3 words
    dropped) — a deterministic corpus where near-dup detection has
    actual positives. The same augmentation is inlined in the oracles."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    ws = TXT.words("text")
    trunc = F.concat_ws(" ", F.slice(ws, 1, F.greatest(F.size(ws) - 3, F.lit(1))))
    dups = d.select((F.col("doc_id") + 100000).alias("doc_id"), trunc.alias("text"))
    return d.unionByName(dups)


_AUG_DOCS_SQL = """
  select doc_id, text from documents
  union all
  select doc_id + 100000 as doc_id,
         array_to_string(
           (regexp_split_to_array(trim(text), '\\s+'))[1:greatest(len(regexp_split_to_array(trim(text), '\\s+')) - 3, 1)],
           ' ') as text
  from documents
"""


def _q_dedup_exact(spark, sf_dir):
    # exact dups exist in the augmented corpus only as hash groups of 1;
    # add true duplicates: the originals appended once more (id+200000).
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = d.unionByName(
        d.select((F.col("doc_id") + 200000).alias("doc_id"), "text")
    )
    return D.exact_dedup(corpus, id_col="doc_id", cols=("text",))


def _q_jaccard_pairs(spark, sf_dir):
    return D.shingle_jaccard_pairs(
        _augmented_docs(spark, sf_dir), id_col="doc_id", text_col="text",
        n=3, threshold=0.6,
    )


def _q_minhash_sigs(spark, sf_dir):
    return D.minhash_signatures(
        _t(spark, sf_dir, "documents"), id_col="doc_id", text_col="text",
        k=8, n=3,
    )


def _q_minhash_lsh(spark, sf_dir):
    """Full MinHash->LSH->verify pipeline WITH the degenerate-bucket
    star cap enabled (max_bucket=4; the corpus' largest band bucket is
    8, so the cap genuinely fires and the driver row exercises the
    star path end to end — the oracle replays the capped candidate set
    bit-for-bit)."""
    return D.minhash_dedup_pairs(
        _augmented_docs(spark, sf_dir), id_col="doc_id", text_col="text",
        k=16, bands=8, n=3, threshold=0.6, max_bucket=4,
    )


def _q_simhash(spark, sf_dir):
    return D.simhash32(_t(spark, sf_dir, "documents"), id_col="doc_id", text_col="text")


def _q_simhash_near(spark, sf_dir):
    """SimHash near-dup pairs (hamming <= 6) over documents + exact
    copies: chunked Hamming blocking engine-side; the oracle's plain
    cross join is equivalent because pigeonhole blocking is complete."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = d.unionByName(d.select((F.col("doc_id") + 200000).alias("doc_id"), "text"))
    sims = D.simhash32(corpus, id_col="doc_id", text_col="text")
    return D.simhash_near_pairs(sims, id_col="doc_id", max_hamming=6)


def _q_dedup_components(spark, sf_dir):
    """Dup-pair graph -> canonical component per doc (the step every
    dedup pipeline needs after pair generation): SimHash near-dup pairs
    over documents + exact copies, then HashMin label propagation. The
    oracle computes min-reachable-id with a recursive CTE over the same
    pairs — the fixpoints coincide by definition."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = d.unionByName(
        d.select((F.col("doc_id") + 200000).alias("doc_id"), "text")
    )
    sims = D.simhash32(corpus, id_col="doc_id", text_col="text")
    pairs = D.simhash_near_pairs(sims, id_col="doc_id", max_hamming=6)
    return D.connected_components(pairs)


def _q_dedup_components_star(spark, sf_dir):
    """Same dup graph, same oracle — but labeled by the small-star/
    large-star edge contraction (Kiveris et al. '14, O(log n) rounds
    regardless of diameter — the 10^12-doc path where the graph isn't
    guaranteed star-like). Bit-equality with HashMin is the contract;
    the recursive-CTE oracle checks both against min-reachable-id."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = d.unionByName(
        d.select((F.col("doc_id") + 200000).alias("doc_id"), "text")
    )
    sims = D.simhash32(corpus, id_col="doc_id", text_col="text")
    pairs = D.simhash_near_pairs(sims, id_col="doc_id", max_hamming=6)
    return D.connected_components(pairs, algorithm="star")


def _q_decontamination(spark, sf_dir):
    """Benchmark decontamination (operators/decontam.py): a synthetic
    eval set is carved deterministically from the corpus itself (docs
    with id % 37 == 0 contribute words 3-10 as one benchmark entry), so
    contamination has guaranteed positives; every doc gets its
    8-gram-overlap count. The oracle rebuilds the benchmark, both gram
    inventories, and the broadcast-join hit counts in SQL."""
    from feat_spark.operators.decontam import contamination_flags

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    ws = TXT.words("text")
    bench = (
        d.filter((F.col("doc_id") % 37 == 0) & (F.size(ws) >= 10))
        .select(F.concat_ws(" ", F.slice(ws, 3, 8)).alias("text"))
    )
    return contamination_flags(d, bench, id_col="doc_id", text_col="text", n=8)


def _q_pack_sequences(spark, sf_dir):
    """Sequence packing (operators/packing.py): concat-then-chunk
    placement of every document into fixed 256-token training
    sequences across 8 deterministic hash shards. Pure (hash, count,
    prefix-sum) arithmetic — the oracle replays placement bit-for-bit."""
    from feat_spark.operators.packing import pack_sequences

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return pack_sequences(d, ctx_len=256, id_col="doc_id", text_col="text", n_shards=8)


def _q_packing_stats(spark, sf_dir):
    """Per-shard packing summary (sequences used, fill ratio) over the
    pack_sequences placement — the corpus-level QA number a training
    job reports."""
    from feat_spark.operators.packing import pack_sequences, packing_stats

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return packing_stats(pack_sequences(d, ctx_len=256, n_shards=8), ctx_len=256)


def _q_corpus_mix(spark, sf_dir):
    """Per-language corpus composition report (operators/mixture.py):
    docs, tokens, token share — the data-mixture statement a training
    run publishes before consuming a corpus."""
    from feat_spark.operators.mixture import corpus_mix

    d = _t(spark, sf_dir, "documents")
    return corpus_mix(d, strata="lang", text_col="text")


def _q_mixture_sample(spark, sf_dir):
    """Mixture re-weighting (operators/mixture.py): downsample to a
    target language mix (en:de:fr:es = 5:2:2:1, zh dropped — the spec
    is a whitelist) at maximum size without upsampling. Rates are
    integer basis points from floor arithmetic and membership is the
    portable md5 gate, so the oracle recomputes BOTH the rates and the
    exact sampled set."""
    from feat_spark.operators.mixture import mixture_sample

    d = _t(spark, sf_dir, "documents")
    out = mixture_sample(
        d, targets={"en": 5, "de": 2, "fr": 2, "es": 1},
        strata="lang", key="doc_id", salt="mix",
    )
    return out.select("doc_id", "lang")


def _q_ngram_freq(spark, sf_dir):
    """Corpus-level n-gram document frequencies (boilerplate mining,
    operators/keywords.py): every 2-gram appearing in >=20 distinct
    docs with its doc share."""
    from feat_spark.operators.keywords import ngram_doc_freq

    d = _t(spark, sf_dir, "documents")
    return ngram_doc_freq(d, n=2, min_docs=20)


def _q_lm_score(spark, sf_dir):
    """Bigram-LM quality scoring (operators/keywords.py): per-doc mean
    log-probability under the corpus MLE bigram model — the CCNet-style
    perplexity filter. Float sums fold over lexicographically sorted
    bigram types (never a partial-agg float sum), so DuckDB replays the
    exact accumulation order; ln() bit-parity with DuckDB on this data
    is already exercised by the tfidf gate."""
    from feat_spark.operators.keywords import bigram_lm_scores

    return bigram_lm_scores(_t(spark, sf_dir, "documents"))


def _q_split_assign(spark, sf_dir):
    """Deterministic train/val/test assignment (operators/sampling.py):
    one hash gate partitioned into contiguous ranges — disjoint and
    exhaustive by construction, stable under corpus growth. The oracle
    recomputes every row's assignment."""
    from feat_spark.operators.sampling import assign_split

    d = _t(spark, sf_dir, "documents").select("doc_id")
    return assign_split(d, key="doc_id")


def _q_weighted_sample(spark, sf_dir):
    """Per-row weighted Bernoulli sampling (operators/sampling.py):
    each document kept with probability = its own quality score. The
    hash gate + floor-basis-points arithmetic is integer after one
    multiply, so the oracle recomputes the exact sampled SET."""
    from feat_spark.functions.text import quality_score
    from feat_spark.operators.sampling import weighted_hash_sample

    d = _t(spark, sf_dir, "documents").withColumn(
        "q", quality_score("text")
    )
    return weighted_hash_sample(d, key="doc_id", p_col="q").select(
        "doc_id", "q"
    )


def _q_psi_drift(spark, sf_dir):
    """PSI feature-drift monitor (operators/profile.py): value
    distribution of even vs odd event_ids (stationary by construction,
    so the measured PSI is honestly near zero) over 10 reference-
    fitted equal-frequency bins; per-bin terms decimal-summed. The
    oracle replays boundaries, binning, flooring, and the sum."""
    from feat_spark.operators.profile import population_stability

    e = _events(spark, sf_dir)
    ref = e.filter(F.col("event_id") % 2 == 0)
    cur = e.filter(F.col("event_id") % 2 == 1)
    return population_stability(ref, cur, "value", n_bins=10)


def _q_cap_per_group(spark, sf_dir):
    """Per-group quota cap (RefinedWeb-style per-domain limits): keep
    at most 70 docs per lang, chosen by a stable hash of doc_id. The
    under-cap/over-cap two-phase split (operators/sampling.py) is
    exercised for real here — at sf0.01 three langs exceed the cap and
    two don't — and the oracle replays the full ranked selection."""
    from feat_spark.operators.sampling import cap_per_group

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    return cap_per_group(d, group_col="lang", cap=70, key="doc_id")


def _q_sentence_udtf(spark, sf_dir):
    """Python UDTF lateral join (functions/udfs.py — the Spark 4 table
    -function surface): text -> N sentence rows with position and word
    count. The split regex is RE2-safe so DuckDB replays it with
    regexp_split_to_array + ordinality via an indexed list_transform."""
    from feat_spark.functions.udfs import sentence_split_udtf_class

    spark.udtf.register("split_sentences", sentence_split_udtf_class())
    _t(spark, sf_dir, "documents").createOrReplaceTempView("__docs_udtf")
    return spark.sql(
        """
        select d.doc_id, s.pos, s.sentence, s.n_words
        from __docs_udtf d, lateral split_sentences(d.text) s
        """
    )


def _q_stream_zscore(spark, sf_dir):
    """Streaming gate #5: stateful rolling z-score
    (streaming/pipeline.py stateful_zscore_stream). The event corpus
    is split at its median timestamp into two real micro-batches; each
    user's ring-buffer state (exact integer cents, JSON transport)
    carries the window across the batch boundary, so rows early in
    batch 2 are scored against history seen only in batch 1. Oracle =
    the batch rolling_zscore SQL verbatim — parity by construction."""
    import uuid

    import pandas as pd

    from feat_spark.streaming.pipeline import (
        run_to_memory,
        stateful_zscore_stream,
    )

    e = _events(spark, sf_dir).select(
        "event_id", "user_id", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    pdf = e.toPandas().sort_values(["ts", "event_id"]).reset_index(drop=True)
    if getattr(pdf["ts"].dtype, "tz", None) is None:
        pdf["ts"] = pdf["ts"].dt.tz_localize("UTC")
    m = pdf["ts"].iloc[len(pdf) // 2]
    part1 = pdf[pdf["ts"] < m]
    part2 = pdf[pdf["ts"] >= m]
    d = _stream_scratch("zscorestream")
    pq_opts = dict(index=False, coerce_timestamps="us",
                   allow_truncated_timestamps=True)
    part1.to_parquet(os.path.join(d, "part1.parquet"), **pq_opts)
    part2.to_parquet(os.path.join(d, "part2.parquet"), **pq_opts)
    _space_mtimes(d, ["part1.parquet", "part2.parquet"])

    stream = (
        spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    out = stateful_zscore_stream(
        stream, n=20, min_periods=5, sigma=3.0,
        keys="user_id", watermark="3650 days",
    )
    name = "stream_zscore_" + uuid.uuid4().hex[:8]
    run_to_memory(out, name)
    return spark.table(name).select(
        "event_id", "roll_mean", "roll_std", "zscore", "is_anomaly"
    )


def _q_source_stats(spark, sf_dir):
    """Domain-level curation stats (plans/curation.py): per-source doc
    count, decimal-summed mean quality, english fraction, exact-dup
    fraction, and the wholesale block decision — the stage that turns
    a rotten domain into a scan-time partition prune instead of
    per-doc work. Oracle replays the whole aggregate."""
    from feat_spark.plans.curation import source_curation_stats

    d = _t(spark, sf_dir, "documents")
    return source_curation_stats(
        d, source_col="source", text_col="text",
        min_quality=0.36, max_dup_frac=0.2,
    )


def _q_dedup_exact_canonical(spark, sf_dir):
    """Exact dedup over the CANONICAL text form (functions/text.py
    canonical_text: lower/strip-punct/collapse-ws): case, punctuation
    and spacing variants — planted here as upper-cased and
    punct-noised copies — land in one hash group raw md5 would split
    three ways."""
    from feat_spark.functions.text import canonical_text

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = (
        d.unionByName(
            d.select((F.col("doc_id") + 200000).alias("doc_id"),
                     F.upper("text").alias("text"))
        )
        .unionByName(
            d.select((F.col("doc_id") + 400000).alias("doc_id"),
                     F.concat(F.col("text"), F.lit(" !!!")).alias("text"))
        )
    )
    canon = corpus.withColumn("ctext", canonical_text("text"))
    return D.exact_dedup(canon, id_col="doc_id", cols=("ctext",))


def _q_incremental_dedup(spark, sf_dir):
    """Incremental near-dup (operators/dedup.py incremental_lsh_pairs):
    a NEW batch (the truncated near-copies, ids +100000) banded against
    the stored signature INDEX (the originals) — candidates are strictly
    index x new, then exact-Jaccard verified. The daily-ingest pattern;
    the oracle replays both signature sets and the cross-join band
    bucketing."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    ws = TXT.words("text")
    trunc = F.concat_ws(" ", F.slice(ws, 1, F.greatest(F.size(ws) - 3, F.lit(1))))
    new = d.select((F.col("doc_id") + 100000).alias("doc_id"), trunc.alias("text"))
    idx_sigs = D.minhash_signatures(d, k=16, n=3)
    new_sigs = D.minhash_signatures(new, k=16, n=3)
    cand = D.incremental_lsh_pairs(new_sigs, idx_sigs, k=16, bands=8)
    combined = d.unionByName(new)
    return D.shingle_jaccard_pairs(
        combined, n=3, threshold=0.6, candidates=cand
    )


def _q_chunk_documents(spark, sf_dir):
    """Sliding-window chunking (operators/packing.py): overlapping
    32-token chunks every 16 tokens, content-addressed by md5 — pure
    integer arithmetic + array slicing, replayed exactly in SQL."""
    from feat_spark.operators.packing import chunk_documents

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return chunk_documents(d, chunk_tokens=32, stride=16)


def _q_span_dup_stats(spark, sf_dir):
    """Duplicated-span statistics (operators/dedup.py): fraction of
    each doc's positional 8-gram windows whose text occurs more than
    once corpus-wide — the relational stand-in for suffix-array
    substring dedup, over documents + truncated near-copies so copied
    spans genuinely exist."""
    from feat_spark.operators.dedup import span_dup_stats

    return span_dup_stats(_augmented_docs(spark, sf_dir), n=8)


def _q_session_funnel(spark, sf_dir):
    """Sessionized funnel (operators/funnel.py): view -> click ->
    purchase with first-conversion semantics (each stage = earliest
    candidate at-or-after the previous stage's time) per (user,
    session). Stage times leave as epoch-us BIGINTs."""
    from feat_spark.operators.funnel import session_funnel
    from feat_spark.operators.sessionize import sessionize

    e = _events(spark, sf_dir)
    s = sessionize(
        e, gap="30 minutes", partition="user_id", ts="ts",
        tiebreak=("event_id",),
    )
    f = session_funnel(
        s, stages=("view", "click", "purchase"),
        keys=("user_id", "session_id"), type_col="event_type", ts_col="ts",
    )
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))
    return f.select(
        "user_id",
        F.col("session_id").cast("long").alias("session_id"),
        us("t_0").alias("t0_us"),
        us("t_1").alias("t1_us"),
        us("t_2").alias("t2_us"),
        "reached_click",
        "reached_purchase",
    )


def _q_stratified_sample(spark, sf_dir):
    """Deterministic per-stratum hash sampling (layout-independent,
    replayable: the oracle recomputes the SAMPLED SET, not its size)."""
    from feat_spark.operators.sampling import stratified_hash_sample

    e = _events(spark, sf_dir)
    out = stratified_hash_sample(
        e, strata="event_type", key="event_id",
        rates={"click": 10, "view": 5, "purchase": 100, "error": 100},
        default_pct=20,
    )
    return out.select("event_id", "event_type")


def _q_tfidf(spark, sf_dir):
    """Per-document top-5 TF-IDF keywords (operators/keywords.py):
    relational tf/df aggregation + word-keyed join, smoothed idf."""
    from feat_spark.operators.keywords import tfidf_topk

    return tfidf_topk(_t(spark, sf_dir, "documents"), k=5)


def _q_curation_pipeline(spark, sf_dir):
    """END-TO-END curation (plans/curation.py): quality gate -> exact
    dedup -> LSH near-dup component drop -> hash sample, over documents
    + truncated near-copies. Every stage is an already-oracled
    primitive; this row checks their COMPOSITION (keep/drop rules,
    stage order) against a single composed SQL twin."""
    from feat_spark.plans.curation import curate_documents

    corpus = _augmented_docs(spark, sf_dir)
    out = curate_documents(
        corpus, quality_floor=0.2, near_dup_threshold=0.6,
        minhash_k=16, bands=8, shingle_n=3, sample_pct=80,
    )
    return out.select("doc_id", F.md5("text").alias("content_md5"))


# -------------------------------------------------------------- similarity

def _q_knn(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return S.cosine_topk(e, queries, k=5, id_col="vec_id", vec_col="embedding")


def _q_knn_lsh(spark, sf_dir):
    """LSH ANN with multi-probe (Hamming-1 buckets). The hyperplanes are
    md5-derived, so the DuckDB oracle replicates the WHOLE index —
    bucketing, probing, ranking — and the row is fully hash-checked
    (bit-agreed recall misses included), like minhash_lsh_dedup."""
    e = _t(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return S.lsh_bucketed_topk(
        e, queries, k=5, id_col="vec_id", vec_col="embedding", planes=3, dim=64,
        probe_hamming=1,
    )


def _q_knn_lsh_recall(spark, sf_dir):
    """Recall@5 of the multi-probe, TWO-TABLE (OR-construction) LSH
    result against the exact top-k — the index-quality metric the
    round-1 verdict asked for, oracle-checked end to end (DuckDB
    recomputes both hash tables, the exact kNN, and the same recall).
    Round-2 single-table recall was 0.68; the second independent plane
    family lifts it to 0.90 at sf0.01 / 0.94 at sf0.001 (floor >=0.9
    asserted in tests/test_similarity.py) at 2x candidate cost."""
    e = _t(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    lsh = S.lsh_bucketed_topk(
        e, queries, k=5, id_col="vec_id", vec_col="embedding", planes=3, dim=64,
        probe_hamming=1, tables=2,
    )
    exact = S.cosine_topk(e, queries, k=5, id_col="vec_id", vec_col="embedding")
    hits = exact.join(
        lsh.select("query_id", "neighbor_id").withColumn("__hit", F.lit(1)),
        ["query_id", "neighbor_id"],
        "left",
    )
    return (
        hits.groupBy("query_id")
        .agg(F.sum(F.coalesce(F.col("__hit"), F.lit(0))).cast("long").alias("n_hits"))
        .withColumn("recall_at_5", F.round(F.col("n_hits") / 5.0, 4))
    )


def _q_knn_ivf(spark, sf_dir):
    """IVF ANN with a TRAINED coarse quantizer: 2 deterministic Lloyd
    iterations (seeded init = 16 lowest-id vectors, decimal-summed
    means so training is order-independent), nearest-centroid
    assignment, 4-probe search. The oracle replicates the WHOLE index —
    k-means training, build, and probe — so recall misses of the index
    itself are bit-agreed, like minhash_lsh_dedup."""
    e = _t(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # train on a bounded, deterministic sample (lowest 2000 ids) — the
    # 100 TB posture: centroid quality needs thousands of points, not
    # the corpus; full-corpus work stays in assignment/probe
    cents = S.kmeans_centroids(
        e.filter(F.col("vec_id") < 2000),
        n_centroids=16, iters=2, id_col="vec_id", vec_col="embedding",
    )
    return S.ivf_topk(
        e, queries, k=5, id_col="vec_id", vec_col="embedding",
        n_centroids=16, n_probe=4, centroids=cents,
    )


def _q_semantic_dedup(spark, sf_dir):
    """SemDeDup (cluster-then-dedup, arXiv:2303.09540): the SAME
    deterministic k-means quantizer as `knn_cosine_ivf` partitions the
    corpus; within each cluster, any vector whose cosine to a lower-id
    clustermate exceeds 0.35 is flagged a semantic duplicate.
    Assignment is a pure projection (zero shuffle — see
    similarity.assign_clusters); the oracle replays training,
    assignment, and the within-cluster pair scan bit-for-bit."""
    e = _t(spark, sf_dir, "embeddings")
    cents = S.kmeans_centroids(
        e.filter(F.col("vec_id") < 2000),
        n_centroids=16, iters=2, id_col="vec_id", vec_col="embedding",
    )
    # pair_strategy="grouped": 16 clusters cap any join-shaped pair
    # scan at 16 tasks, and the interpreted per-pair dot costs ~µs;
    # the per-cluster numpy pass replays the identical IEEE sequence
    # at ns/element (r6 — results verified bit-identical, see
    # similarity.semantic_dedup and tests/test_similarity_grouped.py)
    return S.semantic_dedup(
        e, centroids=cents, threshold=0.35, id_col="vec_id",
        vec_col="embedding", pair_strategy="grouped",
    )


def _q_semantic_dedup_largek(spark, sf_dir):
    """SemDeDup at a LARGE coarse quantizer (n_centroids=256 — toward
    the paper's cited ~1e5-cluster regime): assignment goes through
    ``assign_clusters(strategy="join")`` — broadcast centroid frame +
    per-row ``max(struct(cos, -cid))`` — whose expression size is O(1)
    in k, where the literal-fold projection used at k=16 would be a
    256-branch ``greatest`` chain (similarity.LITERAL_MAX_K draws the
    line; the n*k candidate stream collapses to n rows in the MAP-SIDE
    partial aggregate before the single exchange). Centroids = the 256
    lowest-id vectors (no Lloyd: training is already oracle-checked by
    knn_cosine_ivf/semantic_dedup; this gate isolates the large-k
    assignment path). The oracle replays assignment (same cos-desc,
    cid-asc tie break) and the within-cluster pair scan."""
    e = _t(spark, sf_dir, "embeddings")
    cents = (
        e.orderBy(F.col("vec_id").asc())
        .limit(256)
        .select(F.col("vec_id").alias("__cid"), F.col("embedding").alias("__cent"))
    )
    # materialize: feeds the broadcast in assign_clusters (256 rows)
    cents = spark.createDataFrame(cents.collect(), cents.schema)
    return S.semantic_dedup(
        e, centroids=cents, threshold=0.35, id_col="vec_id",
        vec_col="embedding", assign_strategy="join",
        pair_strategy="grouped",  # same rationale as semantic_dedup
    )


def _q_classifier_scores(spark, sf_dir):
    """Frozen-linear-head inference over the embeddings corpus
    (similarity.linear_classifier_scores): the md5-derived weight
    vector is recomputed on every executor (nothing broadcast/stored),
    the dot product + sigmoid is a pure projection — zero shuffle,
    zero UDF. The oracle rebuilds the identical model."""
    e = _t(spark, sf_dir, "embeddings")
    return S.linear_classifier_scores(e, dim=64, bias=0.0)


def _q_skew_report(spark, sf_dir):
    """Key-skew diagnostics (operators/profile.py): top-5 heavy
    hitters of events.user_id with corpus share and multiple-of-mean
    — the report that tells a 100 TB job to salt/isolate BEFORE the
    straggler task does. TakeOrdered top-k, no global window."""
    from feat_spark.operators.profile import skew_report

    return skew_report(_events(spark, sf_dir), key="user_id", topk=5)


def _q_group_centroids(spark, sf_dir):
    """Per-label mean embeddings (similarity.group_centroids): class
    centroids via posexplode + decimal-summed partial aggregation —
    the shuffle carries per-dimension cells, never whole vectors.
    Long (label, pos) form; the oracle replays the aggregation."""
    e = _t(spark, sf_dir, "embeddings")
    return S.group_centroids(e, group_col="label", vec_col="embedding")


def _q_knn_label_agreement(spark, sf_dir):
    """Index-quality metric #2 (beside recall): does the exact top-5
    neighborhood agree with the query's own label? Per query: neighbor
    votes for the query's label and the majority-vote hit (ties break
    toward agreement iff the query label is among the max-vote labels
    with the smallest label value — fully deterministic). Uses the
    embeddings table's `label` column; the oracle replays the vote."""
    e = _t(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    topk = S.cosine_topk(e, queries, k=5, id_col="vec_id", vec_col="embedding")
    labels = e.select("vec_id", "label")
    votes = (
        topk.join(labels.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id")
        .groupBy("query_id", "label")
        .agg(F.count(F.lit(1)).alias("v"))
    )
    top_vote = votes.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("query_id").orderBy(F.col("v").desc(), F.col("label").asc())
        ),
    ).filter(F.col("rn") == 1).select(
        "query_id", F.col("label").alias("maj_label"), F.col("v").alias("maj_votes")
    )
    qlab = labels.withColumnRenamed("vec_id", "query_id").withColumnRenamed(
        "label", "query_label"
    )
    return (
        top_vote.join(qlab, "query_id")
        .select(
            "query_id", "query_label", "maj_label",
            F.col("maj_votes").cast("long").alias("maj_votes"),
            (F.col("maj_label") == F.col("query_label")).alias("agree"),
        )
    )


def _q_embedding_near_dup(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    return S.embedding_near_dup_pairs(
        e, threshold=0.35, id_col="vec_id", vec_col="embedding", exact=True
    )


# ------------------------------------------------------------- multimodal

def _q_media_features(spark, sf_dir):
    """Multimodal plumbing end-to-end with a REAL oracle: documents'
    bytes stand in for media payloads (binary column), mapInPandas
    decodes them with the deterministic fake decoder, and DuckDB
    recomputes byte length + header-derived metadata in SQL."""
    from feat_spark.operators.multimodal import (
        deterministic_fake_decoder,
        extract_media_features,
    )

    d = _t(spark, sf_dir, "documents")
    media = d.select(
        F.col("doc_id").cast("string").alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.lit(0).cast("int").alias("media_idx"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.lit("x/fake").alias("mime"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    feats = extract_media_features(
        media, {t: deterministic_fake_decoder(t) for t in ("image", "audio", "video")}
    )
    return feats.select(
        F.col("conv_id").cast("long").alias("doc_id"),
        "media_type", "n_bytes", "width", "height", "duration_ms", "decode_ok",
    )


_MEDIA_SQL = """
with h as (
  select doc_id, text, doc_id % 3 as m,
         (coalesce(ascii(nullif(substr(text, 1, 1), '')), 0)::HUGEINT
          + coalesce(ascii(nullif(substr(text, 2, 1), '')), 0)::HUGEINT * 256
          + coalesce(ascii(nullif(substr(text, 3, 1), '')), 0)::HUGEINT * 65536
          + coalesce(ascii(nullif(substr(text, 4, 1), '')), 0)::HUGEINT * 16777216
          + coalesce(ascii(nullif(substr(text, 5, 1), '')), 0)::HUGEINT * 4294967296
          + coalesce(ascii(nullif(substr(text, 6, 1), '')), 0)::HUGEINT * 1099511627776
          + coalesce(ascii(nullif(substr(text, 7, 1), '')), 0)::HUGEINT * 281474976710656
          + coalesce(ascii(nullif(substr(text, 8, 1), '')), 0)::HUGEINT * 72057594037927936
         ) as hv
  from documents)
select doc_id,
       case m when 0 then 'image' when 1 then 'audio' else 'video' end as media_type,
       octet_length(encode(text))::BIGINT as n_bytes,
       case m when 0 then (64 + hv % 1024)::INT
              when 2 then (64 + hv % 1920)::INT end as width,
       case m when 0 then (64 + (hv // 1024) % 1024)::INT
              when 2 then (64 + (hv // 1024) % 1080)::INT end as height,
       case m when 1 then (200 + hv % 600000)::BIGINT
              when 2 then (1000 + hv % 3600000)::BIGINT end as duration_ms,
       true as decode_ok
from h
"""


# ------------------------------------------------- labels / diff / cooccur


def _q_time_to_event(spark, sf_dir):
    """Survival / churn label construction (operators/labels.py):
    per event, whole seconds until the same user's NEXT purchase,
    right-censored at 3 days. Strictly-future frame — the label the
    leakage-safe feature frames are allowed to train against."""
    from feat_spark.operators.labels import time_to_event

    e = _events(spark, sf_dir)
    return time_to_event(
        e,
        entity_col="user_id",
        ts_col="ts",
        id_col="event_id",
        target_filter=F.col("event_type") == "purchase",
        horizon_sec=3 * 86400,
    ).select("event_id", "tte_sec", "observed")


def _q_negative_sample(spark, sf_dir):
    """Deterministic contrastive negatives (operators/labels.py): for
    each (user, clicked-doc) positive, up to 3 docs the user never
    clicked, hashed straight into the observed doc-id domain — no
    catalog index, no RNG, no global row_number funnel."""
    from feat_spark.operators.labels import negative_sample

    e = _events(spark, sf_dir)
    pos = (
        e.filter(F.col("event_type") == "click")
        .select("user_id", F.pmod(F.col("event_id"), F.lit(500)).alias("doc_id"))
        .distinct()
    )
    cat = _t(spark, sf_dir, "documents")
    return negative_sample(
        pos, cat, entity_col="user_id", item_col="doc_id",
        catalog_item_col="doc_id", k=3,
    )


def _q_cooccurrence_pmi(spark, sf_dir):
    """Word co-occurrence + PMI (operators/cooccur.py): unordered word
    pairs sharing a document (each doc capped to its top-12 words, the
    pigeonhole-cap device), frequency floor 5, PMI over the capped
    corpus. The oracle replays cap, pairing, and the ln/round."""
    from feat_spark.operators.cooccur import cooccurrence_pmi

    d = _t(spark, sf_dir, "documents")
    return cooccurrence_pmi(d, per_doc=12, min_pairs=5)


def _q_random_projection(spark, sf_dir):
    """Sign-random-projection 64 -> 8 dims (similarity.random_project):
    md5-derived +-1 matrix folded into the plan as a literal — the JL
    dim-reduction pre-step for ANN re-ranking. The oracle re-derives
    every sign from md5 and refolds the dot products."""
    from feat_spark.operators.similarity import random_project

    v = _t(spark, sf_dir, "embeddings")
    p = random_project(v, in_dim=64, out_dim=8)
    # scalar-only gate projection: the driver's canonicalizer crashes
    # sorting array cells (r4 harness error), so the array is unrolled
    # to (vec_id, pos, val) rows — dtype-exact, no string rendering
    return p.select("vec_id", F.posexplode("proj").alias("pos", "val"))


def _q_snapshot_diff(spark, sf_dir):
    """Table-version diff (plans/snapshot.py — the reference's
    compare/list_diff_fields semantics lifted to relations,
    /root/reference/src/feat.erl:128-141,326-353): old = events, new =
    a deterministic mutation (drop %97, double value %89, retype %101,
    clone-add %103), reporting per-row status + differing columns."""
    from feat_spark.plans.snapshot import snapshot_diff

    old = _events(spark, sf_dir)
    base = old.filter(F.col("event_id") % 97 != 0)
    mutated = base.withColumn(
        "value",
        F.when(F.col("event_id") % 89 == 0, F.col("value") * 2).otherwise(
            F.col("value")
        ),
    ).withColumn(
        "event_type",
        F.when(F.col("event_id") % 101 == 0, F.lit("migrated")).otherwise(
            F.col("event_type")
        ),
    )
    added = old.filter(F.col("event_id") % 103 == 0).withColumn(
        "event_id", F.col("event_id") + 10_000_000
    )
    new = mutated.unionByName(added)
    d = snapshot_diff(
        old, new, key_cols=["event_id"], compare_cols=["event_type", "value"]
    )
    # scalar-only gate projection (driver _canon crashes on array cells,
    # r4 harness error): the changed-column list flattens to a CSV string
    # — it is ordered by compare_cols construction, so no rendering hazard
    return d.select(
        "event_id", "status", F.concat_ws(",", "changed_cols").alias("changed_cols")
    )


def _q_rolling_active_users(spark, sf_dir):
    """Exact rolling 7-day distinct users per event_type
    (windows.rolling_distinct_count): Spark has no DISTINCT-over-
    window, so visibility intervals are merged per user and a boundary
    prefix-sum over the day spine answers coverage — exact DAU with no
    event-grain window and no sketch. The oracle IS the naive
    windowed-distinct query DuckDB can run directly."""
    from feat_spark.operators.windows import rolling_distinct_count

    e = _events(spark, sf_dir)
    return rolling_distinct_count(
        e, group_col="event_type", entity_col="user_id",
        ts_col="ts", window_days=7, out_col="dau7",
    )


def _q_remove_dup_spans(spark, sf_dir):
    """Span-level boilerplate scrub (dedup.remove_duplicate_spans —
    the removal half of span_dup_stats): every word covered by a
    corpus-duplicated positional 8-gram is dropped and the text is
    rebuilt in original word order, over documents + truncated
    near-copies so copied spans genuinely exist. The oracle replays
    the mask and the ordered rebuild."""
    from feat_spark.operators.dedup import remove_duplicate_spans

    return remove_duplicate_spans(
        _augmented_docs(spark, sf_dir), n=8, max_occurrences=1
    )


def _q_table_fingerprint(spark, sf_dir):
    """Order-independent per-partition content checksum
    (plans/audit.table_fingerprint): portable column rendering ->
    md5 row hash -> commutative decimal(38,0) sum, grouped by
    event_type — the cross-engine "are these two tables identical"
    audit primitive, and the proof is the oracle itself: DuckDB
    recomputes the identical fingerprints from the same parquet."""
    from feat_spark.plans.audit import table_fingerprint

    e = _events(spark, sf_dir).select(
        "event_type",
        F.col("event_id"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.col("value").cast("decimal(18,2)").alias("value_c"),
        "props",
    )
    out = table_fingerprint(e, group_by="event_type")
    # decimal(38,0) -> string for the driver: its pandas oracle path
    # narrows wide decimals and diverges from Spark's Decimal objects
    # (r4 hash-red; same class as r1/r2 partition_lineage)
    return out.withColumn("fingerprint", F.col("fingerprint").cast("string"))


def _q_behavior_entropy(spark, sf_dir):
    """Per-user Shannon entropy of the event-type distribution
    (profile.behavior_entropy): the behavioral-diversity / bot signal.
    H = ln(n) - sum(c*ln(c))/n with the float fold running over
    lexicographically sorted categories (the lm_score device), so the
    oracle replays the exact accumulation order with list_reduce."""
    from feat_spark.operators.profile import behavior_entropy

    e = _events(spark, sf_dir)
    return behavior_entropy(e, entity_col="user_id", cat_col="event_type")


def _q_temporal_split(spark, sf_dir):
    """Purged time-series train/test split with an embargo gap
    (sampling.temporal_split_embargo): train strictly before
    cutoff - 1 day, test at/after the 2024-01-22 cutoff, the day in
    between excluded from both — the leakage-safe companion to
    time_to_event's forward-looking labels. Pure pushed-down
    projection; the oracle recomputes every row's label from naive
    epoch micros."""
    import datetime

    from feat_spark.operators.sampling import temporal_split_embargo

    e = _events(spark, sf_dir)
    out = temporal_split_embargo(
        e,
        ts_col="ts",
        cutoff=datetime.datetime(2024, 1, 22),
        embargo_sec=86400,
    )
    return out.select("event_id", "split")


def _q_interval_coverage(spark, sf_dir):
    """Gaps-and-islands interval union (windows.interval_coverage):
    each event opens a [ts, ts + value seconds) activity interval
    (value at cent resolution so the duration is an exact integer of
    micros); per user we report raw/merged interval counts and total
    covered micros. All-integer arithmetic — the oracle replays the
    same two windows bit-for-bit."""
    from feat_spark.operators.windows import interval_coverage

    e = _events(spark, sf_dir).filter(F.col("value").isNotNull())
    dur_us = (
        F.col("value").cast("decimal(18,2)") * 100
    ).cast("long") * 10000
    e = e.withColumn(
        "end_ts",
        F.timestamp_micros(
            F.unix_micros(F.col("ts").cast("timestamp")) + dur_us
        ),
    )
    return interval_coverage(
        e, entity_col="user_id", start_col="ts", end_col="end_ts"
    )


def _q_sequence_audit(spark, sf_dir):
    """Sequence-integrity QC (plans/audit.sequence_audit): per user,
    tied timestamps, event_id inversions against time order, and the
    largest silence gap — the trust-the-ordering check a transcript
    pipeline runs before stable (conv_id, turn_idx) ordering is
    assumed. Integer epoch-micro lag math; the oracle is the same
    window verbatim."""
    from feat_spark.plans.audit import sequence_audit

    e = _events(spark, sf_dir)
    return sequence_audit(
        e, entity_col="user_id", ts_col="ts", seq_col="event_id"
    )


def _q_cuped(spark, sf_dir):
    """CUPED variance-reduced experiment readout (operators/
    experiment.py): per-user pre-period (Jan 1-15) vs experiment-period
    value sums in exact integer cents, variant = user_id % 2, pooled
    theta from five decimal sums, adjusted means in closed form. The
    oracle replays the sums and the double arithmetic verbatim."""
    from feat_spark.operators.experiment import cuped_adjust

    e = _events(spark, sf_dir).filter(F.col("value").isNotNull())
    cut = 1705276800000000  # 2024-01-15
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    per_user = e.groupBy("user_id").agg(
        F.sum(F.when(ts_us < cut, cents)).alias("x"),
        F.sum(F.when(ts_us >= cut, cents)).alias("y"),
    )
    units = per_user.withColumn("variant", F.col("user_id") % 2)
    return cuped_adjust(units, variant_col="variant", y_col="y", x_col="x")


def _q_robust_outliers(spark, sf_dir):
    """Median/MAD robust z-score outlier flags per event_type
    (profile.robust_outliers): values quantized to integer half-cents
    so interpolated medians and deviations are exact in any engine;
    mad = 0 yields NULL z and no flag. The oracle recomputes both
    percentile passes with quantile_cont."""
    from feat_spark.operators.profile import robust_outliers

    e = _events(spark, sf_dir)
    return robust_outliers(
        e, group_col="event_type", value_col="value",
        id_cols=("event_id",), k=3.5,
    )


def _q_build_vocab(spark, sf_dir):
    """Frequency-ranked vocabulary (encoding.build_vocab): dense
    token ids over documents, ties lexicographic, min_count=3,
    capped at 500. Corpus work is one word count; the ranking window
    runs on the aggregated dimension-scale vocab. The oracle replays
    the count, the rank, and the cap."""
    from feat_spark.operators.encoding import build_vocab

    d = _t(spark, sf_dir, "documents")
    return build_vocab(d, text_col="text", min_count=3, max_size=500)


def _q_fk_coverage(spark, sf_dir):
    """Referential-integrity audit (plans/audit.fk_coverage) over
    three TPC-H foreign-key edges — orphan counts and matched-key
    coverage per relation. The oracle recomputes each edge with
    anti-join counts."""
    from feat_spark.plans.audit import fk_coverage

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    rels = [
        fk_coverage(o, "o_custkey", c, "c_custkey", "orders->customer"),
        fk_coverage(li, "l_orderkey", o, "o_orderkey", "lineitem->orders"),
        fk_coverage(li, "l_partkey", p, "p_partkey", "lineitem->part"),
    ]
    out = rels[0]
    for r in rels[1:]:
        out = out.unionByName(r)
    return out


def _q_fuzzy_pairs(spark, sf_dir):
    """Blocked edit-distance matching (dedup.fuzzy_pairs): part-name
    pairs at Levenshtein distance <= 2 within a composite block
    (first token + first char of the second token) — the
    record-linkage candidate generator, shaped like the LSH band join
    (equi-join on the block key, never all-pairs). The composite
    block bounds fan-out ~5x tighter than the first token alone; a
    dist<=2 pair whose second token changes its FIRST letter escapes
    the block — the documented recall bound, same tradeoff as an LSH
    band count. DuckDB's levenshtein is the same unit-cost metric, so
    the oracle replays every pair and distance."""
    from feat_spark.operators.dedup import fuzzy_pairs

    p = _t(spark, sf_dir, "part").select("p_partkey", "p_name")
    toks = F.split(F.col("p_name"), " ")
    blk = F.concat_ws(":", toks[0], F.substring(toks[1], 1, 1))
    # broadcast=True: part is dimension-sized (200k rows / ~10 MB at
    # sf1) while the composite block key has only ~48 distinct values —
    # a shuffle join caps at 48-way parallelism; the broadcast probe
    # filters the O(block²) candidate stream inline (r6 optimization,
    # results bit-identical: the join predicate is unchanged)
    return fuzzy_pairs(
        p, id_col="p_partkey", str_col="p_name", max_dist=2, block=blk,
        broadcast=True,
    )


def _q_fuzzy_pairs_recall(spark, sf_dir):
    """OR-construction recall for blocked edit distance
    (dedup.fuzzy_pairs ``blocks=``) — the fuzzy twin of
    `knn_lsh_recall`, against PLANTED second-token typos built to
    escape the single composite block. For every part name with a
    second token, a typo'd copy (id + 10,000,000) substitutes the
    second token's first character ('q', or 'z' when it already is
    'q') — Levenshtein distance exactly 1, but OUTSIDE block
    b1 = (token1, first char of token2) by construction. Block
    b2 = (token1, length) catches every substitution (length is
    edit-invariant for substitutions), so the union of the two
    candidate sets recovers recall the way a second LSH table does; a
    planted pair is missed only if EVERY block misses it. Output: one
    row per planted original, ``found`` = did the OR'd blocks emit the
    (orig, typo) pair. The oracle replays typo planting, both block
    joins, the pair-level dedup, and the Levenshtein cut; the 1.0
    multi-block vs 0.0 single-block recall floor is asserted in
    tests/test_dedup.py."""
    from feat_spark.operators.dedup import fuzzy_pairs

    p = _t(spark, sf_dir, "part").select("p_partkey", "p_name")
    sp = F.instr(F.col("p_name"), " ")
    base = (
        p.filter(
            F.col("p_name").isNotNull()
            & (sp > 0)
            & (F.length("p_name") > sp)
        )
        .select("p_partkey", "p_name", sp.alias("__sp"))
    )
    typo_char = F.when(
        F.substr(F.col("p_name"), F.col("__sp") + F.lit(1), F.lit(1)) == "q",
        F.lit("z"),
    ).otherwise(F.lit("q"))
    typo = F.concat(
        F.substr(F.col("p_name"), F.lit(1), F.col("__sp")),
        typo_char,
        F.substr(F.col("p_name"), F.col("__sp") + F.lit(2), F.length("p_name")),
    )
    corpus = base.select(
        F.col("p_partkey").cast("long").alias("id"), F.col("p_name").alias("s")
    ).unionByName(
        base.select(
            (F.col("p_partkey") + F.lit(10000000)).cast("long").alias("id"),
            typo.alias("s"),
        )
    )
    toks = F.split(F.col("s"), " ")
    b1 = F.concat_ws(":", toks[0], F.substring(toks[1], 1, 1))
    b2 = F.concat_ws(":", toks[0], F.length("s").cast("string"))
    pairs = fuzzy_pairs(
        corpus, id_col="id", str_col="s", max_dist=2, blocks=[b1, b2],
        broadcast=True,  # same dimension-sized corpus as fuzzy_pairs
    )
    # planted pair = (orig, orig + 1e7): part keys are << 1e7, typo ids
    # all > 1e7, and within-side id gaps are < 1e7, so the delta test
    # identifies exactly the planted pairs
    hits = pairs.filter(F.col("id_b") - F.col("id_a") == 10000000).select(
        F.col("id_a").alias("p_partkey"), F.lit(True).alias("__hit")
    )
    return (
        base.select("p_partkey")
        .join(hits, "p_partkey", "left")
        .select("p_partkey", F.coalesce("__hit", F.lit(False)).alias("found"))
    )


def _q_vocab_coverage(spark, sf_dir):
    """OOV-rate audit (encoding.vocab_coverage): every document scored
    against the min_count=3 / cap-500 vocabulary that build_vocab
    gates — per-doc token count, OOV count, OOV share. The oracle
    rebuilds the vocab CTE and replays the join."""
    from feat_spark.operators.encoding import build_vocab, vocab_coverage

    d = _t(spark, sf_dir, "documents")
    v = build_vocab(d, text_col="text", min_count=3, max_size=500)
    return vocab_coverage(d, v, text_col="text", id_col="doc_id")


def _q_variant_summary(spark, sf_dir):
    """Per-variant experiment readout (experiment.variant_summary):
    n / mean / sd / se / normal CI from three exact decimal sums per
    variant, closed-form combine in double. Same per-user integer-cent
    metric and user_id%2 assignment as the CUPED gate; the oracle
    replays sums and arithmetic verbatim."""
    from feat_spark.operators.experiment import variant_summary

    e = _events(spark, sf_dir).filter(F.col("value").isNotNull())
    cut = 1705276800000000
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    per_user = e.groupBy("user_id").agg(
        F.sum(F.when(ts_us >= cut, cents)).alias("y")
    )
    units = per_user.withColumn("variant", F.col("user_id") % 2)
    return variant_summary(units, variant_col="variant", y_col="y")


def _q_srm_check(spark, sf_dir):
    """Sample-ratio-mismatch gate (experiment.srm_check): chi-square
    of the observed user_id%4 split vs a uniform allocation, computed
    without a totals cross-join via chi2 = (W/T)*sum(o^2/w) - T. Unit
    weights keep every term an exact integer-valued double, so the
    statistic is bit-stable under any partial-agg order."""
    from feat_spark.operators.experiment import srm_check

    e = _events(spark, sf_dir)
    users = e.select("user_id").distinct().withColumn(
        "variant", F.col("user_id") % 4
    )
    return srm_check(
        users, variant_col="variant",
        expected={0: 1, 1: 1, 2: 1, 3: 1}, critical=7.815,
    )


def _q_readability(spark, sf_dir):
    """Flesch reading-ease scoring (functions/text.readability_
    features): regex word/sentence/vowel-group counts + the textbook
    formula, NULL when unscorable. RE2-safe classes, so the oracle
    replays every count and the double arithmetic."""
    from feat_spark.functions.text import readability_features

    d = _t(spark, sf_dir, "documents")
    feats = readability_features("text")
    return d.select(
        "doc_id",
        feats["n_words"].alias("n_words"),
        feats["n_sentences"].alias("n_sentences"),
        feats["n_syllables"].alias("n_syllables"),
        feats["flesch"].alias("flesch"),
    )


def _q_histogram(spark, sf_dir):
    """Equal-width value histogram (profile.histogram_bins): 20 bins
    over exact integer cents, min/max folded in as driver-scalar
    literals (the quantile_bin device), pure integer bin assignment —
    engines cannot disagree on an edge. The oracle recomputes min/max
    and replays the floor arithmetic."""
    from feat_spark.operators.profile import histogram_bins

    e = _events(spark, sf_dir)
    return histogram_bins(e, value_col="value", n_bins=20)


def _q_km_curve(spark, sf_dir):
    """Kaplan-Meier survival curve (labels.km_curve) over the
    hour-bucketed time-to-purchase labels of the time_to_event gate:
    S(t) as exp of a decimal-summed, 12dp-rounded sum of log terms
    (the PageRank device) — running product with zero float-order
    hazard. The oracle unrolls the same spine arithmetic."""
    from feat_spark.operators.labels import km_curve, time_to_event

    e = _events(spark, sf_dir)
    tte = time_to_event(
        e,
        entity_col="user_id",
        ts_col="ts",
        id_col="event_id",
        target_filter=F.col("event_type") == "purchase",
        horizon_sec=259200,
    )
    hours = tte.select(
        (F.col("tte_sec") / 3600).cast("long").alias("t_hr"), "observed"
    )
    return km_curve(hours, duration_col="t_hr", observed_col="observed")


# ---------------------------------------------------------------- contract

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: point-in-time feature frame over sf0.001 — as-of join
    (latest order state per event) + leakage-safe windowed features."""
    sf_dir = "/root/testdata/sf0.001"
    ev = _events(spark, sf_dir)
    rhs = _orders_rhs(spark, sf_dir)
    feats = asof_join(
        ev, rhs, on="user_id", left_ts="ts", right_ts="ts",
        value_cols=["o_orderkey", "o_totalprice"],
    )
    feats = lag_lead_features(
        feats, cols=["value"], offsets=[1], partition="user_id",
        order=("ts",), tiebreak=("event_id",), leads=False,
    )
    feats = sessionize(feats, gap="30 minutes", partition="user_id",
                       ts="ts", tiebreak=("event_id",))
    feats = cumulative_features(
        feats, {"value": ["count"]}, partition="user_id", order=("ts",),
        tiebreak=("event_id",),
    )
    return feats.select(
        "event_id", "user_id", "ts", "o_orderkey", "o_totalprice",
        "value_lag1", F.col("session_id").cast("long").alias("session_id"),
        F.col("value_cum_count").cast("long").alias("turns_so_far"),
    )


_ROLLING_ZSCORE_SQL = """
          with base as (
            select event_id, value,
                   cast(sum(cast(value as decimal(18,2))) over w as double) as s,
                   cast(sum(cast(value as decimal(18,2))
                            * cast(value as decimal(18,2))) over w as double) as sq,
                   count(value) over w as n
            from events
            window w as (partition by user_id order by ts, event_id
                         rows between 20 preceding and 1 preceding)),
          stats as (
            select event_id, value, n, s / n as m,
                   sqrt(greatest((sq - s * s / n) / n, 0.0)) as sd
            from base),
          z as (
            select event_id, n, m, sd,
                   case when n >= 5 and sd > 0 then (value - m) / sd end as z
            from stats)
          select event_id,
                 case when n >= 5 then round(m, 6) end as roll_mean,
                 case when n >= 5 then round(sd, 6) end as roll_std,
                 round(z, 6) as zscore,
                 coalesce(abs(z) > 3.0, false) as is_anomaly
          from z"""


def _q_welch_ttest(spark, sf_dir):
    """Welch unequal-variance t-test between the user_id%2 arms
    (experiment.welch_ttest): per-arm (n, Σy, Σy²) in exact decimal,
    then the closed-form t and Welch–Satterthwaite dof in double. Same
    per-user integer-cent metric as the variant_summary gate; the
    oracle replays the sums and every double op in order."""
    from feat_spark.operators.experiment import welch_ttest

    e = _events(spark, sf_dir).filter(F.col("value").isNotNull())
    cut = 1705276800000000
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    per_user = e.groupBy("user_id").agg(
        F.sum(F.when(ts_us >= cut, cents)).alias("y")
    )
    units = per_user.withColumn("variant", F.col("user_id") % 2)
    return welch_ttest(
        units, variant_col="variant", y_col="y", control=0, treatment=1
    )


def _q_bm25_keywords(spark, sf_dir):
    """Okapi BM25 top-5 terms per document (keywords.bm25_topk):
    saturating tf + doc-length norm, corpus stats derived from the tf
    frame (no second input scan), N/avgdl as driver scalars. The
    oracle rebuilds tf/df/dl and replays the double expression tree
    verbatim (all float literals ::DOUBLE — DuckDB bare literals parse
    DECIMAL and would change the arithmetic)."""
    from feat_spark.operators.keywords import bm25_topk

    return bm25_topk(_t(spark, sf_dir, "documents"), k=5)


def _q_rolling_median(spark, sf_dir):
    """Exact rolling median of integer cents over a trailing 5-row
    frame per user (rolling.rolling_median): declarative
    percentile-over-window, no UDF; medians of ≤5 integers are
    integers or half-integers — exact in double — so DuckDB
    quantile_cont replays them bit-for-bit."""
    from feat_spark.operators.rolling import rolling_median

    e = _events(spark, sf_dir).filter(F.col("value").isNotNull()).select(
        "event_id", "user_id", "ts",
        (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("cents"),
    )
    return rolling_median(
        e, part_col="user_id", order_cols=["ts", "event_id"],
        value_col="cents", window_rows=5,
    ).select("event_id", "user_id", "cents", "rolling_median")


def _q_dedup_canonical(spark, sf_dir):
    """Survivor selection per dup cluster (dedup.canonical_docs):
    same simhash near-dup graph + components as the dedup_components
    gate, then canonical = longest doc (ties to smallest id) via a
    map-side-combinable max(struct(len, -id)) — no giant-cluster
    window sort. The oracle recomputes components with the recursive
    CTE and replays the selection with a per-component rank."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = d.unionByName(
        d.select((F.col("doc_id") + 200000).alias("doc_id"), "text")
    )
    sims = D.simhash32(corpus, id_col="doc_id", text_col="text")
    pairs = D.simhash_near_pairs(sims, id_col="doc_id", max_hamming=6)
    comps = D.connected_components(pairs)
    return D.canonical_docs(comps, corpus)


def _q_scd2_build(spark, sf_dir):
    """SCD-2 dimension builder (plans/snapshot.scd2_build): collapse
    the per-user event_type change log into validity intervals —
    gaps-and-islands running-sum run detector, ONE shuffle + three
    windows over one sort. Timestamps surface as epoch-us BIGINTs so
    both engines hash identical integers; the oracle replays the
    row_number/lag/lead pipeline verbatim."""
    from feat_spark.plans.snapshot import scd2_build

    e = _events(spark, sf_dir).select("user_id", "ts", "event_id", "event_type")
    out = scd2_build(
        e, key_col="user_id", ts_col="ts",
        attr_cols=["event_type"], tiebreak_col="event_id",
    )
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))
    return out.select(
        "user_id", "event_type",
        us("valid_from").alias("valid_from_us"),
        us("valid_to").alias("valid_to_us"),
        "version", "is_current",
    )


def _q_tree_ancestry(spark, sf_dir):
    """Forest flattening by pointer doubling (graph.tree_ancestry):
    root + depth for every node of a synthetic doc-id forest
    (parent = id div 4, ids < 4 are roots) in O(log depth) self-join
    rounds — the hierarchy primitive SQL needs a recursive CTE for,
    which is exactly what the oracle uses. All-integer outputs."""
    from feat_spark.operators.graph import tree_ancestry

    nodes = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("id"),
        F.when(F.col("doc_id") >= 4, F.expr("doc_id div 4")).alias("parent_id"),
    )
    return tree_ancestry(nodes, id_col="id", parent_col="parent_id")


def _q_containment_pairs(spark, sf_dir):
    """Asymmetric n-gram containment |A∩B|/|A| (dedup.containment_
    pairs) over the augmented corpus — the truncated copies are
    CONTAINED in their originals (C=1.0) while Jaccard alone would
    discount them; the sub-document / contamination detector. Integer
    counts, one division, 6dp round."""
    return D.containment_pairs(
        _augmented_docs(spark, sf_dir), id_col="doc_id", text_col="text",
        n=3, threshold=0.9,
    )


def _q_prefix_filter_pairs(spark, sf_dir):
    """EXACT Jaccard self-join via rarest-first positional prefix
    filtering (dedup.prefix_filter_pairs, Bayardo et al. WWW'07).
    The oracle is the NAIVE all-pairs join — equality of the two
    result sets IS the proof that the prefix pruning is lossless."""
    return D.prefix_filter_pairs(
        _augmented_docs(spark, sf_dir), id_col="doc_id", text_col="text",
        threshold=0.9,
    )


def _q_bpe_pairs(spark, sf_dir):
    """One BPE tokenizer-training merge step (keywords.bpe_pair_
    counts): corpus-wide adjacent character-pair counts, weighted by
    word frequency so the pair frame is vocabulary-sized, top-50 by
    (count desc, pair) — integer counts, fully deterministic ties."""
    from feat_spark.operators.keywords import bpe_pair_counts

    return bpe_pair_counts(_t(spark, sf_dir, "documents"), k=50)


def _q_source_kl(spark, sf_dir):
    """Per-source unigram KL(P_s || P_global) with add-one smoothing
    (mixture.source_kl): the absent-vocabulary mass folds to a closed
    form, so cost is linear in (source, word) pairs; the three
    per-source folds and the one global fold all run in lexicographic
    word order (sorted-fold device) and the oracle replays every
    double op in sequence."""
    from feat_spark.operators.mixture import source_kl

    return source_kl(
        _t(spark, sf_dir, "documents"), stratum_col="source", text_col="text"
    )


def _q_weighted_median(spark, sf_dir):
    """Exact lower weighted median per (returnflag, linestatus)
    (encoding.weighted_median): quantity-weighted price cents; ties
    collapse in a pre-agg so the window spine is distinct-values-
    sized; the 2*cum >= W gate is all-integer — bit-stable anywhere."""
    from feat_spark.operators.encoding import weighted_median

    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus",
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long").alias("cents"),
        F.col("l_quantity").cast("long").alias("qty"),
    )
    return weighted_median(
        li, key_cols=["l_returnflag", "l_linestatus"],
        value_col="cents", weight_col="qty",
    )


def _q_ks_test(spark, sf_dir):
    """Two-sample KS between the user_id%2 arms' value distributions
    (experiment.ks_test): D's numerator |cumA*nB - cumB*nA| is an
    INTEGER at every distinct cent, one division at the end; the
    oracle replays the same cumulative spine and double ops."""
    from feat_spark.operators.experiment import ks_test

    e = _events(spark, sf_dir).filter(F.col("value").isNotNull()).select(
        (F.col("user_id") % 2).alias("grp"),
        (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("cents"),
    )
    return ks_test(e, group_col="grp", value_col="cents", group_a=0, group_b=1)


def _q_mutual_information(spark, sf_dir):
    """MI feature ranking (profile.mutual_information): event_type and
    day-of-week vs a user_id%3 label — one melt scan, integer cell
    counts, lexicographic sorted fold; the oracle unions the melt and
    replays every double op in (value,label) order."""
    from feat_spark.operators.profile import mutual_information

    e = _events(spark, sf_dir)
    df = e.select(
        "event_type",
        F.expr(
            "cast(((unix_micros(cast(ts as timestamp)) div 86400000000)"
            " + 3) % 7 as string)"
        ).alias("dow"),
        (F.col("user_id") % 3).cast("string").alias("label"),
    )
    return mutual_information(df, ["event_type", "dow"], "label")


def _q_semantic_decontam(spark, sf_dir):
    """Embedding-space decontamination (similarity.semantic_
    decontaminate): vec_id<25 is the broadcast "benchmark", the rest
    the corpus; exact per-row argmax over the broadcast side (the kNN
    exemption class), deterministic ties to the smallest bench id."""
    from feat_spark.operators.similarity import semantic_decontaminate

    v = _t(spark, sf_dir, "embeddings")
    bench = v.filter(F.col("vec_id") < 25).select(
        F.col("vec_id").alias("bench_id"), "embedding"
    )
    # plant contamination: re-id'd copies of the benchmark vectors ride
    # in the corpus (cos=1.0 with their source), alongside the natural
    # corpus whose top cross-cosines sit just under 0.5 — the 0.45
    # threshold exercises both the planted and the borderline band
    corpus = v.filter(F.col("vec_id") >= 25).select(
        F.col("vec_id").alias("corpus_id"), "embedding"
    ).unionByName(
        bench.select((F.col("bench_id") + 10000).alias("corpus_id"), "embedding")
    )
    return semantic_decontaminate(
        corpus, bench, corpus_id="corpus_id", bench_id="bench_id",
        vec_col="embedding", threshold=0.45,
    )


def _q_rare_collapse(spark, sf_dir):
    """Long-tail category guard (encoding.rare_category_collapse):
    sources under 20 docs collapse to __other__ via a broadcast
    keep-list — the corpus never shuffles; NULL stays NULL."""
    from feat_spark.operators.encoding import rare_category_collapse

    d = _t(spark, sf_dir, "documents").select("doc_id", "source")
    return rare_category_collapse(d, cat_col="source", min_count=20)


def _q_woe_encode(spark, sf_dir):
    """Weight-of-evidence + information-value table per event_type
    against a user_id%2 label (encoding.woe_encode): integer counts,
    driver-scalar smoothed totals (tfidf-N device, no 1-row cross
    join), fixed double chain replayed by the oracle."""
    from feat_spark.operators.encoding import woe_encode

    e = _events(spark, sf_dir).withColumn("lbl", F.col("user_id") % 2)
    return woe_encode(e, cat_col="event_type", label_col="lbl", smoothing=0.5)


def _q_session_ngrams(spark, sf_dir):
    """Top-50 3-step event paths per user stream (funnel.
    session_ngrams): ordered sequences via array_sort(collect_list),
    n-grams via transform+slice (no UDF), weighted partial-agg count,
    TakeOrdered top-k with text tiebreak. The oracle replays with
    list(... order by) + list_transform over range."""
    from feat_spark.operators.funnel import session_ngrams

    return session_ngrams(
        _events(spark, sf_dir), key_cols=["user_id"],
        event_col="event_type", order_cols=["ts", "event_id"], n=3, k=50,
    )


def _q_inverted_index(spark, sf_dir):
    """Positional inverted index over documents (keywords.
    build_inverted_index) with min_df=2 and a 0.5 max-df stopword
    gate; the driver row flattens the posting structs to
    (word, df, n_postings, doc_id, positions-csv) so both engines
    hash identical scalars."""
    from feat_spark.operators.keywords import build_inverted_index

    idx = build_inverted_index(
        _t(spark, sf_dir, "documents"), min_df=2, max_df_ratio=0.5
    )
    return idx.select(
        "word", "df", "n_postings", F.explode("postings").alias("p")
    ).select(
        "word", "df", "n_postings",
        F.col("p.doc_id").alias("doc_id"),
        F.array_join(F.col("p.positions"), ",").alias("positions"),
    )


def _q_autocorr(spark, sf_dir):
    """Per-user lag-1 and lag-2 autocorrelation of integer-cent event
    values (encoding.autocorrelation): one lag window + six exact
    decimal sums per (user, lag), closed-form Pearson combine in
    double — the group_linear_fit device. The oracle replays the lag
    window, the decimal(28,6) sums, and every double op in order."""
    from feat_spark.operators.encoding import autocorrelation

    e = _events(spark, sf_dir).filter(F.col("value").isNotNull()).select(
        "user_id", "ts", "event_id",
        (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("cents"),
    )
    a1 = autocorrelation(e, "user_id", ["ts", "event_id"], "cents", lag=1)
    a2 = autocorrelation(e, "user_id", ["ts", "event_id"], "cents", lag=2)
    return a1.unionByName(a2)


def _q_triangle_count(spark, sf_dir):
    """Per-node triangle counts over the part co-purchase graph
    (graph.triangle_count): edges = distinct pairs of parts sharing a
    lineitem order (restricted to partkey%4==0 to keep the projection
    sparse), counted via degree-ordered orientation — each triangle
    generated once at its (deg,id)-smallest vertex, wedge fan-out
    bounded O(E^1.5) (Suri & Vassilvitskii). All-integer output; the
    oracle replays the orientation and both equi-joins verbatim."""
    from feat_spark.operators.graph import triangle_count

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").filter(
        F.col("l_partkey") % 4 == 0
    )
    x = li.alias("x")
    y = li.alias("y")
    pairs = x.join(y, "l_orderkey").filter(
        F.col("x.l_partkey") < F.col("y.l_partkey")
    ).select(
        F.col("x.l_partkey").alias("src"), F.col("y.l_partkey").alias("dst")
    )
    return triangle_count(pairs)


def _q_quantize_embeddings(spark, sf_dir):
    """Int8 embedding quantization (vectors.quantize_embeddings):
    per-dim min/max params via one posexplode partial agg (driver-safe
    64-row read), codes via a whole-stage-codegen transform — no UDF,
    no shuffle on the data pass. The driver row is the (dim, code)
    histogram: float->double widening and the fixed-order affine make
    every code bit-replayable in DuckDB."""
    from feat_spark.operators.vectors import quantize_embeddings

    q = quantize_embeddings(
        _t(spark, sf_dir, "embeddings"), vec_col="embedding", id_col="vec_id"
    )
    return (
        q.select(F.posexplode("codes").alias("dim", "code"))
        .groupBy("dim", "code")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _q_calibration_curve(spark, sf_dir):
    """Reliability diagram (experiment.calibration_curve): a clamped
    affine score from the first embedding dim vs the label's parity,
    10 equal-width bins, mean score from exact integer micro-unit
    sums. Every expression is fixed-order double/integer arithmetic —
    no transcendentals — so the oracle replays it bit-for-bit."""
    from feat_spark.operators.experiment import calibration_curve

    e = _t(spark, sf_dir, "embeddings").select(
        F.least(
            F.greatest(
                (F.element_at("embedding", 1).cast("double") + F.lit(0.4))
                / F.lit(0.8),
                F.lit(0.0),
            ),
            F.lit(1.0),
        ).alias("score"),
        (F.col("label") % 2).alias("y"),
    )
    return calibration_curve(e, "score", "y", n_bins=10)


def _q_chi2_assoc(spark, sf_dir):
    """Chi-square association ranking (profile.chi2_assoc) of two
    categorical features (event_type; floor(value/10) bucket with the
    NULL sentinel path exercised) against user_id%3: one melt scan,
    integer contingency counts, zero-cell correction in closed form
    (chi2 = fold(c^2/e) - n), sorted fold over observed cells. The
    oracle replays the melt, the marginals, and the fold order."""
    from feat_spark.operators.profile import chi2_assoc

    e = _events(spark, sf_dir).select(
        "event_type",
        F.floor(F.col("value") / 10).cast("long").cast("string").alias(
            "value_bucket"
        ),
        (F.col("user_id") % 3).alias("label"),
    )
    return chi2_assoc(e, ["event_type", "value_bucket"], "label")


def _q_rrf_fusion(spark, sf_dir):
    """Reciprocal-rank fusion (keywords.rrf_fuse) of two per-language
    top-20 document rankings (by n_chars, and by a multiplicative-hash
    order standing in for a second retriever): rrf = sorted fold of
    1/(60+rank), fused_rank a per-query row_number on the UNROUNDED
    score with doc-id ties. The oracle rebuilds both lists with the
    same windows and replays the fold."""
    from feat_spark.operators.keywords import rrf_fuse

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    wa = Window.partitionBy("lang").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    la = d.select(
        "lang", "doc_id", F.row_number().over(wa).cast("long").alias("rank")
    ).filter(F.col("rank") <= 20)
    dh = d.withColumn(
        "__h", (F.col("doc_id") * F.lit(2654435761).cast("long")) % F.lit(1000003)
    )
    wb = Window.partitionBy("lang").orderBy(F.asc("__h"), F.asc("doc_id"))
    lb = dh.select(
        "lang", "doc_id", F.row_number().over(wb).cast("long").alias("rank")
    ).filter(F.col("rank") <= 20)
    return rrf_fuse(
        [la, lb], query_col="lang", id_col="doc_id", rank_col="rank", k=60
    )


def _q_upsert_latest(spark, sf_dir):
    """Type-1 CDC compaction (snapshot.upsert_latest): base = orders
    with o_orderkey%3 != 0; the change feed doubles the cents of every
    even orderkey and deletes multiples of 7. Latest-wins with changes
    ranking above base at equal ts; union + one row_number window, no
    join. All pass-through longs/dates — the oracle replays the
    layered window verbatim."""
    from feat_spark.plans.snapshot import upsert_latest

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.col("o_orderdate").cast("date").alias("o_orderdate"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    base = o.filter(F.col("o_orderkey") % 3 != 0)
    changes = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        (F.col("cents") * 2).alias("cents"),
        F.when(F.col("o_orderkey") % 7 == 0, F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
    )
    return upsert_latest(
        base, changes, key_col="o_orderkey", ts_col="o_orderdate",
        op_col="op",
    )


def _q_context_window(spark, sf_dir):
    """Token-budget context assembly (packing.assemble_context): for
    every event-turn, how many trailing turns / tokens fit in a
    512-token window — the earliest in-window turn found by a FORWARD
    self as-of join on the strictly-increasing cumulative-token axis
    (value lookup, not a scan; the virtual cum_0 = 0 row resolves
    early turns). Deterministic token counts derived from cents; all
    integers. The oracle replays the quadratic j<=i pair-join form —
    equality proves the as-of shortcut exact."""
    from feat_spark.operators.packing import assemble_context

    e = _events(spark, sf_dir).select(
        "user_id", "ts", "event_id",
        (
            F.lit(1).cast("long")
            + F.coalesce(
                (F.col("value").cast("decimal(18,2)") * 100).cast("long"),
                F.lit(0).cast("long"),
            )
            % 199
        ).alias("tok"),
    )
    return assemble_context(
        e, key_cols="user_id", order_cols=["ts", "event_id"],
        token_col="tok", budget=512, id_cols=["event_id"],
    )


def _q_cross_correlation(spark, sf_dir):
    """Lead-lag cross-correlation (encoding.cross_correlation) between
    per-day click counts and purchase counts per user, shifts -2..2,
    on a zero-filled day spine (sequence-explode per user — the
    active_days grain-reduction device, so shifts mean calendar days,
    not event gaps). Integer counts -> exact decimal sums -> fixed
    double combine; the oracle rebuilds the spine with
    generate_series and replays every op."""
    from feat_spark.operators.encoding import cross_correlation

    e = _events(spark, sf_dir)
    day = F.expr("unix_micros(cast(ts as timestamp)) div 86400000000")
    d = e.select("user_id", day.alias("day"), "event_type")
    counts = d.groupBy("user_id", "day").agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("long")
        .alias("clicks"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("buys"),
    )
    spine = (
        d.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "user_id", F.explode(F.sequence("d0", "d1")).alias("day")
        )
    )
    full = spine.join(counts, ["user_id", "day"], "left").select(
        "user_id",
        "day",
        F.coalesce("clicks", F.lit(0).cast("long")).alias("clicks"),
        F.coalesce("buys", F.lit(0).cast("long")).alias("buys"),
    )
    return cross_correlation(
        full, group_col="user_id", order_col="day",
        x_col="clicks", y_col="buys", shifts=(-2, -1, 0, 1, 2),
    )


def _q_phrase_search(spark, sf_dir):
    """Positional phrase query (keywords.phrase_search) for
    "table hash" over documents: explode filtered to the phrase's own
    words, then the anchor trick (term i at pos p -> anchor p-i) and
    one equi-join per extra term — cost bounded by the rarest term's
    df. The oracle replays the anchor join with the inverted_index
    word/position device."""
    from feat_spark.operators.keywords import phrase_search

    return phrase_search(
        _t(spark, sf_dir, "documents"), "table hash"
    )


def _q_seasonal_anomaly(spark, sf_dir):
    """Day-of-week seasonal volume anomalies (profile.
    seasonal_anomaly): per-user daily counts vs that user's own
    per-dow median/MAD baseline, robust_outliers' half-unit integer
    device at (user, dow) grain. The oracle replays the grain
    reduction, both quantile_cont medians, and the 3.5*MAD gate."""
    from feat_spark.operators.profile import seasonal_anomaly

    return seasonal_anomaly(
        _events(spark, sf_dir), key_cols="user_id", ts_col="ts", k=3.5
    )


def _q_skipgram_pairs(spark, sf_dir):
    """Directed skip-gram event pairs (cooccur.skipgram_pairs) within
    3 steps over each user's (ts, event_id)-ordered stream — the
    cross_correlation lead-family device (one shared window sort, 3
    lead projections, one pair-keyed count). The oracle replays it as
    the row_number band self-join the leads are equivalent to."""
    from feat_spark.operators.cooccur import skipgram_pairs

    return skipgram_pairs(
        _events(spark, sf_dir), "user_id", ["ts", "event_id"],
        "event_type", window=3,
    )


def _q_attribution(spark, sf_dir):
    """Multi-touch attribution (attribution.attribute_conversions):
    purchases credited to click/view touches within a 7-day lookback —
    last-touch exact cents, linear credit in floor-divided integer
    micro-cents so every sum replays in any order. The oracle replays
    the per-user band join, the per-conversion count/last window, and
    the same integer floor division."""
    from feat_spark.operators.attribution import attribute_conversions

    return attribute_conversions(_events(spark, sf_dir), lookback_s=7 * 86400)


def _q_changepoint_scan(spark, sf_dir):
    """Level-shift change-point scan (profile.changepoint_scan): per
    user, next-7-observed-days mean vs previous-7 over the daily-count
    series; integer numerator sum_r*n_l - sum_l*n_r so shift and flag
    are exact. The oracle replays both ROWS frames verbatim."""
    from feat_spark.operators.profile import changepoint_scan

    return changepoint_scan(
        _events(spark, sf_dir), "user_id", w=7, threshold=2.0, min_side=3
    )


def _q_rfm_segments(spark, sf_dir):
    """RFM segmentation (encoding.rfm_segments) over orders: entity
    grain agg, exact integer metrics, dyadic-prob quartile boundaries
    as driver scalars (NO global ntile sort), shuffle-free scoring
    pass. The oracle recomputes the same quantile_cont cuts inline."""
    from feat_spark.operators.encoding import rfm_segments

    return rfm_segments(_t(spark, sf_dir, "orders"))


def _q_group_auc(spark, sf_dir):
    """Per-segment ROC AUC (experiment.group_auc): does event value
    rank purchases within user_id%10 segments — tie-aware Mann-Whitney
    with HALF-UNIT integer average ranks (h = 2*rank + ties - 1), so
    the numerator is an exact integer and one division closes it. The
    oracle replays rank(), the tie count, and the same closed form."""
    from feat_spark.operators.experiment import group_auc

    e = _events(spark, sf_dir).select(
        (F.col("user_id") % 10).alias("segment"),
        F.col("value").alias("score"),
        (F.col("event_type") == "purchase").alias("y"),
    )
    return group_auc(e, "segment", "score", "y")


def _q_label_churn(spark, sf_dir):
    """Churn-by-inactivity labels (labels.label_churn): per (user,
    active day), the gap to the NEXT active day and gap > 2d as the
    churn target; the final observed day stays NULL (censored) — the
    leakage-honest boundary. Oracle: distinct day grain + lead."""
    from feat_spark.operators.labels import label_churn

    return label_churn(_events(spark, sf_dir), "user_id", horizon_days=2)


def _q_compaction_plan(spark, sf_dir):
    """Small-file compaction planning (layout.compaction_plan) over a
    documents-derived manifest (source = partition, doc_id = file,
    n_chars = bytes): bytes-desc first-fit by prefix sum,
    bin = (cum - bytes) div target — all integer, one window sort per
    partition over MANIFEST rows only. Oracle replays the running sum
    and floor division verbatim."""
    from feat_spark.sources.layout import compaction_plan

    m = _t(spark, sf_dir, "documents").select("source", "doc_id", "n_chars")
    return compaction_plan(
        m, "source", file_col="doc_id", bytes_col="n_chars",
        target_bytes=20_000,
    )


def _q_basket_rules(spark, sf_dir):
    """Market-basket association rules (cooccur.basket_rules) over
    lineitem (order = basket, part = item): capped per-basket items,
    basket-keyed pair self-join, support floor, then conf/lift with
    one integer-operand division each. The oracle replays cap, pair
    join, and ratios."""
    from feat_spark.operators.cooccur import basket_rules

    return basket_rules(
        _t(spark, sf_dir, "lineitem"), min_support=2, per_basket=32
    )


def _q_expectations(spark, sf_dir):
    """Declarative data-contract report (audit.expectation_report)
    over events: unique event_id, non-null ts, event_type in the
    4-value accepted set ('error' excluded on purpose so the check
    fires), value in [0,10]. Row-level checks fold into ONE scan
    aggregate; uniqueness rides the same agg as exact count_distinct.
    The oracle computes every violation count in one scalar CTE."""
    from feat_spark.plans.audit import expectation_report

    return expectation_report(
        _events(spark, sf_dir),
        unique=[["event_id"]],
        not_null=["ts"],
        in_set={"event_type": ["click", "view", "purchase", "signup"]},
        between={"value": (0.0, 10.0)},
    )


def _q_split_balance(spark, sf_dir):
    """Covariate balance (experiment.split_balance) of an 80/20
    user-hash split over events: SMD of value and hour-of-day between
    train and test via the one-melt-scan + exact decimal sums. The
    oracle replays the melt, the decimal sums, and the closed form
    division-for-division."""
    from feat_spark.operators.experiment import split_balance

    e = _events(spark, sf_dir).select(
        F.when(F.col("user_id") % 10 < 8, "train")
        .otherwise("test")
        .alias("split"),
        F.col("value"),
        F.hour(F.col("ts").cast("timestamp")).alias("hour"),
    )
    return split_balance(e, "split", ["value", "hour"])


def _q_assortativity(spark, sf_dir):
    """Degree assortativity (graph.degree_assortativity) of the
    order-part incidence graph (node ids disambiguated even/odd so
    the two key spaces cannot collide): integer Pearson sums over
    symmetrized edge stubs, one sqrt + one division on the 1-row
    readout. Oracle replays canonicalization, degrees, and the
    closed form."""
    from feat_spark.operators.graph import degree_assortativity

    e = _t(spark, sf_dir, "lineitem").select(
        (F.col("l_orderkey") * 2).alias("src"),
        (F.col("l_partkey") * 2 + 1).alias("dst"),
    )
    return degree_assortativity(e)


def _q_ndcg(spark, sf_dir):
    """NDCG@3 (keywords.ndcg_at_k) of each user's frequency-ranked
    event types against capped-count relevance — ln-parity log2 and
    sorted-fold per-query sums (<= k terms), bit-replayable. The
    oracle rebuilds ranked/truth and both folds with list_reduce."""
    from feat_spark.operators.keywords import ndcg_at_k

    cnt = (
        _events(spark, sf_dir)
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("c").desc(), F.col("event_type").asc()
    )
    ranked = cnt.withColumn("rank", F.row_number().over(w)).select(
        F.col("user_id").alias("query_id"),
        F.col("event_type").alias("item"),
        "rank",
    )
    truth = cnt.select(
        F.col("user_id").alias("query_id"),
        F.col("event_type").alias("item"),
        F.least(F.col("c"), F.lit(5)).alias("rel"),
    )
    return ndcg_at_k(ranked, truth, k=3)


def _q_json_extract(spark, sf_dir):
    """Typed JSON extraction (semistructured.parse_json_column) from the
    events props column: JVM-side from_json with the corrupt-record
    channel (missing key = legit NULL, unparseable text = flagged).
    Oracle: DuckDB json_extract + json_valid."""
    from feat_spark.operators.semistructured import parse_json_column

    out = parse_json_column(_events(spark, sf_dir), "props", "k long")
    return out.select("event_id", "k", "is_corrupt")


def _q_split_leakage(spark, sf_dir):
    """Cross-split contamination audit (audit.split_leakage): corpus +
    planted upper-cased copies at doc_id+200001 (the +1 shifts the
    id-mod-10 split digit, so copies of docs ending in 7 or 9 land in
    the OTHER split — real leaks; the rest dup within one split and
    must NOT report). Canonical-text md5 fingerprints; only
    fingerprints spanning >1 split survive. Oracle replays plant,
    canonicalization, and the distinct-split filter."""
    from feat_spark.plans.audit import split_leakage

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = d.unionByName(
        d.select(
            (F.col("doc_id") + 200001).alias("doc_id"),
            F.upper("text").alias("text"),
        )
    ).withColumn(
        "split",
        F.when(F.col("doc_id") % 10 < 8, "train").otherwise("test"),
    )
    return split_leakage(corpus, "split")


def _q_business_days(spark, sf_dir):
    """Weekday interval counts (encoding.business_days_between) over
    each user's [first, last) active epoch-day span — the branch-free
    closed form W(m)=5*(m div 7)+least(m mod 7,5) at m=day+3, all
    integer. Oracle replays the formula."""
    from feat_spark.operators.encoding import business_days_between

    day = F.expr("unix_micros(cast(ts as timestamp)) div 86400000000")
    span = (
        _events(spark, sf_dir)
        .select("user_id", day.alias("day"))
        .groupBy("user_id")
        .agg(F.min("day").alias("s"), F.max("day").alias("e"))
    )
    return business_days_between(span, "s", "e")


def _q_rank_normalize(spark, sf_dir):
    """Empirical-CDF feature scaling (encoding.rank_normalize): value
    -> cume_dist within event_type — a ratio of counts, one division
    per row, tie-stable by definition. Oracle: cume_dist() verbatim."""
    from feat_spark.operators.encoding import rank_normalize

    out = rank_normalize(_events(spark, sf_dir), "event_type", "value")
    return out.select("event_id", "event_type", "value", "pct")


def _q_stream_novelty(spark, sf_dir):
    """Streaming gate #7: stream-static novelty join
    (pipeline.stream_novelty_filter). Documents arrive as a 2-micro-
    batch file stream carrying canonical-text md5 fingerprints; the
    static index holds the fingerprints of doc_id < 250. STATELESS
    left-outer + null-marker filter (the stream-static form of
    anti-join); the batch oracle is the plain NOT IN. Intra-stream
    dups both pass by contract — novelty is vs the INDEX."""
    import uuid

    from feat_spark.functions.text import canonical_text
    from feat_spark.streaming.pipeline import (
        run_to_memory,
        stream_novelty_filter,
    )

    d0 = _t(spark, sf_dir, "documents").select("doc_id", "text")
    index = d0.filter(F.col("doc_id") < 250).select(
        F.md5(canonical_text("text")).alias("content_hash")
    )
    pdf = d0.toPandas().sort_values("doc_id").reset_index(drop=True)
    cut = len(pdf) // 2
    d = _stream_scratch("novstream")
    pdf.iloc[:cut].to_parquet(os.path.join(d, "part1.parquet"), index=False)
    pdf.iloc[cut:].to_parquet(os.path.join(d, "part2.parquet"), index=False)
    _space_mtimes(d, ["part1.parquet", "part2.parquet"])
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
        .select("doc_id", F.md5(canonical_text("text")).alias("content_hash"))
    )
    out = stream_novelty_filter(stream, index, ["content_hash"])
    name = "stream_nov_" + uuid.uuid4().hex[:8]
    run_to_memory(out, name)
    return spark.table(name).select("doc_id", "content_hash")


def _q_cohort_ltv(spark, sf_dir):
    """Cohort LTV curves (funnel.cohort_ltv): users grouped by first
    epoch-week, purchase revenue in exact integer cents, integer
    cumulative window, ONE division per output row. Oracle replays
    grain reduction, cohort sizing, and the running sum."""
    from feat_spark.operators.funnel import cohort_ltv

    return cohort_ltv(_events(spark, sf_dir))


def _q_wow_change(spark, sf_dir):
    """Week-over-week change (profile.period_over_period): per-user
    daily counts vs the SAME WEEKDAY 7 days earlier via a (key, day-7)
    equi-join — a lag over observed days would silently compare
    against whatever day came before. Oracle replays the self-join."""
    from feat_spark.operators.profile import period_over_period

    return period_over_period(_events(spark, sf_dir), "user_id", period_days=7)


def _q_cluster_medoids(spark, sf_dir):
    """Per-label medoids (similarity.cluster_medoids): the real member
    closest to its group_centroids mean — (grp,pos) equi-join, pos-
    ordered sorted-fold squared distance, argmin by (d2, id). Oracle
    replays the exact mean, the fold, and the argmin window."""
    from feat_spark.operators.similarity import cluster_medoids

    return cluster_medoids(_t(spark, sf_dir, "embeddings"))


def _q_zorder(spark, sf_dir):
    """Morton/Z-order layout keys (layout.zorder_key) over 8-bit
    (user, value-cents) rank coordinates: closed-form bit interleave,
    one codegen projection, zero shuffle. Oracle replays the identical
    shift/mask/or fold."""
    from feat_spark.sources.layout import zorder_key

    e = _events(spark, sf_dir).select(
        "event_id",
        (F.col("user_id") % 256).alias("x"),
        (
            (F.col("value").cast("decimal(18,2)") * 100).cast("long") % 256
        ).alias("y"),
    )
    return zorder_key(e, "x", "y", bits=8)


def _q_prune_files(spark, sf_dir):
    """Min/max file skipping (layout.prune_files) over a synthetic
    manifest (documents grouped 50-per-file with n_chars min/max
    stats), predicate n_chars in [300, 600]: pure interval-overlap
    projection, NULL stats conservatively kept, data never read.
    Oracle replays manifest build + verdicts."""
    from feat_spark.sources.layout import prune_files

    m = (
        _t(spark, sf_dir, "documents")
        .groupBy(
            "source", (F.col("doc_id") - F.col("doc_id") % 50).alias("file_id")
        )
        .agg(
            F.min("n_chars").alias("lo"),
            F.max("n_chars").alias("hi"),
            F.sum("n_chars").alias("bytes"),
        )
    )
    return prune_files(m, "lo", "hi", 300, 600)


def _q_seq_pattern(spark, sf_dir):
    """Regex sequence matching (funnel.sequence_pattern_count):
    per-user event streams as symbol strings (view/click/purchase ->
    v/c/p, everything else '.'), pattern 'vc*p' counted
    non-overlapping — MATCH_RECOGNIZE-lite. Oracle: ordered
    string_agg + len(regexp_extract_all)."""
    from feat_spark.operators.funnel import sequence_pattern_count

    return sequence_pattern_count(
        _events(spark, sf_dir),
        "user_id",
        "vc*p",
        {"view": "v", "click": "c", "purchase": "p"},
    )


def _q_hourly_profile(spark, sf_dir):
    """Hour-of-day activity profiles (profile.hourly_profile): grain
    reduction to (user, hour) counts, deterministic (n DESC, hour ASC)
    argmax, integer-division share. Oracle replays the argmax
    window."""
    from feat_spark.operators.profile import hourly_profile

    return hourly_profile(_events(spark, sf_dir), "user_id")


def _q_gini(spark, sf_dir):
    """Value-concentration Gini per event type
    (profile.gini_concentration): integer-cent rank sums, exact
    integer numerator/denominator, ONE division. Oracle replays the
    rank window and closed form."""
    from feat_spark.operators.profile import gini_concentration

    return gini_concentration(_events(spark, sf_dir), "event_type", "value")


def _q_centroid_distances(spark, sf_dir):
    """Inter-centroid squared-L2 matrix (similarity.
    centroid_distances): exact per-label means (group_centroids), pos-
    keyed self-join of centroid CELLS, pos-ordered sorted-fold, upper
    triangle. Oracle replays mean, join, fold."""
    from feat_spark.operators.similarity import centroid_distances

    return centroid_distances(_t(spark, sf_dir, "embeddings"))


def _q_funnel_latency(spark, sf_dir):
    """Stage-transition latency (funnel.funnel_latency) over the same
    sessionized view->click->purchase funnel as the session_funnel
    gate: exact integer-us medians (dyadic percentile) and exact-sum
    means per transition. Oracle replays funnel + both aggregates."""
    from feat_spark.operators.funnel import funnel_latency, session_funnel
    from feat_spark.operators.sessionize import sessionize

    e = _events(spark, sf_dir)
    s = sessionize(
        e, gap="30 minutes", partition="user_id", ts="ts",
        tiebreak=("event_id",),
    )
    f = session_funnel(
        s, stages=("view", "click", "purchase"),
        keys=("user_id", "session_id"), type_col="event_type", ts_col="ts",
    )
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))
    f = f.select(
        us("t_0").alias("t_0"), us("t_1").alias("t_1"), us("t_2").alias("t_2")
    )
    return funnel_latency(f, ("view", "click", "purchase"))


def _q_zipf_fit(spark, sf_dir):
    """Corpus Zipf fit (keywords.zipf_fit): OLS of ln(freq) on
    ln(rank) over the top-1000 vocabulary — TakeOrdered determinism,
    four sorted folds (ln-parity), closed-form slope/intercept. Oracle
    replays rank, folds, and formula."""
    from feat_spark.operators.keywords import zipf_fit

    return zipf_fit(_t(spark, sf_dir, "documents"), top_n=1000)


def _q_standardized_rates(spark, sf_dir):
    """Directly-standardized purchase rates (experiment.
    standardized_rates): variant = user_id%2, strata = day-of-week —
    composition-adjusted comparison, strata-ordered sorted folds,
    integer-operand divisions, w_covered honesty column. Oracle
    replays pooled weights and both folds."""
    from feat_spark.operators.experiment import standardized_rates

    e = _events(spark, sf_dir).select(
        (F.col("user_id") % 2).alias("variant"),
        (
            (F.expr("unix_micros(cast(ts as timestamp)) div 86400000000") + 3)
            % 7
        ).alias("dow"),
        "event_type",
    )
    return standardized_rates(e, "variant", "dow", "event_type = 'purchase'")


def _q_confusion_stats(spark, sf_dir):
    """Multi-class confusion margins (experiment.confusion_stats):
    label = event_type, pred = a frozen value-threshold rule — so some
    classes are never predicted (NULL precision) and margins exercise
    the full-outer merge. Oracle replays matrix + margins."""
    from feat_spark.operators.experiment import confusion_stats

    e = _events(spark, sf_dir).select(
        F.col("event_type").alias("y"),
        F.when(F.col("value") > 7, "purchase")
        .when(F.col("value") > 3, "click")
        .otherwise("view")
        .alias("p"),
    )
    return confusion_stats(e, "y", "p")


def _q_time_weighted_avg(spark, sf_dir):
    """Step-function time-weighted value average (encoding.
    time_weighted_avg) per user: integer-us spans from one lead,
    integer cents*span sums, one closing division. Oracle replays the
    lead and the sums."""
    from feat_spark.operators.encoding import time_weighted_avg

    return time_weighted_avg(_events(spark, sf_dir), "user_id")


def _q_two_hop(spark, sf_dir):
    """1/2-hop distinct reach (graph.two_hop_reach) on the order-part
    incidence graph (even/odd namespacing): middle-capped wedge join,
    exact distance-2 via anti-join on direct edges, per-node
    pivots_capped honesty column. Oracle replays wedges, anti, and
    margins."""
    from feat_spark.operators.graph import two_hop_reach

    e = _t(spark, sf_dir, "lineitem").select(
        (F.col("l_orderkey") * 2).alias("src"),
        (F.col("l_partkey") * 2 + 1).alias("dst"),
    )
    return two_hop_reach(e, max_degree=1000)


def _q_burstiness(spark, sf_dir):
    """Inter-event burstiness (profile.burstiness): Goh-Barabási
    B = (sd-mean)/(sd+mean) over per-user integer-us gaps; decimal
    square-sums, fixed double op order, fp-dust clamp. Oracle replays
    lead, sums, and the closed form."""
    from feat_spark.operators.profile import burstiness

    return burstiness(_events(spark, sf_dir), "user_id")


def _q_weighted_topk_sample(spark, sf_dir):
    """A-ES weighted without-replacement sampling (sampling.
    weighted_topk_sample): 20 docs per source proportional to n_chars
    via frozen md5 uniforms and exponential keys -ln(u)/w — size-exact
    where Bernoulli can't be. Oracle replays hash, key, and the
    per-group top-k."""
    from feat_spark.operators.sampling import weighted_topk_sample

    d = _t(spark, sf_dir, "documents").select("source", "doc_id", "n_chars")
    return weighted_topk_sample(d, "source", "n_chars", 20, "doc_id")


def _q_fd_check(spark, sf_dir):
    """Functional-dependency audit (audit.fd_check) on orders:
    o_orderkey->o_custkey must hold (PK determines everything);
    o_custkey->o_orderpriority must break (customers order at many
    priorities) — both margins exact count_distinct. Oracle replays
    per-pair aggregation."""
    from feat_spark.plans.audit import fd_check

    return fd_check(
        _t(spark, sf_dir, "orders"),
        [("o_orderkey", "o_custkey"), ("o_custkey", "o_orderpriority")],
    )


def _q_lorenz(spark, sf_dir):
    """Lorenz curve points (profile.lorenz_curve) of event value per
    event type: integer-cent rank + reused-sort cumulative, integer
    ceiling decile assignment, one division per output row. Oracle
    replays rank, cum, and decile arithmetic."""
    from feat_spark.operators.profile import lorenz_curve

    return lorenz_curve(_events(spark, sf_dir), "event_type", "value")


def _q_stream_cdc(spark, sf_dir):
    """Streaming gate #8: foreachBatch CDC materialization
    (pipeline.stream_apply_cdc). Batch 1 = even-orderkey updates
    (cents*2, %7 deleted); batch 2 = later re-upserts for %4 keys
    (cents*3, day+1 — resurrecting deleted %28 keys, correctly) and
    OLDER out-of-order updates for %10==6 non-deleted keys (cents*5,
    day-1 — which must LOSE). Final parquet state must equal the
    batch upsert_latest over the concatenated log; the oracle IS that
    batch form."""
    import uuid

    import pandas as pd

    from feat_spark.streaming.pipeline import stream_apply_cdc

    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        "o_custkey",
        F.expr(
            "unix_micros(cast(o_orderdate as timestamp)) div 86400000000"
        ).alias("day"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    c1 = o.filter(F.col("k") % 2 == 0).select(
        "k", "o_custkey", "day", (F.col("cents") * 2).alias("cents"),
        F.when(F.col("k") % 7 == 0, "D").otherwise("U").alias("op"),
    )
    c2 = o.filter(F.col("k") % 4 == 0).select(
        "k", "o_custkey", (F.col("day") + 1).alias("day"),
        (F.col("cents") * 3).alias("cents"), F.lit("U").alias("op"),
    ).unionByName(
        o.filter((F.col("k") % 10 == 6) & (F.col("k") % 7 != 0)).select(
            "k", "o_custkey", (F.col("day") - 1).alias("day"),
            (F.col("cents") * 5).alias("cents"), F.lit("U").alias("op"),
        )
    )
    d = _stream_scratch("cdcstream")
    tgt = os.path.join(_stream_scratch("cdctarget"), "state")
    for i, part in enumerate((c1, c2), start=1):
        pdf = part.toPandas().sort_values(["k", "day"]).reset_index(drop=True)
        pdf.to_parquet(os.path.join(d, f"part{i}.parquet"), index=False)
    _space_mtimes(d, ["part1.parquet", "part2.parquet"])
    stream = (
        spark.readStream.schema(
            "k long, o_custkey long, day long, cents long, op string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    q = stream_apply_cdc(stream, tgt, "k", "day", tiebreak_col="cents")
    q.awaitTermination()
    return spark.read.parquet(tgt).select("k", "o_custkey", "day", "cents")


def _q_jsonl_roundtrip(spark, sf_dir):
    """Schema-first JSONL source (layout.read_jsonl): events rendered
    to JSON lines (plus one planted corrupt line), read back with the
    corrupt-record channel, and summarized — n_rows / n_corrupt /
    exact cent sum of parsed values. The oracle recomputes the
    expected summary from the events table directly."""
    import uuid

    from feat_spark.sources.layout import read_jsonl

    d = _stream_scratch("jsonlsrc")
    e = _events(spark, sf_dir).select(
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "value",
    )
    lines = [
        r["js"]
        for r in e.select(
            F.to_json(F.struct("event_id", "ts_us", "value")).alias("js")
        ).collect()
    ]
    with open(os.path.join(d, "part.jsonl"), "w") as f:
        f.write("\n".join(lines))
        f.write("\n{this line is not json\n")
    out = read_jsonl(
        spark, d, "event_id long, ts_us long, value double"
    )
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    return out.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("_corrupt_record").isNotNull().cast("long")).alias(
            "n_corrupt"
        ),
        F.sum(cents).alias("sum_cents"),
        F.count_distinct("event_id").alias("n_ids"),
    )


def _q_cast_audit(spark, sf_dir):
    """Type-coercion dry run (semistructured.cast_audit): three
    declared casts over events-derived strings — event_type to int
    (all fail), stringified value to double (all succeed), props JSON
    to int (all fail) — one scan aggregate, NULL inputs separated.
    Oracle: DuckDB TRY_CAST, same single-pass sums."""
    from feat_spark.operators.semistructured import cast_audit

    e = _events(spark, sf_dir).select(
        "event_type",
        F.col("value").cast("string").alias("vs"),
        "props",
    )
    return cast_audit(
        e, [("event_type", "int"), ("vs", "double"), ("props", "int")]
    )


def _q_cohens_kappa(spark, sf_dir):
    """Chance-corrected rater agreement (experiment.cohens_kappa):
    rater 1 = event_type, rater 2 = the frozen value-threshold rule —
    integer-exact N²-scaled closed form, one division. Oracle replays
    the agreement matrix and margins."""
    from feat_spark.operators.experiment import cohens_kappa

    e = _events(spark, sf_dir).select(
        F.col("event_type").alias("r1"),
        F.when(F.col("value") > 7, "purchase")
        .when(F.col("value") > 3, "click")
        .otherwise("view")
        .alias("r2"),
    )
    return cohens_kappa(e, "r1", "r2")


def _q_vacuum_plan(spark, sf_dir):
    """Snapshot-expiry vacuum planning (layout.vacuum_plan) over a
    lineitem-derived (snapshot, file) manifest: keep the last 3
    snapshot ids, delete only files NO retained snapshot references —
    reference counting as anti-joins, manifest-scale only. Oracle
    replays the refcount."""
    from feat_spark.sources.layout import vacuum_plan

    m = (
        _t(spark, sf_dir, "lineitem")
        .select(
            (F.col("l_partkey") % 10).alias("snapshot_id"),
            F.expr("l_partkey div 3").alias("path"),
        )
        .distinct()
    )
    return vacuum_plan(m, keep_last=3)


def _q_debounce(spark, sf_dir):
    """Burst-collapse debounce (eventops.debounce_events): per-user
    islands with a 300 s gap — one lag over the stable order, island
    semantics documented vs greedy. Oracle replays the lag flag."""
    from feat_spark.operators.eventops import debounce_events

    out = debounce_events(_events(spark, sf_dir), "user_id", gap_s=300)
    return out.select("event_id", "user_id", "kept")


def _q_neighbor_majority(spark, sf_dir):
    """One label-propagation step (graph.neighbor_majority) on the
    order-part graph: part nodes carry frozen labels l0..l4; every
    node takes the deterministic majority of its labeled neighbors.
    Oracle replays adjacency, votes, and the argmax."""
    from feat_spark.operators.graph import neighbor_majority

    e = _t(spark, sf_dir, "lineitem").select(
        (F.col("l_orderkey") * 2).alias("src"),
        (F.col("l_partkey") * 2 + 1).alias("dst"),
    )
    labels = (
        _t(spark, sf_dir, "lineitem")
        .select(
            (F.col("l_partkey") * 2 + 1).alias("node"),
            F.concat(F.lit("l"), (F.col("l_partkey") % 5).cast("string"))
            .alias("label"),
        )
        .distinct()
    )
    return neighbor_majority(e, labels)


def _q_sequential_ids(spark, sf_dir):
    """Distributed sequential id assignment (ids.assign_sequential_ids):
    dense 0..n-1 ids in key order WITHOUT a single-reducer global sort
    — deterministic range buckets from driver min/max, per-bucket
    counts -> offsets (window over the bucket-count frame only),
    broadcast rejoin + per-bucket rank. The key is a scrambled
    injection ``(event_id * 37) mod 100003`` (injective while n <=
    100003, i.e. through sf0.1) so the rank is a REAL permutation, not
    the identity. Oracle: one global row_number in key order."""
    from feat_spark.operators.ids import assign_sequential_ids

    d = _events(spark, sf_dir).select(
        "event_id",
        F.pmod(F.col("event_id") * 37, F.lit(100003)).alias("skey"),
    )
    return assign_sequential_ids(d, "skey", n_buckets=64)


def _q_bloom_semi_join(spark, sf_dir):
    """Bloom-pruned semi join (bloom.bloom_semi_join): lineitem rows
    whose part is small (p_size < 10) — the filter is built
    relationally (seeded xxhash64 -> word bit_or partial agg), the
    probe is a literal-array bit test folded into the big-side scan,
    and an exact LEFT SEMI removes false positives, so a single false
    NEGATIVE (the property a Bloom filter must never violate) loses a
    row and fails the gate. Oracle: the exact semi join."""
    from feat_spark.operators.bloom import bloom_semi_join

    big = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    small = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_size") < 10)
        .select(F.col("p_partkey").alias("l_partkey"))
    )
    return bloom_semi_join(big, small, "l_partkey")


def _q_adamic_adar(spark, sf_dir):
    """Adamic-Adar link prediction (graph.adamic_adar) on a 1-in-7
    slice of the order-part incidence graph: hub-capped wedge join,
    direct edges anti-joined away, per-pair sorted-fold sum of
    1/ln(deg(middle)) rounded 6dp. Oracle replays wedges, the anti
    join, and the ordered fold with list_reduce."""
    from feat_spark.operators.graph import adamic_adar

    e = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 7 == 0)
        .select(
            (F.col("l_orderkey") * 2).alias("src"),
            (F.col("l_partkey") * 2 + 1).alias("dst"),
        )
    )
    return adamic_adar(e)


def _q_embedding_covariance(spark, sf_dir):
    """Embedding covariance matrix (vectors.embedding_covariance) over
    the first 32 dimensions: one scan, per-vector upper-triangle cell
    explode, decimal(27,12) partial-agg sums, closed-form
    cov = sxy/n - (sx/n)(sy/n) on double readouts rounded 6dp. Oracle
    replays the slice, the cell products, and the decimal sums."""
    from feat_spark.operators.vectors import embedding_covariance

    return embedding_covariance(
        _t(spark, sf_dir, "embeddings"), "embedding", max_dim=32
    )


def _q_interpolate_daily(spark, sf_dir):
    """Daily-grid linear interpolation (resample.interpolate_daily)
    of per-user error-event values: day-grain last-observation
    reduction, per-user day spine, prev/next ignorenulls frames, exact
    integer-cents interpolation arithmetic with ONE double division.
    Oracle replays the grain reduction, spine, and closed form."""
    from feat_spark.operators.resample import interpolate_daily

    e = _events(spark, sf_dir).filter(F.col("event_type") == "error")
    return interpolate_daily(e, "user_id")


def _q_stream_sessionize(spark, sf_dir):
    """Streaming gate: NATIVE session windows (F.session_window) under
    Structured Streaming — a real 2-micro-batch availableNow run with
    a TIME-ORDERED file cut, so sessions spanning the cut must MERGE
    their partial windows across micro-batches (the semantics only the
    streaming session-state machinery provides). Watermark delay
    exceeds the corpus span (no finalization losses), complete output
    mode, so the batch gaps-and-islands oracle applies: session_window
    merges at gap <= 30 min exactly like the island flag's
    `> 30 min -> new session` (probed: an EXACT 30-min gap merges in
    both)."""
    import uuid

    from feat_spark.streaming.pipeline import run_to_memory, session_stream_agg

    e = _events(spark, sf_dir).select(
        "event_id", "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    pdf = e.toPandas().sort_values(["ts", "event_id"]).reset_index(drop=True)
    if getattr(pdf["ts"].dtype, "tz", None) is None:
        pdf["ts"] = pdf["ts"].dt.tz_localize("UTC")
    cut = len(pdf) // 2
    d = _stream_scratch("sessstream")
    pq_opts = dict(index=False, coerce_timestamps="us",
                   allow_truncated_timestamps=True)
    pdf.iloc[:cut].to_parquet(os.path.join(d, "part1.parquet"), **pq_opts)
    pdf.iloc[cut:].to_parquet(os.path.join(d, "part2.parquet"), **pq_opts)
    _space_mtimes(d, ["part1.parquet", "part2.parquet"])

    stream = (
        spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    out = session_stream_agg(
        stream, gap="30 minutes", watermark="720 hours",
        keys=("user_id",), ts="ts",
    )
    name = "stream_sess_" + uuid.uuid4().hex[:8]
    run_to_memory(out, name, output_mode="complete")
    return spark.table(name).select(
        "user_id",
        F.unix_micros("session_start").alias("start_us"),
        F.unix_micros("session_horizon").alias("horizon_us"),
        F.col("n_turns").cast("long").alias("n_turns"),
    )


def _q_stream_interval_join(spark, sf_dir):
    """Streaming gate: native stream-stream INNER join with an
    event-time range predicate (pipeline.stream_interval_join) —
    purchases within 4 h after a click, per user, both sides LIVE
    streams split into 2 micro-batch files each. Watermark delay
    exceeds the span, so the batch range join is the exact oracle."""
    import uuid

    from feat_spark.streaming.pipeline import (
        run_to_memory,
        stream_interval_join,
    )

    ev = _events(spark, sf_dir).select(
        "event_id", "user_id", "event_type",
        F.col("ts").cast("timestamp").alias("ts"),
    )
    pdf = ev.toPandas().sort_values(["ts", "event_id"]).reset_index(drop=True)
    if getattr(pdf["ts"].dtype, "tz", None) is None:
        pdf["ts"] = pdf["ts"].dt.tz_localize("UTC")
    clicks = pdf[pdf.event_type == "click"].rename(
        columns={"ts": "c_ts", "event_id": "click_id"}
    )[["user_id", "c_ts", "click_id"]]
    purch = pdf[pdf.event_type == "purchase"].rename(
        columns={"ts": "p_ts", "event_id": "purchase_id"}
    )[["user_id", "p_ts", "purchase_id"]]
    pq_opts = dict(index=False, coerce_timestamps="us",
                   allow_truncated_timestamps=True)
    dl = _stream_scratch("ivjl")
    dr = _stream_scratch("ivjr")
    for frame, d in ((clicks, dl), (purch, dr)):
        half = len(frame) // 2
        frame.iloc[:half].to_parquet(os.path.join(d, "part1.parquet"), **pq_opts)
        frame.iloc[half:].to_parquet(os.path.join(d, "part2.parquet"), **pq_opts)
        _space_mtimes(d, ["part1.parquet", "part2.parquet"])
    left = (
        spark.readStream.schema("user_id long, c_ts timestamp, click_id long")
        .option("maxFilesPerTrigger", 1).parquet(dl)
    )
    right = (
        spark.readStream.schema("user_id long, p_ts timestamp, purchase_id long")
        .option("maxFilesPerTrigger", 1).parquet(dr)
    )
    out = stream_interval_join(
        left, right, "user_id", "c_ts", "p_ts",
        upper="4 hours", watermark="720 hours",
    )
    name = "stream_ivj_" + uuid.uuid4().hex[:8]
    run_to_memory(out, name)
    return spark.table(name).select(
        "user_id", "click_id", "purchase_id",
        F.expr("(unix_micros(p_ts) - unix_micros(c_ts)) div 1000000")
        .alias("lag_s"),
    )


def _q_rendezvous(spark, sf_dir):
    """Rendezvous hashing (ids.rendezvous_assign): every event key
    picks the shard with the highest md5(key, shard) weight — a
    scan-only literal fold, no shuffle, no join; md5 so the oracle
    replays the winner bit-for-bit. Minimal-movement property is
    pinned by test_round4e goldens."""
    from feat_spark.operators.ids import rendezvous_assign

    shards = [f"shard-{i:02d}" for i in range(8)]
    return rendezvous_assign(
        _events(spark, sf_dir).select("event_id"), "event_id", shards
    )


def _q_kcore(spark, sf_dir):
    """Fixed-round k-core peeling (graph.kcore): 4 unrolled
    degree-filter + semi-join rounds toward the 3-core of the 1-in-7
    order-part graph — monotone from above, replayable as a finite
    SQL twin (run-to-convergence is not). Oracle unrolls the same 4
    rounds as nested CTEs."""
    from feat_spark.operators.graph import kcore

    e = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 7 == 0)
        .select(
            (F.col("l_orderkey") * 2).alias("src"),
            (F.col("l_partkey") * 2 + 1).alias("dst"),
        )
    )
    return kcore(e, k=3, rounds=4)


def _q_segment_overlap(spark, sf_dir):
    """Pairwise audience overlap (cooccur.segment_overlap): distinct
    (user, event_type) grain, entity-keyed self-join bounded by
    segments-per-entity, integer Jaccard with one division. Oracle
    replays grain, pairs, and sizes."""
    from feat_spark.operators.cooccur import segment_overlap

    return segment_overlap(
        _events(spark, sf_dir), "user_id", "event_type"
    )


def _q_entity_resolution(spark, sf_dir):
    """End-to-end record linkage (composition): blocked Levenshtein
    candidate pairs (dedup.fuzzy_pairs, the fuzzy_pairs gate's exact
    config) -> connected components -> longest-name survivor per
    cluster (dedup.canonical_docs). Every constituent has its own
    gate; this row checks the COMPOSITION. Oracle chains the fuzzy
    pair SQL, the recursive-CTE component fixpoint, and the survivor
    rank."""
    from feat_spark.operators.dedup import (
        canonical_docs,
        connected_components,
        fuzzy_pairs,
    )

    p = _t(spark, sf_dir, "part").select("p_partkey", "p_name")
    toks = F.split(F.col("p_name"), " ")
    blk = F.concat_ws(":", toks[0], F.substring(toks[1], 1, 1))
    pairs = fuzzy_pairs(
        p, id_col="p_partkey", str_col="p_name", max_dist=2, block=blk,
        broadcast=True,  # same dimension-sized corpus as fuzzy_pairs
    )
    comps = connected_components(pairs)
    docs = p.select(
        F.col("p_partkey").alias("doc_id"), F.col("p_name").alias("text")
    )
    return canonical_docs(comps, docs)


def _q_hash_features(spark, sf_dir):
    """The hashing trick (encoding.hash_features): event_type + the
    props-JSON k value land in a fixed 64-bucket signed feature space
    via the portable md5 hash — vocabulary-free featurization, sparse
    (id, bucket, weight) output, collisions summed with signs. Oracle
    replays tokens, buckets, signs, and the collision sum."""
    from feat_spark.operators.encoding import hash_features

    e = _events(spark, sf_dir).select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").alias("k"),
    )
    return hash_features(e, "event_id", ["event_type", "k"], n_features=64)


def _q_join_cardinality(spark, sf_dir):
    """Pre-join blast-radius audit (plans/audit.join_cardinality_audit)
    of the lineitem SELF-join on l_orderkey: per-key side counts and
    projected output rows, top 20 by explosion — the report that names
    the many-to-many key BEFORE the join runs. Oracle replays counts
    and the TakeOrdered cut."""
    from feat_spark.plans.audit import join_cardinality_audit

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey")
    return join_cardinality_audit(li, li, "l_orderkey", top_k=20)


def _q_k_anonymity(spark, sf_dir):
    """k-anonymity violation report (plans/audit.k_anonymity_audit)
    over the (user_id, day) quasi-identifier at k=5: groups an
    attacker can re-identify, with 1/n risk — violation-sized output,
    one partial-agg pass. Oracle replays the group counts."""
    from feat_spark.plans.audit import k_anonymity_audit

    e = _events(spark, sf_dir).select(
        "user_id",
        F.expr("unix_micros(cast(ts as timestamp)) div 86400000000")
        .alias("day"),
    )
    return k_anonymity_audit(e, ["user_id", "day"], k=5)


def _q_rolling_corr(spark, sf_dir):
    """Rolling Pearson correlation (rolling.rolling_corr) between the
    event value and the props-JSON k metric over the trailing 20
    events per user: integer-cent windowed sums, exact integer
    numerator/radicand, one sqrt + one division, 6dp;
    zero-variance / short windows NULL. Oracle replays every sum and
    the closed form."""
    from feat_spark.operators.rolling import rolling_corr

    e = _events(spark, sf_dir).select(
        "event_id", "user_id", "ts", "value",
        F.get_json_object("props", "$.k").cast("double").alias("yk"),
    )
    out = rolling_corr(
        e, "user_id", ["ts", "event_id"], "value", "yk", window=20
    )
    return out.select("event_id", "r")


def _q_incremental_rollup(spark, sf_dir):
    """Incremental materialized rollup (plans/incremental): the
    algebraic identity rollup(old) MERGE rollup(new) == rollup(all) —
    old = events before epoch-day 19740, delta = the rest, per
    (user_id, event_type) with count / decimal sum / min / max states;
    avg derived at read time from (sum, n). Decimal sums make the
    merge bit-equal to the from-scratch oracle."""
    from feat_spark.plans.incremental import build_rollup, merge_rollup

    keys = ["user_id", "event_type"]
    measures = [
        ("n", "count", "value"),
        ("sum_value", "sum", "value_dec"),
        ("vmin", "min", "value_dec"),
        ("vmax", "max", "value_dec"),
    ]
    e = _events(spark, sf_dir).withColumn(
        "value_dec", F.col("value").cast("decimal(18,2)")
    ).withColumn(
        "day", F.expr("unix_micros(cast(ts as timestamp)) div 86400000000")
    )
    prev = build_rollup(e.filter(F.col("day") < 19740), keys, measures)
    delta = build_rollup(e.filter(F.col("day") >= 19740), keys, measures)
    merged = merge_rollup(prev, delta, keys, measures)
    return merged.select(
        *keys,
        F.col("n").cast("long").alias("n"),
        F.col("sum_value").cast("double").alias("sum_value"),
        F.col("vmin").cast("double").alias("vmin"),
        F.col("vmax").cast("double").alias("vmax"),
        (F.col("sum_value").cast("double") / F.col("n").cast("double"))
        .alias("avg_value"),
    )


def _q_bitmap_overlap(spark, sf_dir):
    """Bitmap audience index (operators/bitmap): per-segment bitsets
    over the user-id space (one bit_or partial agg), pairwise
    intersection sizes by popcounting word ANDs — the repeated-query
    twin of segment_overlap's one-shot self-join. The oracle computes
    ground truth by the DIRECT distinct-intersection count, so the
    whole bitmap path is cross-checked against an independent
    formulation."""
    from feat_spark.operators.bitmap import bitmap_index, bitmap_intersect

    idx = bitmap_index(
        _events(spark, sf_dir), "event_type", "user_id"
    )
    return bitmap_intersect(idx)


def _q_stream_tumbling(spark, sf_dir):
    """Streaming gate: watermarked tumbling-window rollup
    (pipeline.tumbling_stream_agg) through a real 2-micro-batch
    availableNow run with a time-ordered cut — hour windows split by
    the cut must combine their partial counts. Complete mode,
    watermark past the span; oracle = the batch time_bucket rollup."""
    import uuid

    from feat_spark.streaming.pipeline import run_to_memory, tumbling_stream_agg

    e = _events(spark, sf_dir).select(
        "event_id", "user_id",
        F.col("ts").cast("timestamp").alias("ts"),
        F.col("event_type").alias("text"),
    )
    pdf = e.toPandas().sort_values(["ts", "event_id"]).reset_index(drop=True)
    if getattr(pdf["ts"].dtype, "tz", None) is None:
        pdf["ts"] = pdf["ts"].dt.tz_localize("UTC")
    cut = len(pdf) // 2
    d = _stream_scratch("tumbstream")
    pq_opts = dict(index=False, coerce_timestamps="us",
                   allow_truncated_timestamps=True)
    pdf.iloc[:cut].to_parquet(os.path.join(d, "part1.parquet"), **pq_opts)
    pdf.iloc[cut:].to_parquet(os.path.join(d, "part2.parquet"), **pq_opts)
    _space_mtimes(d, ["part1.parquet", "part2.parquet"])

    stream = (
        spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    out = tumbling_stream_agg(
        stream, duration="1 hour", watermark="720 hours",
        keys=("user_id",), ts="ts",
    )
    name = "stream_tumb_" + uuid.uuid4().hex[:8]
    run_to_memory(out, name, output_mode="complete")
    return spark.table(name).select(
        "user_id",
        F.unix_micros("win_start").alias("start_us"),
        F.col("n_turns").cast("long").alias("n"),
        F.col("chars").cast("long").alias("chars"),
    )


def _q_time_travel(spark, sf_dir):
    """Time-travel read planning (layout.time_travel_plan): VERSION
    AS OF 6 over a lineitem-derived add/remove change log — one
    monotone-id filter, one map-side-combinable per-file argmax, one
    predicate; visible = latest action is an add. Oracle replays the
    log replay."""
    from feat_spark.sources.layout import time_travel_plan

    log = (
        _t(spark, sf_dir, "lineitem")
        .select(
            (F.col("l_partkey") % 10).alias("snapshot_id"),
            F.expr("l_partkey div 3").alias("path"),
        )
        .distinct()
        .withColumn(
            "op",
            F.when(
                (F.col("path") + F.col("snapshot_id")) % 5 == 0,
                F.lit("remove"),
            ).otherwise(F.lit("add")),
        )
    )
    return time_travel_plan(log, snapshot=6)


def _q_sql_surface(spark, sf_dir):
    """The spark.sql entrypoint end-to-end (SURVEY §3): temp views +
    a CTE + join + aggregate + window, parsed and planned through the
    SQL surface rather than the DataFrame API — the parser/analyzer
    path a SQL-first user of the engine exercises. Oracle is the same
    ANSI query."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    _t(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    return spark.sql("""
        with seg as (
          select c.c_mktsegment as segment,
                 count(*) as n_orders,
                 cast(sum(cast(o.o_totalprice as decimal(18,2)))
                      as double) as revenue
          from v_orders o join v_customer c on o.o_custkey = c.c_custkey
          group by c.c_mktsegment)
        select segment, n_orders, revenue,
               cast(rank() over (order by revenue desc, segment) as int)
                 as rnk
        from seg""")


def _q_arrow_features(spark, sf_dir):
    """The mapInArrow UDF surface (udfs.arrow_text_bytes): Arrow-
    native per-batch compute, no pandas materialization — UTF-8 byte
    vs char lengths per document. Oracle: DuckDB strlen (bytes) and
    length (chars)."""
    from feat_spark.functions.udfs import arrow_text_bytes

    return arrow_text_bytes(
        _t(spark, sf_dir, "documents"), "doc_id", "text"
    )


def _q_stratified_kfold(spark, sf_dir):
    """Size-exact stratified k-fold CV assignment
    (sampling.stratified_kfold): within each event_type stratum, fold
    sizes differ by at most one; folds frozen-random by md5(id||salt)
    with id tiebreak. Oracle replays the hash rank and the mod."""
    from feat_spark.operators.sampling import stratified_kfold

    out = stratified_kfold(
        _events(spark, sf_dir), ["event_type"], "event_id", k=5
    )
    return out.select("event_id", "event_type", "fold")


def _q_did_readout(spark, sf_dir):
    """Difference-in-differences (experiment.did_readout): treat =
    even user ids, post = epoch-day >= 19740 — the 2x2 mean table and
    the DiD estimate from ONE scan aggregate of integer-cent
    conditional sums. Oracle replays every cell."""
    from feat_spark.operators.experiment import did_readout

    e = _events(spark, sf_dir).select(
        (F.col("user_id") % 2 == 0).alias("treat"),
        (
            F.expr("unix_micros(cast(ts as timestamp)) div 86400000000")
            >= 19740
        ).alias("post"),
        "value",
    )
    return did_readout(e, "treat", "post", "value")


def _q_centroid_drift(spark, sf_dir):
    """Per-group semantic drift (similarity.centroid_drift): cosine
    between each label's pre/post mean embedding (period = vec_id
    parity), first 16 dims — decimal cell means, dimension-scale
    join, decimal dot/norm sums, one sqrt+division. Oracle replays
    cells, means, and the closed form."""
    from feat_spark.operators.similarity import centroid_drift

    e = _t(spark, sf_dir, "embeddings").select(
        "label",
        F.when(F.col("vec_id") % 2 == 0, F.lit("pre"))
        .otherwise(F.lit("post"))
        .alias("period"),
        "embedding",
    )
    return centroid_drift(e, "label", "period", max_dim=16)


def _q_frame_sample_plan(spark, sf_dir):
    """Uniform frame-sampling plan (multimodal.frame_sample_plan):
    midpoint timestamps t_i = (2i+1)*dur/2k as all-integer ms
    floor-divisions, k=8, durations faked from n_chars/50 seconds —
    the decode-stage work list a video pipeline fans out over. Oracle
    replays the integer arithmetic."""
    from feat_spark.operators.multimodal import frame_sample_plan

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", (F.col("n_chars") / 50.0).alias("duration_s")
    )
    return frame_sample_plan(d, "doc_id", "duration_s", k=8)


def _q_dedup_report(spark, sf_dir):
    """Per-source duplication readout (dedup.dedup_report) over the
    simhash near-dup components of the doubled corpus (the
    dedup_components gate's exact graph): docs in clusters, distinct
    clusters, redundant rows, dup_rate per source — cross-source
    clusters counted in every source they touch (documented). Oracle
    recomputes components with the recursive CTE and replays the
    aggregation."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text", "source")
    corpus = d.unionByName(
        d.select(
            (F.col("doc_id") + 200000).alias("doc_id"), "text", "source"
        )
    )
    sims = D.simhash32(corpus, id_col="doc_id", text_col="text")
    pairs = D.simhash_near_pairs(sims, id_col="doc_id", max_hamming=6)
    comps = D.connected_components(pairs)
    return D.dedup_report(comps, corpus, "source")


def _q_stickiness(spark, sf_dir):
    """DAU/MAU-style stickiness (composition of
    windows.rolling_distinct_count at 7 and 28 days): per
    (event_type, day), the share of the trailing-28-day actives seen
    in the trailing 7 days — both exact interval-merge counts, one
    equi-join on the shared spine, one double division. Oracle runs
    the naive windowed-distinct twice."""
    from feat_spark.operators.windows import rolling_distinct_count

    e = _events(spark, sf_dir)
    d7 = rolling_distinct_count(
        e, group_col="event_type", entity_col="user_id",
        ts_col="ts", window_days=7, out_col="dau7",
    )
    d28 = rolling_distinct_count(
        e, group_col="event_type", entity_col="user_id",
        ts_col="ts", window_days=28, out_col="dau28",
    )
    return d7.join(d28, ["event_type", "day"]).select(
        "event_type", "day", "dau7", "dau28",
        F.round(
            F.col("dau7").cast("double") / F.col("dau28").cast("double"), 6
        ).alias("stickiness"),
    )


def _q_dow_seasonality(spark, sf_dir):
    """Day-of-week seasonality strength (profile.
    dow_seasonality_strength): one-way ANOVA eta² per event_type —
    integer-cent sums, decimal square-sums, decimal-cast between-group
    terms so no float sum depends on order. Oracle replays both
    aggregation levels and the closed form."""
    from feat_spark.operators.profile import dow_seasonality_strength

    return dow_seasonality_strength(
        _events(spark, sf_dir), "event_type"
    )


def _q_stream_rollup(spark, sf_dir):
    """Streaming gate: incremental rollup maintenance
    (pipeline.stream_maintain_rollup) — a 2-micro-batch time-ordered
    event stream folds into a per-(user_id, event_type) aggregate
    snapshot via foreachBatch build+merge+atomic-swap. By the
    algebraic identity the final snapshot equals the from-scratch
    rollup however the stream was cut, which is exactly what the
    oracle (the full-input rollup) checks."""
    import uuid

    from feat_spark.streaming.pipeline import stream_maintain_rollup

    keys = ["user_id", "event_type"]
    measures = [
        ("n", "count", "value"),
        ("sum_value", "sum", "value_dec"),
        ("vmin", "min", "value_dec"),
        ("vmax", "max", "value_dec"),
    ]
    e = _events(spark, sf_dir).select(
        "event_id", "user_id", "event_type",
        F.col("ts").cast("timestamp").alias("ts"),
        F.col("value").cast("decimal(18,2)").alias("value_dec"),
        "value",
    )
    pdf = e.toPandas().sort_values(["ts", "event_id"]).reset_index(drop=True)
    if getattr(pdf["ts"].dtype, "tz", None) is None:
        pdf["ts"] = pdf["ts"].dt.tz_localize("UTC")
    cut = len(pdf) // 2
    d = _stream_scratch("rollstream")
    tgt = os.path.join(_stream_scratch("rolltarget"), "state")
    pq_opts = dict(index=False, coerce_timestamps="us",
                   allow_truncated_timestamps=True)
    pdf.iloc[:cut].to_parquet(os.path.join(d, "part1.parquet"), **pq_opts)
    pdf.iloc[cut:].to_parquet(os.path.join(d, "part2.parquet"), **pq_opts)
    _space_mtimes(d, ["part1.parquet", "part2.parquet"])
    stream = (
        spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    q = stream_maintain_rollup(stream, tgt, keys, measures)
    q.awaitTermination()
    out = spark.read.parquet(tgt)
    return out.select(
        *keys,
        F.col("n").cast("long").alias("n"),
        F.col("sum_value").cast("double").alias("sum_value"),
        F.col("vmin").cast("double").alias("vmin"),
        F.col("vmax").cast("double").alias("vmax"),
    )


def _q_daily_bands(spark, sf_dir):
    """Daily p25/p50/p75 value bands per event_type
    (profile.daily_percentile_bands): dyadic quartiles over integer
    cents interpolate exactly (the RFM-cuts device) — the p99 float
    case is explicitly left to the sketch family. Oracle:
    quantile_cont at the same dyadic probs."""
    from feat_spark.operators.profile import daily_percentile_bands

    return daily_percentile_bands(_events(spark, sf_dir), "event_type")


def _q_scd_overlap(spark, sf_dir):
    """SCD-2 validity-overlap audit (plans/audit.scd_overlap_audit)
    over an orders-derived dimension (valid_from = order day,
    valid_to = day + orderkey%15): consecutive intervals per customer
    that overlap — the corruption that double-joins every as-of
    lookup. Oracle replays the lag and the NULL-safe predicate."""
    from feat_spark.plans.audit import scd_overlap_audit

    dim = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k"),
        F.expr(
            "unix_micros(cast(o_orderdate as timestamp)) div 86400000000"
        ).alias("valid_from"),
        (
            F.expr(
                "unix_micros(cast(o_orderdate as timestamp))"
                " div 86400000000"
            )
            + F.col("o_orderkey") % 15
        ).alias("valid_to"),
    )
    return scd_overlap_audit(dim, "k")


def _q_window_funnel(spark, sf_dir):
    """Strict sliding-window funnel (funnel.window_funnel, the
    ClickHouse windowFunnel semantics): deepest view->click->purchase
    chain within 4 h of ANY view anchor, per user — one time-band join
    per step, greedy-earliest per anchor (optimal by the exchange
    argument), max depth over anchors. Oracle unrolls the same
    chained band joins."""
    from feat_spark.operators.funnel import window_funnel

    return window_funnel(
        _events(spark, sf_dir),
        steps=["view", "click", "purchase"],
        window_s=4 * 3600,
    )


def _q_growth_accounting(spark, sf_dir):
    """Daily growth accounting (funnel.growth_accounting): every
    active day decomposes into new / retained / resurrected at a 7-day
    comeback gap — grain reduction, one shared-partition window, one
    day-keyed agg; n_active = new + retained + resurrected by
    construction. Oracle replays grain, windows, and the
    classification."""
    from feat_spark.operators.funnel import growth_accounting

    return growth_accounting(_events(spark, sf_dir))


def _q_theilsen_trend(spark, sf_dir):
    """Per-user Theil-Sen robust spend trend (encoding.theilsen_fit):
    median of all pairwise day-over-day slopes on per-day cent sums —
    the 29.3%-breakdown sibling of group_trend's OLS. Pair generator
    is a self-equi-join on user (fan-out bounded by the calendar after
    grain reduction); each slope is one IEEE division of exact
    integers; median of an identical double multiset matches in any
    engine. Oracle replays grain, pairs, and the median."""
    from feat_spark.operators.encoding import theilsen_fit

    e = _events(spark, sf_dir)
    grain = e.groupBy(
        "user_id",
        F.expr("unix_micros(cast(ts as timestamp)) div 86400000000").alias(
            "d"
        ),
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("c"))
    return theilsen_fit(grain, "d", "c", "user_id")


def _q_nelson_aalen(spark, sf_dir):
    """Nelson-Aalen cumulative hazard (labels.nelson_aalen) over the
    same hour-bucketed time-to-purchase frame as the km_curve gate:
    H(t) = a decimal-summed, 12dp-rounded running sum of d/n
    increments (the km_curve/PageRank device) — additive hazard with
    zero float-order hazard. Oracle unrolls the same spine."""
    from feat_spark.operators.labels import nelson_aalen, time_to_event

    e = _events(spark, sf_dir)
    tte = time_to_event(
        e,
        entity_col="user_id",
        ts_col="ts",
        id_col="event_id",
        target_filter=F.col("event_type") == "purchase",
        horizon_sec=259200,
    )
    hours = tte.select(
        (F.col("tte_sec") / 3600).cast("long").alias("t_hr"), "observed"
    )
    return nelson_aalen(hours, "t_hr", "observed")


def _q_item_similarity(spark, sf_dir):
    """Item-item cosine top-5 (cooccur.item_similarity) over the part
    co-purchase incidence (basket = l_orderkey): n_ab/sqrt(n_a*n_b)
    with per-item ranking on (cosine desc, n_ab desc, neighbor asc) —
    the neighborhood-CF index. Basket-keyed self-equi-join bounds
    fan-out by basket size (<=13 here), never the catalog. Oracle
    replays incidence, pairs, cosine, and the ranked top-k."""
    from feat_spark.operators.cooccur import item_similarity

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    return item_similarity(
        li, "l_orderkey", "l_partkey", k=5, min_pairs=2
    )


def _q_hll_mergeable(spark, sf_dir):
    """Mergeable-sketch distinct rollup (profile.hll_rollup): one
    Datasketches HLL per (event_type, day) leaf via hll_sketch_agg,
    union-merged up to event_type via hll_union_agg — the incremental
    100 TB distinct-counting pattern (slices = sketch unions, never
    rescans). Sketch bits are engine-private, so the gate exports the
    oracle-bounded form (the _q_sketches device): exact distinct rides
    along, the merged estimate exports as a 5%+3 error boolean the
    oracle asserts true."""
    from feat_spark.operators.profile import hll_rollup

    e = _events(spark, sf_dir)
    return hll_rollup(
        e,
        "event_type",
        F.expr("unix_micros(cast(ts as timestamp)) div 86400000000"),
        "user_id",
    )


def _q_recency_features(spark, sf_dir):
    """Point-in-time recency features (eventops.recency_features):
    per event, seconds since the user's previous SAME-TYPE event (one
    lag) and since the previous purchase (conditional running MAX over
    the strictly-preceding frame) — leakage-safe by frame construction,
    cold starts NULL. Integer-microsecond arithmetic throughout.
    Oracle mirrors both window frames."""
    from feat_spark.operators.eventops import recency_features

    e = _events(spark, sf_dir)
    return recency_features(e).select(
        "event_id",
        "user_id",
        "event_type",
        "secs_since_same_type",
        "secs_since_anchor",
    )


def _q_clustering_coeff(spark, sf_dir):
    """Local clustering coefficient (graph.local_clustering) over the
    same part co-purchase graph as the triangle_count gate:
    2T/(d(d-1)) per node — ego density, the normalized readout of the
    degree-ordered-orientation triangle count (O(E^1.5) bound, no
    cartesian). Integer T and d, one IEEE division, 9dp. Oracle = the
    triangle oracle plus the degree agg and the same ratio."""
    from feat_spark.operators.graph import local_clustering

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").filter(
        F.col("l_partkey") % 4 == 0
    )
    x = li.alias("x")
    y = li.alias("y")
    pairs = x.join(y, "l_orderkey").filter(
        F.col("x.l_partkey") < F.col("y.l_partkey")
    ).select(
        F.col("x.l_partkey").alias("src"), F.col("y.l_partkey").alias("dst")
    )
    return local_clustering(pairs)


def _scored_events(spark, sf_dir):
    """Shared synthetic classifier frame for the model-eval gates: an
    md5-derived milli-unit score (0..1000) plus a correlated noisy
    label, both replayed verbatim by the DuckDB twins — informative
    enough that capture/lift/PR curves are non-degenerate."""
    from feat_spark.functions.text import md5_long32

    e = _events(spark, sf_dir)
    s = F.pmod(md5_long32(F.col("event_id").cast("string")), F.lit(1001))
    noise = F.pmod(
        md5_long32(F.concat(F.lit("n#"), F.col("event_id").cast("string"))),
        F.lit(401),
    ) - F.lit(200)
    return e.select(
        "event_id",
        (F.col("user_id") % 5).alias("segment"),
        s.alias("score_milli"),
        ((s + noise) >= 550).cast("int").alias("y"),
    )


def _q_countmin_topk(spark, sf_dir):
    """Count-Min heavy hitters (cms.countmin_topk): the exact top-20
    users by event count, each with its d=4 x w=64 sketch point query
    (est >= exact by construction; w deliberately narrow so collisions
    actually occur). Grid is built from DISTINCT-key grain, merges by
    addition — the incremental distinct-of-counts sibling of the HLL
    rollup. Portable md5 buckets, so the oracle replays the ENTIRE
    sketch — estimates hash-match, not just bound-check."""
    from feat_spark.operators.cms import countmin_topk

    return countmin_topk(
        _events(spark, sf_dir), "user_id", k=20, depth=4, width=64
    )


def _q_gains_deciles(spark, sf_dir):
    """Per-segment decile gains/lift table (experiment.gains_table)
    over the shared scored frame: ntile(10) on a deterministic
    (score desc, event_id asc) order, exact-integer capture and lift
    ratios, one IEEE division each at 9dp. Oracle replays ntile and
    both cumulative ratios."""
    from feat_spark.operators.experiment import gains_table

    return gains_table(
        _scored_events(spark, sf_dir),
        "segment",
        "score_milli",
        "y",
        tiebreak_col="event_id",
        n_bins=10,
    )


def _q_brier_scores(spark, sf_dir):
    """Per-segment Brier score + skill (experiment.brier_score) on the
    shared scored frame: milli-unit scores make (s-1000y)^2 an exact
    long sum; brier, base rate and the skill readout each close with
    fixed-order divisions of exact integers. Oracle replays the sums
    and the closed forms."""
    from feat_spark.operators.experiment import brier_score

    return brier_score(
        _scored_events(spark, sf_dir), "segment", "score_milli", "y"
    )


def _q_pr_thresholds(spark, sf_dir):
    """Operating-point sweep (experiment.pr_thresholds): precision /
    recall / F1 at 9 thresholds via CONDITIONAL aggregation — one
    global partial agg, 19 columns, then a literal unpivot; no row
    explosion. Exact counts, one division per ratio. Oracle computes
    each threshold's cell counts with filtered aggregates."""
    from feat_spark.operators.experiment import pr_thresholds

    return pr_thresholds(_scored_events(spark, sf_dir), "score_milli", "y")


def _q_ols2(spark, sf_dir):
    """Per-user two-regressor OLS (encoding.ols2_fit): daily spend
    cents ~ day index + daily event count, solved in closed form via
    Cramer's rule on exact decimal(38,0) centered sums — one IEEE
    division per beta, 9dp; collinear / n<3 groups NULL. Oracle
    replays the grain, the nine sums, and the closed form."""
    from feat_spark.operators.encoding import ols2_fit

    e = _events(spark, sf_dir)
    grain = e.groupBy(
        "user_id",
        F.expr("unix_micros(cast(ts as timestamp)) div 86400000000").alias(
            "d"
        ),
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("c"),
        F.count(F.lit(1)).alias("ne"),
    )
    return ols2_fit(grain, "user_id", "d", "ne", "c")


def _q_link_jaccard(spark, sf_dir):
    """Neighborhood-Jaccard link prediction (graph.link_jaccard) on
    the same 1-in-7 order-part incidence slice as adamic_adar:
    hub-capped wedge join, direct edges anti-joined, degrees joined
    back on both endpoints, J = cn/(da+db-cn) in one division, top-5
    per node on (jaccard desc, suggestion asc). Oracle replays wedges,
    degrees, and the ranked top-k."""
    from feat_spark.operators.graph import link_jaccard

    e = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 7 == 0)
        .select(
            (F.col("l_orderkey") * 2).alias("src"),
            (F.col("l_partkey") * 2 + 1).alias("dst"),
        )
    )
    return link_jaccard(e, k=5)


def _q_leakage_screen(spark, sf_dir):
    """Input-side target-leakage screen (profile.leakage_screen): one
    melt scan computes each feature's point-biserial correlation with
    the purchase label from exact decimal sums; a deliberately leaky
    plant (1000*y + hash%50) must flag leakage_suspect=true while
    honest features (cents, hour, user bucket) stay below threshold.
    The input-column complement of the engine-side leakage_audit.
    Oracle replays melt, sums, and the closed form."""
    from feat_spark.operators.profile import leakage_screen
    from feat_spark.functions.text import md5_long32

    e = _events(spark, sf_dir)
    y = (F.col("event_type") == "purchase").cast("long")
    feats = e.select(
        F.round(F.col("value") * 100).cast("long").alias("value_cents"),
        F.hour(F.col("ts").cast("timestamp")).cast("long").alias("hour"),
        (F.col("user_id") % 7).alias("user_bucket"),
        (
            y * 1000
            + F.pmod(md5_long32(F.col("event_id").cast("string")), F.lit(50))
        ).alias("leaky_plant"),
        y.alias("label"),
    )
    return leakage_screen(
        feats,
        ["value_cents", "hour", "user_bucket", "leaky_plant"],
        "label",
    )


def _q_top_paths(spark, sf_dir):
    """Dominant entry journeys (funnel.top_paths): each user's first 5
    event types as an ordered '>' path (row_number on (ts, event_id),
    truncated BEFORE the path agg), corpus-counted, top-20 by
    (n desc, path asc) TakeOrdered. Oracle: ordered string_agg over
    the same truncation."""
    from feat_spark.operators.funnel import top_paths

    return top_paths(
        _events(spark, sf_dir),
        "user_id",
        "event_type",
        max_steps=5,
        topn=20,
    )


def _q_peak_concurrency(spark, sf_dir):
    """Sweep-line peak concurrency (eventops.peak_concurrency) over
    per-(user, day) activity intervals: unpivot to +1/-1 deltas, one
    per-day RANGE-framed running sum (tie blocks collapse, so no
    unique tiebreak is needed), max at start rows — inclusive-overlap
    semantics. Oracle replays the sweep with the same window."""
    from feat_spark.operators.eventops import peak_concurrency

    e = _events(spark, sf_dir)
    iv = e.groupBy(
        "user_id",
        F.expr("unix_micros(cast(ts as timestamp)) div 86400000000").alias(
            "day"
        ),
    ).agg(
        F.min(F.expr("unix_micros(cast(ts as timestamp))")).alias("t0"),
        F.max(F.expr("unix_micros(cast(ts as timestamp))")).alias("t1"),
    )
    return peak_concurrency(iv, "t0", "t1", group_cols=("day",))


def _q_oof_target_encode(spark, sf_dir):
    """Out-of-fold target encoding (encoding.oof_target_encode): the
    leakage-correct encoder — md5 folds, one (key, fold) agg, key
    totals from a <=k-row window, complement mean = (tot-own)/(n-own)
    in one exact division. Single-fold keys yield NULL. Oracle replays
    folds, sums, and the complement algebra."""
    from feat_spark.operators.encoding import oof_target_encode

    e = _events(spark, sf_dir).select(
        "event_type",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    return oof_target_encode(
        e, "event_type", "cents", "event_id", n_folds=5
    )


def _q_stream_enrich(spark, sf_dir):
    """Streaming gate: stream-STATIC enrichment join
    (pipeline.stream_static_enrich_agg) through a real 2-micro-batch
    availableNow run — each micro-batch inner-joins the static segment
    dimension (users with user_id % 7 != 0; the rest DROP, the
    documented inner-join contract), then rolls up exact counts and
    cents per segment. Complete mode, watermark past the span. Oracle
    = the batch join + rollup."""
    import uuid

    from feat_spark.streaming.pipeline import (
        run_to_memory,
        stream_static_enrich_agg,
    )

    e = _events(spark, sf_dir).select(
        "event_id", "user_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "value",
    )
    pdf = e.toPandas().sort_values(["ts", "event_id"]).reset_index(drop=True)
    if getattr(pdf["ts"].dtype, "tz", None) is None:
        pdf["ts"] = pdf["ts"].dt.tz_localize("UTC")
    cut = len(pdf) // 2
    d = _stream_scratch("enrichstream")
    pq_opts = dict(index=False, coerce_timestamps="us",
                   allow_truncated_timestamps=True)
    pdf.iloc[:cut].to_parquet(os.path.join(d, "part1.parquet"), **pq_opts)
    pdf.iloc[cut:].to_parquet(os.path.join(d, "part2.parquet"), **pq_opts)
    _space_mtimes(d, ["part1.parquet", "part2.parquet"])

    dim = (
        e.select("user_id")
        .distinct()
        .filter(F.col("user_id") % 7 != 0)
        .select(
            "user_id",
            F.concat(F.lit("seg"), (F.col("user_id") % 3).cast("string")).alias(
                "segment"
            ),
        )
    )
    stream = (
        spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    out = stream_static_enrich_agg(
        stream, dim, "user_id", "segment", "value", watermark="2000 hours"
    )
    name = "stream_enrich_" + uuid.uuid4().hex[:8]
    run_to_memory(out, name, output_mode="complete")
    return spark.table(name).select(
        "segment",
        F.col("n_events").cast("long").alias("n_events"),
        F.col("cents").cast("long").alias("cents"),
    )


def _q_seasonal_decompose(spark, sf_dir):
    """Additive seasonal decomposition (resample.seasonal_decompose_daily)
    of the global daily cent-sum series: centered 7-day MA trend,
    day-of-week seasonal indexes via the multiply-through-by-7 exact
    integer device (detrended_x7 = 7v - sum7 sums exactly; one
    division per DOW), fixed-order double remainders, NULL at edges.
    The window runs over the grain-reduced calendar series (n_days
    rows), not the events. Oracle replays the windows and the
    algebra."""
    from feat_spark.operators.resample import seasonal_decompose_daily

    e = _events(spark, sf_dir)
    daily = e.groupBy(
        F.expr("unix_micros(cast(ts as timestamp)) div 86400000000").alias(
            "day"
        )
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"))
    return seasonal_decompose_daily(daily, "day", "cents", period=7)


def _q_blocking_quality(spark, sf_dir):
    """Blocking-strategy audit (dedup.blocking_quality): documents plus
    planted ' extrawordextra' mutants, blocked on (first word, length
    div 100) — mutants that cross a length-bucket boundary escape, so
    pair_completeness measures the real recall floor of the block
    (and reduction_ratio the cost win) against planted truth. One
    block-keyed self-join, 1-row tallies equi-joined on a literal key.
    Oracle replays plants, blocks, pairs, and both ratios."""
    from feat_spark.operators.dedup import blocking_quality

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    mut = d.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extrawordextra")).alias("text"),
    )
    allr = d.unionByName(mut)
    assignments = allr.select(
        F.col("doc_id").alias("id"),
        F.concat(
            F.split(F.col("text"), " ").getItem(0),
            F.lit("|"),
            F.floor(F.length("text") / 100).cast("string"),
        ).alias("block"),
    )
    truth = d.select(
        F.col("doc_id").alias("id_a"),
        (F.col("doc_id") + 100000).alias("id_b"),
    )
    return blocking_quality(assignments, truth)


def _q_schema_evolution(spark, sf_dir):
    """Schema-evolution read (layout.read_parquet_evolved): two
    parquet files written by different 'writer generations' (the newer
    one adds a channel column), merged with mergeSchema — superset
    schema, NULL backfill for pre-evolution rows. Summarized to exact
    counts / cents so the oracle recomputes the contract from the
    events table directly."""
    from feat_spark.sources.layout import read_parquet_evolved

    d = _stream_scratch("schemaevo")
    e = _events(spark, sf_dir).select(
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "value",
        "event_type",
    )
    pdf = e.toPandas().sort_values("event_id").reset_index(drop=True)
    old = pdf[pdf["event_id"] % 2 == 0][["event_id", "ts_us", "value"]]
    new = pdf[pdf["event_id"] % 2 == 1][
        ["event_id", "ts_us", "value", "event_type"]
    ].rename(columns={"event_type": "channel"})
    old.to_parquet(os.path.join(d, "gen1.parquet"), index=False)
    new.to_parquet(os.path.join(d, "gen2.parquet"), index=False)
    out = read_parquet_evolved(spark, d)
    return out.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("channel").isNull().cast("long")).alias("n_legacy"),
        F.count_distinct(F.col("channel")).alias("n_channels"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
    )


def _q_url_parse(spark, sf_dir):
    """URL decomposition (text.url_features / url_query_param) over
    synthesized doc URLs (1-in-10 malformed to exercise the NULL
    path): JVM parse_url host/path, regex domain and utm param — a
    pure whole-stage-codegen projection, no UDF. Oracle replays with
    regexps over the same synthesis."""
    from feat_spark.functions.text import url_features, url_query_param

    d = _t(spark, sf_dir, "documents")
    url = F.when(
        F.col("doc_id") % 10 == 0, F.lit("no-scheme-just-text")
    ).otherwise(
        F.concat(
            F.when(F.col("doc_id") % 3 == 0, F.lit("http://")).otherwise(
                F.lit("https://")
            ),
            F.col("source"),
            F.lit(".example.com/docs/"),
            F.col("doc_id").cast("string"),
            F.lit("?utm_source="),
            F.col("lang"),
            F.lit("&x=1"),
        )
    )
    u = d.select("doc_id", url.alias("url"))
    feats = url_features(F.col("url"))
    return u.select(
        "doc_id",
        feats["host"].alias("host"),
        feats["domain"].alias("domain"),
        feats["path"].alias("path"),
        feats["is_https"].alias("is_https"),
        url_query_param(F.col("url"), "utm_source").alias("utm_source"),
    )


def _q_hdr_percentiles(spark, sf_dir):
    """Mergeable HDR-style quantile sketch (qsketch.hdr_percentiles):
    p50/p90/p99 of event cents per event_type from log-spaced buckets
    whose math is pure integer arithmetic (bit-length majors via
    conv-to-binary, shift-divided minors) — no log2 boundary
    nondeterminism, 6.25% worst-case relative under-read, buckets
    merge by addition. The oracle replays the ENTIRE sketch (bin(),
    shifts, cumulative ranks) — estimates hash-match, not just
    bound-check."""
    from feat_spark.operators.qsketch import hdr_percentiles

    e = _events(spark, sf_dir).select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    return hdr_percentiles(
        e, "cents", percentiles_milli=(500, 900, 990),
        group_cols=("event_type",),
    )


def _q_rand_index(spark, sf_dir):
    """Pair-counting cluster agreement (experiment.rand_index): RI and
    adjusted RI of a length-bucket clustering of documents against the
    lang labels — contingency-table algebra in DOUBLED exact decimal
    pair counts (x*(x-1), no decimal division), fixed-order double
    closes. Oracle replays cells, marginals, and both indexes."""
    from feat_spark.operators.experiment import rand_index

    d = _t(spark, sf_dir, "documents").select(
        F.floor(F.col("n_chars") / 100).alias("pred"),
        F.col("lang").alias("truth"),
    )
    return rand_index(d, "pred", "truth")


def _q_mix_shift(spark, sf_dir):
    """Rate/mix decomposition (profile.mix_shift) of cents-per-event
    between even and odd epoch days, segmented by event_type:
    Laspeyres split — mix = (w_b - w_a) * r_a, rate = w_b * (r_b -
    r_a); absent-side rates borrow the other side so new/discontinued
    segments contribute pure mix. Effects sum to the overall rate
    delta (asserted in the unit vectors). Oracle replays weights,
    rates, and both effects."""
    from feat_spark.operators.profile import mix_shift

    e = _events(spark, sf_dir)
    g = e.groupBy(
        F.when(
            F.expr("unix_micros(cast(ts as timestamp)) div 86400000000")
            % 2
            == 0,
            F.lit("a"),
        )
        .otherwise(F.lit("b"))
        .alias("period"),
        F.col("event_type").alias("segment"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
    )
    return mix_shift(g, "period", "segment", "n", "cents")


def _q_gap_streaks(spark, sf_dir):
    """Inactivity-gap profile (eventops.gap_streaks): per user, the
    longest dark streak between active days and the count of gaps
    over 2 days — distinct-day grain reduction, one lead() per user,
    censored tail excluded. Oracle replays the grain and the lead."""
    from feat_spark.operators.eventops import gap_streaks

    return gap_streaks(_events(spark, sf_dir), "user_id", alert_gap_days=2)


def _q_attribution_decay(spark, sf_dir):
    """Time-decay attribution (attribution.attribute_time_decay):
    credit halves per day of touch age via exact power-of-two integer
    weights (no exp()), normalized per conversion by the same
    floor-divided integer micro-cent device as the linear model.
    Oracle replays the band join, the weight shift, and the floor
    division."""
    from feat_spark.operators.attribution import attribute_time_decay

    return attribute_time_decay(_events(spark, sf_dir), lookback_s=7 * 86400)


def _q_stream_topk(spark, sf_dir):
    """Streaming gate: maintained Count-Min heavy hitters
    (pipeline.stream_maintain_cms + cms_state_topk) — a 2-micro-batch
    stream folds into the mergeable CMS grid + candidate key set via
    foreachBatch merge+atomic-swap; because CMS merges by addition the
    final state equals the one-shot sketch, so the oracle replays the
    full-input sketch and the (est desc, key asc) top-20."""
    import uuid

    from feat_spark.streaming.pipeline import (
        cms_state_topk,
        stream_maintain_cms,
    )

    e = _events(spark, sf_dir).select(
        "event_id", "user_id",
        F.col("ts").cast("timestamp").alias("ts"),
    )
    pdf = e.toPandas().sort_values(["ts", "event_id"]).reset_index(drop=True)
    if getattr(pdf["ts"].dtype, "tz", None) is None:
        pdf["ts"] = pdf["ts"].dt.tz_localize("UTC")
    cut = len(pdf) // 2
    d = _stream_scratch("cmsstream")
    tgt = os.path.join(_stream_scratch("cmstarget"), "state")
    pq_opts = dict(index=False, coerce_timestamps="us",
                   allow_truncated_timestamps=True)
    pdf.iloc[:cut].to_parquet(os.path.join(d, "part1.parquet"), **pq_opts)
    pdf.iloc[cut:].to_parquet(os.path.join(d, "part2.parquet"), **pq_opts)
    _space_mtimes(d, ["part1.parquet", "part2.parquet"])
    stream = (
        spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    stream_maintain_cms(stream, tgt, "user_id", depth=4, width=256)
    return cms_state_topk(spark, tgt, k=20, depth=4, width=256)


def _q_proportion_ci(spark, sf_dir):
    """Wilson score intervals (experiment.proportion_ci) for the
    purchase rate per user_id%5 segment — the proportions-inference
    primitive beside welch_ttest: fixed-order closed form over exact
    (x, n), IEEE sqrt, clamped to [0,1], 9dp. Oracle replays the
    identical expression tree."""
    from feat_spark.operators.experiment import proportion_ci

    e = _events(spark, sf_dir).select(
        (F.col("user_id") % 5).alias("segment"),
        (F.col("event_type") == "purchase").alias("converted"),
    )
    return proportion_ci(e, "segment", "converted")


def _q_eb_shrink(spark, sf_dir):
    """Empirical-Bayes rate shrinkage (encoding.eb_shrink_rates): per-
    user purchase rates pulled toward a method-of-moments beta prior
    whose strength the corpus chooses; moments accumulate as
    1e-12-quantized decimal integers (the deterministic contract),
    shrunk rate closes from the ROUNDED prior columns. Oracle replays
    quantization, moments, and the closed form."""
    from feat_spark.operators.encoding import eb_shrink_rates

    e = _events(spark, sf_dir).select(
        "user_id",
        (F.col("event_type") == "purchase").alias("converted"),
    )
    return eb_shrink_rates(e, "user_id", "converted")


def _q_l_diversity(spark, sf_dir):
    """l-diversity audit (audit.l_diversity_audit): (user_id,
    event_type) quasi groups whose floor(value/50) sensitive bucket is
    homogeneous (< 2 distinct values) — the homogeneity-attack report
    k-anonymity misses, with exact majority share. Oracle replays the
    two-level agg."""
    from feat_spark.plans.audit import l_diversity_audit

    e = _events(spark, sf_dir).select(
        "user_id",
        "event_type",
        F.floor(F.col("value") / 50).cast("long").alias("value_bucket"),
    )
    return l_diversity_audit(
        e, ["user_id", "event_type"], "value_bucket", l=2
    )


def _q_neyman_allocation(spark, sf_dir):
    """Neyman-optimal sample allocation (sampling.neyman_allocation)
    of a 1000-row budget across event_type strata: exact decimal
    variance numerators, one IEEE sqrt per stratum, the irrational
    normalizer via the sorted-fold device over the bounded stratum
    list, floor allocations. Oracle replays the fold with
    list_reduce."""
    from feat_spark.operators.sampling import neyman_allocation

    e = _events(spark, sf_dir).select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    return neyman_allocation(e, "event_type", "cents", budget=1000)


def _q_rolling_hll_users(spark, sf_dir):
    """Rolling 7-day approximate actives (profile.rolling_hll_distinct):
    daily HLL leaf sketches band-joined onto the day spine (constant
    fan-out 7) and union-merged per day — the sketch answer to WAU
    that scans data once; exact rolling distinct rides along for the
    oracle-bounded check (the _q_sketches device)."""
    from feat_spark.operators.profile import rolling_hll_distinct

    e = _events(spark, sf_dir)
    return rolling_hll_distinct(
        e,
        F.expr("unix_micros(cast(ts as timestamp)) div 86400000000"),
        "user_id",
        window_days=7,
    )


def _q_reset_cumsum(spark, sf_dir):
    """Running balance with resets (rolling.reset_cumsum): per-user
    cent cumsum that restarts at every signup event — two stacked
    windows sharing one partition sort (segment = running reset
    count, balance = within-segment cumsum), exact integers. Oracle
    replays both ROWS frames."""
    from feat_spark.operators.rolling import reset_cumsum

    e = _events(spark, sf_dir).select(
        "user_id", "ts", "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        (F.col("event_type") == "signup").alias("is_reset"),
    )
    return reset_cumsum(
        e, "user_id", "ts", "event_id", "cents", "is_reset"
    )


def _q_pareto_frontier(spark, sf_dir):
    """Per-brand Pareto frontier (profile.pareto_frontier) of parts on
    (size, retailprice), both-higher-better: the single-window skyline
    sweep — keep a row iff its y beats the running max over the
    (x desc, y desc, id) order; no self-join. Oracle replays the same
    frame."""
    from feat_spark.operators.profile import pareto_frontier

    p = _t(spark, sf_dir, "part")
    return pareto_frontier(
        p, ("p_brand",), "p_size", "p_retailprice", "p_partkey"
    )


def _q_ratio_metric_ci(spark, sf_dir):
    """Delta-method ratio-metric CI (experiment.ratio_metric_ci) for
    purchases-per-event under USER-cluster randomization: per-cluster
    sums, five exact decimal moments, linearized variance in fixed op
    order, one sqrt. The interval a row-level binomial would get
    confidently wrong. Oracle replays the moments and the closed
    form."""
    from feat_spark.operators.experiment import ratio_metric_ci

    e = _events(spark, sf_dir).select(
        "user_id",
        (F.col("event_type") == "purchase").cast("long").alias("x"),
        F.lit(1).alias("n"),
    )
    return ratio_metric_ci(e, "user_id", "x", "n")


def _q_conformal_calibration(spark, sf_dir):
    """Split-conformal coverage audit (experiment.conformal_calibration)
    per user_id%5 segment at alpha=0.1: md5 even/odd split, segment-
    mean predictor from the calibration half, rank-selected q-hat
    residual, achieved test coverage vs the 0.9 target. Per-group
    window only — no global sort. Oracle replays split, ranks, and
    coverage."""
    from feat_spark.operators.experiment import conformal_calibration

    e = _events(spark, sf_dir).select(
        (F.col("user_id") % 5).alias("segment"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        "event_id",
    )
    return conformal_calibration(
        e, "segment", "cents", "event_id", alpha_milli=100
    )


def _q_feature_freshness(spark, sf_dir):
    """Feature-freshness SLO report (features.freshness_slo): the
    as-of enrichment's staleness distribution per user_id%5 segment —
    match rate, mean whole-day staleness (one exact division), share
    within a 7-day SLO. The operational complement of leakage_audit
    (never-negative is proven there; how-positive is reported here).
    Oracle = DuckDB ASOF join + the same ratios."""
    from feat_spark.plans.features import freshness_slo

    left = _events(spark, sf_dir).select(
        "event_id", "user_id", "ts", (F.col("user_id") % 5).alias("segment")
    )
    return freshness_slo(
        left, _orders_rhs(spark, sf_dir), on="user_id",
        segment_col="segment", slo_days=7,
    )


def _q_rbo_rankings(spark, sf_dir):
    """Rank-biased overlap (keywords.rbo_rankings) between each user's
    count-ranked and spend-ranked event-type top-5 lists: p=1/2 makes
    every weight dyadic, so the truncated renormalized RBO scales to
    exact integers (960/240/80/30/12 per depth) and closes with one
    division by 1860. Oracle replays both rankings and the tail-weight
    fold."""
    from feat_spark.operators.keywords import rbo_rankings

    cnt = (
        _events(spark, sf_dir)
        .groupBy("user_id", "event_type")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("s"),
        )
    )
    wa = Window.partitionBy("user_id").orderBy(
        F.col("c").desc(), F.col("event_type").asc()
    )
    wb = Window.partitionBy("user_id").orderBy(
        F.col("s").desc(), F.col("event_type").asc()
    )
    a = cnt.select(
        F.col("user_id").alias("query_id"),
        F.col("event_type").alias("item"),
        F.row_number().over(wa).alias("rank"),
    )
    b = cnt.select(
        F.col("user_id").alias("query_id"),
        F.col("event_type").alias("item"),
        F.row_number().over(wb).alias("rank"),
    )
    return rbo_rankings(a, b, depth=5)


def _q_seasonal_outliers(spark, sf_dir):
    """Season-aware anomaly flags (resample.seasonal_outliers): the
    decomposition remainders scored against their median ± 3·MAD band,
    both robust statistics as exact rank selections over the bounded
    day series (two global windows + two 1-row broadcast medians — the
    cuped crossJoin class). Oracle replays decomposition, both rank
    selections, and the flag."""
    from feat_spark.operators.resample import seasonal_outliers

    e = _events(spark, sf_dir)
    daily = e.groupBy(
        F.expr("unix_micros(cast(ts as timestamp)) div 86400000000").alias(
            "day"
        )
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"))
    return seasonal_outliers(daily, "day", "cents", period=7, k_mad=3.0)


def _q_quantile_treatment(spark, sf_dir):
    """Quantile treatment effects (experiment.quantile_treatment_effect)
    between even/odd user arms at p10/p50/p90: percentile_disc-style
    rank selections per arm (exact cents in, exact cents out, no
    interpolation), QTE = integer subtraction. The heavy-tail readout
    welch_ttest can't see. Oracle replays ranks and targets."""
    from feat_spark.operators.experiment import quantile_treatment_effect

    e = _events(spark, sf_dir).select(
        F.when(F.col("user_id") % 2 == 0, F.lit("a"))
        .otherwise(F.lit("b"))
        .alias("arm"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    return quantile_treatment_effect(
        e, "arm", "cents", percentiles_milli=(100, 500, 900)
    )


def _q_restatement_plan(spark, sf_dir):
    """Late-data restatement planning (incremental.restatement_plan):
    a simulated late batch (1-in-10 events, half shifted onto brand-new
    days) against the on-time daily state — which partitions the merge
    touches, how many rows/keys, appends vs rewrites. The
    merge-on-read blast-radius report. Oracle replays grain and the
    membership flag."""
    from feat_spark.plans.incremental import restatement_plan

    e = _events(spark, sf_dir).select(
        "event_id", "user_id",
        F.expr("unix_micros(cast(ts as timestamp)) div 86400000000").alias(
            "day"
        ),
    )
    state = e.filter(F.col("event_id") % 10 != 0).select("day")
    late = e.filter(F.col("event_id") % 10 == 0).select(
        (F.col("day") + (F.col("user_id") % 2) * 40).alias("day"),
        F.col("user_id").alias("key"),
    )
    return restatement_plan(state, late, partition_col="day")


def _q_interval_align(spark, sf_dir):
    """Interval-overlap alignment (eventops.interval_align): per-user
    daily activity spans crossed with 4-hour post-purchase campaign
    windows — overlap microseconds under half-open semantics, the
    time-weighted attribution primitive. Equi-join on user + the
    overlap band; fan-out bounded per key. Oracle replays the band
    join."""
    from feat_spark.operators.eventops import interval_align

    e = _events(spark, sf_dir)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    left = e.groupBy(
        "user_id",
        F.expr("unix_micros(cast(ts as timestamp)) div 86400000000").alias(
            "__day"
        ),
    ).agg(
        F.min(us).alias("l_start"), (F.max(us) + 1).alias("l_end")
    )
    right = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        us.alias("r_start"),
        (us + 4 * 3600 * 1_000_000).alias("r_end"),
    )
    return interval_align(left, right, "user_id")


def _q_dwell_attribution(spark, sf_dir):
    """Time-spent attribution (eventops.dwell_attribution): each event
    owns the capped gap to the user's next event (30-min cap; final
    events own nothing — unobserved, excluded), rolled up per type
    with corpus share. One lead per user partition. Oracle replays
    lead, cap, and the share."""
    from feat_spark.operators.eventops import dwell_attribution

    return dwell_attribution(
        _events(spark, sf_dir), "user_id", "event_type", cap_s=1800
    )


def _q_benford_audit(spark, sf_dir):
    """Benford first-digit audit (profile.benford_audit) of event
    cents: leading digit by STRING arithmetic (no log10 at query
    time), baked-in expected probabilities, per-digit chi-square
    contributions from exact counts. The fabricated-data tripwire —
    the report says WHICH digits deviate. Oracle replays digits,
    shares, and the chi2 terms."""
    from feat_spark.operators.profile import benford_audit

    e = _events(spark, sf_dir).select(
        F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    return benford_audit(e, "cents")


def _q_salt_advisor(spark, sf_dir):
    """Salting prescription (salted.salt_advisor): top-10 heaviest
    user keys with the exact ceil-division salt factor that caps a
    salted task at 50 rows (sf-scaled target), and the needs-salt
    verdict — skew_report's diagnosis turned into the number the fix
    needs. Oracle replays the top-k and the ceil division."""
    from feat_spark.operators.salted import salt_advisor

    return salt_advisor(
        _events(spark, sf_dir), "user_id",
        target_rows_per_task=50, top_k=10,
    )


def _q_python_datasource(spark, sf_dir):
    """Custom Python DataSource (sources/pysource.py, the Spark-4
    user-defined source API): a planned, partitioned scan whose rows
    are a pure md5 function of the row id — 5000 rows over 8
    InputPartitions, summarized per bucket%10 residue. The oracle
    replays the ENTIRE source with generate_series + md5, so the gate
    hash-matches actual read results, not shapes."""
    from feat_spark.sources.pysource import register

    register(spark)
    df = (
        spark.read.format("feat_synth")
        .option("n", "5000")
        .option("partitions", "8")
        .option("width", "1000")
        .load()
    )
    return df.groupBy((F.col("bucket") % 10).alias("residue")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("id").alias("id_sum"),
        F.count_distinct("bucket").alias("n_buckets"),
    )


def _q_variant_extract(spark, sf_dir):
    """Spark-4 VariantType extraction (semistructured.variant_features):
    props parsed ONCE via try_parse_json (1-in-10 rows deliberately
    truncated to exercise the malformed->NULL path, never an ANSI
    abort), typed try_variant_get probes for a present int field and
    an absent one. Oracle replays with DuckDB's JSON probes + a
    json-validity twin."""
    from feat_spark.operators.semistructured import variant_features

    e = _events(spark, sf_dir)
    mangled = F.when(
        F.col("event_id") % 10 == 0,
        F.expr("substring(props, 1, length(props) - 1)"),
    ).otherwise(F.col("props"))
    d = e.select("event_id", mangled.alias("j"))
    feats = variant_features(
        "j", {"k": ("$.k", "int"), "absent": ("$.nope", "string")}
    )
    return d.select(
        "event_id",
        feats["k"].alias("k"),
        feats["absent"].alias("absent"),
        feats["is_valid_json"].alias("is_valid_json"),
    )


def _q_seasonal_naive(spark, sf_dir):
    """Seasonal-naive forecast baseline (resample.seasonal_naive_eval):
    forecast(d) = actual(d-7) via a calendar self-equi-join (holes
    mean no forecast, not a shifted one), scored with exact-integer
    MAE/bias and a 1e-9-quantized sMAPE sum. The baseline every model
    must beat. Oracle replays join, quantization, and closes."""
    from feat_spark.operators.resample import seasonal_naive_eval

    e = _events(spark, sf_dir)
    daily = e.groupBy(
        F.expr("unix_micros(cast(ts as timestamp)) div 86400000000").alias(
            "day"
        )
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"))
    return seasonal_naive_eval(daily, "day", "cents", period=7)


def _q_gap_sensitivity(spark, sf_dir):
    """Session-gap tuning readout (eventops.gap_sensitivity): session
    counts at 15/30/60-minute candidate gaps from ONE lead pass —
    n_sessions(g) = n_users + #(gaps > g) — instead of one sessionizer
    shuffle per candidate. Oracle replays the lag and the conditional
    counts."""
    from feat_spark.operators.eventops import gap_sensitivity

    return gap_sensitivity(
        _events(spark, sf_dir), "user_id", gaps_s=(900, 1800, 3600)
    )


def _q_markov_accuracy(spark, sf_dir):
    """Next-event predictability (eventops.markov_accuracy): a
    first-order Markov argmax predictor trained on even-day
    transitions, scored on odd-day transitions per source state —
    the transition matrix's evaluation companion. Deterministic
    (count desc, next asc) argmax; broadcast prediction join. Oracle
    replays split, argmax, and accuracy."""
    from feat_spark.operators.eventops import markov_accuracy

    return markov_accuracy(_events(spark, sf_dir), "user_id", "event_type")


def _q_dup_matrix(spark, sf_dir):
    """Cross-source duplication matrix (dedup.dup_source_matrix):
    documents plus a planted 'mirror' source (1-in-3 docs copied, and
    1-in-9 copied twice so within-mirror cells exist) — exact-dup
    PAIRS per source pair from hash-grain integer algebra (n_a*n_b
    across, n(n-1)/2 within), never a record-level pair join. Oracle
    replays plants, grains, and the cell algebra."""
    from feat_spark.operators.dedup import dup_source_matrix

    d = _t(spark, sf_dir, "documents").select("doc_id", "text", "source")
    m1 = d.filter(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        "text",
        F.lit("mirror").alias("source"),
    )
    m2 = d.filter(F.col("doc_id") % 9 == 0).select(
        (F.col("doc_id") + 300000).alias("doc_id"),
        "text",
        F.lit("mirror").alias("source"),
    )
    allr = d.unionByName(m1).unionByName(m2)
    return dup_source_matrix(allr, "doc_id", "text", "source")


def _q_asof_lastk(spark, sf_dir):
    """Last-k history as-of join (eventops.asof_lastk): each event
    carries the cents of its user's last THREE orders at event time —
    the right side precomputes its own lag chain (no growing arrays),
    then ONE ordinary as-of join carries it across; every lastN is
    strictly older than the match itself. Oracle = rhs lag window +
    DuckDB ASOF join."""
    from feat_spark.operators.eventops import asof_lastk

    left = _events(spark, sf_dir).select("event_id", "user_id", "ts")
    rhs = _orders_rhs(spark, sf_dir).select(
        "user_id",
        "ts",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    j = asof_lastk(left, rhs, on="user_id", value_col="cents", k=3)
    return j.select("event_id", "user_id", "last1", "last2", "last3")


def _q_map_at_k(spark, sf_dir):
    """Mean-average-precision@5 (keywords.map_at_k) of each user's
    count-ranked event-type list against >=3-count relevance: every
    precision@r scales by lcm(1..5)=60 into exact integers, one
    closing division per query. The order-sensitive retrieval metric
    beside ndcg and rbo. Oracle replays ranks, hits, and the scaled
    fold."""
    from feat_spark.operators.keywords import map_at_k

    cnt = (
        _events(spark, sf_dir)
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("c").desc(), F.col("event_type").asc()
    )
    ranked = cnt.select(
        F.col("user_id").alias("query_id"),
        F.col("event_type").alias("item"),
        F.row_number().over(w).alias("rank"),
    )
    truth = cnt.filter(F.col("c") >= 3).select(
        F.col("user_id").alias("query_id"),
        F.col("event_type").alias("item"),
    )
    return map_at_k(ranked, truth, k=5)


def _q_km_expected_life(spark, sf_dir):
    """Restricted mean survival time (labels.km_expected_life): the
    area under the km_curve gate's survival curve up to 72h — the
    censoring-honest "expected hours to purchase" feature; piece areas
    summed by the sorted-fold device over the bounded spine. Oracle
    extends the km oracle with the same fold."""
    from feat_spark.operators.labels import (
        km_curve,
        km_expected_life,
        time_to_event,
    )

    e = _events(spark, sf_dir)
    tte = time_to_event(
        e,
        entity_col="user_id",
        ts_col="ts",
        id_col="event_id",
        target_filter=F.col("event_type") == "purchase",
        horizon_sec=259200,
    )
    hours = tte.select(
        (F.col("tte_sec") / 3600).cast("long").alias("t_hr"), "observed"
    )
    km = km_curve(hours, duration_col="t_hr", observed_col="observed")
    return km_expected_life(km, horizon=72)


def _q_harmonic_2hop(spark, sf_dir):
    """Radius-2 harmonic centrality (graph.harmonic_2hop) on the
    adamic_adar gate's 1-in-7 incidence slice: 2H = 2*n1 + n2 exact
    integers from the hub-capped wedge join, distance-2 candidates
    anti-joined and deduped, one division at readout. Oracle replays
    wedges, the anti join, and the closed form."""
    from feat_spark.operators.graph import harmonic_2hop

    e = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 7 == 0)
        .select(
            (F.col("l_orderkey") * 2).alias("src"),
            (F.col("l_partkey") * 2 + 1).alias("dst"),
        )
    )
    return harmonic_2hop(e)


def _q_pacing_curve(spark, sf_dir):
    """Intraday pacing curve (profile.pacing_curve): hour-of-day spend
    shares and the cumulative pacing CDF from exact cent sums — the
    baseline budget pacers alert against. 24-row window. Oracle
    replays both ratios."""
    from feat_spark.operators.profile import pacing_curve

    return pacing_curve(_events(spark, sf_dir))


def _q_simpsons_check(spark, sf_dir):
    """Simpson's-paradox detector (experiment.simpsons_check): pooled
    vs per-event-type A/B rate comparison via cross-multiplied exact
    integers (no rate division anywhere); flags when opposing strata
    outnumber agreeing ones. The sign-flip audit beside mix_shift.
    Oracle replays the cross-multiplications and the sign census."""
    from feat_spark.operators.experiment import simpsons_check

    e = _events(spark, sf_dir).select(
        "event_type",
        F.when(F.col("user_id") % 2 == 0, F.lit("a"))
        .otherwise(F.lit("b"))
        .alias("arm"),
        (F.col("value") >= 20).cast("long").alias("y"),
    )
    return simpsons_check(e, "event_type", "arm", "y")


def _q_quantile_forecast(spark, sf_dir):
    """Trailing-quantile forecast scorecard (resample
    .quantile_forecast_eval): each day forecast as the tau-quantile of
    the trailing 7 daily cent totals (bounded sorted-array rank
    selection), scored with EXACT integer pinball loss in milli-tau
    units plus coverage — the proper scoring rule for p10/p50/p90
    forecasts. Oracle replays windows, ranks, and the loss."""
    from feat_spark.operators.resample import quantile_forecast_eval

    e = _events(spark, sf_dir)
    daily = e.groupBy(
        F.expr("unix_micros(cast(ts as timestamp)) div 86400000000").alias(
            "day"
        )
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"))
    return quantile_forecast_eval(
        daily, "day", "cents", taus_milli=(100, 500, 900)
    )


def _q_embedding_health(spark, sf_dir):
    """Embedding-column health audit (vectors.embedding_health) over
    the corpus plus planted failures (5 NULL vectors, 5 zero vectors):
    NULL/zero/dimension-drift counts and exact rank-selected norm2
    percentiles; per-row norm2 is a sequential array fold both engines
    replay bit-for-bit. Oracle replays plants, folds, and ranks."""
    from feat_spark.operators.vectors import embedding_health

    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    nulls = e.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.lit(None).cast("array<float>").alias("embedding"),
    )
    zeros = e.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 20000).alias("vec_id"),
        F.array_repeat(F.lit(0.0).cast("float"), 64).alias("embedding"),
    )
    allr = e.unionByName(nulls).unionByName(zeros)
    return embedding_health(allr, "embedding", "vec_id")


def _q_class_balance(spark, sf_dir):
    """Deterministic class rebalancing (sampling.class_balance_sample):
    keep every purchase row, hash-thin the majority to the minority
    count in expectation — md5(id) % n_major < n_minor, a pure scan
    filter with a 1-row broadcast of exact class counts; reproducible
    on any cluster. Oracle replays counts and the keep rule."""
    from feat_spark.operators.sampling import class_balance_sample

    e = _events(spark, sf_dir).select(
        "event_id",
        (F.col("event_type") == "purchase").cast("long").alias("label"),
    )
    out = class_balance_sample(e, "label", "event_id")
    return out.select("event_id", "label")


def _q_holiday_distance(spark, sf_dir):
    """Signed days to the nearest holiday (encoding.holiday_distance):
    argmin over (|d|, d) structs folded from a literal calendar — pure
    codegen, ties resolve to the ahead side in both engines'
    lexicographic struct order. Oracle replays via unnest + struct
    min."""
    from feat_spark.operators.encoding import holiday_distance

    e = _events(spark, sf_dir)
    return e.select(
        "event_id",
        holiday_distance(
            e, "ts", ["2024-01-01", "2024-01-15", "2024-02-14"]
        ).alias("days_to_holiday"),
    )


def _q_encoding_audit(spark, sf_dir):
    """Text-encoding corruption audit (text.encoding_counts) per
    source, with planted corruption (1-in-10 docs get a replacement
    char, 1-in-7 a Latin-1 double-encoding digraph): replacement /
    control / mojibake match counts and the flagged-doc tally — the
    crawl-hygiene gate before dedup hashes diverge on mojibake
    variants. Patterns carry literal characters (RE2 has no \\uXXXX),
    so both engines match identically; the oracle builds the same
    characters with chr()."""
    from feat_spark.functions.text import encoding_counts

    d = _t(spark, sf_dir, "documents")
    t = F.col("text")
    t = F.when(F.col("doc_id") % 10 == 0, F.concat(t, F.lit("\uFFFD"))).otherwise(t)
    t = F.when(
        F.col("doc_id") % 7 == 0, F.concat(t, F.lit("\u00C3\u00A9"))
    ).otherwise(t)
    base = d.select("doc_id", "source", t.alias("t"))
    c = encoding_counts("t")
    rows = base.select(
        "source",
        c["n_replacement"].alias("__r"),
        c["n_control"].alias("__c"),
        c["n_mojibake"].alias("__m"),
    )
    return rows.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__r").alias("n_replacement"),
        F.sum("__c").alias("n_control"),
        F.sum("__m").alias("n_mojibake"),
        F.sum(
            ((F.col("__r") + F.col("__c") + F.col("__m")) > 0).cast("long")
        ).alias("n_flagged"),
    )


def _q_time_to_nth(spark, sf_dir):
    """Time-to-THIRD-purchase labels (labels.time_to_nth_event): the
    repeat-behavior label beyond first-occurrence time_to_event — the
    target-only frame precomputes its lead chain over distinct
    purchase times, one forward as-of join attaches the tail; beyond
    horizon or fewer than 3 future purchases censors at the horizon.
    Oracle = the lead chain + DuckDB forward ASOF."""
    from feat_spark.operators.labels import time_to_nth_event

    return time_to_nth_event(
        _events(spark, sf_dir),
        entity_col="user_id",
        ts_col="ts",
        id_col="event_id",
        target_filter=F.col("event_type") == "purchase",
        n=3,
        horizon_sec=259200,
    )


def _q_mrr_at_k(spark, sf_dir):
    """Reciprocal rank @5 (keywords.mrr_at_k) of the map_at_k gate's
    rankings and relevance: RR scales by lcm(1..5)=60 into the exact
    integer 60/first_hit_rank, one closing division; missed queries
    carry 0.0 and success_at_k=false. Oracle replays the first-hit
    min and the scaled table."""
    from feat_spark.operators.keywords import mrr_at_k

    cnt = (
        _events(spark, sf_dir)
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("c").desc(), F.col("event_type").asc()
    )
    ranked = cnt.select(
        F.col("user_id").alias("query_id"),
        F.col("event_type").alias("item"),
        F.row_number().over(w).alias("rank"),
    )
    truth = cnt.filter(F.col("c") >= 3).select(
        F.col("user_id").alias("query_id"),
        F.col("event_type").alias("item"),
    )
    return mrr_at_k(ranked, truth, k=5)


def _q_cms_join_size(spark, sf_dir):
    """Sketch-based join-size estimation (cms.countmin_join_size): the
    AGMS/CM inner-product estimate of |events ⋈ orders| on the user
    key from two d=4 x w=128 grids — min over seeds of the bucket
    inner products, one-sided (collisions only add), with the exact
    key-grain join size riding along. Portable md5 buckets: the
    oracle replays BOTH grids and the inner products."""
    from feat_spark.operators.cms import countmin_join_size

    e = _events(spark, sf_dir)
    o = _t(spark, sf_dir, "orders")
    return countmin_join_size(
        e, o, "user_id", "o_custkey", depth=4, width=128
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # ROTATION POLICY (the driver checks only the FIRST 50 entries):
    # least-recently-driver-checked first, and any query whose code or
    # oracle was touched this round moves into the window regardless.
    # ROUND-5 WINDOW (cuts after `cohort_ltv`, position 50):
    #   (1) positions 1-4: the four r4-red gates, re-projected this
    #       round (calendar_features -0.0 oracle normalization;
    #       table_fingerprint string checksum; random_projection
    #       posexplode; snapshot_diff concat_ws) — red rows must turn
    #       green before anything else counts;
    #   (2) positions 5-11: the seven streaming micro-batch gates
    #       (front-loaded per the r4 verdict: they run real
    #       foreachBatch/watermark micro-batches and are the likeliest
    #       to diverge under the driver's environment);
    #   (3) positions 12-50: the 39 OLDEST never-driver-checked late-r4
    #       gates in build order (scd2_build..cohort_ltv, skipping the
    #       streaming gates already placed).
    # Coverage arithmetic: 46 of the 50 slots are never-driver-checked
    # gates, so the never-checked backlog drops 166 -> 120 this round
    # (the r4 verdict asked for <=116, i.e. 50 never-checked slots, AND
    # for the 4 red re-checks AND the 7 streaming gates — 4+7+39 is the
    # max that satisfies the red-fix and streaming done-bars, which
    # rank first; the 4-slot difference queues for r6). All 46 new
    # window entrants passed the new DRIVER-PARITY strict selfcheck
    # (--strict: float bit-pattern compare, array/struct/map output
    # rejection, wide-decimal rejection) at sf0.01 this session.
    # REGISTRY GROWTH IS FROZEN this round (r4 verdict #4): no new
    # gates; every slot goes to coverage debt.
    # ROUND-6 QUEUE, in order: positions 51-170 = the remaining 120
    # never-checked late-r4 gates in build order (wow_change..
    # cms_join_size); then semantic_dedup / knn_cosine_ivf (r3-green,
    # code touched r4+r5 — knn_cosine_ivf gets the SQ8 probe this
    # round, keep it early in r6); then the 46 r4-green window gates;
    # then the r2-green refill and trailers; r3-green blocks hold.
    return {
        # --- (1) r4-red gates, fixed this round ----------------------
        "calendar_features": _q_calendar_features,
        "table_fingerprint": _q_table_fingerprint,
        "random_projection": _q_random_projection,
        "snapshot_diff": _q_snapshot_diff,
        # --- (2) streaming micro-batch gates (never driver-checked) --
        "stream_cdc": _q_stream_cdc,
        "stream_rollup": _q_stream_rollup,
        "stream_tumbling": _q_stream_tumbling,
        "stream_sessionize": _q_stream_sessionize,
        "stream_interval_join": _q_stream_interval_join,
        "stream_topk": _q_stream_topk,
        "stream_novelty": _q_stream_novelty,
        # --- (3) oldest never-driver-checked late-r4 gates -----------
        "scd2_build": _q_scd2_build,
        "tree_ancestry": _q_tree_ancestry,
        "containment_pairs": _q_containment_pairs,
        "prefix_filter_pairs": _q_prefix_filter_pairs,
        "bpe_pair_counts": _q_bpe_pairs,
        "source_kl": _q_source_kl,
        "weighted_median": _q_weighted_median,
        "ks_test": _q_ks_test,
        "mutual_information": _q_mutual_information,
        "semantic_decontamination": _q_semantic_decontam,
        "rare_category_collapse": _q_rare_collapse,
        "woe_encode": _q_woe_encode,
        "session_ngrams": _q_session_ngrams,
        "inverted_index": _q_inverted_index,
        "autocorr": _q_autocorr,
        "triangle_count": _q_triangle_count,
        "quantize_embeddings": _q_quantize_embeddings,
        "calibration_curve": _q_calibration_curve,
        "chi2_assoc": _q_chi2_assoc,
        "rrf_fusion": _q_rrf_fusion,
        "upsert_latest": _q_upsert_latest,
        "context_window": _q_context_window,
        "cross_correlation": _q_cross_correlation,
        "phrase_search": _q_phrase_search,
        "seasonal_anomaly": _q_seasonal_anomaly,
        "skipgram_pairs": _q_skipgram_pairs,
        "attribution": _q_attribution,
        "changepoint_scan": _q_changepoint_scan,
        "rfm_segments": _q_rfm_segments,
        "group_auc": _q_group_auc,
        "label_churn": _q_label_churn,
        "compaction_plan": _q_compaction_plan,
        "basket_rules": _q_basket_rules,
        "expectations": _q_expectations,
        "json_extract": _q_json_extract,
        "split_leakage": _q_split_leakage,
        "business_days": _q_business_days,
        "rank_normalize": _q_rank_normalize,
        "cohort_ltv": _q_cohort_ltv,
        # =========== WINDOW CUTS HERE (position 50) ==================
        # --- remaining never-driver-checked late-r4 gates (r6 queue,
        # --- build order) --------------------------------------------
        "wow_change": _q_wow_change,
        "cluster_medoids": _q_cluster_medoids,
        "zorder": _q_zorder,
        "prune_files": _q_prune_files,
        "seq_pattern": _q_seq_pattern,
        "hourly_profile": _q_hourly_profile,
        "gini": _q_gini,
        "centroid_distances": _q_centroid_distances,
        "funnel_latency": _q_funnel_latency,
        "zipf_fit": _q_zipf_fit,
        "standardized_rates": _q_standardized_rates,
        "confusion_stats": _q_confusion_stats,
        "time_weighted_avg": _q_time_weighted_avg,
        "two_hop_reach": _q_two_hop,
        "burstiness": _q_burstiness,
        "weighted_topk": _q_weighted_topk_sample,
        "fd_check": _q_fd_check,
        "lorenz": _q_lorenz,
        "jsonl_roundtrip": _q_jsonl_roundtrip,
        "cast_audit": _q_cast_audit,
        "cohens_kappa": _q_cohens_kappa,
        "vacuum_plan": _q_vacuum_plan,
        "debounce": _q_debounce,
        "neighbor_majority": _q_neighbor_majority,
        "split_balance": _q_split_balance,
        "assortativity": _q_assortativity,
        "ndcg": _q_ndcg,
        "sequential_ids": _q_sequential_ids,
        "bloom_semi_join": _q_bloom_semi_join,
        "adamic_adar": _q_adamic_adar,
        "embedding_covariance": _q_embedding_covariance,
        "interpolate_daily": _q_interpolate_daily,
        "rendezvous_shards": _q_rendezvous,
        "kcore": _q_kcore,
        "segment_overlap": _q_segment_overlap,
        "entity_resolution": _q_entity_resolution,
        "hash_features": _q_hash_features,
        "join_cardinality": _q_join_cardinality,
        "k_anonymity": _q_k_anonymity,
        "rolling_corr": _q_rolling_corr,
        "incremental_rollup": _q_incremental_rollup,
        "bitmap_overlap": _q_bitmap_overlap,
        "time_travel": _q_time_travel,
        "sql_surface": _q_sql_surface,
        "arrow_features": _q_arrow_features,
        "stratified_kfold": _q_stratified_kfold,
        "did_readout": _q_did_readout,
        "centroid_drift": _q_centroid_drift,
        "frame_sample_plan": _q_frame_sample_plan,
        "dedup_report": _q_dedup_report,
        "stickiness": _q_stickiness,
        "dow_seasonality": _q_dow_seasonality,
        "daily_bands": _q_daily_bands,
        "scd_overlap_audit": _q_scd_overlap,
        "window_funnel": _q_window_funnel,
        "growth_accounting": _q_growth_accounting,
        "theilsen_trend": _q_theilsen_trend,
        "nelson_aalen": _q_nelson_aalen,
        "item_similarity": _q_item_similarity,
        "hll_mergeable": _q_hll_mergeable,
        "recency_features": _q_recency_features,
        "clustering_coeff": _q_clustering_coeff,
        "countmin_topk": _q_countmin_topk,
        "gains_deciles": _q_gains_deciles,
        "brier_scores": _q_brier_scores,
        "pr_thresholds": _q_pr_thresholds,
        "ols2_fit": _q_ols2,
        "link_jaccard": _q_link_jaccard,
        "leakage_screen": _q_leakage_screen,
        "top_paths": _q_top_paths,
        "peak_concurrency": _q_peak_concurrency,
        "oof_target_encode": _q_oof_target_encode,
        "stream_enrich": _q_stream_enrich,
        "seasonal_decompose": _q_seasonal_decompose,
        "blocking_quality": _q_blocking_quality,
        "schema_evolution": _q_schema_evolution,
        "url_parse": _q_url_parse,
        "hdr_percentiles": _q_hdr_percentiles,
        "rand_index": _q_rand_index,
        "mix_shift": _q_mix_shift,
        "gap_streaks": _q_gap_streaks,
        "attribution_decay": _q_attribution_decay,
        "proportion_ci": _q_proportion_ci,
        "eb_shrink_rates": _q_eb_shrink,
        "l_diversity": _q_l_diversity,
        "neyman_allocation": _q_neyman_allocation,
        "rolling_hll_users": _q_rolling_hll_users,
        "reset_cumsum": _q_reset_cumsum,
        "pareto_frontier": _q_pareto_frontier,
        "ratio_metric_ci": _q_ratio_metric_ci,
        "conformal_calibration": _q_conformal_calibration,
        "feature_freshness": _q_feature_freshness,
        "rbo_rankings": _q_rbo_rankings,
        "seasonal_outliers": _q_seasonal_outliers,
        "quantile_treatment": _q_quantile_treatment,
        "restatement_plan": _q_restatement_plan,
        "interval_align": _q_interval_align,
        "dwell_attribution": _q_dwell_attribution,
        "benford_audit": _q_benford_audit,
        "salt_advisor": _q_salt_advisor,
        "python_datasource": _q_python_datasource,
        "variant_extract": _q_variant_extract,
        "seasonal_naive": _q_seasonal_naive,
        "gap_sensitivity": _q_gap_sensitivity,
        "markov_accuracy": _q_markov_accuracy,
        "dup_matrix": _q_dup_matrix,
        "asof_lastk": _q_asof_lastk,
        "map_at_k": _q_map_at_k,
        "km_expected_life": _q_km_expected_life,
        "harmonic_2hop": _q_harmonic_2hop,
        "pacing_curve": _q_pacing_curve,
        "simpsons_check": _q_simpsons_check,
        "quantile_forecast": _q_quantile_forecast,
        "embedding_health": _q_embedding_health,
        "class_balance": _q_class_balance,
        "holiday_distance": _q_holiday_distance,
        "encoding_audit": _q_encoding_audit,
        "time_to_nth": _q_time_to_nth,
        "mrr_at_k": _q_mrr_at_k,
        "cms_join_size": _q_cms_join_size,
        # --- r3-green, code touched r4/r5 (SQ8 probe) — early in r6 --
        "semantic_dedup": _q_semantic_dedup,
        "knn_cosine_ivf": _q_knn_ivf,
        # --- r4-green window gates (driver rows in CORRECTNESS_r04) --
        "semantic_dedup_largek": _q_semantic_dedup_largek,
        "fuzzy_pairs": _q_fuzzy_pairs,
        "fuzzy_pairs_recall": _q_fuzzy_pairs_recall,
        "pagerank": _q_pagerank,
        "welch_ttest": _q_welch_ttest,
        "bm25_keywords": _q_bm25_keywords,
        "rolling_median": _q_rolling_median,
        "dedup_canonical": _q_dedup_canonical,
        "rolling_zscore": _q_rolling_zscore,
        "stream_zscore": _q_stream_zscore,
        "profile_columns": _q_profile_columns,
        "decayed_sum": _q_decayed_sum,
        "transition_matrix": _q_transition_matrix,
        "classifier_scores": _q_classifier_scores,
        "source_stats": _q_source_stats,
        "skew_report": _q_skew_report,
        "group_centroids": _q_group_centroids,
        "impute_group_mean": _q_impute_group_mean,
        "sentence_split_udtf": _q_sentence_udtf,
        "group_trend": _q_group_trend,
        "cohort_retention": _q_cohort_retention,
        "active_days": _q_active_days,
        "weighted_sample": _q_weighted_sample,
        "psi_drift": _q_psi_drift,
        "time_to_event": _q_time_to_event,
        "negative_sample": _q_negative_sample,
        "cooccurrence_pmi": _q_cooccurrence_pmi,
        "rolling_active_users": _q_rolling_active_users,
        "remove_dup_spans": _q_remove_dup_spans,
        "behavior_entropy": _q_behavior_entropy,
        "temporal_split": _q_temporal_split,
        "interval_coverage": _q_interval_coverage,
        "sequence_audit": _q_sequence_audit,
        "cuped_adjust": _q_cuped,
        "robust_outliers": _q_robust_outliers,
        "build_vocab": _q_build_vocab,
        "fk_coverage": _q_fk_coverage,
        "vocab_coverage": _q_vocab_coverage,
        "variant_summary": _q_variant_summary,
        "srm_check": _q_srm_check,
        "readability": _q_readability,
        "histogram": _q_histogram,
        "km_curve": _q_km_curve,
        "jaccard_pairs": _q_jaccard_pairs,
        "minhash_signatures": _q_minhash_sigs,
        "simhash": _q_simhash,
        # --- r2-green refill + trailers + r3-green (rows held) -------
        "simhash_near_dups": _q_simhash_near,
        "knn_cosine": _q_knn,
        "embedding_near_dup": _q_embedding_near_dup,
        "media_features": _q_media_features,
        "sketches": _q_sketches,
        "stream_turn_features": _q_stream_turn_features,
        "stream_asof": _q_stream_asof,
        "repetition_stats": _q_repetition_stats,
        "pii_scrub": _q_pii_scrub,
        "stratified_sample": _q_stratified_sample,
        "tfidf_keywords": _q_tfidf,
        "chunked_cumulative": _q_chunked_cumulative,
        "asof_join": _q_asof("union_window"),
        "asof_join_broadcast": _q_asof("broadcast"),
        "asof_join_skew": _q_asof("skew_aware"),
        "asof_join_tolerance": _q_asof_tolerance,
        "asof_join_cogroup_pandas": _q_asof("cogroup_pandas"),
        "asof_join_forward": _q_asof_dir("forward"),
        "asof_join_nearest": _q_asof_dir("nearest"),
        "stable_order": _q_stable_order,
        "lag_lead": _q_lag_lead,
        "cumulative": _q_cumulative,
        "forward_fill": _q_ffill,
        "backward_fill": _q_bfill,
        "time_range_rolling": _q_time_range_rolling,
        "range_join": _q_range_join,
        "semi_join": _q_semi_join,
        "anti_join": _q_anti_join,
        "grouping_sets": _q_grouping_sets,
        "cube_agg": _q_cube,
        "except_all": _q_except_all,
        "intersect_all": _q_intersect_all,
        "percentiles": _q_percentiles,
        "distinct_agg": _q_distinct_agg,
        "sessionize": _q_sessionize,
        "session_agg": _q_session_agg,
        "tumbling_window": _q_tumbling,
        "sliding_window": _q_sliding,
        "feature_compare": _q_feature_compare,
        "feature_extract": _q_feature_extract,
        "feature_extract_union": _q_feature_extract_union,
        "feature_extract_set": _q_feature_extract_set,
        "topk_per_group": _q_topk,
        "map_ops": _q_map_ops,
        "salted_agg_skew": _q_salted_agg,
        "pivot_event_counts": _q_pivot,
        "ranking_functions": _q_ranking,
        "word_explode": _q_word_explode,
        "feature_hash_extract": _q_feature_hash,
        "q1_pricing_summary": _q_q1,
        "q3_shipping_priority": _q3_shipping_priority,
        "q5_local_supplier_volume": _q5_local_supplier_volume,
        "segment_revenue_broadcast": _q_segment_revenue,
        "orders_rollup": _q_region_rollup,
        "text_stats": _q_text_stats,
        "lang_quality": _q_lang_quality,
        "doc_fingerprint": _q_fingerprint,
        "quality_score_pandas_udf": _q_quality_udf,
        "value_spread_grouped_udf": _q_value_spread_udf,
        "dedup_exact": _q_dedup_exact,
        "partition_lineage": _q_partition_lineage,
        "dedup_components_star": _q_dedup_components_star,
        "decontamination": _q_decontamination,
        "pack_sequences": _q_pack_sequences,
        "packing_stats": _q_packing_stats,
        "corpus_mix": _q_corpus_mix,
        "mixture_sample": _q_mixture_sample,
        "ngram_freq": _q_ngram_freq,
        "stream_dedup": _q_stream_dedup,
        "feature_matrix": _q_feature_matrix,
        "leakage_audit": _q_leakage_audit,
        "quantile_bin": _q_quantile_bin,
        "target_encode": _q_target_encode,
        "lm_score": _q_lm_score,
        "knn_label_agreement": _q_knn_label_agreement,
        "chunk_documents": _q_chunk_documents,
        "span_dup_stats": _q_span_dup_stats,
        "session_funnel": _q_session_funnel,
        "split_assign": _q_split_assign,
        "dedup_exact_canonical": _q_dedup_exact_canonical,
        "incremental_dedup": _q_incremental_dedup,
        "minhash_lsh_dedup": _q_minhash_lsh,
        "knn_lsh_recall": _q_knn_lsh_recall,
        "curation_pipeline": _q_curation_pipeline,
        "dedup_components": _q_dedup_components,
        "knn_cosine_lsh": _q_knn_lsh,
        "cap_per_group": _q_cap_per_group,
        "winsorize": _q_winsorize,
    }



_WIN = "partition by user_id order by ts, event_id"
_ROWS = "rows between unbounded preceding and current row"

_CUM_SQL = f"""
  select event_id,
         cast(sum(cast(value as decimal(18,2))) over ({_WIN} {_ROWS}) as double) as cum_value,
         cast(count(value) over ({_WIN} {_ROWS}) as bigint) as cum_n
  from events"""

_SESSION_IDS_SQL = f"""
  select *, cast(sum(new_s) over ({_WIN} {_ROWS}) - 1 as bigint) as session_id
  from (
    select *, case when lag(ts) over ({_WIN}) is null
                     or ts - lag(ts) over ({_WIN}) > interval '30 minutes'
              then 1 else 0 end as new_s
    from events)
"""

_HXW = _HX.format(x="w")

_SIMHASH_NEAR_SQL = """
  with corpus as (
    select doc_id, text from documents
    union all
    select doc_id + 200000, text from documents),
  h as (select doc_id,
               list_transform({ws}, w -> {hxw}) as hs
        from corpus),
  sims as (
    select doc_id,
           cast(list_sum(list_transform(generate_series(0, 31), j ->
             case when list_sum(list_transform(hs, h ->
                    case when ((h >> j) & 1) = 1 then 1 else -1 end)) >= 0
                  then (1::BIGINT << j) else 0 end)) as bigint) as simhash
    from h)
  select a.doc_id as id_a, b.doc_id as id_b,
         cast(bit_count(xor(a.simhash, b.simhash)) as int) as hamming
  from sims a join sims b on a.doc_id < b.doc_id
  where bit_count(xor(a.simhash, b.simhash)) <= 6
"""
_SHINGLES_SQL = """
  list_distinct(list_transform(
    generate_series(1, greatest(len({ws}) - 2, 0)),
    i -> array_to_string({ws}[i:i+2], ' ')))
""".strip()
_WS = "regexp_split_to_array(trim(text), '\\s+')"
_SIMHASH_NEAR_SQL = _SIMHASH_NEAR_SQL.format(ws=_WS, hxw=_HXW)

_STOPW = ", ".join(f"'{w}'" for w in TXT.EN_STOPWORDS)

_CC_ORACLE_SQL = f"""
  with recursive pairs as ({_SIMHASH_NEAR_SQL}),
  e as (select id_a as a, id_b as b from pairs
        union
        select id_b as a, id_a as b from pairs),
  reach(v, r) as (
    select a, a from e
    union
    select e.a, reach.r from e join reach on reach.v = e.b
  )
  select v as doc_id, min(r) as component from reach group by v"""


def oracle_sql() -> dict[str, str]:
    sh = _SHINGLES_SQL.format(ws=_WS)
    jaccard_sql = f"""
      with corpus as ({_AUG_DOCS_SQL}),
      sh as (select doc_id, unnest({sh}) as s from corpus),
      sz as (select doc_id, count(*) as n from sh group by 1),
      inter as (
        select a.doc_id id_a, b.doc_id id_b, count(*) i
        from sh a join sh b on a.s = b.s and a.doc_id < b.doc_id
        group by 1, 2)
      select id_a, id_b,
             round(i * 1.0 / (sa.n + sb.n - i), 6) as jaccard
      from inter
      join sz sa on inter.id_a = sa.doc_id
      join sz sb on inter.id_b = sb.doc_id
      where round(i * 1.0 / (sa.n + sb.n - i), 6) >= 0.6
    """
    # universal-hash family (dedup._MH_A/_MH_B/_MH_P shared verbatim)
    base_h = "(('0x' || substr(md5(s), 1, 8))::BIGINT)"
    mh = lambda i: f"(({2*i+1} * {base_h} + {1000003*(i+1)}) % 2147483647)"
    sig_exprs = ", ".join(
        f"list_min(list_transform({sh}, s -> {mh(i)})) as sig_{i}"
        for i in range(8)
    )
    sig16 = ", ".join(
        f"list_min(list_transform(shingles, s -> {mh(i)})) as sig_{i}"
        for i in range(16)
    )
    band_rows = " union all ".join(
        f"select doc_id, {b} as band, md5(sig_{2*b}::varchar || ':' || sig_{2*b+1}::varchar) as bhash from sigs"
        for b in range(8)
    )
    # star-cap twin (dedup.lsh_candidate_pairs max_bucket=4): buckets
    # over the cap contribute hub->member star pairs only
    minhash_lsh_sql = f"""
      with corpus as ({_AUG_DOCS_SQL}),
      shl as (select doc_id, {sh} as shingles from corpus),
      sigs as (select doc_id, {sig16} from shl),
      bands as ({band_rows}),
      bsz as (select band, bhash, count(*) as n, min(doc_id) as hub
              from bands group by 1, 2),
      cand as (
        select a.doc_id id_a, b.doc_id id_b
        from bands a
        join bands b on a.band = b.band and a.bhash = b.bhash
                    and a.doc_id < b.doc_id
        join bsz z on z.band = a.band and z.bhash = a.bhash
        where z.n <= 4
        union
        select z.hub as id_a, a.doc_id as id_b
        from bands a
        join bsz z on z.band = a.band and z.bhash = a.bhash
        where z.n > 4 and a.doc_id != z.hub),
      shr as (select doc_id, unnest(shingles) as s from shl),
      sz as (select doc_id, count(*) as n from shr group by 1),
      inter as (
        select c.id_a, c.id_b, count(*) i
        from cand c
        join shr a on a.doc_id = c.id_a
        join shr b on b.doc_id = c.id_b and b.s = a.s
        group by 1, 2)
      select id_a, id_b, round(i * 1.0 / (sa.n + sb.n - i), 6) as jaccard
      from inter
      join sz sa on inter.id_a = sa.doc_id
      join sz sb on inter.id_b = sb.doc_id
      where round(i * 1.0 / (sa.n + sb.n - i), 6) >= 0.6
    """
    # incremental (index x new) variant of the LSH pipeline: same
    # signatures, candidates restricted to originals (< 100000) vs the
    # truncated near-copies (>= 100000)
    incremental_sql = f"""
      with corpus as ({_AUG_DOCS_SQL}),
      shl as (select doc_id, {sh} as shingles from corpus),
      sigs as (select doc_id, {sig16} from shl),
      bands as ({band_rows}),
      cand as (
        select a.doc_id id_a, b.doc_id id_b
        from bands a join bands b on a.band = b.band and a.bhash = b.bhash
        where a.doc_id < 100000 and b.doc_id >= 100000
        group by 1, 2),
      shr as (select doc_id, unnest(shingles) as s from shl),
      sz as (select doc_id, count(*) as n from shr group by 1),
      inter as (
        select c.id_a, c.id_b, count(*) i
        from cand c
        join shr a on a.doc_id = c.id_a
        join shr b on b.doc_id = c.id_b and b.s = a.s
        group by 1, 2)
      select id_a, id_b, round(i * 1.0 / (sa.n + sb.n - i), 6) as jaccard
      from inter
      join sz sa on inter.id_a = sa.doc_id
      join sz sb on inter.id_b = sb.doc_id
      where round(i * 1.0 / (sa.n + sb.n - i), 6) >= 0.6
    """
    curation_sql = f"""
      with recursive corpus as ({_AUG_DOCS_SQL}),
      q as (
        select doc_id, text from (
          select doc_id, text,
                 round(least(len({_WS}) / 50.0, 1.0)
                       * (len(list_distinct({_WS})) * 1.0 / greatest(len({_WS}), 1))
                       * (1.0 - (length(text) - length(regexp_replace(text, '[^A-Za-z0-9_\\s]', '', 'g'))) * 1.0
                              / greatest(length(text), 1)), 6) as quality
          from corpus)
        where quality >= 0.2),
      ed as (select doc_id, text from q
             qualify row_number() over (partition by md5(text) order by doc_id) = 1),
      shl as (select doc_id, {sh} as shingles from ed),
      sigs as (select doc_id, {sig16} from shl),
      bands as ({band_rows}),
      cand as (
        select a.doc_id id_a, b.doc_id id_b
        from bands a join bands b on a.band = b.band and a.bhash = b.bhash
                                 and a.doc_id < b.doc_id
        group by 1, 2),
      shr as (select doc_id, unnest(shingles) as s from shl),
      sz as (select doc_id, count(*) as n from shr group by 1),
      inter as (
        select c.id_a, c.id_b, count(*) i
        from cand c
        join shr a on a.doc_id = c.id_a
        join shr b on b.doc_id = c.id_b and b.s = a.s
        group by 1, 2),
      pairs as (
        select id_a, id_b
        from inter
        join sz sa on inter.id_a = sa.doc_id
        join sz sb on inter.id_b = sb.doc_id
        where round(i * 1.0 / (sa.n + sb.n - i), 6) >= 0.6),
      e as (select id_a as a, id_b as b from pairs
            union
            select id_b as a, id_a as b from pairs),
      reach(v, r) as (
        select a, a from e
        union
        select e.a, reach.r from e join reach on reach.v = e.b),
      comp as (select v, min(r) as component from reach group by v),
      nonrep as (select v as doc_id from comp where component != v)
      select ed.doc_id, md5(ed.text) as content_md5
      from ed
      where ed.doc_id not in (select doc_id from nonrep)
        and {_HX.format(x="'s:' || cast(ed.doc_id as varchar)")} % 100 < 80
    """
    cos = (
        "list_dot_product(a.v, b.v) / "
        "(sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))"
    )
    _c = lambda x, y: (
        f"list_dot_product({x}, {y}) / "
        f"(sqrt(list_dot_product({x}, {x})) * sqrt(list_dot_product({y}, {y})))"
    )
    # Random-hyperplane LSH twin (similarity.lsh_bucketed_topk): the
    # planes are md5-derived, so DuckDB rebuilds the identical index.
    # planes=3, dim=64, multi-probe Hamming<=1 (masks 0,1,2,4).
    _comps = (
        "list_transform(generate_series(1, 64), i -> "
        "(('0x' || substr(md5(p::varchar || ':' || (i-1)::varchar), 1, 8))::BIGINT"
        " / 4294967296.0 - 0.5))"
    )
    def _bucket_sql(off: int) -> str:
        """Sign bucket over planes off..off+2 (table = plane family)."""
        return (
            f"cast(list_sum(list_transform(generate_series({off}, {off + 2}), p -> "
            f"case when list_dot_product({{v}}, {_comps}) >= 0 "
            f"then (1::BIGINT << ({off + 2} - p)) else 0 end)) as bigint)"
        )

    _bucket = _bucket_sql(0)
    lsh_topk_core = f"""
      v as (select vec_id, embedding::DOUBLE[] as v from embeddings),
      b as (select vec_id, v, {_bucket.format(v="v")} as bucket from v),
      qb as (select vec_id as query_id, v as qv, bucket as qbk from b
             where vec_id < 10),
      probes as (select query_id, qv,
                        unnest([xor(qbk, 0), xor(qbk, 1), xor(qbk, 2), xor(qbk, 4)]) as bucket
                 from qb),
      lsh_scored as (
        select p.query_id, b.vec_id as neighbor_id,
               list_dot_product(p.qv, b.v) /
                 (sqrt(list_dot_product(p.qv, p.qv)) * sqrt(list_dot_product(b.v, b.v))) as cs
        from probes p join b using (bucket)
        where p.query_id != b.vec_id),
      lsh_topk as (
        select query_id, neighbor_id, round(cs, 6) as cos_sim,
               cast(row_number() over (partition by query_id
                                       order by cs desc, neighbor_id) as bigint) as rank
        from lsh_scored
        qualify rank <= 5)
    """
    knn_lsh_sql = f"""
      with {lsh_topk_core}
      select query_id, neighbor_id, cos_sim, rank from lsh_topk
    """
    # two-table OR-construction twin (similarity.lsh_bucketed_topk
    # tables=2): table 0 = planes 0-2, table 1 = planes 3-5; candidates
    # are the union (set semantics = the engine's dropDuplicates)
    _probe = (
        "select query_id, unnest([xor({bk}, 0), xor({bk}, 1), xor({bk}, 2),"
        " xor({bk}, 4)]) as bucket from qb2"
    )
    lsh2_topk_core = f"""
      v as (select vec_id, embedding::DOUBLE[] as v from embeddings),
      b2 as (select vec_id, v, {_bucket_sql(0).format(v="v")} as bk0,
                    {_bucket_sql(3).format(v="v")} as bk1 from v),
      qb2 as (select vec_id as query_id, v as qv, bk0, bk1 from b2
              where vec_id < 10),
      cand as (
        select p.query_id, b2.vec_id as neighbor_id
        from ({_probe.format(bk="bk0")}) p join b2 on p.bucket = b2.bk0
        where p.query_id != b2.vec_id
        union
        select p.query_id, b2.vec_id as neighbor_id
        from ({_probe.format(bk="bk1")}) p join b2 on p.bucket = b2.bk1
        where p.query_id != b2.vec_id),
      lsh_scored as (
        select c.query_id, c.neighbor_id,
               list_dot_product(q.qv, t.v) /
                 (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(t.v, t.v))) as cs
        from cand c
        join qb2 q on c.query_id = q.query_id
        join v t on c.neighbor_id = t.vec_id),
      lsh_topk as (
        select query_id, neighbor_id, round(cs, 6) as cos_sim,
               cast(row_number() over (partition by query_id
                                       order by cs desc, neighbor_id) as bigint) as rank
        from lsh_scored
        qualify rank <= 5)
    """
    knn_lsh_recall_sql = f"""
      with {lsh2_topk_core},
      exact_scored as (
        select a.query_id, b.vec_id as neighbor_id,
               list_dot_product(a.qv, b.v) /
                 (sqrt(list_dot_product(a.qv, a.qv)) * sqrt(list_dot_product(b.v, b.v))) as cs
        from qb2 a join v b on a.query_id != b.vec_id),
      exact_topk as (
        select query_id, neighbor_id
        from exact_scored
        qualify row_number() over (partition by query_id
                                   order by cs desc, neighbor_id) <= 5)
      select e.query_id,
             cast(sum(case when l.neighbor_id is not null then 1 else 0 end) as bigint) as n_hits,
             round(sum(case when l.neighbor_id is not null then 1 else 0 end) / 5.0, 4) as recall_at_5
      from exact_topk e
      left join lsh_topk l
        on e.query_id = l.query_id and e.neighbor_id = l.neighbor_id
      group by e.query_id
    """
    # 2 deterministic Lloyd iterations (twin of similarity.kmeans_centroids):
    # decimal-summed means make training order-independent, hence replayable
    lloyd = ["cent0 as (select vec_id as cid, v as cv from v order by vec_id limit 16)"]
    for it in (1, 2):
        p = f"cent{it - 1}"
        lloyd += [
            f"""a{it} as (
            select vec_id, v, cid from (
              select v.vec_id, v.v, c.cid,
                     row_number() over (partition by v.vec_id
                                        order by {_c('v.v', 'c.cv')} desc, c.cid) as rn
              from (select * from v where vec_id < 2000) v
              cross join {p} c) where rn = 1)""",
            f"""m{it} as (
            select cid, s.pos as pos,
                   round(cast(sum(s.x::DECIMAL(27,12)) as double) / count(*), 6) as m
            from (select cid,
                         unnest(list_transform(v, (x, i) -> {{'pos': i, 'x': x}})) as s
                  from a{it})
            group by cid, s.pos)""",
            f"""g{it} as (
            select cid,
                   list_transform(list_sort(list({{'pos': pos, 'm': m}})), t -> t.m) as cv
            from m{it} group by cid)""",
            f"""cent{it} as (
            select prv.cid, coalesce(nxt.cv, prv.cv) as cv
            from cent{it - 1} prv left join g{it} nxt on prv.cid = nxt.cid)""",
        ]
    lloyd_ctes = ",\n      ".join(lloyd)
    ivf_sql = f"""
      with v as (select vec_id, embedding::DOUBLE[] as v from embeddings),
      {lloyd_ctes},
      cent as (select cid, cv from cent2),
      assign as (
        select vec_id, v, cid from (
          select v.vec_id, v.v, cent.cid,
                 row_number() over (partition by v.vec_id
                                    order by {_c('v.v', 'cent.cv')} desc, cent.cid) as rn
          from v cross join cent)
        where rn = 1),
      q as (select vec_id as query_id, v as qv from v where vec_id < 10),
      probe as (
        select query_id, qv, cid from (
          select q.query_id, q.qv, cent.cid,
                 row_number() over (partition by q.query_id
                                    order by {_c('q.qv', 'cent.cv')} desc, cent.cid) as rn
          from q cross join cent)
        where rn <= 4),
      scored as (
        select p.query_id, a.vec_id as neighbor_id, {_c('p.qv', 'a.v')} as cs
        from probe p join assign a using (cid)
        where p.query_id != a.vec_id)
      select query_id, neighbor_id, round(cs, 6) as cos_sim,
             cast(row_number() over (partition by query_id
                                     order by cs desc, neighbor_id) as bigint) as rank
      from scored
      qualify rank <= 5
    """
    # SemDeDup twin: same Lloyd training + assignment CTEs, then the
    # within-cluster lower-id-wins pair scan
    semantic_dedup_sql = f"""
      with v as (select vec_id, embedding::DOUBLE[] as v from embeddings),
      {lloyd_ctes},
      cent as (select cid, cv from cent2),
      assign as (
        select vec_id, v, cid from (
          select v.vec_id, v.v, cent.cid,
                 row_number() over (partition by v.vec_id
                                    order by {_c('v.v', 'cent.cv')} desc, cent.cid) as rn
          from v cross join cent)
        where rn = 1),
      dups as (
        select b.vec_id
        from assign a join assign b using (cid)
        where a.vec_id < b.vec_id and {_c('a.v', 'b.v')} > 0.35
        group by b.vec_id)
      select a.vec_id, cast(a.cid as bigint) as cluster_id,
             (d.vec_id is not null) as semantic_dup
      from assign a left join dups d on a.vec_id = d.vec_id
    """
    # Large-k SemDeDup twin (assign_clusters strategy="join"): no Lloyd
    # — centroids are the 256 lowest-id vectors; the same cos-desc,
    # cid-asc argmin and within-cluster pair scan as semantic_dedup_sql
    semantic_dedup_largek_sql = f"""
      with v as (select vec_id, embedding::DOUBLE[] as v from embeddings),
      cent as (
        select vec_id as cid, v as cv from v order by vec_id limit 256),
      assign as (
        select vec_id, v, cid from (
          select v.vec_id, v.v, cent.cid,
                 row_number() over (partition by v.vec_id
                                    order by {_c('v.v', 'cent.cv')} desc, cent.cid) as rn
          from v cross join cent)
        where rn = 1),
      dups as (
        select b.vec_id
        from assign a join assign b using (cid)
        where a.vec_id < b.vec_id and {_c('a.v', 'b.v')} > 0.35
        group by b.vec_id)
      select a.vec_id, cast(a.cid as bigint) as cluster_id,
             (d.vec_id is not null) as semantic_dup
      from assign a left join dups d on a.vec_id = d.vec_id
    """
    # PageRank twin: three unrolled iterations, decimal-summed
    # contributions, 12dp rank rounding — mirrors operators/graph.py.
    # All float literals forced ::DOUBLE (a bare 0.85 parses as
    # DECIMAL in DuckDB and would change the arithmetic).
    pr_iters = []
    for i in (1, 2, 3):
        p = f"r{i - 1}"
        pr_iters += [
            f"""c{i} as (
            select e.dst as node, cast(r.r / deg.d as decimal(27,12)) as c
            from e join {p} r on e.src = r.node join deg on e.src = deg.src)""",
            f"""s{i} as (select node, sum(c) as c from c{i} group by node)""",
            f"""r{i} as (
            select n.node,
                   round((1.0::DOUBLE - 0.85::DOUBLE) / (select count(*) from nodes)
                         + 0.85::DOUBLE * coalesce(cast(s.c as double), 0.0::DOUBLE),
                         12) as r
            from nodes n left join s{i} s using (node))""",
        ]
    pr_iter_ctes = ",\n      ".join(pr_iters)
    pagerank_sql = f"""
      with e0 as (
        select distinct 'c:' || cast(o_custkey as varchar) as src,
                        's:' || cast(l_suppkey as varchar) as dst
        from orders join lineitem on l_orderkey = o_orderkey),
      e as (select distinct src, dst from (
              select src, dst from e0
              union all
              select dst, src from e0)),
      nodes as (select distinct src as node from e),
      deg as (select src, count(*) as d from e group by src),
      r0 as (select node, 1.0::DOUBLE / (select count(*) from nodes) as r
             from nodes),
      {pr_iter_ctes}
      select node, r as pagerank from r3
    """
    return {
        "asof_join": _ASOF_SQL,
        "asof_join_broadcast": _ASOF_SQL,
        "asof_join_skew": _ASOF_SQL,
        "asof_join_tolerance": _ASOF_TOL_SQL,
        "asof_join_cogroup_pandas": _ASOF_SQL,
        "asof_join_forward": _ASOF_FWD_SQL,
        "asof_join_nearest": _ASOF_NEAREST_SQL,
        "stable_order": f"select event_id, cast(row_number() over ({_WIN}) as bigint) as seq from events",
        "lag_lead": f"""
          select event_id,
                 lag(value, 1) over ({_WIN}) as value_lag1,
                 lead(value, 1) over ({_WIN}) as value_lead1,
                 lag(value, 2) over ({_WIN}) as value_lag2,
                 lead(value, 2) over ({_WIN}) as value_lead2
          from events""",
        "cumulative": _CUM_SQL,
        # chunked prefix-sum windows contract: bit-identical to the
        # plain running window — literally the same oracle
        "chunked_cumulative": _CUM_SQL,
        "forward_fill": f"""
          select event_id,
                 last_value(case when event_type = 'purchase' then value end ignore nulls)
                   over ({_WIN} {_ROWS}) as last_purchase_value
          from events""",
        "backward_fill": f"""
          select event_id,
                 first_value(case when event_type = 'purchase' then value end ignore nulls)
                   over ({_WIN} rows between current row and unbounded following) as next_purchase_value
          from events""",
        "time_range_rolling": """
          select event_id,
                 cast(sum(cast(value as decimal(18,2))) over (
                   partition by user_id order by ts
                   range between interval '1 hour' preceding and current row
                 ) as double) as roll_sum,
                 cast(count(value) over (
                   partition by user_id order by ts
                   range between interval '1 hour' preceding and current row
                 ) as bigint) as roll_n
          from events""",
        "semi_join": """
          select c_custkey, c_mktsegment from customer
          where exists (select 1 from orders
                        where o_custkey = c_custkey and o_totalprice > 150000)""",
        "anti_join": """
          select c_custkey, c_acctbal from customer
          where not exists (select 1 from orders
                            where o_custkey = c_custkey and o_totalprice > 350000)""",
        "grouping_sets": """
          select o_orderpriority, o_orderstatus, count(*) as n,
                 cast(sum(cast(o_totalprice as decimal(18,4))) as double) as total
          from orders
          group by grouping sets ((o_orderpriority), (o_orderstatus), ())""",
        "range_join": """
          select e.event_id, count(o.o_orderkey) as n_recent_orders
          from events e
          left join orders o
            on e.user_id = o.o_custkey
           and o.o_orderdate <= e.ts
           and o.o_orderdate > e.ts - interval '7 days'
          group by e.event_id""",
        "cube_agg": """
          select o_orderpriority, o_orderstatus, count(*) as n
          from orders group by cube(o_orderpriority, o_orderstatus)""",
        "distinct_agg": """
          select user_id, count(distinct event_type) as n_types,
                 count(*) as n_events
          from events group by user_id""",
        "except_all": """
          select user_id, event_type from events where value > 50
          except all
          select user_id, event_type from events where value > 80""",
        "intersect_all": """
          select user_id from events where event_type = 'purchase'
          intersect all
          select user_id from events where event_type = 'error'""",
        "percentiles": """
          select event_type,
                 round(quantile_cont(value, 0.5), 4) as p50,
                 round(quantile_cont(value, 0.9), 4) as p90
          from events group by event_type""",
        # The exact columns are recomputed; the bound booleans are the
        # oracle's CLAIM that the engine's sketches sit inside their
        # advertised tolerance — a broken sketch flips the engine-side
        # boolean and the hash goes red (see _q_sketches docstring).
        "sketches": """
          select event_type, count(*) as n,
                 count(distinct user_id) as exact_users,
                 round(quantile_cont(value, 0.5), 4) as p50_exact,
                 true as hll_within_bounds, true as pct_within_bounds
          from events group by event_type""",
        # Streaming gates: the oracle is the BATCH semantics — a green
        # hash IS the stream/batch parity claim under the driver.
        "stream_turn_features": _STREAM_TURNS_SQL,
        # duplicates are byte-identical, so first-arrival-wins equals
        # plain distinct
        "stream_dedup": """
          select event_id, user_id, epoch_us(ts) as ts_us, value
          from events""",
        "quantile_bin": """
          with b as (select quantile_cont(value, 0.25) as q1,
                            quantile_cont(value, 0.50) as q2,
                            quantile_cont(value, 0.75) as q3
                     from events)
          select event_id,
                 case when value is null then null else
                   cast((case when value > b.q1 then 1 else 0 end)
                      + (case when value > b.q2 then 1 else 0 end)
                      + (case when value > b.q3 then 1 else 0 end) as int)
                 end as value_bin
          from events, b""",
        "target_encode": """
          select event_id, event_type,
                 case when count(value) over w > 0 then
                   round(cast(sum(cast(value as decimal(27,12))) over w as double)
                         / count(value) over w, 6)
                 end as event_type_te
          from events
          window w as (partition by event_type order by ts, event_id
                       rows between unbounded preceding and 1 preceding)""",
        "decayed_sum": """
          with b as (
            select event_id, user_id, value, ts,
                   epoch_us(ts) // 604800000000 as k
            from events),
          a as (select *, min(k) over (partition by user_id) as k0 from b),
          c as (
            select event_id, k, k0,
                   cast(sum(cast(power(2.0, k - k0) * value as decimal(38,12)))
                        over (partition by user_id order by ts, event_id
                              rows between unbounded preceding and 1 preceding)
                        as double) as cum
            from a)
          select event_id, round(power(2.0, k0 - k) * cum, 6) as decayed_sum
          from c""",
        "transition_matrix": """
          with p as (
            select lag(event_type) over (partition by user_id
                                         order by ts, event_id) as prev_cat,
                   event_type as next_cat
            from events),
          c as (select prev_cat, next_cat, count(*) as n_trans
                from p where prev_cat is not null
                group by 1, 2)
          select prev_cat, next_cat, n_trans,
                 round(n_trans / cast(sum(n_trans) over (partition by prev_cat)
                                      as double), 6) as prob
          from c""",
        "profile_columns": """
          with nums as (
            select 'event_id' as c, event_id::DOUBLE as d from events
            union all select 'user_id', user_id::DOUBLE from events
            union all select 'value', value::DOUBLE from events),
          strs as (
            select 'event_type' as c, event_type as s from events
            union all select 'props', props from events)
          select c as column_name, count(*) as n,
                 cast(sum(case when d is null then 1 else 0 end) as bigint) as n_null,
                 count(distinct d) as n_distinct,
                 min(d) as min_val, max(d) as max_val,
                 cast(null as bigint) as min_len, cast(null as bigint) as max_len
          from nums group by c
          union all
          select c, count(*),
                 cast(sum(case when s is null then 1 else 0 end) as bigint),
                 count(distinct s),
                 cast(null as double), cast(null as double),
                 min(len(s)), max(len(s))
          from strs group by c""",
        "active_days": """
          with wd as (select event_id, user_id,
                             epoch_us(ts) // 86400000000 as day
                      from events),
          pd as (select distinct user_id, day from wd),
          f as (select user_id, day,
                       cast(count(*) over (partition by user_id order by day
                            range between 6 preceding and current row)
                            as bigint) as active_days_7d
                from pd)
          select e.event_id, f.active_days_7d
          from wd e join f using (user_id, day)""",
        "cohort_retention": """
          with a as (
            select distinct user_id as u,
                   epoch_us(ts) // 604800000000 as b
            from events),
          f as (select u, min(b) as cohort from a group by u),
          c as (
            select cohort as cohort_bucket, b - cohort as "offset",
                   count(distinct u) as n_active
            from a join f using (u)
            group by 1, 2),
          s as (select cohort_bucket, n_active as sz from c where "offset" = 0)
          select c.cohort_bucket, c."offset" as offset, c.n_active,
                 round(c.n_active / cast(s.sz as double), 6) as retention_rate
          from c join s using (cohort_bucket)""",
        "group_trend": """
          with d as (
            select user_id, value, epoch_us(ts) // 1000000 as x
            from events),
          c as (
            select user_id, value,
                   cast(x - min(x) over (partition by user_id) as double) as xc
            from d where value is not null and x is not null),
          a as (
            select user_id, count(*) as n_obs,
                   cast(sum(cast(xc as decimal(28,6))) as double) as sx,
                   cast(sum(cast(value as decimal(28,6))) as double) as sy,
                   cast(sum(cast(xc as decimal(28,6))
                            * cast(value as decimal(28,6))) as double) as sxy,
                   cast(sum(cast(xc as decimal(28,6))
                            * cast(xc as decimal(28,6))) as double) as sxx,
                   cast(sum(cast(value as decimal(28,6))
                            * cast(value as decimal(28,6))) as double) as syy
            from c group by user_id)
          select user_id, n_obs,
                 round(case when n_obs * sxx - sx * sx > 0
                       then (n_obs * sxy - sx * sy) / (n_obs * sxx - sx * sx)
                       end, 9) as slope,
                 round(case when n_obs * sxx - sx * sx > 0
                       then (sy - (n_obs * sxy - sx * sy)
                                  / (n_obs * sxx - sx * sx) * sx) / n_obs
                       end, 6) as intercept,
                 round(case when n_obs * sxx - sx * sx > 0
                             and n_obs * syy - sy * sy > 0
                       then (n_obs * sxy - sx * sy) * (n_obs * sxy - sx * sy)
                            / ((n_obs * sxx - sx * sx) * (n_obs * syy - sy * sy))
                       end, 6) as r2
          from a""",
        "calendar_features": """
          select event_id,
                 (epoch_us(ts) // 86400000000 + 3) % 7 as dow,
                 (epoch_us(ts) // 3600000000) % 24 as hour,
                 ((epoch_us(ts) // 86400000000 + 3) % 7 >= 5) as is_weekend,
                 round(sin(6.283185307179586
                           * ((epoch_us(ts) // 3600000000) % 24) / 24), 6) + 0
                   as hour_sin,
                 round(cos(6.283185307179586
                           * ((epoch_us(ts) // 3600000000) % 24) / 24), 6) + 0
                   as hour_cos
          from events""",
        "impute_group_mean": """
          with m as (
            select event_id, event_type,
                   case when event_type = 'error' then null else value end as value
            from events),
          g as (
            select event_type,
                   case when count(value) > 0 then
                     round(cast(sum(cast(value as decimal(27,12))) as double)
                           / count(value), 6)
                   end as gmean
            from m group by event_type)
          select event_id, m.event_type, value,
                 (value is null) as value_was_null,
                 coalesce(value, g.gmean) as value_imputed
          from m join g using (event_type)""",
        "winsorize": """
          with b as (
            select event_type,
                   quantile_cont(value, 0.05) as lo,
                   quantile_cont(value, 0.95) as hi
            from events group by event_type)
          select e.event_id, e.event_type, e.value,
                 case when e.value is null then null
                      else round(least(greatest(e.value, b.lo), b.hi), 6)
                 end as value_wins
          from events e join b using (event_type)""",
        "rolling_zscore": _ROLLING_ZSCORE_SQL,
        # the streaming twin is bit-parity by construction (exact-cent
        # ring buffer, same IEEE chain) — literally the same oracle,
        # like chunked_cumulative reuses _CUM_SQL
        "stream_zscore": _ROLLING_ZSCORE_SQL,
        "chunk_documents": f"""
          with t as (select doc_id, {_WS} as w, len({_WS}) as n from documents),
          s as (select doc_id, w, n,
                       unnest(generate_series(0,
                         cast(floor((greatest(n - 32, 0) + 15) / 16.0) as bigint)
                       )) as chunk_idx
                from t)
          select doc_id, cast(chunk_idx as int) as chunk_idx,
                 cast(chunk_idx * 16 as bigint) as start_tok,
                 cast(least(chunk_idx * 16 + 32, n) as bigint) as end_tok,
                 cast(least(chunk_idx * 16 + 32, n) - chunk_idx * 16 as bigint)
                   as n_chunk_tokens,
                 md5(array_to_string(
                   w[chunk_idx * 16 + 1 : least(chunk_idx * 16 + 32, n)], ' '))
                   as chunk_md5
          from s""",
        "span_dup_stats": f"""
          with base as (select doc_id, {_WS} as w from ({_AUG_DOCS_SQL})),
          g as (select doc_id,
                       unnest(list_transform(
                         generate_series(1, greatest(len(w) - 7, 0)),
                         i -> array_to_string(w[i:i+7], ' '))) as g
                from base),
          tot as (select g, count(*) as t from g group by 1),
          pd as (select doc_id, count(*) as n_spans,
                        sum(case when t > 1 then 1 else 0 end) as n_dup
                 from g join tot using (g) group by 1)
          select d.doc_id,
                 cast(coalesce(pd.n_spans, 0) as bigint) as n_spans,
                 cast(coalesce(pd.n_dup, 0) as bigint) as n_dup_spans,
                 case when coalesce(pd.n_spans, 0) > 0
                      then round(pd.n_dup / pd.n_spans, 6) end as dup_fraction
          from (select distinct doc_id from ({_AUG_DOCS_SQL})) d
          left join pd using (doc_id)""",
        "session_funnel": f"""
          with s as ({_SESSION_IDS_SQL}),
          f0 as (select user_id, session_id, min(ts) as t0 from s
                 where event_type = 'view' group by 1, 2),
          f1 as (select s.user_id, s.session_id, min(s.ts) as t1
                 from s join f0 using (user_id, session_id)
                 where s.event_type = 'click' and s.ts >= f0.t0
                 group by 1, 2),
          f2 as (select s.user_id, s.session_id, min(s.ts) as t2
                 from s join f1 using (user_id, session_id)
                 where s.event_type = 'purchase' and s.ts >= f1.t1
                 group by 1, 2)
          select f0.user_id, f0.session_id,
                 epoch_us(f0.t0) as t0_us, epoch_us(f1.t1) as t1_us,
                 epoch_us(f2.t2) as t2_us,
                 f1.t1 is not null as reached_click,
                 f2.t2 is not null as reached_purchase
          from f0
          left join f1 using (user_id, session_id)
          left join f2 using (user_id, session_id)""",
        # the audit's theorem (no future reads) recomputed independently:
        # DuckDB's own ASOF join must also find zero
        "leakage_audit": f"""
          with rhs as ({_ORDERS_RHS_SQL}),
          j as (
            select e.event_id, e.user_id, e.ts, rhs.ts as matched_ts
            from events e
            asof left join rhs on e.user_id = rhs.user_id and e.ts >= rhs.ts)
          select user_id,
                 cast(count(*) as bigint) as n_rows,
                 cast(count(matched_ts) as bigint) as n_matched,
                 cast(sum(case when matched_ts > ts then 1 else 0 end) as bigint)
                   as n_future_reads,
                 max(epoch_us(ts) - epoch_us(matched_ts)) as max_staleness_us
          from j group by user_id""",
        # composed twin of the declarative feature-matrix spec: asof +
        # row_number + lag + preceding-frame count + trailing-hour sum +
        # gap sessionization, all over the shared (ts, event_id) order
        "feature_matrix": f"""
          with rhs as ({_ORDERS_RHS_SQL}),
          j as (
            select e.event_id, e.user_id, e.ts, e.value, rhs.o_totalprice
            from events e
            asof left join rhs on e.user_id = rhs.user_id and e.ts >= rhs.ts),
          ja as (
            select *, min(k) over (partition by user_id) as k0
            from (select *, epoch_us(ts) // 604800000000 as k from j)),
          w as (
            select *,
              cast(row_number() over ({_WIN}) as bigint) as turn_seq,
              lag(value, 1) over ({_WIN}) as value_lag1,
              cast(count(value) over ({_WIN} {_ROWS}) as bigint) as value_cum_count,
              cast(sum(cast(value as decimal(18,2))) over (
                partition by user_id order by ts
                range between interval '1 hour' preceding and current row
              ) as double) as value_roll_sum,
              round(power(2.0, k0 - k) * cast(
                sum(cast(power(2.0, k - k0) * value as decimal(38,12)))
                  over ({_WIN} rows between unbounded preceding and 1 preceding)
                as double), 6) as value_decay7d,
              cast(sum(cast(value as decimal(18,2)))
                over ({_WIN} rows between 20 preceding and 1 preceding)
                as double) as zs,
              cast(sum(cast(value as decimal(18,2)) * cast(value as decimal(18,2)))
                over ({_WIN} rows between 20 preceding and 1 preceding)
                as double) as zsq,
              count(value)
                over ({_WIN} rows between 20 preceding and 1 preceding) as zn,
              case when lag(ts) over ({_WIN}) is null
                     or ts - lag(ts) over ({_WIN}) > interval '30 minutes'
                   then 1 else 0 end as new_s
            from ja),
          w2 as (
            select *,
              case when zn >= 5 and sqrt(greatest((zsq - zs * zs / zn) / zn, 0.0)) > 0
                   then (value - zs / zn)
                        / sqrt(greatest((zsq - zs * zs / zn) / zn, 0.0))
              end as zraw
            from w)
          select event_id, user_id, epoch_us(ts) as ts_us, o_totalprice,
                 turn_seq, value_lag1, value_cum_count, value_roll_sum,
                 value_decay7d,
                 round(zraw, 6) as value_zscore,
                 coalesce(abs(zraw) > 3.0, false) as value_is_anomaly,
                 cast(sum(new_s) over ({_WIN} {_ROWS}) - 1 as bigint) as session_id
          from w2""",
        "stream_asof": _STREAM_ASOF_SQL,
        "sessionize": f"select event_id, session_id from ({_SESSION_IDS_SQL})",
        "session_agg": f"""
          select user_id, session_id,
                 min(ts) as session_start, max(ts) as session_end,
                 count(*) as n_events,
                 cast(sum(cast(value as decimal(18,2))) as double) as sum_value
          from ({_SESSION_IDS_SQL})
          group by user_id, session_id""",
        "tumbling_window": """
          select user_id,
                 time_bucket(interval '1 hour', ts) as win_start,
                 time_bucket(interval '1 hour', ts) + interval '1 hour' as win_end,
                 count(*) as n,
                 cast(sum(cast(value as decimal(18,2))) as double) as sum_value
          from events group by 1, 2, 3""",
        "sliding_window": """
          select user_id, win_start, count(*) as n from (
            select user_id,
                   unnest([time_bucket(interval '1 hour', ts),
                           time_bucket(interval '1 hour', ts) - interval '1 hour']) as win_start
            from events)
          group by user_id, win_start""",
        "feature_compare": _FEATURE_COMPARE_SQL,
        "feature_extract": _FEATURE_EXTRACT_SQL,
        "feature_extract_union": _FEATURE_EXTRACT_UNION_SQL,
        "feature_extract_set": f"""
          with t as (select doc_id, ({_WS})[1:8] as ws from documents)
          select doc_id,
                 array_to_string(
                   list_transform(
                     list_sort(list_transform(ws, (w, i) ->
                       {{'f': ('0x' || substr(md5(w), 1, 8))::BIGINT,
                         'i': i - 1}})),
                     s -> s.i::VARCHAR || ':' || s.f::VARCHAR),
                   ',') as set_features
          from t""",
        "topk_per_group": """
          select user_id, event_id, value from events
          qualify row_number() over (partition by user_id
                                     order by value desc, event_id) <= 3""",
        "partition_lineage": f"""
          select cast({_HX.format(x="cast(user_id as varchar)")} % 16 as int) as bucket,
                 count(*) as rows_out,
                 epoch_us(min(ts)) as min_ts_us, epoch_us(max(ts)) as max_ts_us,
                 count(distinct user_id) as n_users,
                 cast(sum(case when event_type = 'purchase' and value is not null
                          then 0 else 1 end) as bigint) as null_purchase_value
          from events
          group by 1""",
        "map_ops": """
          select user_id,
                 nullif(count(*) filter (event_type = 'purchase'), 0) as n_purchase,
                 nullif(count(*) filter (event_type = 'error'), 0) as n_error,
                 cast(count(distinct event_type) as int) as n_types
          from events group by user_id""",
        "salted_agg_skew": """
          select user_id,
                 cast(sum(cast(value as decimal(18,2))) as double) as sum_value,
                 count(value) as n,
                 cast(min(cast(value as decimal(18,2))) as double) as min_value,
                 cast(max(cast(value as decimal(18,2))) as double) as max_value
          from events group by user_id""",
        "pivot_event_counts": """
          select user_id,
                 count(*) filter (event_type = 'click') as n_click,
                 count(*) filter (event_type = 'view') as n_view,
                 count(*) filter (event_type = 'purchase') as n_purchase,
                 count(*) filter (event_type = 'signup') as n_signup,
                 count(*) filter (event_type = 'error') as n_error
          from events group by user_id""",
        "ranking_functions": """
          select event_id,
                 cast(rank() over (partition by user_id order by value desc) as bigint) as rnk,
                 cast(dense_rank() over (partition by user_id order by value desc) as bigint) as drnk,
                 round(percent_rank() over (partition by user_id order by value desc), 6) as prnk,
                 cast(ntile(4) over (partition by user_id
                                     order by value desc, event_id) as bigint) as quartile
          from events""",
        "word_explode": f"""
          with t as (select doc_id, {_WS} as ws from documents)
          select doc_id, cast(s.pos as bigint) as pos, s.word as word from (
            select doc_id,
                   unnest(list_transform(ws, (w, i) -> {{'pos': i - 1, 'word': w}})) as s
            from t)""",
        "feature_hash_extract": """
          select event_id,
                 json_extract_string(props, '$.k') as k_val,
                 md5(event_type || '|' || props) as payload_hash
          from events""",
        "q1_pricing_summary": """
          select l_returnflag, l_linestatus,
                 cast(sum(cast(l_quantity as decimal(18,4))) as double) as sum_qty,
                 cast(sum(cast(l_extendedprice as decimal(18,4))) as double) as sum_base_price,
                 cast(sum(cast(l_extendedprice as decimal(18,4)) *
                          (cast(1 as decimal(18,4)) - cast(l_discount as decimal(18,4)))) as double) as sum_disc_price,
                 count(*) as count_order
          from lineitem
          where l_shipdate <= timestamp '1998-09-01 00:00:00'
          group by l_returnflag, l_linestatus""",
        "q3_shipping_priority": _Q3_SQL,
        "q5_local_supplier_volume": _Q5_SQL,
        "segment_revenue_broadcast": """
          select c_mktsegment, count(*) as n_orders,
                 cast(sum(cast(o_totalprice as decimal(18,4))) as double) as revenue
          from orders join customer on o_custkey = c_custkey
          group by c_mktsegment""",
        "orders_rollup": """
          select o_orderpriority, o_orderstatus, count(*) as n,
                 cast(sum(cast(o_totalprice as decimal(18,4))) as double) as total
          from orders group by rollup(o_orderpriority, o_orderstatus)""",
        "text_stats": f"""
          select doc_id,
                 cast(len({_WS}) as bigint) as n_words,
                 cast(len(regexp_extract_all(text, '{TXT.TOKEN_RE}')) as bigint) as n_tokens,
                 cast(length(text) as bigint) as n_chars,
                 cast(len(list_distinct({_WS})) as bigint) as n_distinct_words
          from documents""",
        "lang_quality": f"""
          with t as (
            select doc_id,
                   {_WS} as ws,
                   len(list_intersect(list_distinct({_WS}), [{_STOPW}])) * 1.0
                     / greatest(len(list_distinct({_WS})), 1) as sr,
                   length(text) as nc,
                   length(text) - length(regexp_replace(text, '[^A-Za-z0-9_\\s]', '', 'g')) as np
            from documents)
          select doc_id,
                 round(sr, 6) as stop_ratio,
                 case when sr >= 0.10 then 'en' else 'other' end as pred_lang,
                 round(least(len(ws) / 50.0, 1.0)
                       * (len(list_distinct(ws)) * 1.0 / greatest(len(ws), 1))
                       * (1.0 - np * 1.0 / greatest(nc, 1)), 6) as quality
          from t""",
        "sentence_split_udtf": """
          with raw as (
            select doc_id,
                   unnest(list_transform(
                     regexp_split_to_array(text, '[.!?]+[\\t\\n\\f\\r ]*'),
                     (x, i) -> {'i': i,
                                's': trim(x, ' ' || chr(9) || chr(10)
                                             || chr(12) || chr(13))}
                   )) as u
            from documents),
          f as (select doc_id, u.i as i, u.s as s from raw where u.s != '')
          select doc_id,
                 cast(row_number() over (partition by doc_id order by i) - 1
                      as int) as pos,
                 s as sentence,
                 cast(len(regexp_split_to_array(s, '\\s+')) as int) as n_words
          from f""",
        "source_stats": f"""
          with t as (
            select source, text,
                   {_WS} as ws,
                   len(list_intersect(list_distinct({_WS}), [{_STOPW}])) * 1.0
                     / greatest(len(list_distinct({_WS})), 1) as sr,
                   length(text) as nc,
                   length(text) - length(regexp_replace(text, '[^A-Za-z0-9_\\s]', '', 'g')) as np
            from documents),
          q as (
            select source,
                   round(least(len(ws) / 50.0, 1.0)
                         * (len(list_distinct(ws)) * 1.0 / greatest(len(ws), 1))
                         * (1.0 - np * 1.0 / greatest(nc, 1)), 6) as q,
                   (sr >= 0.10) as en,
                   md5(text) as h
            from t),
          a as (
            select source, count(*) as n_docs,
                   round(cast(sum(cast(q as decimal(27,12))) as double)
                         / count(*), 6) as mean_quality,
                   round(cast(sum(case when en then 1 else 0 end) as bigint)
                         / count(*), 6) as pct_english,
                   round(1.0 - count(distinct h) / count(*), 6) as dup_frac
            from q group by source)
          select source, n_docs, mean_quality, pct_english, dup_frac,
                 (mean_quality < 0.36 or dup_frac > 0.2) as blocked
          from a""",
        "quality_score_pandas_udf": f"""
          with t as (
            select doc_id, {_WS} as ws, length(text) as nc,
                   length(text) - length(regexp_replace(text, '[^A-Za-z0-9_\\s]', '', 'g')) as np
            from documents)
          select doc_id,
                 round(least(len(ws) / 50.0, 1.0)
                       * (len(list_distinct(ws)) * 1.0 / greatest(len(ws), 1))
                       * (1.0 - np * 1.0 / greatest(nc, 1)), 6) as quality
          from t""",
        "value_spread_grouped_udf": """
          select user_id, round(max(value) - min(value), 4) as spread
          from events group by user_id""",
        "tfidf_keywords": f"""
          with w as (select doc_id, unnest({_WS}) as word from documents),
          tf as (select doc_id, word, count(*) as tf from w group by 1, 2),
          dfreq as (select word, count(*) as df from tf group by 1),
          n as (select count(distinct doc_id) as n from documents)
          select doc_id, word,
                 round(tf * (ln((n.n + 1.0) / (df + 1.0)) + 1.0), 6) as tfidf,
                 cast(row_number() over (partition by doc_id
                                         order by round(tf * (ln((n.n + 1.0) / (df + 1.0)) + 1.0), 6) desc,
                                                  word) as bigint) as rank
          from tf join dfreq using (word) cross join n
          qualify rank <= 5""",
        "repetition_stats": f"""
          with g as (
            select doc_id,
                   unnest(list_transform(
                     generate_series(1, greatest(len({_WS}) - 1, 0)),
                     i -> array_to_string(({_WS})[i:i+1], ' '))) as g
            from documents),
          per as (select doc_id, g, count(*) as c from g group by 1, 2)
          select doc_id,
                 cast(sum(c) as bigint) as n_2grams,
                 count(*) as n_distinct_2grams,
                 round(1 - count(*) * 1.0 / sum(c), 6) as dup_2gram_frac,
                 round(max(c) * 1.0 / sum(c), 6) as top_2gram_frac
          from per group by doc_id""",
        "pii_scrub": f"""
          with t as (
            select doc_id,
                   text || ' contact user' || doc_id::varchar || '@example.com at 10.'
                        || (doc_id % 256)::varchar || '.0.1 or +1-555-'
                        || lpad((doc_id % 10000)::varchar, 7, '0') as text
            from documents),
          s as (
            select doc_id, text,
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(text, '{TXT.EMAIL_RE}', '<EMAIL>', 'g'),
                       '{TXT.IPV4_RE}', '<IP>', 'g'),
                     '{TXT.PHONE_RE}', '<PHONE>', 'g') as scrubbed
            from t)
          select doc_id,
                 cast(len(regexp_extract_all(text, '{TXT.EMAIL_RE}')) as bigint) as n_emails,
                 cast(len(regexp_extract_all(text, '{TXT.IPV4_RE}')) as bigint) as n_ips,
                 cast(len(regexp_extract_all(text, '{TXT.PHONE_RE}')) as bigint) as n_phones,
                 md5(scrubbed) as scrubbed_md5,
                 cast(length(scrubbed) as bigint) as scrubbed_len
          from s""",
        "doc_fingerprint": f"""
          select doc_id,
                 cast(list_sum(list_transform({_WS},
                        (w, i) -> (i * ({_HXW})) % {_MOD})) % {_MOD} as bigint) as fingerprint
          from documents""",
        "dedup_exact": """
          with corpus as (
            select doc_id, text from documents
            union all
            select doc_id + 200000, text from documents)
          select md5(text) as content_hash,
                 cast(min(doc_id) as bigint) as rep_id,
                 count(*) as n_dups
          from corpus group by 1""",
        "jaccard_pairs": jaccard_sql,
        "minhash_signatures": f"select doc_id, {sig_exprs} from documents",
        # The oracle replicates the WHOLE LSH pipeline (same md5-derived
        # minhashes, same banding, same verify), so engine and oracle agree
        # bit-for-bit including any recall misses of the banding scheme.
        # `jaccard_pairs` above is the exact ground-truth twin.
        "minhash_lsh_dedup": minhash_lsh_sql,
        "incremental_dedup": incremental_sql,
        "curation_pipeline": curation_sql,
        "split_assign": f"""
          select doc_id,
                 case when g < 90 then 'train'
                      when g < 95 then 'val'
                      else 'test' end as split
          from (select doc_id,
                       {_HX.format(x="'split:' || cast(doc_id as varchar)")} % 100 as g
                from documents)""",
        "weighted_sample": f"""
          with t as (
            select doc_id, {_WS} as ws, length(text) as nc,
                   length(text) - length(regexp_replace(text, '[^A-Za-z0-9_\\s]', '', 'g')) as np
            from documents),
          q as (
            select doc_id,
                   round(least(len(ws) / 50.0, 1.0)
                         * (len(list_distinct(ws)) * 1.0 / greatest(len(ws), 1))
                         * (1.0 - np * 1.0 / greatest(nc, 1)), 6) as q
            from t)
          select doc_id, q from q
          where {_HX.format(x="'w:' || cast(doc_id as varchar)")} % 10000
                < cast(floor(q * 10000) as bigint)""",
        "psi_drift": """
          with ref as (select value from events
                       where event_id % 2 = 0 and value is not null),
          cur as (select value from events
                  where event_id % 2 = 1 and value is not null),
          b as (select quantile_cont(value,
                  [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) as qs
                from ref),
          rc as (select len(list_filter(b.qs, x -> value > x)) as bin,
                        count(*) as nr
                 from ref, b group by 1),
          cc as (select len(list_filter(b.qs, x -> value > x)) as bin,
                        count(*) as nc
                 from cur, b group by 1),
          j as (select coalesce(rc.nr, 0) as nr, coalesce(cc.nc, 0) as nc
                from rc full outer join cc using (bin)),
          t as (select cast(sum(nr) as bigint) as tr,
                       cast(sum(nc) as bigint) as tc from j),
          terms as (
            select tr, tc,
                   (greatest(nr / cast(tr as double), 1e-6)
                    - greatest(nc / cast(tc as double), 1e-6))
                   * ln(greatest(nr / cast(tr as double), 1e-6)
                        / greatest(nc / cast(tc as double), 1e-6)) as term
            from j cross join t)
          select 'value' as feature,
                 round(cast(sum(cast(term as decimal(27,12))) as double), 6)
                   as psi,
                 max(tr) as n_ref, max(tc) as n_cur,
                 cast(10 as bigint) as n_bins
          from terms""",
        "cap_per_group": f"""
          select doc_id, lang,
                 (row_number() over (partition by lang
                    order by {_HX.format(x="'cap:' || cast(doc_id as varchar)")},
                             doc_id) <= 70) as kept
          from documents""",
        "dedup_exact_canonical": """
          with corpus as (
            select doc_id, text from documents
            union all
            select doc_id + 200000, upper(text) from documents
            union all
            select doc_id + 400000, text || ' !!!' from documents),
          c as (select doc_id,
                       trim(regexp_replace(regexp_replace(lower(text),
                         '[^a-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g')) as ct
                from corpus)
          select md5(ct) as content_hash,
                 cast(min(doc_id) as bigint) as rep_id,
                 cast(count(*) as bigint) as n_dups
          from c group by 1""",
        "simhash": f"""
          with h as (select doc_id,
                            list_transform({_WS}, w -> {_HXW}) as hs
                     from documents)
          select doc_id,
                 cast(list_sum(list_transform(generate_series(0, 31), j ->
                   case when list_sum(list_transform(hs, h ->
                          case when ((h >> j) & 1) = 1 then 1 else -1 end)) >= 0
                        then (1::BIGINT << j) else 0 end)) as bigint) as simhash
          from h""",
        "simhash_near_dups": _SIMHASH_NEAR_SQL,
        # HashMin fixpoint == min-reachable-id, which the recursive CTE
        # computes directly over the same pair set; the star-contraction
        # variant must land on the SAME fixpoint (bit-equality is its
        # contract), so both share the oracle
        "dedup_components": _CC_ORACLE_SQL,
        "dedup_components_star": _CC_ORACLE_SQL,
        # benchmark = words 3-10 of every (id % 37 == 0, >=10-word) doc;
        # doc gram inventory = distinct 8-word shingles; hits = distinct
        # doc grams present anywhere in the benchmark
        "decontamination": f"""
          with ws as (select doc_id, {_WS} as w from documents),
          bench as (select distinct array_to_string(w[3:10], ' ') as g
                    from ws where doc_id % 37 = 0 and len(w) >= 10),
          dg as (select doc_id,
                        unnest(list_distinct(list_transform(
                          generate_series(1, greatest(len(w) - 7, 0)),
                          i -> array_to_string(w[i:i+7], ' ')))) as g
                 from ws),
          hits as (select doc_id, count(*) as n
                   from dg join bench using (g) group by 1)
          select d.doc_id,
                 cast(coalesce(h.n, 0) as bigint) as n_contaminated_grams,
                 coalesce(h.n, 0) > 0 as contaminated
          from documents d left join hits h using (doc_id)""",
        "pack_sequences": f"""
          with t as (select doc_id,
                            cast({_HX.format(x="cast(doc_id as varchar)")} % 8 as int) as shard,
                            cast(len({_WS}) as bigint) as n_tokens
                     from documents),
          p as (select doc_id, shard, n_tokens,
                       cast(coalesce(sum(n_tokens) over (
                         partition by shard order by doc_id
                         rows between unbounded preceding and 1 preceding), 0)
                         as bigint) as "offset"
                from t)
          select doc_id, shard, n_tokens, "offset",
                 cast(floor("offset" / 256.0) as bigint) as seq_index,
                 cast("offset" % 256 as bigint) as seq_offset,
                 cast(floor(("offset" + greatest(n_tokens, 1) - 1) / 256.0) as bigint)
                   > cast(floor("offset" / 256.0) as bigint) as spans_boundary
          from p""",
        "packing_stats": f"""
          with t as (select doc_id,
                            cast({_HX.format(x="cast(doc_id as varchar)")} % 8 as int) as shard,
                            cast(len({_WS}) as bigint) as n_tokens
                     from documents),
          g as (select shard, count(*) as n_docs, sum(n_tokens) as total_tokens
                from t group by 1)
          select shard, cast(n_docs as bigint) as n_docs,
                 cast(total_tokens as bigint) as total_tokens,
                 cast(ceil(total_tokens / 256.0) as bigint) as n_seqs,
                 round(total_tokens /
                       nullif(cast(ceil(total_tokens / 256.0) as bigint) * 256, 0),
                       6) as fill_ratio
          from g""",
        "corpus_mix": f"""
          with t as (select lang, count(*) as n_docs,
                            cast(sum(len({_WS})) as bigint) as n_tokens
                     from documents group by 1)
          select lang, cast(n_docs as bigint) as n_docs, n_tokens,
                 round(n_tokens / (select cast(sum(n_tokens) as bigint) from t),
                       6) as token_share
          from t""",
        # floor-basis-point rates: t_max = min(n / (w/10)), bp =
        # floor(10000 * ((w/10) * t_max) / n) — identical double
        # arithmetic to mixture_rates, so the SET matches exactly
        "mixture_sample": f"""
          with c as (select lang, count(*) as n from documents group by 1),
          t(lang, w) as (select * from (values ('en', 5.0), ('de', 2.0),
                                               ('fr', 2.0), ('es', 1.0))),
          tm as (select min(c.n / (t.w / 10.0)) as t_max
                 from c join t on c.lang = t.lang),
          r as (select c.lang,
                       least(10000,
                             cast(floor(10000 * ((t.w / 10.0) * tm.t_max) / c.n)
                                  as bigint)) as bp
                from c join t on c.lang = t.lang cross join tm)
          select d.doc_id, d.lang
          from documents d join r on d.lang = r.lang
          where {_HX.format(x="'mix:' || cast(d.doc_id as varchar)")} % 10000 < r.bp""",
        # corpus MLE bigram model + per-doc sorted-fold log-prob sum —
        # list(lp order by bg) + list_reduce replays the engine's
        # array_sort + aggregate fold left-to-right
        "lm_score": f"""
          with g as (
            select doc_id,
                   unnest(list_transform(
                     generate_series(1, greatest(len({_WS}) - 1, 0)),
                     i -> array_to_string({_WS}[i:i+1], ' '))) as bg
            from documents),
          pd as (select doc_id, bg, split_part(bg, ' ', 1) as w1,
                        count(*) as k
                 from g group by 1, 2, 3),
          c2 as (select bg, cast(sum(k) as bigint) as c2 from pd group by 1),
          c1 as (select w1, cast(sum(k) as bigint) as c1 from pd group by 1),
          s as (select pd.doc_id, pd.bg,
                       pd.k * ln(cast(c2.c2 as double) / cast(c1.c1 as double)) as lp,
                       pd.k
                from pd join c2 using (bg) join c1 using (w1)),
          f as (select doc_id, cast(sum(k) as bigint) as n_bigrams,
                       list_reduce(list_prepend(0.0, list(lp order by bg)),
                                   (a, b) -> a + b) as slp
                from s group by doc_id)
          select d.doc_id, f.n_bigrams,
                 round(f.slp / f.n_bigrams, 6) as avg_logp
          from (select distinct doc_id from documents) d
          left join f using (doc_id)""",
        "ngram_freq": f"""
          with sh as (select doc_id,
                             unnest(list_distinct(list_transform(
                               generate_series(1, greatest(len({_WS}) - 1, 0)),
                               i -> array_to_string({_WS}[i:i+1], ' ')))) as ngram
                      from documents),
          g as (select ngram, count(*) as n_docs from sh
                group by 1 having count(*) >= 20)
          select ngram, cast(n_docs as bigint) as n_docs,
                 round(n_docs / (select count(distinct doc_id) from documents),
                       6) as doc_share
          from g""",
        "stratified_sample": f"""
          select event_id, event_type from events
          where {_HX.format(x="'s:' || cast(event_id as varchar)")} % 100 <
                case event_type when 'click' then 10 when 'view' then 5
                     when 'purchase' then 100 when 'error' then 100
                     else 20 end""",
        "knn_cosine": f"""
          with v as (select vec_id, embedding::DOUBLE[] as v from embeddings),
          q as (select vec_id as query_id, v from v where vec_id < 10),
          scored as (
            select a.query_id, b.vec_id as neighbor_id, {cos.replace('a.v', 'a.v').replace('b.v', 'b.v')} as cs
            from q a join v b on a.query_id != b.vec_id)
          select query_id, neighbor_id, round(cs, 6) as cos_sim,
                 cast(row_number() over (partition by query_id
                                         order by cs desc, neighbor_id) as bigint) as rank
          from scored
          qualify rank <= 5""",
        "knn_label_agreement": f"""
          with v as (select vec_id, embedding::DOUBLE[] as v, label
                     from embeddings),
          q as (select vec_id as query_id, v, label as query_label
                from v where vec_id < 50),
          scored as (
            select q.query_id, b.vec_id as neighbor_id, b.label,
                   {_c('q.v', 'b.v')} as cs
            from q join v b on q.query_id != b.vec_id),
          topk as (
            select query_id, neighbor_id, label from scored
            qualify row_number() over (partition by query_id
                                       order by cs desc, neighbor_id) <= 5),
          votes as (select query_id, label, count(*) as v
                    from topk group by 1, 2),
          tv as (select query_id, label as maj_label,
                        cast(v as bigint) as maj_votes
                 from votes
                 qualify row_number() over (partition by query_id
                                            order by v desc, label) = 1)
          select tv.query_id, q.query_label, tv.maj_label, tv.maj_votes,
                 tv.maj_label = q.query_label as agree
          from tv join q on tv.query_id = q.query_id""",
        "knn_cosine_lsh": knn_lsh_sql,
        "knn_lsh_recall": knn_lsh_recall_sql,
        "knn_cosine_ivf": ivf_sql,
        "semantic_dedup": semantic_dedup_sql,
        "semantic_dedup_largek": semantic_dedup_largek_sql,
        "pagerank": pagerank_sql,
        "skew_report": """
          with c as (select cast(user_id as varchar) as key_value, count(*) as n
                     from events group by 1),
          t as (select sum(n) as total, count(*) as nkeys from c)
          select key_value, n,
                 round(n / cast(total as double), 6) as share,
                 round(n::DOUBLE * nkeys / total, 6) as x_mean,
                 cast(row_number() over (order by n desc, key_value) as bigint) as rank
          from c cross join t
          order by n desc, key_value
          limit 5""",
        "group_centroids": """
          select label as grp, s.pos as pos,
                 round(cast(sum(s.x::DOUBLE::DECIMAL(27,12)) as double)
                       / count(*), 6) as mean_val,
                 count(*) as n_members
          from (select label,
                       -- i-1: DuckDB lambda indices are 1-based,
                       -- Spark posexplode is 0-based
                       unnest(list_transform(embedding,
                              (x, i) -> {'pos': i - 1, 'x': x})) as s
                from embeddings)
          group by label, s.pos""",
        "classifier_scores": """
          with v as (select vec_id, embedding::DOUBLE[] as v from embeddings),
          w as (select list_transform(generate_series(1, 64), i ->
                  (('0x' || substr(md5('clf:' || (i-1)::varchar), 1, 8))::BIGINT
                   / 4294967296.0 - 0.5)) as w),
          s as (select vec_id, list_dot_product(v.v, w.w) + 0.0::DOUBLE as logit
                from v cross join w)
          select vec_id, round(logit, 6) as logit,
                 round(1.0::DOUBLE / (1.0::DOUBLE + exp(-logit)), 6) as score,
                 (logit > 0) as keep
          from s""",
        "media_features": _MEDIA_SQL,
        "embedding_near_dup": f"""
          with v as (select vec_id, embedding::DOUBLE[] as v from embeddings)
          select a.vec_id as id_a, b.vec_id as id_b, round({cos}, 6) as cos_sim
          from v a join v b on a.vec_id < b.vec_id
          where round({cos}, 6) >= 0.35""",
        "time_to_event": """
          with e as (
            select event_id, user_id, event_type, epoch_us(ts) as ts_us
            from events),
          nx as (
            select event_id, ts_us,
                   min(case when event_type = 'purchase' then ts_us end) over
                     (partition by user_id order by ts_us, event_id
                      rows between 1 following and unbounded following) as nxt
            from e)
          select event_id,
                 cast(case when nxt is not null
                            and (nxt - ts_us) // 1000000 <= 259200
                      then (nxt - ts_us) // 1000000 else 259200 end as bigint)
                   as tte_sec,
                 (nxt is not null and (nxt - ts_us) // 1000000 <= 259200)
                   as observed
          from nx""",
        "negative_sample": f"""
          with pos as (
            select distinct user_id, event_id % 500 as doc_id
            from events where event_type = 'click'),
          cand as (
            select p.user_id, p.doc_id, j.j,
                   {_HX.format(x="'neg:' || p.user_id::varchar || ':' || p.doc_id::varchar || ':' || j.j::varchar")}
                     % (select max(doc_id) + 1 from documents) as neg_item
            from pos p, (select unnest(generate_series(0, 2)) as j) j),
          ex as (
            select c.* from cand c
            join (select distinct doc_id from documents) d
              on c.neg_item = d.doc_id),
          un as (
            select e.* from ex e
            where not exists (select 1 from pos p2
                              where p2.user_id = e.user_id
                                and p2.doc_id = e.neg_item))
          select user_id, doc_id, neg_item, cast(min(j) as bigint) as j
          from un group by 1, 2, 3""",
        "cooccurrence_pmi": f"""
          with tf as (
            select doc_id, word, count(*) as tf
            from (select doc_id, unnest({_WS}) as word from documents)
            group by 1, 2),
          top as (
            select doc_id, word from (
              select doc_id, word,
                     row_number() over (partition by doc_id
                                        order by tf desc, word) as rn
              from tf) where rn <= 12),
          dfr as (select word, count(*) as n_w from top group by 1),
          pairs as (
            select a.word as word_a, b.word as word_b,
                   count(*) as n_ab
            from top a join top b
              on a.doc_id = b.doc_id and a.word < b.word
            group by 1, 2
            having count(*) >= 5)
          select p.word_a, p.word_b, cast(p.n_ab as bigint) as n_ab,
                 round(ln((p.n_ab * (select count(distinct doc_id)
                                     from documents))::DOUBLE
                          / (da.n_w * db.n_w)::DOUBLE), 6) as pmi
          from pairs p
          join dfr da on da.word = p.word_a
          join dfr db on db.word = p.word_b""",
        "random_projection": """
          with v as (select vec_id, embedding::DOUBLE[] as v from embeddings),
          signs as (
            select j,
                   list_transform(generate_series(1, 64), i ->
                     case when ('0x' || substr(md5('rp:' || (j-1)::varchar
                                  || ':' || (i-1)::varchar), 1, 8))::BIGINT
                                % 2 = 1
                          then 1.0::DOUBLE else -1.0::DOUBLE end) as s
            from generate_series(1, 8) t(j))
          select vec_id, cast(j - 1 as int) as pos,
                 round(list_dot_product(v.v, signs.s), 6) + 0 as val
          from v cross join signs""",
        "snapshot_diff": """
          with old_t as (select event_id, event_type, value from events),
          new_t as (
            select event_id,
                   case when event_id % 101 = 0 then 'migrated'
                        else event_type end as event_type,
                   case when event_id % 89 = 0 then value * 2
                        else value end as value
            from events where event_id % 97 <> 0
            union all
            select event_id + 10000000, event_type, value
            from events where event_id % 103 = 0),
          j as (
            select o.event_id as o_id, n.event_id as n_id,
                   o.event_type as o_t, n.event_type as n_t,
                   o.value as o_v, n.value as n_v
            from old_t o full outer join new_t n
              on o.event_id = n.event_id),
          s as (
            select coalesce(n_id, o_id) as event_id,
                   case when o_id is null then 'added'
                        when n_id is null then 'removed'
                        when (o_t is distinct from n_t)
                          or (o_v is distinct from n_v) then 'changed'
                        end as status,
                   case when o_id is not null and n_id is not null then
                     list_filter(
                       [case when o_t is distinct from n_t
                             then 'event_type' end,
                        case when o_v is distinct from n_v
                             then 'value' end],
                       x -> x is not null)
                   else []::VARCHAR[] end as changed_cols
            from j)
          select event_id, status,
                 -- array_to_string([]) is NULL in DuckDB; Spark's
                 -- concat_ws on an empty array is '' — coalesce to match
                 coalesce(array_to_string(changed_cols, ','), '')
                   as changed_cols
          from s where status is not null""",
        "rolling_active_users": """
          with d as (
            select distinct event_type, user_id, ts::date as day
            from events),
          sp as (
            select event_type, day,
                   count(distinct user_id) over
                     (partition by event_type order by day
                      range between interval 6 days preceding
                        and current row) as dau7
            from d)
          select event_type, day, cast(dau7 as bigint) as dau7
          from sp
          qualify row_number() over (partition by event_type, day) = 1""",
        "remove_dup_spans": f"""
          with aug as ({_AUG_DOCS_SQL}),
          ws as (select doc_id, {_WS} as w from aug),
          grams as (
            select doc_id, u['s'] as s, u['g'] as g from (
              select doc_id,
                     unnest(list_transform(
                       generate_series(1, greatest(len(w) - 7, 0)),
                       i -> {{'s': i,
                              'g': array_to_string(w[i:i+7], ' ')}})) as u
              from ws)),
          totals as (select g, count(*) as tot from grams group by 1),
          bad_pos as (
            select distinct doc_id, p from (
              select doc_id, unnest(generate_series(s, s + 7)) as p
              from grams join totals using (g) where tot > 1)),
          toks as (
            select doc_id, u['pos'] as p, u['word'] as wd from (
              select doc_id,
                     unnest(list_transform(w,
                       (x, i) -> {{'pos': i, 'word': x}})) as u
              from ws)),
          kept as (
            select t.* from toks t
            where not exists (select 1 from bad_pos b
                              where b.doc_id = t.doc_id and b.p = t.p)),
          rebuilt as (
            select doc_id, string_agg(wd, ' ' order by p) as clean_text,
                   count(*) as n_kept
            from kept group by 1),
          counts as (select doc_id, len(w) as n_words from ws)
          select c.doc_id,
                 coalesce(r.clean_text, '') as clean_text,
                 cast(c.n_words as bigint) as n_words,
                 cast(c.n_words - coalesce(r.n_kept, 0) as bigint)
                   as n_removed
          from counts c left join rebuilt r using (doc_id)""",
        "table_fingerprint": """
          with r as (
            select event_type,
                   ('0x' || substr(md5(concat_ws('|',
                      coalesce(event_id::varchar, chr(30)),
                      coalesce(epoch_us(ts)::varchar, chr(30)),
                      coalesce((value::decimal(18,2))::varchar, chr(30)),
                      coalesce(props, chr(30)))), 1, 8))::BIGINT as h
            from events)
          select event_type, cast(count(*) as bigint) as n_rows,
                 cast(sum(h) as decimal(38,0))::varchar as fingerprint
          from r group by 1""",
        "behavior_entropy": """
          with counts as (
            select user_id, event_type, count(*) as k
            from events group by 1, 2),
          f as (
            select user_id,
                   cast(sum(k) as bigint) as n_events,
                   cast(count(*) as bigint) as n_cats,
                   list_reduce(
                     list_prepend(0.0::DOUBLE,
                       list(k::DOUBLE * ln(k::DOUBLE) order by event_type)),
                     (a, b) -> a + b) as s
            from counts group by user_id)
          select user_id, n_events, n_cats,
                 round(ln(n_events::DOUBLE) - s / n_events, 6) as entropy
          from f""",
        "temporal_split": """
          select event_id,
                 case when epoch_us(ts) < 1705795200000000 then 'train'
                      when epoch_us(ts) >= 1705881600000000 then 'test'
                      else 'embargo' end as split
          from events""",
        "interval_coverage": """
          with b as (
            select user_id, epoch_us(ts) as s,
                   epoch_us(ts)
                     + (value::decimal(18,2) * 100)::BIGINT * 10000 as x
            from events where value is not null),
          f as (
            select user_id, s, x,
                   max(x) over (partition by user_id order by s, x
                                rows between unbounded preceding
                                  and 1 preceding) as pmax
            from b where x > s),
          j as (
            select user_id, s, x,
                   sum(case when pmax is null or s > pmax then 1 else 0 end)
                     over (partition by user_id order by s, x
                           rows between unbounded preceding
                             and current row) as isl
            from f),
          k as (
            select user_id, isl, min(s) as i_s, max(x) as i_x,
                   count(*) as n
            from j group by 1, 2)
          select user_id, cast(sum(n) as bigint) as n_intervals,
                 cast(count(*) as bigint) as n_merged,
                 cast(sum(i_x - i_s) as bigint) as covered_us
          from k group by 1""",
        "sequence_audit": """
          with b as (
            select user_id, epoch_us(ts) as t, event_id as q from events),
          l as (
            select user_id, t, q,
                   lag(t) over (partition by user_id order by t, q) as pt,
                   lag(q) over (partition by user_id order by t, q) as pq
            from b)
          select user_id, cast(count(*) as bigint) as n_events,
                 cast(sum(case when t = pt then 1 else 0 end) as bigint)
                   as n_ts_collisions,
                 cast(sum(case when q < pq then 1 else 0 end) as bigint)
                   as n_seq_inversions,
                 cast(coalesce(max(t - pt), 0) as bigint) as max_gap_us
          from l group by 1""",
        "cuped_adjust": """
          with per as (
            select user_id, user_id % 2 as variant,
                   sum(case when epoch_us(ts) < 1705276800000000
                       then (value::decimal(18,2) * 100)::BIGINT end) as x,
                   sum(case when epoch_us(ts) >= 1705276800000000
                       then (value::decimal(18,2) * 100)::BIGINT end) as y
            from events where value is not null
            group by 1),
          d as (
            select variant,
                   cast(x as decimal(28,6)) as xd,
                   cast(y as decimal(28,6)) as yd
            from per where x is not null and y is not null),
          g as (
            select count(*) as gn,
                   cast(sum(xd) as double) as gsx,
                   cast(sum(yd) as double) as gsy,
                   cast(sum(xd * yd) as double) as gsxy,
                   cast(sum(xd * xd) as double) as gsxx,
                   cast(sum(yd * yd) as double) as gsyy
            from d),
          v as (
            select variant, count(*) as n_units,
                   cast(sum(xd) as double) as vsx,
                   cast(sum(yd) as double) as vsy
            from d group by 1),
          t as (
            select v.*, g.gn, g.gsx,
                   case when g.gn * g.gsxx - g.gsx * g.gsx > 0
                        then (g.gn * g.gsxy - g.gsx * g.gsy)
                             / (g.gn * g.gsxx - g.gsx * g.gsx)
                        else 0.0::DOUBLE end as theta,
                   case when g.gn * g.gsxx - g.gsx * g.gsx > 0
                             and g.gn * g.gsyy - g.gsy * g.gsy > 0
                        then (g.gn * g.gsxy - g.gsx * g.gsy)
                             * (g.gn * g.gsxy - g.gsx * g.gsy)
                             / ((g.gn * g.gsxx - g.gsx * g.gsx)
                                * (g.gn * g.gsyy - g.gsy * g.gsy))
                        else 0.0::DOUBLE end as rho2
            from v, g)
          select variant, cast(n_units as bigint) as n_units,
                 round(vsy / n_units, 6) as mean_y,
                 round(vsy / n_units
                       - theta * (vsx / n_units - gsx / gn), 6)
                   as mean_y_cuped,
                 round(theta, 6) as theta,
                 round(rho2, 6) as rho2
          from t""",
        "robust_outliers": """
          with d as (
            select event_id, event_type,
                   (value::decimal(18,2) * 100)::BIGINT * 2 as h
            from events where value is not null),
          med as (
            select event_type, quantile_cont(h, 0.5) as med
            from d group by 1),
          dev as (
            select d.event_id, d.event_type, d.h, med.med,
                   abs(d.h - med.med) as dv
            from d join med using (event_type)),
          mad as (
            select event_type, quantile_cont(dv, 0.5) as mad
            from dev group by 1)
          select dev.event_id, dev.event_type,
                 case when mad.mad > 0
                      then round((dev.h - dev.med) / mad.mad, 6) end
                   as robust_z,
                 (mad.mad > 0
                  and abs(dev.h - dev.med) > 3.5::DOUBLE * mad.mad)
                   as is_outlier
          from dev join mad using (event_type)""",
        "build_vocab": f"""
          with w as (
            select unnest({_WS}) as word from documents),
          c as (
            select word, count(*) as n_occurrences
            from w where word <> ''
            group by 1 having count(*) >= 3),
          r as (
            select word, n_occurrences,
                   row_number() over (order by n_occurrences desc, word)
                     - 1 as token_id
            from c)
          select word, cast(token_id as bigint) as token_id,
                 cast(n_occurrences as bigint) as n_occurrences
          from r where token_id < 500""",
        "fk_coverage": """
          with oc as (
            select 'orders->customer' as relation,
                   count(*) as n_rows,
                   sum(case when o_custkey is null then 1 else 0 end)
                     as n_null_keys,
                   sum(case when o_custkey is not null
                             and c.c_custkey is null then 1 else 0 end)
                     as n_orphans,
                   count(o_custkey) as nn
            from orders o
            left join (select distinct c_custkey from customer) c
              on o.o_custkey = c.c_custkey),
          lo as (
            select 'lineitem->orders' as relation,
                   count(*) as n_rows,
                   sum(case when l_orderkey is null then 1 else 0 end)
                     as n_null_keys,
                   sum(case when l_orderkey is not null
                             and o.o_orderkey is null then 1 else 0 end)
                     as n_orphans,
                   count(l_orderkey) as nn
            from lineitem l
            left join (select distinct o_orderkey from orders) o
              on l.l_orderkey = o.o_orderkey),
          lp as (
            select 'lineitem->part' as relation,
                   count(*) as n_rows,
                   sum(case when l_partkey is null then 1 else 0 end)
                     as n_null_keys,
                   sum(case when l_partkey is not null
                             and p.p_partkey is null then 1 else 0 end)
                     as n_orphans,
                   count(l_partkey) as nn
            from lineitem l
            left join (select distinct p_partkey from part) p
              on l.l_partkey = p.p_partkey),
          u as (
            select * from oc union all
            select * from lo union all
            select * from lp)
          select relation, cast(n_rows as bigint) as n_rows,
                 cast(n_null_keys as bigint) as n_null_keys,
                 cast(n_orphans as bigint) as n_orphans,
                 case when nn > 0
                      then round(1.0::DOUBLE - n_orphans / nn, 6)
                      end as coverage
          from u""",
        "fuzzy_pairs": """
          with d as (
            select p_partkey as id, p_name as s,
                   concat_ws(':', split_part(p_name, ' ', 1),
                     nullif(substr(split_part(p_name, ' ', 2), 1, 1), ''))
                     as b
            from part where p_name is not null)
          select a.id as id_a, c.id as id_b,
                 cast(levenshtein(a.s, c.s) as int) as dist
          from d a join d c
            on a.b = c.b and a.id < c.id
           and abs(len(a.s) - len(c.s)) <= 2
          where levenshtein(a.s, c.s) <= 2""",
        "fuzzy_pairs_recall": """
          with base as (
            select p_partkey, p_name as s, instr(p_name, ' ') as sp
            from part
            where p_name is not null and instr(p_name, ' ') > 0
              and len(p_name) > instr(p_name, ' ')),
          corpus as (
            select cast(p_partkey as bigint) as id, s from base
            union all
            select cast(p_partkey + 10000000 as bigint) as id,
                   substr(s, 1, sp)
                   || case when substr(s, sp + 1, 1) = 'q'
                           then 'z' else 'q' end
                   || substr(s, sp + 2, len(s)) as s
            from base),
          d as (
            select id, s,
                   concat_ws(':', split_part(s, ' ', 1),
                     nullif(substr(split_part(s, ' ', 2), 1, 1), '')) as b1,
                   concat_ws(':', split_part(s, ' ', 1),
                     cast(len(s) as varchar)) as b2
            from corpus),
          cand as (
            select a.id as id_a, c.id as id_b, a.s as sa, c.s as sb
            from d a join d c
              on a.b1 = c.b1 and a.id < c.id
             and abs(len(a.s) - len(c.s)) <= 2
            union
            select a.id, c.id, a.s, c.s
            from d a join d c
              on a.b2 = c.b2 and a.id < c.id
             and abs(len(a.s) - len(c.s)) <= 2),
          hits as (
            select id_a from cand
            where id_b = id_a + 10000000 and levenshtein(sa, sb) <= 2)
          select b.p_partkey, (h.id_a is not null) as found
          from base b left join hits h on h.id_a = b.p_partkey""",
        "vocab_coverage": f"""
          with w as (
            select unnest({_WS}) as word from documents),
          c as (
            select word, count(*) as n_occurrences
            from w where word <> ''
            group by 1 having count(*) >= 3),
          r as (
            select word,
                   row_number() over (order by n_occurrences desc, word)
                     - 1 as token_id
            from c),
          vocab as (select word from r where token_id < 500),
          toks as (
            select doc_id, unnest({_WS}) as word from documents),
          t2 as (select * from toks where word <> ''),
          hit as (
            select t2.doc_id,
                   case when v.word is null then 1 else 0 end as oov
            from t2 left join vocab v using (word)),
          per as (
            select doc_id, count(*) as n_tokens, sum(oov) as n_oov
            from hit group by 1)
          select d.doc_id,
                 cast(coalesce(per.n_tokens, 0) as bigint) as n_tokens,
                 cast(coalesce(per.n_oov, 0) as bigint) as n_oov,
                 case when per.n_tokens > 0
                      then round(per.n_oov / per.n_tokens, 6)
                      end as oov_rate
          from (select distinct doc_id from documents) d
          left join per using (doc_id)""",
        "variant_summary": """
          with per as (
            select user_id, user_id % 2 as variant,
                   sum(case when epoch_us(ts) >= 1705276800000000
                       then (value::decimal(18,2) * 100)::BIGINT end) as y
            from events where value is not null
            group by 1, 2),
          d as (
            select variant, cast(y as decimal(28,6)) as yd
            from per where y is not null),
          a as (
            select variant, count(*) as n_units,
                   cast(sum(yd) as double) as sy,
                   cast(sum(yd * yd) as double) as syy
            from d group by 1)
          select variant, cast(n_units as bigint) as n_units,
                 round(sy / n_units, 6) as mean_y,
                 case when n_units > 1 then round(sqrt(
                   (syy - sy * sy / n_units) / (n_units - 1)), 6) end
                   as sd_y,
                 case when n_units > 1 then round(sqrt(
                   ((syy - sy * sy / n_units) / (n_units - 1)) / n_units),
                   6) end as se_y,
                 case when n_units > 1 then round(sy / n_units
                   - 1.96::DOUBLE * sqrt(
                     ((syy - sy * sy / n_units) / (n_units - 1)) / n_units),
                   6) end as ci_lo,
                 case when n_units > 1 then round(sy / n_units
                   + 1.96::DOUBLE * sqrt(
                     ((syy - sy * sy / n_units) / (n_units - 1)) / n_units),
                   6) end as ci_hi
          from a""",
        "srm_check": """
          with u as (select distinct user_id from events),
          c as (
            select user_id % 4 as variant, count(*) as o
            from u group by 1),
          a as (
            select sum(o) as t, count(*) as k_obs,
                   sum(o * o / 1.0::DOUBLE) as oow
            from c)
          select cast(t as bigint) as n_total,
                 cast(k_obs as bigint) as n_variants,
                 round(4.0::DOUBLE / t * oow - t, 6) as chi2,
                 (4.0::DOUBLE / t * oow - t > 7.815::DOUBLE) as srm
          from a""",
        "readability": f"""
          with c as (
            select doc_id,
                   len(list_filter({_WS}, x -> x <> '')) as w,
                   len(regexp_extract_all(text, '[.!?]+')) as s,
                   len(regexp_extract_all(text, '[aeiouyAEIOUY]+')) as y
            from documents)
          select doc_id,
                 cast(w as bigint) as n_words,
                 cast(s as bigint) as n_sentences,
                 cast(y as bigint) as n_syllables,
                 case when w > 0 and s > 0 then round(
                   206.835::DOUBLE - 1.015::DOUBLE * (w / s)
                   - 84.6::DOUBLE * (y / w), 6) end as flesch
          from c""",
        "histogram": """
          with d as (
            select (value::decimal(18,2) * 100)::BIGINT as c
            from events where value is not null),
          mm as (select min(c) as lo, max(c) as hi,
                        max(c) - min(c) as span, count(*) as total
                 from d),
          b as (
            select least(19, ((c - mm.lo) * 20) // mm.span) as bin_id
            from d, mm),
          a as (select bin_id, count(*) as n from b group by 1)
          select cast(bin_id as bigint) as bin_id,
                 cast(mm.lo + (bin_id * mm.span) // 20 as bigint)
                   as lo_cents,
                 cast(mm.lo + ((bin_id + 1) * mm.span) // 20 as bigint)
                   as hi_cents,
                 cast(n as bigint) as n,
                 round(n / mm.total, 6) as share
          from a, mm""",
        "km_curve": """
          with e as (
            select event_id, user_id, event_type, epoch_us(ts) as ts_us
            from events),
          nx as (
            select event_id, ts_us,
                   min(case when event_type = 'purchase' then ts_us end)
                     over (partition by user_id order by ts_us, event_id
                           rows between 1 following
                             and unbounded following) as nxt
            from e),
          tte as (
            select case when nxt is not null
                         and (nxt - ts_us) // 1000000 <= 259200
                   then (nxt - ts_us) // 1000000 else 259200 end as tte_sec,
                   (nxt is not null
                    and (nxt - ts_us) // 1000000 <= 259200) as observed
            from nx),
          hours as (select tte_sec // 3600 as t, observed from tte),
          agg as (
            select t,
                   sum(case when observed then 1 else 0 end) as d,
                   sum(case when not observed then 1 else 0 end) as c
            from hours group by 1),
          spine as (
            select *, coalesce(sum(d + c) over
              (order by t rows between unbounded preceding
                 and 1 preceding), 0) as before
            from agg),
          s as (
            select t, (select count(*) from hours) - before as n_at_risk,
                   d, c
            from spine),
          tm as (
            select *,
                   case when d < n_at_risk then cast(
                     round(ln(1.0::DOUBLE - d / n_at_risk), 12)
                     as decimal(27,12)) end as term,
                   max(case when d >= n_at_risk then 1 else 0 end) over
                     (order by t rows between unbounded preceding
                        and current row) as dead
            from s)
          select cast(t as bigint) as t,
                 cast(n_at_risk as bigint) as n_at_risk,
                 cast(d as bigint) as d,
                 cast(c as bigint) as c,
                 case when dead = 0 then round(exp(cast(
                        sum(term) over (order by t rows between
                          unbounded preceding and current row)
                        as double)), 6)
                      else 0.0::DOUBLE end as survival
          from tm""",
        "welch_ttest": """
          with per as (
            select user_id, user_id % 2 as variant,
                   sum(case when epoch_us(ts) >= 1705276800000000
                       then (value::decimal(18,2) * 100)::BIGINT end) as y
            from events where value is not null
            group by 1, 2),
          d as (
            select variant, cast(y as decimal(28,6)) as yd
            from per where y is not null),
          a as (
            select variant, count(*) as n,
                   cast(sum(yd) as double) as sy,
                   cast(sum(yd * yd) as double) as syy
            from d group by 1),
          w as (
            select max(case when variant = 0 then n end) as nc,
                   max(case when variant = 0 then sy end) as syc,
                   max(case when variant = 0 then syy end) as syyc,
                   max(case when variant = 1 then n end) as nt,
                   max(case when variant = 1 then sy end) as syt,
                   max(case when variant = 1 then syy end) as syyt
            from a),
          v as (
            select nc, nt, syc / nc as mc, syt / nt as mt,
                   case when nc > 1 then
                     (syyc - syc * syc / nc) / (nc - 1) end as vc,
                   case when nt > 1 then
                     (syyt - syt * syt / nt) / (nt - 1) end as vt
            from w),
          s as (select *, vc / nc + vt / nt as se2 from v)
          select cast(nc as bigint) as n_c, cast(nt as bigint) as n_t,
                 round(mc, 6) as mean_c, round(mt, 6) as mean_t,
                 round(mt - mc, 6) as diff,
                 case when se2 > 0 then
                   round((mt - mc) / sqrt(se2), 6) end as t_stat,
                 case when se2 > 0 then
                   round(se2 * se2 / ((vc / nc) * (vc / nc) / (nc - 1)
                         + (vt / nt) * (vt / nt) / (nt - 1)), 6)
                 end as dof
          from s""",
        "bm25_keywords": f"""
          with w as (select doc_id, unnest({_WS}) as word from documents),
          tf as (select doc_id, word, count(*) as tf from w group by 1, 2),
          dfreq as (select word, count(*) as df from tf group by 1),
          dl as (select doc_id, sum(tf) as dl from tf group by 1),
          stats as (
            select cast(count(distinct doc_id) as double) as n,
                   cast(sum(tf) as double) / count(distinct doc_id) as avgdl
            from tf),
          scored as (
            select tf.doc_id, tf.word,
                   round(ln(1.0::DOUBLE + (n - df + 0.5::DOUBLE)
                            / (df + 0.5::DOUBLE))
                         * (tf * (1.2::DOUBLE + 1.0)
                            / (tf + 1.2::DOUBLE
                               * (1.0::DOUBLE - 0.75::DOUBLE
                                  + 0.75::DOUBLE * dl.dl / avgdl))),
                         6) as bm25
            from tf join dfreq using (word) join dl using (doc_id)
            cross join stats)
          select doc_id, word, bm25,
                 cast(row_number() over (partition by doc_id
                                         order by bm25 desc, word)
                      as bigint) as rank
          from scored qualify rank <= 5""",
        "rolling_median": """
          with e as (
            select event_id, user_id, ts,
                   (value::decimal(18,2) * 100)::BIGINT as cents
            from events where value is not null)
          select event_id, user_id, cents,
                 quantile_cont(cents, 0.5) over (
                   partition by user_id order by ts, event_id
                   rows between 4 preceding and current row)
                   as rolling_median
          from e""",
        "dedup_canonical": f"""
          with recursive pairs as ({_SIMHASH_NEAR_SQL}),
          e as (select id_a as a, id_b as b from pairs
                union
                select id_b as a, id_a as b from pairs),
          reach(v, r) as (
            select a, a from e
            union
            select e.a, reach.r from e join reach on reach.v = e.b
          ),
          comp as (select v as doc_id, min(r) as component
                   from reach group by v),
          corpus as (
            select doc_id, text from documents
            union all
            select doc_id + 200000, text from documents),
          ranked as (
            select comp.doc_id, comp.component,
                   row_number() over (partition by component
                                      order by length(text) desc,
                                               comp.doc_id asc) as rn
            from comp join corpus using (doc_id)),
          canon as (select component, doc_id as canonical_id
                    from ranked where rn = 1)
          select r.doc_id, r.component, c.canonical_id,
                 r.doc_id = c.canonical_id as is_canonical
          from ranked r join canon c using (component)""",
        "scd2_build": """
          with e as (
            select user_id, epoch_us(ts) as ts_us, event_id, event_type
            from events),
          f as (
            select *,
                   case when row_number() over w = 1
                        or event_type is distinct from lag(event_type) over w
                        then 1 else 0 end as chg
            from e
            window w as (partition by user_id order by ts_us, event_id)),
          r as (
            select *,
                   sum(chg) over (partition by user_id order by ts_us, event_id
                                  rows between unbounded preceding
                                  and current row) as ver
            from f),
          g as (
            select user_id, ver, min(event_type) as event_type,
                   min(ts_us) as valid_from_us
            from r group by 1, 2)
          select user_id, event_type, valid_from_us,
                 lead(valid_from_us) over wv as valid_to_us,
                 cast(ver as bigint) as version,
                 lead(valid_from_us) over wv is null as is_current
          from g
          window wv as (partition by user_id order by ver)""",
        "tree_ancestry": """
          with recursive nodes as (
            select doc_id as id,
                   case when doc_id >= 4 then doc_id // 4 end as parent
            from documents),
          walk as (
            select id, id as cur, 0 as d from nodes
            union all
            select w.id, n.parent, w.d + 1
            from walk w join nodes n on w.cur = n.id
            where n.parent is not null)
          select w.id, w.cur as root_id, cast(w.d as bigint) as depth
          from walk w join nodes n on w.cur = n.id
          where n.parent is null""",
        "containment_pairs": f"""
          with corpus as ({_AUG_DOCS_SQL}),
          sh as (select doc_id, unnest({_SHINGLES_SQL.format(ws=_WS)}) as s
                 from corpus),
          sz as (select doc_id, count(*) as n from sh group by 1),
          inter as (
            select a.doc_id id_a, b.doc_id id_b, count(*) i
            from sh a join sh b on a.s = b.s and a.doc_id <> b.doc_id
            group by 1, 2)
          select id_a, id_b, round(i * 1.0 / sa.n, 6) as containment
          from inter join sz sa on inter.id_a = sa.doc_id
          where round(i * 1.0 / sa.n, 6) >= 0.9""",
        "prefix_filter_pairs": f"""
          with corpus as ({_AUG_DOCS_SQL}),
          w as (select doc_id, unnest(list_distinct({_WS})) as s from corpus),
          sz as (select doc_id, count(*) as n from w group by 1),
          inter as (
            select a.doc_id id_a, b.doc_id id_b, count(*) i
            from w a join w b on a.s = b.s and a.doc_id < b.doc_id
            group by 1, 2)
          select id_a, id_b,
                 round(i * 1.0 / (sa.n + sb.n - i), 6) as jaccard
          from inter
          join sz sa on inter.id_a = sa.doc_id
          join sz sb on inter.id_b = sb.doc_id
          where round(i * 1.0 / (sa.n + sb.n - i), 6) >= 0.9""",
        "bpe_pair_counts": f"""
          with w as (select unnest({_WS}) as wrd from documents),
          wc as (select wrd, count(*) as c from w group by 1),
          p as (
            select unnest(list_transform(range(1, length(wrd)),
                                         i -> substr(wrd, i, 2))) as pair,
                   c
            from wc)
          select pair, cast(sum(c) as bigint) as count
          from p group by 1
          order by count desc, pair
          limit 50""",
        "source_kl": f"""
          with w as (select source, unnest({_WS}) as wrd from documents),
          sc as (select source, wrd, count(*) as c from w group by 1, 2),
          gc as (select wrd, sum(c) as g from sc group by 1),
          tot as (select count(*) as v,
                         cast(sum(g) as bigint) + count(*) as qd
                  from gc),
          lnqall as (
            select list_reduce(
                     list_prepend(0.0::DOUBLE,
                       list(ln((g + 1.0::DOUBLE) / qd::DOUBLE)
                            order by wrd)),
                     (a, b) -> a + b) as f
            from gc, tot group by qd),
          per as (
            select source,
                   cast(sum(c) as bigint) as n_tokens,
                   count(*) as n_types,
                   list_reduce(
                     list_prepend(0.0::DOUBLE,
                       list((c + 1.0::DOUBLE) * ln(c + 1.0::DOUBLE)
                            order by wrd)),
                     (a, b) -> a + b) as g1,
                   list_reduce(
                     list_prepend(0.0::DOUBLE,
                       list((c + 1.0::DOUBLE)
                            * ln((g + 1.0::DOUBLE) / qd::DOUBLE)
                            order by wrd)),
                     (a, b) -> a + b) as g2,
                   list_reduce(
                     list_prepend(0.0::DOUBLE,
                       list(ln((g + 1.0::DOUBLE) / qd::DOUBLE)
                            order by wrd)),
                     (a, b) -> a + b) as g3
            from sc join gc using (wrd) cross join tot
            group by source, qd)
          select source, n_tokens, n_types,
                 round((g1 - g2 + g3 - lnqall.f)
                       / ((n_tokens + (select v from tot))::DOUBLE)
                       - ln((n_tokens + (select v from tot))::DOUBLE), 6)
                   as kl
          from per, lnqall""",
        "weighted_median": """
          with d as (
            select l_returnflag, l_linestatus,
                   (l_extendedprice::decimal(18,2) * 100)::BIGINT as v,
                   cast(l_quantity as bigint) as w
            from lineitem),
          pv as (select l_returnflag, l_linestatus, v, sum(w) as w
                 from d group by 1, 2, 3),
          c as (
            select l_returnflag, l_linestatus, v,
                   sum(w) over (partition by l_returnflag, l_linestatus
                                order by v rows between unbounded preceding
                                and current row) as cum,
                   sum(w) over (partition by l_returnflag, l_linestatus)
                     as tot
            from pv)
          select l_returnflag, l_linestatus,
                 min(v) as weighted_median
          from c where cum * 2 >= tot
          group by 1, 2""",
        "ks_test": """
          with d as (
            select user_id % 2 as g,
                   (value::decimal(18,2) * 100)::BIGINT as v
            from events where value is not null),
          pv as (
            select v,
                   sum(case when g = 0 then 1 else 0 end) as da,
                   sum(case when g = 1 then 1 else 0 end) as db
            from d group by 1),
          c as (
            select sum(da) over (order by v rows between unbounded
                                 preceding and current row) as ca,
                   sum(db) over (order by v rows between unbounded
                                 preceding and current row) as cb,
                   sum(da) over () as na,
                   sum(db) over () as nb
            from pv),
          a as (
            select cast(max(na) as bigint) as n_a,
                   cast(max(nb) as bigint) as n_b,
                   cast(max(abs(ca * nb - cb * na)) as bigint) as dnum
            from c)
          select n_a, n_b,
                 round(dnum::DOUBLE / (n_a * n_b)::DOUBLE, 6) as d_stat,
                 round((dnum::DOUBLE / (n_a * n_b)::DOUBLE)
                       * sqrt((n_a * n_b)::DOUBLE
                              / (n_a + n_b)::DOUBLE), 6) as ks_lambda
          from a""",
        "mutual_information": """
          with base as (
            select event_type,
                   (((epoch_us(ts) // 86400000000) + 3) % 7)::varchar
                     as dow,
                   (user_id % 3)::varchar as y
            from events),
          m as (
            select 'event_type' as f,
                   coalesce(event_type, chr(0) || 'null' || chr(0)) as x,
                   coalesce(y, chr(0) || 'null' || chr(0)) as y
            from base
            union all
            select 'dow' as f,
                   coalesce(dow, chr(0) || 'null' || chr(0)) as x,
                   coalesce(y, chr(0) || 'null' || chr(0)) as y
            from base),
          cells as (select f, x, y, count(*) as c from m group by 1, 2, 3),
          xm as (select f, x, sum(c) as cx from cells group by 1, 2),
          ym as (select f, y, sum(c) as cy from cells group by 1, 2),
          tot as (select f, sum(c) as n from cells group by 1),
          j as (
            select * from cells
            join xm using (f, x) join ym using (f, y) join tot using (f))
          select f as feature,
                 cast(max(n) as bigint) as n_rows,
                 count(*) as n_cells,
                 round(list_reduce(list_prepend(0.0::DOUBLE,
                   list((c::DOUBLE / n::DOUBLE)
                        * ln((n::DOUBLE * c::DOUBLE)
                             / (cx::DOUBLE * cy::DOUBLE))
                        order by x, y)),
                   (a, b) -> a + b), 6) as mi
          from j group by f""",
        "semantic_decontamination": """
          with v as (select vec_id, embedding::DOUBLE[] as ve
                     from embeddings),
          b as (select vec_id as bench_id, ve from v where vec_id < 25),
          c as (select vec_id as corpus_id, ve from v where vec_id >= 25
                union all
                select bench_id + 10000 as corpus_id, ve from b),
          s as (
            select corpus_id, bench_id,
                   list_dot_product(c.ve, b.ve)
                   / (sqrt(list_dot_product(c.ve, c.ve))
                      * sqrt(list_dot_product(b.ve, b.ve))) as cs
            from c cross join b),
          r as (
            select corpus_id, bench_id, cs,
                   row_number() over (partition by corpus_id
                                      order by cs desc, bench_id asc)
                     as rn
            from s)
          select corpus_id, bench_id, round(cs, 6) as cos_sim
          from r where rn = 1 and round(cs, 6) > 0.45""",
        "rare_category_collapse": """
          with k as (
            select source from documents
            group by source having count(*) >= 20)
          select doc_id, source,
                 case when source is null then null
                      when source in (select source from k) then source
                      else '__other__' end as source_collapsed
          from documents""",
        "woe_encode": """
          with a as (
            select event_type as category,
                   sum(case when user_id % 2 = 1 then 1 else 0 end)
                     as n_pos,
                   sum(case when user_id % 2 = 1 then 0 else 1 end)
                     as n_neg
            from events group by 1),
          t as (select cast(sum(n_pos) as bigint)::DOUBLE + 1.0 as pt,
                       cast(sum(n_neg) as bigint)::DOUBLE + 1.0 as nt
                from a)
          select category,
                 cast(n_pos as bigint) as n_pos,
                 cast(n_neg as bigint) as n_neg,
                 round(ln(((n_pos + 0.5::DOUBLE) / pt)
                          / ((n_neg + 0.5::DOUBLE) / nt)), 6) as woe,
                 round((((n_pos + 0.5::DOUBLE) / pt)
                        - ((n_neg + 0.5::DOUBLE) / nt))
                       * ln(((n_pos + 0.5::DOUBLE) / pt)
                            / ((n_neg + 0.5::DOUBLE) / nt)), 6) as iv
          from a, t""",
        "session_ngrams": """
          with s as (
            select user_id,
                   list(event_type order by ts, event_id) as seq
            from events group by 1),
          g as (
            select unnest(list_transform(
                     range(1, greatest(len(seq) - 2, 0) + 1),
                     i -> array_to_string(seq[i:i+2], ' > '))) as ngram
            from s)
          select ngram, count(*) as count
          from g group by 1
          order by count desc, ngram
          limit 50""",
        "inverted_index": """
          with ws as (
            select doc_id,
                   regexp_split_to_array(trim(text), '\\s+') as arr
            from documents),
          w as (
            select doc_id,
                   unnest(list_transform(range(len(arr)),
                     i -> struct_pack(p := i, w := arr[i+1]))) as x
            from ws),
          pd as (
            select x.w as word, doc_id,
                   list(x.p order by x.p) as positions
            from w group by 1, 2),
          idx as (
            select word, count(*) as df,
                   cast(sum(len(positions)) as bigint) as n_postings
            from pd group by 1),
          nd as (select count(distinct doc_id) as n from documents)
          select word, df, n_postings, doc_id,
                 array_to_string(positions, ',') as positions
          from pd join idx using (word)
          where df >= 2
            and df <= (select cast(floor(0.5 * n) as bigint) from nd)""",
        "autocorr": """
          with e as (
            select user_id, ts, event_id,
                   (value::decimal(18,2) * 100)::BIGINT as cents
            from events where value is not null),
          l as (
            select user_id, 1 as k, cast(cents as double) as y,
                   cast(lag(cents, 1) over (partition by user_id
                        order by ts, event_id) as double) as x
            from e
            union all
            select user_id, 2 as k, cast(cents as double) as y,
                   cast(lag(cents, 2) over (partition by user_id
                        order by ts, event_id) as double) as x
            from e),
          p as (select * from l where x is not null),
          a as (
            select user_id, k, count(*) as n_pairs,
                   cast(sum(cast(x as decimal(28,6))) as double) as sx,
                   cast(sum(cast(y as decimal(28,6))) as double) as sy,
                   cast(sum(cast(x as decimal(28,6))
                            * cast(y as decimal(28,6))) as double) as sxy,
                   cast(sum(cast(x as decimal(28,6))
                            * cast(x as decimal(28,6))) as double) as sxx,
                   cast(sum(cast(y as decimal(28,6))
                            * cast(y as decimal(28,6))) as double) as syy
            from p group by 1, 2)
          select user_id, k::INTEGER as lag, n_pairs,
                 round(case when n_pairs >= 2
                             and n_pairs * sxx - sx * sx > 0
                             and n_pairs * syy - sy * sy > 0
                       then (n_pairs * sxy - sx * sy)
                            / (sqrt(n_pairs * sxx - sx * sx)
                               * sqrt(n_pairs * syy - sy * sy))
                       end, 6) as acf
          from a""",
        "triangle_count": """
          with li as (
            select l_orderkey, l_partkey from lineitem
            where l_partkey % 4 = 0),
          pr as (
            select distinct x.l_partkey as a, y.l_partkey as b
            from li x join li y using (l_orderkey)
            where x.l_partkey < y.l_partkey),
          nd as (select a as node from pr union select b from pr),
          deg as (
            select node, count(*) as d
            from (select a as node from pr
                  union all select b from pr)
            group by 1),
          rk as (select node, d * 4294967296 + node as r from deg),
          o as (
            select case when ra.r < rb.r then pr.a else pr.b end as lo,
                   case when ra.r < rb.r then pr.b else pr.a end as hi,
                   greatest(ra.r, rb.r) as rkhi
            from pr join rk ra on pr.a = ra.node
                    join rk rb on pr.b = rb.node),
          w as (
            select o1.lo, o1.hi as h1, o2.hi as h2
            from o o1 join o o2
              on o1.lo = o2.lo and o1.rkhi < o2.rkhi),
          t as (
            select w.lo, w.h1, w.h2 from w
            join o on o.lo = w.h1 and o.hi = w.h2),
          pn as (
            select node, count(*) as c
            from (select lo as node from t
                  union all select h1 from t
                  union all select h2 from t)
            group by 1)
          select nd.node, coalesce(pn.c, 0)::BIGINT as n_triangles
          from nd left join pn on nd.node = pn.node""",
        "quantize_embeddings": """
          with x as (
            select unnest(range(len(embedding))) as dim,
                   unnest(embedding)::DOUBLE as xv
            from embeddings),
          p as (
            select dim, min(xv) as vmin, max(xv) as vmax
            from x where xv is not null group by 1),
          c as (
            select x.dim,
                   case when p.vmax - p.vmin > 0
                        then least(floor((x.xv - p.vmin) * 255.0::DOUBLE
                                         / (p.vmax - p.vmin)),
                                   255.0::DOUBLE)
                        else 0.0 end as code
            from x join p using (dim))
          select dim::INTEGER as dim, code::INTEGER as code,
                 count(*) as n
          from c group by 1, 2""",
        "calibration_curve": """
          with s as (
            select least(greatest((embedding[1]::DOUBLE + 0.4::DOUBLE)
                                  / 0.8::DOUBLE, 0.0::DOUBLE),
                         1.0::DOUBLE) as score,
                   (label % 2)::BIGINT as y
            from embeddings),
          d as (
            select least(greatest(floor(score * 10.0::DOUBLE),
                                  0.0::DOUBLE), 9.0::DOUBLE)::BIGINT as bin,
                   floor(score * 1000000.0::DOUBLE)::DECIMAL(28,0) as sppm,
                   y
            from s where score is not null and y is not null),
          a as (
            select bin, count(*) as n,
                   cast(sum(sppm) as double) as ss,
                   sum(y)::BIGINT as pos
            from d group by 1)
          select bin, n,
                 round(ss / n / 1000000.0::DOUBLE, 6) as mean_score,
                 round(pos::DOUBLE / n::DOUBLE, 6) as frac_pos
          from a""",
        "chi2_assoc": """
          with base as (
            select event_type,
                   cast(floor(value / 10) as BIGINT)::varchar
                     as value_bucket,
                   (user_id % 3)::varchar as y
            from events),
          m as (
            select 'event_type' as f,
                   coalesce(event_type, chr(0) || 'null' || chr(0)) as x,
                   coalesce(y, chr(0) || 'null' || chr(0)) as y
            from base
            union all
            select 'value_bucket' as f,
                   coalesce(value_bucket, chr(0) || 'null' || chr(0)) as x,
                   coalesce(y, chr(0) || 'null' || chr(0)) as y
            from base),
          cells as (select f, x, y, count(*) as c from m group by 1, 2, 3),
          xm as (select f, x, sum(c) as cx from cells group by 1, 2),
          ym as (select f, y, sum(c) as cy from cells group by 1, 2),
          nxx as (select f, count(*) as nx from xm group by 1),
          nyy as (select f, count(*) as ny from ym group by 1),
          tot as (select f, sum(c) as n from cells group by 1),
          j as (
            select * from cells
            join xm using (f, x) join ym using (f, y) join tot using (f)),
          folded as (
            select f,
                   cast(max(n) as bigint) as n_rows,
                   count(*) as n_cells,
                   list_reduce(list_prepend(0.0::DOUBLE,
                     list((c::DOUBLE * c::DOUBLE)
                          / (cx::DOUBLE * cy::DOUBLE / n::DOUBLE)
                          order by x, y)),
                     (a, b) -> a + b) as fold
            from j group by f)
          select f as feature, n_rows, n_cells,
                 ((nx - 1) * (ny - 1))::BIGINT as dof,
                 round(fold - n_rows::DOUBLE, 6) as chi2
          from folded join nxx using (f) join nyy using (f)""",
        "rrf_fusion": """
          with d as (select doc_id, lang, n_chars from documents),
          la as (
            select lang, doc_id,
                   row_number() over (partition by lang
                     order by n_chars desc, doc_id) as rank
            from d qualify rank <= 20),
          lb as (
            select lang, doc_id,
                   row_number() over (partition by lang
                     order by (doc_id * 2654435761) % 1000003, doc_id)
                     as rank
            from d qualify rank <= 20),
          u as (
            select lang as query, doc_id as doc, 0 as src,
                   1.0::DOUBLE / (60.0::DOUBLE + rank::DOUBLE) as r
            from la
            union all
            select lang, doc_id, 1,
                   1.0::DOUBLE / (60.0::DOUBLE + rank::DOUBLE)
            from lb),
          f as (
            select query, doc, count(*)::BIGINT as n_lists,
                   list_reduce(list_prepend(0.0::DOUBLE,
                     list(r order by src)), (a, b) -> a + b) as rrf_raw
            from u group by 1, 2)
          select query, doc, n_lists, round(rrf_raw, 9) as rrf,
                 row_number() over (partition by query
                   order by rrf_raw desc, doc)::BIGINT as fused_rank
          from f""",
        "upsert_latest": """
          with o as (
            select o_orderkey, o_custkey, o_orderdate::DATE as o_orderdate,
                   (o_totalprice::decimal(18,2) * 100)::BIGINT as cents
            from orders),
          b as (
            select o_orderkey, o_custkey, o_orderdate, cents,
                   0 as layer, NULL::VARCHAR as op
            from o where o_orderkey % 3 <> 0),
          c as (
            select o_orderkey, o_custkey, o_orderdate, cents * 2 as cents,
                   1 as layer,
                   case when o_orderkey % 7 = 0 then 'D' else 'U' end as op
            from o where o_orderkey % 2 = 0),
          u as (select * from b union all select * from c),
          r as (
            select *, row_number() over (partition by o_orderkey
                        order by layer desc, o_orderdate desc) as rn
            from u)
          select o_orderkey, o_custkey, o_orderdate, cents
          from r where rn = 1 and (op is null or op <> 'D')""",
        "context_window": """
          with e as (
            select user_id, ts, event_id,
                   1 + coalesce((value::decimal(18,2) * 100)::BIGINT, 0)
                       % 199 as tok
            from events),
          b as (
            select user_id, event_id, tok,
                   cast(row_number() over (partition by user_id
                        order by ts, event_id) as bigint) as turn_idx,
                   cast(sum(tok) over (partition by user_id
                        order by ts, event_id
                        rows unbounded preceding) as bigint) as cum
            from e)
          select i.user_id, i.event_id, i.turn_idx,
                 i.tok as turn_tokens, i.cum as cum_tokens,
                 count(*) as n_context,
                 cast(sum(j.tok) as bigint) as context_tokens
          from b i join b j
            on i.user_id = j.user_id and j.turn_idx <= i.turn_idx
           and i.cum - (j.cum - j.tok) <= 512
          group by 1, 2, 3, 4, 5""",
        "cross_correlation": """
          with d as (
            select user_id,
                   epoch_us(ts) // 86400000000 as day,
                   event_type
            from events),
          counts as (
            select user_id, day,
                   cast(sum(case when event_type = 'click'
                            then 1 else 0 end) as bigint) as clicks,
                   cast(sum(case when event_type = 'purchase'
                            then 1 else 0 end) as bigint) as buys
            from d group by 1, 2),
          spine as (
            select user_id, unnest(generate_series(min(day), max(day)))
                     as day
            from d group by user_id),
          filled as (
            select spine.user_id, spine.day,
                   coalesce(counts.clicks, 0) as x,
                   coalesce(counts.buys, 0) as y
            from spine left join counts using (user_id, day)),
          sh as (
            select user_id, s.shift,
                   cast(x as double) as x,
                   cast(case s.shift
                        when -2 then lag(y, 2) over w
                        when -1 then lag(y, 1) over w
                        when 0 then y
                        when 1 then lead(y, 1) over w
                        when 2 then lead(y, 2) over w
                        end as double) as y
            from filled cross join (select unnest([-2, -1, 0, 1, 2])
                                    as shift) s
            window w as (partition by user_id, s.shift order by day)),
          p as (select * from sh where x is not null and y is not null),
          a as (
            select user_id, shift, count(*) as n_pairs,
                   cast(sum(cast(x as decimal(28,6))) as double) as sx,
                   cast(sum(cast(y as decimal(28,6))) as double) as sy,
                   cast(sum(cast(x as decimal(28,6))
                            * cast(y as decimal(28,6))) as double) as sxy,
                   cast(sum(cast(x as decimal(28,6))
                            * cast(x as decimal(28,6))) as double) as sxx,
                   cast(sum(cast(y as decimal(28,6))
                            * cast(y as decimal(28,6))) as double) as syy
            from p group by 1, 2)
          select user_id, shift::INTEGER as shift, n_pairs,
                 round(case when n_pairs >= 2
                             and n_pairs * sxx - sx * sx > 0
                             and n_pairs * syy - sy * sy > 0
                       then (n_pairs * sxy - sx * sy)
                            / (sqrt(n_pairs * sxx - sx * sx)
                               * sqrt(n_pairs * syy - sy * sy))
                       end, 6) as xcorr
          from a""",
        "phrase_search": f"""
          with ws as (
            select doc_id, {_WS} as arr from documents),
          w as (
            select doc_id,
                   unnest(list_transform(range(len(arr)),
                     i -> struct_pack(p := i, w := arr[i+1]))) as x
            from ws),
          t0 as (select doc_id, x.p as anchor from w
                 where x.w = 'table'),
          t1 as (select doc_id, x.p - 1 as anchor from w
                 where x.w = 'hash'),
          j as (select doc_id, anchor from t0
                join t1 using (doc_id, anchor))
          select doc_id, count(*) as n_matches,
                 cast(min(anchor) as bigint) as first_pos
          from j group by 1""",
        "seasonal_anomaly": """
          with d as (
            select user_id,
                   epoch_us(ts) // 86400000000 as day
            from events),
          c as (
            select user_id, day, (day + 3) % 7 as dow,
                   count(*) as n, count(*) * 2 as h
            from d group by 1, 2, 3),
          m as (
            select user_id, dow, quantile_cont(h, 0.5) as med
            from c group by 1, 2),
          v as (
            select c.user_id, c.day, c.dow, c.n, c.h, m.med,
                   abs(c.h - m.med) as dev
            from c join m using (user_id, dow)),
          md as (
            select user_id, dow, quantile_cont(dev, 0.5) as mad
            from v group by 1, 2)
          select v.user_id, v.day, v.dow, cast(v.n as bigint) as n,
                 round(case when mad > 0
                       then (h - med) / mad end, 6) as robust_z,
                 case when mad > 0
                      then abs(h - med) > 3.5::DOUBLE * mad
                      else abs(h - med) > 0 end as is_anomaly
          from v join md using (user_id, dow)""",
        "skipgram_pairs": """
          with s as (
            select user_id, event_type,
                   row_number() over (partition by user_id
                                      order by ts, event_id) as r
            from events)
          select a.event_type as center, b.event_type as context,
                 count(*) as n_pairs
          from s a join s b on a.user_id = b.user_id
               and b.r - a.r between 1 and 3
          group by 1, 2""",
        "attribution": """
          with c as (
            select event_id as cid, user_id, epoch_us(ts) as cts,
                   cast(cast(value as decimal(18,2)) * 100 as bigint)
                     as cents
            from events where event_type = 'purchase'),
          t as (
            select event_id as tid, user_id, event_type as touch_type,
                   epoch_us(ts) as tts
            from events where event_type in ('click', 'view')),
          j as (
            select c.cid, c.cents, t.touch_type, t.tts, t.tid
            from c join t on c.user_id = t.user_id
                 and t.tts < c.cts
                 and t.tts >= c.cts - 604800000000),
          w as (
            select *, count(*) over (partition by cid) as n,
                   row_number() over (partition by cid
                                      order by tts desc, tid desc) as rn
            from j)
          select touch_type,
                 count(*) as n_touches,
                 cast(sum(case when rn = 1 then 1 else 0 end) as bigint)
                   as n_last,
                 cast(coalesce(sum(case when rn = 1 then cents end), 0)
                      as bigint) as last_touch_cents,
                 cast(sum(cents * 10000 // n) as bigint) as linear_micros,
                 round(cast(sum(cents * 10000 // n) as bigint)
                       / 1000000.0, 6) as linear_value
          from w group by 1""",
        "changepoint_scan": """
          with d as (
            select user_id, epoch_us(ts) // 86400000000 as day
            from events),
          c as (
            select user_id, day, count(*) as n from d group by 1, 2),
          w as (
            select user_id, day, n,
                   coalesce(sum(n) over (partition by user_id order by day
                     rows between 7 preceding and 1 preceding), 0) as sl,
                   count(*) over (partition by user_id order by day
                     rows between 7 preceding and 1 preceding) as nl,
                   sum(n) over (partition by user_id order by day
                     rows between current row and 6 following) as sr,
                   count(*) over (partition by user_id order by day
                     rows between current row and 6 following) as nr
            from c)
          select user_id, day, n,
                 case when nl >= 3 and nr >= 3
                      then round((sr * nl - sl * nr) / (nl * nr), 6)
                 end as mean_shift,
                 coalesce(case when nl >= 3 and nr >= 3
                      then abs(sr * nl - sl * nr) > 2.0 * (nl * nr) end,
                      false) as is_changepoint
          from w""",
        "rfm_segments": """
          with o as (
            select o_custkey as key,
                   epoch_us(o_orderdate) // 86400000000 as day,
                   cast(cast(o_totalprice as decimal(18,2)) * 100
                        as bigint) as cents
            from orders),
          e as (
            select key, max(day) as last_day, count(*) as frequency,
                   cast(sum(cents) as bigint) as monetary_cents
            from o group by 1),
          e2 as (
            select key,
                   (select max(last_day) from e) - last_day
                     as recency_days,
                   frequency, monetary_cents
            from e),
          q as (
            select quantile_cont(recency_days, [0.25, 0.5, 0.75]) as qr,
                   quantile_cont(frequency, [0.25, 0.5, 0.75]) as qf,
                   quantile_cont(monetary_cents, [0.25, 0.5, 0.75]) as qm
            from e2),
          s as (
            select e2.*,
              1 + (recency_days > qr[1])::int
                + (recency_days > qr[2])::int
                + (recency_days > qr[3])::int as rq,
              1 + (frequency > qf[1])::int
                + (frequency > qf[2])::int
                + (frequency > qf[3])::int as fq,
              1 + (monetary_cents > qm[1])::int
                + (monetary_cents > qm[2])::int
                + (monetary_cents > qm[3])::int as mq
            from e2, q)
          select key as o_custkey,
                 cast(recency_days as bigint) as recency_days,
                 frequency, monetary_cents,
                 rq as r_q, fq as f_q, mq as m_q,
                 rq * 100 + fq * 10 + mq as rfm
          from s""",
        "group_auc": """
          with b as (
            select user_id % 10 as segment, value as score,
                   case when event_type = 'purchase' then 1 else 0 end
                     as y
            from events),
          r as (
            select segment, y,
                   2 * rank() over (partition by segment order by score)
                     + count(*) over (partition by segment, score) - 1
                     as h
            from b)
          select segment,
                 cast(sum(y) as bigint) as n_pos,
                 cast(sum(1 - y) as bigint) as n_neg,
                 case when sum(y) > 0 and sum(1 - y) > 0 then
                   round((sum(y * h) - sum(y) * (sum(y) + 1))
                         / (2 * sum(y) * sum(1 - y)), 6)
                 end as auc
          from r group by 1""",
        "label_churn": """
          with d as (
            select distinct user_id,
                   epoch_us(ts) // 86400000000 as day
            from events),
          g as (
            select user_id, day,
                   lead(day) over (partition by user_id order by day)
                     - day as gap_days
            from d)
          select user_id, day, cast(gap_days as bigint) as gap_days,
                 gap_days > 2 as is_churn
          from g""",
        "compaction_plan": """
          with m as (
            select source, doc_id, cast(n_chars as bigint) as bytes
            from documents),
          c as (
            select source, doc_id, bytes,
                   sum(bytes) over (partition by source
                     order by bytes desc, doc_id asc
                     rows between unbounded preceding and current row)
                     as cum
            from m),
          p as (
            select source, doc_id, bytes,
                   cast((cum - bytes) // 20000 as bigint) as bin
            from c)
          select source, doc_id, bytes, bin,
                 count(*) over (partition by source, bin) as bin_files,
                 cast(sum(bytes) over (partition by source, bin)
                      as bigint) as bin_bytes
          from p""",
        "basket_rules": """
          with it as (
            select distinct l_orderkey as bk, l_partkey as item
            from lineitem),
          c as (
            select bk, item from (
              select bk, item,
                     row_number() over (partition by bk
                                        order by item asc) as rn
              from it)
            where rn <= 32),
          s as (select item, count(*) as n_i from c group by 1),
          p as (
            select a.item as item_a, b.item as item_b,
                   count(*) as n_ab
            from c a join c b on a.bk = b.bk and a.item < b.item
            group by 1, 2 having count(*) >= 2),
          n as (select count(distinct l_orderkey) as nb from lineitem)
          select item_a, item_b, n_ab, sa.n_i as n_a, sb.n_i as n_b,
                 round(n_ab / sa.n_i, 6) as conf_ab,
                 round(n_ab / sb.n_i, 6) as conf_ba,
                 round((n_ab * nb) / (sa.n_i * sb.n_i), 6) as lift
          from p
          join s sa on p.item_a = sa.item
          join s sb on p.item_b = sb.item, n""",
        "expectations": """
          with s as (
            select count(*) as n,
                   sum(case when ts is null then 1 else 0 end) as v_ts,
                   sum(case when event_type is null or event_type not in
                       ('click', 'view', 'purchase', 'signup')
                       then 1 else 0 end) as v_set,
                   sum(case when value is null
                       or not (value between 0.0 and 10.0)
                       then 1 else 0 end) as v_btw,
                   count(distinct event_id) as u_id
            from events),
          u as (
            select 'not_null:ts' as "check",
                   cast(v_ts as bigint) as n_violations, n as n_rows
            from s
            union all
            select 'in_set:event_type', cast(v_set as bigint), n from s
            union all
            select 'between:value', cast(v_btw as bigint), n from s
            union all
            select 'unique:event_id', cast(n - u_id as bigint), n from s)
          select "check", n_violations, n_rows,
                 n_violations = 0 as passed
          from u""",
        "split_balance": """
          with b as (
            select case when user_id % 10 < 8 then 'train' else 'test'
                   end as s, value, hour(ts) as hr
            from events),
          m as (
            select s, 'value' as feature, cast(value as double) as x
            from b
            union all
            select s, 'hour', cast(hr as double) from b),
          a as (
            select feature, s, count(*) as n,
                   cast(sum(cast(x as decimal(18,6))) as double) as sx,
                   cast(sum(cast(x as decimal(18,6))
                            * cast(x as decimal(18,6))) as double) as sxx
            from m where x is not null group by 1, 2),
          j as (
            select ta.feature, ta.n as n_a, tb.n as n_b,
                   ta.sx as sxa, ta.sxx as sxxa,
                   tb.sx as sxb, tb.sxx as sxxb
            from (select * from a where s = 'train') ta
            join (select * from a where s = 'test') tb
              using (feature)),
          c as (
            select feature, n_a, n_b,
                   sxa / n_a as mean_a, sxb / n_b as mean_b,
                   (sxxa - sxa * sxa / n_a) / (n_a - 1) as var_a,
                   (sxxb - sxb * sxb / n_b) / (n_b - 1) as var_b
            from j)
          select feature, n_a, n_b,
                 round(mean_a, 6) as mean_a, round(mean_b, 6) as mean_b,
                 case when n_a > 1 and n_b > 1
                           and (var_a + var_b) / 2 > 0
                      then round((mean_a - mean_b)
                                 / sqrt((var_a + var_b) / 2), 6)
                 end as smd
          from c""",
        "assortativity": """
          with e as (
            select distinct
                   least(l_orderkey * 2, l_partkey * 2 + 1) as a,
                   greatest(l_orderkey * 2, l_partkey * 2 + 1) as b
            from lineitem
            where l_orderkey * 2 <> l_partkey * 2 + 1),
          deg as (
            select v, count(*) as d from (
              select a as v from e union all select b as v from e)
            group by 1),
          pr as (
            select da.d as dx, db.d as dy
            from e join deg da on e.a = da.v
                   join deg db on e.b = db.v),
          st as (
            select dx, dy from pr
            union all select dy as dx, dx as dy from pr),
          s as (
            select count(*) as n,
                   cast(sum(dx) as bigint) as sx,
                   cast(sum(dy) as bigint) as sy,
                   cast(sum(dx * dy) as bigint) as sxy,
                   cast(sum(dx * dx) as bigint) as sxx,
                   cast(sum(dy * dy) as bigint) as syy
            from st)
          select n as n_stubs,
                 case when n * sxx - sx * sx > 0
                           and n * syy - sy * sy > 0
                      then round((n * sxy - sx * sy)
                        / sqrt(cast(n * sxx - sx * sx as double)
                               * cast(n * syy - sy * sy as double)), 6)
                 end as assortativity
          from s""",
        "ndcg": """
          with cnt as (
            select user_id, event_type, count(*) as c
            from events group by 1, 2),
          rk as (
            select user_id, event_type,
                   row_number() over (partition by user_id
                     order by c desc, event_type asc) as rnk
            from cnt),
          tr as (
            select user_id, event_type, least(c, 5) as rel from cnt),
          r as (
            select rk.user_id as query, rk.rnk as pos,
                   coalesce(tr.rel, 0)::DOUBLE
                     / (ln(rk.rnk + 1.0) / ln(2.0)) as term
            from rk left join tr on rk.user_id = tr.user_id
                 and rk.event_type = tr.event_type
            where rk.rnk <= 3),
          d as (
            select query,
                   list_reduce(list_prepend(0.0,
                     list(term order by pos)), (a, b) -> a + b) as dcg
            from r group by 1),
          i0 as (
            select user_id as query,
                   row_number() over (partition by user_id
                     order by rel desc, event_type asc) as pos,
                   rel
            from tr),
          i as (
            select query,
                   list_reduce(list_prepend(0.0,
                     list(rel::DOUBLE / (ln(pos + 1.0) / ln(2.0))
                          order by pos)), (a, b) -> a + b) as idcg
            from i0 where pos <= 3 group by 1)
          select d.query, round(dcg, 6) as dcg, round(idcg, 6) as idcg,
                 case when idcg > 0 then round(dcg / idcg, 6) end as ndcg
          from d join i using (query)""",
        "json_extract": """
          select event_id,
                 cast(props ->> '$.k' as bigint) as k,
                 props is not null and not json_valid(props)
                   as is_corrupt
          from events""",
        "split_leakage": """
          with corpus as (
            select doc_id, text from documents
            union all
            select doc_id + 200001, upper(text) from documents),
          s as (
            select doc_id,
                   case when doc_id % 10 < 8 then 'train' else 'test'
                   end as split,
                   md5(trim(regexp_replace(regexp_replace(lower(text),
                     '[^a-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g')))
                     as content_hash
            from corpus),
          a as (
            select content_hash, count(*) as n_docs,
                   count(distinct split) as n_splits,
                   string_agg(distinct split, ',' order by split)
                     as splits
            from s group by 1)
          select * from a where n_splits > 1""",
        "business_days": """
          with d as (
            select user_id, epoch_us(ts) // 86400000000 as day
            from events),
          sp as (
            select user_id, min(day) as s, max(day) as e
            from d group by 1),
          w as (
            select user_id, s, e, s + 3 as ms, e + 3 as me from sp)
          select user_id, s, e,
                 case when e >= s then
                   (5 * ((me - me % 7) // 7) + least(me % 7, 5))
                   - (5 * ((ms - ms % 7) // 7) + least(ms % 7, 5))
                 end as n_business_days
          from w""",
        "rank_normalize": """
          select event_id, event_type, value,
                 round(cume_dist() over (partition by event_type
                                         order by value), 6) as pct
          from events""",
        "stream_novelty": """
          with h as (
            select doc_id, md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g'))) as content_hash
            from documents)
          select doc_id, content_hash from h
          where content_hash not in
            (select content_hash from h where doc_id < 250)""",
        "cohort_ltv": """
          with b as (
            select user_id as u,
                   epoch_us(ts) // 604800000000 as w,
                   case when event_type = 'purchase'
                        then cast(cast(value as decimal(18,2)) * 100
                                  as bigint)
                        else 0 end as c
            from events),
          f as (select u, min(w) as cw from b group by 1),
          sz as (select cw, count(*) as cohort_size from f group by 1),
          j as (select b.u, f.cw as cohort_week, b.w - f.cw as age_weeks,
                       b.c
                from b join f using (u)),
          a as (select cohort_week, age_weeks,
                       count(distinct u) as n_active,
                       cast(sum(c) as bigint) as revenue_cents
                from j group by 1, 2),
          cu as (select *,
                        cast(sum(revenue_cents) over (
                          partition by cohort_week order by age_weeks
                          rows between unbounded preceding
                          and current row) as bigint)
                          as cum_revenue_cents
                 from a)
          select cohort_week, age_weeks, n_active, revenue_cents,
                 cum_revenue_cents, cohort_size,
                 round(cum_revenue_cents / (cohort_size * 100), 6)
                   as ltv
          from cu join sz on cu.cohort_week = sz.cw""",
        "wow_change": """
          with d as (
            select user_id, epoch_us(ts) // 86400000000 as day
            from events),
          c as (select user_id, day, count(*) as n from d group by 1, 2),
          p as (select user_id, day + 7 as day, n as n_prev from c)
          select c.user_id, c.day, c.n, p.n_prev,
                 round((c.n - p.n_prev) / p.n_prev, 6) as pct_change
          from c left join p using (user_id, day)""",
        "cluster_medoids": """
          with cent as (
            select label as grp, s.pos as pos,
                   round(cast(sum(s.x::DOUBLE::DECIMAL(27,12)) as double)
                         / count(*), 6) as mean_val,
                   count(*) as n_members
            from (select label,
                         unnest(list_transform(embedding,
                                (x, i) -> {'pos': i - 1, 'x': x})) as s
                  from embeddings)
            group by label, s.pos),
          ex as (
            select vec_id as id, label as grp, s.pos as pos,
                   s.x::DOUBLE as x
            from (select vec_id, label,
                         unnest(list_transform(embedding,
                                (x, i) -> {'pos': i - 1, 'x': x})) as s
                  from embeddings)),
          t as (
            select ex.id, ex.grp, ex.pos,
                   (ex.x - cent.mean_val) * (ex.x - cent.mean_val)
                     as term,
                   cent.n_members
            from ex join cent using (grp, pos)),
          d2 as (
            select id, grp,
                   list_reduce(list_prepend(0.0,
                     list(term order by pos)), (a, b) -> a + b) as d2,
                   max(n_members) as n_members
            from t group by 1, 2),
          r as (
            select *, row_number() over (partition by grp
                       order by d2 asc, id asc) as rn
            from d2)
          select grp as label, id as medoid_id, round(d2, 6) as d2,
                 cast(n_members as bigint) as n_members
          from r where rn = 1""",
        "zorder": """
          with b as (
            select event_id, user_id % 256 as x,
                   cast(cast(value as decimal(18,2)) * 100 as bigint)
                     % 256 as y
            from events)
          select event_id, x, y,
                 ((((x >> 0) & 1) << 0) | (((y >> 0) & 1) << 1) | (((x >> 1) & 1) << 2) | (((y >> 1) & 1) << 3) | (((x >> 2) & 1) << 4) | (((y >> 2) & 1) << 5) | (((x >> 3) & 1) << 6) | (((y >> 3) & 1) << 7) | (((x >> 4) & 1) << 8) | (((y >> 4) & 1) << 9) | (((x >> 5) & 1) << 10) | (((y >> 5) & 1) << 11) | (((x >> 6) & 1) << 12) | (((y >> 6) & 1) << 13) | (((x >> 7) & 1) << 14) | (((y >> 7) & 1) << 15)) as zkey
          from b""",
        "prune_files": """
          with m as (
            select source, doc_id - doc_id % 50 as file_id,
                   min(n_chars) as lo, max(n_chars) as hi,
                   cast(sum(n_chars) as bigint) as bytes
            from documents group by 1, 2)
          select source, file_id, lo, hi, bytes,
                 coalesce(lo <= 600 and hi >= 300, true) as keep,
                 case when not coalesce(lo <= 600 and hi >= 300, true)
                      then bytes else 0 end as skipped_bytes
          from m""",
        "seq_pattern": """
          with b as (
            select user_id, ts, event_id,
                   case event_type when 'view' then 'v'
                        when 'click' then 'c'
                        when 'purchase' then 'p'
                        else '.' end as ch
            from events),
          f as (
            select user_id, count(*) as n_events,
                   string_agg(ch, '' order by ts, event_id) as seq
            from b group by 1)
          select user_id, n_events,
                 n_events > 10000 as truncated,
                 cast(len(regexp_extract_all(seq, 'vc*p')) as int)
                   as n_matches
          from f""",
        "hourly_profile": """
          with c as (
            select user_id,
                   (epoch_us(ts) // 3600000000) % 24 as hour,
                   count(*) as n
            from events group by 1, 2),
          r as (
            select *, row_number() over (partition by user_id
                       order by n desc, hour asc) as rn
            from c)
          select user_id,
                 cast(sum(n) as bigint) as n_total,
                 count(*) as n_hours_active,
                 cast(max(case when rn = 1 then hour end) as bigint)
                   as peak_hour,
                 round(max(case when rn = 1 then n end) / sum(n), 6)
                   as peak_share
          from r group by 1""",
        "gini": """
          with b as (
            select event_type,
                   cast(cast(value as decimal(18,2)) * 100 as bigint)
                     as c
            from events),
          r as (
            select event_type, c,
                   row_number() over (partition by event_type
                                      order by c asc) as i
            from b),
          a as (
            select event_type, count(*) as n,
                   cast(sum(c) as bigint) as total_cents,
                   cast(sum(i * c) as bigint) as s1
            from r group by 1)
          select event_type, n, total_cents,
                 case when total_cents > 0
                      then round((2 * s1 - (n + 1) * total_cents)
                                 / (n * total_cents), 6)
                 end as gini
          from a""",
        "centroid_distances": """
          with cent as (
            select label as grp, s.pos as pos,
                   round(cast(sum(s.x::DOUBLE::DECIMAL(27,12)) as double)
                         / count(*), 6) as mean_val
            from (select label,
                         unnest(list_transform(embedding,
                                (x, i) -> {'pos': i - 1, 'x': x})) as s
                  from embeddings)
            group by label, s.pos),
          p as (
            select a.grp as grp_a, b.grp as grp_b, a.pos,
                   (a.mean_val - b.mean_val)
                     * (a.mean_val - b.mean_val) as t
            from cent a join cent b
              on a.pos = b.pos and a.grp < b.grp)
          select grp_a, grp_b,
                 round(list_reduce(list_prepend(0.0,
                   list(t order by pos)), (a, b) -> a + b), 6) as d2
          from p group by 1, 2""",
        "funnel_latency": f"""
          with s as ({_SESSION_IDS_SQL}),
          f0 as (select user_id, session_id, min(ts) as t0 from s
                 where event_type = 'view' group by 1, 2),
          f1 as (select s.user_id, s.session_id, min(s.ts) as t1
                 from s join f0 using (user_id, session_id)
                 where s.event_type = 'click' and s.ts >= f0.t0
                 group by 1, 2),
          f2 as (select s.user_id, s.session_id, min(s.ts) as t2
                 from s join f1 using (user_id, session_id)
                 where s.event_type = 'purchase' and s.ts >= f1.t1
                 group by 1, 2),
          j as (select epoch_us(f0.t0) as t0, epoch_us(f1.t1) as t1,
                       epoch_us(f2.t2) as t2
                from f0
                left join f1 using (user_id, session_id)
                left join f2 using (user_id, session_id)),
          d1 as (select t1 - t0 as d from j where t1 is not null),
          d2 as (select t2 - t1 as d from j where t2 is not null)
          select 'view->click' as transition,
                 count(*) as n_completed,
                 quantile_cont(d, 0.5) as median_us,
                 round(sum(d) / count(*), 6) as mean_us
          from d1
          union all
          select 'click->purchase', count(*), quantile_cont(d, 0.5),
                 round(sum(d) / count(*), 6)
          from d2""",
        "zipf_fit": f"""
          with wc as (
            select w, count(*) as f from (
              select unnest({_WS}) as w from documents)
            group by 1 order by f desc, w asc limit 1000),
          rk as (
            select w, f, row_number() over (order by f desc, w asc)
                     as r
            from wc),
          l as (
            select r, ln(r::DOUBLE) as x, ln(f::DOUBLE) as y from rk),
          s as (
            select count(*) as n_words,
              list_reduce(list_prepend(0.0, list(x order by r)),
                          (a, b) -> a + b) as sx,
              list_reduce(list_prepend(0.0, list(y order by r)),
                          (a, b) -> a + b) as sy,
              list_reduce(list_prepend(0.0, list(x * y order by r)),
                          (a, b) -> a + b) as sxy,
              list_reduce(list_prepend(0.0, list(x * x order by r)),
                          (a, b) -> a + b) as sxx
            from l)
          select n_words,
                 round((n_words * sxy - sx * sy)
                       / (n_words * sxx - sx * sx), 6) as slope,
                 round((sy - ((n_words * sxy - sx * sy)
                              / (n_words * sxx - sx * sx)) * sx)
                       / n_words, 6) as intercept
          from s""",
        "standardized_rates": """
          with b as (
            select user_id % 2 as grp,
                   (epoch_us(ts) // 86400000000 + 3) % 7 as st,
                   case when event_type = 'purchase' then 1 else 0 end
                     as x
            from events),
          cell as (
            select grp, st, count(*) as n_gs,
                   cast(sum(x) as bigint) as x_gs
            from b group by 1, 2),
          pooled as (
            select st, cast(sum(n_gs) as bigint) as n_s
            from cell group by 1),
          tot as (select cast(sum(n_s) as bigint) as n_tot from pooled),
          j as (
            select cell.grp, cell.st, cell.n_gs, cell.x_gs,
                   pooled.n_s, tot.n_tot
            from cell join pooled using (st), tot),
          a as (
            select grp, cast(sum(n_gs) as bigint) as n,
                   cast(sum(x_gs) as bigint) as x,
                   list_reduce(list_prepend(0.0,
                     list((n_s / n_tot) * (x_gs / n_gs) order by st)),
                     (p, q) -> p + q) as std,
                   list_reduce(list_prepend(0.0,
                     list(n_s / n_tot order by st)),
                     (p, q) -> p + q) as wcov
            from j group by 1)
          select grp as variant, n,
                 round(x / n, 6) as crude_rate,
                 round(std, 6) as std_rate,
                 round(wcov, 6) as w_covered
          from a""",
        "confusion_stats": """
          with b as (
            select event_type as y,
                   case when value > 7 then 'purchase'
                        when value > 3 then 'click'
                        else 'view' end as p
            from events),
          m as (select y, p, count(*) as n from b group by 1, 2),
          t as (select y as cls, cast(sum(n) as bigint) as n_true
                from m group by 1),
          pr as (select p as cls, cast(sum(n) as bigint) as n_pred
                 from m group by 1),
          tp as (select y as cls, n as tp from m where y = p),
          j as (
            select coalesce(t.cls, pr.cls) as cls,
                   coalesce(n_true, 0) as n_true,
                   coalesce(n_pred, 0) as n_pred,
                   coalesce(tp, 0) as tp
            from t full outer join pr on t.cls = pr.cls
            left join tp on coalesce(t.cls, pr.cls) = tp.cls),
          c as (
            select cls, n_true, n_pred, tp,
                   case when n_pred > 0 then tp / n_pred end as prec,
                   case when n_true > 0 then tp / n_true end as rec
            from j)
          select cls, n_true, n_pred, tp,
                 round(prec, 6) as precision,
                 round(rec, 6) as recall,
                 round(case when prec is not null and rec is not null
                            and prec + rec > 0
                       then 2 * prec * rec / (prec + rec) end, 6) as f1
          from c""",
        "time_weighted_avg": """
          with b as (
            select user_id, epoch_us(ts) as t, event_id,
                   cast(cast(value as decimal(18,2)) * 100 as bigint)
                     as c
            from events),
          l as (
            select user_id, c,
                   lead(t) over (partition by user_id
                                 order by t, event_id) - t as span
            from b),
          a as (
            select user_id, count(*) as n_obs,
                   cast(coalesce(sum(span), 0) as bigint) as span_us,
                   cast(coalesce(sum(c * span), 0) as bigint) as wsum
            from l group by 1)
          select user_id, n_obs, span_us,
                 case when span_us > 0
                      then round(wsum / (span_us * 100), 6) end as twa
          from a""",
        "two_hop_reach": """
          with raw as (
            select l_orderkey * 2 as s, l_partkey * 2 + 1 as d
            from lineitem),
          e as (
            select distinct least(s, d) as a, greatest(s, d) as b
            from raw where s <> d),
          adj as (
            select a as u, b as v from e
            union all select b as u, a as v from e),
          deg as (select u, count(*) as degree from adj group by 1),
          mid as (select u as m from deg where degree <= 1000),
          wed as (
            select l.u, r.v as w
            from adj l
            join mid on l.v = mid.m
            join adj r on l.v = r.u
            where l.u <> r.v),
          two as (
            select u, count(distinct w) as reach2
            from wed
            where not exists (select 1 from adj d
                              where d.u = wed.u and d.v = wed.w)
            group by 1),
          capped as (
            select adj.u,
                   cast(sum(case when dg.degree > 1000 then 1 else 0
                            end) as bigint) as pivots_capped
            from adj join deg dg on adj.v = dg.u
            group by 1)
          select deg.u as node, deg.degree,
                 coalesce(two.reach2, 0) as reach2,
                 coalesce(capped.pivots_capped, 0) as pivots_capped
          from deg
          left join two on deg.u = two.u
          left join capped on deg.u = capped.u""",
        "burstiness": """
          with b as (
            select user_id, epoch_us(ts) as t, event_id from events),
          l as (
            select user_id,
                   lead(t) over (partition by user_id
                                 order by t, event_id) - t as g
            from b),
          a as (
            select user_id, count(*) as n_gaps,
                   cast(sum(g) as bigint) as sx,
                   cast(sum(cast(g as decimal(28,0))
                            * cast(g as decimal(28,0))) as double)
                     as sxx
            from l where g is not null group by 1),
          c as (
            select user_id, n_gaps, sx, sx / n_gaps as mean,
                   greatest(sxx / n_gaps
                            - (sx / n_gaps) * (sx / n_gaps), 0.0)
                     as var
            from a)
          select user_id, n_gaps,
                 (2 * sx + n_gaps) // (2 * n_gaps) as mean_gap_us,
                 case when n_gaps >= 2 and sqrt(var) + mean > 0
                      then round((sqrt(var) - mean)
                                 / (sqrt(var) + mean), 6)
                 end as b
          from c""",
        "weighted_topk": """
          with b as (
            select source, doc_id, n_chars,
                   (('0x' || substr(md5('wtk:' || cast(doc_id as varchar)), 1, 8))::BIGINT % 2147483647 + 1) / 2147483648.0 as u
            from documents where n_chars > 0),
          k as (
            select source, doc_id, n_chars,
                   -ln(u) / cast(n_chars as double) as kk
            from b),
          r as (
            select *, row_number() over (partition by source
                       order by kk asc, doc_id asc) as rn
            from k)
          select source, doc_id, n_chars, round(kk, 6) as srk
          from r where rn <= 20""",
        "fd_check": """
          with a1 as (
            select o_orderkey, count(distinct o_custkey) as nd
            from orders group by 1),
          a2 as (
            select o_custkey, count(distinct o_orderpriority) as nd
            from orders group by 1)
          select 'o_orderkey->o_custkey' as fd,
                 count(*) as n_keys,
                 cast(sum(case when nd > 1 then 1 else 0 end) as bigint)
                   as n_violating,
                 max(nd) as max_distinct
          from a1
          union all
          select 'o_custkey->o_orderpriority', count(*),
                 cast(sum(case when nd > 1 then 1 else 0 end) as bigint),
                 max(nd)
          from a2""",
        "lorenz": """
          with b as (
            select event_type,
                   cast(cast(value as decimal(18,2)) * 100 as bigint)
                     as c
            from events),
          r as (
            select event_type, c,
                   row_number() over (partition by event_type
                                      order by c asc) as rk,
                   count(*) over (partition by event_type) as n,
                   cast(sum(c) over (partition by event_type) as bigint)
                     as tot,
                   cast(sum(c) over (partition by event_type
                     order by c asc rows between unbounded preceding
                     and current row) as bigint) as cum
            from b),
          a as (
            select event_type, (rk * 10 + n - 1) // n as point,
                   rk, cum, tot
            from r)
          select event_type, point,
                 cast(max(rk) as int) as n_rows,
                 max(cum) as cum_cents,
                 case when max(tot) > 0
                      then round(max(cum) / max(tot), 6) end as cum_share
          from a group by 1, 2""",
        "stream_cdc": """
          with o as (
            select o_orderkey as k, o_custkey,
                   epoch_us(o_orderdate) // 86400000000 as day,
                   (o_totalprice::decimal(18,2) * 100)::BIGINT as cents
            from orders),
          c1 as (
            select k, o_custkey, day, cents * 2 as cents,
                   case when k % 7 = 0 then 'D' else 'U' end as op
            from o where k % 2 = 0),
          c2 as (
            select k, o_custkey, day + 1 as day, cents * 3 as cents,
                   'U' as op
            from o where k % 4 = 0
            union all
            select k, o_custkey, day - 1, cents * 5, 'U'
            from o where k % 10 = 6 and k % 7 <> 0),
          u as (select * from c1 union all select * from c2),
          r as (
            select *, row_number() over (partition by k
                       order by day desc, cents desc) as rn
            from u)
          select k, o_custkey, day, cents
          from r where rn = 1 and op <> 'D'""",
        "jsonl_roundtrip": """
          select count(*) + 1 as n_rows,
                 cast(1 as bigint) as n_corrupt,
                 cast(sum((value::decimal(18,2) * 100)::BIGINT)
                      as bigint) as sum_cents,
                 count(distinct event_id) as n_ids
          from events""",
        "cast_audit": """
          with b as (
            select event_type, cast(value as varchar) as vs, props
            from events),
          s as (
            select count(*) as n,
                   sum(case when event_type is null then 1 else 0 end)
                     as nn1,
                   sum(case when event_type is not null
                        and try_cast(event_type as int) is null
                        then 1 else 0 end) as nf1,
                   sum(case when vs is null then 1 else 0 end) as nn2,
                   sum(case when vs is not null
                        and try_cast(vs as double) is null
                        then 1 else 0 end) as nf2,
                   sum(case when props is null then 1 else 0 end)
                     as nn3,
                   sum(case when props is not null
                        and try_cast(props as int) is null
                        then 1 else 0 end) as nf3
            from b)
          select 'event_type' as col, 'int' as target_type, n as n_rows,
                 cast(nn1 as bigint) as n_null_in,
                 cast(nf1 as bigint) as n_failed from s
          union all
          select 'vs', 'double', n, cast(nn2 as bigint),
                 cast(nf2 as bigint) from s
          union all
          select 'props', 'int', n, cast(nn3 as bigint),
                 cast(nf3 as bigint) from s""",
        "cohens_kappa": """
          with b as (
            select event_type as a,
                   case when value > 7 then 'purchase'
                        when value > 3 then 'click'
                        else 'view' end as bb
            from events),
          m as (select a, bb, count(*) as n from b group by 1, 2),
          am as (select a, cast(sum(n) as bigint) as na
                 from m group by 1),
          bm as (select bb, cast(sum(n) as bigint) as nb
                 from m group by 1),
          c as (select cast(sum(na * nb) as bigint) as sab
                from am join bm on am.a = bm.bb),
          t as (select cast(sum(n) as bigint) as nn,
                       cast(coalesce(sum(case when a = bb then n end),
                                     0) as bigint) as agree
                from m)
          select nn as n,
                 round(agree / nn, 6) as po,
                 round(sab / (nn * nn), 6) as pe,
                 case when nn * nn - sab > 0
                      then round((nn * agree - sab)
                                 / (nn * nn - sab), 6) end as kappa
          from c, t""",
        "vacuum_plan": """
          with m as (
            select distinct l_partkey % 10 as snapshot_id,
                   l_partkey // 3 as path
            from lineitem),
          kept as (
            select distinct snapshot_id from m
            order by snapshot_id desc limit 3),
          live as (
            select distinct path from m
            where snapshot_id in (select snapshot_id from kept)),
          ex as (
            select * from m
            where snapshot_id not in (select snapshot_id from kept))
          select ex.path, count(*) as n_expired_refs,
                 cast(max(ex.snapshot_id) as bigint) as last_snapshot
          from ex
          where ex.path not in (select path from live)
          group by 1""",
        "debounce": """
          with b as (
            select event_id, user_id, epoch_us(ts) as t from events),
          l as (
            select event_id, user_id,
                   t - lag(t) over (partition by user_id
                                    order by t, event_id) as g
            from b)
          select event_id, user_id,
                 g is null or g > 300000000 as kept
          from l""",
        "neighbor_majority": """
          with raw as (
            select l_orderkey * 2 as s, l_partkey * 2 + 1 as d
            from lineitem),
          e as (
            select distinct least(s, d) as a, greatest(s, d) as b
            from raw where s <> d),
          adj as (
            select a as u, b as v from e
            union all select b as u, a as v from e),
          lab as (
            select distinct l_partkey * 2 + 1 as v,
                   'l' || cast(l_partkey % 5 as varchar) as l
            from lineitem),
          votes as (
            select adj.u, lab.l, count(*) as n_votes
            from adj join lab on adj.v = lab.v
            group by 1, 2),
          r as (
            select *, row_number() over (partition by u
                       order by n_votes desc, l asc) as rn
            from votes),
          tot as (
            select u, cast(sum(n_votes) as bigint)
                     as n_labeled_neighbors
            from votes group by 1)
          select r.u as node, r.l as label, r.n_votes,
                 tot.n_labeled_neighbors
          from r join tot on r.u = tot.u where rn = 1""",
        "sequential_ids": """
          with d as (
            select event_id,
                   cast((event_id * 37) % 100003 as bigint) as skey
            from events)
          select event_id, skey,
                 cast(row_number() over (order by skey) - 1 as bigint)
                   as row_id
          from d""",
        "bloom_semi_join": """
          select l_orderkey, l_partkey
          from lineitem
          where l_partkey in
            (select p_partkey from part where p_size < 10)""",
        "adamic_adar": """
          with raw as (
            select l_orderkey * 2 as s, l_partkey * 2 + 1 as d
            from lineitem where l_orderkey % 7 = 0),
          e as (
            select distinct least(s, d) as a, greatest(s, d) as b
            from raw where s <> d),
          adj as (
            select a as u, b as v from e
            union all select b as u, a as v from e),
          deg as (select u, count(*) as degree from adj group by 1),
          mid as (
            select u as m, 1.0 / ln(degree::DOUBLE) as term
            from deg where degree <= 1000),
          wed as (
            select l.u as x, r.v as y, mid.m as z, mid.term
            from adj l
            join mid on l.v = mid.m
            join adj r on mid.m = r.u
            where l.u < r.v),
          cand as (
            select x, y, z, term from wed
            where not exists (select 1 from e
                              where e.a = wed.x and e.b = wed.y))
          select x as node_a, y as node_b,
                 cast(count(*) as bigint) as common_neighbors,
                 round(list_reduce(
                   list_prepend(0.0::DOUBLE, list(term order by z)),
                   (a, b) -> a + b), 6) as aa_score
          from cand group by 1, 2""",
        "embedding_covariance": """
          with v as (
            select list_transform(embedding[1:32], x -> x::DOUBLE) as v
            from embeddings where embedding is not null),
          cells as (
            select i - 1 as dim_i, j - 1 as dim_j,
                   cast(v[i] as decimal(27,12)) as sxi,
                   cast(v[j] as decimal(27,12)) as sxj,
                   cast(v[i] * v[j] as decimal(27,12)) as sxy
            from v
            cross join unnest(generate_series(1, len(v))) as t(i)
            cross join unnest(generate_series(1, len(v))) as u(j)
            where j >= i),
          agg as (
            select dim_i, dim_j,
                   cast(count(*) as bigint) as n,
                   sum(sxi) as sxi, sum(sxj) as sxj, sum(sxy) as sxy
            from cells group by 1, 2)
          select dim_i, dim_j, n,
                 round(sxy::DOUBLE / n::DOUBLE
                       - (sxi::DOUBLE / n::DOUBLE)
                         * (sxj::DOUBLE / n::DOUBLE), 6) + 0 as cov
          from agg""",
        "interpolate_daily": """
          with raw as (
            select user_id,
                   epoch_us(cast(ts as timestamp)) as us,
                   epoch_us(cast(ts as timestamp)) // 86400000000
                     as day,
                   cast(round(value * 100) as bigint) as c,
                   event_id
            from events where event_type = 'error'),
          ranked as (
            select *, row_number() over (partition by user_id, day
                       order by us desc, event_id desc) as rn
            from raw),
          o as (select user_id, day, c from ranked where rn = 1),
          span as (
            select user_id, min(day) as lo, max(day) as hi
            from o group by 1),
          spine as (
            select user_id, unnest(generate_series(lo, hi)) as day
            from span),
          g as (
            select s.user_id, s.day, o.c
            from spine s left join o
              on s.user_id = o.user_id and s.day = o.day),
          f as (
            select user_id, day, c,
                   last_value(case when c is not null then day end
                     ignore nulls) over wp as pd,
                   last_value(c ignore nulls) over wp as pc,
                   first_value(case when c is not null then day end
                     ignore nulls) over wn as nd,
                   first_value(c ignore nulls) over wn as nc
            from g
            window
              wp as (partition by user_id order by day
                     rows between unbounded preceding and current row),
              wn as (partition by user_id order by day
                     rows between current row and unbounded following))
          select user_id, day,
                 round(case when c is not null then c / 100.0
                       else (pc * (nd - day) + nc * (day - pd))::DOUBLE
                            / (nd - pd) / 100.0 end, 6)
                   as value_interp,
                 (c is not null) as observed
          from f""",
        "stream_sessionize": f"""
          select user_id,
                 epoch_us(min(ts)) as start_us,
                 epoch_us(max(ts) + interval '30 minutes') as horizon_us,
                 cast(count(*) as bigint) as n_turns
          from ({_SESSION_IDS_SQL})
          group by user_id, session_id""",
        "stream_interval_join": """
          select c.user_id, c.event_id as click_id,
                 p.event_id as purchase_id,
                 (epoch_us(p.ts) - epoch_us(c.ts)) // 1000000 as lag_s
          from events c
          join events p
            on c.user_id = p.user_id
           and p.ts >= c.ts
           and p.ts <= c.ts + interval '4 hours'
          where c.event_type = 'click'
            and p.event_type = 'purchase'""",
        "rendezvous_shards": """
          with shards as (
            select unnest([
              'shard-00','shard-01','shard-02','shard-03',
              'shard-04','shard-05','shard-06','shard-07']) as s),
          scored as (
            select event_id, s,
                   md5(cast(event_id as varchar) || chr(1) || s) as w
            from events cross join shards),
          r as (
            select *, row_number() over (partition by event_id
                       order by w desc, s desc) as rn
            from scored)
          select event_id, s as shard from r where rn = 1""",
        "kcore": """
          with raw as (
            select l_orderkey * 2 as s, l_partkey * 2 + 1 as d
            from lineitem where l_orderkey % 7 = 0),
          e0 as (
            select distinct least(s, d) as a, greatest(s, d) as b
            from raw where s <> d),
          al1 as (
            select u from (select a as u from e0
                           union all select b from e0)
            group by u having count(*) >= 3),
          e1 as (
            select e0.a, e0.b from e0
            join al1 x on e0.a = x.u join al1 y on e0.b = y.u),
          al2 as (
            select u from (select a as u from e1
                           union all select b from e1)
            group by u having count(*) >= 3),
          e2 as (
            select e1.a, e1.b from e1
            join al2 x on e1.a = x.u join al2 y on e1.b = y.u),
          al3 as (
            select u from (select a as u from e2
                           union all select b from e2)
            group by u having count(*) >= 3),
          e3 as (
            select e2.a, e2.b from e2
            join al3 x on e2.a = x.u join al3 y on e2.b = y.u),
          al4 as (
            select u from (select a as u from e3
                           union all select b from e3)
            group by u having count(*) >= 3),
          e4 as (
            select e3.a, e3.b from e3
            join al4 x on e3.a = x.u join al4 y on e3.b = y.u)
          select u as node, cast(count(*) as bigint) as degree
          from (select a as u from e4 union all select b from e4)
          group by u having count(*) >= 3""",
        "segment_overlap": """
          with grain as (
            select distinct user_id as e, event_type as s from events),
          sizes as (select s, count(*) as n from grain group by 1),
          common as (
            select l.s as seg_a, r.s as seg_b, count(*) as n_common
            from grain l join grain r on l.e = r.e and l.s < r.s
            group by 1, 2)
          select seg_a, seg_b,
                 cast(a.n as bigint) as n_a,
                 cast(b.n as bigint) as n_b,
                 cast(n_common as bigint) as n_common,
                 round(n_common::DOUBLE
                       / (a.n + b.n - n_common)::DOUBLE, 6) as jaccard
          from common
          join sizes a on common.seg_a = a.s
          join sizes b on common.seg_b = b.s""",
        "entity_resolution": """
          with recursive d as (
            select p_partkey as id, p_name as s,
                   concat_ws(':', split_part(p_name, ' ', 1),
                     nullif(substr(split_part(p_name, ' ', 2), 1, 1), ''))
                     as b
            from part where p_name is not null),
          pairs as (
            select a.id as id_a, c.id as id_b
            from d a join d c
              on a.b = c.b and a.id < c.id
             and abs(len(a.s) - len(c.s)) <= 2
            where levenshtein(a.s, c.s) <= 2),
          e as (select id_a as a, id_b as b from pairs
                union
                select id_b as a, id_a as b from pairs),
          reach(v, r) as (
            select a, a from e
            union
            select e.a, reach.r from e join reach on reach.v = e.b),
          comp as (
            select v as doc_id, min(r) as component
            from reach group by v),
          m as (
            select comp.doc_id, comp.component,
                   len(p.p_name) as l
            from comp join part p on p.p_partkey = comp.doc_id),
          surv as (
            select component, doc_id as canonical_id
            from (select *, row_number() over (partition by component
                             order by l desc, doc_id asc) as rn
                  from m)
            where rn = 1)
          select m.doc_id, m.component, surv.canonical_id,
                 m.doc_id = surv.canonical_id as is_canonical
          from m join surv on m.component = surv.component""",
        "hash_features": """
          with toks as (
            select event_id as id, tok from (
              select event_id,
                     unnest(['event_type=' || event_type,
                             case when json_extract_string(props, '$.k')
                                       is not null
                                  then 'k=' ||
                                       json_extract_string(props, '$.k')
                             end]) as tok
              from events)
            where tok is not null),
          scored as (
            select id,
                   cast((('0x' || substr(md5(tok), 1, 8))::BIGINT) % 64
                        as int) as bucket,
                   case when ('0x' || substr(md5(tok), 9, 1))::BIGINT % 2
                             = 0
                        then 1 else -1 end as sgn
            from toks)
          select id, bucket, cast(sum(sgn) as bigint) as weight
          from scored group by 1, 2""",
        "join_cardinality": """
          with c as (
            select l_orderkey as join_key, count(*) as n
            from lineitem where l_orderkey is not null group by 1)
          select join_key,
                 cast(n as bigint) as n_left,
                 cast(n as bigint) as n_right,
                 cast(n * n as bigint) as out_rows
          from c
          order by out_rows desc, join_key
          limit 20""",
        "k_anonymity": """
          with g as (
            select user_id,
                   epoch_us(cast(ts as timestamp)) // 86400000000 as day,
                   count(*) as n
            from events group by 1, 2)
          select user_id, day, cast(n as bigint) as n,
                 round(1.0 / n, 6) as risk
          from g where n < 5""",
        "rolling_corr": """
          with base as (
            select event_id, user_id, ts,
                   cast(round(value * 100) as bigint) as x,
                   cast(round(cast(json_extract_string(props, '$.k')
                              as double) * 100) as bigint) as y
            from events),
          s as (
            select event_id,
                   count(*) over w as n,
                   sum(x) over w as sx, sum(y) over w as sy,
                   sum(x * x) over w as sxx, sum(y * y) over w as syy,
                   sum(x * y) over w as sxy
            from base
            window w as (partition by user_id order by ts, event_id
                         rows between 19 preceding and current row))
          select event_id,
                 case when n >= 3
                       and (n * sxx - sx * sx) > 0
                       and (n * syy - sy * sy) > 0
                      then round((n * sxy - sx * sy)::DOUBLE
                             / sqrt((n * sxx - sx * sx)::DOUBLE
                                    * (n * syy - sy * sy)::DOUBLE), 6)
                 end as r
          from s""",
        "incremental_rollup": """
          select user_id, event_type,
                 cast(count(*) as bigint) as n,
                 cast(sum(cast(value as decimal(18,2))) as double)
                   as sum_value,
                 cast(min(cast(value as decimal(18,2))) as double) as vmin,
                 cast(max(cast(value as decimal(18,2))) as double) as vmax,
                 cast(sum(cast(value as decimal(18,2))) as double)
                   / cast(count(*) as double) as avg_value
          from events group by 1, 2""",
        "bitmap_overlap": """
          with grain as (
            select distinct event_type as s, user_id as e from events),
          common as (
            select l.s as seg_a, r.s as seg_b,
                   cast(count(*) as bigint) as n_common
            from grain l join grain r on l.e = r.e and l.s < r.s
            group by 1, 2)
          select * from common where n_common > 0""",
        "stream_tumbling": """
          select user_id,
                 epoch_us(time_bucket(interval '1 hour', ts)) as start_us,
                 cast(count(*) as bigint) as n,
                 cast(sum(len(event_type)) as bigint) as chars
          from events group by 1, 2""",
        "time_travel": """
          with log as (
            select distinct l_partkey % 10 as snapshot_id,
                   l_partkey // 3 as path
            from lineitem),
          ops as (
            select snapshot_id, path,
                   case when (path + snapshot_id) % 5 = 0
                        then 'remove' else 'add' end as op
            from log),
          last as (
            select path, snapshot_id as added_at, op,
                   row_number() over (partition by path
                     order by snapshot_id desc) as rn
            from ops where snapshot_id <= 6)
          select path, cast(added_at as bigint) as added_at
          from last where rn = 1 and op = 'add'""",
        "sql_surface": """
          with seg as (
            select c.c_mktsegment as segment,
                   cast(count(*) as bigint) as n_orders,
                   cast(sum(cast(o.o_totalprice as decimal(18,2)))
                        as double) as revenue
            from orders o join customer c on o.o_custkey = c.c_custkey
            group by c.c_mktsegment)
          select segment, n_orders, revenue,
                 cast(rank() over (order by revenue desc, segment) as int)
                   as rnk
          from seg""",
        "arrow_features": """
          select doc_id as id,
                 cast(strlen(text) as bigint) as n_bytes,
                 cast(length(text) as bigint) as n_chars
          from documents""",
        "stratified_kfold": """
          select event_id, event_type,
                 cast((row_number() over (partition by event_type
                        order by ('0x' || substr(md5(
                          cast(event_id as varchar) || 'kfold'), 1, 8)
                          )::BIGINT,
                        event_id) - 1) % 5 as int) as fold
          from events""",
        "did_readout": """
          with c as (
            select (user_id % 2 = 0) as t,
                   (epoch_us(cast(ts as timestamp)) // 86400000000
                     >= 19740) as p,
                   cast(round(value * 100) as bigint) as v
            from events),
          a as (
            select sum(case when t and not p then v end) as s_t0,
                   count(*) filter (t and not p) as n_t0,
                   sum(case when t and p then v end) as s_tp,
                   count(*) filter (t and p) as n_tp,
                   sum(case when not t and not p then v end) as s_c0,
                   count(*) filter (not t and not p) as n_c0,
                   sum(case when not t and p then v end) as s_cp,
                   count(*) filter (not t and p) as n_cp
            from c)
          select round(s_t0::DOUBLE / n_t0::DOUBLE / 100.0, 6)
                   as mean_treat_pre,
                 round(s_tp::DOUBLE / n_tp::DOUBLE / 100.0, 6)
                   as mean_treat_post,
                 round(s_c0::DOUBLE / n_c0::DOUBLE / 100.0, 6)
                   as mean_ctrl_pre,
                 round(s_cp::DOUBLE / n_cp::DOUBLE / 100.0, 6)
                   as mean_ctrl_post,
                 round((s_tp::DOUBLE / n_tp::DOUBLE / 100.0
                        - s_t0::DOUBLE / n_t0::DOUBLE / 100.0)
                       - (s_cp::DOUBLE / n_cp::DOUBLE / 100.0
                          - s_c0::DOUBLE / n_c0::DOUBLE / 100.0), 6)
                   as did
          from a""",
        "centroid_drift": """
          with d as (
            select label as g,
                   case when vec_id % 2 = 0 then 'pre' else 'post' end
                     as p,
                   list_transform(embedding[1:16], x -> x::DOUBLE) as v
            from embeddings where embedding is not null),
          cells as (
            select g, p, i - 1 as dim,
                   cast(v[i] as decimal(27,12)) as x
            from d cross join unnest(generate_series(1, len(v))) as t(i)),
          means as (
            select g, p, dim,
                   sum(x)::DOUBLE / count(*)::DOUBLE as m
            from cells group by 1, 2, 3),
          j as (
            select a.g,
                   cast(a.m * b.m as decimal(27,12)) as ab,
                   cast(a.m * a.m as decimal(27,12)) as aa,
                   cast(b.m * b.m as decimal(27,12)) as bb
            from means a join means b
              on a.g = b.g and a.dim = b.dim
             and a.p = 'pre' and b.p = 'post'),
          s as (
            select g, sum(ab)::DOUBLE as ab, sum(aa)::DOUBLE as aa,
                   sum(bb)::DOUBLE as bb
            from j group by g)
          select g as label,
                 case when aa > 0 and bb > 0
                      then round(ab / (sqrt(aa) * sqrt(bb)), 6)
                 end as drift_cosine
          from s""",
        "frame_sample_plan": """
          with d as (
            select doc_id as id,
                   cast(round((n_chars / 50.0) * 1000) as bigint) as ms
            from documents where n_chars / 50.0 > 0)
          select id, cast(i as int) as frame_idx,
                 cast(((2 * i + 1) * ms) // 16 as bigint) as t_ms
          from d cross join unnest(generate_series(0, 7)) as t(i)""",
        "dedup_report": f"""
          with recursive pairs as ({_SIMHASH_NEAR_SQL}),
          e as (select id_a as a, id_b as b from pairs
                union
                select id_b as a, id_a as b from pairs),
          reach(v, r) as (
            select a, a from e
            union
            select e.a, reach.r from e join reach on reach.v = e.b),
          comp as (
            select v as doc_id, min(r) as c from reach group by v),
          corpus as (
            select doc_id, source from documents
            union all
            select doc_id + 200000, source from documents),
          totals as (
            select source as g, count(*) as n_docs
            from corpus group by 1),
          clustered as (
            select corpus.source as g,
                   count(*) as n_dup_members,
                   count(distinct comp.c) as n_clusters
            from comp join corpus on comp.doc_id = corpus.doc_id
            group by 1)
          select t.g as source,
                 cast(t.n_docs as bigint) as n_docs,
                 cast(coalesce(c.n_dup_members, 0) as bigint)
                   as n_dup_members,
                 cast(coalesce(c.n_clusters, 0) as bigint) as n_clusters,
                 round((coalesce(c.n_dup_members, 0)
                        - coalesce(c.n_clusters, 0))::DOUBLE
                       / t.n_docs::DOUBLE, 6) as dup_rate
          from totals t left join clustered c on t.g = c.g""",
        "stickiness": """
          with d as (
            select distinct event_type, user_id, ts::date as day
            from events),
          s7 as (
            select event_type, day,
                   count(distinct user_id) over
                     (partition by event_type order by day
                      range between interval 6 days preceding
                        and current row) as dau7
            from d
            qualify row_number() over (partition by event_type, day) = 1),
          s28 as (
            select event_type, day,
                   count(distinct user_id) over
                     (partition by event_type order by day
                      range between interval 27 days preceding
                        and current row) as dau28
            from d
            qualify row_number() over (partition by event_type, day) = 1)
          select s7.event_type, s7.day,
                 cast(s7.dau7 as bigint) as dau7,
                 cast(s28.dau28 as bigint) as dau28,
                 round(s7.dau7::DOUBLE / s28.dau28::DOUBLE, 6)
                   as stickiness
          from s7 join s28
            on s7.event_type = s28.event_type and s7.day = s28.day""",
        "dow_seasonality": """
          with cells as (
            select event_type as k,
                   (epoch_us(cast(ts as timestamp)) // 86400000000 + 3)
                     % 7 as dow,
                   cast(round(value * 100) as bigint) as c
            from events),
          d as (
            select k, dow, count(*) as n_d, sum(c) as s_d,
                   sum(cast(c * c as decimal(27,0))) as ss_d
            from cells group by 1, 2),
          ks as (
            select k, sum(n_d) as n, sum(s_d) as s, sum(ss_d) as ss,
                   sum(cast(s_d::DOUBLE * s_d::DOUBLE / n_d::DOUBLE
                            as decimal(27,12))) as sb
            from d group by 1)
          select k as event_type, cast(n as bigint) as n,
                 case when (ss::DOUBLE - s::DOUBLE * s::DOUBLE / n::DOUBLE)
                           > 0
                      then round((sb::DOUBLE
                                  - s::DOUBLE * s::DOUBLE / n::DOUBLE)
                                 / (ss::DOUBLE
                                    - s::DOUBLE * s::DOUBLE / n::DOUBLE),
                                 6)
                 end as eta2
          from ks""",
        "stream_rollup": """
          select user_id, event_type,
                 cast(count(*) as bigint) as n,
                 cast(sum(cast(value as decimal(18,2))) as double)
                   as sum_value,
                 cast(min(cast(value as decimal(18,2))) as double) as vmin,
                 cast(max(cast(value as decimal(18,2))) as double) as vmax
          from events group by 1, 2""",
        "daily_bands": """
          with c as (
            select event_type as k,
                   epoch_us(cast(ts as timestamp)) // 86400000000 as day,
                   cast(round(value * 100) as bigint) as c
            from events)
          select k as event_type, day,
                 cast(count(*) as bigint) as n,
                 quantile_cont(c, 0.25) / 100.0 as p25,
                 quantile_cont(c, 0.5) / 100.0 as p50,
                 quantile_cont(c, 0.75) / 100.0 as p75
          from c group by 1, 2""",
        "scd_overlap_audit": """
          with dim as (
            select o_custkey as k,
                   epoch_us(cast(o_orderdate as timestamp))
                     // 86400000000 as valid_from,
                   epoch_us(cast(o_orderdate as timestamp))
                     // 86400000000 + o_orderkey % 15 as valid_to
            from orders),
          f as (
            select k, valid_from,
                   lag(valid_to) over w as prev_valid_to,
                   lag(valid_from) over w as prev_from
            from dim
            window w as (partition by k order by valid_from, valid_to))
          select k, valid_from, prev_valid_to
          from f
          where (prev_valid_to is null and prev_from is not null)
             or valid_from < prev_valid_to""",
        "window_funnel": """
          with ev as (
            select user_id as k, event_type as t,
                   epoch_us(cast(ts as timestamp)) as u
            from events),
          a1 as (select k, u as t0 from ev where t = 'view'),
          h2 as (
            select a1.k, a1.t0, min(e.u) as u2
            from a1 join ev e
              on e.k = a1.k and e.t = 'click'
             and e.u > a1.t0 and e.u <= a1.t0 + 14400000000
            group by 1, 2),
          h3 as (
            select h2.k, h2.t0, min(e.u) as u3
            from h2 join ev e
              on e.k = h2.k and e.t = 'purchase'
             and e.u > h2.u2 and e.u <= h2.t0 + 14400000000
            group by 1, 2),
          d as (
            select a1.k, a1.t0,
                   case when h3.u3 is not null then 3
                        when h2.u2 is not null then 2
                        else 1 end as depth
            from a1
            left join h2 on a1.k = h2.k and a1.t0 = h2.t0
            left join h3 on a1.k = h3.k and a1.t0 = h3.t0)
          select k as user_id,
                 cast(count(*) as bigint) as n_anchors,
                 cast(max(depth) as int) as max_depth
          from d group by 1""",
        "growth_accounting": """
          with grain as (
            select distinct user_id as e,
                   epoch_us(cast(ts as timestamp)) // 86400000000 as day
            from events),
          g as (
            select e, day,
                   min(day) over (partition by e) as fday,
                   lag(day) over (partition by e order by day) as prev
            from grain),
          s as (
            select day,
                   case when day = fday then 'new'
                        when day - prev <= 7 then 'retained'
                        else 'resurrected' end as st
            from g)
          select day,
                 cast(count(*) as bigint) as n_active,
                 cast(count(*) filter (st = 'new') as bigint) as n_new,
                 cast(count(*) filter (st = 'retained') as bigint)
                   as n_retained,
                 cast(count(*) filter (st = 'resurrected') as bigint)
                   as n_resurrected
          from s group by 1""",
        "theilsen_trend": """
          with grain as (
            select user_id,
                   epoch_us(cast(ts as timestamp)) // 86400000000 as d,
                   sum(cast(round(value * 100) as bigint)) as c
            from events group by 1, 2),
          p as (
            select a.user_id as g, b.c - a.c as dy, b.d - a.d as dx
            from grain a join grain b
              on a.user_id = b.user_id and b.d > a.d)
          select g as user_id,
                 cast(count(*) as bigint) as n_pairs,
                 round(median(cast(dy as double) / cast(dx as double)), 9)
                   as slope
          from p group by 1""",
        "nelson_aalen": """
          with e as (
            select event_id, user_id, event_type, epoch_us(ts) as ts_us
            from events),
          nx as (
            select event_id, ts_us,
                   min(case when event_type = 'purchase' then ts_us end)
                     over (partition by user_id order by ts_us, event_id
                           rows between 1 following
                             and unbounded following) as nxt
            from e),
          tte as (
            select case when nxt is not null
                         and (nxt - ts_us) // 1000000 <= 259200
                   then (nxt - ts_us) // 1000000 else 259200 end as tte_sec,
                   (nxt is not null
                    and (nxt - ts_us) // 1000000 <= 259200) as observed
            from nx),
          hours as (select tte_sec // 3600 as t, observed from tte),
          agg as (
            select t,
                   sum(case when observed then 1 else 0 end) as d,
                   sum(case when not observed then 1 else 0 end) as c
            from hours group by 1),
          spine as (
            select *, coalesce(sum(d + c) over
              (order by t rows between unbounded preceding
                 and 1 preceding), 0) as before
            from agg),
          s as (
            select t, (select count(*) from hours) - before as n_at_risk,
                   d, c
            from spine),
          tm as (
            select *,
                   cast(round(d / n_at_risk, 12) as decimal(27,12)) as term
            from s)
          select cast(t as bigint) as t,
                 cast(n_at_risk as bigint) as n_at_risk,
                 cast(d as bigint) as d,
                 cast(c as bigint) as c,
                 round(cast(sum(term) over
                   (order by t rows between unbounded preceding
                      and current row) as double), 6) as cum_hazard
          from tm""",
        "item_similarity": """
          with g as (
            select distinct l_orderkey as b, l_partkey as i
            from lineitem),
          ni as (select i, count(*) as n from g group by 1),
          pr as (
            select a.i as ia, b.i as ib, count(*) as np
            from g a join g b on a.b = b.b and a.i < b.i
            group by 1, 2 having count(*) >= 2),
          bo as (
            select ia, ib, np from pr
            union all
            select ib, ia, np from pr),
          sc as (
            select bo.ia, bo.ib, bo.np,
                   cast(bo.np as double)
                     / sqrt(cast(na.n * nb.n as double)) as cos
            from bo join ni na on bo.ia = na.i
                    join ni nb on bo.ib = nb.i),
          rk as (
            select *, row_number() over
              (partition by ia order by cos desc, np desc, ib) as r
            from sc)
          select ia as item, ib as neighbor,
                 cast(np as bigint) as n_pairs,
                 round(cos, 9) as cosine, cast(r as int) as rank
          from rk where r <= 5""",
        "hll_mergeable": """
          select event_type,
                 cast(count(distinct
                   epoch_us(cast(ts as timestamp)) // 86400000000)
                   as bigint) as n_leaves,
                 cast(count(distinct user_id) as bigint) as exact_distinct,
                 true as merged_within_bounds
          from events group by 1""",
        "recency_features": """
          with e as (
            select event_id, user_id, event_type,
                   epoch_us(cast(ts as timestamp)) as u
            from events),
          r as (
            select event_id, user_id, event_type,
                   u - lag(u) over (partition by user_id, event_type
                                    order by u, event_id) as d1,
                   u - max(case when event_type = 'purchase' then u end)
                         over (partition by user_id order by u, event_id
                               rows between unbounded preceding
                                 and 1 preceding) as d2
            from e)
          select event_id, user_id, event_type,
                 cast(d1 // 1000000 as bigint) as secs_since_same_type,
                 cast(d2 // 1000000 as bigint) as secs_since_anchor
          from r""",
        "clustering_coeff": """
          with li as (
            select l_orderkey, l_partkey from lineitem
            where l_partkey % 4 = 0),
          pr as (
            select distinct x.l_partkey as a, y.l_partkey as b
            from li x join li y using (l_orderkey)
            where x.l_partkey < y.l_partkey),
          nd as (select a as node from pr union select b from pr),
          deg as (
            select node, count(*) as d
            from (select a as node from pr
                  union all select b from pr)
            group by 1),
          rk as (select node, d * 4294967296 + node as r from deg),
          o as (
            select case when ra.r < rb.r then pr.a else pr.b end as lo,
                   case when ra.r < rb.r then pr.b else pr.a end as hi,
                   greatest(ra.r, rb.r) as rkhi
            from pr join rk ra on pr.a = ra.node
                    join rk rb on pr.b = rb.node),
          w as (
            select o1.lo, o1.hi as h1, o2.hi as h2
            from o o1 join o o2
              on o1.lo = o2.lo and o1.rkhi < o2.rkhi),
          t as (
            select w.lo, w.h1, w.h2 from w
            join o on o.lo = w.h1 and o.hi = w.h2),
          pn as (
            select node, count(*) as c
            from (select lo as node from t
                  union all select h1 from t
                  union all select h2 from t)
            group by 1)
          select nd.node,
                 cast(deg.d as bigint) as degree,
                 coalesce(pn.c, 0)::BIGINT as n_triangles,
                 case when deg.d >= 2 then
                   round(cast(2 * coalesce(pn.c, 0) as double)
                         / cast(deg.d * (deg.d - 1) as double), 9)
                 else 0.0 end as coeff
          from nd join deg on nd.node = deg.node
          left join pn on nd.node = pn.node""",
        "countmin_topk": """
          with c as (
            select cast(user_id as varchar) as key, count(*) as n
            from events where user_id is not null group by 1),
          seeds as (select unnest([0, 1, 2, 3]) as seed),
          grid as (
            select seed,
                   (('0x' || substr(md5(seed || '#' || key), 1, 8))::BIGINT)
                     % 64 as bucket,
                   sum(n) as gn
            from c cross join seeds group by 1, 2),
          top as (
            select key, n as exact_n from c
            order by n desc, key asc limit 20),
          probe as (
            select key, exact_n, seed,
                   (('0x' || substr(md5(seed || '#' || key), 1, 8))::BIGINT)
                     % 64 as bucket
            from top cross join seeds)
          select key, cast(exact_n as bigint) as exact_n,
                 cast(min(gn) as bigint) as cms_est
          from probe join grid using (seed, bucket)
          group by 1, 2""",
        "gains_deciles": """
          with sc as (
            select event_id, user_id % 5 as segment,
                   (('0x' || substr(md5(cast(event_id as varchar)), 1, 8))
                     ::BIGINT) % 1001 as s,
                   case when ((('0x' || substr(md5(cast(event_id as varchar)),
                                               1, 8))::BIGINT) % 1001)
                             + ((('0x' || substr(md5('n#' ||
                                     cast(event_id as varchar)), 1, 8))
                                 ::BIGINT) % 401) - 200 >= 550
                        then 1 else 0 end as y
            from events),
          b as (
            select segment,
                   ntile(10) over (partition by segment
                                   order by s desc, event_id asc) as bin,
                   y
            from sc),
          a as (
            select segment, bin, count(*) as n, sum(y) as n_pos
            from b group by 1, 2),
          w as (
            select segment, bin, n, n_pos,
                   sum(n_pos) over (partition by segment
                                    order by bin) as cum_pos,
                   sum(n_pos) over (partition by segment) as tot_pos,
                   sum(n) over (partition by segment) as tot_n
            from a)
          select segment, cast(bin as int) as bin,
                 cast(n as bigint) as n, cast(n_pos as bigint) as n_pos,
                 cast(cum_pos as bigint) as cum_pos,
                 case when tot_pos > 0 then
                   round(cast(cum_pos as double) / cast(tot_pos as double), 9)
                 end as capture,
                 case when tot_pos > 0 then
                   round(cast(n_pos * tot_n as double)
                         / cast(n * tot_pos as double), 9)
                 end as lift
          from w""",
        "brier_scores": """
          with sc as (
            select user_id % 5 as segment,
                   (('0x' || substr(md5(cast(event_id as varchar)), 1, 8))
                     ::BIGINT) % 1001 as s,
                   case when ((('0x' || substr(md5(cast(event_id as varchar)),
                                               1, 8))::BIGINT) % 1001)
                             + ((('0x' || substr(md5('n#' ||
                                     cast(event_id as varchar)), 1, 8))
                                 ::BIGINT) % 401) - 200 >= 550
                        then 1 else 0 end as y
            from events),
          a as (
            select segment, count(*) as n, sum(y) as sy,
                   sum((s - 1000 * y) * (s - 1000 * y)) as sq
            from sc group by 1)
          select segment, cast(n as bigint) as n,
                 round(cast(sy as double) / cast(n as double), 9)
                   as base_rate,
                 round(cast(sq as double)
                       / (cast(n as double) * 1000000.0), 9) as brier,
                 case when sy > 0 and sy < n then
                   round(1.0 - (cast(sq as double)
                                / (cast(n as double) * 1000000.0))
                               / (cast(sy * (n - sy) as double)
                                  / cast(n * n as double)), 9)
                 end as brier_skill
          from a""",
        "pr_thresholds": """
          with sc as (
            select (('0x' || substr(md5(cast(event_id as varchar)), 1, 8))
                     ::BIGINT) % 1001 as s,
                   case when ((('0x' || substr(md5(cast(event_id as varchar)),
                                               1, 8))::BIGINT) % 1001)
                             + ((('0x' || substr(md5('n#' ||
                                     cast(event_id as varchar)), 1, 8))
                                 ::BIGINT) % 401) - 200 >= 550
                        then 1 else 0 end as y
            from events),
          t as (select unnest([100, 200, 300, 400, 500, 600, 700, 800,
                               900]) as th),
          a as (
            select th,
                   sum(case when s >= th then y else 0 end) as tp,
                   sum(case when s >= th then 1 else 0 end) as pp,
                   sum(y) as ap
            from sc cross join t group by 1)
          select cast(th as int) as threshold_milli,
                 cast(tp as bigint) as tp,
                 cast(pp - tp as bigint) as fp,
                 cast(ap - tp as bigint) as fn,
                 case when pp > 0 then
                   round(cast(tp as double) / cast(pp as double), 9)
                 end as "precision",
                 case when ap > 0 then
                   round(cast(tp as double) / cast(ap as double), 9)
                 end as recall,
                 case when 2 * tp + (pp - tp) + (ap - tp) > 0 then
                   round(cast(2 * tp as double)
                         / cast(2 * tp + (pp - tp) + (ap - tp) as double), 9)
                 end as f1
          from a""",
        "ols2_fit": """
          with g as (
            select user_id,
                   epoch_us(ts) // 86400000000 as d,
                   cast(sum(cast(round(value * 100) as bigint)) as bigint)
                     as c,
                   count(*) as ne
            from events group by 1, 2),
          a as (
            select user_id, count(*) as n,
                   sum(d) as s1, sum(ne) as s2, sum(c) as sy,
                   sum(d * d) as s11, sum(ne * ne) as s22,
                   sum(d * ne) as s12, sum(d * c) as s1y,
                   sum(ne * c) as s2y
            from g group by 1),
          k as (
            select user_id, n,
                   n * s11 - s1 * s1 as S11,
                   n * s22 - s2 * s2 as S22,
                   n * s12 - s1 * s2 as S12,
                   n * s1y - s1 * sy as S1y,
                   n * s2y - s2 * sy as S2y,
                   s1, s2, sy
            from a),
          b as (
            select user_id, n, s1, s2, sy,
                   cast(S11 * S22 - S12 * S12 as double) as det,
                   cast(S22 * S1y - S12 * S2y as double) as num1,
                   cast(S11 * S2y - S12 * S1y as double) as num2
            from k)
          select user_id, cast(n as bigint) as n,
                 case when n >= 3 and det <> 0.0 then
                   round(num1 / det, 9) end as b1,
                 case when n >= 3 and det <> 0.0 then
                   round(num2 / det, 9) end as b2,
                 case when n >= 3 and det <> 0.0 then
                   round((cast(sy as double)
                          - (num1 / det) * cast(s1 as double)
                          - (num2 / det) * cast(s2 as double))
                         / cast(n as double), 4) end as b0
          from b""",
        "link_jaccard": """
          with raw as (
            select l_orderkey * 2 as s, l_partkey * 2 + 1 as d
            from lineitem where l_orderkey % 7 = 0),
          e as (
            select distinct least(s, d) as a, greatest(s, d) as b
            from raw where s <> d),
          adj as (
            select a as u, b as v from e
            union all select b as u, a as v from e),
          deg as (select u, count(*) as degree from adj group by 1),
          mid as (select u as m from deg where degree <= 1000),
          wed as (
            select l.u as x, r.v as y
            from adj l
            join mid on l.v = mid.m
            join adj r on mid.m = r.u
            where l.u < r.v),
          cand as (
            select x, y from wed
            where not exists (select 1 from e
                              where e.a = wed.x and e.b = wed.y)),
          cn as (
            select x as node_a, y as node_b, count(*) as common_neighbors
            from cand group by 1, 2),
          s as (
            select cn.node_a, cn.node_b, cn.common_neighbors,
                   round(cast(cn.common_neighbors as double)
                         / cast(da.degree + db.degree
                                - cn.common_neighbors as double), 9)
                     as jaccard
            from cn
            join deg da on cn.node_a = da.u
            join deg db on cn.node_b = db.u),
          bo as (
            select node_a as node, node_b as suggestion,
                   common_neighbors, jaccard from s
            union all
            select node_b, node_a, common_neighbors, jaccard from s),
          r as (
            select node, suggestion, common_neighbors, jaccard,
                   row_number() over (partition by node
                                      order by jaccard desc,
                                               suggestion asc) as rank
            from bo)
          select node, suggestion,
                 cast(common_neighbors as bigint) as common_neighbors,
                 jaccard, cast(rank as int) as rank
          from r where rank <= 5""",
        "leakage_screen": """
          with f as (
            select cast(round(value * 100) as bigint) as value_cents,
                   cast(extract(hour from ts) as bigint) as hour,
                   user_id % 7 as user_bucket,
                   (case when event_type = 'purchase' then 1 else 0 end)
                     * 1000
                   + (('0x' || substr(md5(cast(event_id as varchar)), 1, 8))
                       ::BIGINT) % 50 as leaky_plant,
                   case when event_type = 'purchase' then 1 else 0 end
                     as label
            from events),
          m as (
            select 'value_cents' as feature, value_cents as x, label as y
            from f
            union all select 'hour', hour, label from f
            union all select 'user_bucket', user_bucket, label from f
            union all select 'leaky_plant', leaky_plant, label from f),
          a as (
            select feature, count(*) as n, sum(x) as sx, sum(y) as sy,
                   sum(x * x) as sxx, sum(x * y) as sxy
            from m where x is not null group by 1),
          c as (
            select feature, n,
                   case when cast(n * sxx - sx * sx as double) > 0
                         and cast(n * sy - sy * sy as double) > 0 then
                     round(cast(n * sxy - sx * sy as double)
                           / sqrt(cast(n * sxx - sx * sx as double)
                                  * cast(n * sy - sy * sy as double)), 9)
                   end as corr
            from a)
          select feature, cast(n as bigint) as n, corr,
                 abs(corr) as abs_corr,
                 (abs(corr) >= 0.95) as leakage_suspect
          from c""",
        "top_paths": """
          with r as (
            select user_id, event_type,
                   row_number() over (partition by user_id
                                      order by ts asc, event_id asc) as rn
            from events),
          p as (
            select user_id,
                   string_agg(event_type, '>' order by rn) as path,
                   count(*) as depth
            from r where rn <= 5 group by 1)
          select path, cast(count(*) as bigint) as n_entities,
                 cast(depth as bigint) as depth
          from p group by path, depth
          order by n_entities desc, path asc limit 20""",
        "peak_concurrency": """
          with iv as (
            select user_id, epoch_us(ts) // 86400000000 as day,
                   min(epoch_us(ts)) as t0, max(epoch_us(ts)) as t1
            from events group by 1, 2),
          deltas as (
            select day, t0 as t, 1 as delta from iv
            union all select day, t1, -1 from iv),
          run as (
            select day, delta,
                   sum(delta) over (partition by day
                                    order by t asc, delta desc) as open
            from deltas)
          select day,
                 cast(max(case when delta = 1 then open end) as bigint)
                   as peak_concurrency,
                 cast(count(*) // 2 as bigint) as n_intervals
          from run group by 1""",
        "oof_target_encode": """
          with e as (
            select event_type as key,
                   (('0x' || substr(md5(cast(event_id as varchar)), 1, 8))
                     ::BIGINT) % 5 as fold,
                   cast(round(value * 100) as bigint) as t
            from events),
          a as (
            select key, fold, count(*) as n_in_fold, sum(t) as s
            from e group by 1, 2),
          w as (
            select key, fold, n_in_fold, s,
                   sum(n_in_fold) over (partition by key) as tot_n,
                   sum(s) over (partition by key) as tot_s
            from a)
          select key, cast(fold as bigint) as fold,
                 cast(n_in_fold as bigint) as n_in_fold,
                 cast(tot_n - n_in_fold as bigint) as n_out_of_fold,
                 case when tot_n - n_in_fold > 0 then
                   round(cast(tot_s - s as double)
                         / cast(tot_n - n_in_fold as double), 9)
                 end as oof_mean
          from w""",
        "stream_enrich": """
          select 'seg' || cast(user_id % 3 as varchar) as segment,
                 cast(count(*) as bigint) as n_events,
                 cast(sum(cast(round(value * 100) as bigint)) as bigint)
                   as cents
          from events where user_id % 7 <> 0 group by 1""",
        "seasonal_decompose": """
          with daily as (
            select epoch_us(ts) // 86400000000 as day,
                   sum(cast(round(value * 100) as bigint)) as value_cents
            from events group by 1),
          t as (
            select day, value_cents,
                   count(*) over w as nw,
                   sum(value_cents) over w as sw
            from daily
            window w as (order by day asc
                         rows between 3 preceding and 3 following)),
          det as (
            select day, value_cents, nw, sw,
                   case when nw = 7 then 7 * value_cents - sw end as d7,
                   day % 7 as dop
            from t),
          sea as (
            select dop,
                   cast(sum(d7) as double)
                     / (7.0 * cast(count(*) as double)) as seasonal_raw
            from det where d7 is not null group by 1)
          select det.day, cast(det.value_cents as bigint) as value_cents,
                 case when nw = 7 then
                   round(cast(sw as double) / 7.0, 9) end as trend,
                 round(seasonal_raw, 9) as seasonal,
                 case when nw = 7 then
                   round(cast(value_cents as double)
                         - cast(sw as double) / 7.0 - seasonal_raw, 9)
                 end as remainder
          from det left join sea using (dop)""",
        "blocking_quality": """
          with d as (select doc_id, text from documents),
          allr as (
            select doc_id, text from d
            union all
            select doc_id + 100000, text || ' extrawordextra' from d),
          a as (
            select doc_id as i,
                   split_part(text, ' ', 1) || '|' ||
                     cast(length(text) // 100 as varchar) as b
            from allr),
          pairs as (
            select distinct x.i as id_a, y.i as id_b
            from a x join a y using (b) where x.i < y.i),
          tr as (select doc_id as id_a, doc_id + 100000 as id_b from d),
          m as (
            select
              (select count(*) from (select distinct i from a)) as n_records,
              (select count(*) from pairs) as n_candidate_pairs,
              (select count(*) from tr) as n_truth_pairs,
              (select count(*) from pairs
               join tr using (id_a, id_b)) as n_hits)
          select cast(n_records as bigint) as n_records,
                 cast(n_candidate_pairs as bigint) as n_candidate_pairs,
                 cast(n_truth_pairs as bigint) as n_truth_pairs,
                 cast(n_hits as bigint) as n_hits,
                 case when n_truth_pairs > 0 then
                   round(cast(n_hits as double)
                         / cast(n_truth_pairs as double), 9)
                 end as pair_completeness,
                 case when n_records > 1 then
                   round(1.0 - cast(n_candidate_pairs as double)
                               / (cast(n_records * (n_records - 1)
                                       as double) / 2.0), 9)
                 end as reduction_ratio
          from m""",
        "schema_evolution": """
          select cast(count(*) as bigint) as n_rows,
                 cast(sum(case when event_id % 2 = 0 then 1 else 0 end)
                      as bigint) as n_legacy,
                 cast(count(distinct case when event_id % 2 = 1
                                          then event_type end)
                      as bigint) as n_channels,
                 cast(sum(cast(round(value * 100) as bigint)) as bigint)
                   as cents
          from events""",
        "url_parse": """
          select doc_id,
                 case when doc_id % 10 = 0 then null
                      else source || '.example.com' end as host,
                 case when doc_id % 10 = 0 then null
                      else 'example.com' end as domain,
                 case when doc_id % 10 = 0 then null
                      else '/docs/' || cast(doc_id as varchar) end as path,
                 case when doc_id % 10 = 0 then null
                      else doc_id % 3 <> 0 end as is_https,
                 case when doc_id % 10 = 0 then null
                      else lang end as utm_source
          from documents""",
        "hdr_percentiles": """
          with v as (
            select event_type, cast(round(value * 100) as bigint) as v
            from events
            where cast(round(value * 100) as bigint) >= 1),
          b as (
            select event_type,
                   cast(length(bin(v)) as bigint) as major,
                   ((v * 16) >> (length(bin(v)) - 1)) - 16 as minor
            from v),
          sk as (
            select event_type, (major - 1) * 16 + minor as bucket,
                   major, minor, count(*) as n
            from b group by 1, 2, 3, 4),
          c as (
            select event_type, bucket, major, minor, n,
                   sum(n) over (partition by event_type
                                order by bucket) as cum,
                   sum(n) over (partition by event_type) as n_total
            from sk),
          pr as (
            select c.*, p.p_milli,
                   (p.p_milli * n_total + 999) // 1000 as target_rank
            from c cross join
                 (select unnest([500, 900, 990]) as p_milli) p),
          hit as (select * from pr where cum >= target_rank)
          select event_type, cast(p_milli as int) as p_milli,
                 cast(n_total as bigint) as n_total,
                 cast(target_rank as bigint) as target_rank,
                 arg_min(cast(((16 + minor)::BIGINT << (major - 1))
                              as double) / 16.0, bucket) as est
          from hit group by 1, 2, 3, 4""",
        "rand_index": """
          with it as (
            select n_chars // 100 as p, lang as t from documents),
          cells as (
            select p, t, count(*) as c from it group by 1, 2),
          a as (
            select cast(sum(c * (c - 1)) as double) as a,
                   cast(sum(c) as double) as n
            from cells),
          r as (
            select cast(sum(ri * (ri - 1)) as double) as rows_,
                   cast(count(*) as double) as np
            from (select p, sum(c) as ri from cells group by 1)),
          co as (
            select cast(sum(ci * (ci - 1)) as double) as cols_,
                   cast(count(*) as double) as nt
            from (select t, sum(c) as ci from cells group by 1))
          select cast(n as bigint) as n,
                 cast(np as bigint) as n_pred_clusters,
                 cast(nt as bigint) as n_truth_clusters,
                 case when n >= 2 then
                   round((a + (n * (n - 1) - rows_ - cols_ + a))
                         / (n * (n - 1)), 9) end as ri,
                 case when n >= 2
                       and (rows_ + cols_) / 2
                           <> rows_ * cols_ / (n * (n - 1)) then
                   round((a - rows_ * cols_ / (n * (n - 1)))
                         / ((rows_ + cols_) / 2
                            - rows_ * cols_ / (n * (n - 1))), 9)
                 end as ari
          from a, r, co""",
        "mix_shift": """
          with g as (
            select case when epoch_us(ts) // 86400000000 % 2 = 0
                        then 'a' else 'b' end as p,
                   event_type as segment,
                   count(*) as n,
                   sum(cast(round(value * 100) as bigint)) as cents
            from events group by 1, 2),
          t as (
            select p, segment, n, cents,
                   sum(n) over (partition by p) as tot
            from g),
          a as (select segment, n as na, cents as ca, tot as ta
                from t where p = 'a'),
          b as (select segment, n as nb, cents as cb, tot as tb
                from t where p = 'b'),
          j as (
            select coalesce(a.segment, b.segment) as segment,
                   na, ca, ta, nb, cb, tb
            from a full outer join b using (segment)),
          k as (
            select segment,
                   coalesce(cast(na as double) / cast(ta as double), 0.0)
                     as wa,
                   coalesce(cast(nb as double) / cast(tb as double), 0.0)
                     as wb,
                   coalesce(cast(ca as double) / cast(na as double),
                            cast(cb as double) / cast(nb as double)) as ra,
                   coalesce(cast(cb as double) / cast(nb as double),
                            cast(ca as double) / cast(na as double)) as rb
            from j)
          select segment,
                 round(wa, 9) as w_a, round(wb, 9) as w_b,
                 round(ra, 9) as r_a, round(rb, 9) as r_b,
                 round(wb * (rb - ra), 9) as rate_effect,
                 round((wb - wa) * ra, 9) as mix_effect
          from k""",
        "gap_streaks": """
          with d as (
            select distinct user_id as entity,
                   epoch_us(ts) // 86400000000 as day
            from events),
          g as (
            select entity, day,
                   lead(day) over (partition by entity order by day)
                     - day - 1 as gap
            from d)
          select entity,
                 cast(count(*) as bigint) as n_active_days,
                 cast(max(gap) as bigint) as max_gap_days,
                 cast(coalesce(sum(case when gap > 2 then 1 end), 0)
                      as bigint) as n_gaps_over
          from g group by 1""",
        "attribution_decay": """
          with c as (
            select event_id as cid, user_id, epoch_us(ts) as cts,
                   cast(cast(value as decimal(18,2)) * 100 as bigint)
                     as cents
            from events where event_type = 'purchase'),
          t as (
            select event_id as tid, user_id, event_type as touch_type,
                   epoch_us(ts) as tts
            from events where event_type in ('click', 'view')),
          j as (
            select c.cid, c.cents, t.touch_type,
                   1::BIGINT << cast(7 - (c.cts - t.tts) // 86400000000
                                     as int) as w
            from c join t on c.user_id = t.user_id
                 and t.tts < c.cts
                 and t.tts >= c.cts - 604800000000),
          s as (
            select *, sum(w) over (partition by cid) as sw
            from j)
          select touch_type,
                 count(*) as n_touches,
                 cast(sum(w) as bigint) as weight_sum,
                 cast(sum(cents * 10000 * w // sw) as bigint)
                   as decay_micros,
                 round(cast(sum(cents * 10000 * w // sw) as bigint)
                       / 1000000.0, 6) as decay_value
          from s group by 1""",
        "stream_topk": """
          with c as (
            select cast(user_id as varchar) as key, count(*) as n
            from events where user_id is not null group by 1),
          seeds as (select unnest([0, 1, 2, 3]) as seed),
          grid as (
            select seed,
                   (('0x' || substr(md5(seed || '#' || key), 1, 8))::BIGINT)
                     % 256 as bucket,
                   sum(n) as gn
            from c cross join seeds group by 1, 2),
          probe as (
            select key, seed,
                   (('0x' || substr(md5(seed || '#' || key), 1, 8))::BIGINT)
                     % 256 as bucket
            from c cross join seeds),
          est as (
            select key, min(gn) as cms_est
            from probe join grid using (seed, bucket) group by 1)
          select key, cast(cms_est as bigint) as cms_est
          from est order by cms_est desc, key asc limit 20""",
        "proportion_ci": """
          with a as (
            select user_id % 5 as segment, count(*) as n,
                   sum(case when event_type = 'purchase' then 1 else 0
                       end) as successes
            from events group by 1),
          k as (
            select segment, n, successes,
                   cast(successes as double) / cast(n as double) as p,
                   1.96 * 1.96 as z2,
                   cast(n as double) as nd
            from a),
          w as (
            select *,
                   1.0 + z2 / nd as denom,
                   (p + z2 / (2.0 * nd)) / (1.0 + z2 / nd) as center,
                   1.96 * sqrt(p * (1.0 - p) / nd
                               + z2 / (4.0 * nd * nd))
                     / (1.0 + z2 / nd) as half
            from k)
          select segment, cast(n as bigint) as n,
                 cast(successes as bigint) as successes,
                 round(p, 9) as rate,
                 round(greatest(center - half, 0.0), 9) as ci_low,
                 round(least(center + half, 1.0), 9) as ci_high
          from w""",
        "eb_shrink_rates": """
          with per as (
            select user_id as key, count(*) as n,
                   sum(case when event_type = 'purchase' then 1 else 0
                       end) as successes
            from events group by 1),
          r as (
            select *, cast(successes as double) / cast(n as double)
                        as raw from per),
          pri as (
            select count(*) as k,
                   sum(cast(round(raw * 1e12) as hugeint)) as sq,
                   sum(cast(round(raw * raw * 1e12) as hugeint)) as sq2
            from r),
          mo as (
            select k,
                   cast(sq as double) / (cast(k as double) * 1e12) as m,
                   cast(sq2 as double) / (cast(k as double) * 1e12) as ex2
            from pri),
          st as (
            select k, m, ex2,
                   (ex2 - m * m) * (cast(k as double)
                     / greatest(cast(k as double) - 1.0, 1.0)) as v
            from mo),
          pc as (
            select round(m, 9) as prior_mean,
                   case when k >= 2 and v > 0
                         and (m * (1.0 - m) / v - 1.0) > 0 then
                     round(m * (1.0 - m) / v - 1.0, 9)
                   end as prior_strength
            from st)
          select r.key, cast(r.n as bigint) as n,
                 cast(r.successes as bigint) as successes,
                 round(r.raw, 9) as raw_rate,
                 pc.prior_mean, pc.prior_strength,
                 round(case when pc.prior_strength is not null then
                   (cast(r.successes as double)
                    + pc.prior_mean * pc.prior_strength)
                   / (cast(r.n as double) + pc.prior_strength)
                 else r.raw end, 9) as shrunk_rate
          from r cross join pc""",
        "l_diversity": """
          with e as (
            select user_id, event_type,
                   cast(floor(value / 50) as bigint) as value_bucket
            from events),
          cells as (
            select user_id, event_type, value_bucket, count(*) as c
            from e group by 1, 2, 3),
          g as (
            select user_id, event_type,
                   sum(c) as n, count(*) as nd, max(c) as mx
            from cells group by 1, 2)
          select user_id, event_type,
                 cast(n as bigint) as n,
                 cast(nd as bigint) as n_distinct_sensitive,
                 round(cast(mx as double) / cast(n as double), 9)
                   as majority_share
          from g where nd < 2""",
        "neyman_allocation": """
          with per as (
            select event_type as stratum, count(*) as n_rows,
                   sum(cast(round(value * 100) as bigint)) as s,
                   sum(cast(round(value * 100) as bigint)
                       * cast(round(value * 100) as bigint)) as s2
            from events group by 1),
          sd as (
            select stratum, n_rows,
                   case when n_rows >= 2 then
                     sqrt(cast(n_rows * s2 - s * s as double)
                          / cast(n_rows * (n_rows - 1) as double))
                   else 0.0 end as stddev
            from per),
          w as (
            select *, cast(n_rows as double) * stddev as wgt from sd),
          tot as (
            select list_reduce(
                     list_prepend(0.0::DOUBLE,
                                  list(wgt order by stratum)),
                     (a, b) -> a + b) as t
            from w)
          select stratum, cast(n_rows as bigint) as n_rows,
                 round(stddev, 9) as stddev,
                 case when t > 0 then
                   cast(floor(1000.0 * wgt / t) as bigint)
                 else 0 end as alloc_n
          from w cross join tot""",
        "rolling_hll_users": """
          with d as (
            select distinct epoch_us(ts) // 86400000000 as dd, user_id
            from events),
          days as (select distinct dd as day from d),
          sp as (
            select dd, user_id, unnest(generate_series(dd, dd + 6))
                     as day
            from d),
          obs as (select * from sp where day in (select day from days)),
          bl as (
            select day, count(distinct dd) as n_leaves
            from obs group by 1),
          ex as (
            select day, count(distinct user_id) as exact_distinct
            from obs group by 1)
          select bl.day, cast(bl.n_leaves as bigint) as n_leaves,
                 cast(ex.exact_distinct as bigint) as exact_distinct,
                 true as merged_within_bounds
          from bl join ex using (day)""",
        "reset_cumsum": """
          with e as (
            select user_id, ts, event_id,
                   cast(round(value * 100) as bigint) as delta,
                   case when event_type = 'signup' then 1 else 0 end
                     as r
            from events),
          s as (
            select *, sum(r) over (partition by user_id
                                   order by ts asc, event_id asc
                                   rows between unbounded preceding
                                   and current row) as segment
            from e)
          select user_id, ts, event_id, delta,
                 cast(segment as bigint) as segment,
                 cast(sum(delta) over (partition by user_id, segment
                                       order by ts asc, event_id asc
                                       rows between unbounded preceding
                                       and current row) as bigint)
                   as balance
          from s""",
        "pareto_frontier": """
          with r as (
            select p_brand, p_partkey, p_size, p_retailprice,
                   max(p_retailprice) over (
                     partition by p_brand
                     order by p_size desc, p_retailprice desc,
                              p_partkey asc
                     rows between unbounded preceding and 1 preceding)
                     as prev
            from part)
          select p_brand, p_partkey as id,
                 cast(p_size as int) as x, p_retailprice as y
          from r where prev is null or p_retailprice > prev""",
        "ratio_metric_ci": """
          with per as (
            select user_id,
                   sum(case when event_type = 'purchase' then 1 else 0
                       end) as x,
                   count(*) as n
            from events group by 1),
          a as (
            select count(*) as k, sum(x) as sx, sum(n) as sn,
                   sum(x * x) as sxx, sum(n * n) as snn,
                   sum(x * n) as sxn
            from per),
          b as (
            select k, sn,
                   cast(k * sxx - sx * sx as double) as vxx,
                   cast(k * snn - sn * sn as double) as vnn,
                   cast(k * sxn - sx * sn as double) as vxn,
                   cast(sx as double) / cast(sn as double) as r,
                   cast(sn as double) / cast(k as double) as nbar,
                   cast(k as double) as kd
            from a),
          c as (
            select *,
                   sqrt(greatest(
                     (vxx / (kd * (kd - 1.0))
                      + r * r * (vnn / (kd * (kd - 1.0)))
                      - 2.0 * r * (vxn / (kd * (kd - 1.0))))
                     / (kd * nbar * nbar), 0.0)) as se
            from b)
          select cast(k as bigint) as k_clusters,
                 case when sn > 0 then round(r, 9) end as ratio,
                 case when k >= 2 and sn > 0 then round(se, 9) end as se,
                 case when k >= 2 and sn > 0 then
                   round(r - 1.96 * se, 9) end as ci_low,
                 case when k >= 2 and sn > 0 then
                   round(r + 1.96 * se, 9) end as ci_high
          from c""",
        "conformal_calibration": """
          with base as (
            select user_id % 5 as segment,
                   cast(round(value * 100) as bigint) as v,
                   (('0x' || substr(md5(cast(event_id as varchar)), 1, 8))
                     ::BIGINT) % 2 as h
            from events),
          cal as (select * from base where h = 0),
          test as (select * from base where h = 1),
          m as (
            select segment, count(*) as n_cal,
                   cast(sum(v) as double) / cast(count(*) as double)
                     as mean
            from cal group by 1),
          calr as (
            select cal.segment, cal.v, m.n_cal,
                   abs(cast(cal.v as double) - m.mean) as r
            from cal join m using (segment)),
          rk as (
            select *, row_number() over (partition by segment
                                         order by r asc, v asc) as rn
            from calr),
          q as (
            select segment, n_cal, min(r) as qhat
            from rk
            where rn >= least(cast(ceil((n_cal + 1) * 0.9) as bigint),
                              n_cal)
            group by 1, 2),
          t as (
            select test.segment,
                   abs(cast(test.v as double) - m.mean) as r
            from test join m using (segment)),
          cov as (
            select t.segment, q.n_cal, q.qhat, count(*) as n_test,
                   sum(case when t.r <= q.qhat then 1 else 0 end) as hit
            from t join q on t.segment = q.segment
            group by 1, 2, 3)
          select segment, cast(n_cal as bigint) as n_cal,
                 cast(n_test as bigint) as n_test,
                 round(qhat, 9) as qhat,
                 round(cast(hit as double) / cast(n_test as double), 9)
                   as coverage,
                 cast(0.9 as double) as target_coverage
          from cov""",
        "feature_freshness": f"""
          with rhs as ({_ORDERS_RHS_SQL}),
          j as (
            select e.user_id % 5 as segment, e.ts, rhs.ts as matched_ts
            from events e
            asof left join rhs
              on e.user_id = rhs.user_id and e.ts >= rhs.ts),
          d as (
            select segment,
                   (epoch_us(ts) - epoch_us(matched_ts)) // 86400000000
                     as days
            from j),
          g as (
            select segment, count(*) as n_rows,
                   count(days) as n_matched,
                   sum(days) as sd,
                   coalesce(sum(case when days <= 7 then 1 end), 0)
                     as ok
            from d group by 1)
          select segment, cast(n_rows as bigint) as n_rows,
                 cast(n_matched as bigint) as n_matched,
                 round(cast(n_matched as double)
                       / cast(n_rows as double), 9) as match_rate,
                 case when n_matched > 0 then
                   round(cast(sd as double)
                         / cast(n_matched as double), 9)
                 end as avg_staleness_days,
                 case when n_matched > 0 then
                   round(cast(ok as double)
                         / cast(n_matched as double), 9)
                 end as within_slo_rate
          from g""",
        "rbo_rankings": """
          with cnt as (
            select user_id, event_type, count(*) as c,
                   sum(cast(round(value * 100) as bigint)) as s
            from events group by 1, 2),
          a as (
            select user_id as query_id, event_type as item,
                   row_number() over (partition by user_id
                                      order by c desc, event_type asc)
                     as ra
            from cnt),
          b as (
            select user_id as query_id, event_type as item,
                   row_number() over (partition by user_id
                                      order by s desc, event_type asc)
                     as rb
            from cnt),
          j as (
            select a.query_id, greatest(ra, rb) as m
            from a join b using (query_id, item)
            where ra <= 5 and rb <= 5),
          g as (
            select query_id,
                   count(*) as overlap_at_depth,
                   sum(case m when 1 then 1322 when 2 then 362
                              when 3 then 122 when 4 then 42
                              when 5 then 12 end) as sc
            from j group by 1)
          select query_id, cast(overlap_at_depth as bigint)
                   as overlap_at_depth,
                 round(cast(sc as double) / 1860.0, 9) as rbo
          from g""",
        "seasonal_outliers": """
          with daily as (
            select epoch_us(ts) // 86400000000 as day,
                   sum(cast(round(value * 100) as bigint)) as value_cents
            from events group by 1),
          t as (
            select day, value_cents,
                   count(*) over w as nw,
                   sum(value_cents) over w as sw
            from daily
            window w as (order by day asc
                         rows between 3 preceding and 3 following)),
          det as (
            select day, value_cents, nw, sw,
                   case when nw = 7 then 7 * value_cents - sw end as d7,
                   day % 7 as dop
            from t),
          sea as (
            select dop,
                   cast(sum(d7) as double)
                     / (7.0 * cast(count(*) as double)) as seasonal_raw
            from det where d7 is not null group by 1),
          dc as (
            select det.day, det.value_cents,
                   case when nw = 7 then
                     round(cast(det.value_cents as double)
                           - cast(sw as double) / 7.0 - seasonal_raw, 9)
                   end as remainder
            from det left join sea using (dop)),
          r as (
            select day, value_cents, remainder from dc
            where remainder is not null),
          mr as (
            select remainder as med from (
              select remainder,
                     row_number() over (order by remainder asc,
                                        day asc) as rk,
                     count(*) over () as n
              from r)
            where rk = cast(ceil(n / 2.0) as bigint)),
          dr as (select r.*, mr.med from r cross join mr),
          madr as (
            select ad as mad from (
              select abs(remainder - med) as ad,
                     row_number() over (order by abs(remainder - med)
                                        asc, day asc) as rk,
                     count(*) over () as n
              from dr)
            where rk = cast(ceil(n / 2.0) as bigint))
          select dr.day, cast(dr.value_cents as bigint) as value_cents,
                 dr.remainder,
                 round(dr.med, 9) as med,
                 round(madr.mad, 9) as mad,
                 case when madr.mad > 0 then
                   abs(dr.remainder - dr.med) > 3.0 * madr.mad
                 else false end as is_outlier
          from dr cross join madr""",
        "quantile_treatment": """
          with base as (
            select case when user_id % 2 = 0 then 'a' else 'b' end
                     as arm,
                   cast(round(value * 100) as bigint) as v
            from events),
          r as (
            select arm, v,
                   row_number() over (partition by arm
                                      order by v asc) as rk,
                   count(*) over (partition by arm) as n
            from base),
          p as (select unnest([100, 500, 900]) as p_milli),
          pr as (
            select r.*, p.p_milli,
                   greatest((p.p_milli * n + 999) // 1000, 1) as target
            from r cross join p),
          q as (
            select p_milli,
                   max(case when arm = 'a' and rk = target then v end)
                     as q_a,
                   max(case when arm = 'b' and rk = target then v end)
                     as q_b
            from pr where rk = target group by 1)
          select cast(p_milli as int) as p_milli, q_a, q_b,
                 q_b - q_a as qte
          from q""",
        "restatement_plan": """
          with ev as (
            select event_id, user_id,
                   epoch_us(ts) // 86400000000 as day
            from events),
          state as (
            select distinct day from ev where event_id % 10 <> 0),
          late as (
            select day + (user_id % 2) * 40 as day, user_id
            from ev where event_id % 10 = 0),
          d as (
            select day as partition, count(*) as n_late_rows,
                   count(distinct user_id) as n_late_keys
            from late group by 1)
          select partition,
                 cast(n_late_rows as bigint) as n_late_rows,
                 cast(n_late_keys as bigint) as n_late_keys,
                 (partition not in (select day from state))
                   as is_new_partition
          from d""",
        "interval_align": """
          with l as (
            select user_id, min(epoch_us(ts)) as l_start,
                   max(epoch_us(ts)) + 1 as l_end
            from events
            group by user_id, epoch_us(ts) // 86400000000),
          r as (
            select user_id, epoch_us(ts) as r_start,
                   epoch_us(ts) + 14400000000 as r_end
            from events where event_type = 'purchase')
          select l.user_id, l_start, l_end, r_start, r_end,
                 least(l_end, r_end) - greatest(l_start, r_start)
                   as overlap_us
          from l join r on l.user_id = r.user_id
               and l_start < r_end and r_start < l_end""",
        "dwell_attribution": """
          with g0 as (
            select event_type,
                   lead(epoch_us(ts)) over (partition by user_id
                     order by ts asc, event_id asc) as nxt,
                   epoch_us(ts) as us
            from events),
          g as (
            select event_type,
                   case when nxt is not null then
                     floor(least((nxt - us) / 1000000, 1800.0))
                   end as dw
            from g0),
          a as (
            select event_type, count(*) as n_events,
                   sum(cast(dw as bigint)) as dwell_s_total
            from g where dw is not null group by 1),
          t as (
            select *, sum(dwell_s_total) over () as tot from a)
          select event_type, cast(n_events as bigint) as n_events,
                 cast(dwell_s_total as bigint) as dwell_s_total,
                 case when tot > 0 then
                   round(cast(dwell_s_total as double)
                         / cast(tot as double), 9)
                 end as dwell_share
          from t""",
        "benford_audit": """
          with d as (
            select cast(substr(cast(cast(round(value * 100) as bigint)
                                    as varchar), 1, 1) as int) as digit
            from events
            where cast(round(value * 100) as bigint) >= 1),
          g as (select digit, count(*) as n_obs from d group by 1),
          t as (select *, sum(n_obs) over () as n from g),
          e as (
            select *,
                   case digit
                     when 1 then 0.3010299956639812
                     when 2 then 0.17609125905568124
                     when 3 then 0.12493873660829993
                     when 4 then 0.09691001300805642
                     when 5 then 0.07918124604762482
                     when 6 then 0.06694678963061322
                     when 7 then 0.05799194697768673
                     when 8 then 0.05115252244738129
                     when 9 then 0.04575749056067514
                   end::DOUBLE as p
            from t)
          select digit, cast(n_obs as bigint) as n_obs,
                 round(p, 9) as expected_p,
                 round(cast(n_obs as double) / cast(n as double), 9)
                   as observed_p,
                 round((cast(n_obs as double) - cast(n as double) * p)
                       * (cast(n_obs as double) - cast(n as double) * p)
                       / (cast(n as double) * p), 9) as chi2_term
          from e""",
        "salt_advisor": """
          with g as (
            select cast(user_id as varchar) as key,
                   count(*) as n_rows
            from events where user_id is not null
            group by 1 order by n_rows desc, key asc limit 10)
          select key, cast(n_rows as bigint) as n_rows,
                 cast((n_rows + 49) // 50 as int) as salt_factor,
                 ((n_rows + 49) // 50) > 1 as needs_salt
          from g""",
        "python_datasource": """
          with src as (
            select i as id,
                   (('0x' || substr(md5(cast(i as varchar)), 1, 8))
                     ::BIGINT) % 1000 as bucket
            from (select unnest(generate_series(0, 4999)) as i))
          select bucket % 10 as residue,
                 cast(count(*) as bigint) as n,
                 cast(sum(id) as bigint) as id_sum,
                 cast(count(distinct bucket) as bigint) as n_buckets
          from src group by 1""",
        "variant_extract": """
          with d as (
            select event_id,
                   case when event_id % 10 = 0
                        then substr(props, 1, length(props) - 1)
                        else props end as j
            from events)
          select event_id,
                 case when json_valid(j) then
                   cast(json_extract(j, '$.k') as int) end as k,
                 case when json_valid(j) then
                   json_extract_string(j, '$.nope') end as absent,
                 json_valid(j) as is_valid_json
          from d""",
        "seasonal_naive": """
          with daily as (
            select epoch_us(ts) // 86400000000 as d,
                   sum(cast(round(value * 100) as bigint)) as a
            from events group by 1),
          j as (
            select b.a as a, p.a as f
            from daily b join daily p on p.d + 7 = b.d),
          r as (
            select a, f, abs(f - a) as err,
                   abs(a) + abs(f) as den
            from j),
          s as (
            select count(*) as n, sum(err) as sae,
                   sum(f - a) as sbias,
                   sum(cast(round(
                     case when den > 0 then
                       cast(2 * err as double) / cast(den as double)
                     else 0.0 end * 1e9) as bigint)) as ssm
            from r)
          select cast(n as bigint) as n_scored,
                 case when n > 0 then
                   round(cast(sae as double) / cast(n as double), 9)
                 end as mae_cents,
                 case when n > 0 then
                   round(cast(sbias as double) / cast(n as double), 9)
                 end as bias_cents,
                 case when n > 0 then
                   round(cast(ssm as double)
                         / (cast(n as double) * 1e9), 9)
                 end as smape
          from s""",
        "gap_sensitivity": """
          with g as (
            select user_id,
                   epoch_us(ts) - lag(epoch_us(ts)) over (
                     partition by user_id
                     order by ts asc, event_id asc) as gap
            from events),
          a as (
            select count(distinct user_id) as ne,
                   sum(case when gap > 900000000 then 1 else 0 end)
                     as b900,
                   sum(case when gap > 1800000000 then 1 else 0 end)
                     as b1800,
                   sum(case when gap > 3600000000 then 1 else 0 end)
                     as b3600
            from g)
          select cast(gap_s as int) as gap_s,
                 cast(ne as bigint) as n_entities,
                 cast(b as bigint) as n_boundaries,
                 cast(ne + b as bigint) as n_sessions
          from (
            select 900 as gap_s, ne, b900 as b from a
            union all select 1800, ne, b1800 from a
            union all select 3600, ne, b3600 from a)""",
        "markov_accuracy": """
          with t as (
            select event_type as cur,
                   lead(event_type) over (partition by user_id
                     order by ts asc, event_id asc) as nxt,
                   (epoch_us(ts) // 86400000000) % 2 = 0 as tr
            from events),
          tt as (select * from t where nxt is not null),
          train as (
            select cur, nxt, count(*) as c
            from tt where tr group by 1, 2),
          pred as (
            select cur, nxt as predicted from (
              select *, row_number() over (partition by cur
                order by c desc, nxt asc) as rn
              from train)
            where rn = 1),
          ev as (
            select tt.cur, tt.nxt, p.predicted
            from tt join pred p using (cur) where not tr)
          select cur, predicted,
                 cast(count(*) as bigint) as n_eval,
                 cast(sum(case when nxt = predicted then 1 else 0 end)
                      as bigint) as n_correct,
                 round(cast(sum(case when nxt = predicted then 1
                                else 0 end) as double)
                       / cast(count(*) as double), 9) as accuracy
          from ev group by 1, 2""",
        "dup_matrix": """
          with docs as (
            select doc_id, text, source from documents
            union all
            select doc_id + 200000, text, 'mirror'
            from documents where doc_id % 3 = 0
            union all
            select doc_id + 300000, text, 'mirror'
            from documents where doc_id % 9 = 0),
          g as (
            select md5(text) as h, source as s, count(*) as n
            from docs group by 1, 2),
          cp as (
            select x.s as source_a, y.s as source_b, x.n * y.n as p
            from g x join g y on x.h = y.h and x.s < y.s),
          wp as (
            select s as source_a, s as source_b,
                   n * (n - 1) // 2 as p
            from g where n >= 2)
          select source_a, source_b, cast(sum(p) as bigint) as n_pairs
          from (select * from cp union all select * from wp)
          group by 1, 2 having sum(p) > 0""",
        "asof_lastk": f"""
          with rhs as ({_ORDERS_RHS_SQL}),
          r2 as (
            select user_id, ts,
                   cast(cast(o_totalprice as decimal(18,2)) * 100
                        as bigint) as last1,
                   lag(cast(cast(o_totalprice as decimal(18,2)) * 100
                            as bigint), 1) over (
                     partition by user_id order by ts asc) as last2,
                   lag(cast(cast(o_totalprice as decimal(18,2)) * 100
                            as bigint), 2) over (
                     partition by user_id order by ts asc) as last3
            from rhs)
          select e.event_id, e.user_id, r2.last1, r2.last2, r2.last3
          from events e
          asof left join r2
            on e.user_id = r2.user_id and e.ts >= r2.ts""",
        "map_at_k": """
          with cnt as (
            select user_id, event_type, count(*) as c
            from events group by 1, 2),
          ranked as (
            select user_id as query_id, event_type as item,
                   row_number() over (partition by user_id
                     order by c desc, event_type asc) as rank
            from cnt),
          truth as (
            select user_id as query_id, event_type as item
            from cnt where c >= 3),
          nrel as (
            select query_id, count(*) as n_rel from truth group by 1),
          hits as (
            select r.query_id, r.rank
            from ranked r join truth t using (query_id, item)
            where r.rank <= 5),
          terms as (
            select query_id, rank,
                   count(*) over (partition by query_id
                     order by rank asc rows between unbounded
                     preceding and current row) as cum
            from hits),
          per as (
            select query_id, count(*) as n_hits,
                   sum(cum * (60 // rank)) as s
            from terms group by 1)
          select n.query_id, cast(n.n_rel as bigint) as n_rel,
                 cast(coalesce(p.n_hits, 0) as bigint) as n_hits,
                 round(cast(coalesce(p.s, 0) as double)
                       / cast(60 * least(5, n.n_rel) as double), 9)
                   as ap
          from nrel n left join per p using (query_id)""",
        "km_expected_life": """
          with e as (
            select event_id, user_id, event_type, epoch_us(ts) as ts_us
            from events),
          nx as (
            select event_id, ts_us,
                   min(case when event_type = 'purchase' then ts_us end)
                     over (partition by user_id order by ts_us, event_id
                           rows between 1 following
                             and unbounded following) as nxt
            from e),
          tte as (
            select case when nxt is not null
                         and (nxt - ts_us) // 1000000 <= 259200
                   then (nxt - ts_us) // 1000000 else 259200 end as tte_sec,
                   (nxt is not null
                    and (nxt - ts_us) // 1000000 <= 259200) as observed
            from nx),
          hours as (select tte_sec // 3600 as t, observed from tte),
          agg as (
            select t,
                   sum(case when observed then 1 else 0 end) as d,
                   sum(case when not observed then 1 else 0 end) as c
            from hours group by 1),
          spine as (
            select *, coalesce(sum(d + c) over
              (order by t rows between unbounded preceding
                 and 1 preceding), 0) as before
            from agg),
          s as (
            select t, (select count(*) from hours) - before as n_at_risk,
                   d, c
            from spine),
          tm as (
            select *,
                   case when d < n_at_risk then cast(
                     round(ln(1.0::DOUBLE - d / n_at_risk), 12)
                     as decimal(27,12)) end as term,
                   max(case when d >= n_at_risk then 1 else 0 end) over
                     (order by t rows between unbounded preceding
                        and current row) as dead
            from s),
          km as (
            select t,
                   case when dead = 0 then round(exp(cast(
                          sum(term) over (order by t rows between
                            unbounded preceding and current row)
                          as double)), 6)
                        else 0.0::DOUBLE end as survival
            from tm),
          pieces as (
            select t as tt,
                   survival * cast(least(coalesce(
                     lead(t) over (order by t), 72), 72) - t as double)
                     as area
            from km where t < 72),
          head as (
            select cast(-1 as bigint) as tt,
                   cast(greatest(least((select min(t) from km), 72), 0)
                        as double) as area),
          allp as (select * from pieces union all select * from head)
          select cast(72 as int) as horizon,
                 cast(count(*) as bigint) as n_pieces,
                 round(list_reduce(
                   list_prepend(0.0::DOUBLE, list(area order by tt)),
                   (a, b) -> a + b), 6) as expected_life
          from allp""",
        "harmonic_2hop": """
          with raw as (
            select l_orderkey * 2 as s, l_partkey * 2 + 1 as d
            from lineitem where l_orderkey % 7 = 0),
          e as (
            select distinct least(s, d) as a, greatest(s, d) as b
            from raw where s <> d),
          adj as (
            select a as u, b as v from e
            union all select b as u, a as v from e),
          deg as (select u, count(*) as n1 from adj group by 1),
          mid as (select u as m from deg where n1 <= 1000),
          two as (
            select distinct l.u as x, r.v as y
            from adj l
            join mid on l.v = mid.m
            join adj r on mid.m = r.u
            where l.u <> r.v),
          d2 as (
            select x, count(*) as n2 from two
            where not exists (select 1 from adj
                              where adj.u = two.x and adj.v = two.y)
            group by 1)
          select deg.u as node, cast(deg.n1 as bigint) as n1,
                 cast(coalesce(d2.n2, 0) as bigint) as n2,
                 round(cast(2 * deg.n1 + coalesce(d2.n2, 0) as double)
                       / 2.0, 9) as harmonic
          from deg left join d2 on deg.u = d2.x""",
        "pacing_curve": """
          with g as (
            select extract(hour from ts) as hour,
                   sum(cast(round(value * 100) as bigint)) as cents
            from events group by 1),
          t as (
            select *, sum(cents) over (order by hour
                        rows between unbounded preceding
                          and current row) as cum,
                   sum(cents) over () as tot
            from g)
          select cast(hour as int) as hour,
                 cast(cents as bigint) as cents,
                 round(cast(cents as double) / cast(tot as double), 9)
                   as share,
                 round(cast(cum as double) / cast(tot as double), 9)
                   as cum_share
          from t""",
        "simpsons_check": """
          with e as (
            select event_type as s,
                   case when user_id % 2 = 0 then 'a' else 'b' end
                     as arm,
                   case when value >= 20 then 1 else 0 end as y
            from events),
          per as (
            select s,
                   sum(case when arm = 'a' then y else 0 end) as xa,
                   sum(case when arm = 'a' then 1 else 0 end) as na,
                   sum(case when arm = 'b' then y else 0 end) as xb,
                   sum(case when arm = 'b' then 1 else 0 end) as nb
            from e group by 1),
          pd as (select *, xa * nb - xb * na as d from per),
          a as (
            select count(*) as n_strata,
                   sum(xa) as txa, sum(na) as tna,
                   sum(xb) as txb, sum(nb) as tnb,
                   sum(case when d > 0 then 1 else 0 end) as npos,
                   sum(case when d < 0 then 1 else 0 end) as nneg
            from pd),
          k as (
            select *, sign(cast(txa * tnb - txb * tna as double)) as ps
            from a)
          select cast(n_strata as bigint) as n_strata,
                 cast(ps as int) as pooled_sign,
                 cast(case when ps > 0 then npos when ps < 0 then nneg
                      else 0 end as bigint) as n_agree,
                 cast(case when ps > 0 then nneg when ps < 0 then npos
                      else 0 end as bigint) as n_oppose,
                 cast(n_strata - npos - nneg as bigint) as n_flat,
                 (ps <> 0 and
                  (case when ps > 0 then nneg when ps < 0 then npos
                   else 0 end)
                  > (case when ps > 0 then npos when ps < 0 then nneg
                     else 0 end)) as simpsons_flag
          from k""",
        "quantile_forecast": """
          with daily as (
            select epoch_us(ts) // 86400000000 as d,
                   sum(cast(round(value * 100) as bigint)) as a
            from events group by 1),
          h as (
            select d, a,
                   list_sort(list(a) over (order by d
                     rows between 7 preceding and 1 preceding))
                     as hist
            from daily),
          p as (
            select d, a, hist, t.tau_milli,
                   len(hist) as n
            from h cross join
                 (select unnest([100, 500, 900]) as tau_milli) t
            where len(hist) >= 1),
          s as (
            select tau_milli, a,
                   hist[greatest(cast(ceil((tau_milli * n) / 1000.0)
                                      as int), 1)] as f
            from p),
          l as (
            select tau_milli,
                   greatest(tau_milli * (a - f),
                            (tau_milli - 1000) * (a - f)) as pin,
                   case when a <= f then 1 else 0 end as cov
            from s)
          select cast(tau_milli as int) as tau_milli,
                 cast(count(*) as bigint) as n_scored,
                 round(cast(sum(pin) as double)
                       / (1000.0 * cast(count(*) as double)), 9)
                   as mean_pinball_cents,
                 round(cast(sum(cov) as double)
                       / cast(count(*) as double), 9) as coverage
          from l group by 1""",
        "embedding_health": """
          with base as (
            select vec_id, embedding from embeddings
            union all
            select vec_id + 10000, NULL from embeddings where vec_id < 5
            union all
            select vec_id + 20000,
                   list_transform(embedding, x -> 0.0::FLOAT)
            from embeddings where vec_id < 5),
          n2 as (
            select vec_id,
                   case when embedding is null then null else
                     round(list_reduce(
                       list_prepend(0.0::DOUBLE,
                         list_transform(embedding,
                           x -> x::DOUBLE * x::DOUBLE)),
                       (a, b) -> a + b), 9) end as norm2,
                   case when embedding is not null
                        then len(embedding) end as dims,
                   case when embedding is null then 1 else 0 end
                     as isn
            from base),
          stats as (
            select count(*) as n_rows, sum(isn) as n_null,
                   sum(case when norm2 = 0.0 then 1 else 0 end)
                     as n_zero,
                   min(dims) as n_dims_min, max(dims) as n_dims_max
            from n2),
          rk as (
            select norm2,
                   row_number() over (order by norm2 asc,
                                      vec_id asc) as r,
                   count(*) over () as n
            from n2 where norm2 is not null),
          p as (
            select
              max(case when r = greatest((100 * n + 999) // 1000, 1)
                  then norm2 end) as p10_norm2,
              max(case when r = greatest((500 * n + 999) // 1000, 1)
                  then norm2 end) as p50_norm2,
              max(case when r = greatest((900 * n + 999) // 1000, 1)
                  then norm2 end) as p90_norm2
            from rk)
          select cast(n_rows as bigint) as n_rows,
                 cast(n_null as bigint) as n_null,
                 cast(n_zero as bigint) as n_zero,
                 cast(n_dims_min as int) as n_dims_min,
                 cast(n_dims_max as int) as n_dims_max,
                 p10_norm2, p50_norm2, p90_norm2
          from stats cross join p""",
        "class_balance": """
          with e as (
            select event_id,
                   case when event_type = 'purchase' then 1 else 0 end
                     as label
            from events),
          c as (select label, count(*) as n from e group by 1),
          lab as (
            select label as min_label, n as n_min from c
            order by n asc, label asc limit 1),
          mx as (select max(n) as n_max from c)
          select e.event_id, cast(e.label as bigint) as label
          from e cross join lab cross join mx
          where e.label = lab.min_label
             or (('0x' || substr(md5(cast(e.event_id as varchar)),
                                 1, 8))::BIGINT) % mx.n_max
                < lab.n_min""",
        "holiday_distance": """
          with base as (
            select event_id,
                   epoch_us(ts) // 86400000000 as day
            from events),
          u as (
            select event_id, day,
                   unnest([19723, 19737, 19767]) as h
            from base),
          m as (
            select event_id,
                   min({'a': abs(day - h), 'd': day - h}) as s
            from u group by 1)
          select event_id, cast(s['d'] as bigint) as days_to_holiday
          from m""",
        "encoding_audit": """
          with base as (
            select doc_id, source,
                   case when doc_id % 10 = 0 then text || chr(65533)
                        else text end ||
                   case when doc_id % 7 = 0 then chr(195) || chr(169)
                        else '' end as t
            from documents),
          c as (
            select source,
                   len(regexp_extract_all(t, chr(65533))) as r,
                   len(regexp_extract_all(t,
                     '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]'))
                     as ctl,
                   len(regexp_extract_all(t,
                     chr(195) || '[' || chr(128) || '-' || chr(191)
                     || ']')) as m
            from base)
          select source, cast(count(*) as bigint) as n_docs,
                 cast(sum(r) as bigint) as n_replacement,
                 cast(sum(ctl) as bigint) as n_control,
                 cast(sum(m) as bigint) as n_mojibake,
                 cast(sum(case when r + ctl + m > 0 then 1 else 0 end)
                      as bigint) as n_flagged
          from c group by 1""",
        "time_to_nth": """
          with t as (
            select distinct user_id as e, epoch_us(ts) as tts
            from events where event_type = 'purchase'),
          chain as (
            select e, tts,
                   lead(tts, 2) over (partition by e
                     order by tts asc) as nth_ts
            from t),
          l as (
            select event_id as id, user_id as e, epoch_us(ts) as us
            from events),
          j as (
            select l.id, l.e, l.us, chain.nth_ts
            from l
            asof left join chain
              on l.e = chain.e and l.us < chain.tts)
          select id, e as entity,
                 case when nth_ts is not null
                       and (nth_ts - us) / 1000000 <= 259200
                 then cast(floor((nth_ts - us) / 1000000) as bigint)
                 else cast(259200 as bigint) end as tte_sec,
                 (nth_ts is not null
                  and (nth_ts - us) / 1000000 <= 259200) as observed
          from j""",
        "mrr_at_k": """
          with cnt as (
            select user_id, event_type, count(*) as c
            from events group by 1, 2),
          ranked as (
            select user_id as query_id, event_type as item,
                   row_number() over (partition by user_id
                     order by c desc, event_type asc) as rank
            from cnt),
          truth as (
            select user_id as query_id, event_type as item
            from cnt where c >= 3),
          q as (select distinct query_id from truth),
          hit as (
            select r.query_id, min(r.rank) as first_hit_rank
            from ranked r join truth t using (query_id, item)
            where r.rank <= 5 group by 1)
          select q.query_id,
                 cast(hit.first_hit_rank as int) as first_hit_rank,
                 (hit.first_hit_rank is not null) as success_at_k,
                 coalesce(round(1.0::DOUBLE
                   / cast(hit.first_hit_rank as double), 9), 0.0::DOUBLE)
                   as rr
          from q left join hit using (query_id)""",
        "cms_join_size": """
          with ca as (
            select cast(user_id as varchar) as k, count(*) as n
            from events where user_id is not null group by 1),
          cb as (
            select cast(o_custkey as varchar) as k, count(*) as n
            from orders where o_custkey is not null group by 1),
          seeds as (select unnest([0, 1, 2, 3]) as seed),
          gridA as (
            select seed,
                   (('0x' || substr(md5(seed || '#' || k), 1, 8))
                     ::BIGINT) % 128 as bucket,
                   sum(n) as n
            from ca cross join seeds group by 1, 2),
          gridB as (
            select seed,
                   (('0x' || substr(md5(seed || '#' || k), 1, 8))
                     ::BIGINT) % 128 as bucket,
                   sum(n) as n
            from cb cross join seeds group by 1, 2),
          ij as (
            select a.seed, sum(a.n * b.n) as ip
            from gridA a join gridB b using (seed, bucket)
            group by 1),
          est as (
            select min(coalesce(ij.ip, 0)) as cms_estimate
            from (select distinct seed from gridA) s
            left join ij using (seed)),
          ex as (
            select coalesce(sum(ca.n * cb.n), 0) as exact_join_rows
            from ca join cb using (k))
          select cast(exact_join_rows as bigint) as exact_join_rows,
                 cast(cms_estimate as bigint) as cms_estimate
          from ex cross join est""",
    }
