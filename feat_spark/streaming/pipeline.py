"""Structured Streaming surface of the feature engine.

The reference is a synchronous per-request library (SURVEY.md §2.10);
streaming is the north rule's scale-out upgrade path. Everything here
mirrors a batch operator 1:1 so a pipeline can run identically in
either mode:

| batch (operators/)              | streaming (here)                  |
|---------------------------------|-----------------------------------|
| tumbling_window_agg             | tumbling_stream_agg               |
| session_window_agg              | session_stream_agg                |
| sessionize + cumulative (turn   | stateful_turn_features            |
| windows)                        | (applyInPandasWithState)          |
| checkpoint.run_with_resume      | write_feature_stream (Spark's own |
|                                 | WAL checkpoint, exactly-once)     |

Late data: every aggregation takes a watermark — rows later than
``watermark`` past the max seen ``ts`` are dropped from state, the
streaming analogue of the batch engine's per-bucket watermark manifest
(plans/checkpoint.py).

Tests drive a real streaming query (file source, availableNow trigger,
memory sink) and assert parity with the batch operators on the same
rows — the strongest claim short of a live cluster.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from feat_spark.sources.synth import TRANSCRIPT_SCHEMA


def read_transcript_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType = TRANSCRIPT_SCHEMA,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-based transcript stream (parquet drops into ``path``).
    At scale this is the Iceberg/Kafka source behind the same schema."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def stream_exact_dedup(
    stream: DataFrame,
    keys=("event_id",),
    ts_col: str = "ts",
    delay: str = "3650 days",
) -> DataFrame:
    """Streaming exact deduplication with BOUNDED state:
    ``withWatermark(ts) + dropDuplicatesWithinWatermark(keys)`` keeps
    per-key state only until the watermark passes the key's event time
    plus ``delay`` — the streaming twin of ``dedup.exact_dedup``.

    ``delay`` is the maximum duplicate-arrival lag you guarantee to
    catch: duplicates carrying their ORIGINAL event time are dropped
    exactly (within the delay by state, beyond it as late data — either
    way they never re-emit), while a re-emission stamped with a FRESH
    event time past the delay passes through as a new row (its state
    was evicted) — the documented trade every bounded-state streaming
    dedup makes. At 10^12-turn
    scale this is the difference between state proportional to the
    dup-arrival window and state proportional to history (which plain
    streaming ``dropDuplicates`` would keep forever). The driver gate
    sets ``delay`` beyond the corpus' ts span, making the run exact and
    therefore batch-``distinct``-oracle-checkable, while still
    executing the watermarked operator end to end.
    """
    return stream.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
        list(keys)
    )


def tumbling_stream_agg(
    stream: DataFrame,
    duration: str = "1 hour",
    watermark: str = "2 hours",
    keys: tuple = ("conv_id",),
    ts: str = "ts",
) -> DataFrame:
    """Streaming tumbling-window rollup — same grouping expression as
    the batch ``tumbling_window_agg``; the watermark bounds state."""
    return (
        stream.withWatermark(ts, watermark)
        .groupBy(*keys, F.window(F.col(ts), duration).alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum(F.length("text")).alias("chars"),
        )
        .select(*keys, F.col("win.start").alias("win_start"),
                F.col("win.end").alias("win_end"), "n_turns", "chars")
    )


def session_stream_agg(
    stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    keys: tuple = ("conv_id",),
    ts: str = "ts",
) -> DataFrame:
    """Streaming session windows with configurable gap — the native
    ``F.session_window``, identical to the batch ``session_window_agg``."""
    return (
        stream.withWatermark(ts, watermark)
        .groupBy(*keys, F.session_window(F.col(ts), gap).alias("sw"))
        .agg(F.count(F.lit(1)).alias("n_turns"))
        .select(*keys, F.col("sw.start").alias("session_start"),
                F.col("sw.end").alias("session_horizon"), "n_turns")
    )


#: Output schema of the stateful per-turn featurizer.
TURN_STATE_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("turns_so_far", T.LongType()),
        T.StructField("session_id", T.IntegerType()),
    ]
)

#: Persisted per-conversation state: running count, last ts (micros),
#: current session id.
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("last_ts_us", T.LongType()),
        T.StructField("session_id", T.IntegerType()),
    ]
)


def _turn_feature_fn(gap_seconds: int, ttl_ms: int):
    gap_us = gap_seconds * 1_000_000

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import pandas as pd  # local: keep the closure free of module globals
        if state.hasTimedOut:
            # conversation idle past watermark + ttl: evict — without
            # this, state grows monotonically with conv cardinality
            state.remove()
            return
        # Arrow-batched, vectorized within each micro-batch group — the
        # only Python in the engine's streaming hot path, and it is
        # pandas-vectorized per BASELINE.json:15 ("no per-row Python"
        # means no row-at-a-time UDFs; stateful ops are batch-at-a-time).
        (conv_id,) = key
        n, last_ts_us, session_id = (
            state.get if state.exists else (0, None, -1)
        )
        for pdf in pdfs:
            pdf = pdf.sort_values(["turn_idx", "ts"]).reset_index(drop=True)
            ts_us = pd.Series(
                pdf["ts"].values.astype("datetime64[us]").astype("int64")
            )
            prev = ts_us.shift(1).astype("float64")
            if last_ts_us is not None:
                prev.iloc[0] = float(last_ts_us)
            new_sess = prev.isna() | (ts_us - prev > gap_us)
            # state session_id starts at -1, so cumsum lands 0-based for
            # a fresh conversation and continues exactly for a resumed one
            sess = new_sess.cumsum() + session_id
            out = pd.DataFrame(
                {
                    "conv_id": conv_id,
                    "turn_idx": pdf["turn_idx"],
                    "ts": pdf["ts"],
                    "turns_so_far": range(n + 1, n + len(pdf) + 1),
                    "session_id": sess.astype("int32"),
                }
            )
            n += len(pdf)
            last_ts_us = int(ts_us.iloc[-1])
            session_id = int(sess.iloc[-1])
            yield out
        state.update((n, last_ts_us, session_id))
        # evict when the watermark passes last activity + ttl; the max
        # with the watermark keeps the timestamp legal (> watermark) and
        # meaningful on the first batch, when the watermark is still 0
        base_ms = max(state.getCurrentWatermarkMs(), (last_ts_us or 0) // 1000)
        state.setTimeoutTimestamp(base_ms + ttl_ms)

    return fn


def stateful_turn_features(
    stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts: str = "ts",
    state_ttl: str = "30 days",
) -> DataFrame:
    """Custom stateful operator: running turn count + gap-session id per
    conversation, exactly the batch ``sessionize``/``cumulative``
    semantics, carried across micro-batches in GroupState.

    ``state_ttl`` bounds state size: a conversation idle past
    ``watermark + state_ttl`` (event time) is evicted; if it later
    resumes, it restarts as a fresh conversation. Without eviction,
    state grows with total conversation cardinality forever — the TTL
    is what makes a year-long run bounded by ACTIVE conversations.

    NOTE: within-conversation order across micro-batches follows
    arrival (file/commit) order — upstream must deliver a conversation's
    turns in turn_idx order across batches (true for log-structured
    transcript feeds; the batch engine is the replay tool when not).
    """
    gap_seconds = _parse_gap_seconds(gap)
    ttl_ms = _parse_gap_seconds(state_ttl) * 1000
    return (
        stream.withWatermark(ts, watermark)
        .groupBy("conv_id")
        .applyInPandasWithState(
            _turn_feature_fn(gap_seconds, ttl_ms),
            outputStructType=TURN_STATE_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def stateful_asof_stream(
    turns: DataFrame,
    attrs: DataFrame,
    on: str = "conv_id",
    ts: str = "ts",
    value_cols: list[str] | None = None,
    watermark: str = "2 hours",
    state_ttl: str = "30 days",
) -> DataFrame:
    """Stream-stream point-in-time join: attach the latest attribute
    state with ``ts' <= ts`` to every turn — the streaming twin of
    ``operators.asof.asof_join`` (union_window semantics).

    Mechanics: tag and union the two streams (one stateless op), group
    by key, and run ONE ``applyInPandasWithState`` step whose state is
    the compacted attribute history (see ``state_schema`` note below).
    Within a micro-batch the attach is a vectorized ``pd.merge_asof``
    over (state ∪ batch attrs); across micro-batches the history
    carries both the last-applicable attribute AND any early-arriving
    future attributes forward, so a turn in batch N matches exactly
    what the batch engine would match — whether its attribute arrived
    in batch N-1 with an older ts or in batch N-1 with a ts still
    ahead of the turn.

    Ordering contract (same as ``stateful_turn_features``): TURNS must
    arrive in ts order per conversation across micro-batches, and an
    attribute arriving LATER than a turn it should have matched cannot
    retro-update already-emitted rows — append-mode streaming reality.
    (Early-arriving attributes are fully handled; late ones are the
    watermark's job.) The batch engine is the replay/backfill tool when
    the bound is violated.
    """
    from pyspark.sql import functions as F

    rschema = {f.name: f for f in attrs.schema.fields}
    if value_cols is None:
        value_cols = [c for c in attrs.columns if c not in (on, ts)]

    out_fields = list(turns.schema.fields) + [
        T.StructField(c, rschema[c].dataType, True) for c in value_cols
    ]
    out_schema = T.StructType(out_fields)
    # State = the turn frontier + the COMPACTED attribute history:
    # attributes can carry timestamps ahead of the turns seen so far
    # (the attr feed often lands early), so "just the latest attr" is
    # wrong — keep the latest attr at-or-before the frontier plus every
    # future attr. That set is exactly what any future in-order turn
    # can match, and it stays tiny (1 + attr-arrival skew).
    state_schema = T.StructType(
        [T.StructField("max_turn_ts_us", T.LongType()),
         T.StructField("attrs_json", T.StringType())]
    )

    # Attribute values ride the union as ONE JSON string column: a
    # NULL-bearing int64 column would cross Arrow->pandas as float64 and
    # silently lose low bits of 64-bit hashes; JSON keeps integers exact
    # and the per-attr-row parse cost is negligible (attrs are the
    # slowly-changing side).
    tagged_turns = turns.withColumn("__src", F.lit(1))
    tagged_attrs = attrs.select(
        F.col(on),
        F.col(ts),
        F.to_json(F.struct(*[F.col(c) for c in value_cols])).alias("__attr_json"),
    ).withColumn("__src", F.lit(0))
    unified = tagged_turns.unionByName(tagged_attrs, allowMissingColumns=True)

    turn_cols = [f.name for f in turns.schema.fields]
    out_names = [f.name for f in out_schema.fields]
    vcols = list(value_cols)
    ts_col = ts
    # pandas nullable dtypes so NULL-bearing integer columns survive the
    # Arrow conversion (float64 NaN -> bigint fails), as in _asof_cogroup
    nullable = {
        f.name: ("Int64" if isinstance(f.dataType, T.LongType) else "Int32")
        for f in out_schema.fields
        if isinstance(f.dataType, (T.LongType, T.IntegerType))
    }

    ttl_ms = _parse_gap_seconds(state_ttl) * 1000

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        import json

        import pandas as pd

        if state.hasTimedOut:
            # key idle past watermark + ttl: evict attr history — this
            # (not the compaction) is what bounds state by ACTIVE keys,
            # and it also drops future-dated attrs of a stalled key
            state.remove()
            return

        def expand(json_series):
            # to_json drops NULL fields -> reindex restores them as None;
            # json preserves 64-bit integers exactly (the whole point)
            recs = [json.loads(s) if s else {} for s in json_series]
            return pd.DataFrame.from_records(recs).reindex(
                columns=vcols, fill_value=None
            ).astype(object).where(lambda d: d.notna(), None)

        if state.exists:
            max_turn_ts_us, attrs_json = state.get
            history = json.loads(attrs_json) if attrs_json else []
        else:
            max_turn_ts_us, history = None, []

        # One group's micro-batch may arrive as SEVERAL Arrow chunks
        # (chunk size follows arrow.maxRecordsPerBatch, an environment
        # detail) — attrs in a later chunk must still be visible to
        # turns in an earlier one, exactly as in the batch engine.
        # A group-batch is bounded state by this operator's contract,
        # so materializing it is safe.
        chunks = [p for p in pdfs if len(p)]
        batches = [pd.concat(chunks, ignore_index=True)] if chunks else []

        for pdf in batches:
            is_attr = pdf["__src"] == 0
            batch_attrs = [
                (int(pd.Timestamp(t).value // 1000), s)
                for t, s in zip(
                    pdf.loc[is_attr, ts_col], pdf.loc[is_attr, "__attr_json"]
                )
            ]
            # stable by ts; last-wins on duplicate attr ts = arrival
            # order, matching the batch engine's _SEQ rule
            history = sorted(history + batch_attrs, key=lambda p: p[0])
            dedup: dict[int, str] = {}
            for t_us, s in history:
                dedup[t_us] = s
            history = sorted(dedup.items())

            turn_rows = pdf[~is_attr][turn_cols].sort_values(ts_col, kind="mergesort")
            if len(turn_rows):
                if history:
                    rhs = pd.DataFrame(
                        {ts_col: pd.to_datetime(
                            [t for t, _ in history], unit="us"
                         )}
                    )
                    rhs = pd.concat(
                        [rhs, expand(pd.Series([s for _, s in history]))], axis=1
                    )
                    merged = pd.merge_asof(
                        turn_rows, rhs, on=ts_col,
                        direction="backward", allow_exact_matches=True,
                    )
                else:
                    merged = turn_rows.copy()
                    for c in vcols:
                        merged[c] = None
                merged = merged[out_names]
                for c, dt in nullable.items():
                    merged[c] = merged[c].astype(dt)
                yield merged

                batch_max = int(pd.Timestamp(turn_rows[ts_col].iloc[-1]).value // 1000)
                max_turn_ts_us = (
                    batch_max
                    if max_turn_ts_us is None
                    else max(max_turn_ts_us, batch_max)
                )

            # compact: of the attrs at-or-before the turn frontier only
            # the latest can ever match again; future attrs all stay
            if max_turn_ts_us is not None and history:
                past = [p for p in history if p[0] <= max_turn_ts_us]
                future = [p for p in history if p[0] > max_turn_ts_us]
                history = (past[-1:] if past else []) + future

        if history or max_turn_ts_us is not None:
            state.update((max_turn_ts_us, json.dumps(history)))
            # last activity = newest of (turn frontier, newest attr);
            # max with watermark keeps the timestamp legal on batch 1
            last_ms = max(
                [(max_turn_ts_us or 0) // 1000]
                + [t // 1000 for t, _ in history[-1:]]
            )
            state.setTimeoutTimestamp(
                max(state.getCurrentWatermarkMs(), last_ms) + ttl_ms
            )

    return (
        unified.withWatermark(ts, watermark)
        .groupBy(on)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def _parse_gap_seconds(gap: str) -> int:
    qty, unit = gap.split()
    mult = {"second": 1, "seconds": 1, "minute": 60, "minutes": 60,
            "hour": 3600, "hours": 3600, "day": 86400, "days": 86400}[unit]
    return int(qty) * mult


def run_to_memory(df: DataFrame, name: str, output_mode: str = "append") -> None:
    """Drain all available input into an in-memory table (tests/dev)."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def write_feature_stream(
    df: DataFrame, path: str, checkpoint: str, output_mode: str = "append"
):
    """Exactly-once parquet feature sink: Spark's WAL + file-commit
    protocol replays uncommitted micro-batches on restart — the
    streaming twin of plans/checkpoint.run_with_resume."""
    return (
        df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )


_ZSCORE_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("roll_mean", T.DoubleType()),
        T.StructField("roll_std", T.DoubleType()),
        T.StructField("zscore", T.DoubleType()),
        T.StructField("is_anomaly", T.BooleanType()),
    ]
)

# ring buffer of the last n observations as JSON ints (cents) — the
# exact-int JSON transport rule (same as the as-of attr history): ints
# survive any serialization bit-exactly, floats might not
_ZSCORE_STATE_SCHEMA = T.StructType([T.StructField("hist", T.StringType())])


def _round_half_up6(arr):
    """Spark F.round semantics: HALF_UP on the SHORTEST decimal repr of
    the double (java BigDecimal.valueOf == Python repr()), not on the
    exact binary expansion — Decimal(x) would round 2.675-style ties
    the other way. Python's round() is banker's — NOT a drop-in."""
    from decimal import ROUND_HALF_UP, Decimal

    import numpy as np

    q = Decimal("0.000001")
    return np.array(
        [
            np.nan
            if not np.isfinite(x)
            else float(Decimal(repr(float(x))).quantize(q, rounding=ROUND_HALF_UP))
            for x in arr
        ],
        dtype="float64",
    )


def _zscore_fn(n: int, min_periods: int, sigma: float, ttl_ms: int):
    def fn(key, pdfs, state: GroupState):
        import json
        from decimal import ROUND_HALF_UP, Decimal

        import numpy as np
        import pandas as pd

        if state.hasTimedOut:
            state.remove()
            return
        (user_id,) = key
        hist = json.loads(state.get[0]) if state.exists else []
        last_ts_us = None
        two = Decimal("0.01")
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
            vals = pdf["value"].to_numpy(dtype="float64", na_value=np.nan)
            # decimal(18,2) quantization, HALF_UP — the batch operator's
            # cast, replicated with exact integer cents
            cents_new = [
                None
                if not np.isfinite(v)
                else int(Decimal(repr(float(v))).quantize(two, ROUND_HALF_UP) * 100)
                for v in vals
            ]
            combined = hist + cents_new
            c = np.array(
                [np.nan if x is None else float(x) for x in combined],
                dtype="float64",
            )
            ok = ~np.isnan(c)
            csq = np.where(ok, c * c, 0.0)
            cs = np.concatenate([[0.0], np.cumsum(np.where(ok, c, 0.0))])
            cs2 = np.concatenate([[0.0], np.cumsum(csq)])
            cn = np.concatenate([[0], np.cumsum(ok.astype("int64"))])
            g = np.arange(len(pdf)) + len(hist)
            lo = np.maximum(0, g - n)
            # cent sums are exact in double (bounded window of int
            # cents), so s and sq match the batch decimal sums cast to
            # double bit-for-bit; everything after is the same IEEE
            # expression chain as the batch operator
            s = (cs[g] - cs[lo]) / 100.0
            sq = (cs2[g] - cs2[lo]) / 10000.0
            nw = (cn[g] - cn[lo]).astype("float64")
            with np.errstate(divide="ignore", invalid="ignore"):
                m = s / nw
                var = np.maximum((sq - s * s / nw) / nw, 0.0)
                sd = np.sqrt(var)
                z = np.where(
                    (nw >= min_periods) & (sd > 0), (vals - m) / sd, np.nan
                )
            have = nw >= min_periods
            out = pd.DataFrame(
                {
                    "user_id": user_id,
                    "event_id": pdf["event_id"],
                    "ts": pdf["ts"],
                    "roll_mean": _round_half_up6(np.where(have, m, np.nan)),
                    "roll_std": _round_half_up6(np.where(have, sd, np.nan)),
                    "zscore": _round_half_up6(z),
                    "is_anomaly": np.where(
                        np.isnan(z), False, np.abs(z) > sigma
                    ).astype(bool),
                }
            )
            hist = combined[-n:]
            ts_us = pdf["ts"].values.astype("datetime64[us]").astype("int64")
            last_ts_us = int(ts_us[-1])
            yield out
        state.update((json.dumps(hist),))
        base_ms = max(state.getCurrentWatermarkMs(), (last_ts_us or 0) // 1000)
        state.setTimeoutTimestamp(base_ms + ttl_ms)

    return fn


def stateful_zscore_stream(
    stream: DataFrame,
    n: int = 20,
    min_periods: int = 5,
    sigma: float = 3.0,
    keys: str = "user_id",
    watermark: str = "2 hours",
    state_ttl: str = "30 days",
    ts: str = "ts",
) -> DataFrame:
    """Streaming twin of ``operators.windows.rolling_zscore``: each
    event scored against its key's last ``n`` strictly-preceding
    observations, carried across micro-batches in a bounded ring
    buffer (state = at most ``n`` quantized ints per ACTIVE key;
    idle keys evicted after ``watermark + state_ttl`` event time).

    Bit-parity with the batch operator by construction: observations
    are quantized to exact integer cents (the batch decimal(18,2)
    cast), windowed sums of bounded int arrays are exact in double,
    and the mean/variance/z chain is the same IEEE expression order.
    Ordering contract: within a key, arrival order across micro-
    batches must follow event time (log-structured feeds) — same rule
    as ``stateful_turn_features``.
    """
    ttl_ms = _parse_gap_seconds(state_ttl) * 1000
    return (
        stream.withWatermark(ts, watermark)
        .groupBy(keys)
        .applyInPandasWithState(
            _zscore_fn(n, min_periods, sigma, ttl_ms),
            outputStructType=_ZSCORE_OUT_SCHEMA,
            stateStructType=_ZSCORE_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def stream_novelty_filter(
    stream: DataFrame,
    index: DataFrame,
    key_cols: "list[str]",
) -> DataFrame:
    """Stream-static novelty gate — emit only stream rows whose key is
    ABSENT from a static index: the streaming twin of
    ``operators/dedup.py``'s incremental (new-vs-index) dedup, and the
    shape of every "have we already ingested this document" front door
    (the index is yesterday's fingerprint table; the stream is today's
    crawl).

    Execution: a stream-static LEFT OUTER equi-join against the
    index's marker projection, then a null-marker filter — exactly
    left-anti semantics expressed through the join types Structured
    Streaming supports for a static right side. STATELESS: no
    watermark, no state store, nothing to evict — the static side is
    (re)broadcast or shuffled once per micro-batch by the planner and
    the stream side never waits. Duplicates WITHIN the stream both
    pass (novel vs the index is the contract; chain
    ``stream_exact_dedup`` after this filter when intra-stream
    uniqueness is also required).
    """
    marker = "__seen"
    idx = index.select(
        *[F.col(c) for c in key_cols], F.lit(1).alias(marker)
    ).dropDuplicates(key_cols)
    out = stream.join(idx, key_cols, "left_outer")
    return out.filter(F.col(marker).isNull()).drop(marker)


def stream_apply_cdc(
    changes: DataFrame,
    target_dir: str,
    key_col: str,
    ts_col: str,
    op_col: str = "op",
    delete_op: str = "D",
    tiebreak_col: "str | None" = None,
    checkpoint_dir: "str | None" = None,
):
    """Streaming CDC materialization — apply a change stream onto a
    parquet snapshot with latest-wins/delete semantics, one atomic
    snapshot swap per micro-batch: the ``foreachBatch`` pattern behind
    every "keep a queryable current-state table fed by a change log"
    deployment. At scale the body becomes Iceberg/Delta ``MERGE
    INTO``; the parquet form here rewrites the (dimension-sized)
    snapshot and swaps directories only after the new one is fully
    written, so readers never observe a half-applied batch.

    Semantics contract: the accumulated target is treated as a layer
    of PRIOR CHANGES (op = upsert), and each batch merges by
    ``plans.snapshot.upsert_latest`` recency over ``(ts, tiebreak)``
    — so the final state equals the BATCH ``upsert_latest`` over the
    full concatenated change log regardless of how the log was split
    into micro-batches (pass a ``tiebreak_col`` that totally orders
    changes within a key; without one, equal-ts cross-batch ties are
    arbitrary). Replaying a batch after a crash is idempotent: the
    merge of already-applied changes changes nothing.

    ONE documented divergence from the batch twin: a DELETE erases
    the key's timestamp memory from the materialized state, so a
    strictly-OLDER change for the same key arriving in a LATER
    micro-batch resurrects it (the batch form would let the delete
    win). Exactly-ordered feeds (per-key monotone ts across batches —
    what Kafka-partitioned CDC delivers) never hit this; out-of-order
    feeds need tombstone retention, which at scale is Iceberg/Delta
    MERGE with a tombstone table, not a parquet snapshot.

    Returns the StreamingQuery (caller awaits termination).
    """
    import os
    import shutil

    from feat_spark.plans.snapshot import upsert_latest

    def apply(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        if os.path.exists(target_dir):
            prior = spark.read.parquet(target_dir).withColumn(
                op_col, F.lit("U")
            )
        else:
            prior = spark.createDataFrame([], batch.schema)
        empty_base = spark.createDataFrame(
            [], batch.drop(op_col).schema
        )
        merged = upsert_latest(
            empty_base,
            prior.unionByName(batch),
            key_col,
            ts_col,
            op_col=op_col,
            delete_op=delete_op,
            tiebreak_col=tiebreak_col,
        )
        tmp = target_dir.rstrip("/") + f".tmp-{batch_id}"
        merged.write.mode("overwrite").parquet(tmp)
        old = target_dir.rstrip("/") + f".old-{batch_id}"
        if os.path.exists(target_dir):
            os.rename(target_dir, old)
        os.rename(tmp, target_dir)
        shutil.rmtree(old, ignore_errors=True)

    writer = changes.writeStream.foreachBatch(apply).trigger(
        availableNow=True
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    upper: str = "4 hours",
    watermark: str = "2 hours",
) -> DataFrame:
    """Native stream-stream INNER join with a time-range predicate —
    "every right event within [left_ts, left_ts + upper] of a left
    event with the same key": the attribution / conversion-pairing
    join run directly between two live streams.

    This is the join Structured Streaming can evaluate with BOUNDED
    state precisely BECAUSE of its two ingredients: watermarks on both
    inputs plus an event-time range in the join condition let the
    engine prove when a buffered row can never match again and evict
    it — an unconstrained stream-stream equi-join would buffer both
    streams forever. State per key is O(rows inside the watermark
    horizon), independent of stream length; output mode is append
    (the only mode stream-stream inner joins support).

    Column contract: ``left_ts`` / ``right_ts`` (and all non-key
    payload columns) must be DISTINCT names — rename before the call;
    only ``key`` is shared and the join equates it.

    Batch parity: the result equals the batch range join
    ``l JOIN r ON l.key = r.key AND r.ts BETWEEN l.ts AND l.ts +
    upper`` whenever the watermark delay exceeds the data's event-time
    span (no eviction losses) — which is what the oracle gate runs.
    """
    l = left.withWatermark(left_ts, watermark)
    r = right.withWatermark(right_ts, watermark)
    cond = (
        (l[key] == r[key])
        & (r[right_ts] >= l[left_ts])
        & (r[right_ts] <= l[left_ts] + F.expr(f"interval {upper}"))
    )
    return l.join(r, cond, "inner").drop(r[key])


def stream_maintain_rollup(
    events: DataFrame,
    target_dir: str,
    keys: "list[str]",
    measures: "list[tuple[str, str, str]]",
    checkpoint_dir: "str | None" = None,
):
    """Streaming incremental-rollup maintenance — keep a queryable
    aggregate snapshot current against an event stream, one
    ``foreachBatch`` merge per micro-batch: the streaming face of
    ``plans/incremental`` (build the batch's delta STATE, merge it
    onto the prior state by the algebraic combine, swap the snapshot
    atomically). By the algebraic identity, the final state equals
    ``build_rollup`` over the full input however the stream was split
    into micro-batches — which is exactly what the oracle gate checks.

    Exactly-once posture, stated precisely: unlike CDC latest-wins
    (``stream_apply_cdc``), re-APPLYING a batch would double-count
    sums — merge is not idempotent. Correctness therefore rides on
    Spark's checkpointed source offsets + the atomic directory swap:
    a crash between swap and offset commit replays the batch onto the
    PRE-swap snapshot (the old directory is only removed after the
    new one is in place), so state never double-counts; at warehouse
    scale the swap becomes an Iceberg/Delta transactional overwrite.

    State is dimension-sized; each micro-batch costs O(delta + state).
    Sum states are cast back to the delta's build dtype after each
    merge so decimal precision cannot widen batch-over-batch into an
    unmergeable schema.
    """
    import os
    import shutil

    from feat_spark.plans.incremental import build_rollup, merge_rollup

    def apply(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        delta = build_rollup(batch, keys, measures)
        if os.path.exists(target_dir):
            prior = spark.read.parquet(target_dir)
            new = merge_rollup(prior, delta, keys, measures)
            new = new.select(
                *[
                    F.col(f.name).cast(f.dataType)
                    for f in delta.schema.fields
                ]
            )
        else:
            new = delta
        tmp = target_dir.rstrip("/") + f".tmp-{batch_id}"
        new.write.mode("overwrite").parquet(tmp)
        old = target_dir.rstrip("/") + f".old-{batch_id}"
        if os.path.exists(target_dir):
            os.rename(target_dir, old)
        os.rename(tmp, target_dir)
        shutil.rmtree(old, ignore_errors=True)

    writer = events.writeStream.foreachBatch(apply).trigger(
        availableNow=True
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def stream_static_enrich_agg(
    stream: DataFrame,
    dim: DataFrame,
    key: str,
    group_col: str,
    value_col: str,
    ts: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-static enrichment — the streaming join surface this
    module had not yet exercised: each micro-batch equi-joins the
    (small, broadcastable) STATIC dimension frame, then rolls up per
    dimension attribute. Structured Streaming executes the static side
    as an ordinary batch relation re-planned per micro-batch — no
    state, no watermark bookkeeping for the join itself (the watermark
    here only bounds the aggregation state), and at 100 TB/day the
    static side ships as a broadcast while the stream side never
    shuffles before the keyed agg.

    Inner-join semantics: stream rows without a dimension row DROP
    (the audit for that is ``fk_coverage`` on the batch side — an
    enrichment that silently NULLs is how orphan segments hide).

    Output (complete/update mode): ``group_col`` + exact
    ``(n_events, cents)``.
    """
    enriched = stream.withWatermark(ts, watermark).join(dim, key, "inner")
    return enriched.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(
            F.round(F.col(value_col) * 100).cast("long")
        ).alias("cents"),
    )


def stream_maintain_cms(
    events: DataFrame,
    target_dir: str,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    checkpoint_dir: "str | None" = None,
):
    """Streaming Count-Min maintenance — keep a mergeable frequency
    sketch current against an event stream, one ``foreachBatch``
    algebraic merge per micro-batch (the :func:`stream_maintain_rollup`
    pattern applied to ``operators/cms``): the batch's grid sums onto
    the prior grid, the candidate key set unions, both swap
    atomically. Because CMS merges BY ADDITION, the final state
    equals the one-shot sketch over the full input however the stream
    was micro-batched — exactly what the oracle gate checks.

    State is O(depth*width) grid rows plus the candidate key set; the
    candidate set is kept FULL here (dimension-sized, like the rollup
    state) — at true heavy-hitter scale the deployment knob is
    pruning candidates to the top-M by estimate after each merge,
    which can only drop keys whose estimates never reached the
    maintained band. Same exactly-once posture as the rollup: merge
    is not idempotent; offsets + atomic swap carry it.
    """
    import os
    import shutil

    from feat_spark.operators.cms import countmin_build

    grid_dir = os.path.join(target_dir, "grid")
    keys_dir = os.path.join(target_dir, "keys")

    def swap(new_df: DataFrame, path: str, batch_id: int) -> None:
        tmp = path.rstrip("/") + f".tmp-{batch_id}"
        new_df.write.mode("overwrite").parquet(tmp)
        old = path.rstrip("/") + f".old-{batch_id}"
        if os.path.exists(path):
            os.rename(path, old)
        os.rename(tmp, path)
        shutil.rmtree(old, ignore_errors=True)

    def apply(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        delta = countmin_build(batch, key_col, depth=depth, width=width)
        keys = (
            batch.filter(F.col(key_col).isNotNull())
            .select(F.col(key_col).cast("string").alias("key"))
            .distinct()
        )
        if os.path.exists(grid_dir):
            prior = spark.read.parquet(grid_dir)
            delta = (
                prior.unionByName(delta)
                .groupBy("seed", "bucket")
                .agg(F.sum("n").cast("long").alias("n"))
            )
            keys = spark.read.parquet(keys_dir).unionByName(keys).distinct()
        swap(delta, grid_dir, batch_id)
        swap(keys, keys_dir, batch_id)

    writer = events.writeStream.foreachBatch(apply).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.start()
    q.awaitTermination()
    return q


def cms_state_topk(
    spark, target_dir: str, k: int = 20, depth: int = 4, width: int = 256
) -> DataFrame:
    """Top-k readout off the maintained CMS state: probe every
    candidate key against the merged grid (broadcast — the grid is
    <= depth*width rows), min over the depth rows, TakeOrdered on
    (estimate desc, key asc). depth/width are the build-time
    constants — probes MUST use the same bucket function as the
    build. Estimates carry CMS's one-sided guarantee: never below
    the key's true count."""
    import os

    from feat_spark.operators.cms import _bucket

    grid = spark.read.parquet(os.path.join(target_dir, "grid"))
    keys = spark.read.parquet(os.path.join(target_dir, "keys"))
    probes = keys.select(
        "key",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("seed"),
                        _bucket(F.col("key"), s, width).alias("bucket"),
                    )
                    for s in range(int(depth))
                ]
            )
        ).alias("p"),
    ).select("key", "p.seed", "p.bucket")
    est = (
        probes.join(F.broadcast(grid), ["seed", "bucket"])
        .groupBy("key")
        .agg(F.min("n").alias("cms_est"))
    )
    return (
        est.orderBy(F.col("cms_est").desc(), F.col("key").asc())
        .limit(k)
        .select("key", "cms_est")
    )
