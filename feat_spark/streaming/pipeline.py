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


def _turn_feature_fn(gap_seconds: int):
    gap_us = gap_seconds * 1_000_000

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import pandas as pd  # local: keep the closure free of module globals
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

    return fn


def stateful_turn_features(
    stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts: str = "ts",
) -> DataFrame:
    """Custom stateful operator: running turn count + gap-session id per
    conversation, exactly the batch ``sessionize``/``cumulative``
    semantics, carried across micro-batches in GroupState.

    NOTE: within-conversation order across micro-batches follows
    arrival (file/commit) order — upstream must deliver a conversation's
    turns in turn_idx order across batches (true for log-structured
    transcript feeds; the batch engine is the replay tool when not).
    """
    gap_seconds = _parse_gap_seconds(gap)
    return (
        stream.withWatermark(ts, watermark)
        .groupBy("conv_id")
        .applyInPandasWithState(
            _turn_feature_fn(gap_seconds),
            outputStructType=TURN_STATE_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def _parse_gap_seconds(gap: str) -> int:
    qty, unit = gap.split()
    mult = {"second": 1, "seconds": 1, "minute": 60, "minutes": 60,
            "hour": 3600, "hours": 3600}[unit]
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
