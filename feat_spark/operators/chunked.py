"""Chunked (salted) window operators — distributed prefix-sum windows.

Plain ``Window.partitionBy(conv_id)`` puts an ENTIRE conversation in one
task. A hot conversation holding 5% of all turns therefore caps scaling
efficiency at ~0.5 going 8->32 cores (Amdahl) and OOMs a task at 10^12
turns. These operators split every conversation into *order-aligned
chunks* — ``chunk = floor(order_col / chunk_width)`` — and compute any
running aggregate in three fully-parallel steps (the classic
distributed scan / prefix-sum):

1. intra-chunk running value over ``Window.partitionBy(key, chunk)``;
2. per-chunk totals (tiny frame: one row per (key, chunk));
3. exclusive running total over chunks (window over the tiny frame),
   joined back and combined.

The shuffle key becomes ``(key, chunk)``, so the hottest task is
bounded by ``chunk_width`` regardless of how skewed the keys are —
this is the north rule's "salted repartitioning for hot conversations"
(BASELINE.json:6) done in a way that keeps *ordered* window semantics
exact (naive hash-salting would shatter the order and corrupt every
running value — SURVEY.md §7 hard part (c)).

Requirements: ``order_col`` is numeric, non-negative, and unique per
key under the supplied tiebreak (transcripts: ``turn_idx``; for time
ordering pass ``unix_micros(ts)`` as a materialized column).

Every operator here is tested for bit-equality against its plain
sibling in tests/test_chunked.py, hot key included.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from feat_spark.operators.windows import _cols

_CHUNK = "__chunk"

#: Running-aggregate combine rules: how an exclusive chunk offset and an
#: intra-chunk running value merge, per aggregate.
_COMBINE = {
    "sum": lambda off, intra: F.when(off.isNull(), intra).otherwise(
        F.when(intra.isNull(), off).otherwise(off + intra)
    ),
    "count": lambda off, intra: F.coalesce(off, F.lit(0)) + intra,
    "min": lambda off, intra: F.least(off, intra),  # least/greatest skip NULLs
    "max": lambda off, intra: F.greatest(off, intra),
}


def _maybe_bc(small: DataFrame, broadcast: bool) -> DataFrame:
    """The per-chunk frames are one row per (key, chunk). Broadcasting
    them keeps the big side's single (key, chunk) exchange as the ONLY
    shuffle — an un-hinted join would sort-merge the big frame per
    operator, which measured 3x slower end-to-end. Callers disable the
    hint only when keys*chunks outgrows driver memory (at which point
    the co-partitioned shuffle join is the right plan anyway)."""
    return F.broadcast(small) if broadcast else small


def with_chunks(
    df: DataFrame, order_col: str, chunk_width: int, out_col: str = _CHUNK
) -> DataFrame:
    return df.withColumn(out_col, F.floor(F.col(order_col) / F.lit(chunk_width)))


def chunked_cumulative(
    df: DataFrame,
    aggs: Mapping[str, Sequence[str]],
    partition: str | Sequence[str] = "conv_id",
    order_col: str = "turn_idx",
    tiebreak: str | Sequence[str] = (),
    chunk_width: int = 65536,
    include_current: bool = True,
    suffix: str = "_cum_",
    broadcast_offsets: bool = True,
) -> DataFrame:
    """Running per-key aggregates, skew-proof.

    Same output columns as ``windows.cumulative_features``
    (``{col}_cum_{fn}``), same leakage stance (``include_current=False``
    ends the frame one row earlier), different physics: no task ever
    holds more than ``chunk_width`` rows of one key.
    """
    keys = _cols(partition)
    for fns in aggs.values():
        for fn in fns:
            if fn not in _COMBINE:
                raise ValueError(f"unsupported running aggregate: {fn!r}")

    df = with_chunks(df, order_col, chunk_width)
    order = [F.col(order_col).asc(), *[F.col(t).asc() for t in _cols(tiebreak)]]
    end = Window.currentRow if include_current else -1
    w_intra = (
        Window.partitionBy(*keys, _CHUNK)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, end)
    )

    intra_cols, total_aggs, combined = [], [], []
    for c, fns in aggs.items():
        for fn in fns:
            intra_cols.append(getattr(F, fn)(c).over(w_intra).alias(f"__i_{c}_{fn}"))
            total_aggs.append(getattr(F, fn)(c).alias(f"__t_{c}_{fn}"))

    df = df.select("*", *intra_cols)

    totals = df.groupBy(*keys, _CHUNK).agg(*total_aggs)
    w_prev = (
        Window.partitionBy(*keys)
        .orderBy(F.col(_CHUNK).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off_cols = []
    for c, fns in aggs.items():
        for fn in fns:
            # running totals of *previous* chunks: the exclusive offset.
            # Re-aggregation of per-chunk totals: counts combine by SUM
            # (count-of-counts would be the number of chunks);
            # sum/min/max re-aggregate with themselves.
            refn = "sum" if fn == "count" else fn
            off_cols.append(
                getattr(F, refn)(F.col(f"__t_{c}_{fn}")).over(w_prev).alias(f"__o_{c}_{fn}")
            )
    offsets = totals.select(*keys, _CHUNK, *off_cols)

    out = df.join(_maybe_bc(offsets, broadcast_offsets), on=[*keys, _CHUNK], how="left")

    for c, fns in aggs.items():
        for fn in fns:
            off, intra = F.col(f"__o_{c}_{fn}"), F.col(f"__i_{c}_{fn}")
            out = out.withColumn(f"{c}{suffix}{fn}", _COMBINE[fn](off, intra))
            out = out.drop(f"__o_{c}_{fn}", f"__i_{c}_{fn}")
    return out.drop(_CHUNK)


def chunked_row_number(
    df: DataFrame,
    partition: str | Sequence[str] = "conv_id",
    order_col: str = "turn_idx",
    tiebreak: str | Sequence[str] = ("ts",),
    chunk_width: int = 65536,
    out_col: str = "turn_seq",
    broadcast_offsets: bool = True,
) -> DataFrame:
    """Skew-proof ``row_number`` (stable turn ordering at any skew):
    intra-chunk row_number + exclusive running count of prior chunks."""
    keys = _cols(partition)
    df = with_chunks(df, order_col, chunk_width)
    order = [F.col(order_col).asc(), *[F.col(t).asc() for t in _cols(tiebreak)]]
    w_intra = Window.partitionBy(*keys, _CHUNK).orderBy(*order)
    df = df.withColumn("__i_rn", F.row_number().over(w_intra))

    totals = df.groupBy(*keys, _CHUNK).agg(F.count(F.lit(1)).alias("__t_n"))
    w_prev = (
        Window.partitionBy(*keys)
        .orderBy(F.col(_CHUNK).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        *keys, _CHUNK, F.sum("__t_n").over(w_prev).alias("__o_n")
    )
    out = df.join(_maybe_bc(offsets, broadcast_offsets), on=[*keys, _CHUNK], how="left")
    return (
        out.withColumn(
            out_col, (F.coalesce(F.col("__o_n"), F.lit(0)) + F.col("__i_rn")).cast("int")
        )
        .drop("__i_rn", "__o_n", _CHUNK)
    )


def chunked_lag(
    df: DataFrame,
    cols: Sequence[str],
    partition: str | Sequence[str] = "conv_id",
    order_col: str = "turn_idx",
    tiebreak: str | Sequence[str] = (),
    chunk_width: int = 65536,
    suffix: str = "_lag1",
    broadcast_offsets: bool = True,
) -> DataFrame:
    """Skew-proof ``lag(col, 1)``: intra-chunk lag, with each chunk's
    first row reading the *last* row of the previous chunk via a tiny
    per-chunk boundary frame (one row per (key, chunk))."""
    keys = _cols(partition)
    df = with_chunks(df, order_col, chunk_width)
    order = [F.col(order_col).asc(), *[F.col(t).asc() for t in _cols(tiebreak)]]
    w_intra = Window.partitionBy(*keys, _CHUNK).orderBy(*order)

    out = df
    for c in cols:
        out = out.withColumn(f"__i_{c}", F.lag(c, 1).over(w_intra))

    # last row per chunk = max_by over (order, tiebreak); shift to the
    # NEXT chunk so a chunk's first row can coalesce it in.
    ord_struct = F.struct(
        F.col(order_col), *[F.col(t) for t in _cols(tiebreak)]
    )
    tails = df.groupBy(*keys, _CHUNK).agg(
        *[F.max_by(c, ord_struct).alias(f"__p_{c}") for c in cols]
    )
    tails = tails.withColumn(_CHUNK, F.col(_CHUNK) + 1)

    out = out.join(_maybe_bc(tails, broadcast_offsets), on=[*keys, _CHUNK], how="left")
    w_first = Window.partitionBy(*keys, _CHUNK).orderBy(*order)
    rn = F.row_number().over(w_first)
    for c in cols:
        out = out.withColumn(
            f"{c}{suffix}",
            F.when(rn == 1, F.col(f"__p_{c}")).otherwise(F.col(f"__i_{c}")),
        ).drop(f"__i_{c}", f"__p_{c}")
    return out.drop(_CHUNK)


def chunked_sessionize(
    df: DataFrame,
    gap: str = "30 minutes",
    partition: str | Sequence[str] = "conv_id",
    ts: str = "ts",
    order_col: str = "turn_idx",
    chunk_width: int = 65536,
    out_col: str = "session_id",
) -> DataFrame:
    """Skew-proof gap sessionization: session-start flags from a
    chunked lag of ``ts``, then a chunked running sum of the flags.

    NOTE: assumes ``order_col`` order == time order within a key (true
    for transcripts where turn_idx is the arrival sequence). For pure
    ts ordering pass a materialized ``unix_micros(ts)`` column.
    """
    prev = f"__prev_{ts}"
    flagged = chunked_lag(
        df, [ts], partition, order_col, (), chunk_width, suffix="__lagtmp"
    ).withColumnRenamed(f"{ts}__lagtmp", prev)
    gap_expr = F.expr(f"INTERVAL {gap}")
    flagged = flagged.withColumn(
        "__new_s",
        F.when(
            F.col(prev).isNull() | (F.col(ts) - F.col(prev) > gap_expr), F.lit(1)
        ).otherwise(F.lit(0)),
    )
    out = chunked_cumulative(
        flagged, {"__new_s": ["sum"]}, partition, order_col, (), chunk_width,
    )
    return (
        out.withColumn(out_col, (F.col("__new_s_cum_sum") - 1).cast("int"))
        .drop("__new_s", "__new_s_cum_sum", prev)
    )


def chunked_turn_features(
    df: DataFrame,
    partition: str | Sequence[str] = "conv_id",
    order_col: str = "turn_idx",
    ts: str = "ts",
    lag_cols: Sequence[str] = ("payload_hash",),
    cum_aggs: Mapping[str, Sequence[str]] | None = None,
    gap: str = "30 minutes",
    chunk_width: int = 65536,
    tiebreak: str | Sequence[str] = ("ts",),
    rn_col: str = "turn_seq",
    session_col: str = "session_id",
    broadcast_offsets: bool = True,
) -> DataFrame:
    """Single-pass composite: stable row number + lag(1) features +
    running aggregates + gap sessionization, all chunked.

    CHAINING the individual chunked operators re-evaluates every
    upstream operator once per downstream stats branch (each op forks
    the plan into data + totals); measured 3x slower end-to-end. This
    composite does ONE intra-chunk window pass, ONE per-chunk stats
    aggregate, ONE tiny cross-chunk window, ONE join back — so the big
    frame is shuffled exactly once, on (key, chunk).

    Semantics match the plain-window pipeline bit-for-bit
    (tests/test_chunked.py::test_composite_matches_plain_pipeline):
      * ``rn_col``       == row_number over (order_col, tiebreak)
      * ``{c}_lag1``     == lag(c, 1) over the same ordering
      * ``{c}_cum_{fn}`` == fn(c) over unboundedPreceding..currentRow
      * ``session_col``  == gap sessionization in order_col order
    """
    cum_aggs = cum_aggs or {}
    keys = _cols(partition)
    df = with_chunks(df, order_col, chunk_width)
    order = [F.col(order_col).asc(), *[F.col(t).asc() for t in _cols(tiebreak)]]
    w = Window.partitionBy(*keys, _CHUNK).orderBy(*order)
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ord_struct = F.struct(F.col(order_col), *[F.col(t) for t in _cols(tiebreak)])
    gap_expr = F.expr(f"INTERVAL {gap}")

    # ---- pass 1: everything intra-chunk, one sort ----------------------
    prev_ts = F.lag(ts, 1).over(w)
    intra_flag = F.when(
        prev_ts.isNotNull() & (F.col(ts) - prev_ts > gap_expr), F.lit(1)
    ).otherwise(F.lit(0))  # chunk-first rows resolve via boundary stats
    intra = [
        F.row_number().over(w).alias("__i_rn"),
        F.sum(intra_flag).over(w_run).alias("__i_sess"),
        *[F.lag(c, 1).over(w).alias(f"__i_lag_{c}") for c in lag_cols],
    ]
    for c, fns in cum_aggs.items():
        for fn in fns:
            if fn not in _COMBINE:
                raise ValueError(f"unsupported running aggregate: {fn!r}")
            intra.append(getattr(F, fn)(c).over(w_run).alias(f"__i_{c}_{fn}"))
    df = df.select("*", *intra)

    # ---- pass 2: per-chunk stats (tiny: one row per key-chunk) ---------
    stats = [
        F.count(F.lit(1)).alias("__t_n"),
        F.max("__i_sess").alias("__t_sess"),
        F.min_by(ts, ord_struct).alias("__t_first_ts"),
        F.max_by(ts, ord_struct).alias("__t_last_ts"),
        *[F.max_by(c, ord_struct).alias(f"__t_last_{c}") for c in lag_cols],
    ]
    for c, fns in cum_aggs.items():
        for fn in fns:
            stats.append(getattr(F, fn)(c).alias(f"__t_{c}_{fn}"))
    totals = df.groupBy(*keys, _CHUNK).agg(*stats)

    # ---- pass 3: cross-chunk offsets on the tiny frame -----------------
    wc = Window.partitionBy(*keys).orderBy(F.col(_CHUNK).asc())
    wc_prev = wc.rowsBetween(Window.unboundedPreceding, -1)
    prev_last_ts = F.lag("__t_last_ts", 1).over(wc)
    first_flag = F.when(
        prev_last_ts.isNull()
        | (F.col("__t_first_ts") - prev_last_ts > gap_expr),
        F.lit(1),
    ).otherwise(F.lit(0))
    off = [
        F.coalesce(F.sum("__t_n").over(wc_prev), F.lit(0)).alias("__o_n"),
        first_flag.alias("__ff"),
        *[F.lag(f"__t_last_{c}", 1).over(wc).alias(f"__p_{c}") for c in lag_cols],
    ]
    for c, fns in cum_aggs.items():
        for fn in fns:
            refn = "sum" if fn == "count" else fn
            off.append(
                getattr(F, refn)(F.col(f"__t_{c}_{fn}")).over(wc_prev).alias(f"__o_{c}_{fn}")
            )
    offsets = totals.select(*keys, _CHUNK, F.col("__t_sess"), *off)
    # sessions started in earlier chunks = their intra starts + their
    # first-row flags — one more tiny running sum (needs a second select
    # because __ff is an alias of this frame, not a stored column).
    offsets = offsets.withColumn(
        "__o_sess",
        F.coalesce(F.sum(F.col("__ff") + F.col("__t_sess")).over(wc_prev), F.lit(0)),
    ).drop("__t_sess")

    # ---- pass 4: join back + combine -----------------------------------
    out = df.join(_maybe_bc(offsets, broadcast_offsets), on=[*keys, _CHUNK], how="left")
    first_row = F.col("__i_rn") == 1
    out = out.withColumn(rn_col, (F.col("__o_n") + F.col("__i_rn")).cast("int"))
    for c in lag_cols:
        out = out.withColumn(
            f"{c}_lag1",
            F.when(first_row, F.col(f"__p_{c}")).otherwise(F.col(f"__i_lag_{c}")),
        ).drop(f"__i_lag_{c}", f"__p_{c}")
    for c, fns in cum_aggs.items():
        for fn in fns:
            out = out.withColumn(
                f"{c}_cum_{fn}",
                _COMBINE[fn](F.col(f"__o_{c}_{fn}"), F.col(f"__i_{c}_{fn}")),
            ).drop(f"__o_{c}_{fn}", f"__i_{c}_{fn}")
    out = out.withColumn(
        session_col,
        (F.col("__o_sess") + F.col("__ff") + F.col("__i_sess") - 1).cast("int"),
    )
    return out.drop("__i_rn", "__i_sess", "__o_n", "__ff", "__o_sess", _CHUNK)
