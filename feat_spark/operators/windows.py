"""Windowed feature operators: stable ordering, lag/lead, leakage-safe
cumulative frames, forward/backward fill, tumbling/sliding windows,
top-k. All pure Window/groupBy expressions — single shuffle per
partitioning key, whole-stage-codegen friendly, no Python in the hot
path.

Leakage policy (BASELINE.json north_star "zero temporal leakage"):
every frame produced here ends at ``currentRow`` (or ``-1`` when the
current row must be excluded); nothing ever looks at following rows
except ``backward_fill``, which is restricted to static attributes and
says so loudly in its docstring. ``feat_spark.plans.audit`` provides
the runtime proof.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def _cols(x) -> list[str]:
    return [x] if isinstance(x, str) else list(x)


def turn_window(
    partition: str | Sequence[str] = "conv_id",
    order: str | Sequence[str] = ("turn_idx",),
    tiebreak: str | Sequence[str] = ("ts",),
) -> WindowSpec:
    """The canonical per-conversation ordering: ``(turn_idx, ts)`` —
    stable under duplicate timestamps (input_hint: "stable (conv_id,
    turn_idx) ordering")."""
    return Window.partitionBy(*_cols(partition)).orderBy(
        *[F.col(c).asc() for c in (*_cols(order), *_cols(tiebreak))]
    )


def with_stable_order(
    df: DataFrame,
    partition: str | Sequence[str] = "conv_id",
    order: str | Sequence[str] = ("turn_idx",),
    tiebreak: str | Sequence[str] = ("ts",),
    out_col: str = "turn_seq",
) -> DataFrame:
    """Assign a dense per-conversation sequence number regardless of file
    order (the synth generator deliberately scrambles ~5% of rows)."""
    return df.withColumn(
        out_col, F.row_number().over(turn_window(partition, order, tiebreak))
    )


def lag_lead_features(
    df: DataFrame,
    cols: Sequence[str],
    offsets: Sequence[int] = (1,),
    partition: str | Sequence[str] = "conv_id",
    order: str | Sequence[str] = ("turn_idx",),
    tiebreak: str | Sequence[str] = (),
    leads: bool = True,
) -> DataFrame:
    """``{col}_lag{k}`` / ``{col}_lead{k}`` over the turn ordering.

    lag is always leakage-safe; lead features are *labels/targets*
    (next-turn prediction), kept behind the ``leads`` flag so feature
    pipelines can refuse them wholesale.
    """
    w = turn_window(partition, order, tiebreak)
    out = df
    for c in cols:
        for k in offsets:
            out = out.withColumn(f"{c}_lag{k}", F.lag(c, k).over(w))
            if leads:
                out = out.withColumn(f"{c}_lead{k}", F.lead(c, k).over(w))
    return out


def cumulative_features(
    df: DataFrame,
    aggs: Mapping[str, Sequence[str]],
    partition: str | Sequence[str] = "conv_id",
    order: str | Sequence[str] = ("turn_idx",),
    tiebreak: str | Sequence[str] = (),
    include_current: bool = True,
) -> DataFrame:
    """Running per-conversation aggregates over *preceding* rows only.

    ``aggs`` maps column -> aggregate names (``sum count avg min max``).
    ``include_current=False`` ends the frame at ``-1``: the strictest
    leakage stance ("features at t may not even see t's own payload"),
    used when the current turn is the prediction target.
    """
    end = Window.currentRow if include_current else -1
    w = turn_window(partition, order, tiebreak).rowsBetween(
        Window.unboundedPreceding, end
    )
    out = df
    for c, fns in aggs.items():
        for fn in fns:
            out = out.withColumn(f"{c}_cum_{fn}", getattr(F, fn)(c).over(w))
    return out


def forward_fill(
    df: DataFrame,
    cols: Sequence[str],
    partition: str | Sequence[str] = "conv_id",
    order: str | Sequence[str] = ("ts",),
    tiebreak: str | Sequence[str] = ("turn_idx",),
    suffix: str = "_ffill",
) -> DataFrame:
    """Last-observation-carried-forward — leakage-safe (past → future).

    ``last(c, ignorenulls=True)`` over an unbounded-preceding frame: one
    shuffle, one sort, O(n) fill per partition.
    """
    w = turn_window(partition, order, tiebreak).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    out = df
    for c in cols:
        out = out.withColumn(f"{c}{suffix}", F.last(c, ignorenulls=True).over(w))
    return out


def backward_fill(
    df: DataFrame,
    cols: Sequence[str],
    partition: str | Sequence[str] = "conv_id",
    order: str | Sequence[str] = ("ts",),
    tiebreak: str | Sequence[str] = ("turn_idx",),
    suffix: str = "_bfill",
) -> DataFrame:
    """Next-observation-carried-backward.

    WARNING: reads *future* rows by definition — only valid for static
    attributes (e.g. a conv-level plan known out-of-band), never for
    time-varying features. The leakage audit exempts columns with this
    suffix and reports them separately.
    """
    w = turn_window(partition, order, tiebreak).rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    out = df
    for c in cols:
        out = out.withColumn(f"{c}{suffix}", F.first(c, ignorenulls=True).over(w))
    return out


def time_range_features(
    df: DataFrame,
    aggs: Mapping[str, Sequence[str]],
    duration: str = "1 hour",
    partition: str | Sequence[str] = "conv_id",
    ts: str = "ts",
    include_current: bool = True,
) -> DataFrame:
    """Rolling aggregates over a TIME range ``[ts - duration, ts]`` per
    key — ``{col}_roll_{fn}`` columns via a ``rangeBetween`` frame on
    ``unix_micros(ts)``. Unlike row frames, a range frame is defined by
    *value*: all rows at the same timestamp are peers and enter the
    frame together, so results are deterministic under duplicate
    timestamps without any tiebreak column.

    ``include_current=False`` ends the frame 1 microsecond before the
    current timestamp — the strict "features at t see only t' < t"
    stance; note it excludes ALL rows at ts, including same-ts siblings
    (which is exactly what zero leakage requires when ts is the
    knowledge cutoff). Same single shuffle + sort as any other window
    on the key.
    """
    import pandas as pd

    micros = int(pd.Timedelta(duration).total_seconds() * 1_000_000)
    end = 0 if include_current else -1
    # cast handles TIMESTAMP_NTZ columns; the session-timezone shift it
    # applies is constant per partition sort, so frame semantics are
    # unchanged
    w = (
        Window.partitionBy(*_cols(partition))
        .orderBy(F.unix_micros(F.col(ts).cast("timestamp")))
        .rangeBetween(-micros, end)
    )
    out = df
    for c, fns in aggs.items():
        for fn in fns:
            out = out.withColumn(f"{c}_roll_{fn}", getattr(F, fn)(c).over(w))
    return out


def tumbling_window_agg(
    df: DataFrame,
    aggs: Sequence[Column],
    duration: str = "10 minutes",
    slide: str | None = None,
    keys: str | Sequence[str] = "conv_id",
    ts: str = "ts",
    emit_bounds: bool = True,
) -> DataFrame:
    """Tumbling (or sliding, with ``slide``) time-window aggregation.

    Uses the native ``F.window`` bucketing expression → a plain
    hash-aggregate with partial/final combine; identical API under
    Structured Streaming (SURVEY.md §2.10).
    """
    win = F.window(F.col(ts), duration, slide) if slide else F.window(F.col(ts), duration)
    grouped = df.groupBy(*_cols(keys), win.alias("win")).agg(*aggs)
    if emit_bounds:
        grouped = grouped.select(
            *_cols(keys),
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            *[c for c in grouped.columns if c not in (*_cols(keys), "win")],
        )
    return grouped


def top_k_per_group(
    df: DataFrame,
    k: int,
    partition: str | Sequence[str],
    order: Sequence[Column | str],
    out_col: str = "rk",
    keep_rank: bool = False,
) -> DataFrame:
    """Top-k rows per group via ``row_number`` — shuffles once on the
    group key; with AQE the per-group sort never materializes a global
    sort (vs ``orderBy().limit()`` which funnels to one task)."""
    w = Window.partitionBy(*_cols(partition)).orderBy(
        *[F.col(c) if isinstance(c, str) else c for c in order]
    )
    out = df.withColumn(out_col, F.row_number().over(w)).filter(F.col(out_col) <= k)
    return out if keep_rank else out.drop(out_col)


def rolling_zscore(
    df: DataFrame,
    value_col: str = "value",
    keys: str | Sequence[str] = "user_id",
    order: Sequence[str] = ("ts", "event_id"),
    n: int = 20,
    min_periods: int = 5,
    sigma: float = 3.0,
    prefix: str = "",
) -> DataFrame:
    """Leakage-safe rolling z-score anomaly flag: each row is scored
    against the mean/std of the ``n`` STRICTLY PRECEDING observations
    (``rows between n preceding and 1 preceding`` — the current row
    never sees itself or the future, same discipline as
    ``cumulative_features``).

    Mean and variance come from decimal-summed sum / sum-of-squares
    (order-free partial aggregation => bit-replayable by the oracle),
    combined in double via the one-pass identity
    ``var = (sumsq - sum^2/n) / n`` with a zero clamp for float dust.
    Rows with fewer than ``min_periods`` observations get NULL stats
    and ``is_anomaly = false`` (no evidence != anomalous).

    Adds: roll_mean, roll_std, zscore (6dp), is_anomaly
    (|z| > sigma). One window = one shuffle; Zipf-hot keys bound via
    ``operators/chunked.py`` as usual.
    """
    keys = _cols(keys)
    w = (
        Window.partitionBy(*keys)
        .orderBy(*[F.col(c) for c in order])
        .rowsBetween(-n, -1)
    )
    dec = F.col(value_col).cast("double").cast("decimal(18,2)")
    s = F.sum(dec).over(w).cast("double")
    sq = F.sum(dec * dec).over(w).cast("double")
    cnt = F.count(value_col).over(w)
    mean = s / cnt
    var = F.greatest((sq - s * s / cnt) / cnt, F.lit(0.0))
    std = F.sqrt(var)
    ok = (cnt >= min_periods) & (std > 0)
    z = F.when(ok, (F.col(value_col) - mean) / std)
    return (
        df.withColumn(f"{prefix}roll_mean", F.when(cnt >= min_periods, F.round(mean, 6)))
        .withColumn(f"{prefix}roll_std", F.when(cnt >= min_periods, F.round(std, 6)))
        .withColumn(f"{prefix}zscore", F.round(z, 6))
        .withColumn(f"{prefix}is_anomaly", F.coalesce(F.abs(z) > sigma, F.lit(False)))
    )


def decayed_sum(
    df: DataFrame,
    value_col: str = "value",
    keys: str | Sequence[str] = "user_id",
    ts: str = "ts",
    tiebreak: Sequence[str] = ("event_id",),
    half_life_days: int = 7,
    out_col: str = "decayed_sum",
) -> DataFrame:
    """Leakage-safe recency-weighted running sum: each row gets
    ``sum(0.5^(k_row - k_i) * value_i)`` over STRICTLY PRECEDING rows
    of the same key, where ``k`` is the event's absolute half-life
    bucket index (``epoch_us div (half_life_days * 86400e6)``).

    Decay steps at bucket BOUNDARIES (staircase aligned to absolute
    time), not per-row age — deliberately: that makes the weight
    separable (``0.5^k_row * 2^k_i``), so the whole feature is one
    prefix sum instead of an O(n^2) per-pair recompute, and every
    factor is a power of two — EXACT dyadic scaling in double, hence
    bit-replayable by any engine (no exp()/pow() last-ulp hazard).
    Continuous-exponent decay is the same plan with ``exp()`` weights
    if cross-engine bit-equality is not required.

    First row per key (empty preceding window) gets NULL — the honest
    cold-start, same contract as ``cumulative_target_encode``.
    One window = one shuffle; anchor ``k0`` (per-key min bucket) keeps
    the ``2^(k_i - k0)`` scale factors span-bounded.
    """
    keys = _cols(keys)
    micros_per_bucket = half_life_days * 86_400_000_000
    # cast handles TIMESTAMP_NTZ parquet columns (session tz is UTC so
    # the bucket index equals the oracle's epoch_us // bucket)
    k = F.expr(f"unix_micros(cast({ts} as timestamp)) div {micros_per_bucket}")
    kw = Window.partitionBy(*keys)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts), *[F.col(c) for c in tiebreak])
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    d = df.withColumn("__k", k).withColumn("__k0", F.min("__k").over(kw))
    up = F.pow(F.lit(2.0), (F.col("__k") - F.col("__k0")).cast("double"))
    contrib = (up * F.col(value_col)).cast("decimal(38,12)")
    cum = F.sum(contrib).over(w).cast("double")
    down = F.pow(F.lit(2.0), (F.col("__k0") - F.col("__k")).cast("double"))
    return d.withColumn(out_col, F.round(down * cum, 6)).drop("__k", "__k0")


def transition_matrix(
    df: DataFrame,
    cat_col: str = "event_type",
    keys: str | Sequence[str] = "user_id",
    order: Sequence[str] = ("ts", "event_id"),
) -> DataFrame:
    """First-order Markov transition matrix over per-key ordered
    categorical sequences: for every observed (prev, next) pair, the
    transition count and the row-normalized probability.

    Shape: one lag window (shuffle by key) + one count aggregate +
    a per-prev normalizing window over the TINY (|categories|^2)
    result — the corpus is touched once.
    """
    keys = _cols(keys)
    w = Window.partitionBy(*keys).orderBy(*[F.col(c) for c in order])
    pairs = (
        df.withColumn("__prev", F.lag(cat_col).over(w))
        .filter(F.col("__prev").isNotNull())
        .groupBy(F.col("__prev").alias("prev_cat"), F.col(cat_col).alias("next_cat"))
        .agg(F.count(F.lit(1)).alias("n_trans"))
    )
    norm = Window.partitionBy("prev_cat")
    return pairs.withColumn(
        "prob", F.round(F.col("n_trans") / F.sum("n_trans").over(norm), 6)
    )


def active_days_feature(
    df: DataFrame,
    keys: str | Sequence[str] = "user_id",
    ts: str = "ts",
    window_days: int = 30,
    out_col: str | None = None,
) -> DataFrame:
    """Engagement feature: distinct active days of the key in the
    trailing ``window_days`` (inclusive of the current day), attached
    to every event row.

    ``count(distinct)`` is not a window function in any engine — the
    trick is grain reduction: collapse to one row per (key, day)
    first (the corpus shrinks to active-days cardinality), run a
    plain COUNT over a day-range window on that small frame, and join
    the per-day feature back to events on (key, day). The day frame
    and the window share the key partitioning; the join back is a
    shuffle on (key, day) — still far cheaper than any distinct-in-
    window contortion at the event grain.
    """
    keys = _cols(keys)
    out_col = out_col or f"active_days_{window_days}d"
    day = F.expr(f"unix_micros(cast({ts} as timestamp)) div 86400000000")
    with_day = df.withColumn("__day", day)
    per_day = with_day.select(*keys, "__day").distinct()
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__day"))
        .rangeBetween(-(window_days - 1), 0)
    )
    feat = per_day.withColumn(out_col, F.count(F.lit(1)).over(w))
    return with_day.join(feat, [*keys, "__day"]).drop("__day")


def rolling_distinct_count(
    df: DataFrame,
    group_col: str,
    entity_col: str,
    ts_col: str = "ts",
    window_days: int = 7,
    out_col: str = "rolling_actives",
) -> DataFrame:
    """Exact rolling N-day DISTINCT entities per group — 7-day active
    users per event_type, distinct source domains per shard, the
    metric "COUNT(DISTINCT x) OVER (RANGE N PRECEDING)" names but
    Spark's window functions refuse to run (distinct aggregates are
    unsupported over windows) and most engines answer with HLL
    sketches instead.

    Exact AND scalable via interval algebra:

    1. grain-reduce to distinct ``(group, entity, day)`` — one
       map-side-combinable agg; the frame shrinks to active-days
       cardinality.
    2. per ``(group, entity)``: an occurrence on day ``d`` keeps the
       entity visible through ``d + N-1``, so the visibility set is a
       union of intervals — merged by flagging a new segment whenever
       the gap from the previous occurrence exceeds ``N-1`` (one lag +
       one running sum on already-co-partitioned data).
    3. each merged segment ``[start, last + N-1]`` emits ``+1`` at
       ``start`` and ``-1`` at ``last + N``; summing deltas per
       ``(group, day)`` and prefix-summing over the day spine turns
       "how many intervals cover day D" into one range-frame sum over
       a frame whose row count is bounded by CALENDAR DAYS x groups —
       microscopic regardless of corpus size. No event-grain window,
       no funnel.

    Output: one row per ``(group, day)`` present in the data, with
    ``day`` as a DATE and ``out_col`` the exact distinct count over
    ``[day - (N-1), day]``. An engine with windowed DISTINCT (DuckDB)
    reproduces it with the naive query — that is the oracle.
    """
    day = F.expr(
        f"unix_micros(cast({ts_col} as timestamp)) div 86400000000"
    )
    occ = (
        df.select(
            F.col(group_col).alias("grp"),
            F.col(entity_col).alias("ent"),
            day.alias("d"),
        )
        .distinct()
    )
    seg_w = Window.partitionBy("grp", "ent").orderBy("d")
    segs = (
        occ.withColumn("prev_d", F.lag("d").over(seg_w))
        .withColumn(
            "new_seg",
            (
                F.col("prev_d").isNull()
                | (F.col("d") - F.col("prev_d") > window_days - 1)
            ).cast("long"),
        )
        .withColumn(
            "seg",
            F.sum("new_seg").over(
                seg_w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy("grp", "ent", "seg")
        .agg(F.min("d").alias("seg_start"), F.max("d").alias("seg_last"))
    )
    deltas = segs.select(
        "grp", F.col("seg_start").alias("d"), F.lit(1).alias("delta")
    ).unionByName(
        segs.select(
            "grp",
            (F.col("seg_last") + window_days).alias("d"),
            F.lit(-1).alias("delta"),
        )
    ).groupBy("grp", "d").agg(F.sum("delta").alias("delta"))
    spine = occ.select("grp", "d").distinct().withColumn("is_day", F.lit(1))
    merged = deltas.withColumn("is_day", F.lit(0)).unionByName(
        spine.withColumn("delta", F.lit(0).cast("long"))
    )
    cum_w = (
        Window.partitionBy("grp")
        .orderBy("d")
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    return (
        merged.withColumn("cum", F.sum("delta").over(cum_w))
        .filter(F.col("is_day") == 1)
        .select(
            F.col("grp").alias(group_col),
            F.date_add(F.lit("1970-01-01").cast("date"), F.col("d").cast("int")).alias("day"),
            F.col("cum").cast("bigint").alias(out_col),
        )
    )


def interval_coverage(
    df: DataFrame,
    entity_col: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Per-entity union of half-open time intervals ``[start, end)`` —
    total covered wall-clock and merged-segment count. The classic
    gaps-and-islands reduction behind "how long was this user actually
    active", session stitching across devices, and SLA uptime math.

    Overlapping or touching intervals merge (a new island starts only
    when ``start > max(end)`` of everything before it); zero-length
    and contained intervals add nothing. All arithmetic is integer
    epoch micros, so every engine agrees bit-for-bit.

    Shape: ONE shuffle on the entity key, then two windows and two
    aggs on the co-partitioned data — the prefix ``max(end)`` and the
    island running sum reuse the same sort. No UDF, no self-join (the
    naive formulation is an O(n^2) overlap join).

    Output: ``(entity, n_intervals, n_merged, covered_us)`` with
    ``covered_us`` a BIGINT sum of merged island lengths.
    """
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    base = df.select(
        F.col(entity_col).alias("__e"),
        us(start_col).alias("__s"),
        us(end_col).alias("__x"),
    ).filter(F.col("__x") > F.col("__s"))
    w = Window.partitionBy("__e").orderBy("__s", "__x")
    flagged = (
        base.withColumn(
            "__pmax",
            F.max("__x").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        )
        .withColumn(
            "__new",
            (
                F.col("__pmax").isNull()
                | (F.col("__s") > F.col("__pmax"))
            ).cast("long"),
        )
        .withColumn(
            "__isl",
            F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    islands = flagged.groupBy("__e", "__isl").agg(
        F.min("__s").alias("__is"),
        F.max("__x").alias("__ix"),
        F.count(F.lit(1)).alias("__n"),
    )
    return islands.groupBy("__e").agg(
        F.sum("__n").cast("long").alias("n_intervals"),
        F.count(F.lit(1)).cast("long").alias("n_merged"),
        F.sum(F.col("__ix") - F.col("__is")).cast("long").alias("covered_us"),
    ).select(
        F.col("__e").alias(entity_col),
        "n_intervals",
        "n_merged",
        "covered_us",
    )
