"""Event-stream cleaning operators that sit BESIDE sessionization.

Lives OUTSIDE the flagship benchmark closure on purpose: additive
operators must not land in ``operators/sessionize.py`` (or any module
``bench.py`` transitively imports) — ``tools/bench_scaling.py`` hashes
that closure to gate published scaling rows, and byte-drift there
invalidates the campaign identity (see ``sources/layout.py`` for the
same rule).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def debounce_events(
    df: DataFrame,
    key_cols: "Sequence[str] | str",
    gap_s: int,
    ts_col: str = "ts",
    tiebreak: "Sequence[str]" = ("event_id",),
    out_col: str = "kept",
) -> DataFrame:
    """Burst-collapse debounce — within each key, collapse runs of
    events whose consecutive gaps are <= ``gap_s`` down to their FIRST
    event: the telemetry-cleaning step for double-clicks, retry
    storms, and sensor chatter, and the event-stream twin of the text
    near-dup collapse.

    Semantics are ISLAND debounce (a new burst starts when the gap
    from the PREVIOUS event exceeds ``gap_s``) — the same
    gaps-and-islands device as :func:`feat_spark.operators.sessionize.
    sessionize`, so it is one lag + one cumulative flag over a single
    per-key sort, fully relational. This differs from greedy
    fixed-window debounce (window anchored at the last KEPT event)
    exactly when a chain of sub-gap events outlives one window —
    greedy is an inherently sequential recurrence; island is the
    declarative form engines and stream processors actually ship.

    Returns every row plus boolean ``out_col`` (filter downstream —
    audits want to see what was dropped).
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(*keys).orderBy(
        "__t", *[F.col(c) for c in tiebreak]
    )
    base = df.withColumn("__t", us)
    gap = F.col("__t") - F.lag("__t").over(w)
    return (
        base.withColumn(
            out_col,
            gap.isNull() | (gap > F.lit(int(gap_s) * 1_000_000)),
        )
        .drop("__t")
    )


def recency_features(
    df: DataFrame,
    key_col: str = "user_id",
    type_col: str = "event_type",
    anchor_type: str = "purchase",
    ts_col: str = "ts",
    tiebreak: "Sequence[str]" = ("event_id",),
) -> DataFrame:
    """Point-in-time recency features — for EVERY event, (a) seconds
    since the entity's previous event of the SAME type and (b) seconds
    since the entity's previous ``anchor_type`` event (the
    "time-since-last-purchase" feature every propensity model wants).
    Both look STRICTLY BACKWARD (rows between unbounded preceding and
    1 preceding), so the feature is leakage-safe at the row's own
    timestamp by construction — the invariant ``plans.audit`` exists
    to check.

    Shape: two window frames over ONE logical per-entity sort (the
    same-type lag partitions by (key, type); the anchor recency is a
    conditional MAX over the (key)-partitioned frame — a running
    "latest anchor ts so far", no self-join, no spine, no asof
    machinery needed because the lookup key equals the row key).
    Cold starts are NULL (no prior event exists), never 0 — the honest
    value, same contract as ``decayed_sum``.

    All arithmetic is integer microseconds — bit-stable anywhere.

    Output: every input row plus ``secs_since_same_type`` and
    ``secs_since_anchor`` (long seconds, floor division).
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    tb = [F.col(c) for c in tiebreak]
    base = df.withColumn("__t", us)
    w_same = Window.partitionBy(key_col, type_col).orderBy("__t", *tb)
    w_key = (
        Window.partitionBy(key_col)
        .orderBy("__t", *tb)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_same = F.lag("__t").over(w_same)
    prev_anchor = F.max(
        F.when(F.col(type_col) == anchor_type, F.col("__t"))
    ).over(w_key)
    return (
        base.withColumn(
            "secs_since_same_type",
            ((F.col("__t") - prev_same) / F.lit(1_000_000)).cast("long"),
        )
        .withColumn(
            "secs_since_anchor",
            ((F.col("__t") - prev_anchor) / F.lit(1_000_000)).cast("long"),
        )
        .drop("__t")
    )


def peak_concurrency(
    df: DataFrame,
    start_col: str,
    end_col: str,
    group_cols: "Sequence[str] | tuple" = (),
) -> DataFrame:
    """Peak interval concurrency — per group, the maximum number of
    intervals open at the same instant: the sweep-line answer to "how
    many sessions / jobs / calls ran AT ONCE at the worst moment",
    the capacity-planning complement of ``windows.interval_coverage``
    (coverage sums the union length; this finds the deepest stack).

    Sweep-line as pure relational algebra: every interval unpivots to
    a (+1 at start, -1 at end) delta row, a per-group running sum over
    the (t, delta desc) order walks the timeline, and the peak is the
    max running sum observed AT A START row. Ordering ends after
    starts at the same instant makes overlap INCLUSIVE (an interval
    ending exactly when another starts counts as concurrent); the
    default RANGE window frame sums all peers of a tie at once, so the
    running value at the start block is order-independent within the
    block — deterministic in every engine without a unique tiebreak.

    One shuffle (the group partition), one window; scale is bounded by
    2 rows per interval. Degenerate inputs (end < start) are rejected
    rows the caller should have audited away; they'd just close before
    they open and under-count.

    Output: groups + ``(peak_concurrency, n_intervals)``.
    """
    keys = list(group_cols)
    deltas = df.select(
        *keys,
        F.explode(
            F.array(
                F.struct(
                    F.col(start_col).alias("t"), F.lit(1).alias("delta")
                ),
                F.struct(F.col(end_col).alias("t"), F.lit(-1).alias("delta")),
            )
        ).alias("e"),
    ).select(*keys, "e.t", "e.delta")
    w = Window.partitionBy(*keys if keys else [F.lit(1)]).orderBy(
        F.col("t").asc(), F.col("delta").desc()
    )
    run = deltas.withColumn("__open", F.sum("delta").over(w))
    return run.groupBy(*keys).agg(
        F.max(F.when(F.col("delta") == 1, F.col("__open"))).alias(
            "peak_concurrency"
        ),
        (F.count(F.lit(1)) / 2).cast("long").alias("n_intervals"),
    )


def gap_streaks(
    df: DataFrame,
    entity_col: str,
    ts_col: str = "ts",
    alert_gap_days: int = 7,
) -> DataFrame:
    """Inactivity-gap profile per entity — longest dark streak and how
    often the entity went dark longer than ``alert_gap_days``: the
    data-quality / engagement readout between ``active_days`` (how
    many days) and ``label_churn`` (is the NEXT gap long) — this one
    summarizes the whole gap history per entity.

    Grain-reduce first (distinct active days per entity — the shuffle
    carries days, not events), one lead() per entity partition, one
    agg. A gap is ``next_day - day - 1`` full dark days between two
    active days; the censored tail after the last active day is NOT a
    gap (that's ``label_churn``'s horizon question). Single-day
    entities report zero gaps, NULL max.

    Output: ``(entity, n_active_days, max_gap_days, n_gaps_over)``.
    """
    day = F.expr(
        f"unix_micros(cast({ts_col} as timestamp)) div 86400000000"
    )
    days = df.select(
        F.col(entity_col).alias("entity"), day.alias("__d")
    ).distinct()
    w = Window.partitionBy("entity").orderBy("__d")
    g = days.withColumn("__gap", F.lead("__d").over(w) - F.col("__d") - 1)
    return g.groupBy("entity").agg(
        F.count(F.lit(1)).alias("n_active_days"),
        F.max("__gap").alias("max_gap_days"),
        F.coalesce(
            F.sum(
                (F.col("__gap") > F.lit(alert_gap_days)).cast("long")
            ),
            F.lit(0),
        ).alias("n_gaps_over"),
    )


def interval_align(
    left: DataFrame,
    right: DataFrame,
    on: str,
    l_start: str = "l_start",
    l_end: str = "l_end",
    r_start: str = "r_start",
    r_end: str = "r_end",
) -> DataFrame:
    """Interval-overlap alignment — for every key-matched pair of a
    left interval (a session, a visit, an incident) and a right
    interval (a campaign window, an on-call shift, an outage), the
    OVERLAP DURATION ``max(0, min(ends) − max(starts))``: the
    time-weighted attribution primitive behind "how much of this
    session ran during the promo" — :func:`feat_spark.operators
    .windows.interval_coverage` unions ONE set; this crosses TWO.

    Equi-join on the key plus the overlap band predicate — the range-
    join family's cost model (fan-out bounded by overlapping
    intervals per key, never a cross product). Pure integer
    microsecond arithmetic; half-open [start, end) semantics so
    touching intervals overlap zero.

    Output: ``on`` + ``(l_start, l_end, r_start, r_end,
    overlap_us)`` for pairs with positive overlap.
    """
    j = left.join(right, on).filter(
        (F.col(l_start) < F.col(r_end)) & (F.col(r_start) < F.col(l_end))
    )
    ov = F.least(F.col(l_end), F.col(r_end)) - F.greatest(
        F.col(l_start), F.col(r_start)
    )
    return j.select(
        on, l_start, l_end, r_start, r_end, ov.alias("overlap_us")
    )


def dwell_attribution(
    df: DataFrame,
    entity_col: str,
    type_col: str,
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    cap_s: int = 1800,
) -> DataFrame:
    """Time-spent attribution — each event owns the time until the
    entity's NEXT event (capped, so an overnight gap doesn't award
    eight hours to the last click), rolled up per event type with its
    corpus share: the "where did the minutes go" report behind every
    engagement dashboard, and the honest version of it (the final
    event of an entity owns NOTHING — its dwell is unobserved, not
    zero, and it is excluded rather than imputed).

    One lead() per entity partition (shuffle carries (entity, ts,
    type)), one partial agg, one window total for the share. Integer
    second arithmetic; the share is one division, 9dp.

    Output: ``(event_type, n_events, dwell_s_total, dwell_share)``.
    """
    w = Window.partitionBy(entity_col).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    nxt = F.lead(us, 1).over(w)
    # guard BEFORE least(): least() skips NULLs in every engine, so an
    # unguarded cap would award the final event the full cap instead
    # of excluding it
    gap_s = F.when(
        nxt.isNotNull(),
        F.least((nxt - us) / 1_000_000, F.lit(float(cap_s))),
    )
    d = df.select(
        F.col(type_col).alias("event_type"),
        F.floor(gap_s).cast("long").alias("__dwell"),
    ).filter(F.col("__dwell").isNotNull())
    g = d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("__dwell").alias("dwell_s_total"),
    )
    wa = Window.partitionBy(F.lit(1))
    return g.withColumn("__tot", F.sum("dwell_s_total").over(wa)).select(
        "event_type",
        "n_events",
        "dwell_s_total",
        F.when(
            F.col("__tot") > 0,
            F.round(
                F.col("dwell_s_total").cast("double")
                / F.col("__tot").cast("double"),
                9,
            ),
        ).alias("dwell_share"),
    )


def gap_sensitivity(
    df: DataFrame,
    entity_col: str,
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    gaps_s: "Sequence[int]" = (900, 1800, 3600),
) -> DataFrame:
    """Session-gap sensitivity — how many sessions would each
    candidate inactivity gap produce, from ONE pass: ``n_sessions(g)
    = n_entities + #(inter-event gaps > g)`` (every entity starts one
    session; every over-gap step starts another). The tuning readout
    in front of ``sessionize(gap=...)`` — re-running the sessionizer
    per candidate gap costs a shuffle each; this is one lead() and a
    conditional agg for the whole grid.

    Exact integer counts; a literal unpivot emits one row per
    candidate gap.

    Output: ``(gap_s, n_entities, n_boundaries, n_sessions)``.
    """
    w = Window.partitionBy(entity_col).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gap = us - F.lag(us, 1).over(w)
    d = df.select(F.col(entity_col).alias("__e"), gap.alias("__gap"))
    aggs = [F.count_distinct(F.col("__e")).alias("__ne")]
    for g in gaps_s:
        aggs.append(
            F.sum(
                (F.col("__gap") > int(g) * 1_000_000).cast("long")
            ).alias(f"__b_{g}")
        )
    one = d.agg(*aggs)
    rows = one.select(
        "__ne",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(int(g)).alias("gap_s"),
                        F.col(f"__b_{g}").alias("n_boundaries"),
                    )
                    for g in gaps_s
                ]
            )
        ).alias("r"),
    ).select("__ne", "r.gap_s", "r.n_boundaries")
    return rows.select(
        "gap_s",
        F.col("__ne").alias("n_entities"),
        "n_boundaries",
        (F.col("__ne") + F.col("n_boundaries")).alias("n_sessions"),
    )


def markov_accuracy(
    df: DataFrame,
    entity_col: str,
    type_col: str,
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    day_expr=None,
) -> DataFrame:
    """Next-event predictability — train a first-order Markov
    predictor (argmax of the transition counts) on half the
    transitions, score its accuracy on the other half, per source
    state: the readout that says whether event sequences carry signal
    at all (accuracy ≈ the majority-class rate means they don't) and
    WHICH states are predictable. The evaluation-side companion of
    the transition matrix.

    One lead() builds (cur, next, is_train) transition rows (a
    transition trains iff its SOURCE event's epoch day is even — a
    deterministic hash-free split); the predictor is a per-state
    argmax with (count desc, next asc) tie-breaking; eval rows join
    the (states-sized, broadcast) prediction table. Exact counts, one
    division.

    Output: ``(cur, predicted, n_eval, n_correct, accuracy)``.
    """
    w = Window.partitionBy(entity_col).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    day = (
        day_expr
        if day_expr is not None
        else F.expr(
            f"unix_micros(cast({ts_col} as timestamp)) div 86400000000"
        )
    )
    t = df.select(
        F.col(type_col).alias("cur"),
        F.lead(F.col(type_col), 1).over(w).alias("nxt"),
        (day % 2 == 0).alias("__train"),
    ).filter(F.col("nxt").isNotNull())
    train = (
        t.filter(F.col("__train"))
        .groupBy("cur", "nxt")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    wp = Window.partitionBy("cur").orderBy(
        F.col("__c").desc(), F.col("nxt").asc()
    )
    pred = (
        train.withColumn("__rn", F.row_number().over(wp))
        .filter(F.col("__rn") == 1)
        .select("cur", F.col("nxt").alias("predicted"))
    )
    ev = t.filter(~F.col("__train")).join(F.broadcast(pred), "cur", "inner")
    g = ev.groupBy("cur", "predicted").agg(
        F.count(F.lit(1)).alias("n_eval"),
        F.sum((F.col("nxt") == F.col("predicted")).cast("long")).alias(
            "n_correct"
        ),
    )
    return g.select(
        "cur",
        "predicted",
        "n_eval",
        "n_correct",
        F.round(
            F.col("n_correct").cast("double") / F.col("n_eval").cast("double"),
            9,
        ).alias("accuracy"),
    )


def asof_lastk(
    left: DataFrame,
    right: DataFrame,
    on: str,
    value_col: str,
    k: int = 3,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_tiebreak: "str | None" = None,
) -> DataFrame:
    """Last-k history as-of join — each left row gets the k most
    recent right-side values at its timestamp (``last1`` = the as-of
    match, ``last2`` the one before it, ...): the feature family
    behind "amounts of the last 3 orders at event time", which a
    plain as-of join (k=1) can't express and a windowed collect_list
    over the union frame would pay O(history²) state for.

    The scale device: the RIGHT side precomputes its own lag chain
    (one window over its OWN partition — k-1 lag columns, no growing
    arrays), and then ONE ordinary as-of join (the union-window
    machinery from ``operators/asof.py``, unchanged — hot-key
    isolation and all) carries the whole chain across. Leakage-safe
    by construction: every ``lastN`` is a value from strictly further
    back than the as-of match itself.

    Output: ``left`` + ``last1..lastK`` (NULL where history is
    shorter).
    """
    from feat_spark.operators.asof import asof_join

    order = [F.col(right_ts).asc()]
    if right_tiebreak:
        order.append(F.col(right_tiebreak).asc())
    w = Window.partitionBy(on).orderBy(*order)
    vals = [F.col(value_col).alias("last1")]
    for i in range(1, k):
        vals.append(F.lag(F.col(value_col), i).over(w).alias(f"last{i + 1}"))
    r2 = right.select(on, right_ts, *vals)
    return asof_join(
        left,
        r2,
        on=on,
        left_ts=left_ts,
        right_ts=right_ts,
        value_cols=[f"last{i + 1}" for i in range(k)],
    )
