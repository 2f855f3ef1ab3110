"""Sessionized funnel analysis — ordered-stage conversion over event
streams (the classic product-analytics operator, here with the
point-in-time discipline the rest of the engine uses).

A funnel ``(s_0, s_1, …, s_k)`` matches when the session contains an
event of type ``s_0``, then an event of type ``s_1`` at-or-after it,
and so on — each stage time is the EARLIEST candidate at-or-after the
previous stage (the standard "first conversion" semantics; re-orderings
like purchase-before-view do not count).

Shape: one conditional aggregate per stage over the (entity, session)
key — stage i+1's aggregate is a filtered min against stage i's time,
carried by an equi-join on the session key. k stages = k hash
aggregates + k-1 broadcast-or-shuffled joins on an already-aggregated
(sessions-sized, not events-sized) frame; the event table is scanned
once per stage but never self-joined row-to-row. All mins are
timestamps (order-free), so the whole funnel replays in SQL.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def session_funnel(
    df: DataFrame,
    stages: Sequence[str],
    keys: Sequence[str] = ("user_id", "session_id"),
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-session funnel times: one row per (entity, session) that
    reached stage 0, with ``t_{i}`` = the first time stage ``i``
    completed (NULL once the funnel stalls) and ``reached_{stage}``
    booleans. Input must already carry the session key (use
    ``operators.sessionize``)."""
    if len(stages) < 2:
        raise ValueError("a funnel needs at least two stages")
    keys = list(keys)
    cur = (
        df.filter(F.col(type_col) == stages[0])
        .groupBy(*keys)
        .agg(F.min(ts_col).alias("t_0"))
    )
    for i, s in enumerate(stages[1:], start=1):
        nxt = (
            df.filter(F.col(type_col) == s)
            .join(cur.select(*keys, f"t_{i-1}"), keys)
            .filter(F.col(ts_col) >= F.col(f"t_{i-1}"))
            .groupBy(*keys)
            .agg(F.min(ts_col).alias(f"t_{i}"))
        )
        cur = cur.join(nxt, keys, "left")
    out = cur
    for i, s in enumerate(stages):
        out = out.withColumn(f"reached_{s}", F.col(f"t_{i}").isNotNull())
    return out


def funnel_summary(funnel: DataFrame, stages: Sequence[str]) -> DataFrame:
    """Corpus-level conversion counts: sessions reaching each stage and
    the step conversion rate vs the previous stage (round 6dp)."""
    aggs = [
        # coalesce: an EMPTY funnel frame (no stage-0 sessions at all)
        # must summarize as zeros, not NULLs
        F.coalesce(F.sum(F.col(f"reached_{s}").cast("long")), F.lit(0)).alias(
            f"n_{s}"
        )
        for s in stages
    ]
    row = funnel.agg(*aggs)
    out = row.select(
        *[F.col(f"n_{s}").cast("long").alias(f"n_{s}") for s in stages],
        *[
            F.round(
                F.col(f"n_{stages[i]}")
                / F.nullif(F.col(f"n_{stages[i-1]}"), F.lit(0)),
                6,
            ).alias(f"rate_{stages[i]}")
            for i in range(1, len(stages))
        ],
    )
    return out


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts: str = "ts",
    bucket_days: int = 7,
) -> DataFrame:
    """Cohort retention matrix: users are cohorted by their first
    active ``bucket_days`` bucket (absolute epoch buckets — stable as
    data grows), and each later bucket's distinct-active count is
    reported as an offset from the cohort start.

    Shape: one distinct-(user, bucket) pass, one per-user min
    (both shuffle on the user key — the second reuses the first's
    partitioning), then a tiny (cohorts x offsets) aggregate; cohort
    sizes join back broadcast. Rates divide by the offset-0 size, so
    every cohort row is self-normalized.

    Output: ``(cohort_bucket, offset, n_active, retention_rate)``.
    NULL users/timestamps drop out (equality joins) — filter upstream
    if they must be counted.
    """
    bucket = F.expr(
        f"unix_micros(cast({ts} as timestamp)) div {86_400_000_000 * bucket_days}"
    )
    activity = (
        df.select(F.col(user_col).alias("__u"), bucket.alias("__b")).distinct()
    )
    first = activity.groupBy("__u").agg(F.min("__b").alias("__cohort"))
    counts = (
        activity.join(first, "__u")
        .groupBy(
            F.col("__cohort").alias("cohort_bucket"),
            (F.col("__b") - F.col("__cohort")).alias("offset"),
        )
        .agg(F.countDistinct("__u").alias("n_active"))
    )
    sizes = counts.filter(F.col("offset") == 0).select(
        "cohort_bucket", F.col("n_active").alias("__size")
    )
    return (
        counts.join(F.broadcast(sizes), "cohort_bucket")
        .select(
            "cohort_bucket",
            "offset",
            "n_active",
            F.round(F.col("n_active") / F.col("__size"), 6).alias(
                "retention_rate"
            ),
        )
    )


def session_ngrams(
    df: DataFrame,
    key_cols: Sequence[str],
    event_col: str,
    order_cols: Sequence[str],
    n: int = 3,
    k: int = 50,
) -> DataFrame:
    """Top-k length-``n`` event-type sequences across sessions — the
    process-mining primitive ("which 3-step paths dominate") behind
    funnel discovery, bot-pattern detection, and UX audits.

    Shape: ONE shuffle groups each key's events; the ordered sequence
    materializes per key via ``array_sort(collect_list(struct(order,
    event)))`` (same device as the sorted folds — deterministic for
    unique order keys); n-grams come from ``transform`` over
    ``sequence`` + ``slice`` (pure JVM, zero UDF); one weighted
    partial-agg counts them corpus-wide. The per-key array is
    session-sized — bounded by the same argument as
    ``pack_sequences``; a Zipf-hot n-gram is bounded by map-side
    combine. Top-k via orderBy+limit = TakeOrdered, ties broken by the
    gram text.

    Output: ``(ngram, count)`` with ``ngram`` the ``" > "``-joined
    event names, count long.
    """
    order_struct = F.struct(*[F.col(c) for c in order_cols], F.col(event_col))
    seqs = df.groupBy(*[F.col(c) for c in key_cols]).agg(
        F.transform(
            F.array_sort(F.collect_list(order_struct)),
            lambda s: s[event_col],
        ).alias("__seq")
    )
    kcol = F.size("__seq") - F.lit(n - 1)
    grams = seqs.select(
        F.explode(
            F.when(
                kcol >= 1,
                F.transform(
                    F.sequence(F.lit(1), kcol),
                    lambda i: F.concat_ws(" > ", F.slice("__seq", i, n)),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("ngram")
    )
    return (
        grams.groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.col("count").desc(), F.col("ngram"))
        .limit(k)
    )


def cohort_ltv(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    revenue_when: str = "event_type = 'purchase'",
    value_col: str = "value",
) -> DataFrame:
    """Cohort lifetime-value curves — the revenue companion to
    :func:`cohort_retention`: users grouped by first-activity week,
    revenue accumulated by cohort age, read out as cumulative LTV per
    cohort member ("week-3 LTV of the March-4 cohort"). THE payback /
    unit-economics readout.

    Exactness: revenue goes to integer cents (scale-2 decimal * 100),
    cohort/age weeks are integer epoch-week arithmetic, the cumulative
    sum is an integer window, and LTV does ONE division per output
    row. Cohort week = the user's min event week (one grain-reduction
    agg); cohort size is a distinct-user count at the same grain.

    Grain contract: ages appear only for weeks where the cohort had
    ANY event (zero-revenue active weeks appear with 0; fully silent
    weeks don't — the running sum still carries past revenue forward
    at the next observed age, so the curve is correct at every emitted
    point; spine-fill first if a dense matrix is needed).

    Output: ``(cohort_week, age_weeks, n_active, revenue_cents,
    cum_revenue_cents, cohort_size, ltv)``, ltv 6dp.
    """
    week = F.expr(
        f"unix_micros(cast({ts_col} as timestamp)) div 604800000000"
    )
    cents = (
        F.when(
            F.expr(revenue_when),
            (F.col(value_col).cast("decimal(18,2)") * 100).cast("long"),
        ).otherwise(F.lit(0))
    )
    base = df.select(
        F.col(key_col).alias("__u"), week.alias("__w"), cents.alias("__c")
    )
    first = base.groupBy("__u").agg(F.min("__w").alias("__cw"))
    sized = first.groupBy("__cw").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    j = base.join(first, "__u").select(
        "__u",
        F.col("__cw").alias("cohort_week"),
        (F.col("__w") - F.col("__cw")).alias("age_weeks"),
        "__c",
    )
    agg = j.groupBy("cohort_week", "age_weeks").agg(
        F.count_distinct("__u").alias("n_active"),
        F.sum("__c").alias("revenue_cents"),
    )
    w = Window.partitionBy("cohort_week").orderBy("age_weeks").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        agg.withColumn("cum_revenue_cents", F.sum("revenue_cents").over(w))
        .join(
            sized.select(F.col("__cw").alias("cohort_week"), "cohort_size"),
            "cohort_week",
        )
        .select(
            "cohort_week",
            "age_weeks",
            "n_active",
            "revenue_cents",
            "cum_revenue_cents",
            "cohort_size",
            F.round(
                F.col("cum_revenue_cents") / (F.col("cohort_size") * 100),
                6,
            ).alias("ltv"),
        )
    )


def sequence_pattern_count(
    df: DataFrame,
    key_cols: Sequence[str] | str,
    pattern: str,
    symbols: "dict[str, str]",
    order_cols: Sequence[str] = ("ts", "event_id"),
    type_col: str = "event_type",
    max_events: int = 10_000,
) -> DataFrame:
    """Regex pattern matching over per-entity EVENT SEQUENCES — the
    MATCH_RECOGNIZE-lite that answers "how many times did this user
    view, click any number of times, then purchase" as a single regex
    (``v c* p``) instead of a hand-built funnel join per shape.
    :func:`session_funnel` checks ONE fixed stage chain; this runs any
    regular grammar.

    Mechanics: each event maps through ``symbols`` (event type -> one
    character; unmapped types become ``.`` fillers that break false
    adjacency but still occupy a position), the per-entity sequence is
    folded into ONE string in stable (order_cols) order — a sorted
    fold, deterministic — and ``regexp_count`` does the matching
    (non-overlapping, like every SQL regex engine). Keep patterns
    lookaround-free: both engines run plain regex syntax (RE2/
    java.util.regex agree there).

    Scale contract: per-entity state is a string of one char per
    event, truncated to the EARLIEST ``max_events`` (a lazy slice —
    no driver-side validation pass), with a ``truncated`` flag so
    downstream knows a pattern could span the cut. The cap is the
    same bounded-collect discipline as packing/NDCG — entities are
    conversations/users, not the corpus.

    Output: key cols + ``(n_events, truncated, n_matches)`` —
    matches are counted on the (possibly truncated) prefix.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    sym = F.lit(".")
    for t, ch in sorted(symbols.items()):
        if len(ch) != 1:
            raise ValueError(f"symbol for {t!r} must be one char")
        sym = F.when(F.col(type_col) == t, ch).otherwise(sym)
    base = df.select(
        *keys, *[F.col(c) for c in order_cols], sym.alias("__ch")
    )
    folded = base.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.array_join(
            F.transform(
                F.slice(
                    F.array_sort(
                        F.collect_list(F.struct(*order_cols, "__ch"))
                    ),
                    1,
                    max_events,
                ),
                lambda s: s["__ch"],
            ),
            "",
        ).alias("__seq"),
    )
    return folded.select(
        *keys,
        "n_events",
        (F.col("n_events") > max_events).alias("truncated"),
        F.regexp_count(F.col("__seq"), F.lit(pattern)).alias("n_matches"),
    )


def funnel_latency(
    funnel: DataFrame,
    stages: Sequence[str],
    ts_prefix: str = "t_",
) -> DataFrame:
    """Stage-transition latency summary over a :func:`session_funnel`
    frame — conversion RATES say how many sessions survive each step;
    this says how LONG the survivors took (the metric behind "users
    who buy do it within 4 minutes of the first click").

    Per transition ``i-1 -> i``: the count of sessions that completed
    it and the exact MEDIAN of the integer epoch-microsecond deltas
    (``percentile(0.5)`` on integers is exact-half arithmetic — the
    engine's dyadic-prob discipline; means are exact integer-sum /
    count with one division). One aggregate over the sessions-sized
    funnel frame; long output (one row per transition) so k stages
    never widen the schema.

    Input timestamps must be epoch-us BIGINTs (the funnel gate's
    output form) or castable timestamps.

    Output: ``(transition, n_completed, median_us, mean_us)``.
    """
    outs = []
    for i in range(1, len(stages)):
        d = (F.col(f"{ts_prefix}{i}") - F.col(f"{ts_prefix}{i-1}")).alias(
            "__d"
        )
        agg = funnel.select(d).filter(F.col("__d").isNotNull()).agg(
            F.count(F.lit(1)).alias("n_completed"),
            F.percentile(F.col("__d"), F.lit(0.5)).alias("median_us"),
            F.round(F.sum("__d") / F.count(F.lit(1)), 6).alias("mean_us"),
        )
        outs.append(
            agg.select(
                F.lit(f"{stages[i-1]}->{stages[i]}").alias("transition"),
                "n_completed",
                "median_us",
                "mean_us",
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def window_funnel(
    df: DataFrame,
    steps: Sequence[str],
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    window_s: int = 3600,
) -> DataFrame:
    """Strict sliding-window funnel depth (the ClickHouse
    ``windowFunnel`` semantics, vs :func:`session_funnel`'s
    session-scoped form): for every entity, the deepest step chain
    ``s1 < s2 < ... <= s1 + window`` achievable from ANY step-1
    anchor — "did a view become a click become a purchase within an
    hour OF THE VIEW", where sessions would blur the clock.

    Relational unrolling, one time-band equi-join per step (funnels
    are 3-5 steps — the join count is schema-bounded, never
    data-bounded): each stage keeps, per (entity, anchor), the
    EARLIEST qualifying next-step time (greedy-earliest maximizes
    remaining window, so it is optimal — the exchange argument), and
    the final agg takes the max depth over anchors. Anchor fan-out is
    events-in-window per key, the same band-join shape as
    ``attribution``.

    Output: ``(key, n_anchors, max_depth)`` — entities with no step-1
    event are honestly absent (depth 0 is "not in the funnel").
    """
    if len(steps) < 2:
        raise ValueError("a funnel needs at least two steps")
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    ev = df.select(
        F.col(key_col).alias("k"),
        F.col(type_col).alias("t"),
        us.alias("u"),
    )
    win = int(window_s) * 1_000_000
    cur = (
        ev.filter(F.col("t") == steps[0])
        .select("k", F.col("u").alias("t0"))
        .withColumn("prev", F.col("t0"))
        .withColumn("depth", F.lit(1))
    )
    for i, s in enumerate(steps[1:], start=2):
        nxt = ev.filter(F.col("t") == s).select(
            F.col("k").alias("k2"), F.col("u").alias("un")
        )
        hit = (
            cur.join(
                nxt,
                (F.col("k") == F.col("k2"))
                & (F.col("un") > F.col("prev"))
                & (F.col("un") <= F.col("t0") + F.lit(win)),
            )
            .groupBy("k", "t0")
            .agg(F.min("un").alias("un"))
        )
        cur = (
            cur.join(hit.withColumnRenamed("un", "__n"), ["k", "t0"], "left")
            .select(
                "k",
                "t0",
                F.coalesce("__n", F.col("prev")).alias("prev"),
                F.when(F.col("__n").isNotNull(), F.lit(i))
                .otherwise(F.col("depth"))
                .alias("depth"),
            )
        )
        # a stalled anchor keeps its depth and exits the join stream:
        # its prev becomes NULL, and ``un > NULL`` never matches, so a
        # later step cannot skip over the missing one
        cur = cur.withColumn(
            "prev",
            F.when(F.col("depth") == i, F.col("prev")),
        )
    return cur.groupBy(F.col("k").alias(key_col)).agg(
        F.count(F.lit(1)).cast("long").alias("n_anchors"),
        F.max("depth").cast("int").alias("max_depth"),
    )


def growth_accounting(
    df: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    resurrect_gap_days: int = 7,
) -> DataFrame:
    """Daily growth accounting — the new / retained / resurrected
    decomposition of every day's active entities (the standard growth
    dashboard): ``new`` = first-ever active day, ``retained`` = last
    activity within ``resurrect_gap_days``, ``resurrected`` = came
    back after a longer silence.

    Grain reduction first — distinct (entity, day) — then ONE window
    (min day + lag day per entity, shared partitioning) and one
    day-keyed partial agg. All-integer day arithmetic.

    Output per day: ``(day, n_active, n_new, n_retained,
    n_resurrected)`` with the invariant
    ``n_active = n_new + n_retained + n_resurrected`` (churn is
    derivable: yesterday's actives minus today's retained).
    """
    day = F.expr(
        f"unix_micros(cast({ts_col} as timestamp)) div 86400000000"
    )
    grain = df.select(
        F.col(entity_col).alias("e"), day.alias("day")
    ).distinct()
    w = Window.partitionBy("e").orderBy("day")
    first = Window.partitionBy("e")
    g = grain.select(
        "e",
        "day",
        F.min("day").over(first).alias("__first"),
        F.lag("day").over(w).alias("__prev"),
    )
    status = (
        F.when(F.col("day") == F.col("__first"), F.lit("new"))
        .when(
            F.col("day") - F.col("__prev") <= resurrect_gap_days,
            F.lit("retained"),
        )
        .otherwise(F.lit("resurrected"))
    )
    return (
        g.withColumn("__s", status)
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_active"),
            F.sum((F.col("__s") == "new").cast("long")).alias("n_new"),
            F.sum((F.col("__s") == "retained").cast("long")).alias(
                "n_retained"
            ),
            F.sum((F.col("__s") == "resurrected").cast("long")).alias(
                "n_resurrected"
            ),
        )
    )


def top_paths(
    df: DataFrame,
    entity_col: str,
    type_col: str,
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    max_steps: int = 5,
    topn: int = 20,
) -> DataFrame:
    """Top entry paths — each entity's FIRST ``max_steps`` event types
    joined into an ordered path string, counted corpus-wide, top
    ``topn``: the Sankey / user-journey readout ("v>v>c>p beats
    v>c>v>p 3:1") that sits between :func:`sequence_pattern_count`
    (does a KNOWN pattern occur) and the transition matrix (one-step
    Markov) — this one DISCOVERS the dominant multi-step journeys.

    Plan shape: one per-entity window (ts, tiebreak — deterministic
    total order) takes row_number, rows beyond ``max_steps`` are
    FILTERED BEFORE the path agg (the shuffle carries at most
    ``max_steps`` rows per entity, not the entity's history), the
    path builds as a sorted-fold string (array_sort on (rn, type)
    structs -> join '>'), and the corpus count is one partial agg.
    The final top-n is a TakeOrdered (count desc, path asc) — no
    global sort materializes.

    Output: ``(path, n_entities, depth)``, at most ``topn`` rows.
    """
    w = Window.partitionBy(entity_col).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    first = (
        df.select(entity_col, type_col, ts_col, tiebreak_col)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= max_steps)
    )
    paths = first.groupBy(entity_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("__rn"), F.col(type_col)))
                ),
                lambda s: s[type_col],
            ),
            ">",
        ).alias("path"),
        F.count(F.lit(1)).alias("depth"),
    )
    return (
        paths.groupBy("path", "depth")
        .agg(F.count(F.lit(1)).alias("n_entities"))
        .orderBy(F.col("n_entities").desc(), F.col("path").asc())
        .limit(topn)
        .select("path", "n_entities", "depth")
    )
