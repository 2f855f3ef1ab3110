"""Training-label construction — the step between a raw event stream
and a supervised dataset, where every leakage accident happens.

Two label families a feature platform must produce at corpus scale
(analogous to the extraction layer the reference builds for features —
``/root/reference/src/feat.erl:95-98`` extracts, these *label*):

* ``time_to_event`` — survival / churn labels: for every event, the
  time until the entity's NEXT occurrence of a target event, censored
  at a horizon. Strictly-future by construction (``rows between 1
  following and unbounded following``), so a row's own target event
  never labels itself and the label cannot leak into features built
  from the strictly-preceding frames in ``operators/windows.py``.
* ``negative_sample`` — deterministic negative pairs for contrastive
  training: for each positive ``(entity, item)`` pair, up to ``k``
  items the entity did NOT interact with.

Both are pure relational plans (no RNG, no UDF, no driver loop) and
replay bit-for-bit in any engine.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from feat_spark.functions.text import md5_long32


def time_to_event(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    id_col: str,
    target_filter,
    horizon_sec: int,
) -> DataFrame:
    """Per-event time-to-next-target label with right-censoring.

    ``target_filter`` is a boolean Column marking target events (e.g.
    ``F.col('event_type') == 'purchase'``). For every input row, finds
    the earliest STRICTLY LATER target event of the same entity
    (later = ``(ts, id)`` lexicographic — the same total order every
    windowed operator in this repo uses, so ties are deterministic).

    Output columns: ``tte_sec`` (whole seconds, floor; capped at
    ``horizon_sec`` when censored) and ``observed`` (False when no
    target follows within the horizon — the censoring indicator a
    survival model needs; the capped ``tte_sec`` is NOT a real
    duration for those rows).

    Scale: one shuffle on ``entity_col`` + one per-entity sort shared
    by the min-over-future frame — the identical layout the cumulative
    / lag feature frames already pay, so label construction co-rides
    their exchange instead of adding one.
    """
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = (
        Window.partitionBy(entity_col)
        .orderBy(ts_us.asc(), F.col(id_col).asc())
        .rowsBetween(1, Window.unboundedFollowing)
    )
    target_ts = F.when(target_filter, ts_us)
    nxt = F.min(target_ts).over(w)
    delta_sec = ((nxt - ts_us) / F.lit(1_000_000)).cast("long")
    observed = nxt.isNotNull() & (delta_sec <= F.lit(horizon_sec))
    return df.withColumn(
        "tte_sec",
        F.when(observed, delta_sec).otherwise(F.lit(horizon_sec).cast("long")),
    ).withColumn("observed", observed)


def negative_sample(
    positives: DataFrame,
    catalog: DataFrame,
    entity_col: str,
    item_col: str,
    catalog_item_col: str,
    k: int = 4,
    salt: str = "neg",
) -> DataFrame:
    """Up to ``k`` deterministic negatives per positive pair.

    The classic implementation — index the catalog 0..M-1 and draw
    random offsets — needs a global ``row_number`` (a single-partition
    funnel) and an RNG (layout-dependent). This one hashes
    ``(salt, entity, item, j)`` straight into the observed item-id
    DOMAIN ``[0, max_id]``, then keeps only candidates that exist
    (semi-join with the catalog) and were never touched by the entity
    (anti-join with ``positives``). No index, no RNG, no funnel; the
    oracle replays the exact pair set.

    Yields AT MOST ``k`` negatives per positive: a candidate is lost
    to an id-domain gap, a collision (two ``j`` hashing alike — the
    survivor keeps the smallest ``j``), or an entity that interacted
    with it. Oversample (larger ``k``) and cap downstream when an
    exact count matters. ``max_id`` enters as one driver-side scalar
    (same class of tiny driver read as the TF-IDF corpus count).

    Scale: explode is k-fold (bounded), both joins are equi-joins on
    the item id; the catalog side of the semi-join is the small
    dimension — Spark broadcasts it under AQE when it fits.
    """
    max_id = catalog.agg(F.max(catalog_item_col)).first()[0]
    cand = (
        positives.select(entity_col, item_col)
        .withColumn("j", F.explode(F.sequence(F.lit(0), F.lit(k - 1))))
        .withColumn(
            "neg_item",
            F.pmod(
                md5_long32(
                    F.concat_ws(
                        ":",
                        F.lit(salt),
                        F.col(entity_col).cast("string"),
                        F.col(item_col).cast("string"),
                        F.col("j").cast("string"),
                    )
                ),
                F.lit(int(max_id) + 1),
            ),
        )
    )
    existing = cand.join(
        catalog.select(F.col(catalog_item_col).alias("neg_item")).distinct(),
        "neg_item",
    )
    untouched = existing.join(
        positives.select(
            F.col(entity_col), F.col(item_col).alias("neg_item")
        ).distinct(),
        [entity_col, "neg_item"],
        "left_anti",
    )
    return untouched.groupBy(entity_col, item_col, "neg_item").agg(
        F.min("j").cast("long").alias("j")
    )


def km_curve(
    df: DataFrame,
    duration_col: str,
    observed_col: str,
) -> DataFrame:
    """Kaplan–Meier survival curve over the censored durations that
    :func:`time_to_event` produces — the population-level readout of
    the same label ("what fraction of users still hadn't purchased
    after t?"), and the standard churn/conversion-lag plot.

    At each distinct duration ``t`` (ascending): ``n_at_risk`` =
    units with duration ≥ t, ``d`` = observed events at t, and
    ``S(t) = Π_{t'<=t} (1 − d/n)``. The product is computed as
    ``exp(Σ ln(1 − d/n))`` with each log-term ROUNDED TO 12dp AND
    DECIMAL-SUMMED over an ordered window (the PageRank contribution
    device) — so the running product is exact-replayable in any
    engine, with no float-accumulation-order hazard. Once ``d = n``
    (everyone at risk exits), survival is exactly 0 from there on.

    Scale shape: the corpus-sized work is ONE groupBy(duration); the
    ordered window then runs over the AGGREGATED duration spine —
    bucket durations (hours/days) upstream so that spine stays
    dimension-scale, as the gate query does. Output:
    ``(t, n_at_risk, d, c, survival)`` with survival at 6dp.
    """
    agg = df.groupBy(F.col(duration_col).alias("t")).agg(
        F.sum(F.col(observed_col).cast("long")).alias("d"),
        F.sum((~F.col(observed_col)).cast("long")).alias("c"),
    )
    w = Window.orderBy("t")
    exits = (F.col("d") + F.col("c")).alias("__x")
    spine = agg.select("t", "d", "c", exits).withColumn(
        "__before", F.coalesce(
            F.sum("__x").over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        )
    )
    total = df.count()
    n_at_risk = (F.lit(total) - F.col("__before")).cast("long")
    factor = F.lit(1.0) - F.col("d") / n_at_risk
    term = F.when(
        F.col("d") < n_at_risk, F.round(F.log(factor), 12)
    ).cast("decimal(27,12)")
    dead = F.max((F.col("d") >= n_at_risk).cast("int")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    surv = F.when(
        dead == 0,
        F.round(
            F.exp(
                F.sum(term)
                .over(w.rowsBetween(Window.unboundedPreceding, 0))
                .cast("double")
            ),
            6,
        ),
    ).otherwise(F.lit(0.0))
    return spine.select(
        "t",
        n_at_risk.alias("n_at_risk"),
        F.col("d").cast("long").alias("d"),
        F.col("c").cast("long").alias("c"),
        surv.alias("survival"),
    )


def label_churn(
    df: DataFrame,
    key_cols: Sequence[str] | str,
    ts_col: str = "ts",
    horizon_days: int = 14,
) -> DataFrame:
    """Churn-by-inactivity training labels: for every (entity,
    active day), did the entity stay silent for more than
    ``horizon_days`` afterwards? The forward-looking companion to
    :func:`time_to_event` (that one measures TO a named event; this
    one measures the gap to the entity's own NEXT activity — the
    standard retention-model target).

    Label semantics are censoring-honest: ``gap_days`` is NULL on each
    entity's final observed day (the future is unobserved), and so is
    ``is_churn`` — emitting false there would leak the dataset
    boundary into the label, the exact bug :mod:`plans.audit` exists
    to catch. Callers cut training data at
    ``max_day - horizon_days`` if they want fully-resolved labels.

    Shape: grain reduction to distinct (entity, day) first, one lead
    over the per-entity day order — no self-join, no spine. All
    integers.

    Output: key cols + ``(day, gap_days, is_churn)``.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    day = F.expr(f"unix_micros(cast({ts_col} as timestamp)) div 86400000000")
    d = df.select(*keys, day.alias("day")).distinct()
    w = Window.partitionBy(*keys).orderBy("day")
    gap = F.lead("day").over(w) - F.col("day")
    return d.select(
        *keys,
        "day",
        gap.alias("gap_days"),
        (gap > F.lit(int(horizon_days))).alias("is_churn"),
    )


def nelson_aalen(
    df: DataFrame,
    duration_col: str,
    observed_col: str,
) -> DataFrame:
    """Nelson–Aalen cumulative-hazard curve ``H(t) = Σ_{t'<=t} d/n``
    over the same censored durations :func:`km_curve` reads — the
    additive view of the hazard (variance-stable where the KM product
    gets noisy deep in the tail, and the input to proportional-hazard
    diagnostics: parallel ``ln H`` curves across cohorts ⇔ the PH
    assumption holds).

    Same distributed spine as :func:`km_curve`: ONE groupBy(duration)
    does all corpus-sized work, the ordered window then runs over the
    aggregated duration spine only. Each increment ``d/n`` is one IEEE
    division ROUNDED TO 12dp and DECIMAL-SUMMED over the ordered
    window (the km_curve / PageRank contribution device) — the running
    hazard is exact-replayable in any engine with no
    float-accumulation-order hazard.

    Output: ``(t, n_at_risk, d, c, cum_hazard)`` with the hazard at
    6dp; once nobody is at risk the row is absent by construction
    (every unit has exited at an earlier t).
    """
    agg = df.groupBy(F.col(duration_col).alias("t")).agg(
        F.sum(F.col(observed_col).cast("long")).alias("d"),
        F.sum((~F.col(observed_col)).cast("long")).alias("c"),
    )
    w = Window.orderBy("t")
    exits = (F.col("d") + F.col("c")).alias("__x")
    spine = agg.select("t", "d", "c", exits).withColumn(
        "__before", F.coalesce(
            F.sum("__x").over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        )
    )
    total = df.count()
    n_at_risk = (F.lit(total) - F.col("__before")).cast("long")
    term = F.round(F.col("d") / n_at_risk, 12).cast("decimal(27,12)")
    cum = F.round(
        F.sum(term)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("double"),
        6,
    )
    return spine.select(
        "t",
        n_at_risk.alias("n_at_risk"),
        F.col("d").cast("long").alias("d"),
        F.col("c").cast("long").alias("c"),
        cum.alias("cum_hazard"),
    )


def km_expected_life(
    km: DataFrame,
    horizon: int,
    t_col: str = "t",
    survival_col: str = "survival",
) -> DataFrame:
    """Restricted mean survival time — the area under the
    Kaplan-Meier curve up to ``horizon``: "expected active
    time/retention within H", the single-number readout of
    :func:`km_curve` that LTV and capacity models consume (a curve is
    a chart; RMST is a feature). Censoring-honest by construction —
    it integrates the estimator instead of averaging raw durations
    (which censoring biases low).

    Geometry: S = 1 on [0, t_1), then S(t_i) holds on
    [t_i, min(t_{i+1}, H)); RMST = the sum of piece areas. The pieces
    are 6dp survival doubles x integer gaps, so the sum accumulates
    via the repo-wide sorted-fold device (array_sort + aggregate over
    the BOUNDED spine — duration buckets, never rows), 6dp.

    Output: one row ``(horizon, n_pieces, expected_life)`` in the
    duration units of ``t_col``.
    """
    from pyspark.sql import Window

    w = Window.orderBy(F.col(t_col).asc())
    pieces = (
        km.filter(F.col(t_col) < horizon)
        .withColumn(
            "__next",
            F.least(
                F.coalesce(F.lead(F.col(t_col), 1).over(w), F.lit(horizon)),
                F.lit(horizon),
            ),
        )
        .select(
            F.col(t_col).alias("__t"),
            (
                F.col(survival_col)
                * (F.col("__next") - F.col(t_col)).cast("double")
            ).alias("__area"),
        )
    )
    head = km.agg(
        F.least(F.min(F.col(t_col)), F.lit(horizon)).alias("__t1")
    ).select(
        F.lit(-1).cast("long").alias("__t"),
        F.greatest(F.col("__t1"), F.lit(0)).cast("double").alias("__area"),
    )
    allp = pieces.unionByName(head)
    return allp.agg(
        F.lit(int(horizon)).alias("horizon"),
        F.count(F.lit(1)).alias("n_pieces"),
        F.round(
            F.aggregate(
                F.array_sort(
                    F.collect_list(F.struct(F.col("__t"), F.col("__area")))
                ),
                F.lit(0.0),
                lambda acc, s: acc + s["__area"],
            ),
            6,
        ).alias("expected_life"),
    )


def time_to_nth_event(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    id_col: str,
    target_filter,
    n: int = 3,
    horizon_sec: int = 259200,
) -> DataFrame:
    """Censored time-to-NTH-target labels — "seconds until the user's
    THIRD purchase after this event": the repeat-behavior label family
    beyond :func:`time_to_event`'s first-occurrence (first conversion
    measures acquisition; the nth measures habit). Same censoring
    contract: targets beyond the horizon — or fewer than n of them —
    observe as the horizon with ``observed = false``.

    The :func:`feat_spark.operators.eventops.asof_lastk` device run
    FORWARD: the target-only frame precomputes its own lead chain
    (each target row knows the ts of the (n-1)th target AFTER itself
    — one window over the small target partition), then ONE forward
    as-of join attaches the chain's tail to every event. No growing
    collect state, no n-way self-join.

    Targets collapse to DISTINCT times per entity first (the nth
    distinct target TIME — same-instant duplicates would make the
    as-of tie ambiguous). Output: ``(id, entity, tte_sec,
    observed)``.
    """
    from feat_spark.operators.asof import asof_join

    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    # DISTINCT target times: the label is "the nth distinct target
    # TIME strictly after t" — same-instant duplicate targets would
    # otherwise make the as-of tie ambiguous
    targets = (
        df.filter(target_filter)
        .select(F.col(entity_col).alias("__e"), us.alias("__tts"))
        .distinct()
    )
    w = Window.partitionBy("__e").orderBy(F.col("__tts").asc())
    chain = targets.select(
        "__e",
        "__tts",
        F.lead("__tts", n - 1).over(w).alias("__nth_ts"),
    )
    left = df.select(
        F.col(id_col).alias("id"),
        F.col(entity_col).alias("__e"),
        us.alias("__us"),
    )
    j = asof_join(
        left,
        chain,
        on="__e",
        left_ts="__us",
        right_ts="__tts",
        value_cols=["__nth_ts"],
        direction="forward",
        allow_exact_matches=False,
    )
    tte = (F.col("__nth_ts") - F.col("__us")) / 1_000_000
    observed = F.col("__nth_ts").isNotNull() & (
        tte <= F.lit(int(horizon_sec))
    )
    return j.select(
        "id",
        F.col("__e").alias("entity"),
        F.when(observed, F.floor(tte).cast("long"))
        .otherwise(F.lit(int(horizon_sec)))
        .alias("tte_sec"),
        observed.alias("observed"),
    )
