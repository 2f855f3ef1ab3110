"""Column profiling — the data-quality pass every ingest runs first.

One row per profiled column: row/null/distinct counts, numeric
min/max, string length bounds. The frame is MELTED (one
``struct(name, dval, sval, isnull)`` per column per row, exploded)
and aggregated by column name, so the whole profile is ONE scan of
the table + one partial-agg shuffle keyed by column name — instead of
K separate scans. At 100 TB the explode factor (xK rows, but each a
few bytes wide) is far cheaper than re-reading the table per column,
and column pruning still applies: only profiled columns are read.

``n_distinct`` is exact (``count(distinct ...)``); swap in
``approx_count_distinct`` for trillion-row profiling where a 2%
estimate is fine — the melt shape is unchanged.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame,
    numeric_cols: Sequence[str] = (),
    string_cols: Sequence[str] = (),
) -> DataFrame:
    """Profile the given columns in one pass.

    Output: ``(column_name, n, n_null, n_distinct, min_val, max_val,
    min_len, max_len)`` — numeric stats NULL for string columns and
    vice versa. Distinctness is over the column's own typed value
    (NULLs excluded, per SQL ``count(distinct)``).
    """
    structs = []
    for c in numeric_cols:
        structs.append(
            F.struct(
                F.lit(c).alias("name"),
                F.col(c).cast("double").alias("dval"),
                F.lit(None).cast("string").alias("sval"),
                # null of the CAST value, not the raw column: the
                # profile must be internally consistent (n - n_null
                # bounds n_distinct) even if a cast nulls out values
                F.col(c).cast("double").isNull().alias("isnull"),
            )
        )
    for c in string_cols:
        structs.append(
            F.struct(
                F.lit(c).alias("name"),
                F.lit(None).cast("double").alias("dval"),
                F.col(c).cast("string").alias("sval"),
                F.col(c).cast("string").isNull().alias("isnull"),
            )
        )
    if not structs:
        raise ValueError("profile_columns: no columns given")
    melted = df.select(F.explode(F.array(*structs)).alias("m")).select("m.*")
    return melted.groupBy(F.col("name").alias("column_name")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("isnull").cast("long")).alias("n_null"),
        (F.countDistinct("dval") + F.countDistinct("sval")).alias("n_distinct"),
        F.min("dval").alias("min_val"),
        F.max("dval").alias("max_val"),
        F.min(F.length("sval")).cast("long").alias("min_len"),
        F.max(F.length("sval")).cast("long").alias("max_len"),
    )


def skew_report(df: DataFrame, key: str, topk: int = 5) -> DataFrame:
    """Join/groupBy-key skew diagnostics — run this BEFORE picking a
    join strategy: the top-``topk`` heavy hitters with their corpus
    share and multiple-of-mean. A key with ``x_mean`` in the hundreds
    is the signal to reach for ``salted.py`` / as-of hot-key isolation
    / AQE skew join; this report is how the 100 TB job finds out
    cheaply (one partial-agg shuffle on the key, then a tiny all-keys
    aggregate) instead of by dying in one straggler task.

    Output: ``(key_value, n, share, x_mean, rank)`` — key rendered as
    string so the report is schema-stable for any key type.
    """
    counts = df.groupBy(F.col(key).cast("string").alias("key_value")).agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = counts.agg(
        F.sum("n").alias("__total"), F.count(F.lit(1)).alias("__nkeys")
    )
    # orderBy().limit() compiles to TakeOrdered — each partition keeps
    # its local top-k, the driver merges k*partitions rows. A global
    # row_number window here would instead funnel EVERY key count
    # through one WindowExec partition; at 1e9 keys that is the
    # difference between a report and an outage. The window rank runs
    # only on the k surviving rows.
    top = counts.orderBy(F.col("n").desc(), F.col("key_value").asc()).limit(topk)
    ranked = top.join(F.broadcast(totals)).withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(F.col("n").desc(), F.col("key_value").asc())
        ),
    )
    return ranked.select(
        "key_value",
        "n",
        F.round(F.col("n") / F.col("__total"), 6).alias("share"),
        F.round(
            F.col("n").cast("double") * F.col("__nkeys") / F.col("__total"), 6
        ).alias("x_mean"),
        F.col("rank").cast("long").alias("rank"),
    )


def population_stability(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    n_bins: int = 10,
    floor_p: float = 1e-6,
) -> DataFrame:
    """Population Stability Index between a reference snapshot and a
    current one — the standard feature-drift monitor:
    ``PSI = sum_b (p_b - q_b) * ln(p_b / q_b)`` over equal-frequency
    bins FITTED ON THE REFERENCE (exact percentiles as driver scalars,
    the ``quantile_bin`` device; production monitors freeze exactly
    these bins at training time). Proportions are floored at
    ``floor_p`` so empty bins contribute a large-but-finite term
    instead of infinity. Per-bin terms are decimal-summed, so the
    final PSI is partial-agg-order-free and oracle-replayable.

    Rule of thumb: PSI < 0.1 stable, 0.1–0.25 drifting, > 0.25 act.
    Output: one row ``(feature, psi, n_ref, n_cur, n_bins)``.
    Cost: one percentile aggregate on ref + one counting pass per
    frame; NULL values are excluded from both distributions.
    """
    probs = [i / n_bins for i in range(1, n_bins)]
    row = ref.select(
        F.percentile(F.col(col), F.array(*[F.lit(p) for p in probs])).alias("qs")
    ).collect()[0]
    bounds = list(row["qs"] or [])

    def bin_expr():
        b = F.lit(0)
        for x in bounds:
            b = b + F.when(F.col(col) > F.lit(x), 1).otherwise(0)
        return b

    def bin_counts(df, name):
        return (
            df.filter(F.col(col).isNotNull())
            .groupBy(bin_expr().alias("__bin"))
            .agg(F.count(F.lit(1)).alias(name))
        )

    r = bin_counts(ref, "__nr")
    c = bin_counts(cur, "__nc")
    joined = r.join(c, "__bin", "full_outer").select(
        F.coalesce("__nr", F.lit(0)).alias("__nr"),
        F.coalesce("__nc", F.lit(0)).alias("__nc"),
    )
    tot = joined.agg(
        F.sum("__nr").alias("__tr"), F.sum("__nc").alias("__tc")
    )
    terms = joined.join(F.broadcast(tot)).select(
        "__nr", "__nc", "__tr", "__tc",
        (
            (F.greatest(F.col("__nr") / F.col("__tr"), F.lit(floor_p))
             - F.greatest(F.col("__nc") / F.col("__tc"), F.lit(floor_p)))
            * F.log(
                F.greatest(F.col("__nr") / F.col("__tr"), F.lit(floor_p))
                / F.greatest(F.col("__nc") / F.col("__tc"), F.lit(floor_p))
            )
        ).alias("__term"),
    )
    return terms.agg(
        F.lit(col).alias("feature"),
        F.round(
            F.sum(F.col("__term").cast("decimal(27,12)")).cast("double"), 6
        ).alias("psi"),
        F.max("__tr").alias("n_ref"),
        F.max("__tc").alias("n_cur"),
        F.lit(n_bins).cast("long").alias("n_bins"),
    )


def behavior_entropy(
    df: DataFrame,
    entity_col: str,
    cat_col: str,
    out_col: str = "entropy",
) -> DataFrame:
    """Per-entity Shannon entropy of a categorical distribution — the
    classic behavioral-diversity feature (bot/fraud signal: a scripted
    account hammers one event type, H ~ 0; a human mixes them) and the
    per-slice class-balance check a labeling pipeline runs before
    training.

    Exact cross-engine math: with integer counts ``c_i`` summing to
    ``n``, ``H = ln(n) - (sum_i c_i * ln(c_i)) / n`` — algebraically
    equal to ``-sum p ln p`` but with ONE division at the end, and the
    float fold over ``c_i * ln(c_i)`` runs in lexicographic category
    order (the ``lm_score`` sorted-fold device), so any engine replays
    the bits. Shape: one (entity, cat) partial agg + one per-entity
    agg — two map-side-combinable shuffles, no window, no UDF.

    Output: ``(entity, n_events, n_cats, entropy)`` with entropy
    rounded to 6dp (natural log).
    """
    counts = df.groupBy(
        F.col(entity_col).alias("__e"), F.col(cat_col).alias("__c")
    ).agg(F.count(F.lit(1)).alias("__k"))
    folded = counts.groupBy("__e").agg(
        F.sum("__k").alias("__n"),
        F.count(F.lit(1)).alias("n_cats"),
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__c", "__k"))),
                lambda s: s["__k"].cast("double")
                * F.log(s["__k"].cast("double")),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ).alias("__s"),
    )
    return folded.select(
        F.col("__e").alias(entity_col),
        F.col("__n").cast("long").alias("n_events"),
        F.col("n_cats").cast("long").alias("n_cats"),
        F.round(
            F.log(F.col("__n").cast("double")) - F.col("__s") / F.col("__n"), 6
        ).alias(out_col),
    )


def robust_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_cols: Sequence[str] = ("event_id",),
    k: float = 3.5,
) -> DataFrame:
    """Per-group robust z-score outlier flags via median/MAD — the
    label-noise and telemetry-glitch filter that survives exactly the
    heavy tails that wreck mean/stddev z-scores (one whale inflates a
    stddev; it barely moves a median).

    Exact cross-engine arithmetic: values are quantized to integer
    HALF-cents (cents*2), so every median is an integer or an exact
    .5 and every |x - med| deviation is an integer — the interpolated
    median of integers is identical double math in any engine. The
    robust z is ``(x - med) / mad`` in those integer units (the scale
    cancels), rounded to 6dp; ``mad = 0`` (a majority-constant group)
    yields NULL z and no flag rather than infinity.

    Shape: two grouped EXACT percentile aggregations (group-count
    sized results) broadcast-joined back onto the rows — the fact
    table is never re-shuffled. At 100 TB swap ``percentile`` for
    ``percentile_approx`` per group if group cardinality explodes;
    semantics documented here stay the oracle.
    """
    ids = [id_cols] if isinstance(id_cols, str) else list(id_cols)
    # cents FIRST (scale-2 decimal * 100 has a zero fraction, so the
    # integer cast is exact in every engine), THEN double it in long —
    # casting (decimal * 2) directly would truncate in Spark but round
    # in DuckDB on the leftover .90-style fraction
    h = (F.col(value_col).cast("decimal(18,2)") * 100).cast("long") * 2
    d = df.filter(F.col(value_col).isNotNull()).select(
        *ids, F.col(group_col).alias("__g"), h.alias("__h")
    )
    med = d.groupBy("__g").agg(
        F.expr("percentile(__h, 0.5)").alias("__med")
    )
    with_med = d.join(F.broadcast(med), "__g")
    dev = with_med.withColumn("__dev", F.abs(F.col("__h") - F.col("__med")))
    mad = dev.groupBy("__g").agg(
        F.expr("percentile(__dev, 0.5)").alias("__mad")
    )
    z = F.when(
        F.col("__mad") > 0,
        F.round((F.col("__h") - F.col("__med")) / F.col("__mad"), 6),
    )
    return (
        dev.join(F.broadcast(mad), "__g")
        .select(
            *ids,
            F.col("__g").alias(group_col),
            z.alias("robust_z"),
            (
                (F.col("__mad") > 0)
                & (F.abs(F.col("__h") - F.col("__med")) > k * F.col("__mad"))
            ).alias("is_outlier"),
        )
    )


def histogram_bins(
    df: DataFrame,
    value_col: str,
    group_col: str | None = None,
    n_bins: int = 20,
) -> DataFrame:
    """Equal-WIDTH histogram over integer cents — the shape profile
    that complements :func:`~feat_spark.operators.encoding.quantile_bin`
    (equal-frequency): fixed edges make two runs comparable, which is
    what a drift dashboard plots.

    Bin assignment is pure integer arithmetic —
    ``least(n_bins-1, (c - lo) * n_bins // span)`` on exact cents —
    so no float edge can disagree between engines; edges are emitted
    as exact integer cents. The global ``lo``/``hi`` come from one
    tiny min/max aggregate collected to the driver and folded into
    the plan as literals (the :func:`quantile_bin` device), keeping
    the data pass a single map-side-combinable groupBy. Degenerate
    span (all values equal) collapses to one bin.

    Output per (group,) bin: ``(group?, bin_id, lo_cents, hi_cents,
    n, share)`` — only non-empty bins appear.
    """
    cents = (F.col(value_col).cast("decimal(18,2)") * 100).cast("long")
    d = df.filter(F.col(value_col).isNotNull())
    keys = [group_col] if group_col else []
    d = d.select(*keys, cents.alias("__c"))
    mm = d.agg(F.min("__c").alias("lo"), F.max("__c").alias("hi")).collect()[0]
    lo, hi = mm["lo"], mm["hi"]
    if lo is None:
        return d.select(
            *keys,
            F.lit(0).cast("long").alias("bin_id"),
            F.lit(0).cast("long").alias("lo_cents"),
            F.lit(0).cast("long").alias("hi_cents"),
            F.lit(0).cast("long").alias("n"),
            F.lit(0.0).alias("share"),
        ).limit(0)
    span = hi - lo
    if span == 0:
        bin_id = F.lit(0).cast("long")
    else:
        bin_id = F.least(
            F.lit(n_bins - 1).cast("long"),
            ((F.col("__c") - F.lit(lo)) * n_bins / F.lit(span)).cast("long"),
        )
    total = d.count()
    agg = d.withColumn("bin_id", bin_id).groupBy(*keys, "bin_id").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    edge_lo = F.lit(lo) + (F.col("bin_id") * span / n_bins).cast("long")
    edge_hi = F.lit(lo) + ((F.col("bin_id") + 1) * span / n_bins).cast("long")
    return agg.select(
        *keys,
        F.col("bin_id"),
        edge_lo.cast("long").alias("lo_cents"),
        edge_hi.cast("long").alias("hi_cents"),
        "n",
        F.round(F.col("n") / F.lit(total), 6).alias("share"),
    )


def mutual_information(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
) -> DataFrame:
    """Mutual information I(X; Y) between each categorical feature
    column and a label — the model-free feature-selection ranking
    (which raw columns carry signal about the label at all), run
    before any encoder is fitted.

    With integer cell counts ``c_xy`` (marginals ``c_x``, ``c_y``,
    total ``n``): ``I = sum_xy (c_xy/n) * ln(n*c_xy/(c_x*c_y))`` —
    every log argument a ratio of integers, the fold over cells in
    lexicographic (value, label) order (the ``behavior_entropy``
    sorted-fold device), so an external engine replays the bits.

    Shape: the features MELT into long form (feature, value, label)
    via one explode of a per-row struct array — ONE corpus scan for
    all features — then three partial aggs (cells, value marginals,
    label marginals per feature) and two vocabulary-sized equi-joins.
    Nothing scales with corpus rows except the first agg; a Zipf-hot
    (value,label) cell is bounded by map-side combine. NULLs in
    feature or label count as their own category (missingness is
    signal — the reference's undefined discipline), encoded by a
    sentinel that cannot collide with real values.

    Output: ``(feature, n_rows, n_cells, mi)`` with mi >= 0, 6dp.
    """
    sent = "\x00null\x00"
    pairs = F.array(
        *[
            F.struct(
                F.lit(c).alias("__f"),
                F.coalesce(F.col(c).cast("string"), F.lit(sent)).alias("__x"),
            )
            for c in feature_cols
        ]
    )
    melted = df.select(
        F.explode(pairs).alias("__p"),
        F.coalesce(F.col(label_col).cast("string"), F.lit(sent)).alias("__y"),
    ).select(F.col("__p.__f").alias("__f"), F.col("__p.__x").alias("__x"), "__y")
    cells = melted.groupBy("__f", "__x", "__y").agg(F.count(F.lit(1)).alias("__c"))
    xm = cells.groupBy("__f", "__x").agg(F.sum("__c").alias("__cx"))
    ym = cells.groupBy("__f", "__y").agg(F.sum("__c").alias("__cy"))
    tot = cells.groupBy("__f").agg(F.sum("__c").alias("__n"))
    j = (
        cells.join(xm, ["__f", "__x"])
        .join(ym, ["__f", "__y"])
        .join(tot, "__f")
    )
    folded = j.groupBy("__f").agg(
        F.max("__n").alias("n_rows"),
        F.count(F.lit(1)).alias("n_cells"),
        F.aggregate(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("__x", "__y", "__c", "__cx", "__cy", "__n"))
                ),
                lambda s: (s["__c"].cast("double") / s["__n"].cast("double"))
                * F.log(
                    (s["__n"].cast("double") * s["__c"].cast("double"))
                    / (s["__cx"].cast("double") * s["__cy"].cast("double"))
                ),
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("__mi"),
    )
    return folded.select(
        F.col("__f").alias("feature"),
        "n_rows",
        "n_cells",
        F.round(F.col("__mi"), 6).alias("mi"),
    )


def chi2_assoc(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
) -> DataFrame:
    """Pearson chi-square association between each categorical feature
    and a label — :func:`mutual_information`'s frequentist sibling
    (same contingency table, a statistic with a null distribution, so
    the ranking comes with a significance scale: compare chi2 against
    chi2_{dof}). Cells with integer counts ``c_xy`` and marginals
    ``c_x, c_y, n``: ``chi2 = sum_xy (c_xy - e_xy)^2 / e_xy`` with
    ``e_xy = c_x * c_y / n`` — structurally zero cells contribute
    their expectation, accounted in closed form (see below) so the
    melt never has to materialize absent cells.

    Identical plan shape to mutual_information: one melt scan for all
    features, three partial aggs, vocabulary-sized joins, per-feature
    sorted fold over observed cells (bit-replayable). The zero-cell
    correction: sum over OBSERVED cells of ``(c-e)^2/e = c^2/e - 2c
    + e``, and summing ``e`` over ALL (x, y) pairs gives exactly
    ``n`` — so ``chi2 = fold(c^2/e) - 2n + n = fold(c^2/e) - n``,
    with the fold only over observed cells. dof counts the FULL grid:
    ``(n_x - 1) * (n_y - 1)``.

    Output: ``(feature, n_rows, n_cells, dof, chi2)``, chi2 6dp.
    """
    sent = "\x00null\x00"
    pairs = F.array(
        *[
            F.struct(
                F.lit(c).alias("__f"),
                F.coalesce(F.col(c).cast("string"), F.lit(sent)).alias("__x"),
            )
            for c in feature_cols
        ]
    )
    melted = df.select(
        F.explode(pairs).alias("__p"),
        F.coalesce(F.col(label_col).cast("string"), F.lit(sent)).alias("__y"),
    ).select(F.col("__p.__f").alias("__f"), F.col("__p.__x").alias("__x"), "__y")
    cells = melted.groupBy("__f", "__x", "__y").agg(F.count(F.lit(1)).alias("__c"))
    xm = cells.groupBy("__f", "__x").agg(F.sum("__c").alias("__cx"))
    ym = cells.groupBy("__f", "__y").agg(F.sum("__c").alias("__cy"))
    nx = xm.groupBy("__f").agg(F.count(F.lit(1)).alias("__nx"))
    ny = ym.groupBy("__f").agg(F.count(F.lit(1)).alias("__ny"))
    tot = cells.groupBy("__f").agg(F.sum("__c").alias("__n"))
    j = (
        cells.join(xm, ["__f", "__x"])
        .join(ym, ["__f", "__y"])
        .join(tot, "__f")
    )
    folded = j.groupBy("__f").agg(
        F.max("__n").alias("n_rows"),
        F.count(F.lit(1)).alias("n_cells"),
        F.aggregate(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("__x", "__y", "__c", "__cx", "__cy", "__n"))
                ),
                lambda s: (
                    s["__c"].cast("double") * s["__c"].cast("double")
                )
                / (
                    s["__cx"].cast("double")
                    * s["__cy"].cast("double")
                    / s["__n"].cast("double")
                ),
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("__fold"),
    )
    out = (
        folded.join(nx, "__f")
        .join(ny, "__f")
        .join(tot, "__f")
    )
    return out.select(
        F.col("__f").alias("feature"),
        "n_rows",
        "n_cells",
        ((F.col("__nx") - 1) * (F.col("__ny") - 1)).cast("long").alias("dof"),
        F.round(
            F.col("__fold") - F.col("__n").cast("double"), 6
        ).alias("chi2"),
    )


def seasonal_anomaly(
    df: DataFrame,
    key_cols: Sequence[str] | str,
    ts_col: str = "ts",
    k: float = 3.5,
) -> DataFrame:
    """Seasonal-baseline volume anomalies: each entity's daily event
    count is compared against that entity's OWN day-of-week
    median/MAD baseline — "is this Tuesday weird for this user's
    Tuesdays" — the monitoring readout that plain global z-scores get
    wrong twice (weekly seasonality reads as noise; one whale user
    sets everyone's threshold). :func:`robust_outliers`' half-unit
    integer device at the (entity, dow) grain.

    Shape: grain reduction to (entity, day) counts first — everything
    after runs on the small frame, same discipline as
    ``active_days_feature``; two exact-percentile aggregations at
    (entity, dow) grain joined back by key equality. Counts are
    doubled into half-units so medians are exact half-integers and
    deviations integers — bit-replayable. ``mad = 0`` (a perfectly
    regular weekday — the COMMON case for habitual users, and exactly
    where MAD's 50% breakdown bites: [2,2,2,2,2,40] has MAD 0) falls
    back to flagging ANY departure from the median, with NULL z (no
    finite scale exists); that is the monitoring-correct reading of a
    constant baseline. Days with zero events do not appear (document
    the spine-join variant if silence itself is the anomaly).

    Output: key cols + ``(day, dow, n, robust_z, is_anomaly)``.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    day = F.expr(f"unix_micros(cast({ts_col} as timestamp)) div 86400000000")
    counts = (
        df.select(*keys, day.alias("day"))
        .withColumn("dow", (F.col("day") + 3) % 7)
        .groupBy(*keys, "day", "dow")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("__h", F.col("n") * 2)
    )
    med = counts.groupBy(*keys, "dow").agg(
        F.expr("percentile(__h, 0.5)").alias("__med")
    )
    dev = counts.join(med, [*keys, "dow"]).withColumn(
        "__dev", F.abs(F.col("__h") - F.col("__med"))
    )
    mad = dev.groupBy(*keys, "dow").agg(
        F.expr("percentile(__dev, 0.5)").alias("__mad")
    )
    z = F.when(
        F.col("__mad") > 0,
        F.round((F.col("__h") - F.col("__med")) / F.col("__mad"), 6),
    )
    return (
        dev.join(mad, [*keys, "dow"])
        .select(
            *keys,
            "day",
            "dow",
            "n",
            z.alias("robust_z"),
            F.when(
                F.col("__mad") > 0,
                F.abs(F.col("__h") - F.col("__med"))
                > F.lit(float(k)) * F.col("__mad"),
            )
            .otherwise(F.abs(F.col("__h") - F.col("__med")) > 0)
            .alias("is_anomaly"),
        )
    )


def changepoint_scan(
    df: DataFrame,
    key_cols: Sequence[str] | str,
    ts_col: str = "ts",
    w: int = 7,
    threshold: float = 2.0,
    min_side: int = 3,
) -> DataFrame:
    """Level-shift change-point scan over each entity's daily volume —
    at every observed day, compare the mean of the NEXT ``w`` observed
    days (current day included — the candidate new regime) against the
    mean of the PREVIOUS ``w`` (the old regime) and flag where the
    shift exceeds ``threshold`` events/day. The two-window mean-shift
    form of CUSUM: where :func:`seasonal_anomaly` asks "is this single
    day weird", this asks "did the LEVEL move here" — the monitoring
    readout behind launch/incident detection on volume series.

    Shape: grain reduction to (entity, day) counts first, then two
    ROWS-frame window aggregates over one shared (entity, day) sort —
    no self-join, no iteration. Exactness: sums and counts are
    integers, so the shift's numerator ``sum_r*n_l - sum_l*n_r`` is an
    exact integer; the flag compares it against
    ``threshold * n_l * n_r`` (one float product, identical in any
    engine) and the reported ``mean_shift`` does ONE division per row.

    Frames run over OBSERVED days: the series contract is
    :func:`~feat_spark.operators.encoding.cross_correlation`'s — build
    a day spine with zero-fill first if silent days matter (for pure
    volume drops they do; the spine join is one broadcast of the day
    range). Edges with fewer than ``min_side`` observed days on either
    side return NULL shift and never flag.

    Output: key cols + ``(day, n, mean_shift, is_changepoint)``.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    day = F.expr(f"unix_micros(cast({ts_col} as timestamp)) div 86400000000")
    counts = (
        df.select(*keys, day.alias("day"))
        .groupBy(*keys, "day")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    base = Window.partitionBy(*keys).orderBy("day")
    wl = base.rowsBetween(-w, -1)
    wr = base.rowsBetween(0, w - 1)
    c = (
        counts.withColumn("__sl", F.coalesce(F.sum("n").over(wl), F.lit(0)))
        .withColumn("__nl", F.count(F.lit(1)).over(wl))
        .withColumn("__sr", F.sum("n").over(wr))
        .withColumn("__nr", F.count(F.lit(1)).over(wr))
    )
    ok = (F.col("__nl") >= min_side) & (F.col("__nr") >= min_side)
    num = F.col("__sr") * F.col("__nl") - F.col("__sl") * F.col("__nr")
    den = F.col("__nl") * F.col("__nr")
    return c.select(
        *keys,
        "day",
        "n",
        F.when(ok, F.round(num / den, 6)).alias("mean_shift"),
        F.when(
            ok, F.abs(num) > F.lit(float(threshold)) * den
        )
        .otherwise(F.lit(False))
        .alias("is_changepoint"),
    )


def period_over_period(
    df: DataFrame,
    key_cols: Sequence[str] | str,
    ts_col: str = "ts",
    period_days: int = 7,
) -> DataFrame:
    """Period-over-period volume change per entity — WoW at day grain
    (``period_days=7`` compares every day against the SAME WEEKDAY a
    week earlier, which is why it beats day-over-day for anything with
    a weekly pulse; 28 gives a weekday-aligned MoM). The growth-metric
    readout next to :func:`~feat_spark.operators.profile.
    changepoint_scan`'s alarm.

    A lag() over observed days is WRONG here when days are sparse (it
    would compare against "the previous observed day", whatever its
    distance) — so the prior period is fetched by a self EQUI-join on
    ``(key, day - period_days)``: days missing from the data are
    honestly NULL ``n_prev`` / NULL change. One grain-reduction agg +
    one key-and-day equi-join, counts integer, ONE division per row.

    Output: key cols + ``(day, n, n_prev, pct_change)`` — pct_change
    = (n - n_prev)/n_prev, 6dp, NULL when no prior-period row exists.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    day = F.expr(f"unix_micros(cast({ts_col} as timestamp)) div 86400000000")
    counts = (
        df.select(*keys, day.alias("day"))
        .groupBy(*keys, "day")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    prev = counts.select(
        *keys,
        (F.col("day") + F.lit(int(period_days))).alias("day"),
        F.col("n").alias("n_prev"),
    )
    return counts.join(prev, [*keys, "day"], "left").select(
        *keys,
        "day",
        "n",
        "n_prev",
        F.round(
            (F.col("n") - F.col("n_prev")) / F.col("n_prev"), 6
        ).alias("pct_change"),
    )


def hourly_profile(
    df: DataFrame,
    key_cols: Sequence[str] | str,
    ts_col: str = "ts",
) -> DataFrame:
    """Hour-of-day activity profile per entity — when is this user
    active, how concentrated is that activity, and which hour peaks:
    the temporal-habit feature block under send-time optimization and
    bot heuristics (a "user" active 24/7 with a flat profile is
    rarely a human).

    Grain reduction to (entity, hour) counts first; the peak is an
    argmax by ``(n DESC, hour ASC)`` — the deterministic tiebreak
    makes the readout replayable, where a bare ``max_by`` would be
    free to pick either tied hour. Shares are one integer division,
    6dp. Hours are the engine-wide integer device
    (``epoch_us div 3600e6 mod 24``), not an engine-local calendar
    function.

    Output: key cols + ``(n_total, n_hours_active, peak_hour,
    peak_share)``.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    hour = (
        F.expr(f"unix_micros(cast({ts_col} as timestamp)) div 3600000000")
        % 24
    )
    c = (
        df.select(*keys, hour.alias("hour"))
        .groupBy(*keys, "hour")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy(*keys).orderBy(
        F.col("n").desc(), F.col("hour").asc()
    )
    r = c.withColumn("__rn", F.row_number().over(w))
    return r.groupBy(*keys).agg(
        F.sum("n").alias("n_total"),
        F.count(F.lit(1)).alias("n_hours_active"),
        F.max(F.when(F.col("__rn") == 1, F.col("hour"))).alias("peak_hour"),
        F.round(
            F.max(F.when(F.col("__rn") == 1, F.col("n")))
            / F.sum("n"),
            6,
        ).alias("peak_share"),
    )


def gini_concentration(
    df: DataFrame,
    key_cols: Sequence[str] | str,
    value_col: str = "value",
) -> DataFrame:
    """Gini coefficient of value concentration within each group — the
    whale detector: is this segment's revenue spread across its
    members or carried by three accounts (G=0 perfectly equal, G->1
    one member owns everything). The one-number readout
    :func:`skew_report`'s heavy-hitter list summarizes.

    Exactness: values go to integer cents; within each group the rank
    comes from one window ordered ``(cents, tiebreak implicit by any
    stable order)`` — ties may order arbitrarily because equal values
    contribute the same ``rank*x`` sum under any permutation of
    themselves — and the Gini closed form
    ``G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x))`` has an exact
    INTEGER numerator and denominator, closed by ONE division, 6dp.
    Negative values are a caller error (Gini is defined on
    non-negative quantities); all-zero groups return NULL.

    Output: key cols + ``(n, total_cents, gini)``.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    cents = (F.col(value_col).cast("decimal(18,2)") * 100).cast("long")
    w = Window.partitionBy(*keys).orderBy(F.col("__c").asc())
    r = df.select(*keys, cents.alias("__c")).withColumn(
        "__i", F.row_number().over(w)
    )
    agg = r.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__c").alias("total_cents"),
        F.sum(F.col("__i") * F.col("__c")).alias("__s1"),
    )
    num = 2 * F.col("__s1") - (F.col("n") + 1) * F.col("total_cents")
    den = F.col("n") * F.col("total_cents")
    return agg.select(
        *keys,
        "n",
        "total_cents",
        F.when(F.col("total_cents") > 0, F.round(num / den, 6)).alias(
            "gini"
        ),
    )


def burstiness(
    df: DataFrame,
    key_cols: Sequence[str] | str,
    ts_col: str = "ts",
    tiebreak: Sequence[str] = ("event_id",),
) -> DataFrame:
    """Inter-event burstiness per entity — Goh & Barabási's
    ``B = (σ - μ) / (σ + μ)`` over the gap distribution: B -> -1 for
    metronome regularity (cron jobs, bots), B ≈ 0 for Poisson arrivals
    (memoryless), B -> +1 for heavy-tailed human bursts. The
    inter-arrival companion to :func:`hourly_profile`'s clock-face
    view — a "user" with hourly_profile flatness AND B ≈ -1 is
    automation.

    Exactness: gaps are integer microseconds from ONE lead over the
    stable (ts, tiebreak) order; the gap sum is an exact integer and
    the gap square-sum runs in decimal (a 26-day gap squares past
    int64). Mean/variance close in double with a FIXED operator order
    written identically in the oracle; variance clamps at 0 against
    fp dust. Entities with fewer than 2 gaps return NULL B (no
    dispersion exists).

    ``mean_gap_us`` is reported as HALF-UP INTEGER microseconds via
    pure int64 arithmetic ``(2*sx + n) div (2*n)`` — at gap-sum
    magnitudes (~4e10 µs) a 6dp double round needs more precision
    than a double carries (quantum < ulp), so cross-engine rounding
    becomes bit-unstable; sub-µs decimals of a mean GAP are noise
    anyway. ``b`` (dimensionless, |b| <= 1) stays a 6dp double.

    Output: key cols + ``(n_gaps, mean_gap_us, b)``.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(*keys).orderBy(
        "__t", *[F.col(c) for c in tiebreak]
    )
    base = df.select(
        *keys, us.alias("__t"), *[F.col(c) for c in tiebreak]
    ).withColumn("__g", F.lead("__t").over(w) - F.col("__t"))
    g = F.col("__g")
    gd = g.cast("decimal(18,0)")
    agg = base.filter(g.isNotNull()).groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum(g).alias("__sx"),
        F.sum(gd * gd).cast("double").alias("__sxx"),
    )
    mean = F.col("__sx") / F.col("n_gaps")
    var = F.greatest(
        F.col("__sxx") / F.col("n_gaps") - mean * mean, F.lit(0.0)
    )
    sd = F.sqrt(var)
    return agg.select(
        *keys,
        "n_gaps",
        F.expr("(2 * __sx + n_gaps) div (2 * n_gaps)").alias("mean_gap_us"),
        F.when(
            (F.col("n_gaps") >= 2) & ((sd + mean) > 0),
            F.round((sd - mean) / (sd + mean), 6),
        ).alias("b"),
    )


def lorenz_curve(
    df: DataFrame,
    key_cols: Sequence[str] | str,
    value_col: str = "value",
    n_points: int = 10,
) -> DataFrame:
    """Lorenz curve points per group — the curve
    :func:`gini_concentration` integrates: after sorting the group's
    members by value ascending, the cumulative value share at each
    population decile ("the bottom 80% of users hold 12% of the
    spend"). The readout product teams actually plot.

    Exactness: integer cents, one rank window and its reused-sort
    cumulative sum, decile assignment by INTEGER ceiling arithmetic
    (``(rank * p + n - 1) div n``), per-decile cum = max(cum)
    (monotone, so order-free), ONE division per output row. All-zero
    groups emit NULL shares.

    Output: key cols + ``(point, n_rows, cum_cents, cum_share)``
    where point 1..n_points is the upper population quantile edge.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    cents = (F.col(value_col).cast("decimal(18,2)") * 100).cast("long")
    w = Window.partitionBy(*keys).orderBy(F.col("__c").asc())
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wn = Window.partitionBy(*keys)
    r = (
        df.select(*keys, cents.alias("__c"))
        .withColumn("__rank", F.row_number().over(w))
        .withColumn("__cum", F.sum("__c").over(wc))
        .withColumn("__n", F.count(F.lit(1)).over(wn))
        .withColumn("__tot", F.sum("__c").over(wn))
    )
    pt = F.expr(f"(__rank * {int(n_points)} + __n - 1) div __n")
    agg = r.withColumn("point", pt).groupBy(*keys, "point").agg(
        F.max("__rank").alias("n_rows"),
        F.max("__cum").alias("cum_cents"),
        F.max("__tot").alias("__t"),
    )
    return agg.select(
        *keys,
        "point",
        "n_rows",
        "cum_cents",
        F.when(
            F.col("__t") > 0, F.round(F.col("cum_cents") / F.col("__t"), 6)
        ).alias("cum_share"),
    )


def dow_seasonality_strength(
    df: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """How much of a metric's variance the day-of-week explains — the
    one-way ANOVA eta-squared ``SS_between / SS_total`` with
    day-of-week as the factor, per key: the seasonality-strength
    number that says whether a weekly seasonal baseline
    (``seasonal_anomaly``) is even worth fitting.

    Exactness: values quantize to integer cents; per-(key, dow) sums
    and counts are integers, squared sums ride DECIMAL(27,0) (the
    burstiness device — cents² escapes int64 at scale).
    ``SS_total = Σx² − S²/N`` and
    ``SS_between = Σ_d s_d²/n_d − S²/N`` are fixed-shape double
    expressions over those exact readouts; ``eta2`` rounds to 6dp and
    is NULL for constant keys (SS_total = 0). Day-of-week is the
    repo's ``(epoch_day + 3) % 7`` closed form (0 = Monday), no
    calendar table.

    Two partial aggs (dow grain ≤ 7 rows per key, then key grain) —
    grain reduction first, so the second agg touches 7 rows per key.
    """
    day = F.expr(
        f"unix_micros(cast({ts_col} as timestamp)) div 86400000000"
    )
    c = F.round(F.col(value_col) * 100).cast("long")
    cells = (
        df.select(
            F.col(key_col).alias("k"),
            ((day + 3) % 7).alias("dow"),
            c.alias("c"),
        )
        .groupBy("k", "dow")
        .agg(
            F.count(F.lit(1)).alias("n_d"),
            F.sum("c").alias("s_d"),
            F.sum(
                (F.col("c") * F.col("c")).cast("decimal(27,0)")
            ).alias("ss_d"),
        )
    )
    keys = cells.groupBy("k").agg(
        F.sum("n_d").alias("n"),
        F.sum("s_d").alias("s"),
        F.sum("ss_d").alias("ss"),
        # each dow term is a double cast to decimal BEFORE the sum, so
        # partial-agg order cannot change the result (the repo-wide
        # order-free-sum device)
        F.sum(
            (
                F.col("s_d").cast("double")
                * F.col("s_d").cast("double")
                / F.col("n_d").cast("double")
            ).cast("decimal(27,12)")
        ).alias("sb_raw"),
    )
    grand = (
        F.col("s").cast("double") * F.col("s").cast("double")
        / F.col("n").cast("double")
    )
    ss_total = F.col("ss").cast("double") - grand
    ss_between = F.col("sb_raw").cast("double") - grand
    return keys.select(
        F.col("k").alias(key_col),
        F.col("n").cast("long").alias("n"),
        F.when(ss_total > 0, F.round(ss_between / ss_total, 6)).alias(
            "eta2"
        ),
    )


def daily_percentile_bands(
    df: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-(key, day) p25/p50/p75 bands — the daily latency/value
    envelope a monitoring dashboard draws. Quartiles ON PURPOSE, not
    p90/p99: dyadic probabilities over integer cents interpolate to
    exact quarters in double (the RFM-cuts device), so the bands are
    bit-portable to any linear-interpolation engine; a p99 band's
    0.99*(n-1) weight is float-formula territory and belongs to the
    sketch family (``sketches`` gate) instead — the boundary is
    stated, not fudged.

    One grain-reducing partial agg per (key, day): three percentile
    aggregates share the sort. Output values return to currency scale
    (one /100.0 per band).
    """
    day = F.expr(
        f"unix_micros(cast({ts_col} as timestamp)) div 86400000000"
    )
    c = F.round(F.col(value_col) * 100).cast("long")
    g = df.select(
        F.col(key_col).alias("k"), day.alias("day"), c.alias("c")
    ).groupBy("k", "day")
    return g.agg(
        F.count(F.lit(1)).alias("n"),
        (F.percentile("c", 0.25) / 100.0).alias("p25"),
        (F.percentile("c", 0.5) / 100.0).alias("p50"),
        (F.percentile("c", 0.75) / 100.0).alias("p75"),
    ).select(
        F.col("k").alias(key_col), "day",
        F.col("n").cast("long").alias("n"), "p25", "p50", "p75",
    )


def hll_rollup(
    df: DataFrame,
    group_col: str,
    sub_col,
    id_col: str,
    lg_config_k: int = 12,
) -> DataFrame:
    """Mergeable-sketch distinct rollup — build ONE Datasketches HLL
    sketch per (group, subgroup) leaf with ``hll_sketch_agg``, then
    roll leaves up to the group with ``hll_union_agg`` — the pattern
    that makes 100 TB distinct counting incremental: leaf sketches are
    a few KB each, persistable beside the partition they summarize,
    and any ad-hoc slice (day range, source subset) is a UNION OF
    SKETCHES, never a rescan of raw data. ``approx_count_distinct``
    (the ``sketches`` gate) can't do this — its HLL never leaves the
    aggregation; this surface materializes the sketch as a column.

    The sketch bits are engine-private, so the gate exports what IS
    checkable (the oracle-bounded-sketch device of ``_q_sketches``):
    the exact distinct count rides along, and the merged estimate is
    exported as a relative-error boolean. lgK=12 ⇒ RSE ≈ 1.04/√4096 ≈
    1.6%; the bound below allows 3σ ≈ 5% plus an absolute slack of 3
    for tiny groups.

    Output: ``(group, n_leaves, exact_distinct, merged_within_bounds)``.
    """
    sub = sub_col if not isinstance(sub_col, str) else F.col(sub_col)
    leaf = df.groupBy(
        F.col(group_col).alias("__g"), sub.alias("__s")
    ).agg(F.hll_sketch_agg(F.col(id_col), F.lit(int(lg_config_k))).alias("__sk"))
    merged = leaf.groupBy("__g").agg(
        F.count(F.lit(1)).cast("long").alias("n_leaves"),
        F.hll_sketch_estimate(F.hll_union_agg("__sk")).alias("__est"),
    )
    exact = df.groupBy(F.col(group_col).alias("__g")).agg(
        F.countDistinct(id_col).alias("exact_distinct")
    )
    ok = (
        F.abs(F.col("__est") - F.col("exact_distinct"))
        <= 0.05 * F.col("exact_distinct") + F.lit(3.0)
    )
    return merged.join(exact, "__g").select(
        F.col("__g").alias(group_col),
        "n_leaves",
        "exact_distinct",
        ok.alias("merged_within_bounds"),
    )


def leakage_screen(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    threshold: float = 0.95,
) -> DataFrame:
    """Target-leakage screen — per numeric feature, the point-biserial
    Pearson correlation with a binary label, ranked by magnitude: a
    feature that correlates near-perfectly with the target is almost
    always a LEAK (a post-outcome column, a target transform, a join
    that read the future) and this is the audit that catches it BEFORE
    a model memorizes it. The feature-matrix-side complement of
    ``plans/audit.leakage_audit`` (that one proves the ENGINE reads no
    future rows; this one flags INPUT columns that already contain
    the future).

    Plan shape: the profiler's one-scan melt (see
    :func:`profile_columns`) — all features explode into (name, x)
    rows in a single pass, one partial-aggregated groupBy carries five
    sums per feature. Exactness: features arrive integral (the caller
    quantizes to cents/units), so all S-terms are exact
    decimal(38,0); the correlation closes as
    ``(n*Sxy - Sx*Sy) / sqrt((n*Sxx - Sx^2) * (n*Sy - Sy^2))``
    with the two variance factors cast to double BEFORE the multiply
    (fixed op order; IEEE sqrt and division are correctly rounded),
    9dp. Zero-variance features return NULL.

    Output: ``(feature, n, corr, abs_corr, leakage_suspect)``.
    """
    y = F.col(label_col).cast("decimal(38,0)")
    melted = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("feature"),
                        F.col(c).cast("decimal(38,0)").alias("x"),
                        y.alias("y"),
                    )
                    for c in feature_cols
                ]
            )
        ).alias("m")
    ).select("m.*")
    agg = melted.filter(F.col("x").isNotNull()).groupBy("feature").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("__sx"),
        F.sum("y").alias("__sy"),
        F.sum(F.col("x") * F.col("x")).alias("__sxx"),
        F.sum(F.col("x") * F.col("y")).alias("__sxy"),
    )
    n = F.col("n").cast("decimal(38,0)")
    cov = (n * F.col("__sxy") - F.col("__sx") * F.col("__sy")).cast("double")
    vx = (n * F.col("__sxx") - F.col("__sx") * F.col("__sx")).cast("double")
    vy = (n * F.col("__sy") - F.col("__sy") * F.col("__sy")).cast("double")
    corr = F.round(cov / F.sqrt(vx * vy), 9)
    out = agg.select(
        "feature",
        "n",
        F.when((vx > 0) & (vy > 0), corr).alias("corr"),
    )
    return out.select(
        "feature",
        "n",
        "corr",
        F.abs(F.col("corr")).alias("abs_corr"),
        (F.abs(F.col("corr")) >= F.lit(threshold)).alias("leakage_suspect"),
    )


def mix_shift(
    df: DataFrame,
    period_col: str,
    segment_col: str,
    n_col: str,
    cents_col: str,
    period_a: str = "a",
    period_b: str = "b",
) -> DataFrame:
    """Rate/mix decomposition of a period-over-period change — for
    each segment, how much of the total average-rate delta came from
    the segment's own rate moving (RATE effect) vs traffic shifting
    into/out of it (MIX effect): the "is revenue/turn down because
    conversations got worse, or because the mix tilted to a cheap
    segment" decomposition, one level deeper than
    :func:`period_over_period`'s raw deltas. Identity (the unit
    vectors assert it): ``sum(rate_effect + mix_effect) ==
    rate_B - rate_A`` overall.

    Laspeyres split: ``mix = (w_B - w_A) * r_A`` and
    ``rate = w_B * (r_B - r_A)`` — weights ``w = n_seg/n_tot``, rates
    ``r = cents_seg/n_seg``. Every input is an exact integer sum
    (grain-reduce upstream to (period, segment, n, cents)); w and r
    are one IEEE division each and the effects are fixed-order
    products, 9dp. A segment absent from a period carries w=0 and
    CONTRIBUTES ONLY through the side it exists on (its r on the
    missing side is defined as its OTHER side's r, so the absent side
    adds a pure mix term, never a phantom rate move — the standard
    new/discontinued-segment convention).

    Plan: one (period, segment) agg, per-period totals from a window
    over the segment rows, one full-outer self-align on segment —
    bounded by segments, never data rows.

    Output: ``(segment, w_a, w_b, r_a, r_b, rate_effect,
    mix_effect)``.
    """
    g = df.groupBy(
        F.col(period_col).alias("__p"), F.col(segment_col).alias("segment")
    ).agg(
        F.sum(F.col(n_col).cast("long")).alias("__n"),
        F.sum(F.col(cents_col).cast("long")).alias("__c"),
    )
    w = Window.partitionBy("__p")
    g = g.withColumn("__tot", F.sum("__n").over(w))
    a = g.filter(F.col("__p") == period_a).select(
        "segment",
        F.col("__n").alias("__na"),
        F.col("__c").alias("__ca"),
        F.col("__tot").alias("__ta"),
    )
    b = g.filter(F.col("__p") == period_b).select(
        "segment",
        F.col("__n").alias("__nb"),
        F.col("__c").alias("__cb"),
        F.col("__tot").alias("__tb"),
    )
    j = a.join(b, "segment", "full_outer")
    wa = F.coalesce(
        F.col("__na").cast("double") / F.col("__ta").cast("double"), F.lit(0.0)
    )
    wb = F.coalesce(
        F.col("__nb").cast("double") / F.col("__tb").cast("double"), F.lit(0.0)
    )
    ra_own = F.col("__ca").cast("double") / F.col("__na").cast("double")
    rb_own = F.col("__cb").cast("double") / F.col("__nb").cast("double")
    ra = F.coalesce(ra_own, rb_own)
    rb = F.coalesce(rb_own, ra_own)
    return j.select(
        "segment",
        F.round(wa, 9).alias("w_a"),
        F.round(wb, 9).alias("w_b"),
        F.round(ra, 9).alias("r_a"),
        F.round(rb, 9).alias("r_b"),
        F.round(wb * (rb - ra), 9).alias("rate_effect"),
        F.round((wb - wa) * ra, 9).alias("mix_effect"),
    )


def rolling_hll_distinct(
    df: DataFrame,
    day_expr,
    id_col: str,
    window_days: int = 7,
    lg_config_k: int = 12,
) -> DataFrame:
    """Rolling approximate distinct — per day, the distinct ``id_col``
    count over the trailing ``window_days`` as a UNION OF DAILY HLL
    SKETCHES: the scale answer to rolling actives/WAU when the exact
    day-spine device (``windows.rolling_distinct_count``) would carry
    every (day, id) pair through a shuffle. Daily leaf sketches are a
    few KB; each day's window merges ``window_days`` leaves — the
    whole rolling series costs O(days * window) sketch unions, data is
    scanned ONCE.

    Shuffle shape: NO JOIN — each daily leaf EXPLODES to the <=
    ``window_days`` spine days it contributes to (``sequence(d,
    d+w-1)``), then one equi-keyed ``hll_union_agg`` per day: a
    constant fan-out on the days-sized leaf frame (a band join here
    would plan as a nested loop). Trailing spine days past the data's
    last day are dropped by a semi join against observed days. The
    exact rolling distinct rides along (same explode over distinct
    (day, id) pairs — at audit scale; production trusts the bound)
    and the estimate exports as the oracle-bounded boolean of the
    ``_q_sketches`` device: lgK=12 ⇒ RSE ≈ 1.6%, bound 5% + 3
    absolute.

    Output: ``(day, n_leaves, exact_distinct, merged_within_bounds)``.
    """
    base = df.select(day_expr.alias("__d"), F.col(id_col).alias("__id"))
    leaf = base.groupBy("__d").agg(
        F.hll_sketch_agg(F.col("__id"), F.lit(int(lg_config_k))).alias("__sk")
    )
    spine = F.explode(
        F.sequence(F.col("__d"), F.col("__d") + F.lit(window_days - 1))
    ).alias("day")
    days = leaf.select(F.col("__d").alias("day"))
    merged = (
        leaf.select(spine, "__sk")
        .join(days, "day", "left_semi")
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_leaves"),
            F.hll_sketch_estimate(F.hll_union_agg("__sk")).alias("__est"),
        )
    )
    exact = (
        base.distinct()
        .select(spine, "__id")
        .join(days, "day", "left_semi")
        .groupBy("day")
        .agg(F.countDistinct("__id").alias("exact_distinct"))
    )
    ok = (
        F.abs(F.col("__est") - F.col("exact_distinct"))
        <= 0.05 * F.col("exact_distinct") + F.lit(3.0)
    )
    return merged.join(exact, "day").select(
        "day", "n_leaves", "exact_distinct", ok.alias("merged_within_bounds")
    )


def pareto_frontier(
    df: DataFrame,
    group_cols: "Sequence[str] | tuple",
    x_col: str,
    y_col: str,
    id_col: str,
) -> DataFrame:
    """Per-group Pareto frontier (maximal points, both-higher-better):
    the rows no other row dominates on (x, y) — the skyline of every
    cost/quality trade (model size vs accuracy, price vs rating,
    recall vs reduction_ratio from ``blocking_quality``). The
    frontier answers "which configurations are even worth looking
    at"; everything below it is strictly worse on both axes than
    something else.

    Single-window sweep, no self-join: order each group by
    (x desc, y desc, id asc) and keep a row iff its y strictly
    exceeds the running max of all PRECEDING y — the classic O(n log
    n) skyline scan as a window. Duplicate (x, y) points keep only
    the first by id (strict-dominance would keep both; one
    deterministic representative is the useful report). Ties on x
    resolve correctly because the higher y sorts first and seeds the
    running max.

    Output: groups + ``(id, x, y)`` for frontier rows only.
    """
    keys = list(group_cols)
    w = (
        Window.partitionBy(*keys)
        .orderBy(
            F.col(x_col).desc(), F.col(y_col).desc(), F.col(id_col).asc()
        )
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev = F.max(F.col(y_col)).over(w)
    return (
        df.withColumn("__prev", prev)
        .filter(F.col("__prev").isNull() | (F.col(y_col) > F.col("__prev")))
        .select(*keys, F.col(id_col).alias("id"), F.col(x_col).alias("x"),
                F.col(y_col).alias("y"))
    )


#: Benford first-digit probabilities log10(1 + 1/d), precomputed as
#: double literals so both engines fold the SAME constants (no log10
#: call at query time anywhere).
BENFORD_P = {
    1: 0.3010299956639812, 2: 0.17609125905568124,
    3: 0.12493873660829993, 4: 0.09691001300805642,
    5: 0.07918124604762482, 6: 0.06694678963061322,
    7: 0.05799194697768673, 8: 0.05115252244738129,
    9: 0.04575749056067514,
}


def benford_audit(
    df: DataFrame,
    value_col: str,
) -> DataFrame:
    """Benford first-digit audit — compare the leading-digit
    distribution of a positive amount column against Benford's law:
    the classic fabricated-data / broken-ETL tripwire (organic
    multi-scale amounts follow log10(1+1/d); truncated, defaulted, or
    invented ones don't). One row per digit plus the chi-square
    contribution, so the report says WHICH digits deviate, not just
    that something does.

    Determinism: the first digit is STRING arithmetic
    (``substr(cast(v as string), 1, 1)``) — exact for positive
    integers in any engine, no log10 at query time; expected
    probabilities are baked-in double literals; each digit's
    ``(obs − n·p)² / (n·p)`` is a fixed-order expression of an exact
    count and one literal, 9dp. One partial-agg pass + one 9-row
    window for the total.

    Output: ``(digit, n_obs, expected_p, observed_p, chi2_term)``.
    """
    v = F.col(value_col).cast("long")
    d = df.filter(v >= 1).select(
        F.substring(v.cast("string"), 1, 1).cast("int").alias("digit")
    )
    g = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n_obs"))
    w = Window.partitionBy(F.lit(1))
    g = g.withColumn("__n", F.sum("n_obs").over(w))
    expected = F.col("digit")
    expr = None
    for dig, prob in BENFORD_P.items():
        expr = (
            F.when(expected == dig, F.lit(prob))
            if expr is None
            else expr.when(expected == dig, F.lit(prob))
        )
    e = F.col("__n").cast("double") * expr
    obs = F.col("n_obs").cast("double")
    return g.select(
        "digit",
        "n_obs",
        F.round(expr, 9).alias("expected_p"),
        F.round(obs / F.col("__n").cast("double"), 9).alias("observed_p"),
        F.round((obs - e) * (obs - e) / e, 9).alias("chi2_term"),
    )


def pacing_curve(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Intraday pacing curve — per hour of day, the spend share and
    CUMULATIVE share of the daily total (pooled across days): the
    curve budget pacers and alerting baselines consume ("by 14:00 we
    normally have 61% of daily spend — today we have 40%"). The
    hour-grain sibling of :func:`hourly_profile` (that one profiles
    COUNTS per entity; this paces VALUE corpus-wide).

    One partial agg to 24 rows, one ordered window over them. Exact
    cent sums; shares are one division each, 9dp.

    Output: ``(hour, cents, share, cum_share)``.
    """
    g = df.groupBy(
        F.hour(F.col(ts_col).cast("timestamp")).alias("hour")
    ).agg(
        F.sum(F.round(F.col(value_col) * 100).cast("long")).alias("cents")
    )
    w = Window.orderBy("hour").rowsBetween(Window.unboundedPreceding, 0)
    wa = Window.partitionBy(F.lit(1))
    t = g.withColumn("__cum", F.sum("cents").over(w)).withColumn(
        "__tot", F.sum("cents").over(wa)
    )
    return t.select(
        "hour",
        "cents",
        F.round(
            F.col("cents").cast("double") / F.col("__tot").cast("double"), 9
        ).alias("share"),
        F.round(
            F.col("__cum").cast("double") / F.col("__tot").cast("double"), 9
        ).alias("cum_share"),
    )
