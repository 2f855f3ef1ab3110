"""Feature encoding — discretization and categorical target encoding.

* :func:`quantile_bin` — equal-frequency binning: exact percentile
  boundaries (one sort-based aggregate, collected as driver scalars —
  the same tiny-driver-read class as a checkpoint manifest), then a
  pure Column count-of-boundaries-below per row. At 100 TB the swap is
  ``approx_percentile`` boundaries (or boundaries frozen from a
  training snapshot — which production encoders want anyway so serving
  bins match training); the assignment expression is unchanged.
* :func:`cumulative_target_encode` — the leakage-safe categorical
  encoder: each row's category value is summarized by the TARGET mean
  over strictly PRECEDING rows of the same category (time-ordered
  leave-future-out — the only target encoding that is valid for
  point-in-time training data; the classic whole-corpus mean leaks the
  row's own label and every future one). One window over the category
  partition: a hot category is a single partition's ordered scan —
  for Zipf-hot categories bound it with ``operators/chunked.py``'s
  prefix-sum form.

Decimal-sum discipline throughout (sum in decimal, divide as double,
round 6dp) so both columns replay bit-for-bit in the DuckDB oracle.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def quantile_bin(
    df: DataFrame,
    col: str,
    n_bins: int = 4,
    out_col: str | None = None,
) -> DataFrame:
    """Add ``{col}_bin`` (0-based, int): equal-frequency bin by exact
    continuous percentiles. NULL values get a NULL bin. Returns the
    input frame plus the bin column; boundaries are half-open —
    ``bin = #{boundaries strictly below value}``."""
    out_col = out_col or f"{col}_bin"
    probs = [i / n_bins for i in range(1, n_bins)]
    row = df.select(
        F.percentile(F.col(col), F.array(*[F.lit(p) for p in probs])).alias("qs")
    ).collect()[0]
    bounds = list(row["qs"] or [])
    bin_expr = F.lit(0)
    for b in bounds:
        bin_expr = bin_expr + F.when(F.col(col) > F.lit(b), 1).otherwise(0)
    return df.withColumn(
        out_col,
        F.when(F.col(col).isNull(), F.lit(None)).otherwise(bin_expr).cast("int"),
    )


def cumulative_target_encode(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    order: Sequence[str] = ("ts",),
    tiebreak: Sequence[str] = (),
    out_col: str | None = None,
) -> DataFrame:
    """Add ``{cat}_te``: mean of ``target_col`` over strictly preceding
    rows (in ``order``+``tiebreak``) of the same category; NULL for a
    category's first row (no history — the honest cold-start value,
    callers coalesce to a prior if they want one)."""
    out_col = out_col or f"{cat_col}_te"
    w = (
        Window.partitionBy(cat_col)
        .orderBy(*[F.col(c) for c in (*order, *tiebreak)])
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # decimal(27,12), not (18,2): the sum must be order-free for the
    # oracle AND must not quantize small-magnitude targets (CTR-style
    # labels like 0.003 round to 0.00 at scale 2 — review finding r3).
    # double-first so the decimal sees the full double, same rule as
    # kmeans_centroids
    s = F.sum(F.col(target_col).cast("double").cast("decimal(27,12)")).over(w)
    n = F.count(target_col).over(w)
    return df.withColumn(
        out_col,
        F.when(n > 0, F.round(s.cast("double") / n, 6)),
    )


def winsorize(
    df: DataFrame,
    col: str,
    group_col: str,
    lo: float = 0.05,
    hi: float = 0.95,
    out_col: str | None = None,
) -> DataFrame:
    """Group-wise winsorization: clip ``col`` to its group's exact
    [lo, hi] continuous percentiles — the standard robust-feature
    guard against fat-tailed numeric columns.

    Execution shape: ONE sort-based percentile aggregate keyed by the
    group (the only shuffle), bounds broadcast back onto the fact rows
    as a map-side join — the fact table itself never reshuffles. Exact
    percentiles replay bit-for-bit in the oracle (Spark ``percentile``
    == DuckDB ``quantile_cont``); at 100 TB swap in
    ``approx_percentile`` or training-snapshot-frozen bounds, keeping
    the clip expression unchanged.
    """
    out_col = out_col or f"{col}_wins"
    bounds = df.groupBy(F.col(group_col).alias("__g")).agg(
        F.percentile(F.col(col), F.lit(lo)).alias("__lo"),
        F.percentile(F.col(col), F.lit(hi)).alias("__hi"),
    )
    clipped = F.least(F.greatest(F.col(col), F.col("__lo")), F.col("__hi"))
    return (
        # null-safe: NULL-group rows keep their own group's bounds
        # instead of being dropped by a plain equality join
        df.join(F.broadcast(bounds), F.col(group_col).eqNullSafe(F.col("__g")))
        .drop("__g")
        .withColumn(
            out_col,
            # explicit NULL guard: greatest/least SKIP nulls (both
            # engines), which would clip a NULL value to the bound
            F.when(F.col(col).isNull(), F.lit(None).cast("double"))
            .otherwise(F.round(clipped, 6)),
        )
        .drop("__lo", "__hi")
    )


def calendar_features(
    df: DataFrame,
    ts: str = "ts",
    prefix: str = "",
) -> DataFrame:
    """Calendar feature block: day-of-week (0=Monday), hour-of-day
    (UTC), weekend flag, and the cyclical sin/cos encodings models
    actually consume (hour 23 and hour 0 are neighbors on the circle,
    not 23 apart).

    dow and hour come from INTEGER arithmetic on epoch-microseconds
    ((days+3) % 7; 1970-01-01 was a Thursday), not from the engine's
    dayofweek() — engines disagree on whether weeks start at Sunday=0,
    Sunday=1 or Monday=1, and integer arithmetic is convention-free
    and replayable. Pure projection: zero shuffle.
    """
    epoch_day = F.expr(f"unix_micros(cast({ts} as timestamp)) div 86400000000")
    dow = (epoch_day + 3) % 7
    hour = (
        F.expr(f"unix_micros(cast({ts} as timestamp)) div 3600000000") % 24
    )
    tau = 6.283185307179586
    return (
        df.withColumn(f"{prefix}dow", dow)
        .withColumn(f"{prefix}hour", hour)
        .withColumn(f"{prefix}is_weekend", dow >= 5)
        .withColumn(f"{prefix}hour_sin", F.round(F.sin(F.lit(tau) * hour / 24), 6))
        .withColumn(f"{prefix}hour_cos", F.round(F.cos(F.lit(tau) * hour / 24), 6))
    )


def impute_group_mean(
    df: DataFrame,
    col: str,
    group_col: str,
    out_col: str | None = None,
) -> DataFrame:
    """Null imputation by group mean: NULLs in ``col`` are replaced by
    the decimal-summed mean of the group's NON-NULL values (round 6);
    a ``{col}_was_null`` flag is kept — models usually want the
    missingness signal as much as the filled value. Groups that are
    entirely NULL stay NULL (no global fallback smuggled in).

    One partial-agg shuffle keyed by the group; means broadcast back
    onto the fact rows — same map-side shape as ``winsorize``.
    """
    out_col = out_col or f"{col}_imputed"
    means = df.groupBy(F.col(group_col).alias("__g")).agg(
        F.when(
            F.count(col) > 0,
            F.round(
                F.sum(F.col(col).cast("double").cast("decimal(27,12)"))
                .cast("double")
                / F.count(col),
                6,
            ),
        ).alias("__gmean")
    )
    return (
        # null-safe: a NULL group is a real group, not a dropped row
        df.join(F.broadcast(means), F.col(group_col).eqNullSafe(F.col("__g")))
        .drop("__g")
        .withColumn(f"{col}_was_null", F.col(col).isNull())
        .withColumn(out_col, F.coalesce(F.col(col), F.col("__gmean")))
        .drop("__gmean")
    )


def group_linear_fit(
    df: DataFrame,
    x_col,
    y_col: str,
    group_col: str,
) -> DataFrame:
    """Per-group closed-form OLS (y = slope*x + intercept) — the
    classic per-entity TREND feature (e.g. each user's value drift
    over time), fitted in ONE aggregation pass via the normal
    equations: slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2).

    Distributed-fitting shape: no per-group iteration, no driver
    loops — five decimal sums per group (exact => partial-agg order
    can't change them) and a closed-form combine in double. x is
    CENTERED on the group minimum first (one window over the same
    hash partitioning the aggregate reuses): centering bounds the
    decimal magnitudes and kills the n*Sxx - Sx^2 cancellation that
    would otherwise eat the slope's precision at epoch-second scale.

    Degenerate guards: constant x -> NULL slope/intercept/r2;
    constant y (with varying x) -> slope 0 and NULL r2 (0/0 honest).

    Output: ``(group, n_obs, slope, intercept, r2)``; slope 9dp
    (per-second trends are small), intercept/r2 6dp.
    """
    x = x_col if not isinstance(x_col, str) else F.col(x_col)
    w = Window.partitionBy(group_col)
    # filter BEFORE the centering min: a NULL-y row must not define the
    # group's x origin (the oracle filters first; centering on a row
    # that then drops out would shift the intercept)
    d = (
        df.withColumn("__x", x.cast("double"))
        .filter(F.col("__x").isNotNull() & F.col(y_col).isNotNull())
        .withColumn("__xc", F.col("__x") - F.min("__x").over(w))
    )
    xd = F.col("__xc").cast("decimal(18,6)")
    yd = F.col(y_col).cast("double").cast("decimal(18,6)")
    agg = d.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum(xd).cast("double").alias("__sx"),
        F.sum(yd).cast("double").alias("__sy"),
        F.sum(xd * yd).cast("double").alias("__sxy"),
        F.sum(xd * xd).cast("double").alias("__sxx"),
        F.sum(yd * yd).cast("double").alias("__syy"),
    )
    n = F.col("n_obs")
    covn = n * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    varxn = n * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    varyn = n * F.col("__syy") - F.col("__sy") * F.col("__sy")
    slope = F.when(varxn > 0, covn / varxn)
    intercept = F.when(
        varxn > 0, (F.col("__sy") - covn / varxn * F.col("__sx")) / n
    )
    r2 = F.when(
        (varxn > 0) & (varyn > 0), covn * covn / (varxn * varyn)
    )
    return agg.select(
        group_col,
        "n_obs",
        F.round(slope, 9).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
        F.round(r2, 6).alias("r2"),
    )


def build_vocab(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 1,
    max_size: int | None = None,
) -> DataFrame:
    """Frequency-ranked token vocabulary with stable ids — the
    StringIndexer/CountVectorizer build step every bag-of-words or
    embedding-lookup pipeline needs: ``token_id`` 0 is the most
    frequent surviving token, ties break lexicographically, ids are
    dense, and anything outside the table is the caller's OOV bucket.

    Scale note: the corpus-sized work is ONE map-side-combinable
    word count; the ``row_number`` ranking runs on the already
    aggregated vocabulary (bounded by ``max_size`` / the type count,
    i.e. dimension-scale), so the single-partition window sorts
    thousands of rows, never the corpus. Deterministic by
    construction — no monotonically_increasing_id, no RNG.

    Output: ``(word, token_id, n_occurrences)``.
    """
    from feat_spark.functions.text import words

    w = df.select(F.explode(words(text_col)).alias("word")).filter(
        F.col("word") != ""
    )
    counts = w.groupBy("word").agg(
        F.count(F.lit(1)).alias("n_occurrences")
    )
    if min_count > 1:
        counts = counts.filter(F.col("n_occurrences") >= min_count)
    win = Window.orderBy(
        F.col("n_occurrences").desc(), F.col("word").asc()
    )
    out = counts.withColumn(
        "token_id", (F.row_number().over(win) - 1).cast("long")
    )
    if max_size is not None:
        out = out.filter(F.col("token_id") < max_size)
    return out.select(
        "word", "token_id", F.col("n_occurrences").cast("long").alias("n_occurrences")
    )


def vocab_coverage(
    df: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a :func:`build_vocab` table to a corpus and measure
    out-of-vocabulary pressure per document — the go/no-go check
    before freezing a tokenizer or embedding table (a rising OOV rate
    on new data means the vocab no longer covers the distribution).

    One explode + one (word)-keyed equi-join against the
    dimension-scale vocab (broadcast by AQE) + one per-doc agg.
    Documents with no tokens keep a row with ``n_tokens = 0`` and a
    NULL ``oov_rate`` (0/0 is not 0% OOV).

    Output: ``(doc_id, n_tokens, n_oov, oov_rate)``, rate at 6dp.
    """
    from feat_spark.functions.text import words

    toks = df.select(
        F.col(id_col).alias("__id"), F.explode(words(text_col)).alias("word")
    ).filter(F.col("word") != "")
    hit = toks.join(
        vocab.select("word").withColumn("__in", F.lit(1)), "word", "left"
    )
    per = hit.groupBy("__id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.coalesce(F.sum(F.col("__in").isNull().cast("long")), F.lit(0))
        .cast("long")
        .alias("n_oov"),
    )
    return (
        df.select(F.col(id_col).alias("__id"))
        .distinct()
        .join(per, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce(F.col("n_oov"), F.lit(0)).cast("long").alias("n_oov"),
            F.when(
                F.col("n_tokens") > 0,
                F.round(F.col("n_oov") / F.col("n_tokens"), 6),
            ).alias("oov_rate"),
        )
    )


def weighted_median(
    df: DataFrame,
    key_cols: Sequence[str],
    value_col: str,
    weight_col: str,
    out_col: str = "weighted_median",
) -> DataFrame:
    """Exact lower weighted median per group: the smallest value ``v``
    with ``sum(w | x <= v) * 2 >= W`` — the robust center for weighted
    samples (duplicate-collapsed corpora where ``w`` = occurrence
    count, importance-weighted metrics).

    All arithmetic is integer (cast weights to long): the gate
    ``2 * cumw >= W`` never touches a float, so every engine agrees on
    the row. Shape: a (key, value) pre-aggregation collapses ties
    FIRST (the frame entering the window is distinct-values-sized, not
    row-sized — a million repeats of one price is one row), then one
    cumulative window over the value order and a min() final agg.
    Hot groups with few distinct values cost the combiner, not the
    window task.
    """
    keys = [F.col(k) for k in key_cols]
    per_val = df.groupBy(*keys, F.col(value_col).alias("__v")).agg(
        F.sum(F.col(weight_col).cast("long")).alias("__w")
    )
    w_cum = Window.partitionBy(*key_cols).orderBy("__v")
    tot = Window.partitionBy(*key_cols)
    cum = per_val.select(
        *keys,
        F.col("__v"),
        F.sum("__w").over(
            w_cum.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("__cum"),
        F.sum("__w").over(tot).alias("__tot"),
    )
    return (
        cum.filter(F.col("__cum") * 2 >= F.col("__tot"))
        .groupBy(*keys)
        .agg(F.min("__v").alias(out_col))
    )


def rare_category_collapse(
    df: DataFrame,
    cat_col: str,
    min_count: int = 100,
    other_token: str = "__other__",
    out_col: str | None = None,
) -> DataFrame:
    """Collapse long-tail categories below ``min_count`` occurrences
    into one ``other_token`` bucket — the standard cardinality guard
    before one-hot/target encoding (a raw URL or user-agent column has
    millions of singleton categories that would explode any encoder).

    Shape: one partial-agg count keyed by category (vocabulary-sized),
    broadcast back onto the corpus — the data pass is a broadcast-join
    + conditional projection, no corpus shuffle. NULL categories stay
    NULL (missingness is its own signal, per the reference's
    undefined-vs-value discipline)."""
    out = out_col or f"{cat_col}_collapsed"
    counts = df.groupBy(F.col(cat_col).alias("__cat")).agg(
        F.count(F.lit(1)).alias("__n")
    )
    keep = counts.filter(F.col("__n") >= min_count).select("__cat")
    return (
        df.join(
            F.broadcast(keep.withColumn("__keep", F.lit(True))),
            df[cat_col] == F.col("__cat"),
            "left",
        )
        .withColumn(
            out,
            F.when(F.col(cat_col).isNull(), F.lit(None).cast("string"))
            .when(F.col("__keep"), F.col(cat_col))
            .otherwise(F.lit(other_token)),
        )
        .drop("__cat", "__keep")
    )


def woe_encode(
    df: DataFrame,
    cat_col: str,
    label_col: str,
    smoothing: float = 0.5,
) -> DataFrame:
    """Weight-of-evidence table per category of a binary label — the
    credit-scoring / churn-model encoder: ``WOE = ln((pos_c/POS) /
    (neg_c/NEG))`` with additive smoothing so empty cells stay finite,
    plus each category's information-value term
    ``IV_c = (pos_c/POS - neg_c/NEG) * WOE_c`` (sum them for the
    feature's IV).

    Exact cross-engine: counts are integers, the two totals are driver
    scalars (one tiny collect, the tfidf-N device — no 1-row
    cross-join enters the plan), and the double expression is a fixed
    chain: ``ln(((pos+s)/(POS+2s)) / ((neg+s)/(NEG+2s)))``. Shape: one
    partial-agg keyed by category (vocabulary-sized output), nothing
    else touches the corpus. NULL categories form their own row
    (missingness is signal).

    Output: ``(category, n_pos, n_neg, woe, iv)``, 6dp.
    """
    y = F.col(label_col).cast("long")
    agg = df.groupBy(F.col(cat_col).alias("category")).agg(
        F.sum(F.when(y == 1, 1).otherwise(0)).alias("n_pos"),
        F.sum(F.when(y == 1, 0).otherwise(1)).alias("n_neg"),
    )
    tot = agg.agg(F.sum("n_pos").alias("p"), F.sum("n_neg").alias("n")).collect()[0]
    pos_t, neg_t = float(tot["p"] + 2 * smoothing), float(tot["n"] + 2 * smoothing)
    pr = (F.col("n_pos").cast("double") + F.lit(smoothing)) / F.lit(pos_t)
    nr = (F.col("n_neg").cast("double") + F.lit(smoothing)) / F.lit(neg_t)
    woe = F.log(pr / nr)
    return agg.select(
        "category",
        "n_pos",
        "n_neg",
        F.round(woe, 6).alias("woe"),
        F.round((pr - nr) * woe, 6).alias("iv"),
    )


def autocorrelation(
    df: DataFrame,
    group_col: str,
    order_cols: Sequence[str],
    value_col: str,
    lag: int = 1,
) -> DataFrame:
    """Per-group lag-k autocorrelation — the "is this series bursty or
    mean-reverting" feature over a per-entity time series (per-user
    event values, per-conversation turn lengths). Pearson correlation
    of the series against itself shifted by ``lag``, over the aligned
    pairs only (rows 1..n-k x rows k+1..n) — the textbook sample ACF
    estimator with pairwise means, so the statistic is exactly a
    correlation and replayable as one.

    Shape: ONE lag window over the group partitioning (the same
    exchange the aggregate reuses — one shuffle total), then six
    decimal sums per group and a closed-form combine in double, the
    :func:`group_linear_fit` device. No per-group iteration, no
    driver loops; a hot entity is a single ordered partition scan,
    bounded the same way every other per-entity window here is.

    ``value_col`` should be integer-valued (cents): the decimal sums
    are then exact, so partial-agg order cannot change the result and
    the DuckDB oracle replays it bit-for-bit.

    Degenerate guards: groups with < 2 aligned pairs, or a constant
    side (zero variance), return NULL acf.

    Output: ``(group, lag, n_pairs, acf)`` with acf rounded 6dp.
    """
    w = Window.partitionBy(group_col).orderBy(*order_cols)
    d = (
        df.withColumn("__y", F.col(value_col).cast("double"))
        .filter(F.col("__y").isNotNull())
        .withColumn("__x", F.lag("__y", lag).over(w))
        .filter(F.col("__x").isNotNull())
    )
    xd = F.col("__x").cast("decimal(18,6)")
    yd = F.col("__y").cast("decimal(18,6)")
    agg = d.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(xd).cast("double").alias("__sx"),
        F.sum(yd).cast("double").alias("__sy"),
        F.sum(xd * yd).cast("double").alias("__sxy"),
        F.sum(xd * xd).cast("double").alias("__sxx"),
        F.sum(yd * yd).cast("double").alias("__syy"),
    )
    n = F.col("n_pairs")
    covn = n * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    varxn = n * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    varyn = n * F.col("__syy") - F.col("__sy") * F.col("__sy")
    acf = F.when(
        (n >= 2) & (varxn > 0) & (varyn > 0),
        covn / (F.sqrt(varxn) * F.sqrt(varyn)),
    )
    return agg.select(
        group_col,
        F.lit(lag).cast("int").alias("lag"),
        "n_pairs",
        F.round(acf, 6).alias("acf"),
    )


def cross_correlation(
    df: DataFrame,
    group_col: str,
    order_col: str,
    x_col: str,
    y_col: str,
    shifts: Sequence[int] = (-2, -1, 0, 1, 2),
) -> DataFrame:
    """Per-group lead-lag cross-correlation between two aligned series
    — "does activity in x LEAD outcomes in y, and by how much": for
    each ``shift`` s, the Pearson correlation of pairs
    ``(x_t, y_{t+s})`` (positive s = x leads y by s steps; the argmax
    over shifts is the lead time). :func:`autocorrelation` is the
    x == y special case.

    The input must be a REGULAR series per group (consecutive rows =
    consecutive time steps — build a day/hour spine with zero-fill
    first if the raw events are sparse; gaps silently shrink to
    adjacent-row shifts otherwise, which is almost never what the
    analyst means).

    Shape: ALL shifts' lead/lag columns come out of ONE window pass
    (one shuffle + one sort), packed as an array of (shift, y) structs
    and exploded to the (group, shift, x, y) grain, then ONE
    partial-agg pass keyed (group, shift) — no self-join of the
    series, no per-group iteration. (r6: the previous shape unioned
    |shifts| separate projections of the same input, and because each
    union branch is an independent subtree, the whole upstream plan —
    for the bench query, a spine join — executed once PER SHIFT; the
    explode emits the identical row multiset from a single execution.)
    Exact decimal sums -> fixed-order double combine, the
    :func:`group_linear_fit` device; integer-valued inputs replay
    bit-for-bit in a SQL engine.

    Output: ``(group, shift, n_pairs, xcorr)``, 6dp; degenerate
    (constant-side or < 2 pairs) groups return NULL xcorr.
    """
    w = Window.partitionBy(group_col).orderBy(order_col)
    led = df.select(
        F.col(group_col),
        F.col(x_col).cast("double").alias("__x"),
        *[
            (
                F.lead(F.col(y_col).cast("double"), s).over(w)
                if s >= 0
                else F.lag(F.col(y_col).cast("double"), -s).over(w)
            ).alias(f"__y_{i}")
            for i, s in enumerate(shifts)
        ],
    )
    u = led.select(
        F.col(group_col),
        "__x",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(int(s)).cast("int").alias("shift"),
                        F.col(f"__y_{i}").alias("__y"),
                    )
                    for i, s in enumerate(shifts)
                ]
            )
        ).alias("__sy"),
    ).select(
        F.col(group_col),
        F.col("__sy.shift").alias("shift"),
        "__x",
        F.col("__sy.__y").alias("__y"),
    )
    d = u.filter(F.col("__x").isNotNull() & F.col("__y").isNotNull())
    xd = F.col("__x").cast("decimal(18,6)")
    yd = F.col("__y").cast("decimal(18,6)")
    agg = d.groupBy(group_col, "shift").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(xd).cast("double").alias("__sx"),
        F.sum(yd).cast("double").alias("__sy"),
        F.sum(xd * yd).cast("double").alias("__sxy"),
        F.sum(xd * xd).cast("double").alias("__sxx"),
        F.sum(yd * yd).cast("double").alias("__syy"),
    )
    n = F.col("n_pairs")
    covn = n * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    varxn = n * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    varyn = n * F.col("__syy") - F.col("__sy") * F.col("__sy")
    xc = F.when(
        (n >= 2) & (varxn > 0) & (varyn > 0),
        covn / (F.sqrt(varxn) * F.sqrt(varyn)),
    )
    return agg.select(
        group_col,
        "shift",
        "n_pairs",
        F.round(xc, 6).alias("xcorr"),
    )


def rfm_segments(
    df: DataFrame,
    key_col: str = "o_custkey",
    ts_col: str = "o_orderdate",
    value_col: str = "o_totalprice",
    as_of_day: int | None = None,
) -> DataFrame:
    """Recency-Frequency-Monetary segmentation — the classic
    behavioral feature triple plus quartile scores, per entity:
    ``recency_days`` since the entity's last event (against
    ``as_of_day``, an epoch-day; defaults to the table's own max day),
    ``frequency`` = event count, ``monetary_cents`` = exact integer
    value sum, and quartile codes ``r_q f_q m_q`` in 1..4 (by value
    ASCENDING — r_q=1 is the most recent cohort) rolled into
    ``rfm = r_q*100 + f_q*10 + m_q``.

    Scale shape: one partial-aggregatable pass to the entity grain,
    then quartile BOUNDARIES as driver scalars (the ``quantile_bin``
    device — exact percentiles of the entity frame, a 1-row agg read)
    and a shuffle-free comparison pass to score. No global ntile sort:
    an ntile over ORDER BY metric is a single-partition window — the
    one plan shape this engine bans — and boundary scoring also gives
    ties one deterministic bucket instead of splitting them by sort
    position. Cross-engine exactness: metrics are integers and the
    quartile probs are dyadic (0.25/0.5/0.75), so the interpolated
    cut points ``a + (b-a)*f`` are exact doubles in every engine;
    integer-vs-cutpoint compares replay bit-for-bit.

    Output: ``(key, recency_days, frequency, monetary_cents, r_q,
    f_q, m_q, rfm)``.
    """
    day = F.expr(f"unix_micros(cast({ts_col} as timestamp)) div 86400000000")
    cents = (F.col(value_col).cast("decimal(18,2)") * 100).cast("long")
    ent = df.select(
        F.col(key_col).alias("key"), day.alias("__day"), cents.alias("__cents")
    ).groupBy("key").agg(
        F.max("__day").alias("__last"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum("__cents").alias("monetary_cents"),
    )
    if as_of_day is None:
        as_of_day = int(ent.agg(F.max("__last")).first()[0])
    ent = ent.withColumn(
        "recency_days", F.lit(int(as_of_day)) - F.col("__last")
    )
    probs = F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))
    qs = ent.agg(
        F.percentile(F.col("recency_days"), probs).alias("qr"),
        F.percentile(F.col("frequency"), probs).alias("qf"),
        F.percentile(F.col("monetary_cents"), probs).alias("qm"),
    ).first()

    def score(col: str, cuts):
        c = F.lit(1)
        for q in cuts:
            c = c + (F.col(col) > F.lit(float(q))).cast("int")
        return c

    return ent.select(
        F.col("key").alias(key_col),
        "recency_days",
        "frequency",
        "monetary_cents",
        score("recency_days", qs["qr"]).alias("r_q"),
        score("frequency", qs["qf"]).alias("f_q"),
        score("monetary_cents", qs["qm"]).alias("m_q"),
        (
            score("recency_days", qs["qr"]) * 100
            + score("frequency", qs["qf"]) * 10
            + score("monetary_cents", qs["qm"])
        ).alias("rfm"),
    )


def business_days_between(
    df: DataFrame,
    start_day_col: str,
    end_day_col: str,
    out_col: str = "n_business_days",
) -> DataFrame:
    """Weekday count in the half-open epoch-day interval
    ``[start, end)`` — SLA clocks, settlement lags, delivery windows:
    the calendar feature wall-clock day differences get wrong 2/7ths
    of the time. Closed form, zero joins, no generated calendar
    table: with ``m = day + 3`` (so ``m % 7 == 0`` is a Monday — the
    engine-wide dow device), the weekdays-before-``m`` counter is
    ``W(m) = 5 * (m div 7) + least(m % 7, 5)`` and the answer is
    ``W(end+3) - W(start+3)``. All-integer, branch-free, exact in any
    engine; rows with ``end < start`` return NULL (an inverted
    interval is a data bug, not -n business days).

    Columns are epoch days (``unix_micros(ts) div 86400000000`` —
    produce them with ``calendar_features`` or inline).
    """
    def W(col: str):
        m = F.col(col) + F.lit(3)
        return F.lit(5) * (m - (m % 7)) / 7 + F.least(m % 7, F.lit(5))

    n = (W(end_day_col) - W(start_day_col)).cast("long")
    return df.withColumn(
        out_col,
        F.when(F.col(end_day_col) >= F.col(start_day_col), n),
    )


def rank_normalize(
    df: DataFrame,
    group_cols: Sequence[str] | str,
    value_col: str,
    out_col: str = "pct",
) -> DataFrame:
    """Rank-based feature scaling — each value mapped to its group's
    empirical CDF, ``cume_dist`` = (# rows with value <= x) / n: the
    distribution-free normalization ("rank-gauss" minus the gauss)
    that makes fat-tailed features comparable across groups and is
    immune to outliers by construction (the largest value is 1.0 no
    matter how large).

    Exactness: cume_dist is a RATIO OF COUNTS — one integer division
    per row, identical in every engine, no percentile interpolation
    involved; ties share one value (both engines define cume_dist on
    the value, not the row). One window per group partition — groups
    are independent, no global sort. NULL values get NULL (they sort
    first in a window; a NULL's CDF is meaningless) — filtered out of
    the ranking entirely and re-attached by the caller if needed:
    this operator requires ``value_col`` non-null input rows and
    passes NULL-valued rows through untouched with NULL ``out_col``.
    """
    keys = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    w = Window.partitionBy(*keys).orderBy(F.col(value_col).asc())
    ranked = df.filter(F.col(value_col).isNotNull()).withColumn(
        out_col, F.round(F.cume_dist().over(w), 6)
    )
    nulls = df.filter(F.col(value_col).isNull()).withColumn(
        out_col, F.lit(None).cast("double")
    )
    return ranked.unionByName(nulls)


def time_weighted_avg(
    df: DataFrame,
    key_cols: Sequence[str] | str,
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak: Sequence[str] = ("event_id",),
) -> DataFrame:
    """Time-weighted average under step-function (last-observation-
    carried-forward) semantics — each observed value holds until the
    next observation, and the average weights every value by how long
    it HELD, not how often it was sampled: the correct mean for
    balances, prices, queue depths, feature gauges — anything sampled
    irregularly (a plain mean of [100 ms at $5, 3 days at $1] is
    wildly wrong).

    Exactness: the weight of each value is an integer microsecond span
    from ONE lead over the per-entity (ts, tiebreak) order; value goes
    to integer cents; ``sum(cents * span_us)`` is an exact integer sum
    (bounded by span*cents — guard magnitudes upstream at planetary
    scale), closed by one division by the total span. The LAST
    observation has no forward span and carries zero weight
    (the half-open [t_i, t_{i+1}) convention; pass a synthetic
    end-of-window row to weight it).

    Output: key cols + ``(n_obs, span_us, twa)``, 6dp in value units.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    cents = (F.col(value_col).cast("decimal(18,2)") * 100).cast("long")
    w = Window.partitionBy(*keys).orderBy(
        "__t", *[F.col(c) for c in tiebreak]
    )
    base = df.select(
        *keys,
        us.alias("__t"),
        *[F.col(c) for c in tiebreak],
        cents.alias("__c"),
    ).withColumn("__span", F.lead("__t").over(w) - F.col("__t"))
    agg = base.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.coalesce(F.sum("__span"), F.lit(0)).alias("span_us"),
        F.coalesce(
            F.sum(F.col("__c") * F.col("__span")), F.lit(0)
        ).alias("__wsum"),
    )
    return agg.select(
        *keys,
        "n_obs",
        "span_us",
        F.when(
            F.col("span_us") > 0,
            F.round(F.col("__wsum") / (F.col("span_us") * 100), 6),
        ).alias("twa"),
    )


def hash_features(
    df: DataFrame,
    id_col: str,
    cat_cols: "list[str]",
    n_features: int = 64,
) -> DataFrame:
    """The hashing trick (feature hashing): map arbitrary categorical
    values into a FIXED feature space with a signed hash — the
    vocabulary-free featurizer that needs no fitted dictionary, no
    broadcast vocab, and no schema change when new categories appear
    (the property that matters on a 100 TB stream of drifting
    categories; collisions are the accepted, bounded noise).

    Per (row, column): feature token ``col=value`` (column-name
    prefixed so identical values in different columns cannot
    collide by construction), bucket = portable md5 32-bit hash mod
    ``n_features``, sign = parity of the hash's next hex nibble
    (+1/-1 — the signed variant that makes collisions cancel in
    expectation, per Weinberger et al.'s public formulation). Output
    is the SPARSE form ``(id, bucket, weight)`` with weight the
    signed collision sum — one explode bounded by len(cat_cols), one
    partial agg keyed (id, bucket). NULL category values contribute
    nothing (no "None" pseudo-category).

    md5, not xxhash64, for the repo's portability rule: an external
    engine must produce the same buckets (DuckDB twin:
    ``('0x' || substr(md5(t),1,8))::BIGINT``).
    """
    from feat_spark.functions.text import md5_long32

    tokens = F.array(
        *[
            F.when(
                F.col(c).isNotNull(),
                F.concat(F.lit(c + "="), F.col(c).cast("string")),
            )
            for c in cat_cols
        ]
    )
    t = df.select(F.col(id_col).alias("id"), F.explode(tokens).alias("tok")) \
        .filter(F.col("tok").isNotNull())
    h = md5_long32(F.col("tok"))
    nib = F.conv(F.substring(F.md5(F.col("tok")), 9, 1), 16, 10).cast("long")
    return (
        t.select(
            "id",
            F.pmod(h, F.lit(n_features)).cast("int").alias("bucket"),
            F.when(nib % 2 == 0, F.lit(1)).otherwise(F.lit(-1)).alias("sgn"),
        )
        .groupBy("id", "bucket")
        .agg(F.sum("sgn").cast("long").alias("weight"))
    )


def theilsen_fit(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_col: str,
) -> DataFrame:
    """Per-group Theil–Sen robust slope — the median of all pairwise
    slopes ``(y_j - y_i) / (x_j - x_i)`` over ``x_j > x_i`` — the
    outlier-proof sibling of :func:`group_linear_fit` (one wild day
    moves OLS arbitrarily; it moves a median of O(n^2) slopes not at
    all, 29.3% breakdown point).

    Distributed shape: the pair generator is a self-EQUI-join on the
    group key (never a cartesian), so per-group fan-out is
    ``n_i*(n_i-1)/2`` where ``n_i`` is the group's distinct-x count —
    callers reduce grain first (per-day sums, as the gate does), which
    bounds ``n_i`` by the calendar, not the event volume; the plan is
    the same at 150 users and 150 million. Duplicate-x pairs are
    excluded (vertical slope), matching the estimator's definition.

    Cross-engine determinism: y deltas and x deltas are exact
    integers when the caller feeds integer cents / integer days (the
    gate does), each slope is then ONE IEEE division — identical in
    any engine — and the median of an identical multiset of doubles
    (even count -> midpoint average, both Spark and DuckDB
    interpolate) is identical. Slope rounded 9dp at the edge only.

    Output: ``(group, n_pairs, slope)``; groups with a single distinct
    x (no valid pair) are honestly absent.
    """
    g = df.select(
        F.col(group_col).alias("__g"),
        F.col(x_col).cast("long").alias("__x"),
        F.col(y_col).cast("long").alias("__y"),
    )
    a = g.alias("a")
    b = g.alias("b")
    pairs = a.join(b, "__g").filter(F.col("b.__x") > F.col("a.__x"))
    slope = (
        (F.col("b.__y") - F.col("a.__y")).cast("double")
        / (F.col("b.__x") - F.col("a.__x")).cast("double")
    )
    return (
        pairs.select("__g", slope.alias("__s"))
        .groupBy(F.col("__g").alias(group_col))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.round(F.median("__s"), 9).alias("slope"),
        )
    )


def ols2_fit(
    df: DataFrame,
    group_cols: Sequence[str] | str,
    x1_col: str,
    x2_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group TWO-regressor OLS ``y ~ b0 + b1*x1 + b2*x2`` in
    closed form — the multivariate sibling of :func:`group_trend`'s
    simple OLS (one more covariate is usually all a per-entity trend
    model needs: spend ~ day + activity separates drift from volume).

    Closed form via centered normal equations solved by Cramer's
    rule: with S11 = n*sum(x1^2) - sum(x1)^2 (and S22, S12, S1y, S2y
    alike), ``b1 = (S22*S1y - S12*S2y) / det``,
    ``b2 = (S11*S2y - S12*S1y) / det``, ``det = S11*S22 - S12^2``.
    All S-terms are exact integers when inputs are integral (cents /
    day indexes / counts — the caller quantizes), accumulated as
    decimal(38,0) so products can't overflow; each beta is ONE IEEE
    division of exact integers, 9dp; the intercept closes from the
    betas in a fixed op order and rounds at 4dp — b0 carries y's
    units (cents), so its magnitude can reach ~1e7 where a 9dp
    rounding quantum sits at one double ulp and cross-engine rounding
    goes bit-unstable; 4dp keeps quantum >> ulp up to ~1e12 while the
    dimensionless slopes stay at 9dp. Collinear groups (det = 0) and
    groups with n < 3 return NULLs — the honest answer.

    One partial-aggregated groupBy carrying nine sums; no window, no
    join, no iteration — the 100 TB plan is a single exchange.

    Output: groups + ``(n, b1, b2, b0)``.
    """
    keys = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    d = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    agg = df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d(x1_col)).alias("__s1"),
        F.sum(d(x2_col)).alias("__s2"),
        F.sum(d(y_col)).alias("__sy"),
        F.sum(d(x1_col) * d(x1_col)).alias("__s11"),
        F.sum(d(x2_col) * d(x2_col)).alias("__s22"),
        F.sum(d(x1_col) * d(x2_col)).alias("__s12"),
        F.sum(d(x1_col) * d(y_col)).alias("__s1y"),
        F.sum(d(x2_col) * d(y_col)).alias("__s2y"),
    )
    n = F.col("n").cast("decimal(38,0)")
    S11 = n * F.col("__s11") - F.col("__s1") * F.col("__s1")
    S22 = n * F.col("__s22") - F.col("__s2") * F.col("__s2")
    S12 = n * F.col("__s12") - F.col("__s1") * F.col("__s2")
    S1y = n * F.col("__s1y") - F.col("__s1") * F.col("__sy")
    S2y = n * F.col("__s2y") - F.col("__s2") * F.col("__sy")
    det = (S11 * S22 - S12 * S12).cast("double")
    b1 = (S22 * S1y - S12 * S2y).cast("double") / det
    b2 = (S11 * S2y - S12 * S1y).cast("double") / det
    b0 = (
        F.col("__sy").cast("double")
        - b1 * F.col("__s1").cast("double")
        - b2 * F.col("__s2").cast("double")
    ) / F.col("n").cast("double")
    ok = (F.col("n") >= 3) & (det != 0.0)
    return agg.select(
        *keys,
        "n",
        F.when(ok, F.round(b1, 9)).alias("b1"),
        F.when(ok, F.round(b2, 9)).alias("b2"),
        F.when(ok, F.round(b0, 4)).alias("b0"),
    )


def oof_target_encode(
    df: DataFrame,
    key_col: str,
    target_col: str,
    id_col: str,
    n_folds: int = 5,
) -> DataFrame:
    """Out-of-fold target encoding — the leakage-CORRECT version of
    :func:`target_encode`: each row's category mean is computed from
    the OTHER folds only, so no row's own label (or its fold-mates')
    ever reaches its feature value. The classic smoothed global
    encoder leaks a little of every label into every row; at high
    cardinality that's enough for a model to memorize targets — this
    is the encoder the ``leakage_screen`` audit would pass.

    Two-pass-free algebra: fold = portable-md5(id) mod k, ONE agg to
    (key, fold) partial sums, then the complement mean closes as
    ``(key_total_sum - fold_sum) / (key_total_n - fold_n)`` with the
    key totals from a window over the <= k rows per key — never a
    second data scan, never a per-fold pass. Integral targets (the
    caller quantizes to cents) make both sums exact; ONE division,
    9dp. A key entirely inside one fold has an empty complement ->
    NULL (the honest cold-start; callers back off to the global
    prior).

    Output: ``(key, fold, n_in_fold, n_out_of_fold, oof_mean)`` —
    join it back on (key, fold) to encode rows.
    """
    from feat_spark.functions.text import md5_long32

    fold = F.pmod(md5_long32(F.col(id_col).cast("string")), F.lit(n_folds))
    t = F.col(target_col).cast("decimal(38,0)")
    agg = (
        df.select(F.col(key_col).alias("key"), fold.alias("fold"), t.alias("__t"))
        .groupBy("key", "fold")
        .agg(
            F.count(F.lit(1)).alias("n_in_fold"),
            F.sum("__t").alias("__s"),
        )
    )
    w = Window.partitionBy("key")
    out = agg.withColumn("__tot_n", F.sum("n_in_fold").over(w)).withColumn(
        "__tot_s", F.sum("__s").over(w)
    )
    n_out = F.col("__tot_n") - F.col("n_in_fold")
    return out.select(
        "key",
        "fold",
        "n_in_fold",
        n_out.alias("n_out_of_fold"),
        F.when(
            n_out > 0,
            F.round(
                (F.col("__tot_s") - F.col("__s")).cast("double")
                / n_out.cast("double"),
                9,
            ),
        ).alias("oof_mean"),
    )


def eb_shrink_rates(
    df: DataFrame,
    key_col: str,
    success_col: str,
    min_n: int = 1,
) -> DataFrame:
    """Empirical-Bayes shrinkage of per-key binary rates — the
    beta-binomial smoother that pulls small-sample keys toward the
    corpus prior by an amount the DATA chooses (method of moments on
    the observed rate distribution), not a hand-tuned constant: the
    difference from :func:`target_encode`'s fixed-strength smoothing
    is that a corpus of stable keys yields a weak prior (trust the
    keys) while a noisy corpus yields a strong one. The standard CTR
    / conversion-rate feature at 100 TB — one agg pass, a 1-row prior
    broadcast back over the key frame.

    Determinism device: per-key empirical rates are IEEE doubles;
    their mean/variance would be order-dependent float sums, so both
    moments are accumulated as 1e-12-quantized decimal(38,0) integers
    (``round(r * 1e12)``; products < 2^53 stay exact in the double
    before rounding, and the quantization is itself the deterministic
    contract both engines replay). Prior strength
    ``a+b = m(1-m)/v - 1`` and the shrunk rate ``(x + a)/(n + a + b)``
    are fixed-order closed forms, 9dp. Degenerate corpora (zero
    variance, < 2 keys) return the raw rate and NULL prior strength —
    shrinking toward a point is a no-op, not an error.

    Output: ``(key, n, successes, raw_rate, prior_mean,
    prior_strength, shrunk_rate)``.
    """
    y = F.col(success_col).cast("long")
    per = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("n"), F.sum(y).alias("successes")
    )
    r = F.col("successes").cast("double") / F.col("n").cast("double")
    per = per.withColumn("raw_rate", r).filter(F.col("n") >= min_n)
    q = F.round(F.col("raw_rate") * F.lit(1e12)).cast("decimal(38,0)")
    q2 = F.round(
        F.col("raw_rate") * F.col("raw_rate") * F.lit(1e12)
    ).cast("decimal(38,0)")
    prior = per.agg(
        F.count(F.lit(1)).alias("__k"),
        F.sum(q).alias("__sq"),
        F.sum(q2).alias("__sq2"),
    )
    k = F.col("__k").cast("double")
    m = F.col("__sq").cast("double") / (k * F.lit(1e12))
    ex2 = F.col("__sq2").cast("double") / (k * F.lit(1e12))
    v = (ex2 - m * m) * (k / F.greatest(k - F.lit(1.0), F.lit(1.0)))
    strength = m * (F.lit(1.0) - m) / v - F.lit(1.0)
    prior = prior.select(
        F.round(m, 9).alias("prior_mean"),
        F.when(
            (F.col("__k") >= 2) & (v > 0) & (strength > 0),
            F.round(strength, 9),
        ).alias("prior_strength"),
    )
    # 1-row broadcast prior — the cuped_adjust crossJoin class
    # (plancheck-exempted): a nested-loop against ONE row is a map
    j = per.crossJoin(F.broadcast(prior))
    a = F.col("prior_mean") * F.col("prior_strength")
    shrunk = F.when(
        F.col("prior_strength").isNotNull(),
        (F.col("successes").cast("double") + a)
        / (F.col("n").cast("double") + F.col("prior_strength")),
    ).otherwise(F.col("raw_rate"))
    return j.select(
        "key",
        "n",
        "successes",
        F.round(F.col("raw_rate"), 9).alias("raw_rate"),
        "prior_mean",
        "prior_strength",
        F.round(shrunk, 9).alias("shrunk_rate"),
    )


def holiday_distance(
    df: DataFrame,
    ts_col: str,
    holidays: "Sequence[str]",
) -> "Column":
    """Signed days to the NEAREST holiday from a literal calendar —
    the seasonality feature ``calendar_features``' cyclic encodings
    can't express (demand bends around a holiday, not around "day 359
    of the year"): negative = the holiday is ahead (anticipation
    runup), positive = behind (hangover decay), 0 = the day itself.

    Pure codegen column expression: the holiday list folds in as an
    array literal of epoch days and the answer is ``array_min`` over
    ``(|d|, d)`` structs — the argmin-by-struct trick, no join, no
    UDF, no shuffle; even a few hundred literal dates is a trivial
    expression. A tie (a day exactly between two holidays) orders
    ``(k, -k) < (k, +k)``, so it resolves to the AHEAD (negative)
    side, deterministically in any engine that compares structs
    lexicographically (Spark and DuckDB both do).
    """
    import datetime as _dt

    day = F.expr(
        f"unix_micros(cast({ts_col} as timestamp)) div 86400000000"
    )
    epoch_days = [
        (_dt.date.fromisoformat(h) - _dt.date(1970, 1, 1)).days
        for h in holidays
    ]
    diffs = F.transform(
        F.array(*[F.lit(int(d)) for d in epoch_days]),
        lambda h: F.struct(
            F.abs(day - h).alias("a"), (day - h).alias("d")
        ),
    )
    return F.array_min(diffs)["d"]
