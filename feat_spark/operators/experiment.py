"""Experiment-analysis operators: CUPED variance reduction.

CUPED (Controlled-experiment Using Pre-Experiment Data, Deng et al.,
WSDM 2013) is the standard A/B-test variance-reduction device: regress
the experiment-period metric ``y`` on a pre-period covariate ``x``
(pooled across variants, where randomization guarantees ``x`` is
independent of assignment), then report per-variant means of
``y - theta * (x - mean(x))``. Same point estimate in expectation,
variance shrunk by the squared correlation.

Spark-first shape: the whole computation is FIVE exact decimal sums —
globally for ``theta`` and per-variant for the adjusted means — so the
answer is independent of partial-aggregation order (the same
``group_linear_fit`` device) and a SQL engine replays it bit-for-bit.
The adjusted mean never materializes per-row: algebraically
``mean(y_adj) = Sy/n - theta * (Sx/n - Sx_glob/n_glob)``, so the
per-variant pass reuses the same sums. One global 1-row aggregate
broadcast-crossed onto a variant-count-sized frame — nothing here
scales with row count except the two partial-agg passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cuped_adjust(
    df: DataFrame,
    variant_col: str,
    y_col: str,
    x_col: str,
    dp: int = 6,
) -> DataFrame:
    """CUPED-adjusted per-variant means.

    ``df`` must hold one row per experimental unit with the unit's
    experiment-period metric ``y_col`` and pre-period covariate
    ``x_col`` (rows with a NULL in either are dropped — a unit with no
    pre-period data cannot be adjusted; run them through the plain
    mean separately).

    Output: one row per variant with ``n_units``, ``mean_y`` (raw),
    ``mean_y_cuped`` (adjusted), plus the pooled ``theta`` and
    ``rho2`` (squared x-y correlation = the fraction of variance
    removed) repeated on every row for audit. Degenerate pre-period
    (zero variance) falls back to theta = 0, i.e. the raw means.
    """
    xd = F.col(x_col).cast("double").cast("decimal(18,6)")
    yd = F.col(y_col).cast("double").cast("decimal(18,6)")
    d = df.filter(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).select(F.col(variant_col).alias("variant"), xd.alias("__x"), yd.alias("__y"))

    glob = d.agg(
        F.count(F.lit(1)).alias("gn"),
        F.sum("__x").cast("double").alias("gsx"),
        F.sum("__y").cast("double").alias("gsy"),
        F.sum(F.col("__x") * F.col("__y")).cast("double").alias("gsxy"),
        F.sum(F.col("__x") * F.col("__x")).cast("double").alias("gsxx"),
        F.sum(F.col("__y") * F.col("__y")).cast("double").alias("gsyy"),
    )
    per = d.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n_units"),
        F.sum("__x").cast("double").alias("vsx"),
        F.sum("__y").cast("double").alias("vsy"),
    )
    j = per.crossJoin(F.broadcast(glob))

    n = F.col("gn")
    covn = n * F.col("gsxy") - F.col("gsx") * F.col("gsy")
    varxn = n * F.col("gsxx") - F.col("gsx") * F.col("gsx")
    varyn = n * F.col("gsyy") - F.col("gsy") * F.col("gsy")
    theta = F.when(varxn > 0, covn / varxn).otherwise(F.lit(0.0))
    rho2 = F.when(
        (varxn > 0) & (varyn > 0), covn * covn / (varxn * varyn)
    ).otherwise(F.lit(0.0))
    mean_y = F.col("vsy") / F.col("n_units")
    mean_adj = mean_y - theta * (
        F.col("vsx") / F.col("n_units") - F.col("gsx") / n
    )
    return j.select(
        "variant",
        F.col("n_units").cast("long").alias("n_units"),
        F.round(mean_y, dp).alias("mean_y"),
        F.round(mean_adj, dp).alias("mean_y_cuped"),
        F.round(theta, dp).alias("theta"),
        F.round(rho2, dp).alias("rho2"),
    )


def variant_summary(
    df: DataFrame,
    variant_col: str,
    y_col: str,
    z: float = 1.96,
    dp: int = 6,
) -> DataFrame:
    """Per-variant metric readout with a normal-approximation
    confidence interval — the table every experiment dashboard shows:
    ``n``, mean, sample standard deviation, standard error, and
    ``mean ± z*se``.

    Same exact-sums discipline as :func:`cuped_adjust`: three decimal
    aggregates per variant (n, Σy, Σy²), closed-form combine in
    double (``var = (Σy² − (Σy)²/n) / (n−1)``), so partial-agg order
    can't change a bit and a SQL engine replays the arithmetic.
    Degenerate groups are honest: ``n = 1`` → NULL sd/se/CI.

    Output: ``(variant, n_units, mean_y, sd_y, se_y, ci_lo, ci_hi)``.
    """
    yd = F.col(y_col).cast("double").cast("decimal(18,6)")
    d = df.filter(F.col(y_col).isNotNull()).select(
        F.col(variant_col).alias("variant"), yd.alias("__y")
    )
    agg = d.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n_units"),
        F.sum("__y").cast("double").alias("sy"),
        F.sum(F.col("__y") * F.col("__y")).cast("double").alias("syy"),
    )
    n = F.col("n_units")
    mean = F.col("sy") / n
    var = F.when(
        n > 1, (F.col("syy") - F.col("sy") * F.col("sy") / n) / (n - 1)
    )
    sd = F.sqrt(var)
    se = F.sqrt(var / n)
    return agg.select(
        "variant",
        n.cast("long").alias("n_units"),
        F.round(mean, dp).alias("mean_y"),
        F.round(sd, dp).alias("sd_y"),
        F.round(se, dp).alias("se_y"),
        F.round(mean - z * se, dp).alias("ci_lo"),
        F.round(mean + z * se, dp).alias("ci_hi"),
    )


def srm_check(
    df: DataFrame,
    variant_col: str,
    expected: dict,
    critical: float = 3.841,
    dp: int = 6,
) -> DataFrame:
    """Sample-ratio-mismatch check — the first gate on any experiment:
    does the observed variant split match the intended allocation?
    A failed SRM invalidates every downstream metric (some segment is
    being dropped or double-bucketed), so this runs before
    :func:`variant_summary` is even looked at.

    Pearson chi-square against the expected weights, computed WITHOUT
    a totals cross-join via the algebraic identity
    ``chi2 = (W/T)·Σ(oᵢ²/wᵢ) − T`` (T = total rows, W = Σ weights
    over ALL expected variants — variants with zero observed rows
    contribute exactly their expectation through the −T term). One
    count-by-variant agg + one scalar agg; rows observed under a
    variant missing from ``expected`` NULL the statistic and the flag
    (a typo'd allocation must not silently skew T — counts stay
    visible, the verdict refuses to render).

    Output: one row ``(n_total, n_variants, chi2, srm)`` with ``srm``
    true when ``chi2 > critical`` (default 3.841 = χ²₀.₀₅ at 1 dof —
    pass the right critical value for >2 variants).
    """
    w_total = float(sum(expected.values()))
    wmap = None
    for k, v in expected.items():
        cond = F.col("variant") == F.lit(k)
        wmap = F.when(cond, F.lit(float(v))) if wmap is None else wmap.when(
            cond, F.lit(float(v))
        )
    counts = (
        df.select(F.col(variant_col).alias("variant"))
        .groupBy("variant")
        .agg(F.count(F.lit(1)).alias("o"))
        .withColumn("w", wmap)
    )
    agg = counts.agg(
        F.sum("o").alias("t"),
        F.count(F.lit(1)).alias("k_obs"),
        F.sum(F.col("o") * F.col("o") / F.col("w")).alias("oow"),
        F.sum(F.col("w").isNull().cast("long")).alias("unknown"),
    )
    chi2 = F.round(
        F.lit(w_total) / F.col("t") * F.col("oow") - F.col("t"), dp
    )
    out = agg.select(
        F.col("t").cast("long").alias("n_total"),
        F.col("k_obs").cast("long").alias("n_variants"),
        chi2.alias("chi2"),
        (
            F.lit(w_total) / F.col("t") * F.col("oow") - F.col("t")
            > F.lit(float(critical))
        ).alias("srm"),
        F.col("unknown"),
    )
    # fail loudly on unknown variants rather than mis-normalizing
    return out.select(
        "n_total",
        "n_variants",
        F.when(F.col("unknown") == 0, F.col("chi2")).alias("chi2"),
        F.when(F.col("unknown") == 0, F.col("srm")).alias("srm"),
    )


def welch_ttest(
    df: DataFrame,
    variant_col: str,
    y_col: str,
    control,
    treatment,
    dp: int = 6,
) -> DataFrame:
    """Welch's unequal-variance two-sample t-test between two named
    variants — the decision statistic an experiment readout ends with
    (``variant_summary`` shows the per-arm CIs; this one row answers
    "is the difference real?").

    Same exact-sums discipline as :func:`variant_summary`: per arm
    (n, Σy, Σy²) in decimal — partial-agg order cannot change a bit —
    then the closed forms in double::

        vᵢ   = (Σy²ᵢ − (Σyᵢ)²/nᵢ) / (nᵢ−1)      (sample variance)
        se²  = v_c/n_c + v_t/n_t
        t    = (m_t − m_c) / sqrt(se²)
        dof  = se²² / ((v_c/n_c)²/(n_c−1) + (v_t/n_t)²/(n_t−1))

    (Welch–Satterthwaite). Because every input to the double math is
    an exact decimal sum, a SQL engine replaying the same expression
    tree reproduces the statistic bit-for-bit.

    Scale shape: one map-side-combinable two-group aggregate over the
    unit frame, then a 2-row conditional pivot — nothing downstream of
    the partial agg scales with row count. Degenerate arms are honest:
    n ≤ 1 in either arm, or zero variance in both, → NULL t/dof.

    Output (single row): ``(n_c, n_t, mean_c, mean_t, diff, t_stat,
    dof)``.
    """
    yd = F.col(y_col).cast("double").cast("decimal(18,6)")
    d = df.filter(
        F.col(y_col).isNotNull()
        & F.col(variant_col).isin([control, treatment])
    ).select(
        (F.col(variant_col) == F.lit(treatment)).alias("__t"),
        yd.alias("__y"),
    )
    per = d.groupBy("__t").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__y").cast("double").alias("sy"),
        F.sum(F.col("__y") * F.col("__y")).cast("double").alias("syy"),
    )

    def arm(flag: bool, c: str):
        return F.max(F.when(F.col("__t") == flag, F.col(c)))

    w = per.agg(
        arm(False, "n").alias("nc"), arm(False, "sy").alias("syc"),
        arm(False, "syy").alias("syyc"),
        arm(True, "n").alias("nt"), arm(True, "sy").alias("syt"),
        arm(True, "syy").alias("syyt"),
    )
    nc, nt = F.col("nc"), F.col("nt")
    mc = F.col("syc") / nc
    mt = F.col("syt") / nt
    vc = F.when(nc > 1, (F.col("syyc") - F.col("syc") * F.col("syc") / nc) / (nc - 1))
    vt = F.when(nt > 1, (F.col("syyt") - F.col("syt") * F.col("syt") / nt) / (nt - 1))
    se2 = vc / nc + vt / nt
    t = F.when(se2 > 0, (mt - mc) / F.sqrt(se2))
    dof = F.when(
        se2 > 0,
        se2 * se2
        / ((vc / nc) * (vc / nc) / (nc - 1) + (vt / nt) * (vt / nt) / (nt - 1)),
    )
    return w.select(
        nc.cast("long").alias("n_c"),
        nt.cast("long").alias("n_t"),
        F.round(mc, dp).alias("mean_c"),
        F.round(mt, dp).alias("mean_t"),
        F.round(mt - mc, dp).alias("diff"),
        F.round(t, dp).alias("t_stat"),
        F.round(dof, dp).alias("dof"),
    )


def ks_test(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic between two groups'
    value distributions — the standard "did the metric's whole SHAPE
    shift" test (mean-based tests miss variance/tail changes; PSI
    needs binning choices — KS is binning-free).

    Exactness device: with integer values (cents) and counts, at every
    distinct value ``D_num = |cumA * nB - cumB * nA|`` is an INTEGER,
    and ``D = max(D_num) / (nA * nB)`` divides once at the end — no
    per-row float CDF subtraction, so any engine replays the bits.
    Shape: one (group, value) partial agg, a pivot to per-value
    (dA, dB) increments, one cumulative window over the distinct-value
    spine (ties collapsed first — the spine is distinct-values-sized),
    one max agg. Output one row: ``n_a, n_b, d_stat`` (6dp) and
    ``ks_lambda = D * sqrt(nA*nB/(nA+nB))`` (the asymptotic test
    statistic; compare to 1.36 for alpha=0.05).
    """
    g = F.col(group_col)
    d = df.filter(g.isin([group_a, group_b]) & F.col(value_col).isNotNull())
    per_val = d.groupBy(F.col(value_col).alias("__v")).agg(
        F.sum(F.when(g == group_a, 1).otherwise(0)).alias("__da"),
        F.sum(F.when(g == group_b, 1).otherwise(0)).alias("__db"),
    )
    # the cumulative spine is DISTINCT-values-sized (ties collapsed by
    # the partial agg above) — the single-task global-order window is
    # bounded by value cardinality, not row count; a multi-million-
    # cent spine would route through the chunked prefix-sum device
    # (operators/chunked.py) instead
    w = Window.orderBy("__v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wall = Window.orderBy("__v").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = per_val.select(
        F.sum("__da").over(w).alias("__ca"),
        F.sum("__db").over(w).alias("__cb"),
        F.sum("__da").over(wall).alias("__na"),
        F.sum("__db").over(wall).alias("__nb"),
    )
    out = cum.agg(
        F.max("__na").alias("n_a"),
        F.max("__nb").alias("n_b"),
        F.max(
            F.abs(F.col("__ca") * F.col("__nb") - F.col("__cb") * F.col("__na"))
        ).alias("__dnum"),
    )
    nab = F.col("n_a") * F.col("n_b")
    dstat = F.col("__dnum").cast("double") / nab.cast("double")
    lam = dstat * F.sqrt(
        nab.cast("double") / (F.col("n_a") + F.col("n_b")).cast("double")
    )
    return out.select(
        "n_a",
        "n_b",
        F.round(dstat, 6).alias("d_stat"),
        F.round(lam, 6).alias("ks_lambda"),
    )


def calibration_curve(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability diagram for a probabilistic classifier: bin the
    predicted score in [0, 1] into ``n_bins`` equal-width bins and
    report, per bin, the count, the mean predicted score, and the
    observed positive rate — the model-calibration readout (a
    calibrated model has mean_score ~= frac_pos in every bin) that
    gates whether a quality-filter threshold transfers across corpora.

    One partial-agg pass keyed by bin id — n_bins grouping keys with
    map-side combine, so the reduce sees one pre-aggregated row per
    map partition regardless of row count or score skew.

    Determinism: the score is quantized to integer MICRO-units
    (``floor(score * 1e6)``) BEFORE summing, so the per-bin sums are
    exact integer sums (< 2^53 per 10^9 rows — and decimal-summed
    anyway) and partial-agg order cannot move the mean; the oracle
    replays floor/sum/divide in the same order. Scores outside [0, 1]
    are clamped into the edge bins, NULL scores/labels dropped.

    Output: ``(bin, n, mean_score, frac_pos)`` — bin is the 0-based
    bin id; mean_score/frac_pos rounded 6dp.
    """
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("long")
    d = df.filter(s.isNotNull() & y.isNotNull()).select(
        F.least(
            F.greatest(
                F.floor(s * F.lit(float(n_bins))), F.lit(0).cast("long")
            ),
            F.lit(n_bins - 1).cast("long"),
        ).alias("bin"),
        F.floor(s * F.lit(1000000.0)).cast("decimal(28,0)").alias("__sppm"),
        y.alias("__y"),
    )
    agg = d.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__sppm").cast("double").alias("__ss"),
        F.sum("__y").cast("long").alias("__pos"),
    )
    return agg.select(
        "bin",
        "n",
        F.round(F.col("__ss") / F.col("n") / F.lit(1000000.0), 6).alias(
            "mean_score"
        ),
        F.round(
            F.col("__pos").cast("double") / F.col("n").cast("double"), 6
        ).alias("frac_pos"),
    )


def group_auc(
    df: DataFrame,
    group_cols: "Sequence[str] | str",
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Per-group ROC AUC of a score against a binary label — the
    Mann-Whitney U statistic: AUC = P(score_pos > score_neg) +
    0.5 * P(tie). The model-quality readout next to
    :func:`calibration_curve` (calibration answers "are the
    probabilities honest", AUC answers "does the score rank at all"),
    computed per segment so slice regressions are visible.

    Exactness device: tie-aware average ranks in HALF-UNITS —
    ``h = 2*min_rank + tie_count - 1`` is an integer, so
    ``AUC = (sum_pos h - n1*(n1+1)) / (2*n1*n0)`` has an exact integer
    numerator and does ONE division per group; it replays bit-for-bit
    in any engine. Ranks come from one window per group (rank() +
    per-(group,score) count over the same sort — Catalyst shares it);
    groups are independent partitions, so there is no global sort —
    the single-partition window shape stays banned. Degenerate groups
    (all-positive or all-negative) return NULL.

    Output: group cols + ``(n_pos, n_neg, auc)``.
    """
    keys = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    w = Window.partitionBy(*keys).orderBy(score_col)
    wt = Window.partitionBy(*keys, score_col)
    lab = F.col(label_col).cast("long")
    r = df.select(
        *keys, score_col, lab.alias("__y")
    ).withColumn(
        "__h",
        2 * F.rank().over(w) + F.count(F.lit(1)).over(wt) - 1,
    )
    agg = r.groupBy(*keys).agg(
        F.sum("__y").alias("n_pos"),
        F.sum(F.lit(1) - F.col("__y")).alias("n_neg"),
        F.sum(F.col("__y") * F.col("__h")).alias("__sh"),
    )
    num = F.col("__sh") - F.col("n_pos") * (F.col("n_pos") + 1)
    den = 2 * F.col("n_pos") * F.col("n_neg")
    return agg.select(
        *keys,
        "n_pos",
        "n_neg",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.round(num / den, 6),
        ).alias("auc"),
    )


def split_balance(
    df: DataFrame,
    split_col: str,
    feature_cols: "Sequence[str]",
    a: str = "train",
    b: str = "test",
) -> DataFrame:
    """Covariate balance between two splits — per feature, the
    standardized mean difference ``smd = (mean_a - mean_b) /
    sqrt((var_a + var_b) / 2)``: the check run after
    :func:`~feat_spark.operators.sampling.split_assign` (and after
    every A/B randomization) to prove the splits are exchangeable
    before anyone trusts a metric computed on them. |SMD| < 0.1 is the
    conventional "balanced" bar.

    Shape: the profiler's one-melt-scan — features unpivot into
    (feature, value) rows in the SAME scan (a stack projection, not a
    pass per feature), then ONE partial agg keyed (feature, split)
    with exact decimal sums, a 2-way self-join on feature (two rows
    each — broadcast), and a closed form with a fixed handful of
    divisions. Degenerate features (both variances zero) return NULL
    smd.

    Output: ``(feature, n_a, n_b, mean_a, mean_b, smd)``, 6dp.
    """
    cols = list(feature_cols)
    stack = ", ".join(f"'{c}', cast({c} as double)" for c in cols)
    melted = df.select(
        F.col(split_col).alias("__s"),
        F.expr(f"stack({len(cols)}, {stack}) as (feature, __x)"),
    ).filter(F.col("__s").isin([a, b]) & F.col("__x").isNotNull())
    xd = F.col("__x").cast("decimal(18,6)")
    agg = melted.groupBy("feature", "__s").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xd).cast("double").alias("sx"),
        F.sum(xd * xd).cast("double").alias("sxx"),
    )
    aa = agg.filter(F.col("__s") == a).select(
        "feature",
        F.col("n").alias("n_a"),
        F.col("sx").alias("sxa"),
        F.col("sxx").alias("sxxa"),
    )
    bb = agg.filter(F.col("__s") == b).select(
        "feature",
        F.col("n").alias("n_b"),
        F.col("sx").alias("sxb"),
        F.col("sxx").alias("sxxb"),
    )
    j = aa.join(bb, "feature")
    mean_a = F.col("sxa") / F.col("n_a")
    mean_b = F.col("sxb") / F.col("n_b")
    var_a = (F.col("sxxa") - F.col("sxa") * F.col("sxa") / F.col("n_a")) / (
        F.col("n_a") - 1
    )
    var_b = (F.col("sxxb") - F.col("sxb") * F.col("sxb") / F.col("n_b")) / (
        F.col("n_b") - 1
    )
    pooled = (var_a + var_b) / 2
    return j.select(
        "feature",
        "n_a",
        "n_b",
        F.round(mean_a, 6).alias("mean_a"),
        F.round(mean_b, 6).alias("mean_b"),
        F.when(
            (F.col("n_a") > 1) & (F.col("n_b") > 1) & (pooled > 0),
            F.round((mean_a - mean_b) / F.sqrt(pooled), 6),
        ).alias("smd"),
    )


def standardized_rates(
    df: DataFrame,
    group_col: str,
    strata_col: str,
    metric_when: str,
) -> DataFrame:
    """Directly-standardized rates per group — the Simpson's-paradox
    guard: each group's stratum-level rates are re-weighted by the
    POOLED stratum distribution, so two groups with different strata
    mixes (mobile-heavy vs desktop-heavy variants, old vs new cohorts)
    compare on the same footing. The confounding-adjustment companion
    to :func:`cuped_adjust` (that one removes pre-period variance;
    this removes composition).

    ``metric_when`` is a SQL boolean (e.g. ``"event_type =
    'purchase'"``); the metric is its rate.

    Exactness: all counts integer; the crude rate is one division; the
    standardized rate ``sum_s w_s * (x_gs/n_gs)`` is a SORTED FOLD
    over strata-ordered per-stratum terms (strata are a bounded
    dimension — device of behavior_entropy), each term carrying two
    integer-operand divisions. Strata where the group has no exposure
    contribute nothing and their weight is honestly missing from that
    group's normalizer (``w_covered`` reports how much of the pooled
    weight the group covers — readers must see <1 coverage rather
    than a silently rescaled rate).

    Output: ``(group, n, crude_rate, std_rate, w_covered)``, 6dp.
    """
    hit = F.expr(metric_when).cast("long")
    cell = df.select(
        F.col(group_col).alias("grp"),
        F.col(strata_col).alias("st"),
        hit.alias("__x"),
    ).groupBy("grp", "st").agg(
        F.count(F.lit(1)).alias("n_gs"), F.sum("__x").alias("x_gs")
    )
    pooled = cell.groupBy("st").agg(F.sum("n_gs").alias("n_s"))
    total = pooled.agg(F.sum("n_s").alias("n_tot"))
    j = cell.join(pooled, "st").crossJoin(F.broadcast(total))
    term = (F.col("n_s") / F.col("n_tot")) * (
        F.col("x_gs") / F.col("n_gs")
    )
    wterm = F.col("n_s") / F.col("n_tot")
    agg = j.groupBy("grp").agg(
        F.sum("n_gs").alias("n"),
        F.sum("x_gs").alias("__x"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("st", term.alias("__t")))),
            F.lit(0.0),
            lambda acc, s: acc + s["__t"],
        ).alias("__std"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("st", wterm.alias("__w")))),
            F.lit(0.0),
            lambda acc, s: acc + s["__w"],
        ).alias("__wcov"),
    )
    return agg.select(
        F.col("grp").alias(group_col),
        "n",
        F.round(F.col("__x") / F.col("n"), 6).alias("crude_rate"),
        F.round("__std", 6).alias("std_rate"),
        F.round("__wcov", 6).alias("w_covered"),
    )


def confusion_stats(
    df: DataFrame,
    label_col: str,
    pred_col: str,
) -> DataFrame:
    """Multi-class confusion readout — per CLASS support, predicted
    count, true positives, precision, recall, F1: the eval table next
    to :func:`group_auc` (AUC scores the ranking; this scores the
    committed decisions) and the monitoring diff under label-drift
    alarms.

    One (label, pred)-keyed count is the whole shuffle (the confusion
    matrix itself is classes² — dimension-scale); per-class margins
    come from re-aggregating that tiny frame twice and an outer merge
    keeps classes that appear only as labels (recall 0) or only as
    predictions (precision 0). Ratios are one integer-operand division
    each; zero denominators are NULL, and F1 is NULL when either side
    is (honest undefined, not 0).

    Output: ``(cls, n_true, n_pred, tp, precision, recall, f1)``.
    """
    m = df.select(
        F.col(label_col).alias("y"), F.col(pred_col).alias("p")
    ).groupBy("y", "p").agg(F.count(F.lit(1)).alias("n"))
    truth = m.groupBy(F.col("y").alias("cls")).agg(
        F.sum("n").alias("n_true")
    )
    pred = m.groupBy(F.col("p").alias("cls")).agg(
        F.sum("n").alias("n_pred")
    )
    tp = m.filter(F.col("y") == F.col("p")).select(
        F.col("y").alias("cls"), F.col("n").alias("tp")
    )
    j = (
        truth.join(pred, "cls", "full_outer")
        .join(tp, "cls", "left")
        .select(
            "cls",
            F.coalesce("n_true", F.lit(0)).alias("n_true"),
            F.coalesce("n_pred", F.lit(0)).alias("n_pred"),
            F.coalesce("tp", F.lit(0)).alias("tp"),
        )
    )
    prec = F.when(F.col("n_pred") > 0, F.col("tp") / F.col("n_pred"))
    rec = F.when(F.col("n_true") > 0, F.col("tp") / F.col("n_true"))
    return j.select(
        "cls",
        "n_true",
        "n_pred",
        "tp",
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(
            F.when(
                prec.isNotNull() & rec.isNotNull() & ((prec + rec) > 0),
                2 * prec * rec / (prec + rec),
            ),
            6,
        ).alias("f1"),
    )


def cohens_kappa(
    df: DataFrame,
    a_col: str,
    b_col: str,
) -> DataFrame:
    """Cohen's kappa between two raters' labels — chance-corrected
    agreement, THE acceptance metric for annotation pipelines (raw
    percent agreement flatters any skewed label set; kappa is what a
    labeling vendor is actually held to). Reads two label columns of
    the same rows (pivot rater long-form upstream).

    Exactness: one (a,b)-keyed count is the whole shuffle (the
    classes²-sized agreement matrix); ``po`` and ``pe`` close from
    integer sums — ``kappa = (N*sum_agree - sum_k a_k*b_k) /
    (N*N - sum_k a_k*b_k)`` with an exact INTEGER numerator and
    denominator (multiply the classic rate form through by N²), one
    division. Degenerate (pe = 1: both raters constant) returns NULL.

    Output: one row ``(n, po, pe, kappa)``, 6dp.
    """
    m = df.select(
        F.col(a_col).alias("a"), F.col(b_col).alias("b")
    ).groupBy("a", "b").agg(F.count(F.lit(1)).alias("n"))
    am = m.groupBy("a").agg(F.sum("n").alias("na"))
    bm = m.groupBy("b").agg(F.sum("n").alias("nb"))
    cross = am.join(bm, am["a"] == bm["b"]).select(
        (F.col("na") * F.col("nb")).alias("__ab")
    )
    tot = m.agg(
        F.sum("n").alias("__n"),
        F.sum(F.when(F.col("a") == F.col("b"), F.col("n"))).alias("__agree"),
    )
    s = cross.agg(F.sum("__ab").alias("__sab")).crossJoin(F.broadcast(tot))
    num = F.col("__n") * F.coalesce(F.col("__agree"), F.lit(0)) - F.col(
        "__sab"
    )
    den = F.col("__n") * F.col("__n") - F.col("__sab")
    return s.select(
        F.col("__n").alias("n"),
        F.round(F.coalesce(F.col("__agree"), F.lit(0)) / F.col("__n"), 6).alias("po"),
        F.round(F.col("__sab") / (F.col("__n") * F.col("__n")), 6).alias("pe"),
        F.when(den > 0, F.round(num / den, 6)).alias("kappa"),
    )


def did_readout(
    df: DataFrame,
    treat_col: str,
    post_col: str,
    value_col: str,
) -> DataFrame:
    """Difference-in-differences: the 2x2 (treatment x period) mean
    table and the DiD estimate ``(T_post - T_pre) - (C_post - C_pre)``
    — the standard quasi-experimental readout when assignment was not
    randomized but both groups share a pre-period trend.

    ONE scan aggregate: the four cell sums and counts are conditional
    sums (``sum(case when ...)``) in a single partial agg — no joins,
    no pivot, no shuffle beyond the 1-row reduction. The module's
    exactness device: integer cents for sums, one double division per
    mean with a fixed op shape, 6dp. Any empty cell yields NULL means
    and a NULL estimate (the honest answer; a DiD without all four
    cells is not a DiD).

    ``treat_col`` / ``post_col`` are booleans.
    """
    c = F.round(F.col(value_col) * 100).cast("long")
    t, p = F.col(treat_col), F.col(post_col)

    def cell(cond, name):
        s = F.sum(F.when(cond, c)).alias(f"__s_{name}")
        n = F.sum(F.when(cond, F.lit(1)).otherwise(F.lit(0))).alias(
            f"__n_{name}"
        )
        return [s, n]

    agg = df.agg(
        *cell(t & p, "tp"),
        *cell(t & ~p, "t0"),
        *cell(~t & p, "cp"),
        *cell(~t & ~p, "c0"),
    )

    def mean(name):
        return F.when(
            F.col(f"__n_{name}") > 0,
            F.col(f"__s_{name}").cast("double")
            / F.col(f"__n_{name}").cast("double")
            / F.lit(100.0),
        )

    m_tp, m_t0, m_cp, m_c0 = (mean(x) for x in ("tp", "t0", "cp", "c0"))
    return agg.select(
        F.round(m_t0, 6).alias("mean_treat_pre"),
        F.round(m_tp, 6).alias("mean_treat_post"),
        F.round(m_c0, 6).alias("mean_ctrl_pre"),
        F.round(m_cp, 6).alias("mean_ctrl_post"),
        F.round((m_tp - m_t0) - (m_cp - m_c0), 6).alias("did"),
    )


def gains_table(
    df: DataFrame,
    segment_cols: "Sequence[str] | str",
    score_col: str,
    label_col: str,
    tiebreak_col: str = "id",
    n_bins: int = 10,
) -> DataFrame:
    """Decile gains/lift table per segment — the model-quality readout
    between :func:`calibration_curve` (are the probabilities honest)
    and :func:`group_auc` (does the score rank): if we action only the
    top decile, what fraction of all positives do we CAPTURE, and how
    much better than random is each slice (LIFT)? The table every
    targeting / fraud / churn campaign is sized from.

    Plan shape: ``ntile(n_bins)`` over a per-SEGMENT window (score
    desc, tiebreak asc — a deterministic total order, so both engines
    bucket identically), one (segment, bin) agg, then cumulative sums
    over the n_bins-row-per-segment frame. Segments are independent
    partitions — no global sort exists; the window after the agg
    orders at most ``n_bins`` rows per segment.

    Exactness: capture = cum_pos / tot_pos and
    lift = (n_pos * tot_n) / (n * tot_pos) are ratios of exact
    integers — one IEEE division each, 9dp.

    Output: segments + ``(bin, n, n_pos, cum_pos, capture, lift)``.
    """
    keys = [segment_cols] if isinstance(segment_cols, str) else list(segment_cols)
    w = Window.partitionBy(*keys).orderBy(
        F.col(score_col).desc(), F.col(tiebreak_col).asc()
    )
    binned = df.withColumn("bin", F.ntile(n_bins).over(w))
    agg = binned.groupBy(*keys, "bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(label_col).cast("long")).alias("n_pos"),
    )
    ws = Window.partitionBy(*keys).orderBy("bin")
    wa = Window.partitionBy(*keys)
    out = (
        agg.withColumn("cum_pos", F.sum("n_pos").over(ws))
        .withColumn("__tot_pos", F.sum("n_pos").over(wa))
        .withColumn("__tot_n", F.sum("n").over(wa))
    )
    return out.select(
        *keys,
        "bin",
        "n",
        "n_pos",
        "cum_pos",
        F.when(
            F.col("__tot_pos") > 0,
            F.round(
                F.col("cum_pos").cast("double")
                / F.col("__tot_pos").cast("double"),
                9,
            ),
        ).alias("capture"),
        F.when(
            F.col("__tot_pos") > 0,
            F.round(
                (F.col("n_pos") * F.col("__tot_n")).cast("double")
                / (F.col("n") * F.col("__tot_pos")).cast("double"),
                9,
            ),
        ).alias("lift"),
    )


def brier_score(
    df: DataFrame,
    group_cols: "Sequence[str] | str",
    score_milli_col: str,
    label_col: str,
) -> DataFrame:
    """Per-group Brier score of a probabilistic classifier — the
    strictly proper scoring rule ``mean((p - y)^2)``: unlike AUC it
    punishes miscalibrated confidence, unlike log-loss it is FINITE
    and (with milli-unit scores) EXACT.

    Exactness device: scores arrive as integer milli-units (0..1000,
    the caller quantizes — model scores at 3dp lose nothing), so
    ``(s - 1000*y)^2`` sums as exact longs and the score closes with
    ONE division by ``n * 10^6``, 9dp. The skill readout
    ``brier_skill = 1 - brier/brier_base`` compares against the
    group's own base rate ``p0=sum_y/n``: base Brier is
    ``p0*(1-p0)``, also a ratio of exact integers
    (``sum_y*(n-sum_y)/n^2``).

    One partial-aggregated groupBy; no window, no join.

    Output: groups + ``(n, base_rate, brier, brier_skill)``.
    """
    keys = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    s = F.col(score_milli_col).cast("long")
    y = F.col(label_col).cast("long")
    agg = df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(y).alias("__sy"),
        F.sum((s - 1000 * y) * (s - 1000 * y)).alias("__sq"),
    )
    brier = F.col("__sq").cast("double") / (
        F.col("n").cast("double") * F.lit(1000000.0)
    )
    base = F.col("__sy").cast("double") / F.col("n").cast("double")
    brier_base = (F.col("__sy") * (F.col("n") - F.col("__sy"))).cast(
        "double"
    ) / (F.col("n") * F.col("n")).cast("double")
    return agg.select(
        *keys,
        "n",
        F.round(base, 9).alias("base_rate"),
        F.round(brier, 9).alias("brier"),
        F.when(
            (F.col("__sy") > 0) & (F.col("__sy") < F.col("n")),
            F.round(F.lit(1.0) - brier / brier_base, 9),
        ).alias("brier_skill"),
    )


def pr_thresholds(
    df: DataFrame,
    score_milli_col: str,
    label_col: str,
    thresholds_milli: "Sequence[int]" = (100, 200, 300, 400, 500, 600, 700, 800, 900),
) -> DataFrame:
    """Precision / recall / F1 at a grid of decision thresholds — the
    operating-point sweep that picks WHERE to cut a ranked score
    (group_auc says the ranking is good; this says what you get at
    p >= 0.3 vs p >= 0.7).

    Plan shape: CONDITIONAL AGGREGATION, not row explosion — one
    global partial agg computes (tp, predicted-positive) per threshold
    as 2T+1 columns in a single pass (map-side combined; a T-way
    row multiply at 100 TB would be T extra scans' worth of shuffle),
    then a literal T-row unpivot. predicted >= threshold counts as
    positive.

    Exactness: counts are exact longs; precision = tp/pp,
    recall = tp/ap, f1 = 2*tp/(2*tp + fp + fn) — one IEEE division
    each, 9dp; empty denominators yield NULL.

    Output: ``(threshold_milli, tp, fp, fn, precision, recall, f1)``.
    """
    s = F.col(score_milli_col).cast("long")
    y = F.col(label_col).cast("long")
    aggs = [F.sum(y).alias("__ap")]
    for t in thresholds_milli:
        aggs.append(F.sum(F.when(s >= t, y).otherwise(F.lit(0))).alias(f"__tp_{t}"))
        aggs.append(
            F.sum(F.when(s >= t, F.lit(1)).otherwise(F.lit(0))).alias(f"__pp_{t}")
        )
    one = df.agg(*aggs)
    rows = one.select(
        "__ap",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(int(t)).alias("threshold_milli"),
                        F.col(f"__tp_{t}").alias("tp"),
                        F.col(f"__pp_{t}").alias("pp"),
                    )
                    for t in thresholds_milli
                ]
            )
        ).alias("r"),
    ).select("__ap", "r.threshold_milli", "r.tp", "r.pp")
    fp = F.col("pp") - F.col("tp")
    fn = F.col("__ap") - F.col("tp")
    return rows.select(
        "threshold_milli",
        "tp",
        fp.alias("fp"),
        fn.alias("fn"),
        F.when(
            F.col("pp") > 0,
            F.round(F.col("tp").cast("double") / F.col("pp").cast("double"), 9),
        ).alias("precision"),
        F.when(
            F.col("__ap") > 0,
            F.round(F.col("tp").cast("double") / F.col("__ap").cast("double"), 9),
        ).alias("recall"),
        F.when(
            (2 * F.col("tp") + fp + fn) > 0,
            F.round(
                (2 * F.col("tp")).cast("double")
                / (2 * F.col("tp") + fp + fn).cast("double"),
                9,
            ),
        ).alias("f1"),
    )


def rand_index(
    df: DataFrame,
    pred_col: str,
    truth_col: str,
) -> DataFrame:
    """Clustering-vs-truth agreement by pair counting — Rand index and
    its chance-adjusted form (ARI): of all n*(n-1)/2 item pairs, how
    many does the predicted clustering put together/apart EXACTLY as
    the ground truth does. The quality readout for every cluster
    producer in this repo (``dedup_components``, ``entity_resolution``,
    ``assign_clusters``) against planted or labelled truth — purity
    without purity's cheat (one-item clusters score 1.0 on purity;
    ARI's expectation-correction zeroes them out).

    Pair counting WITHOUT pairs: all four pair classes close from the
    contingency table — ``a = sum_ij C(n_ij,2)`` (together in both),
    ``rows = sum_i C(n_i.,2)``, ``cols = sum_j C(n_.j,2)``,
    ``total = C(n,2)`` — three partial-aggregated group-bys over cell
    counts, never a self-join. Exactness device: every term is kept
    DOUBLED (``x*(x-1)`` instead of C(x,2) — RI and ARI are ratios,
    invariant under the common factor), so the sums are exact
    decimal(38,0) integers with no decimal division anywhere; RI and
    ARI close as fixed-order double expressions (ARI's expected-index
    term divided FIRST — both engines replay the same three-op
    shape), 9dp. Degenerate inputs (n < 2, or expected == max so
    chance explains everything) yield NULL ARI.

    Output: one row ``(n, n_pred_clusters, n_truth_clusters, ri,
    ari)``.
    """
    cells = df.groupBy(
        F.col(pred_col).alias("__p"), F.col(truth_col).alias("__t")
    ).agg(F.count(F.lit(1)).alias("__c"))

    def c2(col):
        # DOUBLED pair count x*(x-1): exact decimal, no division
        d = F.col(col).cast("decimal(38,0)")
        return d * (d - 1)

    a = cells.agg(
        F.sum(c2("__c")).alias("__a"),
        F.sum("__c").alias("__n"),
    )
    rows = (
        cells.groupBy("__p")
        .agg(F.sum("__c").alias("__ri"))
        .agg(
            F.sum(c2("__ri")).alias("__rows"),
            F.count(F.lit(1)).alias("__np"),
        )
    )
    cols = (
        cells.groupBy("__t")
        .agg(F.sum("__c").alias("__ci"))
        .agg(
            F.sum(c2("__ci")).alias("__cols"),
            F.count(F.lit(1)).alias("__nt"),
        )
    )
    tall = (
        a.select(F.lit("a").alias("__m"), F.col("__a").cast("double").alias("__v1"), F.col("__n").cast("double").alias("__v2"))
        .unionAll(rows.select(F.lit("r"), F.col("__rows").cast("double"), F.col("__np").cast("double")))
        .unionAll(cols.select(F.lit("c"), F.col("__cols").cast("double"), F.col("__nt").cast("double")))
    )
    one = tall.agg(
        F.max(F.when(F.col("__m") == "a", F.col("__v1"))).alias("a"),
        F.max(F.when(F.col("__m") == "a", F.col("__v2"))).alias("n"),
        F.max(F.when(F.col("__m") == "r", F.col("__v1"))).alias("rows"),
        F.max(F.when(F.col("__m") == "r", F.col("__v2"))).alias("np"),
        F.max(F.when(F.col("__m") == "c", F.col("__v1"))).alias("cols"),
        F.max(F.when(F.col("__m") == "c", F.col("__v2"))).alias("nt"),
    )
    total = F.col("n") * (F.col("n") - 1)
    tn = total - F.col("rows") - F.col("cols") + F.col("a")
    exp = F.col("rows") * F.col("cols") / total
    maxi = (F.col("rows") + F.col("cols")) / 2
    return one.select(
        F.col("n").cast("long").alias("n"),
        F.col("np").cast("long").alias("n_pred_clusters"),
        F.col("nt").cast("long").alias("n_truth_clusters"),
        F.when(
            F.col("n") >= 2,
            F.round((F.col("a") + tn) / total, 9),
        ).alias("ri"),
        F.when(
            (F.col("n") >= 2) & (maxi != exp),
            F.round((F.col("a") - exp) / (maxi - exp), 9),
        ).alias("ari"),
    )


def proportion_ci(
    df: DataFrame,
    group_cols: "Sequence[str] | str",
    success_col: str,
    z: float = 1.96,
) -> DataFrame:
    """Per-group Wilson score interval for a binary proportion — the
    CI that stays inside [0,1] and behaves at small n / extreme p
    where the naive Wald interval collapses (p̂=0 gives Wald width 0:
    certainty from no evidence). The readout every conversion-rate /
    SRM / rollout dashboard should put next to its point estimate;
    sits beside :func:`welch_ttest` (means) as the proportions
    inference primitive.

    Closed form, fixed op order (both engines replay the identical
    expression tree over exact integer (x, n)): with z² literal-
    squared once, ``denom = 1 + z²/n``, ``center = (p̂ + z²/2n) /
    denom``, ``half = z * sqrt(p̂(1-p̂)/n + z²/4n²) / denom`` — IEEE
    sqrt and divisions are correctly rounded, so the bounds are
    deterministic, 9dp. One partial-agg pass; n = 0 groups yield
    NULLs.

    Output: groups + ``(n, successes, rate, ci_low, ci_high)``.
    """
    keys = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    y = F.col(success_col).cast("long")
    agg = df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"), F.sum(y).alias("successes")
    )
    n = F.col("n").cast("double")
    p = F.col("successes").cast("double") / n
    z2 = F.lit(float(z)) * F.lit(float(z))
    denom = F.lit(1.0) + z2 / n
    center = (p + z2 / (F.lit(2.0) * n)) / denom
    half = (
        F.lit(float(z))
        * F.sqrt(
            p * (F.lit(1.0) - p) / n
            + z2 / (F.lit(4.0) * n * n)
        )
        / denom
    )
    ok = F.col("n") > 0
    return agg.select(
        *keys,
        "n",
        "successes",
        F.when(ok, F.round(p, 9)).alias("rate"),
        F.when(ok, F.round(F.greatest(center - half, F.lit(0.0)), 9)).alias(
            "ci_low"
        ),
        F.when(ok, F.round(F.least(center + half, F.lit(1.0)), 9)).alias(
            "ci_high"
        ),
    )


def ratio_metric_ci(
    df: DataFrame,
    cluster_col: str,
    numerator_col: str,
    denominator_col: str,
    z: float = 1.96,
) -> DataFrame:
    """Delta-method CI for a RATIO metric under cluster randomization
    — conversions-per-event, revenue-per-session, anything of the
    form ``sum(x)/sum(n)`` where users (clusters), not rows, are the
    randomization unit: naive row-level variance ignores within-user
    correlation and reports intervals that are confidently wrong.
    The standard experiment-platform correction (linearization):
    ``var(R) = (s_x² + R² s_n² − 2 R s_xn) / (K n̄²)`` over per-cluster
    sums.

    One agg to per-cluster (x_i, n_i), one agg over clusters carrying
    the five exact decimal(38,0) moment sums, closed form in fixed op
    order (sample covariances via ``K·Σab − Σa·Σb`` exact integers,
    ONE division each; IEEE sqrt), 9dp. Degenerate inputs (K < 2 or
    Σn = 0) yield NULL bounds.

    Output: one row ``(k_clusters, ratio, se, ci_low, ci_high)``.
    """
    per = df.groupBy(F.col(cluster_col).alias("__c")).agg(
        F.sum(F.col(numerator_col).cast("long")).alias("__x"),
        F.sum(F.col(denominator_col).cast("long")).alias("__n"),
    )
    d = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    agg = per.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum(d("__x")).alias("__sx"),
        F.sum(d("__n")).alias("__sn"),
        F.sum(d("__x") * d("__x")).alias("__sxx"),
        F.sum(d("__n") * d("__n")).alias("__snn"),
        F.sum(d("__x") * d("__n")).alias("__sxn"),
    )
    kd = F.col("k").cast("decimal(38,0)")
    # sample (co)variance numerators: K·Σab − Σa·Σb, exact integers
    vxx = (kd * F.col("__sxx") - F.col("__sx") * F.col("__sx")).cast("double")
    vnn = (kd * F.col("__snn") - F.col("__sn") * F.col("__sn")).cast("double")
    vxn = (kd * F.col("__sxn") - F.col("__sx") * F.col("__sn")).cast("double")
    kdbl = F.col("k").cast("double")
    denom = kdbl * (kdbl - F.lit(1.0))
    sxx = vxx / denom
    snn = vnn / denom
    sxn = vxn / denom
    r = F.col("__sx").cast("double") / F.col("__sn").cast("double")
    nbar = F.col("__sn").cast("double") / kdbl
    var = (sxx + r * r * snn - F.lit(2.0) * r * sxn) / (kdbl * nbar * nbar)
    se = F.sqrt(F.greatest(var, F.lit(0.0)))
    ok = (F.col("k") >= 2) & (F.col("__sn") > 0)
    return agg.select(
        F.col("k").alias("k_clusters"),
        F.when(F.col("__sn") > 0, F.round(r, 9)).alias("ratio"),
        F.when(ok, F.round(se, 9)).alias("se"),
        F.when(ok, F.round(r - F.lit(float(z)) * se, 9)).alias("ci_low"),
        F.when(ok, F.round(r + F.lit(float(z)) * se, 9)).alias("ci_high"),
    )


def conformal_calibration(
    df: DataFrame,
    group_cols: "Sequence[str] | str",
    value_cents_col: str,
    id_col: str,
    alpha_milli: int = 100,
) -> DataFrame:
    """Split-conformal interval calibration per group — the
    distribution-free coverage check: hash-split rows into
    calibration/test halves, predict each test value with the group's
    CALIBRATION mean, set the radius ``q̂`` to the
    ``ceil((n_cal+1)(1-α))``-th smallest calibration residual, and
    report the achieved test coverage (guaranteed ≥ 1-α in
    expectation by exchangeability — the property this audits). The
    modern answer to "are my prediction intervals honest" without
    assuming a distribution; pairs with :func:`calibration_curve`
    (probabilities) for regression-shaped features.

    Determinism: the split is the portable md5 hash (even/odd);
    predictions are exact cent ratios; residuals ``|v − mean|`` are
    identical IEEE doubles in both engines, so the rank-selected q̂
    and the coverage counts replay exactly. The residual ranking is a
    per-GROUP window (groups are independent partitions — no global
    sort); rank ties at q̂ are harmless because selection is by rank,
    not value. Groups with an empty half yield NULLs.

    Output: groups + ``(n_cal, n_test, qhat, coverage,
    target_coverage)``.
    """
    keys = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    from feat_spark.functions.text import md5_long32

    half = F.pmod(md5_long32(F.col(id_col).cast("string")), F.lit(2))
    base = df.select(
        *keys,
        F.col(value_cents_col).cast("long").alias("__v"),
        half.alias("__h"),
    )
    cal = base.filter(F.col("__h") == 0)
    test = base.filter(F.col("__h") == 1)
    mean = cal.groupBy(*keys).agg(
        F.sum("__v").alias("__s"), F.count(F.lit(1)).alias("n_cal")
    ).withColumn(
        "__mean", F.col("__s").cast("double") / F.col("n_cal").cast("double")
    )
    calr = cal.join(mean, keys).withColumn(
        "__r", F.abs(F.col("__v").cast("double") - F.col("__mean"))
    )
    w = Window.partitionBy(*keys).orderBy(F.col("__r").asc(), F.col("__v").asc())
    target = 1.0 - alpha_milli / 1000.0
    ranked = calr.withColumn("__rk", F.row_number().over(w))
    qrank = F.ceil(
        (F.col("n_cal") + 1) * F.lit(target)
    ).cast("long")
    qhat = (
        ranked.filter(F.col("__rk") >= F.least(qrank, F.col("n_cal")))
        .groupBy(*keys, "n_cal")
        .agg(F.min("__r").alias("qhat"))
    )
    t = test.join(mean.select(*keys, "__mean"), keys).join(qhat, keys)
    cov = t.groupBy(*keys, "n_cal", "qhat").agg(
        F.count(F.lit(1)).alias("n_test"),
        F.sum(
            (
                F.abs(F.col("__v").cast("double") - F.col("__mean"))
                <= F.col("qhat")
            ).cast("long")
        ).alias("__hit"),
    )
    return cov.select(
        *keys,
        "n_cal",
        "n_test",
        F.round(F.col("qhat"), 9).alias("qhat"),
        F.round(
            F.col("__hit").cast("double") / F.col("n_test").cast("double"), 9
        ).alias("coverage"),
        F.lit(round(target, 3)).alias("target_coverage"),
    )


def quantile_treatment_effect(
    df: DataFrame,
    variant_col: str,
    value_cents_col: str,
    percentiles_milli: "Sequence[int]" = (100, 500, 900),
    arm_a: str = "a",
    arm_b: str = "b",
) -> DataFrame:
    """Quantile treatment effects — the difference between the arms'
    DISTRIBUTIONS at chosen quantiles, not just their means: a
    treatment that fattens the p90 while leaving the median alone is
    invisible to :func:`welch_ttest` and obvious here. The standard
    heavy-tail readout for latency, spend, and session-length
    experiments.

    Quantiles are percentile_disc-style RANK SELECTIONS (the
    ``ceil(p·n)``-th smallest actual value — exact integers in, exact
    integers out, no interpolation): one per-arm window over the
    (value, row-order) sort, one filter per requested rank, then the
    two arms align on the percentile. QTE = q_b − q_a is integer
    subtraction.

    Output: ``(p_milli, q_a, q_b, qte)``, one row per percentile.
    """
    from pyspark.sql import Window

    v = F.col(value_cents_col).cast("long")
    base = df.select(F.col(variant_col).alias("__arm"), v.alias("__v")).filter(
        F.col("__arm").isin([arm_a, arm_b])
    )
    w = Window.partitionBy("__arm").orderBy(F.col("__v").asc())
    wa = Window.partitionBy("__arm")
    ranked = base.withColumn("__rk", F.row_number().over(w)).withColumn(
        "__n", F.count(F.lit(1)).over(wa)
    )
    probes = ranked.select(
        "__arm",
        "__v",
        "__rk",
        "__n",
        F.explode(
            F.array(*[F.lit(int(p)) for p in percentiles_milli])
        ).alias("p_milli"),
    ).withColumn(
        "__target",
        F.greatest(
            F.floor((F.col("p_milli") * F.col("__n") + 999) / 1000).cast(
                "long"
            ),
            F.lit(1),
        ),
    )
    q = (
        probes.filter(F.col("__rk") == F.col("__target"))
        .groupBy("p_milli")
        .agg(
            F.max(F.when(F.col("__arm") == arm_a, F.col("__v"))).alias("q_a"),
            F.max(F.when(F.col("__arm") == arm_b, F.col("__v"))).alias("q_b"),
        )
    )
    return q.select(
        "p_milli",
        "q_a",
        "q_b",
        (F.col("q_b") - F.col("q_a")).alias("qte"),
    )


def simpsons_check(
    df: DataFrame,
    stratum_col: str,
    arm_col: str,
    success_col: str,
    arm_a: str = "a",
    arm_b: str = "b",
) -> DataFrame:
    """Simpson's-paradox detector — does the POOLED A-vs-B rate
    comparison point the same way as the per-stratum comparisons?
    When the majority of strata move one way and the pooled number
    moves the other, the pooled readout is a mix artifact (unequal
    arm allocation across strata), and shipping a decision on it is
    the textbook failure this audit exists to catch. Pairs with
    :func:`feat_spark.operators.profile.mix_shift` (which QUANTIFIES
    the mix contribution) — this one flags the sign flip.

    Exactness: every rate comparison is the CROSS-MULTIPLIED integer
    ``x_a·n_b − x_b·n_a`` (decimal(38,0) — no rate division anywhere,
    so zero-denominator strata are simply sign-0). One stratum-grain
    agg, one global agg; agreement counts by sign product.

    Output: one row ``(n_strata, pooled_sign, n_agree, n_oppose,
    n_flat, simpsons_flag)`` — flag true when opposing strata
    outnumber agreeing ones while the pooled sign is nonzero.
    """
    y = F.col(success_col).cast("long")
    isa = F.col(arm_col) == arm_a
    isb = F.col(arm_col) == arm_b
    per = df.filter(isa | isb).groupBy(
        F.col(stratum_col).alias("__s")
    ).agg(
        F.sum(F.when(isa, y).otherwise(F.lit(0))).alias("__xa"),
        F.sum(isa.cast("long")).alias("__na"),
        F.sum(F.when(isb, y).otherwise(F.lit(0))).alias("__xb"),
        F.sum(isb.cast("long")).alias("__nb"),
    )
    d = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    diff = d("__xa") * d("__nb") - d("__xb") * d("__na")
    per = per.withColumn("__d", diff)
    agg = per.agg(
        F.count(F.lit(1)).alias("n_strata"),
        F.sum("__xa").alias("__txa"),
        F.sum("__na").alias("__tna"),
        F.sum("__xb").alias("__txb"),
        F.sum("__nb").alias("__tnb"),
        F.sum((F.col("__d") > 0).cast("long")).alias("__n_pos"),
        F.sum((F.col("__d") < 0).cast("long")).alias("__n_neg"),
    )
    pooled = (
        d("__txa") * d("__tnb") - d("__txb") * d("__tna")
    ).cast("double")
    psign = F.signum(pooled).cast("int")
    n_agree = F.when(psign > 0, F.col("__n_pos")).when(
        psign < 0, F.col("__n_neg")
    ).otherwise(F.lit(0))
    n_oppose = F.when(psign > 0, F.col("__n_neg")).when(
        psign < 0, F.col("__n_pos")
    ).otherwise(F.lit(0))
    return agg.select(
        "n_strata",
        psign.alias("pooled_sign"),
        n_agree.cast("long").alias("n_agree"),
        n_oppose.cast("long").alias("n_oppose"),
        (F.col("n_strata") - F.col("__n_pos") - F.col("__n_neg"))
        .cast("long")
        .alias("n_flat"),
        ((psign != 0) & (n_oppose > n_agree)).alias("simpsons_flag"),
    )
