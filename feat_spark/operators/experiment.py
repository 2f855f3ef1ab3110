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

from pyspark.sql import DataFrame
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
