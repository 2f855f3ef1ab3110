"""HDR-style mergeable quantile sketch — bounded-error percentiles in
O(16 * 64) space.

The 100 TB problem: exact p99 needs a global sort (or a full
value-frequency table); the built-in ``approx_percentile`` is a
KLL-style sketch whose internals are engine-private — fine for ad-hoc
queries, unverifiable for a correctness-gated engine and not mergeable
across separately-computed slices from SQL. The HdrHistogram /
DDSketch family fixes both with DETERMINISTIC value-to-bucket math:
log-spaced buckets guarantee a relative-error bound, bucket counts
merge by addition (per-day sketches sum into monthly ones — the same
algebra as ``cms.countmin_build`` and the HLL rollup), and because the
bucket function is pure integer arithmetic an external engine can
replay the WHOLE sketch bit-for-bit.

Bucket math (all integer, no transcendentals — ``log2``-boundary
rounding is exactly the nondeterminism this avoids):

* ``major = bit_length(v)`` via ``length(bin(v))`` — so
  ``2^(major-1) <= v < 2^major``;
* ``minor = (v * 16) div 2^(major-1) - 16`` in [0, 16) — 16 linear
  sub-buckets per octave, giving worst-case relative error
  ``1/16 = 6.25%`` (lower-bound estimates under-read by at most one
  sub-bucket width);
* ``bucket = (major - 1) * 16 + minor``; the bucket's exact lower
  edge is ``(16 + minor) * 2^(major-1) / 16`` — one integer shift and
  one division by 16.

Estimates are percentile_disc-style: the target rank is
``ceil(p * n)`` and the answer is the lower edge of the first bucket
whose cumulative count reaches it. Values are positive integers (the
caller quantizes to cents and clamps); v < 1 is rejected by filter —
a zero/negative "amount" is an upstream audit failure, not a bucket.

Lives OUTSIDE the flagship benchmark closure on purpose (see
``operators/eventops.py`` for the rule).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hdr_buckets(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """The mergeable sketch relation: groups + ``(bucket, major,
    minor, n)`` with at most 16 * 64 buckets per group regardless of
    input size. One partial-aggregated groupBy — the map side has
    already collapsed to bucket grain before the (tiny) shuffle."""
    keys = list(group_cols)
    v = F.col(value_col).cast("long")
    major = F.length(F.conv(v.cast("string"), 10, 2)).cast("long")
    scaled = F.expr(
        f"shiftright(cast({value_col} as bigint) * 16, "
        f"cast(length(conv(cast({value_col} as bigint), 10, 2)) - 1 as int))"
    )
    minor = scaled - 16
    return (
        df.filter(v >= 1)
        .select(
            *keys,
            major.alias("major"),
            minor.alias("minor"),
            ((major - 1) * 16 + minor).alias("bucket"),
        )
        .groupBy(*keys, "bucket", "major", "minor")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def hdr_percentiles(
    df: DataFrame,
    value_col: str,
    percentiles_milli: Sequence[int] = (500, 900, 990),
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Percentile estimates off the HDR sketch: per group and
    requested percentile (in milli-units: 990 = p99), the lower edge
    of the first bucket whose cumulative count reaches
    ``ceil(p * n)``. Guaranteed under-read by less than one
    sub-bucket: ``estimate <= true percentile < estimate * 17/16``
    (both ends exact integers' edges — the bound every estimate
    carries by construction, asserted in the unit vectors).

    Plan shape: the sketch agg, one per-group window over <= 1024
    bucket rows for the cumulative counts, then a min-per-(group, p)
    agg over the literal-exploded percentile list. Exactness: the
    edge ``(16 + minor) * 2^(major-1) / 16`` is an integer shift and
    ONE division by 16 (an exact IEEE operation — /16 is a power-of-2
    scale); target ranks are exact integer ceil-division.

    Output: groups + ``(p_milli, n_total, target_rank, est)``.
    """
    keys = list(group_cols)
    sk = hdr_buckets(df, value_col, group_cols=keys)
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*keys if keys else [F.lit(1)])
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wa = Window.partitionBy(*keys if keys else [F.lit(1)])
    cum = sk.withColumn("cum", F.sum("n").over(w)).withColumn(
        "n_total", F.sum("n").over(wa)
    )
    probes = cum.select(
        *keys,
        "bucket",
        "major",
        "minor",
        "cum",
        "n_total",
        F.explode(
            F.array(*[F.lit(int(p)).alias("p") for p in percentiles_milli])
        ).alias("p_milli"),
    ).withColumn(
        "target_rank",
        # ceil(p * n / 1000) as exact integer ceil-division
        (F.col("p_milli") * F.col("n_total") + 999).cast("long") / 1000,
    ).withColumn(
        "target_rank", F.floor(F.col("target_rank")).cast("long")
    )
    hit = probes.filter(F.col("cum") >= F.col("target_rank"))
    est_edge = (
        F.expr("shiftleft(cast(16 + minor as bigint), cast(major - 1 as int))")
        .cast("double")
        / F.lit(16.0)
    )
    ranked = hit.groupBy(*keys, "p_milli", "n_total", "target_rank").agg(
        F.min(F.struct(F.col("bucket"), est_edge.alias("e"))).alias("__b")
    )
    return ranked.select(
        *keys,
        "p_milli",
        "n_total",
        "target_rank",
        F.col("__b.e").alias("est"),
    )
