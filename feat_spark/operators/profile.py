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
