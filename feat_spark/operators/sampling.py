"""Deterministic hash-based sampling — the reproducible way to cut a
100 TB corpus down to a training/eval slice.

``df.sample()`` is seeded per-partition and changes with the physical
layout (file order, splits, repartition), so two runs over the same
LOGICAL data can sample different rows. Hash-gating on a stable key
(``pmod(h(key), 100) < pct``) is layout-independent, join-stable
(the same id is in or out everywhere, forever), pushes down as an
ordinary filter, and an external engine can replay it bit-for-bit —
the property every data-lineage audit eventually asks for.

The hash is the portable ``md5_long32`` (Spark md5 == DuckDB md5), so
the driver oracle checks the SAMPLED SET itself, not just its size.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from feat_spark.functions.text import md5_long32


def _gate(key: Column, salt: str) -> Column:
    """Uniform [0,100) hash gate on (salt, key)."""
    return F.pmod(md5_long32(F.concat_ws(":", F.lit(salt), key.cast("string"))), F.lit(100))


def hash_sample(
    df: DataFrame, key: str, pct: int, salt: str = "s"
) -> DataFrame:
    """Keep ~``pct``% of rows, chosen by a stable hash of ``key``.
    ``salt`` decorrelates independent samples over the same key space
    (eval vs train splits: different salts, disjoint-ish gates)."""
    return df.filter(_gate(F.col(key), salt) < pct)


def stratified_hash_sample(
    df: DataFrame,
    strata: str,
    key: str,
    rates: Mapping[str, int],
    default_pct: int = 0,
    salt: str = "s",
) -> DataFrame:
    """Per-stratum rates (e.g. downsample boilerplate-heavy sources,
    keep all rare ones): ``{stratum_value: pct}``; unlisted strata get
    ``default_pct``. One narrow filter — no shuffle, no per-stratum
    passes."""
    rate = F.lit(default_pct)
    for value, pct in sorted(rates.items()):
        rate = F.when(F.col(strata) == value, F.lit(pct)).otherwise(rate)
    return df.filter(_gate(F.col(key), salt) < rate)


def assign_split(
    df: DataFrame,
    key: str,
    splits: Mapping[str, int] | None = None,
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: ONE hash gate value
    partitioned into contiguous ranges, so the splits are disjoint and
    exhaustive BY CONSTRUCTION (a row is in exactly one split — unlike
    stacking independent ``hash_sample`` calls, where gates overlap).

    ``splits`` maps name -> percent and must sum to 100 (default
    ``{"train": 90, "val": 5, "test": 5}``). Assignment is stable under
    repartitioning, file order, and corpus growth: a doc's split never
    changes when other docs arrive — the property that keeps eval sets
    uncontaminated across corpus versions. Iteration order of the dict
    fixes the range layout, so pass the same dict (same order) to
    reproduce an existing assignment.
    """
    splits = splits or {"train": 90, "val": 5, "test": 5}
    if sum(splits.values()) != 100:
        raise ValueError(f"split percents must sum to 100: {splits}")
    g = _gate(F.col(key), salt)
    expr = F.lit(None).cast("string")
    lo = 0
    for name, pct in splits.items():
        expr = F.when((g >= lo) & (g < lo + pct), F.lit(name)).otherwise(expr)
        lo += pct
    return df.withColumn(out_col, expr)


def cap_per_group(
    df: DataFrame,
    group_col: str,
    cap: int,
    key: str,
    salt: str = "cap",
    out_col: str = "kept",
) -> DataFrame:
    """Per-group quota cap (RefinedWeb-style per-domain limits): keep
    at most ``cap`` rows per ``group_col``, chosen by a stable hash of
    ``key`` (then ``key`` itself as tiebreak) — so the kept subset is
    deterministic, layout-independent, and replayable by any engine.

    Returns every input row plus a boolean ``out_col``; callers filter
    on it. Selection is equivalent to ``row_number() over (partition
    by group order by h, key) <= cap``, but executes in two phases so
    the common case never sorts: a per-group count (partial-agg
    shuffle, one long per group) splits the corpus into under-cap
    groups — kept outright with NO window — and over-cap groups, which
    alone pay the per-group rank. At web scale most domains sit far
    under any sane cap, so the sort touches a small residue; a single
    pathological mega-domain is one sorted partition of its own rows
    (bound it upstream with ``hash_sample`` if a domain can exceed
    executor memory).
    """
    from pyspark.sql import Window

    h = md5_long32(
        F.concat_ws(":", F.lit(salt), F.col(key).cast("string"))
    ).alias("__h")
    counts = df.groupBy(F.col(group_col).alias("__g")).agg(
        F.count(F.lit(1)).alias("__gn")
    )
    # null-SAFE join: a NULL group is a real group (groupBy keeps it);
    # a plain equality join would silently drop its rows
    with_n = (
        df.join(counts, F.col(group_col).eqNullSafe(F.col("__g")))
        .drop("__g")
        .withColumn("__h", h)
    )
    under = with_n.filter(F.col("__gn") <= cap).withColumn(out_col, F.lit(True))
    w = Window.partitionBy(group_col).orderBy(F.col("__h").asc(), F.col(key).asc())
    over = (
        with_n.filter(F.col("__gn") > cap)
        .withColumn(out_col, F.row_number().over(w) <= cap)
    )
    return under.unionByName(over).drop("__gn", "__h")


def weighted_hash_sample(
    df: DataFrame,
    key: str,
    p_col: str,
    salt: str = "w",
) -> DataFrame:
    """Per-row weighted Bernoulli sampling: keep each row with its OWN
    probability ``p_col`` (0..1) — quality-weighted corpus cuts
    ("keep good documents more often") with every guarantee of
    ``hash_sample``: layout-independent, join-stable, replayable.

    The inclusion test is ``hash_gate(key) < floor(p * 10000)`` basis
    points: the only float op is one multiply-and-floor per row,
    identical in any engine (no RNG, no order sensitivity). Still a
    pure scan-time filter — zero shuffle.
    """
    bp = F.floor(F.col(p_col) * 10000).cast("long")
    gate = F.pmod(
        md5_long32(F.concat_ws(":", F.lit(salt), F.col(key).cast("string"))),
        F.lit(10000),
    )
    return df.filter(gate < bp)


def temporal_split_embargo(
    df: DataFrame,
    ts_col: str,
    cutoff,
    embargo_sec: int,
    out_col: str = "split",
) -> DataFrame:
    """Purged time-series train/test split: ``train`` strictly before
    ``cutoff - embargo``, ``test`` at/after ``cutoff``, and the rows in
    between labeled ``embargo`` — excluded from BOTH sides.

    The embargo is the leakage companion to
    :func:`feat_spark.operators.labels.time_to_event`: a label that
    looks ``H`` seconds forward, computed on a row less than ``H``
    before the cutoff, reads events from the test period — so pass
    ``embargo_sec >= horizon_sec`` and the train labels provably never
    see test time (the same zero-temporal-leakage contract the
    strictly-preceding feature frames and ``plans/audit`` enforce).

    ``cutoff`` is a naive ``datetime`` (or epoch-microsecond int),
    converted to epoch micros by NAIVE arithmetic — identical to how
    the NTZ parquet timestamps are read — so no session-timezone
    setting can shift the boundary. Pure projection: one comparison
    per row, pushes down, zero shuffle.
    """
    import datetime as _dt

    if isinstance(cutoff, _dt.datetime):
        cutoff_us = int(
            (cutoff - _dt.datetime(1970, 1, 1)).total_seconds() * 1_000_000
        )
    else:
        cutoff_us = int(cutoff)
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    train_end = cutoff_us - embargo_sec * 1_000_000
    return df.withColumn(
        out_col,
        F.when(ts_us < train_end, F.lit("train"))
        .when(ts_us >= cutoff_us, F.lit("test"))
        .otherwise(F.lit("embargo")),
    )


def weighted_topk_sample(
    df: DataFrame,
    group_cols: "Sequence[str] | str",
    weight_col: str,
    k: int,
    id_col: str,
    seed: str = "wtk",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, k per group — the
    Efraimidis-Spirakis A-ES scheme: each row draws a deterministic
    uniform ``u`` from its id (md5 — the engine's frozen-randomness
    device) and the k rows with the smallest exponential keys
    ``-ln(u) / w`` are EXACTLY a weight-proportional without-
    replacement sample. :func:`weighted_sample` (Bernoulli) can't
    promise a sample SIZE; per-group quotas + weights need this.

    Fully deterministic and replayable (same ids + seed -> same
    sample on any cluster layout); one hash projection + one per-group
    top-k window (TakeOrdered shape, groups independent). Rows with
    non-positive or NULL weight are excluded by contract — a zero
    weight must never be sampled, and a silent epsilon would fake
    one.

    Output: input columns + ``(srk)`` (the selection key, 1..k rank
    NOT included — callers re-rank if they need order).
    """
    keys = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    from feat_spark.functions.text import md5_long32

    m = 2_147_483_647
    h = F.pmod(
        md5_long32(F.concat_ws(":", F.lit(seed), F.col(id_col).cast("string"))),
        F.lit(m),
    )
    u = (h + 1).cast("double") / F.lit(float(m + 1))
    key = -F.log(u) / F.col(weight_col).cast("double")
    w = Window.partitionBy(*keys).orderBy(
        F.col("__k").asc(), F.col(id_col).asc()
    )
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("__k", key)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
        .withColumnRenamed("__k", "srk")
        .withColumn("srk", F.round(F.col("srk"), 6))
    )


def stratified_kfold(
    df: DataFrame,
    strata_cols: "list[str]",
    id_col: str,
    k: int = 5,
    salt: str = "kfold",
    out_col: str = "fold",
) -> DataFrame:
    """Size-exact stratified k-fold assignment: within every stratum,
    fold sizes differ by at most one — the cross-validation property a
    proportional hash split (:func:`assign_split`) deliberately trades
    away for shuffle-freedom. Folds are frozen-random (md5 of
    ``id || salt``, the module's determinism device), so re-runs and
    external replays agree bit-for-bit, and the id tiebreak makes the
    rank total even under hash collisions.

    ``fold = (rank within stratum by hash) mod k`` — round-robin over
    a hash-shuffled order is exactly balanced AND unbiased w.r.t. any
    data ordering. Cost is honest: one exchange + one sort per stratum
    (size-exactness NEEDS a rank; when proportional-in-expectation is
    enough, assign_split does it with zero shuffle). Strata are the
    window partitions, so skew follows the largest stratum — same
    profile as every per-group rank in this engine.
    """
    h = md5_long32(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    w = Window.partitionBy(*strata_cols).orderBy(h, F.col(id_col))
    return df.withColumn(
        out_col, ((F.row_number().over(w) - 1) % k).cast("int")
    )


def neyman_allocation(
    df: DataFrame,
    stratum_col: str,
    value_cents_col: str,
    budget: int = 1000,
) -> DataFrame:
    """Neyman-optimal stratified sample allocation — given a sampling
    budget, how many rows to draw from each stratum to minimize the
    variance of the estimated total: ``n_h ∝ N_h * s_h`` (big AND
    volatile strata earn samples; a huge constant stratum earns
    almost none). The planning step in front of
    :func:`stratified_sample` when the strata are wildly unequal —
    proportional allocation wastes budget on low-variance strata.

    Exactness: per-stratum N and the variance numerator
    ``n*Σx² - (Σx)²`` are exact decimal(38,0) integers; ``s_h`` is
    one IEEE sqrt of a fixed-order double ratio. The normalizing
    ``Σ N_h s_h`` is a sum of irrational doubles, so it accumulates
    via the repo's sorted-fold device (array_sort + aggregate over
    the stratum list — strata are a bounded dimension, never data
    rows). Allocations floor: the residual (< n_strata rows) is the
    caller's largest-remainder step; single-row / zero-variance
    strata allocate 0 (nothing to estimate).

    Output: ``(stratum, n_rows, stddev, alloc_n)``.
    """
    d = F.col(value_cents_col).cast("decimal(38,0)")
    per = df.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(d).alias("__s"),
        F.sum(d * d).alias("__s2"),
    )
    n = F.col("n_rows").cast("decimal(38,0)")
    var_num = (n * F.col("__s2") - F.col("__s") * F.col("__s")).cast("double")
    var_den = (n * (n - 1)).cast("double")
    s = F.when(F.col("n_rows") >= 2, F.sqrt(var_num / var_den)).otherwise(
        F.lit(0.0)
    )
    per = per.withColumn("stddev", s).withColumn(
        "__w", F.col("n_rows").cast("double") * F.col("stddev")
    )
    tot = per.agg(
        F.aggregate(
            F.array_sort(
                F.collect_list(F.struct(F.col("stratum"), F.col("__w")))
            ),
            F.lit(0.0),
            lambda acc, x: acc + x["__w"],
        ).alias("__tot")
    )
    j = per.crossJoin(F.broadcast(tot))  # 1-row total (cuped class)
    return j.select(
        "stratum",
        "n_rows",
        F.round(F.col("stddev"), 9).alias("stddev"),
        F.when(
            F.col("__tot") > 0,
            F.floor(
                F.lit(float(budget)) * F.col("__w") / F.col("__tot")
            ).cast("long"),
        )
        .otherwise(F.lit(0))
        .alias("alloc_n"),
    )


def class_balance_sample(
    df: DataFrame,
    label_col: str,
    id_col: str,
) -> DataFrame:
    """Deterministic majority-class downsampling to a balanced binary
    frame — keep every minority row, hash-thin the majority to the
    minority's count IN EXPECTATION: the standard rebalancing step
    before training on rare-event labels, with the repo's frozen-hash
    discipline instead of a RNG (same input ⇒ same sample, any
    cluster size, any partitioning — reproducible experiments).

    The keep rule is pure integer arithmetic: a majority row survives
    iff ``md5_long32(id) % n_major < n_minor`` — exact class counts
    arrive via a 2-row broadcast, the data pass is a scan filter,
    NOTHING shuffles. (Hash thinning is Bernoulli-exact in rate, not
    count — the residual count jitter is O(sqrt(n)) and documented;
    exact-count sampling would need a global sort by hash.)

    Output: the surviving rows, original columns unchanged.
    """
    from feat_spark.functions.text import md5_long32

    y = F.col(label_col).cast("long")
    counts = df.groupBy(y.alias("__y")).agg(F.count(F.lit(1)).alias("__n"))
    # identify the minority label value itself (2-row frame -> 1 row)
    lab = counts.orderBy(F.col("__n").asc(), F.col("__y").asc()).limit(1).select(
        F.col("__y").alias("__min_label"), F.col("__n").alias("__n_min")
    )
    maxn = counts.agg(F.max("__n").alias("__n_max"))
    j = df.crossJoin(F.broadcast(lab)).crossJoin(F.broadcast(maxn))
    h = F.pmod(md5_long32(F.col(id_col).cast("string")), F.col("__n_max"))
    keep = (y == F.col("__min_label")) | (h < F.col("__n_min"))
    return j.filter(keep).drop("__min_label", "__n_min", "__n_max")
