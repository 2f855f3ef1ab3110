"""Temporal-leakage audit (BASELINE.json north_star: "a leakage audit
asserting no feature reads ts' > ts").

Two independent proof obligations:

* :func:`assert_no_future_reads` — runtime check on as-of output: every
  matched right timestamp must satisfy ``ts' <= ts`` (or ``<``). Runs
  as one aggregate over the joined frame, i.e. O(rows) with no extra
  shuffle beyond the join itself.

* :func:`truncation_invariance` — the stronger property: recompute the
  pipeline with all *future* source rows (ts > cutoff) mutated or
  dropped and assert features at ``ts <= cutoff`` are unchanged. This
  catches leaks the matched-ts check can't see (e.g. a window frame
  that peeks forward). Used by tests (perturbation fixture,
  FIXTURES.md §A oracle note) and by CI-style smoke runs at small SF.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


class LeakageError(AssertionError):
    pass


def assert_no_future_reads(
    joined: DataFrame,
    ts_col: str = "ts",
    matched_ts_col: str = "matched_ts",
    allow_exact: bool = True,
) -> int:
    """Raise LeakageError if any row's matched source timestamp is in
    the row's future; returns the number of matched rows checked."""
    cmp = (
        F.col(matched_ts_col) > F.col(ts_col)
        if allow_exact
        else F.col(matched_ts_col) >= F.col(ts_col)
    )
    agg = joined.select(
        F.count(matched_ts_col).alias("n"),
        F.sum(cmp.cast("long")).alias("bad"),
    ).collect()[0]
    if (agg["bad"] or 0) > 0:
        raise LeakageError(
            f"{agg['bad']} of {agg['n']} matched rows read a future timestamp"
        )
    return agg["n"]


def truncation_invariance(
    pipeline: Callable[[DataFrame], DataFrame],
    source: DataFrame,
    cutoff,
    ts_col: str = "ts",
    key_cols: tuple = ("conv_id", "turn_idx"),
) -> None:
    """Assert ``pipeline`` output at rows ``ts <= cutoff`` is identical
    whether or not post-cutoff source rows exist. ``pipeline`` must be a
    pure function of its input frame."""
    full = pipeline(source).filter(F.col(ts_col) <= F.lit(cutoff))
    truncated = pipeline(source.filter(F.col(ts_col) <= F.lit(cutoff)))
    diff = full.exceptAll(truncated).count() + truncated.exceptAll(full).count()
    if diff:
        raise LeakageError(
            f"{diff} feature rows at ts<={cutoff} depend on future source rows"
        )


def table_fingerprint(
    df: DataFrame,
    group_by: str | None = None,
    sentinel: str = "\x1e",
) -> DataFrame:
    """Order-independent content checksum of a relation — the audit
    primitive behind snapshot promotion ("is the table the warehouse
    just rebuilt byte-identical to the one the other engine / the
    yesterday job produced?") and the cheap first gate before a full
    :func:`feat_spark.plans.snapshot.snapshot_diff`.

    Every column is rendered to a string (NULL -> an RS control-char
    sentinel so ``('a', NULL)`` never collides with ``('a',)``),
    md5-hashed, and the per-row hashes are SUMMED as ``decimal(38,0)``
    — addition commutes, so the checksum is independent of row order,
    partitioning, and merge strategy, which is precisely what lets two
    engines (or two cluster layouts) agree on it. A mismatched
    fingerprint localizes to the ``group_by`` partition that differs.

    CALLER CONTRACT: rendering must be engine-portable, so the input
    frame should already expose portable column types — integers,
    strings, decimals (cast doubles to a fixed-scale decimal first),
    and epoch integers instead of raw timestamps. This function
    renders what it is given; it does not guess at float formatting.

    Output: one row per group — ``(group, n_rows, fingerprint)`` — or
    a single global row when ``group_by`` is None. Plan: scan ->
    narrow projection -> one partial-agg groupBy. No shuffle wider
    than the group cardinality; at 100 TB the map side reduces
    everything to one tiny frame.
    """
    cols = [c for c in df.columns if c != group_by]
    rendered = [
        F.coalesce(F.col(c).cast("string"), F.lit(sentinel)) for c in cols
    ]
    from feat_spark.functions.text import md5_long32

    h = md5_long32(F.concat_ws("|", *rendered)).cast("decimal(38,0)")
    keys = [group_by] if group_by else []
    out = df.select(*keys, h.alias("__h")).groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("__h").cast("decimal(38,0)").alias("fingerprint"),
    )
    return out


def sequence_audit(
    df: DataFrame,
    entity_col: str,
    ts_col: str = "ts",
    seq_col: str = "event_id",
) -> DataFrame:
    """Per-entity sequence-integrity profile — the ingest QC a
    transcript pipeline runs before trusting ``(conv_id, turn_idx,
    ts)`` ordering: are timestamps ever tied (ambiguous order), does
    the sequence column run backwards in time order (clock skew /
    replays), and how large is the biggest silence gap.

    Order is the stable ``(ts, seq)`` contract the whole engine uses;
    every statistic is integer epoch-micro arithmetic over one lag
    window, so the numbers are engine-exact. One shuffle on the
    entity key; the window and the final agg share its partitioning.

    Output per entity: ``n_events``, ``n_ts_collisions`` (rows whose
    ts equals the previous row's), ``n_seq_inversions`` (rows whose
    seq is below the previous row's — id order disagrees with time
    order), ``max_gap_us`` (largest inter-event silence, 0 for
    singleton entities).
    """
    from pyspark.sql import Window

    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy("__e").orderBy("__t", "__q")
    base = df.select(
        F.col(entity_col).alias("__e"),
        us.alias("__t"),
        F.col(seq_col).alias("__q"),
    )
    lagged = base.select(
        "__e",
        "__t",
        "__q",
        F.lag("__t").over(w).alias("__pt"),
        F.lag("__q").over(w).alias("__pq"),
    )
    return lagged.groupBy("__e").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.coalesce(
            F.sum((F.col("__t") == F.col("__pt")).cast("long")), F.lit(0)
        )
        .cast("long")
        .alias("n_ts_collisions"),
        F.coalesce(
            F.sum((F.col("__q") < F.col("__pq")).cast("long")), F.lit(0)
        )
        .cast("long")
        .alias("n_seq_inversions"),
        F.coalesce(F.max(F.col("__t") - F.col("__pt")), F.lit(0))
        .cast("long")
        .alias("max_gap_us"),
    ).select(
        F.col("__e").alias(entity_col),
        "n_events",
        "n_ts_collisions",
        "n_seq_inversions",
        "max_gap_us",
    )


def fk_coverage(
    child: DataFrame,
    child_key: str,
    parent: DataFrame,
    parent_key: str,
    relation: str,
) -> DataFrame:
    """Referential-integrity profile of one foreign-key edge — the
    join-key coverage audit a feature pipeline runs before trusting an
    enrichment join (an orphaned fact row silently becomes NULL
    features downstream).

    One distinct-project of the parent key, one left equi-join, one
    aggregate: NULL child keys are counted separately (they are not
    orphans — they never tried to join), ``coverage`` is the matched
    share of NON-null keys rounded to 6dp (NULL when every key is
    null). The join is plain equi — AQE broadcasts dimension-sized
    parents on its own; nothing here pins a 100 TB parent into a
    broadcast.

    Output: one row ``(relation, n_rows, n_null_keys, n_orphans,
    coverage)`` — union several calls for a full FK report.
    """
    pk = parent.select(F.col(parent_key).alias("__k")).distinct().withColumn(
        "__hit", F.lit(1)
    )
    j = child.select(F.col(child_key).alias("__k")).join(pk, "__k", "left")
    nn = F.sum(F.col("__k").isNotNull().cast("long"))
    orph = F.sum(
        (F.col("__k").isNotNull() & F.col("__hit").isNull()).cast("long")
    )
    agg = j.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.coalesce(F.sum(F.col("__k").isNull().cast("long")), F.lit(0))
        .cast("long")
        .alias("n_null_keys"),
        F.coalesce(orph, F.lit(0)).cast("long").alias("n_orphans"),
        F.coalesce(nn, F.lit(0)).cast("long").alias("__nn"),
    )
    return agg.select(
        F.lit(relation).alias("relation"),
        "n_rows",
        "n_null_keys",
        "n_orphans",
        F.when(
            F.col("__nn") > 0,
            F.round(1.0 - F.col("n_orphans") / F.col("__nn"), 6),
        ).alias("coverage"),
    )


def expectation_report(
    df: DataFrame,
    unique: "list[list[str]] | None" = None,
    not_null: "list[str] | None" = None,
    in_set: "dict[str, list] | None" = None,
    between: "dict[str, tuple] | None" = None,
) -> DataFrame:
    """Declarative data-contract checks — the dbt-test / Great
    Expectations surface: uniqueness of key tuples, non-null columns,
    accepted value sets, and numeric ranges, reported as ONE
    violations table instead of a pass/fail exception, so pipelines
    can gate on it (`filter(~passed)`) and monitors can trend it.

    Cost model: every row-level check (not_null / in_set / between)
    folds into a SINGLE full-scan aggregation — adding a check adds a
    conditional-sum expression, not a pass. Uniqueness checks ride the
    same aggregate as exact ``countDistinct`` expressions (Spark
    expands them map-side; one shuffle total for the whole report).
    NULL semantics are literal and per-check: NULL is not in any set
    and not between any bounds, so it violates in_set/between; rows
    with a NULL key column count against unique (count_distinct skips
    them, so they can never pair-up into a distinct key).

    Output: ``(check, n_violations, n_rows, passed)``, one row per
    declared expectation, check names stable
    (``unique:a,b`` / ``not_null:c`` / ``in_set:c`` / ``between:c``).
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    names: list[str] = []

    def viol(name: str, cond) -> None:
        names.append(name)
        aggs.append(
            F.sum(F.when(cond, 1).otherwise(0)).alias(f"__v{len(names)}")
        )

    for col in not_null or []:
        viol(f"not_null:{col}", F.col(col).isNull())
    for col, vals in (in_set or {}).items():
        viol(f"in_set:{col}", ~F.col(col).isin(list(vals))
             | F.col(col).isNull())
    for col, (lo, hi) in (between or {}).items():
        viol(
            f"between:{col}",
            ~F.col(col).between(F.lit(lo), F.lit(hi)) | F.col(col).isNull(),
        )
    uniq_names: list[str] = []
    for cols in unique or []:
        uniq_names.append("unique:" + ",".join(cols))
        aggs.append(
            F.count_distinct(*[F.col(c) for c in cols]).alias(
                f"__u{len(uniq_names)}"
            )
        )
    row = df.agg(*aggs)
    outs = []
    for i, name in enumerate(names, start=1):
        outs.append(
            row.select(
                F.lit(name).alias("check"),
                F.col(f"__v{i}").alias("n_violations"),
                F.col("__n").alias("n_rows"),
            )
        )
    for i, name in enumerate(uniq_names, start=1):
        outs.append(
            row.select(
                F.lit(name).alias("check"),
                (F.col("__n") - F.col(f"__u{i}")).alias("n_violations"),
                F.col("__n").alias("n_rows"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.withColumn("passed", F.col("n_violations") == 0)


def split_leakage(
    df: DataFrame,
    split_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-split contamination audit — content that appears in MORE
    THAN ONE split (train text leaking into test through exact or
    near-exact duplicates), the eval-integrity failure that inflates
    benchmark numbers silently. :mod:`operators.decontam` checks a
    corpus against an EXTERNAL benchmark; this checks a corpus against
    its own split assignment — run it after
    :func:`~feat_spark.operators.sampling.split_assign` and before
    anyone reports a holdout metric.

    Fingerprint = md5 of the canonical text form
    (:func:`~feat_spark.functions.text.canonical_text`), so case /
    punctuation / whitespace variants leak-match just like they
    dup-match in ``dedup_exact_canonical``. One hash projection + one
    fingerprint-keyed aggregation; only leaking fingerprints (distinct
    splits > 1) survive, so the report is duplicate-sized, not
    corpus-sized.

    Output: ``(content_hash, n_docs, n_splits, splits)`` — ``splits``
    is the sorted comma-joined distinct split list (stable across
    engines and partitionings).
    """
    from feat_spark.functions.text import canonical_text

    h = df.select(
        F.col(id_col),
        F.col(split_col).alias("__s"),
        F.md5(canonical_text(text_col)).alias("content_hash"),
    )
    agg = h.groupBy("content_hash").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("__s").alias("n_splits"),
        F.array_join(F.array_sort(F.collect_set("__s")), ",").alias(
            "splits"
        ),
    )
    return agg.filter(F.col("n_splits") > 1)


def fd_check(
    df: DataFrame,
    pairs: "list[tuple[str, str]]",
) -> DataFrame:
    """Functional-dependency audit — for each declared ``A -> B``
    ("order id determines customer", "SKU determines category"), how
    many A-keys map to MORE than one distinct B: the schema-semantics
    twin of :func:`fk_coverage` (that one checks keys exist; this one
    checks keys MEAN one thing), and the profiling step that catches
    silently denormalized joins and dirty dimension merges.

    One exact ``count_distinct(B) group by A`` per declared pair (a
    partial-aggregatable shuffle on A), then a 1-row summary each,
    unioned long. Violations report the worst fan-out too —
    ``max_distinct = 1`` for a clean FD, 2+ localizes how bad.

    Output: ``(fd, n_keys, n_violating, max_distinct)``.
    """
    outs = []
    for det, dep in pairs:
        per = df.groupBy(det).agg(
            F.count_distinct(dep).alias("__nd")
        )
        outs.append(
            per.agg(
                F.count(F.lit(1)).alias("n_keys"),
                F.sum((F.col("__nd") > 1).cast("long")).alias(
                    "n_violating"
                ),
                F.max("__nd").alias("max_distinct"),
            ).select(
                F.lit(f"{det}->{dep}").alias("fd"),
                "n_keys",
                "n_violating",
                "max_distinct",
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def join_cardinality_audit(
    left: DataFrame,
    right: DataFrame,
    key: str,
    top_k: int = 20,
) -> DataFrame:
    """Pre-join blast-radius audit: for each join key, how many rows
    each side holds and how many output rows the equi-join would emit
    — the pre-flight that catches the accidental many-to-many before
    it runs for six hours at 100 TB (a single key with 10^5 rows on
    both sides emits 10^10 rows; this report names that key BEFORE the
    join does).

    One count agg per side (partial-agg map-side collapse), an inner
    join of the two KEY-GRAIN count frames (dimension-sized), and a
    TakeOrdered top-``top_k`` by projected output rows — no global
    sort, no touch of the fact rows beyond the two aggs. NULL keys are
    excluded (equi-joins drop them anyway).

    Output: ``(join_key, n_left, n_right, out_rows)``, the ``top_k``
    heaviest keys, ordered for stable comparison by
    ``(out_rows DESC, join_key)``.
    """
    lc = (
        left.filter(F.col(key).isNotNull())
        .groupBy(F.col(key).alias("join_key"))
        .agg(F.count(F.lit(1)).alias("n_left"))
    )
    rc = (
        right.filter(F.col(key).isNotNull())
        .groupBy(F.col(key).alias("join_key"))
        .agg(F.count(F.lit(1)).alias("n_right"))
    )
    return (
        lc.join(rc, "join_key")
        .withColumn("out_rows", (F.col("n_left") * F.col("n_right")).cast("long"))
        .orderBy(F.col("out_rows").desc(), F.col("join_key"))
        .limit(top_k)
    )


def k_anonymity_audit(
    df: DataFrame,
    quasi_cols: "list[str]",
    k: int = 5,
) -> DataFrame:
    """k-anonymity violation report over a quasi-identifier tuple:
    every combination of ``quasi_cols`` values shared by FEWER than
    ``k`` rows, with its group size and re-identification risk
    ``1/n`` — the release-gate audit run before publishing an
    "anonymized" extract (a quasi-identifier group of size 1 IS an
    identification).

    ONE partial-agg pass keyed by the quasi tuple; the report is
    violation-sized, not data-sized (compliant groups never leave the
    reducers). NULL is treated as a value — two rows that both lack a
    zip code still look alike to an attacker, which is the honest
    reading.
    """
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") < k)
        .select(
            *quasi_cols,
            F.col("n").cast("long").alias("n"),
            F.round(F.lit(1.0) / F.col("n"), 6).alias("risk"),
        )
    )


def l_diversity_audit(
    df: DataFrame,
    quasi_cols: "list[str]",
    sensitive_col: str,
    l: int = 2,
) -> DataFrame:
    """l-diversity violation report — k-anonymity's blind spot: a
    quasi-identifier group can be large (k-compliant) yet have every
    member share ONE sensitive value, so membership alone discloses
    it (the homogeneity attack). This reports every quasi group whose
    sensitive attribute carries FEWER than ``l`` distinct values,
    with its size and the majority value's share (1.0 = total
    disclosure).

    Same single-pass shape as :func:`k_anonymity_audit`: one agg
    keyed by the quasi tuple carrying exact ``count`` +
    ``count_distinct`` + the deterministic majority share (max count
    over a (quasi, sensitive) pre-agg, ties irrelevant to the SHARE).
    NULL sensitive values count as a value — "field withheld" is
    itself a disclosure class.

    Output: quasi cols + ``(n, n_distinct_sensitive,
    majority_share)`` for violating groups only.
    """
    cells = df.groupBy(
        *quasi_cols, F.col(sensitive_col).alias("__s")
    ).agg(F.count(F.lit(1)).alias("__c"))
    g = cells.groupBy(*quasi_cols).agg(
        F.sum("__c").alias("n"),
        F.count(F.lit(1)).alias("n_distinct_sensitive"),
        F.max("__c").alias("__mx"),
    )
    return g.filter(F.col("n_distinct_sensitive") < l).select(
        *quasi_cols,
        F.col("n").cast("long").alias("n"),
        F.col("n_distinct_sensitive").cast("long").alias(
            "n_distinct_sensitive"
        ),
        F.round(
            F.col("__mx").cast("double") / F.col("n").cast("double"), 9
        ).alias("majority_share"),
    )


def scd_overlap_audit(
    dim: DataFrame,
    key_col: str,
    from_col: str = "valid_from",
    to_col: str = "valid_to",
) -> DataFrame:
    """SCD-2 validity-interval overlap audit — pairs of consecutive
    rows per key whose intervals overlap (this row starts before the
    previous one ends): THE classic dimension-table corruption, and
    the one that silently double-joins every as-of lookup that lands
    in the overlap. Open-ended current rows (NULL ``to``) overlap
    everything after them by definition.

    One window (lag of the previous row's end over the per-key
    interval order) + one predicate — violation-sized output:
    ``(key, valid_from, prev_valid_to)`` rows where
    ``valid_from < prev_valid_to`` (NULL-safe: a NULL previous end is
    treated as infinity). Zero output = a clean dimension; feed it to
    ``expectation_report`` semantics as a release gate.
    """
    w = Window.partitionBy(key_col).orderBy(from_col, to_col)
    flagged = dim.withColumn("prev_valid_to", F.lag(to_col).over(w)) \
        .withColumn("__prev_from", F.lag(from_col).over(w))
    open_prev = (
        F.col("prev_valid_to").isNull() & F.col("__prev_from").isNotNull()
    )
    return flagged.filter(
        open_prev | (F.col(from_col) < F.col("prev_valid_to"))
    ).select(key_col, from_col, "prev_valid_to")
