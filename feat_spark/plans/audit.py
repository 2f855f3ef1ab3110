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

from pyspark.sql import DataFrame
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
