"""Declarative feature-matrix builder — the user-facing API of the
point-in-time engine.

The flagship pipeline (as-of attrs -> stable order -> lag -> cumulative
-> session) is the composition every feature job wants; this module
turns it from hand-written plumbing into a spec:

    spec = FeatureMatrixSpec(
        entity="user_id", ts="ts", tiebreak=("event_id",),
        asof=[AsofSource(orders_df, value_cols=["o_totalprice"])],
        lags={"value": [1, 2]},
        cumulative={"value": ["count", "sum"]},
        rolling={"value": {"duration": "1 hour", "fns": ["sum"]}},
        session_gap="30 minutes",
    )
    wide = build_feature_matrix(events_df, spec)

Composition rules (the load-bearing ones, enforced here once instead of
re-derived per job):

* **as-of FIRST** — its union-window shuffle hash-partitions by the
  entity, and every window after it reuses that ONE exchange;
* **one sort** — all ordered windows share the ``(ts, *tiebreak)``
  ordering, so the whole matrix costs one exchange + one sort after
  the scan (the flagship plan, verified by plancheck exchange caps);
* **leakage stance** — only backward-looking constructs are exposed:
  lags, *preceding-frame* cumulatives, trailing time windows,
  strictly-preceding decayed sums and rolling z-scores, as-of
  backward matches. Lead columns (labels) are deliberately NOT part of
  a feature matrix spec; use ``lag_lead_features(leads=True)``
  directly when building targets, so a spec can never smuggle future
  data into features (the north rule's zero-temporal-leakage claim is
  structural, not reviewed-per-job).

Every feature column is produced by an operator with its own driver
gate; the `feature_matrix` gate checks the COMPOSITION against a single
SQL twin.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from feat_spark.operators.asof import asof_join
from feat_spark.operators.sessionize import sessionize
from feat_spark.operators.windows import (
    cumulative_features,
    decayed_sum,
    lag_lead_features,
    rolling_zscore,
    time_range_features,
    with_stable_order,
)


@dataclass
class AsofSource:
    """A point-in-time attribute source: the latest ``value_cols`` row
    of ``df`` at-or-before each event's timestamp (backward as-of)."""

    df: DataFrame
    value_cols: Sequence[str]
    ts: str = "ts"
    strategy: str = "union_window"
    tolerance: str | None = None


@dataclass
class FeatureMatrixSpec:
    entity: str = "conv_id"
    ts: str = "ts"
    tiebreak: Sequence[str] = ()
    #: point-in-time attribute joins, applied in order
    asof: Sequence[AsofSource] = field(default_factory=list)
    #: {col: [offsets]} -> {col}_lag{k}
    lags: Mapping[str, Sequence[int]] = field(default_factory=dict)
    #: {col: [fns]} running aggregates over preceding+current rows
    cumulative: Mapping[str, Sequence[str]] = field(default_factory=dict)
    #: strictest stance: cumulative frames end at the PREVIOUS row
    cumulative_exclude_current: bool = False
    #: {col: {"duration": "1 hour", "fns": [...]}} trailing time windows
    rolling: Mapping[str, Mapping] = field(default_factory=dict)
    #: {col: {"half_life_days": 7}} recency-weighted running sums over
    #: strictly preceding rows -> {col}_decay{H}d (backward-looking)
    decay: Mapping[str, Mapping] = field(default_factory=dict)
    #: {col: {"n": 20, "min_periods": 5, "sigma": 3.0}} rolling z-score
    #: vs strictly preceding rows -> {col}_roll_mean/_roll_std/_zscore/
    #: _is_anomaly (backward-looking)
    zscore: Mapping[str, Mapping] = field(default_factory=dict)
    #: gap sessionization -> session_id (None = skip)
    session_gap: str | None = None
    #: dense per-entity sequence column (None = skip)
    seq_col: str | None = "turn_seq"


def spec_from_dict(d: Mapping, asof_sources: Sequence[AsofSource] = ()) -> FeatureMatrixSpec:
    """Build a spec from a plain dict (the JSON a spark-submit job
    ships next to its code). As-of sources carry DataFrames, so they
    are supplied by the caller, not the JSON.

    Unknown keys raise — a typo'd spec key silently producing a matrix
    without the intended feature is the worst possible failure mode.
    """
    allowed = {
        "entity", "ts", "tiebreak", "lags", "cumulative",
        "cumulative_exclude_current", "rolling", "decay", "zscore",
        "session_gap", "seq_col",
    }
    unknown = set(d) - allowed
    if unknown:
        raise ValueError(f"unknown spec keys: {sorted(unknown)}")
    kw = dict(d)
    if "tiebreak" in kw:
        kw["tiebreak"] = tuple(kw["tiebreak"])
    return FeatureMatrixSpec(asof=list(asof_sources), **kw)


def build_feature_matrix(df: DataFrame, spec: FeatureMatrixSpec) -> DataFrame:
    """Compose the spec into one wide frame, one exchange + one sort."""
    out = df
    for src in spec.asof:
        out = asof_join(
            out,
            src.df,
            on=spec.entity,
            left_ts=spec.ts,
            right_ts=src.ts,
            value_cols=list(src.value_cols),
            strategy=src.strategy,
            tolerance=src.tolerance,
        )
    # rolling FIRST: its range frame sorts by unix_micros(ts), a
    # different sort key than the (ts, *tiebreak) the row-ordered
    # windows share. Emitting it before them means the plan sorts each
    # ordering once; interleaved, Catalyst re-sorts the big frame back
    # and forth (measured: one extra full Sort node on the fact side)
    for col, conf in spec.rolling.items():
        out = time_range_features(
            out,
            {col: list(conf["fns"])},
            duration=conf.get("duration", "1 hour"),
            partition=spec.entity,
            ts=spec.ts,
        )
    if spec.seq_col:
        out = with_stable_order(
            out,
            partition=spec.entity,
            order=(spec.ts,),
            tiebreak=spec.tiebreak,
            out_col=spec.seq_col,
        )
    if spec.lags:
        for col, offsets in spec.lags.items():
            out = lag_lead_features(
                out,
                cols=[col],
                offsets=list(offsets),
                partition=spec.entity,
                order=(spec.ts,),
                tiebreak=spec.tiebreak,
                leads=False,
            )
    if spec.cumulative:
        out = cumulative_features(
            out,
            spec.cumulative,
            partition=spec.entity,
            order=(spec.ts,),
            tiebreak=spec.tiebreak,
            include_current=not spec.cumulative_exclude_current,
        )
    for col, conf in spec.decay.items():
        h = int(conf.get("half_life_days", 7))
        out = decayed_sum(
            out,
            value_col=col,
            keys=spec.entity,
            ts=spec.ts,
            tiebreak=spec.tiebreak,
            half_life_days=h,
            out_col=f"{col}_decay{h}d",
        )
    for col, conf in spec.zscore.items():
        out = rolling_zscore(
            out,
            value_col=col,
            keys=spec.entity,
            order=(spec.ts, *spec.tiebreak),
            n=int(conf.get("n", 20)),
            min_periods=int(conf.get("min_periods", 5)),
            sigma=float(conf.get("sigma", 3.0)),
            prefix=f"{col}_",
        )
    if spec.session_gap:
        out = sessionize(
            out,
            gap=spec.session_gap,
            partition=spec.entity,
            ts=spec.ts,
            tiebreak=spec.tiebreak,
        )
    return out


def freshness_slo(
    left: DataFrame,
    rhs: DataFrame,
    on: str,
    segment_col: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    slo_days: int = 7,
) -> DataFrame:
    """Feature-freshness SLO report — for a point-in-time enrichment
    (the engine's as-of join), how STALE are the features actually
    served: per segment, the match rate, the mean staleness in whole
    days, and the share of matches inside the freshness SLO. The
    operational complement of ``plans/audit.leakage_audit`` (that one
    proves staleness is never NEGATIVE — no future reads; this one
    reports how positive it is, which is what a feature-store SLO
    dashboard tracks).

    One as-of join (the union-window machinery, unchanged), one agg.
    Staleness is integer whole days (``div`` on microsecond
    integers); the mean is ONE division of exact integers; rates are
    count ratios. Unmatched rows count against ``match_rate`` but not
    against staleness (no match has no age).

    Output: ``(segment, n_rows, n_matched, match_rate,
    avg_staleness_days, within_slo_rate)``.
    """
    j = asof_join(
        left,
        rhs,
        on=on,
        left_ts=left_ts,
        right_ts=right_ts,
        value_cols=[],
        include_matched_ts=True,
    )
    days = F.expr(
        f"(unix_micros(cast({left_ts} as timestamp)) - "
        f"unix_micros(cast(matched_ts as timestamp))) div 86400000000"
    )
    g = j.groupBy(F.col(segment_col).alias("segment")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("matched_ts").alias("n_matched"),
        F.sum(days).alias("__sd"),
        F.sum((days <= slo_days).cast("long")).alias("__ok"),
    )
    return g.select(
        "segment",
        "n_rows",
        "n_matched",
        F.round(
            F.col("n_matched").cast("double") / F.col("n_rows").cast("double"),
            9,
        ).alias("match_rate"),
        F.when(
            F.col("n_matched") > 0,
            F.round(
                F.col("__sd").cast("double")
                / F.col("n_matched").cast("double"),
                9,
            ),
        ).alias("avg_staleness_days"),
        F.when(
            F.col("n_matched") > 0,
            F.round(
                F.col("__ok").cast("double")
                / F.col("n_matched").cast("double"),
                9,
            ),
        ).alias("within_slo_rate"),
    )
