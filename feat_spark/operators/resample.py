"""Regular-grid resampling with linear interpolation.

Feature pipelines want entity time series on a REGULAR grid (one row
per entity-day) while event logs are irregular; carrying forward the
last value (``operators/windows.py`` ffill) is right for state-like
signals, but magnitude-like signals (balances, scores, gauges) want
the straight line between the surrounding observations — the standard
"resample + interpolate" step.

Fully relational, no iteration:

1. reduce to day grain — the LAST observation per (key, day) by
   ``(ts, tiebreak)`` (one window over event grain);
2. build each key's day spine ``sequence(min_day, max_day)`` — the
   explode is bounded by the calendar, not the event count;
3. two frames over the spine: previous observed (day, value) via
   ``last(..., ignorenulls)`` over unbounded-preceding, next observed
   via ``first(..., ignorenulls)`` over unbounded-following;
4. one closed-form projection:
   ``v = (pc*(nd-d) + nc*(d-pd)) / (nd-pd)``.

Scale shape: one exchange on the key for the day-grain window, then
the spine frames reuse the same partitioning (plancheck: window
specs share one hashpartitioning). Spine grain is entity×days — a
GRAIN REDUCTION from the event log (the active_days device), so the
windows run over the small frame. No extrapolation: days before the
first / after the last observation do not exist in the spine, and the
endpoints are observed by construction (``pd``/``nd`` never NULL).

Determinism: values quantize to integer cents FIRST (``round(v*100)``
— the repo-wide exact-cents device); ``pc*(nd-d) + nc*(d-pd)`` is
exact integer arithmetic (< 2^53), one double division, one /100.0,
rounded 6dp — bit-replayable by DuckDB running the same shape. Day
index is ``epoch_us div 86_400_000_000`` (integer division; event
clocks are post-1970 by contract, so floor == truncate).

Lives OUTSIDE the flagship benchmark closure on purpose (see
``operators/eventops.py`` for the rule).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_US_PER_DAY = 86_400_000_000


def interpolate_daily(
    df: DataFrame,
    key_cols: "Sequence[str] | str",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak: "Sequence[str]" = ("event_id",),
) -> DataFrame:
    """Daily grid per key with linear interpolation between observed
    days. Returns ``(keys..., day, value_interp, observed)`` where
    ``day`` is the epoch-day index and ``value_interp`` carries the
    observed value (exact) on observed days."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    base = df.select(
        *keys,
        us.alias("__us"),
        F.expr(
            f"unix_micros(cast({ts_col} as timestamp)) div {_US_PER_DAY}"
        ).alias("day"),
        F.round(F.col(value_col) * 100).cast("long").alias("__c"),
        *[F.col(c) for c in tiebreak],
    )
    wday = Window.partitionBy(*keys, "day").orderBy(
        F.col("__us").desc(), *[F.col(c).desc() for c in tiebreak]
    )
    obs = (
        base.withColumn("__rn", F.row_number().over(wday))
        .filter(F.col("__rn") == 1)
        .select(*keys, "day", "__c")
    )
    span = obs.groupBy(*keys).agg(
        F.min("day").alias("__lo"), F.max("day").alias("__hi")
    )
    spine = span.select(
        *keys, F.explode(F.sequence("__lo", "__hi")).alias("day")
    )
    g = spine.join(obs, keys + ["day"], "left")

    prev_w = (
        Window.partitionBy(*keys)
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    next_w = (
        Window.partitionBy(*keys)
        .orderBy("day")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    seen = F.col("__c").isNotNull()
    pd_ = F.last(F.when(seen, F.col("day")), ignorenulls=True).over(prev_w)
    pc = F.last("__c", ignorenulls=True).over(prev_w)
    nd = F.first(F.when(seen, F.col("day")), ignorenulls=True).over(next_w)
    nc = F.first("__c", ignorenulls=True).over(next_w)

    interp = (
        (pc * (nd - F.col("day")) + nc * (F.col("day") - pd_))
        / (nd - pd_)
        / F.lit(100.0)
    )
    return g.select(
        *keys,
        "day",
        F.round(
            F.when(seen, F.col("__c") / F.lit(100.0)).otherwise(interp), 6
        ).alias("value_interp"),
        seen.alias("observed"),
    )


def seasonal_decompose_daily(
    df: DataFrame,
    day_col: str,
    value_cents_col: str,
    period: int = 7,
) -> DataFrame:
    """Classical additive seasonal decomposition of a daily series —
    ``value = trend + seasonal + remainder`` with a centered
    ``period``-day moving-average trend and day-of-period seasonal
    indexes: the readout that separates "the metric is growing" from
    "it's just Saturday" before :func:`seasonal_anomaly`-style alerts
    fire. STL's heavy loess loops buy robustness this closed form
    doesn't need at audit granularity.

    Exactness device — multiply through by the period: the trend is
    ``sum_period / period`` where the windowed sum of integer cents is
    EXACT, so the detrended series is kept as the exact integer
    ``period*value - sum_period`` and the seasonal index closes as
    ``sum(detrended_x7) / (period * n)`` — integer sums all the way,
    ONE division per day-of-period, no float accumulation anywhere.
    Per-row readouts (trend, seasonal, remainder) are fixed-order
    double expressions off those exact integers, 9dp. Edge days
    without a full centered window get NULL trend/remainder (the
    honest boundary) and are EXCLUDED from the seasonal fit.

    The series is one row per day — a window over a single ordered
    partition of n_days rows (grain-reduce first; this operator takes
    the series, not the events). Output:
    ``(day, value_cents, trend, seasonal, remainder)``.
    """
    half = period // 2
    w = Window.orderBy(F.col(day_col).asc()).rowsBetween(-half, half)
    base = df.select(
        F.col(day_col).cast("long").alias("day"),
        F.col(value_cents_col).cast("long").alias("value_cents"),
    )
    t = base.withColumn("__n_win", F.count(F.lit(1)).over(w)).withColumn(
        "__sum_win", F.sum("value_cents").over(w)
    )
    t = t.withColumn(
        "__det",
        F.when(
            F.col("__n_win") == period,
            F.lit(period) * F.col("value_cents") - F.col("__sum_win"),
        ),
    ).withColumn("__dop", F.pmod(F.col("day"), F.lit(period)))
    sea = (
        t.filter(F.col("__det").isNotNull())
        .groupBy("__dop")
        .agg(
            F.sum("__det").alias("__sdet"),
            F.count(F.lit(1)).alias("__ndet"),
        )
        .select(
            "__dop",
            (
                F.col("__sdet").cast("double")
                / (F.lit(float(period)) * F.col("__ndet").cast("double"))
            ).alias("__seasonal_raw"),
        )
    )
    out = t.join(F.broadcast(sea), "__dop", "left")
    trend = F.col("__sum_win").cast("double") / F.lit(float(period))
    return out.select(
        "day",
        "value_cents",
        F.when(F.col("__n_win") == period, F.round(trend, 9)).alias("trend"),
        F.round(F.col("__seasonal_raw"), 9).alias("seasonal"),
        F.when(
            F.col("__n_win") == period,
            F.round(
                F.col("value_cents").cast("double")
                - trend
                - F.col("__seasonal_raw"),
                9,
            ),
        ).alias("remainder"),
    )


def seasonal_outliers(
    df: DataFrame,
    day_col: str,
    value_cents_col: str,
    period: int = 7,
    k_mad: float = 3.0,
) -> DataFrame:
    """Season-aware anomaly flags on a daily series — outliers in the
    REMAINDER of :func:`seasonal_decompose_daily`, scored against the
    median ± k·MAD band: the robust alert that doesn't fire every
    Saturday (the seasonal term absorbed it) and doesn't let one
    broken day poison its own threshold (median/MAD have a 50%
    breakdown; mean/σ would chase the outlier). The composition
    :func:`profile.seasonal_anomaly` approximates with trailing
    windows; this is the decomposition-exact version.

    Determinism: remainders are the decomposition's fixed-order
    doubles; median and MAD are RANK SELECTIONS (``ceil(n/2)``-th
    smallest — percentile_disc semantics, no interpolation), computed
    by two window passes over the bounded day-count series; the flag
    is one comparison. Zero-MAD series (constant remainder) flag
    nothing — there is no scale to exceed.

    Output: ``(day, value_cents, remainder, med, mad, is_outlier)``
    for full-window days only.
    """
    from pyspark.sql import Window

    dec = seasonal_decompose_daily(
        df, day_col, value_cents_col, period=period
    ).filter(F.col("remainder").isNotNull())
    w_rank = Window.orderBy(F.col("remainder").asc(), F.col("day").asc())
    w_all = Window.partitionBy(F.lit(1))
    ranked = dec.withColumn("__rk", F.row_number().over(w_rank)).withColumn(
        "__n", F.count(F.lit(1)).over(w_all)
    )
    med = ranked.filter(
        F.col("__rk") == F.ceil(F.col("__n") / 2).cast("long")
    ).select(F.col("remainder").alias("__med"))
    d1 = dec.crossJoin(F.broadcast(med))  # 1-row median (cuped class)
    w_rank2 = Window.orderBy(
        F.abs(F.col("remainder") - F.col("__med")).asc(), F.col("day").asc()
    )
    ranked2 = d1.withColumn("__rk", F.row_number().over(w_rank2)).withColumn(
        "__n", F.count(F.lit(1)).over(w_all)
    )
    mad = ranked2.filter(
        F.col("__rk") == F.ceil(F.col("__n") / 2).cast("long")
    ).select(
        F.abs(F.col("remainder") - F.col("__med")).alias("__mad")
    )
    out = d1.crossJoin(F.broadcast(mad))
    dev = F.abs(F.col("remainder") - F.col("__med"))
    return out.select(
        "day",
        "value_cents",
        "remainder",
        F.round(F.col("__med"), 9).alias("med"),
        F.round(F.col("__mad"), 9).alias("mad"),
        F.when(F.col("__mad") > 0, dev > F.lit(float(k_mad)) * F.col("__mad"))
        .otherwise(F.lit(False))
        .alias("is_outlier"),
    )


def seasonal_naive_eval(
    df: DataFrame,
    day_col: str,
    value_cents_col: str,
    period: int = 7,
) -> DataFrame:
    """Seasonal-naive forecast baseline + its error report —
    ``forecast(d) = actual(d − period)``, scored with MAE, bias, and
    sMAPE: the baseline every real forecasting model must beat before
    it earns a deployment, and the standing data-health metric ("how
    predictable is this series week-over-week"). Matching is a
    calendar self-EQUI-join on ``day − period`` (not a lag over row
    positions — holes in the series must mean "no forecast", not
    "forecast from the wrong week").

    Exactness: MAE and bias close from exact integer cent sums (one
    division each). sMAPE's per-row ratio ``2|f−a|/(|a|+|f|)`` is an
    IEEE division of exact integers, but SUMMING those doubles is
    order-dependent — so each row's term quantizes to 1e-9 (the
    eb_shrink_rates device) and sums as an exact long before the one
    closing division. Zero-denominator rows (both actual and forecast
    zero) contribute sMAPE 0 — the conventional definition.

    Output: one row ``(n_scored, mae_cents, bias_cents, smape)``.
    """
    base = df.select(
        F.col(day_col).cast("long").alias("__d"),
        F.col(value_cents_col).cast("long").alias("__a"),
    )
    prev = base.select(
        (F.col("__d") + period).alias("__d"), F.col("__a").alias("__f")
    )
    j = base.join(prev, "__d")
    err = F.abs(F.col("__f") - F.col("__a"))
    den = F.abs(F.col("__a")) + F.abs(F.col("__f"))
    smape_row = F.when(den > 0, (2 * err).cast("double") / den.cast("double")).otherwise(
        F.lit(0.0)
    )
    g = j.agg(
        F.count(F.lit(1)).alias("n_scored"),
        F.sum(err).alias("__sae"),
        F.sum(F.col("__f") - F.col("__a")).alias("__sbias"),
        F.sum(F.round(smape_row * F.lit(1e9)).cast("long")).alias("__ssm"),
    )
    n = F.col("n_scored").cast("double")
    return g.select(
        "n_scored",
        F.when(
            F.col("n_scored") > 0, F.round(F.col("__sae").cast("double") / n, 9)
        ).alias("mae_cents"),
        F.when(
            F.col("n_scored") > 0,
            F.round(F.col("__sbias").cast("double") / n, 9),
        ).alias("bias_cents"),
        F.when(
            F.col("n_scored") > 0,
            F.round(F.col("__ssm").cast("double") / (n * F.lit(1e9)), 9),
        ).alias("smape"),
    )


def quantile_forecast_eval(
    df: DataFrame,
    day_col: str,
    value_cents_col: str,
    taus_milli: "Sequence[int]" = (100, 500, 900),
    window_days: int = 7,
) -> DataFrame:
    """Trailing-quantile forecast + pinball-loss scorecard — forecast
    each day's value as the tau-quantile of the trailing
    ``window_days`` actuals, then score with the pinball (quantile)
    loss, the proper scoring rule for quantile forecasts (MAE can't
    tell a good p90 from a bad one; pinball penalizes over- and
    under-shoot asymmetrically by tau). Also reports COVERAGE (share
    of actuals at or under the forecast — a calibrated p90 covers
    ~90%). The quantile-forecasting sibling of
    :func:`seasonal_naive_eval`.

    Exactness: the trailing window is a BOUNDED rows-frame
    collect_list (≤ ``window_days`` values — never a growing state),
    sorted per row, rank-selected at ``ceil(tau·n)`` — exact cents
    out. The pinball loss ``max(tau·(a−f), (tau−1)·(a−f))`` in
    milli-tau units is an exact integer per row
    (``tau_milli·d`` vs ``(tau_milli−1000)·d``), summed exactly and
    closed with ONE division by ``1000·n``. Days with an empty
    trailing window are unscored.

    Output: ``(tau_milli, n_scored, mean_pinball_cents, coverage)``.
    """
    from pyspark.sql import Window

    w = Window.orderBy(F.col("__d").asc()).rowsBetween(-window_days, -1)
    base = df.select(
        F.col(day_col).cast("long").alias("__d"),
        F.col(value_cents_col).cast("long").alias("__a"),
    ).withColumn("__hist", F.array_sort(F.collect_list("__a").over(w)))
    probes = base.filter(F.size("__hist") >= 1).select(
        "__d",
        "__a",
        "__hist",
        F.explode(
            F.array(*[F.lit(int(t)) for t in taus_milli])
        ).alias("tau_milli"),
    )
    n = F.size("__hist")
    rank = F.greatest(
        F.ceil((F.col("tau_milli") * n) / 1000).cast("int"), F.lit(1)
    )
    f = F.element_at("__hist", rank)
    d = F.col("__a") - f
    pin = F.greatest(
        F.col("tau_milli") * d, (F.col("tau_milli") - 1000) * d
    )
    scored = probes.select(
        "tau_milli",
        pin.alias("__pin"),
        (F.col("__a") <= f).cast("long").alias("__cov"),
    )
    g = scored.groupBy("tau_milli").agg(
        F.count(F.lit(1)).alias("n_scored"),
        F.sum("__pin").alias("__sp"),
        F.sum("__cov").alias("__sc"),
    )
    return g.select(
        "tau_milli",
        "n_scored",
        F.round(
            F.col("__sp").cast("double")
            / (F.lit(1000.0) * F.col("n_scored").cast("double")),
            9,
        ).alias("mean_pinball_cents"),
        F.round(
            F.col("__sc").cast("double") / F.col("n_scored").cast("double"),
            9,
        ).alias("coverage"),
    )
