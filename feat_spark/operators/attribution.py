"""Multi-touch conversion attribution — which upstream touchpoints
(clicks, views, campaign hits) get credit for each downstream
conversion, under the two canonical models: last-touch (the final
touch before the conversion takes all of it) and linear (every touch
in the lookback window splits it evenly).

Reference scope note: the reference library (feat.erl) extracts and
compares per-request features; attribution is the NORTH-mandated
analytics layer built on the same event streams (SURVEY.md §0) — the
standard readout a growth/ads pipeline computes from exactly the
``events``-shaped table this engine ingests.

Scale shape: conversions x touches is a per-key range join — an
equi-join on the entity key plus a time-band predicate, the as-of
family's cost model (fan-out bounded by touches-per-lookback, never
cross-product; hot entities can route through the bucketed as-of
machinery in ``operators/asof.py`` unchanged). Per-conversion
counts/last-flags are one window over the joined frame keyed by the
conversion id (unique → no skew by construction), and the readout is
one partial-aggregatable count/sum pass per touch type.

Cross-engine exactness: conversion values go to integer cents via the
scale-2-decimal device; linear credit is allocated in integer
MICRO-CENTS by floor division (``cents * 10000 div n_touches`` per
touch row), so every sum is an exact integer in any order. The floor
under-allocates each conversion by < n_touches micro-cents (< 1e-4
cent per touch) — the deterministic version of the largest-remainder
allocation ad platforms use; the residual is documented, not rounded
away differently per engine.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def attribute_conversions(
    df: DataFrame,
    conversion_type: str = "purchase",
    touch_types: Sequence[str] = ("click", "view"),
    lookback_s: int = 7 * 86400,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-touch-type attribution readout over a single event table.

    A touch is attributable to a conversion of the same ``key_col``
    when it fires STRICTLY BEFORE the conversion and within
    ``lookback_s`` seconds of it. Conversions with zero touches in
    the window are unattributed and contribute to no row (a left-join
    variant would surface them; the readout here is per touch type).
    ``value_col`` must be non-negative currency (the floor-division
    allocation assumes positive cents).

    Output, one row per touch type:
    ``(touch_type, n_touches, n_last, last_touch_cents,
    linear_micros, linear_value)`` — ``linear_micros`` is exact
    integer micro-cents; ``linear_value`` is the same number read back
    in currency units (one division per output row).
    """
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    cents = (F.col(value_col).cast("decimal(18,2)") * 100).cast("long")
    conv = df.filter(F.col(type_col) == conversion_type).select(
        F.col(key_col).alias("__k"),
        F.col(id_col).alias("__cid"),
        ts_us.alias("__cts"),
        cents.alias("__cents"),
    )
    touch = df.filter(F.col(type_col).isin(list(touch_types))).select(
        F.col(key_col).alias("__k"),
        F.col(id_col).alias("__tid"),
        F.col(type_col).alias("touch_type"),
        ts_us.alias("__tts"),
    )
    j = conv.join(touch, "__k").filter(
        (F.col("__tts") < F.col("__cts"))
        & (F.col("__tts") >= F.col("__cts") - F.lit(int(lookback_s) * 1_000_000))
    )
    wc = Window.partitionBy("__cid")
    wl = wc.orderBy(F.col("__tts").desc(), F.col("__tid").desc())
    j = j.withColumn("__n", F.count(F.lit(1)).over(wc)).withColumn(
        "__is_last", F.row_number().over(wl) == 1
    )
    out = j.groupBy("touch_type").agg(
        F.count(F.lit(1)).alias("n_touches"),
        F.sum(F.col("__is_last").cast("long")).alias("n_last"),
        F.coalesce(
            F.sum(F.when(F.col("__is_last"), F.col("__cents"))), F.lit(0)
        ).alias("last_touch_cents"),
        F.sum(F.expr("(__cents * 10000) div __n")).alias("linear_micros"),
    )
    return out.withColumn(
        "linear_value", F.round(F.col("linear_micros") / F.lit(1_000_000.0), 6)
    )


def attribute_time_decay(
    df: DataFrame,
    conversion_type: str = "purchase",
    touch_types: Sequence[str] = ("click", "view"),
    lookback_s: int = 7 * 86400,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Time-decay attribution — the third canonical model beside
    last-touch and linear (:func:`attribute_conversions`): a touch's
    credit halves for every day of age, so yesterday's click outranks
    last week's view without zeroing it.

    Exactness device — power-of-two weights: with a half-life of one
    day, a touch aged ``a`` whole days (``a < lookback_days``) weighs
    ``2^(lookback_days - a)`` — an exact INTEGER, so per-conversion
    normalization ``cents * 10000 * w_i div sum_w`` is the same
    floor-divided integer micro-cent allocation the linear model uses
    (< 1e-4 cent under-allocation per touch, deterministic in any
    engine and any order). No ``exp()`` anywhere — the half-life IS
    the unit, which is why this decays by doubling rather than by an
    arbitrary lambda.

    Plan shape: identical to :func:`attribute_conversions` — one
    per-key band join, one per-conversion window (sum of weights),
    one readout agg.

    Output, one row per touch type: ``(touch_type, n_touches,
    weight_sum, decay_micros, decay_value)``.
    """
    lookback_days = max(1, int(lookback_s) // 86400)
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    cents = (F.col(value_col).cast("decimal(18,2)") * 100).cast("long")
    conv = df.filter(F.col(type_col) == conversion_type).select(
        F.col(key_col).alias("__k"),
        F.col(id_col).alias("__cid"),
        ts_us.alias("__cts"),
        cents.alias("__cents"),
    )
    touch = df.filter(F.col(type_col).isin(list(touch_types))).select(
        F.col(key_col).alias("__k"),
        F.col(id_col).alias("__tid"),
        F.col(type_col).alias("touch_type"),
        ts_us.alias("__tts"),
    )
    j = conv.join(touch, "__k").filter(
        (F.col("__tts") < F.col("__cts"))
        & (
            F.col("__tts")
            >= F.col("__cts") - F.lit(int(lookback_s) * 1_000_000)
        )
    )
    j = j.withColumn(
        "__w",
        F.expr(
            f"shiftleft(1L, cast({lookback_days} - "
            f"floor((__cts - __tts) / 86400000000) as int))"
        ),
    )
    wc = Window.partitionBy("__cid")
    j = j.withColumn("__sw", F.sum("__w").over(wc))
    out = j.groupBy("touch_type").agg(
        F.count(F.lit(1)).alias("n_touches"),
        F.sum("__w").alias("weight_sum"),
        F.sum(F.expr("(__cents * 10000 * __w) div __sw")).alias(
            "decay_micros"
        ),
    )
    return out.withColumn(
        "decay_value",
        F.round(F.col("decay_micros") / F.lit(1_000_000.0), 6),
    )
