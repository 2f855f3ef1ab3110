"""Declarative feature-matrix builder: spec composition must be
bit-equal to hand-composing the underlying operators, and the spec
surface must be structurally leakage-free (backward-looking constructs
only). The driver gate `feature_matrix` is the oracle-checked twin."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from feat_spark.operators.asof import asof_join
from feat_spark.operators.sessionize import sessionize
from feat_spark.operators.windows import (
    cumulative_features,
    lag_lead_features,
    with_stable_order,
)
from feat_spark.plans.features import (
    AsofSource,
    FeatureMatrixSpec,
    build_feature_matrix,
)
from feat_spark.sources.synth import synth_conv_attrs, synth_transcripts


@pytest.fixture(scope="module")
def turns(spark):
    return synth_transcripts(spark, n_convs=20, mean_turns=15, seed=3).withColumn(
        "n_chars", F.length("text").cast("long")
    )


@pytest.fixture(scope="module")
def attrs(spark):
    return synth_conv_attrs(spark, n_convs=20, seed=3)


def test_matrix_equals_manual_composition(spark, turns, attrs):
    spec = FeatureMatrixSpec(
        entity="conv_id", ts="ts", tiebreak=("turn_idx",),
        asof=[AsofSource(attrs, value_cols=["plan"])],
        lags={"n_chars": [1]},
        cumulative={"n_chars": ["count", "sum"]},
        session_gap="30 minutes",
    )
    got = build_feature_matrix(turns, spec)

    manual = asof_join(
        turns, attrs, on="conv_id", left_ts="ts", right_ts="ts",
        value_cols=["plan"], strategy="union_window",
    )
    manual = with_stable_order(
        manual, partition="conv_id", order=("ts",), tiebreak=("turn_idx",),
        out_col="turn_seq",
    )
    manual = lag_lead_features(
        manual, cols=["n_chars"], offsets=[1], partition="conv_id",
        order=("ts",), tiebreak=("turn_idx",), leads=False,
    )
    manual = cumulative_features(
        manual, {"n_chars": ["count", "sum"]}, partition="conv_id",
        order=("ts",), tiebreak=("turn_idx",),
    )
    manual = sessionize(
        manual, gap="30 minutes", partition="conv_id", ts="ts",
        tiebreak=("turn_idx",),
    )
    cols = sorted(set(got.columns) & set(manual.columns))
    a = sorted(map(tuple, got.select(*cols).collect()))
    b = sorted(map(tuple, manual.select(*cols).collect()))
    assert a == b
    for c in ("turn_seq", "n_chars_lag1", "n_chars_cum_count",
              "n_chars_cum_sum", "session_id"):
        assert c in got.columns, c


def test_matrix_is_structurally_backward_looking(spark, turns):
    """The spec exposes no lead/future construct; a lag-1 feature at
    row i must equal row i-1's value under the stable order — and
    truncating the future (dropping the last turn of every conv) must
    not change any feature of the surviving rows."""
    spec = FeatureMatrixSpec(
        entity="conv_id", ts="ts", tiebreak=("turn_idx",),
        lags={"n_chars": [1]},
        cumulative={"n_chars": ["sum"]},
        decay={"n_chars": {"half_life_days": 7}},
        zscore={"n_chars": {"n": 10, "min_periods": 3}},
    )
    full = build_feature_matrix(turns, spec)
    w_max = F.max("turn_idx").over(Window.partitionBy("conv_id"))
    truncated = turns.withColumn("__mx", w_max).filter(
        F.col("turn_idx") < F.col("__mx")
    ).drop("__mx")
    trunc = build_feature_matrix(truncated, spec)
    key = ["conv_id", "turn_idx"]
    feat_cols = key + [
        "n_chars_lag1", "n_chars_cum_sum", "n_chars_decay7d",
        "n_chars_zscore", "n_chars_is_anomaly",
    ]
    full_kept = (
        full.join(trunc.select(*key), key, "left_semi")
        .select(*feat_cols)
    )
    a = sorted(map(tuple, full_kept.collect()))
    b = sorted(map(tuple, trunc.select(*feat_cols).collect()))
    assert a == b  # features never depended on the dropped future rows


def test_spec_defaults_are_inert(spark, turns):
    """An empty spec is a stable-order pass-through: same rows, one
    added sequence column, nothing else."""
    out = build_feature_matrix(turns, FeatureMatrixSpec(entity="conv_id"))
    assert set(out.columns) == set(turns.columns) | {"turn_seq"}
    assert out.count() == turns.count()


def test_spec_from_dict_roundtrip_and_unknown_keys():
    from feat_spark.plans.features import spec_from_dict

    d = {
        "entity": "conv_id", "ts": "ts", "tiebreak": ["turn_idx"],
        "lags": {"n_chars": [1, 2]},
        "cumulative": {"n_chars": ["sum"]},
        "session_gap": "30 minutes",
    }
    spec = spec_from_dict(d)
    assert spec.entity == "conv_id"
    assert spec.tiebreak == ("turn_idx",)
    assert spec.lags == {"n_chars": [1, 2]}
    assert spec.session_gap == "30 minutes"
    assert spec.asof == []

    with pytest.raises(ValueError, match="unknown spec keys.*lagz"):
        spec_from_dict({"lagz": {}})
