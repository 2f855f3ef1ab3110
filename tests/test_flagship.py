"""North-rule gate on the FLAGSHIP pipeline (bench.flagship): the
as-of join + windowed-feature frame must match an independent pandas
oracle at EVERY (conv_id, ts) (np.allclose), keep per-turn text
identity under stable (conv_id, turn_idx) ordering, and be invariant
to truncation of future rows (zero temporal leakage).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from feat_spark.plans.audit import truncation_invariance
from feat_spark.sources.synth import (
    synth_conv_attrs_pdf,
    synth_transcripts_pdf,
    write_synth_parquet,
)


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("flagship"))
    write_synth_parquet(d, n_convs=60, mean_turns=15, seed=9)
    return d


@pytest.fixture(scope="module")
def feats(spark, data_dir):
    return bench.flagship(spark, data_dir).toPandas()


@pytest.fixture(scope="module")
def source(data_dir):
    return synth_transcripts_pdf(n_convs=60, mean_turns=15, seed=9)


def test_per_turn_identity_under_stable_ordering(feats, source):
    """Every source turn appears exactly once; its payload hash proves
    the text survived (per-turn text equality via the injective
    conv_id:turn_idx:... text template)."""
    assert len(feats) == len(source)
    key = ["conv_id", "turn_idx"]
    merged = feats.merge(source[key + ["text"]], on=key, validate="1:1")
    assert len(merged) == len(source)
    # stable ordering: turn_seq is exactly the rank of turn_idx per conv
    merged = merged.sort_values(key)
    expect_seq = merged.groupby("conv_id")["turn_idx"].rank(method="first").astype(int)
    assert (merged["turn_seq"].to_numpy() == expect_seq.to_numpy()).all()


def test_allclose_vs_pandas_oracle_at_every_conv_ts(feats, source, data_dir):
    attrs = synth_conv_attrs_pdf(n_convs=60, seed=9)
    src = source.sort_values(["conv_id", "turn_idx", "ts"]).reset_index(drop=True)

    # oracle as-of join per conversation
    left = src.sort_values("ts", kind="mergesort")
    right = attrs.sort_values("ts", kind="mergesort")
    oracle = pd.merge_asof(left, right, on="ts", by="conv_id", direction="backward")
    oracle = oracle.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)

    g = src.groupby("conv_id", sort=False)
    oracle["turns_so_far"] = g.cumcount().to_numpy() + 1
    oracle["chars_so_far"] = (
        src.assign(_n=src["text"].str.len()).groupby("conv_id")["_n"].cumsum().to_numpy()
    )
    prev_ts = g["ts"].shift(1)
    new_s = (prev_ts.isna() | (src["ts"] - prev_ts > pd.Timedelta("30 minutes")))
    oracle["session_id"] = new_s.groupby(src["conv_id"]).cumsum().to_numpy() - 1

    got = feats.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert (got["conv_id"] == oracle["conv_id"]).all()
    assert (got["ts"] == oracle["ts"]).all()
    for col, ocol in [
        ("attr_hash", "attr_hash"),
        ("payload_hash_cum_count", "turns_so_far"),
        ("n_chars_cum_sum", "chars_so_far"),
        ("session_id", "session_id"),
    ]:
        a = got[col].to_numpy(dtype="float64", na_value=np.nan)
        b = oracle[ocol].to_numpy(dtype="float64", na_value=np.nan)
        assert np.allclose(a, b, equal_nan=True), col
    # plan string matches too (categorical attr through the as-of)
    assert (
        got["plan"].fillna("~") == oracle["plan"].fillna("~")
    ).all()


def test_truncation_invariance_of_flagship(spark, data_dir, source):
    cutoff = source["ts"].quantile(0.6).to_pydatetime()
    turns = spark.read.parquet(os.path.join(data_dir, "transcripts.parquet"))

    def pipeline(df):
        import tempfile

        # flagship reads from disk; rebuild it over the given frame by
        # monkey-writing a temp dir (attrs unchanged: they are the
        # *right* side whose future rows must also not leak)
        d = tempfile.mkdtemp()
        df.write.parquet(os.path.join(d, "transcripts.parquet"))
        import shutil

        shutil.copy(
            os.path.join(data_dir, "conv_attrs.parquet"),
            os.path.join(d, "conv_attrs.parquet"),
        )
        return bench.flagship(spark, d)

    truncation_invariance(pipeline, turns, cutoff, ts_col="ts")
