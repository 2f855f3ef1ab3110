"""Exactly-once resume: interrupted runs complete without duplicating
or losing rows, completed runs are no-ops, and a crash between the
data write and the manifest commit is harmless (idempotent partition
overwrite)."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from feat_spark.operators.windows import lag_lead_features
from feat_spark.plans.checkpoint import CheckpointManifest, run_with_resume
from feat_spark.plans.lineage import BUCKET_COL, partition_lineage, with_bucket
from feat_spark.sources.synth import synth_transcripts

N_BUCKETS = 8


def pipeline(df):
    """A representative key-local feature pipeline (keeps _bucket)."""
    out = lag_lead_features(df, cols=["text"], offsets=[1], leads=False)
    return out.withColumn("text_len", F.length("text"))


@pytest.fixture()
def turns(spark):
    return synth_transcripts(spark, n_convs=30, mean_turns=10, seed=11)


@pytest.fixture()
def dirs(tmp_path):
    return str(tmp_path / "manifest"), str(tmp_path / "sink")


def _read_sink(spark, sink):
    return spark.read.parquet(sink)


def test_full_run_then_noop(spark, turns, dirs):
    man_path, sink = dirs
    man = CheckpointManifest(man_path)
    m1 = run_with_resume(spark, turns, pipeline, man, sink, n_buckets=N_BUCKETS)
    assert m1["buckets_done"] > 0 and m1["buckets_skipped"] == 0
    total = _read_sink(spark, sink).count()
    assert total == turns.count()

    m2 = run_with_resume(spark, turns, pipeline, man, sink, n_buckets=N_BUCKETS)
    assert m2["buckets_done"] == 0 and m2["rows"] == 0
    assert _read_sink(spark, sink).count() == total  # nothing rewritten

    # watermarks: per-bucket max ts of the source
    wm = {r["bucket"]: r["watermark_ts"] for r in man.load(spark).collect()}
    src = {
        r[BUCKET_COL]: r["m"]
        for r in with_bucket(turns, n_buckets=N_BUCKETS)
        .groupBy(BUCKET_COL).agg(F.max("ts").alias("m")).collect()
    }
    assert wm == src


def test_interrupted_run_resumes_exactly_once(spark, turns, dirs):
    man_path, sink = dirs
    man = CheckpointManifest(man_path)
    bucketed = with_bucket(turns, n_buckets=N_BUCKETS)
    first_half = bucketed.filter(F.col(BUCKET_COL) < N_BUCKETS // 2).drop(BUCKET_COL)

    # run 1 "dies" after finishing half the buckets
    run_with_resume(spark, first_half, pipeline, man, sink, n_buckets=N_BUCKETS)
    done_before = set(man.completed_buckets(spark))
    assert done_before and len(done_before) < N_BUCKETS

    # run 2 with the FULL source completes only the remainder
    m2 = run_with_resume(spark, turns, pipeline, man, sink, n_buckets=N_BUCKETS)
    assert m2["buckets_skipped"] == len(done_before)
    out = _read_sink(spark, sink)
    assert out.count() == turns.count()
    # no duplicates: (conv_id, turn_idx) unique
    assert out.select("conv_id", "turn_idx").distinct().count() == turns.count()


def test_crash_between_write_and_commit_is_harmless(spark, turns, dirs):
    man_path, sink = dirs
    man = CheckpointManifest(man_path)
    # simulate: data fully written but manifest lost (crash before commit)
    run_with_resume(spark, turns, pipeline, man, sink, n_buckets=N_BUCKETS)
    shutil.rmtree(man_path)

    m = run_with_resume(spark, turns, pipeline, man, sink, n_buckets=N_BUCKETS)
    assert m["buckets_skipped"] == 0  # re-did everything...
    out = _read_sink(spark, sink)
    assert out.count() == turns.count()  # ...without duplicating a row
    assert out.select("conv_id", "turn_idx").distinct().count() == turns.count()


def test_partition_lineage_shape(spark, turns):
    out = with_bucket(turns, n_buckets=N_BUCKETS)
    lin = partition_lineage(out, ts_col="ts", null_cols=("tool",))
    rows = lin.collect()
    assert 0 < len(rows) <= N_BUCKETS
    got = {r[BUCKET_COL]: r for r in rows}
    assert sum(r["rows_out"] for r in rows) == turns.count()
    # null accounting matches a direct count
    direct = (
        out.groupBy(BUCKET_COL).agg(F.sum(F.col("tool").isNull().cast("long")).alias("n"))
    )
    for r in direct.collect():
        assert got[r[BUCKET_COL]]["null_tool"] == r["n"]


def test_pipeline_must_keep_bucket(spark, turns, dirs):
    man_path, sink = dirs
    with pytest.raises(ValueError, match="bucket"):
        run_with_resume(
            spark, turns, lambda df: df.drop(BUCKET_COL),
            CheckpointManifest(man_path), sink, n_buckets=N_BUCKETS,
        )


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    """Two tables bucketed by the same key/count must sort-merge join
    with ZERO Exchange — the co-located-join claim, asserted by plan."""
    from pyspark.sql import functions as F

    from feat_spark.sources.io import write_bucketed_table

    facts = spark.range(0, 2000).select(
        (F.col("id") % 100).alias("user_id"), F.col("id").alias("event_id")
    )
    dims = spark.range(0, 100).select(
        F.col("id").alias("user_id"), (F.col("id") * 2).alias("segment")
    )
    write_bucketed_table(
        facts, "bt_facts", str(tmp_path / "facts"),
        bucket_col="user_id", n_buckets=8, sort_cols=("user_id",),
    )
    write_bucketed_table(
        dims, "bt_dims", str(tmp_path / "dims"),
        bucket_col="user_id", n_buckets=8, sort_cols=("user_id",),
    )
    try:
        f, d = spark.table("bt_facts"), spark.table("bt_dims")
        # disable broadcast so the join would otherwise shuffle both sides
        joined = f.hint("merge").join(d, "user_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan
        assert joined.count() == 2000
        # values correct vs the plain join
        plain = facts.join(dims, "user_id")
        assert sorted(map(tuple, joined.collect())) == sorted(
            map(tuple, plain.collect())
        )
    finally:
        spark.sql("drop table if exists bt_facts")
        spark.sql("drop table if exists bt_dims")
