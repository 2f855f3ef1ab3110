"""Deterministic hash sampling: layout-independence, stratum rates."""

from pyspark.sql import functions as F

from feat_spark.operators.sampling import hash_sample, stratified_hash_sample


def test_hash_sample_deterministic_and_layout_independent(spark):
    e = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    a = {r["event_id"] for r in hash_sample(e, "event_id", 10).select("event_id").collect()}
    b = {
        r["event_id"]
        for r in hash_sample(e.repartition(17), "event_id", 10)
        .select("event_id")
        .collect()
    }
    assert a == b  # physical layout must not change the sampled set
    n = e.count()
    assert 0.05 * n <= len(a) <= 0.15 * n  # ~10%
    # a different salt draws an (almost surely) different set
    c = {r["event_id"] for r in hash_sample(e, "event_id", 10, salt="t").select("event_id").collect()}
    assert c != a


def test_stratified_rates(spark):
    e = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    out = stratified_hash_sample(
        e, "event_type", "event_id",
        {"purchase": 100, "click": 0}, default_pct=50,
    )
    got = {r["event_type"]: r["n"] for r in out.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    want_all = {r["event_type"]: r["n"] for r in e.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    assert got["purchase"] == want_all["purchase"]  # rate 100: keep all
    assert "click" not in got  # rate 0: keep none
    for t in ("view", "signup", "error"):
        assert 0.35 * want_all[t] <= got[t] <= 0.65 * want_all[t]  # ~50%
