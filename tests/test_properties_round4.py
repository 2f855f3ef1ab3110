"""Property-based invariants of the round-4 distributed primitives —
Spark-backed, so examples are deliberately few (each case is a real
job); the properties are the operators' defining contracts:

  * assign_sequential_ids emits EXACTLY the rank permutation of its
    unique key set, for any bucket count (two-phase == global sort)
  * bloom_semi_join == the exact semi join even at absurdly small
    filters (false positives verified away; false negatives would
    surface as lost rows)
  * merge_rollup is split-invariant: state(old) ⊕ state(new) ==
    state(all) wherever the cut lands (the algebraic identity)
  * rendezvous_assign moves keys ONLY to a newly added shard
    (minimal movement, the property that defines HRW hashing)
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_key_sets = st.lists(
    st.integers(0, 10_000), min_size=1, max_size=40, unique=True
)


@given(keys=_key_sets, n_buckets=st.integers(1, 7))
@settings(**_SETTINGS)
def test_sequential_ids_is_rank_permutation(spark, keys, n_buckets):
    from feat_spark.operators.ids import assign_sequential_ids

    df = spark.createDataFrame([(k,) for k in keys], "k long")
    out = {
        r["k"]: r["row_id"]
        for r in assign_sequential_ids(df, "k", n_buckets=n_buckets).collect()
    }
    assert out == {k: i for i, k in enumerate(sorted(keys))}


@given(
    big=st.lists(st.integers(0, 60), min_size=0, max_size=30),
    small=st.lists(st.integers(0, 60), min_size=0, max_size=10, unique=True),
)
@settings(**_SETTINGS)
def test_bloom_semi_join_equals_semi_join(spark, big, small):
    from feat_spark.operators.bloom import bloom_semi_join

    b = spark.createDataFrame([(k,) for k in big], "k long")
    s = spark.createDataFrame([(k,) for k in small], "k long")
    got = sorted(
        r["k"] for r in bloom_semi_join(b, s, "k", m_bits=64, n_hashes=2).collect()
    )
    assert got == sorted(k for k in big if k in set(small))


@given(
    vals=st.lists(
        st.tuples(st.sampled_from("ab"), st.integers(-50, 50)),
        min_size=1,
        max_size=20,
    ),
    cut=st.integers(0, 20),
)
@settings(**_SETTINGS)
def test_merge_rollup_split_invariance(spark, vals, cut):
    from pyspark.sql import functions as F

    from feat_spark.plans.incremental import build_rollup, merge_rollup

    cut = min(cut, len(vals))
    ms = [("n", "count", "v"), ("s", "sum", "vd"), ("hi", "max", "vd")]

    def frame(rows):
        return spark.createDataFrame(
            rows, "k string, v long"
        ).withColumn("vd", F.col("v").cast("decimal(18,2)"))

    merged = merge_rollup(
        build_rollup(frame(vals[:cut] or [("zzz", 0)]), ["k"], ms).filter(
            F.lit(cut > 0)
        ),
        build_rollup(
            frame(vals[cut:] or [("zzz", 0)]), ["k"], ms
        ).filter(F.lit(cut < len(vals))),
        ["k"],
        ms,
    )
    got = {r["k"]: (r["n"], r["s"], r["hi"]) for r in merged.collect()}
    want = {
        r["k"]: (r["n"], r["s"], r["hi"])
        for r in build_rollup(frame(vals), ["k"], ms).collect()
    }
    assert got == want


@given(
    keys=st.lists(st.integers(0, 5000), min_size=1, max_size=40, unique=True),
    n_shards=st.integers(1, 5),
)
@settings(**_SETTINGS)
def test_rendezvous_minimal_movement_property(spark, keys, n_shards):
    from feat_spark.operators.ids import rendezvous_assign

    shards = [f"s{i}" for i in range(n_shards)]
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    before = {
        r["k"]: r["shard"] for r in rendezvous_assign(df, "k", shards).collect()
    }
    after = {
        r["k"]: r["shard"]
        for r in rendezvous_assign(df, "k", shards + ["snew"]).collect()
    }
    for k in keys:
        assert after[k] == before[k] or after[k] == "snew"
