"""Sliding-window chunking, duplicated-span stats, and sessionized
funnels (driver gates `chunk_documents` / `span_dup_stats` /
`session_funnel` are the oracle-checked twins)."""

import pytest
from pyspark.sql import functions as F

from feat_spark.operators.dedup import span_dup_stats
from feat_spark.operators.funnel import funnel_summary, session_funnel
from feat_spark.operators.packing import chunk_documents


def test_chunk_documents_coverage_and_overlap(spark):
    words = [f"w{i}" for i in range(10)]
    df = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
    out = sorted(
        (r["chunk_idx"], r["start_tok"], r["end_tok"], r["n_chunk_tokens"])
        for r in chunk_documents(df, chunk_tokens=4, stride=2).collect()
    )
    # starts 0,2,4,6 (k=6 -> ceil(6/2)+1 = 4 chunks), last clamped at 10
    assert out == [(0, 0, 4, 4), (1, 2, 6, 4), (2, 4, 8, 4), (3, 6, 10, 4)]
    # every token covered
    covered = set()
    for _, s, e, _n in out:
        covered |= set(range(s, e))
    assert covered == set(range(10))


def test_chunk_documents_short_doc_single_chunk(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    rows = chunk_documents(df, chunk_tokens=128, stride=64).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["start_tok"], r["end_tok"], r["n_chunk_tokens"]) == (0, 3, 3)


def test_chunk_md5_content_addresses(spark):
    """Identical chunk text in different docs shares one chunk_md5."""
    df = spark.createDataFrame(
        [(1, "x y z w"), (2, "x y z w")], "doc_id long, text string"
    )
    out = chunk_documents(df, chunk_tokens=4, stride=4).collect()
    assert len({r["chunk_md5"] for r in out}) == 1


def test_span_dup_stats_planted_copy(spark):
    copied = " ".join(f"c{i}" for i in range(10))       # 10 words
    unique1 = " ".join(f"a{i}" for i in range(10))
    rows = [
        (1, copied + " " + unique1),    # first 3 8-gram windows = copied
        (2, copied),                    # wholly duplicated text
        (3, "totally different words all of them unlike anything else here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in span_dup_stats(df, n=8).collect()}
    # doc2: 3 windows, all present inside doc1's text too -> fraction 1
    assert out[2]["n_spans"] == 3 and out[2]["dup_fraction"] == 1.0
    # doc1: 13 windows, the 3 fully-inside-copied ones are duplicated
    assert out[1]["n_spans"] == 13 and out[1]["n_dup_spans"] == 3
    assert out[3]["n_dup_spans"] == 0 and out[3]["dup_fraction"] == 0.0


def test_session_funnel_order_matters(spark):
    rows = [
        # session A: view(1) -> click(2) -> purchase(3): full conversion
        (1, 0, "view", 1.0), (1, 0, "click", 2.0), (1, 0, "purchase", 3.0),
        # session B: purchase BEFORE view -> stalls after view
        (2, 0, "purchase", 1.0), (2, 0, "view", 2.0),
        # session C: view only
        (3, 0, "view", 5.0),
        # session D: click without view -> no funnel row at all
        (4, 0, "click", 1.0),
        # session E: view -> click, and a second click later (first wins)
        (5, 0, "view", 1.0), (5, 0, "click", 4.0), (5, 0, "click", 9.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, session_id long, event_type string, ts double"
    )
    f = session_funnel(df, stages=("view", "click", "purchase"))
    got = {r["user_id"]: r for r in f.collect()}
    assert set(got) == {1, 2, 3, 5}
    assert got[1]["reached_purchase"] and got[1]["t_2"] == 3.0
    assert not got[2]["reached_click"]  # purchase before view is no click
    assert not got[3]["reached_click"]
    assert got[5]["t_1"] == 4.0 and not got[5]["reached_purchase"]

    summary = funnel_summary(f, stages=("view", "click", "purchase")).collect()[0]
    assert summary["n_view"] == 4 and summary["n_click"] == 2
    assert summary["n_purchase"] == 1
    assert summary["rate_click"] == 0.5
    assert summary["rate_purchase"] == 0.5


def test_cohort_retention_matrix(spark):
    import datetime as dt

    from feat_spark.operators.funnel import cohort_retention

    day = dt.timedelta(days=1)
    w0 = dt.datetime(2024, 1, 4)  # absolute-week bucketing, not w0-relative
    rows = []
    # cohort A: users 1,2 first seen week 0; user 1 returns weeks 1 and 2,
    # user 2 returns week 1 only
    rows += [(1, w0), (2, w0 + day)]
    rows += [(1, w0 + 7 * day), (2, w0 + 8 * day)]
    rows += [(1, w0 + 14 * day)]
    # cohort B: user 3 first seen week 1, never returns
    rows += [(3, w0 + 7 * day)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = cohort_retention(df, bucket_days=7).toPandas()
    m = {
        (r.cohort_bucket, r.offset): (r.n_active, r.retention_rate)
        for r in out.itertuples()
    }
    cohorts = sorted({c for c, _ in m})
    a, b = cohorts[0], cohorts[1]
    assert b == a + 1
    assert m[(a, 0)] == (2, 1.0)
    assert m[(a, 1)] == (2, 1.0)
    assert m[(a, 2)] == (1, 0.5)
    assert m[(b, 0)] == (1, 1.0)
    assert (b, 1) not in m  # user 3 never returns
    # duplicate activity within a week counts once
    assert len(out) == 4
