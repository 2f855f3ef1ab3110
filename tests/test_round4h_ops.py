"""Late-round-4 batch R operators: sweep-line peak concurrency,
out-of-fold target encoding, additive seasonal decomposition,
blocking-quality audits, schema-evolution parquet reads, URL
decomposition, stream-static enrichment. Hand-computed vectors."""

import os

from pyspark.sql import functions as F


def _rows(df, *order):
    if order:
        df = df.orderBy(*order)
    return [r.asDict() for r in df.collect()]


# --------------------------------------------------------- peak_concurrency


def test_peak_concurrency_hand_stack(spark):
    from feat_spark.operators.eventops import peak_concurrency

    # [0,10] [5,15] [5,8] overlap at t=5..8 -> peak 3; [20,30] alone
    df = spark.createDataFrame(
        [("d", 0, 10), ("d", 5, 15), ("d", 5, 8), ("d", 20, 30)],
        ["g", "s", "e"],
    )
    r = peak_concurrency(df, "s", "e", group_cols=("g",)).collect()[0]
    assert r["peak_concurrency"] == 3 and r["n_intervals"] == 4


def test_peak_concurrency_touching_intervals_inclusive(spark):
    from feat_spark.operators.eventops import peak_concurrency

    # one ends exactly when the next starts: inclusive semantics -> 2
    df = spark.createDataFrame([("g", 0, 5), ("g", 5, 9)], ["g", "s", "e"])
    r = peak_concurrency(df, "s", "e", group_cols=("g",)).collect()[0]
    assert r["peak_concurrency"] == 2


def test_peak_concurrency_disjoint_is_one(spark):
    from feat_spark.operators.eventops import peak_concurrency

    df = spark.createDataFrame([("g", 0, 1), ("g", 2, 3)], ["g", "s", "e"])
    r = peak_concurrency(df, "s", "e", group_cols=("g",)).collect()[0]
    assert r["peak_concurrency"] == 1


# -------------------------------------------------------- oof_target_encode


def test_oof_encoding_excludes_own_fold(spark):
    from feat_spark.operators.encoding import oof_target_encode
    from feat_spark.functions.text import md5_long32

    rows = [("k", f"id{i}", 100 * (i + 1)) for i in range(12)]
    df = spark.createDataFrame(rows, ["key", "id", "t"])
    out = {r["fold"]: r for r in oof_target_encode(df, "key", "t", "id", n_folds=3).collect()}
    # recompute folds the operator's own way and verify the complement
    folds = {
        r["id"]: r["f"]
        for r in df.select(
            "id", F.pmod(md5_long32(F.col("id")), F.lit(3)).alias("f")
        ).collect()
    }
    tot = sum(100 * (i + 1) for i in range(12))
    for f, r in out.items():
        own = sum(
            100 * (i + 1) for i in range(12) if folds[f"id{i}"] == f
        )
        n_own = sum(1 for i in range(12) if folds[f"id{i}"] == f)
        assert r["n_in_fold"] == n_own
        assert abs(r["oof_mean"] - (tot - own) / (12 - n_own)) < 1e-9


def test_oof_encoding_single_fold_key_is_null(spark):
    from feat_spark.operators.encoding import oof_target_encode

    df = spark.createDataFrame([("k", "only", 500)], ["key", "id", "t"])
    r = oof_target_encode(df, "key", "t", "id", n_folds=4).collect()[0]
    assert r["oof_mean"] is None and r["n_out_of_fold"] == 0


# ------------------------------------------------- seasonal_decompose_daily


def test_seasonal_decompose_identities(spark):
    from feat_spark.operators.resample import seasonal_decompose_daily

    # 21 days of a pure weekly pattern on a flat level: trend = level,
    # remainder = -seasonal-mean correction, additive identity holds
    pattern = [700, 700, 700, 700, 700, 1400, 0]  # mean 700
    rows = [(d, pattern[d % 7]) for d in range(21)]
    df = spark.createDataFrame(rows, ["day", "cents"])
    out = {r["day"]: r for r in seasonal_decompose_daily(df, "day", "cents").collect()}
    assert out[0]["trend"] is None and out[20]["remainder"] is None  # edges
    mid = out[10]
    assert mid["trend"] == 700.0
    # day 10 % 7 = 3 -> seasonal index of the 700-days: 0
    assert abs(mid["seasonal"]) < 1e-9
    assert abs(mid["remainder"]) < 1e-9
    spike = out[12]  # day 12 % 7 = 5 -> the 1400 day: seasonal +700
    assert abs(spike["seasonal"] - 700.0) < 1e-9
    assert abs(spike["remainder"]) < 1e-9
    # identity value = trend + seasonal + remainder on full-window days
    for d in range(3, 18):
        r = out[d]
        assert abs(r["value_cents"] - (r["trend"] + r["seasonal"] + r["remainder"])) < 1e-6


# --------------------------------------------------------- blocking_quality


def test_blocking_quality_counts_and_ratios(spark):
    from feat_spark.operators.dedup import blocking_quality

    # 4 records, blocks {A: 1,2,3} {B: 4} -> 3 candidate pairs of 6
    a = spark.createDataFrame(
        [(1, "A"), (2, "A"), (3, "A"), (4, "B")], ["id", "block"]
    )
    # truth: (1,2) captured, (1,4) missed
    t = spark.createDataFrame([(1, 2), (1, 4)], ["id_a", "id_b"])
    r = blocking_quality(a, t).collect()[0]
    assert r["n_records"] == 4 and r["n_candidate_pairs"] == 3
    assert r["n_truth_pairs"] == 2 and r["n_hits"] == 1
    assert abs(r["pair_completeness"] - 0.5) < 1e-12
    assert abs(r["reduction_ratio"] - 0.5) < 1e-12


def test_blocking_quality_multi_block_dedups_pairs(spark):
    from feat_spark.operators.dedup import blocking_quality

    # records sharing TWO blocks still count one candidate pair
    a = spark.createDataFrame(
        [(1, "A"), (1, "B"), (2, "A"), (2, "B")], ["id", "block"]
    )
    t = spark.createDataFrame([(1, 2)], ["id_a", "id_b"])
    r = blocking_quality(a, t).collect()[0]
    assert r["n_candidate_pairs"] == 1 and r["pair_completeness"] == 1.0


# ------------------------------------------------------ read_parquet_evolved


def test_schema_evolution_null_backfill(spark, tmp_path):
    import pandas as pd

    from feat_spark.sources.layout import read_parquet_evolved

    d = str(tmp_path)
    pd.DataFrame({"id": [1, 2], "v": [1.5, 2.5]}).to_parquet(
        os.path.join(d, "gen1.parquet"), index=False
    )
    pd.DataFrame(
        {"id": [3], "v": [3.5], "extra": ["x"]}
    ).to_parquet(os.path.join(d, "gen2.parquet"), index=False)
    out = read_parquet_evolved(spark, d)
    assert set(out.columns) == {"id", "v", "extra"}
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["extra"] is None and rows[3]["extra"] == "x"


# ------------------------------------------------------------- url features


def test_url_features_and_param(spark):
    from feat_spark.functions.text import url_features, url_query_param

    df = spark.createDataFrame(
        [
            ("https://a.b.example.org/p/1?utm_source=x&y=2",),
            ("http://example.com/q",),
            ("garbage no url",),
        ],
        ["url"],
    )
    f = url_features("url")
    out = df.select(
        f["host"].alias("h"),
        f["domain"].alias("d"),
        f["path"].alias("p"),
        f["is_https"].alias("s"),
        url_query_param("url", "utm_source").alias("u"),
    ).collect()
    assert out[0].asDict() == {
        "h": "a.b.example.org",
        "d": "example.org",
        "p": "/p/1",
        "s": True,
        "u": "x",
    }
    assert out[1]["d"] == "example.com" and out[1]["s"] is False
    assert out[1]["u"] is None
    assert all(v is None for v in out[2].asDict().values())


# ------------------------------------------------------------ stream enrich


def test_stream_static_enrich_matches_batch(spark, tmp_path):
    import pandas as pd

    from feat_spark.streaming.pipeline import (
        run_to_memory,
        stream_static_enrich_agg,
    )

    pdf = pd.DataFrame(
        {
            "user_id": [1, 2, 3, 1, 9],
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:00"] * 5, utc=True
            ),
            "value": [1.0, 2.0, 3.0, 4.0, 5.0],
        }
    )
    d = str(tmp_path)
    pdf.to_parquet(
        os.path.join(d, "p.parquet"), index=False, coerce_timestamps="us",
        allow_truncated_timestamps=True,
    )
    dim = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "a")], ["user_id", "segment"]
    )  # user 9 has no dim row -> drops
    schema = "user_id long, ts timestamp, value double"
    stream = spark.readStream.schema(schema).parquet(d)
    out = stream_static_enrich_agg(
        stream, dim, "user_id", "segment", "value", watermark="1 hour"
    )
    run_to_memory(out, "enrich_unit", output_mode="complete")
    got = {r["segment"]: r for r in spark.table("enrich_unit").collect()}
    assert got["a"]["n_events"] == 3 and got["a"]["cents"] == 800
    assert got["b"]["n_events"] == 1 and got["b"]["cents"] == 200
    assert "9" not in got and len(got) == 2
