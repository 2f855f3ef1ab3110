"""Late-round-4 batch Y operators: seasonal-naive forecast baselines,
session-gap sensitivity, Markov next-event accuracy, cross-source
duplication matrices. Hand-computed vectors."""

import datetime


def _ts(s):
    return datetime.datetime.fromisoformat(s)


# ------------------------------------------------------ seasonal_naive_eval


def test_seasonal_naive_scores_only_matched_days(spark):
    from feat_spark.operators.resample import seasonal_naive_eval

    # days 0..13 value 100 except day 8 = 130; day 21 has no d-7 match
    rows = [(d, 130 if d == 8 else 100) for d in range(14)] + [(21, 100)]
    df = spark.createDataFrame(rows, ["day", "cents"])
    r = seasonal_naive_eval(df, "day", "cents", period=7).collect()[0]
    assert r["n_scored"] == 7  # days 7..13 only; 21 is unmatched
    # one error of 30 across 7 scored days
    assert abs(r["mae_cents"] - 30 / 7) < 1e-9
    assert abs(r["bias_cents"] + 30 / 7) < 1e-9  # forecast UNDER-shot
    assert abs(r["smape"] - (2 * 30 / 230) / 7) < 1e-6


def test_seasonal_naive_perfect_series(spark):
    from feat_spark.operators.resample import seasonal_naive_eval

    df = spark.createDataFrame(
        [(d, 500 + (d % 7)) for d in range(21)], ["day", "cents"]
    )
    r = seasonal_naive_eval(df, "day", "cents").collect()[0]
    assert r["mae_cents"] == 0.0 and r["smape"] == 0.0 and r["bias_cents"] == 0.0


# --------------------------------------------------------- gap_sensitivity


def test_gap_sensitivity_counts_boundaries(spark):
    from feat_spark.operators.eventops import gap_sensitivity

    rows = []
    # user 1: events at 0s, 1000s, 3000s -> gaps 1000, 2000
    for i, s in enumerate((0, 1000, 3000)):
        rows.append((1, _ts("2024-01-01T00:00:00") + datetime.timedelta(seconds=s), i))
    # user 2: single event
    rows.append((2, _ts("2024-01-01T00:00:00"), 9))
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id"])
    out = {r["gap_s"]: r for r in gap_sensitivity(df, "user_id", gaps_s=(900, 1800, 2500)).collect()}
    assert all(r["n_entities"] == 2 for r in out.values())
    assert out[900]["n_boundaries"] == 2 and out[900]["n_sessions"] == 4
    assert out[1800]["n_boundaries"] == 1 and out[1800]["n_sessions"] == 3
    assert out[2500]["n_boundaries"] == 0 and out[2500]["n_sessions"] == 2


# --------------------------------------------------------- markov_accuracy


def test_markov_accuracy_learns_deterministic_chain(spark):
    from feat_spark.operators.eventops import markov_accuracy

    # perfectly periodic a->b->a... on both train (even) and eval
    # (odd) days -> accuracy 1.0 for both states
    rows = []
    eid = 0
    base = _ts("2024-01-01T00:00:00")
    for day in range(4):
        for i in range(6):
            rows.append(
                (1, "a" if i % 2 == 0 else "b",
                 base + datetime.timedelta(days=day, minutes=i), eid)
            )
            eid += 1
    df = spark.createDataFrame(rows, ["user_id", "event_type", "ts", "event_id"])
    out = {r["cur"]: r for r in markov_accuracy(df, "user_id", "event_type").collect()}
    assert out["a"]["predicted"] == "b" and out["a"]["accuracy"] == 1.0
    assert out["b"]["predicted"] == "a" and out["b"]["accuracy"] == 1.0


# --------------------------------------------------------------- dup_matrix


def test_dup_matrix_cells(spark):
    from feat_spark.operators.dedup import dup_source_matrix

    rows = [
        (1, "x", "a"), (2, "x", "b"), (3, "x", "b"),  # cross a-b: 1*2
        (4, "y", "b"),  # unique, contributes nothing
        (5, "z", "c"), (6, "z", "c"), (7, "z", "c"),  # within c: 3
    ]
    df = spark.createDataFrame(rows, ["id", "text", "source"])
    out = {
        (r["source_a"], r["source_b"]): r["n_pairs"]
        for r in dup_source_matrix(df, "id", "text", "source").collect()
    }
    assert out[("a", "b")] == 2
    assert out[("b", "b")] == 1  # docs 2,3 share text within b
    assert out[("c", "c")] == 3
    assert ("a", "a") not in out and ("b", "c") not in out
