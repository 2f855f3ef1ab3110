"""Late-round-4 batch W operators: late-data restatement planning,
interval-overlap alignment, dwell-time attribution, Benford audits,
salting prescriptions. Hand-computed vectors."""

import datetime

from pyspark.sql import functions as F


def _ts(s):
    return datetime.datetime.fromisoformat(s)


# --------------------------------------------------------- restatement_plan


def test_restatement_plan_flags_new_partitions(spark):
    from feat_spark.plans.incremental import restatement_plan

    state = spark.createDataFrame([(1,), (2,), (3,)], ["day"])
    late = spark.createDataFrame(
        [(2, "a"), (2, "b"), (2, "a"), (9, "c")], ["day", "key"]
    )
    out = {r["partition"]: r for r in restatement_plan(state, late).collect()}
    assert set(out) == {2, 9}  # untouched partitions never appear
    assert out[2]["n_late_rows"] == 3 and out[2]["n_late_keys"] == 2
    assert out[2]["is_new_partition"] is False
    assert out[9]["is_new_partition"] is True


# ----------------------------------------------------------- interval_align


def test_interval_align_half_open_overlap(spark):
    from feat_spark.operators.eventops import interval_align

    left = spark.createDataFrame(
        [("u", 0, 100), ("u", 200, 300)],
        ["user_id", "l_start", "l_end"],
    )
    right = spark.createDataFrame(
        [("u", 50, 250), ("u", 100, 150), ("u", 400, 500)],
        ["user_id", "r_start", "r_end"],
    )
    out = {
        (r["l_start"], r["r_start"]): r["overlap_us"]
        for r in interval_align(left, right, "user_id").collect()
    }
    assert out[(0, 50)] == 50  # [50,100)
    assert out[(200, 50)] == 50  # [200,250)
    # touching at 100 (half-open) and disjoint windows never pair
    assert (0, 100) not in out and (0, 400) not in out


# ------------------------------------------------------- dwell_attribution


def test_dwell_attribution_caps_and_excludes_last(spark):
    from feat_spark.operators.eventops import dwell_attribution

    rows = [
        (1, "view", _ts("2024-01-01T00:00:00"), 1),
        (1, "click", _ts("2024-01-01T00:01:00"), 2),  # view owns 60s
        (1, "view", _ts("2024-01-01T09:00:00"), 3),  # click capped 1800
        # final event owns nothing
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_type", "ts", "event_id"])
    out = {r["event_type"]: r for r in dwell_attribution(df, "user_id", "event_type").collect()}
    assert out["view"]["dwell_s_total"] == 60 and out["view"]["n_events"] == 1
    assert out["click"]["dwell_s_total"] == 1800
    assert abs(out["view"]["dwell_share"] - 60 / 1860) < 1e-9


# ------------------------------------------------------------ benford_audit


def test_benford_uniform_digits_deviate_upward_late(spark):
    from feat_spark.operators.profile import benford_audit

    # 1..999 uniform: each first digit appears 111 times
    df = spark.createDataFrame([(v,) for v in range(1, 1000)], ["v"])
    out = {r["digit"]: r for r in benford_audit(df, "v").collect()}
    assert set(out) == set(range(1, 10))
    assert all(r["n_obs"] == 111 for r in out.values())
    assert abs(out[1]["expected_p"] - 0.30103) < 1e-4
    # uniform digits under-represent 1 and over-represent 9 vs Benford
    assert out[1]["observed_p"] < out[1]["expected_p"]
    assert out[9]["observed_p"] > out[9]["expected_p"]
    assert all(r["chi2_term"] >= 0 for r in out.values())


def test_benford_perfect_distribution_near_zero_chi2(spark):
    from feat_spark.operators.profile import benford_audit
    from feat_spark.operators.profile import BENFORD_P

    rows = []
    for d, p in BENFORD_P.items():
        rows += [(d * 10,)] * round(p * 10000)
    df = spark.createDataFrame(rows, ["v"])
    out = benford_audit(df, "v").collect()
    assert sum(r["chi2_term"] for r in out) < 1.0  # rounding residue only


# -------------------------------------------------------------- salt_advisor


def test_salt_advisor_prescribes_ceil_division(spark):
    from feat_spark.operators.salted import salt_advisor

    rows = [("hot",)] * 25 + [("warm",)] * 10 + [("cold",)] * 3
    df = spark.createDataFrame(rows, ["k"])
    out = {r["key"]: r for r in salt_advisor(df, "k", target_rows_per_task=10, top_k=3).collect()}
    assert out["hot"]["salt_factor"] == 3 and out["hot"]["needs_salt"] is True
    assert out["warm"]["salt_factor"] == 1 and out["warm"]["needs_salt"] is False
    assert out["cold"]["salt_factor"] == 1
