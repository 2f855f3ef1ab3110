"""Unit tests: label construction (time_to_event, negative_sample),
word co-occurrence PMI, random projection, snapshot diff, and exact
rolling distinct counts."""

import datetime as dt
import hashlib
import math

import pyspark.sql.functions as F
import pytest

from feat_spark.operators.labels import negative_sample, time_to_event


def _ts(s):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


class TestTimeToEvent:
    def test_basic_censoring_and_strict_future(self, spark):
        rows = [
            # user 1: event at t=0, purchase at t=10, purchase at t=25,
            # trailing event at t=30 with nothing after -> censored
            (1, 1, _ts(0), "view"),
            (2, 1, _ts(10), "purchase"),
            (3, 1, _ts(25), "purchase"),
            (4, 1, _ts(30), "view"),
            # user 2: no purchase at all -> censored
            (5, 2, _ts(0), "view"),
        ]
        df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp, event_type string")
        out = time_to_event(
            df, entity_col="user_id", ts_col="ts", id_col="event_id",
            target_filter=F.col("event_type") == "purchase", horizon_sec=100,
        )
        got = {r["event_id"]: (r["tte_sec"], r["observed"]) for r in out.collect()}
        assert got[1] == (10, True)
        # a purchase's own label looks STRICTLY forward to the next one
        assert got[2] == (15, True)
        assert got[3] == (100, False)
        assert got[4] == (100, False)
        assert got[5] == (100, False)

    def test_horizon_cap(self, spark):
        rows = [(1, 1, _ts(0), "view"), (2, 1, _ts(500), "purchase")]
        df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp, event_type string")
        out = time_to_event(
            df, entity_col="user_id", ts_col="ts", id_col="event_id",
            target_filter=F.col("event_type") == "purchase", horizon_sec=100,
        )
        got = {r["event_id"]: (r["tte_sec"], r["observed"]) for r in out.collect()}
        # a purchase exists but beyond the horizon: censored at horizon
        assert got[1] == (100, False)


class TestNegativeSample:
    def _frames(self, spark):
        pos = spark.createDataFrame(
            [(1, 10), (1, 11), (2, 10)], "user long, item long"
        )
        cat = spark.createDataFrame([(i,) for i in range(20)], "doc long")
        return pos, cat

    def test_contract(self, spark):
        pos, cat = self._frames(spark)
        out = negative_sample(
            pos, cat, entity_col="user", item_col="item",
            catalog_item_col="doc", k=4,
        ).collect()
        pos_set = {(1, 10), (1, 11), (2, 10)}
        by_pair = {}
        for r in out:
            assert (r["user"], r["neg_item"]) not in pos_set
            assert 0 <= r["neg_item"] < 20
            by_pair.setdefault((r["user"], r["item"]), []).append(r["neg_item"])
        for negs in by_pair.values():
            assert 1 <= len(negs) <= 4
            assert len(set(negs)) == len(negs)

    def test_deterministic(self, spark):
        pos, cat = self._frames(spark)
        kw = dict(entity_col="user", item_col="item", catalog_item_col="doc", k=3)
        a = sorted(map(tuple, negative_sample(pos, cat, **kw).collect()))
        b = sorted(map(tuple, negative_sample(pos.repartition(7), cat, **kw).collect()))
        assert a == b and len(a) > 0


class TestCooccurrencePMI:
    def test_counts_and_formula(self, spark):
        from feat_spark.operators.cooccur import cooccurrence_pmi

        docs = [(i, "alpha beta") for i in range(4)] + [
            (4, "alpha gamma"), (5, "beta gamma"), (6, "delta")
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        out = {(r["word_a"], r["word_b"]): r for r in
               cooccurrence_pmi(df, per_doc=5, min_pairs=2).collect()}
        assert set(out) == {("alpha", "beta")}
        r = out[("alpha", "beta")]
        # n_ab=4, N=7, n_alpha=5, n_beta=5
        assert r["n_ab"] == 4
        assert r["pmi"] == pytest.approx(round(math.log(4 * 7 / 25), 6), abs=1e-9)

    def test_per_doc_cap(self, spark):
        from feat_spark.operators.cooccur import cooccurrence_pmi

        # 'x y' dominate each doc; 'z' appears once per doc and is
        # capped out at per_doc=2, so no pair involving z survives
        docs = [(i, "x x y y z") for i in range(5)]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        out = cooccurrence_pmi(df, per_doc=2, min_pairs=2).collect()
        assert {(r["word_a"], r["word_b"]) for r in out} == {("x", "y")}


class TestRandomProjection:
    def test_one_hot_reads_signs(self, spark):
        from feat_spark.operators.similarity import random_project

        dim = 8
        rows = [(i, [1.0 if j == i else 0.0 for j in range(dim)]) for i in range(dim)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        out = {r["vec_id"]: r["proj"] for r in
               random_project(df, in_dim=dim, out_dim=3, seed="t").collect()}

        def sign(j, i):
            h = int(hashlib.md5(f"t:{j}:{i}".encode()).hexdigest()[:8], 16)
            return 1.0 if h % 2 == 1 else -1.0

        for i in range(dim):
            assert out[i] == [sign(j, i) for j in range(3)]

    def test_linearity(self, spark):
        from feat_spark.operators.similarity import random_project

        df = spark.createDataFrame(
            [(1, [1.0, 2.0, -3.0, 0.5])], "vec_id long, embedding array<double>"
        )
        (r,) = random_project(df, in_dim=4, out_dim=2, seed="t").collect()

        def sign(j, i):
            h = int(hashlib.md5(f"t:{j}:{i}".encode()).hexdigest()[:8], 16)
            return 1.0 if h % 2 == 1 else -1.0

        v = [1.0, 2.0, -3.0, 0.5]
        want = [round(sum(v[i] * sign(j, i) for i in range(4)), 6) for j in range(2)]
        assert r["proj"] == want


class TestSnapshotDiff:
    def test_statuses(self, spark):
        from feat_spark.plans.snapshot import snapshot_diff

        old = spark.createDataFrame(
            [(1, "a", 1.0), (2, "b", None), (3, "c", 3.0), (4, "d", 4.0)],
            "id long, t string, v double",
        )
        new = spark.createDataFrame(
            [(1, "a", 1.0), (2, "b", 2.0), (3, "cc", 3.5), (5, "e", 5.0)],
            "id long, t string, v double",
        )
        out = {r["id"]: r for r in snapshot_diff(old, new, ["id"]).collect()}
        assert set(out) == {2, 3, 4, 5}  # id=1 unchanged, dropped
        assert out[2]["status"] == "changed"          # NULL -> value
        assert out[2]["changed_cols"] == ["v"]
        assert out[3]["status"] == "changed"
        assert out[3]["changed_cols"] == ["t", "v"]
        assert out[4]["status"] == "removed"
        assert out[4]["changed_cols"] == []
        assert out[5]["status"] == "added"
        assert out[5]["changed_cols"] == []

    def test_null_key_matches_null_key(self, spark):
        from feat_spark.plans.snapshot import snapshot_diff

        old = spark.createDataFrame([(None, "x")], "id long, t string")
        new = spark.createDataFrame([(None, "y")], "id long, t string")
        (r,) = snapshot_diff(old, new, ["id"]).collect()
        assert r["status"] == "changed" and r["changed_cols"] == ["t"]


class TestRollingDistinct:
    def test_matches_bruteforce(self, spark):
        from feat_spark.operators.windows import rolling_distinct_count

        # (group, user, day): reappearances inside the window must not
        # double-count; a > window gap must split the segment
        data = [
            ("a", 1, 0), ("a", 1, 2), ("a", 2, 2), ("a", 1, 20),
            ("a", 3, 21), ("b", 1, 5), ("b", 2, 11),
        ]
        rows = [
            (g, u, dt.datetime(2024, 1, 1) + dt.timedelta(days=d, hours=3))
            for g, u, d in data
        ]
        df = spark.createDataFrame(rows, "g string, u long, ts timestamp")
        out = rolling_distinct_count(
            df, group_col="g", entity_col="u", ts_col="ts",
            window_days=7, out_col="n",
        ).collect()
        base = dt.date(2024, 1, 1)
        got = {(r["g"], (r["day"] - base).days): r["n"] for r in out}
        want = {}
        days_present = {(g, d) for g, _, d in data}
        for g, d in days_present:
            want[(g, d)] = len(
                {u for g2, u, d2 in data if g2 == g and d - 6 <= d2 <= d}
            )
        assert got == want


class TestRemoveDuplicateSpans:
    def test_shared_span_removed_order_kept(self, spark):
        from feat_spark.operators.dedup import remove_duplicate_spans

        docs = [
            (1, "p q a b c x y"),
            (2, "m a b c n o"),
            (3, "u v w"),          # shorter than n: passes through
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        out = {r["doc_id"]: r for r in
               remove_duplicate_spans(df, n=3, max_occurrences=1).collect()}
        # 'a b c' occurs in docs 1 and 2 -> masked in both; the words
        # it covers vanish, everything else survives in order
        assert out[1]["clean_text"] == "p q x y"
        assert out[1]["n_removed"] == 3 and out[1]["n_words"] == 7
        assert out[2]["clean_text"] == "m n o"
        assert out[3]["clean_text"] == "u v w"
        assert out[3]["n_removed"] == 0

    def test_within_doc_repetition(self, spark):
        from feat_spark.operators.dedup import remove_duplicate_spans

        df = spark.createDataFrame(
            [(1, "a b c z a b c")], "doc_id long, text string"
        )
        (r,) = remove_duplicate_spans(df, n=3, max_occurrences=1).collect()
        # 'a b c' occurs twice within the doc -> both copies masked
        assert r["clean_text"] == "z"
        assert r["n_removed"] == 6

    def test_fully_removed_doc(self, spark):
        from feat_spark.operators.dedup import remove_duplicate_spans

        df = spark.createDataFrame(
            [(1, "a b c"), (2, "a b c")], "doc_id long, text string"
        )
        out = {r["doc_id"]: r for r in
               remove_duplicate_spans(df, n=3, max_occurrences=1).collect()}
        assert out[1]["clean_text"] == "" and out[1]["n_removed"] == 3
        assert out[2]["clean_text"] == ""


class TestTableFingerprint:
    def test_order_and_layout_invariant(self, spark):
        from feat_spark.plans.audit import table_fingerprint

        df = spark.createDataFrame(
            [(i, f"t{i % 3}", f"p{i}") for i in range(100)],
            "id long, grp string, payload string",
        )
        a = {r["grp"]: (r["n_rows"], r["fingerprint"]) for r in
             table_fingerprint(df, group_by="grp").collect()}
        shuffled = df.orderBy(F.rand(7)).repartition(13)
        b = {r["grp"]: (r["n_rows"], r["fingerprint"]) for r in
             table_fingerprint(shuffled, group_by="grp").collect()}
        assert a == b and len(a) == 3

    def test_sensitive_to_any_cell(self, spark):
        from feat_spark.plans.audit import table_fingerprint

        df1 = spark.createDataFrame([(1, "x"), (2, "y")], "id long, v string")
        df2 = spark.createDataFrame([(1, "x"), (2, "z")], "id long, v string")
        (f1,) = table_fingerprint(df1).collect()
        (f2,) = table_fingerprint(df2).collect()
        assert f1["fingerprint"] != f2["fingerprint"]
        assert f1["n_rows"] == f2["n_rows"] == 2

    def test_null_distinct_from_empty(self, spark):
        from feat_spark.plans.audit import table_fingerprint

        df1 = spark.createDataFrame([(1, None)], "id long, v string")
        df2 = spark.createDataFrame([(1, "")], "id long, v string")
        (f1,) = table_fingerprint(df1).collect()
        (f2,) = table_fingerprint(df2).collect()
        assert f1["fingerprint"] != f2["fingerprint"]
