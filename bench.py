"""Benchmark entrypoint (driver contract + north-rule evidence).

Prints TWO JSON lines:

1. a DETAIL line with the per-query timing map and round-over-round
   deltas (can be several KB — for humans and BENCH_r{N} archaeology);
2. a COMPACT headline line, guaranteed small, as the FINAL stdout
   line — the line automated consumers parse (the round driver's
   stdout tail is ~2 KB; round 3's headline was lost because the
   one-line format outgrew it):
    {"metric": "asof_join+windowed-feature turns/sec",
     "value": <turns/sec>, "unit": "turns/sec", "sf": <sf>,
     "turns": <n>, "flagship_sec": <sec>, "cpus": <n>,
     "n_queries": <n>, "queries_sec_sum": <sec>, ...}

* The headline metric is the north-rule pipeline — sort-merge as-of
  join (conv_attrs onto transcripts) + payload-hash features + lag /
  lead + sessionization + leakage-safe cumulative frames — over a
  deterministic synthetic transcript table (~1M turns by default,
  Zipf-skewed conversations incl. one hot key), executed end-to-end to
  a `noop` sink so nothing is collected to the driver.
* ``queries`` times a representative subset of the driver-contract
  queries at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1).

Environment knobs:
  SPARK_GRAFT_CPUS        local[] parallelism (default 32)
  SPARK_GRAFT_SF_DIR      testdata dir for the query suite
  SPARK_GRAFT_BENCH_CONVS synthetic conversation count (default 100000)
  SPARK_GRAFT_SKIP_QUERIES=1  headline pipeline only (scaling runs)
  SPARK_GRAFT_BENCH_QUERY_SET auto|headline|full (default auto)

Query-set policy (keeps bench runnable many times per session): the
pinned HEADLINE_QUERIES dozen is timed every run, stable
round-over-round; in "auto" the remaining queries rotate in quarters
keyed on the upcoming round number (newest BENCH_r{N}.json + 1), so
all of them get a fresh timing every 4 rounds without every run
paying the full ~100-query sweep. "full" times everything.

Scaling evidence (north rule: efficiency >= 0.8 from N to 4N executors)
is produced by tools/bench_scaling.py, which runs THIS file at
local[8] and local[32] on the same pre-materialized input and writes
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from feat_spark.operators.asof import asof_join  # noqa: E402
from feat_spark.operators.sessionize import sessionize  # noqa: E402
from feat_spark.operators.windows import (  # noqa: E402
    cumulative_features,
    lag_lead_features,
    with_stable_order,
)
from feat_spark.functions.hashing import spark_leaf_hash  # noqa: E402
from feat_spark.session import get_spark  # noqa: E402
from feat_spark.sources.synth import write_synth_parquet  # noqa: E402

from bench_queries import BENCH_QUERIES, HEADLINE_QUERIES  # noqa: E402


def _noop(df: DataFrame) -> None:
    """Force full execution without driver-side materialization."""
    df.write.format("noop").mode("overwrite").save()


def bench_dir(n_convs: int, mean_turns: int) -> str:
    """Materialize (once) the deterministic transcript tables used by
    every parallelism level — generation must not count as engine time
    and both cluster sizes must read byte-identical input."""
    d = f"/tmp/feat_spark_bench/convs{n_convs}_mt{mean_turns}"
    marker = os.path.join(d, "_DONE")
    if not os.path.exists(marker):
        write_synth_parquet(d, n_convs=n_convs, mean_turns=mean_turns, seed=42)
        open(marker, "w").close()
    return d


def flagship(spark, data_dir: str) -> DataFrame:
    """The north-rule feature pipeline, end to end."""
    turns = spark.read.parquet(os.path.join(data_dir, "transcripts.parquet"))
    attrs = spark.read.parquet(os.path.join(data_dir, "conv_attrs.parquet"))

    # Extract ALL text-derived features at scan time (the feature-hash
    # vector of the nested payload: whole-payload + per-field hashes),
    # then DROP the fat text column before anything shuffles: the
    # exchange carries ~5x fewer bytes and the CPU-heavy hashing runs in
    # the embarrassingly-parallel scan stage.
    feats = turns.select(
        "conv_id", "turn_idx", "ts", "role", "tool",
        spark_leaf_hash(F.concat_ws("\x1f", "role", "tool", "text")).alias("payload_hash"),
        spark_leaf_hash(F.col("text")).alias("text_hash"),
        spark_leaf_hash(F.col("role")).alias("role_hash"),
        spark_leaf_hash(F.col("tool")).alias("tool_hash"),
        F.length("text").cast("long").alias("n_chars"),
    )
    # as-of FIRST: its union-window shuffle hash-partitions by conv_id;
    # every window below shares that single exchange AND (because all of
    # them order by (turn_idx, ts) — sessionize included, via order_col)
    # one single sort. Whole pipeline: 1 shuffle + 1 sort after the scan.
    feats = asof_join(
        feats, attrs, on="conv_id", left_ts="ts", right_ts="ts",
        value_cols=["attr_hash", "plan"], strategy="union_window",
    )
    feats = with_stable_order(feats)  # stable (conv_id, turn_idx) order
    feats = lag_lead_features(
        feats, cols=["payload_hash"], offsets=[1], leads=False, tiebreak=("ts",)
    )
    feats = cumulative_features(
        feats, {"payload_hash": ["count"], "n_chars": ["sum"]}, tiebreak=("ts",)
    )
    feats = sessionize(feats, gap="30 minutes", order_col="turn_idx", tiebreak=("ts",))
    return feats


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # 100k convs ≈ 9.5M turns: big enough that the headline measures
    # data throughput, not the ~10s fixed per-job floor at 32 cores
    # (generation is one-time, cached under /tmp across invocations)
    n_convs = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "100000"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    data_dir = bench_dir(n_convs, mean_turns=30)
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=max(2 * cpus, 16))
    spark.sparkContext.setLogLevel("ERROR")
    # split the (compressed, single-file) bench input across tasks so the
    # scan stage parallelizes; at real scale the table has many files and
    # the default 128m is right, but a serial scan here would corrupt the
    # N-vs-4N scaling measurement with a constant term.
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(4 * 1024 * 1024))
    spark.conf.set("spark.sql.files.openCostInBytes", str(512 * 1024))

    # --- headline: turns/sec through the full feature pipeline -------
    n_turns = spark.read.parquet(
        os.path.join(data_dir, "transcripts.parquet")
    ).count()
    _noop(flagship(spark, data_dir).limit(1000))  # warmup: JIT + codegen caches
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _noop(flagship(spark, data_dir))
        times.append(time.perf_counter() - t0)
    flagship_sec = min(times)  # steady-state: JIT/page-cache warm
    turns_per_sec = n_turns / flagship_sec

    # --- per-query timings over the driver testdata -------------------
    # min-of-N (default 2): the round-2 driver bench timed each query
    # ONCE, cold, and produced a deltas table where 17/24 queries
    # "regressed" 20-560% from pure JIT + box-interference noise. The
    # first rep warms codegen/JIT/page cache; the min is the steady-
    # state number that round-over-round deltas can be read against.
    queries: dict[str, float] = {}
    if os.environ.get("SPARK_GRAFT_SKIP_QUERIES") != "1":
        import __spark_entry__ as E

        qs = E.queries()
        reps_q = int(os.environ.get("SPARK_GRAFT_BENCH_QUERY_REPS", "2"))
        for name in _bench_query_names():
            best = float("inf")
            for _ in range(reps_q):
                t0 = time.perf_counter()
                _noop(qs[name](spark, sf_dir))
                best = min(best, time.perf_counter() - t0)
            queries[name] = round(best, 3)

    compact = {
        "metric": "asof_join+windowed-feature turns/sec",
        "value": round(turns_per_sec, 1),
        "unit": "turns/sec",
        "sf": sf,
        "turns": n_turns,
        "flagship_sec": round(flagship_sec, 3),
        "cpus": cpus,
        "n_queries": len(queries),
        "queries_sec_sum": round(sum(queries.values()), 3),
    }
    detail = dict(compact, queries=queries)
    detail.update(_deltas_vs_previous_round(turns_per_sec, queries, n_turns, sf))
    # headline delta is small and headline-worthy; the per-query map
    # and per-query deltas stay on the detail line only
    if "headline_delta_pct" in detail:
        compact["headline_delta_pct"] = detail["headline_delta_pct"]
        compact["delta_vs"] = detail.get("prev_round")
    print(json.dumps(detail))
    # COMPACT line LAST: automated consumers (round driver tail capture,
    # tools/bench_scaling.py) parse the final stdout line, which must
    # stay well under a ~2 KB tail no matter how many queries ran
    print(json.dumps(compact))


def _round_files() -> list[str]:
    import glob
    import re

    repo = os.path.dirname(os.path.abspath(__file__))
    return sorted(
        glob.glob(os.path.join(repo, "BENCH_r*.json")),
        key=lambda p: int(re.search(r"_r(\d+)", p).group(1)),
    )


def _bench_query_names() -> tuple[str, ...]:
    """Headline dozen always; in "auto", a quarter of the rest rotates
    in, keyed on the upcoming round number, so every query is re-timed
    at least once per 4 rounds without every bench run paying the full
    sweep (the ~100-query x 2-rep sweep costs ~8 min — too slow to run
    many times per session)."""
    import re

    mode = os.environ.get("SPARK_GRAFT_BENCH_QUERY_SET", "auto")
    if mode == "full":
        return BENCH_QUERIES
    if mode == "headline":
        return HEADLINE_QUERIES
    files = _round_files()
    round_no = (
        int(re.search(r"_r(\d+)", files[-1]).group(1)) + 1 if files else 1
    )
    rest = [q for q in BENCH_QUERIES if q not in HEADLINE_QUERIES]
    return HEADLINE_QUERIES + tuple(
        q for i, q in enumerate(rest) if i % 4 == round_no % 4
    )


def _deltas_vs_previous_round(
    tps: float, queries: dict[str, float], turns: int, sf: float
) -> dict:
    """Round-over-round attribution: compare against the newest
    PARSEABLE driver-recorded BENCH_r{N}.json (r3's tail-truncated file
    has parsed=null — skip such rounds) so regressions are visible in
    the bench line itself. This box has ~2x one-sided interference —
    treat single-run deltas as indicative, not conclusive."""
    prev_name = parsed = None
    for path in reversed(_round_files()):
        try:
            prev = json.loads(open(path).read())
            cand = prev.get("parsed", prev)
            float(cand["value"])
            prev_name, parsed = os.path.basename(path), cand
            break
        except Exception:
            continue
    if parsed is None:
        return {}
    prev_tps = float(parsed["value"])
    prev_q = parsed.get("queries", {}) or {}
    out = {"prev_round": prev_name}
    # deltas only mean something on the same input: turns gates the
    # headline (smoke configs run tiny synth inputs), sf gates the
    # per-query table
    if parsed.get("turns") == turns:
        out["headline_delta_pct"] = round((tps / prev_tps - 1) * 100, 1)
    if parsed.get("sf") == sf and queries:
        out["query_sec_delta_pct"] = {
            k: round((v / prev_q[k] - 1) * 100, 1)
            for k, v in queries.items()
            if prev_q.get(k)
        }
    return out


if __name__ == "__main__":
    main()
