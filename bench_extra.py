"""Per-query isolation harness for optimization work (guide §1.4).

NOT part of the driver contract: bench.py is frozen for measurement;
this file exists so OPTIMIZATION_r06.md can cite noop-sink timings and
formatted plans for individual queries without touching bench.py.

Usage:
    python bench_extra.py <query> [<query> ...] [--reps N] [--explain-only]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0),
     SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from feat_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 2
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
        args = [a for a in args if a != str(reps)]
    explain_only = "--explain-only" in sys.argv

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")

    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=max(2 * cpus, 16))
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E

    qs = E.queries()
    out: dict[str, list[float]] = {}
    for name in args:
        if explain_only:
            print(f"===== {name} =====")
            qs[name](spark, sf_dir).explain("formatted")
            continue
        times = []
        for i in range(reps):
            spark.sparkContext.setJobDescription(f"{name} rep{i}")
            # construct INSIDE the timed region, exactly like bench.py:
            # pagerank / k-means queries do real work (jobs, collects,
            # checkpoints) at construction time
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            times.append(round(time.perf_counter() - t0, 3))
            print(f"{name} rep{i}: {times[-1]}s", flush=True)
        out[name] = times
    if out:
        print(json.dumps({"sf_dir": sf_dir, "cpus": cpus, "times": out}))


if __name__ == "__main__":
    main()
