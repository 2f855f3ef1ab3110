"""End-to-end evidence for the packaging clause of the north rule
(BASELINE.json:6,14: "packaged for spark-submit --py-files", "run via
spark-submit --py-files"): build the real zip with `python -m
feat_spark zip`, then run the featurize pipeline through an actual
`spark-submit --py-files` subprocess from a working directory where
the package is ONLY importable from that zip (PYTHONPATH stripped), and
re-run to prove the checkpoint manifest makes the job exactly-once
resumable across driver restarts — the same protocol a multi-executor
cluster submission uses, minus the cluster.

Kept deliberately tiny (50 convs, 4 buckets, local[2]) because each
spark-submit is its own JVM; the correctness of the pipeline itself is
covered by test_flagship/test_checkpoint — this file tests the
PACKAGING seam those in-process tests cannot reach.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    shutil.which("spark-submit") is None, reason="spark-submit not on PATH"
)


def _clean_env() -> dict:
    env = dict(os.environ)
    # force feat_spark to resolve from the --py-files zip, not the repo
    env.pop("PYTHONPATH", None)
    return env


def _submit(tmp: str, zip_path: str, *args: str) -> str:
    cmd = [
        "spark-submit", "--master", "local[2]",
        "--py-files", zip_path,
        os.path.join(tmp, "run_main.py"), *args,
    ]
    out = subprocess.run(
        cmd, cwd=tmp, env=_clean_env(), capture_output=True, text=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return out.stdout


def test_spark_submit_py_files_featurize_and_resume(tmp_path):
    tmp = str(tmp_path)
    # build the zip exactly as the docs say: python -m feat_spark zip
    out = subprocess.run(
        [sys.executable, "-m", "feat_spark", "zip"],
        cwd=tmp, env={**_clean_env(), "PYTHONPATH": REPO},
        capture_output=True, text=True, timeout=120,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    zip_path = json.loads(out.stdout.strip().splitlines()[-1])["py_files"]
    assert os.path.exists(zip_path)

    # synth input (pyarrow writer, no Spark needed)
    sub = subprocess.run(
        [sys.executable, "-m", "feat_spark", "synth",
         "--out", os.path.join(tmp, "data"), "--convs", "50",
         "--mean-turns", "8"],
        cwd=tmp, env={**_clean_env(), "PYTHONPATH": REPO},
        capture_output=True, text=True, timeout=120,
    )
    assert sub.returncode == 0, sub.stderr[-2000:]

    # the submitted script is the package's own __main__, shipped as a
    # plain file (the package it imports comes from the zip)
    shutil.copy(
        os.path.join(REPO, "feat_spark", "__main__.py"),
        os.path.join(tmp, "run_main.py"),
    )

    common = [
        "featurize", "--cluster",
        "--input", os.path.join(tmp, "data", "transcripts.parquet"),
        "--attrs", os.path.join(tmp, "data", "conv_attrs.parquet"),
        "--output", os.path.join(tmp, "out"),
        "--manifest", os.path.join(tmp, "manifest.json"),
        "--buckets", "4",
    ]

    first = _submit(tmp, zip_path, *common)
    run1 = json.loads(
        next(l for l in first.splitlines() if l.startswith('{"run"'))
    )["run"]
    assert run1["buckets_done"] == 4 and run1["buckets_skipped"] == 0
    assert run1["rows"] > 0
    # per-partition lineage JSON lines follow the run metrics
    lineage = [
        json.loads(l) for l in first.splitlines() if l.startswith('{"_bucket"')
    ]
    assert len(lineage) == 4
    assert sum(r["rows_out"] for r in lineage) == run1["rows"]

    # exactly-once resume: a fresh driver run over the same manifest
    # must skip every bucket and write nothing
    second = _submit(tmp, zip_path, *common)
    run2 = json.loads(
        next(l for l in second.splitlines() if l.startswith('{"run"'))
    )["run"]
    assert run2["buckets_done"] == 0 and run2["buckets_skipped"] == 4
    assert run2["rows"] == 0
