"""The scaling campaign publishes rows under a flagship-path CONTENT
hash (tools/bench_scaling.py) — not a git rev — so campaign rows stay
valid across commits that don't touch the measured code. These tests
pin the identity semantics: the closure is the real transitive import
set of the flagship pipeline, and the hash is a function of file
content only.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

import bench_scaling as B  # noqa: E402


def test_closure_contains_flagship_modules():
    closure = set(B.flagship_closure())
    # the flagship pipeline's direct imports must all be in the hash —
    # if one ever drops out, rows could be published for changed code
    for must in (
        "bench.py",
        "feat_spark/operators/asof.py",
        "feat_spark/operators/sessionize.py",
        "feat_spark/operators/windows.py",
        "feat_spark/functions/hashing.py",
        "feat_spark/session.py",
        "feat_spark/sources/synth.py",
    ):
        assert must in closure, must
    # and everything in it must exist relative to the repo root
    for rel in closure:
        assert os.path.exists(os.path.join(B.REPO, rel)), rel


def test_hash_is_stable_and_content_shaped():
    h1, h2 = B.flagship_hash(), B.flagship_hash()
    assert h1 == h2
    assert len(h1) == 12 and all(c in "0123456789abcdef" for c in h1)


def test_all_runs_excludes_rows_without_matching_fhash(tmp_path, monkeypatch):
    runs = tmp_path / "runs.jsonl"
    runs.write_text(
        '{"cpus": 2, "tps": 100.0, "turns": 10, "rev": "aaa"}\n'
        '{"cpus": 2, "tps": 200.0, "turns": 10, "rev": "bbb", "fhash": "deadbeef0000"}\n'
        '{"cpus": 8, "tps": 700.0, "turns": 10, "rev": "bbb", "fhash": "deadbeef0000"}\n'
        '{"cpus": 8, "tps": 900.0, "turns": 10, "rev": "ccc", "fhash": "feedface1111"}\n'
    )
    monkeypatch.setattr(B, "RUNS", str(runs))
    tps, revs = B.all_runs(10, fhash="deadbeef0000")
    assert tps == {2: [200.0], 8: [700.0]}
    assert revs == {"bbb"}
    # unfiltered keeps everything (the fallback path)
    tps_all, _ = B.all_runs(10)
    assert sorted(tps_all[2]) == [100.0, 200.0]
    assert sorted(tps_all[8]) == [700.0, 900.0]
