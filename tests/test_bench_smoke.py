"""bench.py harness smoke: the driver runs it per round — import/path breaks
must be caught by the suite, not by a lost benchmarking round."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_module_loads_and_helpers_work():
    # plain import (multiprocessing pickles bench._burn by qualified name, so
    # the module must load under its canonical name)
    sys.path.insert(0, REPO)
    try:
        import bench as b
    finally:
        sys.path.remove(REPO)
    assert b._sf_name()
    assert b.corpus_dir().startswith("/tmp/")
    assert 0 < b._hw_scaling_ceiling(1, 2, n=200_000) <= 1.0


def test_bench_runs_end_to_end_tiny():
    """Full bench subprocess at a tiny corpus: one JSON line with the
    contract fields. ~60-90s; this is the driver's exact entry path."""
    env = dict(
        os.environ,
        GRAFT_SF_DIR="/root/testdata/sf0.001",
        RAY_GRAFT_CPUS="4",
        RAYEXTRACT_BENCH_CONVS="300",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=420,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    for key in ("metric", "value", "unit", "queries", "sf", "num_cpus",
                "n_turns", "turns_per_sec"):
        assert key in rec, key
    assert rec["unit"] == "sec" and rec["value"] > 0
