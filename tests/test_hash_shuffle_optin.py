"""RAYEXTRACT_HASH_SHUFFLE=1 opt-in must stay functional on a small session.

Regression guard for the round-2 incident: groupby without num_partitions
under the hash strategy spun 64-200 aggregator actors and starved/hung a
4-cpu session for 300+ s. Every Dataset.groupby in the engine now passes a
cluster-sized num_partitions; this subprocess smoke proves a representative
bucketed query + the fold still complete under hash shuffle at 4 cpus.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = r"""
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from rayextract import queries as Q  # import applies the context opt-in
from ray.data.context import ShuffleStrategy
assert DataContext.get_current().shuffle_strategy == ShuffleStrategy.HASH_SHUFFLE, (
    "env opt-in did not engage")
assert Q.QUERIES["e9_first_match_fold"]("/root/testdata/sf0.001").count() > 0
assert Q.QUERIES["dedup_exact"]("/root/testdata/sf0.001").count() > 0
assert Q.QUERIES["knn_cosine_topk"]("/root/testdata/sf0.001").count() > 0
print("HASH-OK")
ray.shutdown()
"""


def test_hash_shuffle_optin_smoke():
    env = dict(os.environ, RAYEXTRACT_HASH_SHUFFLE="1", PYTHONPATH=REPO)
    out = subprocess.run(
        [sys.executable, "-c", SCRIPT], env=env,
        capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "HASH-OK" in out.stdout
