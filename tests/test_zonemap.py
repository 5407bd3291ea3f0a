"""rayextract.zonemap: footer-harvested min/max manifests + pruned reads."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_banded(tmp_path):
    # three files with disjoint value ranges
    for i, (lo, hi) in enumerate([(0, 10), (10, 20), (20, 30)]):
        pq.write_table(
            pa.table({"v": list(range(lo, hi))}),
            os.path.join(tmp_path, f"f{i}.parquet"),
        )


def test_manifest_and_pruning(tmp_path):
    from rayextract.zonemap import build_manifest, pruned_paths

    _write_banded(str(tmp_path))
    entries = build_manifest(str(tmp_path), "v")
    assert [(e["min"], e["max"]) for e in entries] == [(0, 9), (10, 19), (20, 29)]

    keep, total = pruned_paths(str(tmp_path), 12, 15)
    assert total == 3
    assert [os.path.basename(p) for p in keep] == ["f1.parquet"]

    # boundary semantics: [lo, hi) — hi exclusive, min==hi-1 still overlaps
    keep, _ = pruned_paths(str(tmp_path), 9, 10)
    assert [os.path.basename(p) for p in keep] == ["f0.parquet"]
    keep, _ = pruned_paths(str(tmp_path), 0, 100)
    assert len(keep) == 3


def test_missing_stats_kept_conservatively(tmp_path):
    from rayextract.zonemap import build_manifest, pruned_paths

    _write_banded(str(tmp_path))
    # disable stats on one file: it must never be pruned
    pq.write_table(
        pa.table({"v": [5]}),
        os.path.join(tmp_path, "nostats.parquet"),
        write_statistics=False,
    )
    build_manifest(str(tmp_path), "v")
    keep, total = pruned_paths(str(tmp_path), 25, 26)
    assert total == 4
    names = {os.path.basename(p) for p in keep}
    assert names == {"f2.parquet", "nostats.parquet"}


def test_pruned_read_matches_full_scan(ray_session, tmp_path):
    import ray.data

    from rayextract.zonemap import build_manifest, pruned_paths

    _write_banded(str(tmp_path))
    build_manifest(str(tmp_path), "v")
    keep, total = pruned_paths(str(tmp_path), 10, 20)
    assert len(keep) < total
    got = ray.data.read_parquet(keep).to_pandas()
    sub = got[(got["v"] >= 10) & (got["v"] < 20)]
    assert sorted(sub["v"].tolist()) == list(range(10, 20))
