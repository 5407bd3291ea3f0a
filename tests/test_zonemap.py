"""rayextract.zonemap: footer-harvested min/max manifests + pruned reads."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


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
    assert [
        (e["stats"]["v"]["min"], e["stats"]["v"]["max"]) for e in entries
    ] == [(0, 9), (10, 19), (20, 29)]

    keep, total = pruned_paths(str(tmp_path), {"v": (12, 15)})
    assert total == 3
    assert [os.path.basename(p) for p in keep] == ["f1.parquet"]

    # boundary semantics: [lo, hi) — hi exclusive, min==hi-1 still overlaps
    keep, _ = pruned_paths(str(tmp_path), {"v": (9, 10)})
    assert [os.path.basename(p) for p in keep] == ["f0.parquet"]
    keep, _ = pruned_paths(str(tmp_path), {"v": (0, 100)})
    assert len(keep) == 3
    keep, _ = pruned_paths(str(tmp_path))  # no predicate = keep all
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
    keep, total = pruned_paths(str(tmp_path), {"v": (25, 26)})
    assert total == 4
    names = {os.path.basename(p) for p in keep}
    assert names == {"f2.parquet", "nostats.parquet"}


def test_multicolumn_box_pruning(tmp_path):
    from rayextract.zonemap import build_manifest, pruned_paths

    # files tight in both dims: (x band, y band)
    for i, (x0, y0) in enumerate([(0, 0), (0, 100), (50, 0), (50, 100)]):
        pq.write_table(
            pa.table({"x": list(range(x0, x0 + 10)),
                      "y": list(range(y0, y0 + 10))}),
            os.path.join(tmp_path, f"f{i}.parquet"),
        )
    build_manifest(str(tmp_path), ["x", "y"])
    keep, total = pruned_paths(
        str(tmp_path), {"x": (0, 20), "y": (100, 200)}
    )
    assert total == 4
    assert [os.path.basename(p) for p in keep] == ["f1.parquet"]


def test_z_interleave_matches_sql_form():
    import duckdb

    from rayextract.zonemap import z_interleave16, z_interleave16_sql

    rng = np.random.default_rng(3)
    a = rng.integers(0, 1 << 16, 200)
    b = rng.integers(0, 1 << 16, 200)
    py = z_interleave16(a, b)
    expr = z_interleave16_sql("a", "b")
    con = duckdb.connect()
    import pandas as pd

    con.register("t", pd.DataFrame({"a": a, "b": b}))
    got = con.execute(f"SELECT {expr} AS z FROM t").df()["z"].to_numpy()
    assert (got == py).all()
    # locality sanity: interleaving preserves prefix ordering on both dims
    assert z_interleave16([0], [0])[0] == 0
    assert z_interleave16([1], [0])[0] == 1
    assert z_interleave16([0], [1])[0] == 2


def test_pruned_dirs_band_granularity(tmp_path):
    from rayextract.zonemap import build_manifest, pruned_dirs

    # two band dirs, two files each; dir stats = union of file stats
    for band, starts in [("band=0", (0, 10)), ("band=1", (100, 110))]:
        d = tmp_path / band
        d.mkdir()
        for i, s in enumerate(starts):
            pq.write_table(
                pa.table({"v": list(range(s, s + 10))}),
                str(d / f"f{i}.parquet"),
            )
    build_manifest(str(tmp_path), "v")
    keep, kept, total = pruned_dirs(str(tmp_path), {"v": (105, 106)})
    assert (kept, total) == (1, 2)
    # the WHOLE surviving dir is kept, including its non-overlapping file
    assert sorted(os.path.basename(p) for p in keep) == ["f0.parquet",
                                                         "f1.parquet"]
    assert all("band=1" in p for p in keep)

    # a stat-less file poisons only its own dir (kept conservatively)
    pq.write_table(pa.table({"v": [5]}),
                   str(tmp_path / "band=0" / "nostats.parquet"),
                   write_statistics=False)
    build_manifest(str(tmp_path), "v")
    keep, kept, total = pruned_dirs(str(tmp_path), {"v": (500, 501)})
    assert kept == 1 and all("band=0" in p for p in keep)


def test_pruned_read_matches_full_scan(ray_session, tmp_path):
    import ray.data

    from rayextract.zonemap import build_manifest, pruned_paths

    _write_banded(str(tmp_path))
    build_manifest(str(tmp_path), "v")
    keep, total = pruned_paths(str(tmp_path), {"v": (10, 20)})
    assert len(keep) < total
    got = ray.data.read_parquet(keep).to_pandas()
    sub = got[(got["v"] >= 10) & (got["v"] < 20)]
    assert sorted(sub["v"].tolist()) == list(range(10, 20))
