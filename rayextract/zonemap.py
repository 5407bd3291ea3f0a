"""Zone maps: file-level min/max manifests for predicate-pruned reads.

The 100 TB data-skipping pattern: output files are range-clustered on a
sort/partition key at write time, a tiny manifest records each file's
[min, max] for the zone columns (harvested from the parquet FOOTERS the
writer already produced — no second data pass), and a range query opens
only the files whose zone overlaps the predicate. At fleet scale this is
the difference between scanning 100 TB and scanning the ~0.1% of files a
time/length/key-range filter actually touches.

Ray-Data shape: the write is a normal partitioned ``write_parquet`` (here
partitioned on a derived band column so ranges cluster); the manifest scan
reads only footer metadata (KB per file); the pruned read is a plain
``read_parquet(paths)`` over the surviving file list, with the residual
row-level filter applied vectorized inside the scan tasks (zone pruning is
necessarily conservative — files are skipped only when provably disjoint).
"""

from __future__ import annotations

import glob
import json
import os

import pyarrow.parquet as pq


def build_manifest(out_dir: str, zone_col: str) -> list[dict]:
    """Harvest per-file [min, max] of ``zone_col`` from parquet footers and
    persist them as ``_zonemap.json`` next to the data."""
    entries = []
    for path in sorted(
        glob.glob(os.path.join(out_dir, "**", "*.parquet"), recursive=True)
    ):
        md = pq.read_metadata(path)
        names = md.schema.to_arrow_schema().names
        ci = names.index(zone_col)
        lo = hi = None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            if st is None or not st.has_min_max:
                lo = hi = None
                break  # a file without stats can never be pruned
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        entries.append(
            {"path": os.path.relpath(path, out_dir), "min": lo, "max": hi}
        )
    with open(os.path.join(out_dir, "_zonemap.json"), "w") as f:
        json.dump({"zone_col": zone_col, "files": entries}, f)
    return entries


def pruned_paths(out_dir: str, lo, hi) -> tuple[list[str], int]:
    """Files whose zone overlaps [lo, hi) — plus the total file count, so
    callers can report (and tests can assert) the skip ratio. Files with
    missing stats are conservatively kept."""
    with open(os.path.join(out_dir, "_zonemap.json")) as f:
        m = json.load(f)
    keep = [
        os.path.join(out_dir, e["path"])
        for e in m["files"]
        if e["min"] is None or (e["min"] < hi and e["max"] >= lo)
    ]
    return keep, len(m["files"])
