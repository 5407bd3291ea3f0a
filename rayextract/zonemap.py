"""Zone maps: file-level min/max manifests for predicate-pruned reads.

The 100 TB data-skipping pattern: output files are range-clustered on a
sort/partition key at write time, a tiny manifest records each file's
[min, max] for the zone columns (harvested from the parquet FOOTERS the
writer already produced — no second data pass), and a range query opens
only the files whose zones overlap the predicate. At fleet scale this is
the difference between scanning 100 TB and scanning the ~0.1% of files a
time/length/key-range filter actually touches.

Multi-column boxes compose: a file survives only if EVERY predicated
column overlaps. Single-key clustering makes one column tight per file;
``z_interleave16`` provides the z-order (Morton) clustering key that keeps
SEVERAL columns simultaneously tight, so multi-dimensional boxes prune too
— the lakehouse Z-ORDER pattern: the z-key only drives clustering, pruning
still reads plain per-column stats.

Ray-Data shape: the write is a normal partitioned ``write_parquet``; the
manifest scan reads only footer metadata (KB per file); the pruned read is
a plain ``read_parquet(paths)`` over the surviving file list, with the
residual row-level filter applied vectorized inside the scan tasks (zone
pruning is necessarily conservative — files are skipped only when provably
disjoint).
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pyarrow.parquet as pq

MANIFEST = "_zonemap.json"


def z_interleave16(a, b):
    """Morton/z-order key: interleave the low 16 bits of two non-negative
    int arrays (a gets the even bit positions). Vectorized, int64 out."""
    a = np.asarray(a, dtype=np.int64)
    b = np.asarray(b, dtype=np.int64)
    z = np.zeros_like(a)
    for i in range(16):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def z_interleave16_sql(a_expr: str, b_expr: str) -> str:
    """The same Morton key as a DuckDB integer expression (for oracles)."""
    # NB: DuckDB/Postgres give &, |, <<, >> EQUAL precedence (left-assoc),
    # so every term must be fully parenthesized
    terms = []
    for i in range(16):
        terms.append(f"(((({a_expr}) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((({b_expr}) >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"


def build_manifest(out_dir: str, zone_cols: "str | list[str]") -> list[dict]:
    """Harvest per-file [min, max] of each zone column from parquet footers
    and persist them as ``_zonemap.json`` next to the data."""
    if isinstance(zone_cols, str):
        zone_cols = [zone_cols]
    entries = []
    for path in sorted(
        glob.glob(os.path.join(out_dir, "**", "*.parquet"), recursive=True)
    ):
        md = pq.read_metadata(path)
        names = md.schema.to_arrow_schema().names
        stats: dict = {}
        for col in zone_cols:
            ci = names.index(col)
            lo = hi = None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ci).statistics
                if st is None or not st.has_min_max:
                    lo = hi = None
                    break  # a file without stats can never be pruned
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            stats[col] = {"min": lo, "max": hi}
        entries.append({"path": os.path.relpath(path, out_dir), "stats": stats})
    with open(os.path.join(out_dir, MANIFEST), "w") as f:
        json.dump({"zone_cols": zone_cols, "files": entries}, f)
    return entries


def pruned_paths(
    out_dir: str, preds: "dict[str, tuple] | None" = None
) -> tuple[list[str], int]:
    """Files overlapping EVERY [lo, hi) predicate in ``preds`` — plus the
    total file count, so callers can report (and tests can assert) the
    skip ratio. Files with missing stats are conservatively kept."""
    with open(os.path.join(out_dir, MANIFEST)) as f:
        m = json.load(f)

    def survives(e: dict) -> bool:
        for col, (lo, hi) in (preds or {}).items():
            st = e["stats"][col]
            if st["min"] is None:
                continue
            if not (st["min"] < hi and st["max"] >= lo):
                return False
        return True

    keep = [os.path.join(out_dir, e["path"]) for e in m["files"] if survives(e)]
    return keep, len(m["files"])


def pruned_dirs(
    out_dir: str, preds: "dict[str, tuple]"
) -> tuple[list[str], int, int]:
    """Directory-granularity pruning: aggregate each partition directory's
    file stats to a dir-level [min, max] per column and keep/skip WHOLE
    dirs. Coarser than per-file pruning but exactly reproducible from the
    data alone (dir stats == data min/max of the partition), which is what
    an arithmetic oracle can mirror; use it when the partition value is a
    derived clustering key (z-order bands) rather than the predicate
    column itself. Returns (kept file paths, dirs kept, dirs total)."""
    with open(os.path.join(out_dir, MANIFEST)) as f:
        m = json.load(f)
    dirs: dict[str, dict] = {}
    for e in m["files"]:
        d = os.path.dirname(e["path"])
        agg = dirs.setdefault(
            d, {"paths": [], "stats": {}, "poisoned": set()}
        )
        agg["paths"].append(e["path"])
        for col, st in e["stats"].items():
            if st["min"] is None:
                agg["poisoned"].add(col)  # a stat-less file: never prune
                agg["stats"][col] = {"min": None, "max": None}
                continue
            if col in agg["poisoned"]:
                continue
            cur = agg["stats"].setdefault(col, {"min": st["min"],
                                                "max": st["max"]})
            cur["min"] = min(cur["min"], st["min"])
            cur["max"] = max(cur["max"], st["max"])

    def survives(stats: dict) -> bool:
        for col, (lo, hi) in preds.items():
            st = stats[col]
            if st["min"] is None:
                continue
            if not (st["min"] < hi and st["max"] >= lo):
                return False
        return True

    keep_paths: list[str] = []
    kept = 0
    for d, agg in dirs.items():
        if survives(agg["stats"]):
            kept += 1
            keep_paths.extend(os.path.join(out_dir, p) for p in agg["paths"])
    return keep_paths, kept, len(dirs)
