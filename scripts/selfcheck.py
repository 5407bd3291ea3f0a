#!/usr/bin/env python
"""Self-check mirroring the driver's correctness gate.

Runs every ``queries()`` entry from __ray_entry__ against its ``oracle_sql()``
DuckDB equivalent on the same parquet tables and compares row count, sorted
column names, and a value hash (rows sorted by all columns, values stringified
with float rounding). Queries without SQL get a rows-only check.

Usage: python scripts/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_df(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> tuple[int, list[str], str]:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            df[c] = np.round(s.astype("float64"), 6)
        elif pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype(str)
    df = df.astype(str)
    rows = sorted(map("\x1f".join, df.itertuples(index=False, name=None)))
    h = hashlib.sha256("\x1e".join(rows).encode()).hexdigest()[:16]
    return len(df), list(df.columns), h


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    qs, sqls = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            rdf = to_df(fn(sf_dir))
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: ray error {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        if name not in sqls:
            print(f"ROWS {name}: {len(rdf)} rows (no oracle)")
            n_pass += 1
            continue
        try:
            odf = con.execute(sqls[name]).fetchdf()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: oracle error {ex}")
            n_fail += 1
            continue
        rn, rc, rh = canon(rdf)
        on, oc, oh = canon(odf)
        if rc != oc:
            print(f"FAIL {name}: columns ray={rc} oracle={oc}")
            n_fail += 1
        elif rn != on:
            print(f"FAIL {name}: rows ray={rn} oracle={on}")
            n_fail += 1
        elif rh != oh:
            print(f"FAIL {name}: value hash mismatch ({rn} rows)")
            n_fail += 1
        else:
            print(f"PASS {name}: {rn} rows")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
