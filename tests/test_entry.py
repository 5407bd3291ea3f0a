"""Replicates the driver's correctness gate locally at sf0.001: run every
``queries()`` entry and compare row count, column names and an
order-insensitive value hash against ``oracle_sql()`` via DuckDB.
"""

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __ray_entry__ as entrymod  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return c


def _to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Driver-style canonicalization: columns sorted by name, rows sorted by
    all columns, NaN/NA -> None, numpy scalars -> python."""
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == object:
            df[c] = df[c].where(pd.notna(df[c]), None)
    df = df.sort_values(list(df.columns), na_position="last", kind="stable")
    return df.reset_index(drop=True)


def _values(df: pd.DataFrame) -> list:
    out = []
    for row in df.itertuples(index=False):
        canon_row = []
        for v in row:
            if v is None or (isinstance(v, float) and np.isnan(v)) or v is pd.NA:
                canon_row.append(None)
            elif isinstance(v, (np.integer,)):
                canon_row.append(int(v))
            elif isinstance(v, (np.floating,)):
                canon_row.append(float(v))
            else:
                canon_row.append(v)
        out.append(tuple(canon_row))
    return out


QUERY_NAMES = sorted(entrymod.queries().keys())
SQL_MAP = entrymod.oracle_sql()


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(name, con):
    ray_df = _to_pandas(entrymod.queries()[name](SF_DIR))
    assert ray_df is not None
    if name not in SQL_MAP:
        # rows-only contract: runs and returns a well-formed frame
        assert len(ray_df) >= 0 and len(ray_df.columns) > 0
        return
    want = con.execute(SQL_MAP[name]).df()
    got, want = _canon(ray_df), _canon(want)
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    gv, wv = _values(got), _values(want)
    mism = [i for i, (a, b) in enumerate(zip(gv, wv)) if a != b]
    assert not mism, (
        f"{name}: {len(mism)} row mismatches, first: got {gv[mism[0]]} want {wv[mism[0]]}"
    )


def test_entry_smoke():
    df = _to_pandas(entrymod.entry())
    assert len(df) > 0
    assert "conv_id" in df.columns
