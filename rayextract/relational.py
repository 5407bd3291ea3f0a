"""Relational helpers in Ray-Data idiom: broadcast joins, pre-aggregated
groupbys, deterministic top-k.

These back the engine-breadth queries in queries.py. Patterns:

- **broadcast_join**: small side ``ray.put`` once, pandas merge per batch —
  no shuffle (the E7 lookup generalized to arbitrary dimension tables).
- **pre_aggregate**: batch-level pandas groupby partials, then ONE small
  ``groupby().aggregate(Sum/...)`` over partials — the combiner pattern that
  keeps the wide exchange tiny at 100 TB.
- **topk**: per-batch partial top-k, then a driver-side final merge of the
  small partial set (k rows per batch).
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd

import ray
import ray.data


def broadcast_join(
    ds: "ray.data.Dataset",
    small: pd.DataFrame,
    on: str | list[str],
    how: str = "inner",
) -> "ray.data.Dataset":
    """Map-side hash join against a broadcast dimension table."""
    ref = ray.put(small)

    def join_batch(df: pd.DataFrame) -> pd.DataFrame:
        return df.merge(ray.get(ref), on=on, how=how)

    return ds.map_batches(join_batch, batch_format="pandas")


def broadcast_semi_join(
    ds: "ray.data.Dataset", keys: set, col: str, anti: bool = False
) -> "ray.data.Dataset":
    """Semi/anti join: broadcast the key set, filter inside map_batches."""
    ref = ray.put(keys)

    def filt(df: pd.DataFrame) -> pd.DataFrame:
        mask = df[col].isin(ray.get(ref))
        return df[~mask] if anti else df[mask]

    return ds.map_batches(filt, batch_format="pandas")


def pre_aggregate(
    ds: "ray.data.Dataset",
    keys: Sequence[str],
    sums: Sequence[str] = (),
    counts: bool = True,
) -> "ray.data.Dataset":
    """Two-level sum/count groupby via the bucketed combiner (bucketed.py):
    per-batch pandas partials, hash-bucket shuffle, vectorized per-bucket
    merge. Output columns: keys + [f"sum_{c}"] + (["n"] if counts).
    """
    from .bucketed import grouped_sum_count

    return grouped_sum_count(ds, list(keys), sums=list(sums), counts=counts)


def topk(
    ds: "ray.data.Dataset",
    by: str,
    k: int,
    descending: bool = True,
    tiebreak: str | None = None,
) -> pd.DataFrame:
    """Deterministic global top-k: per-batch partial top-k (k rows leave each
    batch), final merge on the driver over the tiny partial set."""
    cols_sort = [by] + ([tiebreak] if tiebreak else [])
    asc = [not descending] + ([True] if tiebreak else [])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(cols_sort, ascending=asc, kind="stable").head(k)

    small = ds.map_batches(partial, batch_format="pandas").to_pandas()
    return (
        small.sort_values(cols_sort, ascending=asc, kind="stable")
        .head(k)
        .reset_index(drop=True)
    )
