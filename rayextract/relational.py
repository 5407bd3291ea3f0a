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
    """Two-level sum/count: batch partials -> tiny groupby over partials.

    Output columns: keys + [f"sum_{c}"] + (["n"] if counts).
    """
    sums = list(sums)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        agg: dict = {f"sum_{c}": (c, "sum") for c in sums}
        if counts:
            agg["n"] = (keys[0], "count")
        return df.groupby(list(keys), sort=False).agg(**agg).reset_index()

    partials = ds.map_batches(partial, batch_format="pandas")
    from ray.data.aggregate import Sum

    aggs = [Sum(f"sum_{c}", alias_name=f"sum_{c}") for c in sums]
    if counts:
        aggs.append(Sum("n", alias_name="n"))
    return partials.groupby(list(keys)).aggregate(*aggs)


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
