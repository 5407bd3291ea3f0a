"""Bucketed group-reduce: high-cardinality grouped aggregation that scales.

Ray's ``groupby(key).aggregate(...)`` / ``map_groups`` pay a per-GROUP Python
overhead (~1 ms/group measured on Ray 2.49): fine for 25 nations, fatal for
10^8 conversations. The scalable shape used across this engine:

1. ``map_batches`` partial-aggregate (vectorized pandas groupby per batch),
   then attach ``_bucket = hash(key) % B`` (deterministic pandas hash).
2. ONE ``groupby("_bucket").map_groups`` over B buckets (B ~ 64-1024 — the
   per-group overhead is now per *bucket*), where the reduce fn runs a
   vectorized pandas groupby over the whole bucket.

Equal keys always share a bucket, so the reduce sees every partial for a key;
B bounds reducer skew (a hot key contributes at most #batches partial rows).
This is the explicit hash-partitioned combiner the 100 TB design relies on.
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np
import pandas as pd

import ray.data

BUCKET_COL = "_bucket"


def hash_bucket(df: pd.DataFrame, keys: Sequence[str], n_buckets: int) -> np.ndarray:
    """Deterministic (cross-process) bucket ids from the key columns."""
    h = pd.util.hash_pandas_object(df[list(keys)], index=False).to_numpy()
    return (h % np.uint64(n_buckets)).astype("int64")


def bucketed_group_reduce(
    ds: "ray.data.Dataset",
    keys: Sequence[str],
    batch_partial_fn: Callable[[pd.DataFrame], pd.DataFrame],
    bucket_reduce_fn: Callable[[pd.DataFrame], "pd.DataFrame | object"],
    n_buckets: int = 64,
    num_partitions: int | None = None,
    stage1_batch_size: int | None = 32768,
    reduce_format: str = "pandas",
    stage1_format: str = "pandas",
    arrow_exchange: bool = True,
) -> "ray.data.Dataset":
    """partial-per-batch -> hash-bucket shuffle -> vectorized per-bucket reduce.

    ``batch_partial_fn``: raw batch -> partial rows containing ``keys``.
    ``bucket_reduce_fn``: all partial rows of one bucket -> final rows
    (must combine per-key partials itself, vectorized).

    The exchange is ``groupby(_bucket, num_partitions=N)`` under the
    session's shuffle strategy: SORT by default (lowest fixed cost per
    exchange — see rayextract.__init__), HASH when RAYEXTRACT_HASH_SHUFFLE=1
    (explicit partition count, no sort barrier; the multi-node setting where
    per-exchange aggregator actors amortize).

    ``arrow_exchange=True`` (the DEFAULT since round 4) converts each
    stage-1 partial frame to an Arrow table before it enters the exchange:
    a pandas frame with object-dtype string columns ships as a PICKLED
    pandas block (~7x the bytes of the Arrow encoding measured on the fold
    partials — 548 vs 79 B/row) and sorts on the slower pandas path. At
    100 TB the exchange bytes are the bill, so Arrow is the default;
    callers whose partials are NOT type-stable (an all-None object column
    in one batch infers Arrow ``null`` type and conflicts with a typed
    batch at concat) must either pin partial dtypes or opt out with
    ``arrow_exchange=False``. The full 131-query selfcheck runs green under
    both settings and both shuffle strategies.
    """
    keys = list(keys)
    if reduce_format not in ("pandas", "pyarrow"):
        raise ValueError(reduce_format)
    if num_partitions is None:
        # one aggregator per core up to n_buckets: 32 aggregators on an
        # 8-cpu node thrash; on a big cluster more partitions = more spread
        try:
            import ray

            cpus = int(ray.cluster_resources().get("CPU", 8))
        except Exception:  # pragma: no cover - ray not initialised
            cpus = 8
        num_partitions = max(2, min(n_buckets, cpus))

    def stage1(df):
        # batch arrives in stage1_format; the partial fn must return a
        # pandas frame (small, one row per key per batch) for bucket stamping
        out = batch_partial_fn(df)
        out = out.reset_index(drop=True)
        out[BUCKET_COL] = hash_bucket(out, keys, n_buckets)
        if arrow_exchange:
            import pyarrow as pa

            # strip the b'pandas' schema blob: a schema carrying metadata is
            # unhashable in this pyarrow build, which defeats Ray's schema
            # dedup and logs "Failed to hash the schemas" per batch per
            # worker on the exchange (see pqio.py for the read-side twin)
            return pa.Table.from_pandas(
                out, preserve_index=False
            ).replace_schema_metadata(None)
        return out

    # big stage1 batches: the per-batch partial combine collapses more
    # duplicate keys locally, so the exchange sees fewer partial rows AND
    # fewer input blocks — the exchange's FIXED cost, not merge compute,
    # is the wall for every aggregate-sized reduce (the fold measured
    # 5.2s -> 0.75s going 8192 -> 65536 at sf0.1; round-3 default raised
    # 8192 -> 32768 for all bucketed reduces, ~23 MB of raw doc rows per
    # task heap worst case). batch_size=None (whole blocks) is WORSE when
    # upstream blocks are small — don't.
    partials = ds.map_batches(stage1, batch_format=stage1_format,
                              batch_size=stage1_batch_size)

    if reduce_format == "pyarrow":

        def stage2(g):
            return bucket_reduce_fn(g.drop_columns([BUCKET_COL]))

    else:

        def stage2(g):
            return bucket_reduce_fn(g.drop(columns=[BUCKET_COL]))

    return partials.groupby(BUCKET_COL, num_partitions=num_partitions).map_groups(
        stage2, batch_format=reduce_format
    )


def grouped_sum_count(
    ds: "ray.data.Dataset",
    keys: Sequence[str],
    sums: Sequence[str] = (),
    counts: bool = True,
    n_buckets: int = 64,
    arrow_partial: bool = False,
) -> "ray.data.Dataset":
    """Scalable sum/count groupby: output = keys + sum_<c> columns + n.

    ``arrow_partial=True``: the per-batch partial combine runs as an Arrow
    hash-aggregate on the zero-copy pyarrow batch (string-dtype pandas
    groupbys measured ~50x slower on the fold reduce); only the tiny partial
    result crosses into pandas for bucket stamping.
    """
    keys = list(keys)
    sums = list(sums)

    if arrow_partial:

        def partial(t) -> pd.DataFrame:
            aggs = [(c, "sum") for c in sums]
            if counts:
                aggs.append((keys[0], "count"))
            g = t.group_by(keys, use_threads=False).aggregate(aggs)
            df = g.to_pandas()
            ren = {f"{c}_sum": f"sum_{c}" for c in sums}
            if counts:
                ren[f"{keys[0]}_count"] = "n"
            return df.rename(columns=ren)

        stage1_format = "pyarrow"
    else:

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            agg: dict = {f"sum_{c}": (c, "sum") for c in sums}
            if counts:
                agg["n"] = (keys[0], "count")
            return df.groupby(keys, sort=False).agg(**agg).reset_index()

        stage1_format = "pandas"

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        agg: dict = {f"sum_{c}": (f"sum_{c}", "sum") for c in sums}
        if counts:
            agg["n"] = ("n", "sum")
        return g.groupby(keys, sort=False).agg(**agg).reset_index()

    return bucketed_group_reduce(
        ds, keys, partial, reduce, n_buckets, stage1_format=stage1_format
    )
