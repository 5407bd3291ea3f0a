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


def join_partitions(cap: int = 16) -> int:
    """Hash-join partition count sized to the cluster (one per core, capped);
    Ray's ``Dataset.join`` requires an explicit ``num_partitions``.

    Cap default 16: Ray's join spins one aggregator actor per partition and
    the pool is NOT reused across datasets — measured on q5 at sf0.1/32cpu:
    32 partitions ~10s wall vs 16 ~4.7s vs 8 ~3.9s (spin-up dominates until
    partitions carry >~100MB each). On a multi-node cluster pass an explicit
    higher cap sized to aggregate memory, not cores."""
    try:
        import ray

        return max(2, min(cap, int(ray.cluster_resources().get("CPU", 8))))
    except Exception:  # pragma: no cover - ray not initialised
        return 8


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
    arrow_partial: bool = False,
) -> "ray.data.Dataset":
    """Two-level sum/count groupby via the bucketed combiner (bucketed.py):
    per-batch partials (Arrow hash-aggregate when ``arrow_partial``),
    hash-bucket shuffle, vectorized per-bucket merge. Output columns:
    keys + [f"sum_{c}"] + (["n"] if counts).
    """
    from .bucketed import grouped_sum_count

    return grouped_sum_count(
        ds, list(keys), sums=list(sums), counts=counts, arrow_partial=arrow_partial
    )


def asof_join_by_key(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    key: str,
    on: str,
    left_cols: Sequence[str],
    right_col: str,
    right_out: str,
    allow_exact: bool = False,
) -> "ray.data.Dataset":
    """Per-key backward as-of join (an operator Ray Data lacks natively).

    For each left row, attach the right row with the greatest ``on`` value
    strictly less than (or equal, if ``allow_exact``) the left's ``on``,
    within the same ``key``. Implementation: tag side inside ``map_batches``,
    union the streams, ONE hash-bucket shuffle on ``key``, then a single
    vectorized ``pd.merge_asof(..., by=key)`` over each whole bucket — no
    per-key Python dispatch (round 1 paid ~1 ms per key in
    ``groupby(key).map_groups``, fatal at 10^8 keys).

    PARTITIONING ASSUMPTION: a key's rows share a bucket (hash-partitioned);
    a single hot key is bounded by the bucket, not salted — as-of needs the
    whole key ordered.
    """
    from .bucketed import bucketed_group_reduce

    def tag(side: str, cols: Sequence[str]):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            out = df[list(cols)].copy()
            out["_side"] = side
            return out

        return fn

    lt = left.map_batches(tag("l", [key, on, *left_cols]), batch_format="pandas")
    rt = right.map_batches(tag("r", [key, on, right_col]), batch_format="pandas")

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["_side"] == "l"]
        r = g[g["_side"] == "r"]
        l = l.sort_values([on], kind="stable")[[key, on, *left_cols]]
        # dedupe equal (key, on) pairs deterministically: keep max right_col;
        # rename BEFORE the merge so a same-named left column can't collide
        r = (
            r.sort_values([on, right_col], kind="stable")
            .drop_duplicates([key, on], keep="last")[[key, on, right_col]]
            .rename(columns={right_col: right_out})
        )
        if not len(l):
            return pd.DataFrame(columns=[*left_cols, right_out])
        merged = pd.merge_asof(
            l, r, on=on, by=key,
            direction="backward", allow_exact_matches=allow_exact,
        )
        return merged[[*left_cols, right_out]]

    return bucketed_group_reduce(
        lt.union(rt), [key], lambda df: df, per_bucket, n_buckets=64,
    )


def range_join_broadcast(
    ds: "ray.data.Dataset",
    ranges: pd.DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    out_cols: Sequence[str],
) -> "ray.data.Dataset":
    """Range (interval) join — an operator Ray Data lacks natively: attach
    the range row whose [lo, hi) interval contains each input row's value.

    Implementation for the overwhelmingly common shape (small, NON-OVERLAPPING
    interval table — price bands, latency buckets, date epochs): intervals are
    sorted once, broadcast via ``ray.put``, and each batch resolves membership
    with one vectorized ``np.searchsorted`` against the interval starts — no
    shuffle, O(rows log intervals). Rows outside every interval get nulls
    (left join semantics). For a LARGE interval side, range-partition both
    sides on the interval key space and apply this per partition (same
    co-partitioning contract as the as-of join above).
    """
    import numpy as np

    r = ranges.sort_values(lo_col, kind="stable").reset_index(drop=True)
    lo = r[lo_col].to_numpy()
    hi = r[hi_col].to_numpy()
    if (lo[1:] < hi[:-1]).any():
        raise ValueError("range_join_broadcast requires non-overlapping intervals")
    payload = {c: r[c].to_numpy() for c in out_cols}
    ref = ray.put((lo, hi, payload))

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        lo_, hi_, pay = ray.get(ref)
        v = df[value_col].to_numpy()
        idx = np.searchsorted(lo_, v, side="right") - 1
        ok = (idx >= 0) & (v < hi_[np.clip(idx, 0, len(hi_) - 1)])
        out = df.copy()
        for c, arr in pay.items():
            col = pd.Series(arr[np.clip(idx, 0, len(arr) - 1)])
            col[~ok] = None
            out[c] = col.to_numpy()
        return out

    return ds.map_batches(attach, batch_format="pandas")


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


def copartition_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: str,
    left_cols: Sequence[str],
    right_cols: Sequence[str],
    n_buckets: int = 64,
) -> "ray.data.Dataset":
    """Generic big-big inner equi-join as ONE tagged-union bucketed
    exchange (the q7/q8/q9 pattern extracted): both sides project to
    (key + payload + side tag), union, hash-bucket on the key, and each
    bucket runs a single vectorized pandas merge. No aggregator-actor
    pool spin-up (unlike Dataset.join) and the exchange carries only the
    projected columns.

    PARTITIONING ASSUMPTION: equal keys co-locate; one hot key is bounded
    by its bucket (salt upstream if a single key's rows exceed a worker's
    heap)."""
    from .bucketed import bucketed_group_reduce

    lcols, rcols = list(left_cols), list(right_cols)

    def tag(side: str, cols: Sequence[str]):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            out = df[[on, *cols]].copy()
            out["_side"] = side
            return out

        return fn

    both = left.map_batches(tag("l", lcols), batch_format="pandas").union(
        right.map_batches(tag("r", rcols), batch_format="pandas")
    )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        l = g.loc[g["_side"] == "l", [on, *lcols]]
        r = g.loc[g["_side"] == "r", [on, *rcols]]
        return l.merge(r, on=on)

    return bucketed_group_reduce(
        both, [on], lambda df: df, per_bucket, n_buckets=n_buckets,
        arrow_exchange=False,
    )


def auto_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: str,
    left_cols: Sequence[str],
    right_cols: Sequence[str],
    broadcast_threshold_rows: int = 1_000_000,
) -> "ray.data.Dataset":
    """Size-aware join strategy selection — the optimizer-lite dispatch
    this engine's queries otherwise hand-pick: count the build (right)
    side (metadata-cheap on parquet reads) and either broadcast it via
    ``ray.put`` + map-side merge (no shuffle at all) or fall back to the
    co-partition tagged-union exchange. The default threshold is sized
    so the broadcast table stays ~tens of MB in every worker heap; at
    multi-node scale pass a threshold derived from worker memory, not a
    constant. Both paths produce identical rows (pytest-pinned)."""
    n = right.count()
    if n <= broadcast_threshold_rows:
        small = right.to_pandas()[[on, *list(right_cols)]]
        return broadcast_join(
            left.map_batches(
                lambda df, c=[on, *list(left_cols)]: df[c],
                batch_format="pandas",
            ),
            small, on=on,
        )
    return copartition_join(left, right, on, left_cols, right_cols)


def global_rank(
    ds: "ray.data.Dataset",
    value_col: str,
    id_col: str,
    bin_width: int,
    keep_cols: Sequence[str] = (),
    out_rank: str = "rank",
    n_buckets: int = 64,
) -> tuple["ray.data.Dataset", int]:
    """Distributed global row_number() ORDER BY (value_col, id_col) — an
    operator Ray Data lacks natively. Returns (ranked dataset, total rows).

    The canonical two-pass range-partition rank:

    1. Pass 1 counts rows per fixed-width value bin (per-batch partials, a
       bin-cardinality-bounded table summed on the driver) and prefix-sums
       the bins into global offsets.
    2. Pass 2 is ONE bucketed exchange keyed on the bin (equal bins always
       co-locate), an in-bucket vectorized sort by (value, id), and
       rank = bin offset + local position — no global sort barrier and no
       driver materialization of the data, only of the bin histogram.

    PARTITIONING ASSUMPTION: ``bin_width`` bounds reducer skew — a single
    bin's rows land on one reducer, so size bins well below the per-worker
    heap (value distributions with one hot point value need the id
    tiebreak inside a single bin, which stays correct but not balanced)."""
    import numpy as np

    from .bucketed import bucketed_group_reduce

    def bin_counts(df: pd.DataFrame) -> pd.DataFrame:
        b = df[value_col].to_numpy(dtype="int64") // bin_width
        u, c = np.unique(b, return_counts=True)
        return pd.DataFrame({"bin": u, "n": c.astype("int64")})

    hist = (
        ds.map_batches(bin_counts, batch_format="pandas")
        .to_pandas()
        .groupby("bin", sort=True, as_index=False)["n"]
        .sum()
    )
    total = int(hist["n"].sum())
    offs = dict(
        zip(
            (int(b) for b in hist["bin"]),
            (int(o) for o in np.concatenate(
                [[0], np.cumsum(hist["n"].to_numpy())[:-1]]
            )),
        )
    )
    offs_ref = ray.put(offs)
    keep = [c for c in keep_cols if c not in (value_col, id_col)]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = df[[value_col, id_col, *keep]].copy()
        out["bin"] = df[value_col].to_numpy(dtype="int64") // bin_width
        return out

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["bin", value_col, id_col],
                          kind="stable").reset_index(drop=True)
        offmap = ray.get(offs_ref)
        bins = g["bin"].to_numpy(dtype="int64")
        # local position within each bin run (sorted, so runs are contiguous)
        starts = np.flatnonzero(np.r_[True, bins[1:] != bins[:-1]])
        run_start = np.repeat(starts, np.diff(np.r_[starts, len(bins)]))
        local = np.arange(len(bins), dtype="int64") - run_start
        base = np.fromiter(
            (offmap[int(b)] for b in bins[starts]), dtype="int64",
            count=len(starts),
        )
        g[out_rank] = np.repeat(
            base, np.diff(np.r_[starts, len(bins)])
        ) + local + 1
        return g.drop(columns=["bin"])

    ranked = bucketed_group_reduce(
        ds, ["bin"], partial, reduce, n_buckets=n_buckets
    )
    return ranked, total


# --- Bloom-prefiltered semi join -------------------------------------------
# The 100 TB pattern for a big-big semi join with a selective build side:
# a fixed-size bit array over the build keys is broadcast once and prunes
# the probe side BEFORE its rows reach the co-partition exchange, so the
# shuffle carries ~selectivity x probe bytes instead of all of them. The
# bloom admits false positives, so survivors still go through the exact
# tagged-union verify — the filter only buys shuffle volume, never
# correctness.

_BLOOM_C1 = 0x9E3779B97F4A7C15
_BLOOM_C2 = 0xC2B2AE3D27D4EB4F


def _bloom_positions(keys, m_bits: int, k: int):
    """k deterministic bit positions per int64 key (double hashing,
    numpy-vectorized, wrap-around uint64 arithmetic)."""
    import numpy as np

    x = keys.astype("uint64")
    h1 = x * np.uint64(_BLOOM_C1)
    h1 ^= h1 >> np.uint64(31)
    h2 = (x * np.uint64(_BLOOM_C2)) | np.uint64(1)
    m = np.uint64(m_bits)
    return [((h1 + np.uint64(i) * h2) % m) for i in range(k)]


def build_bloom_filter(
    ds: "ray.data.Dataset", key: str, m_bits: int = 1 << 20, k: int = 4
):
    """uint64 word array (m_bits/64 words) with every build key's k bits set.

    Each batch emits its DISTINCT set-bit positions (<= min(k*keys, m_bits)
    int32 rows — pre-deduped, so a hot batch is bounded by the filter size,
    not the key count); the driver ORs them into the one fixed-size bitmap
    it broadcasts. At multi-node scale the position lists would tree-reduce,
    but the artifact itself is m_bits/8 bytes (128 KB default) either way.
    """
    import numpy as np

    def positions(df: pd.DataFrame) -> pd.DataFrame:
        ks = np.unique(df[key].to_numpy(dtype="int64"))
        if not len(ks):
            return pd.DataFrame({"pos": np.array([], dtype="int64")})
        pos = np.unique(np.concatenate(_bloom_positions(ks, m_bits, k)))
        return pd.DataFrame({"pos": pos.astype("int64")})

    bits = np.zeros(m_bits // 64, dtype=np.uint64)
    for b in ds.map_batches(positions, batch_format="pandas").iter_batches(
        batch_format="pandas"
    ):
        p = b["pos"].to_numpy(dtype="uint64")
        np.bitwise_or.at(bits, (p >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (p & np.uint64(63)))
    return bits


def bloom_might_contain(bits, keys, k: int = 4):
    """Vectorized membership test: True = maybe present, False = definitely
    absent (the only side the filter guarantees). The modulus is derived
    from the bitmap itself (len(bits)*64) so a build/probe sizing mismatch
    — which would silently break the no-false-negative guarantee — cannot
    happen."""
    import numpy as np

    m_bits = len(bits) * 64
    mask = np.ones(len(keys), dtype=bool)
    for pos in _bloom_positions(keys.astype("int64"), m_bits, k):
        word = bits[(pos >> np.uint64(6)).astype(np.int64)]
        mask &= (word >> (pos & np.uint64(63))) & np.uint64(1) != 0
    return mask
