"""Similarity search over an embedding column (list<float>).

- ``knn_bruteforce``: exact top-k cosine. The query matrix is broadcast ONCE
  via ``ray.put`` and each batch does one float64 matmul against it — the
  scale path for "small query set x huge corpus". Global top-k per query is
  a tiny groupby over per-batch partial top-ks (shuffle carries k rows per
  query per batch, never the corpus).
- ``knn_ivf``: IVF-style approximate variant — deterministic hash-bucketed
  coarse quantizer (seeded projection), search only the probe buckets.
- ``embedding_neardup_pairs``: cosine near-dup among a keyed subset.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _stack(col) -> np.ndarray:
    return _normalize(np.vstack([np.asarray(v, dtype=np.float64) for v in col]))


def _global_topk_fn(k: int):
    """Per-query final top-k over the partial candidates (shared by the exact
    and IVF paths so tie-breaking can never diverge between them)."""

    def global_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["sim", "neighbor_id"], ascending=[False, True], kind="stable"
        ).head(k).copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype="int64")
        return g[["query_id", "rank", "neighbor_id"]]

    return global_topk


def knn_bruteforce(
    emb: "ray.data.Dataset", queries: pd.DataFrame, k: int = 5
) -> "ray.data.Dataset":
    """(query_id, rank, neighbor_id) exact cosine top-k, self excluded.

    ``queries``: DataFrame(vec_id, embedding) — small; broadcast via ray.put.
    """
    qids = queries["vec_id"].to_numpy()
    qmat_ref = ray.put(_stack(queries["embedding"]))

    def partial_topk(df: pd.DataFrame) -> pd.DataFrame:
        qmat = ray.get(qmat_ref)
        cmat = _stack(df["embedding"])
        ids = df["vec_id"].to_numpy()
        sims = qmat @ cmat.T  # (nq, nb)
        rows = []
        for qi in range(len(qids)):
            s = sims[qi]
            mask = ids != qids[qi]
            cand_idx = np.flatnonzero(mask)
            if cand_idx.size == 0:
                continue
            order = cand_idx[np.lexsort((ids[cand_idx], -s[cand_idx]))][:k]
            for n_id, sim in zip(ids[order], s[order]):
                rows.append((int(qids[qi]), int(n_id), float(sim)))
        return pd.DataFrame(rows, columns=["query_id", "neighbor_id", "sim"]).astype(
            {"query_id": "int64", "neighbor_id": "int64", "sim": "float64"}
        )

    partials = emb.map_batches(partial_topk, batch_format="pandas")
    from .relational import join_partitions

    return partials.groupby("query_id", num_partitions=join_partitions(cap=16)).map_groups(
        _global_topk_fn(k), batch_format="pandas"
    )


class IVFIndexer:
    """Coarse quantizer: deterministic random-projection bucket assignment
    (built once per actor)."""

    def __init__(self, dim: int = 64, n_lists: int = 16, seed: int = 13):
        rng = np.random.RandomState(seed)
        self.proj = rng.standard_normal((dim, int(np.log2(n_lists))))
        self.n_lists = n_lists

    def assign(self, mat: np.ndarray) -> np.ndarray:
        bits = (mat @ self.proj) > 0
        return bits @ (1 << np.arange(bits.shape[1]))

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        mat = _stack(df["embedding"])
        df = df.copy()
        df["ivf_list"] = self.assign(mat).astype("int64")
        return df


def knn_ivf(
    emb: "ray.data.Dataset", queries: pd.DataFrame, k: int = 5,
    n_lists: int = 16, n_probe: int = 4, dim: int = 64,
) -> "ray.data.Dataset":
    """Approximate top-k: search only the n_probe nearest IVF lists per query.

    Same output schema as knn_bruteforce; recall < 1 by design (the scale
    path trades exactness for touching n_probe/n_lists of the corpus).
    """
    indexer = IVFIndexer(dim=dim, n_lists=n_lists)
    qmat = _stack(queries["embedding"])
    qlists = indexer.assign(qmat)
    # probe set per query: own bucket + hamming-nearest buckets (deterministic)
    probe: dict[int, set[int]] = {}
    all_lists = np.arange(n_lists)
    for qi, ql in enumerate(qlists):
        d = np.array([bin(int(ql) ^ int(l)).count("1") for l in all_lists])
        order = np.lexsort((all_lists, d))
        probe[int(queries["vec_id"].iloc[qi])] = set(all_lists[order][:n_probe].tolist())

    binned = emb.map_batches(
        IVFIndexer,
        fn_constructor_kwargs={"dim": dim, "n_lists": n_lists},
        batch_format="pandas",
        concurrency=(1, 4),
        num_cpus=1,
    )
    qids = queries["vec_id"].to_numpy()
    qmat_ref = ray.put(qmat)
    probe_ref = ray.put(probe)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        qm = ray.get(qmat_ref)
        pr = ray.get(probe_ref)
        cmat = _stack(df["embedding"])
        ids = df["vec_id"].to_numpy()
        lists = df["ivf_list"].to_numpy()
        sims = qm @ cmat.T
        rows = []
        for qi in range(len(qids)):
            qid = int(qids[qi])
            mask = (ids != qid) & np.isin(lists, list(pr[qid]))
            cand = np.flatnonzero(mask)
            if cand.size == 0:
                continue
            s = sims[qi]
            order = cand[np.lexsort((ids[cand], -s[cand]))][:k]
            for n_id, sim in zip(ids[order], s[order]):
                rows.append((qid, int(n_id), float(sim)))
        return pd.DataFrame(rows, columns=["query_id", "neighbor_id", "sim"]).astype(
            {"query_id": "int64", "neighbor_id": "int64", "sim": "float64"}
        )

    partials = binned.map_batches(partial, batch_format="pandas")
    from .relational import join_partitions

    return partials.groupby("query_id", num_partitions=join_partitions(cap=16)).map_groups(
        _global_topk_fn(k), batch_format="pandas"
    )


def embedding_neardup_pairs(
    emb: "ray.data.Dataset", threshold: float, modulus: int = 5
) -> "ray.data.Dataset":
    """(a, b, sim) pairs with cosine >= threshold among vec_id % modulus == 0.

    Exact all-pairs over the subset, as block-matrix products: the subset is
    packed into compact (ids, matrix) chunks that stay IN THE OBJECT STORE —
    the driver holds only their refs (round 1 pulled the whole subset to the
    driver with ``to_pandas`` and re-broadcast it). Each subset batch then
    multiplies against every chunk (upper triangle via a < b), so total work
    is the O(subset^2/chunk) block product any exact pairwise operator costs;
    for an approximate linear-time path use the IVF bucketing (``knn_ivf``).
    On a cluster each node fetches a chunk once (plasma-shared per node),
    never per batch."""

    def pack_subset(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["vec_id"] % modulus == 0]
        if not len(df):
            return pd.DataFrame({"ids": pd.Series(dtype=object),
                                 "mat": pd.Series(dtype=object)})
        ids = df["vec_id"].to_numpy(np.int64)
        mat = _stack(df["embedding"])
        return pd.DataFrame({"ids": [ids.tobytes()], "mat": [mat.tobytes()]})

    packed = emb.map_batches(pack_subset, batch_format="pandas").materialize()
    # block refs only — the chunk payloads never leave the object store
    chunk_refs = [
        bref
        for bundle in packed.iter_internal_ref_bundles()
        for bref in bundle.block_refs
    ]

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["vec_id"] % modulus == 0]
        if not len(df):
            return pd.DataFrame(columns=["a", "b", "sim"]).astype(
                {"a": "int64", "b": "int64", "sim": "float64"}
            )
        m = _stack(df["embedding"])
        my_ids = df["vec_id"].to_numpy(np.int64)
        dim = m.shape[1]
        out_a, out_b, out_s = [], [], []
        for bref in chunk_refs:
            blk = ray.get(bref)
            if hasattr(blk, "to_pandas"):  # arrow block
                blk = blk.to_pandas()
            for ids_b, mat_b in zip(blk["ids"], blk["mat"]):
                other_ids = np.frombuffer(ids_b, dtype=np.int64)
                other = np.frombuffer(mat_b, dtype=np.float64).reshape(-1, dim)
                sims = m @ other.T
                ai, bi = np.nonzero(
                    (sims >= threshold) & (my_ids[:, None] < other_ids[None, :])
                )
                if len(ai):
                    out_a.append(my_ids[ai])
                    out_b.append(other_ids[bi])
                    out_s.append(sims[ai, bi])
        if not out_a:
            return pd.DataFrame(columns=["a", "b", "sim"]).astype(
                {"a": "int64", "b": "int64", "sim": "float64"}
            )
        return pd.DataFrame(
            {
                "a": np.concatenate(out_a).astype("int64"),
                "b": np.concatenate(out_b).astype("int64"),
                "sim": np.concatenate(out_s).astype("float64"),
            }
        )

    return emb.map_batches(pairs, batch_format="pandas")
