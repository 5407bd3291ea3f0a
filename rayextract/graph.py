"""Connected components over a pair list — dedup-cluster assignment.

Near-dup pair lists (MinHash/Jaccard/SimHash output) become cluster ids via
min-label propagation: every node's label converges to the minimum doc_id
reachable from it — a deterministic canonical cluster id (keep doc ==
cluster id, drop the rest, the standard dedup policy).

Scale shape per iteration — TWO bucketed hash shuffles, no Dataset.join:

1. **route**: bucket (own-label rows ∪ edge rows) by ``node``; inside each
   bucket a vectorized pandas merge attaches every node's current label to
   its outgoing edges -> messages addressed to the peers. Label rows also
   emit a *shortcut* edge ``label(u) -> u`` (pointer jumping): u receives
   ``label(label(u))`` next round, so convergence is O(log diameter), not
   O(diameter) — long near-dup chains can't exhaust the iteration budget.
2. **combine**: bucket (messages ∪ own-label rows) by ``node``; per bucket a
   vectorized min-per-node, plus a changed flag vs the own label.

The driver loop only carries a scalar changed-count per iteration;
labels/edges stay distributed. Everything is O(|E|+|V|) rows per iteration.
"""

from __future__ import annotations

import warnings

import numpy as np
import pandas as pd

import ray.data

from .bucketed import bucketed_group_reduce


def _unionfind_components(edge_df: pd.DataFrame) -> pd.DataFrame:
    """In-memory min-label components via union-find (path halving + union by
    min). Used when the (deduplicated) edge list fits comfortably in one
    process — near-dup edge lists are an *aggregate*, orders of magnitude
    smaller than the corpus, so this is the common case even at large scale."""
    nodes, inv = np.unique(
        np.concatenate([edge_df["node"].to_numpy(), edge_df["peer"].to_numpy()]),
        return_inverse=True,
    )
    n = len(nodes)
    parent = np.arange(n, dtype=np.int64)
    u_idx = inv[: len(edge_df)]
    v_idx = inv[len(edge_df):]

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]  # path halving
            x = parent[x]
        return x

    for ui, vi in zip(u_idx, v_idx):
        ru, rv = find(ui), find(vi)
        if ru != rv:
            # union by smaller NODE id so the root is the min label
            if nodes[ru] < nodes[rv]:
                parent[rv] = ru
            else:
                parent[ru] = rv
    roots = np.array([find(i) for i in range(n)], dtype=np.int64)
    return pd.DataFrame(
        {"doc_id": nodes.astype("int64"), "cluster_id": nodes[roots].astype("int64")}
    )


def connected_components(
    pairs: "ray.data.Dataset",
    a: str = "doc_a",
    b: str = "doc_b",
    max_iters: int = 50,
    local_max_edges: int = 5_000_000,
) -> "ray.data.Dataset":
    """(doc_id, cluster_id=min reachable node) for every node in ``pairs``.

    Hybrid execution: the UNDIRECTED deduplicated edge count is measured
    first (a count over the distributed edge dataset — no payload pulled).
    At or below ``local_max_edges`` (~80 MB of int64 pairs) the iterative
    phase runs as one union-find on the driver — strictly faster than any
    shuffle-per-round loop at that size, and the edge list is an aggregate
    of the near-dup operator, not corpus data. Above the threshold the
    distributed pointer-jumping loop below takes over unchanged.
    """

    def to_edges(df: pd.DataFrame) -> pd.DataFrame:
        fwd = pd.DataFrame({"node": df[a], "peer": df[b]})
        rev = pd.DataFrame({"node": df[b], "peer": df[a]})
        return (
            pd.concat([fwd, rev], ignore_index=True)
            .astype("int64")
            .drop_duplicates()
        )

    edges = pairs.map_batches(to_edges, batch_format="pandas").materialize()

    if edges.count() <= 2 * local_max_edges:  # edges are stored both ways
        import ray.data as rd

        edge_df = edges.to_pandas()
        if not len(edge_df) or "node" not in edge_df.columns:
            # zero near-dup pairs: an empty dataset has no columns at all
            return rd.from_pandas(
                pd.DataFrame(
                    {"doc_id": pd.Series(dtype="int64"),
                     "cluster_id": pd.Series(dtype="int64")}
                )
            )
        # one direction suffices for connectivity — halves the union loop
        edge_df = edge_df[edge_df["node"] < edge_df["peer"]]
        local = _unionfind_components(edge_df)
        return rd.from_pandas(local)

    labels = bucketed_group_reduce(
        edges, ["node"],
        lambda df: df[["node"]].drop_duplicates(),
        lambda g: g.drop_duplicates().assign(label=lambda d: d["node"]),
        n_buckets=16,
    ).materialize()

    def lab_rows(df: pd.DataFrame) -> pd.DataFrame:
        # own-label row + the pointer-jumping shortcut request label(u)->u
        own = pd.DataFrame(
            {"node": df["node"], "peer": np.int64(-1), "label": df["label"]}
        )
        shortcut = pd.DataFrame(
            {"node": df["label"], "peer": df["node"], "label": np.int64(-1)}
        )
        # self-shortcuts (label(u)==u) are no-ops; drop them
        shortcut = shortcut[shortcut["node"] != shortcut["peer"]]
        return pd.concat([own, shortcut], ignore_index=True).astype("int64")

    def edge_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"node": df["node"], "peer": df["peer"], "label": np.int64(-1)}
        ).astype("int64")

    def route(g: pd.DataFrame) -> pd.DataFrame:
        """One bucket: attach labels to this bucket's outgoing edges.
        Emits messages (node=peer, label, own=0) + own rows (node, label, own=1)."""
        lab = g.loc[g["peer"] < 0, ["node", "label"]].drop_duplicates("node")
        e = g.loc[g["peer"] >= 0, ["node", "peer"]].drop_duplicates()
        m = e.merge(lab, on="node", how="inner")
        msgs = pd.DataFrame(
            {"node": m["peer"], "label": m["label"], "own": np.int64(0)}
        )
        own = pd.DataFrame(
            {"node": lab["node"], "label": lab["label"], "own": np.int64(1)}
        )
        return pd.concat([msgs, own], ignore_index=True).astype("int64")

    def combine_partial(df: pd.DataFrame) -> pd.DataFrame:
        # min per (node, own) — associative, shrinks the second shuffle
        return (
            df.groupby(["node", "own"], sort=False)["label"].min().reset_index()
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        new = g.groupby("node", sort=False)["label"].min()
        old = g.loc[g["own"] == 1].set_index("node")["label"]
        out = pd.DataFrame(
            {
                "node": new.index.to_numpy(),
                "label": new.to_numpy(),
                "changed": (new < old.reindex(new.index)).fillna(False).to_numpy()
                .astype("int64"),
            }
        )
        return out.astype({"node": "int64", "label": "int64"})

    edge_tagged = edges.map_batches(edge_rows, batch_format="pandas").materialize()

    converged = False
    for _ in range(max_iters):
        routed = bucketed_group_reduce(
            labels.map_batches(lab_rows, batch_format="pandas").union(edge_tagged),
            ["node"],
            lambda df: df.drop_duplicates(),
            route,
            n_buckets=16,
        )
        new_labels = bucketed_group_reduce(
            routed, ["node"], combine_partial, combine, n_buckets=16,
        ).materialize()
        changed = new_labels.sum("changed")
        labels = new_labels.drop_columns(["changed"]).materialize()
        if not changed:
            converged = True
            break

    if not converged:
        # silent truncation would hand back split clusters as if final
        warnings.warn(
            f"connected_components did not converge in {max_iters} iterations; "
            "cluster ids may be split — raise max_iters",
            RuntimeWarning,
        )

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": df["node"].astype("int64"), "cluster_id": df["label"].astype("int64")}
        )

    return labels.map_batches(fin, batch_format="pandas")
