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
    """In-memory min-label components, fully vectorized (Shiloach-Vishkin-
    style hooking + pointer-jumping compression — O(E) numpy work per round,
    O(log n) rounds; the previous per-edge Python union-find loop was ~5M
    interpreter iterations at the hybrid threshold). Used when the
    (deduplicated) edge list fits comfortably in one process — near-dup edge
    lists are an *aggregate*, orders of magnitude smaller than the corpus,
    so this is the common case even at large scale.

    Index space is sorted node-id space (np.unique), so the minimum index in
    a component IS its minimum node id — the canonical cluster label."""
    nodes, inv = np.unique(
        np.concatenate([edge_df["node"].to_numpy(), edge_df["peer"].to_numpy()]),
        return_inverse=True,
    )
    n = len(nodes)
    parent = np.arange(n, dtype=np.int64)
    u_idx = inv[: len(edge_df)]
    v_idx = inv[len(edge_df):]

    while True:
        pu, pv = parent[u_idx], parent[v_idx]
        if not (pu != pv).any():
            break
        # hook: the larger current label adopts the smaller (min survives)
        lo, hi = np.minimum(pu, pv), np.maximum(pu, pv)
        np.minimum.at(parent, hi, lo)
        # compress: parent = parent[parent] to a fixpoint (pointer jumping)
        while True:
            pp = parent[parent]
            if np.array_equal(pp, parent):
                break
            parent = pp
    return pd.DataFrame(
        {"doc_id": nodes.astype("int64"), "cluster_id": nodes[parent].astype("int64")}
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
        n_buckets=16, arrow_exchange=True,
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
            n_buckets=16, arrow_exchange=True,
        )
        new_labels = bucketed_group_reduce(
            routed, ["node"], combine_partial, combine, n_buckets=16,
            arrow_exchange=True,
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


# ---------------------------------------------------------------------------
# PageRank over the near-dup graph
# ---------------------------------------------------------------------------

PR_SCALE = 1_000_000_000_000  # total rank mass in pico-units


def _pagerank_local(edge_df: pd.DataFrame, iters: int) -> pd.DataFrame:
    """Vectorized in-memory PageRank in exact integer pico-units: every
    operation is int64 floor arithmetic, so the distributed path and any
    SQL re-implementation reproduce it bit-for-bit."""
    nodes, inv = np.unique(
        np.concatenate([edge_df["src"].to_numpy(), edge_df["dst"].to_numpy()]),
        return_inverse=True,
    )
    n = len(nodes)
    src = inv[: len(edge_df)]
    dst = inv[len(edge_df):]
    deg = np.bincount(src, minlength=n).astype(np.int64)
    base = (15 * PR_SCALE) // (100 * n)
    rank = np.full(n, PR_SCALE // n, dtype=np.int64)
    for _ in range(iters):
        contrib = (85 * rank[src]) // (100 * deg[src])
        new = np.full(n, base, dtype=np.int64)
        np.add.at(new, dst, contrib)
        rank = new
    return pd.DataFrame({"doc_id": nodes.astype("int64"), "rank": rank})


def pagerank(
    pairs: "ray.data.Dataset",
    a: str = "doc_a",
    b: str = "doc_b",
    iters: int = 5,
    local_max_edges: int = 5_000_000,
) -> "ray.data.Dataset":
    """(doc_id, rank) PageRank (damping 0.85, ``iters`` fixed rounds) over
    the undirected pair graph, in exact integer pico-units (rank sums to
    <= 10^12; floors shed sub-unit mass deterministically).

    Same hybrid as connected_components: the deduplicated edge list is an
    aggregate of the near-dup operator, so at <= ``local_max_edges`` the
    iteration runs vectorized on the driver; above it, each round is two
    bucketed exchanges — (ranks ∪ edges) co-partitioned on src emit
    per-edge contributions, then (contributions ∪ static degree rows)
    co-partitioned on dst sum into the next rank vector. Nothing per-round
    ever exceeds O(|E|+|V|) rows and no Dataset.join is used.
    """
    import ray.data as rd

    def to_edges(df: pd.DataFrame) -> pd.DataFrame:
        fwd = pd.DataFrame({"src": df[a], "dst": df[b]})
        rev = pd.DataFrame({"src": df[b], "dst": df[a]})
        return (
            pd.concat([fwd, rev], ignore_index=True).astype("int64").drop_duplicates()
        )

    edges = pairs.map_batches(to_edges, batch_format="pandas").materialize()

    empty = pd.DataFrame(
        {"doc_id": pd.Series(dtype="int64"), "rank": pd.Series(dtype="int64")}
    )
    n_edges = edges.count()
    if n_edges == 0:
        return rd.from_pandas(empty)

    if n_edges <= 2 * local_max_edges:  # stored both directions
        edge_df = edges.to_pandas().drop_duplicates()
        return rd.from_pandas(_pagerank_local(edge_df, iters))

    # ---- distributed loop -------------------------------------------------
    # GLOBAL edge dedup first: to_edges' drop_duplicates is batch-local, and
    # unlike connected_components (min-label is idempotent) PageRank double-
    # counts a pair repeated across input blocks in both degree and
    # contribution.  Bucketing by src co-locates every copy of (src, dst), so
    # a per-bucket drop_duplicates is a global distinct.
    edges = bucketed_group_reduce(
        edges, ["src"],
        lambda df: df.drop_duplicates(),
        lambda g: g.drop_duplicates(),
        n_buckets=16, arrow_exchange=True,
    ).materialize()

    degs = bucketed_group_reduce(
        edges, ["src"],
        lambda df: df.groupby("src", sort=False, as_index=False).agg(
            deg=("dst", "count")),
        lambda g: g.groupby("src", sort=False, as_index=False)["deg"].sum(),
        n_buckets=16, arrow_exchange=True,
    ).materialize()
    n_nodes = degs.count()
    base = (15 * PR_SCALE) // (100 * n_nodes)
    r0 = PR_SCALE // n_nodes

    # rank state carries deg so exchange A is self-contained
    ranks = degs.map_batches(
        lambda df: pd.DataFrame(
            {"node": df["src"], "rank": np.int64(r0), "deg": df["deg"]}
        ),
        batch_format="pandas",
    ).materialize()

    def rank_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"node": df["node"], "dst": np.int64(-1),
             "rank": df["rank"], "deg": df["deg"]}
        ).astype("int64")

    edge_tagged = edges.map_batches(
        lambda df: pd.DataFrame(
            {"node": df["src"], "dst": df["dst"],
             "rank": np.int64(-1), "deg": np.int64(-1)}
        ).astype("int64"),
        batch_format="pandas",
    ).materialize()

    def route(g: pd.DataFrame) -> pd.DataFrame:
        lut = g.loc[g["dst"] < 0, ["node", "rank", "deg"]].drop_duplicates("node")
        ed = g.loc[g["dst"] >= 0, ["node", "dst"]]
        m = ed.merge(lut, on="node", how="inner")
        return pd.DataFrame(
            {"node": m["dst"],
             "contrib": (85 * m["rank"]) // (100 * m["deg"])}
        ).astype("int64")

    deg_tagged = degs.map_batches(
        lambda df: pd.DataFrame(
            {"node": df["src"], "contrib": -df["deg"] - 1}
        ).astype("int64"),
        batch_format="pandas",
    ).materialize()  # deg rides as contrib = -(deg+1) < 0

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        degv = g.loc[g["contrib"] < 0].copy()
        degv["deg"] = -degv["contrib"] - 1
        s = (
            g.loc[g["contrib"] >= 0]
            .groupby("node", sort=False, as_index=False)["contrib"].sum()
        )
        m = degv[["node", "deg"]].drop_duplicates("node").merge(
            s, on="node", how="left")
        return pd.DataFrame(
            {"node": m["node"],
             "rank": base + m["contrib"].fillna(0).astype("int64"),
             "deg": m["deg"]}
        ).astype("int64")

    for _ in range(iters):
        contribs = bucketed_group_reduce(
            ranks.map_batches(rank_rows, batch_format="pandas").union(edge_tagged),
            ["node"], lambda df: df, route, n_buckets=16,
            arrow_exchange=True,
        )
        ranks = bucketed_group_reduce(
            contribs.union(deg_tagged),
            ["node"], lambda df: df, combine, n_buckets=16,
            arrow_exchange=True,
        ).materialize()

    return ranks.map_batches(
        lambda df: pd.DataFrame(
            {"doc_id": df["node"].astype("int64"),
             "rank": df["rank"].astype("int64")}
        ),
        batch_format="pandas",
    )
