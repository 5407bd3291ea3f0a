"""Connected components: min-label propagation over a pair list."""

import pandas as pd

import ray.data as rd

from rayextract.graph import connected_components


def test_chain_and_islands():
    # chain 1-2-3-4 (diameter 3), pair {10,11}, pair {20,21}
    pairs = rd.from_pandas(
        pd.DataFrame(
            {
                "doc_a": [1, 2, 3, 10, 20],
                "doc_b": [2, 3, 4, 11, 21],
            }
        )
    )
    out = connected_components(pairs).to_pandas().sort_values("doc_id")
    got = dict(zip(out["doc_id"], out["cluster_id"]))
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_star_converges_in_one_round():
    pairs = rd.from_pandas(
        pd.DataFrame({"doc_a": [5, 5, 5], "doc_b": [6, 7, 8]})
    )
    out = connected_components(pairs).to_pandas()
    assert set(out["cluster_id"]) == {5}
    assert len(out) == 4


def test_distributed_path_equals_local():
    """Force the distributed pointer-jumping loop (local_max_edges=0) and pin
    its output to the driver union-find path on a long chain + islands."""
    import numpy as np

    rng = np.random.RandomState(3)
    # 24-node chain (log-round convergence) + random extra clusters
    chain_a = np.arange(100, 123)
    chain_b = chain_a + 1
    extra_a = rng.randint(0, 50, size=40)
    extra_b = extra_a + rng.randint(1, 5, size=40)
    df = pd.DataFrame(
        {
            "doc_a": np.r_[chain_a, extra_a],
            "doc_b": np.r_[chain_b, extra_b],
        }
    )
    local = (
        connected_components(rd.from_pandas(df))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    dist = (
        connected_components(rd.from_pandas(df), local_max_edges=0)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(local, dist)
    # the whole chain must collapse to one min label
    assert set(local.loc[local["doc_id"] >= 100, "cluster_id"]) == {100}


def test_pagerank_local_equals_distributed_and_exact():
    """PageRank in exact integer pico-units: driver path, distributed
    bucketed-loop path, and a hand-computed numpy reference must agree
    bit-for-bit; total mass never exceeds PR_SCALE (floors only shed)."""
    import numpy as np

    from rayextract.graph import PR_SCALE, pagerank

    pairs = pd.DataFrame(
        {"doc_a": [1, 2, 10, 11, 10], "doc_b": [2, 3, 11, 12, 12]}
    )
    ds = rd.from_pandas(pairs)
    loc = (
        pagerank(ds, iters=5)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    dist = (
        pagerank(ds, iters=5, local_max_edges=0)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(loc, dist)
    assert loc["rank"].sum() <= PR_SCALE
    # the triangle {10,11,12} is symmetric: equal ranks
    tri = loc.loc[loc["doc_id"] >= 10, "rank"]
    assert tri.nunique() == 1
    # chain centre 2 outranks the leaves by symmetry
    r = dict(zip(loc["doc_id"], loc["rank"]))
    assert r[2] > r[1] == r[3]
    # one hand-rolled iteration check at iters=1
    one = (
        pagerank(ds, iters=1)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    n = 6
    base = (15 * PR_SCALE) // (100 * n)
    r0 = PR_SCALE // n
    # node 1 (deg 1) receives only from node 2 (deg 2)
    assert one.loc[one["doc_id"] == 1, "rank"].iloc[0] == base + (85 * r0) // 200
    assert np.issubdtype(one["rank"].dtype, np.int64)


def test_pagerank_empty_pairs():
    from rayextract.graph import pagerank

    empty = rd.from_pandas(
        pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                      "doc_b": pd.Series(dtype="int64")})
    )
    assert len(pagerank(empty).to_pandas()) == 0


def test_empty_pairs_yields_empty_components():
    """Zero near-dup pairs (the common case for a clean corpus) must produce
    an empty (doc_id, cluster_id) dataset, not a driver crash."""
    empty = rd.from_pandas(
        pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                      "doc_b": pd.Series(dtype="int64")})
    )
    out = connected_components(empty).to_pandas()
    # Ray drops empty blocks, so the schema is not observable — the contract
    # is: empty result, no driver crash (round-2 regression: KeyError 'node')
    assert len(out) == 0


def test_pagerank_distributed_dedups_edges_globally():
    """ADVICE r2: a pair duplicated ACROSS blocks must not double-count
    degree/contributions in the distributed path (batch-local drop_duplicates
    was insufficient). Repro from the advisor: [(1,2),(1,2),(2,3)] in 3 blocks."""
    from rayextract.graph import pagerank

    blocks = [
        pd.DataFrame({"doc_a": [1], "doc_b": [2]}),
        pd.DataFrame({"doc_a": [1], "doc_b": [2]}),
        pd.DataFrame({"doc_a": [2], "doc_b": [3]}),
    ]
    ds = rd.from_pandas(blocks)
    loc = (
        pagerank(ds, iters=5)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    dist = (
        pagerank(ds, iters=5, local_max_edges=0)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(loc, dist)


def test_vectorized_unionfind_matches_bfs_reference():
    """_unionfind_components (vectorized hooking+compression, r4) vs a
    brute-force BFS reference on random graphs, including dense multi-edge
    and self-loop-free shapes."""
    import numpy as np

    from rayextract.graph import _unionfind_components

    rng = np.random.RandomState(11)
    for trial in range(20):
        n_nodes = rng.randint(2, 120)
        n_edges = rng.randint(1, 250)
        ids = rng.choice(np.arange(0, 4 * n_nodes), size=n_nodes, replace=False)
        u = ids[rng.randint(0, n_nodes, size=n_edges)]
        v = ids[rng.randint(0, n_nodes, size=n_edges)]
        keep = u != v
        if not keep.any():
            continue
        df = pd.DataFrame({"node": u[keep], "peer": v[keep]})
        got = _unionfind_components(df)
        # BFS reference
        adj: dict = {}
        for a, b in zip(df["node"], df["peer"]):
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        want = {}
        seen: set = set()
        for start in adj:
            if start in seen:
                continue
            comp, stack = [], [start]
            seen.add(start)
            while stack:
                x = stack.pop()
                comp.append(x)
                for y in adj[x]:
                    if y not in seen:
                        seen.add(y)
                        stack.append(y)
            lab = min(comp)
            for x in comp:
                want[x] = lab
        got_map = dict(zip(got["doc_id"], got["cluster_id"]))
        assert got_map == want, trial
