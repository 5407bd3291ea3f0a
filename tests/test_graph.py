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
