"""neardup_triangles == brute-force triangle count over the same pair list."""

from itertools import combinations

from rayextract.dedup import blocked_lsh_jaccard_pairs
from rayextract.pqio import read_parquet_clean
from rayextract.queries import JACCARD_THRESHOLD, neardup_triangles

SF = "/root/testdata/sf0.001"


def test_triangles_match_bruteforce(ray_session):
    got = neardup_triangles(SF)
    pairs = blocked_lsh_jaccard_pairs(
        read_parquet_clean(f"{SF}/documents.parquet",
                           columns=["doc_id", "text", "source"]),
        threshold=JACCARD_THRESHOLD, block_key="source", ngram=1,
    ).to_pandas()
    edges = {tuple(sorted((int(a), int(b))))
             for a, b in zip(pairs["doc_a"], pairs["doc_b"])}
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = sum(
        1
        for v in adj
        for x, y in combinations(sorted(adj[v]), 2)
        if v < x and (x, y) in edges
    )
    assert int(got["n_vertices"][0]) == len(adj)
    assert int(got["n_edges"][0]) == len(edges)
    assert int(got["n_triangles"][0]) == tri
