"""Product-quantization ANN (similarity.knn_pq): recall against the exact
brute-force path, code compression contract, and determinism.

PQ has no SQL oracle (per-subspace k-means training is a model fit, the
same class as kmeans_embeddings), so this file is its correctness gate.
"""

import numpy as np
import pandas as pd
import pytest

from rayextract.similarity import (
    _stack,
    knn_bruteforce,
    knn_pq,
    pq_encode,
    train_pq_codebooks,
)

SF = "/root/testdata/sf0.001"


def _emb_ds():
    from rayextract.queries import _read

    return _read(SF, "embeddings", ["vec_id", "embedding"])


def _queries():
    from rayextract.queries import _queries_df

    return _queries_df(SF)


def _train():
    from rayextract.queries import _read_small

    return _read_small(
        SF, "embeddings", ["vec_id", "embedding"],
        filters=[("vec_id", "<", 2048)],
    ).reset_index(drop=True)


def test_codebook_shapes_and_determinism():
    rng = np.random.RandomState(3)
    sample = rng.standard_normal((512, 64))
    b1 = train_pq_codebooks(sample, m=8, ksub=16)
    b2 = train_pq_codebooks(sample, m=8, ksub=16)
    assert b1.shape == (8, 16, 8)
    np.testing.assert_array_equal(b1, b2)
    # indivisible dim is a loud error, not silent truncation
    with pytest.raises(ValueError):
        train_pq_codebooks(sample[:, :63], m=8)


def test_encode_is_nearest_centroid():
    rng = np.random.RandomState(4)
    sample = rng.standard_normal((256, 16))
    books = train_pq_codebooks(sample, m=2, ksub=4, n_iter=5)
    x = rng.standard_normal((32, 16))
    codes = pq_encode(x, books)
    assert codes.shape == (32, 2) and codes.dtype == np.uint8
    assert codes.max() < 4
    # brute-check subspace 0 for a few rows
    for i in range(5):
        d2 = ((x[i, :8] - books[0]) ** 2).sum(1)
        assert codes[i, 0] == d2.argmin()


def test_pq_recall_vs_exact(ray_session):
    """ADC top-5 must recover most of the exact top-5 — the quantizer is
    lossy by design but 16 centroids x 8 subspaces on 64-dim data keeps
    recall high; a broken table/lookup path craters this instantly."""
    exact = knn_bruteforce(_emb_ds(), _queries(), k=5).to_pandas()
    approx = knn_pq(_emb_ds(), _queries(), _train(), k=5).to_pandas()
    assert sorted(approx.columns) == sorted(exact.columns)
    # same per-query row cardinality as the exact path
    assert approx.groupby("query_id").size().eq(5).all()
    hits = 0
    total = 0
    for qid, g in exact.groupby("query_id"):
        want = set(g["neighbor_id"])
        got = set(approx.loc[approx["query_id"] == qid, "neighbor_id"])
        hits += len(want & got)
        total += len(want)
    assert hits / total >= 0.6, f"recall@5 {hits}/{total}"


def test_pq_deterministic_rerun(ray_session):
    a = knn_pq(_emb_ds(), _queries(), _train(), k=5).to_pandas()
    b = knn_pq(_emb_ds(), _queries(), _train(), k=5).to_pandas()
    key = ["query_id", "rank"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True),
    )


def test_pq_compression_ratio():
    """The point of PQ at 100 TB: 64-dim float64 rows (512 B) -> 16 uint8
    codes (16 B)."""
    rng = np.random.RandomState(5)
    sample = rng.standard_normal((256, 64))
    books = train_pq_codebooks(sample, m=16, ksub=16, n_iter=3)
    codes = pq_encode(sample, books)
    assert codes.nbytes * 32 == sample.nbytes


def test_pq_small_sample_caps_ksub():
    """Corpora smaller than ksub must train (centroid count capped), not
    crash — sf0.001's 500-vector table hits this with ksub=256."""
    rng = np.random.RandomState(6)
    sample = rng.standard_normal((100, 64))
    books = train_pq_codebooks(sample, m=16, ksub=256, n_iter=2)
    assert books.shape == (16, 100, 4)
