"""Distributed PCA (similarity.pca_fit / pca_project): component quality
against numpy's in-memory reference, integer-partial exactness, and
determinism. Rows-only oracle class (eigh is a numeric fit), so this file
is the correctness gate.
"""

import numpy as np
import pandas as pd
import pytest

from rayextract.similarity import pca_fit, pca_project

SF = "/root/testdata/sf0.001"


def _emb_ds():
    from rayextract.queries import _read

    return _read(SF, "embeddings", ["vec_id", "embedding"])


def _emb_np():
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy()
    mat = np.asarray(t.column("embedding").combine_chunks().flatten(),
                     dtype=np.float64).reshape(len(ids), -1)
    return ids, mat


def test_components_orthonormal_and_variance_ordered(ray_session):
    mean, w, vals = pca_fit(_emb_ds(), n_components=4)
    np.testing.assert_allclose(w.T @ w, np.eye(4), atol=1e-9)
    assert (np.diff(vals) <= 1e-12).all(), "eigvals must be descending"
    # sign convention: largest-|coord| entry of each component is positive
    for j in range(4):
        assert w[np.abs(w[:, j]).argmax(), j] > 0


def test_matches_inmemory_reference(ray_session):
    """The distributed integer-moment covariance must agree with plain numpy
    on the raw table (to e6 quantization tolerance), component by component
    up to sign."""
    mean, w, vals = pca_fit(_emb_ds(), n_components=4)
    _, mat = _emb_np()
    np.testing.assert_allclose(mean, mat.mean(axis=0), atol=1e-5)
    ref_cov = np.cov(mat, rowvar=False, bias=True)
    rv, rw = np.linalg.eigh(ref_cov)
    order = np.argsort(rv)[::-1][:4]
    np.testing.assert_allclose(vals, rv[order], rtol=1e-4, atol=1e-9)
    for j in range(4):
        c = abs(float(rw[:, order[j]] @ w[:, j]))
        assert c > 0.999, f"component {j} cos={c}"


def test_projection_deterministic_and_centered(ray_session):
    from rayextract.queries import QUERIES

    a = QUERIES["embedding_pca_project"](SF).to_pandas().sort_values(
        "vec_id").reset_index(drop=True)
    b = QUERIES["embedding_pca_project"](SF).to_pandas().sort_values(
        "vec_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert list(a.columns) == ["vec_id", "pc1_e6", "pc2_e6", "pc3_e6", "pc4_e6"]
    # centered projection: per-component means ~0 (in micro-units)
    for c in a.columns[1:]:
        assert abs(a[c].mean()) < 50, c
    # pc1 carries the most variance
    stds = [a[c].astype("float64").std() for c in a.columns[1:]]
    assert stds[0] == max(stds)


def test_reconstruction_beats_mean_baseline(ray_session):
    """Rank-4 reconstruction must strictly beat the rank-0 (mean-only)
    baseline — a scrambled projection/components pairing fails this."""
    mean, w, _ = pca_fit(_emb_ds(), n_components=4)
    ids, mat = _emb_np()
    centered = mat - mean[None, :]
    recon = (centered @ w) @ w.T
    err = ((centered - recon) ** 2).sum()
    base = (centered ** 2).sum()
    assert err < base * 0.98
