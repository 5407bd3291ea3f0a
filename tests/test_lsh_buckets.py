"""Hyperplane-LSH bucketing: deterministic sign matrix, exact integer
quantization (no float-order sign flips), bucket range, and the locality
property (identical vectors share a bucket; negated vectors land in the
complement bucket)."""

import numpy as np

from rayextract.queries import EMB_DIM, LSH_PLANES, _hyperplane_signs
from rayextract.queries import _round_half_away


def _bucket(v: np.ndarray, signs: np.ndarray) -> int:
    x = _round_half_away(np.asarray(v, dtype=np.float64) * 1_000_000.0)
    dots = signs @ x
    return int(((dots >= 0).astype(np.int64)
                << np.arange(LSH_PLANES, dtype=np.int64)).sum())


def test_signs_deterministic_pm1():
    a = _hyperplane_signs(LSH_PLANES, EMB_DIM)
    b = _hyperplane_signs(LSH_PLANES, EMB_DIM)
    assert (a == b).all()
    assert set(np.unique(a)) == {-1, 1}


def test_bucket_range_and_identity():
    signs = _hyperplane_signs(LSH_PLANES, EMB_DIM)
    rng = np.random.default_rng(7)
    for _ in range(20):
        v = rng.normal(size=EMB_DIM)
        b = _bucket(v, signs)
        assert 0 <= b < (1 << LSH_PLANES)
        assert b == _bucket(v.copy(), signs)


def test_negation_flips_every_nonzero_plane():
    signs = _hyperplane_signs(LSH_PLANES, EMB_DIM)
    rng = np.random.default_rng(11)
    v = rng.normal(size=EMB_DIM)
    x = _round_half_away(v * 1_000_000.0)
    dots = signs @ x
    assert (dots != 0).all()  # generic vector: no exact-zero planes
    b, nb = _bucket(v, signs), _bucket(-v, signs)
    assert b ^ nb == (1 << LSH_PLANES) - 1
