"""Bloom-filter semi-join helpers: the no-false-negative guarantee, a sane
false-positive rate at the default sizing, determinism across processes
(pure arithmetic), and the empty-build-side edge."""

import numpy as np
import pandas as pd

import ray.data

from rayextract.relational import (
    bloom_might_contain,
    build_bloom_filter,
    _bloom_positions,
)


def _build(keys, m_bits=1 << 20, k=4):
    ds = ray.data.from_pandas(pd.DataFrame({"okey": np.asarray(keys, dtype="int64")}))
    return build_bloom_filter(ds, "okey", m_bits=m_bits, k=k)


def test_members_always_hit(ray_session):
    keys = np.arange(0, 5000, 7, dtype="int64")
    bits = _build(keys)
    assert bloom_might_contain(bits, keys).all()


def test_false_positive_rate_bounded(ray_session):
    keys = np.arange(0, 10_000, dtype="int64")
    bits = _build(keys)
    probe = np.arange(1_000_000, 1_100_000, dtype="int64")  # disjoint
    fp = bloom_might_contain(bits, probe).mean()
    # 10k keys, k=4, m=2^20 -> theoretical fp ~ (1-e^(-40000/2^20))^4 ~ 2e-6
    assert fp < 1e-3


def test_empty_build_side_rejects_everything(ray_session):
    bits = _build(np.array([], dtype="int64"))
    assert not bloom_might_contain(bits, np.arange(100, dtype="int64")).any()


def test_positions_deterministic_and_in_range():
    keys = np.array([0, 1, -5, 2**62, 123456789], dtype="int64")
    a = _bloom_positions(keys, 1 << 20, 4)
    b = _bloom_positions(keys.copy(), 1 << 20, 4)
    for pa, pb in zip(a, b):
        assert (pa == pb).all()
        assert (pa < (1 << 20)).all()
