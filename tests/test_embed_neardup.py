"""Banded-LSH embedding near-dup (VERDICT r2 #1): the linear candidate
route must emit a SUBSET of the exhaustive exact pairs (no false positives,
every emitted sim exact), dedup pairs found by multiple bands, and recall
planted high-sim near-dups where the S-curve is ~1."""

import numpy as np
import pandas as pd

import ray.data as rd

from rayextract.similarity import embedding_neardup_pairs


def _mk_emb(n=120, dim=64, seed=4, planted=10, noise=0.02):
    """Random unit-ish vectors + ``planted`` near-dup partners (cos ~0.999)
    attached to the first ``planted`` subset members (vec_id % 5 == 0)."""
    rng = np.random.RandomState(seed)
    base = rng.standard_normal((n, dim))
    rows = [{"vec_id": i * 5, "embedding": base[i].tolist()} for i in range(n)]
    expected = []
    for j in range(planted):
        a = j * 5
        b = n * 5 + j * 5  # also % 5 == 0
        rows.append(
            {"vec_id": b,
             "embedding": (base[j] + noise * rng.standard_normal(dim)).tolist()}
        )
        expected.append((a, b))
    # plus some off-subset rows that must never appear in any pair
    for j in range(20):
        rows.append({"vec_id": n * 10 + j * 5 + 1,
                     "embedding": rng.standard_normal(dim).tolist()})
    return pd.DataFrame(rows), expected


def _pairs(df):
    return set(zip(df["a"].astype(int), df["b"].astype(int)))


def test_banded_subset_of_exact_and_planted_recall():
    df, expected = _mk_emb()
    ds = rd.from_pandas(df)
    exact = embedding_neardup_pairs(ds, 0.9, modulus=5, bands=None).to_pandas()
    banded = embedding_neardup_pairs(ds, 0.9, modulus=5).to_pandas()

    ep, bp = _pairs(exact), _pairs(banded)
    # no false positives: every banded pair is an exact-qualifying pair
    assert bp <= ep
    # planted cos~0.999 near-dups: banded recall is 1 at the default 8x8
    # parameters (deterministic hyperplanes + seeded data => stable outcome)
    assert set(expected) <= bp
    # sims are the exact float64 cosines (same vectors as the exhaustive
    # path; gemm blocking for the different matrix shapes may differ by ulps)
    es = {(int(r.a), int(r.b)): r.sim for r in exact.itertuples()}
    for r in banded.itertuples():
        assert abs(es[(int(r.a), int(r.b))] - r.sim) < 1e-12
    # each pair exactly once even when several bands find it (cos~0.999
    # pairs collide in nearly all 8 bands)
    assert len(banded) == len(bp)
    # modulus gate: no off-subset ids anywhere
    all_ids = np.r_[banded["a"].to_numpy(), banded["b"].to_numpy()]
    assert (all_ids % 5 == 0).all()


def test_banded_partition_invariance():
    """Same result whether the input arrives as 1 block or many."""
    df, _ = _mk_emb(n=60, planted=5)
    one = embedding_neardup_pairs(rd.from_pandas(df), 0.9, modulus=5).to_pandas()
    blocks = [df.iloc[i::7].reset_index(drop=True) for i in range(7)]
    many = embedding_neardup_pairs(
        rd.from_pandas(blocks), 0.9, modulus=5
    ).to_pandas()
    key = ["a", "b"]
    pd.testing.assert_frame_equal(
        one.sort_values(key).reset_index(drop=True),
        many.sort_values(key).reset_index(drop=True),
    )


def test_banded_empty_subset():
    df = pd.DataFrame(
        {"vec_id": [1, 2, 3], "embedding": [np.ones(64).tolist()] * 3}
    )
    out = embedding_neardup_pairs(rd.from_pandas(df), 0.4, modulus=5).to_pandas()
    assert len(out) == 0
