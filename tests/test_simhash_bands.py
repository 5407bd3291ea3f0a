"""Regression: simhash band explosion must preserve all 64 bits.

The original iterrows-based explode coerced the uint64 simhash through
float64 (pandas row coercion), silently corrupting low bits
(…68075 -> …68704 observed) and producing phantom/missing near-dup pairs.
"""

import numpy as np
import pandas as pd

from rayextract.dedup import simhash64, simhash_batch


def test_band_explosion_preserves_bits():
    h = np.uint64(12156046134791368075)
    df = pd.DataFrame({"doc_id": [1], "simhash": np.array([h], dtype=np.uint64)})
    # reproduce the explode stage inline (it's a closure) on one row
    bands = [int((h >> np.uint64(16 * b)) & np.uint64(0xFFFF)) for b in range(4)]
    # reassemble: bands must reconstruct the exact hash
    back = sum(b << (16 * i) for i, b in enumerate(bands))
    assert back == int(h)


def test_simhash_batch_dtype_is_uint64():
    df = pd.DataFrame({"doc_id": [1, 2], "text": ["alpha beta gamma", "alpha beta gamma"]})
    out = simhash_batch(df)
    assert out["simhash"].dtype == np.uint64
    # identical docs -> identical hashes
    assert out["simhash"].iloc[0] == out["simhash"].iloc[1]
    assert int(out["simhash"].iloc[0]) == simhash64("alpha beta gamma")


def test_identical_docs_pair_at_distance_zero(ray_session=None):
    import ray.data as rd

    from rayextract.dedup import simhash_neardup_pairs

    docs = rd.from_pandas(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "the quick brown fox jumps over the lazy dog",
                    "the quick brown fox jumps over the lazy dog",
                    "completely different content with other tokens entirely here",
                ],
            }
        )
    )
    pairs = simhash_neardup_pairs(docs, max_hamming=3).to_pandas()
    assert set(map(tuple, pairs[["doc_a", "doc_b"]].values.tolist())) == {(1, 2)}
    assert pairs["hamming"].iloc[0] == 0
