"""blocked_lsh_jaccard_pairs must equal the exhaustive blocked scan.

The LSH-within-block path (banded candidates + exact verification) replaces
round-1's quadratic-per-block ngram_jaccard_pairs as the production pair
source; ngram_jaccard_pairs stays as the reference verifier. These tests pin
their equality — pairs, exact sim values, and the blocking contract — on
corpora with near-dup structure, plus edge cases (empty docs, singleton
blocks, cross-block near-identical text that must NOT pair).
"""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from rayextract.dedup import blocked_lsh_jaccard_pairs, ngram_jaccard_pairs

WORDS = [f"tok{i}" for i in range(40)]


def _corpus(n_blocks: int = 4, per_block: int = 30, seed: int = 3) -> pd.DataFrame:
    rng = np.random.RandomState(seed)
    rows = []
    doc_id = 0
    for b in range(n_blocks):
        base = rng.choice(WORDS, size=60).tolist()
        for i in range(per_block):
            toks = list(base)
            # a gradient of mutation rates: some near-dups, some unrelated
            n_mut = rng.randint(0, 40)
            for _ in range(n_mut):
                toks[rng.randint(len(toks))] = rng.choice(WORDS)
            rows.append({"doc_id": doc_id, "text": " ".join(toks), "source": f"s{b}"})
            doc_id += 1
    return pd.DataFrame(rows)


def _canon(ds) -> pd.DataFrame:
    df = ds.to_pandas()
    df["sim"] = df["sim"].round(9)
    return df.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


@pytest.mark.parametrize("threshold", [0.5, 0.9])
def test_lsh_equals_exhaustive(threshold):
    docs = rd.from_pandas(_corpus()).repartition(6)
    lsh = _canon(
        blocked_lsh_jaccard_pairs(docs, threshold=threshold, block_key="source")
    )
    ref = _canon(
        ngram_jaccard_pairs(docs, threshold=threshold, block_key="source")
    )
    assert len(lsh) > 0  # the corpus must actually produce near-dups
    pd.testing.assert_frame_equal(lsh, ref)


def test_blocking_contract_and_edge_cases():
    # identical text in DIFFERENT blocks must not pair; empty docs never pair
    df = pd.DataFrame(
        [
            {"doc_id": 0, "text": "a b c d e", "source": "x"},
            {"doc_id": 1, "text": "a b c d e", "source": "y"},
            {"doc_id": 2, "text": "a b c d e", "source": "x"},
            {"doc_id": 3, "text": "", "source": "x"},
            {"doc_id": 4, "text": "", "source": "x"},
            {"doc_id": 5, "text": "q r s", "source": "z"},  # singleton block
        ]
    )
    out = _canon(
        blocked_lsh_jaccard_pairs(rd.from_pandas(df), threshold=0.9, block_key="source")
    )
    assert out[["doc_a", "doc_b"]].values.tolist() == [[0, 2]]
    assert out["sim"].iloc[0] == 1.0
