"""Gazetteer kernels: the Aho-Corasick one-pass automaton and the per-term
vectorized scans must agree exactly (the contract that lets the stage pick
its kernel by term count), and every shipped term must be border-free (the
precondition that makes the replace()-count oracle exact)."""

import numpy as np
import pandas as pd
import pytest

from rayextract.gazetteer import (
    TERMS,
    AhoCorasick,
    _assert_border_free,
    ac_counts,
    match_counts_batch,
    vector_counts,
)


def test_terms_border_free():
    _assert_border_free(TERMS)
    with pytest.raises(ValueError):
        _assert_border_free(["aba"])  # border 'a'
    with pytest.raises(ValueError):
        _assert_border_free(["a a"])


def test_known_counts_and_suffix_outputs():
    ac = AhoCorasick(("table", "fast table", "ab"))
    got = ac.counts("fast table ab table fastable")
    # "fast table" contributes to BOTH "fast table" and (via suffix output)
    # "table"; "fastable" contains "table" too -> 3 total "table" hits; and
    # "ab" occurs inside every "table" plus once standalone -> 4.
    assert got.tolist() == [3, 1, 4]


def test_overlapping_terms_one_pass():
    ac = AhoCorasick(("key scan", "scan",))
    got = ac.counts("key scan scan key scan")
    assert got.tolist() == [2, 3]


def test_kernels_agree_on_corpus_sample():
    rng = np.random.default_rng(7)
    vocab = ["fast", "table", "row", "scan", "merge", "batch", "hash",
             "value", "spark", "stream", "vector", "key", "a", "the"]
    texts = pd.Series(
        [" ".join(rng.choice(vocab, size=rng.integers(0, 60)))
         for _ in range(300)]
        + ["", "fast table fast table", "key scan", None]
    )
    v = vector_counts(texts, TERMS)
    a = ac_counts(texts.tolist(), TERMS)
    np.testing.assert_array_equal(v, a)


def test_large_gazetteer_takes_automaton_branch():
    """Above AC_THRESHOLD terms, match_counts_batch must route through the
    one-pass automaton and still agree with the per-term scans."""
    vocab = ["fast", "table", "row", "scan", "merge", "batch", "hash",
             "value", "spark", "stream", "vector", "key"]
    terms = []
    for a in vocab:
        for b in vocab:
            if a != b and a[0] != b[-1]:  # border-free bigram phrases
                terms.append(f"{a} {b}")
    terms = tuple(terms[:80])
    _assert_border_free(terms)
    assert len(terms) >= 64
    rng = np.random.default_rng(11)
    df = pd.DataFrame({
        "doc_id": np.arange(50),
        "text": [" ".join(rng.choice(vocab, size=rng.integers(0, 40)))
                 for _ in range(50)],
    })
    from rayextract.gazetteer import match_counts_batch as mcb

    auto = mcb(df, terms)
    vec = vector_counts(df["text"], terms)
    assert auto["n_matches"].to_numpy().tolist() == vec.sum(axis=1).tolist()
    assert auto["n_terms"].to_numpy().tolist() == (
        (vec > 0).sum(axis=1).tolist()
    )


def test_match_counts_batch_schema():
    df = pd.DataFrame({"doc_id": [1, 2], "text": ["fast table spark", ""]})
    out = match_counts_batch(df)
    assert list(out.columns) == ["doc_id", "n_matches", "n_terms"]
    # "fast table" hits: fast table, table, spark -> 3 matches, 3 terms
    assert out["n_matches"].tolist() == [3, 0]
    assert out["n_terms"].tolist() == [3, 0]
    assert all(out[c].dtype == np.int64 for c in out.columns)
