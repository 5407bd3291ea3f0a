"""MinHash estimator calibration regression.

The original (a*h+b) mod 2^61-1 over 32-bit inputs wrapped the modulus at
most 3 times, so hash ORDER nearly equaled input order: every permutation's
minimum landed on the same globally-smallest shared shingle and unrelated
docs collided at est_sim ~0.9 (observed at sf0.1: median TRUE Jaccard of
reported 'near-dup' pairs was 0.013). The GF(2^31-1) family fixed it; these
bounds would catch any regression of that class.
"""

import numpy as np

from rayextract.dedup import MinHasher, _token_set, jaccard

WORDS = [f"w{i}" for i in range(60)]


def _doc(seed: int, n: int = 80) -> str:
    rng = np.random.RandomState(seed)
    return " ".join(rng.choice(WORDS, size=n))


def test_estimator_tracks_true_jaccard():
    mh = MinHasher(num_perm=256, ngram=3)
    rng = np.random.RandomState(1)
    for sa, sb in [(1, 2), (3, 4), (5, 6)]:
        a, b = _doc(sa), _doc(sb)
        est = (mh.signature(a) == mh.signature(b)).mean()
        true = jaccard(_token_set(a, 3), _token_set(b, 3))
        assert abs(est - true) < 0.12, (est, true)

    # near-dup: b = a with a few tokens changed
    a_toks = _doc(7).split()
    b_toks = list(a_toks)
    for i in (5, 40, 70):
        b_toks[i] = "CHANGED"
    a, b = " ".join(a_toks), " ".join(b_toks)
    est = (mh.signature(a) == mh.signature(b)).mean()
    true = jaccard(_token_set(a, 3), _token_set(b, 3))
    assert true > 0.7
    assert abs(est - true) < 0.12, (est, true)


def test_unrelated_docs_never_estimate_high():
    mh = MinHasher(num_perm=128, ngram=3)
    ests = []
    for s in range(10, 30, 2):
        a, b = _doc(s), _doc(s + 1)
        ests.append((mh.signature(a) == mh.signature(b)).mean())
    assert max(ests) < 0.35, ests


def test_shingleless_docs_excluded_from_pairing():
    import pandas as pd

    mh = MinHasher(ngram=3)
    out = mh(pd.DataFrame({"doc_id": [1, 2, 3], "text": ["a b", "x", "one two three four"]}))
    assert out["doc_id"].tolist() == [3]


def test_batched_call_matches_signature():
    # __call__'s batched unique-shingle/reduceat path must be bit-identical
    # to the per-doc signature() reference (same md5, same CW mins)
    import numpy as np
    import pandas as pd

    from rayextract.synth import conversation_rows

    mh = MinHasher(num_perm=128, ngram=3)
    rows = [r for c in range(40) for r in conversation_rows(7, c)]
    df = pd.DataFrame(
        {"doc_id": range(len(rows)), "text": [r["text"] for r in rows]}
    )
    # include empties and shingle-less docs
    df.loc[len(df)] = {"doc_id": len(df), "text": ""}
    df.loc[len(df)] = {"doc_id": len(df), "text": "one two"}  # < 3 tokens
    out = mh(df)
    ref = MinHasher(num_perm=128, ngram=3)
    expected = {}
    for did, text in zip(df["doc_id"], df["text"]):
        sig = ref.signature(text)
        if sig[0] != np.uint64((1 << 31) - 1):
            expected[did] = sig.tobytes()
    assert list(out["doc_id"]) == list(expected.keys())
    for did, sig in zip(out["doc_id"], out["sig"]):
        assert sig == expected[did], did
    # second batch exercises the warm cache path
    out2 = mh(df)
    assert list(out2["sig"]) == list(out["sig"])


def test_checkpointed_signatures_resume(tmp_path, monkeypatch, ray_session):
    """checkpoint_dir: sigs persist as parquet + marker; a resumed run must
    NOT recompute signatures (MinHasher never instantiated) and must return
    identical pairs."""
    import pandas as pd

    import ray.data as rd

    import rayextract.dedup as dd

    base = "the quick brown fox jumps over the lazy dog " * 4
    texts = [base, base + "tail", "completely different words here " * 6]
    docs = rd.from_pandas(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    ckpt = str(tmp_path / "sigs")

    plain = (
        dd.minhash_lsh_pairs(docs, threshold=0.5, bands=16)
        .to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    )
    first = (
        dd.minhash_lsh_pairs(docs, threshold=0.5, bands=16, checkpoint_dir=ckpt)
        .to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(plain, first)
    import os

    assert os.path.exists(ckpt + "._SUCCESS")

    class Boom:
        def __init__(self, *a, **k):
            raise AssertionError("signature stage recomputed on resume")

    monkeypatch.setattr(dd, "MinHasher", Boom)
    resumed = (
        dd.minhash_lsh_pairs(docs, threshold=0.5, bands=16, checkpoint_dir=ckpt)
        .to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(plain, resumed)
