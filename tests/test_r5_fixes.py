"""Round-5 regression tests for the r4 advice findings.

1. MinHasher batch path: cache epoch-reset must not evict shingles the
   current batch still needs (KeyError crash past _CACHE_MAX uniques).
2. checkpoint.py: crash-safe publish (no double-read of partial writes) and
   params/input-keyed fingerprints (no stale signatures after param change).
3. PerceptronNerTagger: null/NaN text tolerated; pinned Arrow output schema.
4. kmeans_embeddings: checkpoint_dir path matches the default streaming path.
"""

import os

import numpy as np
import pandas as pd
import pytest


# -- 1. MinHasher eviction -------------------------------------------------

def test_minhasher_eviction_keeps_current_batch(monkeypatch):
    from rayextract.dedup import MinHasher

    monkeypatch.setattr(MinHasher, "_CACHE_MAX", 8)
    mh = MinHasher(num_perm=16, ngram=1)
    ref = MinHasher(num_perm=16, ngram=1)  # default (never-evicting) cap

    # batch 1 seeds the cache; batch 2 shares tokens with batch 1 AND brings
    # enough new uniques to cross the cap — pre-fix this raised KeyError on
    # the shared (cached-then-evicted) shingles.
    b1 = pd.DataFrame({"doc_id": [1], "text": ["alpha beta gamma delta epsilon zeta"]})
    b2 = pd.DataFrame(
        {"doc_id": [2], "text": ["alpha beta gamma one two three four five six seven"]}
    )
    out1, out2 = mh(b1), mh(b2)
    r1, r2 = ref(b1), ref(b2)
    assert out1["sig"][0] == r1["sig"][0]
    assert out2["sig"][0] == r2["sig"][0]
    # the reset re-seeded with the current batch and stayed bounded-ish
    assert len(mh._cache) <= max(MinHasher._CACHE_MAX, 10)

    # a third batch reusing batch-2 tokens still agrees (warm-after-reset)
    b3 = pd.DataFrame({"doc_id": [3], "text": ["one two three alpha beta gamma"]})
    assert mh(b3)["sig"][0] == ref(b3)["sig"][0]


def test_minhasher_eviction_stress(monkeypatch):
    """Many batches with rolling vocabulary: every signature must equal a
    fresh hasher's, across repeated epoch resets."""
    from rayextract.dedup import MinHasher

    monkeypatch.setattr(MinHasher, "_CACHE_MAX", 32)
    mh = MinHasher(num_perm=8, ngram=1)
    for start in range(0, 200, 17):
        toks = " ".join(f"w{i}" for i in range(start, start + 25))
        df = pd.DataFrame({"doc_id": [start], "text": [toks]})
        fresh = MinHasher(num_perm=8, ngram=1)
        assert mh(df)["sig"][0] == fresh(df)["sig"][0], start


# -- 2. checkpoint.py crash-safety / fingerprinting --------------------------

def _mini_ds(texts):
    import ray.data as rd

    return rd.from_pandas(pd.DataFrame({"doc_id": range(len(texts)), "text": texts}))


def test_checkpoint_partial_write_not_double_read(tmp_path, ray_session):
    """A dir left behind by a crashed write (files, no marker) must be
    replaced, not appended to: pre-fix, Ray's unique filenames meant a retry
    doubled every signature row."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from rayextract.checkpoint import checkpointed_parquet

    root = str(tmp_path / "ck")
    os.makedirs(root)
    # stale partial rows from a "crashed" earlier attempt
    pq.write_table(
        pd.DataFrame({"doc_id": [99], "sig": [b"zz"]}).pipe(
            lambda d: __import__("pyarrow").Table.from_pandas(d)
        ),
        os.path.join(root, "stale-000.parquet"),
    )
    builds = []

    def build():
        builds.append(1)
        return rd.from_pandas(pd.DataFrame({"doc_id": [1, 2], "sig": [b"a", b"b"]}))

    out = checkpointed_parquet(build, root, "fp1").to_pandas()
    assert sorted(out["doc_id"]) == [1, 2]  # stale row gone, no duplication
    assert builds == [1]
    # resume: same fingerprint -> no rebuild
    out2 = checkpointed_parquet(build, root, "fp1").to_pandas()
    assert builds == [1] and sorted(out2["doc_id"]) == [1, 2]
    # fingerprint change -> rebuild
    checkpointed_parquet(build, root, "fp2").to_pandas()
    assert builds == [1, 1]


def test_minhash_checkpoint_keyed_to_params(tmp_path, ray_session):
    """Reusing a checkpoint_dir with different (num_perm, ngram) must NOT
    serve the old signatures."""
    import rayextract.dedup as dd

    base = "the quick brown fox jumps over the lazy dog " * 4
    docs = _mini_ds([base, base + " tail", "completely different words here " * 6])
    ckpt = str(tmp_path / "sigs")

    dd.minhash_lsh_pairs(docs, threshold=0.5, bands=16, ngram=3,
                         checkpoint_dir=ckpt).to_pandas()
    plain2 = (
        dd.minhash_lsh_pairs(docs, threshold=0.5, bands=16, ngram=2)
        .to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    )
    reused = (
        dd.minhash_lsh_pairs(docs, threshold=0.5, bands=16, ngram=2,
                             checkpoint_dir=ckpt)
        .to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(plain2, reused)


def test_minhash_checkpoint_token_keys_corpus(tmp_path, ray_session):
    """checkpoint_token distinguishes corpora that have no file lineage."""
    import rayextract.dedup as dd

    a = _mini_ds(["the quick brown fox jumps over the lazy dog " * 4] * 2)
    b = _mini_ds(["a wholly different corpus of words entirely " * 4] * 2)
    ckpt = str(tmp_path / "sigs")
    pa_ = dd.minhash_lsh_pairs(a, threshold=0.5, bands=16, checkpoint_dir=ckpt,
                               checkpoint_token="corpus-a").to_pandas()
    pb = dd.minhash_lsh_pairs(b, threshold=0.5, bands=16, checkpoint_dir=ckpt,
                              checkpoint_token="corpus-b").to_pandas()
    fresh_b = dd.minhash_lsh_pairs(b, threshold=0.5, bands=16).to_pandas()
    assert len(pb) == len(fresh_b)
    assert len(pa_) == 1 and len(pb) == 1
    # corpus-b pairs are b's ids over b's signatures, not stale a's
    assert set(pb["est_sim"]) == set(fresh_b["est_sim"])


# -- 3. NER tagger: null text + pinned schema --------------------------------

def test_ner_tagger_null_text_and_schema():
    import pyarrow as pa

    from rayextract.ner_model import PerceptronNerTagger

    tagger = PerceptronNerTagger()
    df = pd.DataFrame(
        {"doc_id": [1, 2, 3],
         "text": [None, float("nan"), "JOHN SMITH WORKS AT ACME CORP"]}
    )
    out = tagger(df)  # pre-fix: TypeError in _TOKEN.finditer(NaN)
    assert isinstance(out, pa.Table)
    assert out.schema.equals(PerceptronNerTagger.OUT_SCHEMA)
    assert out.column("person").to_pylist()[:2] == [None, None]

    # all-None batch infers the SAME schema (the r4 unhashable-schema spam)
    out2 = tagger(pd.DataFrame({"doc_id": [9], "text": [None]}))
    assert out2.schema.equals(out.schema)


# -- 3b. metadata-stripped reads (the real schema-hash-warning source) --------

def test_read_parquet_clean_strips_pandas_metadata(tmp_path, ray_session):
    """pandas-written parquet embeds b'pandas' schema metadata, which makes
    pa.Schema unhashable in this pyarrow build and defeats Ray's schema
    dedup (per-batch 'Failed to hash the schemas' from every worker). The
    clean read must yield hashable, metadata-free block schemas while
    keeping column pruning."""
    import pyarrow.parquet as pq

    from rayextract.pqio import read_parquet_clean

    p = str(tmp_path / "t.parquet")
    pd.DataFrame({"a": [1, 2], "b": ["x", "y"], "c": [0.5, 1.5]}).to_parquet(p)
    assert b"pandas" in (pq.read_schema(p).metadata or {})  # precondition

    ds = read_parquet_clean(p, columns=["a", "b"])
    batch = ds.map_batches(lambda t: t, batch_format="pyarrow").take_batch(
        2, batch_format="pyarrow"
    )
    assert batch.schema.names == ["a", "b"]  # pruning preserved
    assert not batch.schema.metadata
    hash(batch.schema)  # pre-fix: TypeError unhashable type: 'dict'


def test_queries_read_is_clean(ray_session):
    import pyarrow as pa

    from rayextract.queries import _read

    sf = os.environ.get("GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
    if not os.path.isdir(sf):
        pytest.skip("no testdata")
    t = _read(sf, "documents", ["doc_id", "text"]).take_batch(
        4, batch_format="pyarrow"
    )
    assert isinstance(t, pa.Table) and not t.schema.metadata
    hash(t.schema)


# -- 4. kmeans checkpoint path ------------------------------------------------

def test_kmeans_checkpoint_matches_default(tmp_path, ray_session):
    from rayextract import queries as q

    sf = os.environ.get("GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
    if not os.path.isdir(sf):
        pytest.skip("no testdata")
    ck = str(tmp_path / "km")
    base = q.kmeans_embeddings(sf).to_pandas().sort_values("vec_id")
    ckpt = (
        q.kmeans_embeddings(sf, checkpoint_dir=ck).to_pandas().sort_values("vec_id")
    )
    pd.testing.assert_frame_equal(
        base.reset_index(drop=True), ckpt.reset_index(drop=True)
    )
    assert os.path.exists(ck + "._SUCCESS")
    # resumed run reuses the projection (marker fingerprint still valid)
    again = (
        q.kmeans_embeddings(sf, checkpoint_dir=ck).to_pandas().sort_values("vec_id")
    )
    pd.testing.assert_frame_equal(
        base.reset_index(drop=True), again.reset_index(drop=True)
    )
