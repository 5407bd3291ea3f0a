"""Cross-lingual bitext pair mining (queries.bitext_mine_pairs): DuckDB
oracle parity on a mixed corpus, planted-translation recovery, and
determinism. The op's contract: mutual-best cosine pairs inside shared LSH
buckets, exact int64 dots, bit-stable IEEE score, ties -> lowest vec_id.
"""

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

from rayextract.queries import QUERIES, SQL

N, DIM = 48, 64
rng = np.random.RandomState(11)
EMB = rng.standard_normal((N, DIM))
EMB /= np.linalg.norm(EMB, axis=1, keepdims=True)
# plant a translation pair: doc 40 (de) is doc 3 (en) plus tiny noise ->
# same LSH bucket with overwhelming probability, near-1.0 cosine, and
# mutual best on both sides
EMB[40] = EMB[3] + 0.01 * rng.standard_normal(DIM)
EMB[40] /= np.linalg.norm(EMB[40])
LANGS = ["en" if i < 24 else ("fr" if i < 36 else "de") for i in range(N)]


@pytest.fixture(scope="module")
def bitext_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("bitext_sf")
    docs = pd.DataFrame(
        {"doc_id": np.arange(N, dtype=np.int64),
         "text": [f"doc {i}" for i in range(N)],
         "lang": LANGS, "source": ["s"] * N,
         "n_chars": np.full(N, 5, dtype=np.int64)}
    )
    docs.to_parquet(os.path.join(d, "documents.parquet"), index=False)
    emb = pd.DataFrame(
        {"vec_id": np.arange(N, dtype=np.int64),
         "embedding": [row.tolist() for row in EMB]}
    )
    emb.to_parquet(os.path.join(d, "embeddings.parquet"), index=False)
    return str(d)


def _run(bitext_dir) -> pd.DataFrame:
    return QUERIES["bitext_mine_pairs"](bitext_dir).to_pandas()


def test_matches_duckdb_oracle(bitext_dir, ray_session):
    got = _run(bitext_dir)
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{bitext_dir}/{t}.parquet'"
        )
    want = con.execute(SQL["bitext_mine_pairs"]).df()
    assert sorted(got.columns) == sorted(want.columns)
    key = ["en_id", "other_id"]
    g = got.sort_values(key).reset_index(drop=True)[sorted(got.columns)]
    w = want.sort_values(key).reset_index(drop=True)[sorted(want.columns)]
    assert len(g) == len(w)
    for c in ("en_id", "other_id", "score_e6"):
        assert list(g[c].astype("int64")) == list(w[c].astype("int64")), c
    assert list(g["other_lang"]) == list(w["other_lang"])


def test_planted_translation_recovered(bitext_dir, ray_session):
    out = _run(bitext_dir)
    hit = out[(out["en_id"] == 3) & (out["other_id"] == 40)]
    assert len(hit) == 1, out
    assert hit["other_lang"].iloc[0] == "de"
    assert hit["score_e6"].iloc[0] > 990_000  # near-identical vectors
    # mutual-best is 1:1 per bucket side: no en or other id repeats with
    # the same partner on both ends
    assert out["other_id"].is_unique


def test_deterministic_rerun(bitext_dir, ray_session):
    key = ["en_id", "other_id"]
    a = _run(bitext_dir).sort_values(key).reset_index(drop=True)
    b = _run(bitext_dir).sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
