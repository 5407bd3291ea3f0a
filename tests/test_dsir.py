"""DSIR-style importance selection (Xie et al. 2023, public NeurIPS paper):
hashed unigram+bigram features, target = the corpus's own lang='en' slice,
integer micro-nat log importance ratios.

Parity is checked against the DuckDB oracle on a MIXED-language corpus
(the shared edge corpus in test_corpus_ops is all-'en', which pins the
degenerate target==raw case where every ratio is exactly 0); here the
en/xx vocabularies are mostly disjoint so the sign of the ratio carries
real signal, and we assert the semantics, not just the hash.
"""

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

from rayextract.queries import QUERIES, SQL

DOCS = pd.DataFrame(
    {
        "doc_id": np.arange(8, dtype=np.int64),
        "text": [
            "the cat sat on the mat",          # en
            "the dog sat on the rug",          # en
            "a cat and a dog",                 # en
            "zork blib quux zork blib",        # xx - disjoint vocab
            "quux zork gnar blib gnar",        # xx
            "the cat sat on the mat",          # xx BUT en-looking text ->
                                               # counted in raw only; its
                                               # tokens are target-heavy
            "",                                # en, empty
            "zork",                            # en, single xx-ish token
        ],
        "lang": ["en", "en", "en", "xx", "xx", "xx", "en", "en"],
        "source": ["s"] * 8,
        "n_chars": np.zeros(8, dtype=np.int64),
    }
)
DOCS["n_chars"] = DOCS["text"].str.len().astype("int64")


@pytest.fixture(scope="module")
def mixed_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("dsir_sf")
    DOCS.to_parquet(os.path.join(d, "documents.parquet"), index=False)
    return str(d)


def _run(mixed_dir: str) -> pd.DataFrame:
    out = QUERIES["dsir_importance_select"](mixed_dir).to_pandas()
    return out.set_index("doc_id").sort_index()


def test_dsir_matches_duckdb_oracle(mixed_dir, ray_session):
    got = QUERIES["dsir_importance_select"](mixed_dir).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{mixed_dir}/documents.parquet'"
    )
    want = con.execute(SQL["dsir_importance_select"]).df()
    assert sorted(got.columns) == sorted(want.columns)
    g = got.sort_values("doc_id").reset_index(drop=True)[sorted(got.columns)]
    w = want.sort_values("doc_id").reset_index(drop=True)[sorted(want.columns)]
    for c in g.columns:
        assert list(g[c].astype("int64")) == list(w[c].astype("int64")), c


def test_dsir_semantics(mixed_dir, ray_session):
    out = _run(mixed_dir)
    # every doc appears exactly once, empty doc scores 0 / not selected
    assert len(out) == len(DOCS)
    assert out.loc[6, "n_terms"] == 0
    assert out.loc[6, "logratio_e6"] == 0 and out.loc[6, "selected"] == 0
    # n_terms = 2n-1 for n>=1 tokens (unigrams + bigrams)
    assert out.loc[0, "n_terms"] == 11  # 6 tokens
    assert out.loc[7, "n_terms"] == 1   # 1 token, no bigram
    # en-vocab docs look target-like, xx-vocab docs do not
    assert out.loc[0, "selected"] == 1 and out.loc[1, "selected"] == 1
    assert out.loc[3, "logratio_e6"] < 0 and out.loc[3, "selected"] == 0
    assert out.loc[4, "logratio_e6"] < 0
    # doc 5 is lang='xx' but textually identical to en doc 0: DSIR scores
    # the TEXT, so it must get doc 0's exact score (importance resampling
    # recovers target-like text from the raw pool - the point of the op)
    assert out.loc[5, "logratio_e6"] == out.loc[0, "logratio_e6"]
    assert out.loc[5, "selected"] == 1


def test_dsir_deterministic_rerun(mixed_dir, ray_session):
    a = _run(mixed_dir)
    b = _run(mixed_dir)
    pd.testing.assert_frame_equal(a, b)
