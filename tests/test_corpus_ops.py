"""Edge-case parity for the corpus-prep operators (chunking, repetition,
inverted index, tf-idf, event deltas) on a tiny synthetic corpus that
exercises cases the driver testdata doesn't: empty text, whitespace-only,
single-token docs, bigram ties, exact window boundaries, tied timestamps.

Each Ray query is compared against its own DuckDB oracle SQL over the same
parquet — the same contract the driver enforces.
"""

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

from rayextract.queries import QUERIES, SQL

EDGE_DOCS = pd.DataFrame(
    {
        "doc_id": np.arange(9, dtype=np.int64),
        "text": [
            "",  # empty
            "   ",  # whitespace-only
            "solo",  # single token -> no bigram
            "a b a b a b",  # clear top bigram 'a b'
            "x y y x",  # tie: 'x y', 'y y', 'y x' all count 1 -> lexic. smallest
            " ".join(f"w{i%7}" for i in range(32)),  # exactly one full window
            " ".join(f"w{i%7}" for i in range(33)),  # one full + 9-token tail
            " ".join(f"t{i%5}" for i in range(24)),  # exactly stride tokens
            "contact a.b@x.io or 555-123-4567 ssn 123-45-6789",  # PII (7 toks)
        ],
        "lang": ["en"] * 9,
        "source": ["s0", "s0", "s1", "s1", "s2", "s2", "s3", "s3", "s4"],
        "n_chars": np.zeros(9, dtype=np.int64),
    }
)
EDGE_DOCS["n_chars"] = EDGE_DOCS["text"].str.len().astype("int64")

EDGE_EVENTS = pd.DataFrame(
    {
        "event_id": np.arange(6, dtype=np.int64),
        "ts": pd.to_datetime(
            [
                "2026-01-01 00:00:00",
                "2026-01-01 00:00:00",  # tied ts, same user
                "2026-01-01 00:10:00",
                "2026-01-01 01:00:00",
                "2026-02-01 00:00:00",  # singleton user
                "2026-01-01 00:05:00",
            ]
        ).astype("datetime64[us]"),
        "user_id": np.asarray([1, 1, 1, 1, 2, 3], dtype=np.int64),
        "event_type": ["click"] * 6,
        "value": np.ones(6),
        "props": ["{}"] * 6,
    }
)


@pytest.fixture(scope="module")
def edge_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_sf")
    EDGE_DOCS.to_parquet(os.path.join(d, "documents.parquet"), index=False)
    EDGE_EVENTS.to_parquet(os.path.join(d, "events.parquet"), index=False)
    return str(d)


def _oracle(edge_dir: str, name: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in ("documents", "events"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{edge_dir}/{t}.parquet'")
    return con.execute(SQL[name]).df()


def _df(res) -> pd.DataFrame:
    return res.to_pandas() if hasattr(res, "to_pandas") else res


def _canon(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].where(pd.notna(df[c]), None)
    rows = [
        tuple(int(v) if isinstance(v, np.integer) else v for v in r)
        for r in df.itertuples(index=False, name=None)
    ]
    return sorted(rows, key=repr)


@pytest.mark.parametrize(
    "name",
    ["chunk_documents", "doc_repetition_filter", "inverted_index",
     "doc_tfidf_topk", "user_event_deltas", "mad_value_per_type",
     "cooccur_top20", "dedup_substring", "dedup_paragraphs",
     "pack_sequences", "user_retention_cohorts", "transcript_turn_stats",
     "ohlc_value_per_type_hour", "event_path_trigrams",
     "table_checksum_documents", "weighted_sample_docs",
     "funnel_view_click_purchase", "dedup_incremental",
     "table_diff_documents", "sliding_distinct_users", "bpe_top_merges",
     "late_event_audit", "doc_pii_flags", "dsir_importance_select",
     "merge_upsert_documents", "conv_role_audit",
     "t5_span_corruption_stats", "doc_kneser_ney_logprob",
     "pmi_top_collocations", "vocab_growth_curve", "lang_label_audit",
     "source_scorecard", "mixture_plan_sources", "doc_readability_stats",
     "curate_corpus_v2", "conv_packing_plan", "sft_pair_extract",
     "gazetteer_match_counts", "oov_rate_vs_vocab",
     "trigram_diversity_per_source", "shuffle_skew_audit",
     "histogram_quantiles_value", "source_token_js_divergence",
     "doc_max_repeated_ngram", "turn_dedup_normalized",
     "boilerplate_prefix_per_source", "corpus_datasheet",
     "length_bucket_batching_plan", "contract_audit_documents"],
)
def test_edge_parity(name, edge_dir, ray_session):
    got = _df(QUERIES[name](edge_dir))
    want = _oracle(edge_dir, name)
    assert sorted(got.columns) == sorted(want.columns)
    assert _canon(got) == _canon(want), name


@pytest.mark.parametrize("name", ["dedup_edit_verified", "pagerank_neardup"])
def test_edge_parity_empty_graph(name, edge_dir, ray_session):
    """The edge corpus has no same-source near-dup pair: both graph ops must
    return an empty result (matching the oracle), not crash on the empty
    candidate set."""
    got = _df(QUERIES[name](edge_dir))
    want = _oracle(edge_dir, name)
    assert len(got) == 0 and len(want) == 0


def test_substring_dup_known_overlap(edge_dir, ray_session):
    """Docs 5 and 6 share their 32-token prefix (w0..w6 cycle): every one of
    doc 5's 7 distinct shingles occurs in doc 6 too. Short docs (<8 tokens)
    are omitted entirely."""
    out = QUERIES["dedup_substring"](edge_dir).to_pandas().set_index("doc_id")
    assert set(out.index) == {5, 6, 7}
    # the 7-token cycle yields exactly 7 distinct 8-token shingles
    assert out.loc[5, "n_shingles"] == 7 and out.loc[5, "n_dup_shingles"] == 7
    assert out.loc[6, "n_shingles"] == 7 and out.loc[6, "n_dup_shingles"] == 7
    # doc 7 cycles t0..t4 (5-cycle): 5 distinct shingles, none shared
    assert out.loc[7, "n_shingles"] == 5 and out.loc[7, "n_dup_shingles"] == 0


def test_levenshtein_matches_duckdb_fuzz():
    import random

    from rayextract.dedup import _levenshtein

    con = duckdb.connect()
    random.seed(7)
    for _ in range(150):
        a = "".join(random.choices("abcd ", k=random.randint(0, 30)))
        b = "".join(random.choices("abcd ", k=random.randint(0, 30)))
        want = con.execute("select levenshtein(?, ?)", [a, b]).fetchone()[0]
        assert _levenshtein(a, b) == want, (a, b)


def test_chunk_shapes(edge_dir, ray_session):
    out = QUERIES["chunk_documents"](edge_dir).to_pandas()
    by = {
        (r.doc_id, r.chunk_idx): (r.chunk_text, r.chunk_tokens)
        for r in out.itertuples()
    }
    # empty / whitespace docs emit exactly one empty chunk
    assert by[(0, 0)] == ("", 0) and by[(1, 0)] == ("", 0)
    # 32 tokens = one full window (stride 24 -> next start 24 < 32 keeps a tail)
    assert by[(5, 0)][1] == 32 and by[(5, 1)][1] == 8
    # 33 tokens: full window + 9-token tail
    assert by[(6, 0)][1] == 32 and by[(6, 1)][1] == 9
    # exactly 24 tokens: single chunk, no empty tail at start==n
    assert by[(7, 0)][1] == 24 and (7, 1) not in by


def test_repetition_tiebreak(edge_dir, ray_session):
    out = QUERIES["doc_repetition_filter"](edge_dir).to_pandas().set_index("doc_id")
    assert out.loc[3, "top_bigram"] == "a b" and out.loc[3, "top_bigram_n"] == 3
    # all bigrams count 1 -> lexicographically smallest wins
    assert out.loc[4, "top_bigram"] == "x y"
    assert out.loc[2, "top_bigram"] == "" and out.loc[2, "top_bigram_n"] == 0
    # 'a b a b a b': 6 tokens, top bigram covers 2*3/6 -> 1.0
    assert out.loc[3, "rep_micro"] == 1_000_000
    assert out.loc[0, "n_tokens"] == 0 and out.loc[0, "rep_micro"] == 0


def test_event_deltas_values(edge_dir, ray_session):
    out = QUERIES["user_event_deltas"](edge_dir).to_pandas().set_index("user_id")
    # user 1: ts 0,0,600s,3600s -> gaps 0,600s,3000s
    assert out.loc[1, "n_events"] == 4
    assert out.loc[1, "max_gap_us"] == 3000 * 1_000_000
    assert out.loc[1, "mean_gap_us"] == 3600 * 1_000_000 // 3
    # singleton users: zero gaps
    assert out.loc[2, "n_events"] == 1 and out.loc[2, "max_gap_us"] == 0
    assert out.loc[2, "mean_gap_us"] == 0


def test_conv_fingerprint_dedup_planted():
    """conv_dedup_exact core: identical conversations share a fingerprint
    (n_copies counts them, min conv_id wins); reordering the SAME turn texts
    across turn_idx values changes the fingerprint; fingerprints are
    partition-invariant (single block vs one-row blocks)."""
    import pandas as pd

    import ray.data as rd

    from rayextract.queries import _conv_fingerprint_dedup

    rows = []

    def conv(cid, texts):
        for i, t in enumerate(texts):
            rows.append({"conv_id": cid, "turn_idx": i, "text": t})

    conv("conv-a", ["hello", "world", "bye"])
    conv("conv-b", ["hello", "world", "bye"])      # exact dup of a
    conv("conv-c", ["world", "hello", "bye"])      # same texts, new order
    conv("conv-d", ["solo"])
    df = pd.DataFrame(rows)

    out = (
        _conv_fingerprint_dedup(rd.from_pandas(df))
        .to_pandas().sort_values("conv_id").reset_index(drop=True)
    )
    by_conv = dict(zip(out["conv_id"], out["n_copies"]))
    assert by_conv == {"conv-a": 2, "conv-c": 1, "conv-d": 1}
    fps = dict(zip(out["conv_id"], out["fp"]))
    assert fps["conv-a"] != fps["conv-c"]  # order-sensitive
    assert (out["fp"] >= 0).all()  # 63-bit: survives BIGINT casts

    # partition invariance: one row per block must give identical output
    blocks = [df.iloc[[i]] for i in range(len(df))]
    out2 = (
        _conv_fingerprint_dedup(rd.from_pandas(blocks))
        .to_pandas().sort_values("conv_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, out2)


def test_compression_ratio_goldens(edge_dir, ray_session):
    """zlib level-6 determinism pinned: exact compressed sizes for known
    inputs (the rows-only op's correctness anchor), empty docs score 0."""
    import zlib

    out = (
        QUERIES["doc_compression_ratio"](edge_dir)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[0, "raw_bytes"] == 0 and out.loc[0, "ratio_e6"] == 0
    for doc_id, text in [(3, "a b a b a b"), (8,
            "contact a.b@x.io or 555-123-4567 ssn 123-45-6789")]:
        b = text.encode()
        assert out.loc[doc_id, "raw_bytes"] == len(b)
        assert out.loc[doc_id, "comp_bytes"] == len(zlib.compress(b, 6))
        import numpy as np
        assert out.loc[doc_id, "ratio_e6"] == int(
            np.floor(len(zlib.compress(b, 6)) * 1e6 / len(b) + 0.5)
        )
    # the long repetitive doc compresses far harder than the PII line
    # (tiny strings like doc 3 are overhead-dominated and score > 1e6)
    assert out.loc[5, "ratio_e6"] < out.loc[8, "ratio_e6"]
    assert out.loc[3, "ratio_e6"] > 1_000_000
