"""Partition invariance: the engine's central determinism claim — every
operator's RESULT is independent of how Ray splits the input into blocks
and batches. Each op runs twice over the same corpus: once with default
block sizing, once with target_max_block_size forced tiny (many small
blocks → different batch boundaries, partial counts, and merge orders).
Canonicalized outputs must be identical."""

import os

import numpy as np
import pandas as pd
import pytest

import ray.data

from rayextract.queries import QUERIES

OPS = [
    "dedup_paragraphs",          # 3-exchange first-occurrence semantics
    "pack_sequences",            # distributed exclusive scan (SUM monoid)
    "late_event_audit",          # distributed exclusive scan (MAX monoid)
    "ohlc_value_per_type_hour",  # mergeable first/last-by-key partials
    "user_retention_cohorts",    # transform-min cohort in one exchange
    "funnel_view_click_purchase",  # per-session state machine
    "table_checksum_documents",  # commutative mod-sum
    "event_path_trigrams",       # cross-batch adjacency within user
    "heavy_hitters_tokens",      # MG sketch: counts+global err via marker row
    "doc_trigram_top20",         # Counter partials -> bucketed sum -> top-k
    "dedup_containment",         # rare-anchor blocking + candidate overlap
    "doc_token_entropy",         # per-term micro-nat rounding, no shuffle
    "event_anomaly_days",        # integer 2-sigma flags over day cells
    "scd2_user_value_history",   # in-bucket LEAD over (user, ts, id) sort
    "rapid_fire_pairs_per_user",  # band self-join via composed-key search
    "kmv_distinct_tokens_per_source",  # bottom-k-of-unions sketch
    "curriculum_order_docs",     # global rank from bin-histogram offsets
    "span_interval_islands",     # per-batch islands scan
    "winsorized_value_stats",    # exact order statistics + clipped partials
    "tool_usage_stats",          # conv-bucketed LAG + per-tool rollup
]


@pytest.fixture(scope="module")
def inv_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("inv_sf"))
    rng = np.random.default_rng(42)
    n = 1500
    texts = [
        " ".join(rng.choice([f"w{i}" for i in range(9)],
                            size=rng.integers(0, 60)).tolist())
        for _ in range(n)
    ]
    pd.DataFrame(
        {"doc_id": np.arange(n, dtype="int64"), "text": texts,
         "lang": "en", "source": rng.choice(["s0", "s1", "s2"], size=n),
         "n_chars": [len(t) for t in texts]}
    ).to_parquet(os.path.join(d, "documents.parquet"), index=False)
    m = 3000
    pd.DataFrame(
        {"event_id": np.arange(m, dtype="int64"),
         "ts": (pd.Timestamp("2026-03-01")
                + pd.to_timedelta(rng.integers(0, 6 * 3600, size=m), unit="s")
                ).astype("datetime64[us]"),
         "user_id": rng.integers(0, 40, size=m).astype("int64"),
         "event_type": rng.choice(
             ["view", "click", "purchase", "signup", "error"], size=m),
         "value": rng.uniform(0, 50, size=m).round(2),
         "props": "{}"}
    ).to_parquet(os.path.join(d, "events.parquet"), index=False)
    return d


def _canon(res) -> list[tuple]:
    df = res.to_pandas() if hasattr(res, "to_pandas") else res
    df = df[sorted(df.columns)]
    return sorted(
        [tuple(r) for r in df.itertuples(index=False, name=None)], key=repr
    )


@pytest.mark.parametrize("name", OPS)
def test_partition_invariant(name, inv_dir, ray_session):
    ctx = ray.data.DataContext.get_current()
    saved = ctx.target_max_block_size
    try:
        base = _canon(QUERIES[name](inv_dir))
        ctx.target_max_block_size = 16 * 1024  # force many tiny blocks
        small = _canon(QUERIES[name](inv_dir))
    finally:
        ctx.target_max_block_size = saved
    assert base == small, f"{name} result changed under re-partitioning"
