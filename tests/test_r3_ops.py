"""Round-3 operator tests: Misra-Gries bound, dense-rank ties, semdedup.

The driver-facing correctness of these ops is the DuckDB oracle
(scripts/selfcheck.py); these tests pin the properties the oracle can't —
the sketch's error bound under real truncation, window ties on crafted
input, and the semantic-dedup rule against a brute-force reference.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rayextract.queries import (
    _mg_truncate,
    semdedup_embeddings,
    top_orders_per_priority_dense,
)


def test_mg_truncate_bound():
    """Merged MG partials: n <= true <= n + sum(all partial errs)."""
    rng = np.random.RandomState(11)
    vocab = [f"t{i}" for i in range(40)]
    # zipf-ish stream split into 6 batches
    stream = rng.choice(vocab, size=3000, p=np.arange(40, 0, -1) / np.arange(40, 0, -1).sum())
    true = pd.Series(stream).value_counts()
    partials = []
    for chunk in np.array_split(stream, 6):
        t = pd.Series(chunk).value_counts().rename("n").rename_axis("token").reset_index()
        partials.append(_mg_truncate(t, capacity=5))
    total_err = sum(int(p["err"].iloc[0]) if len(p) else 0 for p in partials)
    assert total_err > 0  # capacity 5 << 40 tokens: truncation must fire
    merged = (
        pd.concat(partials).groupby("token", as_index=False)["n"].sum()
        .set_index("token")["n"]
    )
    for tok, n_hat in merged.items():
        assert n_hat <= true[tok] <= n_hat + total_err
    # tokens dropped everywhere are still bounded by total_err
    for tok in set(vocab) - set(merged.index):
        if tok in true:
            assert true[tok] <= total_err


def test_mg_truncate_exact_when_capacity_large():
    t = pd.DataFrame({"token": ["a", "b"], "n": [5, 3]})
    out = _mg_truncate(t, capacity=10)
    assert out["err"].eq(0).all()
    assert dict(zip(out["token"], out["n"])) == {"a": 5, "b": 3}


@pytest.fixture()
def tie_dir(tmp_path):
    """Orders table with deliberate total ties inside a priority."""
    df = pd.DataFrame(
        {
            "o_orderkey": np.arange(1, 11, dtype="int64"),
            "o_orderpriority": ["1-URGENT"] * 6 + ["2-HIGH"] * 4,
            "o_totalprice": [100.0, 100.0, 90.0, 90.0, 80.0, 10.0,
                             50.0, 50.0, 50.0, 40.0],
        }
    )
    pq.write_table(pa.Table.from_pandas(df), os.path.join(tmp_path, "orders.parquet"))
    return str(tmp_path)


def test_dense_rank_ties(tie_dir, ray_session):
    out = top_orders_per_priority_dense(tie_dir)
    urgent = out[out["o_orderpriority"] == "1-URGENT"].sort_values("o_orderkey")
    # dense rank: 100->1 (x2), 90->2 (x2), 80->3; 10 excluded
    assert urgent["o_orderkey"].tolist() == [1, 2, 3, 4, 5]
    assert urgent["rnk"].tolist() == [1, 1, 2, 2, 3]
    high = out[out["o_orderpriority"] == "2-HIGH"].sort_values("o_orderkey")
    # only two distinct values: all rows survive, ranks 1,1,1,2
    assert high["rnk"].tolist() == [1, 1, 1, 2]


@pytest.fixture()
def emb_dir(tmp_path):
    """Embeddings with a planted near-duplicate pair and an orthogonal-ish
    decoy, 64-dim to match the query's hyperplane contract."""
    rng = np.random.RandomState(3)
    base = rng.randn(64).astype("float32")
    rows = [
        (10, base),
        (20, base + rng.randn(64).astype("float32") * 0.01),  # near-dup of 10
        (30, rng.randn(64).astype("float32")),
        (40, -base),  # anti-parallel: cos < 0, never a dup
    ]
    tbl = pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "embedding": pa.array([r[1].tolist() for r in rows],
                                  pa.list_(pa.float32())),
            "label": pa.array([0, 0, 1, 1], pa.int32()),
        }
    )
    pq.write_table(tbl, os.path.join(tmp_path, "embeddings.parquet"))
    return str(tmp_path)


def test_semdedup_planted_dup(emb_dir, ray_session):
    out = semdedup_embeddings(emb_dir).sort_values("vec_id").reset_index(drop=True)
    by_id = out.set_index("vec_id")
    # 10 and its +noise copy share every hyperplane sign -> same bucket;
    # cos ~ 1 >= 0.4 -> 20 is dominated by 10
    assert bool(by_id.loc[10, "kept"])
    assert not bool(by_id.loc[20, "kept"])
    assert int(by_id.loc[20, "dup_of"]) == 10
    # the anti-parallel vector flips every sign: different bucket, kept
    assert bool(by_id.loc[40, "kept"])
    assert int(by_id.loc[40, "dup_of"]) == -1


@pytest.fixture()
def contain_dir(tmp_path):
    """Documents with a planted containment pair: doc 2 is a strict subset
    (prefix) of doc 1; doc 3 shares a rare shingle but low containment."""
    big = " ".join(f"w{i}" for i in range(40))
    small = " ".join(f"w{i}" for i in range(12))          # contained in big
    other = "w0 w1 w2 " + " ".join(f"z{i}" for i in range(30))
    filler = [" ".join(f"f{i}_{d}" for i in range(20)) for d in range(4)]
    df = pd.DataFrame(
        {"doc_id": np.arange(1, 8, dtype="int64"),
         "text": [big, small, other] + filler,
         "lang": "en", "source": "t", "n_chars": 0}
    )
    df["n_chars"] = df["text"].str.len().astype("int64")
    pq.write_table(pa.Table.from_pandas(df), os.path.join(tmp_path, "documents.parquet"))
    return str(tmp_path)


def test_containment_planted_subset(contain_dir, ray_session):
    from rayextract.queries import dedup_containment

    out = dedup_containment(contain_dir)
    pairs = set(zip(out["doc_a"].astype(int), out["doc_b"].astype(int)))
    assert (1, 2) in pairs  # subset detected
    row = out.set_index(["doc_a", "doc_b"]).loc[(1, 2)]
    assert int(row["overlap"]) == 10          # 12 tokens -> 10 shingles, all shared
    assert int(row["containment_bp"]) == 10000
    assert (1, 3) not in pairs                # shares one rare shingle, low containment


def test_heavy_hitters_marker_hygiene(ray_session):
    """The MG error-marker row never leaks into the output, and the global
    err bound is one constant per run (0 in the exact regime)."""
    from rayextract.queries import heavy_hitters_tokens

    out = heavy_hitters_tokens("/root/testdata/sf0.001")
    assert not out["token"].str.contains("\x00").any()
    assert out["err_bound"].nunique() == 1
    assert int(out["err_bound"].iloc[0]) == 0  # vocab << capacity


def test_dense_rank_empty_orders(tmp_path, ray_session):
    from rayextract.queries import top_orders_per_priority_dense

    df = pd.DataFrame(
        {"o_orderkey": pd.array([], dtype="int64"),
         "o_orderpriority": pd.array([], dtype="string"),
         "o_totalprice": pd.array([], dtype="float64")}
    )
    pq.write_table(pa.Table.from_pandas(df), os.path.join(tmp_path, "orders.parquet"))
    out = top_orders_per_priority_dense(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["o_orderpriority", "o_orderkey", "total_cents", "rnk"]


def test_spectral_centroid_pure_tones():
    """A pure sine's spectral centroid lands within one FFT bin of its
    frequency (direct decoder test, no Ray)."""
    import pyarrow as pa

    from rayextract.multimodal import WavDspDecoder, wav_encode

    sr, n = 16000, 1024
    rows = []
    # phase offset keeps crossings off exact-zero samples (a bin-aligned
    # tone's crossings land ON zeros, where strict sign-product zcr
    # correctly counts nothing)
    for mid, f in [(1, 1000.0), (2, 3000.0), (3, 6000.0)]:
        t = np.arange(n) / sr
        s = (20000 * np.sin(2 * np.pi * f * t + 0.3)).astype("<i2")
        rows.append((mid, wav_encode(s.astype(np.int64), sr)))
    tbl = pa.table(
        {"media_id": pa.array([r[0] for r in rows], pa.int64()),
         "payload": pa.array([r[1] for r in rows], pa.binary())}
    )
    out = WavDspDecoder()(tbl).to_pandas().set_index("media_id")
    bin_hz = sr / n
    for mid, f in [(1, 1000.0), (2, 3000.0), (3, 6000.0)]:
        assert abs(out.loc[mid, "centroid_hz"] - f) < 2 * bin_hz
    # zcr of a 1 kHz tone over 1024/16000 s: ~2 crossings per cycle
    assert abs(int(out.loc[1, "zcr"]) - 2 * 1000 * n // sr) <= 4
