"""Property tests for the round-2d operators against independent
pure-Python references on randomized corpora (seeded): paragraph dedup's
first-occurrence/keep semantics, pack_sequences' exclusive-scan formula,
the funnel state machine vs a brute-force subsequence check, and weighted
sampling vs an exhaustive priority sort. DuckDB never appears here — these
guard against the Ray path and the SQL oracle sharing a common bug."""

import hashlib
import os

import numpy as np
import pandas as pd
import pytest

from rayextract.queries import QUERIES, PACK_BUDGET


def _write_docs(d, rng, n=40, vocab=6):
    # tiny vocabulary + short docs -> plenty of exact 8-token block dups
    texts = [
        " ".join(rng.choice([f"w{i}" for i in range(vocab)],
                            size=rng.integers(0, 30)).tolist())
        for _ in range(n)
    ]
    df = pd.DataFrame(
        {"doc_id": np.arange(n, dtype="int64"), "text": texts,
         "lang": "en", "source": "s0",
         "n_chars": [len(t) for t in texts]}
    )
    df.to_parquet(os.path.join(d, "documents.parquet"), index=False)
    return df


def _blocks(text, p=8):
    toks = text.split()
    return [" ".join(toks[i:i + p]) for i in range(0, len(toks), p)]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_paragraph_dedup_reference(tmp_path, ray_session, seed):
    d = tmp_path / f"pd{seed}"
    d.mkdir()
    docs = _write_docs(str(d), np.random.default_rng(seed))

    # pure-Python reference: global first occurrence by (doc_id, blk)
    occ = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        for b, bt in enumerate(_blocks(text)):
            occ.setdefault(bt, []).append((int(doc_id), b))
    expect = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        bl = _blocks(text)
        if not bl:
            continue
        kept = [bt for b, bt in enumerate(bl)
                if len(occ[bt]) == 1 or occ[bt][0] == (int(doc_id), b)]
        expect[int(doc_id)] = (" ".join(kept), len(bl), len(kept))

    got = QUERIES["dedup_paragraphs"](str(d)).to_pandas()
    assert len(got) == len(expect)
    for r in got.itertuples(index=False):
        e = expect[int(r.doc_id)]
        assert (r.clean_text, r.n_blocks, r.n_kept) == (e[0], e[1], e[2])


@pytest.mark.parametrize("seed", [3, 4])
def test_pack_sequences_exclusive_scan(tmp_path, ray_session, seed):
    d = tmp_path / f"ps{seed}"
    d.mkdir()
    docs = _write_docs(str(d), np.random.default_rng(seed), n=60)
    got = QUERIES["pack_sequences"](str(d)).to_pandas().sort_values("doc_id")
    ntok = docs["text"].str.split().str.len().to_numpy(dtype="int64")
    excl = np.concatenate([[0], np.cumsum(ntok)[:-1]])
    assert (got["n_tokens"].to_numpy() == ntok).all()
    assert (got["bin_id"].to_numpy() == excl // PACK_BUDGET).all()
    assert (np.diff(got["bin_id"].to_numpy()) >= 0).all()  # monotone in key order


def _write_events(d, rng, n=300, users=12):
    ts = pd.Timestamp("2026-01-01") + pd.to_timedelta(
        rng.integers(0, 4 * 3600, size=n), unit="s"
    )
    df = pd.DataFrame(
        {"event_id": np.arange(n, dtype="int64"),
         "ts": ts.astype("datetime64[us]"),
         "user_id": rng.integers(0, users, size=n).astype("int64"),
         "event_type": rng.choice(
             ["view", "click", "purchase", "signup", "error"], size=n),
         "value": np.ones(n), "props": "{}"}
    )
    df.to_parquet(os.path.join(d, "events.parquet"), index=False)
    return df


@pytest.mark.parametrize("seed", [5, 6])
def test_funnel_reference(tmp_path, ray_session, seed):
    d = tmp_path / f"fn{seed}"
    d.mkdir()
    ev = _write_events(str(d), np.random.default_rng(seed))

    tot = conv = 0
    for _, g in ev.sort_values(["ts", "event_id"]).groupby("user_id"):
        sessions, cur, prev = [], [], None
        for r in g.itertuples(index=False):
            if prev is not None and (r.ts - prev).total_seconds() > 1800:
                sessions.append(cur)
                cur = []
            cur.append(r.event_type)
            prev = r.ts
        sessions.append(cur)
        for s in sessions:
            tot += 1
            want = ["view", "click", "purchase"]
            i = 0
            for e in s:
                if i < 3 and e == want[i]:
                    i += 1
            conv += i == 3
    got = QUERIES["funnel_view_click_purchase"](str(d))
    assert int(got["n_sessions"].iloc[0]) == tot
    assert int(got["n_converted"].iloc[0]) == conv


def test_weighted_sample_is_global_topk(tmp_path, ray_session):
    d = tmp_path / "ws"
    d.mkdir()
    docs = _write_docs(str(d), np.random.default_rng(9), n=200)
    pri = np.array(
        [int.from_bytes(hashlib.md5(str(i).encode()).digest()[:8], "little")
         % (1 << 62) // (nc + 1)
         for i, nc in zip(docs["doc_id"], docs["n_chars"])],
        dtype="int64",
    )
    order = np.lexsort((docs["doc_id"].to_numpy(), pri))
    expect = docs["doc_id"].to_numpy()[order][:64]
    got = QUERIES["weighted_sample_docs"](str(d))
    assert (got["doc_id"].to_numpy() == expect).all()
