"""Text-analysis operators over a document corpus (training-data pipeline ops).

Each is a vectorized ``map_batches`` stage over the ``documents`` table
(doc_id, text, lang, source, n_chars) with an exact DuckDB-SQL oracle
(queries.py). Semantics are deliberately SQL-mirrorable so the driver's
value-hash comparison is bit-exact:

- tokenization: ``\\s+`` split of ``text.strip()`` (DuckDB string_split_regex)
- stopword stats: token membership in a fixed stop list
- lang-id: stopword-ratio heuristic (>= threshold -> 'en')
- fingerprint: md5 hex of the raw text (DuckDB md5)
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd

STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "for", "on", "with")
LANGID_THRESHOLD = 0.05
_PUNCT = re.compile(r"[.,!?;:]")
_WS = re.compile(r"\s+")


def _tokens(s: str) -> list[str]:
    s = s.strip()
    return _WS.split(s) if s else []


def token_stats_batch(df: pd.DataFrame) -> pd.DataFrame:
    """doc_id, n_tokens, n_unique, sum_token_chars (all int64)."""
    toks = df["text"].map(_tokens)
    return pd.DataFrame(
        {
            "doc_id": df["doc_id"],
            "n_tokens": toks.map(len).astype("int64"),
            "n_unique": toks.map(lambda t: len(set(t))).astype("int64"),
            "sum_token_chars": toks.map(lambda t: sum(len(w) for w in t)).astype("int64"),
        }
    )


def quality_batch(df: pd.DataFrame) -> pd.DataFrame:
    """doc_id, n_tokens, stop_cnt, punct_cnt, stop_ratio (double)."""
    toks = df["text"].map(_tokens)
    stop = set(STOPWORDS)
    n_tokens = toks.map(len).astype("int64")
    stop_cnt = toks.map(lambda t: sum(1 for w in t if w in stop)).astype("int64")
    return pd.DataFrame(
        {
            "doc_id": df["doc_id"],
            "n_tokens": n_tokens,
            "stop_cnt": stop_cnt,
            "punct_cnt": df["text"].map(lambda s: len(_PUNCT.findall(s))).astype("int64"),
            "stop_ratio": np.where(
                n_tokens > 0, stop_cnt.astype(float) / n_tokens.astype(float), 0.0
            ),
        }
    )


def langid_batch(df: pd.DataFrame) -> pd.DataFrame:
    """doc_id, lang_pred — stopword-ratio heuristic language id."""
    q = quality_batch(df)
    return pd.DataFrame(
        {
            "doc_id": df["doc_id"],
            "lang_pred": np.where(q["stop_ratio"] >= LANGID_THRESHOLD, "en", "unk"),
        }
    )


def fingerprint_batch(df: pd.DataFrame) -> pd.DataFrame:
    """doc_id, fp = md5 hex of text (content-addressed document id)."""
    return pd.DataFrame(
        {
            "doc_id": df["doc_id"],
            "fp": df["text"].map(lambda s: hashlib.md5(s.encode("utf-8")).hexdigest()),
        }
    )


# ---------------------------------------------------------------------------
# winnowing: rolling-hash k-gram fingerprints (Schleimer et al., SIGMOD'03)
# ---------------------------------------------------------------------------

_B = 257            # rolling base
_M = (1 << 61) - 1  # modulus


def winnow_fingerprints(text: str, k: int = 5, w: int = 4) -> list[int]:
    """Winnowing fingerprint set: Rabin-Karp rolling hash over character
    k-grams, then the minimum hash of each length-w window (rightmost min on
    ties), deduplicated in document order. Guarantees any substring match of
    length >= w+k-1 shares a fingerprint — the classic local document
    fingerprint for plagiarism/near-dup detection."""
    n = len(text)
    if n < k:
        return []
    # rolling k-gram hashes
    h = 0
    pw = pow(_B, k - 1, _M)
    hashes = []
    for i, ch in enumerate(map(ord, text)):
        h = (h * _B + ch) % _M
        if i >= k:
            h = (h - ord(text[i - k]) * _B * pw) % _M
        if i >= k - 1:
            hashes.append(h)
    # window minima, rightmost on ties, record when the choice changes
    out: list[int] = []
    prev_idx = -1
    for start in range(0, len(hashes) - w + 1):
        window = hashes[start : start + w]
        m = min(window)
        idx = start + len(window) - 1 - window[::-1].index(m)
        if idx != prev_idx:
            out.append(m)
            prev_idx = idx
    return out


def winnow_fingerprints_np(text: str, k: int = 5, w: int = 4) -> "np.ndarray":
    """Vectorized winnowing — identical output to ``winnow_fingerprints``
    (equality-tested) with the per-char Python loop replaced by numpy:
    each k-gram hash is the direct power sum Σ ord[i+d]·B^(k-1-d) mod M
    (terms ≤ 5·2^52, exact in int64), window minima via a sliding view with
    rightmost-tie argmin on the reversed axis."""
    import numpy as np

    n = len(text)
    if n < k:
        return np.empty(0, dtype=np.int64)
    o = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    # int64 safety: term = ord * (B^d mod M) can reach 2^21 * 2^61 for large
    # k — silent wraparound would break the scalar-equality contract, so fall
    # back to the exact scalar path outside the proven envelope
    max_coeff = max(pow(_B, k - 1 - d, _M) for d in range(k))
    if int(o.max(initial=0)) * max_coeff * k >= (1 << 62):
        return np.asarray(winnow_fingerprints(text, k, w), dtype=np.int64)
    h = np.zeros(n - k + 1, dtype=np.int64)
    for d in range(k):
        h += o[d : d + n - k + 1] * pow(_B, k - 1 - d, _M)
        h %= _M
    if len(h) < w:
        return np.empty(0, dtype=np.int64)
    win = np.lib.stride_tricks.sliding_window_view(h, w)
    # rightmost argmin: first min of the reversed window
    idx = (w - 1 - np.argmin(win[:, ::-1], axis=1)) + np.arange(len(win))
    keep = np.r_[True, idx[1:] != idx[:-1]]
    return h[idx[keep]]


def winnow_batch(df: pd.DataFrame, k: int = 5, w: int = 4) -> pd.DataFrame:
    """doc_id, n_fingerprints, fingerprints (list<int64>, capped at 64)."""
    fps = df["text"].map(lambda s: winnow_fingerprints_np(s, k, w))
    return pd.DataFrame(
        {
            "doc_id": df["doc_id"],
            "n_fingerprints": fps.map(len).astype("int64"),
            "fingerprints": fps.map(lambda f: [int(x) & 0x7FFFFFFFFFFFFFFF for x in f[:64]]),
        }
    )
