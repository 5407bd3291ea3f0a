"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale shapes (the 100 TB design, exercised at test scale):

- **exact**: content-hash per row inside ``map_batches`` (cheap, vectorized),
  then ONE ``groupby(hash)`` over (hash, doc_id) pairs only — never ship full
  text through the shuffle; keeper = min doc_id per group.
- **n-gram Jaccard**: exact pairwise similarity *within a blocking key*
  (here ``source``) via ``groupby(key).map_groups`` — quadratic inside a
  block, linear across blocks. The blocking key is the documented
  partitioning assumption.
- **MinHash+LSH**: per-batch shingle->minhash signatures (numpy, vectorized
  over the permutation axis), explode to (band_id, band_hash, doc_id) rows,
  ``groupby(band)`` -> candidate pairs, verify exact Jaccard. Signatures are
  mergeable; the only shuffle carries tiny band rows.
- **SimHash**: 64-bit fingerprint per doc from token hashes; near-dup =
  Hamming distance <= k, blocked by 16-bit bands (4 bands -> any pair within
  distance 3 shares a band).
"""

from __future__ import annotations

import hashlib
from itertools import combinations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from .textstats import _tokens

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup_groups(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """(text_hash, doc_id=min, n_copies) one row per distinct content."""

    def hash_batch(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "text_hash": df["text"].map(
                    lambda s: hashlib.md5(s.encode("utf-8")).hexdigest()
                ),
                "doc_id": df["doc_id"],
            }
        )

    hashed = docs.map_batches(hash_batch, batch_format="pandas")
    from ray.data.aggregate import Count, Min

    return hashed.groupby("text_hash").aggregate(
        Min("doc_id", alias_name="doc_id"), Count(alias_name="n_copies")
    )


# ---------------------------------------------------------------------------
# n-gram (token-shingle) Jaccard
# ---------------------------------------------------------------------------

def _token_set(s: str, ngram: int) -> frozenset:
    toks = _tokens(s)
    if ngram <= 1:
        return frozenset(toks)
    return frozenset(
        " ".join(toks[i : i + ngram]) for i in range(max(0, len(toks) - ngram + 1))
    )


def jaccard(a: frozenset, b: frozenset) -> float:
    if not a and not b:
        return 0.0
    return len(a & b) / len(a | b)


def ngram_jaccard_pairs(
    docs: "ray.data.Dataset", threshold: float, block_key: str = "source", ngram: int = 1
) -> "ray.data.Dataset":
    """(doc_a, doc_b, sim) for pairs within a block with Jaccard >= threshold.

    PARTITIONING ASSUMPTION: only pairs sharing ``block_key`` are compared
    (quadratic inside a block). For unblocked near-dup use minhash_lsh_pairs.
    """

    def pairs_in_block(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        ids = g["doc_id"].tolist()
        sets = [_token_set(s, ngram) for s in g["text"]]
        rows = []
        for i, j in combinations(range(len(ids)), 2):
            sim = jaccard(sets[i], sets[j])
            if sim >= threshold:
                rows.append((ids[i], ids[j], sim))
        return pd.DataFrame(rows, columns=["doc_a", "doc_b", "sim"]).astype(
            {"doc_a": "int64", "doc_b": "int64", "sim": "float64"}
        )

    return docs.groupby(block_key).map_groups(pairs_in_block, batch_format="pandas")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


class MinHasher:
    """Stateful minhash stage: permutation parameters built once per actor."""

    def __init__(self, num_perm: int = 128, ngram: int = 3, seed: int = 7):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.ngram = ngram

    def signature(self, text: str) -> np.ndarray:
        shingles = _token_set(text, self.ngram)
        if not shingles:
            return np.full(self.num_perm, _MERSENNE, dtype=np.uint64)
        hv = np.array(
            [
                int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")
                for s in shingles
            ],
            dtype=np.uint64,
        )
        # (a*h + b) mod p, vectorized over perms x shingles
        prod = (self.a[:, None] * hv[None, :] + self.b[:, None]) % _MERSENNE
        return prod.min(axis=1)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        sigs = [self.signature(s) for s in df["text"]]
        return pd.DataFrame(
            {"doc_id": df["doc_id"], "sig": [s.tolist() for s in sigs]}
        )


def minhash_lsh_pairs(
    docs: "ray.data.Dataset",
    threshold: float = 0.8,
    num_perm: int = 128,
    bands: int = 32,
    ngram: int = 3,
    concurrency: tuple[int, int] = (1, 4),
) -> "ray.data.Dataset":
    """Near-dup pairs via MinHash LSH, verified with signature-estimated
    Jaccard >= threshold. Returns (doc_a, doc_b, est_sim).

    Pipeline: signature actor stage -> explode band rows -> groupby band ->
    candidate pairs -> dedup pairs -> estimate sim from signatures.
    """
    rows_per_band = num_perm // bands

    sigs = docs.map_batches(
        MinHasher,
        fn_constructor_kwargs={"num_perm": num_perm, "ngram": ngram},
        batch_format="pandas",
        concurrency=concurrency,
        num_cpus=1,
    )

    def explode_bands(df: pd.DataFrame) -> pd.DataFrame:
        out = {"band_id": [], "band_hash": [], "doc_id": [], "sig": []}
        for _, r in df.iterrows():
            sig = r["sig"]
            for b in range(bands):
                chunk = tuple(sig[b * rows_per_band : (b + 1) * rows_per_band])
                out["band_id"].append(b)
                out["band_hash"].append(hash(chunk) & 0x7FFFFFFFFFFFFFFF)
                out["doc_id"].append(r["doc_id"])
                out["sig"].append(sig)
        return pd.DataFrame(out)

    band_rows = sigs.map_batches(explode_bands, batch_format="pandas")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame(columns=["doc_a", "doc_b", "est_sim"]).astype(
                {"doc_a": "int64", "doc_b": "int64", "est_sim": "float64"}
            )
        g = g.sort_values("doc_id").drop_duplicates("doc_id")
        ids = g["doc_id"].tolist()
        sigs_ = [np.asarray(s, dtype=np.uint64) for s in g["sig"]]
        rows = []
        for i, j in combinations(range(len(ids)), 2):
            est = float((sigs_[i] == sigs_[j]).mean())
            if est >= threshold:
                rows.append((ids[i], ids[j], est))
        return pd.DataFrame(rows, columns=["doc_a", "doc_b", "est_sim"]).astype(
            {"doc_a": "int64", "doc_b": "int64", "est_sim": "float64"}
        )

    pairs = band_rows.groupby(["band_id", "band_hash"]).map_groups(
        bucket_pairs, batch_format="pandas"
    )

    # a pair can surface from several bands — keep one row per pair
    def first_of_pair(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    return pairs.groupby(["doc_a", "doc_b"]).map_groups(
        first_of_pair, batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens (md5 token hashes)."""
    toks = _tokens(text)
    if not toks:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    one = np.uint64(1)
    for t in toks:
        h = np.uint64(int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "little"))
        bits = (h >> np.arange(64, dtype=np.uint64)) & one
        acc += np.where(bits.astype(bool), 1, -1)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def simhash_batch(df: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "doc_id": df["doc_id"],
            "simhash": df["text"].map(simhash64).astype("uint64"),
        }
    )


def simhash_neardup_pairs(
    docs: "ray.data.Dataset", max_hamming: int = 3
) -> "ray.data.Dataset":
    """(doc_a, doc_b, hamming) via 4x16-bit band blocking: any pair with
    Hamming distance <= 3 shares at least one exact 16-bit band."""
    sh = docs.map_batches(simhash_batch, batch_format="pandas")

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        out = {"band_id": [], "band_val": [], "doc_id": [], "simhash": []}
        for _, r in df.iterrows():
            h = int(r["simhash"])
            for b in range(4):
                out["band_id"].append(b)
                out["band_val"].append((h >> (16 * b)) & 0xFFFF)
                out["doc_id"].append(r["doc_id"])
                out["simhash"].append(h)
        return pd.DataFrame(out)

    def bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id").drop_duplicates("doc_id")
        rows = []
        ids = g["doc_id"].tolist()
        hs = g["simhash"].tolist()
        for i, j in combinations(range(len(ids)), 2):
            d = bin(int(hs[i]) ^ int(hs[j])).count("1")
            if d <= max_hamming:
                rows.append((ids[i], ids[j], d))
        return pd.DataFrame(rows, columns=["doc_a", "doc_b", "hamming"]).astype(
            {"doc_a": "int64", "doc_b": "int64", "hamming": "int64"}
        )

    pairs = sh.map_batches(explode, batch_format="pandas").groupby(
        ["band_id", "band_val"]
    ).map_groups(bucket, batch_format="pandas")
    return pairs.groupby(["doc_a", "doc_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )
