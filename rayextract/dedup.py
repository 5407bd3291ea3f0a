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

from .relational import join_partitions
from .textstats import _tokens

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup_groups(docs: "ray.data.Dataset", n_buckets: int = 64) -> "ray.data.Dataset":
    """(text_hash, doc_id=min, n_copies) one row per distinct content.

    Content hash per row inside map_batches, then a bucketed group-reduce
    (bucketed.py) carrying only (hash, doc_id, count) partials — full text
    never enters the shuffle, and cost is per-bucket, not per-distinct-doc.
    """
    from .bucketed import bucketed_group_reduce

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = df["text"].map(lambda s: hashlib.md5(s.encode("utf-8")).hexdigest())
        t = pd.DataFrame({"text_hash": h, "doc_id": df["doc_id"]})
        return (
            t.groupby("text_hash", sort=False)
            .agg(doc_id=("doc_id", "min"), n_copies=("doc_id", "count"))
            .reset_index()
        )

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.groupby("text_hash", sort=False)
            .agg(doc_id=("doc_id", "min"), n_copies=("n_copies", "sum"))
            .reset_index()
        )

    return bucketed_group_reduce(docs, ["text_hash"], partial, reduce, n_buckets)


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
_SENTINEL = np.uint64((1 << 31) - 1)  # real signature values are < P31


class MinHasher:
    """Stateful minhash stage: permutation parameters built once per actor."""

    # Carter-Wegman universal hash over GF(2^31-1). The modulus must be close
    # to the input range: a*h then wraps ~2^31 times, fully scrambling value
    # ORDER. (With p=2^61-1 and 32-bit inputs, a*h+b < 4p wraps at most 3
    # times, so hash order nearly equals input order — every permutation's
    # minimum lands on the same globally-smallest shared shingle and unrelated
    # docs collide at est_sim~0.9; observed at sf0.1 before this fix.)
    P31 = (1 << 31) - 1

    def __init__(self, num_perm: int = 128, ngram: int = 3, seed: int = 7):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, self.P31, size=num_perm, dtype=np.uint64)
        self.b = rng.randint(0, self.P31, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.ngram = ngram

    def signature(self, text: str) -> np.ndarray:
        shingles = _token_set(text, self.ngram)
        if not shingles:
            return np.full(self.num_perm, _SENTINEL, dtype=np.uint64)
        hv = np.array(
            [
                int.from_bytes(hashlib.md5(s.encode()).digest()[:4], "little")
                & 0x7FFFFFFF
                for s in shingles
            ],
            dtype=np.uint64,
        )
        # (a*h + b) mod p: a,h < 2^31 so a*h+b < 2^62 — exact in uint64
        prod = (self.a[:, None] * hv[None, :] + self.b[:, None]) % np.uint64(self.P31)
        return prod.min(axis=1)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        # signatures as packed little-endian uint64 bytes: binary columns
        # survive Arrow hash joins (list columns don't). Docs with NO
        # shingles (< ngram tokens) are excluded: they would all share the
        # sentinel signature and pair up pairwise at est_sim=1.0 (observed:
        # most of the reported pairs at sf0.1 were such phantom matches).
        sigs = [self.signature(s) for s in df["text"]]
        keep = np.array([s[0] != _SENTINEL for s in sigs], dtype=bool)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy()[keep],
                "sig": [s.tobytes() for s, k in zip(sigs, keep) if k],
            }
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

    Fully vectorized scale shape (no per-group Python UDFs):
    signature actor stage -> numpy band explosion (band_id, band_hash, doc_id)
    -> hash-partitioned SELF-JOIN on the band key -> a<b filter -> distinct
    pairs via vectorized Count aggregate -> two hash joins back to the
    signatures -> batch-level est-sim verification.
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
        if not len(df):
            return pd.DataFrame(
                {"band_id": pd.Series(dtype="int64"),
                 "band_hash": pd.Series(dtype="int64"),
                 "doc_id": pd.Series(dtype="int64")}
            )
        sig_mat = np.vstack([np.frombuffer(s, dtype=np.uint64) for s in df["sig"]])
        n = len(df)
        # band hash: sum of rows x fixed multipliers, wrapped mod 2^64 (fast,
        # deterministic, collision-safe enough for bucketing)
        mult = (np.arange(rows_per_band, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                + np.uint64(1))
        bh = np.empty((n, bands), dtype=np.uint64)
        for b in range(bands):
            chunk = sig_mat[:, b * rows_per_band : (b + 1) * rows_per_band]
            bh[:, b] = (chunk * mult[None, :]).sum(axis=1)
        return pd.DataFrame(
            {
                "band_id": np.repeat(np.arange(bands, dtype=np.int64), n),
                "band_hash": (bh.T.reshape(-1) >> np.uint64(1)).astype("int64"),
                "doc_id": np.tile(df["doc_id"].to_numpy(), bands).astype("int64"),
            }
        )

    # the signature table is consumed by 4 downstream operators (self-join
    # sides + two verify joins); materialize it once or the expensive MinHasher
    # stage re-executes per consumer. Signatures are tiny relative to the
    # corpus (num_perm*8 bytes/doc) — at cluster scale this would be a
    # checkpointed parquet intermediate instead.
    sigs = sigs.materialize()
    band_rows = sigs.map_batches(explode_bands, batch_format="pandas").materialize()
    cand = band_rows.join(
        band_rows, join_type="inner", num_partitions=join_partitions(),
        on=("band_id", "band_hash"), right_suffix="_r",
    )

    def upper_tri(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["doc_id"] < df["doc_id_r"]]
        # pack the pair into one int64 key: multi-key groupby shuffles were
        # ~4x slower than single-key at equal row counts
        pair = pack_pairs(
            df["doc_id"].to_numpy(np.int64), df["doc_id_r"].to_numpy(np.int64),
            "minhash",
        )
        out = pd.DataFrame({"pair": pair})
        return out.drop_duplicates("pair")  # batch-local pre-dedup

    from .bucketed import bucketed_group_reduce

    def unpack(df: pd.DataFrame) -> pd.DataFrame:
        p = df["pair"].to_numpy(np.int64)
        return pd.DataFrame(
            {"doc_a": (p >> np.int64(32)).astype("int64"),
             "doc_b": (p & np.int64(0xFFFFFFFF)).astype("int64")}
        )

    distinct = bucketed_group_reduce(
        cand, ["pair"],
        upper_tri,
        lambda g: unpack(g.drop_duplicates("pair")),
        n_buckets=32,
    )

    # verify: join the signatures back on both sides, then vectorized est-sim
    pa_join = distinct.join(
        sigs, join_type="inner", num_partitions=join_partitions(), on=("doc_a",), right_on=("doc_id",)
    )
    pb_join = pa_join.join(
        sigs, join_type="inner", num_partitions=join_partitions(),
        on=("doc_b",), right_on=("doc_id",), left_suffix="_a", right_suffix="_b",
    )

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(columns=["doc_a", "doc_b", "est_sim"]).astype(
                {"doc_a": "int64", "doc_b": "int64", "est_sim": "float64"}
            )
        sa = np.vstack([np.frombuffer(s, dtype=np.uint64) for s in df["sig_a"]])
        sb = np.vstack([np.frombuffer(s, dtype=np.uint64) for s in df["sig_b"]])
        est = (sa == sb).mean(axis=1)
        out = pd.DataFrame(
            {"doc_a": df["doc_a"].astype("int64"), "doc_b": df["doc_b"].astype("int64"),
             "est_sim": est.astype("float64")}
        )
        return out[out["est_sim"] >= threshold]

    return pb_join.map_batches(verify, batch_format="pandas")


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


_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 array (numpy<2 has no bitwise_count)."""
    return (
        _POP8[x.view(np.uint8)].reshape(*x.shape, 8).sum(axis=-1).astype("int64")
    )


def pack_pairs(a: np.ndarray, b: np.ndarray, what: str) -> np.ndarray:
    """(a, b) -> single int64 key (a<<32 | b). Both ids must fit 31 bits —
    fail loudly instead of silently colliding pairs."""
    a = a.astype(np.int64)
    b = b.astype(np.int64)
    if len(a) and (
        max(a.max(), b.max()) >= (1 << 31) or min(a.min(), b.min()) < 0
    ):
        raise ValueError(
            f"{what} pair packing requires doc ids in [0, 2^31); "
            "re-key the corpus or switch to the two-column pair key"
        )
    return (a << np.int64(32)) | b


def simhash_neardup_pairs(
    docs: "ray.data.Dataset", max_hamming: int = 3
) -> "ray.data.Dataset":
    """(doc_a, doc_b, hamming) via 4x16-bit band blocking: any pair with
    Hamming distance <= 3 shares at least one exact 16-bit band.

    Scale shape (no per-group Python UDFs): fingerprints -> band explosion ->
    hash-BUCKETED reduce over (band_id, band_val) (the ~256k distinct band
    buckets land in B coarse buckets; per-group cost is a numpy outer-XOR
    popcount inside a plain loop, not a Ray map_groups dispatch) -> packed
    (a<<32|b) pair keys -> second bucketed reduce for the cross-band dedup."""
    from .bucketed import bucketed_group_reduce

    sh = docs.map_batches(simhash_batch, batch_format="pandas")

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        h = df["simhash"].to_numpy(dtype=np.uint64)
        n = len(df)
        return pd.DataFrame(
            {
                "band_id": np.repeat(np.arange(4, dtype=np.int64), n),
                "band_val": np.concatenate(
                    [((h >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype("int64")
                     for b in range(4)]
                ),
                "doc_id": np.tile(df["doc_id"].to_numpy(), 4),
                "simhash": np.tile(h, 4),
            }
        )

    def band_pairs(g: pd.DataFrame) -> pd.DataFrame:
        """All <=max_hamming pairs within each (band_id, band_val) group of
        one coarse bucket. Outer XOR + table popcount per group (groups are
        band buckets — small by construction; a pathologically hot band value
        would need salting, same caveat as any blocking key)."""
        g = g.sort_values(["band_id", "band_val", "doc_id"]).drop_duplicates(
            ["band_id", "band_val", "doc_id"]
        )
        pair_keys: list[np.ndarray] = []
        hams: list[np.ndarray] = []
        for _, gg in g.groupby(["band_id", "band_val"], sort=False):
            m = len(gg)
            if m < 2:
                continue
            ids = gg["doc_id"].to_numpy(np.int64)
            hs = gg["simhash"].to_numpy(np.uint64)
            d = _popcount64(hs[:, None] ^ hs[None, :])
            iu, ju = np.triu_indices(m, 1)
            keep = d[iu, ju] <= max_hamming
            if not keep.any():
                continue
            ia, jb = iu[keep], ju[keep]
            pair_keys.append(pack_pairs(ids[ia], ids[jb], "simhash"))
            hams.append(d[ia, jb])
        if not pair_keys:
            return pd.DataFrame(
                {"pair": pd.Series(dtype="int64"), "hamming": pd.Series(dtype="int64")}
            )
        return pd.DataFrame(
            {"pair": np.concatenate(pair_keys), "hamming": np.concatenate(hams)}
        ).drop_duplicates("pair")

    band_rows = sh.map_batches(explode, batch_format="pandas")
    pairs = bucketed_group_reduce(
        band_rows, ["band_id", "band_val"],
        lambda df: df,  # band rows are already minimal (id, hash per band)
        band_pairs,
        n_buckets=64,
    )

    def unpack(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("pair")
        p = g["pair"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "doc_a": (p >> np.int64(32)).astype("int64"),
                "doc_b": (p & np.int64(0xFFFFFFFF)).astype("int64"),
                "hamming": g["hamming"].astype("int64"),
            }
        )

    return bucketed_group_reduce(
        pairs, ["pair"],
        lambda df: df.drop_duplicates("pair"),
        unpack,
        n_buckets=32,
    )
