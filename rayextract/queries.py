"""Driver-contract query registry: Ray pipelines + DuckDB oracle SQL.

One entry per implemented operator/pipeline from SURVEY.md §2 plus the
training-data-scale operators (dedup, similarity, text stats). Each Ray
callable takes ``sf_dir`` and returns a Dataset / DataFrame / Arrow table;
``SQL[name]`` is the ANSI-SQL equivalent DuckDB runs on the same parquet
(None -> non-SQL-expressible, driver does a rows-only check).

Determinism rules for the driver's value-hash comparison:
- money/quantity aggregates convert each ROW to integer cents/e4 units and
  sum ints (order-free) — bit-stable under any batch/block split on both
  engines; DuckDB int sums are cast back to BIGINT (sum(BIGINT)=HUGEINT
  surfaces as float in pandas);
- ratios are single divisions of identical ints -> identical doubles;
- every computed column has the same name in Ray and SQL.

Ray is assumed initialised by the caller (driver/tests); nothing here calls
ray.init().
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

import ray.data as rd

from .dates import DATE_PATTERN, recognize_date
from .dedup import (
    blocked_lsh_jaccard_pairs,
    exact_dedup_groups,
    minhash_lsh_pairs,
    simhash_batch,
)
from .extractors import fire_gross_amount, fire_invoice_date, fire_invoice_number, fire_purchase_order
from .relational import broadcast_join, broadcast_semi_join, pre_aggregate, topk, join_partitions
from .similarity import embedding_neardup_pairs, knn_bruteforce, knn_ivf
from .textnorm import keyword_mask, remove_special_array, upper_invariant_array
from .textstats import fingerprint_batch, langid_batch, quality_batch, token_stats_batch

# F1's char class (FilterData.cs:14) in RE2 form for the DuckDB oracle
F1_CLASS = r"[^\w\s(#\-@&$:/.,|)]"
GATE_KEYS = ("SPARK", "WINDOW")
JACCARD_THRESHOLD = 0.9
NEARDUP_COS = 0.4


def _read(sf_dir: str, table: str, columns=None):
    # metadata-stripped read: the driver's pandas-written parquet embeds a
    # b'pandas' schema blob that makes pa.Schema unhashable and spams
    # "Failed to hash the schemas" from every worker (see pqio.py)
    from .pqio import read_parquet_clean

    return read_parquet_clean(
        os.path.join(sf_dir, f"{table}.parquet"), columns=columns
    )


def _fan_out(ds, per_cpu: int = 2):
    """Split a FEW-FILE read into enough blocks that a heavy per-row map
    stage (codec decode, model inference) can occupy the whole pool.

    Ray Data map tasks are per-block: a single-row-group parquet file reads
    as ONE block, so every fused map downstream runs as one serial task no
    matter the batch_size/concurrency (measured: image_ocr_extract flat at
    3.7s across every pool shape until the input was split). At fleet scale
    inputs arrive as thousands of row-group blocks and this is a guarded
    no-op — the repartition only fires when the file count is below the
    target, i.e. exactly the small-input case where the exchange is a few
    MB."""
    import ray

    target = int(ray.cluster_resources().get("CPU", 8)) * per_cpu
    try:
        if len(ds.input_files()) >= target:
            return ds
    except Exception:
        return ds

    def _strip_meta(t):
        # pandas-written parquet carries dict schema metadata that Ray's
        # shuffle reduce can't hash (disables schema dedup and logs a
        # warning per reduce task); the exchange only needs the bare schema
        return t.replace_schema_metadata(None)

    return ds.map_batches(_strip_meta, batch_format="pyarrow").repartition(target)


def _cluster_cfg():
    """ExtractConfig with the parse actor pool sized from the live cluster
    (the bench.py shape, ``max(2, cpus - 2)``) instead of the dataclass
    default of 4 — the driver invokes these queries at 32 cpus and a fixed
    4-actor pool runs ~8x under available parallelism (VERDICT r2 #2)."""
    from .config import ExtractConfig, parse_pool_size

    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:  # pragma: no cover - ray not initialised
        cpus = 4
    return ExtractConfig(batch_size=8192, tagger_concurrency=parse_pool_size(cpus))


def _read_small(sf_dir: str, table: str, columns=None, filters=None) -> pd.DataFrame:
    """Driver-side read of a SMALL side (dimension tables, tiny keyed
    subsets). Always pass ``filters`` when only a slice is needed — the
    predicate pushes into the parquet row-group scan, so the full table
    never reaches the driver."""
    return pq.read_table(
        os.path.join(sf_dir, f"{table}.parquet"), columns=columns, filters=filters
    ).to_pandas()


def _round_half_away(v) -> np.ndarray:
    """DuckDB round(): half AWAY from zero, elementwise (np.rint is
    half-to-even and disagrees at exact .5, e.g. 0.125*100)."""
    v = np.asarray(v, dtype=np.float64)
    return np.where(v >= 0, np.floor(v + 0.5), np.ceil(v - 0.5)).astype("int64")


def _cents(x) -> np.ndarray:
    """Integer cents with DuckDB round() semantics."""
    return _round_half_away(np.asarray(x, dtype=np.float64) * 100)


# ---------------------------------------------------------------------------
# F-operators (scalar functions) over driver tables
# ---------------------------------------------------------------------------

def f1_remove_special(sf_dir: str):
    import pyarrow as pa

    def fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": t["doc_id"], "clean_text": remove_special_array(t["text"])}
        )

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow"
    )


def f2_upper_invariant(sf_dir: str):
    import pyarrow as pa

    def fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": t["doc_id"], "upper_text": upper_invariant_array(t["text"])}
        )

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow"
    )


def f3_keyword_gate(sf_dir: str):
    import pyarrow as pa

    def fn(t: pa.Table) -> pa.Table:
        up = upper_invariant_array(t["text"])
        mask = keyword_mask(up, GATE_KEYS)
        return pa.table({"doc_id": t["doc_id"], "n_chars": t["n_chars"]}).filter(mask)

    return _read(sf_dir, "documents", ["doc_id", "text", "n_chars"]).map_batches(
        fn, batch_format="pyarrow"
    )


def f4_first_date(sf_dir: str):
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        line = "logged " + df["ts"].dt.strftime("%m/%d/%Y") + " event"
        return pd.DataFrame(
            {"event_id": df["event_id"], "first_date": line.map(recognize_date)}
        )

    return _read(sf_dir, "events", ["event_id", "ts"]).map_batches(
        fn, batch_format="pandas"
    )


F10_SLICE = 500  # doc_ids 0..499 exist at every sf — the sf-stable slice


def f10_encrypt_pii(sf_dir: str):
    """F10 — AES-256-CBC PII encryption (CryptLib.cs parity) under the full
    driver value-hash gate: encrypt the canonical PII string
    'PATIENT-{doc_id:05d}' for the sf-stable doc_id < 500 slice. Fixed IV +
    fixed key derivation make ciphertexts deterministic, so the oracle is a
    pinned VALUES table of the 500 expected base64 ciphertexts computed by
    the same library at import (the dedup_minhash constant-export trick —
    VERDICT r2 #4). Document-TEXT encryption (sf-dependent payloads, not
    SQL-pinnable) keeps its round-trip/fixed-vector coverage in
    tests/test_crypt.py and encrypt_columns_batch."""
    from .crypt import encrypt

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["doc_id"] < F10_SLICE]
        pii = df["doc_id"].map(lambda d: f"PATIENT-{d:05d}")
        return pd.DataFrame({"doc_id": df["doc_id"], "cipher": pii.map(encrypt)})

    return _read(sf_dir, "documents", ["doc_id"]).map_batches(
        fn, batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# E-operators (field extractors) over constructed lines from events
# ---------------------------------------------------------------------------

def e3_e6_invoice_line(sf_dir: str):
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        line = (
            "INVOICE # "
            + df["event_id"].astype(str)
            + " TOTAL $"
            + df["value"].map(lambda v: f"{v:.2f}")
        )
        inv = line.map(lambda s: (fire_invoice_number(s) or (None,))[0])
        gross = line.map(lambda s: (fire_gross_amount(s) or (None,))[0])
        return pd.DataFrame(
            {"event_id": df["event_id"], "invoice_number": inv, "gross_total": gross}
        )

    return _read(sf_dir, "events", ["event_id", "value"]).map_batches(
        fn, batch_format="pandas"
    )


def e4_invoice_date(sf_dir: str):
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        date = df["ts"].dt.strftime("%m/%d/%Y")
        line = np.where(
            df["event_type"] == "error", "DUE DATE " + date, "INVOICE DATE " + date
        )
        out = [
            (fire_invoice_date(s) or (None,))[0] for s in line
        ]
        return pd.DataFrame({"event_id": df["event_id"], "invoice_date": out})

    return _read(sf_dir, "events", ["event_id", "ts", "event_type"]).map_batches(
        fn, batch_format="pandas"
    )


def e5_order_ref(sf_dir: str):
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        line = "REFERENCE AB" + df["event_id"].astype(str) + "X"
        out = line.map(lambda s: (fire_purchase_order(s) or (None,))[0])
        return pd.DataFrame({"event_id": df["event_id"], "order_number": out})

    return _read(sf_dir, "events", ["event_id"]).map_batches(fn, batch_format="pandas")


# ---------------------------------------------------------------------------
# E9/A1 analogs + windowed aggregates over events
# ---------------------------------------------------------------------------

def e9_first_match_fold(sf_dir: str):
    """First purchase per user by (ts, event_id) — the ordered fold.

    Same bucketed-combiner shape as the flagship fold (fold.py): per-batch
    winner per user (head-1 after a stable sort), then ONE hash-bucket
    shuffle and a vectorized per-bucket merge — no per-user Python groups
    (the round-1 twin paid ~1 ms/user in ``groupby(user_id).map_groups``)."""
    from .bucketed import bucketed_group_reduce

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        p = df[df["event_type"] == "purchase"]
        if not len(p):
            return pd.DataFrame(
                columns=["user_id", "event_id", "ts", "value"]
            ).astype({"user_id": "int64", "event_id": "int64", "value": "float64"})
        return p.sort_values(["ts", "event_id"], kind="stable").groupby(
            "user_id", sort=False
        ).head(1)[["user_id", "event_id", "ts", "value"]]

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        w = g.sort_values(["ts", "event_id"], kind="stable").groupby(
            "user_id", sort=False
        ).head(1)
        return pd.DataFrame(
            {
                "user_id": w["user_id"].astype("int64"),
                "first_event_id": w["event_id"].astype("int64"),
                "first_value_cents": _cents(w["value"]),
            }
        )

    src = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type", "value"])
    return bucketed_group_reduce(src, ["user_id"], partial, reduce, n_buckets=64)


def a1_user_stats(sf_dir: str):
    """Per-user count + exact-cents sum (A1 grouped-mean analog).

    Rows convert to integer cents BEFORE summing (both engines): int sums are
    order-free, so the result is bit-stable under any batch/block split —
    float sums rounded afterwards can flip the last digit when summation
    order changes with cluster size.
    """

    def to_cents(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"user_id": df["user_id"], "value_cents": _cents(df["value"])}
        )

    src = _read(sf_dir, "events", ["user_id", "value"]).map_batches(
        to_cents, batch_format="pandas"
    )
    agg = pre_aggregate(src, ["user_id"], sums=["value_cents"])

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": df["user_id"].astype("int64"),
                "n_events": df["n"].astype("int64"),
                "sum_value_cents": df["sum_value_cents"].astype("int64"),
            }
        )

    return agg.map_batches(fin, batch_format="pandas")


def sessionize_events(sf_dir: str, gap_sec: int = 1800):
    """Per-user session stats (30-min inactivity gap) — windowed aggregate.

    Scale shape: hash-bucket shuffle on user_id, then ONE vectorized pass per
    bucket — sort the whole bucket frame by (user_id, ts, event_id), session
    boundaries via per-user ``diff`` + global cumsum, sizes via a single
    composite groupby. No per-user Python. (Session boundaries can't be
    batch-combined without fragment merging, so the partial is a projection;
    the shuffle carries 3 narrow columns.)"""
    from .bucketed import bucketed_group_reduce

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df[["user_id", "ts", "event_id"]]

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame(
                columns=["user_id", "n_sessions", "max_session_events"]
            ).astype("int64")
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        gaps = g.groupby("user_id", sort=False)["ts"].diff().dt.total_seconds()
        new_sess = (gaps.isna() | (gaps > gap_sec)).to_numpy()
        # global cumsum: session ids unique across users within the bucket
        # (each user's first row always starts a new session)
        sess = np.cumsum(new_sess)
        sizes = (
            pd.DataFrame({"user_id": g["user_id"].to_numpy(), "sess": sess})
            .groupby(["user_id", "sess"], sort=False)
            .size()
            .reset_index(name="cnt")
        )
        out = (
            sizes.groupby("user_id", sort=False)
            .agg(n_sessions=("sess", "count"), max_session_events=("cnt", "max"))
            .reset_index()
        )
        return out.astype(
            {"user_id": "int64", "n_sessions": "int64", "max_session_events": "int64"}
        )

    return bucketed_group_reduce(
        _read(sf_dir, "events", ["event_id", "ts", "user_id"]),
        ["user_id"], partial, reduce, n_buckets=64,
    )


def hourly_event_windows(sf_dir: str):
    """Tumbling 1-hour windows per event_type."""

    def add_window(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "window_start": df["ts"].dt.strftime("%Y-%m-%d %H:00:00"),
                "event_type": df["event_type"],
                "value_cents": _cents(df["value"]),  # per-row: order-free int sum
            }
        )

    src = _read(sf_dir, "events", ["ts", "event_type", "value"]).map_batches(
        add_window, batch_format="pandas"
    )
    agg = pre_aggregate(src, ["window_start", "event_type"], sums=["value_cents"])

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "window_start": df["window_start"],
                "event_type": df["event_type"],
                "n": df["n"].astype("int64"),
                "sum_value_cents": df["sum_value_cents"].astype("int64"),
            }
        )

    return agg.map_batches(fin, batch_format="pandas")


def sliding_window_events(sf_dir: str):
    """1-hour windows sliding by 30 min: each event lands in exactly two
    windows (flat-map duplication inside map_batches), then the same bucketed
    count/sum combine as the tumbling case."""

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        t30 = df["ts"].dt.floor("30min")
        cents = _cents(df["value"])
        a = pd.DataFrame({"window_start": t30, "value_cents": cents})
        b = pd.DataFrame(
            {"window_start": t30 - pd.Timedelta(minutes=30), "value_cents": cents}
        )
        out = pd.concat([a, b], ignore_index=True)
        out["window_start"] = out["window_start"].dt.strftime("%Y-%m-%d %H:%M:00")
        return out

    src = _read(sf_dir, "events", ["ts", "value"]).map_batches(
        explode, batch_format="pandas"
    )
    agg = pre_aggregate(src, ["window_start"], sums=["value_cents"])

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "window_start": df["window_start"],
                "n": df["n"].astype("int64"),
                "sum_value_cents": df["sum_value_cents"].astype("int64"),
            }
        )

    return agg.map_batches(fin, batch_format="pandas")


def percentiles_value_per_type(sf_dir: str):
    """p50/p95/p99 per event_type from ONE histogram pass (exact — counts of
    distinct cents values shuffle, never rows; same sketch as the median)."""
    from .bucketed import bucketed_group_reduce

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        t = pd.DataFrame(
            {"event_type": df["event_type"], "cents": _cents(df["value"])}
        )
        return (
            t.groupby(["event_type", "cents"], sort=False)
            .size().rename("n").reset_index()
        )

    counts = bucketed_group_reduce(
        _read(sf_dir, "events", ["event_type", "value"]),
        ["event_type", "cents"],
        hist,
        lambda g: g.groupby(["event_type", "cents"], sort=False)["n"].sum().reset_index(),
        n_buckets=32,
    )

    def quantiles(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("cents", kind="stable")
        total = int(g["n"].sum())
        cum = g["n"].cumsum()
        out = {"event_type": [g["event_type"].iloc[0]]}
        for name, q in (("p50", 0.5), ("p95", 0.95), ("p99", 0.99)):
            # quantile_disc: smallest value with cumulative share >= q
            k = int(np.ceil(q * total))
            out[name] = [int(g.loc[cum >= max(k, 1), "cents"].iloc[0])]
        return pd.DataFrame(out).astype(
            {"p50": "int64", "p95": "int64", "p99": "int64"}
        )

    return counts.groupby("event_type", num_partitions=join_partitions(cap=8)).map_groups(
        quantiles, batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# Relational engine breadth (TPC-H-ish)
# ---------------------------------------------------------------------------

def _pc_units(col, factor: float):
    """Arrow kernel for the per-row integer-unit conversion: round half away
    from zero (DuckDB round() semantics), elementwise, zero-copy batch in."""
    import pyarrow as pa
    import pyarrow.compute as pc

    return pc.cast(
        pc.round(
            pc.multiply(pc.cast(col, pa.float64()), pa.scalar(float(factor))),
            0, round_mode="half_towards_infinity",
        ),
        pa.int64(),
    )


def q1_pricing_summary(sf_dir: str):
    import pyarrow as pa
    import pyarrow.compute as pc

    def prep(t: pa.Table) -> pa.Table:
        # per-row integer units (cents / e4) BEFORE the sum, all in Arrow
        # kernels on the zero-copy batch: int sums are order-free, so
        # results are bit-stable under any batch split
        disc_price = pc.multiply(
            pc.cast(t["l_extendedprice"], pa.float64()),
            pc.subtract(pa.scalar(1.0), pc.cast(t["l_discount"], pa.float64())),
        )
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "qty_cents": _pc_units(t["l_quantity"], 100),
                "price_cents": _pc_units(t["l_extendedprice"], 100),
                "disc_price_e4": _pc_units(disc_price, 10000),
            }
        )

    src = _read(
        sf_dir, "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    ).map_batches(prep, batch_format="pyarrow")
    agg = pre_aggregate(
        src, ["l_returnflag", "l_linestatus"],
        sums=["qty_cents", "price_cents", "disc_price_e4"],
        arrow_partial=True,
    )

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "l_returnflag": df["l_returnflag"],
                "l_linestatus": df["l_linestatus"],
                "sum_qty_cents": df["sum_qty_cents"].astype("int64"),
                "sum_base_price_cents": df["sum_price_cents"].astype("int64"),
                "sum_disc_price_e4": df["sum_disc_price_e4"].astype("int64"),
                "count_order": df["n"].astype("int64"),
            }
        )

    return agg.map_batches(fin, batch_format="pandas")


def q3_top_orders(sf_dir: str):
    seg = _read_small(
        sf_dir, "customer", ["c_custkey"],
        filters=[("c_mktsegment", "==", "BUILDING")],  # pushed into the scan
    ).rename(columns={"c_custkey": "o_custkey"})
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"])
    joined = broadcast_join(orders, seg, on="o_custkey")
    top = topk(joined, by="o_totalprice", k=10, descending=True, tiebreak="o_orderkey")
    top = top[["o_orderkey", "o_totalprice", "o_orderdate"]].copy()
    top["total_cents"] = _cents(top.pop("o_totalprice"))
    top["o_orderdate"] = top["o_orderdate"].dt.strftime("%Y-%m-%d")
    return top[["o_orderkey", "total_cents", "o_orderdate"]]


def q5_nation_revenue(sf_dir: str):
    """lineitem JOIN orders (hash-partitioned Dataset.join) JOIN broadcast
    customer->nation dims -> revenue per nation."""
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    joined = li.join(
        orders, join_type="inner", num_partitions=join_partitions(),
        on=("l_orderkey",), right_on=("o_orderkey",),
    )
    cust = _read_small(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    nation = _read_small(sf_dir, "nation", ["n_nationkey", "n_name"])
    dim = cust.merge(nation, left_on="c_nationkey", right_on="n_nationkey")[
        ["c_custkey", "n_name"]
    ].rename(columns={"c_custkey": "o_custkey"})

    def rev(t):
        # per-row e4 units before summing (order-free int sum; see q1),
        # Arrow kernels on the zero-copy join output
        import pyarrow as pa
        import pyarrow.compute as pc

        disc_price = pc.multiply(
            pc.cast(t["l_extendedprice"], pa.float64()),
            pc.subtract(pa.scalar(1.0), pc.cast(t["l_discount"], pa.float64())),
        )
        return pa.table(
            {"o_custkey": t["o_custkey"], "revenue_e4": _pc_units(disc_price, 10000)}
        )

    enriched = broadcast_join(
        joined.map_batches(rev, batch_format="pyarrow"), dim, on="o_custkey"
    )
    agg = pre_aggregate(
        enriched, ["n_name"], sums=["revenue_e4"], counts=False, arrow_partial=True
    )

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "n_name": df["n_name"],
                "revenue_e4": df["sum_revenue_e4"].astype("int64"),
            }
        )

    return agg.map_batches(fin, batch_format="pandas")


def top_suppliers_native_sort(sf_dir: str):
    """Native ``Dataset.sort(descending).limit(k)`` — the built-in total-order
    path (q3 shows the partial-top-k alternative that avoids the full sort)."""
    ds = _read(sf_dir, "supplier", ["s_suppkey", "s_acctbal"]).sort(
        ["s_acctbal", "s_suppkey"], descending=[True, False]
    ).limit(5)

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "s_suppkey": df["s_suppkey"].astype("int64"),
                "acctbal_cents": _cents(df["s_acctbal"]),
            }
        )

    return ds.map_batches(fin, batch_format="pandas")


def topk_parts_per_brand(sf_dir: str):
    """Top-3 parts by retail price within each brand (windowed top-k)."""

    def per_brand(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["p_retailprice", "p_partkey"], ascending=[False, True],
                          kind="stable").head(3).copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype="int64")
        g["price_cents"] = _cents(g["p_retailprice"])
        return g[["p_brand", "rank", "p_partkey", "price_cents"]]

    return (
        _read(sf_dir, "part", ["p_partkey", "p_brand", "p_retailprice"])
        .groupby("p_brand", num_partitions=join_partitions())
        .map_groups(per_brand, batch_format="pandas")
    )


def customers_without_orders(sf_dir: str):
    """Anti join via broadcast key set: customers with no big (>400k) order."""
    big = _read_small(
        sf_dir, "orders", ["o_custkey"],
        filters=[("o_totalprice", ">", 400000)],  # pushed into the scan
    )
    okeys = set(big["o_custkey"].tolist())
    return broadcast_semi_join(
        _read(sf_dir, "customer", ["c_custkey"]), okeys, "c_custkey", anti=True
    )


# ---------------------------------------------------------------------------
# Dedup / similarity / text stats
# ---------------------------------------------------------------------------

def doc_token_stats(sf_dir: str):
    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        token_stats_batch, batch_format="pandas"
    )


def doc_quality(sf_dir: str):
    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        quality_batch, batch_format="pandas"
    )


def doc_langid(sf_dir: str):
    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        langid_batch, batch_format="pandas"
    )


def doc_fingerprint(sf_dir: str):
    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        fingerprint_batch, batch_format="pandas"
    )


def doc_winnow_fp(sf_dir: str):
    """Winnowing rolling-hash fingerprints (local substring-match sketches),
    exploded to (doc_id, ord, fp) rows — relational shape the DuckDB window-
    function oracle reproduces exactly (first 64 fingerprints per doc)."""
    from .textstats import winnow_fingerprints_np

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        doc_ids, ords, fps = [], [], []
        for d, t in zip(df["doc_id"], df["text"]):
            f = winnow_fingerprints_np(t)[:64]
            doc_ids.append(np.full(len(f), d, dtype=np.int64))
            ords.append(np.arange(1, len(f) + 1, dtype=np.int64))
            fps.append(f)
        if not doc_ids:
            return pd.DataFrame(
                {"doc_id": pd.Series(dtype="int64"), "ord": pd.Series(dtype="int64"),
                 "fp": pd.Series(dtype="int64")}
            )
        return pd.DataFrame(
            {
                "doc_id": np.concatenate(doc_ids),
                "ord": np.concatenate(ords),
                "fp": np.concatenate(fps).astype("int64"),
            }
        )

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        fn, batch_format="pandas"
    )


def doc_gopher_filter(sf_dir: str):
    """Gopher-style quality gate (public heuristic rules): length bounds,
    stopword floor, max-word-length cap, symbol-ratio cap. Returns the
    surviving doc ids + the rule bits for auditability."""
    from .textstats import STOPWORDS, _tokens

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].map(_tokens)
        n = toks.map(len).astype("int64")
        stop = set(STOPWORDS)
        stop_cnt = toks.map(lambda t: sum(1 for w in t if w in stop)).astype("int64")
        maxw = toks.map(lambda t: max((len(w) for w in t), default=0)).astype("int64")
        sym = df["text"].str.count(r"[#@$%^*=<>{}\[\]\\]").astype("int64")
        chars = df["text"].str.len().astype("int64")
        ok_len = (n >= 5) & (n <= 10000)
        ok_stop = stop_cnt >= 1
        ok_word = maxw <= 30
        ok_sym = sym * 10 < chars.clip(lower=1) * 3  # symbol ratio < 0.3
        keep = ok_len & ok_stop & ok_word & ok_sym
        out = pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "ok_len": ok_len.astype("int64"),
                "ok_stop": ok_stop.astype("int64"),
                "ok_word": ok_word.astype("int64"),
                "ok_sym": ok_sym.astype("int64"),
            }
        )
        return out[keep.to_numpy()]

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        fn, batch_format="pandas"
    )


def doc_scrub_digits(sf_dir: str):
    """PII-style scrub: mask every digit (vectorized Arrow regex kernel)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "scrubbed": pc.replace_substring_regex(
                    t["text"], pattern=r"\d", replacement="#"
                ),
            }
        )

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow"
    )


def top_tokens_per_source(sf_dir: str, k: int = 5):
    """Top-k tokens per source group: grouped wordcount partials -> bucketed
    merge -> tiny per-source top-k (deterministic count-desc, token-asc)."""
    from collections import Counter

    from .bucketed import bucketed_group_reduce
    from .textstats import _tokens

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        counts: dict = {}
        for src, text in zip(df["source"], df["text"]):
            c = counts.setdefault(src, Counter())
            c.update(_tokens(text))
        rows = [
            (src, tok, n) for src, c in counts.items() for tok, n in c.items()
        ]
        return pd.DataFrame(rows, columns=["source", "token", "n"]).astype(
            {"n": "int64"}
        )

    counts = bucketed_group_reduce(
        _read(sf_dir, "documents", ["source", "text"]),
        ["source", "token"],
        partial,
        lambda g: g.groupby(["source", "token"], sort=False)["n"].sum().reset_index(),
        n_buckets=32,
    )

    def per_source(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["n", "token"], ascending=[False, True], kind="stable").head(k)
        g = g.copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype="int64")
        return g[["source", "rank", "token", "n"]].astype({"n": "int64"})

    return counts.groupby("source", num_partitions=join_partitions(cap=8)).map_groups(
        per_source, batch_format="pandas"
    )


def doc_bpe_token_stats(sf_dir: str):
    """BPE-ish pre-tokenizer counting (the GPT-2-family pre-tokenize split,
    lookahead-free so the DuckDB oracle shares the exact grammar): runs of
    letters | runs of digits | runs of other non-space | whitespace is a
    separator. Complements whitespace token counting (doc_token_stats) with
    the unit an actual tokenizer would see."""
    import pyarrow as pa
    import pyarrow.compute as pc

    pat = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]+"

    def fn(t: pa.Table) -> pa.Table:
        all_t = pc.count_substring_regex(t["text"], pat)
        alpha = pc.count_substring_regex(t["text"], r"[a-zA-Z]+")
        num = pc.count_substring_regex(t["text"], r"[0-9]+")
        punct = pc.count_substring_regex(t["text"], r"[^a-zA-Z0-9\s]+")
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_bpe_tokens": pc.cast(all_t, pa.int64()),
                "n_alpha": pc.cast(alpha, pa.int64()),
                "n_num": pc.cast(num, pa.int64()),
                "n_punct": pc.cast(punct, pa.int64()),
            }
        )

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow"
    )


def stratified_sample_per_source(sf_dir: str, k: int = 5):
    """Deterministic stratified sample: the k docs with the smallest
    md5(doc_id) per source — stable across cluster sizes and re-runs
    (train/val sampling per domain). Partial top-k per batch per source,
    bucketed top-k merge: shuffle carries at most k rows per source per
    batch, never the corpus."""
    import hashlib

    from .bucketed import bucketed_group_reduce

    def rank_keys(df: pd.DataFrame) -> pd.DataFrame:
        h = df["doc_id"].map(
            lambda i: hashlib.md5(str(i).encode()).hexdigest()
        )
        return pd.DataFrame(
            {"source": df["source"], "doc_id": df["doc_id"], "h": h}
        )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = rank_keys(df)
        return (
            t.sort_values(["h", "doc_id"], kind="stable")
            .groupby("source", sort=False)
            .head(k)
        )

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.sort_values(["h", "doc_id"], kind="stable")
            .groupby("source", sort=False)
            .head(k)
        )
        return out[["source", "doc_id"]].astype({"doc_id": "int64"})

    return bucketed_group_reduce(
        _read(sf_dir, "documents", ["doc_id", "source"]),
        ["source"], partial, reduce, n_buckets=32,
    )


def dedup_minhash_clusters(sf_dir: str):
    """Global (unblocked) near-dup clusters: MinHash-LSH est-sim pairs ->
    connected components — the corpus-wide dedup grouping the blocked
    variant can't see (rows-only: pair source is the signature estimator)."""
    from .graph import connected_components

    pairs = minhash_lsh_pairs(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        threshold=0.9, bands=16, ngram=3,
    )
    return connected_components(pairs)


def doc_bigram_logprob(sf_dir: str):
    """Perplexity-style quality score: mean add-one-smoothed bigram log
    probability per doc under the corpus's own bigram LM — the classic
    'LM filter' a training-data pipeline runs before mixing a source in.

    Two passes: (1) corpus unigram+bigram counts via the bucketed combiner
    (counts are aggregates — tiny relative to the corpus; at web scale cap
    the vocabulary and bucket the count table instead of broadcasting),
    (2) the count tables broadcast once via ray.put, per-doc scoring fully
    inside map_batches. Output (doc_id, n_bigrams, avg_logprob)."""
    import math

    import ray

    from .bucketed import bucketed_group_reduce
    from .textstats import _tokens

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def uni_partial(df: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        c: Counter = Counter()
        for s in df["text"]:
            c.update(_tokens(s))
        return pd.DataFrame({"w": list(c.keys()),
                             "n": np.fromiter(c.values(), dtype="int64")})

    def uni_reduce(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("w", sort=False)["n"].sum().reset_index()

    def bi_partial(df: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        c: Counter = Counter()
        for s in df["text"]:
            t = _tokens(s)
            c.update(zip(t, t[1:]))
        if not c:
            return pd.DataFrame({"w1": pd.Series(dtype=object),
                                 "w2": pd.Series(dtype=object),
                                 "n": pd.Series(dtype="int64")})
        ks = list(c.keys())
        return pd.DataFrame(
            {"w1": [k[0] for k in ks], "w2": [k[1] for k in ks],
             "n": np.fromiter(c.values(), dtype="int64")}
        )

    def bi_reduce(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["w1", "w2"], sort=False)["n"].sum().reset_index()

    uni = bucketed_group_reduce(docs, ["w"], uni_partial, uni_reduce, 32).to_pandas()
    bi = bucketed_group_reduce(
        docs, ["w1", "w2"], bi_partial, bi_reduce, 32
    ).to_pandas()
    vocab_size = len(uni)
    uni_ref = ray.put(dict(zip(uni["w"], uni["n"].astype(int))))
    bi_ref = ray.put(dict(zip(zip(bi["w1"], bi["w2"]), bi["n"].astype(int))))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        ucnt = ray.get(uni_ref)
        bcnt = ray.get(bi_ref)
        n_out = np.zeros(len(df), dtype=np.int64)
        lp_out = np.zeros(len(df), dtype=np.int64)
        for i, s in enumerate(df["text"]):
            t = _tokens(s)
            if len(t) < 2:
                continue
            lp = 0
            for w1, w2 in zip(t, t[1:]):
                x = math.log(
                    (bcnt.get((w1, w2), 0) + 1) / (ucnt.get(w1, 0) + vocab_size)
                ) * 1e6
                lp += int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))
            n_out[i] = len(t) - 1
            lp_out[i] = lp
        return pd.DataFrame(
            {"doc_id": df["doc_id"].astype("int64"), "n_bigrams": n_out,
             "sum_logprob_e6": lp_out}
        )

    return docs.map_batches(score, batch_format="pandas")


def source_scorecard(sf_dir: str):
    """Per-source curation scorecard: document and token volume, how much
    of the source looks English to the langid heuristic, and how many of
    its docs are byte-exact duplicates of another doc in the SAME source —
    the per-source dashboard a corpus owner reads to decide which feeds
    to keep, reweight, or re-crawl.

    Scale shape: volume/lang counts are per-batch partials (no text
    crosses the wire); the within-source dup count ships only (source,
    md5) 16-byte fingerprint rows through one bucketed exchange and
    counts groups of size >= 2 in the bucket. Output (source, n_docs,
    n_tokens, n_pred_en, n_dup_docs)."""
    import hashlib

    from .bucketed import bucketed_group_reduce
    from .textstats import _tokens, langid_batch

    docs = _read(sf_dir, "documents", ["doc_id", "text", "source"])

    def vol_partial(df: pd.DataFrame) -> pd.DataFrame:
        pred_en = (langid_batch(df)["lang_pred"] == "en").to_numpy()
        out = pd.DataFrame(
            {"source": df["source"].to_numpy(),
             "n_docs": np.ones(len(df), dtype="int64"),
             "n_tokens": np.asarray([len(_tokens(s)) for s in df["text"]],
                                    dtype="int64"),
             "n_pred_en": pred_en.astype("int64")}
        )
        return out.groupby("source", sort=False, as_index=False).sum()

    def vol_reduce(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("source", sort=False, as_index=False)[
            ["n_docs", "n_tokens", "n_pred_en"]
        ].sum()

    def fp_partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"source": df["source"].to_numpy(),
             "fp": [hashlib.md5((t if isinstance(t, str) else "").encode())
                    .hexdigest() for t in df["text"]],
             "n": np.ones(len(df), dtype="int64")}
        )

    def fp_reduce(g: pd.DataFrame) -> pd.DataFrame:
        grp = g.groupby(["source", "fp"], sort=False)["n"].sum().reset_index()
        dup = grp[grp["n"] >= 2]
        out = dup.groupby("source", sort=False)["n"].sum().reset_index()
        out.columns = ["source", "n_dup_docs"]
        out["n_dup_docs"] = out["n_dup_docs"].astype("int64")
        return out

    vol = bucketed_group_reduce(docs, ["source"], vol_partial, vol_reduce, 4).to_pandas()
    dup = bucketed_group_reduce(
        docs, ["source", "fp"], fp_partial, fp_reduce, 16
    ).to_pandas()
    if len(dup) and "source" in dup.columns:
        # fp-keyed buckets each emit their own per-source partial rows
        dup = dup.groupby("source", as_index=False)["n_dup_docs"].sum()
    else:
        # Ray 2.49 to_pandas() returns a COLUMNLESS frame for 0-row results
        dup = pd.DataFrame({"source": pd.Series(dtype=object),
                            "n_dup_docs": pd.Series(dtype="int64")})
    out = vol.merge(dup, on="source", how="left")
    out["n_dup_docs"] = out["n_dup_docs"].fillna(0).astype("int64")
    for c in ("n_docs", "n_tokens", "n_pred_en"):
        out[c] = out[c].astype("int64")
    return out[["source", "n_docs", "n_tokens", "n_pred_en", "n_dup_docs"]]


def cross_source_leakage(sf_dir: str):
    """Cross-source near-duplicate leakage matrix: count MinHash near-dup
    pairs (est_sim >= 0.9, the dedup_minhash contract) whose two documents
    live in DIFFERENT sources vs the same source — the audit that tells a
    corpus owner which feeds are mirroring each other (train/val leakage
    risk and wasted mixture weight) before source-level dedup decisions.

    Scale shape: reuses the join-free banded MinHash pair pipeline
    unchanged; the doc->source attachment is a broadcast narrow lookup
    (at fleet scale: a co-partitioned column ride-along), and the matrix
    itself is an aggregate. Output (source_a, source_b, n_pairs) with
    source_a <= source_b."""
    import ray

    src_df = _read_small(sf_dir, "documents", ["doc_id", "source"])
    src_arr = np.empty(int(src_df["doc_id"].max()) + 1, dtype=object)
    src_arr[src_df["doc_id"].to_numpy()] = src_df["source"].to_numpy()
    src_ref = ray.put(src_arr)

    pairs = minhash_lsh_pairs(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        threshold=0.9, bands=16, ngram=3,
    )

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        sm = ray.get(src_ref)
        if not len(df):
            return pd.DataFrame({"source_a": pd.Series(dtype=object),
                                 "source_b": pd.Series(dtype=object),
                                 "n_pairs": pd.Series(dtype="int64")})
        sa = [sm[int(a)] for a in df["doc_a"]]
        sb = [sm[int(b)] for b in df["doc_b"]]
        out = pd.DataFrame(
            {"source_a": [min(x, y) for x, y in zip(sa, sb)],
             "source_b": [max(x, y) for x, y in zip(sa, sb)]}
        )
        return out.groupby(["source_a", "source_b"], sort=False).size().rename(
            "n_pairs"
        ).reset_index()

    parts = pairs.map_batches(tag, batch_format="pandas").to_pandas()
    if not len(parts) or "source_a" not in parts.columns:
        return pd.DataFrame({"source_a": pd.Series(dtype=object),
                             "source_b": pd.Series(dtype=object),
                             "n_pairs": pd.Series(dtype="int64")})
    out = parts.groupby(["source_a", "source_b"], as_index=False)["n_pairs"].sum()
    out["n_pairs"] = out["n_pairs"].astype("int64")
    return out


def curate_corpus_v2(sf_dir: str):
    """Capstone curation pipeline composing FOUR round-5-era quality axes
    in one streaming pass — the decision record a production corpus build
    emits per document before writing the training split:
    Gopher-style structural quality ∧ langid says English ∧ DSIR
    importance ratio positive ∧ readability sanity (>= 1 sentence segment,
    <= 4 vowel groups per word). Flags are emitted per doc (not just the
    survivors) so downstream dashboards can attribute every rejection.

    Scale shape: the DSIR table is ONE aggregate count pass (4096-row
    output) broadcast once; everything else is per-batch vectorized
    arithmetic on the same single corpus read — no shuffle anywhere.
    Output (doc_id, ok_quality, ok_lang, ok_dsir, ok_read, keep)."""
    import re as _re

    import ray

    from .textstats import STOPWORDS, _tokens

    docs = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    lp_ref = ray.put(_dsir_fit(docs))
    sent_re = _re.compile(r"[.!?]")
    syl_re = _re.compile(r"[aeiouyAEIOUY]+")

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        table = ray.get(lp_ref)
        toks = df["text"].map(_tokens)
        n = toks.map(len).astype("int64")
        stop = set(STOPWORDS)
        stop_cnt = toks.map(lambda t: sum(1 for w in t if w in stop)).astype("int64")
        maxw = toks.map(lambda t: max((len(w) for w in t), default=0)).astype("int64")
        sym = df["text"].str.count(r"[#@$%^*=<>{}\[\]\\]").astype("int64")
        chars = df["text"].str.len().astype("int64")
        ok_quality = (
            (n >= 5) & (n <= 10000) & (stop_cnt >= 1) & (maxw <= 30)
            & (sym * 10 < chars.clip(lower=1) * 3)
        ).to_numpy()
        # langid gate, integer-exact: ratio >= 0.05 == stop*20 >= n (n>0)
        ok_lang = (n.to_numpy() > 0) & (stop_cnt.to_numpy() * 20 >= n.to_numpy())
        ok_dsir = np.zeros(len(df), dtype=bool)
        ok_read = np.zeros(len(df), dtype=bool)
        for i, text in enumerate(df["text"]):
            t = text if isinstance(text, str) else ""
            bs = _dsir_term_buckets(t)
            if len(bs):
                ok_dsir[i] = int(table[bs].sum()) > 0
            ns = sum(1 for seg in sent_re.split(t) if seg.strip())
            sy = len(syl_re.findall(t))
            ok_read[i] = ns >= 1 and sy <= 4 * int(n.iloc[i])
        keep = ok_quality & ok_lang & ok_dsir & ok_read
        return pd.DataFrame(
            {"doc_id": df["doc_id"].astype("int64"),
             "ok_quality": ok_quality.astype("int64"),
             "ok_lang": ok_lang.astype("int64"),
             "ok_dsir": ok_dsir.astype("int64"),
             "ok_read": ok_read.astype("int64"),
             "keep": keep.astype("int64")}
        )

    return docs.map_batches(fn, batch_format="pandas")


def doc_readability_stats(sf_dir: str):
    """Readability raw components per doc (Flesch/Kincaid family inputs):
    sentence count (non-empty [.!?] segments), word count, and a
    vowel-group syllable proxy (maximal [aeiouyAEIOUY]+ runs) — the
    reading-level quality axis a corpus filter combines with stopword and
    repetition signals. Emitted as raw integers (the grade formulas are
    driver-side arithmetic) so the whole op is one shuffle-free
    vectorized pass and the oracle compares exact counts.
    Output (doc_id, n_sentences, n_words, n_syllables)."""
    import re as _re

    from .textstats import _tokens

    sent_re = _re.compile(r"[.!?]")
    syl_re = _re.compile(r"[aeiouyAEIOUY]+")

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(dtype="int64")
        ns = np.zeros(len(df), dtype=np.int64)
        nw = np.zeros(len(df), dtype=np.int64)
        sy = np.zeros(len(df), dtype=np.int64)
        for i, text in enumerate(df["text"]):
            t = text if isinstance(text, str) else ""
            ns[i] = sum(1 for seg in sent_re.split(t) if seg.strip())
            nw[i] = len(_tokens(t))
            sy[i] = len(syl_re.findall(t))
        return pd.DataFrame(
            {"doc_id": ids, "n_sentences": ns, "n_words": nw,
             "n_syllables": sy}
        )

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        stats, batch_format="pandas"
    )


def contrastive_triplets(sf_dir: str):
    """Contrastive training-pair construction: every MinHash near-dup pair
    becomes an (anchor, positive) example and gets a deterministic
    hash-picked negative document — the triplet-mining pass an
    embedding-model training pipeline runs over its corpus (positives
    from near-duplicates, negatives uniform-at-random but reproducible).

    The negative is ``md5(anchor:positive) % n_docs`` with a 3-candidate
    collision walk (c0, c0+1, c0+2 mod n — at most two of three
    consecutive ids can collide with the pair), so the triplet set is a
    pure function of the corpus: re-runs, resumes and the SQL oracle all
    build the identical training set. Scale shape: the pair pipeline is
    unchanged; negative assignment is per-row arithmetic on the
    aggregate-sized pair list. Output (anchor, positive, negative)."""
    import hashlib

    import pyarrow.parquet as _pq

    n_docs = 0
    meta = _pq.read_metadata(os.path.join(sf_dir, "documents.parquet"))
    # max doc_id + 1 from the column stats (dense 0..N-1 ids in testdata);
    # fall back to a scan-free count if stats are absent
    try:
        mx = max(
            meta.row_group(i).column(0).statistics.max
            for i in range(meta.num_row_groups)
        )
        n_docs = int(mx) + 1
    except Exception:
        n_docs = meta.num_rows

    pairs = minhash_lsh_pairs(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        threshold=0.9, bands=16, ngram=3,
    )

    def build(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"anchor": pd.Series(dtype="int64"),
                                 "positive": pd.Series(dtype="int64"),
                                 "negative": pd.Series(dtype="int64")})
        neg = []
        for a, b in zip(df["doc_a"].astype(int), df["doc_b"].astype(int)):
            c0 = int.from_bytes(
                hashlib.md5(f"{a}:{b}".encode()).digest()[:8], "little"
            ) % n_docs
            for c in (c0, (c0 + 1) % n_docs, (c0 + 2) % n_docs):
                if c != a and c != b:
                    neg.append(c)
                    break
        return pd.DataFrame(
            {"anchor": df["doc_a"].astype("int64").to_numpy(),
             "positive": df["doc_b"].astype("int64").to_numpy(),
             "negative": pd.array(neg, dtype="int64")}
        )

    return pairs.map_batches(build, batch_format="pandas")


def mixture_plan_sources(sf_dir: str):
    """Token-budget mixture planning: given per-source token volumes,
    compute each source's corpus share and the deterministic sampling
    rate that flattens the mixture to an equal-token budget of half the
    corpus — the plan a pretraining run computes before drawing its data
    mixture (heavily-overrepresented feeds get rate < 1, small feeds keep
    rate = 1 rather than upsampling).

    Scale shape: one shuffle-free per-batch count pass collapses the
    corpus to a per-source aggregate; the plan itself is driver
    arithmetic. share/rate are single fixed IEEE double expressions over
    exact ints (< 2^53), micro-unit rounded — bit-identical in the
    oracle. Output (source, n_tokens, share_e6, sample_rate_e6)."""
    from .bucketed import bucketed_group_reduce
    from .textstats import _tokens

    docs = _read(sf_dir, "documents", ["doc_id", "text", "source"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {"source": df["source"].to_numpy(),
             "n_tokens": np.asarray([len(_tokens(s)) for s in df["text"]],
                                    dtype="int64")}
        )
        return out.groupby("source", sort=False, as_index=False).sum()

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("source", sort=False, as_index=False)["n_tokens"].sum()

    vol = bucketed_group_reduce(docs, ["source"], partial, reduce, 4).to_pandas()
    total = int(vol["n_tokens"].sum())
    nsrc = len(vol)
    rows = []
    for src, n in zip(vol["source"], vol["n_tokens"].astype(int)):
        share = n / float(total)
        budget = float(total) / 2.0 / nsrc
        rate = min(1.0, budget / n) if n > 0 else 1.0
        rows.append((src, n, _round_half_away(np.asarray([share * 1e6]))[0],
                     _round_half_away(np.asarray([rate * 1e6]))[0]))
    rows.sort(key=lambda r: r[0])
    return pd.DataFrame(
        {"source": [r[0] for r in rows],
         "n_tokens": pd.array([r[1] for r in rows], dtype="int64"),
         "share_e6": pd.array([r[2] for r in rows], dtype="int64"),
         "sample_rate_e6": pd.array([r[3] for r in rows], dtype="int64")}
    )


def lang_label_audit(sf_dir: str):
    """Declared-vs-detected language confusion matrix: cross-tabulate each
    doc's metadata ``lang`` label against the stopword-ratio language-id
    prediction — the label-noise audit a multilingual corpus runs before
    trusting upstream metadata for filtering or mixture weighting (a
    mislabeled slice silently skews DSIR targets and lang filters).

    Scale shape: per-batch partial counts of (lang, lang_pred) collapse
    each batch to <= |langs| x 2 rows; one tiny bucketed combine finishes
    the matrix. Pure aggregate — text never shuffles.
    Output (lang, lang_pred, n)."""
    from .bucketed import bucketed_group_reduce
    from .textstats import langid_batch

    docs = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        pred = langid_batch(df)["lang_pred"]
        out = pd.DataFrame({"lang": df["lang"].to_numpy(), "lang_pred": pred})
        return out.groupby(["lang", "lang_pred"], sort=False).size().rename(
            "n"
        ).reset_index()

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        r = g.groupby(["lang", "lang_pred"], sort=False)["n"].sum().reset_index()
        r["n"] = r["n"].astype("int64")
        return r

    return bucketed_group_reduce(
        docs, ["lang", "lang_pred"], partial, reduce, n_buckets=4
    )


def vocab_growth_curve(sf_dir: str):
    """Heaps'-law vocabulary-growth profile: cumulative distinct-token
    vocabulary and token volume after each doc_id decile — the corpus
    profiling curve a tokenizer-training pipeline reads to size vocab
    budgets and predict OOV rates as the corpus grows.

    Scale shape: prefix-distinct counting is sequential in general, but
    over a keyed corpus it collapses to aggregates: vocab_at(d) =
    #{token: min_doc(token) <= d}, so ONE bucketed pass reduces each
    token to its first-occurrence doc_id (vocab-sized aggregate) and a
    second tiny combiner sums per-doc token counts; the decile roll-up is
    driver-side arithmetic over those aggregates. No corpus-order scan,
    no shuffle of text. Output (decile, max_doc_id, vocab_size,
    n_tokens)."""
    from .bucketed import bucketed_group_reduce
    from .textstats import _tokens

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def first_partial(df: pd.DataFrame) -> pd.DataFrame:
        first: dict = {}
        for doc_id, s in zip(df["doc_id"].astype(int), df["text"]):
            for w in set(_tokens(s)):
                cur = first.get(w)
                if cur is None or doc_id < cur:
                    first[w] = doc_id
        return pd.DataFrame({"w": list(first.keys()),
                             "d": np.fromiter(first.values(), dtype="int64")})

    def first_reduce(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("w", sort=False)["d"].min().reset_index()

    def cnt_partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": df["doc_id"].astype("int64"),
             "n": np.asarray([len(_tokens(s)) for s in df["text"]],
                             dtype="int64")}
        )

    def cnt_reduce(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("doc_id", sort=False)["n"].sum().reset_index()

    first = bucketed_group_reduce(docs, ["w"], first_partial, first_reduce, 32).to_pandas()
    cnts = bucketed_group_reduce(docs, ["doc_id"], cnt_partial, cnt_reduce, 16).to_pandas()
    max_doc = int(cnts["doc_id"].max())
    rows = []
    for dec in range(1, 11):
        cut = (max_doc + 1) * dec // 10 - 1
        rows.append((
            dec, cut,
            int((first["d"] <= cut).sum()),
            int(cnts.loc[cnts["doc_id"] <= cut, "n"].sum()),
        ))
    return pd.DataFrame(
        {"decile": pd.array([r[0] for r in rows], dtype="int64"),
         "max_doc_id": pd.array([r[1] for r in rows], dtype="int64"),
         "vocab_size": pd.array([r[2] for r in rows], dtype="int64"),
         "n_tokens": pd.array([r[3] for r in rows], dtype="int64")}
    )


def pmi_top_collocations(sf_dir: str, min_count: int = 5, k: int = 20):
    """Top-k collocations by pointwise mutual information (Church & Hanks
    1990; the word2phrase-style phrase-mining pass a tokenizer/vocab
    pipeline runs before merging multiword units): PMI = ln(c12 * Nbi /
    (c1 * c2)) over corpus bigram/unigram counts, bigrams with
    c12 >= min_count, ranked by (pmi desc, w1, w2).

    Determinism: PMI is rounded to integer micro-nats from ONE fixed IEEE
    double expression over exact integer counts (all < 2^53 — the same
    bit-stability contract as the KN scorer), so the rank key is an
    integer triple and the top-k is unambiguous. Scale shape: two bucketed
    count passes (the same aggregates the LM filters use); the PMI rank
    runs on the bigram AGGREGATE (vocab-bounded, orders of magnitude below
    corpus size) — at fleet scale the top-k becomes a per-partition heap +
    merge (heavy_hitters pattern); text never shuffles.
    Output (w1, w2, n, pmi_e6)."""
    import math

    from .bucketed import bucketed_group_reduce
    from .textstats import _tokens

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def uni_partial(df: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        c: Counter = Counter()
        for s in df["text"]:
            c.update(_tokens(s))
        return pd.DataFrame({"w": list(c.keys()),
                             "n": np.fromiter(c.values(), dtype="int64")})

    def uni_reduce(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("w", sort=False)["n"].sum().reset_index()

    def bi_partial(df: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        c: Counter = Counter()
        for s in df["text"]:
            t = _tokens(s)
            c.update(zip(t, t[1:]))
        if not c:
            return pd.DataFrame({"w1": pd.Series(dtype=object),
                                 "w2": pd.Series(dtype=object),
                                 "n": pd.Series(dtype="int64")})
        ks = list(c.keys())
        return pd.DataFrame(
            {"w1": [x[0] for x in ks], "w2": [x[1] for x in ks],
             "n": np.fromiter(c.values(), dtype="int64")}
        )

    def bi_reduce(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["w1", "w2"], sort=False)["n"].sum().reset_index()

    uni = bucketed_group_reduce(docs, ["w"], uni_partial, uni_reduce, 32).to_pandas()
    bi = bucketed_group_reduce(docs, ["w1", "w2"], bi_partial, bi_reduce, 32).to_pandas()
    nbi = int(bi["n"].sum())
    ucnt = dict(zip(uni["w"], uni["n"].astype(int)))

    cand = bi[bi["n"] >= min_count]
    rows = []
    for w1, w2, n in zip(cand["w1"], cand["w2"], cand["n"].astype(int)):
        x = math.log(n * float(nbi) / (float(ucnt[w1]) * ucnt[w2])) * 1e6
        pmi = int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))
        rows.append((w1, w2, n, pmi))
    rows.sort(key=lambda r: (-r[3], r[0], r[1]))
    top = rows[:k]
    return pd.DataFrame(
        {"w1": [r[0] for r in top], "w2": [r[1] for r in top],
         "n": pd.array([r[2] for r in top], dtype="int64"),
         "pmi_e6": pd.array([r[3] for r in top], dtype="int64")}
    )


def doc_kneser_ney_logprob(sf_dir: str):
    """Interpolated Kneser-Ney bigram log probability per doc (Kneser &
    Ney 1995 / Chen & Goodman 1998, the standard n-gram LM smoothing) —
    the stronger sibling of ``doc_bigram_logprob``'s add-one filter:
    p(w2|w1) = (max(c12 - D, 0) + D * n1p(w1) * pcont(w2)) / c1 with
    D = 0.75 and continuation probability pcont(w2) = npre(w2) / ntypes;
    contexts never seen as bigram heads back off to pcont alone.

    Determinism contract: every count (c12, c1, n1p, npre, ntypes) is an
    exact integer aggregate derived from the SAME bucketed bigram count
    pass as the add-one op (no extra corpus scan), each per-term
    probability is ONE fixed IEEE double expression over those ints (all
    < 2^53, so numpy/DuckDB evaluate it bit-identically), and terms round
    to integer micro-nats BEFORE the order-free integer sum.
    Output (doc_id, n_bigrams, kn_logprob_e6)."""
    import math

    import ray

    from .bucketed import bucketed_group_reduce
    from .textstats import _tokens

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def bi_partial(df: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        c: Counter = Counter()
        for s in df["text"]:
            t = _tokens(s)
            c.update(zip(t, t[1:]))
        if not c:
            return pd.DataFrame({"w1": pd.Series(dtype=object),
                                 "w2": pd.Series(dtype=object),
                                 "n": pd.Series(dtype="int64")})
        ks = list(c.keys())
        return pd.DataFrame(
            {"w1": [k[0] for k in ks], "w2": [k[1] for k in ks],
             "n": np.fromiter(c.values(), dtype="int64")}
        )

    def bi_reduce(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["w1", "w2"], sort=False)["n"].sum().reset_index()

    bi = bucketed_group_reduce(docs, ["w1", "w2"], bi_partial, bi_reduce, 32).to_pandas()
    ntypes = len(bi)
    c12 = dict(zip(zip(bi["w1"], bi["w2"]), bi["n"].astype(int)))
    c1 = bi.groupby("w1")["n"].sum().astype(int).to_dict()
    n1p = bi.groupby("w1").size().astype(int).to_dict()
    npre = bi.groupby("w2").size().astype(int).to_dict()
    refs = ray.put((c12, c1, n1p, npre, ntypes))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        b12, b1, b1p, bpre, nt = ray.get(refs)
        n_out = np.zeros(len(df), dtype=np.int64)
        lp_out = np.zeros(len(df), dtype=np.int64)
        for i, s in enumerate(df["text"]):
            t = _tokens(s)
            if len(t) < 2:
                continue
            lp = 0
            for w1, w2 in zip(t, t[1:]):
                pc = bpre.get(w2, 0) / nt
                cw1 = b1.get(w1, 0)
                if cw1 == 0:
                    p = pc
                else:
                    p = (max(b12.get((w1, w2), 0) - 0.75, 0.0)
                         + 0.75 * b1p[w1] * pc) / cw1
                x = math.log(p) * 1e6  # every scored pair has pc > 0
                lp += int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))
            n_out[i] = len(t) - 1
            lp_out[i] = lp
        return pd.DataFrame(
            {"doc_id": df["doc_id"].astype("int64"), "n_bigrams": n_out,
             "kn_logprob_e6": lp_out}
        )

    return docs.map_batches(score, batch_format="pandas")


_DSIR_B = 4096
_DSIR_MEMO: dict = {}


def _dsir_bucket(term: str) -> int:
    """Hashed-n-gram feature bucket: md5 low-8-bytes little-endian mod 4096
    — the same DuckDB-recomputable contract as the HLL/count sketches
    (``md5_number_upper(term) % 4096``). Memoized per worker (bounded)."""
    import hashlib

    b = _DSIR_MEMO.get(term)
    if b is None:
        if len(_DSIR_MEMO) >= 1_000_000:
            _DSIR_MEMO.clear()
        b = int.from_bytes(hashlib.md5(term.encode("utf-8")).digest()[:8],
                           "little") % _DSIR_B
        _DSIR_MEMO[term] = b
    return b


def _dsir_term_buckets(text: str) -> "np.ndarray":
    """Unigram + bigram hashed-feature buckets for one doc (with
    multiplicity), as int64 bucket ids."""
    from .textstats import _tokens

    t = _tokens(text if isinstance(text, str) else "")
    terms = t + [f"{a} {b}" for a, b in zip(t, t[1:])]
    if not terms:
        return np.empty(0, dtype=np.int64)
    return np.fromiter((_dsir_bucket(x) for x in terms), dtype=np.int64,
                       count=len(terms))


def dsir_importance_select(sf_dir: str):
    """DSIR-style data selection via importance resampling (Xie et al.
    2023, "Data Selection for Language Models via Importance Resampling",
    public NeurIPS paper): estimate a target feature distribution p from
    the corpus's own ``lang = 'en'`` slice and a raw distribution q from
    the complement (disjoint estimators, as in the paper: p comes from
    the trusted sample, q from the pool being filtered), then score
    EVERY document by its hashed-n-gram log importance ratio log p/q
    and flag docs where the ratio is positive — the selection step a
    pretraining pipeline runs to up-weight target-domain-like text
    before mixing a crawl source in.

    Ray shape (scales to 10^12 docs):
    1. ONE bucketed count pass builds the 4096-bucket hashed
       unigram+bigram histograms for target and raw simultaneously —
       the output is a <=4096-row aggregate, tiny regardless of corpus
       size, so no second scan and no wide shuffle.
    2. The per-bucket integer micro-nat log-ratio table is computed
       ONCE on the driver with scalar ``math.log`` (bit-stable vs the
       DuckDB oracle's ``ln``; the table has only 4096 entries so float
       kernel choice never touches the corpus path) and broadcast via
       ``ray.put``.
    3. Per-doc scoring inside ``map_batches`` is a pure integer
       table-lookup sum — no floats cross workers, so the result is
       bit-identical at any parallelism / cluster size.

    Output (doc_id, n_terms, logratio_e6, selected)."""
    docs = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    return _dsir_score(docs, _dsir_fit(docs))


def _dsir_fit(docs) -> "np.ndarray":
    """The 4096-entry integer micro-nat log-ratio table from one bucketed
    count pass (see dsir_importance_select for the full contract)."""
    import math

    from .bucketed import bucketed_group_reduce

    B = _DSIR_B

    def cnt_partial(df: pd.DataFrame) -> pd.DataFrame:
        nq = np.zeros(B, dtype=np.int64)
        nt = np.zeros(B, dtype=np.int64)
        for text, lang in zip(df["text"], df["lang"]):
            bs = _dsir_term_buckets(text)
            if not len(bs):
                continue
            cb = np.bincount(bs, minlength=B)
            if lang == "en":
                nt += cb
            else:
                nq += cb
        nz = np.nonzero(nq | nt)[0]
        return pd.DataFrame({"b": nz, "n_raw": nq[nz], "n_tgt": nt[nz]})

    def cnt_reduce(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("b", sort=False)[["n_raw", "n_tgt"]].sum().reset_index()

    counts = bucketed_group_reduce(docs, ["b"], cnt_partial, cnt_reduce, 16).to_pandas()
    nq = np.zeros(B, dtype=np.int64)
    nt = np.zeros(B, dtype=np.int64)
    idx = counts["b"].to_numpy(dtype=np.int64)
    nq[idx] = counts["n_raw"].to_numpy(dtype=np.int64)
    nt[idx] = counts["n_tgt"].to_numpy(dtype=np.int64)
    q_total = int(nq.sum())
    t_total = int(nt.sum())

    lp = np.zeros(B, dtype=np.int64)
    for b in range(B):
        x = (math.log((int(nt[b]) + 1) / (t_total + B))
             - math.log((int(nq[b]) + 1) / (q_total + B))) * 1e6
        lp[b] = int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))
    return lp


def _dsir_score(docs, lp: "np.ndarray"):
    """Per-doc DSIR scoring pass against a fitted log-ratio table."""
    import ray

    lp_ref = ray.put(lp)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        table = ray.get(lp_ref)
        n_out = np.zeros(len(df), dtype=np.int64)
        s_out = np.zeros(len(df), dtype=np.int64)
        for i, text in enumerate(df["text"]):
            bs = _dsir_term_buckets(text)
            if not len(bs):
                continue
            n_out[i] = len(bs)
            s_out[i] = int(table[bs].sum())
        return pd.DataFrame(
            {"doc_id": df["doc_id"].astype("int64"), "n_terms": n_out,
             "logratio_e6": s_out, "selected": (s_out > 0).astype("int64")}
        )

    return docs.map_batches(score, batch_format="pandas")


def range_join_value_bands(sf_dir: str):
    """Range (interval) join: classify every event's value into fixed
    [lo, hi) bands — the banded-dimension join a pricing/latency pipeline
    runs (an operator Ray Data lacks; see relational.range_join_broadcast).
    Returns per-band counts + exact-cents sums (order-free ints)."""
    from .relational import range_join_broadcast

    bands = pd.DataFrame(
        {
            "lo": [0.0, 100.0, 250.0, 500.0, 750.0],
            "hi": [100.0, 250.0, 500.0, 750.0, 10_000.0],
            "band": ["xs", "s", "m", "l", "xl"],
        }
    )

    def to_cents(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["band"].notna()]  # inner-join semantics, like the oracle
        return pd.DataFrame(
            {"band": df["band"], "value_cents": _cents(df["value"])}
        )

    joined = range_join_broadcast(
        _read(sf_dir, "events", ["event_id", "value"]),
        bands, "value", "lo", "hi", ["band"],
    )
    agg = pre_aggregate(
        joined.map_batches(to_cents, batch_format="pandas"),
        ["band"], sums=["value_cents"],
    )

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "band": df["band"],
                "n": df["n"].astype("int64"),
                "sum_value_cents": df["sum_value_cents"].astype("int64"),
            }
        )

    return agg.map_batches(fin, batch_format="pandas")


def dedup_exact(sf_dir: str):
    return exact_dedup_groups(_read(sf_dir, "documents", ["doc_id", "text"]))


def dedup_ngram_jaccard(sf_dir: str):
    """Blocked exact-Jaccard pairs via the LSH-within-block scale path (no
    whole-block-in-one-task quadratic; ngram_jaccard_pairs remains as the
    small-block reference verifier, equality-tested in tests)."""
    return blocked_lsh_jaccard_pairs(
        _read(sf_dir, "documents", ["doc_id", "text", "source"]),
        threshold=JACCARD_THRESHOLD, block_key="source", ngram=1,
    )


def dedup_minhash(sf_dir: str):
    # 3-gram shingles: unigram sets over the synthetic vocab make most docs
    # near-identical (O(n^2) pair explosion at sf0.1); trigrams discriminate
    return minhash_lsh_pairs(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        threshold=0.9, bands=16, ngram=3,
    )


def dedup_clusters(sf_dir: str):
    """Near-dup clusters: LSH-sourced exact-Jaccard pairs -> connected
    components (min-label, pointer-jumping). The pair source is the banded
    scale path — round 1's per-source quadratic block is gone."""
    from .graph import connected_components

    pairs = blocked_lsh_jaccard_pairs(
        _read(sf_dir, "documents", ["doc_id", "text", "source"]),
        threshold=JACCARD_THRESHOLD, block_key="source", ngram=1,
    )
    return connected_components(pairs)


def cluster_canonical_docs(sf_dir: str):
    """Canonical-representative selection per near-dup cluster: within each
    connected component of the near-duplicate graph, elect the longest
    document (ties -> lowest doc_id) as the keeper — the curation step
    that turns cluster IDs into an actual keep/drop decision while
    retaining provenance (every member points at its canonical doc).

    Scale shape: the cluster table is pair-graph-sized (an aggregate, not
    the corpus) and broadcasts once via ray.put; member length lookup
    runs inside map_batches over documents (text never leaves the scan);
    the per-cluster argmax folds over cluster-cardinality rows."""
    import ray as _ray

    cl = dedup_clusters(sf_dir)
    cl = cl.to_pandas() if hasattr(cl, "to_pandas") else cl
    cmap_ref = _ray.put(
        dict(zip((int(d) for d in cl["doc_id"]),
                 (int(c) for c in cl["cluster_id"])))
    )

    def member_len(df: pd.DataFrame) -> pd.DataFrame:
        cmap = _ray.get(cmap_ref)
        m = df["doc_id"].isin(cmap)
        sub = df.loc[m]
        return pd.DataFrame(
            {"doc_id": sub["doc_id"].to_numpy(dtype="int64"),
             "cluster_id": np.fromiter(
                 (cmap[int(d)] for d in sub["doc_id"]), dtype="int64",
                 count=len(sub)),
             "n_chars": sub["n_chars"].to_numpy(dtype="int64")}
        )

    mem = (
        _read(sf_dir, "documents", ["doc_id", "n_chars"])
        .map_batches(member_len, batch_format="pandas")
        .to_pandas()
    )
    mem = mem.sort_values(["cluster_id", "n_chars", "doc_id"],
                          ascending=[True, False, True],
                          kind="stable").reset_index(drop=True)
    canon = mem.groupby("cluster_id", sort=False)["doc_id"].transform("first")
    return pd.DataFrame(
        {"doc_id": mem["doc_id"].astype("int64"),
         "cluster_id": mem["cluster_id"].astype("int64"),
         "canonical_doc_id": canon.astype("int64"),
         "is_canonical": (mem["doc_id"] == canon)}
    )


def tombstone_delete_audit(sf_dir: str):
    """Right-to-be-forgotten propagation audit: apply a deletion-request
    feed to the corpus (broadcast anti-join) and emit the per-source
    compliance evidence — how many documents existed, how many the feed
    tombstoned, how many remain, and an order-free XOR fingerprint of the
    surviving doc_ids that a downstream re-scan can re-derive to prove the
    deletes actually propagated. The feed is simulated deterministically
    (docs whose md5_number_upper(doc_id) % 97 == 0, ~1%) so the oracle can
    reproduce it; in production it arrives as its own table and pass 1
    becomes a read.

    Scale shape: pass 1 collects ONLY the tombstoned ids (a ~1% projection
    of one int column); the id set is broadcast once via ray.put and every
    audit task filters by membership — no shuffle ships the corpus. Pass 2
    pre-aggregates (count, deleted, xor) per source inside each batch, so
    the single bucketed exchange carries one narrow row per (source x
    batch). XOR is the same 63-bit md5 contract as conv_dedup_exact."""
    import hashlib

    import ray

    from .bucketed import bucketed_group_reduce

    def _h64(i: int) -> int:
        return int.from_bytes(
            hashlib.md5(str(i).encode()).digest()[:8], "little"
        )

    def feed(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].astype("int64")
        mask = np.fromiter(
            (_h64(int(i)) % 97 == 0 for i in ids), bool, count=len(ids)
        )
        return pd.DataFrame({"doc_id": ids[mask]})

    deny = (
        _read(sf_dir, "documents", ["doc_id"])
        .map_batches(feed, batch_format="pandas")
        .to_pandas()
    )
    deny_ids = (
        frozenset(int(x) for x in deny["doc_id"]) if not deny.empty else frozenset()
    )
    deny_ref = ray.put(deny_ids)

    def _xor_by_src(src: pd.Series, fp: np.ndarray) -> np.ndarray:
        codes, uniq = pd.factorize(src)
        order = np.argsort(codes, kind="stable")
        sc = codes[order]
        starts = np.flatnonzero(np.r_[True, sc[1:] != sc[:-1]])
        return uniq[sc[starts]], np.bitwise_xor.reduceat(fp[order], starts)

    def audit_partial(df: pd.DataFrame) -> pd.DataFrame:
        deny_set = ray.get(deny_ref)
        ids = df["doc_id"].to_numpy(dtype="int64")
        h = np.fromiter(
            (_h64(int(i)) >> 1 for i in ids), np.int64, count=len(ids)
        )
        deleted = np.fromiter(
            (int(i) in deny_set for i in ids), bool, count=len(ids)
        )
        srcs, fps = _xor_by_src(df["source"], np.where(deleted, 0, h))
        tmp = pd.DataFrame({"source": df["source"], "d": deleted})
        agg = tmp.groupby("source", sort=False)["d"].agg(["count", "sum"])
        agg = agg.reindex(srcs)
        return pd.DataFrame(
            {"source": srcs, "n_docs": agg["count"].to_numpy(dtype="int64"),
             "n_deleted": agg["sum"].to_numpy(dtype="int64"),
             "kept_fp": fps.astype("int64")}
        )

    def audit_reduce(g: pd.DataFrame) -> pd.DataFrame:
        srcs, fps = _xor_by_src(g["source"], g["kept_fp"].to_numpy())
        sums = g.groupby("source", sort=False)[["n_docs", "n_deleted"]].sum()
        sums = sums.reindex(srcs)
        out = pd.DataFrame(
            {"source": srcs,
             "n_docs": sums["n_docs"].to_numpy(dtype="int64"),
             "n_deleted": sums["n_deleted"].to_numpy(dtype="int64"),
             "kept_fp": fps.astype("int64")}
        )
        out["n_kept"] = out["n_docs"] - out["n_deleted"]
        return out[["source", "n_docs", "n_deleted", "n_kept", "kept_fp"]]

    return bucketed_group_reduce(
        _read(sf_dir, "documents", ["doc_id", "source"]),
        ["source"], audit_partial, audit_reduce, n_buckets=32,
    )


def neardup_triangles(sf_dir: str):
    """Triangle census of the near-duplicate graph — the structural signal
    that separates a tight duplicate CLIQUE (template spam: every copy
    pairwise-similar) from a drifting near-dup CHAIN (versioned documents:
    a-b and b-c similar but a-c not). One aggregate row
    (n_vertices, n_edges, n_triangles), all int64.

    Algorithm (public: node-iterator with degree orientation, Schank &
    Wagner 2005): direct every edge from its lower (degree, id) endpoint to
    the higher, so each pivot's out-degree is O(sqrt(m)) and each triangle
    is generated exactly once at its unique two-out-edge node; wedges are
    then closed with a tagged-union co-partition against the undirected
    edge set — no adjacency ever sits on one node.

    Scale shape: 3 narrow bucketed exchanges (degree count; wedge
    generation grouped by pivot; wedge-vs-edge closure keyed on the
    candidate pair), all carrying <=16-byte rows. The degree map of the
    NEAR-DUP graph's vertices (docs with at least one near-dup — a small
    fraction of the corpus by construction) is broadcast once via ray.put;
    if the dup graph ever approached corpus size, that broadcast becomes a
    4th bucketed join."""
    import ray

    from .bucketed import bucketed_group_reduce

    # three consumers below (degrees, orientation, closure edges): pin the
    # pair list once — it is the DEDUP OUTPUT (near-dup pairs only), orders
    # of magnitude smaller than the corpus whose LSH pipeline produces it,
    # so this is a small-result pin, not a corpus materialization
    pairs = blocked_lsh_jaccard_pairs(
        _read(sf_dir, "documents", ["doc_id", "text", "source"]),
        threshold=JACCARD_THRESHOLD, block_key="source", ngram=1,
    ).materialize()

    def deg_partial(df: pd.DataFrame) -> pd.DataFrame:
        v = np.concatenate(
            [df["doc_a"].to_numpy(dtype="int64"),
             df["doc_b"].to_numpy(dtype="int64")]
        )
        ids, cnt = np.unique(v, return_counts=True)
        return pd.DataFrame({"v": ids, "d": cnt.astype("int64")})

    deg = bucketed_group_reduce(
        pairs, ["v"], deg_partial,
        lambda g: g.groupby("v", sort=False)["d"].sum().reset_index(),
        n_buckets=32,
    ).to_pandas()
    if deg.empty:  # no near-dup pairs at all (empty result = columnless frame)
        return pd.DataFrame(
            {"n_vertices": [0], "n_edges": [0], "n_triangles": [0]}
        ).astype("int64")
    n_vertices = len(deg)
    deg_ref = ray.put(dict(zip(deg["v"].astype("int64"), deg["d"].astype("int64"))))

    def orient(df: pd.DataFrame) -> pd.DataFrame:
        dm = ray.get(deg_ref)
        a = df["doc_a"].to_numpy(dtype="int64")
        b = df["doc_b"].to_numpy(dtype="int64")
        da = np.array([dm[x] for x in a], dtype="int64")
        db = np.array([dm[x] for x in b], dtype="int64")
        a_first = (da < db) | ((da == db) & (a < b))
        return pd.DataFrame(
            {"u": np.where(a_first, a, b), "w": np.where(a_first, b, a)}
        )

    directed = pairs.map_batches(orient, batch_format="pandas")

    def wedge_reduce(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, grp in g.groupby("u", sort=False):
            ws = np.sort(grp["w"].to_numpy(dtype="int64"))
            if len(ws) < 2:
                continue
            i, j = np.triu_indices(len(ws), k=1)
            out_a.append(ws[i])
            out_b.append(ws[j])
        if not out_a:
            return pd.DataFrame({"a": np.array([], dtype="int64"),
                                 "b": np.array([], dtype="int64"),
                                 "kind": pd.Series([], dtype="int64")})
        return pd.DataFrame(
            {"a": np.concatenate(out_a), "b": np.concatenate(out_b)}
        ).assign(kind=0).astype({"a": "int64", "b": "int64", "kind": "int64"})

    wedges = bucketed_group_reduce(
        directed, ["u"], lambda df: df, wedge_reduce, n_buckets=32,
    )

    def edge_tag(df: pd.DataFrame) -> pd.DataFrame:
        a = df["doc_a"].to_numpy(dtype="int64")
        b = df["doc_b"].to_numpy(dtype="int64")
        return pd.DataFrame(
            {"a": np.minimum(a, b), "b": np.maximum(a, b)}
        ).assign(kind=1).astype({"a": "int64", "b": "int64", "kind": "int64"})

    tagged = wedges.union(pairs.map_batches(edge_tag, batch_format="pandas"))

    def close_reduce(g: pd.DataFrame) -> pd.DataFrame:
        per = g.groupby(["a", "b"], sort=False)["kind"].agg(["sum", "count"])
        # kind: 0 = wedge, 1 = edge; wedges close iff an edge row shares the key
        n_edges = int(per["sum"].sum())  # each edge key has exactly one kind=1
        tri = int((per["count"] - per["sum"])[per["sum"] > 0].sum())
        return pd.DataFrame({"e": [n_edges], "t": [tri]})

    sums = bucketed_group_reduce(
        tagged, ["a", "b"], lambda df: df, close_reduce, n_buckets=32,
    ).to_pandas()
    return pd.DataFrame(
        {"n_vertices": [int(n_vertices)], "n_edges": [int(sums["e"].sum())],
         "n_triangles": [int(sums["t"].sum())]}
    ).astype("int64")


def dedup_substring(sf_dir: str):
    """Span-level exact dedup: per document, how many of its distinct
    8-token shingles also occur in another document (see
    dedup.substring_dup_stats for the two-exchange scale shape)."""
    from .dedup import substring_dup_stats

    return substring_dup_stats(_read(sf_dir, "documents", ["doc_id", "text"]))


def dedup_paragraphs(sf_dir: str):
    """C4-style repeated-span removal: delete every 8-token block whose
    exact text occurs at >=2 positions corpus-wide, keeping only the first
    occurrence, then re-join each document (see dedup.paragraph_dedup for
    the two-scan / three-exchange scale shape)."""
    from .dedup import paragraph_dedup

    return paragraph_dedup(_read(sf_dir, "documents", ["doc_id", "text"]))


def dedup_edit_verified(sf_dir: str):
    """Character-level verification of the LSH near-dup candidates: exact
    Levenshtein distance per pair (dedup.edit_distance_pairs — candidate
    texts co-partition with pair rows in two bucketed exchanges; only the
    8-byte id set is broadcast)."""
    from .dedup import edit_distance_pairs

    docs = _read(sf_dir, "documents", ["doc_id", "text", "source"])
    pairs = blocked_lsh_jaccard_pairs(
        docs, threshold=JACCARD_THRESHOLD, block_key="source", ngram=1,
    )
    return edit_distance_pairs(
        _read(sf_dir, "documents", ["doc_id", "text"]), pairs
    )


def pagerank_neardup(sf_dir: str):
    """Integer-exact PageRank (damping 0.85, 5 rounds, pico-unit mass) over
    the same LSH-sourced exact-Jaccard near-dup graph dedup_clusters uses —
    centrality within duplicate clusters picks the canonical doc to keep
    (highest-rank representative instead of min-id). Every arithmetic step
    is int64 floor math, so the DuckDB recursive-CTE oracle reproduces the
    ranks bit-for-bit."""
    from .graph import pagerank

    pairs = blocked_lsh_jaccard_pairs(
        _read(sf_dir, "documents", ["doc_id", "text", "source"]),
        threshold=JACCARD_THRESHOLD, block_key="source", ngram=1,
    )
    return pagerank(pairs, iters=5)


def dedup_simhash(sf_dir: str):
    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        simhash_batch, batch_format="pandas"
    )


def _queries_df(sf_dir: str, n: int = 10) -> pd.DataFrame:
    return _read_small(
        sf_dir, "embeddings", ["vec_id", "embedding"],
        filters=[("vec_id", "<", n)],  # pushed into the scan
    ).reset_index(drop=True)


def knn_cosine_topk(sf_dir: str):
    return knn_bruteforce(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"]), _queries_df(sf_dir), k=5
    )


def knn_ivf_topk(sf_dir: str):
    """IVF path at FULL probe (n_probe == n_lists): exact by construction, so
    the brute-force cosine SQL is its oracle — the driver now hash-checks the
    whole IVF machinery (binning, probe sets, partial top-k merge). Partial-
    probe recall behavior is pinned separately in tests/test_ivf_recall.py."""
    return knn_ivf(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"]), _queries_df(sf_dir),
        k=5, n_lists=16, n_probe=16,
    )


def knn_pq_topk(sf_dir: str):
    """Product-quantization ANN (Jegou et al. 2011): corpus vectors become
    m=16 uint8 codes (32x smaller than the float64 rows), queries stay exact,
    similarity is the ADC table-lookup sum — the memory-compression scale
    path beside IVF's work-pruning one. Codebooks train on a deterministic
    driver-side sample (vec_id < 2048); rows-only oracle (k-means codebook
    training is not SQL-expressible, same class as kmeans_embeddings), with
    recall-vs-exact and determinism pinned in tests/test_pq.py."""
    from .similarity import knn_pq

    train = _read_small(
        sf_dir, "embeddings", ["vec_id", "embedding"],
        filters=[("vec_id", "<", 2048)],
    ).reset_index(drop=True)
    return knn_pq(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"]),
        _queries_df(sf_dir), train, k=5,
    )


def embed_neardup(sf_dir: str):
    """Embedding near-dup pairs via the banded-LSH candidate route (8 bands x
    8 md5 hyperplane bits, integer-exact signatures) with exact float64
    cosine verify inside buckets — the linear scale shape (VERDICT r2 #1);
    the oracle reproduces the banding bit-for-bit in SQL, so the candidate
    gate is part of the operator's defined semantics (same contract style as
    knn_ivf/dedup_minhash). The exhaustive block product survives as the
    bands=None verifier path, pinned in tests/test_embed_neardup.py."""
    ds = embedding_neardup_pairs(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"]), NEARDUP_COS, modulus=5
    )

    def drop_sim(df: pd.DataFrame) -> pd.DataFrame:
        return df[["a", "b"]]

    out = ds.map_batches(drop_sim, batch_format="pandas").to_pandas()
    if not len(out.columns):
        # Ray 2.49 Dataset.to_pandas() returns a COLUMNLESS frame for 0-row
        # results; the driver compares column names, so hand it the typed
        # empty directly (the pair list is aggregate-sized — a near-dup rate,
        # not corpus data — so driver-side conversion is safe at any scale)
        out = pd.DataFrame(
            {"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64")}
        )
    return out


# ---------------------------------------------------------------------------
# E7 broadcast lookup, wordcount, distinct, union
# ---------------------------------------------------------------------------

def e7_vendor_lookup(sf_dir: str):
    """E7 generalization (Worker.cs:299-364): broadcast small-side
    exact-equality lookup — tiny (text -> vendor) dict shipped once via
    ray.put, matched inside map_batches (no shuffle)."""
    # predicate pushed into the parquet read: only the <5 rows ever leave
    # storage (round 1 read the FULL documents table to the driver here)
    small = _read_small(
        sf_dir, "documents", ["doc_id", "text"], filters=[("doc_id", "<", 5)]
    )
    lut = (
        small.groupby("text", sort=False)["doc_id"].min().reset_index()
    )
    lookup = {t: f"V{k}" for t, k in zip(lut["text"], lut["doc_id"])}
    import ray

    ref = ray.put(lookup)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        lu = ray.get(ref)
        v = df["text"].map(lu)
        out = pd.DataFrame({"doc_id": df["doc_id"], "vendor": v})
        return out[out["vendor"].notna()]

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        fn, batch_format="pandas"
    )


def wordcount_top20(sf_dir: str):
    """Global token frequency top-20 — the canonical combiner-then-tiny-shuffle
    shape: per-batch Counter partials, bucketed sum, deterministic top-k."""
    from .textstats import _tokens

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        c: Counter = Counter()
        for s in df["text"]:
            c.update(_tokens(s))
        return pd.DataFrame(
            {"token": list(c.keys()), "n": np.fromiter(c.values(), dtype="int64")}
        )

    from .bucketed import bucketed_group_reduce

    counts = bucketed_group_reduce(
        _read(sf_dir, "documents", ["text"]),
        ["token"],
        partial,
        lambda g: g.groupby("token", sort=False)["n"].sum().reset_index(),
        n_buckets=64,
    )
    top = topk(counts, by="n", k=20, descending=True, tiebreak="token")
    return top[["token", "n"]].astype({"n": "int64"})


def cooccur_top20(sf_dir: str):
    """Top-20 co-occurring token pairs within a ±2-token window (the PMI /
    phrase-mining precursor). Unordered pairs are canonicalized
    lexicographically and serialized as one 'w1 w2' key so the combiner and
    the deterministic top-k reuse the wordcount shape: per-batch numpy pair
    extraction + Counter partials, bucketed sum, k rows per batch leave the
    merge. No shuffle ever carries raw token streams."""
    from collections import Counter

    from .bucketed import bucketed_group_reduce
    from .textstats import _tokens

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c: Counter = Counter()
        for s in df["text"]:
            toks = _tokens(s) if isinstance(s, str) else []
            n = len(toks)
            for d in (1, 2):
                if n <= d:
                    continue
                a = toks[:-d]
                b = toks[d:]
                c.update(
                    (x + " " + y) if x <= y else (y + " " + x)
                    for x, y in zip(a, b)
                )
        return pd.DataFrame(
            {"pair": list(c.keys()), "n": np.fromiter(c.values(), dtype="int64")}
        )

    counts = bucketed_group_reduce(
        _read(sf_dir, "documents", ["text"]),
        ["pair"],
        partial,
        lambda g: g.groupby("pair", sort=False)["n"].sum().reset_index(),
        n_buckets=64,
    )
    top = topk(counts, by="n", k=20, descending=True, tiebreak="pair")
    return top[["pair", "n"]].astype({"n": "int64"})


def bm25_topk(sf_dir: str, k: int = 10):
    """BM25 retrieval top-k (Robertson-Sparck Jones, public): rank documents
    for each of the 3 globally most-frequent tokens by the BM25 term score
    tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)) with k1=1.2, b=0.75 — the
    relevance pass a retrieval/decontamination pipeline runs against a
    corpus-scale inverted index. Within one term the IDF factor is constant
    and therefore rank-invariant, so the hashed output carries the exact
    integers (term, rank, doc_id, tf, dl) and no float ever crosses the
    oracle: the ordering key is the single fixed-IEEE division
    (10*tf*S) / (10*tf*S + 3*S + 9*dl*N) of exact ints (< 2^53 up to ~10^12
    corpus tokens), identical bit-for-bit in numpy and DuckDB, ties broken
    by doc_id.

    Scale shape: pass 1 = wordcount-style bucketed combiner for the query
    terms plus one tiny (S, N) aggregate; pass 2 = stateless map over the
    corpus with the 3 terms in-closure, emitting at most k rows per (term,
    batch) — batch-local top-k is safe because the score is monotone in tf
    and antitone in dl, so a locally pruned doc can never enter the global
    top-k. The global merge sees <= 3*k*n_batches narrow rows. Raw text
    never shuffles."""
    from collections import Counter

    from .bucketed import bucketed_group_reduce
    from .relational import topk as _topk
    from .textstats import _tokens

    def wc_partial(df: pd.DataFrame) -> pd.DataFrame:
        c: Counter = Counter()
        for t in df["text"]:
            if isinstance(t, str):
                c.update(_tokens(t))
        return pd.DataFrame(
            {"token": list(c.keys()), "n": np.fromiter(c.values(), dtype="int64")}
        )

    # vocab-sized result: materialize so terms + S come from ONE combine pass
    counts = bucketed_group_reduce(
        _read(sf_dir, "documents", ["text"]),
        ["token"], wc_partial,
        lambda g: g.groupby("token", sort=False)["n"].sum().reset_index(),
        n_buckets=64,
    ).materialize()
    S = int(counts.sum("n"))
    # N = docs with >=1 token <=> trimmed text nonempty (no tokenize needed)
    N = int(
        _read(sf_dir, "documents", ["text"])
        .map_batches(
            lambda df: pd.DataFrame(
                {"c": [int((df["text"].fillna("").str.strip() != "").sum())]}
            ),
            batch_format="pandas",
        )
        .sum("c")
    )
    terms = tuple(_topk(counts, by="n", k=3, tiebreak="token")["token"])

    def score_partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for doc_id, text in zip(df["doc_id"], df["text"]):
            toks = _tokens(text) if isinstance(text, str) else []
            if not toks:
                continue
            dl = len(toks)
            c = Counter(toks)
            for t in terms:
                tf = c.get(t, 0)
                if tf:
                    rows.append((t, int(doc_id), tf, dl))
        out = pd.DataFrame(rows, columns=["term", "doc_id", "tf", "dl"])
        if out.empty:
            return out.astype({"doc_id": "int64", "tf": "int64", "dl": "int64"})
        num = 10 * out["tf"].to_numpy(dtype="int64") * S
        den = num + 3 * S + 9 * out["dl"].to_numpy(dtype="int64") * N
        out["sc"] = num.astype("float64") / den.astype("float64")
        out = out.sort_values(
            ["term", "sc", "doc_id"], ascending=[True, False, True],
            kind="stable",
        )
        return out.groupby("term", sort=False).head(k)

    small = (
        _read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(score_partial, batch_format="pandas")
        .to_pandas()
    )
    small = small.sort_values(
        ["term", "sc", "doc_id"], ascending=[True, False, True], kind="stable"
    )
    small = small.groupby("term", sort=False).head(k).reset_index(drop=True)
    small["rank"] = small.groupby("term", sort=False).cumcount() + 1
    return small[["term", "rank", "doc_id", "tf", "dl"]].astype(
        {"rank": "int64", "doc_id": "int64", "tf": "int64", "dl": "int64"}
    )


def distinct_brand_type(sf_dir: str):
    """DISTINCT via the bucketed combiner (batch-local dedup -> per-bucket dedup)."""
    from .bucketed import bucketed_group_reduce

    keys = ["p_brand", "p_type"]
    return bucketed_group_reduce(
        _read(sf_dir, "part", keys),
        keys,
        lambda df: df.drop_duplicates(keys),
        lambda g: g.drop_duplicates(keys),
        n_buckets=16,
    )


def median_value_per_type(sf_dir: str):
    """Exact distributed median via histogram sketch: per-batch (type, cents)
    counts -> bucketed count merge -> tiny per-type cumulative walk. The
    shuffle carries distinct-value counts, never rows — the scalable exact
    quantile shape when the value domain is bounded (here: cents)."""
    from .bucketed import bucketed_group_reduce

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        t = pd.DataFrame(
            {"event_type": df["event_type"], "cents": _cents(df["value"])}
        )
        return (
            t.groupby(["event_type", "cents"], sort=False)
            .size().rename("n").reset_index()
        )

    counts = bucketed_group_reduce(
        _read(sf_dir, "events", ["event_type", "value"]),
        ["event_type", "cents"],
        hist,
        lambda g: g.groupby(["event_type", "cents"], sort=False)["n"].sum().reset_index(),
        n_buckets=32,
    )

    def per_type_median(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("cents", kind="stable")
        total = int(g["n"].sum())
        k = (total + 1) // 2  # quantile_disc(0.5): lower-median element
        cum = g["n"].cumsum()
        med = int(g.loc[cum >= k, "cents"].iloc[0])
        return pd.DataFrame(
            {"event_type": [g["event_type"].iloc[0]], "median_cents": [med]}
        )

    return counts.groupby("event_type", num_partitions=join_partitions(cap=8)).map_groups(
        per_type_median, batch_format="pandas"
    )


def mad_value_per_type(sf_dir: str):
    """Robust dispersion per event type: exact median absolute deviation in
    two histogram passes. Pass 1 is the existing exact-median sketch (its
    result is an aggregate — one row per event type — so collecting it to
    the driver and broadcasting the tiny dict is the right scale shape, like
    every small-side lookup here). Pass 2 re-streams the events with the
    per-type median subtracted, building the |deviation| histogram with the
    same bucketed count-merge; the shuffle again carries distinct-value
    counts, never rows."""
    from .bucketed import bucketed_group_reduce

    med_df = median_value_per_type(sf_dir).to_pandas()
    med = dict(zip(med_df["event_type"], med_df["median_cents"].astype("int64")))

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        c = _cents(df["value"])
        m = df["event_type"].map(med).astype("int64")
        t = pd.DataFrame(
            {"event_type": df["event_type"], "dev": (c - m).abs().astype("int64")}
        )
        return (
            t.groupby(["event_type", "dev"], sort=False)
            .size().rename("n").reset_index()
        )

    counts = bucketed_group_reduce(
        _read(sf_dir, "events", ["event_type", "value"]),
        ["event_type", "dev"],
        hist,
        lambda g: g.groupby(["event_type", "dev"], sort=False)["n"].sum().reset_index(),
        n_buckets=32,
    )

    def per_type(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("dev", kind="stable")
        total = int(g["n"].sum())
        k = (total + 1) // 2  # quantile_disc(0.5) lower-median element
        cum = g["n"].cumsum()
        madv = int(g.loc[cum >= k, "dev"].iloc[0])
        et = g["event_type"].iloc[0]
        return pd.DataFrame(
            {"event_type": [et], "median_cents": [int(med[et])],
             "mad_cents": [madv]}
        )

    return counts.groupby(
        "event_type", num_partitions=join_partitions(cap=8)
    ).map_groups(per_type, batch_format="pandas")


def distinct_users_per_type(sf_dir: str):
    """COUNT(DISTINCT user) per event_type: batch-local dedup -> bucketed
    (type, user) dedup -> small per-type count."""
    from .bucketed import bucketed_group_reduce

    keys = ["event_type", "user_id"]
    pairs = bucketed_group_reduce(
        _read(sf_dir, "events", keys),
        keys,
        lambda df: df.drop_duplicates(keys),
        lambda g: g.drop_duplicates(keys),
        n_buckets=32,
    )
    agg = pre_aggregate(pairs, ["event_type"], counts=True)

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"event_type": df["event_type"], "n_users": df["n"].astype("int64")}
        )

    return agg.map_batches(fin, batch_format="pandas")


def asof_purchase_view(sf_dir: str):
    """As-of join: each purchase matched to the user's latest strictly-prior
    view event (custom operator; DuckDB ASOF JOIN oracle)."""
    from .relational import asof_join_by_key

    src = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def pick(kind):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            return df[df["event_type"] == kind][["event_id", "ts", "user_id"]]

        return fn

    purchases = src.map_batches(pick("purchase"), batch_format="pandas")
    views = src.map_batches(pick("view"), batch_format="pandas")
    joined = asof_join_by_key(
        purchases, views, key="user_id", on="ts",
        left_cols=["event_id"], right_col="event_id", right_out="view_event_id",
    )

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_id": df["event_id"].astype("int64"),
                "view_event_id": df["view_event_id"].fillna(-1).astype("int64"),
            }
        )

    return joined.map_batches(fin, batch_format="pandas")


def union_clicks_purchases(sf_dir: str):
    """Set op: two filtered streams unioned (Dataset.union, no shuffle)."""

    def pick(kind):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            return df[df["event_type"] == kind][["event_id", "event_type"]]

        return fn

    src = _read(sf_dir, "events", ["event_id", "event_type"])
    return src.map_batches(pick("click"), batch_format="pandas").union(
        src.map_batches(pick("purchase"), batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# F5/F7 NER over documents (deterministic tagger; non-SQL -> rows-only)
# ---------------------------------------------------------------------------

def sample_hash_split(sf_dir: str):
    """Deterministic content-hash sampling (train/val split): keep the ~10%
    of docs whose md5(doc_id) bucket < 10. Pure filter — no shuffle, stable
    across cluster sizes and re-runs (unlike random_sample)."""
    import hashlib

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        h = df["doc_id"].map(
            lambda i: int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
        )
        return df.loc[h % 100 < 10, ["doc_id"]]

    return _read(sf_dir, "documents", ["doc_id"]).map_batches(
        fn, batch_format="pandas"
    )


def kmeans_embeddings(
    sf_dir: str, k: int = 8, iters: int = 5,
    checkpoint_dir: "str | None" = "auto",
):
    """Mini k-means over the embedding column: centroids broadcast per
    iteration (ray.put once, read per batch), assignment + per-cluster
    partial sums inside pyarrow map_batches (zero-copy list-buffer reshape,
    single BLAS matmul per batch, no per-row Python), tiny k-row driver-side
    centroid update per round. Deterministic init (first k by vec_id).

    An iterative operator re-reads its input once per pass (init + iters +
    assign), so by default the pruned 2-column projection is persisted ONCE
    to scratch as partitioned parquet (crash-safe, keyed to the input files'
    path+size+mtime — see checkpoint.py) and every pass streams the
    pre-split intermediate: no per-pass shuffle, no corpus-sized
    materialize. This is the streaming-safe equivalent of Spark's .cache()
    for the 100-TB shape — scratch disk holds the projection, the object
    store holds only in-flight blocks. checkpoint_dir="auto" uses the
    system temp dir; pass an explicit path for cluster scratch, or None to
    force re-reading the source every pass."""
    import ray

    from .similarity import _arrow_raw_matrix

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    if checkpoint_dir is not None:
        import tempfile

        from .checkpoint import (
            checkpointed_parquet,
            dataset_input_files,
            stage_fingerprint,
        )

        if checkpoint_dir == "auto":
            checkpoint_dir = os.path.join(
                tempfile.gettempdir(), "rayextract_ckpt", "kmeans_emb"
            )
        files = dataset_input_files(emb)
        stat = []
        for f in files:  # same-path rewrites must invalidate the checkpoint
            try:
                st = os.stat(f)
                stat.append((f, st.st_size, st.st_mtime_ns))
            except OSError:
                stat.append((f, -1, -1))
        fp = stage_fingerprint(
            {"stage": "kmeans_emb_projection", "files_stat": stat}, files
        )
        # checkpoint the FANNED-OUT projection: the published dir then has
        # one file per block, so every later pass reads pre-split with no
        # repartition exchange at all
        src = _fan_out(emb)  # bind before rebinding emb
        emb = checkpointed_parquet(lambda: src, checkpoint_dir, fp)
    else:
        # split a single-row-group read so the per-pass maps use the whole
        # pool (guarded no-op when input blocks abound)
        emb = _fan_out(emb)

    def pick_init(t):
        import pyarrow.compute as pc

        return t.filter(pc.less(t["vec_id"], k))  # vectorized mask, not per-row

    init = (
        emb.map_batches(pick_init, batch_format="pyarrow")
        .to_pandas()
        .sort_values("vec_id")
    )
    centroids = np.vstack([np.asarray(v, dtype=np.float64) for v in init["embedding"]])

    def _nearest(m: np.ndarray, c: np.ndarray) -> np.ndarray:
        # argmin |x-c|^2 == argmin (|c|^2 - 2 x.c): one BLAS matmul, no
        # n x k x d broadcast temp
        return ((c * c).sum(axis=1)[None, :] - 2.0 * (m @ c.T)).argmin(axis=1)

    for _ in range(iters):
        ref = ray.put(centroids)

        def partial_sums(t) -> pd.DataFrame:
            c = ray.get(ref)
            _, m = _arrow_raw_matrix(t)
            assign = _nearest(m, c)
            counts = np.bincount(assign, minlength=len(c))
            sums = np.zeros((len(c), m.shape[1]), dtype=np.float64)
            np.add.at(sums, assign, m)  # vectorized scatter-add per cluster
            nz = np.flatnonzero(counts)
            return pd.DataFrame(
                {"cluster": nz.astype("int64"),
                 "n": counts[nz].astype("int64"),
                 "vec_sum": [sums[i].tobytes() for i in nz]}
            )

        # k rows per batch cross the wire; the driver folds a few KB.
        parts = emb.map_batches(partial_sums, batch_format="pyarrow").to_pandas()
        new = centroids.copy()
        for ci, g in parts.groupby("cluster"):
            tot = np.sum(
                [np.frombuffer(b, dtype=np.float64) for b in g["vec_sum"]], axis=0
            )
            new[ci] = tot / g["n"].sum()
        centroids = new

    ref = ray.put(centroids)

    def assign_fn(t) -> pd.DataFrame:
        c = ray.get(ref)
        ids, m = _arrow_raw_matrix(t)
        return pd.DataFrame(
            {"vec_id": ids.astype("int64"),
             "cluster": _nearest(m, c).astype("int64")}
        )

    return emb.map_batches(assign_fn, batch_format="pyarrow")


def embedding_pca_project(sf_dir: str, n_components: int = 4):
    """Distributed PCA of the embedding table — the dimensionality-reduction
    preprocessing step an embedding-heavy pipeline runs before clustering /
    visualization / cheap prefilters. One streaming pass aggregates exact
    INTEGER second moments (each batch ships one ~32 KB partial: e6-quantized
    outer-product sums + dim sums + count; int sums are order-free, so the
    covariance is bit-identical at any parallelism), the 64x64 eigh runs on
    the driver, and a second pass projects per row with broadcast components.
    Rows-only oracle (eigendecomposition is a numeric model fit, same class
    as kmeans); orthonormality / variance-ordering / determinism /
    reconstruction pinned in tests/test_pca.py."""
    from .similarity import pca_fit, pca_project

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    mean, w, _ = pca_fit(emb, n_components=n_components)
    return pca_project(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"]), mean, w
    )


def f5_person_ner(sf_dir: str):
    from .ner import get_person_name

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        up = df["text"].str.upper()
        return pd.DataFrame({"doc_id": df["doc_id"], "person": up.map(get_person_name)})

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        fn, batch_format="pandas"
    )


def ner_model_extract(sf_dir: str):
    """Model-backed NER (round 4 — the Stanford-CRF accuracy-class analog,
    EntityRecognizer.cs:50-65): an averaged structured perceptron with
    Viterbi BIO decode, trained deterministically once per actor (D4), tags
    every document's normalized text and emits the first PERSON and ORG
    surface. Rows-only oracle: learned-weight inference is model scoring,
    not SQL-expressible; weight determinism + span accuracy are pinned by
    tests/test_ner_model.py instead."""
    from .multimodal import decode_stage
    from .ner_model import PerceptronNerTagger

    # Hosted as a per-worker-cached task-pool stage (decode_stage default):
    # the ~0.4s deterministic training runs once per worker PROCESS and the
    # frozen weights then serve every batch, task, and repeat run — the
    # same load-once semantics as the old (1, 24) actor pool without paying
    # its ramp-from-one on every Dataset execution (which dominated the
    # query wall at sf0.1). Task pools also can't deadlock the streaming
    # executor the way a fixed actor floor on a small cluster did.
    return decode_stage(
        _fan_out(_read(sf_dir, "documents", ["doc_id", "text"])),
        PerceptronNerTagger,
        batch_size=512,
        batch_format="pandas",
    )


def f6_org_ner(sf_dir: str):
    """F6 — first organization span (EntityRecognizer.cs:72-91 analog)."""
    from .ner import get_organization_name

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        up = df["text"].str.upper()
        return pd.DataFrame(
            {"doc_id": df["doc_id"], "org": up.map(get_organization_name)}
        )

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        fn, batch_format="pandas"
    )


def f7_annotations(sf_dir: str):
    """F7 — inline-tagged debug annotation (EntityRecognizer.cs:67-70)."""
    from .ner import get_annotations

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        up = df["text"].str.upper()
        return pd.DataFrame(
            {"doc_id": df["doc_id"], "annotated": up.map(get_annotations)}
        )

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        fn, batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# Multimodal: opaque binary payload columns (decode stubbed; plumbing real)
# ---------------------------------------------------------------------------

def multimodal_decode(sf_dir: str):
    """documents -> media(binary payload + typed meta) -> actor-pool decode;
    oracle checks the payload accounting (id, kind, byte length)."""
    from .multimodal import docs_to_media, media_features

    feats = media_features(
        docs_to_media(_fan_out(_read(sf_dir, "documents", ["doc_id", "text"])))
    )

    def drop_feature(t):
        return t.select(["media_id", "kind", "n_bytes"])

    return feats.map_batches(drop_feature, batch_format="pyarrow")


def multimodal_frame_features(sf_dir: str):
    """Video rows -> sampled frames (flat-map) -> per-frame features,
    UPGRADED to the real codec in round 5: per document a genuine YUV4MPEG2
    container is synthesized from integer arithmetic on doc_id
    (``synth_y4m_batch``), then the ``Y4mFrameSampler`` actor stage parses
    the stream (header tokens, FRAME markers, mono luma planes) and emits
    every 2nd frame as a row with integer-exact per-frame stats — the same
    flat-map cardinality semantics as before (1 clip -> N frame rows,
    Convert.cs:9-35 analog) but over a real parser, which also upgrades the
    oracle from rows-only to a full value hash."""
    from .multimodal import synth_y4m_batch, y4m_sample_frames

    media = _fan_out(_read(sf_dir, "documents", ["doc_id"])).map_batches(
        synth_y4m_batch, batch_format="pyarrow"
    )
    return y4m_sample_frames(media, stride=2)


def video_y4m_decode(sf_dir: str):
    """REAL video codec under the driver gate (round 5 — retires the last
    codec stub, same playbook as audio_wav_decode / image_bmp_decode): per
    document a genuine YUV4MPEG2 Cmono container is synthesized from integer
    arithmetic on doc_id (``synth_y4m_batch``), then DECODED by the pure-
    python Y4M parser in an actor pool (``Y4mDecoder``: stream header,
    FRAME markers, luma planes -> pixels), emitting integer-exact clip
    stats. The oracle regenerates the same pixel values arithmetically —
    any container bug (header tokens, frame boundaries, plane size) breaks
    the value hash."""
    from .multimodal import synth_y4m_batch, y4m_features

    media = _fan_out(_read(sf_dir, "documents", ["doc_id"])).map_batches(
        synth_y4m_batch, batch_format="pyarrow"
    )
    return y4m_features(media)


def audio_wav_decode(sf_dir: str):
    """REAL audio codec under the driver gate (round 3 — upgrades the
    codec-stub weak row): per document, a genuine RIFF/WAV PCM16 container
    is synthesized from integer arithmetic on doc_id (``synth_wav_batch``),
    then DECODED by the stdlib ``wave`` parser inside an actor pool
    (``WavPcmDecoder``: container header + frame bytes -> samples), emitting
    integer-exact clip stats. The oracle regenerates the same sample values
    arithmetically — any container/codec bug (header fields, endianness,
    frame count) breaks the value hash."""
    from .multimodal import synth_wav_batch, wav_features

    media = _fan_out(_read(sf_dir, "documents", ["doc_id"])).map_batches(
        synth_wav_batch, batch_format="pyarrow"
    )
    return wav_features(media)


def image_bmp_decode(sf_dir: str):
    """REAL image codec under the driver gate (round 4 — retires the last
    honest codec stub, same playbook as audio_wav_decode): per document a
    genuine uncompressed 24-bit BMP container is synthesized from integer
    arithmetic on doc_id (``synth_bmp_batch`` — widths 8..16 cover every
    4-byte row-padding case), then DECODED by the pure-numpy BMP parser in
    an actor pool (``BmpDecoder``: file header, DIB header, row order,
    stride padding, BGR bytes -> pixels), emitting integer-exact image
    stats. The oracle regenerates the same pixel values arithmetically —
    any container bug (offset, stride, row order, channel replication)
    breaks the value hash."""
    from .multimodal import bmp_features, synth_bmp_batch

    media = _fan_out(_read(sf_dir, "documents", ["doc_id"])).map_batches(
        synth_bmp_batch, batch_format="pyarrow"
    )
    return bmp_features(media)


def image_ocr_extract(sf_dir: str):
    """OCR analog under the full value-hash gate (round 5 — closes the
    reference's core-competency gap: Tesseract reading text out of pixels,
    OCR/Image.cs:20-66, Worker.cs:144-200). Per document a deterministic
    invoice-ish string is RENDERED into a genuine 24-bit BMP with an
    original 5x7 bitmap font plus one deterministic noise pixel per glyph,
    then an actor-pool decoder reads the text back OUT of the pixels
    (container parse -> binarize -> row-band + blank-column segmentation ->
    nearest-template Hamming match; the noise makes exact equality fail, so
    the argmin is load-bearing). The oracle regenerates the expected string
    arithmetically — any font, layout, segmentation, or matcher bug breaks
    the value hash."""
    from .ocr import ocr_extract, synth_ocr_batch

    media = _fan_out(_read(sf_dir, "documents", ["doc_id"])).map_batches(
        synth_ocr_batch, batch_format="pyarrow"
    )
    return ocr_extract(media)


def gazetteer_match_counts(sf_dir: str):
    """Gazetteer keyword tagging over documents: per-term substring counts
    for a fixed multi-phrase term list, folded to (doc_id, n_matches,
    n_terms) — the reference's single-SearchKey gate
    (TextExtraction/Worker.cs:117-143) generalized to the FlashText/
    Aho-Corasick class of operator. Two kernels share one contract
    (gazetteer.py): C-level per-term scans below 64 terms, a one-pass
    Aho-Corasick automaton above (the only shape that survives 10k-term
    gazetteers); equality is property-tested. Pure per-batch map — zero
    shuffle, streams at any corpus size; border-free terms make the
    replace()-count oracle exact."""
    from .gazetteer import match_counts_batch

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        match_counts_batch, batch_format="pandas"
    )


def dedup_simhash_pairs(sf_dir: str):
    """SimHash near-dup pairs via 16-bit band blocking (rows-only)."""
    from .dedup import simhash_neardup_pairs

    return simhash_neardup_pairs(
        _read(sf_dir, "documents", ["doc_id", "text"]), max_hamming=3
    )


def _dup_drop_ids(docs) -> "set[int]":
    """doc_ids to DROP for exact dedup (every member of a duplicate group
    except the min). Computed distributed (hash partials -> bucketed
    reduce); only the drop list — O(duplicate docs), not O(corpus) — reaches
    the driver. PARTITIONING ASSUMPTION: the duplicate fraction is
    broadcastable (the common case for web corpora); for corpora that are
    MOSTLY duplicates, apply keepers with a hash join instead."""
    import hashlib

    from .bucketed import bucketed_group_reduce

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = df["text"].map(lambda s: hashlib.md5(s.encode("utf-8")).hexdigest())
        return pd.DataFrame({"text_hash": h, "doc_id": df["doc_id"]})

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        keep = g.groupby("text_hash", sort=False)["doc_id"].transform("min")
        return g.loc[g["doc_id"] != keep, ["doc_id"]]

    drops = bucketed_group_reduce(docs, ["text_hash"], partial, reduce, 64)
    df = drops.to_pandas()
    if "doc_id" not in df.columns:  # fully duplicate-free corpus: empty frame
        return set()
    return set(df["doc_id"].astype("int64"))


def dedup_apply_exact(sf_dir: str):
    """Materialize the DEDUPLICATED corpus (the operator users actually run):
    exact-dup drop list broadcast, anti-semi-join inside map_batches — text
    never enters a shuffle and the corpus streams straight through."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return broadcast_semi_join(docs, _dup_drop_ids(docs), "doc_id", anti=True)


def curate_corpus(sf_dir: str):
    """Composite training-data curation pipeline — the end-to-end shape a
    100 TB corpus pass runs: Gopher-style quality gate ∧ exact-dedup keeper
    ∧ deterministic content-hash train split (80%). One streaming filter
    pass over the corpus (quality + split vectorized per batch, dedup via
    the broadcast drop list); output = surviving (doc_id, n_tokens)."""
    import hashlib

    from .textstats import STOPWORDS, _tokens

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    import ray

    drop_ref = ray.put(_dup_drop_ids(docs))

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        drops = ray.get(drop_ref)
        toks = df["text"].map(_tokens)
        n = toks.map(len).astype("int64")
        stop = set(STOPWORDS)
        stop_cnt = toks.map(lambda t: sum(1 for w in t if w in stop)).astype("int64")
        maxw = toks.map(lambda t: max((len(w) for w in t), default=0)).astype("int64")
        sym = df["text"].str.count(r"[#@$%^*=<>{}\[\]\\]").astype("int64")
        chars = df["text"].str.len().astype("int64")
        quality = (
            (n >= 5) & (n <= 10000) & (stop_cnt >= 1) & (maxw <= 30)
            & (sym * 10 < chars.clip(lower=1) * 3)
        )
        keeper = ~df["doc_id"].isin(drops)
        split = df["doc_id"].map(
            lambda i: int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 100 < 80
        )
        keep = (quality & keeper & split).to_numpy()
        return pd.DataFrame(
            {"doc_id": df["doc_id"].astype("int64"), "n_tokens": n}
        )[keep]

    return docs.map_batches(fn, batch_format="pandas")


# ---------------------------------------------------------------------------
# Flagship transcript pipeline over documents (rows-only; full oracle lives
# in tests/test_pipeline_golden.py against the pure-Python oracle)
# ---------------------------------------------------------------------------

_TR_FIRST = ("MARY", "JOHN", "ALICE", "ROBERT", "LINDA")
_TR_LAST = ("SMITH", "JONES", "TAYLOR", "BROWN", "WILSON")


def _docs_to_transcripts(sf_dir: str):
    """Treat each document as a conversation (flat-map):

    - turn 0: deterministic doc_id-derived INVOICE header that exercises the
      invoice gate + extractors E3-E6 end to end,
    - turn 1 (every 3rd doc): PATIENT NAME/DOB line exercising the patient
      gate + E1/E2 (person NER + birthdate),
    - turns 2..: the document text in 12-token chunks (gate-neutral by
      corpus construction — the vocabulary contains no SearchKey substring).

    Both the header synthesis and the whole extraction are reproduced by the
    ``transcript_extract`` DuckDB oracle, so the flagship pipeline's fold is
    value-hash-checked by the driver, not just row-counted.
    """
    import pyarrow as pa

    def explode(t: pa.Table) -> pa.Table:
        conv_ids, turn_idxs, texts = [], [], []

        def add(conv, idx, txt):
            conv_ids.append(conv)
            turn_idxs.append(idx)
            texts.append(txt)

        for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            conv = f"doc-{doc_id:08d}"
            mm, dd, yy = doc_id % 12 + 1, doc_id % 28 + 1, 1990 + doc_id % 30
            amt = f"{doc_id % 900 + 100}.25"
            add(conv, 0,
                f"INVOICE 1{doc_id:05d} DATE {mm:02d}/{dd:02d}/{yy} "
                f"REFERENCE AB{doc_id}X TOTAL ${amt}")
            if doc_id % 3 == 0:
                name = f"{_TR_FIRST[(doc_id // 3) % 5]} {_TR_LAST[(doc_id // 7) % 5]}"
                pm, pd_, py = doc_id % 12 + 1, doc_id % 25 + 1, 1975 + doc_id % 40
                add(conv, 1,
                    f"PATIENT NAME {name} DOB {pm:02d}/{pd_:02d}/{py}")
            toks = text.split()
            chunks = [" ".join(toks[i : i + 12]) for i in range(0, len(toks), 12)] or [""]
            for i, c in enumerate(chunks):
                add(conv, i + 2, c)
        return pa.table(
            {
                "conv_id": pa.array(conv_ids, pa.string()),
                "turn_idx": pa.array(turn_idxs, pa.int32()),
                "text": pa.array(texts, pa.string()),
            }
        )

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        explode, batch_format="pyarrow"
    )


def conv_dedup_exact(sf_dir: str):
    """Conversation-level EXACT dedup over the transcript payload (round 4 —
    dedup on the north-rule table itself, not just documents): every turn
    contributes a 63-bit term hash ``md5_number(f"{turn_idx}:{text}") >> 1``;
    a conversation's fingerprint is the XOR of its term hashes — order-FREE
    to combine (partition/batch invariant, no sort-by-turn exchange needed)
    yet order-SENSITIVE in value because turn_idx is baked into each term.
    Two narrow bucketed exchanges: XOR-combine per conv_id, then group by
    fingerprint -> (fp, conv_id=min, n_copies). Turn texts cross the wire
    only as 8-byte terms; no conversation is ever materialized whole."""
    return _conv_fingerprint_dedup(_docs_to_transcripts(sf_dir))


def _conv_fingerprint_dedup(turns) -> "object":
    """Core of conv_dedup_exact over any (conv_id, turn_idx, text) dataset
    (separated so tests can plant duplicate/reordered conversations)."""
    import hashlib as _hl

    from .bucketed import bucketed_group_reduce

    def _xor_by_conv(conv: pd.Series, fp: np.ndarray) -> pd.DataFrame:
        codes, uniq = pd.factorize(conv)
        order = np.argsort(codes, kind="stable")
        sc = codes[order]
        starts = np.flatnonzero(np.r_[True, sc[1:] != sc[:-1]])
        out = np.bitwise_xor.reduceat(fp[order], starts)
        return pd.DataFrame(
            {"conv_id": uniq[sc[starts]], "fp": out.astype("int64")}
        )

    def term_partial(t) -> pd.DataFrame:
        # pyarrow stage-1: the wide turn-text column never becomes a pandas
        # object block (r4 VERDICT "what's wrong" #4)
        idxs = t.column("turn_idx").to_pylist()
        texts = t.column("text").to_pylist()
        h = np.fromiter(
            (
                int.from_bytes(
                    _hl.md5(f"{i}:{x}".encode()).digest()[:8], "little"
                ) >> 1
                for i, x in zip(idxs, texts)
            ),
            dtype=np.int64,
            count=t.num_rows,
        )
        return _xor_by_conv(pd.Series(t.column("conv_id").to_pylist()), h)

    def term_reduce(g: pd.DataFrame) -> pd.DataFrame:
        return _xor_by_conv(g["conv_id"], g["fp"].to_numpy())

    fps = bucketed_group_reduce(
        turns, ["conv_id"], term_partial, term_reduce, n_buckets=64,
        stage1_format="pyarrow",
    )

    def grp_partial(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby("fp", sort=False)
            .agg(conv_id=("conv_id", "min"), n_copies=("conv_id", "count"))
            .reset_index()
        )

    def grp_reduce(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.groupby("fp", sort=False)
            .agg(conv_id=("conv_id", "min"), n_copies=("n_copies", "sum"))
            .reset_index()
        )

    return bucketed_group_reduce(
        fps, ["fp"], grp_partial, grp_reduce, n_buckets=64
    )


def k2_annotation_quads(sf_dir: str):
    """K2 — highlight-annotation rendering (Worker.cs:459-528 quad emitter)
    over the flagship transcript turns: every extracted span becomes one
    annotation row with the reference's pixel→point math, y-flip, Acrobat
    quad order, YELLOW MARKUP_HIGHLIGHT. The oracle recomputes the span
    offsets from the deterministic header synthesis and the same geometry."""
    from .highlights import render_highlights
    from .pipeline import build_turns

    turns = build_turns(_docs_to_transcripts(sf_dir), _cluster_cfg())
    return render_highlights(turns.select_columns(["conv_id", "turn_idx", "spans"]))


def transcript_extract(sf_dir: str):
    from .pipeline import build_conv_fields, build_turns

    cfg = _cluster_cfg()
    turns = build_turns(_docs_to_transcripts(sf_dir), cfg)
    return build_conv_fields(turns, cfg)


def transcript_extract_salted(sf_dir: str):
    """The SAME extraction pipeline as transcript_extract but with the
    salted two-stage conv fold engaged (salt_buckets=4) — the hot-key path
    the north rule requires for skew from pathologically long
    conversations: partials pre-merge under (conv_id, salt) so no single
    reducer sees more than 1/salt of a hot conversation's partial stream.
    Driver-gated against the IDENTICAL SQL oracle as the unsalted path,
    proving the salt pre-pass is bit-invariant (the winner encoding is an
    order-free min; the fold docstring states the contract, this query
    puts it under the value-hash gate)."""
    from dataclasses import replace

    from .pipeline import build_conv_fields, build_turns

    cfg = replace(_cluster_cfg(), salt_buckets=4)
    turns = build_turns(_docs_to_transcripts(sf_dir), cfg)
    return build_conv_fields(turns, cfg)


def html_main_content(sf_dir: str):
    """D2 (HTML boilerplate strip) under the driver's FULL value-hash gate —
    the north rule's core extraction stage. Each document is wrapped in a
    deterministic boilerplate page (``html_extract.synth_page``: nav/header/
    footer chrome, the document re-paragraphed in 20-token <p> blocks, one
    mixed content+link paragraph at link density ~0.25 that must be KEPT,
    one link-farm div at ~1.0 that must be DROPPED), then the REAL block
    scorer (``extract_blocks`` — the same code path the flagship pipeline's
    ContentParser actors run, html_extract.py:519) strips it back. The
    DuckDB oracle regenerates the expected outcome from the keep rule
    (chrome gone; blocks kept iff len >= 25 chars and link density <= 0.33),
    so the stripper's text, block count and keep/drop decisions are all
    hash-gated — previously D2 was pytest-parity-gated only.

    Scale shape: stateless map_batches over a 2-column pruned read; the
    page never exists outside the task (synthesized and stripped in the
    same batch fn), so no HTML ever crosses the object store."""
    from .html_extract import main_content_batch

    return _fan_out(_read(sf_dir, "documents", ["doc_id", "text"])).map_batches(
        main_content_batch, batch_format="pyarrow"
    )


def pdf_reading_order(sf_dir: str):
    """D1 (PDF-ish layout parse) under the driver's FULL value-hash gate —
    the html_main_content move applied to the other decode path. Each
    document's tokens are laid out as a positional fragment dump
    (``pdf_layout.synth_dump``: 8-token visual lines at y = 40*li + 10 with
    per-fragment y jitter inside Y_TOLERANCE, 4-token fragments at
    x = 60 + 150*f with x jitter, emission order jumbled by md5), then the
    REAL band-clustering extractor (``extract_reading_order`` — the same
    code path the flagship pipeline's ContentParser actors run) re-derives
    reading order. The DuckDB oracle regenerates the expected text by
    re-chunking the token list 8-per-line, so line clustering, x ordering
    and arrival-order independence are all hash-gated.

    Scale shape: stateless map_batches over a 2-column pruned read; the
    dump never exists outside the task."""
    from .pdf_layout import reading_order_batch

    return _fan_out(_read(sf_dir, "documents", ["doc_id", "text"])).map_batches(
        reading_order_batch, batch_format="pyarrow"
    )


def curate_transcripts(sf_dir: str):
    """Flagship composition: the full extraction pipeline feeding a
    training-set selection gate — keep conversations with an extracted
    patient name and a moderate turn count (3-40), emitting the curation
    manifest (conv_id, patient_name, n_turns). Pure streaming filter over
    the extraction output; no extra shuffle beyond the fold's."""

    def gate(df: pd.DataFrame) -> pd.DataFrame:
        m = df["patient_name"].notna() & df["n_turns"].between(3, 40)
        return df.loc[m, ["conv_id", "patient_name", "n_turns"]]

    return transcript_extract(sf_dir).map_batches(gate, batch_format="pandas")


def resume_manifest_audit(sf_dir: str):
    """K1/K3/A4 under the driver gate (VERDICT r2 missing #3): run the
    resumable sharded extraction over the derived transcript corpus, re-run
    it (everything must resume-skip), then audit the manifest's lineage
    numbers against a physical re-scan of the written parquet. One aggregate
    row: manifest turn/conv totals, re-scanned totals, and the all-skipped
    resume flag; the oracle recomputes the expected totals arithmetically
    from the documents table (same synthesis SQL as transcript_turn_stats).

    Input files are written conv-aligned (one file per explode batch, every
    conversation's turns generated inside one batch) — run_sharded's
    documented partitioning assumption for per-shard conv folds."""
    import hashlib
    import shutil

    import pyarrow as pa

    from .config import ExtractConfig
    from .pipeline import load_manifest, run_sharded

    # key by abspath hash + pid: two concurrent runs (or two corpora sharing
    # a basename, e.g. different .../sf0.1 dirs) must not rmtree each other
    corpus_key = hashlib.sha1(
        os.path.abspath(os.path.normpath(sf_dir)).encode()
    ).hexdigest()[:12]
    parent = os.path.join("/tmp", "rayextract_resume_audit")
    prefix = f"{os.path.basename(os.path.normpath(sf_dir))}-{corpus_key}-"
    scratch = os.path.join(parent, prefix + str(os.getpid()))
    # reap DEAD prior runs of the same corpus (per-pid dirs otherwise leak
    # a scratch corpus per benchmark invocation); live pids keep their
    # isolation, other corpora have a different hash prefix and are untouched
    if os.path.isdir(parent):
        for d in os.listdir(parent):
            pid_s = d[len(prefix):]
            if d.startswith(prefix) and pid_s.isdigit():
                try:
                    os.kill(int(pid_s), 0)
                except (ProcessLookupError, ValueError):
                    shutil.rmtree(os.path.join(parent, d), ignore_errors=True)
                except PermissionError:
                    pass  # pid alive under another uid: leave it
    in_dir, out_dir = os.path.join(scratch, "in"), os.path.join(scratch, "out")
    shutil.rmtree(scratch, ignore_errors=True)
    os.makedirs(in_dir, exist_ok=True)

    def write_shard(batch: pa.Table) -> pa.Table:
        # digest-named file per conv-aligned batch (idempotent under retry)
        h = hashlib.sha1()
        h.update("\x1f".join(batch.column("conv_id").to_pylist()).encode())
        pq.write_table(
            batch, os.path.join(in_dir, f"part-{h.hexdigest()[:16]}.parquet")
        )
        return pa.table({"n": pa.array([len(batch)], pa.int64())})

    n_in = sum(
        r["n"]
        for r in _docs_to_transcripts(sf_dir)
        .map_batches(write_shard, batch_format="pyarrow", batch_size=None)
        .take_all()
    )

    cfg = _cluster_cfg()
    glob_pat = os.path.join(in_dir, "*.parquet")
    run_sharded(glob_pat, out_dir, cfg, n_shards=4)
    second = run_sharded(glob_pat, out_dir, cfg, n_shards=4)
    all_skipped = int(
        second["shards_skipped"] == second["shards_total"] - second["shards_empty"]
    )

    manifest = load_manifest(out_dir)
    turns_manifest = sum(r["n_turns"] for r in manifest.values())
    convs_manifest = sum(r["n_convs"] for r in manifest.values())

    def _scan(sub: str) -> int:
        total = 0
        root = os.path.join(out_dir, sub)
        for shard in sorted(os.listdir(root)):
            sdir = os.path.join(root, shard)
            for f in sorted(os.listdir(sdir)):
                if f.endswith(".parquet"):
                    total += pq.read_metadata(os.path.join(sdir, f)).num_rows
        return total

    return pd.DataFrame(
        {
            "turns_manifest": pd.Series([turns_manifest], dtype="int64"),
            "turns_rescan": pd.Series([_scan("turns")], dtype="int64"),
            "turns_input": pd.Series([n_in], dtype="int64"),
            "convs_manifest": pd.Series([convs_manifest], dtype="int64"),
            "convs_rescan": pd.Series([_scan("conv_fields")], dtype="int64"),
            "resume_all_skipped": pd.Series([all_skipped], dtype="int64"),
        }
    )


def transcript_turn_stats(sf_dir: str):
    """Per-conversation turn/token statistics over the derived transcript
    corpus — the profiling pass a transcript pipeline runs before sizing
    batch/block parameters (turn counts, token volume, longest turn).

    Scale shape: the turn explode is a flat map; per-batch partials
    pre-aggregate (count, sum, max) per conv_id so the single bucketed
    exchange carries one narrow row per (conv x batch). The oracle
    reproduces the same numbers arithmetically from the documents table."""
    from .bucketed import bucketed_group_reduce
    from .textstats import _tokens

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        n = np.array([len(_tokens(t)) for t in df["text"]], dtype="int64")
        t = pd.DataFrame({"conv_id": df["conv_id"], "n": n})
        return t.groupby("conv_id", sort=False, as_index=False).agg(
            n_turns=("n", "size"), n_tokens=("n", "sum"),
            max_turn_tokens=("n", "max"),
        )

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("conv_id", sort=False, as_index=False).agg(
            n_turns=("n_turns", "sum"), n_tokens=("n_tokens", "sum"),
            max_turn_tokens=("max_turn_tokens", "max"),
        )

    return bucketed_group_reduce(
        _docs_to_transcripts(sf_dir), ["conv_id"], partial, reduce,
        n_buckets=64,
    )


def t5_span_corruption_stats(sf_dir: str):
    """T5-style span-corruption planning stats (Raffel et al. 2020, public:
    mask ~15% of tokens in short spans): how many tokens / spans each doc
    would mask — the sizing pass a denoising-pretraining pipeline runs to
    pick sequence budgets before writing corrupted examples.

    Masking is deterministic and NON-OVERLAPPING by construction: tokens
    partition into 20-token blocks, each block masks the 3-token span
    starting at ``md5(doc_id:block) % 18`` (3/20 = the 15% T5 rate; spans
    are block-contained so they can never collide, and doc-tail spans
    truncate). This closed form replaces T5's sequential sampler so the
    same integers fall out of one vectorized batch pass here AND the
    DuckDB oracle — no greedy state, zero shuffle, nothing driver-side.
    Output (doc_id, n_tokens, n_masked, n_spans)."""
    import hashlib

    from .textstats import _tokens

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(dtype="int64")
        n_out = np.zeros(len(df), dtype=np.int64)
        m_out = np.zeros(len(df), dtype=np.int64)
        s_out = np.zeros(len(df), dtype=np.int64)
        for i, (doc_id, text) in enumerate(zip(ids, df["text"])):
            n = len(_tokens(text))
            n_out[i] = n
            if n == 0:
                continue
            masked = spans = 0
            for b in range((n + 19) // 20):
                st = int.from_bytes(
                    hashlib.md5(f"{doc_id}:{b}".encode()).digest()[:8], "little"
                ) % 18
                pos0 = b * 20 + st
                if pos0 < n:
                    masked += min(3, n - pos0)
                    spans += 1
            m_out[i] = masked
            s_out[i] = spans
        return pd.DataFrame(
            {"doc_id": ids, "n_tokens": n_out, "n_masked": m_out,
             "n_spans": s_out}
        )

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        stats, batch_format="pandas"
    )


def conv_packing_plan(sf_dir: str, max_seq: int = 128):
    """Context-window packing plan per conversation: greedy sequential
    packing of turns (in turn_idx order) into max_seq-token windows — the
    sizing pass a chat-SFT pipeline runs to predict window counts and
    padding waste before materializing training sequences. A turn that
    would overflow the current window starts a new one; turns are never
    split.

    Scale shape: ONE bucketed exchange on conv_id carries narrow
    (conv, idx, n_tokens) rows; the greedy scan runs per conversation in
    the bucket (conversations are bounded, the corpus is not). The
    oracle verifies the SEQUENTIAL algorithm itself with a recursive CTE
    over the same derived turn list — fill_e6 is the usual fixed-IEEE
    micro-unit contract. Output (conv_id, n_turns, n_tokens, n_windows,
    fill_e6)."""
    from .bucketed import bucketed_group_reduce
    from .textstats import _tokens

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"conv_id": df["conv_id"],
             "turn_idx": df["turn_idx"].astype("int64"),
             "n": np.asarray([len(_tokens(t)) for t in df["text"]],
                             dtype="int64")}
        )

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for conv, grp in g.groupby("conv_id", sort=False):
            grp = grp.sort_values("turn_idx", kind="stable")
            toks = grp["n"].to_numpy()
            acc = int(toks[0])
            w = 1
            for t in toks[1:]:
                t = int(t)
                if acc + t <= max_seq:
                    acc += t
                else:
                    acc = t
                    w += 1
            n_tokens = int(toks.sum())
            x = n_tokens * 1e6 / (w * max_seq)
            fill = int(np.floor(x + 0.5)) if x >= 0 else int(np.ceil(x - 0.5))
            out.append((conv, len(toks), n_tokens, w, fill))
        return pd.DataFrame(
            out,
            columns=["conv_id", "n_turns", "n_tokens", "n_windows", "fill_e6"],
        ).astype({"n_turns": "int64", "n_tokens": "int64",
                  "n_windows": "int64", "fill_e6": "int64"})

    return bucketed_group_reduce(
        _docs_to_transcripts(sf_dir), ["conv_id"], partial, reduce,
        n_buckets=64,
    )


def conv_context_windows(sf_dir: str):
    """Per-turn context-assembly sizing over the derived transcript corpus:
    for every turn, how many of the (up to 3) PRECEDING turns exist and how
    many characters they total — the budget pass a chat-SFT pipeline runs
    before materializing "context + current turn" training rows, where
    context length decides truncation and packing. Preceding is by turn_idx
    ORDER, not contiguity (the patient turn only exists for doc_id % 3 == 0).

    Scale shape: ONE bucketed exchange on conv_id carries narrow
    (conv, idx, n_chars) rows — turn text never shuffles; the in-bucket
    rolling window is a vectorized cumsum difference (cs[i-1] - cs[i-4]) per
    sorted conversation, O(turns). The oracle is the same rolling frame as a
    SQL window function (ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING). Output
    (conv_id, turn_idx, n_ctx, ctx_chars), all int64 — no float contract."""
    from .bucketed import bucketed_group_reduce

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"conv_id": df["conv_id"],
             "turn_idx": df["turn_idx"].astype("int64"),
             "n_chars": df["text"].str.len().fillna(0).astype("int64")}
        )

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv_id", "turn_idx"], kind="stable")
        lens = g["n_chars"].to_numpy()
        # per-conv rolling sum of the previous <=3 lens via cumsum diffs;
        # conversation boundaries reset the window by position clamping
        starts = np.r_[0, np.flatnonzero(
            g["conv_id"].to_numpy()[1:] != g["conv_id"].to_numpy()[:-1]
        ) + 1]
        conv_start = np.repeat(starts, np.diff(np.r_[starts, len(g)]))
        pos = np.arange(len(g), dtype=np.int64)
        lo = np.maximum(pos - 3, conv_start)
        cs = np.r_[0, np.cumsum(lens)]
        return pd.DataFrame(
            {"conv_id": g["conv_id"].to_numpy(),
             "turn_idx": g["turn_idx"].to_numpy(),
             "n_ctx": pos - lo,
             "ctx_chars": cs[pos] - cs[lo]}
        ).astype({"n_ctx": "int64", "ctx_chars": "int64"})

    return bucketed_group_reduce(
        _docs_to_transcripts(sf_dir), ["conv_id"], partial, reduce,
        n_buckets=64,
    )


def conv_role_audit(sf_dir: str):
    """SFT-data role-structure audit over the derived transcript corpus:
    assign each turn its deterministic role (turn 0 = system; (doc_id +
    turn_idx) % 7 == 0 = tool; odd = user, even = assistant) and count,
    per conversation, the alternation violations a chat-SFT filter would
    reject — consecutive non-tool turns with the same speaker (which here
    arise exactly where a tool call interrupts the user/assistant
    alternation). The data-quality gate a conversation-tuning pipeline
    runs before packing chats into training sequences.

    Scale shape: roles are pure arithmetic on (doc_id, turn_idx) — no
    state; the sequence check needs a conversation's turns together, so
    ONE bucketed exchange on conv_id carries narrow (conv, idx) rows
    (text never ships) and the in-bucket check is a vectorized sorted
    LAG compare. Output (conv_id, n_turns, n_tool_turns,
    n_violations, ok)."""
    from .bucketed import bucketed_group_reduce

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        doc = df["conv_id"].str.slice(4).astype("int64")
        idx = df["turn_idx"].astype("int64")
        role = np.where(
            idx == 0, 0,
            np.where((doc + idx) % 7 == 0, 3, np.where(idx % 2 == 1, 1, 2)),
        ).astype("int64")  # 0 system, 1 user, 2 assistant, 3 tool
        return pd.DataFrame(
            {"conv_id": df["conv_id"], "turn_idx": idx, "role": role}
        )

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for conv, grp in g.groupby("conv_id", sort=False):
            grp = grp.sort_values("turn_idx", kind="stable")
            roles = grp["role"].to_numpy()
            n = len(roles)
            n_tool = int((roles == 3).sum())
            kept = roles[roles != 3]
            viol = int((kept[1:] == kept[:-1]).sum()) if len(kept) > 1 else 0
            out.append((conv, n, n_tool, viol))
        res = pd.DataFrame(
            out, columns=["conv_id", "n_turns", "n_tool_turns", "n_violations"]
        )
        for c in ("n_turns", "n_tool_turns", "n_violations"):
            res[c] = res[c].astype("int64")
        res["ok"] = res["n_violations"] == 0
        return res

    return bucketed_group_reduce(
        _docs_to_transcripts(sf_dir).select_columns(["conv_id", "turn_idx"]),
        ["conv_id"], partial, reduce, n_buckets=64,
    )


def sft_pair_extract(sf_dir: str):
    """Instruction/response pair mining over the transcript corpus: every
    user turn immediately followed (in turn order, which is NOT contiguous
    turn_idx — the patient turn only exists for doc_id % 3 == 0) by an
    assistant turn becomes one (prompt, response) training pair, with the
    per-side token budgets an SFT pipeline needs to pack and truncate.
    Roles are the deterministic assignment shared with ``conv_role_audit``.

    Scale shape: ONE bucketed exchange on conv_id ships narrow (conv, idx,
    role, n_tokens) rows — text never shuffles; adjacency is a vectorized
    shift compare per conversation in the bucket. Output one row per pair
    (conv_id, user_idx, asst_idx, prompt_tokens, response_tokens), all
    int64 — no float contract needed."""
    from .bucketed import bucketed_group_reduce
    from .textstats import _tokens

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        doc = df["conv_id"].str.slice(4).astype("int64")
        idx = df["turn_idx"].astype("int64")
        role = np.where(
            idx == 0, 0,
            np.where((doc + idx) % 7 == 0, 3, np.where(idx % 2 == 1, 1, 2)),
        ).astype("int64")
        return pd.DataFrame(
            {"conv_id": df["conv_id"], "turn_idx": idx, "role": role,
             "n": np.asarray([len(_tokens(t)) for t in df["text"]],
                             dtype="int64")}
        )

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for conv, grp in g.groupby("conv_id", sort=False):
            grp = grp.sort_values("turn_idx", kind="stable")
            idx = grp["turn_idx"].to_numpy()
            role = grp["role"].to_numpy()
            n = grp["n"].to_numpy()
            hit = np.flatnonzero((role[:-1] == 1) & (role[1:] == 2))
            for i in hit:
                out.append((conv, int(idx[i]), int(idx[i + 1]),
                            int(n[i]), int(n[i + 1])))
        return pd.DataFrame(
            out,
            columns=["conv_id", "user_idx", "asst_idx",
                     "prompt_tokens", "response_tokens"],
        ).astype({"user_idx": "int64", "asst_idx": "int64",
                  "prompt_tokens": "int64", "response_tokens": "int64"})

    return bucketed_group_reduce(
        _docs_to_transcripts(sf_dir), ["conv_id"], partial, reduce,
        n_buckets=64,
    )


def trigram_diversity_per_source(sf_dir: str):
    """Per-source n-gram diversity: distinct word-trigrams over total
    word-trigrams — the repetitiveness/variety dashboard (low diversity =
    boilerplate or template spam) a corpus owner reads next to
    ``source_scorecard`` when deciding source weights.

    Scale shape: TWO chained bucketed exchanges, both narrow. The first is
    keyed (source, trigram-md5) and ships 16-byte fingerprints + counts
    (text never crosses); its output is distinct-trigram-sized, NOT
    corpus-sized. The second rolls that up per source (source-cardinality
    rows). The final diversity_e6 is the fixed-IEEE micro-ratio contract.
    Output (source, n_trigrams, n_distinct, diversity_e6)."""
    import hashlib

    from .bucketed import bucketed_group_reduce
    from .textstats import _tokens

    docs = _read(sf_dir, "documents", ["text", "source"])

    def tri_partial(df: pd.DataFrame) -> pd.DataFrame:
        acc: dict = {}
        for src, s in zip(df["source"], df["text"]):
            toks = _tokens(s) if isinstance(s, str) else []
            for i in range(len(toks) - 2):
                key = (src, hashlib.md5(
                    " ".join(toks[i : i + 3]).encode()).digest()[:8].hex())
                acc[key] = acc.get(key, 0) + 1
        if not acc:
            return pd.DataFrame({"source": pd.Series([], dtype=str),
                                 "h": pd.Series([], dtype=str),
                                 "c": pd.Series([], dtype="int64")})
        ks = list(acc.keys())
        return pd.DataFrame(
            {"source": [k[0] for k in ks], "h": [k[1] for k in ks],
             "c": np.fromiter(acc.values(), dtype="int64", count=len(acc))}
        )

    def tri_reduce(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.groupby(["source", "h"], sort=False)["c"].sum().reset_index()
        )

    def src_partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {"source": df["source"],
             "n_trigrams": df["c"].astype("int64"),
             "n_distinct": np.ones(len(df), dtype="int64")}
        )
        return out.groupby("source", sort=False, as_index=False).sum()

    def src_reduce(g: pd.DataFrame) -> pd.DataFrame:
        r = g.groupby("source", sort=False, as_index=False)[
            ["n_trigrams", "n_distinct"]
        ].sum()
        x = r["n_distinct"].to_numpy() * 1e6 / r["n_trigrams"].to_numpy()
        r["diversity_e6"] = np.floor(x + 0.5).astype("int64")
        return r

    per_tri = bucketed_group_reduce(
        docs, ["source", "h"], tri_partial, tri_reduce, 64
    )
    return bucketed_group_reduce(
        per_tri, ["source"], src_partial, src_reduce, 8
    )


def contract_audit_documents(sf_dir: str):
    """Data-contract audit over the documents feed — the Deequ /
    Great-Expectations class of gate (Schelter et al., VLDB 2018): five
    declarative rules (doc_id unique, text not-null, lang in its closed
    set, n_chars non-negative, source format) checked distributed with
    per-rule violation counts, the quality gate an ingest runs before
    admitting a 100 TB drop into the corpus. See contract.py for the rule
    engine and its one-pass + narrow-unique-exchange shape. Output
    (rule, n_rows, n_violations, ok)."""
    from .contract import DEFAULT_DOC_RULES, validate_contract

    return validate_contract(
        _read(sf_dir, "documents",
              ["doc_id", "text", "lang", "source", "n_chars"]),
        DEFAULT_DOC_RULES,
    )


def corpus_datasheet(sf_dir: str):
    """One-row dataset card — the corpus-level datasheet (docs, sources,
    langs, tokens, chars, vocabulary size, exact-dup doc count) a data
    release publishes and a training run logs before consuming a corpus.

    Scale shape: everything is either a per-batch partial sum or one of
    two narrow bucketed distinct-counts (token vocab; text md5) whose
    intermediates are vocab-/distinct-sized, never corpus-sized; the
    final fold is driver arithmetic over those aggregates. Output one row
    (n_docs, n_sources, n_langs, n_tokens, n_chars, vocab_size,
    n_dup_docs)."""
    import hashlib

    from .bucketed import bucketed_group_reduce
    from .textstats import _tokens

    docs = _read(sf_dir, "documents",
                 ["doc_id", "text", "lang", "source", "n_chars"])

    def vol_partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"k": np.zeros(len(df), dtype="int64"),
             "n_docs": np.ones(len(df), dtype="int64"),
             "n_tokens": np.asarray(
                 [len(_tokens(s)) if isinstance(s, str) else 0
                  for s in df["text"]], dtype="int64"),
             "n_chars": df["n_chars"].astype("int64")}
        ).groupby("k", as_index=False).sum()

    def vol_reduce(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("k", as_index=False)[
            ["n_docs", "n_tokens", "n_chars"]
        ].sum()

    def vocab_partial(df: pd.DataFrame) -> pd.DataFrame:
        ws = set()
        srcs = set()
        langs = set()
        hs = []
        for s, src, lg in zip(df["text"], df["source"], df["lang"]):
            if isinstance(s, str):
                ws.update(_tokens(s))
                hs.append(hashlib.md5(s.encode()).hexdigest())
            else:
                hs.append("")
            srcs.add(src)
            langs.add(lg)
        return pd.DataFrame(
            {"w": (["w:" + w for w in ws] + ["s:" + s for s in srcs]
                   + ["l:" + x for x in langs] + ["h:" + h for h in hs]),
             "c": np.ones(len(ws) + len(srcs) + len(langs) + len(hs),
                          dtype="int64")}
        )

    def vocab_reduce(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("w", sort=False)["c"].sum().reset_index()

    vol = bucketed_group_reduce(docs, ["k"], vol_partial, vol_reduce, 1
                                ).to_pandas()
    keyed = bucketed_group_reduce(docs, ["w"], vocab_partial, vocab_reduce,
                                  32).to_pandas()
    kind = keyed["w"].str.slice(0, 2)
    vocab_size = int((kind == "w:").sum())
    n_sources = int((kind == "s:").sum())
    n_langs = int((kind == "l:").sum())
    hrows = keyed[kind == "h:"]
    n_dup_docs = int((hrows["c"] - 1).sum())  # copies beyond each first
    return pd.DataFrame(
        {"n_docs": pd.array([int(vol["n_docs"][0])], dtype="int64"),
         "n_sources": pd.array([n_sources], dtype="int64"),
         "n_langs": pd.array([n_langs], dtype="int64"),
         "n_tokens": pd.array([int(vol["n_tokens"][0])], dtype="int64"),
         "n_chars": pd.array([int(vol["n_chars"][0])], dtype="int64"),
         "vocab_size": pd.array([vocab_size], dtype="int64"),
         "n_dup_docs": pd.array([n_dup_docs], dtype="int64")}
    )


def length_bucket_batching_plan(sf_dir: str, width: int = 32):
    """Length-bucketed batching plan — the serving/inference-side sizing
    pass: docs grouped into ceil(n_tokens/width) buckets, with per-bucket
    doc/token volume and the padding waste a bucket-padded batcher would
    incur (the dynamic-batching dashboard; high waste in a bucket means
    split it). Output (bucket, n_docs, n_tokens, pad_waste_e6); empty
    docs land in bucket 0 with zero waste.

    Scale shape: bucket assignment is per-batch arithmetic; ONE narrow
    bucketed exchange of (bucket, docs, tokens) partials; waste is the
    fixed-IEEE micro-ratio over exact ints."""
    from .bucketed import bucketed_group_reduce
    from .textstats import _tokens

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        n = np.asarray(
            [len(_tokens(s)) if isinstance(s, str) else 0
             for s in df["text"]], dtype="int64")
        b = -(-n // width)
        return pd.DataFrame(
            {"bucket": b, "n_docs": np.ones(len(df), dtype="int64"),
             "n_tokens": n}
        ).groupby("bucket", as_index=False).sum()

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        r = g.groupby("bucket", as_index=False)[["n_docs", "n_tokens"]].sum()
        cap = r["bucket"].to_numpy() * width * r["n_docs"].to_numpy()
        waste = np.zeros(len(r), dtype=np.int64)
        nz = cap > 0
        x = (cap[nz] - r["n_tokens"].to_numpy()[nz]) * 1e6 / cap[nz]
        waste[nz] = np.floor(x + 0.5).astype(np.int64)
        r["pad_waste_e6"] = waste
        return r.astype({"bucket": "int64", "n_docs": "int64",
                         "n_tokens": "int64", "pad_waste_e6": "int64"})

    return bucketed_group_reduce(
        _read(sf_dir, "documents", ["text"]), ["bucket"], partial, reduce, 8,
    )


def doc_compression_ratio(sf_dir: str):
    """zlib compression-ratio quality signal (CCNet/Gopher-class public
    heuristic): highly compressible text is repetitive boilerplate, nearly
    incompressible text is noise/binary junk; the keep band sits between.
    ratio_e6 = compressed_bytes * 1e6 / raw_bytes (level 6, raw deflate
    determinism pinned by golden tests; empty docs score 0). No SQL
    oracle — DuckDB has no zlib — so this is a rows-only entry with
    pytest goldens, like the model-fit ops. Pure per-batch map, zero
    shuffle."""
    import zlib

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        raw = np.zeros(len(df), dtype=np.int64)
        comp = np.zeros(len(df), dtype=np.int64)
        for i, s in enumerate(df["text"]):
            if isinstance(s, str) and s:
                b = s.encode()
                raw[i] = len(b)
                comp[i] = len(zlib.compress(b, 6))
        ratio = np.zeros(len(df), dtype=np.int64)
        nz = raw > 0
        ratio[nz] = np.floor(comp[nz] * 1e6 / raw[nz] + 0.5).astype(np.int64)
        return pd.DataFrame(
            {"doc_id": df["doc_id"].astype("int64"), "raw_bytes": raw,
             "comp_bytes": comp, "ratio_e6": ratio}
        )

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        fn, batch_format="pandas"
    )


def turn_dedup_normalized(sf_dir: str):
    """Normalization-folded turn dedup — the "fuzzy exact" class between
    byte-exact and MinHash: turns that differ only in whitespace, case, or
    digit runs collapse to one group (every invoice header in the corpus
    folds to a single template group; patient lines fold to one group per
    name). The template-detection pass a transcript-curation pipeline runs
    to find boilerplate turns worth stripping before training.

    Normalization (identical composition in the oracle): strip -> collapse
    whitespace -> lowercase -> fold each digit run to '0'. Scale shape:
    hash per row inside map_batches, ONE bucketed exchange of (hash,
    conv, 1) rows — text never shuffles. Output (norm_hash, rep_conv,
    n_copies, n_convs)."""
    import hashlib
    import re

    from .bucketed import bucketed_group_reduce

    ws = re.compile(r"\s+")
    dig = re.compile(r"[0-9]+")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        hs = [
            hashlib.md5(
                dig.sub("0", ws.sub(" ", t.strip()).lower()).encode()
            ).hexdigest() if isinstance(t, str) else ""
            for t in df["text"]
        ]
        return pd.DataFrame(
            {"h": hs, "conv_id": df["conv_id"],
             "n": np.ones(len(df), dtype="int64")}
        )

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("h", sort=False).agg(
            rep_conv=("conv_id", "min"), n_copies=("n", "sum"),
            n_convs=("conv_id", "nunique"),
        ).reset_index().rename(columns={"h": "norm_hash"})
        return out.astype({"n_copies": "int64", "n_convs": "int64"})

    return bucketed_group_reduce(
        _docs_to_transcripts(sf_dir), ["h"], partial, reduce, n_buckets=64,
    )


def boilerplate_prefix_per_source(sf_dir: str, k: int = 8):
    """Boilerplate-header detection per source: the most common k-token
    document prefix and how much of the source it covers — high coverage
    means a templated feed whose header should be stripped before
    training (the web-corpus "same nav/header on every page" smell).

    Scale shape: per-batch (source, prefix) partial counts, ONE bucketed
    exchange keyed by source, vectorized top-1 in the bucket with the
    deterministic (count DESC, prefix ASC) tie-break. Output (source,
    prefix, n_docs_with_prefix, n_docs)."""
    from .bucketed import bucketed_group_reduce
    from .textstats import _tokens

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        pre = [
            " ".join(_tokens(s)[:k]) if isinstance(s, str) else ""
            for s in df["text"]
        ]
        out = pd.DataFrame(
            {"source": df["source"].to_numpy(), "prefix": pre,
             "c": np.ones(len(df), dtype="int64")}
        )
        return out.groupby(["source", "prefix"], sort=False,
                           as_index=False).sum()

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(["source", "prefix"], sort=False, as_index=False)[
            "c"
        ].sum()
        rows = []
        for src, grp in agg.groupby("source", sort=False):
            grp = grp.sort_values(
                ["c", "prefix"], ascending=[False, True], kind="stable"
            )
            rows.append((src, grp.iloc[0]["prefix"],
                         int(grp.iloc[0]["c"]), int(grp["c"].sum())))
        return pd.DataFrame(
            rows,
            columns=["source", "prefix", "n_docs_with_prefix", "n_docs"],
        ).astype({"n_docs_with_prefix": "int64", "n_docs": "int64"})

    return bucketed_group_reduce(
        _read(sf_dir, "documents", ["text", "source"]),
        ["source"], partial, reduce, n_buckets=8,
    )


def doc_max_repeated_ngram(sf_dir: str, cap: int = 16):
    """Longest repeated token n-gram per document (capped at 16): the
    repetition-depth signal that separates natural reuse (short repeated
    bigrams) from template/boilerplate spam (long verbatim repeats) —
    complements ``doc_repetition_filter``'s fixed-n fractions. Dup-ness is
    monotone in L (any prefix of a repeated L-gram is itself repeated), so
    each doc needs only a binary search over L — at most 5 linear scans of
    a bounded doc, per-batch, zero shuffle. Output (doc_id, n_tokens,
    max_rep_len, n_dup_at_max); docs with no repeated token score 0/0."""
    from .textstats import _tokens

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        n_out = np.zeros(len(df), dtype=np.int64)
        ml = np.zeros(len(df), dtype=np.int64)
        nd = np.zeros(len(df), dtype=np.int64)

        def ndup(toks, L):
            seen: dict = {}
            for i in range(len(toks) - L + 1):
                g = tuple(toks[i : i + L])
                seen[g] = seen.get(g, 0) + 1
            return sum(1 for c in seen.values() if c >= 2)

        for r, s in enumerate(df["text"]):
            toks = _tokens(s) if isinstance(s, str) else []
            n = len(toks)
            n_out[r] = n
            lo, hi = 0, min(cap, n - 1) if n else 0
            while lo < hi:  # largest L with a duplicate L-gram
                mid = (lo + hi + 1) // 2
                if ndup(toks, mid) > 0:
                    lo = mid
                else:
                    hi = mid - 1
            ml[r] = lo
            nd[r] = ndup(toks, lo) if lo else 0
        return pd.DataFrame(
            {"doc_id": df["doc_id"].astype("int64"), "n_tokens": n_out,
             "max_rep_len": ml, "n_dup_at_max": nd}
        )

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        fn, batch_format="pandas"
    )


def shuffle_skew_audit(sf_dir: str, n_buckets: int = 64):
    """Shuffle-planning skew audit over the transcript stream: the
    per-bucket row/conversation histogram for the engine's own
    hash-bucket function (md5 % n_buckets on conv_id) plus the hottest
    single conversation per bucket — the diagnostic a pipeline owner reads
    BEFORE picking n_buckets / deciding to salt a groupby-conv_id (the
    north rule's long-agent-turn skew story). A flat n_rows column means
    the exchange balances; a fat max_conv_rows flags the key to salt.

    Scale shape: ONE bucketed exchange keyed by the audited bucket id
    ships conversation-cardinality (bucket, conv, count) rows — the audit
    costs what one narrow shuffle costs, never more. Output (bucket,
    n_rows, n_convs, max_conv_rows)."""
    import hashlib

    from .bucketed import bucketed_group_reduce

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        grp = (
            df.groupby("conv_id", sort=False).size().reset_index(name="c")
        )
        grp["bucket"] = np.asarray(
            [int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")
             % n_buckets for s in grp["conv_id"]],
            dtype="int64",
        )
        grp["c"] = grp["c"].astype("int64")
        return grp[["bucket", "conv_id", "c"]]

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        per_conv = g.groupby(["bucket", "conv_id"], sort=False)["c"].sum()
        out = per_conv.groupby(level=0).agg(["sum", "count", "max"])
        out.columns = ["n_rows", "n_convs", "max_conv_rows"]
        return out.reset_index().astype(
            {"bucket": "int64", "n_rows": "int64", "n_convs": "int64",
             "max_conv_rows": "int64"}
        )

    return bucketed_group_reduce(
        _docs_to_transcripts(sf_dir).select_columns(["conv_id"]),
        ["bucket"], partial, reduce, n_buckets=16,
    )


def histogram_quantiles_value(sf_dir: str):
    """Approximate per-type quantiles (p50/p95/p99) of event value via a
    FIXED-BIN distributed histogram — the sort-free quantile path at scale
    (an exact percentile needs an all-to-all sort; a fixed-bin histogram
    needs one narrow count exchange and gives bin-resolution answers).
    Bins are unit-width floor(value) clamped to [0, 1023]; the reported
    quantile is the smallest bin whose cumulative count reaches
    ceil(q * n / 100) — all integer arithmetic, so the oracle matches
    exactly. Output (event_type, n_events, p50_bin, p95_bin, p99_bin)."""
    from .bucketed import bucketed_group_reduce

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        bins = np.clip(
            np.floor(df["value"].to_numpy(dtype=np.float64)), 0, 1023
        ).astype(np.int64)
        out = pd.DataFrame(
            {"event_type": df["event_type"].to_numpy(), "bin": bins,
             "c": np.ones(len(df), dtype="int64")}
        )
        return out.groupby(["event_type", "bin"], sort=False,
                           as_index=False).sum()

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, grp in g.groupby("event_type", sort=False):
            h = grp.groupby("bin", sort=True)["c"].sum()
            cum = h.cumsum()
            n = int(cum.iloc[-1])
            qs = []
            for q in (50, 95, 99):
                r = (n * q + 99) // 100
                qs.append(int(cum.index[np.searchsorted(cum.to_numpy(), r)]))
            rows.append((et, n, *qs))
        return pd.DataFrame(
            rows,
            columns=["event_type", "n_events", "p50_bin", "p95_bin",
                     "p99_bin"],
        ).astype({"n_events": "int64", "p50_bin": "int64",
                  "p95_bin": "int64", "p99_bin": "int64"})

    return bucketed_group_reduce(
        _read(sf_dir, "events", ["event_type", "value"]),
        ["event_type"], partial, reduce, n_buckets=8,
    )


def source_token_js_divergence(sf_dir: str):
    """Distribution-drift audit: Jensen-Shannon divergence (micro-nats)
    between each source's token distribution and the whole corpus — the
    per-feed drift score read next to the scorecard when a source starts
    mirroring or diverging from the mixture.

    Scale shape: ONE bucketed exchange reduces the corpus to per-(source,
    token) counts — vocab x sources sized, not corpus sized; the JS fold
    runs driver-side over that aggregate (like vocab_growth_curve) in
    SORTED token order with each term rounded to integer micro-nats
    before the sum — the order-free-int-sum float contract, so DuckDB
    reproduces the total exactly. Output (source, n_tokens, js_e6)."""
    import math

    from .bucketed import bucketed_group_reduce
    from .textstats import _tokens

    docs = _read(sf_dir, "documents", ["text", "source"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        acc: dict = {}
        for src, s in zip(df["source"], df["text"]):
            if isinstance(s, str):
                for w in _tokens(s):
                    k = (src, w)
                    acc[k] = acc.get(k, 0) + 1
        ks = list(acc.keys())
        return pd.DataFrame(
            {"source": [k[0] for k in ks], "w": [k[1] for k in ks],
             "c": np.fromiter(acc.values(), dtype="int64", count=len(acc))}
        )

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.groupby(["source", "w"], sort=False)["c"].sum().reset_index()
        )

    cnt = bucketed_group_reduce(
        docs, ["source", "w"], partial, reduce, 32
    ).to_pandas()
    tot = cnt.groupby("w", sort=True)["c"].sum()
    n_corpus = int(tot.sum())
    rows = []
    for src, grp in cnt.groupby("source", sort=True):
        sc = grp.set_index("w")["c"]
        n_src = int(sc.sum())
        js = 0
        for w in tot.index:  # sorted token order; int micro-nats per term
            p = int(sc.get(w, 0)) / n_src
            q = int(tot[w]) / n_corpus
            m = (p + q) / 2.0
            term = 0.0
            if p > 0:
                term += 0.5 * p * math.log(p / m)
            if q > 0:
                term += 0.5 * q * math.log(q / m)
            x = term * 1e6
            js += int(np.floor(x + 0.5)) if x >= 0 else int(np.ceil(x - 0.5))
        rows.append((src, n_src, js))
    return pd.DataFrame(
        {"source": [r[0] for r in rows],
         "n_tokens": pd.array([r[1] for r in rows], dtype="int64"),
         "js_e6": pd.array([r[2] for r in rows], dtype="int64")}
    )


def oov_rate_vs_vocab(sf_dir: str, k: int = 16):
    """Out-of-vocabulary rate per document against a frozen top-k corpus
    vocabulary — the coverage check a tokenizer-training pipeline runs
    before freezing a vocab (predicts UNK rates downstream). Two passes:

    1. exact corpus token counts via ONE bucketed exchange (result is
       vocab-sized, not corpus-sized); top-k frozen driver-side with the
       deterministic (count DESC, token ASC) tie-break;
    2. a broadcast-lookup ``map_batches`` scan scoring every document
       against the frozen set — the vocab here is closure-captured (tiny);
       a 100k-term vocab would go through ``ray.put`` once and be fetched
       in the task, never re-shipped per batch.

    Output (doc_id, n_tokens, n_oov, oov_e6); oov_e6 is the fixed-IEEE
    micro-rate contract (round half away from zero over exact ints)."""
    from .bucketed import bucketed_group_reduce
    from .textstats import _tokens

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def cnt_partial(df: pd.DataFrame) -> pd.DataFrame:
        acc: dict = {}
        for s in df["text"]:
            if isinstance(s, str):
                for w in _tokens(s):
                    acc[w] = acc.get(w, 0) + 1
        return pd.DataFrame(
            {"w": list(acc.keys()),
             "c": np.fromiter(acc.values(), dtype="int64", count=len(acc))}
        )

    def cnt_reduce(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("w", sort=False)["c"].sum().reset_index()

    counts = bucketed_group_reduce(
        docs, ["w"], cnt_partial, cnt_reduce, 32
    ).to_pandas()
    counts = counts.sort_values(
        ["c", "w"], ascending=[False, True], kind="stable"
    )
    vocab = frozenset(counts["w"].head(k))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        n = np.zeros(len(df), dtype=np.int64)
        oov = np.zeros(len(df), dtype=np.int64)
        for i, s in enumerate(df["text"]):
            toks = _tokens(s) if isinstance(s, str) else []
            n[i] = len(toks)
            oov[i] = sum(1 for w in toks if w not in vocab)
        e6 = np.zeros(len(df), dtype=np.int64)
        nz = n > 0
        e6[nz] = np.floor(oov[nz] * 1e6 / n[nz] + 0.5).astype(np.int64)
        return pd.DataFrame(
            {"doc_id": df["doc_id"].astype("int64"), "n_tokens": n,
             "n_oov": oov, "oov_e6": e6}
        )

    return docs.map_batches(score, batch_format="pandas")


# ---------------------------------------------------------------------------
# Corpus-prep operators round 2b: chunking, repetition, index, tf-idf
# ---------------------------------------------------------------------------

CHUNK_TOKENS = 32
CHUNK_STRIDE = 24


def chunk_documents(sf_dir: str):
    """Token-window chunking with overlap — the 'split long docs into
    training sequences' step every LLM-data pipeline runs before
    tokenization. Windows of CHUNK_TOKENS tokens every CHUNK_STRIDE
    (overlap 8); the final partial window is kept.

    Scale shape: pure flat-map ``map_batches`` (cardinality-expanding, no
    shuffle, no state) — streams at any corpus size; chunk rows inherit the
    input block partitioning."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        from .textstats import _tokens

        doc_ids, idxs, texts, ntoks = [], [], [], []
        for d, s in zip(df["doc_id"], df["text"]):
            toks = _tokens(s) if isinstance(s, str) else []
            n = len(toks)
            for ci, start in enumerate(range(0, max(n, 1), CHUNK_STRIDE)):
                window = toks[start : start + CHUNK_TOKENS]
                doc_ids.append(d)
                idxs.append(ci)
                texts.append(" ".join(window))
                ntoks.append(len(window))
        return pd.DataFrame(
            {
                "doc_id": np.asarray(doc_ids, dtype="int64"),
                "chunk_idx": np.asarray(idxs, dtype="int64"),
                "chunk_text": pd.Series(texts, dtype=object),
                "chunk_tokens": np.asarray(ntoks, dtype="int64"),
            }
        )

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        fn, batch_format="pandas"
    )


def doc_repetition_filter(sf_dir: str):
    """Gopher-style repetition signals (Rae et al. 2021, public heuristic):
    per doc, the most frequent token bigram (ties -> lexicographically
    smallest), the fraction of tokens covered by its repeats, and the
    duplicate-token fraction — all as floor'd integer micro-fractions so the
    result is bit-stable across engines.

    Scale shape: per-doc map_batches, no shuffle; the per-doc Counter is
    bounded by doc length."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        from .textstats import _tokens

        n_tokens = np.zeros(len(df), dtype=np.int64)
        top_g = [""] * len(df)
        top_n = np.zeros(len(df), dtype=np.int64)
        rep = np.zeros(len(df), dtype=np.int64)
        dup = np.zeros(len(df), dtype=np.int64)
        for i, s in enumerate(df["text"]):
            toks = _tokens(s) if isinstance(s, str) else []
            nt = len(toks)
            n_tokens[i] = nt
            if nt == 0:
                continue
            dup[i] = (1_000_000 * (nt - len(set(toks)))) // nt
            if nt < 2:
                continue
            c = Counter(" ".join(p) for p in zip(toks, toks[1:]))
            # max count, ties broken by smallest gram string
            g, n = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
            top_g[i], top_n[i] = g, n
            rep[i] = (2_000_000 * n) // nt
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "n_tokens": n_tokens,
                "top_bigram": pd.Series(top_g, dtype=object),
                "top_bigram_n": top_n,
                "rep_micro": rep,
                "dup_tok_micro": dup,
            }
        )

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        fn, batch_format="pandas"
    )


def inverted_index(sf_dir: str):
    """Inverted index build: token -> document frequency, total term count,
    and the first 8 posting doc_ids (ascending, comma-joined) — the lookup
    structure a corpus search / contamination check needs.

    Scale shape: per-batch partial (token, doc_id, tf) counts — bounded by
    vocab x docs-in-batch — then ONE bucketed reduce keyed on token. Postings
    are capped at 8 ids so a stopword's posting list cannot blow up a
    reducer; df/tf merge as int sums. Zipf-hot tokens are bounded by the
    per-batch pre-aggregation (one partial row per batch per token)."""
    from .bucketed import bucketed_group_reduce
    from .textstats import _tokens

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        c: Counter = Counter()
        for d, s in zip(df["doc_id"], df["text"]):
            if isinstance(s, str):
                for w in _tokens(s):
                    c[(w, d)] += 1
        if not c:
            return pd.DataFrame(
                {"token": pd.Series(dtype=object),
                 "doc_id": pd.Series(dtype="int64"),
                 "tf": pd.Series(dtype="int64")}
            )
        ks = list(c.keys())
        return pd.DataFrame(
            {
                "token": [k[0] for k in ks],
                "doc_id": np.asarray([k[1] for k in ks], dtype="int64"),
                "tf": np.fromiter(c.values(), dtype="int64", count=len(c)),
            }
        )

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        # per-(token, doc) partials from different batches merge first
        per = (
            g.groupby(["token", "doc_id"], sort=False)["tf"].sum().reset_index()
        ).sort_values(["token", "doc_id"], kind="stable")
        agg = per.groupby("token", sort=False).agg(
            df=("doc_id", "size"), tf=("tf", "sum")
        )
        first8 = per.groupby("token", sort=False).head(8)
        postings = first8.groupby("token", sort=False)["doc_id"].agg(
            lambda s: ",".join(str(int(x)) for x in s)
        )
        out = agg.join(postings.rename("postings")).reset_index()
        return out.astype({"df": "int64", "tf": "int64"})

    return bucketed_group_reduce(docs, ["token"], partial, reduce, n_buckets=32)


def doc_tfidf_topk(sf_dir: str):
    """Per-doc top-3 tf-idf terms (rank, token, tf, integer micro-nat
    score) — the relevance/keyword-extraction primitive. idf is computed
    once over the corpus, quantized to integer micro-nats, and broadcast;
    per-doc scores are then pure int multiplies, so ranking and values are
    bit-stable across engines and batch splits.

    Scale shape: pass 1 = bucketed df counts (output is vocab-sized — tiny);
    pass 2 = broadcast idf dict via ray.put + per-doc scoring inside
    map_batches. Ties rank by token asc."""
    import math

    import ray

    from .bucketed import bucketed_group_reduce
    from .textstats import _tokens

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    n_docs = pq.read_metadata(os.path.join(sf_dir, "documents.parquet")).num_rows

    def df_partial(df: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        c: Counter = Counter()
        for s in df["text"]:
            if isinstance(s, str):
                c.update(set(_tokens(s)))
        if not c:
            return pd.DataFrame(
                {"token": pd.Series(dtype=object), "df": pd.Series(dtype="int64")}
            )
        return pd.DataFrame(
            {"token": list(c.keys()),
             "df": np.fromiter(c.values(), dtype="int64", count=len(c))}
        )

    def df_reduce(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("token", sort=False)["df"].sum().reset_index()

    dfc = bucketed_group_reduce(docs, ["token"], df_partial, df_reduce, 32).to_pandas()
    # integer micro-nats per token (round half away, matching DuckDB round();
    # ln(N/df) >= 0 always, so floor(x+0.5) suffices)
    idf_micro = {
        w: int(math.floor(math.log(n_docs / d) * 1e6 + 0.5))
        for w, d in zip(dfc["token"], dfc["df"])
    }
    idf_ref = ray.put(idf_micro)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        idf = ray.get(idf_ref)
        doc_ids, ranks, toks, tfs, scores = [], [], [], [], []
        for d, s in zip(df["doc_id"], df["text"]):
            c = Counter(_tokens(s) if isinstance(s, str) else [])
            scored = sorted(
                ((tf * idf[w], w, tf) for w, tf in c.items()),
                key=lambda t: (-t[0], t[1]),
            )[:3]
            for r, (sc, w, tf) in enumerate(scored, 1):
                doc_ids.append(d)
                ranks.append(r)
                toks.append(w)
                tfs.append(tf)
                scores.append(sc)
        return pd.DataFrame(
            {
                "doc_id": np.asarray(doc_ids, dtype="int64"),
                "rank": np.asarray(ranks, dtype="int64"),
                "token": pd.Series(toks, dtype=object),
                "tf": np.asarray(tfs, dtype="int64"),
                "score_micro": np.asarray(scores, dtype="int64"),
            }
        )

    return docs.map_batches(score, batch_format="pandas")


def q6_discount_revenue(sf_dir: str):
    """TPC-H Q6 analog: single filter + global aggregate over lineitem —
    the simplest 'how much would this rule change revenue' scan. Revenue
    term = price_cents x discount_pct per ROW (pure int multiply -> e4
    units), summed order-free.

    Scale shape: predicate filter + projection inside one Arrow map_batches,
    then a count/sum tree-reduce — no shuffle at all."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def prep(t: "pa.Table") -> "pa.Table":
        m = pc.and_(
            pc.and_(
                pc.greater_equal(t["l_discount"], pa.scalar(0.05)),
                pc.less_equal(t["l_discount"], pa.scalar(0.07)),
            ),
            pc.less(t["l_quantity"], pa.scalar(24.0)),
        )
        t = t.filter(m)
        return pa.table(
            {
                "rev_e4": pc.multiply(
                    _pc_units(t["l_extendedprice"], 100),
                    _pc_units(t["l_discount"], 100),
                ),
            }
        )

    ds = _read(
        sf_dir, "lineitem", ["l_quantity", "l_extendedprice", "l_discount"]
    ).map_batches(prep, batch_format="pyarrow")
    n = ds.count()
    s = ds.sum("rev_e4") if n else 0
    return pd.DataFrame(
        {"n_lines": np.asarray([n], dtype="int64"),
         "revenue_e4": np.asarray([s], dtype="int64")}
    )


def user_event_deltas(sf_dir: str):
    """Per-user inter-event gap stats (count, mean gap, max gap in exact
    integer microseconds) — the cadence/engagement windowed aggregate.

    Scale shape: hash-bucket shuffle on user_id (3 narrow columns), then one
    vectorized sort + per-user diff per bucket — same shape as sessionize;
    no per-user Python. Mean gap telescopes to (max-min)//(n-1), an exact
    int division."""
    from .bucketed import bucketed_group_reduce

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": df["user_id"].astype("int64"),
                "t_us": df["ts"].astype("datetime64[us]").astype("int64"),
                "event_id": df["event_id"].astype("int64"),
            }
        )

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame(
                columns=["user_id", "n_events", "mean_gap_us", "max_gap_us"]
            ).astype("int64")
        g = g.sort_values(["user_id", "t_us", "event_id"], kind="stable")
        gaps = g.groupby("user_id", sort=False)["t_us"].diff()
        agg = (
            pd.DataFrame(
                {"user_id": g["user_id"].to_numpy(),
                 "t_us": g["t_us"].to_numpy(),
                 "gap": gaps.to_numpy()}
            )
            .groupby("user_id", sort=False)
            .agg(
                n_events=("t_us", "size"),
                t_min=("t_us", "min"),
                t_max=("t_us", "max"),
                max_gap_us=("gap", "max"),
            )
            .reset_index()
        )
        n = agg["n_events"].to_numpy()
        span = agg["t_max"].to_numpy() - agg["t_min"].to_numpy()
        mean_gap = np.where(n > 1, span // np.maximum(n - 1, 1), 0)
        return pd.DataFrame(
            {
                "user_id": agg["user_id"].astype("int64"),
                "n_events": agg["n_events"].astype("int64"),
                "mean_gap_us": mean_gap.astype("int64"),
                "max_gap_us": agg["max_gap_us"].fillna(0).astype("int64"),
            }
        )

    return bucketed_group_reduce(
        _read(sf_dir, "events", ["event_id", "ts", "user_id"]),
        ["user_id"], partial, reduce, n_buckets=64,
    )


DECON_NGRAM_TOKENS = 8
DECON_BENCH_DOCS = 3


def customers_with_big_orders(sf_dir: str):
    """Semi join via broadcast key set: customers holding at least one
    large (>400k) order — the companion of the anti-join query; same
    predicate-pushed small-side read, same broadcast filter shape."""
    big = _read_small(
        sf_dir, "orders", ["o_custkey"],
        filters=[("o_totalprice", ">", 400000)],
    )
    okeys = set(big["o_custkey"].tolist())
    return broadcast_semi_join(
        _read(sf_dir, "customer", ["c_custkey"]), okeys, "c_custkey", anti=False
    )


def pivot_events_by_type(sf_dir: str):
    """Pivot (long -> wide conditional aggregation): per user, one count and
    one exact-cents sum column per event type. The classic reporting
    reshape Ray Data has no operator for.

    Scale shape: the per-batch partial is already the WIDE shape (pandas
    crosstab-style groupby inside the batch), so the bucketed shuffle
    carries one row per (user x batch) of small ints — the reduce just sums
    wide columns per user. Event-type domain is fixed and small (the
    precondition any pivot needs at scale)."""
    from .bucketed import bucketed_group_reduce

    types = ["click", "error", "purchase", "signup", "view"]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = pd.DataFrame(
            {
                "user_id": df["user_id"].astype("int64"),
                "event_type": df["event_type"],
                "cents": _cents(df["value"]),
            }
        )
        g = t.groupby(["user_id", "event_type"], sort=False)["cents"].agg(
            ["size", "sum"]
        ).reset_index()
        out = pd.DataFrame({"user_id": g["user_id"].unique()}).set_index("user_id")
        for ty in types:
            sub = g[g["event_type"] == ty].set_index("user_id")
            out[f"n_{ty}"] = sub["size"]
            out[f"cents_{ty}"] = sub["sum"]
        return out.fillna(0).astype("int64").reset_index()

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("user_id", sort=False).sum().reset_index()

    return bucketed_group_reduce(
        _read(sf_dir, "events", ["user_id", "event_type", "value"]),
        ["user_id"], partial, reduce, n_buckets=32,
    )


def rollup_orders_status_year(sf_dir: str):
    """GROUPING-SETS rollup: order count + exact-cents revenue at three
    levels — (status, year), (status), grand total — with sentinel keys
    ('ALL', -1) instead of NULLs so the cross-engine hash is unambiguous.

    Scale shape: ONE streaming pass computes the finest-level aggregate via
    the bucketed combiner; the coarser rollup levels derive from that tiny
    (statuses x years) result on the driver — never a second corpus scan
    per level."""
    from .relational import pre_aggregate

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "status": df["o_orderstatus"],
                "year": df["o_orderdate"].dt.year.astype("int64"),
                "cents": _cents(df["o_totalprice"]),
            }
        )

    base = pre_aggregate(
        _read(sf_dir, "orders", ["o_orderstatus", "o_orderdate", "o_totalprice"])
        .map_batches(prep, batch_format="pandas"),
        ["status", "year"], sums=["cents"],
    ).to_pandas()
    lvl0 = pd.DataFrame(
        {
            "status": base["status"],
            "year": base["year"].astype("int64"),
            "n_orders": base["n"].astype("int64"),
            "sum_cents": base["sum_cents"].astype("int64"),
        }
    )
    lvl1 = (
        lvl0.groupby("status", as_index=False)[["n_orders", "sum_cents"]].sum()
        .assign(year=np.int64(-1))
    )[["status", "year", "n_orders", "sum_cents"]]
    lvl2 = pd.DataFrame(
        {
            "status": ["ALL"],
            "year": np.asarray([-1], dtype="int64"),
            "n_orders": np.asarray([lvl0["n_orders"].sum()], dtype="int64"),
            "sum_cents": np.asarray([lvl0["sum_cents"].sum()], dtype="int64"),
        }
    )
    return pd.concat([lvl0, lvl1, lvl2], ignore_index=True).astype(
        {"year": "int64", "n_orders": "int64", "sum_cents": "int64"}
    )


def event_transitions(sf_dir: str):
    """Markov transition counts: how often event type A is immediately
    followed by type B within a user's stream (ordered by ts, event_id) —
    the sequence-mining aggregate behind funnel analysis.

    Scale shape: same bucketed sort+shift as sessionize — hash-bucket
    shuffle on user_id (3 narrow columns), one vectorized sort + per-user
    shift per bucket, then a tiny (types x types) count merge."""
    from .bucketed import bucketed_group_reduce

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": df["user_id"].astype("int64"),
                "t_us": df["ts"].astype("datetime64[us]").astype("int64"),
                "event_id": df["event_id"].astype("int64"),
                "event_type": df["event_type"],
            }
        )

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame(
                {"from_type": pd.Series(dtype=object),
                 "to_type": pd.Series(dtype=object),
                 "n": pd.Series(dtype="int64")}
            )
        g = g.sort_values(["user_id", "t_us", "event_id"], kind="stable")
        same_user = g["user_id"].to_numpy()[1:] == g["user_id"].to_numpy()[:-1]
        frm = g["event_type"].to_numpy()[:-1][same_user]
        to = g["event_type"].to_numpy()[1:][same_user]
        out = (
            pd.DataFrame({"from_type": frm, "to_type": to})
            .groupby(["from_type", "to_type"], sort=False)
            .size().rename("n").reset_index()
        )
        return out.astype({"n": "int64"})

    pairs = bucketed_group_reduce(
        _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"]),
        ["user_id"], partial, reduce, n_buckets=64,
    )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby(["from_type", "to_type"], as_index=False)["n"].sum()
            .astype({"n": "int64"})
        )

    # per-bucket counts are (types x types)-bounded — final merge is tiny
    return merge(pairs.to_pandas())


def markov_stationary_event_types(sf_dir: str):
    """Stationary distribution of the event-type Markov chain: 8 pinned
    integer power-iteration steps from the uniform vector over the
    row-normalized transition matrix — where a user's session stream
    settles, the weighting behind journey simulation and funnel
    prioritization. Each step is the exact recurrence
    x'_j = sum_i (x_i * c_ij) // rowsum_i (floor per term, micro-units;
    mass lost to flooring stays lost — deterministic on both engines),
    so the oracle replays it as 8 unrolled CTE hops.

    Scale shape: the distributed work is the transition count
    (event_transitions: bucketed sort+shift over users, (types x types)
    merge); the iteration itself is O(types^2) driver arithmetic on that
    tiny matrix — at 10^12 events the matrix is still 5x5."""
    trans = event_transitions(sf_dir)
    types_df = (
        _read(sf_dir, "events", ["event_type"])
        .map_batches(lambda df: df.drop_duplicates(), batch_format="pandas")
        .to_pandas()
        .drop_duplicates()
    )
    types = sorted(types_df["event_type"])
    idx = {t: i for i, t in enumerate(types)}
    k = len(types)
    C = np.zeros((k, k), dtype="int64")
    for r in trans.itertuples():
        C[idx[r.from_type], idx[r.to_type]] = int(r.n)
    rowsum = C.sum(axis=1)
    x = np.full(k, 1_000_000 // k, dtype="int64")
    safe = np.maximum(rowsum, 1)
    for _ in range(8):
        contrib = (x[:, None] * C) // safe[:, None]
        contrib[rowsum == 0] = 0
        x = contrib.sum(axis=0)
    return pd.DataFrame(
        {"event_type": types, "stationary_e6": x.astype("int64")}
    )


def _exact_ntile(rank: np.ndarray, total: int, tiles: int) -> np.ndarray:
    """DuckDB ntile() semantics on 1-based ranks: the first total%tiles
    tiles take ceil(total/tiles) rows, the rest floor(total/tiles)."""
    q, r = divmod(total, tiles)
    if q == 0:
        return rank.astype("int64")
    boundary = r * (q + 1)
    return np.where(
        rank <= boundary,
        (rank - 1) // (q + 1) + 1,
        r + (rank - 1 - boundary) // q + 1,
    ).astype("int64")


def rfm_user_segments(sf_dir: str):
    """RFM segmentation: every user scored into recency / frequency /
    monetary quartiles (1..4, ascending metric) and the composite
    3-digit RFM code — the classic customer-base partition behind
    lifecycle campaigns, here the user-prioritization pass of an event
    pipeline. Quartiles follow DuckDB ntile(4) exactly (ties broken by
    user_id), so the oracle matches bit for bit.

    Scale shape: the per-user (last-seen, count, cents) triple collapses
    in ONE bucketed exchange on user_id; quartile assignment runs on the
    driver over that user-cardinality aggregate (at 10^12-event scale
    you'd swap in relational.global_rank — the distributed ntile this
    engine already ships — per metric; the aggregate here is
    dashboard-sized)."""
    from .bucketed import bucketed_group_reduce

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = pd.DataFrame(
            {"user_id": df["user_id"].to_numpy(dtype="int64"),
             "r": df["ts"].to_numpy().astype("datetime64[us]")
                    .astype("int64"),
             "f": np.int64(1),
             "m": _round_half_away(df["value"].to_numpy() * 100.0)}
        )
        return t.groupby("user_id", sort=False, as_index=False).agg(
            r=("r", "max"), f=("f", "sum"), m=("m", "sum")
        )

    u = bucketed_group_reduce(
        _read(sf_dir, "events", ["user_id", "ts", "value"]),
        ["user_id"], partial,
        lambda g: g.groupby("user_id", sort=False, as_index=False).agg(
            r=("r", "max"), f=("f", "sum"), m=("m", "sum")
        ),
        n_buckets=32,
    ).to_pandas()
    n = len(u)
    out = {"user_id": u["user_id"].astype("int64")}
    for col in ("r", "f", "m"):
        order = np.lexsort((u["user_id"].to_numpy(),
                            u[col].to_numpy(dtype="int64")))
        rank = np.empty(n, dtype="int64")
        rank[order] = np.arange(1, n + 1)
        out[f"{col}_q"] = _exact_ntile(rank, n, 4)
    res = pd.DataFrame(out)
    res["rfm_code"] = (100 * res["r_q"] + 10 * res["f_q"]
                       + res["m_q"]).astype("int64")
    return res


def abc_analysis_parts(sf_dir: str):
    """ABC (80/95 Pareto) classification of parts by lineitem revenue: the
    inventory-prioritization standard — class A while the running revenue
    share is within 80%, B within 95%, C after. Shares are exact integer
    basis points (10000*cum // total) over a deterministic
    (revenue DESC, partkey) order.

    Scale shape: revenue collapses to part cardinality in ONE
    pre-aggregated exchange; the ordered running sum runs on the driver
    over that aggregate (the distributed path for a billion-part catalog
    is relational.global_rank + a bucketed prefix pass — pack_sequences
    shows the exclusive-scan machinery)."""
    from .bucketed import bucketed_group_reduce

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = pd.DataFrame(
            {"p_partkey": df["l_partkey"].to_numpy(dtype="int64"),
             "cents": _round_half_away(
                 df["l_extendedprice"].to_numpy()
                 * (1.0 - df["l_discount"].to_numpy()) * 100.0
             )}
        )
        return t.groupby("p_partkey", sort=False, as_index=False).sum()

    rev = bucketed_group_reduce(
        _read(sf_dir, "lineitem",
              ["l_partkey", "l_extendedprice", "l_discount"]),
        ["p_partkey"], partial,
        lambda g: g.groupby("p_partkey", sort=False, as_index=False)[
            "cents"].sum(),
        n_buckets=16,
    ).to_pandas()
    rev = rev.sort_values(["cents", "p_partkey"],
                          ascending=[False, True],
                          kind="stable").reset_index(drop=True)
    total = int(rev["cents"].sum())
    cum = np.cumsum(rev["cents"].to_numpy(dtype="int64"))
    bp = (10000 * cum) // max(total, 1)
    cls = np.where(bp <= 8000, "A", np.where(bp <= 9500, "B", "C"))
    return pd.DataFrame(
        {"p_partkey": rev["p_partkey"].astype("int64"),
         "revenue_cents": rev["cents"].astype("int64"),
         "cum_share_bp": bp.astype("int64"),
         "abc_class": cls}
    )


def cohort_ltv_curve(sf_dir: str):
    """Cohort LTV curve: users grouped by first-seen month, revenue
    accumulated by cohort age in months — the lifetime-value table behind
    every retention-economics decision (user_retention_cohorts is the
    count sibling; this adds the money axis and the cumulative curve).

    Scale shape: ONE bucketed exchange on user_id ships narrow (user,
    month, cents) rows; the in-bucket reduce derives each user's cohort
    (min month) and folds (cohort, age) sums right there — the user
    dimension never broadcasts and never re-shuffles; the (cohorts x
    ages)-bounded partials merge on the driver where the cumulative sum
    is a per-cohort prefix. Months are exact integers year*12+month."""
    from .bucketed import bucketed_group_reduce

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ts = df["ts"]
        mon = (ts.dt.year * 12 + (ts.dt.month - 1)).astype("int64")
        t = pd.DataFrame(
            {"user_id": df["user_id"].to_numpy(dtype="int64"),
             "mon": mon.to_numpy(),
             "cents": _round_half_away(df["value"].to_numpy() * 100.0)}
        )
        return t.groupby(["user_id", "mon"], sort=False,
                         as_index=False).sum()

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["user_id", "mon"], sort=False, as_index=False).sum()
        first = g.groupby("user_id", sort=False)["mon"].transform("min")
        t = pd.DataFrame(
            {"cohort_mon": first.to_numpy(),
             "age": (g["mon"] - first).to_numpy(),
             "cents": g["cents"].to_numpy(dtype="int64"),
             "u": (g["mon"] == first).to_numpy().astype("int64")}
        )
        return t.groupby(["cohort_mon", "age"], sort=False,
                         as_index=False).sum()

    parts = bucketed_group_reduce(
        _read(sf_dir, "events", ["user_id", "ts", "value"]),
        ["user_id"], partial, reduce, n_buckets=32,
    ).to_pandas()
    agg = parts.groupby(["cohort_mon", "age"], sort=False,
                        as_index=False).sum()
    agg = agg.sort_values(["cohort_mon", "age"],
                          kind="stable").reset_index(drop=True)
    agg["cum_cents"] = agg.groupby("cohort_mon", sort=False)[
        "cents"].cumsum()
    return pd.DataFrame(
        {"cohort_year": (agg["cohort_mon"] // 12).astype("int64"),
         "cohort_month": (agg["cohort_mon"] % 12 + 1).astype("int64"),
         "age_months": agg["age"].astype("int64"),
         "n_cohort_users": agg["u"].astype("int64"),
         "revenue_cents": agg["cents"].astype("int64"),
         "cum_revenue_cents": agg["cum_cents"].astype("int64")}
    )


def chi2_type_hour(sf_dir: str):
    """Chi-square independence statistic between event type and hour of
    day — the seasonality test telling a scheduler whether traffic mix
    shifts by hour. Exact rational arithmetic: with O the observed cell
    count and E = row*col/total, each term (O - E)^2/E equals
    total*(O*total - row*col)^2 / (total^2 * row * col); the statistic
    is emitted in micro-units via arbitrary-precision integer floor math
    (Python ints here, HUGEINT in the oracle) so it is bit-stable.

    Scale shape: ONE pre-aggregated exchange to the (types x 24)
    contingency table; the test itself is O(cells) driver arithmetic."""
    from .bucketed import bucketed_group_reduce

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = pd.DataFrame(
            {"event_type": df["event_type"],
             "hr": df["ts"].dt.hour.astype("int64"), "n": np.int64(1)}
        )
        return t.groupby(["event_type", "hr"], sort=False,
                         as_index=False).sum()

    cells = bucketed_group_reduce(
        _read(sf_dir, "events", ["event_type", "ts"]),
        ["event_type"], partial,
        lambda g: g.groupby(["event_type", "hr"], sort=False,
                            as_index=False)["n"].sum(),
        n_buckets=8,
    ).to_pandas()
    piv = cells.pivot_table(index="event_type", columns="hr", values="n",
                            aggfunc="sum", fill_value=0)
    O = piv.to_numpy().astype(object)  # python ints: no overflow
    row = O.sum(axis=1)
    col = O.sum(axis=0)
    total = int(O.sum())
    chi2_e6 = 0
    for i in range(O.shape[0]):
        for j in range(O.shape[1]):
            if row[i] and col[j]:
                num = int(O[i][j]) * total - int(row[i]) * int(col[j])
                chi2_e6 += (1_000_000 * total * num * num) // (
                    total * total * int(row[i]) * int(col[j])
                )
    dof = (O.shape[0] - 1) * (O.shape[1] - 1)
    return pd.DataFrame(
        {"n_events": [total], "n_types": [O.shape[0]],
         "n_hours": [O.shape[1]], "dof": [dof],
         "chi2_e6": [chi2_e6]}
    ).astype("int64")


def funnel_latency_percentiles(sf_dir: str):
    """Time-to-convert distribution: for every user whose first 'view' is
    later followed by a 'purchase', the elapsed micros between the first
    view and the first subsequent purchase — reported as pinned order
    statistics (lower median and the k = floor(0.95*(n-1))+1 p95) plus
    count and total. The funnel-latency SLA table next to the count-only
    funnel (funnel_view_click_purchase).

    Scale shape: ONE bucketed exchange on user_id ships narrow (user, ts,
    type-code) rows; the per-user first-view/first-purchase fold is a
    vectorized sorted scan per bucket emitting ONE elapsed value per
    converting user; the percentile pick runs on the driver over that
    converting-user-sized list (the fixed-bin histogram op is the path
    when even that is too big)."""
    from .bucketed import bucketed_group_reduce

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        m = df["event_type"].isin(["view", "purchase"])
        sub = df.loc[m]
        return pd.DataFrame(
            {"user_id": sub["user_id"].to_numpy(dtype="int64"),
             "ts_us": sub["ts"].to_numpy().astype("datetime64[us]")
                        .astype("int64"),
             "is_p": (sub["event_type"] == "purchase")
                        .to_numpy().astype("int64"),
             "event_id": sub["event_id"].to_numpy(dtype="int64")}
        )

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        # first view per user, then the first purchase strictly after it
        # in (ts, event_id) order — the tuple compare the oracle replays
        out = []
        for uid, grp in g.groupby("user_id", sort=False):
            grp = grp.sort_values(["ts_us", "event_id"], kind="stable")
            views = grp.loc[grp["is_p"] == 0]
            if views.empty:
                continue
            v_ts = int(views["ts_us"].iloc[0])
            v_id = int(views["event_id"].iloc[0])
            p = grp.loc[(grp["is_p"] == 1)
                        & ((grp["ts_us"] > v_ts)
                           | ((grp["ts_us"] == v_ts)
                              & (grp["event_id"] > v_id))), "ts_us"]
            if p.empty:
                continue
            out.append(int(p.iloc[0]) - v_ts)
        return pd.DataFrame({"elapsed_us": pd.Series(out, dtype="int64")})

    el = bucketed_group_reduce(
        _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"]),
        ["user_id"], partial, reduce, n_buckets=32,
    ).to_pandas()
    v = np.sort(el["elapsed_us"].to_numpy(dtype="int64"))
    n = len(v)
    if n == 0:
        return pd.DataFrame(
            {"n_converted": [0], "total_us": [0], "p50_us": [0],
             "p95_us": [0]}
        ).astype("int64")
    return pd.DataFrame(
        {"n_converted": [n], "total_us": [int(v.sum())],
         "p50_us": [int(v[(n + 1) // 2 - 1])],
         "p95_us": [int(v[(95 * (n - 1)) // 100])]}
    ).astype("int64")


def lm_transfer_matrix(sf_dir: str):
    """Cross-source LM transfer matrix: every source's token stream scored
    under every source's add-one unigram LM, in integer micro-nats — the
    cross-perplexity domain-similarity matrix data-selection methods
    (Moore-Lewis, DSIR) build their mixture weights from. Diagonal =
    in-domain fit; an off-diagonal close to its column's diagonal marks
    near-duplicate feeds.

    Scale shape: ONE bucketed exchange reduces the corpus to the
    (source x token) count table; the full matrix is then a fold over
    that vocab-sized aggregate on the driver — cross-scoring needs no
    second corpus pass because sum_t c_eval(t) * log P_model(t) only
    consumes counts. Each log is taken ONCE per (token, model) with
    scalar ``math.log`` (the engine's bit-stable float contract vs
    DuckDB ln()); everything after is order-free int sums."""
    import math

    from .bucketed import bucketed_group_reduce
    from .textstats import _tokens

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows: dict = {}
        for src, text in zip(df["source"], df["text"]):
            for tok in _tokens(text):
                rows[(src, tok)] = rows.get((src, tok), 0) + 1
        if not rows:
            return pd.DataFrame(
                {"source": pd.Series([], dtype=object),
                 "tok": pd.Series([], dtype=object),
                 "n": pd.Series([], dtype="int64")}
            )
        k = list(rows)
        return pd.DataFrame(
            {"source": [a for a, _ in k], "tok": [b for _, b in k],
             "n": pd.Series([rows[x] for x in k], dtype="int64")}
        )

    counts = bucketed_group_reduce(
        _read(sf_dir, "documents", ["source", "text"]),
        ["source", "tok"], partial,
        lambda g: g.groupby(["source", "tok"], sort=False,
                            as_index=False)["n"].sum(),
        n_buckets=32,
    ).to_pandas()
    vocab = sorted(counts["tok"].unique())
    v = len(vocab)
    sources = sorted(counts["source"].unique())
    totals = counts.groupby("source")["n"].sum().to_dict()
    cmap = {(r.source, r.tok): int(r.n) for r in counts.itertuples()}
    out = []
    for model in sources:
        denom = int(totals[model]) + v
        # one log per (token, model); OOV-for-model tokens share one value
        logp = {t: math.log((cmap.get((model, t), 0) + 1) / denom)
                for t in vocab}
        for ev in sources:
            s = 0
            n_tok = 0
            for t in vocab:
                c = cmap.get((ev, t), 0)
                if c:
                    s += c * int(_round_half_away(
                        np.array([logp[t] * 1e6]))[0])
                    n_tok += c
            out.append((ev, model, n_tok, s))
    return pd.DataFrame(
        out, columns=["src_eval", "src_model", "n_tokens", "micro_nats"]
    ).astype({"n_tokens": "int64", "micro_nats": "int64"})


def balanced_sample_per_label(sf_dir: str):
    """Class-balanced deterministic sampling: exactly min(32, class size)
    vectors per label, chosen by md5 priority — the rebalancing step
    before training a classifier on skewed labels (the per-class-cap
    complement of the fraction-based stratified_sample_per_source).

    Scale shape: the per-label cap makes per-batch partials safe (a
    batch's top-32-per-label is a superset of the global winners); ONE
    bucketed exchange on label collapses them to the true per-label
    bottom-32 priorities. Priority = md5_number_upper(vec_id), the
    engine's shared DuckDB-recomputable hash."""
    import hashlib

    from .bucketed import bucketed_group_reduce

    K = 32

    def prio(v) -> np.ndarray:
        return np.fromiter(
            (int.from_bytes(hashlib.md5(str(int(x)).encode()).digest()[:8],
                            "little") >> 1 for x in v),  # >>1: fits int64
            dtype="int64", count=len(v),
        )

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        t = pd.DataFrame(
            {"label": df["label"].to_numpy(dtype="int64"),
             "vec_id": df["vec_id"].to_numpy(dtype="int64")}
        )
        t["prio"] = prio(t["vec_id"])
        return (
            t.sort_values(["prio", "vec_id"], kind="stable")
            .groupby("label", sort=False).head(K)
        )

    out = bucketed_group_reduce(
        _read(sf_dir, "embeddings", ["vec_id", "label"]),
        ["label"], topk, topk, n_buckets=8,
    ).to_pandas()
    return pd.DataFrame(
        {"label": out["label"].astype("int64"),
         "vec_id": out["vec_id"].astype("int64")}
    ).sort_values(["label", "vec_id"]).reset_index(drop=True)


def rendezvous_shard_audit(sf_dir: str):
    """Rendezvous (highest-random-weight) sharding audit: assign every
    document its HRW shard under 16 and under 17 shards and measure how
    many move — consistent hashing's core guarantee (~1/17 of keys move
    when a shard is added, vs ~16/17 under mod-hashing). The shard-count
    resizing story for this engine's partitioned outputs and resumable
    manifests. Weights are md5_number_upper(doc_id || ':' || shard), ties
    -> lowest shard, so the oracle replays the argmax exactly.

    Scale shape: pure per-batch arithmetic (32 hashes per row, no state,
    no shuffle); the audit row folds from per-batch partial counts."""
    import hashlib

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(dtype="int64")
        best16 = np.zeros(len(ids), dtype="int64")
        best17 = np.zeros(len(ids), dtype="int64")
        w16 = np.full(len(ids), -1, dtype=object)
        w17 = np.full(len(ids), -1, dtype=object)
        for s in range(17):
            w = np.fromiter(
                (int.from_bytes(
                    hashlib.md5(f"{int(d)}:{s}".encode()).digest()[:8],
                    "little") for d in ids),
                dtype=object, count=len(ids),
            )
            if s < 16:
                m = w > w16
                best16[m] = s
                w16[m] = w[m]
            m = w > w17
            best17[m] = s
            w17[m] = w[m]
        moved = best16 != best17
        return pd.DataFrame(
            {"n_docs": [len(ids)], "n_moved": [int(moved.sum())]}
        )

    parts = (
        _read(sf_dir, "documents", ["doc_id"])
        .map_batches(assign, batch_format="pandas")
        .to_pandas()
    )
    n = int(parts["n_docs"].sum())
    mv = int(parts["n_moved"].sum())
    return pd.DataFrame(
        {"n_docs": [n], "n_moved": [mv],
         "moved_bp": [(10000 * mv) // max(n, 1)]}
    ).astype("int64")


def trending_tokens(sf_dir: str):
    """Trending-vocabulary detection: tokens whose frequency shifts most
    between the corpus's two halves (doc_id parity as the deterministic
    epoch proxy; in production the split is a date column) — the drift
    monitor run before refreshing a tokenizer or mixture. Score =
    integer micro-nat log ratio of add-one rates, top 20 by
    (|score| DESC, token ASC), minimum 5 occurrences overall.

    Scale shape: ONE bucketed exchange to (token, half) counts; the
    scored ranking folds over the vocab-sized aggregate on the driver
    with one scalar ``math.log`` per token (the engine's float
    contract)."""
    import math

    from .bucketed import bucketed_group_reduce
    from .textstats import _tokens

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows: dict = {}
        for doc_id, text in zip(df["doc_id"], df["text"]):
            h = int(doc_id) % 2
            for tok in _tokens(text):
                rows[(tok, h)] = rows.get((tok, h), 0) + 1
        k = list(rows)
        return pd.DataFrame(
            {"tok": [a for a, _ in k],
             "half": pd.Series([b for _, b in k], dtype="int64"),
             "n": pd.Series([rows[x] for x in k], dtype="int64")}
        )

    counts = bucketed_group_reduce(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        ["tok"], partial,
        lambda g: g.groupby(["tok", "half"], sort=False,
                            as_index=False)["n"].sum(),
        n_buckets=32,
    ).to_pandas()
    piv = counts.pivot_table(index="tok", columns="half", values="n",
                             aggfunc="sum", fill_value=0)
    c0 = piv.get(0, pd.Series(0, index=piv.index)).astype("int64")
    c1 = piv.get(1, pd.Series(0, index=piv.index)).astype("int64")
    t0, t1 = int(c0.sum()), int(c1.sum())
    keep = (c0 + c1) >= 5
    toks = piv.index[keep]
    score = {}
    for t in toks:
        r1 = (int(c1[t]) + 1) / (t1 + 1)
        r0 = (int(c0[t]) + 1) / (t0 + 1)
        score[t] = int(_round_half_away(
            np.array([math.log(r1 / r0) * 1e6]))[0])
    top = sorted(score, key=lambda t: (-abs(score[t]), t))[:20]
    return pd.DataFrame(
        {"token": top,
         "n_first_half": [int(c0[t]) for t in top],
         "n_second_half": [int(c1[t]) for t in top],
         "shift_micro_nats": [score[t] for t in top]}
    ).astype({"n_first_half": "int64", "n_second_half": "int64",
              "shift_micro_nats": "int64"})


def peak_concurrent_sessions(sf_dir: str):
    """Sweep-line peak concurrency: the maximum number of user sessions
    (30-min inactivity gap, inclusive [first,last] intervals) open at the
    same instant — the capacity-planning number behind connection pools
    and rate limits. A global running sum over ordered +1/-1 boundaries
    cannot tree-reduce naively, but it IS mergeable per time bin:
    max-prefix(bin) and sum(bin) compose as offset_k + max_prefix_k over
    bin order — the distributed sweep-line / prefix-scan decomposition.

    Scale shape: exchange 1 buckets events on user_id and folds each
    user's sessions to (start, end) boundary rows in-bucket; exchange 2
    buckets boundaries on the day bin and emits ONE (sum, max_prefix)
    row per bin; the driver composes ~days-many bin summaries. Ties at
    equal timestamps count starts before ends (inclusive overlap), same
    ordering in the SQL window oracle."""
    from .bucketed import bucketed_group_reduce

    GAP_US = 1_800_000_000
    BIN_US = 86_400_000_000

    def p1(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"user_id": df["user_id"].to_numpy(dtype="int64"),
             "t_us": df["ts"].to_numpy().astype("datetime64[us]")
                       .astype("int64"),
             "event_id": df["event_id"].to_numpy(dtype="int64")}
        )

    def r1(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "t_us", "event_id"],
                          kind="stable").reset_index(drop=True)
        gap = g.groupby("user_id", sort=False)["t_us"].diff()
        new_s = gap.isna() | (gap > GAP_US)
        sid = np.cumsum(new_s.to_numpy())
        t = pd.DataFrame({"s": sid, "t_us": g["t_us"].to_numpy()})
        sess = t.groupby("s", sort=False).agg(st=("t_us", "min"),
                                              en=("t_us", "max"))
        return pd.DataFrame(
            {"t": np.concatenate([sess["st"].to_numpy(),
                                  sess["en"].to_numpy()]).astype("int64"),
             "d": np.concatenate([np.ones(len(sess), dtype="int64"),
                                  -np.ones(len(sess), dtype="int64")])}
        )

    bounds = bucketed_group_reduce(
        _read(sf_dir, "events", ["event_id", "ts", "user_id"]),
        ["user_id"], p1, r1, n_buckets=32,
    )

    def p2(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["bin"] = out["t"].to_numpy(dtype="int64") // BIN_US
        return out

    def r2(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for b, grp in g.groupby("bin", sort=False):
            grp = grp.sort_values(["t", "d"], ascending=[True, False],
                                  kind="stable")
            c = np.cumsum(grp["d"].to_numpy(dtype="int64"))
            out.append((int(b), int(c[-1]), int(c.max()),
                        int(grp["d"].gt(0).sum())))
        return pd.DataFrame(
            out, columns=["bin", "sum_d", "max_prefix", "n_starts"]
        ).astype("int64")

    bins = bucketed_group_reduce(
        bounds, ["bin"], p2, r2, n_buckets=16,
    ).to_pandas()
    bins = bins.groupby("bin", sort=True, as_index=False).agg(
        sum_d=("sum_d", "sum"), max_prefix=("max_prefix", "max"),
        n_starts=("n_starts", "sum"),
    )
    # NB: a bin split across buckets can't happen (equal bins co-locate),
    # so max_prefix per bin is exact; compose offsets across sorted bins
    off = np.concatenate(
        [[0], np.cumsum(bins["sum_d"].to_numpy(dtype="int64"))[:-1]]
    )
    peak = int((off + bins["max_prefix"].to_numpy(dtype="int64")).max())
    return pd.DataFrame(
        {"n_sessions": [int(bins["n_starts"].sum())],
         "peak_concurrency": [peak]}
    ).astype("int64")


def vocab_jaccard_sources(sf_dir: str):
    """Vocabulary-overlap matrix: exact Jaccard between every pair of
    sources' distinct token SETS (the set-based companion to the
    frequency-weighted lm_transfer_matrix) — near-identical vocabularies
    flag mirrored feeds even when token frequencies differ.

    Scale shape: the corpus collapses to distinct (token, source) pairs
    in per-batch partials; ONE bucketed exchange on token; each token's
    source list emits its within-token source pairs (sources are few, so
    a token row fans out to at most C(sources,2) pair counts) and the
    per-pair intersection sums plus per-source set sizes fold driver-side
    into exact-integer Jaccard basis points."""
    from itertools import combinations

    from .bucketed import bucketed_group_reduce

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        from .textstats import _tokens

        seen = set()
        for src, text in zip(df["source"], df["text"]):
            for tok in _tokens(text):
                seen.add((tok, src))
        k = sorted(seen)
        return pd.DataFrame(
            {"tok": [a for a, _ in k], "source": [b for _, b in k]}
        )

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["tok", "source"])
        sizes = g.groupby("source", sort=False).size().rename("n")
        pair_counts: dict = {}
        for _, grp in g.groupby("tok", sort=False):
            srcs = sorted(grp["source"])
            for a, b in combinations(srcs, 2):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + 1
        rows = [("", s, int(n), 0) for s, n in sizes.items()]
        rows += [(a, b, 0, c) for (a, b), c in pair_counts.items()]
        return pd.DataFrame(
            rows, columns=["src_a", "src_b", "size_n", "inter_n"]
        ).astype({"size_n": "int64", "inter_n": "int64"})

    parts = bucketed_group_reduce(
        _read(sf_dir, "documents", ["source", "text"]),
        ["tok"], partial, reduce, n_buckets=32,
    ).to_pandas()
    sizes = (
        parts.loc[parts["src_a"] == ""]
        .groupby("src_b", sort=False)["size_n"].sum().to_dict()
    )
    inter = (
        parts.loc[parts["src_a"] != ""]
        .groupby(["src_a", "src_b"], sort=False)["inter_n"].sum()
    )
    out = []
    for (a, b), i in sorted(inter.items()):
        union = int(sizes[a]) + int(sizes[b]) - int(i)
        out.append((a, b, int(i), union, (10000 * int(i)) // max(union, 1)))
    return pd.DataFrame(
        out, columns=["src_a", "src_b", "inter_n", "union_n", "jaccard_bp"]
    ).astype({"inter_n": "int64", "union_n": "int64", "jaccard_bp": "int64"})


def turn_idx_integrity_audit(sf_dir: str):
    """Turn-ordering integrity audit over the derived transcript corpus:
    per conversation, duplicate turn_idx count, gap count and span —
    the ingest check a transcript pipeline runs before any
    order-dependent fold (the flagship's first-match semantics silently
    change if turn ids repeat or jump). The derived corpus has a
    BY-CONSTRUCTION gap at idx 1 for doc_id % 3 != 0 conversations, so
    the audit's output is non-trivial and the oracle reproduces it
    arithmetically.

    Scale shape: ONE bucketed exchange on conv_id over (conv, idx) int
    rows; per-conversation stats are one vectorized sorted pass per
    bucket."""
    from .bucketed import bucketed_group_reduce

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"conv_id": df["conv_id"],
             "turn_idx": df["turn_idx"].astype("int64")}
        )

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv_id", "turn_idx"], kind="stable")
        agg = g.groupby("conv_id", sort=False).agg(
            n_turns=("turn_idx", "size"),
            n_distinct=("turn_idx", "nunique"),
            mn=("turn_idx", "min"), mx=("turn_idx", "max"),
        ).reset_index()
        agg["n_dup_idx"] = (agg["n_turns"] - agg["n_distinct"]).astype("int64")
        agg["n_gaps"] = (agg["mx"] - agg["mn"] + 1
                         - agg["n_distinct"]).astype("int64")
        agg["starts_at_zero"] = agg["mn"] == 0
        return agg[["conv_id", "n_turns", "n_dup_idx", "n_gaps",
                    "starts_at_zero"]].astype(
            {"n_turns": "int64"})

    return bucketed_group_reduce(
        _docs_to_transcripts(sf_dir).select_columns(["conv_id", "turn_idx"]),
        ["conv_id"], partial, reduce, n_buckets=64,
    )


def token_concentration_per_source(sf_dir: str):
    """Vocabulary mass concentration: per source, the share of all token
    OCCURRENCES owned by its 10 most frequent tokens (basis points,
    top-10 picked by count DESC then token ASC) — the Zipf-head metric
    that separates templated feeds (head-heavy) from diverse prose.

    Scale shape: ONE bucketed exchange to (source, token) counts; the
    per-source top-10 and share fold over that vocab-sized aggregate
    driver-side (per-batch partials pre-combine, so the exchange carries
    batch x vocab rows at most)."""
    from .bucketed import bucketed_group_reduce
    from .textstats import _tokens

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows: dict = {}
        for src, text in zip(df["source"], df["text"]):
            for tok in _tokens(text):
                rows[(src, tok)] = rows.get((src, tok), 0) + 1
        k = list(rows)
        return pd.DataFrame(
            {"source": [a for a, _ in k], "tok": [b for _, b in k],
             "n": pd.Series([rows[x] for x in k], dtype="int64")}
        )

    counts = bucketed_group_reduce(
        _read(sf_dir, "documents", ["source", "text"]),
        ["source", "tok"], partial,
        lambda g: g.groupby(["source", "tok"], sort=False,
                            as_index=False)["n"].sum(),
        n_buckets=32,
    ).to_pandas()
    out = []
    for src, grp in counts.groupby("source", sort=False):
        total = int(grp["n"].sum())
        top = grp.sort_values(["n", "tok"], ascending=[False, True],
                              kind="stable").head(10)
        head = int(top["n"].sum())
        out.append((src, total, head, (10000 * head) // max(total, 1)))
    return pd.DataFrame(
        out, columns=["source", "total_tokens", "top10_tokens", "head_bp"]
    ).astype({"total_tokens": "int64", "top10_tokens": "int64",
              "head_bp": "int64"}).sort_values("source").reset_index(drop=True)


def doc_length_percentile_rank(sf_dir: str):
    """Percentile rank attached to EVERY document, computed distributed:
    pct_bp = 10000*(rank-1) // (N-1) over (n_chars, doc_id) order — the
    per-row percentile feature a curriculum or filtering stage consumes
    (and the distributed answer to RFM's driver-side quartiles: this one
    never collects the corpus). Reuses relational.global_rank's
    bin-offset machinery; the oracle is the row_number window."""
    from .relational import global_rank

    ranked, total = global_rank(
        _read(sf_dir, "documents", ["doc_id", "n_chars"]),
        "n_chars", "doc_id", bin_width=256,
    )
    denom = max(total - 1, 1)

    def pct(df: pd.DataFrame) -> pd.DataFrame:
        r = df["rank"].to_numpy(dtype="int64")
        return pd.DataFrame(
            {"doc_id": df["doc_id"].astype("int64"),
             "n_chars": df["n_chars"].astype("int64"),
             "pct_bp": (10000 * (r - 1)) // denom}
        )

    return ranked.map_batches(pct, batch_format="pandas")


def event_throttle_dedup(sf_dir: str):
    """Stream throttling / event-level dedup: within each (user, type)
    stream, suppress events arriving within 5 minutes of the last KEPT
    event — the client-retry / double-fire cleaner every event pipeline
    runs at ingest. Note the stateful subtlety: the gate compares to the
    last KEPT event (a running anchor), not the previous row — a burst
    of N retries collapses to ceil(span/5min) keepers, which a naive
    LAG-based filter gets wrong. Output kept/suppressed counts per type.

    Scale shape: ONE bucketed exchange on user_id; the anchor scan is
    per-(user,type) sequential — bounded by a user's own stream, the
    same partitioning contract as sessionize; per-type counts fold from
    bucket partials. The oracle replays the anchor recurrence as a
    recursive CTE."""
    from .bucketed import bucketed_group_reduce

    WIN_US = 300_000_000

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"user_id": df["user_id"].to_numpy(dtype="int64"),
             "event_type": df["event_type"],
             "t_us": df["ts"].to_numpy().astype("datetime64[us]")
                       .astype("int64"),
             "event_id": df["event_id"].to_numpy(dtype="int64")}
        )

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "event_type", "t_us", "event_id"],
                          kind="stable").reset_index(drop=True)
        kept = np.zeros(len(g), dtype=bool)
        # per-(user,type) anchor scan; python loop over STREAMS not rows:
        # each stream's scan is a short numpy walk (kept-anchor jumps)
        for _, grp in g.groupby(["user_id", "event_type"], sort=False):
            ts = grp["t_us"].to_numpy()
            idx = grp.index.to_numpy()
            i = 0
            while i < len(ts):
                kept[idx[i]] = True
                nxt = np.searchsorted(ts, ts[i] + WIN_US, side="left")
                i = max(nxt, i + 1)
        t = pd.DataFrame(
            {"event_type": g["event_type"],
             "kept": kept.astype("int64"),
             "supp": (~kept).astype("int64")}
        )
        return t.groupby("event_type", sort=False, as_index=False).sum()

    parts = bucketed_group_reduce(
        _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"]),
        ["user_id"], partial, reduce, n_buckets=32,
    ).to_pandas()
    out = parts.groupby("event_type", sort=False, as_index=False)[
        ["kept", "supp"]
    ].sum()
    return pd.DataFrame(
        {"event_type": out["event_type"],
         "n_kept": out["kept"].astype("int64"),
         "n_suppressed": out["supp"].astype("int64")}
    ).sort_values("event_type").reset_index(drop=True)


def ks_length_drift_per_source(sf_dir: str):
    """Two-sample Kolmogorov-Smirnov drift: for every source, the KS
    statistic between its document-length distribution and the whole
    corpus — the distribution-shift monitor behind per-source quality
    regressions. Exact rational arithmetic: the max runs over the
    integer |cum_src * N_total - cum_all * n_src| and only the final
    statistic is floored to basis points, so there is no float anywhere.

    Scale shape: ONE exchange to (source, n_chars) counts (value domain
    is bounded); the CDF grid walk folds over that histogram-sized
    aggregate on the driver."""
    from .bucketed import bucketed_group_reduce

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = pd.DataFrame(
            {"source": df["source"],
             "n_chars": df["n_chars"].to_numpy(dtype="int64"),
             "n": np.int64(1)}
        )
        return t.groupby(["source", "n_chars"], sort=False,
                         as_index=False).sum()

    counts = bucketed_group_reduce(
        _read(sf_dir, "documents", ["source", "n_chars"]),
        ["source", "n_chars"], partial,
        lambda g: g.groupby(["source", "n_chars"], sort=False,
                            as_index=False)["n"].sum(),
        n_buckets=16,
    ).to_pandas()
    values = np.sort(counts["n_chars"].unique())
    all_cum = (
        counts.groupby("n_chars")["n"].sum()
        .reindex(values, fill_value=0).cumsum().to_numpy(dtype="int64")
    )
    N = int(all_cum[-1])
    out = []
    for src, grp in counts.groupby("source", sort=False):
        cum = (
            grp.groupby("n_chars")["n"].sum()
            .reindex(values, fill_value=0).cumsum().to_numpy(dtype="int64")
        )
        ns = int(cum[-1])
        diff = np.abs(cum * N - all_cum * ns)
        ks_num = int(diff.max())
        out.append((src, ns, (10000 * ks_num) // (ns * N)))
    return pd.DataFrame(
        out, columns=["source", "n_docs", "ks_bp"]
    ).astype({"n_docs": "int64", "ks_bp": "int64"}).sort_values(
        "source").reset_index(drop=True)


def _ed_le1(a: str, b: str) -> bool:
    """Exact edit-distance <= 1 check (two-pointer, O(len))."""
    if a == b:
        return True
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:  # exactly one substitution allowed
        return sum(x != y for x, y in zip(a, b)) == 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    i = j = diff = 0
    while i < la and j < lb:
        if a[i] == b[j]:
            i += 1
            j += 1
        else:
            diff += 1
            if diff > 1:
                return False
            j += 1  # skip the inserted char in the longer string
    return True


def typo_token_clusters(sf_dir: str):
    """Fuzzy reference-code matching, SymSpell-style: the corpus's order
    reference codes ('AB' || doc_id || 'X', the E5 extractor's grammar)
    clustered by edit distance <= 1 — the OCR-misread / typo'd-ticket-id
    reconciliation every document pipeline needs when free-text codes
    must join against a master list. Candidate generation is the
    deletion-neighborhood trick (two strings at ED <= 1 ALWAYS share a
    single-deletion key, so blocking is complete, never approximate);
    candidates are verified with an exact two-pointer ED check, and the
    toy-scale SQL oracle cross-joins the code list with DuckDB's
    levenshtein() + the same recursive-CC shape as dedup_clusters.

    Scale shape: ONE bucketed exchange on the deletion key (each code
    emits len+1 keys — narrow string rows, not documents); within-bucket
    verification touches only key-sharing candidates; the surviving pair
    list is code-vocabulary-bounded and feeds the engine's hybrid
    connected-components. Output (token, cluster_rep) for clustered
    codes."""
    from itertools import combinations

    import ray.data as _rd

    from .bucketed import bucketed_group_reduce
    from .graph import connected_components

    def vocab_partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"tok": ["AB" + str(int(d)) + "X" for d in df["doc_id"]]}
        )

    def key_explode(df: pd.DataFrame) -> pd.DataFrame:
        toks, keys = [], []
        for tok in df["tok"].drop_duplicates():
            variants = {tok} | {tok[:i] + tok[i + 1:]
                                for i in range(len(tok))}
            for k in variants:
                toks.append(tok)
                keys.append(k)
        return pd.DataFrame({"key": keys, "tok": toks})

    def pair_verify(g: pd.DataFrame) -> pd.DataFrame:
        out = set()
        for _, grp in g.groupby("key", sort=False):
            cand = sorted(grp["tok"].drop_duplicates())
            for a, b in combinations(cand, 2):
                if _ed_le1(a, b):
                    out.add((a, b))
        k = sorted(out)
        return pd.DataFrame(
            {"tok_a": [a for a, _ in k], "tok_b": [b for _, b in k]}
        )

    pairs = bucketed_group_reduce(
        _read(sf_dir, "documents", ["doc_id"]).map_batches(
            vocab_partial, batch_format="pandas"
        ).map_batches(key_explode, batch_format="pandas"),
        ["key"], lambda df: df, pair_verify, n_buckets=32,
    ).to_pandas().drop_duplicates(["tok_a", "tok_b"])
    if pairs.empty:
        return pd.DataFrame(
            {"token": pd.Series([], dtype=object),
             "cluster_rep": pd.Series([], dtype=object)}
        )
    vocab = sorted(set(pairs["tok_a"]) | set(pairs["tok_b"]))
    tid = {t: i for i, t in enumerate(vocab)}
    idpairs = pd.DataFrame(
        {"doc_a": [tid[t] for t in pairs["tok_a"]],
         "doc_b": [tid[t] for t in pairs["tok_b"]]}
    ).astype("int64")
    cc = connected_components(_rd.from_pandas(idpairs)).to_pandas()
    return pd.DataFrame(
        {"token": [vocab[int(i)] for i in cc["doc_id"]],
         "cluster_rep": [vocab[int(c)] for c in cc["cluster_id"]]}
    ).sort_values("token").reset_index(drop=True)


def gini_user_activity(sf_dir: str):
    """Gini coefficient of per-user event activity — the single-number
    skew summary behind "10% of users generate 90% of traffic" capacity
    decisions (and this engine's own hot-key salting choices). Exact
    rational arithmetic on the sorted-cumulative formula
    G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)), floored once to
    basis points.

    Scale shape: per-user counts collapse in ONE bucketed exchange; the
    sorted index-weighted sum folds over that user-cardinality aggregate
    on the driver (relational.global_rank is the distributed path when
    even the user table is too big)."""
    from .bucketed import bucketed_group_reduce

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = pd.DataFrame(
            {"user_id": df["user_id"].to_numpy(dtype="int64"),
             "n": np.int64(1)}
        )
        return t.groupby("user_id", sort=False, as_index=False).sum()

    u = bucketed_group_reduce(
        _read(sf_dir, "events", ["user_id"]),
        ["user_id"], partial,
        lambda g: g.groupby("user_id", sort=False, as_index=False)["n"].sum(),
        n_buckets=16,
    ).to_pandas()
    x = np.sort(u["n"].to_numpy(dtype="int64"))
    n = len(x)
    s0 = int(x.sum())
    s1 = int((np.arange(1, n + 1, dtype="int64") * x).sum())
    gini_bp = (10000 * (2 * s1 - (n + 1) * s0)) // max(n * s0, 1)
    return pd.DataFrame(
        {"n_users": [n], "n_events": [s0], "gini_bp": [int(gini_bp)]}
    ).astype("int64")


def fano_burstiness_per_type(sf_dir: str):
    """Fano factor (variance-to-mean ratio of hourly counts) per event
    type — the burstiness test separating Poisson-like steady streams
    (F~1) from bursty ones (F>>1), the signal behind batch-size and
    rate-limit tuning. Exact rational: with hourly counts x over the
    type's n PRESENT hours, F = n*(n*sum(x^2) - sum(x)^2) /
    ((n-1)*n*sum(x)) floored once to micro-units.

    Scale shape: raw rows collapse to (type, hour) cells in per-batch
    partials, ONE bucketed exchange on type, and the three integer
    moments fold per type in-bucket."""
    from .bucketed import bucketed_group_reduce

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = pd.DataFrame(
            {"event_type": df["event_type"],
             "hr": df["ts"].dt.floor("h").to_numpy()
                     .astype("datetime64[us]").astype("int64"),
             "n": np.int64(1)}
        )
        return t.groupby(["event_type", "hr"], sort=False,
                         as_index=False).sum()

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["event_type", "hr"], sort=False, as_index=False).sum()
        out = []
        for et, grp in g.groupby("event_type", sort=False):
            x = grp["n"].to_numpy(dtype="int64")
            n = len(x)
            sx = int(x.sum())
            sxx = int((x * x).sum())
            if n < 2 or sx == 0:
                out.append((et, n, sx, -1))
                continue
            fano_e6 = (1_000_000 * n * (n * sxx - sx * sx)) // (
                (n - 1) * n * sx
            )
            out.append((et, n, sx, int(fano_e6)))
        return pd.DataFrame(
            out, columns=["event_type", "n_hours", "n_events", "fano_e6"]
        ).astype({"n_hours": "int64", "n_events": "int64",
                  "fano_e6": "int64"})

    return bucketed_group_reduce(
        _read(sf_dir, "events", ["event_type", "ts"]),
        ["event_type"], partial, reduce, n_buckets=8,
    )


def auto_join_revenue_by_priority(sf_dir: str):
    """Revenue per order priority through the size-aware join dispatcher
    (relational.auto_join): the build side is COUNTED first and the
    engine picks broadcast (no shuffle) or the tagged-union co-partition
    exchange — here orders at sf0.1 sits under the default threshold so
    the broadcast path fires, while the forced-low-threshold pytest pins
    the co-partition path to the same rows. The per-query hand-picking
    the other TPC-H shapes do, automated.

    Scale shape: whichever path wins, lineitem is pre-projected to
    (orderkey, cents) inside its scan tasks before the join."""
    from .bucketed import bucketed_group_reduce
    from .relational import auto_join

    def li_proj(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"l_orderkey": df["l_orderkey"].to_numpy(dtype="int64"),
             "cents": _round_half_away(
                 df["l_extendedprice"].to_numpy()
                 * (1.0 - df["l_discount"].to_numpy()) * 100.0
             )}
        )

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount"]).map_batches(
        li_proj, batch_format="pandas"
    )
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderpriority"]).map_batches(
        lambda df: df.rename(columns={"o_orderkey": "l_orderkey"}),
        batch_format="pandas",
    )
    joined = auto_join(li, orders, "l_orderkey",
                       ["cents"], ["o_orderpriority"])
    agg = bucketed_group_reduce(
        joined, ["o_orderpriority"],
        lambda df: df.groupby("o_orderpriority", sort=False,
                              as_index=False)["cents"].sum(),
        lambda g: g.groupby("o_orderpriority", sort=False,
                            as_index=False)["cents"].sum(),
        n_buckets=4,
    ).to_pandas()
    return pd.DataFrame(
        {"o_orderpriority": agg["o_orderpriority"],
         "revenue_cents": agg["cents"].astype("int64")}
    ).sort_values("o_orderpriority").reset_index(drop=True)


def markov_conditional_entropy(sf_dir: str):
    """Conditional entropy H(next | current) of the event-type Markov
    chain, per current type and overall — the predictability measure of
    a user stream (0 = deterministic next step, log(types) = uniform):
    the information-theoretic complement to the stationary-distribution
    and transition-count ops. Per-from-type entropy in integer
    micro-nats: H_i = -sum_j (c_ij/row_i) ln(c_ij/row_i), each term
    rounded once from one scalar ``math.log`` (the engine's float
    contract), the weighted total an exact integer combination.

    Scale shape: the distributed work is the (types x types) transition
    count (event_transitions' bucketed sort+shift); the entropy fold is
    O(types^2) driver arithmetic on that tiny table."""
    import math

    trans = event_transitions(sf_dir)
    rows = []
    total_n = int(trans["n"].sum())
    weighted = 0
    for frm, grp in trans.groupby("from_type", sort=False):
        row = int(grp["n"].sum())
        h = 0
        for n in grp["n"]:
            # term = -(c/row)*ln(c/row) in micro-nats, one log per cell
            t = -math.log(int(n) / row) * (int(n) / row) * 1e6
            h += int(_round_half_away(np.array([t]))[0])
        rows.append((frm, row, h))
        weighted += row * h
    out = pd.DataFrame(
        rows, columns=["from_type", "n_transitions", "h_micro_nats"]
    ).sort_values("from_type").reset_index(drop=True)
    out["n_transitions"] = out["n_transitions"].astype("int64")
    out["h_micro_nats"] = out["h_micro_nats"].astype("int64")
    overall = pd.DataFrame(
        {"from_type": ["__ALL__"], "n_transitions": [total_n],
         "h_micro_nats": [weighted // max(total_n, 1)]}
    ).astype({"n_transitions": "int64", "h_micro_nats": "int64"})
    return pd.concat([out, overall], ignore_index=True)


def benford_first_digit_orders(sf_dir: str):
    """Benford's-law first-digit audit of order totals — the classic
    fabricated-numbers screen (synthetic or manipulated monetary data
    drifts from the log-curve). Per leading digit of the integer-cents
    total: observed count, observed share (basis points) and the Benford
    expectation ln(1+1/d)/ln(10) in micro-units (one scalar ``math.log``
    pair per digit — the float contract), plus the absolute gap.

    Scale shape: the first digit is per-batch string arithmetic on the
    pruned o_totalprice column; the 9-row digit histogram folds from
    per-batch partials, no shuffle."""
    import math

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = _cents(df["o_totalprice"])
        first = pd.Series(cents).astype(str).str[0].astype("int64")
        t = pd.DataFrame({"digit": first, "n": np.int64(1)})
        return t.groupby("digit", sort=False, as_index=False).sum()

    parts = (
        _read(sf_dir, "orders", ["o_totalprice"])
        .map_batches(partial, batch_format="pandas")
        .to_pandas()
        .groupby("digit", sort=True, as_index=False)["n"].sum()
    )
    total = int(parts["n"].sum())
    rows = []
    for d, n in zip(parts["digit"], parts["n"]):
        obs_bp = (10000 * int(n)) // total
        exp_e6 = int(_round_half_away(
            np.array([math.log(1 + 1 / int(d)) / math.log(10) * 1e6]))[0])
        rows.append((int(d), int(n), obs_bp, exp_e6,
                     abs(obs_bp * 100 - exp_e6)))
    return pd.DataFrame(
        rows, columns=["digit", "n_orders", "observed_bp",
                       "benford_e6", "gap_e6"]
    ).astype("int64")


def minhash_eval_pr(sf_dir: str):
    """Sketch-quality evaluation harness: the MinHash+LSH near-dup pair
    set (dedup_minhash: 128 perms, 16 bands, est >= 0.9) scored against
    the EXACT 3-gram-Jaccard >= 0.9 ground truth — precision/recall in
    basis points, the accept/reject evidence before trusting a sketch at
    fleet scale. Ground truth uses an exact-integer gate (10*inter >=
    9*union) over a shingle inverted index, so the oracle reproduces both
    pair sets bit for bit (the sketch side via the engine's exported
    permutation CTE).

    Scale shape: the truth index is ONE bucketed exchange on the shingle
    (pairs fan out only within a shingle's doc list — at the 0.9
    threshold truth is sparse; at fleet scale the harness runs on a
    sampled stratum because exhaustive ground truth is quadratic BY
    DEFINITION, which is exactly why the sketch exists); the sketch side
    reuses dedup_minhash unchanged."""
    from itertools import combinations

    from .bucketed import bucketed_group_reduce
    from .textstats import _tokens

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def sh_partial(df: pd.DataFrame) -> pd.DataFrame:
        ids, shs = [], []
        for d, t in zip(df["doc_id"], df["text"]):
            toks = _tokens(t)
            for s in {" ".join(toks[i:i + 3])
                      for i in range(len(toks) - 2)}:
                ids.append(int(d))
                shs.append(s)
        return pd.DataFrame(
            {"doc_id": pd.Series(ids, dtype="int64"), "s": shs}
        )

    sh = docs.map_batches(sh_partial, batch_format="pandas")
    sizes = (
        sh.map_batches(
            lambda df: df.groupby("doc_id", sort=False).size()
            .rename("n").reset_index(),
            batch_format="pandas",
        ).to_pandas().groupby("doc_id")["n"].sum().to_dict()
    )

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df

    def pair_reduce(g: pd.DataFrame) -> pd.DataFrame:
        cnt: dict = {}
        for _, grp in g.groupby("s", sort=False):
            ds = sorted(grp["doc_id"].drop_duplicates())
            for a, b in combinations(ds, 2):
                cnt[(a, b)] = cnt.get((a, b), 0) + 1
        k = list(cnt)
        return pd.DataFrame(
            {"doc_a": pd.Series([a for a, _ in k], dtype="int64"),
             "doc_b": pd.Series([b for _, b in k], dtype="int64"),
             "i": pd.Series([cnt[x] for x in k], dtype="int64")}
        )

    inter = (
        bucketed_group_reduce(sh, ["s"], pair_partial, pair_reduce,
                              n_buckets=64)
        .to_pandas()
        .groupby(["doc_a", "doc_b"], as_index=False)["i"].sum()
    )
    truth = set()
    for r in inter.itertuples():
        na, nb = int(sizes[int(r.doc_a)]), int(sizes[int(r.doc_b)])
        if 10 * int(r.i) >= 9 * (na + nb - int(r.i)):
            truth.add((int(r.doc_a), int(r.doc_b)))

    mh = dedup_minhash(sf_dir).to_pandas()
    sketch = set(zip((int(a) for a in mh["doc_a"]),
                     (int(b) for b in mh["doc_b"])))
    tp = len(truth & sketch)
    fp = len(sketch - truth)
    fn = len(truth - sketch)
    return pd.DataFrame(
        {"n_truth": [len(truth)], "n_sketch": [len(sketch)],
         "tp": [tp], "fp": [fp], "fn": [fn],
         "precision_bp": [(10000 * tp) // max(tp + fp, 1)],
         "recall_bp": [(10000 * tp) // max(tp + fn, 1)]}
    ).astype("int64")


def ann_recall_eval(sf_dir: str):
    """ANN quality harness: recall of the product-quantization index's
    top-k against the brute-force exact top-k — the measurement every
    approximate index must pass before it replaces exact search in a
    retrieval pipeline (the query-side sibling of minhash_eval_pr).
    Composes the two existing operators unchanged. Rows-only oracle by
    nature: the PQ side is a trained codebook (k-means fit), the same
    reason knn_pq_topk itself is rows-only — the IVF full-probe variant
    would be SQL-checkable but trivially 100%.

    Scale shape: both sides are the already-distributed knn operators;
    the overlap count folds over the (queries x k)-sized result tables
    on the driver."""
    bf = knn_cosine_topk(sf_dir)
    bf = bf.to_pandas() if hasattr(bf, "to_pandas") else bf
    iv = knn_pq_topk(sf_dir)
    iv = iv.to_pandas() if hasattr(iv, "to_pandas") else iv
    truth = set(zip((int(q) for q in bf["query_id"]),
                    (int(n) for n in bf["neighbor_id"])))
    approx = set(zip((int(q) for q in iv["query_id"]),
                     (int(n) for n in iv["neighbor_id"])))
    n_q = bf["query_id"].nunique()
    k = len(bf) // max(n_q, 1)
    hit = len(truth & approx)
    return pd.DataFrame(
        {"n_queries": [int(n_q)], "k": [int(k)],
         "n_truth": [len(truth)], "n_hits": [hit],
         "recall_bp": [(10000 * hit) // max(len(truth), 1)]}
    ).astype("int64")


def theil_index_user_activity(sf_dir: str):
    """Theil T index of per-user event activity — the decomposable
    entropy-based inequality measure next to the Gini op (Theil, unlike
    Gini, splits exactly into between-group + within-group terms, which
    is why mixture audits prefer it). T = (1/n) sum_i (x_i/mu) ln(x_i/mu),
    emitted in micro-nats: one scalar ``math.log`` per DISTINCT activity
    level (not per user — levels repeat heavily), then an exact integer
    combination of level counts.

    Scale shape: per-user counts collapse in ONE bucketed exchange; the
    level histogram (distinct-count-valued, tiny) folds driver-side."""
    import math

    from .bucketed import bucketed_group_reduce

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = pd.DataFrame(
            {"user_id": df["user_id"].to_numpy(dtype="int64"),
             "n": np.int64(1)}
        )
        return t.groupby("user_id", sort=False, as_index=False).sum()

    u = bucketed_group_reduce(
        _read(sf_dir, "events", ["user_id"]),
        ["user_id"], partial,
        lambda g: g.groupby("user_id", sort=False, as_index=False)["n"].sum(),
        n_buckets=16,
    ).to_pandas()
    n_users = len(u)
    total = int(u["n"].sum())
    levels = u.groupby("n").size()  # activity level -> #users at it
    theil = 0
    for x, cnt in levels.items():
        # (x/mu) ln(x/mu) in micro-nats, one log per level; mu = total/n
        r = int(x) * n_users / total
        term = int(_round_half_away(np.array([r * math.log(r) * 1e6]))[0])
        theil += int(cnt) * term
    return pd.DataFrame(
        {"n_users": [n_users], "n_events": [total],
         "theil_micro_nats": [theil // max(n_users, 1)]}
    ).astype("int64")


def fill_rate_by_conv_length(sf_dir: str):
    """Extraction fill rate by conversation length: conversations bucketed
    by turn count (1-2, 3-4, 5-8, 9+), with invoice-number fill counts
    per bucket — the diagnostic that catches extraction quality silently
    degrading on long conversations (first-match folds can starve when
    the signal is buried deep). Composes the full flagship pipeline; the
    oracle wraps the flagship's own SQL as a subquery.

    Scale shape: the fold output collapses to 4 bucket rows inside
    map_batches partials — nothing conversation-sized reaches the
    driver."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n_turns"].astype("int64").to_numpy()
        bucket = np.where(n <= 2, "1-2",
                          np.where(n <= 4, "3-4",
                                   np.where(n <= 8, "5-8", "9+")))
        t = pd.DataFrame(
            {"turn_bucket": bucket, "n_convs": np.int64(1),
             "n_invoice_filled": df["invoice_number"].notna()
                .to_numpy().astype("int64")}
        )
        return t.groupby("turn_bucket", sort=False, as_index=False).sum()

    parts = (
        transcript_extract(sf_dir)
        .map_batches(partial, batch_format="pandas")
        .to_pandas()
        .groupby("turn_bucket", sort=True, as_index=False)
        .sum()
    )
    return pd.DataFrame(
        {"turn_bucket": parts["turn_bucket"],
         "n_convs": parts["n_convs"].astype("int64"),
         "n_invoice_filled": parts["n_invoice_filled"].astype("int64"),
         "fill_bp": ((10000 * parts["n_invoice_filled"])
                     // parts["n_convs"]).astype("int64")}
    )


def corr_value_hour_per_type(sf_dir: str):
    """Pearson correlation of event value vs hour-of-day, per event type —
    the numeric-profile aggregate. All five moments (n, Σx, Σy, Σx², Σy²,
    Σxy) accumulate as exact int64 (value in cents, hour 0-23), so the
    final correlation is ONE identical float expression over identical ints
    in both engines — bit-stable without float-sum-order concerns.

    Scale shape: per-batch moment partials (5 ints per type per batch) into
    a bucketed reduce over the tiny type domain; no row shuffle."""
    from .bucketed import bucketed_group_reduce

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        x = _cents(df["value"]).astype("int64")
        y = df["ts"].dt.hour.to_numpy(dtype="int64")
        t = pd.DataFrame(
            {"event_type": df["event_type"], "n": 1, "sx": x, "sy": y,
             "sxx": x * x, "syy": y * y, "sxy": x * y}
        )
        return t.groupby("event_type", sort=False, as_index=False).sum()

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("event_type", sort=False, as_index=False)[
            ["n", "sx", "sy", "sxx", "syy", "sxy"]
        ].sum()

    m = bucketed_group_reduce(
        _read(sf_dir, "events", ["event_type", "value", "ts"]),
        ["event_type"], partial, reduce, n_buckets=8,
    ).to_pandas()
    n = m["n"].to_numpy(dtype="float64")
    sx = m["sx"].to_numpy(dtype="float64")
    sy = m["sy"].to_numpy(dtype="float64")
    cov = n * m["sxy"].to_numpy(dtype="float64") - sx * sy
    vx = n * m["sxx"].to_numpy(dtype="float64") - sx * sx
    vy = n * m["syy"].to_numpy(dtype="float64") - sy * sy
    return pd.DataFrame(
        {
            "event_type": m["event_type"],
            "n": m["n"].astype("int64"),
            "corr_value_hour": cov / np.sqrt(vx * vy),
        }
    )


def attribution_click_purchase(sf_dir: str):
    """Windowed self-join: for every purchase, the number of clicks by the
    same user in the preceding hour (inclusive on both ends) — the
    stream-join / attribution primitive.

    Scale shape: project to 4 narrow columns at the scan, filter to the two
    event types per batch, ONE hash-bucket shuffle on user_id, then inside
    each bucket a globally-sorted vectorized ``merge_asof`` pair (upper
    bound at t, lower bound just before t-1h against the per-user running
    click count) — no per-user Python, no row-pair blowup: output is one
    row per purchase regardless of click density."""
    from .bucketed import bucketed_group_reduce

    out_cols = {"event_id": "int64", "user_id": "int64", "n_clicks_1h": "int64"}

    def empty() -> pd.DataFrame:
        return pd.DataFrame({c: pd.Series(dtype=t) for c, t in out_cols.items()})

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        m = df["event_type"].isin(("click", "purchase"))
        return df.loc[m, ["event_id", "ts", "user_id", "event_type"]]

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        purch = g[g["event_type"] == "purchase"]
        if purch.empty:
            return empty()
        purch = purch.sort_values("ts", kind="mergesort")
        clicks = g[g["event_type"] == "click"].sort_values("ts", kind="mergesort")
        if clicks.empty:
            return pd.DataFrame(
                {
                    "event_id": purch["event_id"].to_numpy(),
                    "user_id": purch["user_id"].to_numpy(),
                    "n_clicks_1h": np.zeros(len(purch), dtype="int64"),
                }
            )
        # per-user running click count; asof-backward at ts t then picks the
        # LAST duplicate-ts row, i.e. #clicks with ts <= t. Merge on int64
        # epoch-us (Timedelta arithmetic silently promotes us -> ns).
        clicks = pd.DataFrame(
            {
                "t_us": clicks["ts"].to_numpy().astype("datetime64[us]").astype("int64"),
                "user_id": clicks["user_id"].to_numpy(),
                "cum": clicks.groupby("user_id", sort=False).cumcount().to_numpy() + 1,
            }
        )
        p_us = purch["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        p_keys = pd.DataFrame({"t_us": p_us, "user_id": purch["user_id"].to_numpy()})
        hi = pd.merge_asof(
            p_keys, clicks, on="t_us", by="user_id",
            direction="backward", allow_exact_matches=True,
        )["cum"].fillna(0).to_numpy(dtype="int64")
        lo_keys = p_keys.assign(t_us=p_us - 3_600_000_000)
        # strictly-before t-1h => excluded prefix (window is [t-1h, t])
        lo = pd.merge_asof(
            lo_keys, clicks, on="t_us", by="user_id",
            direction="backward", allow_exact_matches=False,
        )["cum"].fillna(0).to_numpy(dtype="int64")
        return pd.DataFrame(
            {
                "event_id": purch["event_id"].to_numpy(),
                "user_id": purch["user_id"].to_numpy(),
                "n_clicks_1h": hi - lo,
            }
        )

    return bucketed_group_reduce(
        _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"]),
        ["user_id"], partial, reduce, n_buckets=64,
    )


def running_revenue_per_customer(sf_dir: str):
    """Running cumulative order revenue per customer (window-function
    SUM OVER PARTITION BY ... ORDER BY). Cents are int64 so the cumsum is
    exact and order-stable; o_orderkey breaks date ties totally.

    Scale shape: narrow projection + per-row cents at the scan batches, one
    hash-bucket shuffle on o_custkey, vectorized sort + pandas groupby
    cumsum (C kernel, no per-customer Python) inside each bucket."""
    from .bucketed import bucketed_group_reduce

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_orderkey": df["o_orderkey"],
                "o_custkey": df["o_custkey"],
                "o_orderdate": df["o_orderdate"],
                "cents": _cents(df["o_totalprice"]).astype("int64"),
            }
        )

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_custkey", "o_orderdate", "o_orderkey"],
                          kind="mergesort")
        run = g.groupby("o_custkey", sort=False)["cents"].cumsum()
        return pd.DataFrame(
            {
                "o_orderkey": g["o_orderkey"].to_numpy(),
                "o_custkey": g["o_custkey"].to_numpy(),
                "run_cents": run.to_numpy(dtype="int64"),
            }
        )

    return bucketed_group_reduce(
        _read(sf_dir, "orders",
              ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]),
        ["o_custkey"], partial, reduce, n_buckets=64,
    )


# HyperLogLog: p=10 -> m=1024 registers; alpha_m = 0.7213/(1+1.079/m) pinned
# as an integer micro literal so the uncorrected estimate is exact integer
# arithmetic (identical in Ray and SQL).
_HLL_P = 10
_HLL_M = 1 << _HLL_P
_HLL_ALPHA_MICRO = 720541


def _hll_rho(rest: np.ndarray) -> np.ndarray:
    """rho = leading-zero count of the (64-p)-bit remainder + 1, vectorized
    bit-length by binary reduction (exact — no float log2)."""
    r = rest.astype(np.uint64, copy=True)
    bl = np.zeros(len(r), dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        m = r >= (np.uint64(1) << np.uint64(s))
        bl[m] += s
        r[m] >>= np.uint64(s)
    bl += (r == 1).astype(np.int64)
    return (64 - _HLL_P + 1) - bl  # rest==0 -> bl=0 -> rho = w+1


def hll_users_per_type(sf_dir: str):
    """Deterministic HyperLogLog distinct-user sketch per event type: the
    mergeable cardinality artifact for the 100 TB distinct path (registers
    shuffle as <= m tiny int rows per type per batch — the raw user ids
    never leave the scan tasks). Output = the register table
    (event_type, bucket, rho) plus the raw HLL estimate ``est`` derived
    from it with exact integer arithmetic (no small-range correction — at
    production scale the linear-counting branch applies below 2.5m distinct,
    where you'd use the exact distinct op instead; uncorrected keeps the
    value bit-identical to the SQL oracle).

    Hash contract (shared with the simhash oracle): 64-bit token hash ==
    DuckDB ``md5_number_upper(CAST(user_id AS VARCHAR))`` ==
    ``int.from_bytes(md5(str(uid)).digest()[:8], 'little')``."""
    import hashlib

    from .bucketed import bucketed_group_reduce

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        # hash distinct users once per (batch, type); repeats collapse here
        t = df[["event_type", "user_id"]].drop_duplicates()
        h = np.fromiter(
            (
                int.from_bytes(
                    hashlib.md5(str(int(u)).encode()).digest()[:8], "little"
                )
                for u in t["user_id"].to_numpy()
            ),
            dtype=np.uint64,
            count=len(t),
        )
        out = pd.DataFrame(
            {
                "event_type": t["event_type"].to_numpy(),
                "bucket": (h & np.uint64(_HLL_M - 1)).astype("int64"),
                "rho": _hll_rho(h >> np.uint64(_HLL_P)),
            }
        )
        return out.groupby(["event_type", "bucket"], sort=False, as_index=False)[
            "rho"
        ].max()

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["event_type", "bucket"], sort=False, as_index=False)[
            "rho"
        ].max()

    regs = bucketed_group_reduce(
        _read(sf_dir, "events", ["event_type", "user_id"]),
        ["event_type"], partial, reduce, n_buckets=8,
    ).to_pandas()

    # tiny driver-side estimate over <= m rows per type, exact Python ints.
    # Z = sum_j 2^-M_j over all m buckets, scaled by 2^(w+1) so the largest
    # rho (w+1) still lands on a non-negative shift:
    # est = floor(floor(alpha_micro * m^2 * 2^(w+1) / num) / 1e6)
    s = 64 - _HLL_P + 1
    ests = {}
    for etype, g in regs.groupby("event_type", sort=False):
        num = sum(1 << (s - int(r)) for r in g["rho"]) + (
            _HLL_M - len(g)
        ) * (1 << s)
        ests[etype] = (_HLL_ALPHA_MICRO * _HLL_M * _HLL_M * (1 << s) // num) // 10**6
    regs["est"] = regs["event_type"].map(ests).astype("int64")
    return regs


def doc_length_quartile(sf_dir: str):
    """NTILE(4) over all documents ordered by (n_chars, doc_id) — global
    ranking WITHOUT a global sort. Pass 1 builds the exact n_chars histogram
    (tiny: one row per distinct length) whose cumulative counts give every
    row's base rank; pass 2 co-locates equal lengths with one hash-bucket
    shuffle and adds the within-length rank vectorized. The only
    driver-side state is the histogram — the scalable shape for global
    rank/percentile assignment at 100 TB (a hot single length value is the
    documented skew caveat, same as any key-partitioned op)."""
    from .bucketed import bucketed_group_reduce, grouped_sum_count

    hist = grouped_sum_count(
        _read(sf_dir, "documents", ["n_chars"]), ["n_chars"], n_buckets=32
    ).to_pandas().sort_values("n_chars")
    n_total = int(hist["n"].sum())
    base = dict(
        zip(hist["n_chars"], hist["n"].cumsum().shift(fill_value=0).astype("int64"))
    )
    nq, rem = divmod(n_total, 4)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df[["doc_id", "n_chars"]]

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["n_chars", "doc_id"], kind="mergesort")
        rank = (
            g["n_chars"].map(base).to_numpy(dtype="int64")
            + g.groupby("n_chars", sort=False).cumcount().to_numpy()
        )
        # SQL NTILE: first `rem` tiles get nq+1 rows (1-based)
        head = rem * (nq + 1)
        tile = np.where(
            rank < head,
            rank // max(nq + 1, 1) + 1,
            rem + (rank - head) // max(nq, 1) + 1,
        )
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(),
                "n_chars": g["n_chars"].to_numpy(),
                "tile": tile.astype("int64"),
            }
        )

    return bucketed_group_reduce(
        _read(sf_dir, "documents", ["doc_id", "n_chars"]),
        ["n_chars"], partial, reduce, n_buckets=64,
    )


def q4_order_priority(sf_dir: str):
    """TPC-H Q4 shape on the available columns: orders placed in 1996 Q1
    counted per priority when at least one of their lineitems was returned
    — a fact-fact EXISTS where BOTH sides are big (no broadcastable key
    set, unlike customers_with_big_orders).

    Scale shape: each side projects to (okey, pri, side) at the scan (the
    lineitem side pre-dedups its keys per batch), the union co-partitions
    on hash(okey) in ONE shuffle, each bucket does a vectorized isin semi
    filter + priority count, and only the tiny per-bucket counts reach the
    driver for the final 5-row sum."""
    from .bucketed import bucketed_group_reduce

    def o_proj(df: pd.DataFrame) -> pd.DataFrame:
        m = (df["o_orderdate"] >= pd.Timestamp("1996-01-01")) & (
            df["o_orderdate"] < pd.Timestamp("1996-04-01")
        )
        return pd.DataFrame(
            {
                "okey": df.loc[m, "o_orderkey"].to_numpy(),
                "pri": df.loc[m, "o_orderpriority"].to_numpy(),
                "side": np.ones(int(m.sum()), dtype="int8"),
            }
        )

    def l_proj(df: pd.DataFrame) -> pd.DataFrame:
        k = df.loc[df["l_returnflag"] == "R", "l_orderkey"].drop_duplicates()
        return pd.DataFrame(
            {
                "okey": k.to_numpy(),
                "pri": np.full(len(k), "", dtype=object),
                "side": np.zeros(len(k), dtype="int8"),
            }
        )

    both = (
        _read(sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"])
        .map_batches(o_proj, batch_format="pandas")
        .union(
            _read(sf_dir, "lineitem", ["l_orderkey", "l_returnflag"]).map_batches(
                l_proj, batch_format="pandas"
            )
        )
    )

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        ords = g[g["side"] == 1]
        qual = ords[ords["okey"].isin(g.loc[g["side"] == 0, "okey"])]
        return qual.groupby("pri", sort=False, as_index=False).agg(
            n=("okey", "count")
        )

    parts = bucketed_group_reduce(
        both, ["okey"], lambda df: df, reduce, n_buckets=64
    ).to_pandas()
    out = parts.groupby("pri", sort=False, as_index=False)["n"].sum()
    return pd.DataFrame(
        {
            "o_orderpriority": out["pri"],
            "n_orders": out["n"].astype("int64"),
        }
    )


def props_json_histogram(sf_dir: str):
    """Semi-structured column processing: extract the integer ``k`` field
    from the ``props`` JSON string and histogram it per event type.

    The corpus's props are flat ``{"k": <int>}`` objects, so a vectorized
    regex extraction is exact JSON semantics here (the general nested-JSON
    path would be a parser actor stage); counting is the standard partial ->
    bucketed-sum shape, so only (type, k, n) rows ever shuffle."""
    from .bucketed import grouped_sum_count

    def extract(df: pd.DataFrame) -> pd.DataFrame:
        k = df["props"].str.extract(r'"k"\s*:\s*(-?\d+)', expand=False)
        out = pd.DataFrame({"event_type": df["event_type"], "k": k})
        out = out.dropna(subset=["k"])
        out["k"] = out["k"].astype("int64")
        return out

    return grouped_sum_count(
        _read(sf_dir, "events", ["event_type", "props"]).map_batches(
            extract, batch_format="pandas"
        ),
        ["event_type", "k"], n_buckets=32,
    )


def latest_event_per_user(sf_dir: str):
    """Argmax-per-group: each user's most recent event (ties broken by
    event_id). Argmax is combiner-friendly — every batch keeps at most one
    row per user, so the shuffle carries per-user partials, not the event
    stream; the reduce re-applies the same vectorized sort+tail."""
    from .bucketed import bucketed_group_reduce

    def keep_last(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        return df.groupby("user_id", sort=False).tail(1)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = pd.DataFrame(
            {
                "user_id": df["user_id"],
                "event_id": df["event_id"],
                "event_type": df["event_type"],
                "ts_us": df["ts"].to_numpy().astype("datetime64[us]").astype("int64"),
            }
        )
        return keep_last(t)

    return bucketed_group_reduce(
        _read(sf_dir, "events", ["user_id", "event_id", "event_type", "ts"]),
        ["user_id"], partial, keep_last, n_buckets=64,
    )


def users_click_and_purchase(sf_dir: str):
    """Key-set INTERSECT: users who both clicked and purchased. Per-batch
    boolean indicators collapse to one row per (batch, user); the bucketed
    max-reduce then ANDs them — set membership never materializes, ids
    shuffle once as (user_id, 2 flags)."""
    from .bucketed import bucketed_group_reduce

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        et = df["event_type"]
        t = pd.DataFrame(
            {
                "user_id": df["user_id"],
                "is_c": (et == "click").astype("int8"),
                "is_p": (et == "purchase").astype("int8"),
            }
        )
        t = t[(t["is_c"] | t["is_p"]).astype(bool)]
        return t.groupby("user_id", sort=False, as_index=False).max()

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby("user_id", sort=False, as_index=False).max()
        return m.loc[(m["is_c"] & m["is_p"]).astype(bool), ["user_id"]]

    return bucketed_group_reduce(
        _read(sf_dir, "events", ["user_id", "event_type"]),
        ["user_id"], partial, reduce, n_buckets=64,
    )


# Count-min sketch: d=4 hash rows x w=4096 columns; the heavy-hitter
# counterpart to the HLL sketch (same md5 hash contract, cells merge by sum)
_CMS_D = 4
_CMS_W = 4096


def cms_token_counts(sf_dir: str):
    """Deterministic count-min sketch of corpus token frequencies — the
    mergeable heavy-hitter artifact: each batch contributes at most
    d × (distinct tokens in batch) cell partials that combine by plain sum,
    so raw tokens never shuffle and the sketch answers any point query with
    min over d cells (always >= the true count). Cell hash row r of token t
    is md5_number_upper('r:t') % w — the same DuckDB-recomputable hash
    contract the simhash and HLL oracles use."""
    import hashlib
    from collections import Counter

    from .bucketed import bucketed_group_reduce
    from .textstats import _tokens

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c: Counter = Counter()
        for s in df["text"]:
            c.update(_tokens(s))
        toks = list(c.keys())
        n = np.fromiter(c.values(), dtype="int64", count=len(toks))
        frames = []
        for r in range(_CMS_D):
            cols = np.fromiter(
                (
                    int.from_bytes(
                        hashlib.md5(f"{r}:{t}".encode()).digest()[:8], "little"
                    )
                    % _CMS_W
                    for t in toks
                ),
                dtype="int64",
                count=len(toks),
            )
            frames.append(
                pd.DataFrame(
                    {"row": np.full(len(toks), r, dtype="int64"), "col": cols, "n": n}
                )
            )
        t = pd.concat(frames, ignore_index=True)
        return t.groupby(["row", "col"], sort=False, as_index=False)["n"].sum()

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["row", "col"], sort=False, as_index=False)["n"].sum()

    return bucketed_group_reduce(
        _read(sf_dir, "documents", ["text"]),
        ["row", "col"], partial, reduce, n_buckets=16,
    )


def decontaminate_docs(sf_dir: str):
    """Benchmark decontamination: flag every document whose text contains
    any held-out benchmark n-gram — the pre-training hygiene pass that keeps
    eval data out of the training mix. The 'benchmark set' is derived
    deterministically from the corpus (first 8 tokens of the 3 lowest
    doc_ids) so the check is self-contained.

    Scale shape: the needle set is tiny and broadcast once via ray.put
    (never re-shipped per batch); matching is vectorized ``str.contains``
    per needle over each batch — no shuffle, no driver-side corpus read. At
    a real 10^5-needle benchmark suite the same stage swaps the per-needle
    scan for one Aho-Corasick automaton built in the actor's ``__init__``."""
    import ray

    bench = _read_small(
        sf_dir, "documents", columns=["doc_id", "text"],
        filters=[("doc_id", "<", DECON_BENCH_DOCS)],
    ).sort_values("doc_id")
    needles = []
    for d, t in zip(bench["doc_id"], bench["text"]):
        toks = t.split()[:DECON_NGRAM_TOKENS]
        if toks:
            needles.append((int(d), " ".join(toks)))
    needles_ref = ray.put(needles)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        nd = ray.get(needles_ref)
        ids, bench_ids = [], []
        text = df["text"]
        for bid, needle in nd:
            hit = text.str.contains(needle, regex=False).fillna(False)
            matched = df.loc[hit, "doc_id"]
            ids.append(matched.to_numpy(dtype="int64"))
            bench_ids.append(np.full(len(matched), bid, dtype=np.int64))
        if not ids:
            return pd.DataFrame(
                {"doc_id": pd.Series(dtype="int64"),
                 "bench_doc_id": pd.Series(dtype="int64")}
            )
        return pd.DataFrame(
            {"doc_id": np.concatenate(ids), "bench_doc_id": np.concatenate(bench_ids)}
        )

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        fn, batch_format="pandas"
    )


def doc_quality_gate(sf_dir: str):
    """Global-quantile quality gate: keep documents whose stopword-density
    score is at or above the corpus P75 — the 'top-quartile by quality'
    curation cut. The score is an integer micro-ratio, so the quantile and
    the gate are bit-exact.

    Scale shape: pass 1 streams a per-batch score VALUE-COUNT into a bucketed
    reduce — the histogram is at most one row per distinct micro-score
    (≤1e6), tiny vs the corpus — and the driver folds it into one cutoff;
    pass 2 re-scores and filters with the cutoff inline (scores are cheaper
    to recompute than to shuffle/persist at 10^12 rows). No full-table
    materialization anywhere."""
    from .bucketed import bucketed_group_reduce
    from .textstats import STOPWORDS, _tokens

    stop = set(STOPWORDS)

    def _scores(df: pd.DataFrame) -> np.ndarray:
        out = np.zeros(len(df), dtype=np.int64)
        for i, s in enumerate(df["text"]):
            toks = _tokens(s) if isinstance(s, str) else []
            if toks:
                out[i] = (1_000_000 * sum(1 for w in toks if w in stop)) // len(toks)
        return out

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def hist_partial(df: pd.DataFrame) -> pd.DataFrame:
        v, c = np.unique(_scores(df), return_counts=True)
        return pd.DataFrame({"stop_micro": v, "n": c.astype("int64")})

    hist = bucketed_group_reduce(
        docs, ["stop_micro"], hist_partial,
        lambda g: g.groupby("stop_micro", sort=False)["n"].sum().reset_index(),
        n_buckets=16,
    ).to_pandas().sort_values("stop_micro")
    total = int(hist["n"].sum())
    k = max(int(np.ceil(0.75 * total)), 1)
    cutoff = int(hist.loc[hist["n"].cumsum() >= k, "stop_micro"].iloc[0])

    def gate(df: pd.DataFrame) -> pd.DataFrame:
        sc = _scores(df)
        keep = sc >= cutoff
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(dtype="int64")[keep],
                "stop_micro": sc[keep],
                "cutoff": np.full(int(keep.sum()), cutoff, dtype=np.int64),
            }
        )

    return docs.map_batches(gate, batch_format="pandas")


# ---------------------------------------------------------------------------
# Round 2d: bloom-prefiltered semi join, sequence packing, retention cohorts
# ---------------------------------------------------------------------------


def bloom_semi_lineitems(sf_dir: str):
    """Bloom-prefiltered big-big semi join: item count + total quantity per
    lineitem order whose order books > $475k (~5% selectivity).

    Scale shape — the classic shuffle-volume cut: the qualifying orderkeys
    build a fixed 128 KB bloom (relational.build_bloom_filter — per-batch
    deduped bit positions, driver OR, ONE ray.put) that every probe batch
    tests vectorized BEFORE pre-aggregating, so only ~selectivity x lineitem
    rows (plus bloom false positives) enter the co-partition exchange. The
    tagged-union verify (q4 shape) then removes false positives exactly —
    the bloom buys bytes, never correctness."""
    import ray as _ray

    from .bucketed import bucketed_group_reduce
    from .relational import bloom_might_contain, build_bloom_filter

    def qual(df: pd.DataFrame) -> pd.DataFrame:
        k = df.loc[df["o_totalprice"] > 475000.0, "o_orderkey"]
        return pd.DataFrame({"okey": k.to_numpy(dtype="int64")})

    # qualifying keys are aggregate-sized (~5% of orders): pin them so the
    # bloom build and the verify union don't each re-scan the orders table
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"]).map_batches(
        qual, batch_format="pandas"
    ).materialize()
    bits_ref = _ray.put(build_bloom_filter(orders, "okey"))

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        keys = df["l_orderkey"].to_numpy(dtype="int64")
        m = bloom_might_contain(_ray.get(bits_ref), keys)
        t = pd.DataFrame(
            {"okey": keys[m],
             "qty": _round_half_away(df["l_quantity"].to_numpy()[m])}
        )
        g = t.groupby("okey", sort=False, as_index=False).agg(
            n=("qty", "size"), q=("qty", "sum")
        )
        g["side"] = np.int8(0)
        return g

    def o_tag(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"okey": df["okey"].to_numpy(dtype="int64"),
             "n": np.int64(0), "q": np.int64(0), "side": np.int8(1)}
        )

    both = (
        _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
        .map_batches(probe, batch_format="pandas")
        .union(orders.map_batches(o_tag, batch_format="pandas"))
    )

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        li = g[g["side"] == 0]
        li = li[li["okey"].isin(g.loc[g["side"] == 1, "okey"])]
        out = li.groupby("okey", sort=False, as_index=False).agg(
            n_items=("n", "sum"), sum_qty=("q", "sum")
        )
        return out.rename(columns={"okey": "l_orderkey"}).astype("int64")

    return bucketed_group_reduce(both, ["okey"], lambda df: df, verify,
                                 n_buckets=64)


PACK_BUDGET = 256  # tokens per training-sequence bin
PACK_RANGE = 1024  # doc_ids per scan range (drives the metadata table size)


def pack_sequences(sf_dir: str):
    """Sequence packing (doc -> training-bin assignment): in doc_id order,
    bin_id = floor(exclusive-prefix-sum(n_tokens) / PACK_BUDGET) — the
    offset-packing each LLM data pipeline runs to batch short documents
    into fixed token-budget sequences without a global sort.

    Scale shape — the textbook distributed exclusive scan:
      1. per-batch partials (range_id = doc_id // PACK_RANGE, sum n_tokens)
         -> bucketed reduce -> per-range totals: corpus/PACK_RANGE rows of
         metadata, the ONLY driver-side state; exclusive-scanned and
         ray.put once.
      2. docs co-partition by range_id in ONE exchange; each bucket sorts
         its ranges by doc_id and adds (within-range exclusive cumsum +
         broadcast range offset) vectorized.
    No stage sees more than a range in one group, and the exchanged rows
    are (range_id, doc_id, n_tokens) — text never shuffles."""
    import ray as _ray

    from .bucketed import bucketed_group_reduce
    from .textstats import _tokens

    def ntok_rows(df: pd.DataFrame) -> pd.DataFrame:
        n = np.array(
            [len(_tokens(t)) if isinstance(t, str) else 0 for t in df["text"]],
            dtype="int64",
        )
        return pd.DataFrame(
            {"doc_id": df["doc_id"].to_numpy(dtype="int64"),
             "rg": df["doc_id"].to_numpy(dtype="int64") // PACK_RANGE,
             "n_tokens": n}
        )

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def range_partial(df: pd.DataFrame) -> pd.DataFrame:
        t = ntok_rows(df)
        return t.groupby("rg", sort=False, as_index=False)["n_tokens"].sum()

    def range_reduce(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("rg", sort=False, as_index=False)["n_tokens"].sum()

    totals = bucketed_group_reduce(
        docs, ["rg"], range_partial, range_reduce, n_buckets=16
    ).to_pandas().sort_values("rg")
    offs = dict(
        zip(totals["rg"].tolist(),
            np.concatenate([[0], totals["n_tokens"].cumsum().to_numpy()[:-1]])
            .tolist())
    )
    offs_ref = _ray.put(offs)

    def assign(g: pd.DataFrame) -> pd.DataFrame:
        o = _ray.get(offs_ref)
        g = g.sort_values(["rg", "doc_id"], kind="stable")
        excl = g.groupby("rg", sort=False)["n_tokens"].cumsum() - g["n_tokens"]
        base = g["rg"].map(o).to_numpy(dtype="int64")
        return pd.DataFrame(
            {"doc_id": g["doc_id"].to_numpy(),
             "n_tokens": g["n_tokens"].to_numpy(),
             "bin_id": (base + excl.to_numpy()) // PACK_BUDGET}
        )

    return bucketed_group_reduce(
        docs.map_batches(ntok_rows, batch_format="pandas"),
        ["rg"], lambda df: df, assign, n_buckets=64,
    )


def user_retention_cohorts(sf_dir: str):
    """Cohort retention matrix: users bucketed by their first-activity day
    (the cohort), counted distinct per (cohort_day, offset_days) — the
    product-analytics staple Ray Data has no operator for.

    Scale shape: ONE exchange. Batches pre-dedup (user_id, day) pairs (at
    most days-per-window rows per user per batch), co-partition on
    hash(user_id); each bucket derives the cohort with a vectorized
    transform('min') — a user's rows all share the bucket, so the min is
    global — and emits exact per-(cohort, offset) user counts. The final
    groupby merges days x days rows: driver-size metadata."""
    from .bucketed import bucketed_group_reduce

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        t = pd.DataFrame(
            {"user_id": df["user_id"].to_numpy(dtype="int64"),
             "d": df["ts"].dt.floor("D")}
        )
        return t.drop_duplicates()

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["user_id", "d"])
        cd = g.groupby("user_id", sort=False)["d"].transform("min")
        t = pd.DataFrame(
            {"cohort_day": cd.dt.strftime("%Y-%m-%d"),
             "offset_days": ((g["d"] - cd).dt.days).astype("int64"),
             "user_id": g["user_id"]}
        )
        return (
            t.groupby(["cohort_day", "offset_days"], sort=False)["user_id"]
            .nunique().rename("n_users").reset_index()
        )

    parts = bucketed_group_reduce(
        _read(sf_dir, "events", ["user_id", "ts"]).map_batches(
            pairs, batch_format="pandas"
        ),
        ["user_id"], lambda df: df, per_bucket, n_buckets=64,
    ).to_pandas()
    out = (
        parts.groupby(["cohort_day", "offset_days"], sort=False, as_index=False)
        ["n_users"].sum()
    )
    out["n_users"] = out["n_users"].astype("int64")
    return out


def q14_promo_revenue(sf_dir: str):
    """TPC-H Q14 shape: share of 1996 revenue from PROMO parts, exact to
    the cent. Part projects to a 1-bit (partkey -> is_promo) broadcast dict
    (the dimension-broadcast shape every star join uses); lineitem batches
    compute integer micro-cent revenue partials and the driver sums the
    two per-batch counters — no shuffle at all."""
    part = _read_small(sf_dir, "part", ["p_partkey", "p_type"])
    import ray as _ray

    promo_ref = _ray.put(
        set(part.loc[part["p_type"] == "PROMO", "p_partkey"].tolist())
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        m = (df["l_shipdate"] >= pd.Timestamp("1996-01-01")) & (
            df["l_shipdate"] < pd.Timestamp("1997-01-01")
        )
        sub = df.loc[m]
        rev = _round_half_away(
            sub["l_extendedprice"].to_numpy()
            * (1.0 - sub["l_discount"].to_numpy()) * 100.0
        )
        promo = sub["l_partkey"].isin(_ray.get(promo_ref)).to_numpy()
        return pd.DataFrame(
            {"promo_cents": [int(rev[promo].sum())],
             "total_cents": [int(rev.sum())]}
        )

    parts = (
        _read(sf_dir, "lineitem",
              ["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"])
        .map_batches(partial, batch_format="pandas").to_pandas()
    )
    promo, total = int(parts["promo_cents"].sum()), int(parts["total_cents"].sum())
    return pd.DataFrame(
        {"promo_cents": [promo], "total_cents": [total],
         "promo_bp": [(10000 * promo + total // 2) // total if total else 0]}
    )


def q17_small_quantity_revenue(sf_dir: str):
    """TPC-H Q17 shape: revenue sitting in small-quantity line items of one
    brand's parts — the correlated-average query (l_quantity < 0.2 x the
    part's own average quantity). Brand is data-derived (min(p_brand)) so
    the pick is deterministic without a literal.

    Scale shape: the brand's partkey set broadcasts once (ray.put) and
    prunes BOTH lineitem passes inside the scan tasks; pass 1 pre-aggregates
    (sum_q, cnt) per part in each batch so the single narrow exchange is
    brand-part cardinality; the per-part threshold map broadcasts back and
    pass 2 is a shuffle-free integer-cent partial sum. The quantity gate is
    the exact-integer cross-multiplication 5*q*cnt < sum_q (equivalent to
    q < 0.2*avg; quantities are integral in this corpus, asserted per
    batch), so the DuckDB oracle matches to the cent with no float
    anywhere. Output one row (lost_cents, avg_yearly_cents = lost//7)."""
    import ray as _ray

    from .bucketed import bucketed_group_reduce

    part = _read_small(sf_dir, "part", ["p_partkey", "p_brand"])
    brand = part["p_brand"].min()
    keys_ref = _ray.put(
        set(int(x) for x in part.loc[part["p_brand"] == brand, "p_partkey"])
    )

    def q_partial(df: pd.DataFrame) -> pd.DataFrame:
        keys = _ray.get(keys_ref)
        sub = df.loc[df["l_partkey"].isin(keys)]
        q = sub["l_quantity"].to_numpy()
        qi = q.astype("int64")
        assert np.all(qi == q), "q17 exact-int gate needs integral quantities"
        t = pd.DataFrame({"pk": sub["l_partkey"].to_numpy(dtype="int64"),
                          "sq": qi, "cnt": np.ones(len(sub), dtype="int64")})
        return t.groupby("pk", sort=False, as_index=False).sum()

    stats = bucketed_group_reduce(
        _read(sf_dir, "lineitem", ["l_partkey", "l_quantity"]),
        ["pk"], q_partial,
        lambda g: g.groupby("pk", sort=False, as_index=False)[["sq", "cnt"]].sum(),
        n_buckets=16,
    ).to_pandas()
    if stats.empty:
        return pd.DataFrame({"lost_cents": [0], "avg_yearly_cents": [0]}).astype("int64")
    thr_ref = _ray.put(
        {int(r.pk): (int(r.sq), int(r.cnt)) for r in stats.itertuples()}
    )

    def rev_partial(df: pd.DataFrame) -> pd.DataFrame:
        thr = _ray.get(thr_ref)
        sub = df.loc[df["l_partkey"].isin(thr)]
        if sub.empty:
            return pd.DataFrame({"c": [0]}).astype("int64")
        q = sub["l_quantity"].to_numpy().astype("int64")
        sq = np.array([thr[int(k)][0] for k in sub["l_partkey"]], dtype="int64")
        cnt = np.array([thr[int(k)][1] for k in sub["l_partkey"]], dtype="int64")
        cents = _round_half_away(sub["l_extendedprice"].to_numpy() * 100.0)
        return pd.DataFrame({"c": [int(cents[5 * q * cnt < sq].sum())]})

    total = int(
        _read(sf_dir, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice"])
        .map_batches(rev_partial, batch_format="pandas")
        .to_pandas()["c"].sum()
    )
    return pd.DataFrame(
        {"lost_cents": [total], "avg_yearly_cents": [total // 7]}
    ).astype("int64")


def q18_large_orders(sf_dir: str):
    """TPC-H Q18 shape: customers behind orders totalling > 250 units.
    Scale shape: the quantity sum per order is a bucketed pre-aggregated
    reduce (never a per-order Python group); the HAVING filter shrinks it
    to a driver-size key set that broadcasts into the orders scan, and the
    customer names attach by a predicate-pushed small read — only
    aggregate-size frames ever reach the driver."""
    import ray as _ray

    from .bucketed import bucketed_group_reduce

    def l_partial(df: pd.DataFrame) -> pd.DataFrame:
        t = pd.DataFrame(
            {"okey": df["l_orderkey"].to_numpy(dtype="int64"),
             "qty": _round_half_away(df["l_quantity"].to_numpy())}
        )
        return t.groupby("okey", sort=False, as_index=False)["qty"].sum()

    def l_reduce(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("okey", sort=False, as_index=False)["qty"].sum()
        return s.loc[s["qty"] > 250]

    big = bucketed_group_reduce(
        _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"]),
        ["okey"], l_partial, l_reduce, n_buckets=64,
    ).to_pandas()
    qty_ref = _ray.put(dict(zip(big["okey"].tolist(), big["qty"].tolist())))

    def o_attach(df: pd.DataFrame) -> pd.DataFrame:
        lut = _ray.get(qty_ref)
        m = df["o_orderkey"].isin(lut)
        sub = df.loc[m]
        return pd.DataFrame(
            {"o_orderkey": sub["o_orderkey"].to_numpy(dtype="int64"),
             "o_custkey": sub["o_custkey"].to_numpy(dtype="int64"),
             "o_orderdate": sub["o_orderdate"].dt.strftime("%Y-%m-%d"),
             "total_cents": _cents(sub["o_totalprice"]),
             "sum_qty": sub["o_orderkey"].map(lut).to_numpy(dtype="int64")}
        )

    hits = (
        _read(sf_dir, "orders",
              ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])
        .map_batches(o_attach, batch_format="pandas").to_pandas()
    )
    cust = _read_small(sf_dir, "customer", ["c_custkey", "c_name"])
    out = hits.merge(cust, left_on="o_custkey", right_on="c_custkey")
    return out[["c_name", "c_custkey", "o_orderkey", "o_orderdate",
                "total_cents", "sum_qty"]]


def q7_nation_volume(sf_dir: str):
    """TPC-H Q7 shape: 1996-1997 trade volume per (supplier nation,
    customer nation, ship year). Two big-big joins done as co-partition
    exchanges — orders x customer-nation on custkey would be one at true
    scale, but customer here is dimension-broadcastable, so the engine
    broadcasts BOTH nation lookups (supplier and customer maps are
    nation-count-bounded dicts) and runs the single unavoidable big-big
    exchange lineitem x orders on orderkey with tagged-union buckets;
    revenue is integer cents end to end."""
    import ray as _ray

    from .bucketed import bucketed_group_reduce

    sup = _read_small(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    cst = _read_small(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    nat = _read_small(sf_dir, "nation", ["n_nationkey", "n_name"])
    nname = dict(zip(nat["n_nationkey"], nat["n_name"]))
    sup_ref = _ray.put(
        {int(k): nname[int(v)] for k, v in zip(sup["s_suppkey"], sup["s_nationkey"])}
    )
    cst_ref = _ray.put(
        {int(k): nname[int(v)] for k, v in zip(cst["c_custkey"], cst["c_nationkey"])}
    )

    def l_proj(df: pd.DataFrame) -> pd.DataFrame:
        m = (df["l_shipdate"] >= pd.Timestamp("1996-01-01")) & (
            df["l_shipdate"] < pd.Timestamp("1998-01-01")
        )
        sub = df.loc[m]
        return pd.DataFrame(
            {"okey": sub["l_orderkey"].to_numpy(dtype="int64"),
             "supp_nation": sub["l_suppkey"].map(_ray.get(sup_ref)),
             "cust_nation": "",
             "ship_year": sub["l_shipdate"].dt.year.astype("int64"),
             "cents": _round_half_away(
                 sub["l_extendedprice"].to_numpy()
                 * (1.0 - sub["l_discount"].to_numpy()) * 100.0
             ),
             "side": np.int8(0)}
        )

    def o_proj(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"okey": df["o_orderkey"].to_numpy(dtype="int64"),
             "supp_nation": "",
             "cust_nation": df["o_custkey"].map(_ray.get(cst_ref)),
             "ship_year": np.int64(0),
             "cents": np.int64(0),
             "side": np.int8(1)}
        )

    both = (
        _read(sf_dir, "lineitem",
              ["l_orderkey", "l_suppkey", "l_shipdate",
               "l_extendedprice", "l_discount"])
        .map_batches(l_proj, batch_format="pandas")
        .union(
            _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]).map_batches(
                o_proj, batch_format="pandas"
            )
        )
    )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        li = g[g["side"] == 0]
        od = g.loc[g["side"] == 1, ["okey", "cust_nation"]].drop_duplicates("okey")
        m = li.drop(columns=["cust_nation"]).merge(od, on="okey")
        return m.groupby(
            ["supp_nation", "cust_nation", "ship_year"], sort=False,
            as_index=False,
        )["cents"].sum()

    parts = bucketed_group_reduce(
        both, ["okey"], lambda df: df, per_bucket, n_buckets=64
    ).to_pandas()
    out = parts.groupby(
        ["supp_nation", "cust_nation", "ship_year"], sort=False, as_index=False
    )["cents"].sum()
    out = out.rename(columns={"cents": "revenue_cents"})
    out["revenue_cents"] = out["revenue_cents"].astype("int64")
    return out


def q8_market_share(sf_dir: str):
    """TPC-H Q8 shape: one nation's share of a region's revenue in one part
    type, per order year. All selectors are data-derived (min r_name /
    p_type / n_name) so no literals bake in.

    Scale shape: THREE dimension broadcasts prune both big sides before the
    single unavoidable exchange — the part-type partkey set and the
    supplier->nation map shrink lineitem inside its scan tasks; the
    region-customer key set and the 2-year window shrink orders inside its
    scan tasks — then one tagged-union bucketed co-partition on orderkey.
    Revenue is integer cents end to end and the share is exact-integer
    basis points ((10000*t + total//2)//total), so the DuckDB oracle
    matches bit for bit."""
    import ray as _ray

    from .bucketed import bucketed_group_reduce

    nat = _read_small(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"])
    reg = _read_small(sf_dir, "region", ["r_regionkey", "r_name"])
    rkey = int(reg.loc[reg["r_name"] == reg["r_name"].min(), "r_regionkey"].iloc[0])
    region_nations = set(
        int(x) for x in nat.loc[nat["n_regionkey"] == rkey, "n_nationkey"]
    )
    target_nation = nat["n_name"].min()
    target_keys = set(
        int(x) for x in nat.loc[nat["n_name"] == target_nation, "n_nationkey"]
    )

    part = _read_small(sf_dir, "part", ["p_partkey", "p_type"])
    pk_ref = _ray.put(
        set(int(x) for x in part.loc[part["p_type"] == part["p_type"].min(),
                                     "p_partkey"])
    )
    sup = _read_small(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    sup_ref = _ray.put(
        {int(k): int(v) in target_keys
         for k, v in zip(sup["s_suppkey"], sup["s_nationkey"])}
    )
    cust = _read_small(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    cust_ref = _ray.put(
        set(int(k) for k, v in zip(cust["c_custkey"], cust["c_nationkey"])
            if int(v) in region_nations)
    )

    def l_proj(df: pd.DataFrame) -> pd.DataFrame:
        sub = df.loc[df["l_partkey"].isin(_ray.get(pk_ref))]
        is_t = sub["l_suppkey"].map(_ray.get(sup_ref)).to_numpy(dtype=bool)
        cents = _round_half_away(
            sub["l_extendedprice"].to_numpy()
            * (1.0 - sub["l_discount"].to_numpy()) * 100.0
        )
        return pd.DataFrame(
            {"okey": sub["l_orderkey"].to_numpy(dtype="int64"),
             "cents": cents,
             "t_cents": np.where(is_t, cents, 0).astype("int64"),
             "o_year": np.int64(0), "side": np.int8(0)}
        )

    def o_proj(df: pd.DataFrame) -> pd.DataFrame:
        m = (
            (df["o_orderdate"] >= pd.Timestamp("1996-01-01"))
            & (df["o_orderdate"] < pd.Timestamp("1998-01-01"))
            & df["o_custkey"].isin(_ray.get(cust_ref))
        )
        sub = df.loc[m]
        return pd.DataFrame(
            {"okey": sub["o_orderkey"].to_numpy(dtype="int64"),
             "cents": np.int64(0), "t_cents": np.int64(0),
             "o_year": sub["o_orderdate"].dt.year.astype("int64"),
             "side": np.int8(1)}
        )

    both = (
        _read(sf_dir, "lineitem",
              ["l_orderkey", "l_partkey", "l_suppkey",
               "l_extendedprice", "l_discount"])
        .map_batches(l_proj, batch_format="pandas")
        .union(
            _read(sf_dir, "orders",
                  ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
                o_proj, batch_format="pandas"
            )
        )
    )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        li = g[g["side"] == 0]
        od = g.loc[g["side"] == 1, ["okey", "o_year"]].drop_duplicates("okey")
        m = li.drop(columns=["o_year"]).merge(od, on="okey")
        return m.groupby("o_year", sort=False, as_index=False)[
            ["cents", "t_cents"]
        ].sum()

    parts = bucketed_group_reduce(
        both, ["okey"], lambda df: df, per_bucket, n_buckets=64
    ).to_pandas()
    if parts.empty:
        return pd.DataFrame(
            {"o_year": pd.Series([], dtype="int64"),
             "target_cents": pd.Series([], dtype="int64"),
             "total_cents": pd.Series([], dtype="int64"),
             "share_bp": pd.Series([], dtype="int64")}
        )
    out = parts.groupby("o_year", sort=False, as_index=False)[
        ["cents", "t_cents"]
    ].sum()
    total = out["cents"].to_numpy(dtype="int64")
    targ = out["t_cents"].to_numpy(dtype="int64")
    share = np.where(total > 0, (10000 * targ + total // 2) // np.where(
        total > 0, total, 1), 0).astype("int64")
    return pd.DataFrame(
        {"o_year": out["o_year"].astype("int64"), "target_cents": targ,
         "total_cents": total, "share_bp": share}
    )


def q9_nation_profit(sf_dir: str):
    """TPC-H Q9 shape: profit per (supplier nation, order year) for parts
    whose name contains 'a'. The corpus has no partsupp table, so unit cost
    is the part's retail price (documented adaptation; the join/aggregate
    topology is Q9's).

    Scale shape: part->cost and supplier->nation broadcast once and prune /
    annotate lineitem inside its scan tasks; the one big-big exchange is
    lineitem x orders on orderkey (tagged union, bucketed); profit is
    exact integer cents (revenue cents minus cost_cents*qty), so the
    oracle matches to the cent."""
    import ray as _ray

    from .bucketed import bucketed_group_reduce

    part = _read_small(sf_dir, "part", ["p_partkey", "p_name", "p_retailprice"])
    sel = part.loc[part["p_name"].str.contains("a", regex=False)]
    cost_ref = _ray.put(
        dict(zip((int(k) for k in sel["p_partkey"]),
                 (int(c) for c in _cents(sel["p_retailprice"]))))
    )
    sup = _read_small(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    nat = _read_small(sf_dir, "nation", ["n_nationkey", "n_name"])
    nname = dict(zip(nat["n_nationkey"], nat["n_name"]))
    sup_ref = _ray.put(
        {int(k): nname[int(v)] for k, v in zip(sup["s_suppkey"], sup["s_nationkey"])}
    )

    def l_proj(df: pd.DataFrame) -> pd.DataFrame:
        cost = _ray.get(cost_ref)
        sub = df.loc[df["l_partkey"].isin(cost)]
        qty = sub["l_quantity"].to_numpy()
        qi = qty.astype("int64")
        assert np.all(qi == qty), "q9 exact-int profit needs integral quantities"
        rev = _round_half_away(
            sub["l_extendedprice"].to_numpy()
            * (1.0 - sub["l_discount"].to_numpy()) * 100.0
        )
        ucost = np.fromiter(
            (cost[int(k)] for k in sub["l_partkey"]), dtype="int64", count=len(sub)
        )
        return pd.DataFrame(
            {"okey": sub["l_orderkey"].to_numpy(dtype="int64"),
             "nation": sub["l_suppkey"].map(_ray.get(sup_ref)),
             "amount": rev - ucost * qi,
             "o_year": np.int64(0), "side": np.int8(0)}
        )

    def o_proj(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"okey": df["o_orderkey"].to_numpy(dtype="int64"),
             "nation": "", "amount": np.int64(0),
             "o_year": df["o_orderdate"].dt.year.astype("int64"),
             "side": np.int8(1)}
        )

    both = (
        _read(sf_dir, "lineitem",
              ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
               "l_extendedprice", "l_discount"])
        .map_batches(l_proj, batch_format="pandas")
        .union(
            _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"]).map_batches(
                o_proj, batch_format="pandas"
            )
        )
    )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        li = g[g["side"] == 0]
        od = g.loc[g["side"] == 1, ["okey", "o_year"]].drop_duplicates("okey")
        m = li.drop(columns=["o_year"]).merge(od, on="okey")
        return m.groupby(["nation", "o_year"], sort=False, as_index=False)[
            "amount"
        ].sum()

    parts = bucketed_group_reduce(
        both, ["okey"], lambda df: df, per_bucket, n_buckets=64
    ).to_pandas()
    if parts.empty:
        return pd.DataFrame(
            {"nation": pd.Series([], dtype=object),
             "o_year": pd.Series([], dtype="int64"),
             "profit_cents": pd.Series([], dtype="int64")}
        )
    out = parts.groupby(["nation", "o_year"], sort=False, as_index=False)[
        "amount"
    ].sum().rename(columns={"amount": "profit_cents"})
    out["o_year"] = out["o_year"].astype("int64")
    out["profit_cents"] = out["profit_cents"].astype("int64")
    return out


def q11_important_parts(sf_dir: str):
    """TPC-H Q11 shape: parts whose shipped inventory value from one
    nation's suppliers exceeds 1/1000 of that nation's total (the
    HAVING-vs-scalar-subquery query). No partsupp table, so value =
    sum(qty * retail_cents) over lineitems (documented adaptation).

    Scale shape: the nation's supplier key set and the part->retail-cents
    map broadcast once and prune lineitem inside its scan tasks; per-batch
    (partkey, value) partials collapse in ONE bucketed exchange of
    part-cardinality rows; the global total and the 1000*value > total
    gate are exact integers on the driver over the already-small per-part
    table."""
    import ray as _ray

    from .bucketed import bucketed_group_reduce

    nat = _read_small(sf_dir, "nation", ["n_nationkey", "n_name"])
    nkey = set(
        int(x) for x in nat.loc[nat["n_name"] == nat["n_name"].min(),
                                "n_nationkey"]
    )
    sup = _read_small(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    sup_ref = _ray.put(
        set(int(k) for k, v in zip(sup["s_suppkey"], sup["s_nationkey"])
            if int(v) in nkey)
    )
    part = _read_small(sf_dir, "part", ["p_partkey", "p_retailprice"])
    cost_ref = _ray.put(
        dict(zip((int(k) for k in part["p_partkey"]),
                 (int(c) for c in _cents(part["p_retailprice"]))))
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        sub = df.loc[df["l_suppkey"].isin(_ray.get(sup_ref))]
        qty = sub["l_quantity"].to_numpy()
        qi = qty.astype("int64")
        assert np.all(qi == qty), "q11 exact-int value needs integral quantities"
        cost = _ray.get(cost_ref)
        val = qi * np.fromiter(
            (cost[int(k)] for k in sub["l_partkey"]), dtype="int64", count=len(sub)
        )
        t = pd.DataFrame(
            {"p_partkey": sub["l_partkey"].to_numpy(dtype="int64"), "value": val}
        )
        return t.groupby("p_partkey", sort=False, as_index=False).sum()

    per_part = bucketed_group_reduce(
        _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_quantity"]),
        ["p_partkey"], partial,
        lambda g: g.groupby("p_partkey", sort=False, as_index=False)["value"].sum(),
        n_buckets=16,
    ).to_pandas()
    if per_part.empty:
        return pd.DataFrame(
            {"p_partkey": pd.Series([], dtype="int64"),
             "value_cents": pd.Series([], dtype="int64")}
        )
    total = int(per_part["value"].sum())
    keep = per_part.loc[1000 * per_part["value"].astype("int64") > total]
    return pd.DataFrame(
        {"p_partkey": keep["p_partkey"].astype("int64"),
         "value_cents": keep["value"].astype("int64")}
    ).reset_index(drop=True)


def q15_top_supplier(sf_dir: str):
    """TPC-H Q15 shape: the supplier(s) with maximum revenue in a 3-month
    ship window (the view + MAX-subquery query, ties included).

    Scale shape: the window filter prunes inside the scan tasks; revenue
    collapses to supplier cardinality in ONE pre-aggregated exchange; the
    MAX and tie filter run on the driver over that small table and the
    name lookup is a driver-side merge of the supplier dimension. Integer
    cents end to end."""
    li = _read(sf_dir, "lineitem",
               ["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        m = (df["l_shipdate"] >= pd.Timestamp("1996-01-01")) & (
            df["l_shipdate"] < pd.Timestamp("1996-04-01")
        )
        sub = df.loc[m]
        t = pd.DataFrame(
            {"s_suppkey": sub["l_suppkey"].to_numpy(dtype="int64"),
             "cents": _round_half_away(
                 sub["l_extendedprice"].to_numpy()
                 * (1.0 - sub["l_discount"].to_numpy()) * 100.0
             )}
        )
        return t.groupby("s_suppkey", sort=False, as_index=False).sum()

    from .bucketed import bucketed_group_reduce

    rev = bucketed_group_reduce(
        li, ["s_suppkey"], partial,
        lambda g: g.groupby("s_suppkey", sort=False, as_index=False)["cents"].sum(),
        n_buckets=16,
    ).to_pandas()
    if rev.empty:
        return pd.DataFrame(
            {"s_suppkey": pd.Series([], dtype="int64"),
             "s_name": pd.Series([], dtype=object),
             "total_cents": pd.Series([], dtype="int64")}
        )
    best = int(rev["cents"].max())
    top = rev.loc[rev["cents"] == best].copy()
    names = _read_small(sf_dir, "supplier", ["s_suppkey", "s_name"])
    out = top.merge(names, on="s_suppkey")
    return pd.DataFrame(
        {"s_suppkey": out["s_suppkey"].astype("int64"),
         "s_name": out["s_name"],
         "total_cents": out["cents"].astype("int64")}
    ).reset_index(drop=True)


def q20_concentrated_suppliers(sf_dir: str):
    """TPC-H Q20 shape: suppliers holding an outsized share of a part
    family's flow (parts whose name starts with the data-derived first
    letter of min(p_name)). No partsupp availqty, so "outsized" = shipped
    quantity above 2x the part's fair share (2*part_total < qty*n_suppliers,
    exact integers — documented adaptation of Q20's half-of-availqty gate).

    Scale shape: the part-family key set broadcasts and prunes lineitem in
    the scan tasks; per-batch (part, supplier, qty) partials collapse in
    ONE bucketed exchange keyed on partkey so each bucket holds every
    supplier row of its parts — the fair-share comparison is bucket-local;
    the per-supplier rollup and name lookup run on the driver over
    supplier-cardinality rows."""
    import ray as _ray

    from .bucketed import bucketed_group_reduce

    part = _read_small(sf_dir, "part", ["p_partkey", "p_name"])
    prefix = str(part["p_name"].min())[0]
    pk_ref = _ray.put(
        set(int(x) for x in part.loc[part["p_name"].str.startswith(prefix),
                                     "p_partkey"])
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        sub = df.loc[df["l_partkey"].isin(_ray.get(pk_ref))]
        qty = sub["l_quantity"].to_numpy()
        qi = qty.astype("int64")
        assert np.all(qi == qty), "q20 exact-int gate needs integral quantities"
        t = pd.DataFrame(
            {"pk": sub["l_partkey"].to_numpy(dtype="int64"),
             "sk": sub["l_suppkey"].to_numpy(dtype="int64"), "q": qi}
        )
        return t.groupby(["pk", "sk"], sort=False, as_index=False).sum()

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ps = g.groupby(["pk", "sk"], sort=False, as_index=False)["q"].sum()
        tot = ps.groupby("pk", sort=False)["q"].transform("sum")
        nsup = ps.groupby("pk", sort=False)["q"].transform("size")
        keep = ps.loc[2 * tot < ps["q"] * nsup, ["sk"]]
        keep = keep.groupby("sk", sort=False, as_index=False).size()
        return keep.rename(columns={"size": "n_parts"})

    per_supp = bucketed_group_reduce(
        _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_quantity"]),
        ["pk"], partial, per_bucket, n_buckets=16,
    ).to_pandas()
    if per_supp.empty:
        return pd.DataFrame(
            {"s_suppkey": pd.Series([], dtype="int64"),
             "s_name": pd.Series([], dtype=object),
             "n_parts": pd.Series([], dtype="int64")}
        )
    agg = per_supp.groupby("sk", sort=False, as_index=False)["n_parts"].sum()
    names = _read_small(sf_dir, "supplier", ["s_suppkey", "s_name"])
    out = agg.rename(columns={"sk": "s_suppkey"}).merge(names, on="s_suppkey")
    return pd.DataFrame(
        {"s_suppkey": out["s_suppkey"].astype("int64"), "s_name": out["s_name"],
         "n_parts": out["n_parts"].astype("int64")}
    ).reset_index(drop=True)


def q21_sole_return_supplier(sf_dir: str):
    """TPC-H Q21 shape: suppliers who were the ONLY supplier with returned
    lines on a multi-supplier order (the EXISTS + NOT-EXISTS query; the
    corpus has no commit/receipt dates, so "kept waiting" maps to
    l_returnflag = 'R' — documented adaptation preserving the exactly-one-
    culprit-among-many semantics).

    Scale shape: per-batch (order, supplier, returned-count) partials
    collapse in ONE bucketed exchange keyed on orderkey, so each bucket
    sees every supplier row of its orders and the exists/not-exists test is
    a bucket-local vectorized transform; the per-supplier rollup and name
    lookup run on the driver over supplier-cardinality rows."""
    from .bucketed import bucketed_group_reduce

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = pd.DataFrame(
            {"okey": df["l_orderkey"].to_numpy(dtype="int64"),
             "sk": df["l_suppkey"].to_numpy(dtype="int64"),
             "r": (df["l_returnflag"] == "R").to_numpy(dtype="int64")}
        )
        return t.groupby(["okey", "sk"], sort=False, as_index=False).sum()

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ps = g.groupby(["okey", "sk"], sort=False, as_index=False)["r"].sum()
        nsup = ps.groupby("okey", sort=False)["sk"].transform("size")
        nret = (
            ps.assign(has_r=(ps["r"] > 0).astype("int64"))
            .groupby("okey", sort=False)["has_r"].transform("sum")
        )
        keep = ps.loc[(nsup >= 2) & (nret == 1) & (ps["r"] > 0), ["sk"]]
        keep = keep.groupby("sk", sort=False, as_index=False).size()
        return keep.rename(columns={"size": "numwait"})

    per_supp = bucketed_group_reduce(
        _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_returnflag"]),
        ["okey"], partial, per_bucket, n_buckets=32,
    ).to_pandas()
    if per_supp.empty:
        return pd.DataFrame(
            {"s_suppkey": pd.Series([], dtype="int64"),
             "s_name": pd.Series([], dtype=object),
             "numwait": pd.Series([], dtype="int64")}
        )
    agg = per_supp.groupby("sk", sort=False, as_index=False)["numwait"].sum()
    names = _read_small(sf_dir, "supplier", ["s_suppkey", "s_name"])
    out = agg.rename(columns={"sk": "s_suppkey"}).merge(names, on="s_suppkey")
    return pd.DataFrame(
        {"s_suppkey": out["s_suppkey"].astype("int64"), "s_name": out["s_name"],
         "numwait": out["numwait"].astype("int64")}
    ).reset_index(drop=True)


def scd2_user_value_history(sf_dir: str):
    """SCD-type-2 history build over the events stream: each user's events
    become validity intervals — valid_from = the event's timestamp,
    valid_to = the next event's timestamp for that user (-1 sentinel for
    the current/open row). The dimension-history construction every
    warehouse-style training-metadata pipeline needs (who was in what
    state when), done as a distributed interval build rather than a
    window function over a single node.

    Scale shape: the per-batch partial ships only narrow int64 columns
    (user, ts micros, event id, value micro-units) — props/type never
    move; ONE bucketed exchange on user_id co-locates each user's rows,
    and the in-bucket LEAD is one vectorized sort + shift over the whole
    bucket (no per-user Python). Timestamps are exact epoch micros and
    value is micro-units, so the DuckDB window-function oracle matches
    bit for bit."""
    from .bucketed import bucketed_group_reduce

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"user_id": df["user_id"].to_numpy(dtype="int64"),
             "event_id": df["event_id"].to_numpy(dtype="int64"),
             "ts_us": df["ts"].to_numpy().astype("datetime64[us]").astype("int64"),
             "value_e6": _round_half_away(df["value"].to_numpy() * 1e6)}
        )

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"],
                          kind="stable").reset_index(drop=True)
        ts = g["ts_us"].to_numpy(dtype="int64")
        uid = g["user_id"].to_numpy(dtype="int64")
        valid_to = np.full(len(g), -1, dtype="int64")
        if len(g) > 1:
            same = uid[1:] == uid[:-1]
            valid_to[:-1] = np.where(same, ts[1:], -1)
        return pd.DataFrame(
            {"user_id": uid, "event_id": g["event_id"].to_numpy(dtype="int64"),
             "value_e6": g["value_e6"].to_numpy(dtype="int64"),
             "valid_from_us": ts, "valid_to_us": valid_to}
        )

    return bucketed_group_reduce(
        _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"]),
        ["user_id"], partial, reduce, n_buckets=64,
    )


def turn_handoff_latency(sf_dir: str):
    """Role-handoff latency matrix over the derived transcript corpus: for
    every pair of consecutive turns in a conversation, the (from_role,
    to_role) transition with count, total and mean latency — the audit a
    conversation pipeline runs to size timeouts and spot slow tool loops.
    Roles are the deterministic assignment shared with ``conv_role_audit``;
    per-turn timestamps are the deterministic arithmetic ts_us =
    (doc_id % 97)*1e6 + turn_idx*((doc_id % 7)+1)*1e3 (micros), so the
    oracle reproduces latencies exactly (the transcript table's ts column
    at production scale; derived here so DuckDB can mirror it).

    Scale shape: adjacency needs a conversation's turns together, so ONE
    bucketed exchange on conv_id ships narrow (conv, idx, role, ts) int
    rows — text never moves; the in-bucket LAG is a vectorized sort +
    shift over the whole bucket and the final rollup is a at-most-16-row
    driver reduce. Integer micros end to end."""
    from .bucketed import bucketed_group_reduce

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        doc = df["conv_id"].str.slice(4).astype("int64")
        idx = df["turn_idx"].astype("int64")
        role = np.where(
            idx == 0, 0,
            np.where((doc + idx) % 7 == 0, 3, np.where(idx % 2 == 1, 1, 2)),
        ).astype("int64")
        ts_us = (doc % 97) * 1_000_000 + idx * ((doc % 7) + 1) * 1_000
        return pd.DataFrame(
            {"conv_id": df["conv_id"], "turn_idx": idx,
             "role": role, "ts_us": ts_us.astype("int64")}
        )

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv_id", "turn_idx"],
                          kind="stable").reset_index(drop=True)
        if len(g) < 2:
            return pd.DataFrame(
                {"from_role": pd.Series([], dtype="int64"),
                 "to_role": pd.Series([], dtype="int64"),
                 "n": pd.Series([], dtype="int64"),
                 "total_us": pd.Series([], dtype="int64")}
            )
        same = (g["conv_id"].to_numpy()[1:] == g["conv_id"].to_numpy()[:-1])
        role = g["role"].to_numpy(dtype="int64")
        ts = g["ts_us"].to_numpy(dtype="int64")
        t = pd.DataFrame(
            {"from_role": role[:-1][same], "to_role": role[1:][same],
             "lat": (ts[1:] - ts[:-1])[same]}
        )
        out = t.groupby(["from_role", "to_role"], sort=False, as_index=False).agg(
            n=("lat", "size"), total_us=("lat", "sum")
        )
        out["n"] = out["n"].astype("int64")
        out["total_us"] = out["total_us"].astype("int64")
        return out

    parts = bucketed_group_reduce(
        _docs_to_transcripts(sf_dir).select_columns(["conv_id", "turn_idx"]),
        ["conv_id"], partial, reduce, n_buckets=64,
    ).to_pandas()
    if parts.empty:
        return pd.DataFrame(
            {"from_role": pd.Series([], dtype="int64"),
             "to_role": pd.Series([], dtype="int64"),
             "n_handoffs": pd.Series([], dtype="int64"),
             "total_us": pd.Series([], dtype="int64"),
             "mean_us": pd.Series([], dtype="int64")}
        )
    out = parts.groupby(["from_role", "to_role"], sort=False, as_index=False)[
        ["n", "total_us"]
    ].sum()
    return pd.DataFrame(
        {"from_role": out["from_role"].astype("int64"),
         "to_role": out["to_role"].astype("int64"),
         "n_handoffs": out["n"].astype("int64"),
         "total_us": out["total_us"].astype("int64"),
         "mean_us": (out["total_us"] // out["n"]).astype("int64")}
    )


def unpivot_doc_metrics(sf_dir: str):
    """UNPIVOT/melt relational operator: the per-document metric columns
    (chars, whitespace tokens, lines) turned into tall (doc_id, metric,
    value) rows — the wide-to-long reshape feeding metric stores and
    per-metric quantile jobs.

    Scale shape: a pure stateless flat map (3 output rows per input row,
    no shuffle, no state); metrics are computed vectorized per batch and
    the text column never leaves the scan task."""
    def melt(df: pd.DataFrame) -> pd.DataFrame:
        from .textstats import _tokens

        doc = df["doc_id"].to_numpy(dtype="int64")
        n_chars = df["n_chars"].to_numpy(dtype="int64")
        n_tokens = np.array(
            [len(_tokens(t)) for t in df["text"]], dtype="int64"
        )
        n_lines = np.array(
            [t.count("\n") + 1 if t else 0 for t in df["text"]], dtype="int64"
        )
        return pd.DataFrame(
            {"doc_id": np.concatenate([doc, doc, doc]),
             "metric": np.repeat(
                 np.array(["n_chars", "n_tokens", "n_lines"], dtype=object),
                 len(doc)),
             "value": np.concatenate([n_chars, n_tokens, n_lines])}
        )

    return _read(sf_dir, "documents", ["doc_id", "text", "n_chars"]).map_batches(
        melt, batch_format="pandas"
    )


def curriculum_order_docs(sf_dir: str):
    """Curriculum ordering: globally rank documents by length (a difficulty
    proxy) and assign each to one of 4 curriculum stages — the
    shortest-first schedule a curriculum-training pipeline feeds its
    sampler. Exercises the distributed global row_number/ntile operator
    (relational.global_rank): bin-histogram offsets + ONE bucketed range
    exchange, no global sort barrier, nothing corpus-sized on the driver.

    Stage boundaries are DuckDB ntile(4) semantics exactly (first N%4
    tiles take the extra row), so the oracle matches bit for bit."""
    from .relational import global_rank

    ranked, total = global_rank(
        _read(sf_dir, "documents", ["doc_id", "n_chars"]),
        "n_chars", "doc_id", bin_width=256,
    )
    q4, r4 = divmod(total, 4)

    def stage(df: pd.DataFrame) -> pd.DataFrame:
        rank = df["rank"].to_numpy(dtype="int64")
        if q4 == 0:
            st = rank
        else:
            boundary = r4 * (q4 + 1)
            st = np.where(
                rank <= boundary,
                (rank - 1) // (q4 + 1) + 1,
                r4 + (rank - 1 - boundary) // q4 + 1,
            )
        return pd.DataFrame(
            {"doc_id": df["doc_id"].astype("int64"),
             "n_chars": df["n_chars"].astype("int64"),
             "rank": rank, "stage": st.astype("int64")}
        )

    return ranked.map_batches(stage, batch_format="pandas")


def cube_orders(sf_dir: str):
    """GROUP BY CUBE over orders: every subtotal combination of (status,
    order year, priority) with order count and total cents — the full
    OLAP cube (8 grouping sets; ``rollup_orders_status_year`` covers the
    hierarchical prefix subset).

    Scale shape: ONE pre-aggregated exchange at the finest granularity
    (status x year x priority is ~10^2 cells regardless of corpus size);
    all 8 grouping sets are re-aggregations of that small cell table on
    the driver — the fan-out to subtotals never touches the raw rows.
    Sentinels: 'ALL' for rolled-up strings, -1 for rolled-up year."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = pd.DataFrame(
            {"status": df["o_orderstatus"],
             "o_year": df["o_orderdate"].dt.year.astype("int64"),
             "priority": df["o_orderpriority"],
             "n": np.int64(1),
             "cents": _cents(df["o_totalprice"])}
        )
        return t.groupby(["status", "o_year", "priority"], sort=False,
                         as_index=False).sum()

    from .bucketed import bucketed_group_reduce

    cells = bucketed_group_reduce(
        _read(sf_dir, "orders",
              ["o_orderstatus", "o_orderdate", "o_orderpriority",
               "o_totalprice"]),
        ["status", "o_year", "priority"], partial,
        lambda g: g.groupby(["status", "o_year", "priority"], sort=False,
                            as_index=False)[["n", "cents"]].sum(),
        n_buckets=16,
    ).to_pandas()
    dims = ["status", "o_year", "priority"]
    outs = []
    for mask in range(8):
        keep = [d for i, d in enumerate(dims) if mask & (1 << i)]
        if keep:
            g = cells.groupby(keep, sort=False, as_index=False)[
                ["n", "cents"]
            ].sum()
        else:
            g = pd.DataFrame(
                {"n": [cells["n"].sum()], "cents": [cells["cents"].sum()]}
            )
        for d in dims:
            if d not in keep:
                g[d] = -1 if d == "o_year" else "ALL"
        outs.append(g[dims + ["n", "cents"]])
    out = pd.concat(outs, ignore_index=True)
    return pd.DataFrame(
        {"status": out["status"], "o_year": out["o_year"].astype("int64"),
         "priority": out["priority"],
         "n_orders": out["n"].astype("int64"),
         "total_cents": out["cents"].astype("int64")}
    )


def span_interval_islands(sf_dir: str):
    """Gaps-and-islands interval merge — the span-coalescing operator an
    annotation pipeline runs before highlighting or redaction (overlapping
    entity spans merged into disjoint covered regions). Spans here are the
    deterministic arithmetic family start = (doc_id*31 + j*57) % (L-7),
    len = 3 + (doc_id + j) % 5, j < 1 + doc_id % 4 (the transcript table's
    extracted spans at production scale; derived so DuckDB can mirror).

    Scale shape: span synthesis is stateless per batch; merging needs a
    doc's spans together, which they already are (generated per row), so
    the whole operator is ONE map_batches with a vectorized per-batch
    sort + running-max island scan — no shuffle at all. Output (doc_id,
    n_spans, n_islands, covered_chars), all exact ints."""
    def islands(df: pd.DataFrame) -> pd.DataFrame:
        doc = df["doc_id"].to_numpy(dtype="int64")
        L = df["n_chars"].to_numpy(dtype="int64")
        nsp = 1 + doc % 4
        # explode: one row per (doc, j)
        ridx = np.repeat(np.arange(len(doc)), nsp)
        j = np.concatenate([np.arange(n) for n in nsp]) if len(doc) else \
            np.array([], dtype="int64")
        d, l = doc[ridx], L[ridx]
        start = (d * 31 + j * 57) % (l - 7)
        end = start + 3 + (d + j) % 5
        # per-doc island scan: sort by (row, start, j); prev_max = running
        # max of end within the row segment (pandas cummax = C groupby, no
        # per-doc Python); new island where start exceeds everything seen
        order = np.lexsort((j, start, ridx))
        r, s, e = ridx[order], start[order], end[order]
        n_isl = np.zeros(len(doc), dtype="int64")
        covered = np.zeros(len(doc), dtype="int64")
        if len(r):
            t = pd.DataFrame({"r": r, "s": s, "e": e})
            t["prev_max"] = t.groupby("r", sort=False)["e"].cummax().shift(1)
            seg_first = (t["r"] != t["r"].shift(1)).to_numpy()
            t.loc[seg_first, "prev_max"] = -1
            new_isl = (t["s"] > t["prev_max"]).to_numpy()
            t["g"] = np.cumsum(new_isl)
            isl = t.groupby(["r", "g"], sort=False).agg(
                lo=("s", "min"), hi=("e", "max")
            ).reset_index()
            per_doc = isl.groupby("r", sort=False).agg(
                n_islands=("g", "size"), hi_sum=("hi", "sum"),
                lo_sum=("lo", "sum"),
            ).reset_index()
            n_isl[per_doc["r"].to_numpy()] = per_doc["n_islands"].to_numpy()
            covered[per_doc["r"].to_numpy()] = (
                per_doc["hi_sum"].to_numpy() - per_doc["lo_sum"].to_numpy()
            )
        return pd.DataFrame(
            {"doc_id": doc, "n_spans": nsp.astype("int64"),
             "n_islands": n_isl, "covered_chars": covered}
        )

    return _read(sf_dir, "documents", ["doc_id", "n_chars"]).map_batches(
        islands, batch_format="pandas"
    )


def kmv_distinct_tokens_per_source(sf_dir: str):
    """KMV (k-minimum-values, k=256) distinct-token sketch per source — the
    third cardinality sketch next to HLL (``hll_users_per_type``) and exact
    distinct: keeps the k smallest 64-bit token hashes and estimates
    distinct = (k-1) * 2^64 / h_k. Mergeable and tiny, the sketch of
    choice when you also need the sample itself (the k survivors are a
    uniform sample of the distinct domain).

    Scale shape: each batch ships at most k hash rows per source (raw
    tokens never leave the scan task); ONE bucketed exchange on source;
    bottom-k-of-unions is exact for the global bottom-k, and the union
    count is < k iff the true distinct count is (proof: a batch only
    drops values when >= k survive from it), so the small-cardinality
    exact branch is also exact. Estimate is arbitrary-precision integer
    floor math — Python ints here, HUGEINT in the oracle — so the match
    is bit-stable. Hash contract shared with the HLL/simhash oracles:
    md5_number_upper(t) == int.from_bytes(md5(t).digest()[:8], 'little')."""
    import hashlib

    from .bucketed import bucketed_group_reduce
    from .textstats import _tokens

    K = 256

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        srcs, hs = [], []
        per_src: dict[str, set] = {}
        for src, text in zip(df["source"], df["text"]):
            bucket = per_src.setdefault(src, set())
            for tok in _tokens(text):
                bucket.add(tok)
        for src, toks in per_src.items():
            h = np.fromiter(
                (int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "little")
                 for t in toks),
                dtype=np.uint64, count=len(toks),
            )
            h = np.unique(h)  # sorted distinct
            h = h[:K]
            srcs.extend([src] * len(h))
            hs.append(h)
        return pd.DataFrame(
            {"source": srcs,
             "h": np.concatenate(hs) if hs else np.array([], dtype=np.uint64)}
        )

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for src, grp in g.groupby("source", sort=False):
            h = np.unique(grp["h"].to_numpy(dtype=np.uint64))
            n = len(h)
            if n < K:
                est = n
            else:
                est = ((K - 1) << 64) // int(h[K - 1])
            out.append((src, min(n, K), est))
        res = pd.DataFrame(out, columns=["source", "n_kept", "est_distinct"])
        res["n_kept"] = res["n_kept"].astype("int64")
        res["est_distinct"] = res["est_distinct"].astype("int64")
        return res

    return bucketed_group_reduce(
        _read(sf_dir, "documents", ["source", "text"]),
        ["source"], partial, reduce, n_buckets=16,
    )


def zonemap_pruned_scan(sf_dir: str):
    """Zone-map data skipping end to end (rayextract.zonemap): write the
    documents table range-clustered on n_chars (partitioned on the derived
    64-char band), harvest per-file [min,max] from the parquet FOOTERS into
    a manifest, then answer a length-range query by opening only the
    overlapping files. The file-level skip is asserted (scanned < total)
    before the residual row filter runs vectorized in the scan tasks.

    Scale shape: the manifest build touches footers only (KB/file); the
    pruned read is a plain read over the surviving file list; at 100 TB
    this is the stage that turns a full-corpus scan into a ~band-sized
    one. Output one row (n_docs, sum_chars, plus the file-skip evidence
    as scanned/total counts — constants of the deterministic band layout,
    so the oracle mirrors them arithmetically)."""
    import hashlib
    import shutil

    from .zonemap import build_manifest, pruned_paths

    LO, HI = 128, 256
    scratch = os.path.join(
        "/tmp/rayextract_zonemap",
        hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12],
    )
    shutil.rmtree(scratch, ignore_errors=True)

    def band(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["band"] = (out["n_chars"].astype("int64") // 64).astype("int64")
        return out

    (
        _read(sf_dir, "documents", ["doc_id", "n_chars"])
        .map_batches(band, batch_format="pandas")
        .write_parquet(scratch, partition_cols=["band"])
    )
    build_manifest(scratch, "n_chars")
    paths, total = pruned_paths(scratch, {"n_chars": (LO, HI)})
    assert len(paths) < total, "zone map failed to skip any file"

    # file counts depend on the writer's block layout; the DETERMINISTIC
    # skip evidence is the band-directory level (a band's files share one
    # pruning outcome because their stats sit inside the band window)
    def _band_of(p: str) -> str:
        return next(seg for seg in p.split(os.sep) if seg.startswith("band="))

    all_paths, _ = pruned_paths(scratch)
    bands_scanned = len({_band_of(p) for p in paths})
    bands_total = len({_band_of(p) for p in all_paths})

    from .pqio import read_parquet_clean

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n_chars"].to_numpy(dtype="int64")
        m = (n >= LO) & (n < HI)
        return pd.DataFrame(
            {"n_docs": [int(m.sum())], "sum_chars": [int(n[m].sum())]}
        )

    part = read_parquet_clean(paths, columns=["n_chars"]).map_batches(
        agg, batch_format="pandas"
    ).to_pandas()
    return pd.DataFrame(
        {"n_docs": [int(part["n_docs"].sum())],
         "sum_chars": [int(part["sum_chars"].sum())],
         "bands_scanned": [bands_scanned], "bands_total": [bands_total]}
    ).astype("int64")


def zorder_pruned_scan(sf_dir: str):
    """Z-ORDER clustering + two-dimensional zone pruning (the lakehouse
    OPTIMIZE ZORDER BY pattern): events are rewritten clustered by the
    Morton interleave of (user_id, value-bucket) into 32 z-bands, the
    manifest harvests per-file [min,max] of BOTH predicate columns from
    the footers, and a 2-d box query (user AND value range) opens only the
    bands whose zones overlap in BOTH dims — single-key clustering can
    make only one of those columns tight.

    Pruning runs at band granularity (zonemap.pruned_dirs) so the skip
    evidence is exactly reproducible from data arithmetic: band = z * 32
    // (zmax+1), kept iff the band's (user, cents) envelope intersects the
    box. The skip is asserted before the residual row filter. Integer
    cents end to end; the oracle mirrors the Morton key bit for bit via
    zonemap.z_interleave16_sql."""
    import hashlib
    import shutil

    from .zonemap import build_manifest, pruned_dirs, z_interleave16

    VC_LO, VC_HI = 10_000, 30_000
    NB = 32
    scratch = os.path.join(
        "/tmp/rayextract_zorder",
        hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12],
    )
    shutil.rmtree(scratch, ignore_errors=True)

    def project(df: pd.DataFrame) -> pd.DataFrame:
        u = df["user_id"].to_numpy(dtype="int64")
        vc = _round_half_away(df["value"].to_numpy() * 100.0)
        return pd.DataFrame(
            {"event_id": df["event_id"].to_numpy(dtype="int64"),
             "user_id": u, "vc": vc,
             "z": z_interleave16(u, vc // 1000)}
        )

    proj = _read(sf_dir, "events", ["event_id", "user_id", "value"]).map_batches(
        project, batch_format="pandas"
    )
    ext = proj.map_batches(
        lambda df: pd.DataFrame({"m": [df["z"].max()], "u": [df["user_id"].max()]})
        if len(df) else pd.DataFrame({"m": pd.Series([], dtype="int64"),
                                      "u": pd.Series([], dtype="int64")}),
        batch_format="pandas",
    ).to_pandas()
    zmax, umax = int(ext["m"].max()), int(ext["u"].max())
    # data-derived user box (2nd quartile of the id range) so the query is
    # selective at every scale factor; the oracle derives the same bounds
    U_LO, U_HI = (umax + 1) // 4, (umax + 1) // 2

    def banded(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["zband"] = (out["z"].to_numpy(dtype="int64") * NB
                        // (zmax + 1)).astype("int64")
        return out.drop(columns=["z"])

    proj.map_batches(banded, batch_format="pandas").write_parquet(
        scratch, partition_cols=["zband"]
    )
    build_manifest(scratch, ["user_id", "vc"])
    paths, kept, total = pruned_dirs(
        scratch, {"user_id": (U_LO, U_HI), "vc": (VC_LO, VC_HI)}
    )
    assert kept < total, "z-order zone map failed to skip any band"

    from .pqio import read_parquet_clean

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        u = df["user_id"].to_numpy(dtype="int64")
        vc = df["vc"].to_numpy(dtype="int64")
        m = (u >= U_LO) & (u < U_HI) & (vc >= VC_LO) & (vc < VC_HI)
        return pd.DataFrame(
            {"n_events": [int(m.sum())], "sum_vc_cents": [int(vc[m].sum())]}
        )

    if paths:
        part = read_parquet_clean(paths, columns=["user_id", "vc"]).map_batches(
            agg, batch_format="pandas"
        ).to_pandas()
        n_events = int(part["n_events"].sum())
        sum_vc = int(part["sum_vc_cents"].sum())
    else:  # every band provably disjoint from the box
        n_events = sum_vc = 0
    return pd.DataFrame(
        {"n_events": [n_events], "sum_vc_cents": [sum_vc],
         "bands_scanned": [kept], "bands_total": [total]}
    ).astype("int64")


def storage_bucketed_join(sf_dir: str):
    """Storage-bucketed join (the Hive/Iceberg bucket-transform pattern):
    both join sides are rewritten ONCE partitioned by hash(orderkey) % 16,
    after which the lineitem-x-orders join needs NO runtime exchange at
    all — each task co-reads bucket i of both tables and joins locally,
    because equal keys are guaranteed co-located by the storage layout.
    At 100 TB this converts every repeated join on the same key from an
    all-to-all shuffle into an embarrassingly parallel per-bucket map
    (the write cost is paid once, amortized across every downstream join).

    The bucket function is the deterministic md5-derived hash shared with
    the engine's other oracles, so DuckDB reproduces the bucketing — the
    oracle checks the end result (revenue per order status) which is
    bucketing-invariant anyway. Output integer cents."""
    import hashlib
    import shutil

    import ray as _ray

    B = 16
    scratch = os.path.join(
        "/tmp/rayextract_bucketed_join",
        hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12],
    )
    shutil.rmtree(scratch, ignore_errors=True)

    def add_bucket(col: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            out = df.copy()
            out["bkt"] = (out[col].to_numpy(dtype="int64") % B).astype("int64")
            return out

        return fn

    def li_proj(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"l_orderkey": df["l_orderkey"].to_numpy(dtype="int64"),
             "cents": _round_half_away(
                 df["l_extendedprice"].to_numpy()
                 * (1.0 - df["l_discount"].to_numpy()) * 100.0
             )}
        )

    (
        _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])
        .map_batches(li_proj, batch_format="pandas")
        .map_batches(add_bucket("l_orderkey"), batch_format="pandas")
        .write_parquet(os.path.join(scratch, "lineitem"),
                       partition_cols=["bkt"])
    )
    (
        _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus"])
        .map_batches(add_bucket("o_orderkey"), batch_format="pandas")
        .write_parquet(os.path.join(scratch, "orders"),
                       partition_cols=["bkt"])
    )

    # the join itself: one task per bucket, ZERO exchange — co-located
    # storage replaces the shuffle (files read inside the task, partials
    # are status-cardinality rows)
    import pyarrow.parquet as _pq

    def join_bucket(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for b in df["bkt"]:
            li_dir = os.path.join(scratch, "lineitem", f"bkt={int(b)}")
            o_dir = os.path.join(scratch, "orders", f"bkt={int(b)}")
            if not (os.path.isdir(li_dir) and os.path.isdir(o_dir)):
                continue
            li = _pq.read_table(li_dir).to_pandas()
            od = _pq.read_table(o_dir).to_pandas()
            m = li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
            outs.append(
                m.groupby("o_orderstatus", sort=False, as_index=False)[
                    "cents"
                ].sum()
            )
        if not outs:
            return pd.DataFrame(
                {"o_orderstatus": pd.Series([], dtype=object),
                 "cents": pd.Series([], dtype="int64")}
            )
        return pd.concat(outs, ignore_index=True)

    import ray.data as _rd

    parts = (
        _rd.from_pandas(pd.DataFrame({"bkt": np.arange(B, dtype="int64")}))
        .repartition(B)
        .map_batches(join_bucket, batch_format="pandas")
        .to_pandas()
    )
    out = parts.groupby("o_orderstatus", sort=False, as_index=False)[
        "cents"
    ].sum().rename(columns={"cents": "revenue_cents"})
    out["revenue_cents"] = out["revenue_cents"].astype("int64")
    return out


def winsorized_value_stats(sf_dir: str):
    """Winsorized per-type value statistics: clip each event's value to its
    type's [p05, p95] band and report the clipped sum plus how many rows
    were clipped on each side — the outlier-robust aggregate a metrics
    pipeline uses when raw sums are dominated by a few extreme rows.

    The percentile is pinned to an explicit order statistic (k-th smallest,
    k = floor(q*(n-1)) + 1, both sides) so Ray and the SQL window oracle
    agree exactly; values are integer cents.

    Scale shape: pass 1 computes exact per-type order statistics with ONE
    bucketed exchange on event_type (cents ship as narrow int rows; at a
    cardinality where a type's values overflow a reducer you'd switch to
    the fixed-bin histogram op — see histogram_quantiles_value); the tiny
    threshold table broadcasts back and pass 2 is a shuffle-free clipped
    partial sum."""
    import ray as _ray

    from .bucketed import bucketed_group_reduce

    def p1_partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"event_type": df["event_type"],
             "cents": _round_half_away(df["value"].to_numpy() * 100.0)}
        )

    def p1_reduce(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for et, grp in g.groupby("event_type", sort=False):
            v = np.sort(grp["cents"].to_numpy(dtype="int64"))
            n = len(v)
            lo = int(v[(5 * (n - 1)) // 100])
            hi = int(v[(95 * (n - 1)) // 100])
            out.append((et, lo, hi))
        return pd.DataFrame(out, columns=["event_type", "lo", "hi"])

    thr = bucketed_group_reduce(
        _read(sf_dir, "events", ["event_type", "value"]),
        ["event_type"], p1_partial, p1_reduce, n_buckets=16,
    ).to_pandas()
    thr_ref = _ray.put(
        {r.event_type: (int(r.lo), int(r.hi)) for r in thr.itertuples()}
    )

    def p2(df: pd.DataFrame) -> pd.DataFrame:
        t = _ray.get(thr_ref)
        cents = _round_half_away(df["value"].to_numpy() * 100.0)
        lo = np.fromiter((t[e][0] for e in df["event_type"]), dtype="int64",
                         count=len(df))
        hi = np.fromiter((t[e][1] for e in df["event_type"]), dtype="int64",
                         count=len(df))
        clipped = np.clip(cents, lo, hi)
        out = pd.DataFrame(
            {"event_type": df["event_type"], "wsum": clipped,
             "n_lo": (cents < lo).astype("int64"),
             "n_hi": (cents > hi).astype("int64")}
        )
        return out.groupby("event_type", sort=False, as_index=False).sum()

    parts = (
        _read(sf_dir, "events", ["event_type", "value"])
        .map_batches(p2, batch_format="pandas")
        .to_pandas()
        .groupby("event_type", sort=False, as_index=False)
        .sum()
    )
    out = parts.merge(thr, on="event_type")
    return pd.DataFrame(
        {"event_type": out["event_type"],
         "p05_cents": out["lo"].astype("int64"),
         "p95_cents": out["hi"].astype("int64"),
         "winsorized_sum_cents": out["wsum"].astype("int64"),
         "n_clipped_low": out["n_lo"].astype("int64"),
         "n_clipped_high": out["n_hi"].astype("int64")}
    )


def tool_usage_stats(sf_dir: str):
    """Per-tool usage audit over the derived transcript corpus: every tool
    turn (role assignment shared with ``conv_role_audit``) carries the
    deterministic tool name 'T' || (doc_id + 3*turn_idx) % 5 and the wait
    it imposed (timestamp delta from the preceding turn, the same ts
    arithmetic as ``turn_handoff_latency``) — the table an agent-pipeline
    operator reads to find slow or overused tools. Exercises the
    transcript schema's ``tool`` column semantics end to end.

    Scale shape: ONE bucketed exchange on conv_id ships narrow int rows;
    the in-bucket LAG is vectorized; per-tool partials collapse to a
    5-row driver rollup. Integer micros end to end."""
    from .bucketed import bucketed_group_reduce

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        doc = df["conv_id"].str.slice(4).astype("int64")
        idx = df["turn_idx"].astype("int64")
        role = np.where(
            idx == 0, 0,
            np.where((doc + idx) % 7 == 0, 3, np.where(idx % 2 == 1, 1, 2)),
        ).astype("int64")
        ts_us = (doc % 97) * 1_000_000 + idx * ((doc % 7) + 1) * 1_000
        return pd.DataFrame(
            {"conv_id": df["conv_id"], "turn_idx": idx, "role": role,
             "tool_id": ((doc + 3 * idx) % 5).astype("int64"),
             "ts_us": ts_us.astype("int64")}
        )

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv_id", "turn_idx"],
                          kind="stable").reset_index(drop=True)
        prev_ts = g.groupby("conv_id", sort=False)["ts_us"].shift(1)
        m = (g["role"] == 3) & prev_ts.notna()
        t = pd.DataFrame(
            {"tool_id": g.loc[m, "tool_id"],
             "conv_id": g.loc[m, "conv_id"],
             "wait": (g.loc[m, "ts_us"] - prev_ts[m]).astype("int64")}
        )
        out = t.groupby("tool_id", sort=False).agg(
            n_calls=("wait", "size"), total_wait_us=("wait", "sum"),
            n_convs=("conv_id", "nunique"),
        ).reset_index()
        for c in ("n_calls", "total_wait_us", "n_convs"):
            out[c] = out[c].astype("int64")
        return out

    parts = bucketed_group_reduce(
        _docs_to_transcripts(sf_dir).select_columns(["conv_id", "turn_idx"]),
        ["conv_id"], partial, reduce, n_buckets=64,
    ).to_pandas()
    if parts.empty:
        return pd.DataFrame(
            {"tool": pd.Series([], dtype=object),
             "n_calls": pd.Series([], dtype="int64"),
             "n_convs": pd.Series([], dtype="int64"),
             "total_wait_us": pd.Series([], dtype="int64"),
             "mean_wait_us": pd.Series([], dtype="int64")}
        )
    out = parts.groupby("tool_id", sort=False, as_index=False)[
        ["n_calls", "total_wait_us", "n_convs"]
    ].sum()
    return pd.DataFrame(
        {"tool": "T" + out["tool_id"].astype(str),
         "n_calls": out["n_calls"].astype("int64"),
         "n_convs": out["n_convs"].astype("int64"),
         "total_wait_us": out["total_wait_us"].astype("int64"),
         "mean_wait_us": (out["total_wait_us"]
                          // out["n_calls"]).astype("int64")}
    )


def _pareto_frontier(df: pd.DataFrame, price: str, size: str) -> pd.DataFrame:
    """Skyline of (minimize price, maximize size), exact-tie-keeping: a row
    is dominated iff some other row is <= on price, >= on size and strictly
    better on one. Vectorized: per-price max sizes, prefix cummax over
    ascending prices."""
    if df.empty:
        return df
    per = df.groupby(price, sort=True)[size].max()
    prices = per.index.to_numpy()
    best_at = per.to_numpy()
    best_before = np.r_[np.iinfo(np.int64).min,
                        np.maximum.accumulate(best_at)[:-1]]
    pi = np.searchsorted(prices, df[price].to_numpy())
    s = df[size].to_numpy()
    keep = (s == best_at[pi]) & (s > best_before[pi])
    return df.loc[keep]


def pareto_frontier_parts(sf_dir: str):
    """Skyline / Pareto-frontier operator over the part catalog: parts not
    dominated in (retail price DOWN, size UP) — "no cheaper part is at
    least as large". The multi-objective shortlist query (NOT EXISTS a
    dominating row) that no single ORDER BY can answer.

    Scale shape: the skyline is superset-stable (a globally undominated
    row is undominated in every subset), so each batch emits only its
    LOCAL frontier — typically O(distinct prices) rows — and the driver
    runs the same vectorized frontier once over the tiny union; no
    shuffle, no all-pairs. Exact integer cents so the NOT-EXISTS oracle
    matches bit for bit (equal-point duplicates are kept on both sides)."""
    def local(df: pd.DataFrame) -> pd.DataFrame:
        t = pd.DataFrame(
            {"p_partkey": df["p_partkey"].to_numpy(dtype="int64"),
             "price_cents": _cents(df["p_retailprice"]),
             "p_size": df["p_size"].to_numpy(dtype="int64")}
        )
        return _pareto_frontier(t, "price_cents", "p_size")

    union = (
        _read(sf_dir, "part", ["p_partkey", "p_retailprice", "p_size"])
        .map_batches(local, batch_format="pandas")
        .to_pandas()
    )
    return _pareto_frontier(union, "price_cents", "p_size")[
        ["p_partkey", "price_cents", "p_size"]
    ].reset_index(drop=True)


def rapid_fire_pairs_per_user(sf_dir: str):
    """Band (theta) self-join: per user, the number of ordered event pairs
    (i before j, order = (ts, event_id)) at most one hour apart — the
    burst/bot-detection count a rate-limiting or fraud pipeline computes.
    Ray Data has no inequality join; the scalable shape is the same
    co-partition trick as the as-of join: bucket by the equality key,
    sort in-bucket, and resolve the band with ONE vectorized searchsorted
    per bucket (O(n log n), never the O(n^2) self-join the SQL oracle
    runs at toy scale).

    PARTITIONING ASSUMPTION: a user's events share a bucket; a hot user
    is bounded by the bucket, not salted — the band needs the whole user
    ordered."""
    from .bucketed import bucketed_group_reduce

    WIN_US = 3_600_000_000  # 1 hour

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"user_id": df["user_id"].to_numpy(dtype="int64"),
             "event_id": df["event_id"].to_numpy(dtype="int64"),
             "ts_us": df["ts"].to_numpy().astype("datetime64[us]")
                        .astype("int64")}
        )

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"],
                          kind="stable").reset_index(drop=True)
        uid = g["user_id"].to_numpy()
        ts = g["ts_us"].to_numpy()
        pos = np.arange(len(g))
        # pairs for row j = rows in [lo_j, j) of the same user with
        # ts >= ts_j - WIN. The (user, ts) sort is made globally monotonic
        # by packing user into the bits above the 51-bit microsecond
        # timestamps, so ONE vectorized searchsorted resolves every lower
        # bound (ts < 2^51 asserted; a wider epoch would use a (rank<<k)
        # composition instead)
        assert ts.max(initial=0) < (1 << 51) and ts.min(initial=0) >= 0
        key = (uid << np.int64(51)) + ts
        lo = np.searchsorted(key, (uid << np.int64(51)) + ts - WIN_US,
                             side="left")
        n_pairs = pos - lo
        t = pd.DataFrame({"user_id": uid, "n": n_pairs})
        out = t.groupby("user_id", sort=False, as_index=False)["n"].sum()
        return out[out["n"] > 0]

    parts = bucketed_group_reduce(
        _read(sf_dir, "events", ["event_id", "ts", "user_id"]),
        ["user_id"], partial, reduce, n_buckets=64,
    ).to_pandas()
    if parts.empty:
        return pd.DataFrame(
            {"user_id": pd.Series([], dtype="int64"),
             "n_rapid_pairs": pd.Series([], dtype="int64")}
        )
    out = parts.groupby("user_id", sort=False, as_index=False)["n"].sum()
    return pd.DataFrame(
        {"user_id": out["user_id"].astype("int64"),
         "n_rapid_pairs": out["n"].astype("int64")}
    )


def ewma_hourly_value_per_type(sf_dir: str):
    """Exponentially-weighted moving average (alpha = 1/2, integer floor)
    of hourly revenue per event type — the smoothed trend line a
    monitoring pipeline keeps per stream. The halving recurrence
    ewma_i = (ewma_{i-1} + cents_i) // 2 is deliberately NON-associative
    (floor at every step), the class of sequential scan that cannot be
    tree-reduced — unlike the SUM/MAX scan monoids in pack_sequences /
    late_event_audit — so it pins the engine's ordered-scan contract.

    Scale shape: raw rows collapse to (type, hour) cells in per-batch
    partials; ONE bucketed exchange on event_type co-locates each type's
    cells and the in-bucket scan walks hour cells (cardinality = hours,
    not events — the loop is over ~10^4 cells max, never rows). The
    oracle replays the identical recurrence as a recursive CTE."""
    from .bucketed import bucketed_group_reduce

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = pd.DataFrame(
            {"event_type": df["event_type"],
             "hr": df["ts"].dt.floor("h"),
             "cents": _round_half_away(df["value"].to_numpy() * 100.0)}
        )
        return t.groupby(["event_type", "hr"], sort=False,
                         as_index=False).sum()

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["event_type", "hr"], sort=False, as_index=False).sum()
        out = []
        for et, grp in g.groupby("event_type", sort=False):
            grp = grp.sort_values("hr", kind="stable")
            ewma = None
            for hr, cents in zip(grp["hr"], grp["cents"]):
                c = int(cents)
                ewma = c if ewma is None else (ewma + c) // 2
                out.append((et, hr, c, ewma))
        res = pd.DataFrame(
            out, columns=["event_type", "hr", "hour_cents", "ewma_cents"]
        )
        res["hour"] = res["hr"].dt.strftime("%Y-%m-%d %H")
        res["hour_cents"] = res["hour_cents"].astype("int64")
        res["ewma_cents"] = res["ewma_cents"].astype("int64")
        return res[["event_type", "hour", "hour_cents", "ewma_cents"]]

    return bucketed_group_reduce(
        _read(sf_dir, "events", ["event_type", "ts", "value"]),
        ["event_type"], partial, reduce, n_buckets=8,
    )


def conv_merge_consecutive_roles(sf_dir: str):
    """Consecutive-same-role turn compaction over the derived transcript
    corpus — the standard chat-SFT preprocessing step that merges adjacent
    messages from the same speaker into one turn before templating. Roles
    are the deterministic assignment shared with ``conv_role_audit``.
    Output per conversation: turns before/after, the longest merged run,
    and the token total (invariant under merging — the checksum that the
    compaction lost nothing).

    Scale shape: ONE bucketed exchange on conv_id ships narrow (conv, idx,
    role, ntok) rows — text never shuffles; run detection is a vectorized
    sorted LAG over the whole bucket and run lengths come from one
    groupby(conv, run_id) count. The run-length (gaps-and-islands) scan
    shared with span_interval_islands, applied to the role stream."""
    from .bucketed import bucketed_group_reduce
    from .textstats import _tokens

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        doc = df["conv_id"].str.slice(4).astype("int64")
        idx = df["turn_idx"].astype("int64")
        role = np.where(
            idx == 0, 0,
            np.where((doc + idx) % 7 == 0, 3, np.where(idx % 2 == 1, 1, 2)),
        ).astype("int64")
        ntok = np.array([len(_tokens(t)) for t in df["text"]], dtype="int64")
        return pd.DataFrame(
            {"conv_id": df["conv_id"], "turn_idx": idx,
             "role": role, "ntok": ntok}
        )

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv_id", "turn_idx"],
                          kind="stable").reset_index(drop=True)
        conv = g["conv_id"].to_numpy()
        role = g["role"].to_numpy()
        new_run = np.r_[True, (conv[1:] != conv[:-1])
                        | (role[1:] != role[:-1])]
        gid = np.cumsum(new_run)
        t = pd.DataFrame({"conv_id": conv, "g": gid, "n": 1,
                          "ntok": g["ntok"].to_numpy()})
        runs = t.groupby(["conv_id", "g"], sort=False, as_index=False).agg(
            run_len=("n", "sum"), run_tok=("ntok", "sum")
        )
        out = runs.groupby("conv_id", sort=False, as_index=False).agg(
            n_turns_after=("g", "size"), max_run_len=("run_len", "max"),
            n_tokens=("run_tok", "sum"),
        )
        before = t.groupby("conv_id", sort=False, as_index=False)["n"].sum()
        out = out.merge(before.rename(columns={"n": "n_turns_before"}),
                        on="conv_id")
        for c in ("n_turns_after", "max_run_len", "n_tokens",
                  "n_turns_before"):
            out[c] = out[c].astype("int64")
        return out[["conv_id", "n_turns_before", "n_turns_after",
                    "max_run_len", "n_tokens"]]

    return bucketed_group_reduce(
        _docs_to_transcripts(sf_dir), ["conv_id"], partial, reduce,
        n_buckets=64,
    )


def value_outliers_mad(sf_dir: str):
    """Robust outlier gate per event type: flag events whose value sits
    more than 3 median-absolute-deviations from the type median — the
    MAD-based robust z-score that survives the heavy tails a mean/stddev
    gate chokes on. Both order statistics are pinned to the lower median
    (k = (n+1)//2, 1-based k-th smallest) so Ray and the SQL window
    oracle agree exactly; the flag is the exact integer comparison
    |cents - med| > 3*mad.

    Scale shape: pass 1 computes (median, MAD) per type with ONE bucketed
    exchange on event_type (same reducer-bound caveat as
    winsorized_value_stats); the 2-int-per-type table broadcasts back and
    pass 2 is a shuffle-free flagged partial sum."""
    import ray as _ray

    from .bucketed import bucketed_group_reduce

    def p1_partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"event_type": df["event_type"],
             "cents": _round_half_away(df["value"].to_numpy() * 100.0)}
        )

    def p1_reduce(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for et, grp in g.groupby("event_type", sort=False):
            v = np.sort(grp["cents"].to_numpy(dtype="int64"))
            med = int(v[(len(v) + 1) // 2 - 1])
            dev = np.sort(np.abs(v - med))
            mad = int(dev[(len(dev) + 1) // 2 - 1])
            out.append((et, med, mad))
        return pd.DataFrame(out, columns=["event_type", "med", "mad"])

    thr = bucketed_group_reduce(
        _read(sf_dir, "events", ["event_type", "value"]),
        ["event_type"], p1_partial, p1_reduce, n_buckets=16,
    ).to_pandas()
    thr_ref = _ray.put(
        {r.event_type: (int(r.med), int(r.mad)) for r in thr.itertuples()}
    )

    def p2(df: pd.DataFrame) -> pd.DataFrame:
        t = _ray.get(thr_ref)
        cents = _round_half_away(df["value"].to_numpy() * 100.0)
        med = np.fromiter((t[e][0] for e in df["event_type"]), dtype="int64",
                          count=len(df))
        mad = np.fromiter((t[e][1] for e in df["event_type"]), dtype="int64",
                          count=len(df))
        out_mask = np.abs(cents - med) > 3 * mad
        out = pd.DataFrame(
            {"event_type": df["event_type"],
             "n_out": out_mask.astype("int64"),
             "out_cents": np.where(out_mask, cents, 0).astype("int64")}
        )
        return out.groupby("event_type", sort=False, as_index=False).sum()

    parts = (
        _read(sf_dir, "events", ["event_type", "value"])
        .map_batches(p2, batch_format="pandas")
        .to_pandas()
        .groupby("event_type", sort=False, as_index=False)
        .sum()
    )
    out = parts.merge(thr, on="event_type")
    return pd.DataFrame(
        {"event_type": out["event_type"],
         "median_cents": out["med"].astype("int64"),
         "mad_cents": out["mad"].astype("int64"),
         "n_outliers": out["n_out"].astype("int64"),
         "outlier_cents_sum": out["out_cents"].astype("int64")}
    )


def gapfill_hourly_value_per_type(sf_dir: str):
    """Time-series gap fill with linear interpolation: densify each event
    type's hourly revenue series over [first hour, last hour], filling
    missing hours with the integer linear interpolation between the
    bracketing present cells — the resample step before any
    rolling-window model. Interpolation uses the weighted-midpoint form
    (pv*(nh-h) + nv*(h-ph)) // (nh-ph): both products are non-negative,
    so Python floor division and DuckDB's TRUNCATING ``//`` agree (the
    naive pv + (nv-pv)*dt//span form would diverge on falling slopes —
    DuckDB truncates toward zero on negatives).

    Scale shape: raw rows collapse to (type, hour) cells in per-batch
    partials; ONE bucketed exchange on event_type; the densify +
    interpolate is fully vectorized per type (searchsorted against the
    present-hour array — no per-hour Python). Output cardinality is
    hours, not events."""
    from .bucketed import bucketed_group_reduce

    HOUR_US = 3_600_000_000

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = pd.DataFrame(
            {"event_type": df["event_type"],
             "h": df["ts"].dt.floor("h").to_numpy()
                    .astype("datetime64[us]").astype("int64"),
             "cents": _round_half_away(df["value"].to_numpy() * 100.0)}
        )
        return t.groupby(["event_type", "h"], sort=False,
                         as_index=False).sum()

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["event_type", "h"], sort=False, as_index=False).sum()
        out = []
        for et, grp in g.groupby("event_type", sort=False):
            grp = grp.sort_values("h", kind="stable")
            hrs = grp["h"].to_numpy(dtype="int64")
            c = grp["cents"].to_numpy(dtype="int64")
            full = np.arange(hrs[0], hrs[-1] + HOUR_US, HOUR_US,
                             dtype="int64")
            idx = np.searchsorted(hrs, full, side="right") - 1
            present = hrs[idx] == full
            nx = np.minimum(idx + 1, len(hrs) - 1)
            span = np.maximum(hrs[nx] - hrs[idx], 1)  # safe where present
            interp = (c[idx] * (hrs[nx] - full)
                      + c[nx] * (full - hrs[idx])) // span
            vals = np.where(present, c[idx], interp)
            out.append(pd.DataFrame(
                {"event_type": et, "h": full, "cents": vals,
                 "filled": ~present}
            ))
        res = pd.concat(out, ignore_index=True)
        res["hour"] = pd.to_datetime(
            res["h"], unit="us"
        ).dt.strftime("%Y-%m-%d %H")
        res["cents"] = res["cents"].astype("int64")
        return res[["event_type", "hour", "cents", "filled"]]

    return bucketed_group_reduce(
        _read(sf_dir, "events", ["event_type", "ts", "value"]),
        ["event_type"], partial, reduce, n_buckets=8,
    )


def extraction_quality_report(sf_dir: str):
    """Corpus-level quality report over the flagship extraction: per-field
    fill counts (how many conversations yielded each extracted field),
    total conversations and turns — the one-row scorecard an operator
    reads after every production run to catch extraction regressions
    (a field's fill rate dropping is the canary for a parser change).

    Composes the full flagship pipeline (``transcript_extract``: parse ->
    normalize -> extract -> first-match fold) and collapses its
    conversation-level output to a constant-size report inside
    ``map_batches`` partials — the report never materializes the fold
    output on the driver. The oracle wraps the flagship's own oracle SQL
    as a subquery, so the report is verified against the same
    ground-truth extraction."""
    fields = ["patient_name", "patient_birthdate", "invoice_number",
              "invoice_date", "order_number", "vendor_name", "gross_total"]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        row = {"n_convs": [len(df)],
               "n_turns": [int(df["n_turns"].astype("int64").sum())]}
        for f in fields:
            row[f"n_{f}"] = [int(df[f].notna().sum())]
        return pd.DataFrame(row)

    parts = (
        transcript_extract(sf_dir)
        .map_batches(partial, batch_format="pandas")
        .to_pandas()
    )
    return pd.DataFrame({c: [int(parts[c].sum())] for c in parts.columns}
                        ).astype("int64")


def embedding_centroids_per_label(sf_dir: str):
    """Per-label embedding centroids with a FULL SQL oracle — the
    class-prototype table behind nearest-centroid classification and
    SemDeDup-style cluster seeding. Components are micro-unit integers:
    sum_e6 = sum(round(e*1e6)) per (label, dim), centroid_e6 =
    floor(sum_e6 / n) computed as (sum_e6 + 10^7*n) // n - 10^7 — the
    offset keeps the numerator non-negative so Python floor division and
    DuckDB's truncating ``//`` agree on negative centroids. The oracle
    unnests the list column and replays the identical arithmetic.

    Scale shape: zero-copy flat-buffer reshape per batch
    (similarity._arrow_raw_matrix), per-batch (label, dim) partial sums —
    64*labels rows per batch regardless of batch size — ONE narrow
    bucketed exchange on label. Nothing corpus-sized anywhere."""
    from .bucketed import bucketed_group_reduce
    from .similarity import _arrow_raw_matrix

    DIM_OFF = 10_000_000

    def partial(t) -> pd.DataFrame:
        import pyarrow as pa

        labels = t["label"].to_numpy(zero_copy_only=False).astype("int64")
        _, mat = _arrow_raw_matrix(t)
        q = _round_half_away(mat.astype("float64") * 1e6)  # (n, 64)
        out = []
        for lab in np.unique(labels):
            m = labels == lab
            out.append(pd.DataFrame(
                {"label": np.int64(lab),
                 "dim": np.arange(q.shape[1], dtype="int64"),
                 "sum_e6": q[m].sum(axis=0).astype("int64"),
                 "n": np.int64(int(m.sum()))}
            ))
        return pd.concat(out, ignore_index=True)

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["label", "dim"], sort=False, as_index=False)[
            ["sum_e6", "n"]
        ].sum()
        s = out["sum_e6"].to_numpy(dtype="int64")
        n = out["n"].to_numpy(dtype="int64")
        out["centroid_e6"] = (s + DIM_OFF * n) // n - DIM_OFF
        for c in ("sum_e6", "n", "centroid_e6"):
            out[c] = out[c].astype("int64")
        return out

    return bucketed_group_reduce(
        _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"]),
        ["label"], partial, reduce, n_buckets=8, stage1_format="pyarrow",
    )


def nearest_centroid_assign(sf_dir: str):
    """Nearest-centroid (Rocchio) classification of every embedding against
    the per-label centroids — the cheap prototype classifier used for
    label-noise auditing and cluster-seeded dedup. Everything is exact
    integer: vectors and centroids in micro-units, distance = sum of
    squared int64 diffs (max 64*(2e6)^2 ~ 2.6e14, no overflow), ties ->
    lowest label, so the SQL oracle replays the argmin bit for bit.

    Scale shape: the centroid table (labels x dims ints) comes from the
    distributed aggregate (embedding_centroids_per_label) and broadcasts
    once via ray.put; assignment is a zero-copy batched matmul-free
    ||x||^2 - 2xC + ||c||^2 expansion per batch, no shuffle."""
    import ray as _ray

    from .similarity import _arrow_raw_matrix

    cent = embedding_centroids_per_label(sf_dir).to_pandas()
    cent = cent.sort_values(["label", "dim"], kind="stable")
    labels = np.sort(cent["label"].unique())
    C = (
        cent.pivot(index="label", columns="dim", values="centroid_e6")
        .loc[labels]
        .to_numpy()
        .astype("int64")
    )
    ref = _ray.put((labels.astype("int64"), C))

    def assign(t) -> pd.DataFrame:
        labs, cmat = _ray.get(ref)
        vids, mat = _arrow_raw_matrix(t)
        true_lab = t["label"].to_numpy(zero_copy_only=False).astype("int64")
        q = _round_half_away(mat.astype("float64") * 1e6)  # (n, d) int64
        # exact int distances: ||x-c||^2 expanded with int64 matmul terms
        # (object dtype would be needed past 2^63; bounds checked above)
        x2 = (q * q).sum(axis=1)  # (n,)
        c2 = (cmat * cmat).sum(axis=1)  # (L,)
        cross = q @ cmat.T  # (n, L) int64 exact
        d = x2[:, None] - 2 * cross + c2[None, :]
        pred = labs[np.argmin(d, axis=1)]  # first (lowest label) on ties
        return pd.DataFrame(
            {"vec_id": vids.astype("int64"), "label": true_lab,
             "pred": pred.astype("int64"), "correct": pred == true_lab}
        )

    return _read(sf_dir, "embeddings",
                 ["vec_id", "embedding", "label"]).map_batches(
        assign, batch_format="pyarrow"
    )


def pareto_frontier_per_brand(sf_dir: str):
    """Group-wise skyline: the (price DOWN, size UP) Pareto frontier within
    every brand — the per-vendor shortlist variant of
    ``pareto_frontier_parts``. Same superset-stable local-frontier trick,
    applied per group: each batch emits its per-brand local frontiers,
    ONE bucketed exchange on brand co-locates them, and the in-bucket
    reduce runs the identical frontier per brand — candidate volume
    entering the exchange is frontiers, not rows."""
    from .bucketed import bucketed_group_reduce

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = pd.DataFrame(
            {"p_brand": df["p_brand"],
             "p_partkey": df["p_partkey"].to_numpy(dtype="int64"),
             "price_cents": _cents(df["p_retailprice"]),
             "p_size": df["p_size"].to_numpy(dtype="int64")}
        )
        outs = [
            _pareto_frontier(g, "price_cents", "p_size")
            for _, g in t.groupby("p_brand", sort=False)
        ]
        return pd.concat(outs, ignore_index=True) if outs else t

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        outs = [
            _pareto_frontier(grp, "price_cents", "p_size")
            for _, grp in g.groupby("p_brand", sort=False)
        ]
        return (pd.concat(outs, ignore_index=True) if outs
                else g)[["p_brand", "p_partkey", "price_cents", "p_size"]]

    return bucketed_group_reduce(
        _read(sf_dir, "part",
              ["p_partkey", "p_brand", "p_retailprice", "p_size"]),
        ["p_brand"], partial, reduce, n_buckets=8,
    )


def diverse_topk_docs(sf_dir: str):
    """Quota-constrained (diversified) top-k: the 10 longest documents with
    AT MOST 2 per source — the result-diversification rule every retrieval
    and sampling pipeline applies so one feed cannot monopolize a
    shortlist. Deterministic order (n_chars DESC, doc_id ASC) end to end.

    Scale shape: the per-source quota makes per-batch partials safe — a
    batch only ever needs its own top-2-per-source (superset of the
    global answer's per-source members); ONE bucketed exchange on source
    collapses those to the true per-source top-2, and the global k=10
    cut runs on the driver over <= 2*sources rows."""
    from .bucketed import bucketed_group_reduce

    def top2(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values(["n_chars", "doc_id"], ascending=[False, True],
                           kind="stable")
            .groupby("source", sort=False)
            .head(2)[["source", "doc_id", "n_chars"]]
        )

    per_src = bucketed_group_reduce(
        _read(sf_dir, "documents", ["doc_id", "source", "n_chars"]),
        ["source"], top2, top2, n_buckets=8,
    ).to_pandas()
    out = per_src.sort_values(["n_chars", "doc_id"],
                              ascending=[False, True], kind="stable").head(10)
    out = out.reset_index(drop=True)
    return pd.DataFrame(
        {"rank": np.arange(1, len(out) + 1, dtype="int64"),
         "doc_id": out["doc_id"].astype("int64"),
         "source": out["source"],
         "n_chars": out["n_chars"].astype("int64")}
    )


def ohlc_value_per_type_hour(sf_dir: str):
    """Open/high/low/close (+count) of event value per (type, hour) — the
    ordered-aggregate shape (first/last BY time) Ray Data has no native
    aggregate for, done as a MERGEABLE partial: each batch emits one row per
    (type, hour) carrying (open, open_key, close, close_key, high, low, n),
    and the bucketed reduce merges partials by comparing the (ts, event_id)
    keys — order never requires a sort of the raw rows. Ties on ts break by
    event_id, matching the SQL row_number order exactly."""
    from .bucketed import bucketed_group_reduce

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = pd.DataFrame(
            {"event_type": df["event_type"],
             "h": df["ts"].dt.floor("h"),
             "ts": df["ts"],
             "eid": df["event_id"].to_numpy(dtype="int64"),
             "cents": _cents(df["value"])}
        )
        t = t.sort_values(["ts", "eid"], kind="stable")
        g = t.groupby(["event_type", "h"], sort=False)
        out = g.agg(
            open_cents=("cents", "first"), close_cents=("cents", "last"),
            o_ts=("ts", "first"), o_eid=("eid", "first"),
            c_ts=("ts", "last"), c_eid=("eid", "last"),
            high_cents=("cents", "max"), low_cents=("cents", "min"),
            n=("cents", "size"),
        ).reset_index()
        return out

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        opens = g.sort_values(["o_ts", "o_eid"], kind="stable").groupby(
            ["event_type", "h"], sort=False
        ).agg(open_cents=("open_cents", "first")).reset_index()
        closes = g.sort_values(["c_ts", "c_eid"], kind="stable").groupby(
            ["event_type", "h"], sort=False
        ).agg(close_cents=("close_cents", "last")).reset_index()
        rest = g.groupby(["event_type", "h"], sort=False, as_index=False).agg(
            high_cents=("high_cents", "max"), low_cents=("low_cents", "min"),
            n=("n", "sum"),
        )
        out = rest.merge(opens, on=["event_type", "h"]).merge(
            closes, on=["event_type", "h"]
        )
        out["hour"] = out["h"].dt.strftime("%Y-%m-%d %H:00:00")
        for c in ("open_cents", "close_cents", "high_cents", "low_cents", "n"):
            out[c] = out[c].astype("int64")
        return out[["event_type", "hour", "open_cents", "high_cents",
                    "low_cents", "close_cents", "n"]]

    return bucketed_group_reduce(
        _read(sf_dir, "events", ["event_id", "ts", "event_type", "value"]),
        ["event_type", "h"], partial, reduce, n_buckets=64,
    )


def event_path_trigrams(sf_dir: str):
    """Top-20 per-user event-type trigram paths (view>click>purchase …) —
    sequence mining over ordered user journeys, the path-analysis op behind
    funnel discovery.

    Scale shape: ONE user-keyed exchange of narrow (user, ts, eid, type)
    rows — adjacency needs a user's full ordered history co-located; each
    bucket sorts once and builds trigrams with two vectorized shifts (user
    boundaries masked), emitting partial counts bounded by the type-domain
    cubed. The driver merge handles |types|^3 = 125 rows."""
    from .bucketed import bucketed_group_reduce

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        e1 = g["event_type"].to_numpy()
        same2 = g["user_id"].to_numpy()[:-2] == g["user_id"].to_numpy()[2:]
        if len(g) < 3:
            return pd.DataFrame({"path": pd.Series([], dtype="object"),
                                 "n": np.array([], dtype="int64")})
        path = pd.Series(
            np.char.add(np.char.add(
                np.char.add(e1[:-2].astype(str), ">"),
                np.char.add(e1[1:-1].astype(str), ">")),
                e1[2:].astype(str))[same2]
        )
        c = path.value_counts()
        return pd.DataFrame({"path": c.index, "n": c.to_numpy(dtype="int64")})

    parts = bucketed_group_reduce(
        _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"]),
        ["user_id"], lambda df: df, per_bucket, n_buckets=64,
    ).to_pandas()
    out = parts.groupby("path", sort=False, as_index=False)["n"].sum()
    out = out.sort_values(["n", "path"], ascending=[False, True],
                          kind="stable").head(20).reset_index(drop=True)
    out["n"] = out["n"].astype("int64")
    return out


_CHK_MOD = (1 << 61) - 1  # Mersenne modulus: order-invariant sum stays in int64


def table_checksum_documents(sf_dir: str):
    """Order-invariant content checksum of the documents table — the
    cross-cluster verification artifact a 100 TB migration/resume needs
    (compare two runs' outputs without ordering or co-locating them).
    checksum = sum over rows of md5_64(doc_id || '|' || text) mod 2^61-1:
    commutative, so per-batch partials (ONE int64 row each) merge on the
    driver with no shuffle at all."""
    import hashlib

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        acc = 0
        for doc_id, text in zip(df["doc_id"], df["text"]):
            s = f"{int(doc_id)}|{text if isinstance(text, str) else ''}"
            h = int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")
            acc = (acc + h % _CHK_MOD) % _CHK_MOD
        return pd.DataFrame({"n": [len(df)], "c": [acc]})

    parts = (
        _read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(partial, batch_format="pandas").to_pandas()
    )
    # Python-int accumulation: a handful of partials each < 2^61 would
    # silently wrap pandas' int64 sum
    chk = sum(int(x) for x in parts["c"]) % _CHK_MOD
    return pd.DataFrame({"n_rows": [int(parts["n"].sum())], "checksum": [chk]})


def weighted_sample_docs(sf_dir: str, k: int = 64):
    """Deterministic weighted sampling: the 64 documents with the smallest
    priority = md5_64(doc_id) mod 2^62 // (n_chars + 1) — longer docs get
    proportionally smaller priorities, i.e. weight-proportional inclusion,
    with a content-independent reproducible key (the A-Res idea with an
    integer hash in place of the random draw).

    Scale shape: per-batch partial top-k (k rows per batch leave each
    task), driver merges the k x batches candidate set — no shuffle."""
    import hashlib

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        w = df["n_chars"].to_numpy(dtype="int64") + 1
        h = np.array(
            [int.from_bytes(
                hashlib.md5(str(int(d)).encode()).digest()[:8], "little"
             ) % (1 << 62)
             for d in df["doc_id"]],
            dtype="int64",
        )
        t = pd.DataFrame(
            {"doc_id": df["doc_id"].to_numpy(dtype="int64"),
             "priority": h // w,
             "n_chars": df["n_chars"].to_numpy(dtype="int64")}
        )
        return t.sort_values(["priority", "doc_id"], kind="stable").head(k)

    parts = (
        _read(sf_dir, "documents", ["doc_id", "n_chars"])
        .map_batches(partial, batch_format="pandas").to_pandas()
    )
    return (
        parts.sort_values(["priority", "doc_id"], kind="stable")
        .head(k).reset_index(drop=True)
    )


def funnel_view_click_purchase(sf_dir: str):
    """Session funnel conversion: share of 30-min-gap sessions containing a
    view, then a click strictly after it, then a purchase strictly after
    that (subsequence match; greedy-earliest == the vectorized state
    machine). Output: one row (n_sessions, n_converted, conv_bp).

    Scale shape: the sessionize exchange (narrow rows, user-bucketed); each
    bucket runs sort + per-session cummax/shift chains — O(n) vectorized,
    no per-session Python — and emits TWO counters; the driver sums."""
    from .bucketed import bucketed_group_reduce

    gap_sec = 1800

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({"tot": [0], "conv": [0]})
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        gaps = g.groupby("user_id", sort=False)["ts"].diff().dt.total_seconds()
        sid = np.cumsum((gaps.isna() | (gaps > gap_sec)).to_numpy())
        t = pd.DataFrame(
            {"sid": sid,
             "is_v": (g["event_type"] == "view").to_numpy(),
             "is_c": (g["event_type"] == "click").to_numpy(),
             "is_p": (g["event_type"] == "purchase").to_numpy()}
        )
        by = t.groupby("sid", sort=False)
        seen_v_prev = by["is_v"].cummax().groupby(t["sid"], sort=False).shift(
            1, fill_value=False
        )
        t["vc"] = t["is_c"] & seen_v_prev
        seen_vc_prev = t.groupby("sid", sort=False)["vc"].cummax().groupby(
            t["sid"], sort=False
        ).shift(1, fill_value=False)
        vcp = t["is_p"] & seen_vc_prev
        conv = int(vcp.groupby(t["sid"], sort=False).any().sum())
        return pd.DataFrame({"tot": [int(t["sid"].nunique())], "conv": [conv]})

    parts = bucketed_group_reduce(
        _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"]),
        ["user_id"],
        lambda df: df[["user_id", "ts", "event_id", "event_type"]],
        reduce, n_buckets=64,
    ).to_pandas()
    tot, conv = int(parts["tot"].sum()), int(parts["conv"].sum())
    return pd.DataFrame(
        {"n_sessions": [tot], "n_converted": [conv],
         "conv_bp": [(10000 * conv + tot // 2) // tot if tot else 0]}
    )


LSH_PLANES = 16
EMB_DIM = 64


def _hyperplane_signs(n_planes: int, dim: int) -> np.ndarray:
    """Deterministic ±1 hyperplane matrix from the md5 contract (bit 0 of
    md5_64('j:i')) — recomputable row-for-row in DuckDB."""
    import hashlib

    s = np.empty((n_planes, dim), dtype=np.int64)
    for j in range(n_planes):
        for i in range(dim):
            h = int.from_bytes(
                hashlib.md5(f"{j}:{i}".encode()).digest()[:8], "little"
            )
            s[j, i] = 1 if h % 2 == 1 else -1
    return s


def embedding_lsh_buckets(sf_dir: str):
    """Random-hyperplane (SimHash-for-vectors) LSH bucketing of the
    embedding table: 16 deterministic ±1 hyperplanes, bucket = the 16-bit
    sign pattern — the bucketing stage an ANN index uses to co-partition
    candidate vectors. Embeddings are quantized to integer micro-units
    BEFORE the dot products, so the signs (and the SQL oracle) are exact,
    never at the mercy of float summation order.

    Scale shape: signs broadcast once (16x64 ints); one int-matmul per
    batch; per-batch bucket counts pre-aggregate, so the single exchange
    carries <= 2^16 narrow rows per batch."""
    import ray as _ray

    from .bucketed import bucketed_group_reduce

    signs_ref = _ray.put(_hyperplane_signs(LSH_PLANES, EMB_DIM))
    weights = (np.int64(1) << np.arange(LSH_PLANES, dtype=np.int64))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        m = np.vstack([np.asarray(v, dtype=np.float64) for v in df["embedding"]])
        x = _round_half_away(m * 1_000_000.0)
        dots = x @ _ray.get(signs_ref).T
        bucket = ((dots >= 0).astype(np.int64) * weights[None, :]).sum(axis=1)
        c = pd.Series(bucket).value_counts()
        return pd.DataFrame(
            {"bucket_id": c.index.to_numpy(dtype="int64"),
             "n_vectors": c.to_numpy(dtype="int64")}
        )

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("bucket_id", sort=False, as_index=False)["n_vectors"].sum()
        out["n_vectors"] = out["n_vectors"].astype("int64")
        return out

    return bucketed_group_reduce(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"]),
        ["bucket_id"], partial, reduce, n_buckets=16,
    )


def orders_enriched(sf_dir: str):
    """Row-PRODUCING big-big join (not an aggregate): every order with its
    customer's name and segment attached — the grace-hash-join shape: both
    sides project narrow at the scan, tagged union, ONE co-partition
    exchange on custkey, vectorized merge per bucket. Output is row-sized
    and streams; nothing is broadcast (customer plays the big-dimension
    role here on purpose — the broadcast variant is e7/q14)."""
    from .bucketed import bucketed_group_reduce

    def o_proj(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"ck": df["o_custkey"].to_numpy(dtype="int64"),
             "o_orderkey": df["o_orderkey"].to_numpy(dtype="int64"),
             "total_cents": _cents(df["o_totalprice"]),
             "c_name": "", "c_mktsegment": "", "side": np.int8(0)}
        )

    def c_proj(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"ck": df["c_custkey"].to_numpy(dtype="int64"),
             "o_orderkey": np.int64(0), "total_cents": np.int64(0),
             "c_name": df["c_name"], "c_mktsegment": df["c_mktsegment"],
             "side": np.int8(1)}
        )

    both = (
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
        .map_batches(o_proj, batch_format="pandas")
        .union(
            _read(sf_dir, "customer",
                  ["c_custkey", "c_name", "c_mktsegment"]).map_batches(
                c_proj, batch_format="pandas"
            )
        )
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        o = g.loc[g["side"] == 0, ["ck", "o_orderkey", "total_cents"]]
        c = g.loc[g["side"] == 1, ["ck", "c_name", "c_mktsegment"]].drop_duplicates("ck")
        m = o.merge(c, on="ck")
        return m[["o_orderkey", "total_cents", "c_name", "c_mktsegment"]]

    return bucketed_group_reduce(both, ["ck"], lambda df: df, merge,
                                 n_buckets=64)


def fk_integrity_audit(sf_dir: str):
    """Referential-integrity audit: orphan-row counts for every FK edge in
    the star schema — the data-quality gate a pipeline runs before joining
    100 TB of facts. Small parents (nation/customer/supplier/part) check by
    broadcast key set; the big-big edge (lineitem -> orders) co-partitions
    pre-aggregated (key, n) child partials with parent keys in one
    exchange. Output: (relationship, n_orphans)."""
    import ray as _ray

    from .bucketed import bucketed_group_reduce

    out_rows = []

    # broadcast-parent edges: child counted per batch against a key set
    def count_orphans(child_tbl, child_col, parent_keys_ref, label):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            n = int((~df[child_col].isin(_ray.get(parent_keys_ref))).sum())
            return pd.DataFrame({"n": [n]})

        parts = child_tbl.map_batches(fn, batch_format="pandas").to_pandas()
        out_rows.append((label, int(parts["n"].sum())))

    nat = set(_read_small(sf_dir, "nation", ["n_nationkey"])["n_nationkey"])
    nref = _ray.put(nat)
    count_orphans(_read(sf_dir, "customer", ["c_nationkey"]), "c_nationkey",
                  nref, "customer.nationkey->nation")
    count_orphans(_read(sf_dir, "supplier", ["s_nationkey"]), "s_nationkey",
                  nref, "supplier.nationkey->nation")
    # one lineitem scan serves both dimension checks (it's the biggest
    # table — don't pay its I/O twice for two broadcast key sets)
    pref = _ray.put(set(_read_small(sf_dir, "part", ["p_partkey"])["p_partkey"]))
    sref = _ray.put(
        set(_read_small(sf_dir, "supplier", ["s_suppkey"])["s_suppkey"])
    )

    def li_orphans(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"n_part": [int((~df["l_partkey"].isin(_ray.get(pref))).sum())],
             "n_supp": [int((~df["l_suppkey"].isin(_ray.get(sref))).sum())]}
        )

    li = (
        _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
        .map_batches(li_orphans, batch_format="pandas").to_pandas()
    )
    out_rows.append(("lineitem.partkey->part", int(li["n_part"].sum())))
    out_rows.append(("lineitem.suppkey->supplier", int(li["n_supp"].sum())))
    cref = _ray.put(
        set(_read_small(sf_dir, "customer", ["c_custkey"])["c_custkey"])
    )
    count_orphans(_read(sf_dir, "orders", ["o_custkey"]), "o_custkey",
                  cref, "orders.custkey->customer")

    # big-big edge: lineitem.orderkey -> orders, co-partitioned
    def l_proj(df: pd.DataFrame) -> pd.DataFrame:
        t = pd.DataFrame({"k": df["l_orderkey"].to_numpy(dtype="int64")})
        g = t.groupby("k", sort=False, as_index=False).size()
        g["side"] = np.int8(0)
        return g.rename(columns={"size": "n"})

    def o_proj(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"k": df["o_orderkey"].to_numpy(dtype="int64"),
             "n": np.int64(0), "side": np.int8(1)}
        )

    both = (
        _read(sf_dir, "lineitem", ["l_orderkey"])
        .map_batches(l_proj, batch_format="pandas")
        .union(_read(sf_dir, "orders", ["o_orderkey"]).map_batches(
            o_proj, batch_format="pandas"))
    )

    def orphan_sum(g: pd.DataFrame) -> pd.DataFrame:
        li = g[g["side"] == 0]
        n = int(li.loc[~li["k"].isin(g.loc[g["side"] == 1, "k"]), "n"].sum())
        return pd.DataFrame({"n": [n]})

    parts = bucketed_group_reduce(
        both, ["k"], lambda df: df, orphan_sum, n_buckets=64
    ).to_pandas()
    out_rows.append(("lineitem.orderkey->orders", int(parts["n"].sum())))

    out = pd.DataFrame(out_rows, columns=["relationship", "n_orphans"])
    out["n_orphans"] = out["n_orphans"].astype("int64")
    return out.sort_values("relationship").reset_index(drop=True)


def quantize_embeddings_int8(sf_dir: str):
    """Scalar int8 quantization of the embedding table — the compression
    pass a 100 TB vector store runs before indexing (4x smaller, dot
    products in int). Two passes: (1) per-dimension min/max micro-unit
    partials reduce to a 64-row stats table broadcast once; (2) each batch
    encodes code_i = (x_i - min_i) * 254 // range_i - 127 and emits
    per-vector verification aggregates (code sum + min/max) rather than the
    opaque code blob, so the driver compare stays value-hashed.

    Everything is integer micro-units end to end — the SQL oracle
    reproduces codes bit-exactly with the same floor divisions."""
    import ray as _ray

    docs = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def stat_partial(df: pd.DataFrame) -> pd.DataFrame:
        m = np.vstack([np.asarray(v, dtype=np.float64) for v in df["embedding"]])
        x = _round_half_away(m * 1_000_000.0)
        return pd.DataFrame(
            {"i": np.arange(x.shape[1], dtype="int64"),
             "lo": x.min(axis=0), "hi": x.max(axis=0)}
        )

    parts = docs.map_batches(stat_partial, batch_format="pandas").to_pandas()
    stats = parts.groupby("i", as_index=False).agg(
        lo=("lo", "min"), hi=("hi", "max")
    ).sort_values("i")
    lo = stats["lo"].to_numpy(dtype="int64")
    rng = np.maximum(stats["hi"].to_numpy(dtype="int64") - lo, 1)
    lo_ref, rng_ref = _ray.put(lo), _ray.put(rng)

    def encode(df: pd.DataFrame) -> pd.DataFrame:
        m = np.vstack([np.asarray(v, dtype=np.float64) for v in df["embedding"]])
        x = _round_half_away(m * 1_000_000.0)
        code = (x - _ray.get(lo_ref)[None, :]) * 254 // _ray.get(rng_ref)[None, :] - 127
        return pd.DataFrame(
            {"vec_id": df["vec_id"].to_numpy(dtype="int64"),
             "code_sum": code.sum(axis=1).astype("int64"),
             "code_min": code.min(axis=1).astype("int64"),
             "code_max": code.max(axis=1).astype("int64")}
        )

    return docs.map_batches(encode, batch_format="pandas")


def dedup_incremental(sf_dir: str):
    """Incremental (cross-run) exact dedup: the daily-crawl shape — a new
    shard (docs with doc_id % 4 == 3) is deduplicated against the PRIOR
    corpus (everything else) by content hash, emitting only genuinely new
    content. Neither side materializes: prior hashes and new-doc hashes
    co-partition by hash in ONE tagged-union exchange (16 bytes/row), and
    the anti filter runs vectorized per bucket. Ties inside the new shard
    (same text twice) keep the smallest doc_id."""
    import hashlib

    from .bucketed import bucketed_group_reduce

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    # the new/prior masks partition the same rows, so ONE scan tags both
    # sides (side 0 = new shard, side 1 = prior corpus)
    def hash_rows(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(dtype="int64")
        hs = [
            hashlib.md5((t if isinstance(t, str) else "").encode()).hexdigest()
            for t in df["text"]
        ]
        return pd.DataFrame(
            {"h": hs, "doc_id": ids,
             "side": np.where(ids % 4 == 3, 0, 1).astype("int8")}
        )

    both = docs.map_batches(hash_rows, batch_format="pandas")

    def anti(g: pd.DataFrame) -> pd.DataFrame:
        new = g[g["side"] == 0]
        new = new[~new["h"].isin(g.loc[g["side"] == 1, "h"])]
        first = new.sort_values("doc_id", kind="stable").drop_duplicates("h")
        return pd.DataFrame(
            {"doc_id": first["doc_id"].astype("int64"),
             "text_hash": first["h"]}
        )

    return bucketed_group_reduce(both, ["h"], lambda df: df, anti,
                                 n_buckets=64)


def merge_upsert_documents(sf_dir: str):
    """MERGE INTO-style upsert: apply a change-set (updates, inserts,
    deletes) to the documents snapshot and emit the next snapshot with
    per-row provenance — the table-maintenance op an incremental-ingest
    corpus runs every cycle (completes the diff / checksum / merge trio).
    The change-set is derived deterministically from the base so the oracle
    can reproduce it: doc_id % 7 == 0 -> DELETE (tombstone), % 5 == 0 ->
    UPDATE (text + ' U2'), % 11 == 0 -> INSERT at doc_id + 10000000.

    Scale shape: base and delta are tagged row streams into ONE
    co-partition exchange on doc_id; each bucket resolves precedence
    (tombstone > update > base) vectorized. Output
    (doc_id, text, op in {kept, updated, inserted})."""
    from .bucketed import bucketed_group_reduce

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def tagged(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(dtype="int64")
        texts = [t if isinstance(t, str) else "" for t in df["text"]]
        out_id, out_t, out_side = list(ids), list(texts), [0] * len(ids)
        for i, t in zip(ids, texts):
            if i % 7 == 0:
                out_id.append(int(i)); out_t.append(""); out_side.append(3)
            elif i % 5 == 0:
                out_id.append(int(i)); out_t.append(t + " U2"); out_side.append(2)
            if i % 11 == 0:
                out_id.append(int(i) + 10_000_000)
                out_t.append(t + " NEW"); out_side.append(1)
        return pd.DataFrame(
            {"doc_id": np.asarray(out_id, dtype="int64"),
             "text": pd.Series(out_t, dtype=object),
             "side": np.asarray(out_side, dtype="int64")}
        )

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        # highest side wins per key: 3 tombstone, 2 update, 1 insert, 0 base
        top = (g.sort_values(["doc_id", "side"], kind="stable")
                .groupby("doc_id", sort=False).tail(1))
        top = top[top["side"] != 3]
        op = top["side"].map({0: "kept", 1: "inserted", 2: "updated"})
        return pd.DataFrame(
            {"doc_id": top["doc_id"].to_numpy(dtype="int64"),
             "text": top["text"].to_numpy(),
             "op": op.to_numpy()}
        )

    return bucketed_group_reduce(docs, ["doc_id"], tagged, resolve, 16)


def table_diff_documents(sf_dir: str):
    """Snapshot diff (added / removed / changed by key) between corpus v1
    (the documents table) and a derived v2 (docs % 7 == 0 removed,
    remaining docs % 5 == 0 upper-cased, one added row per doc % 11 == 0
    at key doc_id + 10000000) — the migration-validation op run before
    promoting a re-processed 100 TB corpus.

    Scale shape: both versions project to (doc_id, content-hash) at the
    scan; ONE co-partition exchange on doc_id; each bucket classifies with
    two vectorized merges. Text never shuffles — only 16-byte hash rows."""
    import hashlib

    from .bucketed import bucketed_group_reduce

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def h64(texts) -> list:
        return [
            hashlib.md5((t if isinstance(t, str) else "").encode()).hexdigest()
            for t in texts
        ]

    def v1_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": df["doc_id"].to_numpy(dtype="int64"),
             "h": h64(df["text"]), "side": np.int8(0)}
        )

    def v2_rows(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(dtype="int64")
        texts = [t if isinstance(t, str) else "" for t in df["text"]]
        out_id, out_t = [], []
        for i, t in zip(ids, texts):
            if i % 7 == 0:
                pass  # removed in v2
            elif i % 5 == 0:
                out_id.append(int(i)); out_t.append(t.upper())
            else:
                out_id.append(int(i)); out_t.append(t)
            if i % 11 == 0:
                out_id.append(int(i) + 10_000_000); out_t.append(t + " v2")
        return pd.DataFrame(
            {"doc_id": np.array(out_id, dtype="int64"),
             "h": h64(out_t), "side": np.int8(1)}
        )

    both = docs.map_batches(v1_rows, batch_format="pandas").union(
        docs.map_batches(v2_rows, batch_format="pandas")
    )

    def classify(g: pd.DataFrame) -> pd.DataFrame:
        a = g.loc[g["side"] == 0, ["doc_id", "h"]]
        b = g.loc[g["side"] == 1, ["doc_id", "h"]]
        m = a.merge(b, on="doc_id", how="outer", suffixes=("_1", "_2"),
                    indicator=True)
        status = np.where(
            m["_merge"] == "left_only", "removed",
            np.where(m["_merge"] == "right_only", "added",
                     np.where(m["h_1"] != m["h_2"], "changed", "same")),
        )
        out = pd.DataFrame(
            {"doc_id": m["doc_id"].astype("int64"), "status": status}
        )
        return out[out["status"] != "same"]

    return bucketed_group_reduce(both, ["doc_id"], lambda df: df, classify,
                                 n_buckets=64)


def sliding_distinct_users(sf_dir: str):
    """Exact DISTINCT users per 1-hour window sliding by 30 min — the
    non-mergeable window aggregate (distinct cannot combine from counts):
    batches pre-dedup (window, user) pairs, ONE window-keyed exchange of
    the deduped pairs, per-bucket nunique. Cost is inherently one row per
    (window, user) — the same order any exact windowed-distinct pays."""
    from .bucketed import bucketed_group_reduce

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        t30 = df["ts"].dt.floor("30min")
        u = df["user_id"].to_numpy(dtype="int64")
        out = pd.concat(
            [pd.DataFrame({"w": t30, "user_id": u}),
             pd.DataFrame({"w": t30 - pd.Timedelta(minutes=30), "user_id": u})],
            ignore_index=True,
        ).drop_duplicates()
        out["window_start"] = out["w"].dt.strftime("%Y-%m-%d %H:%M:00")
        return out[["window_start", "user_id"]]

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("window_start", sort=False)["user_id"].nunique()
        return out.rename("n_users").reset_index().astype({"n_users": "int64"})

    return bucketed_group_reduce(
        _read(sf_dir, "events", ["ts", "user_id"]).map_batches(
            explode, batch_format="pandas"
        ),
        ["window_start"], lambda df: df, per_bucket, n_buckets=64,
    )


def bpe_top_merges(sf_dir: str):
    """The first BPE-training iteration: the 20 most frequent adjacent
    character pairs inside corpus tokens (count = total occurrences,
    lexicographic tiebreak) — what a tokenizer trainer computes before its
    first merge. Counter partials per batch (pair domain is bounded by
    charset²), bucketed merge, tiny top-k on the driver."""
    from collections import Counter

    from .bucketed import bucketed_group_reduce
    from .textstats import _tokens

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c: Counter = Counter()
        for text in df["text"]:
            for tok in _tokens(text) if isinstance(text, str) else []:
                for i in range(len(tok) - 1):
                    c[tok[i : i + 2]] += 1
        return pd.DataFrame(
            {"pair": list(c.keys()),
             "n": np.fromiter(c.values(), dtype="int64", count=len(c))}
        )

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("pair", sort=False, as_index=False)["n"].sum()

    parts = bucketed_group_reduce(
        _read(sf_dir, "documents", ["text"]), ["pair"], partial, reduce,
        n_buckets=16,
    ).to_pandas()
    out = parts.sort_values(["n", "pair"], ascending=[False, True],
                            kind="stable").head(20).reset_index(drop=True)
    out["n"] = out["n"].astype("int64")
    return out


def bpe_merges_iter3(sf_dir: str):
    """Three BPE-training iterations (VERDICT r2 missing #4 closes the
    bpe_top_merges first-iteration-only gap): per iteration, count adjacent
    symbol pairs over corpus tokens, pick the most frequent (count desc,
    then (left, right) lexicographic), merge it everywhere, repeat. Merge
    application is the left-to-right ``replace`` scan on a space-separated
    symbol string — identical semantics in Python str.replace and DuckDB
    replace() so the oracle reproduces every iteration bit-for-bit (differs
    from canonical BPE only inside odd self-pair runs like 'aaa', where the
    boundary space is consumed; deterministic on both engines).

    Scale shape: ONE corpus pass builds the weighted vocab (tok, freq) —
    a bounded aggregate, orders of magnitude smaller than the corpus — and
    each iteration is a map + bucketed reduce over the VOCAB with the
    merges-so-far (a few strings) shipped in the closure; the driver holds
    only the per-iteration pair-count aggregate (charset²-bounded)."""
    from .bucketed import bucketed_group_reduce
    from .textstats import _tokens

    def vocab_partial(df: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        c: Counter = Counter()
        for text in df["text"]:
            for tok in _tokens(text) if isinstance(text, str) else []:
                c[tok] += 1
        return pd.DataFrame(
            {"tok": list(c.keys()),
             "freq": np.fromiter(c.values(), dtype="int64", count=len(c))}
        )

    def vocab_reduce(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("tok", sort=False, as_index=False)["freq"].sum()

    vocab = bucketed_group_reduce(
        _read(sf_dir, "documents", ["text"]), ["tok"],
        vocab_partial, vocab_reduce, n_buckets=16,
    ).materialize()

    merges: list[tuple[str, str]] = []
    rows = []
    for it in range(1, 4):
        applied = list(merges)  # shipped in the closure (a few strings)

        def pair_partial(df: pd.DataFrame, _m=applied) -> pd.DataFrame:
            from collections import Counter

            c: Counter = Counter()
            for tok, freq in zip(df["tok"], df["freq"]):
                s = " " + " ".join(tok) + " "
                for l, r in _m:
                    s = s.replace(f" {l} {r} ", f" {l}{r} ")
                syms = s.split()
                for a, b in zip(syms, syms[1:]):
                    c[(a, b)] += int(freq)
            if not c:
                return pd.DataFrame(
                    {"l": pd.Series(dtype=object), "r": pd.Series(dtype=object),
                     "n": pd.Series(dtype="int64")}
                )
            ks = list(c.keys())
            return pd.DataFrame(
                {"l": [k[0] for k in ks], "r": [k[1] for k in ks],
                 "n": np.fromiter(c.values(), dtype="int64", count=len(c))}
            )

        def pair_reduce(g: pd.DataFrame) -> pd.DataFrame:
            return g.groupby(["l", "r"], sort=False, as_index=False)["n"].sum()

        counts = bucketed_group_reduce(
            vocab, ["l", "r"], pair_partial, pair_reduce, n_buckets=16,
        ).to_pandas()
        top = counts.sort_values(
            ["n", "l", "r"], ascending=[False, True, True], kind="stable"
        ).iloc[0]
        merges.append((top["l"], top["r"]))
        rows.append((it, top["l"], top["r"], int(top["n"])))

    return pd.DataFrame(
        rows, columns=["iter", "left_sym", "right_sym", "n"]
    ).astype({"iter": "int64", "n": "int64"})


LATE_GRACE_SEC = 600
LATE_RANGE = 4096  # event_ids per scan range


def late_event_audit(sf_dir: str):
    """Watermark / late-data audit with streaming semantics replayed over
    the log: arrival order = event_id; the watermark at each arrival is
    max(event ts seen so far, exclusive) minus a 10-min grace, and an event
    is LATE if its ts is below that. Output: per event-time hour,
    (n_events, n_late) — the health report a streaming ingestion job emits.

    Scale shape: the distributed exclusive scan again, with MAX as the
    monoid instead of SUM (pack_sequences' shape generalizes): per-range
    ts maxima are the only driver state (one row per LATE_RANGE event_ids),
    prefix-maxed and broadcast; ONE range-keyed exchange computes the
    within-range running max vectorized. Counts then pre-aggregate per
    hour."""
    import ray as _ray

    from .bucketed import bucketed_group_reduce

    ev = _read(sf_dir, "events", ["event_id", "ts"])

    def rng_partial(df: pd.DataFrame) -> pd.DataFrame:
        t = pd.DataFrame(
            {"rg": df["event_id"].to_numpy(dtype="int64") // LATE_RANGE,
             "mx": df["ts"]}
        )
        return t.groupby("rg", sort=False, as_index=False)["mx"].max()

    def rng_reduce(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("rg", sort=False, as_index=False)["mx"].max()

    totals = bucketed_group_reduce(
        ev, ["rg"], rng_partial, rng_reduce, n_buckets=16
    ).to_pandas().sort_values("rg")
    # exclusive prefix max per range (NaT for the first range)
    prefix = totals["mx"].cummax().shift(1)
    offs = dict(zip(totals["rg"].tolist(), prefix.tolist()))
    offs_ref = _ray.put(offs)

    def audit(g: pd.DataFrame) -> pd.DataFrame:
        o = _ray.get(offs_ref)
        g = g.sort_values(["rg", "event_id"], kind="stable")
        run = g.groupby("rg", sort=False)["ts"].cummax().groupby(
            g["rg"], sort=False
        ).shift(1)
        base = g["rg"].map(o)
        wm = pd.concat([run, base], axis=1).max(axis=1)  # NaT-safe elementwise
        late = g["ts"] < (wm - pd.Timedelta(seconds=LATE_GRACE_SEC))
        t = pd.DataFrame(
            {"hour": g["ts"].dt.strftime("%Y-%m-%d %H:00:00"),
             "late": late.fillna(False).to_numpy(dtype="int64")}
        )
        out = t.groupby("hour", sort=False).agg(
            n_events=("late", "size"), n_late=("late", "sum")
        ).reset_index()
        return out.astype({"n_events": "int64", "n_late": "int64"})

    parts = bucketed_group_reduce(
        ev.map_batches(
            lambda df: pd.DataFrame(
                {"rg": df["event_id"].to_numpy(dtype="int64") // LATE_RANGE,
                 "event_id": df["event_id"].to_numpy(dtype="int64"),
                 "ts": df["ts"]}
            ),
            batch_format="pandas",
        ),
        ["rg"], lambda df: df, audit, n_buckets=64,
    ).to_pandas()
    out = parts.groupby("hour", sort=False, as_index=False)[
        ["n_events", "n_late"]
    ].sum()
    return out.astype({"n_events": "int64", "n_late": "int64"})


def doc_pii_flags(sf_dir: str):
    """PII risk profile per document: counts of email-, US-phone- and
    SSN-shaped substrings — the scrub-or-quarantine routing signal a
    training-data pipeline computes before release. Pure per-batch Arrow
    regex kernels (count_substring_regex on the zero-copy batch), no
    shuffle; patterns are RE2-compatible so the DuckDB oracle runs the
    identical regexes."""
    import pyarrow as pa
    import pyarrow.compute as pc

    pats = {
        "n_emails": r"[A-Za-z0-9._]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "n_phones": r"\d{3}-\d{3}-\d{4}",
        "n_ssn": r"\d{3}-\d{2}-\d{4}",
    }

    def fn(t: pa.Table) -> pa.Table:
        text = pc.coalesce(t["text"], pa.scalar("", pa.string()))
        cols = {"doc_id": t["doc_id"]}
        for name, pat in pats.items():
            cols[name] = pc.cast(
                pc.count_substring_regex(text, pat), pa.int64()
            )
        return pa.table(cols)

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# Registry + oracle SQL
# ---------------------------------------------------------------------------

def q10_returned_items(sf_dir: str):
    """TPC-H Q10 shape: revenue lost to returned items per customer, one
    quarter. Scale shape: lineitem keeps only R-flag rows (predicate cuts
    ~2/3 at the scan), orders keeps only the quarter window; the single
    big-big exchange is a tagged-union co-partition on orderkey (same shape
    as q7/q18 — orders is a fact table, never broadcast); the per-customer
    aggregate is customer-bounded and the name/nation dims attach by
    broadcast-size driver reads at the very end."""
    from .bucketed import bucketed_group_reduce

    def l_proj(df: pd.DataFrame) -> pd.DataFrame:
        sub = df.loc[df["l_returnflag"] == "R"]
        return pd.DataFrame(
            {"okey": sub["l_orderkey"].to_numpy(dtype="int64"),
             "ckey": np.int64(0),
             "cents": _round_half_away(
                 sub["l_extendedprice"].to_numpy()
                 * (1.0 - sub["l_discount"].to_numpy()) * 100.0
             ),
             "side": np.int8(0)}
        )

    def o_proj(df: pd.DataFrame) -> pd.DataFrame:
        m = (df["o_orderdate"] >= pd.Timestamp("1996-01-01")) & (
            df["o_orderdate"] < pd.Timestamp("1996-04-01")
        )
        sub = df.loc[m]
        return pd.DataFrame(
            {"okey": sub["o_orderkey"].to_numpy(dtype="int64"),
             "ckey": sub["o_custkey"].to_numpy(dtype="int64"),
             "cents": np.int64(0),
             "side": np.int8(1)}
        )

    both = (
        _read(sf_dir, "lineitem",
              ["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"])
        .map_batches(l_proj, batch_format="pandas")
        .union(
            _read(sf_dir, "orders",
                  ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
                o_proj, batch_format="pandas"
            )
        )
    )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        li = g.loc[g["side"] == 0, ["okey", "cents"]]
        od = g.loc[g["side"] == 1, ["okey", "ckey"]].drop_duplicates("okey")
        m = li.merge(od, on="okey")
        return m.groupby("ckey", sort=False, as_index=False)["cents"].sum()

    parts = bucketed_group_reduce(
        both, ["okey"], lambda df: df, per_bucket, n_buckets=64
    ).to_pandas()
    agg = parts.groupby("ckey", sort=False, as_index=False)["cents"].sum()
    cust = _read_small(sf_dir, "customer", ["c_custkey", "c_name", "c_nationkey"])
    nat = _read_small(sf_dir, "nation", ["n_nationkey", "n_name"])
    out = agg.merge(cust, left_on="ckey", right_on="c_custkey").merge(
        nat, left_on="c_nationkey", right_on="n_nationkey"
    )
    out = out.rename(columns={"cents": "revenue_cents"})
    out["revenue_cents"] = out["revenue_cents"].astype("int64")
    return out[["c_custkey", "c_name", "n_name", "revenue_cents"]]


def q13_order_count_distribution(sf_dir: str):
    """TPC-H Q13 shape: how many customers placed k orders, INCLUDING the
    zero-order bucket of the left join. Scale shape: no join at all — the
    per-customer order count is a bucketed combiner over orders (bounded by
    #customers), the k-histogram over it is another combiner (bounded by
    max k), and the zero bucket is arithmetic: total customers minus
    customers seen in orders. The customer table is touched only by a
    count(*) scan."""
    counts = pre_aggregate(
        _read(sf_dir, "orders", ["o_custkey"]), ["o_custkey"], counts=True
    )

    def hist_partial(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby("n", sort=False).size().rename("custdist").reset_index()
        )

    from .bucketed import bucketed_group_reduce

    hist = bucketed_group_reduce(
        counts, ["n"], hist_partial,
        lambda g: g.groupby("n", sort=False, as_index=False)["custdist"].sum(),
        n_buckets=16,
    ).to_pandas()
    n_customers = _read(sf_dir, "customer", ["c_custkey"]).count()
    n_with_orders = int(hist["custdist"].sum())
    zero = n_customers - n_with_orders
    out = hist.rename(columns={"n": "c_count"})
    if zero > 0:
        out = pd.concat(
            [out, pd.DataFrame({"c_count": [0], "custdist": [zero]})],
            ignore_index=True,
        )
    out["c_count"] = out["c_count"].astype("int64")
    out["custdist"] = out["custdist"].astype("int64")
    return out


_Q19_BRACKETS = (
    # (brand, size_lo, size_hi, qty_lo, qty_hi) — inclusive bounds
    ("Brand#12", 1, 15, 1, 11),
    ("Brand#23", 1, 25, 10, 20),
    ("Brand#3", 1, 35, 20, 30),
)


def q19_bracket_revenue(sf_dir: str):
    """TPC-H Q19 shape: disjunctive bracket predicate across the part dims
    and the lineitem measure. Scale shape: the part side collapses to a
    broadcast dict partkey -> bracket id covering ONLY parts that can match
    any bracket (brand+size prefilter pushed into the dimension read);
    lineitem batches resolve the bracket vectorized and emit two integer
    counters per batch — no shuffle, single-row result."""
    import ray as _ray

    brands = sorted({b for b, *_ in _Q19_BRACKETS})
    part = _read_small(
        sf_dir, "part", ["p_partkey", "p_brand", "p_size"],
        filters=[("p_brand", "in", brands)],
    )
    frames = []
    for b, slo, shi, qlo, qhi in _Q19_BRACKETS:
        m = (part["p_brand"] == b) & (part["p_size"] >= slo) & (part["p_size"] <= shi)
        frames.append(
            pd.DataFrame(
                {"pk": part.loc[m, "p_partkey"].to_numpy(dtype="int64"),
                 "qlo": qlo, "qhi": qhi}
            )
        )
    elig = pd.concat(frames).sort_values("pk", kind="stable")
    # broadcast as sorted arrays; each batch resolves brackets with one
    # vectorized searchsorted — no per-row dict probe
    ref = _ray.put(
        (elig["pk"].to_numpy(), elig["qlo"].to_numpy(dtype="float64"),
         elig["qhi"].to_numpy(dtype="float64"))
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        pks, qlo, qhi = _ray.get(ref)
        pk = df["l_partkey"].to_numpy(dtype="int64")
        qty = df["l_quantity"].to_numpy()
        if len(pks):
            idx_c = np.clip(np.searchsorted(pks, pk), 0, len(pks) - 1)
            m = (pks[idx_c] == pk) & (qty >= qlo[idx_c]) & (qty <= qhi[idx_c])
        else:
            m = np.zeros(len(pk), dtype=bool)
        cents = _round_half_away(
            df["l_extendedprice"].to_numpy()
            * (1.0 - df["l_discount"].to_numpy()) * 100.0
        )
        return pd.DataFrame(
            {"revenue_cents": [int(cents[m].sum())], "n_lines": [int(m.sum())]}
        )

    parts = (
        _read(sf_dir, "lineitem",
              ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"])
        .map_batches(partial, batch_format="pandas").to_pandas()
    )
    return pd.DataFrame(
        {"revenue_cents": [int(parts["revenue_cents"].sum())],
         "n_lines": [int(parts["n_lines"].sum())]}
    )


def q16_supplier_variety(sf_dir: str):
    """TPC-H Q16 shape: distinct suppliers per part attribute group,
    excluding one brand. Scale shape: per-batch dedup of (partkey, suppkey)
    pairs, attribute attach by broadcast part dims, then a bucketed DISTINCT
    on (brand, type, size, suppkey) followed by a bounded group count — the
    raw pair stream crosses the exchange once, pre-deduped per batch."""
    import ray as _ray

    from .bucketed import bucketed_group_reduce

    part = _read_small(sf_dir, "part", ["p_partkey", "p_brand", "p_type", "p_size"])
    part = part.loc[part["p_brand"] != "Brand#1"]
    ref = _ray.put(part.reset_index(drop=True))

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        dims = _ray.get(ref)
        sub = df[["l_partkey", "l_suppkey"]].drop_duplicates()
        m = sub.merge(dims, left_on="l_partkey", right_on="p_partkey")
        out = m[["p_brand", "p_type", "p_size", "l_suppkey"]].rename(
            columns={"l_suppkey": "suppkey"}
        ).drop_duplicates()
        out["p_size"] = out["p_size"].astype("int64")
        out["suppkey"] = out["suppkey"].astype("int64")
        return out

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["p_brand", "p_type", "p_size", "suppkey"])
        return (
            d.groupby(["p_brand", "p_type", "p_size"], sort=False)
            .size().rename("supplier_cnt").reset_index()
        )

    out = bucketed_group_reduce(
        _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"]),
        ["p_brand", "p_type", "p_size"], pairs, reduce, n_buckets=32,
    ).to_pandas()
    out["supplier_cnt"] = out["supplier_cnt"].astype("int64")
    out["p_size"] = out["p_size"].astype("int64")
    return out


def q22_dormant_rich_customers(sf_dir: str):
    """TPC-H Q22 shape (adapted: this corpus has no phone column and every
    customer has orders): customers whose balance beats the positive-balance
    average AND whose LAST order predates 2000-01-01 — the scalar-subquery
    broadcast + per-customer anti/max aggregate shape. The threshold compare
    is integer-exact (cents * n > sum_cents avoids float avg entirely);
    the last-order date is a bucketed max over orders; the customer scan
    filters against the broadcast aggregate and groups by segment."""
    import ray as _ray

    from .bucketed import bucketed_group_reduce

    # scalar: (sum of positive balances in cents, count) — two int counters
    def bal_partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = _cents(df["c_acctbal"])
        pos = cents > 0
        return pd.DataFrame({"s": [int(cents[pos].sum())], "n": [int(pos.sum())]})

    bp = (
        _read(sf_dir, "customer", ["c_acctbal"])
        .map_batches(bal_partial, batch_format="pandas").to_pandas()
    )
    sum_cents, n_pos = int(bp["s"].sum()), int(bp["n"].sum())

    # per-customer last order date (bucketed max — customer-bounded output)
    def last_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("o_custkey", sort=False, as_index=False)[
            "o_orderdate"
        ].max()

    last = bucketed_group_reduce(
        _read(sf_dir, "orders", ["o_custkey", "o_orderdate"]),
        ["o_custkey"], last_partial,
        lambda g: g.groupby("o_custkey", sort=False, as_index=False)[
            "o_orderdate"
        ].max(),
        n_buckets=32,
    ).to_pandas()
    dormant = set(
        last.loc[last["o_orderdate"] < pd.Timestamp("2000-01-01"), "o_custkey"]
        .astype("int64").tolist()
    )
    dref = _ray.put(dormant)

    def seg_partial(df: pd.DataFrame) -> pd.DataFrame:
        ds_ = _ray.get(dref)
        cents = _cents(df["c_acctbal"])
        m = (cents * n_pos > sum_cents) & df["c_custkey"].isin(ds_).to_numpy()
        sub = df.loc[m]
        t = pd.DataFrame(
            {"c_mktsegment": sub["c_mktsegment"],
             "cents": cents[m]}
        )
        g = t.groupby("c_mktsegment", sort=False)["cents"].agg(["sum", "size"])
        return pd.DataFrame(
            {"c_mktsegment": g.index, "totacctbal_cents": g["sum"].astype("int64"),
             "numcust": g["size"].astype("int64")}
        )

    parts = (
        _read(sf_dir, "customer", ["c_custkey", "c_acctbal", "c_mktsegment"])
        .map_batches(seg_partial, batch_format="pandas").to_pandas()
    )
    out = parts.groupby("c_mktsegment", sort=False, as_index=False).agg(
        numcust=("numcust", "sum"), totacctbal_cents=("totacctbal_cents", "sum")
    )
    out["numcust"] = out["numcust"].astype("int64")
    out["totacctbal_cents"] = out["totacctbal_cents"].astype("int64")
    return out[["c_mktsegment", "numcust", "totacctbal_cents"]]


HH_CAPACITY = 100_000  # Misra-Gries capacity; > corpus vocab at driver scales
# marker token carrying a partial's truncation residual through the exchange;
# \x00 cannot appear in whitespace-split tokens of the driver corpora
HH_ERR_TOKEN = "\x00mg_err"


def _mg_truncate(t: pd.DataFrame, capacity: int) -> pd.DataFrame:
    """Misra-Gries truncation of an exact (token, n) count frame to
    ``capacity`` entries: subtract the (capacity+1)-th largest count from
    the kept top-``capacity``, drop <= 0, and carry the subtraction in an
    ``err`` column (0 when nothing was truncated). Guarantee after any
    merge-by-sum of such partials: true_count <= n + sum(errs of ALL
    partials); property-tested in tests/test_r3_ops.py."""
    err = 0
    if len(t) > capacity:
        t = t.sort_values(["n", "token"], ascending=[False, True],
                          kind="stable").reset_index(drop=True)
        err = int(t["n"].iloc[capacity])
        t = t.iloc[:capacity].copy()
        t["n"] = t["n"] - err
        t = t.loc[t["n"] > 0]
    else:
        t = t.copy()
    t["err"] = np.int64(err)
    return t


def heavy_hitters_tokens(sf_dir: str):
    """Frequent-token heavy hitters via a mergeable Misra-Gries summary —
    the bounded-memory sketch a 100 TB token-frequency pass uses instead of
    an exact (vocab-sized) groupby. Each batch builds exact counts then
    truncates to HH_CAPACITY entries Misra-Gries-style (subtract the
    (C+1)-th count, drop <=0, carry the subtraction as ``err``); partial
    counts merge by bucketed sum, and every row reports the GLOBAL error
    bound: true_count in [n, n + err_bound] where err_bound is the sum of
    ALL partials' truncation residuals — a token dropped by a truncating
    batch loses that batch's err row too, so per-token err sums understate
    the bound (the round-3 review caught exactly that); the global sum is
    carried by one marker row per partial (token "\\x00mg_err", n=0) that
    merges in its own bucket and is peeled off before the top-k.

    At driver scales the corpus vocabulary is far below HH_CAPACITY, so no
    truncation fires, err_bound = 0, and the result equals the exact top-40
    — which is exactly what the SQL oracle checks. The bounded-capacity
    behavior (err <= n_tokens/(C+1)) is property-tested in pytest with a
    tiny capacity."""
    from .textstats import _tokens

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        c: Counter = Counter()
        for s in df["text"]:
            c.update(_tokens(s))
        t = pd.DataFrame(
            {"token": list(c.keys()), "n": np.fromiter(c.values(), dtype="int64")}
        )
        t = _mg_truncate(t, HH_CAPACITY)
        err = int(t["err"].iloc[0]) if len(t) else 0
        marker = pd.DataFrame(
            {"token": [HH_ERR_TOKEN], "n": np.array([0], dtype="int64"),
             "err": np.array([err], dtype="int64")}
        )
        return pd.concat([t, marker], ignore_index=True)

    from .bucketed import bucketed_group_reduce

    # merged summary is sketch-sized (<= capacity survivors per truncating
    # partial; vocab-bounded otherwise) — materialize once so the top-k and
    # the marker peel don't recompute the corpus scan
    counts = bucketed_group_reduce(
        _read(sf_dir, "documents", ["text"]),
        ["token"], partial,
        lambda g: g.groupby("token", sort=False, as_index=False).agg(
            n=("n", "sum"), err=("err", "sum")
        ),
        n_buckets=32,
    ).materialize()

    def peel_marker(df: pd.DataFrame) -> pd.DataFrame:
        return df.loc[df["token"] == HH_ERR_TOKEN, ["err"]]

    total_err = int(
        counts.map_batches(peel_marker, batch_format="pandas")
        .to_pandas()["err"].sum()
    )

    def drop_marker(df: pd.DataFrame) -> pd.DataFrame:
        return df.loc[df["token"] != HH_ERR_TOKEN]

    from .relational import topk

    out = topk(counts.map_batches(drop_marker, batch_format="pandas"),
               "n", 40, tiebreak="token")
    out["err_bound"] = np.int64(total_err)
    out["n"] = out["n"].astype("int64")
    out["err_bound"] = out["err_bound"].astype("int64")
    return out[["token", "n", "err_bound"]]


def top_orders_per_priority_dense(sf_dir: str):
    """Dense-rank top-N per group WITH ties — the ranking-window operator
    (dense_rank() OVER (PARTITION BY ...)) Ray Data has no native window
    for. Sound distributed pruning: a row whose total is among the global
    top-3 DISTINCT values of its priority is necessarily among its own
    batch's top-3 distinct values, so each batch forwards only those rows;
    the driver derives the true top-3 distinct values per priority from the
    small partial union and ranks by value order. Ties all survive, exactly
    like the SQL window."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = pd.DataFrame(
            {"o_orderpriority": df["o_orderpriority"],
             "o_orderkey": df["o_orderkey"].to_numpy(dtype="int64"),
             "total_cents": _cents(df["o_totalprice"])}
        )
        keep = []
        for _, g in t.groupby("o_orderpriority", sort=False):
            top3 = np.sort(g["total_cents"].unique())[-3:]
            keep.append(g.loc[g["total_cents"].isin(top3)])
        return pd.concat(keep) if keep else t.iloc[:0]

    parts = (
        _read(sf_dir, "orders", ["o_orderpriority", "o_orderkey", "o_totalprice"])
        .map_batches(partial, batch_format="pandas").to_pandas()
    )
    if not len(parts):  # empty/filtered-out orders table (no columns either)
        return pd.DataFrame(
            {"o_orderpriority": pd.array([], dtype="string"),
             "o_orderkey": pd.array([], dtype="int64"),
             "total_cents": pd.array([], dtype="int64"),
             "rnk": pd.array([], dtype="int64")}
        )
    out_rows = []
    for pri, g in parts.groupby("o_orderpriority", sort=False):
        top3 = np.sort(g["total_cents"].unique())[::-1][:3]
        rank_of = {int(v): i + 1 for i, v in enumerate(top3)}
        sub = g.loc[g["total_cents"].isin(top3)].copy()
        sub["rnk"] = sub["total_cents"].map(rank_of).astype("int64")
        out_rows.append(sub)
    out = pd.concat(out_rows, ignore_index=True)
    out["total_cents"] = out["total_cents"].astype("int64")
    return out[["o_orderpriority", "o_orderkey", "total_cents", "rnk"]]


def doc_trigram_top20(sf_dir: str):
    """Corpus-wide top-20 word trigrams — n-gram statistics over documents
    (the language-model-ish counting pass): per-batch trigram Counter
    partials, ONE bucketed sum keyed by trigram, deterministic top-k with
    lexicographic tie-break. Shuffle volume is bounded by distinct trigrams
    per batch, never corpus tokens."""
    from .textstats import _tokens

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        c: Counter = Counter()
        for s in df["text"]:
            toks = _tokens(s)
            for i in range(len(toks) - 2):
                c[" ".join(toks[i:i + 3])] += 1
        return pd.DataFrame(
            {"trigram": list(c.keys()),
             "n": np.fromiter(c.values(), dtype="int64")}
        )

    from .bucketed import bucketed_group_reduce

    counts = bucketed_group_reduce(
        _read(sf_dir, "documents", ["text"]),
        ["trigram"], partial,
        lambda g: g.groupby("trigram", sort=False, as_index=False)["n"].sum(),
        n_buckets=32,
    )
    from .relational import topk

    out = topk(counts, "n", 20, tiebreak="trigram")
    out["n"] = out["n"].astype("int64")
    return out[["trigram", "n"]]


SEMDEDUP_PLANES = 8
SEMDEDUP_COS = 0.4  # compare as num>0 and num^2*100 >= 16*|a|^2*|b|^2


def semdedup_embeddings(sf_dir: str):
    """SemDeDup-style semantic dedup over the embedding table: vectors are
    LSH-bucketed by an 8-plane hyperplane signature (same md5 sign contract
    as embedding_lsh_buckets, micro-unit integer dots — exact), and within
    a bucket a vector is dropped when an EARLIER vector (smaller vec_id)
    is cosine-similar above the threshold (SemDeDup, Abbas et al. 2023 —
    cluster, then prune within cluster). "Dominated by an earlier kept-
    or-not vector" rather than chained greedy keeps the rule associative,
    partition-friendly and SQL-expressible; dup_of reports the smallest
    dominating id.

    Scale shape: ONE exchange on the bucket signature; the O(b^2) compare
    runs inside each bucket on quantized integer rows (the LSH split bounds
    b; the corpus never does an all-pairs). The threshold compare is exact
    integer arithmetic (python ints — num^2 overflows int64) on both sides,
    so the oracle matches bit-for-bit."""
    import ray as _ray

    from .bucketed import bucketed_group_reduce

    signs_ref = _ray.put(_hyperplane_signs(SEMDEDUP_PLANES, EMB_DIM))
    weights = (np.int64(1) << np.arange(SEMDEDUP_PLANES, dtype=np.int64))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        m = np.vstack([np.asarray(v, dtype=np.float64) for v in df["embedding"]])
        x = _round_half_away(m * 1_000_000.0)
        dots = x @ _ray.get(signs_ref).T
        bucket = ((dots >= 0).astype(np.int64) * weights[None, :]).sum(axis=1)
        return pd.DataFrame(
            {"bucket_id": bucket,
             "vec_id": df["vec_id"].to_numpy(dtype="int64"),
             "x": [row.tolist() for row in x]}
        )

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for bid, grp in g.groupby("bucket_id", sort=False):
            grp = grp.sort_values("vec_id", kind="stable")
            ids = grp["vec_id"].to_numpy(dtype="int64")
            X = np.vstack(grp["x"].to_numpy())
            Xo = X.astype(object)  # one conversion per bucket, not per pair
            nrm = [int(v) for v in (Xo * Xo).sum(axis=1)]
            dup_of = np.full(len(ids), -1, dtype="int64")
            for a in range(1, len(ids)):
                for b in range(a):
                    num = int(np.dot(Xo[a], Xo[b]))
                    if num > 0 and num * num * 100 >= 16 * nrm[a] * nrm[b]:
                        dup_of[a] = ids[b]
                        break  # ids sorted ascending: first hit is smallest
            out.append(pd.DataFrame(
                {"vec_id": ids, "bucket_id": np.int64(bid),
                 "dup_of": dup_of, "kept": dup_of < 0}
            ))
        return pd.concat(out) if out else pd.DataFrame(
            {"vec_id": pd.array([], dtype="int64"),
             "bucket_id": pd.array([], dtype="int64"),
             "dup_of": pd.array([], dtype="int64"),
             "kept": pd.array([], dtype="bool")}
        )

    res = bucketed_group_reduce(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"]),
        ["bucket_id"], partial, reduce, n_buckets=16,
    ).to_pandas()
    # dup_of = -1 sentinel for kept rows (avoids a nullable-int column in
    # the driver's value-hash compare; the oracle COALESCEs to -1 too)
    res["dup_of"] = res["dup_of"].astype("int64")
    return res[["vec_id", "bucket_id", "dup_of", "kept"]]


def bitext_mine_pairs(sf_dir: str):
    """Cross-lingual bitext-style pair mining (the CCMatrix/LASER curation
    step, Artetxe & Schwenk 2019-class, simplified to mutual nearest
    neighbors): emit an (en doc, non-en doc) pair when each is the other's
    best cross-lingual cosine match inside their shared LSH bucket — the
    translation-pair candidates a multilingual pretraining pipeline mines
    before alignment verification.

    Scale shape: identical to semdedup — ONE exchange on the 8-plane
    hyperplane signature; the per-bucket cross-language scan runs on
    e6-quantized integer rows (exact int64 dots) and neither language side
    is ever broadcast or driver-resident (the en "index" shards with the
    buckets). Ranking is bit-stable across engines by construction: num and
    the two norms are EXACT ints < 2^53 (so their int->double casts are
    exact), and the score is the fixed IEEE sequence num / sqrt(na * nb) —
    identical in numpy and DuckDB — with ties broken on lowest vec_id.
    The lang flag rides the exchange as a row column (at fleet scale it is
    a co-partitioned column of the embedding table, not a broadcast).
    Output (en_id, other_id, other_lang, score_e6)."""
    import ray as _ray

    from .bucketed import bucketed_group_reduce

    signs_ref = _ray.put(_hyperplane_signs(SEMDEDUP_PLANES, EMB_DIM))
    weights = (np.int64(1) << np.arange(SEMDEDUP_PLANES, dtype=np.int64))
    lang_df = _read_small(sf_dir, "documents", ["doc_id", "lang"])
    lang_arr = np.empty(int(lang_df["doc_id"].max()) + 1, dtype=object)
    lang_arr[lang_df["doc_id"].to_numpy()] = lang_df["lang"].to_numpy()
    lang_ref = _ray.put(lang_arr)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        la = _ray.get(lang_ref)
        m = np.vstack([np.asarray(v, dtype=np.float64) for v in df["embedding"]])
        x = _round_half_away(m * 1_000_000.0)
        dots = x @ _ray.get(signs_ref).T
        bucket = ((dots >= 0).astype(np.int64) * weights[None, :]).sum(axis=1)
        ids = df["vec_id"].to_numpy(dtype="int64")
        return pd.DataFrame(
            {"bucket_id": bucket, "vec_id": ids,
             "lang": [la[i] for i in ids],
             "x": [row.tolist() for row in x]}
        )

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, grp in g.groupby("bucket_id", sort=False):
            grp = grp.sort_values("vec_id", kind="stable")
            en = grp[grp["lang"] == "en"]
            xx = grp[grp["lang"] != "en"]
            if not len(en) or not len(xx):
                continue
            en_ids = en["vec_id"].to_numpy(dtype="int64")
            xx_ids = xx["vec_id"].to_numpy(dtype="int64")
            E = np.vstack(en["x"].to_numpy()).astype(np.int64)
            X = np.vstack(xx["x"].to_numpy()).astype(np.int64)
            num = E @ X.T  # exact: |xi| <= 1e6, 64 dims -> < 2^53
            na = (E * E).sum(axis=1)
            nb = (X * X).sum(axis=1)
            score = num.astype(np.float64) / np.sqrt(
                na.astype(np.float64)[:, None] * nb.astype(np.float64)[None, :]
            )
            # rows sorted by id -> argmax's first-wins IS the lowest-id tie-break
            fwd = score.argmax(axis=0)   # per xx: best en row
            rev = score.argmax(axis=1)   # per en: best xx row
            mutual = np.flatnonzero(rev[fwd] == np.arange(len(xx_ids)))
            if not len(mutual):
                continue
            ei = fwd[mutual]
            out.append(pd.DataFrame(
                {"en_id": en_ids[ei],
                 "other_id": xx_ids[mutual],
                 "other_lang": xx["lang"].to_numpy()[mutual],
                 "score_e6": _round_half_away(score[ei, mutual] * 1e6)}
            ))
        return pd.concat(out) if out else pd.DataFrame(
            {"en_id": pd.array([], dtype="int64"),
             "other_id": pd.array([], dtype="int64"),
             "other_lang": pd.array([], dtype=object),
             "score_e6": pd.array([], dtype="int64")}
        )

    return bucketed_group_reduce(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"]),
        ["bucket_id"], partial, reduce, n_buckets=16,
    )


def doc_token_entropy(sf_dir: str):
    """Per-document token-distribution Shannon entropy — the vocabulary-
    diversity quality signal (low entropy = repetitive/templated text, a
    standard pre-training filter axis). Reported as integer micro-nats of
    N*H = N ln N - sum_w c_w ln c_w, with EVERY transcendental term rounded
    to integer micro-units before the (order-free, exact) integer sum —
    the same determinism contract as doc_bigram_logprob. Empty docs are
    omitted (no distribution to score). Fully per-batch; no shuffle."""
    import math

    from .textstats import _tokens

    def score(df: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        ids, ns, ents = [], [], []
        for doc_id, s in zip(df["doc_id"], df["text"]):
            t = _tokens(s)
            n = len(t)
            if n == 0:
                continue
            sc = 0
            for c in Counter(t).values():
                x = c * math.log(c) * 1e6
                sc += int(math.floor(x + 0.5))
            xn = n * math.log(n) * 1e6
            ids.append(int(doc_id))
            ns.append(n)
            ents.append(int(math.floor(xn + 0.5)) - sc)
        return pd.DataFrame(
            {"doc_id": np.array(ids, dtype="int64"),
             "n_tokens": np.array(ns, dtype="int64"),
             "ent_n_micro": np.array(ents, dtype="int64")}
        )

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        score, batch_format="pandas"
    )


def events_csv_source(sf_dir: str):
    """CSV source-format coverage (the reference's folder-poll source
    consumed opaque files; this engine reads parquet, jsonl and csv): the
    events table is exported once to CSV under /tmp (deterministic
    content), read back with ray.data.read_csv, and aggregated per type —
    proving the csv reader feeds the same combiner pipeline bit-for-bit.
    The oracle aggregates the ORIGINAL parquet, so any reader drift
    (type inference, timestamp parsing, quoting) fails the value hash."""
    import hashlib

    import ray.data as _rd

    src = os.path.join(sf_dir, "events.parquet")
    # cache key covers path + mtime + size: a regenerated corpus at the
    # same path invalidates the export instead of serving stale rows
    st = os.stat(src)
    key = hashlib.md5(
        f"{os.path.abspath(src)}:{st.st_mtime_ns}:{st.st_size}".encode()
    ).hexdigest()[:12]
    csv_dir = f"/tmp/rayextract_csv/{key}"
    done = os.path.join(csv_dir, "_done")
    if not os.path.exists(done):
        os.makedirs(csv_dir, exist_ok=True)
        t = pq.read_table(src, columns=["event_id", "event_type", "value", "ts"])
        import pyarrow.csv as pacsv

        # write-then-rename: a concurrent run never reads a torn CSV
        tmp = os.path.join(csv_dir, f".events.{os.getpid()}.csv")
        pacsv.write_csv(t, tmp)
        os.replace(tmp, os.path.join(csv_dir, "events.csv"))
        with open(done, "w") as f:
            f.write("ok")

    ds = _rd.read_csv(os.path.join(csv_dir, "events.csv"))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = pd.DataFrame(
            {"event_type": df["event_type"],
             "micro": _round_half_away(df["value"].to_numpy(dtype="float64")
                                       * 1_000_000.0)}
        )
        g = t.groupby("event_type", sort=False)["micro"].agg(["sum", "size"])
        return pd.DataFrame(
            {"event_type": g.index, "sum_micro": g["sum"].astype("int64"),
             "n": g["size"].astype("int64")}
        )

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    out = parts.groupby("event_type", sort=False, as_index=False).agg(
        sum_micro=("sum_micro", "sum"), n=("n", "sum")
    )
    out["sum_micro"] = out["sum_micro"].astype("int64")
    out["n"] = out["n"].astype("int64")
    return out


CONTAINMENT_RARE_MAX = 5   # a shingle anchoring candidates appears in <= 5 docs
CONTAINMENT_TAU = 0.8      # |A ∩ B| / min(|A|, |B|) threshold (x10 integer cmp)


def dedup_containment(sf_dir: str):
    """Containment (subset/overlap) near-dup pairs — catches a small doc
    embedded in a big one, which Jaccard-LSH structurally misses (the
    union term drowns the overlap). Candidates come from RARE-ANCHOR
    blocking: only 3-gram shingles appearing in <= CONTAINMENT_RARE_MAX
    docs propose pairs (a bounded C(5,2) per rare shingle — no all-pairs),
    then the exact overlap |A∩B| is counted for candidates only and gated
    on containment = |A∩B| / min(|A|,|B|) >= CONTAINMENT_TAU.

    Scale shape: one scan emits distinct (shingle, doc) rows; a bucketed
    reduce keyed by shingle (a) counts per-doc shingle sizes via a second
    keyed reduce, (b) emits candidate pairs from rare shingles; the
    overlap count re-walks the shingle buckets with the (small) candidate
    partner map broadcast, emitting (pair, 1) partials — every exchange is
    linear in the shingle stream, pair work is candidate-bounded."""
    import ray as _ray

    from .bucketed import bucketed_group_reduce
    from .textstats import _tokens

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def shingle_rows(df: pd.DataFrame) -> pd.DataFrame:
        ids, shs = [], []
        for doc_id, s in zip(df["doc_id"], df["text"]):
            t = _tokens(s)
            if len(t) < 3:
                continue
            seen = {" ".join(t[i:i + 3]) for i in range(len(t) - 2)}
            ids.extend([int(doc_id)] * len(seen))
            shs.extend(sorted(seen))
        return pd.DataFrame(
            {"s": shs, "doc_id": np.array(ids, dtype="int64")}
        )

    # three consumers (sizes, candidates, overlap) read the shingle stream:
    # materialize it once instead of re-tokenizing the corpus three times.
    # At 100 TB the equivalent is persisting the shingle stream to parquet
    # (checkpoint) between the passes — same pattern as kmeans_embeddings.
    sh = docs.map_batches(shingle_rows, batch_format="pandas").materialize()

    # per-doc shingle-set sizes (doc-keyed bucketed count). Kept as a
    # Dataset: only the candidate docs' sizes ever reach the driver.
    sizes_ds = bucketed_group_reduce(
        sh, ["doc_id"],
        lambda df: df.groupby("doc_id", sort=False).size().rename("m").reset_index(),
        lambda g: g.groupby("doc_id", sort=False, as_index=False)["m"].sum(),
        n_buckets=32,
    )

    # candidate pairs from rare shingles (shingle-keyed bucketed reduce;
    # each batch pre-dedupes, the bucket sees every row of its shingles)
    def cand_reduce(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, grp in g.groupby("s", sort=False):
            d = np.unique(grp["doc_id"].to_numpy(dtype="int64"))
            if 2 <= len(d) <= CONTAINMENT_RARE_MAX:
                for i in range(len(d)):
                    for j in range(i + 1, len(d)):
                        out_a.append(d[i])
                        out_b.append(d[j])
        return pd.DataFrame(
            {"da": np.array(out_a, dtype="int64"),
             "db": np.array(out_b, dtype="int64")}
        ).drop_duplicates()

    cands = bucketed_group_reduce(
        sh, ["s"], lambda df: df.drop_duplicates(), cand_reduce, n_buckets=32,
    ).to_pandas()
    if not len(cands):  # no rare anchors in this corpus: no candidates
        return pd.DataFrame(
            {"doc_a": pd.array([], dtype="int64"),
             "doc_b": pd.array([], dtype="int64"),
             "overlap": pd.array([], dtype="int64"),
             "containment_bp": pd.array([], dtype="int64")}
        )
    cands = cands.drop_duplicates()

    # overlap counts for candidates only: partner map broadcast, shingle
    # buckets emit one (da, db) row per co-occurring shingle
    partners: dict[int, list[int]] = {}
    for a, b in zip(cands["da"].astype(int), cands["db"].astype(int)):
        partners.setdefault(a, []).append(b)
    pref = _ray.put({k: set(v) for k, v in partners.items()})

    def overlap_reduce(g: pd.DataFrame) -> pd.DataFrame:
        pm = _ray.get(pref)
        counts: dict = {}
        for _, grp in g.groupby("s", sort=False):
            d = np.unique(grp["doc_id"].to_numpy(dtype="int64"))
            if len(d) < 2:
                continue
            dset = set(int(x) for x in d)
            for a in dset:
                ps = pm.get(a)
                if not ps:
                    continue
                for b in ps & dset:
                    counts[(a, b)] = counts.get((a, b), 0) + 1
        ks = list(counts.keys())
        return pd.DataFrame(
            {"da": np.array([k[0] for k in ks], dtype="int64"),
             "db": np.array([k[1] for k in ks], dtype="int64"),
             "ov": np.fromiter(counts.values(), dtype="int64")}
        )

    ov = bucketed_group_reduce(
        sh, ["s"], lambda df: df.drop_duplicates(), overlap_reduce, n_buckets=32,
    ).to_pandas()
    if not len(ov):
        return pd.DataFrame(
            {"doc_a": pd.array([], dtype="int64"),
             "doc_b": pd.array([], dtype="int64"),
             "overlap": pd.array([], dtype="int64"),
             "containment_bp": pd.array([], dtype="int64")}
        )
    ix = ov.groupby(["da", "db"], sort=False, as_index=False)["ov"].sum().rename(
        columns={"ov": "overlap"}
    )
    need = set(ix["da"].astype(int)) | set(ix["db"].astype(int))
    nref = _ray.put(need)
    sizes = sizes_ds.map_batches(
        lambda df: df[df["doc_id"].isin(_ray.get(nref))], batch_format="pandas"
    ).to_pandas()
    m_of = dict(zip(sizes["doc_id"].astype(int), sizes["m"].astype(int)))
    ix["min_m"] = np.minimum(
        ix["da"].map(m_of).to_numpy(dtype="int64"),
        ix["db"].map(m_of).to_numpy(dtype="int64"),
    )
    keep = ix.loc[ix["overlap"] * 10 >= int(CONTAINMENT_TAU * 10) * ix["min_m"]].copy()
    keep["containment_bp"] = (10000 * keep["overlap"] + keep["min_m"] // 2) // keep["min_m"]
    keep = keep.rename(columns={"da": "doc_a", "db": "doc_b"})
    for c in ("doc_a", "doc_b", "overlap", "containment_bp"):
        keep[c] = keep[c].astype("int64")
    return keep[["doc_a", "doc_b", "overlap", "containment_bp"]]


def audio_zcr_stats(sf_dir: str):
    """Real-WAV waveform DSP under the FULL value-hash gate: per document a
    genuine RIFF/WAV PCM16 container is synthesized (integer-arithmetic
    samples), DECODED by the stdlib codec in an actor pool, and reduced to
    zero-crossing count + absolute-amplitude sum — integer-exact features
    the oracle regenerates arithmetically (lag window over the sample
    formula). Any codec bug (header, endianness, frame count) or DSP bug
    breaks the hash. Zero shuffle; decode+DSP per batch."""
    from .multimodal import synth_wav_batch, wav_dsp_features

    media = _fan_out(_read(sf_dir, "documents", ["doc_id"])).map_batches(
        synth_wav_batch, batch_format="pyarrow"
    )
    feats = wav_dsp_features(media)
    import pyarrow as pa

    def ints_only(t: pa.Table) -> pa.Table:
        return t.select(["media_id", "n_samples", "zcr", "abs_sum"])

    return feats.map_batches(ints_only, batch_format="pyarrow")


def audio_spectral_centroid(sf_dir: str):
    """FFT spectral centroid per decoded WAV clip — real frequency-domain
    feature extraction (numpy rfft over the real-codec PCM). Floats are not
    SQL-recomputable (no FFT in DuckDB), so this is a rows-only driver row;
    the physics is pinned by tests/test_r3_ops.py::test_spectral_centroid
    (pure tones land within one bin of their frequency)."""
    from .multimodal import synth_wav_batch, wav_dsp_features

    media = _fan_out(_read(sf_dir, "documents", ["doc_id"])).map_batches(
        synth_wav_batch, batch_format="pyarrow"
    )
    feats = wav_dsp_features(media)
    import pyarrow as pa

    def proj(t: pa.Table) -> pa.Table:
        return t.select(["media_id", "centroid_hz"])

    return feats.map_batches(proj, batch_format="pyarrow")


def orders_monthly_growth(sf_dir: str):
    """Month-over-month revenue growth — the lag-over-AGGREGATE window
    shape (event_transitions lags over raw rows; this lags over a grouped
    series). Monthly integer-cent revenue comes from the bucketed combiner;
    the month series is calendar-bounded, so the lag/growth math runs on
    the driver over an aggregate-sized frame. growth_bp is integer basis
    points (floor division, signed); the first month carries a -1e9
    sentinel (no prior month)."""
    from .bucketed import grouped_sum_count

    def proj(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"month": df["o_orderdate"].dt.strftime("%Y-%m"),
             "cents": _cents(df["o_totalprice"])}
        )

    monthly = grouped_sum_count(
        _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"]).map_batches(
            proj, batch_format="pandas"
        ),
        ["month"], sums=["cents"], counts=True, n_buckets=16,
    ).to_pandas().sort_values("month").reset_index(drop=True)
    rev = monthly["sum_cents"].to_numpy(dtype="int64")
    prev = np.roll(rev, 1)
    diff = rev - prev
    # DuckDB integer // truncates toward zero; numpy floors — compute as
    # sign * (|diff| * 10000 // |prev|) so both engines agree on negatives
    growth = np.where(
        prev != 0,
        np.sign(diff) * (np.abs(diff) * 10000 // np.maximum(np.abs(prev), 1)),
        np.int64(0),
    ).astype("int64")
    out = pd.DataFrame(
        {"month": monthly["month"],
         "revenue_cents": rev,
         "n_orders": monthly["n"].astype("int64"),
         "growth_bp": growth}
    )
    if len(out):
        out.loc[0, "growth_bp"] = -(10 ** 9)  # first month: no prior
    out["growth_bp"] = out["growth_bp"].astype("int64")
    return out


def event_anomaly_days(sf_dir: str):
    """Integer-exact volume-anomaly detection: flag (event_type, day) cells
    whose event count deviates from the type's mean by more than two
    standard deviations. The 2-sigma test runs WITHOUT floats:
    |x - S/N| > 2*sqrt((N*Q - S^2))/N  <=>  (x*N - S)^2 > 4*(N*Q - S^2)
    with S = sum(counts), Q = sum(counts^2), N = #days — pure integer
    arithmetic on both engines (HUGEINT in SQL), so the flag is bit-stable.
    Day-count cells are a bounded aggregate (types x days); one combiner
    exchange, driver-side flag math over the aggregate."""
    from .bucketed import grouped_sum_count

    def proj(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"event_type": df["event_type"],
             "day": df["ts"].dt.strftime("%Y-%m-%d")}
        )

    cells = grouped_sum_count(
        _read(sf_dir, "events", ["event_type", "ts"]).map_batches(
            proj, batch_format="pandas"
        ),
        ["event_type", "day"], sums=[], counts=True, n_buckets=16,
    ).to_pandas()
    out_rows = []
    for et, g in cells.groupby("event_type", sort=False):
        x = g["n"].to_numpy(dtype="int64")
        n_days = len(x)
        s = int(x.sum())
        q = int((x.astype(object) * x.astype(object)).sum())
        var_num = n_days * q - s * s  # N^2 * variance (exact int)
        dev = x.astype(object) * n_days - s
        flag = np.array(
            [int(d) * int(d) > 4 * var_num for d in dev], dtype=bool
        )
        out_rows.append(pd.DataFrame(
            {"event_type": et, "day": g["day"].to_numpy(),
             "n": x, "is_anomaly": flag}
        ))
    out = pd.concat(out_rows, ignore_index=True)
    out["n"] = out["n"].astype("int64")
    return out[["event_type", "day", "n", "is_anomaly"]]


QUERIES = {
    "f1_remove_special": f1_remove_special,
    "f2_upper_invariant": f2_upper_invariant,
    "f3_keyword_gate": f3_keyword_gate,
    "f4_first_date": f4_first_date,
    "f10_encrypt_pii": f10_encrypt_pii,
    "e3_e6_invoice_line": e3_e6_invoice_line,
    "e4_invoice_date": e4_invoice_date,
    "e5_order_ref": e5_order_ref,
    "e9_first_match_fold": e9_first_match_fold,
    "a1_user_stats": a1_user_stats,
    "sessionize_events": sessionize_events,
    "hourly_event_windows": hourly_event_windows,
    "sliding_window_events": sliding_window_events,
    "percentiles_value_per_type": percentiles_value_per_type,
    "q1_pricing_summary": q1_pricing_summary,
    "q3_top_orders": q3_top_orders,
    "q5_nation_revenue": q5_nation_revenue,
    "top_suppliers_native_sort": top_suppliers_native_sort,
    "topk_parts_per_brand": topk_parts_per_brand,
    "customers_without_orders": customers_without_orders,
    "doc_token_stats": doc_token_stats,
    "doc_quality": doc_quality,
    "doc_langid": doc_langid,
    "doc_fingerprint": doc_fingerprint,
    "doc_winnow_fp": doc_winnow_fp,
    "doc_gopher_filter": doc_gopher_filter,
    "doc_scrub_digits": doc_scrub_digits,
    "top_tokens_per_source": top_tokens_per_source,
    "dedup_exact": dedup_exact,
    "doc_bpe_token_stats": doc_bpe_token_stats,
    "doc_bigram_logprob": doc_bigram_logprob,
    "doc_kneser_ney_logprob": doc_kneser_ney_logprob,
    "pmi_top_collocations": pmi_top_collocations,
    "vocab_growth_curve": vocab_growth_curve,
    "lang_label_audit": lang_label_audit,
    "source_scorecard": source_scorecard,
    "mixture_plan_sources": mixture_plan_sources,
    "cross_source_leakage": cross_source_leakage,
    "contrastive_triplets": contrastive_triplets,
    "doc_readability_stats": doc_readability_stats,
    "curate_corpus_v2": curate_corpus_v2,
    "dsir_importance_select": dsir_importance_select,
    "range_join_value_bands": range_join_value_bands,
    "stratified_sample_per_source": stratified_sample_per_source,
    "dedup_minhash_clusters": dedup_minhash_clusters,
    "dedup_apply_exact": dedup_apply_exact,
    "curate_corpus": curate_corpus,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_minhash": dedup_minhash,
    "dedup_clusters": dedup_clusters,
    "pagerank_neardup": pagerank_neardup,
    "dedup_substring": dedup_substring,
    "dedup_paragraphs": dedup_paragraphs,
    "dedup_edit_verified": dedup_edit_verified,
    "dedup_simhash": dedup_simhash,
    "knn_cosine_topk": knn_cosine_topk,
    "knn_ivf_topk": knn_ivf_topk,
    "knn_pq_topk": knn_pq_topk,
    "embedding_pca_project": embedding_pca_project,
    "embed_neardup": embed_neardup,
    "e7_vendor_lookup": e7_vendor_lookup,
    "asof_purchase_view": asof_purchase_view,
    "median_value_per_type": median_value_per_type,
    "mad_value_per_type": mad_value_per_type,
    "distinct_users_per_type": distinct_users_per_type,
    "wordcount_top20": wordcount_top20,
    "cooccur_top20": cooccur_top20,
    "distinct_brand_type": distinct_brand_type,
    "union_clicks_purchases": union_clicks_purchases,
    "f5_person_ner": f5_person_ner,
    "f6_org_ner": f6_org_ner,
    "ner_model_extract": ner_model_extract,
    "f7_annotations": f7_annotations,
    "sample_hash_split": sample_hash_split,
    "kmeans_embeddings": kmeans_embeddings,
    "multimodal_decode": multimodal_decode,
    "audio_wav_decode": audio_wav_decode,
    "image_bmp_decode": image_bmp_decode,
    "image_ocr_extract": image_ocr_extract,
    "video_y4m_decode": video_y4m_decode,
    "conv_dedup_exact": conv_dedup_exact,
    "multimodal_frame_features": multimodal_frame_features,
    "dedup_simhash_pairs": dedup_simhash_pairs,
    "k2_annotation_quads": k2_annotation_quads,
    "transcript_extract": transcript_extract,
    "html_main_content": html_main_content,
    "pdf_reading_order": pdf_reading_order,
    "conv_role_audit": conv_role_audit,
    "conv_context_windows": conv_context_windows,
    "bm25_topk": bm25_topk,
    "neardup_triangles": neardup_triangles,
    "tombstone_delete_audit": tombstone_delete_audit,
    "conv_packing_plan": conv_packing_plan,
    "sft_pair_extract": sft_pair_extract,
    "gazetteer_match_counts": gazetteer_match_counts,
    "oov_rate_vs_vocab": oov_rate_vs_vocab,
    "trigram_diversity_per_source": trigram_diversity_per_source,
    "shuffle_skew_audit": shuffle_skew_audit,
    "doc_max_repeated_ngram": doc_max_repeated_ngram,
    "turn_dedup_normalized": turn_dedup_normalized,
    "boilerplate_prefix_per_source": boilerplate_prefix_per_source,
    "corpus_datasheet": corpus_datasheet,
    "contract_audit_documents": contract_audit_documents,
    "length_bucket_batching_plan": length_bucket_batching_plan,
    "doc_compression_ratio": doc_compression_ratio,
    "histogram_quantiles_value": histogram_quantiles_value,
    "source_token_js_divergence": source_token_js_divergence,
    "t5_span_corruption_stats": t5_span_corruption_stats,
    "transcript_extract_salted": transcript_extract_salted,
    "curate_transcripts": curate_transcripts,
    "transcript_turn_stats": transcript_turn_stats,
    "resume_manifest_audit": resume_manifest_audit,
    "ohlc_value_per_type_hour": ohlc_value_per_type_hour,
    "event_path_trigrams": event_path_trigrams,
    "table_checksum_documents": table_checksum_documents,
    "weighted_sample_docs": weighted_sample_docs,
    "funnel_view_click_purchase": funnel_view_click_purchase,
    "embedding_lsh_buckets": embedding_lsh_buckets,
    "orders_enriched": orders_enriched,
    "fk_integrity_audit": fk_integrity_audit,
    "quantize_embeddings_int8": quantize_embeddings_int8,
    "dedup_incremental": dedup_incremental,
    "merge_upsert_documents": merge_upsert_documents,
    "table_diff_documents": table_diff_documents,
    "sliding_distinct_users": sliding_distinct_users,
    "bpe_top_merges": bpe_top_merges,
    "bpe_merges_iter3": bpe_merges_iter3,
    "late_event_audit": late_event_audit,
    "doc_pii_flags": doc_pii_flags,
    "chunk_documents": chunk_documents,
    "doc_repetition_filter": doc_repetition_filter,
    "inverted_index": inverted_index,
    "doc_tfidf_topk": doc_tfidf_topk,
    "q6_discount_revenue": q6_discount_revenue,
    "user_event_deltas": user_event_deltas,
    "decontaminate_docs": decontaminate_docs,
    "doc_quality_gate": doc_quality_gate,
    "customers_with_big_orders": customers_with_big_orders,
    "bloom_semi_lineitems": bloom_semi_lineitems,
    "pack_sequences": pack_sequences,
    "user_retention_cohorts": user_retention_cohorts,
    "q14_promo_revenue": q14_promo_revenue,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q18_large_orders": q18_large_orders,
    "q8_market_share": q8_market_share,
    "q9_nation_profit": q9_nation_profit,
    "q11_important_parts": q11_important_parts,
    "q15_top_supplier": q15_top_supplier,
    "q20_concentrated_suppliers": q20_concentrated_suppliers,
    "q21_sole_return_supplier": q21_sole_return_supplier,
    "scd2_user_value_history": scd2_user_value_history,
    "turn_handoff_latency": turn_handoff_latency,
    "unpivot_doc_metrics": unpivot_doc_metrics,
    "curriculum_order_docs": curriculum_order_docs,
    "cube_orders": cube_orders,
    "span_interval_islands": span_interval_islands,
    "kmv_distinct_tokens_per_source": kmv_distinct_tokens_per_source,
    "zonemap_pruned_scan": zonemap_pruned_scan,
    "zorder_pruned_scan": zorder_pruned_scan,
    "storage_bucketed_join": storage_bucketed_join,
    "winsorized_value_stats": winsorized_value_stats,
    "tool_usage_stats": tool_usage_stats,
    "pareto_frontier_parts": pareto_frontier_parts,
    "rapid_fire_pairs_per_user": rapid_fire_pairs_per_user,
    "ewma_hourly_value_per_type": ewma_hourly_value_per_type,
    "conv_merge_consecutive_roles": conv_merge_consecutive_roles,
    "value_outliers_mad": value_outliers_mad,
    "gapfill_hourly_value_per_type": gapfill_hourly_value_per_type,
    "extraction_quality_report": extraction_quality_report,
    "embedding_centroids_per_label": embedding_centroids_per_label,
    "nearest_centroid_assign": nearest_centroid_assign,
    "pareto_frontier_per_brand": pareto_frontier_per_brand,
    "diverse_topk_docs": diverse_topk_docs,
    "markov_stationary_event_types": markov_stationary_event_types,
    "rfm_user_segments": rfm_user_segments,
    "abc_analysis_parts": abc_analysis_parts,
    "cohort_ltv_curve": cohort_ltv_curve,
    "chi2_type_hour": chi2_type_hour,
    "cluster_canonical_docs": cluster_canonical_docs,
    "funnel_latency_percentiles": funnel_latency_percentiles,
    "lm_transfer_matrix": lm_transfer_matrix,
    "balanced_sample_per_label": balanced_sample_per_label,
    "rendezvous_shard_audit": rendezvous_shard_audit,
    "trending_tokens": trending_tokens,
    "peak_concurrent_sessions": peak_concurrent_sessions,
    "vocab_jaccard_sources": vocab_jaccard_sources,
    "turn_idx_integrity_audit": turn_idx_integrity_audit,
    "token_concentration_per_source": token_concentration_per_source,
    "doc_length_percentile_rank": doc_length_percentile_rank,
    "event_throttle_dedup": event_throttle_dedup,
    "ks_length_drift_per_source": ks_length_drift_per_source,
    "typo_token_clusters": typo_token_clusters,
    "gini_user_activity": gini_user_activity,
    "fano_burstiness_per_type": fano_burstiness_per_type,
    "auto_join_revenue_by_priority": auto_join_revenue_by_priority,
    "markov_conditional_entropy": markov_conditional_entropy,
    "benford_first_digit_orders": benford_first_digit_orders,
    "minhash_eval_pr": minhash_eval_pr,
    "ann_recall_eval": ann_recall_eval,
    "theil_index_user_activity": theil_index_user_activity,
    "fill_rate_by_conv_length": fill_rate_by_conv_length,
    "q7_nation_volume": q7_nation_volume,
    "pivot_events_by_type": pivot_events_by_type,
    "rollup_orders_status_year": rollup_orders_status_year,
    "event_transitions": event_transitions,
    "corr_value_hour_per_type": corr_value_hour_per_type,
    "attribution_click_purchase": attribution_click_purchase,
    "running_revenue_per_customer": running_revenue_per_customer,
    "hll_users_per_type": hll_users_per_type,
    "doc_length_quartile": doc_length_quartile,
    "q4_order_priority": q4_order_priority,
    "props_json_histogram": props_json_histogram,
    "latest_event_per_user": latest_event_per_user,
    "users_click_and_purchase": users_click_and_purchase,
    "cms_token_counts": cms_token_counts,
    "q10_returned_items": q10_returned_items,
    "q13_order_count_distribution": q13_order_count_distribution,
    "q19_bracket_revenue": q19_bracket_revenue,
    "q16_supplier_variety": q16_supplier_variety,
    "q22_dormant_rich_customers": q22_dormant_rich_customers,
    "heavy_hitters_tokens": heavy_hitters_tokens,
    "top_orders_per_priority_dense": top_orders_per_priority_dense,
    "doc_trigram_top20": doc_trigram_top20,
    "semdedup_embeddings": semdedup_embeddings,
    "bitext_mine_pairs": bitext_mine_pairs,
    "doc_token_entropy": doc_token_entropy,
    "events_csv_source": events_csv_source,
    "dedup_containment": dedup_containment,
    "audio_zcr_stats": audio_zcr_stats,
    "audio_spectral_centroid": audio_spectral_centroid,
    "orders_monthly_growth": orders_monthly_growth,
    "event_anomaly_days": event_anomaly_days,
}

_DATE_SQL = "(?i)" + DATE_PATTERN

# ---- NER / simhash / winnow oracle building blocks -----------------------
# DuckDB md5_number_upper(t) == int.from_bytes(md5(t).digest()[:8], "little")
# (verified empirically) — exactly the token hash simhash64 uses, so the
# whole SimHash pipeline is independently recomputable in SQL.


def _sql_quote_set(words) -> str:
    return ",".join(f"'{w}'" for w in sorted(words))


def _ner_gaz_sql() -> tuple[str, str]:
    from .ner import ORG_SUFFIXES, STOP_GAZETTEER

    return _sql_quote_set(STOP_GAZETTEER), _sql_quote_set(ORG_SUFFIXES)


_GAZ_SQL, _SUF_SQL = _ner_gaz_sql()

# token features over upper(text); surface reconstruction joins raw tokens
# with a single space — exact for this corpus (synth docs are single-space
# joined; the Python tagger slices the original string, which is identical
# under that layout)
_NER_FEAT_CTE = rf"""
t AS (
  SELECT doc_id, list_filter(string_split_regex(trim(upper(text)), '\s+'), x -> x <> '') AS toks
  FROM documents
),
tok AS (
  SELECT doc_id, toks[pos] AS tok, pos FROM t, unnest(range(1, len(toks) + 1)) AS r(pos)
),
feat AS (
  SELECT doc_id, tok, pos, rtrim(tok, ':,.') AS core,
         (length(rtrim(tok, ':,.')) >= 2 AND rtrim(tok, ':,.') NOT IN ({_GAZ_SQL})
          AND regexp_matches(rtrim(tok, ':,.'), '^[A-Z][A-Z''.\-]*$')) AS is_name
  FROM tok
)"""

_SIMHASH_CTE = r"""
toks AS (
  SELECT doc_id, unnest(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) AS tok
  FROM documents
),
th AS (SELECT doc_id, md5_number_upper(tok) AS h FROM toks),
bits AS (
  SELECT doc_id, b.bit, sum(CASE WHEN (h >> b.bit) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM th, (SELECT unnest(range(64)) AS bit) b GROUP BY doc_id, b.bit
),
sh AS (
  SELECT doc_id, CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS HUGEINT) << bit) ELSE 0 END) AS UBIGINT) AS simhash
  FROM bits GROUP BY doc_id
),
allsh AS (SELECT d.doc_id, coalesce(sh.simhash, 0) AS simhash FROM documents d LEFT JOIN sh USING (doc_id))"""

def _minhash_cte() -> str:
    """CTE chain recomputing dedup.minhash_lsh_pairs (128 perms, 16 bands,
    3-gram shingles, est_sim >= 0.9) entirely in SQL. The permutation
    constants are exported verbatim from RandomState(7) — the same values
    MinHasher builds — so signatures match component-for-component; band
    candidates group on the exact 8-tuple (est >= 0.9 forces >= 4 fully
    matching bands, so tuple-grouping and the Ray path's hashed banding
    yield the same post-filter pair set; see dedup.minhash_lsh_pairs)."""
    p31 = (1 << 31) - 1
    rng = np.random.RandomState(7)
    a = rng.randint(1, p31, size=128, dtype=np.uint64)
    b = rng.randint(0, p31, size=128, dtype=np.uint64)
    vals = ", ".join(
        f"({p}, {int(a[p])}, {int(b[p])})" for p in range(128)
    )
    return rf"""ab AS (SELECT * FROM (VALUES {vals}) AS t(p, a, b)),
        mh_tk AS (SELECT doc_id,
                         list_filter(string_split_regex(trim(text), '\s+'),
                                     x -> x <> '') AS toks
                  FROM documents),
        mh_sh AS (SELECT DISTINCT doc_id, array_to_string(toks[i:i+2], ' ') AS s
                  FROM mh_tk, unnest(range(1, len(toks) - 1)) AS r(i)
                  WHERE len(toks) >= 3),
        mh_hv AS (SELECT DISTINCT doc_id,
                         CAST(md5_number_upper(s) & 2147483647 AS BIGINT) AS h
                  FROM mh_sh),
        mh_sig AS (SELECT mh_hv.doc_id, ab.p,
                          min((ab.a * mh_hv.h + ab.b) % 2147483647) AS v
                   FROM mh_hv, ab GROUP BY 1, 2),
        mh_bk AS (SELECT doc_id, CAST(p // 8 AS BIGINT) AS band,
                         string_agg(CAST(v AS VARCHAR), ',' ORDER BY p) AS key
                  FROM mh_sig GROUP BY 1, 2),
        mh_cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
                    FROM mh_bk x JOIN mh_bk y
                      ON x.band = y.band AND x.key = y.key
                         AND x.doc_id < y.doc_id),
        mh_mm AS (SELECT c.doc_a, c.doc_b,
                         sum(CASE WHEN sa.v = sb.v THEN 1 ELSE 0 END) AS m
                  FROM mh_cand c
                  JOIN mh_sig sa ON sa.doc_id = c.doc_a
                  JOIN mh_sig sb ON sb.doc_id = c.doc_b AND sb.p = sa.p
                  GROUP BY 1, 2),
        mpairs AS (SELECT doc_a, doc_b, m / 128.0 AS est_sim
                   FROM mh_mm WHERE m / 128.0 >= 0.9)"""


_MINHASH_CTE = _minhash_cte()

SQL: dict[str, str] = {
    "dedup_minhash": f"""
        WITH {_MINHASH_CTE}
        SELECT doc_a, doc_b, est_sim FROM mpairs
    """,
    "curate_corpus_v2": r"""
        WITH t AS (
          SELECT doc_id, lang,
                 list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
          FROM documents
        ),
        terms AS (
          SELECT doc_id, lang, tok AS term
          FROM (SELECT doc_id, lang, unnest(toks) AS tok FROM t)
          UNION ALL
          SELECT doc_id, lang, toks[i] || ' ' || toks[i+1] AS term
          FROM t, unnest(range(1, len(toks))) AS r(i)
        ),
        tb AS (
          SELECT doc_id, lang,
                 CAST(md5_number_upper(term) % 4096 AS BIGINT) AS b
          FROM terms
        ),
        nq AS (SELECT b, count(*) AS n FROM tb WHERE lang <> 'en' GROUP BY b),
        nt AS (SELECT b, count(*) AS n FROM tb WHERE lang = 'en' GROUP BY b),
        tot AS (SELECT (SELECT count(*) FROM tb WHERE lang <> 'en') AS q_total,
                       (SELECT count(*) FROM tb WHERE lang = 'en') AS t_total),
        scored AS (
          SELECT tb.doc_id,
                 CAST(round((ln((coalesce(nt.n, 0) + 1.0) / (tot.t_total + 4096))
                           - ln((coalesce(nq.n, 0) + 1.0) / (tot.q_total + 4096))) * 1e6) AS BIGINT) AS lp
          FROM tb
          LEFT JOIN nq USING (b)
          LEFT JOIN nt USING (b)
          CROSS JOIN tot
        ),
        dsel AS (SELECT doc_id, CAST(sum(lp) AS BIGINT) AS s
                 FROM scored GROUP BY 1),
        m AS (
          SELECT d.doc_id,
                 len(t.toks) AS n,
                 len(list_filter(t.toks, w -> w IN
                   ('the','a','and','of','to','in','is','for','on','with'))) AS stop_cnt,
                 COALESCE(list_max(list_transform(t.toks, w -> len(w))), 0) AS maxw,
                 length(d.text) - length(regexp_replace(d.text, '[#@$%^*=<>{}\[\]\\]', '', 'g')) AS sym,
                 length(d.text) AS chars,
                 len(list_filter(string_split_regex(d.text, '[.!?]'),
                                 s2 -> trim(s2) <> '')) AS ns,
                 len(regexp_extract_all(d.text, '[aeiouyAEIOUY]+')) AS sy
          FROM documents d JOIN t ON t.doc_id = d.doc_id
        )
        SELECT doc_id, ok_quality, ok_lang, ok_dsir, ok_read,
               ok_quality * ok_lang * ok_dsir * ok_read AS keep
        FROM (
          SELECT m.doc_id,
                 CAST(m.n >= 5 AND m.n <= 10000 AND m.stop_cnt >= 1
                      AND m.maxw <= 30
                      AND m.sym * 10 < greatest(m.chars, 1) * 3 AS BIGINT) AS ok_quality,
                 CAST(m.n > 0 AND m.stop_cnt * 20 >= m.n AS BIGINT) AS ok_lang,
                 CAST(coalesce(dsel.s, 0) > 0 AS BIGINT) AS ok_dsir,
                 CAST(m.ns >= 1 AND m.sy <= 4 * m.n AS BIGINT) AS ok_read
          FROM m LEFT JOIN dsel USING (doc_id)
        )
    """,
    "doc_readability_stats": r"""
        SELECT doc_id,
               CAST(len(list_filter(string_split_regex(text, '[.!?]'),
                                    s -> trim(s) <> '')) AS BIGINT)
                   AS n_sentences,
               CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
                                    x -> x <> '')) AS BIGINT) AS n_words,
               CAST(len(regexp_extract_all(text, '[aeiouyAEIOUY]+'))
                    AS BIGINT) AS n_syllables
        FROM documents
    """,
    "contrastive_triplets": f"""
        WITH {_MINHASH_CTE},
        nn AS (SELECT max(doc_id) + 1 AS n FROM documents),
        c AS (SELECT p.doc_a AS anchor, p.doc_b AS positive,
                     CAST(md5_number_upper(CAST(p.doc_a AS VARCHAR) || ':' ||
                                           CAST(p.doc_b AS VARCHAR)) % nn.n
                          AS BIGINT) AS c0,
                     nn.n AS n
              FROM mpairs p CROSS JOIN nn)
        SELECT anchor, positive,
               CAST(CASE WHEN c0 <> anchor AND c0 <> positive THEN c0
                         WHEN (c0 + 1) % n <> anchor AND (c0 + 1) % n <> positive
                           THEN (c0 + 1) % n
                         ELSE (c0 + 2) % n END AS BIGINT) AS negative
        FROM c
    """,
    "cross_source_leakage": f"""
        WITH {_MINHASH_CTE}
        SELECT least(da.source, db.source) AS source_a,
               greatest(da.source, db.source) AS source_b,
               CAST(count(*) AS BIGINT) AS n_pairs
        FROM mpairs p
        JOIN documents da ON da.doc_id = p.doc_a
        JOIN documents db ON db.doc_id = p.doc_b
        GROUP BY 1, 2
    """,
    "dedup_minhash_clusters": f"""
        WITH RECURSIVE {_MINHASH_CTE},
        mh_e AS (SELECT doc_a AS u, doc_b AS v FROM mpairs
                 UNION SELECT doc_b, doc_a FROM mpairs),
        mh_reach(node, r) AS (
          SELECT u, u FROM mh_e
          UNION
          SELECT mh_e.u, mh_reach.r FROM mh_e
          JOIN mh_reach ON mh_e.v = mh_reach.node
        )
        SELECT node AS doc_id, CAST(min(r) AS BIGINT) AS cluster_id
        FROM mh_reach GROUP BY node
    """,
    "q14_promo_revenue": """
        WITH l AS (SELECT CAST(round(l_extendedprice * (1 - l_discount) * 100)
                               AS BIGINT) AS cents,
                          l_partkey
                   FROM lineitem
                   WHERE l_shipdate >= DATE '1996-01-01'
                     AND l_shipdate < DATE '1997-01-01')
        SELECT CAST(sum(CASE WHEN p.p_type = 'PROMO' THEN l.cents ELSE 0 END)
                    AS BIGINT) AS promo_cents,
               CAST(sum(l.cents) AS BIGINT) AS total_cents,
               CAST((10000 * sum(CASE WHEN p.p_type = 'PROMO' THEN l.cents
                                      ELSE 0 END)
                     + sum(l.cents) // 2) // sum(l.cents) AS BIGINT) AS promo_bp
        FROM l JOIN part p ON l.l_partkey = p.p_partkey
    """,
    "q17_small_quantity_revenue": """
        WITH b AS (SELECT min(p_brand) AS brand FROM part),
             pk AS (SELECT p_partkey FROM part, b WHERE p_brand = b.brand),
             st AS (SELECT l_partkey AS spk,
                           sum(CAST(round(l_quantity) AS BIGINT)) AS sq,
                           CAST(count(*) AS BIGINT) AS cnt
                    FROM lineitem JOIN pk ON l_partkey = p_partkey
                    GROUP BY l_partkey),
             r AS (SELECT CAST(round(l.l_extendedprice * 100) AS BIGINT) AS cents
                   FROM lineitem l JOIN st ON l.l_partkey = st.spk
                   WHERE 5 * CAST(round(l.l_quantity) AS BIGINT) * st.cnt < st.sq)
        SELECT CAST(coalesce(sum(cents), 0) AS BIGINT) AS lost_cents,
               CAST(coalesce(sum(cents), 0) // 7 AS BIGINT) AS avg_yearly_cents
        FROM r
    """,
    "q18_large_orders": """
        SELECT c.c_name, c.c_custkey, o.o_orderkey,
               strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
               CAST(round(o.o_totalprice * 100) AS BIGINT) AS total_cents,
               CAST(s.sum_qty AS BIGINT) AS sum_qty
        FROM (SELECT l_orderkey,
                     sum(CAST(round(l_quantity) AS BIGINT)) AS sum_qty
              FROM lineitem GROUP BY l_orderkey
              HAVING sum(CAST(round(l_quantity) AS BIGINT)) > 250) s
        JOIN orders o ON s.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
    """,
    "q8_market_share": """
        WITH reg AS (SELECT r_regionkey FROM region
                     WHERE r_name = (SELECT min(r_name) FROM region)),
             cust AS (SELECT c_custkey FROM customer
                      WHERE c_nationkey IN (SELECT n_nationkey FROM nation
                                            JOIN reg ON n_regionkey
                                                        = r_regionkey)),
             tsup AS (SELECT s_suppkey FROM supplier
                      JOIN nation ON s_nationkey = n_nationkey
                      WHERE n_name = (SELECT min(n_name) FROM nation)),
             pk AS (SELECT p_partkey FROM part
                    WHERE p_type = (SELECT min(p_type) FROM part)),
             base AS (
               SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
                      CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                           AS BIGINT) AS cents,
                      CASE WHEN l.l_suppkey IN (SELECT s_suppkey FROM tsup)
                           THEN CAST(round(l.l_extendedprice
                                           * (1 - l.l_discount) * 100) AS BIGINT)
                           ELSE 0 END AS t_cents
               FROM lineitem l
               JOIN orders o ON l.l_orderkey = o.o_orderkey
               JOIN pk ON l.l_partkey = pk.p_partkey
               WHERE o.o_orderdate >= DATE '1996-01-01'
                 AND o.o_orderdate < DATE '1998-01-01'
                 AND o.o_custkey IN (SELECT c_custkey FROM cust))
        SELECT o_year,
               CAST(sum(t_cents) AS BIGINT) AS target_cents,
               CAST(sum(cents) AS BIGINT) AS total_cents,
               CAST(CASE WHEN sum(cents) > 0
                         THEN (10000 * sum(t_cents) + sum(cents) // 2)
                              // sum(cents)
                         ELSE 0 END AS BIGINT) AS share_bp
        FROM base GROUP BY o_year
    """,
    "q9_nation_profit": """
        WITH sel AS (SELECT p_partkey,
                            CAST(round(p_retailprice * 100) AS BIGINT) AS cost
                     FROM part WHERE p_name LIKE '%a%'),
             sn AS (SELECT s_suppkey, n_name FROM supplier
                    JOIN nation ON s_nationkey = n_nationkey)
        SELECT sn.n_name AS nation,
               CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
               CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                             AS BIGINT)
                        - sel.cost * CAST(round(l.l_quantity) AS BIGINT))
                    AS BIGINT) AS profit_cents
        FROM lineitem l
        JOIN sel ON l.l_partkey = sel.p_partkey
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN sn ON l.l_suppkey = sn.s_suppkey
        GROUP BY 1, 2
    """,
    "q11_important_parts": """
        WITH ns AS (SELECT s_suppkey FROM supplier
                    JOIN nation ON s_nationkey = n_nationkey
                    WHERE n_name = (SELECT min(n_name) FROM nation)),
             pv AS (SELECT l_partkey AS p_partkey,
                           sum(CAST(round(l_quantity) AS BIGINT)
                               * CAST(round(p_retailprice * 100) AS BIGINT))
                             AS value_cents
                    FROM lineitem JOIN part ON l_partkey = p_partkey
                    WHERE l_suppkey IN (SELECT s_suppkey FROM ns)
                    GROUP BY l_partkey)
        SELECT p_partkey, CAST(value_cents AS BIGINT) AS value_cents
        FROM pv WHERE 1000 * value_cents > (SELECT sum(value_cents) FROM pv)
    """,
    "q15_top_supplier": """
        WITH rev AS (SELECT l_suppkey AS s_suppkey,
                            sum(CAST(round(l_extendedprice * (1 - l_discount)
                                           * 100) AS BIGINT)) AS cents
                     FROM lineitem
                     WHERE l_shipdate >= DATE '1996-01-01'
                       AND l_shipdate < DATE '1996-04-01'
                     GROUP BY 1)
        SELECT r.s_suppkey, s.s_name, CAST(r.cents AS BIGINT) AS total_cents
        FROM rev r JOIN supplier s USING (s_suppkey)
        WHERE r.cents = (SELECT max(cents) FROM rev)
    """,
    "q20_concentrated_suppliers": """
        WITH fam AS (SELECT p_partkey FROM part
                     WHERE substr(p_name, 1, 1) =
                           (SELECT substr(min(p_name), 1, 1) FROM part)),
             ps AS (SELECT l_partkey AS pk, l_suppkey AS sk,
                           sum(CAST(round(l_quantity) AS BIGINT)) AS q
                    FROM lineitem JOIN fam ON l_partkey = p_partkey
                    GROUP BY 1, 2),
             pt AS (SELECT pk, sum(q) AS tq, count(*) AS nsup FROM ps GROUP BY 1),
             hit AS (SELECT ps.sk FROM ps JOIN pt USING (pk)
                     WHERE 2 * pt.tq < ps.q * pt.nsup)
        SELECT s.s_suppkey, s.s_name, CAST(count(*) AS BIGINT) AS n_parts
        FROM hit JOIN supplier s ON hit.sk = s.s_suppkey
        GROUP BY 1, 2
    """,
    "q21_sole_return_supplier": """
        WITH ps AS (SELECT l_orderkey AS ok, l_suppkey AS sk,
                           sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                             AS r
                    FROM lineitem GROUP BY 1, 2),
             o AS (SELECT ok, count(*) AS nsup,
                          sum(CASE WHEN r > 0 THEN 1 ELSE 0 END) AS nret
                   FROM ps GROUP BY 1),
             hit AS (SELECT ps.sk FROM ps JOIN o USING (ok)
                     WHERE o.nsup >= 2 AND o.nret = 1 AND ps.r > 0)
        SELECT s.s_suppkey, s.s_name, CAST(count(*) AS BIGINT) AS numwait
        FROM hit JOIN supplier s ON hit.sk = s.s_suppkey
        GROUP BY 1, 2
    """,
    "q7_nation_volume": """
        SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
               CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS ship_year,
               CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                             AS BIGINT)) AS BIGINT) AS revenue_cents
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        WHERE l.l_shipdate >= DATE '1996-01-01'
          AND l.l_shipdate < DATE '1998-01-01'
        GROUP BY 1, 2, 3
    """,
    "user_retention_cohorts": """
        WITH p AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS d
                   FROM events),
        c AS (SELECT user_id, min(d) AS cd FROM p GROUP BY user_id)
        SELECT strftime(c.cd, '%Y-%m-%d') AS cohort_day,
               CAST(date_diff('day', c.cd, p.d) AS BIGINT) AS offset_days,
               CAST(count(DISTINCT p.user_id) AS BIGINT) AS n_users
        FROM p JOIN c USING (user_id)
        GROUP BY 1, 2
    """,
    "pack_sequences": r"""
        WITH t AS (SELECT doc_id,
                          len(list_filter(string_split_regex(trim(text), '\s+'),
                                          x -> x <> '')) AS n_tokens
                   FROM documents)
        SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    // 256 AS BIGINT) AS bin_id
        FROM t
    """,
    "bloom_semi_lineitems": """
        SELECT l.l_orderkey, CAST(count(*) AS BIGINT) AS n_items,
               CAST(sum(CAST(round(l.l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_totalprice > 475000
        GROUP BY l.l_orderkey
    """,
    "dedup_simhash": f"WITH {_SIMHASH_CTE}\nSELECT doc_id, simhash FROM allsh",
    "dedup_simhash_pairs": f"""
        WITH {_SIMHASH_CTE}
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
        FROM allsh a JOIN allsh b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
          AND ((a.simhash & 65535) = (b.simhash & 65535)
            OR ((a.simhash >> 16) & 65535) = ((b.simhash >> 16) & 65535)
            OR ((a.simhash >> 32) & 65535) = ((b.simhash >> 32) & 65535)
            OR ((a.simhash >> 48) & 65535) = ((b.simhash >> 48) & 65535))
    """,
    "f5_person_ner": f"""
        WITH {_NER_FEAT_CTE},
        runs AS (
          SELECT *, CASE WHEN is_name AND NOT coalesce(lag(is_name) OVER (PARTITION BY doc_id ORDER BY pos), false)
                         THEN 1 ELSE 0 END AS run_start
          FROM feat
        ),
        rid AS (
          SELECT *, sum(run_start) OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS run_id
          FROM runs WHERE is_name
        ),
        rstat AS (
          SELECT doc_id, run_id, min(pos) AS p0, count(*) AS n FROM rid GROUP BY doc_id, run_id
        ),
        firstrun AS (
          SELECT doc_id, p0, least(n, 4) AS take
          FROM (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY p0) AS rn FROM rstat WHERE n >= 2)
          WHERE rn = 1
        ),
        surface AS (
          SELECT f.doc_id, string_agg(tok.tok, ' ' ORDER BY tok.pos) AS person
          FROM firstrun f JOIN tok ON tok.doc_id = f.doc_id AND tok.pos BETWEEN f.p0 AND f.p0 + f.take - 1
          GROUP BY f.doc_id
        )
        SELECT d.doc_id, s.person FROM documents d LEFT JOIN surface s USING (doc_id)
    """,
    "f6_org_ner": f"""
        WITH {_NER_FEAT_CTE},
        suf AS (SELECT doc_id, min(pos) AS k FROM feat WHERE core IN ({_SUF_SQL}) GROUP BY doc_id),
        ext AS (
          SELECT s.doc_id, s.k,
                 greatest(1, s.k - 4,
                   coalesce(max(CASE WHEN NOT (f.is_name OR f.core = '&') THEN f.pos END) + 1, 1)) AS i0
          FROM suf s LEFT JOIN feat f ON f.doc_id = s.doc_id AND f.pos BETWEEN s.k - 4 AND s.k - 1
          GROUP BY s.doc_id, s.k
        ),
        surface AS (
          SELECT e.doc_id, string_agg(tok.tok, ' ' ORDER BY tok.pos) AS org
          FROM ext e JOIN tok ON tok.doc_id = e.doc_id AND tok.pos BETWEEN e.i0 AND e.k
          GROUP BY e.doc_id
        )
        SELECT d.doc_id, s.org FROM documents d LEFT JOIN surface s USING (doc_id)
    """,
    "table_checksum_documents": """
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(md5_number_upper(CAST(doc_id AS VARCHAR) || '|' ||
                                         coalesce(text, ''))
                        % 2305843009213693951)
                    % 2305843009213693951 AS BIGINT) AS checksum
        FROM documents
    """,
    "weighted_sample_docs": """
        SELECT doc_id,
               CAST((md5_number_upper(CAST(doc_id AS VARCHAR))
                     % 4611686018427387904) // (n_chars + 1) AS BIGINT)
                 AS priority,
               n_chars
        FROM documents
        ORDER BY priority, doc_id LIMIT 64
    """,
    "funnel_view_click_purchase": """
        WITH o AS (
          SELECT user_id, ts, event_id, event_type,
                 lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
          FROM events
        ), s AS (
          SELECT user_id, ts, event_id, event_type,
                 sum(CASE WHEN prev IS NULL OR epoch(ts) - epoch(prev) > 1800
                          THEN 1 ELSE 0 END) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS sid
          FROM o
        ), r AS (
          SELECT user_id, sid, event_type,
                 row_number() OVER (PARTITION BY user_id, sid
                                    ORDER BY ts, event_id) AS rn
          FROM s
        ),
        v AS (SELECT user_id, sid, min(rn) AS vrn FROM r
              WHERE event_type = 'view' GROUP BY 1, 2),
        c AS (SELECT r.user_id, r.sid, min(rn) AS crn
              FROM r JOIN v USING (user_id, sid)
              WHERE event_type = 'click' AND rn > vrn GROUP BY 1, 2),
        p AS (SELECT r.user_id, r.sid
              FROM r JOIN c USING (user_id, sid)
              WHERE event_type = 'purchase' AND rn > crn GROUP BY 1, 2),
        tot AS (SELECT count(*) AS t FROM (SELECT DISTINCT user_id, sid FROM s)),
        cv AS (SELECT count(*) AS c FROM p)
        SELECT CAST(tot.t AS BIGINT) AS n_sessions,
               CAST(cv.c AS BIGINT) AS n_converted,
               CAST((10000 * cv.c + tot.t // 2) // tot.t AS BIGINT) AS conv_bp
        FROM tot, cv
    """,
    "quantize_embeddings_int8": """
        WITH x AS (SELECT vec_id, unnest(range(len(embedding))) AS i,
                          CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                               AS BIGINT) AS xi
                   FROM embeddings),
        st AS (SELECT i, min(xi) AS lo, greatest(max(xi) - min(xi), 1) AS rng
               FROM x GROUP BY i),
        c AS (SELECT x.vec_id, (x.xi - st.lo) * 254 // st.rng - 127 AS code
              FROM x JOIN st USING (i))
        SELECT vec_id, CAST(sum(code) AS BIGINT) AS code_sum,
               CAST(min(code) AS BIGINT) AS code_min,
               CAST(max(code) AS BIGINT) AS code_max
        FROM c GROUP BY vec_id
    """,
    "doc_pii_flags": r"""
        SELECT doc_id,
               CAST(len(regexp_extract_all(coalesce(text, ''),
                    '[A-Za-z0-9._]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
                 AS n_emails,
               CAST(len(regexp_extract_all(coalesce(text, ''),
                    '\d{3}-\d{3}-\d{4}')) AS BIGINT) AS n_phones,
               CAST(len(regexp_extract_all(coalesce(text, ''),
                    '\d{3}-\d{2}-\d{4}')) AS BIGINT) AS n_ssn
        FROM documents
    """,
    "late_event_audit": """
        WITH w AS (
          SELECT ts,
                 max(ts) OVER (ORDER BY event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND 1 PRECEDING) AS wm
          FROM events
        )
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(CASE WHEN wm IS NOT NULL
                              AND ts < wm - INTERVAL 600 SECOND
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_late
        FROM w GROUP BY 1
    """,
    "sliding_distinct_users": """
        WITH e AS (
          SELECT date_trunc('minute', ts) - INTERVAL (EXTRACT(minute FROM ts)::INT % 30) MINUTE
                   AS t30,
                 user_id
          FROM events
        ), x AS (
          SELECT t30 AS w, user_id FROM e
          UNION ALL
          SELECT t30 - INTERVAL 30 MINUTE, user_id FROM e
        )
        SELECT strftime(w, '%Y-%m-%d %H:%M:00') AS window_start,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        FROM x GROUP BY 1
    """,
    "bpe_top_merges": r"""
        WITH toks AS (SELECT unnest(list_filter(
                        string_split_regex(trim(text), '\s+'), x -> x <> ''))
                        AS tok
                      FROM documents),
        p AS (SELECT substr(tok, i, 2) AS pair
              FROM toks, unnest(range(1, length(tok))) AS r(i))
        SELECT pair, CAST(count(*) AS BIGINT) AS n
        FROM p GROUP BY pair ORDER BY n DESC, pair LIMIT 20
    """,
    "bpe_merges_iter3": r"""
        WITH toks AS (SELECT unnest(list_filter(
                        string_split_regex(trim(text), '\s+'), x -> x <> ''))
                        AS tok
                      FROM documents),
        s0 AS (SELECT ' ' || array_to_string(string_split(tok, ''), ' ') || ' '
                        AS s FROM toks),
        p1 AS (SELECT sy[i] AS l, sy[i+1] AS r, count(*) AS n
               FROM (SELECT list_filter(string_split(s, ' '), x -> x <> '')
                       AS sy FROM s0),
                    unnest(range(1, len(sy))) AS t(i)
               GROUP BY 1, 2),
        m1 AS (SELECT l, r, n FROM p1 ORDER BY n DESC, l, r LIMIT 1),
        s1 AS (SELECT replace(s,
                 ' ' || (SELECT l FROM m1) || ' ' || (SELECT r FROM m1) || ' ',
                 ' ' || (SELECT l FROM m1) || (SELECT r FROM m1) || ' ') AS s
               FROM s0),
        p2 AS (SELECT sy[i] AS l, sy[i+1] AS r, count(*) AS n
               FROM (SELECT list_filter(string_split(s, ' '), x -> x <> '')
                       AS sy FROM s1),
                    unnest(range(1, len(sy))) AS t(i)
               GROUP BY 1, 2),
        m2 AS (SELECT l, r, n FROM p2 ORDER BY n DESC, l, r LIMIT 1),
        s2 AS (SELECT replace(s,
                 ' ' || (SELECT l FROM m2) || ' ' || (SELECT r FROM m2) || ' ',
                 ' ' || (SELECT l FROM m2) || (SELECT r FROM m2) || ' ') AS s
               FROM s1),
        p3 AS (SELECT sy[i] AS l, sy[i+1] AS r, count(*) AS n
               FROM (SELECT list_filter(string_split(s, ' '), x -> x <> '')
                       AS sy FROM s2),
                    unnest(range(1, len(sy))) AS t(i)
               GROUP BY 1, 2),
        m3 AS (SELECT l, r, n FROM p3 ORDER BY n DESC, l, r LIMIT 1)
        SELECT CAST(1 AS BIGINT) AS iter, l AS left_sym, r AS right_sym,
               CAST(n AS BIGINT) AS n FROM m1
        UNION ALL SELECT 2, l, r, CAST(n AS BIGINT) FROM m2
        UNION ALL SELECT 3, l, r, CAST(n AS BIGINT) FROM m3
    """,
    "dedup_incremental": """
        WITH newd AS (SELECT doc_id, md5(coalesce(text, '')) AS h
                      FROM documents WHERE doc_id % 4 = 3),
        prior AS (SELECT DISTINCT md5(coalesce(text, '')) AS h
                  FROM documents WHERE doc_id % 4 <> 3)
        SELECT CAST(min(doc_id) AS BIGINT) AS doc_id, h AS text_hash
        FROM newd WHERE h NOT IN (SELECT h FROM prior)
        GROUP BY h
    """,
    "merge_upsert_documents": """
        WITH base AS (SELECT doc_id, text FROM documents),
        upd AS (SELECT doc_id, text || ' U2' AS text FROM base
                WHERE doc_id % 7 <> 0 AND doc_id % 5 = 0),
        del AS (SELECT doc_id FROM base WHERE doc_id % 7 = 0),
        ins AS (SELECT doc_id + 10000000 AS doc_id, text || ' NEW' AS text
                FROM base WHERE doc_id % 11 = 0)
        SELECT b.doc_id, b.text, 'kept' AS op
        FROM base b
        WHERE b.doc_id NOT IN (SELECT doc_id FROM del)
          AND b.doc_id NOT IN (SELECT doc_id FROM upd)
        UNION ALL
        SELECT doc_id, text, 'updated' AS op FROM upd
        UNION ALL
        SELECT doc_id, text, 'inserted' AS op FROM ins
    """,
    "table_diff_documents": """
        WITH v1 AS (SELECT doc_id, md5(coalesce(text, '')) AS h FROM documents),
        v2 AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 5 = 0 THEN md5(upper(coalesce(text, '')))
                      ELSE md5(coalesce(text, '')) END AS h
          FROM documents WHERE doc_id % 7 <> 0
          UNION ALL
          SELECT doc_id + 10000000, md5(coalesce(text, '') || ' v2')
          FROM documents WHERE doc_id % 11 = 0
        )
        SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id,
               CASE WHEN v2.doc_id IS NULL THEN 'removed'
                    WHEN v1.doc_id IS NULL THEN 'added'
                    ELSE 'changed' END AS status
        FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
        WHERE v2.doc_id IS NULL OR v1.doc_id IS NULL OR v1.h <> v2.h
    """,
    "embedding_lsh_buckets": """
        WITH signs AS (
          SELECT j, i, CASE WHEN md5_number_upper(CAST(j AS VARCHAR) || ':' ||
                                                  CAST(i AS VARCHAR)) % 2 = 1
                            THEN 1 ELSE -1 END AS s
          FROM (SELECT unnest(range(16)) AS j), (SELECT unnest(range(64)) AS i)
        ),
        x AS (SELECT vec_id, unnest(range(len(embedding))) AS i,
                     CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                          AS BIGINT) AS xi
              FROM embeddings),
        dots AS (SELECT x.vec_id, s.j, sum(s.s * x.xi) AS d
                 FROM x JOIN signs s ON x.i = s.i GROUP BY 1, 2),
        b AS (SELECT vec_id,
                     CAST(sum(CASE WHEN d >= 0 THEN 1 << j ELSE 0 END)
                          AS BIGINT) AS bucket_id
              FROM dots GROUP BY 1)
        SELECT bucket_id, CAST(count(*) AS BIGINT) AS n_vectors
        FROM b GROUP BY 1
    """,
    "orders_enriched": """
        SELECT o.o_orderkey, CAST(round(o.o_totalprice * 100) AS BIGINT)
                 AS total_cents,
               c.c_name, c.c_mktsegment
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
    "fk_integrity_audit": """
        SELECT 'customer.nationkey->nation' AS relationship,
               CAST(count(*) FILTER (n.n_nationkey IS NULL) AS BIGINT) AS n_orphans
        FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
        UNION ALL
        SELECT 'supplier.nationkey->nation',
               CAST(count(*) FILTER (n.n_nationkey IS NULL) AS BIGINT)
        FROM supplier s LEFT JOIN nation n ON s.s_nationkey = n.n_nationkey
        UNION ALL
        SELECT 'lineitem.partkey->part',
               CAST(count(*) FILTER (p.p_partkey IS NULL) AS BIGINT)
        FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
        UNION ALL
        SELECT 'lineitem.suppkey->supplier',
               CAST(count(*) FILTER (s.s_suppkey IS NULL) AS BIGINT)
        FROM lineitem l LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
        UNION ALL
        SELECT 'orders.custkey->customer',
               CAST(count(*) FILTER (c.c_custkey IS NULL) AS BIGINT)
        FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        UNION ALL
        SELECT 'lineitem.orderkey->orders',
               CAST(count(*) FILTER (o.o_orderkey IS NULL) AS BIGINT)
        FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
        ORDER BY relationship
    """,
    "event_path_trigrams": """
        WITH w AS (SELECT user_id, event_type AS e1,
                          lead(event_type, 1) OVER (PARTITION BY user_id
                                                    ORDER BY ts, event_id) AS e2,
                          lead(event_type, 2) OVER (PARTITION BY user_id
                                                    ORDER BY ts, event_id) AS e3
                   FROM events)
        SELECT e1 || '>' || e2 || '>' || e3 AS path, CAST(count(*) AS BIGINT) AS n
        FROM w WHERE e3 IS NOT NULL
        GROUP BY 1 ORDER BY n DESC, path LIMIT 20
    """,
    "ohlc_value_per_type_hour": """
        WITH e AS (SELECT event_type, date_trunc('hour', ts) AS h, ts, event_id,
                          CAST(round(value * 100) AS BIGINT) AS cents
                   FROM events),
        w AS (SELECT *,
                     row_number() OVER (PARTITION BY event_type, h
                                        ORDER BY ts, event_id) AS rn_a,
                     row_number() OVER (PARTITION BY event_type, h
                                        ORDER BY ts DESC, event_id DESC) AS rn_d
              FROM e)
        SELECT event_type, strftime(h, '%Y-%m-%d %H:00:00') AS hour,
               CAST(max(CASE WHEN rn_a = 1 THEN cents END) AS BIGINT) AS open_cents,
               CAST(max(cents) AS BIGINT) AS high_cents,
               CAST(min(cents) AS BIGINT) AS low_cents,
               CAST(max(CASE WHEN rn_d = 1 THEN cents END) AS BIGINT) AS close_cents,
               CAST(count(*) AS BIGINT) AS n
        FROM w GROUP BY 1, 2
    """,
    "transcript_turn_stats": r"""
        WITH d AS (SELECT doc_id,
                          'doc-' || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS conv_id,
                          doc_id % 3 = 0 AS has_p,
                          len(list_filter(string_split_regex(trim(text), '\s+'),
                                          x -> x <> '')) AS ntok
                   FROM documents)
        SELECT conv_id,
               CAST(1 + CASE WHEN has_p THEN 1 ELSE 0 END
                    + greatest(1, CAST(ceil(ntok / 12.0) AS BIGINT)) AS BIGINT)
                 AS n_turns,
               CAST(8 + CASE WHEN has_p THEN 6 ELSE 0 END + ntok AS BIGINT)
                 AS n_tokens,
               CAST(greatest(8, least(ntok, 12)) AS BIGINT) AS max_turn_tokens
        FROM d
    """,
    "transcript_extract": r"""WITH d AS (
          SELECT doc_id,
                 'doc-' || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS conv_id,
                 'INVOICE 1' || lpad(CAST(doc_id AS VARCHAR), 5, '0') || ' DATE ' ||
                   printf('%02d/%02d/%d', doc_id % 12 + 1, doc_id % 28 + 1, 1990 + doc_id % 30) ||
                   ' REFERENCE AB' || CAST(doc_id AS VARCHAR) || 'X TOTAL $' ||
                   CAST(doc_id % 900 + 100 AS VARCHAR) || '.25' AS header,
                 CASE WHEN doc_id % 3 = 0 THEN
                   'PATIENT NAME ' ||
                   (['MARY','JOHN','ALICE','ROBERT','LINDA'])[CAST(doc_id // 3 AS INT) % 5 + 1] || ' ' ||
                   (['SMITH','JONES','TAYLOR','BROWN','WILSON'])[CAST(doc_id // 7 AS INT) % 5 + 1] ||
                   ' DOB ' || printf('%02d/%02d/%d', doc_id % 12 + 1, doc_id % 25 + 1, 1975 + doc_id % 40)
                 END AS pline,
                 len(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) AS ntok
          FROM documents
        )
        SELECT conv_id,
               CASE WHEN pline IS NOT NULL THEN
                 regexp_extract(pline, 'PATIENT NAME ([A-Z]+ [A-Z]+) DOB', 1) END AS patient_name,
               CASE WHEN pline IS NOT NULL THEN
                 nullif(regexp_extract(pline, '%%DATE%%'), '') END AS patient_birthdate,
               CASE WHEN regexp_matches(header, '\b(INVOICE)(\W+|\s+)(\d+)\b')
                    THEN regexp_extract(header, '[.\d]+') END AS invoice_number,
               CASE WHEN contains(header, 'DATE') AND NOT regexp_matches(header, 'DUE.*DATE')
                    THEN nullif(regexp_extract(header, '%%DATE%%'), '') END AS invoice_date,
               nullif(regexp_extract(header, '\b(LOAD|REFERENCE)\W+(\w+\d+\w+)', 2), '') AS order_number,
               CASE WHEN regexp_matches(header, '\b(TOTAL|RATE|BALANCE DUE)\W+\$\d+(,\d{3})*(\.\d{2})?')
                    THEN trim(regexp_replace(
                           regexp_extract(header, '\b(TOTAL|RATE|BALANCE DUE)\W+\$\d+(,\d{3})*(\.\d{2})?'),
                           'TOTAL|RATE|BALANCE|DUE', '', 'g')) END AS gross_total,
               CAST(NULL AS VARCHAR) AS vendor_name,
               CASE WHEN pline IS NOT NULL THEN 1.0 END AS patient_name_turn,
               CASE WHEN pline IS NOT NULL THEN 1.0 END AS patient_birthdate_turn,
               CAST(0 AS BIGINT) AS invoice_number_turn,
               CAST(0 AS BIGINT) AS invoice_date_turn,
               CAST(0 AS BIGINT) AS order_number_turn,
               CAST(NULL AS DOUBLE) AS vendor_name_turn,
               CAST(0 AS BIGINT) AS gross_total_turn,
               100.0 AS mean_confidence,
               '100.00' AS confidence_fmt,
               CAST(1 + CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END
                    + greatest(1, CAST(ceil(ntok / 12.0) AS BIGINT)) AS BIGINT) AS n_turns
        FROM d
    """.replace("%%DATE%%", _DATE_SQL),
    "conv_dedup_exact": r"""
        WITH d AS (
          SELECT doc_id,
                 'doc-' || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS conv_id,
                 'INVOICE 1' || lpad(CAST(doc_id AS VARCHAR), 5, '0') || ' DATE ' ||
                   printf('%02d/%02d/%d', doc_id % 12 + 1, doc_id % 28 + 1, 1990 + doc_id % 30) ||
                   ' REFERENCE AB' || CAST(doc_id AS VARCHAR) || 'X TOTAL $' ||
                   CAST(doc_id % 900 + 100 AS VARCHAR) || '.25' AS header,
                 CASE WHEN doc_id % 3 = 0 THEN
                   'PATIENT NAME ' ||
                   (['MARY','JOHN','ALICE','ROBERT','LINDA'])[CAST(doc_id // 3 AS INT) % 5 + 1] || ' ' ||
                   (['SMITH','JONES','TAYLOR','BROWN','WILSON'])[CAST(doc_id // 7 AS INT) % 5 + 1] ||
                   ' DOB ' || printf('%02d/%02d/%d', doc_id % 12 + 1, doc_id % 25 + 1, 1975 + doc_id % 40)
                 END AS pline,
                 list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
          FROM documents
        ),
        turns AS (
          SELECT conv_id, 0 AS turn_idx, header AS text FROM d
          UNION ALL
          SELECT conv_id, 1, pline FROM d WHERE pline IS NOT NULL
          UNION ALL
          SELECT conv_id, CAST(i + 2 AS INT),
                 array_to_string(toks[CAST(i*12+1 AS INT) : CAST(i*12+12 AS INT)], ' ')
          FROM d, unnest(range(0, greatest(1, CAST(ceil(len(toks) / 12.0) AS BIGINT)))) t(i)
        ),
        fps AS (
          SELECT conv_id,
                 bit_xor(md5_number_upper(CAST(turn_idx AS VARCHAR) || ':' || text) >> 1) AS fp
          FROM turns GROUP BY conv_id
        )
        SELECT CAST(fp AS BIGINT) AS fp, min(conv_id) AS conv_id,
               CAST(count(*) AS BIGINT) AS n_copies
        FROM fps GROUP BY fp
    """,
    "f7_annotations": f"""
        WITH {_NER_FEAT_CTE},
        runs AS (
          SELECT *, CASE WHEN is_name AND NOT coalesce(lag(is_name) OVER (PARTITION BY doc_id ORDER BY pos), false)
                         THEN 1 ELSE 0 END AS run_start
          FROM feat
        ),
        rid AS (
          SELECT *, sum(run_start) OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS run_id
          FROM runs WHERE is_name
        ),
        rstat AS (SELECT doc_id, run_id, min(pos) AS p0, count(*) AS n FROM rid GROUP BY doc_id, run_id),
        firstrun AS (
          SELECT doc_id, p0, least(n, 4) AS take
          FROM (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY p0) AS rn FROM rstat WHERE n >= 2)
          WHERE rn = 1
        ),
        -- this oracle covers the PERSON-only case; an org-suffix token in the
        -- corpus would need the two-span assembly, so fail LOUDLY (sentinel
        -- hash-mismatch) instead of silently passing
        suf AS (SELECT doc_id, min(pos) AS k FROM feat WHERE core IN ({_SUF_SQL}) GROUP BY doc_id),
        asm AS (
          SELECT t.doc_id,
                 CASE WHEN suf.k IS NOT NULL THEN 'ORG-PRESENT-ORACLE-GAP'
                      WHEN f.p0 IS NULL THEN upper(trim(documents.text))
                      ELSE
                        CASE WHEN f.p0 > 1
                             THEN array_to_string(toks[1:f.p0-1], ' ') || ' ' ELSE '' END ||
                        '<PERSON>' || array_to_string(toks[f.p0:f.p0+f.take-1], ' ') || '</PERSON>' ||
                        CASE WHEN f.p0 + f.take - 1 < len(toks)
                             THEN ' ' || array_to_string(toks[f.p0+f.take:], ' ') ELSE '' END
                 END AS annotated
          FROM t LEFT JOIN firstrun f USING (doc_id)
                 LEFT JOIN suf USING (doc_id)
                 JOIN documents USING (doc_id)
        )
        SELECT doc_id, annotated FROM asm
    """,
    "doc_winnow_fp": r"""
        WITH ch AS (
          SELECT doc_id, pos, ord(substr(text, pos, 1)) AS o
          FROM documents, unnest(range(1, length(text) + 1)) AS r(pos)
        ),
        kh AS (  -- k-gram rolling hash ending at pos (k=5, B=257, M=2^61-1)
          SELECT doc_id, pos - 4 AS i,
                 ((o * 1 +
                   lag(o, 1) OVER w * 257 +
                   lag(o, 2) OVER w * 66049 +
                   lag(o, 3) OVER w * 16974593 +
                   lag(o, 4) OVER w * 4362470401)) % 2305843009213693951 AS h
          FROM ch WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
          QUALIFY pos >= 5
        ),
        wmin AS (  -- length-4 hash window ending at i: min h, RIGHTMOST argmin
          SELECT doc_id, i - 3 AS s,
                 min(struct_pack(h := h, ni := -i)) OVER (
                   PARTITION BY doc_id ORDER BY i ROWS 3 PRECEDING) AS m,
                 count(*) OVER (PARTITION BY doc_id ORDER BY i ROWS 3 PRECEDING) AS cnt
          FROM kh QUALIFY cnt = 4
        ),
        sel AS (  -- record a fingerprint when the argmin position changes
          SELECT doc_id, s, m.h AS fp,
                 CASE WHEN (-m.ni) IS DISTINCT FROM lag(-m.ni) OVER (PARTITION BY doc_id ORDER BY s)
                      THEN 1 ELSE 0 END AS keep
          FROM wmin
        ),
        fpr AS (
          SELECT doc_id, fp, row_number() OVER (PARTITION BY doc_id ORDER BY s) AS "ord"
          FROM sel WHERE keep = 1
        )
        SELECT doc_id, "ord", CAST(fp AS BIGINT) AS fp FROM fpr WHERE "ord" <= 64
    """,
    "f1_remove_special": f"""
        SELECT doc_id, rtrim(regexp_replace(text, '{F1_CLASS}', '', 'g'), ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)) AS clean_text
        FROM documents
    """,
    "f2_upper_invariant": "SELECT doc_id, upper(text) AS upper_text FROM documents",
    "f3_keyword_gate": """
        SELECT doc_id, n_chars FROM documents
        WHERE contains(upper(text), 'SPARK') OR contains(upper(text), 'WINDOW')
    """,
    "f4_first_date": f"""
        SELECT event_id,
               regexp_extract('logged ' || strftime(ts, '%m/%d/%Y') || ' event',
                              '{_DATE_SQL}') AS first_date
        FROM events
    """,
    "e3_e6_invoice_line": r"""
        WITH l AS (
          SELECT event_id,
                 'INVOICE # ' || CAST(event_id AS VARCHAR) || ' TOTAL $' ||
                 printf('%.2f', value) AS line
          FROM events
        )
        SELECT event_id,
               CASE WHEN regexp_matches(line, '\b(INVOICE)(\W+|\s+)(\d+)\b')
                    THEN regexp_extract(line, '[.\d]+') END AS invoice_number,
               CASE WHEN regexp_matches(line, '\b(TOTAL|RATE|BALANCE DUE)\W+\$\d+(,\d{3})*(\.\d{2})?')
                    THEN trim(regexp_replace(
                           regexp_extract(line, '\b(TOTAL|RATE|BALANCE DUE)\W+\$\d+(,\d{3})*(\.\d{2})?'),
                           'TOTAL|RATE|BALANCE|DUE', '', 'g'))
               END AS gross_total
        FROM l
    """,
    "e4_invoice_date": f"""
        WITH l AS (
          SELECT event_id,
                 CASE WHEN event_type = 'error'
                      THEN 'DUE DATE ' || strftime(ts, '%m/%d/%Y')
                      ELSE 'INVOICE DATE ' || strftime(ts, '%m/%d/%Y') END AS line
          FROM events
        )
        SELECT event_id,
               CASE WHEN contains(line, 'DATE') AND NOT regexp_matches(line, 'DUE.*DATE')
                    THEN nullif(regexp_extract(line, '{_DATE_SQL}'), '') END AS invoice_date
        FROM l
    """,
    "e5_order_ref": r"""
        SELECT event_id,
               regexp_extract('REFERENCE AB' || CAST(event_id AS VARCHAR) || 'X',
                              '\b(LOAD|REFERENCE)\W+(\w+\d+\w+)', 2) AS order_number
        FROM events
    """,
    "e9_first_match_fold": """
        SELECT user_id, event_id AS first_event_id,
               CAST(round(value * 100) AS BIGINT) AS first_value_cents
        FROM (
          SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) rn
          FROM events WHERE event_type = 'purchase'
        ) WHERE rn = 1
    """,
    "a1_user_stats": """
        SELECT user_id, count(*) AS n_events,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
        FROM events GROUP BY user_id
    """,
    "sessionize_events": """
        WITH o AS (
          SELECT user_id, ts, event_id,
                 lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
          FROM events
        ), m AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN prev IS NULL OR epoch(ts) - epoch(prev) > 1800
                      THEN 1 ELSE 0 END AS new_sess
          FROM o
        ), s AS (
          SELECT user_id, sum(new_sess) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS sess_id
          FROM m
        )
        SELECT user_id, CAST(max(sess_id) AS BIGINT) AS n_sessions,
               CAST(max(cnt) AS BIGINT) AS max_session_events
        FROM (SELECT user_id, sess_id, count(*) AS cnt FROM s GROUP BY user_id, sess_id)
        GROUP BY user_id
    """,
    "hourly_event_windows": """
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS window_start,
               event_type,
               count(*) AS n,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
        FROM events GROUP BY 1, 2
    """,
    "q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_cents,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_price_cents,
               CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))
                 AS BIGINT) AS sum_disc_price_e4,
               count(*) AS count_order
        FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
    "q3_top_orders": """
        SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents,
               strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    "q5_nation_revenue": """
        SELECT n_name,
               CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))
                 AS BIGINT) AS revenue_e4
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
    """,
    "top_suppliers_native_sort": """
        SELECT s_suppkey, CAST(round(s_acctbal * 100) AS BIGINT) AS acctbal_cents
        FROM supplier ORDER BY s_acctbal DESC, s_suppkey LIMIT 5
    """,
    "topk_parts_per_brand": """
        SELECT p_brand, rank, p_partkey, price_cents FROM (
          SELECT p_brand, p_partkey,
                 CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents,
                 row_number() OVER (PARTITION BY p_brand
                                    ORDER BY p_retailprice DESC, p_partkey) AS rank
          FROM part
        ) WHERE rank <= 3
    """,
    "customers_without_orders": """
        SELECT c_custkey FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
    """,
    "doc_token_stats": r"""
        WITH t AS (SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '') AS toks
                   FROM documents)
        SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
               CAST(len(list_distinct(toks)) AS BIGINT) AS n_unique,
               CAST(list_sum(list_transform(toks, w -> len(w))) AS BIGINT)
                 AS sum_token_chars
        FROM t
    """,
    "doc_quality": r"""
        WITH t AS (SELECT doc_id, text,
                          list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '') AS toks
                   FROM documents)
        SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
               CAST(len(list_filter(toks, w -> w IN
                 ('the','a','and','of','to','in','is','for','on','with'))) AS BIGINT)
                 AS stop_cnt,
               CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))
                 AS BIGINT) AS punct_cnt,
               CASE WHEN len(toks) > 0
                    THEN CAST(len(list_filter(toks, w -> w IN
                      ('the','a','and','of','to','in','is','for','on','with'))) AS DOUBLE)
                         / len(toks)
                    ELSE 0.0 END AS stop_ratio
        FROM t
    """,
    "doc_langid": r"""
        WITH t AS (SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '') AS toks
                   FROM documents),
        r AS (SELECT doc_id,
                     CASE WHEN len(toks) > 0
                          THEN CAST(len(list_filter(toks, w -> w IN
                            ('the','a','and','of','to','in','is','for','on','with')))
                            AS DOUBLE) / len(toks)
                          ELSE 0.0 END AS ratio
              FROM t)
        SELECT doc_id, CASE WHEN ratio >= 0.05 THEN 'en' ELSE 'unk' END AS lang_pred
        FROM r
    """,
    "doc_fingerprint": "SELECT doc_id, md5(text) AS fp FROM documents",
    "doc_gopher_filter": r"""
        WITH t AS (
          SELECT doc_id, text,
                 list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '') AS toks,
                 length(text) AS chars
          FROM documents
        ), m AS (
          SELECT doc_id,
                 len(toks) AS n,
                 len(list_filter(toks, w -> w IN
                   ('the','a','and','of','to','in','is','for','on','with'))) AS stop_cnt,
                 COALESCE(list_max(list_transform(toks, w -> len(w))), 0) AS maxw,
                 length(text) - length(regexp_replace(text, '[#@$%^*=<>{}\[\]\\]', '', 'g'))
                   AS sym,
                 chars
          FROM t
        )
        SELECT doc_id,
               CAST(n >= 5 AND n <= 10000 AS BIGINT) AS ok_len,
               CAST(stop_cnt >= 1 AS BIGINT) AS ok_stop,
               CAST(maxw <= 30 AS BIGINT) AS ok_word,
               CAST(sym * 10 < greatest(chars, 1) * 3 AS BIGINT) AS ok_sym
        FROM m
        WHERE n >= 5 AND n <= 10000 AND stop_cnt >= 1 AND maxw <= 30
          AND sym * 10 < greatest(chars, 1) * 3
    """,
    "doc_scrub_digits": r"""
        SELECT doc_id, regexp_replace(text, '\d', '#', 'g') AS scrubbed
        FROM documents
    """,
    "top_tokens_per_source": r"""
        SELECT source, rank, token, n FROM (
          SELECT source, token, n,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY n DESC, token) AS rank
          FROM (
            SELECT source, token, count(*) AS n FROM (
              SELECT source, unnest(list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '')) AS token
              FROM documents WHERE trim(text) <> ''
            ) GROUP BY source, token
          )
        ) WHERE rank <= 5
    """,
    "dedup_exact": """
        SELECT md5(text) AS text_hash, min(doc_id) AS doc_id, count(*) AS n_copies
        FROM documents GROUP BY md5(text)
    """,
    "dedup_apply_exact": """
        SELECT doc_id, text FROM documents
        WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY text)
    """,
    "doc_bpe_token_stats": r"""
        SELECT doc_id,
               len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]+')) AS n_bpe_tokens,
               len(regexp_extract_all(text, '[a-zA-Z]+')) AS n_alpha,
               len(regexp_extract_all(text, '[0-9]+')) AS n_num,
               len(regexp_extract_all(text, '[^a-zA-Z0-9\s]+')) AS n_punct
        FROM documents
    """,
    "doc_bigram_logprob": r"""
        WITH t AS (
          SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
          FROM documents
        ),
        uni AS (
          SELECT tok AS w, count(*) AS n
          FROM (SELECT unnest(toks) AS tok FROM t) GROUP BY tok
        ),
        v AS (SELECT count(*) AS vocab FROM uni),
        bi AS (
          SELECT w1, w2, count(*) AS n FROM (
            SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2
            FROM t, unnest(range(1, len(toks))) AS r(i)
          ) GROUP BY w1, w2
        ),
        pairs AS (
          SELECT t.doc_id, toks[i] AS w1, toks[i+1] AS w2
          FROM t, unnest(range(1, len(toks))) AS r(i)
        ),
        scored AS (
          -- integer micro-nats per bigram BEFORE the sum: int sums are
          -- order-free, so the result is bit-stable across engines
          SELECT p.doc_id,
                 CAST(round(ln((coalesce(bi.n, 0) + 1.0) / (coalesce(uni.n, 0) + v.vocab)) * 1e6) AS BIGINT) AS lp
          FROM pairs p
          LEFT JOIN bi ON bi.w1 = p.w1 AND bi.w2 = p.w2
          LEFT JOIN uni ON uni.w = p.w1
          CROSS JOIN v
        ),
        agg AS (
          SELECT doc_id, count(*) AS n_bigrams, CAST(sum(lp) AS BIGINT) AS sum_logprob_e6
          FROM scored GROUP BY doc_id
        )
        SELECT t.doc_id,
               CAST(coalesce(agg.n_bigrams, 0) AS BIGINT) AS n_bigrams,
               CAST(coalesce(agg.sum_logprob_e6, 0) AS BIGINT) AS sum_logprob_e6
        FROM t LEFT JOIN agg USING (doc_id)
    """,
    "mixture_plan_sources": r"""
        WITH t AS (SELECT source,
                          len(list_filter(string_split_regex(trim(text), '\s+'),
                                          x -> x <> '')) AS n
                   FROM documents),
        vol AS (SELECT source, CAST(sum(n) AS BIGINT) AS n_tokens
                FROM t GROUP BY 1),
        tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total,
                       CAST(count(*) AS BIGINT) AS nsrc
                FROM vol)
        SELECT vol.source, vol.n_tokens,
               CAST(round(CAST(vol.n_tokens AS DOUBLE) / tot.total * 1e6)
                    AS BIGINT) AS share_e6,
               CAST(round(CASE WHEN vol.n_tokens = 0 THEN 1.0
                               ELSE least(1.0,
                                    CAST(tot.total AS DOUBLE) / 2.0 / tot.nsrc
                                    / vol.n_tokens) END * 1e6)
                    AS BIGINT) AS sample_rate_e6
        FROM vol CROSS JOIN tot
    """,
    "source_scorecard": r"""
        WITH t AS (SELECT doc_id, source, text,
                          list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '') AS toks
                   FROM documents),
        r AS (SELECT source, len(toks) AS n_tok,
                     CASE WHEN len(toks) > 0
                          AND CAST(len(list_filter(toks, w -> w IN
                            ('the','a','and','of','to','in','is','for','on','with')))
                            AS DOUBLE) / len(toks) >= 0.05
                          THEN 1 ELSE 0 END AS pred_en,
                     md5(text) AS fp
              FROM t),
        vol AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
                       CAST(sum(pred_en) AS BIGINT) AS n_pred_en
                FROM r GROUP BY 1),
        fp AS (SELECT source, fp, count(*) AS n FROM r GROUP BY 1, 2),
        dup AS (SELECT source, CAST(sum(n) AS BIGINT) AS n_dup_docs
                FROM fp WHERE n >= 2 GROUP BY 1)
        SELECT vol.source, vol.n_docs, vol.n_tokens, vol.n_pred_en,
               CAST(coalesce(dup.n_dup_docs, 0) AS BIGINT) AS n_dup_docs
        FROM vol LEFT JOIN dup USING (source)
    """,
    "lang_label_audit": r"""
        WITH t AS (SELECT doc_id, lang,
                          list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '') AS toks
                   FROM documents),
        r AS (SELECT doc_id, lang,
                     CASE WHEN len(toks) > 0
                          THEN CAST(len(list_filter(toks, w -> w IN
                            ('the','a','and','of','to','in','is','for','on','with')))
                            AS DOUBLE) / len(toks)
                          ELSE 0.0 END AS ratio
              FROM t)
        SELECT lang, CASE WHEN ratio >= 0.05 THEN 'en' ELSE 'unk' END AS lang_pred,
               CAST(count(*) AS BIGINT) AS n
        FROM r GROUP BY 1, 2
    """,
    "vocab_growth_curve": r"""
        WITH t AS (
          SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
          FROM documents
        ),
        first AS (
          SELECT tok AS w, min(doc_id) AS d
          FROM (SELECT doc_id, unnest(toks) AS tok FROM t) GROUP BY 1
        ),
        cnts AS (SELECT doc_id, len(toks) AS n FROM t),
        md AS (SELECT max(doc_id) AS m FROM cnts),
        dec AS (
          SELECT CAST(i AS BIGINT) AS decile,
                 (md.m + 1) * CAST(i AS BIGINT) // 10 - 1 AS cut
          FROM md, unnest(range(1, 11)) AS r(i)
        )
        SELECT dec.decile, CAST(dec.cut AS BIGINT) AS max_doc_id,
               CAST((SELECT count(*) FROM first WHERE first.d <= dec.cut)
                    AS BIGINT) AS vocab_size,
               CAST((SELECT coalesce(sum(n), 0) FROM cnts
                     WHERE cnts.doc_id <= dec.cut) AS BIGINT) AS n_tokens
        FROM dec
    """,
    "pmi_top_collocations": r"""
        WITH t AS (
          SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
          FROM documents
        ),
        tok AS (SELECT unnest(toks) AS w FROM t),
        uni AS (SELECT w, count(*) AS n FROM tok GROUP BY 1),
        pairs AS (
          SELECT toks[i] AS w1, toks[i+1] AS w2
          FROM t, unnest(range(1, len(toks))) AS r(i)
        ),
        bi AS (SELECT w1, w2, count(*) AS n FROM pairs GROUP BY 1, 2),
        nbi AS (SELECT CAST(sum(n) AS DOUBLE) AS nb FROM bi),
        sc AS (
          SELECT b.w1, b.w2, b.n,
                 CAST(round(ln(CAST(b.n AS DOUBLE) * nbi.nb
                               / (CAST(u1.n AS DOUBLE) * u2.n)) * 1e6)
                      AS BIGINT) AS pmi_e6
          FROM bi b
          JOIN uni u1 ON u1.w = b.w1
          JOIN uni u2 ON u2.w = b.w2
          CROSS JOIN nbi
          WHERE b.n >= 5
        )
        SELECT w1, w2, CAST(n AS BIGINT) AS n, pmi_e6
        FROM sc ORDER BY pmi_e6 DESC, w1, w2 LIMIT 20
    """,
    "doc_kneser_ney_logprob": r"""
        WITH t AS (
          SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
          FROM documents
        ),
        pairs AS (
          SELECT t.doc_id, toks[i] AS w1, toks[i+1] AS w2
          FROM t, unnest(range(1, len(toks))) AS r(i)
        ),
        bi AS (SELECT w1, w2, count(*) AS n FROM pairs GROUP BY 1, 2),
        heads AS (SELECT w1, sum(n) AS c1, count(*) AS n1p FROM bi GROUP BY 1),
        pres AS (SELECT w2, count(*) AS npre FROM bi GROUP BY 1),
        tt AS (SELECT CAST(count(*) AS DOUBLE) AS ntypes FROM bi),
        scored AS (
          -- one fixed IEEE double expression over exact integer counts,
          -- rounded to integer micro-nats per pair BEFORE the sum
          SELECT p.doc_id,
                 CAST(round(ln((greatest(CAST(b.n AS DOUBLE) - 0.75, 0.0)
                                + 0.75 * CAST(h.n1p AS DOUBLE)
                                  * (CAST(pr.npre AS DOUBLE) / tt.ntypes))
                               / CAST(h.c1 AS DOUBLE)) * 1e6) AS BIGINT) AS lp
          FROM pairs p
          JOIN bi b ON b.w1 = p.w1 AND b.w2 = p.w2
          JOIN heads h ON h.w1 = p.w1
          JOIN pres pr ON pr.w2 = p.w2
          CROSS JOIN tt
        ),
        agg AS (
          SELECT doc_id, count(*) AS n_bigrams, CAST(sum(lp) AS BIGINT) AS s
          FROM scored GROUP BY 1
        )
        SELECT t.doc_id,
               CAST(coalesce(agg.n_bigrams, 0) AS BIGINT) AS n_bigrams,
               CAST(coalesce(agg.s, 0) AS BIGINT) AS kn_logprob_e6
        FROM t LEFT JOIN agg USING (doc_id)
    """,
    "dsir_importance_select": r"""
        WITH t AS (
          SELECT doc_id, lang,
                 list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
          FROM documents
        ),
        terms AS (
          SELECT doc_id, lang, tok AS term
          FROM (SELECT doc_id, lang, unnest(toks) AS tok FROM t)
          UNION ALL
          SELECT doc_id, lang, toks[i] || ' ' || toks[i+1] AS term
          FROM t, unnest(range(1, len(toks))) AS r(i)
        ),
        tb AS (
          SELECT doc_id, lang,
                 CAST(md5_number_upper(term) % 4096 AS BIGINT) AS b
          FROM terms
        ),
        nq AS (SELECT b, count(*) AS n FROM tb WHERE lang <> 'en' GROUP BY b),
        nt AS (SELECT b, count(*) AS n FROM tb WHERE lang = 'en' GROUP BY b),
        tot AS (SELECT (SELECT count(*) FROM tb WHERE lang <> 'en') AS q_total,
                       (SELECT count(*) FROM tb WHERE lang = 'en') AS t_total),
        scored AS (
          -- integer micro-nats per term BEFORE the sum (order-free int
          -- sums => bit-stable across engines, same contract as
          -- doc_bigram_logprob)
          SELECT tb.doc_id,
                 CAST(round((ln((coalesce(nt.n, 0) + 1.0) / (tot.t_total + 4096))
                           - ln((coalesce(nq.n, 0) + 1.0) / (tot.q_total + 4096))) * 1e6) AS BIGINT) AS lp
          FROM tb
          LEFT JOIN nq USING (b)
          LEFT JOIN nt USING (b)
          CROSS JOIN tot
        ),
        agg AS (
          SELECT doc_id, count(*) AS n_terms, CAST(sum(lp) AS BIGINT) AS s
          FROM scored GROUP BY doc_id
        )
        SELECT t.doc_id,
               CAST(coalesce(agg.n_terms, 0) AS BIGINT) AS n_terms,
               CAST(coalesce(agg.s, 0) AS BIGINT) AS logratio_e6,
               CAST(CASE WHEN coalesce(agg.s, 0) > 0 THEN 1 ELSE 0 END AS BIGINT) AS selected
        FROM t LEFT JOIN agg USING (doc_id)
    """,
    "range_join_value_bands": """
        WITH bands(lo, hi, band) AS (VALUES
          (0.0, 100.0, 'xs'), (100.0, 250.0, 's'), (250.0, 500.0, 'm'),
          (500.0, 750.0, 'l'), (750.0, 10000.0, 'xl'))
        SELECT b.band, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
        FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
        GROUP BY b.band
    """,
    "stratified_sample_per_source": """
        SELECT source, doc_id FROM (
          SELECT source, doc_id,
                 row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
          FROM documents
        ) WHERE rn <= 5
    """,
    "curate_corpus": r"""
        WITH t AS (
          SELECT doc_id, text,
                 list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '') AS toks,
                 length(text) AS chars
          FROM documents
        ), m AS (
          SELECT doc_id, len(toks) AS n,
                 len(list_filter(toks, w -> w IN
                   ('the','a','and','of','to','in','is','for','on','with'))) AS stop_cnt,
                 COALESCE(list_max(list_transform(toks, w -> len(w))), 0) AS maxw,
                 length(text) - length(regexp_replace(text, '[#@$%^*=<>{}\[\]\\]', '', 'g')) AS sym,
                 chars
          FROM t
        )
        SELECT m.doc_id, m.n AS n_tokens
        FROM m
        WHERE m.n >= 5 AND m.n <= 10000 AND m.stop_cnt >= 1 AND m.maxw <= 30
          AND m.sym * 10 < greatest(m.chars, 1) * 3
          AND m.doc_id IN (SELECT min(doc_id) FROM documents GROUP BY text)
          AND CAST(('0x' || substr(md5(CAST(m.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 80
    """,
    "dedup_ngram_jaccard": r"""
        WITH t AS (SELECT doc_id, source,
                          list_distinct(list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '')) AS toks
                   FROM documents)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
                 / len(list_distinct(a.toks || b.toks)) AS sim
        FROM t a JOIN t b ON a.source = b.source AND a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
                 / len(list_distinct(a.toks || b.toks)) >= 0.9
    """,
    "knn_cosine_topk": """
        SELECT query_id, rank, neighbor_id FROM (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
                            c.vec_id) AS rank
          FROM embeddings q JOIN embeddings c ON q.vec_id < 10 AND c.vec_id <> q.vec_id
        ) WHERE rank <= 5
    """,
    "knn_ivf_topk": """
        SELECT query_id, rank, neighbor_id FROM (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
                            c.vec_id) AS rank
          FROM embeddings q JOIN embeddings c ON q.vec_id < 10 AND c.vec_id <> q.vec_id
        ) WHERE rank <= 5
    """,  # full probe == exact: same oracle as brute force
    "embed_neardup": """
        WITH signs AS (
          SELECT j, i, CASE WHEN md5_number_upper(CAST(j AS VARCHAR) || ':' ||
                                                  CAST(i AS VARCHAR)) % 2 = 1
                            THEN 1 ELSE -1 END AS s
          FROM (SELECT unnest(range(64)) AS j), (SELECT unnest(range(64)) AS i)
        ),
        x AS (SELECT vec_id, unnest(range(len(embedding))) AS i,
                     CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                          AS BIGINT) AS xi
              FROM embeddings WHERE vec_id % 5 = 0),
        dots AS (SELECT x.vec_id, s.j, sum(s.s * x.xi) AS d
                 FROM x JOIN signs s ON x.i = s.i GROUP BY 1, 2),
        sigs AS (SELECT vec_id, j // 8 AS band,
                        CAST(sum(CASE WHEN d >= 0 THEN 1 << (j % 8)
                                      ELSE 0 END) AS BIGINT) AS sig
                 FROM dots GROUP BY 1, 2),
        cand AS (SELECT DISTINCT s1.vec_id AS a, s2.vec_id AS b
                 FROM sigs s1 JOIN sigs s2
                   ON s1.band = s2.band AND s1.sig = s2.sig
                  AND s1.vec_id < s2.vec_id)
        SELECT c.a, c.b
        FROM cand c
        JOIN embeddings ea ON ea.vec_id = c.a
        JOIN embeddings eb ON eb.vec_id = c.b
        WHERE list_cosine_similarity(ea.embedding, eb.embedding) >= 0.4
    """,
    "e7_vendor_lookup": """
        WITH l AS (
          SELECT text, 'V' || CAST(min(doc_id) AS VARCHAR) AS vendor
          FROM documents WHERE doc_id < 5 GROUP BY text
        )
        SELECT d.doc_id, l.vendor FROM documents d JOIN l ON d.text = l.text
    """,
    "wordcount_top20": r"""
        SELECT token, n FROM (
          SELECT token, count(*) AS n FROM (
            SELECT unnest(list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '')) AS token
            FROM documents WHERE trim(text) <> ''
          ) GROUP BY token
        ) ORDER BY n DESC, token LIMIT 20
    """,
    "cooccur_top20": r"""
        WITH t AS (SELECT doc_id,
                          list_filter(string_split_regex(trim(text), '\s+'),
                                      x -> x <> '') AS toks
                   FROM documents),
        pos AS (SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS i
                FROM t),
        tok AS (SELECT doc_id, i, toks[i] AS w FROM pos),
        pr AS (
          SELECT CASE WHEN a.w <= b.w THEN a.w || ' ' || b.w
                      ELSE b.w || ' ' || a.w END AS pair
          FROM tok a JOIN tok b
            ON a.doc_id = b.doc_id AND b.i - a.i BETWEEN 1 AND 2
        )
        SELECT pair, count(*) AS n FROM pr
        GROUP BY pair ORDER BY n DESC, pair LIMIT 20
    """,
    "dedup_clusters": r"""
        WITH RECURSIVE
        t AS (SELECT doc_id, source,
                     list_distinct(list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '')) AS toks
              FROM documents),
        p AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM t a JOIN t b ON a.source = b.source AND a.doc_id < b.doc_id
          WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
                  / len(list_distinct(a.toks || b.toks)) >= 0.9
        ),
        e AS (SELECT doc_a AS u, doc_b AS v FROM p
              UNION SELECT doc_b, doc_a FROM p),
        reach(node, r) AS (
          SELECT u, u FROM e
          UNION
          SELECT e.u, reach.r FROM e JOIN reach ON e.v = reach.node
        )
        SELECT node AS doc_id, CAST(min(r) AS BIGINT) AS cluster_id
        FROM reach GROUP BY node
    """,
    "pagerank_neardup": r"""
        WITH RECURSIVE
        t AS (SELECT doc_id, source,
                     list_distinct(list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '')) AS toks
              FROM documents),
        p AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM t a JOIN t b ON a.source = b.source AND a.doc_id < b.doc_id
          WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
                  / len(list_distinct(a.toks || b.toks)) >= 0.9
        ),
        e AS (SELECT doc_a AS u, doc_b AS v FROM p
              UNION SELECT doc_b, doc_a FROM p),
        deg AS (SELECT u AS node, count(*) AS deg FROM e GROUP BY u),
        n AS (SELECT count(*) AS n FROM deg),
        pr(it, node, rank) AS (
          SELECT 0, node, CAST(1000000000000 // n.n AS BIGINT) FROM deg, n
          UNION ALL
          SELECT pr.it + 1, e.v,
                 CAST((15 * 1000000000000 // (100 * n.n))
                      + sum((85 * pr.rank) // (100 * deg.deg)) AS BIGINT)
          FROM pr JOIN e ON e.u = pr.node JOIN deg ON deg.node = pr.node, n
          WHERE pr.it < 5
          GROUP BY pr.it, e.v, n.n
        )
        SELECT node AS doc_id, rank FROM pr WHERE it = 5
    """,
    "dedup_edit_verified": r"""
        WITH t AS (SELECT doc_id, source,
                     list_distinct(list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '')) AS toks
              FROM documents),
        p AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM t a JOIN t b ON a.source = b.source AND a.doc_id < b.doc_id
          WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
                  / len(list_distinct(a.toks || b.toks)) >= 0.9
        )
        SELECT p.doc_a, p.doc_b,
               CAST(levenshtein(da.text, db.text) AS BIGINT) AS edit_dist
        FROM p JOIN documents da ON da.doc_id = p.doc_a
               JOIN documents db ON db.doc_id = p.doc_b
    """,
    "dedup_substring": r"""
        WITH t AS (SELECT doc_id,
                          list_filter(string_split_regex(trim(text), '\s+'),
                                      x -> x <> '') AS toks
                   FROM documents),
        s AS (SELECT doc_id, toks FROM t WHERE len(toks) >= 8),
        pos AS (SELECT doc_id, toks, unnest(range(1, len(toks) - 6)) AS i
                FROM s),
        sh AS (SELECT DISTINCT doc_id,
                      md5_number_upper(array_to_string(toks[i:i+7], ' ')) AS h
               FROM pos),
        ns AS (SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY doc_id),
        d AS (SELECT h FROM sh GROUP BY h HAVING count(*) >= 2),
        nd AS (SELECT doc_id, count(*) AS n_dup FROM sh
               WHERE h IN (SELECT h FROM d) GROUP BY doc_id)
        SELECT ns.doc_id, CAST(ns.n_shingles AS BIGINT) AS n_shingles,
               CAST(COALESCE(nd.n_dup, 0) AS BIGINT) AS n_dup_shingles
        FROM ns LEFT JOIN nd USING (doc_id)
    """,
    "dedup_paragraphs": r"""
        WITH t AS (SELECT doc_id,
                          list_filter(string_split_regex(trim(text), '\s+'),
                                      x -> x <> '') AS toks
                   FROM documents),
        s AS (SELECT doc_id, toks FROM t WHERE len(toks) >= 1),
        b AS (SELECT doc_id, toks,
                     unnest(range(0, CAST((len(toks) + 7) // 8 AS BIGINT))) AS blk
              FROM s),
        bt AS (SELECT doc_id, blk,
                      array_to_string(toks[blk * 8 + 1 : blk * 8 + 8], ' ') AS btext
               FROM b),
        w AS (SELECT doc_id, blk, btext,
                     row_number() OVER (PARTITION BY btext ORDER BY doc_id, blk) AS rn,
                     count(*) OVER (PARTITION BY btext) AS cnt
              FROM bt),
        k AS (SELECT doc_id, blk, btext FROM w WHERE cnt = 1 OR rn = 1),
        agg AS (SELECT doc_id, count(*) AS n_kept,
                       string_agg(btext, ' ' ORDER BY blk) AS clean_text
                FROM k GROUP BY doc_id),
        nb AS (SELECT doc_id, count(*) AS n_blocks FROM bt GROUP BY doc_id)
        SELECT nb.doc_id, COALESCE(agg.clean_text, '') AS clean_text,
               CAST(nb.n_blocks AS BIGINT) AS n_blocks,
               CAST(COALESCE(agg.n_kept, 0) AS BIGINT) AS n_kept
        FROM nb LEFT JOIN agg USING (doc_id)
    """,
    "sliding_window_events": """
        WITH e AS (
          SELECT date_trunc('minute', ts) - INTERVAL (EXTRACT(minute FROM ts)::INT % 30) MINUTE
                   AS t30,
                 CAST(round(value * 100) AS BIGINT) AS value_cents
          FROM events
        ), x AS (
          SELECT t30 AS w, value_cents FROM e
          UNION ALL
          SELECT t30 - INTERVAL 30 MINUTE, value_cents FROM e
        )
        SELECT strftime(w, '%Y-%m-%d %H:%M:00') AS window_start,
               count(*) AS n,
               CAST(sum(value_cents) AS BIGINT) AS sum_value_cents
        FROM x GROUP BY w
    """,
    "percentiles_value_per_type": """
        SELECT event_type,
               quantile_disc(CAST(round(value * 100) AS BIGINT), 0.5) AS p50,
               quantile_disc(CAST(round(value * 100) AS BIGINT), 0.95) AS p95,
               quantile_disc(CAST(round(value * 100) AS BIGINT), 0.99) AS p99
        FROM events GROUP BY event_type
    """,
    "median_value_per_type": """
        SELECT event_type,
               quantile_disc(CAST(round(value * 100) AS BIGINT), 0.5) AS median_cents
        FROM events GROUP BY event_type
    """,
    "mad_value_per_type": """
        WITH v AS (SELECT event_type,
                          CAST(round(value * 100) AS BIGINT) AS cents
                   FROM events),
        m AS (SELECT event_type, quantile_disc(cents, 0.5) AS med
              FROM v GROUP BY event_type)
        SELECT v.event_type,
               CAST(m.med AS BIGINT) AS median_cents,
               CAST(quantile_disc(abs(v.cents - m.med), 0.5) AS BIGINT) AS mad_cents
        FROM v JOIN m USING (event_type) GROUP BY v.event_type, m.med
    """,
    "distinct_users_per_type": """
        SELECT event_type, count(DISTINCT user_id) AS n_users
        FROM events GROUP BY event_type
    """,
    "asof_purchase_view": """
        WITH p AS (SELECT event_id, ts, user_id FROM events
                   WHERE event_type = 'purchase'),
             v AS (SELECT user_id, ts, max(event_id) AS view_event_id
                   FROM events WHERE event_type = 'view' GROUP BY user_id, ts)
        SELECT p.event_id,
               COALESCE(v.view_event_id, -1) AS view_event_id
        FROM p ASOF LEFT JOIN v
          ON p.user_id = v.user_id AND v.ts < p.ts
    """,
    "distinct_brand_type": "SELECT DISTINCT p_brand, p_type FROM part",
    "union_clicks_purchases": """
        SELECT event_id, event_type FROM events WHERE event_type = 'click'
        UNION ALL
        SELECT event_id, event_type FROM events WHERE event_type = 'purchase'
    """,
    "sample_hash_split": """
        SELECT doc_id FROM documents
        WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
              % 100 < 10
    """,
    "audio_wav_decode": """
        WITH d AS (SELECT doc_id, 64 + doc_id % 129 AS n,
                          8000 + (doc_id % 3) * 4000 AS sr
                   FROM documents),
        s AS (SELECT doc_id, n, sr,
                     ((doc_id * 31 + i * 7919) % 65536) - 32768 AS v
              FROM d, unnest(range(0, n)) AS t(i))
        SELECT doc_id AS media_id,
               CAST(any_value(sr) AS BIGINT) AS sample_rate,
               CAST(any_value(n) AS BIGINT) AS n_samples,
               CAST(max(abs(v)) AS BIGINT) AS peak,
               CAST(sum(v * v) AS BIGINT) AS energy
        FROM s GROUP BY doc_id
    """,
    "image_bmp_decode": """
        WITH d AS (SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 5 AS h
                   FROM documents),
        px AS (SELECT doc_id, w, h,
                      (doc_id * 31 + i * 13) % 256 AS v
               FROM d, unnest(range(0, w * h)) AS t(i))
        SELECT doc_id AS media_id,
               CAST(any_value(w) AS BIGINT) AS width,
               CAST(any_value(h) AS BIGINT) AS height,
               CAST(3 * sum(v) AS BIGINT) AS px_sum,
               CAST(max(v) AS BIGINT) AS px_max
        FROM px GROUP BY doc_id
    """,
    "multimodal_decode": """
        SELECT doc_id AS media_id,
               CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                    ELSE 'video' END AS kind,
               octet_length(encode(text)) AS n_bytes
        FROM documents
    """,
    "video_y4m_decode": """
        WITH d AS (SELECT doc_id, 8 + doc_id % 5 AS w, 4 + doc_id % 3 AS h,
                          2 + doc_id % 3 AS nf
                   FROM documents),
        px AS (SELECT doc_id, w, h, nf,
                      (doc_id * 31 + f * 101 + i * 13) % 256 AS v
               FROM d, unnest(range(0, nf)) AS tf(f),
                       unnest(range(0, w * h)) AS ti(i))
        SELECT doc_id AS media_id,
               CAST(any_value(w) AS BIGINT) AS width,
               CAST(any_value(h) AS BIGINT) AS height,
               CAST(any_value(nf) AS BIGINT) AS n_frames,
               CAST(sum(v) AS BIGINT) AS px_sum,
               CAST(max(v) AS BIGINT) AS px_max
        FROM px GROUP BY doc_id
    """,
    "multimodal_frame_features": """
        WITH d AS (SELECT doc_id, 8 + doc_id % 5 AS w, 4 + doc_id % 3 AS h,
                          2 + doc_id % 3 AS nf
                   FROM documents),
        fr AS (SELECT doc_id, w, h, f
               FROM d, unnest(range(0, nf)) AS tf(f)
               WHERE f % 2 = 0),
        px AS (SELECT doc_id, w, h, f,
                      (doc_id * 31 + f * 101 + i * 13) % 256 AS v
               FROM fr, unnest(range(0, w * h)) AS ti(i))
        SELECT doc_id AS media_id, CAST(f AS BIGINT) AS frame_idx,
               CAST(any_value(w) AS BIGINT) AS width,
               CAST(any_value(h) AS BIGINT) AS height,
               CAST(sum(v) AS BIGINT) AS fr_sum,
               CAST(max(v) AS BIGINT) AS fr_max
        FROM px GROUP BY doc_id, f
    """,
    "image_ocr_extract": """
        WITH d AS (
          SELECT doc_id,
                 (['TOTAL','AMOUNT','INVOICE','PAID',
                   'DUE','BALANCE','REFUND','CREDIT'])[CAST(doc_id % 8 AS INT) + 1]
                 || ' ' || lpad(CAST(doc_id AS VARCHAR), 5, '0')
                 || ' $' || CAST((doc_id * 37) % 1000 AS VARCHAR)
                 || '.' || lpad(CAST((doc_id * 7) % 100 AS VARCHAR), 2, '0')
                 AS txt
          FROM documents)
        SELECT doc_id AS media_id, txt AS ocr_text,
               CAST(length(replace(txt, ' ', '')) AS BIGINT) AS n_glyphs
        FROM d
    """,
    "k2_annotation_quads": r"""
        WITH d AS (
          SELECT doc_id,
                 'doc-' || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS conv_id,
                 2 + length(CAST(doc_id AS VARCHAR)) + 1 AS ord_len,
                 length(CAST(doc_id % 900 + 100 AS VARCHAR)) + 3 AS amt_len,
                 CASE WHEN doc_id % 3 = 0 THEN
                   length((['MARY','JOHN','ALICE','ROBERT','LINDA'])[CAST(doc_id // 3 AS INT) % 5 + 1]) + 1 +
                   length((['SMITH','JONES','TAYLOR','BROWN','WILSON'])[CAST(doc_id // 7 AS INT) % 5 + 1])
                 END AS name_len
          FROM documents
        ),
        spans AS (
          -- turn 0 invoice header: 'INVOICE ' inv(6) ' DATE ' dt(10) ' REFERENCE ' ord ' TOTAL $' amt
          SELECT conv_id, 0 AS turn_idx, 'INVOICE_NUM' AS label, 8 AS s, 14 AS e FROM d
          UNION ALL SELECT conv_id, 0, 'DATE', 20, 30 FROM d
          UNION ALL SELECT conv_id, 0, 'ORDER_NUM', 41, 41 + ord_len FROM d
          UNION ALL SELECT conv_id, 0, 'MONEY', 41 + ord_len + 1, 41 + ord_len + 8 + amt_len FROM d
          -- turn 1 patient line: 'PATIENT NAME ' name ' DOB ' date(10)
          UNION ALL SELECT conv_id, 1, 'PERSON', 13, 13 + name_len FROM d WHERE name_len IS NOT NULL
          UNION ALL SELECT conv_id, 1, 'DATE', 13 + name_len + 5, 13 + name_len + 15 FROM d WHERE name_len IS NOT NULL
        ),
        pix AS (  -- declared char->pixel layout (highlights.py)
          SELECT conv_id, turn_idx, label,
                 CAST(turn_idx // 60 + 1 AS BIGINT) AS page,
                 100.0 + s * 25.0 AS px1,
                 100.0 + (turn_idx % 60) * 50.0 AS py1,
                 100.0 + e * 25.0 AS px2,
                 100.0 + (turn_idx % 60) * 50.0 + 50.0 AS py2
          FROM spans
        )
        SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx, label, page,
               px1 / 4.166666666666667 AS x1,
               792.0 - (py1 / 4.166666666666667) AS y1,
               px2 / 4.166666666666667 AS x2,
               792.0 - (py2 / 4.166666666666667) AS y2,
               -- Acrobat quad order [R,B,L,B,R,T,L,T] (Worker.cs:486-488)
               px2 / 4.166666666666667 AS q1,
               792.0 - (py2 / 4.166666666666667) AS q2,
               px1 / 4.166666666666667 AS q3,
               792.0 - (py2 / 4.166666666666667) AS q4,
               px2 / 4.166666666666667 AS q5,
               792.0 - (py1 / 4.166666666666667) AS q6,
               px1 / 4.166666666666667 AS q7,
               792.0 - (py1 / 4.166666666666667) AS q8,
               'YELLOW' AS color, 'MARKUP_HIGHLIGHT' AS subtype
        FROM pix
    """,
    "chunk_documents": r"""
        WITH t AS (
          SELECT doc_id,
                 list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
          FROM documents
        ),
        w AS (
          SELECT doc_id, toks, CAST(s AS BIGINT) AS st
          FROM t, unnest(range(1, greatest(len(toks), 1) + 1, 24)) AS r(s)
        )
        SELECT doc_id,
               CAST((st - 1) // 24 AS BIGINT) AS chunk_idx,
               coalesce(array_to_string(toks[st:st+31], ' '), '') AS chunk_text,
               CAST(least(st + 31, len(toks)) - st + 1 AS BIGINT) AS chunk_tokens
        FROM w
    """,
    "doc_repetition_filter": r"""
        WITH t AS (
          SELECT doc_id,
                 list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
          FROM documents
        ),
        big AS (
          SELECT doc_id, toks[i] || ' ' || toks[i+1] AS g
          FROM t, unnest(range(1, len(toks))) AS r(i)
        ),
        cnt AS (SELECT doc_id, g, count(*) AS n FROM big GROUP BY doc_id, g),
        top AS (
          SELECT doc_id, g, n,
                 row_number() OVER (PARTITION BY doc_id ORDER BY n DESC, g ASC) AS rn
          FROM cnt
        ),
        st AS (SELECT doc_id, len(toks) AS nt, len(list_distinct(toks)) AS nu FROM t)
        SELECT st.doc_id,
               CAST(st.nt AS BIGINT) AS n_tokens,
               coalesce(top.g, '') AS top_bigram,
               CAST(coalesce(top.n, 0) AS BIGINT) AS top_bigram_n,
               CAST(CASE WHEN st.nt > 0 THEN (2000000 * coalesce(top.n, 0)) // st.nt
                         ELSE 0 END AS BIGINT) AS rep_micro,
               CAST(CASE WHEN st.nt > 0 THEN (1000000 * (st.nt - st.nu)) // st.nt
                         ELSE 0 END AS BIGINT) AS dup_tok_micro
        FROM st LEFT JOIN (SELECT * FROM top WHERE rn = 1) top USING (doc_id)
    """,
    "inverted_index": r"""
        WITH t AS (
          SELECT doc_id,
                 list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
          FROM documents
        ),
        tok AS (SELECT doc_id, unnest(toks) AS w FROM t),
        per AS (SELECT w, doc_id, count(*) AS n FROM tok GROUP BY w, doc_id)
        SELECT w AS token,
               CAST(count(*) AS BIGINT) AS df,
               CAST(sum(n) AS BIGINT) AS tf,
               array_to_string(list_slice(list(doc_id ORDER BY doc_id ASC), 1, 8), ',') AS postings
        FROM per GROUP BY w
    """,
    "doc_tfidf_topk": r"""
        WITH t AS (
          SELECT doc_id,
                 list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
          FROM documents
        ),
        nd AS (SELECT count(*) AS n FROM documents),
        tok AS (SELECT doc_id, unnest(toks) AS w FROM t),
        per AS (SELECT doc_id, w, count(*) AS tf FROM tok GROUP BY doc_id, w),
        dfc AS (
          SELECT w, count(DISTINCT doc_id) AS df,
                 -- integer micro-nat idf BEFORE the multiply: bit-stable
                 CAST(round(ln(CAST((SELECT n FROM nd) AS DOUBLE) / count(DISTINCT doc_id)) * 1e6) AS BIGINT) AS idf_micro
          FROM tok GROUP BY w
        ),
        sc AS (
          SELECT per.doc_id, per.w, per.tf, per.tf * dfc.idf_micro AS score,
                 row_number() OVER (
                   PARTITION BY per.doc_id
                   ORDER BY per.tf * dfc.idf_micro DESC, per.w ASC
                 ) AS rn
          FROM per JOIN dfc USING (w)
        )
        SELECT doc_id, CAST(rn AS BIGINT) AS rank, w AS token,
               CAST(tf AS BIGINT) AS tf, CAST(score AS BIGINT) AS score_micro
        FROM sc WHERE rn <= 3
    """,
    "q6_discount_revenue": """
        SELECT CAST(count(*) AS BIGINT) AS n_lines,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                        * CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) AS revenue_e4
        FROM lineitem
        WHERE l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
    """,
    "user_event_deltas": """
        WITH e2 AS (SELECT user_id, epoch_us(ts) AS t, event_id FROM events),
        d AS (
          SELECT user_id, t,
                 t - lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id) AS gap
          FROM e2
        )
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(CASE WHEN count(*) > 1
                         THEN (max(t) - min(t)) // (count(*) - 1)
                         ELSE 0 END AS BIGINT) AS mean_gap_us,
               CAST(coalesce(max(gap), 0) AS BIGINT) AS max_gap_us
        FROM d GROUP BY user_id
    """,
    "decontaminate_docs": """
        WITH bench AS (
          SELECT doc_id AS bench_doc_id,
                 array_to_string(list_slice(
                   list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> ''),
                   1, 8), ' ') AS needle
          FROM documents WHERE doc_id < 3 AND trim(text) <> ''
        )
        SELECT d.doc_id, b.bench_doc_id
        FROM documents d JOIN bench b ON position(b.needle IN d.text) > 0
    """,
    "rollup_orders_status_year": """
        WITH b AS (
          SELECT o_orderstatus AS status,
                 CAST(year(o_orderdate) AS BIGINT) AS y,
                 CAST(round(o_totalprice * 100) AS BIGINT) AS c
          FROM orders
        )
        SELECT status, y AS year, CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(c) AS BIGINT) AS sum_cents
        FROM b GROUP BY status, y
        UNION ALL
        SELECT status, CAST(-1 AS BIGINT), CAST(count(*) AS BIGINT),
               CAST(sum(c) AS BIGINT)
        FROM b GROUP BY status
        UNION ALL
        SELECT 'ALL', CAST(-1 AS BIGINT), CAST(count(*) AS BIGINT),
               CAST(sum(c) AS BIGINT)
        FROM b
    """,
    "event_transitions": """
        WITH e2 AS (
          SELECT user_id, event_type, epoch_us(ts) AS t, event_id FROM events
        ),
        d AS (
          SELECT user_id, event_type AS to_type,
                 lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY t, event_id
                 ) AS from_type
          FROM e2
        )
        SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
        FROM d WHERE from_type IS NOT NULL
        GROUP BY from_type, to_type
    """,
    "customers_with_big_orders": """
        SELECT c_custkey FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
    "pivot_events_by_type": """
        SELECT user_id,
               CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS n_click,
               CAST(coalesce(sum(CAST(round(value * 100) AS BIGINT))
                    FILTER (event_type = 'click'), 0) AS BIGINT) AS cents_click,
               CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS n_error,
               CAST(coalesce(sum(CAST(round(value * 100) AS BIGINT))
                    FILTER (event_type = 'error'), 0) AS BIGINT) AS cents_error,
               CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS n_purchase,
               CAST(coalesce(sum(CAST(round(value * 100) AS BIGINT))
                    FILTER (event_type = 'purchase'), 0) AS BIGINT) AS cents_purchase,
               CAST(count(*) FILTER (event_type = 'signup') AS BIGINT) AS n_signup,
               CAST(coalesce(sum(CAST(round(value * 100) AS BIGINT))
                    FILTER (event_type = 'signup'), 0) AS BIGINT) AS cents_signup,
               CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS n_view,
               CAST(coalesce(sum(CAST(round(value * 100) AS BIGINT))
                    FILTER (event_type = 'view'), 0) AS BIGINT) AS cents_view
        FROM events GROUP BY user_id
    """,
    "doc_quality_gate": r"""
        WITH t AS (
          SELECT doc_id,
                 list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
          FROM documents
        ),
        s AS (
          SELECT doc_id,
                 CASE WHEN len(toks) > 0
                      THEN (1000000 * len(list_filter(toks, w -> w IN
                        ('the','a','and','of','to','in','is','for','on','with'))))
                        // len(toks)
                      ELSE 0 END AS stop_micro
          FROM t
        ),
        thr AS (SELECT quantile_disc(stop_micro, 0.75) AS cutoff FROM s)
        SELECT s.doc_id, CAST(s.stop_micro AS BIGINT) AS stop_micro,
               CAST(thr.cutoff AS BIGINT) AS cutoff
        FROM s, thr WHERE s.stop_micro >= thr.cutoff
    """,
    "corr_value_hour_per_type": """
        WITH b AS (
          SELECT event_type,
                 CAST(round(value * 100) AS BIGINT) AS x,
                 CAST(hour(ts) AS BIGINT) AS y
          FROM events
        ),
        m AS (
          SELECT event_type,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(x) AS BIGINT) AS sx,
                 CAST(sum(y) AS BIGINT) AS sy,
                 CAST(sum(x * x) AS BIGINT) AS sxx,
                 CAST(sum(y * y) AS BIGINT) AS syy,
                 CAST(sum(x * y) AS BIGINT) AS sxy
          FROM b GROUP BY event_type
        )
        SELECT event_type, n,
               (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                         - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
               AS corr_value_hour
        FROM m
    """,
    "attribution_click_purchase": """
        SELECT p.event_id, p.user_id,
               CAST(count(c.event_id) AS BIGINT) AS n_clicks_1h
        FROM events p LEFT JOIN events c
          ON c.user_id = p.user_id AND c.event_type = 'click'
         AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 1 HOUR
        WHERE p.event_type = 'purchase'
        GROUP BY p.event_id, p.user_id
    """,
    "running_revenue_per_customer": """
        SELECT o_orderkey, o_custkey,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ) AS BIGINT) AS run_cents
        FROM orders
    """,
    "hll_users_per_type": """
        WITH h AS (
          SELECT DISTINCT event_type,
                 md5_number_upper(CAST(user_id AS VARCHAR)) AS h
          FROM events
        ),
        r AS (
          SELECT event_type,
                 CAST(h % 1024 AS BIGINT) AS bucket,
                 CASE WHEN h // 1024 = 0 THEN CAST(55 AS BIGINT)
                      ELSE CAST(55 - length(bin(h // 1024)) AS BIGINT)
                 END AS rho
          FROM h
        ),
        regs AS (
          SELECT event_type, bucket, max(rho) AS rho
          FROM r GROUP BY event_type, bucket
        ),
        est AS (
          SELECT event_type,
                 CAST(((CAST(720541 AS HUGEINT) * 1048576
                         * (CAST(1 AS HUGEINT) << 55))
                       // (sum(CAST(1 AS HUGEINT) << CAST(55 - rho AS INTEGER))
                           + (1024 - count(*)) * (CAST(1 AS HUGEINT) << 55)))
                      // 1000000 AS BIGINT) AS est
          FROM regs GROUP BY event_type
        )
        SELECT regs.event_type, regs.bucket, regs.rho, est.est
        FROM regs JOIN est USING (event_type)
    """,
    "doc_length_quartile": """
        SELECT doc_id, n_chars,
               CAST(ntile(4) OVER (ORDER BY n_chars, doc_id) AS BIGINT) AS tile
        FROM documents
    """,
    "q4_order_priority": """
        SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
        FROM orders o
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1996-04-01'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_returnflag = 'R')
        GROUP BY o_orderpriority
    """,
    "props_json_histogram": """
        SELECT event_type,
               CAST(json_extract(props, '$.k') AS BIGINT) AS k,
               CAST(count(*) AS BIGINT) AS n
        FROM events
        WHERE json_extract(props, '$.k') IS NOT NULL
        GROUP BY event_type, k
    """,
    "latest_event_per_user": """
        SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
        FROM (
          SELECT *, row_number() OVER (
            PARTITION BY user_id ORDER BY ts DESC, event_id DESC
          ) AS rn
          FROM events
        ) WHERE rn = 1
    """,
    "users_click_and_purchase": """
        SELECT user_id FROM events WHERE event_type = 'click'
        INTERSECT
        SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
    "cms_token_counts": r"""
        WITH toks AS (
          SELECT unnest(list_filter(string_split_regex(trim(text), '\s+'),
                                    t -> t <> '')) AS tok
          FROM documents WHERE trim(text) <> ''
        ),
        cells AS (
          SELECT r.range AS row,
                 CAST(md5_number_upper(CAST(r.range AS VARCHAR) || ':' || tok)
                      % 4096 AS BIGINT) AS col
          FROM toks, range(4) r
        )
        SELECT CAST(row AS BIGINT) AS row, col, CAST(count(*) AS BIGINT) AS n
        FROM cells GROUP BY row, col
    """,
    # rows-only (legitimately non-SQL): kmeans_embeddings (iterative,
    # float-accumulation order). Everything else is value-hash-checked —
    # f10_encrypt_pii got a pinned-VALUES ciphertext oracle in round 3;
    # multimodal_frame_features got a full oracle in round 5 when its
    # fake-decode was replaced by the real Y4M codec.
}


def _f10_values_sql() -> str:
    """Pinned VALUES oracle for f10: deterministic AES-256-CBC (fixed IV +
    fixed key derivation, CryptLib.cs:82-125 parity) means the 500 expected
    ciphertexts are constants; the join against documents keeps the row set
    honest (a missing/extra doc_id in the Ray result still mismatches)."""
    from .crypt import encrypt

    rows = ", ".join(
        f"({i}, '{encrypt(f'PATIENT-{i:05d}')}')" for i in range(F10_SLICE)
    )
    return (
        f"WITH expected(doc_id, cipher) AS (VALUES {rows}) "
        "SELECT d.doc_id, e.cipher FROM documents d "
        "JOIN expected e ON d.doc_id = e.doc_id"
    )


try:
    SQL["f10_encrypt_pii"] = _f10_values_sql()
except NotImplementedError:  # pragma: no cover - no cryptography package
    pass  # stays rows-only where the AES library is absent


SQL["resume_manifest_audit"] = """
    WITH d AS (SELECT doc_id,
                      doc_id % 3 = 0 AS has_p,
                      len(list_filter(string_split_regex(trim(text), '\\s+'),
                                      x -> x <> '')) AS ntok
               FROM documents),
    t AS (SELECT CAST(sum(1 + CASE WHEN has_p THEN 1 ELSE 0 END
                          + greatest(1, CAST(ceil(ntok / 12.0) AS BIGINT)))
                      AS BIGINT) AS n_turns,
                 CAST(count(*) AS BIGINT) AS n_convs
          FROM d)
    SELECT n_turns AS turns_manifest, n_turns AS turns_rescan,
           n_turns AS turns_input,
           n_convs AS convs_manifest, n_convs AS convs_rescan,
           CAST(1 AS BIGINT) AS resume_all_skipped
    FROM t
"""

SQL["curate_transcripts"] = (
    "WITH base AS (" + SQL["transcript_extract"] + ") "
    "SELECT conv_id, patient_name, n_turns FROM base "
    "WHERE patient_name IS NOT NULL AND n_turns BETWEEN 3 AND 40"
)


# ---- round-3 relational breadth oracles ----------------------------------
SQL["q10_returned_items"] = """
        SELECT c.c_custkey, c.c_name, n.n_name,
               CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                             AS BIGINT)) AS BIGINT) AS revenue_cents
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE l.l_returnflag = 'R'
          AND o.o_orderdate >= DATE '1996-01-01'
          AND o.o_orderdate < DATE '1996-04-01'
        GROUP BY 1, 2, 3
    """
SQL["q13_order_count_distribution"] = """
        SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        FROM (SELECT c.c_custkey,
                     CAST(count(o.o_orderkey) AS BIGINT) AS c_count
              FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
              GROUP BY 1)
        GROUP BY 1
    """
SQL["q19_bracket_revenue"] = """
        SELECT CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                             AS BIGINT)) AS BIGINT) AS revenue_cents,
               CAST(count(*) AS BIGINT) AS n_lines
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
               AND l.l_quantity BETWEEN 1 AND 11)
           OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
               AND l.l_quantity BETWEEN 10 AND 20)
           OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
               AND l.l_quantity BETWEEN 20 AND 30)
    """
SQL["q16_supplier_variety"] = """
        SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
               CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_brand <> 'Brand#1'
        GROUP BY 1, 2, 3
    """
SQL["q22_dormant_rich_customers"] = """
        WITH bal AS (SELECT c_custkey, c_mktsegment,
                            CAST(round(c_acctbal * 100) AS BIGINT) AS cents
                     FROM customer),
        pos AS (SELECT CAST(sum(cents) AS BIGINT) AS s,
                       CAST(count(*) AS BIGINT) AS n
                FROM bal WHERE cents > 0),
        lastord AS (SELECT o_custkey, max(o_orderdate) AS lastd
                    FROM orders GROUP BY 1)
        SELECT b.c_mktsegment, CAST(count(*) AS BIGINT) AS numcust,
               CAST(sum(b.cents) AS BIGINT) AS totacctbal_cents
        FROM bal b
        JOIN lastord l ON b.c_custkey = l.o_custkey, pos
        WHERE b.cents * pos.n > pos.s AND l.lastd < DATE '2000-01-01'
        GROUP BY 1
    """

# ---- round-3 sketch / window / semantic-dedup oracles --------------------
SQL["heavy_hitters_tokens"] = r"""
        SELECT token, n, CAST(0 AS BIGINT) AS err_bound FROM (
          SELECT token, count(*) AS n FROM (
            SELECT unnest(list_filter(string_split_regex(trim(text), '\s+'),
                                      t -> t <> '')) AS token
            FROM documents WHERE trim(text) <> ''
          ) GROUP BY token
        ) ORDER BY n DESC, token LIMIT 40
    """
SQL["top_orders_per_priority_dense"] = """
        SELECT o_orderpriority, o_orderkey, total_cents, rnk FROM (
          SELECT o_orderpriority, o_orderkey,
                 CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents,
                 CAST(dense_rank() OVER (
                     PARTITION BY o_orderpriority
                     ORDER BY CAST(round(o_totalprice * 100) AS BIGINT) DESC
                 ) AS BIGINT) AS rnk
          FROM orders)
        WHERE rnk <= 3
    """
SQL["doc_trigram_top20"] = r"""
        WITH tk AS (SELECT list_filter(string_split_regex(trim(text), '\s+'),
                                       x -> x <> '') AS toks
                    FROM documents),
        tg AS (SELECT array_to_string(toks[i:i+2], ' ') AS trigram
               FROM tk, unnest(range(1, len(toks) - 1)) AS r(i)
               WHERE len(toks) >= 3)
        SELECT trigram, CAST(count(*) AS BIGINT) AS n FROM tg
        GROUP BY 1 ORDER BY n DESC, trigram LIMIT 20
    """
SQL["semdedup_embeddings"] = """
        WITH signs AS (
          SELECT j, i, CASE WHEN md5_number_upper(CAST(j AS VARCHAR) || ':' ||
                                                  CAST(i AS VARCHAR)) % 2 = 1
                            THEN 1 ELSE -1 END AS s
          FROM (SELECT unnest(range(8)) AS j), (SELECT unnest(range(64)) AS i)
        ),
        x AS (SELECT vec_id, unnest(range(len(embedding))) AS i,
                     CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                          AS BIGINT) AS xi
              FROM embeddings),
        dots AS (SELECT x.vec_id, s.j, sum(s.s * x.xi) AS d
                 FROM x JOIN signs s ON x.i = s.i GROUP BY 1, 2),
        b AS (SELECT vec_id,
                     CAST(sum(CASE WHEN d >= 0 THEN 1 << j ELSE 0 END)
                          AS BIGINT) AS bucket_id
              FROM dots GROUP BY 1),
        nrm AS (SELECT vec_id, sum(xi * xi) AS nn FROM x GROUP BY 1),
        pair AS (SELECT a.vec_id AS va, bb.vec_id AS vb
                 FROM b a JOIN b bb ON a.bucket_id = bb.bucket_id
                                    AND bb.vec_id < a.vec_id),
        dt AS (SELECT p.va, p.vb, sum(xa.xi * xb.xi) AS num
               FROM pair p
               JOIN x xa ON xa.vec_id = p.va
               JOIN x xb ON xb.vec_id = p.vb AND xb.i = xa.i
               GROUP BY 1, 2),
        dup AS (SELECT dt.va, min(dt.vb) AS dup_of
                FROM dt
                JOIN nrm na ON na.vec_id = dt.va
                JOIN nrm nb ON nb.vec_id = dt.vb
                WHERE dt.num > 0
                  AND CAST(dt.num AS HUGEINT) * dt.num * 100
                      >= 16 * CAST(na.nn AS HUGEINT) * nb.nn
                GROUP BY 1)
        SELECT b.vec_id, b.bucket_id,
               CAST(COALESCE(dup.dup_of, -1) AS BIGINT) AS dup_of,
               dup.dup_of IS NULL AS kept
        FROM b LEFT JOIN dup ON b.vec_id = dup.va
    """

# ---- round-3 wave-3 oracles ----------------------------------------------
SQL["t5_span_corruption_stats"] = r"""
        WITH tk AS (
          SELECT doc_id,
                 CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
                                      x -> x <> '')) AS BIGINT) AS n
          FROM documents
        ),
        blk AS (
          SELECT doc_id, n, CAST(b AS BIGINT) AS b
          FROM tk, unnest(range(CAST(ceil(n / 20.0) AS BIGINT))) AS r(b)
          WHERE n > 0
        ),
        s AS (
          SELECT doc_id, n, b,
                 b * 20 + CAST(md5_number_upper(CAST(doc_id AS VARCHAR) || ':' ||
                                                CAST(b AS VARCHAR)) % 18
                               AS BIGINT) AS pos0
          FROM blk
        ),
        agg AS (
          SELECT doc_id,
                 CAST(sum(CASE WHEN pos0 < n THEN least(3, n - pos0) ELSE 0 END)
                      AS BIGINT) AS n_masked,
                 CAST(sum(CASE WHEN pos0 < n THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_spans
          FROM s GROUP BY 1
        )
        SELECT tk.doc_id, tk.n AS n_tokens,
               CAST(coalesce(agg.n_masked, 0) AS BIGINT) AS n_masked,
               CAST(coalesce(agg.n_spans, 0) AS BIGINT) AS n_spans
        FROM tk LEFT JOIN agg USING (doc_id)
"""

SQL["conv_packing_plan"] = r"""
        WITH RECURSIVE d AS (
          SELECT doc_id,
                 'doc-' || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS conv_id,
                 CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
                                      x -> x <> '')) AS BIGINT) AS ntok,
                 greatest(CAST(ceil(len(list_filter(string_split_regex(trim(text), '\s+'),
                                                    x -> x <> '')) / 12.0) AS BIGINT),
                          1) AS nchunks
          FROM documents
        ),
        turnlist AS (
          SELECT conv_id, CAST(0 AS BIGINT) AS idx, CAST(8 AS BIGINT) AS t FROM d
          UNION ALL
          SELECT conv_id, CAST(1 AS BIGINT), CAST(6 AS BIGINT)
          FROM d WHERE doc_id % 3 = 0
          UNION ALL
          SELECT conv_id, CAST(j + 2 AS BIGINT),
                 CASE WHEN ntok = 0 THEN CAST(0 AS BIGINT)
                      ELSE least(CAST(12 AS BIGINT), ntok - 12 * j) END
          FROM d, unnest(range(nchunks)) AS r(j)
        ),
        tk AS (
          SELECT conv_id, t,
                 row_number() OVER (PARTITION BY conv_id ORDER BY idx) AS k
          FROM turnlist
        ),
        agg AS (
          SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns,
                 CAST(sum(t) AS BIGINT) AS n_tokens,
                 max(k) AS kmax
          FROM tk GROUP BY 1
        ),
        rec(conv_id, k, acc, w) AS (
          SELECT conv_id, k, t, CAST(1 AS BIGINT) FROM tk WHERE k = 1
          UNION ALL
          SELECT r.conv_id, r.k + 1,
                 CASE WHEN r.acc + tk.t <= 128 THEN r.acc + tk.t ELSE tk.t END,
                 CASE WHEN r.acc + tk.t <= 128 THEN r.w ELSE r.w + 1 END
          FROM rec r JOIN tk ON tk.conv_id = r.conv_id AND tk.k = r.k + 1
        )
        SELECT a.conv_id, a.n_turns, a.n_tokens,
               CAST(r.w AS BIGINT) AS n_windows,
               CAST(round(CAST(a.n_tokens AS DOUBLE) * 1e6 / (r.w * 128))
                    AS BIGINT) AS fill_e6
        FROM agg a JOIN rec r ON r.conv_id = a.conv_id AND r.k = a.kmax
"""

SQL["conv_role_audit"] = r"""
        WITH d AS (
          SELECT doc_id,
                 'doc-' || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS conv_id,
                 greatest(CAST(ceil(len(list_filter(string_split_regex(trim(text), '\s+'),
                                                    x -> x <> '')) / 12.0) AS BIGINT),
                          1) AS nchunks
          FROM documents
        ),
        turns AS (
          SELECT doc_id, conv_id, CAST(0 AS BIGINT) AS idx FROM d
          UNION ALL
          SELECT doc_id, conv_id, CAST(1 AS BIGINT) FROM d WHERE doc_id % 3 = 0
          UNION ALL
          SELECT doc_id, conv_id, CAST(i AS BIGINT)
          FROM d, unnest(range(2, nchunks + 2)) AS r(i)
        ),
        roles AS (
          SELECT doc_id, conv_id, idx,
                 CASE WHEN idx = 0 THEN 0
                      WHEN (doc_id + idx) % 7 = 0 THEN 3
                      WHEN idx % 2 = 1 THEN 1 ELSE 2 END AS role
          FROM turns
        ),
        agg AS (
          SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns,
                 CAST(sum(CASE WHEN role = 3 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_tool_turns
          FROM roles GROUP BY 1
        ),
        kept AS (
          SELECT conv_id, role,
                 lag(role) OVER (PARTITION BY conv_id ORDER BY idx) AS prev
          FROM roles WHERE role <> 3
        ),
        v AS (
          SELECT conv_id,
                 CAST(sum(CASE WHEN role = prev THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_violations
          FROM kept GROUP BY 1
        )
        SELECT a.conv_id, a.n_turns, a.n_tool_turns,
               CAST(coalesce(v.n_violations, 0) AS BIGINT) AS n_violations,
               coalesce(v.n_violations, 0) = 0 AS ok
        FROM agg a LEFT JOIN v USING (conv_id)
"""

def _gazetteer_sql() -> str:
    from .gazetteer import TERMS

    cnt = [
        f"((len(text) - len(replace(text, '{t}', ''))) // {len(t)})"
        for t in TERMS
    ]
    return (
        "SELECT doc_id, CAST(" + " + ".join(cnt) + " AS BIGINT) AS n_matches, "
        "CAST(" + " + ".join(f"CASE WHEN {c} > 0 THEN 1 ELSE 0 END" for c in cnt)
        + " AS BIGINT) AS n_terms FROM documents"
    )


SQL["gazetteer_match_counts"] = _gazetteer_sql()

SQL["trigram_diversity_per_source"] = r"""
        WITH d AS (
          SELECT source,
                 list_filter(string_split_regex(trim(text), '\s+'),
                             x -> x <> '') AS L
          FROM documents
        ),
        tri AS (
          SELECT source, L[i + 1] || ' ' || L[i + 2] || ' ' || L[i + 3] AS g
          FROM d, unnest(range(len(L) - 2)) AS r(i)
          WHERE len(L) >= 3
        )
        SELECT source, CAST(count(*) AS BIGINT) AS n_trigrams,
               CAST(count(DISTINCT g) AS BIGINT) AS n_distinct,
               CAST(round(CAST(count(DISTINCT g) AS DOUBLE) * 1e6 / count(*))
                    AS BIGINT) AS diversity_e6
        FROM tri GROUP BY source
"""

SQL["contract_audit_documents"] = r"""
        SELECT 'doc_id_unique' AS rule,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(*) - count(DISTINCT doc_id) AS BIGINT)
                   AS n_violations,
               count(*) = count(DISTINCT doc_id) AS ok
        FROM documents
        UNION ALL
        SELECT 'text_not_null', CAST(count(*) AS BIGINT),
               CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) = 0
        FROM documents
        UNION ALL
        SELECT 'lang_in_set', CAST(count(*) AS BIGINT),
               CAST(sum(CASE WHEN lang IS NULL OR lang NOT IN
                        ('en','de','fr','es','zh') THEN 1 ELSE 0 END)
                    AS BIGINT),
               sum(CASE WHEN lang IS NULL OR lang NOT IN
                   ('en','de','fr','es','zh') THEN 1 ELSE 0 END) = 0
        FROM documents
        UNION ALL
        SELECT 'n_chars_nonneg', CAST(count(*) AS BIGINT),
               CAST(sum(CASE WHEN n_chars IS NULL OR n_chars < 0
                        THEN 1 ELSE 0 END) AS BIGINT),
               sum(CASE WHEN n_chars IS NULL OR n_chars < 0
                   THEN 1 ELSE 0 END) = 0
        FROM documents
        UNION ALL
        SELECT 'source_format', CAST(count(*) AS BIGINT),
               CAST(sum(CASE WHEN source IS NULL OR NOT
                        regexp_full_match(source, 'src\d+')
                        THEN 1 ELSE 0 END) AS BIGINT),
               sum(CASE WHEN source IS NULL OR NOT
                   regexp_full_match(source, 'src\d+')
                   THEN 1 ELSE 0 END) = 0
        FROM documents
"""

SQL["corpus_datasheet"] = r"""
        WITH tok AS (
          SELECT unnest(list_filter(string_split_regex(trim(text), '\s+'),
                                    x -> x <> '')) AS w
          FROM documents
        )
        SELECT
          (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs,
          (SELECT CAST(count(DISTINCT source) AS BIGINT) FROM documents)
              AS n_sources,
          (SELECT CAST(count(DISTINCT lang) AS BIGINT) FROM documents)
              AS n_langs,
          (SELECT CAST(count(*) AS BIGINT) FROM tok) AS n_tokens,
          (SELECT CAST(sum(n_chars) AS BIGINT) FROM documents) AS n_chars,
          (SELECT CAST(count(DISTINCT w) AS BIGINT) FROM tok) AS vocab_size,
          (SELECT CAST(count(*) - count(DISTINCT md5(text)) AS BIGINT)
           FROM documents) AS n_dup_docs
"""

SQL["length_bucket_batching_plan"] = r"""
        WITH n AS (
          SELECT CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
                                      x -> x <> '')) AS BIGINT) AS nt
          FROM documents
        ),
        agg AS (
          SELECT (nt + 31) // 32 AS bucket,
                 CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(nt) AS BIGINT) AS n_tokens
          FROM n GROUP BY 1
        )
        SELECT CAST(bucket AS BIGINT) AS bucket, n_docs, n_tokens,
               CAST(CASE WHEN bucket * 32 * n_docs = 0 THEN 0
                    ELSE round(CAST(bucket * 32 * n_docs - n_tokens AS DOUBLE)
                               * 1e6 / (bucket * 32 * n_docs))
                    END AS BIGINT) AS pad_waste_e6
        FROM agg
"""

SQL["turn_dedup_normalized"] = r"""
        WITH d AS (
          SELECT doc_id,
                 'doc-' || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS conv_id,
                 'INVOICE 1' || lpad(CAST(doc_id AS VARCHAR), 5, '0') || ' DATE ' ||
                   printf('%02d/%02d/%d', doc_id % 12 + 1, doc_id % 28 + 1, 1990 + doc_id % 30) ||
                   ' REFERENCE AB' || CAST(doc_id AS VARCHAR) || 'X TOTAL $' ||
                   CAST(doc_id % 900 + 100 AS VARCHAR) || '.25' AS header,
                 CASE WHEN doc_id % 3 = 0 THEN
                   'PATIENT NAME ' ||
                   (['MARY','JOHN','ALICE','ROBERT','LINDA'])[CAST(doc_id // 3 AS INT) % 5 + 1] || ' ' ||
                   (['SMITH','JONES','TAYLOR','BROWN','WILSON'])[CAST(doc_id // 7 AS INT) % 5 + 1] ||
                   ' DOB ' || printf('%02d/%02d/%d', doc_id % 12 + 1, doc_id % 25 + 1, 1975 + doc_id % 40)
                 END AS pline,
                 list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
          FROM documents
        ),
        turns AS (
          SELECT conv_id, header AS text FROM d
          UNION ALL
          SELECT conv_id, pline FROM d WHERE pline IS NOT NULL
          UNION ALL
          SELECT conv_id,
                 coalesce(array_to_string(
                   toks[CAST(i*12+1 AS INT) : CAST(i*12+12 AS INT)], ' '), '')
          FROM d, unnest(range(0, greatest(1, CAST(ceil(len(toks) / 12.0) AS BIGINT)))) t(i)
        ),
        norm AS (
          SELECT conv_id,
                 md5(regexp_replace(
                       lower(regexp_replace(trim(text), '\s+', ' ', 'g')),
                       '[0-9]+', '0', 'g')) AS norm_hash
          FROM turns
        )
        SELECT norm_hash, min(conv_id) AS rep_conv,
               CAST(count(*) AS BIGINT) AS n_copies,
               CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs
        FROM norm GROUP BY norm_hash
"""

SQL["boilerplate_prefix_per_source"] = r"""
        WITH p AS (
          SELECT source,
                 coalesce(array_to_string(
                   list_filter(string_split_regex(trim(text), '\s+'),
                               x -> x <> '')[1:8], ' '), '') AS prefix
          FROM documents
        ),
        cnt AS (
          SELECT source, prefix, CAST(count(*) AS BIGINT) AS c
          FROM p GROUP BY 1, 2
        ),
        ranked AS (
          SELECT source, prefix, c,
                 CAST(sum(c) OVER (PARTITION BY source) AS BIGINT) AS n_docs,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY c DESC, prefix ASC) AS rk
          FROM cnt
        )
        SELECT source, prefix, c AS n_docs_with_prefix, n_docs
        FROM ranked WHERE rk = 1
"""

SQL["doc_max_repeated_ngram"] = r"""
        WITH d AS (
          SELECT doc_id,
                 list_filter(string_split_regex(trim(text), '\s+'),
                             x -> x <> '') AS L
          FROM documents
        ),
        g AS (
          SELECT doc_id, l.l AS l,
                 array_to_string(list_slice(d.L, r.i + 1, r.i + l.l), ' ')
                     AS gram
          FROM d,
               unnest(range(1, 17)) AS l(l),
               unnest(range(len(d.L) - l.l + 1)) AS r(i)
        ),
        cnt AS (
          SELECT doc_id, l, gram, count(*) AS c FROM g GROUP BY 1, 2, 3
        ),
        rep AS (
          SELECT doc_id, l, CAST(count(*) AS BIGINT) AS ndup
          FROM cnt WHERE c >= 2 GROUP BY 1, 2
        ),
        mx AS (SELECT doc_id, max(l) AS max_rep_len FROM rep GROUP BY 1)
        SELECT d.doc_id, CAST(len(d.L) AS BIGINT) AS n_tokens,
               CAST(coalesce(mx.max_rep_len, 0) AS BIGINT) AS max_rep_len,
               CAST(coalesce(rep.ndup, 0) AS BIGINT) AS n_dup_at_max
        FROM d
        LEFT JOIN mx USING (doc_id)
        LEFT JOIN rep ON rep.doc_id = d.doc_id AND rep.l = mx.max_rep_len
"""

SQL["shuffle_skew_audit"] = r"""
        WITH d AS (
          SELECT doc_id,
                 'doc-' || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS conv_id,
                 greatest(CAST(ceil(len(list_filter(string_split_regex(trim(text), '\s+'),
                                                    x -> x <> '')) / 12.0) AS BIGINT),
                          1) AS nchunks
          FROM documents
        ),
        pc AS (
          SELECT CAST(md5_number_upper(conv_id) % 64 AS BIGINT) AS bucket,
                 CAST(1 + CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END
                        + nchunks AS BIGINT) AS c
          FROM d
        )
        SELECT bucket, CAST(sum(c) AS BIGINT) AS n_rows,
               CAST(count(*) AS BIGINT) AS n_convs,
               CAST(max(c) AS BIGINT) AS max_conv_rows
        FROM pc GROUP BY bucket
"""

SQL["histogram_quantiles_value"] = r"""
        WITH b AS (
          SELECT event_type,
                 CAST(least(greatest(floor(value), 0), 1023) AS BIGINT) AS bin
          FROM events
        ),
        h AS (
          SELECT event_type, bin, CAST(count(*) AS BIGINT) AS c
          FROM b GROUP BY 1, 2
        ),
        t AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n FROM h GROUP BY 1),
        cum AS (
          SELECT event_type, bin,
                 sum(c) OVER (PARTITION BY event_type ORDER BY bin) AS cc
          FROM h
        )
        SELECT cum.event_type, t.n AS n_events,
               min(CASE WHEN cc >= (t.n * 50 + 99) // 100 THEN bin END)
                   AS p50_bin,
               min(CASE WHEN cc >= (t.n * 95 + 99) // 100 THEN bin END)
                   AS p95_bin,
               min(CASE WHEN cc >= (t.n * 99 + 99) // 100 THEN bin END)
                   AS p99_bin
        FROM cum JOIN t USING (event_type)
        GROUP BY cum.event_type, t.n
"""

SQL["source_token_js_divergence"] = r"""
        WITH tok AS (
          SELECT source,
                 unnest(list_filter(string_split_regex(trim(text), '\s+'),
                                    x -> x <> '')) AS w
          FROM documents
        ),
        sc AS (SELECT source, w, CAST(count(*) AS BIGINT) AS c
               FROM tok GROUP BY 1, 2),
        ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM sc GROUP BY 1),
        tot AS (SELECT w, CAST(sum(c) AS BIGINT) AS tc FROM sc GROUP BY 1),
        nc AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM sc),
        grid AS (
          SELECT s.source, t.w, t.tc, coalesce(sc.c, 0) AS c
          FROM (SELECT DISTINCT source FROM sc) s
          CROSS JOIN tot t
          LEFT JOIN sc ON sc.source = s.source AND sc.w = t.w
        ),
        term AS (
          SELECT g.source, ns.n,
                 CAST(round((
                   CASE WHEN g.c > 0 THEN
                     0.5 * (CAST(g.c AS DOUBLE) / ns.n)
                         * ln((CAST(g.c AS DOUBLE) / ns.n)
                              / ((CAST(g.c AS DOUBLE) / ns.n
                                  + CAST(g.tc AS DOUBLE) / nc.n) / 2))
                   ELSE 0 END
                   +
                   CASE WHEN g.tc > 0 THEN
                     0.5 * (CAST(g.tc AS DOUBLE) / nc.n)
                         * ln((CAST(g.tc AS DOUBLE) / nc.n)
                              / ((CAST(g.c AS DOUBLE) / ns.n
                                  + CAST(g.tc AS DOUBLE) / nc.n) / 2))
                   ELSE 0 END) * 1e6) AS BIGINT) AS e
          FROM grid g JOIN ns ON ns.source = g.source CROSS JOIN nc
        )
        SELECT source, CAST(any_value(n) AS BIGINT) AS n_tokens,
               CAST(sum(e) AS BIGINT) AS js_e6
        FROM term GROUP BY source
"""

SQL["oov_rate_vs_vocab"] = r"""
        WITH tok AS (
          SELECT doc_id,
                 unnest(list_filter(string_split_regex(trim(text), '\s+'),
                                    x -> x <> '')) AS w
          FROM documents
        ),
        vocab AS (
          SELECT w FROM tok GROUP BY w
          ORDER BY count(*) DESC, w LIMIT 16
        ),
        per AS (
          SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                 CAST(sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_oov
          FROM tok t LEFT JOIN vocab v USING (w)
          GROUP BY t.doc_id
        )
        SELECT d.doc_id,
               CAST(coalesce(p.n_tokens, 0) AS BIGINT) AS n_tokens,
               CAST(coalesce(p.n_oov, 0) AS BIGINT) AS n_oov,
               CAST(CASE WHEN coalesce(p.n_tokens, 0) = 0 THEN 0
                    ELSE round(CAST(p.n_oov AS DOUBLE) * 1e6 / p.n_tokens)
                    END AS BIGINT) AS oov_e6
        FROM documents d LEFT JOIN per p USING (doc_id)
"""

SQL["sft_pair_extract"] = r"""
        WITH d AS (
          SELECT doc_id,
                 'doc-' || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS conv_id,
                 CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
                                      x -> x <> '')) AS BIGINT) AS ntok,
                 greatest(CAST(ceil(len(list_filter(string_split_regex(trim(text), '\s+'),
                                                    x -> x <> '')) / 12.0) AS BIGINT),
                          1) AS nchunks
          FROM documents
        ),
        turns AS (
          SELECT doc_id, conv_id, CAST(0 AS BIGINT) AS idx,
                 CAST(8 AS BIGINT) AS t FROM d
          UNION ALL
          SELECT doc_id, conv_id, CAST(1 AS BIGINT), CAST(6 AS BIGINT)
          FROM d WHERE doc_id % 3 = 0
          UNION ALL
          SELECT doc_id, conv_id, CAST(j + 2 AS BIGINT),
                 CASE WHEN ntok = 0 THEN CAST(0 AS BIGINT)
                      ELSE least(CAST(12 AS BIGINT), ntok - 12 * j) END
          FROM d, unnest(range(nchunks)) AS r(j)
        ),
        roles AS (
          SELECT conv_id, idx, t,
                 CASE WHEN idx = 0 THEN 0
                      WHEN (doc_id + idx) % 7 = 0 THEN 3
                      WHEN idx % 2 = 1 THEN 1 ELSE 2 END AS role
          FROM turns
        ),
        seq AS (
          SELECT conv_id, idx AS user_idx, t AS prompt_tokens, role,
                 lead(idx) OVER w AS asst_idx,
                 lead(t) OVER w AS response_tokens,
                 lead(role) OVER w AS next_role
          FROM roles WINDOW w AS (PARTITION BY conv_id ORDER BY idx)
        )
        SELECT conv_id, user_idx, asst_idx, prompt_tokens, response_tokens
        FROM seq WHERE role = 1 AND next_role = 2
"""

SQL["bitext_mine_pairs"] = """
        WITH signs AS (
          SELECT j, i, CASE WHEN md5_number_upper(CAST(j AS VARCHAR) || ':' ||
                                                  CAST(i AS VARCHAR)) % 2 = 1
                            THEN 1 ELSE -1 END AS s
          FROM (SELECT unnest(range(8)) AS j), (SELECT unnest(range(64)) AS i)
        ),
        x AS (SELECT vec_id, unnest(range(len(embedding))) AS i,
                     CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                          AS BIGINT) AS xi
              FROM embeddings),
        dots AS (SELECT x.vec_id, s.j, sum(s.s * x.xi) AS d
                 FROM x JOIN signs s ON x.i = s.i GROUP BY 1, 2),
        b AS (SELECT vec_id,
                     CAST(sum(CASE WHEN d >= 0 THEN 1 << j ELSE 0 END)
                          AS BIGINT) AS bucket_id
              FROM dots GROUP BY 1),
        side AS (SELECT b.vec_id, b.bucket_id, d.lang, (d.lang = 'en') AS is_en
                 FROM b JOIN documents d ON d.doc_id = b.vec_id),
        nrm AS (SELECT vec_id, sum(xi * xi) AS nn FROM x GROUP BY 1),
        pair AS (SELECT e.vec_id AS en_id, o.vec_id AS other_id, o.lang
                 FROM side e JOIN side o ON e.bucket_id = o.bucket_id
                 WHERE e.is_en AND NOT o.is_en),
        dt AS (SELECT p.en_id, p.other_id, p.lang, sum(xa.xi * xb.xi) AS num
               FROM pair p
               JOIN x xa ON xa.vec_id = p.en_id
               JOIN x xb ON xb.vec_id = p.other_id AND xb.i = xa.i
               GROUP BY 1, 2, 3),
        sc AS (SELECT dt.en_id, dt.other_id, dt.lang,
                      CAST(dt.num AS DOUBLE) /
                      sqrt(CAST(na.nn AS DOUBLE) * CAST(nb.nn AS DOUBLE)) AS score
               FROM dt
               JOIN nrm na ON na.vec_id = dt.en_id
               JOIN nrm nb ON nb.vec_id = dt.other_id),
        fwd AS (SELECT *, row_number() OVER (PARTITION BY other_id
                                             ORDER BY score DESC, en_id ASC) AS r
                FROM sc),
        rev AS (SELECT en_id, other_id,
                       row_number() OVER (PARTITION BY en_id
                                          ORDER BY score DESC, other_id ASC) AS r
                FROM sc)
        SELECT f.en_id, f.other_id, f.lang AS other_lang,
               CAST(round(f.score * 1000000) AS BIGINT) AS score_e6
        FROM fwd f
        JOIN rev r ON r.en_id = f.en_id AND r.other_id = f.other_id
        WHERE f.r = 1 AND r.r = 1
"""

SQL["doc_token_entropy"] = r"""
    WITH tk AS (SELECT doc_id,
                       list_filter(string_split_regex(trim(text), '\s+'),
                                   x -> x <> '') AS toks
                FROM documents),
    tok AS (SELECT doc_id, unnest(toks) AS w FROM tk),
    c AS (SELECT doc_id, w, count(*) AS c FROM tok GROUP BY 1, 2),
    s AS (SELECT doc_id,
                 CAST(sum(CAST(round(c * ln(c) * 1000000) AS BIGINT))
                      AS BIGINT) AS sc,
                 CAST(sum(c) AS BIGINT) AS n
          FROM c GROUP BY 1)
    SELECT doc_id, n AS n_tokens,
           CAST(round(n * ln(n) * 1000000) AS BIGINT) - sc AS ent_n_micro
    FROM s
"""
SQL["events_csv_source"] = """
    SELECT event_type,
           CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT)
               AS sum_micro,
           CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY 1
"""
SQL["dedup_containment"] = r"""
    WITH tk AS (SELECT doc_id,
                       list_filter(string_split_regex(trim(text), '\s+'),
                                   x -> x <> '') AS toks
                FROM documents),
    sh AS (SELECT DISTINCT doc_id, array_to_string(toks[i:i+2], ' ') AS s
           FROM tk, unnest(range(1, len(toks) - 1)) AS r(i)
           WHERE len(toks) >= 3),
    rare AS (SELECT s FROM sh GROUP BY s HAVING count(*) BETWEEN 2 AND 5),
    cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
             FROM sh a JOIN rare USING (s) JOIN sh b USING (s)
             WHERE a.doc_id < b.doc_id),
    sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS m FROM sh GROUP BY 1),
    inter AS (SELECT c.da, c.db, CAST(count(*) AS BIGINT) AS overlap
              FROM cand c
              JOIN sh x ON x.doc_id = c.da
              JOIN sh y ON y.doc_id = c.db AND y.s = x.s
              GROUP BY 1, 2)
    SELECT i.da AS doc_a, i.db AS doc_b, i.overlap,
           CAST((10000 * i.overlap + least(sa.m, sb.m) // 2)
                // least(sa.m, sb.m) AS BIGINT) AS containment_bp
    FROM inter i
    JOIN sz sa ON sa.doc_id = i.da
    JOIN sz sb ON sb.doc_id = i.db
    WHERE i.overlap * 10 >= 8 * least(sa.m, sb.m)
"""

# salted fold must be bit-identical to the unsalted oracle
SQL["transcript_extract_salted"] = SQL["transcript_extract"]

SQL["audio_zcr_stats"] = """
    WITH d AS (SELECT doc_id, 64 + doc_id % 129 AS n FROM documents),
    s AS (SELECT doc_id, i, ((doc_id * 31 + i * 7919) % 65536) - 32768 AS v
          FROM d, unnest(range(n)) AS r(i)),
    p AS (SELECT doc_id, v,
                 lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv
          FROM s)
    SELECT doc_id AS media_id,
           CAST(count(*) AS BIGINT) AS n_samples,
           CAST(count(*) FILTER (pv IS NOT NULL AND pv * v < 0) AS BIGINT)
               AS zcr,
           CAST(sum(abs(v)) AS BIGINT) AS abs_sum
    FROM p GROUP BY 1
"""

SQL["orders_monthly_growth"] = """
    WITH m AS (SELECT strftime(o_orderdate, '%Y-%m') AS month,
                      CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                           AS BIGINT) AS revenue_cents,
                      CAST(count(*) AS BIGINT) AS n_orders
               FROM orders GROUP BY 1)
    SELECT month, revenue_cents, n_orders,
           CAST(COALESCE(
               (revenue_cents - lag(revenue_cents) OVER (ORDER BY month))
               * 10000 // abs(lag(revenue_cents) OVER (ORDER BY month)),
               -1000000000) AS BIGINT) AS growth_bp
    FROM m
"""
SQL["event_anomaly_days"] = """
    WITH c AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
                      CAST(count(*) AS BIGINT) AS n
               FROM events GROUP BY 1, 2),
    st AS (SELECT event_type,
                  CAST(count(*) AS HUGEINT) AS nd,
                  CAST(sum(n) AS HUGEINT) AS s,
                  CAST(sum(CAST(n AS HUGEINT) * n) AS HUGEINT) AS q
           FROM c GROUP BY 1)
    SELECT c.event_type, c.day, c.n,
           (CAST(c.n AS HUGEINT) * st.nd - st.s)
             * (CAST(c.n AS HUGEINT) * st.nd - st.s)
             > 4 * (st.nd * st.q - st.s * st.s) AS is_anomaly
    FROM c JOIN st USING (event_type)
"""

SQL["html_main_content"] = r"""
    WITH d AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
      FROM documents
    ),
    chunks AS (
      SELECT doc_id, CAST(i AS BIGINT) AS ci,
             array_to_string(toks[CAST(i*20+1 AS INT) : CAST(i*20+20 AS INT)], ' ') AS para
      FROM d, unnest(range(0, CAST(ceil(len(toks) / 20.0) AS BIGINT))) t(i)
    ),
    agg AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_paras,
             CAST(count(*) FILTER (WHERE len(para) >= 25) AS BIGINT) AS n_keptp,
             string_agg(para, chr(10) ORDER BY ci)
               FILTER (WHERE len(para) >= 25) AS kept_body
      FROM chunks GROUP BY doc_id
    )
    SELECT d.doc_id,
           coalesce(a.kept_body || chr(10), '') ||
             'related reading for document ' ||
             lpad(CAST(d.doc_id AS VARCHAR), 8, '0') ||
             ' item ' || CAST(d.doc_id % 100 AS VARCHAR) ||
             ': see more here details' AS main_text,
           coalesce(a.n_paras, 0) + 2 AS n_blocks,
           coalesce(a.n_keptp, 0) + 1 AS n_kept
    FROM d LEFT JOIN agg a USING (doc_id)
"""

SQL["conv_context_windows"] = r"""
    WITH d AS (
      SELECT doc_id,
             'doc-' || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS conv_id,
             'INVOICE 1' || lpad(CAST(doc_id AS VARCHAR), 5, '0') || ' DATE ' ||
               printf('%02d/%02d/%d', doc_id % 12 + 1, doc_id % 28 + 1, 1990 + doc_id % 30) ||
               ' REFERENCE AB' || CAST(doc_id AS VARCHAR) || 'X TOTAL $' ||
               CAST(doc_id % 900 + 100 AS VARCHAR) || '.25' AS header,
             CASE WHEN doc_id % 3 = 0 THEN
               'PATIENT NAME ' ||
               (['MARY','JOHN','ALICE','ROBERT','LINDA'])[CAST(doc_id // 3 AS INT) % 5 + 1] || ' ' ||
               (['SMITH','JONES','TAYLOR','BROWN','WILSON'])[CAST(doc_id // 7 AS INT) % 5 + 1] ||
               ' DOB ' || printf('%02d/%02d/%d', doc_id % 12 + 1, doc_id % 25 + 1, 1975 + doc_id % 40)
             END AS pline,
             list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
      FROM documents
    ),
    turns AS (
      SELECT conv_id, 0 AS turn_idx, header AS text FROM d
      UNION ALL
      SELECT conv_id, 1, pline FROM d WHERE pline IS NOT NULL
      UNION ALL
      SELECT conv_id, CAST(i + 2 AS INT),
             array_to_string(toks[CAST(i*12+1 AS INT) : CAST(i*12+12 AS INT)], ' ')
      FROM d, unnest(range(0, greatest(1, CAST(ceil(len(toks) / 12.0) AS BIGINT)))) t(i)
    )
    SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx,
           CAST(count(*) OVER w AS BIGINT) AS n_ctx,
           CAST(coalesce(sum(len(text)) OVER w, 0) AS BIGINT) AS ctx_chars
    FROM turns
    WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx
                 ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING)
"""

SQL["bm25_topk"] = r"""
    WITH tok AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(trim(text), '\s+'),
                                x -> x <> '')) AS token
      FROM documents
    ),
    dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tok GROUP BY 1),
    tot AS (SELECT CAST(sum(dl) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n
            FROM dl),
    terms AS (
      SELECT token FROM (SELECT token, count(*) AS c FROM tok GROUP BY 1)
      ORDER BY c DESC, token LIMIT 3
    ),
    tf AS (
      SELECT token AS term, doc_id, CAST(count(*) AS BIGINT) AS tf
      FROM tok JOIN terms USING (token) GROUP BY 1, 2
    ),
    scored AS (
      SELECT t.term, t.doc_id, t.tf, d.dl,
             CAST(10 * t.tf * tot.s AS DOUBLE) /
             CAST(10 * t.tf * tot.s + 3 * tot.s + 9 * d.dl * tot.n AS DOUBLE)
               AS sc
      FROM tf t JOIN dl d USING (doc_id), tot
    )
    SELECT term,
           CAST(row_number() OVER (PARTITION BY term ORDER BY sc DESC, doc_id)
                AS BIGINT) AS rank,
           doc_id, tf, dl
    FROM scored
    QUALIFY rank <= 10
"""

SQL["neardup_triangles"] = (
    "WITH e0 AS (" + SQL["dedup_ngram_jaccard"] + r"""),
    e AS (
      SELECT DISTINCT least(CAST(doc_a AS BIGINT), CAST(doc_b AS BIGINT)) AS a,
                      greatest(CAST(doc_a AS BIGINT), CAST(doc_b AS BIGINT)) AS b
      FROM e0
    ),
    v AS (SELECT a AS x FROM e UNION SELECT b FROM e),
    tri AS (
      SELECT count(*) AS t
      FROM e e1 JOIN e e2 ON e2.a = e1.b
                JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    )
    SELECT CAST((SELECT count(*) FROM v) AS BIGINT) AS n_vertices,
           CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
           CAST((SELECT t FROM tri) AS BIGINT) AS n_triangles
    """
)

SQL["tombstone_delete_audit"] = r"""
    WITH d AS (
      SELECT source, doc_id,
             md5_number_upper(CAST(doc_id AS VARCHAR)) AS h
      FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN h % 97 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_deleted,
           CAST(count(*) -
                sum(CASE WHEN h % 97 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           CAST(coalesce(bit_xor(CASE WHEN h % 97 <> 0 THEN h >> 1 END), 0)
                AS BIGINT) AS kept_fp
    FROM d GROUP BY source
"""

SQL["pdf_reading_order"] = r"""
    WITH d AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
      FROM documents
    ),
    lines AS (
      SELECT doc_id, CAST(i AS BIGINT) AS li,
             array_to_string(toks[CAST(i*8+1 AS INT) : CAST(i*8+8 AS INT)], ' ') AS line
      FROM d, unnest(range(0, CAST(ceil(len(toks) / 8.0) AS BIGINT))) t(i)
    ),
    agg AS (
      SELECT doc_id, string_agg(line, chr(10) ORDER BY li) AS extracted
      FROM lines GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(ceil(len(d.toks) / 4.0) AS BIGINT) AS n_frags,
           CAST(ceil(len(d.toks) / 8.0) AS BIGINT) AS n_lines,
           coalesce(a.extracted, '') AS extracted
    FROM d LEFT JOIN agg a USING (doc_id)
"""

SQL["scd2_user_value_history"] = r"""
        SELECT user_id, event_id,
               CAST(round(value * 1000000) AS BIGINT) AS value_e6,
               CAST(epoch_us(ts) AS BIGINT) AS valid_from_us,
               CAST(coalesce(
                 lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id), -1)
                    AS BIGINT) AS valid_to_us
        FROM events
"""

SQL["turn_handoff_latency"] = r"""
        WITH d AS (
          SELECT doc_id,
                 'doc-' || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS conv_id,
                 greatest(CAST(ceil(len(list_filter(string_split_regex(trim(text), '\s+'),
                                                    x -> x <> '')) / 12.0) AS BIGINT),
                          1) AS nchunks
          FROM documents
        ),
        turns AS (
          SELECT doc_id, conv_id, CAST(0 AS BIGINT) AS idx FROM d
          UNION ALL
          SELECT doc_id, conv_id, CAST(1 AS BIGINT) FROM d WHERE doc_id % 3 = 0
          UNION ALL
          SELECT doc_id, conv_id, CAST(i AS BIGINT)
          FROM d, unnest(range(2, nchunks + 2)) AS r(i)
        ),
        rt AS (
          SELECT conv_id, idx,
                 CASE WHEN idx = 0 THEN 0
                      WHEN (doc_id + idx) % 7 = 0 THEN 3
                      WHEN idx % 2 = 1 THEN 1 ELSE 2 END AS role,
                 (doc_id % 97) * 1000000 + idx * ((doc_id % 7) + 1) * 1000 AS ts_us
          FROM turns
        ),
        seq AS (
          SELECT conv_id, role, ts_us,
                 lag(role) OVER (PARTITION BY conv_id ORDER BY idx) AS prev_role,
                 lag(ts_us) OVER (PARTITION BY conv_id ORDER BY idx) AS prev_ts
          FROM rt
        )
        SELECT CAST(prev_role AS BIGINT) AS from_role,
               CAST(role AS BIGINT) AS to_role,
               CAST(count(*) AS BIGINT) AS n_handoffs,
               CAST(sum(ts_us - prev_ts) AS BIGINT) AS total_us,
               CAST(sum(ts_us - prev_ts) // count(*) AS BIGINT) AS mean_us
        FROM seq WHERE prev_role IS NOT NULL
        GROUP BY 1, 2
"""

SQL["unpivot_doc_metrics"] = r"""
        WITH m AS (
          SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
                 CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
                                      x -> x <> '')) AS BIGINT) AS n_tokens,
                 CASE WHEN text = '' THEN 0
                      ELSE len(string_split(text, chr(10))) END AS n_lines
          FROM documents
        )
        SELECT doc_id, 'n_chars' AS metric, n_chars AS value FROM m
        UNION ALL
        SELECT doc_id, 'n_tokens', n_tokens FROM m
        UNION ALL
        SELECT doc_id, 'n_lines', CAST(n_lines AS BIGINT) FROM m
"""

SQL["curriculum_order_docs"] = r"""
        SELECT doc_id,
               CAST(n_chars AS BIGINT) AS n_chars,
               CAST(row_number() OVER (ORDER BY n_chars, doc_id) AS BIGINT)
                   AS rank,
               CAST(ntile(4) OVER (ORDER BY n_chars, doc_id) AS BIGINT)
                   AS stage
        FROM documents
"""

SQL["cube_orders"] = r"""
        WITH o AS (
          SELECT o_orderstatus AS status,
                 CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
                 o_orderpriority AS priority,
                 CAST(round(o_totalprice * 100) AS BIGINT) AS cents
          FROM orders
        )
        SELECT coalesce(status, 'ALL') AS status,
               CAST(coalesce(yr, -1) AS BIGINT) AS o_year,
               coalesce(priority, 'ALL') AS priority,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(cents) AS BIGINT) AS total_cents
        FROM o GROUP BY CUBE (status, yr, priority)
"""

SQL["span_interval_islands"] = r"""
        WITH d AS (
          SELECT doc_id, CAST(n_chars AS BIGINT) AS L,
                 CAST(1 + doc_id % 4 AS BIGINT) AS nsp
          FROM documents
        ),
        sp AS (
          SELECT doc_id, nsp, CAST(j AS BIGINT) AS j,
                 (doc_id * 31 + j * 57) % (L - 7) AS s,
                 (doc_id * 31 + j * 57) % (L - 7) + 3 + (doc_id + j) % 5 AS e
          FROM d, unnest(range(nsp)) AS r(j)
        ),
        w AS (
          SELECT doc_id, nsp, j, s, e,
                 max(e) OVER (PARTITION BY doc_id ORDER BY s, j
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING) AS prev_max
          FROM sp
        ),
        fl AS (
          SELECT doc_id, nsp, j, s, e,
                 CASE WHEN prev_max IS NULL OR s > prev_max
                      THEN 1 ELSE 0 END AS ni
          FROM w
        ),
        g AS (
          SELECT doc_id, nsp, s, e,
                 sum(ni) OVER (PARTITION BY doc_id ORDER BY s, j
                               ROWS UNBOUNDED PRECEDING) AS gid
          FROM fl
        ),
        isl AS (
          SELECT doc_id, max(nsp) AS nsp, gid,
                 min(s) AS lo, max(e) AS hi
          FROM g GROUP BY doc_id, gid
        )
        SELECT doc_id, CAST(max(nsp) AS BIGINT) AS n_spans,
               CAST(count(*) AS BIGINT) AS n_islands,
               CAST(sum(hi - lo) AS BIGINT) AS covered_chars
        FROM isl GROUP BY doc_id
"""

SQL["kmv_distinct_tokens_per_source"] = r"""
        WITH toks AS (
          SELECT DISTINCT source, tok FROM (
            SELECT source,
                   unnest(list_filter(string_split_regex(trim(text), '\s+'),
                                      x -> x <> '')) AS tok
            FROM documents)
        ),
        h AS (SELECT DISTINCT source, md5_number_upper(tok) AS h FROM toks),
        rk AS (
          SELECT source, h,
                 row_number() OVER (PARTITION BY source ORDER BY h) AS rn,
                 count(*) OVER (PARTITION BY source) AS nd
          FROM h
        ),
        kth AS (
          SELECT source, max(nd) AS nd,
                 max(CASE WHEN rn = 256 THEN h END) AS hk
          FROM rk GROUP BY source
        )
        SELECT source,
               CAST(least(nd, 256) AS BIGINT) AS n_kept,
               CAST(CASE WHEN nd < 256 THEN nd
                    ELSE (CAST(255 AS HUGEINT) * (CAST(1 AS HUGEINT) << 64))
                         // CAST(hk AS HUGEINT) END AS BIGINT) AS est_distinct
        FROM kth
"""

SQL["zonemap_pruned_scan"] = r"""
        WITH bands AS (
          SELECT n_chars // 64 AS b, min(n_chars) AS mn, max(n_chars) AS mx
          FROM documents GROUP BY 1
        )
        SELECT CAST(count(*) FILTER (n_chars >= 128 AND n_chars < 256)
                    AS BIGINT) AS n_docs,
               CAST(coalesce(sum(n_chars) FILTER (n_chars >= 128
                                                  AND n_chars < 256), 0)
                    AS BIGINT) AS sum_chars,
               (SELECT CAST(count(*) AS BIGINT) FROM bands
                WHERE mn < 256 AND mx >= 128) AS bands_scanned,
               (SELECT CAST(count(*) AS BIGINT) FROM bands) AS bands_total
        FROM documents
"""

def _zorder_sql() -> str:
    from .zonemap import z_interleave16_sql

    z = z_interleave16_sql("user_id", "vc // 1000")
    return f"""
        WITH e AS (
          SELECT user_id, CAST(round(value * 100) AS BIGINT) AS vc FROM events
        ),
        ez AS (SELECT user_id, vc, {z} AS z FROM e),
        zm AS (SELECT max(z) AS zmax FROM ez),
        b AS (SELECT user_id, vc, z * 32 // (zmax + 1) AS band FROM ez, zm),
        bands AS (
          SELECT band, min(user_id) AS umn, max(user_id) AS umx,
                 min(vc) AS vmn, max(vc) AS vmx
          FROM b GROUP BY 1
        ),
        ub AS (
          SELECT (max(user_id) + 1) // 4 AS ulo,
                 (max(user_id) + 1) // 2 AS uhi
          FROM events
        )
        SELECT
          CAST((SELECT count(*) FROM b, ub
                WHERE user_id >= ub.ulo AND user_id < ub.uhi
                  AND vc >= 10000 AND vc < 30000) AS BIGINT) AS n_events,
          CAST((SELECT coalesce(sum(vc), 0) FROM b, ub
                WHERE user_id >= ub.ulo AND user_id < ub.uhi
                  AND vc >= 10000 AND vc < 30000) AS BIGINT) AS sum_vc_cents,
          (SELECT CAST(count(*) AS BIGINT) FROM bands, ub
           WHERE umn < ub.uhi AND umx >= ub.ulo
             AND vmn < 30000 AND vmx >= 10000)
              AS bands_scanned,
          (SELECT CAST(count(*) AS BIGINT) FROM bands) AS bands_total
    """


SQL["zorder_pruned_scan"] = _zorder_sql()

SQL["storage_bucketed_join"] = r"""
        SELECT o.o_orderstatus,
               CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount)
                                   * 100) AS BIGINT)) AS BIGINT)
                   AS revenue_cents
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY 1
"""

SQL["winsorized_value_stats"] = r"""
        WITH c AS (
          SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
          FROM events
        ),
        r AS (
          SELECT event_type, cents,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY cents) AS rn,
                 count(*) OVER (PARTITION BY event_type) AS n
          FROM c
        ),
        thr AS (
          SELECT event_type,
                 max(CASE WHEN rn = (5 * (n - 1)) // 100 + 1
                          THEN cents END) AS lo,
                 max(CASE WHEN rn = (95 * (n - 1)) // 100 + 1
                          THEN cents END) AS hi
          FROM r GROUP BY event_type
        )
        SELECT c.event_type,
               CAST(max(t.lo) AS BIGINT) AS p05_cents,
               CAST(max(t.hi) AS BIGINT) AS p95_cents,
               CAST(sum(least(greatest(c.cents, t.lo), t.hi)) AS BIGINT)
                   AS winsorized_sum_cents,
               CAST(sum(CASE WHEN c.cents < t.lo THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_clipped_low,
               CAST(sum(CASE WHEN c.cents > t.hi THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_clipped_high
        FROM c JOIN thr t USING (event_type)
        GROUP BY c.event_type
"""

SQL["tool_usage_stats"] = r"""
        WITH d AS (
          SELECT doc_id,
                 'doc-' || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS conv_id,
                 greatest(CAST(ceil(len(list_filter(string_split_regex(trim(text), '\s+'),
                                                    x -> x <> '')) / 12.0) AS BIGINT),
                          1) AS nchunks
          FROM documents
        ),
        turns AS (
          SELECT doc_id, conv_id, CAST(0 AS BIGINT) AS idx FROM d
          UNION ALL
          SELECT doc_id, conv_id, CAST(1 AS BIGINT) FROM d WHERE doc_id % 3 = 0
          UNION ALL
          SELECT doc_id, conv_id, CAST(i AS BIGINT)
          FROM d, unnest(range(2, nchunks + 2)) AS r(i)
        ),
        rt AS (
          SELECT conv_id, idx,
                 CASE WHEN idx = 0 THEN 0
                      WHEN (doc_id + idx) % 7 = 0 THEN 3
                      WHEN idx % 2 = 1 THEN 1 ELSE 2 END AS role,
                 (doc_id + 3 * idx) % 5 AS tool_id,
                 (doc_id % 97) * 1000000 + idx * ((doc_id % 7) + 1) * 1000 AS ts_us
          FROM turns
        ),
        seq AS (
          SELECT conv_id, role, tool_id, ts_us,
                 lag(ts_us) OVER (PARTITION BY conv_id ORDER BY idx) AS prev_ts
          FROM rt
        )
        SELECT 'T' || CAST(tool_id AS VARCHAR) AS tool,
               CAST(count(*) AS BIGINT) AS n_calls,
               CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs,
               CAST(sum(ts_us - prev_ts) AS BIGINT) AS total_wait_us,
               CAST(sum(ts_us - prev_ts) // count(*) AS BIGINT) AS mean_wait_us
        FROM seq WHERE role = 3 AND prev_ts IS NOT NULL
        GROUP BY tool_id
"""

SQL["pareto_frontier_parts"] = r"""
        WITH p AS (
          SELECT p_partkey,
                 CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents,
                 CAST(p_size AS BIGINT) AS p_size
          FROM part
        )
        SELECT a.p_partkey, a.price_cents, a.p_size
        FROM p a
        WHERE NOT EXISTS (
          SELECT 1 FROM p b
          WHERE b.price_cents <= a.price_cents AND b.p_size >= a.p_size
            AND (b.price_cents < a.price_cents OR b.p_size > a.p_size)
        )
"""

SQL["rapid_fire_pairs_per_user"] = r"""
        SELECT a.user_id, CAST(count(*) AS BIGINT) AS n_rapid_pairs
        FROM events a JOIN events b ON a.user_id = b.user_id
        WHERE (b.ts < a.ts OR (b.ts = a.ts AND b.event_id < a.event_id))
          AND epoch_us(a.ts) - epoch_us(b.ts) <= CAST(3600 AS BIGINT) * 1000000
        GROUP BY a.user_id
"""

SQL["ewma_hourly_value_per_type"] = r"""
        WITH RECURSIVE h AS (
          SELECT event_type, date_trunc('hour', ts) AS hr,
                 sum(CAST(round(value * 100) AS BIGINT)) AS cents
          FROM events GROUP BY 1, 2
        ),
        s AS (
          SELECT event_type, hr, cents,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY hr) AS rn
          FROM h
        ),
        rec(event_type, rn, hr, cents, ewma) AS (
          SELECT event_type, rn, hr, cents, cents FROM s WHERE rn = 1
          UNION ALL
          SELECT s.event_type, s.rn, s.hr, s.cents,
                 (rec.ewma + s.cents) // 2
          FROM rec JOIN s ON s.event_type = rec.event_type
                         AND s.rn = rec.rn + 1
        )
        SELECT event_type, strftime(hr, '%Y-%m-%d %H') AS hour,
               CAST(cents AS BIGINT) AS hour_cents,
               CAST(ewma AS BIGINT) AS ewma_cents
        FROM rec
"""

SQL["conv_merge_consecutive_roles"] = r"""
        WITH d AS (
          SELECT doc_id,
                 'doc-' || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS conv_id,
                 CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
                                      x -> x <> '')) AS BIGINT) AS ntok,
                 greatest(CAST(ceil(len(list_filter(string_split_regex(trim(text), '\s+'),
                                                    x -> x <> '')) / 12.0) AS BIGINT),
                          1) AS nchunks
          FROM documents
        ),
        turnlist AS (
          SELECT doc_id, conv_id, CAST(0 AS BIGINT) AS idx,
                 CAST(8 AS BIGINT) AS t FROM d
          UNION ALL
          SELECT doc_id, conv_id, CAST(1 AS BIGINT), CAST(6 AS BIGINT)
          FROM d WHERE doc_id % 3 = 0
          UNION ALL
          SELECT doc_id, conv_id, CAST(j + 2 AS BIGINT),
                 CASE WHEN ntok = 0 THEN CAST(0 AS BIGINT)
                      ELSE least(CAST(12 AS BIGINT), ntok - 12 * j) END
          FROM d, unnest(range(nchunks)) AS r(j)
        ),
        rt AS (
          SELECT conv_id, idx, t,
                 CASE WHEN idx = 0 THEN 0
                      WHEN (doc_id + idx) % 7 = 0 THEN 3
                      WHEN idx % 2 = 1 THEN 1 ELSE 2 END AS role
          FROM turnlist
        ),
        seq AS (
          SELECT conv_id, idx, t, role,
                 CASE WHEN lag(role) OVER (PARTITION BY conv_id
                                           ORDER BY idx) IS DISTINCT
                           FROM role THEN 1 ELSE 0 END AS new_run
          FROM rt
        ),
        gseq AS (
          SELECT conv_id, t,
                 sum(new_run) OVER (PARTITION BY conv_id ORDER BY idx
                                    ROWS UNBOUNDED PRECEDING) AS gid
          FROM seq
        ),
        runs AS (
          SELECT conv_id, gid, CAST(count(*) AS BIGINT) AS run_len,
                 CAST(sum(t) AS BIGINT) AS run_tok
          FROM gseq GROUP BY conv_id, gid
        )
        SELECT conv_id,
               CAST(sum(run_len) AS BIGINT) AS n_turns_before,
               CAST(count(*) AS BIGINT) AS n_turns_after,
               CAST(max(run_len) AS BIGINT) AS max_run_len,
               CAST(sum(run_tok) AS BIGINT) AS n_tokens
        FROM runs GROUP BY conv_id
"""

SQL["value_outliers_mad"] = r"""
        WITH c AS (
          SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
          FROM events
        ),
        r1 AS (
          SELECT event_type, cents,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY cents) AS rn,
                 count(*) OVER (PARTITION BY event_type) AS n
          FROM c
        ),
        med AS (
          SELECT event_type,
                 max(CASE WHEN rn = (n + 1) // 2 THEN cents END) AS med
          FROM r1 GROUP BY event_type
        ),
        r2 AS (
          SELECT c.event_type, abs(c.cents - m.med) AS dev,
                 row_number() OVER (PARTITION BY c.event_type
                                    ORDER BY abs(c.cents - m.med)) AS rn,
                 count(*) OVER (PARTITION BY c.event_type) AS n
          FROM c JOIN med m USING (event_type)
        ),
        mad AS (
          SELECT event_type,
                 max(CASE WHEN rn = (n + 1) // 2 THEN dev END) AS mad
          FROM r2 GROUP BY event_type
        )
        SELECT c.event_type,
               CAST(max(m.med) AS BIGINT) AS median_cents,
               CAST(max(d.mad) AS BIGINT) AS mad_cents,
               CAST(sum(CASE WHEN abs(c.cents - m.med) > 3 * d.mad
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
               CAST(sum(CASE WHEN abs(c.cents - m.med) > 3 * d.mad
                             THEN c.cents ELSE 0 END) AS BIGINT)
                   AS outlier_cents_sum
        FROM c JOIN med m USING (event_type) JOIN mad d USING (event_type)
        GROUP BY c.event_type
"""

SQL["gapfill_hourly_value_per_type"] = r"""
        WITH cells AS (
          SELECT event_type, date_trunc('hour', ts) AS hr,
                 sum(CAST(round(value * 100) AS BIGINT)) AS cents
          FROM events GROUP BY 1, 2
        ),
        bounds AS (
          SELECT event_type, min(hr) AS mn, max(hr) AS mx
          FROM cells GROUP BY 1
        ),
        allh AS (
          SELECT event_type,
                 unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS hr
          FROM bounds
        ),
        j AS (
          SELECT a.event_type, a.hr, c.cents,
                 CAST(epoch_us(a.hr) AS BIGINT) AS h
          FROM allh a LEFT JOIN cells c
            ON a.event_type = c.event_type AND a.hr = c.hr
        ),
        w AS (
          SELECT *,
                 last_value(cents IGNORE NULLS) OVER (
                   PARTITION BY event_type ORDER BY hr
                   ROWS UNBOUNDED PRECEDING) AS pv,
                 last_value(CASE WHEN cents IS NULL THEN NULL ELSE h END
                            IGNORE NULLS) OVER (
                   PARTITION BY event_type ORDER BY hr
                   ROWS UNBOUNDED PRECEDING) AS ph,
                 first_value(cents IGNORE NULLS) OVER (
                   PARTITION BY event_type ORDER BY hr
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
                 first_value(CASE WHEN cents IS NULL THEN NULL ELSE h END
                             IGNORE NULLS) OVER (
                   PARTITION BY event_type ORDER BY hr
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
          FROM j
        )
        SELECT event_type, strftime(hr, '%Y-%m-%d %H') AS hour,
               CAST(CASE WHEN cents IS NOT NULL THEN cents
                         ELSE (pv * (nh - h) + nv * (h - ph)) // (nh - ph)
                    END AS BIGINT) AS cents,
               cents IS NULL AS filled
        FROM w
"""

SQL["extraction_quality_report"] = (
    "WITH base AS (" + SQL["transcript_extract"] + """)
        SELECT CAST(count(*) AS BIGINT) AS n_convs,
               CAST(sum(n_turns) AS BIGINT) AS n_turns,
               CAST(count(patient_name) AS BIGINT) AS n_patient_name,
               CAST(count(patient_birthdate) AS BIGINT)
                   AS n_patient_birthdate,
               CAST(count(invoice_number) AS BIGINT) AS n_invoice_number,
               CAST(count(invoice_date) AS BIGINT) AS n_invoice_date,
               CAST(count(order_number) AS BIGINT) AS n_order_number,
               CAST(count(vendor_name) AS BIGINT) AS n_vendor_name,
               CAST(count(gross_total) AS BIGINT) AS n_gross_total
        FROM base
"""
)

SQL["embedding_centroids_per_label"] = r"""
        WITH e AS (
          SELECT label, CAST(d AS BIGINT) AS dim,
                 CAST(round(CAST(embedding[CAST(d + 1 AS INT)] AS DOUBLE)
                            * 1000000) AS BIGINT) AS q
          FROM embeddings, unnest(range(len(embedding))) AS r(d)
        ),
        agg AS (
          SELECT CAST(label AS BIGINT) AS label, CAST(dim AS BIGINT) AS dim,
                 CAST(sum(q) AS BIGINT) AS sum_e6,
                 CAST(count(*) AS BIGINT) AS n
          FROM e GROUP BY 1, 2
        )
        SELECT label, dim, sum_e6, n,
               CAST((sum_e6 + 10000000 * n) // n - 10000000 AS BIGINT)
                   AS centroid_e6
        FROM agg
"""

SQL["nearest_centroid_assign"] = r"""
        WITH e AS (
          SELECT vec_id, label, CAST(d AS BIGINT) AS dim,
                 CAST(round(CAST(embedding[CAST(d + 1 AS INT)] AS DOUBLE)
                            * 1000000) AS BIGINT) AS q
          FROM embeddings, unnest(range(len(embedding))) AS r(d)
        ),
        cent AS (
          SELECT CAST(label AS BIGINT) AS clabel, dim,
                 CAST((sum(q) + 10000000 * count(*)) // count(*)
                      - 10000000 AS BIGINT) AS c
          FROM e GROUP BY 1, 2
        ),
        dist AS (
          SELECT e.vec_id, CAST(e.label AS BIGINT) AS label, cent.clabel,
                 sum((e.q - cent.c) * (e.q - cent.c)) AS dd
          FROM e JOIN cent ON e.dim = cent.dim
          GROUP BY 1, 2, 3
        ),
        best AS (
          SELECT vec_id, label, clabel,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY dd, clabel) AS rn
          FROM dist
        )
        SELECT CAST(vec_id AS BIGINT) AS vec_id, label,
               CAST(clabel AS BIGINT) AS pred,
               label = clabel AS correct
        FROM best WHERE rn = 1
"""

SQL["pareto_frontier_per_brand"] = r"""
        WITH p AS (
          SELECT p_brand,
                 p_partkey,
                 CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents,
                 CAST(p_size AS BIGINT) AS p_size
          FROM part
        )
        SELECT a.p_brand, a.p_partkey, a.price_cents, a.p_size
        FROM p a
        WHERE NOT EXISTS (
          SELECT 1 FROM p b
          WHERE b.p_brand = a.p_brand
            AND b.price_cents <= a.price_cents AND b.p_size >= a.p_size
            AND (b.price_cents < a.price_cents OR b.p_size > a.p_size)
        )
"""

SQL["diverse_topk_docs"] = r"""
        WITH ranked AS (
          SELECT source, doc_id, CAST(n_chars AS BIGINT) AS n_chars,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY n_chars DESC, doc_id) AS rs
          FROM documents
        ),
        pool AS (SELECT * FROM ranked WHERE rs <= 2),
        final AS (
          SELECT source, doc_id, n_chars,
                 row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rank
          FROM pool
        )
        SELECT CAST(rank AS BIGINT) AS rank, doc_id, source, n_chars
        FROM final WHERE rank <= 10
"""

def _markov_stationary_sql() -> str:
    hops = []
    prev = "x0"
    for i in range(1, 9):
        hops.append(
            f"x{i} AS (SELECT t.to_type AS s, "
            f"CAST(sum((x.v * t.n) // r.rowsum) AS BIGINT) AS v "
            f"FROM {prev} x JOIN trans t ON t.from_type = x.s "
            f"JOIN rws r ON r.from_type = x.s GROUP BY 1)"
        )
        prev = f"x{i}"
    return f"""
        WITH e2 AS (
          SELECT user_id, event_type, epoch_us(ts) AS t, event_id FROM events
        ),
        d AS (
          SELECT user_id, event_type AS to_type,
                 lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY t, event_id
                 ) AS from_type
          FROM e2
        ),
        trans AS (
          SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
          FROM d WHERE from_type IS NOT NULL
          GROUP BY from_type, to_type
        ),
        rws AS (SELECT from_type, sum(n) AS rowsum FROM trans GROUP BY 1),
        types AS (SELECT DISTINCT event_type AS s FROM events),
        x0 AS (SELECT s, 1000000 // (SELECT count(*) FROM types) AS v
               FROM types),
        {', '.join(hops)}
        SELECT ty.s AS event_type,
               CAST(coalesce({prev}.v, 0) AS BIGINT) AS stationary_e6
        FROM types ty LEFT JOIN {prev} ON {prev}.s = ty.s
    """


SQL["markov_stationary_event_types"] = _markov_stationary_sql()

SQL["rfm_user_segments"] = r"""
        WITH u AS (
          SELECT user_id, max(epoch_us(ts)) AS r,
                 CAST(count(*) AS BIGINT) AS f,
                 sum(CAST(round(value * 100) AS BIGINT)) AS m
          FROM events GROUP BY 1
        )
        SELECT CAST(user_id AS BIGINT) AS user_id,
               CAST(ntile(4) OVER (ORDER BY r, user_id) AS BIGINT) AS r_q,
               CAST(ntile(4) OVER (ORDER BY f, user_id) AS BIGINT) AS f_q,
               CAST(ntile(4) OVER (ORDER BY m, user_id) AS BIGINT) AS m_q,
               CAST(100 * ntile(4) OVER (ORDER BY r, user_id)
                    + 10 * ntile(4) OVER (ORDER BY f, user_id)
                    + ntile(4) OVER (ORDER BY m, user_id) AS BIGINT)
                   AS rfm_code
        FROM u
"""

SQL["abc_analysis_parts"] = r"""
        WITH rev AS (
          SELECT l_partkey AS p_partkey,
                 sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                          AS BIGINT)) AS cents
          FROM lineitem GROUP BY 1
        ),
        w AS (
          SELECT p_partkey, cents,
                 sum(cents) OVER (ORDER BY cents DESC, p_partkey
                                  ROWS UNBOUNDED PRECEDING) AS cum,
                 sum(cents) OVER () AS total
          FROM rev
        )
        SELECT p_partkey, CAST(cents AS BIGINT) AS revenue_cents,
               CAST((10000 * cum) // greatest(total, 1) AS BIGINT)
                   AS cum_share_bp,
               CASE WHEN (10000 * cum) // greatest(total, 1) <= 8000 THEN 'A'
                    WHEN (10000 * cum) // greatest(total, 1) <= 9500 THEN 'B'
                    ELSE 'C' END AS abc_class
        FROM w
"""

SQL["cohort_ltv_curve"] = r"""
        WITH e AS (
          SELECT user_id,
                 CAST(EXTRACT(year FROM ts) * 12
                      + EXTRACT(month FROM ts) - 1 AS BIGINT) AS mon,
                 CAST(round(value * 100) AS BIGINT) AS cents
          FROM events
        ),
        um AS (SELECT user_id, mon, sum(cents) AS cents
               FROM e GROUP BY 1, 2),
        f AS (SELECT user_id, min(mon) AS cm FROM um GROUP BY 1),
        t AS (
          SELECT f.cm AS cohort_mon, um.mon - f.cm AS age, um.cents,
                 CASE WHEN um.mon = f.cm THEN 1 ELSE 0 END AS u
          FROM um JOIN f USING (user_id)
        ),
        agg AS (
          SELECT cohort_mon, age,
                 CAST(sum(u) AS BIGINT) AS n_cohort_users,
                 CAST(sum(cents) AS BIGINT) AS revenue_cents
          FROM t GROUP BY 1, 2
        )
        SELECT CAST(cohort_mon // 12 AS BIGINT) AS cohort_year,
               CAST(cohort_mon % 12 + 1 AS BIGINT) AS cohort_month,
               CAST(age AS BIGINT) AS age_months,
               n_cohort_users, revenue_cents,
               CAST(sum(revenue_cents) OVER (PARTITION BY cohort_mon
                                             ORDER BY age
                                             ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS cum_revenue_cents
        FROM agg
"""

SQL["chi2_type_hour"] = r"""
        WITH cells AS (
          SELECT event_type, CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hr,
                 CAST(count(*) AS BIGINT) AS n
          FROM events GROUP BY 1, 2
        ),
        tot AS (SELECT CAST(sum(n) AS HUGEINT) AS total FROM cells),
        rws AS (SELECT event_type, CAST(sum(n) AS HUGEINT) AS r
                FROM cells GROUP BY 1),
        cls AS (SELECT hr, CAST(sum(n) AS HUGEINT) AS c
                FROM cells GROUP BY 1),
        grid AS (
          SELECT rws.event_type, cls.hr, rws.r, cls.c,
                 CAST(coalesce(cells.n, 0) AS HUGEINT) AS o
          FROM rws CROSS JOIN cls
          LEFT JOIN cells ON cells.event_type = rws.event_type
                         AND cells.hr = cls.hr
        )
        SELECT CAST(t.total AS BIGINT) AS n_events,
               (SELECT CAST(count(*) AS BIGINT) FROM rws) AS n_types,
               (SELECT CAST(count(*) AS BIGINT) FROM cls) AS n_hours,
               CAST(((SELECT count(*) FROM rws) - 1)
                    * ((SELECT count(*) FROM cls) - 1) AS BIGINT) AS dof,
               CAST((SELECT sum(
                       (1000000 * t2.total * (g.o * t2.total - g.r * g.c)
                        * (g.o * t2.total - g.r * g.c))
                       // (t2.total * t2.total * g.r * g.c)
                     ) FROM grid g, tot t2) AS BIGINT) AS chi2_e6
        FROM tot t
"""

SQL["cluster_canonical_docs"] = r"""
        WITH RECURSIVE
        t AS (SELECT doc_id, source,
                     list_distinct(list_filter(string_split_regex(trim(text), '\s+'),
                                               t -> t <> '')) AS toks
              FROM documents),
        p AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM t a JOIN t b ON a.source = b.source AND a.doc_id < b.doc_id
          WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
                  / len(list_distinct(a.toks || b.toks)) >= 0.9
        ),
        e AS (SELECT doc_a AS u, doc_b AS v FROM p
              UNION SELECT doc_b, doc_a FROM p),
        reach(node, r) AS (
          SELECT u, u FROM e
          UNION
          SELECT e.u, reach.r FROM e JOIN reach ON e.v = reach.node
        ),
        cl AS (SELECT node AS doc_id, min(r) AS cluster_id
               FROM reach GROUP BY node),
        j AS (SELECT cl.doc_id, cl.cluster_id, d.n_chars
              FROM cl JOIN documents d USING (doc_id))
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               CAST(cluster_id AS BIGINT) AS cluster_id,
               CAST(first_value(doc_id) OVER (
                 PARTITION BY cluster_id
                 ORDER BY n_chars DESC, doc_id) AS BIGINT)
                   AS canonical_doc_id,
               doc_id = first_value(doc_id) OVER (
                 PARTITION BY cluster_id
                 ORDER BY n_chars DESC, doc_id) AS is_canonical
        FROM j
"""

SQL["funnel_latency_percentiles"] = r"""
        WITH fv AS (
          SELECT user_id, v_ts, v_id FROM (
            SELECT user_id, epoch_us(ts) AS v_ts, event_id AS v_id,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS rn
            FROM events WHERE event_type = 'view')
          WHERE rn = 1
        ),
        fp AS (
          SELECT e.user_id,
                 min(epoch_us(e.ts)) AS p_ts
          FROM events e JOIN fv ON e.user_id = fv.user_id
          WHERE e.event_type = 'purchase'
            AND (epoch_us(e.ts) > fv.v_ts
                 OR (epoch_us(e.ts) = fv.v_ts AND e.event_id > fv.v_id))
          GROUP BY e.user_id
        ),
        el AS (
          SELECT fp.p_ts - fv.v_ts AS elapsed_us
          FROM fp JOIN fv ON fp.user_id = fv.user_id
        ),
        rk AS (
          SELECT elapsed_us,
                 row_number() OVER (ORDER BY elapsed_us) AS rn,
                 count(*) OVER () AS n
          FROM el
        )
        SELECT CAST(max(n) AS BIGINT) AS n_converted,
               CAST(sum(elapsed_us) AS BIGINT) AS total_us,
               CAST(max(CASE WHEN rn = (n + 1) // 2
                             THEN elapsed_us END) AS BIGINT) AS p50_us,
               CAST(max(CASE WHEN rn = (95 * (n - 1)) // 100 + 1
                             THEN elapsed_us END) AS BIGINT) AS p95_us
        FROM rk
"""

SQL["lm_transfer_matrix"] = r"""
        WITH tk AS (
          SELECT source,
                 unnest(list_filter(string_split_regex(trim(text), '\s+'),
                                    x -> x <> '')) AS tok
          FROM documents
        ),
        c AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS n
              FROM tk GROUP BY 1, 2),
        v AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v FROM c),
        tot AS (SELECT source, sum(n) AS t FROM c GROUP BY 1),
        srcs AS (SELECT DISTINCT source FROM c),
        vt AS (SELECT DISTINCT tok FROM c),
        logs AS (
          SELECT m.source AS model, vt.tok,
                 CAST(round(1000000 * ln((coalesce(cm.n, 0) + 1)
                                         / CAST(tm.t + v.v AS DOUBLE)))
                      AS BIGINT) AS lp
          FROM srcs m CROSS JOIN vt
          LEFT JOIN c cm ON cm.source = m.source AND cm.tok = vt.tok
          JOIN tot tm ON tm.source = m.source, v
        )
        SELECT e.source AS src_eval, l.model AS src_model,
               CAST(sum(e.n) AS BIGINT) AS n_tokens,
               CAST(sum(e.n * l.lp) AS BIGINT) AS micro_nats
        FROM c e JOIN logs l ON l.tok = e.tok
        GROUP BY 1, 2
"""

SQL["balanced_sample_per_label"] = r"""
        WITH r AS (
          SELECT CAST(label AS BIGINT) AS label,
                 CAST(vec_id AS BIGINT) AS vec_id,
                 row_number() OVER (
                   PARTITION BY label
                   ORDER BY md5_number_upper(CAST(vec_id AS VARCHAR)) >> 1,
                            vec_id) AS rn
          FROM embeddings
        )
        SELECT label, vec_id FROM r WHERE rn <= 32
"""

SQL["rendezvous_shard_audit"] = r"""
        WITH s AS (
          SELECT doc_id, CAST(x AS BIGINT) AS shard,
                 md5_number_upper(CAST(doc_id AS VARCHAR) || ':'
                                  || CAST(x AS VARCHAR)) AS w
          FROM documents, unnest(range(17)) AS r(x)
        ),
        a16 AS (
          SELECT doc_id, shard FROM (
            SELECT doc_id, shard,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY w DESC, shard) AS rn
            FROM s WHERE shard < 16) WHERE rn = 1
        ),
        a17 AS (
          SELECT doc_id, shard FROM (
            SELECT doc_id, shard,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY w DESC, shard) AS rn
            FROM s) WHERE rn = 1
        )
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN a16.shard <> a17.shard
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_moved,
               CAST((10000 * sum(CASE WHEN a16.shard <> a17.shard
                                      THEN 1 ELSE 0 END))
                    // greatest(count(*), 1) AS BIGINT) AS moved_bp
        FROM a16 JOIN a17 USING (doc_id)
"""

SQL["trending_tokens"] = r"""
        WITH tk AS (
          SELECT doc_id % 2 AS half,
                 unnest(list_filter(string_split_regex(trim(text), '\s+'),
                                    x -> x <> '')) AS tok
          FROM documents
        ),
        c AS (SELECT tok, half, CAST(count(*) AS BIGINT) AS n
              FROM tk GROUP BY 1, 2),
        p AS (
          SELECT tok,
                 sum(CASE WHEN half = 0 THEN n ELSE 0 END) AS c0,
                 sum(CASE WHEN half = 1 THEN n ELSE 0 END) AS c1
          FROM c GROUP BY 1
        ),
        t AS (SELECT sum(c0) AS t0, sum(c1) AS t1 FROM p),
        sc AS (
          SELECT tok, c0, c1,
                 CAST(round(1000000 * ln(
                   ((c1 + 1) / CAST(t1 + 1 AS DOUBLE))
                   / ((c0 + 1) / CAST(t0 + 1 AS DOUBLE)))) AS BIGINT) AS s
          FROM p, t WHERE c0 + c1 >= 5
        ),
        rk AS (SELECT *, row_number() OVER (ORDER BY abs(s) DESC, tok)
                   AS rn FROM sc)
        SELECT tok AS token, CAST(c0 AS BIGINT) AS n_first_half,
               CAST(c1 AS BIGINT) AS n_second_half,
               s AS shift_micro_nats
        FROM rk WHERE rn <= 20
"""

SQL["peak_concurrent_sessions"] = r"""
        WITH o AS (
          SELECT user_id, epoch_us(ts) AS t, event_id,
                 lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS prev
          FROM events
        ),
        marked AS (
          SELECT user_id, t,
                 CASE WHEN prev IS NULL OR t - prev > 1800000000
                      THEN 1 ELSE 0 END AS new_s
          FROM o
        ),
        sid AS (
          SELECT user_id, t,
                 sum(new_s) OVER (PARTITION BY user_id ORDER BY t
                                  ROWS UNBOUNDED PRECEDING) AS s
          FROM marked
        ),
        sess AS (SELECT user_id, s, min(t) AS st, max(t) AS en
                 FROM sid GROUP BY 1, 2),
        b AS (SELECT st AS t, 1 AS d FROM sess
              UNION ALL SELECT en, -1 FROM sess),
        run AS (
          SELECT sum(d) OVER (ORDER BY t, d DESC
                              ROWS UNBOUNDED PRECEDING) AS c
          FROM b
        )
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM sess) AS n_sessions,
               CAST(max(c) AS BIGINT) AS peak_concurrency
        FROM run
"""

SQL["vocab_jaccard_sources"] = r"""
        WITH ts AS (
          SELECT DISTINCT source, tok FROM (
            SELECT source,
                   unnest(list_filter(string_split_regex(trim(text), '\s+'),
                                      x -> x <> '')) AS tok
            FROM documents)
        ),
        sz AS (SELECT source, CAST(count(*) AS BIGINT) AS n
               FROM ts GROUP BY 1),
        pr AS (
          SELECT a.source AS src_a, b.source AS src_b,
                 CAST(count(*) AS BIGINT) AS inter_n
          FROM ts a JOIN ts b ON a.tok = b.tok AND a.source < b.source
          GROUP BY 1, 2
        )
        SELECT pr.src_a, pr.src_b, pr.inter_n,
               CAST(sa.n + sb.n - pr.inter_n AS BIGINT) AS union_n,
               CAST((10000 * pr.inter_n)
                    // greatest(sa.n + sb.n - pr.inter_n, 1) AS BIGINT)
                   AS jaccard_bp
        FROM pr JOIN sz sa ON sa.source = pr.src_a
        JOIN sz sb ON sb.source = pr.src_b
"""

SQL["turn_idx_integrity_audit"] = r"""
        WITH d AS (
          SELECT doc_id,
                 'doc-' || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS conv_id,
                 greatest(CAST(ceil(len(list_filter(string_split_regex(trim(text), '\s+'),
                                                    x -> x <> '')) / 12.0) AS BIGINT),
                          1) AS nchunks
          FROM documents
        ),
        turns AS (
          SELECT conv_id, CAST(0 AS BIGINT) AS idx FROM d
          UNION ALL
          SELECT conv_id, CAST(1 AS BIGINT) FROM d WHERE doc_id % 3 = 0
          UNION ALL
          SELECT conv_id, CAST(i AS BIGINT)
          FROM d, unnest(range(2, nchunks + 2)) AS r(i)
        )
        SELECT conv_id,
               CAST(count(*) AS BIGINT) AS n_turns,
               CAST(count(*) - count(DISTINCT idx) AS BIGINT) AS n_dup_idx,
               CAST(max(idx) - min(idx) + 1 - count(DISTINCT idx) AS BIGINT)
                   AS n_gaps,
               min(idx) = 0 AS starts_at_zero
        FROM turns GROUP BY conv_id
"""

SQL["token_concentration_per_source"] = r"""
        WITH tk AS (
          SELECT source,
                 unnest(list_filter(string_split_regex(trim(text), '\s+'),
                                    x -> x <> '')) AS tok
          FROM documents
        ),
        c AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS n
              FROM tk GROUP BY 1, 2),
        rk AS (
          SELECT source, n,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY n DESC, tok) AS rn
          FROM c
        ),
        agg AS (
          SELECT source,
                 CAST(sum(n) AS BIGINT) AS total_tokens,
                 CAST(sum(CASE WHEN rn <= 10 THEN n ELSE 0 END) AS BIGINT)
                     AS top10_tokens
          FROM rk GROUP BY source
        )
        SELECT source, total_tokens, top10_tokens,
               CAST((10000 * top10_tokens) // greatest(total_tokens, 1)
                    AS BIGINT) AS head_bp
        FROM agg
"""

SQL["doc_length_percentile_rank"] = r"""
        WITH r AS (
          SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
                 row_number() OVER (ORDER BY n_chars, doc_id) AS rn,
                 count(*) OVER () AS n
          FROM documents
        )
        SELECT doc_id, n_chars,
               CAST((10000 * (rn - 1)) // greatest(n - 1, 1) AS BIGINT)
                   AS pct_bp
        FROM r
"""

SQL["event_throttle_dedup"] = r"""
        WITH RECURSIVE e AS (
          SELECT user_id, event_type, epoch_us(ts) AS t, event_id,
                 row_number() OVER (PARTITION BY user_id, event_type
                                    ORDER BY ts, event_id) AS rn
          FROM events
        ),
        rec(user_id, event_type, rn, t) AS (
          SELECT user_id, event_type, rn, t FROM e WHERE rn = 1
          UNION ALL
          SELECT e.user_id, e.event_type, e.rn, e.t
          FROM rec r JOIN e ON e.user_id = r.user_id
                           AND e.event_type = r.event_type
                           AND e.rn > r.rn AND e.t >= r.t + 300000000
          WHERE NOT EXISTS (
            SELECT 1 FROM e e2
            WHERE e2.user_id = e.user_id AND e2.event_type = e.event_type
              AND e2.rn > r.rn AND e2.t >= r.t + 300000000
              AND e2.rn < e.rn)
        ),
        k AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_kept
              FROM rec GROUP BY 1),
        a AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_all
              FROM e GROUP BY 1)
        SELECT a.event_type, coalesce(k.n_kept, 0) AS n_kept,
               CAST(a.n_all - coalesce(k.n_kept, 0) AS BIGINT)
                   AS n_suppressed
        FROM a LEFT JOIN k USING (event_type)
"""

SQL["ks_length_drift_per_source"] = r"""
        WITH c AS (
          SELECT source, CAST(n_chars AS BIGINT) AS v,
                 CAST(count(*) AS BIGINT) AS n
          FROM documents GROUP BY 1, 2
        ),
        vals AS (SELECT DISTINCT v FROM c),
        srcs AS (SELECT source, CAST(sum(n) AS BIGINT) AS ns
                 FROM c GROUP BY 1),
        tot AS (SELECT CAST(sum(n) AS BIGINT) AS N FROM c),
        grid AS (SELECT s.source, s.ns, vals.v
                 FROM srcs s CROSS JOIN vals),
        j AS (SELECT g.source, g.ns, g.v, coalesce(c.n, 0) AS n
              FROM grid g LEFT JOIN c ON c.source = g.source
                                     AND c.v = g.v),
        cum AS (
          SELECT source, ns, v,
                 sum(n) OVER (PARTITION BY source ORDER BY v
                              ROWS UNBOUNDED PRECEDING) AS cums
          FROM j
        ),
        ac AS (
          SELECT v, sum(n) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                   AS cumall
          FROM (SELECT v, sum(n) AS n FROM c GROUP BY 1)
        ),
        ks AS (
          SELECT cum.source, max(cum.ns) AS ns, t.N AS N,
                 max(abs(cum.cums * t.N - ac.cumall * cum.ns)) AS num
          FROM cum JOIN ac USING (v), tot t
          GROUP BY cum.source, t.N
        )
        SELECT source, CAST(ns AS BIGINT) AS n_docs,
               CAST((10000 * num) // (ns * N) AS BIGINT) AS ks_bp
        FROM ks
"""

SQL["typo_token_clusters"] = r"""
        WITH RECURSIVE vv AS (
          SELECT DISTINCT 'AB' || CAST(doc_id AS VARCHAR) || 'X' AS tok
          FROM documents
        ),
        p AS (
          SELECT a.tok AS ta, b.tok AS tb
          FROM vv a JOIN vv b ON a.tok < b.tok
          WHERE abs(len(a.tok) - len(b.tok)) <= 1
            AND levenshtein(a.tok, b.tok) <= 1
        ),
        e AS (SELECT ta AS u, tb AS w FROM p
              UNION SELECT tb, ta FROM p),
        reach(node, r) AS (
          SELECT u, u FROM e
          UNION
          SELECT e.u, reach.r FROM e JOIN reach ON e.w = reach.node
        )
        SELECT node AS token, min(r) AS cluster_rep
        FROM reach GROUP BY node
"""

SQL["gini_user_activity"] = r"""
        WITH u AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n
                   FROM events GROUP BY 1),
        r AS (
          SELECT n, row_number() OVER (ORDER BY n) AS i,
                 count(*) OVER () AS cnt, sum(n) OVER () AS s0
          FROM u
        )
        SELECT CAST(max(cnt) AS BIGINT) AS n_users,
               CAST(max(s0) AS BIGINT) AS n_events,
               CAST((10000 * (2 * sum(i * n) - (max(cnt) + 1) * max(s0)))
                    // greatest(max(cnt) * max(s0), 1) AS BIGINT)
                   AS gini_bp
        FROM r
"""

SQL["fano_burstiness_per_type"] = r"""
        WITH c AS (
          SELECT event_type, date_trunc('hour', ts) AS hr,
                 CAST(count(*) AS BIGINT) AS n
          FROM events GROUP BY 1, 2
        ),
        a AS (
          SELECT event_type, CAST(count(*) AS BIGINT) AS nh,
                 CAST(sum(n) AS BIGINT) AS sx,
                 CAST(sum(n * n) AS BIGINT) AS sxx
          FROM c GROUP BY 1
        )
        SELECT event_type, nh AS n_hours, sx AS n_events,
               CAST(CASE WHEN nh < 2 OR sx = 0 THEN -1
                         ELSE (1000000 * nh * (nh * sxx - sx * sx))
                              // ((nh - 1) * nh * sx) END AS BIGINT)
                   AS fano_e6
        FROM a
"""

SQL["auto_join_revenue_by_priority"] = r"""
        SELECT o.o_orderpriority,
               CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount)
                                   * 100) AS BIGINT)) AS BIGINT)
                   AS revenue_cents
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY 1
"""

SQL["markov_conditional_entropy"] = r"""
        WITH e2 AS (
          SELECT user_id, event_type, epoch_us(ts) AS t, event_id FROM events
        ),
        d AS (
          SELECT user_id, event_type AS to_type,
                 lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY t, event_id
                 ) AS from_type
          FROM e2
        ),
        trans AS (
          SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
          FROM d WHERE from_type IS NOT NULL
          GROUP BY from_type, to_type
        ),
        rw AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS rn
               FROM trans GROUP BY 1),
        h AS (
          SELECT t.from_type,
                 CAST(max(rw.rn) AS BIGINT) AS rn,
                 CAST(sum(CAST(round(((-ln(t.n / CAST(rw.rn AS DOUBLE)))
                                      * (t.n / CAST(rw.rn AS DOUBLE)))
                                     * 1000000) AS BIGINT)) AS BIGINT) AS hh
          FROM trans t JOIN rw USING (from_type)
          GROUP BY t.from_type
        )
        SELECT from_type, rn AS n_transitions, hh AS h_micro_nats FROM h
        UNION ALL
        SELECT '__ALL__', CAST(sum(rn) AS BIGINT),
               CAST(sum(rn * hh) // greatest(sum(rn), 1) AS BIGINT)
        FROM h
"""

SQL["benford_first_digit_orders"] = r"""
        WITH c AS (
          SELECT CAST(left(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                                AS VARCHAR), 1) AS BIGINT) AS digit
          FROM orders
        ),
        p AS (SELECT digit, CAST(count(*) AS BIGINT) AS n
              FROM c GROUP BY 1),
        t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM p),
        x AS (
          SELECT digit, n, (10000 * n) // t.total AS obs,
                 CAST(round(ln(1 + 1 / CAST(digit AS DOUBLE)) / ln(10)
                            * 1000000) AS BIGINT) AS expd
          FROM p, t
        )
        SELECT digit, n AS n_orders, CAST(obs AS BIGINT) AS observed_bp,
               expd AS benford_e6,
               CAST(abs(obs * 100 - expd) AS BIGINT) AS gap_e6
        FROM x
"""

SQL["minhash_eval_pr"] = f"""
        WITH {_MINHASH_CTE},
        tr_sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
                  FROM mh_sh GROUP BY 1),
        tr_int AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 CAST(count(*) AS BIGINT) AS i
          FROM mh_sh a JOIN mh_sh b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        ),
        truth AS (
          SELECT t.doc_a, t.doc_b
          FROM tr_int t JOIN tr_sz x ON x.doc_id = t.doc_a
          JOIN tr_sz y ON y.doc_id = t.doc_b
          WHERE 10 * t.i >= 9 * (x.n + y.n - t.i)
        ),
        sk AS (SELECT doc_a, doc_b FROM mpairs),
        m AS (
          SELECT
            (SELECT count(*) FROM truth) AS n_truth,
            (SELECT count(*) FROM sk) AS n_sketch,
            (SELECT count(*) FROM truth JOIN sk USING (doc_a, doc_b)) AS tp
        )
        SELECT CAST(n_truth AS BIGINT) AS n_truth,
               CAST(n_sketch AS BIGINT) AS n_sketch,
               CAST(tp AS BIGINT) AS tp,
               CAST(n_sketch - tp AS BIGINT) AS fp,
               CAST(n_truth - tp AS BIGINT) AS fn,
               CAST((10000 * tp) // greatest(n_sketch, 1) AS BIGINT)
                   AS precision_bp,
               CAST((10000 * tp) // greatest(n_truth, 1) AS BIGINT)
                   AS recall_bp
        FROM m
"""

SQL["theil_index_user_activity"] = r"""
        WITH u AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n
                   FROM events GROUP BY 1),
        tot AS (SELECT CAST(count(*) AS BIGINT) AS nu,
                       CAST(sum(n) AS BIGINT) AS t FROM u),
        lv AS (SELECT n AS x, CAST(count(*) AS BIGINT) AS c
               FROM u GROUP BY 1),
        tm AS (
          SELECT lv.c,
                 CAST(round(((CAST(lv.x * tot.nu AS DOUBLE) / tot.t)
                             * ln(CAST(lv.x * tot.nu AS DOUBLE) / tot.t))
                            * 1000000) AS BIGINT) AS term
          FROM lv, tot
        )
        SELECT CAST(max(tot.nu) AS BIGINT) AS n_users,
               CAST(max(tot.t) AS BIGINT) AS n_events,
               CAST(sum(tm.c * tm.term) // greatest(max(tot.nu), 1)
                    AS BIGINT) AS theil_micro_nats
        FROM tm, tot
"""

SQL["fill_rate_by_conv_length"] = (
    "WITH base AS (" + SQL["transcript_extract"] + """),
        b AS (
          SELECT CASE WHEN n_turns <= 2 THEN '1-2'
                      WHEN n_turns <= 4 THEN '3-4'
                      WHEN n_turns <= 8 THEN '5-8' ELSE '9+' END
                     AS turn_bucket,
                 CASE WHEN invoice_number IS NOT NULL THEN 1 ELSE 0 END AS f
          FROM base)
        SELECT turn_bucket, CAST(count(*) AS BIGINT) AS n_convs,
               CAST(sum(f) AS BIGINT) AS n_invoice_filled,
               CAST((10000 * sum(f)) // count(*) AS BIGINT) AS fill_bp
        FROM b GROUP BY 1
"""
)
