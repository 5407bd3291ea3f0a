"""Edge-case parity for the windowed/sketch operators added in round 2:
attribution_click_purchase (window boundary inclusion at exactly t and
t-1h, tied timestamps, users with no clicks / no purchases),
running_revenue_per_customer (same-date ties broken by o_orderkey),
hll_users_per_type (rho extremes, register-merge invariance).

Each Ray query is compared against its own DuckDB oracle SQL over the same
parquet — the same contract the driver enforces.
"""

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

from rayextract.queries import QUERIES, SQL, _hll_rho

_TS = lambda s: pd.Timestamp(s)

EDGE_EVENTS = pd.DataFrame(
    {
        "event_id": np.arange(10, dtype=np.int64),
        "ts": pd.to_datetime(
            [
                "2026-01-01 00:00:00",  # u1 click: exactly t-1h of purchase 4 -> IN
                "2026-01-01 00:30:00",  # u1 click: inside window -> IN
                "2026-01-01 01:00:00",  # u1 click: exactly t -> IN
                "2025-12-31 23:59:59",  # u1 click: before t-1h of purchase 4
                #   -> OUT for purchase 4, IN for purchase 5 (tied at 00:00)
                "2026-01-01 01:00:00",  # u1 purchase (expects 3)
                "2026-01-01 00:00:00",  # u1 purchase tied with click 0 (expects 1)
                "2026-01-01 05:00:00",  # u2 purchase, no clicks (expects 0)
                "2026-01-01 00:30:00",  # u3 click only -> no output row
                "2026-01-01 00:40:00",  # u4 purchase; only other users click (0)
                "2026-01-01 00:39:00",  # u3 click (must not leak into u4)
            ]
        ).astype("datetime64[us]"),
        "user_id": np.asarray([1, 1, 1, 1, 1, 1, 2, 3, 4, 3], dtype=np.int64),
        "event_type": [
            "click", "click", "click", "click", "purchase",
            "purchase", "purchase", "click", "purchase", "click",
        ],
        "value": np.linspace(1.0, 10.0, 10),
        # json edges: empty object, negative k, other key, spacing variants
        "props": [
            "{}", '{"k": 87}', '{"k": -3}', '{"x": 1}', '{"k": 0}',
            '{ "k" : 42 }', '{"k": 87}', "{}", '{"k": 7}', '{"k": 7}',
        ],
    }
)

EDGE_ORDERS = pd.DataFrame(
    {
        "o_orderkey": np.asarray([101, 100, 102, 200], dtype=np.int64),
        "o_custkey": np.asarray([10, 10, 10, 20], dtype=np.int64),
        "o_orderdate": pd.to_datetime(
            ["2026-01-05", "2026-01-05", "2026-01-06", "2026-03-01"]
        ),
        "o_totalprice": [10.0, 20.0, 30.0, 5.0],
    }
)


# ntile edges: tied n_chars values straddling a tile boundary, N=6 (not
# divisible by 4 -> first two tiles get 2 rows)
EDGE_DOCS = pd.DataFrame(
    {
        "doc_id": np.arange(6, dtype=np.int64),
        "text": ["x"] * 6,
        "lang": ["en"] * 6,
        "source": ["s"] * 6,
        "n_chars": np.asarray([5, 5, 5, 1, 9, 1], dtype=np.int64),
    }
)

# q4 edges: order 100 has two 'R' lineitems (must count once), order 101 has
# none, order 102 is outside the date window despite an 'R' lineitem, and
# lineitem 999 has no order in the window
EDGE_LINEITEM = pd.DataFrame(
    {
        "l_orderkey": np.asarray([100, 100, 101, 102, 999], dtype=np.int64),
        "l_partkey": np.ones(5, dtype=np.int64),
        "l_suppkey": np.ones(5, dtype=np.int64),
        "l_linenumber": np.arange(5, dtype=np.int32),
        "l_quantity": np.ones(5),
        "l_extendedprice": np.ones(5),
        "l_discount": np.zeros(5),
        "l_tax": np.zeros(5),
        "l_returnflag": ["R", "R", "N", "R", "R"],
        "l_linestatus": ["O"] * 5,
        "l_shipdate": pd.to_datetime(["2026-01-10"] * 5).astype("datetime64[us]"),
    }
)

Q4_ORDERS = pd.DataFrame(
    {
        "o_orderkey": np.asarray([100, 101, 102], dtype=np.int64),
        "o_custkey": np.asarray([1, 1, 1], dtype=np.int64),
        "o_orderstatus": ["O"] * 3,
        "o_totalprice": [10.0, 10.0, 10.0],
        "o_orderdate": pd.to_datetime(
            ["1996-02-01", "1996-02-02", "1995-06-01"]
        ).astype("datetime64[us]"),
        "o_orderpriority": ["1-URGENT", "1-URGENT", "2-HIGH"],
    }
)


@pytest.fixture(scope="module")
def edge_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_win")
    EDGE_EVENTS.to_parquet(os.path.join(d, "events.parquet"), index=False)
    EDGE_ORDERS.to_parquet(os.path.join(d, "orders.parquet"), index=False)
    EDGE_DOCS.to_parquet(os.path.join(d, "documents.parquet"), index=False)
    return str(d)


@pytest.fixture(scope="module")
def q4_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_q4")
    Q4_ORDERS.to_parquet(os.path.join(d, "orders.parquet"), index=False)
    EDGE_LINEITEM.to_parquet(os.path.join(d, "lineitem.parquet"), index=False)
    return str(d)


def _oracle(edge_dir: str, name: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in ("events", "orders", "documents", "lineitem"):
        p = os.path.join(edge_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con.execute(SQL[name]).df()


def _canon(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)].copy()
    rows = [
        tuple(int(v) if isinstance(v, np.integer) else v for v in r)
        for r in df.itertuples(index=False, name=None)
    ]
    return sorted(rows, key=repr)


@pytest.mark.parametrize(
    "name",
    ["attribution_click_purchase", "running_revenue_per_customer",
     "hll_users_per_type", "doc_length_quartile", "props_json_histogram",
     "latest_event_per_user", "users_click_and_purchase", "cms_token_counts"],
)
def test_edge_parity(name, edge_dir, ray_session):
    got = QUERIES[name](edge_dir)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    want = _oracle(edge_dir, name)
    assert sorted(got.columns) == sorted(want.columns)
    assert _canon(got) == _canon(want), name


def test_q4_edge_parity(q4_dir, ray_session):
    got = QUERIES["q4_order_priority"](q4_dir)
    want = _oracle(q4_dir, "q4_order_priority")
    assert _canon(got) == _canon(want)
    # order 100 counted once despite two R lineitems; 101 (no R) and 102
    # (outside window) excluded; orphan lineitem 999 ignored
    assert dict(zip(got["o_orderpriority"], got["n_orders"])) == {"1-URGENT": 1}


def test_latest_event_tiebreak(edge_dir, ray_session):
    out = QUERIES["latest_event_per_user"](edge_dir).to_pandas()
    by = out.set_index("user_id")["event_id"]
    # user 1's max ts is 01:00:00 shared by events 2 and 4 -> higher id wins
    assert by[1] == 4
    assert by[2] == 6 and by[3] == 9 and by[4] == 8


def test_intersect_membership(edge_dir, ray_session):
    got = set(QUERIES["users_click_and_purchase"](edge_dir).to_pandas()["user_id"])
    # 1 has both; 2 purchase-only, 3 click-only, 4 purchase-only
    assert got == {1}


def test_cms_overestimate_and_merge(edge_dir, ray_session):
    """CMS point query (min over d rows at the token's cells) must be >= the
    true count for every token, and cells must merge by plain sum."""
    import hashlib

    from rayextract.queries import _CMS_D, _CMS_W
    from rayextract.textstats import _tokens

    cells = QUERIES["cms_token_counts"](edge_dir).to_pandas()
    lut = {(r.row, r.col): r.n for r in cells.itertuples()}

    from collections import Counter

    truth: Counter = Counter()
    for s in EDGE_DOCS["text"]:
        truth.update(_tokens(s))
    for tok, n_true in truth.items():
        est = min(
            lut.get(
                (r, int.from_bytes(
                    hashlib.md5(f"{r}:{tok}".encode()).digest()[:8], "little"
                ) % _CMS_W),
                0,
            )
            for r in range(_CMS_D)
        )
        assert est >= n_true, tok
    # each row's cells sum to the total token count (mass conservation)
    assert (cells.groupby("row")["n"].sum() == sum(truth.values())).all()

    # mergeability: sketch(full) == cellwise-sum of sketches(halves)
    import tempfile

    halves = []
    for part in (EDGE_DOCS.iloc[:4], EDGE_DOCS.iloc[4:]):
        with tempfile.TemporaryDirectory() as d:
            part.to_parquet(os.path.join(d, "documents.parquet"), index=False)
            halves.append(QUERIES["cms_token_counts"](d).to_pandas())
    merged = (
        pd.concat(halves).groupby(["row", "col"], as_index=False)["n"].sum()
        .sort_values(["row", "col"]).reset_index(drop=True)
    )
    full = cells.sort_values(["row", "col"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(full, merged)


def test_ntile_small_n(tmp_path, ray_session):
    """N < tiles: each row gets its own tile, like SQL NTILE."""
    d = str(tmp_path)
    EDGE_DOCS.iloc[:3].to_parquet(os.path.join(d, "documents.parquet"), index=False)
    got = QUERIES["doc_length_quartile"](d).to_pandas()
    want = _oracle(d, "doc_length_quartile")
    assert _canon(got) == _canon(want)
    assert sorted(got["tile"]) == [1, 2, 3]


def test_attribution_boundaries(edge_dir, ray_session):
    out = QUERIES["attribution_click_purchase"](edge_dir).to_pandas()
    n = out.set_index("event_id")["n_clicks_1h"]
    assert n[4] == 3  # t-1h and t both inclusive, pre-window click excluded
    assert n[5] == 2  # tied-timestamp click + the 23:59:59 click count
    assert n[6] == 0  # user with no clicks still gets a row
    assert n[8] == 0  # other users' clicks don't leak
    assert set(out["event_id"]) == {4, 5, 6, 8}  # click-only users absent


def test_running_revenue_tiebreak(edge_dir, ray_session):
    out = QUERIES["running_revenue_per_customer"](edge_dir).to_pandas()
    run = out.set_index("o_orderkey")["run_cents"]
    # same date: orderkey 100 (2000c) accumulates before 101 (1000c)
    assert run[100] == 2000
    assert run[101] == 2000 + 1000
    assert run[102] == 2000 + 1000 + 3000
    assert run[200] == 500


def test_hll_rho_extremes():
    r = _hll_rho(np.asarray([0, 1, 2, 3, 1 << 53, (1 << 54) - 1], dtype=np.uint64))
    # 54-bit remainder: rho = leading zeros + 1
    assert list(r) == [55, 54, 53, 53, 1, 1]


def test_hll_register_merge_invariance(edge_dir, ray_session):
    """Sketch mergeability: registers of the whole == max-merge of split
    halves — the property that makes HLL safe under any batch split."""
    full = QUERIES["hll_users_per_type"](edge_dir)
    full = full[["event_type", "bucket", "rho"]].sort_values(
        ["event_type", "bucket"]).reset_index(drop=True)

    import tempfile

    halves = []
    for part in (EDGE_EVENTS.iloc[:5], EDGE_EVENTS.iloc[5:]):
        with tempfile.TemporaryDirectory() as d:
            part.to_parquet(os.path.join(d, "events.parquet"), index=False)
            halves.append(
                QUERIES["hll_users_per_type"](d)[["event_type", "bucket", "rho"]]
            )
    merged = (
        pd.concat(halves)
        .groupby(["event_type", "bucket"], as_index=False)["rho"].max()
        .sort_values(["event_type", "bucket"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(full, merged)
