"""queries._exact_ntile must match DuckDB ntile() on every (n, tiles)."""

import duckdb
import numpy as np
import pandas as pd
import pytest


@pytest.mark.parametrize("n", [1, 2, 3, 4, 5, 7, 8, 97, 100, 1000])
@pytest.mark.parametrize("tiles", [2, 4, 10])
def test_exact_ntile_matches_duckdb(n, tiles):
    from rayextract.queries import _exact_ntile

    rank = np.arange(1, n + 1, dtype="int64")
    got = _exact_ntile(rank, n, tiles)
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"r": rank}))
    exp = con.execute(
        f"SELECT ntile({tiles}) OVER (ORDER BY r) FROM t ORDER BY r"
    ).df().iloc[:, 0].to_numpy()
    assert (got == exp).all()
