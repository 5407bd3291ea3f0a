"""relational.global_rank: distributed row_number vs a pandas reference.

Covers: dense duplicate values inside one bin (tiebreak by id), values
spanning many bins, a single hot value (every row in one bin), and tiny
inputs (N < tiles).
"""

import numpy as np
import pandas as pd
import pytest

import ray.data


def _reference(df: pd.DataFrame) -> pd.DataFrame:
    out = df.sort_values(["v", "i"], kind="stable").reset_index(drop=True)
    out["rank"] = np.arange(1, len(out) + 1, dtype="int64")
    return out


@pytest.mark.parametrize(
    "values,bin_width",
    [
        (np.arange(1000) % 7, 4),          # heavy duplicates, few bins
        (np.arange(1000) * 13 % 9973, 64), # spread across many bins
        (np.zeros(257, dtype=int), 16),    # one hot value -> one bin
        (np.array([5, 3]), 2),             # tiny input
    ],
)
def test_global_rank_matches_reference(ray_session, values, bin_width):
    from rayextract.relational import global_rank

    rng = np.random.default_rng(7)
    ids = rng.permutation(len(values)).astype("int64")
    df = pd.DataFrame({"v": np.asarray(values, dtype="int64"), "i": ids})
    ds = ray.data.from_pandas(df).repartition(8)

    ranked, total = global_rank(ds, "v", "i", bin_width=bin_width)
    got = ranked.to_pandas().sort_values("rank").reset_index(drop=True)

    assert total == len(df)
    ref = _reference(df)
    assert got["rank"].tolist() == ref["rank"].tolist()
    assert got["v"].tolist() == ref["v"].tolist()
    assert got["i"].tolist() == ref["i"].tolist()


def test_global_rank_keep_cols(ray_session):
    from rayextract.relational import global_rank

    df = pd.DataFrame(
        {"v": [3, 1, 2], "i": [10, 11, 12], "payload": ["a", "b", "c"]}
    )
    ranked, total = global_rank(
        ray.data.from_pandas(df), "v", "i", bin_width=2, keep_cols=["payload"]
    )
    got = ranked.to_pandas().sort_values("rank").reset_index(drop=True)
    assert total == 3
    assert got["payload"].tolist() == ["b", "c", "a"]
