"""relational.auto_join / copartition_join: both strategies must produce
identical rows, and the dispatch must pick the intended path."""

import numpy as np
import pandas as pd
import pytest

import ray.data


def _frames(n_left=500, n_right=40, seed=1):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame(
        {"k": rng.integers(0, n_right + 10, n_left).astype("int64"),
         "lv": np.arange(n_left, dtype="int64")}
    )
    right = pd.DataFrame(
        {"k": np.arange(n_right, dtype="int64"),
         "rv": (np.arange(n_right, dtype="int64") * 7)}
    )
    return left, right


def _canon(df: pd.DataFrame) -> list:
    df = df[sorted(df.columns)]
    return sorted(map(tuple, df.itertuples(index=False, name=None)))


def _expected(left, right):
    return _canon(left.merge(right, on="k"))


def test_both_paths_match_pandas(ray_session):
    from rayextract.relational import auto_join, copartition_join

    left, right = _frames()
    lds = ray.data.from_pandas(left).repartition(4)
    rds = ray.data.from_pandas(right).repartition(2)

    bcast = auto_join(lds, rds, "k", ["lv"], ["rv"],
                      broadcast_threshold_rows=1_000_000)
    copart = copartition_join(lds, rds, "k", ["lv"], ["rv"])
    exp = _expected(left, right)
    assert _canon(bcast.to_pandas()) == exp
    assert _canon(copart.to_pandas()) == exp


def test_dispatch_threshold(ray_session):
    from rayextract.relational import auto_join

    left, right = _frames()
    lds = ray.data.from_pandas(left).repartition(4)
    rds = ray.data.from_pandas(right).repartition(2)
    # force the co-partition path with a tiny threshold; result identical
    forced = auto_join(lds, rds, "k", ["lv"], ["rv"],
                       broadcast_threshold_rows=1)
    assert _canon(forced.to_pandas()) == _expected(left, right)


def test_duplicate_keys_both_sides(ray_session):
    from rayextract.relational import copartition_join

    left = pd.DataFrame({"k": [1, 1, 2], "lv": [10, 11, 20]})
    right = pd.DataFrame({"k": [1, 1, 3], "rv": [100, 101, 300]})
    got = copartition_join(
        ray.data.from_pandas(left), ray.data.from_pandas(right),
        "k", ["lv"], ["rv"],
    ).to_pandas()
    assert _canon(got) == _canon(left.merge(right, on="k"))  # 4 rows
