"""Range (interval) join: boundary semantics [lo, hi), out-of-range nulls,
non-overlap guard."""

import pandas as pd
import pytest
import ray.data as rd

from rayextract.relational import range_join_broadcast

BANDS = pd.DataFrame(
    {"lo": [0.0, 100.0], "hi": [100.0, 1000.0], "band": ["a", "b"]}
)


def test_boundaries_and_out_of_range():
    df = pd.DataFrame({"v": [-5.0, 0.0, 99.999, 100.0, 999.999, 1000.0]})
    out = range_join_broadcast(
        rd.from_pandas(df), BANDS, "v", "lo", "hi", ["band"]
    ).to_pandas()
    assert out["band"].tolist() == [None, "a", "a", "b", "b", None]


def test_overlapping_intervals_rejected():
    bad = pd.DataFrame({"lo": [0.0, 50.0], "hi": [100.0, 150.0], "band": ["a", "b"]})
    with pytest.raises(ValueError, match="non-overlapping"):
        range_join_broadcast(
            rd.from_pandas(pd.DataFrame({"v": [1.0]})), bad, "v", "lo", "hi", ["band"]
        )
