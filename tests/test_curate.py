"""Curation operators: exact-dedup apply + the composite curation pass.

The driver corpus is duplicate-free, so these tests exercise the duplicate
path directly: drop list = every member of a duplicate group except the min
doc_id, applied as a broadcast anti-semi-join.
"""

import pandas as pd
import ray.data as rd

from rayextract.queries import _dup_drop_ids


def _docs():
    return pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 4, 5, 6],
            "text": [
                "the quick brown fox",   # group A keeper
                "a b",
                "the quick brown fox",   # dup of 0
                "unique text here ok",
                "the quick brown fox",   # dup of 0
                "a b",                   # dup of 1
                "",
            ],
        }
    )


def test_dup_drop_ids():
    drops = _dup_drop_ids(rd.from_pandas(_docs()).repartition(3))
    assert drops == {2, 4, 5}


def test_dedup_apply_keeps_min_per_group():
    docs = rd.from_pandas(_docs()).repartition(3)
    from rayextract.relational import broadcast_semi_join

    kept = (
        broadcast_semi_join(docs, _dup_drop_ids(docs), "doc_id", anti=True)
        .to_pandas().sort_values("doc_id")
    )
    assert kept["doc_id"].tolist() == [0, 1, 3, 6]
    # keeper text survives byte-identical
    assert kept.loc[kept["doc_id"] == 0, "text"].iloc[0] == "the quick brown fox"


def test_dup_drop_ids_empty_on_unique_corpus():
    df = pd.DataFrame({"doc_id": [1, 2, 3], "text": ["x", "y", "z"]})
    assert _dup_drop_ids(rd.from_pandas(df)) == set()
