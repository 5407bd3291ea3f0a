"""Connected components over a pair list — dedup-cluster assignment.

Near-dup pair lists (MinHash/Jaccard/SimHash output) become cluster ids via
min-label propagation: every node's label converges to the minimum doc_id
reachable from it — a deterministic canonical cluster id (keep doc ==
cluster id, drop the rest, the standard dedup policy).

Scale shape per iteration: one hash-partitioned ``Dataset.join`` (labels ⋈
edges) + one bucketed min-reduce — both O(edges); iterations = graph
diameter (near-dup clusters are shallow, typically <5). The driver loop only
carries a scalar changed-count per iteration; labels/edges stay distributed.
"""

from __future__ import annotations

import pandas as pd

import ray.data

from .bucketed import bucketed_group_reduce
from .relational import join_partitions


def connected_components(
    pairs: "ray.data.Dataset",
    a: str = "doc_a",
    b: str = "doc_b",
    max_iters: int = 50,
) -> "ray.data.Dataset":
    """(node, cluster_id=min reachable node) for every node in ``pairs``."""

    def to_edges(df: pd.DataFrame) -> pd.DataFrame:
        fwd = pd.DataFrame({"u": df[a], "v": df[b]})
        rev = pd.DataFrame({"u": df[b], "v": df[a]})
        return pd.concat([fwd, rev], ignore_index=True).astype("int64")

    edges = pairs.map_batches(to_edges, batch_format="pandas").materialize()

    labels = bucketed_group_reduce(
        edges, ["u"],
        lambda df: df[["u"]].drop_duplicates(),
        lambda g: g.drop_duplicates().assign(label=lambda d: d["u"]),
        n_buckets=16,
    ).materialize()

    for _ in range(max_iters):
        # neighbor labels: edges ⋈ labels on v, then min(label, own) per u
        msgs = edges.join(
            labels.map_batches(
                lambda df: df.rename(columns={"u": "v"}), batch_format="pandas"
            ),
            join_type="inner", num_partitions=join_partitions(cap=8), on=("v",),
        )

        def min_per_node(df: pd.DataFrame) -> pd.DataFrame:
            return df.groupby("u", sort=False)["label"].min().reset_index()

        neighbor_min = bucketed_group_reduce(
            msgs.map_batches(
                lambda df: df[["u", "label"]], batch_format="pandas"
            ),
            ["u"], min_per_node, min_per_node, n_buckets=16,
        )
        merged = labels.join(
            neighbor_min.map_batches(
                lambda df: df.rename(columns={"label": "nlabel"}),
                batch_format="pandas",
            ),
            join_type="left_outer", num_partitions=join_partitions(cap=8), on=("u",),
        )

        def combine(df: pd.DataFrame) -> pd.DataFrame:
            nl = df["nlabel"].fillna(df["label"])
            out = pd.DataFrame(
                {
                    "u": df["u"].astype("int64"),
                    "label": nl.astype("int64").where(
                        nl < df["label"], df["label"]
                    ).astype("int64"),
                    "changed": (nl < df["label"]).astype("int64"),
                }
            )
            return out

        new_labels = merged.map_batches(combine, batch_format="pandas").materialize()
        changed = new_labels.sum("changed")
        labels = new_labels.drop_columns(["changed"]).materialize()
        if not changed:
            break

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": df["u"].astype("int64"), "cluster_id": df["label"].astype("int64")}
        )

    return labels.map_batches(fin, batch_format="pandas")
