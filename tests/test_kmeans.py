"""Mini k-means: deterministic assignment of well-separated clusters."""

import numpy as np
import pandas as pd

import ray.data as rd


def test_kmeans_separates_blobs(tmp_path):
    rng = np.random.RandomState(0)
    centers = np.array([[0.0] * 8, [50.0] * 8, [-50.0] * 8])
    rows = []
    for i in range(90):
        c = i % 3
        rows.append((i, (centers[c] + rng.standard_normal(8)).tolist()))
    df = pd.DataFrame(rows, columns=["vec_id", "embedding"])
    p = str(tmp_path / "embeddings.parquet")
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.Table.from_pandas(df), p)

    from rayextract.queries import kmeans_embeddings

    out = kmeans_embeddings(str(tmp_path), k=3, iters=5).to_pandas()
    assert len(out) == 90
    # all members of a true blob share one predicted cluster
    merged = out.merge(
        pd.DataFrame({"vec_id": range(90), "truth": [i % 3 for i in range(90)]}),
        on="vec_id",
    )
    for _, g in merged.groupby("truth"):
        assert g["cluster"].nunique() == 1
    # the three blobs land in three distinct clusters
    assert merged.groupby("truth")["cluster"].first().nunique() == 3


def test_kmeans_deterministic(tmp_path):
    rng = np.random.RandomState(1)
    df = pd.DataFrame(
        {
            "vec_id": range(40),
            "embedding": [rng.standard_normal(8).tolist() for _ in range(40)],
        }
    )
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.Table.from_pandas(df), str(tmp_path / "embeddings.parquet"))
    from rayextract.queries import kmeans_embeddings

    a = kmeans_embeddings(str(tmp_path), k=4, iters=3).to_pandas().sort_values("vec_id")
    b = kmeans_embeddings(str(tmp_path), k=4, iters=3).to_pandas().sort_values("vec_id")
    assert a["cluster"].tolist() == b["cluster"].tolist()
