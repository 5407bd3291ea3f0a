"""E9/A1 — the first-match-wins fold: the pipeline's one logical shuffle.

Reference semantics: each extractor fires only while its field is still empty,
iterating pages->lines in order (/root/reference/TextExtraction/Worker.cs:
222-236,375-394); document confidence is the mean of page confidences
(Worker.cs:119-128). "First" here is defined ONLY by ``turn_idx`` within a
``conv_id`` — never block/arrival order — which makes the result invariant
under any partitioning/permutation of the input (property-tested).

Scale shape: a two-level aggregation.

1. ``map_batches`` partial combine: within each batch, keep only the min-turn
   candidate per (conv_id, field) and a (conf_sum, n_turns) partial per
   conv_id. This collapses shuffle volume from O(turns) to
   O(convs-touched-per-batch x fields) before any exchange.
2. optional salted pre-merge (``salt_buckets > 0``): groupby
   (conv_id, salt=hash(conv)%K) first, merging partials, for conversations so
   hot that even their partial rows skew a single reducer.
3. ``groupby("conv_id").map_groups`` finalize: winner per field = min
   (turn_idx); mean confidence = conf_sum / n_turns.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray.data

from .schema import CONV_FIELDS_SCHEMA, FIELD_NAMES

_PARTIAL_COLS = ["conv_id", "field", "turn_idx", "value", "start", "end", "conf_sum", "n_turns"]


def partial_combine(batch: pa.Table) -> pa.Table:
    """Batch-level combiner: min-turn candidate per (conv, field) + conf partials."""
    df = batch.select(["conv_id", "turn_idx", "confidence", "candidates"]).to_pandas()

    conf = (
        df.groupby("conv_id", sort=False)["confidence"]
        .agg(conf_sum="sum", n_turns="count")
        .reset_index()
    )
    conf["field"] = ""
    conf["turn_idx"] = -1
    conf["value"] = ""
    conf["start"] = -1
    conf["end"] = -1

    has = df["candidates"].map(len) > 0
    if has.any():
        ex = df.loc[has, ["conv_id", "turn_idx", "candidates"]].explode("candidates")
        cand = pd.DataFrame(ex["candidates"].tolist(), index=ex.index)
        cand["conv_id"] = ex["conv_id"]
        cand["turn_idx"] = ex["turn_idx"]
        # min turn per (conv, field) within this batch
        cand = cand.sort_values(["conv_id", "field", "turn_idx"], kind="stable")
        cand = cand.drop_duplicates(["conv_id", "field"], keep="first")
        cand["conf_sum"] = 0.0
        cand["n_turns"] = 0
        out = pd.concat([conf[_PARTIAL_COLS], cand[_PARTIAL_COLS]], ignore_index=True)
    else:
        out = conf[_PARTIAL_COLS]
    out = out.astype(
        {"turn_idx": "int64", "start": "int64", "end": "int64",
         "conf_sum": "float64", "n_turns": "int64"}
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def merge_partials(g: pd.DataFrame) -> pd.DataFrame:
    """Associative merge of partial rows (used by the salted pre-merge and
    shared with finalize): one row per (field) winner + one conf row."""
    conv = g["conv_id"].iloc[0]
    conf_rows = g[g["field"] == ""]
    merged = [
        {
            "conv_id": conv, "field": "", "turn_idx": -1, "value": "",
            "start": -1, "end": -1,
            "conf_sum": float(conf_rows["conf_sum"].sum()),
            "n_turns": int(conf_rows["n_turns"].sum()),
        }
    ]
    cand = g[g["field"] != ""]
    if len(cand):
        cand = cand.sort_values(["field", "turn_idx"], kind="stable")
        cand = cand.drop_duplicates(["field"], keep="first")
        merged.extend(cand.to_dict("records"))
    return pd.DataFrame(merged, columns=_PARTIAL_COLS)


def finalize_group(g: pd.DataFrame) -> pd.DataFrame:
    """One conv_fields row from a conversation's partial rows."""
    conv = g["conv_id"].iloc[0]
    row: dict = {"conv_id": conv}
    cand = g[g["field"] != ""].sort_values(["field", "turn_idx"], kind="stable")
    winners = cand.drop_duplicates(["field"], keep="first").set_index("field")
    for f in FIELD_NAMES:
        if f in winners.index:
            row[f] = winners.loc[f, "value"]
            row[f + "_turn"] = int(winners.loc[f, "turn_idx"])
        else:
            row[f] = None
            row[f + "_turn"] = None
    conf_sum = float(g.loc[g["field"] == "", "conf_sum"].sum())
    n_turns = int(g.loc[g["field"] == "", "n_turns"].sum())
    mean_conf = conf_sum / n_turns if n_turns else 0.0
    row["mean_confidence"] = mean_conf
    # F11: the reference formats confidence "{0:0.00}" (Worker.cs:268,449)
    row["confidence_fmt"] = f"{mean_conf:.2f}"
    row["n_turns"] = n_turns
    # return Arrow with the canonical schema: pandas all-NA columns otherwise
    # infer a `null` parquet type per partition, producing files with
    # mismatched schemas (observed breaking DuckDB multi-file reads)
    return pa.Table.from_pylist([row], schema=CONV_FIELDS_SCHEMA)


def fold_conversations(
    turns: "ray.data.Dataset",
    salt_buckets: int = 0,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """turns (conv_id, turn_idx, confidence, candidates) -> conv_fields."""
    partials = turns.map_batches(partial_combine, batch_format="pyarrow")
    if salt_buckets and salt_buckets > 1:
        def add_salt(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["salt"] = pd.util.hash_array(df["turn_idx"].to_numpy()) % salt_buckets
            return df

        partials = partials.map_batches(add_salt, batch_format="pandas")
        partials = partials.groupby(["conv_id", "salt"]).map_groups(
            lambda g: merge_partials(g.drop(columns=["salt"])),
            batch_format="pandas",
        )
    if num_partitions:
        partials = partials.repartition(num_partitions)
    return partials.groupby("conv_id").map_groups(finalize_group, batch_format="pandas")
