"""E9/A1 — the first-match-wins fold: the pipeline's one logical shuffle.

Reference semantics: each extractor fires only while its field is still empty,
iterating pages->lines in order (/root/reference/TextExtraction/Worker.cs:
222-236,375-394); document confidence is the mean of page confidences
(Worker.cs:119-128). "First" here is defined ONLY by ``turn_idx`` within a
``conv_id`` — never block/arrival order — which makes the result invariant
under any partitioning/permutation of the input (property-tested).

Scale shape — fully vectorized, no per-conversation Python:

1. ``map_batches`` partial combine: one WIDE row per conversation per batch —
   (conf_sum, n_turns) plus, per field, the batch-local winner encoded as a
   sortable string ``f"{turn_idx:010d}\\x1f{value}"`` (min == first match).
   Shuffle volume is O(convs-touched-per-batch), never O(turns).
2. hash-bucketed reduce (bucketed.py): ``groupby(hash(conv_id) % B)`` — B
   buckets, per-group overhead per *bucket* — then an Arrow hash-aggregate
   ``group_by(conv_id) {sum, sum, min x fields}`` inside each bucket. (Ray's
   native per-key aggregate costs ~1 ms per group — unusable at 10^8 convs;
   the pandas string-dtype equivalent cost 50x the Arrow kernels.)
   An optional salt pre-pass ((conv_id, salt) buckets) exists for
   conversations hot enough to dominate even their partial-row stream.
3. vectorized decode of the Min-winners into (value, turn) columns, emitted
   with the canonical Arrow schema.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from .bucketed import bucketed_group_reduce
from .schema import CONV_FIELDS_SCHEMA, FIELD_NAMES

_SEP = "\x1f"  # unit separator: cannot appear in normalized values


def _enc_col(f: str) -> str:
    return f"enc_{f}"


_ENC_COLS = [_enc_col(f) for f in FIELD_NAMES]


def partial_combine_arrow(t: pa.Table) -> pd.DataFrame:
    """Arrow-native partial combine: one wide row per conversation per batch.

    The batch arrives zero-copy as Arrow; the hot work (explode candidates,
    min-encode winners, sum confidences) runs in Arrow kernels — converting
    ``candidates: list<struct>`` to pandas dicts per row cost ~45 core-sec at
    sf0.1 scale. Only the tiny per-conv result is pivoted through pandas.
    """
    import pyarrow.compute as pc

    conf = (
        t.select(["conv_id", "confidence"])
        .group_by("conv_id", use_threads=False)
        .aggregate([("confidence", "sum"), ("confidence", "count")])
    )
    out = pd.DataFrame(
        {
            "conv_id": conf.column("conv_id").to_pandas(),
            "conf_sum": conf.column("confidence_sum").to_pandas(),
            "n_turns": conf.column("confidence_count").to_pandas().astype("int64"),
        }
    )

    lc = t.column("candidates")
    if isinstance(lc, pa.ChunkedArray):
        lc = lc.combine_chunks()
    flat = pc.list_flatten(lc)
    if len(flat):
        parents = pc.list_parent_indices(lc)
        turn_str = pc.utf8_lpad(
            pc.cast(pc.take(t.column("turn_idx"), parents), pa.string()),
            10, "0",
        )
        enc = pc.binary_join_element_wise(turn_str, flat.field("value"), _SEP)
        cand = pa.table(
            {
                "conv_id": pc.take(t.column("conv_id"), parents),
                "field": flat.field("field"),
                "enc": enc,
            }
        ).group_by(["conv_id", "field"], use_threads=False).aggregate([("enc", "min")])
        w = (
            cand.to_pandas()
            .pivot(index="conv_id", columns="field", values="enc_min")
            .reset_index()
        )
        out = out.merge(w, on="conv_id", how="left")
    for c in _ENC_COLS:
        f = c[len("enc_"):]
        if f in out.columns:
            out[c] = out.pop(f).astype("string")
        else:
            out[c] = pd.array([pd.NA] * len(out), dtype="string")
    return out[["conv_id", "conf_sum", "n_turns", *_ENC_COLS]]


# Arrow-native merge: pandas string-dtype groupby.min measured 313 core-sec
# on the sf0.1-scale fold; Arrow's hash_aggregate kernels do the same merge
# in ~6 core-sec. ``use_threads=False``: one CPU per Ray task.
_ARROW_AGGS = [("conf_sum", "sum"), ("n_turns", "sum")] + [
    (c, "min") for c in _ENC_COLS
]


def merge_partials_arrow(t: pa.Table) -> pa.Table:
    """Associative merge of wide partial rows -> canonical wide schema."""
    merged = t.group_by("conv_id", use_threads=False).aggregate(_ARROW_AGGS)
    cols = {"conv_id": merged.column("conv_id"),
            "conf_sum": merged.column("conf_sum_sum"),
            "n_turns": merged.column("n_turns_sum")}
    for c in _ENC_COLS:
        col = merged.column(c + "_min")
        if pa.types.is_null(col.type):  # all-NA bucket: pin string dtype
            col = col.cast(pa.string())
        cols[c] = col
    return pa.table(cols)


def decode_final_arrow(t: pa.Table) -> pa.Table:
    """Merge + decode one bucket of partials entirely in Arrow kernels."""
    import pyarrow.compute as pc

    m = merge_partials_arrow(t)
    cols: dict = {"conv_id": m.column("conv_id")}
    for f in FIELD_NAMES:
        enc = m.column(_enc_col(f))
        # enc = "{turn_idx:010d}\x1f{value}"; nulls propagate through slices
        cols[f] = pc.utf8_slice_codeunits(enc, 11, 2**30)
        cols[f + "_turn"] = pc.utf8_slice_codeunits(enc, 0, 10).cast(pa.int32())
    conf_sum = m.column("conf_sum").cast(pa.float64())
    n_turns = m.column("n_turns").cast(pa.int64())
    mean = pc.if_else(
        pc.greater(n_turns, 0),
        pc.divide(conf_sum, pc.max_element_wise(n_turns.cast(pa.float64()),
                                                pa.scalar(1.0))),
        pa.scalar(0.0),
    )
    cols["mean_confidence"] = mean
    # F11 "{0:0.00}" (Worker.cs:268,449): no Arrow fixed-decimals kernel
    cols["confidence_fmt"] = pa.array(
        [f"{v:.2f}" for v in mean.to_pylist()], pa.string()
    )
    cols["n_turns"] = n_turns
    return pa.table(cols).select(CONV_FIELDS_SCHEMA.names)


def fold_conversations(
    turns: "ray.data.Dataset",
    salt_buckets: int = 0,
    num_partitions: int | None = None,
    n_buckets: int = 64,
    stage1_batch_size: int | None = 65536,
) -> "ray.data.Dataset":
    """turns (conv_id, turn_idx, confidence, candidates) -> conv_fields.

    Determinism contract: every FIELD value and winning turn_idx is exactly
    invariant under partitioning, block permutation, and salting (the winner
    encoding is an order-free min). ``mean_confidence`` is float-sum based
    and may differ in the last ulp (~1e-14 observed at sf0.1) across
    partial-merge orders — compare with a tolerance, like the tests do.

    ``stage1_batch_size``: rows per partial-combine batch. 65536 measured
    4-7x faster END-TO-END than 8192 at sf0.1 (fold standalone 5.2s -> 0.75s):
    each stage-1 task collapses ~8x more duplicate conv keys locally, so the
    sort exchange sees ~8x fewer partial rows and far fewer input blocks —
    the exchange's fixed cost, not the merge compute, was the fold wall.
    65536 narrow turn rows ~ 13 MB per task heap; safe at any corpus size
    (the partial output stays one row per conv per batch).
    """
    src = turns
    if salt_buckets and salt_buckets > 1:
        # pre-merge partials under (conv_id, salt) first: bounds any single
        # reducer's share of a pathologically hot conversation
        def salted_partial(t: pa.Table) -> pd.DataFrame:
            out = partial_combine_arrow(t)
            out["salt"] = np.arange(len(out), dtype=np.int64) % salt_buckets
            return out

        pre = bucketed_group_reduce(
            turns, ["conv_id", "salt"],
            salted_partial,
            lambda g: merge_partials_arrow(g.drop_columns(["salt"])),
            n_buckets=n_buckets,
            num_partitions=num_partitions,
            reduce_format="pyarrow",
            stage1_format="pyarrow",
            arrow_exchange=True,
            stage1_batch_size=stage1_batch_size,
        )

        def pin_partials(t: pa.Table) -> pd.DataFrame:
            # re-pin enc_* to pandas "string" dtype before the second
            # arrow_exchange: a stage-1 batch whose rare field is all-NA
            # would otherwise infer Arrow null type via object dtype and
            # conflict with string-typed batches at exchange concat (the
            # hazard bucketed.py's arrow_exchange docstring warns about)
            df = t.to_pandas()
            for c in _ENC_COLS:
                df[c] = df[c].astype("string")
            return df

        final = bucketed_group_reduce(
            pre, ["conv_id"],
            pin_partials,  # already wide partials; dtype pinning only
            decode_final_arrow,
            n_buckets=n_buckets,
            num_partitions=num_partitions,
            reduce_format="pyarrow",
            stage1_format="pyarrow",
            arrow_exchange=True,
            stage1_batch_size=stage1_batch_size,
        )
        return final
    return bucketed_group_reduce(
        src, ["conv_id"],
        partial_combine_arrow,
        decode_final_arrow,
        n_buckets=n_buckets,
        num_partitions=num_partitions,
        reduce_format="pyarrow",
        stage1_format="pyarrow",
        arrow_exchange=True,
        stage1_batch_size=stage1_batch_size,
    )
