"""Conversation-level analytics over the full transcript schema.

The extraction spine prunes ``role``/``tool``/``ts`` (pipeline.PARSE_COLUMNS);
this module is the analytics surface for those columns — per-conversation
role mix, content volume, wall-clock span, tool usage — built on the same
bucketed combiner as the fold (one partial row per conversation per batch,
int/min/max merges are order-free, so results are bit-stable under any
partitioning).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

from .bucketed import bucketed_group_reduce

ROLES = ("user", "assistant", "tool", "system")

_AGG = {
    "n_turns": ("n_turns", "sum"),
    **{f"n_{r}": (f"n_{r}", "sum") for r in ROLES},
    "assistant_chars": ("assistant_chars", "sum"),
    "total_chars": ("total_chars", "sum"),
    "n_tool_calls": ("n_tool_calls", "sum"),
    "ts_min": ("ts_min", "min"),
    "ts_max": ("ts_max", "max"),
}


def _partial(df: pd.DataFrame) -> pd.DataFrame:
    chars = df["text"].str.len().fillna(0).astype("int64")
    t = pd.DataFrame(
        {
            "conv_id": df["conv_id"],
            "n_turns": 1,
            **{
                f"n_{r}": (df["role"] == r).astype("int64") for r in ROLES
            },
            "assistant_chars": chars.where(df["role"] == "assistant", 0),
            "total_chars": chars,
            "n_tool_calls": (df["tool"].fillna("") != "").astype("int64"),
            "ts_min": df["ts"],
            "ts_max": df["ts"],
        }
    )
    return t.groupby("conv_id", sort=False).agg(**_AGG).reset_index()


def _reduce(g: pd.DataFrame) -> pd.DataFrame:
    out = g.groupby("conv_id", sort=False).agg(**_AGG).reset_index()
    dur = (out["ts_max"] - out["ts_min"]).dt.total_seconds()
    out["duration_sec"] = dur.fillna(0.0).astype("float64")
    out["assistant_char_share"] = np.where(
        out["total_chars"] > 0,
        out["assistant_chars"].astype("float64") / out["total_chars"].astype("float64"),
        0.0,
    )
    return out.drop(columns=["ts_min", "ts_max"])


def conversation_stats(transcripts: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-conversation role/volume/tool/duration stats.

    Input: the canonical transcript schema (conv_id, turn_idx, role, text,
    tool, ts). Output: one row per conversation with ``n_turns``, per-role
    counts, char volumes + assistant share, tool-call count, duration_sec.
    """
    return bucketed_group_reduce(
        transcripts, ["conv_id"], _partial, _reduce, n_buckets=64
    )
