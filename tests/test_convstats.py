"""conversation_stats == single-threaded pandas oracle on the synth corpus."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from rayextract import synth
from rayextract.convstats import ROLES, conversation_stats


@pytest.fixture(scope="module")
def corpus():
    return synth.synth_table(80, seed=21)


def _oracle(df: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for conv, g in df.groupby("conv_id"):
        chars = g["text"].str.len()
        rows.append(
            {
                "conv_id": conv,
                "n_turns": len(g),
                **{f"n_{r}": int((g["role"] == r).sum()) for r in ROLES},
                "assistant_chars": int(chars[g["role"] == "assistant"].sum()),
                "total_chars": int(chars.sum()),
                "n_tool_calls": int((g["tool"].fillna("") != "").sum()),
                "duration_sec": float(
                    (g["ts"].max() - g["ts"].min()).total_seconds()
                ),
            }
        )
    out = pd.DataFrame(rows)
    out["assistant_char_share"] = np.where(
        out["total_chars"] > 0,
        out["assistant_chars"] / out["total_chars"], 0.0,
    )
    return out.sort_values("conv_id").reset_index(drop=True)


def test_conversation_stats_match_oracle(corpus):
    got = (
        conversation_stats(rd.from_arrow(corpus).repartition(7))
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    want = _oracle(corpus.to_pandas())
    got = got[want.columns]
    for col in want.columns:
        if col in ("duration_sec", "assistant_char_share"):
            np.testing.assert_allclose(got[col], want[col], atol=1e-9, err_msg=col)
        else:
            assert got[col].tolist() == want[col].tolist(), col
