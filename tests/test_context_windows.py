"""conv_context_windows == brute-force pandas rolling window per conversation."""

import pandas as pd

from rayextract.queries import _docs_to_transcripts, conv_context_windows

SF = "/root/testdata/sf0.001"


def test_context_windows_match_bruteforce(ray_session):
    got = (
        conv_context_windows(SF)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    turns = _docs_to_transcripts(SF).to_pandas()
    rows = []
    for conv, g in turns.groupby("conv_id"):
        g = g.sort_values("turn_idx")
        lens = g["text"].str.len().tolist()
        idxs = g["turn_idx"].tolist()
        for i, ti in enumerate(idxs):
            lo = max(0, i - 3)
            rows.append((conv, ti, i - lo, sum(lens[lo:i])))
    want = (
        pd.DataFrame(rows, columns=["conv_id", "turn_idx", "n_ctx", "ctx_chars"])
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert (got["n_ctx"].to_numpy() == want["n_ctx"].to_numpy()).all()
    assert (got["ctx_chars"].to_numpy() == want["ctx_chars"].to_numpy()).all()
