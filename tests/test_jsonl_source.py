"""JSONL / CSV transcript sources: the same pipeline over newline-delimited
JSON or CSV must produce byte-identical turns to the parquet path."""

import json
import os

import pandas as pd
import pyarrow.parquet as pq

from rayextract.config import ExtractConfig
from rayextract.pipeline import (
    build_turns,
    read_transcripts,
    read_transcripts_csv,
    read_transcripts_jsonl,
)
from rayextract.synth import write_synth


def test_jsonl_matches_parquet(tmp_path, ray_session):
    d = str(tmp_path / "in")
    write_synth(d, n_convs=40, seed=11, n_files=2)
    # convert the parquet corpus to JSONL (one turn object per line)
    jd = str(tmp_path / "jsonl")
    os.makedirs(jd)
    for f in sorted(os.listdir(d)):
        if not f.endswith(".parquet"):
            continue
        df = pq.read_table(os.path.join(d, f)).to_pandas()
        df["ts"] = df["ts"].astype(str)
        with open(os.path.join(jd, f.replace(".parquet", ".jsonl")), "w") as fh:
            for rec in df.to_dict(orient="records"):
                fh.write(json.dumps(rec) + "\n")

    cfg = ExtractConfig(tagger_concurrency=2)
    cols = ["conv_id", "turn_idx", "kind", "extracted_text", "clean_text",
            "confidence"]
    a = (
        build_turns(read_transcripts(os.path.join(d, "*.parquet")), cfg)
        .select_columns(cols).to_pandas()
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    b = (
        build_turns(read_transcripts_jsonl(os.path.join(jd, "*.jsonl")), cfg)
        .select_columns(cols).to_pandas()
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    b["turn_idx"] = b["turn_idx"].astype(a["turn_idx"].dtype)
    pd.testing.assert_frame_equal(a, b)


def test_csv_matches_parquet(tmp_path, ray_session):
    d = str(tmp_path / "in")
    write_synth(d, n_convs=30, seed=12, n_files=2)
    cd = str(tmp_path / "csv")
    os.makedirs(cd)
    saw_newline = False
    for f in sorted(os.listdir(d)):
        if not f.endswith(".parquet"):
            continue
        df = pq.read_table(os.path.join(d, f)).to_pandas()
        saw_newline |= bool(df["text"].str.contains("\n").any())
        df["ts"] = df["ts"].astype(str)
        df.to_csv(os.path.join(cd, f.replace(".parquet", ".csv")), index=False)
    assert saw_newline, "corpus must exercise quoted-newline parsing"

    cfg = ExtractConfig(tagger_concurrency=2)
    cols = ["conv_id", "turn_idx", "kind", "extracted_text", "clean_text",
            "confidence"]
    a = (
        build_turns(read_transcripts(os.path.join(d, "*.parquet")), cfg)
        .select_columns(cols).to_pandas()
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    b = (
        build_turns(read_transcripts_csv(os.path.join(cd, "*.csv")), cfg)
        .select_columns(cols).to_pandas()
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    b["turn_idx"] = b["turn_idx"].astype(a["turn_idx"].dtype)
    pd.testing.assert_frame_equal(a, b)
