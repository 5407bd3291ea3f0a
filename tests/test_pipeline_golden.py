"""End-to-end golden test: distributed pipeline == pure-Python oracle.

The north-rule invariant (BASELINE.json): per-turn text equality under stable
(conv_id, turn_idx) ordering, and the first-match-wins conversation fold must
be independent of partitioning / block order.
"""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from rayextract import oracle, pipeline, synth
from rayextract.config import ExtractConfig

N_CONVS = 60
SEED = 42


@pytest.fixture(scope="module")
def corpus():
    tbl = synth.synth_table(N_CONVS, seed=SEED)
    return tbl, tbl.to_pylist()


def _norm(v):
    if v is None or v is pd.NA:
        return None
    if isinstance(v, float) and np.isnan(v):
        return None
    return v


def _assert_frames_match(got: pd.DataFrame, want: pd.DataFrame, float_cols=()):
    assert len(got) == len(want)
    for col in want.columns:
        if col in float_cols:
            np.testing.assert_allclose(
                got[col].values.astype(float), want[col].values.astype(float),
                rtol=0, atol=1e-9, err_msg=col,
            )
            continue
        a = [_norm(x) for x in got[col]]
        b = [_norm(x) for x in want[col]]
        assert a == b, f"column {col} mismatch"


def test_turns_match_oracle_exactly(corpus):
    tbl, rows = corpus
    cfg = ExtractConfig()
    turns = pipeline.build_turns(rd.from_arrow(tbl).repartition(7), cfg)
    got = (
        turns.to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    ot, _ = oracle.oracle_run(rows, cfg)
    want = pd.DataFrame(ot)
    # byte-exact per-turn text equality (the north-rule invariant)
    for col in ["kind", "extracted_text", "clean_text"]:
        assert got[col].tolist() == want[col].tolist(), col
    np.testing.assert_allclose(got["confidence"], want["confidence"], atol=1e-9)


def test_conv_fields_match_oracle(corpus):
    tbl, rows = corpus
    cfg = ExtractConfig()
    turns = pipeline.build_turns(rd.from_arrow(tbl).repartition(5), cfg)
    got = (
        pipeline.build_conv_fields(turns, cfg)
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    _, oc = oracle.oracle_run(rows, cfg)
    want = pd.DataFrame(oc)[got.columns.tolist()]
    _assert_frames_match(got, want, float_cols=("mean_confidence",))


def test_fold_is_permutation_invariant(corpus):
    """Shuffling row order / changing partitioning never changes winners."""
    tbl, rows = corpus
    cfg = ExtractConfig()
    import pyarrow as pa

    perm = np.random.RandomState(7).permutation(tbl.num_rows)
    shuffled = tbl.take(pa.array(perm))
    outs = []
    for nparts, salt, buckets in [(3, 0, None), (11, 0, 8), (5, 4, 128)]:
        c = ExtractConfig(salt_buckets=salt, fold_buckets=buckets)
        turns = pipeline.build_turns(rd.from_arrow(shuffled).repartition(nparts), c)
        outs.append(
            pipeline.build_conv_fields(turns, c)
            .to_pandas()
            .sort_values("conv_id")
            .reset_index(drop=True)
        )
    base = outs[0]
    for other in outs[1:]:
        _assert_frames_match(other[base.columns], base, float_cols=("mean_confidence",))


def test_vendor_lookup_e2e(corpus):
    """E7 broadcast small-side lookup: exact line equality keyed by conv."""
    tbl, rows = corpus
    # find a real (conv, clean_upper) line in the corpus to look up
    from rayextract.oracle import oracle_turn

    target = None
    for r in rows:
        t = oracle_turn(r["text"])
        if t["clean_upper"] and t["kind"] == "plain":
            target = (r["conv_id"], t["clean_upper"])
            break
    lookup = {target: "ACME CORP"}
    cfg = ExtractConfig(vendor_lookup=lookup)
    turns = pipeline.build_turns(rd.from_arrow(tbl).repartition(4), cfg)
    got = pipeline.build_conv_fields(turns, cfg).to_pandas()
    hit = got[got.conv_id == target[0]].iloc[0]
    assert hit["vendor_name"] == "ACME CORP"
    _, oc = oracle.oracle_run(rows, cfg)
    want = pd.DataFrame(oc)
    assert (
        want[want.conv_id == target[0]].iloc[0]["vendor_name"] == "ACME CORP"
    )


def test_skew_convs_match_oracle():
    """Covers the corpus's skew features end-to-end: the 2000+-turn outlier
    conversation (conv 997, FIXTURES §1) and multi-hundred-KB tool-dump turns
    (conv % 211 == 0) must fold to exactly the oracle's winners."""
    import pyarrow as pa

    convs = [997, 1688, 2321, 998, 999, 1000]  # 997: 2k+ turns; 1688/2321: ~300KB turns
    rows = [r for c in convs for r in synth.conversation_rows(SEED, c)]
    tbl = pa.Table.from_pylist(rows)
    assert tbl.num_rows > 2000  # the outlier conversation is really in play
    assert max(len(r["text"]) for r in rows) > 100_000  # and a huge turn

    cfg = ExtractConfig(salt_buckets=4)  # exercise the salted path on skew
    turns = pipeline.build_turns(rd.from_arrow(tbl).repartition(9), cfg)
    got = (
        pipeline.build_conv_fields(turns, cfg)
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    _, oc = oracle.oracle_run(rows, cfg)
    want = pd.DataFrame(oc)[got.columns.tolist()]
    _assert_frames_match(got, want, float_cols=("mean_confidence",))
