"""Resumable sharded runner: manifest skip + resume == single-shot run."""

import json
import os

import pandas as pd

from rayextract import pipeline, synth
from rayextract.config import ExtractConfig


def _read_conv_fields(out_dir):
    import glob

    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(out_dir, "conv_fields", "*", "*.parquet")))
    dfs = [pq.read_table(f).to_pandas() for f in files]
    return (
        pd.concat(dfs, ignore_index=True)
        .sort_values("conv_id")
        .reset_index(drop=True)
    )


def test_sharded_run_and_resume(tmp_path):
    data_dir = tmp_path / "in"
    synth.write_synth(str(data_dir), n_convs=40, seed=11, n_files=6)
    cfg = ExtractConfig()

    out_a = str(tmp_path / "out_a")
    stats_a = pipeline.run_sharded(str(data_dir) + "/*.parquet", out_a, cfg, n_shards=3)
    assert stats_a["shards_skipped"] == 0
    assert stats_a["convs"] > 0

    # simulate a crash after shard 0: keep only shard 0's outputs + manifest line
    out_b = str(tmp_path / "out_b")
    stats_b1 = pipeline.run_sharded(
        str(data_dir) + "/*.parquet", out_b, cfg, n_shards=3
    )
    mp = os.path.join(out_b, "_manifest.jsonl")
    lines = [json.loads(l) for l in open(mp) if l.strip()]
    assert len(lines) == 3
    with open(mp, "w") as f:
        f.write(json.dumps(lines[0]) + "\n")
    import shutil

    for sub in ("turns", "conv_fields"):
        for d in os.listdir(os.path.join(out_b, sub)):
            if d != "shard=00000":
                shutil.rmtree(os.path.join(out_b, sub, d))

    # resume: shard 0 skipped, shards 1-2 redone; result equals single-shot
    stats_b2 = pipeline.run_sharded(
        str(data_dir) + "/*.parquet", out_b, cfg, n_shards=3
    )
    assert stats_b2["shards_skipped"] == 1
    a = _read_conv_fields(out_a)
    b = _read_conv_fields(out_b)
    pd.testing.assert_frame_equal(a, b)
    assert stats_b2["convs"] == stats_a["convs"]
    # n_convs sums to 40: each conversation lands in exactly one shard's output
    # only if its rows all lie in that shard — with row-shuffled input files a
    # conversation can straddle shards, so conv rows may appear in several
    # shard outputs; the global fold result is still correct per shard-local
    # semantics. Assert the manifest is internally consistent instead.
    total = sum(json.loads(l)["n_convs"] for l in open(os.path.join(out_a, "_manifest.jsonl")))
    assert total == stats_a["convs"]


def test_crash_leftover_tmp_does_not_duplicate(tmp_path):
    """A stale .tmp (and unmanifested final dir) from a crashed shard must be
    discarded on re-run — write_parquet appends into existing dirs, so stale
    files would otherwise double the shard's rows."""
    data_dir = tmp_path / "in"
    synth.write_synth(str(data_dir), n_convs=30, seed=3, n_files=4)
    cfg = ExtractConfig()
    out = str(tmp_path / "out")
    pipeline.run_sharded(str(data_dir) + "/*.parquet", out, cfg, n_shards=2)
    want = _read_conv_fields(out)

    # simulate a crash: drop shard 1 from the manifest, move its final dirs
    # back to .tmp with their files still inside (mid-write state)
    import shutil

    mp = os.path.join(out, "_manifest.jsonl")
    lines = [json.loads(l) for l in open(mp) if l.strip()]
    with open(mp, "w") as f:
        f.write(json.dumps([l for l in lines if l["shard"] == 0][0]) + "\n")
    for sub in ("turns", "conv_fields"):
        final = os.path.join(out, sub, "shard=00001")
        shutil.move(final, final + ".tmp")

    stats = pipeline.run_sharded(str(data_dir) + "/*.parquet", out, cfg, n_shards=2)
    assert stats["shards_skipped"] == 1
    got = _read_conv_fields(out)
    pd.testing.assert_frame_equal(got, want)


def test_poll_picks_up_new_files_incrementally(tmp_path):
    """S1 poll analog: a file arriving between sweeps recomputes ONLY the
    shard it hashes into; all other shards resume-skip (hash-stable sharding)."""
    data_dir = tmp_path / "in"
    synth.write_synth(str(data_dir), n_convs=30, seed=7, n_files=5)
    cfg = ExtractConfig()
    out = str(tmp_path / "out")

    s1 = pipeline.run_sharded(str(data_dir) + "/*.parquet", out, cfg, n_shards=4)
    assert s1["shards_skipped"] == 0

    # new file arrives (distinct conv range, same schema)
    extra_dir = tmp_path / "extra"
    synth.write_synth(str(extra_dir), n_convs=6, seed=99, n_files=1)
    import shutil

    shutil.move(
        os.path.join(str(extra_dir), os.listdir(str(extra_dir))[0]),
        os.path.join(str(data_dir), "transcripts-zz-late.parquet"),
    )

    [s2] = pipeline.poll_and_run(
        str(data_dir) + "/*.parquet", out, cfg, interval_sec=0, n_shards=4,
        max_polls=1,
    )
    # exactly the shards NOT hit by the new file skip; at least one recomputes
    assert 0 < s2["shards_skipped"] <= 3
    assert s2["turns"] > s1["turns"]

    # third sweep with nothing new: everything skips
    [s3] = pipeline.poll_and_run(
        str(data_dir) + "/*.parquet", out, cfg, interval_sec=0, n_shards=4,
        max_polls=1,
    )
    assert s3["turns"] == s2["turns"]
    # every populated shard skips (empty shards aren't counted either way)
    assert s3["shards_skipped"] >= s2["shards_skipped"] + 1


def test_old_format_manifest_rows_recompute(tmp_path):
    """ADVICE r2: a manifest row written under an older output-format version
    must NOT resume-skip — otherwise an out_dir written by pre-r2 code (with
    clean_upper in the turns schema) resumes into a mixed-schema dataset."""
    data_dir = tmp_path / "in"
    synth.write_synth(str(data_dir), n_convs=20, seed=13, n_files=4)
    cfg = ExtractConfig()
    out = str(tmp_path / "out")
    glob_pat = str(data_dir) + "/*.parquet"

    pipeline.run_sharded(glob_pat, out, cfg, n_shards=2)
    # all rows current format -> everything skips
    stats = pipeline.run_sharded(glob_pat, out, cfg, n_shards=2)
    assert stats["shards_skipped"] == stats["shards_total"] - stats["shards_empty"]

    # rewrite the manifest as if written by the previous (version-1) code:
    # drop the format field from every row
    mp = pipeline._manifest_path(out)
    rows = [json.loads(l) for l in open(mp) if l.strip()]
    with open(mp, "w") as f:
        for r in rows:
            r.pop("format", None)
            f.write(json.dumps(r) + "\n")
    stats2 = pipeline.run_sharded(glob_pat, out, cfg, n_shards=2)
    assert stats2["shards_skipped"] == 0
    # and the recompute re-stamps the current version
    done = pipeline.load_manifest(out)
    from rayextract.schema import OUTPUT_FORMAT_VERSION

    assert all(r.get("format") == OUTPUT_FORMAT_VERSION for r in done.values())


def _read_turns(out_dir):
    import glob

    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(out_dir, "turns", "*", "*.parquet")))
    dfs = [pq.read_table(f).to_pandas() for f in files]
    return (
        pd.concat(dfs, ignore_index=True)
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )


def test_sigkill_mid_run_resume(tmp_path):
    """REAL crash injection (r4 VERDICT task 8): SIGKILL the whole driver
    process group mid-shard during run_sharded in a fresh subprocess (its own
    Ray cluster; Ray fate-shares workers with the driver via PDEATHSIG), then
    resume in-process. The manifest must skip exactly the shards that
    completed before the kill, and the resumed output content must equal a
    clean single-shot run — including after whatever mid-write / mid-rename /
    mid-append state the kill left behind."""
    import signal
    import subprocess
    import sys
    import time as _time

    data_dir = tmp_path / "in"
    synth.write_synth(str(data_dir), n_convs=120, seed=23, n_files=12)
    cfg = ExtractConfig()
    pat = str(data_dir) + "/*.parquet"

    out_ref = str(tmp_path / "out_ref")
    ref_stats = pipeline.run_sharded(pat, out_ref, cfg, n_shards=6)
    assert ref_stats["convs"] > 0

    out_k = str(tmp_path / "out_k")
    script = (
        "import ray\n"
        "ray.init(address='local', num_cpus=4, include_dashboard=False,"
        " logging_level='ERROR')\n"
        "from rayextract import pipeline\n"
        "from rayextract.config import ExtractConfig\n"
        f"pipeline.run_sharded({pat!r}, {out_k!r}, ExtractConfig(),"
        " n_shards=6)\n"
    )
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, PYTHONPATH=repo_root)
    proc = subprocess.Popen(
        [sys.executable, "-c", script],
        start_new_session=True,
        env=env,
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    mp = os.path.join(out_k, "_manifest.jsonl")
    deadline = _time.time() + 180
    try:
        while _time.time() < deadline:
            if proc.poll() is not None:
                break  # finished before we killed it — assert below
            if os.path.exists(mp) and open(mp).read().count("\n") >= 1:
                break
            _time.sleep(0.02)
        assert proc.poll() is None, (
            "subprocess run finished (or died) before the kill landed — "
            "enlarge the input so at least one shard is still in flight"
        )
        os.killpg(proc.pid, signal.SIGKILL)
    finally:
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except ProcessLookupError:
            pass
        proc.wait(timeout=60)

    done_at_kill = len(pipeline.load_manifest(out_k))
    assert 1 <= done_at_kill < 6, f"kill landed outside a useful window: {done_at_kill}"

    stats = pipeline.run_sharded(pat, out_k, cfg, n_shards=6)
    # only the shards manifested before the kill are skipped
    assert stats["shards_skipped"] == done_at_kill
    assert stats["convs"] == ref_stats["convs"]
    assert stats["turns"] == ref_stats["turns"]
    pd.testing.assert_frame_equal(_read_conv_fields(out_k), _read_conv_fields(out_ref))
    pd.testing.assert_frame_equal(_read_turns(out_k), _read_turns(out_ref))


def test_torn_manifest_line_recomputes_that_shard(tmp_path):
    """A SIGKILL mid-append can tear the trailing manifest line. load_manifest
    must skip the torn record (not raise), and resume recomputes exactly that
    shard — output content unchanged."""
    data_dir = tmp_path / "in"
    synth.write_synth(str(data_dir), n_convs=30, seed=31, n_files=4)
    cfg = ExtractConfig()
    out = str(tmp_path / "out")
    pipeline.run_sharded(str(data_dir) + "/*.parquet", out, cfg, n_shards=2)
    want = _read_conv_fields(out)

    mp = os.path.join(out, "_manifest.jsonl")
    lines = [l for l in open(mp) if l.strip()]
    assert len(lines) == 2
    with open(mp, "w") as f:
        f.write(lines[0])
        f.write(lines[1][: len(lines[1]) // 2])  # torn mid-append

    assert set(pipeline.load_manifest(out)) == {0}
    stats = pipeline.run_sharded(str(data_dir) + "/*.parquet", out, cfg, n_shards=2)
    assert stats["shards_skipped"] == 1
    pd.testing.assert_frame_equal(_read_conv_fields(out), want)
