"""Pipeline wiring: read -> parse/extract -> fold -> partitioned parquet.

Replaces the reference's poll-loop + sequential foreach
(/root/reference/TextExtraction/Worker.cs:34-143) with a streaming
``ray.data.Dataset`` and its SQL-Server sink + file-move progress marker
(Services/DbHelper.cs:31-36, Worker.cs:529) with resumable partitioned parquet
plus a per-shard manifest of lineage + metrics (SURVEY.md §4).

Scale notes:
- the transcript read prunes to the needed columns;
- the parse stage is a task pool with per-worker-process cached parser
  instances (models built once per worker, reused across batches and runs);
- the only shuffle is the conv fold (pre-combined partials, optional salt);
- nothing materializes the corpus; both sinks stream.
"""

from __future__ import annotations

import glob
import json
import os
import time

import pyarrow.parquet as pq

import ray.data as rd

from .config import ExtractConfig
from .fold import fold_conversations
from .schema import OUTPUT_FORMAT_VERSION
from .stages import ContentParser

PARSE_COLUMNS = ["conv_id", "turn_idx", "text"]  # role/tool/ts not needed to extract


def read_transcripts(path: str | list[str], columns: list[str] | None = PARSE_COLUMNS):
    """Pruned parquet read of the transcript table (S1 analog)."""
    if isinstance(path, str) and any(c in path for c in "*?["):
        pattern = path
        path = sorted(glob.glob(pattern))
        if not path:
            raise FileNotFoundError(f"no input files match {pattern!r}")
    # metadata-stripped read (pqio.py): pandas-written inputs otherwise make
    # every block schema unhashable and defeat Ray's schema dedup
    from .pqio import read_parquet_clean

    return read_parquet_clean(path, columns=columns)


def read_transcripts_jsonl(path: str | list[str],
                           columns: list[str] | None = PARSE_COLUMNS):
    """JSONL transcript source — the same pipeline over newline-delimited
    JSON exports (one turn object per line). JSON can't prune columns at the
    scan like parquet, so the projection runs as the first (zero-copy Arrow)
    stage after the read; everything downstream is format-agnostic."""
    if isinstance(path, str) and any(c in path for c in "*?["):
        pattern = path
        path = sorted(glob.glob(pattern))
        if not path:
            raise FileNotFoundError(f"no input files match {pattern!r}")
    ds = rd.read_json(path)
    return ds.select_columns(columns) if columns else ds


def read_transcripts_csv(path: str | list[str],
                         columns: list[str] | None = PARSE_COLUMNS):
    """CSV transcript source. Transcript text routinely embeds newlines
    (tool dumps, HTML), so quoted-newline parsing is ON — without
    ``newlines_in_values`` pyarrow splits records mid-text and the pipeline
    sees corrupt rows. Column pruning happens post-read (CSV has no
    projection pushdown); the scan itself is still block-parallel."""
    from pyarrow import csv as pacsv

    if isinstance(path, str) and any(c in path for c in "*?["):
        pattern = path
        path = sorted(glob.glob(pattern))
        if not path:
            raise FileNotFoundError(f"no input files match {pattern!r}")
    ds = rd.read_csv(
        path, parse_options=pacsv.ParseOptions(newlines_in_values=True)
    )
    return ds.select_columns(columns) if columns else ds


# Per-worker-process parser instances keyed by (cfg, sink_dir): built once
# per worker process and reused across batches, tasks, and runs — the same
# models-loaded-once semantics as an actor pool (D4, Worker.cs:61-95) without
# paying an actor-pool start/ramp on every Dataset execution. The default
# cfg.parse_pool="auto" hosts the stage here on >=16-cpu workers and on the
# actor pool below — see config.parse_pool for the A/B record.
_WORKER_PARSERS: dict = {}


def _parser_task_fn(cfg: ExtractConfig, sink_dir: str | None):
    key = (repr(cfg), sink_dir)

    def parse(batch):
        p = _WORKER_PARSERS.get(key)
        if p is None:
            if sink_dir is None:
                p = _WORKER_PARSERS.setdefault(key, ContentParser(cfg))
            else:
                from .stages import ContentParserSink

                p = _WORKER_PARSERS.setdefault(
                    key, ContentParserSink(cfg, sink_dir)
                )
        return p(batch)

    return parse


def _cluster_cpus(default: int = 4) -> int:
    try:
        import ray

        return int(ray.cluster_resources().get("CPU", default))
    except Exception:  # pragma: no cover - ray not initialised yet
        return default


def _parse_pool_mode(cfg: ExtractConfig) -> str:
    mode = os.environ.get("RAYEXTRACT_PARSE_POOL", cfg.parse_pool)
    if mode != "auto":
        return mode
    # "auto": task pool on wide workers (the per-worker-cached task pool has
    # no ramp and ties-or-wins every >=16-cpu A/B), actor pool on narrow ones
    # (at 8 cpus the fused read+parse tasks contend with the fold exchange:
    # 7M-turn corpus 47-56s actor vs 66-75s task) — see config.parse_pool.
    return "task" if _cluster_cpus() >= 16 else "actor"


def _actor_pool_bounds(cfg: ExtractConfig) -> tuple[int, int]:
    """Autoscaling bounds for the parse actor pool.

    Substantial floor: scaling up from min=1 measured 2.3x slower at
    sf0.1/32cpu (the autoscaler lags the work). The floor stays below cpu
    count so read/write/shuffle tasks never starve — a fixed pool sized to
    the whole node deadlocks the streaming executor (observed on 4 CPUs).
    """
    cpus = _cluster_cpus()
    max_c = cfg.tagger_concurrency
    min_c = max(1, min(max_c, cpus - 2) * 2 // 3)
    return min_c, max_c


def _parse_stage(ds, cfg: ExtractConfig, sink_dir: str | None):
    if _parse_pool_mode(cfg) == "task":
        return ds.map_batches(
            _parser_task_fn(cfg, sink_dir),
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
        )
    if sink_dir is None:
        cls, kwargs = ContentParser, {"cfg": cfg}
    else:
        from .stages import ContentParserSink

        cls, kwargs = ContentParserSink, {"cfg": cfg, "sink_dir": sink_dir}
    return ds.map_batches(
        cls,
        fn_constructor_kwargs=kwargs,
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        concurrency=_actor_pool_bounds(cfg),
        num_cpus=1,
    )


def build_turns(ds, cfg: ExtractConfig | None = None):
    """turns_out dataset: decode + normalize + span/candidate emission."""
    return _parse_stage(ds, cfg or ExtractConfig(), None)


def build_turns_fused(ds, cfg: ExtractConfig, turns_dir: str):
    """Parse stage with the turns sink fused into the parse workers: full
    turn rows are written to ``turns_dir`` as a side effect and only the
    narrow fold columns flow downstream. No materialize barrier, wide bytes
    never enter the object store — see stages.ContentParserSink (whose
    content-digest file names make retries idempotent regardless of which
    worker re-runs the batch)."""
    return _parse_stage(ds, cfg, turns_dir)


def build_conv_fields(turns_ds, cfg: ExtractConfig | None = None):
    """conv_fields dataset from a turns_out dataset (E9/A1 fold)."""
    cfg = cfg or ExtractConfig()
    return fold_conversations(
        turns_ds.select_columns(["conv_id", "turn_idx", "confidence", "candidates"]),
        salt_buckets=cfg.salt_buckets,
        num_partitions=cfg.fold_num_partitions,
        n_buckets=cfg.fold_buckets or 128,
    )


def run_extraction(input_path: str | list[str], cfg: ExtractConfig | None = None):
    """(turns_out, conv_fields) lazy datasets for an input path."""
    cfg = cfg or ExtractConfig()
    turns = build_turns(read_transcripts(input_path), cfg)
    return turns, build_conv_fields(turns, cfg)


# ---------------------------------------------------------------------------
# Resumable sharded runner (K1/K3 analog)
# ---------------------------------------------------------------------------

def _glob_root(pattern: str) -> str:
    """Static directory prefix of a glob pattern (stops at the first magic)."""
    parts = []
    for seg in pattern.split(os.sep):
        if any(c in seg for c in "*?["):
            break
        parts.append(seg)
    return os.sep.join(parts) or "."


def _shard_inputs(paths: list[str], n_shards: int, root: str | None = None) -> list[list[str]]:
    """Hash-stable file grouping: a file's shard depends only on its path
    relative to the dataset root (the glob's static prefix), never on the
    rest of the listing. New files arriving between runs (the reference's
    2-min folder poll, Worker.cs:45-56) therefore change ONLY the shards they
    land in; every other shard's input set — and manifest row — is unchanged
    and resume-skips. (Positional round-robin would shift every shard's
    membership when one file appears; basename-only hashing collapsed dated
    subdirectories with repeated part-00000.parquet names into one shard.)
    Renaming or moving a file reassigns its shard — its old shard recomputes
    on the next sweep because the manifest's input set changed."""
    import hashlib

    shards: list[list[str]] = [[] for _ in range(n_shards)]
    for p in sorted(paths):
        key = os.path.relpath(p, root) if root else os.path.normpath(p)
        h = int.from_bytes(hashlib.md5(key.encode()).digest()[:8], "little")
        shards[h % n_shards].append(p)
    return shards


def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest.jsonl")


def _shard_metrics(conv_dir: str) -> dict:
    """Per-partition extraction metrics for the manifest (north-rule lineage+
    metrics requirement): field hit counts + mean confidence, computed from
    the shard's (narrow) conv_fields columns."""
    from .schema import FIELD_NAMES

    import pyarrow.compute as pc

    cols = list(FIELD_NAMES) + ["mean_confidence"]
    tbl = pq.read_table(conv_dir, columns=cols)
    out = {
        f + "_found": int(len(tbl) - tbl.column(f).null_count) for f in FIELD_NAMES
    }
    if len(tbl):
        out["mean_confidence"] = round(
            pc.mean(tbl.column("mean_confidence")).as_py() or 0.0, 4
        )
    return out


def load_manifest(out_dir: str) -> dict[int, dict]:
    """Completed-shard records. A SIGKILL mid-append can tear the trailing
    line; a torn record just means that shard re-runs (its dirs are cleared
    before recompute), so skip unparseable lines instead of bricking resume.
    """
    done = {}
    mp = _manifest_path(out_dir)
    if os.path.exists(mp):
        with open(mp) as f:
            for line in f:
                if line.strip():
                    try:
                        rec = json.loads(line)
                    except json.JSONDecodeError:
                        continue  # torn by a crash mid-append: recompute
                    done[rec["shard"]] = rec
    return done


def run_sharded(
    input_glob: str | list[str],
    out_dir: str,
    cfg: ExtractConfig | None = None,
    n_shards: int = 16,
    write_turns: bool = True,
) -> dict:
    """Resumable run: per shard, write turns/ and conv_fields/ partitions and
    append a manifest row (lineage: input files, row counts, wall, digest).
    Already-manifested shards are skipped — a crashed run resumes where it
    stopped, the reference's moved-file marker generalized (Worker.cs:529).

    PARTITIONING ASSUMPTION (document per SURVEY.md §2 custom-operator rule):
    the conv fold is per-shard, so globally-correct conv_fields require the
    input layout to be conv-aligned (all files of a conversation in one shard
    — e.g. files partitioned by hash(conv_id), the recommended 100 TB layout).
    For arbitrary row-shuffled layouts use ``run_extraction`` (global fold);
    resume is then at job granularity. Turns output is correct either way.
    """
    cfg = cfg or ExtractConfig()
    if isinstance(input_glob, str):
        paths = sorted(glob.glob(input_glob))
        shard_root = _glob_root(input_glob)
    else:
        paths = sorted(input_glob)
        shard_root = None  # explicit file lists hash their normalized path
    if not paths:
        raise FileNotFoundError(f"no input files match {input_glob!r}")
    os.makedirs(out_dir, exist_ok=True)
    done = load_manifest(out_dir)
    shards = _shard_inputs(paths, n_shards, root=shard_root)
    stats = {
        "shards_total": len(shards), "shards_skipped": 0, "shards_empty": 0,
        "turns": 0, "convs": 0,
    }
    for sid, shard_paths in enumerate(shards):
        if not shard_paths:
            stats["shards_empty"] += 1
            continue
        # skip only if the manifest row covers EXACTLY this input set — a
        # shard whose inputs changed (new files polled in) must recompute —
        # AND was written under the current output format: resuming an
        # out_dir from an older schema would leave mixed schemas across
        # shard dirs (rows without "format" predate versioning = version 1)
        if (
            sid in done
            and done[sid].get("inputs") == shard_paths
            and done[sid].get("format", 1) == OUTPUT_FORMAT_VERSION
        ):
            stats["shards_skipped"] += 1
            stats["turns"] += done[sid]["n_turns"]
            stats["convs"] += done[sid]["n_convs"]
            continue
        t0 = time.perf_counter()
        turns_dir = os.path.join(out_dir, "turns", f"shard={sid:05d}")
        tmp_turns = turns_dir + ".tmp"
        n_turns = 0
        # a crash mid-shard leaves stale .tmp dirs (and possibly a stale
        # final dir with no manifest row); the sinks APPEND to an existing
        # dir, so clear all of them or re-runs double the rows
        import shutil

        for stale in (tmp_turns, turns_dir):
            shutil.rmtree(stale, ignore_errors=True)
        if write_turns:
            # fused sink: the parse actors write the full turn rows to
            # tmp_turns themselves and emit only the narrow fold columns —
            # read -> parse+sink -> fold streams end-to-end with no
            # materialize barrier, and the wide text/spans bytes never
            # enter the object store (see stages.ContentParserSink)
            folded_src = build_turns_fused(
                read_transcripts(shard_paths), cfg, tmp_turns
            )
        else:
            folded_src = build_turns(read_transcripts(shard_paths), cfg
                                     ).select_columns(
                ["conv_id", "turn_idx", "confidence", "candidates"]
            )
        conv = fold_conversations(
            folded_src, cfg.salt_buckets, cfg.fold_num_partitions,
            n_buckets=cfg.fold_buckets or 128,
        )
        conv_dir = os.path.join(out_dir, "conv_fields", f"shard={sid:05d}")
        tmp_conv = conv_dir + ".tmp"
        for stale in (tmp_conv, conv_dir):
            shutil.rmtree(stale, ignore_errors=True)
        # driving the conv sink drives the whole fused pipeline (turns files
        # appear in tmp_turns as the parse stage streams)
        conv.write_parquet(tmp_conv)
        # atomic-ish finalize: rename then manifest
        n_parse_errors = 0
        if write_turns:
            os.replace(tmp_turns, turns_dir)
            for f in os.listdir(turns_dir):
                if not f.endswith(".parquet"):
                    continue
                fpath = os.path.join(turns_dir, f)
                md = pq.read_metadata(fpath)
                n_turns += md.num_rows
                # quarantined-row count from parquet column statistics
                # (parse_error is null for healthy rows) — no data read for
                # row groups with usable stats; pyarrow may report statistics
                # with null_count unset, so fall back to reading JUST the
                # parse_error column for those groups
                col_idx = md.schema.names.index("parse_error")
                missing_stats_rgs = []
                for rg in range(md.num_row_groups):
                    col = md.row_group(rg).column(col_idx)
                    if col.statistics is not None and col.statistics.has_null_count:
                        n_parse_errors += (
                            md.row_group(rg).num_rows - col.statistics.null_count
                        )
                    else:
                        missing_stats_rgs.append(rg)
                if missing_stats_rgs:
                    pf = pq.ParquetFile(fpath)
                    for rg in missing_stats_rgs:
                        c = pf.read_row_group(rg, columns=["parse_error"]).column(0)
                        n_parse_errors += len(c) - c.null_count
        os.replace(tmp_conv, conv_dir)
        n_convs = sum(
            pq.read_metadata(os.path.join(conv_dir, f)).num_rows
            for f in os.listdir(conv_dir)
            if f.endswith(".parquet")
        )
        rec = {
            "shard": sid,
            "format": OUTPUT_FORMAT_VERSION,
            "inputs": shard_paths,
            "n_turns": n_turns,
            "n_convs": n_convs,
            "n_parse_errors": n_parse_errors,
            "wall_sec": round(time.perf_counter() - t0, 3),
            "metrics": _shard_metrics(conv_dir),
        }
        with open(_manifest_path(out_dir), "a") as f:
            f.write(json.dumps(rec) + "\n")
        stats["turns"] += n_turns
        stats["convs"] += n_convs
    return stats


def poll_and_run(
    input_glob: str,
    out_dir: str,
    cfg: ExtractConfig | None = None,
    interval_sec: float = 120.0,
    n_shards: int = 16,
    max_polls: int | None = None,
) -> list[dict]:
    """S1 analog — the reference's 2-minute folder poll (Worker.cs:45-56)
    rebuilt on the resumable runner: each sweep re-lists the glob and calls
    ``run_sharded``; hash-stable sharding means only shards whose input set
    gained files recompute, everything else resume-skips. Returns per-sweep
    stats (``max_polls`` bounds the loop for tests; None = run until killed).
    """
    cfg = cfg or ExtractConfig()
    history: list[dict] = []
    polls = 0
    while max_polls is None or polls < max_polls:
        if polls:
            time.sleep(interval_sec)
        history.append(run_sharded(input_glob, out_dir, cfg, n_shards=n_shards))
        polls += 1
    return history
