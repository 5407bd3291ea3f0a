"""Crash-safe, input-keyed parquet checkpointing for intermediate stages.

At 100-TB scale the expensive intermediates (minhash signatures, k-means
embedding matrices) persist to partitioned parquet so a resumed job skips
recompute. Two failure modes this module closes (both observed in review of
the naive marker-file pattern):

  * a crash between write_parquet and the marker leaves partial files; a
    retry into the same dir APPENDS (Ray writes unique filenames), so a
    later read returns duplicated rows. Fix: write into a `._tmp` sibling
    and atomically `os.replace` it over the target, so the published dir is
    always exactly one complete run.
  * the marker encodes nothing about the corpus or stage params, so reusing
    a checkpoint_dir after inputs/params change silently serves stale rows.
    Fix: the marker stores a sha256 fingerprint of the stage params plus the
    dataset's input files (metadata-only via Dataset.input_files()) or a
    caller-supplied token; mismatch forces recompute.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
from typing import Callable


def stage_fingerprint(params: dict, input_files: "list[str] | None") -> str:
    parts = dict(params)
    if input_files:
        parts["__files"] = sorted(input_files)
    return hashlib.sha256(
        json.dumps(parts, sort_keys=True, default=str).encode()
    ).hexdigest()


def dataset_input_files(ds) -> "list[str]":
    """Best-effort metadata-only input lineage for fingerprinting. Empty for
    from_items/synthetic datasets — callers pass an explicit token then."""
    try:
        return list(ds.input_files() or [])
    except Exception:
        return []


def checkpointed_parquet(
    build: "Callable[[], object]",
    checkpoint_dir: str,
    fingerprint: str,
):
    """Return a Dataset read from `checkpoint_dir`, (re)computing via
    `build()` when the dir is missing, partial, or keyed to a different
    fingerprint. The publish is atomic: build into `<dir>._tmp`, replace,
    then write the marker — a crash at any point leaves either the old
    valid checkpoint or no marker (→ clean recompute), never a mix."""
    import ray

    root = checkpoint_dir.rstrip("/")
    marker = root + "._SUCCESS"
    valid = False
    if os.path.exists(marker) and os.path.isdir(root):
        try:
            with open(marker) as f:
                valid = f.read().strip() == fingerprint
        except OSError:
            valid = False
    if not valid:
        tmp = root + "._tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)
        try:
            os.remove(marker)  # invalidate before touching the target
        except OSError:
            pass
        build().write_parquet(tmp)
        shutil.rmtree(root, ignore_errors=True)
        os.replace(tmp, root)
        with open(marker, "w") as f:
            f.write(fingerprint + "\n")
    return ray.data.read_parquet(root)
