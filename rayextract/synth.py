"""Deterministic synthetic transcript generator (FIXTURES.md §1-2).

Produces the exact BASELINE.json ``input_hint`` shape:
(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp[us]). Payload kinds exercise every decode/extract path: plain
prose, HTML with boilerplate, pdfish positional dumps, extractor-triggering
fielded lines, dirty Unicode, and huge tool outputs for skew tests.

Everything is seeded per (seed, conv, turn) via ``random.Random(str)`` (CPython
hashes str seeds deterministically), so any subset of conversations can be
regenerated independently and rows can be shuffled across files without losing
reproducibility — correctness must then come from the explicit
(conv_id, turn_idx) sort, per FIXTURES.md §1.
"""

from __future__ import annotations

import random

import pyarrow as pa
import pyarrow.parquet as pq

from .schema import TRANSCRIPT_SCHEMA

_WORDS = (
    "the quick brown fox jumps over lazy dog pipeline extracts content from "
    "transcripts while agents call tools and users ask questions about data "
    "processing engines built on ray with arrow batches streaming through "
    "object stores across nodes"
).split()

_FIRST = ["JOHN", "JANE", "ALICE", "ROBERT", "MARIA", "DAVID", "LINDA", "JAMES", "SUSAN", "CARLOS"]
_LAST = ["SMITH", "DOE", "GARCIA", "JOHNSON", "LEE", "MARTINEZ", "BROWN", "WILSON", "TAYLOR", "NGUYEN"]
_MONTHS = ["January", "February", "March", "April", "May", "June", "July",
           "August", "September", "October", "November", "December"]
_ROLES = ["user", "assistant", "tool", "system"]
_TOOLS = ["browser", "pdf_reader", "ocr", "search", ""]

BASE_TS = 1_700_000_000_000_000  # us epoch


def _rng(seed: int, conv: int, turn: int, tag: str = "") -> random.Random:
    return random.Random(f"{seed}:{conv}:{turn}:{tag}")


def _sentence(r: random.Random, n: int) -> str:
    return " ".join(r.choice(_WORDS) for _ in range(n))


def _date_str(r: random.Random) -> str:
    style = r.randrange(4)
    m, d, y = r.randrange(1, 13), r.randrange(1, 29), r.randrange(1950, 2024)
    if style == 0:
        return f"{m:02d}/{d:02d}/{y}"
    if style == 1:
        return f"{y}-{m:02d}-{d:02d}"
    if style == 2:
        return f"{_MONTHS[m - 1]} {d}, {y}"
    return f"{d} {_MONTHS[m - 1]} {y}"


def _plain(r: random.Random) -> str:
    return ". ".join(_sentence(r, r.randrange(5, 14)) for _ in range(r.randrange(1, 4)))


def _html(r: random.Random) -> str:
    paras = [f"<p>{_sentence(r, r.randrange(8, 20))}.</p>" for _ in range(r.randrange(1, 5))]
    links = "".join(f'<a href="/l{i}">link {i}</a> ' for i in range(r.randrange(3, 8)))
    return (
        "<html><head><title>t</title></head><body>"
        f"<nav>{links}</nav><header><h1>site header chrome</h1></header>"
        f'<div class="content">{"".join(paras)}</div>'
        f"<div>{links}</div>"
        f"<footer>copyright {r.randrange(2000, 2024)} boilerplate footer text</footer>"
        "</body></html>"
    )


def _pdfish(r: random.Random) -> str:
    lines = []
    for li in range(r.randrange(3, 8)):
        y = 40 * li + r.randrange(-3, 4)
        frags = [(60 + 150 * fi + r.randrange(-5, 6), y + r.randrange(-3, 4),
                  _sentence(r, r.randrange(2, 5))) for fi in range(r.randrange(1, 4))]
        lines.extend(frags)
    r.shuffle(lines)  # emission order is jumbled on purpose
    return "\n".join(f"<<x:{x},y:{y}>>{t}" for x, y, t in lines)


def _fielded(r: random.Random) -> str:
    name = f"{r.choice(_FIRST)} {r.choice(_LAST)}"
    kind = r.randrange(7)
    if kind == 0:
        return f"Patient Name: {name}"
    if kind == 1:
        return f"DOB: {_date_str(r)}"
    if kind == 2:
        return f"INVOICE # {r.randrange(1000, 99999)}"
    if kind == 3:
        if r.random() < 0.3:
            return f"DUE DATE {_date_str(r)}"  # decoy: must NOT set invoice_date
        return f"INVOICE DATE {_date_str(r)}"
    if kind == 4:
        return f"{r.choice(['LOAD', 'REFERENCE'])} REF{r.randrange(100, 9999)}X"
    if kind == 5:
        cents = r.randrange(100, 999999)
        return f"{r.choice(['TOTAL', 'BALANCE DUE'])} ${cents // 100:,}.{cents % 100:02d}"
    return f"Name of the Patient {name}\nDate of Birth {_date_str(r)}"


def _dirty(r: random.Random) -> str:
    base = _sentence(r, r.randrange(4, 10))
    junk = r.choice(["«»", "✦✦✦", "…", "™®", "né Müller ß", "emoji 🙂🙃", "ıİ"])
    return f"{base} {junk} {_sentence(r, 3)}!!!***   \t "


def _huge(r: random.Random) -> str:
    return "\n".join(_sentence(r, 12) for _ in range(4000))  # few-hundred-KB tool dump


_KIND_FNS = [_plain, _html, _pdfish, _fielded, _dirty]


def conv_len(seed: int, conv: int) -> int:
    r = _rng(seed, conv, -1, "len")
    if conv % 997 == 0 and conv > 0:
        return 2000 + r.randrange(500)  # skew outliers (FIXTURES §1)
    # zipf-ish: many short, few long
    return max(1, int(r.paretovariate(1.3)))


def turn_text(seed: int, conv: int, turn: int) -> str:
    r = _rng(seed, conv, turn, "text")
    x = r.random()
    if x < 0.40:
        return _plain(r)
    if x < 0.55:
        return _html(r)
    if x < 0.70:
        return _pdfish(r)
    if x < 0.90:
        return _fielded(r)
    if x < 0.98:
        return _dirty(r)
    return _huge(r) if conv % 211 == 0 else _plain(r)


def conversation_rows(seed: int, conv: int) -> list[dict]:
    n = conv_len(seed, conv)
    rows = []
    for t in range(min(n, 2500)):
        r = _rng(seed, conv, t, "meta")
        role = _ROLES[r.randrange(4)]
        rows.append(
            {
                "conv_id": f"conv-{conv:08d}",
                "turn_idx": t,
                "role": role,
                "text": turn_text(seed, conv, t),
                "tool": r.choice(_TOOLS) if role == "tool" else "",
                "ts": BASE_TS + conv * 3_600_000_000 + t * 1_000_000,
            }
        )
    return rows


def synth_table(n_convs: int, seed: int = 42) -> pa.Table:
    rows: list[dict] = []
    for c in range(n_convs):
        rows.extend(conversation_rows(seed, c))
    # deliberate global shuffle: ordering correctness must come from the sort
    r = random.Random(f"{seed}:shuffle")
    r.shuffle(rows)
    cols = {name: [row[name] for row in rows] for name in TRANSCRIPT_SCHEMA.names}
    return pa.table(
        {
            "conv_id": pa.array(cols["conv_id"], pa.string()),
            "turn_idx": pa.array(cols["turn_idx"], pa.int32()),
            "role": pa.array(cols["role"], pa.string()),
            "text": pa.array(cols["text"], pa.string()),
            "tool": pa.array(cols["tool"], pa.string()),
            "ts": pa.array(cols["ts"], pa.timestamp("us")),
        }
    )


def shard_table(seed: int, shard: int, n_files: int, n_convs: int) -> pa.Table:
    """Conversations shard::n_files, rows shuffled within the shard.

    Equivalent corpus to synth_table for the same (seed, n_convs) but
    generated shard-parallel; row order within files differs (irrelevant —
    pipelines must not depend on arrival order)."""
    rows: list[dict] = []
    for c in range(shard, n_convs, n_files):
        rows.extend(conversation_rows(seed, c))
    r = random.Random(f"{seed}:shuffle:{shard}")
    r.shuffle(rows)
    cols = {name: [row[name] for row in rows] for name in TRANSCRIPT_SCHEMA.names}
    return pa.table(
        {
            "conv_id": pa.array(cols["conv_id"], pa.string()),
            "turn_idx": pa.array(cols["turn_idx"], pa.int32()),
            "role": pa.array(cols["role"], pa.string()),
            "text": pa.array(cols["text"], pa.string()),
            "tool": pa.array(cols["tool"], pa.string()),
            "ts": pa.array(cols["ts"], pa.timestamp("us")),
        }
    )


def write_synth_parallel(
    out_dir: str, n_convs: int, seed: int = 42, n_files: int = 32
) -> list[str]:
    """Ray-task-parallel corpus generation (bench scale). Deterministic for
    fixed (seed, n_convs, n_files)."""
    import os

    import ray

    os.makedirs(out_dir, exist_ok=True)

    @ray.remote
    def gen(shard: int) -> str:
        t = shard_table(seed, shard, n_files, n_convs)
        p = os.path.join(out_dir, f"transcripts-{shard:04d}.parquet")
        pq.write_table(t, p)
        return p

    return sorted(ray.get([gen.remote(i) for i in range(n_files)]))


def write_synth(out_dir: str, n_convs: int, seed: int = 42, n_files: int = 8) -> list[str]:
    """Shuffled rows split across n_files parquet files (FIXTURES §1)."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    table = synth_table(n_convs, seed)
    paths = []
    n = table.num_rows
    per = (n + n_files - 1) // n_files
    for i in range(n_files):
        part = table.slice(i * per, per)
        if part.num_rows == 0:
            break
        p = os.path.join(out_dir, f"transcripts-{i:04d}.parquet")
        pq.write_table(part, p)
        paths.append(p)
    return paths
