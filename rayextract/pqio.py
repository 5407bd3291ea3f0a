"""Metadata-clean parquet reads.

Parquet written through pandas embeds a ``b'pandas'`` schema-metadata blob;
a ``pa.Schema`` carrying metadata is unhashable in this pyarrow build
(``hash(schema)`` raises ``TypeError: unhashable type: 'dict'``), which
defeats Ray Data's schema-deduplication fast path: every cross-block batch
concat logs ``Failed to hash the schemas (for deduplication)`` from every
worker and falls back to a full ``unify_schemas`` walk. At fleet scale that
is one warning line + one slow path per batch per worker.

Fix at the read boundary: read ONE footer driver-side (metadata-only, a few
KB regardless of file size), strip schema- and field-level metadata, and
hand the clean schema to ``read_parquet`` so every downstream block is
hashable. Column pruning is preserved — the schema passed must cover
exactly the pruned columns, in projection order.
"""

from __future__ import annotations

import functools

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd


@functools.lru_cache(maxsize=512)
def _footer_schema(path: str) -> pa.Schema:
    """Schema of one parquet file with all metadata stripped (footer-only
    read; cached — bench re-reads the same tables hundreds of times)."""
    full = pq.read_schema(path)
    return pa.schema([pa.field(f.name, f.type) for f in full])


def read_parquet_clean(path, columns: "list[str] | None" = None, **kwargs):
    """``ray.data.read_parquet`` with a metadata-stripped schema.

    ``path`` may be a single file or a list of files with a homogeneous
    schema (the footer of the first is taken as representative — the same
    assumption ``read_parquet`` itself makes when unifying fragment
    schemas). Falls back to a plain read if the footer can't be inspected
    (e.g. a directory path), losing only the warning-suppression, never
    correctness.
    """
    probe = path[0] if isinstance(path, (list, tuple)) else path
    try:
        base = _footer_schema(probe)
        names = columns if columns is not None else base.names
        schema = pa.schema([pa.field(n, base.field(n).type) for n in names])
    except Exception:
        return rd.read_parquet(path, columns=columns, **kwargs)
    return rd.read_parquet(path, columns=columns, schema=schema, **kwargs)
