"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship transcript-extraction pipeline over
/root/testdata/sf0.001 (documents exploded into per-turn pseudo-transcripts,
then the full parse -> extract -> first-match fold). ``queries()`` exposes one
callable per implemented operator/pipeline from SURVEY.md §2 (plus the
training-data ops: dedup, similarity search, text stats); ``oracle_sql()``
gives the DuckDB-equivalent SQL for every SQL-expressible one.

Ray is initialised by the driver BEFORE this module is imported: nothing here
(or in the rayextract library) calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from rayextract.queries import QUERIES, SQL, transcript_extract


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    return transcript_extract("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(SQL)
