"""Data-contract validation — the Deequ / Great-Expectations class of
component (Schelter et al., "Automating Large-Scale Data Quality
Verification", VLDB 2018, public): declarative rules checked distributed,
with a per-rule violation count instead of a crash, so a 100 TB ingest can
gate (or quarantine) on data quality without a second full scan per rule.

Rule kinds:

- ``not_null(col)``        — value must not be null/NaN
- ``in_set(col, values)``  — value must be one of a closed set
- ``min_value(col, lo)`` / ``max_value(col, hi)`` — numeric bounds
- ``matches(col, regex)``  — full-match against an anchored pattern
- ``unique(col)``          — no value occurs twice corpus-wide

Scale shape: all row-local rules fold into ONE vectorized ``map_batches``
pass emitting a rules-cardinality counter frame per batch (one narrow
exchange sums them). ``unique`` needs co-location by value, so it ships
(16-byte md5, count) partials through the same bucketed exchange machinery
— distinct-value-sized, never corpus-sized. The final report is
rules-cardinality.
"""

from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass, field

import numpy as np
import pandas as pd


@dataclass(frozen=True)
class Rule:
    name: str
    kind: str  # not_null | in_set | min_value | max_value | matches | unique
    column: str
    values: "tuple | None" = None
    bound: "float | None" = None
    pattern: "str | None" = None


def _row_violations(df: pd.DataFrame, r: Rule) -> int:
    s = df[r.column]
    null = s.isna()
    if r.kind == "not_null":
        return int(null.sum())
    if r.kind == "in_set":
        return int((~s.isin(r.values) & ~null).sum() + null.sum())
    if r.kind == "min_value":
        v = pd.to_numeric(s, errors="coerce")
        return int((v < r.bound).sum() + v.isna().sum())
    if r.kind == "max_value":
        v = pd.to_numeric(s, errors="coerce")
        return int((v > r.bound).sum() + v.isna().sum())
    if r.kind == "matches":
        ok = s.astype("string").str.fullmatch(r.pattern)
        return int((~ok.fillna(False)).sum())
    raise ValueError(f"not a row-local rule: {r.kind}")


def validate_contract(ds, rules: "list[Rule]", n_buckets: int = 32):
    """Dataset -> pd.DataFrame (rule, n_rows, n_violations, ok) —
    rules-cardinality, computed in one row-local pass plus one narrow
    exchange per corpus for the unique rules."""
    from .bucketed import bucketed_group_reduce

    kinds = {"not_null", "in_set", "min_value", "max_value", "matches",
             "unique"}
    for r in rules:  # fail fast on the driver, not inside a Ray task
        if r.kind not in kinds:
            raise ValueError(f"unknown rule kind: {r.kind}")
    row_rules = [r for r in rules if r.kind != "unique"]
    uniq_rules = [r for r in rules if r.kind == "unique"]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        names, viols = [], []
        for r in row_rules:
            names.append(r.name)
            viols.append(_row_violations(df, r))
        out = pd.DataFrame(
            {"key": ["r:" + n for n in names],
             "viol": np.asarray(viols, dtype="int64"),
             "rows": np.full(len(names), len(df), dtype="int64")}
        )
        uparts = []
        for i, r in enumerate(uniq_rules):
            vals = df[r.column].astype("string").fillna("\0null")
            hs = [hashlib.md5(str(v).encode()).hexdigest() for v in vals]
            uparts.append(pd.DataFrame(
                {"key": [f"u{i}:{h}" for h in hs],
                 "viol": np.zeros(len(hs), dtype="int64"),
                 "rows": np.ones(len(hs), dtype="int64")}
            ).groupby("key", as_index=False).sum())
        return pd.concat([out, *uparts], ignore_index=True)

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("key", sort=False, as_index=False)[
            ["viol", "rows"]
        ].sum()

    agg = bucketed_group_reduce(
        ds, ["key"], partial, reduce, n_buckets
    ).to_pandas()
    rows = []
    rkeys = agg[agg["key"].str.startswith("r:")].set_index("key")
    n_rows = int(rkeys["rows"].max()) if len(rkeys) else 0
    for r in row_rules:
        v = int(rkeys.loc["r:" + r.name, "viol"])
        rows.append((r.name, n_rows, v, v == 0))
    for i, r in enumerate(uniq_rules):
        u = agg[agg["key"].str.startswith(f"u{i}:")]
        tot = int(u["rows"].sum())
        dup = int((u["rows"] - 1).sum()) if len(u) else 0
        rows.append((r.name, tot, dup, dup == 0))
    return pd.DataFrame(
        rows, columns=["rule", "n_rows", "n_violations", "ok"]
    ).astype({"n_rows": "int64", "n_violations": "int64"})


DEFAULT_DOC_RULES: "list[Rule]" = [
    Rule("doc_id_unique", "unique", "doc_id"),
    Rule("text_not_null", "not_null", "text"),
    Rule("lang_in_set", "in_set", "lang",
         values=("en", "de", "fr", "es", "zh")),
    Rule("n_chars_nonneg", "min_value", "n_chars", bound=0),
    Rule("source_format", "matches", "source", pattern=r"src\d+"),
]
