"""Normalization scalar functions F1-F3 (SURVEY.md §2.3).

Reference semantics, reproduced rule-for-rule:

- F1 ``RemoveSpecialCharacters``: delete every char outside the class
  ``[\\w\\s(#\\-@&$:\\/.,|)]`` then ``TrimEnd()``
  (/root/reference/TextExtraction/FilterData.cs:12-15). .NET ``\\w`` is
  Unicode-word; Python ``re`` with ``str`` matches that. .NET ``TrimEnd()``
  trims Unicode whitespace; Python ``str.rstrip()`` does too.
- F2 invariant-culture ``ToUpper`` (Worker.cs:216,294-296): .NET uses *simple*
  case mapping, so ``'ß'`` stays ``'ß'`` — Python/pyarrow full-case map it to
  ``'SS'``. ``upper_invariant`` pins the .NET behavior.
- F3 keyword gate: text passes iff any upper-cased key is a substring
  (Worker.cs:216-220).

All batch-level entry points are vectorized over ``pyarrow`` arrays; Python
loops exist only on the rare slow paths (rows containing ß).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# F1 — verbatim from FilterData.cs:14 (negated char class, Unicode \w).
_SPECIAL = re.compile(r"[^\w\s(#\-@&$:/.,|)]")

# chars whose Python full-case uppercase differs from .NET simple-case mapping.
# ß (U+00DF) is the one the survey pins (SURVEY.md §7.4); ﬁ-style ligatures and
# ŉ etc. also full-case-expand — treat any char whose upper() grows as "keep".
_FULLCASE = re.compile(r"[ßﬀﬁﬂﬃﬄﬅﬆŉǰΐΰẖẗẘẙẚᾀ-ᾯι]")


def remove_special_characters(s: str) -> str:
    """F1 scalar: regex-delete + TrimEnd (FilterData.cs:12-15)."""
    return _SPECIAL.sub("", s).rstrip()


def upper_invariant(s: str) -> str:
    """F2 scalar: .NET invariant ToUpper = per-char simple case mapping."""
    if _FULLCASE.search(s) is None:
        return s.upper()
    return "".join(c if len(c.upper()) > 1 else c.upper() for c in s)


# rows containing ONLY these chars take the vectorized RE2 path: on pure
# ASCII, RE2's \w/\s and pyarrow's upper/rtrim agree exactly with Python's
# Unicode semantics. Anything else (non-ASCII, odd controls) falls back to the
# exact scalar implementation — rare in practice, byte-exact always.
_NON_SIMPLE_ASCII = r"[^\x09-\x0d\x20-\x7e]"


def _slow_rows(arr: pa.Array | pa.ChunkedArray) -> np.ndarray:
    suspect = pc.match_substring_regex(arr, _NON_SIMPLE_ASCII)
    suspect = pc.fill_null(suspect, True)
    if isinstance(suspect, pa.ChunkedArray):
        suspect = suspect.combine_chunks()
    return np.flatnonzero(suspect.to_numpy(zero_copy_only=False))


def _patch(fast: pa.Array | pa.ChunkedArray, src: pa.Array | pa.ChunkedArray,
           idx: np.ndarray, fn) -> pa.Array:
    if isinstance(fast, pa.ChunkedArray):
        fast = fast.combine_chunks()
    if idx.size == 0:
        return fast
    if isinstance(src, pa.ChunkedArray):
        src = src.combine_chunks()
    # materialize ONLY the slow rows; patch them in with a vectorized kernel
    # (the previous full-batch to_pylist round-trip cost ~27ms per 1k batch)
    slow_src = src.take(pa.array(idx, pa.int64())).to_pylist()
    repl = pa.array(
        [fn(s) if s is not None else None for s in slow_src], pa.string()
    )
    mask = np.zeros(len(fast), dtype=bool)
    mask[idx] = True
    return pc.replace_with_mask(fast, pa.array(mask), repl)


def remove_special_array(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized F1: RE2 kernel on ASCII rows, exact scalar fallback else."""
    cleaned = pc.replace_substring_regex(arr, pattern=_SPECIAL.pattern, replacement="")
    cleaned = pc.utf8_rtrim_whitespace(cleaned)
    return _patch(cleaned, arr, _slow_rows(arr), remove_special_characters)


def upper_invariant_array(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized F2: utf8_upper on ASCII rows, .NET simple-case scalar else."""
    up = pc.utf8_upper(arr)
    return _patch(up, arr, _slow_rows(arr), upper_invariant)


def keyword_mask(upper_arr: pa.Array | pa.ChunkedArray, keys_upper: tuple[str, ...]) -> pa.Array:
    """F3: boolean mask — any key is a substring of the (already upper) text.

    Semantics: OR over literal substring matches (Worker.cs:216-220). One
    RE2 alternation of escaped literals instead of an OR-fold of per-key
    ``pc.match_substring`` passes: the per-key fold re-scanned the whole
    column once per key (18 keys = 18x the column's DRAM traffic — the
    parse stage is memory-bandwidth-bound at high core counts, see
    BASELINE.md round-3 scaling notes). Literal alternation in RE2 is
    prefiltered internally; equivalence with the substring OR is exact.
    """
    if not keys_upper:
        return pc.equal(pc.utf8_length(upper_arr), -1)  # all-false of right length
    pattern = "|".join(re.escape(k) for k in keys_upper)
    return pc.match_substring_regex(upper_arr, pattern)


def contains_any(upper_text: str, keys_upper: tuple[str, ...]) -> bool:
    """Scalar F3 (used by the oracle and per-row extractor guards)."""
    return any(k in upper_text for k in keys_upper)
