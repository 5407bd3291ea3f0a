"""Gazetteer multi-pattern matching — the keyword-tagging operator every
extraction pipeline grows once its SearchKey list stops being one phrase
(the reference gates each document on a single configured SearchKey,
TextExtraction/Worker.cs:117-143; this is that gate generalized to a term
list with per-term counts).

Two kernels, one contract (substring counts per term, overlaps included):

- ``vector_counts``: one pandas ``str.count`` pass per term. For a small
  gazetteer this is the fastest kernel by far (each pass is a C-level scan)
  and is the default below ``AC_THRESHOLD`` terms.
- ``AhoCorasick``: the classic automaton (Aho & Corasick 1975, public
  knowledge) — ONE pass over the text regardless of term count, which is
  the only shape that survives a 10k+ term gazetteer (the FlashText
  argument). Built once per worker (D4 engine-loader pattern); the walk is
  a per-character loop, so it only wins when the per-term passes outnumber
  it.

Equality of the two kernels is pinned by a property test
(tests/test_gazetteer.py). Every term MUST be border-free (no proper
prefix that is also a suffix): then non-overlapping and overlapping
occurrence counts coincide, so the DuckDB oracle's replace()-based count
is exact for both kernels. ``_assert_border_free`` enforces this at import.
"""

from __future__ import annotations

import re
from collections import deque

import numpy as np
import pandas as pd

# Fixed corpus gazetteer: data-engineering phrases from the document
# vocabulary, incl. a nested pair ("table" inside "fast table"/"big table"/
# "sort table") to exercise the automaton's suffix-output links.
TERMS: "tuple[str, ...]" = (
    "fast table",
    "row scan",
    "merge batch",
    "hash value",
    "window data",
    "customer query",
    "big table",
    "slow filter",
    "agg row",
    "key scan",
    "sort table",
    "table",
    "vector",
    "stream",
    "spark",
)

#: term-count crossover above which the one-pass automaton beats per-term
#: vectorized scans (measured: ~60 terms on this corpus's text lengths).
AC_THRESHOLD = 64


def _assert_border_free(terms) -> None:
    for t in terms:
        for k in range(1, len(t)):
            if t[:k] == t[-k:]:
                raise ValueError(f"gazetteer term {t!r} has a border {t[:k]!r}")


_assert_border_free(TERMS)


class AhoCorasick:
    """Dict-trie Aho-Corasick with BFS failure links and merged output
    lists; ``counts(text)`` returns per-term occurrence counts in one pass."""

    def __init__(self, terms=TERMS):
        self.terms = tuple(terms)
        goto: "list[dict[str, int]]" = [{}]
        out: "list[list[int]]" = [[]]
        for ti, term in enumerate(self.terms):
            s = 0
            for ch in term:
                nxt = goto[s].get(ch)
                if nxt is None:
                    goto.append({})
                    out.append([])
                    nxt = len(goto) - 1
                    goto[s][ch] = nxt
                s = nxt
            out[s].append(ti)
        fail = [0] * len(goto)
        q: "deque[int]" = deque()
        for s in goto[0].values():
            q.append(s)
        while q:
            r = q.popleft()
            for ch, s in goto[r].items():
                q.append(s)
                f = fail[r]
                while f and ch not in goto[f]:
                    f = fail[f]
                fail[s] = goto[f].get(ch, 0) if goto[f].get(ch, 0) != s else 0
                out[s].extend(out[fail[s]])  # merged suffix outputs
        self._goto, self._fail, self._out = goto, fail, out

    def counts(self, text: str, acc: "np.ndarray | None" = None) -> np.ndarray:
        """Per-term occurrence counts (overlaps included) in one text pass."""
        if acc is None:
            acc = np.zeros(len(self.terms), dtype=np.int64)
        goto, fail, out = self._goto, self._fail, self._out
        s = 0
        for ch in text:
            while s and ch not in goto[s]:
                s = fail[s]
            s = goto[s].get(ch, 0)
            for ti in out[s]:
                acc[ti] += 1
        return acc


def ac_counts(texts, terms=TERMS) -> np.ndarray:
    """(n_texts, n_terms) int64 counts via one shared automaton."""
    ac = AhoCorasick(terms)
    res = np.zeros((len(texts), len(ac.terms)), dtype=np.int64)
    for i, t in enumerate(texts):
        if isinstance(t, str) and t:
            ac.counts(t, res[i])
    return res


def vector_counts(texts: pd.Series, terms=TERMS) -> np.ndarray:
    """(n_texts, n_terms) int64 counts via one C-level scan per term.
    Exact for border-free terms (non-overlapping == total)."""
    s = texts.fillna("")
    res = np.empty((len(s), len(terms)), dtype=np.int64)
    for j, t in enumerate(terms):
        res[:, j] = s.str.count(re.escape(t)).to_numpy(dtype=np.int64)
    return res


def match_counts_batch(df: pd.DataFrame, terms=TERMS) -> pd.DataFrame:
    """(doc_id, n_matches, n_terms) per document; kernel picked by term
    count (vectorized under AC_THRESHOLD, automaton above)."""
    if len(terms) >= AC_THRESHOLD:
        m = ac_counts(df["text"].tolist(), terms)
    else:
        m = vector_counts(df["text"], terms)
    return pd.DataFrame(
        {
            "doc_id": df["doc_id"].astype("int64"),
            "n_matches": m.sum(axis=1),
            "n_terms": (m > 0).sum(axis=1).astype(np.int64),
        }
    )
