"""Data-contract rule engine: every rule kind must count violations on a
deliberately dirty frame, and a clean frame must pass everything."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from rayextract.contract import DEFAULT_DOC_RULES, Rule, validate_contract

DIRTY = pd.DataFrame(
    {
        "doc_id": np.asarray([1, 2, 2, 3, 4], dtype=np.int64),  # dup id 2
        "text": ["ok", None, "x", "y", None],  # 2 nulls
        "lang": ["en", "xx", "de", None, "fr"],  # xx + null bad
        "source": ["src1", "srcX", "src22", "nope", "src3"],  # 2 bad
        "n_chars": np.asarray([3, -1, 5, 0, -7], dtype=np.int64),  # 2 neg
    }
)


def _report(df: pd.DataFrame, rules) -> dict:
    ds = ray.data.from_pandas(df).repartition(3)  # force multi-batch merge
    out = validate_contract(ds, rules, n_buckets=4)
    return {r.rule: (r.n_rows, r.n_violations, r.ok)
            for r in out.itertuples()}

def test_dirty_frame_counts(ray_session):
    rep = _report(DIRTY, DEFAULT_DOC_RULES)
    assert rep["doc_id_unique"] == (5, 1, False)
    assert rep["text_not_null"] == (5, 2, False)
    assert rep["lang_in_set"] == (5, 2, False)
    assert rep["n_chars_nonneg"] == (5, 2, False)
    assert rep["source_format"] == (5, 2, False)


def test_clean_frame_passes(ray_session):
    clean = pd.DataFrame(
        {
            "doc_id": np.arange(4, dtype=np.int64),
            "text": ["a", "b", "c", "d"],
            "lang": ["en", "de", "fr", "zh"],
            "source": ["src0", "src1", "src2", "src3"],
            "n_chars": np.asarray([1, 1, 1, 1], dtype=np.int64),
        }
    )
    rep = _report(clean, DEFAULT_DOC_RULES)
    assert all(ok for (_, _, ok) in rep.values())
    assert all(n == 4 for (n, _, _) in rep.values())


def test_bounds_and_unknown_kind(ray_session):
    rep = _report(DIRTY, [Rule("cap", "max_value", "n_chars", bound=4)])
    assert rep["cap"] == (5, 1, False)  # only 5 > 4
    with pytest.raises(ValueError):
        _report(DIRTY, [Rule("bad", "nonsense", "text")])
