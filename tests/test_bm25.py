"""bm25_topk == brute-force float BM25 ranking (within-term, k1=1.2 b=0.75)."""

from collections import Counter

import pandas as pd

from rayextract.queries import bm25_topk
from rayextract.textstats import _tokens

SF = "/root/testdata/sf0.001"


def test_bm25_rank_matches_bruteforce_float_formula(ray_session):
    got = bm25_topk(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    toks = {int(r.doc_id): _tokens(r.text) for r in docs.itertuples()}
    dls = {d: len(t) for d, t in toks.items() if t}
    S, N = sum(dls.values()), len(dls)
    avgdl = S / N
    wc: Counter = Counter()
    for t in toks.values():
        wc.update(t)
    terms = sorted(wc, key=lambda w: (-wc[w], w))[:3]
    assert sorted(set(got["term"])) == sorted(terms)
    k1, b = 1.2, 0.75
    for term in terms:
        scored = []
        for d, tl in toks.items():
            tf = tl.count(term)
            if tf:
                # textbook saturation form; the query ranks by the
                # equivalent exact-int rational — ranking must agree
                sc = tf * (k1 + 1) / (tf + k1 * (1 - b + b * dls[d] / avgdl))
                scored.append((-sc, d))
        want = [d for _, d in sorted(scored)[:10]]
        sub = got[got["term"] == term].sort_values("rank")
        assert list(sub["doc_id"]) == want
        assert list(sub["rank"]) == list(range(1, len(want) + 1))
