"""Model-backed NER: averaged structured perceptron + Viterbi BIO tagger.

The reference loads a Stanford CRF sequence model once per worker and asks it
for the first PERSON/ORGANIZATION span
(/root/reference/NameRecognizer/EntityRecognizer.cs:50-65, Worker.cs:61-95).
``rayextract.ner`` rebuilds the *call semantics* with a deterministic
shape+gazetteer tagger; this module rebuilds the *accuracy class*: a learned
linear sequence model (Collins-2002 averaged structured perceptron — public
knowledge) with first-order Viterbi decode over BIO tags, trained
deterministically from a seeded template corpus so every worker converges to
bit-identical weights. No external data, no pickled artifacts: "model load"
per worker (D4) is a short deterministic training run memoized per process.

Input is the pipeline's F1+F2 normalized UPPER text (Model/PatientName.cs
call order), so case/shape features are useless by construction — the model
leans on lexical identity, context words, digit/punct signals and gazetteer
flags, which is also what a CRF sees after upper-casing.

Tags: O, B-PER, I-PER, B-ORG, I-ORG. The decoder is exact Viterbi over
emission scores (sparse feature dot products) plus learned transition
weights; ties break toward the lexicographically smaller tag index, which is
fixed, so decoding is deterministic.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

TAGS = ["O", "B-PER", "I-PER", "B-ORG", "I-ORG"]
_TAG_IDX = {t: i for i, t in enumerate(TAGS)}
_NTAGS = len(TAGS)

_TOKEN = re.compile(r"\S+")

# public common-name gazetteers (same flavor as the synth corpus generator);
# the held-out test deliberately uses names OUTSIDE these lists to prove the
# context features generalize past the gazetteer.
GAZ_FIRST = frozenset(
    "JOHN JANE ALICE ROBERT MARIA DAVID LINDA JAMES SUSAN CARLOS MARY "
    "MICHAEL PATRICIA WILLIAM ELIZABETH RICHARD BARBARA THOMAS JESSICA "
    "DANIEL SARAH ANNA PETER LAURA KEVIN EMILY".split()
)
GAZ_LAST = frozenset(
    "SMITH DOE GARCIA JOHNSON LEE MARTINEZ BROWN WILSON TAYLOR NGUYEN "
    "JONES DAVIS MILLER RODRIGUEZ LOPEZ GONZALEZ ANDERSON THOMAS MOORE "
    "JACKSON WHITE HARRIS CLARK LEWIS WALKER HALL".split()
)
GAZ_ORG_SUFFIX = frozenset("LLC INC CORP CO LTD LLP GMBH COMPANY".split())
_KEYWORDS = frozenset(
    "PATIENT NAME DOB INVOICE NUMBER DATE TOTAL AMOUNT DUE REFERENCE "
    "PURCHASE ORDER VENDOR FROM WITH AND THE FOR BILL SHIP ATTN".split()
)
_HAS_DIGIT = re.compile(r"\d")
_ALPHA = re.compile(r"[A-Z][A-Z'.\-]*\Z")


def _tok_features(toks: list[str], i: int) -> list[str]:
    """Sparse feature strings for token i (string-keyed: the weight table is
    a dict-of-float32-arrays over tags)."""
    w = toks[i]
    prev = toks[i - 1] if i > 0 else "<S>"
    nxt = toks[i + 1] if i + 1 < len(toks) else "</S>"
    prev2 = toks[i - 2] if i > 1 else "<S>"
    nxt2 = toks[i + 2] if i + 2 < len(toks) else "</S>"
    fs = [
        "b",  # bias
        "w=" + w,
        "p=" + prev,
        "n=" + nxt,
        "pp=" + prev2,
        "nn=" + nxt2,
        "s3=" + w[-3:],
        "p2=" + w[:2],
    ]
    if _HAS_DIGIT.search(w):
        fs.append("dig")
    if _ALPHA.match(w) and len(w) >= 2:
        fs.append("alpha")
    if w in GAZ_FIRST:
        fs.append("gf")
    if w in GAZ_LAST:
        fs.append("gl")
    if w in GAZ_ORG_SUFFIX:
        fs.append("gs")
    if w in _KEYWORDS:
        fs.append("kw")
    if prev in _KEYWORDS:
        fs.append("pkw")
    if nxt in GAZ_ORG_SUFFIX:
        fs.append("nsuf")
    if prev in GAZ_FIRST:
        fs.append("pgf")
    return fs


# --------------------------------------------------------------------------
# deterministic training corpus (seeded templates; names drawn so a held-out
# split by name identity is possible)
# --------------------------------------------------------------------------

# training pools = gazetteer names PLUS deterministic out-of-gazetteer names
# (disjoint from the held-out names): without these, "alpha word the model
# has never seen" occurs only inside ORG spans during training and the model
# learns unknown => ORG — exactly the failure the held-out split measures.
_TRAIN_FIRST = sorted(GAZ_FIRST) + [
    "KORVAL", "DRENNA", "SOLVEI", "TAVISH", "MIRELA", "OKSANA", "FERRAN",
    "IVETTE", "BASTIEN", "NURIA", "DMITRO", "CATALIN",
]
_TRAIN_LAST = sorted(GAZ_LAST) + [
    "VOLKOV", "STRAND", "MERCADO", "OKAFOR", "LINDQVIST", "PETROVA",
    "DUBOIS", "KOWALCZYK", "HARUKI", "HALVORSEN", "SANTANA", "BRENNAN",
]
_ORG_BASES = [
    "ACME", "GLOBEX", "INITECH", "UMBRELLA", "STARK", "WAYNE", "CYBERDYNE",
    "HOOLI", "VANDELAY", "WONKA", "TYRELL", "DUNDER", "MIFFLIN", "OSCORP",
]
_ORG_SECOND = ["SUPPLY", "MEDICAL", "LOGISTICS", "PARTS", "SYSTEMS", "TRADING", ""]


def _sentences(rng: "np.random.RandomState", n: int, firsts, lasts):
    """[(tokens, tags)] — invoice/patient/transcript-flavored templates with
    PERSON and ORG spans plus hard negatives (keyword runs, codes, amounts)."""
    out = []
    for _ in range(n):
        f = firsts[rng.randint(len(firsts))]
        l = lasts[rng.randint(len(lasts))]
        ob = _ORG_BASES[rng.randint(len(_ORG_BASES))]
        o2 = _ORG_SECOND[rng.randint(len(_ORG_SECOND))]
        osuf = sorted(GAZ_ORG_SUFFIX)[rng.randint(len(GAZ_ORG_SUFFIX))]
        org_toks = [ob] + ([o2] if o2 else []) + [osuf]
        num = str(100000 + rng.randint(900000))
        amt = f"${rng.randint(90000) / 100:.2f}"
        date = f"{rng.randint(12)+1:02d}/{rng.randint(28)+1:02d}/{1980+rng.randint(40)}"
        person = [f, l]
        t = rng.randint(8)
        if t == 0:
            toks = ["PATIENT", "NAME", *person, "DOB", date]
            tags = ["O", "O", "B-PER", "I-PER", "O", "O"]
        elif t == 1:
            toks = ["INVOICE", num, "FROM", *org_toks, "TOTAL", amt]
            tags = ["O", "O", "O", "B-ORG"] + ["I-ORG"] * (len(org_toks) - 1) + ["O", "O"]
        elif t == 2:
            toks = [f, l, "CALLED", "ABOUT", "ORDER", num]
            tags = ["B-PER", "I-PER", "O", "O", "O", "O"]
        elif t == 3:
            toks = ["MEETING", "WITH", *person, "AT", *org_toks, "ON", date]
            tags = (
                ["O", "O", "B-PER", "I-PER", "O", "B-ORG"]
                + ["I-ORG"] * (len(org_toks) - 1)
                + ["O", "O"]
            )
        elif t == 4:
            toks = ["TOTAL", "AMOUNT", "DUE", amt, "REFERENCE", f"AB{num[:3]}X"]
            tags = ["O"] * 6
        elif t == 5:
            toks = ["SHIP", "TO", *person, "ATTN", "BILLING"]
            tags = ["O", "O", "B-PER", "I-PER", "O", "O"]
        elif t == 6:
            toks = ["VENDOR", *org_toks, "PURCHASE", "ORDER", num]
            tags = ["O", "B-ORG"] + ["I-ORG"] * (len(org_toks) - 1) + ["O", "O", "O"]
        else:
            toks = ["PLEASE", "REVIEW", "THE", "ATTACHED", "STATEMENT", num]
            tags = ["O"] * 6
        out.append((toks, tags))
    return out


def training_corpus(n: int = 700, seed: int = 11):
    rng = np.random.RandomState(seed)
    return _sentences(rng, n, _TRAIN_FIRST, _TRAIN_LAST)


def heldout_corpus(n: int = 200, seed: int = 97):
    """Names NOT in the gazetteer/training vocab: scores here measure what
    the context features (not lexical memory) learned."""
    rng = np.random.RandomState(seed)
    firsts = ["ZOLTAN", "QUINLAN", "XIOMARA", "BRANKO", "EIRA", "TSUKASA"]
    lasts = ["VRABEC", "OYELARAN", "KETTUNEN", "ZHAMBYL", "ABERNETHY"]
    return _sentences(rng, n, firsts, lasts)


# --------------------------------------------------------------------------
# model
# --------------------------------------------------------------------------


class PerceptronNER:
    """Averaged structured perceptron (Collins 2002) with Viterbi decode.

    Training is fully deterministic (seeded corpus, fixed epoch order, fixed
    tie-breaking) so independently-constructed instances — e.g. one per Ray
    worker — hold bit-identical weights.
    """

    def __init__(self, epochs: int = 6, train_n: int = 700, seed: int = 11):
        self.w: dict[str, np.ndarray] = {}
        self.trans = np.zeros((_NTAGS + 1, _NTAGS), dtype=np.float32)  # [-1]=start
        self._train(training_corpus(train_n, seed), epochs)
        self._freeze()

    # -- decoding ----------------------------------------------------------

    def _emissions(self, feats: list[list[str]]) -> np.ndarray:
        e = np.zeros((len(feats), _NTAGS), dtype=np.float32)
        w = self.w
        for i, fs in enumerate(feats):
            for f in fs:
                v = w.get(f)
                if v is not None:
                    e[i] += v
        return e

    def _viterbi(self, e: np.ndarray) -> list[int]:
        n = len(e)
        score = self.trans[-1] + e[0]
        back = np.zeros((n, _NTAGS), dtype=np.int64)
        for i in range(1, n):
            cand = score[:, None] + self.trans[:-1]  # (prev, cur)
            back[i] = cand.argmax(axis=0)  # argmax: first (smallest) index wins ties
            score = cand[back[i], np.arange(_NTAGS)] + e[i]
        path = [int(score.argmax())]
        for i in range(n - 1, 0, -1):
            path.append(int(back[i][path[-1]]))
        return path[::-1]

    def _freeze(self) -> None:
        """Python-native weight tables for inference: at 5 tags the numpy
        per-op overhead (broadcast add, argmax, fancy index — each on 5 or
        25 elements) is ~3x the arithmetic; the per-document decode cost IS
        the at-scale bill for this stage. Values are float64 copies of the
        averaged float32 weights — identical on every worker."""
        self._wpy = {f: tuple(float(x) for x in v) for f, v in self.w.items()}
        self._tpy = [[float(x) for x in row] for row in self.trans]

    def tag(self, toks: list[str]) -> list[str]:
        if not toks:
            return []
        wpy = self._wpy
        trans = self._tpy
        rng_t = range(_NTAGS)
        # emissions: plain float adds over the sparse features
        emis = []
        for i in range(len(toks)):
            e = [0.0] * _NTAGS
            for f in _tok_features(toks, i):
                v = wpy.get(f)
                if v is not None:
                    for t in rng_t:
                        e[t] += v[t]
            emis.append(e)
        # Viterbi, first-index tie-breaking (same convention as np.argmax)
        start = trans[_NTAGS]
        score = [start[t] + emis[0][t] for t in rng_t]
        back: list[list[int]] = []
        for i in range(1, len(toks)):
            e = emis[i]
            nscore = [0.0] * _NTAGS
            nback = [0] * _NTAGS
            for cur in rng_t:
                best, barg = score[0] + trans[0][cur], 0
                for prev in range(1, _NTAGS):
                    s = score[prev] + trans[prev][cur]
                    if s > best:
                        best, barg = s, prev
                nscore[cur] = best + e[cur]
                nback[cur] = barg
            score = nscore
            back.append(nback)
        last, barg = score[0], 0
        for t in range(1, _NTAGS):
            if score[t] > last:
                last, barg = score[t], t
        path = [barg]
        for nback in reversed(back):
            path.append(nback[path[-1]])
        return [TAGS[t] for t in path[::-1]]

    # -- training ----------------------------------------------------------

    def _train(self, corpus, epochs: int) -> None:
        # lazy-averaged perceptron: totals accumulate weight * steps-alive
        w = self.w
        totals: dict[str, np.ndarray] = {}
        stamps: dict[str, int] = {}
        t_tot = np.zeros_like(self.trans)
        t_stamp = np.zeros((_NTAGS + 1, _NTAGS), dtype=np.int64)
        step = 0
        rng = np.random.RandomState(5)
        idx = np.arange(len(corpus))

        def bump(f: str, tag: int, delta: float) -> None:
            v = w.get(f)
            if v is None:
                v = w[f] = np.zeros(_NTAGS, dtype=np.float32)
                totals[f] = np.zeros(_NTAGS, dtype=np.float32)
                stamps[f] = step
            totals[f] += v * (step - stamps[f])
            stamps[f] = step
            v[tag] += delta

        def bump_t(prev: int, tag: int, delta: float) -> None:
            t_tot[prev, tag] += self.trans[prev, tag] * (step - t_stamp[prev, tag])
            t_stamp[prev, tag] = step
            self.trans[prev, tag] += delta

        for _ in range(epochs):
            rng.shuffle(idx)
            for si in idx:
                toks, gold_tags = corpus[si]
                gold = [_TAG_IDX[t] for t in gold_tags]
                feats = [_tok_features(toks, i) for i in range(len(toks))]
                pred = self._viterbi(self._emissions(feats))
                step += 1
                if pred == gold:
                    continue
                prev_g = prev_p = _NTAGS  # start state
                for i, fs in enumerate(feats):
                    if pred[i] != gold[i]:
                        for f in fs:
                            bump(f, gold[i], 1.0)
                            bump(f, pred[i], -1.0)
                    if (prev_g, gold[i]) != (prev_p, pred[i]):
                        bump_t(prev_g, gold[i], 1.0)
                        bump_t(prev_p, pred[i], -1.0)
                    prev_g, prev_p = gold[i], pred[i]
        # finalize averages
        step += 1
        for f, v in w.items():
            totals[f] += v * (step - stamps[f])
            w[f] = totals[f] / np.float32(step)
        t_tot += self.trans * (step - t_stamp)
        self.trans = (t_tot / np.float32(step)).astype(np.float32)

    # -- reference call semantics (first span, else None) ------------------

    def first_spans(self, text: str) -> "tuple[str | None, str | None]":
        """(first PERSON surface, first ORG surface) from ONE tagging pass —
        the batch stage calls this; two separate get_* calls would featurize
        and Viterbi-decode the same document twice."""
        ms = list(_TOKEN.finditer(text))
        toks = [m.group(0) for m in ms]
        tags = self.tag(toks)
        out: dict[str, "str | None"] = {"PER": None, "ORG": None}
        for i, t in enumerate(tags):
            kind = t[2:]
            if t.startswith("B-") and out[kind] is None:
                j = i
                while j + 1 < len(tags) and tags[j + 1] == "I-" + kind:
                    j += 1
                out[kind] = text[ms[i].start() : ms[j].end()]
                if out["PER"] is not None and out["ORG"] is not None:
                    break
        return out["PER"], out["ORG"]

    def get_person_name(self, text: str) -> "str | None":
        return self.first_spans(text)[0]

    def get_organization_name(self, text: str) -> "str | None":
        return self.first_spans(text)[1]

    def weight_digest(self) -> str:
        """Stable hash of all weights — the determinism contract."""
        import hashlib

        h = hashlib.sha256()
        for f in sorted(self.w):
            h.update(f.encode())
            h.update(self.w[f].tobytes())
        h.update(self.trans.tobytes())
        return h.hexdigest()[:16]


def span_f1(model: "PerceptronNER", corpus) -> float:
    """Entity-span micro-F1 over a [(tokens, tags)] corpus."""

    def spans(tags: list[str]):
        out, i = set(), 0
        while i < len(tags):
            if tags[i].startswith("B-"):
                kind, j = tags[i][2:], i
                while j + 1 < len(tags) and tags[j + 1] == "I-" + kind:
                    j += 1
                out.add((kind, i, j))
                i = j + 1
            else:
                i += 1
        return out

    tp = fp = fn = 0
    for toks, gold in corpus:
        g, p = spans(gold), spans(model.tag(toks))
        tp += len(g & p)
        fp += len(p - g)
        fn += len(g - p)
    denom = 2 * tp + fp + fn
    return (2 * tp / denom) if denom else 1.0


# --------------------------------------------------------------------------
# Ray stage: model built once per actor (D4 — EntityRecognizer.cs loaded in
# Worker.cs:61-95 once per worker process)
# --------------------------------------------------------------------------


class PerceptronNerTagger:
    """Actor-pool batch stage: (doc_id, text) -> (doc_id, person, org).

    Emits a pinned pyarrow schema: pandas object columns that happen to be
    all-None in a batch infer as null-type blocks, which defeats Ray's
    schema dedup (per-batch "Failed to hash the schemas" warnings) and can
    poison downstream unions; a fixed pa.schema keeps every block
    bit-identical in type regardless of batch content."""

    OUT_SCHEMA = None  # built lazily so module import stays pyarrow-free

    def __init__(self) -> None:
        import pyarrow as pa

        self.model = PerceptronNER()
        if PerceptronNerTagger.OUT_SCHEMA is None:
            PerceptronNerTagger.OUT_SCHEMA = pa.schema(
                [("doc_id", pa.int64()), ("person", pa.string()),
                 ("org", pa.string())]
            )

    def __call__(self, df: pd.DataFrame):
        import pyarrow as pa

        # null/NaN text guard (matches the MinHasher path): str.upper() on a
        # null yields NaN and _TOKEN.finditer(NaN) raises TypeError.
        texts = df["text"].fillna("").astype(str).str.upper()
        spans = [self.model.first_spans(t) for t in texts]
        return pa.table(
            {
                "doc_id": pa.array(
                    df["doc_id"].to_numpy(dtype="int64"), type=pa.int64()
                ),
                "person": pa.array([s[0] for s in spans], type=pa.string()),
                "org": pa.array([s[1] for s in spans], type=pa.string()),
            },
            schema=self.OUT_SCHEMA,
        )
