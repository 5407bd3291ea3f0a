"""F1-F3 unit tests incl. the Unicode edge vectors pinned in SURVEY.md §7.4."""

import pyarrow as pa

from rayextract.textnorm import (
    contains_any,
    keyword_mask,
    remove_special_array,
    remove_special_characters,
    upper_invariant,
    upper_invariant_array,
)

VECTORS = [
    "hello world",
    "keep (#-@&$:/.,|) drop «»✦™",
    "trailing spaces   ",
    "tabs\tand\nnewlines \t ",
    "unicode é ı İ ß né Müller",
    "emoji 🙂 mid 🙃 text",
    "UPPER lower MiXeD",
    "",
    "digits 123.45 $9,000.00",
    "!!!***",
    "ß only ß",
    "\x1c odd control \x1c",
]


def test_remove_special_scalar_reference_semantics():
    # FilterData.cs:12-15 — class keeps word/space + (#-@&$:/.,|), TrimEnd
    assert remove_special_characters("a*b!c") == "abc"
    assert remove_special_characters("keep$ # - @ & : / . , | ( )") == "keep$ # - @ & : / . , | ( )"
    assert remove_special_characters("x   \t ") == "x"
    # .NET \w is Unicode: accented letters survive
    assert remove_special_characters("né Müller ✦") == "né Müller"


def test_upper_invariant_simple_case_mapping():
    # .NET invariant ToUpper uses simple case mapping: ß unchanged
    assert upper_invariant("straße") == "STRAßE"
    assert "straße".upper() == "STRASSE"  # Python full-case differs — that's the point
    assert upper_invariant("ınıtıal") == "INITIAL".replace("I", "I")  # ı -> I both ways


def test_array_kernels_match_scalars():
    arr = pa.array(VECTORS + [None])
    got_clean = remove_special_array(arr).to_pylist()
    got_upper = upper_invariant_array(arr).to_pylist()
    for i, s in enumerate(VECTORS):
        assert got_clean[i] == remove_special_characters(s), repr(s)
        assert got_upper[i] == upper_invariant(s), repr(s)
    assert got_clean[-1] is None and got_upper[-1] is None


def test_keyword_mask_matches_contains_any():
    keys = ("PATIENT NAME", "DOB", "TOTAL")
    ups = [upper_invariant(remove_special_characters(s)) for s in VECTORS]
    mask = keyword_mask(pa.array(ups), keys).to_pylist()
    assert mask == [contains_any(u, keys) for u in ups]
    assert keyword_mask(pa.array(ups), ()).to_pylist() == [False] * len(ups)


def test_winnow_shared_substring_shares_fingerprint():
    from rayextract.textstats import winnow_fingerprints

    k, w = 5, 4
    common = "the quick brown fox jumps over the lazy dog"
    a = winnow_fingerprints("AAA " + common + " BBB", k, w)
    b = winnow_fingerprints("XXXXX " + common + " YYYYY", k, w)
    # winnowing guarantee: any match of length >= w+k-1 shares a fingerprint
    assert set(a) & set(b)
    # determinism + short-input edge
    assert a == winnow_fingerprints("AAA " + common + " BBB", k, w)
    assert winnow_fingerprints("abc", k, w) == []


def test_winnow_disjoint_texts_rarely_collide():
    from rayextract.textstats import winnow_fingerprints

    a = set(winnow_fingerprints("completely unrelated alpha beta gamma delta"))
    b = set(winnow_fingerprints("zq wv xj kp fh unusual tokens here differ"))
    assert not (a & b)
