"""Normalization / fuzzy primitives (parity: infer.py:40-137,
improved_preprocessing.py:18-72; fuzz_ratio = rapidfuzz fuzz.ratio)."""

from __future__ import annotations

import pytest

from x5_ner_spark.core.textnorm import (
    edit_distance,
    fuzz_ratio,
    indel_distance,
    lex_norm,
    norm_basic,
    norm_token_simple,
    normalize_token,
    token_close_to_lexicon,
)
from tests.conftest import has_reference, load_reference_module

TOKENS = [
    "Молоко", "ёжик", "Сметааана", "coca-cola!", "  ЧАЙ  ", "x5", "а_б",
    "сливки33", "Ёлка-ёлка", "greenfield", "", "123", "при-вет!!!",
]


def test_norms_pinned():
    assert norm_basic(" Ёлка ") == "елка"
    assert norm_token_simple("Coca-Cola!") == "cocacola"
    assert norm_token_simple("ёжик") == "ёжик"  # simple norm keeps ё
    assert lex_norm("Ёжик-2!") == "ежик2"       # lex norm maps ё→е
    assert normalize_token("Сметааана") == "сметана"
    assert normalize_token("coca-cola!") == "coca-cola"  # dash survives
    assert normalize_token("а_б") == "аб"


def test_edit_distance():
    assert edit_distance("kitten", "sitting") == 3
    assert edit_distance("малако", "молоко") == 2
    assert edit_distance("a", "a") == 0
    assert edit_distance("abc", "", cutoff=2) == 3  # la+lb short-circuit
    assert edit_distance("abcdef", "zzzzzz", cutoff=2) == 3  # cutoff+1


def test_fuzz_ratio_matches_rapidfuzz_definition():
    # indel distance → ratio; pinned values computed from the definition
    assert indel_distance("малако", "молоко") == 4
    assert fuzz_ratio("малако", "молоко") == pytest.approx(66.6666, abs=1e-3)
    assert fuzz_ratio("сметна", "сметана") == pytest.approx(
        (1 - 1 / 13) * 100, abs=1e-9
    )
    assert fuzz_ratio("", "") == 100.0


def test_token_close_to_lexicon():
    lex = {"молоко", "сметана"}
    assert token_close_to_lexicon("малоко", lex)      # ED 1
    assert token_close_to_lexicon("сметна", lex)      # ED 1 / ratio 92
    assert not token_close_to_lexicon("хлеб", lex)
    assert not token_close_to_lexicon("", lex)


@pytest.mark.skipif(not has_reference(), reason="reference repo not present")
def test_normalize_differential():
    # ner/infer.py cannot be imported without torch/transformers; its norm /
    # _normalize_token / _lex_norm are pinned in test_norms_pinned instead.
    ref_imp = load_reference_module("ner.improved_preprocessing")
    for t in TOKENS:
        assert normalize_token(t) == ref_imp.normalize_token(t), t
        assert edit_distance(t, "молоко") == ref_imp.edit_distance(t, "молоко"), t


def test_wratio_vectors_and_fastpath_equivalence():
    """Hand-computed rapidfuzz WRatio vectors + lexicon fast-path algebra
    equivalence against the plain per-entry scan (random corpus)."""
    import random

    from x5_ner_spark.core.textnorm import (
        fuzz_partial_ratio,
        fuzz_ratio,
        fuzz_wratio,
        wratio_lexicon_hit,
    )

    assert fuzz_wratio("abcd", "abcd") == 100.0
    assert abs(fuzz_ratio("abcd", "abce") - 75.0) < 1e-9
    assert abs(fuzz_wratio("молоко", "молок") - (1 - 1 / 11) * 100) < 1e-9
    # substring needle at len_ratio >= 1.5: partial=100 scaled by 0.9
    assert abs(fuzz_wratio("abc", "zzzzabczzzz") - 90.0) < 1e-9
    # rapidfuzz window-set quirk: mid-string windows SHORTER than the needle
    # are not searched - 66.67, not 80
    assert abs(fuzz_partial_ratio("abc", "xxabxx") - (1 - 2 / 6) * 100) < 1e-9
    assert wratio_lexicon_hit("santa", frozenset(["zzsantazz"]))
    assert not wratio_lexicon_hit("qqqq", frozenset(["prostokvashino", "santa"]))

    rng = random.Random(7)
    words = ["".join(rng.choice("abcdefgh") for _ in range(rng.randint(2, 12)))
             for _ in range(300)]
    lex = frozenset(words[:40])
    for w in words:
        fast = wratio_lexicon_hit(w, lex)
        slow = any(fuzz_wratio(w, c) >= 90.0 for c in lex)
        assert fast == slow, (w, fast, slow)
