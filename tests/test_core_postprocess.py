"""Golden + differential tests for span post-processing
(parity target: reference postprocess.postprocess_all)."""

from __future__ import annotations

import itertools

import pytest

from x5_ner_spark.core.postprocess import (
    merge_model_and_numeric,
    postprocess,
    stitch_consecutive_b_to_i,
    zero_after_prepositions,
    zeroize_percent_after_size,
)
from tests.conftest import has_reference, load_reference_module

CASES = [
    ("сок ананасовый без сахара", [(0, 3, "B-TYPE"), (4, 14, "B-TYPE")]),
    ("молоко 3,2", [(0, 6, "B-TYPE"), (7, 10, "B-TYPE")]),
    ("для мытья посуды гель", [(0, 3, "O"), (4, 9, "B-TYPE"), (10, 16, "B-TYPE")]),
    (" молоко простоквашино 1 л", [(1, 7, "B-TYPE"), (8, 21, "B-BRAND"), (22, 23, "B-VOLUME")]),
    ("размер 5 колготки", [(0, 6, "O"), (7, 8, "B-PERCENT"), (9, 17, "B-TYPE")]),
    ("все для дома", [(0, 3, "O"), (4, 7, "O"), (8, 12, "B-TYPE")]),
    ("кефир 1% бутылка", [(0, 5, "B-TYPE"), (6, 8, "B-PERCENT"), (9, 16, "B-TYPE")]),
    ("вода santa 6x1л", [(0, 4, "B-TYPE"), (5, 10, "B-BRAND"), (11, 15, "B-VOLUME")]),
    ("сыр хохланд 45%", [(0, 3, "B-TYPE"), (4, 11, "B-BRAND"), (12, 15, "B-PERCENT")]),
    ("молоко 2 л простоквашино",
     [(0, 6, "B-TYPE"), (7, 8, "B-VOLUME"), (9, 10, "I-VOLUME"), (11, 24, "B-BRAND")]),
]


def test_stitch_b_to_i():
    text = "сок ананасовый без сахара"
    out = stitch_consecutive_b_to_i(text, [(0, 3, "B-TYPE"), (4, 14, "B-TYPE")])
    assert out == [(0, 3, "B-TYPE"), (4, 14, "I-TYPE")]


def test_preposition_zeroing_is_sequential():
    text = "для для молока"
    spans = [(0, 3, "O"), (4, 7, "B-TYPE"), (8, 14, "B-TYPE")]
    out = zero_after_prepositions(text, spans)
    # first 'для' zeroes the second; the zeroed second (itself 'для') zeroes the third
    assert out == [(0, 3, "O"), (4, 7, "O"), (8, 14, "O")]


def test_size_guard_zeroizes_only_unpercent():
    text = "размер 5 и сыр 5%"
    spans = [(7, 8, "B-PERCENT"), (15, 17, "B-PERCENT")]
    out = zeroize_percent_after_size(text, spans)
    assert out == [(7, 8, "O"), (15, 17, "B-PERCENT")]


def test_merge_policy_numeric_beats_numeric_and_type_digits():
    # trailing space: span_is_numeric's ±1 window must stay inside the text
    # (ref postprocess.py:111-116 returns False when e+1 > len)
    text = "молоко 3,2 "
    base = [(0, 6, "B-TYPE"), (7, 10, "B-TYPE")]  # model mislabeled the number
    add = [(7, 10, "B-PERCENT")]
    out = merge_model_and_numeric(text, base, add)
    assert out == [(0, 6, "B-TYPE"), (7, 10, "B-PERCENT")]
    # at the text edge the window is out of bounds → TYPE survives
    out2 = merge_model_and_numeric(text.rstrip(), base, add)
    assert out2 == [(0, 6, "B-TYPE"), (7, 10, "B-TYPE")]


def test_postprocess_full_pipeline_golden():
    text = "молоко 3,2 "
    out = postprocess(text, [(0, 6, "B-TYPE"), (7, 10, "B-TYPE")])
    assert out == [(0, 6, "B-TYPE"), (7, 10, "B-PERCENT")]
    # without the trailing space: TYPE kept, then stitched B→I
    out2 = postprocess(text.rstrip(), [(0, 6, "B-TYPE"), (7, 10, "B-TYPE")])
    assert out2 == [(0, 6, "B-TYPE"), (7, 10, "I-TYPE")]


@pytest.mark.skipif(not has_reference(), reason="reference repo not present")
def test_postprocess_differential_vs_reference():
    ref = load_reference_module("ner.postprocess")
    for (text, spans), (split, boost, prep) in itertools.product(
        CASES, itertools.product((True, False), repeat=3)
    ):
        expected = [
            tuple(x)
            for x in ref.postprocess_all(
                text, list(spans),
                do_split_type=split, do_boost_numeric=boost,
                do_replace_after_prepositions=prep,
            )
        ]
        got = postprocess(
            text, list(spans),
            do_split_type=split, do_boost_numeric=boost,
            do_replace_after_prepositions=prep,
        )
        assert got == expected, (text, split, boost, prep)
