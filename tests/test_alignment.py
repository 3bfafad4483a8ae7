"""N2 alignment tests: golden + differential vs reference spans_to_bio_labels
(ref tests/test_alignment.py is the model; we use the engine's word
tokenizer offsets instead of HF subwords — offsets are an input, the
alignment rule is what's under test)."""

from __future__ import annotations

import pytest

from x5_ner_spark.core.alignment import align_text, spans_to_bio, word_offsets
from tests.conftest import has_reference, load_reference_module, stub_transformers

CASES = [
    ("молоко 1 %", [(0, 6, "B-TYPE"), (7, 8, "B-PERCENT"), (9, 10, "I-PERCENT")]),
    ("вода 2 л", [(0, 4, "B-TYPE"), (5, 8, "B-VOLUME")]),  # span across 2 tokens
    ("сок добрый", [(0, 3, "TYPE"), (4, 10, "B-BRAND")]),  # bare tag → B-
    ("чай", []),
    ("каша овсяная", [(0, 12, "B-TYPE")]),  # one span, 2 tokens → B,I
    ("x y", [(0, 1, "O"), (2, 3, "B-BRAND")]),  # O span ignored
]


@pytest.mark.parametrize("text,spans", CASES)
def test_alignment_golden_shapes(text, spans):
    offs = word_offsets(text)
    labels = spans_to_bio(spans, offs)
    assert len(labels) == len(offs)
    out = align_text(text, spans)
    # B- starts each covered entity, I- continues it
    for (s, e, lab), (ts, te) in zip(out, offs):
        assert (s, e) == (ts, te)


def test_alignment_multi_token_entity():
    text = "каша овсяная"
    assert [lab for _, _, lab in align_text(text, [(0, 12, "B-TYPE")])] == ["B-TYPE", "I-TYPE"]


def test_special_offsets_stay_o():
    assert spans_to_bio([(0, 5, "B-TYPE")], [(0, 0), (0, 5), (0, 0)]) == ["O", "B-TYPE", "O"]


@pytest.mark.skipif(not has_reference(), reason="reference repo not present")
def test_alignment_differential():
    stub_transformers()
    ref = load_reference_module("ner.dataset")
    for text, spans in CASES:
        offs = word_offsets(text)
        assert spans_to_bio(spans, offs) == ref.spans_to_bio_labels(text, list(spans), offs), text
