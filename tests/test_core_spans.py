"""BIO algebra: chain merge, typed sets, serialization, tolerant parsing
(parity: ner/utils.py:31-89, scripts/eval_submission_on_train.py:9-76)."""

from __future__ import annotations

import pytest

from x5_ner_spark.core.spans import (
    bio_to_entities,
    merge_bio_typed,
    parse_annotation,
    serialize_spans,
)
from tests.conftest import has_reference, load_reference_module

SPAN_SETS = [
    [],
    [(0, 5, "B-TYPE")],
    [(0, 5, "B-TYPE"), (6, 10, "I-TYPE")],
    [(0, 5, "B-TYPE"), (6, 10, "I-TYPE"), (11, 15, "I-BRAND")],  # type switch
    [(0, 5, "B-TYPE"), (7, 10, "I-TYPE")],  # gap: 7 > 5 → I still extends (s<=cur_e fails) → new
    [(0, 5, "B-TYPE"), (5, 10, "I-TYPE")],  # touching
    [(0, 5, "I-TYPE")],  # orphan I
    [(0, 5, "B-TYPE"), (2, 4, "O"), (6, 9, "B-BRAND")],  # O flushes
    [(0, 3, "TYPE")],  # bare tag treated as B-
    [(0, 3, "B-FOO"), (4, 6, "B-TYPE")],  # unknown type (typed merge drops it)
    [(3, 8, "B-PERCENT"), (0, 2, "B-TYPE")],  # unsorted input
]


def test_bio_merge_basic():
    # touching span (s == cur_e) extends; a 1-char gap does NOT (s <= cur_e)
    assert bio_to_entities([(0, 5, "B-TYPE"), (5, 10, "I-TYPE")]) == [(0, 10, "B-TYPE")]
    assert bio_to_entities([(0, 5, "B-TYPE"), (6, 10, "I-TYPE")]) == [
        (0, 5, "B-TYPE"), (6, 10, "B-TYPE"),
    ]
    assert bio_to_entities([(0, 5, "I-TYPE")]) == [(0, 5, "B-TYPE")]
    assert bio_to_entities([]) == []


def test_typed_merge_drops_unknown():
    assert merge_bio_typed([(0, 3, "B-FOO"), (4, 6, "B-TYPE")]) == {("TYPE", 4, 6)}


def test_serialize_format():
    assert serialize_spans([(7, 10, "B-PERCENT"), (0, 6, "B-TYPE")]) == \
        "[(0, 6, 'B-TYPE'), (7, 10, 'B-PERCENT')]"
    assert serialize_spans([]) == "[]"


def test_parse_annotation_roundtrip_and_fallbacks():
    s = "[(0, 6, 'B-TYPE'), (7, 10, 'B-PERCENT')]"
    assert parse_annotation(s) == [(0, 6, "B-TYPE"), (7, 10, "B-PERCENT")]
    assert parse_annotation("garbage ( 1, 2, 'B-TYPE' ) trailing") == [(1, 2, "B-TYPE")]
    assert parse_annotation("not a list at all") == []
    assert parse_annotation(None) == []
    assert parse_annotation("[]") == []


@pytest.mark.skipif(not has_reference(), reason="reference repo not present")
def test_bio_merge_differential():
    ref_utils = load_reference_module("ner.utils")
    ref_eval = load_reference_module("scripts.eval_submission_on_train")
    for spans in SPAN_SETS:
        dicts = [{"start_index": s, "end_index": e, "entity": t} for s, e, t in spans]
        assert bio_to_entities(spans) == ref_utils.bio_to_entities(dicts), spans
        assert merge_bio_typed(spans) == ref_eval.merge_bio_spans(list(spans)), spans
        assert serialize_spans(bio_to_entities(spans)) == ref_utils.serialize_entities(
            ref_utils.bio_to_entities(dicts)
        )
