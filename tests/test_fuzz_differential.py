"""Randomized differential sweep vs the reference modules: 600 synthetic
product-query-like texts through numeric extraction and postprocess.
Deterministic seed; skips without /root/reference."""

from __future__ import annotations

import random

import pytest

from x5_ner_spark.core.numeric import numeric_spans
from x5_ner_spark.core.postprocess import postprocess
from tests.conftest import has_reference, load_reference_module

WORDS = [
    "молоко", "кефир", "сливки", "сметана", "творог", "сыр", "вода", "сок",
    "бумага", "пакеты", "размер", "для", "все", "без", "большой", "объем",
    "малако", "сметна", "обьем", "двадцать", "пять", "пол", "полтора",
    "литра", "литров", "процентов", "процента", "проц", "упаковки", "шт",
    "greenfield", "santa", "x5", "№1", "и", "на",
]
NUMS = ["0", "1", "2", "3,2", "10", "25", "33", "72", "99", "100", "200",
        "0.5", "1.5", "6x1л", "2*0.5", "5%", "10 %", "3×200"]
UNITS = ["л", "мл", "г", "кг", "шт", "%", "проц", "литров", "уп"]


def gen_texts(n: int, seed: int = 20260816) -> list[str]:
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        k = rng.randint(1, 7)
        parts = []
        for _ in range(k):
            r = rng.random()
            if r < 0.5:
                parts.append(rng.choice(WORDS))
            elif r < 0.8:
                parts.append(rng.choice(NUMS))
            else:
                parts.append(rng.choice(NUMS) + rng.choice(["", " "]) + rng.choice(UNITS))
        sep = rng.choice(["  ", " ", " ", " "])
        text = sep.join(parts)
        if rng.random() < 0.15:
            text = " " + text
        out.append(text)
    return out


@pytest.mark.skipif(not has_reference(), reason="reference repo not present")
def test_fuzz_numeric_differential():
    ref = load_reference_module("ner.improved_preprocessing")
    for t in gen_texts(600):
        assert numeric_spans(t) == [tuple(x) for x in ref.preprocess_query(t)], repr(t)


@pytest.mark.skipif(not has_reference(), reason="reference repo not present")
def test_fuzz_postprocess_differential():
    ref = load_reference_module("ner.postprocess")
    rng = random.Random(7)
    tags = ["O", "B-TYPE", "I-TYPE", "B-BRAND", "B-VOLUME", "B-PERCENT"]
    for t in gen_texts(300, seed=99):
        # random plausible span sets over the text
        spans = []
        pos = 0
        while pos < len(t) and len(spans) < 5:
            ln = rng.randint(1, 6)
            if rng.random() < 0.6:
                spans.append((pos, min(pos + ln, len(t)), rng.choice(tags)))
            pos += ln + rng.randint(0, 2)
        got = postprocess(t, list(spans))
        want = [tuple(x) for x in ref.postprocess_all(t, list(spans))]
        assert got == want, (repr(t), spans)


@pytest.mark.skipif(not has_reference(), reason="reference repo not present")
def test_fuzz_w5_w8_differential():
    """Flag-gated W5 (merge_across_joiners) / W8 (expand_phrases_right) vs
    the reference functions, forced on, over random span sets."""
    from x5_ner_spark.core.postprocess import expand_phrases_right, merge_across_joiners

    ref = load_reference_module("ner.postprocess")
    rng = random.Random(424242)
    tags = ["O", "B-TYPE", "I-TYPE", "B-BRAND", "B-VOLUME", "B-PERCENT"]
    for t in gen_texts(300, seed=55):
        spans = []
        pos = 0
        while pos < len(t) and len(spans) < 5:
            ln = rng.randint(1, 6)
            if rng.random() < 0.6:
                spans.append((pos, min(pos + ln, len(t)), rng.choice(tags)))
            pos += ln + rng.randint(0, 2)
        got8 = expand_phrases_right(t, list(spans))
        want8 = sorted(set(tuple(x) for x in ref.expand_phrases_right(t, list(spans))),
                       key=lambda x: (x[0], x[1], x[2]))
        assert got8 == want8, (repr(t), spans)
        got5 = merge_across_joiners(t, list(spans))
        want5 = [tuple(x) for x in ref.merge_across_joiners(t, list(spans))]
        assert got5 == want5, (repr(t), spans)
