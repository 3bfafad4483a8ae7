"""N1/N2: char-span → token-level BIO alignment (training-data prep).

Parity target: ner/dataset.py:39-67 (``spans_to_bio_labels``): a token
overlapping a span gets ``B-<type>`` for the span's first overlapped token
and ``I-<type>`` after; later spans overwrite earlier ones token-by-token;
(0,0) offsets are special tokens and stay 'O'. Tokenizer-agnostic: offsets
come from whatever tokenizer produced them (HF offsets in production, the
engine's word tokenizer in tests/CI).
"""

from __future__ import annotations

import regex as _rx

from .spans import Span

# infer.py:6 word pattern — letters AND digits (unlike the numeric
# preprocessor's letter-first WORD_RE), so number tokens get aligned too
_ALIGN_WORD_RE = _rx.compile(r"[\p{L}\p{Nd}]+")


def spans_to_bio(
    spans: list[Span], offsets: list[tuple[int, int]]
) -> list[str]:
    labels = ["O"] * len(offsets)
    special = [(s == 0 and e == 0) for s, e in offsets]
    for s, e, tag in sorted(spans, key=lambda x: (x[0], x[1])):
        if tag == "O":
            continue
        etype = tag.split("-", 1)[1] if "-" in tag else tag
        began = False
        for i, (ts, te) in enumerate(offsets):
            if special[i]:
                continue
            if ts < e and te > s:
                labels[i] = f"{'I' if began else 'B'}-{etype}"
                began = True
    return labels


def word_offsets(text: str) -> list[tuple[int, int]]:
    """Word-level offsets from the engine's tokenizer (the model-free stand-in
    for HF subword offsets)."""
    return [m.span() for m in _ALIGN_WORD_RE.finditer(text)]


def align_text(text: str, spans: list[Span]) -> list[tuple[int, int, str]]:
    """(token_start, token_end, bio_label) triples for one text."""
    offs = word_offsets(text)
    labels = spans_to_bio(spans, offs)
    return [(s, e, lab) for (s, e), lab in zip(offs, labels)]
