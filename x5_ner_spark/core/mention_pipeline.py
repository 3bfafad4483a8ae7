"""End-to-end per-document mention → triple semantics (pure functions).

This is the single source of truth for "what the reference emits": the same
functions run inside the Spark Arrow UDFs (x5_ner_spark.operators /
x5_ner_spark.pipeline) and inside the pandas oracle that generates
``triples_ref`` for the P/R ≥ 0.95 gate (FIXTURES.md §5). Composition mirrors
the reference's working batch path scripts/make_submission_from_val.py:38-48
(predict_entities → postprocess_all), with numeric boost and split enabled.
"""

from __future__ import annotations

from .cascade import decide_word_labels
from .numeric import tokenize_with_offsets
from .postprocess import postprocess
from .spans import Span, bio_to_entities, serialize_spans
from .stub_model import word_probabilities
from .textnorm import norm_basic

PRED_BY_TYPE = {
    "TYPE": "is_type",
    "BRAND": "has_brand",
    "VOLUME": "has_volume",
    "PERCENT": "has_percent",
}


def detect_mention_spans(
    text: str,
    brand_lexicon: frozenset[str] = frozenset(),
    brand_lexicon_list: list[str] | None = None,
) -> list[Span]:
    """Raw cascade spans (word-level BIO incl. 'O'), before post-processing."""
    if not text or not text.strip():
        return []
    words = [(s, e) for _, s, e in tokenize_with_offsets(text)]
    probs = [word_probabilities(text[s:e], i) for i, (s, e) in enumerate(words)]
    return decide_word_labels(text, words, probs, brand_lexicon, brand_lexicon_list)


def final_mention_spans(
    text: str,
    brand_lexicon: frozenset[str] = frozenset(),
    brand_lexicon_list: list[str] | None = None,
) -> list[Span]:
    """Cascade + full post-process — the reference's emitted span set."""
    raw = detect_mention_spans(text, brand_lexicon, brand_lexicon_list)
    if not raw:
        return []
    return postprocess(text, raw)


def annotate(text: str, brand_lexicon: frozenset[str] = frozenset()) -> str:
    """Byte-exact serialized annotation for golden tests (ner/utils.py:83-89)."""
    return serialize_spans(final_mention_spans(text, brand_lexicon))


def triples_from_spans(subj: str, text: str, spans: list[Span]) -> list[tuple[str, str, str]]:
    """Open-pattern triple emission: one (subj, pred, obj) per merged entity;
    obj is the norm_basic'd surface form. 'O' spans merge away naturally."""
    out = []
    for s, e, tag in bio_to_entities(spans):
        etype = tag.split("-", 1)[-1]
        pred = PRED_BY_TYPE.get(etype)
        if pred:
            out.append((subj, pred, norm_basic(text[s:e])))
    return out


def extract_triples(
    url: str,
    text: str,
    brand_lexicon: frozenset[str] = frozenset(),
) -> list[tuple[str, str, str]]:
    """Full per-document path: detect → postprocess → triples."""
    return triples_from_spans(url, text, final_mention_spans(text, brand_lexicon))
