"""BIO span algebra: chain-merge, typed-entity sets, (de)serialization.

Parity targets: /root/reference/ner/utils.py:6-89 (tags, bio_to_entities,
serialize_entities), scripts/eval_submission_on_train.py:9-76 (parse_ann,
merge_bio_spans).
"""

from __future__ import annotations

import ast
import re

Span = tuple[int, int, str]

BIO_TAGS = [
    "O",
    "B-TYPE", "I-TYPE",
    "B-BRAND", "I-BRAND",
    "B-VOLUME", "I-VOLUME",
    "B-PERCENT", "I-PERCENT",
]
ID2LABEL = dict(enumerate(BIO_TAGS))
LABEL2ID = {t: i for i, t in enumerate(BIO_TAGS)}
ENTITY_TYPES = ("TYPE", "BRAND", "VOLUME", "PERCENT")

_TUPLE_RE = re.compile(r"\(\s*(\d+)\s*,\s*(\d+)\s*,\s*'([^']+)'\s*\)")


_SPLIT_TAG_MEMO: dict[str, tuple[str, str]] = {}


def _split_tag(tag: str) -> tuple[str, str]:
    # memoized below (tiny tag vocabulary, one call per non-O span)
    got = _SPLIT_TAG_MEMO.get(tag)
    if got is not None:
        return got
    if "-" in tag:
        bi, etype = tag.split("-", 1)
        _SPLIT_TAG_MEMO[tag] = (bi, etype)
        return bi, etype
    _SPLIT_TAG_MEMO[tag] = ("B", tag)
    return "B", tag


def bio_to_entities(spans: list[Span]) -> list[Span]:
    """Merge a BIO-labelled span sequence into whole entities ``(s, e, 'B-X')``.
    An ``I-X`` extends the open entity iff same type and ``start <= open_end``;
    anything else flushes (ref: ner/utils.py:31-80)."""
    entities: list[Span] = []
    cur: list | None = None  # [etype, s, e]

    def flush() -> None:
        nonlocal cur
        if cur is not None:
            entities.append((cur[1], cur[2], f"B-{cur[0]}"))
        cur = None

    for s, e, tag in spans:
        label = tag if tag else "O"
        if label == "O":
            flush()
            continue
        bi, etype = _split_tag(label)
        if bi == "I" and cur is not None:
            if cur[0] == etype and s <= cur[2]:
                cur[2] = max(cur[2], e)
                continue
        flush()
        cur = [etype, s, e]
    flush()
    entities.sort()
    return entities


def merge_bio_typed(spans: list[Span]) -> set[tuple[str, int, int]]:
    """Like :func:`bio_to_entities` but input is pre-sorted by (s, e), unknown
    entity types are dropped, and the result is a ``{(etype, s, e)}`` set
    (ref: scripts/eval_submission_on_train.py:22-76)."""
    ents: set[tuple[str, int, int]] = set()
    cur: list | None = None

    def flush() -> None:
        nonlocal cur
        if cur is not None:
            ents.add((cur[0], cur[1], cur[2]))
        cur = None

    for s, e, tag in sorted(spans, key=lambda x: (x[0], x[1])):
        if not tag or tag == "O":
            flush()
            continue
        bi, etype = _split_tag(tag)
        if etype not in ENTITY_TYPES:
            flush()
            continue
        if bi == "I" and cur is not None and cur[0] == etype and s <= cur[2]:
            cur[2] = max(cur[2], e)
            continue
        flush()
        cur = [etype, s, e]
    flush()
    return ents


def serialize_spans(spans: list[Span]) -> str:
    """Stable Python-repr serialization, sorted by (s, e, tag)
    (ref: ner/utils.py:83-89). Byte-exact golden-test target."""
    ordered = sorted(spans)
    return str([(int(s), int(e), str(t)) for s, e, t in ordered])


def parse_annotation(s: str | None) -> list[Span]:
    """Tolerant stringified-list decode: ast.literal_eval, regex fallback,
    anything else → [] (ref: eval_submission_on_train.py:9-19 +
    build_brand_lexicon.py:21-37)."""
    if s is None:
        return []
    try:
        v = ast.literal_eval(s)
        out = []
        if isinstance(v, list):
            for item in v:
                if isinstance(item, (list, tuple)) and len(item) == 3:
                    out.append((int(item[0]), int(item[1]), str(item[2])))
            return out
    except Exception:
        pass
    try:
        return [(int(a), int(b), c) for a, b, c in _TUPLE_RE.findall(str(s))]
    except Exception:
        return []
