"""E5: regex-boost of a baseline submission (percent spans with overlap
guard, dairy bare-number rule, 'балтика 0' rule).

Parity target: scripts/make_baseline_with_percent.py:3-60 (fresh
implementation). Sequential: each accepted span extends the taken set, so
later candidates are guarded against spans added earlier in the SAME pass.
"""

from __future__ import annotations

import regex as _rx

from .spans import Span

RE_PERCENT = _rx.compile(r"(?<!\d)\d{1,2}(?:[.,]\d)?\s*%")
RE_PERCENT_WORD = _rx.compile(
    r"\b\d{1,2}(?:[.,]\d)?\s*(?:проц|процент(?:а|ов)?)\b", _rx.IGNORECASE
)
RE_BARE = _rx.compile(r"\b(\d{1,2})(?:[.,]\d)?\b")
DAIRY = frozenset(
    "молоко кефир сливки сметана творог сыр йогурт ряженка простокваша масло".split()
)


def boost_percent(text: str, spans: list[Span]) -> list[Span]:
    ents = [(int(s), int(e), str(t)) for s, e, t in spans]
    taken = [(s, e) for s, e, _ in ents]

    def overlaps(s: int, e: int) -> bool:
        return any(ss < e and ee > s for ss, ee in taken)

    def add(s: int, e: int) -> None:
        ents.append((s, e, "B-PERCENT"))
        taken.append((s, e))

    for rx in (RE_PERCENT, RE_PERCENT_WORD):
        for m in rx.finditer(text):
            s, e = m.span()
            if not overlaps(s, e):
                add(s, e)

    low = text.lower()
    for m in RE_BARE.finditer(text):
        s, e = m.span()
        if overlaps(s, e):
            continue
        num = int(m.group(1))
        if num == 0 and ("балтик" in low or "ноль" in low):
            add(s, e)
        elif 1 <= num <= 40 and any(w in low for w in DAIRY):
            add(s, e)

    return sorted(set(ents), key=lambda x: (x[0], x[1], x[2]))
