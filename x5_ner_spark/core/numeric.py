"""Numeric mention extraction: explicit regex + implicit context inference.

Behavioral parity target (fresh implementation, semantics only):
/root/reference/ner/improved_preprocessing.py:75-418 — the ``preprocess_query``
composition: explicit percent/volume/multipack/word-number regexes, implicit
bare-number classification with fuzzy fatty/pack context, overlap collapse,
and B/I splitting of spaced or multiplied spans.

All span tuples are ``(start, end, tag)`` with char offsets into the raw text.
Uses the ``regex`` package (same engine family as the reference) for the
Unicode-category word pattern; everything else is plain ``re``-compatible.
"""

from __future__ import annotations

from bisect import bisect_left, bisect_right

import regex as _rx

from .textnorm import normalize_token, token_close_to_lexicon

Span = tuple[int, int, str]

WORD_RE = _rx.compile(r"\p{L}[\p{L}\p{N}-]*", _rx.UNICODE)

# --- explicit numeric patterns (ref: improved_preprocessing.py:78-126) ---
RE_PERCENT_SIGN = _rx.compile(r"(?<!\d)\d{1,2}(?:\s*[.,]\s*\d{1,2})?\s*%")
RE_PERCENT_WORD = _rx.compile(
    r"\b\d{1,2}(?:[.,]\d)?\s*(?:проц|процент(?:а|ов)?)\b", _rx.IGNORECASE
)
UNITS = [
    "мл", "ml", "l", "л", "г", "гр", "kg", "кг", "шт", "уп", "пак",
    "ш", "к", "литров", "литровый", "литра",
]
_UNIT_ALT = "|".join(UNITS)
RE_VOLUME = _rx.compile(rf"\b\d+(?:[.,]\d+)?\s*(?:{_UNIT_ALT})\b", _rx.IGNORECASE)
RE_NUMBER = _rx.compile(r"\b\d+(?:[.,]\d+)?\b")
RE_MULTIPACK = _rx.compile(
    rf"\b\d+\s*[x×*]\s*\d+(?:[.,]\d+)?\s*(?:{_UNIT_ALT})\b", _rx.IGNORECASE
)

# word-number grammar: "пять литров", "двадцать пять процентов", "пол-литра"...
UNIT_WORDS = [
    r"литр(?:а|ов)?", r"миллилитр(?:а|ов)?", r"килограмм(?:а|ов)?",
    r"грамм(?:а|ов)?", r"бутылк(?:а|и|ок)", r"банк(?:а|и|ок)",
    r"пакет(?:а|ов)?", r"упаковк(?:а|и|ок)", r"рулон(?:а|ов)?",
    r"лист(?:а|ов)?", r"флакон(?:а|ов)?", r"штук(?:а|и|)?", r"шт",
]
_UNIT_WORD_ALT = "|".join(UNIT_WORDS)
_ONE = r"(?:один|одна|одно)"
_TWO = r"(?:два|две)"
_3_9 = r"(?:три|четыре|пять|шесть|семь|восемь|девять)"
_10_19 = (
    r"(?:десять|одиннадцать|двенадцать|тринадцать|четырнадцать|пятнадцать"
    r"|шестнадцать|семнадцать|восемнадцать|девятнадцать)"
)
_TENS = r"(?:двадцать|тридцать|сорок|пятьдесят|шестьдесят|семьдесят|восемьдесят|девяносто)"
_UNIT_1_19 = rf"(?:{_ONE}|{_TWO}|{_3_9}|{_10_19})"
NUM_WORD = rf"(?:{_TENS}(?:\s+{_3_9})?|{_UNIT_1_19})"
_HALF = r"(?:пол)(?:\s*|-)?"
_POLTORA = r"(?:полтор(?:а|ы))"
_ZERO = r"(?:ноль)"
_PERC_FORMS = r"(?:процент(?:а|ов)?|проц\.?|проц)"

RE_WORD_PERCENT = _rx.compile(rf"\b(?:{_ZERO}|{NUM_WORD})\s+{_PERC_FORMS}\b", _rx.IGNORECASE)
RE_HALF_PERCENT = _rx.compile(rf"\b{_HALF}?{_PERC_FORMS}\b", _rx.IGNORECASE)
RE_WORD_VOLUME = _rx.compile(rf"\b({NUM_WORD})\s+({_UNIT_WORD_ALT})\b", _rx.IGNORECASE)
RE_HALF_VOLUME = _rx.compile(
    rf"\b(?:{_HALF}({_UNIT_WORD_ALT})|{_POLTORA}\s+({_UNIT_WORD_ALT}))\b", _rx.IGNORECASE
)

# lexicons (ref: improved_preprocessing.py:160, 221-222). The reference builds
# FATTY_WORDS from its private train.csv when present and falls back to this
# pinned set otherwise; we pin the fallback as the spec.
FATTY_WORDS = frozenset(
    normalize_token(w) for w in ["молоко", "кефир", "сливки", "сметана", "творог", "сыр"]
)
PACK_WORDS = frozenset(
    normalize_token(w)
    for w in ["бутыл", "банка", "пакет", "упаков", "рулон", "лист", "пачк", "флакон"]
)
SIZE_WORDS = frozenset({normalize_token("размер")})


from functools import lru_cache


@lru_cache(maxsize=256)
def _tokenize_cached(text: str) -> tuple[tuple[str, int, int], ...]:
    # one m.span() call + a slice instead of three Match-method calls per
    # token: ~18%/core off tokenization (interleaved A/B, round 5); the
    # slice equals m.group(0) by definition of a match span
    out = []
    for m in WORD_RE.finditer(text):
        s, e = m.span()
        out.append((text[s:e], s, e))
    return tuple(out)


def tokenize_with_offsets(text: str) -> tuple[tuple[str, int, int], ...]:
    """Word tokens with char offsets (ref word pattern improved_preprocessing.py:12).
    Small LRU so the detect pass and the numeric pass of the SAME document
    tokenize once (cache is per Python worker, bounded). Returns the cached
    IMMUTABLE tuple directly (round 5: every caller iterates/indexes; the
    old per-call list() copy was pure overhead)."""
    return _tokenize_cached(text)


# --- cheap superset pre-checks gating the expensive regex scans -----------
# Every branch of the word-number grammar REQUIRES one of these substrings
# (numeral stems chosen so every 11-19/tens composite contains its stem,
# e.g. "четырнадцать" ⊃ "четыр"); RE_HALF_* require "пол"/"проц". The digit
# regexes all require a \p{Nd} char, and str.isdigit() is a superset of
# \p{Nd}. A gate firing spuriously only costs the regex scan it replaced.
_WORDNUM_TRIGGERS = (
    "ноль", "один", "одна", "одно", "два", "две", "три", "четыр", "пят",
    "шест", "сем", "восем", "девя", "деся", "сорок", "пол", "проц",
)


import re as _stdre

_DIGIT_RE = _stdre.compile(r"\d")  # unicode \d == \p{Nd} exactly


def _has_digit(text: str) -> bool:
    # C-level scan; \p{Nd} is precisely what the gated digit regexes
    # require, so this stays a valid (exact) superset gate. (The previous
    # per-char isdigit() genexpr was ~500k next() calls per 4k-doc batch.)
    return _DIGIT_RE.search(text) is not None


_WORDNUM_TRIGGER_RE = _stdre.compile("|".join(_WORDNUM_TRIGGERS))

# first raw chars that can open a "больш*/огромн*" adjective after
# normalization (lower + ё→е keep б/о; WORD_RE tokens start with a letter)
_ADJ_FIRST_CHARS = frozenset("БбОо")


def _has_wordnum_trigger(low: str) -> bool:
    # one compiled-alternation scan instead of 17 substring scans per doc
    return _WORDNUM_TRIGGER_RE.search(low) is not None


_SHARED_KEYS = ("pct_sign", "pct_word", "multipack", "volume")


def _shared_regex_spans(
    text: str, low: str | None = None
) -> dict[str, list[tuple[int, int]]]:
    """The four regexes used by BOTH the explicit extractor and the implicit
    pass's explicit-guard (ref recomputes them; we scan once per text).
    All four require a digit; three have an additional REQUIRED literal that
    a C-level substring check screens for exactly (round-5 per-pattern
    gates): '%' for pct_sign, 'проц' (casefolded) for pct_word, one of
    x/X/×/* for multipack. A gate firing spuriously only costs the regex
    scan it replaced; a gate can never suppress a real match."""
    if not _has_digit(text):
        # fresh lists per call — a shared-sentinel shallow copy would let
        # any caller mutation corrupt every later no-digit result
        return {k: [] for k in _SHARED_KEYS}
    if low is None:
        low = text.lower()
    return {
        "pct_sign": (
            [m.span() for m in RE_PERCENT_SIGN.finditer(text)]
            if "%" in text else []
        ),
        "pct_word": (
            [m.span() for m in RE_PERCENT_WORD.finditer(text)]
            if "проц" in low else []
        ),
        "multipack": (
            [m.span() for m in RE_MULTIPACK.finditer(text)]
            if ("x" in low or "×" in text or "*" in text) else []
        ),
        "volume": [m.span() for m in RE_VOLUME.finditer(text)],
    }


def explicit_numeric_spans(
    text: str,
    tokens: list[tuple[str, int, int]] | None = None,
    shared: dict[str, list[tuple[int, int]]] | None = None,
    low: str | None = None,
) -> list[Span]:
    """Explicit percent/volume/multipack/word-number mentions
    (ref: improved_preprocessing.py:163-207). ``low`` lets the caller share
    one text.lower() across the gates (numeric_spans computes it once)."""
    if low is None:
        low = text.lower()
    shared = shared if shared is not None else _shared_regex_spans(text, low)
    out: list[Span] = []
    for key in ("pct_sign", "pct_word"):
        if shared[key]:  # skip genexpr construction for the common empty case
            out.extend((s, e, "B-PERCENT") for s, e in shared[key])
    if _has_wordnum_trigger(low):
        for rx in (RE_WORD_PERCENT, RE_HALF_PERCENT):
            for m in rx.finditer(text):
                out.append((m.start(), m.end(), "B-PERCENT"))
        out_wordnum = word_number_volume_spans(text)
    else:
        out_wordnum = []
    for key in ("multipack", "volume"):
        if shared[key]:
            out.extend((s, e, "B-VOLUME") for s, e in shared[key])
    if out_wordnum:
        out.extend(out_wordnum)

    # adjective + volume-noun phrases: "больш*/огромн*" + "объем*/обьем*".
    # normalize_token preserves the first letter (lower + ё→е only — WORD_RE
    # tokens start with a letter, and the 3+-run collapse keeps char 0), so
    # a cheap first-char gate skips normalization for the ~96% of tokens
    # that can't start the pair (round-5 kernel pass; exactness pinned by
    # the byte-exact differentials + pair fuzz in test_core_numeric)
    toks = tokens if tokens is not None else tokenize_with_offsets(text)
    for i in range(len(toks) - 1):
        if toks[i][0][0] not in _ADJ_FIRST_CHARS:
            continue
        a = normalize_token(toks[i][0])
        if not (a.startswith("больш") or a.startswith("огромн")):
            continue
        b = normalize_token(toks[i + 1][0])
        if b.startswith("объем") or b.startswith("обьем"):
            out.append((toks[i][1], toks[i][2], "B-VOLUME"))
            out.append((toks[i + 1][1], toks[i + 1][2], "I-VOLUME"))
    return sorted(out)


def word_number_volume_spans(text: str) -> list[Span]:
    """ref: improved_preprocessing.py:210-218."""
    out: list[Span] = []
    for rx in (RE_WORD_VOLUME, RE_HALF_VOLUME):
        for m in rx.finditer(text):
            out.append((m.start(), m.end(), "B-VOLUME"))
    return out


def implicit_numeric_spans(
    text: str,
    fatty_words: frozenset[str] = FATTY_WORDS,
    tokens: list[tuple[str, int, int]] | None = None,
    shared: dict[str, list[tuple[int, int]]] | None = None,
) -> list[Span]:
    """Classify bare numbers by context (ref: improved_preprocessing.py:225-274):
    0 → PERCENT; 1..99 near a fatty-product word → PERCENT; ≥100 or (pack word
    nearby and ≥2) → VOLUME; 'размер N' → skipped."""
    if not _has_digit(text):
        return []  # RE_NUMBER requires a digit; nothing to classify
    matches = [m.span() for m in RE_NUMBER.finditer(text)]
    if not matches:
        return []

    shared = shared if shared is not None else _shared_regex_spans(text)
    explicit: list[tuple[int, int]] = [
        sp for key in ("pct_sign", "pct_word", "multipack", "volume") for sp in shared[key]
    ]
    # a number-dense document (price list) has O(n) matches against O(n)
    # explicit spans / tokens — the naive any()/scan per match is quadratic
    # at web scale. Explicit spans sorted by start + the longest-span bound
    # turn the overlap test into a bisect-bounded scan (same trick as
    # merge_model_and_numeric); the candidate set and verdicts are
    # identical, order of inspection is irrelevant to any().
    explicit.sort()
    _ex_starts = [es for es, _ in explicit]
    _ex_maxlen = max((ee - es for es, ee in explicit), default=0)

    def overlaps_explicit(s: int, e: int) -> bool:
        lo = bisect_right(_ex_starts, s - _ex_maxlen)
        hi = bisect_left(_ex_starts, e, lo)
        return any(es < e and ee > s for es, ee in explicit[lo:hi])

    # normalized tokens are only consulted by neighbors(); most matches die
    # on the explicit-overlap guard first (a number inside "50мл" IS the
    # explicit volume span), so normalize lazily on first surviving match
    # (round-5 kernel pass — skips a full normalize_token sweep per doc)
    toks: list[tuple[str, int, int]] | None = None
    tok_starts: list[int] = []
    tok_ends: list[int] = []

    def neighbors(pos: int, window: int = 20) -> list[str]:
        nonlocal toks
        if toks is None:
            raw_toks = tokens if tokens is not None else tokenize_with_offsets(text)
            toks = [(normalize_token(t), s, e) for t, s, e in raw_toks]
            tok_starts.extend(s for _, s, _ in toks)
            tok_ends.extend(e for _, _, e in toks)
        lo, hi = pos - window, pos + window
        # word tokens are non-overlapping and sorted, so "s < hi and e > lo"
        # is a contiguous index range — two bisects replace the full scan
        i0 = bisect_right(tok_ends, lo)
        i1 = bisect_left(tok_starts, hi, i0)
        return [t for t, _, _ in toks[i0:i1] if t]

    out: list[Span] = []
    for s, e in matches:
        if overlaps_explicit(s, e):
            continue
        raw = text[s:e]
        if RE_PERCENT_SIGN.search(raw):
            continue
        try:
            val = float(raw.replace(",", "."))
        except ValueError:
            continue
        neigh = neighbors((s + e) // 2)
        if any(w in SIZE_WORDS for w in neigh):
            continue
        near_fatty = any(token_close_to_lexicon(w, fatty_words) for w in neigh)
        near_pack = any(token_close_to_lexicon(w, PACK_WORDS) for w in neigh)
        tag = None
        if val == 0:
            tag = "B-PERCENT"
        elif 1 <= val <= 99 and near_fatty:
            tag = "B-PERCENT"
        elif val >= 100 or (near_pack and val >= 2):
            tag = "B-VOLUME"
        if tag:
            out.append((s, e, tag))
    return out


def collapse_overlaps(spans: list[Span]) -> list[Span]:
    """Union same-label overlapping spans, single sorted pass against the last
    accepted span (ref: improved_preprocessing.py:364-398)."""
    if not spans:
        return []
    out: list[Span] = []
    for s, e, tag in sorted(spans):
        if out:
            ls, le, lt = out[-1]
            if tag == lt and not (e <= ls or s >= le):
                if s >= ls and e <= le:  # contained → drop
                    continue
                if ls >= s and le <= e:  # contains → replace
                    out[-1] = (s, e, tag)
                    continue
                out[-1] = (min(s, ls), max(e, le), tag)  # partial → union
                continue
        out.append((s, e, tag))
    return out


def _split_spaced(text: str, spans: list[Span], base: str) -> list[Span]:
    """Split ``B-{base}`` spans containing a space at the FIRST space into a
    B- head and an I- tail, skipping the space char itself
    (ref: improved_preprocessing.py:277-333)."""
    out: list[Span] = []
    want = f"B-{base}"
    for s, e, tag in spans:
        if tag == want:
            seg = text[s:e]
            idx = seg.find(" ")
            if idx != -1:
                out.append((s, s + idx, want))
                out.append((s + idx + 1, e, f"I-{base}"))
                continue
        out.append((s, e, tag))
    return out


_RE_MULTIPLIER_CHAR = _rx.compile(r"[x×*]")


def _split_multipack(text: str, spans: list[Span]) -> list[Span]:
    """Split B-VOLUME at the first x/×/* multiplier char
    (ref: improved_preprocessing.py:336-361)."""
    out: list[Span] = []
    for s, e, tag in spans:
        if tag == "B-VOLUME":
            m = _RE_MULTIPLIER_CHAR.search(text[s:e])
            if m:
                cut = s + m.start()
                if s < cut < e:
                    out.append((s, cut, "B-VOLUME"))
                    out.append((cut, e, "I-VOLUME"))
                    continue
        out.append((s, e, tag))
    return out


def numeric_spans(
    text: str, fatty_words: frozenset[str] = FATTY_WORDS,
    tokens: list[tuple[str, int, int]] | None = None,
) -> list[Span]:
    """The full numeric preprocessor (ref ``preprocess_query``,
    improved_preprocessing.py:401-418). Tokenization and the shared regex
    scans run once per text and feed both passes (identical output; the
    reference recomputes them). Callers that already tokenized (the batch
    mention kernel) pass ``tokens`` to skip the re-scan — the per-worker
    LRU thrashes when an Arrow batch is larger than its capacity."""
    if tokens is None:
        tokens = tokenize_with_offsets(text)
    low = text.lower()
    shared = _shared_regex_spans(text, low)
    # collapse_overlaps sorts internally — no pre-sort of the concat needed
    merged = collapse_overlaps(
        explicit_numeric_spans(text, tokens, shared, low)
        + implicit_numeric_spans(text, fatty_words, tokens, shared)
    )
    return _split_all(text, merged)


def _split_all(text: str, spans: list[Span]) -> list[Span]:
    """One pass ≡ _split_spaced(PERCENT) ∘ _split_spaced(VOLUME) ∘
    _split_multipack: the three passes touch disjoint tags (B-PERCENT /
    B-VOLUME; multipack only ever re-splits a B-VOLUME head the space split
    produced), so their composition fuses into a single list build
    (round-5 kernel pass; equivalence pinned by the composition test in
    test_core_numeric.py and the byte-exact reference differentials)."""
    out: list[Span] = []
    for s, e, tag in spans:
        if tag == "B-PERCENT":
            idx = text.find(" ", s, e)
            if idx != -1:
                out.append((s, idx, tag))
                out.append((idx + 1, e, "I-PERCENT"))
                continue
        elif tag == "B-VOLUME":
            head_e = e
            tail = None
            idx = text.find(" ", s, e)
            if idx != -1:
                head_e = idx
                tail = (idx + 1, e, "I-VOLUME")
            m = _RE_MULTIPLIER_CHAR.search(text, s, head_e)
            if m:
                cut = m.start()
                if s < cut < head_e:
                    out.append((s, cut, tag))
                    out.append((cut, head_e, "I-VOLUME"))
                    if tail:
                        out.append(tail)
                    continue
            out.append((s, head_e, tag))
            if tail:
                out.append(tail)
            continue
        out.append((s, e, tag))
    return out
