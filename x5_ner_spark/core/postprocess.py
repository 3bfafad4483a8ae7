"""Span post-processing: merge policy, stitching, guards, preposition zeroing.

Parity target: /root/reference/ner/postprocess.py:111-548 (fresh
implementation of the same sequential conflict policies).
"""

from __future__ import annotations

import regex as _rx

from .numeric import numeric_spans

Span = tuple[int, int, str]

RE_NUMERIC_ONLY = _rx.compile(r"^\s*\d+(?:[.,]\d+)?\s*$")
_RE_SEPARATORS_PROBE = _rx.compile(r"[\p{L}\p{N}]")
_RE_SIZE_NUM = _rx.compile(r"\bразмер\b\s*(\d+)\b", _rx.IGNORECASE)

# ref: postprocess.py:45-108 (verbatim data set, incl. the reference's own
# typo entries like "доя"/"дл" which are load-bearing for parity)
PREPOSITIONS = frozenset(
    """в во на к ко от до из изо с со у за для по о об обо при через над под
    перед между про без около вокруг после среди вне кроме ради согласно
    насчёт насчет вместо вроде наперекор вопреки сквозь путём путем благодаря
    из-за изза из-под изпод вслед навстречу мимо вдоль поперёк поперек вглубь
    вширь вокрест попросту доя мытья дл""".split()
)
_ZERO_NEXT_WORDS = PREPOSITIONS | {"все"}

_STRIP_CHARS = " \t\r\n .,!?:;\"'«»()[]{}-—"


def span_is_numeric(text: str, s: int, e: int) -> bool:
    """±1-char-expanded window is a bare number (ref: postprocess.py:111-116)."""
    s -= 1
    e += 1
    if s < 0 or e > len(text) or s >= e:
        return False
    return bool(RE_NUMERIC_ONLY.match(text[s:e]))


def only_separators(text: str, s: int, e: int) -> bool:
    """No letter/digit between two spans → 'adjacent' (ref: postprocess.py:130-138)."""
    if s >= e:
        return True
    return _RE_SEPARATORS_PROBE.search(text[s:e]) is None


from functools import lru_cache


@lru_cache(maxsize=1 << 16)
def _prep_norm(token_text: str) -> str:
    """ref: postprocess.py:141-143."""
    return token_text.strip().strip(_STRIP_CHARS).lower()


def zero_after_prepositions(text: str, spans: list[Span]) -> list[Span]:
    """If span i is 'O' and its text is a preposition (or 'все'), relabel span
    i+1 to 'O' (ref: postprocess.py:146-175). Sequential: a zeroed span can
    itself zero its successor."""
    if not spans:
        return spans
    out = list(spans)
    for i in range(len(out) - 1):
        s, e, tag = out[i]
        if tag == "O" and _prep_norm(text[s:e]) in _ZERO_NEXT_WORDS:
            ns, ne, _ = out[i + 1]
            out[i + 1] = (ns, ne, "O")  # successor read next iteration sees 'O'
    return out


_TAG_CORE_MEMO: dict[str, str | None] = {}


def _tag_core(tag: str) -> str | None:
    """tag → its '-'-suffix core ('B-TYPE' → 'TYPE', 'O' → None); memoized
    (tiny tag vocabulary, one split per span per pass otherwise)."""
    try:
        return _TAG_CORE_MEMO[tag]
    except KeyError:
        core = tag.split("-", 1)[1] if "-" in tag else None
        _TAG_CORE_MEMO[tag] = core
        return core


def stitch_consecutive_b_to_i(text: str, spans: list[Span]) -> list[Span]:
    """Adjacent same-type B-TYPE/B-BRAND runs become B- then I-
    (ref: postprocess.py:178-207). Chain state resets on any non-TYPE/BRAND."""
    if not spans:
        return spans
    out: list[Span] = []
    prev_end: int | None = None
    prev_core: str | None = None
    for s, e, tag in sorted(spans):
        if prev_core is not None and tag.startswith("B-"):
            core = _tag_core(tag)
            if core == prev_core and only_separators(text, prev_end, s):
                tag = f"I-{core}"
        out.append((s, e, tag))
        core = _tag_core(tag)
        if core in ("TYPE", "BRAND"):
            prev_end, prev_core = e, core
        else:
            prev_end = prev_core = None
    return out


_NUMERIC_TAG_MEMO: dict[str, bool] = {}


def _is_numeric_tag(tag: str) -> bool:
    # memo: the tag vocabulary is tiny and this runs once per overlap-pair
    # in the merge fold (150k calls per 4k-doc batch)
    v = _NUMERIC_TAG_MEMO.get(tag)
    if v is None:
        v = _NUMERIC_TAG_MEMO[tag] = tag.split("-")[-1].upper() in ("VOLUME", "PERCENT")
    return v


def merge_model_and_numeric(text: str, base: list[Span], add: list[Span]) -> list[Span]:
    """Conflict policy for model spans × numeric-preproc spans
    (ref: postprocess.py:210-294):
    - numeric(base) vs numeric(add)      → prefer add, drop base
    - TYPE/BRAND(base) vs numeric(add)   → keep base, UNLESS base is TYPE and
      the overlap text is purely numeric → numeric wins
    - exact duplicate                    → keep one
    - other overlaps                     → keep base, drop add
    Order-dependent sequential fold; do not parallelize within a row."""
    if not add:
        return sorted(set(base))
    # Single in-place pass per add span (hottest loop of the postprocess,
    # profiled): the only mutations the policy ever makes are (a) DELETE a
    # base row the numeric span replaces — rare — and (b) decide whether the
    # add span survives. Per-row effects COMMUTE (keep_add is an AND of
    # row verdicts, deletions form a set), so only rows that actually
    # overlap need visiting, in any order. The base rows arrive sorted by
    # start — an overlap needs ss < e, so ``bisect`` bounds the scan of the
    # still-sorted prefix; rows appended/after deletions (the tail past
    # ``sorted_n``) are scanned unconditionally. Verified byte-exact by the
    # postprocess differential + 900-case fuzz suite.
    from bisect import bisect_left, bisect_right
    from itertools import chain

    out: list[Span] = sorted(base)
    starts = [ss for ss, _, _ in out]  # frozen snapshot of the sorted prefix
    sorted_n = len(out)
    # longest base span: a prefix row with ss <= s - maxlen has
    # ee <= ss + maxlen <= s and can never overlap — exact lower bound
    maxlen = max((ee - ss for ss, ee, _ in out), default=0)
    for s, e, t in add:
        keep_add = True
        to_delete: list[int] | None = None
        add_num = _is_numeric_tag(t)
        # prefix rows outside [s - maxlen + 1, e) on start can't overlap —
        # two bisects bound the scan; tail rows (appended add spans) are all
        # scanned
        lo = bisect_right(starts, s - maxlen, 0, sorted_n)
        hi = bisect_left(starts, e, lo, sorted_n)
        for idx in chain(range(lo, hi), range(sorted_n, len(out))):
            ss, ee, tt = out[idx]
            if ss is None or ss >= e or ee <= s:  # tombstone / no overlap
                continue
            if s == ss and e == ee and t == tt:
                keep_add = False  # exact duplicate: keep the base row only
                continue
            if add_num and _is_numeric_tag(tt):
                # drop base numeric, the add span replaces it
                (to_delete := to_delete or []).append(idx)
            elif add_num:
                if tt.startswith(("B-TYPE", "I-TYPE")) and span_is_numeric(
                    text, max(s, ss), min(e, ee)
                ):
                    # number inside TYPE → numeric wins
                    (to_delete := to_delete or []).append(idx)
                else:
                    keep_add = False
            else:
                keep_add = False
        if to_delete:
            # prefix rows become tombstones (keeps `starts` index-aligned);
            # tail rows are really deleted
            for idx in reversed(to_delete):
                if idx < sorted_n:
                    out[idx] = (None, None, None)  # type: ignore[assignment]
                else:
                    del out[idx]
        if keep_add:
            out.append((s, e, t))
    return sorted({row for row in out if row[0] is not None})


_RE_WORD = _rx.compile(r"\p{L}[\p{L}\p{N}-]*", _rx.UNICODE)
_SKIP_PUNCT = " \t.,;:!?"
_JOINERS = ("-", "–", "—", ".", "+", "/")


def expand_phrases_right(
    text: str, spans: list[Span], tag_bases: tuple[str, ...] = ("TYPE", "BRAND"),
    max_words: int = 4,
) -> list[Span]:
    """W8 (ref postprocess.py:311-355, DISABLED at its call site
    postprocess.py:520 — flag-gated default-off here for literal coverage):
    extend each B-{base} span rightward over up to ``max_words`` adjacent
    words (gap = spaces/simple punctuation only), unless the expansion would
    overlap any non-target span."""
    other = [
        (s, e) for s, e, t in spans
        if (not t.startswith("B-")) or t.split("-", 1)[-1] not in tag_bases
    ]
    out: list[Span] = []
    for s, e, tag in spans:
        if not tag.startswith("B-") or tag.split("-", 1)[-1] not in tag_bases:
            out.append((s, e, tag))
            continue
        cur_e = e
        for _ in range(max_words):
            j = cur_e
            while j < len(text) and text[j] in _SKIP_PUNCT:
                j += 1
            m = _RE_WORD.match(text, j)
            if j >= len(text) or not m:
                break
            cur_e = m.end()
        if any(ss < cur_e and ee > s for ss, ee in other):
            out.append((s, e, tag))
        else:
            out.append((s, cur_e, tag))
    return sorted(set(out))


def merge_across_joiners(
    text: str, spans: list[Span], joiners: tuple[str, ...] = _JOINERS,
    allow_spaces: bool = True,
) -> list[Span]:
    """W5 (ref postprocess.py:398-437, DISABLED at its call site
    postprocess.py:537 — flag-gated default-off here): glue adjacent
    same-base spans whose gap is only joiner characters (and optionally
    spaces); the earlier span keeps its tag, its end extends."""
    if not spans:
        return spans

    def base(tag: str) -> str:
        return tag.split("-", 1)[-1] if "-" in tag else tag

    def gap_ok(pe: int, cs: int) -> bool:
        for ch in text[pe:cs]:
            if allow_spaces and ch.isspace():
                continue
            if ch not in joiners:
                return False
        return True

    out: list[Span] = []
    for s, e, t in sorted(spans, key=lambda x: (x[0], x[1])):
        if out and base(out[-1][2]).upper() == base(t).upper() and gap_ok(out[-1][1], s):
            out[-1] = (out[-1][0], e, out[-1][2])
        else:
            out.append((s, e, t))
    return out


def fix_first_span(text: str, spans: list[Span]) -> list[Span]:
    """Re-anchor the first span to skip leading whitespace
    (ref: postprocess.py:440-457)."""
    if not spans:
        return spans
    s, e, tag = spans[0]
    lead = len(text) - len(text.lstrip())
    if s != lead:
        head = (lead, e, f"B-{tag.split('-', 1)[-1]}")
    else:
        head = (s, e, tag)
    return [head, *spans[1:]]


def zeroize_percent_after_size(text: str, spans: list[Span]) -> list[Span]:
    """PERCENT spans overlapping the digits of 'размер N' (and lacking a '%')
    → 'O' (ref: postprocess.py:467-497)."""
    if not spans:
        return spans
    size_nums = [m.span(1) for m in _RE_SIZE_NUM.finditer(text)]
    if not size_nums:
        return spans
    out: list[Span] = []
    for s, e, tag in spans:
        if tag.endswith("PERCENT") and any(ss < e and ee > s for ss, ee in size_nums):
            if "%" not in text[s:e]:
                out.append((s, e, "O"))
                continue
        out.append((s, e, tag))
    return out


def postprocess(
    text: str,
    spans: list[Span],
    *,
    do_split_type: bool = True,
    do_boost_numeric: bool = True,
    do_replace_after_prepositions: bool = True,
    do_expand_right: bool = False,
    do_merge_joiners: bool = False,
    tokens: list[tuple[str, int, int]] | None = None,
) -> list[Span]:
    """Full post-process composition (ref: postprocess.py:500-548). Note the
    reference's enabled path only runs ``fix_first_span`` under
    ``do_split_type`` (expand/split calls are commented out there);
    ``do_expand_right`` (W8) and ``do_merge_joiners`` (W5) re-enable those
    disabled stages at their reference call sites."""
    out = spans
    if do_split_type:
        if do_expand_right:  # ref call site postprocess.py:520
            out = expand_phrases_right(text, out)
        out = fix_first_span(text, out)
    if do_boost_numeric:
        out = merge_model_and_numeric(text, out, numeric_spans(text, tokens=tokens))
    out = stitch_consecutive_b_to_i(text, out)
    if do_merge_joiners:  # ref call site postprocess.py:537
        out = merge_across_joiners(text, out)
    out = zeroize_percent_after_size(text, out)
    if do_replace_after_prepositions:
        out = zero_after_prepositions(text, out)
    return sorted(set(out))
