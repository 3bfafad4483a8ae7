"""Token / text normalization and fuzzy-match primitives.

Behavioral parity targets (semantics only, fresh implementation):
- /root/reference/ner/infer.py:40-59   (norm, _normalize_token, _lex_norm)
- /root/reference/ner/improved_preprocessing.py:18-72
  (normalize_token, edit_distance, token_close_to_lexicon)
- rapidfuzz ``fuzz.ratio`` (indel similarity) — reimplemented here because
  rapidfuzz is not a baked-in dependency; ``fuzz.ratio`` is defined as
  ``(1 - indel_distance/(len_a+len_b)) * 100``.
"""

from __future__ import annotations

import re
from functools import lru_cache

_YO_RE = re.compile("[ёЁ]")
# stdlib-re portable "unicode letter" class: \w minus digits minus underscore
_NOT_LETTER_DIGIT_DASH = re.compile(r"[^\w\-]+|_+", re.UNICODE)
_LETTER_RUN = re.compile(r"([^\W\d_])\1{2,}", re.UNICODE)
_NOT_ALNUM_RU_LAT = re.compile(r"[^0-9a-zA-Zа-яё]+")
_NOT_ALNUM_RU_LAT_NO_YO = re.compile(r"[^0-9a-zA-Zа-я]+")
_PURE_LATIN = re.compile(r"[A-Za-z]+")
_LATIN_VOWEL = re.compile(r"[AEIOUYaeiouy]")


@lru_cache(maxsize=1 << 16)
def norm_basic(s: str) -> str:
    """lower + strip + ё→е  (ref: ner/infer.py:40-43). Cached — runs once
    per emitted entity surface (triple objects), Zipf-distributed."""
    return _YO_RE.sub("е", s.lower().strip())


@lru_cache(maxsize=1 << 16)
def norm_token_simple(s: str) -> str:
    """lower + drop everything outside [0-9a-zа-яё]  (ref: ner/infer.py:51-53).
    Cached — called several times per word across cascade/model/batch keys."""
    return _NOT_ALNUM_RU_LAT.sub("", s.lower())


@lru_cache(maxsize=1 << 16)
def lex_norm(s: str) -> str:
    """Lexicon-key normalization: lower, ё→е, alnum-only (ref: ner/infer.py:56-59).
    Cached — runs once per word occurrence in the cascade and token
    frequency is Zipf on any corpus."""
    return _NOT_ALNUM_RU_LAT_NO_YO.sub("", norm_basic(s))


@lru_cache(maxsize=1 << 16)
def normalize_token(tok: str) -> str:
    """lower, ё→е, keep letters/digits/dash, collapse 3+ letter repeats
    (ref: ner/improved_preprocessing.py:18-24). LRU-cached: pure, and token
    frequency is Zipf on any corpus."""
    t = _YO_RE.sub("е", tok.lower())
    t = _NOT_LETTER_DIGIT_DASH.sub("", t)
    return _LETTER_RUN.sub(r"\1", t)


@lru_cache(maxsize=1 << 16)
def is_pure_latin(s: str) -> bool:
    return bool(_PURE_LATIN.fullmatch(s)) if s else False


def has_latin_vowel(s: str) -> bool:
    return bool(_LATIN_VOWEL.search(s))


def edit_distance(a: str, b: str, cutoff: int | None = None) -> int:
    """Levenshtein distance; with ``cutoff`` returns ``cutoff + 1`` as soon as
    the true distance provably exceeds it (ref: ner/infer.py:75-115)."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if cutoff is not None and abs(la - lb) > cutoff:
        return cutoff + 1
    if la == 0 or lb == 0:
        return la + lb
    if la < lb:
        a, b, la, lb = b, a, lb, la
    row = list(range(lb + 1))
    for i in range(1, la + 1):
        prev_diag = row[0]
        row[0] = i
        best = i
        ca = a[i - 1]
        for j in range(1, lb + 1):
            cur = row[j]
            cand = min(cur + 1, row[j - 1] + 1, prev_diag + (ca != b[j - 1]))
            row[j] = cand
            prev_diag = cur
            if cand < best:
                best = cand
        if cutoff is not None and best > cutoff:
            return cutoff + 1
    return row[lb]


def indel_distance(a: str, b: str) -> int:
    """Edit distance with insert/delete only (substitution forbidden) —
    the distance underlying rapidfuzz ``fuzz.ratio``.
    indel(a, b) = len(a) + len(b) - 2 * LCS(a, b).
    """
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return la + lb
    if la < lb:
        a, b, la, lb = b, a, lb, la
    prev = [0] * (lb + 1)
    for i in range(1, la + 1):
        cur = [0] * (lb + 1)
        ca = a[i - 1]
        for j in range(1, lb + 1):
            if ca == b[j - 1]:
                cur[j] = prev[j - 1] + 1
            else:
                cur[j] = cur[j - 1] if cur[j - 1] >= prev[j] else prev[j]
        prev = cur
    lcs = prev[lb]
    return la + lb - 2 * lcs


def fuzz_ratio(a: str, b: str) -> float:
    """rapidfuzz-compatible ``fuzz.ratio`` in [0, 100]."""
    total = len(a) + len(b)
    if total == 0:
        return 100.0
    return (1.0 - indel_distance(a, b) / total) * 100.0


def fuzz_partial_ratio(a: str, b: str) -> float:
    """rapidfuzz-compatible ``fuzz.partial_ratio``: best ``fuzz.ratio`` of
    the shorter string against rapidfuzz's window set over the longer —
    prefixes shorter than the needle, every needle-length window, suffixes
    shorter than the needle (rapidfuzz fuzz_py._partial_ratio_short_needle).
    Mid-string windows SHORTER than the needle are deliberately not searched
    (same as rapidfuzz): partial_ratio('abc', 'xxabxx') is 66.67, not 80.
    The char-set skip is reproduced for fidelity; it never changes the max
    (dropping a trailing char absent from the needle never lowers indel
    similarity)."""
    if not a or not b:
        return 100.0 if not a and not b else 0.0
    if len(a) > len(b):
        a, b = b, a
    la, lb = len(a), len(b)
    chars = set(a)
    best = 0.0
    for i in range(1, la):  # prefix windows shorter than the needle
        if b[i - 1] not in chars:
            continue
        best = max(best, fuzz_ratio(a, b[:i]))
    for i in range(lb - la):  # needle-length windows (last one via suffixes)
        if b[i + la - 1] not in chars:
            continue
        best = max(best, fuzz_ratio(a, b[i : i + la]))
    for i in range(lb - la, lb):  # suffix windows, longest first
        if b[i] not in chars:
            continue
        best = max(best, fuzz_ratio(a, b[i:]))
    return best


def token_sort_ratio(a: str, b: str) -> float:
    """rapidfuzz ``fuzz.token_sort_ratio``: ratio over the whitespace tokens
    of each side sorted and re-joined with single spaces."""
    return fuzz_ratio(
        " ".join(sorted(a.split())), " ".join(sorted(b.split()))
    )


def token_set_ratio(a: str, b: str) -> float:
    """rapidfuzz ``fuzz.token_set_ratio``: tokens split into intersection and
    per-side differences; best ratio among (sect+diff_ab vs sect+diff_ba),
    (sect vs sect+diff_ab), (sect vs sect+diff_ba). rapidfuzz computes the
    last two arithmetically from lengths — equivalent to the explicit string
    comparison here because the sorted intersection is a literal common
    prefix and indel distance is prefix-invariant."""
    ta, tb = set(a.split()), set(b.split())
    if not ta or not tb:
        return 0.0
    intersect = ta & tb
    diff_ab, diff_ba = ta - tb, tb - ta
    if intersect and (not diff_ab or not diff_ba):
        return 100.0
    sect = " ".join(sorted(intersect))
    s1 = (sect + " " + " ".join(sorted(diff_ab))).strip()
    s2 = (sect + " " + " ".join(sorted(diff_ba))).strip()
    return max(fuzz_ratio(s1, s2), fuzz_ratio(sect, s1), fuzz_ratio(sect, s2))


def token_ratio(a: str, b: str) -> float:
    """rapidfuzz ``fuzz.token_ratio`` = max(token_sort, token_set)."""
    return max(token_sort_ratio(a, b), token_set_ratio(a, b))


def partial_token_sort_ratio(a: str, b: str) -> float:
    return fuzz_partial_ratio(
        " ".join(sorted(a.split())), " ".join(sorted(b.split()))
    )


def partial_token_set_ratio(a: str, b: str) -> float:
    """rapidfuzz ``fuzz.partial_token_set_ratio``: any shared token → 100,
    else partial_ratio over the sorted deduped token joins."""
    ta, tb = set(a.split()), set(b.split())
    if not ta or not tb:
        return 0.0
    if ta & tb:
        return 100.0
    return fuzz_partial_ratio(" ".join(sorted(ta)), " ".join(sorted(tb)))


def partial_token_ratio(a: str, b: str) -> float:
    return max(partial_token_sort_ratio(a, b), partial_token_set_ratio(a, b))


def fuzz_wratio(a: str, b: str) -> float:
    """rapidfuzz-compatible ``fuzz.WRatio`` — now TOTAL over arbitrary
    strings (rapidfuzz fuzz.py, UNBASE_SCALE=0.95):
      len_ratio < 1.5 → max(ratio, token_ratio·0.95)
      else            → max(ratio, partial_ratio·scale,
                            partial_token_ratio·0.95·scale),
                        scale 0.9 (len_ratio<8) / 0.6.

    For WHITESPACE-FREE inputs — the only shape the cascade feeds it
    (``lex_norm`` output, ref infer.py:282-291) — the token variants reduce
    to ratio/partial_ratio and this is PROVABLY the round-2 closed form
    (property-tested in tests/test_core_textnorm.py), so cascade behavior is
    unchanged; the general form exists for free-text callers."""
    if not a or not b:
        return 0.0
    la, lb = len(a), len(b)
    len_ratio = max(la, lb) / min(la, lb)
    r = fuzz_ratio(a, b)
    if len_ratio < 1.5:
        return max(r, token_ratio(a, b) * 0.95)
    scale = 0.9 if len_ratio < 8 else 0.6
    r = max(r, fuzz_partial_ratio(a, b) * scale)
    return max(r, partial_token_ratio(a, b) * 0.95 * scale)


@lru_cache(maxsize=1 << 16)
def wratio_lexicon_hit(term: str, lexicon: frozenset[str], cutoff: float = 90.0) -> bool:
    """Any lexicon entry with WRatio(term, entry) ≥ cutoff — the reference's
    ``rf_process.extractOne(..., scorer=fuzz.WRatio, score_cutoff=90)`` test
    (infer.py:282-291). Fast paths derived from the cutoff algebra (both
    equivalence-tested against plain fuzz_wratio):
    - len_ratio < 1.5: WRatio = ratio, and ratio ≥ 90 needs indel ≤
      0.1·(la+lb), so |la-lb| beyond that bound can't hit;
    - len_ratio ≥ 1.5: ratio ≥ 90 is impossible (indel ≥ |la-lb| alone drops
      ratio below 90) and partial·0.9 ≥ 90 forces partial = 100, i.e. the
      shorter string appears verbatim inside the longer.
    The algebra is only exact for cutoff ≥ 90; lower cutoffs take the plain
    full scan."""
    lt = len(term)
    if cutoff < 90.0:
        return any(fuzz_wratio(term, cand) >= cutoff for cand in lexicon)
    for cand in lexicon:
        lc = len(cand)
        if not lc:
            continue
        if max(lt, lc) / min(lt, lc) < 1.5:
            if abs(lt - lc) <= (100.0 - cutoff) / 100.0 * (lt + lc) and \
                    fuzz_ratio(term, cand) >= cutoff:
                return True
        elif (term in cand if lt < lc else cand in term):
            if 100.0 * (0.9 if max(lt, lc) / min(lt, lc) < 8 else 0.6) >= cutoff:
                return True
    return False


def token_close_to_lexicon(tok: str, lex: frozenset[str] | set[str]) -> bool:
    """Fuzzy lexicon membership (ref: improved_preprocessing.py:48-72):
    normalize; exact hit; else among length-window (±2) candidates accept
    fuzz.ratio ≥ 80, else edit distance ≤ 1 (len ≤ 5) / ≤ 2 (longer)."""
    t = normalize_token(tok)
    if not t:
        return False
    if isinstance(lex, frozenset):
        return _close_cached(t, lex)
    return _close_uncached(t, frozenset(lex))


@lru_cache(maxsize=1 << 16)
def _close_cached(t: str, lex: frozenset[str]) -> bool:
    return _close_uncached(t, lex)


def _close_uncached(t: str, lex: frozenset[str]) -> bool:
    if t in lex:
        return True
    lt = len(t)
    candidates = [w for w in lex if abs(len(w) - lt) <= 2]
    for w in candidates:
        if fuzz_ratio(t, w) >= 80.0:
            return True
    limit = 1 if lt <= 5 else 2
    for w in candidates:
        if edit_distance(t, w, cutoff=limit) <= limit:
            return True
    return False


def lexicon_levenshtein_hit(term: str, lexicon, max_distance: int) -> bool:
    """Any lexicon item within ``max_distance`` of pre-normalized ``term``
    (ref: ner/infer.py:118-132)."""
    if not term:
        return False
    tlen = len(term)
    for cand in lexicon:
        if abs(len(cand) - tlen) > max_distance:
            continue
        if edit_distance(term, cand, cutoff=max_distance) <= max_distance:
            return True
    return False
