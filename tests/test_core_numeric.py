"""Golden + differential tests for the numeric mention extractor
(parity target: reference improved_preprocessing.preprocess_query)."""

from __future__ import annotations

import pytest

from x5_ner_spark.core.numeric import numeric_spans
from tests.conftest import has_reference, load_reference_module

# pinned golden pairs (verified byte-identical against the reference module;
# sources: ref __main__ suites improved_preprocessing.py:421-488 and
# docs/thinks.md expected annotations)
GOLDEN = [
    ("молоко 1 %", [(7, 8, "B-PERCENT"), (9, 10, "I-PERCENT")]),
    ("кефир 1%", [(6, 8, "B-PERCENT")]),
    ("сливки 33 %", [(7, 9, "B-PERCENT"), (10, 11, "I-PERCENT")]),
    ("сметна 20", [(7, 9, "B-PERCENT")]),  # typo within ED(1) of 'сметана'
    ("малако 3,2", [(7, 10, "B-PERCENT")]),  # fuzz.ratio('малако','молоко')>=80
    ("молоко 2 л", [(7, 8, "B-VOLUME"), (9, 10, "I-VOLUME")]),
    ("вода 6x1л", [(5, 6, "B-VOLUME"), (6, 9, "I-VOLUME")]),
    ("вода 6 x 1 л", [(5, 6, "B-VOLUME"), (7, 12, "I-VOLUME")]),
    ("сок 2*0.5 л", [(4, 5, "B-VOLUME"), (5, 9, "I-VOLUME"), (10, 11, "I-VOLUME")]),
    ("напиток 3×200 мл", [(8, 9, "B-VOLUME"), (9, 13, "I-VOLUME"), (14, 16, "I-VOLUME")]),
    ("вода питьевая большой объём", [(14, 21, "B-VOLUME"), (22, 27, "I-VOLUME")]),
    ("вода пять литров", [(5, 9, "B-VOLUME"), (10, 16, "I-VOLUME")]),
    ("вода шишкин лес 5литров", [(16, 23, "B-VOLUME")]),
    ("колготки размер 5", []),  # 'размер N' guard
    ("пакеты 60 л", [(7, 9, "B-VOLUME"), (10, 11, "I-VOLUME")]),
    ("вода две упаковки", [(5, 8, "B-VOLUME"), (9, 17, "I-VOLUME")]),
    ("сахар пол килограмма", [(6, 9, "B-VOLUME"), (10, 20, "I-VOLUME")]),
    ("масло пол-литра", [(6, 15, "B-VOLUME")]),
    ("молоко полтора литра", [(7, 14, "B-VOLUME"), (15, 20, "I-VOLUME")]),
    ("кефир пять процентов", [(6, 10, "B-PERCENT"), (11, 20, "I-PERCENT")]),
    ("сыр ноль процентов", [(4, 8, "B-PERCENT"), (9, 18, "I-PERCENT")]),
    ("майонез двадцать пять процентов", [(8, 16, "B-PERCENT"), (17, 31, "I-PERCENT")]),
    ("кефир 0", [(6, 7, "B-PERCENT")]),  # bare zero → PERCENT
    ("масло сливочное 72", []),  # no fatty context within fallback lexicon
    ("", []),
]


@pytest.mark.parametrize("text,expected", GOLDEN)
def test_numeric_golden(text, expected):
    assert numeric_spans(text) == expected


@pytest.mark.skipif(not has_reference(), reason="reference repo not present")
def test_numeric_differential_vs_reference():
    ref = load_reference_module("ner.improved_preprocessing")
    extra = [
        "  молоко 3,2% 1 л  ", "сок 100% 2 шт", "творог 9 процентов 200 г",
        "размер 44 колготки 20 ден", "вода 5 литровый", "молоко 0,5",
        "гель для стирки 1,3 л", "сок 0.2", "яйцо 10 шт", "10 % сметана",
        "шоколад 70% какао 90 г", "чипсы 150г", "пиво 0", "творог 5 процентов",
    ]
    for text in [t for t, _ in GOLDEN] + extra:
        assert numeric_spans(text) == [tuple(x) for x in ref.preprocess_query(text)], text


def test_adjective_pair_first_char_gate_edge_cases():
    """The round-5 first-char gate (_ADJ_FIRST_CHARS) must be an EXACT
    superset of "normalized token starts with больш/огромн": letter-run
    collapse ("бооольшой"→"большой"), case, and ё in the NOUN must all
    still fire; lookalikes must not."""
    from x5_ner_spark.core.numeric import explicit_numeric_spans

    def pair_spans(text):
        return [sp for sp in explicit_numeric_spans(text)
                if sp[2] in ("B-VOLUME", "I-VOLUME")]

    # fires: adjective+noun adjacency through normalization
    for text in [
        "большой объем", "Большой объем", "ОГРОМНЫЙ обьем",
        "бооольшой объем",            # 3+ run collapses to "большой"
        "огромная объемная",          # startswith огромн + объем
        "большущий объём скидок",     # ё in noun normalizes to е
    ]:
        got = pair_spans(text)
        assert len(got) == 2 and got[0][2] == "B-VOLUME" and got[1][2] == "I-VOLUME", (
            text, got)

    # must NOT fire
    for text in [
        "объем большой",              # wrong order
        "небольшой объем",            # prefix doesn't start the token
        "большой пакет",              # noun mismatch
        "бол ьшой объем",             # adjacency broken by tokenization
    ]:
        assert pair_spans(text) == [], text


def test_shared_regex_gates_are_exact_supersets():
    """Round-5 per-pattern gates ('%' / 'проц' / x×* substring screens) must
    never suppress a real match: compare gated _shared_regex_spans against
    an ungated recompute over adversarial gate-heavy fuzz."""
    import random

    import x5_ner_spark.core.numeric as N

    def ungated(text):
        if not N._has_digit(text):
            return {k: [] for k in N._SHARED_KEYS}
        return {
            "pct_sign": [m.span() for m in N.RE_PERCENT_SIGN.finditer(text)],
            "pct_word": [m.span() for m in N.RE_PERCENT_WORD.finditer(text)],
            "multipack": [m.span() for m in N.RE_MULTIPACK.finditer(text)],
            "volume": [m.span() for m in N.RE_VOLUME.finditer(text)],
        }

    rng = random.Random(7)
    pieces = [
        "50%", "проц", "Процентов", "3x2", "5×2мл", "4*3 л", "процент",
        "ПРОЦ", "x", "×", "*", "молоко", "3,5", "творог", "пять",
        "пол-литра", "объем", "большой", "1 л", "10шт", "0", "100", "%",
        "2 Проце", "xx5", "5X10мл", "прОц.", "77 проц",
    ]
    for _ in range(4000):
        t = " ".join(rng.choice(pieces) for _ in range(rng.randint(1, 12)))
        assert N._shared_regex_spans(t) == ungated(t), t


def test_split_all_equals_three_pass_composition():
    """_split_all (round-5 fused pass) ≡ _split_spaced(PERCENT) then
    _split_spaced(VOLUME) then _split_multipack, on adversarial span sets
    over texts with spaces and multiplier chars in every position."""
    import random

    from x5_ner_spark.core.numeric import (
        _split_all,
        _split_multipack,
        _split_spaced,
    )

    rng = random.Random(13)
    alphabet = "ab х×*x 12 мл %"
    tags = ["B-PERCENT", "I-PERCENT", "B-VOLUME", "I-VOLUME", "B-BRAND"]
    for _ in range(3000):
        text = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 30)))
        spans = []
        for _ in range(rng.randint(0, 6)):
            if not text:
                break
            s = rng.randrange(0, len(text))
            e = rng.randrange(s + 1, len(text) + 1)
            spans.append((s, e, rng.choice(tags)))
        want = _split_multipack(
            text, _split_spaced(text, _split_spaced(text, spans, "PERCENT"), "VOLUME")
        )
        assert _split_all(text, spans) == want, (text, spans)


def test_implicit_pass_bisect_equals_naive_on_number_dense_text():
    """Round-5 scale fix: neighbors()/overlaps_explicit are bisect-bounded
    (number-dense docs — price lists — made the naive scans quadratic).
    The candidate sets are provably identical; pin with a brute-force
    reimplementation over adversarial number-dense fuzz."""
    import random

    from x5_ner_spark.core.numeric import (
        FATTY_WORDS, PACK_WORDS, RE_NUMBER, RE_PERCENT_SIGN, SIZE_WORDS,
        _has_digit, _shared_regex_spans, implicit_numeric_spans,
        tokenize_with_offsets,
    )
    from x5_ner_spark.core.textnorm import normalize_token, token_close_to_lexicon

    def brute(text):
        if not _has_digit(text):
            return []
        matches = [m.span() for m in RE_NUMBER.finditer(text)]
        if not matches:
            return []
        toks = [(normalize_token(t), s, e) for t, s, e in tokenize_with_offsets(text)]
        shared = _shared_regex_spans(text)
        explicit = [sp for key in ("pct_sign", "pct_word", "multipack", "volume")
                    for sp in shared[key]]
        out = []
        for s, e in matches:
            if any(es < e and ee > s for es, ee in explicit):
                continue
            raw = text[s:e]
            if RE_PERCENT_SIGN.search(raw):
                continue
            try:
                val = float(raw.replace(",", "."))
            except ValueError:
                continue
            pos = (s + e) // 2
            lo, hi = pos - 20, pos + 20
            neigh = [t for t, ss, ee in toks if ss < hi and ee > lo and t]
            if any(w in SIZE_WORDS for w in neigh):
                continue
            near_fatty = any(token_close_to_lexicon(w, FATTY_WORDS) for w in neigh)
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

    rng = random.Random(21)
    words = ["молоко", "сыр", "пакет", "скидка", "банка", "размер", "творог",
             "цена", "упаковка", "шт"]
    for _ in range(500):
        parts = []
        for _ in range(rng.randint(1, 40)):
            r = rng.random()
            if r < 0.5:
                parts.append(str(rng.randint(0, 500)) + rng.choice(["", ",5", ".25"]))
            elif r < 0.6:
                parts.append(str(rng.randint(0, 99)) + "%")
            elif r < 0.7:
                parts.append(str(rng.randint(1, 9)) + rng.choice([" мл", " л", " шт", " г"]))
            else:
                parts.append(rng.choice(words))
        t = " ".join(parts)
        assert implicit_numeric_spans(t) == brute(t), t
