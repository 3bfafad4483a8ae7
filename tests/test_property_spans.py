"""Property-based invariants for the span algebra (hypothesis).

These complement the byte-exact differential tests: they pin structural
invariants that must hold for ANY input, which golden cases can't cover.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from x5_ner_spark.core.numeric import collapse_overlaps, numeric_spans
from x5_ner_spark.core.postprocess import merge_model_and_numeric, postprocess
from x5_ner_spark.core.spans import bio_to_entities, parse_annotation, serialize_spans

TAGS = ["O", "B-TYPE", "I-TYPE", "B-BRAND", "I-BRAND", "B-VOLUME", "I-VOLUME",
        "B-PERCENT", "I-PERCENT"]

span_st = st.tuples(
    st.integers(0, 40), st.integers(1, 15), st.sampled_from(TAGS)
).map(lambda t: (t[0], t[0] + t[1], t[2]))
spans_st = st.lists(span_st, max_size=10)

text_st = st.text(
    alphabet="абвгдежзик мол0123456789%лх.,- xyz", min_size=0, max_size=60
)


@given(spans_st)
@settings(max_examples=200, deadline=None)
def test_collapse_overlaps_invariants(spans):
    out = collapse_overlaps(spans)
    # sorted by start; same-label neighbors never overlap afterwards
    assert out == sorted(out, key=lambda x: (x[0],))
    for (s1, e1, t1), (s2, e2, t2) in zip(out, out[1:]):
        if t1 == t2:
            assert not (s2 < e1 and e2 > s1) or (s2 >= e1)
    # idempotent
    assert collapse_overlaps(out) == out


@given(spans_st)
@settings(max_examples=200, deadline=None)
def test_bio_merge_invariants(spans):
    ents = bio_to_entities(spans)
    assert ents == sorted(ents)
    for s, e, tag in ents:
        assert tag.startswith("B-") and s < e
    # merging the merged output is a fixpoint
    assert bio_to_entities(ents) == ents


@given(spans_st)
@settings(max_examples=200, deadline=None)
def test_serialize_parse_roundtrip(spans):
    ser = serialize_spans(spans)
    back = parse_annotation(ser)
    assert back == sorted(set(spans), key=lambda x: (x[0], x[1], x[2])) or back == sorted(
        spans, key=lambda x: (x[0], x[1], x[2])
    )  # serialize keeps duplicates; parse preserves list order
    assert parse_annotation(serialize_spans(back)) == back


@given(text_st)
@settings(max_examples=150, deadline=None)
def test_numeric_spans_total_and_in_bounds(text):
    out = numeric_spans(text)
    for s, e, tag in out:
        assert 0 <= s < e <= len(text)
        assert tag.split("-")[-1] in ("PERCENT", "VOLUME")


@given(text_st, spans_st)
@settings(max_examples=150, deadline=None)
def test_postprocess_never_crashes_and_is_sorted_distinct(text, spans):
    bounded = [(s, min(e, len(text)), t) for s, e, t in spans if s < len(text)]
    out = postprocess(text, bounded)
    assert out == sorted(set(out), key=lambda x: (x[0], x[1], x[2]))


@given(text_st, spans_st, spans_st)
@settings(max_examples=150, deadline=None)
def test_merge_policy_closure(text, base, add):
    out = merge_model_and_numeric(text, base, add)
    allowed = set(base) | set(add)
    assert set(out) <= allowed  # never invents spans
    assert out == sorted(set(out), key=lambda x: (x[0], x[1], x[2]))
