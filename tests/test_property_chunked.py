"""Property-based invariants for the windowed long-document wrapper
(core/chunked.py, hypothesis).

The golden tests (tests/test_chunked.py) pin specific geometries; these pin
the structural contracts for ANY input: window tiling/progress/budget for
arbitrary piece-count sequences, and — through a real contextual provider
at tiny max_len so every example spans many windows — full word coverage,
span integrity, probability-row validity, short-doc byte identity, and
batching invariance.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from x5_ner_spark.core.chunked import ChunkedSeqProvider, _build_windows
from x5_ner_spark.core.ctx_transformer import (
    CtxTransformerProvider,
    write_ctx_checkpoint,
)
from x5_ner_spark.core.numeric import tokenize_with_offsets

# ------------------------------------------------------- _build_windows

counts_st = st.lists(st.integers(1, 9), min_size=1, max_size=60)


@given(counts_st, st.integers(1, 12), st.integers(1, 12))
@settings(max_examples=300, deadline=None)
def test_build_windows_invariants(counts, budget, stride):
    stride = min(stride, budget)  # the provider enforces 0 < stride <= budget
    wins = _build_windows(counts, budget, stride)
    n = len(counts)
    assert wins, "at least one window over a non-empty doc"
    # strictly increasing starts (progress), tiling (no word falls in a gap)
    assert all(b0 > a0 for (a0, _), (b0, _) in zip(wins, wins[1:]))
    assert all(b0 <= a1 for (_, a1), (b0, _) in zip(wins, wins[1:]))
    assert wins[0][0] == 0 and wins[-1][1] == n
    covered = set()
    for w0, w1 in wins:
        assert 0 <= w0 < w1 <= n
        covered.update(range(w0, w1))
        # budget respected except for the documented singleton case
        if w1 - w0 > 1:
            assert sum(counts[w0:w1]) <= budget, (w0, w1, counts, budget)
    assert covered == set(range(n))


# ------------------------------------------------- provider-level fuzz

VOCAB = [
    "моло", "##ко", "кеф", "##ир", "вода", "gree", "##nfie", "##ld",
    "чай", "сок", "3", "2", "%", "1", "л",
]


@pytest.fixture(scope="module")
def tiny_ctx(tmp_path_factory):
    """max_len=10 (budget 8): a dozen-word text already spans windows, so
    hypothesis exercises the overlap-resolution paths cheaply."""
    p = tmp_path_factory.mktemp("prop_chunk") / "ctx10.npz"
    return CtxTransformerProvider(write_ctx_checkpoint(str(p), VOCAB, max_len=10))


words_st = st.lists(
    st.sampled_from(
        ["молоко", "кефир", "вода", "greenfield", "чай", "сок",
         "3", "2%", "1", "л", "молокок", "чайчай"]
    ),
    min_size=0,
    max_size=40,
)


@given(words_st, st.integers(1, 8))
@settings(max_examples=60, deadline=None)
def test_chunked_full_coverage_and_row_validity(tiny_ctx, words, stride):
    t = " ".join(words)
    wrapped = ChunkedSeqProvider(tiny_ctx, stride=stride)
    ((spans, probs),) = wrapped.word_probs_for_texts([t])
    toks = [(s, e) for _, s, e in tokenize_with_offsets(t)]
    # exactly one row per word, in order
    assert len(spans) == len(toks) and len(probs) == len(toks)
    for (ws, we), (ts_, te) in zip(spans, toks):
        # span starts at its word and never overruns it (an oversized word's
        # span may end early: the singleton-window truncation, same as the
        # unwindowed path)
        assert ws == ts_ and ws < we <= te
    for row in probs:
        a = np.asarray(row, dtype="float64")
        assert a.shape == (9,)
        assert abs(a.sum() - 1.0) < 1e-5
        assert (a >= 0).all()


@given(words_st)
@settings(max_examples=40, deadline=None)
def test_chunked_short_doc_byte_identity_and_batching(tiny_ctx, words):
    t = " ".join(words)
    wrapped = ChunkedSeqProvider(tiny_ctx)
    # batching invariance: alone == alongside a long companion doc
    companion = " ".join(["вода"] * 30)
    alone = wrapped.word_probs_for_texts([t])[0]
    batched = wrapped.word_probs_for_texts([companion, t])[1]
    assert alone == batched
    # short docs (fits one window) are byte-identical to the base provider
    budget = tiny_ctx.max_len - 2
    n_pieces = sum(
        len(tiny_ctx.tokenizer.word_pieces(t[s:e]))
        for _, s, e in tokenize_with_offsets(t)
    )
    if n_pieces <= budget:
        assert alone == tiny_ctx.word_probs_for_texts([t])[0]
