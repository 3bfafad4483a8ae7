"""Windowed long-document inference (core/chunked.py, VERDICT r7 #1).

The sequence-level providers pin the reference's max_len=160 truncation
(configs/train.yaml; infer.py:165-183) — correct spec for its short queries,
wrong shape for web pages. ChunkedSeqProvider lifts it with overlapping
windows + most-interior overlap resolution, provider-agnostic.

Pinned here:
- short documents (≤ one window) are BYTE-IDENTICAL to the unwrapped
  provider (fast path delegates the untouched full text);
- every word of an arbitrarily long document gets exactly one probability
  row at the unshifted word span (full coverage — the truncating path
  structurally cannot give this);
- overlap resolution keeps the row from the window where the word is most
  interior, ties to the earlier window (the standard HF long-doc pattern);
- results are a pure function of the text (batching-invariant);
- the executor path (fused Arrow stage / CRF decode UDF) is byte-identical
  to the driver-side oracle, and the decision surface really does extend
  past the truncation point (log rows for words the truncate path never
  decides);
- CRF Viterbi composes with checkpoint providers, contextual ones included
  (VERDICT r7 #6): emissions = log of the provider's per-word rows.
"""

from __future__ import annotations

import numpy as np
import pytest

from x5_ner_spark.core.chunked import ChunkedSeqProvider, _build_windows, maybe_chunked
from x5_ner_spark.core.ctx_transformer import CtxTransformerProvider, write_ctx_checkpoint
from x5_ner_spark.core.numeric import tokenize_with_offsets
from x5_ner_spark.core.subword import SubwordEmissionProvider, write_subword_checkpoint

VOCAB = [
    "моло", "##ко", "кефир", "сан", "санта", "##та", "вода",
    "greenfield", "чай", "##й", "ча", "простоквашино",
]
# single-piece words (each matches one vocab entry whole)
ONE_PIECE = ["кефир", "вода", "чай", "санта"]


@pytest.fixture(scope="module")
def ctx_ckpt(tmp_path_factory):
    p = tmp_path_factory.mktemp("chunk") / "ctx.npz"
    return write_ctx_checkpoint(str(p), VOCAB, max_len=160)


@pytest.fixture(scope="module")
def ctx_small(tmp_path_factory):
    """Tiny window (budget 6 pieces) so window geometry is testable."""
    p = tmp_path_factory.mktemp("chunk_small") / "ctx8.npz"
    return write_ctx_checkpoint(str(p), VOCAB, max_len=8)


@pytest.fixture(scope="module")
def sw_ckpt(tmp_path_factory):
    p = tmp_path_factory.mktemp("chunk_sw") / "sw.npz"
    return write_subword_checkpoint(str(p), VOCAB, max_len=160)


def words_text(n: int) -> str:
    return " ".join(ONE_PIECE[i % len(ONE_PIECE)] for i in range(n))


# ---------------------------------------------------------------- windows
def test_build_windows_geometry():
    # 10 single-piece words, budget 6, stride 3 → [0,6) [3,9) [6,10)
    assert _build_windows([1] * 10, 6, 3) == [(0, 6), (3, 9), (6, 10)]
    # oversized word gets a singleton window and progress continues
    assert _build_windows([9, 1, 1], 6, 3) == [(0, 1), (1, 3)]
    # everything fits → one window
    assert _build_windows([2, 2, 2], 6, 3) == [(0, 3)]
    # stride never stalls: start strictly increases even when stride exceeds
    # the window's piece mass
    wins = _build_windows([1] * 5, 2, 2)
    starts = [w0 for w0, _ in wins]
    assert starts == sorted(set(starts)) and wins[-1][1] == 5


# ------------------------------------------------------------ short docs
def test_short_docs_byte_identical(ctx_ckpt, sw_ckpt):
    texts = ["молоко кефир", "санта вода greenfield", "", "   ", "чай"]
    for cls, path in ((CtxTransformerProvider, ctx_ckpt),
                      (SubwordEmissionProvider, sw_ckpt)):
        base = cls(path)
        wrapped = ChunkedSeqProvider(base)
        assert wrapped.word_probs_for_texts(texts) == base.word_probs_for_texts(texts)


# --------------------------------------------------------- long coverage
def test_long_doc_full_coverage(ctx_ckpt):
    base = CtxTransformerProvider(ctx_ckpt)
    t = words_text(1000)
    toks = tokenize_with_offsets(t)
    assert len(toks) == 1000
    # truncating path: only the first ~158 words are ever decided
    (tr_spans, _), = base.word_probs_for_texts([t])
    assert len(tr_spans) < 200
    spans, probs = ChunkedSeqProvider(base).word_probs_for_texts([t])[0]
    assert len(spans) == len(probs) == 1000
    assert spans == [(s, e) for _, s, e in toks]
    assert all(len(p) == 9 and abs(sum(p) - 1.0) < 1e-9 for p in probs)


def test_oversized_single_word(ctx_small):
    base = CtxTransformerProvider(ctx_small)
    giant = "вода" * 50  # piece-heavy single word: exceeds the 6-piece budget
    t = f"кефир {giant} санта " + words_text(8)
    spans, probs = ChunkedSeqProvider(base).word_probs_for_texts([t])[0]
    toks = tokenize_with_offsets(t)
    # every word present exactly once; the oversized word's span may end at
    # its last covered piece (the unwindowed truncation rule, applied within
    # its singleton window)
    assert len(spans) == len(toks)
    assert [s for s, _ in spans] == [s for _, s, _ in toks]


# ------------------------------------------------------ overlap resolution
def test_most_interior_window_wins(ctx_small):
    base = CtxTransformerProvider(ctx_small)
    t = words_text(10)  # 10 single-piece words; budget 6, stride 3
    toks = tokenize_with_offsets(t)
    wins = [(0, 6), (3, 9), (6, 10)]
    per_win = []
    for w0, w1 in wins:
        sub = t[toks[w0][1] : toks[w1 - 1][2]]
        per_win.append(base.word_probs_for_texts([sub])[0])
    spans, probs = ChunkedSeqProvider(base).word_probs_for_texts([t])[0]
    assert len(spans) == 10

    def win_row(k, gi):
        w0, w1 = wins[k]
        return per_win[k][1][gi - w0]

    # word 0: only window 0 covers the left edge
    assert probs[0] == win_row(0, 0)
    # word 4: score 1 in win0 (min(4, 6-5)), score 1 in win1 (min(1, 6-2)) —
    # tie goes to the EARLIER window
    assert probs[4] == win_row(0, 4)
    # word 5: win0 edge (score 0) vs win1 interior (score 2) — win1 wins
    assert probs[5] == win_row(1, 5)
    # contextuality sanity: the two candidate rows for word 5 really differ
    assert win_row(0, 5) != win_row(1, 5)
    # word 9: right edge — last window
    assert probs[9] == win_row(2, 9)


def test_batching_invariance(ctx_small):
    base = CtxTransformerProvider(ctx_small)
    wrapped = ChunkedSeqProvider(base)
    long1, long2, short = words_text(20), words_text(31), "молоко кефир"
    together = wrapped.word_probs_for_texts([long1, short, long2])
    assert together[0] == wrapped.word_probs_for_texts([long1])[0]
    assert together[1] == wrapped.word_probs_for_texts([short])[0]
    assert together[2] == wrapped.word_probs_for_texts([long2])[0]


# ------------------------------------------------------------- dispatch
def test_maybe_chunked_dispatch(ctx_ckpt):
    from x5_ner_spark.core.emission import provider_for, write_npz_checkpoint

    base = provider_for(ctx_ckpt)
    assert maybe_chunked(base, "truncate") is base
    wrapped = maybe_chunked(base, "windowed")
    assert isinstance(wrapped, ChunkedSeqProvider) and wrapped.base is base
    with pytest.raises(ValueError):
        maybe_chunked(base, "windows")
    with pytest.raises(ValueError):
        ChunkedSeqProvider(base, stride=0)
    with pytest.raises(ValueError):
        ChunkedSeqProvider(base, stride=200)  # > budget for max_len=160


def test_word_level_provider_passes_through(tmp_path):
    from x5_ner_spark.core.emission import NpzMlpProvider, write_npz_checkpoint

    p = NpzMlpProvider(write_npz_checkpoint(str(tmp_path / "mlp.npz")))
    assert maybe_chunked(p, "windowed") is p
    with pytest.raises(TypeError):
        ChunkedSeqProvider(p)


# ------------------------------------------------------------ CRF × ctx
def test_crf_composes_with_ctx_provider(ctx_ckpt):
    """VERDICT r7 #6: Viterbi over CONTEXTUAL emissions — the driver-side
    numpy reference (log-prob emissions through viterbi_decode_batch) must
    equal crf_mention_spans_batch(provider=ctx)."""
    from x5_ner_spark.core.crf import stub_crf_params, viterbi_decode_batch
    from x5_ner_spark.core.mention_pipeline import crf_mention_spans_batch
    from x5_ner_spark.core.postprocess import postprocess
    from x5_ner_spark.core.spans import BIO_TAGS

    base = CtxTransformerProvider(ctx_ckpt)
    texts = ["молоко кефир санта", "вода greenfield чай кефир", "", "   "]
    got = crf_mention_spans_batch(texts, provider=base)

    start, trans, end = stub_crf_params()
    expect = []
    for t in texts:
        if not t.strip():
            expect.append([])
            continue
        (wspans, probs), = base.word_probs_for_texts([t])
        emis = np.log(np.clip(np.array(probs), 1e-12, None))
        (path,) = viterbi_decode_batch([emis], start, trans, end)
        raw = [(s, e, BIO_TAGS[i]) for (s, e), i in zip(wspans, path)]
        expect.append(postprocess(t, raw) if raw else [])
    assert got == expect


def test_crf_composes_with_word_level_provider(tmp_path):
    """Word-level checkpoint under CRF: emissions are log(batch probs)."""
    from x5_ner_spark.core.crf import stub_crf_params, viterbi_decode_batch
    from x5_ner_spark.core.emission import NpzMlpProvider, write_npz_checkpoint
    from x5_ner_spark.core.mention_pipeline import crf_mention_spans_batch
    from x5_ner_spark.core.postprocess import postprocess
    from x5_ner_spark.core.spans import BIO_TAGS
    from x5_ner_spark.core.textnorm import norm_token_simple

    prov = NpzMlpProvider(write_npz_checkpoint(str(tmp_path / "mlp.npz")))
    t = "молоко простоквашино 3,2% кефир"
    (got,) = crf_mention_spans_batch([t], provider=prov)

    toks = tokenize_with_offsets(t)
    keys = [(norm_token_simple(w), i > 0) for i, (w, _, _) in enumerate(toks)]
    emis = np.log(np.clip(np.asarray(prov.batch_probabilities(keys)), 1e-12, None))
    start, trans, end = stub_crf_params()
    (path,) = viterbi_decode_batch([emis], start, trans, end)
    raw = [(s, e, BIO_TAGS[i]) for (_, s, e), i in zip(toks, path)]
    assert got == (postprocess(t, raw) if raw else [])


def test_crf_default_path_unchanged(ctx_ckpt):
    """provider=None must stay byte-identical to the historical stub path."""
    from x5_ner_spark.core.mention_pipeline import crf_mention_spans_batch

    texts = ["молоко кефир", "вода 1 л santa"]
    assert crf_mention_spans_batch(texts) == crf_mention_spans_batch(
        texts, provider=None
    )


# ------------------------------------------------------------- executor
def test_fused_windowed_executor_equals_oracle(spark, ctx_ckpt):
    """End-to-end under Spark: fused Arrow stage with long_doc='windowed'
    must be byte-identical to the driver-side oracle, and must DECIDE words
    past the truncation point (more log rows than the truncate path)."""
    from x5_ner_spark.core.mention_pipeline import final_mention_spans_batch
    from x5_ner_spark.pipeline import fused

    texts = [words_text(400), "молоко кефир санта", words_text(260)]
    rows = [(f"u{i}", None, t) for i, t in enumerate(texts)]
    pages = spark.createDataFrame(rows, "url string, html binary, text string")

    out = {}
    for mode in ("truncate", "windowed"):
        df = fused.fused_triples_and_log(
            pages, emission_npz=ctx_ckpt, long_doc=mode
        )
        out[mode] = df.filter("rec_type = 'log'").collect()
    # truncation decides < 200 words per long doc; windowing decides them all
    assert len(out["windowed"]) > len(out["truncate"])

    base = CtxTransformerProvider(ctx_ckpt)
    wrapped = ChunkedSeqProvider(base)
    logs: list[list[dict]] = []
    final_mention_spans_batch(texts, logs=logs, provider=wrapped)
    expect = sorted(
        (f"u{i}", r["start"], r["end"], r["label"], r["reason"])
        for i, recs in enumerate(logs)
        for r in recs
    )
    got = sorted(
        (r["url"], r["start"], r["end"], r["label"], r["reason"])
        for r in out["windowed"]
    )
    assert got == expect


def test_crf_udf_windowed_ctx_executor(spark, ctx_ckpt):
    """decode='crf' × emission_npz=ctx × long_doc='windowed' through the
    mentions UDF — executor ≡ driver (the full composition of VERDICT r7
    #1 and #6)."""
    from pyspark.sql import functions as F

    from x5_ner_spark.core.mention_pipeline import crf_mention_spans_batch
    from x5_ner_spark.operators.span_udfs import make_mentions_udf

    texts = [words_text(300), "молоко кефир вода", words_text(170)]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    udf = make_mentions_udf(
        decode="crf", emission_npz=ctx_ckpt, long_doc="windowed"
    )
    got = {
        r["text"]: [(s["start"], s["end"], s["tag"]) for s in r["spans"]]
        for r in df.select("text", udf(F.col("text")).alias("spans")).collect()
    }
    base = CtxTransformerProvider(ctx_ckpt)
    expect = crf_mention_spans_batch(texts, provider=ChunkedSeqProvider(base))
    for t, sp in zip(texts, expect):
        assert got[t] == [(int(s), int(e), tag) for s, e, tag in sp]
