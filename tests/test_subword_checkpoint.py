"""N3 realistic-checkpoint tests (VERDICT r3 missing #1 / next-step #8).

Drives the emission swap point with a REAL subword-tokenizer checkpoint
shape: offsets from an actual vocab via greedy longest-match WordPiece,
max_len truncation counted like HF (specials included), word probs as the
mean of covered-piece softmax rows, straddling words clipped to their
covered pieces — ref lifecycle ner/infer.py:141-221, max_seq_len 160 in
configs/train.yaml."""

from __future__ import annotations

import numpy as np
import pytest

from x5_ner_spark.core.emission import load_count, provider_for
from x5_ner_spark.core.mention_pipeline import final_mention_spans_batch
from x5_ner_spark.core.subword import (
    BOS,
    EOS,
    UNK,
    SubwordEmissionProvider,
    SubwordTokenizer,
    write_subword_checkpoint,
)

VOCAB = [
    "моло", "##ко", "кефир", "сан", "санта", "##та", "вода",
    "greenfield", "чай", "##й", "ча",
]


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    p = tmp_path_factory.mktemp("subword") / "subword_ckpt.npz"
    return write_subword_checkpoint(str(p), VOCAB, max_len=160)


def test_tokenizer_greedy_longest_match_offsets():
    tok = SubwordTokenizer(VOCAB + [UNK, BOS, EOS])
    # longest match wins: "санта" is one piece even though "сан"+"##та" exist
    assert tok.word_pieces("санта") == [
        (VOCAB.index("санта") + 0, 0, 5, False)
    ]
    # multi-piece word with correct relative offsets + continuation flags
    pieces = tok.word_pieces("молоко")
    assert [(s, e, c) for _, s, e, c in pieces] == [(0, 4, False), (4, 6, True)]
    # unmatched position -> whole-word [UNK]
    un = tok.word_pieces("zzz")
    assert len(un) == 1 and un[0][1:] == (0, 3, False)


def test_truncation_covers_prefix_and_clips_straddler():
    tok = SubwordTokenizer(VOCAB + [UNK, BOS, EOS])
    text = "кефир молоко кефир"
    # budget = max_len - 2; with max_len=4 -> 2 pieces: "кефир"(1) then only
    # "моло" of "молоко" -> straddler span ends at its last covered piece
    enc = tok.encode_text(text, max_len=4)
    assert len(enc) == 2
    ws0, we0, p0 = enc[0]
    assert (ws0, we0) == (0, 5) and len(p0) == 1
    ws1, we1, p1 = enc[1]
    assert ws1 == 6 and we1 == 6 + 4 and len(p1) == 1  # "моло" only
    # words entirely past the boundary are absent (ref infer.py:199-207)
    full = tok.encode_text(text, max_len=160)
    assert len(full) == 3


def test_word_probs_are_mean_of_piece_softmax(ckpt):
    prov = SubwordEmissionProvider(ckpt)
    (spans, probs), = prov.word_probs_for_texts(["молоко"])
    assert spans == [(0, 6)]
    # independent recompute from the raw arrays (dense forward)
    ids = [p for p, _, _, _ in prov.tokenizer.word_pieces("молоко")]
    conts = [c for _, _, _, c in prov.tokenizer.word_pieces("молоко")]
    rows = []
    for pid, cont in zip(ids, conts):
        x = np.concatenate([prov.emb[pid], [1.0 if cont else 0.0]])
        h = np.maximum(x @ prov.w1 + prov.b1, 0.0)
        logits = h @ prov.w2 + prov.b2
        e = np.exp(logits - logits.max())
        rows.append(e / e.sum())
    want = np.stack(rows).mean(axis=0)
    assert np.allclose(np.array(probs[0]), want, rtol=0, atol=1e-12)


def test_batch_equals_scalar(ckpt):
    prov = provider_for(ckpt)
    texts = ["молоко кефир", "санта вода", "кефир"]
    batch = prov.word_probs_for_texts(texts)
    single = [prov.word_probs_for_texts([t])[0] for t in texts]
    assert batch == single  # tuples of python floats -> exact equality


def test_word_mean_cache_is_byte_identical(ckpt):
    """The per-piece-sequence mean cache (round 6) must be invisible: the
    same provider with its cache cleared between calls — and one whose
    cache is force-cleared MID-batch via a tiny threshold — returns exactly
    the tuples a cold compute does."""
    prov = SubwordEmissionProvider(ckpt)
    texts = ["молоко кефир молоко", "санта вода кефир", "молоко"]
    warm = prov.word_probs_for_texts(texts)  # populates the cache
    cached = prov.word_probs_for_texts(texts)  # pure cache hits
    prov._word_mean.clear()
    cold = prov.word_probs_for_texts(texts)
    assert warm == cached == cold
    # exercise the clear-before-insert branch: every insert clears first
    prov2 = SubwordEmissionProvider(ckpt)
    real_len = dict.__len__

    class AlwaysFull(dict):
        def __len__(self):
            return 1 << 20

    prov2._word_mean = AlwaysFull()
    assert prov2.word_probs_for_texts(texts) == cold
    assert real_len(prov2._word_mean) == 1  # each insert wiped the rest


def test_provider_dispatch(ckpt, tmp_path):
    from x5_ner_spark.core.emission import NpzMlpProvider, write_npz_checkpoint

    assert isinstance(provider_for(ckpt), SubwordEmissionProvider)
    word_ckpt = write_npz_checkpoint(str(tmp_path / "word.npz"))
    assert isinstance(provider_for(word_ckpt), NpzMlpProvider)
    # singleton: same object on repeat lookups
    assert provider_for(ckpt) is provider_for(ckpt)


def test_truncation_boundary_differential(ckpt):
    """Engine output matches the reference truncation semantics: a brand
    token past the 160-piece boundary is NEVER decided, so no span can
    overlap it — while the same token inside the window may be."""
    prov = provider_for(ckpt)
    budget = prov.max_len - 2
    # every filler word "вода" is exactly 1 piece; place "санта" past the cut
    n_fill = budget + 3
    filler = ["вода"] * n_fill
    text = " ".join(filler + ["санта"])
    santa_start = text.rindex("санта")

    spans_batch = final_mention_spans_batch(
        [text], frozenset({"санта"}), ["санта"], provider=prov
    )
    for s, e, _ in spans_batch[0]:
        assert e <= santa_start, (s, e, santa_start)

    # decision log covers exactly the covered words (the straddler rule has
    # its own test above; here all covered words are whole)
    logs: list = []
    final_mention_spans_batch(
        [text], frozenset({"санта"}), ["санта"], logs=logs, provider=prov
    )
    assert len(logs[0]) <= budget
    covered = prov.tokenizer.encode_text(text, prov.max_len)
    decided_starts = {r["start"] for r in logs[0]}
    assert decided_starts <= {ws for ws, _, _ in covered}


def test_fused_stage_under_subword_checkpoint(spark, ckpt):
    """End-to-end through the fused Arrow stage (the production path):
    spark-side run under the realistic checkpoint + one load per worker."""
    from x5_ner_spark.pipeline import fused
    from x5_ner_spark.pipeline.fixtures import pages_df

    pages = pages_df(spark, 300)
    trip = fused.fused_triples(pages, frozenset({"санта"}), emission_npz=ckpt)
    rows = trip.collect()
    assert {c for c in trip.columns} == {"subj", "pred", "obj", "url"}
    assert all(r["pred"] in ("is_type", "has_brand", "has_volume", "has_percent")
               for r in rows)
    # singleton lifecycle: at most one load per python worker (+1 for any
    # driver-side provider_for calls in this test session)
    n_workers = int(spark.sparkContext.defaultParallelism)
    assert 1 <= load_count(ckpt) <= 2 * n_workers + 2


def test_legacy_object_vocab_checkpoint_error_names_the_fix(tmp_path):
    """ADVICE r5: a pre-hardening checkpoint (dtype=object vocab) must fail
    with a message that names the migration (regenerate via
    write_subword_checkpoint), not numpy's opaque object-array refusal."""
    p = str(tmp_path / "legacy.npz")
    good = write_subword_checkpoint(str(tmp_path / "tmp.npz"), VOCAB)
    with np.load(good) as z:
        arrays = {k: z[k] for k in z.files}
    arrays["vocab"] = np.array(list(arrays["vocab"]), dtype=object)
    np.savez(p, **arrays)
    with pytest.raises(ValueError, match="write_subword_checkpoint"):
        SubwordEmissionProvider(p)


def test_tokenizer_hypothesis_random_vocab_and_words():
    """Hypothesis sweep over random VOCABULARIES too (the fixed-vocab sweep
    below can't catch vocab-dependent bugs): greedy longest-match is locally
    optimal — at every piece boundary no LONGER vocab entry matches — and
    encode_text never exceeds the piece budget, truncates word spans at the
    last covered piece, and derives spans from the pieces it kept."""
    from hypothesis import given, settings, strategies as st

    alphabet = "абвг"
    word_st = st.text(alphabet=alphabet, min_size=1, max_size=8)

    @given(
        vocab=st.sets(
            st.one_of(
                word_st,
                word_st.map(lambda w: "##" + w),
            ),
            min_size=1,
            max_size=25,
        ),
        words=st.lists(word_st, min_size=1, max_size=10),
        max_len=st.integers(3, 12),
    )
    @settings(max_examples=300, deadline=None)
    def check(vocab, words, max_len):
        vocab = sorted(vocab)
        tok = SubwordTokenizer(vocab + [UNK, BOS, EOS])
        full = vocab + [UNK, BOS, EOS]
        for word in words:
            pieces = tok.word_pieces(word)
            if len(pieces) == 1 and full[pieces[0][0]] == UNK:
                continue
            for p, s, e, c in pieces:
                key = full[p]
                assert key == (("##" + word[s:e]) if s > 0 else word[s:e])
                # greedy: no longer piece matches at this position
                for longer in range(e - s + 1, len(word) - s + 1):
                    cand = word[s : s + longer]
                    assert (("##" + cand) if s > 0 else cand) not in tok.piece_id
        text = " ".join(words)
        enc = tok.encode_text(text, max_len=max_len)
        total = sum(len(ps) for _, _, ps in enc)
        assert total <= max_len - 2
        for ws, we, ps in enc:
            assert ps, "covered word must keep at least one piece"
            word = text[ws:]
            word = word[: word.find(" ")] if " " in word else word
            want = tok.word_pieces(word)[: len(ps)]
            assert [(p, c) for p, _, _, c in want] == ps
            assert we == ws + want[-1][2]

    check()


def test_tokenizer_properties_random_words():
    """Property sweep: pieces tile the word contiguously; concatenating
    piece surfaces (continuations stripped of '##') reconstructs the word
    unless the word collapsed to [UNK]."""
    import random

    vocab = VOCAB + [UNK, BOS, EOS] + list("абвгдежзик")
    tok = SubwordTokenizer(vocab)
    piece_by_id = {i: p for i, p in enumerate(vocab)}
    rng = random.Random(42)
    alphabet = "абвгдежзик"
    for _ in range(300):
        word = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 12)))
        pieces = tok.word_pieces(word)
        # contiguous tiling from 0 to len(word)
        assert pieces[0][1] == 0 and pieces[-1][2] == len(word)
        for (pa, sa, ea, ca), (pb, sb, eb, cb) in zip(pieces, pieces[1:]):
            assert ea == sb
        if not (len(pieces) == 1 and piece_by_id[pieces[0][0]] == UNK):
            rebuilt = "".join(
                piece_by_id[p].lstrip("#") for p, _, _, _ in pieces
            )
            assert rebuilt == word
            # offsets match the piece surfaces
            for p, s, e, c in pieces:
                assert word[s:e] == piece_by_id[p].lstrip("#")
                assert c == (s > 0)
