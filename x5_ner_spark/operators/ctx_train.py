"""Distributed head-probe training for the contextual transformer (N4
extended to the contextual model, round 7).

The reference fine-tunes encoder+head end to end (ner/train.py:31-62);
full distributed backprop through self-attention is out of engine scope
(SURVEY §2.11 keeps gradient training to the distributed-friendly pieces).
The distributed-friendly piece for a CONTEXTUAL encoder is the linear-probe
shape every production evaluation stack uses: freeze the encoder, train the
9-class softmax head on its features.

Two-phase plan, because the expensive part is the forward pass:

1. ``ctx_feature_table`` — ONE pass over the corpus (mapInPandas): per
   covered word, the stub-teacher label propagated to each of its covered
   pieces (the HF ``label_all_tokens`` convention the reference's
   subtoken-mean aggregation pairs with), each with the piece's frozen
   post-final-LN feature row. Persisted; d=32 doubles per piece.
2. ``fit_ctx_head`` — iterative softmax-CE on the cached features:
   per-partition (loss, dW, db) sums via mapInPandas, driver GD update —
   the classic MLlib full-batch shape (same as emission_train), but each
   iteration now touches only the tiny feature table, never the encoder.

The trained head is saved as a full ctx checkpoint (all encoder arrays
copied, head replaced) so ``provider_for`` serves it unchanged.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..core.spans import BIO_TAGS

N_CLASSES = len(BIO_TAGS)


def softmax_head_loss_and_grads(
    feats: np.ndarray,
    labels: np.ndarray,
    w: np.ndarray,
    b: np.ndarray,
    class_w: np.ndarray | None = None,
) -> tuple[float, np.ndarray, np.ndarray]:
    """SUMMED cross-entropy and (dW, db) for a feature batch — sums add
    across partitions; the driver normalizes by the global count.
    ``class_w``: optional per-class sample weights (balanced training for
    the BIO tail — O/TYPE pieces outnumber BRAND pieces ~20:1 on web text,
    and the unweighted probe collapses to the head classes). Numerically
    checked against finite differences in tests, weighted and not."""
    logits = feats @ w + b
    m = logits.max(axis=1, keepdims=True)
    e = np.exp(logits - m)
    p = e / e.sum(axis=1, keepdims=True)
    n = feats.shape[0]
    nll = -np.log(np.clip(p[np.arange(n), labels], 1e-12, None))
    g = p
    g[np.arange(n), labels] -= 1.0
    if class_w is not None:
        sw = class_w[labels]
        nll = nll * sw
        g = g * sw[:, None]
    loss = float(nll.sum())
    return loss, feats.T @ g, g.sum(axis=0)


def soft_ce_loss_and_grads(
    feats: np.ndarray, q: np.ndarray, w: np.ndarray, b: np.ndarray
) -> tuple[float, np.ndarray, np.ndarray]:
    """SUMMED soft-target cross-entropy H(q, p) and (dW, db): the
    distillation objective — gradient is the textbook (p − q). Finite-
    difference checked in tests alongside the hard-label variant."""
    logits = feats @ w + b
    m = logits.max(axis=1, keepdims=True)
    e = np.exp(logits - m)
    p = e / e.sum(axis=1, keepdims=True)
    loss = float(-(q * np.log(np.clip(p, 1e-12, None))).sum())
    g = p - q
    return loss, feats.T @ g, g.sum(axis=0)


def ctx_feature_table(
    docs: DataFrame, ckpt_path: str, text_col: str = "text",
    soft: bool = False,
) -> DataFrame:
    """One frozen-encoder forward pass over the corpus → (feat array<double>,
    label long) per covered PIECE, teacher label = stub-model argmax of the
    piece's word (propagated to each of its pieces). Map-only; persist the
    result before iterating on it.

    Feature extraction inherits the provider's max_len truncation (same as
    serving under long_doc='truncate'): on long-page corpora, train on
    representative-length samples or the head never sees tail-piece
    features — a windowed feature pass (the chunked.py pattern applied to
    ``_forward_piece_feats``) is the extension point if tail supervision
    ever matters; the fixture corpora sit well under one window.

    ``soft=True`` adds a ``q array<double>`` column: the teacher's FULL
    9-probability row (Hinton-style distillation targets). The cascade
    downstream consumes probability VECTORS against fixed thresholds
    (p_type ≥ 0.15 fallback etc.), so matching the teacher's distribution —
    not just its argmax — is what transfers span behavior; hard-label
    probes measurably over-predict TYPE (tools/ctx_distill_eval.py)."""

    def gen(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..core.emission import provider_for
        from ..core.stub_model import batch_probabilities
        from ..core.textnorm import norm_token_simple

        prov = provider_for(ckpt_path)
        for pdf in pdfs:
            feats: list = []
            labels: list = []
            qs: list = []
            for text in pdf[text_col]:
                t = "" if text is None else text
                enc = prov.tokenizer.encode_text(t, prov.max_len)
                if not enc:
                    continue
                keys = [
                    (norm_token_simple(t[ws:we]), i > 0)
                    for i, (ws, we, _) in enumerate(enc)
                ]
                word_probs = batch_probabilities(keys)
                word_labels = word_probs.argmax(axis=1)
                ids = [p for _, _, ps in enc for p, _ in ps]
                conts = [c for _, _, ps in enc for _, c in ps]
                rows = prov._forward_piece_feats(ids, conts)
                at = 0
                for wi, (_, _, ps) in enumerate(enc):
                    for r in rows[at : at + len(ps)]:
                        feats.append([float(x) for x in r])
                        labels.append(int(word_labels[wi]))
                        if soft:
                            qs.append([float(x) for x in word_probs[wi]])
                    at += len(ps)
            out = {"feat": feats, "label": labels}
            if soft:
                out["q"] = qs
            yield pd.DataFrame(out)

    schema = "feat array<double>, label long"
    if soft:
        schema += ", q array<double>"
    return docs.select(text_col).mapInPandas(gen, schema)


def fit_ctx_head(
    features: DataFrame,
    ckpt_path: str,
    out_path: str,
    iters: int = 40,
    lr: float = 0.5,
    loss_history: list | None = None,
    class_weight: str | None = None,
    soft: bool = False,
    momentum: float = 0.0,
) -> str:
    """Full-batch GD on the cached feature table; saves ``out_path`` as a
    complete ctx checkpoint (encoder arrays copied verbatim, head replaced)
    servable via provider_for / --emission-npz.

    ``class_weight='balanced'``: per-class weights n/(k·count_c) — sklearn's
    convention — computed from the feature table in one aggregate. Training
    only: the served head stays a plain softmax. Without it the probe
    collapses to the majority classes and never predicts BRAND pieces
    (measured in tools/ctx_distill_eval.py; the triple-recall deliverable
    of VERDICT r7 #5 depends on this knob).

    ``soft=True``: distillation against the teacher's full probability rows
    (``features`` must come from ``ctx_feature_table(..., soft=True)``) —
    H(q, p) objective, gradient (p − q). Calibrates the served
    probabilities against the cascade's fixed thresholds instead of just
    ranking the argmax; mutually exclusive with class_weight.

    ``momentum``: heavy-ball coefficient (0 = plain GD, unchanged
    historical behavior). Full-batch GD on a convex objective tolerates
    high momentum; 0.9 converges ~5-10× faster per iteration at the same
    stability (each iteration costs one distributed pass, so this is the
    cheap lever)."""
    if soft and class_weight is not None:
        raise ValueError("soft targets and class_weight are mutually exclusive")
    with np.load(ckpt_path, allow_pickle=False) as z:
        arrays = {k: z[k] for k in z.files}
    w = arrays["head_w"].astype("float64")
    b = arrays["head_b"].astype("float64")

    data = features.persist()
    n_rows = data.count()
    if n_rows == 0:
        data.unpersist()
        raise ValueError("empty feature table")

    cw: np.ndarray | None = None
    if class_weight == "balanced":
        counts = {
            int(r["label"]): int(r["cnt"])
            for r in data.groupBy("label").agg(
                F.count(F.lit(1)).alias("cnt")
            ).collect()
        }
        cw = np.zeros(N_CLASSES)
        for c, cnt in counts.items():
            cw[c] = n_rows / (N_CLASSES * cnt)
    elif class_weight is not None:
        raise ValueError(f"class_weight must be 'balanced' or None, got {class_weight!r}")

    d = w.shape[0]
    vel = np.zeros(d * N_CLASSES + N_CLASSES)
    for _ in range(iters):
        w_snap, b_snap = w.copy(), b.copy()

        def grad_part(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from pyspark import TaskContext

            loss, gw, gb, n = 0.0, np.zeros((d, N_CLASSES)), np.zeros(N_CLASSES), 0
            for pdf in pdfs:
                if not len(pdf):
                    continue
                f = np.array([np.asarray(x, dtype="float64") for x in pdf["feat"]])
                if soft:
                    q = np.array(
                        [np.asarray(x, dtype="float64") for x in pdf["q"]]
                    )
                    pl, pgw, pgb = soft_ce_loss_and_grads(f, q, w_snap, b_snap)
                    ln = len(q)
                else:
                    y = pdf["label"].to_numpy().astype("int64")
                    pl, pgw, pgb = softmax_head_loss_and_grads(
                        f, y, w_snap, b_snap, cw
                    )
                    ln = len(y)
                loss += pl
                gw += pgw
                gb += pgb
                n += ln
            yield pd.DataFrame(
                {"pid": [TaskContext.get().partitionId()],
                 "loss": [loss], "n": [n],
                 "g": [list(np.concatenate([gw.ravel(), gb]))]}
            )

        parts = data.mapInPandas(
            grad_part, "pid int, loss double, n long, g array<double>"
        ).collect()
        # float sums are order-sensitive: sum in partition-id order so the
        # trained head is bit-reproducible for a fixed partitioning of
        # `features` (ADVICE r7; same discipline as emission_train)
        parts.sort(key=lambda r: r["pid"])
        tot_loss = sum(r["loss"] for r in parts)
        tot_n = sum(r["n"] for r in parts)
        g = np.zeros(d * N_CLASSES + N_CLASSES)
        for r in parts:
            if r["n"]:
                g += np.asarray(r["g"])
        g /= tot_n
        vel = momentum * vel + g
        w -= lr * vel[: d * N_CLASSES].reshape(d, N_CLASSES)
        b -= lr * vel[d * N_CLASSES :]
        if loss_history is not None:
            loss_history.append(tot_loss / tot_n)
    data.unpersist()

    arrays["head_w"] = w.astype("float32")
    arrays["head_b"] = b.astype("float32")
    np.savez(out_path, **arrays)
    return out_path if out_path.endswith(".npz") else out_path + ".npz"


def split_pages(pages, train_frac: float = 0.5):
    """Deterministic url-hash train/eval page split — THE split of the
    distillation gate, shared by :func:`distill_eval_triples`, its floor
    test, and tools/ctx_distill_eval.py's random-head baseline so every
    published comparison scores the same eval set (a drifted reimplementation
    would silently corrupt the training-lift numbers)."""
    b = F.pmod(F.xxhash64("url"), F.lit(100))
    cut = int(train_frac * 100)
    bucketed = pages.withColumn("_b", b)
    return (
        bucketed.filter(F.col("_b") < cut).drop("_b"),
        bucketed.filter(F.col("_b") >= cut).drop("_b"),
    )


def distill_eval_triples(
    pages,
    ckpt_path: str,
    out_path: str,
    iters: int = 60,
    lr: float = 1.0,
    loss_history: list | None = None,
    train_frac: float = 0.5,
    objective: str = "hard",
    momentum: float = 0.9,
) -> dict:
    """End-to-end distillation gate (VERDICT r7 #5): train the ctx head on
    stub-teacher piece labels over a TRAIN split of ``pages``, run the full
    fused triple pipeline on the held-out EVAL split under BOTH the teacher
    (pinned stub cascade) and the trained contextual checkpoint, and score
    the student's triples against the teacher's — the engine's triple-P/R
    quality gate measured under a CONTEXTUAL checkpoint for the first time.

    Split is deterministic (pmod of the url hash); triples compare on exact
    (url, subj, pred, obj) identity. Returns micro P/R/F1 plus the raw
    counter table and the trained checkpoint path. The reference analog is
    eval_submission_on_train.py's span P/R, lifted to the triple surface.

    ``objective``: 'hard' (default — argmax teacher labels; the measured
    best at every encoder width, BENCH/BASELINE.md round 8), 'soft'
    (distill the teacher's full probability rows — theoretically the right
    calibration target for the threshold cascade, but on a random frozen
    encoder it spends limited probe capacity matching teacher entropy and
    measured consistently below hard), or 'balanced' (argmax labels,
    inverse-frequency class weights — recall-tilted)."""
    if objective not in ("soft", "hard", "balanced"):
        raise ValueError(f"unknown objective {objective!r}")
    train_pages, eval_pages = split_pages(pages, train_frac)
    from ..pipeline import extract
    from ..pipeline.fused import fused_triples

    feats = ctx_feature_table(
        extract.run(train_pages).select("text"), ckpt_path,
        soft=objective == "soft",
    )
    trained = fit_ctx_head(
        feats, ckpt_path, out_path, iters=iters, lr=lr,
        loss_history=loss_history,
        class_weight="balanced" if objective == "balanced" else None,
        soft=objective == "soft",
        momentum=momentum,
    )

    teacher = fused_triples(eval_pages)
    student = fused_triples(eval_pages, emission_npz=trained)
    return {"ckpt": trained, **triple_prf(teacher, student)}


def triple_prf(teacher, student) -> dict:
    """Micro P/R/F1 of ``student`` triples against ``teacher`` triples on
    exact (url, subj, pred, obj) identity — the one scoring function every
    distillation comparison uses (returns the per-pred counter table too)."""
    from .eval_ops import prf_counters

    counters = prf_counters(
        teacher, student, keys=["url", "subj", "obj"], type_col="pred"
    ).persist()
    tot = counters.agg(
        F.sum("tp").alias("tp"), F.sum("fp").alias("fp"), F.sum("fn").alias("fn")
    ).collect()[0]
    tp, fp, fn = int(tot["tp"]), int(tot["fp"]), int(tot["fn"])
    precision = tp / (tp + fp) if tp + fp else 0.0
    recall = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {
        "counters": counters,
        "tp": tp, "fp": fp, "fn": fn,
        "precision": round(precision, 4),
        "recall": round(recall, 4),
        "f1": round(f1, 4),
    }
