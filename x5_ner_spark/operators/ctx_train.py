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

from ..core.spans import BIO_TAGS

N_CLASSES = len(BIO_TAGS)


def softmax_head_loss_and_grads(
    feats: np.ndarray, labels: np.ndarray, w: np.ndarray, b: np.ndarray
) -> tuple[float, np.ndarray, np.ndarray]:
    """SUMMED cross-entropy and (dW, db) for a feature batch — sums add
    across partitions; the driver normalizes by the global count.
    Numerically checked against finite differences in tests."""
    logits = feats @ w + b
    m = logits.max(axis=1, keepdims=True)
    e = np.exp(logits - m)
    p = e / e.sum(axis=1, keepdims=True)
    n = feats.shape[0]
    loss = float(-np.log(np.clip(p[np.arange(n), labels], 1e-12, None)).sum())
    g = p
    g[np.arange(n), labels] -= 1.0
    return loss, feats.T @ g, g.sum(axis=0)


def ctx_feature_table(
    docs: DataFrame, ckpt_path: str, text_col: str = "text"
) -> DataFrame:
    """One frozen-encoder forward pass over the corpus → (feat array<double>,
    label long) per covered PIECE, teacher label = stub-model argmax of the
    piece's word (propagated to all its pieces). Map-only; persist the
    result before iterating on it."""

    def gen(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..core.emission import provider_for
        from ..core.stub_model import batch_probabilities
        from ..core.textnorm import norm_token_simple

        prov = provider_for(ckpt_path)
        for pdf in pdfs:
            feats: list = []
            labels: list = []
            for text in pdf[text_col]:
                t = "" if text is None else text
                enc = prov.tokenizer.encode_text(t, prov.max_len)
                if not enc:
                    continue
                keys = [
                    (norm_token_simple(t[ws:we]), i > 0)
                    for i, (ws, we, _) in enumerate(enc)
                ]
                word_labels = batch_probabilities(keys).argmax(axis=1)
                ids = [p for _, _, ps in enc for p, _ in ps]
                conts = [c for _, _, ps in enc for _, c in ps]
                rows = prov._forward_piece_feats(ids, conts)
                at = 0
                for (_, _, ps), lab in zip(enc, word_labels):
                    for r in rows[at : at + len(ps)]:
                        feats.append([float(x) for x in r])
                        labels.append(int(lab))
                    at += len(ps)
            yield pd.DataFrame({"feat": feats, "label": labels})

    return docs.select(text_col).mapInPandas(gen, "feat array<double>, label long")


def fit_ctx_head(
    features: DataFrame,
    ckpt_path: str,
    out_path: str,
    iters: int = 40,
    lr: float = 0.5,
    loss_history: list | None = None,
) -> str:
    """Full-batch GD on the cached feature table; saves ``out_path`` as a
    complete ctx checkpoint (encoder arrays copied verbatim, head replaced)
    servable via provider_for / --emission-npz."""
    with np.load(ckpt_path, allow_pickle=False) as z:
        arrays = {k: z[k] for k in z.files}
    w = arrays["head_w"].astype("float64")
    b = arrays["head_b"].astype("float64")

    data = features.persist()
    n_rows = data.count()
    if n_rows == 0:
        data.unpersist()
        raise ValueError("empty feature table")

    d = w.shape[0]
    for _ in range(iters):
        w_snap, b_snap = w.copy(), b.copy()

        def grad_part(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            loss, gw, gb, n = 0.0, np.zeros((d, N_CLASSES)), np.zeros(N_CLASSES), 0
            for pdf in pdfs:
                if not len(pdf):
                    continue
                f = np.array([np.asarray(x, dtype="float64") for x in pdf["feat"]])
                y = pdf["label"].to_numpy().astype("int64")
                pl, pgw, pgb = softmax_head_loss_and_grads(f, y, w_snap, b_snap)
                loss += pl
                gw += pgw
                gb += pgb
                n += len(y)
            yield pd.DataFrame(
                {"loss": [loss], "n": [n],
                 "g": [list(np.concatenate([gw.ravel(), gb]))]}
            )

        parts = data.mapInPandas(
            grad_part, "loss double, n long, g array<double>"
        ).collect()
        tot_loss = sum(r["loss"] for r in parts)
        tot_n = sum(r["n"] for r in parts)
        g = np.zeros(d * N_CLASSES + N_CLASSES)
        for r in parts:
            if r["n"]:
                g += np.asarray(r["g"])
        g /= tot_n
        w -= lr * g[: d * N_CLASSES].reshape(d, N_CLASSES)
        b -= lr * g[d * N_CLASSES :]
        if loss_history is not None:
            loss_history.append(tot_loss / tot_n)
    data.unpersist()

    arrays["head_w"] = w.astype("float32")
    arrays["head_b"] = b.astype("float32")
    np.savez(out_path, **arrays)
    return out_path if out_path.endswith(".npz") else out_path + ".npz"
