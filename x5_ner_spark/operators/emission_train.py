"""Distributed gradient training of the npz emission MLP (closes N4's
remaining half; ref analog ner/train.py:31-108 trains the token classifier
and saves a checkpoint the inference path loads).

Shape: full-batch gradient descent, the canonical MLlib pattern — per
iteration ONE Spark job computes per-partition (loss, gradient) sums inside
``mapInPandas`` (pure-numpy math shared with core/emission.py, so the
trained weights serve through the exact forward they were trained with);
the driver sums the handful of partition rows, applies the update, and the
next iteration broadcasts the new weights via closure capture. Gradient
state per partition is one flattened float64 array (~8.5k values at the
default sizes) — the shuffle-free aggregation that scales to any corpus
size, since gradient row count = partition count, not token count.

Labels come from any (token, cont, label_idx) table; ``teacher_labels``
builds one from the pinned stub model (argmax), giving a fully in-engine
train → checkpoint → load → infer loop that tests verify end to end.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..core import emission as E

_GRAD_SCHEMA = "pid int, n long, loss double, grad array<double>"


def _flatten(grads: dict) -> np.ndarray:
    return np.concatenate(
        [grads["w1"].ravel(), grads["b1"].ravel(),
         grads["w2"].ravel(), grads["b2"].ravel()]
    )


def _unflatten(vec: np.ndarray, params: dict) -> dict:
    out = {}
    off = 0
    for k in ("w1", "b1", "w2", "b2"):
        size = params[k].size
        out[k] = vec[off : off + size].reshape(params[k].shape)
        off += size
    return out


def teacher_labels(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc table) → (token, cont, label_idx) training rows labeled by the
    pinned stub model's argmax class — the deterministic teacher for the
    end-to-end demo. One map-only pass."""

    def gen(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..core.numeric import tokenize_with_offsets
        from ..core.stub_model import batch_probabilities
        from ..core.textnorm import norm_token_simple

        for pdf in pdfs:
            keys: list[tuple[str, bool]] = []
            for t in pdf[text_col]:
                if not isinstance(t, str) or not t.strip():
                    continue
                toks = tokenize_with_offsets(t)
                keys.extend(
                    (norm_token_simple(w), i > 0) for i, (w, _, _) in enumerate(toks)
                )
            if not keys:
                yield pd.DataFrame({"token": [], "cont": [], "label_idx": []})
                continue
            probs = batch_probabilities(keys)
            yield pd.DataFrame({
                "token": [k[0] for k in keys],
                "cont": [k[1] for k in keys],
                "label_idx": probs.argmax(axis=1).astype("int64"),
            })

    return docs.select(text_col).mapInPandas(
        gen, "token string, cont boolean, label_idx long"
    )


def fit_npz_emission(
    train: DataFrame,
    out_path: str,
    n_features: int = 256,
    hidden: int = 32,
    iters: int = 40,
    lr: float = 0.5,
    seed: int = 7,
    loss_history: list | None = None,
) -> str:
    """train(token, cont, label_idx) → gradient-descended weights saved at
    ``out_path`` (NpzMlpProvider layout). Deterministic given (data, seed):
    per-partition gradient sums are added in sorted partition order before
    the update. Returns the saved path."""
    params = E.init_mlp_params(n_features, hidden, seed)
    # materialize once: every iteration re-reads the same rows
    data = train.select("token", "cont", "label_idx").persist()
    n_total = data.count()
    if n_total == 0:
        data.unpersist()
        raise ValueError("empty training set")

    for _ in range(iters):
        snapshot = {k: (v.copy() if hasattr(v, "copy") else v) for k, v in params.items()}

        def grad_part(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            tot_loss, tot_n, acc = 0.0, 0, None
            for pdf in pdfs:
                if not len(pdf):
                    continue
                keys = list(zip(pdf["token"].astype(str), pdf["cont"].astype(bool)))
                x = E.featurize_batch(keys, snapshot["n_features"])
                y = pdf["label_idx"].to_numpy().astype("int64")
                loss, grads = E.mlp_loss_and_grads(snapshot, x, y)
                vec = _flatten(grads)
                acc = vec if acc is None else acc + vec
                tot_loss += loss
                tot_n += len(pdf)
            if acc is not None:
                from pyspark import TaskContext

                pid = TaskContext.get().partitionId()
                yield pd.DataFrame(
                    {"pid": [pid], "n": [tot_n], "loss": [tot_loss],
                     "grad": [acc.tolist()]}
                )

        rows = data.mapInPandas(grad_part, _GRAD_SCHEMA).collect()
        rows.sort(key=lambda r: r["pid"])  # deterministic sum order
        g = np.zeros(sum(params[k].size for k in ("w1", "b1", "w2", "b2")))
        loss_sum = 0.0
        for r in rows:
            g += np.asarray(r["grad"])
            loss_sum += r["loss"]
        g /= n_total
        if loss_history is not None:
            loss_history.append(loss_sum / n_total)
        grads = _unflatten(g, params)
        for k in ("w1", "b1", "w2", "b2"):
            params[k] = params[k] - lr * grads[k]
    data.unpersist()
    return E.save_params_npz(params, out_path)
