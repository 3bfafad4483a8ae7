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


def teacher_sequences(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc table) → per-document (tokens, conts, tags) sequence rows, tags
    from the pinned stub model's argmax — the sequence-level teacher for
    CRF training. Map-only."""

    def gen(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..core.numeric import tokenize_with_offsets
        from ..core.stub_model import batch_probabilities
        from ..core.textnorm import norm_token_simple

        for pdf in pdfs:
            toks_col, conts_col, tags_col = [], [], []
            for t in pdf[text_col]:
                if not isinstance(t, str) or not t.strip():
                    continue
                toks = tokenize_with_offsets(t)
                if not toks:
                    continue
                keys = [(norm_token_simple(w), i > 0) for i, (w, _, _) in enumerate(toks)]
                tags = batch_probabilities(keys).argmax(axis=1)
                toks_col.append([k[0] for k in keys])
                conts_col.append([k[1] for k in keys])
                tags_col.append([int(x) for x in tags])
            yield pd.DataFrame(
                {"tokens": toks_col, "conts": conts_col, "tags": tags_col}
            )

    return docs.select(text_col).mapInPandas(
        gen, "tokens array<string>, conts array<boolean>, tags array<long>"
    )


_CRF_KEYS = ("w1", "b1", "w2", "b2", "start", "trans", "end")


def fit_crf_npz(
    seqs: DataFrame,
    out_path: str,
    n_features: int = 256,
    hidden: int = 32,
    iters: int = 30,
    lr: float = 0.5,
    seed: int = 7,
    loss_history: list | None = None,
) -> str:
    """JOINT gradient training of the emission MLP and the linear-chain CRF
    (start/trans/end) by exact NLL — the full analog of the reference's
    encoder+CRF training loop (ner/train.py:31-62), distributed the same
    way as :func:`fit_npz_emission`: per-partition (nll, gradient) sums via
    mapInPandas (forward-backward per sequence, chain rule through the MLP
    via core.emission.mlp_backward), driver update, weights rebroadcast by
    closure. Saves an npz holding BOTH the provider weights and the CRF
    parameters (load via :func:`load_crf_params_npz` for
    ``crf_mention_spans_batch``)."""
    from ..core.crf import crf_nll_and_grads
    from ..core.spans import BIO_TAGS

    c = len(BIO_TAGS)
    params = E.init_mlp_params(n_features, hidden, seed)
    params["start"] = np.zeros(c)
    params["trans"] = np.zeros((c, c))
    params["end"] = np.zeros(c)

    data = seqs.select("tokens", "conts", "tags").persist()
    n_seqs = data.count()
    if n_seqs == 0:
        data.unpersist()
        raise ValueError("empty training set")

    sizes = {k: params[k].size for k in _CRF_KEYS}

    def flatten(g: dict) -> np.ndarray:
        return np.concatenate([np.asarray(g[k]).ravel() for k in _CRF_KEYS])

    for _ in range(iters):
        snapshot = {k: (v.copy() if hasattr(v, "copy") else v) for k, v in params.items()}

        def grad_part(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            tot_loss, tot_n, acc = 0.0, 0, None
            for pdf in pdfs:
                for tokens, conts, tags in zip(pdf["tokens"], pdf["conts"], pdf["tags"]):
                    keys = [(str(t), bool(ct)) for t, ct in zip(tokens, conts)]
                    if not keys:
                        continue
                    x = E.featurize_batch(keys, snapshot["n_features"])
                    h_pre, h, logits = E.mlp_forward(snapshot, x)
                    nll, g = crf_nll_and_grads(
                        logits, np.asarray(tags, dtype="int64"),
                        snapshot["start"], snapshot["trans"], snapshot["end"],
                    )
                    mg = E.mlp_backward(snapshot, x, h_pre, h, g["emissions"])
                    vec = flatten({**mg, "start": g["start"],
                                   "trans": g["trans"], "end": g["end"]})
                    acc = vec if acc is None else acc + vec
                    tot_loss += nll
                    tot_n += len(keys)  # token count: the normalization unit
            if acc is not None:
                from pyspark import TaskContext

                yield pd.DataFrame({
                    "pid": [TaskContext.get().partitionId()],
                    "n": [tot_n], "loss": [tot_loss], "grad": [acc.tolist()],
                })

        rows = data.mapInPandas(grad_part, _GRAD_SCHEMA).collect()
        rows.sort(key=lambda r: r["pid"])
        g = np.zeros(sum(sizes.values()))
        loss_sum = 0.0
        n_tokens = 0
        for r in rows:
            g += np.asarray(r["grad"])
            loss_sum += r["loss"]
            n_tokens += r["n"]
        # per-TOKEN normalization: sequence lengths vary, so per-sequence
        # averaging would scale the effective step with document length
        g /= max(n_tokens, 1)
        if loss_history is not None:
            loss_history.append(loss_sum / max(n_tokens, 1))
        off = 0
        for k in _CRF_KEYS:
            params[k] = params[k] - lr * g[off : off + sizes[k]].reshape(params[k].shape)
            off += sizes[k]
    data.unpersist()

    np.savez(
        out_path,
        w1=params["w1"].astype("float32"), b1=params["b1"].astype("float32"),
        w2=params["w2"].astype("float32"), b2=params["b2"].astype("float32"),
        n_features=np.array(params["n_features"], dtype="int64"),
        seed=np.array(-1, dtype="int64"),
        crf_start=params["start"], crf_trans=params["trans"], crf_end=params["end"],
    )
    # np.savez appends '.npz' when missing - return the ACTUAL file path
    return out_path if out_path.endswith(".npz") else out_path + ".npz"


def load_crf_params_npz(path: str):
    """(start, trans, end) from a fit_crf_npz checkpoint — the tuple
    ``crf_mention_spans_batch`` / ``viterbi_decode_batch`` consume."""
    with np.load(path) as z:
        return z["crf_start"], z["crf_trans"], z["crf_end"]


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
