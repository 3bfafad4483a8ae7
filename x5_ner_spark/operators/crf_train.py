"""Distributed CRF transition estimation (N4-adjacent).

One aggregation job turns a labeled corpus (doc_id, tags: array<int>) into
the (start, trans, end) log-probability parameters ``core.crf.viterbi_decode``
consumes: bigram counts via a single posexplode + groupBy (map-side combine;
the count table is num_labels² rows, collected to the driver like any model
artifact). Gradient CRF training (torch NLL with the encoder, reference
train.py:52-62) stays out of engine scope — this is the closed-form
add-k-smoothed MLE over tag sequences, byte-equal to the pure-Python
``core.crf.mle_crf_params`` (differential-tested).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..core.spans import BIO_TAGS


def fit_crf_transitions(
    tagged: DataFrame, tags_col: str = "tags",
    num_labels: int = len(BIO_TAGS), smoothing: float = 1.0,
):
    """(doc_id, tags array<int>) → (start, trans, end) log-prob arrays."""
    seqs = tagged.filter(F.size(tags_col) > 0)
    bigrams = (
        seqs.select(
            F.explode(
                F.zip_with(
                    F.slice(tags_col, 1, F.size(tags_col) - 1),
                    F.slice(tags_col, 2, F.size(tags_col) - 1),
                    lambda a, b: F.struct(a.alias("a"), b.alias("b")),
                )
            ).alias("bg")
        )
        .groupBy("bg.a", "bg.b")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    firsts = (
        seqs.groupBy(F.element_at(tags_col, 1).alias("t"))
        .agg(F.count(F.lit(1)).alias("n")).collect()
    )
    lasts = (
        seqs.groupBy(F.element_at(tags_col, -1).alias("t"))
        .agg(F.count(F.lit(1)).alias("n")).collect()
    )
    start_c = np.full(num_labels, smoothing)
    end_c = np.full(num_labels, smoothing)
    trans_c = np.full((num_labels, num_labels), smoothing)
    for r in firsts:
        start_c[int(r["t"])] += r["n"]
    for r in lasts:
        end_c[int(r["t"])] += r["n"]
    for r in bigrams:
        trans_c[int(r["a"]), int(r["b"])] += r["n"]
    start = np.log(start_c / start_c.sum())
    end = np.log(end_c / end_c.sum())
    trans = np.log(trans_c / trans_c.sum(axis=1, keepdims=True))
    return start, trans, end


CRF_DECODE_SCHEMA = "doc_id long, wid int, token_text string, label string"


def crf_decode_tokens(
    docs: DataFrame,
    t_max: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Distributed Viterbi decode (N3/N4 decode surface, ref
    infer.py:186-189): per document, the first ``t_max`` word tokens go
    through the pinned stub emission model (softmax rows — the same
    md5→LCG→softmax surface the decision-log oracle replays) and the
    hash-derived stub CRF transitions (core/crf.stub_crf_params), and the
    arg-max label PATH comes out as one row per decoded word.

    ``t_max`` bounds the decode window — the knob that makes the DP
    expressible in the DuckDB oracle (unrolled bounded-T Viterbi) while the
    engine path itself is unbounded (viterbi_decode_batch pads per
    micro-batch). Map-only over the documents scan: no shuffle; emissions
    and the DP never leave the Arrow worker — at corpus scale this is the
    same linear shape as mention detection."""
    import pandas as pd

    from ..core.crf import stub_crf_params, viterbi_decode_batch
    from ..core.numeric import tokenize_with_offsets
    from ..core.spans import BIO_TAGS as TAGS
    from ..core.stub_model import batch_probabilities
    from ..core.textnorm import norm_token_simple

    start, trans, end = stub_crf_params()

    def gen(pdfs):
        for pdf in pdfs:
            ids, toks_per_doc, ems = [], [], []
            for did, text in zip(pdf["_id"], pdf["_text"]):
                toks = tokenize_with_offsets("" if text is None else text)[:t_max]
                if not toks:
                    continue
                keys = [
                    (norm_token_simple(w), i > 0)
                    for i, (w, _, _) in enumerate(toks)
                ]
                ids.append(did)
                toks_per_doc.append(toks)
                ems.append(batch_probabilities(keys))
            paths = viterbi_decode_batch(ems, start, trans, end)
            rows = []
            for did, toks, path in zip(ids, toks_per_doc, paths):
                for wid, ((w, _, _), lab) in enumerate(zip(toks, path)):
                    rows.append((did, wid, w, TAGS[lab]))
            yield pd.DataFrame(
                rows, columns=["doc_id", "wid", "token_text", "label"]
            )

    keyed = docs.select(
        F.col(id_col).cast("long").alias("_id"), F.col(text_col).alias("_text")
    )
    return keyed.mapInPandas(gen, CRF_DECODE_SCHEMA)
