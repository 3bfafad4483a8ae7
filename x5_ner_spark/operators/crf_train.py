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
