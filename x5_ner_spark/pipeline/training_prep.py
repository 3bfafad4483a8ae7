"""Training-shard preparation job (SURVEY.md §3.3's Spark analog).

read annotated rows → decode spans → align to token BIO → optional
deterministic augmentation → write shards. The torch training loop itself
stays OUTSIDE the engine (N4); this job feeds it.

Augmentation (N5, ref train.py:121-190 classes): length-preserving noise —
keyboard-neighbor substitution, ё/е homoglyph, space↔punct — seeded per row
from a hash of the text, so shards are byte-reproducible.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..core.alignment import align_text
from ..operators.span_udfs import SPAN_ARRAY, _rows_to_tuples
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

_KEYBOARD_NEIGHBORS = {
    "а": "вы", "о": "лр", "е": "ку", "и": "мс", "с": "ив", "м": "ис",
    "a": "sq", "o": "ip", "e": "wr", "i": "uo", "s": "ad", "t": "ry",
}

TOKEN_LABELS_TYPE = ArrayType(StringType())


def _augment(text: str, p: float = 0.3) -> str:
    """Length-preserving noise, deterministic in the text itself."""
    h = hashlib.md5(text.encode("utf-8")).digest()
    out = list(text)
    for i, ch in enumerate(out):
        r = h[i % len(h)] / 255.0
        if r < p:
            low = ch.lower()
            if low == "ё":
                out[i] = "е" if ch.islower() else "Е"
            elif low in _KEYBOARD_NEIGHBORS:
                nbrs = _KEYBOARD_NEIGHBORS[low]
                out[i] = nbrs[h[(i + 7) % len(h)] % len(nbrs)]
    return "".join(out)


@pandas_udf(TOKEN_LABELS_TYPE)
def bio_labels_udf(cols: Iterator[tuple[pd.Series, pd.Series]]) -> Iterator[pd.Series]:
    """(text, spans) → token-level BIO label sequence (word tokenizer)."""
    for text_s, spans_s in cols:
        out = []
        for t, spans in zip(text_s, spans_s):
            out.append([lab for _, _, lab in align_text(t or "", _rows_to_tuples(spans))])
        yield pd.Series(out)


@pandas_udf(StringType())
def augment_udf(texts: Iterator[pd.Series]) -> Iterator[pd.Series]:
    for batch in texts:
        yield batch.map(lambda t: _augment(t) if t else t)


def run(annotated: DataFrame, augment: bool = False) -> DataFrame:
    """annotated(sample, spans) → + token label sequence (+ augmented text).
    The whole job is two Arrow stages and zero shuffles."""
    out = annotated.withColumn("bio_labels", bio_labels_udf(F.col("sample"), F.col("spans")))
    if augment:
        out = out.withColumn("sample_aug", augment_udf(F.col("sample")))
    return out
