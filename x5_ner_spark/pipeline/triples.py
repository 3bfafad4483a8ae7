"""Stage 3 — open-pattern triple extraction.

(url, text, spans) → (subj, pred, obj, url). BIO merge + predicate mapping
happen inside the Arrow UDF (same pure function as the oracle); the explode
and projection are native so Catalyst can prune/push around them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.span_udfs import triples_udf


def run(mentions: DataFrame, subj_col: str = "url") -> DataFrame:
    t = mentions.select(
        F.col(subj_col).alias("url"),
        F.explode(triples_udf(F.col("text"), F.col("spans"))).alias("tr"),
    )
    return t.select(
        F.col("url").alias("subj"),
        F.col("tr.pred").alias("pred"),
        F.col("tr.obj").alias("obj"),
        F.col("url"),
    )
