"""A8/A7: subtoken → word aggregation as a distributed DataFrame job.

Parity target: ner/infer.py:192-221 — per word: span = (min ts, max te),
probabilities = element-wise MEAN of the subtoken softmax rows. The UDF path
does this in numpy inside mention detection; this operator is the exploded
relational form for training-data / analysis jobs over subtoken tables
(doc_id, word_id, ts, te, probs: array<double>).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def aggregate_subtokens(subtoks: DataFrame, n_classes: int = 9) -> DataFrame:
    """groupBy (doc_id, word_id): span bounds + element-wise mean of the
    probs arrays — native only: posexplode the array, avg per class index,
    re-assemble with array(). One shuffle on (doc, word)."""
    exploded = subtoks.select(
        "doc_id", "word_id", "ts", "te", F.posexplode("probs").alias("ci", "p")
    )
    per_class = exploded.groupBy("doc_id", "word_id", "ci").agg(
        F.avg("p").alias("p_mean"),
        F.min("ts").alias("ws"),
        F.max("te").alias("we"),
    )
    return (
        per_class.groupBy("doc_id", "word_id")
        .agg(
            F.min("ws").alias("ws"),
            F.max("we").alias("we"),
            F.array_sort(
                F.collect_list(F.struct(F.col("ci"), F.col("p_mean")))
            ).alias("_cp"),
        )
        .withColumn("word_probs", F.transform("_cp", lambda s: s["p_mean"]))
        .drop("_cp")
    )
