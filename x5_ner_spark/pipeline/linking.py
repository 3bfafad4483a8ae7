"""Stage 5 — vectorized entity-link scoring.

Pure Column arithmetic (whole-stage codegen; zero Python): score =
prior − 0.25·distance + exact bonus; winner per (mention, pred) via a
row_number window partitioned on the mention key — one shuffle on a key
whose cardinality is |distinct mentions|, far below |pages|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def run(candidates: DataFrame) -> DataFrame:
    scored = candidates.withColumn(
        "score",
        F.col("prior")
        - 0.25 * F.col("distance")
        + F.when(F.col("match_kind") == "exact", F.lit(0.5)).otherwise(F.lit(0.0)),
    )
    w = Window.partitionBy("mention_norm", "pred").orderBy(
        F.desc("score"), F.asc("entity_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") == 1)
        .drop("rank")
    )
