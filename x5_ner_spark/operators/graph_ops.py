"""Graph operators over the events table: co-occurrence edge derivation and
connected components (reusing the pipeline's large-star/small-star CC).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..pipeline.canonicalize import connected_components


def user_adjacency_edges(events: DataFrame) -> DataFrame:
    """Edges between consecutive users in time order within each event_type
    stream — a deterministic synthetic graph with hub skew (frequent users)."""
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    nxt = F.lead("user_id").over(w)
    return (
        events.select("event_type", "ts", "event_id", "user_id")
        .withColumn("dst", nxt)
        .filter(F.col("dst").isNotNull() & (F.col("dst") != F.col("user_id")))
        .select(F.col("user_id").alias("src"), F.col("dst"))
        .select(F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst"))
        .distinct()
    )


def user_components(events: DataFrame) -> DataFrame:
    edges = user_adjacency_edges(events)
    return connected_components(edges).orderBy("node")
