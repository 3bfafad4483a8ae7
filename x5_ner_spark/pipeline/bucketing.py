"""Bucketed-table helpers: co-located joins without a shuffle.

At 100 TB the pages/triples/nodes tables are re-joined on the same keys
across many jobs; bucketing them once (`bucketBy(n, key).sortBy(key)`)
lets every subsequent equi-join skip both Exchanges (verified by the plan
assertion in tests/test_bucketing.py). On Iceberg the same effect comes from
`bucket(n, key)` partition transforms + storage-partitioned joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table: str, key: str, n_buckets: int = 8, sort: bool = True
) -> None:
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables; with matching bucket specs Catalyst
    plans a SortMergeJoin with ZERO Exchange operators."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
