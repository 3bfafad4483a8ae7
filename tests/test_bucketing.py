"""Bucketed co-located join: result correctness + NO Exchange in the plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from x5_ner_spark.pipeline import bucketing
from x5_ner_spark.plans import executed_plan


def test_bucketed_join_no_shuffle(spark, tmp_path):
    # warehouse.dir is static; the default spark-warehouse under cwd is fine
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.range(2000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("va"))
        b = spark.range(1500).select(F.col("id").alias("k"), (F.col("id") * 3).alias("vb"))
        bucketing.write_bucketed(a, "bt_a", "k", n_buckets=4)
        bucketing.write_bucketed(b, "bt_b", "k", n_buckets=4)
        j = bucketing.bucketed_join(spark, "bt_a", "bt_b", "k")
        assert j.count() == 1500
        assert j.filter(F.col("va") != F.col("k") * 2).count() == 0
        plan = executed_plan(j)
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS bt_a")
        spark.sql("DROP TABLE IF EXISTS bt_b")
