"""Stage 7 — graph materialization with per-partition lineage manifests and
checkpoint-resume (north rule).

Sandbox storage is partitioned parquet with an explicit ``part_id`` bucket
column; on a real cluster the same code targets Iceberg
(``df.writeTo(table).append()``) — the manifest/resume logic is identical
because it keys on (stage, part_id), not on the file layout.

Resume contract: each completed bucket writes one manifest row
(stage, part_id, n_rows, min/max key, wall_s, run_id). ``pending_parts``
anti-joins the manifest — a restarted job processes only missing buckets.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_SCHEMA = (
    "stage string, part_id int, n_rows long, min_key string, max_key string, "
    "wall_s double, run_id string"
)


def with_bucket(df: DataFrame, key: str, n_buckets: int) -> DataFrame:
    """Deterministic bucket column (xxhash64 → non-negative mod)."""
    return df.withColumn(
        "part_id", (F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets))).cast("int")
    )


def manifest_path(root: str) -> str:
    return os.path.join(root, "_manifests")


def read_manifest(spark: SparkSession, root: str, stage: str) -> DataFrame:
    p = manifest_path(root)
    try:
        m = spark.read.schema(MANIFEST_SCHEMA).parquet(p)
    except Exception:
        return spark.createDataFrame([], MANIFEST_SCHEMA)
    return m.filter(F.col("stage") == stage)


def pending_parts(spark: SparkSession, root: str, stage: str, n_buckets: int) -> list[int]:
    done = {r.part_id for r in read_manifest(spark, root, stage).select("part_id").collect()}
    return [p for p in range(n_buckets) if p not in done]


def write_stage(
    df: DataFrame,
    root: str,
    stage: str,
    key: str,
    n_buckets: int = 8,
    run_id: str = "run0",
    resume: bool = True,
) -> list[int]:
    """Write ``df`` bucketed by ``key`` into root/stage/part_id=*/ with one
    manifest row per completed bucket. Returns the bucket ids written.

    Buckets are written via partitionBy (one pass over the data); manifests
    are derived from the written output so a manifest row EXISTS only if its
    bucket landed completely (write-then-commit ordering).
    """
    spark = df.sparkSession
    todo = pending_parts(spark, root, stage, n_buckets) if resume else list(range(n_buckets))
    if not todo:
        return []
    # crash-consistency: a bucket dir without a manifest row means a prior
    # run died mid-write — clear it before re-appending (on Iceberg this is
    # a table-commit rollback; on the filesystem it's a directory delete)
    import shutil

    for p in todo:
        part_dir = os.path.join(root, stage, f"part_id={p}")
        if os.path.isdir(part_dir):
            shutil.rmtree(part_dir, ignore_errors=True)
    t0 = time.time()
    bucketed = with_bucket(df, key, n_buckets).filter(F.col("part_id").isin(todo))
    out_path = os.path.join(root, stage)
    bucketed.write.mode("append").partitionBy("part_id").parquet(out_path)

    written = spark.read.parquet(out_path).filter(F.col("part_id").isin(todo))
    wall = time.time() - t0
    stats = written.groupBy("part_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min(F.col(key).cast("string")).alias("min_key"),
        F.max(F.col(key).cast("string")).alias("max_key"),
    )
    manifest = stats.select(
        F.lit(stage).alias("stage"), "part_id", "n_rows", "min_key", "max_key",
        F.lit(float(wall)).alias("wall_s"), F.lit(run_id).alias("run_id"),
    )
    manifest.write.mode("append").parquet(manifest_path(root))
    return todo


def read_stage(spark: SparkSession, root: str, stage: str) -> DataFrame:
    return spark.read.parquet(os.path.join(root, stage))
