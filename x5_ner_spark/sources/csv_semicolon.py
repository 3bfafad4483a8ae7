"""S1/S3/S4: the reference's ;-separated CSV dataset format.

- read_submission: ``sample;annotation`` with a fixed schema (no separator
  sniffing — S2 is intentionally NOT replicated; schema drift is a job
  killer at scale, SURVEY.md §2.1);
- decode: stringified Python span list → array<struct> (exact ``ast``
  fault-tolerance via the Arrow UDF; malformed rows → []);
- write_submission: byte-exact reference serialization per row.

Parity targets: ner/dataset.py:12-34, scripts/make_submission_from_val.py:75-77.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.span_udfs import parse_annotation_udf, serialize_spans_udf

SUBMISSION_SCHEMA = "sample string, annotation string"


def read_submission(spark: SparkSession, path: str, text_col: str = "sample") -> DataFrame:
    """Read (sample;annotation) CSV; tolerates the reference's alternative
    'search_query' header by normalizing to 'sample' (thin rename at ingest,
    SURVEY.md §1.3)."""
    df = spark.read.option("sep", ";").option("header", True).csv(path)
    if "search_query" in df.columns and "sample" not in df.columns:
        df = df.withColumnRenamed("search_query", "sample")
    if "annotation" not in df.columns:
        df = df.withColumn("annotation", F.lit(None).cast("string"))
    return df.select(
        F.col("sample").cast("string").alias("sample"),
        F.col("annotation").cast("string").alias("annotation"),
    )


def decode_annotations(df: DataFrame, ann_col: str = "annotation") -> DataFrame:
    """S3: stringified list → spans array (errors degrade to [])."""
    return df.withColumn("spans", parse_annotation_udf(F.col(ann_col)))


def write_submission(df: DataFrame, path: str, spans_col: str = "spans") -> None:
    """S4: serialize spans byte-exactly and write one ;-CSV."""
    out = df.select(
        F.col("sample"), serialize_spans_udf(F.col(spans_col)).alias("annotation")
    )
    out.coalesce(1).write.mode("overwrite").option("sep", ";").option(
        "header", True
    ).csv(path)
