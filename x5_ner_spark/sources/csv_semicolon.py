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


def sniff_separator(
    spark: SparkSession, path: str, candidates: tuple[str, ...] = (";", "\t", ","),
) -> str:
    """S2 robust-scan separator detection (ref scripts/make_submission.py:12-23,
    scripts/split_train_val.py:10-18). The reference tries ';','\\t',',' and
    accepts the first parse with ≥1 column — which a WRONG separator also
    satisfies (a comma file parsed with ';' is one wide column), so its loop
    effectively always returns the ';' parse unless pandas raises. Deviation
    (documented): we pick the candidate with the highest CONSISTENT per-line
    occurrence over a 10-line sample, tie-broken by the reference's
    preference order — same intent, actually discriminating. Driver-side
    head sample only; the full scan stays one distributed CSV read.

    Sampling is pinned to a SINGLE file: for a multi-file path the rows of a
    bare limit() are arbitrary, so the sample is restricted to the
    lexicographically-first file seen (consistent across runs). Blank and
    short (<2 char) lines — e.g. a trailing newline fragment — are skipped
    before the per-line min, so one stub line can't zero out the true
    separator's count. The chosen separator is logged."""
    import logging

    rows = (
        spark.read.text(path)
        .select("value", F.input_file_name().alias("_f"))
        .limit(200)
        .collect()
    )
    lines: list[str] = []
    if rows:
        first_file = min(r["_f"] for r in rows)
        lines = [
            r["value"] for r in rows
            if r["_f"] == first_file and len(r["value"].strip()) >= 2
        ][:10]
    best, best_n = candidates[0], 0
    for sep in candidates:
        n = min((ln.count(sep) for ln in lines), default=0)
        if n > best_n:
            best, best_n = sep, n
    logging.getLogger(__name__).info(
        "sniff_separator(%s): chose %r (min per-line count %d over %d lines)",
        path, best, best_n, len(lines),
    )
    return best


def read_any_csv(spark: SparkSession, path: str) -> DataFrame:
    """Sniff the separator, then one ordinary distributed CSV scan."""
    sep = sniff_separator(spark, path)
    return spark.read.option("sep", sep).option("header", True).csv(path)
