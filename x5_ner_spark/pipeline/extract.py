"""Stage 1 — HTML → text extraction.

Per-row invariant (BASELINE.json): byte-identical extracted text per url —
guaranteed because the UDF calls the same pure function as the oracle
(core/html_text.extract_text).

Scale notes: the only column read besides ``html`` is ``url`` (Catalyst
prunes the rest); rows whose ``text`` is already populated skip the UDF via
``F.when`` so re-runs are cheap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.span_udfs import extract_text_udf


def run(pages: DataFrame) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) → same schema with text filled."""
    need = (F.col("text").isNull()) | (F.length("text") == 0)
    return pages.withColumn(
        "text", F.when(need, extract_text_udf(F.col("html"))).otherwise(F.col("text"))
    )
