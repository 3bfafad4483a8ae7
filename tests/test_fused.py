"""Fused single-Arrow-stage path must be row-identical to the staged path."""

from __future__ import annotations

from pyspark.sql import functions as F

from x5_ner_spark.pipeline import extract, fused, mentions, triples
from x5_ner_spark.pipeline.fixtures import BRANDS, pages_df


def test_fused_equals_staged(spark):
    pages = pages_df(spark, 200, sentences=3).cache()
    lex = list(BRANDS)
    staged = triples.run(
        mentions.run(extract.run(pages).select("url", "text"), lex, spark, balance=False)
    )
    fast = fused.fused_triples(pages, frozenset(lex), balance=False)
    a = sorted(tuple(r) for r in staged.collect())
    b = sorted(tuple(r) for r in fast.collect())
    assert a == b and len(a) > 0


def test_fused_edge_inputs(spark):
    rows = [
        ("u1", None, None, None),
        ("u2", b"", "", "ru"),
        ("u3", "<p>N</p>".encode(), "   ", "ru"),  # whitespace text stays as-is
        ("u4", "<p>X</p>".encode(), "", "ru"),
    ]
    df = spark.createDataFrame(rows, "url string, html binary, text string, lang string")
    out = fused.fused_triples(df, balance=False).collect()
    urls = {r["url"] for r in out}
    assert "u1" not in urls and "u2" not in urls and "u3" not in urls
