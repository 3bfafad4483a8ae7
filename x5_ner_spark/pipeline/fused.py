"""Fused linear path: pages → triples in ONE Arrow stage.

The staged path (extract.run → mentions.run → triples.run) chains three
ArrowEvalPython operators — each hop serializes the text column JVM↔Python.
For the throughput-dominated production path we fuse all per-document work
(HTML→text, mention detection, post-process, triple emission) into a single
``mapInPandas``: one Arrow transfer in, one out, same pure core functions —
so output is row-identical to the staged path (tests/test_fused.py).

The staged path remains the default for modularity and per-stage
checkpointing; the fused path is what bench/scaling and high-volume
ingestion use.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..core.html_text import extract_text
from ..core.mention_pipeline import final_mention_spans_batch, triples_from_spans

TRIPLES_SCHEMA = "subj string, pred string, obj string, url string"


def fused_triples(
    pages: DataFrame,
    brand_lexicon=frozenset(),
    balance: bool = True,
    num_partitions: int | None = None,
    emission_npz: str | None = None,
) -> DataFrame:
    """pages(url, html, text, ...) → (subj, pred, obj, url).

    ``emission_npz``: optional weights-on-disk emission checkpoint
    (core/emission.py), loaded once per worker process — the production
    swap point for a real model inside this same fused stage."""
    cols = pages.select(
        "url",
        "html" if "html" in pages.columns else F.lit(None).cast("binary").alias("html"),
        F.col("text") if "text" in pages.columns else F.lit("").alias("text"),
    )
    if balance:
        n = num_partitions or int(
            pages.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
        cols = cols.repartitionByRange(
            n, F.greatest(F.length("text"), F.length("html")), "url"
        )
    lex_source = brand_lexicon

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        lex = lex_source.value if hasattr(lex_source, "value") else lex_source
        lex = frozenset(lex or [])
        lex_list = sorted(lex)
        provider = None
        if emission_npz is not None:
            from ..core.emission import provider_for

            provider = provider_for(emission_npz)
        for pdf in batches:
            urls, docs = [], []
            for url, html, text in zip(pdf["url"], pdf["html"], pdf["text"]):
                # same fallback predicate as extract.run: only null/empty
                # text triggers extraction (whitespace-only text stays as-is)
                t = text if isinstance(text, str) and len(text) > 0 else extract_text(html)
                if not t or not t.strip():
                    continue
                urls.append(url)
                docs.append(t)
            spans_per_doc = final_mention_spans_batch(
                docs, lex, lex_list, provider=provider
            )
            out: dict[str, list] = {"subj": [], "pred": [], "obj": [], "url": []}
            for url, t, spans in zip(urls, docs, spans_per_doc):
                for subj, pred, obj in triples_from_spans(url, t, spans):
                    out["subj"].append(subj)
                    out["pred"].append(pred)
                    out["obj"].append(obj)
                    out["url"].append(url)
            yield pd.DataFrame(out, columns=["subj", "pred", "obj", "url"])

    return cols.mapInPandas(gen, schema=TRIPLES_SCHEMA)
