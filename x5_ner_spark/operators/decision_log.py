"""S8 proper: the per-word decision-log sink.

One output row per DECIDED word — token, final BIO label, the cascade reason
code, the six probabilities and five feature flags of the reference's debug
log (ner/infer.py:411-413; column set of
scripts/make_submission_from_val.py:85-107). Runs the SAME shared-core
cascade as mention detection (core/cascade.decide_word_labels with log
capture), exploded via mapInPandas — so label/reason parity with the span
path is by construction, and the short-word break/row-skip semantics are the
reference's.

Scale shape: map-only over the documents scan (no shuffle); output is
~tokens-per-doc × docs rows, written partitioned like any fact table.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..core.mention_pipeline import final_mention_spans_batch

LOG_COLUMNS = [
    "doc_id", "token_text", "start", "end", "label", "reason",
    "p_brand", "p_type", "in_lex", "fuzzy_hit", "pure_lat", "short_lat",
    "has_vowel", "p_brand_sum", "p_type_sum", "p_o",
]
LOG_SCHEMA = (
    "doc_id long, token_text string, start int, end int, label string, "
    "reason string, p_brand double, p_type double, in_lex boolean, "
    "fuzzy_hit boolean, pure_lat boolean, short_lat boolean, "
    "has_vowel boolean, p_brand_sum double, p_type_sum double, p_o double"
)


def decision_log(
    docs: DataFrame,
    brand_lexicon=frozenset(),
    id_col: str = "doc_id",
    text_col: str = "text",
    emission_npz: str | None = None,
    decode: str = "cascade",
    long_doc: str = "truncate",
    chunk_stride: int | None = None,
) -> DataFrame:
    """(id, text) table → per-word decision-log rows. ``brand_lexicon`` may
    be a frozenset or a ``sparkContext.broadcast`` handle. ``emission_npz``
    swaps the emission model for a weights-on-disk checkpoint
    (core/emission.py) so the log reflects the DEPLOYED model's
    probabilities, consistent with make_mentions_udf / fused_triples.

    ``decode='crf'`` logs the Viterbi decoder instead of the rule cascade
    (VERDICT r7 #6): same schema, ``reason='crf_viterbi'``, lexicon flags
    honest-False (Viterbi consults no lexicon — the lexicon arg is unused
    there). ``long_doc='windowed'`` + ``chunk_stride`` apply the chunked
    long-document wrapper to sequence-level checkpoints, as in
    fused_triples (core/chunked.py)."""
    if decode not in ("cascade", "crf"):
        raise ValueError(f"decode must be 'cascade' or 'crf', got {decode!r}")
    lex_handle = brand_lexicon

    def gen(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        lex = lex_handle.value if hasattr(lex_handle, "value") else lex_handle
        lex = frozenset(lex)
        lex_list = sorted(lex)
        provider = None
        if emission_npz is not None:
            from ..core.chunked import maybe_chunked
            from ..core.emission import provider_for

            provider = maybe_chunked(
                provider_for(emission_npz), long_doc, chunk_stride
            )
        for pdf in pdfs:
            texts = ["" if t is None else t for t in pdf["_log_text"]]
            logs: list[list[dict]] = []
            if decode == "crf":
                from ..core.mention_pipeline import crf_mention_spans_batch

                crf_mention_spans_batch(texts, provider=provider, logs=logs)
            else:
                final_mention_spans_batch(texts, lex, lex_list, logs=logs,
                                          provider=provider)
            rows = []
            for did, recs in zip(pdf["_log_id"], logs):
                for r in recs:
                    rows.append((
                        did, r["token_text"], r["start"], r["end"], r["label"],
                        r["reason"], r["p_brand"], r["p_type"], r["in_lex"],
                        r["fuzzy_hit"], r["pure_lat"], r["short_lat"],
                        r["has_vowel"], r["p_brand_sum"], r["p_type_sum"],
                        r["p_o"],
                    ))
            yield pd.DataFrame(rows, columns=LOG_COLUMNS)

    keyed = docs.select(
        F.col(id_col).cast("long").alias("_log_id"),
        F.col(text_col).alias("_log_text"),
    )
    return keyed.mapInPandas(gen, LOG_SCHEMA)


def write_decision_log_csv(log: DataFrame, path: str, error_col: str | None = None) -> None:
    """Write the log as the reference's ;-CSV artifact
    (make_submission_from_val.py:85-107: 17 data columns incl. 'error', plus
    a leading positional index from pandas' to_csv(index=True) — replicated
    here as a row number in EMISSION order: (doc_id, start, end) when the
    log carries doc_id — numeric, so doc 10 sorts after doc 2, matching the
    reference's pandas index — else (text, start, end); bools/floats
    serialized to the reference's literal forms). Round-trip tested against
    core ``serialize_log_row`` lines (tests/test_decision_log.py)."""
    from pyspark.sql import Window, functions as F

    cols = [
        "text", "token_text", "start", "end", "label", "reason", "p_brand",
        "p_type", "in_lex", "fuzzy_hit", "pure_lat", "short_lat", "has_vowel",
        "p_brand_sum", "p_type_sum", "p_o", "error",
    ]
    df = log
    order_first = F.col("doc_id") if "doc_id" in df.columns else F.col("text")
    if "text" not in df.columns:
        df = df.withColumn("text", F.col("doc_id").cast("string"))
    if "error" not in df.columns:
        df = df.withColumn(
            "error", F.col(error_col).cast("string") if error_col else F.lit("0")
        )
    for b in ("in_lex", "fuzzy_hit", "pure_lat", "short_lat", "has_vowel"):
        df = df.withColumn(b, F.when(F.col(b), "True").otherwise("False"))
    for p in ("p_brand", "p_type", "p_brand_sum", "p_type_sum", "p_o"):
        df = df.withColumn(p, F.format_number(F.col(p).cast("double"), 3))
    w = Window.orderBy(order_first, "start", "end")
    out = df.withColumn("", F.row_number().over(w) - 1).select("", *cols)
    out.coalesce(1).write.mode("overwrite").option("sep", ";").option(
        "header", True
    ).csv(path)
