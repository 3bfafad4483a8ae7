"""Arrow-vectorized UDFs for span extraction / post-processing / triples.

These wrap the pure functions in ``x5_ner_spark.core`` — the same code the
pytest oracle runs — so Spark output is byte-identical to the oracle by
construction. All UDFs are iterator-style ``pandas_udf`` (one Python-worker
setup per partition, Arrow batch transfer; ref lifecycle SURVEY.md §3.1).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from ..core.html_text import extract_text
from ..core.mention_pipeline import (
    detect_mention_spans,
    final_mention_spans,
    triples_from_spans,
)
from ..core.numeric import numeric_spans
from ..core.postprocess import postprocess
from ..core.spans import bio_to_entities, parse_annotation, serialize_spans

SPAN_STRUCT = StructType(
    [
        StructField("start", IntegerType(), False),
        StructField("end", IntegerType(), False),
        StructField("tag", StringType(), False),
    ]
)
SPAN_ARRAY = ArrayType(SPAN_STRUCT)

TRIPLE_STRUCT = StructType(
    [StructField("pred", StringType(), False), StructField("obj", StringType(), False)]
)
TRIPLE_ARRAY = ArrayType(TRIPLE_STRUCT)


def _spans_to_rows(spans) -> list[tuple[int, int, str]]:
    return [(int(s), int(e), str(t)) for s, e, t in spans]


def _rows_to_tuples(rows) -> list[tuple[int, int, str]]:
    """Arrow hands array<struct> cells over as numpy arrays of dicts (when
    read from storage) or tuples (when produced by an upstream pandas UDF in
    the same plan); never truth-test the array itself."""
    if rows is None:
        return []
    out = []
    for r in rows:
        if isinstance(r, dict):
            out.append((int(r["start"]), int(r["end"]), str(r["tag"])))
        else:
            s, e, t = r
            out.append((int(s), int(e), str(t)))
    return out


@pandas_udf(StringType())
def extract_text_udf(html: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """html binary → text (pure, pinned; core/html_text.py)."""
    for batch in html:
        yield batch.map(extract_text)


@pandas_udf(SPAN_ARRAY)
def numeric_spans_udf(texts: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """Numeric preprocessor spans (ref preprocess_query semantics)."""
    for batch in texts:
        yield batch.map(lambda t: _spans_to_rows(numeric_spans(t)) if t else [])


def make_mentions_udf(
    brand_lexicon=frozenset(), *, postprocessed: bool = True, decode: str = "cascade",
    emission_npz: str | None = None, long_doc: str = "truncate",
    chunk_stride: int | None = None,
):
    """Mention-detection UDF factory. ``brand_lexicon`` may be a frozenset or
    a ``sparkContext.broadcast`` handle (unwrapped lazily on the executor).

    ``decode='crf'`` selects the flag-gated CRF Viterbi path (batched decode
    over the deterministic stub transition matrix; core/crf.py) instead of
    the probability cascade — opt-in because the reference itself computes
    and then discards the Viterbi path in inference (infer.py:189).

    ``emission_npz`` swaps the emission model for a weights-on-disk numpy
    checkpoint (core/emission.py), loaded ONCE per Python worker process via
    ``provider_for`` — the engine's analog of the reference's checkpoint load
    (infer.py:141-147). Honored by the batched cascade (default) AND the CRF
    path (emissions = log of the provider's per-word probability rows);
    None = the pinned stub.

    ``long_doc='windowed'`` lifts the sequence-level providers' max_len
    truncation (ref infer.py:165-171) via chunked inference — overlapping
    ``chunk_stride``-piece windows with most-interior overlap resolution
    (core/chunked.py). 'truncate' (default) is the reference's pinned
    behavior; word-level providers are unaffected by either.

    The heavy state (sorted lexicon list) is materialized ONCE per Python
    worker per partition via the iterator form — the Spark analog of the
    reference's lazy model singleton (service/app.py:20-34)."""

    from ..core.mention_pipeline import crf_mention_spans_batch, final_mention_spans_batch

    @pandas_udf(SPAN_ARRAY)
    def mentions(texts: Iterator[pd.Series]) -> Iterator[pd.Series]:
        lex = brand_lexicon.value if hasattr(brand_lexicon, "value") else brand_lexicon
        lex = frozenset(lex)
        lex_list = sorted(lex)
        provider = None
        if emission_npz is not None:
            from ..core.chunked import maybe_chunked
            from ..core.emission import provider_for

            provider = maybe_chunked(
                provider_for(emission_npz), long_doc, chunk_stride
            )
        for batch in texts:
            if decode == "crf":
                spans = crf_mention_spans_batch(
                    ["" if t is None else t for t in batch], provider=provider
                )
                yield pd.Series([_spans_to_rows(s) for s in spans])
            elif postprocessed:
                # batched N3 shape: one vectorized model call per micro-batch
                # of words across the whole Arrow batch
                spans = final_mention_spans_batch(
                    ["" if t is None else t for t in batch], lex, lex_list,
                    provider=provider,
                )
                yield pd.Series([_spans_to_rows(s) for s in spans])
            else:
                yield batch.map(
                    lambda t: _spans_to_rows(detect_mention_spans(t, lex, lex_list))
                    if t
                    else []
                )

    return mentions


@pandas_udf(SPAN_ARRAY)
def postprocess_udf(
    texts: Iterator[tuple[pd.Series, pd.Series]],
) -> Iterator[pd.Series]:
    """(text, raw spans) → post-processed spans. Input spans are rows of
    struct(start, end, tag)."""
    for text_s, spans_s in texts:
        out = []
        for t, spans in zip(text_s, spans_s):
            out.append(_spans_to_rows(postprocess(t or "", _rows_to_tuples(spans))))
        yield pd.Series(out)


@pandas_udf(SPAN_ARRAY)
def bio_merge_udf(spans_col: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """BIO chain merge within a row (ner/utils.py:31-80 semantics). The
    cross-row/window variant lives in operators/windows.py (W2)."""
    for spans_s in spans_col:
        yield spans_s.map(lambda spans: _spans_to_rows(bio_to_entities(_rows_to_tuples(spans))))


@pandas_udf(StringType())
def serialize_spans_udf(spans_col: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """Byte-exact reference serialization (ner/utils.py:83-89, F19)."""
    for spans_s in spans_col:
        yield spans_s.map(lambda spans: serialize_spans(_rows_to_tuples(spans)))


@pandas_udf(SPAN_ARRAY)
def parse_annotation_udf(ann: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """Tolerant stringified-span-list decode (S3; ast semantics, errors → [])."""
    for batch in ann:
        yield batch.map(lambda s: _spans_to_rows(parse_annotation(s)))


@pandas_udf(TRIPLE_ARRAY)
def triples_udf(cols: Iterator[tuple[pd.Series, pd.Series]]) -> Iterator[pd.Series]:
    """(text, final spans) → [(pred, obj)] open-pattern triples (subject is
    the url column, attached natively by the caller)."""
    for text_s, spans_s in cols:
        out = []
        for t, spans in zip(text_s, spans_s):
            out.append(
                [(p, o) for _, p, o in triples_from_spans("", t or "", _rows_to_tuples(spans))]
            )
        yield pd.Series(out)


def spans_sorted_distinct(col: Column) -> Column:
    """Native A9/U3/O2: array_sort(array_distinct(spans)) — struct ordering is
    field-order lexicographic, matching the reference (s, e, tag) sort."""
    return F.array_sort(F.array_distinct(col))
