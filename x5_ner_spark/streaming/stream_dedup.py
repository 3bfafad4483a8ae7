"""Streaming near-dup state (§2.13, VERDICT r6 #6): incremental MinHash-LSH.

The batch dedup path (operators/dedup.py) is a job; a crawl is a stream.
This module re-expresses its two halves for Structured Streaming:

- **Signatures are stateless**: a doc's MinHash signature is a pure function
  of its own shingles, so the streaming variant computes it MAP-ONLY with
  higher-order functions (array_min over the affine permutations of the
  doc's own shingle hashes) — no aggregate, no watermark, no state; values
  are IDENTICAL to batch ``minhash_signatures`` (pytest parity). The batch
  path deliberately uses a codegen'd partial aggregate instead (HOF lambdas
  are interpreted — measured ~2× slower per row), but an open groupBy on a
  stream would need state for what is per-row arithmetic; stateless wins
  here.
- **Bucket membership is the stateful piece**: ``applyInPandasWithState``
  keyed by (band, bucket) accumulates each LSH bucket's doc_ids across
  micro-batches and emits every NEW candidate pair exactly once as it forms
  — the incremental analog of ``minhash_candidate_pairs`` (parity:
  accumulated stream pairs == batch pairs over the same corpus).

State is bounded by ``max_bucket``: a bucket that exceeds it stops BOTH
storing new members and emitting their pairs — the streaming analog of the
batch ``df_cap`` knob (a boilerplate bucket would otherwise grow its state
and its per-arrival pair fan-out without bound). Below the cap the operator
is exact.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions.columns import portable_hash32, simple_tokens_col
from ..operators.dedup import MH_PRIME, _band_structs, _sh_expr, minhash_coeffs

PAIR_SCHEMA = "id_a long, id_b long"
BUCKET_STATE_SCHEMA = "ids array<long>"


def minhash_signatures_stream(
    docs: DataFrame, k: int = 3, n_hashes: int = 8
) -> DataFrame:
    """(doc_id, text) stream → (doc_id, mh0..mh{n-1}) stream, map-only.
    Same shingling base, hash family, and coefficients as the batch
    aggregate — the signature values agree row-for-row. The shingle-hash
    array is bound ONCE as a lambda variable (one-element-array trick, see
    dedup._sized_shingles) so the md5s are not re-evaluated per hash
    function."""
    hs_expr = F.transform(
        F.array_distinct(_sh_expr(k)), lambda s: portable_hash32(s)
    )
    coeffs = minhash_coeffs(n_hashes)

    def _perm(a: int, b: int):
        # bind (a, b) via a closure factory: pyspark derives HOF arity from
        # the python signature, so default-arg binding (lambda x, a=a, b=b)
        # reads as a 3-arg lambda and fails analysis, and a bare loop
        # variable would late-bind (the candidates._minhash_cols lesson)
        return lambda x: F.pmod(x * F.lit(a) + F.lit(b), F.lit(MH_PRIME))

    bound = F.element_at(
        F.transform(
            F.array(hs_expr),
            lambda hs: F.struct(
                *[
                    F.array_min(F.transform(hs, _perm(a, b))).alias(f"mh{i}")
                    for i, (a, b) in enumerate(coeffs)
                ]
            ),
        ),
        1,
    )
    # same eligibility rule as batch _with_tokens: ≥ k tokens or no row
    toks = simple_tokens_col("text")
    return (
        docs.select("doc_id", toks.alias("toks"))
        .filter(F.size("toks") >= k)
        .select("doc_id", bound.alias("s"))
        .select("doc_id", "s.*")
    )


def _bucket_update_fn(max_bucket: int):
    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        ids: list[int] = list(state.get[0]) if state.exists else []
        known = set(ids)
        out_a: list[int] = []
        out_b: list[int] = []
        new_ids = sorted(
            {int(i) for pdf in pdfs for i in pdf["doc_id"]} - known
        )
        for nid in new_ids:
            if len(ids) >= max_bucket:
                break  # capped bucket: stop pairing AND storing (see module doc)
            for old in ids:
                a, b = (old, nid) if old < nid else (nid, old)
                out_a.append(a)
                out_b.append(b)
            ids.append(nid)
            known.add(nid)
        state.update((ids,))
        yield pd.DataFrame({"id_a": out_a, "id_b": out_b})

    return update


def candidate_pairs_stream(
    docs: DataFrame,
    k: int = 3,
    n_hashes: int = 8,
    band_size: int = 2,
    max_bucket: int = 64,
) -> DataFrame:
    """(doc_id, text) stream → LSH candidate-pair stream: each (id_a, id_b)
    with id_a < id_b is emitted the first time the two docs meet in a
    (band, bucket) — across micro-batches, via bucket-membership state. A
    pair sharing several bands is emitted once per such band (the batch
    path's ``.distinct()``); downstream exact-rescore joins dedup anyway,
    and keeping the operator append-only avoids a second stateful stage."""
    sig = minhash_signatures_stream(docs, k, n_hashes)
    keyed = sig.select(
        "doc_id", F.explode(_band_structs(n_hashes, band_size)).alias("bb")
    ).select(
        "doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    return keyed.groupBy("band", "bucket").applyInPandasWithState(
        _bucket_update_fn(max_bucket),
        outputStructType=PAIR_SCHEMA,
        stateStructType=BUCKET_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def near_dup_edges_stream(
    docs: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    threshold: float = 0.5,
    n_hashes: int = 8,
    band_size: int = 2,
    max_bucket: int = 64,
) -> DataFrame:
    """The full incremental near-dup EDGE stream: candidate pairs from the
    stateful bucket accumulator, exact-Jaccard rescored by a STREAM-STATIC
    join against the (batch) corpus's per-doc shingle sets — the same
    arrays and rounding as the batch ``jaccard_rescore``, so surviving
    edges are true near-dups (no false positives), emitted as they form.

    ``corpus`` is the static side (the docs table the stream is drawn
    from, or a snapshot): Spark plans stream-static joins without state,
    re-reading only the matching static partitions per micro-batch. At
    production scale the static side is the growing Iceberg table — each
    micro-batch rescores only its few candidate pairs against two
    doc_id-keyed lookups. Multi-band duplicate emissions are deduped by
    the pairwise max (a pair rescores to the same jaccard in every band);
    downstream CC consumes edges idempotently anyway."""
    from ..operators.dedup import shingle_sets

    pairs = candidate_pairs_stream(docs, k, n_hashes, band_size, max_bucket)
    sh = shingle_sets(corpus, k)
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("n_inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter")
                / (F.size("sh_a") + F.size("sh_b") - F.col("n_inter")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
