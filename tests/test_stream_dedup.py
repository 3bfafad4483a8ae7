"""Streaming near-dup state (VERDICT r6 #6): stream ≡ batch parity.

The signatures are stateless map-only HOF arithmetic; the bucket-membership
accumulator is the stateful piece. Both are pinned against the batch
operators over the same corpus — the batch queries remain the DuckDB-oracle
surface, so these tests need no oracle of their own."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from x5_ner_spark.operators.dedup import (
    minhash_candidate_pairs,
    minhash_signatures,
)
from x5_ner_spark.streaming import stream_dedup


def _docs(spark, n=60):
    """Deterministic near-dup corpus: per base doc a token shuffle plus one
    planted partner differing in the last token (the bench fixture shape)."""
    import random

    rows = []
    vocab = [f"tok{i}" for i in range(40)]
    for i in range(n // 2):
        rng = random.Random(1000 + i)
        toks = [vocab[rng.randrange(len(vocab))] + f"s{i}" for t in range(12)]
        rows.append((2 * i, " ".join(toks)))
        rows.append((2 * i + 1, " ".join(toks[:-1] + ["ndmark"])))
    rows.append((n, "short"))  # < k tokens: must produce NO signature row
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def corpus_path(spark, tmp_path_factory):
    """The corpus written as MANY small parquet files so
    maxFilesPerTrigger=1 yields genuinely multiple micro-batches."""
    path = str(tmp_path_factory.mktemp("sdedup") / "docs")
    _docs(spark).repartition(6).write.mode("overwrite").parquet(path)
    return path


def test_stream_signatures_equal_batch(spark, corpus_path):
    batch_docs = spark.read.parquet(corpus_path)
    want = {
        r["doc_id"]: tuple(r[f"mh{i}"] for i in range(8))
        for r in minhash_signatures(batch_docs).collect()
    }

    stream = spark.readStream.schema("doc_id long, text string").parquet(corpus_path)
    sig = stream_dedup.minhash_signatures_stream(stream)
    q = (
        sig.writeStream.format("memory").queryName("t_sig_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]: tuple(r[f"mh{i}"] for i in range(8))
        for r in spark.table("t_sig_stream").collect()
    }
    assert got == want and len(want) > 0
    # the <k-token doc produced no row on either side
    assert 60 not in got


def test_stream_candidate_pairs_accumulate_to_batch(spark, corpus_path):
    """Pairs emitted incrementally across micro-batches, each exactly once
    per (band,bucket) meeting — accumulated and deduped they equal the batch
    candidate set."""
    batch_docs = spark.read.parquet(corpus_path)
    want = {
        (r["id_a"], r["id_b"]) for r in minhash_candidate_pairs(batch_docs).collect()
    }

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(corpus_path)
    )
    pairs = stream_dedup.candidate_pairs_stream(stream)
    q = (
        pairs.writeStream.format("memory").queryName("t_pairs_stream")
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    rows = spark.table("t_pairs_stream").collect()
    got = {(r["id_a"], r["id_b"]) for r in rows}
    assert got == want and len(want) > 0
    assert all(a < b for a, b in got)
    # incremental-exactly-once: no (band,bucket) re-emits a pair, so any
    # duplicates in the raw output come only from multi-band collisions —
    # bounded by the band count
    from collections import Counter

    dupes = Counter((r["id_a"], r["id_b"]) for r in rows)
    assert max(dupes.values()) <= 4  # n_hashes=8 / band_size=2 bands


def test_bucket_state_cap_bounds_membership():
    """A bucket past max_bucket stops storing AND pairing (the df_cap
    analog): driver-side unit check of the update fn."""
    from x5_ner_spark.streaming.stream_dedup import _bucket_update_fn

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

    update = _bucket_update_fn(max_bucket=3)
    state = FakeState()
    out1 = list(update(("b", "x"), iter([pd.DataFrame({"doc_id": [1, 2]})]), state))
    out2 = list(
        update(("b", "x"), iter([pd.DataFrame({"doc_id": [3, 4, 5, 2]})]), state)
    )
    pairs = [
        (a, b)
        for df in out1 + out2
        for a, b in zip(df["id_a"], df["id_b"])
    ]
    # 1,2 paired; 3 paired with both; 4,5 hit the cap and neither stored
    # nor paired; the re-seen 2 is ignored
    assert pairs == [(1, 2), (1, 3), (2, 3)]
    assert list(state.get[0]) == [1, 2, 3]


def test_stream_rescored_edges_equal_batch(spark, corpus_path):
    """Full incremental edge stream: candidates from the stateful
    accumulator, exact-rescored via a stream-static join against the corpus
    shingle sets — accumulated edges equal the batch
    candidate→jaccard_rescore composition (values included)."""
    from x5_ner_spark.operators.dedup import jaccard_rescore

    batch_docs = spark.read.parquet(corpus_path)
    want = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_rescore(
            batch_docs, minhash_candidate_pairs(batch_docs), k=3, threshold=0.5
        ).collect()
    }

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(corpus_path)
    )
    edges = stream_dedup.near_dup_edges_stream(stream, batch_docs)
    q = (
        edges.writeStream.format("memory").queryName("t_edges_stream")
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    rows = spark.table("t_edges_stream").collect()
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in rows}
    assert got == want and len(want) > 0
    # multi-band duplicate emissions carry identical jaccard values
    from collections import defaultdict

    vals = defaultdict(set)
    for r in rows:
        vals[(r["id_a"], r["id_b"])].add(r["jaccard"])
    assert all(len(v) == 1 for v in vals.values())
