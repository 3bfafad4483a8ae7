"""Hub-skew mini stress (VERDICT r6 #4): the default-suite version of
tools/hub_skew_stress.py — a hub phrase in ~25% of docs must not blow up
LSH candidate generation when the max_bucket valve is on, and the valve must
not break near-dup recovery. The ≥1M-doc measured run is recorded in
BENCH/BASELINE.md round 7."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools.hub_skew_stress import hub_skew_docs  # noqa: E402

from x5_ner_spark.operators.dedup import (
    minhash_band_buckets,
    minhash_candidate_pairs,
    near_dup_clusters_lsh,
)

N_PAIRS = 600  # 1200 docs, ~300 with the hub suffix


@pytest.fixture(scope="module")
def corpus(spark):
    return hub_skew_docs(spark, N_PAIRS, hub_frac=0.25, partitions=8).localCheckpoint()


def test_hub_creates_hot_buckets(spark, corpus):
    """The fixture actually produces the skew being tested: at least one
    band bucket holds a constant fraction of the hub docs."""
    mx = minhash_band_buckets(corpus).agg(F.max("n_docs")).collect()[0][0]
    assert mx >= 30, mx  # ≥10% of the 300 hub docs piled into one bucket


def test_max_bucket_caps_candidate_volume(spark, corpus):
    n_off = minhash_candidate_pairs(corpus).count()
    n_on = minhash_candidate_pairs(corpus, max_bucket=16).count()
    # uncapped: hub buckets emit O(m²) pairs; capped: close to the planted
    # linear structure
    assert n_off > 3 * n_on, (n_off, n_on)
    assert n_on >= N_PAIRS * 0.95


def test_valve_keeps_recall_and_merges_nothing(spark, corpus):
    """With the valve ON the planted pairs still cluster (recall ≥ 0.94:
    plain 4-band LSH at J≈0.8 already misses ~(1-0.8²)⁴ ≈ 1.7% of pairs,
    and a pair whose only agreeing bands are hub buckets loses those bands
    to the cap — 1148/1200 members on this fixture; the ≥1M stress run
    records the same number at scale) and the hub never glues unrelated
    pairs into super-clusters."""
    clusters = near_dup_clusters_lsh(corpus, max_bucket=16).collect()
    assert len(clusters) >= 2 * N_PAIRS * 0.94
    by_cluster: dict = {}
    for r in clusters:
        by_cluster.setdefault(r["cluster_id"], []).append(r["doc_id"])
    # every cluster is exactly one planted pair: {2i, 2i+1}
    for cid, members in by_cluster.items():
        assert len(members) == 2, (cid, sorted(members)[:6])
        a, b = sorted(members)
        assert b == a + 1 and a % 2 == 0, (a, b)
    # exactly one keeper per cluster, dropped flags consistent
    for r in clusters:
        assert r["dropped"] == (r["doc_id"] != r["keep_id"])
