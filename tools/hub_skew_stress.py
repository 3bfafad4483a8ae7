#!/usr/bin/env python
"""Hub-skew stress for the dedup→canonicalization path (VERDICT r6 #4).

SURVEY §7.4.5 names skewed connected-components as a hard part; the r6
scaling fixture deliberately excluded the hot-shingle regime. This driver
plants a HUB — a fixed 6-token phrase appended to a configurable fraction
(default 25%) of documents, like a boilerplate footer or a dominant brand
across Common-Crawl pages — and pushes ≥1M docs through
``near_dup_clusters_lsh`` with the ``max_bucket`` valve ON:

- hub docs share 4+ pure hub shingles, so each MinHash permutation lands on
  a hub shingle with probability ~len_hub/len_doc and band buckets of
  10^4-10^5 docs form — a bucket of size m emits m² candidate pairs, the
  quadratic term the valve exists to cut;
- the run records the PRE-cap bucket-size distribution, the capped
  candidate count, planted-pair recall, wall time, and Spark REST stage
  metrics (max/median task time, spill, shuffle volumes) as the skew
  evidence;
- a small cap-OFF control at --control-docs shows the uncapped blowup on
  the same corpus shape (the 1M-doc cap-off run is deliberately not
  attempted: its pair term is ~10^9 rows).

Usage:  python tools/hub_skew_stress.py [--docs 1200000] [--cores 8]
Mini version runs in the default pytest suite (tests/test_hub_skew.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

HUB = "hubco mega brand footer boilerplate inc"  # 6 tokens → 4 pure shingles


def hub_skew_docs(spark, n_pairs: int, hub_frac: float = 0.25, partitions: int = 32):
    """Distributed generator: ``2*n_pairs`` docs — per base doc a 12-token
    salted shuffle (cross-doc Jaccard ≈ 0, the r6 fixture lesson: a shared
    vocabulary makes chance collisions grow with the corpus) plus ONE
    planted near-dup partner (one non-hub token swapped, J ≈ 0.8); a
    ``hub_frac`` fraction of PAIRS carries the fixed hub suffix, so hub
    membership and near-dup structure are independent."""
    import pandas as pd
    from pyspark.sql import functions as F  # noqa: F401

    hub_mod = max(int(round(1.0 / hub_frac)), 1)

    def gen(batches):
        import random

        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                toks = [f"t{j}~{i}" for j in range(12)]
                random.Random(7_000_003 + i).shuffle(toks)
                suffix = f" {HUB}" if i % hub_mod == 0 else ""
                t1 = " ".join(toks) + suffix
                t2 = " ".join(toks[:-1] + [f"ndmark{i}"]) + suffix
                rows.append((2 * i, t1, len(t1)))
                rows.append((2 * i + 1, t2, len(t2)))
            yield pd.DataFrame(rows, columns=["doc_id", "text", "n_chars"])

    return (
        spark.range(n_pairs)
        .repartition(partitions)
        .mapInPandas(gen, "doc_id long, text string, n_chars long")
    )


def _corpus_path(n_pairs: int, hub_frac: float) -> str:
    import tempfile

    return os.path.join(
        tempfile.gettempdir(), f"x5hub_{n_pairs}_{hub_frac}"
    )


def materialized_corpus(spark, n_pairs: int, hub_frac: float, partitions: int = 32):
    path = _corpus_path(n_pairs, hub_frac)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        hub_skew_docs(spark, n_pairs, hub_frac, partitions).write.mode(
            "overwrite"
        ).parquet(path)
    return spark.read.parquet(path)


def rest_stage_metrics(spark) -> list[dict]:
    """Heaviest stages' task-skew metrics from the Spark UI REST API —
    max/median task time, spill, shuffle bytes (the r6 attribution method,
    now scripted)."""
    try:
        base = spark.sparkContext.uiWebUrl
        if not base:
            return []
        with urllib.request.urlopen(f"{base}/api/v1/applications", timeout=10) as r:
            app_id = json.load(r)[0]["id"]
        with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app_id}/stages?status=complete", timeout=30
        ) as r:
            stages = json.load(r)
    except Exception as e:  # noqa: BLE001 — metrics are best-effort evidence
        return [{"error": str(e)[:200]}]
    heavy = sorted(stages, key=lambda s: -s.get("executorRunTime", 0))[:6]
    out = []
    for s in heavy:
        sid, att = s["stageId"], s["attemptId"]
        row = {
            "stage": sid,
            "name": s.get("name", "")[:60],
            "tasks": s.get("numCompleteTasks"),
            "run_time_ms": s.get("executorRunTime"),
            "spill_bytes": s.get("memoryBytesSpilled", 0) + s.get("diskBytesSpilled", 0),
            "shuffle_write": s.get("shuffleWriteBytes"),
            "shuffle_read": s.get("shuffleReadBytes"),
        }
        try:
            with urllib.request.urlopen(
                f"{base}/api/v1/applications/{app_id}/stages/{sid}/{att}"
                f"/taskSummary?quantiles=0.5,1.0",
                timeout=30,
            ) as r:
                q = json.load(r)
            med, mx = q["executorRunTime"]
            row["task_ms_median"] = med
            row["task_ms_max"] = mx
            row["task_skew"] = round(mx / med, 2) if med else None
        except Exception:  # noqa: BLE001
            pass
        out.append(row)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_200_000)
    ap.add_argument("--hub-frac", type=float, default=0.25)
    ap.add_argument("--max-bucket", type=int, default=64)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--control-docs", type=int, default=12_000)
    ap.add_argument("--skip-control", action="store_true")
    # the production recall knob: more hash functions → more bands → a pair
    # whose hub-dominated bands were capped still meets in a selective band
    ap.add_argument("--n-hashes", type=int, default=8)
    ap.add_argument("--band-size", type=int, default=2)
    args = ap.parse_args()

    from x5_ner_spark.operators.dedup import (
        minhash_band_buckets,
        minhash_candidate_pairs,
        near_dup_clusters_lsh,
    )
    from x5_ner_spark.session import get_spark

    spark = get_spark(
        master=f"local[{args.cores}]",
        app_name="hub-skew-stress",
        shuffle_partitions=4 * args.cores,
        extra_conf={
            "spark.ui.enabled": "true",
            # small corpus bytes, big row counts: give the scan real splits
            "spark.sql.files.maxPartitionBytes": str(8 << 20),
        },
    )
    out: dict = {
        "n_docs": args.docs,
        "hub_frac": args.hub_frac,
        "max_bucket": args.max_bucket,
        "n_hashes": args.n_hashes,
        "band_size": args.band_size,
        "cores": args.cores,
    }

    docs = materialized_corpus(spark, args.docs // 2, args.hub_frac)
    n_docs = docs.count()  # off the clock; also warms the FS cache
    out["n_docs_actual"] = n_docs

    # PRE-cap bucket-size distribution: the skew, quantified (one pass over
    # the bucket table; persisted so bins and max share the computation)
    t0 = time.time()
    bb = minhash_band_buckets(docs, n_hashes=args.n_hashes, band_size=args.band_size).persist()
    dist = (
        bb.selectExpr(
            "CASE WHEN n_docs <= 4 THEN '2-4' WHEN n_docs <= 64 THEN '5-64' "
            "WHEN n_docs <= 1024 THEN '65-1024' ELSE '>1024' END AS size_bin"
        )
        .groupBy("size_bin")
        .count()
        .collect()
    )
    from pyspark.sql import functions as F

    mx = bb.agg(F.max("n_docs")).collect()[0][0]
    bb.unpersist()
    out["bucket_dist_sec"] = round(time.time() - t0, 1)
    out["bucket_size_bins"] = {r["size_bin"]: r["count"] for r in dist}
    out["max_bucket_observed"] = mx

    # capped candidate volume
    t0 = time.time()
    n_cand = minhash_candidate_pairs(
        docs, n_hashes=args.n_hashes, band_size=args.band_size,
        max_bucket=args.max_bucket,
    ).count()
    out["capped_candidates"] = n_cand
    out["capped_candidates_sec"] = round(time.time() - t0, 1)

    # the full production path, valve ON
    t0 = time.time()
    clusters = near_dup_clusters_lsh(
        docs, n_hashes=args.n_hashes, band_size=args.band_size,
        max_bucket=args.max_bucket,
    )
    clusters.write.mode("overwrite").format("noop").save()
    wall = time.time() - t0
    out["clusters_wall_sec"] = round(wall, 1)
    out["docs_per_sec"] = round(n_docs / wall, 1)
    t0 = time.time()
    n_members = clusters.count()
    n_planted = args.docs // 2 * 2  # every doc has exactly one partner
    out["cluster_members"] = n_members
    out["planted_members_expected"] = n_planted
    out["recall_members"] = round(n_members / n_planted, 4)
    out["count_sec"] = round(time.time() - t0, 1)

    out["rest_stages"] = rest_stage_metrics(spark)

    if not args.skip_control:
        # cap-OFF control at small scale: the uncapped quadratic term
        ctrl = materialized_corpus(spark, args.control_docs // 2, args.hub_frac)
        t0 = time.time()
        n_off = minhash_candidate_pairs(ctrl).count()
        t_off = time.time() - t0
        t0 = time.time()
        n_on = minhash_candidate_pairs(ctrl, max_bucket=args.max_bucket).count()
        t_on = time.time() - t0
        out["control"] = {
            "n_docs": args.control_docs,
            "cand_cap_off": n_off,
            "cand_cap_on": n_on,
            "sec_cap_off": round(t_off, 1),
            "sec_cap_on": round(t_on, 1),
        }

    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
