#!/usr/bin/env python
"""Dump `.explain("formatted")` plans of the headline queries to
BENCH/plans_r5.txt — the plan-discipline artifact: pushed filters, broadcast
joins, exchange counts, and WholeStageCodegen spans are auditable without
re-running Spark. Re-generate after any operator change:

    python tools/plan_audit.py
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

AUDIT = [
    "kg_mentions_by_pred", "filter_project", "join_agg", "tpch_q1",
    "jaccard_pairs", "minhash_buckets", "near_dup_clusters_lsh",
    "gopher_filters", "canonical_urls", "tfidf_top_terms", "mix_sample",
    "scrub_pii", "decision_log", "asof_join", "sessionize", "ivf_topk",
    "doc_stats", "corpus_report", "inverted_index", "pack_documents",
    "components", "pagerank",
]
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    from x5_ner_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(master="local[4]", app_name="plan-audit", shuffle_partitions=8)
    qs = entrymod.queries()
    out_path = os.path.join(REPO, "BENCH", "plans_r5.txt")
    with open(out_path, "w") as out:
        out.write("# .explain('formatted') of headline queries at %s\n" % SF_DIR)
        for name in AUDIT:
            df = qs[name](spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
            n_exchange = plan.count("Exchange")
            n_bhj = plan.count("BroadcastHashJoin")
            out.write(
                f"\n{'=' * 72}\n## {name}  (Exchange: {n_exchange}, "
                f"BroadcastHashJoin: {n_bhj})\n{'=' * 72}\n{plan}"
            )
            print(f"{name}: Exchange={n_exchange} BroadcastHashJoin={n_bhj}")
    spark.stop()
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
