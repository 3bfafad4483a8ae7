#!/usr/bin/env python
"""Dump `.explain("formatted")` plans of the headline queries to
BENCH/plans_r9.txt — the plan-discipline artifact: pushed filters, broadcast
joins, exchange counts, and WholeStageCodegen spans are auditable without
re-running Spark. Re-generate after any operator change:

    python tools/plan_audit.py

The per-query operator counts are ALSO a pytest contract
(tests/test_plan_shapes.py pins them): a change that adds a shuffle or
drops a broadcast to a headline plan fails the default suite, not just a
round-over-round diff of this file.
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

AUDIT = [
    "kg_mentions_by_pred", "filter_project", "join_agg", "tpch_q1",
    "jaccard_pairs", "minhash_buckets", "near_dup_clusters_lsh",
    "gopher_filters", "canonical_urls", "tfidf_top_terms", "mix_sample",
    "scrub_pii", "decision_log", "crf_decode", "asof_join", "sessionize",
    "ivf_topk", "doc_stats", "corpus_report", "inverted_index",
    "pack_documents", "components", "pagerank", "simhash", "decontaminate",
]
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

_OP_LINE = re.compile(r"^\((\d+)\) (\w+)", re.MULTILINE)


def formatted_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def op_counts(df) -> dict[str, int]:
    """Exact physical-operator multiset from the formatted plan's numbered
    details section (`(12) Exchange` lines — one per operator, unlike raw
    substring counts where 'Exchange' also matches BroadcastExchange and the
    tree section repeats every id)."""
    counts: dict[str, int] = {}
    for _, name in _OP_LINE.findall(formatted_plan(df)):
        counts[name] = counts.get(name, 0) + 1
    return counts


def main() -> None:
    from x5_ner_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(master="local[4]", app_name="plan-audit", shuffle_partitions=8)
    # Disable size-based auto-broadcast while auditing: a BroadcastHashJoin
    # in these plans then proves an EXPLICIT broadcast() hint — the only
    # thing that still holds at 100 TB, where "the statistics said 9 MB"
    # does not. (tests/test_plan_shapes.py pins under the same conf.)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    qs = entrymod.queries()
    out_path = os.path.join(REPO, "BENCH", "plans_r9.txt")
    with open(out_path, "w") as out:
        out.write("# .explain('formatted') of headline queries at %s\n" % SF_DIR)
        for name in AUDIT:
            df = qs[name](spark, SF_DIR)
            plan = formatted_plan(df)
            ops = op_counts(df)
            n_exchange = ops.get("Exchange", 0)
            n_bexchange = ops.get("BroadcastExchange", 0)
            n_bhj = ops.get("BroadcastHashJoin", 0)
            out.write(
                f"\n{'=' * 72}\n## {name}  (Exchange: {n_exchange}, "
                f"BroadcastExchange: {n_bexchange}, "
                f"BroadcastHashJoin: {n_bhj})\n{'=' * 72}\n{plan}"
            )
            print(
                f'    "{name}": {{"Exchange": {n_exchange}, '
                f'"BroadcastExchange": {n_bexchange}, '
                f'"BroadcastHashJoin": {n_bhj}}},'
            )
    spark.stop()
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
