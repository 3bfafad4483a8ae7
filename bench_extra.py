#!/usr/bin/env python
"""Extra benchmarks for the optimization round (bench.py is FROZEN for
measurement — this file carries the guide §1.4 noop-sink isolation runs,
interleaved per-query repeats, and plan capture cited in
OPTIMIZATION_r09.md).

    python bench_extra.py --sf /root/testdata/sf1.0 --queries a,b,c \
        --repeats 3 [--plans plans/r09 --plan-suffix before] [--cpus 32]

Per query: a warm-up noop write, then ``repeats`` timed noop writes
INTERLEAVED across the query list (q1,q2,...,q1,q2,... — so neighbor-load
drift hits all queries equally, the CLAUDE.md interleaving discipline).
Prints one JSON line with per-query min/median and all samples.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def _noop(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def formatted_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    ap.add_argument("--queries", required=True,
                    help="comma-separated queries() names")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--plans", default=None,
                    help="directory to write <query>_<suffix>.txt plans")
    ap.add_argument("--plan-suffix", default="before")
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args()

    from x5_ner_spark.session import get_spark

    import __spark_entry__ as entrymod

    names = [n for n in args.queries.split(",") if n]
    spark = get_spark(master=f"local[{args.cpus}]", app_name="x5-bench-extra")
    qs = entrymod.queries()

    # warm FS cache + JVM codegen + python workers, same as bench.py
    import glob

    _noop(qs["filter_project"](spark, args.sf))
    for t in sorted(glob.glob(os.path.join(args.sf, "*.parquet"))):
        _noop(spark.read.parquet(t))

    if args.plans:
        os.makedirs(args.plans, exist_ok=True)
        for name in names:
            p = os.path.join(args.plans, f"{name}_{args.plan_suffix}.txt")
            with open(p, "w") as f:
                f.write(f"# {name} .explain('formatted') at {args.sf}\n")
                f.write(formatted_plan(qs[name](spark, args.sf)))

    samples: dict[str, list[float]] = {n: [] for n in names}
    if args.repeats < 1:  # plans-only invocation
        print(json.dumps({"sf": args.sf, "plans": args.plans}))
        spark.stop()
        return
    # one warm-up pass (codegen compile / first-read), then interleaved reps
    for name in names:
        spark.sparkContext.setJobDescription(f"warmup:{name}")
        _noop(qs[name](spark, args.sf))
    for rep in range(args.repeats):
        for name in names:
            spark.sparkContext.setJobDescription(f"rep{rep}:{name}")
            t0 = time.time()
            _noop(qs[name](spark, args.sf))
            samples[name].append(round(time.time() - t0, 3))
    out = {
        "sf": args.sf,
        "cpus": args.cpus,
        "load_avg": [round(x, 2) for x in os.getloadavg()],
        "queries": {
            n: {
                "min": min(s),
                "med": sorted(s)[len(s) // 2],
                "samples": s,
            }
            for n, s in samples.items()
        },
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
