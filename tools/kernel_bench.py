#!/usr/bin/env python
"""Single-core CPU-time benchmark of the per-document kernel
(final_mention_spans_batch — the code inside the fused Arrow stage).

Wall-clock on this shared host is ±10% noisy even when quiet; process_time
isolates the kernel from neighbors (BENCH/BASELINE.md round-3 kernel pass).

    python tools/kernel_bench.py [n_docs] [--profile] [--sentences K]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 20000
    profile = "--profile" in sys.argv
    sentences = 1
    if "--sentences" in sys.argv:
        sentences = int(sys.argv[sys.argv.index("--sentences") + 1])

    from x5_ner_spark.core.html_text import extract_text
    from x5_ner_spark.core.mention_pipeline import (
        final_mention_spans_batch,
        triples_from_spans,
    )
    from x5_ner_spark.pipeline.fixtures import BRANDS, generate_pages

    pages = generate_pages(n, sentences=sentences)
    lex = frozenset(BRANDS)
    lex_list = sorted(lex)

    def run(rows) -> int:
        # mirrors pipeline/fused.py's per-batch loop: HTML→text, batched
        # mention detection, postprocess, triple emission
        total = 0
        for lo in range(0, len(rows), 4096):
            chunk = rows[lo : lo + 4096]
            docs = []
            for p in chunk:
                t = p["text"] if p["text"] else extract_text(p["html"])
                if t and t.strip():
                    docs.append((p["url"], t))
            spans = final_mention_spans_batch([t for _, t in docs], lex, lex_list)
            for (url, t), sp in zip(docs, spans):
                triples_from_spans(url, t, sp)
            total += len(docs)
        return total

    # warm caches the way a long-lived worker would be warm
    run(pages[:2048])

    if profile:
        import cProfile
        import pstats

        pr = cProfile.Profile()
        pr.enable()
        run(pages)
        pr.disable()
        pstats.Stats(pr).sort_stats("tottime").print_stats(25)
        return

    t0c, t0w = time.process_time(), time.time()
    total = run(pages)
    tc, tw = time.process_time() - t0c, time.time() - t0w
    print({
        "n_docs": total, "sentences": sentences,
        "cpu_sec": round(tc, 2), "wall_sec": round(tw, 2),
        "docs_per_cpu_sec": round(total / tc, 1),
    })


if __name__ == "__main__":
    main()
