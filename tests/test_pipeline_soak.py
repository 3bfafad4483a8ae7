"""Full-DAG storage soak (VERDICT r4 next #7): run_pipeline at large page
count with a live getRDDStorageInfo sampler — the frontier-release
discipline (CC localCheckpoint rounds, PageRank, the persisted triple
stage) must hold AT THE SCALE WHERE IT MATTERS, not just in the 2k-edge
unit test (`test_iterative_loops_release_superseded_blocks`).

Opt-in: heavy (minutes at 960k pages). Run standalone as

    SPARK_GRAFT_SOAK=1 [SPARK_GRAFT_SOAK_PAGES=960000] \
        python -m pytest tests/test_pipeline_soak.py -q -s

so it owns the JVM sizing (the shared suite fixture is local[4]). The
round-5 certified run is recorded in BENCH/BASELINE.md.

Bound: the storage high-water over the WHOLE run (sampled at 4 Hz) is
base + the persisted triples stage + 2 CC frontiers (+1 transient overlap
while a new frontier materializes before its predecessor is dropped), and
the run must end back at base (write_stage path unpersists triples)."""

from __future__ import annotations

import os
import threading
import time

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_SOAK"),
    reason="storage soak is opt-in: SPARK_GRAFT_SOAK=1 (heavy, owns local[32])",
)

PAGES = int(os.environ.get("SPARK_GRAFT_SOAK_PAGES", "960000"))
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def test_full_dag_storage_high_water_bounded(tmp_path):
    from bench import _pages_from_parquet
    from x5_ner_spark.pipeline.runner import run_pipeline
    from x5_ner_spark.session import get_spark

    spark = get_spark(master=f"local[{CPUS}]", app_name="x5-storage-soak")
    sc = spark.sparkContext

    def storage() -> tuple[int, float]:
        info = sc._jsc.sc().getRDDStorageInfo()
        return len(info), sum(i.memSize() for i in info) / 1e6

    pages = _pages_from_parquet(spark, PAGES, sentences=6, partitions=2 * int(CPUS))
    base_n, _ = storage()

    high = {"n": base_n, "mb": 0.0, "samples": 0}
    stop = threading.Event()

    def poll() -> None:
        while not stop.is_set():
            try:
                n, mb = storage()
            except Exception:  # noqa: BLE001 — JVM teardown race at test end
                break
            high["n"] = max(high["n"], n)
            high["mb"] = max(high["mb"], mb)
            high["samples"] += 1
            time.sleep(0.25)

    t = threading.Thread(target=poll, daemon=True)
    t.start()
    t0 = time.time()
    out = run_pipeline(spark, pages, out_root=str(tmp_path / "kg"), n_buckets=8)
    n_edges = out["edges"].count()
    wall = time.time() - t0
    stop.set()
    t.join(timeout=5)

    final_n, final_mb = storage()
    print(
        f"\nsoak: pages={PAGES} wall={wall:.1f}s docs/s={PAGES / wall:.0f} "
        f"edges={n_edges} high_water_rdds={high['n']} (base {base_n}) "
        f"high_water_mb={high['mb']:.0f} final_rdds={final_n} "
        f"final_mb={final_mb:.0f} samples={high['samples']}"
    )
    assert n_edges > 0
    assert high["samples"] > 10, "sampler must have actually observed the run"
    # triples persist (1) + 2 CC frontiers + 1 transient overlap
    assert high["n"] - base_n <= 4, (base_n, high)
    # write_stage path unpersists triples; only a final frontier may linger
    assert final_n - base_n <= 1, (base_n, final_n)
