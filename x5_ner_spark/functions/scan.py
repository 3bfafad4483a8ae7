"""Scan-parallelism valve for unsplittable inputs.

A parquet file written as ONE row group (or a gzip text file, or any
single small file) yields a 1-2 task scan no matter how many cores the
session has: Spark's split planning can cut byte ranges, but only the
range containing a row-group midpoint reads anything. Every map-heavy
operator downstream of such a scan (tokenize → shingle → hash, HOF
filters, regex scrubbing) then runs on 1-2 cores of 32 — measured 2.5 s →
0.6 s on the sf1.0 gopher pass just from widening the scan.

:func:`scan_parallel` is the standard remedy from the optimization
playbook ("one huge unsplittable file — repartition immediately after the
read"), made SCALE-ADAPTIVE: the one cheap exchange of raw rows is added
only when the scan actually has fewer partitions than the session's
cores. Any real corpus at scale arrives in thousands of natural splits,
so the valve is a no-op there and no 100 TB shuffle is ever introduced —
this is a floor on parallelism, not a constant tuned to local mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def scan_parallel(df: DataFrame, factor: int = 2) -> DataFrame:
    """Repartition ``df`` to ``factor × defaultParallelism`` partitions IF
    its current scan would run on fewer partitions than the session has
    cores; otherwise return it unchanged. The explicit partition count
    keeps AQE from coalescing the exchange back below core count (advisory
    target 64 MB would fold a small corpus into one partition again).

    Row-level semantics are unaffected: every caller is an aggregate /
    filter / per-row projection whose result is partitioning-independent;
    round-robin repartition is deterministic under Spark's
    sort-before-repartition default (retried tasks reproduce the same
    assignment).
    """
    sc = df.sparkSession.sparkContext
    cores = sc.defaultParallelism
    try:
        nparts = df.rdd.getNumPartitions()
    except Exception:
        return df
    if nparts >= cores:
        return df
    return df.repartition(factor * cores)
