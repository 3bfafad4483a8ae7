"""Custom stateful streaming operator: cumulative per-domain mention stats.

The Spark primitive the reference lacks entirely (its service is stateless
request/response): ``applyInPandasWithState`` keyed by domain, maintaining a
running (n_pages, n_mentions) state across micro-batches with processing-time
timeout eviction. Demonstrates the engine's §2.13 stateful surface; the same
pattern carries any accumulator (per-brand counts, dedup caches, rate stats).

TRIGGER CAVEAT (same as stream_dedup with a TTL, measured on Spark 4.1):
armed processing-time timers keep ``Trigger.AvailableNow`` scheduling
zero-row batches indefinitely — the query never terminates. Drive bounded
runs with ``Trigger.Once`` per drain; continuous deployments (the intended
shape here) use a processing-time trigger and are unaffected.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n_pages long, n_mentions long"
OUTPUT_SCHEMA = "domain string, n_pages long, n_mentions long"


# idle domains are evicted after this long without new pages — bounds state
# size on an unbounded crawl stream (long-tail domains dominate key count)
IDLE_TIMEOUT_MS = 3_600_000


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (domain,) = key
    if state.hasTimedOut:
        # idle eviction: emit the final tally, then drop the state entry
        n_pages, n_mentions = state.get if state.exists else (0, 0)
        state.remove()
        yield pd.DataFrame(
            {"domain": [domain], "n_pages": [n_pages], "n_mentions": [n_mentions]}
        )
        return
    n_pages, n_mentions = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n_pages += len(pdf)
        n_mentions += int(pdf["n_spans"].sum())
    state.update((n_pages, n_mentions))
    state.setTimeoutDuration(IDLE_TIMEOUT_MS)
    yield pd.DataFrame(
        {"domain": [domain], "n_pages": [n_pages], "n_mentions": [n_mentions]}
    )


def domain_mention_state(mentions_stream: DataFrame) -> DataFrame:
    """mentions stream (url, spans) → cumulative (domain, n_pages,
    n_mentions) updates per micro-batch; domains idle for IDLE_TIMEOUT_MS
    are flushed and evicted (processing-time timeout)."""
    keyed = mentions_stream.select(
        F.regexp_extract("url", r"https?://([^/]+)/", 1).alias("domain"),
        F.size("spans").alias("n_spans"),
    )
    return keyed.groupBy("domain").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
