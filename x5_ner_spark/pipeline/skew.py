"""Skew handling utilities (north rule: salted join keys for hub entities).

AQE's skew-join splitting (enabled in session.py) covers sort-merge joins;
explicit salting is for the aggregation/join shapes AQE can't split — a
groupBy on a hub key, or a broadcast-unfriendly dimension. The salted
two-phase aggregate and the salted join below are drop-in equivalents of
their plain forms (verified by tests/test_skew.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_count(df: DataFrame, key: str, n_salts: int = 16) -> DataFrame:
    """groupBy(key).count() with a two-phase salted aggregate: partial count
    per (key, salt), then final sum per key. The hub key's rows spread over
    ``n_salts`` reducers in phase 1 instead of one."""
    # salt from the full row hash: deterministic under recomputation (a
    # nondeterministic salt breaks task retries mid-shuffle)
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(*df.columns), F.lit(n_salts)))
    partial = salted.groupBy(key, "_salt").agg(F.count(F.lit(1)).alias("_c"))
    return partial.groupBy(key).agg(F.sum("_c").alias("count"))


def salted_join(
    big: DataFrame, small: DataFrame, key: str, n_salts: int = 16, how: str = "inner"
) -> DataFrame:
    """big ⋈ small on a skewed key: big side gets a random-but-deterministic
    salt, small side is replicated ×n_salts, join on (key, salt). Result is
    row-for-row identical to the plain join."""
    b = big.withColumn("_salt", F.pmod(F.xxhash64(*big.columns), F.lit(n_salts)))
    s = small.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    out = b.join(s, [key, "_salt"], how)
    return out.drop("_salt")
