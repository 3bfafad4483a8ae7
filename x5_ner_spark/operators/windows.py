"""Window / sequential operators (SURVEY.md §2.5): lead-row compare (W1),
gaps-and-islands sessionization (W2 pattern), lag relabel (W3), and
lag-conditioned zeroing (W7 analog) — all native window functions.

Scale note: every window here partitions by a bounded key (user_id) except
the explicitly-global W1/J6 operators, which the reference defines over a
total order (update_rules.py:33-48). For W1 the distributed form is
``lead_prefix_flags_scalable`` (range partitions + boundary stitching);
the plain form is kept for oracle parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def lead_prefix_flags(docs: DataFrame, prefix_len: int = 3) -> DataFrame:
    """W1/J5 (ref scripts/update_rules.py:33-48): order rows by text, compare
    each row's first chars with the NEXT row's. Global total order, made
    explicit with a deterministic tiebreak key."""
    w = Window.orderBy("text", "doc_id")
    return (
        docs.select("doc_id", "text")
        .withColumn("next_text", F.lead("text").over(w))
        .withColumn(
            "prefix_match",
            (
                F.substring("text", 1, prefix_len)
                == F.substring("next_text", 1, prefix_len)
            ).cast("int"),
        )
        .filter(F.col("next_text").isNotNull())
        .select("doc_id", "prefix_match")
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """W2 gaps-and-islands: a new session starts when the gap from the
    previous event of the same user exceeds ``gap_minutes``. Returns per-user
    session stats (classic islands: lag → boundary flag → running sum)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = gap_minutes * 60
    epoch = F.unix_timestamp(F.col("ts"))  # TIMESTAMP_NTZ-safe (session tz UTC)
    marked = events.select("user_id", "event_id", "ts").withColumn(
        "new_session",
        F.when(epoch - F.lag(epoch).over(w) > gap_s, 1).otherwise(0).cast("int"),
    )
    sess = marked.withColumn(
        "session_id", F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.max("n_events").alias("max_session_events"),
        )
    )


def lag_relabel(events: DataFrame) -> DataFrame:
    """W3 (BIO-continuity analog, ref infer.py:399-405): per user in time
    order, an event repeating the previous event_type becomes 'I-<type>',
    otherwise 'B-<type>'."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("event_type").over(w)
    return events.select(
        "event_id",
        "user_id",
        F.when(prev == F.col("event_type"), F.concat(F.lit("I-"), "event_type"))
        .otherwise(F.concat(F.lit("B-"), "event_type"))
        .alias("bio_type"),
    )


def zero_after_marker(events: DataFrame, marker: str = "error") -> DataFrame:
    """W7 analog (ref postprocess.py:146-175): an event directly after a
    ``marker`` event of the same user is suppressed (value → 0)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("event_type").over(w)
    return events.select(
        "event_id",
        "user_id",
        F.when(prev == marker, F.lit(0.0)).otherwise(F.col("value")).alias("value_adj"),
    )


def zip_join(a: DataFrame, b: DataFrame, order_cols: list[str], compare_col: str) -> DataFrame:
    """J6 positional zip (ref scripts/compare_submissions.py:74-111): row i vs
    row i — explicit row_number over a deterministic order, then equi-join."""
    wa = Window.orderBy(*order_cols)
    aa = a.withColumn("rn", F.row_number().over(wa)).select(
        "rn", F.col(compare_col).alias("left_val")
    )
    bb = b.withColumn("rn", F.row_number().over(wa)).select(
        "rn", F.col(compare_col).alias("right_val")
    )
    return aa.join(bb, "rn").withColumn(
        "equal", (F.col("left_val") == F.col("right_val")).cast("int")
    )


def asof_join(
    left: DataFrame, right: DataFrame, key: str, ts: str,
    value_cols: list[str], tolerance_s: int | None = None,
) -> DataFrame:
    """As-of join — the temporal operator Spark's DataFrame API lacks: each
    left row picks the LATEST right row with right.ts <= left.ts per key
    (DuckDB/pandas ASOF semantics, inclusive). Implemented as union + keyed
    window with last(ignorenulls) — ONE shuffle on the key, no range
    cross-join, no per-key collect; ties at equal ts resolve right-before-
    left so an exactly-simultaneous right row matches. ``tolerance_s`` nulls
    matches older than the window (pandas merge_asof tolerance).

    Tie rule (deterministic): among right rows tied on (key, ts), the row
    with the GREATEST (value_cols) tuple wins — the window order carries the
    value struct as a final tiebreaker, so the pick is stable across runs and
    partitionings (without it, last() over an order that leaves ties is
    partition-layout-dependent).
    """
    lt = left.withColumn("_side", F.lit(1))
    rt = right.select(
        key, ts, *[F.col(c).alias(f"_asof_{c}") for c in value_cols]
    ).withColumn("_side", F.lit(0))
    u = lt.unionByName(rt, allowMissingColumns=True)
    tie = F.struct(*[F.col(f"_asof_{c}") for c in value_cols])
    w = (
        Window.partitionBy(key)
        .orderBy(ts, "_side", tie)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # the match is picked ATOMICALLY as one struct — per-column
    # last(ignorenulls) would blend columns across tied right rows when the
    # winner holds NULLs, fabricating a row that exists in neither input
    # (DuckDB/pandas ASOF pick a row, nulls and all)
    right_row = F.when(
        F.col("_side") == 0,
        F.struct(
            F.col(ts).alias("_ts"),
            *[F.col(f"_asof_{c}").alias(c) for c in value_cols],
        ),
    )
    u = u.withColumn("_asof_row", F.last(right_row, ignorenulls=True).over(w))
    out = u.filter(F.col("_side") == 1)
    for c in value_cols:
        out = out.withColumn(f"_asof_{c}", F.col("_asof_row")[c])
    out = out.withColumn("_asof_ts", F.col("_asof_row._ts")).drop("_asof_row", "_side")
    if tolerance_s is not None:
        stale = (
            F.unix_timestamp(F.col(ts)) - F.unix_timestamp(F.col("_asof_ts"))
        ) > tolerance_s
        for c in value_cols:
            out = out.withColumn(
                f"_asof_{c}", F.when(stale, F.lit(None)).otherwise(F.col(f"_asof_{c}"))
            )
        out = out.withColumn("_asof_ts", F.when(stale, F.lit(None)).otherwise(F.col("_asof_ts")))
    renames = {f"_asof_{c}": f"asof_{c}" for c in value_cols}
    for old, new in {**renames, "_asof_ts": "asof_ts"}.items():
        out = out.withColumnRenamed(old, new)
    return out


def zip_join_scalable(
    a: DataFrame, b: DataFrame, order_cols: list[str], compare_col: str,
    num_partitions: int = 32,
) -> DataFrame:
    """J6 at scale: ``zip_join``'s global row_number executes on a single
    partition. Here each side gets global positions from range partitions —
    per-partition row_number plus a broadcast offset table built from the
    per-partition counts (num_partitions rows; the only single-partition
    window runs over THAT tiny table). The final equi-join shuffles on rn
    like any key join. Output is identical to zip_join (equivalence-tested):
    global position in the (order_cols) total order is partition-layout-
    independent."""
    def with_rn(df: DataFrame) -> DataFrame:
        base = df.repartitionByRange(num_partitions, *order_cols)
        part = base.withColumn("pid", F.spark_partition_id())
        w = Window.partitionBy("pid").orderBy(*order_cols)
        local = part.withColumn("lrn", F.row_number().over(w))
        counts = local.groupBy("pid").agg(F.max("lrn").alias("cnt"))
        wc = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
        offsets = counts.withColumn("off", F.coalesce(F.sum("cnt").over(wc), F.lit(0)))
        return local.join(F.broadcast(offsets.select("pid", "off")), "pid").withColumn(
            "rn", F.col("lrn") + F.col("off")
        )

    aa = with_rn(a).select("rn", F.col(compare_col).alias("left_val"))
    bb = with_rn(b).select("rn", F.col(compare_col).alias("right_val"))
    return aa.join(bb, "rn").withColumn(
        "equal", (F.col("left_val") == F.col("right_val")).cast("int")
    )


def lead_prefix_flags_scalable(
    docs: DataFrame, prefix_len: int = 3, num_partitions: int = 32
) -> DataFrame:
    """W1 at scale. ``lead_prefix_flags`` uses a global-order window, which
    Spark executes on a SINGLE partition — correct, but a 100 TB red flag.

    Scalable form: range-partition by the sort key, lead WITHIN each range
    partition, then stitch the partition boundaries with the (tiny) table of
    per-partition first rows joined back to each partition's last row. Only
    the boundary table (num_partitions rows) is shuffled twice.

    Boundary-stitch correctness under EMPTY partitions: repartitionByRange
    can produce more partitions than distinct key ranges, so partition p's
    successor row may live in p+2 (p+1 empty). The stitch table is therefore
    built from the global order of NON-EMPTY pids — ``lead(first_text) over
    (orderBy pid)`` on the tiny per-partition-firsts summary — never from
    ``pid - 1`` arithmetic (which would silently drop p's last row whenever
    p+1 is empty). Equivalence-tested vs the plain form at
    num_partitions ≫ rows.
    """
    base = docs.select("doc_id", "text").repartitionByRange(
        num_partitions, "text", "doc_id"
    )
    part = base.withColumn("pid", F.spark_partition_id())
    w = Window.partitionBy("pid").orderBy("text", "doc_id")
    led = part.withColumn("next_text", F.lead("text").over(w)).withColumn(
        "rn_desc", F.row_number().over(
            Window.partitionBy("pid").orderBy(F.desc("text"), F.desc("doc_id"))
        )
    )
    firsts = (
        part.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("pid", F.col("text").alias("first_text"))
    )
    # tiny table (≤ num_partitions rows): single-partition window is fine
    stitch = firsts.withColumn(
        "first_next", F.lead("first_text").over(Window.orderBy("pid"))
    ).select("pid", "first_next")
    stitched = led.join(F.broadcast(stitch), "pid", "left").withColumn(
        "next_text",
        F.when(F.col("rn_desc") == 1, F.col("first_next")).otherwise(F.col("next_text")),
    )
    return (
        stitched.filter(F.col("next_text").isNotNull())
        .withColumn(
            "prefix_match",
            (
                F.substring("text", 1, prefix_len)
                == F.substring("next_text", 1, prefix_len)
            ).cast("int"),
        )
        .select("doc_id", "prefix_match")
    )
