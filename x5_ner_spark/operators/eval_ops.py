"""Evaluation operators (SURVEY.md §2.12): set-based TP/FP/FN counters and
P/R/F1 reduction (E1 = J1 + U2 + A3/A4), expressed as plain joins so the
same query is ANSI-SQL-portable (no array columns needed in the shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def prf_counters(gold: DataFrame, pred: DataFrame, keys: list[str], type_col: str) -> DataFrame:
    """gold/pred: (keys..., type_col) distinct membership tables.
    TP = in both, FP = pred only, FN = gold only; grouped by type.

    One union + two aggregations (r9): the previous shape ran two
    side-distincts, an inner join, two left-anti joins, a type union, and
    three lookup joins — eight exchanges of the same membership rows. The
    union tags each row with its side; the first groupBy (on keys+type)
    both deduplicates within a side and computes membership flags; the
    second reduces per type. Identical counters (every type present on
    either side appears, zero-filled by the sums), ~half the wall time at
    sf1.0, and two map-side-combinable shuffles at any scale."""
    on = keys + [type_col]
    u = gold.select(*on).withColumn("_g", F.lit(1)).withColumn(
        "_p", F.lit(0)
    ).unionByName(
        pred.select(*on).withColumn("_g", F.lit(0)).withColumn("_p", F.lit(1))
    )
    m = u.groupBy(*on).agg(
        F.max("_g").alias("_ig"), F.max("_p").alias("_ip")
    )
    ig, ip = F.col("_ig") == 1, F.col("_ip") == 1
    return m.groupBy(type_col).agg(
        F.sum((ig & ip).cast("int")).cast("bigint").alias("tp"),
        F.sum((ip & ~ig).cast("int")).cast("bigint").alias("fp"),
        F.sum((ig & ~ip).cast("int")).cast("bigint").alias("fn"),
    )


def prf_metrics(counters: DataFrame, type_col: str) -> DataFrame:
    """A4: precision/recall/F1 per type, 0.0 on empty denominators
    (ref eval_submission_on_train.py:114-131)."""
    tp, fp, fn = F.col("tp"), F.col("fp"), F.col("fn")
    p = F.when(tp + fp > 0, tp / (tp + fp)).otherwise(F.lit(0.0))
    r = F.when(tp + fn > 0, tp / (tp + fn)).otherwise(F.lit(0.0))
    f1 = F.when(p + r > 0, 2 * p * r / (p + r)).otherwise(F.lit(0.0))
    return counters.select(
        type_col,
        F.round(p, 4).alias("precision"),
        F.round(r, 4).alias("recall"),
        F.round(f1, 4).alias("f1"),
    )


# ---------------------------------------------------------------- E2-E4

def char_label_diff(
    docs: DataFrame, gold_col: str = "gold_spans", pred_col: str = "pred_spans",
    id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """E2 (ref scripts/eval_preproc_val.py:42-141): project both span sets to
    per-char entity-type labels, then emit mismatch RANGES per document
    (gaps-and-islands over the mismatching char positions).

    Fully native: sequence→explode for the char axis; first covering span's
    type via filter+element_at (spans disjoint); islands via row_number
    difference. Scales: the char explosion is bounded per doc and partitions
    by doc id."""
    from pyspark.sql import Window

    def label_at(spans_col: str):
        covering = F.filter(
            F.col(spans_col),
            lambda s: (s["start"] <= F.col("i")) & (F.col("i") < s["end"]) & (s["tag"] != "O"),
        )
        return F.when(
            F.size(covering) > 0,
            F.substring_index(F.element_at(covering, 1)["tag"], "-", -1),
        ).otherwise(F.lit(""))

    chars = docs.select(
        id_col, gold_col, pred_col,
        F.explode(F.sequence(F.lit(0), F.length(text_col) - 1)).alias("i"),
    )
    labeled = chars.select(
        id_col, "i",
        label_at(gold_col).alias("g"),
        label_at(pred_col).alias("p"),
    ).filter(F.col("g") != F.col("p"))
    w = Window.partitionBy(id_col).orderBy("i")
    isl = labeled.withColumn("rn", F.row_number().over(w)).withColumn(
        "grp", F.col("i") - F.col("rn")
    )
    return (
        isl.groupBy(id_col, "grp", "g", "p")
        .agg(F.min("i").alias("start"), (F.max("i") + 1).alias("end"))
        .drop("grp")
        .withColumnRenamed("g", "gold_label")
        .withColumnRenamed("p", "pred_label")
    )


def error_buckets(
    gold_ents: DataFrame, pred_ents: DataFrame, id_col: str = "doc_id",
) -> DataFrame:
    """E3 (ref scripts/diff_analyser.py:30-91): bucket prediction errors per
    entity — exact TP, type swap (same boundaries, different type), boundary
    shift (same type, overlapping, different boundaries), plain FP / FN.
    Inputs: (id_col, start, end, etype) entity tables."""
    # gold/pred often share lineage (same extraction plan) — rename the join
    # key on each side so every equi-join below is an unambiguous column
    # reference, not a dataset-id-disambiguated self-join predicate
    g = gold_ents.select(F.col(id_col).alias("gid"), F.col("start").alias("gs"),
                         F.col("end").alias("ge"), F.col("etype").alias("gt"))
    p = pred_ents.select(F.col(id_col).alias("pid"), F.col("start").alias("ps"),
                         F.col("end").alias("pe"), F.col("etype").alias("pt"))
    same_doc = F.col("gid") == F.col("pid")

    exact = (g.join(p, same_doc & (F.col("gs") == F.col("ps"))
                    & (F.col("ge") == F.col("pe")) & (F.col("gt") == F.col("pt")))
             .select(F.col("gid").alias("doc"), F.lit("exact_match").alias("bucket"),
                     F.col("gt").alias("etype")))
    swap = (g.join(p, same_doc & (F.col("gs") == F.col("ps"))
                   & (F.col("ge") == F.col("pe")) & (F.col("gt") != F.col("pt")))
            .select(F.col("gid").alias("doc"), F.lit("type_swap").alias("bucket"),
                    F.col("gt").alias("etype")))
    shift = (g.join(p, same_doc & (F.col("gt") == F.col("pt"))
                    & (F.col("gs") < F.col("pe")) & (F.col("ge") > F.col("ps"))
                    & ((F.col("gs") != F.col("ps")) | (F.col("ge") != F.col("pe"))))
             .select(F.col("gid").alias("doc"), F.lit("boundary_shift").alias("bucket"),
                     F.col("gt").alias("etype")))
    # FN: gold with no overlapping same-doc pred at all; FP symmetric
    any_overlap = (g.join(p, same_doc & (F.col("gs") < F.col("pe"))
                          & (F.col("ge") > F.col("ps")), "left_semi"))
    fn = (g.exceptAll(any_overlap)
          .select(F.col("gid").alias("doc"), F.lit("false_negative").alias("bucket"),
                  F.col("gt").alias("etype")))
    any_overlap_p = (p.join(g, same_doc & (F.col("gs") < F.col("pe"))
                            & (F.col("ge") > F.col("ps")), "left_semi"))
    fp = (p.exceptAll(any_overlap_p)
          .select(F.col("pid").alias("doc"), F.lit("false_positive").alias("bucket"),
                  F.col("pt").alias("etype")))
    return (exact.unionByName(swap).unionByName(shift).unionByName(fn).unionByName(fp)
            .groupBy("bucket", "etype").agg(F.count(F.lit(1)).alias("n")))


def compare_submissions(a: DataFrame, b: DataFrame, key: str = "sample") -> DataFrame:
    """E4 (ref scripts/compare_submissions.py:20-33): order-insensitive
    annotation equality per key + overall identity stats. Inputs carry a
    'spans' array column; comparison is on sorted-distinct span sets."""
    from .span_native import sorted_distinct

    aa = a.select(F.col(key), sorted_distinct("spans").alias("sa"))
    bb = b.select(F.col(key), sorted_distinct("spans").alias("sb"))
    j = aa.join(bb, key, "full_outer").select(
        key,
        F.when(F.col("sa").isNull() | F.col("sb").isNull(), F.lit("missing"))
        .when(F.col("sa") == F.col("sb"), F.lit("identical"))
        .otherwise(F.lit("different"))
        .alias("status"),
    )
    return j.groupBy("status").agg(F.count(F.lit(1)).alias("n"))
