"""Evaluation operators (SURVEY.md §2.12): set-based TP/FP/FN counters and
P/R/F1 reduction (E1 = J1 + U2 + A3/A4), expressed as plain joins so the
same query is ANSI-SQL-portable (no array columns needed in the shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def prf_counters(gold: DataFrame, pred: DataFrame, keys: list[str], type_col: str) -> DataFrame:
    """gold/pred: (keys..., type_col) distinct membership tables.
    TP = in both, FP = pred only, FN = gold only; grouped by type."""
    g = gold.select(*keys, type_col).distinct()
    p = pred.select(*keys, type_col).distinct()
    on = keys + [type_col]
    tp = g.join(p, on, "inner").groupBy(type_col).agg(F.count(F.lit(1)).alias("tp"))
    fp = p.join(g, on, "left_anti").groupBy(type_col).agg(F.count(F.lit(1)).alias("fp"))
    fn = g.join(p, on, "left_anti").groupBy(type_col).agg(F.count(F.lit(1)).alias("fn"))
    types = g.select(type_col).union(p.select(type_col)).distinct()
    return (
        types.join(tp, type_col, "left")
        .join(fp, type_col, "left")
        .join(fn, type_col, "left")
        .fillna(0, ["tp", "fp", "fn"])
        .select(type_col, F.col("tp").cast("bigint"), F.col("fp").cast("bigint"),
                F.col("fn").cast("bigint"))
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
