"""NerEngine facade tests: single-text oracle equality, DataFrame stages,
fast path equivalence."""

from __future__ import annotations

from pyspark.sql import functions as F

from x5_ner_spark.api import NerEngine
from x5_ner_spark.core.mention_pipeline import annotate as core_annotate


def test_single_text_is_the_oracle(spark):
    eng = NerEngine(spark, brand_lexicon=["простоквашино"])
    t = "молоко простоквашино 3,2% 1 л"
    assert eng.annotate_text(t) == core_annotate(t, frozenset(["простоквашино"]))
    assert eng.predict_entities("") == []
    assert eng.predict_entities("   ") == []


def test_dataframe_paths_agree(spark):
    eng = NerEngine(spark, brand_lexicon=["простоквашино"])
    rows = [("u1", "<p>кефир 1% данон</p>".encode(), "", "ru"),
            ("u2", None, "молоко простоквашино 2 л", "ru")]
    pages = spark.createDataFrame(rows, "url string, html binary, text string, lang string")
    staged = {tuple(r) for r in eng.triples(eng.extract_text(pages).select("url", "text")).collect()}
    fast = {tuple(r) for r in eng.triples_fast(pages, balance=False).collect()}
    assert staged == fast and len(fast) > 0
    ann = {r["url"]: r["annotation"]
           for r in eng.annotate(eng.extract_text(pages).select("url", "text")).collect()}
    assert ann["u2"].startswith("[(0, 6, 'B-TYPE')")


def test_jaccard_df_cap_drops_boilerplate(spark):
    from x5_ner_spark.operators.dedup import jaccard_pairs

    # every doc shares the boilerplate prefix; pairs survive without the cap
    # and disappear when the hot shingle is dropped
    rows = [(i, "common header boilerplate text unique" + str(i) + " tail" + str(i) + " x" + str(i)) for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    with_pairs = jaccard_pairs(docs, k=3, threshold=0.2)
    without = jaccard_pairs(docs, k=3, threshold=0.2, df_cap_fraction=0.2)
    assert with_pairs.count() > 0
    assert without.count() == 0
