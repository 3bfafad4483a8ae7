"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship mention→triple query on sf0.001;
``queries()`` maps every implemented SURVEY.md §2 operator family to a
(spark, sf_dir) → DataFrame callable; ``oracle_sql()`` gives the DuckDB
twin for the correctness gate. Column names/aliases match pairwise.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from x5_ner_spark.functions.columns import (
    cosine_similarity_col,
    portable_hash32,
    simple_tokens_col,
)
from x5_ner_spark.functions.scan import scan_parallel
from x5_ner_spark.operators import (
    crf_train,
    decision_log as decision_log_op,
    dedup,
    eval_ops,
    graph_ops,
    lm,
    similarity,
    text_stats,
    windows,
)

# ---------------------------------------------------------------- helpers

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# flagship mention dictionary over the English synthetic corpus — the
# minimum-slice analog (SURVEY.md §7.2) of TYPE_HINTS/brand lexicons
MENTION_DICT = {
    "join": "is_op", "filter": "is_op", "scan": "is_op", "window": "is_op",
    "agg": "is_op", "sort": "is_op",
    "table": "is_entity", "row": "is_entity", "column": "is_entity",
    "partition": "is_entity", "index": "is_entity",
    "spark": "is_system", "data": "is_system", "query": "is_system",
    "hash": "is_system", "batch": "is_system",
}
_DICT_SQL_VALUES = ", ".join(f"('{k}', '{v}')" for k, v in sorted(MENTION_DICT.items()))


# ---------------------------------------------------------------- queries

def q_kg_mentions_by_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship minimum slice: scan → tokenize → broadcast dictionary join →
    triple emission → aggregate (S-scan, P1, J2, A1)."""
    docs = scan_parallel(_t(spark, sf_dir, "documents"))
    dic = spark.createDataFrame(
        sorted(MENTION_DICT.items()), "term string, pred string"
    )
    toks = docs.select(
        "doc_id", F.explode(simple_tokens_col(F.lower("text"))).alias("term")
    )
    hits = toks.join(F.broadcast(dic), "term")
    return (
        hits.groupBy("pred", "term")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_mentions"),
        )
    )


def q_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/P3/P5/P6: predicate + derived projection."""
    docs = _t(spark, sf_dir, "documents")
    return docs.filter((F.col("lang") == "en") & (F.col("n_chars") >= 300)).select(
        "doc_id",
        F.length("text").alias("text_len"),
        F.upper("source").alias("source_uc"),
        (F.col("n_chars") % 7).cast("bigint").alias("bucket7"),
    )


def q_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 + A3-family: orders ⋈ customer, grouped rollup per segment."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
            F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
        )
    )


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-family pricing summary (TPC-H Q1 shape) on lineitem."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: length-banded Levenshtein join of corpus tokens vs lexicon."""
    docs = scan_parallel(_t(spark, sf_dir, "documents"))
    lex = spark.createDataFrame(
        [(t,) for t in sorted(MENTION_DICT)], "lex_term string"
    )
    toks = docs.select(
        F.explode(simple_tokens_col(F.lower("text"))).alias("token")
    ).distinct()
    joined = toks.join(
        F.broadcast(lex),
        (F.abs(F.length("token") - F.length("lex_term")) <= 1)
        & (F.levenshtein("token", "lex_term") <= 1),
    )
    return joined.select(
        "token", "lex_term", F.levenshtein("token", "lex_term").cast("bigint").alias("dist")
    )


def q_range_join_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7 cross-row variant: interval join of events.value against bins."""
    ev = _t(spark, sf_dir, "events")
    bins = spark.createDataFrame(
        [(0, 0.0, 5.0), (1, 5.0, 10.0), (2, 10.0, 15.0), (3, 15.0, 1e9)],
        "bin_id int, lo double, hi double",
    )
    j = ev.join(
        F.broadcast(bins), (ev.value >= bins.lo) & (ev.value < bins.hi)
    )
    return j.groupBy("bin_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


def q_token_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A2/W9: token frequency top-50, deterministic tiebreak."""
    return text_stats.token_frequencies(_t(spark, sf_dir, "documents"), top_k=50)


def q_prf_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1/A3/A4/U2: gold vs pred membership sets → per-type P/R/F1."""
    ev = _t(spark, sf_dir, "events")
    gold = ev.filter(F.col("event_id") % 2 == 0).select("user_id", "event_type")
    pred = ev.filter(F.col("event_id") % 2 == 1).select("user_id", "event_type")
    counters = eval_ops.prf_counters(gold, pred, ["user_id"], "event_type")
    metrics = eval_ops.prf_metrics(counters, "event_type")
    return counters.join(metrics, "event_type")


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 gaps-and-islands sessionization per user."""
    return windows.sessionize(_t(spark, sf_dir, "events"), gap_minutes=30)


def q_lag_relabel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 BIO-continuity relabel, aggregated per resulting label."""
    lab = windows.lag_relabel(_t(spark, sf_dir, "events"))
    return lab.groupBy("bio_type").agg(F.count(F.lit(1)).alias("n"))


def q_zero_after_marker(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W7 analog: suppress values directly after an 'error' event."""
    adj = windows.zero_after_marker(_t(spark, sf_dir, "events"))
    return adj.agg(
        F.round(F.sum("value_adj"), 2).alias("sum_adj"),
        F.sum((F.col("value_adj") == 0.0).cast("int")).cast("bigint").alias("n_zeroed"),
    )


def q_zip_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 positional zip of two deterministic halves."""
    docs = _t(spark, sf_dir, "documents")
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 == 1)
    z = windows.zip_join(a, b, ["doc_id"], "source")
    return z.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("equal").cast("bigint").alias("n_equal"),
    )


def q_union_provenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: union with provenance tag (ref merge_train_submission.py:32-39)."""
    docs = _t(spark, sf_dir, "documents")
    t = docs.filter(F.col("lang") == "en").withColumn("src_tag", F.lit("t"))
    s = docs.filter(F.col("lang") != "en").withColumn("src_tag", F.lit("s"))
    return (
        t.unionByName(s)
        .groupBy("src_tag", "source")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U4: deterministic hash split (portable md5) with per-source counts."""
    docs = _t(spark, sf_dir, "documents")
    split = F.when(portable_hash32(F.col("text")) % 10 < 8, "train").otherwise("val")
    return docs.select("source", split.alias("split")).groupBy("source", "split").agg(
        F.count(F.lit(1)).alias("n")
    )


def q_exact_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup (exact): duplicate-group stats."""
    d = dedup.exact_duplicates(_t(spark, sf_dir, "documents"))
    return d.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.coalesce(F.sum("n_docs"), F.lit(0)).cast("bigint").alias("n_docs_in_groups"),
    )


def q_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup (n-gram Jaccard) via shared-shingle blocking."""
    return dedup.jaccard_pairs(_t(spark, sf_dir, "documents"), k=3, threshold=0.5)


def q_minhash_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup (MinHash+LSH banding): candidate buckets with >1 doc."""
    return dedup.minhash_band_buckets(_t(spark, sf_dir, "documents"), k=3, n_hashes=8, band_size=2)


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup (SimHash, 16-bit) for a deterministic doc subset."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return dedup.simhash(docs, bits=16)


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity search: brute-force cosine top-3 for 5 query vectors."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return similarity.brute_force_topk(emb, queries, k=3)


def q_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup (embedding cosine) via banded random-projection LSH blocking."""
    emb = _t(spark, sf_dir, "embeddings")
    return dedup.embedding_near_dups(emb, threshold=0.35, n_bands=8, band_size=2)


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_stats.language_id(_t(spark, sf_dir, "documents"))


def q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule-based quality features + the learned-classifier serving facet:
    ``learned_q`` runs quality_train.quality_score_col (hashed-presence
    logistic regression, zero-UDF Column serving) under the deterministic
    stopword-lexicon weights so DuckDB can replay the exact expression —
    training itself is pinned by tests/test_quality_train.py."""
    from x5_ner_spark.operators.quality_train import lexicon_quality_model

    return text_stats.quality_scores(
        _t(spark, sf_dir, "documents"), learned=lexicon_quality_model()
    )


def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_stats.token_counts(_t(spark, sf_dir, "documents"))


def q_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_stats.fingerprints(_t(spark, sf_dir, "documents"))


def q_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """token_counts + fingerprints in one map-only scan (one gate slot)."""
    return text_stats.doc_stats(_t(spark, sf_dir, "documents"))


def q_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite gate query covering five reference behaviors in one registry
    slot (the driver evaluates only the first 50 entries — VERDICT r3 #5):
    O1/O3 global sort+limit (ref process_submission.py:66-77), A5
    stratification sizes (ref split_train_val.py:62-66), A6 column means
    (ref process_submission.py:78-82), E3 error buckets (ref
    diff_analyser.py:30-91), and W1/J5 next-row prefix comparison over a
    global total order (moved here from the standalone lead_prefix entry in
    r7 to free the slot for crf_decode — coverage unchanged), plus (r8) the
    substring-level dedup spans facet (repeated-n-gram ranges, Lee et al.
    2021 shape — operators/dedup.repeated_ngram_spans). Scalar-only
    surface (facet, key, sub, txt, num); num is always double so the union
    column has one dtype on both engines."""
    docs = _t(spark, sf_dir, "documents")
    lead_pref = (
        windows.lead_prefix_flags(docs)
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("prefix_match").cast("bigint").alias("n_prefix_matches"),
        )
        .select(
            F.lit("lead_prefix").alias("facet"),
            F.lit("").alias("key"),
            F.expr(
                "stack(2, 'n_pairs', CAST(n_pairs AS DOUBLE), "
                "'n_prefix_matches', CAST(n_prefix_matches AS DOUBLE)) AS (sub, num)"
            ),
        )
        .select("facet", "key", "sub", F.lit("").alias("txt"), "num")
    )
    sort_limit = (
        docs.orderBy(F.asc("text"), F.asc("doc_id"))
        .limit(20)
        .select(
            F.lit("sort_limit").alias("facet"),
            F.col("doc_id").cast("string").alias("key"),
            F.lit("head40").alias("sub"),
            F.substring("text", 1, 40).alias("txt"),
            F.col("doc_id").cast("double").alias("num"),
        )
    )
    group_sizes = (
        docs.groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.lit("group_sizes").alias("facet"),
            F.col("source").alias("key"),
            F.col("lang").alias("sub"),
            F.lit("").alias("txt"),
            F.col("n").cast("double").alias("num"),
        )
    )
    summary = (
        docs.groupBy("lang")
        .agg(
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
            F.round(F.avg(F.length("text")), 4).alias("avg_len"),
        )
        .select(
            F.lit("summary_stats").alias("facet"),
            F.col("lang").alias("key"),
            F.expr(
                "stack(2, 'avg_chars', avg_chars, 'avg_len', avg_len) AS (sub, num)"
            ),
        )
        .select("facet", "key", "sub", F.lit("").alias("txt"), "num")
    )
    buckets = q_error_buckets(spark, sf_dir).select(
        F.lit("error_buckets").alias("facet"),
        F.col("bucket").alias("key"),
        F.col("etype").alias("sub"),
        F.lit("").alias("txt"),
        F.col("n").cast("double").alias("num"),
    )
    # r8: substring-level exact dedup (Lee et al. repeated-n-gram spans,
    # operators/dedup.repeated_ngram_spans) — merged token ranges covered
    # by corpus-repeated 8-grams, one row per span, end exclusive
    # r8: CCNet-shape bigram-LM scoring (operators/lm.py) — per-doc NLL in
    # nats/token; the value is an integer micro-nat sum so it is exactly
    # reproducible on the DuckDB side (see lm.py module doc)
    lm_rows = lm.lm_perplexity(docs).select(
        F.lit("lm_nll").alias("facet"),
        F.col("doc_id").cast("string").alias("key"),
        F.lit("nll").alias("sub"),
        F.lit("").alias("txt"),
        F.col("nll").alias("num"),
    )
    dup_spans = dedup.repeated_ngram_spans(docs, n=8, min_count=2).select(
        F.lit("dup_ngrams").alias("facet"),
        F.col("doc_id").cast("string").alias("key"),
        F.col("span_start").cast("string").alias("sub"),
        F.lit("").alias("txt"),
        F.col("span_end").cast("double").alias("num"),
    )
    return (
        sort_limit.unionByName(group_sizes)
        .unionByName(summary)
        .unionByName(buckets)
        .unionByName(lead_pref)
        .unionByName(dup_spans)
        .unionByName(lm_rows)
    )


def q_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components (large-star/small-star) over user adjacency."""
    return graph_ops.user_components(_t(spark, sf_dir, "events"))


def q_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1/O3: global total-order sort + limit with deterministic tiebreak."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.orderBy(F.asc("text"), F.asc("doc_id"))
        .limit(20)
        .select("doc_id", F.substring("text", 1, 40).alias("head40"))
    )


def q_group_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: stratification group sizes (ref split_train_val.py:62-66)."""
    return (
        _t(spark, sf_dir, "documents")
        .groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_summary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: column means (ref process_submission.py:78-82)."""
    return (
        _t(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
            F.round(F.avg(F.length("text")), 4).alias("avg_len"),
        )
    )


def q_numeric_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-profiling operator: per-group min/max/exact median/p90 (linear
    interpolation — order statistics, drift-free across engines) over
    lineitem prices. exact=True (percentile(), sort-based per group) is
    deliberate for the cross-engine hash; exact=False is the tested
    approx_percentile 100× switch (operators/text_stats.numeric_profile)."""
    from x5_ner_spark.operators.text_stats import numeric_profile

    li = _t(spark, sf_dir, "lineitem").withColumn(
        "_price", F.col("l_extendedprice").cast("double")
    )
    return numeric_profile(li, "l_returnflag", "_price", exact=True)


def q_error_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3: entity-diff buckets over deterministic synthetic entity tables
    derived from lineitem (gold = even line numbers, pred = odd)."""
    from x5_ner_spark.operators.eval_ops import error_buckets

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("doc_id"),
        (F.col("l_partkey") % 100).cast("int").alias("start"),
        ((F.col("l_partkey") % 100) + 5).cast("int").alias("end"),
        F.col("l_returnflag").alias("etype"),
        "l_linenumber",
    )
    gold = li.filter(F.col("l_linenumber") % 2 == 0).drop("l_linenumber").distinct()
    pred = li.filter(F.col("l_linenumber") % 2 == 1).drop("l_linenumber").distinct()
    return error_buckets(gold, pred)


def q_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector aggregation: per-label embedding centroid norm + dims (the
    array itself stays out of the comparison; summary stats are hashed)."""
    cent = similarity.label_centroids(_t(spark, sf_dir, "embeddings"))
    norm = F.sqrt(F.aggregate("centroid", F.lit(0.0), lambda a, v: a + v * v))
    return cent.select(
        "label",
        F.size("centroid").alias("dim"),
        F.round(norm, 4).alias("centroid_norm"),
        F.round(F.element_at("centroid", 1), 4).alias("c0"),
    )


def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: seeded-sample quantizer + argmax cell assignment
    (deterministic — fully mirrored by the DuckDB oracle)."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.ivf_topk(emb, emb.filter(F.col("vec_id") < 5), k=3)


def q_term_contexts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F21 relational form: tokens within ±2 positions of an anchor term
    ('spark'), counted — the char-window context operator as a positional
    self-join over an exploded token table."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.posexplode(simple_tokens_col(F.lower("text"))).alias("pos", "term")
    )
    anchors = toks.filter(F.col("term") == "spark").select(
        "doc_id", F.col("pos").alias("apos")
    )
    ctx = toks.join(anchors, "doc_id").filter(
        (F.abs(F.col("pos") - F.col("apos")) <= 2) & (F.col("pos") != F.col("apos"))
    )
    return (
        ctx.groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("term"))
        .limit(30)
    )


def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 events by value per event_type (row_number window, deterministic
    tiebreaks) — the generic top-k-per-group shape linking uses."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.desc("value"), F.asc("event_id")
    )
    return (
        ev.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 2)
        .select("event_type", "event_id", F.round("value", 2).alias("value"),
                F.col("rk").cast("int").alias("rk"))
    )


def q_dedup_dropped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-fingerprint dedup drop list: every doc in a duplicate group
    (same first-5-token fingerprint) except the minimum-id keeper. (The
    corpus has no byte-exact duplicates — exact_dups covers that trivially —
    so this exercises the keeper/drop policy on real groups.)"""
    docs = _t(spark, sf_dir, "documents")
    prefix = F.concat_ws(" ", F.slice(simple_tokens_col(F.lower("text")), 1, 5))
    fps = docs.select("doc_id", F.md5(prefix).alias("fp"))
    w = Window.partitionBy("fp")
    return (
        fps.withColumn("keep", F.min("doc_id").over(w))
        .withColumn("grp_n", F.count(F.lit(1)).over(w))
        .filter((F.col("grp_n") > 1) & (F.col("doc_id") != F.col("keep")))
        .select("doc_id", F.col("keep").alias("keep_id"))
    )


def q_near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus dedup end to end: Jaccard candidate pairs → connected
    components → canonical keeper (max n_chars, tie min id) → drop list."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.jaccard_pairs(docs, k=3, threshold=0.5)
    return dedup.near_dup_clusters(docs, pairs)


def q_gopher_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style corpus quality filter (word bounds, mean word length,
    alpha fraction, duplicate-3-gram repetition, stopword presence) — all
    native HOF expressions, map-only."""
    return text_stats.gopher_filters(_t(spark, sf_dir, "documents"))


_URL_CASE_SQL = (
    "CASE WHEN doc_id % 3 = 0 THEN '/?utm_source=x&q=1#frag' "
    "WHEN doc_id % 3 = 1 THEN '?fbclid=abc&utm_medium=mail' ELSE '/' END"
)


def _synth_urls(docs: DataFrame) -> DataFrame:
    """Deterministic URL fixture from doc_id (the test tables carry no url
    column); mirrored literally by the oracle SQL so the gate exercises the
    canonicalization semantics end to end."""
    return docs.select(
        F.concat(
            F.lit("HTTPS://Site"), (F.col("doc_id") % 50).cast("string"),
            F.lit(".Example:443/Path/"), F.col("doc_id").cast("string"),
            F.when(F.col("doc_id") % 3 == 0, F.lit("/?utm_source=x&q=1#frag"))
            .when(F.col("doc_id") % 3 == 1, F.lit("?fbclid=abc&utm_medium=mail"))
            .otherwise(F.lit("/")),
        ).alias("url")
    )


def q_canonical_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Web-corpus URL canonicalization (dedup/revisit key): lowercase
    scheme+host, strip default port / fragment / tracking params / trailing
    slash — native regexp, map-only."""
    return text_stats.canonical_urls(_synth_urls(_t(spark, sf_dir, "documents")))


def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc top-3 tf-idf terms (smooth idf), deterministic tiebreak."""
    return text_stats.tfidf_top_terms(_t(spark, sf_dir, "documents"), k=3)


MIX_FRACTIONS = {"src0": 1.0, "src1": 0.5, "src2": 0.25, "src3": 0.1}


def q_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix sampler: per-source deterministic hash-Bernoulli keep at
    pinned fractions; per-source kept counts (the mixture audit)."""
    from x5_ner_spark.operators.split import mix_sample

    kept = mix_sample(_t(spark, sf_dir, "documents"), MIX_FRACTIONS)
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    )


def q_c4_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style cleaning flags (code brace, policy phrases, qualifying
    sentences) — map-only native HOFs."""
    return text_stats.c4_filters(_t(spark, sf_dir, "documents"))


def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Posting lists (term -> sorted doc ids + df), hapaxes dropped.

    Gate surface rule: no array/map columns in queries() output (the driver
    canonicalizer sorts through pandas and dies on list cells) — the
    array-typed operator stays for library callers; here the postings array
    is flattened to a comma-joined string on BOTH engines."""
    idx = text_stats.inverted_index(_t(spark, sf_dir, "documents"), min_df=5)
    return idx.select(
        "term", "df", F.concat_ws(",", F.col("postings")).alias("postings_csv")
    )


def q_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top adjacent-bigram collocations by PMI (min pair count 5)."""
    return text_stats.pmi_collocations(_t(spark, sf_dir, "documents"))


def q_pack_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: per-source contiguous layout into 128-token
    budget-aligned training packs (deterministic greedy-contiguous)."""
    from x5_ner_spark.operators.split import pack_documents

    return pack_documents(_t(spark, sf_dir, "documents"), budget_tokens=128)


def q_near_dup_clusters_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus dedup, PRODUCTION path (the 100 TB shape): MinHash-LSH band
    buckets → candidate pairs → exact Jaccard rescore → connected components
    → keeper. The oracle replays banding + rescore + CC in SQL —
    max_bucket=None EXPLICITLY: the SQL models exact LSH (every bucket
    self-joined), so the oracle query must pin the exact semantics rather
    than inherit the production hub-skew default (DEFAULT_MAX_BUCKET), or
    the two definitions would silently diverge on any corpus with a bucket
    past the cap. The valve's own behavior is pinned by
    tests/test_hub_skew.py instead."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.near_dup_clusters_lsh(docs, k=3, threshold=0.5, max_bucket=None)


def q_scrub_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing over the corpus, with deterministic synthetic PII
    appended per doc (the clean fixture corpus contains none) so every
    pattern is exercised; emits per-category counts + md5 of the scrubbed
    text (full replacement parity, not just counts)."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" reach user"), F.col("doc_id").cast("string"),
            F.lit("@example.com or https://site"), F.col("doc_id").cast("string"),
            F.lit(".example/p?x=1 ip 10.0."), (F.col("doc_id") % 256).cast("string"),
            F.lit(".7 tel +7 915 12"),
            F.lpad((F.col("doc_id") % 100).cast("string"), 2, "0"),
            F.lit("-77"),
        ).alias("text"),
    )
    scrubbed = text_stats.scrub_pii(aug)
    return scrubbed.select(
        "doc_id", "n_url", "n_email", "n_ipv4", "n_phone",
        F.md5("scrubbed").alias("scrub_fp"),
    )


def q_crf_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N3/N4 decode surface (VERDICT r6 #3): bounded-window Viterbi over the
    stub emission softmax with the hash-derived stub CRF transitions (ref
    infer.py:186-189 viterbi_decode). The DuckDB oracle replays the shared
    tokenization+softmax prefix, then the DP UNROLLED over 8 positions —
    per-step (prev,label) score terms materialized as columns, first-max-wins
    argmax backpointers, masked carry for shorter docs, and the backtrack as
    chained CTEs (lateral-alias substitution would blow up exponentially)."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 120)
    return crf_train.crf_decode_tokens(docs, t_max=8)


def q_decision_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8 proper: per-word decision log (token, BIO label, cascade reason,
    probabilities, feature flags) over a deterministic document subset, with
    an empty brand lexicon. The DuckDB oracle replays the ENTIRE pipeline in
    SQL: WORD_RE tokenization with char offsets, the md5→LCG→softmax stub
    model, the decision ladder/guards, the pinned short-word break, and the
    BIO continuity rewrite."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return decision_log_op.decision_log(docs)


# lexicon for the in_lex/fuzzy decision-log gate: entry lengths are chosen so
# every WRatio comparison against ≤8-char corpus tokens reduces to exact SQL
# (see _decision_log_sql), and lev-reachable pairs agree between char-level
# Python and byte-level DuckDB levenshtein ('барни'/'барна' differ in 1 byte)
DL_LEX = ["spars", "table", "барни", "sparkdataquery"]
DL_SUFFIX = " молоко барни барна творог"


def q_decision_log_lex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision log WITH a brand lexicon: gates the in_lex exact check, the
    WRatio≥90 path (substring / near-equal algebra), the Levenshtein
    fallback, and the lex-conditioned cascade branches. Texts get a
    deterministic Cyrillic suffix so sub-ladder tokens actually reach the
    lexicon branches (the Latin corpus always triggers the confidence
    ladder first)."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 150).select(
        "doc_id", F.concat(F.col("text"), F.lit(DL_SUFFIX)).alias("text")
    )
    return decision_log_op.decision_log(docs, frozenset(DL_LEX))


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval decontamination: training docs sharing ≥1 5-gram with the
    'eval set' (deterministic slice doc_id % 10 == 0), with shared-shingle
    counts. The eval shingle set broadcasts; the train scan is map-only."""
    docs = _t(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 10 != 0)
    ev = docs.filter(F.col("doc_id") % 10 == 0)
    return dedup.decontaminate(train, ev, k=5)


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click matched to the user's latest purchase at or
    before the click (union + keyed window — the operator Spark lacks;
    oracle uses DuckDB's native ASOF LEFT JOIN)."""
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    buys = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts", "value")
    j = windows.asof_join(clicks, buys, key="user_id", ts="ts", value_cols=["value"])
    return j.select(
        "event_id", "user_id",
        F.round("asof_value", 4).alias("purchase_value"),
        F.unix_timestamp("asof_ts").cast("bigint").alias("purchase_epoch"),
    )


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-5-iteration PageRank over the user adjacency graph — the KG
    analytics op downstream consumers run on the materialized edge tables."""
    ev = _t(spark, sf_dir, "events")
    return graph_ops.pagerank(graph_ops.user_adjacency_edges(ev), iters=5)


def q_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured decode: parse events.props JSON, aggregate per type
    (get_json_object → JVM-side JSON path, no UDF)."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.groupBy("event_type").agg(
        F.round(F.avg(k), 4).alias("avg_k"),
        F.max(k).alias("max_k"),
        F.sum(F.when(k.isNull(), 1).otherwise(0)).cast("bigint").alias("n_null"),
    )


def q_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity search (LSH-bucketed approximate top-k); hash-derived
    hyperplanes are deterministic and mirrored by the DuckDB oracle."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return similarity.lsh_topk(emb, queries, k=3, n_planes=6)


# ------------------------------------------------------------ the contract

def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_kg_mentions_by_pred(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    reg = {
        "kg_mentions_by_pred": q_kg_mentions_by_pred,
        "filter_project": q_filter_project,
        "join_agg": q_join_agg,
        "tpch_q1": q_tpch_q1,
        "fuzzy_join": q_fuzzy_join,
        "range_join_bins": q_range_join_bins,
        "token_topk": q_token_topk,
        "prf_eval": q_prf_eval,
        "crf_decode": q_crf_decode,
        "sessionize": q_sessionize,
        "lag_relabel": q_lag_relabel,
        "zero_after_marker": q_zero_after_marker,
        "zip_join": q_zip_join,
        "union_provenance": q_union_provenance,
        "hash_split": q_hash_split,
        "exact_dups": q_exact_dups,
        "jaccard_pairs": q_jaccard_pairs,
        "minhash_buckets": q_minhash_buckets,
        "simhash": q_simhash,
        "cosine_topk": q_cosine_topk,
        "embedding_near_dups": q_embedding_near_dups,
        "lang_id": q_lang_id,
        "quality": q_quality,
        "doc_stats": q_doc_stats,
        "components": q_components,
        "lsh_topk": q_lsh_topk,
        "term_contexts": q_term_contexts,
        "topk_per_group": q_topk_per_group,
        "dedup_dropped": q_dedup_dropped,
        "label_centroids": q_label_centroids,
        "ivf_topk": q_ivf_topk,
        "json_props": q_json_props,
        "decision_log": q_decision_log,
        "near_dup_clusters": q_near_dup_clusters,
        "near_dup_clusters_lsh": q_near_dup_clusters_lsh,
        "gopher_filters": q_gopher_filters,
        "canonical_urls": q_canonical_urls,
        "tfidf_top_terms": q_tfidf_top_terms,
        "mix_sample": q_mix_sample,
        "pack_documents": q_pack_documents,
        "c4_filters": q_c4_filters,
        "numeric_profile": q_numeric_profile,
        "pmi_collocations": q_pmi_collocations,
        "inverted_index": q_inverted_index,
        "scrub_pii": q_scrub_pii,
        "decision_log_lex": q_decision_log_lex,
        "pagerank": q_pagerank,
        "decontaminate": q_decontaminate,
        "asof_join": q_asof_join,
        "corpus_report": q_corpus_report,
    }
    # Driver contract: only the FIRST 50 registry entries are evaluated
    # (VERDICT r3 #5 — four green queries silently fell off at 54). Composite
    # queries (doc_stats, corpus_report) keep every covered behavior inside
    # the window; an explicit raise (not `assert`, which vanishes under
    # `python -O`) keeps the invariant load-bearing.
    if len(reg) > 50:
        raise ValueError(f"driver evaluates only 50 queries, got {len(reg)}")
    return reg


# shared SQL fragments
_TOKENS = (
    "SELECT doc_id, t.term FROM documents, "
    "LATERAL unnest(string_split(lower(text), ' ')) AS t(term) WHERE t.term <> ''"
)
_H32 = "CAST(CAST('0x' || substr(md5({x}), 1, 8) AS UBIGINT) AS BIGINT)"


def _cos_sql(a: str, b: str, digits: int) -> str:
    """Explicit double-precision cosine between two FLOAT[] columns —
    term-for-term the same formula as functions.columns.cosine_similarity_col
    (float→double per element, sequential sum), so rounded values agree
    across engines even at 6 decimals."""
    def dot(x: str, y: str) -> str:
        return (f"list_sum(list_transform(range(len({x})), "
                f"i -> CAST({x}[i+1] AS DOUBLE) * CAST({y}[i+1] AS DOUBLE)))")
    return (f"ROUND({dot(a, b)} / (sqrt({dot(a, a)}) * sqrt({dot(b, b)})), {digits})")


def _stub_prob_prefix(n_docs: int, suffix: str = "") -> str:
    """Shared WITH-clause prefix (CTEs ``d`` … ``pp``) replaying the engine's
    tokenization + stub emission model in DuckDB: WORD_RE tokenization with
    char offsets (runs of [\\p{L}\\p{N}-] trimmed to the first letter), then
    md5 → 64-bit LCG → scaled noise + heuristic biases → softmax — one p0…p8
    probability row per word. Consumed by BOTH the decision-log oracle (the
    cascade reads these probs) and the crf_decode oracle (the Viterbi DP
    reads them as emissions), so the two stay bit-identical by construction."""
    from x5_ner_spark.core.cascade import STOPWORDS, TYPE_HINTS

    hints = ", ".join(f"'{w}'" for w in sorted(TYPE_HINTS))
    stops = ", ".join(f"'{w}'" for w in sorted(STOPWORDS))
    A, C = 6364136223846793005, 1442695040888963407
    a_hi, a_lo, c_hi, c_lo, b32 = A >> 32, A & 0xFFFFFFFF, C >> 32, C & 0xFFFFFFFF, 1 << 32

    # chained LCG CTEs in (hi, lo) 32-bit halves — UBIGINT-only arithmetic
    # (HUGEINT %/// are ~100x slower in DuckDB), every intermediate < 2^64:
    # s*A + C mod 2^64 = [(hi*A_lo + lo*A_hi + carries + C_hi) mod 2^32]*2^32
    #                    + (lo*A_lo + C_lo) mod 2^32.
    # u_i consumes state i+1 (Python steps then emits); the double conversion
    # hi*2^32 + lo rounds once, identical to Python's state / 2**64.
    lcg_ctes = ""
    for k in range(9):
        lo_next = f"((l{k} * {a_lo} % {b32}) + {c_lo}) % {b32}"
        hi_next = (f"(h{k} * {a_lo} % {b32} + l{k} * {a_hi} % {b32}"
                   f" + l{k} * {a_lo} // {b32}"
                   f" + ((l{k} * {a_lo} % {b32}) + {c_lo}) // {b32} + {c_hi}) % {b32}")
        lcg_ctes += (
            f", st{k+1} AS MATERIALIZED (SELECT *, {lo_next} AS l{k+1},"
            f" {hi_next} AS h{k+1} FROM st{k})"
        )

    us = ", ".join(
        f"(CAST(h{i+1} AS DOUBLE) * 4294967296 + CAST(l{i+1} AS DOUBLE))"
        f" / 18446744073709551616.0 AS u{i}"
        for i in range(9)
    )
    # BIO order: 0=O 1=B-TYPE 2=I-TYPE 3=B-BRAND 4=I-BRAND 5..8 VOLUME/PERCENT
    # lg* not l*: the LCG lo-halves already occupy l0..l9 and SELECT *
    # carries them forward — a bare l0 alias would silently collide
    logits = ", ".join([
        "u0 * 0.5 + 1.0 + (CASE WHEN bias_o THEN 3.0 ELSE 0.0 END) AS lg0",
        "u1 * 0.5 + (CASE WHEN bias_type AND NOT cont THEN 4.0 ELSE 0.0 END) AS lg1",
        "u2 * 0.5 + (CASE WHEN bias_type AND cont THEN 4.0 ELSE 0.0 END) AS lg2",
        "u3 * 0.5 + (CASE WHEN bias_brand THEN 3.5 ELSE 0.0 END) AS lg3",
    ] + [f"u{i} * 0.5 AS lg{i}" for i in range(4, 9)])
    lmax = "GREATEST(" + ", ".join(f"lg{i}" for i in range(9)) + ")"
    es = ", ".join(f"exp(lg{i} - {lmax}) AS e{i}" for i in range(9))
    z = " + ".join(f"e{i}" for i in range(9))
    ps = ", ".join(f"e{i} / ({z}) AS p{i}" for i in range(9))

    return f"""d AS MATERIALIZED (SELECT doc_id, text || '{suffix}' AS text FROM documents WHERE doc_id < {n_docs}),
        pieces AS MATERIALIZED (
          SELECT doc_id,
                 unnest(regexp_split_to_array(text, '[^\\p{{L}}\\p{{N}}-]')) AS piece,
                 unnest(range(len(regexp_split_to_array(text, '[^\\p{{L}}\\p{{N}}-]')))) AS idx
          FROM d),
        toks0 AS MATERIALIZED (
          SELECT doc_id, piece, idx,
                 COALESCE(SUM(length(piece)) OVER (PARTITION BY doc_id ORDER BY idx
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + idx AS piece_start,
                 length(regexp_extract(piece, '^[\\p{{N}}-]*')) AS lead_len
          FROM pieces),
        toks AS MATERIALIZED (
          SELECT doc_id,
                 substr(piece, CAST(lead_len + 1 AS INT)) AS tok,
                 CAST(piece_start + lead_len AS INT) AS start,
                 CAST(piece_start + length(piece) AS INT) AS "end",
                 row_number() OVER (PARTITION BY doc_id ORDER BY idx) - 1 AS wid
          FROM toks0 WHERE substr(piece, CAST(lead_len + 1 AS INT)) <> ''),
        nt AS MATERIALIZED (
          SELECT *, regexp_replace(lower(tok), '[^0-9a-zа-яё]+', '', 'g') AS norm,
                 regexp_replace(replace(lower(trim(tok)), 'ё', 'е'),
                                '[^0-9a-zа-я]+', '', 'g') AS tok_lex,
                 wid > 0 AS cont
          FROM toks),
        st0 AS MATERIALIZED (
          SELECT *, CAST('0x' || substr(md5(norm), 1, 8) AS UBIGINT) AS h0,
                 CAST('0x' || substr(md5(norm), 9, 8) AS UBIGINT) AS l0,
                 (norm = '' OR regexp_full_match(norm, '[0-9]+')
                  OR norm IN ({stops})) AS bias_o,
                 norm IN ({hints}) AND NOT (norm = '' OR regexp_full_match(norm, '[0-9]+')
                  OR norm IN ({stops})) AS bias_type,
                 regexp_full_match(norm, '[A-Za-z]+') AND length(norm) >= 3
                  AND NOT norm IN ({hints})
                  AND NOT (norm = '' OR regexp_full_match(norm, '[0-9]+')
                           OR norm IN ({stops})) AS bias_brand
          FROM nt){lcg_ctes},
        uu AS MATERIALIZED (SELECT *, {us} FROM st9),
        lg AS MATERIALIZED (SELECT *, {logits} FROM uu),
        ee AS MATERIALIZED (SELECT *, {es} FROM lg),
        pp AS MATERIALIZED (SELECT *, {ps} FROM ee)"""


def _decision_log_sql(
    n_docs: int = 200, lexicon: "list[str] | None" = None, suffix: str = "",
) -> str:
    """DuckDB replica of the FULL decision-log pipeline: the shared
    tokenization + stub-model softmax prefix (_stub_prob_prefix), then the
    cascade ladder/guards with the pinned short-word break and BIO
    continuity via lag. Float-sensitive constants (t*1.3, 0.55+0.10) are
    precomputed in Python and inlined as double literals so both engines
    compare against bit-identical thresholds.

    With ``lexicon`` the in_lex / fuzzy path is replayed too: in_lex is exact
    lex-norm equality; WRatio≥90 reduces per pair to EXACT SQL because every
    entry is either ≥13 chars (len_ratio ≥1.5 vs ≤8-char corpus tokens →
    hit ⟺ substring containment at scale 0.9) or ≤6 chars (len_ratio <1.5 →
    ratio ≥90 over summed length <20 ⟺ equal, or |Δlen|=1 ∧ lev=1 ∧ Σlen≥10
    — indel=1 ⟺ lev=1 when lengths differ by 1); the Levenshtein fallback
    maps to DuckDB levenshtein() (byte-based, so lev-reachable entries must
    be ASCII or differ in exactly one byte — asserted by the chosen lexicon).
    ``suffix`` is appended to every text (both engines) to plant tokens that
    exercise the lexicon branches."""
    from x5_ner_spark.core.cascade import STOPWORDS, TYPE_HINTS

    hints = ", ".join(f"'{w}'" for w in sorted(TYPE_HINTS))
    stops = ", ".join(f"'{w}'" for w in sorted(STOPWORDS))

    if lexicon:
        in_lex_sql = "tok_lex IN (" + ", ".join(f"'{c}'" for c in sorted(lexicon)) + ")"
        wr_terms, lev_terms = [], []
        for c in sorted(lexicon):
            lc = len(c)
            lr = f"(GREATEST(length(tok_lex), {lc}) * 1.0 / LEAST(length(tok_lex), {lc}))"
            contains = (f"(CASE WHEN length(tok_lex) <= {lc} "
                        f"THEN position(tok_lex IN '{c}') ELSE position('{c}' IN tok_lex) END) > 0")
            wr_terms.append(
                f"(CASE WHEN {lr} >= 1.5 THEN ({lr} < 8 AND {contains}) "
                f"ELSE (tok_lex = '{c}' OR (abs(length(tok_lex) - {lc}) = 1 "
                f"AND levenshtein(tok_lex, '{c}') = 1 AND length(tok_lex) + {lc} >= 10)) END)"
            )
            lev_terms.append(
                f"(abs(length(tok_lex) - {lc}) <= max_d AND levenshtein(tok_lex, '{c}') <= max_d)"
            )
        fuzzy_sql = (
            f"(NOT ({in_lex_sql})) AND ("
            f"(length(tok_lex) >= 3 AND (" + " OR ".join(wr_terms) + ")) OR ("
            + " OR ".join(lev_terms) + "))"
        )
    else:
        in_lex_sql, fuzzy_sql = "FALSE", "FALSE"

    ladder = []
    for t in (0.9, 0.85, 0.8, 0.75, 0.7, 0.65, 0.6, 0.55):
        ts = repr(t * 1.3)  # Python double product, inlined bit-exactly
        ladder.append(f"WHEN p_brand_sum >= {ts} OR p_brand > {t} THEN 'strong_brand_{t}'")
        ladder.append(f"WHEN p_type_sum >= {ts} OR p_type > {t} THEN 'strong_type_{t}'")
        ladder.append(f"WHEN p_o >= {t} THEN 'strong_o_{t}'")
    ladder_sql = "\n            ".join(ladder)
    et_plus = repr(0.55 + 0.10)  # entity_thresh + 0.10, Python double sum

    return f"""
        WITH {_stub_prob_prefix(n_docs, suffix)},
        feats AS MATERIALIZED (
          SELECT doc_id, tok, start, "end", wid, norm,
                 GREATEST(p3, p4) AS p_brand, p3 + p4 AS p_brand_sum,
                 GREATEST(p1, p2) AS p_type, p1 + p2 AS p_type_sum,
                 p0 AS p_o,
                 regexp_full_match(norm, '[A-Za-z]+') AS pure_lat,
                 regexp_full_match(norm, '[A-Za-z]+') AND length(norm) <= 2 AS short_lat,
                 regexp_matches(norm, '[AEIOUYaeiouy]') AS has_vowel,
                 norm IN ({hints}) AND NOT norm IN ({stops})
                   AND NOT regexp_full_match(norm, '[0-9]+') AS looks_type,
                 in_lex, fuzzy_hit
          FROM (SELECT *, ({in_lex_sql}) AS in_lex, ({fuzzy_sql}) AS fuzzy_hit
                FROM (SELECT *, CASE WHEN length(tok_lex) <= 6 THEN 1 ELSE 2 END AS max_d
                      FROM pp))),
        brk AS MATERIALIZED (
          SELECT f.* FROM feats f
          LEFT JOIN (SELECT doc_id, MIN(wid) AS brk_wid FROM feats
                     WHERE length(norm) <= 2 AND p_type < 0.4 AND p_brand < 0.4
                     GROUP BY doc_id) b USING (doc_id)
          WHERE b.brk_wid IS NULL OR f.wid < b.brk_wid),
        decided AS MATERIALIZED (
          SELECT *, CASE
            {ladder_sql}
            WHEN short_lat AND NOT in_lex AND NOT fuzzy_hit THEN 'short_lat_no_lex'
            WHEN looks_type AND (in_lex OR fuzzy_hit)
              AND p_brand >= GREATEST(CAST(0.8 AS DOUBLE), p_type + CAST(0.2 AS DOUBLE), {et_plus})
              THEN 'brand_over_type_very_strong'
            WHEN looks_type AND p_type >= GREATEST(CAST(0.55 AS DOUBLE), p_brand + CAST(0.07 AS DOUBLE)) THEN 'clear_type'
            WHEN looks_type THEN 'looks_type_guard'
            WHEN (in_lex OR fuzzy_hit) AND p_type >= GREATEST(CAST(0.55 AS DOUBLE), p_brand + CAST(0.07 AS DOUBLE)) THEN 'type_over_lex'
            WHEN (in_lex OR fuzzy_hit) AND p_brand >= CAST(0.2 AS DOUBLE) AND p_brand >= p_type - CAST(0.05 AS DOUBLE) THEN 'lex_or_fuzzy_brand'
            WHEN (in_lex OR fuzzy_hit) THEN 'lex_conf_too_low'
            WHEN p_type >= GREATEST(CAST(0.55 AS DOUBLE), p_brand + CAST(0.07 AS DOUBLE)) THEN 'clear_type'
            WHEN p_brand >= GREATEST(CAST(0.8 AS DOUBLE), p_type + CAST(0.1 AS DOUBLE)) THEN 'clear_brand'
            ELSE 'fallback' END AS reason
          FROM brk),
        based AS MATERIALIZED (
          SELECT *, CASE
            WHEN reason LIKE 'strong_brand%' OR reason IN
              ('clear_brand', 'brand_over_type_very_strong', 'lex_or_fuzzy_brand') THEN 'BRAND'
            WHEN reason LIKE 'strong_type%' OR reason IN ('clear_type', 'type_over_lex') THEN 'TYPE'
            WHEN reason IN ('looks_type_guard', 'fallback', 'lex_conf_too_low')
              THEN (CASE WHEN p_type >= CAST(0.15 AS DOUBLE) THEN 'TYPE' ELSE 'O' END)
            ELSE 'O' END AS base
          FROM decided),
        labeled AS MATERIALIZED (
          SELECT *, CASE WHEN base = 'O' THEN 'O'
                         WHEN lag(base, 1, 'O') OVER (PARTITION BY doc_id ORDER BY wid) = base
                           THEN 'I-' || base
                         ELSE 'B-' || base END AS label
          FROM based)
        SELECT doc_id, tok AS token_text, start, "end", label, reason,
               ROUND(p_brand, 3) AS p_brand, ROUND(p_type, 3) AS p_type,
               in_lex, fuzzy_hit, pure_lat, short_lat, has_vowel,
               ROUND(p_brand_sum, 3) AS p_brand_sum,
               ROUND(p_type_sum, 3) AS p_type_sum, ROUND(p_o, 3) AS p_o
        FROM labeled
    """


def _crf_decode_sql(n_docs: int = 120, t_max: int = 8) -> str:
    """DuckDB replica of crf_decode_tokens: the shared tokenization + stub
    softmax prefix gives per-word emission rows p0…p8; the Viterbi DP is
    UNROLLED over ``t_max`` positions. Per step t: the 81 (prev,label) score
    terms (s_prev + trans) + emission are MATERIALIZED as columns (w{t}),
    then per label the max (GREATEST) and a first-max-wins argmax CASE give
    score + backpointer (v{t}); docs shorter than t_max carry scores and
    identity backpointers, exactly the masking viterbi_decode_batch does.
    The end-transition argmax and the backtrack run as CHAINED CTEs (b7→b0):
    lateral column aliases are substituted, not CSE'd — a nested backtrack
    expression would blow up 9^8 (the decision_log LCG lesson). All CRF
    parameters are Python floats inlined via repr(), so both engines compare
    bit-identical doubles; sum order matches numpy's left-to-right
    elementwise (score + trans) + emission."""
    from x5_ner_spark.core.crf import stub_crf_params
    from x5_ner_spark.core.spans import BIO_TAGS

    start, trans, end = stub_crf_params()
    c_n = len(BIO_TAGS)
    T1 = t_max - 1

    def first_max_case(terms: "list[str]") -> str:
        cases = []
        for p in range(len(terms) - 1):
            cond = " AND ".join(
                f"{terms[p]} >= {terms[q]}" for q in range(p + 1, len(terms))
            )
            cases.append(f"WHEN {cond} THEN {p}")
        return "CASE " + " ".join(cases) + f" ELSE {len(terms) - 1} END"

    # seed: s0_c = start[c] + p_c (numpy: start[None, :] + em[:, 0])
    v0 = ", ".join(
        f"({float(start[c])!r}) + p{c} AS s0_{c}" for c in range(c_n)
    )
    steps = ""
    for t in range(1, t_max):
        terms = ", ".join(
            f"(v.s{t-1}_{p} + ({float(trans[p][c])!r})) + e.p{c} AS t_{p}_{c}"
            for c in range(c_n)
            for p in range(c_n)
        )
        steps += (
            f", w{t} AS MATERIALIZED (SELECT v.*, e.doc_id IS NOT NULL AS act, "
            f"{terms} FROM v{t-1} v LEFT JOIN emis e "
            f"ON e.doc_id = v.doc_id AND e.wid = {t})"
        )
        carry = "".join(
            f"bp{tau}_{c}, " for tau in range(1, t) for c in range(c_n)
        )
        new_cols = []
        for c in range(c_n):
            col_terms = [f"t_{p}_{c}" for p in range(c_n)]
            g = "GREATEST(" + ", ".join(col_terms) + ")"
            new_cols.append(f"CASE WHEN act THEN {g} ELSE s{t-1}_{c} END AS s{t}_{c}")
            new_cols.append(
                f"CASE WHEN act THEN ({first_max_case(col_terms)}) "
                f"ELSE {c} END AS bp{t}_{c}"
            )
        steps += (
            f", v{t} AS MATERIALIZED (SELECT doc_id, {carry}"
            + ", ".join(new_cols)
            + f" FROM w{t})"
        )

    fin = ", ".join(
        f"s{T1}_{c} + ({float(end[c])!r}) AS f{c}" for c in range(c_n)
    )
    back = (
        f", bt{T1} AS MATERIALIZED (SELECT *, "
        + first_max_case([f"f{c}" for c in range(c_n)])
        + f" AS b{T1} FROM fin)"
    )
    for t in range(T1, 0, -1):
        walk = " ".join(f"WHEN {c} THEN bp{t}_{c}" for c in range(c_n))
        back += (
            f", bt{t-1} AS MATERIALIZED (SELECT *, "
            f"CASE b{t} {walk} END AS b{t-1} FROM bt{t})"
        )
    pick_b = "CASE t.wid " + " ".join(
        f"WHEN {t} THEN b{t}" for t in range(t_max)
    ) + " END"
    label = "CASE (" + pick_b + ") " + " ".join(
        f"WHEN {i} THEN '{tag}'" for i, tag in enumerate(BIO_TAGS)
    ) + " END"

    return f"""
        WITH {_stub_prob_prefix(n_docs)},
        emis AS MATERIALIZED (
          SELECT doc_id, wid, tok, {", ".join(f"p{c}" for c in range(c_n))}
          FROM pp WHERE wid < {t_max}),
        v0 AS MATERIALIZED (SELECT doc_id, {v0} FROM emis WHERE wid = 0)
        {steps},
        fin AS MATERIALIZED (SELECT *, {fin} FROM v{T1})
        {back}
        SELECT t.doc_id, CAST(t.wid AS INT) AS wid, t.tok AS token_text,
               {label} AS label
        FROM emis t JOIN bt0 USING (doc_id)
    """


def _proj_bucket_sql(vec: str, n_planes: int, salt_prefix: str = "#p") -> str:
    """DuckDB replica of similarity.projection_buckets: sign bits of
    hash-derived hyperplane projections, projection rounded to 6 decimals."""
    bits = []
    for j in range(n_planes):
        sign = ("CASE WHEN CAST('0x' || substr(md5(CAST(i AS VARCHAR) || "
                f"'{salt_prefix}{j}'), 1, 8) AS UBIGINT) % 2 = 0 "
                "THEN 1.0 ELSE -1.0 END")
        proj = (f"ROUND(list_sum(list_transform(range(len({vec})), "
                f"i -> CAST({vec}[i+1] AS DOUBLE) * {sign})), 6)")
        bits.append(f"(CASE WHEN {proj} >= 0 THEN {1 << j} ELSE 0 END)")
    return "(" + " + ".join(bits) + ")"


def oracle_sql() -> dict[str, str]:
    h_text = _H32.format(x="text")
    sql: dict[str, str] = {}

    sql["kg_mentions_by_pred"] = f"""
        WITH dict(term, pred) AS (VALUES {_DICT_SQL_VALUES}),
        toks AS ({_TOKENS})
        SELECT d.pred, d.term,
               COUNT(DISTINCT toks.doc_id) AS n_docs,
               COUNT(*) AS n_mentions
        FROM toks JOIN dict d USING (term)
        GROUP BY d.pred, d.term
    """

    sql["filter_project"] = """
        SELECT doc_id, length(text) AS text_len, upper(source) AS source_uc,
               CAST(n_chars % 7 AS BIGINT) AS bucket7
        FROM documents WHERE lang = 'en' AND n_chars >= 300
    """

    sql["join_agg"] = """
        SELECT c_mktsegment, COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS sum_price,
               ROUND(AVG(o_totalprice), 2) AS avg_price
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    """

    sql["tpch_q1"] = """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               ROUND(AVG(l_quantity), 4) AS avg_qty,
               COUNT(*) AS count_order
        FROM lineitem WHERE l_shipdate <= '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """

    sql["fuzzy_join"] = f"""
        WITH lex(lex_term) AS (VALUES {", ".join(f"('{t}')" for t in sorted(MENTION_DICT))}),
        toks AS (SELECT DISTINCT t.term AS token FROM ({_TOKENS}) AS t(doc_id, term))
        SELECT token, lex_term, CAST(levenshtein(token, lex_term) AS BIGINT) AS dist
        FROM toks JOIN lex ON abs(length(token) - length(lex_term)) <= 1
                          AND levenshtein(token, lex_term) <= 1
    """

    sql["range_join_bins"] = """
        WITH bins(bin_id, lo, hi) AS (VALUES (0, 0.0, 5.0), (1, 5.0, 10.0),
                                             (2, 10.0, 15.0), (3, 15.0, 1e9))
        SELECT bin_id, COUNT(*) AS n_events, ROUND(SUM(value), 2) AS sum_value
        FROM events JOIN bins ON value >= lo AND value < hi
        GROUP BY bin_id
    """

    sql["token_topk"] = f"""
        WITH toks AS ({_TOKENS.replace("lower(text)", "text")})
        SELECT term, COUNT(*) AS freq FROM toks
        GROUP BY term ORDER BY freq DESC, term ASC LIMIT 50
    """

    sql["prf_eval"] = """
        WITH gold AS (SELECT DISTINCT user_id, event_type FROM events WHERE event_id % 2 = 0),
        pred AS (SELECT DISTINCT user_id, event_type FROM events WHERE event_id % 2 = 1),
        tp AS (SELECT event_type, COUNT(*) AS tp FROM gold JOIN pred USING (user_id, event_type) GROUP BY event_type),
        fp AS (SELECT event_type, COUNT(*) AS fp FROM pred ANTI JOIN gold USING (user_id, event_type) GROUP BY event_type),
        fn AS (SELECT event_type, COUNT(*) AS fn FROM gold ANTI JOIN pred USING (user_id, event_type) GROUP BY event_type),
        types AS (SELECT DISTINCT event_type FROM (SELECT event_type FROM gold UNION SELECT event_type FROM pred)),
        c AS (SELECT t.event_type,
                     CAST(COALESCE(tp.tp, 0) AS BIGINT) AS tp,
                     CAST(COALESCE(fp.fp, 0) AS BIGINT) AS fp,
                     CAST(COALESCE(fn.fn, 0) AS BIGINT) AS fn
              FROM types t LEFT JOIN tp USING (event_type)
                           LEFT JOIN fp USING (event_type)
                           LEFT JOIN fn USING (event_type))
        SELECT event_type, tp, fp, fn,
               ROUND(CASE WHEN tp+fp > 0 THEN tp/(tp+fp) ELSE 0.0 END, 4) AS precision,
               ROUND(CASE WHEN tp+fn > 0 THEN tp/(tp+fn) ELSE 0.0 END, 4) AS recall,
               ROUND(CASE WHEN (CASE WHEN tp+fp>0 THEN tp/(tp+fp) ELSE 0.0 END)
                         + (CASE WHEN tp+fn>0 THEN tp/(tp+fn) ELSE 0.0 END) > 0
                     THEN 2*(CASE WHEN tp+fp>0 THEN tp/(tp+fp) ELSE 0.0 END)
                           *(CASE WHEN tp+fn>0 THEN tp/(tp+fn) ELSE 0.0 END)
                          /((CASE WHEN tp+fp>0 THEN tp/(tp+fp) ELSE 0.0 END)
                           +(CASE WHEN tp+fn>0 THEN tp/(tp+fn) ELSE 0.0 END))
                     ELSE 0.0 END, 4) AS f1
        FROM c
    """

    sql["sessionize"] = """
        WITH m AS (
          SELECT user_id, event_id, ts,
                 CASE WHEN epoch(ts) - lag(epoch(ts)) OVER
                        (PARTITION BY user_id ORDER BY ts, event_id) > 1800
                      THEN 1 ELSE 0 END AS new_session
          FROM events),
        s AS (SELECT user_id, event_id,
                     SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                            ROWS UNBOUNDED PRECEDING) AS session_id
              FROM m),
        per AS (SELECT user_id, session_id, COUNT(*) AS n_events
                FROM s GROUP BY user_id, session_id)
        SELECT user_id, COUNT(*) AS n_sessions, MAX(n_events) AS max_session_events
        FROM per GROUP BY user_id
    """

    sql["lag_relabel"] = """
        WITH l AS (SELECT event_id, user_id, event_type,
                          lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
                   FROM events)
        SELECT CASE WHEN prev = event_type THEN 'I-' || event_type
                    ELSE 'B-' || event_type END AS bio_type,
               COUNT(*) AS n
        FROM l GROUP BY 1
    """

    sql["zero_after_marker"] = """
        WITH l AS (SELECT value,
                          lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
                   FROM events),
        adj AS (SELECT CASE WHEN prev = 'error' THEN 0.0 ELSE value END AS value_adj FROM l)
        SELECT ROUND(SUM(value_adj), 2) AS sum_adj,
               CAST(SUM(CASE WHEN value_adj = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zeroed
        FROM adj
    """

    sql["zip_join"] = """
        WITH a AS (SELECT row_number() OVER (ORDER BY doc_id) AS rn, source AS left_val
                   FROM documents WHERE doc_id % 2 = 0),
        b AS (SELECT row_number() OVER (ORDER BY doc_id) AS rn, source AS right_val
              FROM documents WHERE doc_id % 2 = 1)
        SELECT COUNT(*) AS n_rows,
               CAST(SUM(CASE WHEN left_val = right_val THEN 1 ELSE 0 END) AS BIGINT) AS n_equal
        FROM a JOIN b USING (rn)
    """

    sql["union_provenance"] = """
        SELECT src_tag, source, COUNT(*) AS n FROM (
          SELECT 't' AS src_tag, source FROM documents WHERE lang = 'en'
          UNION ALL
          SELECT 's' AS src_tag, source FROM documents WHERE lang <> 'en'
        ) GROUP BY src_tag, source
    """

    sql["hash_split"] = f"""
        SELECT source,
               CASE WHEN {h_text} % 10 < 8 THEN 'train' ELSE 'val' END AS split,
               COUNT(*) AS n
        FROM documents GROUP BY source, split
    """

    sql["exact_dups"] = """
        WITH fp AS (SELECT md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fp,
                           COUNT(*) AS n_docs
                    FROM documents GROUP BY 1 HAVING COUNT(*) > 1)
        SELECT COUNT(*) AS n_groups,
               CAST(COALESCE(SUM(n_docs), 0) AS BIGINT) AS n_docs_in_groups
        FROM fp
    """

    jacc_ctes = """toks AS (
          SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
          FROM documents),
        sh AS (
          SELECT DISTINCT doc_id,
                 array_to_string(toks[i+1:i+3], ' ') AS shingle
          FROM toks, LATERAL unnest(range(len(toks) - 2)) AS r(i)
          WHERE len(toks) >= 3),
        sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
        inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
                  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                  GROUP BY 1, 2),
        jp AS (
          SELECT id_a, id_b,
                 CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) AS jacc
          FROM inter
          JOIN sizes sa ON sa.doc_id = id_a
          JOIN sizes sb ON sb.doc_id = id_b)"""

    sql["jaccard_pairs"] = f"""
        WITH {jacc_ctes}
        SELECT id_a, id_b, ROUND(jacc, 4) AS jaccard FROM jp WHERE ROUND(jacc, 4) >= 0.5
    """

    sql["near_dup_clusters"] = f"""
        WITH RECURSIVE {jacc_ctes},
        pairs AS (SELECT id_a, id_b FROM jp WHERE ROUND(jacc, 4) >= 0.5),
        und AS (SELECT id_a AS a, id_b AS b FROM pairs
                UNION SELECT id_b, id_a FROM pairs),
        nds AS (SELECT DISTINCT a AS node FROM und),
        reach AS (
          SELECT node, node AS r FROM nds
          UNION
          SELECT u.b AS node, reach.r FROM reach JOIN und u ON u.a = reach.node),
        comp AS (SELECT node, MIN(r) AS cluster_id FROM reach GROUP BY node),
        withq AS (
          SELECT c.node, c.cluster_id, d.n_chars
          FROM comp c JOIN documents d ON d.doc_id = c.node),
        keep AS (
          SELECT cluster_id, node AS keep_id FROM (
            SELECT *, row_number() OVER (PARTITION BY cluster_id
                                         ORDER BY n_chars DESC, node ASC) AS rn
            FROM withq) WHERE rn = 1)
        SELECT w.node AS doc_id, w.cluster_id, k.keep_id,
               w.node <> k.keep_id AS dropped
        FROM withq w JOIN keep k USING (cluster_id)
    """

    # one md5 per shingle + affine permutations mod prime — literal
    # coefficients come from the SAME fixed LCG the Spark side inlines
    # (operators/dedup.minhash_coeffs), so both engines agree bit-for-bit
    from x5_ner_spark.operators.dedup import MH_PRIME, minhash_coeffs

    mh_cols = ", ".join(
        f"MIN((h * {a} + {b}) % {MH_PRIME}) AS mh{i}"
        for i, (a, b) in enumerate(minhash_coeffs(8))
    )
    band_selects = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, md5(CAST(mh{2*b} AS VARCHAR) || '|' || CAST(mh{2*b+1} AS VARCHAR)) AS bucket FROM sig"
        for b in range(4)
    )
    sql["minhash_buckets"] = f"""
        WITH toks AS (
          SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
          FROM documents),
        sh AS (
          SELECT DISTINCT doc_id, array_to_string(toks[i+1:i+3], ' ') AS shingle
          FROM toks, LATERAL unnest(range(len(toks) - 2)) AS r(i)
          WHERE len(toks) >= 3),
        hs AS MATERIALIZED (
          SELECT doc_id,
                 CAST(CAST('0x' || substr(md5(shingle), 1, 8) AS UBIGINT) AS BIGINT) AS h
          FROM sh),
        sig AS (SELECT doc_id, {mh_cols} FROM hs GROUP BY doc_id),
        bands AS ({band_selects})
        SELECT band, bucket, COUNT(*) AS n_docs, MIN(doc_id) AS min_doc
        FROM bands GROUP BY band, bucket HAVING COUNT(*) > 1
    """

    from x5_ner_spark.operators.text_stats import (
        EN_STOPWORDS, RU_STOPWORDS,
        GOPHER_MIN_WORDS, GOPHER_MAX_WORDS, GOPHER_MIN_MEAN_WORD_LEN,
        GOPHER_MAX_MEAN_WORD_LEN, GOPHER_MIN_ALPHA_WORD_FRAC,
        GOPHER_MAX_DUP_3GRAM_FRAC, GOPHER_MIN_STOPWORD_HITS,
    )

    stoplist = ", ".join(f"'{w}'" for w in EN_STOPWORDS + RU_STOPWORDS)
    sql["gopher_filters"] = f"""
        WITH t AS (
          SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
          FROM documents),
        f AS (
          SELECT doc_id,
            CAST(len(toks) AS INT) AS n_words,
            ROUND(CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
                  / len(toks), 4) AS mean_word_len,
            ROUND(CAST(len(list_filter(toks, x ->
                    regexp_matches(x, '[A-Za-zА-Яа-яё]'))) AS DOUBLE)
                  / len(toks), 4) AS alpha_word_frac,
            CASE WHEN len(toks) >= 3 THEN
              ROUND(1.0 - CAST(len(list_distinct(list_transform(
                      range(len(toks) - 2),
                      i -> array_to_string(toks[i+1:i+3], ' ')))) AS DOUBLE)
                    / (len(toks) - 2), 4)
            ELSE 0.0 END AS dup_3gram_frac,
            CAST(len(list_filter(toks, x -> lower(x) IN ({stoplist}))) AS INT)
              AS stopword_hits
          FROM t)
        SELECT *,
          (n_words >= {GOPHER_MIN_WORDS} AND n_words <= {GOPHER_MAX_WORDS}
           AND mean_word_len >= {GOPHER_MIN_MEAN_WORD_LEN}
           AND mean_word_len <= {GOPHER_MAX_MEAN_WORD_LEN}
           AND alpha_word_frac >= {GOPHER_MIN_ALPHA_WORD_FRAC}
           AND dup_3gram_frac <= {GOPHER_MAX_DUP_3GRAM_FRAC}
           AND stopword_hits >= {GOPHER_MIN_STOPWORD_HITS}) AS keep
        FROM f
    """

    # URL canonicalization: the synthetic url construction and every regexp
    # rule mirror text_stats.canonical_urls verbatim (RE2-safe patterns;
    # DuckDB backrefs are \\1 where Spark uses $1)
    track = r"([?&])(utm_[A-Za-z]+|fbclid|gclid)=[^&#]*&"
    sql["canonical_urls"] = rf"""
        WITH u AS (
          SELECT 'HTTPS://Site' || CAST(doc_id % 50 AS VARCHAR) ||
                 '.Example:443/Path/' || CAST(doc_id AS VARCHAR) ||
                 {_URL_CASE_SQL} AS url
          FROM documents),
        h AS (SELECT url,
                     regexp_extract(url, '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)', 1) AS head
              FROM u),
        c0 AS (SELECT url, lower(head) || substr(url, length(head) + 1) AS c FROM h),
        c1 AS (SELECT url, regexp_replace(c, '#.*$', '') AS c FROM c0),
        c2a AS (SELECT url, regexp_replace(c, '^(http://[^/:?#]+):80($|[/?])', '\1\2') AS c FROM c1),
        c2 AS (SELECT url, regexp_replace(c, '^(https://[^/:?#]+):443($|[/?])', '\1\2') AS c FROM c2a),
        -- 'g': Spark regexp_replace is replace-ALL per pass; DuckDB default
        -- replaces only the first match, which would diverge on runs of 3+
        -- adjacent tracking params
        c3 AS (SELECT url, regexp_replace(c, '{track}', '\1', 'g') AS c FROM c2),
        c4 AS (SELECT url, regexp_replace(c, '{track}', '\1', 'g') AS c FROM c3),
        c5 AS (SELECT url, regexp_replace(c, '[?&](utm_[A-Za-z]+|fbclid|gclid)=[^&#]*$', '') AS c FROM c4),
        c6 AS (SELECT url, regexp_replace(c, '\?$', '') AS c FROM c5),
        c7 AS (SELECT url, regexp_replace(c, '(.+?)/$', '\1') AS c FROM c6)
        SELECT url, c AS canon_url,
               lower(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]*)', 1)) AS host,
               regexp_extract(c, '^[a-z][a-z0-9+.-]*://[^/?#]*(/[^?#]*)?', 1) AS path
        FROM c7
    """

    mix_h = _H32.format(x="CAST(doc_id AS VARCHAR) || '#mix42'")
    mix_conds = " OR ".join(
        f"(source = '{s}' AND {mix_h} % 1000000 < {int(round(f * 1000000))})"
        for s, f in sorted(MIX_FRACTIONS.items())
    )
    sql["mix_sample"] = f"""
        SELECT source, COUNT(*) AS n_kept,
               MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
        FROM documents
        WHERE {mix_conds}
        GROUP BY source
    """

    from x5_ner_spark.operators.text_stats import C4_POLICY_PHRASES

    phrase_sum = " + ".join(
        f"CAST(contains(lower(text), '{p}') AS INT)" for p in C4_POLICY_PHRASES
    )
    sql["inverted_index"] = """
        WITH t AS (
          SELECT DISTINCT doc_id, tt.term
          FROM documents, LATERAL unnest(
            list_filter(string_split(lower(text), ' '), x -> x <> '')) AS tt(term)),
        agg AS (
          SELECT term, list_sort(list(doc_id)) AS postings, COUNT(*) AS df
          FROM t GROUP BY term)
        SELECT term, CAST(df AS INT) AS df,
               array_to_string(postings, ',') AS postings_csv
        FROM agg WHERE df >= 5 AND df <= 10000
    """

    sql["pmi_collocations"] = """
        WITH toks AS (
          SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
          FROM documents),
        uni AS (
          SELECT t.t, COUNT(*) AS c
          FROM toks, LATERAL unnest(toks.toks) AS t(t) GROUP BY t.t),
        n AS (SELECT SUM(c) AS n_tokens FROM uni),
        bg AS (
          SELECT toks.toks[i+1] AS a, toks.toks[i+2] AS b
          FROM toks, LATERAL unnest(range(len(toks.toks) - 1)) AS r(i)
          WHERE len(toks.toks) >= 2),
        pairs AS (
          SELECT a, b, COUNT(*) AS c_ab FROM bg GROUP BY a, b
          HAVING COUNT(*) >= 5),
        scored AS (
          SELECT p.a, p.b, p.c_ab,
                 ROUND(ln(CAST(n.n_tokens AS DOUBLE) * p.c_ab
                          / (ua.c * ub.c)), 4) AS pmi
          FROM pairs p
          JOIN uni ua ON ua.t = p.a
          JOIN uni ub ON ub.t = p.b
          CROSS JOIN n)
        SELECT * FROM scored ORDER BY pmi DESC, a ASC, b ASC LIMIT 20
    """

    sql["c4_filters"] = f"""
        WITH s AS (
          SELECT doc_id, text,
                 list_filter(list_transform(regexp_split_to_array(text, '[.!?]+'),
                                            x -> trim(x)), x -> x <> '') AS sents
          FROM documents),
        f AS (
          SELECT doc_id,
                 contains(text, '{{') AS has_code_brace,
                 ({phrase_sum}) > 0 AS has_policy_phrase,
                 CAST(len(sents) AS INT) AS n_sentences,
                 CAST(len(list_filter(sents, x ->
                       len(list_filter(string_split(x, ' '), t -> t <> '')) >= 3))
                      AS INT) AS n_good_sentences
          FROM s)
        SELECT *,
               (NOT has_code_brace) AND (NOT has_policy_phrase)
                 AND n_good_sentences >= 1 AS keep
        FROM f
    """

    sql["pack_documents"] = """
        WITH t AS (
          SELECT doc_id, source,
                 CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
                      AS BIGINT) AS n_tokens
          FROM documents),
        c AS (
          SELECT *,
                 SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - n_tokens AS "offset"
          FROM t)
        SELECT doc_id, source AS "group", n_tokens,
               -- window SUM is HUGEINT in DuckDB; the driver's pandas canon
               -- coerces un-cast HUGEINT to float64 ('0.0' vs Spark's '0')
               CAST("offset" AS BIGINT) AS "offset",
               CAST(FLOOR("offset" / 128.0) AS BIGINT) AS pack_id,
               FLOOR(("offset" + n_tokens - 1) / 128.0)
                 > FLOOR("offset" / 128.0) AS spans_packs
        FROM c
    """

    sql["tfidf_top_terms"] = """
        WITH toks AS (
          SELECT doc_id, t.term FROM documents,
          LATERAL unnest(string_split(lower(text), ' ')) AS t(term)
          WHERE t.term <> ''),
        tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
        n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
        idf AS (SELECT term, ln((n.n_docs + 1.0) / (COUNT(*) + 1.0)) + 1.0 AS idf
                FROM tf, n GROUP BY term, n.n_docs),
        scored AS (
          SELECT doc_id, term, ROUND(tf * idf, 4) AS tfidf
          FROM tf JOIN idf USING (term)),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY doc_id
                                       ORDER BY tfidf DESC, term ASC) AS rank
          FROM scored)
        SELECT doc_id, term, tfidf, CAST(rank AS INT) AS rank
        FROM ranked WHERE rank <= 3
    """

    sql["near_dup_clusters_lsh"] = f"""
        WITH RECURSIVE toks AS (
          SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
          FROM documents),
        sh AS (
          SELECT DISTINCT doc_id, array_to_string(toks[i+1:i+3], ' ') AS shingle
          FROM toks, LATERAL unnest(range(len(toks) - 2)) AS r(i)
          WHERE len(toks) >= 3),
        hs AS MATERIALIZED (
          SELECT doc_id,
                 CAST(CAST('0x' || substr(md5(shingle), 1, 8) AS UBIGINT) AS BIGINT) AS h
          FROM sh),
        sig AS (SELECT doc_id, {mh_cols} FROM hs GROUP BY doc_id),
        bands AS ({band_selects}),
        cand AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
        sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
        inter AS (
          SELECT c.id_a, c.id_b, COUNT(*) AS n_inter
          FROM cand c
          JOIN sh sa ON sa.doc_id = c.id_a
          JOIN sh sb ON sb.doc_id = c.id_b AND sb.shingle = sa.shingle
          GROUP BY c.id_a, c.id_b),
        jp AS (
          SELECT id_a, id_b,
                 CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) AS jacc
          FROM inter
          JOIN sizes sa ON sa.doc_id = id_a
          JOIN sizes sb ON sb.doc_id = id_b),
        pairs AS (SELECT id_a, id_b FROM jp WHERE ROUND(jacc, 4) >= 0.5),
        und AS (SELECT id_a AS a, id_b AS b FROM pairs
                UNION SELECT id_b, id_a FROM pairs),
        nds AS (SELECT DISTINCT a AS node FROM und),
        reach AS (
          SELECT node, node AS r FROM nds
          UNION
          SELECT u.b AS node, reach.r FROM reach JOIN und u ON u.a = reach.node),
        comp AS (SELECT node, MIN(r) AS cluster_id FROM reach GROUP BY node),
        withq AS (
          SELECT c.node, c.cluster_id, d.n_chars
          FROM comp c JOIN documents d ON d.doc_id = c.node),
        keep AS (
          SELECT cluster_id, node AS keep_id FROM (
            SELECT *, row_number() OVER (PARTITION BY cluster_id
                                         ORDER BY n_chars DESC, node ASC) AS rn
            FROM withq) WHERE rn = 1)
        SELECT w.node AS doc_id, w.cluster_id, k.keep_id,
               w.node <> k.keep_id AS dropped
        FROM withq w JOIN keep k USING (cluster_id)
    """

    h_tok = _H32.format(x="t || ''")
    sql["simhash"] = f"""
        WITH toks AS (
          SELECT doc_id, t.t FROM (SELECT doc_id, text FROM documents WHERE doc_id < 100) d,
          LATERAL unnest(string_split(lower(d.text), ' ')) AS t(t) WHERE t.t <> ''),
        h AS (SELECT doc_id, {h_tok} AS hv FROM toks),
        contrib AS (
          SELECT doc_id, b.b AS bit,
                 SUM(CASE WHEN (hv >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS s
          FROM h, LATERAL unnest(range(16)) AS b(b)
          GROUP BY doc_id, b.b)
        SELECT doc_id,
               CAST(SUM(CASE WHEN s > 0 THEN CAST(POW(2, bit) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
        FROM contrib GROUP BY doc_id
    """

    # explicit double cosine (_cos_sql), not list_cosine_similarity: the
    # builtin returns FLOAT on FLOAT[] inputs and the driver's pandas canon
    # then carries float32 artifacts (0.263500005 for 0.2635)
    sql["cosine_topk"] = f"""
        WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
        scored AS (
          SELECT q.query_id, e.vec_id AS neighbor_id,
                 {_cos_sql("q.qv", "e.embedding", 4)} AS cos
          FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id),
        ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                                ORDER BY cos DESC, neighbor_id ASC) AS rank
                   FROM scored)
        SELECT query_id, neighbor_id, cos, CAST(rank AS INT) AS rank
        FROM ranked WHERE rank <= 3
    """

    nd_bands = " UNION ALL ".join(
        f"SELECT vec_id, {b} AS band, "
        f"{_proj_bucket_sql('embedding', 2, salt_prefix=f'#b{b}p')} AS bucket "
        "FROM embeddings"
        for b in range(8)
    )
    nd_cos = _cos_sql("ea.embedding", "eb.embedding", 4)
    sql["embedding_near_dups"] = f"""
        WITH keyed AS ({nd_bands}),
        cand AS (
          SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
          FROM keyed a JOIN keyed b
            ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id)
        SELECT c.id_a, c.id_b, {nd_cos} AS cos
        FROM cand c
        JOIN embeddings ea ON ea.vec_id = c.id_a
        JOIN embeddings eb ON eb.vec_id = c.id_b
        WHERE {nd_cos} >= 0.35
    """

    lsh_bucket = _proj_bucket_sql("embedding", 6, salt_prefix="#p")
    lsh_cos = _cos_sql("q.embedding", "c.embedding", 4)
    sql["lsh_topk"] = f"""
        WITH b AS (SELECT vec_id, embedding, {lsh_bucket} AS bucket FROM embeddings),
        scored AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {lsh_cos} AS cos
          FROM b c JOIN b q ON c.bucket = q.bucket
          WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id),
        ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                                ORDER BY cos DESC, neighbor_id ASC) AS rank
                   FROM scored)
        SELECT query_id, neighbor_id, cos, CAST(rank AS INT) AS rank
        FROM ranked WHERE rank <= 3
    """

    sql["asof_join"] = """
        WITH clicks AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
        buys AS (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase')
        SELECT c.event_id, c.user_id,
               ROUND(b.value, 4) AS purchase_value,
               CAST(floor(epoch(b.ts)) AS BIGINT) AS purchase_epoch
        FROM clicks c
        ASOF LEFT JOIN buys b ON c.user_id = b.user_id AND c.ts >= b.ts
    """

    sql["decontaminate"] = """
        WITH sh AS (
          SELECT doc_id,
                 array_to_string(toks[i+1:i+5], ' ') AS shingle
          FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
                FROM documents) t,
          LATERAL unnest(range(len(toks) - 4)) AS r(i)
          WHERE len(toks) >= 5),
        ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 10 = 0)
        SELECT s.doc_id, COUNT(DISTINCT s.shingle) AS n_shared_shingles
        FROM sh s JOIN ev USING (shingle)
        WHERE s.doc_id % 10 <> 0
        GROUP BY s.doc_id
    """

    # PageRank: 5 unrolled iterations (recursive CTEs can't aggregate per
    # round); float-sensitive constants inlined as Python doubles
    pr_iters = ""
    base_num = repr(1.0 - 0.85)
    for k in range(1, 6):
        pr_iters += f""",
        pr{k} AS MATERIALIZED (
          SELECT d.a AS node, d.deg,
                 {base_num} / nn.n + 0.85 * COALESCE(c.inflow, CAST(0 AS DOUBLE)) AS pr
          FROM deg d CROSS JOIN nn
          LEFT JOIN (SELECT u.b AS node, SUM(p.pr / p.deg) AS inflow
                     FROM und u JOIN pr{k-1} p ON u.a = p.node GROUP BY u.b) c
            ON c.node = d.a)"""
    sql["pagerank"] = f"""
        WITH le AS MATERIALIZED (
          SELECT user_id AS src,
                 lead(user_id) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS dst
          FROM events),
        e AS MATERIALIZED (
          SELECT DISTINCT LEAST(src, dst) AS src, GREATEST(src, dst) AS dst
          FROM le WHERE dst IS NOT NULL AND dst <> src),
        und AS MATERIALIZED (
          SELECT src AS a, dst AS b FROM e UNION SELECT dst, src FROM e),
        deg AS MATERIALIZED (SELECT a, COUNT(*) AS deg FROM und GROUP BY a),
        nn AS MATERIALIZED (SELECT COUNT(*) AS n FROM deg),
        pr0 AS MATERIALIZED (
          SELECT a AS node, deg, CAST(1 AS DOUBLE) / nn.n AS pr
          FROM deg CROSS JOIN nn){pr_iters}
        SELECT node, ROUND(pr, 6) AS pagerank FROM pr5
    """

    sql["crf_decode"] = _crf_decode_sql(120, t_max=8)
    sql["decision_log"] = _decision_log_sql(200)
    sql["decision_log_lex"] = _decision_log_sql(150, lexicon=DL_LEX, suffix=DL_SUFFIX)

    from x5_ner_spark.operators.text_stats import PII_PATTERNS

    pii_ctes = ["""aug AS (
          SELECT doc_id,
                 text || ' reach user' || CAST(doc_id AS VARCHAR)
                      || '@example.com or https://site' || CAST(doc_id AS VARCHAR)
                      || '.example/p?x=1 ip 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                      || '.7 tel +7 915 12' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')
                      || '-77' AS s0
          FROM documents WHERE doc_id < 300)"""]
    counts = [f"n_{name}" for name, _, _ in PII_PATTERNS]
    # sequential scrub chain: p0 reads aug, p{i} reads p{i-1}; each stage
    # counts on the PRE-replacement text of ITS stage (same order as
    # text_stats.scrub_pii's fold)
    pii_ctes = [pii_ctes[0]] + [
        f"p{i} AS (SELECT *, len(regexp_extract_all(s{i}, '{pat}')) AS n_{name}, "
        f"regexp_replace(s{i}, '{pat}', '{repl}', 'g') AS s{i+1} "
        f"FROM {'aug' if i == 0 else f'p{i-1}'})"
        for i, (name, pat, repl) in enumerate(PII_PATTERNS)
    ]
    sql["scrub_pii"] = f"""
        WITH {', '.join(pii_ctes)}
        SELECT doc_id, {', '.join(counts)},
               md5(s{len(PII_PATTERNS)}) AS scrub_fp
        FROM p{len(PII_PATTERNS) - 1}
    """

    ivf_cell_cos = _cos_sql("e.embedding", "c.cv", 6)
    ivf_cos = _cos_sql("q.qv", "n.nv", 4)
    ivf_hv = _H32.format(x="CAST(vec_id AS VARCHAR) || '#ivf'")
    sql["ivf_topk"] = f"""
        WITH cents AS (
          SELECT vec_id AS cell_id, embedding AS cv FROM embeddings
          ORDER BY {ivf_hv}, vec_id LIMIT 8),
        c_scored AS (
          SELECT e.vec_id AS neighbor_id, e.embedding AS nv, c.cell_id,
                 {ivf_cell_cos} AS cell_cos
          FROM embeddings e CROSS JOIN cents c),
        c_assign AS (
          SELECT neighbor_id, nv, cell_id FROM (
            SELECT *, row_number() OVER (PARTITION BY neighbor_id
                                         ORDER BY cell_cos DESC, cell_id ASC) AS rn
            FROM c_scored) WHERE rn = 1),
        q_probe AS (
          SELECT query_id, qv, cell_id FROM (
            SELECT neighbor_id AS query_id, nv AS qv, cell_id, cell_cos,
                   row_number() OVER (PARTITION BY neighbor_id
                                      ORDER BY cell_cos DESC, cell_id ASC) AS rn
            FROM c_scored WHERE neighbor_id < 5) WHERE rn <= 2),
        scored AS (
          SELECT q.query_id, n.neighbor_id, {ivf_cos} AS cos
          FROM c_assign n JOIN q_probe q ON n.cell_id = q.cell_id
          WHERE n.neighbor_id <> q.query_id),
        ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                                ORDER BY cos DESC, neighbor_id ASC) AS rank
                   FROM scored)
        SELECT query_id, neighbor_id, cos, CAST(rank AS INT) AS rank
        FROM ranked WHERE rank <= 3
    """

    en = ", ".join(f"'{w}'" for w in text_stats.EN_STOPWORDS)
    ru = ", ".join(f"'{w}'" for w in text_stats.RU_STOPWORDS)
    sql["lang_id"] = f"""
        WITH toks AS ({_TOKENS}),
        scored AS (
          SELECT doc_id,
                 SUM(CASE WHEN term IN ({en}) THEN 1 ELSE 0 END) * 1.0 / COUNT(*) AS en_ratio,
                 SUM(CASE WHEN term IN ({ru}) THEN 1 ELSE 0 END) * 1.0 / COUNT(*) AS ru_ratio
          FROM toks GROUP BY doc_id)
        SELECT doc_id, ROUND(en_ratio, 4) AS en_ratio,
               CASE WHEN en_ratio < 0.05 AND ru_ratio < 0.05 THEN 'und'
                    WHEN en_ratio >= ru_ratio THEN 'en' ELSE 'ru' END AS lang_pred
        FROM scored
    """

    # learned_q facet: the quality_train.quality_score_col serving expression
    # under the deterministic stopword-lexicon model (w[bucket]=1.0, b=-0.5);
    # the bucket set is computed by the same python md5 twin the Column uses.
    from x5_ner_spark.operators.quality_train import lexicon_quality_model

    _qw, _qb = lexicon_quality_model()
    _qdim = len(_qw)
    _qbuckets = ", ".join(str(i) for i, v in enumerate(_qw) if v)
    sql["quality"] = rf"""
        WITH d AS (
          SELECT doc_id, length(text) AS n_chars_m,
                 len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tokens,
                 ROUND((length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))
                       * 1.0 / length(text), 4) AS digit_ratio,
                 ROUND((length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')))
                       * 1.0 / length(text), 4) AS punct_ratio,
                 len(list_filter(
                       list_distinct(list_transform(
                         list_filter(string_split(lower(text), ' '), x -> x <> ''),
                         x -> {_H32.format(x="x")} % {_qdim})),
                       bkt -> list_contains([{_qbuckets}], bkt))) AS stop_bkts
          FROM documents)
        SELECT doc_id, n_chars_m, n_tokens, digit_ratio, punct_ratio,
               ROUND(1.0 / (1.0 + exp(-({repr(_qb)} + stop_bkts))), 4) AS learned_q,
               ROUND((CASE WHEN n_tokens < 5 THEN 0.2 ELSE 1.0 END)
                     * (1.0 - LEAST(digit_ratio * 2, 1.0))
                     * (1.0 - LEAST(punct_ratio * 2, 1.0)), 4) AS quality
        FROM d
    """

    sql["doc_stats"] = f"""
        WITH n AS (SELECT doc_id, text,
                          regexp_replace(lower(text), '\\s+', ' ', 'g') AS nt
                   FROM documents)
        SELECT doc_id,
               len(list_filter(string_split(text, ' '), x -> x <> '')) AS ws_tokens,
               len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS word_tokens,
               CAST(CEIL(length(text) / 4.0) AS BIGINT) AS bpe_est,
               md5(nt) AS fingerprint,
               {_H32.format(x="nt")} % 1024 AS fp_bucket
        FROM n
    """

    sql["components"] = """
        WITH le AS (
          SELECT user_id AS src,
                 lead(user_id) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS dst
          FROM events),
        e AS (SELECT DISTINCT LEAST(src, dst) AS src, GREATEST(src, dst) AS dst
              FROM le WHERE dst IS NOT NULL AND dst <> src),
        und AS (SELECT src AS a, dst AS b FROM e UNION SELECT dst, src FROM e),
        nodes AS (SELECT DISTINCT a AS node FROM und),
        reach AS (
          SELECT node, node AS r FROM nodes
          UNION
          SELECT u.b AS node, reach.r FROM reach JOIN und u ON u.a = reach.node
        )
        SELECT node, MIN(r) AS component FROM reach GROUP BY node ORDER BY node
    """
    # DuckDB requires WITH RECURSIVE for self-referencing CTEs
    sql["components"] = sql["components"].replace("WITH le AS", "WITH RECURSIVE le AS")

    sql["term_contexts"] = """
        WITH toks AS (
          SELECT doc_id, t.p.term AS term, t.p.ord - 1 AS pos
          FROM documents,
          LATERAL unnest(list_transform(
            list_filter(string_split(lower(text), ' '), x -> x <> ''),
            (x, i) -> {'term': x, 'ord': i})) AS t(p)),
        anchors AS (SELECT doc_id, pos AS apos FROM toks WHERE term = 'spark'),
        ctx AS (SELECT t.term FROM toks t JOIN anchors a
                ON t.doc_id = a.doc_id AND abs(t.pos - a.apos) <= 2
                AND t.pos <> a.apos)
        SELECT term, COUNT(*) AS n FROM ctx GROUP BY term
        ORDER BY n DESC, term ASC LIMIT 30
    """

    sql["topk_per_group"] = """
        WITH r AS (SELECT event_type, event_id, value,
                          row_number() OVER (PARTITION BY event_type
                                             ORDER BY value DESC, event_id ASC) AS rk
                   FROM events)
        SELECT event_type, event_id, ROUND(value, 2) AS value, CAST(rk AS INT) AS rk
        FROM r WHERE rk <= 2
    """

    sql["dedup_dropped"] = """
        WITH fps AS (SELECT doc_id,
                            md5(array_to_string(
                              list_filter(string_split(lower(text), ' '),
                                          x -> x <> '')[1:5], ' ')) AS fp
                     FROM documents),
        g AS (SELECT doc_id, fp,
                     MIN(doc_id) OVER (PARTITION BY fp) AS keep_id,
                     COUNT(*) OVER (PARTITION BY fp) AS grp_n
              FROM fps)
        SELECT doc_id, keep_id FROM g WHERE grp_n > 1 AND doc_id <> keep_id
    """

    sql["label_centroids"] = """
        WITH ex AS (
          SELECT label, r.i AS dim, embedding[r.i + 1] AS v
          FROM embeddings, LATERAL unnest(range(len(embedding))) AS r(i)),
        per AS (SELECT label, dim, AVG(v) AS m FROM ex GROUP BY label, dim),
        agg AS (SELECT label, COUNT(*) AS dim_n, SUM(m * m) AS ss,
                       MAX(CASE WHEN dim = 0 THEN m END) AS c0
                FROM per GROUP BY label)
        SELECT label, CAST(dim_n AS INT) AS dim,
               ROUND(SQRT(ss), 4) AS centroid_norm, ROUND(c0, 4) AS c0
        FROM agg
    """

    sql["json_props"] = """
        SELECT event_type,
               ROUND(AVG(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k,
               MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
               CAST(SUM(CASE WHEN json_extract_string(props, '$.k') IS NULL
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_null
        FROM events GROUP BY event_type
    """


    # percentile(): Spark exact percentile ≡ DuckDB quantile_cont (both
    # linear interpolation over the sorted group); l_extendedprice may be
    # DECIMAL in parquet — cast to DOUBLE on both sides so interpolation
    # arithmetic matches
    sql["numeric_profile"] = """
        SELECT l_returnflag,
               ROUND(MIN(CAST(l_extendedprice AS DOUBLE)), 4) AS min_price,
               ROUND(MAX(CAST(l_extendedprice AS DOUBLE)), 4) AS max_price,
               ROUND(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5), 4) AS median_price,
               ROUND(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.9), 4) AS p90_price,
               COUNT(*) AS n_rows
        FROM lineitem GROUP BY l_returnflag
    """

    error_buckets_sql = """
        WITH ents AS (
          SELECT l_orderkey AS doc_id,
                 CAST(l_partkey % 100 AS INT) AS s,
                 CAST(l_partkey % 100 + 5 AS INT) AS e,
                 l_returnflag AS t, l_linenumber
          FROM lineitem),
        gold AS (SELECT DISTINCT doc_id, s AS gs, e AS ge, t AS gt
                 FROM ents WHERE l_linenumber % 2 = 0),
        pred AS (SELECT DISTINCT doc_id, s AS ps, e AS pe, t AS pt
                 FROM ents WHERE l_linenumber % 2 = 1),
        exact AS (SELECT 'exact_match' AS bucket, gt AS etype FROM gold JOIN pred
                  USING (doc_id) WHERE gs = ps AND ge = pe AND gt = pt),
        swap AS (SELECT 'type_swap', gt FROM gold JOIN pred USING (doc_id)
                 WHERE gs = ps AND ge = pe AND gt <> pt),
        shift AS (SELECT 'boundary_shift', gt FROM gold JOIN pred USING (doc_id)
                  WHERE gt = pt AND gs < pe AND ge > ps AND (gs <> ps OR ge <> pe)),
        fn AS (SELECT 'false_negative', gt FROM gold g WHERE NOT EXISTS
                 (SELECT 1 FROM pred p WHERE p.doc_id = g.doc_id
                  AND g.gs < p.pe AND g.ge > p.ps)),
        fp AS (SELECT 'false_positive', pt FROM pred p WHERE NOT EXISTS
                 (SELECT 1 FROM gold g WHERE g.doc_id = p.doc_id
                  AND g.gs < p.pe AND g.ge > p.ps)),
        allb AS (SELECT * FROM exact UNION ALL SELECT * FROM swap
                 UNION ALL SELECT * FROM shift UNION ALL SELECT * FROM fn
                 UNION ALL SELECT * FROM fp)
        SELECT bucket, etype, COUNT(*) AS n FROM allb GROUP BY bucket, etype
    """

    sql["corpus_report"] = f"""
        WITH s AS (
          SELECT lang, ROUND(AVG(n_chars), 4) AS avg_chars,
                 ROUND(AVG(length(text)), 4) AS avg_len
          FROM documents GROUP BY lang),
        eb AS ({error_buckets_sql})
        SELECT 'sort_limit' AS facet, CAST(doc_id AS VARCHAR) AS key,
               'head40' AS sub, substr(text, 1, 40) AS txt,
               CAST(doc_id AS DOUBLE) AS num
        FROM (SELECT doc_id, text FROM documents
              ORDER BY text ASC, doc_id ASC LIMIT 20)
        UNION ALL
        SELECT 'group_sizes', source, lang, '', CAST(COUNT(*) AS DOUBLE)
        FROM documents GROUP BY source, lang
        UNION ALL
        SELECT 'summary_stats', lang, 'avg_chars', '', avg_chars FROM s
        UNION ALL
        SELECT 'summary_stats', lang, 'avg_len', '', avg_len FROM s
        UNION ALL
        SELECT 'error_buckets', bucket, etype, '', CAST(n AS DOUBLE) FROM eb
        UNION ALL
        SELECT 'lead_prefix', '', sub, '', num FROM (
          WITH w AS (SELECT doc_id, text,
                            lead(text) OVER (ORDER BY text, doc_id) AS next_text
                     FROM documents)
          SELECT 'n_pairs' AS sub, CAST(COUNT(*) AS DOUBLE) AS num
          FROM w WHERE next_text IS NOT NULL
          UNION ALL
          SELECT 'n_prefix_matches',
                 CAST(SUM(CASE WHEN substr(text, 1, 3) = substr(next_text, 1, 3)
                               THEN 1 ELSE 0 END) AS DOUBLE)
          FROM w WHERE next_text IS NOT NULL)
        UNION ALL
        SELECT 'dup_ngrams', CAST(doc_id AS VARCHAR), CAST(span_start AS VARCHAR),
               '', CAST(span_end AS DOUBLE)
        FROM (
          -- repeated-8-gram spans: grams MATERIALIZED (it is read twice;
          -- plain CTEs are inlined and the md5 work would double)
          WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split(lower(text), ' '), t -> t <> '') AS toks
            FROM documents),
          g AS MATERIALIZED (
            SELECT doc_id, i - 1 AS s,
                   {_H32.format(x="array_to_string(toks[i:i+7], ' ')")} AS gh
            FROM toks, LATERAL unnest(generate_series(1, len(toks) - 7)) AS u(i)
            WHERE len(toks) >= 8),
          hot AS (SELECT gh FROM g GROUP BY gh HAVING COUNT(*) >= 2),
          occ AS (SELECT doc_id, s, s + 8 AS e FROM g JOIN hot USING (gh)),
          isl AS (
            SELECT doc_id, s, e,
                   CASE WHEN s > COALESCE(MAX(e) OVER (
                        PARTITION BY doc_id ORDER BY s
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                        THEN 1 ELSE 0 END AS ni
            FROM occ),
          isl2 AS (
            SELECT doc_id, s, e, SUM(ni) OVER (
                   PARTITION BY doc_id ORDER BY s
                   ROWS UNBOUNDED PRECEDING) AS island
            FROM isl)
          SELECT doc_id, MIN(s) AS span_start, MAX(e) AS span_end
          FROM isl2 GROUP BY doc_id, island)
        UNION ALL
        SELECT 'lm_nll', CAST(doc_id AS VARCHAR), 'nll', '', nll
        FROM (
          -- add-one bigram LM, BOS context, per-token log-probs quantized
          -- to integer micro-nats before the per-doc sum (order-free; see
          -- operators/lm.py). bg is read 3x -> MATERIALIZED per CLAUDE.md.
          WITH ltoks AS (
            SELECT doc_id,
                   list_filter(string_split(lower(text), ' '), t -> t <> '') AS toks
            FROM documents),
          bg AS MATERIALIZED (
            SELECT doc_id,
                   CASE WHEN i = 1 THEN '<s>' ELSE toks[i - 1] END AS prev,
                   toks[i] AS cur
            FROM ltoks, LATERAL unnest(generate_series(1, len(toks))) AS u(i)),
          bgc AS MATERIALIZED (
            SELECT prev, cur, COUNT(*) AS c_bg FROM bg GROUP BY prev, cur),
          ctxc AS MATERIALIZED (
            SELECT prev, COUNT(*) AS c_ctx FROM bg GROUP BY prev),
          v AS MATERIALIZED (SELECT COUNT(DISTINCT cur) AS nv FROM bg),
          lp AS (
            SELECT doc_id,
                   CAST(ROUND(ln(CAST(c_bg + 1 AS DOUBLE)) * 1000000.0) AS BIGINT)
                   - CAST(ROUND(ln(CAST(c_ctx + nv AS DOUBLE)) * 1000000.0) AS BIGINT)
                   AS lp_u
            FROM bg JOIN bgc USING (prev, cur) JOIN ctxc USING (prev)
            CROSS JOIN v)
          SELECT doc_id,
                 ROUND(-CAST(SUM(lp_u) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                       / 1000000.0, 4) AS nll
          FROM lp GROUP BY doc_id)
    """

    return sql
