"""Similarity search over embedding columns: brute-force cosine top-k
(exact baseline) and an LSH-bucketed variant (scale path).

Brute force is a broadcast of the (small) query set against the (huge)
corpus — one pass, no shuffle except the final per-query top-k, which is a
window over |queries|·k rows. The LSH path buckets by random-projection sign
bits so each corpus row joins only its bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.columns import cosine_similarity_col, portable_hash32


def brute_force_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 3, id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """For each query vector, the top-k corpus neighbors by cosine (excluding
    itself). queries is broadcast; ties broken by neighbor id."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", F.round(cosine_similarity_col(F.col("qv"), F.col("cv")), 4))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", F.col("rank").cast("int").alias("rank"))
    )


def projection_buckets(emb: DataFrame, n_planes: int = 8, vec_col: str = "embedding") -> DataFrame:
    """LSH bucket id from sign bits of pseudo-random hyperplane projections.
    Hyperplane components are hash-derived (deterministic, no stored model):
    plane_j[i] = ±1 by bit of portable_hash32(j||i)."""
    dim_idx = F.sequence(F.lit(0), F.size(vec_col) - 1)
    bits = []

    def plane_signs(j: int):
        # closure-bind j: a 2-param HOF lambda would receive the array index
        # as its second argument and corrupt the salt
        salt = f"#p{j}"
        return F.transform(
            dim_idx,
            lambda i: F.when(
                portable_hash32(i.cast("string"), salt=salt) % 2 == 0, F.lit(1.0)
            ).otherwise(F.lit(-1.0)),
        )

    for j in range(n_planes):
        proj = F.aggregate(
            F.zip_with(F.col(vec_col), plane_signs(j), lambda a, s: a.cast("double") * s),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(proj >= 0, F.lit(1 << j)).otherwise(F.lit(0)))
    bucket = bits[0]
    for b in bits[1:]:
        bucket = bucket + b
    return emb.withColumn("bucket", bucket.cast("int"))


def lsh_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 3, n_planes: int = 6,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket,
    exact cosine rescore inside the bucket."""
    cb = projection_buckets(corpus, n_planes, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"), "bucket"
    )
    qb = projection_buckets(queries, n_planes, vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), "bucket"
    )
    scored = (
        cb.join(F.broadcast(qb), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", F.round(cosine_similarity_col(F.col("qv"), F.col("cv")), 4))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", F.col("rank").cast("int").alias("rank"))
    )


def label_centroids(emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
                    label_col: str = "label") -> DataFrame:
    """Per-label centroid: element-wise mean via posexplode → avg per (label,
    dim) → reassemble. Native; one shuffle on (label, dim)."""
    exploded = emb.select(label_col, F.posexplode(vec_col).alias("dim", "v"))
    per_dim = exploded.groupBy(label_col, "dim").agg(F.avg("v").alias("m"))
    return (
        per_dim.groupBy(label_col)
        .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("_dm"))
        .withColumn("centroid", F.transform("_dm", lambda s: s["m"]))
        .drop("_dm")
    )


def ivf_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 3, n_cells: int = 8,
    n_probe: int = 2, id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style approximate top-k: a deterministic coarse quantizer (the
    first ``n_cells`` corpus vectors as centroids, broadcast), corpus rows
    assigned to their nearest cell, queries probe their ``n_probe`` nearest
    cells, exact cosine rescoring inside the probed cells.

    At 100 TB the cell assignment is one broadcast pass and the search joins
    only |query|·n_probe cells instead of the full corpus."""
    cents = corpus.orderBy(id_col).limit(n_cells).select(
        F.col(id_col).alias("cell_id"), F.col(vec_col).alias("cv")
    )

    def nearest_cells(df, vcol, keep, n):
        scored = df.crossJoin(F.broadcast(cents)).withColumn(
            "cell_cos", cosine_similarity_col(F.col(vcol), F.col("cv"))
        )
        w = Window.partitionBy(*keep).orderBy(F.desc("cell_cos"), F.asc("cell_id"))
        return (
            scored.withColumn("cr", F.row_number().over(w))
            .filter(F.col("cr") <= n)
            .drop("cv", "cell_cos", "cr")
        )

    c_assigned = nearest_cells(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv")),
        "nv", ["neighbor_id"], 1,
    )
    q_assigned = nearest_cells(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")),
        "qv", ["query_id"], n_probe,
    )
    scored = (
        c_assigned.join(q_assigned, "cell_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", F.round(cosine_similarity_col(F.col("qv"), F.col("nv")), 4))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", F.col("rank").cast("int").alias("rank"))
    )
