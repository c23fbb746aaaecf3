"""Similarity search over an embedding column (array<float>).

- brute-force cosine top-k: the correctness baseline. Cross join of a
  (small, broadcast) query set against the corpus; JVM-side dot product
  via zip_with/aggregate; top-k via window row_number.
- IVF-style: coarse quantizer = per-label centroids (k-means-lite:
  labels act as the inverted lists; at 100 TB the centroid table is a
  broadcast dimension and only matching lists are scanned, i.e. the
  scan is partition-pruned on list id).
- LSH-bucketed: random-hyperplane signs from deterministic
  hash-derived pseudo-planes; candidates share a bucket.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from .dedup import cosine_col, portable_hash64_col


def topk_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine for each query vector. ``queries`` is
    small -> broadcast; corpus scan stays partitioned, no shuffle until
    the final per-query top-k aggregation."""
    q = F.broadcast(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    )
    scored = corpus.select(F.col(id_col).alias("match_id"), F.col(vec_col).alias("cv")).join(q)
    scored = scored.where(F.col("query_id") != F.col("match_id")).select(
        "query_id",
        "match_id",
        F.round(cosine_col(F.col("qv"), F.col("cv")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("match_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "match_id", "cosine", "rank")
    )


def label_centroids(corpus: DataFrame, label_col: str = "label", vec_col: str = "embedding") -> DataFrame:
    """Per-list centroids — the IVF coarse quantizer. Aggregation is a
    single shuffle on the (low-cardinality) list id."""
    dim_sums = corpus.groupBy(label_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.aggregate(
            F.collect_list(vec_col),
            F.array_repeat(F.lit(0.0), 64),
            lambda acc, v: F.zip_with(acc, v, lambda a, x: a + x.cast("double")),
        ).alias("sums"),
    )
    return dim_sums.select(
        F.col(label_col).alias("list_id"),
        F.transform("sums", lambda s: s / F.col("n")).alias("centroid"),
    )


def ivf_assign(queries: DataFrame, centroids: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding", nprobe: int = 1) -> DataFrame:
    """Assign each query to its nprobe nearest centroid lists."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    scored = q.join(F.broadcast(centroids)).select(
        "query_id", "qv", "list_id", cosine_col(F.col("qv"), F.col("centroid")).alias("sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("list_id"))
    return (
        scored.withColumn("r", F.row_number().over(w))
        .where(F.col("r") <= nprobe)
        .select("query_id", "qv", "list_id")
    )


def topk_ivf(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """IVF search: only the nprobe nearest inverted lists are scanned.
    At scale the corpus is partitioned by list_id, so this prunes
    (1 - nprobe/nlist) of the scan."""
    cents = label_centroids(corpus, label_col, vec_col)
    assigned = ivf_assign(queries, cents, id_col, vec_col, nprobe)
    c = corpus.select(
        F.col(label_col).alias("list_id"),
        F.col(id_col).alias("match_id"),
        F.col(vec_col).alias("cv"),
    )
    scored = assigned.join(c, "list_id").where(F.col("query_id") != F.col("match_id")).select(
        "query_id",
        "match_id",
        F.round(cosine_col(F.col("qv"), F.col("cv")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("match_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "match_id", "cosine", "rank")
    )


def _pseudo_plane_sign(vec: Column, plane_idx: int) -> Column:
    """Sign bit of <v, r_i> where r_i is a deterministic pseudo-random
    hyperplane: component j of plane i is +1 if the portable hash of
    "plane:i:j" is odd else -1. No stored plane matrix, no randomness —
    reproducible across engines and retries."""
    signed = F.zip_with(
        vec,
        F.sequence(F.lit(0), F.size(vec) - 1),
        lambda x, j: F.when(
            portable_hash64_col(F.concat_ws(":", F.lit("plane"), F.lit(plane_idx), j.cast("string")))
            .bitwiseAND(F.lit(1))
            == 1,
            x.cast("double"),
        ).otherwise(-x.cast("double")),
    )
    dot = F.aggregate(signed, F.lit(0.0), lambda s, x: s + x)
    return F.when(dot >= 0, F.lit(1)).otherwise(F.lit(0))


def lsh_bucket(vec_col: Column, n_planes: int = 8) -> Column:
    """Random-hyperplane LSH bucket id (0..2^n_planes-1)."""
    bucket = F.lit(0)
    for i in range(n_planes):
        bucket = bucket + F.shiftleft(_pseudo_plane_sign(vec_col, i), i)
    return bucket


def topk_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket. Recall traded for a (corpus/2^n_planes) scan."""
    cb = corpus.select(
        F.col(id_col).alias("match_id"),
        F.col(vec_col).alias("cv"),
        lsh_bucket(F.col(vec_col), n_planes).alias("bucket"),
    )
    qb = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        lsh_bucket(F.col(vec_col), n_planes).alias("bucket"),
    )
    scored = qb.join(cb, "bucket").where(F.col("query_id") != F.col("match_id")).select(
        "query_id",
        "match_id",
        F.round(cosine_col(F.col("qv"), F.col("cv")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("match_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "match_id", "cosine", "rank")
    )
