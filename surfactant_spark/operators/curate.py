"""End-to-end curation verdict — the composition of the pipeline's
already-verified stages into the per-document keep decision a
training-data pipeline actually ships: exact dedup -> quality filter ->
SemDeDup -> temperature sampling, first failing stage recorded.

Each stage is its own tested operator (dedup.dedup_exact,
textops quality rules, similarity.semdedup, textops.mixture_weights);
this module owns only their join order and the verdict precedence."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import dedup_exact, portable_hash64_col
from .similarity import semdedup
from .textops import mixture_weights

CV_MOD = 1_000_000


def curation_verdict(
    docs: DataFrame,
    emb: DataFrame,
    quality: DataFrame,
    k: int = 4,
    iters: int = 2,
    threshold: float = 0.4,
    max_cluster: int = 10_000,
) -> DataFrame:
    """Per-document curation verdict with fixed stage precedence:
    'exact_dup' (not the lowest-id holder of its content hash) beats
    'quality:<reason>' (from the supplied ``quality`` frame: doc_id,
    quality_keep, drop_reason) beats 'semantic_dup' (SemDeDup drop over
    ``emb``; docs without an embedding pass) beats 'not_sampled'
    (salted-md5 bucket at or above the source's acceptance rate
    min(1, mix/raw) in exact micro-units — head sources downsample
    toward the sqrt-temperature target, tails keep everything).
    NULL verdict = keep.

    Scale shape: every join is an equi join on the doc key except the
    source-dimension acceptance table, which broadcasts; the hash
    bucket is a scan-side projection. Stage internals inherit their
    own operators' shapes (dedup_exact's combinable sha agg, semdedup's
    cluster-blocked pair scan, mixture_weights' 1-row denominators)."""
    sha = docs.select("doc_id", "source", F.sha2("text", 256).alias("_sha"))
    de = dedup_exact(docs).select(
        F.col("content_sha256").alias("_sha"), "canonical_id"
    )
    s1 = sha.join(de, "_sha").select(
        "doc_id",
        "source",
        (F.col("doc_id") != F.col("canonical_id")).alias("exact_dup"),
    )
    sd = semdedup(
        emb, k=k, iters=iters, threshold=threshold, max_cluster=max_cluster
    ).select(F.col("vec_id").alias("doc_id"), F.col("keep").alias("sem_keep"))
    rate = (
        F.when(F.col("raw_micro") <= 0, F.lit(CV_MOD).cast("long"))
        .otherwise(
            F.least(
                F.lit(CV_MOD).cast("long"),
                F.expr(f"div({CV_MOD} * mix_micro, raw_micro)"),
            )
        )
        .alias("accept_micro")
    )
    mx = mixture_weights(docs).select("source", rate)
    bucket = F.pmod(
        portable_hash64_col(
            F.concat(F.lit("curate:v1:"), F.col("doc_id").cast("string"))
        ),
        F.lit(CV_MOD),
    )
    j = (
        s1.join(quality, "doc_id")
        .join(sd, "doc_id", "left")
        .join(F.broadcast(mx), "source")
        .withColumn("sem_keep", F.coalesce("sem_keep", F.lit(True)))
        .withColumn("sample_bucket", bucket.cast("long"))
    )
    verdict = (
        F.when(F.col("exact_dup"), F.lit("exact_dup"))
        .when(
            ~F.col("quality_keep"),
            F.concat(F.lit("quality:"), F.col("drop_reason")),
        )
        .when(~F.col("sem_keep"), F.lit("semantic_dup"))
        .when(
            F.col("sample_bucket") >= F.col("accept_micro"), F.lit("not_sampled")
        )
    )
    return j.select(
        "doc_id",
        "source",
        "exact_dup",
        "quality_keep",
        "sem_keep",
        F.col("accept_micro").cast("long").alias("accept_micro"),
        "sample_bucket",
        verdict.isNull().alias("keep"),
        verdict.alias("verdict"),
    )
