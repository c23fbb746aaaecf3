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


# ---------------------------------------------------------------------------
# DSIR importance-resampling weights (Xie et al. 2023)
# ---------------------------------------------------------------------------
DSIR_BUCKETS = 4096


def dsir_weights(
    docs: DataFrame,
    target_langs: tuple = ("en",),
    n_buckets: int = DSIR_BUCKETS,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    salt: str = "dsir:v1",
) -> DataFrame:
    """Per-document importance weight for Data Selection via Importance
    Resampling (Xie et al. 2023): score every raw document by how much
    more likely its hashed n-gram bag is under the TARGET distribution
    (here: the corpus slice whose ``lang_col`` is in ``target_langs``,
    standing in for the paper's Wikipedia/books target) than under the
    RAW distribution (the whole corpus). Downstream selection keeps the
    highest-weight documents — the learned-from-data generalization of
    hand-written quality rules.

    Features are the paper's hashed n-grams: unigrams and adjacent
    bigrams of the whitespace-tokenized lowercased text, bucketed by
    the portable md5-prefix hash into ``n_buckets`` slots. Both bag
    models are add-one-smoothed over the FIXED bucket space, binned to
    powers of two exactly like :func:`textops.lm_bits`: a bucket with
    count ``c`` under model X costs ``B_x - floor(log2(c + 1))`` bits,
    ``B_x = floor(log2(T_x + n_buckets))``, so the per-document log
    weight ``sum(cnt * (bits_raw - bits_target))`` is an EXACT integer
    (positive = looks like the target) and the oracle surface carries
    no libm log. Returns (doc_id, is_target, n_feats, weight_bits,
    bits_per_feat); feature-free docs report 0/0/null.

    Spark shape: ONE corpus-sized shuffle builds the (doc, bucket,
    cnt) table, localCheckpoint-ed because the two bucket models and
    the scoring probe all read it; each model is a <= ``n_buckets``-row
    dimension joined back with an explicit broadcast, and the two
    totals ride a 1-row broadcast. Nothing corpus-sized sorts,
    collects, or joins non-equi — the lm_bits discipline with two
    models instead of one.
    """
    from .dedup import tokenized

    langs = [str(l) for l in target_langs]
    tok = tokenized(
        docs.withColumn("_is_t", F.col(lang_col).isin(langs)),
        text_col,
        keep=(id_col, "_is_t"),
    )
    toks = F.col("_toks")
    k = F.size(toks)
    bigrams = F.when(k < 2, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), k - 2),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i + 1), F.element_at(toks, i + 2)
            ),
        )
    )
    feats = F.concat(F.filter(toks, lambda t: t != ""), bigrams)
    occ = (
        tok.select(F.col(id_col), F.col("_is_t"), F.explode(feats).alias("g"))
        .select(
            id_col,
            "_is_t",
            F.pmod(
                portable_hash64_col(F.concat(F.lit(salt + ":"), F.col("g"))),
                F.lit(n_buckets),
            ).alias("b"),
        )
        .groupBy(id_col, "_is_t", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=True)
    )
    ct = (
        occ.where(F.col("_is_t"))
        .groupBy("b")
        .agg(F.sum("cnt").cast("long").alias("c_t"))
    )
    cr = occ.groupBy("b").agg(F.sum("cnt").cast("long").alias("c_r"))
    tot = ct.agg(F.coalesce(F.sum("c_t"), F.lit(0)).alias("t_t")).crossJoin(
        cr.agg(F.coalesce(F.sum("c_r"), F.lit(0)).alias("t_r"))
    )
    bits_t = (F.length(F.bin(F.col("t_t") + n_buckets)) - 1) - (
        F.length(F.bin(F.coalesce(F.col("c_t"), F.lit(0)) + 1)) - 1
    )
    bits_r = (F.length(F.bin(F.col("t_r") + n_buckets)) - 1) - (
        F.length(F.bin(F.coalesce(F.col("c_r"), F.lit(0)) + 1)) - 1
    )
    scored = (
        occ.join(F.broadcast(ct), "b", "left")
        .join(F.broadcast(cr), "b", "left")
        .crossJoin(F.broadcast(tot))
        .groupBy(id_col)
        .agg(
            F.sum("cnt").cast("long").alias("n_feats"),
            F.sum(F.col("cnt") * (bits_r - bits_t)).cast("long").alias("weight_bits"),
        )
    )
    return (
        docs.select(F.col(id_col), F.col(lang_col).isin(langs).alias("is_target"))
        .join(scored, id_col, "left")
        .select(
            F.col(id_col),
            F.col("is_target"),
            F.coalesce("n_feats", F.lit(0)).cast("long").alias("n_feats"),
            F.coalesce("weight_bits", F.lit(0)).cast("long").alias("weight_bits"),
            F.round(
                F.col("weight_bits").cast("double") / F.col("n_feats").cast("double"),
                6,
            ).alias("bits_per_feat"),
        )
    )
