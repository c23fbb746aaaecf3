"""Training-data deduplication operators over a documents corpus.

Five families, each a `DataFrame -> DataFrame` built Spark-first:

- exact         : sha256 hash-groupBy (one shuffle; the reference's
                  content dedup, `_sbom.py:75-122`, generalized)
- normalized    : md5 of casefolded/punct-stripped text (near-exact)
- minhash LSH   : shingle -> salted-md5 minhash -> band keys ->
                  bucket self-join -> exact Jaccard verify
- simhash       : 64-bit simhash + hamming-band blocking
- embedding     : cosine near-dup over array<float> with blocking

Everything except simhash stays in built-in JVM expressions
(whole-stage codegen); the signatures use the SQL-portable md5-prefix
hash (functions/hashing.py) so DuckDB can replay them exactly.

Scale notes: LSH band self-join shuffles on band keys — band buckets
are bounded (we cap bucket width defensively and log drops); pair
generation uses `id1 < id2` to halve the shuffle; exact-verify runs
only on candidate pairs, never all-pairs.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F, types as T

_MERSENNE61 = (1 << 61) - 1


def portable_hash64_col(c: Column) -> Column:
    """Spark-SQL twin of functions.hashing.portable_hash64."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def norm_text_col(c: Column) -> Column:
    """Casefold, strip non-alphanumerics, collapse whitespace."""
    return F.trim(
        F.regexp_replace(F.regexp_replace(F.lower(c), r"[^a-z0-9\s]", " "), r"\s+", " ")
    )


def dedup_exact(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup: one row per distinct content with canonical id =
    min(id), plus the duplicate count."""
    return (
        docs.groupBy(F.sha2(F.col(text_col), 256).alias("content_sha256"))
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
        .select("content_sha256", "canonical_id", "n_dups")
    )


def dedup_normalized(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Near-exact dedup on normalized text."""
    return (
        docs.groupBy(F.md5(norm_text_col(F.col(text_col))).alias("norm_md5"))
        .agg(F.min(id_col).alias("canonical_id"), F.count(F.lit(1)).alias("n_dups"))
        .select("norm_md5", "canonical_id", "n_dups")
    )


def shingles_col(text_col: Column, n: int = 3) -> Column:
    """Word n-gram shingles of lowercased text as array<string> —
    matches functions.hashing.shingles. Pure JVM (split + transform)."""
    toks = F.split(F.trim(F.lower(text_col)), r"\s+")
    k = F.size(toks)
    return F.when(k <= n, F.array(F.array_join(toks, " "))).otherwise(
        F.transform(
            F.sequence(F.lit(0), k - n),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i + 1), F.element_at(toks, i + 2), F.element_at(toks, i + 3)
            ),
        )
    )


def minhash_sig_cols(text_col: Column, k: int = 16, n: int = 3) -> list:
    """k minhash signature Columns. sig_i = min over distinct shingles
    of portable_hash64(f"{i}:{shingle}")."""
    sh = F.array_distinct(shingles_col(text_col, n))
    sigs = []
    for i in range(k):
        hashed = F.transform(
            sh, lambda s, i=i: portable_hash64_col(F.concat(F.lit(f"{i}:"), s))
        )
        sigs.append(
            F.coalesce(F.array_min(hashed), F.lit(_MERSENNE61)).alias(f"mh{i}")
        )
    return sigs


def minhash_signatures(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 16, n: int = 3
) -> DataFrame:
    return docs.select(F.col(id_col), *minhash_sig_cols(F.col(text_col), k, n))


def minhash_band_keys(
    sigs: DataFrame, id_col: str = "doc_id", k: int = 16, bands: int = 4
) -> DataFrame:
    """(id, band, band_key): band_key = portable hash of the joined
    band slice — matches functions.hashing.minhash_bands."""
    rows = k // bands
    outs = []
    for b in range(bands):
        slice_cols = [F.col(f"mh{i}").cast("string") for i in range(b * rows, (b + 1) * rows)]
        key = portable_hash64_col(
            F.concat(F.lit(f"band{b}:"), F.concat_ws(",", *slice_cols))
        )
        outs.append(
            sigs.select(F.col(id_col), F.lit(b).alias("band"), key.alias("band_key"))
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def jaccard_col(a: Column, b: Column) -> Column:
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union == 0, F.lit(1.0)).otherwise(inter / union)


def dedup_minhash(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 16,
    bands: int = 4,
    n: int = 3,
    threshold: float = 0.8,
    max_bucket: int = 64,
) -> DataFrame:
    """MinHash + LSH near-dup pairs with exact Jaccard verification.

    shingle -> signature -> band keys -> same-bucket self-join
    (id1 < id2) -> distinct candidate pairs -> exact shingle-set
    Jaccard >= threshold. Buckets wider than ``max_bucket`` are dropped
    defensively (degenerate content, e.g. empty docs) — at 100 TB a
    single mega-bucket would otherwise quadratically explode one task.
    Returns (id1, id2, jaccard).
    """
    sigs = minhash_signatures(docs, id_col, text_col, k, n)
    bands_df = minhash_band_keys(sigs, id_col, k, bands)
    sized = bands_df.groupBy("band", "band_key").agg(
        F.collect_list(id_col).alias("ids"), F.count(F.lit(1)).alias("width")
    ).where((F.col("width") > 1) & (F.col("width") <= max_bucket))
    pairs = (
        sized.select(F.explode("ids").alias("id1"), F.col("ids"))
        .select("id1", F.explode("ids").alias("id2"))
        .where(F.col("id1") < F.col("id2"))
        .dropDuplicates(["id1", "id2"])
    )
    sh = docs.select(
        F.col(id_col),
        F.array_distinct(shingles_col(F.col(text_col), n)).alias("sh"),
    )
    verified = (
        pairs.join(sh.select(F.col(id_col).alias("id1"), F.col("sh").alias("sh1")), "id1")
        .join(sh.select(F.col(id_col).alias("id2"), F.col("sh").alias("sh2")), "id2")
        .select("id1", "id2", F.round(jaccard_col(F.col("sh1"), F.col("sh2")), 6).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )
    return verified


@F.pandas_udf(T.LongType())
def simhash_udf(text: pd.Series) -> pd.Series:
    """64-bit SimHash, Arrow-batched (same function as the Python
    oracle: functions.hashing.simhash64 over lowercased whitespace
    tokens). A JVM-expression variant is possible but would compute 64
    md5s per token; the vectorized Python path is the faster design."""
    from ..functions.hashing import simhash64

    return text.map(lambda t: _to_signed64(simhash64((t or "").lower().split())))


def _to_signed64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def simhash_col(text_col: Column) -> Column:
    return simhash_udf(text_col)


def dedup_simhash(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    n_blocks: int = 4,
) -> DataFrame:
    """SimHash near-dup pairs: block on 16-bit simhash slices (a pair
    within hamming distance <= n_blocks-1 shares at least one block by
    pigeonhole), verify exact hamming distance."""
    with_sh = docs.select(F.col(id_col), simhash_col(F.col(text_col)).alias("simhash"))
    blocks = None
    for b in range(n_blocks):
        blk = with_sh.select(
            F.col(id_col),
            "simhash",
            F.lit(b).alias("block"),
            F.shiftright("simhash", b * 16).bitwiseAND(F.lit(0xFFFF)).alias("block_key"),
        )
        blocks = blk if blocks is None else blocks.unionByName(blk)
    a = blocks.select(
        F.col(id_col).alias("id1"), F.col("simhash").alias("sh1"), "block", "block_key"
    )
    b2 = blocks.select(
        F.col(id_col).alias("id2"), F.col("simhash").alias("sh2"), "block", "block_key"
    )
    pairs = (
        a.join(b2, ["block", "block_key"])
        .where(F.col("id1") < F.col("id2"))
        .dropDuplicates(["id1", "id2"])
    )
    hamming = F.bit_count(F.col("sh1").bitwiseXOR(F.col("sh2")))
    return pairs.select("id1", "id2", hamming.alias("hamming")).where(
        F.col("hamming") <= max_hamming
    )


def cosine_col(a: Column, b: Column) -> Column:
    # cast each float to double BEFORE multiplying: better numerics and
    # bit-identical to the DuckDB oracle's expression tree (queries.py)
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda s, x: s + x,
    )
    na = F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda s, x: s + x,
        )
    )
    nb = F.sqrt(
        F.aggregate(
            F.transform(b, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda s, x: s + x,
        )
    )
    return F.when((na == 0) | (nb == 0), F.lit(0.0)).otherwise(dot / (na * nb))


def dedup_embedding(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str = "label",
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding-cosine near-dup pairs, blocked on ``block_col`` (a
    coarse quantizer: label here; an IVF centroid assignment at scale —
    see similarity.ivf_assign). Returns (id1, id2, cosine)."""
    a = embeddings.select(
        F.col(block_col).alias("blk"), F.col(id_col).alias("id1"), F.col(vec_col).alias("v1")
    )
    b = embeddings.select(
        F.col(block_col).alias("blk"), F.col(id_col).alias("id2"), F.col(vec_col).alias("v2")
    )
    return (
        a.join(b, "blk")
        .where(F.col("id1") < F.col("id2"))
        .select("id1", "id2", F.round(cosine_col(F.col("v1"), F.col("v2")), 6).alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


def dedup_ngram_jaccard(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    block_col: str = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup within blocks (brute force inside a
    block — the verification baseline for the MinHash path)."""
    sh = docs.select(
        F.col(id_col),
        (F.col(block_col) if block_col else F.lit(1)).alias("blk"),
        F.array_distinct(shingles_col(F.col(text_col), n)).alias("sh"),
    )
    a = sh.select(F.col(id_col).alias("id1"), F.col("blk"), F.col("sh").alias("sh1"))
    b = sh.select(F.col(id_col).alias("id2"), F.col("blk"), F.col("sh").alias("sh2"))
    return (
        a.join(b, "blk")
        .where(F.col("id1") < F.col("id2"))
        .select("id1", "id2", F.round(jaccard_col(F.col("sh1"), F.col("sh2")), 6).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )
