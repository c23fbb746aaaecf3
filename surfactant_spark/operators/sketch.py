"""Deterministic distributed sketches over the corpus.

Count-min sketch of token frequencies: the approximate-counting
primitive a 10^12-document pipeline uses where exact per-token counts
are too wide to materialize (vocabulary-scale group-bys during quality
filtering, frequency-capped sampling, heavy-hitter candidate cuts).

Spark-first + cross-engine shape: the sketch is ONE explode + ONE
hash aggregation to ``depth x width`` cells, and every hash is the
portable md5-prefix hash with a per-row salt — no rand(), no
partition-order dependence — so the whole sketch replays bit-exactly
in DuckDB (unlike Spark's built-in approx_count_distinct/freqItems,
whose HLL/sampling internals are engine-private). Sketches over
disjoint corpus shards MERGE by cell-wise sum (the semigroup the
incremental pipeline needs: fold a crawl batch's sketch into the
standing one without touching old data).

Estimates carry the classic CMS guarantee: est(tok) >= true(tok)
always (only over-counting from collisions is possible), and
est <= true + eps*N with probability 1-delta for
width = ceil(e/eps), depth = ceil(ln(1/delta)).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .dedup import portable_hash64_col

# same token grammar as the KG queries (queries.TOKEN_PAT)
TOKEN_PAT = r"[a-z][a-z0-9_.\-]{3,}"

CMS_DEPTH = 3
CMS_WIDTH = 64


def _bucket(row_id: Column, tok: Column, width: int) -> Column:
    return F.pmod(
        portable_hash64_col(
            F.concat(F.lit("cms"), row_id.cast("string"), F.lit(":"), tok)
        ),
        F.lit(width),
    )


def cms_sketch(
    docs: DataFrame,
    text_col: str = "text",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    token_pat: str = TOKEN_PAT,
) -> DataFrame:
    """(row_id, bucket, cnt) cells of the count-min sketch over every
    token occurrence in ``text_col``. Output is ``depth x width`` rows
    regardless of corpus size — the whole point at scale."""
    toks = docs.select(
        F.explode(
            F.regexp_extract_all(F.lower(text_col), F.lit(token_pat), 0)
        ).alias("tok")
    )
    rows = toks.select(
        "tok",
        F.explode(F.array(*[F.lit(r) for r in range(depth)])).alias("row_id"),
    )
    return (
        rows.select("row_id", _bucket(F.col("row_id"), F.col("tok"), width).alias("bucket"))
        .groupBy("row_id", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Cell-wise sum — sketches over disjoint shards/batches compose
    exactly (the CMS semigroup)."""
    unioned = sketches[0]
    for s in sketches[1:]:
        unioned = unioned.unionByName(s)
    return unioned.groupBy("row_id", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    tok_col: str = "tok",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """(tok, est) for each probe token: min over the sketch rows of the
    token's cell, 0 when a cell is empty. The probe side is dimension-
    sized; the sketch is ``depth x width`` rows, so everything here is
    broadcast-scale no matter the corpus the sketch summarizes."""
    cells = probes.select(
        F.col(tok_col).alias("tok"),
        F.explode(F.array(*[F.lit(r) for r in range(depth)])).alias("row_id"),
    )
    cells = cells.withColumn("bucket", _bucket(F.col("row_id"), F.col("tok"), width))
    return (
        cells.join(F.broadcast(sketch), ["row_id", "bucket"], "left")
        .select("tok", F.coalesce("cnt", F.lit(0).cast("long")).alias("cnt"))
        .groupBy("tok")
        .agg(F.min("cnt").alias("est"))
    )
