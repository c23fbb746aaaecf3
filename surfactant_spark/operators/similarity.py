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

from .dedup import cosine_col


def topk_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine for each query vector. ``queries`` is
    small -> broadcast; corpus scan stays partitioned, no shuffle until
    the final per-query top-k aggregation. The corpus side is spread to
    session parallelism first (session.spread_partitions): the
    |corpus|×|queries| cosine work is compute-amplified far beyond the
    scan bytes, and with the query side broadcast no shuffle would ever
    re-spread a single-split corpus off one task."""
    from ..session import spread_partitions

    q = F.broadcast(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    )
    scored = (
        spread_partitions(corpus)
        .select(F.col(id_col).alias("match_id"), F.col(vec_col).alias("cv"))
        .join(q)
    )
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
    """Per-list centroids — the IVF coarse quantizer.

    posexplode + per-(list, dim) avg keeps every aggregation buffer a
    single double (a collect_list of member vectors would put a whole
    hot inverted list in one buffer — executor OOM at 100 TB), and the
    dimensionality comes from the data, not a constant. The second
    groupBy reassembles the centroid ordered by dimension index
    (array_sort on (dim, mean) structs orders by the first field)."""
    dim_means = (
        corpus.select(F.col(label_col).alias("list_id"), F.posexplode(vec_col).alias("dim", "x"))
        .groupBy("list_id", "dim")
        .agg(F.avg(F.col("x").cast("double")).alias("m"))
    )
    return dim_means.groupBy("list_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "m"))), lambda s: s["m"]
        ).alias("centroid")
    )


def label_centroids_exact(
    corpus: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Cross-engine bit-exact centroids: per (list, dim), a strict left
    fold (0.0 + x_0 + x_1 + ...) over members sorted by ``id_col`` — the
    canonical summation order a SQL oracle can replay exactly, unlike
    :func:`label_centroids`'s ``avg`` whose float accumulation order is
    partitioning-dependent. Cost of exactness: the per-(list, dim)
    aggregation buffer holds one inverted list's scalars (bounded by the
    widest list, not the corpus) — use this for oracle parity and
    verification runs, ``label_centroids`` for production centroids."""
    dim_vals = corpus.select(
        F.col(label_col).alias("list_id"),
        F.col(id_col).alias("_id"),
        F.posexplode(vec_col).alias("dim", "x"),
    )
    per_dim = dim_vals.groupBy("list_id", "dim").agg(
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_id", "x"))),
                lambda s: s["x"].cast("double"),
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("ssum"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        per_dim.withColumn("m", F.col("ssum") / F.col("n"))
        .groupBy("list_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "m"))), lambda s: s["m"]
            ).alias("centroid")
        )
    )


def ivf_assign(queries: DataFrame, centroids: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding", nprobe: int = 1) -> DataFrame:
    """Assign each query to its nprobe nearest centroid lists. The
    similarity is rounded to 6 decimals before ranking (ties broken by
    list_id) so the choice of probed lists is stable under float-sum
    noise and replayable by the SQL oracle."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    scored = q.join(F.broadcast(centroids)).select(
        "query_id", "qv", "list_id",
        F.round(cosine_col(F.col("qv"), F.col("centroid")), 6).alias("sim"),
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
    exact_centroids: bool = False,
) -> DataFrame:
    """IVF search: only the nprobe nearest inverted lists are scanned.
    At scale the corpus is partitioned by list_id, so this prunes
    (1 - nprobe/nlist) of the scan. ``exact_centroids`` switches the
    coarse quantizer to the canonical-summation-order variant
    (:func:`label_centroids_exact`) whose doubles a SQL oracle can
    reproduce bit-for-bit."""
    cents = (
        label_centroids_exact(corpus, label_col, vec_col, id_col)
        if exact_centroids
        else label_centroids(corpus, label_col, vec_col)
    )
    assigned = ivf_assign(queries, cents, id_col, vec_col, nprobe)
    from ..session import spread_partitions

    # spread by list_id: the probed-list scan is compute-amplified
    # (cosine per candidate) and must not inherit a single scan split;
    # keying by list_id keeps any exchange the join plans co-located.
    # Achievable width is bounded by the number of distinct lists
    # (spread_partitions cardinality caveat) — nlist >= 2x parallelism
    # is what actually buys full-width execution here
    c = spread_partitions(corpus, label_col).select(
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


def plane_sign_literals(plane_idx: int, dim: int) -> Column:
    """The deterministic pseudo-random hyperplane as a ±1 literal array:
    component j of plane i is +1 if the portable hash of "plane:i:j" is
    odd else -1. Hashed ONCE on the driver (the values depend only on
    (plane, j)) instead of dim×planes md5s per row; no stored plane
    matrix, no randomness — reproducible across engines and retries."""
    from ..functions.hashing import portable_hash64

    return F.array(
        *[
            F.lit(1.0 if (portable_hash64(f"plane:{plane_idx}:{j}") & 1) == 1 else -1.0)
            for j in range(dim)
        ]
    )


def _pseudo_plane_sign(vec: Column, plane_idx: int, dim: int) -> Column:
    """Sign bit of <v, r_i>. x*(+1.0)/x*(-1.0) are IEEE-exact, so the
    dot product is bit-identical to the former per-row-hash variant."""
    signed = F.zip_with(vec, plane_sign_literals(plane_idx, dim), lambda x, s: x.cast("double") * s)
    dot = F.aggregate(signed, F.lit(0.0), lambda s, x: s + x)
    return F.when(dot >= 0, F.lit(1)).otherwise(F.lit(0))


def lsh_bucket(vec_col: Column, n_planes: int, dim: int) -> Column:
    """Random-hyperplane LSH bucket id (0..2^n_planes-1).

    ``dim`` is REQUIRED and must equal the vector length: the plane-sign
    literals are driver-precomputed arrays of exactly ``dim`` ±1s. A
    mismatched vector yields a NULL bucket (never a silent collapse to
    bucket 0 — zip_with pads the shorter side with NULLs, which used to
    zero every sign bit); NULL buckets drop out of the candidate join,
    making bad dims visible as missing rows rather than wrong ones.
    Probe the corpus with ``F.size`` for a data-derived dim (topk_lsh
    does exactly that)."""
    bucket = F.lit(0)
    for i in range(n_planes):
        bucket = bucket + F.shiftleft(_pseudo_plane_sign(vec_col, i, dim), i)
    return F.when(F.size(vec_col) == dim, bucket).otherwise(F.lit(None))


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
    # one-row probe for the dimensionality (bounded driver action) so
    # the plane literals match the data
    dim_row = corpus.select(F.size(F.col(vec_col)).alias("d")).first()
    dim = int(dim_row["d"]) if dim_row is not None else 0
    from ..session import spread_partitions

    # n_planes sign-dot-products per corpus row before the bucket join —
    # compute-amplified; spread a single-split corpus off one task
    cb = spread_partitions(corpus).select(
        F.col(id_col).alias("match_id"),
        F.col(vec_col).alias("cv"),
        lsh_bucket(F.col(vec_col), n_planes, dim).alias("bucket"),
    )
    qb = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        lsh_bucket(F.col(vec_col), n_planes, dim).alias("bucket"),
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


def kmeans_assign(
    corpus: DataFrame,
    k: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact: bool = True,
) -> DataFrame:
    """Lloyd's k-means over the embedding column — the semantic
    clustering step of a training-data curation pipeline (topic
    bucketing, per-cluster sampling quotas, cluster-balanced eval
    splits). Returns (vec_id, cluster, sim): each vector's cluster
    after ``iters`` centroid updates, plus its rounded cosine to that
    centroid.

    Everything is deterministic and (with ``exact=True``) bit-exact
    cross-engine, the topk_ivf discipline extended to an ITERATIVE
    operator: seeding is the k lowest-id vectors (no rand()), each
    assignment ranks on round(cosine, 6) with cluster-id tie-break,
    and centroid updates use label_centroids_exact's canonical
    summation order (members sorted by id, strict left fold per
    dimension) so a SQL oracle can replay every iteration with
    list_reduce. ``exact=False`` swaps in the production centroid path
    (per-(cluster, dim) avg — single-double buffers, partition-order
    float accumulation) for cluster-scale runs where replayability is
    not needed.

    Spark-first shape per iteration: ONE broadcast join against the
    k-row centroid table + a per-vector top-1 window (partition = one
    vector's k candidate rows, never corpus-wide) + the centroid
    aggregation keyed on (cluster, dim). Centroids are eagerly
    localCheckpoint'ed each round — the canon.py connected-components
    discipline that truncates the iterative plan's lineage. A cluster
    that loses all members simply disappears (k shrinks) — identical
    in the SQL replay, documented rather than papered over."""
    if k < 1 or iters < 0:
        raise ValueError("k must be >= 1 and iters >= 0")
    emb = corpus.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("v"))
    seed_w = Window.orderBy("_id")
    cents = (
        emb.orderBy("_id")
        .limit(k)
        .select((F.row_number().over(seed_w) - 1).alias("cluster"), F.col("v").alias("centroid"))
        .localCheckpoint(eager=True)
    )

    def _assign(centroids: DataFrame) -> DataFrame:
        scored = emb.join(F.broadcast(centroids)).select(
            "_id",
            "v",
            "cluster",
            F.round(cosine_col(F.col("v"), F.col("centroid")), 6).alias("sim"),
        )
        w = Window.partitionBy("_id").orderBy(F.desc("sim"), F.asc("cluster"))
        return (
            scored.withColumn("_r", F.row_number().over(w))
            .where(F.col("_r") == 1)
            .select("_id", "v", "cluster", "sim")
        )

    for _ in range(iters):
        assigned = _assign(cents)
        if exact:
            new_cents = label_centroids_exact(
                assigned, label_col="cluster", vec_col="v", id_col="_id"
            )
        else:
            new_cents = label_centroids(assigned, label_col="cluster", vec_col="v")
        cents = (
            new_cents.select(F.col("list_id").alias("cluster"), "centroid")
            .localCheckpoint(eager=True)
        )

    return _assign(cents).select(
        F.col("_id").alias(id_col), "cluster", "sim"
    )


def quantize_embeddings(
    vectors: DataFrame,
    bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric per-vector scalar quantization of the embedding
    column — the standard compression step before ANN serving or
    training-shard export (int8 codes cut vector storage/bandwidth 4x
    vs float32 with a per-vector scale): scale = max|v_i| / qmax with
    qmax = 2^(bits-1) - 1, code_i = round(v_i / scale), so codes span
    [-qmax, qmax] with no clamping. Returns (vec_id, n_dims, scale,
    codes, max_err, mean_err): codes as a comma-joined scalar (the
    driver canonicalizer cannot sort arrays — the inverted_index
    posting trade), reconstruction errors |code_i*scale - v_i| rounded
    to 6. All-zero vectors quantize to all-zero codes at scale 0.

    Spark shape: one narrow JVM projection per row — no shuffle, no
    Python, nothing leaves the scan stage. Each array expression is
    materialized into a named column BEFORE the next lambda consumes
    it (the shingles_from_toks caveat: Catalyst re-evaluates computed
    expressions per element inside higher-order lambdas). Folds are
    strict left folds in array order so the doubles replay bit-exactly
    in the oracle's list_reduce.
    """
    qmax = float(2 ** (bits - 1) - 1)
    v = vectors.select(
        id_col,
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_v"),
    )
    m = v.select(
        id_col,
        "_v",
        F.aggregate(
            "_v", F.lit(0.0), lambda a, x: F.greatest(a, F.abs(x))
        ).alias("_m"),
    )
    scale = F.col("_m") / F.lit(qmax)
    coded = m.select(
        id_col,
        "_v",
        "_m",
        F.when(
            F.col("_m") == 0.0,
            F.transform(F.col("_v"), lambda x: F.lit(0)),
        )
        .otherwise(
            F.transform(F.col("_v"), lambda x: F.round(x / scale).cast("int"))
        )
        .alias("_c"),
    )
    errs = coded.select(
        id_col,
        "_v",
        "_m",
        "_c",
        F.transform(
            F.arrays_zip("_c", "_v"),
            lambda z: F.abs(z["_c"].cast("double") * scale - z["_v"]),
        ).alias("_e"),
    )
    n = F.size("_v")
    return errs.select(
        F.col(id_col),
        n.cast("int").alias("n_dims"),
        F.round(scale, 6).alias("scale"),
        F.concat_ws(",", F.transform("_c", lambda c: c.cast("string"))).alias(
            "codes"
        ),
        F.round(
            F.aggregate("_e", F.lit(0.0), lambda a, x: F.greatest(a, x)), 6
        ).alias("max_err"),
        F.when(n == 0, F.lit(0.0))
        .otherwise(
            F.round(
                F.aggregate("_e", F.lit(0.0), lambda a, x: a + x)
                / n.cast("double"),
                6,
            )
        )
        .alias("mean_err"),
    )


def semdedup(
    corpus: DataFrame,
    k: int = 4,
    iters: int = 2,
    threshold: float = 0.4,
    max_cluster: int = 10_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic deduplication by k-means
    clustering the embedding space, then pruning near-duplicate pairs
    INSIDE each cluster — the clustering is what makes pairwise cosine
    tractable at web scale (quadratic only within a cluster, never
    across the corpus). Within a duplicate pair the paper keeps the
    item with the LOWEST cosine to its centroid (the most "peripheral"
    exemplar preserves diversity); ties break on lowest id.

    Returns one row per input vector: (vec_id, cluster, centroid_sim,
    keep, kept_id, pair_cos). ``keep=false`` means some same-cluster
    neighbor y with round(cos(x, y), 6) >= threshold beats x on
    (centroid_sim, id) ordering; kept_id/pair_cos name the winning
    neighbor (the minimum such y) so the drop decision is auditable.
    Kept rows carry nulls there.

    Determinism: cluster assignment and centroid_sim come from
    kmeans_assign's bit-exact replayable recurrence; pair cosines are
    round(·, 6); the "beats" relation is a total order on
    (centroid_sim, id). Bit-for-bit replay in the SQL twin.

    Scale shape: the pair scan is ONE self-join keyed on cluster — at
    web scale k grows with N (SemDeDup uses ~10^5 clusters for LAION)
    so cluster width stays bounded; clusters wider than ``max_cluster``
    are excluded from the pair scan deterministically (their members
    are all kept, flagged by the audit discipline the dedup families
    use via EMB_MAX_BUCKET) rather than allowed to go quadratic. The
    winning-neighbor pick is a min_by aggregation (map-side combining),
    not a window over the pair fan-out."""
    if not 0.0 <= threshold <= 1.0:
        raise ValueError(f"threshold must be in [0, 1], got {threshold}")
    if max_cluster < 1:
        raise ValueError(f"max_cluster must be >= 1, got {max_cluster}")
    assigned = kmeans_assign(
        corpus, k=k, iters=iters, id_col=id_col, vec_col=vec_col
    )
    # one materialization of the assignment feeds FOUR consumers (width
    # audit, both pair-scan sides, the final left join): localCheckpoint
    # truncates the iterative kmeans lineage so the assign subplan is
    # computed once, not once per branch (the canon.py CC discipline)
    pts = (
        assigned.join(
            corpus.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")),
            assigned[id_col] == F.col("_id"),
        )
        .select(F.col(id_col), "cluster", "sim", "_v")
        .localCheckpoint(eager=True)
    )
    ok = (
        pts.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") <= max_cluster)
        .select("cluster")
    )
    scan = pts.join(ok, "cluster")
    x = scan.select(
        "cluster",
        F.col(id_col).alias("_xid"),
        F.col("sim").alias("_xsim"),
        F.col("_v").alias("_xv"),
    )
    y = scan.select(
        "cluster",
        F.col(id_col).alias("_yid"),
        F.col("sim").alias("_ysim"),
        F.col("_v").alias("_yv"),
    )
    beats = (
        x.join(y, "cluster")
        .where(F.col("_xid") != F.col("_yid"))
        .where(
            (F.col("_ysim") < F.col("_xsim"))
            | ((F.col("_ysim") == F.col("_xsim")) & (F.col("_yid") < F.col("_xid")))
        )
        .withColumn("_c", F.round(cosine_col(F.col("_xv"), F.col("_yv")), 6))
        .where(F.col("_c") >= threshold)
        .groupBy("_xid")
        .agg(
            F.min_by(
                F.struct(
                    F.col("_yid").alias("kept_id"), F.col("_c").alias("pair_cos")
                ),
                F.struct("_ysim", "_yid"),
            ).alias("_win")
        )
        .select("_xid", F.col("_win.kept_id"), F.col("_win.pair_cos"))
    )
    return pts.join(beats, pts[id_col] == beats["_xid"], "left").select(
        F.col(id_col),
        F.col("cluster").cast("int").alias("cluster"),
        F.col("sim").alias("centroid_sim"),
        F.col("_xid").isNull().alias("keep"),
        "kept_id",
        "pair_cos",
    )


# ---------------------------------------------------------------------------
# deletion-neighborhood fuzzy string join (SymSpell / FastSS shape)
# ---------------------------------------------------------------------------
def fuzzy_string_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_dist: int = 1,
    max_len: int = 32,
) -> DataFrame:
    """All (left, right) string pairs within Levenshtein distance
    ``max_dist`` — the blocked fuzzy join entity linking uses to fold
    typo'd mentions onto dictionary surface forms, without the
    all-pairs cross join a naive `levenshtein(a, b) <= k` predicate
    plans as.

    Shape (FastSS / SymSpell): each side explodes into its deletion
    neighborhood (the string + every <= ``max_dist``-character
    deletion; fan-out <= 1 + L + L^2/2, bounded by ``max_len`` — longer
    strings are dropped with the cap documented, not silently), the
    two variant tables equi-join on the variant hash key, candidate
    pairs dedup, and the built-in integer ``levenshtein`` verifies —
    candidate generation is COMPLETE (ed <= k implies a shared
    deletion variant), so the only approximation is the length cap.
    Returns (left, right, dist)."""
    if max_dist not in (1, 2):
        raise ValueError("max_dist must be 1 or 2")

    def variants(col: Column) -> Column:
        n = F.length(col)
        d1 = F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.concat(
                F.substring(col, F.lit(1), (i - 1).cast("int")),
                col.substr(i + 1, n),
            ),
        )
        vs = F.concat(F.array(col), d1)
        if max_dist == 2:
            d2 = F.flatten(
                F.transform(
                    d1,
                    lambda s: F.transform(
                        F.sequence(F.lit(1), F.length(s)),
                        lambda i: F.concat(
                            F.substring(s, F.lit(1), (i - 1).cast("int")),
                            s.substr(i + 1, F.length(s)),
                        ),
                    ),
                )
            )
            vs = F.concat(vs, d2)
        return F.array_distinct(vs)

    lv = (
        left.select(F.col(left_col).alias("l"))
        .where(F.length("l").between(1, max_len))
        .dropDuplicates()
        .select("l", F.explode(variants(F.col("l"))).alias("v"))
    )
    rv = (
        right.select(F.col(right_col).alias("r"))
        .where(F.length("r").between(1, max_len))
        .dropDuplicates()
        .select("r", F.explode(variants(F.col("r"))).alias("v"))
    )
    cand = lv.join(rv, "v").select("l", "r").dropDuplicates()
    return cand.select(
        F.col("l").alias(left_col + "_l") if left_col == right_col else F.col("l").alias(left_col),
        F.col("r").alias(right_col + "_r") if left_col == right_col else F.col("r").alias(right_col),
        F.levenshtein("l", "r").alias("dist"),
    ).where(F.col("dist") <= max_dist)
