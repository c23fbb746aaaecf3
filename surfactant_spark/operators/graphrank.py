"""Fixed-iteration PageRank over an entity edge table.

The KG pipeline's graph-analytics step: once edges exist (Surfactant's
relationship-establishment output, `relationships/__init__.py` dict
join — our `link.py` / `q_kg_edges`), entity salience ranks canonical
nodes for output ordering, canonicalization tie-breaks, and crawl
prioritization — the classic web-scale companion of a Common-Crawl KG.

Spark-first shape: per iteration ONE equi join (edges x ranks on src)
and ONE aggregation (sum of contributions by dst), both shuffles on the
edge keys — the same plan GraphX/Pregel lowers to, expressed directly
in DataFrame ops so Catalyst/AQE handle partition sizing and skew. The
rank frame is ``localCheckpoint``-ed every iteration: iterative
self-referential lineage otherwise grows a plan tree exponentially
(the north rule's 'iterative DataFrame self-join with checkpointing',
same discipline as canon.connected_components). At cluster scale the
edge table would be bucketed by ``src`` so the per-iteration join side
never re-shuffles; in-session we checkpoint it once instead.

Cross-engine determinism: ranks are integer micro-units (fixed point,
``scale`` = 1e6 per node) and every update uses integer division
(``div``), whose result is exact and order-independent — float sums
depend on aggregation order, so a double-typed rank would never
hash-match a DuckDB replay (same reason similarity.topk_ivf sums its
centroids in canonical order). Production would use doubles; the plan
shape is identical.

Dangling nodes (no out-edges) leak their mass instead of
redistributing it — the common large-scale simplification (their
global-redistribution term costs an extra all-node aggregate per
iteration); ranks are therefore salience scores up to a constant
factor, not a probability distribution. Deterministic either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank_fixed(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 5,
    scale: int = 1_000_000,
    damping_pct: int = 85,
    weight_col: str = None,
    seeds: DataFrame = None,
) -> DataFrame:
    """Run ``iters`` synchronous PageRank rounds over (src, dst) edges.

    rank_0(v) = scale
    rank_i(v) = scale*(100-d)/100  +  d * sum_{u->v} contrib(u->v)
                div 100            [all integer, d = damping_pct]

    where contrib(u->v) = rank_{i-1}(u) div outdeg(u) unweighted, or
    (rank_{i-1}(u) * w(u->v)) div wsum(u) with ``weight_col`` (integer
    edge weights > 0, e.g. evidence counts — a heavily-evidenced edge
    carries proportionally more of its source's mass).

    With ``seeds`` (a 1-column node-id frame) this is PERSONALIZED
    PageRank — the GraphRAG retrieval primitive: rank_0 and the
    teleport term apply only to seed nodes (rank_0 = scale*[v in S],
    base = scale*(100-d)/100*[v in S]), so mass diffuses outward from
    the seed set and rank is relevance TO the seeds, not global
    salience. Null/duplicate seed ids are dropped; the seed flag is a
    broadcast-sized join against the node table, resolved once.

    Multi-edges contribute multiply — pass a distinct edge set for the
    unweighted form. Returns (id, rank) with rank in micro-units.

    Overflow bound (weighted): rank*w must stay under 2^63 — total mass
    is <= n_nodes*scale, so at 10^12 nodes drop ``scale`` to ~10^3 or
    pre-normalize weights; the integer recurrence is otherwise exact at
    any size.
    """
    if not 0 < damping_pct < 100:
        raise ValueError("damping_pct must be in (0, 100)")
    cols = [F.col(src).alias("src"), F.col(dst).alias("dst")]
    if weight_col:
        cols.append(F.col(weight_col).cast("long").alias("w"))
    e = edges.select(*cols)
    # one materialization: e feeds nodes, outdeg, and every iteration
    e = e.localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .dropDuplicates()
        .localCheckpoint(eager=True)
    )
    if seeds is not None:
        seed_ids = (
            seeds.select(F.col(seeds.columns[0]).alias("id"))
            .where(F.col("id").isNotNull())
            .dropDuplicates()
            .withColumn("_s", F.lit(1).cast("long"))
        )
        nodes = (
            nodes.join(seed_ids, "id", "left")
            .select("id", F.coalesce("_s", F.lit(0).cast("long")).alias("s"))
            .localCheckpoint(eager=True)
        )
    else:
        nodes = nodes.withColumn("s", F.lit(1).cast("long"))
    wsum = F.sum("w") if weight_col else F.count(F.lit(1))
    outdeg = e.groupBy("src").agg(wsum.alias("outdeg"))
    src_side = e.join(outdeg, "src").localCheckpoint(eager=True)
    contrib_expr = "(rank * w) div outdeg" if weight_col else "rank div outdeg"

    base = scale * (100 - damping_pct) // 100
    ranks = nodes.select("id", (F.lit(scale) * F.col("s")).cast("long").alias("rank"))
    for _ in range(iters):
        contribs = (
            src_side.join(ranks.withColumnRenamed("id", "src"), "src")
            .select(
                F.col("dst").alias("id"),
                F.expr(contrib_expr).alias("contrib"),
            )
            .groupBy("id")
            .agg(F.sum("contrib").alias("c"))
        )
        ranks = (
            nodes.join(contribs, "id", "left")
            .select(
                "id",
                (
                    (F.lit(base) * F.col("s")).cast("long")
                    + F.expr(f"({damping_pct} * coalesce(c, 0L)) div 100")
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def pagerank_auto(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 5,
    scale: int = 1_000_000,
    damping_pct: int = 85,
    weight_col: str = None,
    small_threshold: int = 200_000,
    seeds: DataFrame = None,
) -> DataFrame:
    """Dispatch: distributed checkpointed iteration for big edge sets,
    driver recurrence below ``small_threshold`` edges — the same
    discipline as canon.connected_components_auto: a dimension-sized
    graph (the canonical-entity graph of a small corpus, an alias
    dictionary) pays one take() + O(iters * E) integer arithmetic on
    the driver instead of ~3 shuffle jobs per iteration; a web-scale
    entity graph automatically takes the distributed loop. Both paths
    produce identical integer ranks (the driver recurrence is the same
    formula pagerank_fixed evaluates in SQL expressions)."""
    if not 0 < damping_pct < 100:
        raise ValueError("damping_pct must be in (0, 100)")
    cols = [src, dst] + ([weight_col] if weight_col else [])
    rows = edges.select(*cols).take(small_threshold + 1)
    if len(rows) > small_threshold:
        return pagerank_fixed(
            edges, src, dst, iters, scale, damping_pct, weight_col, seeds
        )
    triples = [
        (r[0], r[1], int(r[2]) if weight_col else 1) for r in rows
    ]
    nodes = sorted({a for a, _, _ in triples} | {b for _, b, _ in triples})
    seed_set = (
        None
        if seeds is None
        else {r[0] for r in seeds.collect() if r[0] is not None}
    )
    in_s = (lambda v: 1) if seed_set is None else (lambda v: int(v in seed_set))
    wsum: dict = {}
    for a, _, w in triples:
        wsum[a] = wsum.get(a, 0) + w
    rank = {v: scale * in_s(v) for v in nodes}
    base = scale * (100 - damping_pct) // 100
    for _ in range(iters):
        inc = {v: 0 for v in nodes}
        for a, b, w in triples:
            inc[b] += (rank[a] * w) // wsum[a]
        rank = {
            v: base * in_s(v) + (damping_pct * inc[v]) // 100 for v in nodes
        }
    spark = edges.sparkSession
    id_type = edges.schema[src].dataType.simpleString()
    if not nodes:
        return spark.createDataFrame([], f"id {id_type}, rank long")
    return spark.createDataFrame(
        [(v, rank[v]) for v in nodes], f"id {id_type}, rank long"
    )


def edge_negatives(
    edges: DataFrame,
    nodes: DataFrame,
    k: int = 2,
    buckets: int = 1024,
    src: str = "src",
    dst: str = "dst",
    id_col: str = "id",
) -> DataFrame:
    """Deterministic negative sampling for KG-embedding training: for
    each (src, dst) edge emit ``k`` corrupted tails drawn from the node
    table — the (subj, pred, obj_corrupt) negatives every
    TransE/DistMult-style trainer consumes next to the positive edges.

    Rejecting ``rand()`` on purpose: negatives must be reproducible
    across retries, repartitions, and engines (the corpus_sample
    argument), so the draw is pure hash algebra — nodes land in
    ``buckets`` hash buckets with a deterministic representative
    (min id) per bucket, occupied buckets are ranked into contiguous
    SLOTS, and each (edge, i) probes slot H('neg{i}:' src|dst) mod
    n_slots — every probe hits a representative regardless of how
    sparse the bucket space is (a raw bucket probe silently yields
    nothing when |nodes| << buckets). Near-uniform over nodes once
    buckets ~ O(|nodes|); the bias (one representative per bucket) is
    the documented price of exact replayability.

    Plan shape: the representative table is dimension-sized (its
    ranking window and the driver-literal slot count are entity-scale,
    the comention_lift discipline), and the edge side pays one explode
    plus one broadcast equi join — no rand(), no corpus window.
    Negatives that collide with the edge's own endpoints are dropped
    (standard filtered negative sampling), so callers get UP TO k rows
    per edge.
    """
    from pyspark.sql import Window

    from .dedup import portable_hash64_col

    rep = (
        nodes.select(
            F.pmod(
                portable_hash64_col(
                    F.concat(F.lit("negb:"), F.col(id_col).cast("string"))
                ),
                F.lit(buckets),
            ).alias("bucket"),
            F.col(id_col).alias("neg"),
        )
        .groupBy("bucket")
        .agg(F.min("neg").alias("neg"))
        .withColumn(
            "slot", F.row_number().over(Window.orderBy("bucket")) - 1
        )
        .localCheckpoint(eager=True)
    )
    n_slots = rep.count()
    if n_slots == 0:
        # no nodes -> no representatives: Spark's pmod(hash, 0) would
        # silently yield null rows while the SQL twin's '% 0' raises —
        # return the declared empty shape explicitly in both engines
        return (
            edges.select(src, dst)
            .withColumn("i", F.lit(0).cast("int"))
            .withColumn("neg", F.lit(None).cast(nodes.schema[id_col].dataType))
            .where(F.lit(False))
            .select(src, dst, "i", "neg")
        )
    probes = edges.select(
        src, dst,
        F.explode(F.array(*[F.lit(i) for i in range(k)])).alias("i"),
    ).withColumn(
        "slot",
        F.pmod(
            portable_hash64_col(
                F.concat(
                    F.lit("neg"), F.col("i").cast("string"), F.lit(":"),
                    F.col(src).cast("string"), F.lit("|"),
                    F.col(dst).cast("string"),
                )
            ),
            F.lit(n_slots),
        ),
    )
    return (
        probes.join(F.broadcast(rep.select("slot", "neg")), "slot")
        .where((F.col("neg") != F.col(src)) & (F.col("neg") != F.col(dst)))
        .select(src, dst, "i", "neg")
    )


# ---------------------------------------------------------------------------
# k-hop BFS neighborhoods — bounded graph expansion for KG context
# windows (entity neighborhood retrieval, crawl frontier scoping).
# Reference analogue: Surfactant's transitive Contains/Uses walks over
# the relationship table (`surfactant/cmd/merge.py` root resolution
# walks parent edges); here generalized to min-hop labeling.
# ---------------------------------------------------------------------------
def khop_neighbors(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    k: int = 3,
    directed: bool = False,
) -> DataFrame:
    """(id, hops) for every node within ``k`` hops of ``seeds`` —
    hops = BFS distance (0 for the seeds themselves).

    Spark-first shape: per level ONE equi join (frontier x edges) +
    distinct + left_anti against the seen set — the synchronous-BFS
    plan Pregel lowers to. The seen set and each frontier are
    ``localCheckpoint``-ed (iterative self-referential lineage, same
    discipline as pagerank_fixed / connected_components). No driver
    actions: an exhausted frontier makes the remaining levels empty
    joins, which AQE collapses — k is small and fixed, so the
    empty-frontier early-exit count() is not worth an action per level.

    At cluster scale the edge table would be bucketed by ``src`` so
    per-level joins never re-shuffle the big side; frontier sizes are
    bounded by the k-hop ball, the classic BFS-on-web-graph behavior.
    Null node ids in ``seeds`` are dropped (they can never match an
    edge endpoint in either engine)."""
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    if not directed:
        e = e.unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
    e = e.where(F.col("a") != F.col("b")).dropDuplicates().localCheckpoint(eager=True)
    seed_col = seeds.columns[0]
    seen = (
        seeds.select(F.col(seed_col).alias("id"))
        .where(F.col("id").isNotNull())
        .dropDuplicates()
        .withColumn("hops", F.lit(0).cast("int"))
        .localCheckpoint(eager=True)
    )
    frontier = seen.select("id")
    for i in range(1, k + 1):
        nxt = (
            frontier.join(e, frontier["id"] == e["a"])
            .select(F.col("b").alias("id"))
            .dropDuplicates()
            .join(seen.select("id"), "id", "left_anti")
            .withColumn("hops", F.lit(i).cast("int"))
            .localCheckpoint(eager=True)
        )
        seen = seen.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt.select("id")
    return seen


# ---------------------------------------------------------------------------
# fixed-iteration HITS (hubs & authorities) — PageRank's bipartite
# companion for link graphs: directories/portals score as hubs, the
# pages they point at as authorities (Kleinberg 1999).
# ---------------------------------------------------------------------------
def hits_fixed(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight_col: str = None,
    iters: int = 2,
    scale: int = 1_000_000,
) -> DataFrame:
    """Run ``iters`` synchronous HITS rounds; returns (id, hub, auth).

    h_0(v) = 1;  a_i(v) = sum_{u->v} w * h_{i-1}(u);
    h_i(v) = sum_{v->w} w * a_i(w) — the unnormalized power iteration,
    all integer and therefore exact and aggregation-order-independent
    (the bit-exact-replay discipline of pagerank_fixed; HITS's usual
    L2 normalization needs sqrt, so instead each score vector is
    rescaled by the INTEGER factor max(raw) div scale — the relative
    ranking is unchanged and every value stays near ``scale``,
    bounding the next round's sums at W * 2*scale << 2^63 even at
    10^12-edge weight totals, where the un-rescaled recurrence would
    overflow by round two).

    Per iteration: two equi joins + two aggregations, shuffling on the
    edge endpoints (bucket the edge table by src/dst at cluster scale);
    the rescale factor is a 1-row broadcast, not a driver action.
    Multi-edges contribute multiply — pass distinct edges or weights.
    """
    if iters < 1:
        raise ValueError("iters must be >= 1")
    w_expr = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst"), w_expr.alias("w")
    ).localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .dropDuplicates()
        .localCheckpoint(eager=True)
    )

    def rescaled(raw: DataFrame) -> DataFrame:
        mx = raw.agg(F.max("raw").alias("_mx"))
        return (
            raw.crossJoin(F.broadcast(mx))
            .select(
                "id",
                F.expr(
                    f"raw div greatest(cast(1 as bigint), _mx div {scale})"
                ).alias("score"),
            )
            .localCheckpoint(eager=True)
        )

    h = nodes.select("id", F.lit(1).cast("long").alias("score"))
    a = None
    for _ in range(iters):
        a = rescaled(
            e.join(h, e["src"] == h["id"])
            .groupBy("dst")
            .agg(F.sum(F.col("w") * F.col("score")).alias("raw"))
            .select(F.col("dst").alias("id"), "raw")
        )
        h = rescaled(
            e.join(a, e["dst"] == a["id"])
            .groupBy("src")
            .agg(F.sum(F.col("w") * F.col("score")).alias("raw"))
            .select(F.col("src").alias("id"), "raw")
        )
    return (
        nodes.join(h.withColumnRenamed("score", "hub"), "id", "left")
        .join(a.withColumnRenamed("score", "auth"), "id", "left")
        .select(
            "id",
            F.coalesce("hub", F.lit(0).cast("long")).alias("hub"),
            F.coalesce("auth", F.lit(0).cast("long")).alias("auth"),
        )
    )


# ---------------------------------------------------------------------------
# exact triangle counting + local clustering coefficient — the
# degree-ordered node-iterator (Suri & Vassilvitskii, WWW'11): orient
# each undirected edge from the lower-(degree, id) endpoint to the
# higher, enumerate wedges at each source, close them against the
# oriented edge set. Orientation bounds every out-degree by O(sqrt(m)),
# so wedge generation is O(m^1.5) worst case and a celebrity host with
# 10^7 in-links generates NO wedges at all — the skew control that
# makes the count feasible on a web graph where the naive wedge count
# at hub nodes is quadratic.
# ---------------------------------------------------------------------------
def triangle_counts(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """(id, degree, n_triangles, clustering) per node over the
    UNDIRECTED simple graph of ``edges`` (directions merged, self-loops
    and multi-edges dropped). Each triangle is enumerated exactly once
    (its unique vertex with two out-edges in the orientation) and
    credited to all three corners; clustering = round(2T/(deg*(deg-1)),
    6), 0.0 below degree 2 — the exact-integer-inputs-one-IEEE-division
    discipline, identical in the SQL replay.

    Shuffles: one dedup on the canonical edge, one degree agg, the
    wedge self-join on the wedge center, the closing equi join on the
    (v, w) pair. The degree table is host-cardinality — broadcast-sized
    for a host graph; at entity scale AQE picks the strategy."""
    e = edges.select(F.col(src).alias("x"), F.col(dst).alias("y")).where(
        F.col(src) != F.col(dst)
    )
    und = (
        e.select(F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b"))
        .dropDuplicates()
        .localCheckpoint(eager=True)
    )
    deg = (
        und.select(F.col("a").alias("id"))
        .unionByName(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("degree"))
        .localCheckpoint(eager=True)
    )
    da = deg.select(F.col("id").alias("a"), F.col("degree").alias("dega"))
    db = deg.select(F.col("id").alias("b"), F.col("degree").alias("degb"))
    lower_first = (F.col("dega") < F.col("degb")) | (
        (F.col("dega") == F.col("degb")) & (F.col("a") < F.col("b"))
    )
    o = (
        und.join(da, "a")
        .join(db, "b")
        .select(
            F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        )
        .localCheckpoint(eager=True)
    )
    # wedges at u: ordered (v, w) pairs; the closing edge appears in o
    # in exactly ONE of the two orders, so each triangle counts once
    w2 = o.select(F.col("u").alias("u2"), F.col("v").alias("w"))
    wedges = o.join(w2, F.col("u") == F.col("u2")).where(F.col("v") != F.col("w"))
    closing = o.select(F.col("u").alias("v"), F.col("v").alias("w"))
    tri = wedges.join(closing, ["v", "w"]).select("u", "v", "w")
    per_node = (
        tri.select(F.explode(F.array("u", "v", "w")).alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return deg.join(per_node, "id", "left").select(
        "id",
        "degree",
        F.coalesce("n_triangles", F.lit(0).cast("long")).alias("n_triangles"),
        F.when(
            F.col("degree") >= 2,
            F.round(
                (F.coalesce("n_triangles", F.lit(0).cast("long")) * 2).cast("double")
                / (F.col("degree") * (F.col("degree") - 1)).cast("double"),
                6,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("clustering"),
    )


def degree_assortativity(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Degree assortativity coefficient of the undirected simple graph
    (Newman 2002): the Pearson correlation of endpoint degrees over
    edges — do hubs link to hubs (r > 0, social-network-like) or to
    leaves (r < 0, the classic web/Internet signature)?

    Exactness: over the SYMMETRIZED edge list the x and y degree sums
    coincide, so Pearson's sqrt(d1*d2) collapses to d1 and
    r = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2) is a ratio of EXACT integer
    sums — one IEEE division + round(6), no libm on the oracle
    surface. Returns one row (n_edges, assortativity); fewer than 2
    distinct degree values make the denominator 0 -> null (both
    engines).

    Shape: dedup to canonical undirected edges, one degree agg, two
    broadcast-sized joins of the degree dimension back onto edges, one
    global agg. Overflow: n*Sxy is bounded by 2m * (2m * maxdeg^2);
    at 10^10+ edges with celebrity degrees switch the sums to DOUBLE
    (the plan is unchanged) — at any testable scale the integer path
    is exact."""
    e = edges.select(F.col(src).alias("x"), F.col(dst).alias("y")).where(
        F.col(src) != F.col(dst)
    )
    und = (
        e.select(F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b"))
        .dropDuplicates()
        .localCheckpoint(eager=True)
    )
    deg = (
        und.select(F.col("a").alias("id"))
        .unionByName(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    sym = und.unionByName(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    pairs = (
        sym.join(deg.select(F.col("id").alias("a"), F.col("d").alias("dx")), "a")
        .join(deg.select(F.col("id").alias("b"), F.col("d").alias("dy")), "b")
        .select("dx", "dy")
    )
    agg = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("dx") * F.col("dy")).alias("sxy"),
        F.sum("dx").alias("sx"),
        F.sum(F.col("dx") * F.col("dx")).alias("sxx"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sx")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return agg.select(
        (F.col("n") / 2).cast("long").alias("n_edges"),
        F.when(den != 0, F.round(num.cast("double") / den.cast("double"), 6))
        .alias("assortativity"),
    )


def kcore(
    edges: DataFrame,
    k: int = 2,
    max_rounds: int = 8,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """The k-core of the UNDIRECTED simple graph of ``edges``
    (directions merged, self-loops and multi-edges dropped): the
    maximal subgraph in which every node keeps degree >= k, computed by
    the standard peeling fixpoint (Seidman 1983 / Batagelj-Zaveršnik) —
    drop all nodes below degree k, recompute degrees, repeat. Returns
    (id, core_degree): each surviving node with its degree INSIDE the
    core. The web-graph reading: the k-core is the densely
    interconnected crawl nucleus, the standard coarse filter before
    community detection.

    Spark shape — each round is one degree aggregation over the
    surviving edge set plus two semi joins against the keep set (node-
    dimension-sized: broadcast for a host graph, AQE-decided at entity
    scale); the edge set is eagerly localCheckpoint'ed per round (the
    CC lineage discipline). Peeling converges in <= max_rounds or
    truncates there deterministically — the oracle unrolls EXACTLY
    max_rounds (converged rounds are no-ops on both engines, so an
    early break is result-identical); callers assert convergence where
    the fixpoint semantic matters (the gate query's test does).
    """
    e = edges.select(F.col(src).alias("x"), F.col(dst).alias("y")).where(
        F.col(src) != F.col(dst)
    )
    und = e.select(
        F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b")
    ).dropDuplicates()
    sym = und.unionByName(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint(eager=True)
    prev = -1
    for _ in range(max_rounds):
        keep = (
            sym.groupBy("a")
            .agg(F.count(F.lit(1)).alias("d"))
            .where(F.col("d") >= k)
            .select("a")
        )
        n = keep.count()
        if n == prev:
            break
        prev = n
        sym = kcore_peel_round(sym, keep).localCheckpoint(eager=True)
    return sym.groupBy(F.col("a").alias("id")).agg(
        F.count(F.lit(1)).alias("core_degree")
    )


def kcore_peel_round(sym: DataFrame, keep: DataFrame) -> DataFrame:
    """One peel round's surviving-edge frame: the symmetrized edge set
    filtered to endpoints in the keep set — two equi joins against a
    node-dimension table. Exposed (pre-checkpoint) so the plan tests
    can assert the round stays nested-loop- and Python-free."""
    return (
        sym.join(keep, "a")
        .join(keep.select(F.col("a").alias("b")), "b")
        .select("a", "b")
    )


# ---------------------------------------------------------------------------
# Synchronized label propagation — community detection
# (Raghavan-Albert-Kumara 2007, made deterministic)
# ---------------------------------------------------------------------------
def undirected_simple(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """The eagerly-checkpointed UNDIRECTED simple graph of ``edges``
    (directions merged via least/greatest, self-loops and multi-edges
    dropped) as (a, b) with a < b — the shared-pass input the
    kcore/LPA/modularity family accepts so a query composing several
    graph operators derives and checkpoints the edge set ONCE (the
    webgraph `links=` discipline)."""
    e = edges.select(F.col(src).alias("x"), F.col(dst).alias("y")).where(
        F.col(src) != F.col(dst)
    )
    return (
        e.select(F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b"))
        .dropDuplicates()
        .localCheckpoint(eager=True)
    )


def label_propagation(
    edges: DataFrame,
    n_rounds: int = 3,
    src: str = "src",
    dst: str = "dst",
    und: DataFrame | None = None,
) -> DataFrame:
    """Community detection over the UNDIRECTED simple graph of
    ``edges`` by SYNCHRONIZED label propagation: every node starts
    labeled with its own id, and each round every node simultaneously
    adopts the most frequent label among its neighbors, ties broken by
    MINIMUM label. Classic async LPA is visit-order-dependent (useless
    for an oracle-checked engine); the synchronized variant with a
    total tie order is fully deterministic, so the DuckDB twin unrolls
    the SAME ``n_rounds`` and matches bit-for-bit. Returns
    (node, community) — the community id is a member node's id.

    Spark shape — per round: ONE equi join of the symmetrized edge set
    against the node-dimension label table (AQE broadcasts it for host
    graphs, shuffles at entity scale), then a two-level
    map-side-combinable aggregation — (node, label) counts, then
    min(struct(-count, label)) per node, the same agg-not-window trick
    the W1 queries use so no per-node sort buffer exists. Labels are
    localCheckpoint'ed each round (the CC/PageRank lineage
    discipline). Fixed rounds, not convergence-polled: each round is
    one more shuffle over the edge set, and community quality
    plateaus within a few rounds on power-law graphs. Pass a prebuilt
    ``und`` (from :func:`undirected_simple`) to share one edge pass
    across composed graph operators.
    """
    if und is None:
        und = undirected_simple(edges, src, dst)
    sym = und.unionByName(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint(eager=True)
    labels = sym.select(F.col("a").alias("node")).dropDuplicates().select(
        "node", F.col("node").alias("label")
    )
    for _ in range(n_rounds):
        nb = sym.join(
            labels.select(F.col("node").alias("b"), "label"), "b"
        ).select(F.col("a").alias("node"), "label")
        pick = (
            nb.groupBy("node", "label")
            .agg(F.count(F.lit(1)).alias("c"))
            .groupBy("node")
            .agg(
                F.min(
                    F.struct(
                        (-F.col("c")).alias("nc"), F.col("label").alias("l")
                    )
                ).alias("m")
            )
            .select("node", F.col("m.l").alias("new_label"))
        )
        labels = (
            labels.join(pick, "node", "left")
            .select(
                "node",
                F.coalesce("new_label", "label").alias("label"),
            )
            .localCheckpoint(eager=True)
        )
    return labels.select("node", F.col("label").alias("community"))


def partition_modularity(
    edges: DataFrame,
    labels: DataFrame,
    node_col: str = "node",
    community_col: str = "community",
    src: str = "src",
    dst: str = "dst",
    und: DataFrame | None = None,
) -> DataFrame:
    """Newman modularity audit of a node partition over the UNDIRECTED
    simple graph of ``edges``: per community, the exact integer
    ingredients — member count, intra-community edge count, total
    member degree, and the global edge count m — plus the community's
    modularity term round(n_intra/m - (degree_sum/(2m))^2, 6). Sum the
    terms for the partition's Q; the integers let the audit replay
    bit-exactly and survive re-aggregation (the same exact-ingredients
    discipline as host_metrics). Returns (community, n_members,
    n_intra, degree_sum, m_edges, mod_term).

    Spark shape: two equi joins of the (eagerly checkpointed) edge set
    against the node-dimension label table, then combinable aggs; m is
    a driver literal off the checkpoint (one count, no constant-key
    join). Labels come from any partitioner (label_propagation,
    connected components, k-core shells). Pass a prebuilt ``und``
    (from :func:`undirected_simple`) to share one edge pass across
    composed graph operators. An edgeless graph (m = 0) has no
    modularity — the empty frame with the declared schema is returned
    rather than letting ANSI mode raise DIVIDE_BY_ZERO.
    """
    if und is None:
        und = undirected_simple(edges, src, dst)
    m = und.count()
    if m == 0:
        # empty frame with the declared columns, community keeping the
        # caller's label type
        return labels.limit(0).select(
            F.col(community_col).alias("community"),
            *(
                F.lit(0).cast("long").alias(c)
                for c in ("n_members", "n_intra", "degree_sum", "m_edges")
            ),
            F.lit(0.0).alias("mod_term"),
        )
    lab = labels.select(
        F.col(node_col).alias("node"), F.col(community_col).alias("community")
    )
    intra = (
        und.join(lab.select(F.col("node").alias("a"), "community"), "a")
        .join(
            lab.select(
                F.col("node").alias("b"), F.col("community").alias("cb")
            ),
            "b",
        )
        .where(F.col("community") == F.col("cb"))
        .groupBy("community")
        .agg(F.count(F.lit(1)).alias("n_intra"))
    )
    sym = und.unionByName(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    deg = sym.groupBy("a").agg(F.count(F.lit(1)).alias("d"))
    members = (
        lab.join(deg.select(F.col("a").alias("node"), "d"), "node", "left")
        .groupBy("community")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum(F.coalesce("d", F.lit(0))).alias("degree_sum"),
        )
    )
    return (
        members.join(intra, "community", "left")
        .select(
            "community",
            "n_members",
            F.coalesce("n_intra", F.lit(0)).cast("long").alias("n_intra"),
            F.col("degree_sum").cast("long").alias("degree_sum"),
            F.lit(m).cast("long").alias("m_edges"),
            F.round(
                F.coalesce("n_intra", F.lit(0)).cast("double") / F.lit(float(m))
                - (
                    F.col("degree_sum").cast("double")
                    / F.lit(2.0 * m)
                )
                ** 2,
                6,
            ).alias("mod_term"),
        )
    )


def deterministic_walks(
    edges: DataFrame,
    walk_len: int = 4,
    src: str = "src",
    dst: str = "dst",
    salt: str = "walk:v1",
) -> DataFrame:
    """DeepWalk-style walk corpus over a directed edge table: one walk
    per node, ``walk_len`` steps, emitted as (walk_id, step, node) rows
    — the sequence corpus a skip-gram node-embedding trainer consumes
    (walks -> skipgram_pairs -> edge_negatives is the standard
    node-embedding training-data pipeline; DeepWalk, KDD 2014).

    Instead of rand() (plan-dependent, never replayable), step ``t`` of
    the walk started at node ``s`` moves to the out-neighbor minimizing
    the portable md5 hash of ``salt:s:t:neighbor`` — a pure function of
    the edge set, so walks are bit-identical across retries, partition
    layouts, and engines (the sample_bucket_col discipline), while
    successive steps still decorrelate (hash depends on both walk and
    step). Dead-end nodes simply end their walk early.

    Per step: ONE equi join (frontier x edges on the current node) and
    ONE min_by aggregation keyed by walk id — the pagerank_fixed
    iteration discipline. min_by is partial-aggregable, so a hub node's
    out-fan combines map-side before the shuffle; AQE's skew split
    handles a frontier piled onto one hot host. Each frontier is
    localCheckpoint-ed: iterative lineage otherwise compounds."""
    from .dedup import portable_hash64_col

    if walk_len < 0:
        raise ValueError(f"walk_len must be >= 0, got {walk_len}")
    e = edges.select(F.col(src).alias("_src"), F.col(dst).alias("_dst"))
    nodes = (
        e.select(F.col("_src").alias("node"))
        .unionByName(e.select(F.col("_dst").alias("node")))
        .distinct()
    )
    frontier = nodes.select(
        F.col("node").alias("walk_id"), F.lit(0).alias("step"), "node"
    ).localCheckpoint(eager=True)
    out = frontier
    for t in range(1, walk_len + 1):
        h = portable_hash64_col(
            F.concat_ws(
                ":", F.lit(salt), F.col("walk_id"), F.lit(str(t)), F.col("_dst")
            )
        )
        frontier = (
            frontier.join(e, frontier["node"] == e["_src"])
            .select("walk_id", F.col("_dst"), h.alias("h"))
            .groupBy("walk_id")
            .agg(
                F.min_by(
                    "_dst", F.struct(F.col("h"), F.col("_dst"))
                ).alias("node")
            )
            .select("walk_id", F.lit(t).alias("step"), "node")
            .localCheckpoint(eager=True)
        )
        out = out.unionByName(frontier)
    return out


def skipgram_pairs(walks: DataFrame, window: int = 2) -> DataFrame:
    """(center, context, n_pairs) skip-gram co-occurrence counts from a
    walk corpus — the positive-example table a node-embedding trainer
    pairs with edge_negatives. Context = any node within ``window``
    steps (both directions) of the center inside the same walk.

    The self-join is keyed by walk_id with per-walk width <= walk_len+1
    rows, so join fan-out is bounded by the walk length squared —
    corpus-linear, never quadratic in nodes. The count agg combines
    map-side (hot node pairs collapse before the shuffle)."""
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    a = walks.select(
        "walk_id", F.col("step").alias("s_a"), F.col("node").alias("center")
    )
    b = walks.select(
        "walk_id", F.col("step").alias("s_b"), F.col("node").alias("context")
    )
    return (
        a.join(b, "walk_id")
        .where(
            (F.col("s_a") != F.col("s_b"))
            & (F.abs(F.col("s_a") - F.col("s_b")) <= window)
        )
        .groupBy("center", "context")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


def twohop_paths(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    fanout_cap: int = 100_000,
) -> DataFrame:
    """Two-hop path counts per (src, dst) node pair — the classic
    link-prediction feature family (common-neighbor / path-count
    scores): (src, dst, n_paths, n_mids) for every pair connected by
    at least one directed 2-step path through a middle node.

    The join is keyed by the middle node, where path fan-out is
    in_deg(mid) * out_deg(mid) — a stop-token-like hub would
    concentrate millions of pairs into one join key (the same blowup
    class the dedup families cap). Middles whose in*out product
    exceeds ``fanout_cap`` are EXCLUDED up front (deterministic,
    mirrored in the oracle): a hub every node touches carries no
    link-prediction signal, exactly like a stopword in tf-idf. Both
    degree aggs and the final pair agg combine map-side.

    ``ra_micro`` is the resource-allocation index (Zhou et al. 2009)
    in integer micro-units: each distinct middle contributes
    1e6 div (in_deg + out_deg), so rarer bridges score higher — the
    degree-discounted variant of the raw path count, in the
    pagerank_fixed exact-integer discipline (a float sum would never
    replay across engines)."""
    if fanout_cap < 1:
        raise ValueError(f"fanout_cap must be >= 1, got {fanout_cap}")
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
    ind = e.groupBy(F.col("_d").alias("mid")).agg(
        F.count(F.lit(1)).alias("in_deg")
    )
    outd = e.groupBy(F.col("_s").alias("mid")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )
    allowed = (
        ind.join(outd, "mid")
        .where(F.col("in_deg") * F.col("out_deg") <= fanout_cap)
        .select(
            "mid",
            F.expr("div(1000000, in_deg + out_deg)").alias("_ra_w"),
        )
    )
    a = e.select(F.col("_s").alias("src"), F.col("_d").alias("mid"))
    b = e.select(F.col("_s").alias("mid"), F.col("_d").alias("dst"))
    per_mid = (
        a.join(allowed, "mid")
        .join(b, "mid")
        .where(F.col("src") != F.col("dst"))
        .groupBy("src", "dst", "mid")
        .agg(
            F.count(F.lit(1)).alias("_k"),
            F.first("_ra_w").alias("_w"),
        )
    )
    return per_mid.groupBy("src", "dst").agg(
        F.sum("_k").cast("long").alias("n_paths"),
        F.count(F.lit(1)).alias("n_mids"),
        F.sum("_w").cast("long").alias("ra_micro"),
    )


def adamic_adar(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    wedge_cap: int = 100_000,
    und: DataFrame | None = None,
) -> DataFrame:
    """Adamic-Adar link prediction over the UNDIRECTED simple graph of
    ``edges`` (Adamic & Adar 2003): for every non-adjacent node pair
    sharing at least one common neighbor, score the pair by how RARE
    their shared company is — each common neighbor z contributes
    1/log2(deg z), so a co-citation through a two-link host says far
    more than one through a portal. The missing-link ranking crawl
    scheduling and KG completion consume.

    Returns (a, b, n_common, aa_micro, aa_score) with a < b and the
    pair NOT already an edge. The weight is quantized to exact integer
    micro-units ``1e6 div floor(log2(deg))`` (floor(log2) is the
    integer bit length, ``length(bin(deg)) - 1`` — the lm_bits trick),
    so the per-pair sum is order-independent and replays bit-for-bit
    in the SQL twin; the only IEEE op is the final display divide.
    A common neighbor has degree >= 2 by construction, so the bit
    length is never zero.

    Scale shape: the wedge join is keyed by the common neighbor, where
    fan-out is deg^2 — a portal hub would concentrate millions of
    pairs into one key (the twohop_paths blowup class). Neighbors with
    ``deg * (deg - 1) > wedge_cap`` are EXCLUDED up front
    (deterministic, mirrored in the oracle): a hub every host touches
    carries ~zero Adamic-Adar weight anyway — it is the stopword of
    link prediction. Degree agg and pair agg both combine map-side;
    the adjacency never sorts or collects."""
    if wedge_cap < 1:
        raise ValueError(f"wedge_cap must be >= 1, got {wedge_cap}")
    if und is None:
        und = undirected_simple(edges, src, dst)
    deg = (
        und.select(F.col("a").alias("id"))
        .unionByName(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    via = deg.where(
        (F.col("degree") >= 2)
        & (F.col("degree") * (F.col("degree") - 1) <= F.lit(wedge_cap))
    ).select(
        F.col("id").alias("mid"),
        F.expr("div(1000000, length(bin(degree)) - 1)").alias("_w"),
    )
    adj = und.select(F.col("a").alias("mid"), F.col("b").alias("nbr")).unionByName(
        und.select(F.col("b").alias("mid"), F.col("a").alias("nbr"))
    )
    lo = adj.join(via, "mid").select("mid", F.col("nbr").alias("a"), "_w")
    hi = adj.select("mid", F.col("nbr").alias("b"))
    pairs = (
        lo.join(hi, "mid")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.sum("_w").cast("long").alias("aa_micro"),
        )
    )
    return pairs.join(und, ["a", "b"], "left_anti").select(
        "a",
        "b",
        "n_common",
        "aa_micro",
        F.round(F.col("aa_micro").cast("double") / 1e6, 6).alias("aa_score"),
    )


def neighborhood_function(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_t: int = 6,
    p90: float = 0.9,
) -> DataFrame:
    """Exact neighborhood function of the directed graph — N(t) = the
    number of ordered (u, v) pairs with shortest-path distance <= t,
    for t = 1..``max_t`` — plus each radius's fraction of N(max_t) and
    the >= ``p90`` flag the effective-diameter read-off uses. This is
    the distance profile web-graph reports publish (Boldi & Vigna's
    HyperBall estimates it with HLL counters at 10^11-node scale;
    Common Crawl's graph releases quote the resulting effective
    diameter); host graphs are dimension-sized, so the EXACT function
    is computable and auditable — the estimate path would swap the
    per-node pair sets for the sketch.py HLL registers without
    changing the iteration shape.

    Spark-first shape: synchronous multi-source BFS over (u, v, d)
    pairs — per level ONE equi join (frontier x edges) + distinct +
    left_anti against the seen set, all localCheckpoint-ed (the
    khop_neighbors discipline, run from every node at once); no
    driver actions, exhausted frontiers collapse to empty joins under
    AQE. The final histogram/cumsum window runs over <= ``max_t``
    rows. Distances are exact integers; the only IEEE op is the final
    divide + round(6)."""
    if max_t < 1:
        raise ValueError("max_t must be >= 1")
    from pyspark.sql.window import Window

    seen = _pair_distances(edges, src, dst, max_t)
    hist = seen.groupBy("d").agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    tot = hist.agg(F.sum("n").cast("long").alias("np"))
    frac = F.round(
        F.sum("n").over(w).cast("double") / F.col("np").cast("double"), 6
    )
    return (
        hist.crossJoin(F.broadcast(tot))
        .select(
            F.col("d").cast("long").alias("t"),
            F.sum("n").over(w).cast("long").alias("n_pairs"),
            frac.alias("frac"),
            (frac >= F.lit(p90)).alias("reaches_p90"),
        )
    )


def _closure(
    e: DataFrame, seed: DataFrame, max_t: int, forward: bool
) -> DataFrame:
    """Reachable-node closure from ``seed`` along (or against) the
    edge direction within ``max_t`` hops — khop_neighbors' frontier
    discipline, returned as a bare (id) set."""
    a, b = ("a", "b") if forward else ("b", "a")
    seen = seed.select("id").dropDuplicates().localCheckpoint(eager=True)
    frontier = seen
    for _ in range(max_t):
        nxt = (
            frontier.join(e, frontier["id"] == e[a])
            .select(F.col(b).alias("id"))
            .dropDuplicates()
            .join(seen, "id", "left_anti")
            .localCheckpoint(eager=True)
        )
        seen = seen.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return seen


def bowtie_structure(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_t: int = 8,
) -> DataFrame:
    """Bow-tie decomposition of the directed graph (Broder et al.,
    WWW 2000 — the canonical map of the web's macro-structure): pick
    the deterministic pivot (max total degree, smallest id breaking
    ties), compute its forward and backward reachability closures, and
    label every node CORE (both — the pivot's strongly connected
    component), IN (reaches the core but not reached), OUT (reached
    but doesn't reach back), or DISCONNECTED (neither; tendrils and
    islands fold here — the full Broder taxonomy needs per-tendril
    walks the host-dimension product doesn't pay for). Closures are
    hop-bounded by ``max_t`` (documented: web-graph diameters are
    small; raise it for pathological chains).

    Spark shape: two khop-style frontier BFS closures (ONE equi join +
    distinct + left_anti per hop, localCheckpoint-ed) + one degree
    aggregation for the pivot — all at node-dimension cardinality, the
    connected_components / pagerank iteration discipline. Returns
    (host, region) plus a region size replay column n_region."""
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .where(F.col("a") != F.col("b"))
        .where(F.col("a").isNotNull() & F.col("b").isNotNull())
        .dropDuplicates()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("a").alias("id"))
        .unionByName(e.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
        .localCheckpoint(eager=True)
    )
    pivot = nodes.orderBy(F.col("deg").desc(), F.col("id").asc()).limit(1).select("id")
    fw = _closure(e, pivot, max_t, forward=True).select(
        "id", F.lit(True).alias("_fw")
    )
    bw = _closure(e, pivot, max_t, forward=False).select(
        "id", F.lit(True).alias("_bw")
    )
    lab = (
        nodes.select("id")
        .join(fw, "id", "left")
        .join(bw, "id", "left")
        .select(
            "id",
            F.when(F.col("_fw") & F.col("_bw"), "core")
            .when(F.col("_bw").isNotNull(), "in")
            .when(F.col("_fw").isNotNull(), "out")
            .otherwise("disconnected")
            .alias("region"),
        )
    )
    sizes = lab.groupBy("region").agg(F.count(F.lit(1)).cast("long").alias("n_region"))
    return lab.join(sizes, "region").select(
        F.col("id").alias("host"), "region", "n_region"
    )


def _pair_distances(edges: DataFrame, src: str, dst: str, max_t: int) -> DataFrame:
    """(u, v, d) exact shortest-path pairs within ``max_t`` hops — the
    multi-source frontier BFS shared by neighborhood_function and
    harmonic_centrality (one equi join + distinct + left_anti per
    level, localCheckpoint-ed)."""
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .where(F.col("a") != F.col("b"))
        .where(F.col("a").isNotNull() & F.col("b").isNotNull())
        .dropDuplicates()
        .localCheckpoint(eager=True)
    )
    seen = (
        e.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .withColumn("d", F.lit(1).cast("int"))
        .localCheckpoint(eager=True)
    )
    frontier = seen.select("u", "v")
    for t in range(2, max_t + 1):
        nxt = (
            frontier.join(e, frontier["v"] == e["a"])
            .select("u", F.col("b").alias("v"))
            .where(F.col("u") != F.col("v"))
            .dropDuplicates()
            .join(seen.select("u", "v"), ["u", "v"], "left_anti")
            .withColumn("d", F.lit(t).cast("int"))
            .localCheckpoint(eager=True)
        )
        seen = seen.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt.select("u", "v")
    return seen


def harmonic_centrality(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_t: int = 6,
) -> DataFrame:
    """Exact hop-bounded harmonic centrality: H(v) = sum over nodes u
    reaching v of 1/d(u, v) — the centrality Boldi & Vigna recommend
    over closeness for web graphs (bounded, meaningful on disconnected
    graphs; their HyperBall estimates it at 10^11 nodes, host graphs
    afford the exact computation). Scores are EXACT integers in
    1/60ths: 60 is divisible by every d in 1..6, so ``sum(60 // d)``
    carries no rounding at the default radius and the decimal column
    is one IEEE division at the end. Returns (host, n_reaching,
    h_micro60, harmonic).

    Same BFS-pair shape as neighborhood_function (shared helper); the
    final reduction is one groupBy(v) aggregation."""
    if max_t < 1 or max_t > 6:
        raise ValueError("max_t must be in [1, 6] (60ths stay exact)")
    pairs = _pair_distances(edges, src, dst, max_t)
    return (
        pairs.groupBy("v")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_reaching"),
            F.sum(F.lit(60).cast("long") / F.col("d")).cast("long").alias(
                "h_micro60"
            ),
        )
        .select(
            F.col("v").alias("host"),
            "n_reaching",
            "h_micro60",
            F.round(F.col("h_micro60").cast("double") / 60.0, 6).alias("harmonic"),
        )
    )
