"""pagerank_fixed and near_dup_clusters unit tests.

The PageRank expectations are computed by an independent pure-Python
integer recurrence in this file (not by reusing the operator), so the
test pins the arithmetic contract, not the implementation.
"""

import pytest
from pyspark.sql import functions as F


def _py_pagerank(edges, iters=5, scale=1_000_000, damp=85):
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    outdeg = {}
    for a, _ in edges:
        outdeg[a] = outdeg.get(a, 0) + 1
    rank = {v: scale for v in nodes}
    base = scale * (100 - damp) // 100
    for _ in range(iters):
        incoming = {v: 0 for v in nodes}
        for a, b in edges:
            incoming[b] += rank[a] // outdeg[a]
        rank = {v: base + (damp * incoming[v]) // 100 for v in nodes}
    return rank


EDGES = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "c")]


def test_pagerank_matches_reference_recurrence(spark):
    from surfactant_spark.operators.graphrank import pagerank_fixed

    df = spark.createDataFrame(EDGES, "src string, dst string")
    got = {r.id: r.rank for r in pagerank_fixed(df, iters=5).collect()}
    assert got == _py_pagerank(EDGES, iters=5)


def test_pagerank_sink_and_dangling(spark):
    # d has no in-edges: only the base term survives every round; a
    # receives c's whole (large) mass undivided, so it ranks highest
    from surfactant_spark.operators.graphrank import pagerank_fixed

    df = spark.createDataFrame(EDGES, "src string, dst string")
    got = {r.id: r.rank for r in pagerank_fixed(df, iters=5).collect()}
    assert got["d"] == 150_000
    assert got["a"] == max(got.values())
    # deterministic across runs (integer math, no float sums)
    again = {r.id: r.rank for r in pagerank_fixed(df, iters=5).collect()}
    assert got == again


def test_pagerank_multiedge_and_validation(spark):
    from surfactant_spark.operators.graphrank import pagerank_fixed

    dup = spark.createDataFrame(
        [("a", "b"), ("a", "b"), ("b", "a")], "src string, dst string"
    )
    got = {r.id: r.rank for r in pagerank_fixed(dup, iters=2).collect()}
    # multi-edges split outdeg: a's two a->b edges each carry rank//2
    assert got == _py_pagerank([("a", "b"), ("a", "b"), ("b", "a")], iters=2)
    with pytest.raises(ValueError):
        pagerank_fixed(dup, damping_pct=100)


def test_near_dup_clusters_election(spark):
    from surfactant_spark.operators.dedup import near_dup_clusters

    docs = spark.createDataFrame(
        [(1, 10), (2, 30), (3, 30), (4, 5), (9, 7)],
        "doc_id long, n_chars long",
    )
    # 1-2 and 2-3 chain into one cluster; 4 pairs with nobody listed in
    # docs' pair set; 9 is a singleton
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id1 long, id2 long")
    rows = {r.doc_id: r for r in near_dup_clusters(docs, pairs).collect()}
    assert rows["1"].cluster_id == "1" and not rows["1"].is_survivor
    # survivor: max n_chars (30), tie between 2 and 3 -> smaller id 2
    assert rows["2"].is_survivor and not rows["3"].is_survivor
    assert rows["3"].cluster_id == "1"
    # singletons survive as their own cluster
    assert rows["4"].is_survivor and rows["4"].cluster_id == "4"
    assert rows["9"].is_survivor and rows["9"].cluster_id == "9"
    # exactly one survivor per cluster, every doc labeled
    assert len(rows) == 5
    survivors = [r for r in rows.values() if r.is_survivor]
    assert len(survivors) == 3


def test_stratified_sample_and_hash_split(spark):
    from surfactant_spark.operators.textops import (
        hash_split,
        sample_bucket_col,
        stratified_sample,
    )

    docs = spark.range(0, 4000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("de").alias("lang"),
    )
    kept = stratified_sample(docs, {"en": 0.25}, default_rate=1.0).toPandas()
    n_en = (kept.lang == "en").sum()
    n_de = (kept.lang == "de").sum()
    assert n_de == 2000  # default rate keeps everything
    assert 400 < n_en < 600  # ~25% of 2000

    # split: covers every row, roughly proportional, deterministic
    split = hash_split(docs, {"train": 0.9, "val": 0.05, "test": 0.05}).toPandas()
    counts = split.groupby("split").size()
    assert set(counts.index) == {"train", "val", "test"}
    assert counts.sum() == 4000 and counts["train"] > 3400
    again = hash_split(docs, {"train": 0.9, "val": 0.05, "test": 0.05}).toPandas()
    assert dict(zip(split.doc_id, split.split)) == dict(zip(again.doc_id, again.split))

    # growth stability: a doc's split never changes when the corpus
    # grows (the label is a pure function of the id, not of the corpus)
    small = hash_split(
        docs.where(F.col("doc_id") < 100), {"train": 0.9, "val": 0.05, "test": 0.05}
    )
    small_map = {r.doc_id: r.split for r in small.collect()}
    big_map = dict(zip(split.doc_id, split.split))
    assert small_map and all(big_map[k] == v for k, v in small_map.items())

    # independence: sample and split buckets use different salts
    b = docs.select(
        sample_bucket_col(F.col("doc_id"), "sample:v1").alias("s"),
        sample_bucket_col(F.col("doc_id"), "split:v1").alias("p"),
    ).toPandas()
    assert (b.s != b.p).any()

    import pytest as _pytest

    with _pytest.raises(ValueError):
        stratified_sample(docs, {"en": 1.5})
    with _pytest.raises(ValueError):
        hash_split(docs, {})


def test_corpus_sample_plan_is_scan_rooted_no_shuffle(spark):
    """The sampling query is one projection+filter on the parquet scan:
    no Exchange (shuffle), no Python, and the scan reads only the two
    projected columns."""
    from surfactant_spark.queries import q_corpus_sample
    from tests.conftest import SF_DIR

    df = q_corpus_sample(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    scan = [l for l in plan.splitlines() if "FileScan" in l or "Scan parquet" in l]
    assert scan and "text" not in scan[0]


def test_duplicate_spans_known_overlap(spark):
    from surfactant_spark.operators.dedup import duplicate_spans

    shared = "the quick brown fox jumps over the lazy dog tonight"  # 10 tokens
    docs = spark.createDataFrame(
        [
            (1, "alpha beta " + shared + " gamma delta"),
            (2, shared + " unrelated tail content here now"),
            (3, "completely different text with no overlap at all whatsoever"),
            # internal repetition only — not cross-doc, must NOT fire
            (4, "rep rep rep rep rep rep rep rep rep rep rep rep"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in duplicate_spans(docs, w=8, min_docs=2).collect()}
    # doc 1: shared tokens at offsets 2..11 -> windows 2,3,4 fuse to one span
    assert out[1].span_start == 2 and out[1].span_end == 11 and out[1].n_windows == 3
    # doc 2: same content at offsets 0..9
    assert out[2].span_start == 0 and out[2].span_end == 9 and out[2].n_windows == 3
    assert 3 not in out and 4 not in out
    # min_docs=1 turns internal repetition visible for doc 4
    solo = duplicate_spans(docs, w=8, min_docs=1)
    assert solo.where(F.col("doc_id") == 4).count() > 0


def test_repetition_metrics_known_values(spark):
    from surfactant_spark.operators.textops import repetition_metrics

    docs = spark.createDataFrame(
        [
            (1, "a b a b a b"),     # bigrams: ab,ba,ab,ba,ab -> top 3/5, all dup
            (2, "w x y z"),          # 3 bigrams, all unique
            (3, "solo"),             # <2 tokens -> degenerate
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in repetition_metrics(docs).collect()}
    assert out[1].n_bigrams == 5
    assert out[1].top_bigram_frac == 0.6 and out[1].dup_bigram_frac == 1.0
    assert out[1].distinct_token_ratio == round(2 / 6, 6)
    assert out[2].n_bigrams == 3
    assert out[2].top_bigram_frac == round(1 / 3, 6) and out[2].dup_bigram_frac == 0.0
    assert out[2].distinct_token_ratio == 1.0
    assert out[3].n_bigrams == 0
    assert out[3].top_bigram_frac == 0.0 and out[3].dup_bigram_frac == 0.0


def test_pagerank_weighted_matches_reference_recurrence(spark):
    from surfactant_spark.operators.graphrank import pagerank_fixed

    wedges = [("a", "b", 3), ("a", "c", 1), ("b", "c", 2), ("c", "a", 5)]

    def py_weighted(edges, iters=4, scale=1_000_000, damp=85):
        nodes = sorted({a for a, _, _ in edges} | {b for _, b, _ in edges})
        wsum = {}
        for a, _, w in edges:
            wsum[a] = wsum.get(a, 0) + w
        rank = {v: scale for v in nodes}
        base = scale * (100 - damp) // 100
        for _ in range(iters):
            inc = {v: 0 for v in nodes}
            for a, b, w in edges:
                inc[b] += (rank[a] * w) // wsum[a]
            rank = {v: base + (damp * inc[v]) // 100 for v in nodes}
        return rank

    df = spark.createDataFrame(wedges, "src string, dst string, n long")
    got = {
        r.id: r.rank
        for r in pagerank_fixed(df, iters=4, weight_col="n").collect()
    }
    assert got == py_weighted(wedges, iters=4)
    # weighting changes the result vs unweighted on the same edges
    unw = {r.id: r.rank for r in pagerank_fixed(df, iters=4).collect()}
    assert got != unw


def test_contamination_spans_directional(spark):
    from surfactant_spark.operators.dedup import contamination_spans

    bench = "the quick brown fox jumps over the lazy dog tonight"  # 10 tokens
    train = spark.createDataFrame(
        [
            (1, "intro words " + bench + " outro words"),
            (2, "nothing shared with any benchmark text here at all today"),
        ],
        "doc_id long, text string",
    )
    probes = spark.createDataFrame([(100, bench)], "doc_id long, text string")
    out = {r.doc_id: r for r in contamination_spans(train, probes, w=8).collect()}
    # only the contaminated train doc is flagged, with the right offsets
    assert list(out) == [1]
    assert out[1].span_start == 2 and out[1].span_end == 11 and out[1].n_windows == 3
    # probes never pair with each other / are never reported
    assert 100 not in out


def test_pagerank_auto_paths_agree(spark):
    from surfactant_spark.operators.graphrank import pagerank_auto, pagerank_fixed

    df = spark.createDataFrame(EDGES, "src string, dst string")
    small = {r.id: r.rank for r in pagerank_auto(df, iters=5).collect()}
    big = {r.id: r.rank for r in pagerank_auto(df, iters=5, small_threshold=0).collect()}
    fixed = {r.id: r.rank for r in pagerank_fixed(df, iters=5).collect()}
    assert small == big == fixed == _py_pagerank(EDGES, iters=5)
    # weighted dispatch agrees too, and long ids keep their type
    wdf = spark.createDataFrame(
        [(1, 2, 3), (2, 1, 1)], "src long, dst long, n long"
    )
    ws = pagerank_auto(wdf, iters=3, weight_col="n")
    wb = pagerank_auto(wdf, iters=3, weight_col="n", small_threshold=0)
    assert ws.schema["id"].dataType.simpleString() == "bigint"
    assert {r.id: r.rank for r in ws.collect()} == {r.id: r.rank for r in wb.collect()}


def test_edge_negatives_deterministic_and_filtered(spark):
    """Negative sampling: reproducible across runs/repartitions, never
    emits an edge endpoint as its own negative, at most k per edge,
    and every negative is a real node."""
    from surfactant_spark.operators.graphrank import edge_negatives

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (7, 9)], "src long, dst long"
    )
    nodes = spark.createDataFrame([(i,) for i in range(1, 12)], "id long")
    a = {tuple(r) for r in edge_negatives(edges, nodes, k=3).collect()}
    b = {
        tuple(r)
        for r in edge_negatives(edges.repartition(7), nodes, k=3).collect()
    }
    assert a == b and a
    node_set = set(range(1, 12))
    per_edge = {}
    for src, dst, i, neg in a:
        assert neg != src and neg != dst
        assert neg in node_set
        per_edge[(src, dst)] = per_edge.get((src, dst), 0) + 1
    assert all(c <= 3 for c in per_edge.values())


def test_edge_negatives_empty_nodes(spark):
    """Zero nodes means zero slots: must return the declared empty
    shape, not silently-null rows (Spark pmod(hash, 0) yields null)
    nor a division-by-zero like a naive '% 0'."""
    from surfactant_spark.operators.graphrank import edge_negatives

    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    nodes = spark.createDataFrame([], "id long")
    out = edge_negatives(edges, nodes, k=3)
    assert out.columns == ["src", "dst", "i", "neg"]
    assert out.count() == 0


def test_edge_negatives_plan_is_broadcast_equi(spark):
    from surfactant_spark.operators.graphrank import edge_negatives

    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    nodes = spark.createDataFrame([(i,) for i in range(40)], "id long")
    plan = edge_negatives(edges, nodes)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# k-hop BFS neighborhoods
# ---------------------------------------------------------------------------
def _khop(spark, edges, seeds, **kw):
    from surfactant_spark.operators.graphrank import khop_neighbors

    e = spark.createDataFrame(edges, "src string, dst string")
    s = spark.createDataFrame([(x,) for x in seeds], "id string")
    return {r.id: r.hops for r in khop_neighbors(e, s, **kw).collect()}


def test_khop_chain_undirected(spark):
    chain = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
    got = _khop(spark, chain, ["a"], k=3)
    assert got == {"a": 0, "b": 1, "c": 2, "d": 3}  # e is 4 hops: excluded


def test_khop_directed_follows_edge_direction(spark):
    chain = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
    got = _khop(spark, chain, ["c"], k=3, directed=True)
    assert got == {"c": 0, "d": 1, "e": 2}  # nothing upstream of c


def test_khop_min_hops_on_cycle_and_seed_hygiene(spark):
    tri = [("a", "b"), ("b", "c"), ("a", "c"), ("a", "a")]  # self-loop dropped
    got = _khop(spark, tri, ["a", "a", None], k=2)
    assert got == {"a": 0, "b": 1, "c": 1}  # c is 1 hop, never relabeled 2


# ---------------------------------------------------------------------------
# fixed-iteration integer HITS
# ---------------------------------------------------------------------------
_HITS_EDGES = [("A", "B"), ("A", "C"), ("B", "C"), ("C", "A")]


def test_hits_hand_computed_two_iterations(spark):
    """h0=1; a1={A:1,B:1,C:2}; h1={A:3,B:2,C:1}; a2={A:1,B:3,C:5};
    h2={A:8,B:5,C:1} — all rescale divisors 1 at the default scale."""
    from surfactant_spark.operators.graphrank import hits_fixed

    e = spark.createDataFrame(_HITS_EDGES, "src string, dst string")
    got = {r.id: (r.hub, r.auth) for r in hits_fixed(e, iters=2).collect()}
    assert got == {"A": (8, 1), "B": (5, 3), "C": (1, 5)}


def test_hits_rescale_divides_by_integer_factor(spark):
    """At scale=3 the final hub raws {A:8,B:5,C:1} rescale by
    8 div 3 = 2 -> {A:4,B:2,C:0}; earlier rounds' divisors stay 1."""
    from surfactant_spark.operators.graphrank import hits_fixed

    e = spark.createDataFrame(_HITS_EDGES, "src string, dst string")
    got = {r.id: (r.hub, r.auth) for r in hits_fixed(e, iters=2, scale=3).collect()}
    assert got == {"A": (4, 1), "B": (2, 3), "C": (0, 5)}


def test_hits_weighted_and_validation(spark):
    """Weighted single edge u-(w=7)->v: a1(v)=7, h1(u)=49, a2(v)=343,
    h2(u)=2401 (divisors all 1 at the default scale)."""
    import pytest as _pytest

    from surfactant_spark.operators.graphrank import hits_fixed

    e = spark.createDataFrame([("u", "v", 7)], "src string, dst string, w long")
    got = {r.id: (r.hub, r.auth) for r in hits_fixed(e, weight_col="w", iters=2).collect()}
    assert got == {"u": (2401, 0), "v": (0, 343)}
    with _pytest.raises(ValueError):
        hits_fixed(e, iters=0)


def test_hits_empty_edges(spark):
    from surfactant_spark.operators.graphrank import hits_fixed

    e = spark.createDataFrame([], "src string, dst string")
    assert hits_fixed(e, iters=2).count() == 0


# ---------------------------------------------------------------------------
# personalized PageRank (seeded teleport)
# ---------------------------------------------------------------------------
def test_ppr_hand_computed_chain(spark):
    """a->b->c, seed {a}, 2 iters: r1 = (150000, 850000, 0);
    r2 = (150000, 127500, 722500) — teleport mass only at the seed."""
    from surfactant_spark.operators.graphrank import pagerank_fixed

    e = spark.createDataFrame([("a", "b"), ("b", "c")], "src string, dst string")
    s = spark.createDataFrame([("a",)], "id string")
    got = {r.id: r.rank for r in pagerank_fixed(e, iters=2, seeds=s).collect()}
    assert got == {"a": 150_000, "b": 127_500, "c": 722_500}


def test_ppr_auto_paths_agree_and_seed_hygiene(spark):
    """Driver and distributed dispatch produce identical seeded ranks;
    null/duplicate seed ids are dropped."""
    from surfactant_spark.operators.graphrank import pagerank_auto, pagerank_fixed

    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")], "src string, dst string"
    )
    s = spark.createDataFrame([("a",), ("a",), (None,)], "id string")
    driver = {r.id: r.rank for r in pagerank_auto(e, iters=3, seeds=s).collect()}
    dist = {r.id: r.rank for r in pagerank_fixed(e, iters=3, seeds=s).collect()}
    assert driver == dist
    assert driver["a"] > driver["b"] > 0  # mass concentrates near the seed


# ---------------------------------------------------------------------------
# exact triangle counting
# ---------------------------------------------------------------------------
def test_triangles_hand_computed(spark):
    """K4 minus edge (a,d): triangles abc, bcd. Counts a:1 b:2 c:2 d:1;
    clustering a=1.0, b=c=round(4/6,6), d=1.0."""
    from surfactant_spark.operators.graphrank import triangle_counts

    e = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c"), ("b", "d"), ("c", "d")],
        "src string, dst string",
    )
    got = {
        r.id: (r.degree, r.n_triangles, r.clustering)
        for r in triangle_counts(e).collect()
    }
    assert got == {
        "a": (2, 1, 1.0),
        "b": (3, 2, 0.666667),
        "c": (3, 2, 0.666667),
        "d": (2, 1, 1.0),
    }


def test_triangles_merge_directions_and_drop_loops(spark):
    """Reversed duplicates and self-loops must not change the simple-
    graph counts."""
    from surfactant_spark.operators.graphrank import triangle_counts

    e = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("b", "c"), ("c", "a"), ("a", "a")],
        "src string, dst string",
    )
    got = {r.id: (r.degree, r.n_triangles) for r in triangle_counts(e).collect()}
    assert got == {"a": (2, 1), "b": (2, 1), "c": (2, 1)}


def test_triangles_star_is_triangle_free(spark):
    """A hub with only leaf edges has zero triangles and — because the
    hub sorts LAST in the degree order — zero oriented out-edges, the
    skew-control property."""
    from surfactant_spark.operators.graphrank import triangle_counts

    e = spark.createDataFrame(
        [("hub", f"leaf{i}") for i in range(6)], "src string, dst string"
    )
    rows = triangle_counts(e).collect()
    assert all(r.n_triangles == 0 and r.clustering == 0.0 for r in rows)
    assert {r.id: r.degree for r in rows}["hub"] == 6


# ---------------------------------------------------------------------------
# degree assortativity
# ---------------------------------------------------------------------------
def test_assortativity_star_is_maximally_disassortative(spark):
    """A star graph's assortativity is exactly -1 (every edge joins the
    max-degree hub to a degree-1 leaf)."""
    from surfactant_spark.operators.graphrank import degree_assortativity

    e = spark.createDataFrame(
        [("hub", f"l{i}") for i in range(5)], "src string, dst string"
    )
    r = degree_assortativity(e).collect()[0]
    assert r.n_edges == 5 and r.assortativity == -1.0


def test_assortativity_regular_graph_is_degenerate_null(spark):
    """A cycle (every degree 2) has zero degree variance -> the
    coefficient is undefined: both engines emit null, not a crash."""
    from surfactant_spark.operators.graphrank import degree_assortativity

    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string"
    )
    r = degree_assortativity(e).collect()[0]
    assert r.n_edges == 3 and r.assortativity is None


def test_assortativity_hand_computed_path(spark):
    """Path a-b-c-d: degrees 1,2,2,1; symmetrized endpoint-degree
    pairs (1,2),(2,1),(2,2),(2,2),(2,1),(1,2) -> n=6, sx=10, sxx=18,
    sxy=16, r = (6*16 - 100)/(6*18 - 100) = -4/8 = -0.5."""
    from surfactant_spark.operators.graphrank import degree_assortativity

    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], "src string, dst string"
    )
    r = degree_assortativity(e).collect()[0]
    assert r.n_edges == 3 and r.assortativity == -0.5


# ---------------------------------------------------------------------------
# properties: BFS and triangle counts vs independent pure-python
# references on arbitrary small graphs
# ---------------------------------------------------------------------------
from hypothesis import given, settings, strategies as st

_node = st.integers(min_value=0, max_value=9)
_edges_st = st.lists(st.tuples(_node, _node), min_size=1, max_size=30)


def _py_bfs(edges, seed, k):
    adj = {}
    for a, b in edges:
        if a != b:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    dist, frontier = {seed: 0}, {seed}
    for i in range(1, k + 1):
        frontier = {
            n for u in frontier for n in adj.get(u, ()) if n not in dist
        }
        for n in frontier:
            dist[n] = i
    return dist


@settings(max_examples=8, deadline=None)
@given(_edges_st)
def test_khop_matches_python_bfs(spark, edges):
    from surfactant_spark.operators.graphrank import khop_neighbors

    seed = min(min(a, b) for a, b in edges)
    e = spark.createDataFrame(edges, "src long, dst long")
    s = spark.createDataFrame([(seed,)], "id long")
    got = {r.id: r.hops for r in khop_neighbors(e, s, k=3).collect()}
    assert got == _py_bfs(edges, seed, 3)


def _py_triangles(edges):
    und = {tuple(sorted(p)) for p in edges if p[0] != p[1]}
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tris = set()
    for a, b in und:
        for c in adj[a] & adj[b]:
            tris.add(tuple(sorted((a, b, c))))
    return {
        v: (len(adj[v]), sum(v in t for t in tris)) for v in adj
    }


@settings(max_examples=8, deadline=None)
@given(_edges_st)
def test_triangles_match_python_enumeration(spark, edges):
    from surfactant_spark.operators.graphrank import triangle_counts

    want = _py_triangles(edges)
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {r.id: (r.degree, r.n_triangles) for r in triangle_counts(e).collect()}
    assert got == want


def _py_hits(edges, iters=2, scale=1_000_000):
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    h = {v: 1 for v in nodes}
    a = {v: 0 for v in nodes}
    for _ in range(iters):
        raw = {v: 0 for v in nodes}
        for s, d in edges:
            raw[d] += h[s]
        q = max(1, max(raw.values(), default=0) // scale)
        a = {v: raw[v] // q for v in nodes}
        raw = {v: 0 for v in nodes}
        for s, d in edges:
            raw[s] += a[d]
        q = max(1, max(raw.values(), default=0) // scale)
        h = {v: raw[v] // q for v in nodes}
    return {v: (h[v], a[v]) for v in nodes}


@settings(max_examples=8, deadline=None)
@given(_edges_st, st.integers(min_value=1, max_value=3))
def test_hits_matches_python_recurrence(spark, edges, iters):
    """Multi-edges and self-loops included — both implementations must
    weight them identically (docstring contract: multiply)."""
    from surfactant_spark.operators.graphrank import hits_fixed

    e = spark.createDataFrame(edges, "src long, dst long")
    got = {r.id: (r.hub, r.auth) for r in hits_fixed(e, iters=iters).collect()}
    assert got == _py_hits(edges, iters=iters)


def _py_ppr(edges, seeds, iters=5, scale=1_000_000, damp=85):
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    s = {v: (1 if v in seeds else 0) for v in nodes}
    outdeg = {}
    for a, _ in edges:
        outdeg[a] = outdeg.get(a, 0) + 1
    rank = {v: scale * s[v] for v in nodes}
    base = scale * (100 - damp) // 100
    for _ in range(iters):
        inc = {v: 0 for v in nodes}
        for a, b in edges:
            inc[b] += rank[a] // outdeg[a]
        rank = {v: base * s[v] + (damp * inc[v]) // 100 for v in nodes}
    return rank


@settings(max_examples=8, deadline=None)
@given(_edges_st, st.sets(_node, min_size=1, max_size=3), st.integers(1, 4))
def test_ppr_matches_python_recurrence(spark, edges, seeds, iters):
    """The seeded teleport path of pagerank_fixed (new this round) on
    arbitrary graphs and seed sets — including seeds that are not
    graph nodes at all (they must simply contribute nothing)."""
    from surfactant_spark.operators.graphrank import pagerank_fixed

    e = spark.createDataFrame(edges, "src long, dst long")
    s = spark.createDataFrame([(x,) for x in seeds], "id long")
    got = {r.id: r.rank for r in pagerank_fixed(e, iters=iters, seeds=s).collect()}
    assert got == _py_ppr(edges, seeds, iters=iters)


def _py_assortativity(edges):
    und = {tuple(sorted(p)) for p in edges if p[0] != p[1]}
    deg = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    pairs = [(deg[a], deg[b]) for a, b in und] + [(deg[b], deg[a]) for a, b in und]
    n = len(pairs)
    sx = sum(x for x, _ in pairs)
    sxx = sum(x * x for x, _ in pairs)
    sxy = sum(x * y for x, y in pairs)
    den = n * sxx - sx * sx
    from tests.test_training_ops import _round6_half_up

    r = None if den == 0 else _round6_half_up((n * sxy - sx * sx) / den)
    return (n // 2, r) if und else None


@settings(max_examples=8, deadline=None)
@given(_edges_st)
def test_assortativity_matches_python_pearson(spark, edges):
    from surfactant_spark.operators.graphrank import degree_assortativity

    e = spark.createDataFrame(edges, "src long, dst long")
    rows = degree_assortativity(e).collect()
    want = _py_assortativity(edges)
    if want is None:  # only self-loops -> empty simple graph
        assert rows[0].n_edges in (0, None) or rows[0].n_edges == 0
        assert rows[0].assortativity is None
        return
    assert (rows[0].n_edges, rows[0].assortativity) == want


# ---------------------------------------------------------------------------
# k-core peeling
# ---------------------------------------------------------------------------
def _py_kcore(pairs, k):
    """Independent pure-python peeler over the undirected simple graph."""
    adj = {}
    for x, y in pairs:
        if x == y:
            continue
        adj.setdefault(x, set()).add(y)
        adj.setdefault(y, set()).add(x)
    changed = True
    while changed:
        drop = [n for n, nb in adj.items() if len(nb) < k]
        changed = bool(drop)
        for n in drop:
            for m in adj[n]:
                adj[m].discard(n)
            del adj[n]
    return {n: len(nb) for n, nb in adj.items() if nb}


def test_kcore_peels_tail_then_cascade(spark):
    """Triangle abc with a pendant path c-d-e: at k=2 the path peels in
    two cascading rounds (e first, then d), leaving the triangle."""
    from surfactant_spark.operators.graphrank import kcore

    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e")],
        "src string, dst string",
    )
    got = {r.id: r.core_degree for r in kcore(e, k=2).collect()}
    assert got == {"a": 2, "b": 2, "c": 2}


def test_kcore_merges_directions_and_drops_loops(spark):
    """Reversed duplicates and self-loops must not inflate degrees: a
    triangle stated with both directions plus a self-loop is still a
    plain 2-core of degree 2."""
    from surfactant_spark.operators.graphrank import kcore

    e = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"), ("c", "a"), ("a", "a")],
        "src string, dst string",
    )
    got = {r.id: r.core_degree for r in kcore(e, k=2).collect()}
    assert got == {"a": 2, "b": 2, "c": 2}


def test_kcore_empty_below_k(spark):
    from surfactant_spark.operators.graphrank import kcore

    e = spark.createDataFrame([("a", "b")], "src string, dst string")
    out = kcore(e, k=2)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["id", "core_degree"]


def test_kcore_gate_query_converges_within_round_budget(spark):
    """The fixpoint semantic of the gate query: on the driver fixture
    the peel must CONVERGE within KCORE_ROUNDS (the oracle unrolls
    exactly that many rounds — identity with a truncated peel would be
    vacuous)."""
    from surfactant_spark.operators.graphrank import kcore
    from surfactant_spark.operators.webgraph import host_graph
    from surfactant_spark.queries import (
        KCORE_K,
        KCORE_ROUNDS,
        _read_web_pages,
    )

    edges = host_graph(_read_web_pages(spark)).select(
        F.col("src_host").alias("src"), F.col("dst_host").alias("dst")
    )
    budget = {r.id: r.core_degree for r in kcore(edges, k=KCORE_K, max_rounds=KCORE_ROUNDS).collect()}
    fixpoint = {r.id: r.core_degree for r in kcore(edges, k=KCORE_K, max_rounds=64).collect()}
    assert budget == fixpoint and budget  # converged AND non-trivial


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)).map(
            lambda t: (f"n{t[0]}", f"n{t[1]}")
        ),
        min_size=0,
        max_size=25,
    ),
    st.integers(min_value=1, max_value=4),
)
def test_kcore_matches_python_peeler(spark, pairs, k):
    from surfactant_spark.operators.graphrank import kcore

    e = spark.createDataFrame(
        pairs or [("x", "x")], "src string, dst string"
    )
    got = {r.id: r.core_degree for r in kcore(e, k=k, max_rounds=32).collect()}
    assert got == _py_kcore(pairs, k)


# ---------------------------------------------------------------------------
# synchronized label propagation (round-5 post-window addition)
# ---------------------------------------------------------------------------
def _py_lpa(edges, rounds):
    """Pure-python reference of the deterministic synchronized LPA:
    most frequent neighbor label, ties -> minimum label."""
    from collections import Counter, defaultdict

    adj = defaultdict(set)
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    labels = {v: v for v in adj}
    for _ in range(rounds):
        labels = {
            v: min(
                Counter(labels[u] for u in adj[v]).items(),
                key=lambda kv: (-kv[1], kv[0]),
            )[0]
            for v in adj
        }
    return labels


def test_lpa_two_cliques_with_bridge(spark):
    from surfactant_spark.operators.graphrank import label_propagation

    tri = lambda p, n: [
        (f"{p}{i}", f"{p}{j}") for i in range(n) for j in range(i + 1, n)
    ]
    edges = tri("a", 4) + tri("b", 5) + [("a0", "b0")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.node: r.community for r in label_propagation(df, n_rounds=3).collect()}
    assert {got[f"a{i}"] for i in range(4)} == {"a0"}
    assert {got[f"b{i}"] for i in range(5)} == {"b0"}


@settings(max_examples=8, deadline=None)
@given(_edges_st, st.integers(min_value=1, max_value=3))
def test_lpa_matches_python_reference(spark, edges, rounds):
    from surfactant_spark.operators.graphrank import label_propagation

    edges = [e for e in edges if e[0] != e[1]]
    if not edges:
        return
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.node: r.community
        for r in label_propagation(df, n_rounds=rounds).collect()
    }
    assert got == _py_lpa(edges, rounds)


def test_partition_modularity_hand_case(spark):
    """Two 3-cliques + one bridge: m=7; each community has 3 intra
    edges; degrees 2,2,3 per clique member -> degree_sum 7. Q term =
    3/7 - (7/14)^2 = round(0.178571..., 6). Ground communities fed
    directly (not via LPA) so the audit is isolated."""
    from surfactant_spark.operators.graphrank import partition_modularity

    tri = lambda p: [(f"{p}0", f"{p}1"), (f"{p}0", f"{p}2"), (f"{p}1", f"{p}2")]
    edges = spark.createDataFrame(
        tri("a") + tri("b") + [("a0", "b0")], "src string, dst string"
    )
    labels = spark.createDataFrame(
        [(f"{p}{i}", p) for p in "ab" for i in range(3)],
        "node string, community string",
    )
    got = {
        r.community: (r.n_members, r.n_intra, r.degree_sum, r.m_edges, r.mod_term)
        for r in partition_modularity(edges, labels).collect()
    }
    assert got["a"] == (3, 3, 7, 7, 0.178571)
    assert got["b"] == (3, 3, 7, 7, 0.178571)


def test_partition_modularity_edgeless_graph_is_empty_not_error(spark):
    """m = 0 (only self-loops) must return the declared empty frame,
    not an ANSI DIVIDE_BY_ZERO, with community keeping the label type."""
    from surfactant_spark.operators.graphrank import partition_modularity

    edges = spark.createDataFrame([("a", "a")], "src string, dst string")
    labels = spark.createDataFrame([("a", "a")], "node string, community string")
    out = partition_modularity(edges, labels)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "community", "n_members", "n_intra", "degree_sum", "m_edges", "mod_term",
    ]


# ---------------------------------------------------------------------------
# deterministic walks + skip-gram pairs
# ---------------------------------------------------------------------------
def _py_walks(edges, walk_len, salt="walk:v1"):
    """Independent pure-Python replay of the hash-argmin walk."""
    from surfactant_spark.functions.hashing import portable_hash64

    out_adj = {}
    nodes = set()
    for a, b in edges:
        out_adj.setdefault(a, []).append(b)
        nodes.update((a, b))
    rows = []
    for s in sorted(nodes):
        cur = s
        rows.append((s, 0, s))
        for t in range(1, walk_len + 1):
            nbrs = out_adj.get(cur)
            if not nbrs:
                break
            cur = min(nbrs, key=lambda d: (portable_hash64(f"{salt}:{s}:{t}:{d}"), d))
            rows.append((s, t, cur))
    return sorted(rows)


WALK_EDGES = [
    ("a", "b"), ("a", "c"), ("b", "c"), ("b", "d"),
    ("c", "a"), ("c", "d"), ("d", "a"), ("e", "a"),
]


def test_walks_match_python_reference(spark):
    from surfactant_spark.operators.graphrank import deterministic_walks

    e = spark.createDataFrame(WALK_EDGES, "src string, dst string")
    got = sorted(
        (r.walk_id, r.step, r.node)
        for r in deterministic_walks(e, walk_len=3).collect()
    )
    assert got == _py_walks(WALK_EDGES, 3)


def test_walks_follow_edges_and_dead_end_stops(spark):
    from surfactant_spark.operators.graphrank import deterministic_walks

    edges = [("a", "b"), ("b", "z")]  # z is a dead end
    e = spark.createDataFrame(edges, "src string, dst string")
    rows = deterministic_walks(e, walk_len=5).collect()
    byw = {}
    for r in rows:
        byw.setdefault(r.walk_id, {})[r.step] = r.node
    eset = set(edges)
    for w, steps in byw.items():
        assert steps[0] == w
        for t in range(1, max(steps) + 1):
            assert (steps[t - 1], steps[t]) in eset
    # chain a->b->z then dead end: walk 'a' has exactly steps 0..2
    assert sorted(byw["a"]) == [0, 1, 2]
    assert byw["z"] == {0: "z"}


def test_walks_validation_and_empty(spark):
    from surfactant_spark.operators.graphrank import deterministic_walks

    e = spark.createDataFrame([], "src string, dst string")
    assert deterministic_walks(e, walk_len=2).count() == 0
    with pytest.raises(ValueError):
        deterministic_walks(e, walk_len=-1)


def test_skipgram_hand_computed_chain(spark):
    from surfactant_spark.operators.graphrank import skipgram_pairs

    # one walk: a b c d  (steps 0..3), window 2
    walks = spark.createDataFrame(
        [("w", 0, "a"), ("w", 1, "b"), ("w", 2, "c"), ("w", 3, "d")],
        "walk_id string, step int, node string",
    )
    got = {
        (r.center, r.context): r.n_pairs
        for r in skipgram_pairs(walks, window=2).collect()
    }
    want = {}
    seq = ["a", "b", "c", "d"]
    for i in range(4):
        for j in range(4):
            if i != j and abs(i - j) <= 2:
                k = (seq[i], seq[j])
                want[k] = want.get(k, 0) + 1
    assert got == want
    with pytest.raises(ValueError):
        skipgram_pairs(walks, window=0)


# ---------------------------------------------------------------------------
# two-hop path counts
# ---------------------------------------------------------------------------
def _py_twohop(edges, cap):
    from collections import Counter, defaultdict

    ind, outd = Counter(), Counter()
    for a, b in edges:
        outd[a] += 1
        ind[b] += 1
    allowed = {m for m in set(ind) & set(outd) if ind[m] * outd[m] <= cap}
    paths, mids = Counter(), defaultdict(set)
    for a, m in edges:
        if m not in allowed:
            continue
        for m2, c in edges:
            if m2 == m and a != c:
                paths[(a, c)] += 1
                mids[(a, c)].add(m)
    return {
        k: (
            v,
            len(mids[k]),
            sum(1_000_000 // (ind[m] + outd[m]) for m in mids[k]),
        )
        for k, v in paths.items()
    }


def test_twohop_matches_python_reference_and_cap(spark):
    from surfactant_spark.operators.graphrank import twohop_paths

    # hub 'h' has in_deg 3 * out_deg 2 = 6 > cap 4 -> excluded;
    # 'm' has 1*1 = 1 -> kept; duplicate edge multiplies path counts
    edges = [
        ("a", "h"), ("b", "h"), ("c", "h"), ("h", "x"), ("h", "y"),
        ("a", "m"), ("m", "z"), ("p", "q"), ("q", "p"),
        ("d", "e"), ("d", "e"), ("e", "f"),
    ]
    e = spark.createDataFrame(edges, "src string, dst string")
    for cap in (4, 100):
        got = {
            (r.src, r.dst): (r.n_paths, r.n_mids, r.ra_micro)
            for r in twohop_paths(e, fanout_cap=cap).collect()
        }
        assert got == _py_twohop(edges, cap), f"cap={cap}"
    # p<->q cycle: p->q->p is a self-pair, dropped
    assert ("p", "p") not in _py_twohop(edges, 100)
    with pytest.raises(ValueError):
        twohop_paths(e, fanout_cap=0)


def _py_adamic(edges, wedge_cap=100_000):
    """Independent pure-Python Adamic-Adar with the quantized weights."""
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nbrs = {}
    for a, b in und:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    deg = {v: len(ns) for v, ns in nbrs.items()}
    out = {}
    for z, ns in nbrs.items():
        d = deg[z]
        if d < 2 or d * (d - 1) > wedge_cap:
            continue
        w = 1_000_000 // (d.bit_length() - 1)
        ns = sorted(ns)
        for i, a in enumerate(ns):
            for b in ns[i + 1:]:
                if (a, b) in und:
                    continue
                n, m = out.get((a, b), (0, 0))
                out[(a, b)] = (n + 1, m + w)
    return {k: (n, m, round(m / 1e6, 6)) for k, (n, m) in out.items()}


def test_adamic_adar_matches_python_reference(spark):
    from surfactant_spark.operators.graphrank import adamic_adar

    # hub h touches everything; a-b share {c, h}; c's degree is 3
    edges = [
        ("a", "c"), ("b", "c"), ("c", "d"),
        ("h", "a"), ("h", "b"), ("h", "c"), ("h", "d"), ("h", "e"),
        ("d", "e"), ("e", "a"),
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        (r.a, r.b): (r.n_common, r.aa_micro, r.aa_score)
        for r in adamic_adar(df).collect()
    }
    want = _py_adamic(edges)
    assert got == want
    # an adjacent pair never appears even when it shares neighbors
    assert ("a", "c") not in got and ("d", "e") not in got
    # a-b's two vias: c (deg 4 -> bitlen 2) and h (deg 5 -> bitlen 2),
    # 500000 micro-units each
    assert got[("a", "b")] == (2, 1_000_000, 1.0)


def test_adamic_adar_wedge_cap_drops_hub(spark):
    from surfactant_spark.operators.graphrank import adamic_adar

    edges = [("h", x) for x in "abcd"] + [("a", "b")]
    df = spark.createDataFrame(edges, "src string, dst string")
    # cap 6 excludes h (deg 4 -> 12 > 6); only a/b (deg 2 -> 2 <= 6)
    # remain as via nodes, and they have no non-adjacent wedges
    got = {(r.a, r.b): r.n_common for r in adamic_adar(df, wedge_cap=6).collect()}
    assert got == _py_adamic(edges, wedge_cap=6) == {}
    full = {
        (r.a, r.b): (r.n_common, r.aa_micro)
        for r in adamic_adar(df).collect()
    }
    assert full == {k: v[:2] for k, v in _py_adamic(edges).items()}
    assert full[("c", "d")] == (1, 500_000)
    with pytest.raises(ValueError):
        adamic_adar(df, wedge_cap=0)


def test_adamic_adar_empty_and_selfloop(spark):
    from surfactant_spark.operators.graphrank import adamic_adar

    df = spark.createDataFrame([("a", "a")], "src string, dst string")
    assert adamic_adar(df).count() == 0


# ---------------------------------------------------------------------------
# exact neighborhood function / effective diameter
# ---------------------------------------------------------------------------
def _py_neighborhood(edges, max_t, p90=0.9):
    """Pure-python reference: all-pairs BFS over the directed simple
    graph, histogram of shortest distances <= max_t, cumulative."""
    from collections import Counter, deque

    adj = {}
    for a, b in edges:
        if a != b and a is not None and b is not None:
            adj.setdefault(a, set()).add(b)
    nodes = set(adj) | {b for s in adj.values() for b in s}
    dist_hist = Counter()
    for s in nodes:
        seen = {s: 0}
        dq = deque([s])
        while dq:
            x = dq.popleft()
            if seen[x] >= max_t:
                continue
            for y in adj.get(x, ()):
                if y not in seen:
                    seen[y] = seen[x] + 1
                    dq.append(y)
        for v, d in seen.items():
            if v != s and d >= 1:
                dist_hist[d] += 1
    total = sum(dist_hist.values())
    out, cum = {}, 0
    for t in sorted(dist_hist):
        cum += dist_hist[t]
        frac = round(cum / total, 6)
        out[t] = (cum, frac, frac >= p90)
    return out


def test_neighborhood_function_hand_path_graph(spark):
    from surfactant_spark.operators.graphrank import neighborhood_function

    # directed path 1->2->3->4->5: N(t) grows one diagonal per radius
    edges = [(i, i + 1) for i in range(1, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.t: (r.n_pairs, r.frac, r.reaches_p90)
        for r in neighborhood_function(df, max_t=6).collect()
    }
    assert got == {
        1: (4, 0.4, False),
        2: (7, 0.7, False),
        3: (9, 0.9, True),
        4: (10, 1.0, True),
    }


def test_neighborhood_function_respects_direction_and_max_t(spark):
    from surfactant_spark.operators.graphrank import neighborhood_function

    # directed cycle of 4: every node reaches the other 3 (12 pairs),
    # but only via forward edges; max_t=2 truncates the radius-3 tail
    edges = [(1, 2), (2, 3), (3, 4), (4, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.t: (r.n_pairs, r.frac)
        for r in neighborhood_function(df, max_t=2).collect()
    }
    assert got == {1: (4, 0.5), 2: (8, 1.0)}
    with pytest.raises(ValueError, match="max_t"):
        neighborhood_function(df, max_t=0)


@settings(max_examples=8, deadline=None)
@given(_edges_st, st.integers(min_value=1, max_value=4))
def test_neighborhood_matches_python_reference(spark, edges, max_t):
    from surfactant_spark.operators.graphrank import neighborhood_function

    simple = {(a, b) for a, b in edges if a != b}
    if not simple:
        return
    df = spark.createDataFrame(sorted(simple), "src long, dst long")
    got = {
        r.t: (r.n_pairs, r.frac, r.reaches_p90)
        for r in neighborhood_function(df, max_t=max_t).collect()
    }
    assert got == _py_neighborhood(simple, max_t)


# ---------------------------------------------------------------------------
# bow-tie decomposition
# ---------------------------------------------------------------------------
def _py_bowtie(edges, max_t=8):
    from collections import deque

    simple = {(a, b) for a, b in edges if a != b}
    nodes = {}
    for a, b in simple:
        nodes[a] = nodes.get(a, 0) + 1
        nodes[b] = nodes.get(b, 0) + 1
    if not nodes:
        return {}
    pivot = min(nodes, key=lambda n: (-nodes[n], n))

    def closure(fwd):
        adj = {}
        for a, b in simple:
            if fwd:
                adj.setdefault(a, set()).add(b)
            else:
                adj.setdefault(b, set()).add(a)
        seen = {pivot: 0}
        dq = deque([pivot])
        while dq:
            x = dq.popleft()
            if seen[x] >= max_t:
                continue
            for y in adj.get(x, ()):
                if y not in seen:
                    seen[y] = seen[x] + 1
                    dq.append(y)
        return set(seen)

    fw, bw = closure(True), closure(False)
    out = {}
    for n in nodes:
        if n in fw and n in bw:
            out[n] = "core"
        elif n in bw:
            out[n] = "in"
        elif n in fw:
            out[n] = "out"
        else:
            out[n] = "disconnected"
    return out


def test_bowtie_hand_graph(spark):
    from surfactant_spark.operators.graphrank import bowtie_structure

    edges = [
        (1, 2), (2, 3), (3, 1),  # core cycle
        (10, 1),                 # IN: reaches the core
        (3, 20),                 # OUT: reached from the core
        (30, 31),                # disconnected island
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.host: (r.region, r.n_region) for r in bowtie_structure(df).collect()}
    assert got[1] == ("core", 3) and got[2] == ("core", 3) and got[3] == ("core", 3)
    assert got[10] == ("in", 1)
    assert got[20] == ("out", 1)
    assert got[30] == ("disconnected", 2) and got[31] == ("disconnected", 2)


@settings(max_examples=8, deadline=None)
@given(_edges_st)
def test_bowtie_matches_python_reference(spark, edges):
    from surfactant_spark.operators.graphrank import bowtie_structure

    simple = {(a, b) for a, b in edges if a != b}
    if not simple:
        return
    df = spark.createDataFrame(sorted(simple), "src long, dst long")
    got = {r.host: r.region for r in bowtie_structure(df).collect()}
    assert got == _py_bowtie(simple)


# ---------------------------------------------------------------------------
# harmonic centrality
# ---------------------------------------------------------------------------
def test_harmonic_centrality_hand_path(spark):
    from surfactant_spark.operators.graphrank import harmonic_centrality

    # path 1->2->3->4: H(4) = 1/3 + 1/2 + 1 = 110/60
    edges = [(1, 2), (2, 3), (3, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.host: (r.n_reaching, r.h_micro60, r.harmonic)
        for r in harmonic_centrality(df).collect()
    }
    assert got[2] == (1, 60, 1.0)
    assert got[3] == (2, 90, 1.5)
    assert got[4] == (3, 110, round(110 / 60, 6))
    assert 1 not in got  # nothing reaches the source
    with pytest.raises(ValueError, match="max_t"):
        harmonic_centrality(df, max_t=7)


@settings(max_examples=8, deadline=None)
@given(_edges_st, st.integers(min_value=1, max_value=4))
def test_harmonic_matches_python_reference(spark, edges, max_t):
    from collections import deque

    from surfactant_spark.operators.graphrank import harmonic_centrality

    simple = {(a, b) for a, b in edges if a != b}
    if not simple:
        return
    df = spark.createDataFrame(sorted(simple), "src long, dst long")
    got = {
        r.host: (r.n_reaching, r.h_micro60)
        for r in harmonic_centrality(df, max_t=max_t).collect()
    }
    adj = {}
    for a, b in simple:
        adj.setdefault(a, set()).add(b)
    nodes = set(adj) | {b for s in adj.values() for b in s}
    want = {}
    for s in nodes:
        seen = {s: 0}
        dq = deque([s])
        while dq:
            x = dq.popleft()
            if seen[x] >= max_t:
                continue
            for y in adj.get(x, ()):
                if y not in seen:
                    seen[y] = seen[x] + 1
                    dq.append(y)
        for v, d in seen.items():
            if v != s:
                n, h = want.get(v, (0, 0))
                want[v] = (n + 1, h + 60 // d)
    assert got == want
