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
