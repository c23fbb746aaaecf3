"""Incremental KG maintenance: fold-equals-full-rebuild under
append-only batches, multi-batch folds, and the no-reshuffle-of-old-
data plan shape.
"""

from pyspark.sql import functions as F

from surfactant_spark.operators.incremental import (
    edges_surface,
    kg_state_build,
    kg_state_fold,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )


def _edge_set(df):
    return {
        (r.subj_id, r.pred, r.obj_id, r.n_evidence, r.sources)
        for r in df.collect()
    }


CORPUS = [
    # batch 0: alpha exports "alpha-lib", beta mentions it
    (0, "s", "alpha-lib alpha-lib provides core-utils"),
    (1, "s", "beta-app uses alpha-lib and core-utils"),
    # batch 1: gamma exports core-utils... no: its top token decides.
    # gamma duplicates doc 0 byte-for-byte (old sha, old canonical);
    # delta introduces a NEW exporter token that doc 1 already mentions
    (2, "s", "alpha-lib alpha-lib provides core-utils"),
    (3, "s", "core-utils core-utils from gamma-pkg"),
    # batch 2: another new doc mentioning everything
    (4, "s", "delta-tool uses alpha-lib core-utils gamma-pkg"),
]


def _full(spark, rows):
    return edges_surface(kg_state_build(_docs(spark, rows)))


def test_single_fold_equals_full_rebuild(spark):
    old = [r for r in CORPUS if r[0] < 2]
    new = [r for r in CORPUS if 2 <= r[0] < 4]
    state = kg_state_build(_docs(spark, old))
    folded = edges_surface(kg_state_fold(state, _docs(spark, new)))
    assert _edge_set(folded) == _edge_set(_full(spark, old + new))


def test_new_exporter_token_reaches_old_mentions(spark):
    """Doc 3 makes 'core-utils' an exported token; docs 0/1 mentioned it
    before any exporter existed. The fold must emit those OLD-mention
    edges via the broadcast probe of added tokens."""
    old = [r for r in CORPUS if r[0] < 2]
    new = [r for r in CORPUS if 2 <= r[0] < 4]
    state = kg_state_build(_docs(spark, old))
    before = _edge_set(edges_surface(state))
    folded = kg_state_fold(state, _docs(spark, new))
    after = _edge_set(edges_surface(folded))
    core_exporter = {e for e in after if e not in before}
    # doc 1 (beta) must now link to doc 3's canonical via core-utils
    assert any(s == 1 and o == 3 for (s, _, o, _, _) in core_exporter)


def test_multi_batch_folds(spark):
    state = kg_state_build(_docs(spark, CORPUS[:2]))
    state = kg_state_fold(state, _docs(spark, CORPUS[2:4]))
    state = kg_state_fold(state, _docs(spark, CORPUS[4:]))
    assert _edge_set(edges_surface(state)) == _edge_set(_full(spark, CORPUS))


def test_duplicate_sha_keeps_old_canonical(spark):
    """Doc 2 is byte-identical to doc 0: its mentions must carry doc 0's
    canonical id, and the canon table must not gain a new row."""
    state = kg_state_build(_docs(spark, CORPUS[:2]))
    folded = kg_state_fold(state, _docs(spark, CORPUS[2:4]))
    canon = {r.sha: r.canonical_id for r in folded.canon.collect()}
    assert len(canon) == 3  # docs 0/2 share one sha
    assert 2 not in canon.values()


def test_fold_plan_shape(spark):
    """The old-mention probe must be a broadcast join of the added
    exporter tokens (standing data never shuffles for the probe), and
    the fold plan stays BNLJ/cartesian/PythonUDF-free."""
    state = kg_state_build(_docs(spark, CORPUS[:2]))
    folded = edges_surface(kg_state_fold(state, _docs(spark, CORPUS[2:4])))
    plan = folded._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "PythonUDF" not in plan


def test_query_entry_matches_kg_edges(spark):
    """q_kg_incremental over the driver corpus must equal q_kg_edges
    row-for-row (the oracle identity, asserted engine-side too)."""
    from surfactant_spark.queries import q_kg_edges, q_kg_incremental
    from tests.conftest import SF_DIR

    inc = _edge_set(q_kg_incremental(spark, SF_DIR))
    full = _edge_set(q_kg_edges(spark, SF_DIR))
    assert inc == full


def _hot_edge_corpus():
    """Doc 0 exports 'tgt-lib'; docs 1..6 are byte-identical probes, so
    they collapse to ONE canonical subject whose edge to doc 0 carries
    six distinct evidence urls — a miniature hot edge."""
    return [(0, "s", "tgt-lib tgt-lib")] + [
        (i, "s", "probe-app uses tgt-lib") for i in range(1, 7)
    ]


def test_evidence_cap_binds_exact_count(spark):
    """With a cap below the edge's url count, n_evidence stays EXACT
    while sources keeps only the lexicographically-first cap urls."""
    state = kg_state_build(_docs(spark, _hot_edge_corpus()), evidence_cap=3)
    row = [r for r in edges_surface(state).collect() if r.subj_id == 1][0]
    assert row.obj_id == 0
    assert row.n_evidence == 6
    assert row.sources == "s/1|s/2|s/3"


def test_evidence_cap_fold_equals_rebuild(spark):
    """The capped evidence state merges losslessly across folds: the
    partials' (subj, obj, url) contributions are disjoint under the
    append-only invariant, so counts add and the capped arrays
    reconstruct the global first-N."""
    rows = _hot_edge_corpus()
    state = kg_state_build(_docs(spark, rows[:4]), evidence_cap=3)
    folded = kg_state_fold(state, _docs(spark, rows[4:]), evidence_cap=3)
    full = kg_state_build(_docs(spark, rows), evidence_cap=3)
    assert _edge_set(edges_surface(folded)) == _edge_set(edges_surface(full))


def test_evidence_cap_query_oracle_parity(spark):
    """q_kg_edges with a binding cap must equal the capped DuckDB oracle
    on a corpus where one edge exceeds the cap."""
    import duckdb
    import pandas as pd

    from surfactant_spark import queries as Q

    rows = _hot_edge_corpus()
    pdf = pd.DataFrame(rows, columns=["doc_id", "source", "text"])
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(pdf).write.parquet(os.path.join(d, "documents.parquet"))
        got = {
            (r.subj_id, r.pred, r.obj_id, r.n_evidence, r.sources)
            for r in Q.q_kg_edges(spark, d, evidence_cap=3).collect()
        }
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet/*.parquet')"
        )
        sql = Q.SQL_KG_EDGES.replace(f", {Q.EVIDENCE_CAP})", ", 3)")
        want = {tuple(t) for t in con.execute(sql).fetchall()}
    assert got == want
    assert any(n == 6 and len(s.split("|")) == 3 for (_, _, _, n, s) in got)


from hypothesis import given, settings, strategies as st

_TOKS = ["alpha-lib", "beta-app", "core-utils", "gamma-pkg",
         "delta-tool", "uses", "provides", "from"]


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(_TOKS), min_size=1, max_size=6),
        min_size=1,
        max_size=8,
    ),
    st.integers(min_value=0, max_value=8),
)
def test_fold_equals_rebuild_any_split(spark, texts, k):
    """Property: for ANY corpus and ANY append-only split point
    (including empty first or second batch), folding the tail into the
    head's state equals the full rebuild."""
    rows = [(i, "s", " ".join(t)) for i, t in enumerate(texts)]
    k = min(k, len(rows))
    state = kg_state_build(_docs(spark, rows[:k]))
    folded = kg_state_fold(state, _docs(spark, rows[k:]))
    assert _edge_set(edges_surface(folded)) == _edge_set(_full(spark, rows))


def test_snapshot_diff_classifies_all_three_ops(spark):
    """added = key only in new; removed = only in old; changed = both
    present with any compare column differing; identical keys drop."""
    from surfactant_spark.operators.incremental import snapshot_diff

    old = spark.createDataFrame(
        [("a", 1, "x"), ("b", 2, "y"), ("c", 3, "z")], "k string, n long, s string"
    )
    new = spark.createDataFrame(
        [("b", 2, "y"), ("c", 9, "z"), ("d", 4, "w")], "k string, n long, s string"
    )
    rows = {
        r.k: r for r in snapshot_diff(old, new, ("k",), ("n", "s")).collect()
    }
    assert set(rows) == {"a", "c", "d"}  # b unchanged -> dropped
    assert rows["a"].op == "removed" and rows["a"].old_n == 1 and rows["a"].new_n is None
    assert rows["d"].op == "added" and rows["d"].old_n is None and rows["d"].new_n == 4
    assert rows["c"].op == "changed" and (rows["c"].old_n, rows["c"].new_n) == (3, 9)


def test_snapshot_diff_plan_is_one_equi_join(spark):
    from surfactant_spark.operators.incremental import snapshot_diff

    old = spark.createDataFrame([("a", 1)], "k string, n long")
    new = spark.createDataFrame([("a", 2)], "k string, n long")
    df = snapshot_diff(old, new, ("k",), ("n",))
    plan = df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
