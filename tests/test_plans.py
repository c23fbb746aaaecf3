"""Physical-plan assertions: the optimizations SURVEY §4 promises must
actually appear in `.explain` output — filter pushdown into the scan,
column pruning, broadcast joins for dimensions, whole-stage codegen in
the JVM paths, and no Python row-at-a-time UDFs anywhere."""

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_filter_pushdown_reaches_parquet_scan(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _plan(docs.where(F.col("lang") == "en").select("doc_id"))
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]" in plan


def test_column_pruning_reads_only_projected(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    plan = _plan(li.select("l_orderkey", "l_quantity"))
    # ReadSchema must not include unprojected columns
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert "l_comment" not in read_schema and "l_extendedprice" not in read_schema


def test_broadcast_join_for_dimension(spark):
    from surfactant_spark.queries import q_region_nations

    plan = _plan(q_region_nations(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan


def test_kg_edges_uses_broadcast_not_shuffle_for_dictionaries(spark):
    from surfactant_spark.queries import q_kg_edges

    plan = _plan(q_kg_edges(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan


def test_pricing_summary_partial_agg_and_pushdown(spark):
    """Filter pushed to the scan; partial (map-side) aggregation before
    the exchange — one shuffle of pre-combined groups, not raw rows.
    (Codegen spans only render in executed plans, not the pre-AQE
    formatted plan, so WholeStageCodegen itself is not asserted.)"""
    from surfactant_spark.queries import q_pricing_summary

    plan = _plan(q_pricing_summary(spark, SF_DIR))
    assert "partial_sum" in plan  # map-side combine
    assert plan.index("HashAggregate") < plan.index("Exchange") or "partial_sum" in plan
    assert "PushedFilters" in plan and "LessThanOrEqual(l_shipdate" in plan


def test_extract_ships_only_needed_columns(spark, spark_pages):
    from surfactant_spark.operators.extract import extract_pages

    plan = _plan(extract_pages(spark_pages))
    # the Arrow stage must not carry text/lang through the Python worker
    assert "MapInPandas" in plan or "mapInPandas" in plan.lower()


def test_no_plain_python_udf_in_query_surface(spark):
    """Every queries() plan must be free of row-at-a-time PythonUDF
    (BatchEvalPython); only Arrow-batched (ArrowEvalPython / MapInPandas)
    or pure-JVM operators are allowed (input_hint: no per-row Python)."""
    from surfactant_spark.queries import QUERIES

    for name, fn in QUERIES.items():
        plan = _plan(fn(spark, SF_DIR))
        assert "BatchEvalPython" not in plan, f"{name} uses row-at-a-time Python"


def test_pattern_mentions_broadcast_dim_and_pruned_scan(spark):
    """The regex pattern dimension must broadcast (S11 shape), the
    documents scan must ship only (doc_id, text), and the cheap
    literal-prefix prefilter must gate the corpus BEFORE the
    per-pattern regex join (one union-of-prefixes rlike pass)."""
    from surfactant_spark.queries import q_pattern_mentions

    plan = _plan(q_pattern_mentions(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "text" in read_schema and "n_chars" not in read_schema
    # the union-of-literal-prefixes predicate sits in a Filter node
    assert "agg\\ |fast\\ |hash\\ " in plan.replace("\\\\", "\\") or "agg |fast |hash " in plan


def test_classify_magic_is_pure_jvm(spark):
    """The full ~30-type classifier chain must not leave the JVM."""
    from surfactant_spark.queries import q_classify_magic

    plan = _plan(q_classify_magic(spark, SF_DIR))
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan


def test_link_java_broadcasts_export_dictionary(spark):
    from surfactant_spark.queries import q_link_java

    plan = _plan(q_link_java(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan


def test_anti_join_plan(spark):
    from surfactant_spark.queries import q_customers_no_orders

    plan = _plan(q_customers_no_orders(spark, SF_DIR))
    assert "LeftAnti" in plan


def test_merge_software_plan_no_nested_loop(spark):
    """J6 match-pair generation must plan as equi-joins (union of
    per-hash joins), never BroadcastNestedLoopJoin/CartesianProduct —
    the OR-of-equalities form has no hashable key and went O(n*m)."""
    from surfactant_spark.operators.canon import merge_software

    schema = "uuid string, sha256 string, md5 string, sha1 string, name string"
    base = spark.createDataFrame([("u1", "h1", None, None, "a")], schema)
    inc = spark.createDataFrame(
        [("u9", "h1", None, None, "b"), ("u1", None, None, None, "c")], schema
    )
    merged, umap = merge_software(base, inc)
    for df in (merged, umap):
        plan = _plan(df)
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan


def test_container_path_rewrite_no_single_row_map(spark):
    """F9/U2 containerPath rewrite must not funnel the uuid_map through
    one map_from_entries row (2 GB row-limit hazard); explode+join only."""
    from surfactant_spark.operators.canon import rewrite_container_paths

    sw = spark.createDataFrame(
        [("u1", ["x/f"]), ("u2", None)], "uuid string, containerPath array<string>"
    )
    m = spark.createDataFrame([("x", "y")], "old_uuid string, new_uuid string")
    plan = _plan(rewrite_container_paths(sw, m))
    assert "map_from_entries" not in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_round3_queries_plan_shapes(spark):
    """The round-3 oracle queries must keep distributed-safe plans:
    no nested-loop/cartesian anywhere; the redirect fixpoint is a chain
    of hash joins. install_rewrite's uuid map is NOT force-broadcast
    (round-3 verdict item 2): a web-scale collision map must be able to
    degrade to a shuffle join, so any hash-partitionable equi-join
    strategy is acceptable — only BNLJ/Cartesian are forbidden."""
    from surfactant_spark.queries import (
        q_alias_attach,
        q_graph_roots,
        q_install_rewrite,
        q_redirect_resolve,
        q_sbom_roundtrip,
        q_spdx_files,
    )

    for q in (
        q_redirect_resolve,
        q_alias_attach,
        q_install_rewrite,
        q_spdx_files,
        q_sbom_roundtrip,
        q_graph_roots,
    ):
        plan = _plan(q(spark, SF_DIR))
        assert "BroadcastNestedLoopJoin" not in plan, q.__name__
        assert "CartesianProduct" not in plan, q.__name__
    # either BroadcastHashJoin (AQE chose broadcast) or a shuffle
    # equi-join (SortMergeJoin/ShuffledHashJoin) is fine for the uuid map
    rw_plan = _plan(q_install_rewrite(spark, SF_DIR))
    assert any(
        j in rw_plan for j in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin")
    )


def test_round4_queries_plan_shapes(spark):
    """The round-4 oracle queries (CSV export, CycloneDX export,
    normpath, Mach-O/OLE decode) keep distributed-safe plans: no
    nested-loop/cartesian, no row-at-a-time PythonUDF (normpath runs
    Arrow-batched scalar UDFs; the byte-level decoders run as
    MapInPandas passes)."""
    from surfactant_spark.queries import (
        q_csv_export,
        q_cyclonedx,
        q_macho_decode,
        q_normpath,
        q_ole_decode,
    )

    for q in (q_csv_export, q_cyclonedx, q_normpath, q_macho_decode, q_ole_decode):
        plan = _plan(q(spark, SF_DIR))
        assert "BroadcastNestedLoopJoin" not in plan, q.__name__
        assert "CartesianProduct" not in plan, q.__name__
        assert "BatchEvalPython" not in plan, q.__name__  # row-at-a-time UDF
    assert "ArrowEvalPython" in _plan(q_normpath(spark, SF_DIR))
    assert "MapInPandas" in _plan(q_macho_decode(spark, SF_DIR))


def test_spread_partitions_widens_single_split_input(spark):
    """A corpus that fits one scan split must not run compute-amplified
    work (shingle hashing, pair joins, cosine scans) on a single task:
    spread_partitions raises it to session parallelism, and is a no-op
    on an input that is already wide."""
    from surfactant_spark.session import spread_partitions

    par = spark.sparkContext.defaultParallelism
    one = spark.range(1000).coalesce(1)
    assert one.rdd.getNumPartitions() == 1
    assert spread_partitions(one).rdd.getNumPartitions() == 2 * par
    wide = spark.range(1000).repartition(4 * par)
    # already wider than target -> untouched (no shrink at real scale)
    assert spread_partitions(wide) is wide
    # GlobalLimit executes as ONE partition and its output is small by
    # construction -> spread unconditionally (no .rdd probe, which with
    # AQE would materialize upstream stages just to read a count)
    limited = spark.range(1000).limit(100)
    assert spread_partitions(limited).rdd.getNumPartitions() == 2 * par
    # explicit repartition(n) is a caller decision -> respected BY
    # CONTRACT even when narrow (see spread_partitions docstring)
    narrow = spark.range(1000).repartition(2)
    assert spread_partitions(narrow) is narrow


def test_ngram_pair_join_runs_spread_not_single_task(spark):
    """The ngram family's checkpointed shingle table must be spread:
    the md5 shingle pass and the pair join's streamed side then run at
    session parallelism instead of inheriting a single scan split (a
    broadcast join adds no exchange that could re-spread it). The final
    OUTPUT partition count is deliberately not asserted — AQE coalescing
    a tiny shuffle to 1 read-partition is correct and says nothing about
    where the compute ran."""
    from surfactant_spark.operators.dedup import dedup_ngram_jaccard, shingle_table
    from surfactant_spark.session import spread_partitions

    docs = spark.createDataFrame(
        [(i, f"w{i % 7} common text tokens for block {i % 3} pad pad", f"b{i % 3}")
         for i in range(60)],
        "doc_id long, text string, source string",
    ).coalesce(1)
    par = spark.sparkContext.defaultParallelism
    sh = shingle_table(
        spread_partitions(docs, "source"), block_col="source", hashed=True
    ).localCheckpoint(eager=True)
    assert sh.rdd.getNumPartitions() == 2 * par
    out = dedup_ngram_jaccard(docs, threshold=0.1, block_col="source")
    plan = _plan(out)
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert out.count() > 0


def test_graph_analytics_plan_shapes(spark):
    """The round-4 additions (entity_rank's checkpointed iterative
    joins, dedup_clusters' pairs->CC->election chain, the span
    detectors' window-hash joins, the repetition aggregations) stay
    distributed-safe: equi joins only, no nested-loop/cartesian, no
    Python anywhere in any final plan."""
    from surfactant_spark.queries import (
        q_contamination,
        q_dedup_clusters,
        q_doc_repetition,
        q_dup_spans,
        q_entity_rank,
    )

    for q in (
        q_entity_rank,
        q_dedup_clusters,
        q_dup_spans,
        q_contamination,
        q_doc_repetition,
    ):
        plan = _plan(q(spark, SF_DIR))
        assert "BroadcastNestedLoopJoin" not in plan, q.__name__
        assert "CartesianProduct" not in plan, q.__name__
        assert "BatchEvalPython" not in plan, q.__name__


def test_late_round4_queries_plan_shapes(spark):
    """The late round-4 additions (incremental fold, host PageRank,
    count-min sketch, exact quantiles) stay distributed-safe: equi
    joins only, no nested-loop/cartesian, no Python in any final plan
    (the quantiles' per-q selection is a filter, never a range join)."""
    from surfactant_spark.queries import (
        q_host_components,
        q_host_rank,
        q_kg_edge_split,
        q_kg_incremental,
        q_kg_negatives,
        q_lang_quantiles,
        q_length_quantiles,
        q_token_cms,
    )

    for q in (
        q_kg_incremental,
        q_host_rank,
        q_host_components,
        q_token_cms,
        q_length_quantiles,
        q_lang_quantiles,
        q_kg_negatives,
        q_kg_edge_split,
    ):
        plan = _plan(q(spark, SF_DIR))
        assert "BroadcastNestedLoopJoin" not in plan, q.__name__
        assert "CartesianProduct" not in plan, q.__name__
        assert "BatchEvalPython" not in plan, q.__name__


def test_token_hll_plan_shape(spark):
    """token_hll is two hash aggregations over one scan: no join at
    all, no Python, and exactly two exchanges (tok->registers,
    registers->per-lang estimate) — the no-distinct-key-shuffle claim
    that justifies HLL over COUNT(DISTINCT) at corpus scale."""
    from surfactant_spark.queries import q_token_hll

    import re

    plan = _plan(q_token_hll(spark, SF_DIR))
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan
    # formatted mode lists each node once in the tree and once in the
    # numbered detail section; count the detail entries
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 2


def test_round5_late_queries_plan_shapes(spark):
    """event_asof (union+window asof), kg_khop (frontier BFS): equi
    joins / window only — no nested-loop, no cartesian, no Python.
    host_hits is guarded separately: its per-round rescale is a 1-ROW
    broadcast cross join (the agg frame), which Spark plans as
    BroadcastNestedLoopJoin — deliberate and O(n) (the alternative, a
    global unpartitioned window, would funnel every row through one
    task); everything else in its plan must stay clean."""
    from surfactant_spark.queries import (
        q_event_asof,
        q_host_hits,
        q_host_triangles,
        q_kg_khop,
    )

    from surfactant_spark.queries import (
        q_collocations,
        q_corpus_pack,
        q_crawl_frontier,
        q_event_funnel,
    )

    from surfactant_spark.queries import q_host_adamic

    for q in (q_event_asof, q_kg_khop, q_host_triangles, q_event_funnel,
              q_crawl_frontier, q_corpus_pack, q_host_adamic):
        plan = _plan(q(spark, SF_DIR))
        assert "BroadcastNestedLoopJoin" not in plan, q.__name__
        assert "CartesianProduct" not in plan, q.__name__
        assert "BatchEvalPython" not in plan, q.__name__

    # host_hits / collocations / domain_mixture: the 1-row corpus-total
    # (or rescale factor) broadcast cross join is the deliberate
    # exception
    from surfactant_spark.queries import q_domain_mixture, q_zipf_spectrum

    for q in (q_host_hits, q_collocations, q_domain_mixture, q_zipf_spectrum):
        plan = _plan(q(spark, SF_DIR))
        assert "CartesianProduct" not in plan, q.__name__
        assert "BatchEvalPython" not in plan, q.__name__


def test_round5_index_cohort_cocite_plan_shapes(spark):
    """The round-5 additions stay distributed-safe. tfidf_terms is the
    collocations-style exception: its corpus doc count rides in as a
    1-ROW broadcast cross join (planned as BroadcastNestedLoopJoin,
    deliberate and O(n)); everything else in every plan must be equi
    joins with no Python."""
    from surfactant_spark.queries import (
        q_cohort_retention,
        q_host_cocitation,
        q_inverted_index,
        q_tfidf_terms,
    )

    for q in (q_inverted_index, q_cohort_retention, q_host_cocitation):
        plan = _plan(q(spark, SF_DIR))
        assert "BroadcastNestedLoopJoin" not in plan, q.__name__
        assert "CartesianProduct" not in plan, q.__name__
        assert "BatchEvalPython" not in plan, q.__name__

    plan = _plan(q_tfidf_terms(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_embedding_quant_plan_is_scan_rooted_no_shuffle(spark):
    """Quantization is ONE narrow JVM projection on the embeddings
    scan: no Exchange, no Python of any kind, no join — the shape that
    makes it free to fuse into any export or ANN-build pass."""
    from surfactant_spark.queries import q_embedding_quant

    df = q_embedding_quant(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Join" not in plan


def test_boilerplate_and_oov_plan_shapes(spark):
    """host_boilerplate's host-pages join and val_oov's vocab-membership
    join are both equi joins (host-dimension / type-cardinality); all
    shingling is row-local — no nested-loop, no cartesian, no Python."""
    from surfactant_spark.queries import q_host_boilerplate, q_val_oov

    for q in (q_host_boilerplate, q_val_oov):
        plan = _plan(q(spark, SF_DIR))
        assert "BroadcastNestedLoopJoin" not in plan, q.__name__
        assert "CartesianProduct" not in plan, q.__name__
        assert "BatchEvalPython" not in plan, q.__name__


def test_kcore_plan_shape(spark):
    """Every peel round's surviving-edge frame is built from equi
    (semi-style) joins against the host-dimension keep set — no
    nested-loop, no cartesian, no Python. Asserted on one unrolled
    round over the gate fixture's host graph."""
    from surfactant_spark.operators.graphrank import kcore
    from surfactant_spark.operators.webgraph import host_graph
    from surfactant_spark.queries import _read_web_pages

    edges = host_graph(_read_web_pages(spark)).select(
        F.col("src_host").alias("src"), F.col("dst_host").alias("dst")
    )
    plan = _plan(kcore(edges, k=3, max_rounds=1))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_bpe_plan_shape(spark):
    """The corpus-touching stage of BPE training (vocab build) and the
    per-step pair-count agg are pure JVM aggregations: no joins of any
    kind, no Python. The per-step top-1 is a limit-1 take over the
    pair table (dimension-sized), the pagerank driver-dispatch
    precedent."""
    from surfactant_spark.operators.textops import bpe_pair_counts, bpe_vocab

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    for frame in (bpe_vocab(docs), bpe_pair_counts(bpe_vocab(docs))):
        plan = _plan(frame)
        assert "Join" not in plan
        assert "BatchEvalPython" not in plan


def test_kmeans_plan_shape(spark):
    """kmeans_clusters joins the corpus against a K-ROW broadcast
    centroid table with no equi key (the host_hits-style deliberate
    1-dim broadcast cross join, planned as BroadcastNestedLoopJoin and
    O(n*k)); no cartesian product, no Python anywhere."""
    from surfactant_spark.queries import q_kmeans_clusters

    plan = _plan(q_kmeans_clusters(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_semdedup_plan_shape(spark):
    """semdedup materializes the kmeans assignment ONCE (eager
    localCheckpoint — the assign subplan must not be recomputed per
    consumer branch), so its visible plan holds no centroid BNLJ at
    all; the pair scan MUST be an equi join keyed on cluster — any
    nested-loop or cartesian means the quadratic pair work escaped the
    cluster blocking. No Python anywhere."""
    from surfactant_spark.queries import q_semdedup

    plan = _plan(q_semdedup(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_line_dedup_and_redact_pii_plan_shapes(spark):
    """line_dedup: one combinable (line -> count+min-struct) agg, an
    equi join back on the line key, one per-url reconstruction agg —
    no nested-loop, no cartesian, no Python. redact_pii: a single
    JVM projection on the scan — no Exchange at all."""
    from surfactant_spark.queries import q_line_dedup, q_redact_pii

    plan = _plan(q_line_dedup(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    plan = _plan(q_redact_pii(spark, SF_DIR))
    assert "Exchange" not in plan, "redact_pii must stay shuffle-free"
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_url_bloom_plan_shape(spark):
    """Bloom build is one explode + one combinable bit_or agg; the
    probe joins the at-most-32-row words table (AQE broadcasts) — no
    nested-loop, no cartesian, no Python anywhere."""
    from surfactant_spark.queries import q_url_bloom

    plan = _plan(q_url_bloom(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_graph_communities_plan_shape(spark):
    """Each LPA round is one equi join + a two-level combinable agg —
    no window sort per node, no nested-loop, no cartesian, no Python."""
    from surfactant_spark.queries import q_graph_communities

    plan = _plan(q_graph_communities(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_community_modularity_plan_shape(spark):
    from surfactant_spark.queries import q_community_modularity

    plan = _plan(q_community_modularity(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_alias_promotion_plan_shape(spark):
    """Two stacked combinable aggs (pair counts -> min_by top), no
    per-target sort window, no nested-loop, no Python."""
    from surfactant_spark.queries import q_alias_promotion

    plan = _plan(q_alias_promotion(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_host_intervals_plan_shape(spark):
    """One per-host lag window, histogram-shaped median, combinable
    stats agg — no nested-loop, no cartesian, no Python."""
    from surfactant_spark.queries import q_host_intervals

    plan = _plan(q_host_intervals(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_walk_family_plan_shapes(spark):
    """The walk corpus (iterative hash-argmin steps), its skip-gram
    self-join, and the host language profile stay distributed-safe:
    equi joins only, no nested-loop/cartesian, no Python in any final
    plan (the walk step's min_by is a partial-aggregable hash agg, not
    a window sort)."""
    from surfactant_spark.queries import (
        q_graph_walks,
        q_host_dup_rates,
        q_host_language_mix,
        q_kg_twohop,
        q_page_markup_stats,
        q_skipgram_pairs,
        q_url_templates,
        q_vocab_coverage,
    )

    from surfactant_spark.queries import (
        q_dedup_incremental,
        q_domain_graph,
        q_domain_metrics,
        q_entity_skipgrams,
        q_entity_walks,
        q_host_quality,
        q_host_rank_delta,
        q_term_contexts,
    )

    for q in (
        q_graph_walks,
        q_skipgram_pairs,
        q_host_language_mix,
        q_url_templates,
        q_kg_twohop,
        q_host_dup_rates,
        q_page_markup_stats,
        q_vocab_coverage,
        q_domain_graph,
        q_domain_metrics,
        q_host_rank_delta,
        q_term_contexts,
        q_entity_walks,
        q_entity_skipgrams,
        q_dedup_incremental,
        q_host_quality,
    ):
        plan = _plan(q(spark, SF_DIR))
        assert "BroadcastNestedLoopJoin" not in plan, q.__name__
        assert "CartesianProduct" not in plan, q.__name__
        assert "BatchEvalPython" not in plan, q.__name__


def test_lm_containment_bursts_plan_shapes(spark):
    """lm_score's vocabulary totals ride a deliberate 1-ROW broadcast
    cross join (the host_hits/collocations exception — the alternative
    is a global window through one task); everything else, and the
    whole containment / entity_bursts plans, must stay equi-join-only
    with no Python."""
    from surfactant_spark.queries import (
        q_containment,
        q_entity_bursts,
        q_lm_score,
    )

    for q in (q_containment, q_entity_bursts):
        plan = _plan(q(spark, SF_DIR))
        assert "BroadcastNestedLoopJoin" not in plan, q.__name__
        assert "CartesianProduct" not in plan, q.__name__
        assert "BatchEvalPython" not in plan, q.__name__

    plan = _plan(q_lm_score(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_rollup_and_pivot_plan_and_lattice(spark):
    """revenue_rollup must plan the whole subtotal lattice as ONE
    Expand + hash aggregate over a single fact scan (never one scan
    per level), with the dimension joins broadcast; the collected
    lattice must be internally consistent (details sum to subtotals
    sum to the grand total). lang_pivot must stay a single hash
    aggregate with no distinct-values collect job."""
    from surfactant_spark.queries import q_lang_pivot, q_revenue_rollup

    df = q_revenue_rollup(spark, SF_DIR)
    plan = _plan(df)
    assert "Expand" in plan
    import re as _re

    # orders + 3 dims, each scanned ONCE (formatted explain prints one
    # "(n) Scan parquet" details block per physical scan node)
    assert len(_re.findall(r"^\(\d+\) Scan parquet", plan, _re.M)) == 4
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan

    rows = df.collect()
    details = [r for r in rows if r.gid == 0]
    subtotals = {r.r_name: r for r in rows if r.gid == 1}
    grand = [r for r in rows if r.gid == 3]
    assert len(grand) == 1
    assert grand[0].n_orders == sum(r.n_orders for r in details) > 0
    assert grand[0].revenue == round(sum(r.revenue for r in details), 2)
    for region, sub in subtotals.items():
        mine = [r for r in details if r.r_name == region]
        assert sub.n_orders == sum(r.n_orders for r in mine)

    pv = q_lang_pivot(spark, SF_DIR)
    plan = _plan(pv)
    assert "BatchEvalPython" not in plan
    assert "Expand" not in plan  # explicit value list: plain pivot agg
    one = pv.collect()
    total = sum(sum(r[c] for c in pv.columns if c != "source") for r in one)
    from surfactant_spark.queries import _read

    assert total == _read(spark, SF_DIR, "documents").count()


def test_lang_unpivot_round_trip(spark):
    """unpivot must be a single Expand (no join, no Python) and the
    melted rows must reproduce the pivot matrix cell-for-cell,
    including zero cells a plain groupBy would drop."""
    from surfactant_spark.queries import PIVOT_LANGS, q_lang_pivot, q_lang_unpivot

    df = q_lang_unpivot(spark, SF_DIR)
    plan = _plan(df)
    assert "Expand" in plan
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan

    wide = {r.source: r for r in q_lang_pivot(spark, SF_DIR).collect()}
    long_rows = df.collect()
    assert len(long_rows) == len(wide) * len(PIVOT_LANGS)
    for r in long_rows:
        assert wide[r.source][f"n_{r.lang}"] == r.n_docs


def test_corpus_cube_plan_and_lattice(spark):
    """corpus_cube must plan the full source×lang lattice as ONE
    Expand + hash aggregate over a single corpus scan; the four
    grouping levels must be internally consistent (details sum to
    both marginals and to the grand total)."""
    import re as _re

    from surfactant_spark.queries import q_corpus_cube

    df = q_corpus_cube(spark, SF_DIR)
    plan = _plan(df)
    assert "Expand" in plan
    assert len(_re.findall(r"^\(\d+\) Scan parquet", plan, _re.M)) == 1
    assert "BatchEvalPython" not in plan

    rows = df.collect()
    det = [r for r in rows if r.gid == 0]
    by_src = {r.source: r for r in rows if r.gid == 1}
    by_lang = {r.lang: r for r in rows if r.gid == 2}
    grand = [r for r in rows if r.gid == 3]
    assert len(grand) == 1
    for axis, margin in (("source", by_src), ("lang", by_lang)):
        for key, m in margin.items():
            mine = [r for r in det if getattr(r, axis) == key]
            assert m.n_docs == sum(r.n_docs for r in mine), (axis, key)
            assert m.n_tokens == sum(r.n_tokens for r in mine), (axis, key)
    assert grand[0].n_docs == sum(r.n_docs for r in det) > 0
    assert grand[0].n_tokens == sum(r.n_tokens for r in det)
