"""Sinks/sources: CSV/JSON/SPDX/CycloneDX export projections and the
CyTRICS JSON round-trip (S6-S10), hash-collision audit (A5), plus a
hypothesis property test for connected components."""

import json
import os

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F


def _nodes(spark):
    import datetime

    ts = datetime.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [
            ("c1", "s1", ["libfoo"], ["https://a/1", "https://b/1"], 2, ts),
            ("c2", "s2", ["other"], ["https://c/2"], 1, ts),
        ],
        "canon_uuid string, sha256 string, names array<string>, "
        "aliases array<string>, n_sources long, first_seen timestamp",
    )


def _edges(spark):
    return spark.createDataFrame(
        [("c1", "Uses", "c2", 1, ["https://a/1"]), ("c1", "Contains", "c2", 1, ["https://a/1"])],
        "subj_uuid string, pred string, obj_uuid string, n_evidence long, sources array<string>",
    )


def test_csv_export_explodes_paths(spark):
    from surfactant_spark.sources.writers import csv_export

    rows = csv_export(_nodes(spark)).collect()
    # one output row per (node, alias path) — `output/csv_writer.py:55-74`
    assert len(rows) == 3
    assert {r.path for r in rows} == {"https://a/1", "https://b/1", "https://c/2"}


def test_spdx_and_cyclonedx_projections(spark):
    from surfactant_spark.sources.writers import cyclonedx_like_export, spdx_like_export

    spdx = {(r.spdxElementId, r.relationshipType, r.relatedSpdxElement)
            for r in spdx_like_export(_nodes(spark), _edges(spark)).collect()}
    assert ("SPDXRef-c1", "DEPENDS_ON", "SPDXRef-c2") in spdx
    assert ("SPDXRef-c1", "CONTAINS", "SPDXRef-c2") in spdx

    comps, deps = cyclonedx_like_export(_nodes(spark), _edges(spark))
    assert {r.bom_ref for r in comps.collect()} == {"ref-c1", "ref-c2"}
    assert {(r.ref, r.dependsOn) for r in deps.collect()} == {("ref-c1", "ref-c2")}


def test_cytrics_json_round_trip(spark, tmp_path):
    from surfactant_spark.sources.readers import read_cytrics_json
    from surfactant_spark.sources.writers import json_export

    node_docs, edge_docs = json_export(_nodes(spark), _edges(spark))
    node_docs.select(F.col("json")).write.text(str(tmp_path / "nodes"))
    edge_docs.select(F.col("json")).write.text(str(tmp_path / "edges"))
    nodes2, edges2 = read_cytrics_json(spark, str(tmp_path))
    assert {r.canon_uuid for r in nodes2.collect()} == {"c1", "c2"}
    got = {(r.subj_uuid, r.pred, r.obj_uuid) for r in edges2.collect()}
    assert got == {("c1", "Uses", "c2"), ("c1", "Contains", "c2")}


def test_hash_collision_audit(spark):
    from surfactant_spark.operators.identity import hash_collision_audit

    df = spark.createDataFrame(
        [("h1", 10, "m1"), ("h1", 20, "m1"), ("h2", 5, "m2"), ("h2", 5, "m2")],
        "sha256 string, size long, md5 string",
    )
    flagged = {r.sha256 for r in hash_collision_audit(df).collect()}
    assert flagged == {"h1"}  # same sha, different size -> suspicious


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)),
        min_size=0,
        max_size=25,
    )
)
def test_cc_matches_union_find_property(spark, edge_ids):
    """connected_components_auto == a plain union-find, for arbitrary
    small graphs (cycles, self-loops, duplicates included)."""
    from surfactant_spark.operators.canon import connected_components_auto

    edges = [(f"n{a}", f"n{b}") for a, b in edge_ids]
    if not edges:
        return
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.id: r.component for r in connected_components_auto(df).collect()}

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        if a == b:
            continue
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    want = {x: find(x) for x in parent}
    assert got == want
