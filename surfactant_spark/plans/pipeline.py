"""Stage-materializing pipeline runner with snapshot resume + lineage.

The reference restarts from scratch on failure (SURVEY §4); here every
stage's output is a parquet snapshot under the work dir with a
``_STAGE_OK`` marker, and :func:`run_pipeline` skips any stage whose
snapshot already exists — kill it anywhere and rerun with the same
work dir to resume (the Iceberg-snapshot pattern of the north rule,
expressed over plain parquet since the Iceberg jars are not in this
sandbox; the connector seam is :class:`SnapshotStore`).

Per-stage lineage rows (stage, partition_id, input_rows, output_rows,
wall_ms, snapshot_id) are appended to ``<workdir>/lineage`` — the
analogue of the reference stamping collection provenance on every entry
(`surfactant/sbomtypes/_software.py:77-84`).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.canon import alias_entity_map
from ..operators.extract import extract_pages
from ..operators.identity import dedup_nodes
from ..operators.link import exporters_table, link_extracted


class SnapshotStore:
    """Parquet-backed stage snapshots with completion markers.

    Swap for an Iceberg catalog in a real deployment: ``write`` becomes
    ``writeTo(...).createOrReplace()`` and ``marker`` becomes the table
    snapshot id. The resume contract is identical.
    """

    def __init__(self, spark: SparkSession, workdir: str):
        self.spark = spark
        self.workdir = workdir
        os.makedirs(workdir, exist_ok=True)

    def path(self, stage: str) -> str:
        return os.path.join(self.workdir, stage)

    def marker(self, stage: str) -> str:
        return os.path.join(self.workdir, f"_{stage}_OK")

    def exists(self, stage: str, sig: Optional[str] = None) -> bool:
        """True when the stage snapshot is complete AND was produced by
        the same parameterization (``sig``): a marker whose recorded sig
        differs must NOT satisfy resume — e.g. a near_dup stage written
        by the simhash family silently answering a minhash request with
        the wrong table/schema."""
        m = self.marker(stage)
        if not os.path.exists(m):
            return False
        if sig is None:
            return True
        with open(m, encoding="utf-8") as f:
            return json.load(f).get("sig") == sig

    def write(
        self,
        stage: str,
        df: DataFrame,
        partition_by: Optional[List[str]] = None,
        sig: Optional[str] = None,
    ):
        """-> (snapshot_id, row_count). The count comes from an
        ``observe()`` metric collected DURING the write action — no
        second job over the data, at any scale."""
        from pyspark.sql import Observation

        obs = Observation(f"{stage}_rows")
        writer = df.observe(obs, F.count(F.lit(1)).alias("rows")).write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(self.path(stage))
        n_rows = int(obs.get["rows"])
        snapshot_id = f"{stage}-{int(time.time() * 1000)}"
        with open(self.marker(stage), "w", encoding="utf-8") as f:
            # schema persisted so an all-empty stage (zero parquet files)
            # still reads back on resume
            json.dump(
                {
                    "snapshot_id": snapshot_id,
                    "stage": stage,
                    "schema": df.schema.json(),
                    "rows": n_rows,
                    "sig": sig,
                },
                f,
            )
        return snapshot_id, n_rows

    def read(self, stage: str) -> DataFrame:
        reader = self.spark.read
        marker = self.marker(stage)
        if os.path.exists(marker):
            with open(marker, encoding="utf-8") as f:
                info = json.load(f)
            if "schema" in info:
                from pyspark.sql.types import StructType

                reader = reader.schema(StructType.fromJson(json.loads(info["schema"])))
        return reader.parquet(self.path(stage))

    def snapshot_id(self, stage: str) -> str:
        with open(self.marker(stage), encoding="utf-8") as f:
            return json.load(f)["snapshot_id"]

    def rows(self, stage: str) -> Optional[int]:
        """Row count recorded at write time (None for markers written
        before counts were recorded)."""
        with open(self.marker(stage), encoding="utf-8") as f:
            return json.load(f).get("rows")


@dataclass
class PipelineResult:
    nodes: DataFrame
    edges: DataFrame
    lineage: DataFrame
    stages_run: List[str] = field(default_factory=list)
    stages_resumed: List[str] = field(default_factory=list)
    near_dup: Optional[DataFrame] = None
    audit: Optional[DataFrame] = None
    # per-document keep/drop decisions derived from near_dup pairs
    # (url, cluster_id, is_survivor) — see operators.dedup.near_dup_clusters
    clusters: Optional[DataFrame] = None
    # host-level hyperlink graph over the raw pages (optional stage)
    host_edges: Optional[DataFrame] = None
    # write-time observed row count per stage (resumed stages: the
    # count recorded in their marker; None only for pre-count markers)
    # — callers should read these instead of launching count() jobs
    stage_rows: Dict[str, Optional[int]] = field(default_factory=dict)


def _lineage_rows(spark: SparkSession, stage: str, df: DataFrame, wall_ms: int, snapshot_id: str, input_rows: int, n_rows: Optional[int] = None):
    # a stage that ran but produced ZERO rows must still appear in
    # lineage (sentinel partition_id -1, output_rows 0) — groupBy over
    # an empty snapshot yields no rows at all, which silently erased
    # empty stages from the run record. Emptiness comes from the
    # write-time observed count when available (no job); the limit(1)
    # probe is the fallback for callers without one.
    if (n_rows == 0) or (n_rows is None and df.limit(1).count() == 0):
        return spark.createDataFrame(
            [(stage, -1, input_rows, 0, wall_ms, snapshot_id)],
            "stage string, partition_id int, input_rows long, "
            "output_rows long, wall_ms long, snapshot_id string",
        )
    per_part = (
        df.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(F.count(F.lit(1)).alias("output_rows"))
        .select(
            F.lit(stage).alias("stage"),
            "partition_id",
            F.lit(input_rows).cast("long").alias("input_rows"),
            F.col("output_rows").cast("long"),
            F.lit(wall_ms).cast("long").alias("wall_ms"),
            F.lit(snapshot_id).alias("snapshot_id"),
        )
    )
    return per_part


def run_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    alias_dict: DataFrame,
    workdir: str,
    resume: bool = True,
    n_salt: int = 0,
    near_dup: Optional[str] = None,
    near_dup_max_bucket: int = 64,
    host_graph: bool = False,
) -> PipelineResult:
    """pages + alias_dict -> materialized nodes/edges/lineage.

    Stage graph (each materialized, each independently resumable):

      extract   : pages -> extracted (narrow, Arrow UDF pass)
      alias_cc  : alias_dict -> (alias, entity) canonical map (CC)
      nodes     : extracted -> content-dedup node table
      edges     : extracted + alias map -> linked, deduped edge table
      near_dup  : (optional) near-duplicate pair table over the
                  extracted text — ``near_dup`` in {"simhash",
                  "minhash"} picks the family
      audit     : (with near_dup) the width-capped LSH buckets the
                  family DROPPED — the recall bound of the cap as a
                  first-class lineage-tracked stage, observable per
                  run instead of on demand (the lineage row's
                  output_rows is the dropped-bucket count; the
                  snapshot holds the buckets themselves)
      clusters  : (with near_dup) per-document keep/drop decisions —
                  pairs folded into transitive clusters (connected
                  components over near-dup edges only, never the
                  corpus) with one survivor per cluster (longest
                  extracted text, ties to smallest url); downstream
                  training-data prep filters on ``is_survivor``
      hostgraph : (optional) host-level hyperlink graph over the RAW
                  pages (operators/webgraph.host_graph) — crawl
                  structure is a property of the html, so this stage
                  reads pages, not extracted, and shares the run's
                  snapshot/lineage/resume machinery

    ``n_salt > 0`` runs the dictionary joins of the edges stage through
    the deterministic salted join (hot-domain skew; result-identical —
    tests/test_e2e.py pins it).
    """
    near_dup_sig = None
    if near_dup:
        if near_dup not in ("simhash", "minhash"):
            # validate BEFORE any corpus-scale stage runs — a typo must
            # not surface only after hours of extract/nodes/edges work
            raise ValueError(
                f"near_dup must be one of ['minhash', 'simhash'], got {near_dup!r}"
            )
        near_dup_sig = f"{near_dup}:{near_dup_max_bucket}"

    store = SnapshotStore(spark, workdir)
    run: List[str] = []
    resumed: List[str] = []
    # lineage construction is deferred: input_rows for every corpus stage
    # is the extract stage's OWN output count (extract is 1:1 with pages),
    # observed DURING the snapshot write — the pipeline pays neither the
    # old separate full `pages.count()` scan (round-3 verdict item 3) nor
    # any count job over the snapshot.
    pending: List[tuple] = []
    stage_rows: Dict[str, Optional[int]] = {}

    def stage(name: str, fn: Callable[[], DataFrame], partition_by=None, sig=None) -> DataFrame:
        if resume and store.exists(name, sig):
            resumed.append(name)
            stage_rows[name] = store.rows(name)
            return store.read(name)
        t0 = time.time()
        df = fn()
        snapshot_id, n_rows = store.write(name, df, partition_by, sig=sig)
        wall_ms = int((time.time() - t0) * 1000)
        out = store.read(name)
        pending.append((name, out, wall_ms, snapshot_id, n_rows))
        stage_rows[name] = n_rows
        run.append(name)
        return out

    # extract and alias_cc have independent inputs: run them as
    # concurrent Spark jobs (two driver threads) so the small
    # alias-canonicalization stage hides entirely behind the big
    # Arrow extraction pass instead of adding fixed latency
    import threading

    alias_result: Dict[str, object] = {}

    def _alias_job():
        try:
            alias_result["df"] = stage("alias_cc", lambda: alias_entity_map(alias_dict))
        except BaseException as exc:  # surfaced after join
            alias_result["error"] = exc

    alias_thread = threading.Thread(target=_alias_job, daemon=True)
    alias_thread.start()
    try:
        extracted = stage("extract", lambda: extract_pages(pages))
    finally:
        # always reap the alias job — an extract failure must not leave
        # its Spark job running detached
        alias_thread.join()
    if "error" in alias_result:
        raise alias_result["error"]
    alias_canon = alias_result.get("df")
    if alias_canon is None:
        raise RuntimeError("alias_cc stage produced no result (thread never ran?)")
    nodes = stage("nodes", lambda: dedup_nodes(extracted))
    def _edges() -> DataFrame:
        exporters = exporters_table(extracted, alias_canon)
        return link_extracted(extracted, alias_canon, exporters, n_salt=n_salt)

    edges = stage("edges", _edges, partition_by=["pred"])

    near_df = audit_df = clusters_df = None
    if near_dup:
        from ..operators.dedup import (
            dedup_minhash_with_audit,
            dedup_simhash_with_audit,
        )

        fams = {
            "simhash": dedup_simhash_with_audit,
            "minhash": dedup_minhash_with_audit,
        }
        combined_fn = fams[near_dup]
        # pairs + audit derive from ONE Arrow hash pass (the combined
        # op's checkpoint) instead of re-running the corpus-scale Python
        # work per stage. The shared pass is built lazily on first use,
        # so a resume that satisfies both stages never pays it; its wall
        # lands in whichever stage triggers it first.
        shared: Dict[str, tuple] = {}

        def _combined() -> tuple:
            if "v" not in shared:
                shared["v"] = combined_fn(
                    extracted, id_col="url", text_col="text_extracted",
                    max_bucket=near_dup_max_bucket,
                )
            return shared["v"]

        # sig pins the family + cap: a workdir resumed with a DIFFERENT
        # --near-dup must re-run these stages, not return the previous
        # family's snapshots under the new request's name
        near_df = stage("near_dup", lambda: _combined()[0], sig=near_dup_sig)
        audit_df = stage(
            "audit",
            lambda: _combined()[1].withColumn("family", F.lit(near_dup)),
            sig=near_dup_sig,
        )

        def _clusters() -> DataFrame:
            from ..operators.dedup import near_dup_clusters

            docs = extracted.select(
                "url", F.length("text_extracted").alias("n_chars")
            )
            return near_dup_clusters(docs, near_df, id_col="url").withColumnRenamed(
                "doc_id", "url"
            )

        # reads the near_dup SNAPSHOT, not the shared pass — a resumed
        # near_dup satisfies this stage without re-hashing the corpus
        clusters_df = stage("clusters", _clusters, sig=near_dup_sig)

    host_df = None
    if host_graph:
        from ..operators.webgraph import host_graph as _host_graph_op

        host_df = stage("hostgraph", lambda: _host_graph_op(pages))

    lineage_batches: List[DataFrame] = []
    if pending:
        # extract is 1:1 with pages: its write-time observed count IS
        # n_pages. When extract itself was resumed its marker carries
        # the count; the count() fallback (an empty-projection scan job
        # over the snapshot — cheap, but a job) only fires for markers
        # from before counts were recorded.
        n_pages = stage_rows.get("extract")
        if n_pages is None:
            n_pages = store.rows("extract")
        if n_pages is None:
            n_pages = extracted.count()
        per_stage_input = {
            "extract": n_pages, "nodes": n_pages, "edges": n_pages,
            "near_dup": n_pages, "audit": n_pages, "clusters": n_pages,
            "hostgraph": n_pages,
        }
        for name, out, wall_ms, snapshot_id, n_rows in pending:
            lineage_batches.append(
                _lineage_rows(
                    spark, name, out, wall_ms, snapshot_id,
                    per_stage_input.get(name, -1), n_rows=n_rows,
                )
            )
    if lineage_batches:
        lineage = lineage_batches[0]
        for b in lineage_batches[1:]:
            lineage = lineage.unionByName(b)
        lineage.write.mode("append").parquet(os.path.join(workdir, "lineage"))
    lineage_df = spark.read.parquet(os.path.join(workdir, "lineage"))

    return PipelineResult(
        nodes=nodes, edges=edges, lineage=lineage_df,
        stages_run=run, stages_resumed=resumed,
        near_dup=near_df, audit=audit_df, clusters=clusters_df,
        host_edges=host_df,
        stage_rows=dict(stage_rows),
    )
