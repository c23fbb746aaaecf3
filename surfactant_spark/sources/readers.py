"""Table readers — the engine's scan surface (S1-S6, S11).

The corpus *is* a table (`spark.read.parquet(...)`), which replaces the
reference's recursive directory walk (`surfactant/cmd/generate.py:
411-522`) with a partitioned columnar scan that Catalyst can prune.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def documents_as_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapter: the driver's ``documents`` table as a pages-shaped
    corpus (FIXTURES.md §1: ``url := source || '/' || doc_id``). The
    ``html`` column is the utf-8 text bytes; ``warc_ts`` is a
    deterministic function of doc_id so runs are reproducible."""
    docs = read_table(spark, sf_dir, "documents")
    return docs.select(
        F.concat(F.col("source"), F.lit("/"), F.col("doc_id").cast("string")).alias("url"),
        (F.lit("2024-01-01 00:00:00").cast("timestamp") + F.make_interval(secs=F.col("doc_id"))).alias(
            "warc_ts"
        ),
        F.encode(F.col("text"), "UTF-8").alias("html"),
        F.col("text"),
        F.col("lang"),
    )


def single_page(pages: DataFrame, url: str) -> DataFrame:
    """S2 — single-document scan: predicate pushed to the parquet scan
    (`cmd/generate.py:384-408` analogue)."""
    return pages.where(F.col("url") == F.lit(url))


def read_cytrics_json(spark: SparkSession, path: str):
    """S6 — read a CyTRICS-shaped JSON-lines export back into
    (nodes, edges) DataFrames with declared schemas (the analogue of
    `input_readers/cytrics_reader.py:12-14`; schema declared, never
    inferred)."""
    node_schema = (
        "UUID string, sha256 string, fileName array<string>, "
        "installPath array<string>, n_sources long"
    )
    edge_schema = "xUUID string, yUUID string, relationship string"
    nodes = spark.read.schema(node_schema).json(os.path.join(path, "nodes"))
    edges = spark.read.schema(edge_schema).json(os.path.join(path, "edges"))
    return (
        nodes.select(
            F.col("UUID").alias("canon_uuid"),
            "sha256",
            F.col("fileName").alias("names"),
            F.col("installPath").alias("aliases"),
            "n_sources",
        ),
        edges.select(
            F.col("xUUID").alias("subj_uuid"),
            F.col("relationship").alias("pred"),
            F.col("yUUID").alias("obj_uuid"),
        ),
    )
