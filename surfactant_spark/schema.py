"""Contracted StructType schemas for every table in the pipeline.

Schemas are always declared, never inferred (the reference also has a
fixed dataclass schema, `surfactant/sbomtypes/_software.py:41-65`).
Shapes follow BASELINE.json ``input_hint`` and FIXTURES.md §8.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- input -----------------------------------------------------------------
PAGES = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

# --- stage 1 outputs ---------------------------------------------------------
EXTRACTED = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("content_sha256", T.StringType(), True),
        T.StructField("doctype", T.StringType(), True),
        T.StructField("text_extracted", T.StringType(), True),
        T.StructField("title", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("n_mentions", T.IntegerType(), True),
    ]
)

MENTIONS = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("pred", T.StringType(), False),
        T.StructField("alias", T.StringType(), False),
        T.StructField(
            "span",
            T.StructType(
                [
                    T.StructField("start", T.IntegerType(), True),
                    T.StructField("end", T.IntegerType(), True),
                ]
            ),
            True,
        ),
        T.StructField("conf", T.DoubleType(), True),
    ]
)

# --- dimension --------------------------------------------------------------
ALIAS_DICT = T.StructType(
    [
        T.StructField("alias", T.StringType(), False),
        T.StructField("canon_name", T.StringType(), False),
        T.StructField("entity_kind", T.StringType(), True),
    ]
)

# --- stage 2/3 outputs --------------------------------------------------------
NODES = T.StructType(
    [
        T.StructField("canon_uuid", T.StringType(), False),
        T.StructField("sha256", T.StringType(), True),
        T.StructField("names", T.ArrayType(T.StringType()), True),
        T.StructField("aliases", T.ArrayType(T.StringType()), True),
        T.StructField("first_seen", T.TimestampType(), True),
        T.StructField("n_sources", T.LongType(), True),
    ]
)

EDGES = T.StructType(
    [
        T.StructField("subj_uuid", T.StringType(), False),
        T.StructField("pred", T.StringType(), False),
        T.StructField("obj_uuid", T.StringType(), False),
        T.StructField("n_evidence", T.LongType(), True),
        T.StructField("sources", T.ArrayType(T.StringType()), True),
    ]
)

LINEAGE = T.StructType(
    [
        T.StructField("stage", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("input_rows", T.LongType(), True),
        T.StructField("output_rows", T.LongType(), True),
        T.StructField("wall_ms", T.LongType(), True),
        T.StructField("snapshot_id", T.StringType(), True),
    ]
)

# node fixture table used by the relationship-linking unit tests
# (subset of reference Software, `_software.py:41-65`)
SOFTWARE_NODES = T.StructType(
    [
        T.StructField("uuid", T.StringType(), False),
        T.StructField("fileName", T.ArrayType(T.StringType()), True),
        T.StructField("installPath", T.ArrayType(T.StringType()), True),
        T.StructField("metadata_json", T.StringType(), True),
    ]
)

TRIPLES = T.StructType(
    [
        T.StructField("subj", T.StringType(), False),
        T.StructField("pred", T.StringType(), False),
        T.StructField("obj", T.StringType(), False),
    ]
)
