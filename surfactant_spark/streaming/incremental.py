"""Incremental page ingest via Structured Streaming.

stage-1 extraction is a stateless Arrow map, so it lifts to
``readStream`` verbatim; dedup state is bounded with a watermark on
``warc_ts`` (late pages beyond the horizon are treated as new
sightings — content-hash identity makes that harmless, the node
collapses at the next batch merge). Connected components stays a
periodic batch job — there is no streaming CC (SURVEY.md §2.10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.extract import extract_pages
from ..schema import PAGES


def stream_pages(spark: SparkSession, path: str, max_files_per_trigger: int = 4) -> DataFrame:
    return (
        spark.readStream.schema(PAGES)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def streaming_extract(pages_stream: DataFrame) -> DataFrame:
    """pages stream -> extracted stream (same Arrow pass as batch)."""
    return extract_pages(pages_stream)


def streaming_new_content(extracted_stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """First sighting of each content hash within the watermark horizon
    (stateful dropDuplicates — the streaming analogue of the sha256
    dedup index, `_sbom.py:75-83`)."""
    return (
        extracted_stream.withWatermark("warc_ts", watermark)
        .dropDuplicates(["content_sha256"])
        .select("url", "warc_ts", "content_sha256", "title", "n_mentions")
    )


def run_incremental_batch(
    spark: SparkSession, pages_path: str, out_path: str, checkpoint: str
):
    """One incremental micro-batch pass: new pages -> extracted parquet
    with exactly-once sink semantics via checkpointed file sink."""
    stream = streaming_extract(stream_pages(spark, pages_path))
    q = (
        stream.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_path)
