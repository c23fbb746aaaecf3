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


def windowed_event_counts(events: DataFrame, window: str = "10 minutes") -> DataFrame:
    """Tumbling-window per-type event counts — batch form. The window
    boundaries are epoch-aligned, so the streaming twin and the DuckDB
    time_bucket oracle agree exactly."""
    return (
        events.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2
            ).alias("total_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def stream_windowed_event_counts(
    events_stream: DataFrame, window: str = "10 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Streaming twin: watermark bounds the state (windows older than
    the horizon finalize and are evicted; late events beyond it drop).
    In append mode only watermark-closed windows emit; a complete-mode
    sink exposes every window for batch-equivalence testing."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2
            ).alias("total_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
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
