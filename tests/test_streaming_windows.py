"""Watermarked tumbling-window aggregation: streaming == batch (every
window via a complete-mode sink), and append-mode watermark closing."""

import datetime


EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _ts(minute: int):
    return datetime.datetime(2024, 1, 1, 0, 0, 0) + datetime.timedelta(minutes=minute)


def _events(spark, rows):
    return spark.createDataFrame(
        [(i, _ts(m), 1, t, float(v), None) for i, (m, t, v) in enumerate(rows)],
        EVENTS_SCHEMA,
    )


def test_stream_windows_match_batch(spark, tmp_path):
    from surfactant_spark.streaming.incremental import (
        stream_windowed_event_counts,
        windowed_event_counts,
    )

    rows = [
        (0, "a", 1.0), (3, "a", 2.0), (7, "b", 1.5),     # window 00:00
        (12, "a", 4.0), (14, "b", 0.5),                   # window 00:10
        (95, "a", 1.0),                                   # window 01:30
    ]
    ev = _events(spark, rows)
    src = str(tmp_path / "ev")
    ev.coalesce(1).write.parquet(src)
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .parquet(src)
    )
    q = (
        stream_windowed_event_counts(stream, "10 minutes", "30 minutes")
        .writeStream.format("memory")
        .queryName("win_complete")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.window_start, r.event_type, r.n_events, r.total_value)
        for r in spark.sql("select * from win_complete").collect()
    }
    want = {
        (r.window_start, r.event_type, r.n_events, r.total_value)
        for r in windowed_event_counts(ev, "10 minutes").collect()
    }
    assert got == want and len(want) == 5


def test_append_mode_emits_only_watermark_closed_windows(spark, tmp_path):
    """In append mode a window emits only once the watermark passes its
    end — the last event (01:35) closes everything older than
    01:35 - 30min = 01:05, i.e. the two 00:0x windows but not 01:30."""
    from surfactant_spark.streaming.incremental import stream_windowed_event_counts

    rows = [(0, "a", 1.0), (12, "a", 2.0), (95, "a", 1.0)]
    ev = _events(spark, rows)
    src = str(tmp_path / "ev")
    # two files -> two micro-batches, so the watermark from batch 1
    # closes batch-1 windows during batch 2
    ev.where("event_id < 2").coalesce(1).write.parquet(src)
    ev.where("event_id >= 2").coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_windowed_event_counts(stream, "10 minutes", "30 minutes")
        .writeStream.format("memory")
        .queryName("win_append")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.window_start, r.n_events)
        for r in spark.sql("select * from win_append").collect()
    }
    t0 = int(_ts(0).replace(tzinfo=datetime.timezone.utc).timestamp())
    assert got == {(t0, 1), (t0 + 600, 1)}  # the 01:30 window stays open
