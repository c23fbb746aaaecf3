"""Stateful sessionization: unit semantics, stream==batch equivalence
(incl. multi-micro-batch state carry-over), and the closed-session
emission rule."""

import datetime

from pyspark.sql import functions as F

from surfactant_spark.streaming.sessions import (
    run_sessionize_stream,
    sessionize_batch,
)

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _ts(minute: int):
    return datetime.datetime(2024, 1, 1, 0, 0, 0) + datetime.timedelta(minutes=minute)


def _events(spark, rows):
    return spark.createDataFrame(
        [
            (i, _ts(m), u, "e", float(v), None)
            for i, (u, m, v) in enumerate(rows)
        ],
        EVENTS_SCHEMA,
    )


def test_sessionize_batch_semantics(spark):
    # user 1: events at 0,10,20 then a 90-min gap then 120,125
    # user 2: single event
    ev = _events(
        spark,
        [(1, 0, 1.0), (1, 10, 2.0), (1, 20, 3.0), (1, 120, 4.0), (1, 125, 5.0), (2, 0, 9.0)],
    )
    got = {
        (r.user_id, r.session_start.minute, r.session_end.minute, r.n_events, r.total_value)
        for r in sessionize_batch(ev, gap_s=1800).collect()
    }
    assert got == {
        (1, 0, 20, 3, 6.0),
        (1, 0, 5, 2, 9.0),   # 120' -> 02:00, 125' -> 02:05
        (2, 0, 0, 1, 9.0),
    }


def test_stream_matches_batch_closed_sessions(spark, tmp_path):
    """Every session except each user's last (still open in state) must
    come out of the stream identical to the batch twin; two staged
    files + maxFilesPerTrigger=1 force the open session to carry across
    micro-batches through the state store."""
    early = [(1, 0, 1.0), (1, 10, 2.0), (2, 0, 5.0), (2, 5, 5.0)]
    late = [(1, 120, 3.0), (1, 130, 4.0), (2, 300, 7.0), (3, 0, 1.0)]
    ev1 = _events(spark, early)
    ev2 = spark.createDataFrame(
        [(100 + i, _ts(m), u, "e", float(v), None) for i, (u, m, v) in enumerate(late)],
        EVENTS_SCHEMA,
    )
    src = str(tmp_path / "events")
    ev1.coalesce(1).write.parquet(src)
    ev2.coalesce(1).write.mode("append").parquet(src)

    out = run_sessionize_stream(
        spark,
        src,
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
        gap_s=1800,
        max_files_per_trigger=1,
    )
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events, round(r.total_value, 6))
        for r in out.collect()
    }

    all_events = spark.read.parquet(src)
    batch = sessionize_batch(all_events, gap_s=1800)
    # closed = not the user's last session (stream keeps the final one open)
    w_last = batch.groupBy("user_id").agg(F.max("session_start").alias("_last"))
    closed = batch.join(w_last, "user_id").where(F.col("session_start") < F.col("_last"))
    want = {
        (r.user_id, r.session_start, r.session_end, r.n_events, round(r.total_value, 6))
        for r in closed.collect()
    }
    assert got == want
    # users 1 and 2 each have exactly one closed session; user 3 none
    assert {u for (u, *_rest) in got} == {1, 2}


def test_stream_incremental_resume(spark, tmp_path):
    """A second availableNow run over new files resumes from the
    checkpointed state: the session left open by run 1 closes when run
    2 delivers a later event past the gap."""
    src = str(tmp_path / "events")
    _events(spark, [(7, 0, 1.0), (7, 5, 1.0)]).coalesce(1).write.parquet(src)
    out1 = run_sessionize_stream(
        spark, src, str(tmp_path / "out"), str(tmp_path / "ckpt"), gap_s=1800
    )
    assert out1.count() == 0  # still open

    spark.createDataFrame(
        [(900, _ts(240), 7, "e", 2.0, None)], EVENTS_SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)
    out2 = run_sessionize_stream(
        spark, src, str(tmp_path / "out"), str(tmp_path / "ckpt"), gap_s=1800
    )
    rows = out2.collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.user_id, r.n_events, r.total_value) == (7, 2, 2.0)
    assert r.session_start == _ts(0) and r.session_end == _ts(5)
