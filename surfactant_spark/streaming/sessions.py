"""Stateful event sessionization — batch twin + Structured-Streaming
custom stateful operator (SURVEY §2.10 extension; the reference is
batch-only, this is the `applyInPandasWithState` surface the north
rule's streaming-capable engine needs).

Semantics (identical in both forms): events of one user belong to the
same session while consecutive timestamps are within ``gap_s`` seconds;
a session emits (user_id, session_start, session_end, n_events,
total_value).

- **batch**: lag window -> new-session flag -> running sum = session
  number -> groupBy aggregate. Two shuffles on user_id, partial aggs
  apply; SQL-replayable (the driver oracle for q:sessionize).
- **stream**: ``groupBy(user_id).applyInPandasWithState`` — state
  carries the open session across micro-batches; a session is emitted
  when a later event of the same user arrives more than ``gap_s`` after
  it ends (or when the state times out). The user's final open session
  stays in state, exactly like a live pipeline that cannot yet know the
  session ended — the batch/stream equivalence test therefore compares
  *closed* sessions (every session but each user's last).

State is one fixed-size row per active user — bounded by active-user
cardinality, not event volume; ProcessingTime timeouts evict idle
users, so the operator survives unbounded streams.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F, types as T

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

# open-session carry-over: start/end as epoch seconds + running aggs
STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_epoch", T.LongType()),
        T.StructField("end_epoch", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def sessionize_numbered(events: DataFrame, gap_s: int = 1800) -> DataFrame:
    """events + ``_sess_no`` (per-user running session number) — the
    shared prelude of the batch aggregate and the oracle-exact query."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # unix_timestamp, not cast("long"): parquet events carry
    # TIMESTAMP_NTZ which refuses a bigint cast; with the UTC session
    # TZ both forms agree
    ep = F.unix_timestamp(F.col("ts"))
    prev = F.lag(ep).over(w)
    new_sess = (prev.isNull() | (ep - prev > gap_s)).cast("long")
    return events.withColumn("_sess_no", F.sum(new_sess).over(w))


def sessionize_batch(events: DataFrame, gap_s: int = 1800) -> DataFrame:
    """Gap-based sessions, set-at-a-time."""
    return (
        sessionize_numbered(events, gap_s)
        .groupBy("user_id", "_sess_no")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .drop("_sess_no")
    )


def _sessionize_state_fn(gap_s: int, idle_timeout: bool):
    def fn(
        key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if idle_timeout and state.hasTimedOut:
            # idle user: flush the open session and evict
            if state.exists:
                s, e, n, v = state.get
                state.remove()
                yield pd.DataFrame(
                    {
                        "user_id": [user_id],
                        "session_start": [pd.Timestamp(s, unit="s")],
                        "session_end": [pd.Timestamp(e, unit="s")],
                        "n_events": [n],
                        "total_value": [v],
                    }
                )
            return
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values(
            ["ts", "event_id"]
        )
        cur = list(state.get) if state.exists else None  # [start, end, n, value]
        out = []
        epoch0 = pd.Timestamp("1970-01-01")
        for ts, value in zip(rows["ts"], rows["value"]):
            # naive-timestamp arithmetic: session TZ is UTC, so this is
            # exactly the batch twin's cast("ts" as long) — no tzlocal
            ep = int((pd.Timestamp(ts) - epoch0) / pd.Timedelta(seconds=1))
            if cur is None:
                cur = [ep, ep, 0, 0.0]
            elif ep - cur[1] > gap_s:
                out.append((user_id,) + tuple(cur))
                cur = [ep, ep, 0, 0.0]
            cur[1] = max(cur[1], ep)
            cur[2] += 1
            # NULL/NaN-safe: None == None is True, so check identity first
            if value is not None and value == value:
                cur[3] += float(value)
        state.update(tuple(cur))
        if idle_timeout:
            state.setTimeoutDuration(gap_s * 1000)
        if out:
            yield pd.DataFrame(
                {
                    "user_id": [o[0] for o in out],
                    "session_start": [pd.Timestamp(o[1], unit="s") for o in out],
                    "session_end": [pd.Timestamp(o[2], unit="s") for o in out],
                    "n_events": [o[3] for o in out],
                    "total_value": [o[4] for o in out],
                }
            )

    return fn


def sessionize_stream(
    events_stream: DataFrame, gap_s: int = 1800, idle_timeout: bool = False
) -> DataFrame:
    """events stream -> closed-session stream (custom stateful operator).

    ``idle_timeout=True`` adds a ProcessingTime timeout that flushes and
    evicts idle users' open sessions — for CONTINUOUS queries only: a
    stateful query with processing-time timeouts keeps scheduling
    timeout micro-batches, so an availableNow run would never terminate
    (observed on Spark 4.1). Incremental availableNow runs use
    ``idle_timeout=False`` and carry open sessions in the checkpointed
    state to the next run instead."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout
        else GroupStateTimeout.NoTimeout
    )
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _sessionize_state_fn(gap_s, idle_timeout),
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=conf,
    )


def run_sessionize_stream(
    spark,
    events_path: str,
    out_path: str,
    checkpoint: str,
    gap_s: int = 1800,
    max_files_per_trigger: int = 4,
):
    """availableNow sessionization over a staged events directory; the
    file sink gives exactly-once output, the checkpoint carries state
    across incremental runs."""
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string"
        )
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(events_path)
    )
    q = (
        sessionize_stream(stream, gap_s)
        .writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.schema(SESSION_SCHEMA).parquet(out_path)
