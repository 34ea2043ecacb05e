"""Custom stateful streaming operator: event sessionization with
``applyInPandasWithState`` (the brief's "custom stateful operators"
streaming surface; no reference analogue — the reference is batch-only).

Each user's open session (start, last event time, count) lives in the
state store; an event more than ``gap`` seconds after the previous one
closes the session and emits it. Late events (arriving after newer ones
in a previous micro-batch) merge into the open session without
regressing its high-water mark; ``GroupStateTimeout
.ProcessingTimeTimeout`` flushes idle users and bounds state.

The batch twin is queries.sessionize_events — the test drives the same
events through both paths (Trigger.AvailableNow) and asserts identical
per-user session counts.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "start long, last long, n long, n_sessions long"
OUTPUT_SCHEMA = ("user_id string, session_start long, session_end long, "
                 "n_events long, closed boolean")


def _sessionize_fn(gap_s: int):
    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            if state.exists:
                start, last, n, n_sessions = state.get
                state.remove()
                yield pd.DataFrame([{
                    "user_id": user_id, "session_start": start,
                    "session_end": last, "n_events": n, "closed": True,
                }])
            return
        ts = []
        for pdf in pdfs:
            ts.extend(int(t) for t in pdf["ts_epoch"])
        ts.sort()
        if state.exists:
            start, last, n, n_sessions = state.get
        else:
            start, last, n, n_sessions = None, None, 0, 0
        out = []
        for t in ts:
            if last is not None and t - last > gap_s:
                out.append({
                    "user_id": user_id, "session_start": start,
                    "session_end": last, "n_events": n, "closed": True,
                })
                n_sessions += 1
                start, n = t, 0
            if start is None:
                start = t
            # a LATE event (t < last, cross-batch arrival) merges into
            # the open session but must not regress the session's
            # high-water mark — otherwise a later on-time event measures
            # its gap from the stale timestamp and fabricates a close
            last = t if last is None else max(last, t)
            n += 1
        state.update((start, last, n, n_sessions))
        state.setTimeoutDuration(gap_s * 1000)
        if out:
            yield pd.DataFrame(out)

    return fn


def sessionize_stream(spark: SparkSession, events_dir: str,
                      checkpoint_dir: str, gap_s: int = 1800,
                      queryName: str = "sessions"):
    """readStream over an events directory -> per-user stateful
    sessionization -> closed sessions appended to a memory sink.
    Returns the StreamingQuery (AvailableNow for incremental runs)."""
    static = spark.read.parquet(events_dir)
    stream = spark.readStream.schema(static.schema).parquet(events_dir)
    # user_id may be any orderable type in the source (string or int
    # depending on the generator); the state/output contract is string
    ev = stream.select(
        F.col("user_id").cast("string").alias("user_id"),
        F.unix_timestamp("ts").alias("ts_epoch"),
    )
    sessions = ev.groupBy("user_id").applyInPandasWithState(
        _sessionize_fn(gap_s),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
    return (
        sessions.writeStream.outputMode("append")
        .format("memory")
        .queryName(queryName)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
