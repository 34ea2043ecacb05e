"""Custom stateful streaming operator: ordered-funnel tracking with
``applyInPandasWithState`` — the streaming twin of
operators/events.funnel_stages.

Exact under ANY cross-batch arrival order: per user the state stores
the step-relevant event history (events whose type is a funnel step —
the same per-user boundedness the batch funnel's collect_list relies
on; all other event types are filtered out before the state store) and
every micro-batch recomputes the greedy scan over the merged, sorted
history. The greedy depth is monotone non-decreasing in the event set
(adding an event can only make each stage's completion time earlier,
never later), so ``max(stage)`` per user across emitted rows equals the
batch result regardless of how files split into micro-batches or how
late an early-stage event arrives.

State could be pruned under an event-time watermark (drop events older
than the horizon once no earlier event can still arrive); kept whole
here so exactness needs no ingestion-order assumption.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from remotior_sensus_spark.operators.events import FUNNEL_STEPS

STATE_SCHEMA = "ts array<long>, eid array<long>, et array<string>"
OUTPUT_SCHEMA = "user_id string, stage long"


def _greedy_depth(rows: list[tuple[int, int, str]], steps: list[str]) -> int:
    stage, t = 0, None
    for ts, _eid, et in sorted(rows):
        if stage < len(steps) and et == steps[stage] and (
                stage == 0 or ts > t):
            stage += 1
            t = ts
    return stage


def _funnel_fn(steps: list[str]):
    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:  # no timeout is set; defensive
            return
        if state.exists:
            ts, eid, et = state.get
            rows = list(zip([int(x) for x in ts], [int(x) for x in eid],
                            list(et)))
        else:
            rows = []
        for pdf in pdfs:
            rows.extend(zip((int(x) for x in pdf["ts_us"]),
                            (int(x) for x in pdf["event_id"]),
                            (str(x) for x in pdf["event_type"])))
        state.update(([r[0] for r in rows], [r[1] for r in rows],
                      [r[2] for r in rows]))
        yield pd.DataFrame([{
            "user_id": user_id,
            "stage": _greedy_depth(rows, steps),
        }])

    return fn


def funnel_stream(spark: SparkSession, events_dir: str, checkpoint_dir: str,
                  steps: list[str] | None = None,
                  queryName: str = "funnel", max_files: int | None = 1):
    """readStream over an events directory -> per-user stateful funnel
    depth -> append to a memory sink (latest row per user wins; depth
    is monotone). ``max_files=1`` forces one file per micro-batch so
    the state path is genuinely exercised."""
    steps = steps or FUNNEL_STEPS
    reader = spark.readStream.format("parquet")
    if max_files is not None:
        reader = reader.option("maxFilesPerTrigger", max_files)
    ev = (
        reader.schema(
            "event_id long, ts timestamp_ntz, user_id long, "
            "event_type string, value double, props string")
        .load(events_dir)
        .filter(F.col("event_type").isin(*steps))
        .select(
            F.col("user_id").cast("string").alias("user_id"),
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
            "event_id", "event_type",
        )
    )
    out = ev.groupBy("user_id").applyInPandasWithState(
        _funnel_fn(steps), OUTPUT_SCHEMA, STATE_SCHEMA,
        "append", GroupStateTimeout.NoTimeout)
    return (
        out.writeStream.format("memory").queryName(queryName)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
