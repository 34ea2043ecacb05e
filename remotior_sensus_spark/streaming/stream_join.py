"""Stream-stream interval join with watermark-bounded state.

The reference is batch-only (SURVEY §2.9); this is the Structured
Streaming twin of operators/tables.interval_join: clicks landing
within a horizon after each error, as a live join of two event
streams. Batch picks the bucketed equi-join plan (a theta join would
be a BroadcastNestedLoop); streaming uses Spark's native stream-stream
inner join, whose state store IS the right physical strategy there —
the event-time range condition plus both-side watermarks lets the
state manager evict every buffered row once the watermark passes
`horizon`, so state is O(events inside one horizon window), not
O(stream length).

Scale shape: one hash shuffle per side on the join key; matched pairs
emit in append mode as soon as both sides arrive (inner join never
waits for the watermark to emit, only to evict). The same-source
self-join (errors and clicks filtered from one stream) is supported
by Spark >= 3.1 and costs one scan, not two.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def split_error_click(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Shared batch/stream splitter: (errors, clicks) projections with
    disambiguated column names and TIMESTAMP event time (the session tz
    is pinned UTC so the NTZ cast changes the type, not the instant)."""
    ts = F.col("ts").cast("timestamp")
    errors = events.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("e_user"),
        F.col("event_id").alias("error_id"),
        ts.alias("ets"),
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        ts.alias("cts"),
    )
    return errors, clicks


def error_click_pairs_stream(spark: SparkSession, events_dir: str,
                             checkpoint_dir: str, horizon_s: int = 7200,
                             delay: str = "30 minutes",
                             queryName: str = "error_click_pairs"):
    """readStream over an events directory -> self-split into error and
    click streams -> watermarked stream-stream inner join on user with
    cts in [ets, ets + horizon_s] (bounds inclusive, matching the batch
    interval_join contract) -> append-mode memory sink.

    Both sides carry a watermark and the join condition bounds cts by
    ets from both directions, which is exactly what Spark's state
    cleanup needs: buffered errors are dropped once the click watermark
    passes ets + horizon, buffered clicks once the error watermark
    passes cts. Returns the StreamingQuery (AvailableNow)."""
    static = spark.read.parquet(events_dir)
    stream = spark.readStream.schema(static.schema).parquet(events_dir)
    errors, clicks = split_error_click(stream)
    joined = clicks.withWatermark("cts", delay).join(
        errors.withWatermark("ets", delay),
        F.expr(f"c_user = e_user AND cts >= ets "
               f"AND cts <= ets + interval {int(horizon_s)} seconds"),
    ).select(F.col("e_user").alias("user_id"), "error_id", "click_id")
    return (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(queryName)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
