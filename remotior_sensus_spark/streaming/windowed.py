"""Event-time windowed aggregation with watermarked late-data handling.

The reference is batch-only (SURVEY §2.9); this is the Structured
Streaming twin of a grouped time-bucket aggregation: tumbling
event-time windows per event_type, counts plus an order-independent
fixed-point value sum. The transformation is ONE function applied to
both the batch and the streaming DataFrame, so batch oracle parity
proves the streaming result too (same plan below the sink) — the same
shared-transform contract as streaming/incremental.py.

Scale shape: the window+type grouping is a single hash shuffle with
map-side partial aggregation; streaming state is bounded by the
watermark (windows older than `delay` are finalized and evicted), so
state size is O(open windows x event types), independent of stream
length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from remotior_sensus_spark.functions.cols import fixed1e6


def windowed_event_counts(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Tumbling event-time windows per event_type: row count and exact
    fixed-point sum(value). Works unchanged on a batch or streaming
    DataFrame (streaming requires withWatermark upstream for append
    mode). Window start is emitted as epoch seconds BIGINT so the
    result hashes identically across engines."""
    return (
        events.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(fixed1e6(F.col("value"))).alias("sum_value_fp"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start_s"),
            "event_type", "n_events", "sum_value_fp",
        )
    )


def windowed_counts_stream(spark: SparkSession, events_dir: str,
                           checkpoint_dir: str, window: str = "1 hour",
                           delay: str = "2 hours",
                           queryName: str = "windowed_counts"):
    """readStream over an events directory -> watermark(`delay`) ->
    shared windowed_event_counts transform -> append-mode memory sink.
    Append mode emits a window only once the watermark passes its end,
    i.e. each window row is final (exactly-once per window) — the
    late-data contract the reference's batch recompute cannot give.
    Returns the StreamingQuery (AvailableNow for incremental catch-up)."""
    static = spark.read.parquet(events_dir)
    stream = spark.readStream.schema(static.schema).parquet(events_dir)
    # watermarks require TIMESTAMP (not NTZ); the session tz is pinned
    # UTC so the cast changes the type, not the instant
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = windowed_event_counts(stream.withWatermark("ts", delay), window)
    return (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(queryName)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
