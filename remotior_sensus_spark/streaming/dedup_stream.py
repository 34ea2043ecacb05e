"""Streaming exact deduplication with watermark-bounded state.

The batch twin is operators/textops.dedup_exact (one hash shuffle on
the digest); on an unbounded ingest stream the same semantics need
state, and unbounded `dropDuplicates` state grows with stream length —
the operator that OOMs a 1000-executor cluster slowly. Spark's
`dropDuplicatesWithinWatermark` keeps one state row per key seen
within the watermark delay and evicts it once the event-time watermark
passes, so state is O(arrival rate x delay): the correct contract for
ingest dedup, where a duplicate (retry, replayed batch) lands near its
original and a key recurring much later is legitimately new data.

Scale shape: one hash shuffle on the dedup key into the state store;
emitted rows are append-mode final.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_events(events: DataFrame) -> DataFrame:
    """Shared projection: the dedup identity is the event_id (retries
    replay the same id), event time cast to TIMESTAMP for watermarking
    (session tz pinned UTC, so the NTZ cast keeps the instant)."""
    return events.withColumn("ts", F.col("ts").cast("timestamp"))


def dedup_stream(spark, events_dir: str, checkpoint_dir: str,
                 delay: str = "1 hour", queryName: str = "dedup_stream"):
    """readStream -> watermark(`delay`) -> dropDuplicatesWithinWatermark
    on event_id -> append-mode memory sink. A duplicate arriving within
    `delay` of the first copy's event time is dropped; state for an id
    is freed once the watermark passes its event time + delay. Returns
    the StreamingQuery (AvailableNow)."""
    static = spark.read.parquet(events_dir)
    stream = dedup_events(
        spark.readStream.schema(static.schema).parquet(events_dir))
    out = (stream.withWatermark("ts", delay)
           .dropDuplicatesWithinWatermark(["event_id"]))
    return (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(queryName)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
