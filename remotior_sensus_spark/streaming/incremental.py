"""Incremental document ingestion with Structured Streaming.

The reference is batch-only (SURVEY §2.9 — no streaming anywhere in
src/). This module is the optional stretch surface: new interleaved-
document files appended to a directory are picked up incrementally,
spans exploded, media refs resolved to tile keys, and per-(bandset,
band) assignment counts maintained — the streaming twin of the
flagship spatial join. Used with Trigger.AvailableNow for incremental
batch catch-up (the Iceberg-snapshot-tailing pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_tile_assignments(
    spark: SparkSession,
    docs_dir: str,
    tiles_path: str,
    checkpoint_dir: str,
):
    """readStream over a documents directory -> exploded media spans ->
    join to the (static, broadcastable) tiles dimension -> complete-mode
    counts in the `tile_assignments` memory sink. Returns the
    StreamingQuery (use Trigger.AvailableNow for incremental catch-up)."""
    static = spark.read.parquet(docs_dir)
    stream = (
        spark.readStream.schema(static.schema).parquet(docs_dir)
    )
    # span explosion + media_ref parsing SHARED with the batch path
    # (spatial_join.explode_spans / parse_media_refs): streaming is a
    # plain DataFrame transform, so the format contract lives in exactly
    # one place and a parsing fix cannot miss the streaming twin
    from remotior_sensus_spark.operators.spatial_join import (
        explode_spans,
        parse_media_refs,
    )

    spans = parse_media_refs(
        explode_spans(stream).filter(F.col("kind") == "media")
    )
    tiles = spark.read.parquet(tiles_path).select(
        "bandset", "band", "tile_x", "tile_y", "cell_key"
    )
    joined = spans.join(F.broadcast(tiles), ["bandset", "band", "tile_x", "tile_y"])
    counts = joined.groupBy("bandset", "band").agg(
        F.count("*").alias("n_spans"),
        F.approx_count_distinct("doc_id").alias("n_docs_approx"),
    )
    return (
        counts.writeStream.outputMode("complete")
        .format("memory")
        .queryName("tile_assignments")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def tail_snapshots(spark: SparkSession, table_dir: str, state_dir: str,
                   process) -> dict | None:
    """One catch-up step over a snapshot table (sources/snapshots.py):
    read the data files appended since the last processed snapshot
    (compaction-aware — ``replace`` snapshots deliver nothing), run
    ``process(df)`` (must fully materialize its sink before returning),
    then atomically advance the high-water snapshot id. Returns
    ``{"from", "to", "rows"}`` or None when caught up.

    At-least-once: a crash after ``process`` but before the state swap
    reprocesses the same increment on the next call, so sinks must be
    idempotent per increment — the CheckpointManager's dynamic
    partition overwrite (checkpoint.py) is the intended pairing. The
    state file is the streaming twin of its lineage snapshot_id."""
    import json
    import os

    from remotior_sensus_spark.sources import snapshots as sn

    os.makedirs(state_dir, exist_ok=True)
    state_path = os.path.join(state_dir, "snapshot_tail.json")
    last = 0
    if os.path.exists(state_path):
        with open(state_path) as f:
            last = json.load(f)["snapshot"]
    current = sn.current_version(table_dir)
    if current == last:
        return None
    df = sn.read_incremental(spark, table_dir, from_snapshot=last,
                             to_snapshot=current)
    rows = 0
    if df is not None:
        out = process(df)
        # force full materialization before the watermark advances; a
        # process that returns None materialized its own sink (the
        # documented contract), so don't pay a second full scan of the
        # increment just to count rows
        rows = out.count() if out is not None else None
    tmp = state_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"snapshot": current, "table": table_dir,
                   "rows_last_increment": rows}, f)
    os.replace(tmp, state_path)
    return {"from": last, "to": current, "rows": rows}
