"""Per-partition checkpoint / lineage / metrics layer (north_rule:
"resumable from per-partition checkpoints carrying lineage (input
snapshot id, cell range, row counts) and per-stage metrics").

The reference has NO checkpointing (a failed run restarts —
configurations.py:41 only supports cancel). This layer is new surface:

  * every stage writes its output parquet partitioned by a partition
    column (cell_prefix for tile stages)
  * a lineage table records one row per completed partition:
    (stage, snapshot_id, partition_value, row_count, wall_ms)
  * resume = anti-join the input's partitions against completed lineage
    rows, recompute only the rest, append

Written as plain parquet with an Iceberg-ready layout (the DDL would be
`CREATE TABLE ... PARTITIONED BY (cell_prefix)`; snapshot_id plays the
role of Iceberg's snapshot lineage in the sandbox — SURVEY §7.3 risk 7).
"""

from __future__ import annotations

import hashlib
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def snapshot_id(*input_paths: str) -> str:
    """Deterministic id of the input state (paths + sizes + mtimes)."""
    h = hashlib.sha256()
    for p in sorted(input_paths):
        st = os.stat(p)
        # nanosecond mtime: whole-second truncation let a same-size
        # rewrite within one second collide, silently serving stale
        # resume data
        h.update(f"{p}:{st.st_size}:{st.st_mtime_ns}".encode())
    return h.hexdigest()[:16]


class CheckpointManager:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _lineage_dir(self, stage: str) -> str:
        return f"{self.root}/_lineage/{stage}"

    def _data_dir(self, stage: str, snap: str | None = None) -> str:
        base = f"{self.root}/{stage}"
        return base if snap is None else f"{base}/snap={snap}"

    def completed_partitions(self, stage: str, snap: str) -> DataFrame | None:
        d = self._lineage_dir(stage)
        try:
            lin = self.spark.read.parquet(d)
        except Exception:
            return None
        return lin.filter(F.col("snapshot_id") == snap).select("partition_value").distinct()

    def run_stage(
        self,
        df: DataFrame,
        stage: str,
        *,
        snap: str,
        partition_col: str = "cell_prefix",
    ) -> dict:
        """Compute + persist only partitions not already completed for
        this snapshot; append lineage + metrics. Returns a metrics dict."""
        t0 = time.time()
        done = self.completed_partitions(stage, snap)
        pending = df
        skipped = 0
        if done is not None and done.head(1):
            pending = df.join(
                done.withColumnRenamed("partition_value", partition_col),
                partition_col,
                "left_anti",
            )
            skipped = done.count()
        # crash-atomic resume: data lives under a per-snapshot directory
        # (no stale-snapshot mixing) and partitions are DYNAMICALLY
        # OVERWRITTEN — a crash between the data write and the lineage
        # append makes the next run recompute-and-replace those
        # partitions instead of appending duplicates.
        out_dir = self._data_dir(stage, snap)
        (
            pending.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(partition_col)
            .parquet(out_dir)
        )
        wall_ms = int((time.time() - t0) * 1000)
        # lineage derives from what was actually PERSISTED (read-back),
        # not from re-evaluating the stage DAG — a nondeterministic
        # upstream can't desync the resume metadata.
        written = self.spark.read.parquet(out_dir)
        new_parts = written.groupBy(partition_col).agg(
            F.count("*").alias("row_count")
        )
        if done is not None and done.head(1):
            new_parts = new_parts.join(
                done.withColumnRenamed("partition_value", partition_col),
                partition_col,
                "left_anti",
            )
        lineage = new_parts.select(
            F.lit(stage).alias("stage"),
            F.lit(snap).alias("snapshot_id"),
            F.col(partition_col).cast("long").alias("partition_value"),
            "row_count",
            F.lit(wall_ms).alias("wall_ms"),
        )
        lineage.write.mode("append").parquet(self._lineage_dir(stage))
        return {
            "stage": stage,
            "snapshot_id": snap,
            "partitions_skipped": skipped,
            "wall_ms": wall_ms,
            "total_rows": written.count(),
        }

    def read_stage(self, stage: str, snap: str) -> DataFrame:
        """Current output of a stage for a given input snapshot."""
        return self.spark.read.parquet(self._data_dir(stage, snap))

    def metrics(self, stage: str) -> DataFrame:
        return self.spark.read.parquet(self._lineage_dir(stage))
