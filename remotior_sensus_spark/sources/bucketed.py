"""Bucketed-table writes for shuffle-free co-located joins.

The reference re-reads flat files per run; at 100 TB the dominant cost
of every fact-fact join (orders⨝lineitem, tile⨝tile) is the shuffle
of both sides onto the join key. Spark's bucketing moves that shuffle
to WRITE time, once: a table saved with `bucketBy(n, key)` is laid out
so every bucket file holds exactly the keys that hash to it, and a
join between two tables bucketed on the same key with the same bucket
count compiles to a sort-merge join with NO Exchange on either side —
the scan itself reports the bucket spec as its output partitioning.
`sortBy(key)` additionally pre-sorts each bucket so the merge needs no
per-task sort.

This is the persistent-table twin of operators/spatial_join's
repartition strategies: use repartition for one-shot pipelines,
bucketing for tables joined repeatedly on a stable key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str, n_buckets: int,
                   path: str, sort: bool = True) -> None:
    """Save `df` as a parquet table bucketed (and by default per-bucket
    sorted) on `key`. `table` may be database-qualified; `path` is the
    external location so test/temp warehouses never leak into the repo.
    Both sides of a co-located join must use the SAME n_buckets."""
    w = df.write.format("parquet").mode("overwrite").option("path", path)
    if sort:
        w = w.bucketBy(n_buckets, key).sortBy(key)
    else:
        w = w.bucketBy(n_buckets, key)
    w.saveAsTable(table)


def colocated_join(spark: SparkSession, left_table: str, right_table: str,
                   key: str, how: str = "inner") -> DataFrame:
    """Join two same-key same-bucket-count tables. With bucketing
    enabled (spark.sql.sources.bucketing.enabled, default true) the
    planner sees both scans already hash-partitioned on `key` and emits
    a sort-merge join with zero Exchange operators — verify with
    shuffle_count() == 0."""
    return spark.table(left_table).join(spark.table(right_table), key, how)


def write_partitioned(df: DataFrame, path: str, *keys: str) -> None:
    """Directory-partitioned parquet layout (`path/key=value/...`).
    Partition values live in directory names, not row groups, so a
    filter on a partition key prunes whole directories at PLANNING time
    (the scan's PartitionFilters) — at 100 TB a day-partitioned events
    table turns a one-day query into a one-directory read before a
    single byte is fetched. Partition by low-cardinality keys only
    (date, source, class): high-cardinality partitioning explodes the
    file count and kills the driver's listing phase — that's what
    bucketing (write_bucketed) is for."""
    df.write.mode("overwrite").partitionBy(*keys).parquet(path)


def shuffle_count(df: DataFrame) -> int:
    """Number of Exchange (shuffle) operators in the EXECUTED physical
    plan — the honest metric for 'did bucketing remove the shuffle'
    (string-counted because PySpark exposes no plan-tree walk)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1 for ln in plan.splitlines()
        if "Exchange" in ln
        # broadcasts replicate one small side, they do not shuffle;
        # reuse reads an exchange already counted once
        and "BroadcastExchange" not in ln and "ReusedExchange" not in ln)
