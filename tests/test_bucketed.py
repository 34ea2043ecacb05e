"""Bucketed-table co-located joins: same-key same-count bucketed tables
join with ZERO Exchange operators and identical results to the plain
shuffle join."""

import pytest
from pyspark.sql import functions as F

from remotior_sensus_spark.sources.bucketed import (
    colocated_join,
    shuffle_count,
    write_bucketed,
    write_partitioned,
)


@pytest.fixture()
def bucket_db(spark, tmp_path):
    spark.sql(f"create database if not exists bkt location '{tmp_path}/wh'")
    yield "bkt"
    spark.sql("drop database bkt cascade")


def test_bucketed_join_is_shuffle_free_and_correct(spark, tmp_path,
                                                   bucket_db, sf001_dir):
    od = spark.read.parquet(f"{sf001_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf001_dir}/lineitem.parquet")
    write_bucketed(od, "bkt.orders_b", "o_orderkey", 8,
                   str(tmp_path / "orders_b"))
    write_bucketed(li.withColumnRenamed("l_orderkey", "o_orderkey"),
                   "bkt.lineitem_b", "o_orderkey", 8,
                   str(tmp_path / "lineitem_b"))

    # at sf0.001 the planner would broadcast instead; disable it so the
    # plan under test is the sort-merge join a 100 TB fact-fact join gets
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = colocated_join(spark, "bkt.orders_b", "bkt.lineitem_b",
                           "o_orderkey")
        agg = j.groupBy("o_orderpriority").agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity").cast("long")).alias("q"))

        # the join itself introduces no Exchange; the only shuffle in
        # the whole job is the final small aggregation
        assert shuffle_count(j) == 0
        assert "SortMergeJoin" in \
            j._jdf.queryExecution().executedPlan().toString()
        assert shuffle_count(agg) == 1

        plain = (od.join(li, od["o_orderkey"] == li["l_orderkey"])
                 .groupBy("o_orderpriority")
                 .agg(F.count("*").alias("n"),
                      F.sum(F.col("l_quantity").cast("long")).alias("q")))
        assert shuffle_count(plain) >= 3  # two join shuffles + agg
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    key = "o_orderpriority"
    got = agg.toPandas().set_index(key).sort_index()
    exp = plain.toPandas().set_index(key).sort_index()
    assert got["n"].to_dict() == exp["n"].to_dict()
    assert got["q"].to_dict() == exp["q"].to_dict()


def test_partitioned_layout_prunes_at_planning_time(spark, tmp_path,
                                                    sf001_dir):
    """A filter on the partition key reaches the scan as a
    PartitionFilter and the job reads only the matching directories'
    files — planning-time pruning, not row-group skipping."""
    ev = spark.read.parquet(f"{sf001_dir}/events.parquet")
    path = str(tmp_path / "events_by_type")
    write_partitioned(ev, path, "event_type")

    back = spark.read.parquet(path)
    one = back.filter(F.col("event_type") == "error")
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "event_type" in \
        plan.split("PartitionFilters")[1].split("]")[0]

    # execute THIS dataset, then read its scan's metrics: the job
    # touched one partition directory's file, not all five
    rows = one.collect()
    scan = one._jdf.queryExecution().executedPlan().collectLeaves().apply(0)
    metrics = scan.metrics()
    assert metrics.apply("numPartitions").value() == 1
    assert metrics.apply("numFiles").value() < len(back.inputFiles())
    # values survive the layout round-trip
    assert len(rows) == ev.filter(F.col("event_type") == "error").count()


def test_bucket_mismatch_still_correct(spark, tmp_path, bucket_db, sf001_dir):
    """Different bucket counts: Spark falls back to shuffling (at most
    one side if counts are compatible) — results stay identical."""
    od = spark.read.parquet(f"{sf001_dir}/orders.parquet")
    write_bucketed(od, "bkt.orders_b8", "o_orderkey", 8,
                   str(tmp_path / "b8"))
    write_bucketed(od.select("o_orderkey", "o_totalprice"),
                   "bkt.orders_b4", "o_orderkey", 4, str(tmp_path / "b4"))
    j = colocated_join(spark, "bkt.orders_b8", "bkt.orders_b4", "o_orderkey")
    assert j.count() == od.count()
