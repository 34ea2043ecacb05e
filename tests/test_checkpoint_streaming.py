import tempfile

from pyspark.sql import functions as F


def test_checkpoint_resume(spark, geo001_dir):
    from remotior_sensus_spark.checkpoint import CheckpointManager, snapshot_id

    tiles = spark.read.parquet(f"{geo001_dir}/tiles.parquet")
    df = tiles.filter(F.col("bandset") == "S2_2020-01-01").select(
        "cell_prefix", "band", "tile_x", "tile_y", "cell_key"
    )
    snap = snapshot_id(f"{geo001_dir}/tiles.parquet")
    with tempfile.TemporaryDirectory() as root:
        cm = CheckpointManager(spark, root)
        m1 = cm.run_stage(df, "tile_index", snap=snap)
        assert m1["partitions_skipped"] == 0
        assert m1["total_rows"] == df.count()
        # resume: everything already done -> nothing recomputed
        m2 = cm.run_stage(df, "tile_index", snap=snap)
        assert m2["partitions_skipped"] > 0
        assert m2["total_rows"] == df.count()  # no duplicate appends
        lin = cm.metrics("tile_index")
        assert lin.filter(F.col("row_count") <= 0).count() == 0
        # lineage covers every partition exactly once
        n_parts = df.select("cell_prefix").distinct().count()
        assert lin.select("partition_value").distinct().count() == n_parts


def test_streaming_incremental_matches_batch(spark, geo001_dir):
    from remotior_sensus_spark.streaming.incremental import stream_tile_assignments

    import shutil

    with tempfile.TemporaryDirectory() as ckpt, tempfile.TemporaryDirectory() as docs_dir:
        shutil.copy(f"{geo001_dir}/documents.parquet", f"{docs_dir}/part-0.parquet")
        q = stream_tile_assignments(
            spark, docs_dir, f"{geo001_dir}/tiles.parquet", ckpt
        )
        q.awaitTermination(120)
        got = {
            (r["bandset"], r["band"]): r["n_spans"]
            for r in spark.sql("select * from tile_assignments").collect()
        }
    from remotior_sensus_spark.operators.spatial_join import media_span_tiles

    docs = spark.read.parquet(f"{geo001_dir}/documents.parquet")
    tiles = spark.read.parquet(f"{geo001_dir}/tiles.parquet")
    exp = {
        (r["bandset"], r["band"]): r["n"]
        for r in media_span_tiles(docs, tiles, hot_threshold=10**9)
        .groupBy("bandset", "band")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == exp


def test_stateful_sessionize_matches_batch(spark, tmp_path):
    """applyInPandasWithState sessionization: closed sessions from the
    stream equal the batch count minus the one still-open session per
    user (AvailableNow never fires the idle timeout)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from remotior_sensus_spark.streaming.stateful import sessionize_stream

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    events_dir = str(tmp_path / "events_in")
    ev.write.parquet(events_dir)

    q = sessionize_stream(spark, events_dir, str(tmp_path / "ckpt"),
                          gap_s=1800, queryName="sess_test")
    q.awaitTermination(120)
    got = spark.sql(
        "select user_id, count(*) as closed from sess_test group by user_id"
    ).toPandas().set_index("user_id")["closed"]

    from pyspark.sql import Window
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lag_ts = F.lag("ts").over(w)
    new_s = F.when(
        lag_ts.isNull()
        | (F.unix_timestamp("ts") - F.unix_timestamp(lag_ts) > 1800), 1
    ).otherwise(0)
    batch = (
        ev.withColumn("s", new_s)
        .groupBy(F.col("user_id").cast("string").alias("user_id"))
        .agg(F.sum("s").alias("n_sessions"))
        .toPandas().set_index("user_id")["n_sessions"]
    )
    assert len(batch) > 0
    for user, n in batch.items():
        assert got.get(user, 0) == n - 1, user
