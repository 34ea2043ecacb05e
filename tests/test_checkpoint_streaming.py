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


def test_windowed_watermark_stream_matches_batch(spark, tmp_path):
    """Watermarked tumbling-window agg: append mode emits exactly the
    windows the final watermark has closed, and every emitted row equals
    the batch result for that (window, event_type) key."""
    from pyspark.sql import functions as F

    from remotior_sensus_spark.streaming.windowed import (
        windowed_counts_stream,
        windowed_event_counts,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    events_dir = str(tmp_path / "events_in")
    ev.write.parquet(events_dir)

    q = windowed_counts_stream(spark, events_dir, str(tmp_path / "ckpt"),
                               window="1 hour", delay="2 hours",
                               queryName="win_test")
    q.awaitTermination(120)
    got = spark.sql("select * from win_test").toPandas()
    batch = windowed_event_counts(ev, "1 hour").toPandas()

    key = ["window_start_s", "event_type"]
    gk = got.set_index(key).sort_index()
    bk = batch.set_index(key).sort_index()
    # every streamed row is final and equals the batch row
    assert len(gk) > 0
    for idx, row in gk.iterrows():
        brow = bk.loc[idx]
        assert int(row["n_events"]) == int(brow["n_events"]), idx
        assert int(row["sum_value_fp"]) == int(brow["sum_value_fp"]), idx
    # the only batch windows the stream may omit are the final ones the
    # watermark (max_ts - 2h) never closed
    import pandas as pd
    max_ts = pd.Timestamp(ev.agg(F.max("ts")).collect()[0][0])
    wm_s = max_ts.value // 10**9 - 2 * 3600
    missing = bk.index.difference(gk.index)
    for ws, _ in missing:
        assert ws + 3600 > wm_s - 3600, (ws, wm_s)


def test_asof_join_tolerance_and_semantics(spark):
    """asof_join: latest right at-or-before left per key; equal-ts right
    row IS matched; tolerance nulls out stale matches."""
    import datetime as dt

    from remotior_sensus_spark.operators.tables import asof_join

    def t(s):
        return dt.datetime(2024, 1, 1, 0, 0, s)

    left = spark.createDataFrame(
        [(1, 100, t(10)), (1, 101, t(30)), (2, 102, t(5))],
        "k int, lid int, ts timestamp")
    right = spark.createDataFrame(
        [(1, 7, t(10), 1.5),   # equal-ts: visible to lid=100
         (1, 8, t(20), 2.5),   # latest before lid=101
         (1, 9, t(20), 3.5),   # same ts as rid=8 -> larger rid wins
         (2, 10, t(1), 4.5)],
        "k int, rid int, ts timestamp, v double")
    out = asof_join(left, right, on="k", ts="ts",
                    right_cols=["rid", "v"]).toPandas().set_index("lid")
    assert int(out.loc[100, "asof_rid"]) == 7
    assert float(out.loc[100, "asof_v"]) == 1.5
    assert int(out.loc[100, "asof_gap_us"]) == 0
    assert int(out.loc[101, "asof_rid"]) == 9  # tie -> last in rid order
    assert int(out.loc[101, "asof_gap_us"]) == 10 * 10**6
    assert int(out.loc[102, "asof_rid"]) == 10

    tol = asof_join(left, right, on="k", ts="ts", right_cols=["rid", "v"],
                    tolerance_us=5 * 10**6).toPandas().set_index("lid")
    assert int(tol.loc[100, "asof_rid"]) == 7      # gap 0 <= 5s
    assert tol.loc[101, "asof_rid"] != tol.loc[101, "asof_rid"] or \
        tol.loc[101, ["asof_rid"]].isna().all()    # gap 10s > 5s -> null
    assert int(tol.loc[102, "asof_rid"]) == 10     # gap 4s <= 5s


def test_stream_dedup_within_watermark_matches_batch(spark, tmp_path):
    """dropDuplicatesWithinWatermark over an ingest stream with injected
    duplicate event_ids keeps exactly one row per id (all duplicates
    land within the delay), matching batch dropDuplicates."""
    from remotior_sensus_spark.streaming.dedup_stream import dedup_stream

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    # replay ~20% of events (a retried micro-batch): same ids, same ts
    dupes = ev.filter(F.col("event_id") % 5 == 0)
    events_dir = str(tmp_path / "events_in")
    ev.unionAll(dupes).write.parquet(events_dir)

    q = dedup_stream(spark, events_dir, str(tmp_path / "ckpt"),
                     delay="1 hour", queryName="dedup_test")
    q.awaitTermination(120)
    got = spark.sql("select * from dedup_test").toPandas()

    n_ids = ev.select("event_id").distinct().count()
    assert len(got) == n_ids
    assert got["event_id"].is_unique


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """Watermarked stream-stream join emits exactly the pairs the batch
    bucketed interval_join produces on the same events (inner join emits
    every match; the watermark only bounds state, never drops matches
    under AvailableNow where all data is within the final watermark's
    replay)."""
    from remotior_sensus_spark.operators.tables import interval_join
    from remotior_sensus_spark.streaming.stream_join import (
        error_click_pairs_stream,
        split_error_click,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    events_dir = str(tmp_path / "events_in")
    ev.write.parquet(events_dir)

    q = error_click_pairs_stream(spark, events_dir, str(tmp_path / "ckpt"),
                                 horizon_s=7200, delay="30 minutes",
                                 queryName="ssj_test")
    q.awaitTermination(120)
    got = spark.sql("select * from ssj_test").toPandas()

    errors, clicks = split_error_click(ev)
    # batch twin via the bucketed interval_join (its contract is one
    # shared key column name, so rename both sides to it first)
    batch = interval_join(
        clicks.withColumnRenamed("c_user", "k"),
        errors.withColumnRenamed("e_user", "k").withColumn(
            "ets_end", F.col("ets") + F.expr("interval 7200 seconds")),
        key="k", point_ts="cts", istart="ets", iend="ets_end",
        bucket_s=3600,
    ).select(F.col("k").alias("user_id"), "error_id", "click_id").toPandas()

    key = ["user_id", "error_id", "click_id"]
    g = got[key].sort_values(key).reset_index(drop=True)
    b = batch[key].sort_values(key).reset_index(drop=True)
    assert len(b) > 0
    assert g.equals(b)


def test_interval_join_buckets_and_bounds(spark):
    """interval_join: inclusive bounds, bucket-straddling intervals meet
    their points exactly once, disjoint keys never match."""
    import datetime as dt

    from remotior_sensus_spark.operators.tables import interval_join

    def t(s):
        return dt.datetime(2024, 1, 1, 0, 0, s)

    # bucket_s=10: interval [5, 25] straddles buckets 0,1,2
    points = spark.createDataFrame(
        [(1, 100, t(5)),    # == start: inclusive
         (1, 101, t(15)),   # mid, different bucket than start
         (1, 102, t(25)),   # == end: inclusive
         (1, 103, t(26)),   # past end
         (2, 104, t(15))],  # other key
        "k int, pid int, pts timestamp")
    iv = spark.createDataFrame(
        [(1, 7, t(5), t(25))], "k int, iid int, t0 timestamp, t1 timestamp")
    out = interval_join(points, iv, key="k", point_ts="pts",
                        istart="t0", iend="t1", bucket_s=10).toPandas()
    assert sorted(out["pid"]) == [100, 101, 102]
    # exactly once each (no dup from the 3-bucket explosion)
    assert len(out) == 3


def test_stateful_funnel_matches_batch_any_order(spark, tmp_path):
    """applyInPandasWithState funnel: state carries the step-relevant
    event history and every micro-batch recomputes the greedy scan, so
    the result is EXACT under any arrival order — proven here by
    feeding the files one per micro-batch in reverse time order and
    asserting the per-stage user histogram equals the batch funnel."""
    from pyspark.sql import functions as F

    from remotior_sensus_spark.operators.events import funnel_stages
    from remotior_sensus_spark.streaming.funnel_stream import funnel_stream

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    events_dir = str(tmp_path / "events_in")
    # three time-sliced files written NEWEST FIRST so modification-time
    # discovery order is adversarial to event-time order
    import time
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    lo, hi = ev.agg(F.min(us), F.max(us)).first()
    c1 = lo + (hi - lo) // 3
    c2 = lo + 2 * (hi - lo) // 3
    slices = [
        ev.filter(us > c2),
        ev.filter((us > c1) & (us <= c2)),
        ev.filter(us <= c1),
    ]
    import os
    os.makedirs(events_dir)
    for i, sl in enumerate(slices):
        sl.coalesce(1).write.parquet(f"{events_dir}/slice={i}")
        time.sleep(1.1)  # distinct mtimes -> deterministic file order
    q = funnel_stream(spark, f"{events_dir}/slice=*",
                      str(tmp_path / "ckpt"), queryName="funnel_test")
    q.awaitTermination(180)
    got = (
        spark.sql("select user_id, max(stage) as stage from funnel_test "
                  "group by user_id")
        .groupBy("stage").agg(F.count("*").alias("n_users"))
        .toPandas().set_index("stage")["n_users"].to_dict()
    )
    batch = (
        funnel_stages(ev).toPandas().set_index("stage")["n_users"].to_dict()
    )
    # the stream never sees users whose events are all non-step types;
    # the batch counts them at stage 0 — reconcile
    batch_nonzero = {k: v for k, v in batch.items() if k != 0}
    got_nonzero = {k: v for k, v in got.items() if k != 0}
    assert got_nonzero == batch_nonzero
    assert got.get(0, 0) <= batch.get(0, 0)
