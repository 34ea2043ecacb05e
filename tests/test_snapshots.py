"""Snapshot-manifest table tests: append/commit atomicity, time travel,
incremental reads, orphan invisibility."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from remotior_sensus_spark.sources import snapshots as sn


def test_append_read_time_travel(spark, tmp_path):
    t = str(tmp_path / "tbl")
    d1 = spark.range(10).withColumn("v", F.col("id") * 2)
    m1 = sn.append_snapshot(d1, t)
    assert m1["version"] == 1 and m1["row_count"] == 10

    d2 = spark.range(10, 15).withColumn("v", F.col("id") * 2)
    m2 = sn.append_snapshot(d2, t)
    assert m2["version"] == 2 and m2["row_count"] == 15

    assert sn.read_snapshot(spark, t).count() == 15
    assert sn.read_snapshot(spark, t, snapshot=1).count() == 10
    got = sorted(r["id"] for r in sn.read_snapshot(spark, t).collect())
    assert got == list(range(15))


def test_incremental_read(spark, tmp_path):
    t = str(tmp_path / "tbl")
    sn.append_snapshot(spark.range(5), t)
    sn.append_snapshot(spark.range(5, 9), t)
    sn.append_snapshot(spark.range(9, 12), t)

    inc = sn.read_incremental(spark, t, from_snapshot=1)
    assert sorted(r["id"] for r in inc.collect()) == list(range(5, 12))
    inc12 = sn.read_incremental(spark, t, from_snapshot=1, to_snapshot=2)
    assert sorted(r["id"] for r in inc12.collect()) == list(range(5, 9))
    assert sn.read_incremental(spark, t, from_snapshot=3) is None


def test_uncommitted_files_invisible(spark, tmp_path):
    t = str(tmp_path / "tbl")
    sn.append_snapshot(spark.range(7), t)
    # simulate a crashed append: data file exists but no manifest points
    # at it -> readers must not see it
    orphan = os.path.join(t, "data", "part-orphan.parquet")
    spark.range(100, 200).write.mode("overwrite").parquet(str(tmp_path / "o"))
    src = next(f for f in os.listdir(str(tmp_path / "o"))
               if f.endswith(".parquet"))
    os.rename(str(tmp_path / "o" / src), orphan)
    assert sn.read_snapshot(spark, t).count() == 7


def test_orphan_manifest_does_not_wedge(spark, tmp_path):
    """A manifest left by a writer that crashed before its VERSION swap
    must not block future appends (the committer skips to a free slot),
    and explicit time travel to the orphan is rejected."""
    import json
    import pytest

    t = str(tmp_path / "tbl")
    sn.append_snapshot(spark.range(5), t)
    orphan = {"version": 2, "parent": 1, "ts": 0,
              "files": ["data/ghost.parquet"], "added_files": [],
              "row_count": 99}
    with open(os.path.join(t, "snapshots", "v000002.json"), "w") as f:
        json.dump(orphan, f)

    m = sn.append_snapshot(spark.range(5, 8), t)
    assert m["version"] == 3 and m["parent"] == 1
    assert sn.read_snapshot(spark, t).count() == 8
    with pytest.raises(FileNotFoundError):
        sn.read_snapshot(spark, t, snapshot=2)


def test_stale_commit_lock_is_broken(spark, tmp_path):
    """A lock file abandoned by a crashed committer must not block
    appends forever: past stale_sec it is broken (exactly one breaker
    wins the rename) and the append proceeds."""
    t = str(tmp_path / "tbl")
    sn.append_snapshot(spark.range(3), t)
    lock = os.path.join(t, "_commit.lock")
    with open(lock, "w") as f:
        f.write("99999:dead")
    os.utime(lock, (time.time() - 3600, time.time() - 3600))
    m = sn.append_snapshot(spark.range(3, 5), t)
    assert m["row_count"] == 5
    assert not os.path.exists(lock)
    assert not [f for f in os.listdir(t) if ".broken." in f]


def test_live_commit_lock_blocks_until_timeout(tmp_path):
    """A FRESH lock (live holder) blocks; the waiter times out rather
    than stealing it — and release is ownership-checked: a holder whose
    lock was broken and re-acquired by someone else must not unlink the
    new holder's lock."""
    import pytest

    t = str(tmp_path / "tbl")
    os.makedirs(t, exist_ok=True)
    with sn._commit_lock(t):
        with pytest.raises(TimeoutError):
            sn._commit_lock(t, timeout_sec=0.2).__enter__()

    # ownership check: A acquires, B breaks + re-acquires, A's exit
    # must leave B's lock in place
    a = sn._commit_lock(t)
    a.__enter__()
    lock = os.path.join(t, "_commit.lock")
    os.utime(lock, (time.time() - 3600, time.time() - 3600))  # age it
    b = sn._commit_lock(t)
    b.__enter__()  # breaks the stale lock, takes ownership
    a.__exit__(None, None, None)  # must NOT delete b's lock
    assert os.path.exists(lock)
    b.__exit__(None, None, None)
    assert not os.path.exists(lock)


def test_compact_snapshot_binpacks_preserves_content(spark, tmp_path):
    """Compaction rewrites the small files into fewer ones, keeps table
    contents and row_count identical, and leaves pre-compaction time
    travel intact."""
    t = str(tmp_path / "tbl")
    for lo, hi in [(0, 5), (5, 9), (9, 12), (12, 20)]:
        sn.append_snapshot(spark.range(lo, hi).coalesce(1), t)
    before = sn.read_manifest(t)
    assert len(before["files"]) == 4

    m = sn.compact_snapshot(spark, t)  # every file is tiny -> one bin
    assert m["operation"] == "replace"
    assert m["row_count"] == before["row_count"] == 20
    assert len(m["files"]) == 1
    assert sorted(m["removed_files"]) == sorted(before["files"])
    got = sorted(r["id"] for r in sn.read_snapshot(spark, t).collect())
    assert got == list(range(20))
    # time travel to a pre-compaction snapshot still resolves old files
    assert sn.read_snapshot(spark, t, snapshot=2).count() == 9
    # an already-compacted table is a no-op (same manifest back)
    assert sn.compact_snapshot(spark, t)["version"] == m["version"]


def test_incremental_skips_replace_snapshots(spark, tmp_path):
    """An incremental consumer that already saw the appends must get
    NOTHING from a compaction commit (no logical data change), and an
    append after the compaction is delivered normally."""
    t = str(tmp_path / "tbl")
    sn.append_snapshot(spark.range(5).coalesce(1), t)
    sn.append_snapshot(spark.range(5, 9).coalesce(1), t)
    mc = sn.compact_snapshot(spark, t)
    assert mc["operation"] == "replace"
    assert sn.read_incremental(spark, t, from_snapshot=2) is None
    sn.append_snapshot(spark.range(9, 11).coalesce(1), t)
    inc = sn.read_incremental(spark, t, from_snapshot=2)
    assert sorted(r["id"] for r in inc.collect()) == [9, 10]
    # a consumer starting BEFORE the compaction gets the appends' own
    # files (not the compacted copies): append2 + append4
    inc1 = sn.read_incremental(spark, t, from_snapshot=1)
    assert sorted(r["id"] for r in inc1.collect()) == list(range(5, 11))


def test_expire_snapshots_reclaims_only_dead_files(spark, tmp_path):
    """Expiry deletes files referenced only by expired snapshots (the
    small pre-compaction parts), keeps the live snapshot readable, and
    makes time travel to expired ids fail cleanly."""
    import pytest

    t = str(tmp_path / "tbl")
    sn.append_snapshot(spark.range(6).coalesce(1), t)
    sn.append_snapshot(spark.range(6, 10).coalesce(1), t)
    sn.compact_snapshot(spark, t)
    n_files_before = len(os.listdir(os.path.join(t, "data")))
    res = sn.expire_snapshots(t, keep_last=1)
    assert sorted(res["expired"]) == [1, 2]
    assert res["deleted_files"] == 2  # the two pre-compaction parts
    assert len(os.listdir(os.path.join(t, "data"))) == n_files_before - 2
    got = sorted(r["id"] for r in sn.read_snapshot(spark, t).collect())
    assert got == list(range(10))
    with pytest.raises(FileNotFoundError):
        sn.read_snapshot(spark, t, snapshot=1)
    with pytest.raises(FileNotFoundError):
        sn.read_incremental(spark, t, from_snapshot=1)
    # appends continue normally after expiry
    m = sn.append_snapshot(spark.range(10, 12).coalesce(1), t)
    assert sn.read_snapshot(spark, t).count() == 12 and m["row_count"] == 12


def test_compact_concurrent_append_is_carried(spark, tmp_path):
    """An append that lands between the rewrite and the commit is kept:
    compaction rebases on the committed manifest under the lock."""
    t = str(tmp_path / "tbl")
    sn.append_snapshot(spark.range(4).coalesce(1), t)
    sn.append_snapshot(spark.range(4, 7).coalesce(1), t)

    orig_lock = sn._commit_lock.__enter__

    def racing_enter(self):
        # fire exactly once, before the compactor takes the lock
        if not getattr(racing_enter, "fired", False):
            racing_enter.fired = True
            sn.append_snapshot(spark.range(7, 9).coalesce(1), t)
        return orig_lock(self)

    sn._commit_lock.__enter__ = racing_enter
    try:
        m = sn.compact_snapshot(spark, t)
    finally:
        sn._commit_lock.__enter__ = orig_lock
    assert m["row_count"] == 9
    got = sorted(r["id"] for r in sn.read_snapshot(spark, t).collect())
    assert got == list(range(9))


def test_tail_snapshots_catchup(spark, tmp_path):
    """Snapshot-tailing catch-up: each tail step processes exactly the
    appends since the last step, compaction delivers nothing, and a
    crash before the watermark swap replays the increment."""
    import pytest

    from remotior_sensus_spark.streaming.incremental import tail_snapshots

    t = str(tmp_path / "tbl")
    state = str(tmp_path / "state")
    seen: list[list[int]] = []

    def record(df):
        seen.append(sorted(r["id"] for r in df.collect()))
        return df

    sn.append_snapshot(spark.range(4).coalesce(1), t)
    r1 = tail_snapshots(spark, t, state, record)
    assert r1 == {"from": 0, "to": 1, "rows": 4} and seen[-1] == [0, 1, 2, 3]
    assert tail_snapshots(spark, t, state, record) is None  # caught up

    sn.append_snapshot(spark.range(4, 7).coalesce(1), t)
    sn.compact_snapshot(spark, t)
    r2 = tail_snapshots(spark, t, state, record)
    assert r2["rows"] == 3 and seen[-1] == [4, 5, 6]  # compaction invisible

    # crash between process and watermark swap -> increment replays
    sn.append_snapshot(spark.range(7, 9).coalesce(1), t)

    def crash(df):
        record(df)
        raise RuntimeError("sink died")

    with pytest.raises(RuntimeError):
        tail_snapshots(spark, t, state, crash)
    r3 = tail_snapshots(spark, t, state, record)
    assert r3["rows"] == 2 and seen[-1] == [7, 8] == seen[-2]


def test_incremental_inverted_range_raises(spark, tmp_path):
    """from_snapshot newer than to_snapshot must raise, not re-deliver
    the entire append history as 'new' (stale-ahead watermark, e.g. a
    VERSION restored from backup)."""
    import pytest

    t = str(tmp_path / "tbl")
    sn.append_snapshot(spark.range(3).coalesce(1), t)
    sn.append_snapshot(spark.range(3, 6).coalesce(1), t)
    sn.append_snapshot(spark.range(6, 8).coalesce(1), t)
    with pytest.raises(ValueError, match="not an ancestor"):
        sn.incremental_files(t, from_snapshot=3, to_snapshot=2)


def test_expire_records_before_deleting_and_is_idempotent(spark, tmp_path):
    """Expired ids are recorded BEFORE files are deleted (a crash
    in between leaves cleanly-failing snapshots plus reclaimable
    leftovers), repeat calls re-report nothing and reclaim only what
    actually remained."""
    import json
    import os as _os

    t = str(tmp_path / "tbl")
    sn.append_snapshot(spark.range(4).coalesce(1), t)
    sn.append_snapshot(spark.range(4, 7).coalesce(1), t)
    sn.compact_snapshot(spark, t)

    # simulate the crash window: expired ids recorded, files NOT yet
    # deleted (exactly the on-disk state after the json write)
    with open(_os.path.join(t, "expired.json"), "w") as f:
        json.dump([1], f)
    n_before = len(_os.listdir(_os.path.join(t, "data")))

    res = sn.expire_snapshots(t, keep_last=1)
    # v1 was already recorded -> only v2 newly expired; BOTH v1+v2
    # leftover files are still reclaimed by the idempotent sweep
    assert res["expired"] == [2]
    assert res["deleted_files"] == 2
    assert len(_os.listdir(_os.path.join(t, "data"))) == n_before - 2

    res2 = sn.expire_snapshots(t, keep_last=1)
    assert res2 == {"expired": [], "deleted_files": 0}
    assert sorted(r["id"] for r in sn.read_snapshot(spark, t).collect()) \
        == list(range(7))
