"""Snapshot-manifest table layout: a minimal Iceberg-style table on
plain parquet (the north_rule's input is "an Iceberg table of
interleaved text + media documents"; no Iceberg runtime ships in this
sandbox, so the snapshot/manifest mechanics it relies on — atomic
commits by manifest swap, time travel, incremental appends — are
provided by this module over the same directory-of-parquet layout the
rest of the engine reads).

Layout of a snapshot table directory::

    table/
      data/part-<uuid>.parquet        immutable data files
      snapshots/v<NNN>.json           manifest: list of data files + meta
      VERSION                         current snapshot number (atomic ptr)

Semantics mirrored from the Iceberg spec (public docs):
  * a reader resolves VERSION -> manifest -> explicit file list, so
    concurrent appends never produce torn reads (files not in the
    manifest are invisible);
  * append = write new data files, write manifest v(N+1) including old
    + new files, atomically replace VERSION (os.replace);
  * time travel = read any older manifest by snapshot id;
  * incremental read between two snapshots = the file-list difference —
    this feeds streaming/incremental.py's catch-up pattern without
    reprocessing old files.

The reference has no table format at all (GDAL rasters on disk); this
is new engine surface for the 10^12-doc ingestion story.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


def _manifest_path(table_dir: str, version: int) -> str:
    return os.path.join(table_dir, "snapshots", f"v{version:06d}.json")


def _next_free_version(table_dir: str) -> int:
    """First version slot above both the committed pointer and any
    existing manifest file (orphans included)."""
    import re as _re
    snaps = os.path.join(table_dir, "snapshots")
    existing = [
        int(m.group(1))
        for f in (os.listdir(snaps) if os.path.isdir(snaps) else [])
        if (m := _re.fullmatch(r"v(\d{6})\.json", f))
    ]
    return max([current_version(table_dir), *existing], default=0) + 1


def committed_versions(table_dir: str) -> list[int]:
    """Snapshot ids on the committed parent chain (newest first) — an
    orphan manifest from a crashed writer is NOT in this list."""
    out = []
    v = current_version(table_dir)
    while v:
        out.append(v)
        v = read_manifest(table_dir, v).get("parent") or 0
    return out


def current_version(table_dir: str) -> int:
    vp = os.path.join(table_dir, "VERSION")
    if not os.path.exists(vp):
        return 0
    with open(vp) as f:
        return int(f.read().strip())


def read_manifest(table_dir: str, snapshot: int | None = None) -> dict:
    v = snapshot if snapshot is not None else current_version(table_dir)
    if v == 0:
        return {"version": 0, "files": [], "row_count": 0}
    with open(_manifest_path(table_dir, v)) as f:
        return json.load(f)


def append_snapshot(df: DataFrame, table_dir: str) -> dict:
    """Append `df` as a new snapshot: new immutable data files + a new
    manifest listing old+new, then an atomic VERSION swap. Returns the
    new manifest. Crash-safe: a failure before the VERSION replace
    leaves orphan data files that no manifest references (invisible to
    readers, reclaimable by a GC pass) — the manifest-swap commit
    protocol of the Iceberg spec."""
    new_files = _write_staged(df, table_dir)
    spark = df.sparkSession
    added_rows = (
        spark.read.parquet(*[os.path.join(table_dir, f) for f in new_files]
                           ).count() if new_files else 0
    )
    # Commit = manifest write + VERSION swap, serialized under an O_EXCL
    # lock file so two interleaved committers can never both build on
    # the same parent (a claim-only O_EXCL on the version slot is not
    # enough: writer B could scan while A's manifest exists but before
    # A's VERSION swap, claim the next slot with no FileExistsError, and
    # its monotonic swap would orphan A's committed files). Under the
    # lock, the manifest always builds on the CURRENT committed state,
    # the version slot is max(committed, any orphan manifest)+1 so a
    # crashed writer's orphan never wedges the append, and the VERSION
    # swap is trivially monotonic. Data-file writes stay outside the
    # lock — only the metadata commit is serialized (the Iceberg commit
    # protocol narrowed to its atomic section).
    with _commit_lock(table_dir):
        prev = read_manifest(table_dir)
        manifest = _commit_manifest(table_dir, {
            "parent": prev["version"] or None,
            "operation": "append",
            "files": prev["files"] + new_files,
            "added_files": new_files,
            "row_count": prev["row_count"] + added_rows,
        })
    return manifest


def _write_staged(df: DataFrame, table_dir: str) -> list[str]:
    """Write ``df`` to a staging dir and move the parquet parts into
    data/ under immutable unique names. The single staging/move path for
    every commit kind (append AND compaction rewrite) — a protocol fix
    here cannot fork the two."""
    data_dir = os.path.join(table_dir, "data")
    os.makedirs(data_dir, exist_ok=True)
    os.makedirs(os.path.join(table_dir, "snapshots"), exist_ok=True)
    staging = os.path.join(table_dir, f"_stage_{uuid.uuid4().hex}")
    df.write.mode("overwrite").parquet(staging)
    new_files = []
    for f in sorted(os.listdir(staging)):
        if not f.endswith(".parquet"):
            continue
        dst = f"part-{uuid.uuid4().hex}.parquet"
        os.replace(os.path.join(staging, f), os.path.join(data_dir, dst))
        new_files.append(f"data/{dst}")
    for f in os.listdir(staging):
        os.remove(os.path.join(staging, f))
    os.rmdir(staging)
    return new_files


def _commit_manifest(table_dir: str, fields: dict) -> dict:
    """The atomic metadata commit: next free version slot, O_EXCL
    manifest write, tmp+rename VERSION swap. MUST be called under
    _commit_lock. Single implementation shared by append and
    compaction so the commit protocol cannot fork."""
    version = _next_free_version(table_dir)
    manifest = {"version": version, "ts": time.time(), **fields}
    fd = os.open(_manifest_path(table_dir, version),
                 os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    with os.fdopen(fd, "w") as f:
        json.dump(manifest, f)
    vtmp = os.path.join(table_dir, f"VERSION.{version}.tmp")
    with open(vtmp, "w") as f:
        f.write(str(version))
    os.replace(vtmp, os.path.join(table_dir, "VERSION"))
    return manifest


class _commit_lock:
    """O_EXCL lock file guarding the metadata commit. A lock left by a
    crashed committer is broken after `stale_sec` (the guarded section
    is a few file ops — seconds-old locks are live; `stale_sec` is set
    well above the sandbox's worst observed GC pause so a merely-paused
    holder is not mistaken for a dead one). Breaking uses os.replace of
    the stale lock onto a unique name which is then deleted, so of N
    waiters racing to break the same stale lock exactly one succeeds
    (rename of a missing source raises) and no debris accumulates.
    Release is OWNERSHIP-CHECKED: the lock file carries a per-acquire
    token, and __exit__ only unlinks when the token still matches — a
    holder that stalled past stale_sec and lost its lock to a breaker
    must not delete the NEXT holder's live lock (that would cascade
    into three concurrent committers). The token check + unlink is not
    atomic (plain POSIX files), but the window is microseconds versus
    stale_sec; true mutual exclusion under arbitrary stalls needs flock
    or O_TMPFILE-link, both overkill for this metadata commit."""

    def __init__(self, table_dir: str, stale_sec: float = 60.0,
                 timeout_sec: float = 120.0):
        self.path = os.path.join(table_dir, "_commit.lock")
        self.stale_sec = stale_sec
        self.timeout_sec = timeout_sec
        self.token = ""

    def __enter__(self):
        deadline = time.monotonic() + self.timeout_sec
        while True:
            try:
                fd = os.open(self.path,
                             os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                self.token = f"{os.getpid()}:{uuid.uuid4().hex}"
                os.write(fd, self.token.encode())
                os.close(fd)
                return self
            except FileExistsError:
                try:
                    age = time.time() - os.path.getmtime(self.path)
                except OSError:
                    continue  # holder just released — retry immediately
                if age > self.stale_sec:
                    broken = self.path + f".broken.{uuid.uuid4().hex}"
                    try:  # exactly one breaker wins the rename
                        os.replace(self.path, broken)
                        os.remove(broken)
                    except OSError:
                        pass
                    continue
                if time.monotonic() > deadline:
                    raise TimeoutError(
                        f"commit lock busy for {self.timeout_sec}s: {self.path}")
                time.sleep(0.02)

    def __exit__(self, *exc):
        try:
            with open(self.path) as f:
                if f.read() != self.token:
                    return False  # lock was broken and re-acquired — not ours
            os.remove(self.path)
        except OSError:
            pass
        return False


def compact_snapshot(spark: SparkSession, table_dir: str,
                     target_file_bytes: int = 128 * 1024 * 1024,
                     small_file_bytes: int | None = None) -> dict:
    """Bin-pack compaction (Iceberg ``rewrite_data_files``): rewrite the
    current snapshot's small data files into ~``target_file_bytes``
    files and commit the rewrite as a new ``replace`` snapshot. The
    10^12-doc ingestion pattern — frequent small streaming appends —
    otherwise degrades every scan into an open-file storm; compaction
    restores scan-sized files WITHOUT changing table contents:

      * logical content is unchanged (row_count re-verified before the
        commit; mismatch aborts with the staging files removed);
      * time travel to pre-compaction snapshots still sees the old
        files (nothing is deleted here — see expire_snapshots);
      * incremental readers skip ``replace`` snapshots entirely (no
        new logical data), mirroring Iceberg's incremental-scan rule.

    The rewrite itself is ``coalesce`` (no shuffle — partitions are
    merged, never repartitioned by key); only files smaller than
    ``small_file_bytes`` (default target/2) are rewritten, so an
    already-compacted table is a no-op. Concurrent appends are safe:
    the commit re-reads the committed manifest under the lock and
    carries any files that appeared since the rewrite set was chosen.
    """
    if small_file_bytes is None:
        small_file_bytes = target_file_bytes // 2
    cur = read_manifest(table_dir)
    if not cur["files"]:
        return cur
    sizes = {}
    for f in cur["files"]:
        try:
            sizes[f] = os.path.getsize(os.path.join(table_dir, f))
        except FileNotFoundError:
            # a concurrent compactor+expire reclaimed it between our
            # manifest read and the stat — leave it out of the rewrite
            # set; the under-lock subset check resolves the race
            continue
    small = [f for f in cur["files"]
             if f in sizes and sizes[f] < small_file_bytes]
    if len(small) < 2:
        return cur
    total = sum(sizes[f] for f in small)
    n_out = max(1, -(-total // target_file_bytes))  # ceil div
    src = spark.read.parquet(*[os.path.join(table_dir, f) for f in small])
    expect_rows = src.count()
    new_files = _write_staged(src.coalesce(n_out), table_dir)

    got_rows = spark.read.parquet(
        *[os.path.join(table_dir, f) for f in new_files]).count()
    if got_rows != expect_rows:
        for f in new_files:
            os.remove(os.path.join(table_dir, f))
        raise RuntimeError(
            f"compaction rewrite lost rows ({got_rows} != {expect_rows})")

    with _commit_lock(table_dir):
        prev = read_manifest(table_dir)
        small_set = set(small)
        if not small_set.issubset(prev["files"]):
            # only possible if a concurrent compactor rewrote the same
            # files — abandon ours (its result is equivalent)
            for f in new_files:
                os.remove(os.path.join(table_dir, f))
            return prev
        manifest = _commit_manifest(table_dir, {
            "parent": prev["version"] or None,
            "operation": "replace",
            "files": [f for f in prev["files"] if f not in small_set]
                     + new_files,
            "added_files": new_files,
            "removed_files": small,
            "row_count": prev["row_count"],
        })
    return manifest


def _expired_path(table_dir: str) -> str:
    return os.path.join(table_dir, "expired.json")


def expired_versions(table_dir: str) -> set[int]:
    p = _expired_path(table_dir)
    if not os.path.exists(p):
        return set()
    with open(p) as f:
        return set(json.load(f))


def expire_snapshots(table_dir: str, keep_last: int = 1) -> dict:
    """Expire all but the newest ``keep_last`` committed snapshots:
    delete data files referenced ONLY by expired snapshots (e.g. the
    small pre-compaction files), record the expired ids so time travel
    to them fails cleanly, and leave the (tiny) manifest JSONs in place
    so the parent chain stays walkable. Returns
    ``{"expired": [newly expired ids], "deleted_files": n actually
    deleted}``. Runs entirely under the commit lock — an interleaved
    append simply lands after.

    Crash-ordering: the expired ids are RECORDED FIRST, files deleted
    second — a crash in between leaves snapshots that already fail
    cleanly (expired-check) with their files still on disk, and the
    next expire call reclaims the leftovers (the delete sweep covers
    the whole beyond-keep chain idempotently). The reverse order would
    leave readable-looking snapshots whose files are gone."""
    with _commit_lock(table_dir):
        chain = committed_versions(table_dir)
        keep = chain[:max(1, keep_last)]
        beyond = chain[max(1, keep_last):]
        already = expired_versions(table_dir)
        newly = [v for v in beyond if v not in already]
        if not beyond:
            return {"expired": [], "deleted_files": 0}
        if newly:
            tmp = _expired_path(table_dir) + ".tmp"
            with open(tmp, "w") as f:
                json.dump(sorted(already | set(newly)), f)
            os.replace(tmp, _expired_path(table_dir))
        live = set()
        for v in keep:
            live.update(read_manifest(table_dir, v)["files"])
        dead = set()
        for v in beyond:  # whole beyond-keep chain: reclaims leftovers
            dead.update(f for f in read_manifest(table_dir, v)["files"]
                        if f not in live)
        n_deleted = 0
        for f in dead:
            try:
                os.remove(os.path.join(table_dir, f))
                n_deleted += 1
            except FileNotFoundError:
                pass
    return {"expired": newly, "deleted_files": n_deleted}


def read_snapshot(spark: SparkSession, table_dir: str,
                  snapshot: int | None = None) -> DataFrame:
    """Manifest-resolved read (current snapshot, or time travel to an
    older one). Reads ONLY manifest-listed files, so un-committed
    appends and orphans are invisible; explicit time travel to an
    orphan manifest (crashed writer, never committed) or to an expired
    snapshot (data files reclaimed by expire_snapshots) is rejected."""
    if snapshot is not None and snapshot not in committed_versions(table_dir):
        raise FileNotFoundError(
            f"snapshot {snapshot} is not on the committed chain of {table_dir}"
        )
    if snapshot is not None and snapshot in expired_versions(table_dir):
        raise FileNotFoundError(
            f"snapshot {snapshot} of {table_dir} is expired")
    m = read_manifest(table_dir, snapshot)
    if not m["files"]:
        raise FileNotFoundError(f"no snapshot in {table_dir}")
    return spark.read.parquet(
        *[os.path.join(table_dir, f) for f in m["files"]]
    )


def incremental_files(table_dir: str, from_snapshot: int,
                      to_snapshot: int | None = None) -> list[str]:
    """Data files of the APPEND snapshots strictly after
    `from_snapshot` up to `to_snapshot` (default current), oldest
    first — the incremental-read set for snapshot-tailing catch-up
    (streaming/incremental.py). Walks the committed parent chain and
    collects each append snapshot's own added_files; ``replace``
    (compaction) snapshots contribute no logical data and are skipped,
    so a consumer that already read the small pre-compaction files is
    not re-fed their compacted copies (Iceberg's incremental-scan
    rule). Both endpoints must be committed, non-expired snapshots:
    diffing against a crashed writer's orphan manifest would silently
    return the wrong file set, and a range that crosses an expired
    snapshot may reference reclaimed files."""
    committed = committed_versions(table_dir)
    for label, v in (("from_snapshot", from_snapshot),
                     ("to_snapshot", to_snapshot)):
        if v is not None and v != 0 and v not in committed:
            raise FileNotFoundError(
                f"{label} {v} is not on the committed chain of {table_dir}")
    to_v = to_snapshot if to_snapshot is not None \
        else current_version(table_dir)
    expired = expired_versions(table_dir)
    out: list[str] = []
    v = to_v
    while v and v != from_snapshot:
        if v in expired:
            raise FileNotFoundError(
                f"incremental range crosses expired snapshot {v} "
                f"of {table_dir}")
        m = read_manifest(table_dir, v)
        if m.get("operation", "append") == "append":
            out.append(m.get("added_files", []))
        v = m.get("parent") or 0
    if from_snapshot and v != from_snapshot:
        # walk hit the root without meeting from_snapshot: the range is
        # inverted (from newer than to). Returning the collected list
        # would re-deliver the ENTIRE append history as "new".
        raise ValueError(
            f"from_snapshot {from_snapshot} is not an ancestor of "
            f"to_snapshot {to_v} in {table_dir}")
    return [f for added in reversed(out) for f in added]


def read_incremental(spark: SparkSession, table_dir: str,
                     from_snapshot: int,
                     to_snapshot: int | None = None) -> DataFrame | None:
    files = incremental_files(table_dir, from_snapshot, to_snapshot)
    if not files:
        return None
    return spark.read.parquet(*[os.path.join(table_dir, f) for f in files])
