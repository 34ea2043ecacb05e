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
        version = _next_free_version(table_dir)
        manifest = {
            "version": version,
            "parent": prev["version"] or None,
            "ts": time.time(),
            "files": prev["files"] + new_files,
            "added_files": new_files,
            "row_count": prev["row_count"] + added_rows,
        }
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


def read_snapshot(spark: SparkSession, table_dir: str,
                  snapshot: int | None = None) -> DataFrame:
    """Manifest-resolved read (current snapshot, or time travel to an
    older one). Reads ONLY manifest-listed files, so un-committed
    appends and orphans are invisible; explicit time travel to an
    orphan manifest (crashed writer, never committed) is rejected."""
    if snapshot is not None and snapshot not in committed_versions(table_dir):
        raise FileNotFoundError(
            f"snapshot {snapshot} is not on the committed chain of {table_dir}"
        )
    m = read_manifest(table_dir, snapshot)
    if not m["files"]:
        raise FileNotFoundError(f"no snapshot in {table_dir}")
    return spark.read.parquet(
        *[os.path.join(table_dir, f) for f in m["files"]]
    )


def incremental_files(table_dir: str, from_snapshot: int,
                      to_snapshot: int | None = None) -> list[str]:
    """Data files added strictly after `from_snapshot` up to
    `to_snapshot` (default current) — the incremental-read set for
    snapshot-tailing catch-up (streaming/incremental.py). Both
    endpoints must be committed snapshots (same validation as
    read_snapshot): diffing against a crashed writer's orphan manifest
    would silently return the wrong file set."""
    committed = committed_versions(table_dir)
    for label, v in (("from_snapshot", from_snapshot),
                     ("to_snapshot", to_snapshot)):
        if v is not None and v != 0 and v not in committed:
            raise FileNotFoundError(
                f"{label} {v} is not on the committed chain of {table_dir}")
    new = read_manifest(table_dir, to_snapshot)
    old = read_manifest(table_dir, from_snapshot)
    old_set = set(old["files"])
    return [f for f in new["files"] if f not in old_set]


def read_incremental(spark: SparkSession, table_dir: str,
                     from_snapshot: int,
                     to_snapshot: int | None = None) -> DataFrame | None:
    files = incremental_files(table_dir, from_snapshot, to_snapshot)
    if not files:
        return None
    return spark.read.parquet(*[os.path.join(table_dir, f) for f in files])
