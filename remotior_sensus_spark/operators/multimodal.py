"""Multimodal column plumbing: opaque binary media payloads with typed
metadata, decode / feature-extract / resize / frame-sample over Arrow
batches.

New surface beyond the reference (per the build brief): a training-data
pipeline at 100 TB treats image/audio/video as `binary` columns. The
image/audio codec libraries are not in this container, so `decode_media`
is STUBBED: the real decoder raises NotImplementedError and a
deterministic fake decoder (splitmix64 byte stream) stands in so the
Spark-side plumbing — schema, partitioning, UDF signature, Arrow batch
shape — is real and tested.

`tile_features` is the genuinely-working path: per-tile image statistics
(8-bin histogram + moments) extracted from pixel payloads in one
`mapInPandas` pass — the shape any embedding/feature extractor plugs
into.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from remotior_sensus_spark import NODATA
from remotior_sensus_spark.synth.generate import splitmix64

HIST_BINS = 8
HIST_LO, HIST_HI = 100.0, 5000.0


def attach_media_payload(tiles: DataFrame) -> DataFrame:
    """Derive an opaque binary payload + metadata per tile (stand-in for
    a real image blob column): payload bytes are a deterministic
    function of the tile key."""
    meta = F.struct(
        F.lit("image/fake-raw").alias("mime"),
        F.lit(16).alias("width"),
        F.lit(16).alias("height"),
        F.lit(1).alias("channels"),
    )
    payload = F.sha2(
        F.concat_ws("/", "bandset", "band",
                    F.col("tile_x").cast("string"), F.col("tile_y").cast("string")),
        256,
    ).cast("binary")
    return tiles.withColumn("media_meta", meta).withColumn("media_blob", payload)


def decode_media(blob: bytes, mime: str) -> np.ndarray:
    """REAL decoder — unavailable in this container (no PIL/av/cv2)."""
    raise NotImplementedError(
        "media codecs not available in this environment; use fake_decode"
    )


def fake_decode(blob: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic stand-in decoder: blob bytes -> (h, w) uint8 image."""
    seed = np.frombuffer(blob[:8], dtype=np.uint64)[0] if len(blob) >= 8 else np.uint64(0)
    idx = np.arange(width * height, dtype=np.uint64)
    with np.errstate(over="ignore"):
        v = splitmix64(seed + idx) % np.uint64(256)
    return v.astype(np.uint8).reshape(height, width)


def decode_and_resize(df: DataFrame, out_size: int = 8) -> DataFrame:
    """mapInPandas decode -> nearest-neighbor resize -> flattened
    array<int> column. Exercises the real multimodal plumbing with the
    fake decoder."""

    def run(it):
        for pdf in it:
            if not len(pdf):
                continue
            # dims are PER-ROW metadata: vectorize per (w, h) group, so a
            # batch mixing media sizes decodes each image at its own dims
            # (taking row 0's dims for the whole batch silently corrupts
            # every other size)
            dims = pdf["media_meta"].map(lambda m: (int(m["width"]),
                                                    int(m["height"])))
            for (w, h), g in pdf.groupby(dims, sort=False):
                n = len(g)
                # whole-group decode: one seed vector + one splitmix64 sweep
                seeds = np.frombuffer(
                    b"".join(bytes(b)[:8].ljust(8, b"\0")
                             for b in g["media_blob"]),
                    dtype=np.uint64,
                )
                idx = np.arange(w * h, dtype=np.uint64)
                with np.errstate(over="ignore"):
                    v = splitmix64(seeds[:, None] + idx[None, :]) % np.uint64(256)
                imgs = v.astype(np.uint8).reshape(n, h, w)
                step = max(1, h // out_size)
                small = imgs[:, ::step, ::step][:, :out_size, :out_size]
                thumbs = small.reshape(n, -1).astype(np.int32)
                yield pd.DataFrame({
                    "bandset": g["bandset"], "band": g["band"],
                    "tile_x": g["tile_x"], "tile_y": g["tile_y"],
                    "thumb": list(thumbs),
                })

    return df.mapInPandas(
        run,
        schema="bandset string, band string, tile_x int, tile_y int, thumb array<int>",
    )


def attach_video_payload(tiles: DataFrame) -> DataFrame:
    """Derive an opaque VIDEO payload + metadata per tile: same sha256
    payload contract as attach_media_payload, plus a deterministic
    per-row frame count (2..8) read from the first payload byte — all
    Column math, no Python."""
    key = F.concat_ws("/", "bandset", "band",
                      F.col("tile_x").cast("string"),
                      F.col("tile_y").cast("string"))
    digest = F.sha2(key, 256)
    n_frames = (F.conv(F.substring(digest, 1, 2), 16, 10).cast("int")
                % 7 + 2)
    meta = F.struct(
        F.lit("video/fake-raw").alias("mime"),
        F.lit(16).alias("width"),
        F.lit(16).alias("height"),
        n_frames.alias("n_frames"),
    )
    return (tiles.withColumn("media_meta", meta)
            .withColumn("media_blob", digest.cast("binary")))


def frame_sample(videos: DataFrame, every_n: int = 3,
                 max_frames: int = 4) -> DataFrame:
    """Video frame sampling + per-frame feature extraction.

    The 100 TB shape: sampled frame indices are generated JVM-side
    (sequence-with-stride, slice, explode — pure Column ops, so a
    10^12-row video table never touches Python to decide WHAT to
    decode), then exactly the sampled frames decode in ONE mapInPandas
    Arrow pass (whole-batch splitmix64 sweep per (w,h) group — the
    fake-codec contract; a real av/ffmpeg decoder drops into the same
    signature). Per-frame features stay integer-exact (sum/min/max) so
    the oracle hash-compares without float tolerance."""
    idx_col = F.explode(
        F.slice(
            F.sequence(F.lit(0),
                       F.col("media_meta.n_frames") - 1,
                       F.lit(every_n)),
            1, max_frames,
        )
    ).alias("frame_idx")
    sel = videos.select(
        "bandset", "band", "tile_x", "tile_y",
        F.col("media_meta.width").alias("w"),
        F.col("media_meta.height").alias("h"),
        F.col("media_meta.n_frames").alias("n_frames"),
        "media_blob", idx_col,
    )

    def run(it):
        for pdf in it:
            if not len(pdf):
                continue
            for (w, h), g in pdf.groupby(["w", "h"], sort=False):
                n = len(g)
                seeds = np.frombuffer(
                    b"".join(bytes(b)[:8].ljust(8, b"\0")
                             for b in g["media_blob"]),
                    dtype=np.uint64,
                )
                fbase = g["frame_idx"].to_numpy().astype(np.uint64) \
                    * np.uint64(w * h)
                idx = np.arange(w * h, dtype=np.uint64)
                with np.errstate(over="ignore"):
                    v = (splitmix64((seeds + fbase)[:, None] + idx[None, :])
                         % np.uint64(256)).astype(np.int64)
                yield pd.DataFrame({
                    "bandset": g["bandset"], "band": g["band"],
                    "tile_x": g["tile_x"], "tile_y": g["tile_y"],
                    "frame_idx": g["frame_idx"], "n_frames": g["n_frames"],
                    "px_sum": v.sum(axis=1),
                    "px_min": v.min(axis=1).astype(np.int32),
                    "px_max": v.max(axis=1).astype(np.int32),
                })

    return sel.mapInPandas(
        run,
        schema=("bandset string, band string, tile_x int, tile_y int, "
                "frame_idx int, n_frames int, px_sum long, "
                "px_min int, px_max int"),
    )


def tile_features(tiles: DataFrame) -> DataFrame:
    """Per-tile image features from the pixel payload in one Arrow pass:
    valid count, integer sum, 8-bin histogram. All-integer outputs ->
    exactly oracle-checkable."""

    def run(it):
        edges = np.linspace(HIST_LO, HIST_HI, HIST_BINS + 1)
        for pdf in it:
            n = len(pdf)
            px = np.asarray([np.asarray(p, dtype=np.float64) for p in pdf["pixels"]])
            valid_mask = px != NODATA
            counts = valid_mask.sum(axis=1).astype(np.int64)
            sums = np.where(valid_mask, px, 0).sum(axis=1).astype(np.int64)
            hists = np.zeros((n, HIST_BINS), dtype=np.int64)
            for i in range(n):
                v = px[i][valid_mask[i]]
                hists[i], _ = np.histogram(v, bins=edges)
            yield pd.DataFrame({
                "bandset": pdf["bandset"], "band": pdf["band"],
                "tile_x": pdf["tile_x"], "tile_y": pdf["tile_y"],
                "valid_count": counts, "pixel_sum": sums,
                "histogram": [h.tolist() for h in hists],
            })

    return tiles.select("bandset", "band", "tile_x", "tile_y", "pixels").mapInPandas(
        run,
        schema=("bandset string, band string, tile_x int, tile_y int, "
                "valid_count long, pixel_sum long, histogram array<long>"),
    )
