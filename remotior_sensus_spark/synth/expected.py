"""Independently-computed expected outputs for the queries whose
semantics are not ANSI-SQL-expressible (connected components, sieve,
polygonize, region growing, multimodal decode).

Each builder assembles the FULL global raster from the deterministic
tile generator and computes ground truth with plain python/numpy
(scanline BFS flood fill, 2x2-corner vertex counting) — algorithms
deliberately DIFFERENT from the engine's (batched hash-to-min labeling
+ distributed boundary merge, directed edge-walk ring tracing), so a
regression in either side breaks the match. Outputs are written as
parquet under ``<geo_dir>/expected/`` and registered as trivial DuckDB
oracles (``select * from '<path>'``), turning the former rows-only
driver checks into full row/schema/value-hash checks.

Reference semantics mirrored: gdal-style CC output value = patch pixel
count (ref tools/raster_label.py:94-402), gdal.SieveFilter merge rule
largest-neighbor-ties-to-smaller-value (ref core/processor.py:1757-1914),
gdal.Polygonize ring geometry (ref core/processor.py:1608-1756),
region growing flood fill (ref core/processor_functions.py:1602-1647).
"""

from __future__ import annotations

import collections
import hashlib
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from remotior_sensus_spark import NODATA
from remotior_sensus_spark.grid import PIXEL_SIZE, TILE_PX
from remotior_sensus_spark.synth.generate import (
    geo_dir,
    grid_n,
    splitmix64,
    tile_pixel_values,
)

# bump when any builder's logic changes — stale cached parquet is
# regenerated on version mismatch
_EXPECTED_VERSION = 23


def _full_raster(sf: float, bs_idx: int = 0, band_idx: int = 2) -> np.ndarray:
    """Global (H, W) float64 raster for one (bandset, band); nodata -> NaN."""
    n = grid_n(sf)
    txs, tys = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    vals = tile_pixel_values(bs_idx, band_idx, txs.ravel(), tys.ravel())
    out = np.full((n * TILE_PX, n * TILE_PX), np.nan)
    for (tx, ty), v in zip(zip(txs.ravel(), tys.ravel()), vals):
        a = v.reshape(TILE_PX, TILE_PX).astype(np.float64)
        out[ty * TILE_PX:(ty + 1) * TILE_PX,
            tx * TILE_PX:(tx + 1) * TILE_PX] = a
    out[out == NODATA] = np.nan
    return out


def _components(value: np.ndarray, same_value: bool):
    """Scanline-BFS 4-connectivity components of value>0 foreground.

    Returns a list of dicts: {value, cells (ys, xs) arrays, size}.
    Independent of the engine's per-tile hash-to-min + boundary-merge.
    """
    fg = value > 0
    H, W = value.shape
    seen = np.zeros((H, W), dtype=bool)
    comps = []
    for sy in range(H):
        row = fg[sy] & ~seen[sy]
        if not row.any():
            continue
        for sx in np.nonzero(row)[0]:
            if seen[sy, sx]:
                continue
            v = value[sy, sx]
            stack = [(sy, sx)]
            seen[sy, sx] = True
            ys, xs = [], []
            while stack:
                y, x = stack.pop()
                ys.append(y)
                xs.append(x)
                for ny, nx in ((y - 1, x), (y + 1, x), (y, x - 1), (y, x + 1)):
                    if (0 <= ny < H and 0 <= nx < W and fg[ny, nx]
                            and not seen[ny, nx]
                            and (not same_value or value[ny, nx] == v)):
                        seen[ny, nx] = True
                        stack.append((ny, nx))
            comps.append({"value": float(v),
                          "ys": np.asarray(ys), "xs": np.asarray(xs),
                          "size": len(ys)})
    return comps


def _binary_mask_raster(sf: float) -> np.ndarray:
    """where("B04" > 2500, 1, 0), nodata_mask=None: the nodata sentinel
    fails the >2500 test, so nodata -> 0 -> background."""
    full = _full_raster(sf)
    return (np.nan_to_num(full, nan=float(NODATA)) > 2500).astype(np.float64)


def _sieve_input_raster(sf: float) -> np.ndarray:
    """where("B04" > 2500, 2, 1), nodata_mask='any', out_nodata=0."""
    full = _full_raster(sf)
    v = np.where(np.nan_to_num(full, nan=float(NODATA)) > 2500, 2.0, 1.0)
    v[np.isnan(full)] = 0.0
    return v


def build_raster_label_histogram(sf: float) -> pa.Table:
    comps = _components(_binary_mask_raster(sf), same_value=False)
    hist = collections.Counter(c["size"] for c in comps)
    sizes = sorted(hist)
    return pa.table({
        "component_size": pa.array(sizes, type=pa.int64()),
        "n_components": pa.array([hist[s] for s in sizes], type=pa.int64()),
    })


def build_sieve_reclass(sf: float, min_size: int = 4) -> pa.Table:
    value = _sieve_input_raster(sf)
    comps = _components(value, same_value=True)
    H, W = value.shape
    label = np.full((H, W), -1, dtype=np.int64)
    for i, c in enumerate(comps):
        label[c["ys"], c["xs"]] = i
    # component adjacency (any two different foreground components that
    # touch via a 4-neighbor pixel pair)
    adj: dict[int, set] = collections.defaultdict(set)
    for a, b in ((label[:, :-1], label[:, 1:]), (label[:-1, :], label[1:, :])):
        m = (a >= 0) & (b >= 0) & (a != b)
        for pa_, pb_ in zip(a[m], b[m]):
            adj[int(pa_)].add(int(pb_))
            adj[int(pb_)].add(int(pa_))
    agg = collections.Counter()
    px_sum = collections.Counter()
    for i, c in enumerate(comps):
        if c["size"] >= min_size or not adj[i]:
            continue
        # gdal rule: neighbor with most pixels; ties -> smaller value
        best = min(adj[i], key=lambda j: (-comps[j]["size"], comps[j]["value"]))
        key = (c["value"], comps[best]["value"])
        agg[key] += 1
        px_sum[key] += c["size"]
    keys = sorted(agg)
    return pa.table({
        "old_value": pa.array([k[0] for k in keys], type=pa.float64()),
        "new_value": pa.array([k[1] for k in keys], type=pa.float64()),
        "n_patches": pa.array([agg[k] for k in keys], type=pa.int64()),
        "pixel_count": pa.array([px_sum[k] for k in keys], type=pa.int64()),
    })


def build_polygonize(sf: float) -> pa.Table:
    comps = _components(_sieve_input_raster(sf), same_value=True)
    return pa.table({
        "value": pa.array([c["value"] for c in comps], type=pa.float64()),
        "pixel_count": pa.array([c["size"] for c in comps], type=pa.int64()),
        "min_gx": pa.array([int(c["xs"].min()) for c in comps], type=pa.int64()),
        "max_gx": pa.array([int(c["xs"].max()) for c in comps], type=pa.int64()),
        "min_gy": pa.array([int(c["ys"].min()) for c in comps], type=pa.int64()),
        "max_gy": pa.array([int(c["ys"].max()) for c in comps], type=pa.int64()),
    })


def build_polygonize_wkt(sf: float) -> pa.Table:
    """Per-patch (value, pixel_count, area_m2, perimeter_m, n_vertices).

    Perimeter = exposed pixel edges * PIXEL_SIZE. Vertex count by the
    2x2-corner rule: at each lattice corner, the 4 surrounding cells'
    membership decides vertices — 1 or 3 cells set = one corner, two
    diagonal cells = a pinch point = two corners, 0/2-adjacent/4 = none.
    This equals the engine's ring-walk vertex count (collinear vertices
    simplified; each pinch-point visit contributes a vertex) without
    tracing any ring.
    """
    comps = _components(_sieve_input_raster(sf), same_value=True)
    rows = {"value": [], "pixel_count": [], "area_m2": [],
            "perimeter_m": [], "n_vertices": []}
    for c in comps:
        ys, xs = c["ys"], c["xs"]
        y0, x0 = ys.min(), xs.min()
        h = ys.max() - y0 + 1
        w = xs.max() - x0 + 1
        m = np.zeros((h + 2, w + 2), dtype=np.int8)
        m[ys - y0 + 1, xs - x0 + 1] = 1
        exposed = (
            (m[1:-1, 1:-1] & (1 - m[:-2, 1:-1])).sum()
            + (m[1:-1, 1:-1] & (1 - m[2:, 1:-1])).sum()
            + (m[1:-1, 1:-1] & (1 - m[1:-1, :-2])).sum()
            + (m[1:-1, 1:-1] & (1 - m[1:-1, 2:])).sum()
        )
        q = m[:-1, :-1] + m[:-1, 1:] + m[1:, :-1] + m[1:, 1:]
        diag = (m[:-1, :-1] == m[1:, 1:]) & (m[:-1, 1:] == m[1:, :-1]) \
            & (m[:-1, :-1] != m[:-1, 1:])
        n_vertices = int(((q == 1) | (q == 3)).sum() + 2 * ((q == 2) & diag).sum())
        rows["value"].append(c["value"])
        rows["pixel_count"].append(c["size"])
        rows["area_m2"].append(c["size"] * PIXEL_SIZE * PIXEL_SIZE)
        rows["perimeter_m"].append(float(exposed) * PIXEL_SIZE)
        rows["n_vertices"].append(n_vertices)
    return pa.table({
        "value": pa.array(rows["value"], type=pa.float64()),
        "pixel_count": pa.array(rows["pixel_count"], type=pa.int64()),
        "area_m2": pa.array(rows["area_m2"], type=pa.float64()),
        "perimeter_m": pa.array(rows["perimeter_m"], type=pa.float64()),
        "n_vertices": pa.array(rows["n_vertices"], type=pa.int64()),
    })


def build_region_growing(sf: float, seed_gx: int = 100, seed_gy: int = 100,
                         max_spectral_distance: float = 2400.0) -> pa.Table:
    """UNBOUNDED flood fill (clipped only by the raster itself) — the
    operator's auto_expand loop must converge to exactly this, however
    small its starting window."""
    full = _full_raster(sf)
    n = grid_n(sf)
    hi = n * TILE_PX
    seed_val = full[seed_gy, seed_gx]
    out_gx, out_gy, out_v = [], [], []
    if not np.isnan(seed_val):
        ok = np.abs(full - seed_val) <= max_spectral_distance
        seen = np.zeros_like(ok, dtype=bool)
        stack = [(seed_gy, seed_gx)]
        seen[seed_gy, seed_gx] = True
        while stack:
            y, x = stack.pop()
            out_gx.append(x)
            out_gy.append(y)
            out_v.append(full[y, x])
            for ny, nx in ((y - 1, x), (y + 1, x), (y, x - 1), (y, x + 1)):
                if (0 <= ny < hi and 0 <= nx < hi
                        and ok[ny, nx] and not seen[ny, nx]):
                    seen[ny, nx] = True
                    stack.append((ny, nx))
    return pa.table({
        "gx": pa.array(out_gx, type=pa.int64()),
        "gy": pa.array(out_gy, type=pa.int64()),
        "value": pa.array(out_v, type=pa.float64()),
    })


def build_media_thumbnails(sf: float, out_size: int = 8) -> pa.Table:
    """Exploded thumbnails for bandset S2_2020-01-01 / B04 tiles.

    Mirrors the multimodal contract: payload = utf-8 bytes of the hex
    sha256 of "bandset/band/tx/ty", seed = first 8 payload bytes (LE),
    image = splitmix64(seed + i) % 256 over a 16x16 grid, thumbnail =
    stride-2 subsample to 8x8. hashlib here vs Spark's sha2() there —
    the decode math is shared by design (it IS the fake codec contract),
    the plumbing around it is what this oracle checks.
    """
    n = grid_n(sf)
    bs, band = "S2_2020-01-01", "B04"
    w = h = 16
    step = max(1, h // out_size)
    rows = {"bandset": [], "band": [], "tile_x": [], "tile_y": [],
            "pos": [], "v": []}
    idx = np.arange(w * h, dtype=np.uint64)
    for tx in range(n):
        for ty in range(n):
            digest = hashlib.sha256(
                f"{bs}/{band}/{tx}/{ty}".encode()).hexdigest()
            seed = np.frombuffer(digest[:8].encode(), dtype=np.uint64)[0]
            with np.errstate(over="ignore"):
                img = (splitmix64(seed + idx) % np.uint64(256)).astype(
                    np.int32).reshape(h, w)
            thumb = img[::step, ::step][:out_size, :out_size].ravel()
            m = len(thumb)
            rows["bandset"].extend([bs] * m)
            rows["band"].extend([band] * m)
            rows["tile_x"].extend([tx] * m)
            rows["tile_y"].extend([ty] * m)
            rows["pos"].extend(range(m))
            rows["v"].extend(int(x) for x in thumb)
    return pa.table({
        "bandset": pa.array(rows["bandset"], type=pa.string()),
        "band": pa.array(rows["band"], type=pa.string()),
        "tile_x": pa.array(rows["tile_x"], type=pa.int32()),
        "tile_y": pa.array(rows["tile_y"], type=pa.int32()),
        "pos": pa.array(rows["pos"], type=pa.int32()),
        "v": pa.array(rows["v"], type=pa.int32()),
    })


def build_video_frames(sf: float, every_n: int = 3,
                       max_frames: int = 4) -> pa.Table:
    """Sampled-frame features for bandset S2_2020-01-01 / B04 'videos'.

    Mirrors multimodal.attach_video_payload + frame_sample: payload =
    utf-8 bytes of the hex sha256 of "bandset/band/tx/ty", n_frames =
    (first 2 hex chars as int) % 7 + 2, sampled indices =
    range(0, n_frames, every_n)[:max_frames], frame f pixel i =
    splitmix64(seed + f*w*h + i) % 256 with seed = first 8 payload
    bytes (LE). Features are integer-exact sum/min/max per frame."""
    n = grid_n(sf)
    bs, band = "S2_2020-01-01", "B04"
    w = h = 16
    rows = {k: [] for k in ("bandset", "band", "tile_x", "tile_y",
                            "frame_idx", "n_frames",
                            "px_sum", "px_min", "px_max")}
    idx = np.arange(w * h, dtype=np.uint64)
    for tx in range(n):
        for ty in range(n):
            digest = hashlib.sha256(
                f"{bs}/{band}/{tx}/{ty}".encode()).hexdigest()
            seed = np.frombuffer(digest[:8].encode(), dtype=np.uint64)[0]
            nf = int(digest[:2], 16) % 7 + 2
            for f in list(range(0, nf, every_n))[:max_frames]:
                with np.errstate(over="ignore"):
                    v = (splitmix64(seed + np.uint64(f * w * h) + idx)
                         % np.uint64(256)).astype(np.int64)
                rows["bandset"].append(bs)
                rows["band"].append(band)
                rows["tile_x"].append(tx)
                rows["tile_y"].append(ty)
                rows["frame_idx"].append(f)
                rows["n_frames"].append(nf)
                rows["px_sum"].append(int(v.sum()))
                rows["px_min"].append(int(v.min()))
                rows["px_max"].append(int(v.max()))
    return pa.table({
        "bandset": pa.array(rows["bandset"], type=pa.string()),
        "band": pa.array(rows["band"], type=pa.string()),
        "tile_x": pa.array(rows["tile_x"], type=pa.int32()),
        "tile_y": pa.array(rows["tile_y"], type=pa.int32()),
        "frame_idx": pa.array(rows["frame_idx"], type=pa.int32()),
        "n_frames": pa.array(rows["n_frames"], type=pa.int32()),
        "px_sum": pa.array(rows["px_sum"], type=pa.int64()),
        "px_min": pa.array(rows["px_min"], type=pa.int32()),
        "px_max": pa.array(rows["px_max"], type=pa.int32()),
    })


def build_warp_crs(sf: float, src_zone: int = 33,
                   dst_zone: int = 32) -> pa.Table:
    """Independent dense-array oracle for the UTM zone-to-zone warp:
    source B04 values gathered into one numpy grid, every output pixel
    center mapped dst->geodetic->src with the numpy path of the SAME
    Krüger formula core (operators/crs.py — the projection math IS the
    shared contract; the relational lattice/join/floor plumbing is what
    this oracle independently checks), nearest-gather with bounds
    check, per-tile integer checksums.

    Float caveat: numpy libm and JVM Math agree on this stack to
    ~1e-9 m (measured), so a floor() flip needs a mapped coordinate
    within ~1e-10 of a 10 m pixel boundary — probability ~1e-10 per
    pixel, i.e. none expected at any test scale. A future JDK/libm
    divergence would show up as a tiny checksum delta on a handful of
    boundary pixels, not a systematic failure."""
    from remotior_sensus_spark.grid import ORIGIN_X, ORIGIN_Y
    from remotior_sensus_spark.operators import crs as _crs
    from remotior_sensus_spark.operators.warp import crs_ring_extent

    n = grid_n(sf)
    t_px = 16
    side = n * t_px
    txs, tys = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    vals = tile_pixel_values(0, 2, txs.ravel(), tys.ravel())  # B04
    src = np.empty((side, side), dtype=np.float64)  # [gy, gx]
    for (tx, ty, block) in zip(txs.ravel(), tys.ravel(),
                               vals.reshape(-1, t_px * t_px)):
        src[ty * t_px:(ty + 1) * t_px, tx * t_px:(tx + 1) * t_px] = \
            block.reshape(t_px, t_px)

    sx0, sx1 = ORIGIN_X, ORIGIN_X + side * 10.0
    sy0, sy1 = ORIGIN_Y - side * 10.0, ORIGIN_Y
    otx0, otx1, oty0, oty1 = crs_ring_extent(
        sx0, sx1, sy0, sy1, src_zone, dst_zone, t_px)

    ogx = np.arange((otx1 - otx0 + 1) * t_px) + otx0 * t_px
    ogy = np.arange((oty1 - oty0 + 1) * t_px) + oty0 * t_px
    gE = ORIGIN_X + (ogx + 0.5) * 10.0
    gN = ORIGIN_Y - (ogy + 0.5) * 10.0
    EE, NN = np.meshgrid(gE, gN, indexing="xy")  # [row=y, col=x]
    lat, lon = _crs.tm_inverse(np, EE.ravel(), NN.ravel(),
                               _crs.utm_lon0(dst_zone))
    sE, sN = _crs.tm_forward(np, lat, lon, _crs.utm_lon0(src_zone))
    sgx = np.floor((sE - ORIGIN_X) / 10.0).astype(np.int64)
    sgy = np.floor((ORIGIN_Y - sN) / 10.0).astype(np.int64)
    ok = (sgx >= 0) & (sgx < side) & (sgy >= 0) & (sgy < side)
    v = np.full(sgx.shape, -32768.0)
    v[ok] = src[sgy[ok], sgx[ok]]
    v = v.reshape(EE.shape)

    rows = {k: [] for k in ("tile_x", "tile_y", "checksum", "valid_count")}
    for ti in range(otx0, otx1 + 1):
        for tj in range(oty0, oty1 + 1):
            blk = v[(tj - oty0) * t_px:(tj - oty0 + 1) * t_px,
                    (ti - otx0) * t_px:(ti - otx0 + 1) * t_px]
            valid = blk != -32768.0
            rows["tile_x"].append(ti)
            rows["tile_y"].append(tj)
            rows["checksum"].append(int(blk[valid].astype(np.int64).sum()))
            rows["valid_count"].append(int(valid.sum()))
    return pa.table({
        "tile_x": pa.array(rows["tile_x"], type=pa.int32()),
        "tile_y": pa.array(rows["tile_y"], type=pa.int32()),
        "checksum": pa.array(rows["checksum"], type=pa.int64()),
        "valid_count": pa.array(rows["valid_count"], type=pa.int64()),
    })


def build_landscape_metrics(sf: float) -> pa.Table:
    """Per-class patch statistics with the perimeter counted directly:
    for every class pixel, each of its 4 sides facing a different
    value (other class, nodata, or outside the canvas) adds 1 — an
    INDEPENDENT formulation of the engine's 4*area - 2*adjacency
    identity, so an identity bug cannot pass both."""
    value = _sieve_input_raster(sf)
    comps = _components(value, same_value=True)
    per = {}
    for c in comps:
        v = int(c["value"])
        n, area, largest = per.get(v, (0, 0, 0))
        per[v] = (n + 1, area + c["size"], max(largest, c["size"]))
    H, W = value.shape
    pad = np.zeros((H + 2, W + 2), dtype=value.dtype)
    pad[1:-1, 1:-1] = value
    perim = {}
    core = pad[1:-1, 1:-1]
    for dy, dx in ((0, 1), (0, -1), (1, 0), (-1, 0)):
        nb = pad[1 + dy:H + 1 + dy, 1 + dx:W + 1 + dx]
        for v in per:
            perim[v] = perim.get(v, 0) + int(
                ((core == v) & (nb != core)).sum())
    vs = sorted(per)
    return pa.table({
        "class_value": pa.array(vs, type=pa.int64()),
        "n_patches": pa.array([per[v][0] for v in vs], type=pa.int64()),
        "area_px": pa.array([per[v][1] for v in vs], type=pa.int64()),
        "largest_patch": pa.array([per[v][2] for v in vs], type=pa.int64()),
        "mean_patch_fp": pa.array(
            [per[v][1] * 1000000 // per[v][0] for v in vs], type=pa.int64()),
        "perimeter_px": pa.array([perim[v] for v in vs], type=pa.int64()),
    })


def build_warp_datum(sf: float, zone: int = 33) -> pa.Table:
    """Independent dense-array oracle for the ED50->WGS84 datum warp —
    same contract as build_warp_crs: the datum pipeline math is the
    shared formula core, the relational lattice/join/floor plumbing is
    what this gather independently checks."""
    from remotior_sensus_spark.grid import ORIGIN_X, ORIGIN_Y
    from remotior_sensus_spark.operators import crs as _crs
    from remotior_sensus_spark.operators.warp import datum_ring_extent

    n = grid_n(sf)
    t_px = 16
    side = n * t_px
    txs, tys = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    vals = tile_pixel_values(0, 2, txs.ravel(), tys.ravel())  # B04
    src = np.empty((side, side), dtype=np.float64)
    for (tx, ty, block) in zip(txs.ravel(), tys.ravel(),
                               vals.reshape(-1, t_px * t_px)):
        src[ty * t_px:(ty + 1) * t_px, tx * t_px:(tx + 1) * t_px] = \
            block.reshape(t_px, t_px)

    sx0, sx1 = ORIGIN_X, ORIGIN_X + side * 10.0
    sy0, sy1 = ORIGIN_Y - side * 10.0, ORIGIN_Y
    otx0, otx1, oty0, oty1 = datum_ring_extent(
        sx0, sx1, sy0, sy1, zone, t_px)

    ogx = np.arange((otx1 - otx0 + 1) * t_px) + otx0 * t_px
    ogy = np.arange((oty1 - oty0 + 1) * t_px) + oty0 * t_px
    gE = ORIGIN_X + (ogx + 0.5) * 10.0
    gN = ORIGIN_Y - (ogy + 0.5) * 10.0
    EE, NN = np.meshgrid(gE, gN, indexing="xy")
    sE, sN = _crs.datum_wgs84_to_ed50(np, EE.ravel(), NN.ravel(), zone)
    sgx = np.floor((sE - ORIGIN_X) / 10.0).astype(np.int64)
    sgy = np.floor((ORIGIN_Y - sN) / 10.0).astype(np.int64)
    ok = (sgx >= 0) & (sgx < side) & (sgy >= 0) & (sgy < side)
    v = np.full(sgx.shape, -32768.0)
    v[ok] = src[sgy[ok], sgx[ok]]
    v = v.reshape(EE.shape)

    rows = {k: [] for k in ("tile_x", "tile_y", "checksum", "valid_count")}
    for ti in range(otx0, otx1 + 1):
        for tj in range(oty0, oty1 + 1):
            blk = v[(tj - oty0) * t_px:(tj - oty0 + 1) * t_px,
                    (ti - otx0) * t_px:(ti - otx0 + 1) * t_px]
            valid = blk != -32768.0
            rows["tile_x"].append(ti)
            rows["tile_y"].append(tj)
            rows["checksum"].append(int(blk[valid].astype(np.int64).sum()))
            rows["valid_count"].append(int(valid.sum()))
    return pa.table({
        "tile_x": pa.array(rows["tile_x"], type=pa.int32()),
        "tile_y": pa.array(rows["tile_y"], type=pa.int32()),
        "checksum": pa.array(rows["checksum"], type=pa.int64()),
        "valid_count": pa.array(rows["valid_count"], type=pa.int64()),
    })


def build_warp_crs_bilinear(sf: float, src_zone: int = 33,
                            dst_zone: int = 32) -> pa.Table:
    """Numpy oracle for the bilinear cross-zone warp: same 1/1024
    subpixel quantization and fixed-corner-order combine as the
    operator (see warp.warp_crs_bilinear), fixed-point checksums."""
    from remotior_sensus_spark.grid import ORIGIN_X, ORIGIN_Y
    from remotior_sensus_spark.operators import crs as _crs
    from remotior_sensus_spark.operators.warp import crs_ring_extent

    n = grid_n(sf)
    t_px = 16
    side = n * t_px
    txs, tys = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    vals = tile_pixel_values(0, 2, txs.ravel(), tys.ravel())  # B04
    src = np.empty((side, side), dtype=np.float64)
    for (tx, ty, block) in zip(txs.ravel(), tys.ravel(),
                               vals.reshape(-1, t_px * t_px)):
        src[ty * t_px:(ty + 1) * t_px, tx * t_px:(tx + 1) * t_px] = \
            block.reshape(t_px, t_px)

    sx0, sx1 = ORIGIN_X, ORIGIN_X + side * 10.0
    sy0, sy1 = ORIGIN_Y - side * 10.0, ORIGIN_Y
    otx0, otx1, oty0, oty1 = crs_ring_extent(
        sx0, sx1, sy0, sy1, src_zone, dst_zone, t_px)

    ogx = np.arange((otx1 - otx0 + 1) * t_px) + otx0 * t_px
    ogy = np.arange((oty1 - oty0 + 1) * t_px) + oty0 * t_px
    gE = ORIGIN_X + (ogx + 0.5) * 10.0
    gN = ORIGIN_Y - (ogy + 0.5) * 10.0
    EE, NN = np.meshgrid(gE, gN, indexing="xy")
    lat, lon = _crs.tm_inverse(np, EE.ravel(), NN.ravel(),
                               _crs.utm_lon0(dst_zone))
    sE, sN = _crs.tm_forward(np, lat, lon, _crs.utm_lon0(src_zone))
    u = (sE - ORIGIN_X) / 10.0 - 0.5
    v = (ORIGIN_Y - sN) / 10.0 - 0.5
    uq = np.floor(u * 1024.0 + 0.5) / 1024.0
    vq = np.floor(v * 1024.0 + 0.5) / 1024.0
    u0 = np.floor(uq).astype(np.int64)
    v0 = np.floor(vq).astype(np.int64)
    wu = uq - np.floor(uq)
    wv = vq - np.floor(vq)
    num = np.zeros(u0.shape)
    den = np.zeros(u0.shape)
    for k in range(4):
        sgx = u0 + k % 2
        sgy = v0 + k // 2
        w = (np.where(k % 2 == 0, 1.0 - wu, wu)
             * np.where(k < 2, 1.0 - wv, wv))
        ok = (sgx >= 0) & (sgx < side) & (sgy >= 0) & (sgy < side)
        val = np.full(sgx.shape, -32768.0)
        val[ok] = src[sgy[ok], sgx[ok]]
        good = ok & (val != -32768.0)
        num = num + np.where(good, w * val, 0.0)
        den = den + np.where(good, w, 0.0)
    out = np.where(den > 0, num / np.where(den > 0, den, 1.0), -32768.0)
    out = out.reshape(EE.shape)

    rows = {k: [] for k in ("tile_x", "tile_y", "checksum", "valid_count")}
    for ti in range(otx0, otx1 + 1):
        for tj in range(oty0, oty1 + 1):
            blk = out[(tj - oty0) * t_px:(tj - oty0 + 1) * t_px,
                      (ti - otx0) * t_px:(ti - otx0 + 1) * t_px]
            valid = blk != -32768.0
            fp = np.floor(blk[valid] * 1000000.0 + 0.5).astype(np.int64)
            rows["tile_x"].append(ti)
            rows["tile_y"].append(tj)
            rows["checksum"].append(int(fp.sum()))
            rows["valid_count"].append(int(valid.sum()))
    return pa.table({
        "tile_x": pa.array(rows["tile_x"], type=pa.int32()),
        "tile_y": pa.array(rows["tile_y"], type=pa.int32()),
        "checksum": pa.array(rows["checksum"], type=pa.int64()),
        "valid_count": pa.array(rows["valid_count"], type=pa.int64()),
    })


def _dense_flow(sf: float):
    """Whole-raster D8 resolution shared by the hydrology builders:
    returns (valid, acc, sink_id) where acc is the exact global flow
    accumulation (weight 1 per valid pixel, path-inclusive) and sink_id
    the flat index of each valid pixel's terminal sink. Independent of
    the tiled Spark path: ONE dense array, a global indegree peel, no
    tile decomposition at all — the same _d8_best pick is shared on
    purpose (the pick itself is pinned by the d8_flow oracle + dense
    parity tests; what this reference checks is the accumulation /
    basin-routing machinery)."""
    return _dense_flow_array(_full_raster(sf))


def _dense_flow_array(r: np.ndarray):
    from remotior_sensus_spark.operators.geostats import _D8, _d8_best

    h, w = r.shape
    pad = np.pad(r, 1, constant_values=np.nan)
    codes, interior = _d8_best(pad, slice(1, 1 + h), slice(1, 1 + w))
    valid = ~np.isnan(r)

    dxa = np.zeros((h, w), dtype=np.int64)
    dya = np.zeros((h, w), dtype=np.int64)
    for dx, dy, code, _diag in _D8:
        m = interior & (codes == code)
        dxa[m] = dx
        dya[m] = dy
    flows = interior & (codes != 0)
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    n = h * w
    tgt = np.full(n, -1, dtype=np.int64)
    tgt[flows.ravel()] = ((ys[flows] + dya[flows]) * w
                          + xs[flows] + dxa[flows]).astype(np.int64)

    acc = valid.ravel().astype(np.int64)
    indeg = np.zeros(n, dtype=np.int64)
    has = tgt >= 0
    np.add.at(indeg, tgt[has], 1)
    vf = valid.ravel()
    processed = ~vf
    sink = np.arange(n, dtype=np.int64)
    frontier = vf & (indeg == 0)
    while frontier.any():
        idx = np.flatnonzero(frontier)
        t = tgt[idx]
        hh = t >= 0
        np.add.at(acc, t[hh], acc[idx[hh]])
        np.subtract.at(indeg, t[hh], 1)
        processed[idx] = True
        frontier = vf & ~processed & (indeg == 0)
    # sink routing: absorbing pointer doubling over the whole raster.
    # When the jump target t absorbs (fin[t] < 0), v inherits t's
    # RESOLVED terminal sink[t] (t itself only when t is the terminal —
    # sink is initialized to self and terminals never update).
    fin = tgt.copy()
    while (fin >= 0).any():
        li = np.flatnonzero(fin >= 0)
        t = fin[li]
        nstep = fin[t]
        sink[li] = np.where(nstep >= 0, sink[li], sink[t])
        fin[li] = nstep
    return valid, acc.reshape(h, w), sink.reshape(h, w)


def build_flow_accumulation(sf: float) -> pa.Table:
    """log2-band census of the exact global D8 flow accumulation."""
    valid, acc, _sink = _dense_flow(sf)
    vals = acc[valid]
    _, expo = np.frexp(vals.astype(np.float64))
    band = (expo - 1).astype(np.int64)
    rows = []
    for b in np.unique(band):
        sel = band == b
        rows.append((int(b), int(sel.sum()), int(vals[sel].sum()),
                     int(vals[sel].max())))
    rows.sort()
    return pa.table({
        "acc_band": pa.array([r[0] for r in rows], type=pa.int32()),
        "n_pixels": pa.array([r[1] for r in rows], type=pa.int64()),
        "sum_acc": pa.array([r[2] for r in rows], type=pa.int64()),
        "max_acc": pa.array([r[3] for r in rows], type=pa.int64()),
    })


def build_watershed_basins(sf: float) -> pa.Table:
    """log2-size-band census of D8 watershed basins (pixels grouped by
    terminal sink)."""
    valid, _acc, sink = _dense_flow(sf)
    sizes = np.bincount(
        np.unique(sink[valid], return_inverse=True)[1])
    _, expo = np.frexp(sizes.astype(np.float64))
    band = (expo - 1).astype(np.int64)
    rows = []
    for b in np.unique(band):
        sel = band == b
        rows.append((int(b), int(sel.sum()), int(sizes[sel].sum())))
    rows.sort()
    return pa.table({
        "size_band": pa.array([r[0] for r in rows], type=pa.int32()),
        "n_basins": pa.array([r[1] for r in rows], type=pa.int64()),
        "n_pixels": pa.array([r[2] for r in rows], type=pa.int64()),
    })


def build_twi_census(sf: float, cellsize: float = 10.0) -> pa.Table:
    """TWI = ln(acc * cellsize / tan beta) census over Horn-interior
    cells — the Horn gradient written out independently here (dense
    whole-raster shifts, no tiling), acc from _dense_flow."""
    r = _full_raster(sf)
    valid, acc, _sink = _dense_flow(sf)
    h, w = r.shape
    p = np.pad(r, 1, constant_values=np.nan)
    a = p[0:h, 0:w]
    b = p[0:h, 1:w + 1]
    c = p[0:h, 2:w + 2]
    d = p[1:h + 1, 0:w]
    f_ = p[1:h + 1, 2:w + 2]
    g = p[2:h + 2, 0:w]
    hh = p[2:h + 2, 1:w + 1]
    i = p[2:h + 2, 2:w + 2]
    ok = valid & ~(np.isnan(a) | np.isnan(b) | np.isnan(c) | np.isnan(d)
                   | np.isnan(f_) | np.isnan(g) | np.isnan(hh)
                   | np.isnan(i))
    ok &= acc > 0
    with np.errstate(all="ignore"):
        dzdx = ((c + 2.0 * f_ + i) - (a + 2.0 * d + g)) / (8.0 * cellsize)
        dzdy = ((g + 2.0 * hh + i) - (a + 2.0 * b + c)) / (8.0 * cellsize)
        tanb = np.maximum(np.sqrt(dzdx * dzdx + dzdy * dzdy), 1e-3)
        twi = np.log(acc.astype(np.float64) * cellsize / tanb)
    vals = twi[ok]
    band = np.floor(vals).astype(np.int64)
    fp = np.floor(vals * 1e6 + 0.5).astype(np.int64)
    rows = sorted((int(bb), int((band == bb).sum()),
                   int(fp[band == bb].sum())) for bb in np.unique(band))
    return pa.table({
        "twi_band": pa.array([r_[0] for r_ in rows], type=pa.int32()),
        "n_pixels": pa.array([r_[1] for r_ in rows], type=pa.int64()),
        "checksum": pa.array([r_[2] for r_ in rows], type=pa.int64()),
    })


def _dense_tgt(r: np.ndarray):
    """Per-cell D8 flat target (-1 = sink) plus the outgoing step's
    diagonal flag, rebuilt dense over the whole raster (no tiling);
    shared by the stream-order and flow-length builders."""
    from remotior_sensus_spark.operators.geostats import _D8, _d8_best

    h, w = r.shape
    pad = np.pad(r, 1, constant_values=np.nan)
    codes, interior = _d8_best(pad, slice(1, 1 + h), slice(1, 1 + w))
    dxa = np.zeros((h, w), dtype=np.int64)
    dya = np.zeros((h, w), dtype=np.int64)
    dga = np.zeros((h, w), dtype=np.int64)
    for dx, dy, code, diag in _D8:
        m = interior & (codes == code)
        dxa[m] = dx
        dya[m] = dy
        dga[m] = diag
    flows = interior & (codes != 0)
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    n = h * w
    tgt = np.full(n, -1, dtype=np.int64)
    tgt[flows.ravel()] = ((ys[flows] + dya[flows]) * w
                          + xs[flows] + dxa[flows]).astype(np.int64)
    diag_step = np.zeros(n, dtype=np.int64)
    diag_step[flows.ravel()] = dga[flows]
    return tgt, diag_step


def build_stream_order(sf: float, threshold: int = 2) -> pa.Table:
    """Strahler stream-order census over channel cells (global flow
    accumulation >= threshold), resolved by a plain per-node
    topological queue — a deliberately simple dict + deque
    implementation, independent of the engine's vectorized peels.
    Heads are order 1; elsewhere order = max child order, +1 when the
    max is attained by >= 2 children."""
    from collections import defaultdict, deque

    valid, acc, _sink = _dense_flow(sf)
    tgt, _diag = _dense_tgt(_full_raster(sf))
    accf = acc.ravel()
    chan = valid.ravel() & (accf >= threshold)
    cells = np.flatnonzero(chan).tolist()
    cellset = set(cells)
    children = defaultdict(int)
    for v in cells:
        t = int(tgt[v])
        if t >= 0:
            assert t in cellset, "channel set not closed downstream"
            children[t] += 1
    maxo = defaultdict(int)
    cmx = defaultdict(int)
    q = deque(v for v in cells if children[v] == 0)
    order = {}
    while q:
        v = q.popleft()
        o = 1 if maxo[v] == 0 else maxo[v] + (1 if cmx[v] >= 2 else 0)
        order[v] = o
        t = int(tgt[v])
        if t >= 0:
            if o > maxo[t]:
                maxo[t], cmx[t] = o, 1
            elif o == maxo[t]:
                cmx[t] += 1
            children[t] -= 1
            if children[t] == 0:
                q.append(t)
    assert len(order) == len(cells), "strahler queue left cells unresolved"
    agg = {}
    for v, o in order.items():
        n, mx = agg.get(o, (0, 0))
        agg[o] = (n + 1, max(mx, int(accf[v])))
    rows = sorted((o, n, mx) for o, (n, mx) in agg.items())
    return pa.table({
        "strahler_order": pa.array([r[0] for r in rows], type=pa.int32()),
        "n_cells": pa.array([r[1] for r in rows], type=pa.int64()),
        "max_acc": pa.array([r[2] for r in rows], type=pa.int64()),
    })


def build_flow_length(sf: float) -> pa.Table:
    """Downstream flow-length census: per valid cell, walk the D8
    pointer chain counting cardinal/diagonal steps (plain memoized
    per-cell Python walk — independent of the engine's weighted
    pointer doubling). Length fixed point = a*1_000_000 + b*1_414_214;
    band = log2 of total step count, -1 for sinks."""
    r = _full_raster(sf)
    valid = ~np.isnan(r)
    tgt, diag = _dense_tgt(r)
    n = tgt.size
    A = np.full(n, -1, dtype=np.int64)
    B = np.full(n, -1, dtype=np.int64)
    for v in np.flatnonzero(valid.ravel()).tolist():
        path = []
        cur = v
        while A[cur] < 0:
            if tgt[cur] < 0:
                A[cur] = 0
                B[cur] = 0
                break
            path.append(cur)
            cur = int(tgt[cur])
        for u in reversed(path):
            t = int(tgt[u])
            A[u] = A[t] + (1 - diag[u])
            B[u] = B[t] + diag[u]
    vf = valid.ravel()
    a, b = A[vf], B[vf]
    steps = a + b
    band = np.full(len(steps), -1, dtype=np.int64)
    pos = steps > 0
    _, expo = np.frexp(steps[pos].astype(np.float64))
    band[pos] = expo - 1
    fp = a * 1_000_000 + b * 1_414_214
    rows = sorted(
        (int(bb), int((band == bb).sum()), int(fp[band == bb].sum()),
         int(steps[band == bb].max()))
        for bb in np.unique(band))
    return pa.table({
        "len_band": pa.array([r_[0] for r_ in rows], type=pa.int32()),
        "n_pixels": pa.array([r_[1] for r_ in rows], type=pa.int64()),
        "sum_len_fp": pa.array([r_[2] for r_ in rows], type=pa.int64()),
        "max_steps": pa.array([r_[3] for r_ in rows], type=pa.int64()),
    })


def _dense_priority_flood(r: np.ndarray) -> np.ndarray:
    """Textbook priority-flood fill (Barnes et al. 2014): seed a min-
    heap with every ocean-adjacent cell at its own elevation, pop the
    lowest, settle filled = key, push unvisited neighbours at
    max(z, key). A completely different algorithm family from the
    engine's tile relaxation — the whole point of this oracle. The
    ocean is off-raster plus nodata; 8-connectivity."""
    import heapq

    h, w = r.shape
    valid = ~np.isnan(r)
    filled = np.full((h, w), np.inf)
    filled[~valid] = np.nan
    visited = np.zeros((h, w), dtype=bool)
    heap = []
    offs = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)
            if not (dy == 0 and dx == 0)]
    for y in range(h):
        for x in range(w):
            if not valid[y, x]:
                continue
            for dy, dx in offs:
                yy, xx = y + dy, x + dx
                if not (0 <= yy < h and 0 <= xx < w) or not valid[yy, xx]:
                    heapq.heappush(heap, (r[y, x], y, x))
                    filled[y, x] = r[y, x]
                    break
    while heap:
        fv, y, x = heapq.heappop(heap)
        if visited[y, x]:
            continue
        visited[y, x] = True
        filled[y, x] = fv
        for dy, dx in offs:
            yy, xx = y + dy, x + dx
            if (0 <= yy < h and 0 <= xx < w and valid[yy, xx]
                    and not visited[yy, xx]):
                nf = max(r[yy, xx], fv)
                if nf < filled[yy, xx]:
                    filled[yy, xx] = nf
                    heapq.heappush(heap, (nf, yy, xx))
    assert not np.isinf(filled[valid]).any(), \
        "unreached valid cells (every valid component touches ocean)"
    return filled


def build_fill_depressions(sf: float) -> pa.Table:
    """log2-band census of the fixed-point fill depth
    floor((filled - z)*1e6 + 0.5); band -1 = untouched cells."""
    r = _full_raster(sf)
    filled = _dense_priority_flood(r)
    valid = ~np.isnan(r)
    delta = filled[valid] - r[valid]
    fp = np.floor(delta * 1e6 + 0.5).astype(np.int64)
    band = np.full(len(fp), -1, dtype=np.int64)
    pos = fp > 0
    _, expo = np.frexp(fp[pos].astype(np.float64))
    band[pos] = expo - 1
    rows = sorted(
        (int(bb), int((band == bb).sum()), int(fp[band == bb].sum()),
         int(fp[band == bb].max()))
        for bb in np.unique(band))
    return pa.table({
        "fill_band": pa.array([r_[0] for r_ in rows], type=pa.int32()),
        "n_pixels": pa.array([r_[1] for r_ in rows], type=pa.int64()),
        "sum_fill_fp": pa.array([r_[2] for r_ in rows], type=pa.int64()),
        "max_fill_fp": pa.array([r_[3] for r_ in rows], type=pa.int64()),
    })


def build_filled_flow_accumulation(sf: float) -> pa.Table:
    """Flow accumulation over the FILLED DEM (the fill-then-route
    pipeline): heapq priority-flood fill, then the dense D8 resolution
    — both independent of the tiled engine path."""
    r = _full_raster(sf)
    filled = _dense_priority_flood(r)
    valid, acc, _sink = _dense_flow_array(filled)
    vals = acc[valid]
    _, expo = np.frexp(vals.astype(np.float64))
    band = (expo - 1).astype(np.int64)
    rows = []
    for b in np.unique(band):
        sel = band == b
        rows.append((int(b), int(sel.sum()), int(vals[sel].sum()),
                     int(vals[sel].max())))
    rows.sort()
    return pa.table({
        "acc_band": pa.array([r_[0] for r_ in rows], type=pa.int32()),
        "n_pixels": pa.array([r_[1] for r_ in rows], type=pa.int64()),
        "sum_acc": pa.array([r_[2] for r_ in rows], type=pa.int64()),
        "max_acc": pa.array([r_[3] for r_ in rows], type=pa.int64()),
    })


def build_cost_distance(sf: float) -> pa.Table:
    """Independent multi-source Dijkstra (heapq — a DIFFERENT algorithm
    family from the engine's Bellman-Ford tile relaxation) over the
    dense cost raster: sources are cells with value <= 103, step
    weight between 8-adjacent cells is (cu + cv) * 500_000 cardinal /
    (cu + cv) * 707_107 diagonal (exact ints, the engine's fixed-point
    convention), nodata impassable. Census: log2 bands of the
    distance; band -1 = sources, band -2 = unreachable valid cells."""
    import heapq

    r = _full_raster(sf)
    H, W = r.shape
    valid = ~np.isnan(r)
    c = np.where(valid, np.nan_to_num(r, nan=0.0), 0.0).astype(np.int64)
    INF = 1 << 62
    dist = [[INF] * W for _ in range(H)]
    pq = []
    sy, sx = np.nonzero(valid & (r <= 103))
    for y, x in zip(sy.tolist(), sx.tolist()):
        dist[y][x] = 0
        pq.append((0, y, x))
    heapq.heapify(pq)
    nbrs = [(dy, dx, 707107 if dy and dx else 500000)
            for dy in (-1, 0, 1) for dx in (-1, 0, 1)
            if not (dy == 0 and dx == 0)]
    cl = c.tolist()
    vl = valid.tolist()
    while pq:
        d, y, x = heapq.heappop(pq)
        if d > dist[y][x]:
            continue
        cu = cl[y][x]
        for dy, dx, k in nbrs:
            ny, nx = y + dy, x + dx
            if 0 <= ny < H and 0 <= nx < W and vl[ny][nx]:
                nd = d + (cu + cl[ny][nx]) * k
                if nd < dist[ny][nx]:
                    dist[ny][nx] = nd
                    heapq.heappush(pq, (nd, ny, nx))
    da = np.array(dist, dtype=np.int64)[valid]
    band = np.full(len(da), -1, dtype=np.int64)
    band[da >= INF] = -2
    pos = (da > 0) & (da < INF)
    _, expo = np.frexp(da[pos].astype(np.float64))
    band[pos] = expo - 1
    dd = np.where(da >= INF, np.int64(0), da)
    import pandas as pd  # local: expected.py is otherwise pandas-free
    g = pd.DataFrame({"dist_band": band, "n_pixels": 1,
                      "sum_dist_fp": dd, "max_dist_fp": dd}).groupby(
        "dist_band", as_index=False).agg(
        n_pixels=("n_pixels", "sum"), sum_dist_fp=("sum_dist_fp", "sum"),
        max_dist_fp=("max_dist_fp", "max"))
    return pa.table({
        "dist_band": pa.array(g["dist_band"].astype("int32")),
        "n_pixels": pa.array(g["n_pixels"].astype("int64")),
        "sum_dist_fp": pa.array(g["sum_dist_fp"].astype("int64")),
        "max_dist_fp": pa.array(g["max_dist_fp"].astype("int64"))})



def build_cost_allocation(sf: float) -> pa.Table:
    """Independent multi-source Dijkstra with (distance, label) tuple
    priority (heapq on pairs — a DIFFERENT state representation from
    the engine's packed-int64 relaxation): sources are cells with
    value <= 103 labelled by their OWN integer value, ties broken to
    the smaller label by the tuple order, same exact fixed-point step
    weights and nodata-barrier rule as build_cost_distance.  Census:
    (alloc_zone, dist_band) with n/sum/max of the distance; band -1 =
    sources, zone/band -2 = unreachable valid cells."""
    import heapq

    r = _full_raster(sf)
    H, W = r.shape
    valid = ~np.isnan(r)
    c = np.where(valid, np.nan_to_num(r, nan=0.0), 0.0).astype(np.int64)
    INF = 1 << 62
    state = [[(INF, -1)] * W for _ in range(H)]
    pq = []
    sy, sx = np.nonzero(valid & (r <= 103))
    for y, x in zip(sy.tolist(), sx.tolist()):
        lab = int(c[y, x])
        state[y][x] = (0, lab)
        pq.append((0, lab, y, x))
    heapq.heapify(pq)
    nbrs = [(dy, dx, 707107 if dy and dx else 500000)
            for dy in (-1, 0, 1) for dx in (-1, 0, 1)
            if not (dy == 0 and dx == 0)]
    cl = c.tolist()
    vl = valid.tolist()
    while pq:
        d, lab, y, x = heapq.heappop(pq)
        if (d, lab) > state[y][x]:
            continue
        cu = cl[y][x]
        for dy, dx, k in nbrs:
            ny, nx = y + dy, x + dx
            if 0 <= ny < H and 0 <= nx < W and vl[ny][nx]:
                nd = d + (cu + cl[ny][nx]) * k
                if (nd, lab) < state[ny][nx]:
                    state[ny][nx] = (nd, lab)
                    heapq.heappush(pq, (nd, lab, ny, nx))
    census = {}
    for y in range(H):
        for x in range(W):
            if not vl[y][x]:
                continue
            d, lab = state[y][x]
            if d >= INF:
                zone, band, d = -2, -2, 0
            else:
                zone = lab
                band = -1 if d == 0 else d.bit_length() - 1
            n, s, m = census.get((zone, band), (0, 0, 0))
            census[(zone, band)] = (n + 1, s + d, max(m, d))
    keys = sorted(census)
    return pa.table({
        "alloc_zone": pa.array([k[0] for k in keys], type=pa.int32()),
        "dist_band": pa.array([k[1] for k in keys], type=pa.int32()),
        "n_pixels": pa.array([census[k][0] for k in keys],
                             type=pa.int64()),
        "sum_dist_fp": pa.array([census[k][1] for k in keys],
                                type=pa.int64()),
        "max_dist_fp": pa.array([census[k][2] for k in keys],
                                type=pa.int64())})


def build_contour_census(sf: float) -> pa.Table:
    """Independent marching-squares rebuild: an explicit 16-CASE TABLE
    walked per cell in pure Python (the engine enumerates crossing
    pairs vectorized — a different decomposition of the same public
    algorithm), linear edge interpolation, >= level inclusion,
    corner-mean saddle rule, per-segment 2^-20 fixed-point lengths."""
    import math

    r = _full_raster(sf)
    H, W = r.shape
    levels = (1000.0, 2000.0, 3000.0, 4000.0)
    # case -> list of (edge, edge) segments; edges: t/r/b/l;
    # corners bit-packed tl=8, tr=4, br=2, bl=1
    table = {
        8: [("t", "l")], 4: [("t", "r")], 2: [("r", "b")],
        1: [("l", "b")],
        12: [("l", "r")], 6: [("t", "b")], 3: [("l", "r")],
        9: [("t", "b")],
        7: [("t", "l")], 11: [("t", "r")], 13: [("r", "b")],
        14: [("l", "b")],
    }
    out = {}
    for lv in levels:
        n_seg = 0
        s_fp = 0
        for y in range(H - 1):
            for x in range(W - 1):
                tl, tr = r[y, x], r[y, x + 1]
                bl, br = r[y + 1, x], r[y + 1, x + 1]
                if math.isnan(tl) or math.isnan(tr) or \
                        math.isnan(bl) or math.isnan(br):
                    continue
                code = ((tl >= lv) * 8 + (tr >= lv) * 4
                        + (br >= lv) * 2 + (bl >= lv) * 1)
                if code in (0, 15):
                    continue
                if code == 10:       # tl, br saddle
                    segs = ([("t", "r"), ("l", "b")]
                            if tl + tr + bl + br >= 4.0 * lv
                            else [("t", "l"), ("r", "b")])
                elif code == 5:      # tr, bl saddle
                    segs = ([("t", "l"), ("r", "b")]
                            if tl + tr + bl + br >= 4.0 * lv
                            else [("t", "r"), ("l", "b")])
                else:
                    segs = table[code]
                pt = {"t": ((lv - tl) / (tr - tl), 0.0),
                      "r": (1.0, (lv - tr) / (br - tr)),
                      "b": ((lv - bl) / (br - bl), 1.0),
                      "l": (0.0, (lv - tl) / (bl - tl))}
                for e1, e2 in segs:
                    (x1, y1), (x2, y2) = pt[e1], pt[e2]
                    dx, dy = x1 - x2, y1 - y2
                    # explicit sqrt(dx^2+dy^2): engine-side numpy
                    # computes the identical expression (hypot can
                    # differ by 1 ulp between implementations)
                    ln = math.sqrt(dx * dx + dy * dy)
                    n_seg += 1
                    s_fp += int(math.floor(ln * 1048576.0 + 0.5))
        if n_seg:
            out[int(lv)] = (n_seg, s_fp)
    ks = sorted(out)
    return pa.table({
        "level": pa.array(ks, type=pa.int32()),
        "n_segments": pa.array([out[k][0] for k in ks], type=pa.int64()),
        "sum_len_fp": pa.array([out[k][1] for k in ks],
                               type=pa.int64())})


def build_viewshed(sf: float) -> pa.Table:
    """Independent dense viewshed rebuild: whole-raster shifted-array
    sweep per (target-offset, ray-step) pair — a DIFFERENT
    decomposition from the engine's per-observer flat-gather kernel
    (no halo, no observer loop; the blocking test runs as dense masks
    over every candidate observer cell simultaneously). Same public
    definition: observers are valid cells >= 4990, R = 24 Chebyshev,
    R3 sampled LOS with the exact-integer nearest-cell rule,
    cross-multiplied angle comparison on rint(z * 1e6) int64, nodata
    opaque. Census: (n_visible, n_pixels) over valid cells."""
    radius = 24
    r = _full_raster(sf, band_idx=1)
    H, W = r.shape
    valid = ~np.isnan(r)
    zq = np.where(valid, np.rint(np.nan_to_num(r, nan=0.0) * 1e6),
                  0.0).astype(np.int64)
    OPAQUE = np.int64(1) << np.int64(50)
    zq[~valid] = OPAQUE
    obs = valid & (zq >= np.int64(4990) * 1_000_000)
    counts = np.zeros((H, W), dtype=np.int64)

    def minor(m, i, d):
        if m >= 0:
            return (2 * m * i + d) // (2 * d)
        return -((2 * (-m) * i + d) // (2 * d))

    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            d = max(abs(dy), abs(dx))
            if d == 0:
                continue
            # observer slice o; target slice t = o + (dy, dx)
            oy = slice(max(0, -dy), H - max(0, dy))
            ox = slice(max(0, -dx), W - max(0, dx))
            ty = slice(max(0, dy), H - max(0, -dy))
            tx = slice(max(0, dx), W - max(0, -dx))
            z_o = zq[oy, ox]
            z_t = zq[ty, tx]
            blocked = np.zeros(z_o.shape, dtype=bool)
            for i in range(1, d):
                if abs(dy) >= abs(dx):
                    py = i if dy > 0 else -i
                    px = minor(dx, i, d)
                else:
                    px = i if dx > 0 else -i
                    py = minor(dy, i, d)
                z_p = zq[oy.start + py:oy.stop + py,
                         ox.start + px:ox.stop + px]
                blocked |= (z_p - z_o) * d >= (z_t - z_o) * i
            counts[ty, tx] += (obs[oy, ox] & ~blocked
                               & (z_t < OPAQUE)).astype(np.int64)
    counts[obs] += 1
    vals, n = np.unique(counts[valid], return_counts=True)
    return pa.table({
        "n_visible": pa.array(vals.astype("int32")),
        "n_pixels": pa.array(n.astype("int64"))})



def build_corridor(sf: float) -> pa.Table:
    """Independent corridor rebuild: two heapq Dijkstras (sources A =
    cells <= 103, sources B = cells >= 4990) over the dense cost
    raster, then the slack census against C* = min(dA + dB). Same
    exact fixed-point weight convention as build_cost_distance."""
    import heapq

    r = _full_raster(sf)
    H, W = r.shape
    valid = ~np.isnan(r)
    c = np.where(valid, np.nan_to_num(r, nan=0.0), 0.0).astype(np.int64)
    INF = 1 << 62
    nbrs = [(dy, dx, 707107 if dy and dx else 500000)
            for dy in (-1, 0, 1) for dx in (-1, 0, 1)
            if not (dy == 0 and dx == 0)]
    cl = c.tolist()
    vl = valid.tolist()

    def dijkstra(src_mask):
        dist = [[INF] * W for _ in range(H)]
        pq = []
        sy, sx = np.nonzero(src_mask)
        for y, x in zip(sy.tolist(), sx.tolist()):
            dist[y][x] = 0
            pq.append((0, y, x))
        heapq.heapify(pq)
        while pq:
            d, y, x = heapq.heappop(pq)
            if d > dist[y][x]:
                continue
            cu = cl[y][x]
            for dy, dx, k in nbrs:
                ny, nx = y + dy, x + dx
                if 0 <= ny < H and 0 <= nx < W and vl[ny][nx]:
                    nd = d + (cu + cl[ny][nx]) * k
                    if nd < dist[ny][nx]:
                        dist[ny][nx] = nd
                        heapq.heappush(pq, (nd, ny, nx))
        return np.array(dist, dtype=np.int64)

    da = dijkstra(valid & (r <= 103))
    db = dijkstra(valid & (r >= 4990))
    tot = np.where((da < INF) & (db < INF), da + db, INF)[valid]
    reach = tot < INF
    cstar = int(tot[reach].min())
    slack = np.where(reach, tot - cstar, np.int64(0))
    band = np.full(len(tot), -1, dtype=np.int64)
    band[~reach] = -2
    pos = slack > 0
    _, expo = np.frexp(slack[pos].astype(np.float64))
    band[pos] = expo - 1
    import pandas as pd
    g = pd.DataFrame({"slack_band": band, "n_pixels": 1,
                      "sum_slack_fp": slack, "max_slack_fp": slack}).groupby(
        "slack_band", as_index=False).agg(
        n_pixels=("n_pixels", "sum"), sum_slack_fp=("sum_slack_fp", "sum"),
        max_slack_fp=("max_slack_fp", "max"))
    return pa.table({
        "slack_band": pa.array(g["slack_band"].astype("int32")),
        "n_pixels": pa.array(g["n_pixels"].astype("int64")),
        "sum_slack_fp": pa.array(g["sum_slack_fp"].astype("int64")),
        "max_slack_fp": pa.array(g["max_slack_fp"].astype("int64"))})



def build_openness(sf: float) -> pa.Table:
    """Independent dense openness rebuild: whole-raster shifted-slice
    sweep (no tiling, no halo) over the 8 compass directions x R
    steps. Same public definition as geostats.openness_tiles: horizon
    slope (dz * 1024) // i maxed over valid samples within R = 24,
    skipped samples transparent, empty direction contributes 0,
    sign-aware bit_length bands of the 8-direction sum."""
    radius = 24
    r = _full_raster(sf, band_idx=3)
    H, W = r.shape
    valid = ~np.isnan(r)
    zq = np.where(valid, np.rint(np.nan_to_num(r, nan=0.0) * 1e6),
                  0.0).astype(np.int64)
    NEG = np.int64(-(1 << 62))
    score = np.zeros((H, W), dtype=np.int64)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if (dy, dx) == (0, 0):
                continue
            best = np.full((H, W), NEG, dtype=np.int64)
            for i in range(1, radius + 1):
                sy, sx = i * dy, i * dx
                # target cells o whose sample o + (sy, sx) is in bounds
                oy = slice(max(0, -sy), H - max(0, sy))
                ox = slice(max(0, -sx), W - max(0, sx))
                py = slice(max(0, sy), H - max(0, -sy))
                px = slice(max(0, sx), W - max(0, -sx))
                dz = (zq[py, px] - zq[oy, ox]) * 1024 // i
                np.maximum(best[oy, ox],
                           np.where(valid[py, px], dz, NEG),
                           out=best[oy, ox])
            score += np.where(best == NEG, np.int64(0), best)
    sc = score[valid]
    band = np.zeros(len(sc), dtype=np.int64)
    pos = sc != 0
    _, expo = np.frexp(np.abs(sc[pos]).astype(np.float64))
    band[pos] = np.sign(sc[pos]) * expo
    vals, n = np.unique(band, return_counts=True)
    return pa.table({
        "open_band": pa.array(vals.astype("int32")),
        "n_pixels": pa.array(n.astype("int64"))})



def build_component_shapes(sf: float) -> pa.Table:
    """Independent per-component shape rebuild on the scanline-BFS
    labeling (_components — a different CC algorithm from the engine's
    hash-to-min + boundary merge): rook perimeter per component from a
    padded foreground mask, compactness band = bit_length of
    (perimeter^2 // area)."""
    value = _binary_mask_raster(sf)
    comps = _components(value, same_value=False)
    H, W = value.shape
    fgp = np.zeros((H + 2, W + 2), dtype=bool)
    fgp[1:-1, 1:-1] = value > 0
    # exposed rook edges per cell
    exposed = ((~fgp[:-2, 1:-1]).astype(np.int64)
               + (~fgp[2:, 1:-1]) + (~fgp[1:-1, :-2])
               + (~fgp[1:-1, 2:]))
    from collections import Counter
    census = {}
    for c in comps:
        area = c["size"]
        perim = int(exposed[c["ys"], c["xs"]].sum())
        band = ((perim * perim) // area).bit_length()
        n, sa, sp, mx = census.get(band, (0, 0, 0, 0))
        census[band] = (n + 1, sa + area, sp + perim, max(mx, area))
    bands = sorted(census)
    return pa.table({
        "compact_band": pa.array(bands, type=pa.int32()),
        "n_components": pa.array([census[b][0] for b in bands],
                                 type=pa.int64()),
        "sum_area": pa.array([census[b][1] for b in bands],
                             type=pa.int64()),
        "sum_perimeter": pa.array([census[b][2] for b in bands],
                                  type=pa.int64()),
        "max_area": pa.array([census[b][3] for b in bands],
                             type=pa.int64())})



_GM_LUT = [
    [1, 1, 1, 8, 8, 9, 9, 9, 10],
    [1, 1, 8, 8, 8, 9, 9, 9, 0],
    [1, 4, 6, 6, 7, 7, 9, 0, 0],
    [4, 4, 6, 6, 6, 7, 0, 0, 0],
    [4, 4, 5, 6, 6, 0, 0, 0, 0],
    [3, 3, 5, 5, 0, 0, 0, 0, 0],
    [3, 3, 3, 0, 0, 0, 0, 0, 0],
    [3, 3, 0, 0, 0, 0, 0, 0, 0],
    [2, 0, 0, 0, 0, 0, 0, 0, 0],
]  # [n_minus][n_plus], Jasiewicz & Stepinski 2013 form matrix


def build_geomorphon(sf: float) -> pa.Table:
    """Independent dense geomorphon rebuild: whole-raster shifted-slice
    zenith/nadir sweep per (direction, step) — same public definition
    as geostats.geomorphon_tiles (R = 24, flatness 18/1024, skipped
    samples transparent, empty direction = 0 pattern)."""
    radius, t = 24, 18
    r = _full_raster(sf, band_idx=0)
    H, W = r.shape
    valid = ~np.isnan(r)
    zq = np.where(valid, np.rint(np.nan_to_num(r, nan=0.0) * 1e6),
                  0.0).astype(np.int64)
    NEG = np.int64(-(1 << 62))
    POS = np.int64(1 << 62)
    n_plus = np.zeros((H, W), dtype=np.int64)
    n_minus = np.zeros((H, W), dtype=np.int64)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if (dy, dx) == (0, 0):
                continue
            zen = np.full((H, W), NEG, dtype=np.int64)
            nad = np.full((H, W), POS, dtype=np.int64)
            for i in range(1, radius + 1):
                sy, sx = i * dy, i * dx
                oy = slice(max(0, -sy), H - max(0, sy))
                ox = slice(max(0, -sx), W - max(0, sx))
                py = slice(max(0, sy), H - max(0, -sy))
                px = slice(max(0, sx), W - max(0, -sx))
                dz = (zq[py, px] - zq[oy, ox]) * 1024 // i
                ok = valid[py, px]
                np.maximum(zen[oy, ox], np.where(ok, dz, NEG),
                           out=zen[oy, ox])
                np.minimum(nad[oy, ox], np.where(ok, dz, POS),
                           out=nad[oy, ox])
            has = zen != NEG
            zen_v = np.where(has, zen, np.int64(0))
            nad_v = np.where(has, -nad, np.int64(0))
            n_plus += (zen_v > t) & (zen_v > nad_v)
            n_minus += (nad_v > t) & (nad_v > zen_v)
    lut = np.array(_GM_LUT, dtype=np.int64)
    lf = lut[n_minus[valid], n_plus[valid]]
    vals, n = np.unique(lf, return_counts=True)
    return pa.table({
        "landform": pa.array(vals.astype("int32")),
        "n_pixels": pa.array(n.astype("int64"))})


BUILDERS = {
    "raster_label_histogram": build_raster_label_histogram,
    "sieve_reclass": build_sieve_reclass,
    "polygonize": build_polygonize,
    "polygonize_wkt": build_polygonize_wkt,
    "region_growing": build_region_growing,
    "media_thumbnails": build_media_thumbnails,
    "video_frame_sample": build_video_frames,
    "warp_crs": build_warp_crs,
    "landscape_metrics": build_landscape_metrics,
    "warp_datum": build_warp_datum,
    "warp_crs_bilinear": build_warp_crs_bilinear,
    "flow_accumulation": build_flow_accumulation,
    "watershed_basins": build_watershed_basins,
    "twi_census": build_twi_census,
    "stream_order": build_stream_order,
    "flow_length": build_flow_length,
    "fill_depressions": build_fill_depressions,
    "filled_flow_accumulation": build_filled_flow_accumulation,
    "cost_distance": build_cost_distance,
    "cost_allocation": build_cost_allocation,
    "contour_census": build_contour_census,
    "viewshed_census": build_viewshed,
    "corridor_census": build_corridor,
    "openness_census": build_openness,
    "component_shapes": build_component_shapes,
    "geomorphon_census": build_geomorphon,
}


def expected_dir(sf: float) -> str:
    return os.path.join(geo_dir(sf), "expected")


def ensure_expected(sf: float) -> str:
    """Generate-if-missing (version-stamped: a builder change bumps
    _EXPECTED_VERSION and regenerates stale parquet)."""
    d = expected_dir(sf)
    marker = os.path.join(d, "_VERSION.json")
    if os.path.exists(marker):
        with open(marker) as f:
            if json.load(f).get("version") == _EXPECTED_VERSION:
                return d
    os.makedirs(d, exist_ok=True)
    for name, build in BUILDERS.items():
        pq.write_table(build(sf), os.path.join(d, f"{name}.parquet"),
                       compression="zstd")
    with open(marker, "w") as f:
        json.dump({"version": _EXPECTED_VERSION}, f)
    return d
