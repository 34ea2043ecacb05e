"""Deterministic tile grid + Z-order (Morton) cell keys.

Replaces the reference's GDAL geotransform + y-strip partitioning
(reference: core/processor.py:2461-2564 RasterSection/RasterPiece,
core/multiprocess_manager.py:3120-3190 block sizing) with a fixed-size
tile grid keyed by a Z-order cell key.  The cell key is the engine's
spatial partitioning/join key (north_rule: "H3/S2 index"); a Z-order
integer key is used because it is pip-free, exactly reproducible in
both Spark and ANSI SQL, and prefix-truncation (``cell_key >> 2k``)
gives the same hierarchical coarsening as H3 resolution changes.

Grid convention (mirrors the reference fixtures: UTM-33N-like grid,
10 m pixels, origin (230250, 4674550) — tests/data/S2_2020-01-01):
  * pixel size  : 10.0 m, north-up (y decreases as row index grows)
  * tile size   : 16 x 16 pixels  -> 160 m x 160 m
  * pixel center: (ORIGIN_X + gx*10 + 5, ORIGIN_Y - gy*10 - 5)
    where gx = tile_x*16 + px, gy = tile_y*16 + py.
Because every geometry coordinate we generate is a multiple of 10 and
pixel centers are ≡5 (mod 10), point-in-polygon tests never hit a
boundary tie.
"""

from __future__ import annotations

import numpy as np

PIXEL_SIZE = 10.0
TILE_PX = 16
TILE_SIZE_M = PIXEL_SIZE * TILE_PX
ORIGIN_X = 230250.0
ORIGIN_Y = 4674550.0
MORTON_BITS = 16  # tile_x / tile_y each < 2**16


def _spread_bits16(v: np.ndarray) -> np.ndarray:
    """Interleave-ready bit spread: 16-bit int -> 32-bit with zeros between."""
    v = v.astype(np.uint64)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
    return v


def morton_key(tile_x, tile_y) -> np.ndarray:
    """Z-order key of a tile coordinate (vectorized; scalars ok)."""
    tx = np.asarray(tile_x)
    ty = np.asarray(tile_y)
    return (_spread_bits16(tx) | (_spread_bits16(ty) << np.uint64(1))).astype(np.int64)


def _compact_bits16(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.uint64) & np.uint64(0x5555555555555555)
    v = (v | (v >> np.uint64(1))) & np.uint64(0x3333333333333333)
    v = (v | (v >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
    return v


def morton_decode(key) -> tuple[np.ndarray, np.ndarray]:
    k = np.asarray(key).astype(np.uint64)
    return (
        _compact_bits16(k).astype(np.int64),
        _compact_bits16(k >> np.uint64(1)).astype(np.int64),
    )


def cell_prefix(key, shift: int = 8) -> np.ndarray:
    """Hierarchical coarsening: drop `shift` low bits (shift=2k coarsens
    the grid by 2**k in each axis). Partition column of the tiles table."""
    return (np.asarray(key).astype(np.int64) >> shift).astype(np.int64)


def tile_origin(tile_x, tile_y) -> tuple[np.ndarray, np.ndarray]:
    tx = np.asarray(tile_x, dtype=np.float64)
    ty = np.asarray(tile_y, dtype=np.float64)
    return ORIGIN_X + tx * TILE_SIZE_M, ORIGIN_Y - ty * TILE_SIZE_M


def tile_range_for_bbox(xmin: float, ymin: float, xmax: float, ymax: float):
    """Inclusive tile-coordinate range whose pixel centers could fall in
    the bbox. Used for geometry cell-cover (SURVEY.md §2.3 vector↔raster
    join: geometries -> cell cover -> equi-join on cell key)."""
    tx0 = int(np.floor((xmin - ORIGIN_X) / TILE_SIZE_M))
    tx1 = int(np.floor((xmax - ORIGIN_X - 1e-9) / TILE_SIZE_M))
    ty0 = int(np.floor((ORIGIN_Y - ymax) / TILE_SIZE_M))
    ty1 = int(np.floor((ORIGIN_Y - ymin - 1e-9) / TILE_SIZE_M))
    return max(tx0, 0), max(ty0, 0), tx1, ty1


def pixel_centers(tile_x: int, tile_y: int):
    """(cx, cy) arrays of shape (TILE_PX*TILE_PX,) in row-major y,x order."""
    gx = tile_x * TILE_PX + np.arange(TILE_PX)
    gy = tile_y * TILE_PX + np.arange(TILE_PX)
    cx = ORIGIN_X + gx * PIXEL_SIZE + PIXEL_SIZE / 2
    cy = ORIGIN_Y - gy * PIXEL_SIZE - PIXEL_SIZE / 2
    cxg, cyg = np.meshgrid(cx, cy)  # row-major: y outer, x inner
    return cxg.ravel(), cyg.ravel()
