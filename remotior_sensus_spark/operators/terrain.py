"""Terrain analysis: slope, aspect, hillshade via Horn's method.

Reference scope: remotior_sensus has no terrain tool of its own — it
shells raster derivatives out to GDAL alongside warping
(util/raster_vector.py:3039-3108 runs gdal pipelines); slope / aspect /
hillshade are the gdaldem operations a reference user runs on the same
rasters.  The formulas below are Horn (1981) as published in the GDAL
`gdaldem` documentation — public knowledge, re-expressed on the Spark
tile grid.

Spark-first shape: the 3x3 neighborhood is served by the SAME halo
exchange as every focal operator (focal._with_halo_groups — one
map-side explode, one shuffle on the target tile key), and the kernel
is a single vectorized numpy pass per 64^2 tile inside one Arrow
batch.  At 100 TB this is the scale-correct plan: no pixel-level
shuffle, no per-row Python, partial work proportional to tile count.

Determinism / oracle parity: every per-pixel expression is written as
the exact double-op sequence the DuckDB oracle states (integer sums
first, ONE division by 8*cellsize, atan/sqrt/atan2/cos on doubles), so
Spark-side numpy and the SQL oracle agree bit-for-bit modulo a final
fixed-point rounding.

Conventions (documented, mirrored in the oracles):
- window [[a b c], [d e f], [g h i]] with rows north->south (gy grows
  southward), columns west->east (gx grows eastward);
- dz/dx = ((c + 2f + i) - (a + 2d + g)) / (8 * cellsize)
- dz/dy = ((g + 2h + i) - (a + 2b + c)) / (8 * cellsize)
- slope_deg = atan(sqrt(dzdx^2 + dzdy^2)) * 180/pi
- aspect: gdaldem compass convention — phi = atan2(dzdy, -dzdx),
  compass = 90 - phi_deg, wrapped to [0, 360); flat cells (both
  gradients exactly 0) carry -1;
- hillshade (azimuth 315, altitude 45): 255 * (cos(zen)*cos(s) +
  sin(zen)*sin(s)*cos(az_math - phi)) with az_math = (90 - azimuth)
  wrapped, clamped at 0 — flat-lit value 255*cos(zen);
- a pixel whose 3x3 window has ANY nodata / off-raster cell is nodata
  (edge rows of the raster are nodata, like gdaldem without -compute_edges).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from remotior_sensus_spark import NODATA
from remotior_sensus_spark.grid import TILE_PX
from remotior_sensus_spark.operators.focal import (
    _assemble_padded,
    _with_halo_groups,
)


def horn_terrain(band_tiles: DataFrame, cellsize: float = 10.0,
                 z_factor: float = 1.0, azimuth_deg: float = 315.0,
                 altitude_deg: float = 45.0,
                 tile_px: int | None = None,
                 fan: DataFrame | None = None) -> DataFrame:
    """Per-tile slope/aspect/hillshade arrays (doubles, NODATA where the
    3x3 window is incomplete).  One focal halo shuffle, one numpy pass.

    Returns columns: tile_x, tile_y, slope (deg), aspect (compass deg,
    -1 for flat), hillshade (0..255 double, pre-rounding).
    """
    T = tile_px or TILE_PX
    denom = 8.0 * cellsize / z_factor
    zen = math.radians(90.0 - altitude_deg)
    az_math = math.radians(90.0 - azimuth_deg)
    cos_zen, sin_zen = math.cos(zen), math.sin(zen)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        tx = int(pdf["target_tx"].iloc[0])
        ty = int(pdf["target_ty"].iloc[0])
        if not ((pdf["dx"] == 0) & (pdf["dy"] == 0)).any():
            return pd.DataFrame(
                {"tile_x": pd.Series(dtype="int32"),
                 "tile_y": pd.Series(dtype="int32"),
                 "slope": pd.Series(dtype=object),
                 "aspect": pd.Series(dtype=object),
                 "hillshade": pd.Series(dtype=object)}
            )
        pad = _assemble_padded(pdf, tile_px=T)
        # named 3x3 window cells around every center pixel of the tile:
        # center rows/cols are [T, 2T); north/west shift -1, south/east +1
        rn, r0, rs = slice(T - 1, 2 * T - 1), slice(T, 2 * T), slice(T + 1, 2 * T + 1)
        cw, cc, ce = slice(T - 1, 2 * T - 1), slice(T, 2 * T), slice(T + 1, 2 * T + 1)
        a, b, c = pad[rn, cw], pad[rn, cc], pad[rn, ce]
        d, e, f_ = pad[r0, cw], pad[r0, cc], pad[r0, ce]
        g, h, i = pad[rs, cw], pad[rs, cc], pad[rs, ce]
        valid = ~(np.isnan(a) | np.isnan(b) | np.isnan(c) | np.isnan(d)
                  | np.isnan(e) | np.isnan(f_) | np.isnan(g) | np.isnan(h)
                  | np.isnan(i))
        with np.errstate(all="ignore"):
            # integer-exact sums, then one division — mirrors the oracle
            dzdx = ((c + 2.0 * f_ + i) - (a + 2.0 * d + g)) / denom
            dzdy = ((g + 2.0 * h + i) - (a + 2.0 * b + c)) / denom
            slope_rad = np.arctan(np.sqrt(dzdx * dzdx + dzdy * dzdy))
            slope = slope_rad * (180.0 / math.pi)
            phi = np.arctan2(dzdy, -dzdx)
            compass = 90.0 - phi * (180.0 / math.pi)
            compass = np.where(compass < 0.0, compass + 360.0, compass)
            compass = np.where(compass >= 360.0, compass - 360.0, compass)
            flat = (dzdx == 0.0) & (dzdy == 0.0)
            aspect = np.where(flat, -1.0, compass)
            hs = 255.0 * (cos_zen * np.cos(slope_rad)
                          + sin_zen * np.sin(slope_rad)
                          * np.cos(az_math - phi))
            hs = np.where(hs < 0.0, 0.0, hs)
        slope = np.where(valid, slope, NODATA)
        aspect = np.where(valid, aspect, NODATA)
        hs = np.where(valid, hs, NODATA)
        return pd.DataFrame({
            "tile_x": [tx], "tile_y": [ty],
            "slope": [slope.ravel().tolist()],
            "aspect": [aspect.ravel().tolist()],
            "hillshade": [hs.ravel().tolist()],
        })

    halo = fan if fan is not None else _with_halo_groups(band_tiles)
    return halo.groupBy("target_tx", "target_ty").applyInPandas(
        kernel,
        schema=("tile_x int, tile_y int, slope array<double>, "
                "aspect array<double>, hillshade array<double>"),
    )
