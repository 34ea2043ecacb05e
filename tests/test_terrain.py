"""Horn terrain (slope/aspect/hillshade) vs a dense whole-raster numpy
oracle: the oracle pads the FULL global raster once and applies Horn's
formulas with no tiling at all, so a match proves the halo exchange
assembles every cross-tile 3x3 window correctly."""

import math

import numpy as np
import pytest

from remotior_sensus_spark import NODATA
from remotior_sensus_spark.grid import TILE_PX
from remotior_sensus_spark.operators.terrain import horn_terrain
from remotior_sensus_spark.synth.generate import grid_n

from test_focal_components import _collect_raster, b04, full_raster  # noqa: F401


def dense_horn(full, cellsize=10.0):
    """Whole-raster Horn with nan edges; returns (slope, aspect, hs)."""
    H, W = full.shape
    pad = np.full((H + 2, W + 2), np.nan)
    pad[1:-1, 1:-1] = full
    a = pad[0:-2, 0:-2]
    b = pad[0:-2, 1:-1]
    c = pad[0:-2, 2:]
    d = pad[1:-1, 0:-2]
    e = pad[1:-1, 1:-1]
    f_ = pad[1:-1, 2:]
    g = pad[2:, 0:-2]
    h = pad[2:, 1:-1]
    i = pad[2:, 2:]
    valid = ~(np.isnan(a) | np.isnan(b) | np.isnan(c) | np.isnan(d)
              | np.isnan(e) | np.isnan(f_) | np.isnan(g) | np.isnan(h)
              | np.isnan(i))
    with np.errstate(all="ignore"):
        dzdx = ((c + 2.0 * f_ + i) - (a + 2.0 * d + g)) / (8.0 * cellsize)
        dzdy = ((g + 2.0 * h + i) - (a + 2.0 * b + c)) / (8.0 * cellsize)
        sr = np.arctan(np.sqrt(dzdx * dzdx + dzdy * dzdy))
        slope = sr * (180.0 / math.pi)
        phi = np.arctan2(dzdy, -dzdx)
        compass = 90.0 - phi * (180.0 / math.pi)
        compass = np.where(compass < 0.0, compass + 360.0, compass)
        compass = np.where(compass >= 360.0, compass - 360.0, compass)
        aspect = np.where((dzdx == 0.0) & (dzdy == 0.0), -1.0, compass)
        zen = math.radians(45.0)
        az = math.radians(90.0 - 315.0)
        hs = 255.0 * (math.cos(zen) * np.cos(sr)
                      + math.sin(zen) * np.sin(sr) * np.cos(az - phi))
        hs = np.where(hs < 0.0, 0.0, hs)
    slope = np.where(valid, slope, np.nan)
    aspect = np.where(valid, aspect, np.nan)
    hs = np.where(valid, hs, np.nan)
    return slope, aspect, hs


def _collect_col(ter, col, n, tile_px=TILE_PX):
    # n is the 16-px ingest grid side; total raster size is fixed
    out = np.full((n * TILE_PX, n * TILE_PX), np.nan)
    for r in ter.select("tile_x", "tile_y", col).collect():
        a = np.asarray(r[col], dtype=np.float64).reshape(tile_px, tile_px)
        a[a == NODATA] = np.nan
        out[r["tile_y"] * tile_px:(r["tile_y"] + 1) * tile_px,
            r["tile_x"] * tile_px:(r["tile_x"] + 1) * tile_px] = a
    return out


@pytest.mark.parametrize("col", ["slope", "aspect", "hillshade"])
def test_horn_matches_dense_numpy(spark, b04, col):  # noqa: F811
    n = grid_n(0.001)
    full = full_raster(0.001, 0, 2)
    want = {k: v for k, v in
            zip(("slope", "aspect", "hillshade"), dense_horn(full))}[col]
    got = _collect_col(horn_terrain(b04), col, n)
    assert np.array_equal(np.isnan(got), np.isnan(want))
    m = ~np.isnan(got)
    # bit-exact: tiled kernel and dense oracle run the same double ops
    assert np.array_equal(got[m], want[m])


def test_horn_edges_are_nodata(spark, b04):  # noqa: F811
    n = grid_n(0.001)
    got = _collect_col(horn_terrain(b04), "slope", n)
    # the raster boundary ring has incomplete windows -> all-nan
    assert np.all(np.isnan(got[0, :])) and np.all(np.isnan(got[-1, :]))
    assert np.all(np.isnan(got[:, 0])) and np.all(np.isnan(got[:, -1]))
    # interior has real values somewhere
    assert np.isfinite(got[1:-1, 1:-1]).any()


def test_horn_tile_size_invariance(spark, b04):  # noqa: F811
    from remotior_sensus_spark.operators.retile import retile
    n = grid_n(0.001)
    base = _collect_col(horn_terrain(b04), "slope", n)
    if grid_n(0.001) % 4 == 0:
        big = _collect_col(horn_terrain(retile(b04, 4), tile_px=TILE_PX * 4),
                           "slope", n, tile_px=TILE_PX * 4)
        m = ~np.isnan(base)
        assert np.array_equal(np.isnan(big), np.isnan(base))
        assert np.array_equal(big[m], base[m])
