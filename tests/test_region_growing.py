import numpy as np
from pyspark.sql import functions as F

from remotior_sensus_spark import NODATA
from remotior_sensus_spark.grid import TILE_PX
from remotior_sensus_spark.operators.components import region_growing
from remotior_sensus_spark.synth.generate import grid_n, tile_pixel_values


def _full_raster(sf=0.001):
    n = grid_n(sf)
    full = np.full((n * TILE_PX, n * TILE_PX), np.nan)
    txs, tys = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    vals = tile_pixel_values(0, 2, txs.ravel(), tys.ravel())
    for (tx, ty), v in zip(zip(txs.ravel(), tys.ravel()), vals):
        a = v.reshape(TILE_PX, TILE_PX).astype(np.float64)
        full[ty * TILE_PX:(ty + 1) * TILE_PX, tx * TILE_PX:(tx + 1) * TILE_PX] = a
    full[full == NODATA] = np.nan
    return full


def _unbounded_fill(full, sy, sx, thr):
    """Whole-raster flood fill oracle (no window — the reference fills
    the entire raster; auto_expand must converge to this)."""
    seed = full[sy, sx]
    exp = set()
    if np.isnan(seed):
        return exp
    ok = np.abs(full - seed) <= thr
    seen = np.zeros_like(ok, dtype=bool)
    stack = [(sy, sx)]
    seen[sy, sx] = True
    while stack:
        y, x = stack.pop()
        exp.add((x, y))
        for ny, nx in ((y - 1, x), (y + 1, x), (y, x - 1), (y, x + 1)):
            if (0 <= ny < full.shape[0] and 0 <= nx < full.shape[1]
                    and ok[ny, nx] and not seen[ny, nx]):
                seen[ny, nx] = True
                stack.append((ny, nx))
    return exp


def test_region_growing_matches_flood_fill(spark, geo001_dir):
    t = spark.read.parquet(f"{geo001_dir}/tiles.parquet").filter(
        (F.col("bandset") == "S2_2020-01-01") & (F.col("band") == "B04")
    )
    got = region_growing(t, 100, 100, 2400.0).toPandas()
    exp = _unbounded_fill(_full_raster(), 100, 100, 2400.0)
    got_set = set(zip(got.gx, got.gy))
    assert got_set == exp
    assert len(got_set) > 1


def test_region_growing_expands_past_initial_window(spark, geo001_dir):
    """A region larger than the starting window must NOT be silently
    truncated: start with max_radius_tiles=0 (a single-tile window the
    fixture region provably overflows) and require the full unbounded
    result via auto-expansion."""
    t = spark.read.parquet(f"{geo001_dir}/tiles.parquet").filter(
        (F.col("bandset") == "S2_2020-01-01") & (F.col("band") == "B04")
    )
    exp = _unbounded_fill(_full_raster(), 100, 100, 2400.0)
    assert any(x < 96 or x > 111 or y < 96 or y > 111 for x, y in exp), \
        "fixture must overflow the seed tile for this test to bite"
    got = region_growing(t, 100, 100, 2400.0, max_radius_tiles=0).toPandas()
    assert set(zip(got.gx, got.gy)) == exp

    # auto_expand=False keeps the bounded (clipped) legacy behavior
    clipped = region_growing(t, 100, 100, 2400.0, max_radius_tiles=0,
                             auto_expand=False).toPandas()
    assert len(clipped) < len(exp)
    assert set(zip(clipped.gx, clipped.gy)) <= exp
