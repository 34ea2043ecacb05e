import numpy as np
from pyspark.sql import functions as F

from remotior_sensus_spark import NODATA
from remotior_sensus_spark.grid import TILE_PX
from remotior_sensus_spark.operators.components import region_growing
from remotior_sensus_spark.synth.generate import grid_n, tile_pixel_values


def test_region_growing_matches_flood_fill(spark, geo001_dir):
    t = spark.read.parquet(f"{geo001_dir}/tiles.parquet").filter(
        (F.col("bandset") == "S2_2020-01-01") & (F.col("band") == "B04")
    )
    got = region_growing(t, 100, 100, 2400.0).toPandas()

    # oracle: assemble the window, flood fill in plain python
    n = grid_n(0.001)
    full = np.full((n * TILE_PX, n * TILE_PX), np.nan)
    txs, tys = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    vals = tile_pixel_values(0, 2, txs.ravel(), tys.ravel())
    for (tx, ty), v in zip(zip(txs.ravel(), tys.ravel()), vals):
        a = v.reshape(TILE_PX, TILE_PX).astype(np.float64)
        full[ty * TILE_PX:(ty + 1) * TILE_PX, tx * TILE_PX:(tx + 1) * TILE_PX] = a
    full[full == NODATA] = np.nan

    gx0, gy0 = 100 - (100 // 16 - 2) * 16, 100 - (100 // 16 - 2) * 16
    # window bounds used by the operator
    lo = (100 // 16 - 2) * 16
    hi = (100 // 16 + 3) * 16
    win = full[lo:hi, lo:hi]
    seed = win[100 - lo, 100 - lo]
    ok = np.abs(win - seed) <= 2400.0
    seen = np.zeros_like(ok, dtype=bool)
    stack = [(100 - lo, 100 - lo)]
    seen[stack[0]] = True
    exp = set()
    while stack:
        y, x = stack.pop()
        exp.add((lo + x, lo + y))
        for ny, nx in ((y-1, x), (y+1, x), (y, x-1), (y, x+1)):
            if (0 <= ny < win.shape[0] and 0 <= nx < win.shape[1]
                    and ok[ny, nx] and not seen[ny, nx]):
                seen[ny, nx] = True
                stack.append((ny, nx))
    got_set = set(zip(got.gx, got.gy))
    assert got_set == exp
    assert len(got_set) > 1
