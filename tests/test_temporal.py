"""Temporal operators vs dense whole-canvas numpy oracles (independent
of both the relational plan and the DuckDB SQL mirror).

The third bandset is the overlapping-mosaic fixture: its scene sits on
a grid shifted by half the extent, so the dense oracle lays every scene
onto one large canvas with nan outside each scene's footprint — the
temporal ops must treat off-scene positions as gaps, not zeros."""

import numpy as np

from remotior_sensus_spark import NODATA
from remotior_sensus_spark.grid import TILE_PX
from remotior_sensus_spark.synth.generate import grid_n, tile_pixel_values

BS3 = ["S2_2020-01-01", "S2_2020-01-02", "S2_2020-01-03"]


def scene_raster(bs_idx, band_idx, sf=0.001):
    """One bandset's scene on the union canvas (side n + n//2 tiles):
    nan outside the scene footprint and at nodata pixels."""
    n = grid_n(sf)
    off = n // 2 if bs_idx == 2 else 0
    side = (n + n // 2) * TILE_PX
    out = np.full((side, side), np.nan)
    txg, tyg = np.meshgrid(np.arange(n) + off, np.arange(n) + off,
                           indexing="ij")
    txs, tys = txg.ravel(), tyg.ravel()
    vals = tile_pixel_values(bs_idx, band_idx, txs, tys)
    for (tx, ty), v in zip(zip(txs, tys), vals):
        a = v.reshape(TILE_PX, TILE_PX).astype(np.float64)
        out[ty * TILE_PX:(ty + 1) * TILE_PX,
            tx * TILE_PX:(tx + 1) * TILE_PX] = a
    out[out == NODATA] = np.nan
    return out


def test_bap_composite_dense(spark, geo001_dir):
    from remotior_sensus_spark import queries as Q

    nfp, valid = [], []
    for i in range(3):
        r = scene_raster(i, 2)   # B04
        n = scene_raster(i, 3)   # B08
        ok = ~np.isnan(r) & ~np.isnan(n)
        with np.errstate(all="ignore"):
            f = np.floor((n - r) / (n + r) * 1000000.0 + 0.5)
        nfp.append(np.where(ok, f, np.nan))
        valid.append(ok)
    nfp = np.stack(nfp)          # (3, H, W)
    valid = np.stack(valid)
    any_ok = valid.any(axis=0)
    # encoded argmax: larger NDVI wins, ties -> earliest date
    ordv = np.where(valid, (nfp + 1000000.0) * 8
                    + (7 - np.arange(3)[:, None, None]), -1.0)
    mo = ordv.max(axis=0)
    di = (7 - (mo % 8)).astype(np.int64)
    chosen = ((mo - mo % 8) / 8.0).astype(np.int64) - 1000000
    exp = {}
    for i in range(3):
        m = any_ok & (di == i)
        if m.sum():
            exp[BS3[i]] = (int(m.sum()), int(chosen[m].sum()))

    got = {
        r["bandset"]: (r["pixel_count"], r["ndvi_fp_sum"])
        for r in Q.queries()["bap_composite"](spark, geo001_dir).collect()
    }
    assert got == exp


def test_temporal_fill_dense(spark, geo001_dir):
    from remotior_sensus_spark import queries as Q

    v = [scene_raster(i, 2) for i in range(3)]   # B04 per date
    ok = [~np.isnan(x) for x in v]
    # the relational plan only sees positions covered by SOME tile
    covered = np.zeros_like(ok[0])
    n = grid_n(0.001)
    t = TILE_PX
    covered[:n * t, :n * t] = True                       # scenes 1+2
    covered[(n // 2) * t:, (n // 2) * t:] = True          # scene 3
    vi = [np.where(ok[i], v[i], 0).astype(np.int64) for i in range(3)]
    cat = np.where(ok[1], "valid",
                   np.where(ok[0] & ok[2], "filled", "gap"))
    v2x = np.where(ok[1], vi[1] * 2,
                   np.where(ok[0] & ok[2], vi[0] + vi[2], 0))
    exp = {}
    for c in np.unique(cat[covered]):
        m = covered & (cat == c)
        exp[str(c)] = (int(m.sum()), int(v2x[m].sum()))

    got = {
        r["category"]: (r["pixel_count"], r["value2_sum"])
        for r in Q.queries()["temporal_fill"](spark, geo001_dir).collect()
    }
    assert got == exp


def test_ndvi_trend_tiles_parity(spark, geo001_dir):
    """The r06 tile-array ndvi_trend census is bit-equal to the
    relational exploded-pixel twin."""
    from pyspark.sql import functions as F

    from remotior_sensus_spark.operators import aggregates as agg
    from remotior_sensus_spark.operators import temporal

    BS3 = ["S2_2020-01-01", "S2_2020-01-02", "S2_2020-01-03"]
    tiles = spark.read.parquet(f"{geo001_dir}/tiles.parquet")
    ref = {r["trend_sign"]: (r["pixel_count"], r["trend_num_sum"])
           for r in temporal.ndvi_trend(
               agg.explode_pixels(tiles), BS3).collect()}
    got = {r["trend_sign"]: (r["pixel_count"], r["trend_num_sum"])
           for r in temporal.ndvi_trend_tiles(tiles, BS3).collect()}
    assert got == ref
