"""Focal (moving-window) family: neighbor statistics, dilation, erosion,
mode resampling.

Reference: core/processor_functions.py:1354-1464 (raster_neighbor — FFT
convolution for sum/mean, scipy filters for max/min/median/percentile/
std), :1202-1238 (raster_dilation), :1242-1307 (raster_erosion),
:1312-1349 (raster_resample mode); halo plumbing
core/multiprocess_manager.py:3316-3353 (boundary_size).

Spark-first halo exchange: every tile emits itself + 8 shifted copies
keyed by the NEIGHBOR tile (a map-side explode — the cost is 9x tile
rows into one shuffle, the exact analogue of the reference's duplicated
halo reads). The receiving group assembles a (3*16)^2 padded array in
one Arrow batch and runs the vectorized numpy kernel; only the center
tile is emitted. Results are tile-size-invariant (halo covers any
window radius <= 16).

Mode resampling needs no Python at all: re-key pixels to the coarse
grid and take the group mode (count-desc, value-asc tie-break — the
scipy_mode tie rule).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from remotior_sensus_spark import NODATA
from remotior_sensus_spark.grid import TILE_PX

N_PX = TILE_PX * TILE_PX


def structure_mask(size: int, circular: bool = False) -> np.ndarray:
    """(2*size+1)^2 footprint; circular keeps x^2+y^2 <= size^2
    (util/shared_tools.py:304-340)."""
    r = np.arange(-size, size + 1)
    yy, xx = np.meshgrid(r, r, indexing="ij")
    if circular:
        return (xx * xx + yy * yy) <= size * size
    return np.ones((2 * size + 1, 2 * size + 1), dtype=bool)


def _with_halo_groups(band_tiles: DataFrame) -> DataFrame:
    """Emit (target_tx, target_ty, dx, dy, pixels) — each tile shipped to
    itself and its 8 neighbors."""
    offsets = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)
    ])
    return band_tiles.select(
        "tile_x", "tile_y", "pixels", F.explode(offsets).alias("o")
    ).select(
        (F.col("tile_x") + F.col("o.dx")).alias("target_tx"),
        (F.col("tile_y") + F.col("o.dy")).alias("target_ty"),
        F.col("o.dx").alias("dx"),
        F.col("o.dy").alias("dy"),
        "pixels",
    )


def _with_fine_halo_groups(tiles: DataFrame, factor: int,
                           halo_tiles: int = 1) -> DataFrame:
    """Fused retile + halo fan (r06 optimization, guide §2.3/§2.4):
    ship FINE (ingest-size) tiles directly to the coarse
    (factor x ingest-size) halo groups that need them, skipping the
    separate retile shuffle + applyInPandas pass entirely AND fanning
    only the boundary fine tiles to neighbours (a 64-px target needs
    its 4x4 own block plus a `halo_tiles`-wide ring — 36 instead of
    the 144 fine tiles a full 3x3 coarse fan would ship at factor 4).

    Output schema: (target_tx, target_ty, dx, dy, sub_x, sub_y,
    pixels) where (target_tx, target_ty) is the COARSE tile key,
    (dx, dy) the coarse-block offset (same convention as
    _with_halo_groups: source coarse tile = target - (dx, dy)) and
    (sub_x, sub_y) the fine tile's position inside its coarse block.
    _assemble_padded places these rows into the same 3Tx3T pad
    (T = factor * fine_px, centre at [T:2T)) the full-tile fan
    produces, so every radius <= halo_tiles*fine_px kernel is
    unchanged; regions beyond the shipped ring stay NaN, exactly like
    a missing neighbour tile.  Results are bit-identical to
    retile(factor) + _with_halo_groups for any kernel whose window
    radius fits the ring (pinned by test_fine_halo_parity)."""
    if not 1 <= halo_tiles <= factor:
        raise ValueError("halo_tiles must be in [1, factor]")
    src = tiles.select(
        (F.col("tile_x") % factor).alias("sub_x"),
        (F.col("tile_y") % factor).alias("sub_y"),
        F.floor(F.col("tile_x") / factor).cast("int").alias("ntx"),
        F.floor(F.col("tile_y") / factor).cast("int").alias("nty"),
        "pixels",
    )
    # a fine tile reaches coarse neighbour (ox, oy) iff it lies within
    # halo_tiles fine-tiles of that neighbour's block
    ox = F.array_compact(F.array(
        F.lit(0),
        F.when(F.col("sub_x") >= factor - halo_tiles, F.lit(1)),
        F.when(F.col("sub_x") <= halo_tiles - 1, F.lit(-1))))
    oy = F.array_compact(F.array(
        F.lit(0),
        F.when(F.col("sub_y") >= factor - halo_tiles, F.lit(1)),
        F.when(F.col("sub_y") <= halo_tiles - 1, F.lit(-1))))
    return (
        src.withColumn("ox", F.explode(ox))
        .withColumn("oy", F.explode(oy))
        .select(
            (F.col("ntx") + F.col("ox")).alias("target_tx"),
            (F.col("nty") + F.col("oy")).alias("target_ty"),
            F.col("ox").alias("dx"),
            F.col("oy").alias("dy"),
            "sub_x", "sub_y", "pixels",
        )
    )


def _assemble_padded(pdf: pd.DataFrame, return_exists: bool = False,
                     tile_px: int | None = None):
    """3Tx3T array (nan outside provided tiles); center tile at [T:2T, T:2T].
    With return_exists also returns the block-presence mask (True where a
    source tile actually exists — i.e. inside the raster extent), which
    is distinct from nodata pixels inside existing tiles.

    Accepts rows from either halo fan: full coarse tiles
    (_with_halo_groups — block size T at block offset (-dx, -dy)) or
    fine sub-tiles (_with_fine_halo_groups — sub_x/sub_y columns give
    the fine tile's slot inside its coarse block; the fine pixel size
    is inferred from the array length)."""
    T = tile_px or TILE_PX
    pad = np.full((3 * T, 3 * T), np.nan)
    exists = np.zeros((3 * T, 3 * T), dtype=bool) if return_exists else None
    fine = "sub_x" in pdf.columns
    dxs = pdf["dx"].to_numpy()
    dys = pdf["dy"].to_numpy()
    pxs = pdf["pixels"].to_numpy()
    if fine:
        sxs = pdf["sub_x"].to_numpy()
        sys_ = pdf["sub_y"].to_numpy()
    for i in range(len(pdf)):
        a = np.asarray(pxs[i], dtype=np.float64)
        t = int(round(len(a) ** 0.5))
        a = a.reshape(t, t)
        # dx,dy is the SOURCE offset relative to target: source tile
        # (target - dx? ) — source tx = target_tx - dx  => its pixels sit
        # at block offset (-dx, -dy) from the center
        y0 = (1 - dys[i]) * T + (sys_[i] * t if fine else 0)
        x0 = (1 - dxs[i]) * T + (sxs[i] * t if fine else 0)
        pad[y0:y0 + t, x0:x0 + t] = a
        if exists is not None:
            exists[y0:y0 + t, x0:x0 + t] = True
    pad[pad == NODATA] = np.nan
    if return_exists:
        return pad, exists
    return pad


def _window_views(pad: np.ndarray, size: int, tile_px: int | None = None):
    """All (2s+1)^2 windows centered on the middle tile, via stride views."""
    T = tile_px or TILE_PX
    k = 2 * size + 1
    sub = pad[T - size:2 * T + size, T - size:2 * T + size]
    return np.lib.stride_tricks.sliding_window_view(sub, (k, k))  # (T,T,k,k)


def neighbor_stats(band_tiles: DataFrame, stat: str = "sum", size: int = 1,
                   circular: bool = False, percentile: float | None = None,
                   tile_px: int | None = None,
                   fan: DataFrame | None = None) -> DataFrame:
    """Focal statistic per pixel over the structuring element.
    stat in {sum, mean, count, max, min, median, std, percentile}.
    nodata centers stay nodata (reference writes nan back over centers)."""
    T = tile_px or TILE_PX
    struct = structure_mask(size, circular)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        tx = int(pdf["target_tx"].iloc[0])
        ty = int(pdf["target_ty"].iloc[0])
        if not ((pdf["dx"] == 0) & (pdf["dy"] == 0)).any():
            return pd.DataFrame(
                {"tile_x": pd.Series(dtype="int32"),
                 "tile_y": pd.Series(dtype="int32"),
                 "pixels": pd.Series(dtype=object)}
            )
        pad = _assemble_padded(pdf, tile_px=T)
        wins = _window_views(pad, size, tile_px=T)  # (T,T,k,k)
        m = struct[None, None, :, :]
        vals = np.where(m, wins, np.nan)
        with np.errstate(all="ignore"):
            if stat == "sum":
                out = np.nansum(vals, axis=(2, 3))
            elif stat == "count":
                out = (~np.isnan(vals)).sum(axis=(2, 3)).astype(np.float64)
            elif stat == "mean":
                out = np.nansum(vals, axis=(2, 3)) / (~np.isnan(vals)).sum(axis=(2, 3))
            elif stat == "max":
                out = np.nanmax(vals, axis=(2, 3))
            elif stat == "min":
                out = np.nanmin(vals, axis=(2, 3))
            elif stat == "median":
                out = np.nanmedian(vals, axis=(2, 3))
            elif stat == "std":
                out = np.nanstd(vals, axis=(2, 3))
            elif stat == "percentile":
                out = np.nanpercentile(vals, percentile, axis=(2, 3))
            else:
                raise ValueError(stat)
        center = pad[T:2 * T, T:2 * T]
        out = np.where(np.isnan(center), NODATA, out)
        out = np.where(np.isnan(out), NODATA, out)
        return pd.DataFrame(
            {"tile_x": [tx], "tile_y": [ty], "pixels": [out.ravel().tolist()]}
        )

    halo = fan if fan is not None else _with_halo_groups(band_tiles)
    return halo.groupBy("target_tx", "target_ty").applyInPandas(
        kernel, schema="tile_x int, tile_y int, pixels array<double>"
    )


def dilation(band_tiles: DataFrame, values: list[float], size: int = 1,
             circular: bool = True, tile_px: int | None = None,
             fan: DataFrame | None = None) -> DataFrame:
    """Expand each value in `values` (in order) onto neighboring non-value
    pixels (processor_functions.py:1202-1238)."""
    T = tile_px or TILE_PX
    struct = structure_mask(size, circular)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        if not ((pdf["dx"] == 0) & (pdf["dy"] == 0)).any():
            return pd.DataFrame(
                {"tile_x": pd.Series(dtype="int32"),
                 "tile_y": pd.Series(dtype="int32"),
                 "pixels": pd.Series(dtype=object)}
            )
        tx = int(pdf["target_tx"].iloc[0])
        ty = int(pdf["target_ty"].iloc[0])
        pad = _assemble_padded(pdf, tile_px=T)
        a = np.nan_to_num(pad)  # reference: nan->0 before matching
        wins = _window_views(a, size, tile_px=T)
        m = struct[None, None, :, :]
        center = a[T:2 * T, T:2 * T]
        core = ~np.isin(center, np.array(values))
        o = center.copy()
        for v in values:
            near = ((wins == v) & m).any(axis=(2, 3))
            o[core & near] = v
        o[np.isnan(pad[T:2 * T, T:2 * T])] = NODATA
        return pd.DataFrame(
            {"tile_x": [tx], "tile_y": [ty], "pixels": [o.ravel().tolist()]}
        )

    halo = fan if fan is not None else _with_halo_groups(band_tiles)
    return halo.groupBy("target_tx", "target_ty").applyInPandas(
        kernel, schema="tile_x int, tile_y int, pixels array<double>"
    )


def erosion(band_tiles: DataFrame, values: list[float], size: int = 1,
            circular: bool = True, tile_px: int | None = None,
            fan: DataFrame | None = None) -> DataFrame:
    """Erode `values` pixels whose neighborhood isn't uniform; fill with
    the most frequent non-value neighbor (ties -> smallest value), else
    nodata (processor_functions.py:1242-1307, single iteration —
    multi-iteration = repeated calls like the reference's loop)."""
    T = tile_px or TILE_PX
    struct = structure_mask(size, circular)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        if not ((pdf["dx"] == 0) & (pdf["dy"] == 0)).any():
            return pd.DataFrame(
                {"tile_x": pd.Series(dtype="int32"),
                 "tile_y": pd.Series(dtype="int32"),
                 "pixels": pd.Series(dtype=object)}
            )
        tx = int(pdf["target_tx"].iloc[0])
        ty = int(pdf["target_ty"].iloc[0])
        pad, exists = _assemble_padded(pdf, return_exists=True, tile_px=T)
        a = np.where(np.isnan(pad), NODATA, pad)
        uniq = [u for u in np.unique(a) if u != NODATA]
        wins = _window_views(a, size, tile_px=T)
        m = struct[None, None, :, :]
        center = a[T:2 * T, T:2 * T]
        # per-pixel structure count over IN-RASTER cells only: mirrors the
        # reference's convolved sum_structure, which shrinks at the outer
        # raster boundary (processor_functions.py raster_erosion) — cells
        # beyond the raster extent are not mismatches (ADVICE r01 low #4)
        n_struct = (
            (_window_views(exists.astype(np.float64), size, tile_px=T) > 0.5) & m
        ).sum(axis=(2, 3)).astype(np.float64)
        fill = np.full(center.shape, float(NODATA))
        max_cnt = np.zeros(center.shape)
        erode = np.zeros(center.shape, dtype=bool)
        for v in uniq:
            cnt = ((wins == v) & m).sum(axis=(2, 3)).astype(np.float64)
            if v not in values:
                sel = cnt > max_cnt
                fill[sel] = v
                max_cnt[sel] = cnt[sel]
            else:
                erode |= ((n_struct - cnt) > 0.01) & (center == v)
        o = center.copy()
        o[erode] = fill[erode]
        o[np.isnan(pad[T:2 * T, T:2 * T])] = NODATA
        return pd.DataFrame(
            {"tile_x": [tx], "tile_y": [ty], "pixels": [o.ravel().tolist()]}
        )

    halo = fan if fan is not None else _with_halo_groups(band_tiles)
    return halo.groupBy("target_tx", "target_ty").applyInPandas(
        kernel, schema="tile_x int, tile_y int, pixels array<double>"
    )


def resample_mode(band_px: DataFrame, factor: int = 2) -> DataFrame:
    """Mode down-scale: re-key pixels to the coarse grid, group mode with
    scipy_mode's tie rule (smallest value wins) — pure Catalyst, no UDF
    (processor_functions.py:1312-1349)."""
    coarse = band_px.filter(F.col("value") != NODATA).select(
        F.floor((F.col("tile_x") * TILE_PX + F.col("pos") % TILE_PX) / factor)
        .alias("cgx"),
        F.floor((F.col("tile_y") * TILE_PX + (F.col("pos") / TILE_PX).cast("int")) / factor)
        .alias("cgy"),
        "value",
    )
    counts = coarse.groupBy("cgx", "cgy", "value").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("cgx", "cgy").orderBy(F.desc("cnt"), F.asc("value"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("cgx", "cgy", F.col("value").alias("mode_value"), F.col("cnt").alias("mode_count"))
    )


def resample_mode_tiles(band_tiles: DataFrame, factor: int = 2,
                        step: float = 1000.0) -> DataFrame:
    """resample_mode (over quantized classes, the registered query's
    shape) with the per-coarse-cell mode computed INSIDE the tile
    (r06, guide §2.2): for factor dividing TILE_PX every coarse cell
    lies in one tile, so no pixel ever shuffles — one Arrow pass emits
    the (cgx, cgy, mode_value, mode_count) rows directly. Identical
    tie rule (count desc, value asc — the scipy_mode rule) via the
    focal_majority BIGINT argmax encoding (classes in [0, 2^20));
    nodata pixels drop out before voting and empty cells emit nothing,
    mirroring the relational groupBy. Pinned by
    test_resample_mode_tiles_parity and the driver-checked query."""
    import numpy as np

    if TILE_PX % factor != 0:
        raise ValueError("factor must divide TILE_PX")
    T = TILE_PX
    nb = T // factor
    k2 = factor * factor

    def kern(it):
        for pdf in it:
            gxs, gys, mvs, mcs = [], [], [], []
            for _, row in pdf.iterrows():
                a = np.asarray(row["pixels"],
                               dtype=np.float64).reshape(T, T)
                blocks = (a.reshape(nb, factor, nb, factor)
                          .transpose(0, 2, 1, 3).reshape(nb * nb, k2))
                valid = blocks != NODATA
                any_valid = valid.any(axis=1)
                if not any_valid.any():
                    continue
                vi = np.floor(
                    np.where(valid, blocks, 0.0) / step).astype(np.int64)
                best_enc = np.full(nb * nb, -1, dtype=np.int64)
                best_val = np.zeros(nb * nb, dtype=np.int64)
                best_cnt = np.zeros(nb * nb, dtype=np.int64)
                for j in range(k2):
                    vj = vi[:, j]
                    cnt = np.zeros(nb * nb, dtype=np.int64)
                    for k in range(k2):
                        cnt += valid[:, k] & (vi[:, k] == vj)
                    enc = np.where(valid[:, j],
                                   cnt * 1048576 + (1048575 - vj),
                                   np.int64(-1))
                    better = enc > best_enc
                    best_enc = np.where(better, enc, best_enc)
                    best_val = np.where(better, vj, best_val)
                    best_cnt = np.where(better, cnt, best_cnt)
                tx = int(row["tile_x"])
                ty = int(row["tile_y"])
                ii = np.flatnonzero(any_valid)
                by, bx = ii // nb, ii % nb
                gxs.append(tx * nb + bx)
                gys.append(ty * nb + by)
                mvs.append(best_val[ii])
                mcs.append(best_cnt[ii])
            if not gxs:
                continue
            yield pd.DataFrame({
                "cgx": np.concatenate(gxs).astype(np.int64),
                "cgy": np.concatenate(gys).astype(np.int64),
                "mode_value": np.concatenate(mvs).astype(np.int64),
                "mode_count": np.concatenate(mcs).astype(np.int64)})

    return band_tiles.select("tile_x", "tile_y", "pixels").mapInPandas(
        kern, "cgx long, cgy long, mode_value long, mode_count long")


def erosion_iterative(band_tiles: DataFrame, values: list[float],
                      iterations: int, circular: bool = True,
                      tile_px: int | None = None) -> DataFrame:
    """The reference's band_erosion `size` semantics: `iterations`
    successive single-step erosions with a fixed radius-1 structure
    (processor_functions.py:1262 `for _ in range(size)`;
    tools/band_erosion.py:114-117). Each step is one halo shuffle;
    Catalyst pipelines the chain."""
    out = band_tiles
    # iterations=0 is a no-op like the reference's `for _ in range(size)`
    for _ in range(iterations):
        out = erosion(out, values, size=1, circular=circular, tile_px=tile_px)
    return out
