"""Geostatistics over the pixel grid: global Moran's I spatial
autocorrelation (rook contiguity) and an experimental semivariogram.

Reference scope: remotior_sensus users compute these on its rasters
with external geostatistics tooling; the formulas are textbook public
knowledge (Moran 1950; Matheron 1963).  Re-expressed Spark-first.

Determinism strategy: every aggregate is an EXACT integer sum over
integer-valued DNs (order-independent under any partitioning), and the
final statistic is a short fixed sequence of double ops on those
scalars — so Spark and the DuckDB oracle agree bit-for-bit without any
fixed-point rounding.  The cross-product term uses the algebraic
expansion
  sum_i (v_i - m)(S_i - c_i m)
    = sum(v_i S_i) - m sum(v_i c_i) - m sum(S_i) + m^2 sum(c_i)
(S_i / c_i = rook-neighbor value-sum / count), which needs only
integer sums; v*S stays well inside int64 at fixture DN ranges (1e4 *
4e4 * n_px) — at larger scale, widen to DECIMAL sums.

Scale shape: ONE shuffle each — the shifted-copy group-by (explode 4
offsets map-side, hash-aggregate on the target coordinate) that every
focal oracle uses, followed by a co-partitioned join back to the pixel
stream; no pairwise self-join ever materializes more than one row per
(pixel, offset).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from remotior_sensus_spark import NODATA
from remotior_sensus_spark.grid import TILE_PX


def _valid_px(band_px: DataFrame) -> DataFrame:
    """(gx, gy, v:long) for valid pixels of an exploded band frame."""
    return band_px.filter(F.col("value") != NODATA).select(
        (F.col("tile_x") * TILE_PX + F.col("pos") % TILE_PX).alias("gx"),
        (F.col("tile_y") * TILE_PX
         + (F.col("pos") / TILE_PX).cast("int")).alias("gy"),
        F.col("value").cast("long").alias("v"),
    )


def morans_i(band_px: DataFrame) -> DataFrame:
    """Global Moran's I with rook (4-neighbour, binary) weights.
    Returns ONE row: (n_pixels, w_sum, morans_i)."""
    px = _valid_px(band_px)
    offsets = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1))
    ])
    nb = (
        px.select("gx", "gy", "v", F.explode(offsets).alias("o"))
        .groupBy(
            (F.col("gx") + F.col("o.dx")).alias("gx"),
            (F.col("gy") + F.col("o.dy")).alias("gy"),
        )
        .agg(F.sum("v").alias("nbs"), F.count("*").alias("nbc"))
    )
    j = px.join(nb, ["gx", "gy"], "left").select(
        "v",
        F.coalesce("nbs", F.lit(0).cast("long")).alias("s"),
        F.coalesce("nbc", F.lit(0).cast("long")).alias("c"),
    )
    sums = j.agg(
        F.count("*").alias("n"),
        F.sum("v").alias("sum_v"),
        F.sum(F.col("v") * F.col("v")).alias("sum_v2"),
        F.sum(F.col("v") * F.col("s")).alias("sum_vs"),
        F.sum(F.col("v") * F.col("c")).alias("sum_vc"),
        F.sum("s").alias("sum_s"),
        F.sum("c").alias("sum_c"),
    )
    n = F.col("n").cast("double")
    m = F.col("sum_v").cast("double") / F.col("n")
    num = (F.col("sum_vs").cast("double")
           - m * F.col("sum_vc").cast("double")
           - m * F.col("sum_s").cast("double")
           + m * m * F.col("sum_c").cast("double"))
    den = (F.col("sum_v2").cast("double")
           - F.lit(2.0) * m * F.col("sum_v").cast("double")
           + m * m * n)
    return sums.select(
        F.col("n").alias("n_pixels"),
        F.col("sum_c").alias("w_sum"),
        ((n / F.col("sum_c").cast("double")) * (num / den)).alias("morans_i"),
    )


def gearys_c(band_px: DataFrame) -> DataFrame:
    """Global Geary's C with rook weights. The pair term expands to
    integer sums too:
      sum_ij w_ij (v_i - v_j)^2
        = sum_i c_i v_i^2 - 2 sum_i v_i S_i + sum_i S2_i
    with S2_i the neighbour sum of squares — so like morans_i the whole
    statistic is exact-integer aggregates plus one fixed double tail:
      C = ((n-1) * pairsum) / (2 W * sum(z^2)).
    Returns ONE row: (n_pixels, w_sum, gearys_c)."""
    px = _valid_px(band_px)
    offsets = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1))
    ])
    nb = (
        px.select("gx", "gy", "v", F.explode(offsets).alias("o"))
        .groupBy(
            (F.col("gx") + F.col("o.dx")).alias("gx"),
            (F.col("gy") + F.col("o.dy")).alias("gy"),
        )
        .agg(F.sum("v").alias("nbs"),
             F.sum(F.col("v") * F.col("v")).alias("nbs2"),
             F.count("*").alias("nbc"))
    )
    j = px.join(nb, ["gx", "gy"], "left").select(
        "v",
        F.coalesce("nbs", F.lit(0).cast("long")).alias("s"),
        F.coalesce("nbs2", F.lit(0).cast("long")).alias("s2"),
        F.coalesce("nbc", F.lit(0).cast("long")).alias("c"),
    )
    sums = j.agg(
        F.count("*").alias("n"),
        F.sum("v").alias("sum_v"),
        F.sum(F.col("v") * F.col("v")).alias("sum_v2"),
        F.sum(F.col("c") * F.col("v") * F.col("v")).alias("sum_cv2"),
        F.sum(F.col("v") * F.col("s")).alias("sum_vs"),
        F.sum("s2").alias("sum_s2"),
        F.sum("c").alias("sum_c"),
    )
    n = F.col("n").cast("double")
    m = F.col("sum_v").cast("double") / F.col("n")
    pairsum = (F.col("sum_cv2").cast("double")
               - F.lit(2.0) * F.col("sum_vs").cast("double")
               + F.col("sum_s2").cast("double"))
    ssz = (F.col("sum_v2").cast("double")
           - F.lit(2.0) * m * F.col("sum_v").cast("double")
           + m * m * n)
    return sums.select(
        F.col("n").alias("n_pixels"),
        F.col("sum_c").alias("w_sum"),
        (((n - F.lit(1.0)) * pairsum)
         / (F.lit(2.0) * F.col("sum_c").cast("double") * ssz))
        .alias("gearys_c"),
    )


def semivariogram(band_px: DataFrame,
                  lags: tuple[int, ...] = (1, 2, 4, 8)) -> DataFrame:
    """Experimental semivariogram along +x: gamma(h) =
    sum((v(x+h,y) - v(x,y))^2) / (2 * N_h) per lag. Pair formation is a
    shifted-copy equi-join (each copy carries its lag), so all lags
    resolve in ONE hash join — no per-lag scan. Returns
    (lag, n_pairs, sum_sq_diff, gamma)."""
    px = _valid_px(band_px)
    lag_arr = F.array(*[F.lit(int(h)) for h in lags])
    shifted = (
        px.select("gx", "gy", "v", F.explode(lag_arr).alias("lag"))
        .select((F.col("gx") + F.col("lag")).alias("gx"), "gy", "lag",
                F.col("v").alias("v0"))
    )
    pairs = shifted.join(px, ["gx", "gy"]).select(
        "lag", ((F.col("v") - F.col("v0"))
                * (F.col("v") - F.col("v0"))).alias("d2")
    )
    g = pairs.groupBy("lag").agg(
        F.count("*").alias("n_pairs"),
        F.sum("d2").alias("sum_sq_diff"),
    )
    return g.select(
        "lag", "n_pairs", "sum_sq_diff",
        (F.col("sum_sq_diff").cast("double")
         / (F.lit(2.0) * F.col("n_pairs").cast("double"))).alias("gamma"),
    )
