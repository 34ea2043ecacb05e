"""Affine warp / reprojection.

Reference: util/raster_vector.py:3039-3108 (gdal_warping) and
:1795-1921 (vector reprojection). The reference shells out to GDAL with
a PROJ pipeline; this engine re-expresses the same-datum AFFINE subset
(scale / shift / rotation / shear between grids) as a pure relational
plan — the path every cross-grid mosaic/clip/cross-classification in
the fixtures actually needs. Full PROJ datum shifts are out of scope in
this sandbox (no proj lib) and documented as such.

Spark-first inverse mapping (the textbook warp):
  1. the OUTPUT pixel lattice is generated JVM-side (range x range x
     sequence — no Python),
  2. each output pixel center maps through the inverse affine to a
     source pixel key (floor math, whole-stage codegen),
  3. ONE equi-join on (source gx, gy) against the exploded source
     pixels fetches values — shuffle-partitioned by key, no UDF,
  4. misses (outside the source extent) fill with nodata.

Resampling: nearest / bilinear / cubic (Keys a=-0.5, gdal's default
cubic kernel) by inverse mapping, mode / average by forward mapping
(downscale aggregation). focal.resample_mode remains the grid-aligned
integer-factor fast path (the reference's other resample entry).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from remotior_sensus_spark import NODATA
from remotior_sensus_spark.grid import ORIGIN_X, ORIGIN_Y, PIXEL_SIZE, TILE_PX

Affine = tuple[float, float, float, float, float, float]
# (a, b, c, d, e, f): x' = a*x + b*y + c ; y' = d*x + e*y + f


def invert_affine(t: Affine) -> Affine:
    a, b, c, d, e, f = t
    det = a * e - b * d
    if det == 0:
        raise ValueError("singular affine transform")
    ia, ib = e / det, -b / det
    id_, ie = -d / det, a / det
    ic = -(ia * c + ib * f)
    if_ = -(id_ * c + ie * f)
    return ia, ib, ic, id_, ie, if_


def apply_affine(t: Affine, x, y):
    a, b, c, d, e, f = t
    return a * x + b * y + c, d * x + e * y + f


def warp_affine(band_tiles: DataFrame, forward: Affine,
                *, tile_px: int | None = None,
                nodata: float = NODATA,
                resampling: str = "nearest") -> DataFrame:
    """Warp a single-band tile set through a forward (src->dst) affine.
    Returns output pixel rows (tile_x, tile_y, pos, value) on the same
    tile scheme/grid origin.

    ``resampling``: 'nearest' (one equi-join on the floor-mapped source
    pixel), 'bilinear' (each output pixel explodes to its 4 source
    corners with (1-wu/wu)x(1-wv/wv) weights, one equi-join, then a
    deterministic fixed-order weighted combine renormalized over the
    VALID contributors — gdal.Warp bilinear nodata semantics; an output
    pixel with no valid contributor is nodata), or 'cubic' (4x4 Keys
    cubic-convolution taps, a=-0.5 — gdal.Warp's default cubic kernel —
    same valid-contributor renormalization, nodata when the weight sum
    of valid taps is zero), or 'mode' / 'average' (FORWARD-mapped
    downscale aggregation: each valid source pixel lands in one output
    pixel; mode = most frequent value with smallest-value tie-break,
    average = arithmetic mean). The reference's gdal_warping resampling
    modes (util/raster_vector.py:3039-3108); grid-aligned
    integer-factor mode lives in focal.resample_mode.

    The output extent is the bbox of the transformed source corners
    (one tiny agg). All per-pixel math is Column arithmetic.
    """
    if resampling not in ("nearest", "bilinear", "cubic", "mode", "average"):
        raise ValueError(f"unknown resampling {resampling!r}")
    spark = band_tiles.sparkSession
    t_px = tile_px or TILE_PX
    inv = invert_affine(forward)

    sx0, sx1, sy0, sy1 = _tiles_world_bbox(band_tiles, t_px)
    corners = [apply_affine(forward, x, y)
               for x in (sx0, sx1) for y in (sy0, sy1)]
    otx0, otx1, oty0, oty1 = _floor_tile_extent(
        min(c[0] for c in corners), max(c[0] for c in corners),
        min(c[1] for c in corners), max(c[1] for c in corners), t_px)

    out = _out_lattice(spark, otx0, otx1, oty0, oty1, t_px)
    ox, oy = _pixel_centers(t_px)
    ia, ib, ic, id_, ie, if_ = inv
    sx = F.lit(ia) * ox + F.lit(ib) * oy + F.lit(ic)
    sy = F.lit(id_) * ox + F.lit(ie) * oy + F.lit(if_)

    src = _src_pixels(band_tiles, t_px)

    if resampling in ("mode", "average"):
        # FORWARD mapping (downscale aggregation): each SOURCE pixel
        # center maps through the forward affine to one output pixel;
        # mode = per-(out px, value) count -> argmax (ties: smallest
        # value, gdal's deterministic choice), average = mean of valid
        # source values. One shuffle keyed by output pixel; the output
        # lattice left-joins so uncovered pixels are nodata.
        a, b, c, d, e, f_ = forward
        swx = (F.lit(ORIGIN_X) + F.col("sgx") * F.lit(PIXEL_SIZE)
               + F.lit(PIXEL_SIZE / 2))
        swy = (F.lit(ORIGIN_Y) - F.col("sgy") * F.lit(PIXEL_SIZE)
               - F.lit(PIXEL_SIZE / 2))
        dx = F.lit(a) * swx + F.lit(b) * swy + F.lit(c)
        dy = F.lit(d) * swx + F.lit(e) * swy + F.lit(f_)
        mapped = src.filter(F.col("value") != F.lit(float(nodata))).select(
            F.floor((dx - F.lit(ORIGIN_X)) / F.lit(PIXEL_SIZE))
            .alias("ogx"),
            F.floor((F.lit(ORIGIN_Y) - dy) / F.lit(PIXEL_SIZE))
            .alias("ogy"),
            "value",
        )
        if resampling == "mode":
            counts = mapped.groupBy("ogx", "ogy", "value").count()
            pick = counts.groupBy("ogx", "ogy").agg(
                F.min(F.struct((-F.col("count")).alias("nc"),
                               F.col("value").alias("v"))).alias("m")
            ).select("ogx", "ogy", F.col("m.v").alias("rv"))
        else:
            pick = mapped.groupBy("ogx", "ogy").agg(
                (F.sum("value") / F.count("value")).alias("rv"))
        out = out.withColumn(
            "ogx", (F.col("tile_x").cast("long") * t_px + F.col("pos") % t_px)
        ).withColumn(
            "ogy", (F.col("tile_y").cast("long") * t_px
                    + (F.col("pos") / t_px).cast("int"))
        )
        j = out.join(pick, ["ogx", "ogy"], "left")
        return j.select(
            "tile_x", "tile_y", "pos",
            F.coalesce(F.col("rv"), F.lit(float(nodata))).alias("value"),
        )

    # every source-pixel equi-join below pins shuffle_hash: src is a
    # posexploded raster-scale frame with NO shuffle beneath it, so a
    # bogus compile-time size estimate would statically BROADCAST the
    # whole source raster (the geostats _gj bug class) and AQE never
    # gets a chance to demote it — fatal on a real cluster
    if resampling == "nearest":
        out = out.withColumn(
            "sgx", F.floor((sx - F.lit(ORIGIN_X)) / F.lit(PIXEL_SIZE)).cast("long")
        ).withColumn(
            "sgy", F.floor((F.lit(ORIGIN_Y) - sy) / F.lit(PIXEL_SIZE)).cast("long")
        )
        j = out.join(src.hint("shuffle_hash"), ["sgx", "sgy"], "left")
        return j.select(
            "tile_x", "tile_y", "pos",
            F.coalesce(F.col("value"), F.lit(float(nodata))).alias("value"),
        )

    # bilinear/cubic: continuous source pixel coords (pixel CENTER at
    # integer + 0.5), 4 / 16 tap contributions, renormalized over valid
    # ones. The combine is spelled in a FIXED corner order (c0+c1+...,
    # one final division) so the double result is bit-reproducible in
    # SQL oracles.
    u = (sx - F.lit(ORIGIN_X)) / F.lit(PIXEL_SIZE) - F.lit(0.5)
    v = (F.lit(ORIGIN_Y) - sy) / F.lit(PIXEL_SIZE) - F.lit(0.5)
    out = out.withColumn("u0", F.floor(u).cast("long")) \
             .withColumn("v0", F.floor(v).cast("long")) \
             .withColumn("wu", u - F.floor(u)) \
             .withColumn("wv", v - F.floor(v))
    if resampling == "cubic":
        return _cubic_combine(out, src, nodata)
    corners = out.select(
        "tile_x", "tile_y", "pos", "u0", "v0", "wu", "wv",
        F.explode(F.array(*[F.lit(k) for k in range(4)])).alias("corner"),
    ).select(
        "tile_x", "tile_y", "pos", "corner",
        (F.col("u0") + F.col("corner") % 2).alias("sgx"),
        (F.col("v0") + (F.col("corner") / 2).cast("int")).alias("sgy"),
        ((F.when(F.col("corner") % 2 == 0, F.lit(1.0) - F.col("wu"))
          .otherwise(F.col("wu")))
         * (F.when(F.col("corner") < 2, F.lit(1.0) - F.col("wv"))
            .otherwise(F.col("wv")))).alias("w"),
    )
    j = corners.join(src.hint("shuffle_hash"), ["sgx", "sgy"], "left")
    wide = j.groupBy("tile_x", "tile_y", "pos").agg(
        *[F.max(F.when(F.col("corner") == k, F.col("value"))).alias(f"v{k}")
          for k in range(4)],
        *[F.max(F.when(F.col("corner") == k, F.col("w"))).alias(f"w{k}")
          for k in range(4)],
    )
    nd = F.lit(float(nodata))

    def contrib(k):
        ok = F.col(f"v{k}").isNotNull() & (F.col(f"v{k}") != nd)
        return (F.when(ok, F.col(f"w{k}") * F.col(f"v{k}")).otherwise(F.lit(0.0)),
                F.when(ok, F.col(f"w{k}")).otherwise(F.lit(0.0)))

    nums, dens = zip(*[contrib(k) for k in range(4)])
    num = nums[0] + nums[1] + nums[2] + nums[3]
    den = dens[0] + dens[1] + dens[2] + dens[3]
    return wide.select(
        "tile_x", "tile_y", "pos",
        F.when(den > 0, num / den).otherwise(nd).alias("value"),
    )


def _tiles_world_bbox(band_tiles: DataFrame,
                      t_px: int) -> tuple[float, float, float, float]:
    """World-coordinate bbox of a tile set (one tiny agg):
    (sx0, sx1, sy0, sy1) with sy0 the bottom (min y)."""
    ext = band_tiles.agg(
        F.min("tile_x").alias("x0"), F.max("tile_x").alias("x1"),
        F.min("tile_y").alias("y0"), F.max("tile_y").alias("y1"),
    ).first()
    sx0 = ORIGIN_X + ext["x0"] * t_px * PIXEL_SIZE
    sx1 = ORIGIN_X + (ext["x1"] + 1) * t_px * PIXEL_SIZE
    sy1 = ORIGIN_Y - ext["y0"] * t_px * PIXEL_SIZE      # top (max y)
    sy0 = ORIGIN_Y - (ext["y1"] + 1) * t_px * PIXEL_SIZE  # bottom
    return sx0, sx1, sy0, sy1


def _floor_tile_extent(dx0: float, dx1: float, dy0: float, dy1: float,
                       t_px: int) -> tuple[int, int, int, int]:
    """World bbox -> inclusive output tile index range (the single
    epsilon/floor rule every warp variant and oracle shares)."""
    otx0 = int(np.floor((dx0 - ORIGIN_X) / (t_px * PIXEL_SIZE)))
    otx1 = int(np.floor((dx1 - ORIGIN_X - 1e-9) / (t_px * PIXEL_SIZE)))
    oty0 = int(np.floor((ORIGIN_Y - dy1) / (t_px * PIXEL_SIZE)))
    oty1 = int(np.floor((ORIGIN_Y - dy0 - 1e-9) / (t_px * PIXEL_SIZE)))
    return otx0, otx1, oty0, oty1


def _out_lattice(spark, otx0: int, otx1: int, oty0: int, oty1: int,
                 t_px: int) -> DataFrame:
    """Output pixel lattice (tile_x, tile_y, pos) generated JVM-side."""
    n_px = t_px * t_px
    return (
        spark.range(otx0, otx1 + 1)
        .select(F.col("id").cast("int").alias("tile_x"))
        .crossJoin(spark.range(oty0, oty1 + 1)
                   .select(F.col("id").cast("int").alias("tile_y")))
        .select(
            "tile_x", "tile_y",
            F.explode(F.sequence(F.lit(0), F.lit(n_px - 1))).alias("pos"),
        )
    )


def _pixel_centers(t_px: int):
    """(x, y) world coordinates of the lattice pixel centers."""
    ox = (F.lit(ORIGIN_X)
          + (F.col("tile_x").cast("long") * t_px + F.col("pos") % t_px)
          * F.lit(PIXEL_SIZE) + F.lit(PIXEL_SIZE / 2))
    oy = (F.lit(ORIGIN_Y)
          - (F.col("tile_y").cast("long") * t_px
             + (F.col("pos") / t_px).cast("int")) * F.lit(PIXEL_SIZE)
          - F.lit(PIXEL_SIZE / 2))
    return ox, oy


def _src_pixels(band_tiles: DataFrame, t_px: int) -> DataFrame:
    """Exploded source pixels keyed by global pixel index (sgx, sgy)."""
    return band_tiles.select(
        "tile_x", "tile_y", F.posexplode("pixels").alias("spos", "value")
    ).select(
        (F.col("tile_x").cast("long") * t_px + F.col("spos") % t_px).alias("sgx"),
        (F.col("tile_y").cast("long") * t_px
         + (F.col("spos") / t_px).cast("int")).alias("sgy"),
        F.col("value").cast("double").alias("value"),
    )


def _keys_weight(frac, idx):
    """1-D Keys cubic-convolution weight (a=-0.5) for tap ``idx`` in
    0..3 (source offsets -1..2 around floor(u)) at fractional offset
    ``frac``. Polynomials are spelled in a fixed literal order (matches
    the DuckDB oracle text term-for-term) so the doubles are
    bit-identical across engines:
      inner |s|<=1 : 1.5*s^3 - 2.5*s^2 + 1
      outer 1<|s|<2: -0.5*s^3 + 2.5*s^2 - 4*s + 2
    """
    def inner(s):
        return F.lit(1.5) * s * s * s - F.lit(2.5) * s * s + F.lit(1.0)

    def outer(s):
        return (F.lit(-0.5) * s * s * s + F.lit(2.5) * s * s
                - F.lit(4.0) * s + F.lit(2.0))

    s_m1 = F.lit(1.0) + frac   # tap at u0-1, distance 1+wu
    s_1 = F.lit(1.0) - frac    # tap at u0+1, distance 1-wu
    s_2 = F.lit(2.0) - frac    # tap at u0+2, distance 2-wu
    return (F.when(idx == 0, outer(s_m1))
             .when(idx == 1, inner(frac))
             .when(idx == 2, inner(s_1))
             .otherwise(outer(s_2)))


def _cubic_combine(out: DataFrame, src: DataFrame, nodata: float) -> DataFrame:
    """16-tap cubic combine: explode each output pixel to its 4x4 source
    taps, ONE equi-join on (sgx, sgy), then a fixed-order renormalized
    weighted sum (c0+c1+...+c15 / d0+...+d15). Negative Keys weights
    mean the valid-weight sum can be zero or negative near nodata
    islands; only den == 0 maps to nodata (renormalization stays exact
    for any nonzero den)."""
    cxi = F.col("corner") % 4
    cyi = (F.col("corner") / 4).cast("int")
    taps = out.select(
        "tile_x", "tile_y", "pos", "wu", "wv",
        F.explode(F.array(*[F.lit(k) for k in range(16)])).alias("corner"),
        "u0", "v0",
    ).select(
        "tile_x", "tile_y", "pos", "corner",
        (F.col("u0") + cxi - 1).alias("sgx"),
        (F.col("v0") + cyi - 1).alias("sgy"),
        (_keys_weight(F.col("wu"), cxi)
         * _keys_weight(F.col("wv"), cyi)).alias("w"),
    )
    j = taps.join(src.hint("shuffle_hash"), ["sgx", "sgy"], "left")
    wide = j.groupBy("tile_x", "tile_y", "pos").agg(
        *[F.max(F.when(F.col("corner") == k, F.col("value"))).alias(f"v{k}")
          for k in range(16)],
        *[F.max(F.when(F.col("corner") == k, F.col("w"))).alias(f"w{k}")
          for k in range(16)],
    )
    nd = F.lit(float(nodata))

    def contrib(k):
        ok = F.col(f"v{k}").isNotNull() & (F.col(f"v{k}") != nd)
        return (F.when(ok, F.col(f"w{k}") * F.col(f"v{k}")).otherwise(F.lit(0.0)),
                F.when(ok, F.col(f"w{k}")).otherwise(F.lit(0.0)))

    nums, dens = zip(*[contrib(k) for k in range(16)])
    num = nums[0]
    for c in nums[1:]:
        num = num + c
    den = dens[0]
    for c in dens[1:]:
        den = den + c
    return wide.select(
        "tile_x", "tile_y", "pos",
        F.when(den != F.lit(0.0), num / den).otherwise(nd).alias("value"),
    )


def crs_ring_extent(sx0: float, sx1: float, sy0: float, sy1: float,
                    src_zone: int, dst_zone: int,
                    t_px: int) -> tuple[int, int, int, int]:
    """Destination tile range of a UTM zone-to-zone warp: the source
    world bbox boundary mapped src->geodetic->dst, floored to the tile
    lattice. TM curvature bows the edges, so each edge is sampled at 33
    points (corners alone — or corners+midpoints — under-cover when the
    true extremum sits at the interior point nearest the dst central
    meridian; 33 samples bound the residual sag far below one pixel for
    any zone pair the series itself is valid for). Shared by warp_crs
    and its expected-output oracle builder so the extent rule cannot
    drift."""
    from remotior_sensus_spark.operators import crs as _crs

    s = np.linspace(0.0, 1.0, 33)
    ex = sx0 + (sx1 - sx0) * s
    ey = sy0 + (sy1 - sy0) * s
    xs = np.concatenate([ex, ex,
                         np.full_like(ey, sx0), np.full_like(ey, sx1)])
    ys = np.concatenate([np.full_like(ex, sy0), np.full_like(ex, sy1),
                         ey, ey])
    lat, lon = _crs.tm_inverse(np, xs, ys, _crs.utm_lon0(src_zone))
    dE, dN = _crs.tm_forward(np, lat, lon, _crs.utm_lon0(dst_zone))
    otx0 = int(np.floor((dE.min() - ORIGIN_X) / (t_px * PIXEL_SIZE)))
    otx1 = int(np.floor((dE.max() - ORIGIN_X - 1e-9) / (t_px * PIXEL_SIZE)))
    oty0 = int(np.floor((ORIGIN_Y - dN.max()) / (t_px * PIXEL_SIZE)))
    oty1 = int(np.floor((ORIGIN_Y - dN.min() - 1e-9) / (t_px * PIXEL_SIZE)))
    return otx0, otx1, oty0, oty1


def warp_crs(band_tiles: DataFrame, src_zone: int, dst_zone: int,
             *, tile_px: int | None = None,
             nodata: float = NODATA) -> DataFrame:
    """True cross-CRS warp: reproject a band between UTM zones (WGS84,
    northern hemisphere) with NO affine approximation — every output
    pixel center maps dst-UTM -> geodetic -> src-UTM through the
    Krüger-series transverse-Mercator formulas (operators/crs.py),
    built entirely from Column trig so the whole inverse mapping runs
    JVM-side in whole-stage codegen; ONE equi-join on the floored
    source pixel key fetches values (nearest resampling).

    This is the path the reference delegates to GDAL/PROJ
    (util/raster_vector.py:3039-3108) restricted to a single datum;
    datum shifts (Helmert parameters) would slot in between tm_inverse
    and tm_forward as three more Column expressions."""
    from pyspark.sql import functions as _F

    from remotior_sensus_spark.operators import crs as _crs

    spark = band_tiles.sparkSession
    t_px = tile_px or TILE_PX

    sx0, sx1, sy0, sy1 = _tiles_world_bbox(band_tiles, t_px)
    otx0, otx1, oty0, oty1 = crs_ring_extent(
        sx0, sx1, sy0, sy1, src_zone, dst_zone, t_px)

    out = _out_lattice(spark, otx0, otx1, oty0, oty1, t_px)
    oE, oN = _pixel_centers(t_px)
    sm = _crs.SparkMath(_F)
    lat, lon = _crs.tm_inverse(sm, oE, oN, _crs.utm_lon0(dst_zone))
    sE, sN = _crs.tm_forward(sm, lat, lon, _crs.utm_lon0(src_zone))
    # bind() recorded every series intermediate as a named projection
    # stage (see SparkMath) — replay them, derive the source pixel key,
    # then drop the scaffolding columns
    out = sm.apply_bindings(out)

    src = _src_pixels(band_tiles, t_px)
    out = out.withColumn(
        "sgx", F.floor((sE - F.lit(ORIGIN_X)) / F.lit(PIXEL_SIZE)).cast("long")
    ).withColumn(
        "sgy", F.floor((F.lit(ORIGIN_Y) - sN) / F.lit(PIXEL_SIZE)).cast("long")
    )
    out = sm.drop_bindings(out)
    j = out.join(src.hint("shuffle_hash"), ["sgx", "sgy"], "left")
    return j.select(
        "tile_x", "tile_y", "pos",
        F.coalesce(F.col("value"), F.lit(float(nodata))).alias("value"),
    )


def reproject_vector(geoms: DataFrame, forward: Affine) -> DataFrame:
    """Vector reprojection through the same affine: WKT coordinates and
    bbox are transformed (ref util/raster_vector.py:1795-1921). WKT is
    rewritten in one Arrow batch; bbox columns are pure Column math so
    they stay exactly reproducible in SQL oracles."""
    a, b, c, d, e, f = forward

    # ALL FOUR bbox corners must be transformed: under rotation or
    # mixed-sign shear the extreme lands on a mixed corner like
    # (xmin, ymax), which a two-corner transform never evaluates
    corners = [("xmin", "ymin"), ("xmin", "ymax"),
               ("xmax", "ymin"), ("xmax", "ymax")]
    xs = [F.lit(a) * F.col(cx) + F.lit(b) * F.col(cy) + F.lit(c)
          for cx, cy in corners]
    ys = [F.lit(d) * F.col(cx) + F.lit(e) * F.col(cy) + F.lit(f)
          for cx, cy in corners]
    out = geoms.withColumn("__x0", F.least(*xs)) \
               .withColumn("__x1", F.greatest(*xs)) \
               .withColumn("__y0", F.least(*ys)) \
               .withColumn("__y1", F.greatest(*ys))
    out = (
        out.drop("xmin", "xmax", "ymin", "ymax")
        .withColumnRenamed("__x0", "xmin").withColumnRenamed("__x1", "xmax")
        .withColumnRenamed("__y0", "ymin").withColumnRenamed("__y1", "ymax")
    )

    coeff = (a, b, c, d, e, f)

    def rewrite(it):
        num = r"[-+0-9.eE]+"
        import re
        pair_re = re.compile(rf"({num})\s+({num})")

        def tx(m):
            x, y = float(m.group(1)), float(m.group(2))
            nx = coeff[0] * x + coeff[1] * y + coeff[2]
            ny = coeff[3] * x + coeff[4] * y + coeff[5]
            return f"{nx:.6f} {ny:.6f}"

        for pdf in it:
            if "wkt" in pdf.columns:
                pdf = pdf.copy()
                pdf["wkt"] = [pair_re.sub(tx, w) for w in pdf["wkt"]]
            yield pdf

    return out.mapInPandas(rewrite, schema=out.schema)


def datum_ring_extent(sx0: float, sx1: float, sy0: float, sy1: float,
                      zone: int, t_px: int) -> tuple[int, int, int, int]:
    """Destination tile range of the ED50->WGS84 datum warp — the same
    33-sample bowed-edge rule as crs_ring_extent, through the datum
    pipeline instead of the zone-change one."""
    from remotior_sensus_spark.operators import crs as _crs

    s = np.linspace(0.0, 1.0, 33)
    ex = sx0 + (sx1 - sx0) * s
    ey = sy0 + (sy1 - sy0) * s
    xs = np.concatenate([ex, ex,
                         np.full_like(ey, sx0), np.full_like(ey, sx1)])
    ys = np.concatenate([np.full_like(ex, sy0), np.full_like(ex, sy1),
                         ey, ey])
    dE, dN = _crs.datum_ed50_to_wgs84(np, xs, ys, zone)
    otx0 = int(np.floor((dE.min() - ORIGIN_X) / (t_px * PIXEL_SIZE)))
    otx1 = int(np.floor((dE.max() - ORIGIN_X - 1e-9) / (t_px * PIXEL_SIZE)))
    oty0 = int(np.floor((ORIGIN_Y - dN.max()) / (t_px * PIXEL_SIZE)))
    oty1 = int(np.floor((ORIGIN_Y - dN.min() - 1e-9) / (t_px * PIXEL_SIZE)))
    return otx0, otx1, oty0, oty1


def warp_datum(band_tiles: DataFrame, zone: int,
               *, tile_px: int | None = None,
               nodata: float = NODATA) -> DataFrame:
    """Datum-shifted warp without PROJ: treat the band as ED50/UTM and
    reproject to WGS84/UTM (same zone) — the full classic pipeline
    TM-inverse(WGS84) -> geodetic->ECEF -> negated European-mean
    Helmert -> Bowring -> TM-forward(International 1924) evaluated as
    pure Column math per output pixel center (operators/crs.py), ONE
    equi-join on the floored source pixel key (nearest resampling).
    Closes the datum-shift gap the reference delegates to PROJ
    (util/raster_vector.py:3039-3108)."""
    from pyspark.sql import functions as _F

    from remotior_sensus_spark.operators import crs as _crs

    spark = band_tiles.sparkSession
    t_px = tile_px or TILE_PX

    sx0, sx1, sy0, sy1 = _tiles_world_bbox(band_tiles, t_px)
    otx0, otx1, oty0, oty1 = datum_ring_extent(sx0, sx1, sy0, sy1, zone, t_px)

    out = _out_lattice(spark, otx0, otx1, oty0, oty1, t_px)
    oE, oN = _pixel_centers(t_px)
    sm = _crs.SparkMath(_F)
    sE, sN = _crs.datum_wgs84_to_ed50(sm, oE, oN, zone)
    out = sm.apply_bindings(out)

    src = _src_pixels(band_tiles, t_px)
    out = out.withColumn(
        "sgx", F.floor((sE - F.lit(ORIGIN_X)) / F.lit(PIXEL_SIZE)).cast("long")
    ).withColumn(
        "sgy", F.floor((F.lit(ORIGIN_Y) - sN) / F.lit(PIXEL_SIZE)).cast("long")
    )
    out = sm.drop_bindings(out)
    j = out.join(src.hint("shuffle_hash"), ["sgx", "sgy"], "left")
    return j.select(
        "tile_x", "tile_y", "pos",
        F.coalesce(F.col("value"), F.lit(float(nodata))).alias("value"),
    )


def warp_crs_bilinear(band_tiles: DataFrame, src_zone: int, dst_zone: int,
                      *, tile_px: int | None = None,
                      nodata: float = NODATA) -> DataFrame:
    """Bilinear variant of warp_crs. The continuous source pixel
    coordinate is QUANTIZED to 1/1024 pixel (floor(u*1024+0.5)/1024 —
    exact binary fractions) before the 4-tap combine: JVM and libm trig
    agree to ~1e-11 pixel, so the quantization absorbs that noise
    completely (flip probability ~1e-8/pixel) and every weight, product
    and renormalizing division after it is a deterministic IEEE op both
    the operator and the numpy oracle execute identically — the same
    fixed-subpixel-resolution trick gdal's resampling kernels use. The
    combine is the affine path's fixed-corner-order expression
    (valid-weight renormalized, gdal bilinear nodata semantics)."""
    from pyspark.sql import functions as _F

    from remotior_sensus_spark.operators import crs as _crs

    spark = band_tiles.sparkSession
    t_px = tile_px or TILE_PX

    sx0, sx1, sy0, sy1 = _tiles_world_bbox(band_tiles, t_px)
    otx0, otx1, oty0, oty1 = crs_ring_extent(
        sx0, sx1, sy0, sy1, src_zone, dst_zone, t_px)

    out = _out_lattice(spark, otx0, otx1, oty0, oty1, t_px)
    oE, oN = _pixel_centers(t_px)
    sm = _crs.SparkMath(_F)
    lat, lon = _crs.tm_inverse(sm, oE, oN, _crs.utm_lon0(dst_zone))
    sE, sN = _crs.tm_forward(sm, lat, lon, _crs.utm_lon0(src_zone))
    out = sm.apply_bindings(out)

    u = (sE - F.lit(ORIGIN_X)) / F.lit(PIXEL_SIZE) - F.lit(0.5)
    v = (F.lit(ORIGIN_Y) - sN) / F.lit(PIXEL_SIZE) - F.lit(0.5)
    uq = F.floor(u * F.lit(1024.0) + F.lit(0.5)) / F.lit(1024.0)
    vq = F.floor(v * F.lit(1024.0) + F.lit(0.5)) / F.lit(1024.0)
    out = out.withColumn("u0", F.floor(uq).cast("long")) \
             .withColumn("v0", F.floor(vq).cast("long")) \
             .withColumn("wu", uq - F.floor(uq)) \
             .withColumn("wv", vq - F.floor(vq))
    out = sm.drop_bindings(out)

    src = _src_pixels(band_tiles, t_px)
    corners = out.select(
        "tile_x", "tile_y", "pos", "u0", "v0", "wu", "wv",
        F.explode(F.array(*[F.lit(k) for k in range(4)])).alias("corner"),
    ).select(
        "tile_x", "tile_y", "pos", "corner",
        (F.col("u0") + F.col("corner") % 2).alias("sgx"),
        (F.col("v0") + (F.col("corner") / 2).cast("int")).alias("sgy"),
        ((F.when(F.col("corner") % 2 == 0, F.lit(1.0) - F.col("wu"))
          .otherwise(F.col("wu")))
         * (F.when(F.col("corner") < 2, F.lit(1.0) - F.col("wv"))
            .otherwise(F.col("wv")))).alias("w"),
    )
    j = corners.join(src.hint("shuffle_hash"), ["sgx", "sgy"], "left")
    wide = j.groupBy("tile_x", "tile_y", "pos").agg(
        *[F.max(F.when(F.col("corner") == k, F.col("value"))).alias(f"v{k}")
          for k in range(4)],
        *[F.max(F.when(F.col("corner") == k, F.col("w"))).alias(f"w{k}")
          for k in range(4)],
    )
    nd = F.lit(float(nodata))

    def contrib(k):
        ok = F.col(f"v{k}").isNotNull() & (F.col(f"v{k}") != nd)
        return (F.when(ok, F.col(f"w{k}") * F.col(f"v{k}")).otherwise(F.lit(0.0)),
                F.when(ok, F.col(f"w{k}")).otherwise(F.lit(0.0)))

    nums, dens = zip(*[contrib(k) for k in range(4)])
    num = nums[0] + nums[1] + nums[2] + nums[3]
    den = dens[0] + dens[1] + dens[2] + dens[3]
    return wide.select(
        "tile_x", "tile_y", "pos",
        F.when(den > 0, num / den).otherwise(nd).alias("value"),
    )
