"""Band mask, raster edit, vector->raster (rasterize), DOS1 correction,
scale/offset projection.

Reference: tools/band_mask.py:154-235 (mask pixels where a rasterized
mask has given values -> nested where()); tools/raster_edit.py:147-221 +
core/processor_functions.py:2440-2602 (overwrite pixels under a vector
with a constant — here a copy-on-write tile rewrite, no in-place
mutation); util/raster_vector.py:1937-2108 (vector_to_raster pixel_center
burn); preprocessing DOS1 (tools/band_dilation-adjacent; minimum DN from
the cumulative histogram, multiprocess_manager.py:2240-2277); scale/offset
core/processor.py:2566.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from remotior_sensus_spark import NODATA
from remotior_sensus_spark.operators.spatial_join import (
    cover_pixels,
    geometry_cell_cover,
)


def band_mask(band_tiles: DataFrame, mask_tiles: DataFrame,
              mask_values: list[float], out_nodata: float = NODATA) -> DataFrame:
    """Output nodata where the aligned mask band has any of mask_values
    (tools/band_mask.py: nested where(mask==v, nodata, band))."""
    m = mask_tiles.select(
        "tile_x", "tile_y", F.col("pixels").alias("__mask_px")
    )
    j = band_tiles.join(m, ["tile_x", "tile_y"])
    masked = F.zip_with(
        "pixels", "__mask_px",
        lambda x, mk: F.when(mk.isin(*mask_values), F.lit(float(out_nodata)))
        .otherwise(x),
    )
    return j.withColumn("pixels", masked).drop("__mask_px")


def raster_edit(band_tiles: DataFrame, geoms: DataFrame, rects: DataFrame,
                constant: float, *, bandset: str = "S2_2020-01-01",
                band: str = "B04", klass: int | None = None) -> DataFrame:
    """Overwrite pixels under the (class-filtered) geometry with a
    constant — copy-on-write tile rewrite (the Spark-native answer to
    the reference's in-place GDAL band update; SURVEY §2.2). Untouched
    tiles pass through unchanged (no shuffle for them)."""
    g = geoms if klass is None else geoms.filter(F.col("class") == klass)
    r = rects if klass is None else rects.filter(F.col("class") == klass)
    edited_px = cover_pixels(band_tiles, g, r, bandset=bandset, band=band)
    edit_pos = (
        edited_px.select("tile_x", "tile_y", "pos").distinct()
        .groupBy("tile_x", "tile_y")
        .agg(F.collect_set("pos").alias("__edit_pos"))
    )
    t = band_tiles.filter(
        (F.col("bandset") == bandset) & (F.col("band") == band)
    ).join(F.broadcast(edit_pos), ["tile_x", "tile_y"], "left")
    new_px = F.when(
        F.col("__edit_pos").isNull(), F.col("pixels")
    ).otherwise(
        F.zip_with(
            "pixels",
            F.sequence(F.lit(0), F.size("pixels") - 1),
            lambda x, i: F.when(
                F.array_contains(F.col("__edit_pos"), i), F.lit(float(constant))
            ).otherwise(x),
        )
    )
    return t.withColumn("pixels", new_px).drop("__edit_pos")


def rasterize(geoms: DataFrame, rects: DataFrame, tiles: DataFrame,
              value_col: str = "class", *, bandset: str = "S2_2020-01-01",
              band: str = "B04") -> DataFrame:
    """vector -> raster by pixel center: burn the geometry's value onto
    covered pixel centers; overlaps resolve to MAX(value) (deterministic
    burn order — the reference burns feature-by-feature, order-defined;
    we pin the rule). Returns pixel rows (tile_x, tile_y, pos, burn)."""
    px = cover_pixels(tiles, geoms, rects, bandset=bandset, band=band)
    return px.groupBy("tile_x", "tile_y", "pos").agg(
        F.max(value_col).alias("burn")
    )


def rasterize_all_touched(rects: DataFrame, value_col: str = "class",
                          *, pixel_size: float | None = None) -> DataFrame:
    """All-touched vector->raster over the exact rectangle decomposition:
    a pixel is burned when its cell [gx*ps, (gx+1)*ps) x [gy*ps, (gy+1)*ps)
    overlaps a rectangle with POSITIVE area (the GDAL ALL_TOUCHED analogue
    of util/raster_vector.py:1937-2108 vector_to_raster; boundary-only
    contact does not burn — pinned rule). Overlapping burns resolve to
    MAX(value) like `rasterize`.

    Pure Catalyst: per-rect integer pixel ranges -> sequence explode ->
    max-burn aggregation. The explode is bounded by geometry area / ps^2
    per rect; at cluster scale giant geometries should be pre-split by
    cell cover (geometry_cell_cover) so no single rect row explodes
    unboundedly."""
    from remotior_sensus_spark.grid import ORIGIN_X, ORIGIN_Y, PIXEL_SIZE
    ps = float(pixel_size or PIXEL_SIZE)
    # zero-area rects burn nothing (F.sequence DESCENDS when stop<start,
    # so an unguarded degenerate rect on a grid line would burn pixels)
    rects = rects.filter((F.col("xmax") > F.col("xmin"))
                         & (F.col("ymax") > F.col("ymin")))
    gx0 = F.floor((F.col("xmin") - F.lit(ORIGIN_X)) / ps).cast("long")
    gx1 = (F.ceil((F.col("xmax") - F.lit(ORIGIN_X)) / ps) - 1).cast("long")
    gy0 = F.floor((F.lit(ORIGIN_Y) - F.col("ymax")) / ps).cast("long")
    gy1 = (F.ceil((F.lit(ORIGIN_Y) - F.col("ymin")) / ps) - 1).cast("long")
    px = (
        rects.select(F.col(value_col).alias("__v"),
                     F.explode(F.sequence(gx0, gx1)).alias("gx"),
                     F.col("ymin"), F.col("ymax"))
        .select("__v", "gx", F.explode(F.sequence(gy0, gy1)).alias("gy"))
    )
    return px.groupBy("gx", "gy").agg(F.max("__v").alias("burn"))


def rasterize_area_based(rects: DataFrame, value_col: str = "class",
                         *, pixel_size: float | None = None) -> DataFrame:
    """Area-based vector->raster (the reference's vector_to_raster
    area_based=True: rasterize at finer precision, then majority —
    util/raster_vector.py:1937-2108). Here the majority is computed
    EXACTLY from the rect decomposition: per pixel, per value, the
    covered area is summed; the pixel burns to the value with the
    largest area (ties -> larger value), and only when the total
    covered area reaches half the pixel (the majority criterion vs
    background). Areas are integer m^2 on this grid, so the argmax is
    exact — no sub-sampling error bar like the reference's precision
    parameter."""
    from remotior_sensus_spark.grid import ORIGIN_X, ORIGIN_Y, PIXEL_SIZE
    ps = float(pixel_size or PIXEL_SIZE)
    rects = rects.filter((F.col("xmax") > F.col("xmin"))
                         & (F.col("ymax") > F.col("ymin")))
    gx0 = F.floor((F.col("xmin") - F.lit(ORIGIN_X)) / ps).cast("long")
    gx1 = (F.ceil((F.col("xmax") - F.lit(ORIGIN_X)) / ps) - 1).cast("long")
    gy0 = F.floor((F.lit(ORIGIN_Y) - F.col("ymax")) / ps).cast("long")
    gy1 = (F.ceil((F.lit(ORIGIN_Y) - F.col("ymin")) / ps) - 1).cast("long")
    px = (
        rects.select(F.col(value_col).alias("__v"),
                     "xmin", "xmax", "ymin", "ymax",
                     F.explode(F.sequence(gx0, gx1)).alias("gx"))
        .select("__v", "xmin", "xmax", "ymin", "ymax", "gx",
                F.explode(F.sequence(gy0, gy1)).alias("gy"))
    )
    cell_x0 = F.lit(ORIGIN_X) + F.col("gx") * ps
    cell_y1 = F.lit(ORIGIN_Y) - F.col("gy") * ps          # top edge
    ov_x = F.least(F.col("xmax"), cell_x0 + ps) - F.greatest(F.col("xmin"), cell_x0)
    ov_y = F.least(F.col("ymax"), cell_y1) - F.greatest(F.col("ymin"), cell_y1 - ps)
    per_cls = (
        px.withColumn("ov_area", (ov_x * ov_y).cast("long"))
        .groupBy("gx", "gy", "__v")
        .agg(F.sum("ov_area").alias("area"))
    )
    win = per_cls.groupBy("gx", "gy").agg(
        F.max(F.struct(F.col("area"), F.col("__v"))).alias("w"),
        F.sum("area").alias("covered"),
    )
    half = int(ps * ps / 2)
    return win.filter(F.col("covered") >= F.lit(half)).select(
        "gx", "gy", F.col("w.__v").alias("burn")
    )


def dos1_correction(band_px: DataFrame, *, percent_threshold: float = 0.0001) -> DataFrame:
    """DOS1-style dark-object subtraction: per band, subtract the
    cumulative-histogram minimum DN, clamp at 0, keep nodata
    (multiprocess_manager.py:2240-2277 feeding the preprocess formula)."""
    from remotior_sensus_spark.operators.aggregates import cumulative_min_dn

    min_dn = cumulative_min_dn(band_px, percent_threshold)
    j = band_px.join(F.broadcast(min_dn), "band")
    corrected = F.when(
        F.col("value") == NODATA, F.lit(float(NODATA))
    ).otherwise(F.greatest(F.col("value") - F.col("min_dn"), F.lit(0.0)))
    return j.withColumn("corrected", corrected)


def thermal_brightness(band_px: DataFrame, *, ml: float, al: float,
                       k1: float, k2: float) -> DataFrame:
    """Landsat at-sensor brightness temperature (reference
    tools/preprocess_products.py:305-330): at-sensor radiance
    L = ML*DN + AL (RADIANCE_MULT/ADD scene metadata), then
    BT = K2 / ln(K1 / L + 1).  Pure whole-stage-codegen column math —
    one fma-shaped mul+add, one div, one natural log, one div per
    pixel; no Python, no shuffle (the caller aggregates).  Nodata rows
    keep NODATA in the output column.  The K1/K2/ML/AL constants are
    per-scene metadata passed by the caller exactly as the reference
    reads them from MTL files; the registered query injects the same
    double literals into both engines so the fixed-point checksums
    compare exactly."""
    dn = F.col("value")
    radiance = dn * F.lit(ml) + F.lit(al)
    bt = F.lit(k2) / F.log(F.lit(k1) / radiance + F.lit(1.0))
    return band_px.withColumn(
        "bt",
        F.when(dn == NODATA, F.lit(float(NODATA))).otherwise(bt),
    )


def scale_offset(tiles: DataFrame, scale: float, offset: float,
                 nodata: float = NODATA) -> DataFrame:
    """Per-band a*x + b at read time (core/processor.py:2566)."""
    return tiles.withColumn(
        "pixels",
        F.transform(
            "pixels",
            lambda x: F.when(x == nodata, F.lit(float(nodata))).otherwise(
                x.cast("double") * scale + offset
            ),
        ),
    )
