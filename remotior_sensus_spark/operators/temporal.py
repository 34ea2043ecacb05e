"""Multi-date (temporal) raster operators: best-available-pixel
compositing and gap filling across the bandsets of a time series.

Reference scope: remotior_sensus iterates dated bandsets
(`forbandsets[...]` in tools/band_calc.py) and its users build
max-NDVI composites / fill cloud gaps with band_calc expressions over
them; here the cross-date argmax and the gap interpolation are native
relational plans.

Determinism strategy (matches operators/geostats.py): per-(pixel,date)
scores are one fixed double sequence rounded to fixed-point, the
cross-date argmax is a single BIGINT encoding
  ord = (ndvi_fp + 1_000_000) * 8 + (7 - date_idx)
(non-negative, so %/div decode identically in Spark and DuckDB; larger
NDVI wins, ties go to the EARLIEST date), and every output aggregate is
an exact integer sum.

Scale shape: ONE pixel-keyed shuffle builds the (pixel x date) wide
frame (map-side combinable), the argmax is a second combinable
aggregate on the same key — Catalyst reuses the hash partitioning —
and the final histogram moves only (date, count, checksum) rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from remotior_sensus_spark import NODATA
from remotior_sensus_spark.functions.cols import fixed1e6


def bap_composite(px: DataFrame, bandsets: list[str],
                  red: str = "B04", nir: str = "B08") -> DataFrame:
    """Max-NDVI best-available-pixel composite over the dated bandsets:
    each pixel picks the date whose NDVI is highest (both bands valid
    that date; ties -> earliest date).  Emits the per-date selection
    histogram with the exact fixed-point NDVI checksum of the chosen
    pixels: (bandset, pixel_count, ndvi_fp_sum)."""
    dates = F.create_map(*[
        x for i, bs in enumerate(bandsets)
        for x in (F.lit(bs), F.lit(i).cast("long"))
    ])
    wide = (
        px.filter(F.col("band").isin(red, nir)
                  & F.col("bandset").isin(*bandsets))
        .groupBy("tile_x", "tile_y", "pos", "bandset")
        .agg(
            F.max(F.when(F.col("band") == red, F.col("value"))).alias("r"),
            F.max(F.when(F.col("band") == nir, F.col("value"))).alias("n"),
        )
        .filter((F.col("r") != NODATA) & (F.col("n") != NODATA))
    )
    ndvi_fp = fixed1e6(
        (F.col("n").cast("double") - F.col("r").cast("double"))
        / (F.col("n").cast("double") + F.col("r").cast("double")))
    ord_ = ((ndvi_fp + F.lit(1000000).cast("long"))
            * F.lit(8).cast("long")
            + (F.lit(7).cast("long") - dates[F.col("bandset")]))
    best = (
        wide.select("tile_x", "tile_y", "pos", ord_.alias("o"))
        .groupBy("tile_x", "tile_y", "pos")
        .agg(F.max("o").alias("mo"))
    )
    date_idx = F.lit(7).cast("long") - F.col("mo") % F.lit(8).cast("long")
    chosen_fp = ((F.col("mo") - F.col("mo") % F.lit(8).cast("long"))
                 / F.lit(8.0)).cast("long") - F.lit(1000000).cast("long")
    rev = F.create_map(*[
        x for i, bs in enumerate(bandsets)
        for x in (F.lit(i).cast("long"), F.lit(bs))
    ])
    return (
        best.select(rev[date_idx].alias("bandset"), chosen_fp.alias("nfp"))
        .groupBy("bandset")
        .agg(F.count("*").alias("pixel_count"),
             F.sum("nfp").alias("ndvi_fp_sum"))
    )


def temporal_fill(px: DataFrame, bandsets: list[str],
                  band: str = "B04", step: float = 1000.0) -> DataFrame:
    """Linear gap fill of the MIDDLE date from its two neighbours:
    pixels valid at date1 keep their value ('valid'); pixels nodata at
    date1 but valid at dates 0 and 2 take floor((v0+v2)/2) ('filled');
    the rest stay gaps ('gap').  Emits per-category counts with an
    exact integer checksum — twice the filled/kept value, so no /2
    rounding enters the sum: (category, pixel_count, value2_sum)."""
    assert len(bandsets) == 3
    b0, b1, b2 = bandsets
    wide = (
        px.filter((F.col("band") == band) & F.col("bandset").isin(*bandsets))
        .groupBy("tile_x", "tile_y", "pos")
        .agg(*[
            F.max(F.when(F.col("bandset") == bs, F.col("value")))
            .alias(f"v{i}")
            for i, bs in enumerate((b0, b1, b2))
        ])
    )
    v0, v1, v2 = F.col("v0"), F.col("v1"), F.col("v2")
    category = (
        F.when(v1 != NODATA, F.lit("valid"))
        .when((v0 != NODATA) & (v2 != NODATA), F.lit("filled"))
        .otherwise(F.lit("gap"))
    )
    value2 = (
        F.when(v1 != NODATA, v1.cast("long") * 2)
        .when((v0 != NODATA) & (v2 != NODATA),
              v0.cast("long") + v2.cast("long"))
        .otherwise(F.lit(0).cast("long"))
    )
    return (
        wide.select(category.alias("category"), value2.alias("v2x"))
        .groupBy("category")
        .agg(F.count("*").alias("pixel_count"),
             F.sum("v2x").alias("value2_sum"))
    )


def ndvi_trend_tiles(band_tiles: DataFrame, bandsets: list[str],
                     red: str = "B04", nir: str = "B08") -> DataFrame:
    """ndvi_trend on the tile-array path (r06, guide §2.2/§4): the
    relational shape shuffled 39M exploded pixel rows through TWO
    pixel-keyed aggregations; here one tile-keyed pivot (6 array
    columns per tile, ~10K rows) feeds a vectorized Arrow census and
    only bounded (sign, n, sum) partials shuffle. Semantics mirror the
    relational twin exactly: nfp = floor((n-r)/(n+r)*1e6+0.5) on
    doubles, a pixel participates only when BOTH bands are valid on
    ALL three dates (a missing tile/date = invalid), num = nfp2 - nfp0
    (integers end to end). Pinned by test_ndvi_trend_tiles_parity and
    the driver-checked query."""
    import numpy as np
    import pandas as pd

    assert len(bandsets) == 3
    sel = band_tiles.filter(
        F.col("band").isin(red, nir) & F.col("bandset").isin(*bandsets))
    cols = []
    names = []
    for i, bs in enumerate(bandsets):
        for b, tag in ((red, "r"), (nir, "n")):
            nm = f"{tag}{i}"
            names.append(nm)
            cols.append(F.first(
                F.when((F.col("bandset") == bs) & (F.col("band") == b),
                       F.col("pixels")), ignorenulls=True).alias(nm))
    wide = sel.groupBy("tile_x", "tile_y").agg(*cols)

    def kern(it):
        for pdf in it:
            signs, cnts, sums = [], [], []
            for _, row in pdf.iterrows():
                arrs = {}
                ok = True
                size = None
                for nm in names:
                    a = row[nm]
                    if a is None:
                        arrs[nm] = None
                        continue
                    a = np.asarray(a, dtype=np.float64)
                    arrs[nm] = a
                    size = len(a)
                if size is None:
                    continue
                valid = np.ones(size, dtype=bool)
                for nm in names:
                    a = arrs[nm]
                    if a is None:
                        valid[:] = False
                        break
                    valid &= a != NODATA
                if not valid.any():
                    continue
                nfp = {}
                for i in range(3):
                    r = arrs[f"r{i}"][valid]
                    n = arrs[f"n{i}"][valid]
                    nfp[i] = np.floor(
                        (n - r) / (n + r) * 1e6 + 0.5).astype(np.int64)
                num = nfp[2] - nfp[0]
                sg = np.sign(num)
                for s in np.unique(sg):
                    m = sg == s
                    signs.append(int(s))
                    cnts.append(int(m.sum()))
                    sums.append(int(num[m].sum()))
            yield pd.DataFrame({
                "trend_sign": pd.Series(signs, dtype="int64"),
                "n": pd.Series(cnts, dtype="int64"),
                "s": pd.Series(sums, dtype="int64")})

    per = wide.mapInPandas(kern, "trend_sign long, n long, s long")
    return per.groupBy("trend_sign").agg(
        F.sum("n").alias("pixel_count"),
        F.sum("s").alias("trend_num_sum"))


def ndvi_trend(px: DataFrame, bandsets: list[str],
               red: str = "B04", nir: str = "B08") -> DataFrame:
    """Per-pixel NDVI trend over the three dated bandsets (greening /
    browning detection): the least-squares slope over x = 0,1,2 is
    sum((x-1)*y) / 2 = (y2 - y0) / 2, so the whole regression reduces
    to the INTEGER numerator nfp2 - nfp0 of fixed-point NDVIs — no
    double ever enters an aggregate.  Only pixels with both bands
    valid on ALL three dates participate (the offset mosaic scene
    falls out with honest gap semantics).  Emits per trend sign:
    (trend_sign, pixel_count, trend_num_sum)."""
    assert len(bandsets) == 3
    wide = (
        px.filter(F.col("band").isin(red, nir)
                  & F.col("bandset").isin(*bandsets))
        .groupBy("tile_x", "tile_y", "pos", "bandset")
        .agg(
            F.max(F.when(F.col("band") == red, F.col("value"))).alias("r"),
            F.max(F.when(F.col("band") == nir, F.col("value"))).alias("n"),
        )
        .filter((F.col("r") != NODATA) & (F.col("n") != NODATA))
    )
    nfp = fixed1e6(
        (F.col("n").cast("double") - F.col("r").cast("double"))
        / (F.col("n").cast("double") + F.col("r").cast("double")))
    dates = F.create_map(*[
        x for i, bs in enumerate(bandsets)
        for x in (F.lit(bs), F.lit(i).cast("long"))
    ])
    v = wide.select("tile_x", "tile_y", "pos",
                    dates[F.col("bandset")].alias("di"), nfp.alias("nfp"))
    piv = (
        v.groupBy("tile_x", "tile_y", "pos")
        .agg(F.count("*").alias("nd"),
             F.max(F.when(F.col("di") == 0, F.col("nfp"))).alias("n0"),
             F.max(F.when(F.col("di") == 2, F.col("nfp"))).alias("n2"))
        .filter(F.col("nd") == 3)
    )
    num = F.col("n2") - F.col("n0")
    return (
        piv.select(F.signum(num).cast("long").alias("trend_sign"),
                   num.alias("num"))
        .groupBy("trend_sign")
        .agg(F.count("*").alias("pixel_count"),
             F.sum("num").alias("trend_num_sum"))
    )


def bap_composite_tiles(tiles: DataFrame, bandsets: list[str],
                        red: str = "B04", nir: str = "B08",
                        tile_px: int = 16) -> DataFrame:
    """bap_composite over tile ARRAYS: identical per-pixel math and
    BIGINT argmax encoding, but the one shuffle aligns the 2x|dates|
    pixel arrays per tile key (~#tiles rows) instead of repartitioning
    #pixels exploded skinny rows — at sf0.1 that is ~150k array rows
    through the exchange in place of ~39M (the r04 bench showed the
    exploded version spending its 12.7 s almost entirely on shuffle
    record overhead). The per-position argmax runs as a codegen'd
    higher-order transform; only the CHOSEN (ord) values explode, and
    they partial-aggregate to |dates| rows map-side before the final
    bounded rollup."""
    nd = F.lit(float(NODATA))
    aggs = []
    for d, bs in enumerate(bandsets):
        is_bs = F.col("bandset") == bs
        aggs.append(F.max(F.when(is_bs & (F.col("band") == red),
                                 F.col("pixels"))).alias(f"r{d}"))
        aggs.append(F.max(F.when(is_bs & (F.col("band") == nir),
                                 F.col("pixels"))).alias(f"n{d}"))
    g = (
        tiles.filter(F.col("band").isin(red, nir)
                     & F.col("bandset").isin(*bandsets))
        .groupBy("tile_x", "tile_y")
        .agg(*aggs)
    )

    def ord_for(i, d: int):
        r = F.get(F.col(f"r{d}"), i).cast("double")
        n = F.get(F.col(f"n{d}"), i).cast("double")
        nfp = fixed1e6((n - r) / (n + r))
        o = ((nfp + F.lit(1000000).cast("long")) * F.lit(8).cast("long")
             + F.lit(7 - d).cast("long"))
        return F.when(
            r.isNotNull() & n.isNotNull() & (r != nd) & (n != nd), o
        ).otherwise(F.lit(-1).cast("long"))

    idx = F.sequence(F.lit(0), F.lit(tile_px * tile_px - 1))
    mo_arr = F.transform(
        idx, lambda i: F.greatest(*[ord_for(i, d)
                                    for d in range(len(bandsets))]))
    ex = g.select(
        F.explode(F.filter(mo_arr, lambda v: v >= 0)).alias("mo"))
    date_idx = F.lit(7).cast("long") - F.col("mo") % F.lit(8).cast("long")
    chosen_fp = ((F.col("mo") - F.col("mo") % F.lit(8).cast("long"))
                 / F.lit(8.0)).cast("long") - F.lit(1000000).cast("long")
    rev = F.create_map(*[
        x for d, bs in enumerate(bandsets)
        for x in (F.lit(d).cast("long"), F.lit(bs))
    ])
    return (
        ex.select(rev[date_idx].alias("bandset"), chosen_fp.alias("nfp"))
        .groupBy("bandset")
        .agg(F.count("*").alias("pixel_count"),
             F.sum("nfp").alias("ndvi_fp_sum"))
    )


def cva_change(px: DataFrame, date_a: str, date_b: str,
               band_x: str = "B04", band_y: str = "B08") -> DataFrame:
    """Change vector analysis between two dates: per pixel, the change
    vector (dx, dy) = (x_b - x_a, y_b - y_a) over two bands (default
    red/NIR — the brightness/greenness plane), censused by direction
    class and exact squared-magnitude power-of-two band. The direction
    class 3*(sign(dx)+1) + (sign(dy)+1) keeps the zero axes exact
    (class 4 = no change), so greening (dx<0, dy>0 -> class 2) and
    senescence/clearing quadrants separate without any angle math.
    ONE pixel-keyed shuffle pivots all four (date, band) frames with
    conditional aggregates; magnitude is exact BIGINT; the rollup is
    bounded (9 classes x ~32 bands). Returns
    (quad, mag_band, n_pixels, sum_mag_sq)."""
    from remotior_sensus_spark.grid import TILE_PX

    sel = px.filter(
        F.col("bandset").isin(date_a, date_b)
        & F.col("band").isin(band_x, band_y)
        & (F.col("value") != NODATA))
    t = sel.select(
        (F.col("tile_x") * TILE_PX + F.col("pos") % TILE_PX).alias("gx"),
        (F.col("tile_y") * TILE_PX
         + (F.col("pos") / TILE_PX).cast("int")).alias("gy"),
        "bandset", "band", F.col("value").cast("long").alias("v"))

    def pick(ds, bd):
        return F.max(F.when((F.col("bandset") == ds)
                            & (F.col("band") == bd), F.col("v")))

    g = t.groupBy("gx", "gy").agg(
        pick(date_a, band_x).alias("xa"), pick(date_b, band_x).alias("xb"),
        pick(date_a, band_y).alias("ya"), pick(date_b, band_y).alias("yb"))
    full = g.filter(
        F.col("xa").isNotNull() & F.col("xb").isNotNull()
        & F.col("ya").isNotNull() & F.col("yb").isNotNull())
    dx = F.col("xb") - F.col("xa")
    dy = F.col("yb") - F.col("ya")
    d = full.select(
        ((F.signum(dx).cast("int") + 1) * 3
         + (F.signum(dy).cast("int") + 1)).alias("quad"),
        (dx * dx + dy * dy).alias("mag"))
    band = F.when(F.col("mag") > 0,
                  (F.length(F.bin(F.col("mag"))) - 1).cast("int")) \
        .otherwise(F.lit(-1))
    return (
        d.select("quad", band.alias("mag_band"), "mag")
        .groupBy("quad", "mag_band")
        .agg(F.count("*").alias("n_pixels"),
             F.sum("mag").alias("sum_mag_sq"))
    )


def ndvi_change_classes(px: DataFrame, date_a: str, date_b: str,
                        red: str = "B04", nir: str = "B08") -> DataFrame:
    """NDVI-class transition matrix between two dates — the land-cover
    change-detection cross-tab (bare/sparse/dense at the 0.2 / 0.5
    thresholds). The NDVI never materializes as a float: class 2 is
    2*(n-r) > (n+r), class 1 is 5*(n-r) >= (n+r), all exact BIGINT
    cross-multiplication, so the transition cell counts are integers
    end to end (non-positive denominators class as -1, matching the
    expression engine's where() nodata contract). Same ONE pixel-keyed
    pivot shuffle as cva_change over the four (date, band) frames,
    then a 16-bounded rollup. Returns
    (class_a, class_b, n_pixels, sum_nir_b)."""
    sel = px.filter(
        F.col("bandset").isin(date_a, date_b)
        & F.col("band").isin(red, nir)
        & (F.col("value") != NODATA))
    t = sel.select("tile_x", "tile_y", "pos", "bandset", "band",
                   F.col("value").cast("long").alias("v"))

    def pick(ds, bd):
        return F.max(F.when((F.col("bandset") == ds)
                            & (F.col("band") == bd), F.col("v")))

    g = t.groupBy("tile_x", "tile_y", "pos").agg(
        pick(date_a, red).alias("ra"), pick(date_a, nir).alias("na"),
        pick(date_b, red).alias("rb"), pick(date_b, nir).alias("nb"))
    full = g.filter(
        F.col("ra").isNotNull() & F.col("na").isNotNull()
        & F.col("rb").isNotNull() & F.col("nb").isNotNull())

    def ndvi_class(n, r):
        return (
            F.when(n + r <= 0, F.lit(-1))
            .when(2 * (n - r) > (n + r), F.lit(2))
            .when(5 * (n - r) >= (n + r), F.lit(1))
            .otherwise(F.lit(0)).cast("int")
        )

    d = full.select(
        ndvi_class(F.col("na"), F.col("ra")).alias("class_a"),
        ndvi_class(F.col("nb"), F.col("rb")).alias("class_b"),
        F.col("nb"))
    return (
        d.groupBy("class_a", "class_b")
        .agg(F.count("*").alias("n_pixels"), F.sum("nb").alias("sum_nir_b"))
    )


def _four_frame_zip(tiles: DataFrame, date_a: str, date_b: str,
                    band_x: str, band_y: str) -> DataFrame:
    """(xa, xb, ya, yb) BIGINT columns per pixel with ALL FOUR frames
    valid — built from TILE ARRAYS: the pivot groupBy shuffles ~4
    compact array rows per TILE instead of 4 exploded rows per PIXEL
    (a 100 TB raster moves once as arrays, never as pixel rows), and
    the zip/explode + validity filter run map-side after that one
    exchange. Shared by cva_change_tiles / ndvi_change_tiles; the
    exploded-pixel pivots remain as the cross-checked reference
    shapes."""
    sel = tiles.filter(
        F.col("bandset").isin(date_a, date_b)
        & F.col("band").isin(band_x, band_y))

    def pick(ds, bd):
        return F.first(F.when((F.col("bandset") == ds)
                              & (F.col("band") == bd), F.col("pixels")),
                       ignorenulls=True)

    g = sel.groupBy("tile_x", "tile_y").agg(
        pick(date_a, band_x).alias("pxa"), pick(date_b, band_x).alias("pxb"),
        pick(date_a, band_y).alias("pya"), pick(date_b, band_y).alias("pyb"))
    g = g.filter(F.col("pxa").isNotNull() & F.col("pxb").isNotNull()
                 & F.col("pya").isNotNull() & F.col("pyb").isNotNull())
    z = g.select(
        F.explode(F.arrays_zip("pxa", "pxb", "pya", "pyb")).alias("z")
    ).select(
        F.col("z.pxa").alias("fxa"), F.col("z.pxb").alias("fxb"),
        F.col("z.pya").alias("fya"), F.col("z.pyb").alias("fyb"))
    nd = F.lit(float(NODATA))
    valid = ((F.col("fxa") != nd) & (F.col("fxb") != nd)
             & (F.col("fya") != nd) & (F.col("fyb") != nd))
    return z.filter(valid).select(
        F.col("fxa").cast("long").alias("xa"),
        F.col("fxb").cast("long").alias("xb"),
        F.col("fya").cast("long").alias("ya"),
        F.col("fyb").cast("long").alias("yb"))


def cva_change_tiles(tiles: DataFrame, date_a: str, date_b: str,
                     band_x: str = "B04", band_y: str = "B08") -> DataFrame:
    """cva_change over tile arrays (identical output): the four
    (date, band) frames meet in ONE tile-keyed array pivot, the change
    vector census is pure codegen after the explode, and the rollup is
    the same bounded (quad, mag_band) grid."""
    full = _four_frame_zip(tiles, date_a, date_b, band_x, band_y)
    dx = F.col("xb") - F.col("xa")
    dy = F.col("yb") - F.col("ya")
    d = full.select(
        ((F.signum(dx).cast("int") + 1) * 3
         + (F.signum(dy).cast("int") + 1)).alias("quad"),
        (dx * dx + dy * dy).alias("mag"))
    band = F.when(F.col("mag") > 0,
                  (F.length(F.bin(F.col("mag"))) - 1).cast("int")) \
        .otherwise(F.lit(-1))
    return (
        d.select("quad", band.alias("mag_band"), "mag")
        .groupBy("quad", "mag_band")
        .agg(F.count("*").alias("n_pixels"),
             F.sum("mag").alias("sum_mag_sq"))
    )


def ndvi_change_tiles(tiles: DataFrame, date_a: str, date_b: str,
                      red: str = "B04", nir: str = "B08") -> DataFrame:
    """ndvi_change_classes over tile arrays (identical output): same
    one tile-keyed array pivot; the exact BIGINT cross-multiplied
    class thresholds and the 16-bounded rollup are unchanged."""
    full = _four_frame_zip(tiles, date_a, date_b, red, nir)

    def ndvi_class(n, r):
        return (
            F.when(n + r <= 0, F.lit(-1))
            .when(2 * (n - r) > (n + r), F.lit(2))
            .when(5 * (n - r) >= (n + r), F.lit(1))
            .otherwise(F.lit(0)).cast("int")
        )

    d = full.select(
        ndvi_class(F.col("ya"), F.col("xa")).alias("class_a"),
        ndvi_class(F.col("yb"), F.col("xb")).alias("class_b"),
        F.col("yb").alias("nb"))
    return (
        d.groupBy("class_a", "class_b")
        .agg(F.count("*").alias("n_pixels"), F.sum("nb").alias("sum_nir_b"))
    )
