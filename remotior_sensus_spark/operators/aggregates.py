"""Raster aggregation family — all pure Catalyst (partial+final hash agg).

Reference two-phase kernels re-expressed as groupBy/agg (SURVEY.md §2.4):
  * raster_report        — tools/raster_report.py:105-180
  * unique values/combos — processor_functions.py:1140-1198
  * min/max              — multiprocess_manager.py:2280-2309
  * cumulative-min DN    — multiprocess_manager.py:2240-2277 (DOS1)
  * 2-D histogram        — util/shared_tools.py:527-563
  * grouped exact percentile (closest observation, round-half-even
    index) — processor_functions.py:86-101

Pixel values land in integer-valued floats, so SUMs are exact BIGINTs
(order-independent) and mean/std are single final double divisions —
bit-identical to the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from remotior_sensus_spark import NODATA
from remotior_sensus_spark.grid import PIXEL_SIZE

PIXEL_AREA = PIXEL_SIZE * PIXEL_SIZE  # 100 m^2


def explode_pixels(tiles: DataFrame, value_col: str = "value") -> DataFrame:
    """tiles -> one row per pixel with in-tile position. The exploded
    stream partial-aggregates before any shuffle, so downstream groupBys
    move only (key, count) pairs."""
    return tiles.select(
        "bandset", "band", "tile_x", "tile_y", "cell_key",
        F.posexplode("pixels").alias("pos", value_col),
    )


def quantize(value: Column, step: float = 1000.0) -> Column:
    """Derive an integer class raster from reflectance (fixture helper)."""
    return F.floor(value / F.lit(step)).cast("int")


def raster_report(band_px: DataFrame, value_col: str = "value") -> DataFrame:
    """Per unique value: pixel count, percentage, area m^2
    (tools/raster_report.py)."""
    valid = band_px.filter(F.col(value_col) != NODATA)
    counts = valid.groupBy(value_col).agg(F.count("*").alias("pixel_count"))
    total = Window.partitionBy()
    return counts.select(
        F.col(value_col),
        "pixel_count",
        (F.col("pixel_count") * 100.0 / F.sum("pixel_count").over(total)).alias("percentage"),
        (F.col("pixel_count") * F.lit(PIXEL_AREA)).alias("area_m2"),
    )


def unique_combinations(px_by_band: DataFrame, band_cols: list[str]) -> DataFrame:
    """SELECT DISTINCT b1..bn + counts (processor_functions.py:1185-1198)."""
    return px_by_band.groupBy(*band_cols).agg(F.count("*").alias("pixel_count"))


def band_min_max(band_px: DataFrame, value_col: str = "value") -> DataFrame:
    valid = band_px.filter(F.col(value_col) != NODATA)
    return valid.groupBy("band").agg(
        F.min(value_col).alias("min_value"), F.max(value_col).alias("max_value")
    )


def cumulative_min_dn(band_px: DataFrame, percent_threshold: float = 0.0001) -> DataFrame:
    """DOS1 minimum DN: first value whose cumulative count >= 0.01% of
    total (multiprocess_manager.py:2240-2277). Window cumulative sum over
    the value histogram.

    BOUNDED-DOMAIN CONTRACT: the per-band window here runs over the DN
    HISTOGRAM (one row per distinct value — <= 65536 rows for UInt16
    sensors), never over pixels, so a per-band single partition is
    correct and cheap at any raster size. Do NOT feed an unbounded
    value domain (e.g. float reflectances) through this path; histogram
    it into fixed bins first. Pinned by
    tests/test_plan_properties.py::test_histmatch_domain_bounded."""
    valid = band_px.filter(F.col("value") != NODATA)
    hist = valid.groupBy("band", "value").agg(F.count("*").alias("cnt"))
    return cumulative_min_dn_hist(hist, percent_threshold)


def cumulative_min_dn_hist(hist: DataFrame,
                           percent_threshold: float = 0.0001) -> DataFrame:
    """cumulative_min_dn starting from a prebuilt (band, value, cnt)
    histogram (r06): callers that also derive their output from the
    histogram (dos1_correction's census) build it once."""
    w = Window.partitionBy("band").orderBy("value")
    tot = Window.partitionBy("band")
    cum = hist.select(
        "band", "value",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(tot).alias("total"),
    )
    return (
        cum.filter(F.col("cum") >= F.col("total") * F.lit(percent_threshold))
        .groupBy("band")
        .agg(F.min("value").alias("min_dn"))
    )


def histogram_2d(px_x: DataFrame, px_y: DataFrame, step: float = 500.0) -> DataFrame:
    """Value-pair binning of two aligned bands (shared_tools.py:527-563)."""
    a = px_x.select("tile_x", "tile_y", "pos", F.col("value").alias("vx"))
    b = px_y.select("tile_x", "tile_y", "pos", F.col("value").alias("vy"))
    # both sides are exploded PIXEL frames: pin the shuffle hash join so
    # a bogus compile-time estimate under the posexplode lineage can't
    # statically broadcast a whole band (the geostats._gj bug class)
    j = a.join(b.hint("shuffle_hash"), ["tile_x", "tile_y", "pos"])
    j = j.filter((F.col("vx") != NODATA) & (F.col("vy") != NODATA))
    return (
        j.groupBy(
            F.floor(F.col("vx") / step).cast("int").alias("bin_x"),
            F.floor(F.col("vy") / step).cast("int").alias("bin_y"),
        )
        .agg(F.count("*").alias("cnt"))
    )


def histogram_2d_tiles(tiles_x: DataFrame, tiles_y: DataFrame,
                       step: float = 500.0) -> DataFrame:
    """histogram_2d with the pairing done at the tile-array level
    (r06, guide §2.2): the pair lives at the same array index, so a
    tile-keyed equi join + per-tile bincount replaces the 13M-row
    pixel-keyed join; only bounded (bin_x, bin_y, c) partials shuffle.
    Bit-equal to histogram_2d (same floor(v/step) bins; pinned by the
    driver-checked query + test_histogram_2d_tiles_parity)."""
    import numpy as np
    import pandas as pd

    j = tiles_x.select(
        "tile_x", "tile_y", F.col("pixels").alias("ax")
    ).join(tiles_y.select(
        "tile_x", "tile_y", F.col("pixels").alias("ay")),
        ["tile_x", "tile_y"])

    def kern(it):
        for pdf in it:
            xs, ys, cs = [], [], []
            for _, row in pdf.iterrows():
                ax = np.asarray(row["ax"], dtype=np.float64)
                ay = np.asarray(row["ay"], dtype=np.float64)
                valid = (ax != NODATA) & (ay != NODATA)
                if not valid.any():
                    continue
                bx = np.floor(ax[valid] / step).astype(np.int64)
                by = np.floor(ay[valid] / step).astype(np.int64)
                pk = (bx + 64) * 4096 + (by + 64)
                ub, cnt = np.unique(pk, return_counts=True)
                xs.append(ub // 4096 - 64)
                ys.append(ub % 4096 - 64)
                cs.append(cnt.astype(np.int64))
            if not xs:
                continue
            yield pd.DataFrame({
                "bin_x": np.concatenate(xs),
                "bin_y": np.concatenate(ys),
                "c": np.concatenate(cs)})

    per = j.mapInPandas(kern, "bin_x long, bin_y long, c long")
    return (per.groupBy(
        F.col("bin_x").cast("int").alias("bin_x"),
        F.col("bin_y").cast("int").alias("bin_y"))
        .agg(F.sum("c").alias("cnt")))


def _closest_obs_index(cnt: Column, p: float) -> Column:
    """round-half-even of (cnt-1)*p/100, 0-based (numpy round semantics,
    processor_functions.py:94-96). Written as explicit floor math so the
    DuckDB oracle states the identical formula."""
    q = (cnt - 1).cast("double") * F.lit(float(p)) / F.lit(100.0)
    f = F.floor(q)
    frac = q - f
    return (
        f
        + F.when(frac > 0.5, F.lit(1))
        .when(frac < 0.5, F.lit(0))
        .otherwise(f.cast("long") % 2)
    ).cast("long")


def grouped_percentile(
    df: DataFrame, group_cols: list[str], value_col: str, p: float, out_name: str
) -> DataFrame:
    """Exact closest-observation percentile per group via the VALUE
    HISTOGRAM: group by (zone, value) first (map-side combinable), then
    a window over DISTINCT values picks where the cumulative count
    crosses the index. Replaces the round-1 per-pixel sort window — one
    giant zone no longer means one giant sorted task, because the window
    runs over at most |distinct DNs| rows per zone (VERDICT r01 perf
    audit ⚠ zonal percentile straggler). Identical results: exact for
    any value distribution."""
    hist = df.groupBy(*group_cols, value_col).agg(F.count("*").alias("__c"))
    return grouped_percentile_hist(hist, group_cols, value_col, "__c",
                                   p, out_name)


def grouped_percentile_hist(hist: DataFrame, group_cols: list[str],
                            value_col: str, count_col: str, p: float,
                            out_name: str) -> DataFrame:
    """grouped_percentile starting from a PREBUILT (group, value, count)
    histogram (r06): callers that need several percentiles or reuse the
    histogram for the output mapping (linear_stretch_histogram) build
    it once instead of re-aggregating the pixel stream per cut."""
    w = Window.partitionBy(*group_cols).orderBy(value_col)
    cnt_w = Window.partitionBy(*group_cols)
    cum = hist.select(
        *group_cols,
        F.col(value_col),
        F.sum(count_col).over(w).alias("__cum"),
        F.sum(count_col).over(cnt_w).alias("__cnt"),
    )
    idx = _closest_obs_index(F.col("__cnt"), p)
    # smallest value whose cumulative count exceeds the 0-based index
    return (
        cum.filter(F.col("__cum") > idx)
        .groupBy(*group_cols)
        .agg(F.min(value_col).alias(out_name))
    )


def zonal_stats(
    zone_px: DataFrame,
    zone_col: str = "class",
    value_col: str = "value",
    percentiles: tuple[float, ...] = (),
) -> DataFrame:
    """Zonal statistics over PIP-matched pixels (SURVEY.md §2.4; stat list
    configurations.py:336-342). Input must already be deduped per
    (zone, pixel) — rasterization semantics make zone membership binary.

    Integer-exact sums; mean/std derived as final double divisions.
    """
    # NOTE (r06 measured): materializing `valid` for the percentile
    # passes was tried and REVERTED — the cover join is a cheap
    # broadcast-join recompute, and writing the zone-pixel stream to
    # the block manager cost more than the re-executions it saved
    # (1.19 s vs 1.62 s min-of-4 at sf0.1).
    valid = zone_px.filter(F.col(value_col) != NODATA)
    iv = F.col(value_col).cast("long")
    base = valid.groupBy(zone_col).agg(
        F.count("*").alias("pixel_count"),
        F.sum(iv).alias("sum_value"),
        F.sum(iv * iv).alias("sum_sq"),
        F.min(value_col).alias("min_value"),
        F.max(value_col).alias("max_value"),
    )
    base = base.select(
        zone_col,
        "pixel_count",
        F.col("sum_value").cast("double").alias("sum_value"),
        (F.col("sum_value").cast("double") / F.col("pixel_count")).alias("mean_value"),
        F.sqrt(
            F.col("sum_sq").cast("double") / F.col("pixel_count")
            - (F.col("sum_value").cast("double") / F.col("pixel_count"))
            * (F.col("sum_value").cast("double") / F.col("pixel_count"))
        ).alias("std_value"),
        "min_value",
        "max_value",
    )
    for p in percentiles:
        pc = grouped_percentile(valid, [zone_col], value_col, p, f"p{int(p)}")
        base = base.join(pc, zone_col, "left")
    return base


def linear_stretch_histogram(
    band_px: DataFrame,
    value_col: str = "value",
    p_lo: float = 2.0,
    p_hi: float = 98.0,
) -> DataFrame:
    """Percent-clip linear contrast stretch to 8-bit, reported as the
    per-band byte histogram (the reference's preview stretch —
    util/shared_tools.py sets display min/max from percentiles before
    scaling to bytes; re-expressed as a relational plan).

    The cut points reuse grouped_percentile's VALUE-HISTOGRAM closest-
    observation percentile (exact, no giant per-band sort), come back as
    a tiny per-band frame that broadcast-joins onto the pixel stream,
    and the byte mapping is one Catalyst expression:
    clamp(floor((v - lo) * 255 / (hi - lo) + 0.5), 0, 255).
    Degenerate bands (hi == lo) map to byte 0. Output:
    (band, byte_value, pixel_count)."""
    # r06 (guide §2.2): ONE corpus aggregation builds the per-band
    # value histogram; both percentile cuts AND the byte mapping are
    # then derived from the (band, value, count) rows — the previous
    # shape re-aggregated the pixel stream once per cut and scanned it
    # a third time for the byte mapping. Identical expressions, so the
    # output histogram is bit-equal.
    valid = band_px.filter(F.col(value_col) != NODATA).select("band", value_col)
    hist = valid.groupBy("band", value_col).agg(
        F.count("*").alias("__c")).localCheckpoint()
    lo = grouped_percentile_hist(hist, ["band"], value_col, "__c", p_lo, "lo")
    hi = grouped_percentile_hist(hist, ["band"], value_col, "__c", p_hi, "hi")
    cuts = lo.join(hi, "band")
    j = hist.join(F.broadcast(cuts), "band")
    scaled = F.floor(
        (F.col(value_col) - F.col("lo")) * F.lit(255.0)
        / (F.col("hi") - F.col("lo")) + F.lit(0.5)
    )
    byte = F.when(F.col("hi") == F.col("lo"), F.lit(0).cast("long")).otherwise(
        F.least(F.lit(255).cast("long"),
                F.greatest(F.lit(0).cast("long"), scaled))
    ).cast("int")
    return (
        j.select("band", byte.alias("byte_value"), "__c")
        .groupBy("band", "byte_value")
        .agg(F.sum("__c").alias("pixel_count"))
    )


def pyramid_stats(band_px: DataFrame, levels: int = 3) -> DataFrame:
    """Overview-pyramid construction as a cascade of partial
    re-aggregations: level L cells (2^L x 2^L base pixels) aggregate
    from level L-1's (sum, count) pairs — the base raster is read ONCE
    and each further level reduces 4:1, the way overview builds stream
    on a cluster (never re-scanning the source per level).

    Emits per-level invariants that pin every cell's exact content:
    cell count, total valid-pixel sum, and an order-independent
    fixed-point checksum of the per-cell means.
    Output: (level, n_cells, total_sum, mean_checksum)."""
    from remotior_sensus_spark.functions.cols import fixed1e6
    from remotior_sensus_spark.grid import TILE_PX

    cur = (
        band_px.filter(F.col("value") != NODATA)
        .select(
            (F.col("tile_x") * TILE_PX + F.col("pos") % TILE_PX).alias("gx"),
            (F.col("tile_y") * TILE_PX
             + (F.col("pos") / TILE_PX).cast("int")).alias("gy"),
            F.col("value").cast("long").alias("s"),
            F.lit(1).cast("long").alias("c"),
        )
    )
    outs = []
    for _ in range(levels):
        # localCheckpoint pins each level so the union below reads every
        # level ONCE from the materialized previous level — without it
        # Catalyst re-derives each union branch from the base scan
        # (3 scans + 6 agg chains; test_pyramid_levels_reads_base_once).
        # Blocks are reclaimed with the RDD, unlike cache().
        cur = (
            cur.groupBy(
                F.floor(F.col("gx") / 2).alias("gx"),
                F.floor(F.col("gy") / 2).alias("gy"),
            )
            .agg(F.sum("s").alias("s"), F.sum("c").alias("c"))
            .localCheckpoint()
        )
        outs.append(cur)
    level_frames = [
        o.agg(
            F.count("*").alias("n_cells"),
            F.sum("s").alias("total_sum"),
            F.sum(fixed1e6(F.col("s").cast("double") / F.col("c")))
            .alias("mean_checksum"),
        ).select(F.lit(i + 1).alias("level"), "n_cells", "total_sum",
                 "mean_checksum")
        for i, o in enumerate(outs)
    ]
    out = level_frames[0]
    for f in level_frames[1:]:
        out = out.unionByName(f)
    return out


def zonal_median2(zone_px: DataFrame, zone_col: str = "class",
                  value_col: str = "value") -> DataFrame:
    """np.nanmedian parity per zone (the one statistics_list entry —
    configurations.py:339 — the closest-observation percentile does NOT
    reproduce: nanmedian AVERAGES the two middle observations on even
    counts). Emits median2 = the exact integer DOUBLED median (lo + hi
    middle value; 2*v when the count is odd), so no /2 rounding enters
    the result — the consumer divides, both engines identically.

    Same value-histogram shape as grouped_percentile: the window runs
    over distinct DNs per zone, never a per-pixel sort."""
    valid = zone_px.filter(F.col(value_col) != NODATA)
    hist = valid.groupBy(zone_col, value_col).agg(F.count("*").alias("__c"))
    w = Window.partitionBy(zone_col).orderBy(value_col)
    cnt_w = Window.partitionBy(zone_col)
    cum = hist.select(
        zone_col, F.col(value_col),
        F.sum("__c").over(w).alias("__cum"),
        F.sum("__c").over(cnt_w).alias("__cnt"),
    )
    lo_idx = F.floor((F.col("__cnt") - 1) / 2)   # 0-based
    hi_idx = F.col("__cnt") - 1 - lo_idx         # ceil((n-1)/2)
    lo = (cum.filter(F.col("__cum") > lo_idx).groupBy(zone_col)
          .agg(F.min(value_col).cast("long").alias("__lo")))
    hi = (cum.filter(F.col("__cum") > hi_idx).groupBy(zone_col)
          .agg(F.min(value_col).cast("long").alias("__hi")))
    return lo.join(hi, zone_col).select(
        zone_col, (F.col("__lo") + F.col("__hi")).alias("median2"))


def zonal_majority(zone_px: DataFrame, zone_col: str = "class",
                   value_col: str = "value") -> DataFrame:
    """Zonal MAJORITY (modal value) per zone — the classic categorical
    zonal statistic (gdal/QGIS zonal majority) the percentile scans
    don't cover: the most frequent valid DN in each zone, count ties
    broken to the SMALLEST value (deterministic, mirrored in the
    oracle).  Same value-histogram shape as zonal_median2 — the argmax
    runs over distinct DNs per zone via one max(struct) aggregate (no
    window, no sort), never a per-pixel pass.  Returns
    (zone, majority_value, n_px_majority, n_px_zone)."""
    valid = zone_px.filter(F.col(value_col) != NODATA)
    hist = valid.groupBy(zone_col, value_col).agg(F.count("*").alias("__c"))
    best = hist.groupBy(zone_col).agg(
        F.max(F.struct(
            F.col("__c").alias("c"),
            (-F.col(value_col).cast("long")).alias("nv"))).alias("b"),
        F.sum("__c").alias("n_px_zone"))
    return best.select(
        zone_col,
        (-F.col("b.nv")).alias("majority_value"),
        F.col("b.c").alias("n_px_majority"),
        "n_px_zone")
