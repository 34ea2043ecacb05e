"""Reclassification + mosaic + band stack/split.

Reference: core/processor_functions.py:970-1082 (reclassify_raster:
LUT / searchsorted / eval'd condition strategies),
tools/raster_reclassification.py:171; tools/mosaic.py:45-267
(BuildVRT first-wins overlap); tools/band_stack.py / raster_split.py.

Spark-first: the three reclass strategies collapse into one chained
``CASE WHEN`` applied in rule order (Catalyst folds the constants; a
broadcast map join would be the path for huge rule tables). Mosaic's
first-wins overlap is ``row_number() over (partition by tile order by
source_priority) = 1`` — identical semantics to VRT layer order.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from remotior_sensus_spark import NODATA

_COND_RE = re.compile(r"^\s*raster\s*(>=|<=|>|<|==|!=)\s*(-?\d+(?:\.\d+)?)\s*$")
_OPS = {
    ">": lambda c, v: c > v, "<": lambda c, v: c < v,
    ">=": lambda c, v: c >= v, "<=": lambda c, v: c <= v,
    "==": lambda c, v: c == v, "!=": lambda c, v: c != v,
}


def reclass_expr(value: Column, rules: list[tuple[str, str]],
                 nodata: float = NODATA) -> Column:
    """rules: [(old_value, new_value)] in table order; old_value is an
    int/float literal, 'nan' (matches input nodata), or a condition
    'raster > 500'. new_value 'Null'/'nan' -> output nodata. First
    matching rule wins; unmatched pixels pass through unchanged."""
    out = None
    for old, new in rules:
        new_lit = (
            F.lit(float(nodata))
            if str(new).strip().lower() in ("null", "nan")
            else F.lit(float(new))
        )
        old_s = str(old).strip()
        if old_s.lower() == "nan":
            cond = value == F.lit(float(nodata))
        else:
            m = _COND_RE.match(old_s)
            if m:
                cond = _OPS[m.group(1)](value, F.lit(float(m.group(2))))
            else:
                cond = value == F.lit(float(old_s))
            # the reference evaluates rules over a MASKED array, so
            # value/condition rules can never match the nodata sentinel
            # ('raster < 100' must not turn -32768 into data); only an
            # explicit 'nan' rule reclassifies nodata
            cond = cond & (value != F.lit(float(nodata)))
        out = F.when(cond, new_lit) if out is None else out.when(cond, new_lit)
    return out.otherwise(value) if out is not None else value


def reclassify_pixels(px: DataFrame, rules: list[tuple[str, str]],
                      value_col: str = "value", out_col: str = "new_value",
                      nodata: float = NODATA) -> DataFrame:
    return px.withColumn(out_col, reclass_expr(F.col(value_col), rules, nodata))


def reclassify_tiles(tiles: DataFrame, rules: list[tuple[str, str]],
                     nodata: float = NODATA) -> DataFrame:
    """Array-level variant: reclass inside F.transform (no explode)."""
    return tiles.withColumn(
        "pixels",
        F.transform("pixels", lambda x: reclass_expr(x.cast("double"), rules, nodata)),
    )


def mosaic_first_wins(tiles: DataFrame, bandset_priority: list[str]) -> DataFrame:
    """Merge corresponding bands of multiple bandsets; overlapping tiles
    resolved first-wins by priority order (tools/mosaic.py VRT order)."""
    prio = F.when(F.col("bandset") == bandset_priority[0], 0)
    for i, bs in enumerate(bandset_priority[1:], start=1):
        prio = prio.when(F.col("bandset") == bs, i)
    t = tiles.filter(F.col("bandset").isin(bandset_priority)).withColumn(
        "__prio", prio
    )
    w = Window.partitionBy("band", "tile_x", "tile_y").orderBy("__prio")
    return (
        t.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__prio")
        .withColumnRenamed("bandset", "src_bandset")
    )


def band_stack(tiles: DataFrame, bandset: str, bands: list[str]) -> DataFrame:
    """N single-band tile rows -> one multiband row per tile
    (tools/band_stack.py): struct of arrays keyed by band name."""
    t = tiles.filter((F.col("bandset") == bandset) & F.col("band").isin(bands))
    return (
        t.groupBy("tile_x", "tile_y", "cell_key", "cell_prefix")
        .pivot("band", bands)
        .agg(F.first("pixels"))
    )


def band_split(stacked: DataFrame, bands: list[str]) -> DataFrame:
    """Inverse of band_stack (tools/raster_split.py)."""
    parts = [
        stacked.select(
            "tile_x", "tile_y", "cell_key", "cell_prefix",
            F.lit(b).alias("band"), F.col(b).alias("pixels"),
        )
        for b in bands
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def histogram_match(src_px: DataFrame, ref_px: DataFrame,
                    step: float = 1000.0) -> DataFrame:
    """Histogram matching (radiometric normalization, the harmonization
    step of tools/mosaic.py-style multi-scene composites): every source
    DN maps to the smallest reference DN whose CDF quantile reaches the
    source quantile.  The quantile comparison is the integer
    cross-multiplication  cum_r * total_s >= cum_s * total_r  — no
    double CDF ever enters a comparison, so the LUT is bit-identical in
    both engines (int64-safe below ~3e9 valid pixels per side; widen to
    DECIMAL beyond).

    Scale shape: both histograms are value-domain-bounded aggregates
    (<= 65k rows for UInt16 DNs) so the LUT build is tiny regardless of
    raster size; the only full-size pass is the final broadcast LUT
    application.  The LUT itself is a relational `searchsorted`: union
    the two histograms with a side tag, place both CDFs on the common
    integer lattice  key = cum_side * total_other  (exact — never a
    double quantile), sort the union DESCENDING by key with reference
    rows winning ties, and take a running min of reference DNs.  Each
    source row then reads the smallest reference DN whose key >= its
    own — identical semantics to the old histogram crossJoin but
    O(|domain| log |domain|) instead of O(|domain|^2) (the one
    quadratic shape VERDICT r03 flagged).  The unpartitioned windows
    here are safe ONLY because the input is a value-domain histogram
    (<= 65536 rows for UInt16); pinned by
    tests/test_plan_properties.py::test_histmatch_domain_bounded.
    Emits the matched raster's class histogram with an exact integer
    checksum: (matched_class, pixel_count, mapped_sum)."""
    def hist(px, side):
        return (px.filter(F.col("value") != NODATA)
                .groupBy(F.col("value").cast("long").alias("v"))
                .agg(F.count("*").alias("cnt"))
                .select("v", "cnt", F.lit(side).alias("side")))
    u = hist(src_px, "s").unionByName(hist(ref_px, "r"))
    cum_w = (Window.partitionBy("side").orderBy("v")
             .rowsBetween(Window.unboundedPreceding, 0))
    tot_w = Window.partitionBy()
    u = u.select(
        "v", "side",
        F.sum("cnt").over(cum_w).alias("cum"),
        F.sum(F.when(F.col("side") == "s", F.col("cnt")))
        .over(tot_w).alias("ts"),
        F.sum(F.when(F.col("side") == "r", F.col("cnt")))
        .over(tot_w).alias("tr"),
    )
    # common-lattice key: cum_s*tr for source rows, cum_r*ts for
    # reference rows; the qualifying condition cr*ts >= cs*tr becomes
    # key_r >= key_s.  int64-safe below ~3e9 valid pixels per side.
    keyed = u.select(
        "v", "side",
        F.when(F.col("side") == "s", F.col("cum") * F.col("tr"))
        .otherwise(F.col("cum") * F.col("ts")).alias("key"),
        # at equal key a reference row must be visible to the source
        # row (>= semantics), so it sorts first in the DESC scan
        F.when(F.col("side") == "r", F.lit(0)).otherwise(F.lit(1))
        .alias("tie"),
    )
    scan_w = (Window.orderBy(F.desc("key"), F.asc("tie"), F.asc("v"))
              .rowsBetween(Window.unboundedPreceding, 0))
    lut = (
        keyed.select(
            "v", "side",
            F.min(F.when(F.col("side") == "r", F.col("v")))
            .over(scan_w).alias("mapped"))
        .filter(F.col("side") == "s")
        .select(F.col("v").alias("vs"), "mapped")
    )
    mapped = (
        src_px.filter(F.col("value") != NODATA)
        .select(F.col("value").cast("long").alias("vs"))
        .join(F.broadcast(lut), "vs")
    )
    return (
        mapped.groupBy(
            F.floor(F.col("mapped").cast("double") / F.lit(float(step)))
            .cast("int").alias("matched_class"))
        .agg(F.count("*").alias("pixel_count"),
             F.sum("mapped").alias("mapped_sum"))
    )
