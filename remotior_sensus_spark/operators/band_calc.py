"""band_calc — per-pixel expression over N aligned bands.

Reference: tools/band_calc.py:87-274 (entry + parsing),
core/processor_functions.py:112-160 (masked-numpy eval kernel),
core/processor.py:535-542 (any/all nodata mask modes).

Spark-first design: the N input bands are pivoted into one row per tile
(one shuffle, partial-aggregated), then the compiled expression runs
per pixel inside ``F.transform`` over the pixel index — pure JVM
higher-order functions, whole-stage-codegen'd, no Python in the hot
path. The reference's per-strip worker + VRT-align step collapses into
a groupBy on the tile key; alignment is free because all bands share
the tile grid (regridding is the resample operator's job).
"""

from __future__ import annotations

import functools
import operator as _op

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from remotior_sensus_spark import NODATA
from remotior_sensus_spark.functions.cols import fixed1e6
from remotior_sensus_spark.grid import TILE_PX
from remotior_sensus_spark.plans.expression import compile_expression

N_PX = TILE_PX * TILE_PX

# spectral aliases resolved by nearest wavelength (configurations.py:200-212,
# 278-282): with the synthetic S2-like band list the resolution is fixed.
SPECTRAL_ALIASES = {"#BLUE#": "B02", "#GREEN#": "B03", "#RED#": "B04", "#NIR#": "B08"}
DEFAULT_BANDSET = "S2_2020-01-01"


def resolve_var(name: str) -> tuple[str, str]:
    """Variable name -> (bandset, band). Supports 'B04', '#RED#', and
    'bandset2bB04' style cross-bandset refs (band_calc.py:1358-1699)."""
    if name in SPECTRAL_ALIASES:
        return DEFAULT_BANDSET, SPECTRAL_ALIASES[name]
    if name.startswith("bandset") and "b" in name[7:]:
        num, _, band = name[7:].partition("b")
        bandsets = ["S2_2020-01-01", "S2_2020-01-02", "S2_2020-01-03"]
        return bandsets[int(num) - 1], band
    return DEFAULT_BANDSET, name


def pivot_bands(tiles: DataFrame, var_map: dict[str, tuple[str, str]]) -> DataFrame:
    """One row per tile with one ``array<float>`` column per variable.

    Intersection-extent semantics: rows missing any required band are
    dropped (mirrors the reference's intersection VRT,
    util/raster_vector.py:680-704)."""
    pairs = list(var_map.items())
    cond = functools.reduce(
        _op.or_,
        [(F.col("bandset") == bs) & (F.col("band") == b) for _, (bs, b) in pairs],
    )
    tagged = tiles.filter(cond).withColumn(
        "__var",
        functools.reduce(
            lambda acc, kv: acc.when(
                (F.col("bandset") == kv[1][0]) & (F.col("band") == kv[1][1]),
                F.lit(kv[0]),
            ),
            pairs[1:],
            F.when(
                (F.col("bandset") == pairs[0][1][0])
                & (F.col("band") == pairs[0][1][1]),
                F.lit(pairs[0][0]),
            ),
        ),
    )
    wide = (
        tagged.groupBy("tile_x", "tile_y", "cell_key", "cell_prefix")
        .pivot("__var", [k for k, _ in pairs])
        .agg(F.first("pixels"))
    )
    for k, _ in pairs:
        wide = wide.filter(F.col(k).isNotNull())
    return wide


def band_calc(
    tiles: DataFrame,
    expression: str,
    var_map: dict[str, tuple[str, str]] | None = None,
    *,
    nodata_mask: str | None = "any",
    out_nodata: float = NODATA,
    input_nodata: float = NODATA,
) -> DataFrame:
    """Evaluate a band_calc expression -> (tile_x, tile_y, cell_key,
    cell_prefix, pixels: array<double>).

    ``nodata_mask``: 'any' (default — output nodata where ANY input band
    is nodata), 'all', or None (reference core/processor.py:535-542).
    """
    comp = compile_expression(expression)
    if var_map is None:
        var_map = {v: resolve_var(v) for v in comp.variables}
    wide = pivot_bands(tiles, {v: var_map[v] for v in comp.variables})

    nd = F.lit(float(input_nodata))

    def per_pixel(i):  # i is 1-based pixel index Column
        env = {v: F.element_at(F.col(v), i).cast("double") for v in comp.variables}
        value = comp.fn(env)
        if nodata_mask is None:
            return value
        flags = [env[v] == nd for v in comp.variables]
        invalid = functools.reduce(_op.or_ if nodata_mask == "any" else _op.and_, flags)
        return F.when(invalid, F.lit(float(out_nodata))).otherwise(value)

    out = wide.select(
        "tile_x",
        "tile_y",
        "cell_key",
        "cell_prefix",
        F.transform(F.sequence(F.lit(1), F.lit(N_PX)), per_pixel).alias("pixels"),
    )
    return out


def tile_checksum(calc_df: DataFrame, nodata: float = NODATA) -> DataFrame:
    """Per-tile fixed-point checksum of a calc result — the oracle-parity
    projection (order-independent BIGINT sums of identical doubles)."""
    nd = F.lit(float(nodata))
    valid = F.filter(F.col("pixels"), lambda x: (x != nd) & ~F.isnan(x))
    return calc_df.select(
        "tile_x",
        "tile_y",
        F.aggregate(
            F.transform(valid, lambda x: fixed1e6(x)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("checksum"),
        F.size(valid).cast("long").alias("valid_count"),
        (F.lit(N_PX) - F.size(valid)).cast("long").alias("nodata_count"),
    )
