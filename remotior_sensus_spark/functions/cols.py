"""Column-level (JVM/codegen) helpers: Z-order keys, grid math,
deterministic hashing. No Python UDFs — everything here stays inside
WholeStageCodegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from remotior_sensus_spark.grid import ORIGIN_X, ORIGIN_Y, PIXEL_SIZE, TILE_PX, TILE_SIZE_M


def _spread16(v: Column) -> Column:
    """Bit spread for Morton interleave (Column mirror of grid._spread_bits16)."""
    v = v.cast("long")
    v = v.bitwiseOR(F.shiftleft(v, 8)).bitwiseAND(F.lit(0x00FF00FF00FF00FF))
    v = v.bitwiseOR(F.shiftleft(v, 4)).bitwiseAND(F.lit(0x0F0F0F0F0F0F0F0F))
    v = v.bitwiseOR(F.shiftleft(v, 2)).bitwiseAND(F.lit(0x3333333333333333))
    v = v.bitwiseOR(F.shiftleft(v, 1)).bitwiseAND(F.lit(0x5555555555555555))
    return v


def morton_col(tile_x: Column, tile_y: Column) -> Column:
    return _spread16(tile_x).bitwiseOR(F.shiftleft(_spread16(tile_y), 1)).cast("long")


def cell_prefix_col(cell_key: Column, shift: int = 8) -> Column:
    return F.shiftright(cell_key.cast("long"), shift)


def tile_x_of(x: Column) -> Column:
    """World x (m) -> tile_x containing it."""
    return F.floor((x - F.lit(ORIGIN_X)) / F.lit(TILE_SIZE_M)).cast("int")


def tile_y_of(y: Column) -> Column:
    return F.floor((F.lit(ORIGIN_Y) - y) / F.lit(TILE_SIZE_M)).cast("int")


def pixel_cx(tile_x: Column, px: Column) -> Column:
    return F.lit(ORIGIN_X) + (tile_x.cast("long") * TILE_PX + px) * F.lit(PIXEL_SIZE) + F.lit(PIXEL_SIZE / 2)


def pixel_cy(tile_y: Column, py: Column) -> Column:
    return F.lit(ORIGIN_Y) - (tile_y.cast("long") * TILE_PX + py) * F.lit(PIXEL_SIZE) - F.lit(PIXEL_SIZE / 2)


def pos_px(pos: Column) -> Column:
    """Row-major position within a tile -> x offset."""
    return (pos % TILE_PX).cast("int")


def pos_py(pos: Column) -> Column:
    return (pos / TILE_PX).cast("int")


def fixed1e6(x: Column) -> Column:
    """Deterministic fixed-point encoding used for oracle value parity:
    both Spark and DuckDB compute the identical IEEE double, then apply
    the same floor -> order-independent BIGINT sums."""
    return F.floor(x * F.lit(1000000.0) + F.lit(0.5)).cast("long")
