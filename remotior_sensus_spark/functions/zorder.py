"""Z-order (Morton) keys for spatial file clustering.

The reference relies on GDAL's block layout for locality; a Spark
lakehouse gets the same effect by SORTING data files on an
interleaved-bit key before writing: rows near each other in (x, y)
land in the same parquet row group, so the row group's min/max column
stats form a tight bounding box and a spatial range filter skips
almost every row group at scan time. This is the standard lakehouse
Z-ORDER primitive (Delta OPTIMIZE ZORDER, Iceberg sort orders),
implemented here as pure Column bit arithmetic — the classic
magic-number bit spread, no UDF, fully codegen'd — so it runs at
write throughput on any cluster.

interleave(x, y) supports 21 bits per axis (the full 42-bit key fits
a BIGINT with headroom), plenty for global tile grids: 2^21 tiles per
axis at 256 px/tile is a ~537-billion-pixel axis.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# classic 2-D Morton magic masks for 64-bit lanes: after the chain,
# bit i of the input sits at bit 2i of the output.
_SPREAD2 = [
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
]


def spread_bits2(c: Column) -> Column:
    """Spread the low 21 bits of a non-negative long so bit i moves to
    bit 2i (zero between every pair) — one shift+mask chain, all JVM
    bitwise ops inside whole-stage codegen."""
    out = c.bitwiseAND(F.lit((1 << 21) - 1))
    for sh, mask in _SPREAD2:
        out = (out.bitwiseOR(F.shiftleft(out, sh))).bitwiseAND(F.lit(mask))
    return out


def morton_key(x: Column, y: Column) -> Column:
    """Interleave two non-negative integer columns into the 2-D Morton
    code: y's bits occupy odd positions, x's even. Sorting by this key
    is the Z-order curve walk over the (x, y) grid."""
    return spread_bits2(x.cast("long")).bitwiseOR(
        F.shiftleft(spread_bits2(y.cast("long")), 1))


def morton_sql(x_expr: str, y_expr: str) -> str:
    """The identical computation as ANSI SQL (DuckDB-compatible), used
    by the oracle so both engines derive the key with the same integer
    arithmetic."""

    def spread(e: str) -> str:
        out = f"({e} & {(1 << 21) - 1})"
        for sh, mask in _SPREAD2:
            out = f"((({out} | ({out} << {sh})) & {mask}))"
        return out

    return f"({spread(x_expr)} | ({spread(y_expr)} << 1))"
