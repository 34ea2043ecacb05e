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

from remotior_sensus_spark.sources.bandset_catalog import (  # noqa: E402
    SPECTRAL_RANGES,
    BandSetCatalog,
    default_synthetic_catalog,
)

# spectral alias -> spectral range key; the band is resolved per bandset
# by NEAREST WAVELENGTH within threshold (bandset_catalog.py
# spectral_range_bands; configurations.py:200-212), not a fixed map.
SPECTRAL_ALIASES = {
    "#BLUE#": "blue", "#GREEN#": "green", "#RED#": "red", "#NIR#": "nir",
    "#SWIR1#": "swir_1", "#SWIR2#": "swir_2",
}
_DEFAULT_CATALOG = default_synthetic_catalog()
DEFAULT_BANDSET = _DEFAULT_CATALOG.get(_DEFAULT_CATALOG.current).name

import re as _re  # noqa: E402

_BS_VAR_RE = _re.compile(r"^bandset(\d+)b(.+)$")
_ORD_VAR_RE = _re.compile(r"^b(\d+)$")


def resolve_var(name: str, catalog: BandSetCatalog | None = None,
                bandset_number: int | None = None) -> tuple[str, str]:
    """Variable name -> (bandset, band). Supports plain band names
    ('B04'), wavelength-resolved spectral aliases ('#RED#'), ordinal
    refs ('b3', 'bandset2b1') and named cross-bandset refs
    ('bandset2bB04') — ref tools/band_calc.py:1358-1699."""
    catalog = catalog or _DEFAULT_CATALOG
    cur = bandset_number or catalog.current
    if name in SPECTRAL_ALIASES:
        bs = catalog.get(cur)
        band = bs.band_by_wavelength(*SPECTRAL_RANGES[SPECTRAL_ALIASES[name]])
        if band is None:
            raise ValueError(f"no band within threshold for {name}")
        return bs.name, band.name
    m = _BS_VAR_RE.match(name)
    if m:
        bs = catalog.get(int(m.group(1)))
        part = m.group(2)
        if part.isdigit():
            return bs.name, bs.band_by_number(int(part)).name
        return bs.name, part
    m = _ORD_VAR_RE.match(name)
    if m:
        bs = catalog.get(cur)
        return bs.name, bs.band_by_number(int(m.group(1))).name
    return catalog.get(cur).name, name


# --- grammar expansions (text level, before AST compile) -------------------

_NODATA_RE = _re.compile(r'nodata\(\s*"?#?([^"#)]+?)#?"?\s*\)')
_BRACE_RE = _re.compile(r'"bandset\{([^}]*)\}b([0-9A-Za-z]+)"')
_STAR_BS_RE = _re.compile(r'"bandset\*b([0-9A-Za-z]+)"')
_CUR_BS_RE = _re.compile(r'"bandset#b([0-9A-Za-z]+)"')


def _band_list(nums: list[int], band: str) -> str:
    return "[ " + ", ".join(f'"bandset{n}b{band}"' for n in nums) + " ]"


def expand_calc_expression(expression: str, catalog: BandSetCatalog | None = None,
                           bandset_number: int | None = None) -> str:
    """Fold nodata() to literals and expand band-list variables:
    ``"bandset#b*"`` / ``"b*"`` (all bands of the current bandset),
    ``"bandset*bN"`` (band N across all bandsets), ``"bandset{1,3}bN"``
    / ``"bandset{1:3}bN"`` / date selections, and ``"bandset#bN"``.
    Idempotent. Ref tools/band_calc.py:1322-1336 (nodata), :1358-1699
    (variable substitution)."""
    catalog = catalog or _DEFAULT_CATALOG
    cur = bandset_number or catalog.current

    from remotior_sensus_spark.plans.expression import expand_aliases
    out = expand_aliases(expression)

    def nd(m: _re.Match) -> str:
        bs_name, band_name = resolve_var(m.group(1), catalog, cur)
        for n in catalog.numbers():
            bs = catalog.get(n)
            if bs.name == bs_name:
                band = bs.band_by_name(band_name)
                return repr(band.nodata if band else float("nan"))
        return "nan"

    out = _NODATA_RE.sub(nd, out)

    # all bands of the current bandset
    cur_bands = [b.number for b in catalog.get(cur).bands]
    all_cur = "[ " + ", ".join(f'"bandset{cur}b{i}"' for i in cur_bands) + " ]"
    out = out.replace('"bandset#b*"', all_cur).replace('"b*"', all_cur)

    # band N across all bandsets that have it
    def star_bs(m: _re.Match) -> str:
        part = m.group(1)
        nums = [
            n for n in catalog.numbers()
            if (part.isdigit() and int(part) <= catalog.band_count(n))
            or (not part.isdigit() and catalog.get(n).band_by_name(part))
        ]
        return _band_list(nums, part)

    out = _STAR_BS_RE.sub(star_bs, out)

    # band N across a brace selection of bandsets (ints, ranges, dates)
    def brace(m: _re.Match) -> str:
        return _band_list(catalog.select(m.group(1)), m.group(2))

    out = _BRACE_RE.sub(brace, out)

    # current-bandset shorthand
    out = _CUR_BS_RE.sub(lambda m: f'"bandset{cur}b{m.group(1)}"', out)

    # spectral aliases -> per-bandset wavelength resolution
    for alias in SPECTRAL_ALIASES:
        if f'"{alias}"' in out:
            bs_name, band_name = resolve_var(alias, catalog, cur)
            out = out.replace(f'"{alias}"', f'"bandset{cur}b{band_name}"')
    return out


def pivot_bands(tiles: DataFrame, var_map: dict[str, tuple[str, str]]) -> DataFrame:
    """One row per tile with one ``array<float>`` column per variable.

    Intersection-extent semantics: rows missing any required band are
    dropped (mirrors the reference's intersection VRT,
    util/raster_vector.py:680-704)."""
    # dedupe by (bandset, band): two variables resolving to the same
    # physical band (e.g. '"b3" + "B04"') must share ONE pivot column —
    # the old per-variable first-match tag left the second variable's
    # pivot column all-null and the isNotNull filters emptied the result
    canon: dict[tuple[str, str], str] = {}
    for var, pair in var_map.items():
        canon.setdefault(pair, var)
    pairs = [(v, p) for p, v in canon.items()]
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
    for var, pair in var_map.items():
        if canon[pair] != var:
            wide = wide.withColumn(var, F.col(canon[pair]))
    return wide


def band_calc(
    tiles: DataFrame,
    expression: str,
    var_map: dict[str, tuple[str, str]] | None = None,
    *,
    nodata_mask: str | None = "any",
    out_nodata: float = NODATA,
    input_nodata: float = NODATA,
    catalog: BandSetCatalog | None = None,
    bandset_number: int | None = None,
) -> DataFrame:
    """Evaluate a band_calc expression -> (tile_x, tile_y, cell_key,
    cell_prefix, pixels: array<double>).

    ``nodata_mask``: 'any' (default — output nodata where ANY input band
    is nodata), 'all', or None (reference core/processor.py:535-542).
    """
    expression = expand_calc_expression(expression, catalog, bandset_number)
    comp = compile_expression(expression)
    if var_map is None:
        var_map = {v: resolve_var(v, catalog, bandset_number)
                   for v in comp.variables}
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


# --- multi-line calc scripts with iterators + output directives ------------

_ITER_RE = _re.compile(r"^(forbandsets|forbandsinbandset)\[([^\]]*)\](.*)$")


def parse_calc_script(expression_string: str,
                      catalog: BandSetCatalog | None = None
                      ) -> list[tuple[str, str, int]]:
    """Parse a multi-line band_calc script into concrete
    (expanded_expression, out_name, bandset_number) entries.

    Supports (ref tools/band_calc.py:598-1130):
      * ``forbandsets[sel]filter`` / ``forbandsinbandset[sel]filter``
        first lines — sel = ints, ``a:b`` ranges, dates, date ranges;
        filter = comma-separated bandset-name prefixes
      * ``"#BAND#"`` inside forbandsinbandset bodies -> the iterated band
      * ``expr @out_name`` output directives; ``%#`` in a name -> the
        bandset number, ``#BAND#`` -> the iterated band name
      * later lines referencing earlier out_names as variables (inlined)
      * comment lines starting with ``#``
    """
    catalog = catalog or _DEFAULT_CATALOG
    lines = [ln for ln in expression_string.rstrip().split("\n") if ln.strip()]
    lines = [ln for ln in lines if not ln.strip().startswith("#")
             or ln.strip().startswith('"#')]
    if not lines:
        return []

    def split_out(line: str) -> tuple[str, str | None]:
        parts = line.split("@")
        name = parts[-1].strip() if len(parts) > 1 else None
        return parts[0].strip(), name or None

    entries: list[tuple[str, str, int]] = []
    named: dict[str, str] = {}  # out_name -> raw expr (for chaining)
    idx = 0

    def add(expr: str, out: str | None, n: int, band_name: str | None) -> None:
        nonlocal idx
        idx += 1
        for prev_name, prev_expr in named.items():
            expr = expr.replace(f'"{prev_name}"', f"( {prev_expr} )")
        name = out or f"calc{idx}"
        name = name.replace("%#", str(n))
        if band_name is not None:
            name = name.replace("#BAND#", band_name)
        named[name] = expr
        entries.append((expand_calc_expression(expr, catalog, n), name, n))

    m = _ITER_RE.match(lines[0].strip())
    if m:
        kind, sel, tail = m.group(1), m.group(2), m.group(3).strip()
        nums = catalog.select(sel)
        if tail:
            nums = catalog.filter_by_name(nums, tail.split(","))
        body = lines[1:]
        for n in nums:
            if kind == "forbandsinbandset":
                for band in catalog.get(n).bands:
                    for line in body:
                        expr, out = split_out(line)
                        expr = expr.replace(
                            '"#BAND#"', f'"bandset{n}b{band.number}"'
                        )
                        add(expr, out, n, band.name)
            else:
                for line in body:
                    expr, out = split_out(line)
                    add(expr, out, n, None)
    else:
        for line in lines:
            expr, out = split_out(line)
            add(expr, out, catalog.current, None)
    return entries


def band_calc_script(tiles: DataFrame, expression_string: str,
                     catalog: BandSetCatalog | None = None,
                     **band_calc_kw) -> DataFrame:
    """Run a full band_calc script (iterators, multi-line, output
    directives) as ONE Spark plan: a union of the per-entry calc plans
    keyed by (out_name, bandset_number). Catalyst shares the common
    scan/pivot subplans across entries."""
    entries = parse_calc_script(expression_string, catalog)
    if not entries:
        raise ValueError("empty calc script")
    outs = []
    for expr, name, n in entries:
        df = band_calc(tiles, expr, catalog=catalog, bandset_number=n,
                       **band_calc_kw)
        outs.append(df.select(
            F.lit(name).alias("out_name"),
            F.lit(n).alias("bandset_number"),
            "*",
        ))
    out = outs[0]
    for df in outs[1:]:
        out = out.unionByName(df)
    return out


def tile_checksum(calc_df: DataFrame, nodata: float = NODATA,
                  keys: tuple = ("tile_x", "tile_y")) -> DataFrame:
    """Per-tile fixed-point checksum of a calc result — the oracle-parity
    projection (order-independent BIGINT sums of identical doubles)."""
    nd = F.lit(float(nodata))
    valid = F.filter(F.col("pixels"), lambda x: (x != nd) & ~F.isnan(x))
    return calc_df.select(
        *keys,
        F.aggregate(
            F.transform(valid, lambda x: fixed1e6(x)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("checksum"),
        F.size(valid).cast("long").alias("valid_count"),
        (F.lit(N_PX) - F.size(valid)).cast("long").alias("nodata_count"),
    )
