"""Pixel-for-pixel parity of band_calc against a masked-numpy oracle
replicating the reference kernel (processor_functions.py:112-160)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from remotior_sensus_spark import NODATA
from remotior_sensus_spark.operators.band_calc import band_calc
from remotior_sensus_spark.plans.expression import compile_expression, percentile_index
from remotior_sensus_spark.synth.generate import tile_pixel_values


def np_oracle(expr_np, arrays, nodata_mask="any"):
    """Replicates band_calculation: masked eval, bool->int, nodata write."""
    masks = [a == NODATA for a in arrays]
    stack = np.stack(masks)
    invalid = stack.any(axis=0) if nodata_mask == "any" else stack.all(axis=0)
    out = expr_np(*[a.astype(np.float64) for a in arrays])
    if out.dtype == bool:
        out = out.astype(float)
    out = out.astype(np.float64)
    out[invalid] = NODATA
    return out


@pytest.fixture(scope="module")
def tiles001(spark, geo001_dir):
    return spark.read.parquet(f"{geo001_dir}/tiles.parquet")


def _spark_pixels(df, n=5):
    rows = df.orderBy("tile_x", "tile_y").limit(n).collect()
    return {(r["tile_x"], r["tile_y"]): np.array(r["pixels"]) for r in rows}


def _ref_pixels(band_idx, tx, ty):
    return tile_pixel_values(0, band_idx, np.array([tx]), np.array([ty]))[0].astype(np.float64)


def test_ndvi_pixel_parity(tiles001):
    out = _spark_pixels(band_calc(tiles001, "#NDVI#"))
    for (tx, ty), got in out.items():
        nir = _ref_pixels(3, tx, ty)
        red = _ref_pixels(2, tx, ty)
        exp = np_oracle(lambda n, r: (n - r) / (n + r), [nir, red])
        assert np.array_equal(got, exp), (tx, ty)


def test_where_bool_cast(tiles001):
    out = _spark_pixels(band_calc(tiles001, 'where("B04" > 2500, 1, 0)'))
    for (tx, ty), got in out.items():
        red = _ref_pixels(2, tx, ty)
        exp = np_oracle(lambda r: np.where(r > 2500, 1.0, 0.0), [red])
        assert np.array_equal(got, exp)


def test_mask_mode_all(tiles001):
    out = _spark_pixels(band_calc(tiles001, '"B08" + "B04"', nodata_mask="all"))
    for (tx, ty), got in out.items():
        nir, red = _ref_pixels(3, tx, ty), _ref_pixels(2, tx, ty)
        exp = np_oracle(lambda a, b: a + b, [nir, red], nodata_mask="all")
        assert np.array_equal(got, exp)


def test_percentile_closest_observation():
    # mirror np.round half-even (processor_functions.py:94-96)
    for n in range(2, 8):
        for p in (0, 1, 25, 50, 80, 99, 100):
            assert percentile_index(n, p) == int(np.round((n - 1) * p / 100.0))


def test_percentile_expression_matches_numpy(tiles001):
    out = _spark_pixels(
        band_calc(tiles001, 'percentile([ "B02", "B03", "B04", "B08" ], 80)')
    )
    for (tx, ty), got in out.items():
        arrs = [_ref_pixels(i, tx, ty) for i in range(4)]

        def perc(*xs):
            st = np.stack(xs)
            idx = int(np.round((len(xs) - 1) * 0.8))
            return np.sort(st, axis=0)[idx]

        exp = np_oracle(perc, arrs)
        assert np.array_equal(got, exp)


def test_compile_errors():
    with pytest.raises(ValueError):
        compile_expression('frobnicate("B02")')
    with pytest.raises((ValueError, SyntaxError)):
        compile_expression('"B02" +')


def test_expression_variable_order():
    c = compile_expression('("B08" - "B04") / ("B08" + "B04")')
    assert c.variables == ["B08", "B04"]
