import numpy as np
from pyspark.sql import functions as F

from remotior_sensus_spark.operators.components import region_growing
from remotior_sensus_spark.synth.expected import (
    _full_raster,
    build_region_growing,
)


def _expected_set(sf=0.001):
    """Unbounded-fill expected pixels from the shared numpy oracle
    (synth/expected.py — the same builder the driver's DuckDB oracle
    reads as parquet, so test and driver can't drift apart)."""
    t = build_region_growing(sf)
    return set(zip(t["gx"].to_pylist(), t["gy"].to_pylist()))


def test_region_growing_matches_flood_fill(spark, geo001_dir):
    t = spark.read.parquet(f"{geo001_dir}/tiles.parquet").filter(
        (F.col("bandset") == "S2_2020-01-01") & (F.col("band") == "B04")
    )
    got = region_growing(t, 100, 100, 2400.0).toPandas()
    exp = _expected_set()
    got_set = set(zip(got.gx, got.gy))
    assert got_set == exp
    assert len(got_set) > 1


def test_region_growing_expands_past_initial_window(spark, geo001_dir):
    """A region larger than the starting window must NOT be silently
    truncated: start with max_radius_tiles=0 (a single-tile window the
    fixture region provably overflows) and require the full unbounded
    result via auto-expansion."""
    t = spark.read.parquet(f"{geo001_dir}/tiles.parquet").filter(
        (F.col("bandset") == "S2_2020-01-01") & (F.col("band") == "B04")
    )
    exp = _expected_set()
    assert any(x < 96 or x > 111 or y < 96 or y > 111 for x, y in exp), \
        "fixture must overflow the seed tile for this test to bite"
    got = region_growing(t, 100, 100, 2400.0, max_radius_tiles=0).toPandas()
    assert set(zip(got.gx, got.gy)) == exp

    # auto_expand=False keeps the bounded (clipped) legacy behavior
    clipped = region_growing(t, 100, 100, 2400.0, max_radius_tiles=0,
                             auto_expand=False).toPandas()
    assert len(clipped) < len(exp)
    assert set(zip(clipped.gx, clipped.gy)) <= exp


def test_region_growing_seed_on_nodata_is_empty(spark, geo001_dir):
    full = _full_raster(0.001)
    ys, xs = np.nonzero(np.isnan(full))
    assert len(xs), "fixture has nodata pixels"
    t = spark.read.parquet(f"{geo001_dir}/tiles.parquet").filter(
        (F.col("bandset") == "S2_2020-01-01") & (F.col("band") == "B04")
    )
    got = region_growing(t, int(xs[0]), int(ys[0]), 2400.0).toPandas()
    assert len(got) == 0
