"""Regression tests for the round-2 self-review findings: combination
encoding injectivity with unequal band domains, shear-affine bbox
reprojection, degenerate-rect rasterize, mixed-dims media decode."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F


def test_combination_unequal_domains_injective(spark):
    """Bands A in 0..2, B in 0..1: the reference's t=1 encoding collides
    (A + 2B maps (2,0) and (0,1) both to 2); the operator must detect
    this and fall back to the injective radix so every distinct combo
    gets its own raster_value."""
    from remotior_sensus_spark.operators.combination import combination_table

    rows = [(a, b) for a in (0, 1, 2) for b in (0, 1) for _ in range(a + b + 1)]
    px = spark.createDataFrame(rows, "A int, B int")
    out = combination_table(px, ["A", "B"]).toPandas()
    assert len(out) == 6
    assert sorted(out["raster_value"]) == list(range(1, 7))
    # per-combo pixel counts survive the rank join
    m = {(r.A, r.B): r.pixel_sum for r in out.itertuples()}
    assert m[(2, 1)] == 4 and m[(0, 0)] == 1


def test_combination_negative_min_injective(spark):
    from remotior_sensus_spark.operators.combination import combination_table

    rows = [(a, b) for a in (-2, 0, 3) for b in (-1, 2)]
    px = spark.createDataFrame(rows, "A int, B int")
    out = combination_table(px, ["A", "B"]).toPandas()
    assert len(out) == 6
    assert sorted(out["raster_value"]) == list(range(1, 7))


def test_reproject_vector_shear_bbox(spark):
    """Mixed-sign shear: the bbox extreme lands on a mixed corner, so
    all four corners must be transformed (two-corner transform gives a
    truncated envelope)."""
    from remotior_sensus_spark.operators.warp import reproject_vector

    g = spark.createDataFrame(
        [("r0", 1, 0.0, 10.0, 0.0, 1.0, "POLYGON ((0 0, 10 0, 10 1, 0 1, 0 0))")],
        "roi_id string, class int, xmin double, xmax double, "
        "ymin double, ymax double, wkt string",
    )
    fwd = (1.0, -1.0, 0.0, 0.0, 1.0, 0.0)  # x' = x - y, y' = y
    out = reproject_vector(g, fwd).collect()[0]
    xs = [x - y for x in (0.0, 10.0) for y in (0.0, 1.0)]
    assert out["xmin"] == min(xs) and out["xmax"] == max(xs)
    assert out["ymin"] == 0.0 and out["ymax"] == 1.0


def test_rasterize_ignores_degenerate_rects(spark):
    from remotior_sensus_spark.grid import ORIGIN_X, ORIGIN_Y
    from remotior_sensus_spark.operators.raster_edit import (
        rasterize_all_touched,
        rasterize_area_based,
    )

    rects = spark.createDataFrame(
        [(5, ORIGIN_X + 10.0, ORIGIN_Y - 20.0, ORIGIN_X + 10.0, ORIGIN_Y - 10.0)],
        "class int, xmin double, ymin double, xmax double, ymax double",
    )
    assert rasterize_all_touched(rects).count() == 0
    assert rasterize_area_based(rects).count() == 0


def test_decode_mixed_dims_batch(spark):
    """A batch mixing media sizes must decode each image at its own
    dims, matching the scalar fake_decode reference per row."""
    from remotior_sensus_spark.operators.multimodal import (
        decode_and_resize,
        fake_decode,
    )

    blobs = [bytes(range(8)) * 4, bytes(range(1, 9)) * 8]
    rows = [
        ("bs", "B04", 0, 0, {"mime": "image/fake-raw", "width": 16,
                             "height": 16, "channels": 1}, blobs[0]),
        ("bs", "B04", 0, 1, {"mime": "image/fake-raw", "width": 32,
                             "height": 32, "channels": 1}, blobs[1]),
    ]
    df = spark.createDataFrame(
        rows,
        "bandset string, band string, tile_x int, tile_y int, "
        "media_meta struct<mime:string,width:int,height:int,channels:int>, "
        "media_blob binary",
    ).coalesce(1)
    got = {(r.tile_x, r.tile_y): np.array(r.thumb)
           for r in decode_and_resize(df, out_size=8).collect()}
    for (blob, dims, key) in [(blobs[0], 16, (0, 0)), (blobs[1], 32, (0, 1))]:
        img = fake_decode(blob, dims, dims)
        step = max(1, dims // 8)
        exp = img[::step, ::step][:8, :8].reshape(-1).astype(np.int32)
        assert np.array_equal(got[key], exp), key
