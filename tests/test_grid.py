import numpy as np

from remotior_sensus_spark.grid import (
    cell_prefix,
    morton_decode,
    morton_key,
    pixel_centers,
    tile_range_for_bbox,
)


def test_morton_roundtrip():
    tx = np.arange(0, 1000, 7)
    ty = np.arange(0, 1000, 7)[::-1]
    k = morton_key(tx, ty)
    rx, ry = morton_decode(k)
    assert (rx == tx).all() and (ry == ty).all()
    assert len(np.unique(k)) == len(k)


def test_morton_locality():
    # adjacent tiles share a coarse prefix most of the time (Z-order)
    k1 = morton_key(10, 10)
    k2 = morton_key(11, 10)
    assert cell_prefix(k1, 8) == cell_prefix(k2, 8) or abs(
        int(cell_prefix(k1, 8)) - int(cell_prefix(k2, 8))
    ) <= 1


def test_morton_column_matches_numpy(spark):
    from pyspark.sql import functions as F

    from remotior_sensus_spark.functions.cols import morton_col

    df = spark.range(500).select(
        (F.col("id") % 23).cast("int").alias("tx"),
        (F.col("id") % 37).cast("int").alias("ty"),
    )
    rows = df.withColumn("k", morton_col(F.col("tx"), F.col("ty"))).collect()
    for r in rows:
        assert r["k"] == int(morton_key(r["tx"], r["ty"]))


def test_pixel_centers_shape_and_alignment():
    cx, cy = pixel_centers(2, 3)
    assert cx.shape == (256,)
    # centers are ≡5 (mod 10) — never on a geometry edge
    assert ((cx % 10) == 5).all() and ((cy % 10) == 5).all()
    # row-major: first 16 values share cy
    assert len(set(cy[:16])) == 1


def test_tile_range_for_bbox():
    from remotior_sensus_spark.grid import ORIGIN_X, ORIGIN_Y, TILE_SIZE_M

    tx0, ty0, tx1, ty1 = tile_range_for_bbox(
        ORIGIN_X + 10, ORIGIN_Y - 2 * TILE_SIZE_M - 10,
        ORIGIN_X + TILE_SIZE_M + 10, ORIGIN_Y - 10,
    )
    assert (tx0, ty0) == (0, 0)
    assert tx1 == 1 and ty1 == 2
