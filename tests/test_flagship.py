"""Parity test for the bench flagship job (north-rule spatial join +
tile assignment + zonal aggregation).

The flagship in bench.py is shuffle-optimized (broadcast dims, one
doc-keyed exchange, two-level aggregation).  This test recomputes the
same per-document summary via a deliberately naive plan — plain joins,
countDistinct, full outer combine — and asserts value equality at
replicate=1, so any restructuring of the optimized plan is caught.
"""

from __future__ import annotations

import os
import sys

import pandas as pd
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from remotior_sensus_spark.sources import catalog as cat

SF_DIR = "/root/testdata/sf0.001"


def _naive(spark, prepared):
    tile_hist, roi_zonal = prepared
    # unpack the bit-packed per-tile histogram (px_valid + c1..c4 in
    # 12-bit fields, c5 = px_valid - c1..c4) back into plain columns so
    # the naive plan below stays the straightforward join + agg oracle
    px_valid = F.col("packed").bitwiseAND(F.lit(4095))
    cs = [F.shiftright("packed", 12 * i).bitwiseAND(F.lit(4095))
          for i in range(1, 5)]
    tile_hist = tile_hist.select(
        "bs_key", "tile_x", "tile_y", "cell_key",
        F.col("s").alias("px_sum"),
        px_valid.alias("px_valid"),
        *[c.alias(f"c{i}") for i, c in enumerate(cs, start=1)],
        (px_valid - sum(cs)).alias("c5"),
    )
    docs = cat.load_geo(spark, SF_DIR, "documents")
    spans = docs.select(
        "doc_id", F.explode("spans").alias("span")
    ).select(
        "doc_id",
        F.col("span.kind").alias("kind"),
        F.col("span.media_ref").alias("media_ref"),
    )
    parts = F.split(F.col("media_ref"), "/")
    media = spans.filter(F.col("kind") == "media").select(
        F.xxhash64("doc_id").alias("doc_key"),
        F.xxhash64(parts.getItem(1)).alias("bs_key"),
        parts.getItem(3).cast("int").alias("tile_x"),
        parts.getItem(4).cast("int").alias("tile_y"),
    ).join(tile_hist, ["bs_key", "tile_x", "tile_y"]).groupBy("doc_key").agg(
        F.count("*").alias("n_tiles"),
        F.countDistinct("cell_key").alias("n_cells"),
        F.sum("px_sum").alias("px_sum"),
        F.sum("px_valid").alias("px_valid"),
        *[F.sum(f"c{c}").alias(f"class_{c}_px") for c in range(1, 6)],
    )
    geom = spans.filter(F.col("kind") == "geom").select(
        F.xxhash64("doc_id").alias("doc_key"),
        F.xxhash64(F.substring_index("media_ref", "/", -1)).alias("roi_key"),
    ).join(roi_zonal, "roi_key", "left").groupBy("doc_key").agg(
        F.count("*").alias("n_geom_spans"),
        F.sum("roi_pixels").alias("geom_pixels"),
        F.sum("roi_sum").alias("geom_sum"),
    )
    return media.join(geom, "doc_key", "outer")


def test_flagship_matches_naive(spark):
    prepared = bench.prepare_dims(spark, SF_DIR)
    got = bench.flagship(spark, SF_DIR, replicate=1, prepared=prepared
                         ).toPandas()
    exp = _naive(spark, prepared).toPandas()
    assert len(got) == len(exp) > 0

    cols = sorted(c for c in exp.columns if c != "doc_key")
    a = got.set_index("doc_key")[cols].fillna(0).astype("int64").sort_index()
    b = exp.set_index("doc_key")[cols].fillna(0).astype("int64").sort_index()
    assert list(a.index) == list(b.index)
    pd.testing.assert_frame_equal(a, b)


def test_flagship_replicate_scales_counts(spark):
    """replicate=R multiplies every additive per-doc measure by exactly
    R (distinct doc keys per replica), so docs/sec accounting is honest."""
    prepared = bench.prepare_dims(spark, SF_DIR)
    r1 = bench.flagship(spark, SF_DIR, replicate=1, prepared=prepared)
    r3 = bench.flagship(spark, SF_DIR, replicate=3, prepared=prepared)
    s1 = r1.agg(F.sum("n_tiles"), F.sum("px_valid"),
                F.sum("n_geom_spans"), F.count("*")).collect()[0]
    s3 = r3.agg(F.sum("n_tiles"), F.sum("px_valid"),
                F.sum("n_geom_spans"), F.count("*")).collect()[0]
    for i in range(4):
        assert s3[i] == 3 * s1[i], (i, s1[i], s3[i])
