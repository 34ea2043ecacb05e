import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from remotior_sensus_spark.operators.spatial_join import (
    geometry_cell_cover,
    parse_wkt,
    point_in_wkt,
    salted_equi_join,
)


def test_parse_wkt_polygon():
    rings = parse_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    assert len(rings) == 1 and rings[0].shape == (5, 2)


def test_parse_wkt_multipolygon():
    w = "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((5 5, 6 5, 6 6, 5 6, 5 5)))"
    rings = parse_wkt(w)
    assert len(rings) == 2


def test_pip_rect():
    w = pd.Series(["POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"] * 4)
    x = pd.Series([5.0, 15.0, 5.0, -1.0])
    y = pd.Series([5.0, 5.0, 15.0, 5.0])
    assert point_in_wkt(w, x, y).tolist() == [True, False, False, False]


def test_pip_l_shape():
    # L: base (0,0)-(20,10) + tower (0,10)-(10,20)
    w = pd.Series(
        ["POLYGON ((0 0, 20 0, 20 10, 10 10, 10 20, 0 20, 0 0))"] * 3
    )
    x = pd.Series([15.0, 15.0, 5.0])
    y = pd.Series([5.0, 15.0, 15.0])
    assert point_in_wkt(w, x, y).tolist() == [True, False, True]


def test_cell_cover_matches_rect_math(spark, geo001_dir):
    rects = spark.read.parquet(f"{geo001_dir}/geometry_rects.parquet")
    cov = geometry_cell_cover(rects).toPandas()
    rp = rects.toPandas()
    from remotior_sensus_spark.grid import tile_range_for_bbox

    exp = set()
    for _, r in rp.iterrows():
        tx0, ty0, tx1, ty1 = tile_range_for_bbox(r.xmin, r.ymin, r.xmax, r.ymax)
        for tx in range(tx0, tx1 + 1):
            for ty in range(ty0, ty1 + 1):
                exp.add((r.roi_id, tx, ty))
    got = set(zip(cov.roi_id, cov.tile_x, cov.tile_y))
    assert got == exp


def test_salted_join_equals_plain_join(spark):
    big = spark.range(10000).select(
        (F.col("id") % 5).alias("k"), F.col("id").alias("uid")
    )
    dim = spark.range(5).select(F.col("id").alias("k"), (F.col("id") * 10).alias("v"))
    plain = big.join(dim, "k").agg(F.count("*"), F.sum("v")).collect()[0]
    salted = (
        salted_equi_join(big, dim, ["k"], salt_factor=4, hot_threshold=100, big_uid="uid")
        .agg(F.count("*"), F.sum("v"))
        .collect()[0]
    )
    assert tuple(plain) == tuple(salted)


def test_knn_matches_bruteforce(spark, geo001_dir):
    from remotior_sensus_spark.operators.spatial_join import knn_tiles

    tiles = spark.read.parquet(f"{geo001_dir}/tiles.parquet")
    geoms = spark.read.parquet(f"{geo001_dir}/geometries.parquet")
    got = knn_tiles(geoms, tiles, 7).toPandas()

    t = (
        tiles.filter((F.col("bandset") == "S2_2020-01-01") & (F.col("band") == "B04"))
        .select("tile_x", "tile_y").toPandas()
    )
    g = geoms.select("roi_id", "xmin", "xmax", "ymin", "ymax").toPandas()
    from remotior_sensus_spark.grid import ORIGIN_X, ORIGIN_Y

    for _, r in g.iterrows():
        gx5 = round((r.xmin + r.xmax) / 2 / 5 - ORIGIN_X / 5)
        gy5 = round(ORIGIN_Y / 5 - (r.ymin + r.ymax) / 2 / 5)
        d = (t.tile_x * 32 + 16 - gx5) ** 2 + (t.tile_y * 32 + 16 - gy5) ** 2
        bf = t.assign(dist_sq=d).sort_values(
            ["dist_sq", "tile_x", "tile_y"]
        ).head(7)
        mine = got[got.roi_id == r.roi_id].sort_values("rank")
        assert list(mine.dist_sq) == list(bf.dist_sq), r.roi_id
        assert list(mine.tile_x) == list(bf.tile_x)
        assert list(mine.tile_y) == list(bf.tile_y)


def test_span_invariant_preserved_through_pipeline(spark, geo001_dir):
    """input_hint per-row invariant: the span sequence survives
    explode -> join -> regroup."""
    from remotior_sensus_spark.operators.spatial_join import (
        explode_spans,
        span_seq_hash,
    )

    docs = spark.read.parquet(f"{geo001_dir}/documents.parquet")
    orig = span_seq_hash(docs)
    rebuilt = (
        explode_spans(docs)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_spans"),
            F.md5(
                F.concat_ws(
                    "|",
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.struct("offset", "kind", "text", "media_ref")
                            )
                        ),
                        lambda s: F.concat_ws(
                            "§",
                            s.getField("kind"),
                            s.getField("text"),
                            s.getField("media_ref"),
                            s.getField("offset").cast("string"),
                        ),
                    ),
                )
            ).alias("span_hash"),
        )
    )
    diff = (
        orig.alias("a")
        .join(rebuilt.alias("b"), "doc_id")
        .filter(F.col("a.span_hash") != F.col("b.span_hash"))
        .count()
    )
    assert diff == 0
