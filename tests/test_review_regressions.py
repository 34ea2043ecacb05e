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


def test_sieve_interior_patch_merges(spark):
    """A small patch fully INTERIOR to one tile must still be sieved
    into its surrounding patch (intra-tile adjacency edges; gdal
    SieveFilter semantics). Round-3 review finding."""
    from remotior_sensus_spark.operators.components import sieve

    t = 16
    px = [7.0] * (t * t)
    # 2-pixel value-5 patch at rows 5, cols 5-6 — nowhere near the border
    px[5 * t + 5] = 5.0
    px[5 * t + 6] = 5.0
    tiles = spark.createDataFrame(
        [(0, 0, px)], "tile_x int, tile_y int, pixels array<double>"
    )
    out = sieve(tiles, min_size=4).collect()
    assert len(out) == 1
    assert out[0]["old_value"] == 5.0 and out[0]["new_value"] == 7.0


def test_erosion_iterative_zero_is_noop(spark):
    from pyspark.sql import functions as F
    from remotior_sensus_spark.operators.focal import erosion_iterative

    t = 16
    px = [7.0] * (t * t)
    tiles = spark.createDataFrame(
        [(0, 0, px)], "tile_x int, tile_y int, pixels array<double>"
    )
    out = erosion_iterative(tiles, [7.0], iterations=0)
    got = out.select(F.explode("pixels").alias("v")).agg(
        F.sum("v")).collect()[0][0]
    assert got == 7.0 * t * t


def test_snapshot_id_subsecond_rewrite(tmp_path):
    import os
    from remotior_sensus_spark.checkpoint import snapshot_id

    p = str(tmp_path / "x.bin")
    with open(p, "wb") as f:
        f.write(b"a" * 64)
    s1 = snapshot_id(p)
    with open(p, "wb") as f:
        f.write(b"b" * 64)  # same size, sub-second rewrite
    s2 = snapshot_id(p)
    assert s1 != s2 or os.stat(p).st_mtime_ns == 0  # ns mtime must differ


def test_reclass_condition_preserves_nodata(spark):
    from remotior_sensus_spark.operators.reclass import reclassify_pixels

    px = spark.createDataFrame(
        [(-32768.0,), (50.0,), (200.0,)], "value double"
    )
    out = {r["value"]: r["new_value"]
           for r in reclassify_pixels(px, [("raster < 100", "1")]).collect()}
    assert out[-32768.0] == -32768.0  # nodata NOT matched by the condition
    assert out[50.0] == 1.0 and out[200.0] == 200.0
    # explicit nan rule still reclassifies nodata
    out2 = {r["value"]: r["new_value"]
            for r in reclassify_pixels(px, [("nan", "0")]).collect()}
    assert out2[-32768.0] == 0.0


def test_band_calc_duplicate_band_vars(spark):
    """Two expression variables resolving to the same physical band must
    not empty the result (pivot collapses to one canonical column)."""
    from pyspark.sql import functions as F
    from remotior_sensus_spark.operators.band_calc import band_calc

    tiles = spark.read.parquet("data/geo/sf0.001/tiles.parquet")
    out = band_calc(tiles, '"B04" + "b3"',
                    var_map={"B04": ("S2_2020-01-01", "B04"),
                             "b3": ("S2_2020-01-01", "B04")})
    n = out.count()
    assert n > 0
    ref = band_calc(tiles, '2 * "B04"',
                    var_map={"B04": ("S2_2020-01-01", "B04")})
    a = out.select(F.sum(F.aggregate(
        F.filter("pixels", lambda x: ~F.isnan(x)),
        F.lit(0.0), lambda acc, x: acc + x))).collect()[0][0]
    b = ref.select(F.sum(F.aggregate(
        F.filter("pixels", lambda x: ~F.isnan(x)),
        F.lit(0.0), lambda acc, x: acc + x))).collect()[0][0]
    assert a == b


def test_sieve_matches_numpy_oracle(spark):
    """Whole-raster sieve decisions vs an independent numpy oracle:
    flood-fill same-value components over the stitched raster, then for
    every small patch pick the adjacent patch with (max size, min value)
    — exactly gdal.SieveFilter's merge rule as pinned by sieve()."""
    import collections

    from remotior_sensus_spark.operators.components import sieve

    rng = np.random.RandomState(7)
    t, nt = 16, 2  # 2x2 tiles of 16px -> 32x32 raster
    full = rng.choice([1.0, 2.0, 3.0], size=(nt * t, nt * t),
                      p=[0.45, 0.45, 0.1])
    rows = []
    for ty in range(nt):
        for tx in range(nt):
            tile = full[ty * t:(ty + 1) * t, tx * t:(tx + 1) * t]
            rows.append((tx, ty, [float(v) for v in tile.ravel()]))
    tiles = spark.createDataFrame(
        rows, "tile_x int, tile_y int, pixels array<double>")
    min_size = 5
    got = sieve(tiles, min_size=min_size).toPandas()

    # numpy oracle: label components by flood fill
    h, w = full.shape
    comp = -np.ones((h, w), dtype=np.int64)
    comps = []
    for i in range(h):
        for j in range(w):
            if comp[i, j] >= 0:
                continue
            cid = len(comps)
            stack, cells = [(i, j)], []
            comp[i, j] = cid
            while stack:
                a, b = stack.pop()
                cells.append((a, b))
                for da, db in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                    na, nb = a + da, b + db
                    if (0 <= na < h and 0 <= nb < w and comp[na, nb] < 0
                            and full[na, nb] == full[i, j]):
                        comp[na, nb] = cid
                        stack.append((na, nb))
            comps.append((full[i, j], cells))
    sizes = {c: len(cells) for c, (_, cells) in enumerate(comps)}
    values = {c: v for c, (v, _) in enumerate(comps)}
    exp = collections.Counter()
    for c, (v, cells) in enumerate(comps):
        if sizes[c] >= min_size:
            continue
        nbrs = set()
        for a, b in cells:
            for da, db in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                na, nb = a + da, b + db
                if 0 <= na < h and 0 <= nb < w and comp[na, nb] != c:
                    nbrs.add(int(comp[na, nb]))
        if not nbrs:
            continue
        best = min(nbrs, key=lambda n: (-sizes[n], values[n]))
        exp[(v, values[best])] += 1
    got_counts = collections.Counter(
        (r.old_value, r.new_value) for r in got.itertuples())
    assert got_counts == exp
