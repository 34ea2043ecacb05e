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


def test_vector_cluster_distance_brute_force(spark):
    """Independent brute-force oracle for vector_cluster_distance:
    random multi-rect features (plus exact-threshold and cell-boundary
    adversaries), clustered by python union-find over ALL pairs with
    the same integer rect-gap distance. The Spark side blocks
    candidates on grid cells — a blocking bug that drops a pair
    straddling a cell boundary, or an off-by-one at dist == threshold,
    fails here."""
    import random

    from remotior_sensus_spark.operators.spatial_join import (
        vector_cluster_distance)

    rng = random.Random(41)
    thr = 100
    rows = []
    # random features, 1-3 rects each, coords multiples of 10
    for rid in range(40):
        cls = rng.randint(1, 4)
        for k in range(rng.randint(1, 3)):
            x0 = rng.randrange(0, 5000, 10)
            y0 = rng.randrange(0, 5000, 10)
            rows.append((f"roi_{rid}", cls, float(x0), float(y0),
                         float(x0 + rng.randrange(10, 400, 10)),
                         float(y0 + rng.randrange(10, 400, 10))))
    # adversaries: gap EXACTLY thr (must join), thr+10 (must not),
    # diagonal gap exactly thr via 60/80, pair straddling the 200-cell
    # boundary used by cs=2*thr
    rows += [
        ("roi_100", 1, 9000.0, 0.0, 9100.0, 100.0),
        ("roi_101", 1, 9200.0, 0.0, 9300.0, 100.0),      # dx=100=thr
        ("roi_102", 1, 9000.0, 1000.0, 9100.0, 1100.0),
        ("roi_103", 1, 9210.0, 1000.0, 9310.0, 1100.0),  # dx=110>thr
        ("roi_104", 2, 9000.0, 2000.0, 9100.0, 2100.0),
        ("roi_105", 2, 9160.0, 2180.0, 9260.0, 2280.0),  # dx=60,dy=80
        ("roi_106", 3, 190.0, 9000.0, 199.0, 9010.0),
        ("roi_107", 3, 201.0, 9000.0, 210.0, 9010.0),    # cell seam
    ]
    rects = spark.createDataFrame(
        rows, "roi_id string, class int, xmin double, ymin double, "
              "xmax double, ymax double")

    # brute force
    feats = {}
    for roi, cls, x0, y0, x1, y1 in rows:
        rid = int(roi.split("_")[1])
        feats.setdefault(rid, (cls, []))[1].append(
            (int(x0), int(y0), int(x1), int(y1)))

    def gap2(ra, rb):
        dx = max(0, ra[0] - rb[2], rb[0] - ra[2])
        dy = max(0, ra[1] - rb[3], rb[1] - ra[3])
        return dx * dx + dy * dy

    parent = {r: r for r in feats}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    ids = sorted(feats)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if any(gap2(ra, rb) <= thr * thr
                   for ra in feats[a][1] for rb in feats[b][1]):
                ra_, rb_ = find(a), find(b)
                if ra_ != rb_:
                    parent[max(ra_, rb_)] = min(ra_, rb_)
    exp = {}
    for rid, (cls, rlist) in feats.items():
        root = find(rid)
        key = (root, cls)
        nf, nr, ar, bx0, by0, bx1, by1 = exp.get(
            key, (0, 0, 0, 10**9, 10**9, -10**9, -10**9))
        nf += 1
        nr += len(rlist)
        ar += sum((x1 - x0) * (y1 - y0) for x0, y0, x1, y1 in rlist)
        bx0 = min(bx0, min(r[0] for r in rlist))
        by0 = min(by0, min(r[1] for r in rlist))
        bx1 = max(bx1, max(r[2] for r in rlist))
        by1 = max(by1, max(r[3] for r in rlist))
        exp[key] = (nf, nr, ar, bx0, by0, bx1, by1)

    got = {
        (r["cluster_root"], r["class"]):
            (r["n_feats"], r["n_rects"], r["area_sum"],
             r["bx0"], r["by0"], r["bx1"], r["by1"])
        for r in vector_cluster_distance(rects, threshold=thr).collect()
    }
    assert got == exp
    # the adversaries resolved as designed
    roots = {k[0] for k in got}
    assert any(k[0] == 100 and got[k][0] == 2 for k in got)   # 100+101
    assert {102, 103} <= roots                                 # apart
    assert any(k[0] == 104 and got[k][0] == 2 for k in got)   # diagonal
    assert any(k[0] == 106 and got[k][0] == 2 for k in got)   # seam


def test_compact_cell_cover_engineered(spark):
    """Hand-built covers with KNOWN compaction: an aligned 4x4-tile
    block must become exactly one level-2 cell, a lone tile and a 2x1
    strip must stay at level 0, and nothing may promote past level 2."""
    from remotior_sensus_spark.grid import ORIGIN_X as OX, ORIGIN_Y as OY
    from remotior_sensus_spark.operators.spatial_join import (
        compact_cell_cover)

    rows = [
        # 4x4 tile block anchored at tile (0,0): 640 m square
        ("a", 1, OX, OY - 640.0, OX + 640.0, OY),
        # lone tile (9,9)
        ("b", 1, OX + 1440.0, OY - 1600.0, OX + 1600.0, OY - 1440.0),
        # 2x1 strip, tiles (6,0)-(7,0)
        ("c", 1, OX + 960.0, OY - 160.0, OX + 1280.0, OY),
    ]
    rects = spark.createDataFrame(
        rows, "roi_id string, class int, xmin double, ymin double, "
              "xmax double, ymax double")
    got = {r["level"]: (r["n_cells"], r["cell_key_sum"])
           for r in compact_cell_cover(rects).collect()}
    assert got == {
        0: (3, 9 * 65536 + 9 + 6 * 65536 + 7 * 65536),
        2: (1, 0),
    }


def test_compact_cell_cover_rebuild_matches_brute(spark, geo001_dir):
    """Decompacting the census against a brute pure-Python compaction
    of the sf0.001 cover (sets + dict recursion — no DataFrame code
    shared with the engine). The brute cover applies the same grid
    clamp the registered query uses (two sf0.001 ROIs overhang the
    16-tile grid — the unclamped first cut failed exactly here)."""
    import pandas as pd
    from remotior_sensus_spark import queries as Q
    from remotior_sensus_spark.operators.spatial_join import (
        geometry_cell_cover)

    rects = spark.read.parquet(f"{geo001_dir}/geometry_rects.parquet")
    px = pd.read_parquet(f"{geo001_dir}/tile_pixels.parquet",
                         columns=["bandset", "band", "tile_x", "tile_y"])
    px = px[(px.bandset == "S2_2020-01-01") & (px.band == "B04")]
    txm, tym = int(px.tile_x.max()), int(px.tile_y.max())
    cover = {(r["tile_x"], r["tile_y"]) for r in
             geometry_cell_cover(rects).select(
                 "tile_x", "tile_y").distinct().collect()
             if r["tile_x"] <= txm and r["tile_y"] <= tym}
    levels = [cover]
    for _ in range(4):
        from collections import Counter
        c = Counter((x // 2, y // 2) for x, y in levels[-1])
        levels.append({k for k, n in c.items() if n == 4})
    want = {}
    for k in range(5):
        out = levels[k] if k == 4 else {
            (x, y) for x, y in levels[k]
            if (x // 2, y // 2) not in levels[k + 1]}
        if out:
            want[k] = (len(out), sum(x * 65536 + y for x, y in out))
    got = {r["level"]: (r["n_cells"], r["cell_key_sum"])
           for r in Q.REGISTRY["compact_cell_cover"][0](
               spark, "/root/testdata/sf0.001").collect()}
    assert got == want


def test_zonal_majority_dense(spark, geo001_dir):
    """Pure pandas/Counter rebuild from raw parquet via strict
    pixel-center containment — no relational ops shared with the
    oracle's formulation."""
    from collections import Counter
    import pandas as pd
    from remotior_sensus_spark import queries as Q

    px = pd.read_parquet(f"{geo001_dir}/tile_pixels.parquet")
    px = px[(px.bandset == "S2_2020-01-01") & (px.band == "B04")
            & (px.value != -32768)]
    rects = pd.read_parquet(f"{geo001_dir}/geometry_rects.parquet")
    per_class = {}
    for _, r in rects.iterrows():
        m = px[(px.cx > r.xmin) & (px.cx < r.xmax)
               & (px.cy > r.ymin) & (px.cy < r.ymax)]
        s = per_class.setdefault(int(r["class"]), set())
        for gx, gy, v in zip(m.gx, m.gy, m.value):
            s.add((gx, gy, int(v)))
    want = {}
    for cls, pts in per_class.items():
        c = Counter(v for _gx, _gy, v in pts)
        best = max(c.items(), key=lambda kv: (kv[1], -kv[0]))
        want[cls] = (best[0], best[1], len(pts))
    got = {r["class"]: (r["majority_value"], r["n_px_majority"],
                        r["n_px_zone"])
           for r in Q.queries()["zonal_majority"](
               spark, geo001_dir).collect()}
    assert got == want and len(got) >= 2


def test_tile_skew_profile_matches_pandas(spark, geo001_dir):
    """Rebuild the density-band census from the raw documents table
    with python span explosion (not the exploded doc_spans parquet the
    oracle reads)."""
    from collections import Counter
    import pandas as pd
    from remotior_sensus_spark import queries as Q

    docs = pd.read_parquet(f"{geo001_dir}/documents.parquet")
    cell_spans = Counter()
    cell_docs = {}
    for _, row in docs.iterrows():
        for sp in row["spans"]:
            if sp["kind"] != "media":
                continue
            _tag, bs, band, tx, ty = sp["media_ref"].split("/")
            key = (bs, band, int(tx), int(ty))
            cell_spans[key] += 1
            cell_docs.setdefault(key, set()).add(row["doc_id"])
    want = {}
    for key, n in cell_spans.items():
        b = n.bit_length() - 1
        w = want.setdefault(b, [0, 0, 0, 0])
        w[0] += 1
        w[1] += n
        w[2] = max(w[2], n)
        w[3] += len(cell_docs[key])
    got = {r["density_band"]: [r["n_cells"], r["sum_spans"],
                               r["max_spans"], r["sum_docs"]]
          for r in Q.queries()["tile_skew_profile"](
              spark, geo001_dir).collect()}
    assert got == want and sum(w[1] for w in want.values()) == sum(
        cell_spans.values())
