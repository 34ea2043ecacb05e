"""Spatial join family — the engine's flagship (north_rule).

geometry -> cell cover -> equi-join on cell keys -> point-in-polygon
refinement; kNN via cell-ring expansion; explicit hot-key salting.

Re-expresses the reference's vector<->raster machinery
(util/raster_vector.py:1937-2312 rasterize/extract,
tools/raster_zonal_stats.py:226-278, core/processor_functions.py:1651-1731)
as DataFrame joins. Rasterization-by-pixel-center becomes a PIP predicate
on pixel centers; the per-feature fan-out becomes a cover-cell equi-join.

Scale design:
  * cell cover is computed with JVM ``sequence``/``explode`` — no Python
  * the cover join is broadcast when the geometry side is small, else a
    salted hash join on cell keys (adaptive hot-cell salting below)
  * PIP refinement runs only on cover-matched tiles, vectorized in one
    Arrow-batched pandas UDF (the only Python in the pipeline)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from remotior_sensus_spark import NODATA
from remotior_sensus_spark.functions.cols import (
    morton_col,
    pixel_cx,
    pixel_cy,
    pos_px,
    pos_py,
)
from remotior_sensus_spark.grid import ORIGIN_X, ORIGIN_Y, TILE_SIZE_M

# ---------------------------------------------------------------------------
# WKT parsing + vectorized ray casting (pure numpy, Arrow-batched)
# ---------------------------------------------------------------------------


def parse_wkt(wkt: str) -> list[np.ndarray]:
    """POLYGON/MULTIPOLYGON (outer rings, no holes) -> list of (N,2) arrays."""
    s = wkt.strip()
    if s.startswith("MULTIPOLYGON"):
        body = s[s.find("(") + 1:s.rfind(")")]
        rings = []
        depth, start = 0, 0
        for i, ch in enumerate(body):
            if ch == "(":
                if depth == 0:
                    start = i
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    rings.append(body[start + 1:i].strip("() "))
        out = []
        for r in rings:
            pts = [p.strip() for p in r.split(",")]
            out.append(np.array([[float(a) for a in p.split()] for p in pts]))
        return out
    if s.startswith("POLYGON"):
        body = s[s.find("((") + 2:s.rfind("))")]
        pts = [p.strip() for p in body.split(",")]
        return [np.array([[float(a) for a in p.split()] for p in pts])]
    raise ValueError(f"unsupported WKT: {s[:40]}")


def _pip_ring(ring: np.ndarray, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Vectorized ray casting; inputs never on edges (grid construction)."""
    xi, yi = ring[:-1, 0], ring[:-1, 1]
    xj, yj = ring[1:, 0], ring[1:, 1]
    inside = np.zeros(len(x), dtype=bool)
    for k in range(len(xi)):
        cond = (yi[k] > y) != (yj[k] > y)
        if not cond.any():
            continue
        xint = (xj[k] - xi[k]) * (y - yi[k]) / (yj[k] - yi[k]) + xi[k]
        inside ^= cond & (x < xint)
    return inside


def point_in_wkt(wkt: pd.Series, x: pd.Series, y: pd.Series) -> pd.Series:
    xs, ys = x.to_numpy(np.float64), y.to_numpy(np.float64)
    out = np.zeros(len(xs), dtype=bool)
    for w in wkt.unique():
        sel = (wkt == w).to_numpy()
        rings = parse_wkt(w)
        ins = np.zeros(sel.sum(), dtype=bool)
        for ring in rings:  # disjoint polygons -> OR
            ins |= _pip_ring(ring, xs[sel], ys[sel])
        out[sel] = ins
    return pd.Series(out)


# ---------------------------------------------------------------------------
# cell cover
# ---------------------------------------------------------------------------


def _t0(col, origin, size):
    return F.greatest(F.floor((col - F.lit(origin)) / F.lit(size)), F.lit(0)).cast("int")


def geometry_cell_cover(rects: DataFrame, extra_cols: tuple[str, ...] = ("class",)) -> DataFrame:
    """Rectangle-decomposed geometries -> covering tile cells.

    (roi_id, <extra>, tile_x, tile_y, cell_key) — distinct per roi/tile.
    JVM-only: floor math + sequence + explode.
    """
    eps = 1e-9
    tx0 = _t0(F.col("xmin"), ORIGIN_X, TILE_SIZE_M)
    tx1 = F.floor((F.col("xmax") - F.lit(ORIGIN_X + eps)) / F.lit(TILE_SIZE_M)).cast("int")
    ty0 = F.greatest(
        F.floor((F.lit(ORIGIN_Y) - F.col("ymax")) / F.lit(TILE_SIZE_M)), F.lit(0)
    ).cast("int")
    ty1 = F.floor((F.lit(ORIGIN_Y - eps) - F.col("ymin")) / F.lit(TILE_SIZE_M)).cast("int")
    cov = (
        rects.select(
            "roi_id", *extra_cols,
            F.explode(F.sequence(tx0, F.greatest(tx1, tx0))).alias("tile_x"),
            ty0.alias("__ty0"), F.greatest(ty1, ty0).alias("__ty1"),
        )
        .select(
            "roi_id", *extra_cols, "tile_x",
            F.explode(F.sequence(F.col("__ty0"), F.col("__ty1"))).alias("tile_y"),
        )
        .distinct()
    )
    return cov.withColumn("cell_key", morton_col(F.col("tile_x"), F.col("tile_y")))


def cluster_by_proximity(rects: DataFrame) -> DataFrame:
    """Group geometries whose tile covers overlap into proximity
    clusters (ref core/multiprocess_manager.py:2941 groups nearby ROIs
    so one worker processes each neighborhood): cover -> shared-cell
    edges -> distributed connected components. cluster_id = the
    smallest numeric roi id in the cluster, so ids are deterministic.
    Output (roi_id, cluster_id).

    Scale shape: the self-join runs on the (roi, cell) cover — never on
    geometries pairwise — and the equivalence resolution is the same
    hash-to-min/union-find used by raster CC. A downstream per-cluster
    repartition then gives the reference's locality for free."""
    from remotior_sensus_spark.operators.components import resolve_components

    cover = geometry_cell_cover(rects, extra_cols=())
    rid = F.regexp_extract("roi_id", r"(\d+)$", 1).cast("long")
    c = cover.select(rid.alias("rid"), "cell_key").distinct()
    a, b = c.alias("a"), c.alias("b")
    edges = (
        a.join(b, (F.col("a.cell_key") == F.col("b.cell_key"))
               & (F.col("a.rid") < F.col("b.rid")))
        .select(F.col("a.rid").alias("src"), F.col("b.rid").alias("dst"))
        .distinct()
    )
    roots = resolve_components(edges)
    out = (
        c.select("rid").distinct()
        .join(roots, F.col("rid") == F.col("gid"), "left")
        .select("rid", F.coalesce("root", F.col("rid")).alias("cluster_id"))
    )
    return out.select(
        F.concat(F.lit("roi_"), F.col("rid")).alias("roi_id"), "cluster_id"
    )


# ---------------------------------------------------------------------------
# salting (explicit, north_rule) — adaptive on a hot-key histogram
# ---------------------------------------------------------------------------


def salted_equi_join(
    big: DataFrame,
    dim: DataFrame,
    keys: list[str],
    *,
    salt_factor: int = 8,
    hot_threshold: int = 100_000,
    big_uid: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where `big` may be skewed on `keys`.

    Pre-pass histogram on the big side finds hot keys (a cheap partial
    agg); only those are salted: the big side gets a deterministic salt
    from its uid, the dim side fans out x salt_factor for hot keys and
    x1 otherwise (reference analogue: cluster-by-proximity pre-join,
    multiprocess_manager.py:2941; AQE skew join stays on as backstop).

    Only inner/left are supported: under right/full outer an unmatched
    HOT dim row would surface salt_factor times (one null-extended row
    per exploded salt copy) — a correctness trap, so it is rejected.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_equi_join supports how='inner'/'left', got {how!r}: "
            "outer joins would duplicate unmatched hot dim rows "
            "salt_factor times"
        )
    hist = big.groupBy(*keys).count().filter(F.col("count") > hot_threshold)
    hot = hist.select(*keys, F.lit(True).alias("__hot"))

    uid = F.col(big_uid) if big_uid else F.monotonically_increasing_id()
    big_s = (
        big.join(F.broadcast(hot), keys, "left")
        .withColumn(
            "__salt",
            F.when(
                F.col("__hot").isNotNull(),
                F.pmod(F.xxhash64(uid), F.lit(salt_factor)),
            ).otherwise(F.lit(0)).cast("int"),
        )
        .drop("__hot")
    )
    dim_s = (
        dim.join(F.broadcast(hot), keys, "left")
        .withColumn(
            "__n", F.when(F.col("__hot").isNotNull(), F.lit(salt_factor - 1)).otherwise(F.lit(0))
        )
        .withColumn("__salt", F.explode(F.sequence(F.lit(0), F.col("__n"))))
        .drop("__hot", "__n")
    )
    return big_s.join(dim_s, keys + ["__salt"], how).drop("__salt")


# ---------------------------------------------------------------------------
# interleaved-document span joins (input_hint root table)
# ---------------------------------------------------------------------------


def explode_spans(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id", F.posexplode("spans").alias("span_idx", "span")
    ).select(
        "doc_id",
        "span_idx",
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.offset").alias("offset"),
    )


def parse_media_refs(spans: DataFrame) -> DataFrame:
    """media_ref 'tile/{bandset}/{band}/{tx}/{ty}' -> typed tile-key
    columns (FIXTURES.md §1). The single definition of the media_ref
    format contract — batch (media_span_tiles) and streaming
    (streaming/incremental.py) both parse through here."""
    parts = F.split(F.col("media_ref"), "/")
    keep = [c for c in ("doc_id", "span_idx", "offset") if c in spans.columns]
    return spans.select(
        *keep,
        parts.getItem(1).alias("bandset"),
        parts.getItem(2).alias("band"),
        parts.getItem(3).cast("int").alias("tile_x"),
        parts.getItem(4).cast("int").alias("tile_y"),
    )


def media_span_tiles(docs: DataFrame, tiles: DataFrame, *, salt_factor: int = 8,
                     hot_threshold: int = 50_000) -> DataFrame:
    """media spans -> tile assignments. media_ref format
    'tile/{bandset}/{band}/{tx}/{ty}' (FIXTURES.md §1)."""
    spans = parse_media_refs(
        explode_spans(docs).filter(F.col("kind") == "media")
    )
    tile_side = tiles.select(
        "bandset", "band", "tile_x", "tile_y", "cell_key", "cell_prefix", "pixels"
    )
    joined = salted_equi_join(
        spans,
        tile_side,
        ["bandset", "band", "tile_x", "tile_y"],
        salt_factor=salt_factor,
        hot_threshold=hot_threshold,
        big_uid="doc_id",
    )
    return joined


def geom_span_rois(docs: DataFrame, geoms: DataFrame) -> DataFrame:
    """geom spans -> ROI rows (media_ref = 'roi/{roi_id}')."""
    spans = explode_spans(docs).filter(F.col("kind") == "geom")
    spans = spans.withColumn("roi_id", F.substring_index("media_ref", "/", -1))
    return spans.join(F.broadcast(geoms), "roi_id")


def span_seq_hash(docs: DataFrame) -> DataFrame:
    """Per-document span-sequence fingerprint (the input_hint invariant):
    md5 of '|'-joined 'kind§text§media_ref§offset' ordered by offset."""
    ordered = F.array_sort(
        F.transform(
            "spans",
            lambda s: F.struct(
                s.getField("offset").alias("offset"),
                s.getField("kind").alias("kind"),
                s.getField("text").alias("text"),
                s.getField("media_ref").alias("media_ref"),
            ),
        )
    )
    # coalesce each field: concat_ws SKIPS nulls (no separator), so
    # {text:NULL, media_ref:'x'} would hash identically to
    # {text:'x', media_ref:NULL}; the sentinel keeps every field
    # positionally distinct (fixtures use '' not null — identical hash)
    parts = F.transform(
        ordered,
        lambda s: F.concat_ws(
            "§",
            F.coalesce(s.getField("kind"), F.lit("\x00")),
            F.coalesce(s.getField("text"), F.lit("\x00")),
            F.coalesce(s.getField("media_ref"), F.lit("\x00")),
            F.coalesce(s.getField("offset").cast("string"), F.lit("\x00")),
        ),
    )
    return docs.select(
        "doc_id",
        F.size("spans").alias("n_spans"),
        F.md5(F.concat_ws("|", parts)).alias("span_hash"),
    )


# ---------------------------------------------------------------------------
# pixel-level PIP refinement + clip
# ---------------------------------------------------------------------------


def cover_pixels(tiles: DataFrame, geoms: DataFrame, rects: DataFrame,
                 *, bandset: str = "S2_2020-01-01", band: str = "B04",
                 tile_px: int | None = None) -> DataFrame:
    """geometries -> cover join on cell key -> per-TILE point-in-polygon
    refinement. Output: one row per (roi, pixel-inside).

    The geometry is joined ONCE per (roi, tile) — never per pixel — and
    ray casting runs over whole Arrow batches (one WKT parse per
    distinct geometry per batch, all of its tiles' pixel centers tested
    in one vectorized call). Only inside-pixels are emitted. This
    replaces the round-1 explode-then-filter plan that shipped the WKT
    string on every pixel row (VERDICT r01 "What's wrong" #3).
    """
    from remotior_sensus_spark.grid import PIXEL_SIZE, TILE_PX
    t_px = tile_px or TILE_PX
    n_px = t_px * t_px

    cov = geometry_cell_cover(rects, extra_cols=())
    t = tiles.filter((F.col("bandset") == bandset) & (F.col("band") == band))
    cand = t.join(F.broadcast(cov), ["tile_x", "tile_y"]).select(
        "roi_id", "tile_x", "tile_y", t["cell_key"].alias("cell_key"), "pixels"
    )
    geo_sel = geoms.select("roi_id", "class", "macroclass", "wkt")
    cand = cand.join(F.broadcast(geo_sel), "roi_id")

    def run(it):
        pxi = np.arange(n_px)
        off_x = (pxi % t_px) * PIXEL_SIZE + PIXEL_SIZE / 2
        off_y = (pxi // t_px) * PIXEL_SIZE + PIXEL_SIZE / 2
        for pdf in it:
            if not len(pdf):
                continue
            outs = []
            for w, g in pdf.groupby("wkt", sort=False):
                rings = parse_wkt(w)
                tx = g["tile_x"].to_numpy(np.int64)
                ty = g["tile_y"].to_numpy(np.int64)
                cx = ORIGIN_X + tx[:, None] * (t_px * PIXEL_SIZE) + off_x[None, :]
                cy = ORIGIN_Y - ty[:, None] * (t_px * PIXEL_SIZE) - off_y[None, :]
                fx, fy = cx.ravel(), cy.ravel()
                ins = np.zeros(fx.shape[0], dtype=bool)
                for ring in rings:  # disjoint polygons -> OR
                    ins |= _pip_ring(ring, fx, fy)
                if not ins.any():
                    continue
                idx = np.nonzero(ins)[0]
                row = idx // n_px
                pos = (idx % n_px).astype(np.int32)
                vals = np.asarray(
                    [np.asarray(p, dtype=np.float64) for p in g["pixels"]]
                )
                outs.append(pd.DataFrame({
                    "roi_id": g["roi_id"].to_numpy()[row],
                    "class": g["class"].to_numpy()[row].astype(np.int32),
                    "macroclass": g["macroclass"].to_numpy()[row].astype(np.int32),
                    "tile_x": tx[row].astype(np.int32),
                    "tile_y": ty[row].astype(np.int32),
                    "cell_key": g["cell_key"].to_numpy()[row],
                    "pos": pos,
                    "value": vals[row, pos],
                    "cx": fx[idx],
                    "cy": fy[idx],
                }))
            if outs:
                yield pd.concat(outs)

    schema = ("roi_id string, class int, macroclass int, tile_x int, "
              "tile_y int, cell_key long, pos int, value double, "
              "cx double, cy double")
    return cand.mapInPandas(run, schema=schema)


def clip_extent(tiles: DataFrame, xmin: float, ymin: float, xmax: float, ymax: float) -> DataFrame:
    """Extent clip at tile granularity — a pure key-range filter, prunable
    by partition/file stats (tools/band_clip.py:45-173 extent path)."""
    tx0 = int(np.floor((xmin - ORIGIN_X) / TILE_SIZE_M))
    tx1 = int(np.floor((xmax - ORIGIN_X - 1e-9) / TILE_SIZE_M))
    ty0 = int(np.floor((ORIGIN_Y - ymax) / TILE_SIZE_M))
    ty1 = int(np.floor((ORIGIN_Y - ymin - 1e-9) / TILE_SIZE_M))
    return tiles.filter(
        (F.col("tile_x") >= tx0) & (F.col("tile_x") <= tx1)
        & (F.col("tile_y") >= ty0) & (F.col("tile_y") <= ty1)
    )


def clip_vector(tiles: DataFrame, geoms: DataFrame, rects: DataFrame,
                klass: int | None = None, **kw) -> DataFrame:
    """Vector clip: pixels under the (optionally class-filtered) geometry,
    nodata outside (band_clip vector path). Returns pixel rows."""
    g = geoms if klass is None else geoms.filter(F.col("class") == klass)
    r = rects if klass is None else rects.filter(F.col("class") == klass)
    return cover_pixels(tiles, g, r, **kw)


# ---------------------------------------------------------------------------
# kNN via cell-ring expansion (new surface per north_rule; no reference op)
# ---------------------------------------------------------------------------


def knn_tiles(geoms: DataFrame, tiles: DataFrame, k: int,
              *, bandset: str = "S2_2020-01-01", band: str = "B04") -> DataFrame:
    """k nearest tiles (center-to-centroid Euclidean) per geometry.

    Two-phase ring expansion: (1) candidates within Chebyshev radius
    r0 = ceil(sqrt(k))+1 tiles; (2) re-expand to ceil(d_k) to guarantee no
    closer tile outside the first ring was missed; final top-k by
    (dist_sq, tile_x, tile_y) — integer dist_sq, fully deterministic.
    """
    t = tiles.filter((F.col("bandset") == bandset) & (F.col("band") == band)) \
             .select("tile_x", "tile_y", "cell_key")
    # bbox centroid in 5 m units relative to the grid origin — all
    # geometry coords are multiples of 10 m, so centroids are multiples
    # of 5 m and distances below are EXACT integers (no float ties).
    g = geoms.select(
        "roi_id",
        F.round((F.col("xmin") + F.col("xmax")) / 2 / 5 - F.lit(ORIGIN_X / 5))
        .cast("long").alias("gx5"),
        F.round(F.lit(ORIGIN_Y / 5) - (F.col("ymin") + F.col("ymax")) / 2 / 5)
        .cast("long").alias("gy5"),
    )
    upt = int(TILE_SIZE_M / 5)  # 5m units per tile = 32

    # grid bounds (tiny dimension aggregate, collected once): candidate
    # rings are CLAMPED to the real tile range, so an escalated grid-edge
    # ROI explodes at most the grid's own tile count instead of ~4x of it
    # in out-of-range keys that join nothing
    bx = t.agg(F.min("tile_x").alias("x0"), F.max("tile_x").alias("x1"),
               F.min("tile_y").alias("y0"), F.max("tile_y").alias("y1")).first()

    def candidates(gdf: DataFrame, radius_col) -> DataFrame:
        tx_c = F.floor(F.col("gx5") / upt).cast("int")
        ty_c = F.floor(F.col("gy5") / upt).cast("int")
        c = gdf.select(
            "roi_id", "gx5", "gy5",
            F.explode(
                F.sequence(
                    F.greatest((tx_c - radius_col).cast("int"), F.lit(bx["x0"])),
                    F.least((tx_c + radius_col).cast("int"), F.lit(bx["x1"])),
                )
            ).alias("tile_x"),
            radius_col.cast("int").alias("__r"),
            ty_c.alias("__tyc"),
        ).select(
            "roi_id", "gx5", "gy5", "tile_x",
            F.explode(
                F.sequence(
                    F.greatest(F.col("__tyc") - F.col("__r"), F.lit(bx["y0"])),
                    F.least(F.col("__tyc") + F.col("__r"), F.lit(bx["y1"])),
                )
            ).alias("tile_y"),
        )
        cand = c.join(t, ["tile_x", "tile_y"])
        dx = F.col("tile_x").cast("long") * upt + upt // 2 - F.col("gx5")
        dy = F.col("tile_y").cast("long") * upt + upt // 2 - F.col("gy5")
        return cand.withColumn("dist_sq", dx * dx + dy * dy)

    from pyspark.sql import Window

    r0 = F.lit(int(np.ceil(np.sqrt(k))) + 1)
    w = Window.partitionBy("roi_id").orderBy("dist_sq", "tile_x", "tile_y")
    first = candidates(g, r0).withColumn("rn", F.row_number().over(w))
    # phase-2 radius: ceil(d_k) when the first ring held >= k candidates;
    # otherwise (grid-edge ROI) escalate to the FULL grid span so true
    # neighbors beyond r0 are never missed (ADVICE r01: the old coalesce
    # back to r0 silently under-returned near the grid boundary).
    stats = first.groupBy("roi_id").agg(
        F.count("*").alias("__n"),
        F.max(F.when(F.col("rn") == k, F.col("dist_sq"))).alias("__dk"),
    )
    full_span = t.agg(
        (
            F.greatest(
                F.max("tile_x") - F.min("tile_x"),
                F.max("tile_y") - F.min("tile_y"),
            )
            + F.lit(2)
        ).alias("__rfull")
    )
    g2 = (
        g.join(stats, "roi_id", "left")
        .crossJoin(F.broadcast(full_span))
        .withColumn(
            "__r2",
            F.coalesce(
                F.when(
                    F.col("__n") >= k,
                    F.ceil(F.sqrt(F.col("__dk").cast("double")) / upt) + 1,
                ),
                F.col("__rfull").cast("long"),
            ).cast("int"),
        )
    )
    second = candidates(g2.select("roi_id", "gx5", "gy5", "__r2"), F.col("__r2"))
    return (
        second.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("roi_id", "tile_x", "tile_y", "dist_sq", F.col("rn").alias("rank"))
    )


def vector_cluster_distance(rects: DataFrame, threshold: float,
                            cell: float | None = None) -> DataFrame:
    """Distance-threshold vector clustering with per-cluster dissolve —
    the full semantics of the reference's gdal_vector_cluster
    (core/multiprocess_manager.py:2941, core/processor.py:1209-1378):
    two features belong to one cluster when their geometry distance is
    <= threshold (transitively), and each cluster is then dissolved
    GROUP BY the attribute field (class).

    The reference BFS-flood-fills on one node against a GDAL spatial
    index.  Here the same edge relation is built distributed: each
    rect's threshold-EXPANDED envelope registers the grid cells it
    covers, the raw envelopes register theirs, and a candidate pair
    must share >=1 cell — an equi-join on the cell key, never an
    O(n^2) cross join (if dist(A,B) <= t then B's envelope intersects
    A grown by t, so some cell holds both registrations, for ANY cell
    size).  The exact decision is rectangle gap distance
    dx^2 + dy^2 <= t^2 computed entirely in int64 (coords are integer
    meters), so edge membership is bit-exact across engines.  Feature
    distance = min over rect pairs, which the edge-level OR gives for
    free.  Edges resolve with the same distributed hash-to-min
    connected components that label raster patches; isolated features
    stay singleton clusters.

    Output one row per (cluster_root, class): n_feats, n_rects,
    area_sum (sum of rect areas), and the dissolved bbox — every
    aggregate integer-exact.  threshold must be integer-valued."""
    from remotior_sensus_spark.operators.components import resolve_components

    if not float(threshold).is_integer():
        raise ValueError("threshold must be integer-valued meters")
    thr = int(threshold)
    cs = float(cell) if cell is not None else max(2.0 * thr, 1.0)

    rid = F.regexp_extract("roi_id", r"(\d+)$", 1).cast("long")
    base = rects.select(
        rid.alias("rid"), "class",
        F.col("xmin").cast("long").alias("x0"),
        F.col("xmax").cast("long").alias("x1"),
        F.col("ymin").cast("long").alias("y0"),
        F.col("ymax").cast("long").alias("y1"),
    )

    def cells(df: DataFrame, grow: int) -> DataFrame:
        cx0 = F.floor((F.col("x0") - grow) / F.lit(cs)).cast("int")
        cx1 = F.floor((F.col("x1") + grow) / F.lit(cs)).cast("int")
        cy0 = F.floor((F.col("y0") - grow) / F.lit(cs)).cast("int")
        cy1 = F.floor((F.col("y1") + grow) / F.lit(cs)).cast("int")
        return (
            df.select("rid", "x0", "x1", "y0", "y1",
                      F.explode(F.sequence(cx0, cx1)).alias("cx"),
                      cy0.alias("__c0"), cy1.alias("__c1"))
            .select("rid", "x0", "x1", "y0", "y1", "cx",
                    F.explode(F.sequence("__c0", "__c1")).alias("cy"))
        )

    a = cells(base, thr).alias("a")
    b = cells(base, 0).alias("b")
    dx = F.greatest(F.lit(0).cast("long"),
                    F.col("a.x0") - F.col("b.x1"),
                    F.col("b.x0") - F.col("a.x1"))
    dy = F.greatest(F.lit(0).cast("long"),
                    F.col("a.y0") - F.col("b.y1"),
                    F.col("b.y0") - F.col("a.y1"))
    edges = (
        a.join(b, (F.col("a.cx") == F.col("b.cx"))
               & (F.col("a.cy") == F.col("b.cy"))
               & (F.col("a.rid") < F.col("b.rid")))
        .filter(dx * dx + dy * dy <= F.lit(thr * thr).cast("long"))
        .select(F.col("a.rid").alias("src"), F.col("b.rid").alias("dst"))
        .distinct()
    )
    roots = resolve_components(edges)
    assigned = (
        base.join(roots, base["rid"] == roots["gid"], "left")
        .select(base["*"], F.coalesce("root", base["rid"]).alias("cluster_root"))
    )
    # dissolve: per (cluster, class) — two-level so the rect rollup is
    # map-side combinable and no countDistinct Expand is planned
    per_feat = assigned.groupBy("cluster_root", "class", "rid").agg(
        F.count("*").alias("nr"),
        F.sum((F.col("x1") - F.col("x0")) * (F.col("y1") - F.col("y0"))
              ).alias("ar"),
        F.min("x0").alias("fx0"), F.min("y0").alias("fy0"),
        F.max("x1").alias("fx1"), F.max("y1").alias("fy1"),
    )
    return per_feat.groupBy("cluster_root", "class").agg(
        F.count("*").alias("n_feats"),
        F.sum("nr").alias("n_rects"),
        F.sum("ar").alias("area_sum"),
        F.min("fx0").alias("bx0"), F.min("fy0").alias("by0"),
        F.max("fx1").alias("bx1"), F.max("fy1").alias("by1"),
    )


def compact_cell_cover(rects: DataFrame, max_level: int = 4,
                       tx_max: int | None = None,
                       ty_max: int | None = None) -> DataFrame:
    """H3-compact / S2-coverer analogue on the Morton tile hierarchy:
    the union cell cover of all geometries (geometry_cell_cover, the
    same bbox arithmetic every vector<->raster join here uses) is
    COMPACTED bottom-up — any cell whose 4 children are fully covered
    is replaced by its parent, recursively, so a level-k cell spans
    2^k x 2^k tiles.  This is the compressed cover a hierarchical
    spatial index ships to a join instead of the raw tile list (H3
    `compact_cells` / S2 `RegionCoverer` semantics on the repo's
    prefix-truncation hierarchy, grid.py's cell_key >> 2k).

    Output census, one row per NONEMPTY level:
    (level, n_cells, cell_key_sum) with cell_key_sum =
    sum(tile_x * 2^16 + tile_y) over that level's (level-local) cell
    coordinates — exact integers, no floats.

    Scale shape: the cover is bounded by geometry count x bbox size,
    never raster pixels; each promotion level is one hash groupBy on a
    4x-shrinking frame, and the survivor anti-joins broadcast the
    (tiny) promoted-parent sets.  max_level caps the chain at a fixed
    plan depth — no iteration, no driver loop."""
    cover = (geometry_cell_cover(rects, extra_cols=())
             .select("tile_x", "tile_y").distinct())
    # grid clamp (S2 RegionCoverer covers a FINITE grid): geometries
    # may overhang the raster edge — their bbox cover cells beyond
    # (tx_max, ty_max) index no tiles and must not enter the coverer
    # (caught at sf0.001, where two ROIs overhang the 16-tile grid;
    # the low edge is already clamped at 0 by geometry_cell_cover)
    if tx_max is not None:
        cover = cover.filter(F.col("tile_x") <= int(tx_max))
    if ty_max is not None:
        cover = cover.filter(F.col("tile_y") <= int(ty_max))
    levels = [cover]
    for _k in range(1, max_level + 1):
        levels.append(
            levels[-1]
            .groupBy(F.expr("div(tile_x, 2)").cast("int").alias("tile_x"),
                     F.expr("div(tile_y, 2)").cast("int").alias("tile_y"))
            .agg(F.count("*").alias("nc"))
            .filter(F.col("nc") == 4).drop("nc"))
    outs = []
    for k in range(max_level + 1):
        cur = levels[k]
        if k < max_level:
            parents = levels[k + 1].select(
                F.col("tile_x").alias("ptx"), F.col("tile_y").alias("pty"))
            cur = cur.join(
                F.broadcast(parents),
                (F.expr("div(tile_x, 2)") == F.col("ptx"))
                & (F.expr("div(tile_y, 2)") == F.col("pty")),
                "left_anti")
        outs.append(cur.agg(
            F.lit(k).cast("int").alias("level"),
            F.count("*").alias("n_cells"),
            F.coalesce(
                F.sum(F.col("tile_x").cast("long") * F.lit(65536)
                      + F.col("tile_y")),
                F.lit(0).cast("long")).alias("cell_key_sum")))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.filter(F.col("n_cells") > 0)


def tile_skew_profile(docs: DataFrame) -> DataFrame:
    """Hot-cell skew census over the doc->tile assignment — the
    diagnosis behind salted_equi_join's hot-key handling (north_rule:
    'skew handled by adaptive salting on hot H3 cells'): per referenced
    cell the media-span count, rolled up to power-of-two density bands
    so the skew tail is visible at a glance and a salting threshold
    can be chosen from data.  Returns one row per density band:
    (density_band, n_cells, sum_spans, max_spans, sum_docs) with
    density_band = floor(log2(n_spans)) (exact via binary length).

    Scale shape: one cell-keyed groupBy over the parsed spans (the
    same key the join shuffles on) + a <64-row bounded band rollup —
    the profile costs one pass over the span stream, no join."""
    spans = parse_media_refs(
        explode_spans(docs).filter(F.col("kind") == "media"))
    cells = spans.groupBy("bandset", "band", "tile_x", "tile_y").agg(
        F.count("*").alias("n_spans"),
        F.countDistinct("doc_id").alias("n_docs"))
    band = (F.length(F.bin(F.col("n_spans"))) - 1).cast("int")
    return (cells.select(band.alias("density_band"), "n_spans", "n_docs")
            .groupBy("density_band")
            .agg(F.count("*").alias("n_cells"),
                 F.sum("n_spans").alias("sum_spans"),
                 F.max("n_spans").alias("max_spans"),
                 F.sum("n_docs").alias("sum_docs")))
