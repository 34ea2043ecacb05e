"""Focal stats and connected components vs whole-raster numpy oracles.

The oracle assembles the full global raster from the deterministic tile
generator, computes the ground truth with plain numpy (flood fill /
sliding windows), and compares; this also proves halo-size invariance
(tiles are 16x16, the oracle has no tiles at all)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from remotior_sensus_spark import NODATA
from remotior_sensus_spark.grid import TILE_PX
from remotior_sensus_spark.synth.generate import grid_n, tile_pixel_values


def full_raster(sf=0.001, bs_idx=0, band_idx=2):
    n = grid_n(sf)
    txs, tys = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    vals = tile_pixel_values(bs_idx, band_idx, txs.ravel(), tys.ravel())
    out = np.full((n * TILE_PX, n * TILE_PX), np.nan)
    for (tx, ty), v in zip(zip(txs.ravel(), tys.ravel()), vals):
        a = v.reshape(TILE_PX, TILE_PX).astype(np.float64)
        out[ty * TILE_PX:(ty + 1) * TILE_PX, tx * TILE_PX:(tx + 1) * TILE_PX] = a
    out[out == NODATA] = np.nan
    return out


@pytest.fixture(scope="module")
def b04(spark, geo001_dir):
    t = spark.read.parquet(f"{geo001_dir}/tiles.parquet")
    return t.filter((F.col("bandset") == "S2_2020-01-01") & (F.col("band") == "B04"))


def _collect_raster(df, n, tile_px=TILE_PX):
    out = np.full((n * TILE_PX, n * TILE_PX), np.nan)
    for r in df.collect():
        a = np.asarray(r["pixels"], dtype=np.float64).reshape(tile_px, tile_px)
        out[r["tile_y"] * tile_px:(r["tile_y"] + 1) * tile_px,
            r["tile_x"] * tile_px:(r["tile_x"] + 1) * tile_px] = a
    return out


@pytest.mark.parametrize("stat", ["sum", "mean", "count", "max", "min", "median"])
def test_focal_stats_match_numpy(spark, b04, stat):
    from remotior_sensus_spark.operators.focal import neighbor_stats, structure_mask

    n = grid_n(0.001)
    got = _collect_raster(neighbor_stats(b04, stat=stat, size=1), n)

    full = full_raster()
    pad = np.pad(full, 1, constant_values=np.nan)
    wins = np.lib.stride_tricks.sliding_window_view(pad, (3, 3))
    m = structure_mask(1)[None, None]
    vals = np.where(m, wins, np.nan)
    with np.errstate(all="ignore"):
        if stat == "sum":
            exp = np.nansum(vals, axis=(2, 3))
        elif stat == "count":
            exp = (~np.isnan(vals)).sum(axis=(2, 3)).astype(float)
        elif stat == "mean":
            exp = np.nansum(vals, axis=(2, 3)) / (~np.isnan(vals)).sum(axis=(2, 3))
        elif stat == "max":
            exp = np.nanmax(vals, axis=(2, 3))
        elif stat == "min":
            exp = np.nanmin(vals, axis=(2, 3))
        elif stat == "median":
            exp = np.nanmedian(vals, axis=(2, 3))
    exp = np.where(np.isnan(full), NODATA, exp)
    exp = np.where(np.isnan(exp), NODATA, exp)
    assert np.array_equal(got, exp)


def _flood_components(mask: np.ndarray) -> list[int]:
    """4-connectivity component sizes of a boolean mask (numpy/BFS)."""
    seen = np.zeros_like(mask, dtype=bool)
    sizes = []
    H, W = mask.shape
    for sy in range(H):
        for sx in range(W):
            if mask[sy, sx] and not seen[sy, sx]:
                stack = [(sy, sx)]
                seen[sy, sx] = True
                count = 0
                while stack:
                    y, x = stack.pop()
                    count += 1
                    for ny, nx in ((y-1, x), (y+1, x), (y, x-1), (y, x+1)):
                        if 0 <= ny < H and 0 <= nx < W and mask[ny, nx] and not seen[ny, nx]:
                            seen[ny, nx] = True
                            stack.append((ny, nx))
                sizes.append(count)
    return sizes


def test_connected_components_match_flood_fill(spark, b04):
    from remotior_sensus_spark.operators.components import component_size_histogram

    # binary raster: value > 2500 (nodata -> 0/background)
    from remotior_sensus_spark.operators.band_calc import band_calc

    tiles = spark.read.parquet(
        "data/geo/sf0.001/tiles.parquet"
    )
    binary = band_calc(tiles, 'where("B04" > 2500, 1, 0)', nodata_mask=None)
    binary = binary.withColumn(
        "pixels", F.transform("pixels", lambda x: F.when(F.isnan(x), 0.0).otherwise(x))
    )
    hist = component_size_histogram(binary).toPandas()

    full = full_raster()
    mask = np.nan_to_num(full, nan=0.0) > 2500
    sizes = _flood_components(mask)
    import collections

    exp = collections.Counter(sizes)
    got = dict(zip(hist.component_size, hist.n_components))
    assert got == dict(exp)


def test_resolve_paths_agree(spark, b04):
    """Driver union-find fast path == distributed hash-to-min iterative
    path on the same boundary graph (the fixtures are below the
    driver_threshold, so force the iterative path explicitly)."""
    from remotior_sensus_spark.operators.components import (
        boundary_edges, label_tiles, resolve_components,
    )

    labeled = label_tiles(b04, same_value=True).cache()
    edges = boundary_edges(labeled, same_value=True).cache()
    fast = resolve_components(edges).toPandas()
    slow = resolve_components(edges, driver_threshold=0).toPandas()
    a = fast.sort_values("gid").reset_index(drop=True)
    b = slow.sort_values("gid").reset_index(drop=True)
    assert a["gid"].tolist() == b["gid"].tolist()
    assert a["root"].tolist() == b["root"].tolist()


def test_resample_mode(spark, b04, geo001_dir):
    from remotior_sensus_spark.operators.aggregates import explode_pixels, quantize
    from remotior_sensus_spark.operators.focal import resample_mode

    px = explode_pixels(b04).withColumn("value", quantize(F.col("value")))
    px = px.filter(F.col("value") >= 0)
    got = resample_mode(px, factor=2).toPandas()

    full = full_raster()
    q = np.floor(full / 1000)
    n = q.shape[0] // 2
    import collections

    exp = {}
    for cy in range(n):
        for cx in range(n):
            block = q[cy*2:cy*2+2, cx*2:cx*2+2].ravel()
            vals = [v for v in block if not np.isnan(v)]
            if not vals:
                continue
            c = collections.Counter(vals)
            best = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            exp[(cx, cy)] = (best[0], best[1])
    gm = {(r.cgx, r.cgy): (r.mode_value, r.mode_count) for r in got.itertuples()}
    assert gm == exp


def _morph_oracle(full: np.ndarray, values: list[float], op: str,
                  size: int = 1, circular: bool = True) -> np.ndarray:
    """Whole-raster numpy oracle for dilation/erosion with the
    reference's boundary semantics: the structure count shrinks at the
    raster edge (convolved sum_structure), so edge pixels are not eroded
    for lacking out-of-raster neighbors."""
    from remotior_sensus_spark.operators.focal import structure_mask

    struct = structure_mask(size, circular)
    m = struct[None, None]
    arr = np.where(np.isnan(full), NODATA, np.where(full > 3500, 7.0, 1.0))
    arr = np.where(np.isnan(full), NODATA, arr)
    pad = np.pad(arr, size, constant_values=np.nan)
    exists = np.pad(np.ones(arr.shape, bool), size, constant_values=False)
    a = np.where(np.isnan(pad), NODATA, pad)
    wins = np.lib.stride_tricks.sliding_window_view(a, struct.shape)
    wins_ex = np.lib.stride_tricks.sliding_window_view(
        exists.astype(float), struct.shape)
    center = arr
    out = center.copy()
    if op == "dilate":
        a0 = np.where(a == NODATA, 0.0, a)
        wins0 = np.lib.stride_tricks.sliding_window_view(a0, struct.shape)
        core = ~np.isin(center, np.array(values))
        for v in values:
            near = ((wins0 == v) & m).any(axis=(2, 3))
            out[core & near] = v
    else:
        n_struct = ((wins_ex > 0.5) & m).sum(axis=(2, 3)).astype(float)
        uniq = [u for u in np.unique(a) if u != NODATA]
        fill = np.full(center.shape, float(NODATA))
        max_cnt = np.zeros(center.shape)
        erode = np.zeros(center.shape, dtype=bool)
        for v in uniq:
            cnt = ((wins == v) & m).sum(axis=(2, 3)).astype(float)
            if v not in values:
                sel = cnt > max_cnt
                fill[sel] = v
                max_cnt[sel] = cnt[sel]
            else:
                erode |= ((n_struct - cnt) > 0.01) & (center == v)
        out[erode] = fill[erode]
    out[np.isnan(full)] = NODATA
    return out


@pytest.mark.parametrize("op", ["dilate", "erode"])
def test_morphology_matches_numpy(spark, b04, op):
    from remotior_sensus_spark.operators.band_calc import band_calc
    from remotior_sensus_spark.operators.focal import dilation, erosion

    n = grid_n(0.001)
    tiles = spark.read.parquet("data/geo/sf0.001/tiles.parquet")
    q4 = band_calc(tiles, 'where("B04" > 3500, 7, 1)', nodata_mask="any")
    fn = dilation if op == "dilate" else erosion
    got = _collect_raster(fn(q4, values=[7.0], size=1, circular=True), n)
    exp = _morph_oracle(full_raster(), [7.0], op)
    got = np.where(np.isnan(got), NODATA, got)
    assert np.array_equal(got, exp)


def test_tile_size_invariance(spark, b04):
    """SURVEY §7.3 risk 4: identical results at 16^2 and 64^2 tiles for
    focal stats, morphology and connected components."""
    from remotior_sensus_spark.operators.band_calc import band_calc
    from remotior_sensus_spark.operators.components import component_size_histogram
    from remotior_sensus_spark.operators.focal import erosion, neighbor_stats
    from remotior_sensus_spark.operators.retile import retile

    n = grid_n(0.001)
    big = retile(b04, 4).cache()

    for kw in ({"stat": "mean", "size": 1}, {"stat": "median", "size": 2}):
        small_r = _collect_raster(neighbor_stats(b04, **kw), n)
        big_r = _collect_raster(neighbor_stats(big, tile_px=64, **kw), n, 64)
        assert np.array_equal(small_r, big_r), kw

    tiles = spark.read.parquet("data/geo/sf0.001/tiles.parquet")
    q4 = band_calc(tiles, 'where("B04" > 3500, 7, 1)', nodata_mask="any")
    q4_big = retile(q4, 4)
    small_r = _collect_raster(erosion(q4, values=[7.0], size=1), n)
    big_r = _collect_raster(erosion(q4_big, values=[7.0], size=1, tile_px=64), n, 64)
    assert np.array_equal(np.nan_to_num(small_r, nan=NODATA),
                          np.nan_to_num(big_r, nan=NODATA))

    binary = band_calc(tiles, 'where("B04" > 2500, 1, 0)', nodata_mask=None)
    binary = binary.withColumn(
        "pixels", F.transform("pixels", lambda x: F.when(F.isnan(x), 0.0).otherwise(x))
    )
    h16 = component_size_histogram(binary).toPandas()
    h64 = component_size_histogram(retile(binary, 4), tile_px=64).toPandas()
    d16 = dict(zip(h16.component_size, h16.n_components))
    d64 = dict(zip(h64.component_size, h64.n_components))
    assert d16 == d64


def _label_map(mask):
    """Whole-raster 4-connectivity label map (numpy/BFS oracle)."""
    lab = np.full(mask.shape, -1, dtype=int)
    nxt = 0
    H, W = mask.shape
    for sy in range(H):
        for sx in range(W):
            if mask[sy, sx] and lab[sy, sx] < 0:
                stack = [(sy, sx)]
                lab[sy, sx] = nxt
                while stack:
                    y, x = stack.pop()
                    for ny, nx in ((y-1, x), (y+1, x), (y, x-1), (y, x+1)):
                        if (0 <= ny < H and 0 <= nx < W and mask[ny, nx]
                                and lab[ny, nx] < 0):
                            lab[ny, nx] = nxt
                            stack.append((ny, nx))
                nxt += 1
    return lab, nxt


def test_polygonize_geometry_invariants(spark, b04):
    """WKT outlines: area == count*px_area, perimeter matches an
    independent numpy neighbor count, and even-odd PIP of the rings
    contains exactly the patch's own pixel centers."""
    import re

    from remotior_sensus_spark.grid import ORIGIN_X, ORIGIN_Y, PIXEL_SIZE
    from remotior_sensus_spark.operators.band_calc import band_calc
    from remotior_sensus_spark.operators.components import polygonize_geometry
    from remotior_sensus_spark.operators.spatial_join import _pip_ring

    tiles = spark.read.parquet("data/geo/sf0.001/tiles.parquet")
    q4 = band_calc(tiles, 'where("B04" > 2500, 2, 1)',
                   nodata_mask="any", out_nodata=0)
    got = polygonize_geometry(q4).toPandas()

    full = full_raster()
    arr = np.where(np.isnan(full), 0.0, np.where(full > 2500, 2.0, 1.0))

    # global invariants
    for v in (1.0, 2.0):
        assert got[got.value == v].pixel_count.sum() == (arr == v).sum()
    assert (got.area_m2 == got.pixel_count * 100.0).all()

    # independent per-component perimeter oracle
    for v in (1.0, 2.0):
        mask = arr == v
        lab, n = _label_map(mask)
        pad = np.pad(mask, 1)
        nbrs = (pad[:-2, 1:-1].astype(int) + pad[2:, 1:-1] +
                pad[1:-1, :-2] + pad[1:-1, 2:])
        per_px = (4 - nbrs) * PIXEL_SIZE
        exp_perims = sorted(
            float(per_px[lab == i].sum()) for i in range(n)
        )
        got_perims = sorted(got[got.value == v].perimeter_m)
        assert got_perims == exp_perims, v

    # PIP containment for a sample of patches (even-odd over rings)
    ring_re = re.compile(r"\(([^()]+)\)")
    sample = got.sort_values("pixel_count", ascending=False).head(8)
    mask2 = arr == 2.0
    lab2, _ = _label_map(mask2)
    for _, row in sample.iterrows():
        if row.value != 2.0:
            continue
        rings = []
        for body in ring_re.findall(row.wkt):
            pts = [tuple(map(float, p.split())) for p in body.split(",")]
            rings.append(np.array(pts))
        # the patch's own pixel centers must be inside (even-odd)
        ys, xs = np.where(mask2)
        cx = ORIGIN_X + xs * PIXEL_SIZE + PIXEL_SIZE / 2
        cy = ORIGIN_Y - ys * PIXEL_SIZE - PIXEL_SIZE / 2
        ins = np.zeros(len(xs), dtype=bool)
        for r in rings:
            ins ^= _pip_ring(r, cx, cy)
        # pixels inside the WKT == exactly one numpy component of value 2
        labs_inside = set(lab2[ys[ins], xs[ins]])
        assert len(labs_inside) == 1
        assert ins.sum() == row.pixel_count


def test_erosion_iterative_matches_numpy_twice(spark, b04):
    """erosion_iterative(n=2) == two successive single-step erosions of
    the whole-raster numpy oracle (ref loops `size` times,
    processor_functions.py:1262)."""
    from remotior_sensus_spark.operators.band_calc import band_calc
    from remotior_sensus_spark.operators.focal import erosion_iterative, structure_mask

    n = grid_n(0.001)
    tiles = spark.read.parquet("data/geo/sf0.001/tiles.parquet")
    q4 = band_calc(tiles, 'where("B04" > 3500, 7, 1)', nodata_mask="any")
    got = _collect_raster(erosion_iterative(q4, values=[7.0], iterations=2), n)
    got = np.where(np.isnan(got), NODATA, got)

    struct = structure_mask(1, True)
    m = struct[None, None]
    full = full_raster()
    arr = np.where(np.isnan(full), NODATA, np.where(full > 3500, 7.0, 1.0))

    def erode_once(a0):
        pad = np.pad(a0, 1, constant_values=np.nan)
        # nodata stays nodata through iterations; exists = raster extent
        exists = np.pad(np.ones(a0.shape, bool), 1, constant_values=False)
        a = np.where(np.isnan(pad), NODATA, pad)
        wins = np.lib.stride_tricks.sliding_window_view(a, struct.shape)
        wins_ex = np.lib.stride_tricks.sliding_window_view(
            exists.astype(float), struct.shape)
        n_struct = ((wins_ex > 0.5) & m).sum(axis=(2, 3)).astype(float)
        uniq = [u for u in np.unique(a) if u != NODATA]
        fill = np.full(a0.shape, float(NODATA))
        max_cnt = np.zeros(a0.shape)
        erode = np.zeros(a0.shape, dtype=bool)
        for v in uniq:
            cnt = ((wins == v) & m).sum(axis=(2, 3)).astype(float)
            if v != 7.0:
                sel = cnt > max_cnt
                fill[sel] = v
                max_cnt[sel] = cnt[sel]
            else:
                erode |= ((n_struct - cnt) > 0.01) & (a0 == v)
        out = a0.copy()
        out[erode] = fill[erode]
        out[np.isnan(full)] = NODATA
        return out

    exp = erode_once(erode_once(arr))
    assert np.array_equal(got, exp)


def test_trace_rings_simple_at_pinch_points():
    """An edge cycle through a diagonal pinch must split into SIMPLE
    rings (hole touching the shell at a corner), never a
    self-intersecting outer — round-3 review counterexample."""
    from remotior_sensus_spark.operators.components import _trace_patch_rings

    cells = [(0, 2), (0, 3), (0, 4), (1, 0), (1, 1), (1, 2), (1, 3),
             (2, 1), (2, 2), (2, 4), (3, 0), (3, 1), (3, 3), (3, 4),
             (4, 0), (4, 1), (4, 2), (4, 3)]
    xs = np.array([c[0] for c in cells])
    ys = np.array([c[1] for c in cells])
    rings = _trace_patch_rings(xs, ys)

    def area(r):
        return sum(r[i][0] * r[i + 1][1] - r[i + 1][0] * r[i][1]
                   for i in range(len(r) - 1)) / 2.0

    for r in rings:
        body = r[:-1]
        assert len(set(body)) == len(body), f"self-intersecting ring {r}"
    assert abs(sum(area(r) for r in rings)) == len(cells)
    assert len(rings) == 3  # outer + two 1-px holes (OGC union semantics)


def test_resolve_iterative_above_driver_threshold(spark):
    """VERDICT r03 #5: exercise the ITERATIVE hash-to-min branch on a
    boundary graph that exceeds the 2M-edge driver threshold NATURALLY
    (no driver_threshold=0 forcing), and assert its roots equal the
    driver union-find's on the same edges.

    The raster is a 64 x 4232 grid of 16x16 tiles whose foreground is
    1-px horizontal stripes on even rows: every tile holds 8 disjoint
    stripe segments, every vertical tile adjacency contributes 8
    distinct label-pair edges, and horizontal adjacencies contribute
    none (tile row 15 is background) — 8 * 63 * 4232 = 2,132,928
    distinct edges, each component a 64-tile-long chain (so pointer
    jumping needs ~log2(64) rounds, keeping the test minutes-bounded).
    """
    from remotior_sensus_spark import NODATA
    from remotior_sensus_spark.grid import TILE_PX
    from remotior_sensus_spark.operators.components import (
        _resolve_driver, boundary_edges, label_tiles, resolve_components,
    )

    t = TILE_PX
    n_cols, n_rows = 64, 4232
    arr = F.array(*[F.lit(3000.0 if (i // t) % 2 == 0 else float(NODATA))
                    for i in range(t * t)])
    tiles = spark.range(n_cols * n_rows).select(
        (F.col("id") % n_cols).cast("int").alias("tile_x"),
        (F.col("id") / n_cols).cast("int").alias("tile_y"),
        arr.alias("pixels"),
    ).repartition(64)
    labeled = label_tiles(tiles).localCheckpoint()
    edges = boundary_edges(labeled).localCheckpoint()
    n_edges = edges.count()
    assert n_edges == 8 * (n_cols - 1) * n_rows > 2_000_000, n_edges

    got = resolve_components(edges)  # natural path: iterative
    exp = _resolve_driver(edges)
    # roots must agree gid-for-gid; compare via an anti-join style
    # aggregate rather than two driver collects of 2.1M rows
    n_diff = (got.alias("a").join(exp.alias("b"), "gid", "full")
              .filter((F.col("a.root") != F.col("b.root"))
                      | F.col("a.root").isNull()
                      | F.col("b.root").isNull())
              .count())
    assert n_diff == 0
    # every gid that appears in an edge: 8 stripes x 64 cols x 4232 rows
    assert got.count() == exp.count() == 8 * n_cols * n_rows


# ---------------------------------------------------------------------------
# Per-component shape census
# ---------------------------------------------------------------------------

def _brute_shape_census(mask):
    """Pure-Python BFS + per-cell rook exposure count (third structure
    next to the engine's CC machinery and the scanline builder)."""
    H, W = mask.shape
    seen = set()
    census = {}
    for sy in range(H):
        for sx in range(W):
            if not mask[sy, sx] or (sy, sx) in seen:
                continue
            stack, cells = [(sy, sx)], []
            seen.add((sy, sx))
            while stack:
                y, x = stack.pop()
                cells.append((y, x))
                for ny, nx in ((y-1, x), (y+1, x), (y, x-1), (y, x+1)):
                    if (0 <= ny < H and 0 <= nx < W and mask[ny, nx]
                            and (ny, nx) not in seen):
                        seen.add((ny, nx))
                        stack.append((ny, nx))
            area = len(cells)
            perim = 0
            for y, x in cells:
                for ny, nx in ((y-1, x), (y+1, x), (y, x-1), (y, x+1)):
                    if not (0 <= ny < H and 0 <= nx < W and mask[ny, nx]):
                        perim += 1
            band = ((perim * perim) // area).bit_length()
            n, sa, sp, mx = census.get(band, (0, 0, 0, 0))
            census[band] = (n + 1, sa + area, sp + perim, max(mx, area))
    return census


def _shape_census_rows(df):
    return {r["compact_band"]: (r["n_components"], r["sum_area"],
                                r["sum_perimeter"], r["max_area"])
            for r in df.collect()}


def test_component_shapes_engineered_blobs(spark):
    """Donut (hole's inner ring counts), 1-px line, square, and a blob
    spanning four tiles — engine vs the pure-Python BFS census."""
    import sys
    sys.path.insert(0, "tests")
    from test_hydrology import _tiles_df
    from remotior_sensus_spark.operators.components import (
        component_shape_census)

    m = np.zeros((64, 64), dtype=bool)
    m[4:12, 4:12] = True          # square 8x8
    m[5:11, 5:11] = True
    m[20:30, 20:30] = True        # donut
    m[23:27, 23:27] = False
    m[40, 2:60] = True            # 1-px line crossing tiles
    m[28:36, 28:36] = True        # blob straddling the 32-px tile cross
    got = _shape_census_rows(component_shape_census(
        _tiles_df(spark, m.astype(float), 16), tile_px=16))
    want = _brute_shape_census(m)
    assert got == want
    # donut + line push bands above the square's 5
    assert max(got) > 5


def test_component_shapes_tile_size_invariance(spark):
    import sys
    sys.path.insert(0, "tests")
    from test_hydrology import _tiles_df
    from remotior_sensus_spark.operators.components import (
        component_shape_census)

    rng = np.random.RandomState(41)
    m = (rng.rand(128, 128) < 0.42)   # near-percolation: messy patches
    c16 = _shape_census_rows(component_shape_census(
        _tiles_df(spark, m.astype(float), 16), tile_px=16))
    c64 = _shape_census_rows(component_shape_census(
        _tiles_df(spark, m.astype(float), 64), tile_px=64))
    assert c16 == c64
    assert c16 == _brute_shape_census(m)


def test_fine_halo_parity(spark, b04):
    """The fused fine-tile halo fan (_with_fine_halo_groups) is
    bit-identical to retile(4) + _with_halo_groups for kernels whose
    window radius fits the shipped ring: pinned on the d8 census
    (radius 1, halo_tiles=1) and the flow-accumulation three-phase
    operator (phases read 1 px beyond the centre)."""
    from remotior_sensus_spark.operators import geostats, hydrology
    from remotior_sensus_spark.operators.focal import (
        _with_fine_halo_groups, _with_halo_groups)
    from remotior_sensus_spark.operators.retile import retile

    t64 = retile(b04, 4)
    fan = _with_fine_halo_groups(b04, 4, halo_tiles=1)

    ref = {tuple(r) for r in geostats.d8_flow_tiles(t64, tile_px=64).collect()}
    got = {tuple(r) for r in
           geostats.d8_flow_tiles(None, tile_px=64, fan=fan).collect()}
    assert got == ref

    ref2 = {tuple(r) for r in
            hydrology.flow_accumulation_tiles(t64, tile_px=64).collect()}
    got2 = {tuple(r) for r in
            hydrology.flow_accumulation_tiles(None, tile_px=64,
                                              fan=fan).collect()}
    assert got2 == ref2


def test_fine_halo_parity_halo2(spark, b04):
    """halo_tiles=2 ships a 32-px ring: the radius-24 viewshed census
    must match the retile + full-tile-fan path bit for bit."""
    from remotior_sensus_spark.operators import geostats
    from remotior_sensus_spark.operators.focal import _with_fine_halo_groups
    from remotior_sensus_spark.operators.retile import retile

    t64 = retile(b04, 4)
    fan = _with_fine_halo_groups(b04, 4, halo_tiles=2)
    ref = {tuple(r) for r in
           geostats.viewshed_tiles(t64, tile_px=64).collect()}
    got = {tuple(r) for r in
           geostats.viewshed_tiles(None, tile_px=64, fan=fan).collect()}
    assert got == ref


def test_fine_halo_parity_focal_terrain(spark, b04):
    """r06 continuation: the fused fine fan is bit-identical to
    retile(4) + _with_halo_groups for the classic focal family too —
    neighbor_stats (median exercises the full window), dilation,
    erosion (the exists-mask path), and Horn terrain."""
    from remotior_sensus_spark.operators.focal import (
        _with_fine_halo_groups, dilation, erosion, neighbor_stats)
    from remotior_sensus_spark.operators.retile import retile
    from remotior_sensus_spark.operators.terrain import horn_terrain

    t64 = retile(b04, 4)
    # two independent fans: each applyInPandas consumes its own
    fan = lambda: _with_fine_halo_groups(b04, 4, halo_tiles=1)  # noqa: E731

    for kw in ({"stat": "median", "size": 2},
               {"stat": "std", "size": 1}):
        ref = {(r["tile_x"], r["tile_y"], tuple(r["pixels"])) for r in
               neighbor_stats(t64, tile_px=64, **kw).collect()}
        got = {(r["tile_x"], r["tile_y"], tuple(r["pixels"])) for r in
               neighbor_stats(None, tile_px=64, fan=fan(), **kw).collect()}
        assert got == ref, kw

    binary = t64.selectExpr(
        "tile_x", "tile_y",
        "transform(pixels, x -> case when x = -32768.0 then -32768.0 "
        "when x > 3500.0 then 7.0 else 1.0 end) as pixels")
    bin16 = b04.selectExpr(
        "tile_x", "tile_y",
        "transform(pixels, x -> case when x = -32768.0 then -32768.0 "
        "when x > 3500.0 then 7.0 else 1.0 end) as pixels")
    bfan = lambda: _with_fine_halo_groups(bin16, 4, halo_tiles=1)  # noqa: E731
    for op in (dilation, erosion):
        ref = {(r["tile_x"], r["tile_y"], tuple(r["pixels"])) for r in
               op(binary, values=[7.0], size=1, tile_px=64).collect()}
        got = {(r["tile_x"], r["tile_y"], tuple(r["pixels"])) for r in
               op(None, values=[7.0], size=1, tile_px=64,
                  fan=bfan()).collect()}
        assert got == ref, op.__name__

    ref = {(r["tile_x"], r["tile_y"], tuple(r["slope"]),
            tuple(r["aspect"]), tuple(r["hillshade"])) for r in
           horn_terrain(t64, cellsize=10.0, tile_px=64).collect()}
    got = {(r["tile_x"], r["tile_y"], tuple(r["slope"]),
            tuple(r["aspect"]), tuple(r["hillshade"])) for r in
           horn_terrain(None, cellsize=10.0, tile_px=64,
                        fan=fan()).collect()}
    assert got == ref


def test_resample_mode_tiles_parity(spark, b04):
    """The r06 in-tile coarse-cell mode is row-identical to the
    relational groupBy+window mode over quantized classes."""
    from pyspark.sql import functions as F

    from remotior_sensus_spark.operators import aggregates as agg
    from remotior_sensus_spark.operators.focal import (
        resample_mode, resample_mode_tiles)
    from remotior_sensus_spark import NODATA

    px = agg.explode_pixels(b04).filter(
        F.col("value") != NODATA).withColumn(
        "value", agg.quantize(F.col("value")))
    rel = {(r["cgx"], r["cgy"]): (r["mode_value"], r["mode_count"])
           for r in resample_mode(px, factor=2).collect()}
    got = {(r["cgx"], r["cgy"]): (r["mode_value"], r["mode_count"])
           for r in resample_mode_tiles(b04, factor=2).collect()}
    assert got == rel


def test_histogram_2d_tiles_parity(spark, b04, geo001_dir):
    from pyspark.sql import functions as F

    from remotior_sensus_spark.operators import aggregates as agg

    b08 = spark.read.parquet(f"{geo001_dir}/tiles.parquet").filter(
        (F.col("bandset") == "S2_2020-01-01") & (F.col("band") == "B08"))
    rel = {(r["bin_x"], r["bin_y"]): r["cnt"] for r in
           agg.histogram_2d(agg.explode_pixels(b04),
                            agg.explode_pixels(b08)).collect()}
    got = {(r["bin_x"], r["bin_y"]): r["cnt"] for r in
           agg.histogram_2d_tiles(b04, b08).collect()}
    assert got == rel
