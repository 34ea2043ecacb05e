"""Distributed D8 hydrology vs two independent references.

Layered per the round-4 verification pattern:
  1. a per-pixel pure-Python PATH-WALK reference (its own neighbour
     scan, its own tie-break loop — shares no code with _d8_best or the
     peels) pins the dense builder in synth/expected.py;
  2. the dense builder (whole-raster, no tiles) is the driver oracle
     for the registered queries;
  3. the Spark pipeline is checked against BOTH on rasters engineered
     to force multi-round cross-tile resolution (long diagonal ramps),
     plus tile-size invariance (16 vs 64 px) and a physical plan pin.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from remotior_sensus_spark import NODATA
from remotior_sensus_spark.synth.expected import (
    _dense_flow_array,
    build_flow_accumulation,
    build_twi_census,
    build_watershed_basins,
)

SF_DIR = "/root/testdata/sf0.001"

# (dx, dy, code, diag) in D8 code order — the documented tie-break order
_OFFS = [(1, 0, 1, 0), (1, 1, 2, 1), (0, 1, 4, 0), (-1, 1, 8, 1),
         (-1, 0, 16, 0), (-1, -1, 32, 1), (0, -1, 64, 0), (1, -1, 128, 1)]


def _brute_next(r):
    """Per-pixel D8 pick, re-derived cell by cell: a valid cell with all
    8 neighbours valid flows to its strictly-lower steepest neighbour
    (cardinal 2*dv^2 vs diagonal dv^2, first-in-code-order wins ties);
    everything else is a sink."""
    H, W = r.shape
    nxt = {}
    for y in range(H):
        for x in range(W):
            if np.isnan(r[y, x]):
                continue
            target, best = None, -1.0
            all_valid = True
            for dx, dy, _code, diag in _OFFS:
                yy, xx = y + dy, x + dx
                if not (0 <= yy < H and 0 <= xx < W) or np.isnan(r[yy, xx]):
                    all_valid = False
                    break
                if r[y, x] > r[yy, xx]:
                    m = (r[y, x] - r[yy, xx]) ** 2 * (2 - diag)
                    if m > best:
                        best, target = m, (yy, xx)
            nxt[(y, x)] = target if all_valid else None
    return nxt


def _brute_walk(r):
    """acc[v] = number of valid cells whose path passes through v
    (inclusive); basin sizes keyed by terminal sink — each start cell
    literally walks its path."""
    nxt = _brute_next(r)
    H, W = r.shape
    acc = np.zeros((H, W), dtype=np.int64)
    basin = {}
    for start in nxt:
        cy, cx = start
        while True:
            acc[cy, cx] += 1
            t = nxt[(cy, cx)]
            if t is None:
                break
            cy, cx = t
        basin[(cy, cx)] = basin.get((cy, cx), 0) + 1
    return acc, basin


def _acc_census(acc, valid):
    vals = acc[valid]
    _, expo = np.frexp(vals.astype(np.float64))
    band = expo - 1
    return {int(b): (int((band == b).sum()), int(vals[band == b].sum()),
                     int(vals[band == b].max()))
            for b in np.unique(band)}


def _basin_census(sizes):
    sizes = np.asarray(sizes, dtype=np.int64)
    _, expo = np.frexp(sizes.astype(np.float64))
    band = expo - 1
    return {int(b): (int((band == b).sum()), int(sizes[band == b].sum()))
            for b in np.unique(band)}


def _ramp_raster(h, w, seed=7, nan_frac=0.06):
    """Long-flow test DEM: a diagonal ramp plus coarse deterministic
    noise and duplicated values (ties), with NaN holes — paths run many
    tiles before terminating, so the cross-tile phase needs several
    rounds."""
    rng = np.random.RandomState(seed)
    ys, xs = np.mgrid[0:h, 0:w]
    r = (2000.0 - 3.0 * (xs + ys) + rng.randint(0, 4, (h, w))).astype(float)
    r[rng.rand(h, w) < nan_frac] = np.nan
    return r


def test_dense_flow_matches_brute_walk():
    r = _ramp_raster(48, 40)
    valid, acc, sink = _dense_flow_array(r)
    bacc, bbasin = _brute_walk(r)
    assert np.array_equal(acc[valid], bacc[valid])
    assert not acc[~valid].any()
    w = r.shape[1]
    got_sizes = {}
    for s in sink[valid]:
        got_sizes[s] = got_sizes.get(s, 0) + 1
    assert got_sizes == {sy * w + sx: c for (sy, sx), c in bbasin.items()}


def test_dense_flow_pure_noise_and_all_nan():
    rng = np.random.RandomState(3)
    r = rng.randint(100, 5000, (33, 29)).astype(float)
    r[rng.rand(33, 29) < 0.15] = np.nan
    valid, acc, sink = _dense_flow_array(r)
    bacc, _ = _brute_walk(r)
    assert np.array_equal(acc[valid], bacc[valid])
    empty = np.full((16, 16), np.nan)
    v2, a2, _ = _dense_flow_array(empty)
    assert not v2.any() and not a2.any()


def _tiles_df(spark, arr, T=16):
    H, W = arr.shape
    assert H % T == 0 and W % T == 0
    rows = []
    for ty in range(H // T):
        for tx in range(W // T):
            px = arr[ty * T:(ty + 1) * T, tx * T:(tx + 1) * T]
            px = np.where(np.isnan(px), NODATA, px).astype(float)
            rows.append((tx, ty, [float(v) for v in px.ravel()]))
    return spark.createDataFrame(
        rows, "tile_x int, tile_y int, pixels array<double>")


def _spark_acc_census(df):
    return {r["acc_band"]: (r["n_pixels"], r["sum_acc"], r["max_acc"])
            for r in df.collect()}


def _spark_basin_census(df):
    return {r["size_band"]: (r["n_basins"], r["n_pixels"])
            for r in df.collect()}


def test_spark_flow_accumulation_matches_brute_on_long_ramp(spark):
    """64x64 raster as 4x4 tiles of 16 px: the diagonal ramp forces
    flows across many tile boundaries (several phase-2 rounds), checked
    against the per-pixel path walk."""
    from remotior_sensus_spark.operators.hydrology import (
        flow_accumulation_tiles, watershed_basins_tiles)

    r = _ramp_raster(64, 64, seed=11)
    tiles = _tiles_df(spark, r)
    bacc, bbasin = _brute_walk(r)
    valid = ~np.isnan(r)
    assert _spark_acc_census(flow_accumulation_tiles(tiles)) == \
        _acc_census(bacc, valid)
    assert _spark_basin_census(watershed_basins_tiles(tiles)) == \
        _basin_census(list(bbasin.values()))


def test_spark_hydrology_matches_dense_oracle_sf0001(spark, geo001_dir):
    """The registered queries vs the builder that writes the driver
    oracle parquet, at the synthetic sf0.001 geometry."""
    from remotior_sensus_spark import queries as Q

    got = _spark_acc_census(
        Q.REGISTRY["flow_accumulation"][0](spark, SF_DIR))
    exp = build_flow_accumulation(0.001).to_pydict()
    assert got == {b: (n, s, m) for b, n, s, m in zip(
        exp["acc_band"], exp["n_pixels"], exp["sum_acc"], exp["max_acc"])}

    gotw = _spark_basin_census(
        Q.REGISTRY["watershed_basins"][0](spark, SF_DIR))
    expw = build_watershed_basins(0.001).to_pydict()
    assert gotw == {b: (n, s) for b, n, s in zip(
        expw["size_band"], expw["n_basins"], expw["n_pixels"])}


def test_phase2_branches_agree(spark):
    """Driver and iterative phase-2 branches are exact twins (the
    resolve_components cross-test pattern): driver_threshold=0 forces
    the distributed loop; the default resolves on the driver."""
    from remotior_sensus_spark.operators.hydrology import (
        flow_accumulation_tiles, watershed_basins_tiles)

    r = _ramp_raster(64, 64, seed=31)
    tiles = _tiles_df(spark, r)
    bacc, bbasin = _brute_walk(r)
    valid = ~np.isnan(r)
    want_acc = _acc_census(bacc, valid)
    want_bas = _basin_census(list(bbasin.values()))
    for thr in (0, 2_000_000):
        got = _spark_acc_census(
            flow_accumulation_tiles(tiles, driver_threshold=thr))
        assert got == want_acc, thr
        gotw = _spark_basin_census(
            watershed_basins_tiles(tiles, driver_threshold=thr))
        assert gotw == want_bas, thr


def test_hydrology_tile_size_invariance(spark):
    """Identical censuses at 16 px and 64 px tiles — the tile cut is an
    implementation detail of the decomposition, not of the answer."""
    from remotior_sensus_spark.operators.hydrology import (
        flow_accumulation_tiles, watershed_basins_tiles)

    r = _ramp_raster(128, 128, seed=23)
    t16 = _tiles_df(spark, r, 16)
    t64 = _tiles_df(spark, r, 64)
    assert _spark_acc_census(flow_accumulation_tiles(t16, tile_px=16)) == \
        _spark_acc_census(flow_accumulation_tiles(t64, tile_px=64))
    assert _spark_basin_census(watershed_basins_tiles(t16, tile_px=16)) == \
        _spark_basin_census(watershed_basins_tiles(t64, tile_px=64))


def _brute_twi_census(r, cellsize=10.0):
    """Per-pixel TWI census: brute path-walk accumulation + a cell-by-
    cell Horn gradient loop (no array shifts, no shared code)."""
    import math
    bacc, _ = _brute_walk(r)
    H, W = r.shape
    census = {}
    for y in range(H):
        for x in range(W):
            if np.isnan(r[y, x]) or not (0 < y < H - 1 and 0 < x < W - 1):
                continue
            win = r[y - 1:y + 2, x - 1:x + 2]
            if np.isnan(win).any():
                continue
            a, b, c = win[0, 0], win[0, 1], win[0, 2]
            d, f_ = win[1, 0], win[1, 2]
            g, h, i = win[2, 0], win[2, 1], win[2, 2]
            dzdx = ((c + 2.0 * f_ + i) - (a + 2.0 * d + g)) / (8.0 * cellsize)
            dzdy = ((g + 2.0 * h + i) - (a + 2.0 * b + c)) / (8.0 * cellsize)
            tanb = max(math.sqrt(dzdx * dzdx + dzdy * dzdy), 1e-3)
            twi = math.log(bacc[y, x] * cellsize / tanb)
            band = math.floor(twi)
            n, s = census.get(band, (0, 0))
            census[band] = (n + 1, s + math.floor(twi * 1e6 + 0.5))
    return census


def test_spark_twi_matches_brute_on_long_ramp(spark):
    from remotior_sensus_spark.operators.hydrology import twi_census_tiles

    r = _ramp_raster(64, 64, seed=11)
    tiles = _tiles_df(spark, r)
    got = {row["twi_band"]: (row["n_pixels"], row["checksum"])
           for row in twi_census_tiles(tiles).collect()}
    assert got == _brute_twi_census(r)


def test_spark_twi_matches_dense_oracle_sf0001(spark, geo001_dir):
    from remotior_sensus_spark import queries as Q

    got = {row["twi_band"]: (row["n_pixels"], row["checksum"])
           for row in Q.REGISTRY["twi_census"][0](spark, SF_DIR).collect()}
    exp = build_twi_census(0.001).to_pydict()
    assert got == {b: (n, s) for b, n, s in zip(
        exp["twi_band"], exp["n_pixels"], exp["checksum"])}


def test_flow_accumulation_plan_shape(spark, geo001_dir):
    """Scale pin: the final job is ONE cogrouped halo exchange + the
    bounded census rollup — no join operator of any kind touches the
    corpus-scale tile stream (the phase-2 joins run on the checkpointed
    border condensate, upstream of this plan)."""
    from remotior_sensus_spark import queries as Q

    df = Q.REGISTRY["flow_accumulation"][0](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapCoGroupsInPandas" in plan, plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan, plan
    for join_op in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin"):
        assert join_op not in plan, (join_op, plan)


# ---------------------------------------------------------------------------
# Strahler stream order + downstream flow length (round-5 additions)
# ---------------------------------------------------------------------------

def _brute_strahler(r, threshold=2):
    """Per-pixel Strahler reference: channel set from the brute
    path-walk accumulation, children lists from _brute_next, orders by
    a repeated 'resolve whoever's children are all resolved' sweep —
    no queue, no vectorization, no shared code with the engine."""
    nxt = _brute_next(r)
    bacc, _ = _brute_walk(r)
    chan = {v for v in nxt if bacc[v] >= threshold}
    children = {v: [] for v in chan}
    for v in chan:
        t = nxt[v]
        if t is not None:
            assert t in chan
            children[t].append(v)
    order = {}
    remaining = set(chan)
    while remaining:
        progressed = False
        for v in list(remaining):
            ch = children[v]
            if all(c in order for c in ch):
                if not ch:
                    order[v] = 1
                else:
                    mo = max(order[c] for c in ch)
                    order[v] = mo + (
                        1 if sum(order[c] == mo for c in ch) >= 2 else 0)
                remaining.remove(v)
                progressed = True
        assert progressed, "cycle in channel network?"
    census = {}
    for v, o in order.items():
        n, mx = census.get(o, (0, 0))
        census[o] = (n + 1, max(mx, int(bacc[v])))
    return census


def _brute_flow_length(r):
    """Per-pixel flow-length reference: every valid cell literally
    walks its path counting cardinal vs diagonal steps."""
    nxt = _brute_next(r)
    census = {}
    for start in nxt:
        a = b = 0
        cy, cx = start
        while True:
            t = nxt[(cy, cx)]
            if t is None:
                break
            if t[0] == cy or t[1] == cx:
                a += 1
            else:
                b += 1
            cy, cx = t
        steps = a + b
        band = -1 if steps == 0 else int(np.floor(np.log2(steps)))
        fp = a * 1_000_000 + b * 1_414_214
        n, s, mx = census.get(band, (0, 0, 0))
        census[band] = (n + 1, s + fp, max(mx, steps))
    return census


def _spark_order_census(df):
    return {r["strahler_order"]: (r["n_cells"], r["max_acc"])
            for r in df.collect()}


def _spark_len_census(df):
    return {r["len_band"]: (r["n_pixels"], r["sum_len_fp"], r["max_steps"])
            for r in df.collect()}


def test_spark_stream_order_matches_brute_on_long_ramp(spark):
    from remotior_sensus_spark.operators.hydrology import stream_order_tiles

    r = _ramp_raster(64, 64, seed=11)
    tiles = _tiles_df(spark, r)
    got = _spark_order_census(stream_order_tiles(tiles, threshold=2))
    assert got == _brute_strahler(r, threshold=2)


def test_spark_flow_length_matches_brute_on_long_ramp(spark):
    from remotior_sensus_spark.operators.hydrology import flow_length_tiles

    r = _ramp_raster(64, 64, seed=11)
    tiles = _tiles_df(spark, r)
    got = _spark_len_census(flow_length_tiles(tiles))
    assert got == _brute_flow_length(r)


def test_stream_order_flow_length_branches_agree(spark):
    """driver_threshold=0 forces BOTH distributed paths (the
    DataFrame chain-contraction + junction peel for stream order, the
    weighted DataFrame doubling for flow length) — exact twins of the
    driver branches, checked against the per-pixel references."""
    from remotior_sensus_spark.operators.hydrology import (
        flow_length_tiles, stream_order_tiles)

    r = _ramp_raster(64, 64, seed=31)
    tiles = _tiles_df(spark, r)
    want_so = _brute_strahler(r, threshold=2)
    want_fl = _brute_flow_length(r)
    for thr in (0, 2_000_000):
        assert _spark_order_census(stream_order_tiles(
            tiles, threshold=2, driver_threshold=thr)) == want_so, thr
        assert _spark_len_census(flow_length_tiles(
            tiles, driver_threshold=thr)) == want_fl, thr


def test_stream_order_flow_length_tile_size_invariance(spark):
    from remotior_sensus_spark.operators.hydrology import (
        flow_length_tiles, stream_order_tiles)

    r = _ramp_raster(128, 128, seed=23)
    t16 = _tiles_df(spark, r, 16)
    t64 = _tiles_df(spark, r, 64)
    assert _spark_order_census(stream_order_tiles(t16, tile_px=16)) == \
        _spark_order_census(stream_order_tiles(t64, tile_px=64))
    assert _spark_len_census(flow_length_tiles(t16, tile_px=16)) == \
        _spark_len_census(flow_length_tiles(t64, tile_px=64))


def test_spark_stream_order_flow_length_match_dense_oracle_sf0001(
        spark, geo001_dir):
    from remotior_sensus_spark import queries as Q
    from remotior_sensus_spark.synth.expected import (
        build_flow_length, build_stream_order)

    got = _spark_order_census(
        Q.REGISTRY["stream_order"][0](spark, SF_DIR))
    exp = build_stream_order(0.001).to_pydict()
    assert got == {o: (n, mx) for o, n, mx in zip(
        exp["strahler_order"], exp["n_cells"], exp["max_acc"])}

    gotl = _spark_len_census(Q.REGISTRY["flow_length"][0](spark, SF_DIR))
    expl = build_flow_length(0.001).to_pydict()
    assert gotl == {b: (n, s, mx) for b, n, s, mx in zip(
        expl["len_band"], expl["n_pixels"], expl["sum_len_fp"],
        expl["max_steps"])}


def test_flow_length_plan_shape(spark, geo001_dir):
    """Scale pin (the flow_accumulation pin's twin): the final job is
    the cogrouped halo exchange + bounded census rollup — no join
    operator of any kind touches the corpus-scale tile stream, and the
    x8 fan-out of the resolved entries is a Generate (explode) over
    the condensate, not a join."""
    from remotior_sensus_spark import queries as Q

    df = Q.REGISTRY["flow_length"][0](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapCoGroupsInPandas" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoop" not in plan, plan
    for join_op in ("SortMergeJoin", "BroadcastHashJoin",
                    "ShuffledHashJoin"):
        assert join_op not in plan, (join_op, plan)


# ---------------------------------------------------------------------------
# Depression filling (priority-flood semantics)
# ---------------------------------------------------------------------------

def _brute_fill(r):
    """Gauss-Seidel dict reference for the fill fixpoint: repeated
    full sweeps of filled(v) = max(z(v), min over valid 8-neighbours
    of filled(u)), drains pinned at z — a third implementation next to
    the engine's tiled Jacobi and the builder's heapq flood."""
    H, W = r.shape
    offs = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)
            if not (dy == 0 and dx == 0)]
    filled = {}
    drain = set()
    for y in range(H):
        for x in range(W):
            if np.isnan(r[y, x]):
                continue
            is_drain = any(
                not (0 <= y + dy < H and 0 <= x + dx < W)
                or np.isnan(r[y + dy, x + dx]) for dy, dx in offs)
            if is_drain:
                drain.add((y, x))
                filled[(y, x)] = r[y, x]
            else:
                filled[(y, x)] = np.inf
    changed = True
    while changed:
        changed = False
        for (y, x) in filled:
            if (y, x) in drain:
                continue
            m = min(filled[(y + dy, x + dx)] for dy, dx in offs)
            new = max(r[y, x], min(filled[(y, x)], m))
            if new != filled[(y, x)]:
                filled[(y, x)] = new
                changed = True
    return filled


def _fill_census_from_map(r, filled):
    census = {}
    for (y, x), f in filled.items():
        fp = int(np.floor((f - r[y, x]) * 1e6 + 0.5))
        band = -1 if fp == 0 else int(np.floor(np.log2(fp)))
        n, s, mx = census.get(band, (0, 0, 0))
        census[band] = (n + 1, s + fp, max(mx, fp))
    return census


def _spark_fill_census(df):
    return {r["fill_band"]: (r["n_pixels"], r["sum_fill_fp"],
                             r["max_fill_fp"]) for r in df.collect()}


def _basin_raster(h, w, seed=5):
    """Fill-stress DEM: a gentle ramp with several carved bowls of
    different depths (some spanning multiple tiles), noise, duplicate
    values and NaN holes — so the fill must propagate spill levels
    across tile boundaries over more than one round."""
    rng = np.random.RandomState(seed)
    ys, xs = np.mgrid[0:h, 0:w]
    r = (3000.0 + 1.0 * (xs + ys) // 4 + rng.randint(0, 3, (h, w))).astype(
        float)
    for (cy, cx, rad, depth) in ((h // 4, w // 4, min(h, w) // 5, 400),
                                 (3 * h // 4, w // 2, min(h, w) // 3, 900),
                                 (h // 2, 3 * w // 4, 5, 120)):
        d2 = (ys - cy) ** 2 + (xs - cx) ** 2
        bowl = d2 < rad * rad
        r[bowl] -= depth * (1 - d2[bowl] / (rad * rad))
    r[rng.rand(h, w) < 0.03] = np.nan
    return r


def test_dense_priority_flood_matches_brute_fill():
    from remotior_sensus_spark.synth.expected import _dense_priority_flood

    r = _basin_raster(48, 40)
    filled = _dense_priority_flood(r)
    brute = _brute_fill(r)
    for (y, x), f in brute.items():
        assert filled[y, x] == f, (y, x)
    assert len(brute) == int((~np.isnan(r)).sum())
    # sanity: the bowls actually forced a fill
    assert any(f > r[y, x] for (y, x), f in brute.items())


def test_spark_fill_matches_brute_on_basin_raster(spark):
    from remotior_sensus_spark.operators.hydrology import (
        fill_depressions_tiles)

    r = _basin_raster(64, 64, seed=5)
    tiles = _tiles_df(spark, r)
    got = _spark_fill_census(fill_depressions_tiles(tiles))
    want = _fill_census_from_map(r, _brute_fill(r))
    assert got == want


def test_spark_fill_tile_size_invariance(spark):
    from remotior_sensus_spark.operators.hydrology import (
        fill_depressions_tiles)

    r = _basin_raster(128, 128, seed=17)
    t16 = _tiles_df(spark, r, 16)
    t64 = _tiles_df(spark, r, 64)
    c16 = _spark_fill_census(fill_depressions_tiles(t16, tile_px=16))
    c64 = _spark_fill_census(fill_depressions_tiles(t64, tile_px=64))
    assert c16 == c64
    # the 16-px run needs more cross-tile rounds for the same answer —
    # the multi-tile bowl guarantees the relaxation actually crossed
    assert any(b >= 0 for b in c16)


def test_spark_fill_matches_dense_oracle_sf0001(spark, geo001_dir):
    from remotior_sensus_spark import queries as Q
    from remotior_sensus_spark.synth.expected import build_fill_depressions

    got = _spark_fill_census(
        Q.REGISTRY["fill_depressions"][0](spark, SF_DIR))
    exp = build_fill_depressions(0.001).to_pydict()
    assert got == {b: (n, s, mx) for b, n, s, mx in zip(
        exp["fill_band"], exp["n_pixels"], exp["sum_fill_fp"],
        exp["max_fill_fp"])}


def test_fill_inner_cap_does_not_change_answer(spark):
    """A tiny inner cap forces many extra OUTER rounds (the in-tile
    solve is cut short, `changed` stays up) but the fixpoint must be
    identical — correctness never depends on the inner loop reaching
    its own fixpoint."""
    from remotior_sensus_spark.operators.hydrology import (
        fill_depressions_tiles)

    r = _basin_raster(64, 64, seed=29)
    tiles = _tiles_df(spark, r)
    full = _spark_fill_census(fill_depressions_tiles(tiles))
    capped = _spark_fill_census(fill_depressions_tiles(tiles, inner_cap=2))
    assert full == capped


def test_spark_filled_flow_matches_brute_composition(spark):
    """fill -> route composition vs the brute pair: Gauss-Seidel dict
    fill, then the per-pixel path walk over the filled surface."""
    from remotior_sensus_spark.operators.hydrology import (
        fill_depressions_tiles, filled_dem_tiles, flow_accumulation_tiles)

    r = _basin_raster(64, 64, seed=5)
    brute_filled = _brute_fill(r)
    rf = np.full_like(r, np.nan)
    for (y, x), f in brute_filled.items():
        rf[y, x] = f
    bacc, _ = _brute_walk(rf)
    want = _acc_census(bacc, ~np.isnan(rf))

    tiles = _tiles_df(spark, r)
    filled = filled_dem_tiles(tiles, tile_px=16)
    got = _spark_acc_census(flow_accumulation_tiles(filled, tile_px=16))
    assert got == want
    # and the composition genuinely moved flow: the raw-surface census
    # must differ (the bowls kill paths on the unfilled DEM)
    raw = _spark_acc_census(flow_accumulation_tiles(tiles, tile_px=16))
    assert raw != got


def test_spark_filled_flow_matches_dense_oracle_sf0001(spark, geo001_dir):
    from remotior_sensus_spark import queries as Q
    from remotior_sensus_spark.synth.expected import (
        build_filled_flow_accumulation)

    got = _spark_acc_census(
        Q.REGISTRY["filled_flow_accumulation"][0](spark, SF_DIR))
    exp = build_filled_flow_accumulation(0.001).to_pydict()
    assert got == {b: (n, s, m) for b, n, s, m in zip(
        exp["acc_band"], exp["n_pixels"], exp["sum_acc"], exp["max_acc"])}


# ---------------------------------------------------------------------------
# Cost distance
# ---------------------------------------------------------------------------

_CD_NBRS = [(dy, dx, 707107 if dy and dx else 500000)
            for dy in (-1, 0, 1) for dx in (-1, 0, 1)
            if not (dy == 0 and dx == 0)]


def _brute_cost(r, src_max=103):
    """Gauss-Seidel label-correcting sweep over a dict — a THIRD
    algorithm family (the engine is tiled Bellman-Ford, the oracle is
    heapq Dijkstra): sweep all valid cells relaxing from current
    labels until a full pass changes nothing. Exact int64 fixed-point
    weights, same (cu+cv)*k convention."""
    H, W = r.shape
    INF = 1 << 62
    c = {}
    d = {}
    for y in range(H):
        for x in range(W):
            if not np.isnan(r[y, x]):
                c[(y, x)] = int(r[y, x])
                d[(y, x)] = 0 if r[y, x] <= src_max else INF
    changed = True
    while changed:
        changed = False
        for (y, x), cu in c.items():
            if d[(y, x)] == 0:
                continue
            best = d[(y, x)]
            for dy, dx, k in _CD_NBRS:
                n = (y + dy, x + dx)
                if n in c and d[n] < INF:
                    cand = d[n] + (c[n] + cu) * k
                    if cand < best:
                        best = cand
            if best < d[(y, x)]:
                d[(y, x)] = best
                changed = True
    return d


def _cost_census_from_map(r, dmap):
    INF = 1 << 62
    census = {}
    for (y, x), dv in dmap.items():
        if dv == 0:
            b = -1
        elif dv >= INF:
            b, dv = -2, 0
        else:
            b = int(dv).bit_length() - 1
        n, s, m = census.get(b, (0, 0, 0))
        census[b] = (n + 1, s + dv, max(m, dv))
    return census


def _spark_cost_census(df):
    return {r["dist_band"]: (r["n_pixels"], r["sum_dist_fp"],
                             r["max_dist_fp"]) for r in df.collect()}


def _cost_raster(h, w, seed=11):
    """Cost-surface stress case: mostly mid-cost terrain, a few cheap
    source cells far apart (paths must span several tiles), a cheap
    'road' row that bends optimal paths away from straight lines, and
    a NaN barrier wall with one gap that forces detours — plus an
    enclosed NaN-ringed pocket whose cells must come out unreachable
    (band -2)."""
    rng = np.random.RandomState(seed)
    r = rng.randint(200, 5000, (h, w)).astype(float)
    r[h // 3, :] = 110.0                       # cheap road
    for (y, x) in ((2, 3), (h - 4, w - 3)):
        r[y, x] = 101.0                        # sources, far corners
    r[:, w // 2] = np.nan                      # wall...
    r[h // 3, w // 2] = 120.0                  # ...with a gap on the road
    r[h - 8:h - 3, 4] = np.nan                 # pocket ring (with edges)
    r[h - 8:h - 3, 9] = np.nan
    r[h - 8, 4:10] = np.nan
    r[h - 3, 4:10] = np.nan
    r[h - 6, 6] = 900.0                        # inside: unreachable
    return r


def test_brute_cost_matches_heapq_oracle_dense():
    """The test-side Gauss-Seidel reference and the oracle-side
    Dijkstra must agree cell-for-cell (independent of Spark)."""
    import heapq

    r = _cost_raster(40, 48)
    d = _brute_cost(r)
    # inline heapq Dijkstra, same as synth/expected.py's family
    INF = 1 << 62
    dd = {k: (0 if r[k] <= 103 else INF) for k in d}
    pq = [(0, k) for k, v in dd.items() if v == 0]
    heapq.heapify(pq)
    while pq:
        dist, (y, x) = heapq.heappop(pq)
        if dist > dd[(y, x)]:
            continue
        for dy, dx, k in _CD_NBRS:
            n = (y + dy, x + dx)
            if n in dd:
                nd = dist + (int(r[y, x]) + int(r[n])) * k
                if nd < dd[n]:
                    dd[n] = nd
                    heapq.heappush(pq, (nd, n))
    assert d == dd
    # the pocket really is unreachable and the wall really detours
    assert any(v >= INF for v in d.values())


def test_spark_cost_distance_matches_brute(spark):
    from remotior_sensus_spark.operators.hydrology import (
        cost_distance_tiles)

    r = _cost_raster(64, 64, seed=11)
    tiles = _tiles_df(spark, r)
    got = _spark_cost_census(cost_distance_tiles(tiles, tile_px=16))
    want = _cost_census_from_map(r, _brute_cost(r))
    assert got == want
    assert -1 in got and -2 in got  # sources and the pocket both hit


def test_spark_cost_distance_tile_size_invariance(spark):
    from remotior_sensus_spark.operators.hydrology import (
        cost_distance_tiles)

    r = _cost_raster(128, 128, seed=23)
    c16 = _spark_cost_census(
        cost_distance_tiles(_tiles_df(spark, r, 16), tile_px=16))
    c64 = _spark_cost_census(
        cost_distance_tiles(_tiles_df(spark, r, 64), tile_px=64))
    assert c16 == c64


def test_cost_inner_cap_does_not_change_answer(spark):
    """Cutting the in-pad solve short only adds OUTER rounds; the
    Bellman-Ford fixpoint is the same."""
    from remotior_sensus_spark.operators.hydrology import (
        cost_distance_tiles)

    r = _cost_raster(64, 64, seed=29)
    tiles = _tiles_df(spark, r)
    full = _spark_cost_census(cost_distance_tiles(tiles, tile_px=16))
    capped = _spark_cost_census(
        cost_distance_tiles(tiles, tile_px=16, inner_cap=2))
    assert full == capped


def test_spark_cost_distance_matches_dense_oracle_sf0001(spark, geo001_dir):
    from remotior_sensus_spark import queries as Q
    from remotior_sensus_spark.synth.expected import build_cost_distance

    got = _spark_cost_census(
        Q.REGISTRY["cost_distance"][0](spark, SF_DIR))
    exp = build_cost_distance(0.001).to_pydict()
    assert got == {b: (n, s, mx) for b, n, s, mx in zip(
        exp["dist_band"], exp["n_pixels"], exp["sum_dist_fp"],
        exp["max_dist_fp"])}


# ---------------------------------------------------------------------------
# Cost allocation
# ---------------------------------------------------------------------------

def _alloc_raster(h, w, seed=11):
    """_cost_raster geometry with DISTINCT source labels: the far-corner
    sources carry values 101 and 103 so every allocation zone is
    attributable, the road/wall/pocket stress stays."""
    r = _cost_raster(h, w, seed)
    r[2, 3] = 101.0
    r[h - 4, w - 3] = 103.0
    return r


def _brute_alloc(r, src_max=103):
    """Gauss-Seidel label-correcting sweep on (distance, label) TUPLES
    (a third family next to the engine's packed-int64 relaxation and
    the oracle's pair-priority heapq): lexicographic relax until a
    full pass changes nothing."""
    H, W = r.shape
    INF = (1 << 62, -1)
    c = {}
    s = {}
    for y in range(H):
        for x in range(W):
            if not np.isnan(r[y, x]):
                cu = int(r[y, x])
                c[(y, x)] = cu
                s[(y, x)] = (0, cu) if r[y, x] <= src_max else INF
    changed = True
    while changed:
        changed = False
        for (y, x), cu in c.items():
            if s[(y, x)][0] == 0:
                continue
            best = s[(y, x)]
            for dy, dx, k in _CD_NBRS:
                n = (y + dy, x + dx)
                if n in c and s[n][0] < (1 << 62):
                    cand = (s[n][0] + (c[n] + cu) * k, s[n][1])
                    if cand < best:
                        best = cand
            if best < s[(y, x)]:
                s[(y, x)] = best
                changed = True
    return s


def _alloc_census_from_map(smap):
    census = {}
    for (y, x), (dv, lab) in smap.items():
        if dv >= 1 << 62:
            z, b, dv = -2, -2, 0
        else:
            z = lab
            b = -1 if dv == 0 else int(dv).bit_length() - 1
        n, sm, mx = census.get((z, b), (0, 0, 0))
        census[(z, b)] = (n + 1, sm + dv, max(mx, dv))
    return census


def _spark_alloc_census(df):
    return {(r["alloc_zone"], r["dist_band"]):
            (r["n_pixels"], r["sum_dist_fp"], r["max_dist_fp"])
            for r in df.collect()}


def test_spark_cost_allocation_matches_brute(spark):
    from remotior_sensus_spark.operators.hydrology import (
        cost_allocation_tiles)

    r = _alloc_raster(64, 64, seed=11)
    got = _spark_alloc_census(
        cost_allocation_tiles(_tiles_df(spark, r), tile_px=16))
    want = _alloc_census_from_map(_brute_alloc(r))
    assert got == want
    zones = {z for z, b in got if z > 0}
    assert zones == {101, 103}          # both labels claim territory
    assert (-2, -2) in got              # the pocket stays unreachable


def test_cost_allocation_tie_prefers_smaller_zone(spark):
    """Engineered exact tie: a 1x9 corridor (rest NaN) with sources
    100 (left) and 102 (right) whose center cell is EQUIDISTANT by
    integer fixed-point arithmetic — the packed-key min must hand it
    to zone 100, matching the tuple-order rule in both references."""
    from remotior_sensus_spark.operators.hydrology import (
        cost_allocation_tiles)

    row = [100.0, 200.0, 200.0, 201.0, 200.0, 200.0, 200.0, 200.0,
           102.0]
    r = np.full((16, 16), np.nan)
    r[4, 2:11] = row
    s = _brute_alloc(r)
    d_mid, lab_mid = s[(4, 6)]
    # the construction really is a tie resolved to the smaller label
    assert lab_mid == 100
    dl = (100 + 2 * (200 + 200 + 201) + 200) * 500000
    assert d_mid == dl == (102 + 2 * 600 + 200) * 500000
    got = _spark_alloc_census(
        cost_allocation_tiles(_tiles_df(spark, r), tile_px=16))
    assert got == _alloc_census_from_map(s)
    # zone 102 exists (its own source cell + near side) but the tie
    # cell sits in zone 100's census mass
    assert any(z == 102 for z, _ in got)


def test_cost_allocation_distance_marginal_matches_cost_distance(spark):
    """Summing the allocation census over zones must reproduce the
    cost_distance census bit-for-bit — the packed key's high bits ARE
    the distance field."""
    from remotior_sensus_spark.operators.hydrology import (
        cost_allocation_tiles, cost_distance_tiles)

    r = _alloc_raster(64, 64, seed=17)
    tiles = _tiles_df(spark, r)
    alloc = _spark_alloc_census(cost_allocation_tiles(tiles, tile_px=16))
    dist = _spark_cost_census(cost_distance_tiles(tiles, tile_px=16))
    marg = {}
    for (z, b), (n, sm, mx) in alloc.items():
        n0, s0, m0 = marg.get(b, (0, 0, 0))
        marg[b] = (n0 + n, s0 + sm, max(m0, mx))
    assert marg == dist


def test_cost_allocation_tile_size_invariance(spark):
    from remotior_sensus_spark.operators.hydrology import (
        cost_allocation_tiles)

    r = _alloc_raster(128, 128, seed=23)
    c16 = _spark_alloc_census(
        cost_allocation_tiles(_tiles_df(spark, r, 16), tile_px=16))
    c64 = _spark_alloc_census(
        cost_allocation_tiles(_tiles_df(spark, r, 64), tile_px=64))
    assert c16 == c64


def test_spark_cost_allocation_matches_dense_oracle_sf0001(spark,
                                                           geo001_dir):
    from remotior_sensus_spark import queries as Q
    from remotior_sensus_spark.synth.expected import build_cost_allocation

    got = _spark_alloc_census(
        Q.REGISTRY["cost_allocation"][0](spark, SF_DIR))
    exp = build_cost_allocation(0.001).to_pydict()
    assert got == {(z, b): (n, s, mx) for z, b, n, s, mx in zip(
        exp["alloc_zone"], exp["dist_band"], exp["n_pixels"],
        exp["sum_dist_fp"], exp["max_dist_fp"])}


def test_spark_corridor_matches_brute(spark):
    """Corridor = dA + dB - C* census vs the test-side composition of
    two Gauss-Seidel label-correcting fields (a third algorithm family
    next to the engine's tiled Bellman-Ford and the oracle's heapq)."""
    from remotior_sensus_spark.operators.hydrology import corridor_tiles

    rng = np.random.RandomState(31)
    r = rng.randint(200, 4000, (64, 64)).astype(float)
    r[5, 5] = 101.0                       # A terminal
    r[58, 60] = 4995.0                    # B terminal
    r[30, 2:62] = 150.0                   # cheap corridor row
    r[:, 32][:20] = np.nan                # partial wall -> detours
    r[50:60, 20] = np.nan

    INF = 1 << 62

    def field(src_pred):
        H, W = r.shape
        c, d = {}, {}
        for y in range(H):
            for x in range(W):
                if not np.isnan(r[y, x]):
                    c[(y, x)] = int(r[y, x])
                    d[(y, x)] = 0 if src_pred(r[y, x]) else INF
        changed = True
        while changed:
            changed = False
            for (y, x), cu in c.items():
                if d[(y, x)] == 0:
                    continue
                best = d[(y, x)]
                for dy, dx, k in _CD_NBRS:
                    n = (y + dy, x + dx)
                    if n in c and d[n] < INF:
                        cand = d[n] + (c[n] + cu) * k
                        if cand < best:
                            best = cand
                if best < d[(y, x)]:
                    d[(y, x)] = best
                    changed = True
        return d

    da = field(lambda z: z <= 103)
    db = field(lambda z: z >= 4990)
    tot = {k: (da[k] + db[k] if da[k] < INF and db[k] < INF else INF)
           for k in da}
    cstar = min(v for v in tot.values() if v < INF)
    want = {}
    for v in tot.values():
        if v >= INF:
            b, s = -2, 0
        else:
            s = v - cstar
            b = -1 if s == 0 else int(s).bit_length() - 1
        n, ss, mx = want.get(b, (0, 0, 0))
        want[b] = (n + 1, ss + s, max(mx, s))

    got = {row["slack_band"]: (row["n_pixels"], row["sum_slack_fp"],
                               row["max_slack_fp"])
           for row in corridor_tiles(_tiles_df(spark, r, 16),
                                     tile_px=16).collect()}
    assert got == want
    assert -1 in got  # an optimal path exists


def test_spark_corridor_matches_dense_oracle_sf0001(spark, geo001_dir):
    from remotior_sensus_spark import queries as Q
    from remotior_sensus_spark.synth.expected import build_corridor

    got = {row["slack_band"]: (row["n_pixels"], row["sum_slack_fp"],
                               row["max_slack_fp"])
           for row in Q.REGISTRY["corridor_census"][0](
               spark, SF_DIR).collect()}
    exp = build_corridor(0.001).to_pydict()
    assert got == {b: (n, s, mx) for b, n, s, mx in zip(
        exp["slack_band"], exp["n_pixels"], exp["sum_slack_fp"],
        exp["max_slack_fp"])}


def test_fill_check_parity(spark, geo001_dir):
    """The r06 check-driven relax loop (strip Jacobi check replacing
    the full confirmation round, fused fine-fan init) is bit-exact
    against the legacy schedule, including when the inner cap forces
    many cross-tile rounds through the active-set machinery."""
    from pyspark.sql import functions as F

    from remotior_sensus_spark.operators import hydrology as hy
    from remotior_sensus_spark.operators.focal import _with_fine_halo_groups
    from remotior_sensus_spark.operators.retile import retile

    b04_small = spark.read.parquet(f"{geo001_dir}/tiles.parquet").filter(
        (F.col("bandset") == "S2_2020-01-01") & (F.col("band") == "B04"))
    t64 = retile(b04_small, 4)
    ref = {tuple(r) for r in
           hy.fill_depressions_tiles(t64, tile_px=64).collect()}

    fan = _with_fine_halo_groups(b04_small, 4, halo_tiles=4)
    got = {tuple(r) for r in
           hy.fill_depressions_tiles(None, tile_px=64,
                                     init_fan=fan).collect()}
    assert got == ref

    # inner_cap=2: the init solve cannot converge in-pad, so the
    # check must flag tiles and the active full-pad rounds must run
    # until the global fixpoint — same census either way
    got_capped = {tuple(r) for r in
                  hy.fill_depressions_tiles(None, tile_px=64, inner_cap=2,
                                            init_fan=fan).collect()}
    assert got_capped == ref

    # windowed init (halo_tiles=2 ring + init_halo_px): relaxation is
    # restricted to the shipped window with beyond-window treated as
    # unknown (never drains) — the init stays a valid upper bound and
    # the check loop descends to the same fixpoint. Both the plain and
    # the capped variants must match.
    fan2 = _with_fine_halo_groups(b04_small, 4, halo_tiles=2)
    got_w = {tuple(r) for r in
             hy.fill_depressions_tiles(None, tile_px=64, init_fan=fan2,
                                       init_halo_px=32).collect()}
    assert got_w == ref
    got_w1 = {tuple(r) for r in
              hy.fill_depressions_tiles(
                  None, tile_px=64, inner_cap=3,
                  init_fan=_with_fine_halo_groups(b04_small, 4,
                                                  halo_tiles=1),
                  init_halo_px=16).collect()}
    assert got_w1 == ref


def test_cost_check_parity(spark):
    """The r06 check-driven cost loop (1-px-strip int64 Jacobi check
    replacing the legacy full round-2 exchange, fused fine-fan init,
    fused census) is bit-exact against the legacy schedule for all
    three cost operators, including when the inner cap forces the
    active-set machinery through many cross-tile rounds."""
    from remotior_sensus_spark.operators import hydrology as hy
    from remotior_sensus_spark.operators.focal import _with_fine_halo_groups

    r = _cost_raster(128, 128, seed=23)
    t16 = _tiles_df(spark, r, 16)
    t64 = _tiles_df(spark, r, 64)
    fan = _with_fine_halo_groups(t16, 4, halo_tiles=4)

    # cost_distance: legacy vs check-driven (same 64-px retile) vs
    # check-driven with the fused fine init fan
    ref = _spark_cost_census(
        hy.cost_distance_tiles(t64, tile_px=64, use_check=False))
    assert _spark_cost_census(
        hy.cost_distance_tiles(t64, tile_px=64)) == ref
    assert _spark_cost_census(
        hy.cost_distance_tiles(None, tile_px=64, init_fan=fan)) == ref
    # inner_cap=2 forces check -> active rounds -> check cycles
    assert _spark_cost_census(
        hy.cost_distance_tiles(None, tile_px=64, init_fan=fan,
                               inner_cap=2)) == ref

    # cost_allocation
    ra = _alloc_raster(128, 128, seed=23)
    a16 = _tiles_df(spark, ra, 16)
    a64 = _tiles_df(spark, ra, 64)
    afan = _with_fine_halo_groups(a16, 4, halo_tiles=4)

    def alloc_census(df):
        return {(r["alloc_zone"], r["dist_band"]):
                (r["n_pixels"], r["sum_dist_fp"], r["max_dist_fp"])
                for r in df.collect()}

    aref = alloc_census(
        hy.cost_allocation_tiles(a64, tile_px=64, use_check=False))
    assert alloc_census(
        hy.cost_allocation_tiles(None, tile_px=64,
                                 init_fan=afan)) == aref
    assert alloc_census(
        hy.cost_allocation_tiles(None, tile_px=64, init_fan=afan,
                                 inner_cap=2)) == aref

    # corridor: two check-driven fixpoints off one checkpointed fan
    def corr_census(df):
        return {r["slack_band"]: (r["n_pixels"], r["sum_slack_fp"],
                                  r["max_slack_fp"])
                for r in df.collect()}

    cref = corr_census(
        hy.corridor_tiles(t64, tile_px=64, use_check=False))
    assert corr_census(
        hy.corridor_tiles(None, tile_px=64,
                          init_fan=fan.localCheckpoint())) == cref


def test_phase2_distributed_parity_log_rounds(spark):
    """The r06 pointer-doubled distributed phase 2 matches the driver
    branch bit for bit AND terminates in O(log chain) rounds: on a
    serpentine ramp (one long flow line snaking through every tile)
    the old hop-per-round loop needed ~chain-length rounds, the
    doubled loop must stay within ceil(log2(n_border)) + 2."""
    import math

    from remotior_sensus_spark.operators import hydrology as hy

    # serpentine descending surface: flow snakes row by row, so the
    # border-entry chain spans nearly every border cell
    h, w = 64, 64
    vals = np.arange(h * w, dtype=float)[::-1]
    r = np.zeros((h, w))
    for y in range(h):
        row = vals[y * w:(y + 1) * w]
        r[y] = row if y % 2 == 0 else row[::-1]
    r = r + 1.0
    tiles = _tiles_df(spark, r, 16)

    want = _spark_acc_census(
        hy.flow_accumulation_tiles(tiles, tile_px=16))
    got = _spark_acc_census(
        hy.flow_accumulation_tiles(tiles, tile_px=16,
                                   driver_threshold=0))
    assert got == want
    n_border = 4 * 16 * (h // 16) * (w // 16)  # upper bound
    assert 1 <= hy._LAST_PH2_ROUNDS <= math.ceil(
        math.log2(n_border)) + 2, hy._LAST_PH2_ROUNDS


def test_corridor_fused_parity(spark):
    """The r06 fused dual-plane corridor (one relax loop computing dA
    and dB together, C* riding the check rows) is bit-exact against
    the legacy two-fixpoint composition, with and without the fused
    fine init fan, including a forced multi-round run."""
    from remotior_sensus_spark.operators import hydrology as hy
    from remotior_sensus_spark.operators.focal import _with_fine_halo_groups

    def census(df):
        return {r["slack_band"]: (r["n_pixels"], r["sum_slack_fp"],
                                  r["max_slack_fp"])
                for r in df.collect()}

    r = _cost_raster(128, 128, seed=37)
    r[5, 5] = 4995.0
    r[100, 120] = 4999.0  # far-apart B terminals
    t16 = _tiles_df(spark, r, 16)
    t64 = _tiles_df(spark, r, 64)
    fan = _with_fine_halo_groups(t16, 4, halo_tiles=4)

    ref = census(hy.corridor_tiles(t64, tile_px=64, use_check=False))
    assert census(hy.corridor_tiles(t64, tile_px=64)) == ref
    assert census(hy.corridor_tiles(
        None, tile_px=64, init_fan=fan.localCheckpoint())) == ref
    assert census(hy.corridor_tiles(
        None, tile_px=64, init_fan=fan.localCheckpoint(),
        inner_cap=2)) == ref
