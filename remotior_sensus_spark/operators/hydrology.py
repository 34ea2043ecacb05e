"""Distributed D8 hydrology: global flow accumulation and watershed
basins over the tiled raster.

Reference scope: the reference ships D8-style terrain derivatives by
shelling to gdaldem (tools/*; see geostats.py provenance notes) and has
no distributed flow-accumulation counterpart — this module is the
scale-path design for that family, following the two-level decomposition
published for trillion-cell DEMs (R. Barnes, "Parallel non-divergent
flow accumulation for trillion cell digital elevation models on desktops
or clusters", Environmental Modelling & Software 92, 2017):

  Phase 1 (one focal-halo shuffle): each tile, shipped with its 8
    neighbours, resolves EVERY in-tile flow path with a vectorized
    absorbing pointer-doubling pass (O(log T^2) numpy rounds) and emits
    only a BOUNDED condensate: per border-entry cell, the next
    border-entry it forwards to (the tile-hop routing forest), and per
    outgoing tile crossing, the count of tile-own cells draining
    through it (the initial carries). Rows leaving each Arrow group are
    O(T) (the tile perimeter), never O(T^2).
  Phase 2 (driver-coordinated iteration on the condensate): carries
    advance hop-by-hop through the routing forest, recording the total
    external inflow arriving at every border-entry cell. The active set
    only ever holds border cells (<= 4/T of the corpus; ~1/16 at T=64)
    and shrinks as chains terminate; rounds = the longest tile-hop
    chain, so a larger `tile_px` trades halo width for rounds exactly
    as in the published design. Each round is one equi-join + one
    partial-agg groupBy, checkpointed to keep lineage flat.
  Phase 3 (one cogrouped halo shuffle): tiles meet their resolved
    entry inflows in a single cogroup; a vectorized in-tile topological
    peel re-runs accumulation with the inflows injected as extra source
    weight, and only the bounded per-tile census leaves the group.

Semantics (shared with the dense reference in synth/expected.py and the
brute-force path-walk reference in tests):
  - D8 codes come from geostats._d8_best: a cell flows to its strictly
    lower steepest neighbour (exact-integer ranking, cardinal 2*dv^2 vs
    diagonal dv^2, first-in-code-order tie-break) and only cells with
    all 8 neighbours valid carry a code — raster-edge and
    nodata-adjacent cells are sinks. Strict descent makes the flow
    graph a forest (no cycles by construction).
  - Every valid pixel has weight 1. accumulation(v) = number of valid
    pixels whose flow path passes through v, inclusive of v itself
    (so acc >= 1 everywhere valid, and acc = 1 on ridges).
  - basin(v) = the terminal sink cell of v's flow path; watershed
    census groups the raster by basin.

Both operators return bounded censuses (log2 bands), so the only
corpus-scale exchange in either is the halo shuffle itself.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from remotior_sensus_spark.grid import TILE_PX
from remotior_sensus_spark.operators.geostats import _D8, _d8_best

# global pixel coords pack into one int64 join key; 2^31 rows/cols is
# far beyond any raster this engine targets (100 TB of int16 pixels is
# ~7e6 px per side)
_PACK = np.int64(2) ** np.int64(31)


def _pack_col(gx, gy):
    return (gx.cast("long") * int(_PACK) + gy.cast("long"))


def _resolve_tile_flow(pad: np.ndarray, T: int):
    """Vectorized in-tile flow resolution over the 3T x 3T halo pad.

    Returns (valid, final, cross_gx, cross_gy) where, per centre cell
    (flattened T*T):
      final == -1          -> the path terminates INSIDE this tile
                              (pit / no-code cell); the terminal cell's
                              flat index is in `pit_of`
      final == -(2 + i)    -> the path leaves the tile; crossing i
                              enters the neighbour raster cell
                              (cross_gx[i], cross_gy[i]) — tile-LOCAL
                              coords relative to this tile's origin
                              (may be -1 or T, i.e. outside [0, T))
    plus pit_of: per-cell flat index of the terminal cell when the path
    ends in-tile (undefined where final != -1).

    The absorbing pointer-doubling loop converges in O(log T^2) rounds:
    each round replaces every live pointer with its pointer's pointer,
    so the remaining hop distance halves.
    """
    codes, interior = _d8_best(pad, slice(T, 2 * T), slice(T, 2 * T))
    centre = pad[T:2 * T, T:2 * T]
    valid = ~np.isnan(centre)

    dxa = np.zeros((T, T), dtype=np.int64)
    dya = np.zeros((T, T), dtype=np.int64)
    for dx, dy, code, _diag in _D8:
        m = interior & (codes == code)
        dxa[m] = dx
        dya[m] = dy
    flows = interior & (codes != 0)

    ys, xs = np.meshgrid(np.arange(T), np.arange(T), indexing="ij")
    tx_, ty_ = xs + dxa, ys + dya
    inside = flows & (tx_ >= 0) & (tx_ < T) & (ty_ >= 0) & (ty_ < T)
    crossing = flows & ~inside

    n = T * T
    nxt = np.full(n, -1, dtype=np.int64)
    nxt[inside.ravel()] = (ty_[inside] * T + tx_[inside]).astype(np.int64)

    cgx = tx_[crossing].astype(np.int64)
    cgy = ty_[crossing].astype(np.int64)
    packed = cgx * _PACK + cgy
    uniq, inv = np.unique(packed, return_inverse=True)
    nxt[crossing.ravel()] = -(2 + inv)
    cross_gx = (uniq // _PACK).astype(np.int64)
    cross_gy = (uniq % _PACK).astype(np.int64)

    # absorbing pointer doubling; pit_of tracks the terminal cell for
    # in-tile paths: when the jump target absorbs to -1 the live cell
    # inherits the target's RESOLVED terminal (pit_of starts as self,
    # and genuine terminals never update)
    final = nxt.copy()
    pit_of = np.arange(n, dtype=np.int64)
    for _ in range(int(np.ceil(np.log2(n))) + 3):
        if not (final >= 0).any():
            break
        li = np.flatnonzero(final >= 0)
        tgt = final[li]
        step = final[tgt]
        pit_of[li] = np.where(step == -1, pit_of[tgt], pit_of[li])
        final[li] = step
    else:
        raise AssertionError("flow pointer doubling did not converge "
                             "(cycle in D8 graph?)")
    # cells that ARE their own terminal (no code / invalid) keep
    # final == -1, pit_of == self
    return valid, final, pit_of, cross_gx, cross_gy, inside, tx_, ty_


def _phase1_kernel(pdf: pd.DataFrame, T: int, want_pits: bool):
    """Condensate rows for one halo group. kind 0 = border-entry
    routing (gx,gy = entry cell; nx,ny = next entry in a neighbour tile
    or the in-tile terminal sink when want_pits, else -1 sentinel);
    kind 1 = initial carry injection (gx,gy = receiving entry cell in a
    NEIGHBOUR tile, cnt = tile-own cells draining through it);
    kind 2 (want_pits only) = per-terminal tile-own counts
    (gx,gy = terminal sink cell, cnt)."""
    from remotior_sensus_spark.operators.focal import _assemble_padded

    cols = ["kind", "gx", "gy", "nx", "ny", "cnt"]
    empty = pd.DataFrame({c: pd.Series(dtype="int64") for c in cols})
    if not ((pdf["dx"] == 0) & (pdf["dy"] == 0)).any():
        return empty
    tx = int(pdf["target_tx"].iloc[0])
    ty = int(pdf["target_ty"].iloc[0])
    pad = _assemble_padded(pdf, tile_px=T)
    valid, final, pit_of, cgx, cgy, *_ = _resolve_tile_flow(pad, T)
    if not valid.any():
        return empty
    vflat = valid.ravel()
    ox, oy = tx * T, ty * T
    parts = []

    # kind 1: initial carries — tile-own valid cells per crossing
    has_cross = vflat & (final <= -2)
    if has_cross.any():
        ids, cnts = np.unique(-(final[has_cross]) - 2, return_counts=True)
        parts.append(pd.DataFrame({
            "kind": 1, "gx": ox + cgx[ids], "gy": oy + cgy[ids],
            "nx": -1, "ny": -1, "cnt": cnts}))

    # kind 0: routing for every valid border cell (the only cells that
    # can receive cross-tile inflow)
    border = np.zeros((T, T), dtype=bool)
    border[0, :] = border[-1, :] = True
    border[:, 0] = border[:, -1] = True
    bidx = np.flatnonzero((border & valid).ravel())
    if len(bidx):
        f = final[bidx]
        cross = f <= -2
        nx = np.full(len(bidx), -1, dtype=np.int64)
        ny = np.full(len(bidx), -1, dtype=np.int64)
        ci = -(f[cross]) - 2
        nx[cross] = ox + cgx[ci]
        ny[cross] = oy + cgy[ci]
        if want_pits:
            pit = ~cross
            p = pit_of[bidx[pit]]
            nx[pit] = -(ox + p % T) - 1
            ny[pit] = -(oy + p // T) - 1
        parts.append(pd.DataFrame({
            "kind": 0, "gx": ox + bidx % T, "gy": oy + bidx // T,
            "nx": nx, "ny": ny, "cnt": 0}))

    # kind 2: tile-own counts per in-tile terminal (watershed only)
    if want_pits:
        pit_cells = vflat & (final == -1)
        if pit_cells.any():
            uniq, cnts = np.unique(pit_of[pit_cells], return_counts=True)
            parts.append(pd.DataFrame({
                "kind": 2, "gx": ox + uniq % T, "gy": oy + uniq // T,
                "nx": -1, "ny": -1, "cnt": cnts}))

    if not parts:
        return empty
    return pd.concat(parts, ignore_index=True).astype("int64")


_PH1_SCHEMA = "kind long, gx long, gy long, nx long, ny long, cnt long"


def _phase1(band_tiles: DataFrame, T: int, want_pits: bool) -> DataFrame:
    from remotior_sensus_spark.operators.focal import _with_halo_groups

    def kern(pdf):
        return _phase1_kernel(pdf, T, want_pits)

    return _with_halo_groups(band_tiles).groupBy(
        "target_tx", "target_ty").applyInPandas(kern, _PH1_SCHEMA)


def _phase2_driver_inflow(routing_pdf: pd.DataFrame,
                          carries_pdf: pd.DataFrame) -> pd.DataFrame:
    """Driver-side phase 2 (the resolve_components precedent: below the
    threshold a single collected pass beats O(tile-hop-chain) Spark
    rounds). Vectorized carry propagation over the border forest;
    returns (k, c) total external inflow per entry cell."""
    k = routing_pdf["k"].to_numpy(np.int64)
    nk = routing_pdf["nk"].to_numpy(np.int64)
    order = np.argsort(k)
    ks = k[order]

    def idx_of(keys):
        i = np.searchsorted(ks, keys)
        return order[i]

    m = nk >= 0
    nxt = np.full(len(k), -1, dtype=np.int64)
    nxt[m] = idx_of(nk[m])

    inflow = np.zeros(len(k), dtype=np.int64)
    cur_i = idx_of(carries_pdf["k"].to_numpy(np.int64))
    cur_c = carries_pdf["c"].to_numpy(np.int64)
    for _ in range(len(k) + 1):  # hop count <= entry count (acyclic)
        if not len(cur_i):
            break
        np.add.at(inflow, cur_i, cur_c)
        nx = nxt[cur_i]
        keep = nx >= 0
        if not keep.any():
            break
        uniq, inv = np.unique(nx[keep], return_inverse=True)
        summed = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(summed, inv, cur_c[keep])
        cur_i, cur_c = uniq, summed
    else:
        raise AssertionError("carry propagation did not terminate "
                             "(cycle in border forest?)")
    hit = inflow > 0
    return pd.DataFrame({"k": k[hit], "c": inflow[hit]})


def _sink_driver(routing_pdf: pd.DataFrame) -> pd.DataFrame:
    """Driver-side sink resolution: numpy pointer doubling over the
    collected border forest; returns (k, sink)."""
    k = routing_pdf["k"].to_numpy(np.int64)
    nk = routing_pdf["nk"].to_numpy(np.int64)
    order = np.argsort(k)
    ks = k[order]
    val = nk.copy()
    for _ in range(66):  # doubling: 2^66 hops >> any chain
        if not (val >= 0).any():
            break
        li = np.flatnonzero(val >= 0)
        ti = order[np.searchsorted(ks, val[li])]
        val[li] = val[ti]
    else:
        raise AssertionError("sink doubling did not converge "
                             "(cycle in border forest?)")
    return pd.DataFrame({"k": k, "sink": -(val + 1)})


def flow_accumulation_tiles(band_tiles: DataFrame,
                            tile_px: int | None = None,
                            max_rounds: int = 100_000,
                            driver_threshold: int = 2_000_000) -> DataFrame:
    """Exact global D8 flow accumulation census: one row per log2 band
    of the per-pixel accumulation, with (acc_band, n_pixels, sum_acc,
    max_acc). See the module docstring for the three-phase design; the
    dense single-array reference lives in synth/expected.py
    (build_flow_accumulation) and the per-pixel path-walk reference in
    tests/test_hydrology.py."""
    T = tile_px or TILE_PX

    # the tile stream feeds BOTH halo passes (phase 1 and phase 3);
    # materialize it once so the upstream lineage (source scan, retile
    # shuffle) doesn't execute twice — one block-manager write
    # (memory-and-disk, spillable) buys back a full corpus shuffle
    band_tiles = band_tiles.localCheckpoint()
    inflow = _entry_inflow(band_tiles, T, max_rounds, driver_threshold)

    def census(pad, acc):
        vals = acc[acc > 0]
        if not len(vals):
            return []
        _, expo = np.frexp(vals.astype(np.float64))
        band = (expo - 1).astype(np.int64)
        return [(int(b), int((band == b).sum()),
                 int(vals[band == b].sum()), int(vals[band == b].max()))
                for b in np.unique(band)]

    per_tile = _phase3_cogroup(
        band_tiles, T, inflow, census,
        "acc_band long, n_pixels long, sum_acc long, max_acc long",
        ["acc_band", "n_pixels", "sum_acc", "max_acc"])
    return (per_tile.groupBy(F.col("acc_band").cast("int").alias("acc_band"))
            .agg(F.sum("n_pixels").alias("n_pixels"),
                 F.sum("sum_acc").alias("sum_acc"),
                 F.max("max_acc").alias("max_acc")))


def _entry_inflow(band_tiles: DataFrame, T: int, max_rounds: int,
                  driver_threshold: int) -> DataFrame:
    """Phases 1+2 shared by the accumulation-derived operators: the
    border condensate and its resolved per-entry external inflows.
    `band_tiles` must already be materialized (localCheckpoint) by the
    caller — it is consumed again by the phase-3 halo pass."""
    ph1 = _phase1(band_tiles, T, want_pits=False).localCheckpoint()

    # routing/carries are cheap projections of the checkpointed
    # condensate — no extra materialization needed
    routing = ph1.filter(F.col("kind") == 0).select(
        _pack_col(F.col("gx"), F.col("gy")).alias("k"),
        F.when(F.col("nx") >= 0,
               _pack_col(F.col("nx"), F.col("ny"))).alias("nk"),
    )
    carries = ph1.filter(F.col("kind") == 1).groupBy(
        _pack_col(F.col("gx"), F.col("gy")).alias("k")
    ).agg(F.sum("cnt").alias("c")).localCheckpoint()

    # Phase 2: advance carries through the border-entry forest,
    # recording arrival totals at every hop. Two branches, both exact
    # and cross-tested (the resolve_components precedent): below
    # `driver_threshold` border cells the collected condensate resolves
    # in one vectorized driver pass (a documented small-table collect —
    # the condensate is ~4/T of the corpus, so the threshold covers
    # everything up to ~10^8-pixel rasters at T=64); above it, the
    # iterative join loop runs, active set shrinking to empty because
    # strict-descent flow is acyclic.
    n_border = routing.count()
    if n_border <= driver_threshold:
        r_pdf = routing.select(
            "k", F.coalesce("nk", F.lit(-1)).alias("nk")).toPandas()
        inflow_pdf = _phase2_driver_inflow(r_pdf, carries.toPandas())
        spark = band_tiles.sparkSession
        inflow = spark.createDataFrame(
            inflow_pdf, schema="k long, c long")
    else:
        inflow_rounds = [carries]
        cur = carries
        rounds = 0
        while True:
            rounds += 1
            if rounds > max_rounds:
                raise RuntimeError(
                    "flow_accumulation: tile-hop chain exceeded "
                    f"{max_rounds} rounds — raise tile_px (halo width "
                    "trades against rounds; see module docstring)")
            cur = (cur.join(routing, "k")
                      .filter(F.col("nk").isNotNull())
                      .groupBy(F.col("nk").alias("k"))
                      .agg(F.sum("c").alias("c"))).localCheckpoint()
            if cur.isEmpty():
                break
            inflow_rounds.append(cur)
        inflow = inflow_rounds[0]
        for r in inflow_rounds[1:]:
            inflow = inflow.unionByName(r)
        inflow = inflow.groupBy("k").agg(F.sum("c").alias("c"))

    return inflow.select(
        F.shiftright("k", 31).alias("gx"),
        F.col("k").bitwiseAND(F.lit(int(_PACK) - 1)).alias("gy"),
        "c",
    ).select(
        # cast to INT to match the halo side's key type exactly —
        # cogroup co-partitions each side by its own key encoding, so an
        # int/long mismatch silently strands rows in keyless groups
        # (caught by the per-cell parity sweep at sf0.01)
        F.expr(f"gx div {T}").cast("int").alias("tx"),
        F.expr(f"gy div {T}").cast("int").alias("ty"),
        "gx", "gy", "c",
    )


def _phase3_cogroup(band_tiles: DataFrame, T: int, inflow: DataFrame,
                    census_fn, schema: str, cols: list) -> DataFrame:
    """Phase 3: cogroup tiles with their entry inflows; in-tile
    topological peel with the inflows injected as source weight, then
    `census_fn(pad, acc) -> bounded row list` per tile."""
    from remotior_sensus_spark.operators.focal import (
        _assemble_padded, _with_halo_groups)

    def kern3(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({c: pd.Series(dtype="int64") for c in cols})
        if len(left) == 0 or not ((left["dx"] == 0) & (left["dy"] == 0)).any():
            # inflow always targets an existing tile (D8 never flows
            # off-raster), so a keyless right group means the cogroup
            # failed to align — fail LOUDLY (silent drop was the
            # key-type-mismatch bug this guard now pins)
            if len(right):
                raise AssertionError(
                    f"stranded inflow rows (no matching tile group): "
                    f"{right.head()}")
            return empty
        tx = int(left["target_tx"].iloc[0])
        ty = int(left["target_ty"].iloc[0])
        pad = _assemble_padded(left, tile_px=T)
        acc = _tile_accumulate(pad, T, right, tx, ty)
        if acc is None:
            return empty
        out = census_fn(pad, acc)
        if not out:
            return empty
        return pd.DataFrame(out, columns=cols).astype("int64")

    halo = _with_halo_groups(band_tiles)
    return halo.groupBy("target_tx", "target_ty").cogroup(
        inflow.groupBy("tx", "ty")
    ).applyInPandas(kern3, schema)


def twi_census_tiles(band_tiles: DataFrame, tile_px: int | None = None,
                     cellsize: float = 10.0, max_rounds: int = 100_000,
                     driver_threshold: int = 2_000_000) -> DataFrame:
    """Topographic wetness index census: TWI = ln(a / tan beta) with
    a = flow_accumulation * cellsize (specific catchment area per unit
    contour width) and tan beta from the Horn 3x3 gradient (the same
    formula/orientation as terrain.horn_terrain), clamped to >= 1e-3 on
    flats. Defined on cells with a complete 3x3 window (the D8 interior
    set). Output: one row per integer TWI band with (twi_band,
    n_pixels, checksum) — checksum is the repo's fixed-point convention
    floor(twi * 1e6 + 0.5) summed as int64, so the dense reference
    (synth/expected.py build_twi_census, its own independently written
    Horn expression) must match bit-for-bit.

    Same three-phase machinery as flow_accumulation_tiles: the only new
    work is the in-kernel gradient over the pad already in memory."""
    T = tile_px or TILE_PX
    band_tiles = band_tiles.localCheckpoint()
    inflow = _entry_inflow(band_tiles, T, max_rounds, driver_threshold)

    denom = 8.0 * cellsize

    def census(pad, acc):
        rn = slice(T - 1, 2 * T - 1)
        r0 = slice(T, 2 * T)
        rs = slice(T + 1, 2 * T + 1)
        cw, cc, ce = rn, r0, rs
        a, b, c = pad[rn, cw], pad[rn, cc], pad[rn, ce]
        d, e, f_ = pad[r0, cw], pad[r0, cc], pad[r0, ce]
        g, h, i = pad[rs, cw], pad[rs, cc], pad[rs, ce]
        ok = ~(np.isnan(a) | np.isnan(b) | np.isnan(c) | np.isnan(d)
               | np.isnan(e) | np.isnan(f_) | np.isnan(g) | np.isnan(h)
               | np.isnan(i))
        ok &= acc > 0
        if not ok.any():
            return []
        with np.errstate(all="ignore"):
            dzdx = ((c + 2.0 * f_ + i) - (a + 2.0 * d + g)) / denom
            dzdy = ((g + 2.0 * h + i) - (a + 2.0 * b + c)) / denom
            tanb = np.sqrt(dzdx * dzdx + dzdy * dzdy)
            tanb = np.maximum(tanb, 1e-3)
            twi = np.log(acc.astype(np.float64) * cellsize / tanb)
        vals = twi[ok]
        band = np.floor(vals).astype(np.int64)
        fp = np.floor(vals * 1e6 + 0.5).astype(np.int64)
        return [(int(bb), int((band == bb).sum()), int(fp[band == bb].sum()))
                for bb in np.unique(band)]

    per_tile = _phase3_cogroup(
        band_tiles, T, inflow, census,
        "twi_band long, n_pixels long, checksum long",
        ["twi_band", "n_pixels", "checksum"])
    return (per_tile.groupBy(F.col("twi_band").cast("int").alias("twi_band"))
            .agg(F.sum("n_pixels").alias("n_pixels"),
                 F.sum("checksum").alias("checksum")))


def _tile_accumulate(pad: np.ndarray, T: int, inflow_pdf, tx: int, ty: int):
    """Vectorized in-tile topological accumulation (indegree peel) with
    external inflows injected at their entry cells. Returns the (T, T)
    int64 accumulation of VALID centre cells (0 where invalid), or None
    when the tile holds no valid pixel. Rounds are bounded by the
    longest in-tile flow path; every round is whole-array numpy."""
    codes, interior = _d8_best(pad, slice(T, 2 * T), slice(T, 2 * T))
    centre = pad[T:2 * T, T:2 * T]
    valid = ~np.isnan(centre)
    if not valid.any():
        return None

    w = valid.astype(np.int64)
    if inflow_pdf is not None and len(inflow_pdf):
        lx = (inflow_pdf["gx"].to_numpy() - tx * T).astype(np.int64)
        ly = (inflow_pdf["gy"].to_numpy() - ty * T).astype(np.int64)
        if ((lx < 0) | (lx >= T) | (ly < 0) | (ly >= T)).any():
            raise AssertionError(
                f"inflow routed to wrong tile ({tx},{ty}): "
                f"{inflow_pdf[(lx < 0) | (lx >= T) | (ly < 0) | (ly >= T)]}")
        np.add.at(w, (ly, lx), inflow_pdf["c"].to_numpy().astype(np.int64))

    dxa = np.zeros((T, T), dtype=np.int64)
    dya = np.zeros((T, T), dtype=np.int64)
    for dx, dy, code, _diag in _D8:
        m = interior & (codes == code)
        dxa[m] = dx
        dya[m] = dy
    flows = interior & (codes != 0)
    ys, xs = np.meshgrid(np.arange(T), np.arange(T), indexing="ij")
    tx_, ty_ = xs + dxa, ys + dya
    inside = flows & (tx_ >= 0) & (tx_ < T) & (ty_ >= 0) & (ty_ < T)

    n = T * T
    tgt = np.full(n, -1, dtype=np.int64)
    tgt[inside.ravel()] = (ty_[inside] * T + tx_[inside]).astype(np.int64)

    accf = w.ravel().copy()
    indeg = np.zeros(n, dtype=np.int64)
    has = tgt >= 0
    np.add.at(indeg, tgt[has], 1)
    vf = valid.ravel()
    processed = ~vf
    frontier = vf & (indeg == 0)
    for _ in range(n + 1):
        if not frontier.any():
            break
        idx = np.flatnonzero(frontier)
        t = tgt[idx]
        h = t >= 0
        np.add.at(accf, t[h], accf[idx[h]])
        np.subtract.at(indeg, t[h], 1)
        processed[idx] = True
        frontier = vf & ~processed & (indeg == 0)
    accf[~vf] = 0
    return accf.reshape(T, T)


def watershed_basins_tiles(band_tiles: DataFrame,
                           tile_px: int | None = None,
                           max_rounds: int = 100_000,
                           driver_threshold: int = 2_000_000) -> DataFrame:
    """Watershed basin census: every valid pixel is assigned to the
    terminal sink of its D8 flow path, and basins are summarized by
    log2 size band as (size_band, n_basins, n_pixels). Reuses the
    phase-1 condensate with pit identity: border-entry routing resolves
    to a FINAL sink by driver-coordinated pointer chasing, tile-own
    per-terminal counts join the resolved map, and only then does the
    one compact basin shuffle run — rows are (tile, terminal) pairs,
    bounded by pixels/9 on any raster (a pit drains >= its 8-cell
    neighbourhood... a sink's catchment is >= 1; the real bound is the
    condensate size, not the corpus)."""
    T = tile_px or TILE_PX

    # single halo pass — the tile stream is consumed once, so no
    # input materialization (unlike flow_accumulation's two passes)
    ph1 = _phase1(band_tiles, T, want_pits=True).localCheckpoint()

    # routing: entry k -> (nk, sink?) — nk >= 0 means another entry,
    # nk < 0 encodes the in-tile terminal sink -(pack)-1
    routing = ph1.filter(F.col("kind") == 0).select(
        _pack_col(F.col("gx"), F.col("gy")).alias("k"),
        F.when(
            F.col("nx") >= 0, _pack_col(F.col("nx"), F.col("ny"))
        ).otherwise(
            -(_pack_col(-F.col("nx") - 1, -F.col("ny") - 1)) - F.lit(1)
        ).alias("nk"),
    ).localCheckpoint()

    # resolve every entry to its final sink — driver branch below the
    # condensate threshold (one collected numpy doubling pass), else
    # POINTER DOUBLING on DataFrames: joining live rows against the
    # current state (which already encodes 2^r-hop jumps) doubles the
    # resolved distance per round, so rounds = O(log longest-chain)
    n_border = routing.count()
    if n_border <= driver_threshold:
        sink_of = band_tiles.sparkSession.createDataFrame(
            _sink_driver(routing.toPandas()), schema="k long, sink long")
    else:
        state = routing
        rounds = 0
        while not state.filter(F.col("nk") >= 0).isEmpty():
            rounds += 1
            if rounds > max_rounds:
                raise RuntimeError(
                    "watershed_basins: tile-hop chain exceeded "
                    f"2^{max_rounds} hops — raise tile_px")
            live = state.filter(F.col("nk") >= 0)
            donef = state.filter(F.col("nk") < 0)
            stepped = live.alias("s").join(
                state.alias("r"), F.col("s.nk") == F.col("r.k")
            ).select(F.col("s.k").alias("k"), F.col("r.nk").alias("nk"))
            state = donef.unionByName(stepped).localCheckpoint()
        sink_of = state.select(
            "k", (-(F.col("nk") + 1)).alias("sink"))

    # tile-own counts: kind 2 rows sink directly; kind 1 rows (carries
    # into a neighbour entry) resolve through sink_of
    direct = ph1.filter(F.col("kind") == 2).select(
        _pack_col(F.col("gx"), F.col("gy")).alias("sink"),
        F.col("cnt"))
    via_entry = ph1.filter(F.col("kind") == 1).select(
        _pack_col(F.col("gx"), F.col("gy")).alias("k"), F.col("cnt")
    ).join(sink_of, "k").select("sink", "cnt")

    basins = direct.unionByName(via_entry).groupBy("sink").agg(
        F.sum("cnt").alias("size"))
    banded = basins.select(
        F.floor(F.log2(F.col("size").cast("double"))).cast("int")
        .alias("size_band"), "size")
    return banded.groupBy("size_band").agg(
        F.count("*").alias("n_basins"), F.sum("size").alias("n_pixels"))
