"""Dense-numpy parity for the round-4-continuation raster censuses.

The DuckDB oracles share this repo's relational FORMULATION, so a
conceptual error mirrored into both engines would pass the oracle;
these tests rebuild each census from an independently-written dense
numpy kernel (boundary handling via explicit index masks, not shifted
relations) and require exact equality of every output row."""

import duckdb
import numpy as np
import pytest

from remotior_sensus_spark import queries as Q

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def dense(geo001_dir):
    con = duckdb.connect()
    px = con.sql(f"""select gx, gy, value from '{geo001_dir}/tile_pixels.parquet'
      where bandset='S2_2020-01-01' and band='B04'""").df()
    h, w = int(px.gy.max()) + 1, int(px.gx.max()) + 1
    a = np.full((h, w), -32768, dtype=np.int64)
    a[px.gy, px.gx] = px.value
    return a, a != -32768


def _neighbor(a, valid, dx, dy):
    """(values, validity) of the neighbor at (+dx, +dy), off-grid
    invalid."""
    h, w = a.shape
    ys, xs = np.mgrid[0:h, 0:w]
    y2, x2 = ys + dy, xs + dx
    m = (y2 >= 0) & (y2 < h) & (x2 >= 0) & (x2 < w)
    nv = np.zeros((h, w), bool)
    nb = np.full((h, w), -32768, dtype=np.int64)
    nv[m] = valid[y2[m], x2[m]]
    nb[m] = a[y2[m], x2[m]]
    return nb, nv


def test_lbp_census_matches_dense_numpy(spark, dense, geo001_dir):
    a, valid = dense
    offs = [(1, 0, 1), (1, 1, 2), (0, 1, 4), (-1, 1, 8),
            (-1, 0, 16), (-1, -1, 32), (0, -1, 64), (1, -1, 128)]
    code = np.zeros_like(a)
    cnt = np.zeros_like(a)
    for dx, dy, b in offs:
        nb, nv = _neighbor(a, valid, dx, dy)
        cnt += nv
        code += b * ((nb >= a) & nv)
    interior = valid & (cnt == 8)
    ref = {}
    for c in np.unique(code[interior]):
        sel = interior & (code == c)
        ref[int(c)] = (int(sel.sum()), int(a[sel].sum()))
    got = {r["code"]: (r["n_pixels"], r["sum_v"]) for r in
           Q.REGISTRY["lbp_census"][0](spark, SF_DIR).collect()}
    assert got == ref


def test_focal_range_matches_dense_numpy(spark, dense, geo001_dir):
    a, valid = dense
    mx = np.full_like(a, np.iinfo(np.int64).min)
    mn = np.full_like(a, np.iinfo(np.int64).max)
    cnt = np.zeros_like(a)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            nb, nv = _neighbor(a, valid, dx, dy)
            mx = np.where(nv, np.maximum(mx, nb), mx)
            mn = np.where(nv, np.minimum(mn, nb), mn)
            cnt += nv
    interior = valid & (cnt == 9)
    r = (mx - mn)[interior]
    band = np.where(r > 0,
                    np.floor(np.log2(np.maximum(r, 1))).astype(int), -1)
    ref = {int(b): (int((band == b).sum()), int(r[band == b].sum()))
           for b in np.unique(band)}
    got = {row["range_band"]: (row["n_pixels"], row["sum_range"]) for row in
           Q.REGISTRY["focal_range"][0](spark, SF_DIR).collect()}
    assert got == ref


def test_hypsometric_deciles_match_dense_numpy(spark, dense, geo001_dir):
    a, valid = dense
    v = a[valid]
    tot = v.size
    rows = []
    cum = 0
    for x in np.sort(np.unique(v))[::-1]:
        cum += int((v == x).sum())
        rows.append((int(x), cum))
    ref = {}
    for d in range(1, 11):
        sat = [(x, c) for x, c in rows if c * 10 >= d * tot]
        ref[d] = (max(s[0] for s in sat), min(s[1] for s in sat))
    got = {r["decile"]: (r["elevation"], r["cum_area"]) for r in
           Q.REGISTRY["hypsometric_deciles"][0](spark, SF_DIR).collect()}
    assert got == ref


def test_d8_indegree_matches_dense_numpy(spark, dense, geo001_dir):
    a, valid = dense
    offs = [(1, 0, 1, 0), (1, 1, 2, 1), (0, 1, 4, 0), (-1, 1, 8, 1),
            (-1, 0, 16, 0), (-1, -1, 32, 1), (0, -1, 64, 0), (1, -1, 128, 1)]
    h, w = a.shape
    best_m = np.full((h, w), -1, dtype=np.int64)
    best_code = np.zeros((h, w), dtype=np.int64)
    cnt = np.zeros((h, w), dtype=np.int64)
    for dx, dy, code, diag in offs:
        nb, nv = _neighbor(a, valid, dx, dy)
        cnt += nv
        m = np.where((a > nb) & nv, (a - nb) ** 2 * (2 - diag), -1)
        # tie-break: larger m wins, then smaller code (offs in code order)
        take = nv & ((m > best_m))
        best_m = np.where(take, m, best_m)
        best_code = np.where(take, code, best_code)
    interior = valid & (cnt == 8)
    dcode = np.where(best_m < 0, 0, best_code)
    indeg = np.zeros((h, w), dtype=np.int64)
    off = {c: (dx, dy) for dx, dy, c, _ in offs}
    ys, xs = np.nonzero(interior & (dcode != 0))
    for y, x in zip(ys, xs):
        dx, dy = off[int(dcode[y, x])]
        ty, tx = y + dy, x + dx
        if 0 <= ty < h and 0 <= tx < w and interior[ty, tx]:
            indeg[ty, tx] += 1
    vals = indeg[interior]
    ref = {int(b): int((vals == b).sum()) for b in np.unique(vals)}
    got = {r["indeg"]: r["n_pixels"] for r in
           Q.REGISTRY["d8_indegree"][0](spark, SF_DIR).collect()}
    assert got == ref
