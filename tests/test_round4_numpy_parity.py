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
    # pin d8_flow's census off the SAME independent reference (the
    # registry now runs the halo-kernel path for both)
    ys2, xs2 = np.nonzero(interior)
    cc = dcode[interior]
    ref_flow = {}
    for code in np.unique(cc):
        sel = cc == code
        ref_flow[int(code)] = (int(sel.sum()), int(xs2[sel].sum()),
                               int(ys2[sel].sum()))
    got_flow = {r["code"]: (r["n_pixels"], r["sum_gx"], r["sum_gy"])
                for r in Q.REGISTRY["d8_flow"][0](spark, SF_DIR).collect()}
    assert got_flow == ref_flow


@pytest.fixture(scope="module")
def dense2(geo001_dir):
    """Dense arrays for both dates x (B04, B08)."""
    con = duckdb.connect()
    out = {}
    for ds in ("S2_2020-01-01", "S2_2020-01-02"):
        for bd in ("B04", "B08"):
            px = con.sql(f"""select gx, gy, value
              from '{geo001_dir}/tile_pixels.parquet'
              where bandset='{ds}' and band='{bd}'""").df()
            h, w = int(px.gy.max()) + 1, int(px.gx.max()) + 1
            a = np.full((h, w), -32768, dtype=np.int64)
            a[px.gy, px.gx] = px.value
            out[(ds, bd)] = a
    return out


def test_cva_change_matches_dense_numpy(spark, dense2, geo001_dir):
    xa = dense2[("S2_2020-01-01", "B04")]
    xb = dense2[("S2_2020-01-02", "B04")]
    ya = dense2[("S2_2020-01-01", "B08")]
    yb = dense2[("S2_2020-01-02", "B08")]
    ok = (xa != -32768) & (xb != -32768) & (ya != -32768) & (yb != -32768)
    dx, dy = (xb - xa)[ok], (yb - ya)[ok]
    quad = (np.sign(dx) + 1) * 3 + (np.sign(dy) + 1)
    mag = dx * dx + dy * dy
    band = np.where(mag > 0,
                    np.floor(np.log2(np.maximum(mag, 1))).astype(int), -1)
    ref = {}
    for q in np.unique(quad):
        for b in np.unique(band[quad == q]):
            sel = (quad == q) & (band == b)
            ref[(int(q), int(b))] = (int(sel.sum()), int(mag[sel].sum()))
    got = {(r["quad"], r["mag_band"]): (r["n_pixels"], r["sum_mag_sq"])
           for r in Q.REGISTRY["cva_change"][0](spark, SF_DIR).collect()}
    assert got == ref


def test_ndvi_change_classes_match_dense_numpy(spark, dense2, geo001_dir):
    def cls(n, r):
        c = np.zeros(n.shape, dtype=int)
        c = np.where(5 * (n - r) >= (n + r), 1, c)
        c = np.where(2 * (n - r) > (n + r), 2, c)
        return np.where(n + r <= 0, -1, c)

    ra = dense2[("S2_2020-01-01", "B04")]
    na = dense2[("S2_2020-01-01", "B08")]
    rb = dense2[("S2_2020-01-02", "B04")]
    nb = dense2[("S2_2020-01-02", "B08")]
    ok = (ra != -32768) & (na != -32768) & (rb != -32768) & (nb != -32768)
    ca, cb = cls(na, ra)[ok], cls(nb, rb)[ok]
    nbv = nb[ok]
    ref = {}
    for a in np.unique(ca):
        for b in np.unique(cb[ca == a]):
            sel = (ca == a) & (cb == b)
            ref[(int(a), int(b))] = (int(sel.sum()), int(nbv[sel].sum()))
    got = {(r["class_a"], r["class_b"]): (r["n_pixels"], r["sum_nir_b"])
           for r in Q.REGISTRY["ndvi_change_classes"][0](
               spark, SF_DIR).collect()}
    assert got == ref


def test_semivariogram_aniso_matches_dense_numpy(spark, dense, geo001_dir):
    a, valid = dense
    # geographic axes under gy-grows-south: N is (0,-1), NE (1,-1)
    dirs = {"E": (1, 0), "N": (0, -1), "NE": (1, -1), "SE": (1, 1)}
    ref = {}
    for dname, (ux, uy) in dirs.items():
        for lag in (1, 2, 4):
            nb, nv = _neighbor(a, valid, ux * lag, uy * lag)
            sel = valid & nv
            d2 = (nb[sel] - a[sel]) ** 2
            n = int(sel.sum())
            s = int(d2.sum())
            ref[(dname, lag)] = (n, s, s / (2.0 * n))
    got = {(r["direction"], r["lag"]): (r["n_pairs"], r["sum_sq_diff"],
                                        r["gamma"])
           for r in Q.REGISTRY["semivariogram_aniso"][0](
               spark, SF_DIR).collect()}
    assert got == ref


def test_morph_gradient_matches_dense_numpy(spark, dense, geo001_dir):
    a, valid = dense
    m = np.where(valid & (a > 3500), 1, 0)
    mx = np.zeros_like(a)
    mn = np.ones_like(a)
    for dx, dy in ((0, 0), (1, 0), (-1, 0), (0, 1), (0, -1)):
        nb, nv = _neighbor(a, valid, dx, dy)
        nm = np.where(nv & (nb > 3500), 1, 0)
        mx = np.where(nv, np.maximum(mx, nm), mx)
        mn = np.where(nv, np.minimum(mn, nm), mn)
    grad = (mx - mn)[valid]
    ref = {int(g): int((grad == g).sum()) for g in np.unique(grad)}
    got = {r["grad"]: r["n_pixels"] for r in
           Q.REGISTRY["morph_gradient"][0](spark, SF_DIR).collect()}
    assert got == ref


def test_tpi_landform_matches_dense_numpy(spark, dense, geo001_dir):
    a, valid = dense
    s8 = np.zeros_like(a)
    cnt = np.zeros_like(a)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            nb, nv = _neighbor(a, valid, dx, dy)
            s8 += np.where(nv, nb, 0)
            cnt += nv
    interior = valid & (cnt == 8)
    v, s = a[interior], s8[interior]
    lf = np.where(8 * v - s > 2400, 1, np.where(s - 8 * v > 2400, -1, 0))
    ref = {int(c): (int((lf == c).sum()), int(v[lf == c].sum()))
           for c in np.unique(lf)}
    got = {r["landform"]: (r["n_pixels"], r["sum_v"]) for r in
           Q.REGISTRY["tpi_landform"][0](spark, SF_DIR).collect()}
    assert got == ref


def test_class_adjacency_matches_dense_numpy(spark, dense, geo001_dir):
    from collections import Counter
    a, valid = dense
    cls = np.where(valid, a // 1000, -1)
    cens = Counter()
    for dx, dy in ((1, 0), (0, 1)):
        nb, nv = _neighbor(cls, valid, dx, dy)
        ok = valid & nv
        pa, pb = cls[ok], nb[ok]
        lo, hi = np.minimum(pa, pb), np.maximum(pa, pb)
        for x, y in zip(lo.tolist(), hi.tolist()):
            cens[(x, y)] += 1
    ref = dict(cens)
    got = {(r["class_a"], r["class_b"]): r["n_adjacencies"] for r in
           Q.REGISTRY["class_adjacency"][0](spark, SF_DIR).collect()}
    assert got == ref


def _z9(a, valid):
    """z1..z9 int64 arrays + full-9 interior mask (z_k at center +
    (dx, dy) for the 3x3 zid grid)."""
    zs = {}
    cnt = np.zeros_like(a)
    offs = {1: (-1, -1), 2: (0, -1), 3: (1, -1), 4: (-1, 0), 5: (0, 0),
            6: (1, 0), 7: (-1, 1), 8: (0, 1), 9: (1, 1)}
    for zid, (dx, dy) in offs.items():
        nb, nv = _neighbor(a, valid, dx, dy)
        zs[zid] = nb
        cnt += nv
    return zs, valid & (cnt == 9)


def _curv_census(num, den, interior):
    nu, de = num[interior], den[interior]
    cls = np.where(de == 0, 9, np.where(nu > 0, 1, np.where(nu < 0, -1, 0)))
    with np.errstate(all="ignore"):
        cfp = np.where(
            de != 0,
            np.floor(nu.astype(np.float64) / de.astype(np.float64)
                     * 1e6 + 0.5),
            0.0).astype(np.int64)
    return {int(c): (int((cls == c).sum()), int(cfp[cls == c].sum()))
            for c in np.unique(cls)}


def test_profile_curvature_matches_dense_numpy(spark, dense, geo001_dir):
    a, valid = dense
    z, interior = _z9(a, valid)
    num = (2 * (z[4] + z[6] - 2 * z[5]) * (z[6] - z[4]) * (z[6] - z[4])
           + 2 * (z[2] + z[8] - 2 * z[5]) * (z[2] - z[8]) * (z[2] - z[8])
           + (-z[1] + z[3] + z[7] - z[9]) * (z[6] - z[4]) * (z[2] - z[8]))
    den = 200 * ((z[6] - z[4]) * (z[6] - z[4])
                 + (z[2] - z[8]) * (z[2] - z[8]))
    ref = _curv_census(num, den, interior)
    got = {r["curv_class"]: (r["n_pixels"], r["curv_fp_sum"]) for r in
           Q.REGISTRY["profile_curvature"][0](spark, SF_DIR).collect()}
    assert got == ref


def test_plan_curvature_matches_dense_numpy(spark, dense, geo001_dir):
    a, valid = dense
    z, interior = _z9(a, valid)
    num = (2 * (z[4] + z[6] - 2 * z[5]) * (z[2] - z[8]) * (z[2] - z[8])
           + 2 * (z[2] + z[8] - 2 * z[5]) * (z[6] - z[4]) * (z[6] - z[4])
           - (-z[1] + z[3] + z[7] - z[9]) * (z[6] - z[4]) * (z[2] - z[8]))
    den = 200 * ((z[6] - z[4]) * (z[6] - z[4])
                 + (z[2] - z[8]) * (z[2] - z[8]))
    ref = _curv_census(num, den, interior)
    got = {r["curv_class"]: (r["n_pixels"], r["curv_fp_sum"]) for r in
           Q.REGISTRY["plan_curvature"][0](spark, SF_DIR).collect()}
    assert got == ref


@pytest.fixture(scope="module")
def dense_bands(geo001_dir):
    con = duckdb.connect()
    out = {}
    for bd in ("B02", "B03", "B04", "B08"):
        px = con.sql(f"""select gx, gy, value
          from '{geo001_dir}/tile_pixels.parquet'
          where bandset='S2_2020-01-01' and band='{bd}'""").df()
        h, w = int(px.gy.max()) + 1, int(px.gx.max()) + 1
        a = np.full((h, w), -32768, dtype=np.int64)
        a[px.gy, px.gx] = px.value
        out[bd] = a
    return out


def _tile_census(val, ok, t=16):
    """Per-tile (checksum, valid, nodata) dict from a per-pixel value
    array and validity mask."""
    h, w = val.shape
    fp = np.where(ok, np.floor(val * 1e6 + 0.5), 0.0).astype(np.int64)
    ref = {}
    for ty in range(h // t):
        for tx in range(w // t):
            s = (slice(ty * t, (ty + 1) * t), slice(tx * t, (tx + 1) * t))
            nv = int(ok[s].sum())
            ref[(tx, ty)] = (int(fp[s].sum()), nv, t * t - nv)
    return ref


def _spectral_ref_vs_query(spark, name, val, ok):
    ref = _tile_census(val, ok)
    got = {(r["tile_x"], r["tile_y"]): (r["checksum"], r["valid_count"],
                                        r["nodata_count"])
           for r in Q.REGISTRY[name][0](spark, SF_DIR).collect()}
    assert got == ref


def test_evi_index_matches_dense_numpy(spark, dense_bands, geo001_dir):
    b02, b04, b08 = (dense_bands[b] for b in ("B02", "B04", "B08"))
    valid = (b02 != -32768) & (b04 != -32768) & (b08 != -32768)
    den = 2 * b08 + 12 * b04 - 15 * b02 + 20000
    ok = valid & (den > 0)
    with np.errstate(all="ignore"):
        evi = (5.0 * (b08 - b04)) / den.astype(np.float64)
    _spectral_ref_vs_query(spark, "evi_index", evi, ok)


def test_ndwi_index_matches_dense_numpy(spark, dense_bands, geo001_dir):
    g, n = dense_bands["B03"], dense_bands["B08"]
    ok = (g != -32768) & (n != -32768)
    with np.errstate(all="ignore"):
        ndwi = (g - n).astype(np.float64) / (g + n).astype(np.float64)
    _spectral_ref_vs_query(spark, "ndwi_index", ndwi, ok)


def test_brovey_sharpen_matches_dense_numpy(spark, dense_bands, geo001_dir):
    b02, b03, b04, b08 = (dense_bands[b]
                          for b in ("B02", "B03", "B04", "B08"))
    valid = ((b02 != -32768) & (b03 != -32768)
             & (b04 != -32768) & (b08 != -32768))
    den = b04 + b03 + b02
    ok = valid & (den > 0)
    with np.errstate(all="ignore"):
        sharp = (3.0 * b04 * b08) / den.astype(np.float64)
    _spectral_ref_vs_query(spark, "brovey_sharpen", sharp, ok)


def test_multi_scale_tpi_matches_dense_numpy(spark, dense, geo001_dir):
    a, valid = dense
    s8 = np.zeros_like(a)
    c8 = np.zeros_like(a)
    s24 = np.zeros_like(a)
    c24 = np.zeros_like(a)
    for dy in range(-2, 3):
        for dx in range(-2, 3):
            if dx == 0 and dy == 0:
                continue
            nb, nv = _neighbor(a, valid, dx, dy)
            s24 += np.where(nv, nb, 0)
            c24 += nv
            if abs(dx) <= 1 and abs(dy) <= 1:
                s8 += np.where(nv, nb, 0)
                c8 += nv
    interior = valid & (c24 == 24)
    v = a[interior]
    t = 300
    small = np.where(8 * v - s8[interior] > 8 * t, 1,
                     np.where(s8[interior] - 8 * v > 8 * t, -1, 0))
    large = np.where(24 * v - s24[interior] > 24 * t, 1,
                     np.where(s24[interior] - 24 * v > 24 * t, -1, 0))
    ref = {}
    for cs in np.unique(small):
        for cl in np.unique(large[small == cs]):
            sel = (small == cs) & (large == cl)
            ref[(int(cs), int(cl))] = (int(sel.sum()), int(v[sel].sum()))
    got = {(r["landform_small"], r["landform_large"]):
           (r["n_pixels"], r["sum_v"]) for r in
           Q.REGISTRY["multi_scale_tpi"][0](spark, SF_DIR).collect()}
    assert got == ref
