"""Geostatistics family vs dense whole-raster numpy oracles.

The DuckDB oracles in queries.py mirror the same algebraic expansions
the operators use, so a shared-formula bug could pass both engines;
these tests recompute each statistic from the FULL assembled raster
with plain dense numpy (shifted views, no tiling, no relational
algebra) and require equality — an independent derivation.
"""

import numpy as np
import pytest

from test_focal_components import full_raster  # noqa: F401


SHIFTS_ROOK = ((1, 0), (-1, 0), (0, 1), (0, -1))
SHIFTS_QUEEN = tuple(
    (dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1) if (dx, dy) != (0, 0)
)


def _neighbor_sums(full, shifts):
    """(s, s2, c) int64 grids: per-cell valid-neighbour value sum,
    sum of squares, and count under the given shift set."""
    valid = ~np.isnan(full)
    v = np.where(valid, full, 0.0).astype(np.int64)
    H, W = full.shape
    s = np.zeros((H, W), dtype=np.int64)
    s2 = np.zeros((H, W), dtype=np.int64)
    c = np.zeros((H, W), dtype=np.int64)
    for dx, dy in shifts:
        # contribution of the neighbour at (x-dx, y-dy) to cell (x, y):
        # a pixel at gx,gy votes into gx+dx,gy+dy (matches the
        # shifted-copy groupBy target key)
        sv = np.zeros((H, W), dtype=np.int64)
        sv2 = np.zeros((H, W), dtype=np.int64)
        sc = np.zeros((H, W), dtype=np.int64)
        ys = slice(max(0, dy), H + min(0, dy))
        xs = slice(max(0, dx), W + min(0, dx))
        ys_src = slice(max(0, -dy), H + min(0, -dy))
        xs_src = slice(max(0, -dx), W + min(0, -dx))
        sv[ys, xs] = np.where(valid, v, 0)[ys_src, xs_src]
        sv2[ys, xs] = np.where(valid, v * v, 0)[ys_src, xs_src]
        sc[ys, xs] = valid[ys_src, xs_src].astype(np.int64)
        s += sv
        s2 += sv2
        c += sc
    return v, valid, s, s2, c


def test_getis_g_dense(spark, geo001_dir):
    from remotior_sensus_spark import queries as Q

    full = full_raster()
    v, valid, s, _, _ = _neighbor_sums(full, SHIFTS_ROOK)
    sum_v = int(v[valid].sum())
    sum_v2 = int((v[valid] ** 2).sum())
    sum_vs = int((v[valid] * s[valid]).sum())
    exp = float(sum_vs) / (float(sum_v) * float(sum_v) - float(sum_v2))

    row = Q.queries()["getis_g"](spark, geo001_dir).collect()[0]
    assert row["n_pixels"] == int(valid.sum())
    assert row["getis_g"] == pytest.approx(exp, rel=1e-12)


def test_tri_ruggedness_dense(spark, geo001_dir):
    from remotior_sensus_spark import queries as Q

    full = full_raster()
    v, valid, s, s2, c = _neighbor_sums(full, SHIFTS_QUEEN)
    keep = valid & (c > 0)
    ss = c[keep] * v[keep] * v[keep] - 2 * v[keep] * s[keep] + s2[keep]
    tri = np.sqrt(ss.astype(np.float64))
    cls = np.floor(tri / 500.0).astype(np.int64)
    fp = np.floor(tri * 1000000.0 + 0.5).astype(np.int64)
    exp = {}
    for k in np.unique(cls):
        m = cls == k
        exp[int(k)] = (int(m.sum()), int(fp[m].sum()))

    got = {
        r["tri_class"]: (r["pixel_count"], r["tri_fp_sum"])
        for r in Q.queries()["tri_ruggedness"](spark, geo001_dir).collect()
    }
    assert got == exp


def test_lisa_quadrants_dense(spark, geo001_dir):
    from remotior_sensus_spark import queries as Q

    full = full_raster()
    v, valid, s, _, c = _neighbor_sums(full, SHIFTS_ROOK)
    n = int(valid.sum())
    sum_v = int(v[valid].sum())
    sum_v2 = int((v[valid] ** 2).sum())
    md = float(sum_v) / float(n)
    m2d = (float(sum_v2) - 2.0 * md * float(sum_v)
           + md * md * float(n)) / float(n)
    a = n * v[valid] - sum_v
    b = n * s[valid] - c[valid] * sum_v
    quad = np.where(
        (a > 0) & (b > 0), "HH",
        np.where((a < 0) & (b < 0), "LL",
                 np.where((a < 0) & (b > 0), "LH",
                          np.where((a > 0) & (b < 0), "HL", "NS"))))
    ii = (v[valid].astype(np.float64) - md) \
        * (s[valid].astype(np.float64) - c[valid].astype(np.float64) * md) \
        / m2d
    fp = np.floor(ii * 1000000.0 + 0.5).astype(np.int64)
    exp = {}
    for qn in np.unique(quad):
        m = quad == qn
        exp[str(qn)] = (int(m.sum()), int(fp[m].sum()))

    got = {
        r["quadrant"]: (r["pixel_count"], r["lisa_fp_sum"])
        for r in Q.queries()["lisa_quadrants"](spark, geo001_dir).collect()
    }
    assert got == exp


def test_focal_majority_dense(spark, geo001_dir):
    from remotior_sensus_spark import queries as Q

    full = full_raster()
    valid = ~np.isnan(full)
    cls = np.where(
        valid, np.floor(np.where(valid, full, 0.0) / 1000.0), -1
    ).astype(np.int64)
    n_cls = int(cls.max()) + 1
    H, W = full.shape
    votes = np.zeros((H, W, n_cls), dtype=np.int64)
    for dx, dy in SHIFTS_QUEEN + ((0, 0),):
        ys = slice(max(0, dy), H + min(0, dy))
        xs = slice(max(0, dx), W + min(0, dx))
        ys_src = slice(max(0, -dy), H + min(0, -dy))
        xs_src = slice(max(0, -dx), W + min(0, -dx))
        for k in range(n_cls):
            votes[ys, xs, k] += ((cls == k) & valid)[ys_src, xs_src]
    # argmax returns the FIRST max index = smallest class on ties
    maj = np.argmax(votes, axis=2)
    exp = {}
    for k in np.unique(maj[valid]):
        exp[int(k)] = int((maj[valid] == k).sum())

    got = {
        r["majority_class"]: r["pixel_count"]
        for r in Q.queries()["focal_majority"](spark, geo001_dir).collect()
    }
    assert got == exp


def test_zonal_entropy_dense(spark, geo001_dir):
    from remotior_sensus_spark import queries as Q

    b02 = full_raster(band_idx=0)
    b04 = full_raster(band_idx=2)
    valid = ~np.isnan(b02) & ~np.isnan(b04)
    zone = np.floor(b02[valid] / 1000.0).astype(np.int64)
    vcls = np.floor(b04[valid] / 1000.0).astype(np.int64)
    exp = {}
    for z in np.unique(zone):
        m = zone == z
        nz = int(m.sum())
        _, counts = np.unique(vcls[m], return_counts=True)
        p = counts.astype(np.float64) / float(nz)
        fp = np.floor(p * np.log(p) * 1000000.0 + 0.5).astype(np.int64)
        exp[int(z)] = (nz, len(counts), int(-fp.sum()))

    got = {
        r["zone"]: (r["n_pixels"], r["n_classes"], r["entropy_fp"])
        for r in Q.queries()["zonal_entropy"](spark, geo001_dir).collect()
    }
    assert got == exp


def test_proximity_bands_dense(spark, geo001_dir):
    from remotior_sensus_spark import queries as Q

    full = full_raster()
    valid = ~np.isnan(full)
    cls = np.floor(np.where(valid, full, 0.0) / 1000.0).astype(np.int64)
    target = valid & (cls == 4)
    H, W = full.shape
    BIG = 10**9
    best = np.full((H, W), BIG, dtype=np.int64)
    for dx in range(-5, 6):
        for dy in range(-5, 6):
            d2 = dx * dx + dy * dy
            if d2 > 25:
                continue
            ys = slice(max(0, dy), H + min(0, dy))
            xs = slice(max(0, dx), W + min(0, dx))
            ys_src = slice(max(0, -dy), H + min(0, -dy))
            xs_src = slice(max(0, -dx), W + min(0, -dx))
            hit = np.zeros((H, W), dtype=bool)
            hit[ys, xs] = target[ys_src, xs_src]
            best = np.where(hit & (d2 < best), d2, best)
    band = np.where(best[valid] < BIG,
                    np.floor(np.sqrt(best[valid].astype(np.float64))), -1
                    ).astype(np.int64)
    exp = {}
    for k in np.unique(band):
        exp[int(k)] = int((band == k).sum())

    got = {
        r["dist_class"]: r["pixel_count"]
        for r in Q.queries()["proximity_bands"](spark, geo001_dir).collect()
    }
    assert got == exp


def test_histogram_match_dense(spark, geo001_dir):
    """Independent numpy histogram-matching oracle: integer
    cross-multiplied CDF quantile mapping, then the matched histogram."""
    from remotior_sensus_spark import queries as Q

    src = full_raster(bs_idx=1, band_idx=2)
    ref = full_raster(bs_idx=0, band_idx=2)
    sv = src[~np.isnan(src)].astype(np.int64)
    rv = ref[~np.isnan(ref)].astype(np.int64)
    s_vals, s_cnt = np.unique(sv, return_counts=True)
    r_vals, r_cnt = np.unique(rv, return_counts=True)
    cs, ts = np.cumsum(s_cnt), sv.size
    cr, tr = np.cumsum(r_cnt), rv.size
    # smallest ref value whose quantile reaches the source quantile
    lut = {}
    for v, c in zip(s_vals, cs):
        idx = np.searchsorted(cr * ts, c * tr, side="left")
        lut[int(v)] = int(r_vals[idx])
    mapped = np.array([lut[int(v)] for v in sv], dtype=np.int64)
    exp = {}
    for k in np.unique(mapped // 1000):
        m = (mapped // 1000) == k
        exp[int(k)] = (int(m.sum()), int(mapped[m].sum()))

    got = {
        r["matched_class"]: (r["pixel_count"], r["mapped_sum"])
        for r in Q.queries()["histogram_match"](spark, geo001_dir).collect()
    }
    assert got == exp


def test_band_correlation_dense(spark, geo001_dir):
    from remotior_sensus_spark import queries as Q

    bands = [full_raster(band_idx=i) for i in range(4)]
    valid = np.ones_like(bands[0], dtype=bool)
    for b in bands:
        valid &= ~np.isnan(b)
    v = [b[valid].astype(np.int64) for b in bands]
    n = float(valid.sum())
    names = ["B02", "B03", "B04", "B08"]
    exp = {}
    for i in range(4):
        for j in range(4):
            sx, sy = float(v[i].sum()), float(v[j].sum())
            sxy = float((v[i] * v[j]).sum())
            sxx = float((v[i] * v[i]).sum())
            syy = float((v[j] * v[j]).sum())
            exp[(names[i], names[j])] = (n * sxy - sx * sy) / (
                np.sqrt(n * sxx - sx * sx) * np.sqrt(n * syy - sy * sy))

    rows = Q.queries()["band_correlation"](spark, geo001_dir).collect()
    assert len(rows) == 16
    for r in rows:
        assert abs(r["correlation"] - exp[(r["band_i"], r["band_j"])]) < 1e-12
        if r["band_i"] == r["band_j"]:
            # sqrt(x)*sqrt(x) != x in general, so the diagonal is ~1
            # within one ulp of the shared op sequence, not exactly 1
            assert abs(r["correlation"] - 1.0) < 1e-12


def test_glcm_texture_dense(spark, geo001_dir):
    from remotior_sensus_spark import queries as Q

    full = full_raster()
    valid = ~np.isnan(full)
    cls = np.floor(np.where(valid, full, 0.0) / 500.0).astype(np.int64)
    a_ok = valid[:, :-1] & valid[:, 1:]
    ca = cls[:, :-1][a_ok]
    cb = cls[:, 1:][a_ok]
    keys, cnt = np.unique(ca * 100000 + cb, return_counts=True)
    ka, kb = keys // 100000, keys % 100000
    d2 = (ka - kb) ** 2
    n_pairs = int(cnt.sum())
    contrast = float((cnt * d2).sum()) / float(n_pairs)
    energy = float((cnt.astype(np.float64) ** 2).sum()) / float(n_pairs) ** 2
    hfp = int(np.floor(cnt.astype(np.float64) / (1.0 + d2.astype(np.float64))
                       * 1000000.0 + 0.5).astype(np.int64).sum())

    r = Q.queries()["glcm_texture"](spark, geo001_dir).collect()[0]
    assert r["n_pairs"] == n_pairs
    assert abs(r["contrast"] - contrast) < 1e-12
    assert abs(r["energy"] - energy) < 1e-15
    assert r["homogeneity_fp"] == hfp


def test_accuracy_area_dense(spark, geo001_dir):
    """Independent numpy Olofsson (2014) oracle: systematic-sample
    error matrix, full-map stratum weights, per-term fixed point."""
    from remotior_sensus_spark import queries as Q

    b02 = full_raster(band_idx=0)
    b04 = full_raster(band_idx=2)
    valid = ~np.isnan(b02) & ~np.isnan(b04)
    H, W = b02.shape
    yy, xx = np.mgrid[0:H, 0:W]
    mapc = np.floor(np.where(valid, b04, 0) / 1000.0).astype(np.int64)
    refc = np.floor(np.where(valid, b02, 0) / 1000.0).astype(np.int64)
    samp = valid & (((xx + yy) % 7) == 0)

    n_full = int(valid.sum())
    ni_full = {int(k): int((valid & (mapc == k)).sum())
               for k in np.unique(mapc[valid])}
    ni = {int(k): int((samp & (mapc == k)).sum())
          for k in np.unique(mapc[samp])}
    exp = {}
    for i in ni:
        w = ni_full[i] / n_full
        for jj in np.unique(refc[samp & (mapc == i)]):
            nij = int((samp & (mapc == i) & (refc == jj)).sum())
            q = nij / ni[i]
            at = int(np.floor(w * q * 1000000.0 + 0.5))
            vt = int(np.floor(w * w * q * (1.0 - q) / (ni[i] - 1.0)
                              * 1e12 + 0.5))
            c, a, v_ = exp.get(int(jj), (0, 0, 0))
            exp[int(jj)] = (c + nij, a + at, v_ + vt)

    got = {
        r["ref_cls"]: (r["sample_count"], r["area_prop_fp"],
                       r["variance_fp12"])
        for r in Q.queries()["accuracy_area"](spark, geo001_dir).collect()
    }
    assert got == exp


# ---------------------------------------------------------------------------
# Viewshed (bounded-radius R3 sampled LOS)
# ---------------------------------------------------------------------------

def _vs_minor(m, i, d):
    if m >= 0:
        return (2 * m * i + d) // (2 * d)
    return -((2 * (-m) * i + d) // (2 * d))


def _brute_viewshed(r, radius, obs_min):
    """Per-pixel pure-Python reference — literal (observer, target,
    step) triple loop, a THIRD structure next to the engine's
    per-observer flat gathers and the dense per-offset builder.
    Returns {(y, x): n_visible} over valid cells."""
    H, W = r.shape
    valid = ~np.isnan(r)
    zq = {}
    for y in range(H):
        for x in range(W):
            if valid[y, x]:
                zq[(y, x)] = int(np.rint(r[y, x] * 1_000_000))
    obs = [(y, x) for (y, x), z in zq.items()
           if z >= obs_min * 1_000_000]
    counts = {k: 0 for k in zq}
    for (oy, ox) in obs:
        z_o = zq[(oy, ox)]
        for dy in range(-radius, radius + 1):
            for dx in range(-radius, radius + 1):
                ty, tx = oy + dy, ox + dx
                if (ty, tx) not in zq:
                    continue
                d = max(abs(dy), abs(dx))
                if d == 0:
                    counts[(ty, tx)] += 1
                    continue
                z_t = zq[(ty, tx)]
                vis = True
                for i in range(1, d):
                    if abs(dy) >= abs(dx):
                        py = i if dy > 0 else -i
                        px = _vs_minor(dx, i, d)
                    else:
                        px = i if dx > 0 else -i
                        py = _vs_minor(dy, i, d)
                    p = (oy + py, ox + px)
                    z_p = zq.get(p)
                    if z_p is None:          # nodata: opaque
                        vis = False
                        break
                    if (z_p - z_o) * d >= (z_t - z_o) * i:
                        vis = False
                        break
                if vis:
                    counts[(ty, tx)] += 1
    return counts


def _vs_census(counts):
    out = {}
    for v in counts.values():
        out[v] = out.get(v, 0) + 1
    return out


def _vs_raster(h, w, seed=7):
    """Viewshed stress terrain: rolling hills with several sharp peaks
    (observers), a tall ridge WALL that splits visibility, and NaN
    holes (opaque) — peaks placed near tile borders so cross-tile
    sightlines are exercised."""
    rng = np.random.RandomState(seed)
    ys, xs = np.mgrid[0:h, 0:w]
    r = (1000.0 + 300.0 * np.sin(ys / 7.0) * np.cos(xs / 9.0)
         + rng.randint(0, 80, (h, w))).astype(float)
    r[:, w // 2] = 4000.0                   # ridge wall
    for (y, x) in ((15, 15), (16, 33), (31, 17), (h - 2, w - 2),
                   (0, 3), (17, w // 2)):   # peak ON the wall too
        r[y, x] = 4500.0
    r[rng.rand(h, w) < 0.02] = np.nan
    return r


def test_spark_viewshed_matches_brute(spark):
    import sys
    sys.path.insert(0, "tests")
    from test_hydrology import _tiles_df
    from remotior_sensus_spark.operators.geostats import viewshed_tiles

    r = _vs_raster(48, 48)
    got = {row["n_visible"]: row["n_pixels"] for row in viewshed_tiles(
        _tiles_df(spark, r, 16), radius=8, obs_min=4400.0,
        tile_px=16).collect()}
    want = _vs_census(_brute_viewshed(r, 8, 4400.0))
    assert got == want
    # the wall actually splits visibility and peaks see across tiles
    assert max(got) >= 2 and 0 in got


def test_spark_viewshed_tile_size_invariance(spark):
    import sys
    sys.path.insert(0, "tests")
    from test_hydrology import _tiles_df
    from remotior_sensus_spark.operators.geostats import viewshed_tiles

    r = _vs_raster(128, 128, seed=13)
    c16 = {row["n_visible"]: row["n_pixels"] for row in viewshed_tiles(
        _tiles_df(spark, r, 16), radius=8, obs_min=4400.0,
        tile_px=16).collect()}
    c64 = {row["n_visible"]: row["n_pixels"] for row in viewshed_tiles(
        _tiles_df(spark, r, 64), radius=8, obs_min=4400.0,
        tile_px=64).collect()}
    assert c16 == c64


def test_viewshed_radius_guard():
    from remotior_sensus_spark.operators.geostats import viewshed_tiles

    with pytest.raises(ValueError, match="2\\*radius"):
        viewshed_tiles(None, radius=33, tile_px=64)


# ---------------------------------------------------------------------------
# Openness (8-direction horizon slopes)
# ---------------------------------------------------------------------------

def _brute_openness(r, radius):
    """Per-pixel pure-Python openness: literal (cell, direction, step)
    triple loop with Python int // (floor) arithmetic."""
    H, W = r.shape
    counts = {}
    for y in range(H):
        for x in range(W):
            if np.isnan(r[y, x]):
                continue
            z_o = int(np.rint(r[y, x] * 1_000_000))
            score = 0
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    if (dy, dx) == (0, 0):
                        continue
                    best = None
                    for i in range(1, radius + 1):
                        py, px = y + i * dy, x + i * dx
                        if not (0 <= py < H and 0 <= px < W):
                            continue
                        if np.isnan(r[py, px]):
                            continue
                        z_p = int(np.rint(r[py, px] * 1_000_000))
                        s = (z_p - z_o) * 1024 // i
                        if best is None or s > best:
                            best = s
                    score += best or 0
            if score == 0:
                b = 0
            else:
                b = int(abs(score)).bit_length()
                b = b if score > 0 else -b
            counts[b] = counts.get(b, 0) + 1
    return counts


def test_spark_openness_matches_brute(spark):
    import sys
    sys.path.insert(0, "tests")
    from test_hydrology import _tiles_df
    from remotior_sensus_spark.operators.geostats import openness_tiles

    r = _vs_raster(48, 48, seed=19)       # hills + wall + NaN holes
    got = {row["open_band"]: row["n_pixels"] for row in openness_tiles(
        _tiles_df(spark, r, 16), radius=8, tile_px=16).collect()}
    want = _brute_openness(r, 8)
    assert got == want
    # terrain produces both enclosed (positive) and open (negative)
    assert any(b > 0 for b in got) and any(b < 0 for b in got)


def test_spark_openness_tile_size_invariance(spark):
    import sys
    sys.path.insert(0, "tests")
    from test_hydrology import _tiles_df
    from remotior_sensus_spark.operators.geostats import openness_tiles

    r = _vs_raster(128, 128, seed=23)
    c16 = {row["open_band"]: row["n_pixels"] for row in openness_tiles(
        _tiles_df(spark, r, 16), radius=8, tile_px=16).collect()}
    c64 = {row["open_band"]: row["n_pixels"] for row in openness_tiles(
        _tiles_df(spark, r, 64), radius=8, tile_px=64).collect()}
    assert c16 == c64


def test_openness_radius_guard():
    from remotior_sensus_spark.operators.geostats import openness_tiles

    with pytest.raises(ValueError, match="radius <="):
        openness_tiles(None, radius=65, tile_px=64)


# ---------------------------------------------------------------------------
# Geomorphons
# ---------------------------------------------------------------------------

def _brute_geomorphon(r, radius, t=18):
    """Per-pixel pure-Python geomorphon: literal (cell, direction,
    step) loops, Python int // arithmetic, same LUT from the paper."""
    LUT = [
        [1, 1, 1, 8, 8, 9, 9, 9, 10],
        [1, 1, 8, 8, 8, 9, 9, 9, 0],
        [1, 4, 6, 6, 7, 7, 9, 0, 0],
        [4, 4, 6, 6, 6, 7, 0, 0, 0],
        [4, 4, 5, 6, 6, 0, 0, 0, 0],
        [3, 3, 5, 5, 0, 0, 0, 0, 0],
        [3, 3, 3, 0, 0, 0, 0, 0, 0],
        [3, 3, 0, 0, 0, 0, 0, 0, 0],
        [2, 0, 0, 0, 0, 0, 0, 0, 0],
    ]
    H, W = r.shape
    counts = {}
    for y in range(H):
        for x in range(W):
            if np.isnan(r[y, x]):
                continue
            z_o = int(np.rint(r[y, x] * 1_000_000))
            p = m = 0
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    if (dy, dx) == (0, 0):
                        continue
                    zen = nad = None
                    for i in range(1, radius + 1):
                        py, px = y + i * dy, x + i * dx
                        if not (0 <= py < H and 0 <= px < W):
                            continue
                        if np.isnan(r[py, px]):
                            continue
                        z_p = int(np.rint(r[py, px] * 1_000_000))
                        s = (z_p - z_o) * 1024 // i
                        zen = s if zen is None else max(zen, s)
                        nad = s if nad is None else min(nad, s)
                    zv = zen if zen is not None else 0
                    nv = -nad if nad is not None else 0
                    if zv > t and zv > nv:
                        p += 1
                    elif nv > t and nv > zv:
                        m += 1
            lf = LUT[m][p]
            counts[lf] = counts.get(lf, 0) + 1
    return counts


def test_spark_geomorphon_matches_brute(spark):
    import sys
    sys.path.insert(0, "tests")
    from test_hydrology import _tiles_df
    from remotior_sensus_spark.operators.geostats import geomorphon_tiles

    r = _vs_raster(48, 48, seed=29)
    got = {row["landform"]: row["n_pixels"] for row in geomorphon_tiles(
        _tiles_df(spark, r, 16), radius=8, tile_px=16).collect()}
    want = _brute_geomorphon(r, 8)
    assert got == want
    assert len(got) >= 4       # hills+wall+holes produce real variety
    assert 0 not in got        # the impossible corner never fires


def test_spark_geomorphon_tile_size_invariance(spark):
    import sys
    sys.path.insert(0, "tests")
    from test_hydrology import _tiles_df
    from remotior_sensus_spark.operators.geostats import geomorphon_tiles

    r = _vs_raster(128, 128, seed=31)
    c16 = {row["landform"]: row["n_pixels"] for row in geomorphon_tiles(
        _tiles_df(spark, r, 16), radius=8, tile_px=16).collect()}
    c64 = {row["landform"]: row["n_pixels"] for row in geomorphon_tiles(
        _tiles_df(spark, r, 64), radius=8, tile_px=64).collect()}
    assert c16 == c64


def test_morans_correlogram_dense(spark, geo001_dir):
    """Per-lag Moran's I vs a dense whole-raster rebuild, plus the
    lag-1 row cross-checked bit-for-bit against the standalone
    morans_i query (identical weights => identical doubles)."""
    from remotior_sensus_spark import queries as Q

    full = full_raster()
    got = {r["lag"]: r for r in
           Q.queries()["morans_correlogram"](spark, geo001_dir).collect()}
    assert set(got) == {1, 2, 4, 8}
    for h in (1, 2, 4, 8):
        v, valid, s, _, c = _neighbor_sums(
            full, [(h, 0), (-h, 0), (0, h), (0, -h)])
        n = int(valid.sum())
        sum_v = int(v[valid].sum())
        sum_v2 = int((v[valid] ** 2).sum())
        sum_vs = int((v[valid] * s[valid]).sum())
        sum_vc = int((v[valid] * c[valid]).sum())
        sum_s = int(s[valid].sum())
        sum_c = int(c[valid].sum())
        m = sum_v / n
        num = sum_vs - m * sum_vc - m * sum_s + m * m * sum_c
        den = sum_v2 - 2.0 * m * sum_v + m * m * n
        exp = (n / sum_c) * (num / den)
        r = got[h]
        assert r["n_pixels"] == n and r["w_sum"] == sum_c
        assert r["morans_i"] == pytest.approx(exp, rel=1e-12)
    # autocorrelation must decay with lag on the correlated field
    assert got[1]["morans_i"] > got[8]["morans_i"]
    base = Q.queries()["morans_i"](spark, geo001_dir).collect()[0]
    assert got[1]["n_pixels"] == base["n_pixels"]
    assert got[1]["w_sum"] == base["w_sum"]
    assert got[1]["morans_i"] == base["morans_i"]


def test_marching_cells_hand_cases():
    """Hand-computed single-cell configurations: corner case, both
    saddle resolutions, and the no-crossing cells."""
    import math
    from remotior_sensus_spark.operators.geostats import _marching_cells

    def cell(tl, tr, bl, br, level):
        mk = lambda v: np.array([[float(v)]])
        return _marching_cells(mk(tl), mk(tr), mk(bl), mk(br), level)

    fp = lambda ln: int(math.floor(ln * 1048576.0 + 0.5))
    half_diag = math.sqrt(0.5 * 0.5 + 0.5 * 0.5)
    # single >= corner: one segment top(0.5,0)-left(0,0.5)
    assert cell(2000, 0, 0, 0, 1000.0) == (1, fp(half_diag))
    # full cell above / below: nothing
    assert cell(2000, 2000, 2000, 2000, 1000.0) == (0, 0)
    assert cell(0, 0, 0, 0, 1000.0) == (0, 0)
    # nan corner: nothing
    assert cell(float("nan"), 2000, 0, 0, 1000.0) == (0, 0)
    # vertical split tl,bl >= : segment top(0.5,0)-bottom(0.5,1), len 1
    assert cell(2000, 0, 2000, 0, 1000.0) == (1, fp(1.0))
    # saddle, center >= level (mean 1000 >= 1000): (t,r)+(l,b)
    assert cell(2000, 0, 0, 2000, 1000.0) == (2, 2 * fp(half_diag))
    # saddle, center < level: (t,l)+(r,b) with crossings at 1/3
    third_diag = math.sqrt((1 / 3) ** 2 + (1 / 3) ** 2)
    assert cell(1500, 0, 0, 1500, 1000.0) == (2, 2 * fp(third_diag))


def test_contour_census_tile_invariance_and_scalar_reference(spark):
    """16-px vs 64-px tiling must agree exactly, and both must match a
    scalar per-cell loop written against the same public definition
    (third formulation next to the engine's vectorized crossing pairs
    and the oracle's 16-case table)."""
    import math
    import sys
    sys.path.insert(0, "tests")
    from test_hydrology import _tiles_df
    from remotior_sensus_spark.operators.geostats import (
        contour_census_tiles)

    r = _vs_raster(64, 64, seed=13)
    lv = 1100.0
    # scalar reference: enumerate crossings per cell
    n_ref, s_ref = 0, 0
    for y in range(63):
        for x in range(63):
            quad = [r[y, x], r[y, x + 1], r[y + 1, x], r[y + 1, x + 1]]
            if any(math.isnan(v) for v in quad):
                continue
            tl, tr, bl, br = quad
            pts = []
            if (tl >= lv) != (tr >= lv):
                pts.append(((lv - tl) / (tr - tl), 0.0, "t"))
            if (tr >= lv) != (br >= lv):
                pts.append((1.0, (lv - tr) / (br - tr), "r"))
            if (bl >= lv) != (br >= lv):
                pts.append(((lv - bl) / (br - bl), 1.0, "b"))
            if (tl >= lv) != (bl >= lv):
                pts.append((0.0, (lv - tl) / (bl - tl), "l"))
            by = {e: (x_, y_) for x_, y_, e in pts}
            if len(pts) == 2:
                (x1, y1, _), (x2, y2, _) = pts
                segs = [((x1, y1), (x2, y2))]
            elif len(pts) == 4:
                hi = tl + tr + bl + br >= 4.0 * lv
                if (tl >= lv and hi) or (tr >= lv and not hi):
                    pair_names = [("t", "r"), ("l", "b")]
                else:
                    pair_names = [("t", "l"), ("r", "b")]
                segs = [(by[a], by[b]) for a, b in pair_names]
            else:
                segs = []
            for (x1, y1), (x2, y2) in segs:
                dx, dy = x1 - x2, y1 - y2
                n_ref += 1
                s_ref += int(math.floor(
                    math.sqrt(dx * dx + dy * dy) * 1048576.0 + 0.5))

    got16 = {row["level"]: (row["n_segments"], row["sum_len_fp"])
             for row in contour_census_tiles(
                 _tiles_df(spark, r, 16), levels=(lv,),
                 tile_px=16).collect()}
    got64 = {row["level"]: (row["n_segments"], row["sum_len_fp"])
             for row in contour_census_tiles(
                 _tiles_df(spark, r, 64), levels=(lv,),
                 tile_px=64).collect()}
    assert got16 == got64 == {int(lv): (n_ref, s_ref)}
    assert n_ref > 100  # the terrain really produces contours


def test_gearys_correlogram_dense(spark, geo001_dir):
    """Per-lag Geary's C vs a dense rebuild, lag-1 cross-checked
    against the standalone gearys_c query (different pair-sum
    formulation — exact int Σd² here vs the algebraic double
    expansion there — so approx, not bit-equal), and the
    contrast-growth direction asserted."""
    from remotior_sensus_spark import queries as Q

    full = full_raster()
    got = {r["lag"]: r for r in
           Q.queries()["gearys_correlogram"](spark, geo001_dir).collect()}
    assert set(got) == {1, 2, 4, 8}
    for h in (1, 2, 4, 8):
        v, valid, s, s2, c = _neighbor_sums(
            full, [(h, 0), (-h, 0), (0, h), (0, -h)])
        n = int(valid.sum())
        sum_v = int(v[valid].sum())
        sum_v2 = int((v[valid] ** 2).sum())
        # exact integer pair sum of squared differences
        d2 = int((c[valid] * v[valid] * v[valid]).sum()
                 - 2 * (v[valid] * s[valid]).sum() + s2[valid].sum())
        w = int(c[valid].sum())
        m = sum_v / n
        ssz = sum_v2 - 2.0 * m * sum_v + m * m * n
        exp = ((n - 1.0) * d2) / (2.0 * w * ssz)
        r = got[h]
        assert r["n_pixels"] == n and r["w_sum"] == w
        assert r["gearys_c"] == pytest.approx(exp, rel=1e-12)
    base = Q.queries()["gearys_c"](spark, geo001_dir).collect()[0]
    assert got[1]["w_sum"] == base["w_sum"]
    assert got[1]["gearys_c"] == pytest.approx(base["gearys_c"],
                                               rel=1e-12)
    # contrast grows with lag on the correlated field (c -> 1+)
    assert got[1]["gearys_c"] < got[8]["gearys_c"]


def test_box_counting_dense(spark, geo001_dir):
    """Occupied-box counts vs a dense numpy unique rebuild, plus the
    monotone N(s) >= N(2s) >= N(s)/4 sandwich every true box count
    obeys."""
    from remotior_sensus_spark import queries as Q

    full = full_raster()
    mask = ~np.isnan(full) & (full >= 3000.0)
    ys, xs = np.nonzero(mask)
    exp = {}
    for s in (1, 2, 4, 8, 16):
        exp[s] = len(np.unique((ys // s).astype(np.int64) * (1 << 32)
                               + (xs // s)))
    got = {r["scale"]: r["n_boxes"] for r in
           Q.queries()["box_counting"](spark, geo001_dir).collect()}
    assert got == exp
    for s in (1, 2, 4, 8):
        assert got[2 * s] <= got[s] <= 4 * got[2 * s]


def test_lacunarity_dense(spark, geo001_dir):
    """Λ(s) vs a dense numpy block-sum rebuild, plus the scale-decay
    property (aggregating boxes smooths gaps, so Λ decreases with s
    toward 1/p)."""
    from remotior_sensus_spark import queries as Q

    full = full_raster()
    mask = (~np.isnan(full) & (full >= 3000.0)).astype(np.int64)
    H, W = mask.shape
    exp = {}
    for s in (2, 4, 8, 16):
        hb = -(-H // s)
        wb = -(-W // s)
        padded = np.zeros((hb * s, wb * s), dtype=np.int64)
        padded[:H, :W] = mask
        m = padded.reshape(hb, s, wb, s).sum(axis=(1, 3))
        nb = hb * wb
        occ = int((m > 0).sum())
        sm = int(m.sum())
        sq = int((m.astype(np.int64) ** 2).sum())
        exp[s] = (nb, occ, sm, sq, (float(nb) * float(sq))
                  / (float(sm) * float(sm)))
    got = {r["scale"]: (r["n_boxes"], r["occupied_boxes"],
                        r["sum_mass"], r["sum_mass_sq"],
                        r["lacunarity"])
           for r in Q.queries()["lacunarity"](
               spark, geo001_dir).collect()}
    for s in exp:
        assert got[s][:4] == exp[s][:4], s
        assert got[s][4] == pytest.approx(exp[s][4], rel=1e-12), s
    assert got[2][4] > got[16][4] > 1.0


def test_focal_majority_halo_parity(spark, geo001_dir):
    """The r06 focal-halo majority kernel is bit-equal to the
    relational BIGINT-argmax twin (same ord encoding, same vote set)."""
    from pyspark.sql import functions as F

    from remotior_sensus_spark import queries as Q
    from remotior_sensus_spark.operators import aggregates as agg
    from remotior_sensus_spark.operators import geostats

    b04 = spark.read.parquet(f"{geo001_dir}/tiles.parquet").filter(
        (F.col("bandset") == "S2_2020-01-01") & (F.col("band") == "B04"))
    rel = {r["majority_class"]: r["pixel_count"] for r in
           geostats.focal_majority(agg.explode_pixels(b04)).collect()}
    got = {r["majority_class"]: r["pixel_count"] for r in
           geostats.focal_majority_tiles(b04, tile_px=16).collect()}
    assert got == rel


def test_proximity_halo_parity(spark, geo001_dir):
    """The r06 focal-halo bounded distance transform is bit-equal to
    the relational disk-explode twin."""
    from pyspark.sql import functions as F

    from remotior_sensus_spark.operators import aggregates as agg
    from remotior_sensus_spark.operators import geostats

    b04 = spark.read.parquet(f"{geo001_dir}/tiles.parquet").filter(
        (F.col("bandset") == "S2_2020-01-01") & (F.col("band") == "B04"))
    rel = {r["dist_class"]: r["pixel_count"] for r in
           geostats.proximity_classes(agg.explode_pixels(b04)).collect()}
    got = {r["dist_class"]: r["pixel_count"] for r in
           geostats.proximity_classes_tiles(b04, tile_px=16).collect()}
    assert got == rel


def test_tri_halo_parity(spark, geo001_dir):
    from pyspark.sql import functions as F

    from remotior_sensus_spark.operators import aggregates as agg
    from remotior_sensus_spark.operators import geostats

    b04 = spark.read.parquet(f"{geo001_dir}/tiles.parquet").filter(
        (F.col("bandset") == "S2_2020-01-01") & (F.col("band") == "B04"))
    rel = {r["tri_class"]: (r["pixel_count"], r["tri_fp_sum"]) for r in
           geostats.tri_classes(agg.explode_pixels(b04)).collect()}
    got = {r["tri_class"]: (r["pixel_count"], r["tri_fp_sum"]) for r in
           geostats.tri_classes_tiles(b04, tile_px=16).collect()}
    assert got == rel


def test_lisa_halo_parity(spark, geo001_dir):
    from pyspark.sql import functions as F

    from remotior_sensus_spark.operators import aggregates as agg
    from remotior_sensus_spark.operators import geostats

    b04 = spark.read.parquet(f"{geo001_dir}/tiles.parquet").filter(
        (F.col("bandset") == "S2_2020-01-01") & (F.col("band") == "B04"))
    rel = {r["quadrant"]: (r["pixel_count"], r["lisa_fp_sum"]) for r in
           geostats.lisa_quadrants(agg.explode_pixels(b04)).collect()}
    got = {r["quadrant"]: (r["pixel_count"], r["lisa_fp_sum"]) for r in
           geostats.lisa_quadrants_tiles(b04, tile_px=16).collect()}
    assert got == rel


def test_semivariogram_halo_parity(spark, geo001_dir):
    from pyspark.sql import functions as F

    from remotior_sensus_spark.operators import aggregates as agg
    from remotior_sensus_spark.operators import geostats

    b04 = spark.read.parquet(f"{geo001_dir}/tiles.parquet").filter(
        (F.col("bandset") == "S2_2020-01-01") & (F.col("band") == "B04"))
    rel = {r["lag"]: (r["n_pairs"], r["sum_sq_diff"], r["gamma"]) for r in
           geostats.semivariogram(agg.explode_pixels(b04)).collect()}
    got = {r["lag"]: (r["n_pairs"], r["sum_sq_diff"], r["gamma"]) for r in
           geostats.semivariogram_tiles(b04, tile_px=16).collect()}
    assert got == rel
