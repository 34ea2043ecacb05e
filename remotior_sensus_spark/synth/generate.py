"""Deterministic synthetic data layer (seed=42 equivalent, RNG-free).

Produces the interleaved-document input mandated by BASELINE.json
``input_hint`` plus the raster/vector fixture tables mirroring the
reference's tests/data (tiny Sentinel-2 crops, roi.gpkg polygons,
spectral_signature_1.csv, reclass.csv — see FIXTURES.md).

Everything is a pure function of integer ids through splitmix64 —
no wall clock, no unseeded RNG (SURVEY.md §7.3 risk 8; the reference
violates determinism in band_combination, we must not).

Tables written per scale factor (``data/geo/sf{sf}/``):
  tiles.parquet           one row per (bandset, band, tile) with
                          ``pixels array<float>`` (row-major y,x)
  tile_pixels.parquet     the SAME pixel data exploded to one row per
                          pixel (bandsets 01+02 only) — the DuckDB
                          oracle's view of the raster
  geometries.parquet      ROI polygons (WKT) with class/macroclass
  geometry_rects.parquet  exact rectangle decomposition of each ROI —
                          lets ANSI SQL express point-in-polygon as
                          range predicates
  documents.parquet       (doc_id, spans array<struct<kind,text,media_ref,offset>>)
  doc_spans.parquet       exploded spans (oracle view)
  signatures.parquet      spectral signature catalog (+ *_long oracle view)
  reclass_rules.parquet   old->new value table incl. 'nan' and condition rows
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from remotior_sensus_spark import NODATA
from remotior_sensus_spark.grid import (
    ORIGIN_X,
    ORIGIN_Y,
    PIXEL_SIZE,
    TILE_PX,
    TILE_SIZE_M,
    cell_prefix,
    morton_key,
)

BANDSETS = ["S2_2020-01-01", "S2_2020-01-02", "S2_2020-01-03"]
BANDS = ["B02", "B03", "B04", "B08"]
# reference: core/configurations.py:278-282 (Sentinel-2 center wavelengths)
WAVELENGTHS = {"B02": 0.490, "B03": 0.560, "B04": 0.665, "B08": 0.842}
GRID_N = {0.001: 16, 0.01: 32, 0.1: 160}
N_CLASSES = 5
NODATA_PCT = 5  # percent of pixels set to nodata

_SM_GAMMA = np.uint64(0x9E3779B97F4B9C15)


def splitmix64(x) -> np.ndarray:
    """Vectorized splitmix64 — the engine's only randomness source."""
    with np.errstate(over="ignore"):
        z = np.asarray(x, dtype=np.uint64) + _SM_GAMMA
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def _h(*parts) -> np.ndarray:
    """Chain-hash integer arrays/scalars into one uint64 stream."""
    acc = np.uint64(42)
    for p in parts:
        with np.errstate(over="ignore"):
            acc = splitmix64(np.asarray(p, dtype=np.uint64) ^ (acc * np.uint64(0x9E3779B1)))
    return acc


def grid_n(sf: float) -> int:
    if sf in GRID_N:
        return GRID_N[sf]
    return max(4, int(round(16 * (sf / 0.001) ** 0.5)))


def n_docs(sf: float) -> int:
    return max(100, int(2_000_000 * sf))


def n_rois(sf: float) -> int:
    return max(20, int(2_000 * sf))


# ---------------------------------------------------------------------------
# tiles
# ---------------------------------------------------------------------------

def tile_pixel_values(bs_idx: int, band_idx: int, tx: np.ndarray, ty: np.ndarray) -> np.ndarray:
    """Pixel payload for a batch of tiles -> float32 array (n, TILE_PX**2).

    value = 100 + h % 4900  (mirrors the reference fixtures' UInt16-ish
    reflectance range); ~5% nodata sentinel -32768 exercises the any/all
    mask semantics (reference: core/processor.py:535-542).
    """
    n = len(tx)
    npx = TILE_PX * TILE_PX
    tile_seed = _h(
        np.full(n, bs_idx * 7919), np.full(n, band_idx * 104729), tx, ty
    )  # (n,)
    idx = np.arange(npx, dtype=np.uint64)
    with np.errstate(over="ignore"):
        hv = splitmix64(tile_seed[:, None] + idx[None, :] * np.uint64(0x9E3779B1))
    vals = (100 + (hv % np.uint64(4900))).astype(np.float32)
    nd = splitmix64(hv ^ np.uint64(0xD1B54A32D192ED03)) % np.uint64(100) < NODATA_PCT
    vals[nd] = NODATA
    return vals


def build_tiles(sf: float, *, skip_exploded: bool = False):
    """tiles + exploded tile_pixels arrow tables.  ``skip_exploded``
    skips BUILDING the oracle view entirely (returns None for it) —
    at sf0.1 the exploded table is 52M rows with two object-dtype
    string columns, minutes of pure-Python conversion that generate()
    was discarding anyway for sf > 0.01."""
    n = grid_n(sf)
    rows = {k: [] for k in (
        "bandset", "band", "wavelength", "tile_x", "tile_y", "cell_key",
        "cell_prefix", "origin_x", "origin_y", "nodata")}
    pixel_arrays = []
    exploded = []

    txg, tyg = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    base_tx, base_ty = txg.ravel(), tyg.ravel()

    for bs_idx, bs in enumerate(BANDSETS):
        # bandset 3 sits on a grid shifted by half the extent — the
        # overlapping-mosaic fixture (reference tests/data S2_2020-01-03)
        off = n // 2 if bs_idx == 2 else 0
        tx, ty = base_tx + off, base_ty + off
        key = morton_key(tx, ty)
        for b_idx, band in enumerate(BANDS):
            m = len(tx)
            rows["bandset"].append(np.full(m, bs, dtype=object))
            rows["band"].append(np.full(m, band, dtype=object))
            rows["wavelength"].append(np.full(m, WAVELENGTHS[band]))
            rows["tile_x"].append(tx)
            rows["tile_y"].append(ty)
            rows["cell_key"].append(key)
            rows["cell_prefix"].append(cell_prefix(key))
            rows["origin_x"].append(ORIGIN_X + tx * TILE_SIZE_M)
            rows["origin_y"].append(ORIGIN_Y - ty * TILE_SIZE_M)
            rows["nodata"].append(np.full(m, NODATA))
            vals = tile_pixel_values(bs_idx, b_idx, tx, ty)
            pixel_arrays.append(vals)
            if bs_idx < 2 and not skip_exploded:  # oracle view: bandsets 01+02
                exploded.append((bs, band, tx, ty, vals))

    cols = {k: np.concatenate(v) for k, v in rows.items()}
    pixels = np.concatenate(pixel_arrays)  # (N, 256) float32
    n_tiles, npx = pixels.shape
    pixels_arr = pa.FixedSizeListArray.from_arrays(
        pa.array(pixels.ravel(), type=pa.float32()), npx
    ).cast(pa.list_(pa.float32()))
    tiles_tbl = pa.table({
        "bandset": pa.array(cols["bandset"], type=pa.string()),
        "band": pa.array(cols["band"], type=pa.string()),
        "wavelength": pa.array(cols["wavelength"], type=pa.float64()),
        "tile_x": pa.array(cols["tile_x"].astype(np.int32)),
        "tile_y": pa.array(cols["tile_y"].astype(np.int32)),
        "cell_key": pa.array(cols["cell_key"].astype(np.int64)),
        "cell_prefix": pa.array(cols["cell_prefix"].astype(np.int64)),
        "origin_x": pa.array(cols["origin_x"], type=pa.float64()),
        "origin_y": pa.array(cols["origin_y"], type=pa.float64()),
        "nodata": pa.array(cols["nodata"], type=pa.float64()),
        "pixels": pixels_arr,
    })

    # exploded oracle view
    if skip_exploded:
        return tiles_tbl, None
    px = np.tile(np.arange(TILE_PX, dtype=np.int32), TILE_PX)
    py = np.repeat(np.arange(TILE_PX, dtype=np.int32), TILE_PX)
    ex_cols = {k: [] for k in ("bandset", "band", "tile_x", "tile_y", "px",
                               "py", "gx", "gy", "cx", "cy", "value")}
    for bs, band, tx, ty, vals in exploded:
        m = len(tx)
        ex_cols["bandset"].append(np.full(m * 256, bs, dtype=object))
        ex_cols["band"].append(np.full(m * 256, band, dtype=object))
        ex_cols["tile_x"].append(np.repeat(tx, 256).astype(np.int32))
        ex_cols["tile_y"].append(np.repeat(ty, 256).astype(np.int32))
        ex_cols["px"].append(np.tile(px, m))
        ex_cols["py"].append(np.tile(py, m))
        gx = np.repeat(tx, 256) * TILE_PX + np.tile(px, m)
        gy = np.repeat(ty, 256) * TILE_PX + np.tile(py, m)
        ex_cols["gx"].append(gx.astype(np.int64))
        ex_cols["gy"].append(gy.astype(np.int64))
        ex_cols["cx"].append(ORIGIN_X + gx * PIXEL_SIZE + PIXEL_SIZE / 2)
        ex_cols["cy"].append(ORIGIN_Y - gy * PIXEL_SIZE - PIXEL_SIZE / 2)
        ex_cols["value"].append(vals.ravel().astype(np.float64))
    pix_tbl = pa.table({k: pa.array(np.concatenate(v)) for k, v in ex_cols.items()})
    return tiles_tbl, pix_tbl


# ---------------------------------------------------------------------------
# geometries (ROIs) — mirrors tests/data/files/roi.gpkg (integer `class`)
# ---------------------------------------------------------------------------

def _rect_wkt(x0, y0, x1, y1):
    return (f"POLYGON (({x0} {y0}, {x1} {y0}, {x1} {y1}, {x0} {y1}, {x0} {y0}))")


def build_geometries(sf: float):
    n = grid_n(sf)
    nr = n_rois(sf)
    extent = n * TILE_SIZE_M
    recs = []   # geometries rows
    rects = []  # rect decomposition rows

    def snap(v):  # multiples of 10 m so pixel centers (≡5 mod 10) never tie
        return float(int(v) // 10 * 10)

    for j in range(nr):
        h = int(_h(j, 1000003))
        klass = 1 + h % N_CLASSES
        macro = 1 + (h >> 8) % 3
        shape = (h >> 16) % 100  # 0-59 rect, 60-84 L, 85-99 multipolygon
        hot = (h >> 24) % 100 < 30  # 30% in the hot cell area (skew fixture)
        if hot:
            ax0, ay1 = 0.0, 0.0  # NW corner of grid
            span = 4 * TILE_SIZE_M
        else:
            ax0 = ((h >> 32) % max(1, int(extent - 6 * TILE_SIZE_M)))
            ay1 = ((h >> 40) % max(1, int(extent - 6 * TILE_SIZE_M)))
            span = 6 * TILE_SIZE_M
        w = 60 + (h >> 48) % int(span)
        ht = 60 + int(_h(j, 7)[()] % np.uint64(int(span)))
        x0 = snap(ORIGIN_X + ax0)
        y1 = snap(ORIGIN_Y - ay1)          # top (max y)
        x1 = snap(min(x0 + w, ORIGIN_X + extent))
        y0 = snap(max(y1 - ht, ORIGIN_Y - extent))
        if x1 <= x0:
            x1 = x0 + 10.0
        if y1 <= y0:
            y0 = y1 - 10.0
        roi_id = f"roi_{j}"
        n_before = len(rects)
        if shape < 60:
            wkt = _rect_wkt(x0, y0, x1, y1)
            rects.append((roi_id, klass, macro, 0, x0, y0, x1, y1))
        elif shape < 85:
            # L-shape: base rect (x0,y0,x1,ym) + tower (x0,ym,xm,y1)
            ym = snap((y0 + y1) / 2)
            xm = snap((x0 + x1) / 2)
            if ym <= y0:
                ym = y0 + 10.0
            if xm <= x0:
                xm = x0 + 10.0
            wkt = (f"POLYGON (({x0} {y0}, {x1} {y0}, {x1} {ym}, {xm} {ym}, "
                   f"{xm} {y1}, {x0} {y1}, {x0} {y0}))")
            rects.append((roi_id, klass, macro, 0, x0, y0, x1, ym))
            if y1 > ym:
                rects.append((roi_id, klass, macro, 1, x0, ym, xm, y1))
        else:
            # multipolygon: 2 disjoint rects
            gap = TILE_SIZE_M
            x2 = snap(x1 + gap)
            x3 = snap(x2 + (x1 - x0))
            wkt = (f"MULTIPOLYGON ((({x0} {y0}, {x1} {y0}, {x1} {y1}, "
                   f"{x0} {y1}, {x0} {y0})), (({x2} {y0}, {x3} {y0}, "
                   f"{x3} {y1}, {x2} {y1}, {x2} {y0})))")
            rects.append((roi_id, klass, macro, 0, x0, y0, x1, y1))
            rects.append((roi_id, klass, macro, 1, x2, y0, x3, y1))
        mine = rects[n_before:]  # only this roi's 1-2 rects (O(1), not
        # an O(n_rois^2) rescan of the whole accumulated list)
        bbox = (min(r[4] for r in mine), min(r[5] for r in mine),
                max(r[6] for r in mine), max(r[7] for r in mine))
        recs.append((roi_id, klass, macro, wkt, *bbox))

    geo_tbl = pa.table({
        "roi_id": pa.array([r[0] for r in recs]),
        "class": pa.array([r[1] for r in recs], type=pa.int32()),
        "macroclass": pa.array([r[2] for r in recs], type=pa.int32()),
        "wkt": pa.array([r[3] for r in recs]),
        "xmin": pa.array([r[4] for r in recs], type=pa.float64()),
        "ymin": pa.array([r[5] for r in recs], type=pa.float64()),
        "xmax": pa.array([r[6] for r in recs], type=pa.float64()),
        "ymax": pa.array([r[7] for r in recs], type=pa.float64()),
    })
    rect_tbl = pa.table({
        "roi_id": pa.array([r[0] for r in rects]),
        "class": pa.array([r[1] for r in rects], type=pa.int32()),
        "macroclass": pa.array([r[2] for r in rects], type=pa.int32()),
        "rect_idx": pa.array([r[3] for r in rects], type=pa.int32()),
        "xmin": pa.array([r[4] for r in rects], type=pa.float64()),
        "ymin": pa.array([r[5] for r in rects], type=pa.float64()),
        "xmax": pa.array([r[6] for r in rects], type=pa.float64()),
        "ymax": pa.array([r[7] for r in rects], type=pa.float64()),
    })
    return geo_tbl, rect_tbl


# ---------------------------------------------------------------------------
# interleaved documents (input_hint shape)
# ---------------------------------------------------------------------------

_LOREM = (
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod "
    "tempor incididunt ut labore et dolore magna aliqua enim ad minim veniam "
    "quis nostrud exercitation ullamco laboris nisi aliquip ex ea commodo "
    "consequat duis aute irure in reprehenderit voluptate velit esse cillum "
    "eu fugiat nulla pariatur excepteur sint occaecat cupidatat non proident "
    "sunt culpa qui officia deserunt mollit anim id est laborum raster tile "
    "band pixel spectral zonal mosaic clip vector polygon cell index join"
).split()


def build_documents(sf: float, geo_tbl):
    """Vectorized document synthesis — numerically identical to the
    original per-doc loop (hash chain, span mix, token choice, offsets
    all reproduce int(_h(...)) semantics elementwise; equivalence is
    pinned by tests/test_synth.py::test_build_documents_vectorization),
    but ~50x faster: at sf0.1 the loop version spent ~10 min in 10M
    scalar _h() calls, which a fresh workspace pays on every first
    bench/test run."""
    nd = n_docs(sf)
    n = grid_n(sf)
    nr = geo_tbl.num_rows
    wkts = geo_tbl.column("wkt").to_pylist()
    V = len(_LOREM)
    lorem = np.array(_LOREM, dtype=object)

    di = np.arange(nd, dtype=np.uint64)
    hv = _h(di, 555)
    nspan = (np.uint64(2) + hv % np.uint64(7)).astype(np.int64)  # 2..8

    # exploded (doc, span) frame
    doc_rep = np.repeat(di, nspan)
    total = int(nspan.sum())
    starts = np.concatenate(([0], np.cumsum(nspan)[:-1]))
    span_idx = np.arange(total, dtype=np.int64) - np.repeat(starts, nspan)
    sh = _h(doc_rep, span_idx.astype(np.uint64), 999331)
    # first span always text; afterwards 50% text / 35% media / 15% geom
    r = np.where(span_idx == 0, 0, (sh % np.uint64(100)).astype(np.int64))
    is_text = r < 50
    is_media = (r >= 50) & (r < 85)
    is_geom = r >= 85

    text_all = np.empty(total, dtype=object)
    ref_all = np.empty(total, dtype=object)

    # text spans: explode to tokens, hash-pick from the lorem pool
    t_pos = np.nonzero(is_text)[0]
    ntok = (np.uint64(5) + (sh[t_pos] >> np.uint64(8)) % np.uint64(8)
            ).astype(np.int64)
    tok_total = int(ntok.sum())
    tok_starts = np.concatenate(([0], np.cumsum(ntok)[:-1]))
    tok_idx = np.arange(tok_total, dtype=np.int64) - np.repeat(tok_starts, ntok)
    tok_h = _h(np.repeat(doc_rep[t_pos], ntok),
               np.repeat(span_idx[t_pos], ntok).astype(np.uint64),
               tok_idx.astype(np.uint64), 77) % np.uint64(V)
    toks = lorem[tok_h.astype(np.int64)]
    bounds = np.concatenate((tok_starts, [tok_total]))
    text_all[t_pos] = [" ".join(toks[a:b])
                       for a, b in zip(bounds[:-1], bounds[1:])]
    ref_all[t_pos] = ""

    # media spans: 20% hit the hot 2x2 NW tile block (skew)
    m_pos = np.nonzero(is_media)[0]
    mh = sh[m_pos]
    hot = ((mh >> np.uint64(16)) % np.uint64(100)) < np.uint64(20)
    tx = np.where(hot, (mh >> np.uint64(24)) % np.uint64(2),
                  (mh >> np.uint64(24)) % np.uint64(n)).astype(np.int64)
    ty = np.where(hot, (mh >> np.uint64(26)) % np.uint64(2),
                  (mh >> np.uint64(40)) % np.uint64(n)).astype(np.int64)
    bs_i = np.where(hot, 0, ((mh >> np.uint64(16)) % np.uint64(2)
                             ).astype(np.int64))
    band_i = np.where(hot, -1, ((mh >> np.uint64(20)) % np.uint64(4)
                                ).astype(np.int64))
    ref_all[m_pos] = [
        f"tile/{BANDSETS[b]}/{'B04' if bi < 0 else BANDS[bi]}/{x}/{y}"
        for b, bi, x, y in zip(bs_i, band_i, tx, ty)]
    text_all[m_pos] = ""

    # geom spans: reference + inline WKT of a synthetic ROI
    g_pos = np.nonzero(is_geom)[0]
    gj = ((sh[g_pos] >> np.uint64(16)) % np.uint64(nr)).astype(np.int64)
    ref_all[g_pos] = [f"roi/roi_{j}" for j in gj]
    text_all[g_pos] = [wkts[j] for j in gj]

    kind_all = np.where(is_text, "text",
                        np.where(is_media, "media", "geom")).astype(object)
    lens = np.fromiter((len(t) for t in text_all), dtype=np.int64,
                       count=total) + 1
    csum = np.concatenate(([0], np.cumsum(lens)[:-1]))
    offset_all = (csum - np.repeat(csum[starts], nspan)).astype(np.int32)

    doc_ids = np.array([f"doc_{i:012d}" for i in range(nd)], dtype=object)
    doc_id_all = np.repeat(doc_ids, nspan)

    span_type = pa.struct([
        ("kind", pa.string()), ("text", pa.string()),
        ("media_ref", pa.string()), ("offset", pa.int32()),
    ])
    struct_arr = pa.StructArray.from_arrays(
        [pa.array(kind_all, type=pa.string()),
         pa.array(text_all, type=pa.string()),
         pa.array(ref_all, type=pa.string()),
         pa.array(offset_all, type=pa.int32())],
        fields=list(span_type),
    )
    list_offsets = pa.array(
        np.concatenate((starts, [total])).astype(np.int32), type=pa.int32())
    docs_tbl = pa.table({
        "doc_id": pa.array(doc_ids, type=pa.string()),
        "spans": pa.ListArray.from_arrays(list_offsets, struct_arr),
    })
    spans_tbl = pa.table({
        "doc_id": pa.array(doc_id_all, type=pa.string()),
        "span_idx": pa.array(span_idx.astype(np.int32), type=pa.int32()),
        "kind": pa.array(kind_all, type=pa.string()),
        "text": pa.array(text_all, type=pa.string()),
        "media_ref": pa.array(ref_all, type=pa.string()),
        "offset": pa.array(offset_all, type=pa.int32()),
    })
    return docs_tbl, spans_tbl


# ---------------------------------------------------------------------------
# signatures + reclass rules (mirror files/spectral_signature_1.csv, reclass.csv)
# ---------------------------------------------------------------------------

def build_signatures():
    rows = {k: [] for k in ("signature_id", "macroclass_id", "class_id",
                            "class_name", "selected", "min_dist_thr",
                            "max_like_thr", "spec_angle_thr")}
    values, wavelengths, stds = [], [], []
    long_rows = {"signature_id": [], "class_id": [], "band": [],
                 "band_idx": [], "value": [], "std": []}
    for c in range(1, N_CLASSES + 1):
        sid = f"sig_{c}"
        rows["signature_id"].append(sid)
        rows["macroclass_id"].append(1 + (c - 1) % 3)
        rows["class_id"].append(c)
        rows["class_name"].append(f"class_{c}")
        rows["selected"].append(1)
        rows["min_dist_thr"].append(0.0)   # 0 = no threshold
        rows["max_like_thr"].append(0.0)
        rows["spec_angle_thr"].append(0.0)
        vals = [float(400 + 870 * c + 137 * b) for b in range(len(BANDS))]
        sds = [float(50 + 10 * c + 3 * b) for b in range(len(BANDS))]
        values.append(vals)
        wavelengths.append([WAVELENGTHS[b] for b in BANDS])
        stds.append(sds)
        for b_idx, band in enumerate(BANDS):
            long_rows["signature_id"].append(sid)
            long_rows["class_id"].append(c)
            long_rows["band"].append(band)
            long_rows["band_idx"].append(b_idx)
            long_rows["value"].append(vals[b_idx])
            long_rows["std"].append(sds[b_idx])
    sig_tbl = pa.table({
        **{k: pa.array(v) for k, v in rows.items()},
        "values": pa.array(values, type=pa.list_(pa.float64())),
        "wavelengths": pa.array(wavelengths, type=pa.list_(pa.float64())),
        "stds": pa.array(stds, type=pa.list_(pa.float64())),
    })
    sig_long = pa.table({k: pa.array(v) for k, v in long_rows.items()})
    return sig_tbl, sig_long


def build_reclass_rules():
    # mirrors tests/data/files/reclass.csv: int rows, a 'nan' row, a
    # condition row ('raster > 500' style, processor_functions.py:1026-1073)
    old = ["1", "2", "3", "4", "nan", "raster > 4000"]
    new = ["10", "20", "30", "40", "0", "9999"]
    return pa.table({"old_value": pa.array(old), "new_value": pa.array(new)})


# ---------------------------------------------------------------------------
# entry point
# ---------------------------------------------------------------------------

def generate(sf: float, out_dir: str, *, skip_exploded: bool = False) -> None:
    os.makedirs(out_dir, exist_ok=True)
    # small row groups keep single files SPLITTABLE for Spark (a single
    # row-group parquet pins all narrow stages to one task)
    tiles_tbl, pix_tbl = build_tiles(sf, skip_exploded=skip_exploded)
    pq.write_table(tiles_tbl, f"{out_dir}/tiles.parquet", compression="zstd",
                   row_group_size=8192)
    if not skip_exploded:
        pq.write_table(pix_tbl, f"{out_dir}/tile_pixels.parquet",
                       compression="zstd", row_group_size=262144)
    geo_tbl, rect_tbl = build_geometries(sf)
    pq.write_table(geo_tbl, f"{out_dir}/geometries.parquet", compression="zstd")
    pq.write_table(rect_tbl, f"{out_dir}/geometry_rects.parquet", compression="zstd")
    docs_tbl, spans_tbl = build_documents(sf, geo_tbl)
    pq.write_table(docs_tbl, f"{out_dir}/documents.parquet", compression="zstd",
                   row_group_size=16384)
    pq.write_table(spans_tbl, f"{out_dir}/doc_spans.parquet", compression="zstd",
                   row_group_size=65536)
    sig_tbl, sig_long = build_signatures()
    pq.write_table(sig_tbl, f"{out_dir}/signatures.parquet", compression="zstd")
    pq.write_table(sig_long, f"{out_dir}/signatures_long.parquet", compression="zstd")
    pq.write_table(build_reclass_rules(), f"{out_dir}/reclass_rules.parquet",
                   compression="zstd")


GEO_ROOT = "/root/repo/data/geo"


def geo_dir(sf: float) -> str:
    return f"{GEO_ROOT}/sf{sf}"


def ensure_geo(sf: float) -> str:
    """Generate-if-missing (deterministic, so lazily materializable)."""
    d = geo_dir(sf)
    if not os.path.exists(f"{d}/tiles.parquet"):
        generate(sf, d, skip_exploded=(sf > 0.01))
    return d


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=0.01)
    ap.add_argument("--out", type=str, default=None)
    a = ap.parse_args()
    generate(a.sf, a.out or geo_dir(a.sf), skip_exploded=(a.sf > 0.01))
    print("wrote", a.out or geo_dir(a.sf))
