"""Geostatistics over the pixel grid: global Moran's I spatial
autocorrelation (rook contiguity) and an experimental semivariogram.

Reference scope: remotior_sensus users compute these on its rasters
with external geostatistics tooling; the formulas are textbook public
knowledge (Moran 1950; Matheron 1963).  Re-expressed Spark-first.

Determinism strategy: every aggregate is an EXACT integer sum over
integer-valued DNs (order-independent under any partitioning), and the
final statistic is a short fixed sequence of double ops on those
scalars — so Spark and the DuckDB oracle agree bit-for-bit without any
fixed-point rounding.  The cross-product term uses the algebraic
expansion
  sum_i (v_i - m)(S_i - c_i m)
    = sum(v_i S_i) - m sum(v_i c_i) - m sum(S_i) + m^2 sum(c_i)
(S_i / c_i = rook-neighbor value-sum / count), which needs only
integer sums; v*S stays well inside int64 at fixture DN ranges (1e4 *
4e4 * n_px) — at larger scale, widen to DECIMAL sums.

Scale shape: ONE shuffle each — the shifted-copy group-by (explode 4
offsets map-side, hash-aggregate on the target coordinate) that every
focal oracle uses, followed by a co-partitioned join back to the pixel
stream; no pairwise self-join ever materializes more than one row per
(pixel, offset).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from remotior_sensus_spark import NODATA
from remotior_sensus_spark.grid import TILE_PX


def _valid_px(band_px: DataFrame) -> DataFrame:
    """(gx, gy, v:long) for valid pixels of an exploded band frame."""
    return band_px.filter(F.col("value") != NODATA).select(
        (F.col("tile_x") * TILE_PX + F.col("pos") % TILE_PX).alias("gx"),
        (F.col("tile_y") * TILE_PX
         + (F.col("pos") / TILE_PX).cast("int")).alias("gy"),
        F.col("value").cast("long").alias("v"),
    )



def _gj(a: DataFrame, b: DataFrame, how: str = "inner") -> DataFrame:
    """(gx, gy)-keyed join of two PIXEL-SCALE frames, pinned to a
    shuffle hash join. Catalyst's compile-time size estimate under a
    filter+posexplode lineage can come out absurdly small, flipping
    these corpus-x-corpus joins into a broadcast build that is
    driver-fatal at scale (caught at sf0.1: semivariogram_aniso OOMed
    the broadcast exchange while siblings silently broadcast 52M-row
    sides). The hint pins the co-partitioned hash join a
    1000-executor plan needs; AQE skew handling still applies."""
    return a.join(b.hint("shuffle_hash"), ["gx", "gy"], how)


def morans_i(band_px: DataFrame) -> DataFrame:
    """Global Moran's I with rook (4-neighbour, binary) weights.
    Returns ONE row: (n_pixels, w_sum, morans_i)."""
    px = _valid_px(band_px)
    offsets = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1))
    ])
    nb = (
        px.select("gx", "gy", "v", F.explode(offsets).alias("o"))
        .groupBy(
            (F.col("gx") + F.col("o.dx")).alias("gx"),
            (F.col("gy") + F.col("o.dy")).alias("gy"),
        )
        .agg(F.sum("v").alias("nbs"), F.count("*").alias("nbc"))
    )
    j = _gj(px, nb, "left").select(
        "v",
        F.coalesce("nbs", F.lit(0).cast("long")).alias("s"),
        F.coalesce("nbc", F.lit(0).cast("long")).alias("c"),
    )
    sums = j.agg(
        F.count("*").alias("n"),
        F.sum("v").alias("sum_v"),
        F.sum(F.col("v") * F.col("v")).alias("sum_v2"),
        F.sum(F.col("v") * F.col("s")).alias("sum_vs"),
        F.sum(F.col("v") * F.col("c")).alias("sum_vc"),
        F.sum("s").alias("sum_s"),
        F.sum("c").alias("sum_c"),
    )
    n = F.col("n").cast("double")
    m = F.col("sum_v").cast("double") / F.col("n")
    num = (F.col("sum_vs").cast("double")
           - m * F.col("sum_vc").cast("double")
           - m * F.col("sum_s").cast("double")
           + m * m * F.col("sum_c").cast("double"))
    den = (F.col("sum_v2").cast("double")
           - F.lit(2.0) * m * F.col("sum_v").cast("double")
           + m * m * n)
    return sums.select(
        F.col("n").alias("n_pixels"),
        F.col("sum_c").alias("w_sum"),
        ((n / F.col("sum_c").cast("double")) * (num / den)).alias("morans_i"),
    )


def morans_correlogram(band_px: DataFrame,
                       lags: tuple[int, ...] = (1, 2, 4, 8)) -> DataFrame:
    """Spatial correlogram: global Moran's I at several rook lag
    distances h (weights (±h,0),(0,±h) binary) — how autocorrelation
    DECAYS with distance, the correlogram companion to the
    semivariogram's gamma(h) curve.  Exactly morans_i's
    sufficient-statistic algebra carried per lag: the neighbour
    fan-out tags each copy with its lag (one explode, |lags|x4
    copies), the pixel side fans to one row per lag, and ONE hash
    left-join + one grouped agg produce every lag's integer sums;
    the only floats are the final per-lag ratio, mirrored op-for-op
    in the oracle.  Returns (lag, n_pixels, w_sum, morans_i)."""
    px = _valid_px(band_px)
    offs = F.array(*[
        F.struct(F.lit(int(h)).alias("lag"),
                 F.lit(dx * int(h)).alias("dx"),
                 F.lit(dy * int(h)).alias("dy"))
        for h in lags for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1))
    ])
    nb = (
        px.select("gx", "gy", "v", F.explode(offs).alias("o"))
        .groupBy(
            (F.col("gx") + F.col("o.dx")).alias("gx"),
            (F.col("gy") + F.col("o.dy")).alias("gy"),
            F.col("o.lag").alias("lag"),
        )
        .agg(F.sum("v").alias("nbs"), F.count("*").alias("nbc"))
    )
    lag_arr = F.array(*[F.lit(int(h)) for h in lags])
    pl = px.select("gx", "gy", "v", F.explode(lag_arr).alias("lag"))
    j = pl.join(nb, ["gx", "gy", "lag"], "left").select(
        "lag", "v",
        F.coalesce("nbs", F.lit(0).cast("long")).alias("s"),
        F.coalesce("nbc", F.lit(0).cast("long")).alias("c"),
    )
    sums = j.groupBy("lag").agg(
        F.count("*").alias("n"),
        F.sum("v").alias("sum_v"),
        F.sum(F.col("v") * F.col("v")).alias("sum_v2"),
        F.sum(F.col("v") * F.col("s")).alias("sum_vs"),
        F.sum(F.col("v") * F.col("c")).alias("sum_vc"),
        F.sum("s").alias("sum_s"),
        F.sum("c").alias("sum_c"),
    )
    n = F.col("n").cast("double")
    m = F.col("sum_v").cast("double") / F.col("n")
    num = (F.col("sum_vs").cast("double")
           - m * F.col("sum_vc").cast("double")
           - m * F.col("sum_s").cast("double")
           + m * m * F.col("sum_c").cast("double"))
    den = (F.col("sum_v2").cast("double")
           - F.lit(2.0) * m * F.col("sum_v").cast("double")
           + m * m * n)
    return sums.select(
        "lag",
        F.col("n").alias("n_pixels"),
        F.col("sum_c").alias("w_sum"),
        ((n / F.col("sum_c").cast("double")) * (num / den))
        .alias("morans_i"),
    )


def gearys_correlogram_tiles(band_tiles: DataFrame,
                             lags: tuple[int, ...] = (1, 2, 4, 8),
                             tile_px: int | None = None,
                             fan: DataFrame | None = None) -> DataFrame:
    """Geary's C correlogram at rook lags — the local-contrast decay
    companion to morans_correlogram (Moran weights covariance, Geary
    weights squared differences, so they disagree under local
    heterogeneity even when the global trend agrees):
        c(h) = ((n-1) · Σ_pairs (v_x − v_{x+o})²) / (2 · W(h) · Σ(v−m)²)
    with the pair sum taken EXACTLY (int64 Σd² from the shared
    _pair_sums_frame kernel — unlike the global gearys_c, whose
    relational shape expands it algebraically in doubles; at lag 1 the
    two agree to ~1e-12, asserted in tests).  Same one-halo-exchange
    plan as morans_correlogram_tiles.  Returns
    (lag, n_pixels, w_sum, gearys_c)."""
    sums = _pair_sums_frame(band_tiles, lags, tile_px, fan)
    n = F.col("n").cast("double")
    m = F.col("sum_v").cast("double") / F.col("n")
    ssz = (F.col("sum_v2").cast("double")
           - F.lit(2.0) * m * F.col("sum_v").cast("double")
           + m * m * n)
    return sums.select(
        "lag",
        F.col("n").alias("n_pixels"),
        F.col("sum_c").alias("w_sum"),
        (((n - F.lit(1.0)) * F.col("sum_d2").cast("double"))
         / (F.lit(2.0) * F.col("sum_c").cast("double") * ssz))
        .alias("gearys_c"),
    )


def _pair_sums_frame(band_tiles: DataFrame,
                     lags: tuple[int, ...],
                     tile_px: int | None = None,
                     fan: DataFrame | None = None) -> DataFrame:
    """Shared ordered-pair partial-sum frame for the correlogram
    family: per lag h over the 4 rook offsets,
    (sum_c = #pairs, sum_vc = Σ v_head, sum_s = Σ v_tail,
     sum_vs = Σ v_head·v_tail, sum_d2 = Σ (v_head − v_tail)²)
    with the lag-independent totals (n, sum_v, sum_v2) riding the same
    Arrow kernel as a lag = -1 row and re-attached by ONE broadcast
    scalar cross join.  One halo exchange, bounded rollup — the plan
    shape documented at morans_correlogram_tiles."""
    from remotior_sensus_spark.operators.focal import (
        _assemble_padded, _with_halo_groups)

    T = tile_px or TILE_PX
    if max(lags) > T:
        raise ValueError("halo path requires max(lags) <= tile_px")

    def kernel(pdf):
        import pandas as pd
        cols = ["lag", "pa", "pb", "pc", "pd", "pe"]
        if not ((pdf["dx"] == 0) & (pdf["dy"] == 0)).any():
            return pd.DataFrame({c: pd.Series(dtype="int64")
                                 for c in cols})
        pad = _assemble_padded(pdf, tile_px=T)
        c0 = pad[T:2 * T, T:2 * T]
        cv = ~np.isnan(c0)
        if not cv.any():
            return pd.DataFrame({c: pd.Series(dtype="int64")
                                 for c in cols})
        # int64 accumulation (r06 hardening, ADVICE r05): head/tail are
        # integral DNs, so summing in int64 keeps the bit-equal-to-
        # relational guarantee for ANY value range / tile size instead
        # of relying on partial float64 sums staying below 2^53
        ci = c0.copy()
        ci[~cv] = 0.0
        ci = ci.astype(np.int64)
        c0i = ci[cv]
        rows = [(-1, int(cv.sum()), int(c0i.sum()),
                 int((c0i * c0i).sum()), 0, 0)]
        for h in lags:
            for ox, oy in ((h, 0), (-h, 0), (0, h), (0, -h)):
                nbr = pad[T + oy:2 * T + oy, T + ox:2 * T + ox]
                sel = cv & ~np.isnan(nbr)
                if not sel.any():
                    continue
                head = ci[sel]
                tail = np.where(np.isnan(nbr), 0.0,
                                nbr).astype(np.int64)[sel]
                d = head - tail
                rows.append((h, int(sel.sum()), int(head.sum()),
                             int(tail.sum()), int((head * tail).sum()),
                             int((d * d).sum())))
        return pd.DataFrame(rows, columns=cols)

    halo = fan if fan is not None else _with_halo_groups(band_tiles)
    per = halo.groupBy("target_tx", "target_ty").applyInPandas(
        kernel,
        "lag long, pa long, pb long, pc long, pd long, pe long")
    g = per.groupBy("lag").agg(
        F.sum("pa").alias("pa"), F.sum("pb").alias("pb"),
        F.sum("pc").alias("pc"), F.sum("pd").alias("pd"),
        F.sum("pe").alias("pe"))
    tot = g.filter(F.col("lag") == -1).select(
        F.col("pa").alias("n"), F.col("pb").alias("sum_v"),
        F.col("pc").alias("sum_v2"))
    return (g.filter(F.col("lag") >= 0)
            .select(F.col("lag").cast("int").alias("lag"),
                    F.col("pa").alias("sum_c"),
                    F.col("pb").alias("sum_vc"),
                    F.col("pc").alias("sum_s"),
                    F.col("pd").alias("sum_vs"),
                    F.col("pe").alias("sum_d2"))
            .crossJoin(F.broadcast(tot)))


def morans_correlogram_tiles(band_tiles: DataFrame,
                             lags: tuple[int, ...] = (1, 2, 4, 8),
                             tile_px: int | None = None,
                             fan: DataFrame | None = None) -> DataFrame:
    """morans_correlogram on the focal halo path, via the pair-sum
    identity: every per-lag Moran statistic is an ORDERED-PAIR sum
        sum_c  = #{(x, x+o): both valid}   (o over the 4 rook offsets
        sum_s  = Σ v(x+o)                   at distance h)
        sum_vc = Σ v(x)
        sum_vs = Σ v(x) * v(x+o)
    so the per-pixel neighbour join disappears entirely — each tile's
    Arrow group forms all |lags|x4 shifted slices against its halo pad
    and emits 5 bounded partial-sum rows; the lag-independent totals
    (n, sum_v, sum_v2) ride the same kernel as a lag = -1 row.  ONE
    halo exchange + a (|lags|+1)-row groupBy replace the 26M x 26M
    (gx, gy, lag) join that dominated sf0.1 (38 s -> this path).
    Identical output (bit-equal doubles — same integer sums through
    the same final expression) to the relational morans_correlogram,
    which stays registered as the cross-checked reference shape.
    Per-tile products stay exact: v <= 5e3 so head*tail <= 2.5e7 and
    a 64^2-tile partial sum <= 1e11 < 2^53 before the int64 rollup."""
    sums = _pair_sums_frame(band_tiles, lags, tile_px, fan)
    n = F.col("n").cast("double")
    m = F.col("sum_v").cast("double") / F.col("n")
    num = (F.col("sum_vs").cast("double")
           - m * F.col("sum_vc").cast("double")
           - m * F.col("sum_s").cast("double")
           + m * m * F.col("sum_c").cast("double"))
    den = (F.col("sum_v2").cast("double")
           - F.lit(2.0) * m * F.col("sum_v").cast("double")
           + m * m * n)
    return sums.select(
        "lag",
        F.col("n").alias("n_pixels"),
        F.col("sum_c").alias("w_sum"),
        ((n / F.col("sum_c").cast("double")) * (num / den))
        .alias("morans_i"),
    )


def gearys_c(band_px: DataFrame) -> DataFrame:
    """Global Geary's C with rook weights. The pair term expands to
    integer sums too:
      sum_ij w_ij (v_i - v_j)^2
        = sum_i c_i v_i^2 - 2 sum_i v_i S_i + sum_i S2_i
    with S2_i the neighbour sum of squares — so like morans_i the whole
    statistic is exact-integer aggregates plus one fixed double tail:
      C = ((n-1) * pairsum) / (2 W * sum(z^2)).
    Returns ONE row: (n_pixels, w_sum, gearys_c)."""
    px = _valid_px(band_px)
    offsets = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1))
    ])
    nb = (
        px.select("gx", "gy", "v", F.explode(offsets).alias("o"))
        .groupBy(
            (F.col("gx") + F.col("o.dx")).alias("gx"),
            (F.col("gy") + F.col("o.dy")).alias("gy"),
        )
        .agg(F.sum("v").alias("nbs"),
             F.sum(F.col("v") * F.col("v")).alias("nbs2"),
             F.count("*").alias("nbc"))
    )
    j = _gj(px, nb, "left").select(
        "v",
        F.coalesce("nbs", F.lit(0).cast("long")).alias("s"),
        F.coalesce("nbs2", F.lit(0).cast("long")).alias("s2"),
        F.coalesce("nbc", F.lit(0).cast("long")).alias("c"),
    )
    sums = j.agg(
        F.count("*").alias("n"),
        F.sum("v").alias("sum_v"),
        F.sum(F.col("v") * F.col("v")).alias("sum_v2"),
        F.sum(F.col("c") * F.col("v") * F.col("v")).alias("sum_cv2"),
        F.sum(F.col("v") * F.col("s")).alias("sum_vs"),
        F.sum("s2").alias("sum_s2"),
        F.sum("c").alias("sum_c"),
    )
    n = F.col("n").cast("double")
    m = F.col("sum_v").cast("double") / F.col("n")
    pairsum = (F.col("sum_cv2").cast("double")
               - F.lit(2.0) * F.col("sum_vs").cast("double")
               + F.col("sum_s2").cast("double"))
    ssz = (F.col("sum_v2").cast("double")
           - F.lit(2.0) * m * F.col("sum_v").cast("double")
           + m * m * n)
    return sums.select(
        F.col("n").alias("n_pixels"),
        F.col("sum_c").alias("w_sum"),
        (((n - F.lit(1.0)) * pairsum)
         / (F.lit(2.0) * F.col("sum_c").cast("double") * ssz))
        .alias("gearys_c"),
    )


def semivariogram(band_px: DataFrame,
                  lags: tuple[int, ...] = (1, 2, 4, 8)) -> DataFrame:
    """Experimental semivariogram along +x: gamma(h) =
    sum((v(x+h,y) - v(x,y))^2) / (2 * N_h) per lag. Pair formation is a
    shifted-copy equi-join (each copy carries its lag), so all lags
    resolve in ONE hash join — no per-lag scan. Returns
    (lag, n_pairs, sum_sq_diff, gamma)."""
    px = _valid_px(band_px)
    lag_arr = F.array(*[F.lit(int(h)) for h in lags])
    shifted = (
        px.select("gx", "gy", "v", F.explode(lag_arr).alias("lag"))
        .select((F.col("gx") + F.col("lag")).alias("gx"), "gy", "lag",
                F.col("v").alias("v0"))
    )
    pairs = _gj(shifted, px).select(
        "lag", ((F.col("v") - F.col("v0"))
                * (F.col("v") - F.col("v0"))).alias("d2")
    )
    g = pairs.groupBy("lag").agg(
        F.count("*").alias("n_pairs"),
        F.sum("d2").alias("sum_sq_diff"),
    )
    return g.select(
        "lag", "n_pairs", "sum_sq_diff",
        (F.col("sum_sq_diff").cast("double")
         / (F.lit(2.0) * F.col("n_pairs").cast("double"))).alias("gamma"),
    )


def semivariogram_tiles(band_tiles: DataFrame | None,
                        lags: tuple[int, ...] = (1, 2, 4, 8),
                        tile_px: int | None = None,
                        fan: DataFrame | None = None) -> DataFrame:
    """semivariogram on the focal-halo path (r06): one halo exchange
    plus vectorized +x pair sums per pad replace the 26M-row
    shifted-copy hash join. A pair is (v(x,y), v(x-h,y)) with both
    valid — the same ordered-pair set as the relational join; sums in
    int64 (integral DNs). Requires max(lags) <= the shipped ring.
    Pinned by test_semivariogram_halo_parity and the driver check."""
    import pandas as pd

    from remotior_sensus_spark.operators.focal import (
        _assemble_padded, _with_halo_groups)
    from remotior_sensus_spark.grid import TILE_PX

    T = tile_px or TILE_PX
    if max(lags) > T:
        raise ValueError("halo path requires max(lags) <= tile_px")

    def kernel(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd
        cols = ["lag", "n_pairs", "sum_sq_diff"]
        empty = pd.DataFrame({c: pd.Series(dtype="int64") for c in cols})
        centre = pdf[(pdf["dx"] == 0) & (pdf["dy"] == 0)]
        if not len(centre):
            return empty
        pad = _assemble_padded(pdf, tile_px=T)
        valid = ~np.isnan(pad)
        vi64 = np.where(valid, pad, 0.0).astype(np.int64)
        cv = valid[T:2 * T, T:2 * T]
        c64 = vi64[T:2 * T, T:2 * T]
        rows = []
        for h in lags:
            nbv = valid[T:2 * T, T - h:2 * T - h]
            sel = cv & nbv
            if not sel.any():
                continue
            d = c64[sel] - vi64[T:2 * T, T - h:2 * T - h][sel]
            rows.append((int(h), int(sel.sum()), int((d * d).sum())))
        if not rows:
            return empty
        return pd.DataFrame(rows, columns=cols)

    halo = fan if fan is not None else _with_halo_groups(band_tiles)
    per = halo.groupBy("target_tx", "target_ty").applyInPandas(
        kernel, schema="lag long, n_pairs long, sum_sq_diff long")
    g = per.groupBy(F.col("lag").cast("int").alias("lag")).agg(
        F.sum("n_pairs").alias("n_pairs"),
        F.sum("sum_sq_diff").alias("sum_sq_diff"))
    return g.select(
        "lag", "n_pairs", "sum_sq_diff",
        (F.col("sum_sq_diff").cast("double")
         / (F.lit(2.0) * F.col("n_pairs").cast("double"))).alias("gamma"),
    )


def getis_g(band_px: DataFrame) -> DataFrame:
    """Global Getis-Ord General G with rook weights (positive DNs):
    G = sum_ij w_ij v_i v_j / sum_{i<>j} v_i v_j.  The numerator is the
    same exact-integer sum(v*S) morans_i computes; the denominator is
    (sum v)^2 - sum v^2 evaluated in doubles (3 deterministic ops — the
    squared total overflows int64 at large scale, the double form never
    does and both engines compute the identical IEEE value).
    Returns ONE row: (n_pixels, w_sum, getis_g)."""
    px = _valid_px(band_px)
    offsets = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1))
    ])
    nb = (
        px.select("gx", "gy", "v", F.explode(offsets).alias("o"))
        .groupBy(
            (F.col("gx") + F.col("o.dx")).alias("gx"),
            (F.col("gy") + F.col("o.dy")).alias("gy"),
        )
        .agg(F.sum("v").alias("nbs"), F.count("*").alias("nbc"))
    )
    j = _gj(px, nb, "left").select(
        "v",
        F.coalesce("nbs", F.lit(0).cast("long")).alias("s"),
        F.coalesce("nbc", F.lit(0).cast("long")).alias("c"),
    )
    sums = j.agg(
        F.count("*").alias("n"),
        F.sum("v").alias("sum_v"),
        F.sum(F.col("v") * F.col("v")).alias("sum_v2"),
        F.sum(F.col("v") * F.col("s")).alias("sum_vs"),
        F.sum("c").alias("sum_c"),
    )
    sv = F.col("sum_v").cast("double")
    return sums.select(
        F.col("n").alias("n_pixels"),
        F.col("sum_c").alias("w_sum"),
        (F.col("sum_vs").cast("double")
         / (sv * sv - F.col("sum_v2").cast("double"))).alias("getis_g"),
    )


def tri_classes(band_px: DataFrame, class_width: float = 500.0) -> DataFrame:
    """Terrain Ruggedness Index (Riley 1999): per pixel
    sqrt(sum over the 8 queen neighbours of (v - v_n)^2), expanded to
    the exact integer form c*v^2 - 2*v*S + S2 before the single sqrt.
    Pixels use whichever neighbours exist (Riley's rule at edges).
    Emitted as a class histogram with a fixed-point TRI checksum:
    (tri_class, pixel_count, tri_fp_sum)."""
    px = _valid_px(band_px)
    offsets = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)
        if not (dx == 0 and dy == 0)
    ])
    nb = (
        px.select("gx", "gy", "v", F.explode(offsets).alias("o"))
        .groupBy(
            (F.col("gx") + F.col("o.dx")).alias("gx"),
            (F.col("gy") + F.col("o.dy")).alias("gy"),
        )
        .agg(F.sum("v").alias("nbs"),
             F.sum(F.col("v") * F.col("v")).alias("nbs2"),
             F.count("*").alias("nbc"))
    )
    j = _gj(px, nb).select(
        "v", F.col("nbs").alias("s"), F.col("nbs2").alias("s2"),
        F.col("nbc").alias("c"),
    )
    ss = (F.col("c") * F.col("v") * F.col("v")
          - F.lit(2).cast("long") * F.col("v") * F.col("s")
          + F.col("s2"))
    tri = F.sqrt(ss.cast("double"))
    from remotior_sensus_spark.functions.cols import fixed1e6
    return (
        j.select(tri.alias("tri"))
        .groupBy(F.floor(F.col("tri") / F.lit(float(class_width)))
                 .cast("int").alias("tri_class"))
        .agg(F.count("*").alias("pixel_count"),
             F.sum(fixed1e6(F.col("tri"))).alias("tri_fp_sum"))
    )


def tri_classes_tiles(band_tiles: DataFrame | None,
                      class_width: float = 500.0,
                      tile_px: int | None = None,
                      fan: DataFrame | None = None) -> DataFrame:
    """tri_classes on the focal-halo path (r06): one halo exchange and
    a vectorized per-pad kernel replace the 52M-row shifted-copy
    shuffle + pixel equi-join. Integer-exact mirror of the relational
    twin: s/s2/c summed in int64 over existing valid neighbours, the
    single sqrt on the expanded c*v^2 - 2*v*s + s2 double, pixels with
    no valid neighbour excluded (the inner join's rule). Pinned by
    test_tri_halo_parity and the driver-checked query."""
    import pandas as pd

    from remotior_sensus_spark.operators.focal import (
        _assemble_padded, _with_halo_groups)
    from remotior_sensus_spark.grid import TILE_PX

    T = tile_px or TILE_PX

    def kernel(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd
        cols = ["tri_class", "pixel_count", "tri_fp_sum"]
        empty = pd.DataFrame({c: pd.Series(dtype="int64") for c in cols})
        centre = pdf[(pdf["dx"] == 0) & (pdf["dy"] == 0)]
        if not len(centre):
            return empty
        pad = _assemble_padded(pdf, tile_px=T)
        valid = ~np.isnan(pad)
        vi64 = np.where(valid, pad, 0.0).astype(np.int64)
        P = 3 * T
        s = np.zeros((T, T), dtype=np.int64)
        s2 = np.zeros((T, T), dtype=np.int64)
        c = np.zeros((T, T), dtype=np.int64)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dx == 0 and dy == 0:
                    continue
                nv = vi64[T + dy:2 * T + dy, T + dx:2 * T + dx]
                nm = valid[T + dy:2 * T + dy, T + dx:2 * T + dx]
                s += np.where(nm, nv, 0)
                s2 += np.where(nm, nv * nv, 0)
                c += nm
        ctr = valid[T:2 * T, T:2 * T] & (c > 0)
        if not ctr.any():
            return empty
        v = vi64[T:2 * T, T:2 * T][ctr]
        ss = c[ctr] * v * v - 2 * v * s[ctr] + s2[ctr]
        tri = np.sqrt(ss.astype(np.float64))
        cls = np.floor(tri / class_width).astype(np.int64)
        fp = np.floor(tri * 1e6 + 0.5).astype(np.int64)
        ub, inv = np.unique(cls, return_inverse=True)
        n = np.zeros(len(ub), dtype=np.int64)
        fsum = np.zeros(len(ub), dtype=np.int64)
        np.add.at(n, inv, 1)
        np.add.at(fsum, inv, fp)
        return pd.DataFrame({"tri_class": ub, "pixel_count": n,
                             "tri_fp_sum": fsum})

    halo = fan if fan is not None else _with_halo_groups(band_tiles)
    per = halo.groupBy("target_tx", "target_ty").applyInPandas(
        kernel, schema="tri_class long, pixel_count long, tri_fp_sum long")
    return (per.groupBy(F.col("tri_class").cast("int").alias("tri_class"))
            .agg(F.sum("pixel_count").alias("pixel_count"),
                 F.sum("tri_fp_sum").alias("tri_fp_sum")))


def lisa_quadrants_tiles(band_tiles: DataFrame | None,
                         tile_px: int | None = None,
                         fan: DataFrame | None = None) -> DataFrame:
    """lisa_quadrants on the focal-halo path (r06): the global scalars
    (n, sum_v, sum_v2) come from one cheap JVM aggregate over the tile
    arrays, then ONE halo exchange computes the rook neighbour sums
    and the quadrant census vectorized per pad — replacing the 26M-row
    shifted-copy shuffle + pixel join. Quadrant membership stays the
    exact integer sign tests; the local I double sequence mirrors the
    relational expression term for term with md/m2d computed from the
    exact integer totals. Pinned by test_lisa_halo_parity and the
    driver-checked query."""
    import pandas as pd

    from remotior_sensus_spark.operators.focal import (
        _assemble_padded, _with_halo_groups)
    from remotior_sensus_spark.grid import TILE_PX
    from remotior_sensus_spark import NODATA

    T = tile_px or TILE_PX
    halo = fan if fan is not None else _with_halo_groups(band_tiles)
    halo = halo.localCheckpoint()

    # global totals from the centre tiles of the checkpointed fan (the
    # dx=dy=0 rows are exactly the corpus, each tile once)
    nd_lit = float(NODATA)
    tot = (halo.filter((F.col("dx") == 0) & (F.col("dy") == 0))
           .select(F.explode("pixels").alias("v"))
           .filter(F.col("v") != nd_lit)
           .agg(F.count("*").alias("n"),
                F.sum(F.col("v").cast("long")).alias("sum_v"),
                F.sum((F.col("v").cast("long")
                       * F.col("v").cast("long"))).alias("sum_v2"))
           ).collect()[0]
    n_g, sum_v, sum_v2 = int(tot["n"]), int(tot["sum_v"]), int(tot["sum_v2"])
    nd = float(n_g)
    md = float(sum_v) / nd
    m2d = (float(sum_v2) - 2.0 * md * float(sum_v) + md * md * nd) / nd

    quads = ["HH", "LL", "LH", "HL", "NS"]

    def kernel(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd
        cols = ["quadrant", "pixel_count", "lisa_fp_sum"]
        empty = pd.DataFrame({
            "quadrant": pd.Series(dtype="object"),
            "pixel_count": pd.Series(dtype="int64"),
            "lisa_fp_sum": pd.Series(dtype="int64")})
        centre = pdf[(pdf["dx"] == 0) & (pdf["dy"] == 0)]
        if not len(centre):
            return empty
        pad = _assemble_padded(pdf, tile_px=T)
        valid = ~np.isnan(pad)
        vi64 = np.where(valid, pad, 0.0).astype(np.int64)
        P = 3 * T
        s = np.zeros((T, T), dtype=np.int64)
        c = np.zeros((T, T), dtype=np.int64)
        for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            nv = vi64[T + dy:2 * T + dy, T + dx:2 * T + dx]
            nm = valid[T + dy:2 * T + dy, T + dx:2 * T + dx]
            s += np.where(nm, nv, 0)
            c += nm
        ctr = valid[T:2 * T, T:2 * T]
        if not ctr.any():
            return empty
        v = vi64[T:2 * T, T:2 * T][ctr]
        sv = s[ctr]
        cv = c[ctr]
        a = n_g * v - sum_v
        b = n_g * sv - cv * sum_v
        qi = np.full(len(v), 4, dtype=np.int64)  # NS
        qi[(a > 0) & (b > 0)] = 0
        qi[(a < 0) & (b < 0)] = 1
        qi[(a < 0) & (b > 0)] = 2
        qi[(a > 0) & (b < 0)] = 3
        ii = (v.astype(np.float64) - md) \
            * (sv.astype(np.float64) - cv.astype(np.float64) * md) / m2d
        fp = np.floor(ii * 1e6 + 0.5).astype(np.int64)
        ub, inv = np.unique(qi, return_inverse=True)
        nq = np.zeros(len(ub), dtype=np.int64)
        fs = np.zeros(len(ub), dtype=np.int64)
        np.add.at(nq, inv, 1)
        np.add.at(fs, inv, fp)
        return pd.DataFrame({
            "quadrant": [quads[int(u)] for u in ub],
            "pixel_count": nq, "lisa_fp_sum": fs})

    per = halo.groupBy("target_tx", "target_ty").applyInPandas(
        kernel,
        schema="quadrant string, pixel_count long, lisa_fp_sum long")
    return (per.groupBy("quadrant")
            .agg(F.sum("pixel_count").alias("pixel_count"),
                 F.sum("lisa_fp_sum").alias("lisa_fp_sum")))


def zonal_entropy_tiles(zone_tiles: DataFrame, value_tiles: DataFrame,
                        step: float = 1000.0,
                        tile_px: int | None = None) -> DataFrame:
    """zonal_entropy with the (zone, class) counting done as ONE
    Arrow bincount pass over the paired tile arrays (r06): the
    relational shape exploded both bands into a 13M-row pixel-keyed
    aggregation just to pair them; here the pair lives at the same
    array index, so a tile-keyed equi join + per-tile bincount ships
    only bounded (zone, class, c) partials. The entropy tail is the
    unchanged zonal_entropy arithmetic (bit-equal; pinned by the
    driver-checked query + test_zonal_entropy_dense)."""
    import pandas as pd

    from remotior_sensus_spark import NODATA

    j = zone_tiles.select(
        "tile_x", "tile_y", F.col("pixels").alias("pz")
    ).join(value_tiles.select(
        "tile_x", "tile_y", F.col("pixels").alias("pv")),
        ["tile_x", "tile_y"])

    def kern(it):
        for pdf in it:
            zs, cs, ns = [], [], []
            for _, row in pdf.iterrows():
                az = np.asarray(row["pz"], dtype=np.float64)
                av = np.asarray(row["pv"], dtype=np.float64)
                valid = (az != NODATA) & (av != NODATA)
                if not valid.any():
                    continue
                zone = np.floor(az[valid] / step).astype(np.int64)
                vcls = np.floor(av[valid] / step).astype(np.int64)
                pk = (zone + 8) * 1024 + (vcls + 8)
                ub, cnt = np.unique(pk, return_counts=True)
                zs.append(ub // 1024 - 8)
                cs.append(ub % 1024 - 8)
                ns.append(cnt.astype(np.int64))
            if not zs:
                continue
            yield pd.DataFrame({
                "zone": np.concatenate(zs),
                "vclass": np.concatenate(cs),
                "c": np.concatenate(ns)})

    per = j.mapInPandas(kern, "zone long, vclass long, c long")
    counts = per.groupBy(
        F.col("zone").cast("int").alias("zone"),
        F.col("vclass").cast("int").alias("vclass"),
    ).agg(F.sum("c").alias("ck"))
    return _zonal_entropy_tail(counts, "zone")


def _zonal_entropy_tail(counts: DataFrame, zone_col: str) -> DataFrame:
    """Shared entropy arithmetic over a (zone, class, ck) count table."""
    from remotior_sensus_spark.functions.cols import fixed1e6
    totals = counts.groupBy(zone_col).agg(F.sum("ck").alias("n"))
    p = F.col("ck").cast("double") / F.col("n").cast("double")
    term = fixed1e6(p * F.log(p))
    return (
        counts.join(totals, zone_col)
        .groupBy(zone_col)
        .agg(F.max("n").alias("n_pixels"),
             F.count("*").alias("n_classes"),
             (-F.sum(term)).alias("entropy_fp"))
    )


def zonal_entropy(zone_px: DataFrame, zone_col: str = "zone",
                  class_col: str = "vclass") -> DataFrame:
    """Shannon entropy of the class distribution inside each zone:
    H = -sum_k p_k ln p_k.  Every per-class term is a deterministic
    double rounded to fixed-point BEFORE the per-zone sum, so the
    result is an order-independent BIGINT both engines agree on.
    Two map-side-combinable aggregations (zone,class) -> zone.
    Returns (zone, n_pixels, n_classes, entropy_fp)."""
    from remotior_sensus_spark.functions.cols import fixed1e6
    counts = zone_px.groupBy(zone_col, class_col).agg(
        F.count("*").alias("ck"))
    totals = counts.groupBy(zone_col).agg(F.sum("ck").alias("n"))
    p = F.col("ck").cast("double") / F.col("n").cast("double")
    term = fixed1e6(p * F.log(p))
    return (
        counts.join(totals, zone_col)
        .groupBy(zone_col)
        .agg(F.max("n").alias("n_pixels"),
             F.count("*").alias("n_classes"),
             (-F.sum(term)).alias("entropy_fp"))
    )


def lisa_quadrants(band_px: DataFrame) -> DataFrame:
    """Local Moran (LISA, Anselin 1995) quadrant histogram under rook
    weights.  Quadrant membership is decided by INTEGER sign tests —
    sign(v_i - m) == sign(n*v_i - sum_v) and sign(S_i - c_i*m) ==
    sign(n*S_i - c_i*sum_v) — so HH/LL/LH/HL assignment is exact under
    any partitioning; the local statistic
      I_i = (v_i - m) * (S_i - c_i m) / m2
    is one fixed per-pixel double sequence rounded to fixed-point
    BEFORE the order-independent per-quadrant sum.  The global scalars
    (n, sum_v, sum_v2) depend only on the pixel stream, so they come
    from a broadcast 1-row aggregate of the cheap scan side — the
    neighbour shuffle runs exactly once.
    Returns (quadrant, pixel_count, lisa_fp_sum)."""
    from remotior_sensus_spark.functions.cols import fixed1e6
    px = _valid_px(band_px)
    offsets = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1))
    ])
    nb = (
        px.select("gx", "gy", "v", F.explode(offsets).alias("o"))
        .groupBy(
            (F.col("gx") + F.col("o.dx")).alias("gx"),
            (F.col("gy") + F.col("o.dy")).alias("gy"),
        )
        .agg(F.sum("v").alias("nbs"), F.count("*").alias("nbc"))
    )
    j = _gj(px, nb, "left").select(
        "v",
        F.coalesce("nbs", F.lit(0).cast("long")).alias("s"),
        F.coalesce("nbc", F.lit(0).cast("long")).alias("c"),
    )
    tot = px.agg(
        F.count("*").alias("n"),
        F.sum("v").alias("sum_v"),
        F.sum(F.col("v") * F.col("v")).alias("sum_v2"),
    )
    jt = j.crossJoin(F.broadcast(tot))
    a = F.col("n") * F.col("v") - F.col("sum_v")
    b = F.col("n") * F.col("s") - F.col("c") * F.col("sum_v")
    quadrant = (
        F.when((a > 0) & (b > 0), F.lit("HH"))
        .when((a < 0) & (b < 0), F.lit("LL"))
        .when((a < 0) & (b > 0), F.lit("LH"))
        .when((a > 0) & (b < 0), F.lit("HL"))
        .otherwise(F.lit("NS"))
    )
    nd = F.col("n").cast("double")
    md = F.col("sum_v").cast("double") / nd
    m2d = (
        F.col("sum_v2").cast("double")
        - F.lit(2.0) * md * F.col("sum_v").cast("double")
        + md * md * nd
    ) / nd
    ii = (F.col("v").cast("double") - md) \
        * (F.col("s").cast("double") - F.col("c").cast("double") * md) / m2d
    return (
        jt.select(quadrant.alias("quadrant"), fixed1e6(ii).alias("ifp"))
        .groupBy("quadrant")
        .agg(F.count("*").alias("pixel_count"),
             F.sum("ifp").alias("lisa_fp_sum"))
    )


def focal_majority(band_px: DataFrame, step: float = 1000.0) -> DataFrame:
    """3x3 majority filter over quantized classes (queen neighbourhood
    INCLUDING the center, so every valid center has a non-empty vote
    set; ties break to the smallest class).  The per-pixel argmax is
    encoded as one BIGINT  ord = cnt * 2^20 + (2^20 - 1 - cls)  so a
    plain MAX picks the same winner in both engines — requires
    0 <= cls < 2^20, which floor(DN/step) satisfies for any positive
    raster (assert-free: fixture DNs are < 2^16).  Emits the filtered
    raster's class histogram (majority_class, pixel_count) — two
    map-side-combinable shuffles plus one co-partitioned semi join
    back to valid centers (positions that only RECEIVE votes, e.g.
    nodata holes and the off-grid frame, must not emit a pixel)."""
    px = _valid_px(band_px).select(
        "gx", "gy",
        F.floor(F.col("v").cast("double") / F.lit(float(step)))
        .cast("long").alias("cls"),
    )
    offsets = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)
    ])
    counts = (
        px.select("gx", "gy", "cls", F.explode(offsets).alias("o"))
        .groupBy(
            (F.col("gx") + F.col("o.dx")).alias("gx"),
            (F.col("gy") + F.col("o.dy")).alias("gy"),
            F.col("cls"),
        )
        .agg(F.count("*").alias("cnt"))
    )
    winners = counts.groupBy("gx", "gy").agg(
        F.max(F.col("cnt") * F.lit(1048576).cast("long")
              + (F.lit(1048575).cast("long") - F.col("cls"))).alias("mo"))
    centers = _gj(winners, px.select("gx", "gy"), "leftsemi")
    maj = F.lit(1048575).cast("long") - F.col("mo") % F.lit(1048576).cast("long")
    return (
        centers.select(maj.alias("majority_class"))
        .groupBy("majority_class")
        .agg(F.count("*").alias("pixel_count"))
    )


def focal_majority_tiles(band_tiles: DataFrame | None,
                         step: float = 1000.0,
                         tile_px: int | None = None,
                         fan: DataFrame | None = None) -> DataFrame:
    """focal_majority on the focal-halo path (r06, guide §2.2/§2.4):
    the relational shape exploded every valid pixel x9 into a
    pixel-keyed aggregation (58M rows at sf0.1) plus a second
    pixel-keyed argmax and a semi join back to centers — three
    corpus-wide shuffles. Here ONE halo exchange ships tiles and the
    per-pixel vote argmax runs vectorized per pad with the IDENTICAL
    encoding ord = cnt * 2^20 + (2^20 - 1 - cls) (max <=> count-major,
    smallest-class tie-break), so the class histogram is bit-equal to
    the relational twin (pinned by test_focal_majority_halo_parity and
    the driver-checked query). Only the bounded (class, count) rollup
    shuffles."""
    import pandas as pd

    from remotior_sensus_spark.operators.focal import (
        _assemble_padded, _with_halo_groups)
    from remotior_sensus_spark.grid import TILE_PX

    T = tile_px or TILE_PX

    def kernel(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd
        empty = pd.DataFrame({
            "majority_class": pd.Series(dtype="int64"),
            "pixel_count": pd.Series(dtype="int64")})
        centre = pdf[(pdf["dx"] == 0) & (pdf["dy"] == 0)]
        if not len(centre):
            return empty
        pad = _assemble_padded(pdf, tile_px=T)
        valid = ~np.isnan(pad)
        cls = np.where(valid,
                       np.floor(np.where(valid, pad, 0.0) / step),
                       -1).astype(np.int64)
        P = 3 * T
        c = slice(T, 2 * T)
        vi = valid[c, c]
        if not vi.any():
            return empty
        shifts = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
        uniq = np.unique(cls[T - 1:2 * T + 1, T - 1:2 * T + 1])
        uniq = uniq[uniq >= 0]
        best = np.full((T, T), -1, dtype=np.int64)
        for cv in uniq:
            cnt = np.zeros((T, T), dtype=np.int64)
            for dy, dx in shifts:
                cnt += (cls[T + dy:2 * T + dy, T + dx:2 * T + dx] == cv)
            np.maximum(best,
                       np.where(cnt > 0,
                                cnt * 1048576 + (1048575 - cv),
                                np.int64(-1)),
                       out=best)
        maj = (1048575 - best % 1048576)[vi & (best >= 0)]
        ub, cnts = np.unique(maj, return_counts=True)
        return pd.DataFrame({"majority_class": ub,
                             "pixel_count": cnts.astype(np.int64)})

    halo = fan if fan is not None else _with_halo_groups(band_tiles)
    per_tile = halo.groupBy("target_tx", "target_ty").applyInPandas(
        kernel, schema="majority_class long, pixel_count long")
    return per_tile.groupBy("majority_class").agg(
        F.sum("pixel_count").alias("pixel_count"))


def proximity_classes_tiles(band_tiles: DataFrame | None,
                            target_class: int = 4, step: float = 1000.0,
                            max_dist: int = 5,
                            tile_px: int | None = None,
                            fan: DataFrame | None = None) -> DataFrame:
    """proximity_classes on the focal-halo path (r06, guide §2.2/§4):
    the relational shape exploded every target pixel to its pi*r^2
    disk (105M rows at sf0.1) into a pixel-keyed min plus a pixel
    equi-join back to the corpus; here ONE halo exchange ships tiles
    and the bounded-radius distance transform runs vectorized per pad
    (requires max_dist <= the shipped ring, asserted). Identical
    semantics: integer min d^2 over the disk, band =
    floor(sqrt(double)), -1 when no target within the radius; pinned
    by test_proximity_halo_parity and the driver-checked query."""
    import pandas as pd

    from remotior_sensus_spark.operators.focal import (
        _assemble_padded, _with_halo_groups)
    from remotior_sensus_spark.grid import TILE_PX

    T = tile_px or TILE_PX
    if max_dist > T:
        raise ValueError("halo path requires max_dist <= tile_px")
    r2 = max_dist * max_dist
    disk = [(dx, dy, dx * dx + dy * dy)
            for dx in range(-max_dist, max_dist + 1)
            for dy in range(-max_dist, max_dist + 1)
            if dx * dx + dy * dy <= r2]

    def kernel(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd
        empty = pd.DataFrame({
            "dist_class": pd.Series(dtype="int64"),
            "pixel_count": pd.Series(dtype="int64")})
        centre = pdf[(pdf["dx"] == 0) & (pdf["dy"] == 0)]
        if not len(centre):
            return empty
        pad = _assemble_padded(pdf, tile_px=T)
        valid = ~np.isnan(pad)
        tgt = valid & (np.floor(
            np.where(valid, pad, 0.0) / step) == float(target_class))
        P = 3 * T
        vi = valid[T:2 * T, T:2 * T]
        if not vi.any():
            return empty
        big = np.int64(1 << 30)
        mind2 = np.full((T, T), big, dtype=np.int64)
        for dx, dy, d2 in disk:
            sh = tgt[T + dy:2 * T + dy, T + dx:2 * T + dx]
            np.minimum(mind2, np.where(sh, np.int64(d2), big), out=mind2)
        band = np.where(
            mind2 < big,
            np.floor(np.sqrt(mind2.astype(np.float64))).astype(np.int64),
            np.int64(-1))[vi]
        ub, cnts = np.unique(band, return_counts=True)
        return pd.DataFrame({"dist_class": ub,
                             "pixel_count": cnts.astype(np.int64)})

    halo = fan if fan is not None else _with_halo_groups(band_tiles)
    per = halo.groupBy("target_tx", "target_ty").applyInPandas(
        kernel, schema="dist_class long, pixel_count long")
    return (per.groupBy(F.col("dist_class").cast("int").alias("dist_class"))
            .agg(F.sum("pixel_count").alias("pixel_count")))


def proximity_classes(band_px: DataFrame, target_class: int = 4,
                      step: float = 1000.0, max_dist: int = 5) -> DataFrame:
    """Banded euclidean proximity (gdal_proximity.py semantics, bounded
    search radius): per valid pixel, the distance to the nearest pixel
    of the target class within max_dist, as the integer band
    floor(sqrt(min d^2)); pixels with no target inside the radius get
    band -1.  Target pixels explode to the precomputed disk of
    offsets with dx^2+dy^2 <= max_dist^2 (pi*r^2 rows per target — the
    scale knob; unbounded proximity would need a multi-pass sweep),
    the min-d^2 reduction partial-aggregates map-side, and distance is
    EXACT (integer d^2, one floor(sqrt) tail both engines share).
    Emits the proximity-band histogram (dist_class, pixel_count)."""
    px = _valid_px(band_px)
    cls = F.floor(F.col("v").cast("double") / F.lit(float(step))).cast("long")
    targets = px.filter(cls == F.lit(int(target_class)))
    r2 = max_dist * max_dist
    disk = [(dx, dy) for dx in range(-max_dist, max_dist + 1)
            for dy in range(-max_dist, max_dist + 1)
            if dx * dx + dy * dy <= r2]
    offsets = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"),
                 F.lit(dx * dx + dy * dy).alias("d2"))
        for dx, dy in disk
    ])
    near = (
        targets.select(F.explode(offsets).alias("o"), "gx", "gy")
        .groupBy(
            (F.col("gx") + F.col("o.dx")).alias("gx"),
            (F.col("gy") + F.col("o.dy")).alias("gy"),
        )
        .agg(F.min("o.d2").alias("min_d2"))
    )
    j = _gj(px, near, "left")
    band = F.when(
        F.col("min_d2").isNotNull(),
        F.floor(F.sqrt(F.col("min_d2").cast("double"))).cast("int"),
    ).otherwise(F.lit(-1))
    return (
        j.select(band.alias("dist_class"))
        .groupBy("dist_class")
        .agg(F.count("*").alias("pixel_count"))
    )


def glcm_texture(band_px: DataFrame, step: float = 500.0) -> DataFrame:
    """Grey-level co-occurrence texture (Haralick 1973) for the +x
    offset: quantize DNs to levels, count co-occurring (level_a,
    level_b) pairs via the same shifted-copy equi-join the
    semivariogram uses, then reduce the level-bounded pair matrix
    (<= levels^2 rows regardless of raster size) to
      contrast    = sum cnt*(i-j)^2 / total        (exact int / int)
      energy      = sum cnt^2 / total^2            (exact int / int^2)
      homogeneity = sum fixed1e6(cnt/(1+(i-j)^2))  (per-pair fixed
                    point BEFORE the sum, so order-independent)
    Returns ONE row: (n_pairs, contrast, energy, homogeneity_fp)."""
    from remotior_sensus_spark.functions.cols import fixed1e6
    px = _valid_px(band_px).select(
        "gx", "gy",
        F.floor(F.col("v").cast("double") / F.lit(float(step)))
        .cast("long").alias("c"))
    shifted = px.select(
        (F.col("gx") - 1).alias("gx"), "gy", F.col("c").alias("cb"))
    pairs = (
        _gj(px, shifted)
        .groupBy(F.col("c").alias("ca"), "cb")
        .agg(F.count("*").alias("cnt"))
    )
    d2 = (F.col("ca") - F.col("cb")) * (F.col("ca") - F.col("cb"))
    agg_row = pairs.agg(
        F.sum("cnt").alias("n_pairs"),
        F.sum(F.col("cnt") * d2).alias("con_num"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("en_num"),
        F.sum(fixed1e6(
            F.col("cnt").cast("double")
            / (F.lit(1.0) + d2.cast("double")))).alias("homogeneity_fp"),
    )
    tot = F.col("n_pairs").cast("double")
    return agg_row.select(
        "n_pairs",
        (F.col("con_num").cast("double") / tot).alias("contrast"),
        (F.col("en_num").cast("double") / (tot * tot)).alias("energy"),
        "homogeneity_fp",
    )


# D8 direction codes (ESRI convention: E=1, SE=2, S=4, SW=8, W=16,
# NW=32, N=64, NE=128) with gx growing east and gy growing south.
# (dx, dy, code, diag) — the neighbour in direction `code` sits at
# (gx+dx, gy+dy) from the centre.
_D8 = (
    (1, 0, 1, 0), (1, 1, 2, 1), (0, 1, 4, 0), (-1, 1, 8, 1),
    (-1, 0, 16, 0), (-1, -1, 32, 1), (0, -1, 64, 0), (1, -1, 128, 1),
)


def d8_flow(band_px: DataFrame) -> DataFrame:
    """D8 steepest-descent flow direction histogram (O'Callaghan &
    Mark 1984; the hydrology preprocessing the reference's terrain
    tools feed — ref util/raster_vector.py slope/aspect pipeline).

    Exact-integer steepness comparison: descent rate along a cardinal
    neighbour is dv/1, along a diagonal dv/sqrt(2); squaring clears the
    radical, so comparing 2*dv^2 (cardinal) against dv^2 (diagonal) on
    BIGINTs ranks directions with no float anywhere. Ties break to the
    SMALLEST code (deterministic, matching the oracle's rank order);
    pixels with no strictly lower neighbour get code 0 (pit/flat).
    Interior-only semantics: exactly the pixels whose full 8-neighbour
    ring is on-raster and valid (same all-valid rule as the Horn
    kernels).

    ONE shuffle (the shifted-copy union groups on the centre key);
    the code histogram after it is a bounded 9-row partial agg.
    Returns (code, n_pixels, sum_gx, sum_gy) — coordinate sums pin the
    exact membership, not just the counts."""
    return (
        _d8_dir_px(band_px)
        .groupBy("code")
        .agg(F.count("*").alias("n_pixels"),
             F.sum("gx").alias("sum_gx"),
             F.sum("gy").alias("sum_gy"))
    )


def _d8_dir_px(band_px: DataFrame) -> DataFrame:
    """Per-pixel D8 steepest-descent direction (gx, gy, code) over the
    interior set — the shared kernel of d8_flow and d8_indegree."""
    px = _valid_px(band_px)
    centre = px.select(
        "gx", "gy", F.lit(0).alias("code"), F.lit(0).alias("diag"),
        F.col("v").alias("nv"))
    shifted = [
        px.select(
            (F.col("gx") - F.lit(dx)).alias("gx"),
            (F.col("gy") - F.lit(dy)).alias("gy"),
            F.lit(code).alias("code"), F.lit(diag).alias("diag"),
            F.col("v").alias("nv"))
        for dx, dy, code, diag in _D8
    ]
    u = centre
    for s in shifted:
        u = u.unionByName(s)
    # one group per centre: centre value + each direction's neighbour
    per_dir = [
        F.max(F.when(F.col("code") == code, F.col("nv"))).alias(f"n{code}")
        for _, _, code, _ in _D8
    ]
    g = u.groupBy("gx", "gy").agg(
        F.max(F.when(F.col("code") == 0, F.col("nv"))).alias("cv"),
        F.sum(F.when(F.col("code") != 0, 1).otherwise(0)).alias("nbc"),
        *per_dir,
    ).filter(F.col("cv").isNotNull() & (F.col("nbc") == 8))

    def metric(code: int, diag: int):
        dv = F.col("cv") - F.col(f"n{code}")
        m = dv * dv * F.lit(2 - diag)
        return F.when(dv > 0, m).otherwise(F.lit(-1).cast("long"))

    best = F.greatest(*[
        F.struct(metric(code, diag).alias("m"),
                 F.lit(255 - code).alias("inv"))
        for _, _, code, diag in _D8
    ])
    code = F.when(best["m"] < 0, F.lit(0)).otherwise(
        F.lit(255) - best["inv"])
    return g.select(code.cast("int").alias("code"), "gx", "gy")


def d8_indegree(band_px: DataFrame) -> DataFrame:
    """D8 flow in-degree histogram — the one-step flow-accumulation
    kernel: every interior pixel's D8 code points at one downslope
    neighbour, and a pixel's in-degree is how many of ITS interior
    neighbours drain into it (0..8). The in-degree census separates
    channel-forming convergence (high in-degree) from hillslope sheets
    (in-degree <= 1) without the iterative accumulation pass. Pits and
    flats (code 0) drain nowhere. Shares d8_flow's single shifted-copy
    shuffle verbatim, then one co-partitioned count join over the SAME
    interior set. Returns (indeg, n_pixels)."""
    dirs = _d8_dir_px(band_px)
    off_dx = {c: dx for dx, _, c, _ in _D8}
    off_dy = {c: dy for _, dy, c, _ in _D8}
    tgt_dx = F.element_at(
        F.create_map(*[x for c in off_dx
                       for x in (F.lit(c), F.lit(off_dx[c]))]), F.col("code"))
    tgt_dy = F.element_at(
        F.create_map(*[x for c in off_dy
                       for x in (F.lit(c), F.lit(off_dy[c]))]), F.col("code"))
    tg = (
        dirs.filter(F.col("code") != 0)
        .select((F.col("gx") + tgt_dx).alias("gx"),
                (F.col("gy") + tgt_dy).alias("gy"))
        .groupBy("gx", "gy").agg(F.count("*").alias("indeg"))
    )
    j = _gj(dirs.select("gx", "gy"), tg, "left")
    return (
        j.select(F.coalesce("indeg", F.lit(0).cast("long"))
                 .cast("int").alias("indeg"))
        .groupBy("indeg")
        .agg(F.count("*").alias("n_pixels"))
    )


def tpi_landform(band_px: DataFrame, threshold: int = 300) -> DataFrame:
    """Topographic Position Index landform classes (Weiss 2001): TPI =
    centre minus mean of the 8-neighbour ring, classified ridge (+1) /
    plane (0) / valley (-1) at +-threshold. The mean never materialises:
    v - sum/8 > t  <=>  8*v - sum > 8*t on exact BIGINTs (the same
    cross-multiplication trick the quality gate uses). Interior-only
    (all 8 neighbours valid). Returns (landform, n_pixels, sum_v)."""
    px = _valid_px(band_px)
    offsets = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx, dy in ((1, 0), (1, 1), (0, 1), (-1, 1),
                       (-1, 0), (-1, -1), (0, -1), (1, -1))
    ])
    nb = (
        px.select("gx", "gy", "v", F.explode(offsets).alias("o"))
        .groupBy(
            (F.col("gx") + F.col("o.dx")).alias("gx"),
            (F.col("gy") + F.col("o.dy")).alias("gy"),
        )
        .agg(F.sum("v").alias("s8"), F.count("*").alias("c8"))
    )
    j = _gj(px, nb).filter(F.col("c8") == 8)
    t8 = F.lit(8 * threshold).cast("long")
    diff = F.lit(8).cast("long") * F.col("v") - F.col("s8")
    landform = (
        F.when(diff > t8, F.lit(1))
        .when(-diff > t8, F.lit(-1))
        .otherwise(F.lit(0))
    )
    return (
        j.select(landform.alias("landform"), "v")
        .groupBy("landform")
        .agg(F.count("*").alias("n_pixels"), F.sum("v").alias("sum_v"))
    )


def class_adjacency(band_px: DataFrame, step: float = 1000.0) -> DataFrame:
    """Unordered class-adjacency (contagion) matrix: quantize DNs to
    classes, count rook-adjacent pixel pairs per unordered class pair
    — the co-occurrence input to FRAGSTATS' contagion / aggregation
    indices (complements landscape_metrics' per-patch view). Each
    adjacency is counted once (east + south neighbours only). Two
    equi-joins on the pixel key; the output is class-domain bounded.
    Returns (class_a, class_b, n_adjacencies) with class_a <= class_b."""
    px = _valid_px(band_px).select(
        "gx", "gy",
        F.floor(F.col("v").cast("double") / F.lit(float(step)))
        .cast("long").alias("c"))
    east = px.select(
        (F.col("gx") - 1).alias("gx"), "gy", F.col("c").alias("cb"))
    south = px.select(
        "gx", (F.col("gy") - 1).alias("gy"), F.col("c").alias("cb"))
    pairs = _gj(px, east).select("c", "cb").unionByName(
        _gj(px, south).select("c", "cb"))
    return (
        pairs.select(
            F.least("c", "cb").alias("class_a"),
            F.greatest("c", "cb").alias("class_b"))
        .groupBy("class_a", "class_b")
        .agg(F.count("*").alias("n_adjacencies"))
    )


def profile_curvature(band_px: DataFrame, cellsize: float = 10.0
                      ) -> DataFrame:
    """Zevenbergen-Thorne (1987) profile curvature sign classes. With
    the 3x3 cells z1..z9 (NW..SE, rows north->south) the five surface
    coefficients have INTEGER numerators
      d = z4+z6-2*z5   e = z2+z8-2*z5   f = -z1+z3+z7-z9
      g = z6-z4        h = z2-z8
    and the curvature 2(DG^2+EH^2+FGH)/(G^2+H^2) collapses to the exact
    rational (2*d*g^2 + 2*e*h^2 + f*g*h) / (2*L^2*(g^2+h^2)) — both
    engines build the identical BIGINT numerator/denominator and apply
    one identical double division + fixed-point rounding, so the
    per-pixel value is bit-deterministic. Zero-gradient pixels
    (g=h=0, curvature undefined) class as 9; otherwise the class is
    the exact integer SIGN of the numerator. Interior-only (full ring
    valid). One shifted-copy shuffle, bounded rollup.
    Returns (curv_class, n_pixels, curv_fp_sum)."""
    num = (lambda d, e, f, g, h: 2 * d * g * g + 2 * e * h * h + f * g * h)
    return _zt_curvature(band_px, cellsize, num)


def plan_curvature(band_px: DataFrame, cellsize: float = 10.0) -> DataFrame:
    """Zevenbergen-Thorne PLAN (tangential) curvature sign classes —
    the across-slope sibling of profile_curvature: with the same exact
    integer coefficients the numerator swaps the gradient weights and
    the cross-term sign, 2*d*h^2 + 2*e*g^2 - f*g*h, over the identical
    denominator. Plan curvature separates flow-CONVERGENT hollows from
    flow-DIVERGENT noses where profile curvature reads acceleration
    along the slope; hydrology stacks want both. Same single
    shifted-copy shuffle, same bit-deterministic one-division contract.
    Returns (curv_class, n_pixels, curv_fp_sum)."""
    num = (lambda d, e, f, g, h: 2 * d * h * h + 2 * e * g * g - f * g * h)
    return _zt_curvature(band_px, cellsize, num)


def _zt_curvature(band_px: DataFrame, cellsize: float, num_fn) -> DataFrame:
    from remotior_sensus_spark.functions.cols import fixed1e6
    px = _valid_px(band_px)
    cells = (  # (dx, dy, zid) with gy growing south: z2 = north = gy-1
        (-1, -1, 1), (0, -1, 2), (1, -1, 3),
        (-1, 0, 4), (0, 0, 5), (1, 0, 6),
        (-1, 1, 7), (0, 1, 8), (1, 1, 9),
    )
    parts = [
        px.select((F.col("gx") - F.lit(dx)).alias("gx"),
                  (F.col("gy") - F.lit(dy)).alias("gy"),
                  F.lit(zid).alias("zid"), F.col("v").alias("z"))
        for dx, dy, zid in cells
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    zcols = [
        F.max(F.when(F.col("zid") == zid, F.col("z"))).alias(f"z{zid}")
        for zid in range(1, 10)
    ]
    g9 = u.groupBy("gx", "gy").agg(
        F.count("*").alias("nz"), *zcols).filter(F.col("nz") == 9)
    d = F.col("z4") + F.col("z6") - 2 * F.col("z5")
    e = F.col("z2") + F.col("z8") - 2 * F.col("z5")
    f = -F.col("z1") + F.col("z3") + F.col("z7") - F.col("z9")
    g = F.col("z6") - F.col("z4")
    h = F.col("z2") - F.col("z8")
    num = num_fn(d, e, f, g, h)
    den = F.lit(int(2 * cellsize * cellsize)).cast("long") \
        * (g * g + h * h)
    curv_fp = fixed1e6(num.cast("double") / den.cast("double"))
    cls = (
        F.when(den == 0, F.lit(9))
        .when(num > 0, F.lit(1))
        .when(num < 0, F.lit(-1))
        .otherwise(F.lit(0))
    )
    return (
        g9.select(cls.alias("curv_class"),
                  F.when(den != 0, curv_fp).otherwise(F.lit(0).cast("long"))
                  .alias("cfp"))
        .groupBy("curv_class")
        .agg(F.count("*").alias("n_pixels"),
             F.sum("cfp").alias("curv_fp_sum"))
    )


def morph_gradient(band_px: DataFrame, threshold: float = 3500.0
                   ) -> DataFrame:
    """Morphological gradient of the threshold mask: per valid pixel,
    max(mask) - min(mask) over the rook neighborhood plus self
    (dilation minus erosion collapsed into one pass) — 1 exactly on
    class boundaries, 0 in interiors, the edge-detector complement of
    the focal dilation/erosion operators. Neighbors that are nodata or
    off-grid simply don't contribute (mask semantics match the
    dilation/erosion oracles). One shifted-copy shuffle whose groupBy
    key co-partitions with the join back to valid centers.
    Returns (grad, n_pixels)."""
    px = _valid_px(band_px)
    m = px.select("gx", "gy",
                  (F.col("v") > F.lit(threshold)).cast("int").alias("m"))
    offs = ((0, 0), (1, 0), (-1, 0), (0, 1), (0, -1))
    parts = [
        m.select((F.col("gx") - F.lit(dx)).alias("gx"),
                 (F.col("gy") - F.lit(dy)).alias("gy"),
                 F.col("m").alias("nm"))
        for dx, dy in offs
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    g = u.groupBy("gx", "gy").agg(
        F.max("nm").alias("mx"), F.min("nm").alias("mn"))
    j = _gj(g, m)
    return (
        j.select((F.col("mx") - F.col("mn")).cast("int").alias("grad"))
        .groupBy("grad")
        .agg(F.count("*").alias("n_pixels"))
    )


def _glcm_reduce(pairs: DataFrame) -> DataFrame:
    """Shared GLCM reduction: (ca, cb, cnt) pair matrix ->
    (n_pairs, contrast, energy, homogeneity_fp). Exact integer
    numerators; homogeneity fixed-point BEFORE the sum."""
    from remotior_sensus_spark.functions.cols import fixed1e6
    d2 = (F.col("ca") - F.col("cb")) * (F.col("ca") - F.col("cb"))
    agg_row = pairs.agg(
        F.sum("cnt").alias("n_pairs"),
        F.sum(F.col("cnt") * d2).alias("con_num"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("en_num"),
        F.sum(fixed1e6(
            F.col("cnt").cast("double")
            / (F.lit(1.0) + d2.cast("double")))).alias("homogeneity_fp"),
    )
    tot = F.col("n_pairs").cast("double")
    return agg_row.select(
        "n_pairs",
        (F.col("con_num").cast("double") / tot).alias("contrast"),
        (F.col("en_num").cast("double") / (tot * tot)).alias("energy"),
        "homogeneity_fp",
    )


def glcm_texture_tiles(band_tiles: DataFrame, step: float = 500.0,
                       tile_px: int | None = None) -> DataFrame:
    """glcm_texture over tile ARRAYS — the same +x pair multiset and
    reduction, restructured for scale: intra-tile co-occurrences are
    extracted map-side from each tile row's adjacent elements (a
    codegen'd filter/transform over the pixel array) and
    partial-aggregate into the level-bounded matrix BEFORE any
    exchange; only the tile-boundary columns cross the wire (last
    column equi-joined to the next tile's first column, ~tile-count
    rows). The exploded-pixel version repartitioned the full raster
    TWICE (both self-join sides); this one shuffles a bounded pair
    matrix plus one thin boundary frame."""
    t = tile_px or TILE_PX
    nd = F.lit(float(NODATA))

    def lv(x):
        return F.floor(x.cast("double") / F.lit(float(step))).cast("long")

    def pair_classes(df):
        valid = lambda s: (s["a"] != nd) & (s["b"] != nd)  # noqa: E731
        return df.select(F.explode(F.filter(F.col("pp"), valid)).alias("s")
                         ).select(lv(F.col("s.a")).alias("ca"),
                                  lv(F.col("s.b")).alias("cb"))

    tiles = band_tiles.select("tile_x", "tile_y", "pixels")
    pos = F.filter(F.sequence(F.lit(0), F.lit(t * t - 1)),
                   lambda p: p % t != t - 1)
    intra = pair_classes(tiles.select(F.transform(pos, lambda p: F.struct(
        F.get(F.col("pixels"), p).alias("a"),
        F.get(F.col("pixels"), p + 1).alias("b"))).alias("pp")))
    last_col = F.sequence(F.lit(t - 1), F.lit(t * t - 1), F.lit(t))
    first_col = F.sequence(F.lit(0), F.lit(t * t - t), F.lit(t))
    left = tiles.select(
        "tile_x", "tile_y",
        F.transform(last_col,
                    lambda p: F.get(F.col("pixels"), p)).alias("lastc"))
    right = tiles.select(
        (F.col("tile_x") - 1).alias("tile_x"), "tile_y",
        F.transform(first_col,
                    lambda p: F.get(F.col("pixels"), p)).alias("firstc"))
    border = pair_classes(
        left.join(right, ["tile_x", "tile_y"]).select(
            F.zip_with("lastc", "firstc", lambda a, b: F.struct(
                a.alias("a"), b.alias("b"))).alias("pp")))
    pairs = (
        intra.unionByName(border)
        .groupBy("ca", "cb").agg(F.count("*").alias("cnt"))
    )
    return _glcm_reduce(pairs)

def multi_scale_tpi(band_px: DataFrame, threshold: float = 300.0
                    ) -> DataFrame:
    """Nested multi-scale TPI landform classes (Weiss 2001): the sign
    class of the topographic position index at radius 1 (8-cell
    neighborhood) CROSSED with radius 2 (24-cell neighborhood) — the
    3x3 grid separating e.g. local ridges on broad slopes from ridges
    on ridgelines. The mean never materializes: class_r =
    sign(|N|*v - sum_N) against |N|*threshold, all BIGINT
    cross-multiplication. Interior-only (both rings complete). ONE
    shifted-copy shuffle builds both rings — every r=2 copy carries an
    in-small flag so the r=1 sums are conditional aggregates of the
    same union, then one co-partitioned join back to center values.
    Returns (landform_small, landform_large, n_pixels, sum_v)."""
    px = _valid_px(band_px)
    offs = [(dx, dy) for dx in (-2, -1, 0, 1, 2) for dy in (-2, -1, 0, 1, 2)
            if not (dx == 0 and dy == 0)]
    parts = [
        px.select((F.col("gx") + F.lit(dx)).alias("gx"),
                  (F.col("gy") + F.lit(dy)).alias("gy"),
                  F.col("v").alias("nv"),
                  F.lit(1 if max(abs(dx), abs(dy)) <= 1 else 0).alias("sm"))
        for dx, dy in offs
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    g = u.groupBy("gx", "gy").agg(
        F.count("*").alias("c24"),
        F.sum("nv").alias("s24"),
        F.sum(F.col("sm").cast("long") * F.col("nv")).alias("s8x"),
    )
    t = int(threshold)
    j = _gj(g.filter(F.col("c24") == 24), px)
    small = (
        F.when(8 * F.col("v") - F.col("s8x") > 8 * t, F.lit(1))
        .when(F.col("s8x") - 8 * F.col("v") > 8 * t, F.lit(-1))
        .otherwise(F.lit(0)).cast("int")
    )
    large = (
        F.when(24 * F.col("v") - F.col("s24") > 24 * t, F.lit(1))
        .when(F.col("s24") - 24 * F.col("v") > 24 * t, F.lit(-1))
        .otherwise(F.lit(0)).cast("int")
    )
    return (
        j.select(small.alias("landform_small"), large.alias("landform_large"),
                 F.col("v"))
        .groupBy("landform_small", "landform_large")
        .agg(F.count("*").alias("n_pixels"), F.sum("v").alias("sum_v"))
    )


def focal_range_bands(band_px: DataFrame) -> DataFrame:
    """Focal range (3x3 queen max - min, the local-relief / roughness
    kernel GDAL exposes as the `range` focal statistic) censused on
    power-of-two bands over the full-neighborhood interior set. One
    shifted-copy shuffle — nine unioned copies groupBy the centre key,
    exactly the morph_gradient shape but on raw DNs — then the
    bounded-band rollup. Range 0 (locally flat) keeps its own -1 band.
    Returns (range_band, n_pixels, sum_range)."""
    px = _valid_px(band_px)
    offs = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    parts = [
        px.select((F.col("gx") - F.lit(dx)).alias("gx"),
                  (F.col("gy") - F.lit(dy)).alias("gy"),
                  F.col("v").alias("nv"))
        for dx, dy in offs
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    g = u.groupBy("gx", "gy").agg(
        F.max("nv").alias("mx"), F.min("nv").alias("mn"),
        F.count("*").alias("c"))
    j = _gj(g.filter(F.col("c") == 9), px)
    r = j.select((F.col("mx") - F.col("mn")).alias("r"))
    band = F.when(F.col("r") > 0,
                  (F.length(F.bin(F.col("r"))) - 1).cast("int")) \
        .otherwise(F.lit(-1))
    return (
        r.select(band.alias("range_band"), "r")
        .groupBy("range_band")
        .agg(F.count("*").alias("n_pixels"),
             F.sum("r").alias("sum_range"))
    )


def semivariogram_aniso(band_px: DataFrame,
                        lags: tuple[int, ...] = (1, 2, 4)) -> DataFrame:
    """Directional (anisotropic) experimental semivariogram along the
    E, N, NE and SE axes — unequal sills/ranges across directions are
    the anisotropy signal that decides whether a kriging model needs a
    rotated variogram ellipse. Same ONE-hash-join shape as
    semivariogram: every (direction, lag) shifted copy carries its
    tag through a single equi-join, exact BIGINT d^2 sums, and the
    gamma division is one deterministic IEEE op per output row.
    Returns (direction, lag, n_pairs, sum_sq_diff, gamma).

    Direction labels are GEOGRAPHIC under this repo's gy-grows-south
    raster convention (see the _D8 and curvature kernels): +gy is
    south, so the NE diagonal is offset (+1, -1) and SE is (+1, +1) —
    the r04 ADVICE note caught the screen-coordinate swap here."""
    px = _valid_px(band_px)
    dirs = (("E", 1, 0), ("N", 0, -1), ("NE", 1, -1), ("SE", 1, 1))
    arr = F.array(*[
        F.struct(F.lit(d).alias("direction"),
                 F.lit(h * dx).alias("ox"), F.lit(h * dy).alias("oy"),
                 F.lit(h).alias("lag"))
        for d, dx, dy in dirs for h in lags
    ])
    shifted = (
        px.select("gx", "gy", "v", F.explode(arr).alias("o"))
        .select((F.col("gx") + F.col("o.ox")).alias("gx"),
                (F.col("gy") + F.col("o.oy")).alias("gy"),
                F.col("o.direction").alias("direction"),
                F.col("o.lag").alias("lag"), F.col("v").alias("v0"))
    )
    pairs = _gj(shifted, px).select(
        "direction", "lag",
        ((F.col("v") - F.col("v0"))
         * (F.col("v") - F.col("v0"))).alias("d2"))
    g = pairs.groupBy("direction", "lag").agg(
        F.count("*").alias("n_pairs"), F.sum("d2").alias("sum_sq_diff"))
    return g.select(
        "direction", "lag", "n_pairs", "sum_sq_diff",
        (F.col("sum_sq_diff").cast("double")
         / (F.lit(2.0) * F.col("n_pairs").cast("double"))).alias("gamma"))


def lbp_census_tiles(band_tiles: DataFrame,
                     tile_px: int | None = None,
                     fan: DataFrame | None = None) -> DataFrame:
    """lbp_census on the focal halo path: one halo shuffle ships each
    tile with its 8 neighbours, the 8 bit-comparisons run as one
    vectorized numpy pass per Arrow group, and only the 256-bounded
    (code, count, sum_v) census leaves each group — replacing the
    8-way shifted-copy union whose corpus-scale hash aggregate
    dominated sf0.1 (~9 s -> halo path). Identical output to
    lbp_census (dense-parity-tested through the registered query)."""
    from remotior_sensus_spark.operators.focal import (
        _assemble_padded, _with_halo_groups)

    T = tile_px or TILE_PX
    offs = ((1, 0, 1), (1, 1, 2), (0, 1, 4), (-1, 1, 8),
            (-1, 0, 16), (-1, -1, 32), (0, -1, 64), (1, -1, 128))

    def kernel(pdf):
        import pandas as pd
        cols = ["code", "n_pixels", "sum_v"]
        if not ((pdf["dx"] == 0) & (pdf["dy"] == 0)).any():
            return pd.DataFrame({c: pd.Series(dtype="int64") for c in cols})
        pad = _assemble_padded(pdf, tile_px=T)
        c = pad[T:2 * T, T:2 * T]
        code = np.zeros(c.shape, dtype=np.int64)
        nvalid = np.zeros(c.shape, dtype=np.int64)
        for dx, dy, bit in offs:
            n = pad[T + dy:2 * T + dy, T + dx:2 * T + dx]
            ok = ~np.isnan(n)
            nvalid += ok
            code += bit * (ok & (n >= c))
        interior = (~np.isnan(c)) & (nvalid == 8)
        if not interior.any():
            return pd.DataFrame({c2: pd.Series(dtype="int64")
                                 for c2 in cols})
        cc = code[interior]
        vv = c[interior].astype(np.int64)
        # bincount instead of a 256-mask scan (r06): one pass each for
        # counts and value sums; DN sums stay < 2^53 so the float64
        # accumulation is exact before the int64 cast
        counts = np.bincount(cc, minlength=256)
        sums = np.bincount(cc, weights=vv.astype(np.float64),
                           minlength=256).astype(np.int64)
        present = np.flatnonzero(counts)
        return pd.DataFrame(
            {"code": present.astype(np.int64),
             "n_pixels": counts[present].astype(np.int64),
             "sum_v": sums[present]})

    halo = fan if fan is not None else _with_halo_groups(band_tiles)
    per_tile = halo.groupBy(
        "target_tx", "target_ty"
    ).applyInPandas(kernel, "code long, n_pixels long, sum_v long")
    return (
        per_tile.groupBy(F.col("code").cast("int").alias("code"))
        .agg(F.sum("n_pixels").alias("n_pixels"),
             F.sum("sum_v").alias("sum_v"))
    )


def semivariogram_aniso_tiles(band_tiles: DataFrame,
                              lags: tuple[int, ...] = (1, 2, 4),
                              tile_px: int | None = None,
                              fan: DataFrame | None = None) -> DataFrame:
    """semivariogram_aniso on the focal halo path: the 12
    (direction, lag) shifted relations collapse into 12 vectorized
    array shifts inside one Arrow group per tile, and only the
    12-row-bounded (direction, lag, n_pairs, sum_sq_diff) census
    crosses the second exchange — replacing the 12-way posexplode
    lineage whose shuffle_hash join dominated sf0.1 (~13 s -> halo
    path). Pair attribution follows the relational head-ownership
    (each pair counted once at its + offset end); max(lags) must be
    <= tile_px so the 3T pad contains every tail. Exact int64 d²
    sums; the gamma division is the same single IEEE op per output
    row. Identical output to semivariogram_aniso."""
    from remotior_sensus_spark.operators.focal import (
        _assemble_padded, _with_halo_groups)

    T = tile_px or TILE_PX
    if max(lags) > T:
        raise ValueError("halo path requires max(lags) <= tile_px")
    dirs = (("E", 1, 0), ("N", 0, -1), ("NE", 1, -1), ("SE", 1, 1))

    def kernel(pdf):
        import pandas as pd
        if not ((pdf["dx"] == 0) & (pdf["dy"] == 0)).any():
            return pd.DataFrame({"direction": pd.Series(dtype="object"),
                                 "lag": pd.Series(dtype="int64"),
                                 "n_pairs": pd.Series(dtype="int64"),
                                 "sum_sq_diff": pd.Series(dtype="int64")})
        pad = _assemble_padded(pdf, tile_px=T)
        c = pad[T:2 * T, T:2 * T]
        cv = ~np.isnan(c)
        rows = []
        for d, dx, dy in dirs:
            for h in lags:
                ox, oy = h * dx, h * dy
                # tail value at head - offset (head = owned pixel)
                n = pad[T - oy:2 * T - oy, T - ox:2 * T - ox]
                sel = cv & ~np.isnan(n)
                npairs = int(sel.sum())
                if npairs == 0:
                    continue
                diff = c[sel] - n[sel]
                rows.append((d, h, npairs, int((diff * diff).sum())))
        return pd.DataFrame(rows, columns=["direction", "lag",
                                           "n_pairs", "sum_sq_diff"])

    halo = fan if fan is not None else _with_halo_groups(band_tiles)
    per_tile = halo.groupBy(
        "target_tx", "target_ty"
    ).applyInPandas(
        kernel, "direction string, lag long, n_pairs long, sum_sq_diff long")
    g = per_tile.groupBy("direction", F.col("lag").cast("int").alias("lag")
                         ).agg(F.sum("n_pairs").alias("n_pairs"),
                               F.sum("sum_sq_diff").alias("sum_sq_diff"))
    return g.select(
        "direction", "lag", "n_pairs", "sum_sq_diff",
        (F.col("sum_sq_diff").cast("double")
         / (F.lit(2.0) * F.col("n_pairs").cast("double"))).alias("gamma"))


def lbp_census(band_px: DataFrame) -> DataFrame:
    """Local binary pattern (LBP-8) texture census: each interior
    pixel's 8-bit code sets bit i when neighbour i >= centre
    (E,NE,N,NW,W,SW,S,SE order), the classic rotation-variant texture
    descriptor — uniform codes (0, 255, contiguous runs) mark flat or
    edge regions, mixed codes mark speckle. Pure integers end to end:
    one shifted-copy shuffle carrying each copy's bit weight, the
    conditional bit sum folds in the same groupBy that enforces the
    full-8 interior, then a 256-bounded rollup. Returns
    (code, n_pixels, sum_v)."""
    px = _valid_px(band_px)
    offs = ((1, 0, 1), (1, 1, 2), (0, 1, 4), (-1, 1, 8),
            (-1, 0, 16), (-1, -1, 32), (0, -1, 64), (1, -1, 128))
    arr = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"),
                 F.lit(b).alias("bit"))
        for dx, dy, b in offs
    ])
    s = (
        px.select("gx", "gy", "v", F.explode(arr).alias("o"))
        .select((F.col("gx") - F.col("o.dx")).alias("gx"),
                (F.col("gy") - F.col("o.dy")).alias("gy"),
                F.col("o.bit").alias("bit"), F.col("v").alias("nv"))
    )
    j = _gj(s, px)
    g = j.groupBy("gx", "gy", "v").agg(
        F.count("*").alias("c"),
        F.sum(F.when(F.col("nv") >= F.col("v"), F.col("bit"))
              .otherwise(F.lit(0))).alias("code"))
    return (
        g.filter(F.col("c") == 8)
        .groupBy(F.col("code").cast("int").alias("code"))
        .agg(F.count("*").alias("n_pixels"), F.sum("v").alias("sum_v"))
    )


def hypsometric_deciles(band_px: DataFrame) -> DataFrame:
    """Hypsometric curve at area deciles: for each d in 1..10, the
    highest DN exceeded by at least d/10 of the valid area, plus the
    exact pixel count at-or-above it — the erosion-stage profile
    (hypsometric integral) read off a DEM. The curve is built on the
    VALUE-DOMAIN HISTOGRAM (one row per distinct DN, <= 65536 rows for
    UInt16), so the single-partition ordered window is bounded and
    cheap at any raster size — the same bounded-domain contract as
    aggregates.cumulative_min_dn; do NOT feed an unbounded domain
    through it. Returns (decile, elevation, cum_area)."""
    px = _valid_px(band_px)
    h = px.groupBy("v").agg(F.count("*").alias("c"))
    w = Window.orderBy(F.desc("v")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    wall = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    cum = h.select("v", F.sum("c").over(w).alias("cum"),
                   F.sum("c").over(wall).alias("tot"))
    d = cum.select(
        "v", "cum", "tot",
        F.explode(F.array(*[F.lit(i) for i in range(1, 11)]))
        .alias("decile"))
    sat = d.filter(F.col("cum") * 10 >= F.col("decile") * F.col("tot"))
    return (
        sat.groupBy("decile")
        .agg(F.max("v").alias("elevation"), F.min("cum").alias("cum_area"))
    )


def _d8_best(pad, rows, cols):
    """Vectorized D8 pick over pad for the region [rows, cols) (pad
    coords): returns (code int64 array, interior mask). Exact-integer
    ranking in float64 (DNs and squared drops stay far inside 2^53),
    first-in-code-order tie-break — the same semantics as the
    relational _d8_dir_px, kernel-for-kernel with the dense parity
    test."""
    c = pad[rows, cols]
    best_m = np.full(c.shape, -1.0)
    best_code = np.zeros(c.shape, dtype=np.int64)
    nvalid = np.zeros(c.shape, dtype=np.int64)
    for dx, dy, code, diag in _D8:
        n = pad[rows.start + dy:rows.stop + dy, cols.start + dx:cols.stop + dx]
        ok = ~np.isnan(n)
        nvalid += ok
        m = np.where(ok & (c > n), (c - n) * (c - n) * (2 - diag), -1.0)
        take = ok & (m > best_m)
        best_m = np.where(take, m, best_m)
        best_code = np.where(take, code, best_code)
    interior = (~np.isnan(c)) & (nvalid == 8)
    codes = np.where(best_m < 0, 0, best_code)
    return codes, interior


def _halo_census(band_tiles: DataFrame, tile_fn, schema: str,
                 out_cols: tuple, tile_px: int | None = None,
                 fan: DataFrame | None = None) -> DataFrame:
    """Shared focal-halo census runner (the d8_flow_tiles shape,
    factored): ONE halo shuffle ships each tile with its 8 neighbours,
    `tile_fn(pad, T)` runs a vectorized numpy pass over the 3Tx3T pad
    and returns a BOUNDED list of census tuples, and only those rows
    leave the Arrow group — the caller adds the final bounded rollup.
    This is the scale contract for every 3x3/5x5 raster census: the
    corpus-size data moves once (tile arrays, not exploded pixels),
    Python sees Arrow batches only, and the second exchange carries
    rows proportional to the census domain, not the raster."""
    from remotior_sensus_spark.operators.focal import (
        _assemble_padded, _with_halo_groups)

    T = tile_px or TILE_PX

    def kernel(pdf):
        import pandas as pd
        rows = []
        if ((pdf["dx"] == 0) & (pdf["dy"] == 0)).any():
            rows = tile_fn(_assemble_padded(pdf, tile_px=T), T)
        if not rows:
            return pd.DataFrame({c: pd.Series(dtype=t) for c, t in out_cols})
        return pd.DataFrame(rows, columns=[c for c, _ in out_cols])

    halo = fan if fan is not None else _with_halo_groups(band_tiles)
    return halo.groupBy(
        "target_tx", "target_ty").applyInPandas(kernel, schema)


def _ring_shifts(pad, T, offs):
    """(centre, list of (shifted view, valid mask)) for the centre
    region [T:2T) of pad."""
    c = pad[T:2 * T, T:2 * T]
    out = []
    for dx, dy in offs:
        n = pad[T + dy:2 * T + dy, T + dx:2 * T + dx]
        out.append((n, ~np.isnan(n)))
    return c, out


def tpi_landform_tiles(band_tiles: DataFrame, threshold: int = 300,
                       tile_px: int | None = None,
                       fan: DataFrame | None = None) -> DataFrame:
    """tpi_landform on the focal halo path (identical output; the
    relational form is the cross-checked reference shape). Same exact
    integer cross-multiplication: 8v - s8 vs 8*threshold."""
    offs = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
            if (dx, dy) != (0, 0)]

    def tile_fn(pad, T):
        c, sh = _ring_shifts(pad, T, offs)
        s8 = np.zeros(c.shape)
        n8 = np.zeros(c.shape, dtype=np.int64)
        for n, ok in sh:
            s8 += np.where(ok, n, 0.0)
            n8 += ok
        interior = (~np.isnan(c)) & (n8 == 8)
        if not interior.any():
            return []
        cv = c[interior].astype(np.int64)
        diff = 8 * cv - s8[interior].astype(np.int64)
        t8 = 8 * threshold
        lf = np.where(diff > t8, 1, np.where(-diff > t8, -1, 0))
        return [(int(k), int((lf == k).sum()), int(cv[lf == k].sum()))
                for k in np.unique(lf)]

    per = _halo_census(band_tiles, tile_fn,
                       "landform long, n_pixels long, sum_v long",
                       (("landform", "int64"), ("n_pixels", "int64"),
                        ("sum_v", "int64")), tile_px, fan)
    return per.groupBy(F.col("landform").cast("int").alias("landform")).agg(
        F.sum("n_pixels").alias("n_pixels"), F.sum("sum_v").alias("sum_v"))


def multi_scale_tpi_tiles(band_tiles: DataFrame, threshold: float = 300.0,
                          tile_px: int | None = None,
                          fan: DataFrame | None = None) -> DataFrame:
    """multi_scale_tpi on the focal halo path (identical output). Both
    rings from the same pad; interior requires the full 24-cell ring."""
    offs = [(dx, dy) for dx in (-2, -1, 0, 1, 2) for dy in (-2, -1, 0, 1, 2)
            if (dx, dy) != (0, 0)]

    def tile_fn(pad, T):
        c, sh = _ring_shifts(pad, T, offs)
        s24 = np.zeros(c.shape)
        s8 = np.zeros(c.shape)
        n24 = np.zeros(c.shape, dtype=np.int64)
        for (dx, dy), (n, ok) in zip(offs, sh):
            s24 += np.where(ok, n, 0.0)
            n24 += ok
            if max(abs(dx), abs(dy)) <= 1:
                s8 += np.where(ok, n, 0.0)
        interior = (~np.isnan(c)) & (n24 == 24)
        if not interior.any():
            return []
        cv = c[interior].astype(np.int64)
        s8i = s8[interior].astype(np.int64)
        s24i = s24[interior].astype(np.int64)
        t = int(threshold)
        small = np.where(8 * cv - s8i > 8 * t, 1,
                         np.where(s8i - 8 * cv > 8 * t, -1, 0))
        large = np.where(24 * cv - s24i > 24 * t, 1,
                         np.where(s24i - 24 * cv > 24 * t, -1, 0))
        key = small * 3 + large  # both in {-1,0,1}: key is injective
        return [(int(s), int(g), int(cnt), int(sv))
                for _k, s, g, cnt, sv in _msk_rollup(key, small, large, cv)]

    per = _halo_census(
        band_tiles, tile_fn,
        "landform_small long, landform_large long, n_pixels long, sum_v long",
        (("landform_small", "int64"), ("landform_large", "int64"),
         ("n_pixels", "int64"), ("sum_v", "int64")), tile_px, fan)
    return per.groupBy(
        F.col("landform_small").cast("int").alias("landform_small"),
        F.col("landform_large").cast("int").alias("landform_large")).agg(
        F.sum("n_pixels").alias("n_pixels"), F.sum("sum_v").alias("sum_v"))


def _msk_rollup(key, small, large, cv):
    for k in np.unique(key):
        sel = key == k
        yield (k, small[sel][0], large[sel][0], sel.sum(), cv[sel].sum())


def _zt_curvature_tiles(band_tiles: DataFrame, cellsize: float, num_fn,
                        tile_px: int | None = None,
                        fan: DataFrame | None = None) -> DataFrame:
    """Zevenbergen-Thorne curvature sign census on the halo path —
    identical exact BIGINT numerator/denominator and the one IEEE
    double division of _zt_curvature, vectorized per tile."""
    cells = ((-1, -1), (0, -1), (1, -1), (-1, 0), (0, 0), (1, 0),
             (-1, 1), (0, 1), (1, 1))  # z1..z9 row-major, gy grows south

    def tile_fn(pad, T):
        c, sh = _ring_shifts(pad, T, cells)
        allv = np.ones(c.shape, dtype=bool)
        for _, ok in sh:
            allv &= ok
        if not allv.any():
            return []
        z = [n[allv].astype(np.int64) for n, _ in sh]
        z1, z2, z3, z4, z5, z6, z7, z8, z9 = z
        d = z4 + z6 - 2 * z5
        e = z2 + z8 - 2 * z5
        f = -z1 + z3 + z7 - z9
        g = z6 - z4
        h = z2 - z8
        num = num_fn(d, e, f, g, h)
        den = int(2 * cellsize * cellsize) * (g * g + h * h)
        cls = np.where(den == 0, 9, np.sign(num)).astype(np.int64)
        fp = np.zeros(num.shape, dtype=np.int64)
        nz = den != 0
        fp[nz] = np.floor(num[nz].astype(np.float64)
                          / den[nz].astype(np.float64)
                          * 1000000.0 + 0.5).astype(np.int64)
        return [(int(k), int((cls == k).sum()), int(fp[cls == k].sum()))
                for k in np.unique(cls)]

    per = _halo_census(band_tiles, tile_fn,
                       "curv_class long, n_pixels long, curv_fp_sum long",
                       (("curv_class", "int64"), ("n_pixels", "int64"),
                        ("curv_fp_sum", "int64")), tile_px, fan)
    return per.groupBy(
        F.col("curv_class").cast("int").alias("curv_class")).agg(
        F.sum("n_pixels").alias("n_pixels"),
        F.sum("curv_fp_sum").alias("curv_fp_sum"))


def profile_curvature_tiles(band_tiles: DataFrame, cellsize: float = 10.0,
                            tile_px: int | None = None,
                            fan: DataFrame | None = None) -> DataFrame:
    return _zt_curvature_tiles(
        band_tiles, cellsize,
        lambda d, e, f, g, h: 2 * d * g * g + 2 * e * h * h + f * g * h,
        tile_px, fan)


def plan_curvature_tiles(band_tiles: DataFrame, cellsize: float = 10.0,
                         tile_px: int | None = None,
                         fan: DataFrame | None = None) -> DataFrame:
    return _zt_curvature_tiles(
        band_tiles, cellsize,
        lambda d, e, f, g, h: 2 * d * h * h + 2 * e * g * g - f * g * h,
        tile_px, fan)


def focal_range_tiles(band_tiles: DataFrame,
                      tile_px: int | None = None,
                      fan: DataFrame | None = None) -> DataFrame:
    """focal_range_bands on the focal halo path (identical output):
    3x3 queen max-min over the full-neighbourhood interior, bit-length
    band via exact frexp exponents."""
    offs = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]

    def tile_fn(pad, T):
        c, sh = _ring_shifts(pad, T, offs)
        mx = np.full(c.shape, -np.inf)
        mn = np.full(c.shape, np.inf)
        cnt = np.zeros(c.shape, dtype=np.int64)
        for n, ok in sh:
            mx = np.where(ok & (n > mx), n, mx)
            mn = np.where(ok & (n < mn), n, mn)
            cnt += ok
        interior = cnt == 9  # includes (0,0): centre valid
        if not interior.any():
            return []
        r = (mx[interior] - mn[interior]).astype(np.int64)
        band = np.full(r.shape, -1, dtype=np.int64)
        pos = r > 0
        band[pos] = np.frexp(r[pos].astype(np.float64))[1] - 1
        return [(int(b), int((band == b).sum()), int(r[band == b].sum()))
                for b in np.unique(band)]

    per = _halo_census(band_tiles, tile_fn,
                       "range_band long, n_pixels long, sum_range long",
                       (("range_band", "int64"), ("n_pixels", "int64"),
                        ("sum_range", "int64")), tile_px, fan)
    return per.groupBy(
        F.col("range_band").cast("int").alias("range_band")).agg(
        F.sum("n_pixels").alias("n_pixels"),
        F.sum("sum_range").alias("sum_range"))


def morph_gradient_tiles(band_tiles: DataFrame, threshold: float = 3500.0,
                         tile_px: int | None = None,
                         fan: DataFrame | None = None) -> DataFrame:
    """morph_gradient on the focal halo path (identical output): rook
    + self threshold-mask max-min per VALID centre; invalid/off-grid
    neighbours simply don't contribute."""
    offs = ((0, 0), (1, 0), (-1, 0), (0, 1), (0, -1))

    def tile_fn(pad, T):
        c, sh = _ring_shifts(pad, T, offs)
        mx = np.zeros(c.shape, dtype=np.int64)
        mn = np.ones(c.shape, dtype=np.int64)
        for n, ok in sh:
            m = (n > threshold).astype(np.int64)
            mx = np.where(ok & (m > mx), m, mx)
            mn = np.where(ok & (m < mn), m, mn)
        valid = ~np.isnan(c)  # centre contributes, so mx>=mn always set
        if not valid.any():
            return []
        grad = (mx - mn)[valid]
        return [(int(g), int((grad == g).sum())) for g in np.unique(grad)]

    per = _halo_census(band_tiles, tile_fn, "grad long, n_pixels long",
                       (("grad", "int64"), ("n_pixels", "int64")), tile_px, fan)
    return per.groupBy(F.col("grad").cast("int").alias("grad")).agg(
        F.sum("n_pixels").alias("n_pixels"))


def d8_flow_tiles(band_tiles: DataFrame,
                  tile_px: int | None = None,
                  fan: DataFrame | None = None) -> DataFrame:
    """d8_flow on the focal halo path: one halo shuffle ships each tile
    with its 8 neighbours, the D8 pick runs as one vectorized numpy
    pass per Arrow group, and only the 9-row-per-tile code census
    crosses the second (bounded) exchange — replacing the 9-way
    shifted-copy union whose 470M-row hash aggregate dominated sf0.1
    (20 s -> ~4 s). Identical output to d8_flow (same exact-integer
    ranking; dense-parity-tested)."""
    from remotior_sensus_spark.operators.focal import (
        _assemble_padded, _with_halo_groups)

    T = tile_px or TILE_PX

    def kernel(pdf):
        import pandas as pd
        cols = ["code", "n_pixels", "sum_gx", "sum_gy"]
        if not ((pdf["dx"] == 0) & (pdf["dy"] == 0)).any():
            return pd.DataFrame({c: pd.Series(dtype="int64") for c in cols})
        tx = int(pdf["target_tx"].iloc[0])
        ty = int(pdf["target_ty"].iloc[0])
        pad = _assemble_padded(pdf, tile_px=T)
        codes, interior = _d8_best(pad, slice(T, 2 * T), slice(T, 2 * T))
        if not interior.any():
            return pd.DataFrame({c: pd.Series(dtype="int64") for c in cols})
        yy, xx = np.nonzero(interior)
        gx = tx * T + xx.astype(np.int64)
        gy = ty * T + yy.astype(np.int64)
        cc = codes[interior]
        out = {}
        for code in np.unique(cc):
            sel = cc == code
            out[int(code)] = (int(sel.sum()), int(gx[sel].sum()),
                              int(gy[sel].sum()))
        return pd.DataFrame(
            {"code": list(out), "n_pixels": [v[0] for v in out.values()],
             "sum_gx": [v[1] for v in out.values()],
             "sum_gy": [v[2] for v in out.values()]})

    halo = fan if fan is not None else _with_halo_groups(band_tiles)
    per_tile = halo.groupBy(
        "target_tx", "target_ty"
    ).applyInPandas(
        kernel, "code long, n_pixels long, sum_gx long, sum_gy long")
    return (
        per_tile.groupBy(F.col("code").cast("int").alias("code"))
        .agg(F.sum("n_pixels").alias("n_pixels"),
             F.sum("sum_gx").alias("sum_gx"),
             F.sum("sum_gy").alias("sum_gy"))
    )


def d8_indegree_tiles(band_tiles: DataFrame,
                      tile_px: int | None = None,
                      fan: DataFrame | None = None) -> DataFrame:
    """d8_indegree on the focal halo path: codes resolve for the
    1-px-EXPANDED centre region (every drainer of an owned pixel lies
    inside it, and its own 3x3 fits inside the 3T pad), the in-degree
    accumulates with eight vectorized shift-adds, and only the bounded
    (indeg, count) census leaves each Arrow group — replacing the two
    corpus-scale exchanges of the relational form (27 s -> ~4 s at
    sf0.1). Identical output (dense-parity-tested)."""
    from remotior_sensus_spark.operators.focal import (
        _assemble_padded, _with_halo_groups)

    T = tile_px or TILE_PX

    def kernel(pdf):
        import pandas as pd
        if not ((pdf["dx"] == 0) & (pdf["dy"] == 0)).any():
            return pd.DataFrame({"indeg": pd.Series(dtype="int64"),
                                 "n_pixels": pd.Series(dtype="int64")})
        pad = _assemble_padded(pdf, tile_px=T)
        rows, cols = slice(T - 1, 2 * T + 1), slice(T - 1, 2 * T + 1)
        codes, interior = _d8_best(pad, rows, cols)
        indeg = np.zeros(codes.shape, dtype=np.int64)
        for dx, dy, code, _diag in _D8:
            src = interior & (codes == code)
            # drain target = source + (dx, dy); shift the source mask
            h, w = src.shape
            ty0, ty1 = max(dy, 0), h + min(dy, 0)
            tx0, tx1 = max(dx, 0), w + min(dx, 0)
            indeg[ty0:ty1, tx0:tx1] += src[ty0 - dy:ty1 - dy,
                                           tx0 - dx:tx1 - dx]
        own = np.zeros(codes.shape, dtype=bool)
        own[1:T + 1, 1:T + 1] = True
        sel = interior & own
        if not sel.any():
            return pd.DataFrame({"indeg": pd.Series(dtype="int64"),
                                 "n_pixels": pd.Series(dtype="int64")})
        vals, counts = np.unique(indeg[sel], return_counts=True)
        return pd.DataFrame({"indeg": vals.astype(np.int64),
                             "n_pixels": counts.astype(np.int64)})

    halo = fan if fan is not None else _with_halo_groups(band_tiles)
    per_tile = halo.groupBy(
        "target_tx", "target_ty"
    ).applyInPandas(kernel, "indeg long, n_pixels long")
    return (
        per_tile.groupBy(F.col("indeg").cast("int").alias("indeg"))
        .agg(F.sum("n_pixels").alias("n_pixels"))
    )


# ---------------------------------------------------------------------------
# Viewshed (bounded-radius multi-observer visibility, R3 sampled LOS)
# ---------------------------------------------------------------------------

# fixed-point elevation scale (the repo-wide 1e6 convention) and the
# opaque stand-in for nodata cells: large enough that a nodata
# intermediate always blocks, small enough that (HUGE - z)*R never
# leaves int64 ((2^50)*R ~ 2.7e16 at R=24)
_VS_SCALE = 1_000_000
_VS_OPAQUE = np.int64(1) << np.int64(50)

_VS_GEOM: dict[int, tuple] = {}


def _vs_geometry(radius: int):
    """Static LOS geometry for a radius-R Chebyshev disk, cached per
    process: target offsets (OFF_DY, OFF_DX) for 1 <= cheb <= R, and
    the flat (target, intermediate) table (P_DY, P_DX, I_STEP, D_TGT,
    T_IDX) of every sampled ray point. Sampling is the R3 grid rule:
    for a target at offset m along the minor axis and d = cheb along
    the major axis, step i (1 <= i < d) visits minor coordinate
    sign(m) * ((2|m|i + d) // (2d)) — nearest cell, ties away from
    zero, exact in integers (no float rounding anywhere)."""
    if radius in _VS_GEOM:
        return _VS_GEOM[radius]
    off_dy, off_dx = [], []
    p_dy, p_dx, i_step, d_tgt, t_idx = [], [], [], [], []

    def _minor(m: int, i: int, d: int) -> int:
        if m >= 0:
            return (2 * m * i + d) // (2 * d)
        return -((2 * (-m) * i + d) // (2 * d))

    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            d = max(abs(dy), abs(dx))
            if d == 0:
                continue
            t = len(off_dy)
            off_dy.append(dy)
            off_dx.append(dx)
            for i in range(1, d):
                if abs(dy) >= abs(dx):
                    py = (i if dy > 0 else -i)
                    px = _minor(dx, i, d)
                else:
                    px = (i if dx > 0 else -i)
                    py = _minor(dy, i, d)
                p_dy.append(py)
                p_dx.append(px)
                i_step.append(i)
                d_tgt.append(d)
                t_idx.append(t)
    geom = (np.array(off_dy, dtype=np.int64),
            np.array(off_dx, dtype=np.int64),
            np.array(p_dy, dtype=np.int64),
            np.array(p_dx, dtype=np.int64),
            np.array(i_step, dtype=np.int64),
            np.array(d_tgt, dtype=np.int64),
            np.array(t_idx, dtype=np.int64))
    _VS_GEOM[radius] = geom
    return geom


def viewshed_tiles(band_tiles: DataFrame, radius: int = 24,
                   obs_min: float = 4990.0,
                   tile_px: int | None = None,
                   fan: DataFrame | None = None) -> DataFrame:
    """Multi-observer viewshed census (GRASS r.viewshed class — the
    reference shells terrain analysis out to gdaldem and has no
    viewshed; standard public definition): observers are valid cells
    with value >= obs_min; every valid cell t gets
        n_visible(t) = #{observers o : cheb(o, t) <= radius and
                         LOS(o -> t) unobstructed}
    (an observer always sees itself). LOS uses the R3 sampled-ray
    rule: target at major-axis distance d is blocked iff some sampled
    point p at step i satisfies
        (z_p - z_o) * d >= (z_t - z_o) * i
    — the cross-multiplied exact-integer form of "p's elevation angle
    reaches t's", on rint(z * 1e6) int64 fixed-point elevations.
    Nodata cells are opaque (they block), are never observers, and are
    excluded from the census. Output: one row per visibility count
    (n_visible, n_pixels).

    Scale shape: ONE halo exchange (the _halo_census contract — tile
    arrays move once, never exploded pixels); per pad the kernel loops
    only over the ~0.2%-density observer set, and each observer is
    ~6 vectorized gathers over the precomputed flat ray table (~37k
    rows at R=24), so per-tile cost is O(observers x R^3) fully inside
    numpy. Output rows are bounded by the observer-count domain, not
    the raster. Requires 2 * radius <= tile_px so every observer that
    can reach a centre cell sits inside the 3x3 pad with its whole
    disk (asserted)."""
    T = tile_px or TILE_PX
    if 2 * radius > T:
        raise ValueError(
            f"viewshed radius {radius} needs 2*radius <= tile_px={T} "
            "(observer disks must fit the 3x3 halo pad)")
    off_dy, off_dx, p_dy, p_dx, i_step, d_tgt, t_idx = _vs_geometry(radius)
    n_t = len(off_dy)
    obs_fp = int(round(obs_min * _VS_SCALE))

    def tile_fn(pad, T):
        P = 3 * T
        valid = ~np.isnan(pad)
        zq = np.where(valid, np.rint(
            np.nan_to_num(pad, nan=0.0) * _VS_SCALE), 0.0).astype(np.int64)
        zq[~valid] = _VS_OPAQUE
        counts = np.zeros((P, P), dtype=np.int64)
        obs = valid & (zq >= obs_fp) & (zq < _VS_OPAQUE)
        oy_all, ox_all = np.nonzero(obs)
        box = ((oy_all >= T - radius) & (oy_all < 2 * T + radius) &
               (ox_all >= T - radius) & (ox_all < 2 * T + radius))
        for oy, ox in zip(oy_all[box].tolist(), ox_all[box].tolist()):
            z_o = zq[oy, ox]
            ty = oy + off_dy
            tx = ox + off_dx
            z_t = zq[ty, tx]
            z_p = zq[oy + p_dy, ox + p_dx]
            blocked = (z_p - z_o) * d_tgt >= (z_t[t_idx] - z_o) * i_step
            n_blk = np.bincount(t_idx[blocked], minlength=n_t)
            vis = (n_blk == 0) & (z_t < _VS_OPAQUE)
            np.add.at(counts, (ty[vis], tx[vis]), 1)
            counts[oy, ox] += 1
        cc = counts[T:2 * T, T:2 * T]
        vc = valid[T:2 * T, T:2 * T]
        if not vc.any():
            return []
        vals, n = np.unique(cc[vc], return_counts=True)
        return [(int(v), int(k)) for v, k in zip(vals, n)]

    per = _halo_census(band_tiles, tile_fn,
                       "n_visible long, n_pixels long",
                       (("n_visible", "int64"), ("n_pixels", "int64")),
                       tile_px, fan)
    return per.groupBy(
        F.col("n_visible").cast("int").alias("n_visible")).agg(
        F.sum("n_pixels").alias("n_pixels"))


def openness_tiles(band_tiles: DataFrame, radius: int = 24,
                   tile_px: int | None = None,
                   fan: DataFrame | None = None) -> DataFrame:
    """Topographic openness census (Yokoyama et al. 2002 class — the
    reference shells terrain analysis to gdaldem and has no openness):
    for each valid cell o and each of the 8 compass directions k, the
    horizon slope within radius R is
        s_k(o) = max_{i=1..R, sample valid} (z(o + i*dir_k) - z(o)) * 1024 // i
    (exact int64 fixed-point: elevations rint(z * 1e6), slope scaled
    x1024, floor division — deterministic in numpy and pure Python
    alike). Nodata / outside-raster samples are skipped; a direction
    with no valid sample contributes 0. The openness score is
    sum_k s_k (positive = enclosed below horizons, negative = open
    peak); census bands are sign-aware log2: band = sign(score) *
    bit_length(|score|), 0 for score 0. Output (open_band, n_pixels).

    Scale shape: the _halo_census contract — one halo exchange, then
    8 x R dense shifted-slice max updates over the pad per tile
    (~192 vectorized ops at R=24), no Python per-pixel work. Requires
    radius <= tile_px so all samples stay inside the 3x3 pad."""
    T0 = tile_px or TILE_PX
    if radius > T0:
        raise ValueError(
            f"openness radius {radius} needs radius <= tile_px={T0}")
    dirs = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)
            if (dy, dx) != (0, 0)]
    NEG = np.int64(-(1 << 62))

    def tile_fn(pad, T):
        valid = ~np.isnan(pad)
        zq = np.where(valid, np.rint(
            np.nan_to_num(pad, nan=0.0) * _VS_SCALE), 0.0).astype(np.int64)
        zc = zq[T:2 * T, T:2 * T]
        vc = valid[T:2 * T, T:2 * T]
        if not vc.any():
            return []
        score = np.zeros((T, T), dtype=np.int64)
        for dy, dx in dirs:
            best = np.full((T, T), NEG, dtype=np.int64)
            for i in range(1, radius + 1):
                ys = slice(T + i * dy, 2 * T + i * dy)
                xs = slice(T + i * dx, 2 * T + i * dx)
                dz = (zq[ys, xs] - zc) * 1024 // i
                np.maximum(best, np.where(valid[ys, xs], dz, NEG),
                           out=best)
            score += np.where(best == NEG, np.int64(0), best)
        sc = score[vc]
        # sign-aware bit_length: for |s| >= 1 frexp's exponent IS
        # floor(log2)+1, exact for int64 magnitudes (< 2^53 here)
        pos = sc != 0
        _, expo = np.frexp(np.abs(sc[pos]).astype(np.float64))
        band = np.zeros(len(sc), dtype=np.int64)
        band[pos] = np.sign(sc[pos]) * expo
        vals, n = np.unique(band, return_counts=True)
        return [(int(v), int(k)) for v, k in zip(vals, n)]

    per = _halo_census(band_tiles, tile_fn,
                       "open_band long, n_pixels long",
                       (("open_band", "int64"), ("n_pixels", "int64")),
                       tile_px, fan)
    return per.groupBy(
        F.col("open_band").cast("int").alias("open_band")).agg(
        F.sum("n_pixels").alias("n_pixels"))


# geomorphon 10-class lookup (Jasiewicz & Stepinski 2013, the GRASS
# r.geomorphon form matrix), indexed [n_minus][n_plus]: 1 flat, 2 peak,
# 3 ridge, 4 shoulder, 5 spur, 6 slope, 7 hollow, 8 footslope,
# 9 valley, 10 pit
_GEOMORPHON_LUT = np.array([
    # n_plus ->  0  1  2  3  4  5  6  7  8        n_minus
    [1, 1, 1, 8, 8, 9, 9, 9, 10],   # 0
    [1, 1, 8, 8, 8, 9, 9, 9, 0],    # 1
    [1, 4, 6, 6, 7, 7, 9, 0, 0],    # 2
    [4, 4, 6, 6, 6, 7, 0, 0, 0],    # 3
    [4, 4, 5, 6, 6, 0, 0, 0, 0],    # 4
    [3, 3, 5, 5, 0, 0, 0, 0, 0],    # 5
    [3, 3, 3, 0, 0, 0, 0, 0, 0],    # 6
    [3, 3, 0, 0, 0, 0, 0, 0, 0],    # 7
    [2, 0, 0, 0, 0, 0, 0, 0, 0],    # 8
], dtype=np.int64)


def geomorphon_tiles(band_tiles: DataFrame, radius: int = 24,
                     flat_fp: int = 18,
                     tile_px: int | None = None,
                     fan: DataFrame | None = None) -> DataFrame:
    """Geomorphon landform census (Jasiewicz & Stepinski 2013 /
    GRASS r.geomorphon class): for each valid cell o and each of the 8
    compass directions, the ZENITH slope z_k = max and NADIR slope
    n_k = min of (z(o + i*dir) - z(o)) * 1024 // i over valid samples
    i = 1..R (exact int64 fixed-point, skipped samples transparent).
    The ternary pattern per direction (flatness threshold t = flat_fp,
    default 18 ~ 1 degree):

        +1  if z_k > t and z_k > -n_k      (horizon above)
        -1  if -n_k > t and -n_k > z_k     (horizon below)
         0  otherwise (flat or exactly balanced)

    Directions with no valid sample count as 0. (n_minus, n_plus)
    index the 10-class form matrix above (class 0 = the matrix's
    impossible corner, kept so a logic error surfaces as a visible
    class instead of an exception). Output (landform, n_pixels).

    Scale shape: identical to openness_tiles — one halo exchange, 8xR
    dense shifted-slice min/max updates per pad, census rows bounded
    by the 11-value class domain."""
    T0 = tile_px or TILE_PX
    if radius > T0:
        raise ValueError(
            f"geomorphon radius {radius} needs radius <= tile_px={T0}")
    dirs = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)
            if (dy, dx) != (0, 0)]
    NEG = np.int64(-(1 << 62))
    POS = np.int64(1 << 62)
    t = np.int64(flat_fp)

    def tile_fn(pad, T):
        valid = ~np.isnan(pad)
        zq = np.where(valid, np.rint(
            np.nan_to_num(pad, nan=0.0) * _VS_SCALE), 0.0).astype(np.int64)
        zc = zq[T:2 * T, T:2 * T]
        vc = valid[T:2 * T, T:2 * T]
        if not vc.any():
            return []
        n_plus = np.zeros((T, T), dtype=np.int64)
        n_minus = np.zeros((T, T), dtype=np.int64)
        for dy, dx in dirs:
            zen = np.full((T, T), NEG, dtype=np.int64)
            nad = np.full((T, T), POS, dtype=np.int64)
            for i in range(1, radius + 1):
                ys = slice(T + i * dy, 2 * T + i * dy)
                xs = slice(T + i * dx, 2 * T + i * dx)
                dz = (zq[ys, xs] - zc) * 1024 // i
                ok = valid[ys, xs]
                np.maximum(zen, np.where(ok, dz, NEG), out=zen)
                np.minimum(nad, np.where(ok, dz, POS), out=nad)
            has = zen != NEG
            zen_v = np.where(has, zen, np.int64(0))
            nad_v = np.where(has, -nad, np.int64(0))   # -n_k >= 0 side
            n_plus += (zen_v > t) & (zen_v > nad_v)
            n_minus += (nad_v > t) & (nad_v > zen_v)
        lf = _GEOMORPHON_LUT[n_minus[vc], n_plus[vc]]
        vals, n = np.unique(lf, return_counts=True)
        return [(int(v), int(k)) for v, k in zip(vals, n)]

    per = _halo_census(band_tiles, tile_fn,
                       "landform long, n_pixels long",
                       (("landform", "int64"), ("n_pixels", "int64")),
                       tile_px, fan)
    return per.groupBy(
        F.col("landform").cast("int").alias("landform")).agg(
        F.sum("n_pixels").alias("n_pixels"))


# ---------------------------------------------------------------------------
# Contour census (marching squares, census form — no stitching needed)
# ---------------------------------------------------------------------------

_CONTOUR_LEVELS = (1000.0, 2000.0, 3000.0, 4000.0)


def _marching_cells(a, b, c, d, level):
    """Vectorized marching squares over 2x2 cells with corners
    a=tl, b=tr, c=bl, d=br (same-shape arrays): returns
    (n_segments, sum_len_fp) for one contour level.  Linear
    edge interpolation, >= level inclusion, saddle cells decided by
    the corner-mean rule (center >= level joins the >= diagonal);
    every segment length is quantized to 2^-20 fixed point BEFORE
    summation so the total is order-independent across any tile
    decomposition."""
    valid = ~(np.isnan(a) | np.isnan(b) | np.isnan(c) | np.isnan(d))
    av = np.where(valid, a, 0.0)
    bv = np.where(valid, b, 0.0)
    cv = np.where(valid, c, 0.0)
    dv = np.where(valid, d, 0.0)
    ga, gb = av >= level, bv >= level
    gc, gd = cv >= level, dv >= level
    cr_t = valid & (ga != gb)
    cr_r = valid & (gb != gd)
    cr_b = valid & (gc != gd)
    cr_l = valid & (ga != gc)
    with np.errstate(all="ignore"):
        # crossing coordinates relative to the cell's top-left corner
        xt = (level - av) / (bv - av)          # top edge: (xt, 0)
        yr = (level - bv) / (dv - bv)          # right:    (1, yr)
        xb = (level - cv) / (dv - cv)          # bottom:   (xb, 1)
        yl = (level - av) / (cv - av)          # left:     (0, yl)
    pts = {"t": (xt, np.zeros_like(xt)), "r": (np.ones_like(yr), yr),
           "b": (xb, np.ones_like(xb)), "l": (np.zeros_like(yl), yl)}
    cross = {"t": cr_t, "r": cr_r, "b": cr_b, "l": cr_l}
    ncross = (cr_t.astype(np.int64) + cr_r + cr_b + cr_l)

    def seg_fp(e1, e2, mask):
        (x1, y1), (x2, y2) = pts[e1], pts[e2]
        with np.errstate(all="ignore"):
            # explicit sqrt(dx^2+dy^2), NOT hypot: np.hypot and
            # math.hypot may differ by 1 ulp, and the oracle builder
            # computes the same expression scalar-side
            dx, dy = x1 - x2, y1 - y2
            ln = np.sqrt(dx * dx + dy * dy)
        fp = np.floor(ln * 1048576.0 + 0.5)
        return int(mask.sum()), int(fp[mask].astype(np.int64).sum())

    n_seg = 0
    s_fp = 0
    two = ncross == 2
    for e1, e2 in (("t", "r"), ("t", "b"), ("t", "l"),
                   ("r", "b"), ("r", "l"), ("b", "l")):
        m = two & cross[e1] & cross[e2]
        n, s = seg_fp(e1, e2, m)
        n_seg += n
        s_fp += s
    saddle_a = valid & ga & gd & ~gb & ~gc
    saddle_b = valid & gb & gc & ~ga & ~gd
    center_ge = (av + bv + cv + dv) >= 4.0 * level
    m_trbl = (saddle_a & center_ge) | (saddle_b & ~center_ge)
    m_tlbr = (saddle_a & ~center_ge) | (saddle_b & center_ge)
    for e1, e2, m in (("t", "r", m_trbl), ("b", "l", m_trbl),
                      ("t", "l", m_tlbr), ("r", "b", m_tlbr)):
        n, s = seg_fp(e1, e2, m)
        n_seg += n
        s_fp += s
    return n_seg, s_fp


def contour_census_tiles(band_tiles: DataFrame,
                         levels: tuple[float, ...] = _CONTOUR_LEVELS,
                         tile_px: int | None = None,
                         fan: DataFrame | None = None) -> DataFrame:
    """Iso-contour census by marching squares — the census form of
    contour extraction (gdal_contour's statistics without the vector
    sink): per level, how many line segments the contour field
    contains and their exact fixed-point total length in pixel units.
    Because segments are LOCAL to their 2x2 pixel cell, no cross-tile
    stitching exists: each cell is owned by its top-left pixel's tile
    and the right/bottom corners come from the standard focal halo —
    ONE halo exchange, a vectorized numpy pass per Arrow group, and a
    |levels|-row bounded rollup.  Nodata-cornered cells contribute
    nothing; >= level inclusion; saddles by the corner-mean rule; all
    documented in _marching_cells and mirrored by the dense oracle
    (synth/expected.py build_contour_census) and a per-cell
    pure-Python third reference.  Returns
    (level, n_segments, sum_len_fp)."""
    T = tile_px or TILE_PX

    def kernel(pdf):
        import pandas as pd
        cols = ["level", "n_segments", "sum_len_fp"]
        from remotior_sensus_spark.operators.focal import _assemble_padded
        if not ((pdf["dx"] == 0) & (pdf["dy"] == 0)).any():
            return pd.DataFrame({c: pd.Series(dtype="int64")
                                 for c in cols})
        pad = _assemble_padded(pdf, tile_px=T)
        a = pad[T:2 * T, T:2 * T]
        b = pad[T:2 * T, T + 1:2 * T + 1]
        c = pad[T + 1:2 * T + 1, T:2 * T]
        d = pad[T + 1:2 * T + 1, T + 1:2 * T + 1]
        rows = []
        for lv in levels:
            n, s = _marching_cells(a, b, c, d, float(lv))
            if n:
                rows.append((int(lv), n, s))
        return pd.DataFrame(rows, columns=cols)

    from remotior_sensus_spark.operators.focal import _with_halo_groups
    halo = fan if fan is not None else _with_halo_groups(band_tiles)
    per = halo.groupBy("target_tx", "target_ty").applyInPandas(
        kernel, "level long, n_segments long, sum_len_fp long")
    return (per.groupBy(F.col("level").cast("int").alias("level"))
            .agg(F.sum("n_segments").alias("n_segments"),
                 F.sum("sum_len_fp").alias("sum_len_fp")))


def box_counting(band_px: DataFrame, threshold: float = 3000.0,
                 scales: tuple[int, ...] = (1, 2, 4, 8, 16)) -> DataFrame:
    """Box-counting census of the >= threshold mask: occupied-box
    counts N(s) at power-of-two box sizes — the exact ingredients of
    the Minkowski–Bouligand (box-counting) fractal dimension; the
    log N vs log(1/s) slope is left to the consumer so the result
    stays all-integer.

    Scale shape: every scale divides the tile size, so a box NEVER
    spans tiles and the distinct collapses map-side (partial
    aggregation before the one hash shuffle, which carries at most
    the distinct-box cardinality x |scales|); the rollup is
    |scales| rows.  Returns (scale, n_boxes)."""
    px = _valid_px(band_px).filter(F.col("v") >= float(threshold))
    arr = F.array(*[F.lit(int(s)) for s in scales])
    boxes = (px.select(F.explode(arr).alias("scale"), "gx", "gy")
             .select("scale",
                     F.expr("div(gx, scale)").alias("bx"),
                     F.expr("div(gy, scale)").alias("by"))
             .distinct())
    return boxes.groupBy("scale").agg(F.count("*").alias("n_boxes"))


def lacunarity(band_px: DataFrame, threshold: float = 3000.0,
               scales: tuple[int, ...] = (2, 4, 8, 16)) -> DataFrame:
    """Aligned-box lacunarity of the >= threshold mask — the
    landscape-ecology texture statistic (Plotnick 1993; the
    gliding-box Λ(r) computed on the aligned box lattice): per box
    size s, the mass distribution's second moment ratio
        Λ(s) = B · Σ m_b² / (Σ m_b)²
    over ALL boxes of the bounding grid (empty boxes count — they ARE
    the gappiness signal), m_b = mask pixels in box b.  Complements
    box_counting: occupancy says where the mask is, lacunarity says
    how gap-riddled its mass is across scales.

    All sufficient statistics are exact integers: the occupied-box
    masses come from one (scale, box) groupBy (scales divide the tile
    size, so the partial aggregate collapses map-side exactly like
    box_counting), the total box count B comes from the valid-extent
    scalar (one broadcast cross join), and empty boxes contribute
    zero to both Σm and Σm² — only the final Λ ratio is a double,
    mirrored op-for-op in the oracle.  Returns
    (scale, n_boxes, occupied_boxes, sum_mass, sum_mass_sq,
    lacunarity)."""
    px = _valid_px(band_px)
    ext = px.agg((F.max("gx") + 1).alias("w"),
                 (F.max("gy") + 1).alias("h"))
    m = px.filter(F.col("v") >= float(threshold))
    arr = F.array(*[F.lit(int(s)) for s in scales])
    boxes = (m.select(F.explode(arr).alias("scale"), "gx", "gy")
             .groupBy("scale",
                      F.expr("div(gx, scale)").alias("bx"),
                      F.expr("div(gy, scale)").alias("by"))
             .agg(F.count("*").alias("mass")))
    sums = (boxes.groupBy("scale")
            .agg(F.count("*").alias("occupied_boxes"),
                 F.sum("mass").alias("sum_mass"),
                 F.sum(F.col("mass") * F.col("mass"))
                 .alias("sum_mass_sq"))
            .crossJoin(F.broadcast(ext)))
    # ceil(w/s)*ceil(h/s) via the positive-operand-safe idiom
    # ((x + s - 1) div s): Spark's div truncates toward zero while
    # DuckDB's // floors, so the -div(-x, s) trick would silently
    # disagree between engine and oracle
    nb = (F.expr("div(w + scale - 1, scale)")
          * F.expr("div(h + scale - 1, scale)"))
    return sums.select(
        "scale",
        nb.cast("long").alias("n_boxes"),
        "occupied_boxes", "sum_mass", "sum_mass_sq",
        ((nb.cast("double") * F.col("sum_mass_sq").cast("double"))
         / (F.col("sum_mass").cast("double")
            * F.col("sum_mass").cast("double"))).alias("lacunarity"))
