"""Per-pixel classification (minimum distance, spectral angle, maximum
likelihood), spectral distance between bandsets, k-means clustering.

Reference: core/processor_functions.py:369-469 (min dist), :473-576
(SAM), :243-365 (ML with per-class covariance + chi2 threshold),
:580-618 (spectral_distance); tools/band_clustering.py:118-344.

Spark-first: the signature catalog is tiny (the reference broadcasts it
to workers; we bake it into literal Column coefficients at plan time —
"broadcast at the plan level"). Distances over integer-valued pixels
are computed as exact BIGINT sums of squares, so argmin has no float
ties and matches any oracle bit-for-bit. Argmin itself is
``array_min(array(struct(dist, class)))`` — struct comparison breaks
ties by signature order, exactly np.argmin's first-wins.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from remotior_sensus_spark import NODATA
from remotior_sensus_spark.grid import TILE_PX

N_PX = TILE_PX * TILE_PX


def _valid(env: dict[str, Column], nodata: float) -> Column:
    import functools
    import operator as op
    return functools.reduce(op.and_, [env[b] != F.lit(nodata) for b in env])


def _argmin_struct(pairs: list[tuple[Column, int]]) -> Column:
    """argmin with first-wins ties (np.argmin semantics): least() of the
    values + a when-chain in signature order. Pure arithmetic — the
    struct-array formulation blew past codegen limits for >5 classes and
    fell back to interpreted evaluation."""
    dmin = F.least(*[d for d, _ in pairs]) if len(pairs) > 1 else pairs[0][0]
    out = None
    for d, c in pairs:
        out = F.when(d == dmin, F.lit(c)) if out is None else out.when(d == dmin, F.lit(c))
    return out


def min_distance_class(env: dict[str, Column], signatures: list[dict],
                       nodata: float = NODATA,
                       unclassified: int = 0) -> Column:
    """env: band -> pixel Column. signatures: [{class_id, values: {band:
    v}, threshold}] in catalog order. Euclidean argmin; per-signature
    threshold writes unclassified (processor_functions.py:421-425)."""
    pairs = min_distance_scores(env, signatures)
    cls = _argmin_struct(pairs)
    out = cls
    thr_sigs = [s for s in signatures if s.get("threshold", 0) > 0]
    if thr_sigs:
        # only the minimum distance is needed — F.least keeps codegen
        # alive for >5 classes where the struct-array array_min
        # formulation falls back to interpreted mode (see _argmin_struct)
        dmin = F.least(*[d for d, _ in pairs]) if len(pairs) > 1 else pairs[0][0]
        # global/per-signature threshold on the REAL distance
        thr_map = {s["class_id"]: float(s["threshold"]) for s in thr_sigs}
        cond = None
        for cid, thr in thr_map.items():
            c = (cls == cid) & (F.sqrt(dmin.cast("double")) > thr)
            cond = c if cond is None else cond | c
        out = F.when(cond, F.lit(unclassified)).otherwise(cls)
    return F.when(_valid(env, nodata), out).otherwise(F.lit(int(nodata)))


def spectral_angle_class(env: dict[str, Column], signatures: list[dict],
                         nodata: float = NODATA) -> Column:
    """SAM: arccos(x.v/(|x||v|)) * 180/pi, argmin
    (processor_functions.py:473-576)."""
    pairs = spectral_angle_scores(env, signatures)
    cls = _argmin_struct(pairs)
    return F.when(_valid(env, nodata), cls).otherwise(F.lit(int(nodata)))


def chi2_sf(x: float, df: int) -> float:
    """Chi-square survival function via the regularized upper incomplete
    gamma (closed form for integer/half-integer shape) — scipy-free
    replacement for scipy.stats.chi2.sf."""
    import math
    y = x / 2.0
    if df % 2 == 0:
        term, s = 1.0, 1.0
        for j in range(1, df // 2):
            term *= y / j
            s += term
        return math.exp(-y) * s
    q = math.erfc(math.sqrt(y))
    a = 0.5
    while a + 1 <= df / 2.0:
        q += (y ** a) * math.exp(-y) / math.gamma(a + 1)
        a += 1
    return q


def chi2_isf(p: float, df: int) -> float:
    """Inverse survival (scipy.stats.chi2.isf analogue) by bisection —
    the reference uses it for the ML threshold
    (processor_functions.py:328-340)."""
    if not 0.0 < p < 1.0:
        raise ValueError("p must be in (0, 1)")
    hi = 1.0
    while chi2_sf(hi, df) > p:
        hi *= 2
    lo = 0.0
    for _ in range(200):
        mid = (lo + hi) / 2
        if chi2_sf(mid, df) > p:
            lo = mid
        else:
            hi = mid
    return (lo + hi) / 2


def ml_scores(env: dict[str, Column], stats: list[dict],
              threshold: float | bool | None = None
              ) -> list[tuple[Column, int]]:
    """Per-class ML discriminants -ln|Sigma| - d' Sigma^-1 d as Columns,
    with the reference's chi-square threshold applied (scores below
    -2*chi2.isf(p, df) - ln|Sigma| become -inf, i.e. excluded)."""
    pairs = []
    for st in stats:
        bands = list(st["means"].keys())
        cov = np.asarray(st["cov"], dtype=np.float64)
        inv = np.linalg.inv(cov)
        logdet = float(np.log(np.linalg.det(cov)))
        d = [env[b].cast("double") - F.lit(float(st["means"][b])) for b in bands]
        # Sigma^-1 is symmetric: fold the (i,j)/(j,i) pairs into one
        # 2*inv[i][j] term — 10 terms instead of 16 per class, which
        # keeps the 5-class discriminant stack inside janino's 64 KB
        # per-method codegen limit (the full expansion fell back to
        # interpreted mode). The DuckDB oracle mirrors this exact
        # accumulation order (queries._ml_oracle_sql).
        quad = None
        for i in range(len(bands)):
            for j in range(i, len(bands)):
                coef = float(inv[i, j]) if i == j else 2.0 * float(inv[i, j])
                t = d[i] * d[j] * F.lit(coef)
                quad = t if quad is None else quad + t
        score = -F.lit(logdet) - quad
        p = None
        if threshold is True:
            p = float(st.get("threshold", 0.0) or 0.0)
        elif threshold not in (None, False):
            p = float(threshold)
        if p and p > 0:
            chi = chi2_isf(p / 100.0, len(bands))
            chi_thr = -2.0 * chi - logdet
            score = F.when(score < F.lit(chi_thr),
                           F.lit(float("-inf"))).otherwise(score)
        pairs.append((score, st["class_id"]))
    return pairs


def max_likelihood_class(env: dict[str, Column], stats: list[dict],
                         nodata: float = NODATA,
                         threshold: float | bool | None = None,
                         unclassified: int = 0) -> Column:
    """ML argmax with first-wins ties + chi-square threshold
    (processor_functions.py:243-365). `stats`: [{class_id, means: {band:
    mu}, cov: ndarray}] — covariances from train_class_stats; the 4x4
    inverse is computed on the driver and baked into literal coefficients
    (the reference equally precomputes cov before the per-pixel pass)."""
    pairs = ml_scores(env, stats, threshold)
    cls = _argmin_struct([(-s, c) for s, c in pairs])
    if threshold not in (None, False):
        best = F.greatest(*[s for s, _ in pairs]) if len(pairs) > 1 else pairs[0][0]
        cls = F.when(best == F.lit(float("-inf")),
                     F.lit(unclassified)).otherwise(cls)
    return F.when(_valid(env, nodata), cls).otherwise(F.lit(int(nodata)))


def max_likelihood_confidence(env: dict[str, Column], stats: list[dict],
                              threshold: float | bool | None = None) -> Column:
    """The reference's out_alg raster: the winning discriminant value per
    pixel (core/processor.py:242-311 algorithm-raster output)."""
    pairs = ml_scores(env, stats, threshold)
    return F.greatest(*[s for s, _ in pairs]) if len(pairs) > 1 else pairs[0][0]


def train_class_stats(zone_px_wide: DataFrame, class_col: str,
                      band_cols: list[str]) -> list[dict]:
    """ROI-extracted per-class mean + covariance (the §2.4 covariance
    aggregation: exact integer sums, sample covariance /(n-1))."""
    aggs = [F.count("*").alias("n")]
    for b in band_cols:
        aggs.append(F.sum(F.col(b).cast("long")).alias(f"s_{b}"))
    for i, a in enumerate(band_cols):
        for bnd in band_cols[i:]:
            aggs.append(
                F.sum(F.col(a).cast("long") * F.col(bnd).cast("long")).alias(f"s_{a}_{bnd}")
            )
    rows = zone_px_wide.groupBy(class_col).agg(*aggs).collect()
    out = []
    for r in sorted(rows, key=lambda x: x[class_col]):
        n = r["n"]
        if n < 2:
            # a single-pixel class has no sample covariance (n-1 == 0);
            # the reference's numpy path yields nan and logs a
            # per-signature error rather than aborting — we pin: skip the
            # unusable class (it can never classify anything meaningful)
            continue
        means = {b: r[f"s_{b}"] / n for b in band_cols}
        cov = np.zeros((len(band_cols), len(band_cols)))
        for i, a in enumerate(band_cols):
            for j, bnd in enumerate(band_cols):
                key = f"s_{a}_{bnd}" if i <= j else f"s_{bnd}_{a}"
                cov[i, j] = (r[key] - n * means[a] * means[bnd]) / (n - 1)
        out.append({"class_id": r[class_col], "means": means, "cov": cov, "n": n})
    return out


def classify_pixels_flat(stacked: DataFrame, band_cols: list[str],
                         class_expr_fn, nodata: float = NODATA) -> DataFrame:
    """Flat-row classification: posexplode the zipped band arrays and run
    the classifier on plain columns. ~20x faster than the array-transform
    path when only aggregates are needed (whole-stage codegen over flat
    rows; no per-pixel array indexing). Returns rows with a `class` col;
    nodata pixels excluded."""
    import functools
    import operator as op

    z = stacked.select(F.posexplode(F.arrays_zip(*band_cols)).alias("pos", "z")).select(
        *[F.col(f"z.{b}").cast("double").alias(b) for b in band_cols]
    )
    valid = functools.reduce(op.and_, [F.col(b) != float(nodata) for b in band_cols])
    env = {b: F.col(b) for b in band_cols}
    return z.filter(valid).select(class_expr_fn(env).alias("class"))


def classify_pixels_flat_scored(stacked: DataFrame, band_cols: list[str],
                                scores_fn, *, nodata: float = NODATA,
                                select_max: bool = False,
                                thresholds: dict[int, float] | None = None,
                                best_score_transform=None,
                                unclassified_at: float | None = None,
                                unclassified: int = 0,
                                include_best: bool = False) -> DataFrame:
    """Flat-row classification with the per-class scores MATERIALIZED as
    projection columns before the arg-min/max. Building one
    mega-expression (least(d1..d5) + a when-chain re-stating every d_i)
    makes Catalyst evaluate each distance polynomial several times —
    measured 22 s for 6.5M px at sf0.1; projecting d_i once and doing
    least/when over the plain columns is 2.1 s, identical results, still
    one WholeStageCodegen span.

    `scores_fn(env) -> [(score Column, class_id)]`; lowest score wins
    (highest with `select_max`), ties to the first signature (np.argmin
    semantics). `thresholds`: optional {class_id: thr} — a winner whose
    `best_score_transform(best)` exceeds its class threshold writes
    `unclassified` (ref processor_functions.py:421-425).
    `unclassified_at`: sentinel best-score meaning no class qualified
    (the ML chi-square cut maps censored scores to -inf).
    `include_best` adds the winning score as a `best` column (the
    reference's out_alg confidence raster)."""
    import functools
    import operator as op

    z = stacked.select(F.posexplode(F.arrays_zip(*band_cols)).alias("pos", "z")).select(
        *[F.col(f"z.{b}").cast("double").alias(b) for b in band_cols]
    )
    valid = functools.reduce(op.and_, [F.col(b) != float(nodata) for b in band_cols])
    env = {b: F.col(b) for b in band_cols}
    pairs = scores_fn(env)
    names = [f"__s_{cid}" for _, cid in pairs]
    scored = z.filter(valid).select(
        *[s.alias(n) for (s, _), n in zip(pairs, names)]
    )
    pick = F.greatest if select_max else F.least
    best = pick(*[F.col(n) for n in names]) if len(names) > 1 else F.col(names[0])
    cls = None
    for n, (_, cid) in zip(names, pairs):
        cls = (F.when(F.col(n) == best, F.lit(cid)) if cls is None
               else cls.when(F.col(n) == best, F.lit(cid)))
    if unclassified_at is not None:
        cls = F.when(best == F.lit(float(unclassified_at)),
                     F.lit(unclassified)).otherwise(cls)
    if thresholds:
        t = best_score_transform(best) if best_score_transform else best
        cond = None
        for cid, thr in thresholds.items():
            c = (cls == cid) & (t > float(thr))
            cond = c if cond is None else cond | c
        cls = F.when(cond, F.lit(unclassified)).otherwise(cls)
    out = [cls.alias("class")]
    if include_best:
        out.append(best.alias("best"))
    return scored.select(*out)


def ml_census_tiles(stacked: DataFrame, band_cols: list[str],
                    stats: list[dict],
                    threshold: float | bool | None = None,
                    include_best: bool = False,
                    nodata: float = NODATA) -> DataFrame:
    """Per-class (pixel_count [, conf_fp]) census of the ML classifier
    as ONE Arrow pass over the stacked tile arrays (r06, guide §4):
    the flat-row path paid an arrays_zip posexplode (26M struct
    elements at sf0.1) plus a 50-term codegen polynomial per pixel —
    11 s; this kernel evaluates the same discriminants vectorized per
    tile and ships only bounded (class, n, conf_fp) partials.

    Exactness: the discriminant accumulation order, the chi-square
    censoring, the greatest/first-match argmax and the
    floor(best*1e6+0.5) fixed-point all mirror the flat-row columns
    term for term (plain IEEE double ops in both engines, no FMA), so
    the census is bit-equal to the SQL path and the DuckDB oracle
    (pinned by the driver-checked queries + test_ml_census_parity)."""
    # precompute per-class (logdet, coef list, means, chi_thr) once
    classes = []
    for st in stats:
        bands = list(st["means"].keys())
        cov = np.asarray(st["cov"], dtype=np.float64)
        inv = np.linalg.inv(cov)
        logdet = float(np.log(np.linalg.det(cov)))
        terms = []
        for i in range(len(bands)):
            for j in range(i, len(bands)):
                coef = float(inv[i, j]) if i == j else 2.0 * float(inv[i, j])
                terms.append((i, j, coef))
        p = None
        if threshold is True:
            p = float(st.get("threshold", 0.0) or 0.0)
        elif threshold not in (None, False):
            p = float(threshold)
        chi_thr = None
        if p and p > 0:
            chi_thr = -2.0 * chi2_isf(p / 100.0, len(bands)) - logdet
        classes.append((st["class_id"],
                        [float(st["means"][b]) for b in bands],
                        logdet, terms, chi_thr))

    def kern(it):
        import pandas as pd
        cols = (["class", "n", "conf_fp"] if include_best
                else ["class", "n"])
        for pdf in it:
            if not len(pdf):
                continue
            arrs = [np.asarray(
                [np.asarray(p, dtype=np.float64) for p in pdf[b]]
            ).ravel() for b in band_cols]
            valid = np.ones(len(arrs[0]), dtype=bool)
            for a in arrs:
                valid &= a != nodata
            if not valid.any():
                continue
            vals = [a[valid] for a in arrs]
            scores = []
            for _cid, means, logdet, terms, chi_thr in classes:
                d = [v - m for v, m in zip(vals, means)]
                quad = None
                for i, j, coef in terms:
                    t = d[i] * d[j] * coef
                    quad = t if quad is None else quad + t
                s = -logdet - quad
                if chi_thr is not None:
                    s = np.where(s < chi_thr, -np.inf, s)
                scores.append(s)
            sc = np.stack(scores)
            best = sc[0].copy()
            for k in range(1, len(scores)):
                np.maximum(best, sc[k], out=best)
            # first class whose score equals best (the when-chain rule)
            cls_idx = np.argmax(sc == best, axis=0)
            cls = np.asarray([c[0] for c in classes],
                             dtype=np.int64)[cls_idx]
            if threshold not in (None, False):
                cls = np.where(np.isneginf(best), np.int64(0), cls)
            if include_best:
                conf = np.where(
                    cls != 0,
                    np.floor(best * 1e6 + 0.5), 0.0).astype(np.int64)
                ub, inv_ = np.unique(cls, return_inverse=True)
                n = np.zeros(len(ub), dtype=np.int64)
                s = np.zeros(len(ub), dtype=np.int64)
                np.add.at(n, inv_, 1)
                np.add.at(s, inv_, conf)
                yield pd.DataFrame(
                    {"class": ub, "n": n, "conf_fp": s})
            else:
                ub, cnts = np.unique(cls, return_counts=True)
                yield pd.DataFrame(
                    {"class": ub, "n": cnts.astype(np.int64)})

    schema = ("class long, n long, conf_fp long" if include_best
              else "class long, n long")
    per = stacked.select(*band_cols).mapInPandas(kern, schema)
    aggs = [F.sum("n").alias("pixel_count")]
    if include_best:
        aggs.append(F.sum("conf_fp").alias("conf_fp"))
    return per.groupBy(F.col("class").cast("int").alias("class")).agg(*aggs)


def min_distance_scores(env: dict[str, Column],
                        signatures: list[dict]) -> list[tuple[Column, int]]:
    """Squared Euclidean distance to each signature (integer-exact)."""
    pairs = []
    for sig in signatures:
        d = None
        for b, v in sig["values"].items():
            t = env[b].cast("long") - F.lit(int(v))
            d = t * t if d is None else d + t * t
        pairs.append((d, sig["class_id"]))
    return pairs


def spectral_angle_scores(env: dict[str, Column],
                          signatures: list[dict]) -> list[tuple[Column, int]]:
    """SAM angle (degrees) to each signature."""
    pairs = []
    for sig in signatures:
        dot, xx, vv = None, None, 0.0
        for b, v in sig["values"].items():
            x = env[b].cast("double")
            dot = x * F.lit(float(v)) if dot is None else dot + x * F.lit(float(v))
            xx = x * x if xx is None else xx + x * x
            vv += float(v) * float(v)
        ang = F.acos(dot / F.sqrt(xx * F.lit(vv))) * F.lit(180.0 / np.pi)
        pairs.append((ang, sig["class_id"]))
    return pairs


def classify_tiles(stacked: DataFrame, band_cols: list[str], class_expr_fn,
                   out_col: str = "class_px") -> DataFrame:
    """Apply a per-pixel classifier over stacked tiles (one array column
    per band) -> array<int> class raster per tile."""
    def per_pixel(i):
        env = {b: F.element_at(F.col(b), i).cast("double") for b in band_cols}
        return class_expr_fn(env)

    return stacked.withColumn(
        out_col, F.transform(F.sequence(F.lit(1), F.lit(N_PX)), per_pixel)
    )


def spectral_distance_tiles(stacked_a: DataFrame, stacked_b: DataFrame,
                            band_cols: list[str], *, threshold: float | None = None,
                            nodata: float = NODATA) -> DataFrame:
    """Euclidean spectral distance between two bandsets per pixel
    (processor_functions.py:580-618); optional threshold -> change mask."""
    a = stacked_a.select("tile_x", "tile_y", "cell_key",
                         *[F.col(b).alias(f"a_{b}") for b in band_cols])
    b = stacked_b.select("tile_x", "tile_y",
                         *[F.col(c).alias(f"b_{c}") for c in band_cols])
    j = a.join(b, ["tile_x", "tile_y"])

    def per_pixel(i):
        import functools
        import operator as op
        xs = {c: F.element_at(F.col(f"a_{c}"), i).cast("double") for c in band_cols}
        ys = {c: F.element_at(F.col(f"b_{c}"), i).cast("double") for c in band_cols}
        valid = functools.reduce(
            op.and_,
            [xs[c] != nodata for c in band_cols] + [ys[c] != nodata for c in band_cols],
        )
        dsq = None
        for c in band_cols:
            t = xs[c].cast("long") - ys[c].cast("long")
            dsq = t * t if dsq is None else dsq + t * t
        dist = F.sqrt(dsq.cast("double"))
        val = dist if threshold is None else F.when(dist > threshold, 1.0).otherwise(0.0)
        return F.when(valid, val).otherwise(F.lit(float(nodata)))

    return j.select(
        "tile_x", "tile_y", "cell_key",
        F.transform(F.sequence(F.lit(1), F.lit(N_PX)), per_pixel).alias("pixels"),
    )


def kmeans_bands(stacked: DataFrame, band_cols: list[str], k: int,
                 max_iter: int = 3, nodata: float = NODATA) -> list[dict]:
    """band_clustering k-means (tools/band_clustering.py:224): seed =
    band-mean ladder, iterate classify-argmin -> per-class means.
    Deterministic: integer-exact distance argmin + exact sum means.
    Returns final centroids [{class_id, values}]."""
    # explode all bands positionally
    ex = stacked.select(
        F.posexplode(band_cols[0]).alias("pos", band_cols[0]),
        *[F.col(b) for b in band_cols[1:]],
    )
    for b in band_cols[1:]:
        ex = ex.withColumn(b, F.element_at(F.col(b), F.col("pos") + 1))
    import functools
    import operator as op
    valid = functools.reduce(op.and_, [F.col(b) != nodata for b in band_cols])
    ex = ex.filter(valid).select(*band_cols)

    # seed ladder: global min..max per band split into k steps
    # (band_clustering 'band mean' seed variant)
    mm = ex.agg(*[F.min(b).alias(f"mn_{b}") for b in band_cols],
                *[F.max(b).alias(f"mx_{b}") for b in band_cols]).collect()[0]
    cents = [
        {"class_id": c + 1,
         "values": {b: mm[f"mn_{b}"] + (mm[f"mx_{b}"] - mm[f"mn_{b}"]) * (c + 0.5) / k
                    for b in band_cols}}
        for c in range(k)
    ]
    for _ in range(max_iter):
        pairs = []
        for cent in cents:
            d = None
            for b in band_cols:
                t = F.col(b).cast("double") - F.lit(float(cent["values"][b]))
                d = t * t if d is None else d + t * t
            pairs.append((d, cent["class_id"]))
        cls = _argmin_struct(pairs)
        agg = (
            ex.withColumn("cls", cls)
            .groupBy("cls")
            .agg(F.count("*").alias("n"),
                 *[F.sum(F.col(b).cast("long")).alias(f"s_{b}") for b in band_cols])
            .collect()
        )
        by_cls = {r["cls"]: r for r in agg}
        new_cents = []
        for cent in cents:
            r = by_cls.get(cent["class_id"])
            if r is None:
                new_cents.append(cent)
            else:
                new_cents.append({
                    "class_id": cent["class_id"],
                    "values": {b: r[f"s_{b}"] / r["n"] for b in band_cols},
                })
        cents = new_cents
    return cents


def signature_similarity(signatures_long: DataFrame) -> DataFrame:
    """Pairwise signature similarity: Bray-Curtis (%), Euclidean
    distance, spectral angle (degrees) over integer signature values —
    exact BIGINT sums, one final float expression per metric
    (util/shared_tools.py:583-622)."""
    a = signatures_long.select(
        F.col("class_id").alias("class_a"), "band",
        F.col("value").alias("va"))
    b = signatures_long.select(
        F.col("class_id").alias("class_b"), "band",
        F.col("value").alias("vb"))
    j = a.join(b, "band").filter(F.col("class_a") < F.col("class_b"))
    xa = F.col("va").cast("long")
    xb = F.col("vb").cast("long")
    s = j.groupBy("class_a", "class_b").agg(
        F.sum(F.abs(xa - xb)).alias("abs_sum"),
        F.sum(xa + xb).alias("tot_sum"),
        F.sum((xa - xb) * (xa - xb)).alias("sq_sum"),
        F.sum(xa * xb).alias("dot"),
        F.sum(xa * xa).alias("aa"),
        F.sum(xb * xb).alias("bb"),
    )
    bray = (F.lit(100.0)
            - F.col("abs_sum").cast("double")
            / F.col("tot_sum").cast("double") * F.lit(100.0))
    eucl = F.sqrt(F.col("sq_sum").cast("double"))
    sam = (F.acos(F.col("dot").cast("double")
                  / F.sqrt(F.col("aa").cast("double")
                           * F.col("bb").cast("double")))
           * F.lit(180.0 / float(np.pi)))
    return s.select(
        "class_a", "class_b",
        bray.alias("bray_curtis"),
        eucl.alias("euclidean"),
        sam.alias("spectral_angle"),
    )
