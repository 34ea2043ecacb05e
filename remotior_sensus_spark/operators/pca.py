"""Band PCA: per-band mean/variance + full covariance matrix (two-phase
exact integer aggregation), eigen decomposition on the driver, per-pixel
principal-component projection.

Reference: tools/band_pca.py (variance contributions :152-179,
covariance assembly :186-213), kernel core/processor_functions.py:
1086-1116 (bands_covariance: per-strip sum((x-mux)(y-muy)) with
precomputed means, final /(n-1)).

Spark-first: one hash aggregation computes n, sum(x_i), sum(x_i*x_j)
exactly (BIGINT — pixel values are integer-valued), covariance follows
as cov = (sxy - sx*sy/n)/(n-1) in a single final double expression —
bit-identical to the SQL oracle. Eigenvectors (4x4) are driver math,
baked back into a literal-coefficient projection (same broadcast shape
as classification)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from remotior_sensus_spark import NODATA


def _flat_pixels(stacked: DataFrame, band_cols: list[str]) -> DataFrame:
    import functools
    import operator as op

    z = stacked.select(F.posexplode(F.arrays_zip(*band_cols)).alias("pos", "z")).select(
        *[F.col(f"z.{b}").cast("double").alias(b) for b in band_cols]
    )
    valid = functools.reduce(op.and_, [F.col(b) != NODATA for b in band_cols])
    return z.filter(valid)


def covariance_matrix(stacked: DataFrame, band_cols: list[str]) -> DataFrame:
    """Long-form (band_i, band_j, covariance) — sample covariance /(n-1)."""
    px = _flat_pixels(stacked, band_cols)
    aggs = [F.count("*").alias("n")]
    for b in band_cols:
        aggs.append(F.sum(F.col(b).cast("long")).alias(f"s_{b}"))
    for i, a in enumerate(band_cols):
        for b in band_cols[i:]:
            aggs.append(F.sum(F.col(a).cast("long") * F.col(b).cast("long")).alias(f"s_{a}_{b}"))
    s = px.agg(*aggs)
    rows = []
    for i, a in enumerate(band_cols):
        for j, b in enumerate(band_cols):
            key = f"s_{a}_{b}" if i <= j else f"s_{b}_{a}"
            cov = (
                (F.col(key).cast("double")
                 - F.col(f"s_{a}").cast("double") * F.col(f"s_{b}").cast("double") / F.col("n"))
                / (F.col("n") - 1)
            )
            rows.append(
                s.select(F.lit(a).alias("band_i"), F.lit(b).alias("band_j"),
                         cov.alias("covariance"))
            )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def pca_fit(stacked: DataFrame, band_cols: list[str]) -> dict:
    """Driver-side eigen decomposition of the exact covariance matrix.
    Returns {means, cov, eigenvalues, eigenvectors (columns, sorted by
    descending eigenvalue, sign-normalized so max-|component| > 0)}."""
    px = _flat_pixels(stacked, band_cols)
    aggs = [F.count("*").alias("n")]
    for b in band_cols:
        aggs.append(F.sum(F.col(b).cast("long")).alias(f"s_{b}"))
    for i, a in enumerate(band_cols):
        for b in band_cols[i:]:
            aggs.append(F.sum(F.col(a).cast("long") * F.col(b).cast("long")).alias(f"s_{a}_{b}"))
    r = px.agg(*aggs).collect()[0]
    n = r["n"]
    means = np.array([r[f"s_{b}"] / n for b in band_cols])
    k = len(band_cols)
    cov = np.zeros((k, k))
    for i, a in enumerate(band_cols):
        for j, b in enumerate(band_cols):
            key = f"s_{a}_{b}" if i <= j else f"s_{b}_{a}"
            cov[i, j] = (r[key] - n * means[i] * means[j]) / (n - 1)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1]
    w, v = w[order], v[:, order]
    for c in range(k):
        if v[np.argmax(np.abs(v[:, c])), c] < 0:
            v[:, c] = -v[:, c]
    return {"bands": band_cols, "n": n, "means": means, "cov": cov,
            "eigenvalues": w, "eigenvectors": v}


def pca_project(stacked: DataFrame, model: dict, component: int = 0) -> DataFrame:
    """Per-pixel projection onto one principal component (literal
    coefficients -> pure column math)."""
    bands = model["bands"]
    vec = model["eigenvectors"][:, component]
    means = model["means"]
    px = _flat_pixels(stacked, bands)
    proj = None
    for b, vb, mb in zip(bands, vec, means):
        t = (F.col(b) - F.lit(float(mb))) * F.lit(float(vb))
        proj = t if proj is None else proj + t
    return px.select(proj.alias(f"pc{component + 1}"))


def correlation_matrix(stacked: DataFrame, band_cols: list[str]) -> DataFrame:
    """Long-form Pearson correlation (band_i, band_j, correlation) from
    the SAME one-pass exact integer aggregate covariance_matrix uses:
      r = (n*sxy - sx*sy) / (sqrt(n*sxx - sx^2) * sqrt(n*syy - sy^2))
    with every product evaluated in doubles of exact BIGINT sums (the
    n*sxy product overflows int64 at ~1e8 pixels, the double form never
    does) — one fixed op sequence both engines share bit-for-bit."""
    px = _flat_pixels(stacked, band_cols)
    aggs = [F.count("*").alias("n")]
    for b in band_cols:
        aggs.append(F.sum(F.col(b).cast("long")).alias(f"s_{b}"))
    for i, a in enumerate(band_cols):
        for b in band_cols[i:]:
            aggs.append(F.sum(F.col(a).cast("long") * F.col(b).cast("long"))
                        .alias(f"s_{a}_{b}"))
    s = px.agg(*aggs)
    nd = F.col("n").cast("double")

    def dev(a):
        sa = F.col(f"s_{a}").cast("double")
        saa = F.col(f"s_{a}_{a}").cast("double")
        return F.sqrt(nd * saa - sa * sa)

    rows = []
    for i, a in enumerate(band_cols):
        for j, b in enumerate(band_cols):
            key = f"s_{a}_{b}" if i <= j else f"s_{b}_{a}"
            r = ((nd * F.col(key).cast("double")
                  - F.col(f"s_{a}").cast("double")
                  * F.col(f"s_{b}").cast("double"))
                 / (dev(a) * dev(b)))
            rows.append(s.select(
                F.lit(a).alias("band_i"), F.lit(b).alias("band_j"),
                r.alias("correlation")))
    out = rows[0]
    for r_ in rows[1:]:
        out = out.unionByName(r_)
    return out
