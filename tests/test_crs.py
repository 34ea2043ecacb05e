"""Transverse-Mercator (UTM zone-to-zone) math invariants: the Krüger
series against an independent meridian-arc integration, roundtrip and
cross-zone consistency, and Spark-Column vs numpy parity of the shared
formula core."""

import math

import numpy as np
import pytest

from remotior_sensus_spark.operators import crs


def test_origin_exact():
    ln0 = crs.utm_lon0(33)
    E, N = crs.tm_forward(np, np.array([0.0]), np.array([ln0]), ln0)
    assert E[0] == 500000.0 and N[0] == 0.0


def test_meridian_arc_matches_numeric_integration():
    """N on the central meridian must equal k0 * the ellipsoidal
    meridian arc — computed here by plain numeric integration, fully
    independent of the series coefficients."""
    e2 = crs._F * (2 - crs._F)
    ln0 = crs.utm_lon0(33)
    for deg in (15, 45, 70):
        phi = math.radians(deg)
        t = np.linspace(0, phi, 400001)
        arc = crs._A * (1 - e2) * np.trapz((1 - e2 * np.sin(t) ** 2) ** -1.5, t)
        _, N = crs.tm_forward(np, np.array([phi]), np.array([ln0]), ln0)
        assert abs(N[0] - crs._K0 * arc) < 1e-3, deg


def test_roundtrip_and_cross_zone_micrometer():
    rng = np.random.default_rng(7)
    lat = np.radians(rng.uniform(-84, 84, 20000))
    ln0 = crs.utm_lon0(33)
    lon = ln0 + np.radians(rng.uniform(-3.5, 3.5, 20000))
    E, N = crs.tm_forward(np, lat, lon, ln0)
    la2, lo2 = crs.tm_inverse(np, E, N, ln0)
    err_m = np.hypot((la2 - lat) * 6.4e6, (lo2 - lon) * 6.4e6 * np.cos(lat))
    assert float(err_m.max()) < 1e-4

    # express the same points in the neighboring zone and back
    E34, N34 = crs.tm_forward(np, la2, lo2, crs.utm_lon0(34))
    la4, lo4 = crs.tm_inverse(np, E34, N34, crs.utm_lon0(34))
    err_m = np.hypot((la4 - lat) * 6.4e6, (lo4 - lon) * 6.4e6)
    assert float(err_m.max()) < 1e-4


def test_spark_columns_match_numpy(spark):
    """The SAME formula core through the SparkMath adapter (bound
    projection stages, JVM trig) agrees with the numpy path to
    floating-point noise."""
    import pandas as pd
    from pyspark.sql import functions as F

    rng = np.random.default_rng(3)
    E = rng.uniform(150000, 900000, 2000)
    N = rng.uniform(3_500_000, 6_500_000, 2000)
    df = spark.createDataFrame(pd.DataFrame({"E": E, "N": N}))
    sm = crs.SparkMath(F)
    lat, lon = crs.tm_inverse(sm, F.col("E"), F.col("N"), crs.utm_lon0(33))
    E2, N2 = crs.tm_forward(sm, lat, lon, crs.utm_lon0(32))
    out = sm.apply_bindings(df).select(
        "E", "N", E2.alias("E2"), N2.alias("N2")).toPandas()
    la, lo = crs.tm_inverse(np, out["E"].to_numpy(), out["N"].to_numpy(),
                            crs.utm_lon0(33))
    E2n, N2n = crs.tm_forward(np, la, lo, crs.utm_lon0(32))
    assert np.abs(out["E2"].to_numpy() - E2n).max() < 1e-6
    assert np.abs(out["N2"].to_numpy() - N2n).max() < 1e-6


def test_warp_crs_unknown_zone_math_still_bounded():
    """Series accuracy holds a few degrees beyond the zone boundary
    (the warp fixture maps zone 33 pixels ~2-4 degrees into zone 32)."""
    rng = np.random.default_rng(11)
    lat = np.radians(rng.uniform(30, 60, 5000))
    ln0 = crs.utm_lon0(32)
    lon = ln0 + np.radians(rng.uniform(-6, 6, 5000))
    E, N = crs.tm_forward(np, lat, lon, ln0)
    la2, lo2 = crs.tm_inverse(np, E, N, ln0)
    err_m = np.hypot((la2 - lat) * 6.4e6, (lo2 - lon) * 6.4e6 * np.cos(lat))
    assert float(err_m.max()) < 1e-3


def test_datum_shift_magnitude_and_roundtrip():
    """ED50->WGS84 over the fixture extent: the European-mean shift
    must land in the plausible 50-300 m band in both axes, and the 2D
    roundtrip (which drops ellipsoidal height, bounding it at ~1 mm)
    must stay far under a 10 m pixel."""
    rng = np.random.default_rng(7)
    E = rng.uniform(200_000, 800_000, 3000)
    N = rng.uniform(3_500_000, 6_500_000, 3000)
    Ew, Nw = crs.datum_ed50_to_wgs84(np, E, N, 33)
    Eb, Nb = crs.datum_wgs84_to_ed50(np, Ew, Nw, 33)
    dE, dN = Ew - E, Nw - N
    assert 30 < np.abs(dE).min() and np.abs(dE).max() < 300
    assert 30 < np.abs(dN).min() and np.abs(dN).max() < 300
    assert np.abs(Eb - E).max() < 5e-3
    assert np.abs(Nb - N).max() < 5e-3


def test_ecef_geodetic_bowring_exact_on_surface():
    """Bowring closed form vs exact forward: points ON the ellipsoid
    roundtrip to sub-micrometer."""
    for ell in (crs.WGS84, crs.INTL1924):
        rng = np.random.default_rng(13)
        lat = np.radians(rng.uniform(-80, 80, 5000))
        lon = np.radians(rng.uniform(-179, 179, 5000))
        x, y, z = crs.geodetic_to_ecef(np, ell, lat, lon)
        la2, lo2 = crs.ecef_to_geodetic(np, ell, x, y, z)
        err_m = np.hypot((la2 - lat) * ell.a, (lo2 - lon) * ell.a * np.cos(lat))
        assert float(err_m.max()) < 1e-6


def test_ellipsoid_wgs84_constants_bit_identical():
    """Ellipsoid(WGS84 a, f) must reproduce the module-level constants
    bit-for-bit, so the parameterization cannot have drifted the
    proven zone-to-zone path."""
    e = crs.WGS84
    assert e.rect_a == crs._RECT_A
    assert e.alpha == crs._ALPHA
    assert e.beta == crs._BETA
    assert e.delta == crs._DELTA
    assert e.tsqn == crs._2SQN


def test_datum_spark_columns_match_numpy(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    rng = np.random.default_rng(17)
    E = rng.uniform(200_000, 800_000, 1000)
    N = rng.uniform(3_500_000, 6_500_000, 1000)
    df = spark.createDataFrame(pd.DataFrame({"E": E, "N": N}))
    sm = crs.SparkMath(F)
    E2, N2 = crs.datum_wgs84_to_ed50(sm, F.col("E"), F.col("N"), 33)
    out = sm.apply_bindings(df).select(
        "E", "N", E2.alias("E2"), N2.alias("N2")).toPandas()
    E2n, N2n = crs.datum_wgs84_to_ed50(
        np, out["E"].to_numpy(), out["N"].to_numpy(), 33)
    assert np.abs(out["E2"].to_numpy() - E2n).max() < 1e-6
    assert np.abs(out["N2"].to_numpy() - N2n).max() < 1e-6
