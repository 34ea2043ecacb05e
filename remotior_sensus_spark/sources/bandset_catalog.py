"""BandSet catalog: the driver-side metadata surface the band_calc
grammar resolves against.

Reference: core/bandset_catalog.py (BandSet / BandSetCatalog,
`get_band_by_wavelength`, `spectral_range_bands`),
core/configurations.py:200-212 (spectral centers + thresholds).

This is pure metadata (a handful of rows) — it lives on the driver and
is baked into the compiled Spark plan, the same way the reference
broadcasts its bandsets_table. No data I/O happens here.
"""

from __future__ import annotations

import datetime
from dataclasses import dataclass, field

# spectral centers/thresholds in micrometers (configurations.py:200-212)
SPECTRAL_RANGES = {
    "blue": (0.475, 0.2),
    "green": (0.56, 0.03),
    "red": (0.65, 0.04),
    "nir": (0.85, 0.15),
    "swir_1": (1.61, 0.2),
    "swir_2": (2.2, 0.2),
}
NODATA_DEFAULT = -32768.0


@dataclass
class Band:
    number: int                  # 1-based ordinal inside the bandset
    name: str                    # e.g. "B04"
    wavelength: float            # micrometers
    nodata: float = NODATA_DEFAULT


@dataclass
class BandSet:
    number: int                  # 1-based catalog position
    name: str                    # e.g. "S2_2020-01-01"
    date: datetime.date | None
    bands: list[Band] = field(default_factory=list)

    def band_by_number(self, n: int) -> Band:
        return self.bands[n - 1]

    def band_by_name(self, name: str) -> Band | None:
        for b in self.bands:
            if b.name == name:
                return b
        return None

    def band_by_wavelength(self, center: float, threshold: float) -> Band | None:
        """Nearest band within threshold (bandset_catalog.py
        get_band_by_wavelength semantics)."""
        best, best_d = None, None
        for b in self.bands:
            d = abs(b.wavelength - center)
            if d <= threshold and (best_d is None or d < best_d):
                best, best_d = b, d
        return best

    def spectral_range_bands(self) -> dict[str, Band | None]:
        return {
            k: self.band_by_wavelength(c, t)
            for k, (c, t) in SPECTRAL_RANGES.items()
        }


class BandSetCatalog:
    def __init__(self, bandsets: list[BandSet], current: int = 1):
        self.bandsets = {bs.number: bs for bs in bandsets}
        self.current = current

    def get(self, number: int) -> BandSet:
        return self.bandsets[number]

    def numbers(self) -> list[int]:
        return sorted(self.bandsets)

    def band_count(self, number: int) -> int:
        return len(self.get(number).bands)

    def select(self, selector: str) -> list[int]:
        """Resolve a forbandsets-style selector: comma-separated ints,
        int ranges ``a:b``, dates ``YYYY-MM-DD`` and date ranges
        (tools/band_calc.py _bandsets_iterator)."""
        chosen: set[int] = set()
        for part in selector.split(","):
            part = part.strip()
            if not part:
                continue
            bounds = [p.strip() for p in part.split(":")]
            if len(bounds) == 2:
                d0, d1 = _try_date(bounds[0]), _try_date(bounds[1])
                if d0 is not None and d1 is not None:
                    chosen |= {
                        n for n in self.numbers()
                        if self.get(n).date is not None
                        and d0 <= self.get(n).date <= d1
                    }
                else:
                    chosen |= set(range(int(bounds[0]), int(bounds[1]) + 1))
            else:
                d = _try_date(part)
                if d is not None:
                    chosen |= {
                        n for n in self.numbers() if self.get(n).date == d
                    }
                else:
                    chosen.add(int(part))
        return [n for n in self.numbers() if n in chosen]

    def filter_by_name(self, numbers: list[int], prefixes: list[str]) -> list[int]:
        """Keep bandsets whose name starts with any prefix
        (case-insensitive; the iterator's optional name_filter)."""
        lp = [p.strip().lower() for p in prefixes if p.strip()]
        if not lp:
            return numbers
        return [
            n for n in numbers
            if any(self.get(n).name.lower().startswith(p) for p in lp)
        ]


# Sentinel-2-like wavelengths for the synthetic bands (micrometers)
_S2_WAVELENGTHS = {"B02": 0.49, "B03": 0.56, "B04": 0.665, "B08": 0.842}


def default_synthetic_catalog() -> BandSetCatalog:
    """Catalog describing the deterministic synthetic fixtures: three
    dated S2-like bandsets with bands (B02, B03, B04, B08)."""
    bandsets = []
    for i, day in enumerate(("2020-01-01", "2020-01-02", "2020-01-03"), start=1):
        bands = [
            Band(number=j + 1, name=n, wavelength=_S2_WAVELENGTHS[n])
            for j, n in enumerate(("B02", "B03", "B04", "B08"))
        ]
        bandsets.append(
            BandSet(
                number=i,
                name=f"S2_{day}",
                date=datetime.date.fromisoformat(day),
                bands=bands,
            )
        )
    return BandSetCatalog(bandsets, current=1)


def _try_date(s: str) -> datetime.date | None:
    try:
        return datetime.date.fromisoformat(s.strip())
    except ValueError:
        return None
