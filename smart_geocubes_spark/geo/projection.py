"""Closed-form map projections (pure numpy; replaces pyproj/odc-geo).

The reference reprojects every AOI into the cube CRS before any grid
math (``core/accessor.py:373``, ``datasets/arcticdem.py:216``). We
support the three CRSs its datasets use:

- EPSG:4326 (TCTrend/AlphaEarth cubes, ``datasets/tctrend.py:35``) — identity;
- EPSG:3857 web mercator (generic web tiles) — spherical closed form;
- EPSG:3413 NSIDC polar stereographic north (ArcticDEM,
  ``datasets/arcticdem.py:333``) — ellipsoidal closed form per
  Snyder, *Map Projections: A Working Manual* (USGS PP 1395), eqs
  21-33..21-35 (public domain formulas).

All functions are vectorized float64 numpy: they run unchanged inside
Arrow pandas UDFs (batched, no per-row Python).
"""

from __future__ import annotations

import numpy as np

# WGS84 ellipsoid
_A = 6378137.0
_F = 1.0 / 298.257223563
_E2 = _F * (2.0 - _F)
_E = np.sqrt(_E2)

# EPSG:3413 parameters: lat_ts=70N, lon_0=-45, k0 derived from lat_ts.
_LON0_3413 = -45.0


def _t_param(lat_rad: np.ndarray) -> np.ndarray:
    """Snyder eq 15-9: t = tan(pi/4 - lat/2) / ((1-e sin)/(1+e sin))^(e/2)."""
    sin_lat = np.sin(lat_rad)
    return np.tan(np.pi / 4.0 - lat_rad / 2.0) / np.power(
        (1.0 - _E * sin_lat) / (1.0 + _E * sin_lat), _E / 2.0
    )


def _m_param(lat_rad: np.ndarray) -> np.ndarray:
    """Snyder eq 14-15: m = cos(lat) / sqrt(1 - e^2 sin^2 lat)."""
    sin_lat = np.sin(lat_rad)
    return np.cos(lat_rad) / np.sqrt(1.0 - _E2 * sin_lat * sin_lat)


def project(lon: np.ndarray, lat: np.ndarray, crs: str) -> tuple[np.ndarray, np.ndarray]:
    """lon/lat degrees (EPSG:4326) -> (x, y) in ``crs``. Vectorized."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    if crs in ("EPSG:4326", "4326"):
        return lon.copy(), lat.copy()
    if crs in ("EPSG:3857", "3857"):
        x = _A * np.radians(lon)
        y = _A * np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0))
        return x, y
    if crs in ("EPSG:3413", "3413"):
        lat_rad = np.radians(lat)
        t = _t_param(lat_rad)
        t_c = _t_param(np.radians(70.0))
        m_c = _m_param(np.radians(70.0))
        rho = _A * m_c * t / t_c  # Snyder eq 21-34 (lat_ts form)
        theta = np.radians(lon - _LON0_3413)
        x = rho * np.sin(theta)
        y = -rho * np.cos(theta)
        return x, y
    raise ValueError(f"unsupported CRS: {crs}")


def unproject(x: np.ndarray, y: np.ndarray, crs: str) -> tuple[np.ndarray, np.ndarray]:
    """(x, y) in ``crs`` -> lon/lat degrees. Vectorized inverse of
    :func:`project` (iterative series for 3413 per Snyder eq 7-9)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    if crs in ("EPSG:4326", "4326"):
        return x.copy(), y.copy()
    if crs in ("EPSG:3857", "3857"):
        lon = np.degrees(x / _A)
        lat = np.degrees(2.0 * np.arctan(np.exp(y / _A)) - np.pi / 2.0)
        return lon, lat
    if crs in ("EPSG:3413", "3413"):
        rho = np.hypot(x, y)
        t_c = _t_param(np.radians(70.0))
        m_c = _m_param(np.radians(70.0))
        t = rho * t_c / (_A * m_c)
        # iterate Snyder eq 7-9
        chi = np.pi / 2.0 - 2.0 * np.arctan(t)
        lat_rad = chi
        for _ in range(8):
            sin_lat = np.sin(lat_rad)
            lat_rad = np.pi / 2.0 - 2.0 * np.arctan(
                t * np.power((1.0 - _E * sin_lat) / (1.0 + _E * sin_lat), _E / 2.0)
            )
        lon = _LON0_3413 + np.degrees(np.arctan2(x, -y))
        return lon, np.degrees(lat_rad)
    raise ValueError(f"unsupported CRS: {crs}")


def normalize_antimeridian(lon: np.ndarray) -> np.ndarray:
    """Shift lon into [-180, 180) — the reference's x-360 fix for GEE
    patches west of the antimeridian (``accessors/gee.py:211-215``,
    tested in ``tests/test_antimeridian.py``)."""
    lon = np.asarray(lon, dtype=np.float64)
    return ((lon + 180.0) % 360.0) - 180.0
