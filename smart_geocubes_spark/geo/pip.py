"""Vectorized point-in-polygon (ray casting) — the exact-refine step of
the engine's broadcast spatial join.

The reference delegates `intersects` tests to geopandas/shapely
(``gpd.sjoin`` in ``accessors/gee.py:101-107``, extent-index intersects
in ``datasets/arcticdem.py:229-231``); shapely is unavailable here, so
the refine kernel is a numpy even-odd ray cast: O(n_points * n_edges)
fully vectorized, run per Arrow batch inside a pandas UDF.
"""

from __future__ import annotations

import numpy as np


def points_in_polygon(
    px: np.ndarray, py: np.ndarray, poly_x: np.ndarray, poly_y: np.ndarray
) -> np.ndarray:
    """Even-odd rule ray casting. ``poly_x/poly_y``: polygon vertices in
    order (closing edge implied). Returns boolean mask over points.
    Boundary behaviour follows the standard crossing convention
    (half-open edges); callers use strictly-interior test points."""
    px = np.asarray(px, dtype=np.float64)[:, None]  # (n, 1)
    py = np.asarray(py, dtype=np.float64)[:, None]
    vx = np.asarray(poly_x, dtype=np.float64)[None, :]  # (1, m)
    vy = np.asarray(poly_y, dtype=np.float64)[None, :]
    vx2 = np.roll(vx, -1, axis=1)
    vy2 = np.roll(vy, -1, axis=1)

    # edge straddles the horizontal ray through py
    cond = (vy > py) != (vy2 > py)
    # x coordinate where the edge crosses that ray
    with np.errstate(divide="ignore", invalid="ignore"):
        x_cross = vx + (py - vy) * (vx2 - vx) / (vy2 - vy)
    crossings = cond & (px < x_cross)
    return (crossings.sum(axis=1) % 2).astype(bool)
