"""Property-based tests (hypothesis) for the geo kernel invariants."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from smart_geocubes_spark.geo import cell_decode, cell_encode, cell_parent, project, unproject
from smart_geocubes_spark.geo.geobox import arctic_4326_grid
from smart_geocubes_spark.geo.pip import points_in_polygon

lons = st.floats(min_value=-179.999, max_value=179.999, allow_nan=False)
lats = st.floats(min_value=-89.999, max_value=89.999, allow_nan=False)
arctic_lats = st.floats(min_value=55.0, max_value=89.9, allow_nan=False)


@settings(max_examples=200, deadline=None)
@given(lon=lons, lat=lats, res=st.integers(min_value=0, max_value=16))
def test_cell_roundtrip_and_parent_containment(lon, lat, res):
    c = cell_encode(np.array([lon]), np.array([lat]), res)
    ix, iy, r = cell_decode(c)
    assert r[0] == res
    n = 1 << res
    assert 0 <= ix[0] < n and 0 <= iy[0] < n
    if res > 0:
        p = cell_parent(c, 1)
        pix, piy, pr = cell_decode(p)
        assert pr[0] == res - 1
        assert pix[0] == ix[0] >> 1 and piy[0] == iy[0] >> 1
        # parent cell of the point computed directly must agree
        assert (p == cell_encode(np.array([lon]), np.array([lat]), res - 1)).all()


@settings(max_examples=200, deadline=None)
@given(lon=lons, lat=arctic_lats)
def test_projection_roundtrips(lon, lat):
    for crs in ("EPSG:3413", "EPSG:3857"):
        x, y = project(np.array([lon]), np.array([lat]), crs)
        lon2, lat2 = unproject(x, y, crs)
        dlon = (lon2[0] - lon + 180.0) % 360.0 - 180.0
        assert abs(dlon) < 1e-8
        assert abs(lat2[0] - lat) < 1e-8


@settings(max_examples=100, deadline=None)
@given(lon=lons, lat=arctic_lats)
def test_tile_assignment_consistent_with_bbox_enumeration(lon, lat):
    """A point's tile must be inside the tile set enumerated for any
    bbox containing the point (north-rule determinism invariant)."""
    grid = arctic_4326_grid()
    minx, miny, maxx, maxy = grid.geobox.extent
    if not (minx <= lon < maxx and miny < lat <= maxy):
        return
    tx, ty = grid.xy_to_tile(np.array([lon]), np.array([lat]))
    tiles = grid.tiles_overlapping_bbox(lon - 0.01, lat - 0.01, lon + 0.01, lat + 0.01)
    assert any((t[0] == tx[0] and t[1] == ty[0]) for t in tiles)


@settings(max_examples=100, deadline=None)
@given(
    cx=st.floats(min_value=-100, max_value=100),
    cy=st.floats(min_value=-60, max_value=60),
    rx=st.floats(min_value=0.1, max_value=5),
    ry=st.floats(min_value=0.1, max_value=5),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_pip_diamond_equals_closed_form(cx, cy, rx, ry, seed):
    rng = np.random.default_rng(seed)
    vx = np.array([cx, cx + rx, cx, cx - rx])
    vy = np.array([cy + ry, cy, cy - ry, cy])
    px = rng.uniform(cx - 2 * rx, cx + 2 * rx, 200)
    py = rng.uniform(cy - 2 * ry, cy + 2 * ry, 200)
    want = (np.abs(px - cx) / rx + np.abs(py - cy) / ry) < 1.0
    got = points_in_polygon(px, py, vx, vy)
    # exclude points razor-close to the boundary (FP tie zone)
    margin = np.abs(np.abs(px - cx) / rx + np.abs(py - cy) / ry - 1.0) > 1e-12
    assert (got[margin] == want[margin]).all()
