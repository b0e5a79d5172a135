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


def parse_polygon(roi) -> tuple[np.ndarray, np.ndarray]:
    """Normalize a polygon ROI (the reference ``load()`` accepts
    ``Geometry | GeoBox | GeoDataFrame``, ``core/accessor.py:331-358``;
    shapely is unavailable here, so the accepted spellings are a WKT
    ``POLYGON ((x y, x y, ...))`` string or a sequence of (x, y)
    vertex pairs). Returns (poly_x, poly_y) float64 arrays with the
    closing duplicate vertex stripped. Single ring only — holes and
    multipolygons raise."""
    if isinstance(roi, str):
        import re

        s = roi.strip()
        m = re.fullmatch(r"POLYGON\s*\(\(([^()]*)\)\)", s, flags=re.IGNORECASE)
        if m is None:
            raise ValueError(
                "only single-ring 'POLYGON ((x y, ...))' WKT is supported; "
                f"got {s[:60]!r}"
            )
        pts = [tuple(float(v) for v in p.split()) for p in m.group(1).split(",")]
    else:
        pts = [tuple(float(v) for v in p) for p in roi]
    if any(len(p) != 2 for p in pts):
        raise ValueError("polygon vertices must be (x, y) pairs")
    if len(pts) >= 2 and pts[0] == pts[-1]:
        pts = pts[:-1]
    if len(pts) < 3:
        raise ValueError(f"polygon needs >= 3 distinct vertices; got {len(pts)}")
    if any(pts[i] == pts[(i + 1) % len(pts)] for i in range(len(pts))):
        raise ValueError("polygon has a zero-length edge (repeated vertex)")
    arr = np.asarray(pts, dtype=np.float64)
    return arr[:, 0], arr[:, 1]


def rects_intersect_polygon(
    minx: np.ndarray,
    miny: np.ndarray,
    maxx: np.ndarray,
    maxy: np.ndarray,
    poly_x: np.ndarray,
    poly_y: np.ndarray,
) -> np.ndarray:
    """Exact rect x polygon intersection mask (closed sets; touching
    counts). Per rect: true iff (a) some polygon edge intersects the
    rect — separating-axis test, division-free: edge-bbox overlap AND
    the 4 rect corners are not all STRICTLY on one side of the edge's
    line — or (b) the (minx, miny) corner is inside the polygon (the
    rect-fully-inside case; every other configuration implies an edge
    hit, incl. polygon-inside-rect, since an interior segment's line
    splits the rect corners).

    Mirrors :func:`rect_polygon_predicate_sql` EXPRESSION FOR
    EXPRESSION — that generator is the DuckDB oracle of the engine's
    polygon chunk plan, so any drift here is a parity break."""
    minx = np.asarray(minx, dtype=np.float64)[:, None]  # (n, 1)
    miny = np.asarray(miny, dtype=np.float64)[:, None]
    maxx = np.asarray(maxx, dtype=np.float64)[:, None]
    maxy = np.asarray(maxy, dtype=np.float64)[:, None]
    vx = np.asarray(poly_x, dtype=np.float64)[None, :]  # (1, m)
    vy = np.asarray(poly_y, dtype=np.float64)[None, :]
    vx2 = np.roll(vx, -1, axis=1)
    vy2 = np.roll(vy, -1, axis=1)
    dx = vx2 - vx
    dy = vy2 - vy

    bbox_ok = (
        (np.minimum(vx, vx2) <= maxx)
        & (np.maximum(vx, vx2) >= minx)
        & (np.minimum(vy, vy2) <= maxy)
        & (np.maximum(vy, vy2) >= miny)
    )
    corners = ((minx, miny), (minx, maxy), (maxx, miny), (maxx, maxy))
    sides = [dx * (cy - vy) - dy * (cx - vx) for cx, cy in corners]
    all_pos = np.logical_and.reduce([s > 0 for s in sides])
    all_neg = np.logical_and.reduce([s < 0 for s in sides])
    edge_hit = (bbox_ok & ~(all_pos | all_neg)).any(axis=1)
    corner_in = points_in_polygon(
        minx.ravel(), miny.ravel(), poly_x, poly_y
    )
    return edge_hit | corner_in


def point_in_polygon_predicate_sql(
    poly_x: np.ndarray, poly_y: np.ndarray, px: str, py: str
) -> str:
    """SQL predicate: even-odd PIP of point expressions against a
    LITERAL polygon — expression-for-expression the same math as
    :func:`points_in_polygon` (vertex constants inlined with ``repr``;
    horizontal edges constant-folded out, so no divisor is zero).
    One shared string serves Spark (inside array-lambda codegen — the
    pixel-mask path of polygon zonal stats) AND DuckDB (the per-pixel
    oracle replay), which is what makes the float comparisons
    engine-identical."""
    vx = [float(v) for v in np.asarray(poly_x, dtype=np.float64)]
    vy = [float(v) for v in np.asarray(poly_y, dtype=np.float64)]
    m = len(vx)
    cross_terms = []
    for i in range(m):
        x1, y1 = vx[i], vy[i]
        x2, y2 = vx[(i + 1) % m], vy[(i + 1) % m]
        dx, dy = x2 - x1, y2 - y1
        if y1 == y2:
            continue  # horizontal edge never crosses its own ray
        cross_terms.append(
            f"CAST((({y1!r} > ({py})) <> ({y2!r} > ({py})))"
            f" AND (({px}) < {x1!r} + (({py}) - {y1!r}) * {dx!r} / {dy!r})"
            " AS INT)"
        )
    return "((" + " + ".join(cross_terms) + ") % 2 = 1)"


def rect_polygon_predicate_sql(
    poly_x: np.ndarray,
    poly_y: np.ndarray,
    minx: str,
    miny: str,
    maxx: str,
    maxy: str,
) -> str:
    """SQL predicate equivalent of :func:`rects_intersect_polygon` for
    a LITERAL polygon over rect-bound column expressions — the DuckDB
    oracle of the polygon chunk plan. Vertex-derived constants are
    computed in Python and inlined with ``repr`` so both evaluations
    use the same IEEE doubles (CLAUDE.md float-constant rule); the
    horizontal-edge ray-crossing term is constant-folded to FALSE at
    generation time, so no divisor can be zero."""
    vx = [float(v) for v in np.asarray(poly_x, dtype=np.float64)]
    vy = [float(v) for v in np.asarray(poly_y, dtype=np.float64)]
    m = len(vx)
    edge_terms = []
    for i in range(m):
        x1, y1 = vx[i], vy[i]
        x2, y2 = vx[(i + 1) % m], vy[(i + 1) % m]
        dx, dy = x2 - x1, y2 - y1
        sides = [
            f"({dx!r} * (({cy}) - {y1!r}) - {dy!r} * (({cx}) - {x1!r}))"
            for cx, cy in (
                (minx, miny), (minx, maxy), (maxx, miny), (maxx, maxy),
            )
        ]
        all_pos = " AND ".join(f"{s} > 0" for s in sides)
        all_neg = " AND ".join(f"{s} < 0" for s in sides)
        edge_terms.append(
            f"({min(x1, x2)!r} <= ({maxx}) AND {max(x1, x2)!r} >= ({minx})"
            f" AND {min(y1, y2)!r} <= ({maxy}) AND {max(y1, y2)!r} >= ({miny})"
            f" AND NOT (({all_pos}) OR ({all_neg})))"
        )
    corner_in = point_in_polygon_predicate_sql(poly_x, poly_y, minx, miny)
    return "(" + "\n  OR ".join(edge_terms + [corner_in]) + ")"
