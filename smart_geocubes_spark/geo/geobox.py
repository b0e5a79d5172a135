"""Affine GeoBox + chunk-aligned tile grid (pure numpy, no Spark).

Plays the role of the reference's ``odc.geo.GeoBox`` class variable
(``/root/reference/src/smart_geocubes/core/accessor.py:59``) and its
``GeoboxTiles(extent, (chunk_size, chunk_size))`` tile grid
(``/root/reference/src/smart_geocubes/accessors/gee.py:58-60``): every
spatial question the engine asks reduces to affine math against this
grid, and tile-id assignment must be deterministic for identical query
geometry (the reference asserts the analogous chunk layout in
``tests/test_creation.py:76-115``).

Everything here is vectorized numpy so it can run inside Arrow pandas
UDFs with zero per-row Python.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class GeoBox:
    """Fixed extent + resolution grid in a given CRS.

    ``x0, y0`` is the *top-left* corner (max-y convention, like rasters);
    ``res`` is the pixel size (positive; y decreases row-wise).
    """

    crs: str
    x0: float
    y0: float
    res: float
    width: int  # pixels in x
    height: int  # pixels in y

    @property
    def extent(self) -> tuple[float, float, float, float]:
        """(minx, miny, maxx, maxy)."""
        return (
            self.x0,
            self.y0 - self.height * self.res,
            self.x0 + self.width * self.res,
            self.y0,
        )

    def xy_to_pixel(self, x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """World coords -> integer pixel (col, row). Vectorized."""
        col = np.floor((np.asarray(x, dtype=np.float64) - self.x0) / self.res).astype(np.int64)
        row = np.floor((self.y0 - np.asarray(y, dtype=np.float64)) / self.res).astype(np.int64)
        return col, row

    def pixel_center(self, col: np.ndarray, row: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        x = self.x0 + (np.asarray(col, dtype=np.float64) + 0.5) * self.res
        y = self.y0 - (np.asarray(row, dtype=np.float64) + 0.5) * self.res
        return x, y

    def contains(self, x: np.ndarray, y: np.ndarray) -> np.ndarray:
        minx, miny, maxx, maxy = self.extent
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        return (x >= minx) & (x < maxx) & (y > miny) & (y <= maxy)


@dataclass(frozen=True)
class TileGrid:
    """Chunk-aligned tiling of a GeoBox.

    ``chunk_px`` mirrors the reference's ``chunk_size`` (3600 px for
    ArcticDEM/TCTrend, ``datasets/arcticdem.py:158``); a tile is one
    write/transaction unit, and ``tile_id = tile_y * n_tiles_x + tile_x``
    is the deterministic id the north rule requires.
    """

    geobox: GeoBox
    chunk_px: int

    @property
    def n_tiles_x(self) -> int:
        return -(-self.geobox.width // self.chunk_px)  # ceil div

    @property
    def n_tiles_y(self) -> int:
        return -(-self.geobox.height // self.chunk_px)

    @property
    def tile_size(self) -> float:
        """Tile edge length in world units."""
        return self.chunk_px * self.geobox.res

    def xy_to_tile(self, x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """World coords -> (tile_x, tile_y). Out-of-extent points get
        clipped ids only via :meth:`in_extent`; callers filter first."""
        gb = self.geobox
        t = self.tile_size
        tx = np.floor((np.asarray(x, dtype=np.float64) - gb.x0) / t).astype(np.int64)
        ty = np.floor((gb.y0 - np.asarray(y, dtype=np.float64)) / t).astype(np.int64)
        return tx, ty

    def tile_id(self, tx: np.ndarray, ty: np.ndarray) -> np.ndarray:
        return np.asarray(ty, dtype=np.int64) * self.n_tiles_x + np.asarray(tx, dtype=np.int64)

    def tile_bounds(self, tx: np.ndarray, ty: np.ndarray) -> tuple[np.ndarray, ...]:
        gb = self.geobox
        t = self.tile_size
        tx = np.asarray(tx, dtype=np.float64)
        ty = np.asarray(ty, dtype=np.float64)
        minx = gb.x0 + tx * t
        maxy = gb.y0 - ty * t
        return minx, maxy - t, minx + t, maxy

    def tiles_overlapping_bbox(
        self, minx: float, miny: float, maxx: float, maxy: float
    ) -> np.ndarray:
        """All (tile_x, tile_y) whose cell intersects the bbox — the
        reference's ``GeoboxTiles.tiles(roi)`` enumeration
        (``accessors/gee.py:109-112``). Returns int64 array (n, 2)."""
        t = self.tile_size
        gb = self.geobox
        x_lo = max(int(np.floor((minx - gb.x0) / t)), 0)
        x_hi = min(int(np.floor((maxx - gb.x0) / t)), self.n_tiles_x - 1)
        y_lo = max(int(np.floor((gb.y0 - maxy) / t)), 0)
        y_hi = min(int(np.floor((gb.y0 - miny) / t)), self.n_tiles_y - 1)
        if x_lo > x_hi or y_lo > y_hi:
            return np.empty((0, 2), dtype=np.int64)
        txs, tys = np.meshgrid(
            np.arange(x_lo, x_hi + 1, dtype=np.int64),
            np.arange(y_lo, y_hi + 1, dtype=np.int64),
        )
        return np.column_stack([txs.ravel(), tys.ravel()])

    def tiles_overlapping_polygon(
        self, poly_x: np.ndarray, poly_y: np.ndarray
    ) -> np.ndarray:
        """Tiles whose rectangle intersects the polygon (reference
        ``load()`` geometry branch, ``core/accessor.py:331-358``):
        bbox-enumerate candidates, then exact rect x polygon refine.
        Driver-side numpy — the tile set is metadata-sized (bounded by
        the ROI, never the cube). Returns int64 array (n, 2)."""
        from smart_geocubes_spark.geo.pip import rects_intersect_polygon

        cand = self.tiles_overlapping_bbox(
            float(np.min(poly_x)), float(np.min(poly_y)),
            float(np.max(poly_x)), float(np.max(poly_y)),
        )
        if len(cand) == 0:
            return cand
        minx, miny, maxx, maxy = self.tile_bounds(cand[:, 0], cand[:, 1])
        keep = rects_intersect_polygon(minx, miny, maxx, maxy, poly_x, poly_y)
        return cand[keep]


# The two catalog-style grids our fixtures mirror (reference extents:
# ArcticDEM EPSG:3413 res 32 m `datasets/arcticdem.py:333`; TCTrend
# EPSG:4326 res ~2.7e-4 deg `datasets/tctrend.py:35`). We scale the
# pixel counts down so unit tests stay fast; the *shape* of the math is
# identical at any size.

def arctic_4326_grid(chunk_px: int = 100) -> TileGrid:
    """Arctic band lon [-180,180) x lat [60,84], 0.015 deg pixels,
    100 px chunks -> 1.5 deg tiles -> 240 x 16 tile grid."""
    gb = GeoBox(crs="EPSG:4326", x0=-180.0, y0=84.0, res=0.015, width=24000, height=1600)
    return TileGrid(geobox=gb, chunk_px=chunk_px)


def polar_3413_grid(chunk_px: int = 100) -> TileGrid:
    """ArcticDEM-style polar stereographic grid: +-4,000 km square at
    3200 m pixels (scaled-down analog of the 32 m full grid)."""
    gb = GeoBox(crs="EPSG:3413", x0=-4_000_000.0, y0=4_000_000.0, res=3200.0, width=2500, height=2500)
    return TileGrid(geobox=gb, chunk_px=chunk_px)
