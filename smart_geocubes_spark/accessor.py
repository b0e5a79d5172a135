"""User-facing accessor — the API-parity layer with the reference.

A smart-geocubes user works with a dataset accessor class exposing
``create / load / load_like / procedural_download / loaded_patches /
current_state`` (reference: ``core/accessor.py:206-498``). This module
re-exposes the same surface over the Spark engine, including preset
dataset grids mirroring the reference's dataset modules
(``datasets/arcticdem.py:333`` EPSG:3413, ``datasets/tctrend.py:35``
EPSG:4326 — scaled-down pixel counts, identical math shape).

Reference -> engine mapping:
  load(aoi, toi, persist, create)    -> GeocubeAccessor.load (materialize
                                        + pruned scan; persist => toPandas)
  procedural_download                -> GeocubeAccessor.fill (idempotent)
  loaded_patches (zarr attrs)        -> lineage chunk keys
  current_state                      -> lineage join tile bounds
  create(overwrite)                  -> create with FileExistsError parity
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from smart_geocubes_spark.geo.geobox import GeoBox, TileGrid
from smart_geocubes_spark.plans.materialize import (
    CubeSpec,
    create_cube,
    load as load_blocks,
    materialize,
    open_spec,
    read_lineage,
)

BBox = tuple[float, float, float, float]


@dataclass
class GeocubeAccessor:
    """One cube = one accessor instance (reference: one dataset class)."""

    spark: SparkSession
    path: str
    spec: CubeSpec

    def create(self, overwrite: bool = False) -> None:
        """DDL (reference ``create()``, exists/overwrite semantics of
        ``tests/test_creation.py:122-140``)."""
        if overwrite and os.path.exists(self.path):
            shutil.rmtree(self.path)
        create_cube(self.path, self.spec)

    @property
    def created(self) -> bool:
        return os.path.exists(os.path.join(self.path, "_meta.json"))

    def assert_created(self) -> None:
        if not self.created:
            raise FileNotFoundError(f"cube not created: {self.path}")

    def fill(self, roi: BBox, toi_epochs: list[int] | None = None) -> dict:
        """procedural_download analog: idempotent cache fill."""
        self.assert_created()
        return materialize(self.spark, self.path, roi, toi_epochs)

    def load(
        self,
        roi: BBox,
        toi_epochs: list[int] | None = None,
        persist: bool = False,
        create: bool = False,
    ) -> DataFrame | pd.DataFrame:
        """The flagship four-step query (docs/how_it_works.md:48-53):
        intersect -> download new -> store -> return ROI slice.
        ``persist=True`` materializes driver-side (xarray-load analog);
        otherwise the lazy DataFrame is the dask-lazy view."""
        if create:
            try:
                self.create(overwrite=False)
            except FileExistsError:
                pass
        self.assert_created()
        if toi_epochs is not None and self.spec.time_epochs is None:
            raise ValueError("TOI given for an atemporal cube")
        self.fill(roi, toi_epochs)
        df = load_blocks(self.spark, self.path, roi, toi_epochs)
        return df.toPandas() if persist else df

    def load_like(self, ref: DataFrame, persist: bool = False) -> DataFrame | pd.DataFrame:
        """Derive ROI (and TOI) from another result frame
        (reference ``load_like``, core/accessor.py:302-329)."""
        spec = self.spec
        b = ref.agg(
            F.min("tile_x"), F.min("tile_y"), F.max("tile_x"), F.max("tile_y")
        ).collect()[0]
        minx, _, _, maxy0 = spec.grid.tile_bounds(pd.Series([b[0]]), pd.Series([b[1]]))
        _, miny, maxx, _ = spec.grid.tile_bounds(pd.Series([b[2]]), pd.Series([b[3]]))
        eps = spec.grid.geobox.res / 2
        roi = (float(minx[0]) + eps, float(miny[0]) + eps, float(maxx[0]) - eps, float(maxy0[0]) - eps)
        return self.load(roi, persist=persist)

    def loaded_patches(self) -> list[str]:
        """The lineage chunk keys (reference zarr-attr list,
        core/accessor.py:155-166)."""
        return [
            r.chunk_key
            for r in read_lineage(self.spark, self.path).select("chunk_key").distinct().collect()
        ]

    def current_state(self) -> pd.DataFrame | None:
        """Materialized-tile extents (reference ``current_state``,
        core/accessor.py:474-483): one row per committed chunk with its
        tile bounds; None when nothing is loaded."""
        lin = read_lineage(self.spark, self.path)
        pdf = lin.select("chunk_key", "tile_id", "time_idx", "channel").distinct().toPandas()
        if pdf.empty:
            return None
        nx = self.spec.grid.n_tiles_x
        tx, ty = pdf["tile_id"] % nx, pdf["tile_id"] // nx
        minx, miny, maxx, maxy = self.spec.grid.tile_bounds(tx, ty)
        return pdf.assign(minx=minx, miny=miny, maxx=maxx, maxy=maxy)

    def metrics(self) -> pd.DataFrame:
        """Per-run metrics (event-log analog, core/backend.py:23-28)."""
        import glob
        import json

        rows = []
        for p in sorted(glob.glob(os.path.join(self.path, "metrics", "*.json"))):
            with open(p) as f:
                rows.append(json.load(f))
        return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# dataset presets (reference datasets/, scaled pixel counts)
# ---------------------------------------------------------------------------

def arcticdem_like(spark: SparkSession, path: str, chunk_px: int = 100) -> GeocubeAccessor:
    """EPSG:3413 polar-stereographic DEM cube: channels dem:float +
    datamask (reference ``datasets/arcticdem.py:158-172,333``)."""
    gb = GeoBox(crs="EPSG:3413", x0=-4_000_000.0, y0=4_000_000.0, res=3200.0, width=2500, height=2500)
    spec = CubeSpec(grid=TileGrid(geobox=gb, chunk_px=chunk_px), channels=("dem", "datamask"), time_epochs=None)
    return GeocubeAccessor(spark=spark, path=path, spec=spec)


def tctrend_like(spark: SparkSession, path: str, chunk_px: int = 100) -> GeocubeAccessor:
    """EPSG:4326 temporal trend cube: TCB/TCG/TCW slopes over 4 yearly
    steps (reference ``datasets/tctrend.py:35-57``,
    ``datasets/alphaearth.py:36``)."""
    gb = GeoBox(crs="EPSG:4326", x0=-180.0, y0=84.0, res=0.015, width=24000, height=1600)
    spec = CubeSpec(
        grid=TileGrid(geobox=gb, chunk_px=chunk_px),
        channels=("tcb_slope", "tcg_slope", "tcw_slope"),
        time_epochs=(1577836800, 1609459200, 1640995200, 1672531200),
    )
    return GeocubeAccessor(spark=spark, path=path, spec=spec)
