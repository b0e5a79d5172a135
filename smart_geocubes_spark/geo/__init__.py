from smart_geocubes_spark.geo.geobox import GeoBox, TileGrid
from smart_geocubes_spark.geo.projection import project, unproject
from smart_geocubes_spark.geo.cells import (
    cell_decode,
    cell_encode,
    cell_parent,
    cell_ring,
)
from smart_geocubes_spark.geo.pip import points_in_polygon

__all__ = [
    "GeoBox",
    "TileGrid",
    "project",
    "unproject",
    "cell_encode",
    "cell_decode",
    "cell_parent",
    "cell_ring",
    "points_in_polygon",
]
