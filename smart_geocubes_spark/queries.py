"""Named engine queries + DuckDB oracle SQL (the driver contract).

Every entry returns a DataFrame whose (row multiset, column names)
must match the oracle exactly under the driver's order-insensitive
value hash — so every computed column is aliased identically on both
sides, floats only appear where both engines provably compute the
same IEEE doubles, and timestamps are exported as epoch BIGINTs
(session tz pinned to UTC).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from smart_geocubes_spark.functions.sqlgen import morton_cell_sql, tile_assign_sql
from smart_geocubes_spark.operators.geoparse import (
    extract_text_udf,
    geoparse_url,
    geoparsed_points,
)
from smart_geocubes_spark.operators.spatial_join import (
    bbox_join,
    explode_catalog_to_cells,
    pip_join,
)
from smart_geocubes_spark.operators.tiles import (
    in_extent_filter,
    make_cell_udf,
    with_tiles_native,
)
from smart_geocubes_spark.sources.synth import (
    GRID,
    catalog_df,
    pages_df,
    pages_sql,
    patches_sql,
)

# ---------------------------------------------------------------------------
# shared oracle CTE prefix (DuckDB): pages + patches + geoparsed points
# ---------------------------------------------------------------------------

_GEO_RE = r"/geo/(-?\d+),(-?\d+)/"

ORACLE_PREFIX = f"""WITH pages AS ({pages_sql("orders")}),
patches AS ({patches_sql("duckdb")}),
pts AS (
  SELECT page_id, lat_e5 / 100000.0 AS lat, lon_e5 / 100000.0 AS lon,
         warc_epoch, host_id
  FROM pages WHERE has_geo
)"""


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-side geoparsed points: REAL path (regex pandas UDF over
    url), not the generator's lat_e5 columns — the oracle cross-checks
    the parse."""
    pages = pages_df(spark, sf_dir).select("page_id", "url", "warc_epoch", "host_id")
    return geoparsed_points(pages)


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def q_geoparse(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _points(spark, sf_dir).select("page_id", "lat", "lon")


SQL_GEOPARSE = f"""{ORACLE_PREFIX}
SELECT page_id,
       CAST(regexp_extract(url, '{_GEO_RE}', 1) AS BIGINT) / 100000.0 AS lat,
       CAST(regexp_extract(url, '{_GEO_RE}', 2) AS BIGINT) / 100000.0 AS lon
FROM pages WHERE url LIKE '%/geo/%'
"""


def q_extract_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The frozen html->text extractor run as an Arrow UDF over the
    html BINARY column; oracle reconstructs the closed-form text."""
    pages = pages_df(spark, sf_dir)
    return pages.select("page_id", extract_text_udf()(F.col("html")).alias("text"))


SQL_EXTRACT_TEXT = f"""{ORACLE_PREFIX}
SELECT page_id, text FROM pages
"""


def q_tile_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic tile-id projection (JVM-side affine floor math) +
    per-tile page counts. The north-rule invariant query."""
    pts = _points(spark, sf_dir).filter(in_extent_filter(GRID))
    tiled = with_tiles_native(pts, GRID)
    return tiled.groupBy("tile_id").agg(
        F.count("*").cast("long").alias("n_pages"),
        F.sum("page_id").cast("long").alias("sum_page_id"),
    )


_TILE_EXPRS = tile_assign_sql("lon", "lat", GRID.geobox.x0, GRID.geobox.y0, GRID.tile_size, GRID.n_tiles_x)

SQL_TILE_ASSIGN = f"""{ORACLE_PREFIX}
SELECT {_TILE_EXPRS["tile_id"]} AS tile_id,
       CAST(count(*) AS BIGINT) AS n_pages,
       CAST(sum(page_id) AS BIGINT) AS sum_page_id
FROM pts
WHERE lon >= -180.0 AND lon < 180.0 AND lat > 60.0 AND lat <= 84.0
GROUP BY 1
"""


def q_cell_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton/quadkey cell encoding at res 12 (H3/S2 role) in an Arrow
    pandas UDF; oracle recomputes the bit-interleave in pure SQL."""
    pts = _points(spark, sf_dir)
    cell12 = make_cell_udf(12)
    return pts.select("page_id", cell12(F.col("lon"), F.col("lat")).alias("cell12"))


SQL_CELL_ENCODE = f"""{ORACLE_PREFIX}
SELECT page_id, {morton_cell_sql("lon", "lat", 12)} AS cell12 FROM pts
"""


def q_spatial_join_bbox(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Envelope spatial join via coarse-cell broadcast hash equi-join;
    per-patch counts. Patches overlap (0.5 deg margin) so border points
    hit several patches — the STAC-overlap case."""
    pts = _points(spark, sf_dir)
    cells = explode_catalog_to_cells(spark, catalog_df(spark))
    joined = bbox_join(pts, cells)
    return joined.groupBy("patch_id").agg(
        F.count("*").cast("long").alias("n_points"),
        F.sum("page_id").cast("long").alias("sum_page_id"),
    )


SQL_SPATIAL_JOIN_BBOX = f"""{ORACLE_PREFIX}
SELECT p.patch_id,
       CAST(count(*) AS BIGINT) AS n_points,
       CAST(sum(t.page_id) AS BIGINT) AS sum_page_id
FROM pts t JOIN patches p
  ON t.lon >= p.minx AND t.lon < p.maxx AND t.lat >= p.miny AND t.lat < p.maxy
GROUP BY 1
"""


def q_spatial_join_pip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact point-in-polygon join (ray-cast refine in Arrow UDF over
    diamond patch footprints); oracle uses the diamond's closed form
    |dx|/rx + |dy|/ry < 1 — a true independent check of the ray caster."""
    pts = _points(spark, sf_dir)
    cells = explode_catalog_to_cells(spark, catalog_df(spark))
    joined = pip_join(pts, cells)
    return joined.groupBy("patch_id").agg(
        F.count("*").cast("long").alias("n_points"),
        F.sum("page_id").cast("long").alias("sum_page_id"),
    )


SQL_SPATIAL_JOIN_PIP = f"""{ORACLE_PREFIX}
SELECT p.patch_id,
       CAST(count(*) AS BIGINT) AS n_points,
       CAST(sum(t.page_id) AS BIGINT) AS sum_page_id
FROM pts t JOIN patches p
  ON t.lon >= p.minx AND t.lon < p.maxx AND t.lat >= p.miny AND t.lat < p.maxy
WHERE abs(t.lon - p.cx) / p.rx + abs(t.lat - p.cy) / p.ry < 1.0
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "geoparse": q_geoparse,
    "extract_text": q_extract_text,
    "tile_assign": q_tile_assign,
    "cell_encode": q_cell_encode,
    "spatial_join_bbox": q_spatial_join_bbox,
    "spatial_join_pip": q_spatial_join_pip,
}

ORACLES: dict[str, str] = {
    "geoparse": SQL_GEOPARSE,
    "extract_text": SQL_EXTRACT_TEXT,
    "tile_assign": SQL_TILE_ASSIGN,
    "cell_encode": SQL_CELL_ENCODE,
    "spatial_join_bbox": SQL_SPATIAL_JOIN_BBOX,
    "spatial_join_pip": SQL_SPATIAL_JOIN_PIP,
}
