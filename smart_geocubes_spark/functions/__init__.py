from smart_geocubes_spark.functions.sqlgen import morton_cell_sql, tile_assign_sql

__all__ = ["morton_cell_sql", "tile_assign_sql"]
