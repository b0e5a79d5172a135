"""smart_geocubes_spark — a from-scratch PySpark-native geocube engine.

Re-expresses the semantics of relativityhd/smart-geocubes (a Python
xarray/zarr/icechunk raster-cube cache, see /root/reference) as a
DataFrame-first Spark engine:

- fixed chunk-aligned tile grid (reference: ``core/accessor.py:59``,
  ``accessors/gee.py:58-60``) -> affine grid math as vectorized column
  expressions / Arrow pandas UDFs;
- intersect -> download-new -> store -> slice query lifecycle
  (reference: ``docs/how_it_works.md:48-53``) -> broadcast spatial join +
  left-anti lineage join + partitioned parquet materialization;
- ``loaded_patches`` icechunk commit-log idempotency (reference:
  ``backends/simple.py:36-38``) -> append-only lineage table, resumable.

No code is copied from the reference; it is a different execution model
(single-process thread pools vs. distributed DataFrame plans).
"""

__version__ = "0.1.0"
