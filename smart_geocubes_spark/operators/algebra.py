"""Per-pixel raster algebra across bands of a cube (map-algebra /
band-math role — the reference exposes its channels as xarray data
variables, ``core/accessor.py:269-276``, where users compute NDVI-style
combinations with xarray broadcasting; here the same combination is a
Spark plan over ``load()``'s block frame).

Plan shape (the 100-TB design): both bands come off the SAME pruned
scan; the pairing is ONE hash aggregation on the chunk coordinate
(groupBy + conditional first), never a self-join — so the whole
operator costs one shuffle of the ROI's blocks, and the per-pixel
combine is a JVM ``zip_with`` inside whole-stage codegen (no Python).
A join-based pairing would shuffle BOTH sides and add join machinery
for zero benefit; a pivot would widen the aggregate the same way this
does with more planner surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def band_math(
    blocks: DataFrame,
    band_a: str,
    band_b: str,
    zip_expr: str,
    out_name: str = "block",
) -> DataFrame:
    """Combine two bands of a ``load()`` frame per pixel.

    ``zip_expr`` is a SQL lambda over (x, y) = (band_a pixel, band_b
    pixel), e.g. ``"(x, y) -> (x - y) / greatest(x + y, 1e-12D)"`` for
    a guarded normalized difference (guard the denominator — Spark 4 is
    ANSI and divide-by-zero throws). Chunks missing either band are
    dropped (an unfilled band is not silently zero).

    Returns one row per chunk: (tile_y, tile_x, tile_id, time_idx,
    ``out_name`` array<double>).
    """
    g = (
        blocks.filter(F.col("channel").isin([band_a, band_b]))
        .groupBy("tile_y", "tile_x", "tile_id", "time_idx")
        .agg(
            F.first(
                F.when(F.col("channel") == band_a, F.col("block")),
                ignorenulls=True,
            ).alias("_a"),
            F.first(
                F.when(F.col("channel") == band_b, F.col("block")),
                ignorenulls=True,
            ).alias("_b"),
        )
    )
    return (
        g.filter(F.col("_a").isNotNull() & F.col("_b").isNotNull())
        .withColumn(out_name, F.expr(f"zip_with(_a, _b, {zip_expr})"))
        .drop("_a", "_b")
    )
