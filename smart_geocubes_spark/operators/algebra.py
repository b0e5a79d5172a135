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


def temporal_composite(blocks: DataFrame, stat: str = "median") -> DataFrame:
    """Per-pixel reduction ACROSS a temporal cube's time steps (the
    cloud-free-composite role: xarray ``cube.median('time')`` over the
    reference's time axis). ONE shuffle: groupBy the spatial chunk
    coordinate, collect the T time-step blocks, then a per-pixel gather
    + fold entirely in JVM codegen. T is the cube's time-axis length —
    small by the data model (the reference's TOI axes are a handful of
    mosaics) — so a grouped row holds T blocks, same order of magnitude
    as the focal halo assembly.

    VALID-aware: NULL/NaN pixels (patch borders, missing steps) are
    excluded per pixel; a pixel with no valid step stays NULL. For even
    T ``median`` is the LOWER median (deterministic, order-free — an
    averaged median is a different number than any observed value and
    muddies integer-exact oracles).

    Returns one row per (tile_y, tile_x, tile_id, channel) with the
    composite ``block``.
    """
    if stat not in ("median", "mean", "min", "max"):
        raise ValueError(f"unknown stat {stat!r}")
    agg = blocks.groupBy("tile_y", "tile_x", "tile_id", "channel").agg(
        F.collect_list("block").alias("_blks")
    )
    valid = "filter(transform(_blks, b -> b[i]), x -> x IS NOT NULL AND NOT isnan(x))"
    if stat == "median":
        # the array(...)[0] wrap binds the sorted-valid array to ONE
        # lambda variable so size() and the index read share a single
        # evaluation (CLAUDE.md: hoist subexpressions used per element)
        pick = (
            f"transform(array(array_sort({valid})), v -> "
            "IF(size(v) = 0, CAST(NULL AS DOUBLE), "
            "v[CAST((size(v) - 1) DIV 2 AS INT)]))[0]"
        )
    elif stat == "mean":
        pick = (
            f"transform(array({valid}), v -> "
            "IF(size(v) = 0, CAST(NULL AS DOUBLE), "
            "aggregate(v, 0.0D, (a, x) -> a + x) / CAST(size(v) AS DOUBLE)))[0]"
        )
    elif stat == "min":
        pick = f"array_min({valid})"
    else:
        pick = f"array_max({valid})"
    return agg.withColumn(
        "block", F.expr(f"transform(sequence(0, size(_blks[0]) - 1), i -> {pick})")
    ).drop("_blks")


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
