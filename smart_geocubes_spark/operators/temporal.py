"""Temporal operators: as-of (nearest) time mapping + bucketed
interval/range join.

Reference analogs: TOI nearest-indexing (``core/toi.py:10-42``,
``core/backend.py:256-257`` — ``get_indexer(..., method="nearest")``)
and the patch validity windows of STAC search
(``accessors/stac.py:100-101``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: 30-day bucket length used by the interval join.
BUCKET_SEC = 2592000


def asof_nearest(events: DataFrame, axis: DataFrame, ts_col: str = "warc_epoch") -> DataFrame:
    """Map each event timestamp onto the nearest axis step (ties ->
    smaller time_idx). ``axis``: (time_idx int, epoch long), tiny ->
    broadcast cross join + one window. Adds ``time_idx``.

    Each input ROW is matched independently: a per-row id keys the
    window so fully-duplicate event rows are preserved (partitioning by
    the event columns would silently collapse them)."""
    ev = events.withColumn("_rid", F.monotonically_increasing_id())
    j = ev.crossJoin(F.broadcast(axis))
    w = Window.partitionBy("_rid").orderBy(
        F.abs(F.col(ts_col) - F.col("epoch")).asc(), F.col("time_idx").asc()
    )
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn", "epoch", "_rid")
    )


def bucketed_range_join(
    events: DataFrame,
    intervals: DataFrame,
    ts_col: str = "warc_epoch",
    start_col: str = "t_start_epoch",
    end_col: str = "t_end_epoch",
) -> DataFrame:
    """events x intervals ON ts BETWEEN [start, end], as a hash
    equi-join instead of a nested-loop theta join:

    intervals (small) are exploded onto the 30-day buckets their window
    spans (``sequence`` + ``explode``, JVM-side) and broadcast; events
    compute one bucket with pure column math; equi-join on bucket, then
    the exact BETWEEN filter. At 10^12 events this keeps the event side
    single-pass, shuffle-free, and AQE-skew-splittable."""
    iv = intervals.filter(F.col(start_col).isNotNull()).withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / BUCKET_SEC).cast("long"),
                F.floor(F.col(end_col) / BUCKET_SEC).cast("long"),
            )
        ),
    )
    ev = events.withColumn("bucket", F.floor(F.col(ts_col) / BUCKET_SEC).cast("long"))
    return ev.join(F.broadcast(iv), "bucket", "inner").filter(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) <= F.col(end_col))
    )
