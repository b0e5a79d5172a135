"""Temporal operators: as-of (nearest) time mapping + bucketed
interval/range join.

Reference analogs: TOI nearest-indexing (``core/toi.py:10-42``,
``core/backend.py:256-257`` — ``get_indexer(..., method="nearest")``)
and the patch validity windows of STAC search
(``accessors/stac.py:100-101``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: 30-day bucket length used by the interval join.
BUCKET_SEC = 2592000


def asof_nearest(events: DataFrame, axis: DataFrame, ts_col: str = "warc_epoch") -> DataFrame:
    """Map each event timestamp onto the nearest axis step (ties ->
    smaller time_idx). ``axis``: (time_idx int, epoch long), tiny by
    contract (a cube time axis, reference ``core/toi.py:33-37``).

    Plan: the axis is collected (it is metadata-sized) and baked into
    the projection as literal arrays; the nearest step index is the
    COUNT of inter-step midpoints strictly below the event timestamp
    (``2*ts > e_i + e_{i+1}`` — integer math, no float midpoints), a
    single ``aggregate`` over a literal array. Zero joins, zero
    shuffles, zero row fan-out: the event side stays a one-pass
    projection inside whole-stage codegen, which is the only plan that
    survives 10^12 events (the previous crossJoin x |axis| + per-row
    window shuffled N*|axis| rows on a unique key).

    Tie semantics match the reference's ``get_indexer(method="nearest")``
    + (abs diff, time_idx) ordering: an exact midpoint snaps to the
    EARLIER step. Axis contract: time_idx is monotone in epoch
    (duplicate epochs collapse to the smallest time_idx, which is what
    the window formulation picked too). Adds ``time_idx``."""
    rows = axis.select("time_idx", "epoch").collect()
    if not rows:
        raise ValueError("empty time axis")
    by_epoch: dict[int, int] = {}
    for r in rows:
        e, i = int(r["epoch"]), int(r["time_idx"])
        if e not in by_epoch or i < by_epoch[e]:
            by_epoch[e] = i
    pairs = sorted(by_epoch.items())
    epochs = [e for e, _ in pairs]
    idxs = [i for _, i in pairs]

    ts2 = (F.col(ts_col).cast("long") * F.lit(2)).cast("long")
    if len(epochs) == 1:
        pos = F.lit(0)
    else:
        sums = [epochs[i] + epochs[i + 1] for i in range(len(epochs) - 1)]
        pos = F.aggregate(
            F.array(*[F.lit(s).cast("long") for s in sums]),
            F.lit(0),
            lambda acc, s: acc + F.when(ts2 > s, F.lit(1)).otherwise(F.lit(0)),
        )
    idx_arr = F.array(*[F.lit(int(i)).cast("int") for i in idxs])
    # NULL ts -> NULL time_idx: without the guard every when() in the
    # midpoint count takes the otherwise branch, pos = 0, and a NULL
    # event silently snaps to the FIRST axis step (fabricated match) —
    # mirror merge_asof_backward's unmatched-rows-stay-NULL contract
    mapped = F.when(
        F.col(ts_col).isNotNull(), F.element_at(idx_arr, pos + F.lit(1))
    ).otherwise(F.lit(None).cast("int"))
    return events.withColumn("time_idx", mapped)


def merge_asof_backward(
    events: DataFrame,
    table: DataFrame,
    by_col: str,
    ts_col: str,
    t_col: str,
) -> DataFrame:
    """Keyed as-of join (pandas ``merge_asof(direction='backward',
    by=...)`` analog): for each event row, the greatest ``t_col`` <=
    event ``ts_col`` among table rows in the same ``by_col`` group.

    ``table`` is catalog-sized by contract, so its per-key sorted time
    axes are collected and baked in as ONE map literal
    (key -> sorted epoch array); the per-event lookup is a count of
    entries <= ts into that key's array (same shape as
    :func:`asof_nearest`, generalized to keyed axes). The event side
    stays a one-pass projection: zero joins, zero shuffles, zero
    fan-out — vs the join+window formulation that shuffles the event
    table on (key, ts). Adds ``asof_t`` (nullable: no match)."""
    rows = (
        table.select(by_col, t_col)
        .filter(F.col(t_col).isNotNull() & F.col(by_col).isNotNull())
        .collect()
    )  # keyless/timeless table rows are ignored, like pandas merge_asof
    groups: dict[int, list[int]] = {}
    for r in rows:
        k, t = r[by_col], r[t_col]
        # NaN from pandas float columns is NOT SQL NULL — guard both
        if k is None or t is None or k != k or t != t:
            continue
        groups.setdefault(int(k), []).append(int(t))
    if not groups:
        return events.withColumn("asof_t", F.lit(None).cast("long"))
    entries = []
    for k in sorted(groups):
        ts_sorted = sorted(set(groups[k]))
        entries.append(F.lit(k).cast("long"))
        entries.append(F.array(*[F.lit(t).cast("long") for t in ts_sorted]))
    axis_map = F.create_map(*entries)
    # hoist the key's axis array into its own column: referenced inline
    # it would duplicate the whole map literal once per consumer
    # expression (observed 4 copies in the plan)
    ev = events.withColumn("_axis", F.element_at(axis_map, F.col(by_col).cast("long")))
    ts = F.col(ts_col).cast("long")
    pos = F.aggregate(
        F.col("_axis"),
        F.lit(0),
        lambda acc, t: acc + F.when(t <= ts, F.lit(1)).otherwise(F.lit(0)),
    )
    asof_t = F.when(
        F.col("_axis").isNotNull() & (pos > 0), F.element_at(F.col("_axis"), pos)
    ).otherwise(F.lit(None).cast("long"))
    return ev.withColumn("asof_t", asof_t).drop("_axis")


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
