"""Time-of-interest (TOI) normalization — reference ``core/toi.py:10-42``.

The reference's ``normalize_toi`` snaps arbitrary timestamps onto the
cube's temporal extent with ``pd.DatetimeIndex.get_indexer`` (default
``method="nearest"``) and accepts scalars, lists, slices, and ``None``
(= the full axis). This engine keeps its temporal axis as UTC epoch
BIGINTs (CLAUDE.md oracle rule: no raw timestamps anywhere near the
engines), so normalization is integer math over the metadata-sized
axis — pure driver-side, no Spark job.

Semantics mirrored from pandas (verified against
``DatetimeIndex.get_indexer`` / ``slice_indexer``):

- ``nearest``: an exact inter-step midpoint snaps to the LATER step
  (pandas tie behavior; note ``operators.temporal.asof_nearest``
  documents the opposite tie for its own distributed contract).
- ``pad``/``ffill``: greatest axis step <= t; ``backfill``/``bfill``:
  smallest axis step >= t.
- slices are label slices: BOTH ends inclusive, ``None`` end = open.
- not-found raises ``ValueError`` (reference raises on an empty
  normalization; where pandas ``get_indexer`` yields -1 for an
  out-of-range pad/backfill the reference's ``extent[idxr]`` silently
  wraps to the LAST axis step — we raise instead of reproducing the
  wrap, keeping the reference's *documented* contract).

The return is the sorted de-duplicated epoch list (fill/load treat the
TOI as a set of axis steps; request order and multiplicity carry no
meaning for a cache fill).
"""

from __future__ import annotations

import datetime as _dt
from bisect import bisect_left, bisect_right
from collections.abc import Sequence

#: what a single TOI element may be: epoch seconds, ISO date string,
#: or a datetime (naive = UTC, matching the epoch-BIGINT convention)
TOIValue = int | float | str | _dt.datetime | _dt.date

_METHODS = ("nearest", "pad", "ffill", "backfill", "bfill")


def to_epoch(value: TOIValue) -> int:
    """One TOI element -> UTC epoch seconds (ints pass through)."""
    if isinstance(value, bool):  # bool is an int subclass — reject
        raise TypeError(f"invalid TOI element: {value!r}")
    if isinstance(value, int):
        return value
    if isinstance(value, float):
        if not value.is_integer():
            raise ValueError(f"non-integer epoch seconds: {value!r}")
        return int(value)
    if isinstance(value, str):
        d = _dt.datetime.fromisoformat(value)
    elif isinstance(value, _dt.datetime):
        d = value
    elif isinstance(value, _dt.date):
        d = _dt.datetime(value.year, value.month, value.day)
    else:
        raise TypeError(f"invalid TOI element: {value!r}")
    if d.tzinfo is None:
        d = d.replace(tzinfo=_dt.timezone.utc)
    return int(d.timestamp())


def _snap(epochs: list[int], t: int, method: str) -> int:
    """Index of the axis step ``t`` snaps to, or raise ValueError."""
    if method in ("pad", "ffill"):
        i = bisect_right(epochs, t) - 1
        if i < 0:
            raise ValueError(f"Time {t} not found in temporal extent (before first step, method={method}).")
        return i
    if method in ("backfill", "bfill"):
        i = bisect_left(epochs, t)
        if i >= len(epochs):
            raise ValueError(f"Time {t} not found in temporal extent (after last step, method={method}).")
        return i
    # nearest: pandas tie -> LATER step, so compare 2t against step sums
    # in integer math (no float midpoints)
    i = bisect_left(epochs, t)
    if i == 0:
        return 0
    if i == len(epochs):
        return len(epochs) - 1
    return i - 1 if 2 * t < epochs[i - 1] + epochs[i] else i


def normalize_toi(
    time_epochs: Sequence[int] | None,
    toi: TOIValue | Sequence[TOIValue] | slice | None,
    method: str = "nearest",
) -> list[int] | None:
    """Snap a TOI onto the cube's epoch axis (reference ``normalize_toi``).

    Returns the sorted unique list of axis epochs the TOI selects, or
    ``None`` when ``toi`` is None on an ATEMPORAL cube (pass-through so
    the plans layer keeps its TOI-on-atemporal raise for non-None).
    """
    if method not in _METHODS:
        raise ValueError(f"invalid method {method!r}; one of {_METHODS}")
    if time_epochs is None:
        if toi is None:
            return None
        raise ValueError("TOI given but the cube is atemporal (no time axis)")
    epochs = sorted(set(int(e) for e in time_epochs))
    if toi is None:
        return epochs
    if isinstance(toi, slice):
        if toi.step is not None:
            raise ValueError("TOI slices must not carry a step")
        lo = 0 if toi.start is None else bisect_left(epochs, to_epoch(toi.start))
        hi = len(epochs) if toi.stop is None else bisect_right(epochs, to_epoch(toi.stop))
        picked = epochs[lo:hi]
        if not picked:
            raise ValueError(f"Time {toi} not found in temporal extent.")
        return picked
    if isinstance(toi, (list, tuple)):
        items: list[TOIValue] = list(toi)
        if not items:
            raise ValueError("Time [] not found in temporal extent.")
    else:
        items = [toi]
    idxs = sorted({_snap(epochs, to_epoch(t), method) for t in items})
    return [epochs[i] for i in idxs]
