"""Shared-dialect SQL expression generators.

These emit SQL strings valid in BOTH Spark SQL and DuckDB (verified:
``%  CASE  CAST  floor  least/greatest  << & |``). They serve two
roles: (a) the DuckDB oracle for the numpy kernels in
``smart_geocubes_spark.geo`` — the engine computes cells/tiles in Arrow
pandas UDFs, the oracle recomputes them with these expressions, and the
driver's value-hash must agree bit-for-bit; (b) JVM-side fallback
expressions when a query wants to stay inside whole-stage codegen.
"""

from __future__ import annotations


def _spread16(v: str) -> str:
    """Bit-spread of a 16-bit value to even bit positions — SQL version
    of geo.cells._spread_bits16 (same magic-number sequence)."""
    e = f"(({v}) & 65535)"
    e = f"(({e} | ({e} << 8)) & 16711935)"
    e = f"(({e} | ({e} << 4)) & 252645135)"
    e = f"(({e} | ({e} << 2)) & 858993459)"
    return f"(({e} | ({e} << 1)) & 1431655765)"


def morton_cell_sql(lon: str, lat: str, res: int) -> str:
    """Morton cell id at resolution ``res`` from lon/lat degree columns;
    mirrors geo.cells.cell_encode exactly (clamped grid + res<<56 tag)."""
    n = 1 << res
    ix = f"least(greatest(CAST(floor((({lon}) + 180.0) / 360.0 * {n}) AS BIGINT), 0), {n - 1})"
    iy = f"least(greatest(CAST(floor((({lat}) + 90.0) / 180.0 * {n}) AS BIGINT), 0), {n - 1})"
    return (
        f"({_spread16(ix)} | ({_spread16(iy)} << 1) | (CAST({res} AS BIGINT) << 56))"
    )


def pixel_center_sql(
    tile_x: str,
    tile_y: str,
    i: str,
    x0: float,
    y0: float,
    res: float,
    chunk_px: int,
) -> tuple[str, str]:
    """World coords of the CENTER of flat pixel ``i`` inside chunk
    (tile_x, tile_y) — the SQL mirror of ``GeoBox.pixel_center`` over
    the tile-local grid. The integer part is CAST AS DOUBLE before the
    ``+ 0.5`` so neither engine routes the expression through DECIMAL
    arithmetic (CLAUDE.md literal-DECIMAL trap); the ``/ {n}.0`` floor
    form is the proven dual-dialect row split."""
    col = f"(({i}) % {chunk_px})"
    row = f"CAST(floor(({i}) / {chunk_px}.0) AS BIGINT)"
    px = (
        f"({x0!r} + (CAST(({tile_x}) * {chunk_px} + {col} AS DOUBLE) + 0.5)"
        f" * {res!r})"
    )
    py = (
        f"({y0!r} - (CAST(({tile_y}) * {chunk_px} + {row} AS DOUBLE) + 0.5)"
        f" * {res!r})"
    )
    return px, py


def tile_assign_sql(
    lon: str, lat: str, x0: float, y0: float, tile: float, n_tiles_x: int
) -> dict[str, str]:
    """(tile_x, tile_y, tile_id) expressions mirroring TileGrid.xy_to_tile
    / tile_id. Returns dict of SQL strings."""
    tx = f"CAST(floor((({lon}) - {x0!r}) / {tile!r}) AS BIGINT)"
    ty = f"CAST(floor(({y0!r} - ({lat})) / {tile!r}) AS BIGINT)"
    return {"tile_x": tx, "tile_y": ty, "tile_id": f"({ty} * {n_tiles_x} + {tx})"}


# deterministic sampling coin, shared by engine AND oracle sides of the
# stratified / host-quota samplers — ONE definition so the four call
# sites cannot drift. Reduce mod 2^20 BEFORE the Knuth multiply:
# col * 2654435761 overflows int64 (ANSI throws) past col ~3.5e9 —
# exactly the id scale these ops document themselves for
# (2^20 * 2654435761 < 2^63). Caller contract: col is non-negative
# (both engines' % is sign-of-dividend).
KNUTH_COIN_MOD = 4096


def knuth_coin_sql(col: str) -> str:
    return f"(({col} % 1048576) * 2654435761) % {KNUTH_COIN_MOD}"
