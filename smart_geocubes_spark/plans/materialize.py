"""Cube store + idempotent, resumable tile materialization.

Re-expresses the reference's load-and-cache lifecycle
(``docs/how_it_works.md:48-53``; ``core/accessor.py:400-443``):

  candidates (tiles x time x channels intersecting ROI/TOI)
    -> LEFT ANTI JOIN lineage            (cache skip, accessor.py:434-436)
    -> mapInPandas block generation      (download_patch analog)
    -> partitioned parquet append        (chunk-region write, backend.py:263-272)
    -> lineage append = COMMIT           (loaded_patches + icechunk commit,
                                          backends/simple.py:36-38)

Transactional model: each run writes under ``blocks/batch=<id>/`` and
then ``lineage/batch=<id>/``; a batch exists iff its lineage write
completed (Spark's job-level commit + _SUCCESS marker). Readers resolve
the cube as blocks SEMI JOIN lineage, so a job killed mid-write leaves
invisible orphans and the next run redoes exactly the missing chunks —
the same observable semantics as one icechunk commit per patch with
``loaded_patches`` replay (``backends/threaded.py:119-122``), with
Spark's task-commit protocol replacing the hand-built retry machinery.

Scale notes (100 TB cube, 1000 executors):
- blocks are partitioned by ``pt = tile_id % N_PARTS`` (stable bucket,
  bounded partition count) and sorted within files by (tile_id,
  time_idx, channel) -> partition pruning on reads, no small-file blowup
  at high tile counts;
- the lineage side of the anti-join is tiny relative to the data
  (one row per chunk, no payload) and is auto-broadcast;
- block generation is an Arrow ``mapInPandas`` producing whole chunk
  arrays — one task per candidate partition, no Python row loop;
- the kernel emits a per-chunk EVENT row alongside each block
  (chunk_key, partition_id, t_start_us, t_end_us, n_bytes — the
  reference's per-patch event log, ``core/backend.py:23-28,59-93``,
  with Spark partition ids standing in for thread ids); event rows
  live INSIDE the block files (one write job per fill — read_events
  column-prunes them out, lineage-gated like blocks; only compaction
  materializes a separate ``events/`` history copy), and
  :func:`event_durations` is the start/end -> duration merge the
  reference's ``visualize_state`` renders.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from smart_geocubes_spark.geo.geobox import TileGrid

N_PARTS = 64  # stable block-bucket count (tile_id % N_PARTS)

BLOCK_SCHEMA = (
    "tile_y long, tile_x long, tile_id long, time_idx int, channel string, "
    "pt int, batch_id string, block array<double>"
)
LINEAGE_SCHEMA = (
    "chunk_key string, tile_id long, time_idx int, channel string, "
    "batch_id string, partition_id int, n_rows long, n_bytes long, "
    # CONTENT PROVENANCE: the batch that last CHANGED this chunk's
    # pixels. Fills and patches stamp their own id; compaction — a
    # verbatim rewrite — carries the shadowed winner's src_batch
    # through, so CDC (load_changes) can tell "rewritten, same bytes"
    # from "actually new content". Legacy rows read NULL =
    # coalesce(src_batch, batch_id).
    "src_batch string"
)
# per-chunk event rows emitted from inside the block-generation kernel;
# t_start/t_end bound the Arrow batch that produced the chunk (batch
# granularity — the vectorized analog of the reference's per-patch
# start/end actions, core/backend.py:23-28). ``action`` separates the
# reference's two phases (download vs write, backend.py:23-28):
# 'generate' rows are per-chunk kernel windows; 'write' rows are
# per-PARTITION parquet-commit records (file mtime = task write end,
# driver job start = window start) synthesized from driver-side
# metadata — no extra Spark job.
EVENT_SCHEMA = (
    "chunk_key string, tile_id long, time_idx int, channel string, "
    "partition_id int, t_start_us long, t_end_us long, n_bytes long, "
    "batch_id string, action string"
)
# what the kernel yields = block columns + event columns (events are
# split out of the written files by a column-pruned read-back, so the
# kernel runs ONCE)
BLOCK_WRITE_SCHEMA = (
    BLOCK_SCHEMA
    + ", chunk_key string, partition_id int, t_start_us long, t_end_us long, n_bytes long"
)
# ZONE-MAP columns: per-chunk value bounds over the VALID (non-NaN)
# pixels, computed in-plan at write time on the STORED (post-
# quantization) representation — so pruning decisions compare exactly
# what load() will serve back, never the pre-quantization doubles (a
# float32 round at a range boundary would otherwise prune a matching
# chunk). They ride inside the block files like the event columns do
# (one write job; stats reads are column-pruned so the 8 KB+ block
# arrays are never touched), and compaction carries them through.
# Legacy pre-stats files read NULL = "bounds unknown, keep".
STATS_COLS = "v_min double, v_max double, n_valid long"
BLOCK_FILE_SCHEMA = BLOCK_WRITE_SCHEMA + ", " + STATS_COLS

# ---------------------------------------------------------------------------
# per-channel dtypes (reference declares per-channel encodings: float32
# DEM + bool datamask, datasets/arcticdem.py:169-172, uint8 TCTrend
# slopes, datasets/tctrend.py:53-57, applied at core/accessor.py:269-276).
# STORAGE is typed (a bool datamask stored as float64 is 8x the bytes
# and scan bandwidth at 100 TB); the COMPUTE representation stays
# array<double> — load() widens on read with a JVM cast, so every
# downstream operator (zonal/focal/patch merge) is dtype-oblivious.
# Quantization happens at WRITE (cast semantics, ANSI-loud on overflow):
# float32 rounds, int16 truncates toward zero, bool is value != 0,
# uint8 is range-guarded [0,255] in-plan.
# ---------------------------------------------------------------------------
DTYPES = {  # dtype name -> parquet/Spark element type it is stored as
    "float64": "double",
    "float32": "float",
    "int16": "smallint",
    "uint8": "smallint",  # Spark has no unsigned: guarded smallint
    "bool": "boolean",
}
_ELEM_NBYTES = {"double": 8, "float": 4, "smallint": 2, "boolean": 1}


def _dtype_groups(spec: "CubeSpec") -> dict[str, list[str]]:
    """Storage element type -> channels stored with it."""
    out: dict[str, list[str]] = {}
    for ch in spec.channels:
        out.setdefault(DTYPES[spec.channel_dtype(ch)], []).append(ch)
    return out


def _typed_schema(base: str, elem: str) -> str:
    return base.replace("block array<double>", f"block array<{elem}>")


def _to_stored(spec: "CubeSpec", elem: str):
    """double block -> stored element type (JVM codegen, per element)."""
    if elem == "double":
        return F.col("block")
    if elem == "boolean":
        return F.expr("transform(block, x -> x != 0.0D)")
    if elem == "smallint" and any(
        spec.channel_dtype(c) == "uint8" for c in spec.channels
    ):
        # uint8 range guard, in-plan and ANSI-loud (same convention as
        # label_propagation's id-domain guard): smallint would silently
        # admit [-32768, 32767]
        return F.expr(
            "transform(block, x -> CASE WHEN channel IN ("
            + ",".join(
                repr(c) for c in spec.channels if spec.channel_dtype(c) == "uint8"
            )
            + ") AND (x < 0.0D OR x > 255.0D) THEN raise_error(concat("
            "'uint8 channel ', channel, ' value out of [0,255]: ', "
            "CAST(x AS STRING))) ELSE CAST(x AS SMALLINT) END)"
        )
    return F.col("block").cast(f"array<{elem}>")


def _to_double(elem: str):
    """stored element type -> the double compute representation.

    NULL-preserving for EVERY element type (r6 correctness fix,
    advisor item #1): Spark's ``IF`` treats a NULL condition as false,
    so the previous bool widen read stored NULL no-data holes (patch
    borders, partial fills — _to_stored's ``x != 0.0`` correctly keeps
    them NULL) back as 0.0 — patch merges then treated holes as real
    'false' data and chunk stats counted them valid. Float/smallint
    casts already preserve NULL; bool now does too (pinned by
    tests/test_materialize.py::test_bool_channel_holes_stay_null)."""
    if elem == "double":
        return F.col("block")
    if elem == "boolean":
        return F.expr(
            "transform(block, x -> CASE WHEN x IS NULL THEN CAST(NULL AS DOUBLE)"
            " WHEN x THEN 1.0D ELSE 0.0D END)"
        )
    return F.col("block").cast("array<double>")


def _with_chunk_stats(df: DataFrame, elem: str) -> DataFrame:
    """Append the zone-map columns (STATS_COLS) to a block frame whose
    ``block`` column already holds the STORED element type. All-JVM
    codegen: widen -> drop NaN -> array_min/max/size. An all-NaN chunk
    gets (NULL, NULL, 0) — prunable, distinct from the legacy
    (NULL, NULL, NULL) = unknown."""
    wide = F.col("block") if elem == "double" else _to_double(elem)
    return (
        # "no data" is NULL-or-NaN (the kernel emits NaN; Arrow's
        # pandas list conversion turns NaN into null crossing into the
        # JVM) — and Spark's isnan(NULL) is FALSE, so both tests are
        # required or null holes count as valid pixels
        df.withColumn(
            "_valid", F.filter(wide, lambda x: x.isNotNull() & ~F.isnan(x))
        )
        .withColumn("v_min", F.array_min("_valid"))
        .withColumn("v_max", F.array_max("_valid"))
        .withColumn("n_valid", F.size("_valid").cast("long"))
        .drop("_valid")
    )


def _block_leaf_dirs(batch_dirs: list[str]) -> dict[str, list[str]]:
    """Element type -> parquet leaf dirs across batch dirs. A batch
    written by an all-float64 cube keeps its part files at the top
    level (the unchanged fast path and the pre-dtype layout); a typed
    batch holds one ``dt-<elem>`` subdir per storage type."""
    out: dict[str, list[str]] = {}
    for bd in batch_dirs:
        subs = [
            s for s in sorted(os.listdir(bd))
            if s.startswith("dt-")
            and os.path.exists(os.path.join(bd, s, "_SUCCESS"))
        ]
        for s in subs:
            out.setdefault(s[3:], []).append(os.path.join(bd, s))
        if any(f.startswith("part-") for f in os.listdir(bd)):
            out.setdefault("double", []).append(bd)
    return out


@dataclass(frozen=True)
class CubeSpec:
    """Grid + channels + temporal axis — the reference's dataset class
    variables (``core/accessor.py:58-64``) as data."""

    grid: TileGrid
    channels: tuple[str, ...]
    time_epochs: tuple[int, ...] | None  # None => atemporal
    # per-channel dtype names parallel to ``channels`` (reference
    # datasets/arcticdem.py:169-172); None => every channel float64
    dtypes: tuple[str, ...] | None = None

    def __post_init__(self):
        if self.dtypes is not None:
            if len(self.dtypes) != len(self.channels):
                raise ValueError(
                    f"dtypes ({len(self.dtypes)}) must parallel channels "
                    f"({len(self.channels)})"
                )
            unknown = [d for d in self.dtypes if d not in DTYPES]
            if unknown:
                raise ValueError(
                    f"unknown dtypes {unknown}; supported: {sorted(DTYPES)}"
                )

    def channel_dtype(self, channel: str) -> str:
        if self.dtypes is None:
            return "float64"
        return self.dtypes[self.channels.index(channel)]

    def to_json(self) -> dict:
        gb = self.grid.geobox
        return {
            "crs": gb.crs,
            "x0": gb.x0,
            "y0": gb.y0,
            "res": gb.res,
            "width": gb.width,
            "height": gb.height,
            "chunk_px": self.grid.chunk_px,
            "channels": list(self.channels),
            "time_epochs": list(self.time_epochs) if self.time_epochs else None,
            "dtypes": list(self.dtypes) if self.dtypes else None,
        }

    @staticmethod
    def from_json(d: dict) -> "CubeSpec":
        from smart_geocubes_spark.geo.geobox import GeoBox

        gb = GeoBox(
            crs=d["crs"], x0=d["x0"], y0=d["y0"], res=d["res"],
            width=d["width"], height=d["height"],
        )
        return CubeSpec(
            grid=TileGrid(geobox=gb, chunk_px=d["chunk_px"]),
            channels=tuple(d["channels"]),
            time_epochs=tuple(d["time_epochs"]) if d["time_epochs"] else None,
            dtypes=tuple(d["dtypes"]) if d.get("dtypes") else None,
        )


def chunk_value_base(tile_y: np.ndarray, tile_x: np.ndarray, channel_off: np.ndarray) -> np.ndarray:
    """Deterministic block base value (FIXTURES.md §3): closed-form so
    zonal stats have analytic golden values."""
    return tile_y * 1000.0 + tile_x + channel_off


CHANNEL_OFFSETS = {"dem": 0.0, "slope": 500000.0}


def block_base_values(b: pd.DataFrame) -> np.ndarray:
    """Per-chunk base values for an Arrow batch — THE single definition
    of the synthetic block formula. The fill kernel and every zonal
    kernel call this; a second copy is an oracle drift waiting to
    happen."""
    off = b["channel"].map(CHANNEL_OFFSETS).fillna(0.0).to_numpy(dtype=np.float64)
    return chunk_value_base(
        b["tile_y"].to_numpy(dtype=np.float64),
        b["tile_x"].to_numpy(dtype=np.float64),
        off,
    )


def create_cube(path: str, spec: CubeSpec) -> None:
    """DDL: write grid/channel/time metadata + empty layout (reference
    ``create()``, ``core/accessor.py:206-296``). Idempotent-checked like
    its overwrite/exists semantics (``tests/test_creation.py:122-140``)."""
    if os.path.exists(os.path.join(path, "_meta.json")):
        raise FileExistsError(path)
    os.makedirs(os.path.join(path, "blocks"), exist_ok=True)
    os.makedirs(os.path.join(path, "lineage"), exist_ok=True)
    with open(os.path.join(path, "_meta.json"), "w") as f:
        json.dump(spec.to_json(), f)


def open_spec(path: str) -> CubeSpec:
    with open(os.path.join(path, "_meta.json")) as f:
        return CubeSpec.from_json(json.load(f))


def add_channel(path: str, name: str, dtype: str = "float64") -> CubeSpec:
    """SCHEMA EVOLUTION: append a channel to an existing cube — the
    ALTER TABLE ADD COLUMN analog (beyond the reference, whose channel
    set is fixed at create: dataset class vars,
    ``/root/reference/src/smart_geocubes/datasets/arcticdem.py:139``).

    Backfill is LAZY and falls out of the store's own planning: the new
    channel's chunks simply have no lineage rows yet, so the next
    ``fill()``'s anti-join plans exactly the missing (tile × time × new
    channel) cells for whatever ROI is filled — no eager rewrite of any
    existing block, which is the only behavior that survives a 100-TB
    cube. Readers are unaffected: ``load()`` returns committed blocks
    only, so pre-backfill reads see the old channels unchanged, and
    as-of time travel is decided by COMMIT ORDER, not the meta file —
    an as-of view from before the first new-channel fill contains no
    new-channel blocks regardless of the current schema.

    The meta update is a same-directory atomic rename: a concurrent
    reader sees the old or the new channel list, never a torn file.
    (Concurrent add_channel calls are last-writer-wins on the META —
    acceptable for a DDL path; data commits stay ticket-serialized.)"""
    spec = open_spec(path)
    if name in spec.channels:
        raise ValueError(f"channel {name!r} already exists in {path}")
    if dtype not in DTYPES:
        raise ValueError(f"unknown dtype {dtype!r}; supported: {sorted(DTYPES)}")
    if spec.dtypes is None and dtype == "float64":
        new_dtypes = None  # stays the all-double fast path
    else:
        new_dtypes = tuple(spec.channel_dtype(c) for c in spec.channels) + (dtype,)
    new = CubeSpec(
        grid=spec.grid,
        channels=spec.channels + (name,),
        time_epochs=spec.time_epochs,
        dtypes=new_dtypes,
    )
    tmp = os.path.join(path, f"_meta.json.tmp.{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as f:
        json.dump(new.to_json(), f)
    os.replace(tmp, os.path.join(path, "_meta.json"))
    return new


def _lineage_batches(path: str) -> list[str]:
    """Committed batch dirs: _SUCCESS present AND (when the cube has a
    ticket dir) a commit ticket taken. The seq snapshot is read FIRST,
    so a batch ticketing mid-listing is consistently excluded from this
    read and appears atomically on the next one."""
    seqs = _commit_seqs(path)
    ldir = os.path.join(path, "lineage")
    out = []
    for b in sorted(os.listdir(ldir)):
        if not b.startswith("batch="):
            continue
        if not os.path.exists(os.path.join(ldir, b, "_SUCCESS")):
            continue
        if seqs is not None and b.split("=", 1)[1] not in seqs:
            continue  # lineage landed but ticket not yet taken (or crashed)
        out.append(os.path.join(ldir, b))
    return out


def _commits_dir(path: str) -> str:
    return os.path.join(path, "lineage", "_commits")


def _allocate_commit_seq(path: str, batch_id: str) -> int:
    """The COMMIT TICKET: an O_EXCL-created file under lineage/_commits
    whose creation is the batch's atomic commit point — taken AFTER the
    lineage parquet lands, so commit ORDER is completion order, sealed
    the instant a reader can see the batch (a ticket taken before the
    write would let a stalled fill retroactively insert itself under
    already-read snapshots). Order never depends on _SUCCESS mtimes
    (coarse-granularity filesystems and cp/untar/object-store restores
    produce equal or reordered mtimes). A crash between the lineage
    write and the ticket leaves an invisible orphan that the next fill
    redoes and vacuum() reaps.

    First allocation on a pre-ticket cube backfills tickets for its
    existing committed batches in (mtime, batch_id) order — the legacy
    ordering, frozen once. The backfill is ATOMIC: tickets are written
    into a temp dir and os.rename'd into place, so the _commits dir is
    either absent (pure legacy mode) or complete — a crash mid-backfill
    leaves only a temp dir (reaped by vacuum) and the next committer
    redoes it; readers can never observe a partial ticket set that
    would make committed batches invisible."""
    d = _commits_dir(path)
    if not os.path.isdir(d):
        ldir = os.path.join(path, "lineage")
        legacy = sorted(
            (
                (os.path.getmtime(os.path.join(ldir, b, "_SUCCESS")), b.split("=", 1)[1])
                for b in os.listdir(ldir)
                if b.startswith("batch=")
                and os.path.exists(os.path.join(ldir, b, "_SUCCESS"))
                and b.split("=", 1)[1] != batch_id  # the caller gets its own
            ),
        )
        tmp = f"{d}.tmp.{uuid.uuid4().hex}"
        os.makedirs(tmp)
        for _, bid in legacy:
            _take_ticket(tmp, bid)
        try:
            os.rename(tmp, d)  # atomic: all-or-nothing backfill
        except OSError:  # concurrent committer's backfill won the rename
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
    return _take_ticket(d, batch_id)


def _take_ticket(d: str, batch_id: str) -> int:
    seq = 1 + max(
        (int(f.split("=", 1)[0]) for f in os.listdir(d) if "=" in f), default=0
    )
    while True:
        try:
            fd = os.open(
                os.path.join(d, f"{seq:010d}={batch_id}"),
                os.O_CREAT | os.O_EXCL | os.O_WRONLY,
            )
            os.close(fd)
            return seq
        except FileExistsError:  # concurrent committer took this seq
            seq += 1


def _commit_seqs(path: str) -> dict[str, int] | None:
    """batch_id -> seq, or None when the cube predates tickets (pure
    legacy mode: _SUCCESS alone gates visibility, mtime orders)."""
    d = _commits_dir(path)
    if not os.path.isdir(d):
        return None
    out: dict[str, int] = {}
    for f in os.listdir(d):
        if "=" in f:
            s, bid = f.split("=", 1)
            out[bid] = min(int(s), out.get(bid, 1 << 62))
    return out


def _block_batches(path: str) -> list[str]:
    """Committed block batch dirs (_SUCCESS present) — the one listing
    shared by load() and compact()."""
    bdir = os.path.join(path, "blocks")
    return [
        os.path.join(bdir, b)
        for b in sorted(os.listdir(bdir))
        if os.path.exists(os.path.join(bdir, b, "_SUCCESS"))
    ]


def read_lineage(spark: SparkSession, path: str) -> DataFrame:
    """Committed lineage (the ``loaded_patches`` list)."""
    batches = _lineage_batches(path)
    if not batches:
        return spark.createDataFrame([], LINEAGE_SCHEMA)
    return spark.read.schema(LINEAGE_SCHEMA).parquet(*batches)


def read_events(spark: SparkSession, path: str) -> DataFrame:
    """Committed per-patch event log (reference ``core/backend.py:23-28``
    records ``(action, patch_id, time, thread_id, thread_name)`` rows;
    here one row per chunk written, with the Arrow-batch [t_start_us,
    t_end_us] window of its generation and the task partition — the
    thread analog — that produced it). Visibility is LINEAGE-gated: a
    crashed batch's events are invisible, exactly like its blocks.

    Storage: fills do NOT write a separate events copy — the event
    columns live inside the block files (BLOCK_WRITE_SCHEMA) and this
    read is COLUMN-PRUNED (parquet never touches the ``block`` arrays),
    so a fill is one write job, not two (round-3 verdict item #3: the
    read-back + second write halved tiles/sec). Only compaction
    materializes an ``events/batch=`` dir — the carried history of the
    batches it shadows, which read_events prefers over that batch's
    rewritten blocks (whose batch_id column holds the NEW id)."""
    committed = sorted(os.path.basename(b) for b in _lineage_batches(path))
    dirs = []
    write_rows: list[dict] = []
    for b in committed:
        ed = os.path.join(path, "events", b)
        bd = os.path.join(path, "blocks", b)
        if os.path.exists(os.path.join(ed, "_SUCCESS")):
            dirs.append(ed)
        elif os.path.isdir(bd):
            # typed batches keep their parquet under dt-<elem> subdirs;
            # the EVENT_SCHEMA read never touches the block column, so
            # every leaf reads with the one pruned schema regardless of
            # its storage element type
            for ds in _block_leaf_dirs([bd]).values():
                dirs.extend(ds)
        wj = os.path.join(path, "events_write", b, "write.json")
        if os.path.exists(wj):
            with open(wj) as f:
                write_rows.extend(json.load(f))
    if not dirs and not write_rows:
        return spark.createDataFrame([], EVENT_SCHEMA)
    # a compacted batch carries exact COPIES of prior batches' events
    # (history preservation); until vacuum removes the originals both
    # are visible — drop the byte-identical duplicates. Metadata-sized
    # table, so the distinct is cheap. Legacy pre-event-format block
    # files have no event columns (schema read fills NULL): drop them.
    # Block files store no ``action`` column (they ARE the generate
    # rows); compacted history copies store it explicitly.
    parts = []
    if dirs:
        parts.append(
            spark.read.schema(EVENT_SCHEMA)
            .parquet(*dirs)
            .filter(F.col("t_start_us").isNotNull())
            .withColumn("action", F.coalesce(F.col("action"), F.lit("generate")))
        )
    if write_rows:
        wdf = pd.DataFrame(write_rows)
        parts.append(
            spark.createDataFrame(wdf).select(
                F.lit(None).cast("string").alias("chunk_key"),
                F.lit(None).cast("long").alias("tile_id"),
                F.lit(None).cast("int").alias("time_idx"),
                F.lit(None).cast("string").alias("channel"),
                F.col("partition_id").cast("int"),
                F.col("t_start_us").cast("long"),
                F.col("t_end_us").cast("long"),
                F.col("n_bytes").cast("long"),
                F.col("batch_id").cast("string"),
                F.lit("write").alias("action"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out.dropDuplicates()


def _record_write_events(path: str, batch_id: str, block_dir: str, job_start_us: int) -> None:
    """Synthesize per-partition 'write' event rows from the landed part
    files (reference write-phase actions, ``core/backend.py:23-28``):
    the part filename carries the task partition index (matching the
    kernel's gen-row partition_id) and its mtime is the task's parquet
    commit time. Pure driver-side metadata — one dir listing, no Spark
    job (the round-3 verdict killed the read-back job; this keeps the
    phase split without reintroducing it)."""
    import re as _re

    rows = []
    # typed batches keep their part files under dt-<elem> subdirs —
    # walk one level of them alongside the top-level layout. Each
    # subdir is its own write JOB whose part files restart at
    # part-00000, so the subdir index offsets the recorded
    # partition_id (r6 correctness fix, advisor item #4): without it a
    # typed batch emitted multiple 'write' rows sharing a partition_id
    # and event_durations conflated files from different dtype-group
    # jobs into one lane. Top-level (all-double) files keep offset 0 —
    # the gen-lane <-> write-lane pid equality the Gantt tests pin.
    names = [
        (fn, os.path.join(block_dir, fn), 0) for fn in sorted(os.listdir(block_dir))
    ]
    subs = [
        sub for sub, _, _ in list(names)
        if sub.startswith("dt-") and os.path.isdir(os.path.join(block_dir, sub))
    ]
    names += [
        (fn, os.path.join(block_dir, sub, fn), (si + 1) * 100000)
        for si, sub in enumerate(sorted(subs))
        for fn in sorted(os.listdir(os.path.join(block_dir, sub)))
    ]
    for fn, fp, pid_off in names:
        # strict part-file shape: a naming variant must not abort the
        # fill after the blocks already landed
        m = _re.match(r"part-(\d+)-", fn)
        if m is None:
            continue
        st = os.stat(fp)
        rows.append(
            {
                "partition_id": int(m.group(1)) + pid_off,
                "t_start_us": int(job_start_us),
                # clamp: file mtime comes from the filesystem clock; on
                # NFS/VM drift it can lag the driver clock — a telemetry
                # row must never report a negative window
                "t_end_us": max(st.st_mtime_ns // 1000, int(job_start_us)),
                "n_bytes": int(st.st_size),
                "batch_id": batch_id,
            }
        )
    d = os.path.join(path, "events_write", f"batch={batch_id}")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "write.json"), "w") as f:
        json.dump(rows, f)


def event_durations(spark: SparkSession, path: str) -> DataFrame:
    """Start/end -> duration merge over the event log (the data half of
    the reference's ``visualize_state`` Gantt, ``core/backend.py:59-93``):
    one row per (batch, partition, action) with its chunk/byte totals
    and the wall window it was busy — 'generate' lanes from the kernel
    windows, 'write' lanes from the parquet-commit records."""
    ev = read_events(spark, path)
    return (
        ev.groupBy("batch_id", "partition_id", "action")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum("n_bytes").alias("n_bytes"),
            F.min("t_start_us").alias("t_start_us"),
            F.max("t_end_us").alias("t_end_us"),
        )
        .withColumn("duration_us", F.col("t_end_us") - F.col("t_start_us"))
    )


def _roi_items(roi) -> tuple[list, bool]:
    """Normalize the engine's ROI argument (reference ``load()``
    accepts ``Geometry | GeoBox | GeoDataFrame``,
    ``core/accessor.py:331-358``). Accepted spellings:

    - 4-float tuple — a bbox (minx, miny, maxx, maxy);
    - WKT ``POLYGON ((x y, ...))`` string, or a sequence of (x, y)
      vertex pairs — a single-ring polygon;
    - a LIST of any of the above — the GeoDataFrame batch branch.

    Returns (items, is_batch). A list whose elements are all (x, y)
    pairs is ONE polygon, not a batch of 2-float rois (a bbox is
    4 floats, so the shapes cannot collide)."""
    if isinstance(roi, list):
        if roi and all(
            isinstance(e, (tuple, list))
            and len(e) == 2
            and all(isinstance(v, (int, float)) for v in e)
            for e in roi
        ):
            return [roi], False
        return roi, True
    return [roi], False


def _item_tiles(grid: TileGrid, item) -> np.ndarray:
    """One ROI item -> (n, 2) tile array. Polygon items refine the
    bbox candidates with the exact rect x polygon test driver-side
    (the tile set is metadata-sized; ``geo/pip.py`` kernel)."""
    if (
        isinstance(item, tuple)
        and len(item) == 4
        and all(isinstance(v, (int, float)) for v in item)
    ):
        return grid.tiles_overlapping_bbox(*item)
    from smart_geocubes_spark.geo.pip import parse_polygon

    px, py = parse_polygon(item)
    return grid.tiles_overlapping_polygon(px, py)


def candidate_chunks(
    spark: SparkSession,
    spec: CubeSpec,
    roi_bbox,
    toi_epochs: list[int] | None = None,
) -> DataFrame:
    """Tile-coverage enumeration x TOI x channels (reference
    ``adjacent_patches``: grid tiles intersecting ROI,
    ``accessors/gee.py:109-112``; temporal cross product
    ``accessors/gee.py:128-143``).

    ``roi_bbox`` takes every :func:`_roi_items` spelling — bbox,
    polygon (WKT or vertex pairs), or a list of them (the reference's
    GeoDataFrame branch, ``core/accessor.py:400-426``): tile sets are
    unioned and deduped, so one fill covers them all. A concave
    polygon fills strictly fewer chunks than its bbox."""
    if toi_epochs is not None and spec.time_epochs is None:
        # shared-layer guard (reference assert_temporal_cube): every
        # entry point — fill, load, read_snapshot — must reject a TOI
        # on an atemporal cube rather than silently ignore it
        raise ValueError("TOI given for an atemporal cube")
    rois, _ = _roi_items(roi_bbox)
    tile_arrays = [_item_tiles(spec.grid, r) for r in rois]
    tiles = np.unique(np.concatenate([t for t in tile_arrays if len(t)] or
                                     [np.empty((0, 2), dtype=np.int64)]), axis=0)
    if len(tiles) == 0:
        raise ValueError("ROI does not intersect the cube extent")
    nx = spec.grid.n_tiles_x
    tdf = spark.createDataFrame(
        pd.DataFrame({"tile_x": tiles[:, 0], "tile_y": tiles[:, 1]})
    ).withColumn("tile_id", F.col("tile_y") * F.lit(nx) + F.col("tile_x"))
    if spec.time_epochs is None:
        tdf = tdf.withColumn("time_idx", F.lit(-1).cast("int"))
    else:
        sel = toi_epochs if toi_epochs is not None else list(spec.time_epochs)
        idxs = [list(spec.time_epochs).index(t) for t in sel]
        # BROADCAST the time axis like the channel crossJoin below: a
        # bare crossJoin of two driver-created frames is a
        # CartesianProduct whose partition count is the PRODUCT of the
        # sides' (32 x 32 = 1024 tasks for ~100 plan rows — measured
        # r6: the downstream localCheckpoint took 13-15 s of pure task
        # scheduling vs ~1 s for the atemporal path; guide §2.4
        # "Exchange/partition shapes you did not expect")
        tdf = tdf.crossJoin(
            F.broadcast(
                spark.createDataFrame(
                    pd.DataFrame({"time_idx": np.array(idxs, dtype=np.int32)})
                )
                # pandas->Spark conversion widens int32 to LONG; without
                # this cast temporal lineage parquet lands INT64 under a
                # LINEAGE_SCHEMA that declares int — latent until a reader
                # actually materializes the column (every anti-join/count
                # path prunes it), then FAILED_READ_FILE on the scan
                .withColumn("time_idx", F.col("time_idx").cast("int"))
            )
        )
    ch = spark.createDataFrame(pd.DataFrame({"channel": list(spec.channels)}))
    out = tdf.crossJoin(F.broadcast(ch))
    return out.withColumn(
        "chunk_key",
        F.concat_ws("-", F.col("time_idx"), F.col("tile_y"), F.col("tile_x"), F.col("channel")),
    )


def plan_missing(candidates: DataFrame, lineage: DataFrame) -> DataFrame:
    """The cache-skip anti-join (reference ``core/accessor.py:434-436``)."""
    return candidates.join(lineage.select("chunk_key"), "chunk_key", "left_anti")


def _gen_blocks_factory(
    chunk_px: int,
    patch: tuple[float, float, float, tuple[float, float, float, float], float] | None = None,
):
    """ONE block-generation kernel for BOTH fill shapes (a second copy
    of the value formula or the embedded event columns would silently
    diverge — same single-definition rule as block_base_values).

    ``patch=None``: full-coverage fill (every pixel generated).
    ``patch=(x0, y0, res, bbox, value_offset)``: partial-coverage
    source — values offset by ``value_offset`` and NaN outside ``bbox``
    (the reference's nan-bordered STAC downloads,
    ``core/backend.py:265-267``). A pixel belongs to the patch iff its
    CENTER lies inside (x half-open [minx, maxx), y half-open
    (miny, maxy] — the grid's own top-left convention)."""
    n_px = chunk_px * chunk_px

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = int(ctx.partitionId()) if ctx is not None else -1
        ramp = np.arange(n_px, dtype=np.float64) * 0.5
        if patch is not None:
            x0, y0, res, bbox, value_offset = patch
            pminx, pminy, pmaxx, pmaxy = (float(v) for v in bbox)
            rows_i = np.arange(n_px, dtype=np.float64) // chunk_px
            cols_i = np.arange(n_px, dtype=np.float64) % chunk_px
        for b in batches:
            t0 = time.time_ns() // 1000
            base = block_base_values(b)
            # time shift so temporal chunks differ per step
            base = base + np.where(b["time_idx"].to_numpy() >= 0, b["time_idx"].to_numpy() * 10.0, 0.0)
            blocks = base[:, None] + ramp[None, :]
            if patch is not None:
                tx = b["tile_x"].to_numpy(dtype=np.float64)
                ty = b["tile_y"].to_numpy(dtype=np.float64)
                cx = x0 + (tx[:, None] * chunk_px + cols_i[None, :] + 0.5) * res
                cy = y0 - (ty[:, None] * chunk_px + rows_i[None, :] + 0.5) * res
                inside = (cx >= pminx) & (cx < pmaxx) & (cy > pminy) & (cy <= pmaxy)
                blocks = np.where(inside, blocks + value_offset, np.nan)
            out = b[["tile_y", "tile_x", "tile_id", "time_idx", "channel", "batch_id"]].copy()
            out["pt"] = (b["tile_id"] % N_PARTS).astype("int32")
            out["block"] = list(blocks)
            # event columns: the download/write record of this chunk
            out["chunk_key"] = b["chunk_key"].to_numpy()
            out["partition_id"] = np.int32(pid)
            out["t_start_us"] = np.int64(t0)
            out["t_end_us"] = np.int64(time.time_ns() // 1000)
            out["n_bytes"] = np.int64(8 * n_px)
            yield out

    return gen


def _write_blocks(
    spec: CubeSpec,
    plan_df: DataFrame,
    block_dir: str,
    make_blocks,
    present_channels: set[str] | None = None,
) -> None:
    """Write a fill/patch's blocks, grouped by storage dtype.

    ``make_blocks(plan_subset) -> BLOCK_WRITE_SCHEMA frame`` (double
    blocks, straight from the kernel or the patch-merge pipeline).
    All-float64 cubes take the single top-level write (the pre-dtype
    layout, byte-identical fast path); typed cubes write one
    ``dt-<elem>`` subdir per storage group. Channel filtering happens
    on the PLAN rows — BEFORE the kernel (a filter above mapInPandas
    cannot be pushed through it, so filtering blocks after generation
    would run the kernel once per group over ALL chunks).

    ``present_channels``: the channels the plan actually contains
    (callers already know it from the per-channel plan count) — groups
    with no planned chunks are skipped entirely, so a lazy backfill of
    one evolved channel costs one write job, not one per dtype group."""
    groups = _dtype_groups(spec)
    if present_channels is not None:
        groups = {
            e: kept
            for e, chans in groups.items()
            if (kept := [c for c in chans if c in present_channels])
        }
    if set(groups) == {"double"} and spec.dtypes is None:
        _with_chunk_stats(make_blocks(plan_df), "double").write.mode(
            "overwrite"
        ).parquet(block_dir)
        return

    def _write_group(item: tuple[str, list[str]]) -> None:
        elem, chans = item
        sub = make_blocks(plan_df.filter(F.col("channel").isin(chans)))
        sub = sub.withColumn("block", _to_stored(spec, elem))
        sub = _with_chunk_stats(sub, elem)
        sub.write.mode("overwrite").parquet(os.path.join(block_dir, f"dt-{elem}"))

    items = sorted(groups.items())
    if len(items) == 1:
        _write_group(items[0])
    else:
        # the dtype-group writes are INDEPENDENT jobs on disjoint plan
        # slices into disjoint subdirs: submit them concurrently so the
        # later groups' tasks back-fill the earlier groups' stragglers
        # (guide §2.6 "overlap independent jobs") instead of paying one
        # full job latency per storage type — measured r6: a 3-dtype
        # fill's write phase ~3x job latency -> ~1x. The _SUCCESS
        # marker below still lands only after EVERY group committed.
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(3, len(items))) as pool:
            list(pool.map(_write_group, items))
    # batch-level commit marker: _block_batches requires it, and the
    # per-subdir _SUCCESS files alone would leave the batch invisible
    open(os.path.join(block_dir, "_SUCCESS"), "w").close()


def _lineage_nbytes(spec: CubeSpec, n_px: int):
    """Per-channel stored-bytes column: typed channels are the whole
    point of the dtype system at 100 TB, so lineage accounting must not
    keep claiming 8 bytes/px for a bool channel."""
    if spec.dtypes is None:
        return F.lit(8 * n_px).cast("long")
    expr = F.lit(8 * n_px)
    for elem, chans in _dtype_groups(spec).items():
        expr = F.when(
            F.col("channel").isin(chans), F.lit(_ELEM_NBYTES[elem] * n_px)
        ).otherwise(expr)
    return expr.cast("long")


def materialize(
    spark: SparkSession,
    path: str,
    roi_bbox,  # bbox | polygon (WKT / vertex pairs) | list of those
    toi_epochs: list[int] | None = None,
    fail_after_blocks: bool = False,
) -> dict:
    """One idempotent cache-fill run (procedural_download analog).

    Returns summary dict. ``fail_after_blocks`` simulates a crash
    between the block write and the lineage commit (for resume tests —
    the reference's kill-safety comes from icechunk commits; ours from
    lineage-gated visibility)."""
    spec = open_spec(path)
    batch_id = uuid.uuid4().hex[:12]
    # the "0"-prefixed batch-id namespace is RESERVED for compaction
    # (winner = min(batch_id), so compacted batches must sort first)
    while batch_id.startswith("0"):
        batch_id = uuid.uuid4().hex[:12]
    t0 = time.time()

    candidates = candidate_chunks(spark, spec, roi_bbox, toi_epochs)
    lineage = read_lineage(spark, path)
    missing = plan_missing(candidates, lineage)
    # one shuffle to co-locate chunks of the same block bucket, so each
    # output partition maps to one stable pt bucket
    missing = missing.withColumn("pt", (F.col("tile_id") % N_PARTS).cast("int")).withColumn(
        "batch_id", F.lit(batch_id)
    )
    # the anti-join plan feeds three actions (count, block write,
    # lineage write): bucket once, sort within partitions so the
    # written files' row-group min/max stats on (tile_id, time_idx,
    # channel) are tight (the pruning the module docstring promises —
    # sorting the PLAN rows is cheap; the kernel preserves row order
    # so the block rows land sorted too), then localCheckpoint.
    # EXPLICIT partition count: a bare repartition(col) is an AQE
    # coalesce target — at bench scale the plan rows are a few KB and
    # AQE folds them into ONE partition, serializing the whole fill
    # kernel + write behind a single task (measured: 2x tiles/sec).
    # N_PARTS pins the bucket layout the module docstring promises
    # (CLAUDE.md rule: 2+ consumers -> checkpoint, never cache whose
    # evicted partitions silently recompute the anti-join per action)
    missing = (
        missing.repartition(N_PARTS, F.col("pt"))
        .sortWithinPartitions("tile_id", "time_idx", "channel")
        .localCheckpoint(eager=True)
    )
    # per-channel counts in ONE job (replaces the plain count): the
    # total gates the all-cached return, the channel set lets
    # _write_blocks skip dtype groups with no planned chunks (a lazy
    # backfill of one evolved channel = one write job, not one per
    # dtype group)
    ch_counts = {r["channel"]: r["n"] for r in
                 missing.groupBy("channel").agg(F.count("*").alias("n")).collect()}
    n_missing = sum(ch_counts.values())
    if n_missing == 0:
        # nothing committed under this id — returning it would hand
        # the caller a batch_id that snapshots()/as_of reject
        return {
            "batch_id": None, "written": 0, "skipped": "all cached",
            "sec": time.time() - t0,
        }

    block_dir = os.path.join(path, "blocks", f"batch={batch_id}")
    t_write0 = time.time_ns() // 1000
    _write_blocks(
        spec,
        missing,
        block_dir,
        lambda part: part.mapInPandas(
            _gen_blocks_factory(spec.grid.chunk_px), schema=BLOCK_WRITE_SCHEMA
        ),
        present_channels=set(ch_counts),
    )
    # the per-chunk 'generate' event rows STAY inside the block files
    # (read_events column-prunes them out); the per-partition 'write'
    # rows come from the landed part files' metadata — no second events
    # write job per fill
    _record_write_events(path, batch_id, block_dir, t_write0)

    if fail_after_blocks:
        raise RuntimeError("simulated crash before lineage commit")

    # lineage rows from the SAME pt-bucketed partitions the blocks
    # were written from, so partition_id names the block write
    # partition (per-partition lineage contract) — the COMMIT.
    n_px = spec.grid.chunk_px * spec.grid.chunk_px
    lin = (
        missing.withColumn("partition_id", F.spark_partition_id())
        .withColumn("n_rows", F.lit(1).cast("long"))
        .withColumn("n_bytes", _lineage_nbytes(spec, n_px))
        .withColumn("src_batch", F.col("batch_id"))
        .select(
            "chunk_key", "tile_id", "time_idx", "channel",
            "batch_id", "partition_id", "n_rows", "n_bytes", "src_batch",
        )
    )
    lin_dir = os.path.join(path, "lineage", f"batch={batch_id}")
    lin.write.mode("overwrite").parquet(lin_dir)
    _allocate_commit_seq(path, batch_id)  # THE commit point (atomic ticket)

    # per-run metrics (event-log analog, core/backend.py:23-28)
    metrics = {
        "batch_id": batch_id,
        "written": int(n_missing),
        "sec": time.time() - t0,
    }
    mdir = os.path.join(path, "metrics")
    os.makedirs(mdir, exist_ok=True)
    with open(os.path.join(mdir, f"{batch_id}.json"), "w") as f:
        json.dump(metrics, f)
    return metrics


def materialize_patch(
    spark: SparkSession,
    path: str,
    patch_bbox: tuple[float, float, float, float],
    patch_id: str,
    toi_epochs: list[int] | None = None,
    value_offset: float = 0.0,
) -> dict:
    """MERGE-ON-WRITE fill for a patch that may only PARTIALLY cover
    its chunks (reference ``core/backend.py:263-272``: NaN borders in
    downloaded patches are replaced with existing cube data before the
    write, so overlapping patches preserve each other's pixels).

    Mechanism: the patch's chunks are regenerated with NaN outside the
    patch footprint, NaN-coalesced against the currently VISIBLE block
    content (new data wins where it has data — exactly the reference's
    ``data[mask] = existing`` then write), and committed as a
    SHADOW-NAMESPACE batch (same reserved "0"-prefixed id space as
    compaction): under the unchanged read rule (min batch_id per chunk
    wins) the merged rewrite shadows prior content the instant its
    lineage commits, while every pre-merge snapshot keeps resolving to
    the old blocks (time travel unchanged — the merge commits LAST in
    seq order). Patch identity is tracked in ``patches/<id>.json``
    (the reference's ``loaded_patches`` ids): re-applying is a no-op.

    Contract: like compaction, this is a read-modify-write of visible
    state — run ONE patch/maintenance actor at a time (the reference
    serializes through icechunk conflict retries; racing a concurrent
    fill here could shadow its chunks with a merge that predates them).
    Idempotent under crash: an interrupted run leaves an invisible
    orphan batch; re-running merges identically.

    COVERAGE SEMANTICS (mirrors the reference, and worth saying out
    loud): a patch commits its chunks to lineage, so ``materialize()``
    treats them as cached and will NOT regenerate the uncovered pixels
    — a partially-covered chunk keeps its NULL holes until ANOTHER
    patch covers them (the reference behaves identically: a chunk
    touched by a nan-bordered download stays nan outside every patch
    ever applied; ``procedural_download`` skips it once its patch ids
    are in ``loaded_patches``). Do not mix fill() and fill_patch()
    expecting fill() to repair patch holes."""
    spec = open_spec(path)
    os.makedirs(os.path.join(path, "patches"), exist_ok=True)
    marker = os.path.join(path, "patches", f"{patch_id}.json")
    if os.path.exists(marker):
        return {"batch_id": None, "written": 0, "skipped": "patch already applied", "sec": 0.0}
    t0 = time.time()
    batch_id = _compact_id(path)

    cand = candidate_chunks(spark, spec, patch_bbox, toi_epochs)
    cand = (
        cand.withColumn("pt", (F.col("tile_id") % N_PARTS).cast("int"))
        .withColumn("batch_id", F.lit(batch_id))
        .repartition(N_PARTS, F.col("pt"))
        .sortWithinPartitions("tile_id", "time_idx", "channel")
        .localCheckpoint(eager=True)  # feeds kernel + lineage + count
    )
    ch_counts = {r["channel"]: r["n"] for r in
                 cand.groupBy("channel").agg(F.count("*").alias("n")).collect()}
    n_chunks = sum(ch_counts.values())
    gb = spec.grid.geobox
    # currently-visible content of exactly these chunks (winner rows,
    # patch-bounded — the same pruned scan load() serves readers);
    # loaded as double regardless of storage dtype, so the merge is
    # dtype-oblivious and re-quantization happens once at the write
    existing = load(spark, path, patch_bbox, toi_epochs).select(
        "chunk_key", F.col("block").alias("old_block")
    )

    def _merged(plan_part: DataFrame) -> DataFrame:
        new_blocks = plan_part.mapInPandas(
            _gen_blocks_factory(
                spec.grid.chunk_px,
                patch=(gb.x0, gb.y0, gb.res, patch_bbox, value_offset),
            ),
            schema=BLOCK_WRITE_SCHEMA,
        )
        # "no data" is NULL-or-NaN: the kernel emits NaN, but Arrow's
        # pandas list conversion maps NaN to null on the way into the
        # JVM, so stored partial blocks carry NULL holes — coalesce
        # either form
        return (
            new_blocks.join(existing, "chunk_key", "left")
            .withColumn(
                "block",
                F.when(F.col("old_block").isNull(), F.col("block")).otherwise(
                    F.zip_with(
                        "block",
                        "old_block",
                        lambda n, o: F.when(n.isNull() | F.isnan(n), o).otherwise(n),
                    )
                ),
            )
            .drop("old_block")
            .select(*[f.split()[0] for f in BLOCK_WRITE_SCHEMA.split(", ")])
            # advisory repartition (no pinned count): these rows carry
            # the ~80 KB block arrays, so AQE sizes the write sensibly —
            # a tiny patch lands 1-2 part files instead of N_PARTS
            # near-empty ones (the kernel-feeding frame above IS pinned:
            # its rows are KB-sized plan rows AQE would fold into one
            # serial task)
            .repartition(F.col("pt"))
            .sortWithinPartitions("tile_id", "time_idx", "channel")
        )

    patch_block_dir = os.path.join(path, "blocks", f"batch={batch_id}")
    t_write0 = time.time_ns() // 1000
    _write_blocks(spec, cand, patch_block_dir, _merged, present_channels=set(ch_counts))
    _record_write_events(path, batch_id, patch_block_dir, t_write0)

    n_px = spec.grid.chunk_px * spec.grid.chunk_px
    lin = (
        cand.withColumn("partition_id", F.spark_partition_id())
        .withColumn("n_rows", F.lit(1).cast("long"))
        .withColumn("n_bytes", _lineage_nbytes(spec, n_px))
        .withColumn("src_batch", F.col("batch_id"))
        .select(
            "chunk_key", "tile_id", "time_idx", "channel",
            "batch_id", "partition_id", "n_rows", "n_bytes", "src_batch",
        )
    )
    lin.write.mode("overwrite").parquet(os.path.join(path, "lineage", f"batch={batch_id}"))
    _allocate_commit_seq(path, batch_id)  # THE commit point

    metrics = {
        "batch_id": batch_id,
        "written": int(n_chunks),
        "patch_id": patch_id,
        "sec": time.time() - t0,
    }
    with open(marker, "w") as f:
        json.dump({"patch_id": patch_id, "batch_id": batch_id, "bbox": list(patch_bbox)}, f)
    mdir = os.path.join(path, "metrics")
    os.makedirs(mdir, exist_ok=True)
    with open(os.path.join(mdir, f"{batch_id}.json"), "w") as f:
        json.dump(metrics, f)
    return metrics


def snapshots(path: str) -> list[dict]:
    """Committed snapshots in COMMIT order (the icechunk commit-log
    analog: every fill or compaction commit is a readable version).
    Each entry: {batch_id, seq, committed_at}. Order comes from the
    atomic commit counter (_allocate_commit_seq) — NEVER from mtimes,
    which coarse filesystems and cp/untar restores make equal or
    non-monotonic; mtime ordering survives only as the fallback for
    pre-counter cubes (and then for the whole list, consistently).
    Vacuum sets the retention horizon: it physically drops shadowed
    batches, so time travel reaches only as far back as the last
    vacuum left intact."""
    seqs = _commit_seqs(path) or {}
    out = []
    for b in _lineage_batches(path):
        bid = os.path.basename(b).split("=", 1)[1]
        out.append(
            {
                "batch_id": bid,
                "seq": seqs.get(bid),
                "committed_at": os.path.getmtime(os.path.join(b, "_SUCCESS")),
            }
        )
    if seqs:  # every committed batch has a ticket by construction
        out.sort(key=lambda r: r["seq"])
    else:  # pre-ticket cube: legacy mtime order for the WHOLE list
        out.sort(key=lambda r: (r["committed_at"], r["batch_id"]))
    return out


def load(
    spark: SparkSession,
    path: str,
    roi_bbox,  # bbox | polygon (WKT / vertex pairs) | list of those
    toi_epochs: list[int] | None = None,
    as_of_batch: str | None = None,
    channels: list[str] | None = None,
    value_range: tuple[float, float] | None = None,
    stats_only: bool = False,
) -> DataFrame:
    """ROI read: materialize() first for the reference's full load()
    semantics; this is the scan+crop step (snapshot = committed lineage
    only). Partition pruning: blocks are filtered on tile_id membership
    (small set -> pushed to parquet row groups).

    ``value_range=(lo, hi)``: ZONE-MAP pruning — a metadata pass reads
    only the per-chunk (v_min, v_max, n_valid) columns (the block
    arrays are never touched; parquet column pruning) and drops every
    chunk whose stored bounds cannot intersect [lo, hi]. The surviving
    set then narrows BOTH the pushed tile_id IN list and the winner
    broadcast, so pruned chunks cost neither scan I/O nor join rows.
    Chunk-granular and conservative: surviving blocks still contain all
    their pixels (exact per-pixel filtering is the caller's); legacy
    pre-stats files carry NULL bounds = "unknown" and are always kept.
    The survivor collect is bounded by the ROI chunk count — the same
    cardinality load() already broadcasts as its winner set.

    ``stats_only=True``: return the zone-map manifest itself (one row
    per visible chunk with its bounds) instead of block rows.

    ``channels``: band projection (P4, reference ``load(..., bands)``
    slicing) — the IN filter is pushed to BOTH parquet scans (blocks
    and lineage), so a 1-of-64-channel read scans and winner-ranks
    1/64th of the ROI's rows, not all of them. Unknown names raise
    (silently returning nothing would read as "not filled yet").

    ``roi_bbox`` may be a LIST of bboxes (the reference's GeoDataFrame
    batch branch, ``core/accessor.py:400-426``): ONE pruned scan over
    the union tile set, with a ``roi_idx`` column mapping each block
    back to the requesting ROI(s) via a broadcast (tile_id, roi_idx)
    lookup — a tile covered by k ROIs returns k rows, one per ROI, so
    per-ROI consumers just filter. The lookup is bounded by the query
    size (sum of ROI tile counts), never by the cube.

    ``as_of_batch``: TIME TRAVEL (icechunk snapshot read) — resolve
    visibility against only the batches committed at-or-before that
    batch's commit, i.e. the cube exactly as a reader saw it then.
    Composes with compaction (a compacted batch commits LAST even
    though its id sorts first, so historical as-of views are
    unchanged); vacuum bounds how far back travel reaches."""
    spec = open_spec(path)
    if toi_epochs is not None and spec.time_epochs is None:
        raise ValueError("TOI given for an atemporal cube")
    if channels is not None:
        if not channels:
            # an explicitly EMPTY projection is a caller bug — silently
            # returning 0 rows would read as "not filled yet", the very
            # trap the unknown-name check below exists to prevent
            raise ValueError("channels=[] — pass None to read every channel")
        unknown = [c for c in channels if c not in spec.channels]
        if unknown:
            raise ValueError(
                f"unknown channels {unknown}; cube has {list(spec.channels)}"
            )
    allowed: set[str] | None = None
    if as_of_batch is not None:
        ids = [s["batch_id"] for s in snapshots(path)]
        if as_of_batch not in ids:
            raise ValueError(f"unknown snapshot {as_of_batch!r}; committed: {ids}")
        # PREFIX of the commit order, inclusive — deterministic even if
        # a legacy-ordered list carries mtime ties
        allowed = set(ids[: ids.index(as_of_batch) + 1])
    nx = spec.grid.n_tiles_x
    items, is_batch = _roi_items(roi_bbox)
    if not is_batch:
        tiles = _item_tiles(spec.grid, items[0])
        tile_ids = [int(ty * nx + tx) for tx, ty in tiles]
        roi_pairs = None
    else:
        roi_pairs = [
            (int(ty * nx + tx), i)
            for i, r in enumerate(items)
            for tx, ty in _item_tiles(spec.grid, r)
        ]
        tile_ids = sorted({t for t, _ in roi_pairs})
    if not tile_ids:
        # same guard the write path (candidate_chunks) applies: an
        # out-of-extent bbox (typo'd / lon-lat swapped) must not read
        # as "nothing committed here" — that silence hides the error
        raise ValueError("ROI does not intersect the cube extent")
    batches = _block_batches(path)
    if allowed is not None:
        batches = [
            b for b in batches if os.path.basename(b).split("=", 1)[1] in allowed
        ]

    def _with_roi_idx(out: DataFrame) -> DataFrame:
        if roi_pairs is None:
            return out
        mapdf = spark.createDataFrame(
            pd.DataFrame(roi_pairs, columns=["tile_id", "roi_idx"]).astype(
                {"tile_id": "int64", "roi_idx": "int32"}
            )
        )
        return out.join(F.broadcast(mapdf), "tile_id")

    if not batches:
        # match the populated path's exact schema/order (semi-join keys
        # hoisted first: chunk_key, batch_id, then block columns)
        cols = ["chunk_key", "batch_id"] + [
            f.split()[0] for f in BLOCK_SCHEMA.split(", ") if f.split()[0] != "batch_id"
        ]
        return _with_roi_idx(
            spark.createDataFrame([], BLOCK_SCHEMA + ", chunk_key string").select(*cols)
        )
    # per-dtype leaf scan: typed batches store one dt-<elem> subdir per
    # storage group; each scan reads its own typed schema and widens to
    # the array<double> compute representation with a JVM cast, then
    # the groups union (filters below push through the union into every
    # scan). All-float64 cubes hit exactly one scan — the pre-dtype plan.
    leafs = _block_leaf_dirs(batches)
    if channels is not None:
        # dtype-GROUP pruning: a channel projection maps to the storage
        # groups that hold those channels; every other dt-<elem> leaf is
        # dropped from the plan entirely — no file listing, no scan, no
        # per-leaf winner subplan. (Safe with mixed layouts: a flat
        # pre-dtype batch only ever holds float64 channels, and those
        # map to the "double" group.)
        wanted = {DTYPES[spec.channel_dtype(c)] for c in channels}
        leafs = {e: dirs for e, dirs in leafs.items() if e in wanted}

    def _empty_blocks() -> DataFrame:
        cols = ["chunk_key", "batch_id"] + [
            f.split()[0] for f in BLOCK_SCHEMA.split(", ") if f.split()[0] != "batch_id"
        ]
        return _with_roi_idx(
            spark.createDataFrame([], BLOCK_SCHEMA + ", chunk_key string").select(*cols)
        )

    if not leafs:  # committed dirs with no data files: same as no batches
        return _empty_blocks()
    # visibility: a block row is visible iff a committed lineage row
    # names BOTH its chunk_key AND its batch_id — orphan blocks from a
    # crashed batch never match even when a later batch re-wrote the
    # same chunk (icechunk-commit visibility semantics). CONCURRENT
    # fills may both commit the same chunk (both planned against the
    # pre-commit lineage — the reference resolves this with icechunk
    # conflict retries, backends/threaded.py:85-99); we resolve it at
    # read: exactly one winning batch per chunk_key (min batch_id,
    # deterministic; block content is deterministic so any winner is
    # correct).
    from pyspark.sql import Window

    # Prune lineage to the ROI's tile set BEFORE winner ranking: the
    # full winner list is one row per chunk of the whole cube (~10^8-9
    # chunks at 100 TB) and force-broadcasting that would OOM; the
    # ROI-pruned set is bounded by the query size, so the broadcast is
    # safe. The tile_id IN filter is pushed to the lineage parquet scan.
    lineage = read_lineage(spark, path).filter(F.col("tile_id").isin(tile_ids))
    if channels is not None:
        lineage = lineage.filter(F.col("channel").isin(list(channels)))
    if allowed is not None:
        lineage = lineage.filter(F.col("batch_id").isin(sorted(allowed)))
    lineage = lineage.select("chunk_key", "batch_id").distinct()
    w = Window.partitionBy("chunk_key").orderBy(F.col("batch_id").asc())
    winners = (
        lineage.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")
    )

    if stats_only or value_range is not None:
        if value_range is not None:
            # winners feeds the survivor ACTION below and then the block
            # scan's semi-join — 2 consumers -> eager checkpoint
            # (CLAUDE.md rule: never let the lineage window recompute)
            winners = winners.localCheckpoint(eager=True)
        stats_schema = (
            "tile_y long, tile_x long, tile_id long, time_idx int, "
            "channel string, pt int, batch_id string, " + STATS_COLS
        )
        # one pruned scan over every leaf dir: the stats schema is
        # element-type-independent, so no per-dtype union is needed and
        # the block column never appears in the plan
        sdf = spark.read.schema(stats_schema).parquet(
            *[d for ds in leafs.values() for d in sorted(ds)]
        )
        sdf = sdf.filter(F.col("tile_id").isin(tile_ids))
        if channels is not None:
            sdf = sdf.filter(F.col("channel").isin(list(channels)))
        if toi_epochs is not None and spec.time_epochs is not None:
            idxs = [list(spec.time_epochs).index(t) for t in toi_epochs]
            sdf = sdf.filter(F.col("time_idx").isin(idxs))
        sdf = sdf.withColumn(
            "chunk_key",
            F.concat_ws(
                "-", F.col("time_idx"), F.col("tile_y"), F.col("tile_x"), F.col("channel")
            ),
        ).join(F.broadcast(winners), ["chunk_key", "batch_id"], "left_semi")
        if stats_only:
            return _with_roi_idx(sdf)
        lo, hi = (float(value_range[0]), float(value_range[1]))
        surv = (
            sdf.filter(
                (F.col("v_min").isNull() & F.col("n_valid").isNull())
                | (
                    (F.col("n_valid") > 0)
                    & (F.col("v_max") >= F.lit(lo))
                    & (F.col("v_min") <= F.lit(hi))
                )
            )
            .select("chunk_key", "tile_id")
            .collect()
        )
        if not surv:
            return _empty_blocks()
        tile_ids = sorted({int(r["tile_id"]) for r in surv})
        winners = winners.filter(
            F.col("chunk_key").isin(sorted({r["chunk_key"] for r in surv}))
        )

    parts = []
    for elem in sorted(leafs):
        part = spark.read.schema(_typed_schema(BLOCK_SCHEMA, elem)).parquet(
            *leafs[elem]
        )
        parts.append(part.withColumn("block", _to_double(elem)))
    df = parts[0]
    for p_ in parts[1:]:
        df = df.unionByName(p_)
    df = df.filter(F.col("tile_id").isin(tile_ids))
    if channels is not None:
        df = df.filter(F.col("channel").isin(list(channels)))
    if toi_epochs is not None and spec.time_epochs is not None:
        idxs = [list(spec.time_epochs).index(t) for t in toi_epochs]
        df = df.filter(F.col("time_idx").isin(idxs))
    df = df.withColumn(
        "chunk_key",
        F.concat_ws("-", F.col("time_idx"), F.col("tile_y"), F.col("tile_x"), F.col("channel")),
    )
    return _with_roi_idx(df.join(F.broadcast(winners), ["chunk_key", "batch_id"], "left_semi"))


def chunk_stats(
    spark: SparkSession,
    path: str,
    roi_bbox,
    toi_epochs: list[int] | None = None,
    as_of_batch: str | None = None,
    channels: list[str] | None = None,
) -> DataFrame:
    """Zone-map manifest read: one row per VISIBLE chunk in the ROI with
    its stored value bounds (v_min, v_max) and valid-pixel count — the
    Iceberg-manifest/ORC-stripe-stats analog for the cube store. Column-
    pruned: the block arrays never enter the plan, so at 100 TB this
    reads a few bytes per chunk, not the chunks. Same ROI/TOI/channel/
    time-travel semantics as :func:`load`."""
    return load(
        spark,
        path,
        roi_bbox,
        toi_epochs=toi_epochs,
        as_of_batch=as_of_batch,
        channels=channels,
        stats_only=True,
    )


def load_changes(
    spark: SparkSession,
    path: str,
    roi_bbox,
    since_batch: str,
    toi_epochs: list[int] | None = None,
    channels: list[str] | None = None,
) -> DataFrame:
    """CDC read: the ROI's currently-visible blocks whose CONTENT
    changed after the ``since_batch`` snapshot (exclusive) — the
    incremental-consumer primitive (Iceberg incremental scan role): a
    downstream pipeline refreshes exactly what fills/patches landed,
    not the whole ROI.

    Change detection is by PROVENANCE, not winner identity: lineage's
    ``src_batch`` names the batch that last changed the chunk's pixels.
    A compaction rewrites blocks verbatim under a new batch_id but
    carries ``src_batch`` through, so it reports ZERO changes; a patch
    merge stamps its own id, so it reports exactly its footprint. New
    chunks (no winner at the snapshot) always report. All pruning is
    metadata-sized: two ROI-bounded lineage winner frames and one
    broadcast key set on top of the normal pruned block scan."""
    ids = [s["batch_id"] for s in snapshots(path)]
    if since_batch not in ids:
        raise ValueError(f"unknown snapshot {since_batch!r}; committed: {ids}")
    spec = open_spec(path)
    nx = spec.grid.n_tiles_x
    items, _ = _roi_items(roi_bbox)
    tile_ids = sorted(
        {int(ty * nx + tx) for it in items for tx, ty in _item_tiles(spec.grid, it)}
    )
    if not tile_ids:
        raise ValueError("ROI does not intersect the cube extent")

    from pyspark.sql import Window

    def _winner_src(allowed: set[str] | None) -> DataFrame:
        lin = read_lineage(spark, path).filter(F.col("tile_id").isin(tile_ids))
        if channels is not None:
            lin = lin.filter(F.col("channel").isin(list(channels)))
        if allowed is not None:
            lin = lin.filter(F.col("batch_id").isin(sorted(allowed)))
        lin = lin.select(
            "chunk_key",
            "batch_id",
            F.coalesce(F.col("src_batch"), F.col("batch_id")).alias("src_batch"),
        ).distinct()
        w = Window.partitionBy("chunk_key").orderBy(F.col("batch_id").asc())
        return (
            lin.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("chunk_key", "src_batch")
        )

    old = _winner_src(set(ids[: ids.index(since_batch) + 1])).withColumnRenamed(
        "src_batch", "old_src"
    )
    changed = (
        _winner_src(None)
        .join(old, "chunk_key", "left")
        .filter(F.col("old_src").isNull() | (F.col("src_batch") != F.col("old_src")))
        .select("chunk_key")
    )
    now = load(spark, path, roi_bbox, toi_epochs, channels=channels)
    return now.join(F.broadcast(changed), "chunk_key", "left_semi")


# ---------------------------------------------------------------------------
# store-backed overview pyramids (COG-overview / zarr-pyramid role)
# ---------------------------------------------------------------------------


def _downsample_sql(W: int, f: int) -> str:
    """Factor-``f`` average-downsample of a row-major W x W block as ONE
    JVM codegen expression (no Python hop, no shuffle): overview pixel
    j = (r0, c0) averages its f x f source window, VALID-aware — NULL
    and NaN source pixels (patch borders) are excluded, an all-invalid
    window stays NULL. The sum/count pair rides one named_struct
    accumulator so the filtered window array is built exactly once."""
    if W % f != 0:
        raise ValueError(f"factor {f} does not divide chunk_px {W}")
    w2 = W // f
    win = ", ".join(
        f"block[({f} * (j DIV {w2}) + {dr}) * {W} + {f} * (j % {w2}) + {dc}]"
        for dr in range(f)
        for dc in range(f)
    )
    return f"""transform(sequence(0, {w2 * w2 - 1}), j ->
      aggregate(
        filter(array({win}), x -> x IS NOT NULL AND NOT isnan(x)),
        named_struct('s', CAST(0.0 AS DOUBLE), 'c', 0),
        (a, x) -> named_struct('s', a.s + x, 'c', a.c + 1),
        a -> IF(a.c = 0, CAST(NULL AS DOUBLE), a.s / CAST(a.c AS DOUBLE))
      ))"""


OVERVIEW_SCHEMA = (
    "tile_y long, tile_x long, tile_id long, time_idx int, channel string, "
    "chunk_key string, block array<double>"
)


def build_overviews(
    spark: SparkSession,
    path: str,
    factors: tuple[int, ...] = (2,),
    roi_bbox=None,
) -> dict:
    """Materialize reduced-resolution levels of the VISIBLE cube (the
    COG-overview role; the on-the-fly ``pyramid_overview`` operator's
    store-backed sibling): one parquet level per factor under
    ``overviews/f=<factor>/``, chunk-aligned (same tile grid, W/f px a
    side), derived by the valid-aware average kernel above — an
    all-JVM projection over the normal pruned scan, so a level build
    is one scan + one write, no shuffle, no Python.

    Levels are DERIVED data with overwrite semantics: meta records the
    commit seq they were built at, and :func:`load_overview` refuses a
    stale level loudly (a silently stale zoom-out is a wrong answer).
    At 100 TB, rebuild levels per fill ROI — or compose with
    :func:`load_changes` to re-derive only changed tiles — rather than
    full-cube. Contract: one maintenance actor at a time (same as
    compact/vacuum)."""
    spec = open_spec(path)
    gb = spec.grid.geobox
    if roi_bbox is None:
        roi_bbox = (
            gb.x0,
            gb.y0 - gb.height * gb.res,
            gb.x0 + gb.width * gb.res,
            gb.y0,
        )
    seqs = _commit_seqs(path) or {}
    built_at = max(seqs.values(), default=0)
    snaps = snapshots(path)
    built_at_batch = snaps[-1]["batch_id"] if snaps else None
    # record the level's COVERAGE (r6 correctness fix, advisor item
    # #3): a partial (roi_bbox) build used to stamp only the cube-wide
    # seq, so load_overview's staleness check passed for ANY roi and a
    # read outside the built region silently returned no rows — a
    # partial zoom-out served as complete. The built tile-id set (the
    # same enumeration load() prunes by; <= n_tiles ints) makes the
    # claim exact for every ROI spelling.
    nx = spec.grid.n_tiles_x
    items, _ = _roi_items(roi_bbox)
    built_tiles = sorted(
        {int(ty * nx + tx) for it in items for tx, ty in _item_tiles(spec.grid, it)}
    )
    src = load(spark, path, roi_bbox)
    n = 0
    for f in factors:
        expr = _downsample_sql(spec.grid.chunk_px, int(f))
        out = src.select(
            "tile_y", "tile_x", "tile_id", "time_idx", "channel", "chunk_key",
            F.expr(expr).alias("block"),
        )
        d = os.path.join(path, "overviews", f"f={int(f)}")
        out.write.mode("overwrite").parquet(d)
        with open(os.path.join(d, "_overview.json"), "w") as fh:
            json.dump(
                {"factor": int(f), "chunk_px": spec.grid.chunk_px // int(f),
                 "built_at_seq": built_at, "built_at_batch": built_at_batch,
                 "built_tile_ids": built_tiles},
                fh,
            )
        n += 1
    return {"levels": n, "built_at_seq": built_at}


def refresh_overviews(
    spark: SparkSession, path: str, factors: tuple[int, ...] = (2,)
) -> dict:
    """INCREMENTAL level refresh via provenance CDC: re-derive only the
    chunks whose content changed since each level was built
    (:func:`load_changes`) and carry the rest of the level forward
    untouched. At 100 TB a fill touches a tiny ROI, so refresh cost
    tracks the FILL, not the cube — the full rebuild is the fallback
    (missing level, pre-CDC meta, or the build snapshot vacuumed away).
    A fresh level (no commits since) is a no-op.

    Crash-safety (derived data): the merged level lands in a tmp dir,
    then swaps in with two renames — a crash in the window loses only
    the level (rebuildable), never cube data."""
    spec = open_spec(path)
    gb = spec.grid.geobox
    full_bbox = (
        gb.x0, gb.y0 - gb.height * gb.res, gb.x0 + gb.width * gb.res, gb.y0,
    )
    seqs = _commit_seqs(path) or {}
    cur_seq = max(seqs.values(), default=0)
    changed_total = 0
    levels = 0
    for f in factors:
        f = int(f)
        d = os.path.join(path, "overviews", f"f={f}")
        meta_p = os.path.join(d, "_overview.json")
        meta = None
        if os.path.exists(meta_p):
            with open(meta_p) as fh:
                meta = json.load(fh)
        since = (meta or {}).get("built_at_batch")
        if meta is None or since is None:
            build_overviews(spark, path, factors=(f,))
            levels += 1
            continue
        if meta["built_at_seq"] >= cur_seq:
            levels += 1  # already current
            continue
        try:
            ch = load_changes(spark, path, full_bbox, since)
        except ValueError:  # snapshot vacuumed away: rebuild
            build_overviews(spark, path, factors=(f,))
            levels += 1
            continue
        cols = ["tile_y", "tile_x", "tile_id", "time_idx", "channel", "chunk_key"]
        new_part = ch.select(
            *cols, F.expr(_downsample_sql(spec.grid.chunk_px, f)).alias("block")
        ).localCheckpoint(eager=True)  # feeds the count AND the merged write
        n_changed = new_part.count()
        changed_total += n_changed
        snaps = snapshots(path)
        new_meta = {
            "factor": f, "chunk_px": spec.grid.chunk_px // f,
            "built_at_seq": cur_seq,
            "built_at_batch": snaps[-1]["batch_id"] if snaps else None,
        }
        # a refresh never widens the level's coverage claim: carry the
        # original built tile set through (legacy meta without it =
        # pre-fix full-extent build, left absent)
        if "built_tile_ids" in meta:
            new_meta["built_tile_ids"] = meta["built_tile_ids"]
        if n_changed == 0:
            # nothing to merge (e.g. only a compaction landed): the
            # level content is already correct — just advance the meta
            with open(meta_p, "w") as fh:
                json.dump(new_meta, fh)
            levels += 1
            continue
        keep = (
            spark.read.schema(OVERVIEW_SCHEMA)
            .parquet(d)
            .join(
                F.broadcast(new_part.select("chunk_key")), "chunk_key", "left_anti"
            )
        )
        out = keep.select(*cols, "block").unionByName(new_part.select(*cols, "block"))
        tmp = d + f".tmp-{uuid.uuid4().hex[:8]}"
        out.write.mode("overwrite").parquet(tmp)
        with open(os.path.join(tmp, "_overview.json"), "w") as fh:
            json.dump(new_meta, fh)
        trash = d + f".old-{uuid.uuid4().hex[:8]}"
        os.rename(d, trash)
        os.rename(tmp, d)
        import shutil

        shutil.rmtree(trash, ignore_errors=True)
        levels += 1
    return {"levels": levels, "changed_chunks": changed_total}


def load_overview(
    spark: SparkSession,
    path: str,
    roi_bbox,
    factor: int,
    channels: list[str] | None = None,
) -> DataFrame:
    """ROI read of a pyramid level: same tile pruning as :func:`load`
    (overview chunks keep their source tile ids), 1/f^2 the pixels per
    chunk. Raises on a missing or STALE level (commits landed after the
    build) — zoomed-out reads must never silently serve old data."""
    spec = open_spec(path)
    d = os.path.join(path, "overviews", f"f={int(factor)}")
    meta_p = os.path.join(d, "_overview.json")
    if not os.path.exists(meta_p):
        raise ValueError(
            f"no overview level f={factor}; run build_overviews first"
        )
    with open(meta_p) as fh:
        meta = json.load(fh)
    seqs = _commit_seqs(path) or {}
    cur = max(seqs.values(), default=0)
    if cur > meta["built_at_seq"]:
        raise ValueError(
            f"overview f={factor} is stale (built at seq "
            f"{meta['built_at_seq']}, cube at {cur}); rebuild first"
        )
    nx = spec.grid.n_tiles_x
    items, _ = _roi_items(roi_bbox)
    tile_ids = sorted(
        {int(ty * nx + tx) for it in items for tx, ty in _item_tiles(spec.grid, it)}
    )
    if not tile_ids:
        raise ValueError("ROI does not intersect the cube extent")
    # coverage gate (advisor item #3): a level built for a partial ROI
    # must refuse reads beyond it instead of silently serving an empty
    # (or partial) zoom-out as complete. Legacy meta without the tile
    # set predates partial builds (always full-extent) — no gate.
    if "built_tile_ids" in meta:
        outside = sorted(set(tile_ids) - set(meta["built_tile_ids"]))
        if outside:
            raise ValueError(
                f"overview f={factor} covers {len(meta['built_tile_ids'])} "
                f"tiles but the requested ROI needs {len(outside)} outside "
                "the built region (e.g. tile_id "
                f"{outside[0]}); rebuild with a covering ROI"
            )
    df = spark.read.schema(OVERVIEW_SCHEMA).parquet(d)
    df = df.filter(F.col("tile_id").isin(tile_ids))
    if channels is not None:
        unknown = [c for c in channels if c not in spec.channels]
        if unknown:
            raise ValueError(
                f"unknown channels {unknown}; cube has {list(spec.channels)}"
            )
        df = df.filter(F.col("channel").isin(list(channels)))
    return df


# ---------------------------------------------------------------------------
# maintenance: compaction + vacuum (the 100-TB small-file story)
# ---------------------------------------------------------------------------
# Incremental fills accumulate one blocks/lineage batch dir per run; at
# cluster scale that means (a) a growing file listing per scan, (b) a
# winner-ranking window whose input grows with batch count, (c) dead
# "loser" blocks from racing fills. Compaction rewrites the VISIBLE
# winner set as one batch whose id sorts BEFORE every fill batch (the
# reserved "0"-prefixed namespace), so under the unchanged read rule
# (min batch_id per chunk wins) the compacted batch shadows everything
# it covers the instant its lineage commits — readers are correct
# before, during, and after, with no locks. Vacuum then physically
# drops (1) uncommitted crashed orphans and (2) committed batches fully
# covered by a compacted batch. Contract: one maintenance actor at a
# time (fills may keep running — a batch that adds NEW chunks after the
# compact snapshot is never covered, hence never vacuumed).


def _compact_id(path: str) -> str:
    """Next compaction batch id: strictly below every LIVE one. Derived
    from min(existing 0-prefixed ids) - 1 across blocks AND lineage dirs
    — a count would reuse a live compaction's id after vacuum prunes its
    shadowed predecessors (overwrite-while-reading)."""
    lo = 0x0FFFFFFFFFFF + 1
    for sub in ("lineage", "blocks"):
        d = os.path.join(path, sub)
        if not os.path.isdir(d):
            continue
        for b in os.listdir(d):
            if b.startswith("batch=0"):
                lo = min(lo, int(b.split("=", 1)[1], 16))
    return format(lo - 1, "012x")


def compact(spark: SparkSession, path: str) -> dict:
    """Rewrite the visible chunk set as ONE batch (blocks + lineage) and
    carry the FULL committed event history into it (events are the
    append-only log — maintenance must not erase it; read_events
    de-duplicates the carried copies). Returns
    {batch_id, chunks, batches_covered}."""
    from pyspark.sql import Window

    committed = _lineage_batches(path)
    if len(committed) <= 1:
        return {"batch_id": None, "chunks": 0, "batches_covered": 0}
    new_id = _compact_id(path)
    lineage = read_lineage(spark, path)
    w = Window.partitionBy("chunk_key").orderBy(F.col("batch_id").asc())
    winners = (
        lineage.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")
    ).localCheckpoint(eager=True)  # feeds blocks semi-join AND the new lineage

    # per-dtype leaf groups: each storage element type is read with its
    # typed schema, semi-joined, and rewritten AS STORED — compaction
    # never round-trips typed blocks through double
    leafs = _block_leaf_dirs(_block_batches(path))
    new_dir = os.path.join(path, "blocks", f"batch={new_id}")
    typed_layout = sorted(leafs) != ["double"] or not all(
        os.path.basename(d).startswith("batch=") for d in leafs.get("double", [])
    )
    for elem in sorted(leafs):
        # BLOCK_FILE_SCHEMA so zone-map stats survive the rewrite
        # (legacy batches read NULL and stay NULL — "unknown, keep")
        blocks = spark.read.schema(_typed_schema(BLOCK_FILE_SCHEMA, elem)).parquet(
            *leafs[elem]
        )
        # blocks written by the pre-event-log format carry no chunk_key
        # column (schema read fills NULL, and NULL never semi-joins):
        # recompute it so legacy batches compact instead of silently
        # vanishing from the rewritten set
        blocks = blocks.withColumn(
            "chunk_key",
            F.coalesce(
                F.col("chunk_key"),
                F.concat_ws(
                    "-", F.col("time_idx"), F.col("tile_y"), F.col("tile_x"), F.col("channel")
                ),
            ),
        )
        # NO broadcast hint: winners is one row per visible chunk — cube-
        # sized, the exact thing load() refuses to force-broadcast (its ROI
        # prune is what makes its broadcast safe; compact has no ROI). Let
        # Catalyst/AQE pick: shuffled semi-join at scale, auto-broadcast
        # only when the registry actually fits.
        visible = blocks.join(
            winners.select("chunk_key", "batch_id"),
            ["chunk_key", "batch_id"],
            "left_semi",
        ).withColumn("batch_id", F.lit(new_id))
        target = os.path.join(new_dir, f"dt-{elem}") if typed_layout else new_dir
        visible.write.mode("overwrite").parquet(target)
    if typed_layout:
        open(os.path.join(new_dir, "_SUCCESS"), "w").close()

    # event history: copy every committed event row (original batch_id
    # values preserved in the COLUMN; the dir is the visibility unit)
    # into the compacted batch BEFORE its lineage commit, so vacuuming
    # the shadowed batches later loses nothing
    events = read_events(spark, path)
    events.write.mode("overwrite").parquet(
        os.path.join(path, "events", f"batch={new_id}")
    )

    new_lineage = (
        winners
        # provenance survives the verbatim rewrite: CDC must see "same
        # content" across a compaction (legacy rows coalesce to their
        # pre-compaction batch id)
        .withColumn("src_batch", F.coalesce(F.col("src_batch"), F.col("batch_id")))
        .withColumn("batch_id", F.lit(new_id))
        .select(
            "chunk_key", "tile_id", "time_idx", "channel",
            "batch_id", "partition_id", "n_rows", "n_bytes", "src_batch",
        )
    )
    new_lineage.write.mode("overwrite").parquet(
        os.path.join(path, "lineage", f"batch={new_id}")
    )
    # manifest of the batches whose event history THIS compaction
    # carried — vacuum's ground truth for what is safe to delete. A
    # batch committing concurrently (after our read_events above) is
    # not listed, so its events can never be vacuumed on our account.
    # Leading underscore: Spark/Hadoop readers ignore the file.
    with open(
        os.path.join(path, "lineage", f"batch={new_id}", "_covered.json"), "w"
    ) as mf:
        json.dump(sorted(os.path.basename(b).split("=", 1)[1] for b in committed), mf)
    # THE commit point: until the ticket lands the compacted batch is an
    # invisible orphan (readers keep the old view); compaction commits
    # LAST in seq order
    _allocate_commit_seq(path, new_id)
    n_chunks = winners.count()
    return {"batch_id": new_id, "chunks": int(n_chunks), "batches_covered": len(committed)}


def vacuum(spark: SparkSession, path: str, min_orphan_age_sec: float = 86400.0) -> dict:
    """Physically remove (1) uncommitted batch dirs older than
    ``min_orphan_age_sec`` (crashed orphans — invisible by the lineage
    gate) and (2) committed batches that a compaction RECORDED as
    carried (its ``_covered.json`` manifest) and whose covering
    compaction committed at least ``min_orphan_age_sec`` ago. Never
    touches a batch that wins any chunk, and never deletes a shadowed
    batch no manifest vouches for (e.g. a dup-only concurrent fill that
    lost every chunk but whose event history was never carried — its
    events stay, the log is append-only).

    The age guard serves twice: a fill IN FLIGHT looks exactly like a
    crashed orphan (blocks written, lineage not yet) — deleting it
    would let its later lineage commit claim chunks whose blocks are
    gone; and a reader holding a LAZY frame resolved against
    pre-compaction batch paths (Delta-style retention) needs the
    shadowed files to outlive the compaction by the retention window.
    Default 24 h; pass 0 only when no fill can be running and no lazy
    reader is live (tests, single-actor admin)."""
    import shutil

    committed = {os.path.basename(b) for b in _lineage_batches(path)}
    now = time.time()
    removed_orphans = []
    for sub in ("blocks", "events", "events_write", "lineage"):
        d = os.path.join(path, sub)
        if not os.path.isdir(d):
            continue
        for b in sorted(os.listdir(d)):
            p = os.path.join(d, b)
            if (
                b.startswith("batch=")
                and b not in committed
                and now - os.path.getmtime(p) >= min_orphan_age_sec
            ):
                shutil.rmtree(p, ignore_errors=True)
                removed_orphans.append(f"{sub}/{b}")

    # shadowed committed batches: all chunk_keys present under a
    # strictly smaller batch_id (lineage is payload-free — this is a
    # metadata-only anti-join, never touches block data)
    lineage = read_lineage(spark, path)
    a = lineage.select("chunk_key", "batch_id")
    covered = (
        a.alias("x")
        .join(
            a.alias("y"),
            (F.col("x.chunk_key") == F.col("y.chunk_key"))
            & (F.col("y.batch_id") < F.col("x.batch_id")),
            "left_anti",
        )
        .select(F.col("batch_id"))
        .distinct()
    )
    winning = {r["batch_id"] for r in covered.collect()}

    # which shadowed batches did a compaction actually CARRY, and has
    # that compaction been committed long enough for lazy readers to
    # have drained (ticket mtime = commit time)?
    cdir = _commits_dir(path)
    ticket_mtime: dict[str, float] = {}
    if os.path.isdir(cdir):
        for f in os.listdir(cdir):
            if "=" in f:
                bid = f.split("=", 1)[1]
                m = os.path.getmtime(os.path.join(cdir, f))
                ticket_mtime[bid] = min(m, ticket_mtime.get(bid, m))
    vouched: set[str] = set()
    for b in sorted(committed):
        bid = b.split("=", 1)[1]
        mf = os.path.join(path, "lineage", b, "_covered.json")
        if not os.path.exists(mf):
            continue
        if now - ticket_mtime.get(bid, now) < min_orphan_age_sec:
            continue  # compaction too fresh: retention window still open
        with open(mf) as fh:
            vouched.update(json.load(fh))
    removed_shadowed = []
    removed_bids = set()
    for b in sorted(committed):
        bid = b.split("=", 1)[1]
        if bid in winning or bid not in vouched:
            continue
        for sub in ("blocks", "events", "events_write", "lineage"):
            p = os.path.join(path, sub, b)
            if os.path.isdir(p):
                shutil.rmtree(p, ignore_errors=True)
        removed_shadowed.append(b)
        removed_bids.add(bid)

    # commit-ticket hygiene: entries of removed batches, plus any
    # dangling ticket whose lineage no longer exists, past the same
    # age guard; also crashed atomic-backfill temp dirs
    for f in os.listdir(os.path.join(path, "lineage")):
        p = os.path.join(path, "lineage", f)
        if (
            f.startswith("_commits.tmp.")
            and now - os.path.getmtime(p) >= min_orphan_age_sec
        ):
            shutil.rmtree(p, ignore_errors=True)
    live = {b.split("=", 1)[1] for b in committed} - removed_bids
    if os.path.isdir(cdir):
        for f in os.listdir(cdir):
            if "=" not in f:
                continue
            bid = f.split("=", 1)[1]
            p = os.path.join(cdir, f)
            if bid in removed_bids or (
                bid not in live and now - os.path.getmtime(p) >= min_orphan_age_sec
            ):
                os.unlink(p)
    return {"orphans_removed": removed_orphans, "shadowed_removed": removed_shadowed}
