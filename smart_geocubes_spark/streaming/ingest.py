"""Streaming ingestion into the transactional cube store.

A Structured Streaming query over FILL REQUESTS (control-plane rows:
one bbox per row) drives the same ``materialize`` path batch fills
use, via ``foreachBatch``. The exactly-once story composes three
existing mechanisms rather than inventing a new one:

1. **Source side** — the streaming checkpoint: each request file is
   processed in exactly one micro-batch; an availableNow re-run with
   the same checkpoint processes nothing new.
2. **Sink side, replay** — a micro-batch replayed after a driver
   crash (sink ran, checkpoint commit didn't) re-enters
   ``materialize``, whose lineage anti-join sees every chunk already
   committed and skips the whole fill ("all cached"): chunk-level
   idempotency, independent of Spark's epoch bookkeeping.
3. **Sink side, mid-fill crash** — a fill that died between the block
   write and the commit ticket left ORPHAN block files that the
   min-batch_id read rule never surfaces; the replayed batch fills
   fresh under a new batch_id and ``vacuum`` reaps the orphans — the
   same crash contract ``tests/test_materialize.py`` pins for batch
   fills.

The reference's closest analog is the threaded loader's queue of
patch downloads feeding icechunk commits
(``/root/reference/src/smart_geocubes/backends/threaded.py``); here
the queue is a file stream and the commit is the store's atomic
ticket.

Scale shape: request rows are control-plane (a handful per trigger) —
the ``collect()`` is driver-trivial BY CONTRACT and guarded; the data
plane stays inside ``materialize``'s pinned-partition fill kernel.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from smart_geocubes_spark.plans.materialize import materialize

# a micro-batch carrying more distinct ROIs than this is not a
# control-plane stream any more — fail loudly instead of silently
# collecting a data-sized frame onto the driver
MAX_REQUESTS_PER_BATCH = 10_000


def stream_fill_requests(
    spark: SparkSession,
    requests_parquet_dir: str,
    cube_path: str,
    checkpoint_dir: str,
    toi_epochs: list[int] | None = None,
) -> list[dict]:
    """Drain fill requests (rows: minx/miny/maxx/maxy) into the cube
    with availableNow, one ``materialize`` run per micro-batch.

    Returns the per-micro-batch materialize summaries (in trigger
    order). Chunks requested by several batches are filled exactly
    once — later batches see them in lineage and skip.
    """
    schema = spark.read.parquet(requests_parquet_dir).schema
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(requests_parquet_dir)
    )
    results: list[dict] = []

    def sink(batch_df, batch_id: int) -> None:
        reqs = batch_df.select("minx", "miny", "maxx", "maxy").distinct()
        rois = [
            (r.minx, r.miny, r.maxx, r.maxy)
            for r in reqs.limit(MAX_REQUESTS_PER_BATCH + 1).collect()
        ]
        if len(rois) > MAX_REQUESTS_PER_BATCH:
            raise ValueError(
                f"micro-batch {batch_id} carries >{MAX_REQUESTS_PER_BATCH} "
                "distinct ROIs — not a control-plane request stream"
            )
        if not rois:
            return
        res = materialize(spark, cube_path, rois, toi_epochs)
        results.append({"stream_batch": int(batch_id), **res})

    q = (
        src.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return results
