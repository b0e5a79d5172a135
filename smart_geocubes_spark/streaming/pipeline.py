"""Structured Streaming surface: availableNow micro-batch tile
materialization with lineage-side dedup.

The reference is pull-based batch (SURVEY §2.9 — no watermarks or
streaming state); its resumability comes from the loaded_patches
anti-join. The streaming form here is semantically identical: a file
stream over the pages table, geoparse + tile assignment per
micro-batch, and ``foreachBatch`` running the same lineage-gated
upsert — the Trigger.AvailableNow run drains all files and stops, and
a re-run with the same checkpoint processes nothing new (source-side
exactly-once) while the lineage table dedups any sink-side replay.
Also provides a watermarked windowed aggregation (late-data surface)
over event time.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from smart_geocubes_spark.operators.geoparse import geoparse_url
from smart_geocubes_spark.operators.tiles import in_extent_filter, with_tiles_native
from smart_geocubes_spark.sources.synth import GRID


def stream_tile_counts(
    spark: SparkSession,
    pages_parquet_dir: str,
    out_dir: str,
    checkpoint_dir: str,
) -> None:
    """availableNow stream: pages files -> geoparse -> tile assign ->
    per-batch tile counts appended with batch_id (foreachBatch sink,
    idempotent on re-run via checkpoint)."""
    schema = spark.read.parquet(pages_parquet_dir).schema
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(pages_parquet_dir)
    )
    g = src.withColumn("g", geoparse_url()(F.col("url")))
    pts = g.filter(F.col("g.has_geo")).select(
        "page_id",
        (F.col("g.lat_e5") / F.lit(100000.0)).alias("lat"),
        (F.col("g.lon_e5") / F.lit(100000.0)).alias("lon"),
    )
    pts = with_tiles_native(pts.filter(in_extent_filter(GRID)), GRID)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        counts = batch_df.groupBy("tile_id").agg(F.count("*").alias("n_pages"))
        # overwrite the per-batch dir: a replayed micro-batch (driver
        # died between sink write and checkpoint commit) lands on the
        # same batch_id and replaces rather than duplicates — the
        # standard foreachBatch idempotency pattern.
        counts.withColumn("batch_id", F.lit(batch_id)).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch={batch_id}")
        )

    q = (
        pts.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_windowed_event_counts(
    spark: SparkSession,
    events_parquet_dir: str,
    watermark: str = "1 hour",
    query_name: str = "stream_event_counts",
) -> DataFrame:
    """Tumbling-window aggregation over event time, availableNow drain
    into a memory sink. NOTE on semantics: complete output mode retains
    all window state, so the watermark here bounds state only for the
    update/append variants — in complete mode every row (late or not)
    is folded in, which is exactly what the batch-parity test asserts.
    For drop-late semantics switch outputMode to 'append' (windows then
    emit only once finalized past the watermark)."""
    schema = spark.read.parquet(events_parquet_dir).schema
    src = spark.readStream.schema(schema).parquet(events_parquet_dir)
    agg = (
        src.withColumn("ets", F.col("ts").cast("timestamp"))
        .withWatermark("ets", watermark)
        .groupBy(F.window("ets", "1 day").alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("w_start"),
            "event_type",
            F.col("n").cast("long").alias("n"),
        )
    )
    q = (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)


def stream_dedup_within_watermark(
    spark: SparkSession,
    events_parquet_dir: str,
    checkpoint_dir: str,
    query_name: str = "dedup_stream",
    delay: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup with bounded state: duplicate page events
    arriving in DIFFERENT micro-batches are dropped as long as they fall
    within the event-time watermark (``dropDuplicatesWithinWatermark``),
    so the dedup state store stays bounded by the watermark horizon
    instead of growing with the stream — the streaming form of the
    exact-dedup operator (batch analog: operators/dedup.dedup_exact).
    availableNow drain; returns the deduped frame from the memory sink."""
    schema = spark.read.parquet(events_parquet_dir).schema
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # dupes split across micro-batches
        .parquet(events_parquet_dir)
    )
    deduped = (
        src.withColumn("ts", F.timestamp_seconds(F.col("warc_epoch")))
        .withWatermark("ts", delay)
        .dropDuplicatesWithinWatermark(["page_id"])
    )
    q = (
        deduped.selectExpr("page_id", "host_id", "warc_epoch")
        .writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)


def stream_session_windows(
    spark: SparkSession,
    events_parquet_dir: str,
    gap_seconds: int = 1800,
    query_name: str = "stream_sessions",
) -> DataFrame:
    """SESSION-window aggregation over event time (Structured
    Streaming ``session_window``): per user, events within
    ``gap_seconds`` of the previous event merge into one session
    [first_ts, last_ts + gap). availableNow drain into a memory sink,
    complete output mode (no watermark: complete retains all session
    state, so the drained result is the deterministic batch answer —
    the gate oracle replays it with the classic lag/gap/cumsum
    sessionization). Session bounds export as epoch-MICROSECOND
    BIGINTs (no tz anywhere near the compare)."""
    schema = spark.read.parquet(events_parquet_dir).schema
    src = spark.readStream.schema(schema).parquet(events_parquet_dir)
    agg = (
        src.withColumn("ets", F.col("ts").cast("timestamp"))
        .groupBy(
            F.col("user_id"),
            F.session_window(F.col("ets"), f"{gap_seconds} seconds").alias("w"),
        )
        .agg(F.count("*").alias("n"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("s_start_us"),
            F.unix_micros(F.col("w.end")).alias("s_end_us"),
            F.col("n").cast("long").alias("n_events"),
        )
    )
    q = (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)
