"""Custom stateful streaming operator via ``applyInPandasWithState``.

Batch semantics in the reference are stateless pulls; the streaming
engine surface adds an incremental per-key accumulator — here a
per-host ingest ledger (pages seen, chars extracted, max page_id) that
survives across micro-batches in the state store. This is the
``applyInPandasWithState`` shape: grouped Arrow batches + a GroupState
holding a tuple, timeout-free, emitting the updated ledger row per
batch (reference analog: the in-memory event-log accumulation,
``core/backend.py:23-28``, made distributed + incremental)."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n_pages long, n_chars long, max_page_id long"
OUTPUT_SCHEMA = "host_id long, n_pages long, n_chars long, max_page_id long"


def _update_host_ledger(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (host_id,) = key
    if state.exists:
        n_pages, n_chars, max_pid = state.get
    else:
        n_pages, n_chars, max_pid = 0, 0, -1
    for pdf in pdfs:
        if len(pdf) == 0:  # state-store invocations can deliver empty batches
            continue
        n_pages += len(pdf)
        n_chars += int(pdf["n_chars"].sum())
        max_pid = max(max_pid, int(pdf["page_id"].max()))
    state.update((n_pages, n_chars, max_pid))
    yield pd.DataFrame(
        [{"host_id": host_id, "n_pages": n_pages, "n_chars": n_chars, "max_page_id": max_pid}]
    )


def stream_host_ledger(
    spark: SparkSession, pages_parquet_dir: str, checkpoint_dir: str
) -> DataFrame:
    """availableNow drain of the pages dir through the stateful ledger;
    returns the final per-host ledger (latest state row per host)."""
    schema = spark.read.parquet(pages_parquet_dir).schema
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # several micro-batches => state actually carries over
        .parquet(pages_parquet_dir)
    )
    ev = src.select("host_id", "page_id", F.length("text").alias("n_chars"))
    ledger = ev.groupBy("host_id").applyInPandasWithState(
        _update_host_ledger,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        ledger.writeStream.format("memory")
        .queryName("host_ledger")
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update mode emits one row per (host, micro-batch); latest wins
    all_rows = spark.table("host_ledger")
    w_latest = all_rows.groupBy("host_id").agg(
        F.max("n_pages").alias("n_pages"),
        F.max("n_chars").alias("n_chars"),
        F.max("max_page_id").alias("max_page_id"),
    )
    return w_latest
