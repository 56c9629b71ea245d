"""Structured Streaming surface (SURVEY.md §2.10).

The reference has no streaming — its analogs are iterative/incremental
batch (X1-X4), which the frontier engine models as checkpointed
iterations. This module provides the genuinely-streaming shapes a
web-scale ingest would add on top:

- :func:`incremental_page_ingest` — ``readStream`` over a pages
  directory (new parquet files = newly fetched WARC batches) →
  canonicalize → watermarked dedup by url_hash → sink. The streaming
  twin of the batch seen-set.
- :func:`windowed_host_rates` — tumbling-window per-host fetch-rate
  aggregation with late-data watermark (politeness monitoring).

Tested with the file source + ``availableNow`` trigger so tests are
hermetic and deterministic (no rate source wall-clock).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pubcrawler_spark.functions.urltools import with_canonical_url


def incremental_page_ingest(
    spark: SparkSession, input_dir: str, schema: str, watermark: str = "1 hour"
) -> DataFrame:
    """Streaming canonicalize + in-window exact dedup by url_hash.

    ``dropDuplicatesWithinWatermark`` keeps state bounded: at 10^10-URL
    scale the watermark bounds the state store to the late-data horizon
    while the batch bloom seen-set handles the full history.
    """
    stream = spark.readStream.schema(schema).parquet(input_dir)
    canon = with_canonical_url(stream)
    return canon.withWatermark("warc_ts", watermark).dropDuplicatesWithinWatermark(
        ["url_hash"]
    )


def windowed_host_rates(
    pages_stream: DataFrame, window: str = "10 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Per-host tumbling-window fetch counts (politeness monitoring)."""
    canon = with_canonical_url(pages_stream)
    return (
        canon.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("win"), "host")
        .agg(F.count("*").alias("n_fetched"))
        .select(F.col("win.start").alias("window_start"), "host", "n_fetched")
    )


def stateful_host_totals(pages_stream: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-host
    RUNNING fetch totals across micro-batches — the streaming twin of
    the engine's per-host budget accounting. State = one long per host;
    each batch emits the updated cumulative total (update mode)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    canon = with_canonical_url(pages_stream)

    def update(key, pdf_iter, state: GroupState):
        batch = sum(len(pdf) for pdf in pdf_iter)
        total = (state.get[0] if state.exists else 0) + batch
        state.update((total,))
        yield pd.DataFrame({"host": [key[0]], "total_fetched": [total]})

    return canon.groupBy("host").applyInPandasWithState(
        update,
        outputStructType="host string, total_fetched long",
        stateStructType="total long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_available_now(stream_df: DataFrame, checkpoint: str, out_dir: str, mode: str = "append"):
    """Drain everything currently available, then stop (deterministic)."""
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def run_complete_to_memory(stream_df: DataFrame, name: str, checkpoint: str):
    """Windowed aggregations under availableNow: append mode only emits
    windows the watermark has passed, and a drained source never
    advances it — complete mode to a memory sink surfaces every window
    (the file-sink path in production uses foreachBatch upserts)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", checkpoint)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
