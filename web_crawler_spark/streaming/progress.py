"""Streaming progress feed — the reference's WebSocket push (ST5)
re-expressed as Structured Streaming over the metrics table.

The reference pushes progress JSON every 2 s per open WebSocket until the
crawl is terminal (/root/reference/manager/src/routes/ws.rs:25-53), which
is a poll of the same counts query.  Our engine appends one metrics row
per (wave, partition) at each snapshot commit, so a *stream* of progress
is just ``readStream`` over the metrics file layout: new wave directories
become new micro-batch input files — no server, no push loop, and any
number of concurrent readers.

``tail_progress`` aggregates per crawl (cumulative fetched/children/
failed and last wave) into an in-memory sink table the caller can query;
``Trigger.AvailableNow`` (processing all data then stopping) makes it
usable both as a live tailer and as a deterministic batch catch-up —
which is also what the tests do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..store import METRICS_SCHEMA, SnapshotStore


def metrics_stream(spark: SparkSession, store: SnapshotStore) -> DataFrame:
    """Unbounded metrics source: every committed wave's metrics files,
    across all crawls in the store."""
    pattern = str(store.root / "crawls" / "*" / "wave_*" / "metrics.parquet")
    return (
        spark.readStream.schema(METRICS_SCHEMA)
        # one wave commit = a handful of files; keep batches small and
        # ordered-ish so progress is monotone per crawl
        .option("maxFilesPerTrigger", 64)
        .parquet(pattern)
    )


def progress_updates(metrics: DataFrame) -> DataFrame:
    """Cumulative per-crawl progress from the wave-total rows
    (partition_id = -1): complete-mode aggregation, the streaming
    equivalent of the reference's repeated progress query."""
    return (
        metrics.filter(F.col("partition_id") == -1)
        .groupBy("crawl_id")
        .agg(
            F.max("wave").alias("last_wave"),
            F.sum("fetched").alias("urls_fetched"),
            F.sum("children").alias("urls_discovered"),
            F.sum("failed").alias("urls_failed"),
            F.sum("dedup_dropped").alias("links_deduped"),
        )
    )


def tail_progress(
    spark: SparkSession, store: SnapshotStore, table_name: str = "crawl_progress"
):
    """Run the progress stream until current end of data (AvailableNow),
    materializing into the in-memory table ``table_name``.

    Returns the StreamingQuery (already awaited); read results with
    ``spark.table(table_name)``.
    """
    q = (
        progress_updates(metrics_stream(spark, store))
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(table_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
