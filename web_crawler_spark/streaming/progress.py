"""Streaming progress feed — the reference's WebSocket push (ST5)
re-expressed as Structured Streaming over the wave commit markers.

The reference pushes progress JSON every 2 s per open WebSocket until the
crawl is terminal (/root/reference/manager/src/routes/ws.rs:25-53), which
is a poll of the same counts query.  Our engine commits one ``_COMMITTED``
marker per wave (a JSON summary with crawl_id, wave, and the wave totals),
so a *stream* of progress is just ``readStream`` over the marker layout:
new wave commits become new micro-batch input files — no server, no push
loop, any number of concurrent readers.

Exactly-once by construction: markers are written once via atomic rename
and never rewritten.  The per-partition ``metrics.parquet`` files, by
contrast, are re-generated under fresh part-file names when a crashed
wave re-runs, so a file-source stream over them is at-least-once
(``metrics_stream`` keeps that source for partition-lineage tailing and
documents the caveat); the progress totals come from the markers.

``tail_progress`` aggregates per crawl (cumulative fetched/children/
failed and last wave) into an in-memory sink table the caller can query;
``Trigger.AvailableNow`` (processing all data then stopping) makes it
usable both as a live tailer and as a deterministic batch catch-up —
which is also what the tests do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..store import METRICS_SCHEMA, SnapshotStore

# _COMMITTED marker payload (store.commit_wave): WaveResult fields +
# identity; cancel-wave markers carry only identity + cancelled_wave
COMMIT_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.DoubleType()),
        T.StructField("crawl_id", T.StringType()),
        T.StructField("wave", T.IntegerType()),
        T.StructField("fetched", T.LongType()),
        T.StructField("ok", T.LongType()),
        T.StructField("failed", T.LongType()),
        T.StructField("timeouts", T.LongType()),
        T.StructField("candidates", T.LongType()),
        T.StructField("dedup_dropped", T.LongType()),
        T.StructField("dns_dropped", T.LongType()),
        T.StructField("children", T.LongType()),
        T.StructField("elapsed_ms", T.LongType()),
        T.StructField("cancelled_wave", T.BooleanType()),
    ]
)


def commit_stream(spark: SparkSession, store: SnapshotStore) -> DataFrame:
    """Unbounded wave-commit source: every committed wave's marker,
    across all crawls in the store (exactly one record per commit).
    Reads the ``commit.json`` twin of ``_COMMITTED`` — underscore-prefixed
    files are hidden from Spark file sources."""
    pattern = str(store.root / "crawls" / "*" / "wave_*" / "commit.json")
    return (
        spark.readStream.schema(COMMIT_SCHEMA)
        # one wave commit = one file; keep batches small and ordered-ish
        # so progress is monotone per crawl
        .option("maxFilesPerTrigger", 64)
        .json(pattern)
    )


def metrics_stream(spark: SparkSession, store: SnapshotStore) -> DataFrame:
    """Per-partition lineage source (metrics rows per wave x partition).

    At-least-once: a wave that crashed between its metrics write and its
    commit marker is re-run deterministically, but the re-written parquet
    part files have fresh names, so the file source ingests that wave's
    rows twice.  Consumers must dedupe by (crawl_id, wave, partition_id)
    or use ``commit_stream`` (exactly-once) for totals.
    """
    pattern = str(store.root / "crawls" / "*" / "wave_*" / "metrics.parquet")
    return (
        spark.readStream.schema(METRICS_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(pattern)
    )


def progress_updates(commits: DataFrame) -> DataFrame:
    """Cumulative per-crawl progress from the commit-marker stream:
    complete-mode aggregation, the streaming equivalent of the
    reference's repeated progress query."""
    return commits.groupBy("crawl_id").agg(
        F.max("wave").alias("last_wave"),
        F.sum("fetched").alias("urls_fetched"),
        F.sum("children").alias("urls_discovered"),
        F.sum("failed").alias("urls_failed"),
        F.sum("dedup_dropped").alias("links_deduped"),
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
        progress_updates(commit_stream(spark, store))
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(table_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
