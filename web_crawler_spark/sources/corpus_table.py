"""Bucketed corpus storage: the shuffle-free fetch join, demonstrated.

The engine's 100 TB scale story for the corpus side of the per-wave fetch
join (engine.py — "bucket both tables by the join key in production so
the joins are co-partitioned") was, through round 2, only *asserted*: the
sandbox stand-in was an in-memory ``repartition().persist()`` of the
corpus, which cannot exist at 100 TB.  This module makes the claim
*shown*:

* ``save_bucketed_corpus`` writes ``documents`` as a Spark **bucketed
  table** (``bucketBy(N, doc_id)`` + ``sortBy``) — the parquet/metastore
  equivalent of an Iceberg table partitioned by ``bucket(N, doc_id)``
  (no Iceberg runtime jar ships in this sandbox; the physical property
  is identical: the scan itself reports hash distribution by doc_id).
* ``read_bucketed_corpus`` returns the pruned scan an engine can pass
  with ``prepared=True`` — no repartition, no cache: the storage layout
  IS the partitioning.
* ``count_exchanges`` / ``explain_str`` let tests and the bench assert
  the physical plan: a wave-side join against the bucketed corpus has
  **zero Exchange on the corpus side** (only the small wave side
  shuffles to the bucket count), which is the property that keeps the
  100 TB side un-shuffled at every wave of every crawl.

Reference scale contract: the reference re-reads its Neo4j store per job
(feeder/src/job.rs:138-165) — a server-side index lookup; the Spark twin
at 10^10 rows is this co-located join.
"""

from __future__ import annotations

import contextlib
import io
import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


def save_bucketed_corpus(
    spark: SparkSession,
    documents: DataFrame,
    table: str,
    n_buckets: int = 32,
) -> DataFrame:
    """Write ``documents`` as a bucketed+sorted parquet table and return
    the (pruned) scan.  One full shuffle at WRITE time buys every future
    fetch join a shuffle-free corpus side — the right trade whenever the
    corpus is read by more than one wave (always, for a crawl).
    """
    # an in-memory catalog forgets tables across sessions but their
    # warehouse locations survive — drop both before writing
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    loc = Path(wh.removeprefix("file:")) / table.lower()
    if loc.exists():
        shutil.rmtree(loc, ignore_errors=True)
    (
        documents.write.bucketBy(n_buckets, "doc_id")
        .sortBy("doc_id")
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(table)
    )
    return read_bucketed_corpus(spark, table)


def read_bucketed_corpus(spark: SparkSession, table: str) -> DataFrame:
    """Pruned scan of a bucketed corpus table, ready for
    ``CrawlEngine(..., prepared=True)``."""
    return spark.table(table).select("doc_id", "spans")


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """``df.explain(mode)`` as a string (pyspark only prints it)."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def count_exchanges(df: DataFrame) -> int:
    """Number of Exchange (shuffle) operators in the physical plan
    (simple mode lists each operator exactly once)."""
    plan = explain_str(df, mode="simple")
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line and "ReusedExchange" not in line
    )


def is_bucketed_scan(df: DataFrame) -> bool:
    """True iff the plan reads the corpus via a bucketed file scan."""
    plan = explain_str(df)
    return "SelectedBucketsCount" in plan or "Bucketed: true" in plan
