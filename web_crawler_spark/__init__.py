"""web_crawler_spark — a PySpark-native URL-frontier + fetch-scheduler engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference crawler ``bluedotiya/web_crawler`` (a Rust Manager/Feeder/Neo4j
system).  The reference's four Neo4j roles — frontier queue, URL-seen set,
job-state store, result graph — become columnar tables; its row-at-a-time
poll loop becomes a level-synchronous BFS where each *wave* is one batch
DataFrame job committed as one atomic table snapshot.

Layout:
    functions/   column-expression libraries (URL canonicalization, link
                 extraction, DNS-candidate generation, text analysis, hashing)
    sources/     deterministic corpus generator, fetch/DNS simulators,
                 snapshot-versioned table store (Iceberg stand-in)
    operators/   wave dedup (bloom prefilter + exact anti-join), politeness,
                 corpus-scale dedup (minhash/simhash/...), ANN similarity
    plans/       the wave-loop crawl engine + read-side analytics queries
    streaming/   per-wave metrics lineage
"""

__version__ = "0.1.0"
