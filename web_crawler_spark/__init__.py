"""web_crawler_spark — a PySpark-native URL-frontier + fetch-scheduler engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference crawler ``bluedotiya/web_crawler`` (a Rust Manager/Feeder/Neo4j
system).  The reference's four Neo4j roles — frontier queue, URL-seen set,
job-state store, result graph — become columnar tables; its row-at-a-time
poll loop becomes a level-synchronous BFS where each *wave* is one batch
DataFrame job committed as one atomic table snapshot.

Layout:
    functions/   column-expression libraries (URL canonicalization, link
                 extraction, DNS-candidate generation, hashing)
    sources/     fetch/DNS simulators
    operators/   wave dedup (bloom prefilter + exact anti-join), text
                 near-dup (minhash/simhash/jaccard), ANN similarity, media
    streaming/   wave-commit progress tailer (exactly-once markers)
    engine.py    the wave-loop crawl engine (level-synchronous BFS)
    store.py     snapshot-versioned table store (Iceberg stand-in)
    queries.py   read-side analytics (the reference's GET endpoints)
    corpus.py    deterministic interleaved-docs corpus generator
    oracle.py    sequential reference oracle (the executable spec)
"""

__version__ = "0.1.0"
