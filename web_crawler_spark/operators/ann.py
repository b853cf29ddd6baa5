"""Approximate nearest neighbors over an embedding column.

Two strategies, both DataFrame-native:

* ``brute_force_topk`` — exact cosine top-k: tiny query side broadcast,
  scan side stays distributed.  The correctness baseline and the right
  plan whenever |queries| is small (the 100 TB side is scanned once, no
  shuffle).
* ``lsh_topk`` — random-hyperplane LSH: ``n_tables`` independent sign
  signatures of ``n_planes`` bits each; a vector is compared only with
  vectors sharing a (table, signature) bucket.  Hyperplanes are
  deterministic (seeded numpy) and inlined as column literals, so the
  whole scoring path is JVM expressions — no UDF.  Recall/cost trades
  off via (n_planes, n_tables); the bucket join shuffles only
  (signature, vector) pairs instead of the full cross product.

Skew note (axis B): near-duplicate-heavy corpora pile into few buckets;
cap per-bucket candidates with a row_number window if needed (same
salted-window pattern as the crawl politeness queue).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cosine_col(a: F.Column, b: F.Column) -> F.Column:
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))
    return dot / (na * nb)


def brute_force_topk(
    vectors: DataFrame, queries: DataFrame, k: int = 5
) -> DataFrame:
    """Exact top-k: vectors(vec_id, v) x queries(query_id, qv) broadcast."""
    pairs = vectors.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(cosine_col(F.col("qv"), F.col("v")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _hyperplanes(dim: int, n_planes: int, n_tables: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_tables, n_planes, dim))


def _signature_col(v: F.Column, planes: np.ndarray) -> F.Column:
    """Sign-bit signature of one LSH table as a bit string column."""
    bits = []
    for p in planes:
        w = F.array(*[F.lit(float(x)) for x in p])
        dot = F.aggregate(
            F.zip_with(v, w, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x
        )
        bits.append(F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dim: int = 64,
    n_planes: int = 6,
    n_tables: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: compare only within shared LSH buckets.

    vectors(vec_id, v), queries(query_id, qv) — qv must be the same dim.
    Union of n_tables bucket joins, deduped per (query, neighbor), then
    exact cosine ranking of the surviving candidates.
    """
    planes = _hyperplanes(dim, n_planes, n_tables, seed)
    sigs = vectors.select(
        "vec_id",
        "v",
        *[
            _signature_col(F.col("v"), planes[t]).alias(f"sig{t}")
            for t in range(n_tables)
        ],
    )
    qsigs = queries.select(
        "query_id",
        "qv",
        *[
            _signature_col(F.col("qv"), planes[t]).alias(f"qsig{t}")
            for t in range(n_tables)
        ],
    )
    cands = None
    for t in range(n_tables):
        c = qsigs.join(
            sigs, F.col(f"qsig{t}") == F.col(f"sig{t}"), "inner"
        ).filter(F.col("vec_id") != F.col("query_id")).select(
            "query_id", "qv", "vec_id", "v"
        )
        cands = c if cands is None else cands.unionByName(c)
    cands = cands.dropDuplicates(["query_id", "vec_id"])
    scored = cands.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(cosine_col(F.col("qv"), F.col("v")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
