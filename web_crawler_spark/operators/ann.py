"""Approximate nearest neighbors over an embedding column.

Two strategies, both DataFrame-native:

* ``brute_force_topk`` — exact cosine top-k: tiny query side broadcast,
  scan side stays distributed.  The correctness baseline and the right
  plan whenever |queries| is small (the 100 TB side is scanned once, no
  shuffle).
* ``lsh_topk`` — random-sign-projection LSH: ``n_tables`` independent
  sign signatures of ``n_planes`` bits each; a vector is compared only
  with vectors sharing a (table, signature) bucket.  Planes are seeded
  ±1 (Rademacher) weights inlined as column literals and the vectors are
  quantized to integers first, so every signature bit is an *exact
  integer* comparison — bit-reproducible in any engine (this is what
  makes the DuckDB correctness oracle possible; Gaussian planes with
  float dot products are summation-order-sensitive near zero).  Sign
  projections with ±1 weights have the same locality-sensitive collision
  law as Gaussian ones (P[bit match] = 1 - angle/pi, asymptotically).
  Recall/cost trades off via (n_planes, n_tables); the bucket join
  shuffles only (signature, vector) pairs instead of the full cross
  product.

Skew handling (axis B): ``bucket_cap`` bounds candidates per (table,
signature) bucket with a deterministic row_number window — near-dup-heavy
corpora pile into few buckets and would otherwise go quadratic (same
salted-window pattern as the crawl politeness queue).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .skew import top_n_per_bucket

# embedding quantization step: 1e-6 resolution, exact int64 arithmetic
QUANT = 1_000_000


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


def hyperplanes(dim: int, n_planes: int, n_tables: int, seed: int = 42) -> np.ndarray:
    """Seeded ±1 sign-projection planes, shape (n_tables, n_planes, dim).
    Public so the DuckDB oracle SQL embeds the exact same literals."""
    rng = np.random.RandomState(seed)
    return rng.choice(
        np.array([-1, 1], dtype=np.int64), size=(n_tables, n_planes, dim)
    )


def quantize_col(v: F.Column) -> F.Column:
    """array<double> -> array<long> at 1e-6 resolution (round half away
    from zero in both Spark and DuckDB)."""
    return F.transform(v, lambda x: F.round(x * QUANT, 0).cast("long"))


def signature_col(qv: F.Column, planes: np.ndarray) -> F.Column:
    """Sign-bit signature of one LSH table over a *quantized* vector:
    each bit is sign(sum of ±qv[i]) — exact int64 arithmetic."""
    bits = []
    for p in planes:
        w = F.array(*[F.lit(int(x)) for x in p])
        dot = F.aggregate(
            F.zip_with(qv, w, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda s, x: s + x,
        )
        bits.append(F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def near_dup_candidates_lsh(
    vectors: DataFrame,
    dim: int = 64,
    n_planes: int = 6,
    n_tables: int = 6,
    seed: int = 7,
    bucket_cap: int | None = None,
) -> DataFrame:
    """Near-dup candidate pairs via banded LSH self-join — the 100 TB
    plan: pairs only from shared (table, signature) buckets, deduped.

    vectors(vec_id, v) -> (id_a, id_b, va, vb), id_a < id_b.

    ``bucket_cap`` (axis B): a near-dup-heavy corpus piles into few
    buckets and the self-join goes quadratic in the hottest bucket;
    capping each (table, signature) bucket to its first N vec_ids (a
    deterministic row_number window — same pattern as the crawl
    politeness queue) bounds any bucket's contribution to N^2/2 pairs.
    The cap is applied to the bucket MEMBERSHIP (both join sides see the
    same capped set), so the output stays a subset of the uncapped one
    and the DuckDB oracle can replicate it exactly.
    """
    planes = hyperplanes(dim, n_planes, n_tables, seed)
    sigs = vectors.withColumn("_qv", quantize_col(F.col("v"))).select(
        "vec_id",
        "v",
        *[
            signature_col(F.col("_qv"), planes[t]).alias(f"sig{t}")
            for t in range(n_tables)
        ],
    )
    pairs = None
    for t in range(n_tables):
        side = sigs
        if bucket_cap is not None:
            # salted two-stage first-N: with only 2^n_planes distinct
            # signatures, a single-stage window would route each hot
            # bucket through ONE task (round-3 VERDICT #3)
            side = top_n_per_bucket(sigs, [f"sig{t}"], "vec_id", bucket_cap)
        a = side.select(
            F.col("vec_id").alias("id_a"), F.col("v").alias("va"),
            F.col(f"sig{t}").alias("_s"),
        )
        b = side.select(
            F.col("vec_id").alias("id_b"), F.col("v").alias("vb"),
            F.col(f"sig{t}").alias("_s"),
        )
        p = a.join(b, "_s").filter(F.col("id_a") < F.col("id_b")).select(
            "id_a", "id_b", "va", "vb"
        )
        pairs = p if pairs is None else pairs.unionByName(p)
    return pairs.dropDuplicates(["id_a", "id_b"])


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dim: int = 64,
    n_planes: int = 6,
    n_tables: int = 3,
    seed: int = 42,
    bucket_cap: int | None = None,
) -> DataFrame:
    """Approximate top-k: compare only within shared LSH buckets.

    vectors(vec_id, v), queries(query_id, qv) — qv must be the same dim.
    Union of n_tables bucket joins, deduped per (query, neighbor), then
    exact cosine ranking of the surviving candidates.  ``bucket_cap``
    bounds each (table, signature) bucket to its first N vec_ids.
    """
    planes = hyperplanes(dim, n_planes, n_tables, seed)
    sigs = vectors.withColumn("_qv", quantize_col(F.col("v"))).select(
        "vec_id",
        "v",
        *[
            signature_col(F.col("_qv"), planes[t]).alias(f"sig{t}")
            for t in range(n_tables)
        ],
    )
    qsigs = queries.withColumn("_qv", quantize_col(F.col("qv"))).select(
        "query_id",
        "qv",
        *[
            signature_col(F.col("_qv"), planes[t]).alias(f"qsig{t}")
            for t in range(n_tables)
        ],
    )
    cands = None
    for t in range(n_tables):
        side = sigs
        if bucket_cap is not None:
            # salted two-stage first-N (see near_dup_candidates_lsh)
            side = top_n_per_bucket(sigs, [f"sig{t}"], "vec_id", bucket_cap)
        c = qsigs.join(
            side, F.col(f"qsig{t}") == F.col(f"sig{t}"), "inner"
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
