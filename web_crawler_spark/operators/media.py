"""Multimodal span plumbing: decode / feature-extract over media spans.

The interleaved ``documents.spans`` array carries image/video spans as
opaque references (``media_ref``) with ``text=''`` — the reference crawler
ignores non-text content entirely (its regex only sees HTML text,
/root/reference/shared/src/crawler.rs:55-60); a training-data pipeline at
100 TB must instead route media through Arrow-batched Python.

This module makes the *Spark-side plumbing* real — schema, partitioning,
``mapInPandas`` batch shape, deterministic outputs — while the actual
byte decoders are STUBBED (no image/audio libraries ship in this
container): ``_decode_stub`` synthesizes a per-ref pseudo-payload from
xxhash64 and raises ``NotImplementedError`` only if a caller explicitly
demands real decoding (``require_real=True``).  Swapping in PIL/ffmpeg is
a pure function replacement inside the same UDF; the distributed plan —
explode media spans, repartition by ref hash so one huge document can't
skew a task, Arrow-batch into pandas — is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.xxh64 import pmod, xxhash64_str

FEATURES_SCHEMA = (
    "doc_id string, media_ref string, kind string, "
    "stub_bytes int, feat_norm double"
)


def _decode_stub(media_ref: str, require_real: bool = False) -> tuple[int, float]:
    """Deterministic stand-in for a real media decoder.

    Returns (payload_byte_length, feature_vector_norm) derived purely from
    the ref hash.  Real decoding is intentionally unavailable here.
    """
    if require_real:
        raise NotImplementedError(
            "real media decoding requires image/audio libraries not present "
            "in this environment; the Spark plumbing around this stub is real"
        )
    h = xxhash64_str(media_ref)
    stub_bytes = 1024 + pmod(h, 64 * 1024)
    feat_norm = (pmod(h >> 7, 10_000)) / 10_000.0
    return stub_bytes, feat_norm


def extract_media_features(documents: DataFrame, partitions: int = 32) -> DataFrame:
    """media spans -> per-ref features via Arrow-batched mapInPandas.

    Plan shape (the part that must be right at scale): posexplode keeps
    span order; repartition by xxhash64(media_ref) spreads refs evenly so
    a single media-heavy host cannot skew one task; the Python stage sees
    whole Arrow batches (vectorized), never single rows.
    """
    media = (
        documents.select(
            "doc_id", F.posexplode("spans").alias("span_idx", "span")
        )
        .filter(F.col("span.kind") != "text")
        .select(
            "doc_id",
            F.col("span.media_ref").alias("media_ref"),
            F.col("span.kind").alias("kind"),
        )
        .repartition(partitions, F.xxhash64("media_ref"))
    )

    def featurize(batches):
        import pandas as pd  # noqa: PLC0415 — executor-side import

        for pdf in batches:
            decoded = [_decode_stub(ref) for ref in pdf["media_ref"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "kind": pdf["kind"],
                    "stub_bytes": [d[0] for d in decoded],
                    "feat_norm": [d[1] for d in decoded],
                }
            )

    return media.mapInPandas(featurize, schema=FEATURES_SCHEMA)
