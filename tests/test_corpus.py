"""Corpus generator: determinism, span-sequence invariant, Spark parity.

The per-row span-sequence equality (kind, text, media_ref, order) is a
verified invariant per BASELINE.json input_hint.
"""

from __future__ import annotations

from web_crawler_spark.corpus import (
    CorpusParams,
    build_corpus_py,
    doc_id_for,
    documents_df_from_py,
    generate_documents_df,
)
from web_crawler_spark.functions.urls import extract_links_py, full_key_py

PARAMS = CorpusParams(n_docs=80)


def test_deterministic():
    a = build_corpus_py(PARAMS)
    b = build_corpus_py(PARAMS)
    assert a == b


def test_span_sequence_invariant():
    corpus = build_corpus_py(PARAMS)
    assert len(corpus) == PARAMS.n_docs
    for doc_id, spans in corpus.items():
        offs = [s["offset"] for s in spans]
        assert offs == sorted(offs) and len(set(offs)) == len(offs), doc_id
        for s in spans:
            if s["kind"] == "text":
                assert s["media_ref"] == ""
            else:
                assert s["kind"] in ("image", "video")
                assert s["text"] == "" and s["media_ref"].startswith("media://")


def test_links_canonicalize_into_url_space():
    """Every embedded link canonicalizes to some host index's doc_id
    (alive or dead) — no stray URLs escape the universe."""
    corpus = build_corpus_py(PARAMS)
    universe = {doc_id_for(i, PARAMS) for i in range(PARAMS.n_hosts)}
    n_links = 0
    for spans in corpus.values():
        for s in spans:
            if s["kind"] != "text":
                continue
            for raw in extract_links_py(s["text"]):
                assert full_key_py(raw) in universe, raw
                n_links += 1
    assert n_links > PARAMS.n_docs  # corpus is connected enough to crawl


def test_spark_generation_matches_python(spark):
    """Distributed mapInPandas generation == driver-side generation,
    row-for-row and span-for-span (the scale generation path is exact)."""
    corpus = build_corpus_py(PARAMS)
    from_py = {
        r["doc_id"]: [tuple(s) for s in r["spans"]]
        for r in documents_df_from_py(spark, corpus).collect()
    }
    from_spark = {
        r["doc_id"]: [tuple(s) for s in r["spans"]]
        for r in generate_documents_df(spark, PARAMS, partitions=4).collect()
    }
    assert from_py == from_spark


def test_roundtrip_through_parquet(spark, tmp_path):
    """documents survive write->read untouched (per-row span equality)."""
    corpus = build_corpus_py(PARAMS)
    df = documents_df_from_py(spark, corpus)
    path = str(tmp_path / "docs.parquet")
    df.write.parquet(path)
    back = {
        r["doc_id"]: [dict(s.asDict()) for s in r["spans"]]
        for r in spark.read.parquet(path).collect()
    }
    assert back == corpus
