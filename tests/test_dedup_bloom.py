"""Bloom seen-set prefilter (J1 stage 1): no false negatives, sane FPP,
and end-state equivalence of the bloom vs plain-join dedup paths."""

from __future__ import annotations

import numpy as np
import pytest

from tests.helpers import engine_state, good_seeds
from web_crawler_spark.config import CrawlConfig
from web_crawler_spark.corpus import CorpusParams, build_corpus_py, documents_df_from_py
from web_crawler_spark.engine import CrawlEngine
from web_crawler_spark.functions.xxh64 import xxhash64_str
from web_crawler_spark.operators.dedup import bloom_maybe_seen, build_bloom_bitmaps
from web_crawler_spark.store import SnapshotStore

CFG = CrawlConfig()


def test_no_false_negatives_and_low_fpp(spark):
    members = [xxhash64_str(f"member-{i}") for i in range(5000)]
    others = [xxhash64_str(f"other-{i}") for i in range(5000)]
    seen = spark.createDataFrame([(h,) for h in members], "url_hash long")
    bitmaps = build_bloom_bitmaps(seen, CFG)
    bcast = spark.sparkContext.broadcast(bitmaps)

    cand = spark.createDataFrame(
        [(h, "m") for h in members] + [(h, "o") for h in others],
        "child_hash long, kind string",
    )
    flagged = {
        (r.child_hash, r.kind): r.maybe_seen
        for r in bloom_maybe_seen(cand, bcast, CFG).collect()
    }
    # bloom property 1: every member is maybe_seen (no false negatives)
    assert all(flagged[(h, "m")] for h in members)
    # bloom property 2: false-positive rate is tiny at this load factor
    fp = sum(1 for h in others if flagged[(h, "o")])
    assert fp / len(others) < 0.01, f"FPP too high: {fp / len(others)}"


def test_empty_seen_set(spark):
    seen = spark.createDataFrame([], "url_hash long")
    bitmaps = build_bloom_bitmaps(seen, CFG)
    assert bitmaps == {}
    bcast = spark.sparkContext.broadcast(bitmaps)
    cand = spark.createDataFrame([(123,), (456,)], "child_hash long")
    rows = bloom_maybe_seen(cand, bcast, CFG).collect()
    assert not any(r.maybe_seen for r in rows)


def test_adaptive_sizing_no_false_negatives(spark):
    """n_seen-adaptive bitmaps (self-describing m_bits) keep the
    no-false-negative property and a bounded FPP at their design load."""
    n = 50_000
    members = [xxhash64_str(f"m{i}") for i in range(n)]
    others = [xxhash64_str(f"o{i}") for i in range(n)]
    seen = spark.createDataFrame([(h,) for h in members], "url_hash long")
    small = build_bloom_bitmaps(seen, CFG, n_seen=n)
    static = build_bloom_bitmaps(seen, CFG)
    # adaptive sizing actually changed the bitmap size vs the static guess
    assert len(next(iter(small.values()))) != len(next(iter(static.values())))
    bcast = spark.sparkContext.broadcast(small)
    cand = spark.createDataFrame(
        [(h, "m") for h in members] + [(h, "o") for h in others],
        "child_hash long, kind string",
    )
    flagged = {
        (r.child_hash, r.kind): r.maybe_seen
        for r in bloom_maybe_seen(cand, bcast, CFG).collect()
    }
    assert all(flagged[(h, "m")] for h in members)
    fp = sum(1 for h in others if flagged[(h, "o")])
    assert fp / n < 0.01, f"FPP too high: {fp / n}"


def test_probe_positions_distinct():
    """Double-hashing probes must not collapse onto one position."""
    from web_crawler_spark.operators.dedup import _probe_positions

    h = np.array([xxhash64_str(f"x{i}") for i in range(1000)], dtype=np.int64)
    p = _probe_positions(h, 2, 1 << 20)
    assert (p[0] != p[1]).mean() > 0.99


@pytest.mark.parametrize("depth", [2])
def test_bloom_path_equals_plain_join_path(spark, tmp_path, depth):
    """use_bloom_prefilter on/off produce bit-identical crawl state (the
    bloom is a pure physical optimization; exact join absorbs FPs)."""
    params = CorpusParams(n_docs=80)
    corpus = build_corpus_py(params)
    docs = documents_df_from_py(spark, corpus).cache()
    seed = good_seeds(corpus, CFG)[0]
    states = {}
    for label, cfg in {
        # bloom_min_seen=0 forces the prefilter on despite the tiny corpus
        # (the engine otherwise skips it below the threshold)
        "bloom": CrawlConfig(use_bloom_prefilter=True, bloom_min_seen=0),
        "plain": CrawlConfig(use_bloom_prefilter=False),
    }.items():
        store = SnapshotStore(tmp_path / label)
        eng = CrawlEngine(spark, store, docs, cfg)
        cid = eng.start_crawl(seed, depth, crawl_id="c")
        eng.run_crawl(cid)
        states[label] = engine_state(spark, store, cid)
    docs.unpersist()
    assert states["bloom"] == states["plain"]


def test_incremental_bloom_equals_full_build(spark):
    """ORing per-wave delta bitmaps == one full build at the same m_bits
    (bit-set union is exact), and membership stays false-negative-free."""
    from web_crawler_spark.operators.dedup import IncrementalBloom, _test_hashes

    all_keys = [xxhash64_str(f"k{i}") for i in range(30_000)]
    half1, half2 = all_keys[:15_000], all_keys[15_000:]
    df1 = spark.createDataFrame([(h,) for h in half1], "url_hash long")
    df2 = spark.createDataFrame([(h,) for h in half2], "url_hash long")
    dfa = spark.createDataFrame([(h,) for h in all_keys], "url_hash long")

    inc = IncrementalBloom.build(df1, CFG, n_seen=len(half1))
    inc.update(df2)
    full = IncrementalBloom.build(dfa, CFG, n_seen=len(half1))  # same sizing
    assert inc.m_bits == full.m_bits
    assert set(inc.bitmaps) == set(full.bitmaps)
    for b in inc.bitmaps:
        assert (inc.bitmaps[b] == full.bitmaps[b]).all(), f"bucket {b}"
    verdict = _test_hashes(
        inc.bitmaps, np.array(all_keys, dtype=np.int64), CFG
    )
    assert verdict.all()  # every inserted key is maybe_seen


def test_incremental_bloom_save_load_guard(tmp_path, spark):
    from web_crawler_spark.config import CrawlConfig as C
    from web_crawler_spark.operators.dedup import IncrementalBloom

    df = spark.createDataFrame([(xxhash64_str(f"k{i}"),) for i in range(1000)],
                               "url_hash long")
    inc = IncrementalBloom.build(df, C(), n_seen=1000)
    p = tmp_path / "bloom.npz"
    inc.save(p, wave=7)
    loaded = IncrementalBloom.load(p, C(), expect_wave=7)
    assert loaded is not None and loaded.m_bits == inc.m_bits
    for b in inc.bitmaps:
        assert (loaded.bitmaps[b] == inc.bitmaps[b]).all()
    # stale state (wrong wave) must be rejected -> full rebuild instead
    assert IncrementalBloom.load(p, C(), expect_wave=8) is None
    assert IncrementalBloom.load(tmp_path / "missing.npz", C(), 7) is None


def test_bloom_resume_with_persisted_state(spark, tmp_path):
    """Crash/resume across waves with incremental bloom forced on: resume
    loads (or safely rebuilds) state and the final crawl state matches
    the no-bloom twin bit-exactly."""
    params = CorpusParams(n_docs=80)
    corpus = build_corpus_py(params)
    docs = documents_df_from_py(spark, corpus).cache()
    cfg = CrawlConfig(use_bloom_prefilter=True, bloom_min_seen=0)
    seed = good_seeds(corpus, cfg)[0]
    store = SnapshotStore(tmp_path / "a")
    eng = CrawlEngine(spark, store, docs, cfg)
    cid = eng.start_crawl(seed, 3, crawl_id="c")
    eng.run_crawl(cid, max_waves=2)          # stop mid-crawl
    assert (store.wave_dir(cid, 2) / "bloom.npz").exists()
    eng2 = CrawlEngine(spark, store, docs, cfg)   # fresh engine => resume
    eng2.run_crawl(cid)
    plain_store = SnapshotStore(tmp_path / "b")
    eng3 = CrawlEngine(
        spark, plain_store, docs, CrawlConfig(use_bloom_prefilter=False)
    )
    cid3 = eng3.start_crawl(seed, 3, crawl_id="c")
    eng3.run_crawl(cid3)
    docs.unpersist()
    assert engine_state(spark, store, cid) == engine_state(spark, plain_store, cid3)
