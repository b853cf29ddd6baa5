"""Sequential oracle: structural invariants + state-machine rules.

The oracle is the executable deterministic spec (SURVEY.md §3.4); these
tests pin its own behavior so the Spark-parity suite compares against a
validated ground truth.
"""

from __future__ import annotations

import pytest

from web_crawler_spark.config import CrawlConfig
from web_crawler_spark.corpus import CorpusParams, build_corpus_py
from web_crawler_spark.functions.urls import normalize_url_py
from web_crawler_spark.oracle import (
    CANCELLED,
    COMPLETED,
    FAILED,
    PENDING,
    OracleCrawler,
)
from web_crawler_spark.sources.simulators import (
    dns_py,
    fetch_outcome_py,
    transient_fail_count_py,
)

PARAMS = CorpusParams(n_docs=120)
CFG = CrawlConfig()


@pytest.fixture(scope="module")
def corpus():
    return build_corpus_py(PARAMS)


def good_seeds(corpus, cfg=CFG, limit=10):
    out = []
    for did in corpus:
        name, _ = normalize_url_py(did)
        if dns_py(name, cfg)[0] and fetch_outcome_py(did, True, 0, cfg)[0]:
            out.append(did)
            if len(out) == limit:
                break
    return out


def test_basic_invariants(corpus):
    seed = good_seeds(corpus)[0]
    res = OracleCrawler(corpus, CFG).crawl(seed, 3)
    assert res.crawl_status == "completed"
    node_keys = set(res.nodes)
    for src, dst, _wave in res.edges:
        assert dst in node_keys
    # one in-edge per node (first-discoverer rule)
    assert len({d for _, d, _ in res.edges}) == len(res.edges)
    for k, n in res.nodes.items():
        assert 1 <= n.depth <= 3
        assert n.status in (COMPLETED, FAILED)
        assert k == n.http_type + n.name
        if n.depth == 3:  # leaf rule: born COMPLETED, never fetched
            assert n.status == COMPLETED and n.attempts == 0


def test_depth1_all_leaves(corpus):
    seed = good_seeds(corpus)[0]
    res = OracleCrawler(corpus, CFG).crawl(seed, 1)
    assert res.crawl_status == "completed"
    assert all(n.depth == 1 and n.status == COMPLETED for n in res.nodes.values())
    assert res.waves_run == 1  # nothing pending after seeding


def test_retry_state_machine(corpus):
    """URLs with transient-failure count>=max_attempts end FAILED with
    attempts==3; ones with 1-2 failures end COMPLETED/FAILED-by-children
    with the right attempts count (feeder/src/job.rs:97-133)."""
    seeds = good_seeds(corpus, limit=5)
    found_retry = found_dead = False
    for seed in seeds:
        res = OracleCrawler(corpus, CFG).crawl(seed, 4)
        for k, n in res.nodes.items():
            fail_n = transient_fail_count_py(k, CFG)
            has_doc = k in corpus
            if n.depth < 4:  # fetched at least once
                if not has_doc:
                    # 404 path: attempts incremented before the permanent-
                    # failure classification (feeder/src/job.rs:107-131)
                    assert n.status == FAILED and n.attempts == 1
                    found_dead = True
                elif fail_n >= CFG.max_attempts:
                    assert n.status == FAILED and n.attempts == CFG.max_attempts
                elif fail_n > 0:
                    assert n.attempts == fail_n
                    found_retry = True
    assert found_retry and found_dead  # corpus exercises both paths


def test_root_failure():
    corpus = build_corpus_py(PARAMS)
    res = OracleCrawler(corpus, CFG).crawl("HTTPS://NO-SUCH.BASE-9999.TEST", 3)
    assert res.crawl_status == "failed" and not res.nodes


def test_invalid_depth(corpus):
    with pytest.raises(ValueError):
        OracleCrawler(corpus, CFG).crawl("HTTPS://S00000.BASE-0000.TEST", 6)


def test_cancellation(corpus):
    seed = good_seeds(corpus)[0]
    full = OracleCrawler(corpus, CFG).crawl(seed, 4)
    part = OracleCrawler(corpus, CFG).crawl(seed, 4, cancel_after_wave=1)
    assert part.crawl_status == "cancelled"
    assert any(n.status == CANCELLED for n in part.nodes.values())
    assert not any(n.status == PENDING for n in part.nodes.values())
    # cancelled run saw a prefix of the full run's discoveries
    assert set(part.nodes) <= set(full.nodes)


def test_politeness_preserves_seen_set(corpus):
    """Budgeted crawl fetches fewer per wave but converges to the same
    final seen set and statuses (only wave assignment may differ)."""
    seed = good_seeds(corpus)[0]
    free = OracleCrawler(corpus, CFG).crawl(seed, 3)
    budgeted_cfg = CrawlConfig(host_budget_per_wave=2)
    slow = OracleCrawler(corpus, budgeted_cfg).crawl(seed, 3)
    assert set(slow.nodes) == set(free.nodes)
    assert slow.waves_run >= free.waves_run
    assert {k: n.status for k, n in slow.nodes.items()} == {
        k: n.status for k, n in free.nodes.items()
    }
    # budget actually deferred something at some wave
    per_wave = [m["fetched"] for m in slow.wave_metrics[1:]]
    assert len(per_wave) > len(free.wave_metrics) - 1


def test_crawl_isolation(corpus):
    """Two crawls over the same corpus share nothing (dedup scoped per
    crawl_id, feeder/src/job.rs:137-165)."""
    seeds = good_seeds(corpus, limit=2)
    r1 = OracleCrawler(corpus, CFG).crawl(seeds[0], 2, crawl_id="a")
    r2 = OracleCrawler(corpus, CFG).crawl(seeds[0], 2, crawl_id="b")
    assert {k: (n.depth, n.status) for k, n in r1.nodes.items()} == {
        k: (n.depth, n.status) for k, n in r2.nodes.items()
    }


def test_stats_consistency(corpus):
    seed = good_seeds(corpus)[0]
    res = OracleCrawler(corpus, CFG).crawl(seed, 3)
    st = res.stats()
    assert st["total"] == len(res.nodes)
    assert st["completed"] + st["failed"] == st["total"]
    assert st["max_depth"] <= 3
    assert res.derived_status() == "completed"
