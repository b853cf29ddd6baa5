"""Benchmark: headline crawl-engine run + operator queries.

Prints ONE JSON line:
  {"metric": "crawl_wall_sec", "value": <sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": <sf>,
   "crawl": {urls_processed, urls_per_sec, waves, nodes, edges},
   "cpus": N}

Env knobs:
  SPARK_GRAFT_SF_DIR   testdata dir for the operator queries
                       (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[N] parallelism (default 32) — run at 8 and
                       32 for the N-vs-4N scaling-efficiency evidence
  SPARK_GRAFT_NDOCS    synthetic corpus size for the crawl bench
                       (default 60000)
  SPARK_GRAFT_DEPTH    crawl depth (default 3)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
NDOCS = int(os.environ.get("SPARK_GRAFT_NDOCS", "200000"))
DEPTH = int(os.environ.get("SPARK_GRAFT_DEPTH", "7"))
# constant across parallelism levels: the scaling experiment varies ONLY
# the core count, keeping plan + task granularity identical
SHUFFLE = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "64"))
# stage-level profiling: set to a directory to enable the Spark event log
EVENTLOG = os.environ.get("SPARK_GRAFT_EVENTLOG", "")
# I/O placement.  This sandbox's VM disk measures ~10 MB/s (a dd of 1 GiB
# would not finish in 2 minutes) — pathologically slower than any real
# cluster storage, and the round-2 profile showed local[32] spending most
# of its wall blocked on shuffle + store writes to it.  tmpfs is the
# sandbox stand-in for real cluster storage: shuffle scratch is ephemeral
# by definition, and the snapshot store models a distributed FS / Iceberg
# warehouse.  Override with SPARK_GRAFT_LOCAL_DIR / SPARK_GRAFT_WORKDIR
# to measure the slow-disk configuration instead.
_SHM = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
LOCAL_DIR = os.environ.get("SPARK_GRAFT_LOCAL_DIR", f"{_SHM}/spark_graft_scratch")
WORKDIR = os.environ.get("SPARK_GRAFT_WORKDIR", f"{_SHM}/spark_graft_bench")
SKIP_QUERIES = os.environ.get("SPARK_GRAFT_SKIP_QUERIES", "") == "1"
# bloom A/B: distribution (partition_local | broadcast) and the activation
# threshold (set 0 to force the prefilter on for the A/B experiment)
BLOOM_DIST = os.environ.get("SPARK_GRAFT_BLOOM_DIST", "partition_local")
BLOOM_MIN_SEEN = int(os.environ.get("SPARK_GRAFT_BLOOM_MIN_SEEN", "5000000"))
# corpus physical layout: bucketed parquet table (the production-faithful
# shuffle-free fetch join) — DEFAULT since round 3: measured faster than
# the in-memory repartition+cache at 600k/local[32] (91.9 s vs 128.9 s;
# no corpus pages in the block store => less GC pressure) AND it is the
# layout the 100 TB design actually prescribes.  Set =0 for the cached
# in-memory corpus.
BUCKETED = os.environ.get("SPARK_GRAFT_BUCKETED", "1") == "1"
# politeness budget (stretches a crawl over many waves — the deep-crawl /
# compaction exercise) and corpus host fan-in
HOST_BUDGET = os.environ.get("SPARK_GRAFT_HOST_BUDGET", "")
URLS_PER_HOST = int(os.environ.get("SPARK_GRAFT_URLS_PER_HOST", "8"))
# corpus shape: fewer/lighter spans => lower out-degree => a >5M-URL
# frontier is reachable without 16x the link volume (the design-regime
# cell runs a 6M-doc corpus with spans_max=3)
SPANS_MAX = int(os.environ.get("SPARK_GRAFT_SPANS_MAX", "10"))
LINKS_PER_SPAN = int(os.environ.get("SPARK_GRAFT_LINKS_PER_SPAN", "10"))
# physical store compaction cadence (waves); empty = off
STORE_COMPACT = os.environ.get("SPARK_GRAFT_STORE_COMPACT", "")
# frontier-fold A/B: max updates rows folded via broadcast join (0 = the
# always-shuffled fold)
FOLD_BCAST = os.environ.get("SPARK_GRAFT_FOLD_BCAST", "")
# OPEN-corpus shape (bloom positive-regime experiment, round-5): a large
# dead-URL universe keeps waves fresh-heavy while the seen set crosses
# the bloom activation threshold — the closed-corpus default saturates
# (dup-dominated by ~5M seen, round-4's measured negative regime).  The
# production web IS the open shape: a 10^10-URL frontier never saturates
# its link universe.
DEAD_PCT = int(os.environ.get("SPARK_GRAFT_DEAD_PCT", "8"))
DUP_PCT = int(os.environ.get("SPARK_GRAFT_DUP_PCT", "12"))
HOT_PCT = int(os.environ.get("SPARK_GRAFT_HOT_PCT", "25"))

BENCH_QUERIES = [
    "progress_counts",
    "stats_distinct_max",
    "anti_join_seen_set",
    "left_outer_progress",
    "first_writer_dedup",
    "politeness_topk",
    "minhash_band_buckets",
    "token_count",
    "ann_cosine_topk",
    # the heaviest-plan LLM-pipeline operators (round-4 VERDICT #6): a
    # plan regression here must be visible between rounds
    "simhash_near_dup",
    "ann_lsh_topk",
    "embedding_near_dup_lsh",
    "media_features_real",
    # the exact shingle-join near-dup (round-5: gained spread_if_narrow)
    "jaccard_pairs",
]

# headline steal gate (round-4 VERDICT #3): the official artifact was
# captured at 61% CPU steal and misrepresented the engine by 2.2x.  The
# headline crawl is retried (waiting for a calm window between attempts)
# until its measured steal is below the gate; the lowest-steal attempt is
# reported either way, with every attempt's (wall, steal) in the JSON.
STEAL_GATE_PCT = float(os.environ.get("SPARK_GRAFT_STEAL_GATE", "5"))
STEAL_ATTEMPTS = int(os.environ.get("SPARK_GRAFT_STEAL_ATTEMPTS", "3"))
CALM_WAIT_SEC = int(os.environ.get("SPARK_GRAFT_CALM_WAIT", "240"))


def _cpu_stat() -> tuple[int, int]:
    """(busy_jiffies, steal_jiffies) from /proc/stat — this sandbox VM
    shows bursts of ~19% CPU steal from co-tenants; every measurement
    reports the steal share it ran under so noise is visible."""
    try:
        with open("/proc/stat") as f:
            v = list(map(int, f.readline().split()[1:]))
        steal = v[7] if len(v) > 7 else 0
        busy = v[0] + v[1] + v[2] + v[5] + v[6] + steal
        return busy, steal
    except (OSError, ValueError, IndexError):
        return 0, 0


def _steal_pct(before: tuple[int, int], after: tuple[int, int]) -> float:
    db, ds = after[0] - before[0], after[1] - before[1]
    return round(100.0 * ds / db, 2) if db > 0 else 0.0


def _wait_for_calm(max_wait_sec: float, target_pct: float, probe_sec: float = 8.0):
    """Block until a probe window shows steal <= target (or give up)."""
    waited = 0.0
    while waited < max_wait_sec:
        b = _cpu_stat()
        time.sleep(probe_sec)
        waited += probe_sec
        if _steal_pct(b, _cpu_stat()) <= target_pct:
            return



def main() -> None:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod
    from web_crawler_spark.config import CrawlConfig
    from web_crawler_spark.corpus import CorpusParams, doc_id_for, generate_documents_df
    from web_crawler_spark.engine import CrawlEngine
    from web_crawler_spark.store import SnapshotStore

    builder = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("web_crawler_spark-bench")
        .config("spark.sql.shuffle.partitions", str(SHUFFLE))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # coalesce by DATA SIZE, not default parallelism: late-crawl /
        # politeness-tail waves move a few KB through the same pipeline,
        # and parallelismFirst=true still launched ~32 near-empty tasks
        # per shuffle, ~19 stages/wave — task-launch overhead became the
        # whole wave (floor probe, BENCH/ANALYSIS.md round 4).  8 MB
        # advisory keeps big waves at full width (300 MB shuffle -> ~38
        # tasks) while empty waves collapse to 1 task.
        .config(
            "spark.sql.adaptive.coalescePartitions.parallelismFirst",
            os.environ.get("SPARK_GRAFT_AQE_PARALLELISM_FIRST", "false"),
        )
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            os.environ.get("SPARK_GRAFT_AQE_ADVISORY", "8m"),
        )
        .config("spark.ui.enabled", "false")
        # shuffle/broadcast/cache block codec.  Default lz4; zstd trades
        # CPU for fewer bytes through the (tmpfs = DRAM) shuffle path —
        # the candidate lever for the membw-bound wide legs (A/B knob).
        .config(
            "spark.io.compression.codec",
            os.environ.get("SPARK_GRAFT_IO_CODEC", "lz4"),
        )
        .config(
            "spark.shuffle.compress",
            os.environ.get("SPARK_GRAFT_SHUFFLE_COMPRESS", "true"),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.warehouse.dir", f"{WORKDIR}/warehouse")
    )
    java_opts = os.environ.get("SPARK_GRAFT_JAVA_OPTS", "")
    if java_opts:
        builder = builder.config("spark.driver.extraJavaOptions", java_opts)
    if EVENTLOG:
        Path(EVENTLOG).mkdir(parents=True, exist_ok=True)
        builder = builder.config("spark.eventLog.enabled", "true").config(
            "spark.eventLog.dir", f"file://{EVENTLOG}"
        )
    if LOCAL_DIR:
        Path(LOCAL_DIR).mkdir(parents=True, exist_ok=True)
        builder = builder.config("spark.local.dir", LOCAL_DIR)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    # ---- crawl-engine headline: synthetic corpus, multi-wave BFS ----
    # high out-degree + depth beyond the frontier's saturation point so
    # the run covers both regimes that matter at scale: exponential
    # expansion (waves dominated by extraction) and seen-set saturation
    # (waves dominated by dedup) — the bench measures frontier
    # throughput, not tiny-tree overhead.  max_crawl_depth is raised
    # above the reference's UI cap (5) for the throughput run only.
    params = CorpusParams(
        n_docs=NDOCS,
        urls_per_host=URLS_PER_HOST,
        links_per_span_max=LINKS_PER_SPAN,
        spans_max=SPANS_MAX,
        dead_link_pct=DEAD_PCT,
        dup_pct=DUP_PCT,
        hot_pct=HOT_PCT,
    )
    Path(WORKDIR).mkdir(parents=True, exist_ok=True)
    tmp = tempfile.mkdtemp(prefix="bench_run_", dir=WORKDIR)
    # the corpus is a pure function of (params) — cache it across runs so
    # a low-core run doesn't pay the Python generation again (generation
    # parallelism is the core count; 600k docs at 2 cores is ~12 min)
    corpus_path = (
        f"{WORKDIR}/corpus_{NDOCS}_{params.urls_per_host}_"
        f"{params.links_per_span_max}_{params.spans_max}_{params.dead_link_pct}"
        f"_{params.dup_pct}_{params.hot_pct}"
    )
    done_marker = Path(corpus_path + ".done")
    if not done_marker.exists():
        generate_documents_df(spark, params, partitions=max(CPUS * 2, 16)).write.mode(
            "overwrite"
        ).parquet(corpus_path)
        done_marker.touch()
    docs = spark.read.parquet(corpus_path)
    fleet_depth = int(os.environ.get("SPARK_GRAFT_FLEET_DEPTH", "3"))
    cfg = CrawlConfig(
        host_budget_per_wave=int(HOST_BUDGET) if HOST_BUDGET else None,
        store_compact_every_waves=int(STORE_COMPACT) if STORE_COMPACT else None,
        **(
            {"fold_broadcast_max_rows": int(FOLD_BCAST)} if FOLD_BCAST else {}
        ),
        max_crawl_depth=max(5, DEPTH, fleet_depth),
        use_bloom_prefilter=os.environ.get("SPARK_GRAFT_NO_BLOOM", "") != "1",
        bloom_distribution=BLOOM_DIST,
        bloom_min_seen=BLOOM_MIN_SEEN,
        compact_shuffle_keys=os.environ.get("SPARK_GRAFT_COMPACT_KEYS", "") == "1",
        compact_every_waves=int(os.environ.get("SPARK_GRAFT_COMPACT_WAVES", "8")),
    )
    store = SnapshotStore(f"{tmp}/store")
    fetch_join_info = {"corpus_layout": "cached_repartition"}
    if BUCKETED:
        from web_crawler_spark.sources.corpus_table import (
            count_exchanges,
            is_bucketed_scan,
            save_bucketed_corpus,
        )

        docs_b = save_bucketed_corpus(
            spark, docs, "corpus_bucketed_bench", n_buckets=SHUFFLE
        )
        # plan probe: the fetch join against the bucketed table must show
        # ONE Exchange (wave side only) and a bucketed corpus scan
        probe = spark.createDataFrame(
            [("c", doc_id_for(i, params)) for i in range(256)],
            "crawl_id string, full_key string",
        )
        # disable broadcast for the probe so the plan shows the big-wave
        # shape (sort-merge against the bucketed scan), not a tiny-probe
        # broadcast special case
        _abt = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = probe.join(docs_b, probe["full_key"] == docs_b["doc_id"], "left")
        fetch_join_info = {
            "corpus_layout": "bucketed_table",
            "n_buckets": SHUFFLE,
            "exchanges_in_fetch_join": count_exchanges(j),
            "bucketed_scan": is_bucketed_scan(j),
        }
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", _abt)
        eng = CrawlEngine(spark, store, docs_b, cfg, prepared=True)
    else:
        eng = CrawlEngine(spark, store, docs, cfg)

    # deterministic seed: first alive doc (root admission is retried over
    # candidates driver-side — pure python, no Spark)
    from web_crawler_spark.functions.urls import normalize_url_py
    from web_crawler_spark.sources.simulators import dns_py, fetch_outcome_py

    seed = None
    for i in range(200):
        did = doc_id_for(i, params)
        name, _ = normalize_url_py(did)
        if dns_py(name, cfg)[0] and fetch_outcome_py(did, True, 0, cfg)[0]:
            seed = did
            break
    assert seed is not None

    # warm-up: a small depth-2 crawl absorbs JVM JIT + python-worker
    # startup so the timed run measures steady-state throughput (crawl
    # isolation keeps it invisible to the bench crawl's state)
    wid = eng.start_crawl(seed, 2, crawl_id="warm")
    eng.run_crawl(wid)

    gate_attempts: list[dict] = []
    best = None  # (cid, wall, steal)
    for k in range(max(1, STEAL_ATTEMPTS)):
        _wait_for_calm(CALM_WAIT_SEC, target_pct=min(3.0, STEAL_GATE_PCT))
        s0 = _cpu_stat()
        t0 = time.time()
        cid_k = eng.start_crawl(seed, DEPTH, crawl_id=f"bench{k}")
        eng.run_crawl(cid_k)
        wall_k = time.time() - t0
        steal_k = _steal_pct(s0, _cpu_stat())
        gate_attempts.append(
            {"wall_sec": round(wall_k, 3), "cpu_steal_pct": steal_k}
        )
        if best is None or steal_k < best[2]:
            best = (cid_k, wall_k, steal_k)
        if steal_k <= STEAL_GATE_PCT:
            break
    cid, crawl_sec, crawl_steal = best

    m = store.metrics(spark, cid).filter("partition_id = -1").collect()
    urls_processed = sum(r.fetched for r in m)
    candidates = sum(r.candidates for r in m)
    links_seen = sum(r.candidates + r.dedup_dropped for r in m)
    # merge-on-read reconstruction cost: grows with delta file count,
    # bounded by compaction — reported so the deep-crawl cell can show it
    t_rec = time.time()
    nodes = store.frontier(spark, cid).count()
    reconstruct_sec = round(time.time() - t_rec, 3)
    edges = store.edges(spark, cid).count()

    def _bloom_summary(st, crawl_id):
        """Prefilter effectiveness from the committed wave summaries:
        (candidates tested, exact-join input rows, per-activated-wave
        breakdown).  The per-wave list is the adaptive-gate evidence —
        the store is deleted at bench exit, so it must ride the JSON.
        Zero/zero when the prefilter never activated (or summaries were
        compacted away)."""
        cands = maybe = 0
        waves = []
        for w in st.committed_waves(crawl_id):
            try:
                s = st.wave_summary(crawl_id, w)
            except (OSError, ValueError):
                continue
            c = int(s.get("bloom_candidates") or 0)
            m = int(s.get("bloom_maybe") or 0)
            cands += c
            maybe += m
            if c:
                waves.append(
                    {"wave": w, "candidates": c, "exact_join_input": m,
                     "cut_pct": round(100.0 * (1 - m / c), 2)}
                )
        return cands, maybe, waves

    bloom_cands, bloom_maybe, bloom_waves = _bloom_summary(store, cid)

    # ---- fleet throughput: N concurrent crawls share each wave job ----
    # the per-wave fixed machinery is paid once per FLEET, so per-crawl
    # cost collapses vs running the crawls serially (ANALYSIS lever #3)
    fleet_n = int(os.environ.get("SPARK_GRAFT_FLEET", "0"))
    fleet_out = None
    if fleet_n:
        seeds, i = [], 0
        while len(seeds) < fleet_n and i < NDOCS:
            did = doc_id_for(i, params)
            name, _ = normalize_url_py(did)
            if dns_py(name, cfg)[0] and fetch_outcome_py(did, True, 0, cfg)[0]:
                seeds.append(did)
            i += 1
        # serial baseline: one member crawl on its own
        store_s = SnapshotStore(f"{tmp}/store_single")
        eng_s = CrawlEngine(spark, store_s, eng.documents, cfg, prepared=True)
        t0 = time.time()
        sid = eng_s.start_crawl(seeds[0], fleet_depth, crawl_id="one")
        eng_s.run_crawl(sid)
        single_sec = time.time() - t0
        # the fleet, one wave-dir chain for all members
        store_f = SnapshotStore(f"{tmp}/store_fleet")
        eng_f = CrawlEngine(spark, store_f, eng.documents, cfg, prepared=True)
        fs0 = _cpu_stat()
        t0 = time.time()
        fid = eng_f.start_fleet(seeds, fleet_depth)
        eng_f.run_crawl(fid)
        fleet_sec = time.time() - t0
        fleet_steal = _steal_pct(fs0, _cpu_stat())
        fm = store_f.metrics(spark, fid).filter("partition_id = -1").collect()
        f_fetched = sum(r.fetched for r in fm)
        f_links = sum(r.candidates + r.dedup_dropped for r in fm)
        fb_cands, fb_maybe, fb_waves = _bloom_summary(store_f, fid)
        t_rec = time.time()
        f_nodes = store_f.frontier(spark, fid).count()
        f_rec_sec = round(time.time() - t_rec, 3)
        fleet_out = {
            "frontier_rows": int(f_nodes),
            "frontier_reconstruct_sec": f_rec_sec,
            **(
                {
                    "bloom_candidates_tested": fb_cands,
                    "bloom_exact_join_input": fb_maybe,
                    "bloom_join_input_cut_pct": round(
                        100.0 * (1 - fb_maybe / fb_cands), 2
                    ),
                    "bloom_waves": fb_waves,
                }
                if fb_cands
                else {}
            ),
            "n_crawls": len(seeds),
            "depth": fleet_depth,
            "waves": len(fm),
            "urls_fetched": int(f_fetched),
            "links_deduped": int(f_links),
            "wall_sec": round(fleet_sec, 3),
            "single_crawl_wall_sec": round(single_sec, 3),
            "per_crawl_sec": round(fleet_sec / len(seeds), 3),
            "fleet_speedup_vs_serial": round(
                len(seeds) * single_sec / fleet_sec, 2
            ),
            "urls_fetched_plus_deduped_per_sec": round(
                (f_fetched + f_links) / fleet_sec, 2
            ),
            "cpu_steal_pct": fleet_steal,
        }

    # ---- operator queries over the driver testdata ----
    sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1])
    qs = entry_mod.queries()
    qtimes: dict[str, float] = {}
    q_s0 = _cpu_stat()
    for name in BENCH_QUERIES if not SKIP_QUERIES else []:
        t = time.time()
        qs[name](spark, SF_DIR).collect()
        qtimes[name] = round(time.time() - t, 3)
    queries_steal = _steal_pct(q_s0, _cpu_stat())

    out = {
        "metric": "crawl_wall_sec",
        "value": round(crawl_sec, 3),
        "unit": "sec",
        "queries": qtimes,
        "queries_cpu_steal_pct": queries_steal,
        "sf": sf,
        "cpus": CPUS,
        "bloom": {"distribution": BLOOM_DIST, "min_seen": BLOOM_MIN_SEEN},
        "fetch_join": fetch_join_info,
        "crawl": {
            "n_docs": NDOCS,
            "depth": DEPTH,
            "waves": len(m),
            "urls_fetched": int(urls_processed),
            "links_deduped": int(links_seen),
            "fresh_candidates": int(candidates),
            # the BASELINE metric: URLs fetched + link occurrences pushed
            # through the two-stage dedup, per second of wall time
            "urls_fetched_plus_deduped_per_sec": round(
                (urls_processed + links_seen) / crawl_sec, 2
            ),
            "urls_per_sec": round(urls_processed / crawl_sec, 2),
            "nodes": int(nodes),
            "edges": int(edges),
            "frontier_reconstruct_sec": reconstruct_sec,
            "cpu_steal_pct": crawl_steal,
        },
        "steal_gated": crawl_steal <= STEAL_GATE_PCT,
        "steal_gate_pct": STEAL_GATE_PCT,
        "steal_gate_attempts": gate_attempts,
    }
    if bloom_cands:
        out["crawl"]["bloom_candidates_tested"] = bloom_cands
        out["crawl"]["bloom_exact_join_input"] = bloom_maybe
        out["crawl"]["bloom_join_input_cut_pct"] = round(
            100.0 * (1 - bloom_maybe / bloom_cands), 2
        )
        out["crawl"]["bloom_waves"] = bloom_waves
    if STORE_COMPACT:
        base = store.current_base(cid)
        out["crawl"]["store"] = {
            "compact_every_waves": int(STORE_COMPACT),
            "live_wave_dirs": len(store.committed_waves(cid)),
            "base_upto_wave": base[0] if base else None,
        }
    if fleet_out is not None:
        out["fleet"] = fleet_out
    print(json.dumps(out))
    spark.stop()
    shutil.rmtree(tmp, ignore_errors=True)  # tmpfs scratch — free the RAM


if __name__ == "__main__":
    main()
