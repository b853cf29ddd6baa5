"""Wave-synchronous BFS crawl engine — the Spark-native reference rewrite.

One *wave* replaces the reference's entire claim/fetch/dedup/merge loop
(/root/reference/feeder/src/job.rs:263-351) for the whole eligible frontier
at once, as a single declarative DataFrame pipeline:

    eligible  = frontier WHERE status='PENDING'          [+ politeness top-B]
    fetched   = eligible LEFT JOIN documents ON full_key = doc_id
    outcomes  = deterministic fetch simulation (404 / timeout+retry / ok)
    links     = posexplode(text spans) -> regexp_extract_all -> posexplode
    local     = per-parent distinct on canonical key, min in-page position
    fresh     = bloom prefilter (stage 1), then exact left join vs the
                frontier on (crawl_id,url_hash,full_key) => is_fresh flag
    admitted  = DNS simulation + robots filter (column expressions only)
    winners   = row_number() OVER (PARTITION BY child ORDER BY parent,pos)=1
    commit    = inserts(children) + updates(parent transitions) + edges +
                metrics, one atomic snapshot                 [store.py]

Everything between `eligible` and `commit` is one Catalyst plan per output:
JVM-side expressions throughout (regexp_extract_all / xxhash64 / split /
filter — zero Python in the hot path), shuffles only at the anti-join, the
winner window, and the parent-status aggregation.

Semantics match the sequential oracle (`web_crawler_spark.oracle`) exactly
— same simulators, same tie-break order (parent canonical key, then
in-page position), same parent status rule:

    FAILED  iff fetch ok AND some candidate was dropped by DNS/robots
            AND this parent won no admitted child        (job.rs:340-343)
    COMPLETED otherwise on fetch ok                      (job.rs:289-293)

(the "won no admitted child" clause is the wave-parallel restatement of
"all *remaining* children dropped" under sequential first-writer-wins —
children already merged by an earlier same-wave parent leave the later
parent's candidate set, see oracle.py module docstring).

Scale design (10^10-URL frontier, 1000 executors):

* frontier/edges grow append-only; per-wave I/O ∝ wave size (store.py).
* the documents join and the seen-set anti-join both key on
  ``xxhash64(full_key)`` — bucket both tables by it in production so the
  joins are co-partitioned (no shuffle of the 100 TB side).
* the politeness top-B per host is computed with a two-stage window
  (salted local top-B, then exact top-B over survivors): a hot host with
  10^8 pending URLs never lands in a single window partition (axis B).
* per-wave metrics carry spark_partition_id lineage (north rule).
"""

from __future__ import annotations

import logging
import os
import shutil
import time
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation, SparkSession, Window
from pyspark.sql import functions as F

from .config import CrawlConfig
from .functions.urls import URL_REGEX_JAVA, normalize_cols, normalize_url_py
from .sources.simulators import (
    dns_cols,
    dns_cols_unrolled,
    dns_pandas_udf,
    dns_py,
    fetch_outcome_cols,
    fetch_outcome_py,
)
from .store import FRONTIER_SCHEMA, METRICS_SCHEMA, SnapshotStore

log = logging.getLogger(__name__)

# adaptive bloom gate: a wave must test at least this many candidates
# before its measured cut can switch the prefilter off — tail waves with
# a handful of candidates would otherwise noise-trip the sticky gate
BLOOM_GATE_MIN_SAMPLE = 1024

# per-wave phase timers (serial-floor attribution; prints one line per
# wave to the log — measurement only, zero cost when off)
WAVE_TIMERS = os.environ.get("SPARK_GRAFT_WAVE_TIMERS", "") == "1"

PENDING, COMPLETED, FAILED, CANCELLED = "PENDING", "COMPLETED", "FAILED", "CANCELLED"

# posexplode link index < 100000 per span by construction (pages are bounded)
_POS_STRIDE = 100_000

# superset schema of the single-job union delta write (inserts carry the
# full frontier row; edges use src/dst; updates a subset) — missing
# columns ride as typed nulls, pruned again by the per-kind readers
_UNION_COLS: list[tuple[str, str]] = [
    (f.name, f.dataType.simpleString()) for f in FRONTIER_SCHEMA.fields
] + [("src", "string"), ("dst", "string")]


def _host_col(name: F.Column) -> F.Column:
    """Politeness/robots host: registrable base = last two labels, port
    stripped (must match ``oracle._host_of`` exactly)."""
    bare = F.split(name, ":").getItem(0)
    return F.array_join(F.slice(F.split(bare, r"\."), -2, 2), ".")


@dataclass
class WaveResult:
    wave: int
    fetched: int
    ok: int
    failed: int
    timeouts: int
    candidates: int
    dedup_dropped: int
    dns_dropped: int
    children: int
    pending_after: int
    elapsed_ms: int
    # wave-arithmetic inputs for the driver's pending/seen bookkeeping
    # (no per-wave frontier count job): parents that stayed PENDING for a
    # retry, and children born PENDING (non-leaf)
    parent_retries: int = 0
    children_pending: int = 0
    # PENDING rows of individually-cancelled fleet members flipped to
    # CANCELLED by this wave's updates delta
    cancelled: int = 0
    # bloom prefilter effectiveness (0 when the prefilter is dormant):
    # candidate rows tested, and how many were maybe-seen — i.e. the
    # INPUT of the stage-2 exact join; bloom-off waves send ALL
    # candidates there.  These ride the commit summary so a bench can
    # report the measured join-input reduction in the design regime.
    bloom_candidates: int = 0
    bloom_maybe: int = 0


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        store: SnapshotStore,
        documents: DataFrame,
        cfg: CrawlConfig | None = None,
        robots: DataFrame | None = None,
        prepared: bool = False,
    ) -> None:
        self.spark = spark
        self.store = store
        self.cfg = cfg or CrawlConfig()
        # prune to (doc_id, spans), hash-partition by the join key, cache:
        # every wave's fetch join then shuffles only the wave side.  At
        # production scale the same property comes from bucketing the
        # Iceberg documents table by xxhash64(doc_id) instead of caching.
        # prepared=True: caller passes another engine's already-pruned,
        # partitioned, persisted corpus — avoids caching it twice.
        if prepared:
            self.documents = documents
        else:
            n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
            self.documents = (
                documents.select("doc_id", "spans")
                .repartition(n_part, "doc_id")
                .persist()
            )
        self.robots = robots  # columns: host, disallowed
        # larger Arrow batches for the narrow bloom/DNS UDF stages: fewer
        # batch boundaries => better JVM<->Python pipelining per task
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # PySpark wraps every DataFrame/Column API call in a call-site
        # capture for error context (`pyspark.errors.utils._with_origin`):
        # an inspect stack walk plus 2-3 extra py4j round-trips PER CALL
        # to push the origin into the JVM thread-local.  Profiled at ~65%
        # of the wave loop's py4j traffic (29.3k -> 8.9k round-trips per
        # 9-wave crawl with the union-cols cache below,
        # scripts/profile_wave_plan.py) — a pure driver-
        # serial tax on the per-wave plan-construction floor.  The public
        # gate `spark.python.sql.dataFrameDebugging.enabled` is a STATIC
        # conf (runtime conf.set raises CANNOT_MODIFY_CONFIG), and the
        # engine receives an already-built session — so flip the
        # module-level cache the wrapper consults instead; it exists
        # precisely to make this check cheap and is only ever filled
        # from that conf.
        if self.cfg.disable_df_debugging:
            try:
                import pyspark.errors.utils as _peu

                _peu._enable_debugging_cache = False
            except Exception:
                pass  # best-effort: older/newer PySpark layouts keep working
        # constant unresolved column-expression trees, built ONCE per
        # engine: Column objects are immutable and reusable across waves,
        # and re-deriving them per wave (the DNS when-chain alone is
        # hundreds of py4j calls) was a measured slice of the ~4.7k py4j
        # round-trips/wave serial floor (BENCH/ANALYSIS.md round 4).
        self._x = self._build_static_exprs()
        # per-(kind, input-columns) cache for _as_union's lifted column
        # lists: the three delta branches have fixed schemas per engine,
        # and rebuilding ~50 Column objects per wave is py4j round-trips
        # on the serial path for identical immutable trees
        self._union_cols_cache: dict = {}

    def _build_static_exprs(self) -> dict:
        cfg = self.cfg
        x: dict = {}
        x["fo"] = fetch_outcome_cols(
            F.col("full_key"), F.col("doc_id").isNotNull(), F.col("attempts"), cfg
        )
        if cfg.dns_impl == "pandas":
            x["dns_struct"] = dns_pandas_udf(cfg)(F.col("child_name"))
        else:
            dns_fn = dns_cols if cfg.dns_impl == "expr" else dns_cols_unrolled
            x["dns"] = dns_fn(F.col("child_name"), cfg)
        x["norm"] = normalize_cols(F.col("raw"))
        x["text_spans"] = F.filter(F.col("spans"), lambda s: s["kind"] == "text")
        x["winner_w"] = Window.partitionBy("crawl_id", "child_full").orderBy(
            "parent_key", "pos"
        )
        x["host"] = _host_col(F.col("name"))
        x["salt"] = F.pmod(F.col("url_hash"), F.lit(cfg.politeness_salt))
        x["elig_w1"] = Window.partitionBy("crawl_id", "host", "salt").orderBy(
            "full_key"
        )
        x["elig_w2"] = Window.partitionBy("crawl_id", "host").orderBy("full_key")
        x["child_http"] = F.when(
            F.col("child_full").startswith("HTTPS://"), F.lit("HTTPS://")
        ).otherwise(F.lit("HTTP://"))
        x["child_name"] = F.regexp_replace(F.col("child_full"), "^HTTPS?://", "")
        x["agg_cols"] = [
            F.min("pos").alias("pos"),
            F.count("*").alias("n_raw"),
            F.min("parent_depth").alias("parent_depth"),
            F.min("requested_depth").alias("requested_depth"),
            F.min("latency_ms").alias("latency_ms"),
        ]
        new_attempts = F.when(
            ~F.col("fetch_ok"), F.col("attempts") + 1
        ).otherwise(F.col("attempts"))
        x["new_attempts"] = new_attempts
        x["status_expr"] = (
            F.when(F.col("sim_status") == 404, F.lit(FAILED))  # 4xx permanent
            .when(
                ~F.col("fetch_ok"),
                F.when(
                    new_attempts >= F.lit(cfg.max_attempts), F.lit(FAILED)
                ).otherwise(F.lit(PENDING)),  # retry next wave
            )
            .when(F.col("n_wins") > 0, F.lit(COMPLETED))
            .when(F.col("n_bad") > 0, F.lit(FAILED))  # all-dropped rule
            .otherwise(F.lit(COMPLETED))  # no candidates / all taken earlier
        )
        return x

    # ------------------------------------------------------------------
    # crawl lifecycle (reference: POST /api/v1/crawls, routes/crawl.rs:31-139)
    # ------------------------------------------------------------------
    def start_crawl(
        self, seed_url: str, requested_depth: int, crawl_id: str | None = None
    ) -> str:
        if not 1 <= requested_depth <= self.cfg.max_crawl_depth:
            raise ValueError(
                f"depth must be 1..{self.cfg.max_crawl_depth} (crawl.rs:36-42)"
            )
        crawl_id = crawl_id or str(uuid.uuid4())
        name, proto = normalize_url_py(seed_url)
        seed_key = proto + name

        # root admission runs driver-side with the same pure simulators the
        # executors use (manager fetches the root once, no retry; DNS or
        # fetch failure fails crawl creation — crawl.rs:45-83)
        dns_ok, domain, ip = dns_py(name, self.cfg)
        has_doc = seed_key in self._docs_present([seed_key])
        fetch_ok, sim_status, _ = fetch_outcome_py(seed_key, has_doc, 0, self.cfg)
        meta = {
            "crawl_id": crawl_id,
            "seed_url": seed_url,
            "seed_key": seed_key,
            "name": name,
            "http_type": proto,
            "domain": domain,
            "ip": ip,
            "requested_depth": requested_depth,
            "created_at": time.time(),
            "status": "running",
        }
        if not dns_ok or not fetch_ok:
            meta["status"] = "failed"
            meta["fail_reason"] = f"root fetch/dns failed (status={sim_status})"
            self.store.write_crawl_meta(meta)
            return crawl_id
        self.store.write_crawl_meta(meta)

        # wave 0: seed expansion (manager path — no retries, no parent
        # status bookkeeping, empty seen set, no dedup beyond MERGE collapse)
        seed_df = self.spark.createDataFrame(
            [(crawl_id, seed_key, name, proto, 0, requested_depth, 0)],
            "crawl_id string, full_key string, name string, http_type string, "
            "depth int, requested_depth int, attempts int",
        )
        self._run_wave(crawl_id, 0, seed_df, seen=None, is_root=True)
        return crawl_id

    def start_fleet(
        self,
        seed_urls: list[str],
        requested_depth: int,
        fleet_id: str | None = None,
    ) -> str:
        """Batched multi-crawl seeding: one wave job serves the whole
        fleet, so the per-wave fixed machinery (job barriers, commit,
        frontier fold) is paid once per fleet instead of once per crawl
        (round-1 ANALYSIS lever #3).  Every DataFrame op in the wave
        pipeline is already keyed by crawl_id — dedup, windows, parent
        aggregation, politeness — so member crawls stay fully isolated
        (same guarantee as the reference's per-crawl_id scoping,
        feeder/src/job.rs:137-165).

        The fleet's snapshots live under one wave-dir chain keyed by
        ``fleet_id``; per-member state is the ``crawl_id`` column.  Run
        with ``run_crawl(fleet_id)``; read one member's frontier with
        ``store.frontier(spark, fleet_id).filter(col('crawl_id') == ...)``.
        """
        if not 1 <= requested_depth <= self.cfg.max_crawl_depth:
            raise ValueError(
                f"depth must be 1..{self.cfg.max_crawl_depth} (crawl.rs:36-42)"
            )
        fleet_id = fleet_id or f"fleet-{uuid.uuid4()}"
        norm = [normalize_url_py(u) for u in seed_urls]
        keys = [proto + name for name, proto in norm]
        # ONE existence-check job for all roots (not one isEmpty per seed)
        present = self._docs_present(keys)
        rows, members = [], []
        registry: dict[str, dict] = {}
        for i, (seed_url, (name, proto)) in enumerate(zip(seed_urls, norm)):
            crawl_id = f"{fleet_id}-c{i:05d}"
            seed_key = proto + name
            dns_ok, domain, ip = dns_py(name, self.cfg)
            fetch_ok, sim_status, _ = fetch_outcome_py(
                seed_key, seed_key in present, 0, self.cfg
            )
            meta = {
                "crawl_id": crawl_id,
                "fleet_id": fleet_id,
                "seed_url": seed_url,
                "seed_key": seed_key,
                "name": name,
                "http_type": proto,
                "domain": domain,
                "ip": ip,
                "requested_depth": requested_depth,
                "created_at": time.time(),
                "status": "running",
            }
            if not dns_ok or not fetch_ok:
                meta["status"] = "failed"
                meta["fail_reason"] = f"root fetch/dns failed (status={sim_status})"
            else:
                rows.append(
                    (crawl_id, seed_key, name, proto, 0, requested_depth, 0)
                )
            registry[crawl_id] = meta
            members.append(crawl_id)
        # ONE registry write for the whole fleet (round-2 wrote one
        # crawl.json per member driver-side — 2,000 members = 2,000 file
        # round-trips before the first wave; the registry is a single
        # atomic JSON the per-member read/write APIs route through)
        self.store.write_member_metas(fleet_id, registry)
        self.store.write_crawl_meta(
            {
                "crawl_id": fleet_id,
                "is_fleet": True,
                "members": members,
                "seed_url": "",
                "seed_key": "",
                "requested_depth": requested_depth,
                "created_at": time.time(),
                "status": "running" if rows else "failed",
            }
        )
        if rows:
            seed_df = self.spark.createDataFrame(
                rows,
                "crawl_id string, full_key string, name string, http_type string, "
                "depth int, requested_depth int, attempts int",
            )
            self._run_wave(
                fleet_id, 0, seed_df, seen=None, is_root=True,
                root_fetched=len(rows),
            )
        return fleet_id

    def cancel_crawl(self, crawl_id: str) -> None:
        """U3: flag the crawl; the wave loop turns PENDING into CANCELLED
        before the next wave (crawl_service.rs:219-235)."""
        meta = self.store.read_crawl_meta(crawl_id)
        if meta["status"] == "running":
            meta["status"] = "cancelling"
            self.store.write_crawl_meta(meta)

    def run_crawl(self, crawl_id: str, max_waves: int | None = None) -> dict:
        """Run (or resume) the wave loop until no PENDING URLs remain.

        Resumable: starts after the last committed snapshot; partial wave
        directories from a crash are dropped and the wave re-runs
        deterministically (ST2/ST3 analogue, strictly stronger).
        """
        meta = self.store.read_crawl_meta(crawl_id)
        if meta["status"] in ("failed", "cancelled", "completed"):
            return meta
        from concurrent.futures import ThreadPoolExecutor

        from .operators.dedup import BloomState, BroadcastBloom

        self.store.clean_uncommitted(crawl_id)
        last_wave = self.store.last_committed_wave(crawl_id)
        wave = last_wave + 1
        bloom_root = self.store.crawl_dir(crawl_id) / "bloom"
        partition_local = self.cfg.bloom_distribution == "partition_local"

        waves_done = 0
        frontier: DataFrame | None = None
        # previous frontier generation: unpersisted only once the NEXT
        # generation's materialization (count_fut) has resolved — its
        # cache feeds that fold's lineage
        old_frontier: DataFrame | None = None
        count_fut = None  # pending (n_rows, n_pending) job for `frontier`
        # crawl-level pool: the wave's union write, the next frontier's
        # materialization job, and (bloom path) state updates overlap on it
        pool = ThreadPoolExecutor(max_workers=4)
        n_seen = n_pending = 0
        bloom = None  # BloomState | BroadcastBloom | None
        # adaptive payoff gate (cfg.bloom_min_cut_frac): sticky-off once
        # a measured wave shows the prefilter certifying almost nothing —
        # in a BFS the duplicate fraction of candidates only grows as the
        # frontier converges, so a wave that cannot pay never pays again.
        # The trip is PERSISTED in the crawl meta (round-4 ADVICE): without
        # it every resume reset the gate, triggering a full O(frontier)
        # BloomState rebuild before the gate re-tripped one wave later —
        # repeated wasted scans in exactly the dup-dominated regime the
        # gate exists for.
        bloom_pays = not meta.get("bloom_gate_tripped")

        def _resolve_counts() -> None:
            """Block on the pending frontier-count job (if any), validate
            the driver's wave arithmetic against the observed counts, and
            release the superseded frontier cache.  Called lazily — from
            inside the next wave right before its first Spark action — so
            the count job overlaps the driver-side planning of that wave
            (the per-wave serial floor is the pre-saturation scaling
            constraint, BENCH/BASELINE.md)."""
            nonlocal count_fut, n_seen, n_pending, old_frontier
            if count_fut is None:
                return
            obs_rows, obs_pending = count_fut.result()
            count_fut = None
            if obs_pending != n_pending or obs_rows != n_seen:
                # the observed counts from the merge job are authoritative;
                # the arithmetic twin is a live invariant check — log
                # loudly and continue on the observed values (a bare
                # assert vanished under -O and aborted the whole crawl
                # on a driver-side bookkeeping slip, round-2 ADVICE)
                log.error(
                    "frontier arithmetic (rows=%d pending=%d) != observed "
                    "(rows=%d pending=%d) — engine bookkeeping bug, "
                    "continuing on observed",
                    n_seen, n_pending, obs_rows, obs_pending,
                )
                n_seen, n_pending = obs_rows, obs_pending
            if old_frontier is not None:
                old_frontier.unpersist()
                old_frontier = None

        try:
            while True:
                meta = self.store.read_crawl_meta(crawl_id)
                if meta["status"] == "cancelling":
                    _resolve_counts()
                    self._cancel_wave(crawl_id, wave)
                    meta["status"] = "cancelled"
                    self.store.write_crawl_meta(meta)
                    if meta.get("is_fleet"):  # members follow the fleet

                        def _cancel_all(reg: dict) -> None:
                            for m in reg.values():
                                if m["status"] in ("running", "cancelling"):
                                    m["status"] = "cancelled"

                        self.store.update_member_metas(crawl_id, _cancel_all)
                    return meta
                if max_waves is not None and waves_done >= max_waves:
                    return meta

                # the frontier lives cached across waves: loaded from the
                # snapshot store once (resume point), then folded forward
                # with each wave's own deltas — per-wave I/O stays O(wave),
                # not O(crawl) (the in-memory twin of Iceberg merge-on-read)
                if frontier is None:
                    frontier, count_fn = self._prepare_frontier(
                        self.store.frontier(self.spark, crawl_id)
                    )
                    n_seen, n_pending = count_fn()  # no overlap available yet
                    if last_wave and partition_local and bloom_pays:
                        # resume: reuse persisted per-bucket state only if
                        # its manifest matches the last committed wave
                        # (BroadcastBloom is never persisted — rebuilt).
                        # Skipped entirely when the persisted gate already
                        # tripped: the on-disk state is stale by design.
                        bloom = BloomState.load(
                            bloom_root, self.cfg, expect_wave=last_wave
                        )

                # individually-cancelled fleet members (round-2 ADVICE:
                # these were silently ignored): their PENDING rows are
                # excluded from eligibility and flipped to CANCELLED by
                # the NEXT wave's own updates delta — no extra snapshot,
                # so BFS wave numbering (and oracle parity for the other
                # members) is untouched.
                cancel_ids: list[str] = []
                if meta.get("is_fleet"):
                    reg = self.store.read_member_metas(crawl_id)
                    cancel_ids = sorted(
                        m for m, v in reg.items() if v["status"] == "cancelling"
                    )

                if n_pending == 0:
                    # confirm the arithmetic with the observed count before
                    # declaring completion (resolves the deferred job)
                    _resolve_counts()
                if n_pending == 0:
                    meta["status"] = "completed"
                    self.store.write_crawl_meta(meta)
                    if meta.get("is_fleet"):  # batch member completion

                        def _complete_all(reg: dict) -> None:
                            for m in reg.values():
                                if m["status"] == "running":
                                    m["status"] = "completed"
                                elif m["status"] == "cancelling":
                                    m["status"] = "cancelled"  # nothing pending

                        self.store.update_member_metas(crawl_id, _complete_all)
                    return meta
                # incremental bloom lifecycle: build once the seen set is
                # worth prefiltering, grow by full rebuild when outgrown;
                # per-wave maintenance is an O(wave) delta update inside
                # _run_wave instead of the O(crawl) frontier re-scan
                use_bloom = (
                    self.cfg.use_bloom_prefilter
                    and bloom_pays
                    and n_seen >= self.cfg.bloom_min_seen
                )
                if use_bloom and (bloom is None or bloom.needs_rebuild(n_seen)):
                    _resolve_counts()  # the build job scans the frontier
                    seen_hashed = frontier.select(
                        F.xxhash64("crawl_id", "full_key").alias("url_hash")
                    )
                    if partition_local:
                        # state as of the last committed wave (= wave-1)
                        bloom = BloomState.build(
                            seen_hashed, self.cfg, n_seen, bloom_root, wave - 1
                        )
                    else:
                        bloom = BroadcastBloom.build(seen_hashed, self.cfg, n_seen)
                elif not use_bloom:
                    bloom = None
                eligible = self._eligible(
                    frontier, n_pending, exclude_crawl_ids=cancel_ids
                )
                result, nxt = self._run_wave(
                    crawl_id, wave, eligible, seen=frontier, is_root=False,
                    bloom=bloom, cancel_ids=cancel_ids,
                    prev_frontier=frontier,
                    checkpoint=(wave % self.cfg.compact_every_waves == 0),
                    frontier_resolve=_resolve_counts, pool=pool,
                )
                if cancel_ids:  # the wave committed their CANCELLED rows
                    # re-read + targeted mutation, NOT a write-back of the
                    # pre-wave `reg` snapshot: a member cancelled DURING
                    # the wave (from another thread) must not be reverted
                    # to 'running' by a stale whole-dict write (round-3
                    # ADVICE lost-update race)

                    def _mark_cancelled(r: dict) -> None:
                        for m in cancel_ids:
                            if m in r:
                                r[m]["status"] = "cancelled"

                    self.store.update_member_metas(crawl_id, _mark_cancelled)
                # pending/seen bookkeeping by WAVE ARITHMETIC (validated
                # against the merge job's observed counts when the deferred
                # count resolves): every eligible parent left PENDING except
                # retries; children are born PENDING unless leaves;
                # politeness-deferred parents stayed PENDING untouched;
                # cancelled members' rows left PENDING.
                n_pending = (
                    (n_pending - result.fetched - result.cancelled)
                    + result.parent_retries
                    + result.children_pending
                )
                n_seen = n_seen + result.children
                # adaptive payoff gate: judge on a measured wave (sample
                # floor guards tiny tail waves from noise-tripping it)
                if (
                    bloom_pays
                    and self.cfg.bloom_min_cut_frac > 0
                    and result.bloom_candidates >= BLOOM_GATE_MIN_SAMPLE
                ):
                    cut = 1.0 - result.bloom_maybe / result.bloom_candidates
                    if cut < self.cfg.bloom_min_cut_frac:
                        log.info(
                            "bloom prefilter off for crawl %s: wave %d cut "
                            "%.2f%% of %d candidates < min %.1f%% — "
                            "dup-dominated regime, stage-2 exact join alone",
                            crawl_id, wave, 100 * cut,
                            result.bloom_candidates,
                            100 * self.cfg.bloom_min_cut_frac,
                        )
                        bloom_pays = False
                        bloom = None
                        # persist the trip so a resume neither rebuilds
                        # the state nor re-pays the one-wave measurement;
                        # the stale on-disk bucket files go with it
                        meta["bloom_gate_tripped"] = wave
                        self.store.write_crawl_meta(meta)
                        shutil.rmtree(bloom_root, ignore_errors=True)
                # the folded next frontier was constructed INSIDE the wave;
                # its materialization job is still running on the pool and
                # resolves lazily (next wave's first action / compaction /
                # completion) — the job overlaps this driver bookkeeping
                # AND the next wave's plan construction
                old_frontier = frontier
                frontier, count_fut = nxt
                if (
                    self.cfg.store_compact_every_waves
                    and wave % self.cfg.store_compact_every_waves == 0
                ):
                    # resolve first: the pending count job reads the wave
                    # files compaction is about to fold away
                    _resolve_counts()
                    if wave % self.cfg.compact_every_waves != 0:
                        # the persisted frontier's LINEAGE still references
                        # the wave delta files compact() is about to GC —
                        # on cache eviction (or executor loss at the
                        # cluster design point) recomputation would hit
                        # FileNotFoundError mid-crawl (round-4 ADVICE).
                        # Checkpoint waves are already lineage-free (the
                        # lazy localCheckpoint materialized under the count
                        # job _resolve_counts just awaited); for the rest,
                        # truncate eagerly before deleting the files.
                        ckpt = frontier.localCheckpoint(eager=True)
                        frontier.unpersist()
                        frontier = ckpt
                    self.store.compact(self.spark, crawl_id)
                wave += 1
                waves_done += 1
        finally:
            try:
                if count_fut is not None:
                    count_fut.result()
            except Exception:  # noqa: BLE001 — best-effort drain
                pass
            for df in (old_frontier, frontier):
                if df is not None:
                    df.unpersist()
            pool.shutdown(wait=False)

    # ------------------------------------------------------------------
    # wave internals
    # ------------------------------------------------------------------
    def _docs_present(self, keys: list[str]) -> set[str]:
        """ONE existence-check job for any number of root keys — the
        single-crawl path shares it with the fleet path (round 3 ran a
        separate isEmpty job per single seed)."""
        return {
            r.doc_id
            for r in self.documents.filter(F.col("doc_id").isin(keys))
            .select("doc_id")
            .collect()
        }

    def _prepare_frontier(self, df: DataFrame, checkpoint: bool = False):
        """Construct the materialized-frontier DataFrame synchronously (no
        Spark job) and return ``(df2, count_fn)``: ``count_fn()`` runs ONE
        job that fills df2's storage and returns (n_rows, n_pending).

        The split lets the caller run the materialization on a pool
        thread while the driver plans the next wave — the counts ride the
        same cache-fill action as observed metrics (checkpoint waves pay
        one cheap agg over the just-materialized rows instead —
        localCheckpoint does not surface observed metrics reliably)."""
        if checkpoint:
            # truncate the join/union lineage chain every few waves
            # (driver-side plan growth); content is identical and
            # already deterministic, so checkpointing is safe.  Lazy:
            # the blocks materialize under count_fn's job.
            df2 = df.localCheckpoint(eager=False)

            def count_fn() -> tuple[int, int]:
                row = df2.agg(
                    F.count(F.lit(1)).alias("n_rows"),
                    F.sum(
                        F.when(F.col("status") == PENDING, 1).otherwise(0)
                    ).alias("n_pending"),
                ).first()
                return int(row["n_rows"]), int(row["n_pending"] or 0)

            return df2, count_fn
        obs = Observation()
        df2 = df.observe(
            obs,
            F.sum(F.when(F.col("status") == PENDING, 1).otherwise(0)).alias(
                "n_pending"
            ),
        ).persist()

        def count_fn() -> tuple[int, int]:
            n_rows = df2.count()
            return n_rows, int(obs.get["n_pending"] or 0)

        return df2, count_fn

    def _eligible(
        self,
        frontier: DataFrame,
        n_pending: int,
        exclude_crawl_ids: list[str] | None = None,
    ) -> DataFrame:
        """PENDING rows, capped per host by the politeness budget (W1).

        Exact top-B per host in sorted full-key order, computed skew-safely
        in two stages: (1) top-B within (host, salt) buckets — bounds any
        single window partition; (2) exact top-B over the ≤ S*B survivors.
        ``exclude_crawl_ids``: cancelling fleet members — their PENDING
        rows are never claimed (the wave flips them to CANCELLED instead).
        """
        pending = frontier.filter(F.col("status") == PENDING)
        if exclude_crawl_ids:
            pending = pending.filter(~F.col("crawl_id").isin(exclude_crawl_ids))
        budget = self.cfg.host_budget_per_wave
        if budget is None or n_pending == 0:
            return pending
        eligible = (
            pending.withColumn("host", self._x["host"])
            .withColumn("salt", self._x["salt"])
            .withColumn("_lrn", F.row_number().over(self._x["elig_w1"]))
            .filter(F.col("_lrn") <= budget)
            .withColumn("_grn", F.row_number().over(self._x["elig_w2"]))
            .filter(F.col("_grn") <= budget)
            .drop("host", "salt", "_lrn", "_grn")
        )
        return eligible

    def _run_wave(
        self,
        crawl_id: str,
        wave: int,
        parents: DataFrame,
        seen: DataFrame | None,
        is_root: bool,
        root_fetched: int = 1,
        bloom=None,  # BloomState | BroadcastBloom, managed by run_crawl
        cancel_ids: list[str] | None = None,
        prev_frontier: DataFrame | None = None,
        checkpoint: bool = False,
        frontier_resolve=None,  # callable: block on the frontier count job
        pool=None,  # run_crawl's ThreadPoolExecutor (wave 0: none needed)
    ) -> tuple[WaveResult, tuple | None]:
        """Returns (WaveResult, (next_frontier_df, count_future) | None).

        The next frontier's materialization job is SUBMITTED here but not
        awaited — it overlaps this wave's commit tail and the caller's
        next-wave planning; ``frontier_resolve`` (this wave's own frontier
        count, deferred the same way by the previous wave) is invoked just
        before the first Spark action so planning above never blocks."""
        t0 = time.time()
        cfg = self.cfg

        # ---- fetch simulation (S1): join against the corpus ----
        # documents is pre-partitioned by doc_id and cached (init), so
        # this left join shuffles only the wave side — the corpus (the
        # 100 TB side at production, where bucketed tables play the same
        # role) is never re-shuffled per wave
        docs = self.documents
        wave_side = parents.select(
            "crawl_id", "full_key", "name", "depth", "requested_depth", "attempts"
        )
        fetched = wave_side.join(docs, wave_side["full_key"] == docs["doc_id"], "left")
        fo = self._x["fo"]
        outcomes_full = (
            fetched.withColumn("fetch_ok", fo["fetch_ok"])
            .withColumn("sim_status", fo["sim_status"])
            .withColumn("latency_ms", fo["latency_ms"])
        )
        # only the NARROW projection is cached (for the updates/metrics
        # pass): caching the joined width would push every wave's span
        # arrays — the corpus content — through the block store, GBs of
        # allocation churn per wave for rows read exactly once.  The links
        # path below re-derives the join instead (corpus side is cached
        # and co-partitioned; the wave side is the small one).
        outcomes = outcomes_full.drop("doc_id", "spans").persist()

        # ---- link extraction (P1) over text spans in offset order ----
        # media spans are filtered out INSIDE the array before the
        # explode, so non-text spans never become rows.  span_idx then
        # indexes the filtered array — still offset-ordered, and `pos` is
        # only ever used for ORDERING (min per parent/child, tie-breaks),
        # so the renumbering is invisible to semantics.
        text_spans = self._x["text_spans"]
        ok_pages = outcomes_full.filter(F.col("fetch_ok")).select(
            "crawl_id",
            F.col("full_key").alias("parent_key"),
            F.col("depth").alias("parent_depth"),
            "requested_depth",
            "latency_ms",
            F.posexplode(text_spans).alias("span_idx", "span"),
        )
        links = (
            ok_pages.select(
                "crawl_id",
                "parent_key",
                "parent_depth",
                "requested_depth",
                "latency_ms",
                "span_idx",
                F.posexplode(
                    F.regexp_extract_all(F.col("span.text"), F.lit(URL_REGEX_JAVA), F.lit(0))
                ).alias("link_idx", "raw"),
            )
            .withColumn("pos", F.col("span_idx") * _POS_STRIDE + F.col("link_idx"))
        )

        # ---- canonicalize (P2/P4) + per-parent local distinct (P3/A5) ----
        # shuffle-width discipline: only (crawl_id, parent_key, child_full)
        # are grouping keys; everything derivable from child_full
        # (hash, scheme, name) is recomputed AFTER the aggregation on the
        # collapsed rows, and the per-parent constants ride as cheap MIN
        # aggregates instead of widening the key tuple.
        c_name, c_http = self._x["norm"]
        canon = links.withColumn("child_full", F.concat(c_http, c_name))
        agg_cols = self._x["agg_cols"]
        if cfg.compact_shuffle_keys:
            # A/B experiment (config.py): shuffle the 8-byte child hash as
            # the grouping key instead of the ~40-byte URL string; strings
            # are recovered post-agg from a per-wave distinct mapping.
            # Map-side partial agg dedups both paths identically — the
            # difference is key bytes vs one extra narrow shuffle + join.
            canon_h = canon.withColumn("child_hash", F.xxhash64("child_full"))
            mapping = canon_h.select(
                "crawl_id", "child_hash", "child_full"
            ).dropDuplicates(["crawl_id", "child_hash"])
            local = (
                canon_h.groupBy("crawl_id", "parent_key", "child_hash")
                .agg(*agg_cols)
                .join(mapping, ["crawl_id", "child_hash"], "inner")
            )
        else:
            local = (
                canon.groupBy("crawl_id", "parent_key", "child_full")
                .agg(*agg_cols)
                .withColumn("child_hash", F.xxhash64("child_full"))
            )
        local = local.withColumn(
            "child_http", self._x["child_http"]
        ).withColumn("child_name", self._x["child_name"])

        # ---- seen-set dedup (J1): bloom stage 1 + exact stage 2 ----
        # expressed as a left join + is_fresh flag (not left_anti) so the
        # dropped-as-seen rows stay in ONE cached DataFrame and every wave
        # metric (raw totals, dedup drops, admissions, winners) comes from
        # a single pass — no extra jobs re-deriving the lineage.  All rows
        # of a given child share is_fresh, so downstream windows per child
        # are never mixed.
        to_unpersist: list[DataFrame] = []
        bcast = None
        bloom_candidates = bloom_maybe = 0
        # the prefilter runs only when run_crawl decided the seen set is
        # worth it and handed over live state (below cfg.bloom_min_seen
        # the bloom stage costs more than the exact join it would trim)
        use_bloom = cfg.use_bloom_prefilter and bloom is not None
        if seen is not None:
            seen_keys = seen.select(
                "crawl_id",
                F.col("url_hash").alias("child_hash"),
                F.col("full_key").alias("child_full"),
                F.lit(True).alias("_seen"),
            )
            if use_bloom:
                # stage 1: bloom verdict (no false negatives) — certainly-
                # fresh candidates skip the exact join shuffle entirely.
                # The bloom key is crawl-scoped (xxhash64(crawl_id, key)):
                # under fleet waves, one crawl's seen URL must not shadow
                # another crawl's fresh candidate (isolation, SURVEY §1.1);
                # cross-crawl false positives would only cost exact-join
                # rows, but scoping keeps the prefilter effective too.
                from .operators.dedup import BloomState, bloom_maybe_seen_udf

                # materialize the flagged candidate set ONCE, eagerly,
                # before the verdict split: `flagged` fans out into the
                # certain/maybe branches, whose stages race to fill a lazy
                # cache and recompute the whole scan→explode→distinct→
                # verdict pipeline — with an uncached (bucketed-table)
                # corpus that recompute re-scanned the corpus per branch,
                # a measured 4.7x wall regression in exactly the 10^10
                # design configuration (round-3 VERDICT What's-wrong #1).
                # An eager localCheckpoint pins exactly one computation of
                # the pipeline AND of the verdict UDF, and keeps every
                # downstream plan shallow.
                if frontier_resolve is not None:
                    frontier_resolve()  # first Spark action of the wave

                bloom_key = F.xxhash64("crawl_id", "child_full")
                if isinstance(bloom, BloomState):
                    # partition-local: candidates co-partitioned with the
                    # per-bucket bitmap FILES; each task holds one bucket's
                    # bitmap (total/n_buckets bytes) — no driver state, no
                    # whole-state broadcast (the 10^10-point design)
                    flagged = bloom.verdict(local, bloom_key)
                else:
                    # broadcast twin (A/B benchmarking; small-state regime)
                    bcast = self.spark.sparkContext.broadcast(bloom.bitmap_bytes())
                    flagged = local.withColumn(
                        "maybe_seen", bloom_maybe_seen_udf(bcast, cfg)(bloom_key)
                    )
                flagged = flagged.localCheckpoint(eager=True)
                # prefilter effectiveness, measured: one cheap scan of the
                # just-materialized rows — maybe-seen rows are the ONLY
                # input of the stage-2 exact join below
                brow = flagged.agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum(
                        F.when(F.col("maybe_seen"), 1).otherwise(0)
                    ).alias("m"),
                ).first()
                bloom_candidates = int(brow["n"])
                bloom_maybe = int(brow["m"] or 0)
                certain = (
                    flagged.filter(~F.col("maybe_seen"))
                    .drop("maybe_seen")
                    .withColumn("is_fresh", F.lit(True))
                )
                maybe = (
                    flagged.filter(F.col("maybe_seen"))
                    .drop("maybe_seen")
                    .join(seen_keys, ["crawl_id", "child_hash", "child_full"], "left")
                    .withColumn("is_fresh", F.col("_seen").isNull())
                    .drop("_seen")
                )
                fresh = certain.unionByName(maybe)
            else:
                fresh = local.join(
                    seen_keys, ["crawl_id", "child_hash", "child_full"], "left"
                ).withColumn("is_fresh", F.col("_seen").isNull()).drop("_seen")
        else:
            fresh = local.withColumn("is_fresh", F.lit(True))

        # ---- DNS + robots admission (S2/D6) ----
        if cfg.dns_impl == "pandas":
            cand = (
                fresh.withColumn("_dns", self._x["dns_struct"])
                .withColumn("dns_ok", F.col("_dns.dns_ok"))
                .withColumn("child_domain", F.col("_dns.domain"))
                .withColumn("child_ip", F.col("_dns.ip"))
                .drop("_dns")
            )
        else:
            dns = self._x["dns"]
            cand = (
                fresh.withColumn("dns_ok", dns["dns_ok"])
                .withColumn("child_domain", dns["domain"])
                .withColumn("child_ip", dns["ip"])
            )
        if cfg.respect_robots and self.robots is not None:
            rb = self.robots.select(
                F.col("host").alias("_r_host"), F.col("disallowed").alias("_r_disallowed")
            )
            cand = cand.join(
                rb, _host_col(F.col("child_name")) == F.col("_r_host"), "left"
            )
            admitted = F.col("dns_ok") & ~F.coalesce(F.col("_r_disallowed"), F.lit(False))
        else:
            admitted = F.col("dns_ok")
        cand = cand.withColumn("admitted", admitted)

        # ---- deterministic first-discoverer tie-break (J3/ST6, §3.4) ----
        cand = cand.withColumn(
            "rn", F.row_number().over(self._x["winner_w"])
        ).persist()

        winners = cand.filter(
            F.col("is_fresh") & F.col("admitted") & (F.col("rn") == 1)
        )
        child_depth = F.col("parent_depth") + F.lit(1)
        children = winners.select(
            "crawl_id",
            F.col("child_hash").alias("url_hash"),
            F.col("child_full").alias("full_key"),
            F.col("child_name").alias("name"),
            F.col("child_http").alias("http_type"),
            F.col("child_domain").alias("domain"),
            F.col("child_ip").alias("ip"),
            child_depth.cast("int").alias("depth"),
            F.col("requested_depth"),
            F.when(child_depth >= F.col("requested_depth"), F.lit(COMPLETED))
            .otherwise(F.lit(PENDING))
            .alias("status"),  # leaf rule F10 (job.rs:182)
            F.lit(0).alias("attempts"),
            F.lit(wave).alias("wave"),
            F.concat(F.col("latency_ms").cast("string"), F.lit("ms")).alias(
                "request_time"
            ),
        )
        edges = winners.select(
            "crawl_id",
            F.col("parent_key").alias("src"),
            F.col("child_full").alias("dst"),
            F.lit(wave).alias("wave"),
        )

        # ---- parent status transitions (ST4/P6/U2) ----
        if not is_root:
            f = F.col("is_fresh")
            pstats = cand.groupBy("crawl_id", "parent_key").agg(
                F.sum(F.when(f, 1).otherwise(0)).alias("n_cand"),
                F.sum(F.when(f & ~F.col("admitted"), 1).otherwise(0)).alias("n_bad"),
                F.sum(
                    F.when(f & F.col("admitted") & (F.col("rn") == 1), 1).otherwise(0)
                ).alias("n_wins"),
            )
            # attempts increments on EVERY fetch error including 4xx: the
            # reference's validate_job bumps attempts before classifying
            # the error (feeder/src/job.rs:107-131), so a first-attempt 404
            # ends FAILED with attempts=1
            new_attempts = self._x["new_attempts"]
            status_expr = self._x["status_expr"]
            # fetch/status totals piggyback on the updates write action via
            # an Observation — zero extra Spark jobs for these metrics
            upd_obs = Observation()
            upd_base = (
                outcomes.select(
                    "crawl_id",
                    F.col("full_key").alias("parent_key"),
                    "fetch_ok",
                    "sim_status",
                    "attempts",
                )
                .join(pstats, ["crawl_id", "parent_key"], "left")
                .observe(
                    upd_obs,
                    F.count(F.lit(1)).alias("fetched"),
                    F.sum(F.when(F.col("fetch_ok"), 1).otherwise(0)).alias("ok"),
                    F.sum(
                        F.when(
                            ~F.col("fetch_ok") & (F.col("sim_status") == 0), 1
                        ).otherwise(0)
                    ).alias("timeouts"),
                    F.sum(F.when(status_expr == FAILED, 1).otherwise(0)).alias(
                        "failed"
                    ),
                    F.sum(F.when(status_expr == PENDING, 1).otherwise(0)).alias(
                        "retries"
                    ),
                )
            )
            updates = upd_base.select(
                "crawl_id",
                F.xxhash64("parent_key").alias("url_hash"),
                F.col("parent_key").alias("full_key"),
                status_expr.alias("status"),
                new_attempts.cast("int").alias("attempts"),
                F.lit(wave).alias("wave"),
            )
        else:
            updates, upd_obs = None, None

        # ---- cancelled fleet members ride this wave's updates delta ----
        # (their rows were excluded from `parents`, so no fetch happened;
        # an Observation carries the flipped-row count for the driver's
        # pending arithmetic — zero extra jobs)
        cancel_obs = None
        if cancel_ids and seen is not None:
            cancel_obs = Observation()
            cancel_upd = (
                seen.filter(
                    (F.col("status") == PENDING)
                    & F.col("crawl_id").isin(cancel_ids)
                )
                .select(
                    "crawl_id",
                    "url_hash",
                    "full_key",
                    F.lit(CANCELLED).alias("status"),
                    F.col("attempts").cast("int").alias("attempts"),
                    F.lit(wave).alias("wave"),
                )
                .observe(cancel_obs, F.count(F.lit(1)).alias("n_cancelled"))
            )
            updates = (
                cancel_upd if updates is None else updates.unionByName(cancel_upd)
            )

        # ---- metrics pass FIRST: materializes the cand cache at full
        # parallelism.  The delta write below is coalesced to few files;
        # if it were the first action, its coalesce would pull the whole
        # wave pipeline (explode/bloom/window over millions of rows)
        # through that handful of tasks and serialize the heavy stage —
        # the cache must be filled by a full-width job first.
        _tm: dict | None = {"plan": time.time() - t0} if WAVE_TIMERS else None
        if frontier_resolve is not None:
            frontier_resolve()  # idempotent (bloom path resolved earlier)
        if _tm is not None:
            _tm["resolve"] = time.time() - t0 - _tm["plan"]
            _t_prev = time.time()
        f = F.col("is_fresh")
        part_agg = (
            cand.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(
                F.coalesce(F.sum("n_raw"), F.lit(0)).alias("n_raw"),
                F.sum(F.when(f, 1).otherwise(0)).alias("candidates"),
                F.sum(F.when(f & ~F.col("admitted"), 1).otherwise(0)).alias(
                    "dns_dropped"
                ),
                F.sum(
                    F.when(f & F.col("admitted") & (F.col("rn") == 1), 1).otherwise(0)
                ).alias("children"),
                F.sum(
                    F.when(
                        f
                        & F.col("admitted")
                        & (F.col("rn") == 1)
                        & (F.col("parent_depth") + 1 < F.col("requested_depth")),
                        1,
                    ).otherwise(0)
                ).alias("children_pending"),  # leaf rule F10 complement
            )
        )

        # ---- commit the snapshot (S3): ONE delta write, then marker ----
        # inserts + edges + updates ride a single union job partitioned by
        # `kind` (round 3 submitted three writes: concurrent via threads,
        # but three Catalyst analyses + three submissions on the serial
        # driver path — the per-wave floor that caps pre-saturation
        # scaling).  All branches read the cached `cand`/`outcomes`
        # DataFrames the metrics job fills.  Round-6: the coalesced write
        # job is submitted CONCURRENTLY with the metrics job instead of
        # after it — FIFO gives the earlier (full-width) metrics job the
        # cores, so the cache is still filled at full parallelism, and the
        # write's few encode tasks back-fill the metrics tail instead of
        # running on an otherwise idle cluster afterwards (~1-2 s/wave).
        # The submission-order race is closed by waiting until the
        # scheduler has REGISTERED the metrics job before submitting the
        # write (a write-first registration would pull the whole wave
        # pipeline through its 8 coalesce tasks — the round-5 failure
        # mode this ordering exists to prevent).  Bloom-path state
        # maintenance runs after the metrics resolve (its delta reads the
        # then-cached rows), concurrent with the write tail; the next
        # frontier is folded from the written files and its
        # materialization job is submitted but NOT awaited — it overlaps
        # the commit tail here and the caller's next-wave planning.
        from concurrent.futures import ThreadPoolExecutor

        local_pool = pool is None
        if local_pool:
            pool = ThreadPoolExecutor(max_workers=2)
        mat = None
        try:
            delta = self._as_union(children, "inserts").unionByName(
                self._as_union(edges, "edges")
            )
            if updates is not None:
                delta = delta.unionByName(self._as_union(updates, "updates"))
            if _tm is not None:
                _tm["union_build"] = time.time() - _t_prev
                _t_prev = time.time()
            st = self.spark.sparkContext.statusTracker()
            ids0 = set(st.getActiveJobsIds())
            metrics_fut = pool.submit(part_agg.collect)
            deadline = time.time() + 5.0
            while (
                not metrics_fut.done()
                and not (set(st.getActiveJobsIds()) - ids0)
                and time.time() < deadline
            ):
                time.sleep(0.002)
            write_fut = pool.submit(
                self.store.write_delta_union, delta, crawl_id, wave
            )
            part_rows = metrics_fut.result()
            if _tm is not None:
                _tm["metrics_job"] = time.time() - _t_prev
                _t_prev = time.time()
            raw_total = sum(int(r["n_raw"]) for r in part_rows)
            candidates = sum(int(r["candidates"]) for r in part_rows)
            dns_dropped = sum(int(r["dns_dropped"]) for r in part_rows)
            n_children = sum(int(r["children"]) for r in part_rows)
            n_children_pending = sum(
                int(r["children_pending"]) for r in part_rows
            )
            if bloom is not None:
                # O(wave) incremental maintenance: OR this wave's insert
                # keys into the state.  Partition-local: a bucket-
                # partitioned job writes only the touched buckets' files +
                # a new manifest; broadcast: driver-side dict OR.  Runs on
                # this thread while the union write runs on the pool.
                from .operators.dedup import BloomState

                bloom_delta = children.select(
                    F.xxhash64("crawl_id", "full_key").alias("url_hash")
                )
                if isinstance(bloom, BloomState):
                    bloom.update(bloom_delta, wave)
                else:
                    bloom.update(bloom_delta)
            if _tm is not None:
                _tm["bloom_upd"] = time.time() - _t_prev
                _t_prev = time.time()
            write_fut.result()
            if _tm is not None:
                _tm["write_wait"] = time.time() - _t_prev
                _t_prev = time.time()
            if upd_obs is not None:
                og = upd_obs.get
                fetched, ok = int(og["fetched"]), int(og["ok"])
                timeouts, n_failed = int(og["timeouts"]), int(og["failed"])
                retries = int(og["retries"])
            else:  # wave 0: the root(s) were pre-admitted driver-side
                fetched, ok, timeouts, n_failed = root_fetched, root_fetched, 0, 0
                retries = 0
            n_cancelled = int(cancel_obs.get["n_cancelled"]) if cancel_obs else 0
            if prev_frontier is not None:
                # fold the next frontier from the files just written
                # (linear lineage: prev appears ONCE + stable file scans —
                # an in-memory fold through the wave pipeline references
                # prev in three branches and the plan grows 3^waves, OOM
                # by wave ~6); its one-job materialization starts now and
                # resolves lazily in the caller.  The updates row count
                # (known exactly from the write's observation) gates the
                # broadcast fold below.
                fold = self._fold_frontier(
                    prev_frontier, crawl_id, wave,
                    n_updates=fetched + n_cancelled,
                )
                next_df, count_fn = self._prepare_frontier(fold, checkpoint)
                mat = (next_df, pool.submit(count_fn))
            if _tm is not None:
                _tm["obs_fold"] = time.time() - _t_prev
                _t_prev = time.time()

            elapsed_ms = int((time.time() - t0) * 1000)
            metrics_rows = [
                (
                    crawl_id, wave, -1, fetched, ok, n_failed, timeouts,
                    candidates, raw_total - candidates, dns_dropped, n_children,
                    elapsed_ms,
                )
            ] + [
                (
                    crawl_id, wave, int(r["partition_id"]), 0, 0, 0, 0,
                    int(r["candidates"]), 0, int(r["dns_dropped"]),
                    int(r["children"]), 0,
                )
                for r in part_rows
            ]
            self.store.write_metrics_rows(metrics_rows, crawl_id, wave)

            result = WaveResult(
                wave=wave,
                fetched=fetched,
                ok=ok,
                failed=n_failed,
                timeouts=timeouts,
                candidates=candidates,
                dedup_dropped=raw_total - candidates,
                dns_dropped=dns_dropped,
                children=n_children,
                pending_after=-1,
                elapsed_ms=elapsed_ms,
                parent_retries=retries,
                children_pending=n_children_pending,
                cancelled=n_cancelled,
                bloom_candidates=bloom_candidates,
                bloom_maybe=bloom_maybe,
            )
            self.store.commit_wave(
                crawl_id, wave, {k: v for k, v in result.__dict__.items()}
            )
            if _tm is not None:
                _tm["commit"] = time.time() - _t_prev
                _tm["total"] = time.time() - t0
                print(
                    f"WAVE_TIMERS {crawl_id} w{wave} "
                    + " ".join(f"{k}={v:.3f}" for k, v in _tm.items()),
                    flush=True,
                )
        finally:
            # always reached (round-3 ADVICE: a raise between pool
            # creation and the success-path shutdown leaked the pool)
            outcomes.unpersist()
            cand.unpersist()
            for df in to_unpersist:
                df.unpersist()
            if bcast is not None:
                # several-MB bitmap broadcast per wave: release it now or a
                # deep crawl accumulates broadcast blocks for the session
                bcast.destroy()
            if local_pool:
                pool.shutdown(wait=False)
        return result, mat

    def _as_union(self, df: DataFrame, kind: str) -> DataFrame:
        """Lift one delta DataFrame onto the union superset schema with a
        ``kind`` discriminator (missing columns = typed nulls).

        ONE select, not a withColumn loop: every withColumn is a fresh
        plan + analysis through py4j, and this ran 3x per wave over a
        15-column superset — profiled at 0.42 s/wave of pure driver time
        (the serial floor is the pre-saturation scaling constraint).
        The lifted Column lists are immutable and depend only on
        (kind, input columns), so they are built once per engine and
        reused every wave — ~150 py4j round-trips/wave off the same
        serial path."""
        key = (kind, tuple(df.columns))
        cols = self._union_cols_cache.get(key)
        if cols is None:
            have = set(df.columns)
            cols = [
                F.col(n) if n in have else F.lit(None).cast(t).alias(n)
                for n, t in _UNION_COLS
            ] + [F.lit(kind).alias("kind")]
            self._union_cols_cache[key] = cols
        return df.select(*cols)

    def _fold_frontier(
        self, prev: DataFrame, crawl_id: str, wave: int,
        n_updates: int | None = None,
    ) -> DataFrame:
        """Fold one written wave's deltas into the cached frontier: apply
        the status updates to existing rows, append the inserts.  Reads
        only the new wave's files — stable, bounded lineage (prev appears
        exactly once in the plan); updates-only waves simply have no
        inserts file.

        The updates side is BROADCAST whenever its exact row count (known
        from the write job's observation: one row per fetched parent +
        per cancelled row) is bounded: a shuffled fold re-partitions the
        ENTIRE frontier every wave — measured ~100 MB/wave of shuffle at
        the 600k bench, the single largest stage group — while the wave
        side is bounded by the politeness budget.  Broadcast makes the
        fold map-only: the frontier is scanned once from cache and never
        re-shuffled.  Above the bound (or unknown) it falls back to the
        shuffled sort-merge fold."""
        from .store import UPDATES_SCHEMA

        upd_path = self.store.delta_path(crawl_id, wave, "updates")
        ins_path = self.store.delta_path(crawl_id, wave, "inserts")
        merged = prev
        if upd_path is not None:
            upd = (
                self.spark.read.schema(UPDATES_SCHEMA)
                .parquet(str(upd_path))
                .select(
                    "crawl_id",
                    "url_hash",
                    "full_key",
                    F.col("status").alias("_u_status"),
                    F.col("attempts").alias("_u_attempts"),
                )
            )
            if (
                n_updates is not None
                and n_updates <= self.cfg.fold_broadcast_max_rows
            ):
                upd = F.broadcast(upd)
            merged = (
                prev.join(upd, ["crawl_id", "url_hash", "full_key"], "left")
                .withColumn("status", F.coalesce("_u_status", "status"))
                .withColumn("attempts", F.coalesce("_u_attempts", "attempts"))
                .drop("_u_status", "_u_attempts")
            )
        if ins_path is not None:
            ins = self.spark.read.schema(FRONTIER_SCHEMA).parquet(str(ins_path))
            merged = merged.unionByName(ins)
        return merged

    def _cancel_wave(self, crawl_id: str, wave: int) -> None:
        """Turn every PENDING row into CANCELLED in one updates-only
        snapshot (crawl_service.rs:219-235)."""
        frontier = self.store.frontier(self.spark, crawl_id)
        updates = frontier.filter(F.col("status") == PENDING).select(
            "crawl_id",
            "url_hash",
            "full_key",
            F.lit(CANCELLED).alias("status"),
            "attempts",
            F.lit(wave).alias("wave"),
        )
        self.store.write_delta(updates, crawl_id, wave, "updates")
        self.store.commit_wave(crawl_id, wave, {"cancelled_wave": True})
