"""Per-query isolation bench (guide §1.4): times each declared bench query
with the SAME methodology as bench.py's query loop (collect()), plus an
optional noop-sink variant, N repetitions, min/median reported, steal share
recorded.  Optionally writes .explain("formatted") per query.

This file is NOT part of the frozen measurement contract (bench.py is);
its numbers are cited in OPTIMIZATION_r06.md as isolation evidence.

Usage:
  python bench_extra.py [query ...]          # default: the 14 bench queries
Env:
  SPARK_GRAFT_SF_DIR    (default /root/testdata/sf1.0)
  SPARK_GRAFT_CPUS      (default 32)
  SPARK_GRAFT_REPS      (default 3)
  SPARK_GRAFT_PLANS_DIR write explain("formatted") per query to this dir
  SPARK_GRAFT_PLAN_TAG  filename suffix (before/after), default none
  SPARK_GRAFT_NOOP      1 => time via noop sink instead of collect()
  SPARK_GRAFT_EVENTLOG  event log dir (same knob as bench.py)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("SPARK_GRAFT_REPS", "3"))
SHUFFLE = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "64"))
PLANS_DIR = os.environ.get("SPARK_GRAFT_PLANS_DIR", "")
PLAN_TAG = os.environ.get("SPARK_GRAFT_PLAN_TAG", "")
NOOP = os.environ.get("SPARK_GRAFT_NOOP", "") == "1"
EVENTLOG = os.environ.get("SPARK_GRAFT_EVENTLOG", "")
_SHM = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
LOCAL_DIR = os.environ.get("SPARK_GRAFT_LOCAL_DIR", f"{_SHM}/spark_graft_scratch")

DEFAULT_QUERIES = [
    "progress_counts",
    "stats_distinct_max",
    "anti_join_seen_set",
    "left_outer_progress",
    "first_writer_dedup",
    "politeness_topk",
    "minhash_band_buckets",
    "token_count",
    "ann_cosine_topk",
    "simhash_near_dup",
    "ann_lsh_topk",
    "embedding_near_dup_lsh",
    "media_features_real",
    "jaccard_pairs",
]


def _cpu_stat():
    try:
        with open("/proc/stat") as f:
            v = list(map(int, f.readline().split()[1:]))
        steal = v[7] if len(v) > 7 else 0
        return v[0] + v[1] + v[2] + v[5] + v[6] + steal, steal
    except (OSError, ValueError, IndexError):
        return 0, 0


def _steal_pct(a, b):
    db, ds = b[0] - a[0], b[1] - a[1]
    return round(100.0 * ds / db, 2) if db > 0 else 0.0


def main() -> None:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod

    names = sys.argv[1:] or DEFAULT_QUERIES
    builder = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("web_crawler_spark-bench-extra")
        .config("spark.sql.shuffle.partitions", str(SHUFFLE))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    )
    if LOCAL_DIR:
        Path(LOCAL_DIR).mkdir(parents=True, exist_ok=True)
        builder = builder.config("spark.local.dir", LOCAL_DIR)
    if EVENTLOG:
        Path(EVENTLOG).mkdir(parents=True, exist_ok=True)
        builder = builder.config("spark.eventLog.enabled", "true").config(
            "spark.eventLog.dir", f"file://{EVENTLOG}"
        )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry_mod.queries()
    out: dict[str, dict] = {}
    for name in names:
        fn = qs[name]
        if PLANS_DIR:
            Path(PLANS_DIR).mkdir(parents=True, exist_ok=True)
            df = fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            suffix = f"_{PLAN_TAG}" if PLAN_TAG else ""
            (Path(PLANS_DIR) / f"{name}{suffix}.txt").write_text(plan)
        samples = []
        for _ in range(max(1, REPS)):
            s0 = _cpu_stat()
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            df = fn(spark, SF_DIR)
            if NOOP:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.collect()
            dt = time.time() - t0
            samples.append({"sec": round(dt, 3), "steal": _steal_pct(s0, _cpu_stat())})
            spark.sparkContext.setJobDescription(None)
        secs = sorted(s["sec"] for s in samples)
        out[name] = {
            "min": secs[0],
            "med": secs[len(secs) // 2],
            "samples": samples,
        }
        print(
            f"{name}: min={secs[0]} med={secs[len(secs) // 2]} "
            f"steals={[s['steal'] for s in samples]}",
            file=sys.stderr,
            flush=True,
        )
    print(json.dumps({"sf_dir": SF_DIR, "cpus": CPUS, "noop": NOOP, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
