"""Scaling-efficiency evidence: the same crawl job at two parallelism
levels (the sandbox stand-in for N vs 4N executors demanded by
BASELINE.json).  Writes BENCH/scaling.json and BENCH/BASELINE.md.

Two modes:

  run        python scripts/scaling_bench.py run [ndocs] [depth]
             executes the 8-vs-32 pair (plus a 2-vs-8 pair at ndocs/3 and
             a 200-crawl fleet at both main levels) serially via bench.py
  summarize  python scripts/scaling_bench.py summarize A.out B.out [C.out D.out]
             builds the report from existing bench.py JSON outputs
             (A=low level, B=4x level; optional second pair C,D)

Methodology notes (also in BENCH/BASELINE.md):
* bench.py places shuffle scratch AND the snapshot store on tmpfs — this
  sandbox's VM disk measures ~10 MB/s, which is not representative of any
  cluster storage and was the dominant local[32] bottleneck in round 2's
  stage profile.
* two pairs are reported: 8->32 (the headline N->4N) and 2->8 (the same
  4x ratio in the regime where the box's memory bandwidth is not yet
  saturated — scaling past ~8-16 threads on ONE socket is bounded by
  DRAM bandwidth, which a real 4x-executor cluster multiplies along with
  the cores; the event-log profile in BENCH/ANALYSIS.md attributes this).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run_one(cpus: int, ndocs: int, depth: int, fleet: int = 0,
            evlog: str | None = None) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_NDOCS=str(ndocs),
        SPARK_GRAFT_DEPTH=str(depth),
        SPARK_GRAFT_SKIP_QUERIES="0",
        SPARK_GRAFT_FLEET=str(fleet),
    )
    if evlog:
        env["SPARK_GRAFT_EVENTLOG"] = evlog
    out = subprocess.run(
        [sys.executable, "-u", str(REPO / "bench.py")],
        env=env, capture_output=True, text=True, check=True, cwd=REPO,
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def pair_summary(lo: dict, hi: dict) -> dict:
    tlo = lo["crawl"]["urls_fetched_plus_deduped_per_sec"]
    thi = hi["crawl"]["urls_fetched_plus_deduped_per_sec"]
    d = {
        "cpus": [lo["cpus"], hi["cpus"]],
        "ndocs": lo["crawl"]["n_docs"],
        "depth": lo["crawl"]["depth"],
        "wall_sec": [lo["value"], hi["value"]],
        "throughput": [tlo, thi],
        "speedup": round(thi / tlo, 3),
        "scaling_efficiency_n_to_4n": round((thi / tlo) / 4, 3),
        "cpu_steal_pct": [
            lo["crawl"].get("cpu_steal_pct"), hi["crawl"].get("cpu_steal_pct")
        ],
    }
    if "fleet" in lo and "fleet" in hi:
        d["fleet"] = {
            "n_crawls": lo["fleet"]["n_crawls"],
            "depth": lo["fleet"]["depth"],
            "wall_sec": [lo["fleet"]["wall_sec"], hi["fleet"]["wall_sec"]],
            "throughput": [
                lo["fleet"]["urls_fetched_plus_deduped_per_sec"],
                hi["fleet"]["urls_fetched_plus_deduped_per_sec"],
            ],
            "per_crawl_sec": [
                lo["fleet"]["per_crawl_sec"], hi["fleet"]["per_crawl_sec"]
            ],
            "fleet_speedup_vs_serial": [
                lo["fleet"]["fleet_speedup_vs_serial"],
                hi["fleet"]["fleet_speedup_vs_serial"],
            ],
            "scaling_efficiency_n_to_4n": round(
                (hi["fleet"]["urls_fetched_plus_deduped_per_sec"]
                 / lo["fleet"]["urls_fetched_plus_deduped_per_sec"]) / 4, 3,
            ),
        }
    return d


def write_report(pairs: list[dict], raw: list[dict]) -> None:
    bench_dir = REPO / "BENCH"
    bench_dir.mkdir(exist_ok=True)
    summary = {"pairs": pairs, "runs": raw}
    (bench_dir / "scaling.json").write_text(json.dumps(summary, indent=1))

    lines = [
        "# BENCH — measured results (this sandbox)",
        "",
        "Same job, same input, two parallelism levels per pair (`local[N]`",
        "vs `local[4N]` — the sandbox proxy for N vs 4N executors; the job",
        "is spark-submit-able via `scripts/build_pyfiles.sh`).  All",
        "ephemeral I/O (shuffle scratch + snapshot store) is on tmpfs:",
        "this sandbox's VM disk measures ~10 MB/s, unrepresentative of",
        "cluster storage, and round 2's stage profile showed it dominating",
        "local[32] wall time (BENCH/ANALYSIS.md).",
        "",
        "| pair | corpus | depth | wall N | wall 4N | tput N | tput 4N |"
        " speedup | efficiency | steal% N/4N |",
        "|---|---|---|---|---|---|---|---|---|---|",
    ]
    for p in pairs:
        st = p.get("cpu_steal_pct", [None, None])
        lines.append(
            f"| local[{p['cpus'][0]}]→local[{p['cpus'][1]}] | "
            f"{p['ndocs']} docs | {p['depth']} | {p['wall_sec'][0]}s | "
            f"{p['wall_sec'][1]}s | {p['throughput'][0]} | "
            f"{p['throughput'][1]} | {p['speedup']}x | "
            f"**{p['scaling_efficiency_n_to_4n']}** | {st[0]}/{st[1]} |"
        )
    for p in pairs:
        if "fleet" in p:
            f = p["fleet"]
            lines += [
                "",
                f"Fleet ({f['n_crawls']} concurrent crawls, depth "
                f"{f['depth']}, same corpus): wall "
                f"{f['wall_sec'][0]}s → {f['wall_sec'][1]}s, per-crawl "
                f"{f['per_crawl_sec'][0]}s → {f['per_crawl_sec'][1]}s, "
                f"{f['fleet_speedup_vs_serial'][0]}x/"
                f"{f['fleet_speedup_vs_serial'][1]}x vs serial single-crawls, "
                f"pair efficiency **{f['scaling_efficiency_n_to_4n']}**.",
            ]
    (bench_dir / "BASELINE.md").write_text("\n".join(lines) + "\n")
    print(json.dumps(pairs, indent=1))


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "run"
    if mode == "summarize":
        raw = [json.loads(Path(p).read_text()) for p in sys.argv[2:]]
        pairs = [pair_summary(raw[0], raw[1])]
        if len(raw) >= 4:
            pairs.append(pair_summary(raw[2], raw[3]))
        write_report(pairs, raw)
        return
    ndocs = int(sys.argv[2]) if len(sys.argv) > 2 else 600000
    depth = int(sys.argv[3]) if len(sys.argv) > 3 else 7
    r8 = run_one(8, ndocs, depth, fleet=200)
    r32 = run_one(32, ndocs, depth, fleet=200)
    r2 = run_one(2, ndocs // 3, depth)
    r8s = run_one(8, ndocs // 3, depth)
    write_report([pair_summary(r8, r32), pair_summary(r2, r8s)],
                 [r8, r32, r2, r8s])


if __name__ == "__main__":
    main()
