#!/usr/bin/env python
"""Host-state-tagged scaling repetitions (round 5).

Round-5 finding: this VM is BIMODAL in ways /proc/stat steal does not
capture — the same pinned leg, warm corpus cache, <1.5% steal, measured
100.3 s and 239.2 s (8 cores) / 215.4 s and 312.2 s (2 cores) within
one hour.  Co-tenant memory-bandwidth/LLC pressure on other physical
cores is invisible to steal, so calm-window gating alone cannot make
N-vs-4N ratios honest: a ratio must pair legs measured in the SAME
host state.

This driver tags every leg with a 4-second 8-process memory-bandwidth
probe (copy GB/s) immediately before and after the run.  Samples whose
before/after probes agree (within a band) are assigned that state; the
published pair uses min-wall legs from the FAST state (min-of-N is the
honest estimator of the machine-limited wall under one-sided noise).

Usage: python scripts/r5_state_reps.py [--reps 3] [--legs 8,2]
Appends one JSON line per sample to BENCH/r5_state_reps.jsonl.
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
BENCH = REPO / "BENCH"
OUT = BENCH / "r5_state_reps.jsonl"

CPULIST = {2: "0-1", 8: "0-7", 32: "0-31"}


def membw_probe(secs: float = 4.0, procs: int = 8) -> float:
    """Aggregate copy bandwidth (GB/s) of `procs` pinned streamers."""
    r = subprocess.run(
        [sys.executable, str(REPO / "scripts/membw_probe.py"),
         "--levels", str(procs), "--secs", str(secs), "--modes", "copy"],
        capture_output=True, text=True, timeout=120,
    )
    best = 0.0
    for line in r.stdout.splitlines():
        try:
            d = json.loads(line)
        except json.JSONDecodeError:
            continue
        if d.get("mode") == "copy" and d.get("procs") == procs:
            best = d["aggregate_gbps"]
    return best


def steal_probe(secs: float = 4.0) -> float:
    def stat():
        v = list(map(int, open("/proc/stat").readline().split()[1:]))
        return sum(v[:8]), v[7]
    b = stat()
    time.sleep(secs)
    a = stat()
    return round(100.0 * (a[1] - b[1]) / max(1, a[0] - b[0]), 2)


def run_leg(cpus: int) -> dict | None:
    env = dict(os.environ)
    env.update(
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_NDOCS=os.environ.get("NDOCS", "600000"),
        SPARK_GRAFT_DEPTH=os.environ.get("DEPTH", "7"),
        SPARK_GRAFT_SKIP_QUERIES="1",
        SPARK_GRAFT_STEAL_ATTEMPTS="1",
        SPARK_GRAFT_CALM_WAIT="0",
    )
    r = subprocess.run(
        ["taskset", "-ac", CPULIST[cpus], "timeout",
         os.environ.get("LEG_TIMEOUT", "1200"),
         sys.executable, "-u", str(REPO / "bench.py")],
        capture_output=True, text=True, env=env, cwd=str(REPO),
    )
    last = r.stdout.strip().rsplit("\n", 1)[-1] if r.stdout.strip() else ""
    try:
        return json.loads(last)
    except json.JSONDecodeError:
        sys.stderr.write(r.stderr[-2000:] + "\n")
        return None


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--legs", default="8,2")
    args = ap.parse_args()
    legs = [int(x) for x in args.legs.split(",")]

    for rep in range(1, args.reps + 1):
        for cpus in legs:
            bw_before = membw_probe()
            st = steal_probe()
            t0 = time.time()
            d = run_leg(cpus)
            bw_after = membw_probe()
            if d is None:
                print(f"rep{rep} pin{cpus}: FAILED", flush=True)
                continue
            sample = {
                "rep": rep,
                "cpus": cpus,
                "ndocs": int(os.environ.get("NDOCS", "600000")),
                "ts": time.time(),
                "wall_sec": d["value"],
                "tput": d["crawl"]["urls_fetched_plus_deduped_per_sec"],
                "cpu_steal_pct": d["crawl"]["cpu_steal_pct"],
                "steal_probe_before": st,
                "membw_copy_gbs_before": round(bw_before, 1),
                "membw_copy_gbs_after": round(bw_after, 1),
                "total_sec": round(time.time() - t0, 1),
                "urls_fetched": d["crawl"]["urls_fetched"],
                "nodes": d["crawl"]["nodes"],
            }
            with open(OUT, "a") as f:
                f.write(json.dumps(sample) + "\n")
            print(json.dumps(sample), flush=True)


if __name__ == "__main__":
    main()
