"""Scaling-efficiency evidence: the same crawl job at local[8] vs
local[32] (the sandbox stand-in for N vs 4N executors demanded by
BASELINE.json).  Writes BENCH/scaling.json and updates the measured
section of BENCH/BASELINE.md.

Usage: python scripts/scaling_bench.py [ndocs] [depth]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run(cpus: int, ndocs: int, depth: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_NDOCS=str(ndocs),
        SPARK_GRAFT_DEPTH=str(depth),
    )
    out = subprocess.run(
        [sys.executable, "-u", str(REPO / "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        check=True,
        cwd=REPO,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    ndocs = int(sys.argv[1]) if len(sys.argv) > 1 else 200000
    depth = int(sys.argv[2]) if len(sys.argv) > 2 else 7

    r8 = run(8, ndocs, depth)
    r32 = run(32, ndocs, depth)
    tput8 = r8["crawl"]["urls_fetched_plus_deduped_per_sec"]
    tput32 = r32["crawl"]["urls_fetched_plus_deduped_per_sec"]
    eff = (tput32 / tput8) / 4
    summary = {
        "ndocs": ndocs,
        "depth": depth,
        "local8": r8,
        "local32": r32,
        "throughput_local8": tput8,
        "throughput_local32": tput32,
        "scaling_efficiency_n_to_4n": round(eff, 3),
    }
    bench_dir = REPO / "BENCH"
    bench_dir.mkdir(exist_ok=True)
    (bench_dir / "scaling.json").write_text(json.dumps(summary, indent=1))

    md = f"""# BENCH — measured results (this sandbox)

Same job, same input, two parallelism levels (`local[8]` vs `local[32]`
— the sandbox proxy for N vs 4N executors; the job itself is
spark-submit-able via `scripts/build_pyfiles.sh`).

| level | corpus | depth | waves | URLs fetched | links deduped | wall s | fetched+deduped /s |
|---|---|---|---|---|---|---|---|
| local[8] | {ndocs} docs | {depth} | {r8['crawl']['waves']} | {r8['crawl']['urls_fetched']} | {r8['crawl']['links_deduped']} | {r8['value']} | {tput8} |
| local[32] | {ndocs} docs | {depth} | {r32['crawl']['waves']} | {r32['crawl']['urls_fetched']} | {r32['crawl']['links_deduped']} | {r32['value']} | {tput32} |

**Scaling efficiency (N -> 4N) = (T32/T8)/4 = {eff:.3f}** (target >= 0.8,
BASELINE.json).

Operator query times (sf={r32['sf']}, local[32]):
{json.dumps(r32['queries'], indent=1)}
"""
    (bench_dir / "BASELINE.md").write_text(md)
    print(json.dumps(summary["local8"]["crawl"]))
    print(json.dumps(summary["local32"]["crawl"]))
    print("efficiency:", eff)


if __name__ == "__main__":
    main()
