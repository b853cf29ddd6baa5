"""Memory-bandwidth ceiling probe: the missing link in the scaling ledger.

Round-2 ANALYSIS attributed the local[8]->local[32] scaling ceiling to
DRAM-bandwidth saturation (per-core throughput 27.8k->16.0k->3.6k at
2->8->32 threads tracks a saturation curve) but never measured memory
bandwidth directly — this probe does.  Each worker process streams over
a numpy array far larger than LLC (copy = read+write, sum = read-only)
for a fixed duration; the aggregate GB/s at 1/2/8/32 processes is the
machine's effective bandwidth curve.  If aggregate bandwidth stops
growing past ~8 workers while per-worker bandwidth collapses, a
memory-bound Spark job CANNOT scale past that point on this box no
matter the plan — the 0.8 efficiency target then requires a real
multi-socket/multi-node 4x cluster, which multiplies DRAM channels with
the cores (the regime the north rule's N->4N criterion assumes).

Usage: python scripts/membw_probe.py [--levels 1,2,8,32] [--secs 6]
Prints one JSON line per (mode, level) plus a summary.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import time

import numpy as np

ARR_MB = 256  # per-process working set, >> any LLC


def _cpu_stat():
    try:
        with open("/proc/stat") as f:
            v = list(map(int, f.readline().split()[1:]))
        steal = v[7] if len(v) > 7 else 0
        busy = v[0] + v[1] + v[2] + v[5] + v[6] + steal
        return busy, steal
    except (OSError, ValueError, IndexError):
        return 0, 0


def _worker(mode: str, secs: float, start_evt, out_q) -> None:
    n = ARR_MB * 1024 * 1024 // 8
    src = np.ones(n, dtype=np.float64)
    dst = np.empty_like(src) if mode == "copy" else None
    # touch everything once (page-in outside the timed window)
    src.sum()
    if dst is not None:
        np.copyto(dst, src)
    start_evt.wait()
    t0 = time.perf_counter()
    moved = 0
    while True:
        if mode == "copy":
            np.copyto(dst, src)
            moved += 2 * src.nbytes  # read + write streams
        else:
            src.sum()
            moved += src.nbytes  # read stream
        dt = time.perf_counter() - t0
        if dt >= secs:
            out_q.put((moved, dt))
            return


def run_level(mode: str, nproc: int, secs: float) -> dict:
    ctx = mp.get_context("fork")
    start_evt = ctx.Event()
    out_q = ctx.Queue()
    procs = [
        ctx.Process(target=_worker, args=(mode, secs, start_evt, out_q))
        for _ in range(nproc)
    ]
    for p in procs:
        p.start()
    time.sleep(1.0)  # let allocations/page-ins finish
    s0 = _cpu_stat()
    start_evt.set()
    results = [out_q.get() for _ in procs]
    s1 = _cpu_stat()
    for p in procs:
        p.join()
    gbps = sum(m / dt for m, dt in results) / 1e9
    db, ds = s1[0] - s0[0], s1[1] - s0[1]
    return {
        "mode": mode,
        "procs": nproc,
        "aggregate_gbps": round(gbps, 2),
        "per_proc_gbps": round(gbps / nproc, 2),
        "cpu_steal_pct": round(100.0 * ds / db, 2) if db else 0.0,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", default="1,2,8,32")
    ap.add_argument("--secs", type=float, default=6.0)
    ap.add_argument("--modes", default="copy,sum")
    args = ap.parse_args()
    levels = [int(x) for x in args.levels.split(",")]
    out = []
    for mode in args.modes.split(","):
        for lv in levels:
            r = run_level(mode, lv, args.secs)
            out.append(r)
            print(json.dumps(r), flush=True)
    # scaling efficiency of the memory system itself between level pairs
    for mode in args.modes.split(","):
        ms = [r for r in out if r["mode"] == mode]
        for a, b in zip(ms, ms[1:]):
            eff = (
                b["aggregate_gbps"]
                / a["aggregate_gbps"]
                / (b["procs"] / a["procs"])
            )
            print(
                json.dumps(
                    {
                        "mode": mode,
                        "pair": f"{a['procs']}->{b['procs']}",
                        "bw_scaling_efficiency": round(eff, 3),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
