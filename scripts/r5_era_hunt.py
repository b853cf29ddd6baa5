#!/usr/bin/env python
"""Hunt for a fast-era host window and draw an 8->32 pair inside it.

Round-5 finding (BENCH/ANALYSIS.md "the 14M campaign"): a co-tenant
invisible to /proc/stat steal suppresses WIDE pinned legs only, so the
only reliable probe of the wide-leg era is a short wide leg itself.
This driver loops:

  1. probe: one pin32 @ 600k-doc leg (fast-era wall 86-99 s; degraded
     draws read 130-247 s).  The probe sample is appended to the
     r5_state_reps.jsonl distribution either way.
  2. if the probe wall <= --fast-thresh (default 105 s): the window is
     open -> immediately draw one bracketed adjacent 8->32 pair at
     --ndocs (default 10M) via r5_state_reps.py, then republish
     scaling.json.
  3. sleep --sleep seconds (default 1200) and repeat, until --max-pairs
     pairs were drawn or --max-probes probes spent.

Run detached; it writes a line-per-event log to BENCH/r5_era_hunt.log.
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
REPS = BENCH / "r5_state_reps.jsonl"
LOG = BENCH / "r5_era_hunt.log"


def log(msg: str) -> None:
    line = f"{time.strftime('%H:%M:%S')} {msg}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")


def last_rep() -> dict | None:
    try:
        return json.loads(REPS.read_text().strip().rsplit("\n", 1)[-1])
    except Exception:
        return None


def run_reps(ndocs: int, legs: str, leg_timeout: int) -> None:
    env = dict(os.environ, NDOCS=str(ndocs), DEPTH="7",
               LEG_TIMEOUT=str(leg_timeout))
    subprocess.run(
        [sys.executable, str(REPO / "scripts/r5_state_reps.py"),
         "--reps", "1", "--legs", legs],
        env=env, cwd=str(REPO), timeout=leg_timeout * 3 + 600,
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fast-thresh", type=float, default=105.0)
    ap.add_argument("--ndocs", type=int, default=10_000_000)
    ap.add_argument("--sleep", type=float, default=1200.0)
    ap.add_argument("--max-pairs", type=int, default=2)
    ap.add_argument("--max-probes", type=int, default=12)
    args = ap.parse_args()

    pairs = 0
    for probe_i in range(1, args.max_probes + 1):
        log(f"probe {probe_i}: pin32 @ 600k")
        run_reps(600_000, "32", 600)
        s = last_rep()
        if not s or s.get("ndocs") != 600_000 or s.get("cpus") != 32:
            log("probe leg failed; sleeping")
        else:
            log(f"probe wall {s['wall_sec']:.1f}s steal {s['cpu_steal_pct']}% "
                f"membw {s['membw_copy_gbs_before']}/{s['membw_copy_gbs_after']}")
            if s["wall_sec"] <= args.fast_thresh:
                log(f"FAST ERA -> drawing 8->32 pair at {args.ndocs}")
                run_reps(args.ndocs, "32,8", 2400)
                subprocess.run(
                    [sys.executable, str(REPO / "scripts/r5_publish_scaling2.py")],
                    cwd=str(REPO), stdout=subprocess.DEVNULL,
                )
                pairs += 1
                log(f"pair {pairs}/{args.max_pairs} drawn; scaling.json republished")
                if pairs >= args.max_pairs:
                    break
        time.sleep(args.sleep)
    log(f"hunt done: {pairs} pair(s) drawn")


if __name__ == "__main__":
    main()
