"""Stage-level profile from a Spark event log (the round-2 profiling tool
for the N-vs-4N scaling analysis).

For each stage: wall (completion - submission), summed task run time, GC,
shuffle bytes, python (Arrow UDF) time, task count.  Also derives the
driver-idle floor: app wall minus the union of stage-wall intervals — the
time no stage was running (job submission gaps, planning, commit I/O).

Usage: python scripts/analyze_eventlog.py <eventlog-path-or-dir> [topN]
"""

from __future__ import annotations

import json
import sys
from collections import defaultdict
from pathlib import Path


def load_events(path: Path):
    if path.is_dir():  # eventLog v2 rolling dir
        files = sorted(p for p in path.iterdir() if "events" in p.name or p.name.startswith("eventlog"))
        if not files:
            files = [p for p in path.iterdir() if p.is_file()]
    else:
        files = [path]
    for f in files:
        if f.name.endswith(".zstd"):
            import io

            import pyarrow as pa

            fh = io.TextIOWrapper(
                pa.CompressedInputStream(pa.OSFile(str(f), "rb"), "zstd"),
                errors="replace",
            )
        else:
            fh = open(f, errors="replace")
        with fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                try:
                    obj = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if isinstance(obj, dict):
                    yield obj


def main():
    path = Path(sys.argv[1])
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 15

    stages = {}          # (stage_id, attempt) -> dict
    task_agg = defaultdict(lambda: defaultdict(float))
    app_start = app_end = None

    for ev in load_events(path):
        e = ev.get("Event", "")
        if e == "SparkListenerApplicationStart":
            app_start = ev["Timestamp"]
        elif e == "SparkListenerApplicationEnd":
            app_end = ev["Timestamp"]
        elif e == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            key = (si["Stage ID"], si["Stage Attempt ID"])
            stages[key] = {
                "name": si["Stage Name"].split("\n")[0][:70],
                "tasks": si["Number of Tasks"],
                "submit": si.get("Submission Time"),
                "complete": si.get("Completion Time"),
            }
        elif e == "SparkListenerTaskEnd":
            key = (ev["Stage ID"], ev["Stage Attempt ID"])
            tm = ev.get("Task Metrics") or {}
            a = task_agg[key]
            a["run"] += tm.get("Executor Run Time", 0)
            a["gc"] += tm.get("JVM GC Time", 0)
            a["cpu"] += tm.get("Executor CPU Time", 0) / 1e6  # ns -> ms
            a["deser"] += tm.get("Executor Deserialize Time", 0)
            a["result_ser"] += tm.get("Result Serialization Time", 0)
            srm = tm.get("Shuffle Read Metrics") or {}
            swm = tm.get("Shuffle Write Metrics") or {}
            a["sh_read"] += srm.get("Local Bytes Read", 0) + srm.get("Remote Bytes Read", 0)
            a["sh_write"] += swm.get("Shuffle Bytes Written", 0)
            a["sh_write_ms"] += swm.get("Shuffle Write Time", 0) / 1e6
            a["sh_fetch_ms"] += srm.get("Fetch Wait Time", 0)
            a["spill_mem"] += tm.get("Memory Bytes Spilled", 0)
            a["spill_disk"] += tm.get("Disk Bytes Spilled", 0)
            a["peak_mem"] = max(a["peak_mem"], tm.get("Peak Execution Memory", 0))
            # python/Arrow time is in accumulables on the task end
            for acc in ev.get("Task End Reason", {}) and []:
                pass

    # stage wall intervals -> busy time union
    ivals = sorted(
        (s["submit"], s["complete"])
        for s in stages.values()
        if s.get("submit") and s.get("complete")
    )
    busy = 0
    cur_s = cur_e = None
    for s, e in ivals:
        if cur_e is None or s > cur_e:
            if cur_e is not None:
                busy += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    if cur_e is not None:
        busy += cur_e - cur_s

    wall = (app_end - app_start) if app_start and app_end else None
    rows = []
    for key, s in stages.items():
        a = task_agg.get(key, {})
        rows.append(
            {
                "stage": key[0],
                "name": s["name"],
                "tasks": s["tasks"],
                "wall_s": ((s["complete"] or 0) - (s["submit"] or 0)) / 1000,
                "task_run_s": a.get("run", 0) / 1000,
                "task_cpu_s": a.get("cpu", 0) / 1000,
                "gc_s": a.get("gc", 0) / 1000,
                "sh_read_mb": a.get("sh_read", 0) / 1e6,
                "sh_write_mb": a.get("sh_write", 0) / 1e6,
                "spill_mb": (a.get("spill_mem", 0) + a.get("spill_disk", 0)) / 1e6,
                "peak_mem_mb": a.get("peak_mem", 0) / 1e6,
            }
        )

    # aggregate by stage-name (same operator across waves)
    by_name = defaultdict(lambda: defaultdict(float))
    for r in rows:
        g = by_name[r["name"]]
        g["wall_s"] += r["wall_s"]
        g["task_run_s"] += r["task_run_s"]
        g["task_cpu_s"] += r["task_cpu_s"]
        g["gc_s"] += r["gc_s"]
        g["sh_read_mb"] += r["sh_read_mb"]
        g["sh_write_mb"] += r["sh_write_mb"]
        g["spill_mb"] += r["spill_mb"]
        g["peak_mem_mb"] = max(g["peak_mem_mb"], r["peak_mem_mb"])
        g["n"] += 1

    if wall:
        print(f"app wall: {wall/1000:.1f}s  stage-busy: {busy/1000:.1f}s  "
              f"driver-idle/floor: {(wall-busy)/1000:.1f}s "
              f"({100*(wall-busy)/wall:.0f}% of wall)")
    print(f"\ntop {top_n} stage groups by summed wall:")
    print(f"{'wall_s':>8} {'runT_s':>8} {'cpuT_s':>8} {'gc_s':>6} "
          f"{'rd_MB':>8} {'wr_MB':>8} {'spill_MB':>9} {'peak_MB':>8} {'n':>3}  name")
    for name, g in sorted(by_name.items(), key=lambda kv: -kv[1]["wall_s"])[:top_n]:
        print(
            f"{g['wall_s']:8.1f} {g['task_run_s']:8.1f} {g['task_cpu_s']:8.1f} "
            f"{g['gc_s']:6.1f} {g['sh_read_mb']:8.0f} {g['sh_write_mb']:8.0f} "
            f"{g['spill_mb']:9.0f} {g['peak_mem_mb']:8.0f} "
            f"{int(g['n']):3d}  {name}"
        )


if __name__ == "__main__":
    main()
