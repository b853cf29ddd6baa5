#!/usr/bin/env bash
# Pinned scaling triple: whole process tree confined to exactly N cores.
set -u
cd /root/repo
wait_calm() {
  for w in $(seq 1 90); do
    s=$(python - <<'PY'
import time
def stat():
    v=list(map(int,open("/proc/stat").readline().split()[1:]))
    return sum(v[:8]), v[7]
b=stat(); time.sleep(6); a=stat()
print(round(100*(a[1]-b[1])/max(1,(a[0]-b[0])),2))
PY
)
    ok=$(python -c "print(1 if $s < 1.0 else 0)")
    [ "$ok" = 1 ] && return 0
    sleep 4
  done
  return 1
}
run_leg() { # cores cpulist out
  wait_calm
  taskset -ac "$2" env SPARK_GRAFT_CPUS="$1" SPARK_GRAFT_NDOCS=600000 SPARK_GRAFT_DEPTH=7 SPARK_GRAFT_SKIP_QUERIES=1 \
    timeout 900 python -u bench.py 2>"BENCH/$3.err" | tail -1 > "BENCH/$3.out"
  python - <<PY
import json
d=json.load(open("BENCH/$3.out"))
print("$3 wall", d["value"], "steal", d["crawl"]["cpu_steal_pct"])
PY
}
run_leg 8  0-7  r4_pin8
run_leg 2  0-1  r4_pin2
run_leg 32 0-31 r4_pin32
