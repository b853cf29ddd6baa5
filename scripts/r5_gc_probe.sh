#!/bin/bash
# Discriminate the 14M pin32 off-trend walls (0.38 8->32 vs 0.71 at 10M):
# co-tenant membw pressure (host) vs GC/heap churn at 4x allocation rate
# (engine).  Waits for a calm steal window, then runs ONE pin32 14M leg
# with JVM GC logging + Spark event log enabled.  GC seconds are
# attributable even under moderate contention; the event log gives the
# per-stage split for scripts/analyze_eventlog.py.
set -u
REPO=/root/repo
CALM_LIMIT=${CALM_LIMIT:-2.0}
MAX_WAIT=${MAX_WAIT:-3600}

steal() {
  python - <<'EOF'
import time
def stat():
    v = list(map(int, open("/proc/stat").readline().split()[1:]))
    return sum(v[:8]), v[7]
b = stat(); time.sleep(20); a = stat()
print(round(100.0*(a[1]-b[1])/max(1,a[0]-b[0]), 2))
EOF
}

waited=0
while true; do
  s=$(steal)
  echo "steal probe: $s% (waited ${waited}s)" >&2
  awk -v s="$s" -v lim="$CALM_LIMIT" 'BEGIN{exit !(s<=lim)}' && break
  waited=$((waited+60))
  [ "$waited" -ge "$MAX_WAIT" ] && { echo "no calm window in ${MAX_WAIT}s; running anyway" >&2; break; }
  sleep 40
done

export SPARK_GRAFT_JAVA_OPTS="-Xlog:gc:file=${REPO}/BENCH/r5i_gc_pin32_14m.log:time,uptime"
export SPARK_GRAFT_EVENTLOG=/dev/shm/spark_graft_bench/evlog_14m32
export NDOCS=14000000 DEPTH=7 LEG_TIMEOUT=1800
exec python "$REPO/scripts/r5_state_reps.py" --reps 1 --legs 32
