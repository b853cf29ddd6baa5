#!/usr/bin/env bash
# Round-5 pinned scaling triple (2/8/32 cores, 600k docs, depth 7) under
# calm-window gating: each leg waits for a <1% steal probe, runs once
# (bench.py's internal gate is disabled — this script owns retries), and
# is re-attempted until its measured in-run steal is below MAX_STEAL or
# attempts are exhausted; the lowest-steal attempt is kept (min-of-N is
# the honest statistic under one-sided noisy-neighbor noise).
# Order 32 -> 8 -> 2 so the corpus parquet cache is generated at full
# width once (a 2-core generation is ~12 min of pure Python).
# The 8-core leg also captures a Spark event log for the serial-floor
# (Amdahl S) attribution in BENCH/ANALYSIS.md.
set -u
cd /root/repo
MAX_STEAL="${MAX_STEAL:-4}"
ATTEMPTS="${ATTEMPTS:-4}"
NDOCS="${NDOCS:-600000}"
DEPTH="${DEPTH:-7}"

wait_calm() {
  for w in $(seq 1 120); do
    s=$(python - <<'PY'
import time
def stat():
    v=list(map(int,open("/proc/stat").readline().split()[1:]))
    return sum(v[:8]), v[7]
b=stat(); time.sleep(8); a=stat()
print(round(100*(a[1]-b[1])/max(1,(a[0]-b[0])),2))
PY
)
    ok=$(python -c "print(1 if $s < 1.0 else 0)")
    [ "$ok" = 1 ] && return 0
    sleep 8
  done
  return 1
}

run_leg() { # cpus cpulist name extra_env...
  local cpus="$1" cpulist="$2" name="$3"; shift 3
  local best=999
  for i in $(seq 1 "$ATTEMPTS"); do
    wait_calm
    taskset -ac "$cpulist" env SPARK_GRAFT_CPUS="$cpus" \
      SPARK_GRAFT_NDOCS="$NDOCS" SPARK_GRAFT_DEPTH="$DEPTH" \
      SPARK_GRAFT_SKIP_QUERIES=1 SPARK_GRAFT_STEAL_ATTEMPTS=1 \
      SPARK_GRAFT_CALM_WAIT=0 "$@" \
      timeout 1200 python -u bench.py 2>"BENCH/${name}_a${i}.err" \
      | tail -1 > "BENCH/${name}_a${i}.out"
    read -r wall steal <<EOF
$(python -c "
import json
try:
    d=json.load(open('BENCH/${name}_a${i}.out'))
    print(d['value'], d['crawl']['cpu_steal_pct'])
except Exception:
    print(999, 999)")
EOF
    echo "[$(date +%H:%M:%S)] $name attempt $i: wall=$wall steal=$steal"
    better=$(python -c "print(1 if $steal < $best else 0)")
    if [ "$better" = 1 ]; then best=$steal; cp "BENCH/${name}_a${i}.out" "BENCH/${name}.out"; fi
    done=$(python -c "print(1 if $best <= $MAX_STEAL else 0)")
    [ "$done" = 1 ] && { echo "$name: captured steal=$best"; return 0; }
  done
  echo "$name: best steal=$best (threshold $MAX_STEAL not met)"
  return 1
}

mkdir -p BENCH/eventlogs/r5
# eventlog path MUST be absolute: Spark builds file://$path and Hadoop
# rejects a relative authority ("Wrong FS: file://BENCH/...")
LEGS="${LEGS:-r5_pin32 r5_pin8 r5_pin2}"
for leg in $LEGS; do
  case "$leg" in
    r5_pin32) run_leg 32 0-31 r5_pin32 ;;
    r5_pin8)  run_leg 8  0-7  r5_pin8 SPARK_GRAFT_EVENTLOG=/root/repo/BENCH/eventlogs/r5 ;;
    r5_pin2)  run_leg 2  0-1  r5_pin2 ;;
  esac
done
echo DONE
