#!/usr/bin/env bash
# Retry one pinned leg until a low-steal run is captured (keeps best).
set -u
cd /root/repo
cpus="$1"; cpulist="$2"; name="$3"; max_steal="$4"; attempts="$5"
best=999
for i in $(seq 1 "$attempts"); do
  for w in $(seq 1 60); do
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
    [ "$ok" = 1 ] && break
    sleep 6
  done
  taskset -ac "$cpulist" env SPARK_GRAFT_CPUS="$cpus" SPARK_GRAFT_NDOCS=600000 SPARK_GRAFT_DEPTH=7 SPARK_GRAFT_SKIP_QUERIES=1 \
    timeout 900 python -u bench.py 2>"BENCH/${name}_a${i}.err" | tail -1 > "BENCH/${name}_a${i}.out"
  steal=$(python -c "
import json
try: print(json.load(open('BENCH/${name}_a${i}.out'))['crawl']['cpu_steal_pct'])
except Exception: print(999)")
  wall=$(python -c "
import json
try: print(json.load(open('BENCH/${name}_a${i}.out'))['value'])
except Exception: print(999)")
  echo "$name attempt $i: wall=$wall steal=$steal"
  better=$(python -c "print(1 if $steal < $best else 0)")
  if [ "$better" = 1 ]; then best=$steal; cp "BENCH/${name}_a${i}.out" "BENCH/${name}.out"; fi
  done=$(python -c "print(1 if $best <= $max_steal else 0)")
  [ "$done" = 1 ] && { echo "$name: captured steal=$best"; exit 0; }
done
echo "$name: best steal=$best (threshold $max_steal not met)"
