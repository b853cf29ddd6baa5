#!/usr/bin/env bash
# Run bench.py in a calm CPU-steal window: waits for steal <1%, runs,
# then re-runs (up to N attempts) if the run itself saw steal above the
# threshold.  Usage: calm_bench.sh OUT_PREFIX MAX_STEAL_PCT ATTEMPTS [env assignments...]
set -u
out="$1"; max="$2"; attempts="$3"; shift 3
for i in $(seq 1 "$attempts"); do
  # wait for a calm window (up to ~10 min)
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
    sleep 4
  done
  env "$@" timeout 590 python -u bench.py 2>"${out}_try${i}.err" | tail -1 > "${out}_try${i}.out"
  steal=$(python -c "
import json,sys
try:
    d=json.load(open('${out}_try${i}.out'))
    print(d['crawl']['cpu_steal_pct'])
except Exception:
    print(999)")
  echo "attempt $i: steal=$steal $(cat ${out}_try${i}.out | head -c 200)"
  ok=$(python -c "print(1 if $steal <= $max else 0)")
  if [ "$ok" = 1 ]; then cp "${out}_try${i}.out" "${out}.out"; exit 0; fi
done
echo "no calm run achieved; keeping last attempt"
cp "${out}_try${attempts}.out" "${out}.out" 2>/dev/null
exit 1
