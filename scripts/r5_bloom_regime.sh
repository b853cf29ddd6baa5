#!/usr/bin/env bash
# Round-5: construct the bloom prefilter's POSITIVE-payoff regime — or
# disprove it honestly (round-4 VERDICT Missing #2 / Next #2).
#
# Why round 4 measured a negative result: CLOSED corpora saturate — by
# the time the seen set crosses bloom_min_seen=5M, nearly the whole link
# universe is discovered, every candidate is a duplicate, the bloom
# certifies ~0.3% and the verdict UDF is pure tax (the adaptive gate now
# trips it off).  The production web is the OPPOSITE shape: a 10^10-URL
# frontier never saturates its universe, so waves stay FRESH-heavy while
# the seen set is enormous — exactly where a negative-certifying filter
# cuts the exact anti-join's probe side.
#
# Open-universe construction (corpus-shape knobs, no external data):
#   dead_link_pct=400  -> URL universe = 5 x n_docs (404 targets carry
#                         no document rows: a big universe is cheap)
#   dup_pct=0 hot_pct=5 -> near-uniform link targets, minimal in-page
#                         and hot-host duplication
#   bench default spans 3-10 / links-per-span<=10 -> ~21 links/doc,
#                         live branching ~5: BFS keeps expanding
#                         instead of converging early
# At n_docs=2M the universe is 10M URLs; seen crosses the production
# bloom_min_seen=5M mid-crawl while ~50% of each wave's candidates are
# still undiscovered -> expected bloom cut ~50% >> the 5% adaptive gate.
#
# Cells:
#   cal  — 200k docs, min_seen=300k, bloom on: fast shape validation
#          (per-wave cut_pct in the JSON must be >> gate on activated
#          waves; if it is not, the big cell is pointless — stop).
#   on   — 2M docs, min_seen=5M (production default), bloom on
#   off  — same corpus, SPARK_GRAFT_NO_BLOOM=1
# Success = on-arm cut >= bloom_min_cut_frac AND wall(on) <= wall(off).
# Either way the per-wave candidates/exact_join_input/cut_pct evidence
# rides the JSON for ANALYSIS.md.
set -u
cd /root/repo
ATTEMPTS="${ATTEMPTS:-2}"
OUTDIR=BENCH
mkdir -p "$OUTDIR"

OPEN_SHAPE=(
  SPARK_GRAFT_DEAD_PCT=400 SPARK_GRAFT_DUP_PCT=0 SPARK_GRAFT_HOT_PCT=5
  SPARK_GRAFT_DEPTH=8 SPARK_GRAFT_SKIP_QUERIES=1
)

run_cell() { # name extra_env...
  local name="$1"; shift
  for i in $(seq 1 "$ATTEMPTS"); do
    env "${OPEN_SHAPE[@]}" "$@" \
      SPARK_GRAFT_STEAL_ATTEMPTS=2 SPARK_GRAFT_CALM_WAIT=600 \
      timeout 3000 python -u bench.py 2>"$OUTDIR/${name}_a${i}.err" \
      | tail -1 > "$OUTDIR/${name}_a${i}.out"
    python - "$OUTDIR/${name}_a${i}.out" <<'PY'
import json, sys
try:
    d = json.load(open(sys.argv[1]))
    c = d["crawl"]
    print(f"  wall={d['value']} steal={c['cpu_steal_pct']} "
          f"urls={c.get('urls_processed')} "
          f"cut={c.get('bloom_join_input_cut_pct')} "
          f"waves={len(c.get('bloom_waves') or [])} activated")
except Exception as e:
    print("  PARSE FAIL:", e)
PY
    ok=$(python -c "
import json
try:
    d=json.load(open('$OUTDIR/${name}_a${i}.out'))
    print(1 if d['crawl']['cpu_steal_pct'] <= 6 else 0)
except Exception:
    print(0)")
    if [ "$ok" = 1 ]; then cp "$OUTDIR/${name}_a${i}.out" "$OUTDIR/${name}.out"; return 0; fi
  done
  # keep the lowest-steal attempt anyway
  python - "$OUTDIR" "$name" "$ATTEMPTS" <<'PY'
import json, shutil, sys
out, name, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
best, bs = None, 1e9
for i in range(1, n + 1):
    p = f"{out}/{name}_a{i}.out"
    try:
        s = json.load(open(p))["crawl"]["cpu_steal_pct"]
    except Exception:
        continue
    if s < bs:
        best, bs = p, s
if best:
    shutil.copy(best, f"{out}/{name}.out")
PY
  return 1
}

echo "[$(date +%H:%M:%S)] calibration cell (200k open corpus)"
run_cell r5_bloom_cal \
  SPARK_GRAFT_NDOCS=200000 SPARK_GRAFT_BLOOM_MIN_SEEN=300000

cut=$(python -c "
import json
try:
    d=json.load(open('BENCH/r5_bloom_cal.out'))
    print(d['crawl'].get('bloom_join_input_cut_pct') or 0)
except Exception:
    print(0)")
echo "[$(date +%H:%M:%S)] calibration cut_pct=$cut"
gate_ok=$(python -c "print(1 if $cut >= 5 else 0)")
if [ "$gate_ok" != 1 ]; then
  echo "calibration cut below gate — open shape does NOT produce the regime; stopping"
  exit 1
fi

echo "[$(date +%H:%M:%S)] big cell ON (2M docs, universe 10M, min_seen=5M)"
run_cell r5_bloom_on \
  SPARK_GRAFT_NDOCS=2000000 SPARK_GRAFT_BLOOM_MIN_SEEN=5000000

echo "[$(date +%H:%M:%S)] big cell OFF (same corpus)"
run_cell r5_bloom_off \
  SPARK_GRAFT_NDOCS=2000000 SPARK_GRAFT_NO_BLOOM=1

python - <<'PY'
import json
on = json.load(open("BENCH/r5_bloom_on.out"))
off = json.load(open("BENCH/r5_bloom_off.out"))
c = on["crawl"]
print(json.dumps({
    "wall_on": on["value"], "steal_on": c["cpu_steal_pct"],
    "wall_off": off["value"], "steal_off": off["crawl"]["cpu_steal_pct"],
    "cut_pct": c.get("bloom_join_input_cut_pct"),
    "candidates": c.get("bloom_candidates_tested"),
    "exact_join_input": c.get("bloom_exact_join_input"),
    "activated_waves": c.get("bloom_waves"),
}, indent=1))
PY
echo DONE
