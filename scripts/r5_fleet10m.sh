#!/usr/bin/env bash
# Round-5: fleet x 10M combined cell (round-4 VERDICT Next #7).
# r4 proved single-crawl 10M (1071.5 s, 193k/s, 10.8M nodes) and
# 2,000-crawl fleets at 600k SEPARATELY; this cell combines them: a
# 10-member fleet over the 10M-doc corpus — registry, store compaction,
# and the adaptive bloom gate all active at combined frontier state
# ~10^8 links/wave, the closest sandbox analogue of the production
# multi-tenant shape.
#
# Shape: default closed-corpus knobs (same corpus key as the r4 10M
# cell), fleet depth 5 (branching ~19 => per-member cumulative fetch
# ~2.6M, combined ~26M fetched / ~3.7x10^8 extracted links, ~10^8 at the peak
# wave).  Headline single crawl is kept cheap (depth 2) — the fleet
# section is the measurement.  Store compaction every 3 waves exercises
# compaction under the fleet's shared wave-dir chain.
set -u
cd /root/repo
mkdir -p BENCH
env SPARK_GRAFT_NDOCS=10000000 SPARK_GRAFT_DEPTH=2 \
  SPARK_GRAFT_FLEET=10 SPARK_GRAFT_FLEET_DEPTH=5 \
  SPARK_GRAFT_STORE_COMPACT=3 \
  SPARK_GRAFT_SKIP_QUERIES=1 \
  SPARK_GRAFT_STEAL_ATTEMPTS=1 SPARK_GRAFT_CALM_WAIT=300 \
  timeout 7200 python -u bench.py 2>BENCH/r5_fleet10m.err \
  | tail -1 > BENCH/r5_fleet10m.out
python - <<'PY'
import json
d = json.load(open("BENCH/r5_fleet10m.out"))
print(json.dumps({"crawl": d["crawl"], "fleet": d.get("fleet")}, indent=1))
PY
echo DONE
