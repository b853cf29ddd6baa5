#!/bin/bash
# Final calmest-window 10M campaign (round 5, fresh-boot host state):
# one pin32 warm-up leg (pays corpus generation + probes the wide-leg
# era), then legs 32,8,8,2 so the publisher forms one adjacent 8->32
# block and one adjacent 2->8 block, all probe-bracketed.
cd /root/repo
{
  NDOCS=10000000 DEPTH=7 LEG_TIMEOUT=2400 \
    python scripts/r5_state_reps.py --reps 1 --legs 32 &&
  NDOCS=10000000 DEPTH=7 LEG_TIMEOUT=4200 \
    python scripts/r5_state_reps.py --reps 1 --legs 32,8,8,2
  echo "TRIPLE-DONE rc=$?"
} >> BENCH/r5_final_calm_triple.log 2>&1
