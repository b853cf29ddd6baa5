#!/bin/bash
# Round-5 closing campaign: two more adjacent 2->8 blocks at 10M
# (legs 2,8,8,2 -> publisher forms adj(2,8) and adj(8,2)), seeking a
# probe-certified (spread <1.6) draw of the criterion's largest cell.
cd /root/repo
{
  NDOCS=10000000 DEPTH=7 LEG_TIMEOUT=4200 \
    python scripts/r5_state_reps.py --reps 1 --legs 2,8,8,2
  echo "REDRAWS-DONE rc=$?"
} >> BENCH/r5_28_redraws.log 2>&1
