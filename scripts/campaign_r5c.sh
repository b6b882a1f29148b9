#!/bin/bash
# Round-5 phase 3 (chip): waits for phase 2, then re-runs the hard-corpus
# model A/B on a PARALLEL-seeded corpus (data/synthetic.py make_corpus
# parallel=True) so the framewise conversion MCD is meaningful — the
# phase-1 run (kept as scale_validation.json convergence_ab_hard_
# nonparallel) measured ~36 dB of pure content mismatch.
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/campaign_r5}
mkdir -p "$LOG"
until grep -q "CAMPAIGN R5B DONE" $LOG/campaign.log 2>/dev/null; do sleep 60; done
run() {
  name=$1; shift
  echo "=== START $name $(date +%H:%M:%S)" | tee -a $LOG/campaign.log
  timeout "$@" > $LOG/$name.log 2>&1
  echo "=== END $name rc=$? $(date +%H:%M:%S)" | tee -a $LOG/campaign.log
  tail -c 2000 $LOG/$name.log >> $LOG/campaign.log
}
run ab_hard_par 14400 python -u scripts/convergence_ab.py --ab model \
  --style hard --root /tmp/vcc10_hardp --logdir /tmp/vcc10_hardp_conv
echo "CAMPAIGN R5C DONE $(date)" | tee -a $LOG/campaign.log
