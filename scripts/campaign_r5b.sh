#!/bin/bash
# Round-5 phase 2 (chip): waits for the phase-1 campaign to finish, then
#  1. A/B/A the merged single-pass refine kernel IN the pipeline
#     (TPUVC_REFINE=merged vs split, scripts/bench_harvest.py — per the
#     r5 rule that isolated-kernel wins must be confirmed end-to-end),
#  2. re-run the headline bench (AOT warm start),
#  3. dump the optimized harvest HLO and attribute the untagged ops the
#     roofline's 24% "other" bucket is made of (scripts/dump_hlo.py).
# Run detached (setsid) so it survives the session.
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/campaign_r5}
mkdir -p "$LOG"
until grep -q "CAMPAIGN DONE" $LOG/campaign.log 2>/dev/null; do sleep 60; done
run() {
  name=$1; shift
  echo "=== START $name $(date +%H:%M:%S)" | tee -a $LOG/campaign.log
  timeout "$@" > $LOG/$name.log 2>&1
  echo "=== END $name rc=$? $(date +%H:%M:%S)" | tee -a $LOG/campaign.log
  tail -c 2000 $LOG/$name.log >> $LOG/campaign.log
}
run hv_split   3600 python -u scripts/bench_harvest.py 32 4
run hv_merged  3600 env TPUVC_REFINE=merged python -u scripts/bench_harvest.py 32 4
run hv_split2  3600 python -u scripts/bench_harvest.py 32 4
run bench_warm 3600 python -u bench.py
run dump_hlo   3600 python -u scripts/dump_hlo.py 32 --f0-method harvest \
  --ops while.62,while.65,while.66,fusion.1278,fusion.1285,fusion.1291,reverse.19,reverse.20,copy.13684 \
  --out $LOG/harvest_hlo.txt
echo "CAMPAIGN R5B DONE $(date)" | tee -a $LOG/campaign.log
