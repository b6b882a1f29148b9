#!/bin/bash
# Round-5 campaign resume: the tail of campaign_r5.sh (the first five
# steps completed 06:29-06:45; the session hosting the shell died while
# streaming_paced was compiling).  Run detached (setsid) so it survives.
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/campaign_r5}
mkdir -p "$LOG"
run() {
  name=$1; shift
  echo "=== START $name $(date +%H:%M:%S)" | tee -a $LOG/campaign.log
  timeout "$@" > $LOG/$name.log 2>&1
  echo "=== END $name rc=$? $(date +%H:%M:%S)" | tee -a $LOG/campaign.log
  tail -c 2000 $LOG/$name.log >> $LOG/campaign.log
}
run streaming_paced 10800 python -u scripts/bench_streaming.py --skip-single --ticks 100
run ab_critic 14400 python -u scripts/convergence_ab.py --ab critic --logdir /tmp/vcc10_critic
run ab_alpha  21600 python -u scripts/convergence_ab.py --ab alpha --logdir /tmp/vcc10_alpha
run ab_hard   14400 python -u scripts/convergence_ab.py --ab model --style hard --root /tmp/vcc10_hard --logdir /tmp/vcc10_hard_conv
echo "CAMPAIGN DONE $(date)" | tee -a $LOG/campaign.log
