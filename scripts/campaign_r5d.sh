#!/bin/bash
# Round-5 phase 4 (chip): post-decimate-fold cache warm + regression
# check, then the 100k-step flagship convergence run (quality headline
# to convergence; the 30k A/Bs settled the DECISIONS, this measures the
# shipped default's trajectory further out).  Probe-gated: the tunnel
# was stalled at 11:35 UTC (device enumerates, trivial matmul hangs) —
# same failure mode as the round-4 outage.
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/campaign_r5d}
mkdir -p "$LOG"
run() {
  name=$1; shift
  echo "=== START $name $(date +%H:%M:%S)" | tee -a $LOG/campaign.log
  timeout "$@" > $LOG/$name.log 2>&1
  echo "=== END $name rc=$? $(date +%H:%M:%S)" | tee -a $LOG/campaign.log
  tail -c 2000 $LOG/$name.log >> $LOG/campaign.log
}
# probe loop: a matmul must reach the chip AND sync back (np.asarray is
# the only reliable fence over the relay) inside 5 min
until timeout 300 python -u -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((256, 256)); print(float(np.asarray(x @ x)[0, 0]))" \
    >> $LOG/probe.log 2>&1; do
  echo "probe failed $(date +%H:%M:%S); retry in 10 min" >> $LOG/probe.log
  sleep 600
done
echo "=== TUNNEL UP $(date +%H:%M:%S)" | tee -a $LOG/campaign.log
# 1. main bench: decimate fold changed BOTH f0 paths' graph hashes --
#    re-warm the AOT executable cache so the driver's end-of-round bench
#    starts warm, and regression-check the number (expect ~1330-1345x)
run bench_main 5400 python -u bench.py 128 4 ulaw8
# 2. harvest bench: same cache-warm + regression (expect ~360-376x)
run bench_harvest 3600 python -u scripts/bench_harvest.py 32 4
# 3. flagship quality trajectory to 100k steps (shipped defaults:
#    conditional critic, tanh decoder, alpha 50) vs the plain VAE
run conv_100k 21600 python -u scripts/convergence_ab.py --ab model \
  --steps 100000 --eval_every 10000 --logdir /tmp/vcc10_conv100k
echo "CAMPAIGN R5D DONE $(date)" | tee -a $LOG/campaign.log
