#!/bin/bash
# Round-5 phase 6 (chip): after the r5e roofline finishes, (a) re-warm
# the DEFAULT main-bench AOT executable cache on the current tree (the
# dio.py scan-branch edit changed the module hash, so the driver's
# end-of-round bench would otherwise pay a cold compile) and take a
# fresh headline rep, then (b) the 100k-step hard-corpus trajectory —
# LAST, because it is the one piece that can safely be cut off by the
# round ending (partial_results.json saves per-eval).
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/campaign_r5f}
mkdir -p "$LOG"
run() {
  name=$1; shift
  echo "=== START $name $(date +%H:%M:%S)" | tee -a $LOG/campaign.log
  timeout "$@" > $LOG/$name.log 2>&1
  echo "=== END $name rc=$? $(date +%H:%M:%S)" | tee -a $LOG/campaign.log
  tail -c 2000 $LOG/$name.log >> $LOG/campaign.log
}
# wait for the r5e roofline to release the device: only one process can
# hold the TPU, so the probe doubles as the device-free gate (it fails
# or hangs into its timeout while the roofline runs)
until timeout 300 python -u -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((256, 256)); print(float(np.asarray(x @ x)[0, 0]))" \
    >> $LOG/probe.log 2>&1; do
  echo "probe failed $(date +%H:%M:%S); retry in 2 min" >> $LOG/probe.log
  sleep 120
done
echo "=== TUNNEL UP $(date +%H:%M:%S)" | tee -a $LOG/campaign.log
run bench_main_warm 5400 python -u bench.py 128 4 ulaw8
run conv_100k_hard 14400 python -u scripts/convergence_ab.py --ab model \
  --steps 100000 --eval_every 10000 --style hard \
  --root /tmp/vcc10_hardp --logdir /tmp/vcc10_hardp_conv100k
echo "CAMPAIGN R5F DONE $(date)" | tee -a $LOG/campaign.log
