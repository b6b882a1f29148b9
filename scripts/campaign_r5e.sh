#!/bin/bash
# Round-5 phase 5 (chip):
# (a) in-pipeline A/B of the fused top-2 block-scan kernel
#     (ops/pallas_events.top2_block_scans, TPUVC_SCAN) on BOTH f0 paths
#     — back-to-back with a same-session baseline rep so relay weather
#     cancels; the post-fold roofline attributed hv_event_tracks' 46
#     ms / 325 GB/s largely to the lax.cummax ladders it replaces,
# (b) the closing harvest stage table post blocked-_fix_step1,
# (c) a 100k-step hard-corpus trajectory (the 30k run settled the
#     DECISIONS; this measures how far the shipped defaults converge on
#     hard content).  Probe-gated like campaign_r5d (the tunnel stalls
#     with the device still enumerating); bounded so the chip is free
#     well before the driver's end-of-round bench.
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/campaign_r5e}
mkdir -p "$LOG"
run() {
  name=$1; shift
  echo "=== START $name $(date +%H:%M:%S)" | tee -a $LOG/campaign.log
  timeout "$@" > $LOG/$name.log 2>&1
  echo "=== END $name rc=$? $(date +%H:%M:%S)" | tee -a $LOG/campaign.log
  tail -c 2000 $LOG/$name.log >> $LOG/campaign.log
}
until timeout 300 python -u -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((256, 256)); print(float(np.asarray(x @ x)[0, 0]))" \
    >> $LOG/probe.log 2>&1; do
  echo "probe failed $(date +%H:%M:%S); retry in 10 min" >> $LOG/probe.log
  sleep 600
done
echo "=== TUNNEL UP $(date +%H:%M:%S)" | tee -a $LOG/campaign.log
# fused block-scan A/B, harvest path (baseline rep first: AOT-warm)
run hv_scan_xla    3600 python -u scripts/bench_harvest.py 32 4
run hv_scan_pallas 3600 env TPUVC_SCAN=pallas python -u scripts/bench_harvest.py 32 4
# fused block-scan A/B, DIO main path (baseline 11:49 UTC = 1333.0x)
run main_scan_pallas 5400 env TPUVC_SCAN=pallas python -u bench.py 128 4 ulaw8
# closing harvest stage table (blocked _fix_step1 tree; default scan)
run roofline_post_fix1 3600 python -u scripts/roofline.py 32 \
  --f0-method harvest --trace_dir /tmp/tpuvc_trace_r5_fix1
run conv_100k_hard 16200 python -u scripts/convergence_ab.py --ab model \
  --steps 100000 --eval_every 10000 --style hard \
  --root /tmp/vcc10_hardp --logdir /tmp/vcc10_hardp_conv100k
echo "CAMPAIGN R5E DONE $(date)" | tee -a $LOG/campaign.log
