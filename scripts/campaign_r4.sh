#!/bin/bash
# Round-4 on-chip measurement campaign (blocked by the axon tunnel outage
# during round 4 — see docs/PERFORMANCE.md round-4 notes).  Run from the
# repo root when `timeout 300 python -c "import jax; print(jax.devices())"`
# answers.  Sequential (ONE process may hold the TPU), per-step timeouts,
# keeps going on failure; logs land in $LOG.
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/campaign_r4}
mkdir -p "$LOG"
run() {
  name=$1; shift
  echo "=== START $name $(date +%H:%M:%S)" | tee -a $LOG/campaign.log
  timeout "$@" > $LOG/$name.log 2>&1
  echo "=== END $name rc=$? $(date +%H:%M:%S)" | tee -a $LOG/campaign.log
  tail -c 2000 $LOG/$name.log >> $LOG/campaign.log
}
run probe       600 python -u -c "import jax; print(jax.devices()); import jax.numpy as jnp, numpy as np; print(np.asarray(jnp.arange(4.)*2))"
# kernel smoke: stonemask fused K=1 + harvest K=10 skip_empty on hardware
run sm_pallas   2400 env TPUVC_HARMONICS=pallas python -u scripts/bench_harmonics.py 128 4
run sm_xla      2400 env TPUVC_HARMONICS=xla    python -u scripts/bench_harmonics.py 128 4
run harvest_pallas 3600 env TPUVC_HARMONICS=pallas python -u scripts/bench_harvest.py 32 4
run harvest_xla    3600 env TPUVC_HARMONICS=xla python -u scripts/bench_harvest.py 32 4
run harvest_decim2 3600 env TPUVC_HARMONICS=pallas python -u scripts/bench_harvest.py 32 4 2
run roofline_harvest 3600 env TPUVC_HARMONICS=pallas python -u scripts/roofline.py 32 --f0-method harvest
run bench_both  5400 python -u bench.py 128 4 both
run streaming   5400 python -u scripts/bench_streaming.py 0.5 1.0 2.0
run ab_act   14400 python -u scripts/convergence_ab.py --ab output_activation --logdir /tmp/vcc10_act
run ab_model 14400 python -u scripts/convergence_ab.py --logdir /tmp/vcc10_conv_r4
echo "CAMPAIGN DONE $(date)" | tee -a $LOG/campaign.log
# Afterwards: fill docs/PERFORMANCE.md round-4 [pending chip] markers;
# if sm_pallas/harvest_pallas beat xla, flip harmonics_impl() default to
# "pallas" (tpuvc/ops/pallas_harmonics.py) and re-run bench.py.
