#!/bin/bash
# Round-5 on-chip measurement campaign.  Run from the repo root when
# `timeout 300 python -c "import jax; print(jax.devices())"` answers.
# Sequential (ONE process may hold the TPU), per-step timeouts, keeps
# going on failure; logs land in $LOG.
#
# Covers VERDICT r4 items: 2 (critic conditioning A/B), 3 (alpha sweep),
# 4 (adversarial-corpus flagship A/B), 6 (paced streaming p99/deadline
# table), 7 (AOT cache before/after), plus the round-5 folded-kernel
# main-bench number and a post-fold harvest roofline.
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
run probe       600 python -u -c "import jax; print(jax.devices()); import jax.numpy as jnp, numpy as np; print(np.asarray(jnp.arange(4.)*2))"
# AOT cache: run 1 compiles + serializes, run 2 must load (compare
# compile_wall_s in the two JSON lines); run 2 is also the round-5 DIO
# main-bench number (folded stonemask kernel)
run bench_aot1  5400 env TPUVC_AOT=1 python -u bench.py 128 4 ulaw8
run bench_aot2  5400 env TPUVC_AOT=1 python -u bench.py 128 4 ulaw8
# stonemask stage alone, folded vs XLA (fold ships inside the pallas impl)
run sm_pallas   2400 env TPUVC_HARMONICS=pallas python -u scripts/bench_harmonics.py 128 4
# harvest post-fold roofline (stage table for PERFORMANCE.md round 5)
run roofline_harvest 3600 python -u scripts/roofline.py 32 --f0-method harvest --trace_dir /tmp/tpuvc_trace_r5_fold
# paced multi-stream serving table (VERDICT item 6)
run streaming_paced 10800 python -u scripts/bench_streaming.py --skip-single --ticks 100
# decision A/Bs on the resident path (VERDICT items 2 and 3)
run ab_critic 14400 python -u scripts/convergence_ab.py --ab critic --logdir /tmp/vcc10_critic
run ab_alpha  21600 python -u scripts/convergence_ab.py --ab alpha --logdir /tmp/vcc10_alpha
# adversarial corpus: flagship VAWGAN-vs-VAE on hard data (VERDICT item 4)
run ab_hard   14400 python -u scripts/convergence_ab.py --ab model --style hard --root /tmp/vcc10_hard --logdir /tmp/vcc10_hard_conv
echo "CAMPAIGN DONE $(date)" | tee -a $LOG/campaign.log
# Afterwards: fill docs/PERFORMANCE.md round-5 markers, write the
# critic/alpha decisions + hard-corpus table into docs/STATUS.md and
# scale_validation.json (convergence_ab writes the json keys itself).
