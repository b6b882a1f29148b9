"""Harvest-path conversion throughput on the attached chip (VERDICT r2
item 3: the alternative f0 estimator needs a serving-grade bench number).

Same single-graph pipeline as bench.py with cfg.f0_method='harvest',
mu-law drain, pipelined dispatch.

  python scripts/bench_harvest.py [batch] [utterance_s]
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/tpuvc-jax-cache")

    from bench import _pipelined_inline
    from tpuvc.convert.pipeline import make_batch_convert_fn
    from tpuvc.dsp.constants import DEFAULT_WORLD
    from tpuvc.models.vae import init_params, make_model
    from tpuvc.ops.ulaw import ulaw_encode
    from tpuvc.utils.config import Architecture

    batch = int(float(sys.argv[1])) if len(sys.argv) > 1 else 32
    dur_s = float(sys.argv[2]) if len(sys.argv) > 2 else 4.0
    decim = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    cfg = dataclasses.replace(DEFAULT_WORLD, f0_method="harvest",
                              harvest_channel_decim=decim)
    t_samples = int(dur_s * cfg.fs)

    arch = Architecture(compute_dtype="bfloat16")
    model = make_model(arch)
    params = init_params(model, arch, jax.random.PRNGKey(0))
    base_convert = make_batch_convert_fn(model, cfg)

    @jax.jit
    def convert(p, *a):
        return ulaw_encode(base_convert(p, *a))

    rng = np.random.default_rng(0)
    t = np.arange(t_samples) / cfg.fs
    xs = np.stack([
        (0.3 * np.sin(2 * np.pi * (110 + 15 * i) * t)
         + 0.1 * np.sin(2 * np.pi * 2 * (110 + 15 * i) * t)
         + 0.01 * rng.standard_normal(t_samples)).astype(np.float32)
        for i in range(batch)])
    args = (params, jnp.asarray(xs),
            jnp.asarray((np.arange(batch) % arch.y_dim).astype(np.int32)),
            jnp.asarray(np.full(cfg.sp_dim, -10.0, np.float32)),
            jnp.asarray(np.full(cfg.sp_dim, 1.0, np.float32)),
            jnp.asarray(np.full(batch, 5.0, np.float32)),
            jnp.asarray(np.ones(batch, np.float32)),
            jnp.asarray(np.full(batch, 5.3, np.float32)),
            jnp.asarray(np.ones(batch, np.float32)),
            jnp.asarray(np.arange(batch, dtype=np.int32)))

    # AOT executable cache (utils/aot_cache.py, default-on): repeat A/B
    # runs of the same graph skip the 2-10 min remote compile — keyed by
    # module hash, so a TPUVC_REFINE/TPUVC_HARMONICS flip that changes
    # the graph recompiles as it must
    from tpuvc.utils import aot_cache
    if aot_cache.enabled():
        convert = aot_cache.aot_cached(
            convert, args, tag=f"harvest-b{batch}-{dur_s}s-d{decim}")

    t0 = time.perf_counter()
    np.asarray(convert(*args))
    compile_s = time.perf_counter() - t0

    times = sorted(_pipelined_inline(convert, args, 6, 2) for _ in range(5))
    best = times[len(times) // 2]
    audio_seconds = batch * dur_s
    from tpuvc.ops.pallas_harmonics import harmonics_impl, refine_impl
    print(json.dumps({
        "metric": "harvest-path conversion throughput (single chip)",
        "value": round(audio_seconds / best, 2),
        "unit": "x realtime",
        "harmonics_impl": harmonics_impl(),
        "refine_impl": refine_impl(),
        "channel_decim": decim,
        "batch": batch, "utterance_s": dur_s,
        "wall_s_per_call": round(best, 4),
        "spread": [round(times[0], 4), round(times[-1], 4)],
        "first_call_s_incl_compile": round(compile_s, 1),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
