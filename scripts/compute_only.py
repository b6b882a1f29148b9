"""On-device compute throughput of the conversion pipeline (no transfers).

Reproduces the "on-device compute x realtime" figure quoted in
docs/PERFORMANCE.md and docs/STATUS.md: K iterations of the FULL batched
conversion graph run inside ONE jit program (a lax.fori_loop whose input
is perturbed by i * 1e-9 to defeat CSE), so the only host<->device
traffic is one dispatch and one scalar pull.  This isolates device
compute from the sandbox relay that bounds bench.py's end-to-end number
(docs/PERFORMANCE.md "Where the end-to-end gap is").

  python scripts/compute_only.py [batch] [utterance_s] [K] [d2s_impl]

d2s_impl (xla | pallas) selects the decoder's subpixel implementation
(Architecture.d2s_impl) for on-chip A/B of ops/pallas_d2s.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from tpuvc.convert.pipeline import make_batch_convert_fn
    from tpuvc.dsp.constants import DEFAULT_WORLD
    from tpuvc.models.vae import init_params, make_model
    from tpuvc.utils.config import Architecture

    cfg = DEFAULT_WORLD
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    dur_s = float(sys.argv[2]) if len(sys.argv) > 2 else 4.0
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    d2s_impl = sys.argv[4] if len(sys.argv) > 4 else "xla"
    t_samples = int(dur_s * cfg.fs)

    arch = Architecture(compute_dtype="bfloat16", d2s_impl=d2s_impl)
    model = make_model(arch)
    params = init_params(model, arch, jax.random.PRNGKey(0))
    base = make_batch_convert_fn(model, cfg)

    rng = np.random.default_rng(0)
    t = np.arange(t_samples) / cfg.fs
    xs = np.stack([
        (0.3 * np.sin(2 * np.pi * (110 + 15 * i) * t)
         + 0.01 * rng.standard_normal(t_samples)).astype(np.float32)
        for i in range(batch)])
    y_trgs = (np.arange(batch) % arch.y_dim).astype(np.int32)
    stats = (np.full(cfg.sp_dim, -10.0, np.float32),
             np.full(cfg.sp_dim, 1.0, np.float32),
             np.full(batch, 5.0, np.float32), np.ones(batch, np.float32),
             np.full(batch, 5.3, np.float32), np.ones(batch, np.float32))
    seeds = np.arange(batch, dtype=np.int32)
    args = tuple(jnp.asarray(a) for a in (xs, y_trgs, *stats, seeds))

    @jax.jit
    def k_iterations(params, x, *rest):
        def body(i, acc):
            y = base(params, x + i * 1e-9, *rest)
            return acc + jnp.sum(y[:, :8])    # keep every iteration live
        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    np.asarray(k_iterations(params, *args))   # compile + warm (host fence)

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(k_iterations(params, *args))
        times.append((time.perf_counter() - t0) / k)
    best = min(times)                          # single dispatch: min is fair
    audio_s = batch * dur_s
    print(json.dumps({
        "metric": "on-device conversion compute (K-iteration in-graph loop)",
        "value": round(audio_s / best, 2),
        "unit": "x realtime (s audio / s device compute)",
        "s_per_call": round(best, 4),
        "batch": batch, "utterance_s": dur_s, "k": k,
        "d2s_impl": d2s_impl,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
