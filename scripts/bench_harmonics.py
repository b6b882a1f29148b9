"""StoneMask stage A/B on the chip: fused Pallas kernel vs XLA path.

Times ONLY the stonemask stage (synthetic f0 track, no DIO compile) with
the K-iteration in-graph loop methodology.  The impl is chosen by
TPUVC_HARMONICS (read at trace time), so run once per impl:

  TPUVC_HARMONICS=xla    python scripts/bench_harmonics.py [batch] [dur_s]
  TPUVC_HARMONICS=pallas python scripts/bench_harmonics.py [batch] [dur_s]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/tpuvc-jax-cache")

    from scripts.bench_stages import timed
    from tpuvc.dsp import stonemask
    from tpuvc.dsp.constants import DEFAULT_WORLD
    from tpuvc.ops.pallas_harmonics import harmonics_impl

    cfg = DEFAULT_WORLD
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    dur_s = float(sys.argv[2]) if len(sys.argv) > 2 else 4.0
    t_samples = int(dur_s * cfg.fs)
    n = cfg.num_frames(t_samples)
    rng = np.random.default_rng(0)
    t = np.arange(t_samples) / cfg.fs
    xs = jnp.asarray(np.stack([
        (0.3 * np.sin(2 * np.pi * (110 + 15 * i) * t)
         + 0.1 * np.sin(2 * np.pi * 2 * (110 + 15 * i) * t)
         + 0.01 * rng.standard_normal(t_samples)).astype(np.float32)
        for i in range(batch)]))
    f0 = np.tile(np.where(np.arange(n) % 9 == 5, 0.0, 1.0)[None, :],
                 (batch, 1)).astype(np.float32)
    f0 *= (110 + 15 * np.arange(batch))[:, None]
    f0s = jnp.asarray(f0)

    vsm = jax.vmap(lambda x, f: stonemask.stonemask(x, f, cfg.hop, cfg.fs))
    wall = timed(lambda x: vsm(x, f0s), xs)
    print(json.dumps({
        "metric": "stonemask stage (2 IF passes)",
        "impl": harmonics_impl(),
        "ms_per_call": round(wall * 1e3, 2),
        "batch": batch, "utterance_s": dur_s,
        "x_realtime": round(batch * dur_s / wall, 0),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
