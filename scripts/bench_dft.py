"""Micro-bench: forward-DFT formulations at D4C's shape, on the chip.

One compile, every variant timed inside its own K-iteration fori_loop
(same methodology as compute_only.py).  Chooses the rdft_ct
factorization: accuracy allows n1 in {32, 64, 128} (dead-band pipeline
test: 32/64 exact vs float64, 128 within 0.05 dB), so speed decides.

  python scripts/bench_dft.py [rows] [k]
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

    from tpuvc.ops import dft as dftmod

    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    d = 1024
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((rows, d)), jnp.float32)

    def ct(n1):
        # the SHIPPED rdft_ct with an explicit split override — the bench
        # measures the exact code path dsp/d4c.py runs, never a copy
        return lambda z: dftmod.rdft_ct(z, d, n1=n1)

    all_variants = {
        "direct": lambda z: dftmod.rdft(z, d),
        "ct32": ct(32),
        "ct64": ct(64),
        "ct128": ct(128),
        "xla_rfft": lambda z: (jnp.real(jnp.fft.rfft(z, axis=-1)),
                               jnp.imag(jnp.fft.rfft(z, axis=-1))),
    }
    # each variant costs a full remote compile (minutes on this tunnel):
    # select via argv[3] (comma list), default the three accuracy-approved
    # candidates
    pick = (sys.argv[3].split(",") if len(sys.argv) > 3
            else ["direct", "ct32", "ct64"])
    variants = {k: all_variants[k] for k in pick}

    results = {}
    for name, fn in variants.items():
        @jax.jit
        def k_iter(z, fn=fn):
            def body(i, acc):
                re, im = fn(z + i * 1e-9)
                return acc + jnp.sum(re[:, :4]) + jnp.sum(im[:, :4])
            return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

        np.asarray(k_iter(x))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(k_iter(x))
            times.append((time.perf_counter() - t0) / k)
        results[name] = round(min(times) * 1e3, 2)
        print(f"{name}: {results[name]} ms / {rows} rows", flush=True)

    print(json.dumps({"rows": rows, "k": k, "ms_per_call": results,
                      "device": str(jax.devices()[0])}))


if __name__ == "__main__":
    main()
