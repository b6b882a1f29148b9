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
        def f(z):
            old = None
            # rdft_ct derives n1 from fft_size; call the internals with a
            # chosen split via a local copy
            half = d // 2 + 1
            n2 = d // n1
            r = z.shape[0]
            zz = z.reshape(r, n1, n2)
            th1 = dftmod._outer_theta(n1, n1, 2.0 * np.pi / n1)
            w1c, w1s = jnp.cos(th1), jnp.sin(th1)
            ar = jnp.einsum("rmn,mk->rkn", zz, w1c,
                            preferred_element_type=jnp.float32)
            ai = -jnp.einsum("rmn,mk->rkn", zz, w1s,
                             preferred_element_type=jnp.float32)
            tht = dftmod._outer_theta(n1, n2, 2.0 * np.pi / d)
            tc, ts = jnp.cos(tht), jnp.sin(tht)
            br = ar * tc + ai * ts
            bi = ai * tc - ar * ts
            k2n = min((half + n1 - 1) // n1 + 1, n2)
            th2 = dftmod._outer_theta(n2, k2n, 2.0 * np.pi / n2)
            w2c, w2s = jnp.cos(th2), jnp.sin(th2)
            re = (jnp.einsum("rkn,nj->rkj", br, w2c,
                             preferred_element_type=jnp.float32)
                  + jnp.einsum("rkn,nj->rkj", bi, w2s,
                               preferred_element_type=jnp.float32))
            im = (jnp.einsum("rkn,nj->rkj", bi, w2c,
                             preferred_element_type=jnp.float32)
                  - jnp.einsum("rkn,nj->rkj", br, w2s,
                               preferred_element_type=jnp.float32))
            re = re.transpose(0, 2, 1).reshape(r, k2n * n1)[:, :half]
            im = im.transpose(0, 2, 1).reshape(r, k2n * n1)[:, :half]
            return re, im
        return f

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
