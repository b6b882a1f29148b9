"""Per-stage throughput ablation + FFT-vs-MXU microbench on the chip.

Times the end-to-end convert graph with stages progressively included
(ablation deltas, the round-1 methodology: single-dispatch timings are
polluted by the ~30 ms tunnel, so each measurement is a K-iteration
lax.fori_loop inside one jit, synced by host transfer).

  python scripts/bench_stages.py [batch] [dur_s]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timed(fn, *args, k: int = 8) -> float:
    """Median-of-3 wall seconds for k in-graph iterations of fn."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(*a):
        def body(i, acc):
            out = fn(*[x + i * 1e-9 if jnp.issubdtype(jnp.asarray(x).dtype,
                                                      jnp.floating) else x
                       for x in a])
            leaf = jax.tree.leaves(out)[0]
            return acc + jnp.sum(leaf.astype(jnp.float32) * 1e-20)
        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    np.asarray(loop(*args))  # compile + warm
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(loop(*args))
        ts.append((time.perf_counter() - t0) / k)
    ts.sort()
    return ts[1]


def main() -> None:
    import jax
    import jax.numpy as jnp

    from tpuvc.dsp import cheaptrick, d4c, dio, stonemask, synthesis
    from tpuvc.dsp.constants import DEFAULT_WORLD

    cfg = DEFAULT_WORLD
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    dur_s = float(sys.argv[2]) if len(sys.argv) > 2 else 4.0
    t_samples = int(dur_s * cfg.fs)
    n_frames = cfg.num_frames(t_samples)
    audio_s = batch * dur_s
    rng = np.random.default_rng(0)
    t = np.arange(t_samples) / cfg.fs
    xs = jnp.asarray(np.stack([
        (0.3 * np.sin(2 * np.pi * (110 + 15 * i) * t)
         + 0.1 * np.sin(2 * np.pi * 2 * (110 + 15 * i) * t)
         + 0.01 * rng.standard_normal(t_samples)).astype(np.float32)
        for i in range(batch)]))

    vdio = jax.vmap(lambda x: dio.dio(x, cfg.fs, cfg.hop, cfg.f0_floor,
                                      cfg.f0_ceil))
    f0s = vdio(xs)
    vsm = jax.vmap(lambda x, f: stonemask.stonemask(x, f, cfg.hop, cfg.fs))
    f0r = vsm(xs, f0s)
    vct = jax.vmap(lambda x, f: cheaptrick.cheaptrick(
        x, f, cfg.hop, cfg.fs, cfg.fft_size))
    sps = vct(xs, f0r)
    vd4_gd = jax.vmap(lambda x, f: d4c.d4c(x, f, cfg.hop, cfg.fs,
                                           cfg.fft_size, "group_delay"))
    vd4_nc = jax.vmap(lambda x, f: d4c.d4c(x, f, cfg.hop, cfg.fs,
                                           cfg.fft_size, "nccf"))
    aps = vd4_gd(xs, f0r)
    seeds = jnp.arange(batch, dtype=jnp.uint32)
    vsyn = jax.vmap(lambda f, s, a, sd: synthesis.synthesize(
        f, s, a, cfg.fs, cfg.hop, cfg.fft_size, jax.random.PRNGKey(sd)))

    # model stage: normalize -> encode -> speaker-swap decode -> denormalize
    # (the same ops the convert graph runs, honoring arch.compute_dtype)
    from tpuvc.convert.pipeline import _denormalize_sp, _normalize_sp
    from tpuvc.models.vae import init_params, make_model
    from tpuvc.utils.config import Architecture
    arch = Architecture(compute_dtype="bfloat16")
    model = make_model(arch)
    params = init_params(model, arch, jax.random.PRNGKey(0))
    xmin = jnp.full(cfg.sp_dim, -10.0, jnp.float32)
    xmax = jnp.full(cfg.sp_dim, 1.0, jnp.float32)

    def vae_stage(sp):
        def one(sp1):
            u, en = _normalize_sp(sp1, xmin, xmax)
            z_mu, _ = model.apply(params, u, method=type(model).encode)
            y = jnp.full((u.shape[0],), 3, jnp.int32)
            u2 = model.apply(params, z_mu, y, method=type(model).decode)
            return _denormalize_sp(u2, en, xmin, xmax)
        return jax.vmap(one)(sp)

    from tpuvc.dsp.synthesis import _excitation

    def exc_stage(f0):
        return jax.vmap(lambda f, s: _excitation(
            f, n_frames * cfg.hop, cfg.hop, cfg.fs,
            jax.random.PRNGKey(s)))(f0, seeds)

    results = {}
    results["dio"] = timed(vdio, xs)
    results["stonemask"] = timed(lambda x: vsm(x, f0s), xs)
    results["cheaptrick"] = timed(lambda x: vct(x, f0r), xs)
    results["d4c_group_delay"] = timed(lambda x: vd4_gd(x, f0r), xs)
    results["d4c_nccf"] = timed(lambda x: vd4_nc(x, f0r), xs)
    results["synthesis"] = timed(lambda s: vsyn(f0r, s, aps, seeds), sps)
    results["vae(bf16)"] = timed(vae_stage, sps)
    results["excitation"] = timed(exc_stage, f0r)

    for k, v in results.items():
        print(f"{k:18s}: {v * 1000:8.1f} ms/call "
              f"({audio_s / v:7.0f}x realtime)")
    tot = sum(v for k, v in results.items() if k != "d4c_nccf")
    tot -= results["excitation"]  # excitation is part of synthesis' time
    print(f"{'sum (gd)':18s}: {tot * 1000:8.1f} ms/call "
          f"({audio_s / tot:7.0f}x realtime)")

    # microbench: batched rfft vs MXU DFT-matmul at CheapTrick shape
    nrows = batch * n_frames
    a = jnp.asarray(rng.standard_normal((nrows, 1024)), jnp.float32)
    t_fft = timed(lambda z: jnp.fft.rfft(z, axis=-1), a)
    cosm = jnp.asarray(rng.standard_normal((1024, 513)), jnp.float32)
    sinm = jnp.asarray(rng.standard_normal((1024, 513)), jnp.float32)

    def dft(z):
        return (jnp.dot(z, cosm, preferred_element_type=jnp.float32),
                jnp.dot(z, sinm, preferred_element_type=jnp.float32))

    t_mm = timed(dft, a)

    def dft_bf16(z):
        zb = z.astype(jnp.bfloat16)
        return (jnp.dot(zb, cosm.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32),
                jnp.dot(zb, sinm.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32))

    t_mmb = timed(dft_bf16, a)
    irf = jnp.asarray(rng.standard_normal((nrows, 513)), jnp.float32)
    t_ifft = timed(lambda z: jnp.fft.irfft(
        jax.lax.complex(z, z * 0.5), n=1024, axis=-1), irf)
    print(f"\nmicro [{nrows}, 1024]: rfft {t_fft*1e3:.1f} ms | "
          f"DFT-matmul f32 {t_mm*1e3:.1f} ms | bf16 {t_mmb*1e3:.1f} ms | "
          f"irfft {t_ifft*1e3:.1f} ms")


if __name__ == "__main__":
    main()
