"""Benchmark: end-to-end conversion throughput on the attached chip.

Measures the north-star metric (BASELINE.json): seconds of audio converted
per wall-clock second per chip through the FULL single-graph pipeline —
WORLD-style analysis (DIO + StoneMask + CheapTrick + D4C), VAE encode,
speaker-swap decode, f0 transform, minimum-phase synthesis — batched over
utterances.  Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "x realtime", "vs_baseline": N}
vs_baseline is value / 1000 (the BASELINE.json target of 1000x realtime).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    # Persistent compile cache (helps CPU/cached backends; measured NOT to
    # cover the axon remote-compile path, which takes 2-10 min per process
    # depending on tunnel load — budget for it when scheduling this bench).
    jax.config.update("jax_compilation_cache_dir", "/tmp/tpuvc-jax-cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    from tpuvc.convert.pipeline import make_batch_convert_fn
    from tpuvc.dsp.constants import DEFAULT_WORLD
    from tpuvc.models.vae import init_params, make_model
    from tpuvc.utils.config import Architecture

    cfg = DEFAULT_WORLD
    # defaults = the measured sweet spot on v5e (batch 256 exceeds HBM)
    batch = int(float(sys.argv[1])) if len(sys.argv) > 1 else 128
    dur_s = float(sys.argv[2]) if len(sys.argv) > 2 else 4.0
    t_samples = int(dur_s * cfg.fs)

    arch = Architecture(compute_dtype="bfloat16")
    model = make_model(arch)  # honors arch.compute_dtype (bfloat16)
    params = init_params(model, arch, jax.random.PRNGKey(0))
    base_convert = make_batch_convert_fn(model, cfg)

    @jax.jit
    def convert(p, *a):
        # int16 PCM halves the D2H over the bandwidth-limited tunnel.
        # (Baking params as compile-time constants was 31% faster at batch
        # 32 but consistently SLOWER at batch 128 on this runtime — A/B'd
        # in-process; params stay an argument.)
        y = base_convert(p, *a)
        return jnp.clip(y * 32767.0, -32768.0, 32767.0).astype(jnp.int16)

    rng = np.random.default_rng(0)
    t = np.arange(t_samples) / cfg.fs
    xs = np.stack([
        (0.3 * np.sin(2 * np.pi * (110 + 15 * i) * t)
         + 0.1 * np.sin(2 * np.pi * 2 * (110 + 15 * i) * t)
         + 0.01 * rng.standard_normal(t_samples)).astype(np.float32)
        for i in range(batch)])
    y_trgs = (np.arange(batch) % arch.y_dim).astype(np.int32)
    xmin = np.full(cfg.sp_dim, -10.0, np.float32)
    xmax = np.full(cfg.sp_dim, 1.0, np.float32)
    mu = np.full(batch, 5.0, np.float32)
    sd = np.ones(batch, np.float32)
    seeds = np.arange(batch, dtype=np.int32)

    args = (params, jnp.asarray(xs), jnp.asarray(y_trgs),
            jnp.asarray(xmin), jnp.asarray(xmax), jnp.asarray(mu),
            jnp.asarray(sd), jnp.asarray(mu + 0.3), jnp.asarray(sd),
            jnp.asarray(seeds))

    # warmup + compile; sync via host transfer (block_until_ready is not a
    # reliable fence on the experimental axon platform)
    np.asarray(convert(*args))

    # latency: one call, synced
    lat = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(convert(*args))
        lat = min(lat, time.perf_counter() - t0)

    # throughput: pipelined dispatch (device compute overlaps D2H of the
    # previous calls — the steady-state serving pattern).  A 2-deep queue
    # of outstanding calls with copy_to_host_async measured ~1.55x over
    # dispatch-all/pull-all on the relay (A/B'd in-process; depth 1 loses
    # ~0.1 s/call to dispatch messages queuing behind the previous call's
    # output stream on the single TCP tunnel).  The tunnel jitters by tens
    # of percent between repetitions, so run K repetitions and report the
    # MEDIAN (VERDICT round-1: the 422-vs-597 discrepancy was single-shot
    # jitter).
    k = 4
    depth = 2
    reps = 8
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        pending = []
        for _ in range(k):
            cur = convert(*args)
            cur.copy_to_host_async()
            pending.append(cur)
            if len(pending) > depth:
                np.asarray(pending.pop(0))
        for o in pending:
            np.asarray(o)
        times.append((time.perf_counter() - t0) / k)
    times.sort()
    best = times[len(times) // 2]  # median

    audio_seconds = batch * dur_s
    value = audio_seconds / best
    print(json.dumps({
        "metric": "end-to-end conversion throughput "
                  "(analysis+VAE+synthesis, single chip)",
        "value": round(value, 2),
        "unit": "x realtime (s audio / s wall)",
        "vs_baseline": round(value / 1000.0, 4),
        "batch": batch,
        "utterance_s": dur_s,
        "wall_s_per_call": round(best, 4),
        "wall_s_spread": [round(times[0], 4), round(times[-1], 4)],
        "latency_s": round(lat, 4),
        "latency_x_realtime": round(audio_seconds / lat, 2),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
