"""Benchmark: end-to-end conversion throughput on the attached chip.

Measures the north-star metric (BASELINE.json): seconds of audio converted
per wall-clock second per chip through the FULL single-graph pipeline —
WORLD-style analysis (DIO + StoneMask + CheapTrick + D4C), VAE encode,
speaker-swap decode, f0 transform, minimum-phase synthesis — batched over
utterances.  Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "x realtime", "vs_baseline": N}
vs_baseline is value / 1000 (the BASELINE.json target of 1000x realtime).

Usage: python bench.py [batch] [utterance_s] [encoding]
  encoding: ulaw8 (default) | pcm12 | int16 | both
The default drain encoding is mu-law 8-bit (tpuvc/ops/ulaw.py): this
sandbox's TCP relay moves ~33 MB/s, so the int16 payload (2 B/sample,
16.4 MB at batch 128 x 4 s) costs ~0.49 s/call against ~0.33 s of
compute — the bench was relay-bound.  Halving the payload makes the call
compute-bound; the quality cost is ~37 dB SNR (tests/test_ulaw.py).
pcm12 (1.5 B/sample, ~61 dB) is the quality middle ground at the
compute/relay crossover.  int16 stays the product default (CLI convert
writes 16-bit WAVs); pass "both" to ALSO measure the int16 and pcm12
drains plus fresh SNRs in the same process (each extra encoding is a
second multi-minute remote compile on the axon path, so the default
mode reports ulaw_snr_db: null rather than a stale constant).

vs_baseline divides by the 1000x BASELINE.json target.  The target is a
throughput target (audio seconds per wall second), not tied to a drain
payload — but cross-round ratio comparisons are only like-for-like at
MATCHING encodings, so every measured encoding row carries its own
x_realtime and vs_baseline (the r1/r2 headline numbers were int16).
"""

from __future__ import annotations

import json
import queue
import sys
import threading
import time

import numpy as np


def _pipelined_inline(convert, args, k: int, depth: int) -> float:
    """Dispatch with an inline bounded queue; returns wall s/call."""
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
    return (time.perf_counter() - t0) / k


def _pipelined_threaded(convert, args, k: int, depth: int) -> float:
    """Dispatch on this thread, drain on a worker thread: device->host
    pulls overlap the next dispatches even when a pull blocks the relay
    stream (round-2's inline depth-2 left ~0.11 s/call of its own drain
    bound on the table — VERDICT r2 item 1a)."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    err: list[BaseException] = []

    def drain():
        # After a relay error, keep CONSUMING the queue (discarding items)
        # until the sentinel: returning early would leave the bounded queue
        # full and deadlock the producer's q.put forever.
        failed = False
        while True:
            o = q.get()
            if o is None:
                return
            if failed:
                continue
            try:
                np.asarray(o)
            except BaseException as e:   # surface relay errors
                err.append(e)
                failed = True

    th = threading.Thread(target=drain, daemon=True)
    t0 = time.perf_counter()
    th.start()
    for _ in range(k):
        cur = convert(*args)
        cur.copy_to_host_async()
        q.put(cur)                     # blocks at depth outstanding
    q.put(None)
    th.join()
    if err:
        raise err[0]
    return (time.perf_counter() - t0) / k


def _measure(convert, args, k: int, reps: int):
    """Median wall s/call for both strategies; returns (best, detail)."""
    detail = {}
    for name, fn, depth in [("inline_d2", _pipelined_inline, 2),
                            ("inline_d3", _pipelined_inline, 3),
                            ("threaded_d3", _pipelined_threaded, 3)]:
        times = sorted(fn(convert, args, k, depth) for _ in range(reps))
        detail[name] = {"median": round(times[len(times) // 2], 4),
                        "spread": [round(times[0], 4), round(times[-1], 4)]}
    best_name = min(detail, key=lambda n: detail[n]["median"])
    return best_name, detail


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
    from tpuvc.ops.ulaw import (pcm12_decode, pcm12_encode, ulaw_decode,
                                ulaw_encode)
    from tpuvc.utils.config import Architecture

    cfg = DEFAULT_WORLD
    # defaults = the measured sweet spot on v5e (batch 256 exceeds HBM)
    batch = int(float(sys.argv[1])) if len(sys.argv) > 1 else 128
    dur_s = float(sys.argv[2]) if len(sys.argv) > 2 else 4.0
    encoding = sys.argv[3] if len(sys.argv) > 3 else "ulaw8"
    if encoding not in ("ulaw8", "pcm12", "int16", "both"):
        raise SystemExit(f"unknown encoding {encoding!r}; "
                         "expected ulaw8 | pcm12 | int16 | both")
    t_samples = int(dur_s * cfg.fs)

    arch = Architecture(compute_dtype="bfloat16")
    model = make_model(arch)  # honors arch.compute_dtype (bfloat16)
    params = init_params(model, arch, jax.random.PRNGKey(0))
    base_convert = make_batch_convert_fn(model, cfg)

    # (Baking params as compile-time constants was 31% faster at batch
    # 32 but consistently SLOWER at batch 128 on this runtime — A/B'd
    # in-process; params stay an argument.)
    @jax.jit
    def convert_u8(p, *a):
        return ulaw_encode(base_convert(p, *a))

    @jax.jit
    def convert_p12(p, *a):
        return pcm12_encode(base_convert(p, *a))

    @jax.jit
    def convert_i16(p, *a):
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

    primary = {"int16": convert_i16, "pcm12": convert_p12,
               "ulaw8": convert_u8, "both": convert_u8}[encoding]

    # TPUVC_AOT=1: serialize/reload the compiled executable keyed by the
    # lowered module hash — skips the axon remote-compile service's
    # 2-10 min latency on repeat runs (utils/aot_cache.py; round-5
    # cross-process probe measured deserialize 0.04 s)
    from tpuvc.utils import aot_cache
    compile_wall = None
    if aot_cache.enabled():
        t0 = time.perf_counter()
        primary = aot_cache.aot_cached(
            primary, args, tag=f"bench-{encoding}-b{batch}-{dur_s}s")
        compile_wall = round(time.perf_counter() - t0, 1)

    # warmup + compile; sync via host transfer (block_until_ready is not a
    # reliable fence on the experimental axon platform)
    t0 = time.perf_counter()
    np.asarray(primary(*args))
    if compile_wall is None:
        compile_wall = round(time.perf_counter() - t0, 1)

    # latency: one call, synced
    lat = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(primary(*args))
        lat = min(lat, time.perf_counter() - t0)

    # throughput: pipelined dispatch (device compute overlaps D2H of the
    # previous calls — the steady-state serving pattern).  The tunnel
    # jitters by tens of percent between repetitions, so run K calls per
    # repetition and report the MEDIAN over reps (VERDICT round-1: the
    # 422-vs-597 discrepancy was single-shot jitter).  Three strategies
    # are measured and the best median wins; all are reported.
    k = 8
    reps = 5
    best_name, detail = _measure(primary, args, k, reps)
    best = detail[best_name]["median"]

    audio_seconds = batch * dur_s

    out = {}
    snr_db = None
    p12_snr_db = None
    if encoding == "both":
        # each extra encoding costs a fresh compile (minutes on the axon
        # remote-compile path); SNRs are measured against the same call's
        # int16-grade float so the quality ladder is quoted from live
        # data, not stale constants
        np.asarray(convert_i16(*args))   # compile the int16 variant
        i16_name, i16_detail = _measure(convert_i16, args, k, 3)
        i16_best = i16_detail[i16_name]["median"]
        out["int16"] = {"best": i16_best, "strategy": i16_name,
                        "x_realtime": round(audio_seconds / i16_best, 2),
                        "vs_baseline": round(
                            audio_seconds / i16_best / 1000.0, 4),
                        "detail": i16_detail}
        np.asarray(convert_p12(*args))   # compile the pcm12 variant
        p12_name, p12_detail = _measure(convert_p12, args, k, 3)
        p12_best = p12_detail[p12_name]["median"]
        out["pcm12"] = {"best": p12_best, "strategy": p12_name,
                        "x_realtime": round(audio_seconds / p12_best, 2),
                        "vs_baseline": round(
                            audio_seconds / p12_best / 1000.0, 4),
                        "detail": p12_detail}
        ref = np.asarray(convert_i16(*args), np.float32) / 32767.0
        num = float(np.sum(ref * ref))
        dec = ulaw_decode(np.asarray(convert_u8(*args)))
        snr_db = round(10.0 * np.log10(
            num / max(float(np.sum((dec - ref) ** 2)), 1e-20)), 1)
        dec12 = pcm12_decode(np.asarray(convert_p12(*args)),
                             n_samples=ref.shape[-1])
        p12_snr_db = round(10.0 * np.log10(
            num / max(float(np.sum((dec12 - ref) ** 2)), 1e-20)), 1)

    value = audio_seconds / best
    result = {
        "metric": "end-to-end conversion throughput "
                  "(analysis+VAE+synthesis, single chip)",
        "value": round(value, 2),
        "unit": "x realtime (s audio / s wall)",
        # ratio vs the 1000x BASELINE.json target; like-for-like across
        # rounds only at matching "encoding" (see module docstring)
        "vs_baseline": round(value / 1000.0, 4),
        "batch": batch,
        "utterance_s": dur_s,
        "encoding": "ulaw8" if encoding == "both" else encoding,
        "ulaw_snr_db": snr_db,
        "pcm12_snr_db": p12_snr_db,
        "wall_s_per_call": round(best, 4),
        "strategy": best_name,
        "strategies": detail,
        "latency_s": round(lat, 4),
        "latency_x_realtime": round(audio_seconds / lat, 2),
        "compile_wall_s": compile_wall,
        "aot_cache": aot_cache.enabled(),
        "device": str(jax.devices()[0]),
    }
    result.update(out)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
