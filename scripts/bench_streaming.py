"""Streaming serving surface on the attached chip (VERDICT r3 weak #6;
r4 weak #3 / item 6: PACED ticks, tail percentiles, deadline misses).

Drives StreamingConverter (BASELINE config 5) with real per-chunk device
calls and reports the numbers a serving deployment would quote:

  - single stream: per-chunk wall time (median/p90, steady state),
    throughput, end-to-end latency (buffered audio + chunk wall)
  - multi-stream: a REAL-TIME-PACED tick loop over streams x chunk
    configs — each tick is due at T0 + k*chunk_s, the loop sleeps until
    the due time (back-pressure carries over when a tick overruns), and
    a tick MISSES its deadline when it completes after due + chunk_s
    (the converted audio would underrun the playback buffer).  Reports
    p50/p90/p99 tick wall and the miss rate per config.

  python scripts/bench_streaming.py [--chunks 0.5,1.0,2.0]
      [--streams 4,8,16] [--paced-chunks 0.5,1.0] [--ticks 100]
      [--skip-single] [--platform cpu]

Appends results to docs/PERFORMANCE.md by hand — this prints JSON only.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _signal(cfg, dur_s: float = 30.0) -> np.ndarray:
    rng = np.random.default_rng(0)
    t = np.arange(int(dur_s * cfg.fs)) / cfg.fs
    return (0.3 * np.sin(2 * np.pi * 120 * t)
            + 0.1 * np.sin(2 * np.pi * 240 * t)
            + 0.01 * rng.standard_normal(t.shape[0])).astype(np.float32)


def single_stream_sweep(model, params, assets, cfg, chunks, x):
    from tpuvc.convert.pipeline import Converter
    from tpuvc.convert.streaming import StreamingConverter

    results = []
    for chunk_s in chunks:
        # ulaw8 drain = the bandwidth-limited serving config; the
        # per-chunk payload is tiny either way (16k samples)
        conv = Converter(model, params, assets, cfg,
                         bucket_s=chunk_s, transfer_encoding="ulaw8")
        s = StreamingConverter(conv, "S0", "S1", chunk_s=chunk_s)
        window = s.chunk + 2 * s.halo
        # warm up/compile on the exact window shape
        t0 = time.perf_counter()
        np.asarray(conv.convert(x[:window], "S0", "S1"))
        compile_s = time.perf_counter() - t0

        walls = []
        fed = 0
        feed = s.chunk                      # one chunk per push
        t_start = time.perf_counter()
        while fed + feed <= len(x):
            t0 = time.perf_counter()
            out = s.push(x[fed: fed + feed])
            if out.size:                    # a real device call happened
                walls.append(time.perf_counter() - t0)
            fed += feed
        s.flush()
        total = time.perf_counter() - t_start
        walls = np.array(walls[1:])         # drop first (bucket compile)
        med = float(np.median(walls))
        buffered_s = window / cfg.fs
        results.append({
            "chunk_s": chunk_s,
            "halo_s": round(s.halo / cfg.fs, 3),
            "median_chunk_wall_s": round(med, 4),
            "p90_chunk_wall_s": round(float(np.percentile(walls, 90)), 4),
            "stream_x_realtime": round(chunk_s / med, 1),
            "latency_s_buffered_plus_wall": round(buffered_s + med, 3),
            "throughput_whole_stream_x": round(dur_of(x, cfg) / total, 1),
            "n_chunks": int(len(walls)),
            "first_call_s_incl_compile": round(compile_s, 1),
        })
        print(json.dumps(results[-1]), flush=True)
    return results


def dur_of(x, cfg) -> float:
    return len(x) / cfg.fs


def paced_multistream(model, params, assets, cfg, n_streams: int,
                      chunk_s: float, n_ticks: int, x: np.ndarray) -> dict:
    """Real-time-paced multi-stream tick loop (one batched device call
    per tick across all streams).  The feed wraps around the test signal
    so n_ticks is independent of its length."""
    from tpuvc.convert.pipeline import Converter
    from tpuvc.convert.streaming import MultiStreamConverter

    conv = Converter(model, params, assets, cfg, bucket_s=chunk_s,
                     transfer_encoding="ulaw8")
    m = MultiStreamConverter(conv, [("S0", "S1")] * n_streams,
                             chunk_s=chunk_s)
    feed = m.streams[0].chunk
    halo = m.streams[0].halo

    def take(start: int, ln: int) -> np.ndarray:
        idx = (start + np.arange(ln)) % len(x)
        return x[idx]

    t0 = time.perf_counter()
    for i in range(n_streams):      # primes buffers; first tick compiles
        m.push(i, take(0, feed + 2 * halo))
    compile_s = time.perf_counter() - t0
    fed = feed + 2 * halo
    # one throwaway tick (bucket warm), then pace
    for i in range(n_streams):
        m.push(i, take(fed, feed))
    fed += feed

    period = chunk_s
    walls, misses, lags = [], 0, []
    t_base = time.perf_counter()
    for k in range(n_ticks):
        due = t_base + k * period        # audio for tick k arrives here
        now = time.perf_counter()
        if now < due:
            time.sleep(due - now)
        t1 = time.perf_counter()
        for i in range(n_streams):
            m.push(i, take(fed, feed))
        done = time.perf_counter()
        walls.append(done - t1)
        lags.append(done - due)
        if done > due + period:          # playback buffer would underrun
            misses += 1
        fed += feed
    m.flush_all()
    w = np.array(walls)
    out = {
        "n_streams": n_streams, "chunk_s": chunk_s, "paced": True,
        "n_ticks": n_ticks,
        "p50_tick_wall_s": round(float(np.percentile(w, 50)), 4),
        "p90_tick_wall_s": round(float(np.percentile(w, 90)), 4),
        "p99_tick_wall_s": round(float(np.percentile(w, 99)), 4),
        "max_tick_wall_s": round(float(w.max()), 4),
        "deadline_miss_rate": round(misses / n_ticks, 4),
        "max_completion_lag_s": round(float(np.max(lags)), 4),
        "aggregate_x_realtime_at_pace": round(
            n_streams * chunk_s / float(np.percentile(w, 50)), 1),
        "per_stream_latency_s_p50": round(
            (feed + 2 * halo) / cfg.fs + float(np.percentile(w, 50)), 3),
        "first_tick_s_incl_compile": round(compile_s, 1),
    }
    print(json.dumps(out), flush=True)
    return out


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("chunks_pos", nargs="*", type=float,
                   help="single-stream chunk sweep (positional, legacy)")
    p.add_argument("--streams", default="4,8,16")
    p.add_argument("--paced-chunks", default="0.5,1.0")
    p.add_argument("--ticks", type=int, default=100)
    p.add_argument("--skip-single", action="store_true")
    p.add_argument("--skip-paced", action="store_true")
    p.add_argument("--platform", default=None)
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/tmp/tpuvc-jax-cache")

    from tpuvc.convert.pipeline import ConverterAssets
    from tpuvc.dsp.constants import DEFAULT_WORLD
    from tpuvc.models.vae import init_params, make_model
    from tpuvc.utils.config import Architecture

    cfg = DEFAULT_WORLD
    arch = Architecture(compute_dtype="bfloat16")
    model = make_model(arch)
    params = init_params(model, arch, jax.random.PRNGKey(0))
    assets = ConverterAssets(
        xmin=np.full(cfg.sp_dim, -10.0, np.float32),
        xmax=np.full(cfg.sp_dim, 1.0, np.float32),
        f0_mu=np.array([5.0, 5.3], np.float32),
        f0_sigma=np.ones(2, np.float32),
        speakers=["S0", "S1"])
    x = _signal(cfg)

    results = []
    if not args.skip_single:
        chunks = args.chunks_pos or [0.5, 1.0, 2.0]
        results = single_stream_sweep(model, params, assets, cfg, chunks, x)

    paced = []
    if not args.skip_paced:
        for chunk_s in [float(c) for c in args.paced_chunks.split(",")]:
            for n in [int(s) for s in args.streams.split(",")]:
                paced.append(paced_multistream(
                    model, params, assets, cfg, n, chunk_s, args.ticks, x))

    print(json.dumps({
        "metric": "streaming conversion (single chip)",
        "encoding": "ulaw8",
        "device": str(jax.devices()[0]),
        "sweep": results,
        "paced_multistream": paced,
    }))


if __name__ == "__main__":
    main()
