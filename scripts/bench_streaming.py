"""Streaming serving surface on the attached chip (VERDICT r3 weak #6).

Drives StreamingConverter (BASELINE config 5) with real per-chunk device
calls and reports the numbers a serving deployment would quote:

  - per-chunk wall time (median over a long stream, steady state)
  - steady-state throughput (x realtime for ONE stream)
  - end-to-end latency: buffered audio (chunk + 2*halo) + chunk wall

  python scripts/bench_streaming.py [chunk_s ...]   # default sweep

Appends results to docs/PERFORMANCE.md by hand — this prints JSON only.
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

    if "--platform" in sys.argv:     # e.g. --platform cpu for a dry run
        i = sys.argv.index("--platform")
        jax.config.update("jax_platforms", sys.argv[i + 1])
        del sys.argv[i: i + 2]
    jax.config.update("jax_compilation_cache_dir", "/tmp/tpuvc-jax-cache")

    from tpuvc.convert.pipeline import Converter, ConverterAssets
    from tpuvc.convert.streaming import StreamingConverter
    from tpuvc.dsp.constants import DEFAULT_WORLD
    from tpuvc.models.vae import init_params, make_model
    from tpuvc.utils.config import Architecture

    chunks = [float(a) for a in sys.argv[1:]] or [0.5, 1.0, 2.0]
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

    rng = np.random.default_rng(0)
    dur_s = 30.0
    t = np.arange(int(dur_s * cfg.fs)) / cfg.fs
    x = (0.3 * np.sin(2 * np.pi * 120 * t)
         + 0.1 * np.sin(2 * np.pi * 240 * t)
         + 0.01 * rng.standard_normal(t.shape[0])).astype(np.float32)

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
            "throughput_whole_stream_x": round(
                dur_s / total, 1),
            "n_chunks": int(len(walls)),
            "first_call_s_incl_compile": round(compile_s, 1),
        })
        print(json.dumps(results[-1]), flush=True)

    # multi-stream serving: 8 concurrent streams, one batched device
    # call per tick (MultiStreamConverter) — the aggregate number a
    # serving deployment quotes
    from tpuvc.convert.streaming import MultiStreamConverter
    n_streams = 8
    chunk_s = 1.0
    conv = Converter(model, params, assets, cfg, bucket_s=chunk_s,
                     transfer_encoding="ulaw8")
    m = MultiStreamConverter(conv, [("S0", "S1")] * n_streams,
                             chunk_s=chunk_s)
    feed = m.streams[0].chunk
    t0 = time.perf_counter()
    for i in range(n_streams):      # primes buffers; first tick compiles
        m.push(i, x[: feed + 2 * m.streams[i].halo])
    compile_s = time.perf_counter() - t0
    walls = []
    fed = feed + 2 * m.streams[0].halo
    while fed + feed <= len(x):
        t0 = time.perf_counter()
        for i in range(n_streams):
            m.push(i, x[fed: fed + feed])
        walls.append(time.perf_counter() - t0)
        fed += feed
    m.flush_all()
    walls = np.array(walls[1:])
    med = float(np.median(walls))
    multi = {
        "n_streams": n_streams, "chunk_s": chunk_s,
        "median_tick_wall_s": round(med, 4),
        "aggregate_x_realtime": round(n_streams * chunk_s / med, 1),
        "per_stream_latency_s": round(
            (m.streams[0].chunk + 2 * m.streams[0].halo) / cfg.fs + med,
            3),
        "first_tick_s_incl_compile": round(compile_s, 1),
        "n_ticks": int(len(walls)),
    }
    print(json.dumps(multi), flush=True)

    print(json.dumps({
        "metric": "streaming conversion (single chip)",
        "encoding": "ulaw8",
        "device": str(jax.devices()[0]),
        "sweep": results,
        "multistream": multi,
    }))


if __name__ == "__main__":
    main()
