"""Per-op roofline of the end-to-end convert graph from an xplane trace.

Captures a jax.profiler device trace of the batched convert program
(VERDICT round-1 item 1 done-condition: 'an xplane per-op roofline proving
the residual is relay-bound'), parses the TPU op-level xplane with the
tensorboard_plugin_profile proto, and prints the top ops by self time plus
a stage-level rollup keyed on the jit scope names.

  python scripts/roofline.py [batch] [--trace_dir /tmp/tpuvc_trace]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def capture(batch: int, trace_dir: str, f0_method: str = "dio") -> None:
    import dataclasses

    import jax
    import jax.numpy as jnp
    from tpuvc.convert.pipeline import make_batch_convert_fn
    from tpuvc.dsp.constants import DEFAULT_WORLD
    from tpuvc.models.vae import init_params, make_model
    from tpuvc.utils.config import Architecture

    cfg = dataclasses.replace(DEFAULT_WORLD, f0_method=f0_method)
    dur_s = 4.0
    t_samples = int(dur_s * cfg.fs)
    arch = Architecture(compute_dtype="bfloat16")
    model = make_model(arch)
    params = init_params(model, arch, jax.random.PRNGKey(0))
    base = make_batch_convert_fn(model, cfg)
    rng = np.random.default_rng(0)
    t = np.arange(t_samples) / cfg.fs
    xs = np.stack([(0.3 * np.sin(2 * np.pi * (110 + 15 * i) * t)
                    + 0.01 * rng.standard_normal(t_samples)).astype(np.float32)
                   for i in range(batch)])
    y_trgs = (np.arange(batch) % arch.y_dim).astype(np.int32)
    stats = (np.full(cfg.sp_dim, -10.0, np.float32),
             np.full(cfg.sp_dim, 1.0, np.float32),
             np.full(batch, 5.0, np.float32), np.ones(batch, np.float32),
             np.full(batch, 5.3, np.float32), np.ones(batch, np.float32))
    seeds = np.arange(batch, dtype=np.int32)
    args = tuple(jnp.asarray(a)
                 for a in (xs, y_trgs, *stats, seeds))
    np.asarray(base(params, *args))      # compile + warm
    with jax.profiler.trace(trace_dir):
        for _ in range(2):
            np.asarray(base(params, *args))
    time.sleep(1)


STAGES = ("hv_band_bank", "hv_event_tracks", "hv_merge", "hv_refine",
          "hv_contour", "dio", "stonemask", "cheaptrick", "d4c",
          "synthesize", "encode", "decode", "convert_f0", "normalize")


def report(trace_dir: str, top_n: int = 30) -> None:
    """Parse the device 'XLA Ops' lane of the exported Chrome trace (the
    xplane_pb2 python module is not shipped in this sandbox; the
    trace.json.gz carries the same op-level lane)."""
    import json

    files = sorted(glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.trace.json.gz")),
        key=os.path.getmtime)
    if not files:
        raise SystemExit(f"no trace.json.gz under {trace_dir}")
    with gzip.open(files[-1], "rt") as f:
        events = json.load(f)["traceEvents"]

    device_pids = {e["pid"] for e in events
                   if e.get("ph") == "M" and e.get("name") == "process_name"
                   and "TPU" in e["args"].get("name", "")}
    op_tids = {(e["pid"], e["tid"]) for e in events
               if e.get("ph") == "M" and e.get("name") == "thread_name"
               and e["args"].get("name") == "XLA Ops"
               and e["pid"] in device_pids}

    per_op = collections.Counter()          # name -> us (device self time)
    op_bytes = collections.Counter()        # accumulated over all events
    op_flops = collections.Counter()        #   of the op (one per traced
    op_scope = {}                           #   invocation)
    per_stage = collections.Counter()
    stage_bytes = collections.Counter()
    stage_flops = collections.Counter()
    total_us = 0.0
    for e in events:
        if e.get("ph") != "X" or (e.get("pid"), e.get("tid")) not in op_tids:
            continue
        dur = float(e.get("dur", 0.0))
        name = e.get("name", "?")
        a = e.get("args", {})
        tf_op = str(a.get("tf_op", ""))
        nbytes = float(a.get("bytes_accessed", 0) or 0)
        flops = float(a.get("model_flops", 0) or 0)
        per_op[name] += dur
        op_bytes[name] += nbytes
        op_flops[name] += flops
        op_scope[name] = tf_op
        total_us += dur
        low = (name + " " + tf_op).lower()
        stage = next((s for s in STAGES if s in low), "other")
        per_stage[stage] += dur
        stage_bytes[stage] += nbytes
        stage_flops[stage] += flops

    if not per_op:
        raise SystemExit("no XLA op events found — adapt lane matching")
    print(f"device op time total: {total_us / 1e6:.4f} s "
          f"(2 invocations traced)\n")
    print("== stage rollup (tf_op scope match; GB/s + GFLOP/s are achieved "
          "per-stage aggregates) ==")
    for k, v in per_stage.most_common():
        bw = stage_bytes[k] / max(v, 1e-9) / 1e3     # bytes/us -> GB/s
        fl = stage_flops[k] / max(v, 1e-9) / 1e3     # flops/us -> GFLOP/s
        print(f"  {k:12s} {v / 1e6:8.4f} s  {100.0 * v / total_us:5.1f}%  "
              f"{bw:7.1f} GB/s  {fl:8.1f} GFLOP/s")
    print("\n== top ops by device self time ==")
    for name, us in per_op.most_common(top_n):
        bw = op_bytes[name] / max(us, 1e-9) / 1e3
        tf_op = op_scope.get(name, "")
        scope = tf_op.split("/")[-1][:48] if tf_op else ""
        print(f"  {us / 1e6:8.4f} s  {100.0 * us / total_us:5.1f}%  "
              f"{bw:7.1f} GB/s  {name[:40]:40s} {scope}")

    # attribute the 'other' bucket (round-5: it was 23% of the harvest
    # call with no stage tag) — print ITS top ops with the full tf_op
    # scope so the untagged time can be assigned to a pipeline stage
    print("\n== top 'other' (untagged) ops ==")
    shown = 0
    for name, us in per_op.most_common():
        tf_op = op_scope.get(name, "")
        low = (name + " " + tf_op).lower()
        if next((s for s in STAGES if s in low), None):
            continue
        bw = op_bytes[name] / max(us, 1e-9) / 1e3
        print(f"  {us / 1e6:8.4f} s  {100.0 * us / total_us:5.1f}%  "
              f"{bw:7.1f} GB/s  {name[:36]:36s} {tf_op[-60:]}")
        shown += 1
        if shown >= 25:
            break


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("batch", nargs="?", type=int, default=128)
    p.add_argument("--trace_dir", default="/tmp/tpuvc_trace")
    p.add_argument("--report_only", action="store_true")
    p.add_argument("--f0-method", default="dio", choices=["dio", "harvest"])
    args = p.parse_args()
    if not args.report_only:
        capture(args.batch, args.trace_dir, args.f0_method)
    report(args.trace_dir)


if __name__ == "__main__":
    main()
