"""Scale validation run (VERDICT round-1 item 7; BASELINE configs 2-4).

Generates a 10-speaker VCC2016-shaped synthetic corpus (~50 utt/speaker),
then on the attached chip:
  config 2: batched WORLD analysis of the whole corpus        (cli.analyze)
  config 3: VAWGAN joint training, batch 256, N steps          (cli.train)
  config 4: all-pairs many-to-many conversion (90 pairs)       (cli.convert)
plus conversion-MCD quality eval on one pair per VERDICT item 7.

Records wall-clock + quality into scale_validation.json and prints a
markdown table for docs/STATUS.md.

  python scripts/scale_validation.py [--root /tmp/vcc10] [--steps 1500]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="/tmp/vcc10")
    p.add_argument("--logdir", default="/tmp/vcc10_logdir")
    p.add_argument("--steps", type=int, default=1500)
    p.add_argument("--n_train", type=int, default=50)
    p.add_argument("--fresh", action="store_true")
    p.add_argument("--platform", default=None,
                   help="cpu to validate the script off-chip")
    args = p.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    from tpuvc.cli import analyze, convert, evaluate, train
    from tpuvc.data.synthetic import make_vcc2016_corpus

    results: dict = {}

    if args.fresh:
        shutil.rmtree(args.root, ignore_errors=True)
        shutil.rmtree(args.logdir, ignore_errors=True)
    if not os.path.isdir(os.path.join(args.root, "wav")):
        t0 = time.perf_counter()
        make_vcc2016_corpus(args.root, n_train=args.n_train, n_test=5)
        results["corpus_gen_s"] = round(time.perf_counter() - t0, 1)
        print(f"[scale] corpus generated in {results['corpus_gen_s']}s")

    # config 2: batched analysis frontend
    t0 = time.perf_counter()
    analyze.main(["--corpus", args.root, "--quiet"]
                 + (["--platform", args.platform] if args.platform else []))
    results["config2_analyze_s"] = round(time.perf_counter() - t0, 1)
    n_utt = 10 * (args.n_train + 5)
    audio_s = n_utt * 1.5
    results["config2_audio_s"] = audio_s
    results["config2_x_realtime"] = round(
        audio_s / results["config2_analyze_s"], 1)
    print(f"[scale] config2 analyze: {results['config2_analyze_s']}s "
          f"({results['config2_x_realtime']}x realtime incl. host I/O)")

    # config 3: VAWGAN training
    t0 = time.perf_counter()
    run_dir = train.main(["--corpus", args.root, "--logdir", args.logdir,
                          "--steps", str(args.steps), "--no-tensorboard"]
                         + (["--platform", args.platform]
                            if args.platform else []))
    results["config3_train_s"] = round(time.perf_counter() - t0, 1)
    results["config3_steps"] = args.steps
    results["config3_steps_per_s"] = round(
        args.steps / results["config3_train_s"], 2)
    metrics_path = os.path.join(run_dir, "events", "metrics.jsonl")
    if os.path.exists(metrics_path):
        with open(metrics_path) as f:
            lines = [json.loads(ln) for ln in f if ln.strip()]
        if lines:
            results["config3_final_metrics"] = {
                k: round(v, 3) for k, v in lines[-1].items()}
    print(f"[scale] config3 train: {results['config3_train_s']}s "
          f"({results['config3_steps_per_s']} steps/s)")

    # config 4: all-pairs conversion
    t0 = time.perf_counter()
    outs = convert.main(["--checkpoint", run_dir, "--corpus", args.root,
                         "--all_pairs"]
                        + (["--platform", args.platform]
                           if args.platform else []))
    results["config4_convert_s"] = round(time.perf_counter() - t0, 1)
    results["config4_n_conversions"] = len(outs)
    results["config4_x_realtime"] = round(
        len(outs) * 1.5 / results["config4_convert_s"], 1)
    print(f"[scale] config4 all-pairs: {len(outs)} conversions in "
          f"{results['config4_convert_s']}s "
          f"({results['config4_x_realtime']}x realtime incl. host I/O)")

    # quality: conversion MCD for SF1->TM3 (the reference headline pair)
    ev = evaluate.main(["--corpus", args.root, "--checkpoint", run_dir,
                        "--src", "SF1", "--trg", "TM3"]
                       + (["--platform", args.platform]
                          if args.platform else []))
    results["quality_sf1_tm3"] = ev

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "..", "scale_validation.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
