"""Critic speaker-conditioning A/B (VERDICT round-1 item 6).

SURVEY.md SS2.1 writes the reference critic as ``_discriminate(x, y?)`` —
whether the Wasserstein critic sees the speaker code is an open parity
question.  ``Architecture.d_conditional`` (projection conditioning, Miyato &
Koyama 2018) makes it a config switch; this script trains both settings on
the same data/seed and records the training curves + conversion quality so
STATUS.md can state which setting we ship as the parity default and why.

  python scripts/critic_conditioning_ab.py [--steps 600] [--platform cpu]

NOTE (round 5): the DECISION-GRADE version of this A/B — 30k resident
steps with MCD/DTW-MCD/GV/MS-hi milestones — runs as
``python scripts/convergence_ab.py --ab critic`` and records into
scale_validation.json "critic_conditioning_ab"; this script remains the
quick per-step training-curve smoke.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="/tmp/ab_corpus")
    p.add_argument("--logdir", default="/tmp/ab_logdir")
    p.add_argument("--steps", type=int, default=600)
    p.add_argument("--log_every", type=int, default=25)
    p.add_argument("--platform", default=None)
    args = p.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    from tpuvc.cli import analyze, evaluate
    from tpuvc.data.dataset import FrameDataset
    from tpuvc.data.normalizer import Tanhize
    from tpuvc.data.synthetic import make_vcc2016_corpus
    from tpuvc.train.trainer import VAWGANTrainer
    from tpuvc.utils.config import Architecture

    if not os.path.isdir(os.path.join(args.root, "wav")):
        make_vcc2016_corpus(args.root, n_train=8, n_test=2)
        analyze.main(["--corpus", args.root, "--quiet"]
                     + (["--platform", args.platform]
                        if args.platform else []))

    ds = FrameDataset.from_bin_dir(args.root)
    etc = os.path.join(args.root, "etc")
    try:
        norm = Tanhize.from_etc(etc)
    except FileNotFoundError:
        norm = ds.fit_normalizer()
        norm.save(etc)

    base = Architecture.load(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "..", "configs", "architecture-vawgan-vcc2016.json"))

    results: dict = {}
    for cond in (False, True):
        name = "conditional" if cond else "unconditional"
        arch = dataclasses.replace(base, d_conditional=cond)
        run_dir = os.path.join(args.logdir, name)
        shutil.rmtree(run_dir, ignore_errors=True)
        os.makedirs(run_dir)
        arch.save(os.path.join(run_dir, "architecture.json"))
        trainer = VAWGANTrainer(arch, run_dir, seed=0,
                                use_tensorboard=False)
        batches = ds.batches(arch.training.batch_size, normalizer=norm,
                             seed=0)
        t0 = time.perf_counter()
        trainer.train(batches, args.steps, log_every=args.log_every)
        wall = round(time.perf_counter() - t0, 1)
        trainer.close()

        with open(os.path.join(run_dir, "events", "metrics.jsonl")) as f:
            curve = [json.loads(ln) for ln in f if ln.strip()]
        ev = evaluate.main(["--corpus", args.root, "--checkpoint", run_dir,
                            "--src", "SF1", "--trg", "TM3"]
                           + (["--platform", args.platform]
                              if args.platform else []))
        results[name] = {
            "train_s": wall,
            "curve": [{k: round(v, 3) for k, v in m.items()}
                      for m in curve],
            "eval_sf1_tm3": ev,
        }
        print(f"[ab] {name}: {wall}s; final "
              f"{ {k: round(v, 3) for k, v in curve[-1].items()} }; "
              f"eval {ev}")

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "..", "critic_ab.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)

    # markdown summary for STATUS.md
    print("\n| step | W_dist (uncond) | W_dist (cond) | l_G (uncond) "
          "| l_G (cond) |")
    print("|---|---|---|---|---|")
    cu = results["unconditional"]["curve"]
    cc = results["conditional"]["curve"]
    for mu, mc in zip(cu, cc):
        print(f"| {int(mu['step'])} | {mu.get('W_dist', float('nan')):.3f} "
              f"| {mc.get('W_dist', float('nan')):.3f} "
              f"| {mu.get('l_G', float('nan')):.3f} "
              f"| {mc.get('l_G', float('nan')):.3f} |")


if __name__ == "__main__":
    main()
