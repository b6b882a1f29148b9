"""Convergence training + VAE-vs-VAWGAN A/B (VERDICT r2 item 5).

Trains both models on the synthetic VCC2016-shaped corpus via the
device-resident multi-step path (train/steps.py), evaluating SF1->TM3
conversion MCD against the target's parallel recording at fixed
milestones, so the quality trajectory is reported to convergence and the
critic's contribution is measured at equal steps.

  python scripts/convergence_ab.py [--steps 30000] [--eval_every 5000]
                                   [--platform cpu]  # tiny smoke off-chip
  python scripts/convergence_ab.py --ab output_activation  # tanh-vs-linear
                                   # decoder bounding A/B (VERDICT r3 #2)

Milestones report conversion MCD plus the sharpness axes (mel-cepstral GV
ratio and high-band modulation-spectrum ratio vs the target's parallel
recordings — utils/metrics.py), so the critic is judged on the axis the
VAW-GAN paper claims (over-smoothing), not MCD alone (VERDICT r3 item 3).

Appends results to scale_validation.json under "convergence_ab" (model
A/B) or "output_activation_ab".
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="/tmp/vcc10")
    p.add_argument("--logdir", default="/tmp/vcc10_conv")
    p.add_argument("--steps", type=int, default=30000)
    p.add_argument("--eval_every", type=int, default=5000)
    p.add_argument("--n_inner", type=int, default=100)
    p.add_argument("--n_train", type=int, default=50)
    p.add_argument("--style", default="vowel", choices=["vowel", "hard"],
                   help="corpus difficulty: 'hard' = stop bursts, formant "
                        "glides, jitter/shimmer, variable speaking rate "
                        "(data/synthetic.py synth_hard_utterance; use a "
                        "fresh --root/--logdir per style)")
    p.add_argument("--platform", default=None)
    p.add_argument("--ab", default="model",
                   choices=["model", "output_activation", "all", "critic",
                            "alpha"],
                   help="which A/B to run: 'model' = VAWGAN vs VAE; "
                        "'output_activation' = tanh vs linear decoder "
                        "output on the VAE (VERDICT r3 item 2); 'all' = "
                        "three arms (VAWGAN, VAE-tanh, VAE-linear) sharing "
                        "the common VAE-tanh arm, results written to BOTH "
                        "keys — one chip pass answers both A/Bs; "
                        "'critic' = unconditional vs projection-"
                        "conditioned critic (the SURVEY SS2.1 "
                        "_discriminate(x, y?) open question, VERDICT r4 "
                        "missing #1); 'alpha' = adversarial-weight sweep "
                        "25/50/100 on the VAWGAN (VERDICT r4 item 3)")
    p.add_argument("--alphas", default="25,50,100",
                   help="arms for --ab alpha")
    args = p.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/tpuvc-jax-cache")

    from tpuvc.cli import analyze, evaluate
    from tpuvc.data.dataset import FrameDataset
    from tpuvc.data.normalizer import Tanhize
    from tpuvc.data.synthetic import make_vcc2016_corpus
    from tpuvc.train.trainer import make_trainer
    from tpuvc.utils.config import Architecture

    if not os.path.isdir(os.path.join(args.root, "wav")):
        # hard style: parallel content seeding across speakers — its
        # variable syllable timing otherwise breaks the framewise
        # "vs the target's parallel recording" premise (measured ~36 dB
        # framewise on non-parallel hard recordings — content mismatch,
        # not conversion error; data/synthetic.py make_corpus)
        make_vcc2016_corpus(args.root, n_train=args.n_train, n_test=5,
                            style=args.style,
                            parallel=(args.style == "hard"))
        print(f"[conv] corpus generated (style={args.style}, parallel="
              f"{args.style == 'hard'})", flush=True)
    if not os.path.isdir(os.path.join(args.root, "bin")):
        analyze.main(["--corpus", args.root, "--quiet"]
                     + (["--platform", args.platform]
                        if args.platform else []))
        print("[conv] corpus analyzed", flush=True)

    ds = FrameDataset.from_bin_dir(args.root)
    norm = Tanhize.from_etc(os.path.join(args.root, "etc"))
    data = norm.forward(ds.x)
    print(f"[conv] {len(ds)} frames resident", flush=True)

    base = Architecture.load("configs/architecture-vawgan-vcc2016.json")
    results: dict = {"steps": args.steps, "eval_every": args.eval_every,
                     "ab": args.ab, "style": args.style, "models": {}}
    if args.ab == "model":
        # critic's contribution at equal steps (VERDICT r2 item 5)
        arms = [("VAWGAN", {"model": "VAWGAN", "trainer": "VAWGANTrainer"}),
                ("VAE", {"model": "VAE", "trainer": "VAETrainer"})]
    elif args.ab == "output_activation":
        # decoder bounding: reference tanh output vs unbounded linear
        # (VERDICT r3 item 2; SURVEY.md SS3.4), both arms the VAE so the
        # activation is the only variable
        arms = [("tanh", {"model": "VAE", "trainer": "VAETrainer",
                          "output_activation": "tanh"}),
                ("linear", {"model": "VAE", "trainer": "VAETrainer",
                            "output_activation": "linear"})]
    elif args.ab == "critic":
        # does the critic need the speaker code? (projection conditioning
        # vs the unconditional parity default)
        arms = [("uncond", {"model": "VAWGAN", "trainer": "VAWGANTrainer",
                            "d_conditional": False}),
                ("cond", {"model": "VAWGAN", "trainer": "VAWGANTrainer",
                          "d_conditional": True})]
    elif args.ab == "alpha":
        arms = [(f"alpha{a}", {"model": "VAWGAN",
                               "trainer": "VAWGANTrainer",
                               "training": {"alpha": float(a)}})
                for a in args.alphas.split(",")]
    else:
        # both A/Bs in one chip pass: the default-config VAE (tanh) arm
        # is shared — VAWGAN-vs-VAE answers the critic question on the
        # sharpness axes, tanh-vs-linear answers the decoder bounding
        arms = [("VAWGAN", {"model": "VAWGAN", "trainer": "VAWGANTrainer"}),
                ("tanh", {"model": "VAE", "trainer": "VAETrainer",
                          "output_activation": "tanh"}),
                ("linear", {"model": "VAE", "trainer": "VAETrainer",
                            "output_activation": "linear"})]
    for model_name, overrides in arms:
        overrides = dict(overrides)
        train_over = overrides.pop("training", None)
        arch = dataclasses.replace(base, **overrides)
        if train_over:
            arch = dataclasses.replace(
                arch, training=dataclasses.replace(arch.training,
                                                   **train_over))
        run_dir = os.path.join(args.logdir, model_name.lower())
        os.makedirs(run_dir, exist_ok=True)
        arch.save(os.path.join(run_dir, "architecture.json"))
        trainer = make_trainer(arch, run_dir, use_tensorboard=False)
        traj = []
        t0 = time.perf_counter()
        for milestone in range(args.eval_every, args.steps + 1,
                               args.eval_every):
            m = trainer.train_resident(data, ds.y, total_steps=milestone,
                                       n_inner=args.n_inner,
                                       save_every=args.eval_every)
            wall = round(time.perf_counter() - t0, 1)
            ev = evaluate.main(
                ["--corpus", args.root, "--checkpoint", run_dir,
                 "--src", "SF1", "--trg", "TM3"]
                + (["--platform", args.platform] if args.platform else []))
            traj.append({"step": milestone, "mcd_db": ev["mean"],
                         "mcd_dtw_db": ev.get("mean_dtw"),
                         "gv_ratio_db": ev.get("gv_ratio_db"),
                         "ms_highband_ratio_db":
                             ev.get("ms_highband_ratio_db"),
                         "train_wall_s": wall})
            print(f"[conv] {model_name} step {milestone}: "
                  f"MCD {ev['mean']} dB, GV {ev.get('gv_ratio_db')} dB, "
                  f"MS-hi {ev.get('ms_highband_ratio_db')} dB "
                  f"(wall {wall}s, "
                  f"metrics { {k: round(v, 3) for k, v in m.items()} })",
                  flush=True)
            # survive a mid-run kill: completed milestones land on disk
            results["models"][model_name] = traj
            json.dump(results, open(os.path.join(
                args.logdir, "partial_results.json"), "w"), indent=2)
        trainer.close()

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                       "scale_validation.json")
    blob = json.load(open(out)) if os.path.exists(out) else {}
    sfx = "_hard" if args.style == "hard" else ""
    if args.ab == "all":
        m = results["models"]
        header = {k: results[k] for k in ("steps", "eval_every", "style")}
        blob["convergence_ab" + sfx] = dict(
            header, ab="model",
            models={"VAWGAN": m["VAWGAN"], "VAE": m["tanh"]})
        blob["output_activation_ab" + sfx] = dict(
            header, ab="output_activation",
            models={"tanh": m["tanh"], "linear": m["linear"]})
    else:
        key = {"model": "convergence_ab",
               "output_activation": "output_activation_ab",
               "critic": "critic_conditioning_ab",
               "alpha": "alpha_sweep"}[args.ab] + sfx
        blob[key] = results
    json.dump(blob, open(out, "w"), indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
