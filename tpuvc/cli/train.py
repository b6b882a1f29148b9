"""Training CLI (the reference's ``python main.py``).

  python -m tpuvc.cli.train --model VAWGAN --trainer VAWGANTrainer \
      --architecture configs/architecture-vawgan-vcc2016.json \
      --corpus dataset/vcc2016 [--logdir logdir] [--restore_from DIR] \
      [--steps N] [--msg "note"]

Mirrors the reference flag surface (main.py tf.app.flags, SURVEY.md SS2.1);
model/trainer names resolve through the registry instead of importlib
strings.
"""

from __future__ import annotations

import argparse
import dataclasses
import os

from tpuvc.cli.common import add_platform_flag, apply_platform


def main(argv: list[str] | None = None) -> str:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--architecture",
                   default="configs/architecture-vawgan-vcc2016.json")
    p.add_argument("--model", default=None,
                   help="override the architecture's model (VAE | VAWGAN)")
    p.add_argument("--trainer", default=None,
                   help="override trainer (VAETrainer | VAWGANTrainer)")
    p.add_argument("--corpus", required=True)
    p.add_argument("--logdir", default="logdir")
    p.add_argument("--restore_from", default=None)
    p.add_argument("--msg", default=None)
    p.add_argument("--steps", type=int, default=None,
                   help="total optimizer steps (default: epochs * "
                        "frames-per-epoch / batch)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--no-tensorboard", action="store_true")
    p.add_argument("--debug_nans", action="store_true",
                   help="fail fast on NaNs inside jit (SURVEY.md SS5.2)")
    p.add_argument("--profile", action="store_true",
                   help="capture a jax.profiler trace of the run into the "
                        "run dir (TensorBoard profile plugin)")
    p.add_argument("--resident", type=int, default=0, metavar="N",
                   help="device-resident fast path: upload the frame table "
                        "to HBM once and run N optimizer steps per "
                        "dispatch (on-device uniform minibatch sampling; "
                        "removes the per-step host round trip that bounds "
                        "this sandbox's tunnel at ~3 steps/s).  0 = the "
                        "epoch-exact streaming trainer (default)")
    add_platform_flag(p)
    args = p.parse_args(argv)
    apply_platform(args)

    if args.debug_nans:
        from tpuvc.utils.profiling import enable_debug_checks
        enable_debug_checks()

    from tpuvc.data.dataset import FrameDataset
    from tpuvc.train.trainer import make_trainer
    from tpuvc.utils.config import Architecture
    from tpuvc.utils.logdir import make_run_dir

    arch = Architecture.load(args.architecture)
    overrides = {}
    if args.model:
        overrides["model"] = args.model
    if args.trainer:
        overrides["trainer"] = args.trainer
    if overrides:
        arch = dataclasses.replace(arch, **overrides)

    run_dir = make_run_dir(args.logdir, args.restore_from, args.msg)
    arch.save(os.path.join(run_dir, "architecture.json"))

    ds = FrameDataset.from_bin_dir(args.corpus)
    etc = os.path.join(args.corpus, "etc")
    try:
        from tpuvc.data.normalizer import Tanhize
        norm = Tanhize.from_etc(etc)
    except FileNotFoundError:
        norm = ds.fit_normalizer()
        norm.save(etc)
    t = arch.training
    steps = args.steps or max(1, t.epoch * t.num_frames_per_epoch
                              // t.batch_size)
    # VAWGAN consumes n_unroll+1 batches per step
    trainer = make_trainer(arch, run_dir, seed=args.seed,
                           use_tensorboard=not args.no_tensorboard)
    print(f"[train] {arch.model}/{arch.trainer} run_dir={run_dir} "
          f"frames={len(ds)} steps={steps}")
    from tpuvc.utils.profiling import trace
    with trace(os.path.join(run_dir, "profile") if args.profile else None):
        if args.resident:
            data = norm.forward(ds.x) if norm is not None else ds.x
            metrics = trainer.train_resident(data, ds.y, steps,
                                             n_inner=args.resident)
        else:
            metrics = trainer.train(
                ds.batches(t.batch_size, seed=args.seed, normalizer=norm),
                steps)
    trainer.close()
    print(f"[train] final metrics: "
          f"{ {k: round(v, 4) for k, v in metrics.items()} }")
    return run_dir


if __name__ == "__main__":
    main()
