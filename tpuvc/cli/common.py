"""Shared CLI plumbing: platform selection, arch loading."""

from __future__ import annotations

import argparse
import os


def add_platform_flag(p: argparse.ArgumentParser) -> None:
    p.add_argument("--platform", default=None,
                   help="jax platform override (cpu / axon / tpu); default "
                        "keeps the environment's backend")


def apply_platform(args: argparse.Namespace) -> None:
    """Must run before any jax computation.  Note: this sandbox imports jax
    at interpreter start via sitecustomize, so jax.config is the only
    reliable override (env vars are read too early)."""
    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
        import jax
        jax.config.update("jax_platforms", args.platform)
