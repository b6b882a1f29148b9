"""Training state containers and parameter partitioning.

The reference keeps separate optimizer variable sets for the critic vs the
encoder+generator (trainer/vawgan.py, SURVEY.md SS2.1); here the same split
is a pure-pytree partition of the Flax parameter dict by top-level module
name ('encoder'/'decoder' vs 'critic').
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import optax
from flax import struct

CRITIC_KEY = "critic"


class VAETrainState(struct.PyTreeNode):
    params: Any
    opt_state: optax.OptState
    step: jnp.ndarray


class VAWGANTrainState(struct.PyTreeNode):
    params: Any            # full {'params': {'encoder','decoder','critic'}}
    opt_g: optax.OptState  # over generator subtree (encoder+decoder)
    opt_d: optax.OptState  # over critic subtree
    step: jnp.ndarray


def split_gan_params(params: Any) -> tuple[Any, Any]:
    """full params -> (generator subtree, critic subtree)."""
    inner = params["params"]
    gen = {k: v for k, v in inner.items() if k != CRITIC_KEY}
    return gen, inner[CRITIC_KEY]


def merge_gan_params(gen: Any, critic: Any) -> Any:
    return {"params": {**gen, CRITIC_KEY: critic}}
