"""Loss functions for the VAE / VAW-GAN models.

TPU-native equivalents of the reference's loss helpers
(``GaussianLogDensity``, ``GaussianKLD`` in model/vae.py:~L1-150, and the
Wasserstein + gradient-penalty terms of the VAWGAN model, SURVEY.md SS2.1
[reconstructed]).  All are jit/grad-safe pure functions; the gradient
penalty takes its inner gradient with a per-sample ``jax.vmap(jax.grad)``,
which XLA fuses with the critic's forward pass.
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp

_LOG2PI = math.log(2.0 * math.pi)


def gaussian_kld(mu: jnp.ndarray, log_var: jnp.ndarray) -> jnp.ndarray:
    """KL(N(mu, e^log_var) || N(0, I)), summed over dims, mean over batch."""
    per = 0.5 * jnp.sum(jnp.exp(log_var) + mu * mu - 1.0 - log_var, axis=-1)
    return jnp.mean(per)


def gaussian_log_density(x: jnp.ndarray, mu: jnp.ndarray,
                         log_var: jnp.ndarray | float = 0.0) -> jnp.ndarray:
    """log N(x; mu, e^log_var) summed over dims, mean over batch.

    The reference evaluates decoder likelihood at unit variance
    (log_var = 0), making -logP an MSE up to constants.
    """
    lv = jnp.asarray(log_var)
    per = -0.5 * jnp.sum(_LOG2PI + lv + (x - mu) ** 2 / jnp.exp(lv), axis=-1)
    return jnp.mean(per)


def reparameterize(rng: jax.Array, mu: jnp.ndarray,
                   log_var: jnp.ndarray) -> jnp.ndarray:
    eps = jax.random.normal(rng, mu.shape, mu.dtype)
    return mu + eps * jnp.exp(0.5 * log_var)


def wasserstein_distance(d_real: jnp.ndarray,
                         d_fake: jnp.ndarray) -> jnp.ndarray:
    """E[D(real)] - E[D(fake)] (the critic maximizes this)."""
    return jnp.mean(d_real) - jnp.mean(d_fake)


def gradient_penalty(critic: Callable[..., jnp.ndarray],
                     rng: jax.Array, x_real: jnp.ndarray,
                     x_fake: jnp.ndarray, *cond: jnp.ndarray) -> jnp.ndarray:
    """WGAN-GP: E[(||grad_x D(x_interp)|| - 1)^2].

    ``critic`` maps a single sample [d] (+ per-sample conditioning args)
    -> scalar; vmapped over the batch.  The gradient is taken w.r.t. the
    interpolated sample only.
    """
    eps = jax.random.uniform(rng, (x_real.shape[0],) + (1,) *
                             (x_real.ndim - 1), x_real.dtype)
    x_hat = eps * x_real + (1.0 - eps) * x_fake
    grads = jax.vmap(jax.grad(critic))(x_hat, *cond)
    norms = jnp.sqrt(jnp.sum(grads * grads, axis=-1) + 1e-12)
    return jnp.mean((norms - 1.0) ** 2)
