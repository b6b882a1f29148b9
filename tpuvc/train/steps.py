"""Jit-compiled training step functions (VAE and VAWGAN).

The reference runs one sess.run per optimizer step with n_unroll critic
steps per generator step in host Python (trainer/vawgan.py:~L60, SURVEY.md
SS3.2).  Here the whole unroll is ONE device program: the critic phase is a
lax.scan over its minibatches, followed by the generator update — no
host round-trips inside the hot loop.  Data parallelism comes from batch
sharding: under a mesh, XLA turns the gradient mean into a psum over ICI.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from tpuvc.models import losses
from tpuvc.models.vae import CVAE, VAWGAN
from tpuvc.train.state import (VAETrainState, VAWGANTrainState,
                               merge_gan_params, split_gan_params)
from tpuvc.utils.config import Architecture


def make_vae_optimizer(arch: Architecture) -> optax.GradientTransformation:
    t = arch.training
    return optax.adam(t.lr, b1=t.beta1, b2=t.beta2)


def init_vae_state(model: CVAE, arch: Architecture,
                   rng: jax.Array) -> VAETrainState:
    from tpuvc.models.vae import init_params
    params = init_params(model, arch, rng)
    tx = make_vae_optimizer(arch)
    return VAETrainState(params=params, opt_state=tx.init(params),
                         step=jnp.zeros((), jnp.int32))


def make_vae_step(model: CVAE, arch: Architecture) -> Callable:
    tx = make_vae_optimizer(arch)

    def step(state: VAETrainState, x: jnp.ndarray, y: jnp.ndarray,
             rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            metrics, _ = model.apply(params, x, y, rng, method=CVAE.loss)
            return metrics["loss"], metrics

        grads, metrics = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return VAETrainState(params=params, opt_state=opt_state,
                             step=state.step + 1), metrics

    return jax.jit(step, donate_argnums=(0,))


def init_vawgan_state(model: VAWGAN, arch: Architecture,
                      rng: jax.Array) -> VAWGANTrainState:
    from tpuvc.models.vae import init_params
    params = init_params(model, arch, rng)
    gen, critic = split_gan_params(params)
    tx_g, tx_d = make_gan_optimizers(arch)
    return VAWGANTrainState(params=params, opt_g=tx_g.init(gen),
                            opt_d=tx_d.init(critic),
                            step=jnp.zeros((), jnp.int32))


def make_gan_optimizers(arch: Architecture):
    t = arch.training
    tx_g = optax.adam(t.lr, b1=t.beta1, b2=t.beta2)
    tx_d = optax.adam(t.lr, b1=t.beta1, b2=t.beta2)
    return tx_g, tx_d


def make_vawgan_step(model: VAWGAN, arch: Architecture) -> Callable:
    """One jitted VAWGAN step: n_unroll critic updates + 1 generator update.

    Args of the returned fn:
      state, x_crit [n_unroll, B, D], y_crit [n_unroll, B],
      x_gen [B, D], y_gen [B], rng.
    """
    t = arch.training
    tx_g, tx_d = make_gan_optimizers(arch)

    def apply_fwd(params, x, y, rng):
        return model.apply(params, x, y, rng)

    def critic_loss(critic_tree, gen_tree, x, y, rng, rng_gp):
        params = merge_gan_params(gen_tree, critic_tree)
        out = apply_fwd(params, x, y, rng)
        xh = jax.lax.stop_gradient(out["xh"])
        d_real = out["d_real"]
        d_fake = model.apply(params, xh, y, method=VAWGAN.discriminate)
        w = losses.wasserstein_distance(d_real, d_fake)

        def critic_single(xi, yi):
            return model.apply(params, xi[None], yi[None],
                               method=VAWGAN.discriminate)[0]

        gp = losses.gradient_penalty(critic_single, rng_gp, x, xh, y)
        loss = -w + t.gp_lambda * gp
        return loss, {"W_dist": w, "GP": gp, "l_D": loss}

    def gen_loss(gen_tree, critic_tree, x, y, rng):
        params = merge_gan_params(gen_tree, critic_tree)
        out = apply_fwd(params, x, y, rng)
        kld = losses.gaussian_kld(out["z_mu"], out["z_lv"])
        logp = losses.gaussian_log_density(x, out["xh"])
        adv = -jnp.mean(out["d_fake"])
        loss = kld - logp + t.alpha * adv
        return loss, {"D_KL": kld, "logP": logp, "l_G": loss, "adv": adv}

    def step(state: VAWGANTrainState, x_crit, y_crit, x_gen, y_gen,
             rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)
        gen_tree, critic_tree = split_gan_params(state.params)

        def critic_body(carry, inp):
            crit, opt_d, k = carry
            xb, yb = inp
            r1 = jax.random.fold_in(rng, 2 * k + 1)
            r2 = jax.random.fold_in(rng, 2 * k + 2)
            grads, aux = jax.grad(critic_loss, has_aux=True)(
                crit, gen_tree, xb, yb, r1, r2)
            updates, opt_d = tx_d.update(grads, opt_d, crit)
            crit = optax.apply_updates(crit, updates)
            return (crit, opt_d, k + 1), aux

        (critic_tree, opt_d, _), d_aux = jax.lax.scan(
            critic_body, (critic_tree, state.opt_d, 0), (x_crit, y_crit))

        r_g = jax.random.fold_in(rng, 0)
        grads, g_aux = jax.grad(gen_loss, has_aux=True)(
            gen_tree, critic_tree, x_gen, y_gen, r_g)
        updates, opt_g = tx_g.update(grads, state.opt_g, gen_tree)
        gen_tree = optax.apply_updates(gen_tree, updates)

        metrics = {**{k: v[-1] for k, v in d_aux.items()}, **g_aux}
        new_state = VAWGANTrainState(
            params=merge_gan_params(gen_tree, critic_tree),
            opt_g=opt_g, opt_d=opt_d, step=state.step + 1)
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,))
