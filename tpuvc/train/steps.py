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


def _sample_rows(data: jnp.ndarray, labels: jnp.ndarray, rng: jax.Array,
                 shape: tuple[int, ...]) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Uniform minibatch sample from a device-resident frame table."""
    idx = jax.random.randint(rng, shape, 0, data.shape[0])
    return jnp.take(data, idx, axis=0), jnp.take(labels, idx, axis=0)


def make_vae_multistep(model: CVAE, arch: Architecture,
                       n_inner: int) -> Callable:
    """n_inner VAE steps as ONE device program over a RESIDENT dataset.

    TPU-first fast path (round 3): the per-step trainer ships ~0.5 MB of
    minibatch per dispatch and pays this sandbox's ~0.3 s tunnel latency
    every step (~3 steps/s wall at batch 256 on chip, vs 4.3 ms/step of
    compute).  Uploading the frame table to HBM once ([F, 513] f32 — a
    VCC2016-scale corpus is ~1 GB) and scanning n_inner steps per
    dispatch, with minibatches drawn ON DEVICE by jax.random.randint +
    row gather, removes the per-step host round trip entirely: wall
    becomes max(compute, one dispatch per n_inner steps).  Sampling is
    i.i.d. uniform-with-replacement — the frame-shuffle semantics the
    reference's shuffle_batch approximates (frames are i.i.d. per
    SURVEY.md SS2.4); the Grain pipeline stays the epoch-exact default.
    """
    tx = make_vae_optimizer(arch)
    b = arch.training.batch_size

    def one(state: VAETrainState, data, labels, rng):
        r = jax.random.fold_in(rng, state.step)
        x, y = _sample_rows(data, labels, jax.random.fold_in(r, 777), (b,))

        def loss_fn(params):
            metrics, _ = model.apply(params, x, y, r, method=CVAE.loss)
            return metrics["loss"], metrics

        grads, metrics = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return VAETrainState(params=params, opt_state=opt_state,
                             step=state.step + 1), metrics

    def multi(state: VAETrainState, data, labels, rng: jax.Array):
        def body(st, _):
            return one(st, data, labels, rng)

        state, ms = jax.lax.scan(body, state, None, length=n_inner)
        return state, {k: v[-1] for k, v in ms.items()}

    return jax.jit(multi, donate_argnums=(0,))


def make_vawgan_multistep(model: VAWGAN, arch: Architecture,
                          n_inner: int) -> Callable:
    """n_inner full VAWGAN steps (each n_unroll critic + 1 generator
    update) as ONE device program over a resident dataset — see
    make_vae_multistep for the rationale and sampling semantics."""
    t = arch.training
    b = t.batch_size
    inner_step = _make_vawgan_step_fn(model, arch)

    def multi(state: VAWGANTrainState, data, labels, rng: jax.Array):
        def body(st, _):
            r = jax.random.fold_in(rng, st.step)
            xc, yc = _sample_rows(data, labels,
                                  jax.random.fold_in(r, 555),
                                  (t.n_unroll, b))
            xg, yg = _sample_rows(data, labels,
                                  jax.random.fold_in(r, 666), (b,))
            return inner_step(st, xc, yc, xg, yg, rng)

        state, ms = jax.lax.scan(body, state, None, length=n_inner)
        return state, {k: v[-1] for k, v in ms.items()}

    return jax.jit(multi, donate_argnums=(0,))


def make_vawgan_step(model: VAWGAN, arch: Architecture) -> Callable:
    """One jitted VAWGAN step: n_unroll critic updates + 1 generator update.

    Args of the returned fn:
      state, x_crit [n_unroll, B, D], y_crit [n_unroll, B],
      x_gen [B, D], y_gen [B], rng.
    """
    return jax.jit(_make_vawgan_step_fn(model, arch), donate_argnums=(0,))


def _make_vawgan_step_fn(model: VAWGAN, arch: Architecture) -> Callable:
    """The un-jitted VAWGAN step (shared by the per-dispatch and the
    resident multi-step paths)."""
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

    return step
