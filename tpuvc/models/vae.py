"""Speaker-conditioned convolutional VAE and VAW-GAN critic (Flax).

TPU-native rebuild of the reference's models (model/vae.py: conv encoder,
speaker-conditioned decoder/generator, Wasserstein critic — SURVEY.md SS2.1,
SS3.4 [reconstructed]).  Differences from the reference are deliberate,
TPU-first choices:

  - frames are [B, 513] and convolutions are 1-D over the frequency axis
    (the reference reshapes to NHWC [b,513,1,1] and uses 2-D convs with
    [k,1] kernels — same arithmetic, clumsier layout);
  - LayerNorm instead of batch norm everywhere: jit-friendly (no mutable
    batch stats), valid inside the WGAN-GP critic, and identical math at
    this model scale;
  - the decoder's transposed-conv stack starts from 19 latent positions and
    upsamples 19 -> 57 -> 171 -> 513 (strides 3,3,3,1,1), because 513 =
    27 * 19 composes exactly; the reference mirrors its encoder from 3
    positions, which cannot hit 513 with stride-3 transposed convs without
    cropping;
  - compute dtype is configurable (bfloat16 on TPU; float32 in tests) with
    float32 parameters.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from tpuvc.models import losses
from tpuvc.utils.config import Architecture, NetSpec

Dtype = Any


class ConvStack(nn.Module):
    """Strided 1-D conv stack with LayerNorm + LeakyReLU after each layer.

    conv_impl="pallas" runs each layer as ONE fused VMEM-resident kernel
    (ops/pallas_conv.py) — the north-star 'fused conv+norm+activation'
    path for TPU inference.  The parameter tree differs between impls.
    """

    spec: NetSpec
    slope: float
    dtype: Dtype = jnp.float32
    conv_impl: str = "xla"

    @nn.compact
    def __call__(self, h: jnp.ndarray) -> jnp.ndarray:  # [B, L, C]
        if self.conv_impl == "pallas":
            from tpuvc.ops.pallas_conv import conv_ln_lrelu
            from tpuvc.ops.pallas_window import use_pallas
            interp = not use_pallas()
            for i, (k, s, c) in enumerate(zip(self.spec.kernel,
                                              self.spec.stride,
                                              self.spec.output)):
                cin = h.shape[-1]
                w = self.param(f"conv{i}_kernel",
                               nn.initializers.lecun_normal(), (k, cin, c))
                b = self.param(f"conv{i}_bias", nn.initializers.zeros, (c,))
                g = self.param(f"ln{i}_scale", nn.initializers.ones, (c,))
                bt = self.param(f"ln{i}_bias", nn.initializers.zeros, (c,))
                h = conv_ln_lrelu(h, w, b, g, bt, s, self.slope,
                                  interpret=interp)
            return h
        for k, s, c in zip(self.spec.kernel, self.spec.stride,
                           self.spec.output):
            h = nn.Conv(c, (k,), strides=(s,), padding="SAME",
                        dtype=self.dtype)(h)
            h = nn.LayerNorm(dtype=self.dtype)(h)
            h = nn.leaky_relu(h, self.slope)
        return h


class Encoder(nn.Module):
    """x [B, 513] -> (z_mu, z_log_var) [B, z_dim] (reference _encode)."""

    arch: Architecture
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        h = x[..., None].astype(self.dtype)                 # [B, 513, 1]
        h = ConvStack(self.arch.encoder, self.arch.lrelu_slope,
                      self.dtype, self.arch.conv_impl)(h)
        h = h.reshape(h.shape[0], -1)
        mu = nn.Dense(self.arch.z_dim, dtype=self.dtype)(h)
        lv = nn.Dense(self.arch.z_dim, dtype=self.dtype)(h)
        return mu.astype(jnp.float32), lv.astype(jnp.float32)


class Decoder(nn.Module):
    """(z [B, z_dim], y [B] int) -> x_hat [B, 513] (reference _generate).

    The speaker code is embedded and concatenated with z at the input,
    exactly the reference's conditioning point.
    """

    arch: Architecture
    dtype: Dtype = jnp.float32
    base_len: int = 19  # 19 * 3^3 = 513

    @nn.compact
    def __call__(self, z: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        emb = nn.Embed(self.arch.y_dim, self.arch.y_emb_dim,
                       dtype=self.dtype)(y)                 # [B, E]
        h = jnp.concatenate([z.astype(self.dtype), emb], axis=-1)
        spec = self.arch.generator
        c0 = spec.output[0]
        h = nn.Dense(self.base_len * c0, dtype=self.dtype)(h)
        h = nn.LayerNorm(dtype=self.dtype)(h)
        h = nn.leaky_relu(h, self.arch.lrelu_slope)
        h = h.reshape(h.shape[0], self.base_len, c0)
        n_layers = len(spec.kernel)
        for i, (k, s, c) in enumerate(zip(spec.kernel, spec.stride,
                                          spec.output)):
            last = i == n_layers - 1
            if s == 1:
                h = nn.Conv(c, (k,), strides=(1,), padding="SAME",
                            dtype=self.dtype)(h)
                if not last:
                    h = nn.LayerNorm(dtype=self.dtype)(h)
                    h = nn.leaky_relu(h, self.arch.lrelu_slope)
            else:
                # subpixel upsampling (conv + depth-to-space): the same
                # linear family as ConvTranspose but lowers to a dense
                # stride-1 conv, which XLA maps onto the MXU far better
                # than transposed-conv scatter (~5x on v5e)
                h = nn.Conv(c * s, (k,), strides=(1,), padding="SAME",
                            dtype=self.dtype)(h)
                if not last and self.arch.d2s_impl == "pallas":
                    # fuse the lane relayout with the LN+lrelu that follow
                    # (ops/pallas_d2s.py; MEASURED-NEGATIVE opt-in — two
                    # on-chip A/Bs lost to the XLA reshape, kept with its
                    # numbers per docs/PERFORMANCE.md round-3/4 item 5)
                    from tpuvc.ops.pallas_d2s import d2s_ln_lrelu
                    from tpuvc.ops.pallas_window import use_pallas
                    g = self.param(f"d2s_ln{i}_scale",
                                   nn.initializers.ones, (c,))
                    bt = self.param(f"d2s_ln{i}_bias",
                                    nn.initializers.zeros, (c,))
                    h = d2s_ln_lrelu(h, g, bt, s, self.arch.lrelu_slope,
                                     interpret=not use_pallas())
                else:
                    h = h.reshape(h.shape[0], h.shape[1] * s, c)
                    if not last:
                        h = nn.LayerNorm(dtype=self.dtype)(h)
                        h = nn.leaky_relu(h, self.arch.lrelu_slope)
        # final layer has 1 channel: squeeze to a frame
        out = h.squeeze(-1) if h.shape[-1] == 1 else nn.Dense(
            1, dtype=self.dtype)(h).squeeze(-1)
        if self.arch.output_activation == "tanh":
            # bound the frame to the Tanhize range [-1, 1] (the reference
            # generator's tanh-ranged output, SURVEY.md SS3.4; "linear" is
            # the unbounded ablation arm — utils/config.py)
            out = jnp.tanh(out)
        return out.astype(jnp.float32)


class Critic(nn.Module):
    """Wasserstein critic x [B, 513] -> score [B] (reference _discriminate).

    SURVEY.md SS2.1 flags the y-conditioning as an open question
    (`_discriminate(x, y?)`).  Settled by data (round 5, 30k-step
    resident A/B, scale_validation.json "critic_conditioning_ab"): with
    ``arch.d_conditional`` (now the default) the speaker code enters as
    a projection term score += <embed(y), features> (cGAN projection
    discriminator, Miyato & Koyama 2018) and wins on every quality axis
    — MCD 5.249 vs 5.638 dB and GV ratio +0.08 vs -0.79 dB against the
    unconditioned arm, i.e. the projection critic CLOSES the
    over-smoothing gap the unconditioned one only halved.
    d_conditional=False remains the unconditioned ablation arm (legacy
    architecture.json files load as False — utils/config.py gate).
    """

    arch: Architecture
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 y: jnp.ndarray | None = None) -> jnp.ndarray:
        h = x[..., None].astype(self.dtype)
        h = ConvStack(self.arch.discriminator, self.arch.lrelu_slope,
                      self.dtype, self.arch.conv_impl)(h)
        h = h.reshape(h.shape[0], -1)
        score = nn.Dense(1, dtype=self.dtype)(h)[..., 0]
        if self.arch.d_conditional and y is not None:
            feat = nn.Dense(self.arch.y_emb_dim, dtype=self.dtype)(h)
            emb = nn.Embed(self.arch.y_dim, self.arch.y_emb_dim,
                           dtype=self.dtype)(y)
            score = score + jnp.sum(feat * emb, axis=-1)
        return score.astype(jnp.float32)


class CVAE(nn.Module):
    """The plain speaker-conditioned VAE (reference model 'VAE')."""

    arch: Architecture
    dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.arch, self.dtype)
        self.decoder = Decoder(self.arch, self.dtype)

    def encode(self, x):
        return self.encoder(x)

    def decode(self, z, y):
        return self.decoder(z, y)

    def __call__(self, x, y, rng):
        mu, lv = self.encoder(x)
        z = losses.reparameterize(rng, mu, lv)
        xh = self.decoder(z, y)
        return {"z_mu": mu, "z_lv": lv, "z": z, "xh": xh}

    def loss(self, x, y, rng):
        """Reference model.loss(): {D_KL, logP} plus the total objective."""
        out = self(x, y, rng)
        kld = losses.gaussian_kld(out["z_mu"], out["z_lv"])
        logp = losses.gaussian_log_density(x, out["xh"])
        return {"D_KL": kld, "logP": logp, "loss": kld - logp}, out


class VAWGAN(nn.Module):
    """VAE + Wasserstein critic (reference model 'VAWGAN').

    Exposes encode/decode/critic as submodule methods so the trainer can
    take gradients of different objectives w.r.t. disjoint parameter sets.
    """

    arch: Architecture
    dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.arch, self.dtype)
        self.decoder = Decoder(self.arch, self.dtype)
        self.critic = Critic(self.arch, self.dtype)

    def encode(self, x):
        return self.encoder(x)

    def decode(self, z, y):
        return self.decoder(z, y)

    def discriminate(self, x, y=None):
        return self.critic(x, y)

    def __call__(self, x, y, rng):
        mu, lv = self.encoder(x)
        z = losses.reparameterize(rng, mu, lv)
        xh = self.decoder(z, y)
        return {"z_mu": mu, "z_lv": lv, "z": z, "xh": xh,
                "d_real": self.critic(x, y), "d_fake": self.critic(xh, y)}


def check_d2s_impl(arch: Architecture, platform: str) -> None:
    """Fail fast on TPU-incompatible kernel opt-ins (before any compile).

    d2s_impl="pallas" compiles only off-TPU: Mosaic rejects both store
    formulations of ops/pallas_d2s.py on real hardware (measured negative,
    docs/PERFORMANCE.md item 5) — without this guard the user discovers
    that as a cryptic Mosaic error after a multi-minute remote compile.
    """
    if arch.d2s_impl == "pallas" and platform in ("tpu", "axon"):
        raise ValueError(
            "d2s_impl='pallas' is unsupported on TPU hardware: Mosaic "
            "rejects the kernel's store formulations (measured negative, "
            "docs/PERFORMANCE.md item 5); the kernel is an interpreter-"
            "mode test artifact. Use d2s_impl='xla' on TPU.")


def make_model(arch: Architecture, dtype: Dtype | None = None) -> nn.Module:
    registry = {"VAE": CVAE, "VAWGAN": VAWGAN}
    try:
        cls = registry[arch.model]
    except KeyError as e:
        raise KeyError(f"unknown model {arch.model!r}; "
                       f"known: {sorted(registry)}") from e
    try:
        platform = jax.devices()[0].platform
    except Exception:
        platform = ""
    check_d2s_impl(arch, platform)
    if arch.output_activation not in ("tanh", "linear"):
        raise ValueError(f"unknown output_activation "
                         f"{arch.output_activation!r}; "
                         "expected 'tanh' | 'linear'")
    if dtype is None:
        dtype = {"float32": jnp.float32,
                 "bfloat16": jnp.bfloat16}[arch.compute_dtype]
    return cls(arch=arch, dtype=dtype)


def init_params(model: nn.Module, arch: Architecture,
                rng: jax.Array) -> Any:
    x = jnp.zeros((2, arch.x_dim), jnp.float32)
    y = jnp.zeros((2,), jnp.int32)
    r_init, r_call = jax.random.split(rng)
    return model.init(r_init, x, y, r_call)
