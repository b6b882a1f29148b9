"""Pallas TPU kernel: fused strided Conv1D + LayerNorm + LeakyReLU.

Runs a whole layer per program: the K-tap strided convolution as K MXU
dots from VMEM-resident inputs, then the channel LayerNorm and LeakyReLU
on the accumulator before it ever leaves VMEM.

Used by models.vae.ConvStack when the architecture sets
``conv_impl = "pallas"`` (parameter layout matches flax's Conv kernel
[K, Cin, Cout]; equivalence vs the XLA path is tested in interpreter mode
and on-device).

Measured on v5e (batch 3208 frames, full encoder): XLA 3.2 ms vs this
kernel 35 ms — XLA's implicit-GEMM conv lowering beats the K-small-dots
formulation at these channel widths (<=256), so the default stays "xla".
Kept as the fused-kernel implementation point for larger architectures,
where K-dot tiles reach MXU-efficient shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, b_ref, g_ref, bt_ref, o_ref, *, k: int,
            stride: int, l_out: int, slope: float, eps: float):
    tb = x_ref.shape[0]
    cin = x_ref.shape[2]
    cout = w_ref.shape[2]
    x = x_ref[...]                                       # [TB, Lp, Cin]
    acc = jnp.zeros((tb * l_out, cout), jnp.float32)
    for j in range(k):
        # strided subsample via contiguous slice + reshape (Mosaic has no
        # strided vector slices): [TB, Lout*stride, Cin] -> [.., Lout, s, C]
        xs = jax.lax.slice(x, (0, j, 0), (tb, j + l_out * stride, cin))
        xs = xs.reshape(tb, l_out, stride, cin)[:, :, 0, :]
        acc += jax.lax.dot_general(
            xs.reshape(tb * l_out, cin), w_ref[j],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    acc += b_ref[0]
    mu = jnp.mean(acc, axis=-1, keepdims=True)
    var = jnp.mean((acc - mu) ** 2, axis=-1, keepdims=True)
    h = (acc - mu) * jax.lax.rsqrt(var + eps) * g_ref[0] + bt_ref[0]
    h = jnp.where(h > 0, h, slope * h)
    o_ref[...] = h.reshape(tb, l_out, cout)


@functools.partial(jax.jit, static_argnames=("stride", "slope", "interpret"))
def conv_ln_lrelu(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                  gamma: jnp.ndarray, beta: jnp.ndarray, stride: int,
                  slope: float, interpret: bool = False) -> jnp.ndarray:
    """Fused SAME-padded strided conv + LayerNorm + LeakyReLU.

    x: [B, L, Cin]; w: [K, Cin, Cout] (flax Conv layout); b/gamma/beta:
    [Cout].  Returns [B, ceil(L/stride), Cout] in float32.
    """
    bsz, l, cin = x.shape
    k, _, cout = w.shape
    l_out = -(-l // stride)
    # flax 'SAME' for strided conv: total pad = max((l_out-1)*s + k - l, 0);
    # the kernel's reshape subsampling needs Lp >= (k-1) + l_out*stride
    pad_total = max((l_out - 1) * stride + k - l, 0)
    pad_lo = pad_total // 2
    pad_hi = (k - 1) + l_out * stride - l - pad_lo
    xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (pad_lo, pad_hi), (0, 0)))

    tile = 8
    bpad = (-bsz) % tile
    xp = jnp.pad(xp, ((0, bpad), (0, 0), (0, 0)))
    lp = xp.shape[1]
    grid = (xp.shape[0] // tile,)
    out = pl.pallas_call(
        functools.partial(_kernel, k=k, stride=stride, l_out=l_out,
                          slope=slope, eps=1e-6),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, lp, cin), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, cin, cout), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, l_out, cout), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((xp.shape[0], l_out, cout),
                                       jnp.float32),
        interpret=interpret,
    )(xp, w.astype(jnp.float32), b.astype(jnp.float32)[None, :],
      gamma.astype(jnp.float32)[None, :], beta.astype(jnp.float32)[None, :])
    return out[:bsz]
