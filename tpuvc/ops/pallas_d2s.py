"""Pallas TPU kernel: fused depth-to-space + LayerNorm + LeakyReLU.

The decoder's subpixel upsampling reshapes [B, L, c*s] -> [B, L*s, c]
(models/vae.py Decoder).  Logically that reshape is a free row-major
view, but on TPU the channel axis is the LANE axis: reinterpreting
c*s-lane rows as s rows of c lanes is a physical relayout, measured at
~25 ms/call across the decoder's three subpixel layers at batch 128 x
4 s (round-2 roofline; the late-depth-to-space rewrite that tried to
avoid it was 1.6x slower overall — docs/PERFORMANCE.md).  This kernel
performs the relayout INSIDE one VMEM pass fused with the LayerNorm +
LeakyReLU that always follow it, so the retile costs no extra HBM round
trip: read [TL, c*s], normalize each c-chunk (static lane slices), and
write chunk si to output rows si::s (strided sublane writes).

STATUS (round-3 on-chip result): Mosaic CANNOT lower this kernel on
real TPU hardware with the current toolchain — both store formulations
were rejected at compile time: (a) strided sublane stores
(``o_ref[si::s, :] = h`` -> "tpu.store with strides [3, 1]"), and
(b) the in-register interleave below (``jnp.stack(outs, axis=1)`` ->
unsupported vector<8x1x64> -> vector<8x3x64> shuffle).  Combined with
round 2's algebraic attempt (late depth-to-space: 1.6x slower), the
decoder's ~25 ms/call retile stands as a compiler-level limitation, not
a missed optimization on our side.  The kernel is kept as the
documented attempt and runs correctly in interpreter mode
(tests/test_ops.py); Architecture.d2s_impl="pallas" remains usable only
off-TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuvc.ops.pallas_window import use_pallas  # noqa: F401  (re-export)

_TILE_L = 8   # input rows per program; output rows = _TILE_L * s


def _kernel(x_ref, g_ref, b_ref, o_ref, *, s: int, c: int, slope: float,
            eps: float):
    x = x_ref[...].astype(jnp.float32)              # [TL, c*s]
    g = g_ref[0:1, :].astype(jnp.float32)            # [1, c]
    b = b_ref[0:1, :].astype(jnp.float32)
    tl = x.shape[0]
    outs = []
    for si in range(s):
        chunk = x[:, si * c:(si + 1) * c]            # [TL, c]
        mu = jnp.mean(chunk, axis=-1, keepdims=True)
        d = chunk - mu
        var = jnp.mean(d * d, axis=-1, keepdims=True)
        h = d * jax.lax.rsqrt(var + eps) * g + b
        outs.append(jnp.where(h >= 0, h, slope * h))
    # interleave phases in-registers and store ONE contiguous tile
    # (Mosaic rejects strided sublane stores like o_ref[si::s, :] = h)
    tile = jnp.stack(outs, axis=1).reshape(tl * s, c)
    o_ref[...] = tile.astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("s", "slope", "eps", "interpret"))
def d2s_ln_lrelu(x: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray,
                 s: int, slope: float, eps: float = 1e-6,
                 interpret: bool = False) -> jnp.ndarray:
    """[B, L, c*s] -> LayerNorm+LeakyReLU([B, L*s, c]) in one VMEM pass.

    Matches  h = x.reshape(B, L*s, c); LayerNorm(gamma, beta)(h);
    leaky_relu(h, slope)  exactly (float32 accumulation).
    """
    bsz, l, cs = x.shape
    c = cs // s
    assert c * s == cs
    xf = x.reshape(bsz * l, cs)
    pad = (-(bsz * l)) % _TILE_L
    xf = jnp.pad(xf, ((0, pad), (0, 0)))
    rows = xf.shape[0]
    grid = (rows // _TILE_L,)
    out = pl.pallas_call(
        functools.partial(_kernel, s=s, c=c, slope=slope, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TILE_L, cs), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TILE_L * s, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows * s, c), x.dtype),
        interpret=interpret,
    )(xf, gamma.reshape(1, c).astype(x.dtype),
      beta.reshape(1, c).astype(x.dtype))
    return out[: bsz * l * s].reshape(bsz, l * s, c)
