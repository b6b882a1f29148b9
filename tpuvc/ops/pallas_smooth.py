"""Pallas TPU kernel: per-frame rectangular (box) spectral smoothing.

Computes WORLD's LinearSmoothing — (1/w) * integral of the
piecewise-constant spectrum over [f - w/2, f + w/2] with even reflection
at DC and Nyquist — as a VMEM-resident sliding weighted sum over the
<= 2K+1 bins any window can touch (dsp/spectral.py documents the
formulation and its precision rationale).

Why a kernel: the same sum written as an unrolled XLA expression is
numerically ideal but XLA materializes every shifted multiply as a
separate [N, half] HBM temp at large batch (measured: 55 x 203 MB live
buffers -> HBM OOM at batch 128 on v5e), and scheduling them as separate
kernels pays the per-kernel overhead 55 times.

Kernel layout (measured on v5e, batch 128): the spectrum axis lives in
SUBLANES (the tensor is processed transposed) so each of the 55 shifts is
a STATIC sublane slice — plain row addressing, where the row-major layout
made every shift an unaligned LANE slice costing VPU shuffles (13 ms per
call site at any tile size).  The accumulation goes in-place into the
output ref so only one term is live at a time (a pure-value `acc = acc +
term` chain kept all 55 slice temps live and blew the 16 MB scoped-VMEM
stack at useful tile sizes).  Falls back to the XLA formulation off-TPU;
tests run the kernel in interpreter mode and check equivalence.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuvc.ops.pallas_window import use_pallas

_TILE_F = 512  # frames per program (lane axis); VMEM ~2.3 MB per program


def _kernel(w_ref, ext_ref, out_ref, *, df: float, k: int, half: int):
    inv_w = 1.0 / w_ref[0:1, :]                          # [1, TF]
    w_half = 0.5 * w_ref[0:1, :]
    for o in range(-k, k + 1):
        # overlap of [-w/2, w/2] with bin o's cell [(o-.5) df, (o+.5) df]
        lo = jnp.maximum(-w_half, (o - 0.5) * df)
        hi = jnp.minimum(w_half, (o + 0.5) * df)
        wgt = jnp.maximum(hi - lo, 0.0) * inv_w
        term = ext_ref[k + o: k + o + half, :] * wgt
        if o == -k:
            out_ref[:] = term
        else:
            out_ref[:] = out_ref[:] + term


@functools.partial(jax.jit, static_argnames=("fs", "fft_size",
                                             "max_width_hz", "interpret"))
def box_smooth_pallas(ps: jnp.ndarray, width: jnp.ndarray, fs: int,
                      fft_size: int, max_width_hz: float,
                      interpret: bool = False) -> jnp.ndarray:
    """[N, half] spectrum + [N] width (Hz) -> box-smoothed [N, half].

    Matches dsp/spectral.linear_smoothing's XLA fallback exactly (same
    rectangle rule, same mirror extension).
    """
    half = fft_size // 2 + 1
    df = fs / fft_size
    k = int(max_width_hz / (2.0 * df)) + 2
    # K covers widths up to max_width_hz only; clamp so wider widths
    # degrade to max-width smoothing, never a deflated partial sum
    width = jnp.minimum(width, jnp.asarray(max_width_hz, width.dtype))
    ps = ps.astype(jnp.float32)
    ext = jnp.concatenate([ps[..., k:0:-1], ps, ps[..., -2:-2 - k:-1]],
                          axis=-1)
    n = ps.shape[0]
    pad = (-n) % _TILE_F
    # spectrum axis -> sublanes: [half+2k, N_pad]
    ext_t = jnp.pad(ext, ((0, pad), (0, 0))).T
    w_p = jnp.pad(width.astype(jnp.float32), (0, pad),
                  constant_values=100.0)[None, :]
    grid = (ext_t.shape[1] // _TILE_F,)
    out_t = pl.pallas_call(
        functools.partial(_kernel, df=df, k=k, half=half),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, _TILE_F), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((half + 2 * k, _TILE_F), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((half, _TILE_F), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((half, ext_t.shape[1]), jnp.float32),
        interpret=interpret,
    )(w_p, ext_t)
    return out_t.T[:n]
