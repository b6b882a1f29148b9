"""Pallas TPU kernel: fused pitch-adaptive windowing for CheapTrick.

Fuses the window evaluation (per-frame Hanning over 3/f0 s), support
masking, weighted-mean removal, and window-power reduction into one VMEM-
resident kernel over frame tiles (the XLA path emits several elementwise +
reduction kernels and materializes the [N, 1024] window in HBM; per-kernel
overhead is significant on the target, so fusion depth matters more than
FLOPs here).  Falls back to the XLA formulation off-TPU; tests run the
kernel in interpreter mode and check exact equivalence.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 8  # frames per program; W=1024 lanes -> [8, 1024] f32 = 32 KB VMEM


def use_pallas() -> bool:
    if os.environ.get("TPUVC_NO_PALLAS"):
        return False
    try:
        plat = jax.devices()[0].platform
    except Exception:
        return False
    return plat in ("tpu", "axon")


def _kernel(f0_ref, seg_ref, out_ref, wp_ref, *, fs: float, window: int):
    f0 = f0_ref[:, :1]                                   # [T, 1]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, window), 1)
    base = col.astype(jnp.float32) - window // 2
    half_len = jnp.floor(1.5 * fs / f0 + 0.5)            # matlab-style round
    mask = jnp.abs(base) <= half_len
    t = base / fs
    win = jnp.where(mask,
                    0.5 + 0.5 * jnp.cos(jnp.pi * t * f0 / 1.5), 0.0)
    seg = seg_ref[:] * win
    wsum = jnp.sum(win, axis=-1, keepdims=True)
    seg = seg - win * (jnp.sum(seg, axis=-1, keepdims=True)
                       / jnp.maximum(wsum, 1e-12))
    out_ref[:] = seg
    wp_ref[:] = jnp.maximum(jnp.sum(win * win, axis=-1, keepdims=True),
                            1e-12)


@functools.partial(jax.jit, static_argnames=("fs", "window", "interpret"))
def windowed_frames_pallas(seg_raw: jnp.ndarray, f0: jnp.ndarray,
                           fs: int, window: int,
                           interpret: bool = False):
    """[N, window] raw frames + [N] f0 -> (windowed segments, [N,1] window
    power).  Matches cheaptrick._windowed_frames' math exactly."""
    n = seg_raw.shape[0]
    pad = (-n) % _TILE
    seg_p = jnp.pad(seg_raw.astype(jnp.float32), ((0, pad), (0, 0)))
    f0_p = jnp.pad(f0.astype(jnp.float32), (0, pad), constant_values=100.0)
    grid = (seg_p.shape[0] // _TILE,)
    out, wp = pl.pallas_call(
        functools.partial(_kernel, fs=float(fs), window=window),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, window), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_TILE, window), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(seg_p.shape, jnp.float32),
            jax.ShapeDtypeStruct((seg_p.shape[0], 1), jnp.float32),
        ],
        interpret=interpret,
    )(f0_p[:, None], seg_p)
    return out[:n], wp[:n]
