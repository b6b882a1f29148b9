"""Pallas TPU kernel: exact sum of the top-k values per row.

D4C's band statistic needs only sum(top_k(ps, boundary)) with
boundary ~ 21 of 512 bins (dsp/d4c.py), but jax.lax.top_k lowers to a
full 512-wide stable sort on TPU (~9 ms per batch-128 convert call,
roofline r2).  Extracting 21 maxima by iterated max + mask-one-occurrence
inside VMEM reads each row once from HBM and matches the sort-based sum
EXACTLY (ties: each iteration removes one occurrence, like a sort would).
Falls back to lax.top_k off-TPU; tests run the kernel in interpreter mode
and check exact equality against lax.top_k.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuvc.ops.pallas_window import use_pallas

_TILE = 256  # rows per program; [256, 512] f32 = 512 KB VMEM


def _kernel(ps_ref, out_ref, *, kk: int):
    ps = ps_ref[:]
    rows, cols = ps.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
    acc = jnp.zeros((rows, 1), jnp.float32)
    for _ in range(kk):
        m = jnp.max(ps, axis=-1, keepdims=True)
        acc = acc + m
        # mask out exactly ONE occurrence of the max (the lowest lane)
        hit = ps >= m
        first = jnp.min(jnp.where(hit, lane, cols), axis=-1, keepdims=True)
        ps = jnp.where(lane == first, -jnp.inf, ps)
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("kk", "interpret"))
def topk_sum_pallas(ps: jnp.ndarray, kk: int,
                    interpret: bool = False) -> jnp.ndarray:
    """[N, C] -> [N] exact sum of each row's kk largest values."""
    n, c = ps.shape
    pad = (-n) % _TILE
    ps_p = jnp.pad(ps.astype(jnp.float32), ((0, pad), (0, 0)))
    grid = (ps_p.shape[0] // _TILE,)
    out = pl.pallas_call(
        functools.partial(_kernel, kk=kk),
        grid=grid,
        in_specs=[pl.BlockSpec((_TILE, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((_TILE, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ps_p.shape[0], 1), jnp.float32),
        interpret=interpret,
    )(ps_p)
    return out[:n, 0]


def topk_sum(ps: jnp.ndarray, kk: int) -> jnp.ndarray:
    """Dispatcher: Pallas kernel on TPU, lax.top_k elsewhere."""
    if use_pallas():
        return topk_sum_pallas(ps, kk)
    return jnp.sum(jax.lax.top_k(ps, kk)[0], axis=-1)
