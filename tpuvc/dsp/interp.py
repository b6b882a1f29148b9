"""Small vectorized interpolation helpers used across the DSP frontend.

All helpers are shape-static and jit/vmap friendly (no data-dependent shapes),
per the XLA compilation model.
"""

from __future__ import annotations

import jax.numpy as jnp


def interp_uniform(fp: jnp.ndarray, x_over_dx: jnp.ndarray) -> jnp.ndarray:
    """Linear interp of ``fp`` sampled on a uniform grid at positions
    ``x_over_dx`` (query coordinate divided by the grid step).

    Clamps at both ends.  Works on the last axis; broadcasting over leading
    axes of ``fp`` vs ``x_over_dx`` follows jnp.take_along_axis semantics.
    """
    n = fp.shape[-1]
    pos = jnp.clip(x_over_dx, 0.0, n - 1.0)
    i0 = jnp.floor(pos).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, n - 1)
    w = (pos - i0).astype(fp.dtype)
    f0 = jnp.take_along_axis(fp, i0, axis=-1)
    f1 = jnp.take_along_axis(fp, i1, axis=-1)
    return f0 * (1.0 - w) + f1 * w
