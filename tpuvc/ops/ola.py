"""Overlap-add as dense shifted adds (TPU-friendly scatter-free OLA).

WORLD synthesis overlap-adds per-pulse responses at irregular pitch marks
(SURVEY.md SS2.3 N4 calls this 'the one genuinely irregular kernel').  The
rebuild synthesizes frame-synchronously, so OLA reduces to summing L/hop
diagonally shifted dense blocks — a handful of static-slice adds XLA fuses
well, with no scatter and deterministic accumulation order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("hop",))
def overlap_add(frames: jnp.ndarray, hop: int) -> jnp.ndarray:
    """Overlap-add [N, L] frames at the given hop -> [(N-1)*hop + L].

    Equivalent to sum_i out[i*hop : i*hop+L] += frames[i], computed as
    ceil(L/hop) dense shifted adds.
    """
    n, l = frames.shape
    k = -(-l // hop)                       # chunks per frame
    pad = k * hop - l
    fr = jnp.pad(frames, ((0, 0), (0, pad))).reshape(n, k, hop)
    out = jnp.zeros((n + k - 1, hop), frames.dtype)
    for j in range(k):                     # static, small (e.g. 13)
        out = out.at[j:j + n].add(fr[:, j, :])
    return out.reshape(-1)[: (n - 1) * hop + l]
