"""Gather-free overlapping-frame extraction (TPU hot path).

Every analysis stage windows the signal around each frame center.  A naive
x[centers + base] gather of [n_frames, window] elements is the single
slowest op on TPU (no native gather hardware; XLA lowers to serialized
dynamic slices).  Because frame centers are at i*hop, the same frames can
be built from ceil(window/hop)+1 dense shifted slices of the hop-reshaped
signal — pure reshapes/concats that XLA fuses into copies at HBM
bandwidth.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import jax


@functools.partial(jax.jit, static_argnames=("hop", "window", "n_frames"))
def frame_signal(x: jnp.ndarray, hop: int, window: int,
                 n_frames: int) -> jnp.ndarray:
    """Extract centered overlapping windows:
    out[i, j] = x[i*hop - window//2 + j], zero outside the signal.
    x: [T] -> [n_frames, window].
    """
    half = window // 2
    k = -(-window // hop) + 1            # hop-chunks per frame row span
    lpad = -(-half // hop) * hop         # multiple of hop covering half
    off = lpad - half                    # column offset, 0 <= off < hop
    need = (n_frames + k) * hop          # padded samples required
    total = lpad + x.shape[0]
    target = max(need, -(-total // hop) * hop)  # also a hop multiple
    xp = jnp.pad(x, (lpad, target - total))
    rows = xp.reshape(-1, hop)
    cols = [rows[j: j + n_frames] for j in range(k)]
    wide = jnp.concatenate(cols, axis=-1)          # [n_frames, k*hop]
    return jax.lax.slice_in_dim(wide, off, off + window, axis=1)
