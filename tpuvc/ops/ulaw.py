"""Waveform transfer codecs (device encode, host decode).

The bench's device->host drain is the end-to-end bottleneck on this
sandbox's TCP relay (~33 MB/s: 16.4 MB of int16 PCM costs ~0.49 s/call
against 0.34 s of compute — docs/PERFORMANCE.md).  Two smaller-payload
codecs trade quality for relay bandwidth; int16 remains the PRODUCT
default (CLI convert writes 16-bit WAVs):

  - mu-law 8-bit (G.711-style, mu = 255): 1 B/sample, ~37 dB SNR on
    speech (tests/test_ulaw.py) — the compute-bound drain at the relay's
    measured rate.
  - packed 12-bit PCM: two samples in three bytes, 1.5 B/sample at
    ~61 dB SNR — the quality middle ground between the 16-bit relay
    cliff and the 8-bit mu-law cliff (VERDICT r3 item 8b); payload
    12.3 MB/call at batch 128 x 4 s, right at the compute/relay
    crossover.

mu-law encoding follows G.711's continuous curve quantized to 256
levels, biased to the uint8 range: enc = 128 + round(127 * sign(y) *
ln(1 + 255|y|) / ln(256)).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_MU = 255.0
_LOG1P_MU = float(np.log1p(_MU))


def ulaw_encode(y: jnp.ndarray) -> jnp.ndarray:
    """[-1, 1] float audio -> uint8 mu-law code (device-side, 1 B/sample)."""
    y = jnp.clip(y, -1.0, 1.0)
    mag = jnp.log1p(_MU * jnp.abs(y)) * (1.0 / _LOG1P_MU)   # [0, 1]
    q = jnp.round(127.0 * mag)
    return (128.0 + jnp.sign(y) * q).astype(jnp.uint8)


def ulaw_decode(code: np.ndarray) -> np.ndarray:
    """uint8 mu-law code -> float32 audio in [-1, 1] (host-side numpy)."""
    c = np.asarray(code, np.float32) - 128.0
    mag = np.abs(c) / 127.0
    return np.sign(c) * (np.expm1(mag * _LOG1P_MU) / _MU)


def pcm12_encode(y: jnp.ndarray) -> jnp.ndarray:
    """[-1, 1] float audio [..., T] -> packed 12-bit PCM uint8 [..., T*3/2].

    Two samples pack into three bytes: [a11..a4 | a3..a0 b11..b8 | b7..b0].
    Odd T is zero-padded to even (pass the true length to pcm12_decode).
    Bit plumbing is int32 shifts/masks — elementwise VPU work that fuses
    into the producing graph; no gathers.
    """
    t = y.shape[-1]
    if t % 2:
        pad = [(0, 0)] * (y.ndim - 1) + [(0, 1)]
        y = jnp.pad(y, pad)
    q = jnp.round(jnp.clip(y, -1.0, 1.0) * 2047.0).astype(jnp.int32) + 2048
    a = q[..., 0::2]
    b = q[..., 1::2]
    b0 = a >> 4
    b1 = ((a & 0xF) << 4) | (b >> 8)
    b2 = b & 0xFF
    packed = jnp.stack([b0, b1, b2], axis=-1)           # [..., T/2, 3]
    return packed.reshape(*packed.shape[:-2], -1).astype(jnp.uint8)


def pcm12_decode(code: np.ndarray, n_samples: int | None = None
                 ) -> np.ndarray:
    """packed 12-bit PCM uint8 [..., 3k] -> float32 audio [..., 2k]
    (host-side numpy); ``n_samples`` trims the encoder's odd-T pad."""
    c = np.asarray(code, np.int32).reshape(*code.shape[:-1], -1, 3)
    a = (c[..., 0] << 4) | (c[..., 1] >> 4)
    b = ((c[..., 1] & 0xF) << 8) | c[..., 2]
    q = np.stack([a, b], axis=-1).reshape(*c.shape[:-2], -1)
    y = (q.astype(np.float32) - 2048.0) / 2047.0
    return y[..., :n_samples] if n_samples is not None else y
