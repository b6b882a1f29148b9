"""mu-law 8-bit PCM transfer codec (device encode, host decode).

The bench's device->host drain is the end-to-end bottleneck on this
sandbox's TCP relay (~33 MB/s: 16.4 MB of int16 PCM costs ~0.49 s/call
against 0.34 s of compute — docs/PERFORMANCE.md).  G.711-style mu-law
companding halves the payload to 1 byte/sample at ~37 dB SNR on speech
(measured: tests/test_ulaw.py), making the call compute-bound.  int16
remains the PRODUCT default (CLI convert writes 16-bit WAVs); mu-law is
the opt-in transfer encoding for bandwidth-limited attachments
(bench.py; cli/convert.py --transfer-encoding).

Encoding follows G.711's continuous mu-law curve (mu = 255) quantized to
256 levels, biased to the uint8 range: enc = 128 + round(127 * sign(y) *
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
