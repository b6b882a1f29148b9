"""Shared batched spectral operators for the WORLD-equivalent frontend.

DC correction and rectangular (moving-average) smoothing are used by both
CheapTrick (SURVEY.md SS2.3 N2) and the static-group-delay D4C (N3); both
are formulated as batched FFT programs — the TPU-fast, gather-free form
(measurements in the per-op docstrings).
"""

from __future__ import annotations

import jax.numpy as jnp


def dc_correction(ps: jnp.ndarray, f0: jnp.ndarray, fs: int,
                  fft_size: int) -> jnp.ndarray:
    """Add the spectrum mirrored around f0 to the bins below f0.

    replica(k) = ps(f0/df - k) is a fractional shift of the even periodic
    extension of ps (mirroring around f0 == shifting the reflected even
    spectrum), computed with one rfft/irfft pair and a per-frame phase
    ramp.  Gather formulations (all bins, or just the <=64 bins below
    f0_ceil) were both measured SLOWER than the 2 extra FFTs on v5e —
    per-row gather overhead dominates at any width; the band-limited
    shift differs from WORLD's linear interpolation only by slight
    ringing next to the f0 peak, inside the DC-corrected region.

    ``ps`` may be any even-extendable half spectrum (power spectra and the
    D4C centroid both use this); only non-negative inputs get the ringing
    guard (replica floored at 0).
    """
    half = fft_size // 2 + 1
    df = fs / fft_size
    k = jnp.arange(half, dtype=ps.dtype)
    freq = k * df                                            # [half]
    ext = jnp.concatenate([ps, ps[..., -2:0:-1]], axis=-1)   # even extension
    c = jnp.fft.rfft(ext, axis=-1)                           # [N, half]
    q = (f0 / df)[:, None]                                   # shift in bins
    m = jnp.arange(half, dtype=ps.dtype)[None, :]
    ramp = jnp.exp(-2j * jnp.pi * (m * q) / fft_size)
    replica = jnp.fft.irfft(c * ramp, n=fft_size, axis=-1)[..., :half]
    replica = jnp.maximum(replica, 0.0)   # band-limited shift may ring
    below = freq[None, :] < f0[:, None]
    return jnp.where(below, ps + replica, ps)


def linear_smoothing(ps: jnp.ndarray, width: jnp.ndarray, fs: int,
                     fft_size: int, floor_rel: float | None = 1e-9
                     ) -> jnp.ndarray:
    """Moving-average smoothing of a half spectrum with per-frame width.

    smoothed(f) = (1/w) * integral_{f-w/2}^{f+w/2} ps(l) dl, with even
    reflection at DC and Nyquist.  Computed in the quefrency domain: the
    even periodic extension of ps IS the mirror boundary condition, and
    box convolution becomes a per-frame sinc(pi w tau) multiply between one
    batched rfft/irfft pair — gather-free (the TPU-fast formulation; a
    sample-and-average quadrature was ~25x slower on v5e) and free of the
    float32 cumulative-sum cancellation WORLD's float64 rectangle rule
    would hit here.  The band-limited box can undershoot in deep valleys
    (Gibbs), so non-negative inputs are floored at ``floor_rel`` of the
    frame peak; pass ``floor_rel=None`` for signed inputs (the D4C group
    delay is signed).
    """
    half = fft_size // 2 + 1
    ext = jnp.concatenate([ps, ps[..., -2:0:-1]], axis=-1)   # even extension
    c = jnp.fft.rfft(ext, axis=-1)                           # [N, half]
    tau = jnp.arange(half, dtype=ps.dtype) / fs              # quefrency grid
    arg = jnp.pi * width[:, None] * tau[None, :]
    m = jnp.where(arg > 1e-9, jnp.sin(arg) / jnp.maximum(arg, 1e-9), 1.0)
    sm = jnp.fft.irfft(c * m, n=fft_size, axis=-1)[..., :half]
    if floor_rel is None:
        return sm
    floor = jnp.max(sm, axis=-1, keepdims=True) * floor_rel
    return jnp.maximum(sm, floor)
