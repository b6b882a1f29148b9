"""Shared batched spectral operators for the WORLD-equivalent frontend.

DC correction and rectangular (moving-average) smoothing are used by both
CheapTrick (SURVEY.md SS2.3 N2) and the static-group-delay D4C (N3).  Both
act on EVEN-symmetric half spectra, so the quefrency round trip is two
real [half, half] cosine matmuls (ops/dft.py) instead of padded FFT pairs —
the MXU formulation, ~4x fewer FLOPs and measured faster than XLA's TPU
FFT at these shapes (scripts/bench_stages.py micro).
"""

from __future__ import annotations

import jax.numpy as jnp

from tpuvc.ops.dft import cos_fwd, cos_inv2


def dc_correction(ps: jnp.ndarray, f0: jnp.ndarray, fs: int,
                  fft_size: int) -> jnp.ndarray:
    """Add the spectrum mirrored around f0 to the bins below f0.

    replica(k) = ps(f0/df - k) is a fractional shift of the even periodic
    extension of ps (mirroring around f0 == shifting the reflected even
    spectrum): one forward cosine transform, a per-frame complex phase
    ramp, and one inverse transform — three MXU matmuls.  Gather
    formulations (all bins, or just the <=64 bins below f0_ceil) were both
    measured SLOWER on v5e — per-row gather overhead dominates at any
    width; the band-limited shift differs from WORLD's linear
    interpolation only by slight ringing next to the f0 peak, inside the
    DC-corrected region.

    ``ps`` may be any even-extendable half spectrum (power spectra and the
    D4C centroid both use this); the ringing guard (replica floored at 0)
    only affects non-negative inputs.
    """
    half = fft_size // 2 + 1
    df = fs / fft_size
    freq = jnp.arange(half, dtype=ps.dtype) * df             # [half]
    c = cos_fwd(ps)                                          # [N, half] real
    q = (f0 / df)[:, None]                                   # shift in bins
    m = jnp.arange(half, dtype=ps.dtype)[None, :]
    phi = 2.0 * jnp.pi * (m * q) / fft_size
    replica = cos_inv2(c * jnp.cos(phi), -c * jnp.sin(phi))
    replica = jnp.maximum(replica, 0.0)   # band-limited shift may ring
    below = freq[None, :] < f0[:, None]
    return jnp.where(below, ps + replica, ps)


def linear_smoothing(ps: jnp.ndarray, width: jnp.ndarray, fs: int,
                     fft_size: int, floor_rel: float | None = 1e-9,
                     max_width_hz: float = 810.0) -> jnp.ndarray:
    """Moving-average smoothing of a half spectrum with per-frame width.

    smoothed(f) = (1/w) * integral_{f-w/2}^{f+w/2} ps(l) dl over the
    piecewise-constant (rectangle-rule) spectrum with even reflection at DC
    and Nyquist — EXACTLY WORLD's formulation (and the float64 oracle's,
    tests/oracle/common.py).  Computed as a sliding weighted sum over the
    <= 2K+1 bins any window can touch (K static from ``max_width_hz``, the
    largest width the call site can produce): each term is a static slice
    of the mirror-extended spectrum times a per-frame overlap weight —
    gather-free, FFT-free, and cancellation-free (every term is a local
    nonnegative-weighted read, so float32 matches the float64 oracle to
    ~1e-6 relative even in -120 dB valleys, where both the quefrency-sinc
    round trip and a cumulative-sum difference noise-floor ~60 dB higher).
    Earlier formulations, measured and replaced on v5e: per-frame sinc
    lifter between FFT pairs (accurate to the band-limited box only, and
    the FFTs dominated CheapTrick/D4C runtime), the same as MXU cosine
    matmuls (fast but float32 cancellation in deep valleys), a
    sample-and-average quadrature (~25x slower).

    ``floor_rel`` floors non-negative inputs at that fraction of the frame
    peak; pass ``floor_rel=None`` for signed inputs (D4C's group delay).

    ``max_width_hz`` must be >= the largest width the call site can
    produce (constants.max_refined_f0 bounds every f0-derived width);
    widths are CLAMPED to it so an underestimate degrades to
    slightly-narrower smoothing instead of silently deflating the
    spectrum (truncated weights no longer summing to 1 — the failure
    the clamp guards against; tests/test_ops.py::test_smoothing_width_cap).
    """
    from tpuvc.ops import pallas_smooth
    width = jnp.minimum(width, jnp.asarray(max_width_hz, width.dtype))
    if pallas_smooth.use_pallas():
        # one-pass VMEM kernel: the unrolled XLA sum below is numerically
        # identical but materializes every shifted multiply in HBM
        # (55 x 203 MB live temps -> OOM at batch 128 on v5e)
        sm = pallas_smooth.box_smooth_pallas(ps, width, fs, fft_size,
                                             max_width_hz)
    else:
        df = fs / fft_size
        k = int(max_width_hz / (2.0 * df)) + 2
        w = width[:, None].astype(ps.dtype)
        # mirror-extend around DC and Nyquist (even reflection)
        ext = jnp.concatenate([ps[..., k:0:-1], ps, ps[..., -2:-2 - k:-1]],
                              axis=-1)
        half = fft_size // 2 + 1
        sm = jnp.zeros_like(ps)
        for o in range(-k, k + 1):
            # overlap of [-w/2, w/2] with bin o's cell [(o-.5) df, (o+.5) df]
            lo = jnp.maximum(-0.5 * w, o * df - 0.5 * df)
            hi = jnp.minimum(0.5 * w, o * df + 0.5 * df)
            wgt = jnp.maximum(hi - lo, 0.0) / w
            sm = sm + ext[..., k + o: k + o + half] * wgt
    if floor_rel is None:
        return sm
    floor = jnp.max(sm, axis=-1, keepdims=True) * floor_rel
    return jnp.maximum(sm, floor)
