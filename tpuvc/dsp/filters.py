"""Shared filtering utilities for the analysis frontend (host+device).

The reference's WORLD C++ dependency does its filtering with
Nuttall-windowed FIRs applied via FFT (DIO GetFilteredSignal) and a fixed
FIR decimator (SURVEY.md SS2.3 N1).  Here both are dense FFT-domain ops,
batched over filter channels, which XLA compiles to a handful of large
(batched) FFTs — the TPU-friendly formulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def nuttall(n: int | jnp.ndarray, length: jnp.ndarray | int) -> jnp.ndarray:
    """Nuttall window evaluated at integer positions 0..n-1 of a window of
    the given ``length`` (may be traced; positions beyond length are ~0).

    Coefficients per Nuttall (1981), as used by WORLD.
    """
    i = jnp.arange(n) if isinstance(n, int) else n
    x = 2.0 * jnp.pi * i / jnp.maximum(length - 1, 1)
    return (0.355768 - 0.487396 * jnp.cos(x) + 0.144232 * jnp.cos(2 * x)
            - 0.012604 * jnp.cos(3 * x))


@functools.partial(jax.jit, static_argnames=("ratio",))
def decimate(x: jnp.ndarray, ratio: int) -> jnp.ndarray:
    """Low-pass + subsample by an integer ratio (zero-phase, FFT domain).

    Equivalent in role to WORLD's FIR decimator: keeps content below
    0.45 * fs / ratio, then takes every ``ratio``-th sample.
    """
    if ratio == 1:
        return x
    n = x.shape[-1]
    spec = jnp.fft.rfft(x, axis=-1)
    freqs = jnp.fft.rfftfreq(n)  # cycles/sample
    cutoff = 0.45 / ratio
    # raised-cosine rolloff from 0.9*cutoff to cutoff for mild transition
    lo, hi = 0.9 * cutoff, cutoff
    gain = jnp.clip((hi - freqs) / (hi - lo), 0.0, 1.0)
    gain = 0.5 - 0.5 * jnp.cos(jnp.pi * gain)
    if n % ratio == 0:
        # Spectral fold: subsampling irfft_n(S)[::r] == irfft_{n/r} of
        # the TRUNCATED spectrum (alias images m=1..r-1 carry only
        # gain-zeroed bins: support ends at 0.45*n/r < (n/r)/2), scaled
        # by the length ratio — so the inverse transform runs at
        # 1/ratio the points and the strided gather disappears.  Exact
        # up to FFT rounding (round-5; pinned against the full-length
        # formulation in tests/test_f0.py::test_decimate_fold_identity).
        t_dec = n // ratio
        s_fold = (spec * gain)[..., : t_dec // 2 + 1]
        return jnp.fft.irfft(s_fold, n=t_dec, axis=-1) / ratio
    # remainder lengths (output len ceil(n/r)): the fold identity needs
    # r | n, keep the direct formulation
    y = jnp.fft.irfft(spec * gain, n=n, axis=-1)
    return y[..., ::ratio]


def _fir_bank_fft(x: jnp.ndarray, fs: float,
                  boundary_f0s: tuple[float, ...], periods_half: float,
                  modulate: bool, normalize_dc: bool) -> jnp.ndarray:
    """Shared FIR-bank machinery for the DIO/Harvest channel filters.

    Each channel's FIR is a Nuttall window spanning ``2 * periods_half``
    periods of its boundary frequency, optionally modulated by
    cos(2 pi bf t) (band-pass) and optionally normalized to unit DC gain
    (low-pass).  All channels are evaluated on a common max-length tap
    grid (masked per channel), FFT'd once, and applied zero-phase (the
    per-channel group delay removed) so event times line up across
    channels.

    Args: x [T]; fs its rate; boundary_f0s STATIC python floats (they
    determine filter lengths, hence shapes).  Returns [C, T].
    """
    t_len = x.shape[-1]
    c = len(boundary_f0s)
    bounds = jnp.asarray(boundary_f0s, jnp.float32)
    half = jnp.rint(periods_half * fs / bounds).astype(jnp.int32)
    fir_len = 2 * half + 1                                  # [C]
    max_len = int(2 * round(periods_half * fs / min(boundary_f0s)) + 1)
    pos = jnp.arange(max_len)[None, :].astype(jnp.float32)  # [1, L]
    taps = nuttall(jnp.broadcast_to(pos, (c, max_len)), fir_len[:, None])
    if modulate:
        centered = pos - half[:, None].astype(jnp.float32)
        taps = taps * jnp.cos(2.0 * jnp.pi * bounds[:, None] * centered
                              / fs)
    taps = jnp.where(pos < fir_len[:, None], taps, 0.0)
    if normalize_dc:
        taps = taps / jnp.sum(taps, axis=-1, keepdims=True)
    nfft = 1
    while nfft < t_len + max_len:
        nfft *= 2
    xs = jnp.fft.rfft(x, n=nfft)
    hs = jnp.fft.rfft(taps, n=nfft, axis=-1)
    # group-delay removal as a frequency-domain phase ramp: y[t + delay_c]
    # == irfft(spec * e^{+2 pi i k delay_c / nfft})[t], exact up to float32
    # phase-ramp rounding (~1e-4 rad at phases up to ~pi*delay; the old
    # per-channel take_along_axis gather was bit-exact and the goldens were
    # regenerated over this drift — tests/make_goldens.py).  The gather it
    # replaces is the kind of indexed read this hardware pathologically
    # dislikes — docs/PERFORMANCE.md "no gathers"; ~13 ms per 100k indices
    delay = ((fir_len - 1) // 2).astype(jnp.float32)
    kk = jnp.arange(nfft // 2 + 1, dtype=jnp.float32)
    ph = (2.0 * jnp.pi / nfft) * kk[None, :] * delay[:, None]
    shift = jax.lax.complex(jnp.cos(ph), jnp.sin(ph))
    y = jnp.fft.irfft(xs[None, :] * hs * shift, n=nfft, axis=-1)
    return y[..., :t_len]


def bandpass_bank_fft(x: jnp.ndarray, fs: float,
                      boundary_f0s: tuple[float, ...]) -> jnp.ndarray:
    """Bank of WORLD-Harvest-style band-pass filters in one batched FFT.

    Harvest's GetFilteredSignal: a Nuttall window spanning 4 periods of
    the boundary frequency modulated by cos(2 pi bf t) — a band-pass
    centered at bf whose output's zero crossings track the fundamental
    when f0 ~ bf.
    """
    return _fir_bank_fft(x, fs, boundary_f0s, periods_half=2.0,
                         modulate=True, normalize_dc=False)


def lowpass_bank_fft(x: jnp.ndarray, fs: float,
                     boundary_f0s: tuple[float, ...]) -> jnp.ndarray:
    """Bank of WORLD-DIO-style low-pass filters applied in one batched FFT.

    WORLD uses a Nuttall window of length ~2 periods of each boundary f0 as
    the FIR taps (GetFilteredSignal's half_average_length = fs/(2 bf), FIR =
    4x that): a deliberately WIDE low-pass whose first null sits near 2 bf,
    so the channel's half-octave band [bf/2, bf] passes with little
    attenuation and the 4-estimator deviation (not the filter skirt) does
    the candidate selection.  Round 1 used 4-period FIRs — the narrower
    mainlobe attenuated fundamentals near the band edge enough to cause
    missed zero crossings on noisy signals (caught by oracle parity).
    We evaluate all channel FIRs on a common max-length grid
    (masked per channel), FFT once, multiply, and IFFT the whole bank.

    Args:
      x: [T] decimated signal.
      fs: its sample rate (static).
      boundary_f0s: tuple of channel cutoff fundamentals (STATIC python
        floats — they determine filter lengths, hence shapes).

    Returns: [C, T] filtered signals, group delay removed (zero-phase
    alignment so event times line up across channels).
    """
    return _fir_bank_fft(x, fs, boundary_f0s, periods_half=1.0,
                         modulate=False, normalize_dc=True)
