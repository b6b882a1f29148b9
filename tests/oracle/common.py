"""Shared float64 primitives for the oracle (windows, smoothing, interp).

These follow the WORLD papers' definitions; LinearSmoothing and DCCorrection
are the exact cumulative-integral / mirrored-replica formulations described
in the CheapTrick paper (Morise 2015, eqs. 1-2 region), implemented
independently of tpuvc's quefrency-domain versions.
"""

from __future__ import annotations

import numpy as np


def matlab_round(x):
    """round-half-away-from-zero (C's round(); numpy rounds half-to-even)."""
    return np.floor(x + 0.5).astype(np.int64) if np.ndim(x) else int(
        np.floor(x + 0.5))


def nuttall(n: int) -> np.ndarray:
    """Nuttall window of length n (the 4-term continuous-first-derivative
    variant WORLD uses for its FIR prototypes and band windows)."""
    t = np.arange(n, dtype=np.float64) * (2.0 * np.pi / (n - 1))
    return (0.355768 - 0.487396 * np.cos(t) + 0.144232 * np.cos(2 * t)
            - 0.012604 * np.cos(3 * t))


def hanning_pitch(base_time: np.ndarray, f0: float,
                  periods: float) -> np.ndarray:
    """Pitch-adaptive Hanning over +-periods/2 periods of f0.

    base_time in seconds, symmetric around 0; support is |t| <= periods/(2 f0).
    w(t) = 0.5 + 0.5 cos(2 pi t f0 / periods) inside the support.
    """
    w = 0.5 + 0.5 * np.cos(2.0 * np.pi * base_time * f0 / periods)
    w[np.abs(base_time) > periods / (2.0 * f0)] = 0.0
    return w


def blackman_pitch(base_time: np.ndarray, f0: float,
                   periods: float) -> np.ndarray:
    """Pitch-adaptive Blackman over +-periods/2 periods of f0."""
    ph = 2.0 * np.pi * base_time * f0 / periods
    w = 0.42 + 0.5 * np.cos(ph) + 0.08 * np.cos(2.0 * ph)
    w[np.abs(base_time) > periods / (2.0 * f0)] = 0.0
    return w


def safe_index(x: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """x[idx] with edge clamping (WORLD clamps window reads at the ends)."""
    return x[np.clip(idx, 0, len(x) - 1)]


def windowed_segment(x: np.ndarray, fs: float, f0: float, position_s: float,
                     window: str, periods: float
                     ) -> tuple[np.ndarray, np.ndarray]:
    """Extract x around position_s windowed by a pitch-adaptive window.

    Returns (waveform, window) with WORLD's weighted-mean removal
    (waveform -= window * sum(waveform)/sum(window)).
    """
    half_len = int(periods / 2.0 * fs / f0 + 0.5)
    base_index = np.arange(-half_len, half_len + 1, dtype=np.int64)
    base_time = base_index / fs
    idx = matlab_round(position_s * fs) + base_index
    seg = safe_index(x, idx).astype(np.float64)
    if window == "hanning":
        w = hanning_pitch(base_time, f0, periods)
    elif window == "blackman":
        w = blackman_pitch(base_time, f0, periods)
    else:
        raise ValueError(window)
    wave = seg * w
    wsum = np.sum(w)
    if wsum > 0:
        wave -= w * (np.sum(wave) / wsum)
    return wave, w


def power_spectrum(waveform: np.ndarray, fft_size: int) -> np.ndarray:
    spec = np.fft.rfft(waveform, n=fft_size)
    return (spec.real ** 2 + spec.imag ** 2).astype(np.float64)


def dc_correction(ps: np.ndarray, f0: float, fs: float,
                  fft_size: int) -> np.ndarray:
    """Mirror the spectrum around f0 and add it to the bins below f0.

    replica(f) = ps(f0 - f) for f < f0 (linear interpolation), added in
    place below f0 (CheapTrick paper sec. 2.2 'adding the mirrored power
    spectrum').
    """
    out = ps.copy()
    half = fft_size // 2 + 1
    freq = np.arange(half) * (fs / fft_size)
    upper_limit = 1 + int(f0 * fft_size / fs)
    lows = freq[:upper_limit + 1]
    replica = np.interp(f0 - lows, freq, ps)
    out[: upper_limit + 1] += replica
    return out


def linear_smoothing(ps: np.ndarray, width_hz: float, fs: float,
                     fft_size: int) -> np.ndarray:
    """Exact rectangular smoothing: (1/w) * integral over [f-w/2, f+w/2].

    Mirrored boundary extension + cumulative integral + two interpolations,
    the float64 rectangle-rule formulation (independent of tpuvc's
    sinc-lifter quefrency version).
    """
    half = fft_size // 2 + 1
    df = fs / fft_size
    boundary = int(width_hz / df) + 1
    # mirror-extend at both ends (even reflection around DC and Nyquist)
    ext = np.concatenate([ps[boundary:0:-1], ps, ps[-2:-2 - boundary:-1]])
    # cumulative integral of the piecewise-constant (rectangle) spectrum
    cum = np.concatenate([[0.0], np.cumsum(ext * df)])
    grid = (np.arange(len(cum)) - boundary) * df - df / 2.0
    f = np.arange(half) * df
    hi = np.interp(f + width_hz / 2.0, grid, cum)
    lo = np.interp(f - width_hz / 2.0, grid, cum)
    return (hi - lo) / width_hz


def interp1_contour(locations: np.ndarray, values: np.ndarray,
                    query: np.ndarray) -> np.ndarray:
    """Linear interpolation with edge-hold extrapolation (matlab interp1
    semantics as WORLD uses them for event-interval tracks)."""
    if len(locations) == 0:
        return np.zeros_like(query)
    if len(locations) == 1:
        return np.full_like(query, values[0])
    return np.interp(query, locations, values)
