"""Oracle CheapTrick: pitch-synchronous spectral envelope (Morise 2015).

Per frame, exactly the paper's pipeline in float64:

  1. pitch-adaptive Hanning window over 3 periods (+-1.5/f0), weighted-mean
     removal
  2. power spectrum |FFT|^2
  3. DC correction: add the spectrum mirrored around f0 to bins below f0
  4. rectangular smoothing with width 2 f0 / 3 (exact cumulative integral)
  5. cepstral liftering of the log spectrum:
       smoothing lifter sin(pi f0 q)/(pi f0 q)
       x compensation lifter (1 - 2 q1) + 2 q1 cos(2 pi f0 q), q1 = -0.15

Unvoiced frames (f0 = 0, or below the FFT's supported floor
3 fs/(fft_size-3)) use the default f0 of 500 Hz, as WORLD does.

Scale convention: this oracle returns the paper's raw envelope (no window
power normalization).  tpuvc's device CheapTrick normalizes by sum(w^2) to
make the envelope a per-sample PSD (see tpuvc/dsp/cheaptrick.py); parity
tests therefore compare per-frame ENERGY-NORMALIZED envelopes — which is
also exactly the feature the models consume (records store sp/en).
"""

from __future__ import annotations

import numpy as np

from tests.oracle.common import (dc_correction, linear_smoothing,
                                 power_spectrum, windowed_segment)

Q1 = -0.15
DEFAULT_F0 = 500.0


def _lifter(log_ps: np.ndarray, f0: float, fs: float,
            fft_size: int) -> np.ndarray:
    """Cepstral smoothing + q1 compensation of a half-spectrum log power."""
    full = np.concatenate([log_ps, log_ps[-2:0:-1]])
    cep = np.fft.ifft(full).real
    q = np.minimum(np.arange(fft_size), fft_size - np.arange(fft_size)) / fs
    arg = np.pi * f0 * q
    smoothing = np.where(arg > 1e-12, np.sin(arg) / np.maximum(arg, 1e-12),
                         1.0)
    compensation = (1.0 - 2.0 * Q1) + 2.0 * Q1 * np.cos(2.0 * arg)
    cep = cep * smoothing * compensation
    return np.fft.fft(cep).real[: fft_size // 2 + 1]


def cheaptrick_frame(x: np.ndarray, fs: int, f0: float, position_s: float,
                     fft_size: int) -> np.ndarray:
    wave, _ = windowed_segment(x, fs, f0, position_s, "hanning", 3.0)
    ps = power_spectrum(wave, fft_size)
    ps = np.maximum(ps, 1e-300)
    ps = dc_correction(ps, f0, fs, fft_size)
    ps = linear_smoothing(ps, 2.0 * f0 / 3.0, fs, fft_size)
    ps = np.maximum(ps, 1e-300)
    env = _lifter(np.log(ps), f0, fs, fft_size)
    return np.exp(env)


def cheaptrick(x: np.ndarray, f0: np.ndarray, fs: int,
               frame_period_ms: float = 5.0,
               fft_size: int = 1024) -> np.ndarray:
    x = np.asarray(x, np.float64)
    f0 = np.asarray(f0, np.float64)
    hop_s = frame_period_ms / 1000.0
    f0_low_limit = 3.0 * fs / (fft_size - 3.0)
    out = np.zeros((len(f0), fft_size // 2 + 1))
    for i, v in enumerate(f0):
        eff = DEFAULT_F0 if v <= f0_low_limit else float(v)
        out[i] = cheaptrick_frame(x, fs, eff, i * hop_s, fft_size)
    return out
