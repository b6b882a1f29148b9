"""Oracle StoneMask: instantaneous-frequency f0 refinement.

Per frame (f0 > 0), following the IF-refinement method (Morise / Kawahara
line of work; WORLD IEICE 2016 sec. 2):

  1. window +-1.5 periods with a pitch-adaptive Blackman window; also build
     the discrete-derivative window dw[j] = -(w[j+1] - w[j-1]) / 2
  2. X = FFT(x*w), D = FFT(x*dw); instantaneous frequency at bin k:
       IF(k) = f_k + (Re X Im D - Im X Re D) / |X|^2 * fs / (2 pi)
  3. refined f0 = sum_h a_h (IF(h f0)/h) / sum_h a_h over harmonics
     h = 1..min(6, floor((fs/2)/f0)), a_h = |X(h f0)| (linear interpolation
     of IF and |X| at the exact harmonic frequencies)
  4. iterate once more with the refined value

Refinements deviating more than 20% from the input keep the input value.
The per-frame FFT size is 2^(2 + ceil(log2(window length))), float64.
"""

from __future__ import annotations

import numpy as np

from tests.oracle.common import matlab_round, safe_index

RELATIVE_LIMIT = 0.2
NUM_HARMONICS = 6


def _refine_frame(x: np.ndarray, fs: float, f0: float,
                  position_s: float) -> float:
    half_window = int(1.5 * fs / f0 + 1.0)
    base_index = np.arange(-half_window, half_window + 1, dtype=np.int64)
    base_time = base_index / fs
    window_len_t = (2.0 * half_window + 1.0) / fs
    fft_size = 2 ** (2 + int(np.ceil(np.log2(2 * half_window + 1))))

    idx = matlab_round(position_s * fs) + base_index
    seg = safe_index(x, idx)

    ph = 2.0 * np.pi * base_time / window_len_t
    w = 0.42 + 0.5 * np.cos(ph) + 0.08 * np.cos(2.0 * ph)
    dw = np.zeros_like(w)
    dw[1:-1] = -(w[2:] - w[:-2]) / 2.0
    dw[0] = -w[1] / 2.0
    dw[-1] = w[-2] / 2.0

    spec = np.fft.rfft(seg * w, n=fft_size)
    dspec = np.fft.rfft(seg * dw, n=fft_size)
    power = spec.real ** 2 + spec.imag ** 2
    df = fs / fft_size
    freqs = np.arange(len(spec)) * df
    with np.errstate(divide="ignore", invalid="ignore"):
        inst = freqs + np.where(
            power > 0.0,
            (spec.real * dspec.imag - spec.imag * dspec.real) / power
            * fs / (2.0 * np.pi), 0.0)

    n_harm = min(NUM_HARMONICS, int((fs / 2.0) / f0))
    if n_harm < 1:
        return f0
    num = 0.0
    den = 0.0
    for h in range(1, n_harm + 1):
        fh = h * f0
        amp = np.sqrt(np.interp(fh, freqs, power))
        if_h = np.interp(fh, freqs, inst)
        num += amp * if_h / h
        den += amp
    return num / den if den > 0.0 else f0


def stonemask(x: np.ndarray, f0: np.ndarray, fs: int,
              frame_period_ms: float = 5.0) -> np.ndarray:
    x = np.asarray(x, np.float64)
    out = np.zeros_like(np.asarray(f0, np.float64))
    hop_s = frame_period_ms / 1000.0
    for i, v in enumerate(f0):
        if v <= 0.0:
            continue
        pos = i * hop_s
        r = _refine_frame(x, fs, float(v), pos)
        if r > 0.0:
            r2 = _refine_frame(x, fs, r, pos)
            if r2 > 0.0:
                r = r2
        if r <= 0.0 or abs(r - v) / v > RELATIVE_LIMIT:
            out[i] = v
        else:
            out[i] = r
    return out
