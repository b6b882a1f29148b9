"""Oracle WORLD-style synthesis: per-pulse minimum-phase overlap-add.

Follows the WORLD synthesis structure (Morise et al., IEICE 2016 sec. 2.4)
in float64:

  - per-sample f0 contour by linear interpolation between voiced frames;
    pulse times found by integrating the phase exactly (fractional sample
    positions)
  - for EVERY pulse: the spectral envelope and aperiodicity are linearly
    interpolated at the pulse time, the periodic response is the
    minimum-phase reconstruction of sqrt(sp * (1 - ap^2)) with an exact
    fractional-delay phase ramp, scaled by sqrt(fs / f0) (unit average
    power pulse train), and overlap-added at the pulse position
  - the aperiodic branch excites the minimum-phase reconstruction of
    sqrt(sp * ap^2) with unit-power white noise per frame

This is the per-pulse algorithm that tpuvc/dsp/synthesis.py approximates
with per-frame (5 ms) response updates; the round-trip tests use it to
bound that approximation.

Input convention: sp is a per-sample power spectral density (tpuvc's
convention).  Oracle CheapTrick output can be converted with
``cheaptrick_window_power`` below (the paper's envelope carries the
window's power gain; see tests/oracle/cheaptrick.py docstring).
"""

from __future__ import annotations

import numpy as np


def cheaptrick_window_power(f0: float, fs: float) -> float:
    """sum(w^2) of CheapTrick's 3-period Hanning window at this f0 —
    converts the oracle's raw envelope to tpuvc's PSD convention."""
    half_len = int(1.5 * fs / f0 + 0.5)
    t = np.arange(-half_len, half_len + 1) / fs
    w = 0.5 + 0.5 * np.cos(2.0 * np.pi * t * f0 / 3.0)
    w[np.abs(t) > 1.5 / f0] = 0.0
    return float(np.sum(w * w))


def _minimum_phase(amp_half: np.ndarray, fft_size: int) -> np.ndarray:
    """Minimum-phase spectrum from a half-spectrum amplitude (float64)."""
    log_amp = np.log(np.maximum(amp_half, 1e-150))
    full = np.concatenate([log_amp, log_amp[-2:0:-1]])
    cep = np.fft.ifft(full).real
    half = fft_size // 2
    folded = np.zeros(fft_size)
    folded[0] = cep[0]
    folded[1:half] = 2.0 * cep[1:half]
    folded[half] = cep[half]
    return np.exp(np.fft.fft(folded))[: half + 1]


def _sample_f0(f0: np.ndarray, hop: int, n_samples: int) -> np.ndarray:
    """Per-sample f0: linear between voiced frame centers, 0 in unvoiced."""
    n_frames = len(f0)
    pos = np.arange(n_samples) / hop
    i0 = np.clip(pos.astype(np.int64), 0, n_frames - 1)
    i1 = np.clip(i0 + 1, 0, n_frames - 1)
    w = pos - i0
    a, b = f0[i0], f0[i1]
    both = (a > 0) & (b > 0)
    interp = (1.0 - w) * a + w * b
    nearest = np.where(w < 0.5, a, b)
    return np.where(both, interp, np.where(nearest > 0, nearest, 0.0))


def _pulse_times(f0_s: np.ndarray, fs: float) -> np.ndarray:
    """Fractional sample positions where the integrated phase wraps 2 pi."""
    phase = 2.0 * np.pi * np.cumsum(f0_s) / fs
    cyc = np.floor(phase / (2.0 * np.pi))
    wraps = np.where(np.diff(cyc) > 0)[0]  # wrap between n and n+1
    voiced = f0_s[wraps + 1] > 0
    wraps = wraps[voiced]
    targets = 2.0 * np.pi * cyc[wraps + 1]
    frac = (targets - phase[wraps]) / (phase[wraps + 1] - phase[wraps])
    return wraps + frac


def synthesize(f0: np.ndarray, sp: np.ndarray, ap: np.ndarray, fs: int,
               frame_period_ms: float = 5.0, seed: int = 0) -> np.ndarray:
    f0 = np.asarray(f0, np.float64)
    sp = np.asarray(sp, np.float64)
    ap = np.asarray(ap, np.float64)
    n_frames = len(f0)
    hop = int(fs * frame_period_ms / 1000.0)
    fft_size = (sp.shape[1] - 1) * 2
    half = fft_size // 2 + 1
    n_samples = n_frames * hop
    out = np.zeros(n_samples + 2 * fft_size)
    k = np.arange(half)

    # periodic branch: one response per pulse, envelope at the pulse time
    f0_s = _sample_f0(f0, hop, n_samples)
    for t_pulse in _pulse_times(f0_s, fs):
        frame_pos = t_pulse / hop
        i0 = int(min(frame_pos, n_frames - 1))
        i1 = min(i0 + 1, n_frames - 1)
        w = frame_pos - i0
        sp_t = (1.0 - w) * sp[i0] + w * sp[i1]
        ap_t = (1.0 - w) * ap[i0] + w * ap[i1]
        f0_t = f0_s[min(int(t_pulse), n_samples - 1)]
        if f0_t <= 0.0:
            continue
        amp = np.sqrt(np.maximum(sp_t * (1.0 - ap_t ** 2), 0.0))
        h = _minimum_phase(amp, fft_size)
        n0 = int(np.floor(t_pulse))
        delta = t_pulse - n0
        ramp = np.exp(-2j * np.pi * k * delta / fft_size)
        resp = np.fft.irfft(h * ramp, n=fft_size) * np.sqrt(fs / f0_t)
        out[n0: n0 + fft_size] += resp

    # aperiodic branch: white noise per frame through the noise envelope
    rng = np.random.default_rng(seed)
    for i in range(n_frames):
        amp = np.sqrt(np.maximum(sp[i], 0.0)) * ap[i]
        h = _minimum_phase(amp, fft_size)
        noise = rng.standard_normal(hop)
        resp = np.fft.irfft(np.fft.rfft(noise, n=fft_size) * h, n=fft_size)
        out[i * hop: i * hop + fft_size] += resp

    return out[:n_samples]
