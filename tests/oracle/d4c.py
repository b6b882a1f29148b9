"""Oracle D4C: band aperiodicity from static group delay (Morise 2016).

Per frame, the paper's method in float64:

  1. "LoveTrain" voicing guard: window 3 periods (Hanning, f0 floored at
     40 Hz), power spectrum, and measure how concentrated the energy is at
     low frequency: ratio of cumulative power in [100 Hz, 4 kHz] to
     [100 Hz, 7.9 kHz].  Frames whose ratio <= threshold (0.85) — energy
     spread high like noise — are fully aperiodic.
  2. static centroid: windowed 4-period Blackman segments at t +- 1/(4 f0),
     each normalized to unit energy; C(k) = Re X Re Y + Im X Im Y with
     Y = FFT(t * x_w(t)) — the group-delay numerator — summed over the two
     offsets, then DC-corrected below f0.
  3. smoothed power spectrum: 4-period Hanning window, power, DC correction,
     rectangular smoothing of width f0.
  4. static group delay tau(f) = centroid / smoothed power; remove its
     slowly-varying part by subtracting a rectangular smoothing of width
     f0/2 (leaves the fine structure that distinguishes periodic from
     aperiodic bands).
  5. per 3 kHz band centered at 3k, 6k, ...: window tau with a Nuttall
     window spanning +-3 kHz of bins, FFT, sort the power coefficients
     ascending; band aperiodicity = 10 log10 of the fraction of power
     remaining after excluding the top round(fft_size * 8 / window_length)
     coefficients — a periodic band concentrates tau's structure in few
     coefficients, a noisy band spreads it evenly.
  6. f0-dependent compensation +(f0 - 100)/50 dB, clamped to [-60, 0] dB.
  7. coarse values at [0 Hz -> -60 dB, 3k, ..., Nyquist -> ~0 dB] are
     linearly interpolated (in dB) to the output bins; ap = 10^(dB/20).

Reconstruction confidence: steps 1-5's structure and constants (threshold
0.85, 3 kHz interval, the sorted-coefficient statistic) follow the paper
and known structure of the public implementation; the exact guard-band
constants of step 1 (100/4000/7900 Hz) and step 6's compensation are
reconstructed from memory of that implementation and marked for the parity
tests to quantify.
"""

from __future__ import annotations

import numpy as np

from tests.oracle.common import (dc_correction, linear_smoothing, nuttall,
                                 power_spectrum, windowed_segment)

THRESHOLD = 0.85
FREQUENCY_INTERVAL = 3000.0
UPPER_LIMIT = 15000.0
FLOOR_DB = -60.0
LOVETRAIN_FLOOR_F0 = 40.0
D4C_FLOOR_F0 = 47.0   # sets the D4C FFT size: 4 periods at the floor


def _fft_size_for(fs: float, periods: float, floor_f0: float) -> int:
    return 2 ** (1 + int(np.log2(periods * fs / floor_f0 + 1.0)))


def _love_train(x: np.ndarray, fs: int, f0: float,
                position_s: float) -> float:
    eff = max(f0, LOVETRAIN_FLOOR_F0)
    fft_size = _fft_size_for(fs, 3.0, LOVETRAIN_FLOOR_F0)
    wave, _ = windowed_segment(x, fs, eff, position_s, "hanning", 3.0)
    ps = power_spectrum(wave, fft_size)
    df = fs / fft_size
    b0 = int(np.ceil(100.0 / df))
    b1 = int(np.ceil(4000.0 / df))
    b2 = int(np.ceil(min(7900.0, fs / 2.0 - df) / df))
    cum = np.cumsum(ps[b0: b2 + 1])
    if cum[-1] <= 0.0:
        return 0.0
    return float(cum[b1 - b0] / cum[-1])


def _centroid(x: np.ndarray, fs: int, f0: float, position_s: float,
              fft_size: int) -> np.ndarray:
    wave, _ = windowed_segment(x, fs, f0, position_s, "blackman", 4.0)
    power = np.sum(wave ** 2)
    if power <= 0.0:
        return np.zeros(fft_size // 2 + 1)
    wave = wave / np.sqrt(power)
    spec = np.fft.rfft(wave, n=fft_size)
    tspec = np.fft.rfft(wave * np.arange(len(wave)), n=fft_size)
    return spec.real * tspec.real + spec.imag * tspec.imag


def _static_group_delay(x: np.ndarray, fs: int, f0: float, position_s: float,
                        fft_size: int) -> np.ndarray:
    c1 = _centroid(x, fs, f0, position_s - 0.25 / f0, fft_size)
    c2 = _centroid(x, fs, f0, position_s + 0.25 / f0, fft_size)
    centroid = dc_correction(c1 + c2, f0, fs, fft_size)

    wave, _ = windowed_segment(x, fs, f0, position_s, "hanning", 4.0)
    ps = power_spectrum(wave, fft_size)
    ps = dc_correction(ps, f0, fs, fft_size)
    ps = linear_smoothing(ps, f0, fs, fft_size)
    ps = np.maximum(ps, 1e-300)

    sgd = centroid / ps
    sgd = sgd - linear_smoothing(sgd, f0 / 2.0, fs, fft_size)
    return sgd


def _coarse_aperiodicity(sgd: np.ndarray, fs: int, fft_size: int,
                         n_bands: int) -> np.ndarray:
    window_length = int(FREQUENCY_INTERVAL * fft_size / fs) * 2 + 1
    window = nuttall(window_length)
    boundary = int(round(fft_size * 8.0 / window_length))
    half = fft_size // 2
    out = np.zeros(n_bands)
    for b in range(n_bands):
        center = int(FREQUENCY_INTERVAL * (b + 1) * fft_size / fs)
        lo = center - window_length // 2
        seg = sgd[lo: lo + window_length] * window
        ps = np.sort(power_spectrum(seg, fft_size)[:half])
        cum = np.cumsum(ps)
        out[b] = 10.0 * np.log10(
            max(cum[half - boundary - 1], 1e-300) / max(cum[-1], 1e-300))
    return out


def d4c(x: np.ndarray, f0: np.ndarray, fs: int,
        frame_period_ms: float = 5.0, fft_size: int = 1024,
        threshold: float = THRESHOLD) -> np.ndarray:
    x = np.asarray(x, np.float64)
    f0 = np.asarray(f0, np.float64)
    hop_s = frame_period_ms / 1000.0
    half_out = fft_size // 2 + 1
    fft_size_d4c = _fft_size_for(fs, 4.0, D4C_FLOOR_F0)
    n_bands = int(min(UPPER_LIMIT, fs / 2.0 - FREQUENCY_INTERVAL)
                  / FREQUENCY_INTERVAL)

    node_freqs = np.concatenate([[0.0],
                                 FREQUENCY_INTERVAL
                                 * np.arange(1, n_bands + 1), [fs / 2.0]])
    out_freqs = np.arange(half_out) * (fs / fft_size)

    ap = np.ones((len(f0), half_out)) * (1.0 - 1e-12)
    for i, v in enumerate(f0):
        if v <= 0.0:
            continue
        pos = i * hop_s
        if _love_train(x, fs, float(v), pos) <= threshold:
            continue  # fully aperiodic
        sgd = _static_group_delay(x, fs, float(v), pos, fft_size_d4c)
        coarse = _coarse_aperiodicity(sgd, fs, fft_size_d4c, n_bands)
        coarse = np.clip(coarse + (v - 100.0) / 50.0, FLOOR_DB, 0.0)
        nodes = np.concatenate([[FLOOR_DB], coarse, [-1e-12]])
        ap_db = np.interp(out_freqs, node_freqs, nodes)
        ap[i] = np.clip(10.0 ** (ap_db / 20.0), 1e-8, 1.0 - 1e-12)
    return ap
