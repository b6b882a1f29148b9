"""Quality metrics: mel-cepstral distortion (MCD).

The project's parity currency (BASELINE.md: 'MCD within 0.1 dB').  MCD is
computed between mel-cepstral coefficient sequences derived from the
spectral envelopes: log-mel filterbank energies -> DCT-II -> coefficients
1..order (c0 excluded), MCD = (10/ln10) * sqrt(2 * sum (dc_k)^2), averaged
over frames.  This is the standard MCD definition used in VC evaluation;
the mel-cepstra here come from a mel filterbank rather than SPTK's
all-pass-warped mel-cepstrum, which is a fixed linear map of the same
envelope — consistent across compared systems.
"""

from __future__ import annotations

import numpy as np

_LN10 = np.log(10.0)


def hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)


def mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)


def mel_filterbank(n_mels: int, n_bins: int, fs: int) -> np.ndarray:
    """Triangular mel filterbank [n_mels, n_bins] over rfft bins."""
    f_bins = np.linspace(0.0, fs / 2.0, n_bins)
    m_pts = np.linspace(hz_to_mel(0.0), hz_to_mel(fs / 2.0), n_mels + 2)
    f_pts = mel_to_hz(m_pts)
    fb = np.zeros((n_mels, n_bins))
    for i in range(n_mels):
        lo, ce, hi = f_pts[i], f_pts[i + 1], f_pts[i + 2]
        up = (f_bins - lo) / max(ce - lo, 1e-6)
        down = (hi - f_bins) / max(hi - ce, 1e-6)
        fb[i] = np.clip(np.minimum(up, down), 0.0, None)
    return fb


def mel_cepstrum(sp: np.ndarray, fs: int, order: int = 24,
                 n_mels: int = 40) -> np.ndarray:
    """[T, n_bins] power envelope -> [T, order] mel-cepstra (c1..c_order).

    Coefficients are from the log-AMPLITUDE spectrum (0.5 ln power), the
    standard MCD convention.
    """
    fb = mel_filterbank(n_mels, sp.shape[-1], fs)
    logmel = 0.5 * np.log(np.maximum(sp @ fb.T, 1e-20))
    # DCT-II, orthogonal
    k = np.arange(n_mels)
    dct = np.cos(np.pi * np.outer(np.arange(1, order + 1), 2 * k + 1)
                 / (2 * n_mels)) * np.sqrt(2.0 / n_mels)
    return logmel @ dct.T


def mcd(sp_a: np.ndarray, sp_b: np.ndarray, fs: int,
        order: int = 24) -> float:
    """Frame-averaged mel-cepstral distortion in dB between two
    [T, n_bins] power-envelope sequences (equal T; no DTW — frames are
    time-aligned in this pipeline)."""
    ca = mel_cepstrum(sp_a, fs, order)
    cb = mel_cepstrum(sp_b, fs, order)
    t = min(len(ca), len(cb))
    d = ca[:t] - cb[:t]
    per_frame = (10.0 / _LN10) * np.sqrt(
        2.0 * np.sum(d * d, axis=-1))
    return float(per_frame.mean())
