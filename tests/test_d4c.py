"""D4C aperiodicity property tests (SURVEY.md SS2.3 N3)."""

import numpy as np
import pytest

from tests.conftest import make_harmonic
from tpuvc.dsp.constants import DEFAULT_WORLD
from tpuvc.dsp.d4c import d4c_config


def _mid_rows(a):
    n = a.shape[0]
    return a[n // 4: 3 * n // 4]


def test_harmonic_signal_is_periodic_in_low_band():
    cfg = DEFAULT_WORLD
    f0 = 180.0
    x = make_harmonic(f0, fs=cfg.fs, dur_s=0.5, n_harm=12, noise=0.0005)
    n = cfg.num_frames(len(x))
    ap = np.asarray(d4c_config(x, np.full(n, f0, np.float32), cfg))
    assert ap.shape == (n, cfg.sp_dim)
    assert np.all((ap >= 0) & (ap <= 1))
    df = cfg.fs / cfg.fft_size
    low = _mid_rows(ap)[:, int(500 / df): int(1500 / df)]
    assert low.mean() < 0.15, f"low band ap {low.mean():.3f} (should be ~0)"


def test_unvoiced_frames_are_fully_aperiodic():
    cfg = DEFAULT_WORLD
    rng = np.random.default_rng(0)
    x = 0.2 * rng.standard_normal(8000)
    n = cfg.num_frames(len(x))
    ap = np.asarray(d4c_config(x, np.zeros(n, np.float32), cfg))
    assert np.all(ap > 0.99)


def test_noisy_voiced_frames_have_higher_aperiodicity():
    """More noise on the same harmonics -> higher band aperiodicity.

    The harmonics must actually reach the measured band (n_harm=25 spans
    to 3.75 kHz) — with harmonics ending below it, the band holds only
    noise in BOTH signals and the statistic correctly reports both as
    aperiodic (verified against the float64 oracle).  The clean level is
    0.03, not lower: below ~-8 dB band aperiodicity in partially-dead
    bands the float32 statistic saturates (documented in dsp/d4c.py) —
    WORLD's float64 statistic keeps discriminating there."""
    cfg = DEFAULT_WORLD
    f0 = 150.0
    clean = make_harmonic(f0, fs=cfg.fs, dur_s=0.5, n_harm=25, noise=0.03)
    noisy = make_harmonic(f0, fs=cfg.fs, dur_s=0.5, n_harm=25, noise=0.12)
    n = cfg.num_frames(len(clean))
    f0t = np.full(n, f0, np.float32)
    ap_clean = _mid_rows(np.asarray(d4c_config(clean, f0t, cfg)))
    ap_noisy = _mid_rows(np.asarray(d4c_config(noisy, f0t, cfg)))
    df = cfg.fs / cfg.fft_size
    band = slice(int(2000 / df), int(4000 / df))
    assert ap_noisy[:, band].mean() > ap_clean[:, band].mean() + 0.05


def test_dc_is_floored_and_nyquist_ceiled():
    """Coarse-band interpolation endpoints: -60 dB at DC, ~0 dB at Nyquist
    (WORLD convention)."""
    cfg = DEFAULT_WORLD
    f0 = 200.0
    x = make_harmonic(f0, fs=cfg.fs, dur_s=0.4, n_harm=8, noise=0.01)
    n = cfg.num_frames(len(x))
    ap = _mid_rows(np.asarray(d4c_config(x, np.full(n, f0, np.float32),
                                         cfg)))
    assert ap[:, 0].max() < 0.01       # 10^(-60/20) = 1e-3 at DC
    assert ap[:, -1].min() > 0.9       # ~0 dB at Nyquist
