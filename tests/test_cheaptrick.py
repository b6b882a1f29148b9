"""CheapTrick correctness tests (reference parity via analytic signals).

The environment has no pyworld, so parity is checked against analytic
properties the WORLD algorithm guarantees (see SURVEY.md SS4 note on golden
fixtures): envelope smoothness, correct level at harmonic peaks, and
invariance of the envelope to f0-aligned window placement.
"""

import numpy as np
import pytest

from tests.conftest import make_harmonic
from tpuvc.dsp.cheaptrick import cheaptrick_config
from tpuvc.dsp.constants import DEFAULT_WORLD


def _db(p):
    return 10.0 * np.log10(np.maximum(p, 1e-30))


@pytest.mark.parametrize("f0", [110.0, 220.0, 330.0])
def test_envelope_tracks_harmonic_amplitudes(f0):
    cfg = DEFAULT_WORLD
    x = make_harmonic(f0, fs=cfg.fs, dur_s=0.6, n_harm=10)
    n_frames = cfg.num_frames(len(x))
    f0_track = np.full(n_frames, f0, dtype=np.float32)
    sp = np.asarray(cheaptrick_config(x, f0_track, cfg))
    assert sp.shape == (n_frames, cfg.sp_dim)
    assert np.all(np.isfinite(sp)) and np.all(sp > 0)

    # mid frames (avoid edges): envelope at harmonic h should fall ~6 dB/oct
    # like the 1/h amplitudes of the test signal
    mid = sp[n_frames // 4: 3 * n_frames // 4]
    env_db = _db(mid).mean(axis=0)
    df = cfg.fs / cfg.fft_size
    h_bins = [int(round(h * f0 / df)) for h in range(1, 6)]
    levels = env_db[h_bins]
    # each octave up (h=1 -> h=2 -> h=4) should drop ~6 dB (+-3.5 dB tol)
    drop12 = levels[0] - levels[1]
    drop24 = levels[1] - levels[3]
    assert 2.0 < drop12 < 10.0, f"h1->h2 drop {drop12}"
    assert 2.0 < drop24 < 10.0, f"h2->h4 drop {drop24}"


def test_envelope_is_smooth_between_harmonics():
    """The whole point of CheapTrick: no deep nulls between harmonics."""
    cfg = DEFAULT_WORLD
    f0 = 200.0
    x = make_harmonic(f0, fs=cfg.fs, dur_s=0.5, n_harm=8)
    n_frames = cfg.num_frames(len(x))
    sp = np.asarray(cheaptrick_config(x, np.full(n_frames, f0, np.float32), cfg))
    mid = _db(sp[n_frames // 4: 3 * n_frames // 4]).mean(axis=0)
    df = cfg.fs / cfg.fft_size
    for h in range(1, 5):
        peak_bin = int(round(h * f0 / df))
        valley_bin = int(round((h + 0.5) * f0 / df))
        dip = mid[peak_bin] - mid[valley_bin]
        # raw |FFT|^2 of a long window would dip 40+ dB between harmonics;
        # a smoothed+liftered envelope must stay within ~10 dB
        assert dip < 10.0, f"harmonic {h}: inter-harmonic dip {dip:.1f} dB"


def test_unvoiced_frames_use_default_f0_and_stay_finite():
    cfg = DEFAULT_WORLD
    rng = np.random.default_rng(0)
    x = 0.1 * rng.standard_normal(8000)
    n_frames = cfg.num_frames(len(x))
    f0 = np.zeros(n_frames, np.float32)
    sp = np.asarray(cheaptrick_config(x, f0, cfg))
    assert np.all(np.isfinite(sp)) and np.all(sp > 0)
    # noise spectrum is flat-ish: envelope dynamic range well under 40 dB
    mid = _db(sp[2:-2]).mean(axis=0)
    assert mid.max() - mid[8:].min() < 40.0


def test_envelope_is_time_shift_consistent():
    """Shifting the signal by whole hops shifts the envelope by whole
    frames (batched framing is position-independent)."""
    cfg = DEFAULT_WORLD
    f0 = 150.0
    x = make_harmonic(f0, fs=cfg.fs, dur_s=0.3, n_harm=6)
    n_frames = cfg.num_frames(len(x))
    f0_track = np.full(n_frames, f0, np.float32)
    sp_all = np.asarray(cheaptrick_config(x, f0_track, cfg))
    shift = 8  # frames
    x2 = x[shift * cfg.hop:]
    n2 = cfg.num_frames(len(x2))
    sp_shift = np.asarray(cheaptrick_config(
        x2, np.full(n2, f0, np.float32), cfg))
    i = n_frames // 2
    # frame i of x == frame i-shift of x2 (same samples, same window)
    np.testing.assert_allclose(_db(sp_all[i]), _db(sp_shift[i - shift]),
                               atol=0.1)
