"""Cross-implementation parity: tpuvc DSP vs the independent float64 oracle.

The oracle (tests/oracle/) is a slow, loop-based implementation of the
published WORLD algorithms, written independently of the batched device
code — agreement here is genuine cross-implementation evidence (VERDICT.md
round-1 item 2), replacing the earlier self-referential golden anchors.

Measured parity levels these tests pin (with margin; see docs/STATUS.md):
  - DIO: voiced-frame relative error ~0.01-0.09% vs oracle; voicing match
    >= 95% (mismatches are utterance-edge frames)
  - StoneMask: ~0.005-0.02% relative error on frames voiced by both
  - CheapTrick (same f0 input, energy-normalized envelopes): bins within
    -20 dB of the frame peak agree to ~0.02 dB mean; deviations grow only
    in sub- -60 dB valleys where float32 linear-power processing hits its
    noise floor (the device pipeline is float32 by design)
  - full-spectrum cepstral distortion (MCD over all 24 cepstra, valleys
    included) <= 1 dB mean
"""

import numpy as np
import pytest

from tests.conftest import make_harmonic
from tests.oracle import (oracle_cheaptrick, oracle_d4c, oracle_dio,
                          oracle_stonemask, oracle_synthesize)

FS = 16000


def mcd_db(logsp1, logsp2, n_cep=24):
    """Cepstral distortion in dB between two log10-power envelopes."""
    c1 = np.fft.irfft(np.log(10) * logsp1 / 10.0, axis=-1)[:, 1:n_cep + 1]
    c2 = np.fft.irfft(np.log(10) * logsp2 / 10.0, axis=-1)[:, 1:n_cep + 1]
    return (10.0 / np.log(10)) * np.sqrt(2.0 * np.sum((c1 - c2) ** 2, -1))


@pytest.fixture(scope="module", params=[105.0, 171.0, 235.0, 320.0])
def case(request):
    f0 = request.param
    x = make_harmonic(f0, fs=FS, dur_s=0.5, n_harm=9, noise=0.002, seed=3)
    return f0, x


@pytest.fixture(scope="module")
def oracle_f0(case):
    _, x = case
    raw = oracle_dio(x, FS)
    return raw, oracle_stonemask(x, raw, FS)


def test_dio_parity(case, oracle_f0):
    from tpuvc.dsp.dio import dio
    true_f0, x = case
    of0, _ = oracle_f0
    jf0 = np.asarray(dio(x))
    vo, vj = of0 > 0, jf0 > 0
    # measured 100% voicing agreement after the round-2 edge-hold +
    # half-octave channel gate (VERDICT item 5: >= 99%)
    assert (vo == vj).mean() >= 0.99, "voicing decisions diverge"
    both = vo & vj
    assert both.sum() > 50
    rel = np.abs(jf0[both] - of0[both]) / of0[both]
    assert rel.mean() < 0.005
    assert np.median(rel) < 0.002
    interior = both.copy()
    interior[:3] = interior[-3:] = False
    rmse = np.sqrt(np.mean((np.abs(jf0[interior] - of0[interior])
                            / of0[interior]) ** 2))
    assert rmse < 0.01, f"interior f0 RMSE {rmse:.4f}"
    # both implementations near the ground truth on interior frames
    for f0c in (jf0, of0):
        interior = f0c[5:-5][f0c[5:-5] > 0]
        assert np.abs(interior - true_f0).mean() / true_f0 < 0.01


def test_stonemask_parity(case, oracle_f0):
    from tpuvc.dsp.dio import dio
    from tpuvc.dsp.stonemask import stonemask
    _, x = case
    _, osm = oracle_f0
    jf0 = np.asarray(dio(x))
    jsm = np.asarray(stonemask(x, jf0))
    both = (osm > 0) & (jsm > 0)
    both[:5] = both[-5:] = False  # edge frames: window clamping differs
    rel = np.abs(jsm[both] - osm[both]) / osm[both]
    assert rel.mean() < 1e-3
    assert rel.max() < 0.02


def test_cheaptrick_parity(case, oracle_f0):
    """Same f0 input -> energy-normalized envelopes agree.

    Level-resolved: the perceptually-dominant region (>= -20 dB of frame
    peak) must agree tightly; full-spectrum MCD bounds the float32 valley
    floor.
    """
    from tpuvc.dsp.cheaptrick import cheaptrick
    _, x = case
    _, osm = oracle_f0
    sp_o = oracle_cheaptrick(x, osm, FS)
    sp_j = np.asarray(cheaptrick(x, osm.astype(np.float32)), np.float64)
    no = sp_o / sp_o.sum(1, keepdims=True)
    nj = sp_j / sp_j.sum(1, keepdims=True)
    li = 10 * np.log10(no + 1e-30)
    lj = 10 * np.log10(nj + 1e-30)
    li, lj = li[5:-5], lj[5:-5]
    d = np.abs(li - lj)
    rel_level = li - li.max(axis=1, keepdims=True)
    dominant = rel_level > -20.0
    in_band = rel_level > -40.0
    assert d[dominant].mean() < 0.05
    assert d[dominant].max() < 0.8
    assert d[in_band].mean() < 0.15
    assert mcd_db(li, lj).mean() < 1.0


def test_d4c_parity(case, oracle_f0):
    """Device static-group-delay D4C vs the oracle (same f0 input).

    Measured 0.01-0.09 dB mean absolute aperiodicity difference across
    harmonic/noise mixes (the round-1 NCCF stand-in deviated 1-8 dB —
    kept only as the opt-in method='nccf')."""
    from tpuvc.dsp.d4c import d4c
    _, x = case
    _, osm = oracle_f0
    ao = oracle_d4c(x, osm, FS)
    aj = np.asarray(d4c(x, osm.astype(np.float32)), np.float64)
    I = slice(5, -5)

    def db(a):
        return 20 * np.log10(np.maximum(a, 1e-8))

    d = np.abs(db(ao[I]) - db(aj[I]))
    assert d.mean() < 0.5
    assert np.percentile(d, 95) < 2.0


def test_oracle_roundtrip_self_consistency():
    """The oracle's own analyze -> per-pulse synthesize keeps harmonic
    levels within 1 dB (validates the oracle before it is trusted as an
    anchor for the device implementation)."""
    from tests.oracle.synthesis import cheaptrick_window_power
    true_f0 = 171.0
    x = make_harmonic(true_f0, fs=FS, dur_s=0.5, n_harm=9, noise=0.002,
                      seed=3)
    f0 = oracle_stonemask(x, oracle_dio(x, FS), FS)
    sp = oracle_cheaptrick(x, f0, FS)
    ap = oracle_d4c(x, f0, FS)
    wp = np.array([cheaptrick_window_power(v if v > 0 else 500.0, FS)
                   for v in f0])
    y = oracle_synthesize(f0, sp / wp[:, None], ap, FS, seed=7)

    def avg_power(sig):
        n, hop = 1024, 256
        frames = [sig[s:s + n] * np.hanning(n)
                  for s in range(n, len(sig) - 2 * n, hop)]
        return np.mean([np.abs(np.fft.rfft(f)) ** 2 for f in frames], axis=0)

    px, py = avg_power(x), avg_power(y[: len(x)])
    bins = [int(h * true_f0 / (FS / 1024)) for h in range(1, 9)]
    diffs = [10 * np.log10(px[b] / py[b]) for b in bins]
    assert np.max(np.abs(diffs)) < 1.0, diffs


def test_oracle_d4c_discriminates():
    """Richly-harmonic band -> periodic; band beyond the harmonics ->
    aperiodic; pure noise -> fully aperiodic everywhere."""
    x = make_harmonic(171.0, fs=FS, dur_s=0.5, n_harm=40, noise=0.0005,
                      seed=1)
    f0 = oracle_stonemask(x, oracle_dio(x, FS), FS)
    ap = oracle_d4c(x, f0, FS)
    freqs = np.arange(ap.shape[1]) * FS / 1024
    assert np.interp(3000, freqs, ap[50]) < 0.3

    x2 = make_harmonic(171.0, fs=FS, dur_s=0.5, n_harm=9, noise=0.002,
                       seed=3)
    f02 = oracle_stonemask(x2, oracle_dio(x2, FS), FS)
    ap2 = oracle_d4c(x2, f02, FS)
    assert np.interp(3000, freqs, ap2[50]) > 0.5  # band holds only noise

    g = np.random.default_rng(0)
    noise = 0.3 * g.standard_normal(8000)
    apn = oracle_d4c(noise, oracle_dio(noise, FS), FS)
    assert apn.min() > 0.99


def test_harvest_parity(case):
    """Device Harvest vs the float64 oracle twin (SURVEY SS2.3 N1 alt)."""
    from tests.oracle import oracle_harvest
    from tpuvc.dsp.harvest import harvest

    f0_true, x = case
    dev = np.asarray(harvest(np.asarray(x, np.float32), FS))
    orc = oracle_harvest(np.asarray(x, np.float64), FS)
    n = min(len(dev), len(orc))
    dev, orc = dev[:n], orc[:n]
    v_d, v_o = dev > 0, orc > 0
    assert np.mean(v_d == v_o) >= 0.95, "voicing decisions diverge"
    both = v_d & v_o
    assert both.sum() > 0.5 * n
    rel = np.abs(dev[both] - orc[both]) / orc[both]
    assert np.mean(rel) < 0.005, f"mean rel dev {np.mean(rel):.4f}"
    assert np.max(rel) < 0.05, f"max rel dev {np.max(rel):.4f}"
    # and both track the ground truth
    err = np.abs(dev[both] - f0_true) / f0_true
    assert np.median(err) < 0.01
