"""Golden regression tests for the DSP frontend (SURVEY.md SS4 item 1).

Committed fixtures pin the analysis/synthesis behavior so optimization
rounds can't silently change numerics.  Regenerate with
``python tests/make_goldens.py`` ONLY after an intended behavior change.

PARITY AUTHORITY: the float64 oracle suite (tests/test_oracle_parity.py
and tests/test_oracle_parity_speech.py) is the cross-implementation
correctness anchor; these goldens are tighter-tolerance SELF-referential
anchors that catch unintended numeric drift the oracle's tolerances
would absorb.  To keep the two from drifting apart semantically,
make_goldens.py refuses to write goldens from a device state that
disagrees with the oracle (its _gate_on_oracle check).
"""

import os

import numpy as np
import pytest

from tpuvc.dsp.constants import DEFAULT_WORLD
from tpuvc.dsp.world import analyze, resynthesize

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "dsp_golden.npz")


@pytest.fixture(scope="module")
def golden():
    return np.load(FIXTURE)


def test_analysis_matches_golden(golden):
    cfg = DEFAULT_WORLD
    feats = analyze(golden["x"], cfg)
    f0 = np.asarray(feats.f0)
    np.testing.assert_array_equal(f0 > 0, golden["f0"] > 0,
                                  err_msg="voicing decisions changed")
    v = golden["f0"] > 0
    np.testing.assert_allclose(f0[v], golden["f0"][v], rtol=1e-3)
    sp_db = 10 * np.log10(np.asarray(feats.sp) + 1e-20)
    ref_db = 10 * np.log10(golden["sp"] + 1e-20)
    diff = np.abs(sp_db - ref_db)
    # tight where the envelope carries signal; loose at the numerical floor
    # (bins > 60 dB below the frame peak sit on the 1e-9 safeguard and are
    # formulation noise)
    significant = ref_db > (ref_db.max(axis=-1, keepdims=True) - 60.0)
    assert diff[significant].max() < 0.2, (
        f"envelope drifted {diff[significant].max():.2f} dB in-band")
    assert diff.max() < 20.0, "floor bins drifted implausibly"
    # ap tolerance is loose by design: this fixture's spectrum has an
    # -80 dB cliff above its 9 harmonics, and in such dead bands the D4C
    # group-delay statistic is float32-rounding sensitive (documented in
    # dsp/d4c.py) — even XLA fusion-order changes move it by ~1 dB.  Real
    # ap correctness is pinned by tests/test_oracle_parity.py; this check
    # only catches gross regressions.
    np.testing.assert_allclose(np.asarray(feats.ap), golden["ap"], atol=0.1)


def test_synthesis_matches_golden(golden):
    cfg = DEFAULT_WORLD
    from tpuvc.dsp.world import WorldFeatures
    feats = WorldFeatures(f0=golden["f0"], sp=golden["sp"], ap=golden["ap"])
    y = np.asarray(resynthesize(feats, cfg, seed=7))
    ref = golden["y"]
    assert y.shape == ref.shape
    # waveform-level check: same PRNG seed -> near-identical output
    err = np.abs(y - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 1e-3, f"synthesis waveform drifted: rel {err:.2e}"
