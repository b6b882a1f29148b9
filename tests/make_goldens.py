"""Regenerate DSP golden fixtures (run manually after INTENDED behavior
changes; the regression test compares against these).

    python tests/make_goldens.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from tests.conftest import make_harmonic
from tpuvc.dsp.constants import DEFAULT_WORLD
from tpuvc.dsp.world import analyze, resynthesize


def _gate_on_oracle(x, feats):
    """Refuse to bake goldens from a device state that disagrees with the
    float64 oracle (the parity AUTHORITY, tests/test_oracle_parity.py) —
    this keeps the self-referential regression anchor and the oracle
    suite from drifting apart semantically (VERDICT r2 item 8)."""
    from tests.oracle import (oracle_cheaptrick, oracle_d4c, oracle_dio,
                              oracle_stonemask)
    cfg = DEFAULT_WORLD
    of0 = oracle_stonemask(x, oracle_dio(x, cfg.fs), cfg.fs)
    f0 = np.asarray(feats.f0, np.float64)
    n = min(len(of0), len(f0))
    vo, vj = of0[:n] > 0, f0[:n] > 0
    assert (vo == vj).mean() >= 0.98, "voicing diverges from oracle"
    both = vo & vj
    rel = np.abs(f0[:n][both] - of0[:n][both]) / of0[:n][both]
    assert rel.mean() < 0.005, f"f0 diverges from oracle: {rel.mean():.4f}"
    sp_o = oracle_cheaptrick(x, of0, cfg.fs)[:n]
    sp_j = np.asarray(feats.sp, np.float64)[:n]
    no = sp_o / sp_o.sum(1, keepdims=True)
    nj = sp_j / sp_j.sum(1, keepdims=True)
    d = np.abs(10 * np.log10(no + 1e-30) - 10 * np.log10(nj + 1e-30))
    dom = (10 * np.log10(no + 1e-30)
           - 10 * np.log10(no + 1e-30).max(1, keepdims=True)) > -20.0
    assert d[dom].mean() < 0.1, f"envelope diverges: {d[dom].mean():.3f} dB"
    ao = oracle_d4c(x, of0, cfg.fs)[:n]
    aj = np.asarray(feats.ap, np.float64)[:n]
    da = np.abs(20 * np.log10(np.maximum(ao, 1e-8))
                - 20 * np.log10(np.maximum(aj, 1e-8)))
    assert da.mean() < 0.5, f"aperiodicity diverges: {da.mean():.3f} dB"
    print("oracle gate passed: device features track the float64 oracle")


def main():
    cfg = DEFAULT_WORLD
    x = make_harmonic(171.0, fs=cfg.fs, dur_s=0.4, n_harm=9, noise=0.002,
                      seed=3)
    feats = analyze(x, cfg)
    _gate_on_oracle(np.asarray(x, np.float64), feats)
    y = np.asarray(resynthesize(feats, cfg, seed=7))
    out = os.path.join(os.path.dirname(__file__), "fixtures",
                       "dsp_golden.npz")
    np.savez_compressed(
        out, x=x.astype(np.float32), f0=np.asarray(feats.f0),
        sp=np.asarray(feats.sp), ap=np.asarray(feats.ap),
        y=y.astype(np.float32))
    print("wrote", out)


if __name__ == "__main__":
    main()
