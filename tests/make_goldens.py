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


def main():
    cfg = DEFAULT_WORLD
    x = make_harmonic(171.0, fs=cfg.fs, dur_s=0.4, n_harm=9, noise=0.002,
                      seed=3)
    feats = analyze(x, cfg)
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
