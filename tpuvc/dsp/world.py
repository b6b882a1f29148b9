"""Top-level WORLD-equivalent analysis / synthesis entry points.

``analyze`` mirrors the reference's ``wav2pw`` (analyzer.py:~L30
[reconstructed], itself pyworld dio -> stonemask -> cheaptrick -> d4c) as one
jit-compiled device program per utterance; ``synthesize`` mirrors ``pw2wav``.
Batched variants vmap over utterances of equal padded length — the
data-parallel unit for corpus analysis (SURVEY.md SS2.4).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpuvc.dsp.cheaptrick import cheaptrick
from tpuvc.dsp.constants import DEFAULT_WORLD, WorldConfig
from tpuvc.dsp.d4c import d4c
from tpuvc.dsp.dio import dio
from tpuvc.dsp.harvest import harvest
from tpuvc.dsp.stonemask import stonemask
from tpuvc.dsp.synthesis import synthesize


class WorldFeatures(NamedTuple):
    f0: jnp.ndarray   # [N] Hz, 0 = unvoiced
    sp: jnp.ndarray   # [N, half] power spectral envelope
    ap: jnp.ndarray   # [N, half] aperiodicity amplitude ratio


@functools.partial(jax.jit,
                   static_argnames=("fs", "hop", "fft_size", "f0_floor",
                                    "f0_ceil", "f0_method", "ap_method",
                                    "harvest_decim"))
def _analyze(x, fs, hop, fft_size, f0_floor, f0_ceil, f0_method="dio",
             ap_method="group_delay", harvest_decim=1):
    if f0_method == "harvest":
        # Harvest refines by instantaneous frequency internally — WORLD's
        # harvest path does not run StoneMask after it
        f0 = harvest(x, fs=fs, hop=hop, f0_floor=f0_floor, f0_ceil=f0_ceil,
                     channel_decim=harvest_decim)
    elif f0_method == "dio":
        f0_coarse = dio(x, fs=fs, hop=hop, f0_floor=f0_floor,
                        f0_ceil=f0_ceil)
        f0 = stonemask(x, f0_coarse, hop=hop, fs=fs)
    else:
        raise ValueError(f"unknown f0 method {f0_method!r}")
    sp = cheaptrick(x, f0, hop=hop, fs=fs, fft_size=fft_size)
    ap = d4c(x, f0, hop=hop, fs=fs, fft_size=fft_size, method=ap_method)
    return WorldFeatures(f0=f0, sp=sp, ap=ap)


def analyze(x: jnp.ndarray,
            cfg: WorldConfig = DEFAULT_WORLD) -> WorldFeatures:
    """Full analysis of one utterance: f0 + envelope + aperiodicity."""
    return _analyze(jnp.asarray(x, jnp.float32), cfg.fs, cfg.hop,
                    cfg.fft_size, cfg.f0_floor, cfg.f0_ceil,
                    cfg.f0_method, cfg.ap_method, cfg.harvest_channel_decim)


def analyze_batch(xs: jnp.ndarray,
                  cfg: WorldConfig = DEFAULT_WORLD) -> WorldFeatures:
    """vmapped analysis over [B, T] equal-length (padded) utterances."""
    fn = functools.partial(_analyze, fs=cfg.fs, hop=cfg.hop,
                           fft_size=cfg.fft_size, f0_floor=cfg.f0_floor,
                           f0_ceil=cfg.f0_ceil, f0_method=cfg.f0_method,
                           ap_method=cfg.ap_method,
                           harvest_decim=cfg.harvest_channel_decim)
    return jax.vmap(fn)(jnp.asarray(xs, jnp.float32))


def resynthesize(feats: WorldFeatures, cfg: WorldConfig = DEFAULT_WORLD,
                 seed: int = 0) -> jnp.ndarray:
    return synthesize(feats.f0, feats.sp, feats.ap, fs=cfg.fs, hop=cfg.hop,
                      fft_size=cfg.fft_size, seed=seed)
