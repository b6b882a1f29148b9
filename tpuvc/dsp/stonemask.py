"""StoneMask f0 refinement, batched and jit-compiled.

TPU-native rebuild of WORLD's StoneMask (instantaneous-frequency based f0
refinement) that the reference calls through ``pyworld.stonemask``
(reference analyzer.py wav2pw, SURVEY.md SS2.3 N1).  All frames are refined
at once: a fixed-size pitch-adaptive Blackman window gather, one batched FFT
pair, and a harmonic-weighted instantaneous-frequency average.

Per frame (two refinement iterations, as in WORLD):
  1. window +-1.5 periods of signal with a Blackman window and its
     discrete-derivative window
  2. X = FFT(x w), D = FFT(x w'); instantaneous frequency at bin k is
     IF(k) = f_k + (Re X Im D - Im X Re D) / |X|^2 * fs / (2 pi)
  3. refined f0 = sum_h |X(h f0)| IF(h f0) / h  /  sum_h |X(h f0)|
     over the first ~6 harmonics below Nyquist
Refinements deviating more than 20% from the input keep the input value;
unvoiced frames (0) stay 0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tpuvc.dsp.constants import (DEFAULT_WORLD, STONEMASK_FFT_SIZE,
                                 STONEMASK_NUM_HARMONICS,
                                 STONEMASK_RELATIVE_LIMIT, WorldConfig)
from tpuvc.dsp.interp import interp_uniform
from tpuvc.ops.framing import frame_signal

_FFT_SIZE = STONEMASK_FFT_SIZE


def _refine_once(raw_seg: jnp.ndarray, f0: jnp.ndarray,
                 fs: int) -> jnp.ndarray:
    """One IF-refinement pass for all frames. f0 must be > 0 (masked later).

    raw_seg: [N, FFT] frame-centered raw samples, shared across both
    refinement passes (the window depends on f0 and is rebuilt, the
    signal read is not).  The window and derivative-window transforms
    ride ONE batched rfft (kernel count, not FLOPs, is what the target
    hardware charges for).
    """
    n = f0.shape[0]
    f0s = jnp.maximum(f0, 1.0)
    half_len = (1.5 * fs / f0s + 1.0).astype(jnp.int32)        # [N]
    w = _FFT_SIZE // 2
    base = jnp.arange(_FFT_SIZE, dtype=jnp.int32) - w          # [-W/2, W/2)
    mask = jnp.abs(base)[None, :] <= half_len[:, None]
    seg = jnp.where(mask, raw_seg, 0.0)

    t = base.astype(jnp.float32) / fs
    phase = 2.0 * jnp.pi * t[None, :] * f0s[:, None] / 3.0
    win = 0.42 + 0.5 * jnp.cos(phase) + 0.08 * jnp.cos(2.0 * phase)
    win = jnp.where(mask, win, 0.0)
    # discrete derivative window (WORLD GetDiffWindow)
    dwin = jnp.pad(win[:, 2:] - win[:, :-2], ((0, 0), (1, 1))) * (-0.5)

    both = jnp.fft.rfft(jnp.concatenate([seg * win, seg * dwin], axis=0),
                        n=_FFT_SIZE, axis=-1)
    spec, dspec = both[:n], both[n:]
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2 + 1e-12
    df = fs / _FFT_SIZE
    freqs = jnp.arange(power.shape[-1], dtype=jnp.float32) * df
    inst = freqs[None, :] + (jnp.real(spec) * jnp.imag(dspec)
                             - jnp.imag(spec) * jnp.real(dspec)) / power * (
        fs / (2.0 * jnp.pi))

    h = jnp.arange(1, STONEMASK_NUM_HARMONICS + 1, dtype=jnp.float32)
    bins = (h[None, :] * f0s[:, None]) / df                    # [N, H]
    amp = jnp.sqrt(interp_uniform(power, bins))
    if_h = interp_uniform(inst, bins)
    usable = (h[None, :] * f0s[:, None]) < (fs / 2.0)
    amp = jnp.where(usable, amp, 0.0)
    num = jnp.sum(amp * if_h / h[None, :], axis=-1)
    den = jnp.sum(amp, axis=-1)
    return jnp.where(den > 0, num / jnp.maximum(den, 1e-12), f0)


@functools.partial(jax.jit, static_argnames=("hop", "fs"))
def stonemask(x: jnp.ndarray, f0: jnp.ndarray, hop: int = DEFAULT_WORLD.hop,
              fs: int = DEFAULT_WORLD.fs) -> jnp.ndarray:
    """Refine a DIO f0 track. x: [T]; f0: [N]; frame i centered at i*hop."""
    x = x.astype(jnp.float32)
    f0 = f0.astype(jnp.float32)
    raw_seg = frame_signal(x, hop, _FFT_SIZE, f0.shape[0])
    refined = _refine_once(raw_seg, f0, fs)
    refined = _refine_once(raw_seg, refined, fs)
    rel = jnp.abs(refined - f0) / jnp.maximum(f0, 1e-6)
    good = (f0 > 0) & (rel <= STONEMASK_RELATIVE_LIMIT) & (refined > 0)
    return jnp.where(f0 > 0, jnp.where(good, refined, f0), 0.0)


def stonemask_config(x: jnp.ndarray, f0: jnp.ndarray,
                     cfg: WorldConfig = DEFAULT_WORLD) -> jnp.ndarray:
    return stonemask(x, f0, hop=cfg.hop, fs=cfg.fs)
