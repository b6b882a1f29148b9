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
from tpuvc.ops.framing import frame_signal

_FFT_SIZE = STONEMASK_FFT_SIZE


def _refine_once(raw_seg: jnp.ndarray, f0: jnp.ndarray,
                 fs: int) -> jnp.ndarray:
    """One IF-refinement pass for all frames. f0 must be > 0 (masked later).

    raw_seg: [N, FFT] frame-centered raw samples, shared across both
    refinement passes (the window depends on f0 and is rebuilt, the
    signal read is not).  The spectrum and derivative spectrum are
    evaluated DIRECTLY at the six harmonic frequencies h*f0 of each frame
    — a per-frame 6-point DFT (elementwise trig + multiply-reduce) instead
    of a full grid transform followed by per-frame interpolation reads:
    the grid formulation's 8 frame-indexed gathers cost 64 ms/call at
    batch 128 on v5e (roofline r2), and linear interpolation between grid
    bins was itself an approximation of exactly this evaluation (WORLD
    interpolates because its C++ has the FFT in hand; the parity tests
    bound the difference, which enters BELOW the oracle tolerances).
    The phase origin cancels in both |X| and Im(X* D), so the DFT is
    referenced at the window center.
    """
    # clamp unvoiced placeholders to the FOLD floor (round-5): both this
    # path and the kernel twin window rows at >= fold_floor so the
    # even/odd-folded kernel (half-width lanes) matches exactly.  Real
    # DIO f0 is >= 71 Hz when voiced and the 20% StoneMask gate keeps
    # any kept pass-1 output >= 56.8 Hz — far above the ~47 Hz clamp at
    # _FFT_SIZE=1024 — so only DISCARDED rows changed vs the old
    # max(f0, 1.0) placeholder.
    from tpuvc.ops.pallas_harmonics import fold_floor
    f0s = jnp.maximum(f0, fold_floor(_FFT_SIZE, float(fs)))
    half_len = (1.5 * fs / f0s + 1.0).astype(jnp.int32)        # [N]
    w = _FFT_SIZE // 2
    base = jnp.arange(_FFT_SIZE, dtype=jnp.int32) - w          # [-W/2, W/2)
    mask = jnp.abs(base)[None, :] <= half_len[:, None]
    seg = jnp.where(mask, raw_seg, 0.0)

    # ALL trig in this pass derives from one cos/sin pair of the window
    # phase phi = 2 pi f0 t / 3: the Blackman window needs cos(phi) and
    # cos(2 phi) (double angle), the harmonic bases need cos/sin of
    # h * 3 phi (triple angle + angle-addition recurrence).  Transcendental
    # evaluations per pass drop 14 -> 2 on the [N, W] grid; the roofline
    # showed the original's per-harmonic cos/sin capped the reduce fusions
    # at 12-26 GB/s (transcendental-bound, 75 ms/call at batch 128).
    t = base.astype(jnp.float32) / fs
    phase = 2.0 * jnp.pi * t[None, :] * f0s[:, None] / 3.0
    cp = jnp.cos(phase)
    sp = jnp.sin(phase)
    win = 0.42 + 0.5 * cp + 0.08 * (2.0 * cp * cp - 1.0)
    win = jnp.where(mask, win, 0.0)
    # discrete derivative window (WORLD GetDiffWindow)
    dwin = jnp.pad(win[:, 2:] - win[:, :-2], ((0, 0), (1, 1))) * (-0.5)

    xw = seg * win
    xd = seg * dwin
    # cos/sin(theta1), theta1 = 3 phase, by triple angle
    c1 = cp * (4.0 * cp * cp - 3.0)
    s1 = sp * (3.0 - 4.0 * sp * sp)
    # materialize the shared operands ONCE: without the barrier XLA fuses
    # the whole cos/sin + window chain into EVERY per-harmonic reduce
    # fusion (recompute-per-consumer), pinning them at ~36-120 GB/s; four
    # [N, W] HBM round trips are far cheaper than 12 recomputations
    xw, xd, c1, s1 = jax.lax.optimization_barrier((xw, xd, c1, s1))
    ch, sh = c1, s1
    num = jnp.zeros_like(f0s)
    den = jnp.zeros_like(f0s)
    for h in range(1, STONEMASK_NUM_HARMONICS + 1):
        if h > 1:  # angle addition: (ch, sh) <- (ch, sh) * (c1, s1)
            ch, sh = ch * c1 - sh * s1, sh * c1 + ch * s1
        c = ch
        s = sh
        x_re = jnp.sum(xw * c, axis=-1)
        x_im = -jnp.sum(xw * s, axis=-1)
        d_re = jnp.sum(xd * c, axis=-1)
        d_im = -jnp.sum(xd * s, axis=-1)
        power = x_re * x_re + x_im * x_im + 1e-12
        inst = h * f0s + (x_re * d_im - x_im * d_re) / power * (
            fs / (2.0 * jnp.pi))
        amp = jnp.where(h * f0s < fs / 2.0, jnp.sqrt(power), 0.0)
        num = num + amp * inst / h
        den = den + amp
    return jnp.where(den > 0, num / jnp.maximum(den, 1e-12), f0)


def _refine_once_fused(raw_seg: jnp.ndarray, f0: jnp.ndarray,
                       fs: int) -> jnp.ndarray:
    """Kernel-backed twin of _refine_once: one VMEM pass computes window +
    trig + all 24 harmonic reductions (ops/pallas_harmonics.py), then the
    IF average runs on the tiny [N, H] outputs.  Same formulation — the
    trig recurrence and gating match _refine_once to reduction-order
    rounding (equivalence pinned by tests/test_ops.py)."""
    from tpuvc.ops.pallas_harmonics import (fold_floor,
                                            harmonic_dft_pallas, use_pallas)
    f0s = jnp.maximum(f0, fold_floor(raw_seg.shape[-1], float(fs)))
    xre, xim, dre, dim_, _ = harmonic_dft_pallas(
        raw_seg, f0s[:, None], fs, n_harm=STONEMASK_NUM_HARMONICS,
        with_if=True, interpret=not use_pallas())
    xre, xim, dre, dim_ = (a[:, 0] for a in (xre, xim, dre, dim_))
    hh = jnp.arange(1, STONEMASK_NUM_HARMONICS + 1, dtype=jnp.float32)
    power = xre * xre + xim * xim + 1e-12
    inst = hh * f0s[:, None] + (xre * dim_ - xim * dre) / power * (
        fs / (2.0 * jnp.pi))
    amp = jnp.where(hh * f0s[:, None] < fs / 2.0, jnp.sqrt(power), 0.0)
    num = jnp.sum(amp * inst / hh, axis=-1)
    den = jnp.sum(amp, axis=-1)
    return jnp.where(den > 0, num / jnp.maximum(den, 1e-12), f0)


@functools.partial(jax.jit, static_argnames=("hop", "fs"))
def stonemask(x: jnp.ndarray, f0: jnp.ndarray, hop: int = DEFAULT_WORLD.hop,
              fs: int = DEFAULT_WORLD.fs) -> jnp.ndarray:
    """Refine a DIO f0 track. x: [T]; f0: [N]; frame i centered at i*hop."""
    from tpuvc.ops.pallas_harmonics import harmonics_impl
    x = x.astype(jnp.float32)
    f0 = f0.astype(jnp.float32)
    raw_seg = frame_signal(x, hop, _FFT_SIZE, f0.shape[0])
    refine = (_refine_once_fused if harmonics_impl() == "pallas"
              else _refine_once)
    refined = refine(raw_seg, f0, fs)
    refined = refine(raw_seg, refined, fs)
    rel = jnp.abs(refined - f0) / jnp.maximum(f0, 1e-6)
    good = (f0 > 0) & (rel <= STONEMASK_RELATIVE_LIMIT) & (refined > 0)
    return jnp.where(f0 > 0, jnp.where(good, refined, f0), 0.0)


def stonemask_config(x: jnp.ndarray, f0: jnp.ndarray,
                     cfg: WorldConfig = DEFAULT_WORLD) -> jnp.ndarray:
    return stonemask(x, f0, hop=cfg.hop, fs=cfg.fs)
