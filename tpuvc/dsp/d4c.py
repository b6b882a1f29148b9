"""Band aperiodicity estimation (D4C-class), batched and jit-compiled.

TPU-native stand-in for WORLD's D4C (Morise, Speech Communication 2016) that
the reference calls through ``pyworld.d4c`` (reference analyzer.py wav2pw,
SURVEY.md SS2.3 N3).  Interface and output format match D4C exactly:
coarse band aperiodicities on a 3 kHz grid (D4C_FREQUENCY_INTERVAL) with
fixed endpoints (-60 dB at DC, ~0 dB at Nyquist), linearly interpolated in
dB to the spectral bins, plus a LoveTrain-style global voicing guard
(threshold 0.85) that marks weakly-periodic frames fully aperiodic.

The per-band statistic differs from D4C's static-group-delay method in this
round: band aperiodicity is measured as the non-periodic power fraction
1 - r, where r is the band-limited normalized autocorrelation at lag
fs / f0 (a windowed 4-period segment, band-masked in the frequency domain).
For additive noise-in-harmonics this estimates the same quantity; the
group-delay formulation is planned as a refinement.  All frames and bands
are computed in one batched FFT program.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tpuvc.dsp.constants import (D4C_CEIL_DB, D4C_FFT_SIZE, D4C_FLOOR_DB,
                                 D4C_FREQUENCY_INTERVAL, D4C_THRESHOLD,
                                 D4C_UNVOICED_PLACEHOLDER_F0,
                                 DEFAULT_WORLD, WorldConfig, d4c_num_bands)
from tpuvc.dsp.interp import interp_uniform
from tpuvc.ops.framing import frame_signal

_FFT_SIZE = D4C_FFT_SIZE


def _windowed_power_spectrum(x: jnp.ndarray, f0: jnp.ndarray,
                             hop: int, fs: int) -> jnp.ndarray:
    """Hanning window over +-2 periods, batched -> power spectrum [N, K]."""
    half_len = jnp.rint(2.0 * fs / f0).astype(jnp.int32)
    w = _FFT_SIZE // 2
    base = jnp.arange(_FFT_SIZE, dtype=jnp.int32) - w
    mask = jnp.abs(base)[None, :] <= half_len[:, None]
    t = base.astype(jnp.float32) / fs
    win = 0.5 + 0.5 * jnp.cos(jnp.pi * t[None, :] * f0[:, None] / 2.0)
    win = jnp.where(mask, win, 0.0)
    seg = frame_signal(x, hop, _FFT_SIZE, f0.shape[0]) * win
    seg = seg - jnp.mean(seg, axis=-1, keepdims=True)
    spec = jnp.fft.rfft(seg, n=_FFT_SIZE, axis=-1)
    return jnp.real(spec) ** 2 + jnp.imag(spec) ** 2


def _band_periodicity(ps: jnp.ndarray, f0: jnp.ndarray, fs: int,
                      lo_hz: float, hi_hz: float) -> jnp.ndarray:
    """Normalized band-limited autocorrelation at lag fs/f0 for all frames."""
    k = ps.shape[-1]
    freqs = jnp.arange(k, dtype=jnp.float32) * (fs / _FFT_SIZE)
    band = ((freqs >= lo_hz) & (freqs < hi_hz)).astype(ps.dtype)
    ac = jnp.fft.irfft(ps * band[None, :], n=_FFT_SIZE, axis=-1)
    lag = fs / jnp.maximum(f0, 1.0)
    r = interp_uniform(ac, lag[:, None])[:, 0] / jnp.maximum(ac[:, 0], 1e-20)
    return jnp.clip(r, 0.0, 1.0)


@functools.partial(jax.jit, static_argnames=("hop", "fs", "fft_size"))
def d4c(x: jnp.ndarray, f0: jnp.ndarray, hop: int = DEFAULT_WORLD.hop,
        fs: int = DEFAULT_WORLD.fs,
        fft_size: int = DEFAULT_WORLD.fft_size) -> jnp.ndarray:
    """Aperiodicity (amplitude ratio in [0, 1]) per frame and spectral bin.

    Args: x [T]; f0 [N] (0 = unvoiced); frame i is centered at i*hop.
    Returns [N, fft_size//2 + 1], pyworld `ap` convention.
    """
    x = x.astype(jnp.float32)
    f0 = f0.astype(jnp.float32)
    half = fft_size // 2 + 1
    n_bands = d4c_num_bands(fs)
    f0_eff = jnp.where(f0 > 0, f0, D4C_UNVOICED_PLACEHOLDER_F0)

    ps = _windowed_power_spectrum(x, f0_eff, hop, fs)

    # LoveTrain-style voicing guard on the low band (up to 3 kHz): frames
    # whose low-band periodic fraction is too small are fully aperiodic
    r_low = _band_periodicity(ps, f0_eff, fs, 60.0, D4C_FREQUENCY_INTERVAL)
    fully_ap = (~(f0 > 0)) | (jnp.sqrt(jnp.clip(r_low, 0.0, 1.0))
                              < (1.0 - D4C_THRESHOLD))

    # coarse band aperiodicities in dB at centers 3k, 6k, ... (n_bands of them)
    coarse = []
    for b in range(n_bands):
        lo = D4C_FREQUENCY_INTERVAL * (b + 0.5)
        hi = D4C_FREQUENCY_INTERVAL * (b + 1.5)
        r = _band_periodicity(ps, f0_eff, fs, lo, hi)
        coarse.append(10.0 * jnp.log10(jnp.clip(1.0 - r, 1e-12, 1.0)))
    coarse_db = jnp.stack(coarse, axis=-1) if coarse else jnp.zeros(
        (f0.shape[0], 0), jnp.float32)

    # nodes: [0 Hz, 3k, ..., n*3k, fs/2] with fixed endpoint values
    node_freqs = jnp.concatenate([
        jnp.array([0.0], jnp.float32),
        (jnp.arange(1, n_bands + 1, dtype=jnp.float32)
         * D4C_FREQUENCY_INTERVAL),
        jnp.array([fs / 2.0], jnp.float32)])
    node_vals = jnp.concatenate([
        jnp.full((f0.shape[0], 1), D4C_FLOOR_DB, jnp.float32),
        coarse_db,
        jnp.full((f0.shape[0], 1), D4C_CEIL_DB, jnp.float32)], axis=-1)

    freqs = jnp.arange(half, dtype=jnp.float32) * (fs / fft_size)
    # piecewise-linear interp over the (sorted, static) node grid
    j = jnp.clip(jnp.searchsorted(node_freqs, freqs, side="right") - 1,
                 0, node_freqs.shape[0] - 2)
    w = ((freqs - node_freqs[j])
         / jnp.maximum(node_freqs[j + 1] - node_freqs[j], 1e-6))
    ap_db = (node_vals[:, j] * (1.0 - w)[None, :]
             + node_vals[:, j + 1] * w[None, :])
    ap = jnp.power(10.0, ap_db / 20.0)
    ap = jnp.where(fully_ap[:, None], 1.0 - 1e-12, ap)
    return jnp.clip(ap, 1e-8, 1.0 - 1e-12)


def d4c_config(x: jnp.ndarray, f0: jnp.ndarray,
               cfg: WorldConfig = DEFAULT_WORLD) -> jnp.ndarray:
    return d4c(x, f0, hop=cfg.hop, fs=cfg.fs, fft_size=cfg.fft_size)
