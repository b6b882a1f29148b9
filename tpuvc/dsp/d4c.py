"""D4C band aperiodicity (static group delay), batched and jit-compiled.

TPU-native rebuild of WORLD's D4C (Morise, Speech Communication 2016) that
the reference calls through ``pyworld.d4c`` (reference analyzer.py wav2pw,
SURVEY.md SS2.3 N3).  The reference's C++ loops per frame; here every stage
is one batched FFT program over all frames:

  1. LoveTrain voicing guard: 3-period Hanning window, power spectrum;
     frames whose [100 Hz, 4 kHz] share of the [100 Hz, 7.9 kHz] power is
     <= threshold (0.85) are fully aperiodic (noise spreads energy high).
  2. static centroid: 4-period Blackman windows at t +- 1/(4 f0), each
     unit-energy normalized; C(k) = Re{X* Y} with Y = FFT(t x_w(t)) — the
     group-delay numerator — summed over the two offsets, DC-corrected.
     The time weight is affine in the frame-centered index, so Y comes from
     one extra FFT per offset: FFT(w x * b) plus a scalar multiple of X.
  3. smoothed power: 4-period Hanning window, power, DC correction,
     rectangular smoothing of width f0.
  4. static group delay tau = centroid / power, minus its own f0/2-width
     smoothing (leaves the fine structure separating periodic from noisy
     bands).
  5. per 3 kHz band: Nuttall-windowed tau segment around the band center,
     FFT, and the fraction of spectral power NOT in the top
     round(fft_size*8/len) coefficients (lax.top_k — a periodic band
     concentrates tau's structure in few coefficients) -> dB, plus the
     (f0-100)/50 dB compensation, clamped to [-60, 0].
  6. coarse values at [0 -> -60 dB, 3k, ..., Nyquist -> ~0 dB] linearly
     interpolated (in dB) over the output bins; ap = 10^(dB/20).

Deviation from WORLD: the D4C FFT size derives from THIS config's f0_floor
(1024 at fs=16k, floor 71 Hz) rather than WORLD's fixed internal 47 Hz
floor (2048) — the windows fit, and the band statistic is a power fraction,
nearly resolution-independent (parity vs the float64 oracle, which uses
the 47 Hz rule, is pinned in tests/test_oracle_parity.py).

The round-1 band-NCCF statistic is kept as ``method='nccf'`` (a cheaper,
format-compatible estimator; measured ~2x fewer FFTs) — the group-delay
method is the parity default.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from tpuvc.dsp.constants import (D4C_CEIL_DB, D4C_FLOOR_DB,
                                 D4C_FREQUENCY_INTERVAL, D4C_THRESHOLD,
                                 D4C_UNVOICED_PLACEHOLDER_F0,
                                 DEFAULT_WORLD, WorldConfig, d4c_fft_size,
                                 d4c_num_bands, max_refined_f0)
from tpuvc.dsp.interp import interp_uniform
from tpuvc.dsp.spectral import dc_correction, linear_smoothing
from tpuvc.ops.dft import rdft_ct, rdft_power
from tpuvc.ops.framing import frame_signal


def _nuttall(n: int) -> jnp.ndarray:
    t = jnp.arange(n, dtype=jnp.float32) * (2.0 * jnp.pi / (n - 1))
    return (0.355768 - 0.487396 * jnp.cos(t) + 0.144232 * jnp.cos(2 * t)
            - 0.012604 * jnp.cos(3 * t))


def _windowed(seg: jnp.ndarray, f0: jnp.ndarray, fs: int, periods: float
              ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pitch-adaptive Hanning window (+ weighted-mean removal), used by
    the nccf variant; the group-delay path builds its four windows from a
    shared cos/sin pair instead (_all_windows).

    seg: [N, D] frame-centered raw samples.  Returns (windowed segment,
    window).
    """
    d = seg.shape[-1]
    b = jnp.arange(d, dtype=jnp.float32)[None, :] - d // 2
    half_len = jnp.rint(periods / 2.0 * fs / f0)[:, None]
    ph = 2.0 * jnp.pi * b * f0[:, None] / (periods * fs)
    w = 0.5 + 0.5 * jnp.cos(ph)
    w = jnp.where(jnp.abs(b) <= half_len, w, 0.0)
    # materialize the window ONCE: without the barrier XLA fuses the cos
    # chain into every consumer fusion (recompute-per-use)
    w = jax.lax.optimization_barrier(w)
    wave = seg * w
    wsum = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-12)
    wave = wave - w * (jnp.sum(wave, axis=-1, keepdims=True) / wsum)
    return wave, w


def _love_ratio(ps: jnp.ndarray, fs: int, fft_size: int) -> jnp.ndarray:
    """[N] low-band power concentration (voiced ~1, noise ~0.5)."""
    df = fs / fft_size
    b0 = math.ceil(100.0 / df)
    b1 = math.ceil(4000.0 / df)
    b2 = math.ceil(min(7900.0, fs / 2.0 - df) / df)
    num = jnp.sum(ps[:, b0: b1 + 1], axis=-1)
    den = num + jnp.sum(ps[:, b1 + 1: b2 + 1], axis=-1)
    return num / jnp.maximum(den, 1e-20)


def _coarse_band_ap(sgd: jnp.ndarray, fs: int, fft_size: int,
                    n_bands: int) -> jnp.ndarray:
    """Sorted-power concentration statistic per 3 kHz band -> [N, n_bands] dB."""
    wl = int(D4C_FREQUENCY_INTERVAL * fft_size / fs) * 2 + 1
    window = _nuttall(wl)
    boundary = round(fft_size * 8.0 / wl)
    half = fft_size // 2
    # all bands' windowed tau segments ride ONE batched matmul DFT
    segs = []
    for b in range(n_bands):
        center = int(D4C_FREQUENCY_INTERVAL * (b + 1) * fft_size / fs)
        lo = center - wl // 2
        segs.append(jax.lax.slice_in_dim(sgd, lo, lo + wl, axis=1)
                    * window[None])
    ps = rdft_power(jnp.concatenate(segs, axis=0), fft_size, half)
    total = jnp.sum(ps, axis=-1)
    from tpuvc.ops.pallas_topk import topk_sum
    top = topk_sum(ps, boundary)
    ratio = jnp.clip(1.0 - top / jnp.maximum(total, 1e-30), 1e-12, 1.0)
    db = 10.0 * jnp.log10(ratio)
    n = sgd.shape[0]
    return jnp.stack([db[b * n:(b + 1) * n] for b in range(n_bands)],
                     axis=-1)


def _all_windows(seg: jnp.ndarray, f0: jnp.ndarray, fs: int
                 ) -> tuple[jnp.ndarray, ...]:
    """The four pitch-adaptive windows of the group-delay path from ONE
    cos/sin pair.

    With theta = 2 pi b f0 / (12 fs), the Hanning-3 window needs
    cos(4 theta), the Hanning-4 cos(3 theta), and the two shifted
    Blackman-4 windows cos(3 theta - delta) / cos(6 theta - 2 delta)
    where delta = 2 pi shift f0 / (4 fs) is a per-frame SCALAR — so all
    window trig is polynomial in one [N, D] cos/sin grid plus [N, 1]
    scalar rotations (the roofline showed per-window transcendentals
    dominating D4C's reduce fusions; 70 -> 66 ms/call at batch 128 x 4 s).
    Returns (w_lt, w_c1, w_c2, w_p, shift1, shift2).
    """
    d = seg.shape[-1]
    b = jnp.arange(d, dtype=jnp.float32)[None, :] - d // 2
    f0c = f0[:, None]
    theta = 2.0 * jnp.pi * b * f0c / (12.0 * fs)
    c = jnp.cos(theta)
    s = jnp.sin(theta)
    c, s = jax.lax.optimization_barrier((c, s))
    cc = c * c
    c2 = 2.0 * cc - 1.0
    c3 = c * (4.0 * cc - 3.0)
    s3 = s * (3.0 - 4.0 * s * s)
    c4 = 2.0 * c2 * c2 - 1.0
    c6 = 2.0 * c3 * c3 - 1.0
    s6 = 2.0 * s3 * c3

    hl3 = jnp.rint(1.5 * fs / f0c)
    hl4 = jnp.rint(2.0 * fs / f0c)
    w_lt = jnp.where(jnp.abs(b) <= hl3, 0.5 + 0.5 * c4, 0.0)
    w_p = jnp.where(jnp.abs(b) <= hl4, 0.5 + 0.5 * c3, 0.0)

    shift1 = jnp.rint(-0.25 * fs / f0)                  # [N]
    delta = 2.0 * jnp.pi * shift1[:, None] * f0c / (4.0 * fs)
    cd, sd = jnp.cos(delta), jnp.sin(delta)             # [N, 1] scalars
    c2d = 2.0 * cd * cd - 1.0
    s2d = 2.0 * sd * cd
    # cos(3t - d) = c3 cd + s3 sd; shift2 = -shift1 -> delta flips sign
    bl = lambda sgn: (0.42 + 0.5 * (c3 * cd + sgn * s3 * sd)  # noqa: E731
                      + 0.08 * (c6 * c2d + sgn * s6 * s2d))
    w_c1 = jnp.where(jnp.abs(b - shift1[:, None]) <= hl4, bl(1.0), 0.0)
    w_c2 = jnp.where(jnp.abs(b + shift1[:, None]) <= hl4, bl(-1.0), 0.0)
    return (*jax.lax.optimization_barrier((w_lt, w_c1, w_c2, w_p)),
            shift1, -shift1)


def _apply_window(seg: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """seg * w with WORLD's weighted-mean removal (see _windowed)."""
    wave = seg * w
    wsum = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-12)
    return wave - w * (jnp.sum(wave, axis=-1, keepdims=True) / wsum)


def _group_delay_coarse(x: jnp.ndarray, f0: jnp.ndarray, hop: int, fs: int,
                        n_bands: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Coarse band aperiodicities [N, n_bands] (dB) + LoveTrain [N].

    Transform layout (ops/dft.py MXU matmuls; XLA's TPU FFT measured
    slower at every shape here — scripts/bench_stages.py): the six forward
    transforms (LoveTrain window, two centroid windows, their two
    time-weighted copies, the power window) ride ONE batched matmul DFT,
    the two DC corrections (power + centroid) share one batched cosine
    round trip, and the band statistics one batched DFT.  97.8 -> 32.4 ms
    per 128 s audio on v5e vs the round-1 FFT formulation.
    """
    d = d4c_fft_size(fs)
    n = f0.shape[0]
    seg = frame_signal(x, hop, d, n)
    b = jnp.arange(d, dtype=jnp.float32)[None, :] - d // 2

    w_lt, w_c1, w_c2, w_p, shift1, shift2 = _all_windows(seg, f0, fs)
    wave_lt = _apply_window(seg, w_lt)
    wave_p = _apply_window(seg, w_p)
    hl4 = jnp.rint(2.0 * fs / f0)[:, None]
    wave_c1 = _apply_window(seg, w_c1)
    wave_c1 = wave_c1 / jnp.sqrt(jnp.maximum(
        jnp.sum(wave_c1 * wave_c1, axis=-1, keepdims=True), 1e-30))
    const1 = (hl4 - shift1[:, None]).astype(jnp.float32)
    wave_c2 = _apply_window(seg, w_c2)
    wave_c2 = wave_c2 / jnp.sqrt(jnp.maximum(
        jnp.sum(wave_c2 * wave_c2, axis=-1, keepdims=True), 1e-30))
    const2 = (hl4 - shift2[:, None]).astype(jnp.float32)
    stacked = jnp.concatenate([wave_lt, wave_c1, wave_c1 * b,
                               wave_c2, wave_c2 * b, wave_p], axis=0)
    # the six forward transforms as ONE batched two-stage Cooley-Tukey
    # matmul DFT (ops/dft.py rdft_ct): FFT-class accumulation accuracy —
    # the direct depth-1024 matmul floored quiet bands ~1-1.6 dB high in
    # the band statistic (the round-2 "float32 saturation") — at ~3.5x
    # fewer FLOPs than the direct matmul
    re, im = rdft_ct(stacked, d)
    (lt_re, x1_re, y1b_re, x2_re, y2b_re, p_re) = (
        re[i * n:(i + 1) * n] for i in range(6))
    (lt_im, x1_im, y1b_im, x2_im, y2b_im, p_im) = (
        im[i * n:(i + 1) * n] for i in range(6))

    love = _love_ratio(lt_re * lt_re + lt_im * lt_im, fs, d)

    # y = FFT(wave * b) + const * X; C = Re{X* Y} summed over both offsets
    cent = (x1_re * (y1b_re + const1 * x1_re)
            + x1_im * (y1b_im + const1 * x1_im)
            + x2_re * (y2b_re + const2 * x2_re)
            + x2_im * (y2b_im + const2 * x2_im))
    ps = p_re * p_re + p_im * p_im

    both = dc_correction(jnp.concatenate([ps, cent], axis=0),
                         jnp.concatenate([f0, f0]), fs, d)
    ps, cent = both[:n], both[n:]
    # width = f0 can reach max_refined_f0() (1056 Hz: StoneMask's +20%
    # over f0_ceil, Harvest's 1.1x ceiling on top) — the default 810 Hz
    # cap would truncate the box and deflate the smoothed power
    ps = linear_smoothing(ps, f0, fs, d, max_width_hz=max_refined_f0())

    # NOTE on float32 (round-3 resolution of the round-2 "saturation"):
    # the discrimination loss in quiet-but-periodic bands was traced to
    # the DIRECT matmul DFT's depth-1024 float32 accumulation alone — a
    # stage-by-stage float64 hybrid showed every other stage (windowing,
    # dc correction, smoothing, this division, the band statistic)
    # precision-neutral, and even a float32 FFT restored full float64
    # agreement.  The two-stage Cooley-Tukey transform above (rdft_ct)
    # gives FFT-class accumulation, so no division floor is needed and
    # WORLD's unfloored statistic is kept (pinned by tests/test_d4c.py::
    # test_partially_dead_band_discrimination: <=0.15 dB vs float64 on
    # steep-rolloff fixtures where the direct matmul was 0.9-1.6 dB off).
    sgd = cent / jnp.maximum(ps, 1e-30)
    sgd = sgd - linear_smoothing(sgd, f0 / 2.0, fs, d, floor_rel=None)

    coarse = _coarse_band_ap(sgd, fs, d, n_bands)
    coarse = jnp.clip(coarse + ((f0 - 100.0) / 50.0)[:, None],
                      D4C_FLOOR_DB, 0.0)
    return coarse, love


# --- round-1 NCCF variant (kept as the cheap option, method="nccf") ---

_NCCF_FFT_SIZE = 2048


def _windowed_power_spectrum(x: jnp.ndarray, f0: jnp.ndarray,
                             hop: int, fs: int) -> jnp.ndarray:
    """Hanning window over +-2 periods, batched -> power spectrum [N, K]."""
    seg = frame_signal(x, hop, _NCCF_FFT_SIZE, f0.shape[0])
    wave, _ = _windowed(seg, f0, fs, 4.0)
    wave = wave - jnp.mean(wave, axis=-1, keepdims=True)
    spec = jnp.fft.rfft(wave, n=_NCCF_FFT_SIZE, axis=-1)
    return jnp.real(spec) ** 2 + jnp.imag(spec) ** 2


def _band_periodicity(ps: jnp.ndarray, f0: jnp.ndarray, fs: int,
                      lo_hz: float, hi_hz: float) -> jnp.ndarray:
    """Normalized band-limited autocorrelation at lag fs/f0 for all frames."""
    k = ps.shape[-1]
    freqs = jnp.arange(k, dtype=jnp.float32) * (fs / _NCCF_FFT_SIZE)
    band = ((freqs >= lo_hz) & (freqs < hi_hz)).astype(ps.dtype)
    ac = jnp.fft.irfft(ps * band[None, :], n=_NCCF_FFT_SIZE, axis=-1)
    lag = fs / jnp.maximum(f0, 1.0)
    r = interp_uniform(ac, lag[:, None])[:, 0] / jnp.maximum(ac[:, 0], 1e-20)
    return jnp.clip(r, 0.0, 1.0)


def _nccf_coarse(x: jnp.ndarray, f0: jnp.ndarray, hop: int, fs: int,
                 n_bands: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Round-1 statistic: 1 - band-limited NCCF at lag fs/f0, in dB."""
    ps = _windowed_power_spectrum(x, f0, hop, fs)
    r_low = _band_periodicity(ps, f0, fs, 60.0, D4C_FREQUENCY_INTERVAL)
    love = jnp.sqrt(jnp.clip(r_low, 0.0, 1.0))
    coarse = []
    for b in range(n_bands):
        lo = D4C_FREQUENCY_INTERVAL * (b + 0.5)
        hi = D4C_FREQUENCY_INTERVAL * (b + 1.5)
        r = _band_periodicity(ps, f0, fs, lo, hi)
        coarse.append(10.0 * jnp.log10(jnp.clip(1.0 - r, 1e-12, 1.0)))
    coarse_db = (jnp.stack(coarse, axis=-1) if coarse
                 else jnp.zeros((f0.shape[0], 0), jnp.float32))
    return coarse_db, love


@functools.partial(jax.jit, static_argnames=("hop", "fs", "fft_size",
                                             "method"))
def d4c(x: jnp.ndarray, f0: jnp.ndarray, hop: int = DEFAULT_WORLD.hop,
        fs: int = DEFAULT_WORLD.fs,
        fft_size: int = DEFAULT_WORLD.fft_size,
        method: str = "group_delay") -> jnp.ndarray:
    """Aperiodicity (amplitude ratio in [0, 1]) per frame and spectral bin.

    Args: x [T]; f0 [N] (0 = unvoiced); frame i is centered at i*hop.
    method: "group_delay" (WORLD's statistic, parity default) or "nccf"
    (round-1 stand-in, ~2x cheaper).
    Returns [N, fft_size//2 + 1], pyworld `ap` convention.
    """
    x = x.astype(jnp.float32)
    f0 = f0.astype(jnp.float32)
    half = fft_size // 2 + 1
    n_bands = d4c_num_bands(fs)
    f0_eff = jnp.where(f0 > 0, f0, D4C_UNVOICED_PLACEHOLDER_F0)

    if method == "group_delay":
        coarse_db, love = _group_delay_coarse(x, f0_eff, hop, fs, n_bands)
    elif method == "nccf":
        coarse_db, love = _nccf_coarse(x, f0_eff, hop, fs, n_bands)
    else:
        raise ValueError(f"unknown d4c method {method!r}")
    fully_ap = (~(f0 > 0)) | (love <= (jnp.float32(D4C_THRESHOLD)
                                       if method == "group_delay"
                                       else 1.0 - D4C_THRESHOLD))

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
    return d4c(x, f0, hop=cfg.hop, fs=cfg.fs, fft_size=cfg.fft_size,
               method=cfg.ap_method)
