"""Harvest f0 estimation, batched and jit-compiled.

TPU-native rebuild of WORLD's Harvest (Morise, Interspeech 2017) — the
alternative f0 estimator the reference exposes through ``pyworld.harvest``
(SURVEY.md SS2.3 N1).  The reference's C++ loops per channel, per event and
per candidate; here every stage is fixed-shape array code in one XLA
program, sharing DIO's scatter-free event machinery:

  1. decimate to ~8 kHz; one band-pass channel per 1/40 octave between
     0.9*f0_floor and 1.1*f0_ceil (Nuttall window x cos(2 pi bf t) FIRs,
     all applied in one batched FFT — filters.bandpass_bank_fft)
  2. per channel, the four zero-crossing interval tracks on a 1 ms frame
     grid (dio._channel_tracks: top-2 associative scans + strided slices);
     a channel proposes its track mean where the four estimates agree
  3. adjacent channels proposing the same f0 merge into <=K candidates per
     frame (a lax.scan over the channel axis)
  4. each candidate is refined by the instantaneous-frequency method on
     the original-rate signal (Blackman window, direct DFT at <=6
     harmonics via the cos/sin angle-addition recurrence — the same
     formulation as dsp/stonemask.py) and scored by harmonic-amplitude
     concentration with a fundamental-presence factor
  5. contour: best score per frame, moving-median guided reselection,
     jump removal + short-run removal (scans), candidate extension
     (dio._extend_scan), and WORLD's zero-phase biquad smoothing; the
     1 ms track is then strided down to the output frame grid

The float64 oracle twin is tests/oracle/harvest.py; reconstructed
constants are marked in dsp/constants.py.  Deviation from WORLD: the
smoothing runs as one global forward/backward pass over a gap-filled
contour (WORLD pads each voiced segment separately); the passes enter
each segment settled at that segment's edge value, so interiors match —
bounded in tests/test_f0.py.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from tpuvc.dsp import filters
from tpuvc.dsp.constants import (DEFAULT_WORLD, HARVEST_BAND_GATE_HIGH,
                                 HARVEST_CEIL_ADJUST,
                                 HARVEST_CHANNELS_IN_OCTAVE,
                                 HARVEST_CONSISTENCY,
                                 HARVEST_EXTENSION_ALLOWED,
                                 HARVEST_FLOOR_ADJUST, HARVEST_MAX_CANDIDATES,
                                 HARVEST_MERGE_TOLERANCE,
                                 HARVEST_REFINE_LIMIT,
                                 HARVEST_RESELECT_HALF, HARVEST_RESELECT_REL,
                                 HARVEST_SMOOTH_A1, HARVEST_SMOOTH_A2,
                                 HARVEST_SMOOTH_B, HARVEST_STEP1_ALLOWED,
                                 HARVEST_TARGET_FS, HARVEST_VOICE_RANGE_MIN,
                                 STONEMASK_NUM_HARMONICS, WorldConfig,
                                 harvest_refine_window)
from tpuvc.dsp.dio import (_channel_tracks, _extend_scan,
                           _fix_step_remove_short_runs)

_K = HARVEST_MAX_CANDIDATES


def _boundary_f0s(f0_floor: float, f0_ceil: float) -> tuple[float, ...]:
    lo = f0_floor * HARVEST_FLOOR_ADJUST
    hi = f0_ceil * HARVEST_CEIL_ADJUST
    n = 1 + int(math.log2(hi / lo) * HARVEST_CHANNELS_IN_OCTAVE)
    return tuple(lo * 2.0 ** ((i + 1) / HARVEST_CHANNELS_IN_OCTAVE)
                 for i in range(n))


def _channel_candidates(tracks: jnp.ndarray, bfs: jnp.ndarray,
                        floor: float, ceil: float
                        ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """[C, 4, N] tracks -> per-channel (candidate, deviation) [C, N]."""
    mean = jnp.mean(tracks, axis=1)
    dev = (jnp.max(jnp.abs(tracks - mean[:, None, :]), axis=1)
           / jnp.maximum(mean, 1e-12))
    ok = (jnp.all(tracks > 0.0, axis=1) & (dev <= HARVEST_CONSISTENCY)
          & (mean >= floor) & (mean <= ceil)
          & (mean >= bfs[:, None] / 2.0)
          & (mean <= bfs[:, None] * HARVEST_BAND_GATE_HIGH))
    return jnp.where(ok, mean, 0.0), jnp.where(ok, dev, jnp.inf)


def _merge_channels(cand: jnp.ndarray, dev: jnp.ndarray
                    ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """[C, N] per-channel candidates -> [N, K] merged region candidates.

    Consecutive channels whose candidates agree within MERGE_TOLERANCE
    form one region (the fundamental lights up a run of neighbors); the
    region's candidate is its mean, its quality the best track deviation.
    One lax.scan over the channel axis; regions emit in ascending-
    frequency order, capped at K (matching the oracle).
    """
    n = cand.shape[1]
    slots = jnp.arange(_K)

    def emit(state, value, best, do_emit):
        filled, out_v, out_d = state
        can = do_emit & (filled < _K)
        slot = slots[None, :] == jnp.minimum(filled, _K - 1)[:, None]
        write = slot & can[:, None]
        out_v = jnp.where(write, value[:, None], out_v)
        out_d = jnp.where(write, best[:, None], out_d)
        return filled + can.astype(jnp.int32), out_v, out_d

    def step(state, inp):
        run_sum, run_cnt, run_best, prev, filled, out_v, out_d = state
        c_i, d_i = inp
        valid = c_i > 0.0
        cont = (valid & (prev > 0.0)
                & (jnp.abs(c_i - prev)
                   < HARVEST_MERGE_TOLERANCE * jnp.maximum(prev, 1e-12)))
        close = (run_cnt > 0.0) & ~cont
        mean = run_sum / jnp.maximum(run_cnt, 1.0)
        filled, out_v, out_d = emit((filled, out_v, out_d), mean, run_best,
                                    close)
        run_sum = jnp.where(cont, run_sum + c_i, jnp.where(valid, c_i, 0.0))
        run_cnt = jnp.where(cont, run_cnt + 1.0,
                            jnp.where(valid, 1.0, 0.0))
        run_best = jnp.where(cont, jnp.minimum(run_best, d_i),
                             jnp.where(valid, d_i, jnp.inf))
        return (run_sum, run_cnt, run_best, c_i, filled, out_v, out_d), None

    init = (jnp.zeros(n), jnp.zeros(n), jnp.full(n, jnp.inf),
            jnp.zeros(n), jnp.zeros(n, jnp.int32),
            jnp.zeros((n, _K)), jnp.full((n, _K), jnp.inf))
    (run_sum, run_cnt, run_best, _, filled, out_v, out_d), _ = jax.lax.scan(
        step, init, (cand, dev))
    # close the trailing run
    mean = run_sum / jnp.maximum(run_cnt, 1.0)
    _, out_v, out_d = emit((filled, out_v, out_d), mean, run_best,
                           run_cnt > 0.0)
    return out_v, out_d


def _harmonic_amps_if(seg: jnp.ndarray, f0: jnp.ndarray, fs: int,
                      with_if: bool) -> tuple:
    """Blackman-windowed direct DFT at the <=6 harmonic frequencies.

    seg [N, W] raw frame-centered samples (W from
    constants.harvest_refine_window, so the widest candidate window
    fits); f0 [N, K] per-candidate frequencies (>0).  Returns
    (amps [N, K, H], ifs [N, K, H] or None, energy [N, K]).  All trig
    derives from one cos/sin pair per candidate (double/triple angle +
    angle-addition — see dsp/stonemask.py).
    """
    w = seg.shape[-1]
    f0c = f0[..., None]                                     # [N, K, 1]
    hw = jnp.floor(1.5 * fs / f0c + 1.0)
    base = (jnp.arange(w, dtype=jnp.float32) - w // 2)[None, None, :]
    mask = jnp.abs(base) <= hw
    seg3 = jnp.where(mask, seg[:, None, :], 0.0)            # [N, K, W]

    # cos/sin(theta * b) for the [N, K, W] grid from SPLIT-ANGLE factors:
    # b = 128*b_hi + b_lo, so the transcendentals run on [N, K, 128] and
    # [N, K, W/128] grids and the full grid is an angle-addition combine
    # (4 mul + 2 add per element).  The full-grid cos/sin pair was the
    # refinement's dominant cost — the round-3 roofline put this scan at
    # 47% of the harvest call's device time, transcendental-bound.
    assert w % 128 == 0, "refine window must be a lane multiple (constants)"
    theta = (2.0 * jnp.pi / (3.0 * fs)) * f0c               # [N, K, 1]
    lo = jnp.arange(128, dtype=jnp.float32)[None, None, :]
    n_hi = w // 128
    hi = (jnp.arange(n_hi, dtype=jnp.float32)[None, None, :]
          * 128.0 - w // 2)
    a = theta * lo
    b_ang = theta * hi
    ca, sa = jnp.cos(a), jnp.sin(a)                         # [N, K, 128]
    cb, sb = jnp.cos(b_ang), jnp.sin(b_ang)                 # [N, K, n_hi]
    sh = seg3.shape[:-1]
    cp = (cb[..., :, None] * ca[..., None, :]
          - sb[..., :, None] * sa[..., None, :]).reshape(*sh, w)
    sp = (sb[..., :, None] * ca[..., None, :]
          + cb[..., :, None] * sa[..., None, :]).reshape(*sh, w)
    win = 0.42 + 0.5 * cp + 0.08 * (2.0 * cp * cp - 1.0)
    win = jnp.where(mask, win, 0.0)
    xw = seg3 * win
    energy = jnp.sum(xw * xw, axis=-1)
    if with_if:
        dwin = jnp.pad(win[..., 2:] - win[..., :-2],
                       ((0, 0), (0, 0), (1, 1))) * (-0.5)
        xd = seg3 * dwin
    c1 = cp * (4.0 * cp * cp - 3.0)
    s1 = sp * (3.0 - 4.0 * sp * sp)
    if with_if:
        xw, xd, c1, s1 = jax.lax.optimization_barrier((xw, xd, c1, s1))
    else:
        xw, c1, s1 = jax.lax.optimization_barrier((xw, c1, s1))
    ch, sh = c1, s1
    amps, ifs = [], []
    for h in range(1, STONEMASK_NUM_HARMONICS + 1):
        if h > 1:
            ch, sh = ch * c1 - sh * s1, sh * c1 + ch * s1
        x_re = jnp.sum(xw * ch, axis=-1)
        x_im = -jnp.sum(xw * sh, axis=-1)
        power = x_re * x_re + x_im * x_im + 1e-20
        amp = jnp.where(h * f0 < fs / 2.0, jnp.sqrt(power), 0.0)
        amps.append(amp)
        if with_if:
            d_re = jnp.sum(xd * ch, axis=-1)
            d_im = -jnp.sum(xd * sh, axis=-1)
            inst = h * f0 + (x_re * d_im - x_im * d_re) / power * (
                fs / (2.0 * jnp.pi))
            ifs.append(inst)
    amps = jnp.stack(amps, axis=-1)                         # [N, K, H]
    ifs_a = jnp.stack(ifs, axis=-1) if with_if else None
    return amps, ifs_a, energy


# Frames refined per lax.map step.  The refinement's live set is ~6
# [chunk, K, W] f32 buffers (windowed segments, window, derivative copy,
# trig recurrence state) ~ 184 KB per in-flight frame; 128 frames keep it
# at ~24 MB per utterance in the batch (~3 GB at batch 128), so HBM use
# is bounded by the per-audio-second stages (band bank ~5 MB/s, frames
# ~3 MB/s), not the refinement — round 2 refined all N frames at once,
# capping a call at 32 s of audio vs DIO's 384 s (VERDICT r2 item 3).
# Budget asserted by tests/test_budget.py via compiled memory analysis.
_REFINE_CHUNK = 128

# Band-pass channels per lax.map step of the event-track stage.  With
# cell-granular event scans this had to be 48 (the [Td]-length scan
# temporaries dominated the HBM slope; round-3 sweep cb=8/32/64/152 ->
# 4.00/2.62/1.74/3.32 s/call at batch 32 x 4 s).  The block-granular
# scans (dio._channel_tracks: per-block top-2 reduction + stride x
# shorter scan) cut those temporaries 8x, so all 152 channels now run
# unserialized — full-graph temp slope 52 MB/audio-s (6.7 GB projected
# at the 128 s budget, tests/test_budget.py).
_CHANNEL_BLOCK = 152


def _refine_and_score_fused(x: jnp.ndarray, cands: jnp.ndarray, fs: int,
                            hop_1ms: int, n_1ms: int, win: int,
                            floor: float
                            ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Kernel-backed twin of _refine_and_score (ops/pallas_harmonics.py).

    One fused VMEM pass per refinement phase replaces the lax.map +
    [chunk, K, W] materialization: the kernel re-reads each frame tile
    from VMEM for every candidate slot instead of XLA re-reading the
    [N, K, W] operands from HBM for every harmonic (the round-3 roofline
    put this stage at 47% of the harvest call, bandwidth-bound).  Empty
    candidate slots (most of K=10 — merged regions fill slots in
    ascending order) are skipped per frame tile inside the kernel, so
    cost tracks the REAL candidate count without top-k approximation.
    Same numbers as the XLA path to reduction-order rounding
    (tests/test_ops.py; oracle parity pins the end-to-end track).

    Memory: the kernel input is the pre-framed [N, W] segment array
    (12.3 MB per 4 s utterance; ~393 MB/call at the 128 audio-s budget)
    — the array the round-3 XLA path deliberately avoided CARRYING
    through a lax.map (loop-state movement cost, not footprint).  As a
    kernel input it is written once and streamed tile-by-tile, far
    under the 15.75 GB HBM envelope; the on-chip A/B
    (scripts/bench_harvest.py) gates making this path the default.
    """
    from tpuvc.ops.pallas_harmonics import harmonic_dft_pallas, use_pallas
    from tpuvc.ops.framing import frame_signal
    interp = not use_pallas()
    hh = jnp.arange(1, STONEMASK_NUM_HARMONICS + 1, dtype=jnp.float32)
    seg = frame_signal(x, hop_1ms, win, n_1ms)              # [N, W]

    valid = cands > 0.0
    f0_1 = jnp.where(valid, jnp.maximum(cands, floor), 0.0)
    xre, xim, dre, dim_, _ = harmonic_dft_pallas(
        seg, f0_1, fs, n_harm=STONEMASK_NUM_HARMONICS, with_if=True,
        skip_empty=True, interpret=interp)
    f0c = jnp.maximum(f0_1, floor)[..., None]
    power = xre * xre + xim * xim + 1e-20
    amps = jnp.where(hh * f0c < fs / 2.0, jnp.sqrt(power), 0.0)
    ifs = hh * f0c + (xre * dim_ - xim * dre) / power * (
        fs / (2.0 * jnp.pi))
    num = jnp.sum(amps * ifs / hh, axis=-1)
    den = jnp.sum(amps, axis=-1)
    refined = jnp.where(den > 0.0, num / jnp.maximum(den, 1e-12), 0.0)
    ok = (valid & (refined > 0.0)
          & (jnp.abs(refined - cands)
             <= HARVEST_REFINE_LIMIT * jnp.maximum(cands, 1e-12)))

    rf = jnp.where(ok, jnp.maximum(refined, floor), 0.0)
    xre2, xim2, _, _, energy = harmonic_dft_pallas(
        seg, rf, fs, n_harm=STONEMASK_NUM_HARMONICS, with_if=False,
        skip_empty=True, interpret=interp)
    rfc = jnp.maximum(rf, floor)[..., None]
    power2 = xre2 * xre2 + xim2 * xim2 + 1e-20
    amps2 = jnp.where(hh * rfc < fs / 2.0, jnp.sqrt(power2), 0.0)
    hw = jnp.floor(1.5 * fs / jnp.maximum(rf, floor) + 1.0)
    winlen = 2.0 * hw + 1.0
    fft_size = jnp.exp2(2.0 + jnp.ceil(jnp.log2(winlen)))
    total = jnp.sqrt(fft_size * energy / 2.0 + 1e-30)
    a1 = amps2[..., 0]
    a2 = amps2[..., 1]
    score = (jnp.sum(amps2, axis=-1) / total) * (a1 / (a1 + a2 + 1e-30))
    return jnp.where(ok, refined, 0.0), jnp.where(ok, score, 0.0)


def _refine_and_score_merged(x: jnp.ndarray, cands: jnp.ndarray, fs: int,
                             hop_1ms: int, n_1ms: int, win: int,
                             floor: float
                             ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Single-kernel twin of _refine_and_score_fused: both refinement
    phases AND the inter-phase glue run inside one refine_score_pallas
    call (ops/pallas_harmonics.py) while the frame tile is VMEM-resident.
    Saves one even/odd fold + one HBM read of the [N, W] seg array and
    the ~10 [N, K, H] intermediate tensors the split path round-trips.
    Same numbers to fp rounding (tests/test_ops.py)."""
    from tpuvc.ops.pallas_harmonics import refine_score_pallas, use_pallas
    from tpuvc.ops.framing import frame_signal
    seg = frame_signal(x, hop_1ms, win, n_1ms)              # [N, W]
    f0_1 = jnp.where(cands > 0.0, jnp.maximum(cands, floor), 0.0)
    return refine_score_pallas(
        seg, f0_1, fs, floor=floor, limit=HARVEST_REFINE_LIMIT,
        n_harm=STONEMASK_NUM_HARMONICS, skip_empty=True,
        interpret=not use_pallas())


def _refine_and_score(x: jnp.ndarray, cands: jnp.ndarray, fs: int,
                      hop_1ms: int, n_1ms: int, win: int, floor: float
                      ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """IF-refine + score all candidates: [N, K] -> (refined, score).

    ``floor`` is the adjusted search floor: valid candidates are >= it by
    the channel gate, so clamping there only touches the masked invalid
    slots (no bias on real candidates).

    The frame axis streams through a lax.map in _REFINE_CHUNK blocks:
    each frame's refinement is independent, so chunking is exact — same
    numbers as the round-2 all-at-once version (pinned by the oracle
    parity suite) with peak memory ~ chunk instead of ~ N.

    Each block frames its own segment window IN the loop body from a
    ~(chunk*hop + W)-sample dynamic slice of the (center-padded) signal,
    instead of carrying the pre-framed [N, W] array through the lax.map:
    at batch 32 x 4 s that array is 393 MB and its per-step chunk
    slicing/copying was the largest single op in the harvest roofline
    (while.60, 171 ms/call at 22 GB/s — loop state movement, initially
    misattributed to the channel merge; see docs/PERFORMANCE.md round-3
    notes).  The in-body framing reads ~2.2 MB per step instead.
    """
    hh = jnp.arange(1, STONEMASK_NUM_HARMONICS + 1, dtype=jnp.float32)
    half = win // 2

    def chunk_frames(buf, n):
        """out[r, j] = buf[r*hop_1ms + j] for r < n, j < win — the same
        shifted-slice framing as ops.framing.frame_signal, minus the
        centering pad (buf is already offset)."""
        k = -(-win // hop_1ms) + 1
        need = (n + k) * hop_1ms
        bp = jnp.pad(buf, (0, need - buf.shape[0]))
        rows = bp.reshape(-1, hop_1ms)
        cols = [rows[j: j + n] for j in range(k)]
        return jax.lax.slice_in_dim(jnp.concatenate(cols, axis=-1), 0, win,
                                    axis=1)

    def block(args):
        seg_c, cands_c = args
        valid = cands_c > 0.0
        f0s = jnp.maximum(cands_c, floor)

        # pass 1: IF refinement at the candidate frequency
        amps, ifs, _ = _harmonic_amps_if(seg_c, f0s, fs, with_if=True)
        num = jnp.sum(amps * ifs / hh, axis=-1)
        den = jnp.sum(amps, axis=-1)
        refined = jnp.where(den > 0.0, num / jnp.maximum(den, 1e-12), 0.0)
        ok = (valid & (refined > 0.0)
              & (jnp.abs(refined - cands_c)
                 <= HARVEST_REFINE_LIMIT * jnp.maximum(cands_c, 1e-12)))

        # pass 2: harmonic concentration score at the refined frequency
        rf = jnp.maximum(refined, floor)
        amps2, _, energy = _harmonic_amps_if(seg_c, rf, fs, with_if=False)
        hw = jnp.floor(1.5 * fs / rf + 1.0)
        winlen = 2.0 * hw + 1.0
        fft_size = jnp.exp2(2.0 + jnp.ceil(jnp.log2(winlen)))
        total = jnp.sqrt(fft_size * energy / 2.0 + 1e-30)
        a1 = amps2[..., 0]
        a2 = amps2[..., 1]
        score = (jnp.sum(amps2, axis=-1) / total) * (a1 / (a1 + a2 + 1e-30))
        return jnp.where(ok, refined, 0.0), jnp.where(ok, score, 0.0)

    chunk = min(_REFINE_CHUNK, n_1ms)
    pad = (-n_1ms) % chunk
    nc = (n_1ms + pad) // chunk
    cand_b = jnp.pad(cands, ((0, pad), (0, 0))).reshape(nc, chunk, _K)
    buf_len = (chunk - 1) * hop_1ms + win
    need = (nc * chunk - 1) * hop_1ms + win
    xp = jnp.pad(x, (half, max(0, need - half - x.shape[0])))
    if nc == 1:
        seg0 = chunk_frames(jax.lax.slice(xp, (0,), (buf_len,)), chunk)
        refined, score = block((seg0, cand_b[0]))
        return refined[:n_1ms], score[:n_1ms]

    def indexed_block(args):
        ci, cands_c = args
        buf = jax.lax.dynamic_slice(xp, (ci * (chunk * hop_1ms),),
                                    (buf_len,))
        return block((chunk_frames(buf, chunk), cands_c))

    refined, score = jax.lax.map(indexed_block,
                                 (jnp.arange(nc), cand_b))
    return (refined.reshape(-1, _K)[:n_1ms],
            score.reshape(-1, _K)[:n_1ms])


def _guided_reselect(f0: jnp.ndarray, refined: jnp.ndarray,
                     scores: jnp.ndarray) -> jnp.ndarray:
    """Moving-median contour guide; see tests/oracle/harvest.py twin."""
    half = HARVEST_RESELECT_HALF
    width = 2 * half + 1
    n = f0.shape[0]
    padded = jnp.pad(f0, (half, half))
    win = jnp.stack([padded[j: j + n] for j in range(width)], axis=-1)
    valid = win > 0.0
    cnt = jnp.sum(valid, axis=-1)
    s = jnp.sort(jnp.where(valid, win, jnp.inf), axis=-1)   # voiced first
    lo = jnp.maximum((cnt - 1) // 2, 0)
    hi = cnt // 2
    med = 0.5 * (jnp.take_along_axis(s, lo[:, None], axis=-1)[:, 0]
                 + jnp.take_along_axis(s, hi[:, None], axis=-1)[:, 0])
    med = jnp.where(cnt > 0, med, 0.0)

    need = ((f0 > 0.0) & (cnt > 0)
            & (jnp.abs(f0 - med) > HARVEST_RESELECT_REL
               * jnp.maximum(med, 1e-12)))
    errs = jnp.where((scores > 0.0) & (refined > 0.0),
                     jnp.abs(refined - med[:, None])
                     / jnp.maximum(med, 1e-12)[:, None], jnp.inf)
    j = jnp.argmin(errs, axis=-1)
    best_err = jnp.take_along_axis(errs, j[:, None], axis=-1)[:, 0]
    best_val = jnp.take_along_axis(refined, j[:, None], axis=-1)[:, 0]
    fixed = jnp.where(best_err <= HARVEST_RESELECT_REL, best_val, 0.0)
    return jnp.where(need, fixed, f0)


def _fix_step1_scan(f0: jnp.ndarray, allowed: float) -> jnp.ndarray:
    """Sequential jump removal (the updated previous value is the
    reference, matching WORLD/the oracle: after a zeroing, the next frame
    survives because its predecessor is now unvoiced).

    Blocked (round 5): the carry is TWO-CLASS — every output is either 0
    or its own input frame (``new = where(bad, 0, cur)``), so the value
    entering block b is either 0 or the previous block's last INPUT,
    both known up front.  The L-step intra scan therefore runs once per
    scenario, vectorized across all blocks, and an nb-step boolean scan
    picks the realized scenario per block — bitwise-identical to the
    flat scan (selection only; the jump test sees the same (prev, cur)
    pairs in the selected scenario).  This kills two of the four ~4000-
    step flat scans the round-5 roofline left in hv_contour (16 GB/s,
    scan-serial); _extend_scan keeps its flat form — its carry chains
    through unboundedly many candidate values inside a gap (no finite
    scenario set), verified round 5."""
    n = f0.shape[0]
    L = _CONTOUR_BLOCK
    nb = -(-n // L)
    pad = nb * L - n
    fb = jnp.pad(f0, (0, pad)).reshape(nb, L).T            # [L, nb]

    def step(prev, cur):
        bad = (cur > 0.0) & (prev > 0.0) & (
            jnp.abs(cur - prev) > allowed * jnp.maximum(cur, 1e-12))
        new = jnp.where(bad, 0.0, cur)
        return new, new

    # scenario 0: carry-in 0 (also the global init for block 0);
    # scenario 1: carry-in = previous block's last input frame
    prev_last = jnp.concatenate([jnp.zeros((1,), fb.dtype), fb[-1, :-1]])
    init = jnp.stack([jnp.zeros_like(prev_last), prev_last])   # [2, nb]
    _, outs = jax.lax.scan(step, init, fb)                 # [L, 2, nb]
    nonzero_out = outs[-1] > 0.0                           # [2, nb]

    def inter(cls, nz):
        return jnp.where(cls, nz[1], nz[0]), cls           # emit carry-in

    _, cls_in = jax.lax.scan(inter, jnp.zeros((), bool),
                             jnp.moveaxis(nonzero_out, 0, 1))  # [nb]
    out = jnp.where(cls_in[None, :], outs[:, 1], outs[:, 0])  # [L, nb]
    return out.T.reshape(-1)[:n]


# Frames per block of the blocked contour recurrences (_ffill/_biquad).
# A flat lax.scan over the 1 ms grid is ~4000 sequential steps of
# [batch]-wide work — terrible VPU utilization (round-5 roofline:
# hv_contour at 14.5 GB/s).  Both recurrences are blocked: an intra-
# block pass runs the short scan vectorized across ALL blocks at once,
# and only a tiny nb-step scan propagates the carry between blocks.
_CONTOUR_BLOCK = 128


def _ffill(v: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Forward-fill v where ~mask with the last mask-true value
    (positions before the first true value get v[0], matching the old
    flat-scan init).  Blocked: L-step scan over [nb] lanes + an nb-step
    carry scan — bitwise-identical to the flat scan (selection only,
    no arithmetic reassociation)."""
    n = v.shape[0]
    L = _CONTOUR_BLOCK
    nb = -(-n // L)
    pad = nb * L - n
    vb = jnp.pad(v, (0, pad)).reshape(nb, L).T          # [L, nb]
    mb = jnp.pad(mask, (0, pad)).reshape(nb, L).T

    def intra(c, io):
        vi, mi = io
        new = jnp.where(mi, vi, c)
        return new, new

    # sentinel-carry intra pass; rows before a block's first valid
    # element are patched from the inter-block carry below
    _, loc = jax.lax.scan(intra, vb[0], (vb, mb))       # [L, nb]
    seen = jnp.cumsum(mb.astype(jnp.int32), axis=0) > 0
    has = seen[-1]                                       # block has a valid
    last = loc[-1]                                       # valid iff has

    def inter(c, io):
        h, lv = io
        return jnp.where(h, lv, c), c                    # emit carry-IN

    _, carry_in = jax.lax.scan(inter, v[0], (has, last))  # [nb]
    out = jnp.where(seen, loc, carry_in[None, :])
    return out.T.reshape(-1)[:n]


@functools.lru_cache(maxsize=4)
def _biquad_hom(L: int):
    """Homogeneous (zero-input) responses of the smoothing biquad to the
    four unit initial states (x1, x2, y1, y2), rows 0..L-1 — float64 on
    host, the static constants of the blocked formulation."""
    import numpy as np
    b0, b1, b2 = HARVEST_SMOOTH_B
    a1, a2 = HARVEST_SMOOTH_A1, HARVEST_SMOOTH_A2
    c = np.zeros((L, 4), np.float64)
    for k in range(4):
        x1, x2, y1, y2 = (float(k == 0), float(k == 1),
                          float(k == 2), float(k == 3))
        for i in range(L):
            yi = b1 * x1 + b2 * x2 - a1 * y1 - a2 * y2
            c[i, k] = yi
            x2, x1 = x1, 0.0
            y2, y1 = y1, yi
    return c.astype(np.float32)


def _biquad(v: jnp.ndarray) -> jnp.ndarray:
    """Settled-init biquad, blocked (see _CONTOUR_BLOCK).

    Linear decomposition: block j's true output = its zero-initial-state
    output + c @ s_in_j, where c [L, 4] are the unit-state homogeneous
    responses and s_in_j the incoming (x1, x2, y1, y2) state; states
    chain by the affine map s_{j+1} = g_j + D s_j (g_j from the
    zero-state pass, D rows = [0, 0, c[L-1], c[L-2]]).  Equal to the
    flat scan up to f32 reassociation (~1e-7 rel; the biquad's poles
    are at |r| = 0.875 so unit responses decay to 5e-8 within a block —
    golden tolerances are 1e-3)."""
    b0, b1, b2 = HARVEST_SMOOTH_B
    a1, a2 = HARVEST_SMOOTH_A1, HARVEST_SMOOTH_A2
    n = v.shape[0]
    L = _CONTOUR_BLOCK
    nb = -(-n // L)
    pad = nb * L - n
    xb = jnp.pad(v, (0, pad)).reshape(nb, L).T           # [L, nb]

    def zstep(carry, xi):
        x1, x2, y1, y2 = carry
        yi = b0 * xi + b1 * x1 + b2 * x2 - a1 * y1 - a2 * y2
        return (xi, x1, yi, y1), yi

    zinit = tuple(jnp.zeros_like(xb[0]) for _ in range(4))
    (xl1, xl2, yl1, yl2), y0 = jax.lax.scan(zstep, zinit, xb)
    g = jnp.stack([xl1, xl2, yl1, yl2], axis=-1)         # [nb, 4]
    c = jnp.asarray(_biquad_hom(L))                      # [L, 4]
    d = jnp.stack([jnp.zeros(4, jnp.float32), jnp.zeros(4, jnp.float32),
                   c[L - 1], c[L - 2]])                  # [4, 4]

    def bstep(s, gj):
        return gj + d @ s, s                              # emit carry-IN

    s0 = jnp.stack([v[0]] * 4)        # settled at the first value
    _, s_in = jax.lax.scan(bstep, s0, g)                 # [nb, 4]
    y = y0.T + s_in @ c.T                                # [nb, L]
    return y.reshape(-1)[:n]


def _smooth(f0: jnp.ndarray) -> jnp.ndarray:
    """Zero-phase biquad on the voiced contour (WORLD SmoothF0Contour).

    Gap frames are filled so each filtering pass enters every voiced
    segment already settled at that segment's edge value — the same state
    WORLD reaches by padding each segment with 300 copies of its edge:
    the forward pass sees gaps filled with the UPCOMING segment's head
    (backward fill), the backward pass sees gaps filled with the
    PREVIOUS output's tail (forward fill).
    """
    v = f0 > 0.0
    bfill = _ffill(f0[::-1], v[::-1])[::-1]       # next voiced value
    xf = jnp.where(v, f0, bfill)
    yf = _biquad(xf)
    ffwd = _ffill(yf, v)
    xb = jnp.where(v, yf, ffwd)
    yb = _biquad(xb[::-1])[::-1]
    return jnp.where(v, yb, 0.0)


@functools.partial(jax.jit,
                   static_argnames=("fs", "hop", "f0_floor", "f0_ceil",
                                    "channel_decim"))
def harvest(x: jnp.ndarray, fs: int = DEFAULT_WORLD.fs,
            hop: int = DEFAULT_WORLD.hop,
            f0_floor: float = DEFAULT_WORLD.f0_floor,
            f0_ceil: float = DEFAULT_WORLD.f0_ceil,
            channel_decim: int = 1) -> jnp.ndarray:
    """Estimate f0 for every frame of ``x``; 0 Hz marks unvoiced frames.

    Args: x [T] waveform at rate fs.  Returns [T//hop + 1] f0 in Hz.

    ``channel_decim`` > 1 runs the candidate-generation filterbank at
    1/(40/decim) octaves instead of WORLD's 1/40 (VERDICT r3 item 1's
    suggested coarsening): the band bank and the four event-interval
    tracks — the two dominant stages of the call — shrink by the same
    factor, and the IF refinement (+-20% capture range, far wider than
    the coarser 1/20-octave channel spacing) pulls the surviving
    candidates to the same frequencies.  Accuracy cost measured on the
    speech-shaped truth fixtures in tests/test_f0.py
    (test_harvest_channel_decim_accuracy); 1 = exact WORLD layout, the
    default and the oracle-parity configuration.
    """
    if fs % 1000:
        raise ValueError(f"harvest needs fs divisible by 1000, got {fs}")
    if (hop * 1000) % fs:
        raise ValueError(f"hop {hop} is not a whole number of ms at {fs}")
    x = x.astype(jnp.float32)
    n_out = x.shape[0] // hop + 1
    floor = f0_floor * HARVEST_FLOOR_ADJUST
    ceil = f0_ceil * HARVEST_CEIL_ADJUST

    # decimation ratio: highest divisor of fs keeping >= target rate AND a
    # whole number of decimated samples per 1 ms
    ratio = 1
    for r in range(1, 13):
        if fs % r == 0 and fs / r >= HARVEST_TARGET_FS and (fs // r) % 1000 == 0:
            ratio = r
    fs_d = fs // ratio
    y = filters.decimate(x, ratio)
    y = y - jnp.mean(y)

    bfs_t = _boundary_f0s(f0_floor, f0_ceil)
    if channel_decim > 1:
        bfs_t = bfs_t[::channel_decim]
    # jax.named_scope tags each stage in the xplane trace (tf_op scope)
    # so scripts/roofline.py can attribute device time per harvest stage;
    # scopes are trace-metadata only, numerically inert.
    with jax.named_scope("hv_band_bank"):
        filtered = filters.bandpass_bank_fft(y, fs_d, bfs_t)  # [C, Td]

    hop_1ms_d = fs_d // 1000
    n_1ms = (x.shape[0] * 1000) // fs + 1
    # Channel axis streams through a lax.map in blocks: the per-channel
    # event machinery (4 crossing types x top-2 associative scans) holds
    # ~30 [Td]-length temporaries per channel — all 152 channels at once
    # dominated the graph's HBM slope (~200 MB per audio-second measured
    # by XLA memory analysis; tests/test_budget.py).  Channels are
    # independent, so blocking is exact.
    track_one = lambda s: _channel_tracks(s, fs_d, n_1ms, hop_1ms_d)
    cb = _CHANNEL_BLOCK
    c = filtered.shape[0]
    from tpuvc.ops.pallas_events import events_impl
    with jax.named_scope("hv_event_tracks"):
        if events_impl() == "pallas":
            # fused event kernel (ops/pallas_events.py): the per-channel
            # temporaries are [nb]-sized (stride x smaller than the cell
            # grid), so the whole bank runs unblocked
            from tpuvc.dsp.dio import _bank_tracks
            tracks = _bank_tracks(filtered, fs_d, n_1ms, hop_1ms_d)
        elif cb >= c:
            # one block covers the bank: skip the lax.map — a 1-step
            # while still pays carried-buffer plumbing and blocks fusion
            # with the neighboring stages
            tracks = jax.vmap(track_one)(filtered)
        else:
            pad_c = (-c) % cb
            blocks = jnp.pad(filtered, ((0, pad_c), (0, 0))).reshape(
                (c + pad_c) // cb, cb, -1)
            tracks = jax.lax.map(jax.vmap(track_one), blocks)
            tracks = tracks.reshape(-1, 4, n_1ms)[:c]
    with jax.named_scope("hv_merge"):
        cand, dev = _channel_candidates(
            tracks, jnp.asarray(bfs_t, jnp.float32), floor, ceil)
        merged_v, _ = _merge_channels(cand, dev)             # [N, K]
    win = harvest_refine_window(fs, f0_floor)
    from tpuvc.ops.pallas_harmonics import harmonics_impl, refine_impl
    if harmonics_impl() == "pallas":
        refine_fn = (_refine_and_score_merged if refine_impl() == "merged"
                     else _refine_and_score_fused)
    else:
        refine_fn = _refine_and_score
    with jax.named_scope("hv_refine"):
        refined, scores = refine_fn(x, merged_v, fs, fs // 1000,
                                    n_1ms, win, floor)

    with jax.named_scope("hv_contour"):
        best = jnp.argmax(scores, axis=-1)
        f0 = jnp.take_along_axis(refined, best[:, None], axis=-1)[:, 0]
        best_score = jnp.take_along_axis(scores, best[:, None],
                                         axis=-1)[:, 0]
        f0 = jnp.where(best_score > 0.0, f0, 0.0)

        f0 = _guided_reselect(f0, refined, scores)
        f0 = _fix_step1_scan(f0, HARVEST_STEP1_ALLOWED)
        f0 = _fix_step_remove_short_runs(f0, HARVEST_VOICE_RANGE_MIN)
        f0 = _extend_scan(f0, refined, HARVEST_EXTENSION_ALLOWED)
        f0 = _extend_scan(f0[::-1], refined[::-1],
                          HARVEST_EXTENSION_ALLOWED)[::-1]
        f0 = _fix_step1_scan(f0, HARVEST_STEP1_ALLOWED)
        f0 = _fix_step_remove_short_runs(f0, HARVEST_VOICE_RANGE_MIN)
        f0 = _smooth(f0)

    step = (hop * 1000) // fs                                # ms per frame
    out = f0[:: step]
    return out[:n_out]


def harvest_config(x: jnp.ndarray,
                   cfg: WorldConfig = DEFAULT_WORLD) -> jnp.ndarray:
    return harvest(x, fs=cfg.fs, hop=cfg.hop,
                   channel_decim=cfg.harvest_channel_decim,
                   f0_floor=cfg.f0_floor,
                   f0_ceil=cfg.f0_ceil)
