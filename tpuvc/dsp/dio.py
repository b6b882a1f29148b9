"""DIO fundamental-frequency estimation, batched and jit-compiled.

TPU-native rebuild of WORLD's DIO (Morise et al., IEICE 2016) that the
reference calls through ``pyworld.dio`` (reference analyzer.py wav2pw,
SURVEY.md SS2.3 N1).  The reference's C++ walks events with data-dependent
loops; here every stage is fixed-shape array code so the whole estimator is
one XLA program:

  1. decimate to ~4 kHz (FFT low-pass + subsample)
  2. a bank of Nuttall low-pass filters, one per log-spaced channel between
     f0_floor and f0_ceil (2 channels/octave), applied as one batched FFT
  3. per channel, four event-interval estimators (negative/positive-going
     zero crossings, peaks, dips); each frame reads its bracketing event
     times from prefix/suffix cumulative scans (scatter-free, see
     _channel_tracks)
  4. candidate = mean of the four tracks, reliability = their stddev /
     candidate; the best channel per frame wins
  5. contour fixing: neighbor-consistency zeroing (allowed_range 0.1),
     short-voiced-run removal (9 frames), and candidate-guided forward /
     backward extension as lax.scan passes

Unvoiced frames are 0 Hz, matching pyworld's convention.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp

from tpuvc.dsp import filters
from tpuvc.dsp.constants import (DIO_ALLOWED_RANGE, DIO_CHANNELS_IN_OCTAVE,
                                 DIO_SCORE_CUTOFF, DIO_TARGET_FS,
                                 DIO_VOICE_RANGE_MINIMUM, DEFAULT_WORLD,
                                 WorldConfig)


def _boundary_f0s(f0_floor: float, f0_ceil: float) -> tuple[float, ...]:
    n = 1 + int(math.log2(f0_ceil / f0_floor) * DIO_CHANNELS_IN_OCTAVE)
    return tuple(f0_floor * 2.0 ** ((i + 1) / DIO_CHANNELS_IN_OCTAVE)
                 for i in range(n))


def _top2_max_scan(pair: tuple) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Prefix top-2 of the union of sorted (largest, second) block pairs.

    Formulated on `lax.cummax` instead of a pair-valued associative_scan:
    the generic scan's odd/even lowering emits stride-2 slices + pads on
    the minor axis at every level, which on TPU are cross-lane relayouts
    — the round-4 xplane trace attributed 0.75 s of a 0.85 s harvest
    event stage to exactly those ops (1116 slices + 674 pads at ~40-58
    GB/s), while cummax lowers to XLA's native cumulative-reduce-window
    path with no interleaved slicing.  Identity (exact, min/max only, so
    bit-identical to the scan): with pre[j] = cummax(a1)[j-1] (-inf at 0),

      p1 = cummax(a1)
      p2 = max(cummax(min(a1, pre)), cummax(a2))

    min(a1[j], pre[j]) never exceeds the prefix's second max (its two
    witnesses are distinct elements) and equals it at the first position
    where the overall runner-up is dominated, with multiplicity: a
    duplicate max contributes itself via the min term.  a2 terms are
    always <= the prefix second max (a2[j] <= a1[j], a separate element)
    and supply it when the runner-up lives in the same block as the max.
    """
    a1, a2 = pair
    p1 = jax.lax.cummax(a1, axis=0)
    pre = jnp.concatenate([jnp.full_like(p1[:1], -jnp.inf), p1[:-1]])
    p2 = jnp.maximum(jax.lax.cummax(jnp.minimum(a1, pre), axis=0),
                     jax.lax.cummax(a2, axis=0))
    return p1, p2


def _top2_min_scan_rev(pair: tuple) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Suffix bottom-2 of the union of sorted (smallest, second) pairs.

    Mirror of _top2_max_scan (see its docstring for the derivation and
    the TPU relayout rationale): reversed cummin with post[j] =
    suffix-min over j+1.. (+inf at the end).
    """
    b1, b2 = pair
    s1 = jax.lax.cummin(b1, axis=0, reverse=True)
    post = jnp.concatenate([s1[1:], jnp.full_like(s1[:1], jnp.inf)])
    s2 = jnp.minimum(
        jax.lax.cummin(jnp.maximum(b1, post), axis=0, reverse=True),
        jax.lax.cummin(b2, axis=0, reverse=True))
    return s1, s2


def _block_top2(v: jnp.ndarray, stride: int, nb: int, largest: bool
                ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """[L] masked event times -> per-block sorted top-2 pair ([nb], [nb]).

    Blocks are `stride` consecutive cells; non-events carry the fill value
    (-inf for largest, +inf for smallest), so padding is inert.  Top-2 via
    argmax one-hot removal — no gathers, and exact under ties (removes one
    instance with multiplicity).
    """
    fill = -jnp.inf if largest else jnp.inf
    pad = nb * stride - v.shape[0]
    vb = jnp.pad(v, (0, pad), constant_values=fill).reshape(nb, stride)
    if largest:
        m1 = jnp.max(vb, axis=-1)
        am = jnp.argmax(vb, axis=-1)
    else:
        m1 = jnp.min(vb, axis=-1)
        am = jnp.argmin(vb, axis=-1)
    rest = jnp.where(jnp.arange(stride)[None, :] == am[:, None], fill, vb)
    m2 = jnp.max(rest, axis=-1) if largest else jnp.min(rest, axis=-1)
    return m1, m2


def _edge_pad(v: jnp.ndarray, n: int) -> jnp.ndarray:
    """v[:n], extended by repeating the last value if v is short."""
    if v.shape[0] >= n:
        return v[:n]
    return jnp.concatenate(
        [v, jnp.broadcast_to(v[-1:], (n - v.shape[0],))])


def _tracks_from_pairs(p1: jnp.ndarray, p2: jnp.ndarray, s1: jnp.ndarray,
                       s2: jnp.ndarray, fs_d: float, n_frames: int,
                       stride: int, ncells: int,
                       pre_scanned: bool = False) -> jnp.ndarray:
    """Block top-2 event-time pairs -> one event type's f0 track [N].

    The shared tail of the event machinery: block-level prefix/suffix
    top-2 scans over the per-block sorted pairs (p1/p2 block max pair
    filled -inf, s1/s2 block min pair filled +inf, each [nb] with nb =
    ceil(ncells/stride)), then WORLD's midpoint-interpolated interval
    contour read at the frame positions with edge hold (see
    _channel_tracks for the full derivation and provenance).
    ``pre_scanned``: the rows already carry the prefix/suffix scans
    (ops/pallas_events.top2_block_scans — bit-identical to the XLA
    scans below), so skip them here.
    """
    if not pre_scanned:
        p1, p2 = _top2_max_scan((p1, p2))
        s1, s2 = _top2_min_scan_rev((s1, s2))
    neg = jnp.full((1,), -jnp.inf, jnp.float32)
    # frame i's prefix read position is cell i*stride-1, which exists
    # only for i <= ncells//stride; frames past the signal end repeat
    # the last in-range prefix (edge pad) rather than reading the full
    # prefix — else such a frame sees events at-or-after its own
    # position in BOTH neighbors (a >= b -> spuriously unvoiced)
    n_read = ncells // stride + 1
    a = _edge_pad(jnp.concatenate([neg, p1])[:n_read], n_frames)
    a0 = _edge_pad(jnp.concatenate([neg, p2])[:n_read], n_frames)
    b = _edge_pad(s1, n_frames)
    b2 = _edge_pad(s2, n_frames)
    left_ok = jnp.isfinite(a0) & (a0 < a - 1e-3)
    right_ok = jnp.isfinite(b2) & (b2 > b + 1e-3)

    t = (jnp.arange(n_frames, dtype=jnp.float32)
         * jnp.float32(stride))
    v_mid = fs_d / jnp.maximum(b - a, 1e-6)      # interval containing t
    v_left = fs_d / jnp.maximum(a - a0, 1e-6)
    v_right = fs_d / jnp.maximum(b2 - b, 1e-6)
    m_left = 0.5 * (a0 + a)
    m_mid = 0.5 * (a + b)
    m_right = 0.5 * (b + b2)
    wl = jnp.clip((t - m_left) / jnp.maximum(m_mid - m_left, 1e-6),
                  0.0, 1.0)
    f_left = jnp.where(left_ok, v_left + wl * (v_mid - v_left), v_mid)
    wr = jnp.clip((t - m_mid) / jnp.maximum(m_right - m_mid, 1e-6),
                  0.0, 1.0)
    f_right = jnp.where(right_ok, v_mid + wr * (v_right - v_mid), v_mid)
    interp = jnp.where(t < m_mid, f_left, f_right)

    valid = jnp.isfinite(a) & jnp.isfinite(b) & (b > a)
    # edge hold (WORLD interp1 semantics): frames before the first event
    # read the first interval's f0, frames after the last event the last
    # interval's — otherwise utterance-edge frames lose their track and
    # come out spuriously unvoiced (oracle parity: tests/oracle/dio.py).
    # The global first/last two event times are the block scans' ends.
    # Those are top-2 WITH multiplicity: two events with identical
    # crossing time (an exact-zero sample at a cell boundary) make the
    # pair degenerate (e1 == e0) and fs_d/1e-6 would masquerade as a
    # candidate — a strictly later/earlier second event is required
    # (matching the old distinct-time semantics).  The guard is folded
    # into the ARITHMETIC rather than written as an extra boolean
    # conjunct: fs_d * d / max(d^2, 1e-6) matches fs_d / d to one f32
    # rounding when d > 1e-3 (same tolerance as left_ok/right_ok), is
    # exactly 0.0 for exact-duplicate times (d == 0), and the sliver
    # 0 < d <= 1e-3 maps to fs_d * d * 1e6 — in-band only for
    # d < ~1e-7, i.e. two adjacent-cell event times separated by less
    # than one float32 ulp within the utterance's first two cells
    # (adversarial bit pattern; the boolean form zeroed it, round 3
    # emitted fs_d/1e-6 — all three reject it in practice).  The
    # boolean form (`& (e1 > e0 + 1e-3)`) — two scalar comparisons —
    # tipped XLA into a +0.3 s/call fusion cliff on the harvest grid
    # (247x -> 154x, bisected on chip to exactly those conjuncts;
    # docs/PERFORMANCE.md round-4 item 7).
    e0, e1 = s1[0], s2[0]
    en, en1 = p1[-1], p2[-1]
    df = e1 - e0
    dl = en - en1
    first = jnp.where(jnp.isfinite(e0) & jnp.isfinite(e1),
                      fs_d * df / jnp.maximum(df * df, 1e-6), 0.0)
    last = jnp.where(jnp.isfinite(en) & jnp.isfinite(en1),
                     fs_d * dl / jnp.maximum(dl * dl, 1e-6), 0.0)
    edge = jnp.where(~jnp.isfinite(a) & jnp.isfinite(b), first,
                     jnp.where(jnp.isfinite(a) & ~jnp.isfinite(b),
                               last, 0.0))
    return jnp.where(valid, interp, edge)


def _channel_tracks(sig: jnp.ndarray, fs_d: float, n_frames: int,
                    stride: int) -> jnp.ndarray:
    """Four event-interval f0 tracks for one filtered channel -> [4, N].

    Scatter-AND-gather-free formulation: instead of compacting event times
    into a dense list (scatter) and interpolating (searchsorted), top-2
    combines give every FRAME the last two event times before it and the
    next two at-or-after it (frame i sits at cell i*stride exactly, so no
    gathers — the 16 frame-indexed gathers this replaces were 107 ms/call
    at batch 128 on v5e, the single largest cost in the convert graph).
    Because frames only read at stride boundaries, the scans run at BLOCK
    granularity: a per-block top-2 reduction over the stride cells feeds a
    block-level associative scan that is stride x shorter than the cell
    grid (8x for harvest, 20x for DIO) — exact, since combining sorted
    top-2 pairs is the same associative op, and the cells a frame never
    reads need no prefix of their own.  The cell-granular scans this
    replaces were 47% of the harvest call's device time and dominated its
    HBM slope (~30 [Td] temporaries/channel).  The frame's f0 is
    WORLD's interval contour: each interval's f0 value sits at the
    interval MIDPOINT and is linearly interpolated between midpoints
    (matlab interp1 semantics with edge hold — the same contour the
    float64 oracle builds by scatter+interp, tests/oracle/dio.py);
    piecewise-constant interval reads were tried first and made the 4
    estimators disagree near event boundaries, flickering voicing on
    borderline signals.
    """
    d = sig[1:] - sig[:-1]

    def crossings(s, offset):
        m = (s[:-1] > 0) & (s[1:] <= 0)
        frac = jnp.where(m, s[:-1] / jnp.where(m, s[:-1] - s[1:], 1.0), 0.0)
        tpos = jnp.arange(s.shape[0] - 1, dtype=jnp.float32) + frac + offset
        ncells = s.shape[0] - 1
        nb = -(-ncells // stride)
        # an event in cell n has time in [n, n+1): cells <= i*stride-1 are
        # strictly before frame i, cells >= i*stride at-or-after — so frame
        # i reads the prefix of blocks 0..i-1 (exclusive: frame 0 sees
        # none, else a frame sharing a cell with an event reads it as both
        # neighbors, a == b -> spuriously invalid) and the suffix from
        # block i (inclusive)
        p1, p2 = _block_top2(jnp.where(m, tpos, -jnp.inf), stride, nb, True)
        s1, s2 = _block_top2(jnp.where(m, tpos, jnp.inf), stride, nb, False)
        return _tracks_from_pairs(p1, p2, s1, s2, fs_d, n_frames,
                                  stride, ncells)

    # The sign convention folds into the data (negation is exact, and
    # frac = s0/(s0-s1) is negation-invariant bit for bit), so the four
    # event types are four calls on +-sig / +-d with identical math.  Two
    # formulations, bit-identical outputs, selected by TPUVC_EVENT_BATCH
    # for on-chip A/B (this function already runs under a 152-channel
    # vmap, so "pair" nests a second batch axis through the block scans
    # while "per_type" keeps four single-batch graphs):
    #   per_type (default) — four separate crossings() calls, the
    #     round-3 formulation that measured 247x on the harvest path;
    #   pair — the types batch as TWO vectorized pairs (~4x fewer XLA
    #     kernels in a stage the traffic arithmetic calls kernel-count-
    #     bound), but jnp.stack([sig, -sig]) under the outer vmap
    #     materializes a second copy of the whole filtered bank and the
    #     extra scan batch axis measured SLOWER on chip (harvest xla
    #     0.839 s/call vs 0.518 round 3 — docs/PERFORMANCE.md round 4).
    # The zero-crossing rows (ncells = T-1) and derivative rows (ncells =
    # T-2) keep their OWN cell counts in both: a single 4-row stack needs
    # the derivative rows padded by one cell, which shifts n_read/nb at
    # hop-multiple lengths and changes the LAST frame's prefix read —
    # caught in review as a >1 kHz edge-track deviation vs per-type.
    if os.environ.get("TPUVC_EVENT_BATCH", "per_type") == "pair":
        zc = jax.vmap(lambda s: crossings(s, 0.0))(jnp.stack([sig, -sig]))
        pd = jax.vmap(lambda s: crossings(s, 0.5))(jnp.stack([d, -d]))
        return jnp.concatenate([zc, pd])
    return jnp.stack([
        crossings(sig, 0.0),   # negative-going zero crossings
        crossings(-sig, 0.0),  # positive-going zero crossings
        crossings(d, 0.5),     # peaks (maxima of sig)
        crossings(-d, 0.5),    # dips (minima of sig)
    ])


def _bank_tracks(filtered: jnp.ndarray, fs_d: float, n_frames: int,
                 stride: int) -> jnp.ndarray:
    """Event-interval f0 tracks for a whole channel bank: [C, Td] -> [C, 4, N].

    With TPUVC_EVENTS=pallas the per-cell event stage (crossing masks,
    interpolation fractions, per-block top-2 for all four event types)
    runs as ONE fused kernel over the bank (ops/pallas_events.py; reads
    the [C, Td] cell grid once instead of ~30-40 XLA passes), and only
    the stride-x-smaller block scans + frame interpolation remain here;
    the default XLA path vmaps the per-channel formulation.  Outputs
    are bit-identical between the two (tests/test_events.py).
    """
    from tpuvc.ops.pallas_events import (event_block_pairs, events_impl,
                                         scan_impl, top2_block_scans)
    from tpuvc.ops.pallas_window import use_pallas
    if events_impl() != "pallas":
        return jax.vmap(
            lambda s: _channel_tracks(s, fs_d, n_frames, stride))(filtered)
    t = filtered.shape[-1]
    interp = not use_pallas()
    pairs = event_block_pairs(filtered, stride,
                              interpret=interp)             # [C, 16, nbp]
    # the 8 block-level prefix/suffix top-2 scans: either fused in VMEM
    # (one HBM pass over the pairs) or the per-type lax.cummax ladders
    # below (O(log nb) HBM passes each) — bit-identical outputs
    scanned = scan_impl() == "pallas"
    if scanned:
        pairs = top2_block_scans(pairs, interpret=interp)
    nb_zc = -(-(t - 1) // stride)
    nb_pd = -(-(t - 2) // stride)

    def one(pr):
        rows = []
        for ti, (nc, nb) in enumerate(((t - 1, nb_zc), (t - 1, nb_zc),
                                       (t - 2, nb_pd), (t - 2, nb_pd))):
            rows.append(_tracks_from_pairs(
                pr[4 * ti, :nb], pr[4 * ti + 1, :nb],
                pr[4 * ti + 2, :nb], pr[4 * ti + 3, :nb],
                fs_d, n_frames, stride, nc, pre_scanned=scanned))
        return jnp.stack(rows)

    return jax.vmap(one)(pairs)


def _fix_step_remove_jumps(f0: jnp.ndarray, allowed: float) -> jnp.ndarray:
    prev = jnp.concatenate([f0[:1], f0[:-1]])
    rel = jnp.abs(f0 - prev) / jnp.maximum(f0, 1e-6)
    return jnp.where((prev > 0) & (rel > allowed), 0.0, f0)


def _fix_step_remove_short_runs(f0: jnp.ndarray, min_len: int) -> jnp.ndarray:
    """Zero voiced runs shorter than min_len frames.

    A frame survives iff it sits inside >= min_len consecutive voiced
    frames, i.e. some length-min_len all-voiced window contains it —
    morphological opening.  Both passes are integer-cumsum window sums
    (EXACT): erode[j] = 1 iff v[j..j+m-1] all voiced; keep[i] = any
    erode[j], j in [i-m+1, i].  Replaces the round-1 segment_sum +
    double-gather formulation — scatter/gather are the slow path on TPU
    (CLAUDE.md), and this is pure shifts + cumsums.
    """
    m = min_len
    if m > f0.shape[0]:          # no window fits: every run is short
        return jnp.zeros_like(f0)
    v = (f0 > 0).astype(jnp.int32)
    cs = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(v)])
    erode = (cs[m:] - cs[:-m] == m).astype(jnp.int32)   # [n-m+1]
    # dilate back: keep[i] = any erode[j], j in [i-m+1, i] — pad so the
    # window is a STATIC cumsum-difference slice (no gathers)
    ep = jnp.pad(erode, (m - 1, m - 1))
    ce = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(ep)])
    keep = (ce[m:] - ce[:-m]) > 0                        # [n]
    return jnp.where(keep, f0, 0.0)


def _extend_scan(f0: jnp.ndarray, cands: jnp.ndarray,
                 allowed: float) -> jnp.ndarray:
    """Extend voiced segments into unvoiced gaps using channel candidates."""

    def step(last, inp):
        f0_i, c_i = inp
        err = jnp.abs(c_i - last) / jnp.maximum(last, 1e-6)
        j = jnp.argmin(err)
        ok = (f0_i == 0) & (last > 0) & (err[j] < allowed)
        new = jnp.where(f0_i > 0, f0_i, jnp.where(ok, c_i[j], 0.0))
        return new, new

    _, out = jax.lax.scan(step, jnp.float32(0.0), (f0, cands))
    return out


@functools.partial(jax.jit, static_argnames=("fs", "hop", "f0_floor", "f0_ceil"))
def dio(x: jnp.ndarray, fs: int = DEFAULT_WORLD.fs,
        hop: int = DEFAULT_WORLD.hop,
        f0_floor: float = DEFAULT_WORLD.f0_floor,
        f0_ceil: float = DEFAULT_WORLD.f0_ceil) -> jnp.ndarray:
    """Estimate f0 for every frame of ``x``; 0 Hz marks unvoiced frames.

    Args: x [T] waveform at rate fs.  Returns [T//hop + 1] f0 in Hz.
    """
    x = x.astype(jnp.float32)
    n_frames = x.shape[0] // hop + 1

    ratio = max(1, min(12, int(fs / DIO_TARGET_FS)))
    while hop % ratio:
        ratio -= 1   # frames must land on decimated cells (strided reads)
    fs_d = fs / ratio
    y = filters.decimate(x, ratio)
    y = y - jnp.mean(y)

    filtered = filters.lowpass_bank_fft(
        y, fs_d, _boundary_f0s(f0_floor, f0_ceil))           # [C, Td]

    stride = hop // ratio                                    # decimated grid
    tracks = _bank_tracks(filtered, fs_d, n_frames, stride)
    # tracks: [C, 4, N]
    cand = jnp.mean(tracks, axis=1)                          # [C, N]
    dev = jnp.sqrt(jnp.sum((tracks - cand[:, None, :]) ** 2, axis=1) / 3.0)
    score = dev / jnp.maximum(cand, 1e-6)
    # a channel only proposes candidates inside its half-octave band
    # [boundary/2, boundary]: its low-pass keeps exactly one harmonic there,
    # so out-of-band means a consistent-but-wrong (e.g. 2x f0) reading
    # (WORLD's gate; oracle parity: tests/oracle/dio.py step 4)
    bf = jnp.asarray(_boundary_f0s(f0_floor, f0_ceil),
                     jnp.float32)[:, None]                   # [C, 1]
    in_range = ((cand >= f0_floor) & (cand <= f0_ceil)
                & (cand >= bf / 2.0) & (cand <= bf))
    score = jnp.where(in_range, score, jnp.inf)
    cand = jnp.where(in_range, cand, 0.0)  # gated candidates don't extend

    best = jnp.argmin(score, axis=0)                         # [N]
    best_cand = jnp.take_along_axis(cand, best[None, :], axis=0)[0]
    best_score = jnp.take_along_axis(score, best[None, :], axis=0)[0]
    f0 = jnp.where(best_score < DIO_SCORE_CUTOFF, best_cand, 0.0)

    # contour fixing (WORLD FixF0Contour steps, vectorized / scanned)
    cands_t = cand.T                                         # [N, C]
    f0 = _fix_step_remove_jumps(f0, DIO_ALLOWED_RANGE)
    f0 = _fix_step_remove_short_runs(f0, DIO_VOICE_RANGE_MINIMUM)
    f0 = _extend_scan(f0, cands_t, DIO_ALLOWED_RANGE)
    f0 = _extend_scan(f0[::-1], cands_t[::-1], DIO_ALLOWED_RANGE)[::-1]
    f0 = _fix_step_remove_short_runs(f0, DIO_VOICE_RANGE_MINIMUM)
    return f0


def dio_config(x: jnp.ndarray, cfg: WorldConfig = DEFAULT_WORLD) -> jnp.ndarray:
    return dio(x, fs=cfg.fs, hop=cfg.hop, f0_floor=cfg.f0_floor,
               f0_ceil=cfg.f0_ceil)
