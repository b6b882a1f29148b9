"""Pallas TPU kernel: fused pitch-adaptive harmonic DFT evaluation.

The instantaneous-frequency refinement shared by StoneMask and Harvest
(dsp/stonemask.py, dsp/harvest.py — SURVEY.md SS2.3 N1) evaluates, per
frame and candidate f0: a Blackman window over +-1.5 periods, its
discrete-derivative window, and the windowed signal's DFT at the first
H=6 harmonic frequencies (4 reductions per harmonic: Re/Im of spectrum
and derivative spectrum), plus the windowed energy.

Why a kernel: in XLA the 24 reduction outputs cannot live in one fusion —
the compiler materializes the four [N, W] operands (windowed signal,
derivative product, cos/sin recurrence state) behind an
optimization_barrier and re-reads them for every harmonic's reduce fusion
(~6x HBM round trips per pass; the round-3 roofline put Harvest's
refinement at 47% of the whole call and StoneMask's two passes at
~26 ms/call, both bandwidth-bound on exactly this re-read traffic).
Here one VMEM-resident program reads each frame tile ONCE, computes
window + trig + all reductions in registers/VMEM, and writes only the
[T, K*H] results — HBM traffic drops from ~10 passes over [N, W] to one.

Harvest refines K=10 merged candidate slots per frame but most slots are
empty (regions are capped at K; typical voiced frames carry 1-4).  The
kernel skips a slot for a whole frame tile via lax.cond when NO row in
the tile has a candidate there — a data-adaptive K that preserves
exactness (unlike top-k pre-ranking, every real candidate is refined).

Falls back to the XLA formulation off-TPU; tests run the kernel in
interpreter mode and check equivalence (tests/test_ops.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuvc.ops.pallas_window import use_pallas

_TILE = 32   # frames per program: [32, 1024] f32 seg = 128 KB; ~14 live
#   [T, W] temps per candidate slot ~ 1.8 MB VMEM — comfortably resident.
#   Round-5: tile=128 (via this constant) in the FULL harvest pipeline
#   measured 303x vs 351x at tile=32 — denser real candidate columns
#   defeat the coarser skip_empty granularity — so 32 stays.


def harmonics_impl() -> str:
    """Which implementation the IF-refinement call sites should use.

    Default "pallas" ON TPU — measured winner on the v5e (2026-08-18
    campaign): StoneMask stage 19.79 ms/call vs 25.83 XLA at batch
    128 x 4 s, and the harvest refinement rows moved the same way
    (docs/PERFORMANCE.md round-4).  Off-TPU the default stays "xla"
    (the kernel only runs in interpreter mode there — correct but
    slow, for tests).  TPUVC_HARMONICS=xla|pallas overrides either
    way (the stage A/B switch used by scripts/bench_harmonics.py).

    NOTE: call sites read this at TRACE time inside jitted functions
    whose caches key on shapes/static args only — changing the env var
    after a stonemask/harvest call with the same shapes returns the
    CACHED trace.  Set the env before the process's first call and run
    one process per impl for A/Bs (scripts/bench_harmonics.py does).
    """
    import os
    forced = os.environ.get("TPUVC_HARMONICS")
    if forced in ("xla", "pallas"):
        return forced   # honored verbatim (off-TPU pallas = interpreter)
    return "pallas" if use_pallas() else "xla"


def _widths(w: int) -> tuple[int, ...]:
    """Descending lane-multiple sub-widths of w for the adaptive-width
    switch (768 -> [768, 384, 256, 128]).  A slot whose widest candidate
    window half-length fits wb/2 - 2 runs on the centered [*, wb] slice
    of the VMEM tile: masked lanes are exact zeros, so narrowing changes
    only reduction-tree association (~1 ulp)."""
    out = [w]
    while out[-1] > 128:
        nxt = -(-(out[-1] // 2) // 128) * 128
        if nxt >= out[-1]:
            break
        out.append(nxt)
    return tuple(out)


def fold_floor(w: int, fs: float) -> float:
    """Lowest f0 whose window fits the folded half-width w//2: the fold
    drops the unpaired base=-w/2 column, exact iff
    floor(1.5*fs/f0 + 1) <= w//2 - 2 (round-5; see _slot_folded)."""
    return 1.5 * fs / (w // 2 - 3)


def _fold_eo(seg: jnp.ndarray) -> jnp.ndarray:
    """[.., W] frame-centered segments -> [.., W] (even | odd) halves.

    e[b] = seg[c+b] + seg[c-b] (b>=1), e[0] = seg[c];
    o[b] = seg[c+b] - seg[c-b], o[0] = 0; c = W//2, b in [0, c).
    The Blackman window and cos are EVEN in base = col - c, the
    derivative window and sin ODD, so every refinement reduction
    decomposes over (e, o) at HALF the lanes (round-5: the kernel is
    VPU-bound on per-lane trig+multiplies).  The unpaired base=-c
    column is dropped — exact for any candidate with
    floor(1.5*fs/f0+1) <= c-2 (callers clamp f0 >= fold_floor(W, fs);
    values for sub-floor rows are unspecified, matching the
    skip_empty contract)."""
    c = seg.shape[-1] // 2
    right = seg[..., c:]                      # seg[c + b]
    left = seg[..., 1:c + 1][..., ::-1]       # seg[c - b]
    e = right + left
    e = jnp.concatenate([0.5 * e[..., :1], e[..., 1:]], axis=-1)
    return jnp.concatenate([e, right - left], axis=-1)


def _slot_folded(e, o, b, f0, fs, n_harm, with_if, wh):
    """Folded-pass reductions for one candidate column (f0 [T, 1],
    pre-clamped >= fold_floor): e/o [T, wh] even/odd segment halves,
    b [1, wh] = 0..wh-1.  Matches _slot to reduction-order rounding."""
    half_len = jnp.floor(1.5 * fs / f0 + 1.0)
    mask = b <= half_len
    phase = (2.0 * jnp.pi / (3.0 * fs)) * f0 * b
    cp = jnp.cos(phase)
    sp = jnp.sin(phase)
    win = jnp.where(mask,
                    0.42 + 0.5 * cp + 0.08 * (2.0 * cp * cp - 1.0), 0.0)
    # the mask must hit the SEGMENT too: dwin is nonzero one sample
    # OUTSIDE the window boundary (win[hl] - 0 difference) and the
    # unfolded path kills that term through its masked seg copy
    em = jnp.where(mask, e, 0.0)
    om = jnp.where(mask, o, 0.0)
    we = em * win
    wo = om * win
    h0 = jnp.where(b == 0.0, 1.0, 0.5)
    en = jnp.sum(h0 * (we * we + wo * wo), axis=-1, keepdims=True)
    if with_if:
        col = jax.lax.broadcasted_iota(jnp.int32, win.shape, 1)
        edge = (col == 0) | (col >= wh - 1)
        dwin = jnp.where(edge, 0.0,
                         -0.5 * (pltpu.roll(win, wh - 1, axis=1)
                                 - pltpu.roll(win, 1, axis=1)))
        de = em * dwin
        do_ = om * dwin
    c1 = cp * (4.0 * cp * cp - 3.0)
    s1 = sp * (3.0 - 4.0 * sp * sp)
    ch, sh = c1, s1
    xre, xim, dre, dim_ = [], [], [], []
    for h in range(n_harm):
        if h:
            ch, sh = ch * c1 - sh * s1, sh * c1 + ch * s1
        xre.append(jnp.sum(we * ch, axis=-1, keepdims=True))
        xim.append(-jnp.sum(wo * sh, axis=-1, keepdims=True))
        if with_if:
            dre.append(jnp.sum(do_ * ch, axis=-1, keepdims=True))
            dim_.append(-jnp.sum(de * sh, axis=-1, keepdims=True))
    cat = lambda v: jnp.concatenate(v, axis=1)               # [T, H]
    if with_if:
        return cat(xre), cat(xim), cat(dre), cat(dim_), en
    z = jnp.zeros_like(xre[0])
    return cat(xre), cat(xim), z, z, en


def _slot(seg, base, f0, fs, n_harm, with_if, w):
    """All reductions for one candidate column: f0 [T, 1] > 0."""
    half_len = jnp.floor(1.5 * fs / f0 + 1.0)
    mask = jnp.abs(base) <= half_len
    phase = (2.0 * jnp.pi / (3.0 * fs)) * f0 * base
    cp = jnp.cos(phase)
    sp = jnp.sin(phase)
    win = jnp.where(mask,
                    0.42 + 0.5 * cp + 0.08 * (2.0 * cp * cp - 1.0), 0.0)
    segm = jnp.where(mask, seg, 0.0)
    xw = segm * win
    en = jnp.sum(xw * xw, axis=-1, keepdims=True)            # [T, 1]
    if with_if:
        # dwin[i] = -0.5 * (win[i+1] - win[i-1]), zero at both ends —
        # the ends are circular-roll wraparounds, masked off to match
        # the XLA path's zero padding (dsp/stonemask.py _refine_once)
        col = jax.lax.broadcasted_iota(jnp.int32, win.shape, 1)
        edge = (col == 0) | (col == w - 1)
        # pltpu.roll needs a non-negative shift: roll by w-1 == shift -1
        dwin = jnp.where(edge, 0.0,
                         -0.5 * (pltpu.roll(win, w - 1, axis=1)
                                 - pltpu.roll(win, 1, axis=1)))
        xd = segm * dwin
    # cos/sin(h * 3*phase) by triple angle + angle addition (all trig in
    # the pass derives from the one cp/sp pair — same recurrence as the
    # XLA path, so results match to reduction-order rounding)
    c1 = cp * (4.0 * cp * cp - 3.0)
    s1 = sp * (3.0 - 4.0 * sp * sp)
    ch, sh = c1, s1
    xre, xim, dre, dim_ = [], [], [], []
    for h in range(n_harm):
        if h:
            ch, sh = ch * c1 - sh * s1, sh * c1 + ch * s1
        xre.append(jnp.sum(xw * ch, axis=-1, keepdims=True))
        xim.append(-jnp.sum(xw * sh, axis=-1, keepdims=True))
        if with_if:
            dre.append(jnp.sum(xd * ch, axis=-1, keepdims=True))
            dim_.append(-jnp.sum(xd * sh, axis=-1, keepdims=True))
    cat = lambda v: jnp.concatenate(v, axis=1)               # [T, H]
    if with_if:
        return cat(xre), cat(xim), cat(dre), cat(dim_), en
    z = jnp.zeros_like(xre[0])
    return cat(xre), cat(xim), z, z, en


def _kernel(f0_ref, seg_ref, xre_ref, xim_ref, dre_ref, dim_ref, en_ref,
            *, fs: float, w: int, k_slots: int, n_harm: int,
            with_if: bool, skip_empty: bool, adaptive_width: bool,
            fold: bool):
    seg = seg_ref[:]
    h = n_harm
    if fold:
        # seg block = (even | odd) halves from _fold_eo; half the lanes
        wh = w // 2
        e_half = seg[:, :wh]
        o_half = seg[:, wh:]
        b_half = jax.lax.broadcasted_iota(
            jnp.int32, (1, wh), 1).astype(jnp.float32)
        c0 = fold_floor(w, fs)
    widths = _widths(w) if adaptive_width else (w,)
    # branch b computes on the CENTERED [T, wb] slice of the resident
    # tile — base = col - wb//2 aligns exactly with the wide tile's
    # base on those columns, and any lane the slot's windows can touch
    # is inside the slice by the branch-selection bound below
    branches = []
    for wb in widths:
        off = (w - wb) // 2
        colb = jax.lax.broadcasted_iota(jnp.int32, (1, wb), 1)
        baseb = (colb - wb // 2).astype(jnp.float32)

        def compute(f0c, _wb=wb, _off=off, _base=baseb):
            return _slot(seg[:, _off:_off + _wb], _base, f0c, fs,
                         n_harm, with_if, _wb)

        branches.append(compute)
    # max half-window any VALID candidate in this tile-slot needs;
    # fits width wb iff half_len <= wb/2 - 2 (the -2 keeps the
    # derivative window's [i-1, i+1] neighborhood inside the slice).
    # Rows with f0 <= 0 produce unspecified values either way (the
    # skip_empty contract), so they don't constrain the width.
    thrs = [wb / 2.0 - 2.0 for wb in widths[1:]]
    for k in range(k_slots):
        f0k = f0_ref[:, k: k + 1]                            # [T, 1]
        f0c = (jnp.maximum(f0k, c0) if fold
               else jnp.maximum(f0k, 1.0))

        def compute_adaptive(_):
            if fold:
                return _slot_folded(e_half, o_half, b_half, f0c, fs,
                                    n_harm, with_if, wh)
            if len(widths) == 1:
                return branches[0](f0c)
            hl = jnp.where(f0k > 0.0,
                           jnp.floor(1.5 * fs / f0c + 1.0), 0.0)
            hl_max = jnp.max(hl)
            idx = sum((hl_max <= t).astype(jnp.int32) for t in thrs)
            return jax.lax.switch(idx, branches, f0c)

        if skip_empty:
            t = seg.shape[0]

            def empty(_):
                zh = jnp.zeros((t, n_harm), jnp.float32)
                return zh, zh, (zh if with_if
                                else jnp.zeros((t, 1), jnp.float32)), \
                    (zh if with_if else jnp.zeros((t, 1), jnp.float32)), \
                    jnp.zeros((t, 1), jnp.float32)

            # slot k has no candidate anywhere in this tile (merged
            # regions fill slots in order, so high slots are usually
            # empty) -> skip the whole [T, W] pass for it
            xre, xim, dre, dim_, en = jax.lax.cond(
                jnp.any(f0k > 0.0), compute_adaptive, empty, 0)
        else:
            xre, xim, dre, dim_, en = compute_adaptive(0)
        xre_ref[:, k * h:(k + 1) * h] = xre
        xim_ref[:, k * h:(k + 1) * h] = xim
        if with_if:
            dre_ref[:, k * h:(k + 1) * h] = dre
            dim_ref[:, k * h:(k + 1) * h] = dim_
        en_ref[:, k: k + 1] = en
    if not with_if:
        # placeholder outputs (discarded by the wrapper): write anyway so
        # interpret mode never returns uninitialized memory
        dre_ref[:] = jnp.zeros_like(dre_ref)
        dim_ref[:] = jnp.zeros_like(dim_ref)


def refine_impl() -> str:
    """Which refine formulation harvest should use on top of the Pallas
    kernel: "split" = two harmonic_dft_pallas calls with the refinement
    glue in XLA between them (the round-4 shipped path), "merged" = one
    refine_score_pallas call computing both phases + glue in-kernel
    (round-5 candidate: folds the segments once instead of twice, reads
    the [N, W] seg array from HBM once instead of twice, and never
    materializes the 10x[N, K, H] intermediate reductions that the
    split path round-trips through HBM between its ~20 inter-pass XLA
    fusions).  TPUVC_REFINE overrides; default "split" until the
    in-pipeline chip A/B (scripts/bench_harvest.py, per the r5 rule:
    isolated wins don't transfer) picks a winner.  Same trace-time
    caveat as harmonics_impl()."""
    import os
    forced = os.environ.get("TPUVC_REFINE")
    if forced in ("split", "merged"):
        return forced
    return "split"


def _refine_math(dft, f0k, fs: float, floor: float, limit: float,
                 n_harm: int):
    """The refinement + scoring glue shared by both phases, expressed on
    a ``dft(f0, with_if)`` closure so the kernel (folded or unfolded)
    and interpreter paths reuse it.  Mirrors dsp/harvest.py
    _refine_and_score_fused's XLA glue line for line; f0k [T, 1] is the
    candidate slot column (<= 0 = empty)."""
    # integer iota + cast: Mosaic's tpu.iota only admits integer results
    # (a float arange fails kernel verification on-chip, 2026-08-19)
    hh = (jax.lax.broadcasted_iota(jnp.int32, (1, n_harm), 1)
          + 1).astype(jnp.float32)                            # [1, H]
    xre, xim, dre, dim_, _ = dft(f0k, True)
    f0c = jnp.maximum(f0k, floor)
    power = xre * xre + xim * xim + 1e-20
    amps = jnp.where(hh * f0c < fs / 2.0, jnp.sqrt(power), 0.0)
    ifs = hh * f0c + (xre * dim_ - xim * dre) / power * (
        fs / (2.0 * jnp.pi))
    num = jnp.sum(amps * ifs / hh, axis=-1, keepdims=True)
    den = jnp.sum(amps, axis=-1, keepdims=True)
    refined = jnp.where(den > 0.0, num / jnp.maximum(den, 1e-12), 0.0)
    # valid candidates are >= the search floor by the channel gate
    # (dsp/harvest.py _refine_and_score docstring), so gating on the
    # kernel input f0k == where(valid, max(cands, floor), 0) matches
    # gating on the raw cands for every row that can pass
    ok = ((f0k > 0.0) & (refined > 0.0)
          & (jnp.abs(refined - f0k) <= limit * jnp.maximum(f0k, 1e-12)))

    rf = jnp.where(ok, jnp.maximum(refined, floor), 0.0)
    xre2, xim2, _, _, energy = dft(rf, False)
    rfc = jnp.maximum(rf, floor)
    power2 = xre2 * xre2 + xim2 * xim2 + 1e-20
    amps2 = jnp.where(hh * rfc < fs / 2.0, jnp.sqrt(power2), 0.0)
    hw = jnp.floor(1.5 * fs / rfc + 1.0)
    winlen = 2.0 * hw + 1.0
    fft_size = jnp.exp2(2.0 + jnp.ceil(jnp.log2(winlen)))
    total = jnp.sqrt(fft_size * energy / 2.0 + 1e-30)
    a1 = amps2[:, 0:1]
    a2 = amps2[:, 1:2]
    score = (jnp.sum(amps2, axis=-1, keepdims=True) / total) * (
        a1 / (a1 + a2 + 1e-30))
    return jnp.where(ok, refined, 0.0), jnp.where(ok, score, 0.0)


def _refine_kernel(f0_ref, seg_ref, ref_ref, sc_ref, *, fs: float, w: int,
                   k_slots: int, n_harm: int, floor: float, limit: float,
                   skip_empty: bool, fold: bool):
    seg = seg_ref[:]
    if fold:
        wh = w // 2
        e_half = seg[:, :wh]
        o_half = seg[:, wh:]
        b_half = jax.lax.broadcasted_iota(
            jnp.int32, (1, wh), 1).astype(jnp.float32)
        c0 = fold_floor(w, fs)

        def dft(f0, with_if):
            return _slot_folded(e_half, o_half, b_half,
                                jnp.maximum(f0, c0), fs, n_harm,
                                with_if, wh)
    else:
        col = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
        base = (col - w // 2).astype(jnp.float32)

        def dft(f0, with_if):
            return _slot(seg, base, jnp.maximum(f0, 1.0), fs, n_harm,
                         with_if, w)

    t = seg.shape[0]
    for k in range(k_slots):
        f0k = f0_ref[:, k: k + 1]                             # [T, 1]

        def compute(_):
            return _refine_math(dft, f0k, fs, floor, limit, n_harm)

        if skip_empty:
            def empty(_):
                z = jnp.zeros((t, 1), jnp.float32)
                return z, z

            refined, score = jax.lax.cond(
                jnp.any(f0k > 0.0), compute, empty, 0)
        else:
            refined, score = compute(0)
        ref_ref[:, k: k + 1] = refined
        sc_ref[:, k: k + 1] = score


@functools.partial(jax.jit, static_argnames=("fs", "n_harm", "floor",
                                             "limit", "skip_empty",
                                             "interpret", "tile", "fold"))
def refine_score_pallas(seg: jnp.ndarray, f0: jnp.ndarray, fs: int,
                        floor: float, limit: float, n_harm: int = 6,
                        skip_empty: bool = True, interpret: bool = False,
                        tile: int = _TILE, fold: bool = True):
    """Both harvest refinement phases + glue in ONE kernel pass.

    seg [N, W] raw frame-centered samples, f0 [N, K] candidate slots
    (<= 0 = empty).  Returns (refined [N, K], score [N, K]) — exactly
    dsp/harvest.py _refine_and_score_fused's outputs, with the
    inter-pass refinement math computed in-kernel while the frame tile
    is VMEM-resident.  vs the split path: one fold + one HBM read of
    seg instead of two, half the grid dispatches, and no [N, K, H]
    intermediate round trips (the split path writes ~10 of them).
    Equivalence vs the split path is pinned in interpreter mode
    (tests/test_ops.py::test_refine_score_merged_matches_split)."""
    n, w = seg.shape
    k_slots = f0.shape[-1]
    pad = (-n) % tile
    seg = _fold_eo(seg.astype(jnp.float32)) if fold else seg
    seg_p = jnp.pad(seg.astype(jnp.float32), ((0, pad), (0, 0)))
    f0_p = jnp.pad(f0.astype(jnp.float32), ((0, pad), (0, 0)))
    np_ = n + pad
    refined, score = pl.pallas_call(
        functools.partial(_refine_kernel, fs=float(fs), w=w,
                          k_slots=k_slots, n_harm=n_harm,
                          floor=float(floor), limit=float(limit),
                          skip_empty=skip_empty, fold=fold),
        grid=(np_ // tile,),
        in_specs=[
            pl.BlockSpec((tile, k_slots), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile, k_slots), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, k_slots), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((np_, k_slots), jnp.float32),
            jax.ShapeDtypeStruct((np_, k_slots), jnp.float32),
        ],
        interpret=interpret,
    )(f0_p, seg_p)
    return refined[:n], score[:n]


@functools.partial(jax.jit, static_argnames=("fs", "n_harm", "with_if",
                                             "skip_empty", "interpret",
                                             "adaptive_width", "tile",
                                             "fold"))
def harmonic_dft_pallas(seg: jnp.ndarray, f0: jnp.ndarray, fs: int,
                        n_harm: int = 6, with_if: bool = True,
                        skip_empty: bool = False, interpret: bool = False,
                        adaptive_width: bool = False, tile: int = _TILE,
                        fold: bool = True):
    """Fused windowed harmonic DFT for all frames and candidate slots.

    seg [N, W] raw frame-centered samples (W a lane multiple); f0 [N, K]
    candidate frequencies (<= 0 marks an empty slot; computed values for
    empty slots are unspecified when ``skip_empty`` — mask downstream).
    Returns (x_re, x_im, d_re, d_im, energy): x_* [N, K, n_harm], energy
    [N, K].  d_* are zeros when ``with_if`` is False.

    ``adaptive_width``: per (tile, slot), a lax.switch runs the pass on
    the narrowest centered sub-width of the tile that contains every
    valid candidate's window (a 400 Hz candidate only lights ~120 of
    768 lanes).  Numerically identical up to reduction-tree
    association.  MEASURED-NEGATIVE OPT-IN (2026-08-19, chip): the
    isolated kernel is 15% faster (22.7 vs 26.8 ms on a plausible
    candidate grid), but the FULL harvest pipeline is slower in every
    variant tried — adaptive@tile32 341x (+ a pathological 537 s
    Mosaic compile), adaptive@tile128 303x, and per-width BUCKETS
    across separate kernel calls 258x, vs 351x for this fixed-width
    default (real merged-candidate columns are denser and less
    frequency-stable than the microbench grid; slot columns shift as
    channels churn, so narrowing rarely engages while the switch costs
    every tile-slot).  Kept as an opt-in with its measurements per the
    repo's experimental-residue convention.
    """
    if fold and adaptive_width:
        raise ValueError("fold and adaptive_width are mutually exclusive")
    n, w = seg.shape
    k_slots = f0.shape[-1]
    pad = (-n) % tile
    seg = _fold_eo(seg.astype(jnp.float32)) if fold else seg
    seg_p = jnp.pad(seg.astype(jnp.float32), ((0, pad), (0, 0)))
    f0_p = jnp.pad(f0.astype(jnp.float32), ((0, pad), (0, 0)))
    np_ = n + pad
    grid = (np_ // tile,)
    kh = k_slots * n_harm
    d_shape = (np_, kh) if with_if else (np_, 1)
    xre, xim, dre, dim_, en = pl.pallas_call(
        functools.partial(_kernel, fs=float(fs), w=w, k_slots=k_slots,
                          n_harm=n_harm, with_if=with_if,
                          skip_empty=skip_empty,
                          adaptive_width=adaptive_width, fold=fold),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, k_slots), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile, kh), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, kh), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d_shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d_shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, k_slots), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((np_, kh), jnp.float32),
            jax.ShapeDtypeStruct((np_, kh), jnp.float32),
            jax.ShapeDtypeStruct(d_shape, jnp.float32),
            jax.ShapeDtypeStruct(d_shape, jnp.float32),
            jax.ShapeDtypeStruct((np_, k_slots), jnp.float32),
        ],
        interpret=interpret,
    )(f0_p, seg_p)
    shp = (n, k_slots, n_harm)
    out_d = (dre[:n].reshape(shp), dim_[:n].reshape(shp)) if with_if \
        else (None, None)
    return (xre[:n].reshape(shp), xim[:n].reshape(shp), *out_d,
            en[:n])


