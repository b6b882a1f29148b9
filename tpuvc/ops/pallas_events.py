"""Pallas TPU kernel: fused per-cell event detection + per-block top-2.

The f0 event machinery (dsp/dio.py ``_channel_tracks`` — SURVEY.md SS2.3
N1, shared by DIO and Harvest) detects four event types per filtered
channel (zero crossings both directions, peaks, dips), each as: a
crossing mask over T-1 cells, a linear-interpolation fraction, a cell
time, and a per-block (``stride`` cells) sorted top-2 of the masked
event times in BOTH directions (largest pair feeds the prefix scan,
smallest pair the suffix scan).  In XLA that is ~30-40 elementwise /
reshape-reduce kernels over the [C, Td] cell grid per call — the
round-4 roofline put the stage (with the bank and contour) at 91% of
the harvest call, mostly per-kernel overhead and repeated HBM passes
over the 623 MB (batch 32) cell grid.

Here ONE kernel reads each channel's cells once in a [stride, nb]
transposed layout (sublane j = position in block, lane k = block id,
cell i = k*stride + j): neighbor cells come from two ``pltpu.roll``s
(+ a pre-shifted copy for the cross-block carry), the four event types
are computed in VMEM from the same tile (the derivative signal is
``next - cell``, negation folds the sign conventions into the data),
and the block top-2 pairs accumulate over the ``stride`` sublanes with
the same sorted-pair insert the block scans use — multiplicity-exact,
so the outputs are bit-identical to the XLA ``_block_top2`` path (the
block-level scans and the frame interpolation, which run on the
stride-x-smaller [*, nb] grid, stay in XLA).  HBM traffic for the
stage drops from ~30 passes over [C, Td] to one read of [C, Td] (x2
with the shifted copy) plus the 16 compact [C, nb] outputs.

Default ON TPU since the 2026-08-18 campaign measured it the winner
(harvest 0.7065 s/call vs 0.7595 per-type-XLA at equal harmonics impl;
main DIO bench 1302x vs 1277x — docs/PERFORMANCE.md round-4); off-TPU
the kernel runs in interpreter mode for the equivalence tests and the
default stays XLA.  TPUVC_EVENTS=xla|pallas overrides either way.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuvc.ops.pallas_window import use_pallas

_LANE_TILE = 2048   # blocks per program: (stride, 2048) f32 = 64-160 KB,
#   ~12 live temps -> well under VMEM for both the harvest (stride 8)
#   and DIO (stride 20) grids


def events_impl() -> str:
    """Which event-stage implementation the f0 call sites should use.

    Default "pallas" ON TPU (measured winner — module docstring has the
    2026-08-18 campaign numbers); "xla" off-TPU, where the kernel only
    runs in interpreter mode (correct but slow, for tests).
    TPUVC_EVENTS=xla|pallas overrides either way.  Same trace-time
    caveat as ops/pallas_harmonics.harmonics_impl: set the env var
    before the process's first dio/harvest call.
    """
    forced = os.environ.get("TPUVC_EVENTS")
    if forced in ("xla", "pallas"):
        return forced
    return "pallas" if use_pallas() else "xla"


def _insert_top2(vals: jnp.ndarray, largest: bool, stride: int):
    """(stride, L) masked event times -> sorted top-2 pair ((1, L), (1, L)).

    Sequential sorted-pair insert over the sublane rows — the same
    associative combine the block scans use with a singleton right
    operand, so the result multiset (with multiplicity, exact under
    ties) matches dsp/dio._block_top2's argmax-removal formulation
    value for value.
    """
    fill = -jnp.inf if largest else jnp.inf
    lt = vals.shape[1]
    m1 = jnp.full((1, lt), fill, jnp.float32)
    m2 = jnp.full((1, lt), fill, jnp.float32)
    for j in range(stride):
        v = vals[j: j + 1, :]
        if largest:
            m2 = jnp.maximum(m2, jnp.minimum(m1, v))
            m1 = jnp.maximum(m1, v)
        else:
            m2 = jnp.minimum(m2, jnp.maximum(m1, v))
            m1 = jnp.minimum(m1, v)
    return m1, m2


def _kernel(s_ref, sn_ref, out_ref, *, stride: int, lt: int,
            ncells_zc: int, ncells_pd: int):
    s = s_ref[:]                                   # (stride, lt)
    sn = sn_ref[:]                                 # next-block columns
    j = jax.lax.broadcasted_iota(jnp.int32, (stride, lt), 0)
    k = (jax.lax.broadcasted_iota(jnp.int32, (stride, lt), 1)
         + pl.program_id(1) * lt)
    i = k * stride + j                             # global cell index
    i_f = i.astype(jnp.float32)
    # cell i+1 / i+2 via sublane rolls; the block-boundary carry (rows
    # wrapping into the next block) reads the pre-shifted copy, so the
    # kernel never needs a cross-tile halo.  roll(x, sh)[j] = x[(j-sh)%n].
    r1s = pltpu.roll(s, stride - 1, axis=0)        # s[(j+1) % stride]
    r1n = pltpu.roll(sn, stride - 1, axis=0)
    s1v = jnp.where(j <= stride - 2, r1s, r1n)     # sig[i+1]
    r2s = pltpu.roll(s, stride - 2, axis=0)        # s[(j+2) % stride]
    r2n = pltpu.roll(sn, stride - 2, axis=0)
    s2v = jnp.where(j <= stride - 3, r2s, r2n)     # sig[i+2]
    d0 = s1v - s                                   # d[i] = sig[i+1]-sig[i]
    d1 = s2v - s1v                                 # d[i+1]
    row = 0
    for v0, v1, off, nc in ((s, s1v, 0.0, ncells_zc),
                            (-s, -s1v, 0.0, ncells_zc),
                            (d0, d1, 0.5, ncells_pd),
                            (-d0, -d1, 0.5, ncells_pd)):
        m = (v0 > 0.0) & (v1 <= 0.0) & (i < nc)
        frac = jnp.where(m, v0 / jnp.where(m, v0 - v1, 1.0), 0.0)
        tpos = i_f + frac + off
        p1, p2 = _insert_top2(jnp.where(m, tpos, -jnp.inf), True, stride)
        s1, s2 = _insert_top2(jnp.where(m, tpos, jnp.inf), False, stride)
        out_ref[row: row + 1, :] = p1
        out_ref[row + 1: row + 2, :] = p2
        out_ref[row + 2: row + 3, :] = s1
        out_ref[row + 3: row + 4, :] = s2
        row += 4


def scan_impl() -> str:
    """Which block-scan implementation dio._bank_tracks should stack on
    top of the event kernel: "xla" = the lax.cummax ladders
    (dio._top2_max_scan/_top2_min_scan_rev — 24 cumulative ops over the
    [C, nb] block grid, each an O(log nb) HBM round-trip ladder; the
    round-5 post-fold roofline put hv_event_tracks at 46 ms / 325 GB/s,
    ~15 GB of exactly this traffic), "pallas" = ONE top2_block_scans
    kernel pass computing all eight prefix/suffix top-2 scans with
    VMEM-resident Kogge-Stone levels (HBM traffic = one read + one
    write of the [C, 16, nb] pairs).  Bit-identical (selection ops are
    association-free; tests/test_events.py).  TPUVC_SCAN overrides.

    MEASURED-NEGATIVE OPT-IN (2026-08-19 chip A/B, back-to-back with a
    same-session baseline rep): harvest 334.4x (0.3828 s/call) vs the
    xla ladders' 371.1x (0.3449), main DIO bench 1309x vs 1333x — the
    fused kernel LOST in-pipeline on both f0 paths despite replacing
    the ladders' O(log nb) HBM round trips.  Attribution: the wrapper's
    negate+flip+interleave relayouts around the kernel (the suffix rows
    map onto the forward kernel by reversal) are cross-lane shuffles of
    the whole pairs array, and the extra materialization breaks XLA's
    fusion of the ladder levels into the downstream contour reads — the
    same relayout tax that killed the original pair-valued scans (round
    4).  Default stays "xla"; docs/PERFORMANCE.md r5 item 13.  Same
    trace-time caveat as events_impl()."""
    forced = os.environ.get("TPUVC_SCAN")
    if forced in ("xla", "pallas"):
        return forced
    return "xla"


_SCAN_LANE_TILE = 2048   # lanes per program: [16, 2048] f32 in + out +
#   ~8 live temps ~ 1.3 MB VMEM; the carry makes longer rows exact


def _kogge_cummax(x: jnp.ndarray, lt: int) -> jnp.ndarray:
    """In-VMEM prefix max over the lane axis (Kogge-Stone: log2(lt)
    roll+select+max levels).  max is associative and selection-only, so
    the result is bit-identical to any other cummax association."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    d = 1
    while d < lt:
        sh = jnp.where(lane < d, -jnp.inf, pltpu.roll(x, d, axis=1))
        x = jnp.maximum(x, sh)
        d *= 2
    return x


def _scan_kernel(in_ref, out_ref, carry_ref, *, lt: int):
    """Joint prefix top-2 scan of 8 (a1, a2) pair rows per grid row.

    in rows [0:8] = a1 (block max), [8:16] = a2 (block second); out rows
    [0:8] = running top-1, [8:16] = running top-2, via the same exact
    identity as dio._top2_max_scan: p2 = max(cummax(min(a1, pre)),
    cummax(a2)) with pre the lagged p1.  The carry scratch holds each
    row's (p1, p2) at the previous lane tile's end, so rows longer than
    one tile scan exactly (max over a prefix decomposes over tiles)."""

    @pl.when(pl.program_id(1) == 0)
    def _init():
        carry_ref[:] = jnp.full(carry_ref.shape, -jnp.inf, jnp.float32)

    a1 = in_ref[0:8, :]
    a2 = in_ref[8:16, :]
    c1 = carry_ref[0:8, 0:1]
    c2 = carry_ref[8:16, 0:1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, lt), 1)
    p1 = jnp.maximum(_kogge_cummax(a1, lt), c1)
    pre = jnp.where(lane < 1, c1, pltpu.roll(p1, 1, axis=1))
    both = jnp.concatenate([jnp.minimum(a1, pre), a2], axis=0)
    k2 = _kogge_cummax(both, lt)
    p2 = jnp.maximum(jnp.maximum(k2[0:8], k2[8:16]), c2)
    out_ref[0:8, :] = p1
    out_ref[8:16, :] = p2
    carry_ref[0:8, 0:1] = p1[:, lt - 1:lt]
    carry_ref[8:16, 0:1] = p2[:, lt - 1:lt]


@functools.partial(jax.jit, static_argnames=("interpret",))
def top2_block_scans(pairs: jnp.ndarray,
                     interpret: bool = False) -> jnp.ndarray:
    """All eight block-level top-2 scans of event_block_pairs' output in
    one kernel pass: pairs [C, 16, nb] -> same layout, rows 4t/4t+1 the
    PREFIX top-2 (largest, second) and rows 4t+2/4t+3 the SUFFIX
    bottom-2 of event type t — exactly dio._top2_max_scan /
    _top2_min_scan_rev applied per row (bit-identical: all combines are
    min/max selections).  The suffix rows map onto the forward-max
    kernel by negate+flip (exact, fills +inf -> -inf); trailing
    all-fill pad blocks are inert in both directions, so scanning the
    padded array then slicing per type equals slicing then scanning."""
    c, sixteen, nb = pairs.shape
    assert sixteen == 16, pairs.shape
    p_a1, p_a2 = pairs[:, 0::4], pairs[:, 1::4]            # [C, 4, nb]
    s_a1 = -jnp.flip(pairs[:, 2::4], axis=-1)
    s_a2 = -jnp.flip(pairs[:, 3::4], axis=-1)
    x = jnp.concatenate([p_a1, s_a1, p_a2, s_a2], axis=1)  # [C, 16, nb]
    lt = min(_SCAN_LANE_TILE, nb)
    assert nb % lt == 0, (nb, lt)   # event_block_pairs pads to lane tiles
    y = pl.pallas_call(
        functools.partial(_scan_kernel, lt=lt),
        grid=(c, nb // lt),
        in_specs=[pl.BlockSpec((None, 16, lt), lambda r, k: (r, 0, k),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((None, 16, lt), lambda r, k: (r, 0, k),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, 16, nb), jnp.float32),
        scratch_shapes=[pltpu.VMEM((16, 128), jnp.float32)],
        interpret=interpret,
    )(x)
    s1 = -jnp.flip(y[:, 4:8], axis=-1)
    s2 = -jnp.flip(y[:, 12:16], axis=-1)
    out = jnp.stack([y[:, 0:4], y[:, 8:12], s1, s2], axis=2)
    return out.reshape(c, 16, nb)                          # rows 4t+kind


@functools.partial(jax.jit, static_argnames=("stride", "interpret"))
def event_block_pairs(bank: jnp.ndarray, stride: int,
                      interpret: bool = False) -> jnp.ndarray:
    """All four event types' per-block top-2 pairs for a channel bank.

    bank [C, T] filtered signals; returns [C, 16, nb] where nb =
    ceil((T-1)/stride) rounded up to the lane tile, rows 4*t + {0: block
    max, 1: second max, 2: block min, 3: second min} of event type t in
    (zc-neg, zc-pos, peaks, dips) order.  Blocks past a type's own cell
    count (T-1 for the zero crossings, T-2 for the derivative types) are
    all-fill — slice to the type's nb before scanning (dio._bank_tracks
    does).
    """
    if stride < 3:
        raise ValueError(f"event kernel needs stride >= 3, got {stride}")
    c, t = bank.shape
    nb = -(-(t - 1) // stride)
    lt = min(_LANE_TILE, -(-nb // 128) * 128)
    nb_pad = -(-nb // lt) * lt
    tp = nb_pad * stride
    sp = jnp.pad(bank.astype(jnp.float32), ((0, 0), (0, tp - t)))
    st = sp.reshape(c, nb_pad, stride).transpose(0, 2, 1)   # [C, stride, nb]
    sn = jnp.pad(st[:, :, 1:], ((0, 0), (0, 0), (0, 1)))    # next column
    out = pl.pallas_call(
        functools.partial(_kernel, stride=stride, lt=lt,
                          ncells_zc=t - 1, ncells_pd=t - 2),
        grid=(c, nb_pad // lt),
        in_specs=[
            pl.BlockSpec((None, stride, lt), lambda r, k: (r, 0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, stride, lt), lambda r, k: (r, 0, k),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, 16, lt), lambda r, k: (r, 0, k),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, 16, nb_pad), jnp.float32),
        interpret=interpret,
    )(st, sn)
    return out
