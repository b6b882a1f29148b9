"""Fused event-stage kernel (ops/pallas_events.py) vs the XLA path.

The kernel must be BIT-identical to dio._channel_tracks' per-cell +
_block_top2 formulation: max/min top-2 accumulation is order-independent
in value, the interpolation fraction and cell times use the same
float32 arithmetic, and negation (the sign-convention fold) is exact.
Runs in interpreter mode on CPU (same harness as the harmonic kernel).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpuvc.dsp import dio
from tpuvc.ops.pallas_events import event_block_pairs


def _speechy(rng, t):
    n = np.arange(t) / 4000.0
    x = (np.sin(2 * np.pi * 170.0 * n)
         + 0.4 * np.sin(2 * np.pi * 340.0 * n + 0.7)
         + 0.05 * rng.standard_normal(t))
    return x.astype(np.float32)


def _xla_pairs(sig, stride):
    """Reference per-type block top-2 pairs via the XLA formulation."""
    d = sig[1:] - sig[:-1]
    outs = []
    for s, off in ((sig, 0.0), (-sig, 0.0), (d, 0.5), (-d, 0.5)):
        m = (s[:-1] > 0) & (s[1:] <= 0)
        frac = jnp.where(m, s[:-1] / jnp.where(m, s[:-1] - s[1:], 1.0), 0.0)
        tpos = (jnp.arange(s.shape[0] - 1, dtype=jnp.float32) + frac + off)
        ncells = s.shape[0] - 1
        nb = -(-ncells // stride)
        p1, p2 = dio._block_top2(jnp.where(m, tpos, -jnp.inf), stride, nb,
                                 True)
        s1, s2 = dio._block_top2(jnp.where(m, tpos, jnp.inf), stride, nb,
                                 False)
        outs.append((p1, p2, s1, s2))
    return outs


@pytest.mark.parametrize("stride,t", [(8, 3205), (20, 3205), (8, 512),
                                      (20, 161), (8, 4002)])
def test_kernel_pairs_bitexact(stride, t):
    rng = np.random.default_rng(t + stride)
    bank = np.stack([_speechy(rng, t) for _ in range(3)])
    got = np.asarray(event_block_pairs(jnp.asarray(bank), stride,
                                       interpret=True))
    for c in range(3):
        ref = _xla_pairs(jnp.asarray(bank[c]), stride)
        for ti, pairs in enumerate(ref):
            for pi, r in enumerate(pairs):
                r = np.asarray(r)
                g = got[c, 4 * ti + pi, : r.shape[0]]
                assert np.array_equal(g, r), (
                    f"type {ti} pair {pi} stride {stride} t {t}")


def test_kernel_pairs_exact_zero_ties():
    # exact-zero samples at cell boundaries create duplicate event times —
    # the multiplicity-exact path both formulations must agree on
    sig = np.ones(97, np.float32)
    sig[10] = 0.0
    sig[11:20] = -1.0
    sig[40] = 0.0
    sig[41] = 0.0
    sig[60:] = -np.ones(37, np.float32)
    got = np.asarray(event_block_pairs(jnp.asarray(sig[None]), 8,
                                       interpret=True))[0]
    ref = _xla_pairs(jnp.asarray(sig), 8)
    for ti, pairs in enumerate(ref):
        for pi, r in enumerate(pairs):
            r = np.asarray(r)
            assert np.array_equal(got[4 * ti + pi, : r.shape[0]], r)


@pytest.mark.parametrize("stride", [8, 20])
def test_bank_tracks_bitexact(stride, monkeypatch):
    rng = np.random.default_rng(7)
    t = 3205
    bank = jnp.asarray(np.stack([_speechy(rng, t) for _ in range(4)]))
    n_frames = t // stride + 1
    monkeypatch.setenv("TPUVC_EVENTS", "xla")
    ref = np.asarray(dio._bank_tracks(bank, 4000.0, n_frames, stride))
    monkeypatch.setenv("TPUVC_EVENTS", "pallas")
    got = np.asarray(dio._bank_tracks(bank, 4000.0, n_frames, stride))
    assert np.array_equal(got, ref)


def test_bank_tracks_vmapped(monkeypatch):
    # the convert graph runs dio/harvest under an utterance-batch vmap —
    # the kernel must survive batching (pallas adds a grid dim)
    rng = np.random.default_rng(3)
    t, stride = 1605, 8
    banks = jnp.asarray(
        np.stack([np.stack([_speechy(rng, t) for _ in range(3)])
                  for _ in range(2)]))
    n_frames = t // stride + 1
    fn = jax.vmap(lambda b: dio._bank_tracks(b, 4000.0, n_frames, stride))
    monkeypatch.setenv("TPUVC_EVENTS", "xla")
    ref = np.asarray(fn(banks))
    monkeypatch.setenv("TPUVC_EVENTS", "pallas")
    got = np.asarray(fn(banks))
    assert np.array_equal(got, ref)


def test_lane_tiling(monkeypatch):
    # force multiple lane tiles by a signal long enough that nb > 2048
    rng = np.random.default_rng(11)
    t, stride = 8 * 2048 * 2 + 515, 8          # nb = 4161 -> 3 tiles
    sig = jnp.asarray(_speechy(rng, t)[None])
    got = np.asarray(event_block_pairs(sig, stride, interpret=True))[0]
    ref = _xla_pairs(sig[0], stride)
    for ti, pairs in enumerate(ref):
        for pi, r in enumerate(pairs):
            r = np.asarray(r)
            assert np.array_equal(got[4 * ti + pi, : r.shape[0]], r)


@pytest.mark.parametrize("stride,t", [(8, 3205), (20, 3205),
                                      (8, 8 * 2048 + 515)])
def test_bank_tracks_fused_scan_bitexact(stride, t, monkeypatch):
    # the fused top2_block_scans kernel vs the lax.cummax ladders, end
    # to end through _bank_tracks (the last case pads nb past one lane
    # tile, exercising the cross-tile carry)
    rng = np.random.default_rng(stride + t)
    bank = jnp.asarray(np.stack([_speechy(rng, t) for _ in range(4)]))
    n_frames = t // stride + 1
    monkeypatch.setenv("TPUVC_EVENTS", "pallas")
    monkeypatch.setenv("TPUVC_SCAN", "xla")
    ref = np.asarray(dio._bank_tracks(bank, 4000.0, n_frames, stride))
    monkeypatch.setenv("TPUVC_SCAN", "pallas")
    got = np.asarray(dio._bank_tracks(bank, 4000.0, n_frames, stride))
    assert np.array_equal(got, ref)


def test_top2_block_scans_matches_xla_scans():
    # direct row-level identity on adversarial pair data: duplicate
    # times (multiplicity), all-fill blocks, fills interleaved
    from tpuvc.ops.pallas_events import top2_block_scans

    rng = np.random.default_rng(5)
    c, nb = 3, 256
    times = rng.uniform(0.0, 1e4, (c, 4, 2, nb)).astype(np.float32)
    times.sort(axis=2)
    # sorted pairs: p rows descending (max pair), s rows ascending
    empty = rng.random((c, 4, nb)) < 0.35
    half = rng.random((c, 4, nb)) < 0.25          # single-event blocks
    dup = rng.random((c, 4, nb)) < 0.2            # duplicate times
    pairs = np.empty((c, 16, nb), np.float32)
    for ti in range(4):
        hi, lo = times[:, ti, 1], times[:, ti, 0]
        hi2 = np.where(dup[:, ti], hi, lo)
        p1 = np.where(empty[:, ti], -np.inf, hi)
        p2 = np.where(empty[:, ti] | half[:, ti], -np.inf, hi2)
        s1 = np.where(empty[:, ti], np.inf, hi2)
        s2 = np.where(empty[:, ti] | half[:, ti], np.inf, hi)
        pairs[:, 4 * ti + 0] = p1
        pairs[:, 4 * ti + 1] = p2
        pairs[:, 4 * ti + 2] = np.minimum(s1, s2)
        pairs[:, 4 * ti + 3] = np.maximum(s1, s2)
    got = np.asarray(top2_block_scans(jnp.asarray(pairs), interpret=True))
    for ci in range(c):
        for ti in range(4):
            rp = dio._top2_max_scan((jnp.asarray(pairs[ci, 4 * ti]),
                                     jnp.asarray(pairs[ci, 4 * ti + 1])))
            rs = dio._top2_min_scan_rev(
                (jnp.asarray(pairs[ci, 4 * ti + 2]),
                 jnp.asarray(pairs[ci, 4 * ti + 3])))
            for pi, r in enumerate((*rp, *rs)):
                assert np.array_equal(got[ci, 4 * ti + pi], np.asarray(r)), \
                    (ci, ti, pi)
