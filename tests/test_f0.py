"""DIO + StoneMask correctness tests on signals with known f0."""

import numpy as np
import pytest

from tests.conftest import make_harmonic
from tpuvc.dsp.constants import DEFAULT_WORLD
from tpuvc.dsp.dio import dio_config
from tpuvc.dsp.stonemask import stonemask_config


def _mid(a, frac=0.25):
    n = len(a)
    return a[int(n * frac): int(n * (1 - frac))]


@pytest.mark.parametrize("f0", [110.0, 165.0, 220.0, 440.0])
def test_dio_constant_f0(f0):
    cfg = DEFAULT_WORLD
    x = make_harmonic(f0, fs=cfg.fs, dur_s=0.6, n_harm=6, noise=0.002)
    est = np.asarray(dio_config(x, cfg))
    mid = _mid(est)
    voiced = mid[mid > 0]
    assert len(voiced) > 0.8 * len(mid), "mid frames should be voiced"
    err = np.abs(voiced - f0) / f0
    assert np.median(err) < 0.03, f"median rel err {np.median(err):.3f}"


def test_dio_silence_and_noise_are_unvoiced():
    cfg = DEFAULT_WORLD
    rng = np.random.default_rng(0)
    sil = np.zeros(8000)
    est = np.asarray(dio_config(sil, cfg))
    assert np.all(est == 0.0)
    noise = 0.3 * rng.standard_normal(8000)
    est_n = np.asarray(dio_config(noise, cfg))
    assert np.mean(est_n > 0) < 0.3, "white noise should be mostly unvoiced"


def test_dio_voiced_unvoiced_transition():
    cfg = DEFAULT_WORLD
    f0 = 180.0
    x1 = make_harmonic(f0, fs=cfg.fs, dur_s=0.3, n_harm=6)
    rng = np.random.default_rng(1)
    x = np.concatenate([x1, 0.05 * rng.standard_normal(4800)])
    est = np.asarray(dio_config(x, cfg))
    n_voiced_frames = int(0.3 * cfg.fs / cfg.hop)
    head = est[6:n_voiced_frames - 6]
    tail = est[n_voiced_frames + 8:-4]
    assert np.mean(head > 0) > 0.7
    assert np.mean(np.abs(head[head > 0] - f0) / f0 < 0.05) > 0.8
    assert np.mean(tail > 0) < 0.4


@pytest.mark.parametrize("f0_true", [123.0, 217.0])
def test_stonemask_refines_toward_truth(f0_true):
    cfg = DEFAULT_WORLD
    x = make_harmonic(f0_true, fs=cfg.fs, dur_s=0.5, n_harm=6, noise=0.002)
    n = cfg.num_frames(len(x))
    # start from a deliberately coarse estimate (3% off)
    coarse = np.full(n, f0_true * 1.03, np.float32)
    refined = np.asarray(stonemask_config(x, coarse, cfg))
    mid = _mid(refined)
    err_ref = np.abs(mid - f0_true) / f0_true
    assert np.median(err_ref) < 0.01, f"median err {np.median(err_ref):.4f}"


def test_stonemask_keeps_unvoiced_zero():
    cfg = DEFAULT_WORLD
    rng = np.random.default_rng(2)
    x = 0.1 * rng.standard_normal(6000)
    n = cfg.num_frames(len(x))
    f0 = np.zeros(n, np.float32)
    out = np.asarray(stonemask_config(x, f0, cfg))
    assert np.all(out == 0.0)


# --- Harvest (SURVEY.md SS2.3 N1 alternative estimator) ---


@pytest.mark.parametrize("f0", [110.0, 165.0, 320.0])
def test_harvest_constant_f0(f0):
    from tpuvc.dsp.harvest import harvest_config
    cfg = DEFAULT_WORLD
    x = make_harmonic(f0, fs=cfg.fs, dur_s=0.6, n_harm=6, noise=0.002)
    est = np.asarray(harvest_config(x, cfg))
    mid = _mid(est)
    voiced = mid[mid > 0]
    assert len(voiced) > 0.9 * len(mid)
    err = np.abs(voiced - f0) / f0
    assert np.median(err) < 0.01, f"median rel err {np.median(err):.4f}"


def test_harvest_noise_robustness_beats_dio():
    """Harvest's selling point: candidate scoring keeps tracking under
    noise levels where plain zero-crossing estimation degrades."""
    from tpuvc.dsp.harvest import harvest_config
    cfg = DEFAULT_WORLD
    f0 = 220.0
    x = make_harmonic(f0, fs=cfg.fs, dur_s=0.6, n_harm=6, noise=0.15,
                      seed=5)
    est = np.asarray(harvest_config(x, cfg))
    mid = _mid(est)
    voiced = mid[mid > 0]
    assert len(voiced) > 0.9 * len(mid)
    err = np.abs(voiced - f0) / f0
    assert np.median(err) < 0.01


def test_harvest_silence_and_noise_unvoiced():
    from tpuvc.dsp.harvest import harvest_config
    cfg = DEFAULT_WORLD
    rng = np.random.default_rng(0)
    assert np.all(np.asarray(harvest_config(np.zeros(8000), cfg)) == 0.0)
    noise = 0.3 * rng.standard_normal(9600)
    est = np.asarray(harvest_config(noise, cfg))
    assert np.mean(est > 0) < 0.2, "white noise should be mostly unvoiced"


def test_harvest_tracks_vibrato():
    from tpuvc.dsp.harvest import harvest_config
    cfg = DEFAULT_WORLD
    fs = cfg.fs
    rng = np.random.default_rng(1)
    t = np.arange(int(0.8 * fs)) / fs
    inst = 180.0 * (1.0 + 0.05 * np.sin(2 * np.pi * 5.0 * t))
    ph = 2 * np.pi * np.cumsum(inst) / fs
    x = (np.sin(ph) + 0.3 * np.sin(2 * ph)
         + 0.01 * rng.standard_normal(t.size)).astype(np.float32)
    est = np.asarray(harvest_config(x, cfg))
    tt = np.arange(est.size) * cfg.hop / fs
    ref = 180.0 * (1.0 + 0.05 * np.sin(2 * np.pi * 5.0 * tt))
    mid_est, mid_ref = _mid(est, 0.1), _mid(ref, 0.1)
    m = mid_est > 0
    assert np.mean(m) > 0.95
    err = np.abs(mid_est[m] - mid_ref[m]) / mid_ref[m]
    assert np.median(err) < 0.01 and err.max() < 0.05


def test_harvest_short_signals_are_finite():
    from tpuvc.dsp.harvest import harvest_config
    cfg = DEFAULT_WORLD
    for n in (300, 1700):
        x = 0.3 * np.sin(2 * np.pi * 150.0
                         * np.arange(n) / cfg.fs).astype(np.float32)
        f0 = np.asarray(harvest_config(x, cfg))
        assert f0.shape == (n // cfg.hop + 1,)
        assert np.isfinite(f0).all()


@pytest.mark.parametrize("stride,ncells,n_frames", [
    (8, 999, 126),    # harvest grid, partial final block
    (8, 1000, 126),   # exact block boundary
    (20, 1599, 81),   # DIO grid (0.4 s fixture shapes)
    (20, 37, 5),      # fewer blocks than frames -> edge pad
    (3, 50, 30),      # frames past the signal end
])
def test_blocked_event_scans_match_bruteforce(stride, ncells, n_frames):
    """The block-granular top-2 scans must read, at every frame position,
    exactly what the cell-granular formulation read: prefix top-2 over
    cells <= i*stride-1 (clamped to the last in-range read position for
    frames past the signal end) and suffix top-2-min over cells >=
    min(i, nb-1)*stride.  Brute-force reference over random sparse event
    patterns, including empty and single-event cases."""
    import jax.numpy as jnp

    from tpuvc.dsp.dio import (_block_top2, _edge_pad, _top2_max_scan,
                               _top2_min_scan_rev)

    rng = np.random.default_rng(ncells * stride)
    for density in (0.0, 0.001, 0.02, 0.3):
        m = rng.random(ncells) < density
        if density == 0.001 and not m.any():
            m[ncells // 2] = True             # force the single-event case
        tpos = np.arange(ncells) + rng.random(ncells)

        nb = -(-ncells // stride)
        p1, p2 = _top2_max_scan(
            _block_top2(jnp.where(m, tpos, -np.inf).astype(jnp.float32),
                        stride, nb, True))
        s1, s2 = _top2_min_scan_rev(
            _block_top2(jnp.where(m, tpos, np.inf).astype(jnp.float32),
                        stride, nb, False))
        neg = jnp.full((1,), -jnp.inf, jnp.float32)
        n_read = ncells // stride + 1
        a = np.asarray(_edge_pad(jnp.concatenate([neg, p1])[:n_read],
                                 n_frames))
        a0 = np.asarray(_edge_pad(jnp.concatenate([neg, p2])[:n_read],
                                  n_frames))
        b = np.asarray(_edge_pad(s1, n_frames))
        b2 = np.asarray(_edge_pad(s2, n_frames))

        ev = np.where(m, tpos, np.nan)
        for i in range(n_frames):
            # prefix read position: cell i*stride-1, clamped in-range
            pc = min(i, n_read - 1) * stride - 1
            pre = np.sort(ev[: pc + 1][~np.isnan(ev[: pc + 1])])[::-1]
            ref_a = pre[0] if len(pre) > 0 else -np.inf
            ref_a0 = pre[1] if len(pre) > 1 else -np.inf
            # suffix read position: cell min(i, nb-1)*stride
            sc = min(i, nb - 1) * stride
            suf = np.sort(ev[sc:][~np.isnan(ev[sc:])])
            ref_b = suf[0] if len(suf) > 0 else np.inf
            ref_b2 = suf[1] if len(suf) > 1 else np.inf
            assert a[i] == np.float32(ref_a), (i, density, a[i], ref_a)
            assert a0[i] == np.float32(ref_a0), (i, density)
            assert b[i] == np.float32(ref_b), (i, density)
            assert b2[i] == np.float32(ref_b2), (i, density)


def test_harvest_channel_decim_accuracy():
    """The coarse 1/20-octave candidate bank (channel_decim=2, the
    harvest fast mode) must track the speech-shaped truth fixtures as
    well as the exact 1/40-octave WORLD layout: the +-20% IF refinement
    re-centers candidates, so the coarser proposals land on the same
    frequencies (VERDICT r3 item 1 coarsening evaluation)."""
    from tests.conftest import make_speech_like
    from tpuvc.dsp.constants import DEFAULT_WORLD
    from tpuvc.dsp.harvest import harvest

    step = DEFAULT_WORLD.hop * 1000 // DEFAULT_WORLD.fs  # ms per frame
    for kind in ("sweep", "vibrato", "transitions", "low_f0", "breathy"):
        x, f0_true_1ms, _ = make_speech_like(kind)
        truth = f0_true_1ms[::step]
        outs = {}
        for decim in (1, 2):
            est = np.asarray(harvest(np.asarray(x, np.float32),
                                     channel_decim=decim))
            n = min(len(est), len(truth))
            outs[decim] = est[:n]
        t = truth[: len(outs[1])]
        # accuracy vs TRUTH, per decim, on co-voiced frames
        errs = {}
        for decim, est in outs.items():
            both = (est > 0) & (t > 0)
            assert both.mean() > 0.6, (kind, decim, both.mean())
            errs[decim] = np.abs(est[both] - t[both]) / t[both]
            assert np.mean(errs[decim]) < 0.02, (kind, decim,
                                                 np.mean(errs[decim]))
        # the fast mode may not be meaningfully worse than exact
        assert np.mean(errs[2]) < np.mean(errs[1]) + 0.005, kind
        # and the two modes agree with each other directly
        e1, e2 = outs[1], outs[2]
        co = (e1 > 0) & (e2 > 0)
        agree = ((e1 > 0) == (e2 > 0)).mean()
        assert agree > 0.93, (kind, agree)
        rel = np.abs(e1[co] - e2[co]) / e1[co]
        assert np.mean(rel) < 0.01, (kind, np.mean(rel))


def test_edge_hold_duplicate_event_degeneracy():
    """Duplicate first/last event times (an exact-zero sample at a cell
    boundary emits two events with the same crossing time) must degrade
    the edge-hold f0 to unvoiced — NOT emit fs_d/1e-6 as a candidate
    (round-3 advisor finding).  The guard is folded into the arithmetic
    (fs_d*d/max(d^2,1e-6), no extra boolean conjuncts — the boolean form
    cost a 247x->157x fusion cliff on the harvest grid, bisected on chip;
    docs/PERFORMANCE.md round-4 item 7), so distinct events must still
    match fs_d/d to float32 rounding."""
    import jax.numpy as jnp

    from tpuvc.dsp.dio import _tracks_from_pairs

    stride, ncells, n_frames, fs_d = 8, 64, 9, 4000.0
    nb = ncells // stride

    def block_pairs(times):
        p1 = np.full(nb, -np.inf, np.float32)
        p2 = np.full(nb, -np.inf, np.float32)
        s1 = np.full(nb, np.inf, np.float32)
        s2 = np.full(nb, np.inf, np.float32)
        blocks = {}
        for t in times:
            blocks.setdefault(int(t) // stride, []).append(t)
        for k, ts in blocks.items():
            desc = sorted(ts, reverse=True)
            p1[k] = desc[0]
            p2[k] = desc[1] if len(desc) > 1 else -np.inf
            asc = sorted(ts)
            s1[k] = asc[0]
            s2[k] = asc[1] if len(asc) > 1 else np.inf
        return tuple(jnp.asarray(v) for v in (p1, p2, s1, s2))

    def track(times):
        p1, p2, s1, s2 = block_pairs(times)
        return np.asarray(_tracks_from_pairs(p1, p2, s1, s2, fs_d,
                                             n_frames, stride, ncells))

    # duplicate event times at both edges -> every frame unvoiced
    dup = track([40.0, 40.0])
    assert np.array_equal(dup, np.zeros(n_frames, np.float32)), dup

    # distinct events 16 cells apart -> fs_d/16 everywhere (edge hold on
    # both sides, midpoint interp between): the folded arithmetic must
    # reproduce the plain division to f32 rounding
    ok = track([24.0, 40.0])
    np.testing.assert_allclose(ok, np.full(n_frames, fs_d / 16.0),
                               rtol=2e-7)


def test_remove_short_runs_matches_run_semantics():
    """The cumsum morphological-opening formulation (round 5: replaces
    segment_sum + double gather — scatter/gather are the TPU slow path)
    is EXACT against a direct run-length reference, including m > n,
    m = 1, and all-voiced/all-unvoiced edges."""
    import jax.numpy as jnp

    from tpuvc.dsp.dio import _fix_step_remove_short_runs

    def ref(f0, m):
        f0 = np.asarray(f0).copy()
        v = f0 > 0
        i, n = 0, len(f0)
        while i < n:
            if v[i]:
                j = i
                while j < n and v[j]:
                    j += 1
                if j - i < m:
                    f0[i:j] = 0.0
                i = j
            else:
                i += 1
        return f0

    rng = np.random.default_rng(0)
    for trial in range(120):
        n = int(rng.integers(5, 60))
        m = int(rng.integers(1, 14))
        f0 = np.where(rng.random(n) < 0.5,
                      rng.uniform(50, 500, n), 0.0).astype(np.float32)
        got = np.asarray(_fix_step_remove_short_runs(jnp.asarray(f0), m))
        np.testing.assert_array_equal(got, ref(f0, m),
                                      err_msg=f"{trial} n={n} m={m}")
    for edge in (np.zeros(10, np.float32), np.full(10, 100.0, np.float32)):
        got = np.asarray(_fix_step_remove_short_runs(jnp.asarray(edge), 9))
        np.testing.assert_array_equal(got, ref(edge, 9))


def test_blocked_contour_recurrences_match_flat_scans():
    """The blocked _ffill (bitwise) and blocked _biquad (<=1e-5 rel —
    the linear state decomposition reassociates f32 adds) match flat
    sequential references at block-boundary-straddling sizes (round 5:
    a flat 4000-step lax.scan is the hv_contour bottleneck)."""
    import jax.numpy as jnp

    import tpuvc.dsp.harvest as hv

    def ffill_ref(v, m):
        out = np.empty_like(v)
        c = v[0]
        for i in range(len(v)):
            if m[i]:
                c = v[i]
            out[i] = c
        return out

    def biquad_ref(v):
        b0, b1, b2 = hv.HARVEST_SMOOTH_B
        a1, a2 = hv.HARVEST_SMOOTH_A1, hv.HARVEST_SMOOTH_A2
        x1 = x2 = y1 = y2 = np.float32(v[0])
        out = np.empty_like(v)
        for i, xi in enumerate(v):
            yi = np.float32(b0 * xi + b1 * x1 + b2 * x2
                            - a1 * y1 - a2 * y2)
            out[i] = yi
            x2, x1, y2, y1 = x1, xi, y1, yi
        return out

    rng = np.random.default_rng(1)
    for n in (5, 127, 128, 129, 1000, 4001):
        v = rng.uniform(60, 400, n).astype(np.float32)
        m = rng.random(n) < 0.4
        got = np.asarray(hv._ffill(jnp.asarray(v), jnp.asarray(m)))
        np.testing.assert_array_equal(got, ffill_ref(v, m),
                                      err_msg=f"ffill n={n}")
        gb = np.asarray(hv._biquad(jnp.asarray(v)))
        rb = biquad_ref(v)
        rel = np.abs(gb - rb) / np.maximum(np.abs(rb), 1e-6)
        assert rel.max() < 1e-5, (n, rel.max())
    # mask never true / first-element semantics
    v = rng.uniform(60, 400, 50).astype(np.float32)
    none = np.zeros(50, bool)
    got = np.asarray(hv._ffill(jnp.asarray(v), jnp.asarray(none)))
    np.testing.assert_array_equal(got, np.full(50, v[0]))


def test_blocked_fix_step1_matches_flat_scan():
    """The two-scenario blocked _fix_step1_scan is bitwise-identical to
    the flat sequential recurrence (the carry is always 0 or the
    previous input frame, so both block carry-in scenarios are known up
    front), across block-boundary jump patterns and lengths around the
    block size."""
    import jax.numpy as jnp

    from tpuvc.dsp import harvest as hv

    def flat_ref(f0, allowed):
        prev = np.float32(0.0)
        out = np.empty_like(f0)
        for i, cur in enumerate(f0):
            bad = (cur > 0.0 and prev > 0.0
                   and abs(cur - prev) > allowed * max(cur, 1e-12))
            out[i] = 0.0 if bad else cur
            prev = out[i]
        return out

    rng = np.random.default_rng(7)
    allowed = float(hv.HARVEST_STEP1_ALLOWED)
    for n in (5, 127, 128, 129, 1000, 4001):
        # mixture: smooth runs, octave jumps (zeroed by the rule), and
        # unvoiced gaps — jumps land on and around block boundaries too
        f0 = rng.uniform(80, 200, n).astype(np.float32)
        f0 = np.where(rng.random(n) < 0.3, 0.0, f0)
        jumps = rng.random(n) < 0.15
        f0 = np.where(jumps, f0 * 2.2, f0).astype(np.float32)
        for b in range(hv._CONTOUR_BLOCK - 1, n, hv._CONTOUR_BLOCK):
            f0[b] = f0[b - 1] * 2.5 if b % 2 else 0.0
        got = np.asarray(hv._fix_step1_scan(jnp.asarray(f0), allowed))
        np.testing.assert_array_equal(got, flat_ref(f0, allowed),
                                      err_msg=f"n={n}")


def test_decimate_fold_identity():
    """The half-length spectral-fold decimate == the full-length
    irfft-then-subsample formulation (exact identity: the low-pass gain
    zeroes every alias image), on divisible AND remainder lengths."""
    import jax.numpy as jnp

    from tpuvc.dsp import filters

    def direct(x, ratio):
        n = x.shape[-1]
        spec = jnp.fft.rfft(x, axis=-1)
        freqs = jnp.fft.rfftfreq(n)
        lo, hi = 0.9 * 0.45 / ratio, 0.45 / ratio
        gain = jnp.clip((hi - freqs) / (hi - lo), 0.0, 1.0)
        gain = 0.5 - 0.5 * jnp.cos(jnp.pi * gain)
        return jnp.fft.irfft(spec * gain, n=n, axis=-1)[..., ::ratio]

    rng = np.random.default_rng(3)
    for n, ratio in ((4000, 2), (4000, 4), (4001, 4), (1500, 3),
                     (999, 2)):
        x = jnp.asarray(rng.standard_normal((2, n)), jnp.float32)
        got = np.asarray(filters.decimate(x, ratio))
        ref = np.asarray(direct(x, ratio))
        assert got.shape == ref.shape, (n, ratio)
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5,
                                   err_msg=f"n={n} ratio={ratio}")
