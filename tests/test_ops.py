"""ops/ kernel formulation tests: framing, OLA, FFT smoothing."""

import numpy as np

from tpuvc.ops.framing import frame_signal


def _naive_frames(x, hop, window, n_frames):
    half = window // 2
    out = np.zeros((n_frames, window), np.float32)
    for i in range(n_frames):
        for j in range(window):
            k = i * hop - half + j
            if 0 <= k < len(x):
                out[i, j] = x[k]
    return out


def test_frame_signal_matches_naive():
    rng = np.random.default_rng(0)
    for hop, window, t in [(80, 1024, 2000), (80, 2048, 4001), (7, 32, 101)]:
        x = rng.standard_normal(t).astype(np.float32)
        n_frames = t // hop + 1
        got = np.asarray(frame_signal(x, hop, window, n_frames))
        want = _naive_frames(x, hop, window, n_frames)
        np.testing.assert_array_equal(got, want, err_msg=f"{hop},{window},{t}")


def test_fft_smoothing_matches_box_average():
    """FFT sinc-multiply smoothing == direct mirror-boundary box average."""
    import jax.numpy as jnp

    from tpuvc.dsp.spectral import linear_smoothing as _linear_smoothing

    fs, fft_size = 16000, 1024
    half = fft_size // 2 + 1
    df = fs / fft_size
    rng = np.random.default_rng(1)
    # smooth positive spectrum with a few bumps
    freq = np.arange(half) * df
    ps = (1.0 + np.sin(freq / 300.0) ** 2
          + 0.5 * np.exp(-((freq - 3000) / 400.0) ** 2)).astype(np.float32)
    ps = np.stack([ps, ps * (0.5 + 0.1 * rng.random(half)).astype(np.float32)])
    width = np.array([120.0, 333.0], np.float32)

    got = np.asarray(_linear_smoothing(jnp.asarray(ps), jnp.asarray(width),
                                       fs, fft_size))

    # direct box average on a fine grid with mirror extension
    for r in range(2):
        w = width[r]
        fine = np.linspace(-w, fs / 2 + w, 40000)
        # mirror map into [0, fs/2]
        fm = np.abs(fine)
        fm = np.where(fm > fs / 2, fs - fm, fm)
        vals = np.interp(fm, freq, ps[r])
        want = np.empty(half)
        for i, f in enumerate(freq):
            m = (fine >= f - w / 2) & (fine <= f + w / 2)
            want[i] = vals[m].mean()
        err_db = np.abs(10 * np.log10(got[r]) - 10 * np.log10(want))
        assert err_db.max() < 0.1, f"row {r}: max {err_db.max():.3f} dB"


def test_dft_identities():
    """Each ops/dft.py primitive == the jnp.fft identity its docstring
    claims, on random inputs at the shapes the frontend uses."""
    import jax.numpy as jnp

    from tpuvc.ops.dft import (cos_fwd, cos_inv, cos_inv2, irdft, rdft,
                               rdft_power)

    rng = np.random.default_rng(7)
    for fft_size in (256, 1024):
        half = fft_size // 2 + 1
        x = jnp.asarray(rng.standard_normal((5, half)), jnp.float32)
        ext = jnp.concatenate([x, x[:, -2:0:-1]], axis=-1)
        want_fwd = np.fft.rfft(np.asarray(ext), n=fft_size).real
        # float32 matmul accumulation over fft_size terms: ~5e-3 absolute
        # at unit-variance inputs (measured); a precision regression (e.g.
        # losing the float64->float32 theta bound) is orders above this
        np.testing.assert_allclose(np.asarray(cos_fwd(x)), want_fwd,
                                   rtol=1e-3, atol=2e-2)

        c = jnp.asarray(rng.standard_normal((5, half)), jnp.float32)
        want_inv = np.fft.irfft(np.asarray(c), n=fft_size)[:, :half]
        np.testing.assert_allclose(np.asarray(cos_inv(c)), want_inv,
                                   rtol=2e-4, atol=1e-5)

        b = jnp.asarray(rng.standard_normal((5, half)), jnp.float32)
        want_inv2 = np.fft.irfft(np.asarray(c) + 1j * np.asarray(b),
                                 n=fft_size)[:, :half]
        np.testing.assert_allclose(np.asarray(cos_inv2(c, b)), want_inv2,
                                   rtol=2e-4, atol=1e-5)

        want_full = np.fft.irfft(np.asarray(c) + 1j * np.asarray(b),
                                 n=fft_size)
        np.testing.assert_allclose(np.asarray(irdft(c, b, fft_size)),
                                   want_full, rtol=2e-4, atol=1e-5)

        # support <= fft_size (the rdft contract: shorter support is free
        # zero-padding); n_bins truncation exercised too
        for support, n_bins in [(fft_size, None), (fft_size * 2 // 3, half),
                                (fft_size // 2 + 9, 97)]:
            y = jnp.asarray(rng.standard_normal((5, support)), jnp.float32)
            want = np.fft.rfft(np.asarray(y), n=fft_size)
            nb = half if n_bins is None else n_bins
            re, im = rdft(y, fft_size, n_bins)
            np.testing.assert_allclose(np.asarray(re), want.real[:, :nb],
                                       rtol=1e-3, atol=2e-2)
            np.testing.assert_allclose(np.asarray(im), want.imag[:, :nb],
                                       rtol=1e-3, atol=2e-2)
            np.testing.assert_allclose(
                np.asarray(rdft_power(y, fft_size, n_bins)),
                np.abs(want[:, :nb]) ** 2, rtol=2e-3, atol=1.0)


def test_rdft_ct_identity_and_accuracy():
    """Two-stage Cooley-Tukey matmul DFT == rfft, at FFT-class accuracy
    (>= 5x lower error than the direct depth-n matmul on random input)."""
    import jax.numpy as jnp

    from tpuvc.ops.dft import rdft, rdft_ct

    rng = np.random.default_rng(11)
    for fft_size, support, n_bins in [(1024, 1024, 513), (1024, 385, 512),
                                      (256, 256, 129), (512, 300, 100)]:
        x = rng.standard_normal((6, support))
        want = np.fft.rfft(x, n=fft_size)[:, :n_bins]
        re, im = rdft_ct(jnp.asarray(x, jnp.float32), fft_size, n_bins)
        got = np.asarray(re, np.float64) + 1j * np.asarray(im, np.float64)
        err_ct = np.abs(got - want).max()
        assert err_ct < 2e-3, f"{fft_size},{support}: {err_ct}"
        if support == fft_size:
            re2, im2 = rdft(jnp.asarray(x, jnp.float32), fft_size, n_bins)
            got2 = np.asarray(re2, np.float64) + 1j * np.asarray(im2,
                                                                 np.float64)
            err_mm = np.abs(got2 - want).max()
            assert err_ct < err_mm / 5.0, (
                f"{fft_size}: ct {err_ct:.2e} vs direct {err_mm:.2e}")

    # the explicit n1 split override (used by scripts/bench_dft.py to A/B
    # factorizations against the shipped path) matches rfft too
    x = rng.standard_normal((4, 1024))
    want = np.fft.rfft(x)
    for n1 in (16, 64, 128):
        re, im = rdft_ct(jnp.asarray(x, jnp.float32), 1024, n1=n1)
        got = np.asarray(re, np.float64) + 1j * np.asarray(im, np.float64)
        assert np.abs(got - want).max() < 5e-3, n1


def test_dft_float64_precision():
    """Bound the float32-theta phase error of the on-device generated
    matrices against float64 references (ADVICE r2: theta reaches ~3e3 rad
    at the largest shapes; the drift was previously absorbed into
    regenerated goldens without an explicit bound)."""
    from tpuvc.ops.dft import _cos_fwd_mat, _irdft_mats, _rdft_mats

    fft_size = 1024
    half = fft_size // 2 + 1
    m64 = np.arange(half, dtype=np.float64)
    th64 = 2.0 * np.pi / fft_size * np.outer(m64, m64)
    w64 = np.full(half, 2.0); w64[0] = w64[-1] = 1.0

    got = np.asarray(_cos_fwd_mat(half), np.float64)
    want = w64[:, None] * np.cos(th64)
    # |d cos| <= |d theta| ~ 1e-4 rad at theta_max ~ 3.2e3 (x2 edge weight)
    assert np.abs(got - want).max() < 5e-4

    c, s = _rdft_mats(fft_size, fft_size, half)
    thr = 2.0 * np.pi / fft_size * np.outer(
        np.arange(fft_size, dtype=np.float64), m64)
    assert np.abs(np.asarray(c, np.float64) - np.cos(thr)).max() < 5e-4
    assert np.abs(np.asarray(s, np.float64) - np.sin(thr)).max() < 5e-4

    mc, ms = _irdft_mats(fft_size)
    thi = 2.0 * np.pi / fft_size * np.outer(
        m64, np.arange(fft_size, dtype=np.float64))
    assert np.abs(np.asarray(mc, np.float64) * fft_size
                  - w64[:, None] * np.cos(thi)).max() < 5e-4
    assert np.abs(np.asarray(ms, np.float64) * fft_size
                  + w64[:, None] * np.sin(thi)).max() < 5e-4


def test_smoothing_width_cap():
    """Widths above the static K bound must not deflate the spectrum
    (ADVICE r2 medium: width 960 on a constant spectrum returned 0.895).
    D4C's call site can produce widths up to max_refined_f0() = 1056 Hz."""
    import jax.numpy as jnp

    from tests.oracle.common import linear_smoothing as oracle_smooth
    from tpuvc.dsp.constants import max_refined_f0
    from tpuvc.dsp.spectral import linear_smoothing
    from tpuvc.ops.pallas_smooth import box_smooth_pallas

    assert max_refined_f0() == 800.0 * 1.2 * 1.1
    fs, fft_size = 16000, 1024
    half = fft_size // 2 + 1
    ones = jnp.ones((3, half), jnp.float32)
    width = jnp.asarray([860.0, 960.0, 1056.0], jnp.float32)

    # default cap: clamps (slightly narrower box), never deflates
    out = np.asarray(linear_smoothing(ones, width, fs, fft_size,
                                      floor_rel=None))
    np.testing.assert_allclose(out, 1.0, rtol=1e-5)
    out = np.asarray(box_smooth_pallas(ones, width, fs, fft_size, 810.0,
                                       interpret=True))
    np.testing.assert_allclose(out, 1.0, rtol=1e-5)

    # D4C's cap: true width used, matches the float64 oracle on a real
    # spectrum at width 960/1056
    rng = np.random.default_rng(5)
    ps = jnp.asarray(10.0 ** rng.uniform(-6, 0, (3, half)), jnp.float32)
    cap = float(max_refined_f0())
    got = np.asarray(linear_smoothing(ps, width, fs, fft_size,
                                      floor_rel=None, max_width_hz=cap))
    for r in range(3):
        o = oracle_smooth(np.asarray(ps[r], np.float64), float(width[r]),
                          fs, fft_size)
        np.testing.assert_allclose(got[r], o, rtol=1e-4, atol=1e-10)
    got_pl = np.asarray(box_smooth_pallas(ps, width, fs, fft_size, cap,
                                          interpret=True))
    np.testing.assert_allclose(got_pl, got, rtol=1e-5, atol=1e-12)


def test_mcd_properties():
    from tpuvc.utils.metrics import mcd
    rng = np.random.default_rng(0)
    sp = np.abs(rng.standard_normal((30, 513)).astype(np.float64)) + 0.1
    assert mcd(sp, sp, 16000) == 0.0
    # uniform gain lives in c0, which MCD excludes
    assert mcd(sp, sp * 10.0, 16000) < 1e-6
    # a real spectral difference registers
    sp2 = sp.copy()
    sp2[:, 100:200] *= 4.0
    assert mcd(sp, sp2, 16000) > 0.5


def test_pallas_box_smooth_matches_xla_path():
    """Pallas sliding box smoothing (interpreter mode) == XLA fallback ==
    the float64 oracle's rectangle rule."""
    import jax.numpy as jnp

    from tests.oracle.common import linear_smoothing as oracle_smooth
    from tpuvc.dsp.spectral import linear_smoothing
    from tpuvc.ops.pallas_smooth import box_smooth_pallas

    rng = np.random.default_rng(1)
    fs, fft_size, n = 16000, 1024, 37
    half = fft_size // 2 + 1
    ps = jnp.asarray(10.0 ** rng.uniform(-8, 0, (n, half)), jnp.float32)
    width = jnp.asarray(rng.uniform(60, 790, n), jnp.float32)
    ref = linear_smoothing(ps, width, fs, fft_size, floor_rel=None)
    out = box_smooth_pallas(ps, width, fs, fft_size, 810.0, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-12)
    # cross-check one frame against the float64 oracle formulation
    o = oracle_smooth(np.asarray(ps[0], np.float64), float(width[0]),
                      fs, fft_size)
    np.testing.assert_allclose(np.asarray(out[0]), o, rtol=1e-4, atol=1e-10)


def test_pallas_topk_sum_matches_lax_topk():
    """Iterated-max top-k-sum kernel (interpreter mode) == lax.top_k sum,
    exactly, including rows with duplicated values and ties."""
    import jax
    import jax.numpy as jnp

    from tpuvc.ops.pallas_topk import topk_sum_pallas

    rng = np.random.default_rng(3)
    ps = rng.uniform(0, 1, (50, 512)).astype(np.float32)
    ps[7, :100] = 0.5          # heavy ties
    ps[13] = 0.0               # all-equal row
    ps[21, ::2] = ps[21, 1::2]  # pairwise duplicates
    for kk in (1, 21, 512):
        ref = np.sum(np.asarray(jax.lax.top_k(jnp.asarray(ps), kk)[0]), -1)
        out = np.asarray(topk_sum_pallas(jnp.asarray(ps), kk,
                                         interpret=True))
        np.testing.assert_allclose(out, ref, rtol=1e-6)


def test_pallas_window_matches_xla_path():
    """Fused pallas windowing (interpreter mode on CPU) == XLA formulation."""
    import jax.numpy as jnp

    from tpuvc.dsp import cheaptrick as ct
    from tpuvc.ops.pallas_window import windowed_frames_pallas

    rng = np.random.default_rng(0)
    fs, window, hop = 16000, 1024, 80
    n = 21
    x = jnp.asarray(rng.standard_normal(n * hop + 1), jnp.float32)
    f0 = jnp.asarray(rng.uniform(80, 500, n), jnp.float32)
    seg_ref, wp_ref = ct._windowed_frames(x, f0, hop, fs, window)
    from tpuvc.ops.framing import frame_signal
    seg_raw = frame_signal(x, hop, window, n)
    seg_pl, wp_pl = windowed_frames_pallas(seg_raw, f0, fs, window,
                                           interpret=True)
    np.testing.assert_allclose(np.asarray(seg_pl), np.asarray(seg_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(wp_pl), np.asarray(wp_ref),
                               rtol=1e-5)


def test_pallas_conv_ln_lrelu_matches_flax():
    """Fused conv+LN+lrelu kernel (interpreter mode) == flax composition."""
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from tpuvc.ops.pallas_conv import conv_ln_lrelu

    rng = np.random.default_rng(0)
    for stride, l, cin, cout, k in [(3, 57, 16, 32, 7), (1, 19, 8, 16, 7),
                                    (3, 513, 1, 8, 7)]:
        x = jnp.asarray(rng.standard_normal((5, l, cin)), jnp.float32)
        w = jnp.asarray(0.2 * rng.standard_normal((k, cin, cout)),
                        jnp.float32)
        b = jnp.asarray(0.1 * rng.standard_normal(cout), jnp.float32)
        g = jnp.asarray(1 + 0.1 * rng.standard_normal(cout), jnp.float32)
        bt = jnp.asarray(0.1 * rng.standard_normal(cout), jnp.float32)

        ref = nn.Conv(cout, (k,), strides=(stride,), padding="SAME").apply(
            {"params": {"kernel": w, "bias": b}}, x)
        ref = nn.LayerNorm().apply({"params": {"scale": g, "bias": bt}}, ref)
        ref = nn.leaky_relu(ref, 0.2)

        got = conv_ln_lrelu(x, w, b, g, bt, stride, 0.2, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-5,
                                   err_msg=f"s={stride} l={l} c={cin}->{cout}")


def test_pallas_d2s_ln_lrelu_matches_flax():
    """Fused depth-to-space+LN+lrelu kernel (interpreter mode) == the
    decoder's reshape -> LayerNorm -> leaky_relu composition."""
    import jax.numpy as jnp
    from flax import linen as nn

    from tpuvc.ops.pallas_d2s import d2s_ln_lrelu

    rng = np.random.default_rng(0)
    for bsz, l, c, s in [(4, 57, 256, 3), (2, 19, 64, 3), (3, 171, 32, 3)]:
        x = jnp.asarray(rng.standard_normal((bsz, l, c * s)), jnp.float32)
        g = jnp.asarray(1 + 0.1 * rng.standard_normal(c), jnp.float32)
        b = jnp.asarray(0.1 * rng.standard_normal(c), jnp.float32)
        ref = x.reshape(bsz, l * s, c)
        ref = nn.LayerNorm(epsilon=1e-6).apply(
            {"params": {"scale": g, "bias": b}}, ref)
        ref = nn.leaky_relu(ref, 0.2)
        got = d2s_ln_lrelu(x, g, b, s, 0.2, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-5,
                                   err_msg=f"{bsz},{l},{c},{s}")


def test_pallas_harmonic_dft_matches_stonemask_refine():
    """One fused kernel pass (interpreter mode) == dsp/stonemask's XLA
    _refine_once on a harmonic signal (same trig recurrence; differences
    are reduction-order rounding)."""
    import jax.numpy as jnp

    from tests.conftest import make_harmonic
    from tpuvc.dsp.stonemask import (_FFT_SIZE, _refine_once,
                                     _refine_once_fused)
    from tpuvc.ops.framing import frame_signal

    fs, hop = 16000, 80
    x = jnp.asarray(make_harmonic(172.0, fs=fs, dur_s=0.4, n_harm=10,
                                  noise=0.005), jnp.float32)
    n = x.shape[0] // hop + 1
    # a DIO-like track: mostly near truth, some unvoiced-ish values
    f0 = jnp.asarray(np.where(np.arange(n) % 7 == 3, 0.0, 172.0)
                     + np.linspace(-2, 2, n), jnp.float32)
    f0 = jnp.maximum(f0, 0.0)
    seg = frame_signal(x, hop, _FFT_SIZE, n)
    ref = np.asarray(_refine_once(seg, f0, fs))
    got = np.asarray(_refine_once_fused(seg, f0, fs))
    np.testing.assert_allclose(got, ref, rtol=5e-4, atol=5e-2)


def test_pallas_harmonic_dft_matches_harvest_refine():
    """_refine_and_score_fused (kernel, interpreter mode) == the XLA
    _refine_and_score, including empty candidate slots (the kernel skips
    them per tile via lax.cond — results must still agree)."""
    import jax.numpy as jnp

    from tests.conftest import make_harmonic
    from tpuvc.dsp.constants import harvest_refine_window
    from tpuvc.dsp.harvest import (_K, _refine_and_score,
                                   _refine_and_score_fused)

    fs = 16000
    x = jnp.asarray(make_harmonic(150.0, fs=fs, dur_s=0.3, n_harm=10,
                                  noise=0.01), jnp.float32)
    n_1ms = x.shape[0] * 1000 // fs + 1
    win = harvest_refine_window(fs, 71.0)
    floor = 71.0 * 0.9
    # sparse candidate table: slot 0 near truth, slot 1 an octave error on
    # some frames, slots 2+ empty (the common shape after channel merge)
    rng = np.random.default_rng(0)
    cands = np.zeros((n_1ms, _K), np.float32)
    cands[:, 0] = 150.0 + rng.uniform(-4, 4, n_1ms)
    half = n_1ms // 2
    cands[:half, 1] = 300.0 + rng.uniform(-8, 8, half)
    cands[::9, 0] = 0.0                      # holes in slot 0 too
    cands = jnp.asarray(cands)

    r_ref, s_ref = _refine_and_score(x, cands, fs, fs // 1000, n_1ms,
                                     win, floor)
    r_got, s_got = _refine_and_score_fused(x, cands, fs, fs // 1000,
                                           n_1ms, win, floor)
    r_ref, s_ref, r_got, s_got = map(np.asarray,
                                     (r_ref, s_ref, r_got, s_got))
    # empty slots stay empty in both
    assert (r_got[:, 2:] == 0).all() and (s_got[:, 2:] == 0).all()
    np.testing.assert_allclose(r_got, r_ref, rtol=1e-3, atol=1e-2)
    np.testing.assert_allclose(s_got, s_ref, rtol=2e-2, atol=1e-3)


def test_refine_score_merged_matches_split():
    """_refine_and_score_merged (ONE kernel pass: both refinement phases
    + glue in-kernel) == _refine_and_score_fused (two kernel passes with
    the glue in XLA), interpreter mode, including empty slots, octave
    errors near the accept-gate boundary, and holes."""
    import jax.numpy as jnp

    from tests.conftest import make_harmonic
    from tpuvc.dsp.constants import harvest_refine_window
    from tpuvc.dsp.harvest import (_K, _refine_and_score_fused,
                                   _refine_and_score_merged)

    fs = 16000
    x = jnp.asarray(make_harmonic(150.0, fs=fs, dur_s=0.3, n_harm=10,
                                  noise=0.01), jnp.float32)
    n_1ms = x.shape[0] * 1000 // fs + 1
    win = harvest_refine_window(fs, 71.0)
    floor = 71.0 * 0.9
    rng = np.random.default_rng(1)
    cands = np.zeros((n_1ms, _K), np.float32)
    cands[:, 0] = 150.0 + rng.uniform(-4, 4, n_1ms)
    half = n_1ms // 2
    cands[:half, 1] = 300.0 + rng.uniform(-8, 8, half)   # octave errors
    cands[half:, 2] = 180.0                   # ~20% off: gate boundary
    cands[::9, 0] = 0.0                                  # holes
    cands = jnp.asarray(cands)

    args = (x, cands, fs, fs // 1000, n_1ms, win, floor)
    r_ref, s_ref = _refine_and_score_fused(*args)
    r_got, s_got = _refine_and_score_merged(*args)
    r_ref, s_ref, r_got, s_got = map(np.asarray,
                                     (r_ref, s_ref, r_got, s_got))
    assert (r_got[:, 3:] == 0).all() and (s_got[:, 3:] == 0).all()
    # the two paths run the same formulas on the same folded reductions;
    # only transcendental rounding inside the kernel can differ
    assert (r_got > 0).sum() > 0.5 * n_1ms   # the track actually refines
    np.testing.assert_allclose(r_got, r_ref, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(s_got, s_ref, rtol=1e-4, atol=1e-5)


def test_refine_score_pallas_unfolded_matches_folded():
    """refine_score_pallas fold=False == fold=True away from the fold
    floor (the merged kernel's A/B arm plumbing)."""
    import jax.numpy as jnp

    from tpuvc.ops.pallas_harmonics import refine_score_pallas

    fs = 16000
    rng = np.random.default_rng(2)
    n, w = 70, 768
    t = np.arange(w) / fs
    seg = np.stack([np.sin(2 * np.pi * (120 + 2 * i) * (t - t[w // 2]))
                    + 0.01 * rng.standard_normal(w) for i in range(n)])
    f0 = np.zeros((n, 4), np.float32)
    f0[:, 0] = 120 + 2 * np.arange(n)
    f0[::3, 1] = 240.0
    a = refine_score_pallas(jnp.asarray(seg, jnp.float32),
                            jnp.asarray(f0), fs, floor=64.0, limit=0.2,
                            interpret=True, fold=True)
    b = refine_score_pallas(jnp.asarray(seg, jnp.float32),
                            jnp.asarray(f0), fs, floor=64.0, limit=0.2,
                            interpret=True, fold=False)
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(a[1]), np.asarray(b[1]),
                               rtol=1e-3, atol=1e-5)


def test_denormalize_clips_out_of_range_decoder_output():
    """_denormalize_sp clips u to the Tanhize range unconditionally: an
    OOD decoder frame must never extrapolate log-SP past the corpus max
    (VERDICT r3 missing #2)."""
    import jax.numpy as jnp

    from tpuvc.convert.pipeline import _denormalize_sp, _normalize_sp

    xmin = jnp.full((8,), -6.0)
    xmax = jnp.full((8,), -1.0)
    en = jnp.ones((3, 1))
    wild = jnp.asarray([[-5.0] * 8, [5.0] * 8, [0.0] * 8])
    sp = _denormalize_sp(wild, en, xmin, xmax)
    sp_lo = _denormalize_sp(jnp.full((1, 8), -1.0), en[:1], xmin, xmax)
    sp_hi = _denormalize_sp(jnp.full((1, 8), 1.0), en[:1], xmin, xmax)
    assert np.allclose(np.asarray(sp[0]), np.asarray(sp_lo[0]))
    assert np.allclose(np.asarray(sp[1]), np.asarray(sp_hi[0]))
    assert float(sp.max()) <= float(sp_hi.max()) + 1e-6
    # round trip through normalize stays consistent
    u, en2 = _normalize_sp(sp_hi, xmin, xmax)
    assert np.all(np.asarray(u) <= 1.0 + 1e-6)


def test_sharpness_metrics_detect_oversmoothing():
    """GV ratio and high-band modulation-spectrum ratio (utils/metrics)
    must go strongly negative for time-smoothed envelopes and sit near
    0 dB for self-comparison (the axes the VAW-GAN critic targets —
    VERDICT r3 item 3)."""
    from tpuvc.utils.metrics import gv_ratio_db, ms_highband_ratio_db

    rng = np.random.default_rng(0)
    t, nb = 400, 513
    base = np.abs(rng.lognormal(mean=-2.0, sigma=1.0, size=(t, nb)))
    # "over-smoothed": heavy moving average along time
    k = 25
    kernel = np.ones(k) / k
    smooth = np.apply_along_axis(
        lambda v: np.convolve(v, kernel, mode="same"), 0, base)

    assert abs(gv_ratio_db(base, base, 16000)) < 1e-6
    assert abs(ms_highband_ratio_db(base, base, 16000)) < 1e-6
    assert gv_ratio_db(smooth, base, 16000) < -3.0
    assert ms_highband_ratio_db(smooth, base, 16000) < -6.0


def test_pallas_harmonic_dft_under_vmap():
    """The batched convert graph calls the fused refinement under
    jax.vmap: vmapped kernel results must equal per-row calls (vmap of
    pallas_call adds a grid dimension; the in-kernel cond must survive)."""
    import jax
    import jax.numpy as jnp

    from tpuvc.ops.pallas_harmonics import harmonic_dft_pallas

    rng = np.random.default_rng(1)
    b, n, w, k = 3, 40, 256, 4
    seg = jnp.asarray(rng.standard_normal((b, n, w)), jnp.float32)
    f0 = np.zeros((b, n, k), np.float32)
    f0[:, :, 0] = rng.uniform(100, 300, (b, n))
    f0[0, : n // 2, 1] = 200.0
    f0 = jnp.asarray(f0)

    fn = lambda s, f: harmonic_dft_pallas(s, f, 16000, with_if=True,
                                          skip_empty=True, interpret=True)
    vm = jax.vmap(fn)(seg, f0)
    for i in range(b):
        ref = fn(seg[i], f0[i])
        for a, r in zip(vm, ref):
            np.testing.assert_allclose(np.asarray(a[i]), np.asarray(r),
                                       rtol=1e-5, atol=1e-6)


def test_mcd_dtw_absorbs_time_warp():
    """DTW-aligned MCD (the VC-evaluation convention for parallel
    recordings with different timings) must be ~0 for a time-warped copy
    of the same envelope sequence, where framewise MCD is large; and
    equal-alignment identity gives exactly 0."""
    from tpuvc.utils.metrics import mcd, mcd_dtw

    rng = np.random.default_rng(0)
    t, nb = 240, 513
    base = np.abs(rng.lognormal(-2.0, 1.0, (t, nb)))
    # smooth the trajectory so warping is meaningful (not iid noise)
    k = np.ones(9) / 9
    base = np.apply_along_axis(lambda v: np.convolve(v, k, "same"), 0, base)
    base = np.maximum(base, 1e-8)
    # identity lands at the quadratic-form cancellation floor (~1e-7),
    # not exact zero
    assert mcd_dtw(base, base, 16000) < 1e-5
    # nonuniform time warp: indices accelerate then decelerate
    u = np.linspace(0, 1, 300)
    idx = np.clip((t - 1) * (u + 0.15 * np.sin(np.pi * u)), 0, t - 1)
    warped = base[np.round(idx).astype(int)]
    framewise = mcd(base, warped, 16000)
    aligned = mcd_dtw(base, warped, 16000)
    assert aligned < 0.35 * framewise, (aligned, framewise)
    assert aligned < 1.0, aligned


def test_adaptive_width_harmonic_dft_matches_full_width():
    """adaptive_width=True (per tile-slot lax.switch onto the narrowest
    centered sub-width containing every valid candidate's window) ==
    adaptive_width=False (always full width), interpret mode, for
    candidates spanning every width branch, empty slots, mixed-width
    tiles, and width-threshold edge values.  Masked lanes outside a
    candidate's window are exact zeros, so only reduction-tree
    association differs (round-5 refinement optimization)."""
    import jax.numpy as jnp

    from tpuvc.ops.pallas_harmonics import _widths, harmonic_dft_pallas

    fs, w, n, k = 16000, 768, 96, 6
    assert _widths(w) == (768, 384, 256, 128)
    # largest f0 whose window still fits width wb: half_len <= wb/2 - 2
    # <=> f0 >= 1.5*fs / (wb/2 - 3)
    thr = {wb: 1.5 * fs / (wb / 2.0 - 3.0) for wb in (384, 256, 128)}
    rng = np.random.default_rng(3)
    seg = jnp.asarray(rng.standard_normal((n, w)), jnp.float32)
    f0 = np.zeros((n, k), np.float32)
    f0[:, 0] = rng.uniform(71.0, 800.0, n)        # every branch
    f0[:32, 1] = rng.uniform(80.0, 126.0, 32)     # widest-only tile
    f0[32:64, 1] = rng.uniform(400.0, 790.0, 32)  # narrowest-only tile
    f0[::3, 2] = rng.uniform(130.0, 190.0, (n + 2) // 3)  # half-empty
    # exact thresholds: fits the narrower branch (hl_max <= thr)
    f0[:3, 3] = [thr[384], thr[256], thr[128]]
    # one low-f0 row per tile forces the whole tile-slot wide: the
    # other rows' values must still match the full-width pass exactly
    f0[:, 4] = rng.uniform(300.0, 700.0, n)
    f0[::32, 4] = 75.0
    f0 = jnp.asarray(f0)                           # slot 5 fully empty

    for with_if in (True, False):
        got = harmonic_dft_pallas(seg, f0, fs, n_harm=6, with_if=with_if,
                                  skip_empty=True, interpret=True,
                                  adaptive_width=True, fold=False)
        ref = harmonic_dft_pallas(seg, f0, fs, n_harm=6, with_if=with_if,
                                  skip_empty=False, interpret=True,
                                  adaptive_width=False, fold=False)
        names = ("xre", "xim", "dre", "dim", "energy")
        mask = np.asarray(f0) > 0.0
        for name, g, r in zip(names, got, ref):
            if g is None:
                assert not with_if
                continue
            g, r = np.asarray(g), np.asarray(r)
            m = mask if g.ndim == 2 else mask[..., None]
            np.testing.assert_allclose(np.where(m, g, 0.0),
                                       np.where(m, r, 0.0),
                                       rtol=1e-4, atol=1e-4,
                                       err_msg=f"{name} with_if={with_if}")


def test_aot_cache_round_trip(tmp_path):
    """aot_cached compiles once, persists the executable, and a second
    PROCESS (fresh jit fn, same module) loads it from the cache with
    identical results (utils/aot_cache.py — the axon remote-compile
    mitigation, VERDICT r4 item 7).  Runs in 1-device subprocesses: a
    deserialized executable does not re-shard for a multi-device
    process, and aot_cached refuses to cache there (also asserted)."""
    import os
    import subprocess
    import sys

    import jax
    import jax.numpy as jnp

    from tpuvc.utils.aot_cache import aot_cached

    # multi-device guard: falls back to a plain compile, still correct
    def f(x):
        return jnp.tanh(x @ x.T).sum(axis=1)

    x = jnp.asarray(np.random.default_rng(0).standard_normal((64, 64)),
                    jnp.float32)
    c = aot_cached(jax.jit(f), (x,), tag="t", cache_dir=str(tmp_path),
                   verbose=False)
    want = np.asarray(c(x))
    assert not os.listdir(tmp_path), "multi-device process must not cache"

    worker = tmp_path / "w.py"
    worker.write_text("""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from tpuvc.utils.aot_cache import aot_cached

def f(x):
    return jnp.tanh(x @ x.T).sum(axis=1)

x = jnp.asarray(np.random.default_rng(0).standard_normal((64, 64)),
                jnp.float32)
c = aot_cached(jax.jit(f), (x,), tag="t", cache_dir=sys.argv[1])
np.save(sys.argv[2], np.asarray(c(x)))
""")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    env.update({"JAX_PLATFORMS": "cpu", "XLA_FLAGS": ""})  # 1 device
    outs = []
    for i in range(2):
        out = str(tmp_path / f"o{i}.npy")
        r = subprocess.run([sys.executable, str(worker), str(tmp_path),
                            out], env=env, capture_output=True, text=True,
                           timeout=240)
        assert r.returncode == 0, r.stdout + r.stderr
        outs.append((np.load(out), r.stdout))
    assert "compiled + cached" in outs[0][1], outs[0][1]
    assert "loaded cached executable" in outs[1][1], outs[1][1]
    np.testing.assert_allclose(outs[1][0], outs[0][0], rtol=1e-6)
    np.testing.assert_allclose(outs[0][0], want, rtol=1e-5)


def test_aot_cache_prunes_stale_entries(tmp_path):
    """_prune_tag keeps only the most recently used entries of a tag
    (serialized convert executables are 100-220 MB each and every
    source change mints a new key) and matches file names EXACTLY —
    a tag that extends another must not be pruned with it."""
    import os

    from tpuvc.utils.aot_cache import _prune_tag

    key = "0" * 23
    names = [f"t-{key}{i}.pkl" for i in range(4)]
    other = [f"t-ext-{key}5.pkl",       # tag "t-ext" extends tag "t"
             f"t-{key}6.pkl.tmp99",     # in-flight temp file
             f"t-short.pkl"]            # malformed key length
    for i, n in enumerate(names + other):
        p = tmp_path / n
        p.write_bytes(b"x")
        os.utime(p, (1000 + i, 1000 + i))   # names[3] is the newest
    _prune_tag(str(tmp_path), "t", keep=2)
    left = sorted(os.listdir(tmp_path))
    assert names[2] in left and names[3] in left   # 2 newest kept
    assert names[0] not in left and names[1] not in left
    for n in other:                                # untouched
        assert n in left, left


def test_folded_harmonic_dft_matches_unfolded():
    """fold=True (even/odd symmetry decomposition at half the lanes) ==
    fold=False on every valid candidate row, interpret mode, both
    with_if settings.  The window/cos are even in base and the
    derivative window/sin odd, so the reductions decompose exactly over
    the folded halves; only reduction-tree association differs.  Rows
    below fold_floor are unspecified (the callers clamp)."""
    import jax.numpy as jnp

    from tpuvc.ops.pallas_harmonics import fold_floor, harmonic_dft_pallas

    fs, w, n, k = 16000, 768, 64, 4
    c0 = fold_floor(w, fs)
    rng = np.random.default_rng(5)
    seg = jnp.asarray(rng.standard_normal((n, w)), jnp.float32)
    f0 = np.zeros((n, k), np.float32)
    f0[:, 0] = rng.uniform(c0 + 0.5, 800.0, n)      # full valid range
    f0[::2, 1] = rng.uniform(64.0, 90.0, (n + 1) // 2)   # near the floor
    f0[:, 2] = c0 + 1e-3                             # just above the fold floor
    f0 = jnp.asarray(f0)                             # slot 3 empty

    for with_if in (True, False):
        got = harmonic_dft_pallas(seg, f0, fs, n_harm=6, with_if=with_if,
                                  skip_empty=True, interpret=True,
                                  fold=True)
        ref = harmonic_dft_pallas(seg, f0, fs, n_harm=6, with_if=with_if,
                                  skip_empty=False, interpret=True,
                                  fold=False)
        mask = np.asarray(f0) > 0.0
        for name, g, r in zip(("xre", "xim", "dre", "dim", "en"),
                              got, ref):
            if g is None:
                assert not with_if
                continue
            g, r = np.asarray(g), np.asarray(r)
            m = mask if g.ndim == 2 else mask[..., None]
            np.testing.assert_allclose(np.where(m, g, 0.0),
                                       np.where(m, r, 0.0),
                                       rtol=2e-4, atol=2e-4,
                                       err_msg=f"{name} with_if={with_if}")
