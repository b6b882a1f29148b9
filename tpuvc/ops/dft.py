"""Fixed-size Fourier transforms as cached MXU matmuls.

On the target TPU, XLA's FFT lowering is slower than an explicit DFT
matmul at the frontend's shapes (measured on v5e via scripts/bench_stages.py
micro: rfft [25k, 1024] 6.3 ms, irfft 9.2 ms, DFT-as-matmul 4.6 ms), and —
the bigger win — every spectral operator in the WORLD-style frontend
(smoothing, liftering, DC correction) acts on EVEN-symmetric sequences, so
the full fft_size-point transform collapses to a real [half, half] cosine
matmul: ~4x fewer FLOPs than the padded FFT round trip, on the unit the
hardware is best at (SURVEY.md SS2.3 N2/N3 hot loop; the same formulation
already carried synthesis' minimum-phase stage, dsp/synthesis.py).

All matrices are float32 and GENERATED ON DEVICE (iota + cos, left
deliberately foldable — see _outer_theta): embedding them as host
constants put ~25 MB of dense payload into the lowered module, and this
sandbox's remote-compile service charges minutes per megabyte of module.
If XLA constant-folds them it does so compiler-side (the uploaded module
stays small); if not, CSE generates each once per call for ~7.5M
transcendentals (<1 ms) — noise next to the matmuls they feed.  A
barrier here was measured to block BOTH folding and CSE (~9 ms/call of
per-consumer regeneration; commit 17cf333).  Float32 theta reaches ~3e3
rad at the largest shapes (~1e-4 rad entry phase error vs float64
matrices); the resulting transform error is bounded by
tests/test_ops.py::test_dft_float64_precision.  Identities (pinned
directly by tests/test_ops.py::test_dft_identities):

  cos_fwd(x)         == rfft(concat([x, x[-2:0:-1]]), n=fft).real
  cos_inv(c)         == irfft(c, n=fft)[:half]            (c real)
  cos_inv2(a, b)     == irfft(a + i b, n=fft)[:half]
  rdft(x, n)         == rfft(x, n=n)  as a (re, im) pair, any support
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _outer_theta(rows: int, cols: int, scale: float) -> jnp.ndarray:
    """scale * outer(arange(rows), arange(cols)) on device.

    Left foldable on purpose: if XLA constant-folds the trig matrices it
    does so COMPILER-side (the uploaded module stays small — the literals
    only ever existed in the compiled executable); if it declines (size
    limits), identical subgraphs CSE so each matrix is generated once per
    call.  An optimization_barrier here was measured to block both,
    costing ~9 ms/call of duplicate per-consumer regeneration."""
    r = jnp.arange(rows, dtype=jnp.float32)
    c = jnp.arange(cols, dtype=jnp.float32)
    return scale * jnp.outer(r, c)


def _edge_weights(half: int) -> jnp.ndarray:
    """[2, 1, ..., 1, 2] column weights of the even-extension transforms."""
    w = jnp.full((half,), 2.0, jnp.float32)
    return w.at[0].set(1.0).at[half - 1].set(1.0)


def _cos_fwd_mat(half: int) -> jnp.ndarray:
    """[half, half] M with rfft(even_ext(x)).real == x @ M."""
    n = 2 * (half - 1)
    th = _outer_theta(half, half, 2.0 * np.pi / n)
    return _edge_weights(half)[:, None] * jnp.cos(th)


def _cos_inv_mats(half: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """[half, half] (Mc, Ms) with irfft(a+ib, n)[ :half] == a@Mc + b@Ms."""
    n = 2 * (half - 1)
    th = _outer_theta(half, half, 2.0 * np.pi / n)
    w = _edge_weights(half)[:, None]
    return (w * jnp.cos(th)) / n, (-w * jnp.sin(th)) / n


def _rdft_mats(support: int, fft_size: int, n_bins: int
               ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """[support, n_bins] (C, S): rfft(x, fft_size)[..., :n_bins] ==
    x @ C - i x @ S for real x of length ``support``."""
    th = _outer_theta(support, n_bins, 2.0 * np.pi / fft_size)
    return jnp.cos(th), jnp.sin(th)


def cos_fwd(x: jnp.ndarray) -> jnp.ndarray:
    """Forward cosine transform of an even-symmetric half sequence.

    x: [..., half] (the first half of an even fft_size = 2(half-1)
    periodic sequence).  Returns the real rfft coefficients [..., half].
    """
    m = _cos_fwd_mat(x.shape[-1])
    return jnp.dot(x.astype(jnp.float32), m,
                   preferred_element_type=jnp.float32)


def cos_inv(c: jnp.ndarray) -> jnp.ndarray:
    """Inverse of cos_fwd for REAL coefficients: irfft(c)[..., :half]."""
    mc, _ = _cos_inv_mats(c.shape[-1])
    return jnp.dot(c.astype(jnp.float32), mc,
                   preferred_element_type=jnp.float32)


def cos_inv2(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """irfft(a + i b, fft_size)[..., :half] for real a, b [..., half]."""
    mc, ms = _cos_inv_mats(a.shape[-1])
    return (jnp.dot(a.astype(jnp.float32), mc,
                    preferred_element_type=jnp.float32)
            + jnp.dot(b.astype(jnp.float32), ms,
                      preferred_element_type=jnp.float32))


def rdft(x: jnp.ndarray, fft_size: int, n_bins: int | None = None
         ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """rfft(x, n=fft_size) as a (re, im) pair of real matmuls.

    x: [..., support] real with support <= fft_size (zero-padding is free:
    the matrix just has ``support`` rows).  n_bins truncates the output to
    the first n_bins frequency bins (e.g. StoneMask only reads harmonics
    below 6 * f0_ceil).
    """
    if n_bins is None:
        n_bins = fft_size // 2 + 1
    c, s = _rdft_mats(x.shape[-1], fft_size, n_bins)
    x = x.astype(jnp.float32)
    re = jnp.dot(x, c, preferred_element_type=jnp.float32)
    im = -jnp.dot(x, s, preferred_element_type=jnp.float32)
    return re, im


def rdft_power(x: jnp.ndarray, fft_size: int,
               n_bins: int | None = None) -> jnp.ndarray:
    """|rfft(x, fft_size)|^2 via rdft (two matmuls + elementwise)."""
    re, im = rdft(x, fft_size, n_bins)
    return re * re + im * im


def rdft_ct(x: jnp.ndarray, fft_size: int, n_bins: int | None = None,
            n1: int | None = None) -> tuple[jnp.ndarray, jnp.ndarray]:
    """rfft(x, fft_size) as a TWO-STAGE Cooley-Tukey factorization of
    matmuls — FFT-class accumulation accuracy on the MXU.

    The direct rdft matmul accumulates each bin over all fft_size samples
    in one float32 chain; on spectra with >60 dB dynamic range the
    accumulated rounding noise floors quiet bins ~10x higher than an FFT
    would (the D4C group-delay statistic lost ~1-1.6 dB of aperiodicity
    discrimination in partially-dead bands vs a float64 run — the
    round-2 "float32 saturation" note in dsp/d4c.py).  Factoring
    fft_size = n1*n2 (32*32 at 1024) caps every reduction at depth
    n1/n2: measured on the steep-rolloff fixtures, the full D4C pipeline
    with this transform matches float64 to 0.01 dB where the direct
    matmul was off by up to 1.6 dB (tests/test_d4c.py::
    test_partially_dead_band_discrimination), and it is ~3.5x fewer
    FLOPs than the direct [support, half] matmul.

    With m = m2 + n2*m1 and k = k1 + n1*k2:
      A[k1, m2] = sum_m1 x[m1, m2] W_{n1}^{k1 m1}      (depth-n1 matmul)
      B = A * W_{fft}^{k1 m2}                            (twiddle)
      X[k1, k2] = sum_m2 B[k1, m2] W_{n2}^{k2 m2}      (depth-n2 matmul)

    x: [..., support] real, support <= fft_size (zero-padded).  Returns
    (re, im) [..., n_bins].  fft_size must be a power of two.  n1
    overrides the (near-square, default) split — used by
    scripts/bench_dft.py to A/B factorizations against THIS code path.
    """
    half = fft_size // 2 + 1
    if n_bins is None:
        n_bins = half
    log2n = fft_size.bit_length() - 1
    assert 1 << log2n == fft_size, "rdft_ct requires a power-of-two size"
    if n1 is None:
        n1 = 1 << ((log2n + 1) // 2)
    assert fft_size % n1 == 0, "n1 must divide fft_size"
    n2 = fft_size // n1
    lead = x.shape[:-1]
    support = x.shape[-1]
    x = x.reshape(-1, support).astype(jnp.float32)
    if support < fft_size:
        x = jnp.pad(x, ((0, 0), (0, fft_size - support)))
    r = x.shape[0]
    x = x.reshape(r, n1, n2)

    th1 = _outer_theta(n1, n1, 2.0 * np.pi / n1)
    w1c, w1s = jnp.cos(th1), jnp.sin(th1)
    ar = jnp.einsum("rmn,mk->rkn", x, w1c,
                    preferred_element_type=jnp.float32)
    ai = -jnp.einsum("rmn,mk->rkn", x, w1s,
                     preferred_element_type=jnp.float32)

    tht = _outer_theta(n1, n2, 2.0 * np.pi / fft_size)
    tc, ts = jnp.cos(tht), jnp.sin(tht)
    br = ar * tc + ai * ts
    bi = ai * tc - ar * ts

    k2n = min((n_bins + n1 - 1) // n1 + 1, n2)
    th2 = _outer_theta(n2, k2n, 2.0 * np.pi / n2)
    w2c, w2s = jnp.cos(th2), jnp.sin(th2)
    re = (jnp.einsum("rkn,nj->rkj", br, w2c,
                     preferred_element_type=jnp.float32)
          + jnp.einsum("rkn,nj->rkj", bi, w2s,
                       preferred_element_type=jnp.float32))
    im = (jnp.einsum("rkn,nj->rkj", bi, w2c,
                     preferred_element_type=jnp.float32)
          - jnp.einsum("rkn,nj->rkj", br, w2s,
                       preferred_element_type=jnp.float32))
    # [r, k1, k2] -> k = k1 + n1*k2
    re = re.transpose(0, 2, 1).reshape(r, k2n * n1)[:, :n_bins]
    im = im.transpose(0, 2, 1).reshape(r, k2n * n1)[:, :n_bins]
    return re.reshape(*lead, n_bins), im.reshape(*lead, n_bins)


def _irdft_mats(fft_size: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """[half, fft_size] (Mc, Ms): irfft(a+ib, fft_size) == a@Mc + b@Ms."""
    half = fft_size // 2 + 1
    th = _outer_theta(half, fft_size, 2.0 * np.pi / fft_size)
    w = _edge_weights(half)[:, None]
    return (w * jnp.cos(th)) / fft_size, (-w * jnp.sin(th)) / fft_size


def irdft(a: jnp.ndarray, b: jnp.ndarray, fft_size: int) -> jnp.ndarray:
    """irfft(a + i b, n=fft_size) — FULL-length inverse — as two matmuls.

    a, b: [..., fft_size//2+1] real/imag half spectra.  Returns
    [..., fft_size].  Measured faster than XLA's TPU irfft at the
    synthesis response shape (scripts/bench_stages.py micro).
    """
    mc, ms = _irdft_mats(fft_size)
    return (jnp.dot(a.astype(jnp.float32), mc,
                    preferred_element_type=jnp.float32)
            + jnp.dot(b.astype(jnp.float32), ms,
                      preferred_element_type=jnp.float32))
