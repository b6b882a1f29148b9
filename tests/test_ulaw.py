"""mu-law transfer codec: round-trip monotonicity + SNR on pipeline audio."""

import numpy as np

from tests.conftest import make_harmonic
from tpuvc.ops.ulaw import ulaw_decode, ulaw_encode


def test_ulaw_roundtrip_monotone_and_bounded():
    import jax.numpy as jnp
    x = np.linspace(-1.0, 1.0, 4001).astype(np.float32)
    enc = np.asarray(ulaw_encode(jnp.asarray(x)))
    assert enc.dtype == np.uint8
    assert (np.diff(enc.astype(np.int32)) >= 0).all()      # monotone
    dec = ulaw_decode(enc)
    assert np.abs(dec).max() <= 1.0 + 1e-6
    # worst-case step near full scale: ~1/(127/ln(256)) * (1+255)/255/... —
    # bound the absolute error by the largest quantization cell
    assert np.abs(dec - x).max() < 0.025


def test_ulaw_snr_on_speech_like_audio():
    """SNR of the 8-bit transfer encoding on harmonic audio (the bench
    signal class): must clear 30 dB; measured ~37 dB.  This pins the
    quality cost quoted for the bench's mu-law drain option
    (docs/PERFORMANCE.md)."""
    import jax.numpy as jnp
    x = make_harmonic(150.0, fs=16000, dur_s=1.0, n_harm=15, noise=0.01)
    x = (0.5 * x / np.abs(x).max()).astype(np.float32)
    dec = ulaw_decode(np.asarray(ulaw_encode(jnp.asarray(x))))
    snr = 10.0 * np.log10(np.sum(x * x) / np.sum((dec - x) ** 2))
    assert snr > 30.0, f"mu-law SNR {snr:.1f} dB"


def test_pcm12_roundtrip_exact_quantization():
    """12-bit pack/unpack is a pure quantizer: |err| <= 1/2047 half-step,
    and the byte stream is exactly 1.5 B/sample."""
    import jax.numpy as jnp

    from tpuvc.ops.ulaw import pcm12_decode, pcm12_encode
    x = np.linspace(-1.0, 1.0, 4000).astype(np.float32)
    enc = np.asarray(pcm12_encode(jnp.asarray(x)))
    assert enc.dtype == np.uint8 and enc.shape == (6000,)
    dec = pcm12_decode(enc)
    assert dec.shape == (4000,)
    assert np.abs(dec - x).max() <= 0.5 / 2047.0 + 1e-7


def test_pcm12_odd_length_and_batched():
    import jax.numpy as jnp

    from tpuvc.ops.ulaw import pcm12_decode, pcm12_encode
    rng = np.random.default_rng(0)
    x = np.clip(rng.standard_normal((3, 2001)) * 0.3, -1, 1).astype(
        np.float32)
    enc = np.asarray(pcm12_encode(jnp.asarray(x)))
    assert enc.shape == (3, 3003)
    dec = pcm12_decode(enc, n_samples=2001)
    assert dec.shape == (3, 2001)
    np.testing.assert_allclose(dec, x, atol=0.5 / 2047.0 + 1e-7)


def test_pcm12_snr_on_speech_like_audio():
    """The middle-ground codec must land far above the mu-law 37 dB cliff
    (VERDICT r3 item 8b quotes ~61 dB at half scale)."""
    import jax.numpy as jnp

    from tpuvc.ops.ulaw import pcm12_decode, pcm12_encode
    x = make_harmonic(150.0, fs=16000, dur_s=1.0, n_harm=15, noise=0.01)
    x = (0.5 * x / np.abs(x).max()).astype(np.float32)
    dec = pcm12_decode(np.asarray(pcm12_encode(jnp.asarray(x))))
    snr = 10.0 * np.log10(np.sum(x * x) / np.sum((dec - x) ** 2))
    assert snr > 55.0, f"pcm12 SNR {snr:.1f} dB"
