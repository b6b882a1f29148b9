"""End-to-end conversion: analysis -> VAE speaker swap -> synthesis.

The reference's convert.py round-trips the GPU per utterance and crosses
into WORLD C++ twice (SURVEY.md SS3.3).  Here the ENTIRE chain — DIO /
StoneMask / CheapTrick / D4C, energy-norm + Tanhize, encode, speaker-swap
decode, de-norm, log-linear f0 transform, minimum-phase synthesis — is ONE
jit-compiled device program per (padded) utterance length
(BASELINE.json config 5: 'End-to-end streaming convert ... in one jit
graph').  Batched conversion vmaps the same graph over utterances for the
all-pairs config.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from tpuvc.dsp.cheaptrick import cheaptrick
from tpuvc.dsp.constants import EPSILON, DEFAULT_WORLD, WorldConfig
from tpuvc.dsp.d4c import d4c
from tpuvc.dsp.dio import dio
from tpuvc.dsp.harvest import harvest
from tpuvc.dsp.stonemask import stonemask
from tpuvc.dsp.synthesis import synthesize
from tpuvc.convert.f0 import convert_f0


@dataclasses.dataclass(frozen=True)
class ConverterAssets:
    """Everything convert needs besides the checkpoint (host-side)."""

    xmin: np.ndarray          # [513] Tanhize stats
    xmax: np.ndarray
    f0_mu: np.ndarray         # [n_speakers] voiced log-f0 means
    f0_sigma: np.ndarray      # [n_speakers]
    speakers: list[str]


def _normalize_sp(sp, xmin, xmax):
    """energy-normalize + log10 + Tanhize.forward, on device."""
    en = jnp.sum(sp + EPSILON, axis=-1, keepdims=True)
    log_sp = jnp.log10((sp + EPSILON) / en)
    span = jnp.maximum(xmax - xmin, 1e-6)
    u = jnp.clip((log_sp - xmin) / span, 0.0, 1.0) * 2.0 - 1.0
    return u, en


def _denormalize_sp(u, en, xmin, xmax):
    # clip to the Tanhize range UNCONDITIONALLY (not only under the tanh
    # decoder): an out-of-range frame from an untrained/OOD decoder would
    # extrapolate log10-SP past the corpus max and exponentiate, blowing
    # up synthesis power (VERDICT r3 missing #2; the forward direction
    # clips the same way in _normalize_sp)
    u = jnp.clip(u, -1.0, 1.0)
    span = jnp.maximum(xmax - xmin, 1e-6)
    log_sp = (u + 1.0) * 0.5 * span + xmin
    return jnp.power(10.0, log_sp) * en


def make_convert_fn(model, cfg: WorldConfig = DEFAULT_WORLD,
                    sample_z: bool = False):
    """Build the single-graph converter.

    Returns fn(params, x [T], y_trg int, stats dict, seed) -> y_wav [T'].
    Static over T (pad utterances to buckets); everything else is traced.
    """

    @functools.partial(jax.jit, static_argnames=())
    def convert(params, x, y_trg, xmin, xmax, mu_src, sd_src, mu_trg,
                sd_trg, seed):
        x = x.astype(jnp.float32)
        # --- analysis (SURVEY.md SS3.1; honors cfg.f0_method/ap_method) ---
        if cfg.f0_method == "harvest":
            f0 = harvest(x, fs=cfg.fs, hop=cfg.hop, f0_floor=cfg.f0_floor,
                         f0_ceil=cfg.f0_ceil,
                         channel_decim=cfg.harvest_channel_decim)
        else:
            f0_c = dio(x, fs=cfg.fs, hop=cfg.hop, f0_floor=cfg.f0_floor,
                       f0_ceil=cfg.f0_ceil)
            f0 = stonemask(x, f0_c, hop=cfg.hop, fs=cfg.fs)
        sp = cheaptrick(x, f0, hop=cfg.hop, fs=cfg.fs,
                        fft_size=cfg.fft_size)
        ap = d4c(x, f0, hop=cfg.hop, fs=cfg.fs, fft_size=cfg.fft_size,
                 method=cfg.ap_method)
        # --- spectral conversion (SURVEY.md SS3.3) ---
        u, en = _normalize_sp(sp, xmin, xmax)
        z_mu, z_lv = model.apply(params, u, method=type(model).encode)
        if sample_z:
            eps = jax.random.normal(jax.random.PRNGKey(seed), z_mu.shape)
            z = z_mu + eps * jnp.exp(0.5 * z_lv)
        else:
            z = z_mu
        y_vec = jnp.full((u.shape[0],), y_trg, jnp.int32)
        u_conv = model.apply(params, z, y_vec, method=type(model).decode)
        sp_conv = _denormalize_sp(u_conv, en, xmin, xmax)
        # --- prosody + synthesis ---
        f0_conv = convert_f0(f0, mu_src, sd_src, mu_trg, sd_trg)
        return synthesize(f0_conv, sp_conv, ap, fs=cfg.fs, hop=cfg.hop,
                          fft_size=cfg.fft_size, seed=seed)

    return convert


def make_batch_convert_fn(model, cfg: WorldConfig = DEFAULT_WORLD):
    """vmapped single-graph converter over [B, T] utterances with per-
    utterance target speakers and f0 statistics (BASELINE config 4:
    all-pairs many-to-many conversion is one device call)."""
    single = make_convert_fn(model, cfg)

    def batch(params, xs, y_trgs, xmin, xmax, mu_srcs, sd_srcs, mu_trgs,
              sd_trgs, seeds):
        return jax.vmap(
            lambda x, y, ms, ss, mt, st, sd: single(
                params, x, y, xmin, xmax, ms, ss, mt, st, sd)
        )(xs, y_trgs, mu_srcs, sd_srcs, mu_trgs, sd_trgs, seeds)

    return jax.jit(batch)


class Converter:
    """Host-facing conversion API (reference convert.py main loop)."""

    def __init__(self, model, params, assets: ConverterAssets,
                 cfg: WorldConfig = DEFAULT_WORLD, bucket_s: float = 1.0,
                 transfer_encoding: str = "float32"):
        """``transfer_encoding``: "float32" (default), "ulaw8", or
        "pcm12" — encode the converted waveform ON DEVICE and decode on
        the host, shrinking the device->host payload for bandwidth-
        limited attachments like this sandbox's TCP relay (ops/ulaw.py:
        mu-law 1 B/sample ~37 dB SNR; packed 12-bit 1.5 B/sample ~61 dB).
        Written WAVs are 16-bit either way."""
        if transfer_encoding not in ("float32", "ulaw8", "pcm12"):
            raise ValueError(f"unknown transfer_encoding "
                             f"{transfer_encoding!r}")
        self.model = model
        self.params = params
        self.assets = assets
        self.cfg = cfg
        self.bucket = int(bucket_s * cfg.fs)
        self.transfer_encoding = transfer_encoding
        base = make_convert_fn(model, cfg)
        self._fn = jax.jit(lambda *a: self._encode_transfer(base(*a)))

    def _encode_transfer(self, y):
        if self.transfer_encoding == "ulaw8":
            from tpuvc.ops.ulaw import ulaw_encode
            return ulaw_encode(y)
        if self.transfer_encoding == "pcm12":
            from tpuvc.ops.ulaw import pcm12_encode
            return pcm12_encode(y)
        return y

    def _decode_transfer(self, y: np.ndarray,
                         n_samples: int | None = None) -> np.ndarray:
        if self.transfer_encoding == "ulaw8":
            from tpuvc.ops.ulaw import ulaw_decode
            return ulaw_decode(y)
        if self.transfer_encoding == "pcm12":
            from tpuvc.ops.ulaw import pcm12_decode
            return pcm12_decode(y, n_samples)
        return y

    def _pad(self, x: np.ndarray) -> np.ndarray:
        n = max(1, -(-len(x) // self.bucket))
        return np.pad(x, (0, n * self.bucket - len(x)))

    def _coerce_fs(self, x: np.ndarray, fs: int | None) -> np.ndarray:
        """Resample ``x`` to the pipeline rate when ``fs`` differs.

        The reference loads audio through librosa, which resamples any
        input to the pipeline's 16 kHz (SURVEY.md SS2.2) — a 22.05/44.1/
        48 kHz recording is a first-class input, not an error.  Host-side
        rational polyphase (io/wav.resample); the analysis constants stay
        fs-specific on device."""
        if fs is None or fs == self.cfg.fs:
            return np.asarray(x)
        from tpuvc.io.wav import resample
        return resample(np.asarray(x), int(fs), self.cfg.fs)

    def _check_speaker_stats(self, *indices: int) -> None:
        for i in indices:
            if not np.isfinite(self.assets.f0_mu[i]):
                raise ValueError(
                    f"speaker {self.assets.speakers[i]!r} has no f0 "
                    "statistics (no training-split utterances were "
                    "analyzed for it)")

    # HBM bounds: one call's audio-seconds budget per f0 path.  The
    # numbers are calibrated against the v5e envelope (batch 128 x 4 s
    # fits, 256 x 4 s OOMs at 15.75 GB — docs/PERFORMANCE.md) and
    # ASSERTED against the compiled graphs by tests/test_budget.py,
    # which XLA-memory-analyzes both paths at two durations and fails if
    # the per-audio-second temp slope grows past what these budgets
    # assume — a graph change that fattens the live set now breaks a
    # test instead of silently OOMing (VERDICT r2 item 8).  Harvest's
    # round-2 cap was 32 s (all-frames candidate refinement); streaming
    # the refinement through a lax.map (dsp/harvest.py _REFINE_CHUNK)
    # bounds that stage, leaving the ~2x-denser 1 ms analysis grid as
    # harvest's remaining overhead vs DIO.
    MAX_AUDIO_S_PER_CALL = 384.0
    # Since the block-granular event scans (dio._channel_tracks) the
    # harvest graph's temp slope is ~52 MB/audio-s (all 152 channels
    # unserialized) and 256 s/call was measured safe on chip — but the
    # call is compute-bound and scales linearly (batch 64 x 4 s bench:
    # 234.9x vs batch 32's 247.2x), so 128 s stays the
    # throughput-optimal cap; raising it buys nothing measurable.
    MAX_AUDIO_S_PER_CALL_HARVEST = 128.0

    def convert_batch(self, xs: list[np.ndarray], srcs: list[str],
                      trgs: list[str], seed=0,
                      fs: int | None = None, mesh=None) -> list[np.ndarray]:
        """Convert many utterances in batched device calls (vmapped graph).

        Utterances are padded to the largest common bucket; per-utterance
        source/target speakers may differ (all-pairs many-to-many,
        BASELINE config 4).  Requests beyond the per-call HBM budget are
        split into equal chunks padded to one shape (single compile).

        With ``mesh`` (a `tpuvc.parallel.mesh` data mesh) the batch axis
        is sharded over the mesh's devices and parameters replicate — the
        data-parallel serving configuration (SURVEY.md SS2.4): pjit
        propagates the input shardings through the vmapped graph, so N
        chips convert N-x the batch with no code change to the graph.
        """
        if not xs:
            return []
        xs = [self._coerce_fs(x, fs) for x in xs]
        if not hasattr(self, "_batch_fn"):
            base_b = make_batch_convert_fn(self.model, self.cfg)
            self._batch_fn = jax.jit(
                lambda *a: self._encode_transfer(base_b(*a)))
        a = self.assets
        self._check_speaker_stats(*[a.speakers.index(s) for s in srcs],
                                  *[a.speakers.index(t) for t in trgs])
        lens = [len(x) for x in xs]
        t_pad = max(1, -(-max(lens) // self.bucket)) * self.bucket
        budget = (self.MAX_AUDIO_S_PER_CALL_HARVEST
                  if self.cfg.f0_method == "harvest"
                  else self.MAX_AUDIO_S_PER_CALL)
        n_dev = 1
        if mesh is not None:
            from tpuvc.parallel import mesh as mesh_lib
            n_dev = mesh.shape[mesh_lib.DATA_AXIS]
            budget *= n_dev                 # per-chip HBM budget scales
        max_b = max(1, int(budget / (t_pad / self.cfg.fs)))
        n = len(xs)
        n_chunks = -(-n // max_b)
        b = -(-n // n_chunks)             # equal chunk size, one compile
        # mesh divisibility rounds DOWN (rounding up could push a chunk
        # past the per-chip HBM budget); the tail chunk pads up to b rows,
        # which stays within budget because b <= max_b
        b = max(n_dev, (b // n_dev) * n_dev)
        si = np.array([a.speakers.index(s) for s in srcs], np.int32)
        ti = np.array([a.speakers.index(t) for t in trgs], np.int32)

        def put(arr, batched):
            if mesh is None:
                return jnp.asarray(arr)
            from tpuvc.parallel import mesh as mesh_lib
            s = (mesh_lib.batch_sharding(mesh) if batched
                 else mesh_lib.replicated(mesh))
            return jax.device_put(np.asarray(arr), s)

        if mesh is None:
            params = self.params
        else:
            from tpuvc.parallel import mesh as mesh_lib
            params = jax.device_put(self.params, mesh_lib.replicated(mesh))
        outs: list[np.ndarray] = []
        for lo in range(0, n, b):
            hi = min(lo + b, n)
            pad_b = b - (hi - lo)          # ragged tail: repeat last row
            rows = [np.pad(np.asarray(x, np.float32),
                           (0, t_pad - len(x)))
                    for x in xs[lo:hi]]
            rows += [rows[-1]] * pad_b
            idx = np.concatenate([np.arange(lo, hi),
                                  np.full(pad_b, hi - 1, np.int64)])
            if np.ndim(seed):         # per-utterance seeds (len(xs) array)
                seeds = np.asarray(seed, np.int32)[idx]
            else:
                seeds = seed + idx.astype(np.int32)
            y = self._batch_fn(params, put(np.stack(rows), True),
                               put(ti[idx], True),
                               put(a.xmin, False), put(a.xmax, False),
                               put(a.f0_mu[si[idx]], True),
                               put(a.f0_sigma[si[idx]], True),
                               put(a.f0_mu[ti[idx]], True),
                               put(a.f0_sigma[ti[idx]], True),
                               put(seeds, True))
            y = self._decode_transfer(np.asarray(y), t_pad)
            outs.extend(y[i, :lens[lo + i]] for i in range(hi - lo))
        return outs

    def convert(self, x: np.ndarray, src: str, trg: str,
                seed: int = 0, fs: int | None = None) -> np.ndarray:
        x = self._coerce_fs(x, fs)
        a = self.assets
        si = a.speakers.index(src)
        ti = a.speakers.index(trg)
        self._check_speaker_stats(si, ti)
        xp = self._pad(np.asarray(x, np.float32))
        y = self._fn(self.params, jnp.asarray(xp), jnp.int32(ti),
                     jnp.asarray(a.xmin), jnp.asarray(a.xmax),
                     jnp.float32(a.f0_mu[si]), jnp.float32(a.f0_sigma[si]),
                     jnp.float32(a.f0_mu[ti]), jnp.float32(a.f0_sigma[ti]),
                     jnp.int32(seed))
        return self._decode_transfer(np.asarray(y), len(xp))[: len(x)]
