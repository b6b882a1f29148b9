"""Frame-blocked analysis sharding — the pipeline's context-parallel analogue.

The model is strictly frame-wise, so sequence parallelism proper does not
apply (SURVEY.md SS2.4/SS5.7); where utterance length DOES appear is the
WORLD-style analysis, which is O(T) with only local context (window
<= 2048 samples around each frame).  This module shards ONE long
utterance's frame axis across the mesh: every device receives the signal
(small: 10 s of 16 kHz float32 = 640 KB, replicated over ICI), slices its
contiguous frame block plus a halo of window/2 samples, and runs the
frame-local stages (StoneMask refinement, CheapTrick, D4C) on its block.
The f0 contour from DIO stays replicated — its event machinery and contour
fixing are global scans over the whole utterance and three orders of
magnitude cheaper than the spectral stages.

Halo handling: blocks are cut on hop boundaries and each device analyzes
halo_frames extra frames on both sides (covering the 2048-sample window
of its edge frames), then drops them — a halo-overlap formulation with no
inter-device exchange needed because the source signal is replicated.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from tpuvc.dsp.cheaptrick import cheaptrick
from tpuvc.dsp.constants import (MAX_ANALYSIS_WINDOW, DEFAULT_WORLD,
                                 WorldConfig)
from tpuvc.dsp.d4c import d4c
from tpuvc.dsp.dio import dio
from tpuvc.dsp.stonemask import stonemask
from tpuvc.dsp.world import WorldFeatures
from tpuvc.parallel.mesh import DATA_AXIS

_WINDOW = MAX_ANALYSIS_WINDOW


def analyze_sharded(x: jnp.ndarray, mesh,
                    cfg: WorldConfig = DEFAULT_WORLD) -> WorldFeatures:
    """Analyze one long utterance with its frame axis sharded over the mesh.

    Returns the same WorldFeatures as dsp.world.analyze (frame counts are
    padded up to a multiple of the mesh size; extra frames analyze trailing
    silence and are sliced off).
    """
    hop, fs, fft = cfg.hop, cfg.fs, cfg.fft_size
    n_dev = mesh.shape[DATA_AXIS]
    n_frames = x.shape[0] // hop + 1
    block = -(-n_frames // n_dev)
    n_pad = block * n_dev
    halo = -(-(_WINDOW // 2) // hop)          # halo frames per side

    x = x.astype(jnp.float32)
    # f0: global (DIO contour fixing is a whole-utterance scan), replicated
    f0_full = dio(x, fs=fs, hop=hop, f0_floor=cfg.f0_floor,
                  f0_ceil=cfg.f0_ceil)
    f0_pad = jnp.pad(f0_full, (0, n_pad - n_frames))

    # extended arrays so every device can slice block+2*halo frames and the
    # matching signal span without bounds checks
    f0_ext = jnp.pad(f0_pad, (halo, halo))
    x_ext = jnp.pad(x, (halo * hop, (n_pad + halo) * hop + fft))

    def device_fn(_token):
        d = jax.lax.axis_index(DATA_AXIS)
        s = d * block
        f0_loc = jax.lax.dynamic_slice(f0_ext, (s,), (block + 2 * halo,))
        x_loc = jax.lax.dynamic_slice(
            x_ext, (s * hop,), ((block + 2 * halo) * hop + fft))
        # local frame j is global frame s + j - halo: centers line up because
        # x_loc starts at global sample (s - halo) * hop
        f0_r = stonemask(x_loc, f0_loc, hop=hop, fs=fs)
        sp = cheaptrick(x_loc, f0_r, hop=hop, fs=fs, fft_size=fft)
        ap = d4c(x_loc, f0_r, hop=hop, fs=fs, fft_size=fft)
        sl = slice(halo, halo + block)
        return f0_r[sl], sp[sl], ap[sl]

    fn = jax.shard_map(
        device_fn, mesh=mesh,
        in_specs=(P(DATA_AXIS),),
        out_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)))
    token = jnp.zeros((n_dev,), jnp.int32)
    f0_b, sp_b, ap_b = fn(token)
    return WorldFeatures(f0=f0_b[:n_frames], sp=sp_b[:n_frames],
                         ap=ap_b[:n_frames])
