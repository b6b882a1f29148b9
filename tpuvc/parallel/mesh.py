"""Device mesh + sharding helpers (the TPU build's comm layer).

The reference has NO distributed execution (single process, single GPU —
SURVEY.md SS2.4); this module is the tpu-native slot for it: a 1-D ``data``
mesh for batch-parallel training (frames are i.i.d., so DP is exact), with
parameters replicated and gradient all-reduce emitted by XLA as psum over
ICI.  A second (currently size-1) ``model`` axis is carried so tensor
sharding can be enabled without re-plumbing call sites; the VAE is far
below single-chip HBM so it stays unused.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_devices: int | None = None,
              devices: list | None = None) -> Mesh:
    devs = devices if devices is not None else jax.devices()
    n = n_devices or len(devs)
    if n > len(devs):
        raise ValueError(f"requested {n} devices, have {len(devs)}")
    arr = np.array(devs[:n]).reshape(n, 1)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh, batch_axis: int = 0) -> NamedSharding:
    """Shard the given array axis over the data mesh axis."""
    spec = [None] * batch_axis + [DATA_AXIS]
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully replicated (parameters, optimizer state, scalars)."""
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays, batch_axis: int = 0):
    """Device-put host arrays with the batch axis sharded over the mesh."""
    s = batch_sharding(mesh, batch_axis)
    out = tuple(jax.device_put(a, s) for a in arrays)
    return out if len(out) > 1 else out[0]
