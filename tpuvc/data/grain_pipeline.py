"""Optional Grain-backed input pipeline (SURVEY.md SS5.2).

The default pipeline (data/dataset.py) is a seeded in-memory batcher — the
right tool for VCC2016-scale corpora.  This module provides the same
interface on Grain's deterministic, checkpointable sampler for larger-than-
memory corpora or when exact mid-epoch resume of the INPUT stream is
required (the reference's TF queues were neither deterministic nor
resumable).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np

try:
    import grain.python as grain
    HAVE_GRAIN = True
except Exception:  # pragma: no cover
    HAVE_GRAIN = False

from tpuvc.data.dataset import FrameDataset
from tpuvc.data.normalizer import Tanhize


class _FrameSource:
    """Grain RandomAccessDataSource over frames, normalized per item.

    Normalization happens in __getitem__ so no second full-corpus copy is
    materialized — this path is the one advertised for larger-than-memory
    corpora, where an up-front full-array transform would defeat it.
    """

    def __init__(self, ds: FrameDataset, normalizer: Tanhize | None):
        self._x = ds.x
        self._y = ds.y
        self._norm = normalizer

    def __len__(self) -> int:
        return self._x.shape[0]

    def __getitem__(self, i):
        x = self._x[i]
        if self._norm is not None:
            x = self._norm.forward(x).astype(np.float32)
        return x, self._y[i]


def grain_batches(ds: FrameDataset, batch_size: int, seed: int = 0,
                  normalizer: Tanhize | None = None,
                  num_epochs: int | None = None,
                  ) -> Iterator[tuple[np.ndarray, np.ndarray]]:
    """Deterministic epoch-shuffled batches via Grain's index sampler."""
    if not HAVE_GRAIN:
        raise ImportError("grain is not available in this environment")
    source = _FrameSource(ds, normalizer)
    sampler = grain.IndexSampler(
        num_records=len(source), shuffle=True, seed=seed,
        num_epochs=num_epochs,
        shard_options=grain.NoSharding())
    loader = grain.DataLoader(
        data_source=source, sampler=sampler,
        operations=[grain.Batch(batch_size=batch_size,
                                drop_remainder=True)],
        worker_count=0)
    for xb, yb in loader:
        yield np.asarray(xb), np.asarray(yb)
