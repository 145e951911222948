"""Device-resident (HBM) dataset cache: zero host->device bytes per epoch.

The reference re-decodes every NIfTI from disk every epoch
(reference: datasets/__init__.py:56-58, num_workers=0); round 3's host
pipeline cut that to RAM-cached decode + double-buffered H2D, but every
batch still crossed the host->device link every epoch — at crop
resolution a 56-volume epoch moved ~190 MB over a link three orders of
magnitude slower than HBM. A crop-res bf16 volume is ~1.7 MB, so an
ADNI-scale dataset (~10^3 volumes x 2 modalities ~ 3.4 GB) fits in HBM
alongside model state.

`DeviceCachedFeed` wraps a host `Loader`:

 - The first iteration streams each volume to the device ONCE, stacking
   per modality into a (N_pad, X, Y, Z) array sharded over the mesh's
   'data' axis (replicated-free: `jax.make_array_from_callback` decodes
   and transfers ONLY the rows each process's devices own, so multi-host
   cached epochs no longer duplicate host decode across processes).
 - Every later batch is assembled ON DEVICE by a jitted gather
   (`jnp.take` over the leading axis): per step the host ships only the
   (pad_to,) int32 row ids and a scalar count — a few dozen bytes.
 - Batch ORDER is bit-identical to the host path: the wrapped Loader's
   own `_batches()` drives the epoch (same shuffle RNG, drop_last,
   seed), and ragged final batches are wrap-around duplicate-padded with
   a validity mask exactly like `pipeline.pad_batch`.
 - Datasets that exceed the HBM budget (e.g. full-resolution volumes)
   are detected up front (`fits_budget`) and the caller falls back to
   the streaming `DeviceFeed`.

Device-side augmentation (transforms.augment_batch) composes unchanged:
it already runs inside the train step on whatever batch arrays arrive.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

__all__ = ["DeviceCachedFeed", "fits_budget", "cache_bytes", "hbm_budget"]


def _data_axis_size(mesh) -> int:
    return mesh.shape["data"] if mesh is not None else 1


def _vol_shape(loader):
    """Shape/itemsize of one cached volume (decodes one row; the decode
    lands in the VolumeSource RAM cache, so nothing is wasted)."""
    src = loader.source
    first = src[int(loader.indices[0])]
    k = src.keys[0]
    return first[k].shape, np.dtype(src.dtype).itemsize, len(src.keys)


def cache_bytes(loader, mesh=None) -> int:
    """Per-device HBM bytes the cache for `loader` would occupy."""
    shape, itemsize, n_keys = _vol_shape(loader)
    n = len(loader.indices)
    ds = _data_axis_size(mesh)
    n_pad = -(-n // ds) * ds
    return (n_pad // ds) * int(np.prod(shape)) * itemsize * n_keys


def hbm_budget() -> int:
    """Per-device byte budget for dataset caching.

    TRANSMF_CACHE_BUDGET_MB overrides. Default: 40% of the device's
    reported memory limit (leaves the majority for params, optimizer
    state and activations), or 6 GB when the backend reports no stats
    (CPU meshes)."""
    env = os.environ.get("TRANSMF_CACHE_BUDGET_MB")
    if env:
        return int(float(env) * 2**20)
    import jax

    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        limit = int(stats.get("bytes_limit", 0))
    except Exception:
        limit = 0
    if limit > 0:
        return int(0.4 * limit)
    return 6 * 2**30


def fits_budget(loader, mesh=None, budget: Optional[int] = None) -> bool:
    if budget is None:
        budget = hbm_budget()
    return cache_bytes(loader, mesh) <= budget


class DeviceCachedFeed:
    """Loader adapter yielding device-resident, mask-padded batches with
    zero per-epoch volume transfer after the one-time fill.

    Drop-in for `pipeline.DeviceFeed` in `Trainer.fit`/`evaluate`:
    `len`/`peek`/`batch_size` delegate to the wrapped loader, and
    `device_resident=True` tells the trainer the batches need no further
    padding or placement.
    """

    device_resident = True

    def __init__(self, loader, mesh=None, pad_to: Optional[int] = None):
        self.loader = loader
        self.mesh = mesh
        ds = _data_axis_size(mesh)
        base = loader.batch_size
        self.pad_to = pad_to if pad_to is not None else -(-base // ds) * ds
        if self.pad_to % ds:
            raise ValueError(
                f"pad_to={self.pad_to} does not divide the data axis ({ds})")
        self._store = None
        self._labels = None
        self._pos: Dict[int, int] = {}
        self._gather = None

    # ----- loader protocol -----

    def __len__(self):
        return len(self.loader)

    @property
    def batch_size(self):
        return self.loader.batch_size

    def peek(self):
        return self.loader.peek()

    # ----- cache fill -----

    def _fill(self):
        import jax
        import jax.numpy as jnp

        src = self.loader.source
        idxs = [int(i) for i in self.loader.indices]
        n = len(idxs)
        ds = _data_axis_size(self.mesh)
        n_pad = -(-n // ds) * ds
        self._pos = {s: j for j, s in enumerate(idxs)}
        shape, _, _ = _vol_shape(self.loader)
        dtype = np.dtype(src.dtype)

        labels = np.zeros(n_pad, np.int32)
        for j, s in enumerate(idxs):
            labels[j] = int(src.records[s]["label"])

        sharding = None
        if self.mesh is not None:
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as P

            sharding = NamedSharding(self.mesh, P("data"))

        def make(key):
            def rows(lo, hi):
                out = np.empty((hi - lo, *shape), dtype)
                for r in range(lo, hi):
                    out[r - lo] = (src[idxs[r]][key] if r < n
                                   else np.zeros(shape, dtype))
                return out

            if sharding is None:
                return jnp.asarray(rows(0, n_pad))
            # per-shard callback: decodes/transfers only the rows this
            # process's devices own (multi-host: no duplicated decode)
            return jax.make_array_from_callback(
                (n_pad, *shape), sharding,
                lambda idx: rows(*idx[0].indices(n_pad)[:2]))

        self._store = {k: make(k) for k in src.keys}
        if sharding is None:
            self._labels = jnp.asarray(labels)
        else:
            self._labels = jax.make_array_from_callback(
                (n_pad,), sharding,
                lambda idx, v=labels: v[idx[0]])
        self._build_gather()

    def _build_gather(self):
        import functools

        import jax
        import jax.numpy as jnp

        out_sharding = None
        if self.mesh is not None:
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as P

            out_sharding = NamedSharding(self.mesh, P("data"))

        def gather(store, labels, rows, n_real):
            out = {k: jnp.take(v, rows, axis=0) for k, v in store.items()}
            out["label"] = jnp.take(labels, rows, axis=0)
            out["mask"] = (jnp.arange(rows.shape[0])
                           < n_real).astype(jnp.float32)
            return out

        kw = {}
        if out_sharding is not None:
            keys = (*self.loader.source.keys, "label", "mask")
            kw["out_shardings"] = {k: out_sharding for k in keys}
        self._gather = functools.partial(jax.jit(gather, **kw),
                                         self._store, self._labels)

    # ----- iteration -----

    def __iter__(self):
        import jax.numpy as jnp

        if self._store is None:
            self._fill()
        pos = self._pos
        for idx in self.loader._batches():
            rows = np.empty(self.pad_to, np.int32)
            b = len(idx)
            for j, s in enumerate(idx):
                rows[j] = pos[int(s)]
            if b < self.pad_to:  # wrap-around duplicates (pipeline.pad_batch)
                rows[b:] = rows[np.arange(self.pad_to - b) % b]
            out = dict(self._gather(jnp.asarray(rows),
                                    jnp.asarray(b, jnp.int32)))
            out["_n_real"] = b  # host metadata (trainer BN-mask dispatch)
            yield out
