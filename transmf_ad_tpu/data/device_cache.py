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

__all__ = ["DeviceCachedFeed", "HybridCachedFeed", "fits_budget",
           "cache_bytes", "hbm_budget"]


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
        if getattr(loader, "sample_transform", None) is not None:
            # the cache stores raw decoded volumes and gathers them on
            # device — a host per-sample transform would silently never
            # run (Trainer.fit only guards the cfg.aug_exact case)
            raise ValueError(
                "DeviceCachedFeed cannot apply the loader's host-side "
                "sample_transform (cached volumes never revisit the host); "
                "stream with pipeline.DeviceFeed instead")
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


class HybridCachedFeed:
    """Hot/cold tiered feed for datasets OVER the HBM budget.

    `DeviceCachedFeed` is all-or-nothing: one volume over budget and the
    whole epoch falls back to streaming — at full resolution that means
    every batch crosses the host->device link. Here the first K rows of
    the loader's index list that fit the budget live in an HBM store
    ("hot" tier); per batch, hot rows are gathered ON DEVICE and only the
    cold rows are transferred, shrinking the per-epoch H2D bytes by the
    hot fraction.

     - Batch ORDER stays bit-identical to the host path (the wrapped
       Loader's `_batches()` drives the epoch: same shuffle RNG,
       drop_last, seed); each batch is reassembled in place by a jitted
       scatter of the streamed rows into the gathered ones.
     - The scatter executable specializes on the cold-row count, bucketed
       to powers of two (<= log2(batch)+2 trivial variants, all hitting
       the persistent compile cache).
     - Labels for ALL rows live on device (4 bytes each).
     - Cold-row host batches are assembled and their transfers dispatched
       by a background thread `depth` batches ahead (same overlap
       discipline as pipeline.DeviceFeed).

    Single-process, unsharded (mesh=None) — `Trainer.fit` gates; the
    per-device budget of a data-parallel mesh divides by the data-axis
    size, so multi-chip runs mostly fit the full cache instead.
    """

    device_resident = True

    def __init__(self, loader, pad_to: Optional[int] = None,
                 budget: Optional[int] = None, depth: int = 2):
        if getattr(loader, "sample_transform", None) is not None:
            raise ValueError(
                "HybridCachedFeed cannot apply the loader's host-side "
                "sample_transform to hot-tier rows; stream with "
                "pipeline.DeviceFeed instead")
        self.loader = loader
        self.pad_to = pad_to if pad_to is not None else loader.batch_size
        self.depth = max(1, depth)
        if budget is None:
            budget = hbm_budget()
        shape, itemsize, n_keys = _vol_shape(loader)
        self._shape = shape
        row_bytes = int(np.prod(shape)) * itemsize * n_keys
        self.n_hot = min(len(loader.indices), max(0, budget // row_bytes))
        self._store = None
        self._labels = None
        self._pos: Dict[int, int] = {}

    # ----- loader protocol -----

    def __len__(self):
        return len(self.loader)

    @property
    def batch_size(self):
        return self.loader.batch_size

    def peek(self):
        return self.loader.peek()

    @property
    def hot_fraction(self) -> float:
        return self.n_hot / max(1, len(self.loader.indices))

    # ----- fill -----

    def _fill(self):
        import jax.numpy as jnp

        src = self.loader.source
        idxs = [int(i) for i in self.loader.indices]
        hot = idxs[: self.n_hot]
        self._pos = {s: j for j, s in enumerate(hot)}
        self._all_pos = {s: j for j, s in enumerate(idxs)}
        dtype = np.dtype(src.dtype)

        def stack(key):
            out = np.empty((max(1, len(hot)), *self._shape), dtype)
            for j, s in enumerate(hot):
                out[j] = src[s][key]
            return jnp.asarray(out)

        self._store = {k: stack(k) for k in src.keys}
        labels = np.asarray(
            [int(src.records[s]["label"]) for s in idxs], np.int32)
        self._labels = jnp.asarray(labels)
        self._build_combine()

    def _build_combine(self):
        import functools

        import jax
        import jax.numpy as jnp

        def combine(store, labels, rows_store, rows_all, cold_pos,
                    streamed, n_real):
            out = {k: jnp.take(v, rows_store, axis=0)
                   for k, v in store.items()}
            if streamed:  # scatter the transferred cold rows in place
                for k in out:
                    out[k] = out[k].at[cold_pos].set(streamed[k])
            out["label"] = jnp.take(labels, rows_all, axis=0)
            out["mask"] = (jnp.arange(rows_store.shape[0])
                           < n_real).astype(jnp.float32)
            return out

        self._combine = functools.partial(
            jax.jit(combine), self._store, self._labels)

    # ----- iteration -----

    def _host_batches(self):
        """Per loader batch: (rows_store, rows_all, cold_pos, streamed, b)
        as numpy — the transfer-ready description of one batch."""
        src = self.loader.source
        pos, all_pos = self._pos, self._all_pos
        keys = src.keys
        for idx in self.loader._batches():
            b = len(idx)
            padded = [int(s) for s in idx]
            if b < self.pad_to:  # wrap-around duplicates (pipeline.pad_batch)
                padded += [padded[j % b] for j in range(self.pad_to - b)]
            rows_store = np.zeros(self.pad_to, np.int32)
            rows_all = np.empty(self.pad_to, np.int32)
            cold = []
            for j, s in enumerate(padded):
                rows_all[j] = all_pos[s]
                if s in pos:
                    rows_store[j] = pos[s]
                else:
                    cold.append((j, s))
            if cold:
                items = src.get_batch([s for _, s in cold])
                streamed = {k: np.stack([it[k] for it in items])
                            for k in keys}
                cold_pos = np.asarray([j for j, _ in cold], np.int32)
                # bucket the cold count to a power of two so the scatter
                # compiles O(log batch) variants; padding repeats the last
                # real row/position (a duplicate scatter of the same value
                # is a no-op)
                m = len(cold)
                cap = 1
                while cap < m:
                    cap *= 2
                cap = min(cap, self.pad_to)
                if m < cap:
                    pad = cap - m
                    cold_pos = np.concatenate(
                        [cold_pos, np.repeat(cold_pos[-1:], pad)])
                    streamed = {k: np.concatenate(
                        [v, np.repeat(v[-1:], pad, axis=0)])
                        for k, v in streamed.items()}
            else:
                streamed, cold_pos = {}, np.zeros(0, np.int32)
            yield rows_store, rows_all, cold_pos, streamed, b

    def __iter__(self):
        import queue
        import threading

        import jax.numpy as jnp

        if self._store is None:
            self._fill()

        q: queue.Queue = queue.Queue(maxsize=self.depth)
        DONE = object()

        def worker():
            # assemble + DISPATCH the cold-row transfers ahead of
            # consumption: jnp.asarray enqueues an async H2D copy, so the
            # link stays busy while the consumer's step computes
            try:
                for rs, ra, cp, streamed, b in self._host_batches():
                    dev = (jnp.asarray(rs), jnp.asarray(ra),
                           jnp.asarray(cp),
                           {k: jnp.asarray(v) for k, v in streamed.items()},
                           b)
                    q.put(dev)
                q.put(DONE)
            except BaseException as e:
                q.put(e)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is DONE:
                return
            if isinstance(item, BaseException):
                raise item
            rs, ra, cp, streamed, b = item
            out = dict(self._combine(rs, ra, cp, streamed,
                                     jnp.asarray(b, jnp.int32)))
            out["_n_real"] = b
            yield out
