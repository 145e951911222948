"""Host-side data pipeline: decode -> cache -> batch -> prefetch -> device.

The reference re-loads and re-transforms every NIfTI from disk every epoch
through a single-threaded DataLoader (reference: kfold_train_adversarial.py:60-66,
num_workers=0) — host decode is its throughput bottleneck. Here:

 - decoded, intensity-normalized volumes are cached in host RAM after the
   first epoch (`VolumeSource`);
 - batches are assembled by a background thread into a bounded queue
   (`Loader`), overlapping host work with device steps;
 - `device_prefetch` keeps N batches in-flight on the device (double
   buffering), placing them with an optional `jax.sharding.Sharding` so
   data-parallel feeds land shard-by-shard over ICI.

Random augmentations are NOT applied here — they are jitted device ops
(see `transforms.augment_batch`), keyed per step inside the train loop.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterable, Iterator, List, Optional, Sequence

import numpy as np

from . import nifti
from .transforms import spatial_pad

VOLUME_KEYS = ("MRI", "PET")


def _minmax(vol: np.ndarray) -> np.ndarray:
    lo, hi = float(vol.min()), float(vol.max())
    if hi <= lo:
        return np.zeros_like(vol)
    return (vol - lo) / (hi - lo)


class VolumeSource:
    """Decodes ADNI records to normalized volumes, with a RAM cache.

    `dtype` is the cache/transfer dtype. Decode and min-max normalization
    always run in float32; the cast happens once at cache-fill time. With
    `dtype=bfloat16` (the TPU compute dtype — see `train.trainer
    .resolve_dtype`) the RAM cache and every host->device transfer are
    HALF the bytes of float32, with no numerical cost to training: the
    model casts activations to bfloat16 at the stem anyway, and device-
    side augmentation resamples in float32 regardless of input dtype
    (`transforms._affine_resample`).

    `dtype=uint8` quantizes the [0,1]-normalized volume to q=round(255*x)
    (requires `normalize=True`): RAM cache, H2D transfer and the HBM
    dataset cache all shrink to a QUARTER of float32 / HALF of bfloat16.
    The training/eval steps dequantize on device (q/255, fused into the
    input chain — `train.steps.dequantize_input`). Quantization step
    1/255 = 0.0039 is the same order as bfloat16's relative precision
    (2^-8) at mid-range intensities; opt-in for feed-bound pipelines
    (see docs/PERFORMANCE.md "Streamed-feed ceiling").
    """

    def __init__(
        self,
        records: Sequence[Dict],
        keys: Sequence[str] = VOLUME_KEYS,
        pad_to: Optional[tuple] = None,
        normalize: bool = True,
        cache: bool = True,
        use_native: Optional[bool] = None,
        dtype=np.float32,
    ):
        self.records = list(records)
        self.keys = tuple(keys)
        self.pad_to = pad_to
        self.normalize = normalize
        self.dtype = np.dtype(dtype)
        if self.dtype == np.uint8 and not normalize:
            raise ValueError(
                "dtype=uint8 quantizes the [0,1]-normalized volume; "
                "it requires normalize=True")
        self._cache: Optional[List] = [None] * len(self.records) if cache else None
        self._lock = threading.Lock()
        if use_native is None:
            from . import native_loader

            use_native = native_loader.available()
        self.use_native = use_native

    def __len__(self):
        return len(self.records)

    def _decode_vol(self, path: str) -> np.ndarray:
        if self.use_native:
            from . import native_loader

            shape = native_loader.peek_dims(path)
            return native_loader.decode(path, shape, self.normalize)
        vol = nifti.load(path, dtype=np.float32)
        return _minmax(vol) if self.normalize else vol

    def _finalize(self, vol: np.ndarray) -> np.ndarray:
        if self.pad_to is not None:
            vol = spatial_pad(vol, self.pad_to)
        if vol.dtype != self.dtype:
            if self.dtype == np.uint8:  # quantize the normalized volume
                vol = (vol * 255.0 + 0.5).astype(np.uint8)
            else:
                vol = vol.astype(self.dtype)
        return vol

    def _decode(self, rec: Dict) -> Dict:
        out = {"label": np.int32(rec["label"])}
        for k in self.keys:
            out[k] = self._finalize(self._decode_vol(rec[k]))
        return out

    def __getitem__(self, i: int) -> Dict:
        if self._cache is None:
            return self._decode(self.records[i])
        item = self._cache[i]
        if item is None:
            item = self._decode(self.records[i])
            with self._lock:
                self._cache[i] = item
        return item

    def get_batch(self, idx: Sequence[int]) -> List[Dict]:
        """Fetch a batch, decoding cache misses through the C++ worker pool
        (`native_loader.decode_batch`) when all missing volumes of a key
        share one shape; mixed shapes fall back to per-volume decode."""
        idx = [int(i) for i in idx]
        missing = [
            i for i in idx
            if self._cache is None or self._cache[i] is None
        ]
        decoded: Dict[int, Dict] = {}
        if self.use_native and len(missing) > 1:
            from . import native_loader

            decoded = {i: {"label": np.int32(self.records[i]["label"])}
                       for i in missing}
            complete = True

            for k in self.keys:
                paths = [self.records[i][k] for i in missing]
                dims = {native_loader.peek_dims(p) for p in paths}
                if len(dims) != 1:
                    complete = False
                    break
                vols = native_loader.decode_batch(paths, dims.pop(),
                                                  self.normalize)
                for j, i in enumerate(missing):
                    decoded[i][k] = self._finalize(vols[j])
            if not complete:
                decoded = {}
            elif self._cache is not None:
                with self._lock:
                    for i in missing:
                        self._cache[i] = decoded[i]
        return [decoded[i] if i in decoded else self[i] for i in idx]


class Loader:
    """Iterable over stacked numpy batches with background prefetch.

    Matches reference loader semantics (batch, shuffle, drop_last); unlike
    the reference it overlaps decode/stack with compute via a worker thread.
    """

    def __init__(
        self,
        source: VolumeSource,
        indices: Optional[Sequence[int]] = None,
        batch_size: int = 2,
        shuffle: bool = False,
        drop_last: bool = False,
        seed: int = 0,
        prefetch: int = 2,
        sample_transform=None,
    ):
        self.source = source
        self.indices = np.asarray(
            indices if indices is not None else np.arange(len(source)), dtype=np.int64
        )
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.prefetch = max(1, prefetch)
        # host-side per-sample transform (e.g. data.exact_monai's exact
        # MONAI augmentation); applied after decode/cache, never mutates
        # cached items, skipped by `peek` (shape probing only)
        self.sample_transform = sample_transform
        self._rng = np.random.default_rng(seed)
        self._epoch = 0

    def __len__(self):
        n = len(self.indices)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _batches(self) -> Iterator[np.ndarray]:
        order = self.indices.copy()
        if self.shuffle:
            self._rng.shuffle(order)
        n = len(order)
        stop = (n // self.batch_size) * self.batch_size if self.drop_last else n
        for s in range(0, stop, self.batch_size):
            yield order[s : s + self.batch_size]

    def peek(self) -> Dict[str, np.ndarray]:
        """A representative batch, assembled synchronously (for shape
        probing / model init); does not disturb the shuffle RNG."""
        idx = self.indices[: self.batch_size]
        return self._stack([self.source[int(i)] for i in idx])

    @staticmethod
    def _stack(items: List[Dict]) -> Dict[str, np.ndarray]:
        batch = {}
        for k in items[0]:
            batch[k] = np.stack([it[k] for it in items])
        return batch

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        self._epoch += 1
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        DONE = object()

        def worker():
            try:
                for idx in self._batches():
                    items = (self.source.get_batch(idx)
                             if hasattr(self.source, "get_batch")
                             else [self.source[int(i)] for i in idx])
                    if self.sample_transform is not None:
                        items = [self.sample_transform(it) for it in items]
                    q.put(self._stack(items))
                q.put(DONE)
            except BaseException as e:  # surface decode errors in the consumer
                q.put(e)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is DONE:
                return
            if isinstance(item, BaseException):
                raise item
            yield item


def pad_batch(batch: Dict[str, np.ndarray], pad_to: int) -> Dict[str, np.ndarray]:
    """Pad a ragged batch to a fixed leading size and attach a validity
    mask, so every step of an epoch hits ONE compiled executable and a
    shape every mesh data-axis divides (jax.shard_map requires it).

    Short batches are padded by REPEATING real samples (wrap-around)
    rather than zeros: the masked loss/metrics ignore the duplicates
    entirely, and BatchNorm batch statistics — which see the whole batch —
    average over real volumes instead of zero-filled ones. (The residual
    deviation from the reference, which feeds the short batch as-is, is
    that the final batch's BN statistics weight a few samples twice.)
    """
    n = batch["label"].shape[0]
    mask = np.zeros(pad_to, np.float32)
    mask[:n] = 1.0
    out = {}
    for k, v in batch.items():
        v = np.asarray(v)
        if n < pad_to:
            reps = np.take(v, np.arange(pad_to - n) % n, axis=0)
            v = np.concatenate([v, reps])
        out[k] = v
    out["mask"] = mask
    return out


def device_prefetch(batches: Iterable[Dict], sharding=None, depth: int = 2):
    """Move batches to device `depth` steps ahead of consumption.

    With a `NamedSharding(mesh, P('data'))` this shards the leading batch
    axis across the mesh's data axis as part of the host->HBM transfer.
    A ragged final batch whose leading axis does not divide the sharding
    falls back to an uncommitted transfer (replicated under jit) instead
    of failing.
    """
    import jax
    import jax.numpy as jnp

    multi_host = jax.process_count() > 1

    def place(x):
        if sharding is not None:
            try:
                if multi_host:
                    # each process transfers only the rows its devices own
                    # (every process sees the same global host batch)
                    v = np.asarray(x)
                    return jax.make_array_from_callback(
                        v.shape, sharding, lambda idx, v=v: v[idx])
                return jax.device_put(x, sharding)
            except ValueError:  # leading axis not divisible by the mesh
                pass
        return jnp.asarray(x)

    def put(b):
        # '_n_real' is HOST metadata (the real-sample count the trainer
        # dispatches on) — carried around the transfer, never traced
        n = b.pop("_n_real", None) if isinstance(b, dict) else None
        out = jax.tree_util.tree_map(place, b)
        if n is not None:
            out["_n_real"] = n
        return out

    buf: List = []
    it = iter(batches)
    try:
        for _ in range(depth):
            buf.append(put(next(it)))
    except StopIteration:
        pass
    for nxt in it:
        out = buf.pop(0)
        buf.append(put(nxt))
        yield out
    while buf:
        yield buf.pop(0)


class DeviceFeed:
    """Loader adapter: iteration yields batches already resident on device,
    transferred `depth` steps ahead of consumption (double-buffered H2D so
    the copy overlaps the previous train step). Used by `Trainer.fit` as
    the production feed; delegates `len`/`peek` to the wrapped loader."""

    def __init__(self, loader, sharding=None, depth: int = 2,
                 pad_to: Optional[int] = None):
        self.loader = loader
        self.sharding = sharding
        self.depth = depth
        self.pad_to = pad_to  # fixed batch size (see pad_batch)

    def __len__(self):
        return len(self.loader)

    def peek(self):
        return self.loader.peek()

    def __iter__(self):
        it = iter(self.loader)
        if self.pad_to is not None:
            def padded(it):
                for b in it:
                    n = int(b["label"].shape[0])
                    pb = pad_batch(b, self.pad_to)
                    pb["_n_real"] = n  # host metadata (see device_prefetch)
                    yield pb
            it = padded(it)
        return device_prefetch(it, self.sharding, self.depth)
