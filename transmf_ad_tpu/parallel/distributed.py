"""Multi-host (multi-process) training over JAX's distributed runtime.

The reference is strictly single-device (reference:
kfold_train_adversarial.py:24 pins cuda:0; there is no DDP/NCCL/MPI
anywhere), so multi-host is a new TPU-native capability, not a port. The
single-host design — one jitted SPMD step under `jax.shard_map` over a
named Mesh — already contains everything multi-host needs: the same
program simply runs on every process (one per host of a pod slice), the
Mesh spans all hosts' devices, and the existing psums (BatchNorm
statistics, loss terms, gradients) become cross-host collectives that XLA
routes over ICI within a host and DCN between hosts.

What this module adds is the host-side plumbing that SPMD requires:

- `init_distributed`: `jax.distributed.initialize` from TrainerConfig /
  CLI flags (or TPU-pod auto-detection), before any other jax call.
- `make_hybrid_mesh`: a DCN-aware device layout — the 'data' axis varies
  slowest across processes, so tensor-parallel ('model') collectives stay
  on intra-host ICI and only the gradient/BN all-reduces cross DCN.
- `place_global`: build a globally-sharded batch array when this process
  can only address its own devices (`jax.make_array_from_callback`; each
  process materializes H2D bytes only for its own shards).
- `fetch_global`: the inverse — bring a (possibly non-addressable) step
  output back to every host as numpy (`multihost_utils.process_allgather`
  for sharded outputs; plain device_get for replicated ones).
- `is_primary`: gates checkpoint writes, log files and partition snapshots
  to process 0 so hosts do not race on shared storage.

Every process feeds the SAME global host batch (loaders are seeded
identically, and `place_global` slices out the local shards), so control
flow is trivially SPMD-consistent: epoch lengths, padding decisions and
compile shapes agree by construction. Host decode is thus duplicated
across hosts — bounded by the RAM cache after epoch one; per-host decode
sharding is a pure-IO optimization left to the VolumeSource cache layer.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None,
                     local_device_ids: Optional[Sequence[int]] = None) -> bool:
    """Join the JAX distributed runtime. Call before any other jax use.

    Three modes:
      - no arguments and not on a multi-host platform: no-op (returns
        False) — single-process behavior is completely unchanged;
      - `coordinator_address='auto'`: TPU-pod style auto-detection
        (`jax.distributed.initialize()` with no args);
      - explicit coordinator/num_processes/process_id: any fabric,
        including multi-process CPU (Gloo) used by the tests.
    """
    if coordinator_address is None and num_processes is None:
        return False
    if num_processes is not None and int(num_processes) <= 1 \
            and coordinator_address in (None, "", "auto"):
        return False
    kw = {}
    if coordinator_address and coordinator_address != "auto":
        kw["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kw["num_processes"] = int(num_processes)
    if process_id is not None:
        kw["process_id"] = int(process_id)
    if local_device_ids is not None:
        kw["local_device_ids"] = [int(i) for i in local_device_ids]
    try:
        jax.distributed.initialize(**kw)
    except RuntimeError:  # idempotent: kfold init + Trainer init both call
        if jax.process_count() < (int(num_processes) if num_processes else 2):
            raise
    return True


def process_count() -> int:
    return jax.process_count()


def is_primary() -> bool:
    """True on the process that owns side effects (checkpoints, logs)."""
    return jax.process_index() == 0


def make_hybrid_mesh(axes: Dict[str, int]):
    """A Mesh over all hosts with DCN-aware device order: axes are laid
    out so the FIRST axis ('data' in the trainer's {'data': d, 'model': m}
    convention) is the one split across processes — its collectives ride
    DCN — while later axes ('model') stay inside a host on ICI.

    Requires: the product of per-process axis extents to equal the local
    device count, and the leading axis to be divisible by process_count.
    """
    from jax.experimental import mesh_utils
    from jax.sharding import Mesh

    names = tuple(axes.keys())
    sizes = [int(s) for s in axes.values()]
    nproc = jax.process_count()
    if nproc == 1:
        from .mesh import make_mesh

        return make_mesh(dict(zip(names, sizes)))
    if sizes[0] % nproc != 0:
        raise ValueError(
            f"leading mesh axis {names[0]}={sizes[0]} must divide across "
            f"{nproc} processes")
    ici = [sizes[0] // nproc, *sizes[1:]]
    dcn = [nproc] + [1] * (len(sizes) - 1)
    try:
        devices = mesh_utils.create_hybrid_device_mesh(
            ici, dcn, devices=jax.devices())
    except ValueError:
        # non-TPU fabrics (multi-process CPU/Gloo) carry no slice_index;
        # group by process instead: leading axis varies slowest across
        # processes, later axes stay within one
        devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
        devices = np.asarray(devs).reshape(sizes)
    return Mesh(devices, names)


def place_global(batch: Dict[str, np.ndarray], sharding) -> Dict:
    """Transfer a host batch to a (possibly multi-host) sharding.

    Every process passes the same full GLOBAL batch; each materializes and
    transfers only the rows its addressable devices own. Single-process
    this is exactly `jax.device_put`.
    """
    if jax.process_count() == 1:
        return {k: jax.device_put(v, sharding) for k, v in batch.items()}

    def put(v):
        v = np.asarray(v)
        return jax.make_array_from_callback(
            v.shape, sharding, lambda idx, v=v: v[idx])

    return {k: put(v) for k, v in batch.items()}


def put_replicated(x, sharding):
    """Replicate one array onto a (possibly multi-host) sharding.

    `jax.device_put` handles ordinary arrays across processes, but rejects
    PRNG key arrays (extended dtypes) on non-addressable shardings — so
    keys round-trip through their uint32 key data.
    """
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    if jax.dtypes.issubdtype(getattr(x, "dtype", None), jax.dtypes.prng_key):
        impl = jax.random.key_impl(x)
        data = np.asarray(jax.random.key_data(x))
        arr = jax.make_array_from_callback(
            data.shape, sharding, lambda idx: data[idx])
        return jax.random.wrap_key_data(arr, impl=impl)
    return jax.device_put(x, sharding)


def fetch_global(x) -> np.ndarray:
    """Bring a step output back to THIS host as numpy, whatever its
    sharding: addressable/replicated arrays fetch directly; arrays with
    shards on other hosts all-gather first (tiny logits/mask tensors —
    never volumes)."""
    if not hasattr(x, "sharding"):
        return np.asarray(x)
    if getattr(x, "is_fully_addressable", True) or x.is_fully_replicated:
        return np.asarray(jax.device_get(x))
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


class NullLogger:
    """Logger interface for non-primary processes: no file, no stdout.

    Multi-host SPMD runs the identical training loop on every process;
    only process 0 should write log.txt / echo to the console (the
    reference never faced this — single device, single process).
    """

    def print_message(self, msg: str):  # noqa: D401 - interface parity
        pass

    def print_message_nocli(self, msg: str):
        pass
