"""Shared kernel-dispatch helpers.

Pallas TPU kernels compile only on a real TPU backend; everywhere else
(CPU test meshes, the multichip dryrun, debugging) the SAME kernel code
runs in interpret mode. Centralizing the decision means `use_pallas=True`
exercises every kernel — including under `shard_map` on a virtual device
mesh — without each call site threading an `interpret` flag.
"""

from __future__ import annotations

import jax


def auto_interpret(interpret: bool = False) -> bool:
    """interpret=True if requested OR the backend cannot compile Mosaic."""
    return interpret or jax.default_backend() != "tpu"


def out_struct(shape, dtype, *refs):
    """ShapeDtypeStruct for a pallas_call out_shape, with `vma` set to the
    union of the reference arrays' varying-manual-axes.

    Under `jax.shard_map(..., check_vma=True)` every pallas output must
    declare which manual mesh axes it varies over; a kernel's outputs
    (including per-shard partial statistics) vary exactly over the axes
    its data inputs vary over. Outside shard_map all vmas are empty and
    this degenerates to a plain ShapeDtypeStruct."""
    vma = frozenset()
    for r in refs:
        vma |= jax.typeof(r).vma
    return jax.ShapeDtypeStruct(shape, dtype, vma=vma)


def reduce_ct(ct, primal):
    """Reduce a custom_vjp cotangent onto its primal's manual axes.

    Under `jax.shard_map` a replicated primal (e.g. a conv kernel or BN
    affine, in_spec P()) can receive a cotangent computed from sharded
    data, which varies over the data axis: the true cotangent of a
    replicated value is the SUM of the per-device contributions. JAX
    inserts that psum automatically for ops it differentiates itself, but
    a custom_vjp bwd must do it explicitly. Outside shard_map (or for a
    cotangent that already matches the primal) this is a no-op."""
    extra = jax.typeof(ct).vma - jax.typeof(primal).vma
    if extra:
        ct = jax.lax.psum(ct, tuple(extra))
    return ct
