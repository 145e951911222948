"""Fused GAP/GMP token-pooling head (Pallas).

The fusion head concatenates [mean(mri), mean(pet), max(mri), max(pet)]
over the token axis (reference: models/networks.py:264-281, four separate
adaptive-pool modules + concat). Here one VMEM pass per (batch) computes
all four reductions and writes the concatenated (4*dim,) row directly —
no intermediate (B, dim) tensors in HBM. At TransMF scale this is a minor
op; it exists so the fusion path is end-to-end kernelized and stays cheap
at full-resolution token counts (1,573 tokens).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._common import out_struct


def _pool_kernel(mri_ref, pet_ref, o_ref, *, dim):
    mri = mri_ref[...].astype(jnp.float32)  # (B, N, D)
    pet = pet_ref[...].astype(jnp.float32)
    o_ref[:, 0 * dim : 1 * dim] = jnp.mean(mri, axis=1).astype(o_ref.dtype)
    o_ref[:, 1 * dim : 2 * dim] = jnp.mean(pet, axis=1).astype(o_ref.dtype)
    o_ref[:, 2 * dim : 3 * dim] = jnp.max(mri, axis=1).astype(o_ref.dtype)
    o_ref[:, 3 * dim : 4 * dim] = jnp.max(pet, axis=1).astype(o_ref.dtype)


def _pool_pallas(mri, pet, interpret=False):
    b, n, d = mri.shape
    # single program over the whole (small) token tensors: B*N*D stays a
    # few MB even at full-resolution token counts
    return pl.pallas_call(
        functools.partial(_pool_kernel, dim=d),
        out_shape=out_struct((b, 4 * d), mri.dtype, mri, pet),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(mri, pet)


def pool_reference(mri, pet):
    """concat[mean(mri), mean(pet), max(mri), max(pet)] over tokens."""
    return jnp.concatenate(
        [jnp.mean(mri, axis=1), jnp.mean(pet, axis=1),
         jnp.max(mri, axis=1), jnp.max(pet, axis=1)], axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_token_pool(mri, pet, use_pallas=None, interpret=False):
    """(B, N, D) x2 -> (B, 4D): fused dual-modality GAP+GMP."""
    use = use_pallas
    if use is None:
        use = jax.default_backend() == "tpu"
    if not use:
        return pool_reference(mri, pet)
    from ._common import auto_interpret

    return _pool_pallas(mri, pet, interpret=auto_interpret(interpret))


def _fwd(mri, pet, use_pallas, interpret):
    out = fused_token_pool(mri, pet, use_pallas, interpret)
    return out, (mri, pet)


def _bwd(use_pallas, interpret, res, g):
    mri, pet = res
    n = mri.shape[1]
    d = mri.shape[2]
    g_mean_m, g_mean_p, g_max_m, g_max_p = (
        g[:, :d], g[:, d : 2 * d], g[:, 2 * d : 3 * d], g[:, 3 * d :]
    )

    def back(x, g_mean, g_max):
        mean_part = jnp.broadcast_to(g_mean[:, None, :] / n, x.shape)
        # max subgradient: route to (all) argmax positions, split on ties
        is_max = (x == jnp.max(x, axis=1, keepdims=True)).astype(g_max.dtype)
        is_max = is_max / jnp.sum(is_max, axis=1, keepdims=True)
        return (mean_part + is_max * g_max[:, None, :]).astype(x.dtype)

    return back(mri, g_mean_m, g_max_m), back(pet, g_mean_p, g_max_p)


fused_token_pool.defvjp(_fwd, _bwd)
