"""Per-channel Σ/Σ² BatchNorm statistics as a Pallas reduction kernel.

reference: the BN layers of every sNet body block (reference:
models/networks.py:28-52) compute batch statistics over (B, X, Y, Z).

Why a kernel: XLA lowers the f32 statistics reduction of a bf16 NDHWC
tensor as a `convert_reduce` fusion that materializes an f32 copy in a
y-minor layout (~50 GB/s effective, 2.2+1.9 ms per modality at the s2
stage — profiled in docs/PERFORMANCE.md). Reading the bf16 tensor once,
as (Y, Z*C) row slabs with two in-VMEM f32 row-reductions per grid step,
runs at HBM bandwidth and needs no layout change. This is the same
epilogue `ops/stem.py::stem_conv_stats` fuses into the stem conv, made
standalone so every XLA body conv gets it too.

The backward is the linear broadcast gy = g_sum + 2*y*g_sumsq, assembled
in the storage dtype so XLA fuses it into the neighbouring elementwise
backward work instead of materializing f32 full-resolution copies (the
f32 formulation measurably costs ~10 ms/step at the stem — same trap).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._common import auto_interpret, out_struct


def _stats_kernel(y_ref, st_ref):
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        st_ref[...] = jnp.zeros_like(st_ref)

    blk = y_ref[0, 0].astype(jnp.float32)  # (Y, Z*C)
    st_ref[0:1] += jnp.sum(blk, axis=0, keepdims=True)
    st_ref[1:2] += jnp.sum(blk * blk, axis=0, keepdims=True)


def _stats_pallas(y, interpret=False):
    b, X, Y, Z, C = y.shape
    y2 = y.reshape(b, X, Y, Z * C)
    st = pl.pallas_call(
        _stats_kernel,
        out_shape=out_struct((2, Z * C), jnp.float32, y2),
        grid=(b, X),
        in_specs=[
            pl.BlockSpec((1, 1, Y, Z * C), lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, Z * C), lambda bi, i: (0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(y2)
    return st.reshape(2, Z, C).sum(axis=1)  # (2, C): [Σ, Σ²]


def _stats_reference(y):
    yf = y.astype(jnp.float32)
    axes = tuple(range(y.ndim - 1))
    return jnp.stack([jnp.sum(yf, axis=axes),
                      jnp.sum(jax.lax.square(yf), axis=axes)])


def stats_profitable(y) -> bool:
    """Lane-width / size gate: row slabs need a reasonable lane count
    (tiny collapsed axes, e.g. MiSePyNet's Z=1 slices, would be all grid
    overhead) and enough data for the pass to matter."""
    if y.ndim != 5:
        return False
    Z, C = y.shape[-2], y.shape[-1]
    return Z * C >= 128 and int(np.prod(y.shape)) >= (1 << 18)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def channel_stats(y, use_pallas=True, interpret=False):
    """(B, X, Y, Z, C) -> (2, C) f32 [Σ, Σ²] over all non-channel axes."""
    if not use_pallas:
        return _stats_reference(y)
    return _stats_pallas(y, interpret=auto_interpret(interpret))


def _cs_fwd(y, use_pallas, interpret):
    return channel_stats(y, use_pallas, interpret), y


def _cs_bwd(use_pallas, interpret, y, g):
    # d Σ/dy = 1, d Σ²/dy = 2y; broadcast in storage dtype (see module doc)
    g0 = g[0].astype(y.dtype)
    g1 = (2.0 * g[1]).astype(y.dtype)
    return (g0 + y * g1,)


channel_stats.defvjp(_cs_fwd, _cs_bwd)
