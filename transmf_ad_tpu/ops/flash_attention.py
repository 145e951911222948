"""Fused multi-head attention kernel for TPU (Pallas).

The reference computes attention as separate einsum/softmax/einsum torch ops
(reference: models/networks.py:169-175). On TPU that materializes the (n, m)
score matrix in HBM between ops; this kernel keeps scores in VMEM and fuses
QK^T -> masked softmax -> PV into one pass per query block.

Design notes (TPU-first):
 - Grid: (batch*heads, n_q_blocks). Each program holds one query block plus
   the full K/V for its (batch, head) in VMEM — at TransMF scales even the
   full-resolution token grid (182^3 input -> 1,573 tokens, dim_head 128)
   needs < 2 MB of VMEM for K/V, so a single softmax pass is optimal; no
   online-softmax recurrence or extra HBM traffic.
 - Shapes are padded to (8, 128)-aligned tiles; key padding is masked to
   -inf pre-softmax (static lengths, baked at trace time).
 - Backward is a custom VJP using the standard recomputation formula in
   plain XLA ops (fused well by XLA); residuals are just (q, k, v).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._common import out_struct

_NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _attention_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, m_actual: int):
    q = q_ref[0].astype(jnp.float32)  # (BQ, D)
    k = k_ref[0].astype(jnp.float32)  # (Mp, D)
    v = v_ref[0].astype(jnp.float32)  # (Mp, D)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (BQ, Mp)
    mp = s.shape[-1]
    if m_actual < mp:  # mask key padding (static condition)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < m_actual, s, _NEG_INF)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.dot(p, v, preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


def _fused_attention_fwd_pallas(q, k, v, scale, block_q=256, interpret=False):
    """q: (BH, N, D), k/v: (BH, M, D) -> (BH, N, D)."""
    bh, n, d = q.shape
    m = k.shape[1]
    np_, mp = _round_up(n, 8), _round_up(m, 8)
    dp = _round_up(d, 128)
    block_q = min(block_q, _round_up(np_, 8))
    np_ = _round_up(np_, block_q)

    qp = jnp.pad(q, ((0, 0), (0, np_ - n), (0, dp - d)))
    kp = jnp.pad(k, ((0, 0), (0, mp - m), (0, dp - d)))
    vp = jnp.pad(v, ((0, 0), (0, mp - m), (0, dp - d)))

    grid = (bh, np_ // block_q)
    out = pl.pallas_call(
        functools.partial(_attention_kernel, scale=scale, m_actual=m),
        out_shape=out_struct((bh, np_, dp), q.dtype, q, k, v),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, dp), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mp, dp), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mp, dp), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, dp), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :n, :d]


def attention_reference(q, k, v, scale):
    """Plain-XLA attention core: softmax(q k^T * scale) v.

    q: (..., N, D), k/v: (..., M, D). Numerics in float32.
    """
    dt = q.dtype
    hi = jax.lax.Precision.HIGHEST
    s = jnp.einsum(
        "...nd,...md->...nm", q, k,
        preferred_element_type=jnp.float32, precision=hi,
    ) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum(
        "...nm,...md->...nd", p.astype(jnp.float32), v.astype(jnp.float32),
        precision=hi,
    ).astype(dt)


def _bwd_reference(scale, res, g):
    q, k, v = res
    qf, kf, vf, gf = (t.astype(jnp.float32) for t in (q, k, v, g))
    hi = jax.lax.Precision.HIGHEST
    s = jnp.einsum("...nd,...md->...nm", qf, kf, precision=hi) * scale
    p = jax.nn.softmax(s, axis=-1)
    dv = jnp.einsum("...nm,...nd->...md", p, gf, precision=hi)
    dp = jnp.einsum("...nd,...md->...nm", gf, vf, precision=hi)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("...nm,...md->...nd", ds, kf, precision=hi) * scale
    dk = jnp.einsum("...nm,...nd->...md", ds, qf, precision=hi) * scale
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_attention(q, k, v, scale, interpret=False):
    """Pallas fused attention with XLA-recompute backward.

    q: (B, H, N, D), k/v: (B, H, M, D) -> (B, H, N, D).
    """
    b, h, n, d = q.shape
    m = k.shape[2]
    out = _fused_attention_fwd_pallas(
        q.reshape(b * h, n, d), k.reshape(b * h, m, d), v.reshape(b * h, m, d),
        scale, interpret=interpret,
    )
    return out.reshape(b, h, n, d)


def _fused_fwd(q, k, v, scale, interpret):
    return fused_attention(q, k, v, scale, interpret), (q, k, v)


def _fused_bwd(scale, interpret, res, g):
    return _bwd_reference(scale, res, g)


fused_attention.defvjp(_fused_fwd, _fused_bwd)
