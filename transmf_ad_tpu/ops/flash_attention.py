"""Fused multi-head attention kernels for TPU (Pallas).

The reference computes attention as separate einsum/softmax/einsum torch ops
(reference: models/networks.py:169-175). On TPU that materializes the (n, m)
score matrix in HBM between ops; these kernels keep scores in VMEM.

Two kernels, auto-selected by key count (`FLASH_MIN_KEYS`):

 - `fused_attention` — single-pass: grid (batch*heads, n_q_blocks), each
   program holds one query block plus the full K/V for its (batch, head) in
   VMEM. At TransMF scales (150-token conv grid, up to the 1,573-token
   182^3 full-resolution grid, dim_head 128) K/V is < 2 MB, so one softmax
   pass with no recurrence is optimal. Backward is a custom VJP using the
   standard recomputation formula in plain XLA ops (fused well by XLA).
 - `flash_attention` — KV-blocked online softmax for long sequences (beyond
   ~2k keys the single-pass score block and K/V stop fitting comfortably in
   VMEM): grid (batch*heads, n_q_blocks, n_kv_blocks) with the KV axis
   innermost; running max/sum and the output accumulator live in VMEM
   scratch across KV iterations, and the forward saves the per-row
   logsumexp. Backward is two Pallas kernels (dq: KV innermost; dk/dv:
   Q innermost) recomputing probabilities from the saved logsumexp —
   the (n, m) score matrix never exists in HBM forward OR backward.

Shapes are padded to (8, 128)-aligned tiles; key padding is masked to
-inf pre-softmax (static lengths, baked at trace time).
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


# ---------------------------------------------------------------------------
# KV-blocked online-softmax flash attention (long sequences)
#
# Layout notes: per-query-row scalars (running max m, running sum l, saved
# logsumexp, backward delta = rowsum(g*o)) are kept as (BQ, 1) COLUMNS —
# sublane-major — so they broadcast against (BQ, BK) score blocks without
# any sublane<->lane transpose (a Mosaic trap). The logsumexp/delta arrays
# are therefore shaped (BH, N, 1). The backward dk/dv kernel avoids
# materializing p^T by contracting over the query (sublane) dimension
# directly: dot_general((BQ,BK), (BQ,D), contract dim0/dim0) -> (BK, D).
# ---------------------------------------------------------------------------

FLASH_MIN_KEYS = 2048  # below this the single-pass kernel above is optimal


def _flash_block_sizes(n, m, block_q, block_k):
    if n < block_q:
        block_q = _round_up(n, 8)
    if m < block_k:
        block_k = _round_up(m, 8)
    return block_q, _round_up(n, block_q), block_k, _round_up(m, block_k)


def _flash_fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, acc_ref, m_ref,
                      l_ref, *, scale, m_actual, block_k, nk):
    kv = pl.program_id(2)

    @pl.when(kv == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    q = q_ref[0].astype(jnp.float32)            # (BQ, Dp)
    k = k_ref[0].astype(jnp.float32)            # (BK, Dp)
    v = v_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale                                   # (BQ, BK)
    if m_actual < nk * block_k:                 # mask key padding
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kv * block_k
        s = jnp.where(col < m_actual, s, _NEG_INF)
    m_prev, l_prev = m_ref[...], l_ref[...]     # (BQ, 1)
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    m_ref[...] = m_new
    l_ref[...] = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[...] = acc_ref[...] * alpha + jnp.dot(
        p, v, preferred_element_type=jnp.float32)

    @pl.when(kv == nk - 1)
    def _():
        o_ref[0] = (acc_ref[...] / l_ref[...]).astype(o_ref.dtype)
        lse_ref[0] = m_ref[...] + jnp.log(l_ref[...])


def _flash_fwd_pallas(q, k, v, scale, block_q, block_k, interpret):
    """q: (BH, N, D), k/v: (BH, M, D) -> out (BH, N, D), lse (BH, N, 1)."""
    bh, n, d = q.shape
    m = k.shape[1]
    dp = _round_up(d, 128)
    block_q, np_, block_k, mp = _flash_block_sizes(n, m, block_q, block_k)
    qp = jnp.pad(q, ((0, 0), (0, np_ - n), (0, dp - d)))
    kp = jnp.pad(k, ((0, 0), (0, mp - m), (0, dp - d)))
    vp = jnp.pad(v, ((0, 0), (0, mp - m), (0, dp - d)))
    nk = mp // block_k
    out, lse = pl.pallas_call(
        functools.partial(_flash_fwd_kernel, scale=scale, m_actual=m,
                          block_k=block_k, nk=nk),
        out_shape=[out_struct((bh, np_, dp), q.dtype, q, k, v),
                   out_struct((bh, np_, 1), jnp.float32, q, k, v)],
        grid=(bh, np_ // block_q, nk),
        in_specs=[
            pl.BlockSpec((1, block_q, dp), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, dp), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, dp), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, dp), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, dp), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
        ],
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :n, :d], lse[:, :n]


def _flash_dq_kernel(q_ref, k_ref, v_ref, g_ref, lse_ref, dl_ref, dq_ref,
                     acc_ref, *, scale, m_actual, block_k, nk):
    kv = pl.program_id(2)

    @pl.when(kv == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    if m_actual < nk * block_k:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kv * block_k
        s = jnp.where(col < m_actual, s, _NEG_INF)
    p = jnp.exp(s - lse_ref[0])                 # (BQ, BK); lse col-bcast
    dp = jax.lax.dot_general(
        g, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    ds = p * (dp - dl_ref[0])
    acc_ref[...] += jnp.dot(ds, k, preferred_element_type=jnp.float32) * scale

    @pl.when(kv == nk - 1)
    def _():
        dq_ref[0] = acc_ref[...].astype(dq_ref.dtype)


def _flash_dkv_kernel(q_ref, k_ref, v_ref, g_ref, lse_ref, dl_ref, dk_ref,
                      dv_ref, dk_acc, dv_acc, *, scale, m_actual, block_k,
                      nk, nq):
    i = pl.program_id(1)                        # kv block
    j = pl.program_id(2)                        # q block (innermost)

    @pl.when(j == 0)
    def _():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    q = q_ref[0].astype(jnp.float32)            # (BQ, Dp)
    k = k_ref[0].astype(jnp.float32)            # (BK, Dp)
    v = v_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale                                   # (BQ, BK)
    if m_actual < nk * block_k:                 # mask key padding
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + i * block_k
        s = jnp.where(col < m_actual, s, _NEG_INF)
    p = jnp.exp(s - lse_ref[0])
    # contract over the query (sublane) dim: no p^T materialization
    dv_acc[...] += jax.lax.dot_general(
        p, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(
        g, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    ds = p * (dp - dl_ref[0])
    dk_acc[...] += jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale

    @pl.when(j == nq - 1)
    def _():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def _flash_bwd_pallas(q, k, v, o, lse, g, scale, block_q, block_k,
                      interpret):
    bh, n, d = q.shape
    m = k.shape[1]
    dp = _round_up(d, 128)
    block_q, np_, block_k, mp = _flash_block_sizes(n, m, block_q, block_k)
    qp = jnp.pad(q, ((0, 0), (0, np_ - n), (0, dp - d)))
    kp = jnp.pad(k, ((0, 0), (0, mp - m), (0, dp - d)))
    vp = jnp.pad(v, ((0, 0), (0, mp - m), (0, dp - d)))
    gp = jnp.pad(g, ((0, 0), (0, np_ - n), (0, dp - d)))
    # delta_i = sum_d g*o per query row, (BH, Np, 1) column layout; padded
    # q rows have g = 0 so delta = 0 and ds = 0 there (no masking needed)
    delta = jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32), axis=-1,
                    keepdims=True)
    deltap = jnp.pad(delta, ((0, 0), (0, np_ - n), (0, 0)))
    lsep = jnp.pad(lse, ((0, 0), (0, np_ - n), (0, 0)))
    nq, nk = np_ // block_q, mp // block_k

    q_spec = pl.BlockSpec((1, block_q, dp), lambda b, i, j: (b, i, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, block_k, dp), lambda b, i, j: (b, j, 0),
                           memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0),
                            memory_space=pltpu.VMEM)
    dq = pl.pallas_call(
        functools.partial(_flash_dq_kernel, scale=scale, m_actual=m,
                          block_k=block_k, nk=nk),
        out_shape=out_struct((bh, np_, dp), q.dtype, q, k, v, g),
        grid=(bh, nq, nk),
        in_specs=[q_spec, kv_spec, kv_spec, q_spec, col_spec, col_spec],
        out_specs=q_spec,
        scratch_shapes=[pltpu.VMEM((block_q, dp), jnp.float32)],
        interpret=interpret,
    )(qp, kp, vp, gp, lsep, deltap)

    # q innermost here: index maps swap roles of (i, j)
    q_spec2 = pl.BlockSpec((1, block_q, dp), lambda b, i, j: (b, j, 0),
                           memory_space=pltpu.VMEM)
    kv_spec2 = pl.BlockSpec((1, block_k, dp), lambda b, i, j: (b, i, 0),
                            memory_space=pltpu.VMEM)
    col_spec2 = pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, j, 0),
                             memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_flash_dkv_kernel, scale=scale, m_actual=m,
                          block_k=block_k, nk=nk, nq=nq),
        out_shape=[out_struct((bh, mp, dp), k.dtype, q, k, v, g),
                   out_struct((bh, mp, dp), v.dtype, q, k, v, g)],
        grid=(bh, nk, nq),
        in_specs=[q_spec2, kv_spec2, kv_spec2, q_spec2, col_spec2,
                  col_spec2],
        out_specs=[kv_spec2, kv_spec2],
        scratch_shapes=[pltpu.VMEM((block_k, dp), jnp.float32),
                        pltpu.VMEM((block_k, dp), jnp.float32)],
        interpret=interpret,
    )(qp, kp, vp, gp, lsep, deltap)
    return dq[:, :n, :d], dk[:, :m, :d], dv[:, :m, :d]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def flash_attention(q, k, v, scale, block_q=512, block_k=512,
                    interpret=False):
    """KV-blocked online-softmax attention for long sequences.

    q: (B, H, N, D), k/v: (B, H, M, D) -> (B, H, N, D). The (N, M) score
    matrix never exists in HBM, forward or backward; VMEM use is
    O(block_q * block_k). Numerics: f32 in-kernel compute, output rounded
    to the input dtype. `attention_core` routes here automatically above
    `FLASH_MIN_KEYS` keys (resolution-scaling path, e.g. 182^3 volumes at
    higher patch densities); below it the single-pass kernel wins.
    """
    b, h, n, d = q.shape
    m = k.shape[2]
    out, _ = _flash_fwd_pallas(
        q.reshape(b * h, n, d), k.reshape(b * h, m, d),
        v.reshape(b * h, m, d), scale, block_q, block_k, interpret)
    return out.reshape(b, h, n, d)


def _flash_fwd_rule(q, k, v, scale, block_q, block_k, interpret):
    b, h, n, d = q.shape
    m = k.shape[2]
    out, lse = _flash_fwd_pallas(
        q.reshape(b * h, n, d), k.reshape(b * h, m, d),
        v.reshape(b * h, m, d), scale, block_q, block_k, interpret)
    return out.reshape(b, h, n, d), (q, k, v, out.reshape(b, h, n, d), lse)


def _flash_bwd_rule(scale, block_q, block_k, interpret, res, g):
    q, k, v, o, lse = res
    b, h, n, d = q.shape
    m = k.shape[2]
    dq, dk, dv = _flash_bwd_pallas(
        q.reshape(b * h, n, d), k.reshape(b * h, m, d),
        v.reshape(b * h, m, d), o.reshape(b * h, n, d), lse,
        g.reshape(b * h, n, d), scale, block_q, block_k, interpret)
    return (dq.reshape(b, h, n, d), dk.reshape(b, h, m, d),
            dv.reshape(b, h, m, d))


flash_attention.defvjp(_flash_fwd_rule, _flash_bwd_rule)
