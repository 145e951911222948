"""Stem conv + BN statistics + 2x2x2 max-pool in one fused Pallas pass.

reference: the sNet stage-1 block Conv3d(1->dim/4) + BN + LeakyReLU +
MaxPool3d(2,2) (reference: models/networks.py:21-26).

Round-2 split this stage into three kernels (banded-MXU stem conv with a
stats epilogue, then a fused affine+act+pool kernel, then a banded dw
kernel) — but the full-resolution stage-1 tensor (462 MB bf16 at the
production shape) still made a round trip through HBM between conv and
pool, and two more in the backward. This module removes it entirely:

Forward — `stem_pool_minmax(x, w) -> (ymax, ymin, st)`, ONE kernel:
each grid step convolves an x-row PAIR in-register (two banded-MXU
matmuls, same R matrix as ops/stem.py), accumulates per-lane Σ/Σ² of the
f32 accumulator, rounds to the storage dtype and pools the pair to
per-window max AND min. Max and min both ship because the BN affine is
not known until the statistics are complete: for per-channel scale s,
    pooled(leaky(s*y + b)) = leaky(s*max(y) + b)   if s >= 0
                             leaky(s*min(y) + b)   if s <  0
(max/leaky are monotone), so the caller selects by sign(s) on the
POOLED-size tensor (16x smaller) after ManualBN. HBM traffic per
modality falls from ~950 MB (write y, re-read y, write pooled) to
~75 MB (read x, write max+min).

Backward — two kernels (a single fused one would need the 9.8 MB f32
band accumulator AND the 4.9 MB band matrix in VMEM together, over the
~16 MB/core budget):
 1. `_yhat_pallas`: recomputes the conv pair in-register, rebuilds the
    pool routing masks by equality against ymax/ymin (gradients split
    equally among ties, like ops/pool3d.py), adds the broadcast stats
    cotangent (g_sum + 2*y*g_sumsq), and writes the assembled cotangent
    yhat — the only full-resolution tensor the whole stage ever writes.
 2. `_dw_from_yhat_pallas`: T += lhs^T @ yhat on the MXU per row (the
    forward's banded structure transposed, as in ops/stem.py's dw
    kernel, but reading yhat directly instead of re-reading y + gy —
    one full-resolution read instead of two); dw's 27 taps are band
    diagonals of T extracted outside with jnp.diagonal.

dx (the cotangent of the input volume) is assembled with plain XLA ops
from the same masks; training never consumes it (the stem reads the
data volume), so XLA dead-code-eliminates the whole chain — but it is
numerically correct when requested (tested).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._common import auto_interpret, out_struct, reduce_ct
from .pool3d import _sel_matrices
from .stem import _build_band, _conv_reference


def _dot(a, b, dims=(((1,), (0,)), ((), ()))):
    return jax.lax.dot_general(a, b, dims,
                               preferred_element_type=jnp.float32)


def _zchunks(m, Zp: int, C: int):
    """(Y, Z*C) -> even/odd z-chunk halves, each (Y, Zp*C)."""
    e = jnp.concatenate(
        [m[:, (2 * k) * C: (2 * k + 1) * C] for k in range(Zp)], axis=1)
    o = jnp.concatenate(
        [m[:, (2 * k + 1) * C: (2 * k + 2) * C] for k in range(Zp)], axis=1)
    return e, o


def _interleave(e, o, tail_cols: int, Zp: int, C: int, dtype):
    """Inverse of _zchunks: (Y, Zp*C) pairs -> (Y, Z*C) with zero tail."""
    cols = []
    for k in range(Zp):
        cols.append(e[:, k * C: (k + 1) * C])
        cols.append(o[:, k * C: (k + 1) * C])
    if tail_cols:
        cols.append(jnp.zeros((e.shape[0], tail_cols), dtype))
    return jnp.concatenate(cols, axis=1)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _conv_row(xp_ref, r_ref, lhs_ref, row, Y: int, Z: int):
    """One y row (Y, Z*C) f32 via the banded-MXU matmul (ops/stem.py)."""
    zp = Z + 2
    for dx in range(3):
        for dy in range(3):
            k = dx * 3 + dy
            lhs_ref[:, k * zp: (k + 1) * zp] = xp_ref[0, row + dx, dy: dy + Y, :]
    return _dot(lhs_ref[...], r_ref[...])


def _sp_fwd_kernel(xp_ref, r_ref, se_ref, so_ref, max_ref, min_ref, st_ref,
                   lhs_ref, *, Y, Z, C, Xp, extra):
    i = pl.program_id(1)
    first = (pl.program_id(0) == 0) & (i == 0)

    @pl.when(first)
    def _():
        st_ref[...] = jnp.zeros_like(st_ref)

    Zp = Z // 2
    dt = max_ref.dtype

    y0 = _conv_row(xp_ref, r_ref, lhs_ref, 2 * i, Y, Z)
    st_ref[0:1] += jnp.sum(y0, axis=0, keepdims=True)
    st_ref[1:2] += jnp.sum(y0 * y0, axis=0, keepdims=True)
    y0 = y0.astype(dt)  # pool the ROUNDED values: backward equality-masks
    y1 = _conv_row(xp_ref, r_ref, lhs_ref, 2 * i + 1, Y, Z)
    st_ref[0:1] += jnp.sum(y1, axis=0, keepdims=True)
    st_ref[1:2] += jnp.sum(y1 * y1, axis=0, keepdims=True)
    y1 = y1.astype(dt)

    if extra:  # odd X: the dangling last row feeds statistics only
        @pl.when(i == Xp - 1)
        def _():
            yl = _conv_row(xp_ref, r_ref, lhs_ref, 2 * Xp, Y, Z)
            st_ref[0:1] += jnp.sum(yl, axis=0, keepdims=True)
            st_ref[1:2] += jnp.sum(yl * yl, axis=0, keepdims=True)

    for op, ref in ((jnp.maximum, max_ref), (jnp.minimum, min_ref)):
        m = op(y0, y1)                       # x-pair
        e, o = _zchunks(m, Zp, C)
        mz = op(e, o)                        # z-pair (Y, Zp*C)
        ev = _dot(se_ref[...], mz)           # y-even rows (Yp, Zp*C) f32
        od = _dot(so_ref[...], mz)           # y-odd rows
        ref[0, 0] = op(ev, od).astype(dt)


def _sp_fwd_pallas(x, w, interpret=False):
    b, X, Y, Z = x.shape
    C = w.shape[-1]
    Xp, Yp, Zp = X // 2, Y // 2, Z // 2
    r = _build_band(w.astype(jnp.float32), Z).astype(x.dtype)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1)))
    se, so, _ = _sel_matrices(Y, x.dtype)
    ymax, ymin, st = pl.pallas_call(
        functools.partial(_sp_fwd_kernel, Y=Y, Z=Z, C=C, Xp=Xp,
                          extra=X - 2 * Xp),
        out_shape=[out_struct((b, Xp, Yp, Zp * C), x.dtype, x),
                   out_struct((b, Xp, Yp, Zp * C), x.dtype, x),
                   out_struct((2, Z * C), jnp.float32, x)],
        grid=(b, Xp),
        in_specs=[
            pl.BlockSpec((1, X + 2, Y + 2, Z + 2), lambda bi, i: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, Yp, Zp * C), lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Yp, Zp * C), lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, Z * C), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((Y, 9 * (Z + 2)), x.dtype)],
        interpret=interpret,
    )(xp, r, se, so)
    return (ymax.reshape(b, Xp, Yp, Zp, C), ymin.reshape(b, Xp, Yp, Zp, C),
            st)


def _sp_reference(x, w):
    """Plain-XLA oracle: conv -> per-lane stats + window max/min."""
    y = _conv_reference(x, w)
    b, X, Y, Z, C = y.shape
    yf = y.astype(jnp.float32).reshape(b, X, Y, Z * C)
    st = jnp.stack([jnp.sum(yf, axis=(0, 1, 2)),
                    jnp.sum(yf * yf, axis=(0, 1, 2))])
    dims, strides = (1, 2, 2, 2, 1), (1, 2, 2, 2, 1)
    if jnp.issubdtype(y.dtype, jnp.floating):
        lo, hi = -jnp.inf, jnp.inf
    else:  # pragma: no cover
        lo, hi = jnp.iinfo(y.dtype).min, jnp.iinfo(y.dtype).max
    ymax = jax.lax.reduce_window(y, lo, jax.lax.max, dims, strides, "VALID")
    ymin = jax.lax.reduce_window(y, hi, jax.lax.min, dims, strides, "VALID")
    return ymax, ymin, st


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _yhat_kernel(xp_ref, r_ref, pmax_ref, pmin_ref, gmax_ref, gmin_ref,
                 re_ref, se_ref, so_ref, ab_ref, o_ref, lhs_ref,
                 *, Y, Z, C, Xp, extra):
    i = pl.program_id(1)
    Zp = Z // 2
    dt = o_ref.dtype
    tail = (Z - 2 * Zp) * C

    @pl.when(i < Xp)
    def _():
        # recompute the rounded conv pair (bit-identical to the forward)
        y0 = _conv_row(xp_ref, r_ref, lhs_ref, 2 * i, Y, Z)
        y0b = y0.astype(dt)
        y1 = _conv_row(xp_ref, r_ref, lhs_ref, 2 * i + 1, Y, Z)
        y1b = y1.astype(dt)

        # pool routing: equality vs broadcast pooled max/min, ties split
        rep_max = _dot(re_ref[...], pmax_ref[0, 0])   # (Y, Zp*C) f32
        rep_min = _dot(re_ref[...], pmin_ref[0, 0])
        eqs = []  # (row, max/min, even/odd) masks; f32 compare (Mosaic:
        for yb in (y0b, y1b):  # no cmpf on packed bf16)
            e, o = _zchunks(yb, Zp, C)
            eqs.append(((e.astype(jnp.float32) == rep_max,
                         o.astype(jnp.float32) == rep_max),
                        (e.astype(jnp.float32) == rep_min,
                         o.astype(jnp.float32) == rep_min)))

        reps = []
        for sel, g_ref in ((0, gmax_ref), (1, gmin_ref)):
            msum = functools.reduce(
                jnp.add, [eqs[r][sel][p].astype(dt) for r in (0, 1)
                          for p in (0, 1)])
            cnt = _dot(se_ref[...], msum) + _dot(so_ref[...], msum)
            gi = (g_ref[0, 0].astype(jnp.float32) / cnt).astype(dt)
            reps.append(_dot(re_ref[...], gi))       # (Y, Zp*C) f32

        for r, (y, yb) in enumerate(((y0, y0b), (y1, y1b))):
            ge = eqs[r][0][0] * reps[0] + eqs[r][1][0] * reps[1]
            go = eqs[r][0][1] * reps[0] + eqs[r][1][1] * reps[1]
            gy = _interleave(ge.astype(dt), go.astype(dt), tail, Zp, C, dt)
            # yhat = gy + g_sum + 2*y*g_sumsq, assembled in the storage
            # dtype (f32 would materialize f32 full-res copies in XLA)
            o_ref[0, r] = gy + (ab_ref[0:1] + y * ab_ref[1:2]).astype(dt)

    if extra:
        @pl.when(i == Xp)
        def _():  # dangling last row: stats cotangent only; its block
            yl = _conv_row(xp_ref, r_ref, lhs_ref, 2 * Xp, Y, Z)  # row X-1
            o_ref[0, 0] = (ab_ref[0:1] + yl * ab_ref[1:2]).astype(dt)
            o_ref[0, 1] = jnp.zeros_like(o_ref[0, 1])  # x-pad row, sliced off


def _yhat_pallas_impl(x, w, ymax, ymin, gmax, gmin, a_lanes, b_lanes,
                      interpret=False):
    """Assembled backward cotangent yhat (b, X, Y, Z*C) in x.dtype."""
    b, X, Y, Z = x.shape
    C = ymax.shape[-1]
    Xp, Yp, Zp = X // 2, Y // 2, Z // 2
    extra = X - 2 * Xp
    dt = x.dtype
    r = _build_band(w.astype(jnp.float32), Z).astype(dt)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1)))
    se, so, re = _sel_matrices(Y, dt)
    ab = jnp.stack([a_lanes, 2.0 * b_lanes]).astype(jnp.float32)  # (2, Z*C)

    def pooled(t):
        return t.astype(dt).reshape(b, Xp, Yp, Zp * C)

    def pool_spec():
        return pl.BlockSpec(
            (1, 1, Yp, Zp * C),
            lambda bi, i: (bi, jnp.minimum(i, Xp - 1), 0, 0),
            memory_space=pltpu.VMEM)

    # odd X: one pad row so the 2-row output blocks tile evenly; the
    # dangling row's yhat lands in block Xp row 0, pad row sliced off
    Xpad = 2 * (Xp + (1 if extra else 0))
    yhat = pl.pallas_call(
        functools.partial(_yhat_kernel, Y=Y, Z=Z, C=C, Xp=Xp, extra=extra),
        out_shape=out_struct((b, Xpad, Y, Z * C), dt, x, gmax, gmin),
        grid=(b, Xp + (1 if extra else 0)),
        in_specs=[
            pl.BlockSpec((1, X + 2, Y + 2, Z + 2), lambda bi, i: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pool_spec(), pool_spec(), pool_spec(), pool_spec(),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, Y, Z * C), lambda bi, i: (bi, i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((Y, 9 * (Z + 2)), dt)],
        interpret=interpret,
    )(xp, r, pooled(ymax), pooled(ymin), pooled(gmax), pooled(gmin),
      re, se, so, ab)
    # returned PADDED (Xpad rows): consumers index only the first X rows;
    # slicing here would cost a full-resolution copy
    return yhat


def _dw_kernel(xp_ref, yh_ref, t_ref, lhs_ref, *, Y, Z, C):
    i = pl.program_id(1)
    first = (pl.program_id(0) == 0) & (i == 0)

    @pl.when(first)
    def _():
        t_ref[...] = jnp.zeros_like(t_ref)

    zp = Z + 2
    for dx in range(3):
        for dy in range(3):
            k = dx * 3 + dy
            lhs_ref[:, k * zp: (k + 1) * zp] = xp_ref[0, i + dx, dy: dy + Y, :]
    t_ref[...] += _dot(lhs_ref[...], yh_ref[0, 0],
                       (((0,), (0,)), ((), ())))


def _dw_from_yhat_pallas(x, yhat, C: int, interpret=False):
    """dw (3,3,3,C) from x and the pre-assembled cotangent yhat."""
    b, X, Y, Z = x.shape
    zp = Z + 2
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1)))
    t = pl.pallas_call(
        functools.partial(_dw_kernel, Y=Y, Z=Z, C=C),
        out_shape=out_struct((9 * zp, Z * C), jnp.float32, x, yhat),
        grid=(b, X),
        in_specs=[
            pl.BlockSpec((1, X + 2, Y + 2, Z + 2), lambda bi, i: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Y, Z * C), lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((9 * zp, Z * C), lambda bi, i: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((Y, 9 * zp), x.dtype)],
        interpret=interpret,
    )(xp, yhat)
    t4 = t.reshape(9, zp, Z, C)
    taps = [jnp.diagonal(t4, offset=-dz, axis1=1, axis2=2).sum(-1)
            for dz in range(3)]
    return jnp.stack(taps, axis=1).reshape(3, 3, 3, C)


# ---------------------------------------------------------------------------
# public op
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def stem_pool_minmax(x, w, use_pallas=True, interpret=False):
    """(B, X, Y, Z), (3,3,3,C) -> (ymax, ymin, st): per-2x2x2-window max
    and min of the SAME-conv output (floor/VALID semantics, values rounded
    to x.dtype exactly as a materialized conv would round them) plus
    per-lane f32 [Σ, Σ²] statistics of the unrounded accumulator over
    (B, X, Y) — reduce with `st.reshape(2, Z, C).sum(1)`."""
    if not use_pallas:
        return _sp_reference(x, w)
    return _sp_fwd_pallas(x, w, interpret=auto_interpret(interpret))


def _spm_fwd(x, w, use_pallas, interpret):
    out = stem_pool_minmax(x, w, use_pallas, interpret)
    return out, (x, w, out[0], out[1])


def _spm_bwd(use_pallas, interpret, res, cot):
    x, w, ymax, ymin = res
    gmax, gmin, gst = cot
    b, X, Y, Z = x.shape
    C = ymax.shape[-1]
    a = gst[0].astype(jnp.float32)
    b2 = gst[1].astype(jnp.float32)
    if use_pallas:
        yhat = _yhat_pallas_impl(x, w, ymax, ymin, gmax, gmin, a, b2,
                                 interpret=auto_interpret(interpret))
        dw = _dw_from_yhat_pallas(x, yhat, C,
                                  interpret=auto_interpret(interpret)
                                  ).astype(w.dtype)
        # dx: exact, assembled in plain XLA from the same yhat rows; dead
        # (and DCE'd) in training, where the stem consumes the data volume
        yh5 = yhat[:, :X].reshape(b, X, Y, Z, C)
        (dx,) = jax.linear_transpose(
            lambda xx: _conv_reference(xx, w), x)(yh5.astype(x.dtype))
    else:
        def f(x, w):
            return _sp_reference(x, w)

        _, vjp = jax.vjp(f, x, w)
        dx, dw = vjp((gmax, gmin, gst))
    return dx, reduce_ct(dw, w)


stem_pool_minmax.defvjp(_spm_fwd, _spm_bwd)
