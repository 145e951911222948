"""Pallas 2x2x2 stride-2 VALID max/avg pooling for NDHWC volumes on TPU.

XLA lowers `nn.max_pool` to `reduce-window` and its gradient to
`select-and-scatter`; on the sNet stage-1 tensor (8x91x109x91x32 bf16) those
run at <10% of HBM bandwidth AND force a tile layout ({2,4,3,1,0}) that
disagrees with the surrounding convolutions, adding four full-tensor layout
copies per modality. Measured cost: ~40% of the whole model_ad train step
(see docs/PERFORMANCE.md). Plain-XLA rewrites fail too: strided slices do
not fuse on TPU (measured 5.5 ms per materialized slice).

This kernel views each (batch, x-pair) slab as a 2D (Y, Z*C) block and
reduces each window axis with ops Mosaic lowers well:

  x-pairs:  the two rows of the block        (elementwise max/add)
  z-pairs:  lane-chunk slices + concat       (C-aligned lane moves)
  y-pairs:  0/1 selection matrices on MXU    ((Yp, Y) @ (Y, Zp*C) dots)

The gradient never calls select-and-scatter: it recomputes the window
equality masks and splits the incoming gradient EQUALLY among tied maxima
(torch/XLA route it to the first maximum; both are valid subgradients and
ties have measure zero for float activations). Forward parity with torch
MaxPool3d(2,2) is exact.

reference: pooling layers of sNet (reference: models/networks.py:26,33,41,49).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._common import auto_interpret, out_struct, reduce_ct


def _sel_matrices(Y: int, dtype):
    """Se/So (Yp, Y): select even/odd rows; Re (Y, Yp): broadcast row y//2."""
    Yp = Y // 2
    se = np.zeros((Yp, Y), np.float32)
    so = np.zeros((Yp, Y), np.float32)
    se[np.arange(Yp), 2 * np.arange(Yp)] = 1
    so[np.arange(Yp), 2 * np.arange(Yp) + 1] = 1
    re = np.zeros((Y, Yp), np.float32)
    re[np.arange(2 * Yp), np.arange(2 * Yp) // 2] = 1  # odd tail row -> 0
    return (jnp.asarray(se, dtype), jnp.asarray(so, dtype),
            jnp.asarray(re, dtype))


def _dot(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _zpair(m, Zp: int, C: int, op):
    """(Y, Z*C) -> (Y, Zp*C): combine z-chunk pairs, lane-aligned slices."""
    parts = [op(m[:, (2 * k) * C: (2 * k + 1) * C],
                m[:, (2 * k + 1) * C: (2 * k + 2) * C]) for k in range(Zp)]
    return jnp.concatenate(parts, axis=1)


def _pool_fwd_kernel(x_ref, se_ref, so_ref, o_ref, *, Y, Zp, C, Xp, mode):
    i = pl.program_id(1)

    @pl.when(i < Xp)
    def _():
        comb = jnp.maximum if mode == "max" else jnp.add
        m = comb(x_ref[0, 0], x_ref[0, 1])          # (Y, Z*C) x-pair
        mz = _zpair(m, Zp, C, comb)                  # (Y, Zp*C) z-pairs
        e = _dot(se_ref[...], mz)                    # (Yp, Zp*C) y-even
        o = _dot(so_ref[...], mz)                    # y-odd
        r = jnp.maximum(e, o) if mode == "max" else (e + o) * 0.125
        o_ref[0, 0] = r.astype(o_ref.dtype)

    @pl.when(i >= Xp)
    def _():  # nothing: grid sized to Xp for forward
        o_ref[0, 0] = jnp.zeros_like(o_ref[0, 0])


def _pool_bwd_kernel(x_ref, p_ref, g_ref, re_ref, se_ref, so_ref, o_ref,
                     *, Y, Z, Zp, C, Xp):
    i = pl.program_id(1)

    @pl.when(i < Xp)
    def _():
        # equality masks in f32: Mosaic rejects cmpf on packed-bf16 vectors
        rep_p = _dot(re_ref[...], p_ref[0, 0])       # (Y, ZpC) f32
        g = g_ref[0, 0]

        eqs = []
        for r in (0, 1):
            t = x_ref[0, r]                          # (Y, Z*C)
            te = jnp.concatenate(
                [t[:, (2 * k) * C: (2 * k + 1) * C] for k in range(Zp)], 1)
            to = jnp.concatenate(
                [t[:, (2 * k + 1) * C: (2 * k + 2) * C] for k in range(Zp)], 1)
            eqs.append((te.astype(jnp.float32) == rep_p,
                        to.astype(jnp.float32) == rep_p))  # (Y, ZpC) masks
        # tie counts are small integers: exact in the compute dtype
        msum = functools.reduce(
            jnp.add, [m.astype(x_ref.dtype) for pair in eqs for m in pair])
        cnt = _dot(se_ref[...], msum) + _dot(so_ref[...], msum)  # (Yp, ZpC)
        gi = g.astype(jnp.float32) / cnt
        rep_g = _dot(re_ref[...], gi.astype(x_ref.dtype)).astype(jnp.float32)

        # odd-z tail gets zero gradient (VALID pooling never reads it)
        tail = ([jnp.zeros((Y, (Z - 2 * Zp) * C), x_ref.dtype)]
                if Z > 2 * Zp else [])
        for r in (0, 1):
            de = (eqs[r][0] * rep_g).astype(x_ref.dtype)       # (Y, Zp*C)
            do = (eqs[r][1] * rep_g).astype(x_ref.dtype)
            cols = []
            for k in range(Zp):
                cols.append(de[:, k * C: (k + 1) * C])
                cols.append(do[:, k * C: (k + 1) * C])
            full = jnp.concatenate(cols + tail, axis=1)        # (Y, Z*C)
            o_ref[0, r] = full

    @pl.when(i >= Xp)
    def _():  # odd trailing x row: zero gradient
        o_ref[0, 0] = jnp.zeros_like(o_ref[0, 0])
        o_ref[0, 1] = jnp.zeros_like(o_ref[0, 1])


def _fwd_pallas(x, mode, interpret):
    b, X, Y, Z, C = x.shape
    Xp, Yp, Zp = X // 2, Y // 2, Z // 2
    x2 = x.reshape(b, X, Y, Z * C)
    se, so, re = _sel_matrices(Y, x.dtype)
    if mode == "avg":  # selection rows scaled later by 0.125 in-kernel
        pass
    out = pl.pallas_call(
        functools.partial(_pool_fwd_kernel, Y=Y, Zp=Zp, C=C, Xp=Xp,
                          mode=mode),
        out_shape=out_struct((b, Xp, Yp, Zp * C), x.dtype, x2),
        grid=(b, Xp),
        in_specs=[
            pl.BlockSpec((1, 2, Y, Z * C), lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, Yp, Zp * C),
                               lambda bi, i: (bi, i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x2, se, so)
    return out.reshape(b, Xp, Yp, Zp, C)


def _bwd_pallas(x, p, g, interpret):
    b, X, Y, Z, C = x.shape
    Xp, Yp, Zp = X // 2, Y // 2, Z // 2
    x2 = x.reshape(b, X, Y, Z * C)
    p2 = p.reshape(b, Xp, Yp, Zp * C).astype(x.dtype)
    g2 = g.reshape(b, Xp, Yp, Zp * C).astype(x.dtype)
    se, so, re = _sel_matrices(Y, x.dtype)
    gx = X - 2 * Xp  # 1 extra grid step to zero the odd trailing x row
    dx = pl.pallas_call(
        functools.partial(_pool_bwd_kernel, Y=Y, Z=Z, Zp=Zp, C=C, Xp=Xp),
        out_shape=out_struct((b, X, Y, Z * C), x.dtype, x2, g2),
        grid=(b, Xp + gx),
        in_specs=[
            pl.BlockSpec((1, 2, Y, Z * C), lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Yp, Zp * C),
                         lambda bi, i: (bi, jnp.minimum(i, Xp - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Yp, Zp * C),
                         lambda bi, i: (bi, jnp.minimum(i, Xp - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, Y, Z * C), lambda bi, i: (bi, i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x2, p2, g2, re, se, so)
    return dx.reshape(b, X, Y, Z, C)


def _fits(x) -> bool:
    b, X, Y, Z, C = x.shape
    if X < 2 or Y < 2 or Z < 2:
        return False
    lanes = max(Z * C, 128)
    # fwd block + bwd block (2 rows in, 2 rows out, masks) with headroom
    need = 8 * Y * lanes * x.dtype.itemsize * 2
    return need <= 12 * 1024 * 1024


def _use_pallas(x, use_pallas):
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    return use_pallas and _fits(x)


def _use_pallas_bc(x, use_pallas):
    """The bc kernels block over BOTH y and pooled z (`_yb_zb_for`), so any
    shape fits scoped VMEM — unlike the merged kernel, whose whole-Z rows
    make `_fits` fail at full resolution (and wrongly gated the bc path to
    the select-and-scatter fallback there: 62 ms/step at 182^3)."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    return use_pallas


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def max_pool3d_2x2(x, use_pallas=None, interpret=False):
    """(B, X, Y, Z, C) -> (B, X//2, Y//2, Z//2, C), torch MaxPool3d(2,2).

    Pallas kernel on TPU (or interpret=True); XLA reduce-window otherwise.
    """
    if not _use_pallas(x, use_pallas) and not interpret:
        return jax.lax.reduce_window(
            x, -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating)
            else jnp.iinfo(x.dtype).min,
            jax.lax.max, (1, 2, 2, 2, 1), (1, 2, 2, 2, 1), "VALID")
    return _fwd_pallas(x, "max", auto_interpret(interpret))


def _mp_fwd(x, use_pallas, interpret):
    p = max_pool3d_2x2(x, use_pallas, interpret)
    return p, (x, p)


def _mp_bwd(use_pallas, interpret, res, g):
    x, p = res
    if not _use_pallas(x, use_pallas) and not interpret:
        # mirror XLA's own vjp: select-and-scatter
        _, vjp = jax.vjp(
            lambda v: jax.lax.reduce_window(
                v, -jnp.inf, jax.lax.max, (1, 2, 2, 2, 1),
                (1, 2, 2, 2, 1), "VALID"), x)
        return (vjp(g)[0],)
    return (_bwd_pallas(x, p, g, auto_interpret(interpret)),)


max_pool3d_2x2.defvjp(_mp_fwd, _mp_bwd)


def _avg_bwd_kernel(g_ref, re_ref, o_ref, *, Y, Z, Zp, C, Xp):
    i = pl.program_id(1)

    @pl.when(i < Xp)
    def _():
        rep = _dot(re_ref[...], g_ref[0, 0] * 0.125).astype(o_ref.dtype)
        tail = ([jnp.zeros((Y, (Z - 2 * Zp) * C), o_ref.dtype)]
                if Z > 2 * Zp else [])
        cols = []
        for k in range(Zp):
            blk = rep[:, k * C: (k + 1) * C]
            cols.extend([blk, blk])
        full = jnp.concatenate(cols + tail, axis=1)
        o_ref[0, 0] = full
        o_ref[0, 1] = full

    @pl.when(i >= Xp)
    def _():
        o_ref[0, 0] = jnp.zeros_like(o_ref[0, 0])
        o_ref[0, 1] = jnp.zeros_like(o_ref[0, 1])


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def avg_pool3d_2x2(x, use_pallas=None, interpret=False):
    """(B, X, Y, Z, C) -> floor-halved, torch AvgPool3d(2,2)."""
    if not _use_pallas(x, use_pallas) and not interpret:
        s = jax.lax.reduce_window(
            x.astype(jnp.float32), 0.0, jax.lax.add, (1, 2, 2, 2, 1),
            (1, 2, 2, 2, 1), "VALID")
        return (s * 0.125).astype(x.dtype)
    return _fwd_pallas(x, "avg", auto_interpret(interpret))


def _ap_fwd(x, use_pallas, interpret):
    # residual: zero-byte array carrying only the input shape and dtype
    token = jnp.zeros((*x.shape, 0), x.dtype)
    return avg_pool3d_2x2(x, use_pallas, interpret), token


def _ap_bwd(use_pallas, interpret, token, g):
    shape, dtype = token.shape[:-1], token.dtype
    b, X, Y, Z, C = shape
    Xp, Yp, Zp = X // 2, Y // 2, Z // 2
    if (not _use_pallas(jax.ShapeDtypeStruct(shape, dtype), use_pallas)
            and not interpret):
        g8 = (g.astype(jnp.float32) * 0.125).astype(dtype)
        up = jnp.zeros((b, X, Y, Z, C), dtype)
        up = up.at[:, :2 * Xp, :2 * Yp, :2 * Zp].set(
            jnp.repeat(jnp.repeat(jnp.repeat(g8, 2, 1), 2, 2), 2, 3))
        return (up,)
    g2 = g.reshape(b, Xp, Yp, Zp * C).astype(dtype)
    _, _, re = _sel_matrices(Y, dtype)
    gx = X - 2 * Xp
    dx = pl.pallas_call(
        functools.partial(_avg_bwd_kernel, Y=Y, Z=Z, Zp=Zp, C=C, Xp=Xp),
        out_shape=out_struct((b, X, Y, Z * C), dtype, g2),
        grid=(b, Xp + gx),
        in_specs=[
            pl.BlockSpec((1, 1, Yp, Zp * C),
                         lambda bi, i: (bi, jnp.minimum(i, Xp - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, Y, Z * C), lambda bi, i: (bi, i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=auto_interpret(interpret),
    )(g2, re)
    return (dx.reshape(b, X, Y, Z, C),)


avg_pool3d_2x2.defvjp(_ap_fwd, _ap_bwd)


# ---------------------------------------------------------------------------
# Fused affine + LeakyReLU + 2x2x2 max pool
#
# pooled = maxpool2(leaky(y * scale + shift)) with per-channel scale/shift
# expanded to (Z*C,) lane vectors by the caller. This is the BatchNorm-apply
# + activation + pool of a sNet stage END fused into the pool kernel, so the
# full-resolution activated tensor never exists in HBM: the kernel reads the
# RAW conv output once and writes the pooled result (1/8 size). The conv
# bias and the BN mean/var/gamma/beta all fold into (scale, shift) outside
# (plain jnp algebra on (C,) vectors, so autodiff routes their gradients).
#
# The backward kernel recomputes the activation in-register, routes the
# pooled gradient through the window-max equality masks (ties split
# equally), multiplies by the activation derivative and scale for dy, and
# accumulates the per-lane reductions d(scale) = sum(dpre * y) and
# d(shift) = sum(dpre) across the grid into one (2, Z*C) f32 output.
# ---------------------------------------------------------------------------


def _zb_merged(Y, Z, C, itemsize, budget=12 * 1024 * 1024, align=True):
    """pooled-z cols per merged-kernel block. Whole-Z rows when they fit
    scoped VMEM (the round-2/3 layout — byte-identical paths); otherwise
    lane chunks of 2*ZB*C, so full-resolution stage-1 tensors (Z=182,
    C=32: 11.6 KB/row-lane) stop falling back to XLA select-and-scatter."""
    Zp = max(Z // 2, 1)
    if 8 * Y * max(Z * C, 128) * itemsize * 2 <= budget:
        return Zp
    zb = budget // (8 * Y * 2 * C * itemsize * 2)
    if align and zb < Zp:
        # lane-chunked regime on real TPU: the ZB*C output block does not
        # span the array, so Mosaic requires it % 128 == 0 — snap down
        # (0 => caller falls back). Interpret mode has no such constraint
        # (align=False keeps small-shape chunked tests exercisable).
        q = 128 // math.gcd(C, 128)
        zb = (zb // q) * q
    return min(Zp, zb)  # 0 => even one chunk overflows: caller falls back


def _mpa_fwd_kernel(x_ref, s_ref, b_ref, se_ref, so_ref, o_ref,
                    *, ZB, C, slope):
    # the block lane extent is Z*C (single-block regime: identical
    # computation to the round-2 kernel; _zpair reads only the first
    # 2*ZB*C lanes) or 2*ZB*C (lane-chunked regime)
    zs = []
    for r in (0, 1):
        pre = (x_ref[0, r].astype(jnp.float32) * s_ref[0] + b_ref[0])
        zs.append(jnp.where(pre >= 0, pre, slope * pre).astype(o_ref.dtype))
    m = jnp.maximum(zs[0], zs[1])
    mz = _zpair(m, ZB, C, jnp.maximum)
    e = _dot(se_ref[...], mz)
    o = _dot(so_ref[...], mz)
    o_ref[0, 0] = jnp.maximum(e, o).astype(o_ref.dtype)


def _mpa_bwd_kernel(x_ref, s_ref, b_ref, p_ref, g_ref, re_ref, se_ref,
                    so_ref, dx_ref, dsb_ref, *, Y, Zp, ZB, TLC, ZC, C, Xp,
                    slope):
    # TLC is the x/dx/s/b block lane extent: the whole Z*C (odd-z tail
    # handled by the in-kernel zero concat — the single-block regime,
    # byte-identical to round 3) or 2*ZB*C (lane-chunked; the partial last
    # chunk is masked by lane validity). ZC = Z*C, the true lane count.
    k = pl.program_id(0)
    i = pl.program_id(2)
    first = (pl.program_id(1) == 0) & (i == 0)

    @pl.when(first)
    def _():
        dsb_ref[...] = jnp.zeros_like(dsb_ref)

    @pl.when(i < Xp)
    def _():
        rep_p = _dot(re_ref[...], p_ref[0, 0])          # (Y, ZB*C) f32
        g = g_ref[0, 0]
        # lane-validity masks (all-true in the single-block regime):
        # window lanes past 2*Zp*C and raw lanes past Z*C are tail/padding
        # whose reads can be garbage — WHEREs so 0*garbage can't leak NaN
        colw = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * ZB * C), 1) \
            + TLC * k
        wvalid = colw < 2 * Zp * C
        colx = jax.lax.broadcasted_iota(jnp.int32, (1, TLC), 1) + TLC * k
        xvalid = colx < ZC

        pres, eqs = [], []
        for r in (0, 1):
            t = x_ref[0, r].astype(jnp.float32)          # (Y, TLC)
            pre = t * s_ref[0] + b_ref[0]
            z = jnp.where(pre >= 0, pre, slope * pre).astype(
                x_ref.dtype).astype(jnp.float32)        # fwd-identical round
            ze = jnp.concatenate(
                [z[:, (2 * j) * C: (2 * j + 1) * C] for j in range(ZB)], 1)
            zo = jnp.concatenate(
                [z[:, (2 * j + 1) * C: (2 * j + 2) * C] for j in range(ZB)],
                1)
            pres.append(pre)
            eqs.append((ze == rep_p, zo == rep_p))
        msum = functools.reduce(
            jnp.add, [m.astype(x_ref.dtype) for pair in eqs for m in pair])
        cnt = _dot(se_ref[...], msum) + _dot(so_ref[...], msum)
        gi = g.astype(jnp.float32) / jnp.maximum(cnt, 1.0)
        rep_g = _dot(re_ref[...], gi.astype(x_ref.dtype)).astype(jnp.float32)

        tail = ([jnp.zeros((Y, TLC - 2 * ZB * C), jnp.float32)]
                if TLC > 2 * ZB * C else [])
        ds_acc = jnp.zeros((1, TLC), jnp.float32)
        db_acc = jnp.zeros((1, TLC), jnp.float32)
        for r in (0, 1):
            de = eqs[r][0] * rep_g                       # (Y, ZB*C) f32
            do = eqs[r][1] * rep_g
            cols = []
            for j in range(ZB):
                cols.append(de[:, j * C: (j + 1) * C])
                cols.append(do[:, j * C: (j + 1) * C])
            dz = jnp.where(wvalid, jnp.concatenate(cols, axis=1), 0.0)
            if tail:
                dz = jnp.concatenate([dz] + tail, axis=1)  # (Y, TLC)
            dpre = dz * jnp.where(pres[r] >= 0, 1.0, slope)
            dx_ref[0, r] = (dpre * s_ref[0]).astype(dx_ref.dtype)
            t = jnp.where(xvalid, x_ref[0, r].astype(jnp.float32), 0.0)
            ds_acc += jnp.sum(dpre * t, axis=0, keepdims=True)
            db_acc += jnp.sum(dpre, axis=0, keepdims=True)
        dsb_ref[0:1] += ds_acc
        dsb_ref[1:2] += db_acc

    @pl.when(i >= Xp)
    def _():
        dx_ref[0, 0] = jnp.zeros_like(dx_ref[0, 0])
        dx_ref[0, 1] = jnp.zeros_like(dx_ref[0, 1])


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def max_pool3d_2x2_affine_act(y, s_lanes, b_lanes, slope=0.01,
                              use_pallas=None, interpret=False):
    """maxpool2x2x2(leaky_relu(y * s + b)) with (Z*C,)-lane affine vectors.

    y: (B, X, Y, Z, C) raw conv output; s_lanes/b_lanes: f32 (Z*C,) built by
    tiling per-channel BN scale/shift (+ folded conv bias). Returns the
    pooled activated tensor; gradients flow to y AND the lane vectors.

    NOTE (round-4 negative result): an in-VMEM merged->conv-native
    relayout of the pooled output (the TRANSMF_M2BC experiment, git
    history @ 5436090) does NOT lower on real TPUs — the store scatters
    the value's sublane dim (Y) across an upper dim of the {4,0,3,2,1}
    target whose sublane dim is B, a cross-sublane-dimension relayout
    Mosaic rejects ("infer-vector-layout: unsupported shape cast"; only
    interpret mode ever ran it). The merged->conv boundary copy stays
    with XLA (~0.7 ms/way/modality at crop, pooled-size).
    """
    b, X, Y, Z, C = y.shape
    ZB = _zb_merged(Y, Z, C, y.dtype.itemsize,
                    align=not auto_interpret(interpret))
    if (not _use_pallas_bc(y, use_pallas) and not interpret) \
            or min(X, Y, Z) < 2 or ZB < 1:
        z = y.astype(jnp.float32) * s_lanes.reshape(Z, C) + \
            b_lanes.reshape(Z, C)
        z = jnp.where(z >= 0, z, slope * z).astype(y.dtype)
        return jax.lax.reduce_window(
            z, -jnp.inf, jax.lax.max, (1, 2, 2, 2, 1), (1, 2, 2, 2, 1),
            "VALID")
    Xp, Yp, Zp = X // 2, Y // 2, Z // 2
    nk = -(-Zp // ZB)
    tlc = Z * C if nk == 1 else 2 * ZB * C
    interpret = auto_interpret(interpret)
    y2 = y.reshape(b, X, Y, Z * C)
    se, so, _ = _sel_matrices(Y, y.dtype)
    out = pl.pallas_call(
        functools.partial(_mpa_fwd_kernel, ZB=ZB, C=C, slope=slope),
        out_shape=out_struct((b, Xp, Yp, Zp * C), y.dtype, y2),
        grid=(b, Xp, nk),
        in_specs=[
            pl.BlockSpec((1, 2, Y, tlc),
                         lambda bi, i, k: (bi, i, 0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tlc), lambda bi, i, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tlc), lambda bi, i, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, Yp, ZB * C),
                               lambda bi, i, k: (bi, i, 0, k),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(y2, s_lanes.reshape(1, Z * C).astype(jnp.float32),
      b_lanes.reshape(1, Z * C).astype(jnp.float32), se, so)
    return out.reshape(b, Xp, Yp, Zp, C)


def _mpa_fwd(y, s_lanes, b_lanes, slope, use_pallas, interpret):
    p = max_pool3d_2x2_affine_act(y, s_lanes, b_lanes, slope, use_pallas,
                                  interpret)
    return p, (y, s_lanes, b_lanes, p)


def _mpa_bwd(slope, use_pallas, interpret, res, g):
    y, s_lanes, b_lanes, p = res
    b, X, Y, Z, C = y.shape
    Xp, Yp, Zp = X // 2, Y // 2, Z // 2
    ZB = _zb_merged(Y, Z, C, y.dtype.itemsize,
                    align=not auto_interpret(interpret))
    if (not _use_pallas_bc(y, use_pallas) and not interpret) \
            or min(X, Y, Z) < 2 or ZB < 1:
        def f(yy, ss, bb):  # inline reference (NOT the custom_vjp op)
            z = yy.astype(jnp.float32) * ss.reshape(Z, C) + bb.reshape(Z, C)
            z = jnp.where(z >= 0, z, slope * z).astype(yy.dtype)
            return jax.lax.reduce_window(
                z, -jnp.inf, jax.lax.max, (1, 2, 2, 2, 1), (1, 2, 2, 2, 1),
                "VALID")

        _, vjp = jax.vjp(f, y, s_lanes, b_lanes)
        dy, ds, db = vjp(g)
        return dy, reduce_ct(ds, s_lanes), reduce_ct(db, b_lanes)
    interpret = auto_interpret(interpret)
    nk = -(-Zp // ZB)
    tlc = Z * C if nk == 1 else 2 * ZB * C
    y2 = y.reshape(b, X, Y, Z * C)
    p2 = p.reshape(b, Xp, Yp, Zp * C)
    g2 = g.reshape(b, Xp, Yp, Zp * C).astype(y.dtype)
    se, so, re = _sel_matrices(Y, y.dtype)
    gx = X - 2 * Xp
    # dx must cover ALL lanes: in the chunked regime an odd-z tail gets
    # extra masked blocks (input maps clamp to the last real chunk)
    nk_out = max(nk, -(-(Z * C) // tlc))
    dx, dsb = pl.pallas_call(
        functools.partial(_mpa_bwd_kernel, Y=Y, Zp=Zp, ZB=ZB, TLC=tlc,
                          ZC=Z * C, C=C, Xp=Xp, slope=slope),
        out_shape=[out_struct((b, X, Y, Z * C), y.dtype, y2, g2),
                   out_struct((2, Z * C), jnp.float32, y2, g2)],
        grid=(nk_out, b, Xp + gx),
        in_specs=[
            pl.BlockSpec((1, 2, Y, tlc),
                         lambda k, bi, i: (bi, i, 0,
                                           jnp.minimum(k, nk - 1)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tlc), lambda k, bi, i: (0,
                                                     jnp.minimum(k, nk - 1)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tlc), lambda k, bi, i: (0,
                                                     jnp.minimum(k, nk - 1)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Yp, ZB * C),
                         lambda k, bi, i: (bi, jnp.minimum(i, Xp - 1), 0,
                                           jnp.minimum(k, nk - 1)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Yp, ZB * C),
                         lambda k, bi, i: (bi, jnp.minimum(i, Xp - 1), 0,
                                           jnp.minimum(k, nk - 1)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 2, Y, tlc), lambda k, bi, i: (bi, i, 0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, tlc), lambda k, bi, i: (0, k),
                         memory_space=pltpu.VMEM),
        ],
        interpret=interpret,
    )(y2, s_lanes.reshape(1, Z * C).astype(jnp.float32),
      b_lanes.reshape(1, Z * C).astype(jnp.float32), p2, g2, re, se, so)
    return (dx.reshape(b, X, Y, Z, C),
            reduce_ct(dsb[0], s_lanes), reduce_ct(dsb[1], b_lanes))


max_pool3d_2x2_affine_act.defvjp(_mpa_fwd, _mpa_bwd)


# ---------------------------------------------------------------------------
# Conv-native-layout fused affine + LeakyReLU + 2x2x2 max pool ("bc" variant)
#
# XLA's TPU convolutions emit NDHWC tensors in layout {4,0,3,2,1} — i.e.
# physically [X, Y, Z, B, C] row-major with (B=8 sublanes, C lanes) tiles.
# The merged-view kernel above demands [B, X, Y, Z*C] row-major instead, so
# at every XLA-conv-fed stage end the compiler inserts full-resolution
# copy+reshape chains to bridge the two (measured 1.3 ms/modality at the
# s2 stage end, docs/PERFORMANCE.md round 3).
#
# This variant operates directly on the logical (X, Y, Z, B, C) transposed
# VIEW of the conv output: the boundary `jnp.transpose` folds into a layout
# bitcast (verified in the compiled HLO — zero full-res copy-class ops
# between conv -> pool -> conv), the per-channel affine becomes a plain
# (C,)-lane broadcast, and window pooling is reshape-split maxima over
# OUTER dims (no lane shuffles at all). The pooled output, written as
# (Xp, Yp, Zp, B, C) row-major, bitcasts back to the {4,0,3,2,1} layout the
# NEXT conv wants. Relayout work, if any consumer still needs one, now
# happens on the 8x-smaller pooled tensor.
# ---------------------------------------------------------------------------


def _ybc_dims(y):
    b, X, Y, Z, C = y.shape
    return b, X, Y, Z, C, X // 2, Y // 2, Z // 2


def _yb_zb_for(Y, Z, B, C, live_f32, budget=12 * 1024 * 1024):
    """(y-out rows, z-out cols) per program, sized so `live_f32`
    simultaneously-live f32 block-shaped vectors (the kernel's in-register
    working set) fit `budget` of the 16 MB scoped VMEM. The trailing
    (B, C) dims are one vector tile: C pads to full 128 lanes AND B to
    full 8 sublanes — at small batch the padding, not the data, dominates
    (observed: batch-2 eval blocks cost 4x their nominal size and OOM'd
    scoped VMEM).

    Blocks over Y first (one z stripe per program when the full-Z row set
    fits — the round-3 layout); when even a single full-Z row overflows
    (full-resolution stage-1: Z=182 with the B->8 sublane pad), it blocks
    over POOLED z as well. The 2x2x2 windows are aligned and
    non-overlapping, so z-blocking needs no halo."""
    lane = max(C, 128)
    sub = max(B, 8)
    Zp = max(Z // 2, 1)
    per_row = 2 * 2 * Z * sub * lane * 4 * live_f32  # one y-out row's live set
    if per_row <= budget:
        return max(1, min(Y // 2, budget // per_row)), Zp
    per_z = 2 * 2 * 2 * sub * lane * 4 * live_f32  # one pooled-z col, YB=1
    return 1, max(1, min(Zp, budget // max(per_z, 1)))


def _bc_fwd_kernel(t_ref, s_ref, b_ref, o_ref, *, ZB, B, C, slope):
    x0 = t_ref[0].astype(jnp.float32)           # (2YB, 2ZB, B, C)
    x1 = t_ref[1].astype(jnp.float32)
    s, bb = s_ref[0], b_ref[0]                  # (C,) f32, lane broadcast
    z0 = x0 * s + bb
    z1 = x1 * s + bb
    z0 = jnp.where(z0 >= 0, z0, slope * z0).astype(t_ref.dtype)
    z1 = jnp.where(z1 >= 0, z1, slope * z1).astype(t_ref.dtype)
    a = jnp.maximum(z0, z1)                     # x-pair
    yb2 = a.shape[0]
    a = a.reshape(yb2 // 2, 2, *a.shape[1:]).max(axis=1)        # y-pairs
    a = a.reshape(a.shape[0], ZB, 2, B, C).max(axis=2)          # z-pairs
    o_ref[0] = a


def _bc_bwd_kernel(t_ref, s_ref, b_ref, p_ref, g_ref, dx_ref, dsb_ref,
                   *, Yp, Zp, B, C, Xp, YB, ZB, TZIN, slope):
    # TZIN is the t/dx block z extent: the whole Z (odd tail included,
    # handled in-kernel — the single-z-block regime) or 2*ZB (the blocked
    # regime; tail z positions are covered by extra masked grid blocks).
    i = pl.program_id(0)
    j = pl.program_id(1)
    k = pl.program_id(2)
    first = (i == 0) & (j == 0) & (k == 0)

    @pl.when(first)
    def _():
        dsb_ref[...] = jnp.zeros_like(dsb_ref)

    @pl.when(i < Xp)
    def _():
        s, bb = s_ref[0], b_ref[0]
        # valid masks: odd-axis tail and block-padding rows/cols carry zero
        # gradient; masks are WHEREs (not multiplies) so padded-read
        # garbage (possibly inf/NaN) can never leak through 0*garbage.
        row = jax.lax.broadcasted_iota(jnp.int32, (2 * YB, 1, 1, 1), 0) \
            + 2 * YB * j
        col = jax.lax.broadcasted_iota(jnp.int32, (1, TZIN, 1, 1), 1) \
            + TZIN * k
        valid = (row < 2 * Yp) & (col < 2 * Zp)           # (2YB, TZIN, 1, 1)
        # fwd-identical recompute (f32 affine, round through storage dtype)
        pres, zs = [], []
        for r in (0, 1):
            pre = t_ref[r].astype(jnp.float32) * s + bb   # (2YB, TZIN, B, C)
            z = jnp.where(pre >= 0, pre, slope * pre).astype(
                t_ref.dtype).astype(jnp.float32)
            pres.append(pre)
            zs.append(z[:, : 2 * ZB])                     # (2YB, 2ZB, B, C)
        # pooled value broadcast back over the window: (YB,ZB,B,C) ->
        # (2YB, 2ZB, B, C) via outer-dim broadcast+reshape (free in Mosaic)
        p = p_ref[0].astype(jnp.float32)                   # (YB, ZB, B, C)
        g = g_ref[0].astype(jnp.float32)
        rep = jnp.broadcast_to(p[:, None, :, None], (YB, 2, ZB, 2, B, C))
        rep = rep.reshape(2 * YB, 2 * ZB, B, C)
        eqs = [(z == rep) for z in zs]                     # bool masks
        cnt = functools.reduce(
            jnp.add,
            [e.astype(jnp.float32).reshape(YB, 2, ZB, 2, B, C).sum((1, 3))
             for e in eqs])                                # (YB, ZB, B, C)
        gi = g / jnp.maximum(cnt, 1.0)
        rep_g = jnp.broadcast_to(
            gi[:, None, :, None], (YB, 2, ZB, 2, B, C)
        ).reshape(2 * YB, 2 * ZB, B, C)
        validz = valid[:, : 2 * ZB]
        ztail = TZIN - 2 * ZB
        ds_acc = jnp.zeros((C,), jnp.float32)
        db_acc = jnp.zeros((C,), jnp.float32)
        for r in (0, 1):
            dz = jnp.where(validz & eqs[r], rep_g, 0.0)    # (2YB, 2ZB, B, C)
            if ztail:
                dz = jnp.concatenate(
                    [dz, jnp.zeros((2 * YB, ztail, B, C), jnp.float32)],
                    axis=1)                                # (2YB, TZIN, B, C)
            dpre = dz * jnp.where(pres[r] >= 0, 1.0, slope)
            dx_ref[r] = (dpre * s).astype(dx_ref.dtype)
            t = jnp.where(valid, t_ref[r].astype(jnp.float32), 0.0)
            ds_acc += jnp.sum(dpre * t, axis=(0, 1, 2))
            db_acc += jnp.sum(dpre, axis=(0, 1, 2))
        dsb_ref[0] += ds_acc
        dsb_ref[1] += db_acc

    @pl.when(i >= Xp)
    def _():
        dx_ref[0] = jnp.zeros_like(dx_ref[0])
        dx_ref[1] = jnp.zeros_like(dx_ref[1])


def _fits_bc(y) -> bool:
    b, X, Y, Z, C = y.shape
    if not (b >= 1 and X >= 2 and Y >= 2 and Z >= 2):
        return False
    # even the minimal (YB=1, ZB=1) backward block must fit scoped VMEM —
    # only violable at extreme batch*lane products (e.g. B >= ~128);
    # use the backward's live-set so fwd and bwd route identically (a
    # split decision would mix the kernel's equal-tie-split subgradient
    # with the XLA fallback's route-to-one-element convention)
    per_z = 2 * 2 * 2 * max(b, 8) * max(C, 128) * 4 * 7
    return per_z <= 14 * 1024 * 1024


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def max_pool3d_2x2_affine_act_bc(y, scale, shift, slope=0.01,
                                 use_pallas=None, interpret=False):
    """maxpool2x2x2(leaky_relu(y * scale + shift)) for XLA-conv-fed stages.

    Same math as `max_pool3d_2x2_affine_act` but with per-channel (C,)
    affine vectors and kernels that read/write the conv's native
    batch-sublane/channel-lane layout via free transpose bitcasts (see the
    section comment above). Numerically identical to the merged variant.
    """
    b, X, Y, Z, C, Xp, Yp, Zp = _ybc_dims(y)
    if (not _use_pallas_bc(y, use_pallas) and not interpret) \
            or not _fits_bc(y):
        z = y.astype(jnp.float32) * scale + shift
        z = jnp.where(z >= 0, z, slope * z).astype(y.dtype)
        return jax.lax.reduce_window(
            z, -jnp.inf, jax.lax.max, (1, 2, 2, 2, 1), (1, 2, 2, 2, 1),
            "VALID")
    interpret = auto_interpret(interpret)
    t = jnp.transpose(y, (1, 2, 3, 0, 4))      # free layout bitcast
    YB, ZB = _yb_zb_for(Y, Z, b, C, live_f32=3)
    ny = -(-Yp // YB)
    nz = -(-Zp // ZB)
    out = pl.pallas_call(
        functools.partial(_bc_fwd_kernel, ZB=ZB, B=b, C=C, slope=slope),
        out_shape=out_struct((Xp, Yp, Zp, b, C), y.dtype, t),
        grid=(Xp, ny, nz),
        in_specs=[
            pl.BlockSpec((2, 2 * YB, 2 * ZB, b, C),
                         lambda i, j, k: (i, j, k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, YB, ZB, b, C),
                               lambda i, j, k: (i, j, k, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(t, scale.reshape(1, C).astype(jnp.float32),
      shift.reshape(1, C).astype(jnp.float32))
    return jnp.transpose(out, (3, 0, 1, 2, 4))  # free bitcast for next conv


def _bca_fwd(y, scale, shift, slope, use_pallas, interpret):
    p = max_pool3d_2x2_affine_act_bc(y, scale, shift, slope, use_pallas,
                                     interpret)
    return p, (y, scale, shift, p)


def _bca_bwd(slope, use_pallas, interpret, res, g):
    y, scale, shift, p = res
    b, X, Y, Z, C, Xp, Yp, Zp = _ybc_dims(y)
    if (not _use_pallas_bc(y, use_pallas) and not interpret) \
            or not _fits_bc(y):
        def f(yy, ss, bb):
            z = yy.astype(jnp.float32) * ss + bb
            z = jnp.where(z >= 0, z, slope * z).astype(yy.dtype)
            return jax.lax.reduce_window(
                z, -jnp.inf, jax.lax.max, (1, 2, 2, 2, 1), (1, 2, 2, 2, 1),
                "VALID")

        _, vjp = jax.vjp(f, y, scale, shift)
        dy, ds, db = vjp(g)
        return dy, reduce_ct(ds, scale), reduce_ct(db, shift)
    interpret = auto_interpret(interpret)
    t = jnp.transpose(y, (1, 2, 3, 0, 4))
    pt = jnp.transpose(p, (1, 2, 3, 0, 4))
    gt = jnp.transpose(g.astype(y.dtype), (1, 2, 3, 0, 4))
    YB, ZB = _yb_zb_for(Y, Z, b, C, live_f32=7)
    ny = -(-Yp // YB)
    nz = -(-Zp // ZB)
    # dx must cover ALL Y rows and Z cols (odd-axis tails carry zero
    # gradient but must still be written). In the single-z-block regime the
    # t/dx blocks span the whole Z and the kernel zero-fills the odd tail
    # in place; in the blocked regime tail z positions get extra grid
    # blocks whose valid masks are all-False so they write pure zeros.
    # Input maps clamp to the last real block either way.
    ny_out = max(ny, -(-Y // (2 * YB)))
    tzin = Z if nz == 1 else 2 * ZB
    nz_out = max(nz, -(-Z // tzin))
    gx = X - 2 * Xp
    dx, dsb = pl.pallas_call(
        functools.partial(_bc_bwd_kernel, Yp=Yp, Zp=Zp, B=b, C=C,
                          Xp=Xp, YB=YB, ZB=ZB, TZIN=tzin, slope=slope),
        out_shape=[out_struct((X, Y, Z, b, C), y.dtype, t, gt),
                   out_struct((2, C), jnp.float32, t, gt)],
        grid=(Xp + gx, ny_out, nz_out),
        in_specs=[
            pl.BlockSpec((2, 2 * YB, tzin, b, C),
                         lambda i, j, k: (i, jnp.minimum(j, ny - 1),
                                          jnp.minimum(k, nz - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, YB, ZB, b, C),
                         lambda i, j, k: (jnp.minimum(i, Xp - 1),
                                          jnp.minimum(j, ny - 1),
                                          jnp.minimum(k, nz - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, YB, ZB, b, C),
                         lambda i, j, k: (jnp.minimum(i, Xp - 1),
                                          jnp.minimum(j, ny - 1),
                                          jnp.minimum(k, nz - 1), 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((2, 2 * YB, tzin, b, C),
                         lambda i, j, k: (i, j, k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, C), lambda i, j, k: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        interpret=interpret,
    )(t, scale.reshape(1, C).astype(jnp.float32),
      shift.reshape(1, C).astype(jnp.float32), pt, gt)
    dy = jnp.transpose(dx, (3, 0, 1, 2, 4))
    return dy, reduce_ct(dsb[0], scale), reduce_ct(dsb[1], shift)


max_pool3d_2x2_affine_act_bc.defvjp(_bca_fwd, _bca_bwd)
