"""Banded-MXU stem kernel: single-channel 3x3x3 convolution.

The first sNet stage (reference: models/networks.py:21-26) is the step-time
hotspot on TPU: with Cin=1 the MXU contraction is empty, so XLA's conv runs
at <1% utilization (~20 ms of a ~230 ms train step, per modality).

TPU-first formulation: fold the z-axis (lane-dim) stencil AND the 1->32
channel lift into one banded matrix multiply. The weights become a block-band
matrix R with R[(dx,dy), z_in, c*Z + z_out] = w[dx, dy, z_in - z_out, c];
for each output row the nine (dx, dy)-shifted (Y, Z+2) plane slices are
stacked along K and contracted against R in a single MXU dot:

    (Y, 9*(Z+2)) @ (9*(Z+2), C*Z)  ->  (Y, C*Z)

The band is ~3% dense — a deliberate ~30x FLOP redundancy that converts a
0.5 TF/s memory-bound stencil into MXU work, a ~2.5-3x wall-clock win.
The kernel emits the *linear* conv output (channels-major lanes); BatchNorm
(batch statistics in training), LeakyReLU and pooling remain XLA ops that
fuse into the consumer pass — this also keeps BN train semantics exact.

Backward needs no recompute and no kernel: the conv is linear, so dx/dw are
`jax.linear_transpose` of the XLA conv (native conv-transpose ops, whose
contractions are MXU-friendly: K = 27*C).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._common import auto_interpret, out_struct, reduce_ct


def _build_band(w, Z: int):
    """(3, 3, 3, C) kernel -> R (9*(Z+2), Z*C) block-band matrix.

    Columns are z-major/c-minor (lane = z*C + c) so the kernel output
    (B, X, Y, Z*C) IS the NDHWC tensor under a free minor-dim reshape —
    the c-major ordering used previously required a real transpose pass
    (measured ~1.6 ms/modality) plus downstream layout copies."""
    C = w.shape[-1]
    zp = jnp.arange(Z + 2)[:, None]
    zo = jnp.arange(Z)[None, :]
    diff = zp - zo  # (Z+2, Z)
    r = sum(
        jnp.einsum("pz,xyc->xypzc", (diff == dz).astype(w.dtype), w[:, :, dz])
        for dz in range(3)
    )  # (3, 3, Z+2, Z, C)
    return r.reshape(9 * (Z + 2), Z * C)


def stem_fits(spatial, C, itemsize=2, budget=14 * 1024 * 1024):
    """Conservative scoped-VMEM estimate for the banded stem kernels.

    Each forward program holds the whole padded volume block, the full
    (9*(Z+2), Z*C) band, the lhs scratch and an f32 accumulator row; the
    dw backward holds the f32 band-shaped T accumulator plus y/gy rows.
    Sized for the reference geometries (91x109x91 -> ~12 MB worst case).
    Over-budget shapes (full-resolution 182^3 needs ~65 MB) route to the
    Z-BLOCKED variants instead: the fully-banded `stem_conv_stats_blocked`
    forward (training default — full-res A/B 854.6 -> 334.4 ms/step), or
    XLA conv forward + `stem_conv_xstats`'s blocked banded dw (sliver
    chunk shapes / TRANSMF_NO_BLOCKED_STEM=1)."""
    X, Y, Z = spatial
    band = 9 * (Z + 2) * Z * C * itemsize
    fwd = ((X + 2) * (Y + 2) * (Z + 2) * itemsize + band
           + Y * 9 * (Z + 2) * itemsize + Y * Z * C * (4 + itemsize))
    bwd = (9 * (Z + 2) * Z * C * 4 + 2 * Y * Z * C * itemsize
           + Y * 9 * (Z + 2) * 4)
    return max(fwd, bwd) <= budget


def _stem_kernel(x_ref, r_ref, o_ref, lhs_ref, *, Y, Z, C):
    """Grid (B, X). x_ref: (1, X+2, Y+2, Z+2) padded volume, block cached
    across rows; r_ref: (9*(Z+2), C*Z) band; o_ref: (1, 1, Y, C*Z)."""
    i = pl.program_id(1)
    zp = Z + 2
    for dx in range(3):
        for dy in range(3):
            k = dx * 3 + dy
            lhs_ref[:, k * zp : (k + 1) * zp] = x_ref[0, i + dx, dy : dy + Y, :]
    acc = jax.lax.dot_general(
        lhs_ref[...], r_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0, 0] = acc.astype(o_ref.dtype)


def _stem_pallas(x, w, interpret=False):
    b, X, Y, Z = x.shape
    C = w.shape[-1]
    r = _build_band(w.astype(jnp.float32), Z).astype(x.dtype)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1)))
    out = pl.pallas_call(
        functools.partial(_stem_kernel, Y=Y, Z=Z, C=C),
        out_shape=out_struct((b, X, Y, Z * C), x.dtype, x),
        grid=(b, X),
        in_specs=[
            pl.BlockSpec((1, X + 2, Y + 2, Z + 2), lambda bi, i: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, Y, Z * C), lambda bi, i: (bi, i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((Y, 9 * (Z + 2)), x.dtype)],
        interpret=interpret,
    )(xp, r)
    # z-major band columns: (B, X, Y, Z*C) -> NDHWC is a free reshape
    return out.reshape(b, X, Y, Z, C)


def _conv_reference(x, w):
    return jax.lax.conv_general_dilated(
        x[..., None], w[..., None, :], (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def stem_conv(x, w, use_pallas=True, interpret=False):
    """Single-channel 3x3x3 SAME conv: (B, X, Y, Z) -> (B, X, Y, Z, C).

    Pallas banded-MXU kernel on TPU; plain XLA conv otherwise. Linear (no
    bias) — the caller adds bias / BN / activation (they fuse in XLA).
    """
    if not use_pallas:
        return _conv_reference(x, w)
    return _stem_pallas(x, w, interpret=auto_interpret(interpret))


def _stem_fwd(x, w, use_pallas, interpret):
    return stem_conv(x, w, use_pallas, interpret), (x, w)


def _stem_bwd(use_pallas, interpret, res, g):
    x, w = res
    (dx,) = jax.linear_transpose(lambda xx: _conv_reference(xx, w), x)(
        g.astype(x.dtype))
    (dw,) = jax.linear_transpose(lambda ww: _conv_reference(x, ww), w)(
        g.astype(w.dtype))
    return dx, reduce_ct(dw, w)


stem_conv.defvjp(_stem_fwd, _stem_bwd)


# ---------------------------------------------------------------------------
# Stem conv with fused Sigma/Sigma^2 statistics accumulation
#
# BatchNorm statistics of the stem output are the only reason any XLA op
# has to read the full-resolution stage-1 tensor in the forward pass — and
# XLA materializes an f32 copy of it in a y-minor layout to do so, which
# then poisons the whole stage-1 backward chain with layout copies
# (measured ~10 ms/step). Accumulating per-lane sums in the kernel epilogue
# costs two in-VMEM row reductions per grid step (~free) and removes every
# full-tensor XLA pass: mean/var come from a (2, Z*C) f32 output reduced
# outside on 2912 elements.
# ---------------------------------------------------------------------------


def _stem_stats_kernel(x_ref, r_ref, o_ref, st_ref, lhs_ref, *, Y, Z, C):
    i = pl.program_id(1)
    first = (pl.program_id(0) == 0) & (i == 0)

    @pl.when(first)
    def _():
        st_ref[...] = jnp.zeros_like(st_ref)

    zp = Z + 2
    for dx in range(3):
        for dy in range(3):
            k = dx * 3 + dy
            lhs_ref[:, k * zp: (k + 1) * zp] = x_ref[0, i + dx, dy: dy + Y, :]
    acc = jax.lax.dot_general(
        lhs_ref[...], r_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0, 0] = acc.astype(o_ref.dtype)
    # statistics of the f32 accumulator (pre-rounding; equal for f32 I/O,
    # ~1e-3-relative from the bf16-rounded sums, and more accurate)
    st_ref[0:1] += jnp.sum(acc, axis=0, keepdims=True)
    st_ref[1:2] += jnp.sum(acc * acc, axis=0, keepdims=True)


def _stem_stats_pallas(x, w, interpret=False):
    b, X, Y, Z = x.shape
    C = w.shape[-1]
    r = _build_band(w.astype(jnp.float32), Z).astype(x.dtype)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1)))
    y, st = pl.pallas_call(
        functools.partial(_stem_stats_kernel, Y=Y, Z=Z, C=C),
        out_shape=[out_struct((b, X, Y, Z * C), x.dtype, x),
                   out_struct((2, Z * C), jnp.float32, x)],
        grid=(b, X),
        in_specs=[
            pl.BlockSpec((1, X + 2, Y + 2, Z + 2), lambda bi, i: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, Y, Z * C), lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, Z * C), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((Y, 9 * (Z + 2)), x.dtype)],
        interpret=interpret,
    )(xp, r)
    return y.reshape(b, X, Y, Z, C), st


def _stem_stats_reference(x, w):
    y = _conv_reference(x, w)
    b, X, Y, Z, C = y.shape
    yf = y.astype(jnp.float32).reshape(b, X, Y, Z * C)
    return y, jnp.stack([jnp.sum(yf, axis=(0, 1, 2)),
                         jnp.sum(yf * yf, axis=(0, 1, 2))])


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def stem_conv_stats(x, w, use_pallas=True, interpret=False):
    """Single-channel 3x3x3 SAME conv + per-lane stats: (B, X, Y, Z) ->
    ((B, X, Y, Z, C), (2, Z*C) f32 [sum, sum-of-squares] over B, X, Y).

    Reduce the stats to per-channel outside: `st.reshape(2, Z, C).sum(1)`.
    """
    if not use_pallas:
        return _stem_stats_reference(x, w)
    return _stem_stats_pallas(x, w, interpret=auto_interpret(interpret))


def _ss_fwd(x, w, use_pallas, interpret):
    y, st = stem_conv_stats(x, w, use_pallas, interpret)
    return (y, st), (x, w, y)


def _ss_bwd(use_pallas, interpret, res, cot):
    x, w, y = res
    gy, gst = cot
    b, X, Y, Z, C = y.shape
    # stats cotangents broadcast into the y cotangent:
    #   d/dy [sum]   = gst[0];   d/dy [sumsq] = 2 * y * gst[1]
    # Stay in y.dtype end-to-end: an f32 formulation makes XLA materialize
    # f32 copies of BOTH full-res tensors in a y-minor layout (~10 ms/step)
    g0 = gst[0].reshape(Z, C).astype(y.dtype)
    g1 = (2.0 * gst[1]).reshape(Z, C).astype(y.dtype)
    if use_pallas:
        # banded-MXU dw with the yhat assembly fused in the kernel prologue
        dw = _stem_dw_pallas(x, y, gy, gst[0], 2.0 * gst[1],
                             interpret=auto_interpret(interpret)).astype(w.dtype)
    else:
        yhat_w = gy.astype(y.dtype) + g0 + y * g1
        (dw,) = jax.linear_transpose(lambda ww: _conv_reference(x, ww), w)(
            yhat_w.astype(w.dtype))
    # dx is dead code in training (the stem consumes the input volume);
    # XLA removes this whole chain when dx is unused.
    yhat = gy.astype(y.dtype) + g0 + y * g1
    (dx,) = jax.linear_transpose(lambda xx: _conv_reference(xx, w), x)(
        yhat.astype(x.dtype))
    return dx, reduce_ct(dw, w)


stem_conv_stats.defvjp(_ss_fwd, _ss_bwd)


# ---------------------------------------------------------------------------
# Stem conv-grad-weights on the MXU, with the stats-cotangent assembly fused
#
# XLA computes the stem dw as a VPU multiply-add running at its ~3.9 TF/s
# peak (~4 ms/modality) and needs the assembled cotangent
# yhat = gy + a + b*y materialized first — which costs another ~9 ms/modality
# in elementwise passes and layout copies ({3,2,1,0} -> {2,3,1,0} ->
# {2,4,3,1,0} -> {4,0,3,2,1}) because the conv-grad op prefers layouts its
# producers do not.
#
# This kernel assembles yhat in-register and contracts on the MXU using the
# same banded structure as the forward: per (batch, x-row),
#   T += lhs^T @ yhat        (9*(Z+2), Z*C) f32, accumulated over the grid
# where lhs is the forward kernel's (Y, 9*(Z+2)) patch packing. dw's 27 taps
# are the three shifted diagonals of each (Z+2, Z) band block of T:
#   dw[dxdy, dz, c] = sum_z T[dxdy*(Z+2) + z + dz, z*C + c]
# extracted OUTSIDE with jnp.diagonal on the (9, Z+2, Z, C) reshape (tiny).
# The band redundancy costs ~30x the minimal dw FLOPs but converts VPU
# work into MXU work and absorbs the assembly+copies: measured full-step
# win in docs/PERFORMANCE.md.
# ---------------------------------------------------------------------------


def _stem_dw_kernel(x0_ref, x1_ref, x2_ref, y_ref, gy_ref, ab_ref, t_ref,
                    lhs_ref, *, Y, Z, C):
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        t_ref[...] = jnp.zeros_like(t_ref)

    zp = Z + 2
    for dx, x_ref in enumerate((x0_ref, x1_ref, x2_ref)):
        for dy in range(3):
            k = dx * 3 + dy
            lhs_ref[:, k * zp: (k + 1) * zp] = x_ref[0, 0, dy: dy + Y, :]
    yh = (gy_ref[0, 0] +
          (ab_ref[0:1] + y_ref[0, 0].astype(jnp.float32) * ab_ref[1:2]
           ).astype(gy_ref.dtype))
    t_ref[...] += jax.lax.dot_general(
        lhs_ref[...], yh, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _stem_dw_pallas(x, y, gy, a_lanes, b_lanes, interpret=False):
    """dw (3,3,3,C) from input x (B,X,Y,Z), output y, direct cotangent gy,
    and per-lane stats-cotangent terms (yhat = gy + a + b*y)."""
    b, X, Y, Z = x.shape
    C = y.shape[-1]
    zp = Z + 2
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1))).astype(y.dtype)
    y2 = y.reshape(b, X, Y, Z * C)
    g2 = gy.reshape(b, X, Y, Z * C).astype(y.dtype)
    ab = jnp.stack([a_lanes, b_lanes]).astype(jnp.float32)  # (2, Z*C)

    def row_spec(off):
        return pl.BlockSpec((1, 1, Y + 2, zp),
                            lambda bi, i: (bi, i + off, 0, 0),
                            memory_space=pltpu.VMEM)

    t = pl.pallas_call(
        functools.partial(_stem_dw_kernel, Y=Y, Z=Z, C=C),
        out_shape=out_struct((9 * zp, Z * C), jnp.float32, x, gy),
        grid=(b, X),
        in_specs=[
            row_spec(0), row_spec(1), row_spec(2),
            pl.BlockSpec((1, 1, Y, Z * C), lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Y, Z * C), lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((9 * zp, Z * C), lambda bi, i: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((Y, 9 * zp), y.dtype)],
        interpret=interpret,
    )(xp, xp, xp, y2, g2, ab)

    t4 = t.reshape(9, zp, Z, C)
    taps = [jnp.diagonal(t4, offset=-dz, axis1=1, axis2=2).sum(-1)
            for dz in range(3)]                       # each (9, C)
    dw = jnp.stack(taps, axis=1).reshape(3, 3, 3, C)  # (dxdy, dz) -> 3,3,3
    return dw


# ---------------------------------------------------------------------------
# Full-resolution stem: XLA conv forward + Z-BLOCKED banded-MXU dw backward
#
# Beyond `stem_fits` (182^3-class volumes) the banded forward kernels
# overflow scoped VMEM and the XLA conv takes over — but the weight
# gradient then regresses to an XLA VPU multiply-add (measured 29
# ms/modality at 182x218x182 batch 2, `multiply_add_fusion` in the trace)
# plus full-resolution stats-cotangent assembly passes. The banded dw
# formulation still wins there once its (9*(Z+2), Z*C) f32 band accumulator
# is blocked over z: output z-chunks of `tz` lanes need only the x-window
# [zb*tz, zb*tz+tz+2), so each grid step accumulates a small
# (9*(tz+2), tz*C) T block — z_in windows overlap by 2 between chunks, so
# the windows are pre-gathered into a (nzb, B, X+2, Y+2, tz+2) tensor by
# XLA (a ~1.08x copy of the cheap INPUT volume, not the conv output).
# dw taps are shifted diagonals of each T block, summed over blocks.
# ---------------------------------------------------------------------------


def _pick_tz(Z: int, C: int, target_lanes: int = 1024,
             budget: int = 6 * 1024 * 1024) -> int:
    """z-chunk size: ~target_lanes merged lanes per block, T block under
    `budget`, preferring divisors of Z (no lane padding of y/gy) — but
    never a sliver divisor: chunks below tz_max/2 (e.g. tz=1 for prime Z)
    would explode the grid into tiny dots; the no-divisor case instead
    pads z_out to nzb*tz (the Zo != Z machinery below).

    Mosaic lane-block constraint: a lane block that does not span the
    whole array must have extent % 128 == 0, so tz*C must be a multiple
    of 128 whenever tz < Z (e.g. Z=182, C=32: the divisor 26 gives an
    832-lane block that FAILS TPU lowering — interpret mode does not
    catch this). tz is therefore snapped to multiples of
    q = 128/gcd(C, 128); Z=182 lands on tz=32 via the padded regime."""
    tz = max(1, min(Z, target_lanes // max(C, 1)))
    while tz > 1 and 9 * (tz + 2) * tz * C * 4 > budget:
        tz -= 1
    if tz >= Z:
        return Z  # single block: lane extent == array extent, no snap
    q = 128 // math.gcd(C, 128)
    tz = (tz // q) * q
    if tz < q:
        return 1  # sliver: callers gate this to the XLA fallback
    for d in range(tz, max(tz // 2, q - 1), -q):
        if Z % d == 0:
            return d
    return tz


def _stem_dw_blocked_kernel(x0_ref, x1_ref, x2_ref, y_ref, gy_ref, ab_ref,
                            t_ref, lhs_ref, *, Y, TZ, TLC, ZC):
    first = (pl.program_id(1) == 0) & (pl.program_id(2) == 0)

    @pl.when(first)
    def _():
        t_ref[...] = jnp.zeros_like(t_ref)

    zpw = TZ + 2
    for dx, x_ref in enumerate((x0_ref, x1_ref, x2_ref)):
        for dy in range(3):
            k = dx * 3 + dy
            lhs_ref[:, k * zpw: (k + 1) * zpw] = x_ref[0, 0, 0, dy: dy + Y, :]
    yh = (gy_ref[0, 0] +
          (ab_ref[0:1] + y_ref[0, 0].astype(jnp.float32) * ab_ref[1:2]
           ).astype(gy_ref.dtype))
    # non-divisor Z: y/gy/ab are UNPADDED (a full-tensor lane-pad copy
    # cost ~5.9 ms/modality at 182^3, round-4 trace) — the tail block's
    # out-of-range lanes read unspecified values, zeroed here so the
    # phantom T columns contribute nothing to the diagonal taps
    valid = ZC - pl.program_id(0) * TLC
    if ZC % TLC:
        lanes = jax.lax.broadcasted_iota(jnp.int32, yh.shape, 1)
        yh = jnp.where(lanes < valid, yh, 0)
    t_ref[...] += jax.lax.dot_general(
        lhs_ref[...], yh, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _stem_dw_blocked_pallas(x, y, gy, a_t, b_t, interpret=False):
    """dw (3,3,3,C) from input x (B,X,Y,Z), conv output y (B,X,Y,Z,C),
    direct cotangent gy, and stats-cotangent terms — PER-CHANNEL (C,) or
    PER-LANE (Z*C,) — (yhat = gy + a + b * y), with the band accumulator
    blocked over z so full-resolution volumes fit scoped VMEM."""
    b, X, Y, Z = x.shape
    C = y.shape[-1]
    tz = _pick_tz(Z, C)
    nzb = -(-Z // tz)
    Zo = nzb * tz
    zpw = tz + 2
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1 + Zo - Z))).astype(y.dtype)
    # overlapping z_in windows, pre-gathered (static slices; ~1.08x of the
    # input volume — NOT of the 16x-larger conv output)
    xw = jnp.stack([xp[..., zb * tz: zb * tz + zpw] for zb in range(nzb)])
    # y/gy/ab stay UNPADDED at Z*C lanes: the tail block reads clipped
    # (unspecified padding) and the kernel zero-masks its phantom lanes —
    # a lane-pad here costs a full-tensor copy (~5.9 ms/modality at 182^3)
    y2 = y.reshape(b, X, Y, Z * C)
    g2 = gy.reshape(b, X, Y, Z * C).astype(y.dtype)
    if a_t.shape == (C,):
        ab = jnp.stack([jnp.tile(a_t, Z), jnp.tile(b_t, Z)])
    else:  # per-lane (Z*C,)
        ab = jnp.stack([a_t, b_t])
    ab = ab.astype(jnp.float32)

    def row_spec(off):
        return pl.BlockSpec((1, 1, 1, Y + 2, zpw),
                            lambda zb, bi, i: (zb, bi, i + off, 0, 0),
                            memory_space=pltpu.VMEM)

    def chunk_spec():
        return pl.BlockSpec((1, 1, Y, tz * C),
                            lambda zb, bi, i: (bi, i, 0, zb),
                            memory_space=pltpu.VMEM)

    t = pl.pallas_call(
        functools.partial(_stem_dw_blocked_kernel, Y=Y, TZ=tz,
                          TLC=tz * C, ZC=Z * C),
        out_shape=out_struct((nzb, 9 * zpw, tz * C), jnp.float32, x, gy),
        grid=(nzb, b, X),
        in_specs=[
            row_spec(0), row_spec(1), row_spec(2),
            chunk_spec(), chunk_spec(),
            pl.BlockSpec((2, tz * C), lambda zb, bi, i: (0, zb),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 9 * zpw, tz * C),
                               lambda zb, bi, i: (zb, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((Y, 9 * zpw), y.dtype)],
        interpret=interpret,
    )(xw, xw, xw, y2, g2, ab)

    t5 = t.reshape(nzb, 9, zpw, tz, C)
    taps = [jnp.diagonal(t5, offset=-dz, axis1=2, axis2=3).sum((0, -1))
            for dz in range(3)]                       # each (9, C)
    dw = jnp.stack(taps, axis=1).reshape(3, 3, 3, C)  # (dxdy, dz) -> 3,3,3
    return dw


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def stem_conv_xstats(x, w, use_pallas=True, interpret=False):
    """Full-resolution stem: XLA conv + per-channel Σ/Σ² statistics.

    Forward is the plain XLA conv (the banded kernel's VMEM gate fails at
    these shapes) with bf16-read f32-accumulated per-channel sums — the
    same `convert_reduce` XLA fuses into its convolutions (the s2 pattern,
    docs/PERFORMANCE.md). Backward intercepts the COMBINED cotangent
    (direct gy + stats terms) and computes dw on the MXU via the z-blocked
    banded kernel, with the yhat assembly fused into its prologue — the
    XLA route costs 29 ms/modality of VPU multiply-add plus full-res
    assembly passes at 182^3.

    Returns (y (B,X,Y,Z,C), st (2, C) f32 [Σ, Σ²] over B,X,Y,Z), matching
    ManualBN's own statistics math (nn/batchnorm.py:61-67).
    """
    y = _conv_reference(x, w)
    yf = y.astype(jnp.float32)
    s = jnp.sum(yf, axis=(0, 1, 2, 3))
    ss = jnp.sum(jax.lax.square(yf), axis=(0, 1, 2, 3))
    return y, jnp.stack([s, ss])


def _xs_fwd(x, w, use_pallas, interpret):
    y, st = stem_conv_xstats(x, w, use_pallas, interpret)
    return (y, st), (x, w, y)


def _xs_bwd(use_pallas, interpret, res, cot):
    x, w, y = res
    gy, gst = cot
    a_ch = gst[0]
    b_ch = 2.0 * gst[1]
    # sliver chunks (huge C forcing tz < 4) would explode the dw grid
    # into tiny dots — the XLA multiply-add is the better loss there
    if use_pallas and _pick_tz(x.shape[3], y.shape[-1]) < 4:
        use_pallas = False
    if use_pallas:
        dw = _stem_dw_blocked_pallas(
            x, y, gy, a_ch, b_ch,
            interpret=auto_interpret(interpret)).astype(w.dtype)
    else:
        yhat_w = (gy.astype(y.dtype) +
                  (a_ch + y.astype(jnp.float32) * b_ch).astype(y.dtype))
        (dw,) = jax.linear_transpose(lambda ww: _conv_reference(x, ww), w)(
            yhat_w.astype(w.dtype))
    # dx is dead code in training (the stem consumes the input volume);
    # XLA removes this whole chain when dx is unused.
    yhat = (gy.astype(y.dtype) +
            (a_ch + y.astype(jnp.float32) * b_ch).astype(y.dtype))
    (dx,) = jax.linear_transpose(lambda xx: _conv_reference(xx, w), x)(
        yhat.astype(x.dtype))
    return dx, reduce_ct(dw, w)


stem_conv_xstats.defvjp(_xs_fwd, _xs_bwd)


# ---------------------------------------------------------------------------
# Z-BLOCKED banded-MXU stem forward + in-kernel statistics
#
# The banded forward formulation (top of this module) blocked over z_out
# chunks of `tz` lanes: each grid step contracts the (Y, 9*(tz+2)) window
# packing against a LOCAL band R_loc = _build_band(w, tz) — identical for
# every chunk, because a chunk's padded z_in window starts exactly tz
# before its z_out start, so local offsets match the global band layout.
# Σ/Σ² accumulate per lane chunk in VMEM. Output stays in the merged
# (B, X, Y, Z*C) layout the (now lane-chunkable) merged pool consumes.
# Non-divisor Z (e.g. 182 with 128-aligned tz=32) zero-pads z_in and
# relies on Pallas clipping the tail block's out-of-bounds output/stat
# lanes on write. Default over-VMEM route in nn/blocks.py
# (TRANSMF_NO_BLOCKED_STEM=1 reverts to the XLA-fwd regime).
# ---------------------------------------------------------------------------


def stem_can_block(Z: int, C: int) -> bool:
    """True when a non-sliver aligned chunk size exists. Non-divisor Z
    (e.g. 182 with 128-aligned tz=32) takes the clipped-tail regime: the
    input is explicitly zero-padded to nzb*tz, and the final block's
    out-of-bounds output/stat lanes are dropped by Pallas on write."""
    tz = _pick_tz(Z, C)
    return 4 <= tz < Z


def _stem_blocked_kernel(x0_ref, x1_ref, x2_ref, r_ref, o_ref, st_ref,
                         lhs_ref, *, Y, TZ):
    first = (pl.program_id(1) == 0) & (pl.program_id(2) == 0)

    @pl.when(first)
    def _():
        st_ref[...] = jnp.zeros_like(st_ref)

    zpw = TZ + 2
    for dx, x_ref in enumerate((x0_ref, x1_ref, x2_ref)):
        for dy in range(3):
            k = dx * 3 + dy
            lhs_ref[:, k * zpw: (k + 1) * zpw] = x_ref[0, 0, 0, dy: dy + Y, :]
    acc = jax.lax.dot_general(
        lhs_ref[...], r_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0, 0] = acc.astype(o_ref.dtype)
    st_ref[0:1] += jnp.sum(acc, axis=0, keepdims=True)
    st_ref[1:2] += jnp.sum(acc * acc, axis=0, keepdims=True)


def _stem_stats_blocked_pallas(x, w, interpret=False):
    b, X, Y, Z = x.shape
    C = w.shape[-1]
    tz = _pick_tz(Z, C)
    nzb = -(-Z // tz)
    zpw = tz + 2
    Zo = nzb * tz
    r = _build_band(w.astype(jnp.float32), tz).astype(x.dtype)
    # non-divisor Z: zero-pad z_in so the tail chunk's window reads are
    # defined (finite garbage-free conv values in the phantom columns);
    # the phantom z_out lanes fall outside the unpadded output/stat
    # arrays, so Pallas clips them on write — nothing to slice after.
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1 + Zo - Z)))
    xw = jnp.stack([xp[..., zb * tz: zb * tz + zpw] for zb in range(nzb)])

    def row_spec(off):
        return pl.BlockSpec((1, 1, 1, Y + 2, zpw),
                            lambda zb, bi, i: (zb, bi, i + off, 0, 0),
                            memory_space=pltpu.VMEM)

    y, st = pl.pallas_call(
        functools.partial(_stem_blocked_kernel, Y=Y, TZ=tz),
        out_shape=[out_struct((b, X, Y, Z * C), x.dtype, x),
                   out_struct((2, Z * C), jnp.float32, x)],
        grid=(nzb, b, X),
        in_specs=[
            row_spec(0), row_spec(1), row_spec(2),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, Y, tz * C),
                         lambda zb, bi, i: (bi, i, 0, zb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, tz * C), lambda zb, bi, i: (0, zb),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((Y, 9 * zpw), x.dtype)],
        interpret=interpret,
    )(xw, xw, xw, r)
    return y.reshape(b, X, Y, Z, C), st


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def stem_conv_stats_blocked(x, w, use_pallas=True, interpret=False):
    """Z-blocked banded stem conv + per-lane stats for over-VMEM volumes.

    Same contract as `stem_conv_stats` — (B,X,Y,Z) -> ((B,X,Y,Z,C),
    (2, Z*C) f32 [Σ, Σ²]) — but gridded over z chunks so 182^3-class
    inputs fit scoped VMEM (divisor and clipped-tail regimes). Backward:
    z-blocked banded dw with the per-lane stats-cotangent assembly fused
    (`_stem_dw_blocked_pallas`).
    """
    if not use_pallas:
        return _stem_stats_reference(x, w)
    return _stem_stats_blocked_pallas(x, w, interpret=auto_interpret(interpret))


def _sb_fwd(x, w, use_pallas, interpret):
    y, st = stem_conv_stats_blocked(x, w, use_pallas, interpret)
    return (y, st), (x, w, y)


def _sb_bwd(use_pallas, interpret, res, cot):
    x, w, y = res
    gy, gst = cot
    g0 = gst[0]
    g1 = 2.0 * gst[1]
    if use_pallas:
        dw = _stem_dw_blocked_pallas(
            x, y, gy, g0, g1,
            interpret=auto_interpret(interpret)).astype(w.dtype)
    else:
        Z, C = y.shape[-2], y.shape[-1]
        yhat_w = (gy.astype(y.dtype) +
                  (g0.reshape(Z, C) + y.astype(jnp.float32)
                   * g1.reshape(Z, C)).astype(y.dtype))
        (dw,) = jax.linear_transpose(lambda ww: _conv_reference(x, ww), w)(
            yhat_w.astype(w.dtype))
    Z, C = y.shape[-2], y.shape[-1]
    yhat = (gy.astype(y.dtype) +
            (g0.reshape(Z, C) + y.astype(jnp.float32)
             * g1.reshape(Z, C)).astype(y.dtype))
    # dx is dead code in training (the stem consumes the input volume)
    (dx,) = jax.linear_transpose(lambda xx: _conv_reference(xx, w), x)(
        yhat.astype(x.dtype))
    return dx, reduce_ct(dw, w)


stem_conv_stats_blocked.defvjp(_sb_fwd, _sb_bwd)
