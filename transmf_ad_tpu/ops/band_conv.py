"""Z-blocked banded-MXU body convolution (Cin>1 3x3x3 SAME, stride 1).

The s2-class convolutions (reference: models/networks.py:28-35, the
conv2 stage) dominate the full-resolution train step after round 3's
stem work: at 182x218x182 they run at pooled 91x109x91 resolution and
XLA's im2col formulation holds them at its measured ~24 TF/s ceiling
(docs/PERFORMANCE.md "Remaining headroom"). This module generalizes the
stem's banded formulation (ops/stem.py) from Cin=1 to arbitrary Cin:

    lhs (B*Y, 9*(tz+2)*Cin)  @  R (9*(tz+2)*Cin, tz*Cout)

where lhs packs the nine (dx, dy)-shifted (Y, (tz+2)*Cin) merged-layout
window slices per x-row and R is the block-band matrix
R[(dx,dy), z_in, c_in, z_out*Cout + c_out] = w[dx, dy, z_in - z_out, c_in,
c_out]. Unlike the stem (Cin=1, band ~3% dense, ~30x FLOP redundancy),
the body band is (tz+2)/3 redundant — 2x at tz=4 — so the MXU only has
to beat HALF of XLA's im2col throughput to win. The z-blocking reuses
the stem machinery wholesale: aligned lane chunks (tz*Cout % 128 == 0),
divisor and clipped-tail regimes, window pre-gather of the (cheap,
(tz+2)/tz ~ 1.5x) overlapping z_in slices.

The batch dimension rides the SUBLANE axis: each grid step contracts all
B x-rows at once (M = B*ceil(Y,8)), keeping grid steps MXU-meaty
(~0.5-1 us of dot per step) instead of exploding the grid.

Backward needs no new math: dx is the SAME kernel applied to the
cotangent with the flipped/transposed band (a stride-1 SAME conv's
transpose is a conv with w reversed in space and Cin/Cout swapped), and
dw is the banded-T accumulation T += lhs^T @ gy whose 27 taps are
shifted diagonals of the (zpw, tz) band blocks — the stem dw pattern
(ops/stem.py::_stem_dw_blocked_pallas) with a (Cin, Cout) tap matrix.

BatchNorm statistics deliberately stay OUTSIDE this kernel: the output
is bf16 in the merged row-major layout, so XLA's per-channel reduce is
lane-preserving (no layout copy — the failure mode that killed the
round-3 body-stats kernel), and leaving stats to XLA keeps the autodiff
chain standard (the gy arriving here already includes the stats
cotangent).

Default ON for stages with >= 400k output voxels (full-resolution-class
tensors only — XLA's im2col wins at 45-cubed and below, where it runs
near the MXU roofline; measured in docs/PERFORMANCE.md "Full-resolution
training, round-4 update"). TRANSMF_BAND_CONV=0 disables, =all ignores
the threshold (for A/Bs), TRANSMF_BAND_CONV_MIN_VOX overrides it
(routing in nn/blocks.py).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._common import auto_interpret, out_struct, reduce_ct

__all__ = ["band_conv3d", "band_conv3d_stats", "band_conv_fits",
           "pick_tz_body"]


def _build_band_c(w, tz: int):
    """(3, 3, 3, Cin, Cout) kernel -> R (9*(tz+2)*Cin, tz*Cout) block-band.

    Row order (dx, dy, z_in, c_in) matches the lhs window packing (merged
    z-major/c-minor lanes); column order (z_out, c_out) makes the kernel
    output the merged NDHWC tensor under a free minor-dim reshape."""
    zp = jnp.arange(tz + 2)[:, None]
    zo = jnp.arange(tz)[None, :]
    diff = zp - zo  # (tz+2, tz)
    r = sum(
        jnp.einsum("pz,xyio->xypizo", (diff == dz).astype(w.dtype),
                   w[:, :, dz])
        for dz in range(3)
    )  # (3, 3, tz+2, Cin, tz, Cout)
    cin, cout = w.shape[3], w.shape[4]
    return r.reshape(9 * (tz + 2) * cin, tz * cout)


def pick_tz_body(Z: int, cout: int, max_chunks: int = 32) -> int:
    """Aligned z-chunk size for the banded body kernels.

    Smaller tz means less band redundancy ((tz+2)/3), but more grid steps;
    tz grows in lane-alignment quanta (tz*Cout % 128 == 0 whenever tz < Z,
    the Mosaic constraint ops/stem.py::_pick_tz documents) until the chunk
    count drops to `max_chunks`. Returns Z (single block, no constraint)
    when the quantum already covers the whole axis."""
    q = 128 // math.gcd(cout, 128)
    if q >= Z:
        return Z
    tz = q
    while -(-Z // tz) > max_chunks:
        tz += q
        if tz >= Z:
            return Z
    return tz


def _vmem_bytes(B, Y, Z, cin, cout, tz, itemsize=2):
    """Scoped-VMEM estimate for the heaviest program (fwd or dw)."""
    zpw = tz + 2
    kw = zpw * cin
    yp = -(-Y // 8) * 8
    lhs = B * yp * 9 * kw * itemsize
    band = 9 * kw * tz * cout * itemsize
    win = 3 * B * (Y + 2) * kw * itemsize
    out = B * Y * tz * cout * itemsize
    acc = B * yp * tz * cout * 4  # f32 dot accumulator
    fwd = lhs + band + win + out + acc
    t_acc = 9 * kw * tz * cout * 4
    dw = lhs + t_acc + win + 2 * out
    return max(fwd, dw)


def band_conv_fits(spatial, cin: int, cout: int, B: int,
                   itemsize: int = 2, budget: int = 12 * 1024 * 1024) -> bool:
    """Whether the banded body kernels fit scoped VMEM for this geometry
    (both conv directions — dx swaps Cin/Cout)."""
    X, Y, Z = spatial
    tz = pick_tz_body(Z, cout)
    tzt = pick_tz_body(Z, cin)
    return (_vmem_bytes(B, Y, Z, cin, cout, tz, itemsize) <= budget
            and _vmem_bytes(B, Y, Z, cout, cin, tzt, itemsize) <= budget)


def _gather_windows(x4, Z: int, tz: int, nzb: int, cin: int):
    """(B, X, Y, Z*Cin) merged tensor -> (nzb, B, X+2, Y+2, (tz+2)*Cin)
    spatially padded overlapping z_in windows (static slices; ~1.5x of the
    input bytes at tz=4)."""
    b, X, Y, _ = x4.shape
    Zo = nzb * tz
    x5 = x4.reshape(b, X, Y, Z, cin)
    x5 = jnp.pad(x5, ((0, 0), (1, 1), (1, 1), (1, 1 + Zo - Z), (0, 0)))
    xm = x5.reshape(b, X + 2, Y + 2, (Zo + 2) * cin)
    zpw = tz + 2
    return jnp.stack([xm[..., zb * tz * cin: (zb * tz + zpw) * cin]
                      for zb in range(nzb)])


def _band_kernel(x0_ref, x1_ref, x2_ref, r_ref, o_ref, lhs_ref,
                 *, B, Y, YP, KW):
    first = ((pl.program_id(0) == 0) & (pl.program_id(1) == 0))

    @pl.when(first)
    def _():
        # zero once: the Yp-Y sublane pad rows are never written after
        lhs_ref[...] = jnp.zeros_like(lhs_ref)

    for dx, x_ref in enumerate((x0_ref, x1_ref, x2_ref)):
        for dy in range(3):
            k = dx * 3 + dy
            for bi in range(B):
                lhs_ref[bi * YP: bi * YP + Y, k * KW: (k + 1) * KW] = (
                    x_ref[0, bi, 0, dy: dy + Y, :])
    acc = jax.lax.dot_general(
        lhs_ref[...], r_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    for bi in range(B):
        o_ref[bi, 0] = acc[bi * YP: bi * YP + Y].astype(o_ref.dtype)


def _band_stats_kernel(x0_ref, x1_ref, x2_ref, r_ref, o_ref, st_ref, lhs_ref,
                       *, B, Y, YP, KW):
    """Forward + per-lane Σ/Σ² of the f32 accumulator, the stem pattern
    (ops/stem.py::_stem_blocked_kernel): an XLA-side stats reduce of a
    Pallas output materializes an f32 transposed copy of the full tensor
    (2.5 ms/modality at 91³×64, round-4 trace) and poisons the backward
    chain with f32 intermediates. Zero-padded lhs rows (sublane pad AND
    the Yp-Y tail) contribute exact zeros to both sums; the clipped-tail
    phantom z lanes never land (Pallas clips the st block on write)."""
    first = ((pl.program_id(0) == 0) & (pl.program_id(1) == 0))

    @pl.when(first)
    def _():
        lhs_ref[...] = jnp.zeros_like(lhs_ref)

    @pl.when(pl.program_id(1) == 0)
    def _():
        st_ref[...] = jnp.zeros_like(st_ref)

    for dx, x_ref in enumerate((x0_ref, x1_ref, x2_ref)):
        for dy in range(3):
            k = dx * 3 + dy
            for bi in range(B):
                lhs_ref[bi * YP: bi * YP + Y, k * KW: (k + 1) * KW] = (
                    x_ref[0, bi, 0, dy: dy + Y, :])
    acc = jax.lax.dot_general(
        lhs_ref[...], r_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    for bi in range(B):
        o_ref[bi, 0] = acc[bi * YP: bi * YP + Y].astype(o_ref.dtype)
    st_ref[0:1] += jnp.sum(acc, axis=0, keepdims=True)
    st_ref[1:2] += jnp.sum(acc * acc, axis=0, keepdims=True)


def _band_conv_pallas(x5, w, interpret=False, stats=False):
    b, X, Y, Z, cin = x5.shape
    cout = w.shape[-1]
    tz = pick_tz_body(Z, cout)
    nzb = -(-Z // tz)
    zpw = tz + 2
    kw = zpw * cin
    yp = -(-Y // 8) * 8
    r = _build_band_c(w.astype(jnp.float32), tz).astype(x5.dtype)
    xw = _gather_windows(x5.reshape(b, X, Y, Z * cin), Z, tz, nzb, cin)

    def row_spec(off):
        return pl.BlockSpec((1, b, 1, Y + 2, kw),
                            lambda zb, i: (zb, 0, i + off, 0, 0),
                            memory_space=pltpu.VMEM)

    out_spec = pl.BlockSpec((b, 1, Y, tz * cout),
                            lambda zb, i: (0, i, 0, zb),
                            memory_space=pltpu.VMEM)
    kernel = _band_stats_kernel if stats else _band_kernel
    out_shape = out_struct((b, X, Y, Z * cout), x5.dtype, x5)
    if stats:
        out_shape = [out_shape,
                     out_struct((2, Z * cout), jnp.float32, x5)]
        out_spec = [out_spec,
                    pl.BlockSpec((2, tz * cout), lambda zb, i: (0, zb),
                                 memory_space=pltpu.VMEM)]
    res = pl.pallas_call(
        functools.partial(kernel, B=b, Y=Y, YP=yp, KW=kw),
        out_shape=out_shape,
        grid=(nzb, X),
        in_specs=[
            row_spec(0), row_spec(1), row_spec(2),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=out_spec,
        scratch_shapes=[pltpu.VMEM((b * yp, 9 * kw), x5.dtype)],
        interpret=interpret,
    )(xw, xw, xw, r)
    if stats:
        return res[0].reshape(b, X, Y, Z, cout), res[1]
    return res.reshape(b, X, Y, Z, cout)


def _conv_reference(x5, w):
    return jax.lax.conv_general_dilated(
        x5, w, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


# ---------------------------------------------------------------------------
# dw: banded-T accumulation, taps extracted as shifted diagonals
# ---------------------------------------------------------------------------


def _band_dw_kernel(x0_ref, x1_ref, x2_ref, gy_ref, t_ref, lhs_ref, gys_ref,
                    *, B, Y, YP, KW, TLC, ZCo):
    first = (pl.program_id(1) == 0)

    @pl.when(first & (pl.program_id(0) == 0))
    def _():
        # zero once: the Yp-Y sublane pad rows are never written after,
        # and zero lhs pad rows null the pairing whatever gys holds there
        lhs_ref[...] = jnp.zeros_like(lhs_ref)
        gys_ref[...] = jnp.zeros_like(gys_ref)

    @pl.when(first)
    def _():
        t_ref[...] = jnp.zeros_like(t_ref)

    for dx, x_ref in enumerate((x0_ref, x1_ref, x2_ref)):
        for dy in range(3):
            k = dx * 3 + dy
            for bi in range(B):
                lhs_ref[bi * YP: bi * YP + Y, k * KW: (k + 1) * KW] = (
                    x_ref[0, bi, 0, dy: dy + Y, :])
    for bi in range(B):
        gys_ref[bi * YP: bi * YP + Y, :] = gy_ref[bi, 0]
    gys = gys_ref[...]
    # clipped-tail regime: gy is UNPADDED (a lane-pad costs a full-tensor
    # copy); the tail block's out-of-range lanes read unspecified values,
    # zeroed here so phantom T columns contribute nothing to the taps
    if ZCo % TLC:
        valid = ZCo - pl.program_id(0) * TLC
        lanes = jax.lax.broadcasted_iota(jnp.int32, gys.shape, 1)
        gys = jnp.where(lanes < valid, gys, 0)
    t_ref[0] += jax.lax.dot_general(
        lhs_ref[...], gys, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _band_dw_ab_kernel(x0_ref, x1_ref, x2_ref, y_ref, gy_ref, ab_ref,
                       t_ref, lhs_ref, gys_ref, *, B, Y, YP, KW, TLC, ZCo):
    """dw with the stats-cotangent assembly fused: yhat = gy + a + b*y
    per lane (the stem dw pattern) — the XLA route materializes a
    full-resolution f32 yhat chain."""
    first = (pl.program_id(1) == 0)

    @pl.when(first & (pl.program_id(0) == 0))
    def _():
        lhs_ref[...] = jnp.zeros_like(lhs_ref)
        gys_ref[...] = jnp.zeros_like(gys_ref)

    @pl.when(first)
    def _():
        t_ref[...] = jnp.zeros_like(t_ref)

    for dx, x_ref in enumerate((x0_ref, x1_ref, x2_ref)):
        for dy in range(3):
            k = dx * 3 + dy
            for bi in range(B):
                lhs_ref[bi * YP: bi * YP + Y, k * KW: (k + 1) * KW] = (
                    x_ref[0, bi, 0, dy: dy + Y, :])
    for bi in range(B):
        gys_ref[bi * YP: bi * YP + Y, :] = (
            gy_ref[bi, 0] +
            (ab_ref[0:1] + y_ref[bi, 0].astype(jnp.float32) * ab_ref[1:2]
             ).astype(gy_ref.dtype))
    gys = gys_ref[...]
    if ZCo % TLC:  # clipped tail: zero-mask phantom lanes (see above)
        valid = ZCo - pl.program_id(0) * TLC
        lanes = jax.lax.broadcasted_iota(jnp.int32, gys.shape, 1)
        gys = jnp.where(lanes < valid, gys, 0)
    t_ref[0] += jax.lax.dot_general(
        lhs_ref[...], gys, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _band_dw_pallas(x5, gy, cin, cout, interpret=False, y=None, ab=None):
    """dw (3,3,3,Cin,Cout) from input x5 (B,X,Y,Z,Cin) and cotangent gy
    (B,X,Y,Z,Cout): per z-chunk T[zb] += lhs^T @ gy accumulated over x
    rows; taps are the three shifted diagonals of each (zpw, tz) band
    block of T, summed over chunks."""
    b, X, Y, Z, _ = x5.shape
    tz = pick_tz_body(Z, cout)
    nzb = -(-Z // tz)
    zpw = tz + 2
    kw = zpw * cin
    yp = -(-Y // 8) * 8
    xw = _gather_windows(x5.reshape(b, X, Y, Z * cin), Z, tz, nzb, cin)
    # gy stays UNPADDED: the tail block reads clipped and the kernel
    # zero-masks its phantom lanes (a lane-pad here is a full-tensor copy)
    g2 = gy.reshape(b, X, Y, Z * cout)

    def row_spec(off):
        return pl.BlockSpec((1, b, 1, Y + 2, kw),
                            lambda zb, i: (zb, 0, i + off, 0, 0),
                            memory_space=pltpu.VMEM)

    def chunk_spec():
        return pl.BlockSpec((b, 1, Y, tz * cout), lambda zb, i: (0, i, 0, zb),
                            memory_space=pltpu.VMEM)

    kw_static = dict(B=b, Y=Y, YP=yp, KW=kw, TLC=tz * cout, ZCo=Z * cout)
    common = dict(
        out_shape=out_struct((nzb, 9 * kw, tz * cout), jnp.float32, x5, gy),
        grid=(nzb, X),
        out_specs=pl.BlockSpec((1, 9 * kw, tz * cout),
                               lambda zb, i: (zb, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((b * yp, 9 * kw), x5.dtype),
                        pltpu.VMEM((b * yp, tz * cout), gy.dtype)],
        interpret=interpret,
    )
    if ab is not None:
        y2 = y.reshape(b, X, Y, Z * cout)
        t = pl.pallas_call(
            functools.partial(_band_dw_ab_kernel, **kw_static),
            in_specs=[row_spec(0), row_spec(1), row_spec(2),
                      chunk_spec(), chunk_spec(),
                      pl.BlockSpec((2, tz * cout), lambda zb, i: (0, zb),
                                   memory_space=pltpu.VMEM)],
            **common,
        )(xw, xw, xw, y2, g2, ab.astype(jnp.float32))
    else:
        t = pl.pallas_call(
            functools.partial(_band_dw_kernel, **kw_static),
            in_specs=[row_spec(0), row_spec(1), row_spec(2), chunk_spec()],
            **common,
        )(xw, xw, xw, g2)

    t6 = t.reshape(nzb, 9, zpw, cin, tz, cout)
    taps = [jnp.diagonal(t6, offset=-dz, axis1=2, axis2=4).sum((0, -1))
            for dz in range(3)]  # each (9, Cin, Cout): diag moves (zpw, tz)
    dw = jnp.stack(taps, axis=1)  # (9, 3, Cin, Cout)
    return dw.reshape(3, 3, 3, cin, cout)


def _flip_w(w):
    """Transpose conv weights: reverse space, swap Cin/Cout."""
    return jnp.flip(w, axis=(0, 1, 2)).swapaxes(3, 4)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def band_conv3d(x5, w, use_pallas=True, interpret=False):
    """3x3x3 SAME stride-1 conv, (B,X,Y,Z,Cin) -> (B,X,Y,Z,Cout), via the
    z-blocked banded-MXU kernel (XLA conv when use_pallas=False). Linear
    (no bias); emits the merged row-major layout under a free reshape, so
    the merged pool/BN consumers follow without layout copies."""
    if not use_pallas:
        return _conv_reference(x5, w)
    return _band_conv_pallas(x5, w, interpret=auto_interpret(interpret))


def _bc_fwd(x5, w, use_pallas, interpret):
    return band_conv3d(x5, w, use_pallas, interpret), (x5, w)


def _bc_bwd(use_pallas, interpret, res, gy):
    x5, w = res
    if use_pallas:
        itp = auto_interpret(interpret)
        gyd = gy.astype(x5.dtype)
        dx = _band_conv_pallas(gyd, _flip_w(w).astype(x5.dtype),
                               interpret=itp)
        dw = _band_dw_pallas(x5, gyd, w.shape[3], w.shape[4],
                             interpret=itp).astype(w.dtype)
    else:
        (dx,) = jax.linear_transpose(lambda xx: _conv_reference(xx, w), x5)(
            gy.astype(x5.dtype))
        (dw,) = jax.linear_transpose(lambda ww: _conv_reference(x5, ww), w)(
            gy.astype(w.dtype))
    return dx.astype(x5.dtype), reduce_ct(dw, w)


band_conv3d.defvjp(_bc_fwd, _bc_bwd)


def _stats_reference(x5, w):
    y = _conv_reference(x5, w)
    b, X, Y, Z, C = y.shape
    yf = y.astype(jnp.float32).reshape(b, X, Y, Z * C)
    return y, jnp.stack([jnp.sum(yf, axis=(0, 1, 2)),
                         jnp.sum(yf * yf, axis=(0, 1, 2))])


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def band_conv3d_stats(x5, w, use_pallas=True, interpret=False):
    """`band_conv3d` + per-lane BN statistics in the kernel epilogue:
    (B,X,Y,Z,Cin) -> ((B,X,Y,Z,Cout), (2, Z*Cout) f32 [Σ, Σ²] over
    B,X,Y). Reduce per-channel outside: `st.reshape(2, Z, C).sum(1)`.

    The split formulation (plain conv + XLA stats read) materializes an
    f32 TRANSPOSED copy of the conv output for the reduce (2.5
    ms/modality at 91³×64) and drags f32 full-resolution intermediates
    through the backward; in-kernel Σ/Σ² of the f32 accumulator costs
    two VMEM row reductions (~free) and keeps every tensor bf16. The
    backward fuses the stats-cotangent assembly (yhat = gy + a + b·y)
    into the banded dw prologue; dx assembles yhat once in bf16 and
    reuses the flipped-band forward kernel."""
    if not use_pallas:
        return _stats_reference(x5, w)
    return _band_conv_pallas(x5, w, interpret=auto_interpret(interpret),
                             stats=True)


def _bcs_fwd(x5, w, use_pallas, interpret):
    y, st = band_conv3d_stats(x5, w, use_pallas, interpret)
    return (y, st), (x5, w, y)


def _bcs_bwd(use_pallas, interpret, res, cot):
    x5, w, y = res
    gy, gst = cot
    Z, cout = y.shape[-2], y.shape[-1]
    a_l = gst[0]  # per-lane stats cotangents: d[Σ]=a, d[Σ²]=2y·gst[1]
    b_l = 2.0 * gst[1]
    if use_pallas:
        itp = auto_interpret(interpret)
        gyd = gy.astype(x5.dtype)
        dw = _band_dw_pallas(x5, gyd, w.shape[3], w.shape[4], interpret=itp,
                             y=y, ab=jnp.stack([a_l, b_l])).astype(w.dtype)
        # yhat stays in y.dtype END-TO-END (the stem bwd rule,
        # ops/stem.py::_ss_bwd): an f32 formulation makes XLA materialize
        # a transposed f32 copy of the full tensor (2 GB at full-res b8,
        # OOM-causing) — the per-lane a/b round to bf16 instead
        a2 = a_l.reshape(Z, cout).astype(x5.dtype)
        b2 = b_l.reshape(Z, cout).astype(x5.dtype)
        dx = _band_conv_pallas(gyd + a2 + y * b2,
                               _flip_w(w).astype(x5.dtype), interpret=itp)
    else:
        yhat = (gy.astype(y.dtype) +
                (a_l.reshape(Z, cout) + y.astype(jnp.float32)
                 * b_l.reshape(Z, cout)).astype(y.dtype))
        (dx,) = jax.linear_transpose(lambda xx: _conv_reference(xx, w), x5)(
            yhat.astype(x5.dtype))
        (dw,) = jax.linear_transpose(lambda ww: _conv_reference(x5, ww), w)(
            yhat.astype(w.dtype))
    return dx.astype(x5.dtype), reduce_ct(dw, w)


band_conv3d_stats.defvjp(_bcs_fwd, _bcs_bwd)
