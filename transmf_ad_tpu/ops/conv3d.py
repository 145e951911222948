"""Pallas 3x3x3 SAME stride-1 3D convolution for NDHWC feature maps.

XLA's TPU lowering of the sNet body convs (reference: models/networks.py:
27-53) plateaus at 8-18 TF/s (5-10% of peak). This kernel streams a 3-row
input slab (with halo) from HBM into VMEM per output x-plane and turns the
conv into MXU matmuls:

 - Cin < 128 (stages 2-3): im2col in VMEM per dx-slab. The 9 (dy, dz)
   shifted (Y, Zo, Cin) blocks pack into a (Y*Zo, 9*Cin) patch matrix (the
   Z axis is padded to a multiple of 8 so the (Y, Zo) -> Y*Zo sublane merge
   is layout-free), and three such dots (one per dx) accumulate in f32.
   K = 9*Cin fills the MXU contraction.
 - Cin >= 128 (stage 4): 27 accumulated dots with K = Cin directly — no
   patch packing needed since K already fills the lanes.

The three halo rows arrive as three single-x-row BlockSpec inputs of the
same padded array (block index maps i, i+1, i+2), so VMEM holds only
~6 row-planes regardless of volume size and Pallas pipelines the copies;
the kernel scales to full-resolution volumes. The kernel is linear (no bias):
bias/BN/activation stay in XLA where they fuse into the consumer and
train-mode BatchNorm stays exact.

Backward: dL/dx is the same conv with the spatially-flipped, io-transposed
filter — it reuses THIS kernel, fixing the backward conv too. dL/dw lowers
to XLA's native conv-grad-weights via `jax.linear_transpose` (contraction
over the huge voxel axis — already MXU-bound).

Falls back to `conv_general_dilated` off-TPU, for non-3x3x3/stride/SAME
shapes, or when a slab would not fit in VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 12 * 1024 * 1024


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


def _conv_kernel_im2col(x0_ref, x1_ref, x2_ref, w_ref, o_ref, lhs_ref,
                        acc_ref, *, Y, Zo, Cin):
    acc_ref[...] = jnp.zeros_like(acc_ref)
    for dx, x_ref in enumerate((x0_ref, x1_ref, x2_ref)):
        for dy in range(3):
            for dz in range(3):
                t = dy * 3 + dz
                blk = x_ref[0, 0, dy : dy + Y, dz : dz + Zo, :]
                lhs_ref[:, t * Cin : (t + 1) * Cin] = blk.reshape(Y * Zo, Cin)
        acc_ref[...] += jax.lax.dot_general(
            lhs_ref[...], w_ref[dx], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    o_ref[0, 0] = acc_ref[...].reshape(Y, Zo, -1).astype(o_ref.dtype)


def _conv_kernel_tapdot(x0_ref, x1_ref, x2_ref, w_ref, o_ref, acc_ref,
                        *, Y, Zo, Cin):
    acc_ref[...] = jnp.zeros_like(acc_ref)
    for dx, x_ref in enumerate((x0_ref, x1_ref, x2_ref)):
        for dy in range(3):
            for dz in range(3):
                t = (dx * 3 + dy) * 3 + dz
                blk = x_ref[0, 0, dy : dy + Y, dz : dz + Zo, :]
                acc_ref[...] += jax.lax.dot_general(
                    blk.reshape(Y * Zo, Cin), w_ref[t],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
    o_ref[0, 0] = acc_ref[...].reshape(Y, Zo, -1).astype(o_ref.dtype)


def _conv_pallas(x, w, interpret=False):
    b, X, Y, Z, Cin = x.shape
    Cout = w.shape[-1]
    Zo = _round_up(Z, 8)
    Zp = Zo + 8  # >= Z + 2, keeps all tap slices in bounds
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, Zp - Z - 1), (0, 0)))
    w_flat = w.reshape(27, Cin, Cout).astype(x.dtype)

    acc = pltpu.VMEM((Y * Zo, Cout), jnp.float32)
    if Cin < 128:
        kernel = functools.partial(_conv_kernel_im2col, Y=Y, Zo=Zo, Cin=Cin)
        w_arg = w_flat.reshape(3, 9 * Cin, Cout)
        scratch = [pltpu.VMEM((Y * Zo, 9 * Cin), x.dtype), acc]
    else:
        kernel = functools.partial(_conv_kernel_tapdot, Y=Y, Zo=Zo, Cin=Cin)
        w_arg = w_flat
        scratch = [acc]

    def row_spec(off):
        return pl.BlockSpec((1, 1, Y + 2, Zp, Cin),
                            lambda bi, i: (bi, i + off, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, X, Y, Zo, Cout), x.dtype),
        grid=(b, X),
        in_specs=[
            row_spec(0), row_spec(1), row_spec(2),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, Y, Zo, Cout),
                               lambda bi, i: (bi, i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
        interpret=interpret,
    )(xp, xp, xp, w_arg)
    return out[:, :, :, :Z, :]


def _conv_reference(x, w, precision=None):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"), precision=precision,
    )


def _fits_vmem(x, w) -> bool:
    b, X, Y, Z, Cin = x.shape
    Cout = w.shape[-1]
    Zo = _round_up(Z, 8)
    Zp = Zo + 8
    esize = x.dtype.itemsize
    lanes = 128
    slab = 6 * (Y + 2) * Zp * max(_round_up(Cin, lanes), lanes) * esize
    lhs = Y * Zo * 9 * Cin * esize if Cin < 128 else 0
    acc = Y * Zo * max(_round_up(Cout, lanes), lanes) * 4
    out = Y * Zo * max(_round_up(Cout, lanes), lanes) * esize * 2  # dbl buf
    return slab + lhs + acc + out <= _VMEM_BUDGET


def _eligible(x, w) -> bool:
    return (
        x.ndim == 5
        and w.shape[:3] == (3, 3, 3)
        and x.shape[-1] == w.shape[3]
        and _fits_vmem(x, w)
    )


def _profitable(x, w) -> bool:
    """Measured-on-v5e policy. Standalone the kernel beats XLA's conv on
    expanding convs (64->128 and 128->256: ~1.5x), but inside the full
    train step the win is erased by lost producer/consumer fusion around
    the opaque pallas call (bias/BN/pool get their own HBM passes):
    full-step A/B measured -3%. Auto mode therefore keeps XLA for body
    convs; the kernel stays available via use_pallas=True and for future
    fused-epilogue variants (see docs/PERFORMANCE.md)."""
    del x, w
    return False


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv3d_3x3(x, w, use_pallas=None, interpret=False):
    """3x3x3 SAME stride-1 conv, (B,X,Y,Z,Cin) x (3,3,3,Cin,Cout) -> NDHWC.

    use_pallas: None auto-selects (TPU + eligible shape); the fallback is
    XLA's conv. Linear — add bias outside.
    """
    use = use_pallas
    if use is None:  # auto: TPU + structurally eligible + measured faster
        use = jax.default_backend() == "tpu" and _profitable(x, w)
    if not use or not _eligible(x, w):
        return _conv_reference(x, w)
    return _conv_pallas(x, w, interpret=interpret)


def _fwd(x, w, use_pallas, interpret):
    return conv3d_3x3(x, w, use_pallas, interpret), (x, w)


def _bwd(use_pallas, interpret, res, g):
    x, w = res
    # dx: conv of g with the spatially flipped, io-swapped filter — the
    # same stencil, so it routes through the same Pallas kernel.
    w_flip = jnp.flip(w, axis=(0, 1, 2)).transpose(0, 1, 2, 4, 3)
    dx = conv3d_3x3(g.astype(x.dtype), w_flip.astype(x.dtype),
                    use_pallas, interpret)
    (dw,) = jax.linear_transpose(lambda ww: _conv_reference(x, ww), w)(
        g.astype(w.dtype))
    return dx, dw


conv3d_3x3.defvjp(_fwd, _bwd)
