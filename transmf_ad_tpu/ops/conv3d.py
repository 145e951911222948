"""Pallas 3x3x3 SAME stride-1 3D convolution for NDHWC feature maps.

XLA's TPU lowering of the sNet body convs (reference: models/networks.py:
27-53) plateaus at 8-18 TF/s (5-10% of peak). This kernel keeps a volume's
padded activations resident in VMEM and turns the conv into MXU matmuls,
one output x-plane per grid step:

 - Cin < 128 (stages 2-3): im2col in VMEM. The 27 (dx, dy, dz)-shifted
   (Y, Zo, Cin) blocks are packed into a (Y*Zo, 27*Cin) patch matrix (the
   Z axis is padded to a multiple of 8 so the (Y, Zo) -> Y*Zo sublane
   merge is layout-free), then one dot against the (27*Cin, Cout)
   flattened filter. K = 27*Cin fills the MXU contraction.
 - Cin >= 128 (stage 4): 27 accumulated dots with K = Cin directly — no
   patch packing needed since K already fills the lanes.

The kernel is linear (no bias): bias/BN/activation stay in XLA where they
fuse into the consumer and train-mode BatchNorm stays exact.

Backward: dL/dx is the same conv with the spatially-flipped,
io-transposed filter — it reuses THIS kernel, so the backward conv
(which in XLA hits the same slow path) is fixed too. dL/dw lowers to
XLA's native conv-grad-weights via `jax.linear_transpose` (its contraction
is over the huge voxel axis — already MXU-bound).

Falls back to `conv_general_dilated` off-TPU, for non-3x3x3/stride/SAME
shapes, or when the padded volume would not fit in VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Leave room for patches/acc/output alongside the cached volume.
_VMEM_VOLUME_BUDGET = 10 * 1024 * 1024


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


def _conv_kernel_im2col(x_ref, w_ref, o_ref, lhs_ref, *, Y, Zo, Cin):
    i = pl.program_id(1)
    for dx in range(3):
        for dy in range(3):
            for dz in range(3):
                t = (dx * 3 + dy) * 3 + dz
                blk = x_ref[0, i + dx, dy : dy + Y, dz : dz + Zo, :]
                lhs_ref[:, t * Cin : (t + 1) * Cin] = blk.reshape(Y * Zo, Cin)
    acc = jax.lax.dot_general(
        lhs_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0, 0] = acc.reshape(Y, Zo, -1).astype(o_ref.dtype)


def _conv_kernel_tapdot(x_ref, w_ref, o_ref, acc_ref, *, Y, Zo, Cin):
    i = pl.program_id(1)
    acc_ref[...] = jnp.zeros_like(acc_ref)
    for dx in range(3):
        for dy in range(3):
            for dz in range(3):
                t = (dx * 3 + dy) * 3 + dz
                blk = x_ref[0, i + dx, dy : dy + Y, dz : dz + Zo, :]
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

    if Cin < 128:
        kernel = functools.partial(_conv_kernel_im2col, Y=Y, Zo=Zo, Cin=Cin)
        w_arg = w_flat.reshape(27 * Cin, Cout)
        scratch = [pltpu.VMEM((Y * Zo, 27 * Cin), x.dtype)]
    else:
        kernel = functools.partial(_conv_kernel_tapdot, Y=Y, Zo=Zo, Cin=Cin)
        w_arg = w_flat
        scratch = [pltpu.VMEM((Y * Zo, Cout), jnp.float32)]

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, X, Y, Zo, Cout), x.dtype),
        grid=(b, X),
        in_specs=[
            pl.BlockSpec((1, X + 2, Y + 2, Zp, Cin),
                         lambda bi, i: (bi, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, Y, Zo, Cout),
                               lambda bi, i: (bi, i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
        interpret=interpret,
    )(xp, w_arg)
    return out[:, :, :, :Z, :]


def _conv_reference(x, w, precision=None):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"), precision=precision,
    )


def _fits_vmem(x) -> bool:
    b, X, Y, Z, Cin = x.shape
    Zp = _round_up(Z, 8) + 8
    bytes_ = (X + 2) * (Y + 2) * Zp * max(Cin, 8) * x.dtype.itemsize
    return bytes_ <= _VMEM_VOLUME_BUDGET


def _eligible(x, w) -> bool:
    return (
        x.ndim == 5
        and w.shape[:3] == (3, 3, 3)
        and x.shape[-1] == w.shape[3]
        and _fits_vmem(x)
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv3d_3x3(x, w, use_pallas=None, interpret=False):
    """3x3x3 SAME stride-1 conv, (B,X,Y,Z,Cin) x (3,3,3,Cin,Cout) -> NDHWC.

    use_pallas: None auto-selects (TPU + eligible shape); the fallback is
    XLA's conv. Linear — add bias outside.
    """
    use = use_pallas
    if use is None:
        use = jax.default_backend() == "tpu"
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
