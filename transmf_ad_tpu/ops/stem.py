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

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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
        out_shape=jax.ShapeDtypeStruct((b, X, Y, Z * C), x.dtype),
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
    return _stem_pallas(x, w, interpret=interpret)


def _stem_fwd(x, w, use_pallas, interpret):
    return stem_conv(x, w, use_pallas, interpret), (x, w)


def _stem_bwd(use_pallas, interpret, res, g):
    x, w = res
    (dx,) = jax.linear_transpose(lambda xx: _conv_reference(xx, w), x)(
        g.astype(x.dtype))
    (dw,) = jax.linear_transpose(lambda ww: _conv_reference(x, ww), w)(
        g.astype(w.dtype))
    return dx, dw


stem_conv.defvjp(_stem_fwd, _stem_bwd)
