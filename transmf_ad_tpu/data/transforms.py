"""Jittable 3D preprocessing and augmentation.

TPU-first re-design of the reference's MONAI transform pipelines
(reference: datasets/ADNI.py:59-132). The reference runs per-sample
CPU transforms inside the DataLoader; here augmentations are pure
functions of a `jax.random` key, vmapped over the batch and fused into
the jitted train step, so the TPU does the resampling.

Semantics match the driven reference pipeline:
 - ``scale_intensity``: min-max to [0, 1]                    (ScaleIntensityd)
 - random flip of spatial axis 0, p=0.3                      (RandFlipd)
 - random rotation about axis 0, angle ~ U(-.05, .05) rad,
   p=0.3, trilinear, border padding                          (RandRotated)
 - random zoom ~ U(0.95, 1.0), keep-size, p=0.3              (RandZoomd)

All three augmentations share one trilinear resample: flip is folded in
as a sign on the sampling grid and rotation/zoom compose into a single
affine, so the hot path is exactly one gather pass per volume. The same
random draw is applied to every modality in the sample, matching MONAI
dict-transform behavior.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class AugmentConfig:
    flip_prob: float = 0.3
    flip_axis: int = 0
    rotate_prob: float = 0.3
    rotate_range_x: float = 0.05  # radians, about spatial axis 0
    zoom_prob: float = 0.3
    min_zoom: float = 0.95
    max_zoom: float = 1.0


def scale_intensity(vol: jnp.ndarray) -> jnp.ndarray:
    """Min-max normalize one volume to [0, 1] (constant volumes -> 0)."""
    lo = jnp.min(vol)
    hi = jnp.max(vol)
    return jnp.where(hi > lo, (vol - lo) / (hi - lo), jnp.zeros_like(vol))


def draw_params(key: jax.Array, cfg: AugmentConfig):
    """Sample one set of augmentation parameters (shared across modalities)."""
    k_flip, k_fp, k_rot, k_rp, k_zoom, k_zp = jax.random.split(key, 6)
    do_flip = jax.random.uniform(k_fp) < cfg.flip_prob
    do_rot = jax.random.uniform(k_rp) < cfg.rotate_prob
    do_zoom = jax.random.uniform(k_zp) < cfg.zoom_prob
    angle = jnp.where(
        do_rot,
        jax.random.uniform(
            k_rot, minval=-cfg.rotate_range_x, maxval=cfg.rotate_range_x
        ),
        0.0,
    )
    zoom = jnp.where(
        do_zoom,
        jax.random.uniform(k_zoom, minval=cfg.min_zoom, maxval=cfg.max_zoom),
        1.0,
    )
    return do_flip, angle, zoom


def _interp_matrix(size: int, src: jnp.ndarray) -> jnp.ndarray:
    """Linear-interpolation matrix M (size_src, size_dst[, extra...]):
    out[dst] = sum_src M[src, dst] * in[src], border-clamped.

    `src` gives the (fractional) source coordinate of each destination
    index; trailing dims of `src` become trailing dims of M (per-slice
    matrices for shear passes)."""
    lo = jnp.clip(jnp.floor(src), 0, size - 1)
    w = jnp.clip(src - lo, 0.0, 1.0)
    hi = jnp.clip(lo + 1, 0, size - 1)
    rows = jnp.arange(size, dtype=jnp.float32)
    shape = (size,) + src.shape
    rows = rows.reshape((size,) + (1,) * src.ndim)
    m_lo = (rows == lo[None]) * (1.0 - w)[None]
    m_hi = (rows == hi[None]) * w[None]
    return (m_lo + m_hi).reshape(shape)


def _affine_resample(vol, flip, angle, zoom, flip_axis):
    """flip -> rotate(axis 0) -> zoom, as banded-matmul resampling passes.

    TPU-first: arbitrary-index gathers (map_coordinates) run ~9x slower
    than the whole model step on TPU, so the affine is decomposed into
    1D linear-interpolation matrix multiplies that ride the MXU:
    per-axis zooms (+x-flip folded into the x matrix) and the rotation
    about axis 0 as a Paeth 3-shear (Sy(-tan(a/2)) Sz(sin a) Sy(-tan(a/2))),
    each shear a per-slice banded matrix. Border-clamp semantics match
    MONAI's rotate padding_mode='border'; multi-pass linear interpolation
    is slightly smoother than one trilinear gather (augmentation-grade
    equivalence, exact for flip/identity).
    """
    X, Y, Z = vol.shape
    cx, cy, cz = (X - 1) / 2.0, (Y - 1) / 2.0, (Z - 1) / 2.0
    f32 = jnp.float32
    v = vol.astype(f32)

    # x pass: zoom + optional flip (src = mirror((dst-c)/zoom + c))
    dx = jnp.arange(X, dtype=f32)
    src_x = (dx - cx) / zoom + cx
    src_x = jnp.where(flip, (X - 1) - src_x, src_x)
    mx = _interp_matrix(X, src_x)  # (Xsrc, Xdst)
    v = jnp.einsum("xyz,xX->Xyz", v, mx)

    # y/z zoom passes
    dy = jnp.arange(Y, dtype=f32)
    my = _interp_matrix(Y, (dy - cy) / zoom + cy)
    v = jnp.einsum("xyz,yY->xYz", v, my)
    dz = jnp.arange(Z, dtype=f32)
    mz = _interp_matrix(Z, (dz - cz) / zoom + cz)
    v = jnp.einsum("xyz,zZ->xyZ", v, mz)

    # rotation about axis 0 via 3 shears in the (y, z) plane
    a = -jnp.tan(angle / 2.0)
    b = jnp.sin(angle)
    zrel = jnp.arange(Z, dtype=f32) - cz
    yrel = jnp.arange(Y, dtype=f32) - cy

    def shear_y(v, coef):
        # src_y = y - coef*(z - cz): per-z banded matrix (Ysrc, Ydst, Z)
        src = dy[:, None] - coef * zrel[None, :]
        m = _interp_matrix(Y, src)
        return jnp.einsum("xyz,yYz->xYz", v, m)

    def shear_z(v, coef):
        src = dz[None, :] - coef * yrel[:, None]  # (Y, Zdst)
        m = _interp_matrix(Z, jnp.transpose(src))  # (Zsrc, Zdst? ...)
        # _interp_matrix wants src shaped (Zdst, Y) -> M (Zsrc, Zdst, Y)
        return jnp.einsum("xyz,zZy->xyZ", v, m)

    v = shear_y(v, a)
    v = shear_z(v, b)
    v = shear_y(v, a)
    return v.astype(vol.dtype)


def augment(vols, key: jax.Array, cfg: AugmentConfig = AugmentConfig()):
    """Augment a dict/list of same-shaped volumes with one shared random draw.

    `vols`: pytree of (X, Y, Z) float arrays (e.g. {'MRI': ..., 'PET': ...}).
    """
    flip, angle, zoom = draw_params(key, cfg)
    identity = jnp.logical_and(
        jnp.logical_and(jnp.logical_not(flip), angle == 0.0), zoom == 1.0
    )

    def one(vol):
        # Identity short-circuit. Real branch skipping only happens when
        # called unbatched; under vmap (augment_batch) lax.cond lowers to a
        # select, so both branches execute — the identity path there only
        # buys exactness (no resample rounding), not time (~1 ms/step).
        return jax.lax.cond(
            identity,
            lambda v: v,
            lambda v: _affine_resample(v, flip, angle, zoom, cfg.flip_axis),
            vol,
        )

    return jax.tree_util.tree_map(one, vols)


@partial(jax.jit, static_argnames=("cfg",))
def augment_batch(batch, keys: jax.Array, cfg: AugmentConfig = AugmentConfig()):
    """vmap of `augment` over the leading batch axis; `keys`: (B,) PRNG keys."""
    return jax.vmap(lambda v, k: augment(v, k, cfg))(batch, keys)


def spatial_pad(vol, target_shape):
    """Center-pad (numpy or jnp) volume to `target_shape` with zeros.

    Matches MONAI SpatialPadd (reference: datasets/ADNI.py:93,122): symmetric
    padding, extra voxel on the trailing side when the difference is odd.
    Never crops (target dims smaller than the volume are left unchanged).
    """
    import numpy as np

    pads = []
    for s, t in zip(vol.shape, target_shape):
        d = max(t - s, 0)
        pads.append((d // 2, d - d // 2))
    if all(p == (0, 0) for p in pads):
        return vol
    xp = jnp if isinstance(vol, jnp.ndarray) else np
    return xp.pad(vol, pads)
