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
from jax.scipy.ndimage import map_coordinates


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


def _affine_resample(vol, flip, angle, zoom, flip_axis):
    """One fused trilinear resample realizing flip -> rotate(axis0) -> zoom.

    Inverse mapping from output voxel coords to input coords:
    in = Flip(R(-angle) @ ((out - c) / zoom) + c). Border (clamp) padding,
    matching MONAI's rotate default padding_mode='border'.
    """
    shape = vol.shape
    c = jnp.array([(s - 1) / 2.0 for s in shape], dtype=jnp.float32)
    grids = jnp.meshgrid(
        *[jnp.arange(s, dtype=jnp.float32) for s in shape], indexing="ij"
    )
    out = jnp.stack(grids)  # (3, X, Y, Z)
    rel = (out - c[:, None, None, None]) / zoom
    # Rotation by -angle about axis 0 mixes axes 1 and 2.
    cos, sin = jnp.cos(-angle), jnp.sin(-angle)
    x = rel[0]
    y = cos * rel[1] - sin * rel[2]
    z = sin * rel[1] + cos * rel[2]
    coords = jnp.stack([x, y, z]) + c[:, None, None, None]
    # Fold the flip into the grid: mirror the sampling coordinate.
    size = shape[flip_axis] - 1
    flipped_axis = jnp.where(flip, size - coords[flip_axis], coords[flip_axis])
    coords = coords.at[flip_axis].set(flipped_axis)
    return map_coordinates(vol, list(coords), order=1, mode="nearest")


def augment(vols, key: jax.Array, cfg: AugmentConfig = AugmentConfig()):
    """Augment a dict/list of same-shaped volumes with one shared random draw.

    `vols`: pytree of (X, Y, Z) float arrays (e.g. {'MRI': ..., 'PET': ...}).
    """
    flip, angle, zoom = draw_params(key, cfg)
    identity = jnp.logical_and(
        jnp.logical_and(jnp.logical_not(flip), angle == 0.0), zoom == 1.0
    )

    def one(vol):
        # Skip the gather pass entirely when no augmentation triggered.
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
