"""MiSePyNet/Mnet baseline: slice-wise multi-view CNN.

Behavioral spec from the reference (reference: models/MiSePyNet.py): per
modality, three anatomical views (axial / coronal / sagittal permutations);
each view goes through a slice CNN — three parallel branches collapsing the
last spatial axis with VALID convs of kernel (1,1,L), (1,1,ceil(L/2)) x2,
(1,1,ceil(L/3)) x3, 8 channels each — then a spatial CNN. The reference's
spatial_cnn defines three conv stacks but its forward applies conv1 to all
three branch outputs and sums (reference: MiSePyNet.py:89-94); conv2/conv3
are dead parameters (and their pool configs would not even execute in torch:
MaxPool3d(kernel=(2,2,1), padding=1) pads the size-1 depth beyond kernel/2).
This rebuild reproduces the *driven* path: shared conv1 stack applied to all
three branches, summed. Inputs are padded to (91, 109, 91)
(reference: datasets/ADNI.py:87-115).

Per-modality feature: axial 128 + coronal 64 + sagittal 128 = 320; Mnet
concatenates both modalities (640) into an MLP 512 -> 64 -> 2 with BN and
Dropout(0.5) (reference: MiSePyNet.py:139-163).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from ..nn.attention import _dense
from ..nn.batchnorm import BatchNormMasked
from ..nn.blocks import ConvBNAct

Dtype = Any


class SliceCNN(nn.Module):
    """Three parallel branches collapsing the last spatial axis to size 1."""

    length: int  # size of the collapsed axis
    dtype: Optional[Dtype] = None
    precision: Optional[Any] = None
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False, bn_mask=None):
        kw = dict(act="relu", padding="VALID", dtype=self.dtype,
                  precision=self.precision, axis_name=self.axis_name)
        L = self.length
        b1 = ConvBNAct(8, kernel=(1, 1, L), **kw)(x, train, bn_mask)
        k2 = (L + 1) // 2
        b2 = ConvBNAct(8, kernel=(1, 1, k2), **kw)(x, train, bn_mask)
        b2 = ConvBNAct(8, kernel=(1, 1, k2), **kw)(b2, train, bn_mask)
        k3 = (L + 2) // 3
        b3 = ConvBNAct(8, kernel=(1, 1, k3), **kw)(x, train, bn_mask)
        b3 = ConvBNAct(8, kernel=(1, 1, k3), **kw)(b3, train, bn_mask)
        b3 = ConvBNAct(8, kernel=(1, 1, k3), **kw)(b3, train, bn_mask)
        return b1, b2, b3


class SpatialCNN(nn.Module):
    """The driven spatial stack (reference conv1): Conv(11,11,1)/s(2,2,2) ->
    MaxPool(3,3,1) -> Conv(11,11,1) -> MaxPool(3,3,1) -> Conv(1,1,1);
    applied to each slice branch (shared weights, like the reference's
    conv1 reuse) and summed. `kernel`/`pool` default to the reference
    geometry, sized for (91,109)-plane inputs; smaller planes can pass
    reduced values (tests use kernel=3, pool=2)."""

    kernel: int = 11
    pool: int = 3
    dtype: Optional[Dtype] = None
    precision: Optional[Any] = None
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, s1, s2, s3, train: bool = False, bn_mask=None):
        stack = _StridedStack(kernel=self.kernel, pool=self.pool,
                              dtype=self.dtype, precision=self.precision,
                              axis_name=self.axis_name)
        return (stack(s1, train, bn_mask) + stack(s2, train, bn_mask)
                + stack(s3, train, bn_mask))


class _StridedStack(nn.Module):
    kernel: int = 11
    pool: int = 3
    dtype: Optional[Dtype] = None
    precision: Optional[Any] = None
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False, bn_mask=None):
        kw = dict(act="relu", padding="VALID", dtype=self.dtype,
                  precision=self.precision, axis_name=self.axis_name)
        k, p = self.kernel, self.pool
        x = ConvBNAct(16, kernel=(k, k, 1), strides=(2, 2, 2), **kw)(
            x, train, bn_mask)
        x = nn.max_pool(x, (p, p, 1), strides=(p, p, 1), padding="VALID")
        x = ConvBNAct(32, kernel=(k, k, 1), **kw)(x, train, bn_mask)
        x = nn.max_pool(x, (p, p, 1), strides=(p, p, 1), padding="VALID")
        x = ConvBNAct(64, kernel=(1, 1, 1), **kw)(x, train, bn_mask)
        return x


class MiSePyNet(nn.Module):
    """Three-view slice+spatial encoder -> flattened per-modality feature
    (320-dim at the reference geometry). Slice-collapse lengths derive
    from the input shape, so reduced geometries compile directly."""

    spatial_kernel: int = 11
    spatial_pool: int = 3
    dtype: Optional[Dtype] = None
    precision: Optional[Any] = None
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, img, train: bool = False, bn_mask=None):
        # img: (B, X, Y, Z, 1) channels-last; reference geometry (91,109,91)
        kw = dict(dtype=self.dtype, precision=self.precision,
                  axis_name=self.axis_name)
        views = {
            "axial": img,
            # torch permute(0,1,2,4,3): swap last two spatial dims
            "col": img.transpose(0, 1, 3, 2, 4),
            # torch permute(0,1,4,3,2): reverse spatial order
            "sag": img.transpose(0, 3, 2, 1, 4),
        }
        feats = []
        for name, view in views.items():
            length = view.shape[3]  # the collapsed (last spatial) axis
            s1, s2, s3 = SliceCNN(length, name=f"slice_{name}", **kw)(
                view, train, bn_mask)
            out = SpatialCNN(kernel=self.spatial_kernel, pool=self.spatial_pool,
                             name=f"spatial_{name}", **kw)(
                s1, s2, s3, train, bn_mask)
            # flatten channel-major like torch .view on NCDHW, so the fc
            # weights map 1:1 to the reference's (MiSePyNet.py:131-133)
            out = out.transpose(0, 4, 1, 2, 3)
            feats.append(out.reshape(out.shape[0], -1))
        return jnp.concatenate(feats, axis=-1)


class Mnet(nn.Module):
    """Dual-modality MiSePyNet + MLP classifier (reference: MiSePyNet.py:139-163)."""

    spatial_kernel: int = 11
    spatial_pool: int = 3
    dtype: Optional[Dtype] = None
    precision: Optional[Any] = None
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, mri, pet, train: bool = False, bn_mask=None):
        kw = dict(spatial_kernel=self.spatial_kernel,
                  spatial_pool=self.spatial_pool,
                  dtype=self.dtype, precision=self.precision,
                  axis_name=self.axis_name)
        mri_feat = MiSePyNet(name="mri", **kw)(mri, train, bn_mask)
        pet_feat = MiSePyNet(name="pet", **kw)(pet, train, bn_mask)
        x = jnp.concatenate([mri_feat, pet_feat], axis=-1)
        fan_in = x.shape[-1]
        for i, w in enumerate((512, 64)):
            x = _dense(w, dtype=self.dtype, in_features=fan_in,
                       precision=self.precision)(x)
            x = BatchNormMasked(momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                                axis_name=self.axis_name,
                                name=f"BatchNorm_{i}")(
                x, train=train, mask=bn_mask)
            x = nn.relu(x)
            x = nn.Dropout(0.5, deterministic=not train)(x)
            fan_in = w
        return _dense(2, dtype=self.dtype, in_features=fan_in,
                      precision=self.precision)(x)
