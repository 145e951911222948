"""ADVIT baseline: depth-collapse convs + per-modality 2D ViT.

Behavioral spec from the reference (reference: models/ADVIT.py:7-63): per
modality a "to-2d" stack — Conv3d(1->32, k=(1,1,25)) + BN + ReLU +
MaxPool(1,1,2), Conv3d(32->1, k=(1,1,25)) + BN + ReLU + MaxPool(1,1,2) —
collapses the 79-slice depth to 1; the (128, 128) plane goes through a ViT
(image 128, patch 16, dim 192, depth 6, heads 3, mlp 768, dropout .1); the
two 2-way ViT outputs are concatenated into a Linear(4 -> 2)... the reference
concatenates the two ViT *class* outputs (each already num_classes=2 via the
ViT head? no — vit_pytorch ViT returns the head output of size num_classes).
Reference sets ViT num_classes=2 then fc = Linear(192*2, 2), implying it
relies on vit_pytorch returning the 192-dim latent; with a classification
head vit_pytorch returns (b, 2). The reference forward would then fail at
Linear(384, 2) — so the runnable interpretation (and the one used here) is a
ViT *encoder* that returns the 192-dim CLS latent, matching Linear(192*2, 2).

Since vit_pytorch is torch-only, the ViT is implemented natively: patchify ->
LayerNorm -> Linear -> LayerNorm, learned positional embedding + CLS token,
emb dropout, pre-LN Transformer (our fused-attention stack), CLS pooling.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from ..nn.attention import Transformer, _dense
from ..nn.blocks import ConvBNAct

Dtype = Any


class ViTEncoder(nn.Module):
    """2D ViT encoder returning the CLS latent (vit_pytorch-equivalent)."""

    image_size: int = 128
    patch_size: int = 16
    dim: int = 192
    depth: int = 6
    heads: int = 3
    mlp_dim: int = 768
    dropout: float = 0.1
    emb_dropout: float = 0.1
    channels: int = 1
    dtype: Optional[Dtype] = None
    precision: Optional[Any] = None
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, img, train: bool = False):
        # img: (B, H, W, C) channels-last
        b, h, w, c = img.shape
        p = self.patch_size
        gh, gw = h // p, w // p
        # b (gh p1) (gw p2) c -> b (gh gw) (p1 p2 c)
        x = img.reshape(b, gh, p, gw, p, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, gh * gw, p * p * c)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        x = _dense(self.dim, dtype=self.dtype, in_features=p * p * c,
                   precision=self.precision)(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)

        cls = self.param(
            "cls_token", nn.initializers.normal(0.02), (1, 1, self.dim)
        )
        x = jnp.concatenate([jnp.tile(cls, (b, 1, 1)).astype(x.dtype), x], axis=1)
        pos = self.param(
            "pos_embedding", nn.initializers.normal(0.02),
            (1, gh * gw + 1, self.dim),
        )
        x = x + pos.astype(x.dtype)
        x = nn.Dropout(self.emb_dropout, deterministic=not train)(x)

        dim_head = self.dim // self.heads
        x = Transformer(
            self.dim, self.depth, self.heads, dim_head, self.mlp_dim,
            self.dropout, dtype=self.dtype, precision=self.precision,
            use_pallas=self.use_pallas,
        )(x, train=train)
        return x[:, 0]  # CLS latent


class DepthCollapse(nn.Module):
    """The "to-2d" stack: two (1,1,25) VALID convs + (1,1,2) max-pools
    collapsing depth 79 -> 55 -> 27 -> 3 -> 1 (reference: models/ADVIT.py:10-29);
    output (B, H, W, 1)."""

    dtype: Optional[Dtype] = None
    precision: Optional[Any] = None
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False, bn_mask=None):
        kw = dict(act="relu", padding="VALID", dtype=self.dtype,
                  precision=self.precision, axis_name=self.axis_name)
        x = ConvBNAct(32, kernel=(1, 1, 25), **kw)(x, train, bn_mask)
        x = nn.max_pool(x, (1, 1, 2), strides=(1, 1, 2), padding="VALID")
        x = ConvBNAct(1, kernel=(1, 1, 25), **kw)(x, train, bn_mask)
        x = nn.max_pool(x, (1, 1, 2), strides=(1, 1, 2), padding="VALID")
        b, h, w, d, c = x.shape
        return x.reshape(b, h, w, d * c)


class ADVIT(nn.Module):
    """Dual-modality depth-collapse + ViT classifier (inputs padded to
    (128, 128, 79); reference: datasets/ADNI.py:117-132)."""

    dtype: Optional[Dtype] = None
    precision: Optional[Any] = None
    use_pallas: Optional[bool] = None
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, mri, pet, train: bool = False, bn_mask=None):
        kw = dict(dtype=self.dtype, precision=self.precision,
                  use_pallas=self.use_pallas)
        cd = dict(dtype=self.dtype, precision=self.precision,
                  axis_name=self.axis_name)
        mri2d = DepthCollapse(name="to_2d_mri", **cd)(mri, train, bn_mask)
        pet2d = DepthCollapse(name="to_2d_pet", **cd)(pet, train, bn_mask)
        mri_lat = ViTEncoder(name="vit_mri", **kw)(mri2d, train)
        pet_lat = ViTEncoder(name="vit_pet", **kw)(pet2d, train)
        fused = jnp.concatenate([mri_lat, pet_lat], axis=-1)
        return _dense(2, dtype=self.dtype, in_features=fused.shape[-1],
                      precision=self.precision, name="fc")(fused)
