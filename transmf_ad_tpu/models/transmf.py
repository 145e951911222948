"""TransMF task models (single-modality CNN .. adversarial cross-modal fusion).

Behavioral spec from the reference model zoo (reference: models/mymodel.py):
  - ModelSingle           <- model_single            (mymodel.py:13-37)
  - ModelCNN              <- model_CNN               (mymodel.py:40-66)
  - ModelTransformer      <- model_transformer       (mymodel.py:69-98)
  - ModelTransformerRes   <- model_transformer_res   (mymodel.py:101-141)
  - ModelCNNAd            <- model_CNN_ad            (mymodel.py:144-179)
  - ModelAd               <- model_ad                (mymodel.py:182-222), the
    paper model: dual sNets, GRL(alpha=2) discriminator branch on pooled
    features, cross-modal fusion + 4*dim pooling head -> 2-way logits.

All volumes are channels-last (B, X, Y, Z, 1). Adversarial models return
(logits, D_MRI_logits, D_PET_logits).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from ..nn.attention import CrossTransformer, CrossTransformerModAvg, _dense
from ..nn.batchnorm import BatchNormMasked
from ..nn.blocks import SNet, global_avg_pool, tokens_from_volume
from ..nn.grl import revgrad


def _snet_cls(use_remat: bool):
    """SNet with per-block rematerialization when requested: trades conv
    recompute for activation memory (enables larger per-chip batches /
    full-resolution volumes). Block-level granularity matters: rematting
    the whole encoder would re-materialize every stage at once in the
    backward and save no peak memory."""
    import functools

    if use_remat:
        return functools.partial(SNet, remat=True)
    return SNet

Dtype = Any


class _MLPHead(nn.Module):
    """Linear->ReLU->Linear classifier head (reference: mymodel.py:20,50,150)."""

    hidden: int
    out: int = 2
    in_features: Optional[int] = None
    dtype: Optional[Dtype] = None
    precision: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        x = _dense(self.hidden, dtype=self.dtype, in_features=self.in_features,
                   precision=self.precision)(x)
        x = nn.relu(x)
        return _dense(self.out, dtype=self.dtype, in_features=self.hidden,
                      precision=self.precision)(x)


class _FusionHead(nn.Module):
    """Linear->BN->ReLU->Drop(.5) x2 -> Linear(64, 2) classifier over the
    fused 4*dim token-pool vector (reference: mymodel.py:190-192)."""

    in_features: int
    dtype: Optional[Dtype] = None
    precision: Optional[Any] = None
    use_batchnorm: bool = True
    axis_name: Optional[str] = None  # cross-device BN stats under shard_map
    drop_rate: float = 0.5  # reference hardcodes 0.5 (mymodel.py:190-192)

    @nn.compact
    def __call__(self, x, train: bool = False, bn_mask=None):
        widths = (512, 64)
        fan_in = self.in_features
        for i, w in enumerate(widths):
            x = _dense(w, dtype=self.dtype, in_features=fan_in,
                       precision=self.precision)(x)
            if self.use_batchnorm:
                # nn.BatchNorm-compatible tree (name included) + optional
                # per-sample mask-weighted moments for padded batches
                x = BatchNormMasked(momentum=0.9, epsilon=1e-5,
                                    dtype=self.dtype,
                                    axis_name=self.axis_name,
                                    name=f"BatchNorm_{i}")(
                    x, train=train, mask=bn_mask)
            x = nn.relu(x)
            x = nn.Dropout(self.drop_rate, deterministic=not train)(x)
            fan_in = w
        return _dense(2, dtype=self.dtype, in_features=fan_in,
                      precision=self.precision)(x)


class _Discriminator(nn.Module):
    """Modality discriminator D: dim->128->BN->ReLU->2
    (reference: mymodel.py:152,194)."""

    dtype: Optional[Dtype] = None
    precision: Optional[Any] = None
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False, bn_mask=None):
        x = _dense(128, dtype=self.dtype, in_features=x.shape[-1],
                   precision=self.precision)(x)
        x = BatchNormMasked(momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                            axis_name=self.axis_name,
                            name="BatchNorm_0")(x, train=train, mask=bn_mask)
        x = nn.relu(x)
        return _dense(2, dtype=self.dtype, in_features=128,
                      precision=self.precision)(x)


class ModelSingle(nn.Module):
    """Single-modality classifier: sNet -> GAP -> MLP dim->64->2."""

    dim: int = 128
    dtype: Optional[Dtype] = None
    precision: Optional[Any] = None
    use_pallas: Optional[bool] = None
    remat: bool = False
    axis_name: Optional[str] = None  # data-shard axis for cross-device BN

    @nn.compact
    def __call__(self, img, train: bool = False, bn_mask=None):
        feat = _snet_cls(self.remat)(
            self.dim, dtype=self.dtype, precision=self.precision,
            use_pallas=self.use_pallas, axis_name=self.axis_name,
            name="cnn")(img, train, bn_mask)
        vec = global_avg_pool(feat)
        return _MLPHead(64, in_features=self.dim, dtype=self.dtype,
                        precision=self.precision, name="fc")(vec)


class ModelCNN(nn.Module):
    """Dual-branch CNN late fusion: two sNets -> GAP -> concat -> MLP."""

    dim: int = 128
    dtype: Optional[Dtype] = None
    precision: Optional[Any] = None
    use_pallas: Optional[bool] = None
    remat: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, mri, pet, train: bool = False, bn_mask=None):
        kw = dict(dtype=self.dtype, precision=self.precision)
        snet = _snet_cls(self.remat)
        skw = dict(use_pallas=self.use_pallas, axis_name=self.axis_name, **kw)
        mri_vec = global_avg_pool(
            snet(self.dim, name="mri_cnn", **skw)(mri, train, bn_mask))
        pet_vec = global_avg_pool(
            snet(self.dim, name="pet_cnn", **skw)(pet, train, bn_mask))
        fused = jnp.concatenate([mri_vec, pet_vec], axis=-1)
        return _MLPHead(128, in_features=2 * self.dim, name="fc", **kw)(fused)


class ModelTransformer(nn.Module):
    """Cross-modal transformer fusion without the adversarial branch."""

    dim: int = 128
    depth: int = 3
    heads: int = 4
    dim_head: int = 32
    mlp_dim: int = 512
    dropout: float = 0.0
    dtype: Optional[Dtype] = None
    precision: Optional[Any] = None
    use_pallas: Optional[bool] = None
    remat: bool = False
    axis_name: Optional[str] = None
    head_dropout: float = 0.5  # library extra; reference hardcodes 0.5

    @nn.compact
    def __call__(self, mri, pet, train: bool = False, bn_mask=None):
        kw = dict(dtype=self.dtype, precision=self.precision)
        snet = _snet_cls(self.remat)
        skw = dict(use_pallas=self.use_pallas, axis_name=self.axis_name, **kw)
        mri_tok = tokens_from_volume(
            snet(self.dim, name="mri_cnn", **skw)(mri, train, bn_mask))
        pet_tok = tokens_from_volume(
            snet(self.dim, name="pet_cnn", **skw)(pet, train, bn_mask))
        fused = CrossTransformerModAvg(
            self.dim, self.depth, self.heads, self.dim_head, self.mlp_dim,
            self.dropout, use_pallas=self.use_pallas, name="fuse_transformer", **kw
        )(mri_tok, pet_tok, train)
        return _FusionHead(4 * self.dim, axis_name=self.axis_name,
                           drop_rate=self.head_dropout,
                           name="fc_cls", **kw)(fused, train, bn_mask)


class ModelTransformerRes(nn.Module):
    """CrossTransformer fusion + outer residual + GAP-only head (no BN)."""

    dim: int = 128
    depth: int = 3
    heads: int = 4
    dim_head: int = 32
    mlp_dim: int = 512
    dropout: float = 0.0
    dtype: Optional[Dtype] = None
    precision: Optional[Any] = None
    use_pallas: Optional[bool] = None
    remat: bool = False
    axis_name: Optional[str] = None
    head_dropout: float = 0.5  # library extra; reference hardcodes 0.5

    @nn.compact
    def __call__(self, mri, pet, train: bool = False, bn_mask=None):
        kw = dict(dtype=self.dtype, precision=self.precision)
        snet = _snet_cls(self.remat)
        skw = dict(use_pallas=self.use_pallas, axis_name=self.axis_name, **kw)
        mri_tok = tokens_from_volume(
            snet(self.dim, name="mri_cnn", **skw)(mri, train, bn_mask))
        pet_tok = tokens_from_volume(
            snet(self.dim, name="pet_cnn", **skw)(pet, train, bn_mask))
        mri_f, pet_f = CrossTransformer(
            self.dim, self.depth, self.heads, self.dim_head, self.mlp_dim,
            self.dropout, use_pallas=self.use_pallas, name="fuse_transformer", **kw
        )(mri_tok, pet_tok, train)
        mri_f = mri_f + mri_tok
        pet_f = pet_f + pet_tok
        pooled = jnp.concatenate(
            [jnp.mean(mri_f, axis=1), jnp.mean(pet_f, axis=1)], axis=-1
        )
        return _FusionHead(2 * self.dim, use_batchnorm=False,
                           drop_rate=self.head_dropout, name="fc_cls",
                           **kw)(pooled, train, bn_mask)


class ModelCNNAd(nn.Module):
    """Dual CNN + gradient-reversal discriminator branch (no fusion).

    Returns (logits, D_MRI_logits, D_PET_logits); the discriminator sees
    GRL(alpha=2)-reversed pooled features, shared across modalities
    (reference: mymodel.py:162-179)."""

    dim: int = 128
    grl_alpha: float = 2.0
    dtype: Optional[Dtype] = None
    precision: Optional[Any] = None
    use_pallas: Optional[bool] = None
    remat: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, mri, pet, train: bool = False, bn_mask=None):
        kw = dict(dtype=self.dtype, precision=self.precision)
        snet = _snet_cls(self.remat)
        skw = dict(use_pallas=self.use_pallas, axis_name=self.axis_name, **kw)
        mri_vec = global_avg_pool(
            snet(self.dim, name="mri_cnn", **skw)(mri, train, bn_mask))
        pet_vec = global_avg_pool(
            snet(self.dim, name="pet_cnn", **skw)(pet, train, bn_mask))

        disc = _Discriminator(axis_name=self.axis_name, name="D", **kw)
        d_mri = disc(revgrad(mri_vec, self.grl_alpha), train, bn_mask)
        d_pet = disc(revgrad(pet_vec, self.grl_alpha), train, bn_mask)

        fused = jnp.concatenate([mri_vec, pet_vec], axis=-1)
        logits = _MLPHead(128, in_features=2 * self.dim, name="fc_cls", **kw)(fused)
        return logits, d_mri, d_pet


class ModelAd(nn.Module):
    """The paper model: dual sNets, GRL discriminator branch, cross-modal
    transformer fusion, 4*dim pooling head (reference: mymodel.py:182-222)."""

    dim: int = 128
    depth: int = 3
    heads: int = 4
    dim_head: int = 32
    mlp_dim: int = 512
    dropout: float = 0.0
    grl_alpha: float = 2.0
    dtype: Optional[Dtype] = None
    precision: Optional[Any] = None
    use_pallas: Optional[bool] = None
    remat: bool = False
    axis_name: Optional[str] = None
    head_dropout: float = 0.5  # library extra; reference hardcodes 0.5

    @nn.compact
    def __call__(self, mri, pet, train: bool = False, bn_mask=None):
        kw = dict(dtype=self.dtype, precision=self.precision)
        snet = _snet_cls(self.remat)
        skw = dict(use_pallas=self.use_pallas, axis_name=self.axis_name, **kw)
        mri_feat = snet(self.dim, name="mri_cnn", **skw)(mri, train, bn_mask)
        pet_feat = snet(self.dim, name="pet_cnn", **skw)(pet, train, bn_mask)

        disc = _Discriminator(axis_name=self.axis_name, name="D", **kw)
        d_mri = disc(revgrad(global_avg_pool(mri_feat), self.grl_alpha),
                     train, bn_mask)
        d_pet = disc(revgrad(global_avg_pool(pet_feat), self.grl_alpha),
                     train, bn_mask)

        fused = CrossTransformerModAvg(
            self.dim, self.depth, self.heads, self.dim_head, self.mlp_dim,
            self.dropout, use_pallas=self.use_pallas, name="fuse_transformer", **kw
        )(tokens_from_volume(mri_feat), tokens_from_volume(pet_feat), train)
        logits = _FusionHead(4 * self.dim, axis_name=self.axis_name,
                             drop_rate=self.head_dropout,
                             name="fc_cls", **kw)(fused, train, bn_mask)
        return logits, d_mri, d_pet
