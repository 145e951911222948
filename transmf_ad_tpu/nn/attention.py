"""Transformer blocks: attention, feed-forward, cross-modal fusion.

Behavioral spec follows the reference's pre-LN ViT-style stack
(reference: models/networks.py:114-281), built TPU-first: QKV projections are
single fused matmuls feeding the MXU, and the attention core routes through
`transmf_ad_tpu.ops.attention_core`, which dispatches to fused Pallas
attention kernels on TPU — a single-pass kernel (query-blocked, full K/V
resident in VMEM) for this model's native token counts up to the
1,573-token full-resolution grid, and a KV-blocked online-softmax flash
kernel with a Pallas backward beyond ~2k keys (finer patchings / larger
volumes) — with a pure-jnp fallback elsewhere.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..ops import attention_core
from .init import torch_linear_bias, torch_linear_kernel

Dtype = Any


def _dense(features, use_bias=True, dtype=None, in_features=None, name=None,
           precision=None):
    """Linear layer with torch-default init (U(+-1/sqrt(fan_in)))."""
    return nn.Dense(
        features,
        use_bias=use_bias,
        kernel_init=torch_linear_kernel,
        bias_init=torch_linear_bias(in_features) if in_features else nn.initializers.zeros,
        dtype=dtype,
        precision=precision,
        name=name,
    )


class FeedForward(nn.Module):
    """Linear -> GELU(exact) -> Drop -> Linear -> Drop
    (reference: models/networks.py:125-137)."""

    dim: int
    hidden_dim: int
    dropout: float = 0.0
    dtype: Optional[Dtype] = None
    precision: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _dense(self.hidden_dim, dtype=self.dtype, in_features=self.dim,
                   precision=self.precision)(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = _dense(self.dim, dtype=self.dtype, in_features=self.hidden_dim,
                   precision=self.precision)(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class Attention(nn.Module):
    """Multi-head attention with separate query/context inputs.

    Matches reference semantics (reference: models/networks.py:141-175):
    `to_q` from x, fused `to_kv` from context (defaults to x => self-attn),
    optional `kv_include_self` prepends x to the context, scale
    dim_head**-0.5, output projection + dropout. No QKV biases.
    """

    dim: int
    heads: int = 4
    dim_head: int = 64
    dropout: float = 0.0
    dtype: Optional[Dtype] = None
    precision: Optional[Any] = None
    use_pallas: Optional[bool] = None  # None => auto (TPU only)

    @nn.compact
    def __call__(self, x, context=None, kv_include_self: bool = False,
                 train: bool = False):
        b, n, _ = x.shape
        h, dh = self.heads, self.dim_head
        inner = h * dh
        ctx = x if context is None else context
        if kv_include_self:
            ctx = jnp.concatenate([x, ctx], axis=1)

        q = _dense(inner, use_bias=False, dtype=self.dtype, name="to_q",
                   precision=self.precision)(x)
        kv = _dense(inner * 2, use_bias=False, dtype=self.dtype, name="to_kv",
                    precision=self.precision)(ctx)
        k, v = jnp.split(kv, 2, axis=-1)

        m = ctx.shape[1]
        q = q.reshape(b, n, h, dh).transpose(0, 2, 1, 3)
        k = k.reshape(b, m, h, dh).transpose(0, 2, 1, 3)
        v = v.reshape(b, m, h, dh).transpose(0, 2, 1, 3)

        out = attention_core(q, k, v, scale=dh**-0.5, use_pallas=self.use_pallas)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        out = _dense(self.dim, dtype=self.dtype, in_features=inner, name="to_out",
                     precision=self.precision)(out)
        out = nn.Dropout(self.dropout, deterministic=not train)(out)
        return out


class Transformer(nn.Module):
    """depth x [PreNorm-Attn + res, PreNorm-FF + res], final LayerNorm
    (reference: models/networks.py:215-230). `context` feeds every layer's
    attention (cross-attention when not None)."""

    dim: int
    depth: int
    heads: int
    dim_head: int
    mlp_dim: int
    dropout: float = 0.0
    dtype: Optional[Dtype] = None
    precision: Optional[Any] = None
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, x, context=None, train: bool = False):
        for _ in range(self.depth):
            y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
            x = Attention(
                self.dim, self.heads, self.dim_head, self.dropout,
                dtype=self.dtype, precision=self.precision,
                use_pallas=self.use_pallas,
            )(y, context=context, train=train) + x
            y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
            x = FeedForward(self.dim, self.mlp_dim, self.dropout, dtype=self.dtype,
                            precision=self.precision)(y, train=train) + x
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)


class CrossTransformer(nn.Module):
    """Joint-context fusion: each stream attends over concat(mri, pet)
    (reference: models/networks.py:233-252). The reference's share=True
    branch is broken (builds single encoders but unpacks pairs); here
    share=True correctly applies one shared encoder to both streams."""

    dim: int
    depth: int
    heads: int
    dim_head: int
    mlp_dim: int
    dropout: float = 0.0
    share: bool = False
    dtype: Optional[Dtype] = None
    precision: Optional[Any] = None
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, mri, pet, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        kw = dict(
            dim=self.dim, depth=1, heads=self.heads, dim_head=self.dim_head,
            mlp_dim=self.mlp_dim, dropout=self.dropout, dtype=self.dtype,
            precision=self.precision, use_pallas=self.use_pallas,
        )
        for _ in range(self.depth):
            mri_enc = Transformer(**kw)
            pet_enc = mri_enc if self.share else Transformer(**kw)
            mri = mri_enc(mri, context=jnp.concatenate([mri, pet], axis=1),
                          train=train) + mri
            pet = pet_enc(pet, context=jnp.concatenate([mri, pet], axis=1),
                          train=train) + pet
        return mri, pet


def token_pool(tokens):
    """GAP+GMP over the token axis -> (B, 2*dim): concat[mean, max]."""
    return jnp.concatenate(
        [jnp.mean(tokens, axis=1), jnp.max(tokens, axis=1)], axis=-1
    )


class CrossTransformerModAvg(nn.Module):
    """The paper's fusion module (fig. c): depth x pairs of 1-layer
    Transformers doing pure cross-attention (MRI queries/PET context, then
    PET queries/updated-MRI context) with outer residuals, followed by a
    fused GAP/GMP token-pooling head -> (B, 4*dim)
    (reference: models/networks.py:255-281)."""

    dim: int
    depth: int
    heads: int
    dim_head: int
    mlp_dim: int
    dropout: float = 0.0
    dtype: Optional[Dtype] = None
    precision: Optional[Any] = None
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, mri, pet, train: bool = False):
        kw = dict(
            dim=self.dim, depth=1, heads=self.heads, dim_head=self.dim_head,
            mlp_dim=self.mlp_dim, dropout=self.dropout, dtype=self.dtype,
            precision=self.precision, use_pallas=self.use_pallas,
        )
        for _ in range(self.depth):
            mri = Transformer(**kw)(mri, context=pet, train=train) + mri
            pet = Transformer(**kw)(pet, context=mri, train=train) + pet
        # fused GAP+GMP head; concat order matches the reference:
        # [mri_avg, pet_avg, mri_max, pet_max]
        from ..ops.pooling import fused_token_pool

        return fused_token_pool(mri, pet, use_pallas=self.use_pallas)


class PositionalEncoding1D(nn.Module):
    """1D sinusoidal positional encoding (reference: models/networks.py:178-211,
    defined-but-unused there; provided as a library extra)."""

    channels: int

    def __call__(self, tokens):
        b, n, _ = tokens.shape
        ch = int(jnp.ceil(self.channels / 2) * 2)
        inv_freq = 1.0 / (10000 ** (jnp.arange(0, ch, 2, dtype=jnp.float32) / ch))
        pos = jnp.arange(n, dtype=jnp.float32)
        ang = jnp.einsum("i,j->ij", pos, inv_freq)
        emb = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)[:, : self.channels]
        return jnp.broadcast_to(emb[None], (b, n, self.channels)).astype(tokens.dtype)
