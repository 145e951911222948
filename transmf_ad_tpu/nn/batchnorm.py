"""BatchNorm as an affine factory: statistics in, (scale, shift) out.

flax's `nn.BatchNorm` computes stats AND normalizes in one call, which
forces the normalize+activation to be a separate full-tensor pass before
pooling. `ManualBN` computes the SAME statistics, running-average updates,
and parameters (identical param/batch_stats tree: `scale`, `bias` params;
`mean`, `var` variables — checkpoints interchange with nn.BatchNorm), but
returns the per-channel affine (scale, shift) so the caller can fuse the
apply wherever it is cheapest — e.g. into the Pallas pool kernel prologue
(ops/pool3d.py::max_pool3d_2x2_affine_act) so the full-resolution
activated tensor never materializes in HBM.

Semantics match torch BatchNorm3d (the reference's BN): biased batch
variance for normalization but UNBIASED (n/(n-1)) for the running_var
update — flax nn.BatchNorm uses biased for both, a real deviation at
small n (head BNs over the batch axis) caught by the N-step dynamics
test — momentum 0.9 (flax convention: new = m*old + (1-m)*batch),
eps 1e-5.
A `conv_bias` argument folds the convolution bias into the statistics
algebraically (mean(y+b) = mean(y)+b; var unchanged), so callers can keep
the conv output bias-free and fold the bias into `shift` as well.

reference: BN layers of sNet blocks (reference: models/networks.py:23-52).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class ManualBN(nn.Module):
    momentum: float = 0.9
    epsilon: float = 1e-5
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, y, conv_bias=None, train: bool = False,
                 stats=None, mask=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """y: (..., C) linear conv output (WITHOUT bias when conv_bias is
        given). Returns f32 (scale, shift) with shift including conv_bias:
        normalized = (y + b) * scale + shift_no_b  ==  y * scale + shift.

        stats: optional (sum, sumsq, n) per-channel f32 sums precomputed by
        a producer kernel (e.g. ops/stem.py::stem_conv_stats), so no XLA op
        has to re-read the full tensor.

        mask: optional (B,) per-sample weights (leading axis of y). With a
        0/1 validity mask the batch moments see REAL samples only, so a
        duplicate-padded ragged batch (data/pipeline.py::pad_batch) yields
        bit-identical statistics to feeding the short batch as-is — the
        reference behavior (reference: kfold_train_adversarial.py:64-66).
        Mutually exclusive with `stats` (producer-kernel sums cover the
        whole padded batch and cannot be mask-corrected per sample).

        n==1 note: the unbiased running_var correction n/max(n-1, 1)
        degrades to the biased variance (0) at a single statistic sample;
        torch errors on batch-of-1 training instead. Unreachable through
        the drivers (spatial dims make n >= batch*spatial >> 1)."""
        if stats is not None and mask is not None:
            raise ValueError(
                "ManualBN: `stats` and `mask` are mutually exclusive — "
                "producer-kernel sums cover the whole padded batch and "
                "cannot be mask-corrected per sample")
        C = y.shape[-1]
        gamma = self.param("scale", nn.initializers.ones, (C,))
        beta = self.param("bias", nn.initializers.zeros, (C,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((C,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((C,), jnp.float32))

        b = (jnp.zeros((C,), jnp.float32) if conv_bias is None
             else conv_bias.astype(jnp.float32))
        if train:
            if stats is not None:
                s, ss, n = stats
            elif mask is not None:
                yf = y.astype(jnp.float32)
                spatial_axes = tuple(range(1, y.ndim - 1))
                w = mask.astype(jnp.float32)
                # per-sample spatial sums, then mask-weighted batch sum:
                # one bandwidth-bound extra read of y, fuses with neighbors
                per_s = jnp.sum(yf, axis=spatial_axes)          # (B, C)
                per_ss = jnp.sum(jax.lax.square(yf), axis=spatial_axes)
                s = jnp.sum(per_s * w[:, None], axis=0)
                ss = jnp.sum(per_ss * w[:, None], axis=0)
                spatial = 1
                for d in spatial_axes:
                    spatial *= y.shape[d]
                n = jnp.sum(w) * spatial
            else:
                yf = y.astype(jnp.float32)
                axes = tuple(range(y.ndim - 1))
                n = 1
                for d in axes:
                    n *= y.shape[d]
                s = jnp.sum(yf, axis=axes)
                ss = jnp.sum(jax.lax.square(yf), axis=axes)
            if self.axis_name is not None:
                s = jax.lax.psum(s, self.axis_name)
                ss = jax.lax.psum(ss, self.axis_name)
                if mask is not None and stats is None:
                    # masked counts differ per shard (a shard may hold only
                    # padded duplicates): sum the true counts
                    n = jax.lax.psum(n, self.axis_name)
                else:
                    n = n * jax.lax.psum(1, self.axis_name)
            mean0 = s / n                      # mean of the bias-free output
            var = ss / n - jax.lax.square(mean0)  # shift-invariant
            mean = mean0 + b
            if not self.is_initializing():
                m = self.momentum
                # torch semantics: normalize with the BIASED batch variance
                # but update running_var with the UNBIASED one (n/(n-1)) —
                # material for small-n head BNs (caught by the N-step
                # dynamics test, tests/test_reference_parity.py)
                var_u = var * (n / jnp.maximum(n - 1, 1))
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var_u
        else:
            mean, var = ra_mean.value, ra_var.value

        gf = gamma.astype(jnp.float32)
        bf = beta.astype(jnp.float32)
        scale = gf * jax.lax.rsqrt(var + self.epsilon)
        shift = bf - (mean - b) * scale  # so that y*scale+shift includes b
        return scale, shift


class BatchNormMasked(nn.Module):
    """Drop-in for `nn.BatchNorm(use_running_average=not train)` over (B, F)
    head activations, with optional per-sample mask-weighted batch moments.

    Identical parameter/batch_stats tree to flax nn.BatchNorm ({scale, bias}
    params; {mean, var} running stats — checkpoints interchange), torch
    BatchNorm1d math: biased batch variance for normalization, UNBIASED
    for the running_var update, momentum-0.9 running updates, f32
    statistics, normalization applied in f32 and cast back to the input
    dtype. With a 0/1 `mask` (B,), batch moments weight real samples
    only, eliminating the duplicate-padded ragged-batch BN deviation
    (see ManualBN.__call__ and data/pipeline.py::pad_batch).

    reference: head/discriminator BN layers (reference: mymodel.py:152,
    190-192) — torch BatchNorm1d over the dense features.
    """

    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Optional[Any] = None
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        C = x.shape[-1]
        gamma = self.param("scale", nn.initializers.ones, (C,))
        beta = self.param("bias", nn.initializers.zeros, (C,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((C,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((C,), jnp.float32))
        if train:
            xf = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            if mask is not None:
                w = mask.astype(jnp.float32)
                wb = w.reshape(w.shape[0], *([1] * (x.ndim - 2)))
                n = jnp.sum(w) * (
                    int(np.prod(x.shape[1:-1])) if x.ndim > 2 else 1)
                s = jnp.sum(xf * wb[..., None], axis=axes)
                ss = jnp.sum(jax.lax.square(xf) * wb[..., None], axis=axes)
            else:
                n = 1
                for d in axes:
                    n *= x.shape[d]
                s = jnp.sum(xf, axis=axes)
                ss = jnp.sum(jax.lax.square(xf), axis=axes)
            if self.axis_name is not None:
                s = jax.lax.psum(s, self.axis_name)
                ss = jax.lax.psum(ss, self.axis_name)
                if mask is not None:
                    n = jax.lax.psum(n, self.axis_name)
                else:
                    n = n * jax.lax.psum(1, self.axis_name)
            mean = s / n
            var = ss / n - jax.lax.square(mean)
            if not self.is_initializing():
                m = self.momentum
                # unbiased running_var, biased normalization (torch BN1d)
                var_u = var * (n / jnp.maximum(n - 1, 1))
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var_u
        else:
            mean, var = ra_mean.value, ra_var.value
        scale = gamma.astype(jnp.float32) * jax.lax.rsqrt(var + self.epsilon)
        shift = beta.astype(jnp.float32) - mean * scale
        out = x.astype(jnp.float32) * scale + shift
        return out.astype(self.dtype or x.dtype)


def bn_affine_reference(y, scale, shift, slope: float = 0.01):
    """Apply the ManualBN affine + LeakyReLU in plain XLA (the unfused
    path; (C,) broadcast, fuses into neighbors)."""
    z = y.astype(jnp.float32) * scale + shift
    z = jnp.where(z >= 0, z, slope * z)
    return z.astype(y.dtype)
