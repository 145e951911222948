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

Semantics match torch BatchNorm3d / flax BatchNorm used in round 1:
biased batch variance for both normalization and the running update,
momentum 0.9 (flax convention: new = m*old + (1-m)*batch), eps 1e-5.
A `conv_bias` argument folds the convolution bias into the statistics
algebraically (mean(y+b) = mean(y)+b; var unchanged), so callers can keep
the conv output bias-free and fold the bias into `shift` as well.

reference: BN layers of sNet blocks (reference: models/networks.py:23-52).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class ManualBN(nn.Module):
    momentum: float = 0.9
    epsilon: float = 1e-5
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, y, conv_bias=None, train: bool = False,
                 stats=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """y: (..., C) linear conv output (WITHOUT bias when conv_bias is
        given). Returns f32 (scale, shift) with shift including conv_bias:
        normalized = (y + b) * scale + shift_no_b  ==  y * scale + shift.

        stats: optional (sum, sumsq, n) per-channel f32 sums precomputed by
        a producer kernel (e.g. ops/stem.py::stem_conv_stats), so no XLA op
        has to re-read the full tensor."""
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
                n = n * jax.lax.psum(1, self.axis_name)
            mean0 = s / n                      # mean of the bias-free output
            var = ss / n - jax.lax.square(mean0)  # shift-invariant
            mean = mean0 + b
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var
        else:
            mean, var = ra_mean.value, ra_var.value

        gf = gamma.astype(jnp.float32)
        bf = beta.astype(jnp.float32)
        scale = gf * jax.lax.rsqrt(var + self.epsilon)
        shift = bf - (mean - b) * scale  # so that y*scale+shift includes b
        return scale, shift


def bn_affine_reference(y, scale, shift, slope: float = 0.01):
    """Apply the ManualBN affine + LeakyReLU in plain XLA (the unfused
    path; (C,) broadcast, fuses into neighbors)."""
    z = y.astype(jnp.float32) * scale + shift
    z = jnp.where(z >= 0, z, slope * z)
    return z.astype(y.dtype)
