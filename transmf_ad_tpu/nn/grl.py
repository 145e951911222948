"""Gradient reversal layer via `jax.custom_vjp`.

TPU-native equivalent of the reference's custom autograd Function
(reference: models/gradient_reversal/functional.py:4-19): identity forward,
`-alpha * grad` backward. Composes freely with jit/grad/vmap and with psum
ordering under data parallelism (the sign flip is local and linear).
"""

from __future__ import annotations

from functools import partial

import jax


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def revgrad(x, alpha: float = 1.0):
    """Identity in the forward pass; scales the cotangent by -alpha."""
    del alpha
    return x


def _revgrad_fwd(x, alpha):
    return x, None


def _revgrad_bwd(alpha, _, g):
    return (jax.tree_util.tree_map(lambda t: -alpha * t, g),)


revgrad.defvjp(_revgrad_fwd, _revgrad_bwd)
