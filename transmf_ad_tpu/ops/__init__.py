"""Pallas TPU kernels and their dispatch points.

`attention_core` is the single entry the nn layer calls; it routes to the
fused Pallas kernel on TPU and to a plain-XLA implementation elsewhere
(CPU tests, debugging), so model code never branches on backend.
"""

from __future__ import annotations

from typing import Optional

import jax

from ._common import auto_interpret  # noqa: F401
from .flash_attention import (  # noqa: F401
    FLASH_MIN_KEYS,
    attention_reference,
    flash_attention,
    fused_attention,
)


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def attention_core(q, k, v, scale: float, use_pallas: Optional[bool] = None):
    """softmax(q k^T * scale) v for (B, H, N, D) q and (B, H, M, D) k/v.

    use_pallas: True forces the Pallas kernels (interpret mode off-TPU),
    False forces plain XLA, None auto-selects (Pallas on TPU). Above
    `FLASH_MIN_KEYS` keys the KV-blocked online-softmax flash kernel is
    used; below it the single-pass kernel (full K/V in VMEM) wins.
    """
    if use_pallas is None:
        use_pallas = _on_tpu()
    if use_pallas:
        if k.shape[2] > FLASH_MIN_KEYS:
            return flash_attention(q, k, v, scale, 512, 512,
                                   auto_interpret(False))
        return fused_attention(q, k, v, scale, auto_interpret(False))
    return attention_reference(q, k, v, scale)
