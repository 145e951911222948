"""Losses: cross-entropy (the driven training loss) plus SupCon and
feature-affinity losses as library extras.

The reference's actual training loss is plain CrossEntropyLoss built in the
drivers (reference: kfold_train_adversarial.py:97,119-131); SupConLoss and
FALoss are defined but unwired there (reference: models/losses.py:13-128) —
here they are first-class, tested library losses.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def cross_entropy(logits, labels, weights: Optional[jnp.ndarray] = None,
                  reduce: bool = True):
    """Softmax cross-entropy over integer labels (torch CE semantics).

    `weights`: optional per-class weights; with weights the mean is the
    torch-style weighted mean (sum(w_i * nll_i) / sum(w_i)).
    `reduce=False` returns the per-sample NLL vector (weights applied
    multiplicatively, no normalization) for masked/streaming accumulation.
    """
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    if weights is None:
        return jnp.mean(nll) if reduce else nll
    w = jnp.asarray(weights)[labels]
    if not reduce:
        return w * nll
    return jnp.sum(w * nll) / jnp.sum(w)


def adversarial_loss(d_mri_logits, d_pet_logits):
    """Discriminator loss: MRI labeled 1, PET labeled 0, averaged
    (reference: kfold_train_adversarial.py:120-125)."""
    b = d_mri_logits.shape[0]
    mri_gt = jnp.ones((b,), jnp.int32)
    pet_gt = jnp.zeros((b,), jnp.int32)
    return (cross_entropy(d_mri_logits, mri_gt) + cross_entropy(d_pet_logits, pet_gt)) / 2.0


def supcon_loss(features, labels=None, mask=None, temperature: float = 0.07,
                contrast_mode: str = "all", base_temperature: float = 0.07):
    """Supervised contrastive loss (Khosla et al. 2020).

    `features`: (B, n_views, D) L2-normalizable embeddings. With labels/mask
    None this degenerates to SimCLR. Matches the reference's unwired
    implementation (reference: models/losses.py:13-100) semantically.
    """
    if features.ndim < 3:
        raise ValueError("features must be [bsz, n_views, ...]")
    if features.ndim > 3:
        features = features.reshape(features.shape[0], features.shape[1], -1)
    b, n_views = features.shape[0], features.shape[1]

    if labels is not None and mask is not None:
        raise ValueError("cannot define both labels and mask")
    if labels is None and mask is None:
        mask = jnp.eye(b, dtype=jnp.float32)
    elif labels is not None:
        labels = labels.reshape(-1, 1)
        mask = (labels == labels.T).astype(jnp.float32)
    else:
        mask = mask.astype(jnp.float32)

    contrast = jnp.concatenate(jnp.unstack(features, axis=1), axis=0)  # (B*V, D)
    if contrast_mode == "one":
        anchor, anchor_count = features[:, 0], 1
    elif contrast_mode == "all":
        anchor, anchor_count = contrast, n_views
    else:
        raise ValueError(f"unknown mode {contrast_mode}")

    logits = (anchor @ contrast.T) / temperature
    logits = logits - jax.lax.stop_gradient(jnp.max(logits, axis=1, keepdims=True))

    mask = jnp.tile(mask, (anchor_count, n_views))
    n_anchor = b * anchor_count
    self_mask = 1.0 - jnp.eye(n_anchor, b * n_views, dtype=jnp.float32)
    mask = mask * self_mask

    exp_logits = jnp.exp(logits) * self_mask
    log_prob = logits - jnp.log(jnp.sum(exp_logits, axis=1, keepdims=True))
    mean_log_prob_pos = jnp.sum(mask * log_prob, axis=1) / jnp.maximum(
        jnp.sum(mask, axis=1), 1e-12
    )
    loss = -(temperature / base_temperature) * mean_log_prob_pos
    return jnp.mean(loss.reshape(anchor_count, b))


def fa_loss(feature_map1, feature_map2):
    """Feature-affinity loss: L1 between token-similarity Gram matrices of
    two (B, X, Y, Z, C) feature maps (reference: models/losses.py:103-128,
    channels-last here)."""

    def gram(fm):
        b = fm.shape[0]
        tokens = fm.reshape(b, -1, fm.shape[-1])  # (B, N, C)
        return jnp.einsum("bnc,bmc->bnm", tokens, tokens)

    return jnp.mean(jnp.abs(gram(feature_map1) - gram(feature_map2)))
