"""Jitted train/eval steps and the train state.

The reference's per-batch work — H2D copy, forward, triple loss, backward,
optimizer step (reference: kfold_train_adversarial.py:101-136) — compiles
here into ONE XLA program per step: device-side augmentation (keyed by
`jax.random`), forward with BatchNorm stat updates, CE (+ adversarial GRL)
loss, gradients, and the optax update, with buffers donated so parameters
update in place in HBM. Under a sharded batch axis the same step is the
data-parallel step: XLA inserts the gradient/batch-stat all-reduces.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..data.transforms import AugmentConfig, augment
from ..nn.losses import adversarial_loss, cross_entropy


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    apply_fn: Callable = struct.field(pytree_node=False)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)


def create_state(model, tx: optax.GradientTransformation, sample_inputs,
                 rng) -> TrainState:
    """Initialize params/batch_stats from sample inputs (list of arrays)."""
    variables = model.init(rng, *sample_inputs, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        apply_fn=model.apply,
        tx=tx,
    )


def _prep_inputs(batch, modalities: Sequence[str],
                 aug_cfg: Optional[AugmentConfig], key):
    """Augment (optionally) and add the channel axis: (B,X,Y,Z) -> (B,X,Y,Z,1)."""
    vols = {k: batch[k] for k in modalities}
    if aug_cfg is not None:
        keys = jax.random.split(key, batch["label"].shape[0])
        vols = jax.vmap(lambda v, k: augment(v, k, aug_cfg))(vols, keys)
    return [vols[k][..., None] for k in modalities]


def make_train_step(
    modalities: Sequence[str] = ("MRI", "PET"),
    adversarial: bool = True,
    aug_cfg: Optional[AugmentConfig] = None,
    class_weights=None,
    donate: bool = True,
):
    """Build the jitted train step.

    Returns step(state, batch, rng) -> (new_state, out) where out carries
    per-batch scalars/logits for metric accumulation: ce_loss, ad_loss,
    logits, (d_mri/d_pet logits when adversarial), label.
    """
    modalities = tuple(modalities)

    def step(state: TrainState, batch, rng) -> Tuple[TrainState, dict]:
        aug_key, dropout_key = jax.random.split(jax.random.fold_in(rng, state.step))
        inputs = _prep_inputs(batch, modalities, aug_cfg, aug_key)
        labels = batch["label"]

        def loss_fn(params):
            out, updates = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                *inputs,
                train=True,
                rngs={"dropout": dropout_key},
                mutable=["batch_stats"],
            )
            if adversarial:
                logits, d_mri, d_pet = out
                ce = cross_entropy(logits, labels, class_weights)
                ad = adversarial_loss(d_mri, d_pet)
                loss = ce + ad
                aux = {"logits": logits, "d_mri": d_mri, "d_pet": d_pet,
                       "ce_loss": ce, "ad_loss": ad}
            else:
                logits = out
                ce = cross_entropy(logits, labels, class_weights)
                loss = ce
                aux = {"logits": logits, "ce_loss": ce,
                       "ad_loss": jnp.zeros(())}
            return loss, (aux, updates["batch_stats"])

        (loss, (aux, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt_state = state.tx.update(grads, state.opt_state,
                                                 state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
        )
        aux["loss"] = loss
        aux["label"] = labels
        return new_state, aux

    donate_argnums = (0,) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums)


def make_eval_step(
    modalities: Sequence[str] = ("MRI", "PET"),
    adversarial: bool = True,
):
    """Build the jitted eval step: deterministic forward + CE loss
    (the reference's val/test loss ignores the adversarial term,
    reference: kfold_train_adversarial.py:157-160).

    Signature: step(state, metrics, batch) -> (metrics, out). Accuracy,
    loss and the confusion matrix accumulate device-side in `metrics`
    (a `MetricState`); the batch may carry a `mask` (B,) so ragged final
    batches can be padded to one fixed, shardable shape. `out` only
    carries the tiny per-sample probs/labels/mask needed for exact
    host-side ROC-AUC at epoch end.
    """
    from .metrics import MetricState  # local: avoid import cycle

    modalities = tuple(modalities)

    def step(state: TrainState, metrics: MetricState, batch):
        inputs = _prep_inputs(batch, modalities, None, None)
        out = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            *inputs,
            train=False,
        )
        logits = out[0] if adversarial else out
        labels = batch["label"]
        mask = batch.get("mask")
        nll = cross_entropy(logits, labels, reduce=False)
        probs = jax.nn.softmax(logits, axis=-1)[:, -1]
        metrics = metrics.update(logits, labels, nll, mask)
        if mask is None:
            mask = jnp.ones(labels.shape[0], jnp.float32)
        return metrics, {"probs": probs, "label": labels, "mask": mask}

    return jax.jit(step)
