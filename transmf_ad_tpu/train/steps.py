"""Jitted train/eval steps and the train state.

The reference's per-batch work — H2D copy, forward, triple loss, backward,
optimizer step (reference: kfold_train_adversarial.py:101-136) — compiles
here into ONE XLA program per step: device-side augmentation (keyed by
`jax.random`), forward with BatchNorm stat updates, CE (+ adversarial GRL)
loss, gradients, and the optax update, with buffers donated so parameters
update in place in HBM.

Multi-chip: pass `mesh=` to the step builders and build the model with
`axis_name=data_axis`. The step is then wrapped in `jax.shard_map`, MANUAL
over the data axis (each device runs the full program — including the
Pallas kernels — on its local batch shard; no partitioning rules needed
for opaque `pallas_call`s) while any other mesh axes (e.g. 'model' tensor
parallelism) stay AUTO, so XLA still partitions the dense/attention
matmuls. Cross-device reductions are explicit psums: BatchNorm batch
statistics (inside ManualBN / flax BatchNorm via `axis_name`), the loss
numerator/denominator (so the global weighted mean is exact, not a mean of
shard means), and the parameter gradients. Results match the single-device
step bit-for-bit up to float reduction order.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import PartitionSpec as P

from ..data.transforms import AugmentConfig, augment
from ..nn.losses import cross_entropy


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


def dequantize_input(v):
    """Undo the host feed's uint8 quantization (q = round(255*x) of the
    [0,1]-normalized volume, data/pipeline.py::VolumeSource) on device.
    The convert+scale fuses into the consumer (augmentation's f32
    resample, or the stem's input cast); non-integer inputs pass through
    untouched."""
    if v.dtype == jnp.uint8:
        return v.astype(jnp.float32) * jnp.float32(1.0 / 255.0)
    return v


def _prep_inputs(batch, modalities: Sequence[str],
                 aug_cfg: Optional[AugmentConfig], key):
    """Dequantize (uint8 feeds), augment (optionally) and add the channel
    axis: (B,X,Y,Z) -> (B,X,Y,Z,1)."""
    vols = {k: dequantize_input(batch[k]) for k in modalities}
    if aug_cfg is not None:
        keys = jax.random.split(key, batch["label"].shape[0])
        vols = jax.vmap(lambda v, k: augment(v, k, aug_cfg))(vols, keys)
    return [vols[k][..., None] for k in modalities]


def _ce_sums(logits, labels, weights=None, mask=None):
    """Cross-entropy as (weighted NLL sum, weight sum): psum-able terms
    whose global ratio is the exact torch-style (weighted) mean. `mask`
    (B,) zeroes padded samples (see data/pipeline.py::pad_batch)."""
    nll = cross_entropy(logits, labels, weights, reduce=False)
    if weights is None:
        w = jnp.ones(labels.shape[0], jnp.float32)
    else:
        w = jnp.asarray(weights)[labels].astype(jnp.float32)
    if mask is not None:
        nll = nll * mask
        w = w * mask
    return jnp.sum(nll), jnp.sum(w)


def _psum_tree(tree, axis_name: Optional[str]):
    if axis_name is None:
        return tree
    return jax.tree_util.tree_map(
        lambda x: jax.lax.psum(x, axis_name), tree)


def make_train_step(
    modalities: Sequence[str] = ("MRI", "PET"),
    adversarial: bool = True,
    aug_cfg: Optional[AugmentConfig] = None,
    class_weights=None,
    donate: bool = True,
    mesh=None,
    data_axis: str = "data",
    mask_bn: bool = False,
):
    """Build the jitted train step.

    Returns step(state, batch, rng) -> (new_state, out) where out carries
    per-batch scalars/logits for metric accumulation: ce_loss, ad_loss,
    logits, (d_mri/d_pet logits when adversarial), label.

    With `mesh`, the step runs under `jax.shard_map`: manual over
    `data_axis` (batch sharded; Pallas kernels see only their shard),
    auto over the remaining axes (XLA tensor-parallelism). The model must
    then be built with `axis_name=data_axis` so BatchNorm statistics psum
    to the global batch. Loss and gradients are exact global reductions.

    `mask_bn=True` additionally feeds the batch validity mask into every
    BatchNorm's batch moments, so duplicate-padded ragged batches
    (data/pipeline.py::pad_batch) produce the statistics of the short
    batch alone — the reference semantics
    (reference: kfold_train_adversarial.py:64-66). Costs one extra
    bandwidth-bound read of each conv output on the stem paths whose
    producer-kernel stats must be discarded.
    """
    modalities = tuple(modalities)
    axis_name = data_axis if mesh is not None else None

    def step(state: TrainState, batch, rng) -> Tuple[TrainState, dict]:
        rng = jax.random.fold_in(rng, state.step)
        if axis_name is not None:
            # independent augmentation/dropout draws per data shard
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))
        aug_key, dropout_key = jax.random.split(rng)
        inputs = _prep_inputs(batch, modalities, aug_cfg, aug_key)
        labels = batch["label"]
        # `mask` marks real samples when the feed pads ragged batches to a
        # fixed (mesh-divisible) size; padded duplicates carry zero loss
        mask = batch.get("mask")

        bn_mask = mask if (mask_bn and mask is not None) else None

        def loss_fn(params):
            out, updates = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                *inputs,
                train=True,
                bn_mask=bn_mask,
                rngs={"dropout": dropout_key},
                mutable=["batch_stats"],
            )
            if adversarial:
                logits, d_mri, d_pet = out
                b = labels.shape[0]
                ce_n, ce_d = _ce_sums(logits, labels, class_weights, mask)
                # discriminator: MRI labeled 1, PET labeled 0, averaged
                # (reference: kfold_train_adversarial.py:120-125)
                mri_n, n = _ce_sums(d_mri, jnp.ones((b,), jnp.int32),
                                    mask=mask)
                pet_n, _ = _ce_sums(d_pet, jnp.zeros((b,), jnp.int32),
                                    mask=mask)
                ce_n, ce_d, mri_n, pet_n, n = _psum_tree(
                    (ce_n, ce_d, mri_n, pet_n, n), axis_name)
                ce = ce_n / ce_d
                ad = (mri_n / n + pet_n / n) / 2.0
                loss = ce + ad
                aux = {"logits": logits, "d_mri": d_mri, "d_pet": d_pet,
                       "ce_loss": ce, "ad_loss": ad}
            else:
                logits = out
                ce_n, ce_d = _psum_tree(
                    _ce_sums(logits, labels, class_weights, mask), axis_name)
                ce = ce_n / ce_d
                loss = ce
                aux = {"logits": logits, "ce_loss": ce,
                       "ad_loss": jnp.zeros(())}
            return loss, (aux, updates["batch_stats"])

        (loss, (aux, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        # Every device computes a replicated copy of the (already global,
        # psum'd) loss; inside shard_map the transpose of psum is psum, so
        # differentiating the local program yields the gradient of the SUM
        # of all n device loss copies. pmean divides the n back out —
        # verified exact (4.000x with psum on a data=4 mesh) by
        # tests/test_parallel.py::TestShardMapKernels.
        if axis_name is not None:
            grads = jax.tree_util.tree_map(
                lambda g: jax.lax.pmean(g, axis_name), grads)
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
        aux["mask"] = (mask if mask is not None
                       else jnp.ones(labels.shape[0], jnp.float32))
        return new_state, aux

    if mesh is not None:
        shard = P(data_axis)
        aux_specs = {"logits": shard, "label": shard, "mask": shard,
                     "ce_loss": P(), "ad_loss": P(), "loss": P()}
        if adversarial:
            aux_specs.update(d_mri=shard, d_pet=shard)
        # check_vma=False: the Pallas HLO interpreter (the CPU-mesh test
        # path) rejects varying-manual-axis tracking inside kernel bodies
        # (jax 0.9 limitation; the error itself suggests this flag). The
        # cross-device reductions are all explicit here anyway: BN-stat
        # psums in ManualBN, loss-term psums above, and the gradient psum.
        step = jax.shard_map(
            step, mesh=mesh,
            in_specs=(P(), shard, P()),
            out_specs=(P(), aux_specs),
            axis_names={data_axis},
            check_vma=False,
        )
    donate_argnums = (0,) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums)


def make_eval_step(
    modalities: Sequence[str] = ("MRI", "PET"),
    adversarial: bool = True,
    mesh=None,
    data_axis: str = "data",
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

    With `mesh`, runs under `jax.shard_map` manual over `data_axis`
    (same composition as make_train_step); the MetricState delta is an
    additive pytree, so the local deltas psum to exactly the
    single-device accumulation.
    """
    from .metrics import MetricState  # local: avoid import cycle

    modalities = tuple(modalities)
    axis_name = data_axis if mesh is not None else None

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
        if axis_name is None:
            metrics = metrics.update(logits, labels, nll, mask)
        else:
            delta = MetricState.zero().update(logits, labels, nll, mask)
            # psum makes every field the GLOBAL batch contribution; scale
            # `batches` back so it still counts loader batches, not shards
            delta = _psum_tree(delta, axis_name)
            delta = delta.replace(
                batches=delta.batches / jax.lax.psum(1, axis_name))
            metrics = jax.tree_util.tree_map(jnp.add, metrics, delta)
        if mask is None:
            mask = jnp.ones(labels.shape[0], jnp.float32)
        return metrics, {"probs": probs, "label": labels, "mask": mask}

    if mesh is not None:
        shard = P(data_axis)
        step = jax.shard_map(
            step, mesh=mesh,
            in_specs=(P(), P(), shard),
            out_specs=(P(), {"probs": shard, "label": shard, "mask": shard}),
            axis_names={data_axis},
            check_vma=False,
        )
    return jax.jit(step)
