"""Serving: ahead-of-time exported inference artifacts.

The reference has no deployment story (checkpoints can only be reloaded
into the training scripts). Here a trained model exports to a portable
StableHLO artifact via `jax.export`: the jitted eval-mode forward (params
baked in, softmax head) serialized to bytes that a serving process can load
and call without the model code — and, being StableHLO, compile for TPU or
CPU at load time.

    export_inference(state, modalities, adversarial, path, input_shape)
    fn = load_inference(path)          # fn(mri, pet) -> (B, 2) probabilities
"""

from __future__ import annotations

import os
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def make_inference_fn(state, modalities: Sequence[str], adversarial: bool):
    """Eval-mode forward closed over trained params: volumes -> probs."""
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    apply_fn = state.apply_fn

    def infer(*vols):
        out = apply_fn(variables, *[v[..., None] for v in vols], train=False)
        logits = out[0] if adversarial else out
        return jax.nn.softmax(logits, axis=-1)

    return infer


def make_sharded_inference_fn(state, modalities: Sequence[str],
                              adversarial: bool, mesh,
                              data_axis: str = "data",
                              model_axis: str = "model"):
    """Mesh-sharded eval forward: volumes -> probabilities, SPMD.

    Serving throughput past the single-chip frontier (batch 128 at crop
    resolution is the measured single-chip optimum; larger batches hit
    the remote-compile ceiling — docs/PERFORMANCE.md "Inference /
    serving") scales on the data axis of a `jax.sharding.Mesh`: inputs
    shard on the leading batch axis over `data_axis`, params follow
    `parallel.param_shardings` (column-sharded over `model_axis` when
    its size > 1, else fully replicated) and XLA's SPMD partitioner
    inserts the collectives. Batch sizes must divide the data-axis size
    (pad the final partial batch, as `DeviceFeed(pad_to=...)` does for
    training). The reference has no serving path at all.
    """
    from .parallel import batch_sharding, param_shardings, replicated

    rep = replicated(mesh)
    p_sh = param_shardings(state.params, mesh, model_axis)
    variables = {
        "params": jax.tree_util.tree_map(jax.device_put, state.params, p_sh),
        "batch_stats": jax.tree_util.tree_map(
            lambda x: jax.device_put(x, rep), state.batch_stats),
    }
    apply_fn = state.apply_fn
    b_sh = batch_sharding(mesh, data_axis)

    def infer(vars_, *vols):
        out = apply_fn(vars_, *[v[..., None] for v in vols], train=False)
        logits = out[0] if adversarial else out
        return jax.nn.softmax(logits, axis=-1)

    var_sh = {
        "params": p_sh,
        "batch_stats": jax.tree_util.tree_map(lambda _: rep,
                                              state.batch_stats),
    }
    jitted = jax.jit(infer, in_shardings=(var_sh, *([b_sh] * len(modalities))),
                     out_shardings=b_sh)

    def fn(*vols):
        return jitted(variables, *vols)

    return fn


def export_inference(state, modalities: Sequence[str], adversarial: bool,
                     path: str, input_shape: Tuple[int, ...],
                     batch_size=None, dtype=jnp.float32) -> str:
    """Serialize the inference function to a StableHLO artifact at `path`.

    `batch_size=None` (default) exports with a SYMBOLIC batch dimension:
    the loaded artifact accepts any batch size (the serving process is
    not tied to the training batch). Pass an int to pin the batch (one
    specialized executable, marginally faster cold-compile at load)."""
    from jax import export as jexport

    infer = make_inference_fn(state, modalities, adversarial)
    if batch_size is None:
        (b,) = jexport.symbolic_shape("b")
    else:
        b = batch_size
    args = [
        jax.ShapeDtypeStruct((b, *input_shape), dtype)
        for _ in modalities
    ]
    exported = jexport.export(jax.jit(infer))(*args)
    data = exported.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(data)
    return path


def load_inference(path: str):
    """Load an exported artifact; returns fn(*volumes) -> probabilities."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exported = jexport.deserialize(f.read())

    def fn(*vols):
        return exported.call(*[jnp.asarray(v) for v in vols])

    return fn
