#!/usr/bin/env python
"""TPU sanity: the full production train step LEARNS with every Pallas
kernel engaged (stem+stats, fused BN-act-pool, pool bwd, banded dw).

Overfits model_ad on a fixed synthetic batch for N steps and checks the
loss drops substantially — unit tolerances can miss a subtly wrong
gradient path; optimization progress cannot. A second phase repeats the
check on an over-VMEM stem geometry (toy-sized), driving the z-blocked
regime: banded blocked stem fwd (the full-res default) + blocked banded
dw + merged z-chunked pool (SANITY_SKIP_BLOCKED=1 to skip).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")

from transmf_ad_tpu.models import build_model
from transmf_ad_tpu.train.optim import build_optimizer
from transmf_ad_tpu.train.steps import create_state, make_train_step

B, SHAPE = 8, (91, 109, 91)
STEPS = int(os.environ.get("SANITY_STEPS", 40))
# over-VMEM stem geometry at toy size: exercises the z-blocked regime
# (banded blocked stem fwd + blocked banded dw + merged z-chunked pool)
# on-chip
BLOCKED_SHAPE = (16, 16, 384)


def overfit(batch, dim, steps, lr=1e-4, remat=False, depth=1, heads=2):
    model = build_model("ad", dim=dim, depth=depth, heads=heads,
                        dtype=jnp.bfloat16, remat=remat)
    tx, _ = build_optimizer("Adam", lr, steps_per_epoch=1)
    state = create_state(
        model, tx, [batch["MRI"][..., None], batch["PET"][..., None]],
        jax.random.key(0))
    step = make_train_step(("MRI", "PET"), adversarial=True, aug_cfg=None,
                           donate=False)
    key = jax.random.key(1)
    losses = []
    for i in range(steps):
        state, aux = step(state, batch, key)
        if i in (0, 1, steps // 2, steps - 1):
            losses.append((i, float(aux["ce_loss"])))
            print(f"step {i:3d}  ce={losses[-1][1]:.4f}", flush=True)
    return losses[0][1], losses[-1][1]


def make_batch(rng, b, shape):
    # separable synthetic task: class shifts the volume mean
    labels = np.array([0, 1] * (b // 2), np.int32)
    vols = rng.standard_normal((b, *shape)).astype(np.float32)
    vols += labels[:, None, None, None] * 0.3
    return {
        "MRI": jnp.asarray(vols),
        "PET": jnp.asarray(vols[:, ::-1].copy()),
        "label": jnp.asarray(labels),
    }


def main():
    rng = np.random.default_rng(0)
    batch = make_batch(rng, B, SHAPE)
    # flagship geometry, full production kernel set (dim 128, depth 3)
    first, last = overfit(batch, dim=128, steps=STEPS, depth=3, heads=4)
    assert np.isfinite(last), "loss went non-finite"
    assert last < first * 0.5, f"no learning: {first:.4f} -> {last:.4f}"
    print(f"OK: ce {first:.4f} -> {last:.4f} over {STEPS} steps")

    if os.environ.get("SANITY_SKIP_BLOCKED"):
        return
    print(f"--- z-blocked regime {BLOCKED_SHAPE} ---", flush=True)
    from transmf_ad_tpu.ops.stem import stem_fits

    assert not stem_fits(BLOCKED_SHAPE, 8), "shape unexpectedly fits"
    bb = make_batch(rng, 4, BLOCKED_SHAPE)
    first, last = overfit(bb, dim=32, steps=STEPS)
    assert np.isfinite(last), "blocked-regime loss went non-finite"
    assert last < first * 0.5, \
        f"no learning (blocked): {first:.4f} -> {last:.4f}"
    print(f"OK blocked: ce {first:.4f} -> {last:.4f} over {STEPS} steps")


if __name__ == "__main__":
    main()
