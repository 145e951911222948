#!/usr/bin/env python
"""TPU sanity: the full production train step LEARNS with every Pallas
kernel engaged (stem+stats, fused BN-act-pool, pool bwd, banded dw).

Overfits model_ad on a fixed synthetic batch for N steps and checks the
loss drops substantially — unit tolerances can miss a subtly wrong
gradient path; optimization progress cannot.
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


def main():
    rng = np.random.default_rng(0)
    # separable synthetic task: class shifts the volume mean
    labels = np.array([0, 1] * (B // 2), np.int32)
    vols = rng.standard_normal((B, *SHAPE)).astype(np.float32)
    vols += labels[:, None, None, None] * 0.3
    batch = {
        "MRI": jnp.asarray(vols),
        "PET": jnp.asarray(vols[:, ::-1].copy()),
        "label": jnp.asarray(labels),
    }
    model = build_model("ad", dim=128, depth=3, heads=4, dtype=jnp.bfloat16)
    tx, _ = build_optimizer("Adam", 1e-4, steps_per_epoch=1)
    state = create_state(
        model, tx, [batch["MRI"][..., None], batch["PET"][..., None]],
        jax.random.key(0))
    step = make_train_step(("MRI", "PET"), adversarial=True, aug_cfg=None,
                           donate=False)
    key = jax.random.key(1)
    losses = []
    for i in range(STEPS):
        state, aux = step(state, batch, key)
        if i in (0, 1, STEPS // 2, STEPS - 1):
            losses.append((i, float(aux["ce_loss"])))
            print(f"step {i:3d}  ce={losses[-1][1]:.4f}", flush=True)
    first, last = losses[0][1], losses[-1][1]
    assert np.isfinite(last), "loss went non-finite"
    assert last < first * 0.5, f"no learning: {first:.4f} -> {last:.4f}"
    print(f"OK: ce {first:.4f} -> {last:.4f} over {STEPS} steps")


if __name__ == "__main__":
    main()
