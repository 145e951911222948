#!/usr/bin/env python
"""Capture a jax.profiler trace of the production train step on TPU.

Writes a TensorBoard trace to /tmp/step_profile; then summarizes per-op
device time from the .xplane.pb if tensorboard_plugin_profile is absent by
listing the largest trace events. Falls back gracefully if the axon tunnel
does not support profiling.
"""
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("TRANSMF_PROFILE_CACHE",
                                 "/tmp/jax_test_cache"))

from transmf_ad_tpu.data.transforms import AugmentConfig
from transmf_ad_tpu.models import build_model
from transmf_ad_tpu.train.optim import build_optimizer
from transmf_ad_tpu.train.steps import create_state, make_train_step

B, SHAPE = 8, (91, 109, 91)
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/step_profile"


def main():
    rng = np.random.default_rng(0)
    batch = {
        "MRI": jnp.asarray(rng.standard_normal((B, *SHAPE)), jnp.float32),
        "PET": jnp.asarray(rng.standard_normal((B, *SHAPE)), jnp.float32),
        "label": jnp.asarray(rng.integers(0, 2, B), jnp.int32),
    }
    model = build_model("ad", dim=128, depth=3, heads=4, dtype=jnp.bfloat16)
    tx, _ = build_optimizer("Adam", 1e-4, steps_per_epoch=1)
    state = create_state(
        model, tx, [batch["MRI"][..., None], batch["PET"][..., None]],
        jax.random.key(0))
    step = make_train_step(("MRI", "PET"), adversarial=True,
                           aug_cfg=AugmentConfig(), donate=False)
    key = jax.random.key(1)

    for _ in range(3):
        state, aux = step(state, batch, key)
    print("warm loss", float(aux["loss"]), flush=True)

    with jax.profiler.trace(OUT):
        for _ in range(5):
            state, aux = step(state, batch, key)
        float(aux["loss"])
    print("trace written to", OUT, flush=True)
    for f in glob.glob(OUT + "/**/*", recursive=True):
        print(" ", f, os.path.getsize(f))


if __name__ == "__main__":
    main()
