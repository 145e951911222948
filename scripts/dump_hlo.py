#!/usr/bin/env python
"""Dump the TPU-compiled (optimized) HLO of the production train step.

Same model/step construction as profile_step.py; writes the optimized
module text to /tmp/step_hlo.txt for layout/fusion forensics (which ops
force {2,4,3,1,0} copies, what a given fusion.N computes).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from transmf_ad_tpu.data.transforms import AugmentConfig
from transmf_ad_tpu.models import build_model
from transmf_ad_tpu.train.optim import build_optimizer
from transmf_ad_tpu.train.steps import create_state, make_train_step

B, SHAPE = 8, (91, 109, 91)
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/step_hlo.txt"


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
    compiled = jax.jit(step).lower(state, batch, key).compile()
    txt = compiled.as_text()
    with open(OUT, "w") as f:
        f.write(txt)
    print("wrote", OUT, len(txt), "bytes")


if __name__ == "__main__":
    main()
