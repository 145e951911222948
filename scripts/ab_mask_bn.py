"""A/B the mask-weighted BN train step (TrainerConfig.mask_bn).

mask_bn=True feeds the batch validity mask into every BatchNorm's batch
moments (reference short-batch semantics on duplicate-padded ragged
batches — nn/batchnorm.py). Cost: the stem's producer-kernel stats are
discarded in favor of a mask-weighted XLA reduction (one extra
bandwidth-bound read of each conv output). This measures the full-step
cost at crop geometry so the Trainer default can be set on data.

Usage: python scripts/ab_mask_bn.py [batch]   (runs BOTH arms in-process:
mask_bn is a closure argument, not a trace-time env flag)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")

from transmf_ad_tpu.data.transforms import AugmentConfig
from transmf_ad_tpu.models import build_model
from transmf_ad_tpu.train.optim import build_optimizer
from transmf_ad_tpu.train.steps import create_state, make_train_step

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
SHAPE = (91, 109, 91)

rng = np.random.default_rng(0)
batch = {
    "MRI": jnp.asarray(rng.standard_normal((B, *SHAPE)), jnp.bfloat16),
    "PET": jnp.asarray(rng.standard_normal((B, *SHAPE)), jnp.bfloat16),
    "label": jnp.asarray(rng.integers(0, 2, B), jnp.int32),
    "mask": jnp.ones((B,), jnp.float32),
}
model = build_model("ad", dim=128, depth=3, heads=4, dtype=jnp.bfloat16)
tx, _ = build_optimizer("Adam", 1e-4, steps_per_epoch=1)


def measure(mask_bn):
    state = create_state(model, tx,
                         [batch["MRI"][..., None], batch["PET"][..., None]],
                         jax.random.key(0))
    step = make_train_step(("MRI", "PET"), adversarial=True,
                           aug_cfg=AugmentConfig(), donate=False,
                           mask_bn=mask_bn)
    key = jax.random.key(1)
    for _ in range(3):
        state, aux = step(state, batch, key)
    float(np.asarray(aux["loss"]))
    t0 = time.perf_counter()
    n = 10
    for _ in range(n):
        state, aux = step(state, batch, key)
    float(np.asarray(aux["loss"]))
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"mask_bn={mask_bn}: {dt:.2f} ms/step dispatch "
          f"({B / dt * 1e3:.1f} vols/s)")
    return dt


off = measure(False)
on = measure(True)
print(f"delta: {on - off:+.2f} ms ({(on - off) / off * 100:+.1f}%)")
