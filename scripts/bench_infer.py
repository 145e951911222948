"""Inference (serving) throughput of the flagship ModelAd on the chip.

Eval-mode jitted forward (the `serving.make_inference_fn` path: softmax
probabilities, running BN stats, no dropout), bf16 activations, crop
resolution, swept over batch size — inference holds no backward
activations, so the batch frontier is far past training's.

Dispatch-loop timing with value-fetch sync (CLAUDE.md measurement
discipline); at these batch sizes the per-dispatch tunnel overhead is
<2% of a step. Prints one line per batch size + a summary.
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
from transmf_ad_tpu.serving import make_inference_fn
from transmf_ad_tpu.train.optim import build_optimizer
from transmf_ad_tpu.train.steps import create_state

SHAPE = tuple(int(x) for x in os.environ.get(
    "INFER_SHAPE", "91,109,91").split(","))
BATCHES = [int(b) for b in os.environ.get(
    "INFER_BATCHES", "8,16,32,64").split(",")]
ITERS = int(os.environ.get("INFER_ITERS", 10))

rng = np.random.default_rng(0)
model = build_model("ad", dim=128, depth=3, heads=4, dtype=jnp.bfloat16)
probe = jnp.asarray(rng.standard_normal((2, *SHAPE, 1)), jnp.bfloat16)
state = create_state(model, build_optimizer("Adam", 1e-4, 1)[0],
                     [probe, probe], jax.random.key(0))
infer = jax.jit(make_inference_fn(state, ("MRI", "PET"), adversarial=True))

best = (0.0, 0)
for b in BATCHES:
    mri = jnp.asarray(rng.standard_normal((b, *SHAPE)), jnp.bfloat16)
    pet = jnp.asarray(rng.standard_normal((b, *SHAPE)), jnp.bfloat16)
    try:
        for _ in range(3):
            probs = infer(mri, pet)
        float(probs.ravel()[0])  # value-fetch sync
        t0 = time.perf_counter()
        for _ in range(ITERS):
            probs = infer(mri, pet)
        float(probs.ravel()[0])
        dt = (time.perf_counter() - t0) / ITERS
    except Exception as e:  # OOM at a batch size: report and continue
        print(f"batch {b:4d}: {type(e).__name__}: {str(e)[:120]}")
        continue
    vps = b / dt
    print(f"batch {b:4d}: {dt * 1e3:7.2f} ms/batch  {vps:8.1f} vols/s "
          f"({dt / b * 1e3:.2f} ms/vol)", flush=True)
    if vps > best[0]:
        best = (vps, b)
print(f"best: {best[0]:.1f} vols/s at batch {best[1]}")
