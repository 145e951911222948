#!/usr/bin/env python
"""Batch-scaling of the production train step, slope-timed on device.

Replaces round 1's "flat at batch 16" claim (measured with the discredited
per-dispatch method; see docs/PERFORMANCE.md "Measurement discipline").
Sweeps per-chip batch x remat on the full model_ad step and prints device
ms/step + volumes/s. Usage:
    python scripts/bench_batch_scaling.py [batches...]   # default 4 8 16 32
Env: TRANSMF_STEM_POOL_FUSION=1 to A/B the fused stage-1 on.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")

from _timing import scan_slope_time_state  # noqa: E402

from transmf_ad_tpu.data.transforms import AugmentConfig  # noqa: E402
from transmf_ad_tpu.models import build_model  # noqa: E402
from transmf_ad_tpu.train.optim import build_optimizer  # noqa: E402
from transmf_ad_tpu.train.steps import create_state, make_train_step  # noqa: E402

SHAPE = (91, 109, 91)


def measure(batch_size: int, remat: bool):
    rng = np.random.default_rng(0)
    batch = {
        "MRI": jnp.asarray(rng.standard_normal((batch_size, *SHAPE)),
                           jnp.float32),
        "PET": jnp.asarray(rng.standard_normal((batch_size, *SHAPE)),
                           jnp.float32),
        "label": jnp.asarray(rng.integers(0, 2, batch_size), jnp.int32),
    }
    model = build_model("ad", dim=128, depth=3, heads=4, dtype=jnp.bfloat16,
                        remat=remat)
    tx, _ = build_optimizer("Adam", 1e-4, steps_per_epoch=1)
    state = create_state(
        model, tx, [batch["MRI"][..., None], batch["PET"][..., None]],
        jax.random.key(0))
    step = make_train_step(("MRI", "PET"), adversarial=True,
                           aug_cfg=AugmentConfig(), donate=False)
    key = jax.random.key(1)
    return scan_slope_time_state(
        lambda st, b: step(st, b, key), state, batch,
        iters=max(4, 64 // batch_size))


def main():
    batches = [int(a) for a in sys.argv[1:]] or [4, 8, 16, 32]
    fused = bool(os.environ.get("TRANSMF_STEM_POOL_FUSION"))
    print(f"# stage-1 fusion: {'ON' if fused else 'OFF'}; "
          f"backend={jax.default_backend()}")
    print(f"{'batch':>6} {'remat':>6} {'ms/step':>9} {'vols/s':>8}")
    for b in batches:
        for remat in (False, True):
            try:
                dt = measure(b, remat)
                print(f"{b:6d} {str(remat):>6} {dt * 1e3:9.2f} "
                      f"{b / dt:8.1f}", flush=True)
            except Exception as e:  # OOM at large batches is a result too
                msg = str(e).split("\n")[0][:60]
                print(f"{b:6d} {str(remat):>6}   FAILED: {msg}", flush=True)


if __name__ == "__main__":
    main()
