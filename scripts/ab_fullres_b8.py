"""Full-resolution batch-8: does selective stem remat lift the OOM, and
does it beat the batch-6 remat-off optimum (17.0 vols/s/chip)?

Round-4 frontier: b6 remat-off = 17.0 vols/s; b8 remat-off OOMs on the
two 3.6 GB linear stem outputs. Selective per-block remat
(nn/blocks.py::_remat_worth_it, 300 MB threshold = stem-only at full
res) recomputes exactly those tensors in the backward. This measures
each (batch, remat) arm in a SEPARATE process run (OOM must not poison
the next arm): pass batch and remat as argv.

  python scripts/ab_fullres_b8.py <batch> <remat 0|1>

Results go to docs/PERFORMANCE.md "Full-resolution batch 8".
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from transmf_ad_tpu.data.transforms import AugmentConfig
from transmf_ad_tpu.models import build_model
from transmf_ad_tpu.train.optim import build_optimizer
from transmf_ad_tpu.train.steps import create_state, make_train_step

SHAPE = (182, 218, 182)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    remat = bool(int(sys.argv[2])) if len(sys.argv) > 2 else True
    rng = np.random.default_rng(0)
    b = {
        "MRI": jnp.asarray(rng.standard_normal((batch, *SHAPE)),
                           jnp.bfloat16),
        "PET": jnp.asarray(rng.standard_normal((batch, *SHAPE)),
                           jnp.bfloat16),
        "label": jnp.asarray(rng.integers(0, 2, batch), jnp.int32),
    }
    model = build_model("ad", dim=128, depth=3, heads=4,
                        dtype=jnp.bfloat16, remat=remat)
    tx, _ = build_optimizer("Adam", 1e-4, steps_per_epoch=1)
    state = create_state(model, tx,
                         [b["MRI"][..., None], b["PET"][..., None]],
                         jax.random.key(0))
    step = make_train_step(("MRI", "PET"), adversarial=True,
                           aug_cfg=AugmentConfig())
    key = jax.random.key(1)
    for _ in range(2):
        state, aux = step(state, b, key)
    float(aux["loss"])
    t0 = time.perf_counter()
    n = 5
    for _ in range(n):
        state, aux = step(state, b, key)
    float(aux["loss"])
    dt = (time.perf_counter() - t0) / n
    print(f"fullres batch={batch} remat={int(remat)}: "
          f"{dt * 1e3:.1f} ms/step = {batch / dt:.2f} vols/s", flush=True)


if __name__ == "__main__":
    main()
