"""Profile the FULL-RESOLUTION (182x218x182, batch 2, remat) production
train step on the TPU; parse with scripts/parse_trace.py.

The resolution-scaling capability measurement (docs/PERFORMANCE.md
"Full-resolution training"): run, then
    python scripts/parse_trace.py /tmp/fullres_profile --ops 30
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
from transmf_ad_tpu.data.transforms import AugmentConfig
from transmf_ad_tpu.models import build_model
from transmf_ad_tpu.train.optim import build_optimizer
from transmf_ad_tpu.train.steps import create_state, make_train_step

B, SHAPE = int(os.environ.get("FULLRES_B", 2)), (182, 218, 182)
REMAT = os.environ.get("FULLRES_REMAT", "1") == "1"
OUT = "/tmp/fullres_profile"
rng = np.random.default_rng(0)
batch = {
    "MRI": jnp.asarray(rng.standard_normal((B, *SHAPE)), jnp.bfloat16),
    "PET": jnp.asarray(rng.standard_normal((B, *SHAPE)), jnp.bfloat16),
    "label": jnp.asarray(rng.integers(0, 2, B), jnp.int32),
}
model = build_model("ad", dim=128, depth=3, heads=4, dtype=jnp.bfloat16,
                    remat=REMAT)
tx, _ = build_optimizer("Adam", 1e-4, steps_per_epoch=1)
state = create_state(model, tx,
                     [batch["MRI"][..., None], batch["PET"][..., None]],
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
