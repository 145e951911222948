"""A/B the host->device feed dtype (float32 vs bfloat16 volumes).

The production epoch loop is transfer-bound once device steps are ~60 ms:
a batch-8 dual-modality batch is 57.8 MB in float32 but 28.9 MB in
bfloat16 (the compute dtype — the model casts at the stem anyway).
This drives the REAL pipeline (`VolumeSource` -> `Loader` ->
`DeviceFeed` -> jitted production train step) at both dtypes, several
alternating rounds to average out tunnel/bandwidth weather, and reports
wall-clock epoch time + volumes/s for each.

Run on the TPU host: `python scripts/bench_feed.py [dataroot]`.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from transmf_ad_tpu.data.adni import ADNI
from transmf_ad_tpu.data.pipeline import DeviceFeed, Loader, VolumeSource
from transmf_ad_tpu.data.transforms import AugmentConfig
from transmf_ad_tpu.models import build_model
from transmf_ad_tpu.train.optim import build_optimizer
from transmf_ad_tpu.train.steps import create_state, make_train_step

ROOT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/adni_full"
BATCH = 8
ROUNDS = 4


def build(dtype):
    recs = ADNI(ROOT, "ADNI.csv", "ADCN").data_dict
    src = VolumeSource(recs, dtype=dtype)
    loader = Loader(src, batch_size=BATCH, shuffle=True, drop_last=True,
                    seed=0)
    # pre-fill the RAM cache so decode cost is excluded (steady-state epochs)
    for i in range(len(src)):
        src[i]
    return loader


def run_epoch(loader, state, step, rng):
    t0 = time.perf_counter()
    n = 0
    for batch in DeviceFeed(loader, depth=2, pad_to=BATCH):
        batch.pop("_n_real", None)  # host-only dispatch metadata
        state, aux = step(state, batch, rng)
        n += BATCH
    # sync: value fetch (never block_until_ready through the tunnel)
    float(np.asarray(aux["loss"]))
    dt = time.perf_counter() - t0
    return state, dt, n


def main():
    model = build_model("ad", dim=128, depth=3, heads=4, use_pallas=True,
                        dtype=jnp.bfloat16)
    tx, _ = build_optimizer("Adam", 1e-4, 0.0, 1)
    l32 = build(np.float32)
    l16 = build(jnp.bfloat16)
    sample = l16.peek()
    inputs = [jnp.asarray(sample[k][..., None]) for k in ("MRI", "PET")]
    state = create_state(model, tx, inputs, jax.random.key(0))
    step = make_train_step(("MRI", "PET"), adversarial=True,
                          aug_cfg=AugmentConfig(), donate=False)
    rng = jax.random.key(1)

    # compile once per input dtype
    for l in (l16, l32):
        state, dt, _ = run_epoch(l, state, step, rng)
        print(f"warmup ({l.source.dtype}): {dt:.1f}s")

    times = {"float32": [], "bfloat16": []}
    for r in range(ROUNDS):
        for name, l in (("float32", l32), ("bfloat16", l16)):
            state, dt, n = run_epoch(l, state, step, rng)
            times[name].append(dt)
            print(f"round {r} {name}: {dt:.2f}s  ({n / dt:.1f} vols/s)")

    for name, ts in times.items():
        ts = np.array(ts)
        n = (len(l32.indices) // BATCH) * BATCH
        print(f"{name}: median {np.median(ts):.2f}s  "
              f"({n / np.median(ts):.1f} vols/s)  all={np.round(ts, 2)}")


if __name__ == "__main__":
    main()
