"""On-chip A/B of the hybrid HBM cache tier vs pure streaming.

Same real pipeline as scripts/bench_h2d.py (RAM cache pre-filled, real
train steps), with the HBM budget FORCED to a fraction of the dataset so
the hybrid tier actually engages: delivered epoch vols/s for
 - pure streaming (DeviceFeed),
 - hybrid at ~50% hot,
 - hybrid at ~90% hot.
On a transfer-bound link, hybrid at hot fraction f should deliver
~1/(1-f) of the streaming rate (capped by the device step rate).

Numbers go to docs/PERFORMANCE.md "Streamed-feed ceiling".
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

BATCH = int(os.environ.get("HYB_BATCH", 8))
SHAPE = tuple(int(x) for x in os.environ.get("HYB_SHAPE", "91,109,91").split(","))
EPOCHS = int(os.environ.get("HYB_EPOCHS", 4))
N_PER_GROUP = int(os.environ.get("HYB_N", 28))
DTYPE = os.environ.get("HYB_DTYPE", "bf16")  # bf16 | uint8
FRACS = tuple(float(f) for f in os.environ.get("HYB_FRACS", "0.5,0.9").split(","))


def main():
    from transmf_ad_tpu.data.adni import ADNI
    from transmf_ad_tpu.data.device_cache import HybridCachedFeed
    from transmf_ad_tpu.data.pipeline import DeviceFeed, Loader, VolumeSource
    from transmf_ad_tpu.data.synthetic import make_synthetic_adni
    from transmf_ad_tpu.data.transforms import AugmentConfig
    from transmf_ad_tpu.models import build_model
    from transmf_ad_tpu.train.optim import build_optimizer
    from transmf_ad_tpu.train.steps import create_state, make_train_step

    shp = "x".join(str(s) for s in SHAPE)
    root = os.environ.get("BENCH_ADNI_ROOT",
                          f"/tmp/bench_adni_hyb_{shp}_{N_PER_GROUP}")
    if not os.path.isdir(os.path.join(root, "MRI")):
        make_synthetic_adni(root, n_per_group=N_PER_GROUP, shape=SHAPE, seed=0)
    recs = ADNI(root, "ADNI.csv", "ADCN").data_dict
    dt = np.uint8 if DTYPE == "uint8" else jnp.bfloat16
    src = VolumeSource(recs, dtype=dt)
    for i in range(len(src)):
        src[i]
    n = len(src)
    itemsize = 1 if DTYPE == "uint8" else 2
    row_bytes = int(np.prod(SHAPE)) * itemsize * 2  # MRI+PET

    model = build_model("ad", dim=128, depth=3, heads=4, dtype=jnp.bfloat16)
    tx, _ = build_optimizer("Adam", 1e-4, 0.0, 1)
    loader0 = Loader(src, batch_size=BATCH, shuffle=True, drop_last=True,
                     seed=0)
    sample = loader0.peek()
    inputs = [jnp.asarray(sample[k][..., None]) for k in ("MRI", "PET")]
    state = create_state(model, tx, inputs, jax.random.key(0))
    step = make_train_step(("MRI", "PET"), adversarial=True,
                           aug_cfg=AugmentConfig(), donate=False)
    key = jax.random.key(1)

    def arm(name, feed):
        times = []
        for ep in range(EPOCHS + 1):
            t0 = time.perf_counter()
            m = 0
            for b in feed:
                b.pop("_n_real", None)
                _, aux = step(state, b, key)
                m += BATCH
            float(np.asarray(aux["loss"]))
            if ep:
                times.append(time.perf_counter() - t0)
        dt = float(np.median(times))
        print(f"{name}: {m / dt:.1f} vols/s ({dt:.2f} s/epoch)", flush=True)

    def fresh_loader():
        return Loader(src, batch_size=BATCH, shuffle=True, drop_last=True,
                      seed=0)

    print(f"shape={SHAPE} dtype={DTYPE} n={n} batch={BATCH} "
          f"row={row_bytes / 1e6:.1f} MB", flush=True)
    arm("stream (DeviceFeed)", DeviceFeed(fresh_loader(), depth=2,
                                          pad_to=BATCH))
    for frac in FRACS:
        hot = int(n * frac)
        h = HybridCachedFeed(fresh_loader(), pad_to=BATCH,
                             budget=hot * row_bytes)
        arm(f"hybrid {100 * h.hot_fraction:.0f}% hot", h)


if __name__ == "__main__":
    main()
