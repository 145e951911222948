"""Epoch cost of --aug_exact (exact-MONAI host augmentation).

aug_exact moves augmentation from the fused device resample (inside the
train step, ~1 ms) to a per-sample host pipeline (data/exact_monai.py),
which forces a float32 SOURCE cache and streaming (host batches change
every epoch, so the HBM dataset cache is off). This measures what that
costs where, on real hardware:

 1. production: device augmentation + HBM-cached epochs;
 2. device augmentation + streamed bf16 epochs (cache off control);
 3. aug_exact streamed epochs, bf16 post-transform transfer (the default
    under bf16 compute since round 5 — the exact math runs f32, the
    TRANSFER is cast after);
 4. the host transform alone, sec/volume (1-core: is the pipeline
    transform-bound or transfer-bound?).

Numbers go to docs/PERFORMANCE.md "Exact-MONAI augmentation cost".
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

BATCH = 8
SHAPE = (91, 109, 91)
EPOCHS = 3


def main():
    from transmf_ad_tpu.data.adni import ADNI
    from transmf_ad_tpu.data.exact_monai import make_sample_transform
    from transmf_ad_tpu.data.pipeline import DeviceFeed, Loader, VolumeSource
    from transmf_ad_tpu.data.synthetic import make_synthetic_adni
    from transmf_ad_tpu.data.transforms import AugmentConfig
    from transmf_ad_tpu.models import build_model
    from transmf_ad_tpu.train.optim import build_optimizer
    from transmf_ad_tpu.train.steps import create_state, make_train_step
    from transmf_ad_tpu.train.trainer import _cast_after_transform

    root = os.environ.get("BENCH_ADNI_ROOT", "/tmp/bench_adni_full")
    if not os.path.isdir(os.path.join(root, "MRI")):
        make_synthetic_adni(root, n_per_group=28, shape=SHAPE, seed=0)
    recs = ADNI(root, "ADNI.csv", "ADCN").data_dict

    model = build_model("ad", dim=128, depth=3, heads=4, dtype=jnp.bfloat16)
    tx, _ = build_optimizer("Adam", 1e-4, 0.0, 1)

    def feeds():
        src16 = VolumeSource(recs, dtype=jnp.bfloat16)
        src32 = VolumeSource(recs, dtype=np.float32)
        for s in (src16, src32):
            for i in range(len(s)):
                s[i]  # pre-fill RAM caches: decode excluded everywhere
        l_dev = Loader(src16, batch_size=BATCH, shuffle=True,
                       drop_last=True, seed=0)
        from transmf_ad_tpu.data.device_cache import DeviceCachedFeed

        st = _cast_after_transform(
            make_sample_transform(7, AugmentConfig()), ("MRI", "PET"),
            jnp.bfloat16)
        l_exact = Loader(src32, batch_size=BATCH, shuffle=True,
                         drop_last=True, seed=0, sample_transform=st)
        return [
            ("device-aug + HBM cache", DeviceCachedFeed(
                Loader(src16, batch_size=BATCH, shuffle=True,
                       drop_last=True, seed=0), pad_to=BATCH), True),
            ("device-aug + stream bf16", DeviceFeed(l_dev, depth=2,
                                                    pad_to=BATCH), True),
            ("aug_exact + stream (bf16 cast)", DeviceFeed(
                l_exact, depth=2, pad_to=BATCH), False),
        ]

    arms = feeds()
    sample = arms[0][1].peek()
    inputs = [jnp.asarray(np.asarray(sample[k])[..., None],
                          jnp.bfloat16) for k in ("MRI", "PET")]
    state = create_state(model, tx, inputs, jax.random.key(0))
    step_aug = make_train_step(("MRI", "PET"), adversarial=True,
                               aug_cfg=AugmentConfig(), donate=False)
    step_noaug = make_train_step(("MRI", "PET"), adversarial=True,
                                 aug_cfg=None, donate=False)
    key = jax.random.key(1)

    for name, feed, device_aug in arms:
        step = step_aug if device_aug else step_noaug
        times = []
        for ep in range(EPOCHS + 1):
            t0 = time.perf_counter()
            n = 0
            for b in feed:
                b.pop("_n_real", None)
                # feeds deliver DEVICE arrays already in the feed dtype
                # (bf16 here; the exact arm casts post-transform) — any
                # np.asarray here would round-trip every batch D2H+H2D
                # through the tunnel and poison all three arms ~10x.
                _, aux = step(state, b, key)
                n += BATCH
            float(np.asarray(aux["loss"]))
            if ep:  # epoch 0 warms compiles / cache fill
                times.append(time.perf_counter() - t0)
        dt = float(np.median(times))
        print(f"{name}: {n / dt:.1f} vols/s  ({dt:.2f} s/epoch)", flush=True)

    # host transform alone (1 core)
    src = VolumeSource(recs[:8], dtype=np.float32)
    st = make_sample_transform(7, AugmentConfig())
    items = [src[i] for i in range(8)]
    t0 = time.perf_counter()
    for it in items:
        st(it)
    dt = (time.perf_counter() - t0) / len(items)
    print(f"host exact-MONAI transform alone: {dt * 1e3:.0f} ms/volume-pair "
          f"({1 / dt:.1f} samples/s -> {2 / dt:.1f} vols/s ceiling)")


if __name__ == "__main__":
    main()
