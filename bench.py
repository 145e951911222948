#!/usr/bin/env python
"""Benchmark harness: flagship training throughput on the current backend.

Measures MRI+PET volumes/sec/chip for a full ModelAd training step (fwd+bwd+
optimizer, batch 8, ADNI shape 91x109x91 — the BASELINE.json north-star
metric) and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline divides by the PyTorch-CPU reference throughput measured by
scripts/measure_torch_baseline.py (recorded in BASELINE_MEASURED.json; the
reference repo publishes no numbers of its own — see BASELINE.md).
"""

import json
import os
import time

BATCH = int(os.environ.get("BENCH_BATCH", 8))
SHAPE = (91, 109, 91)
WARMUP = int(os.environ.get("BENCH_WARMUP", 3))
ITERS = int(os.environ.get("BENCH_ITERS", 10))


def _baseline_volumes_per_sec() -> float:
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BASELINE_MEASURED.json")
    try:
        with open(path) as f:
            rec = json.load(f)
        return float(rec["torch_cpu_model_ad_batch8"]["volumes_per_sec"])
    except Exception:
        return float("nan")


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from transmf_ad_tpu.models import build_model
    from transmf_ad_tpu.train.optim import build_optimizer
    from transmf_ad_tpu.train.steps import create_state, make_train_step

    rng = np.random.default_rng(0)
    batch = {
        "MRI": jnp.asarray(rng.standard_normal((BATCH, *SHAPE)), jnp.float32),
        "PET": jnp.asarray(rng.standard_normal((BATCH, *SHAPE)), jnp.float32),
        "label": jnp.asarray(rng.integers(0, 2, BATCH), jnp.int32),
    }
    # bf16 activations/compute with f32 params: the TPU-idiomatic training
    # mode (halves step time vs f32; see docs/PERFORMANCE.md).
    model = build_model("ad", dim=128, depth=3, heads=4, dtype=jnp.bfloat16)
    tx, _ = build_optimizer("Adam", 1e-4, steps_per_epoch=1)
    state = create_state(
        model, tx, [batch["MRI"][..., None], batch["PET"][..., None]],
        jax.random.key(0),
    )
    # Augmentation ON: the production training step. Device-side banded-
    # matmul augmentation adds ~1 ms, so this matches the aug-off
    # (torch-comparable) number within noise — see docs/PERFORMANCE.md.
    from transmf_ad_tpu.data.transforms import AugmentConfig

    step = make_train_step(("MRI", "PET"), adversarial=True,
                           aug_cfg=AugmentConfig())
    key = jax.random.key(1)

    for _ in range(WARMUP):
        state, aux = step(state, batch, key)
    float(aux["loss"])  # full value fetch: reliable sync on all platforms

    # BENCH_PROFILE_DIR: capture a device trace of the SAME cached
    # executable the timing loop runs (profiling does not change the
    # program, so this works even when the remote-compile helper is down)
    prof = os.environ.get("BENCH_PROFILE_DIR")
    if prof:
        jax.profiler.start_trace(prof)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, aux = step(state, batch, key)
    float(aux["loss"])
    dt = (time.perf_counter() - t0) / ITERS
    if prof:
        jax.profiler.stop_trace()

    vols_per_sec = BATCH / dt
    base = _baseline_volumes_per_sec()
    vs = vols_per_sec / base if base == base else None  # NaN-safe
    print(json.dumps({
        "metric": "model_ad_train_volumes_per_sec_per_chip",
        "value": round(vols_per_sec, 3),
        "unit": "volumes/s",
        "vs_baseline": round(vs, 2) if vs is not None else None,
    }))


if __name__ == "__main__":
    main()
