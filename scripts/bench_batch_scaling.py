#!/usr/bin/env python
"""Batch-scaling of the production train step.

Replaces round 1's "flat at batch 16" claim (measured with the discredited
per-dispatch method on SMALL ops; see docs/PERFORMANCE.md "Measurement
discipline"). Methodology here: one dispatch-loop measurement per
(batch, remat) config — at full-step granularity (tens of ms) the tunnel
dispatch overhead is a few percent — with an optional per-config device
trace (BENCH_PROFILE_DIR=<dir>) whose `jit_step` total divided by
iterations is the exact device ms/step. Slope timing was tried first but
needs two full scan compiles per config (~hours through the tunnel).

Usage:
    python scripts/bench_batch_scaling.py [batch[:remat] ...]  # default:
        8 16 16:remat 32:remat
     BENCH_PROFILE_DIR to also capture device traces (one subdir per cfg).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from transmf_ad_tpu.data.transforms import AugmentConfig  # noqa: E402
from transmf_ad_tpu.models import build_model  # noqa: E402
from transmf_ad_tpu.train.optim import build_optimizer  # noqa: E402
from transmf_ad_tpu.train.steps import create_state, make_train_step  # noqa: E402

SHAPE = (91, 109, 91)
WARMUP, ITERS = 3, 10


def measure(batch_size: int, remat: bool, trace_dir=None):
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
                           aug_cfg=AugmentConfig())
    key = jax.random.key(1)
    for _ in range(WARMUP):
        state, aux = step(state, batch, key)
    float(aux["loss"])
    if trace_dir:
        jax.profiler.start_trace(trace_dir)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, aux = step(state, batch, key)
    float(aux["loss"])
    dt = (time.perf_counter() - t0) / ITERS
    if trace_dir:
        jax.profiler.stop_trace()
    return dt


def main():
    specs = sys.argv[1:] or ["8", "16", "16:remat", "32:remat"]
    prof = os.environ.get("BENCH_PROFILE_DIR")
    print(f"# backend={jax.default_backend()}; dispatch-loop ms/step "
          f"(device truth: parse the trace when BENCH_PROFILE_DIR set)")
    print(f"{'batch':>6} {'remat':>6} {'ms/step':>9} {'vols/s':>8}")
    for spec in specs:
        parts = spec.split(":")
        b, remat = int(parts[0]), "remat" in parts[1:]
        tdir = os.path.join(prof, f"b{b}_remat{int(remat)}") if prof else None
        try:
            dt = measure(b, remat, tdir)
            print(f"{b:6d} {str(remat):>6} {dt * 1e3:9.2f} {b / dt:8.1f}",
                  flush=True)
        except Exception as e:
            msg = str(e).split("\n")[0][:70]
            print(f"{b:6d} {str(remat):>6}   FAILED: {msg}", flush=True)


if __name__ == "__main__":
    main()
