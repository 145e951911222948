#!/usr/bin/env python
"""Full-train-step breakdown with tunnel-immune scan-slope timing.

Variants isolate where the step time goes: augmentation, forward (train /
eval), backward+optimizer, stem kernel on/off, body pallas on/off. This is
the measurement that kernel go/no-go decisions use (CLAUDE.md: full-step
A/B, not standalone micro-benchmarks).
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from scripts._timing import scan_slope_time, scan_slope_time_state

from transmf_ad_tpu.data.transforms import AugmentConfig, augment
from transmf_ad_tpu.models import build_model
from transmf_ad_tpu.train.optim import build_optimizer
from transmf_ad_tpu.train.steps import create_state, make_train_step

B, SHAPE = 8, (91, 109, 91)
ONLY = set(sys.argv[1:])


def want(s):
    return not ONLY or s in ONLY


def main():
    rng = np.random.default_rng(0)
    batch = {
        "MRI": jnp.asarray(rng.standard_normal((B, *SHAPE)), jnp.float32),
        "PET": jnp.asarray(rng.standard_normal((B, *SHAPE)), jnp.float32),
        "label": jnp.asarray(rng.integers(0, 2, B), jnp.int32),
    }
    key = jax.random.key(1)

    def make_state(**kw):
        model = build_model("ad", dim=128, depth=3, heads=4,
                            dtype=jnp.bfloat16, **kw)
        tx, _ = build_optimizer("Adam", 1e-4, steps_per_epoch=1)
        return model, create_state(
            model, tx, [batch["MRI"][..., None], batch["PET"][..., None]],
            jax.random.key(0))

    results = []

    if want("step"):
        model, state = make_state()
        step_aug = make_train_step(("MRI", "PET"), adversarial=True,
                                   aug_cfg=AugmentConfig(), donate=False)
        dt = scan_slope_time_state(
            lambda st, b: step_aug(st, b, key), state, batch, iters=10)
        results.append(("train step (prod, aug on)", dt))

        step_noaug = make_train_step(("MRI", "PET"), adversarial=True,
                                     aug_cfg=None, donate=False)
        dt = scan_slope_time_state(
            lambda st, b: step_noaug(st, b, key), state, batch, iters=10)
        results.append(("train step (aug off)", dt))

    if want("fwd"):
        model, state = make_state()
        mri = batch["MRI"][..., None].astype(jnp.bfloat16)
        pet = batch["PET"][..., None].astype(jnp.bfloat16)

        def fwd_train(m, p):
            out, upd = state.apply_fn(
                {"params": state.params, "batch_stats": state.batch_stats},
                m, p, train=True, rngs={"dropout": jax.random.key(2)},
                mutable=["batch_stats"])
            return out, upd

        dt = scan_slope_time(fwd_train, mri, pet, iters=20)
        results.append(("forward train (BN stats)", dt))

        def fwd_eval(m, p):
            return state.apply_fn(
                {"params": state.params, "batch_stats": state.batch_stats},
                m, p, train=False)

        dt = scan_slope_time(fwd_eval, mri, pet, iters=20)
        results.append(("forward eval", dt))

    if want("stem"):
        for flag, label in [(False, "stem+body XLA (use_pallas=False)"),
                            (None, "auto kernels (default)")]:
            model, state = make_state(use_pallas=flag)
            step = make_train_step(("MRI", "PET"), adversarial=True,
                                   aug_cfg=AugmentConfig(), donate=False)
            dt = scan_slope_time_state(
                lambda st, b: step(st, b, key), state, batch, iters=10)
            results.append((label, dt))

    if want("aug"):
        vol = batch["MRI"]
        keys = jax.random.split(key, B)
        cfg = AugmentConfig()
        dt = scan_slope_time(
            lambda v: jax.vmap(lambda a, k: augment(a, k, cfg))(v, keys),
            vol, iters=20)
        results.append(("augment one modality (B=8)", dt))

    print(f"\n{'variant':40s} {'ms':>8s}  vols/s")
    for label, dt in results:
        print(f"{label:40s} {dt*1e3:8.2f}  {B/dt:6.1f}", flush=True)


if __name__ == "__main__":
    main()
