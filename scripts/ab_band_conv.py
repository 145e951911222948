"""A/B the banded body conv (ops/band_conv.py, TRANSMF_BAND_CONV).

Three levels, per the measurement discipline (CLAUDE.md):
  kernel  — slope-time ONE conv instance (band vs XLA) at a given
            geometry: `python scripts/ab_band_conv.py kernel B X Y Z ci co`
  step    — full train-step dispatch timing (value-fetch sync) at crop or
            full resolution: `python scripts/ab_band_conv.py step
            [crop|fullres] [batch]`. Run each arm in its OWN process
            (the flag is read at trace time): TRANSMF_BAND_CONV=0 (off) /
            unset (production default: >= 400k-voxel stages) /
            'all' (force every fitting stage, ignores the threshold).
  trace   — same step under jax.profiler.trace for per-op device truth:
            `python scripts/ab_band_conv.py trace [crop|fullres] [batch]
            /tmp/band_trace_on`; parse with scripts/parse_trace.py.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")


def _sync(x):
    return float(np.asarray(x).ravel()[0])


def kernel_ab(B, X, Y, Z, ci, co):
    from scripts._timing import scan_slope_time

    from transmf_ad_tpu.ops.band_conv import band_conv3d, pick_tz_body

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, X, Y, Z, ci)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, ci, co)) * 0.1,
                    jnp.bfloat16)
    flops = 2 * 27 * B * X * Y * Z * ci * co

    def mk(use_pallas, train):
        if train:
            def f(x):
                def loss(x, w):
                    y = band_conv3d(x, w, use_pallas).astype(jnp.float32)
                    # data-dependent cotangent (gy = 2y): a constant gy
                    # lets XLA constant-fold its dx/dw into box sums,
                    # which no real training backward resembles
                    return jnp.sum(y * y)
                gx, gw = jax.grad(loss, argnums=(0, 1))(x, w)
                return gx + 0 * jnp.sum(gw).astype(gx.dtype)
            return f
        return lambda x: band_conv3d(x, w, use_pallas)

    print(f"# ({B},{X},{Y},{Z}) {ci}->{co}  tz={pick_tz_body(Z, co)}  "
          f"dense fwd GFLOP={flops / 1e9:.1f}")
    for train in (False, True):
        mult = 3 if train else 1  # fwd / fwd+dx+dw
        for name, up in (("band", True), ("xla ", False)):
            sec = scan_slope_time(mk(up, train), x, iters=8, reps=2)
            tf = mult * flops / sec / 1e12
            print(f"  {'train' if train else 'fwd  '} {name}: "
                  f"{sec * 1e3:8.3f} ms  {tf:6.1f} TF/s(dense)")


def build_step(res, batch):
    from transmf_ad_tpu.data.transforms import AugmentConfig
    from transmf_ad_tpu.models import build_model
    from transmf_ad_tpu.train.optim import build_optimizer
    from transmf_ad_tpu.train.steps import create_state, make_train_step

    shape = (182, 218, 182) if res == "fullres" else (91, 109, 91)
    rng = np.random.default_rng(0)
    b = {
        "MRI": jnp.asarray(rng.standard_normal((batch, *shape)),
                           jnp.bfloat16),
        "PET": jnp.asarray(rng.standard_normal((batch, *shape)),
                           jnp.bfloat16),
        "label": jnp.asarray(rng.integers(0, 2, batch), jnp.int32),
    }
    model = build_model("ad", dim=128, depth=3, heads=4, dtype=jnp.bfloat16)
    tx, _ = build_optimizer("Adam", 1e-4, steps_per_epoch=1)
    state = create_state(model, tx,
                         [b["MRI"][..., None], b["PET"][..., None]],
                         jax.random.key(0))
    step = make_train_step(("MRI", "PET"), adversarial=True,
                           aug_cfg=AugmentConfig(), donate=False)
    return state, step, b


def step_ab(res, batch, trace_dir=None):
    arm = os.environ.get("TRANSMF_BAND_CONV", "auto(>=400k vox)")
    state, step, b = build_step(res, batch)
    key = jax.random.key(1)
    for _ in range(3):
        state, aux = step(state, b, key)
    _sync(aux["loss"])
    n = 5
    if trace_dir:
        with jax.profiler.trace(trace_dir):
            for _ in range(n):
                state, aux = step(state, b, key)
            _sync(aux["loss"])
        print(f"band={arm} {res} b={batch}: trace written to {trace_dir}")
    t0 = time.perf_counter()
    for _ in range(n):
        state, aux = step(state, b, key)
    _sync(aux["loss"])
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"band={arm} {res} b={batch}: {dt:.1f} ms/step dispatch "
          f"({batch / dt * 1e3:.1f} vols/s) loss={_sync(aux['loss']):.4f}")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "kernel"
    if mode == "kernel":
        args = [int(a) for a in sys.argv[2:]] or [4, 91, 109, 91, 32, 64]
        kernel_ab(*args)
    else:
        res = sys.argv[2] if len(sys.argv) > 2 else "fullres"
        batch = int(sys.argv[3]) if len(sys.argv) > 3 else (
            4 if res == "fullres" else 8)
        step_ab(res, batch, sys.argv[4] if len(sys.argv) > 4 else None)
