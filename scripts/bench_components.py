#!/usr/bin/env python
"""Per-component benchmarks on the current backend.

Times the hot pieces individually (sNet forward, stem/body conv kernels vs
XLA, fused attention vs XLA, full train step f32 vs bf16, host loader
throughput) and prints a table. Used to track kernel wins between rounds;
the headline number stays in bench.py.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(r):
    # Fetch ONE element (device-side slice): converting the full output to
    # numpy would drag GBs through the TPU tunnel and corrupt the timing.
    leaf = jax.tree_util.tree_leaves(r)[0]
    return float(leaf.ravel()[0])


def timeit(f, *a, n=10):
    _sync(f(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*a)
    _sync(r)
    return (time.perf_counter() - t0) / n


if __name__ == "__main__":
    import jax
    import jax.numpy as jnp

    from transmf_ad_tpu.models import build_model
    from transmf_ad_tpu.nn.blocks import SNet
    from transmf_ad_tpu.ops.flash_attention import (
        attention_reference, fused_attention)
    from transmf_ad_tpu.ops.stem import _conv_reference as stem_ref, stem_conv
    from transmf_ad_tpu.train.optim import build_optimizer
    from transmf_ad_tpu.train.steps import create_state, make_train_step

    rng = np.random.default_rng(0)
    B, SHAPE = 8, (91, 109, 91)
    on_tpu = jax.default_backend() == "tpu"
    rows = []

    # stem conv
    x = jnp.asarray(rng.standard_normal((B, *SHAPE)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 32)) * 0.1, jnp.bfloat16)
    rows.append(("stem_conv pallas", timeit(
        jax.jit(lambda x, w: stem_conv(x, w, on_tpu)), x, w)))
    rows.append(("stem_conv xla", timeit(
        jax.jit(lambda x, w: stem_ref(x, w)), x, w)))

    # body conv (stage 2a geometry) — XLA is the production path; the
    # Pallas body-conv kernel lost everywhere and was removed in round 3
    # (docs/PERFORMANCE.md "Reversed round-1 conclusions")
    xb = jnp.asarray(rng.standard_normal((B, 45, 54, 45, 32)), jnp.bfloat16)
    wb = jnp.asarray(rng.standard_normal((3, 3, 3, 32, 32)) * 0.05, jnp.bfloat16)
    rows.append(("body_conv 32->32 xla", timeit(
        jax.jit(lambda x, w: jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))), xb, wb)))

    # attention core (full-res token count)
    q = jnp.asarray(rng.standard_normal((B, 4, 1573, 32)), jnp.bfloat16)
    rows.append(("attention 1573tok pallas", timeit(
        jax.jit(lambda q: fused_attention(q, q, q, 32**-0.5, not on_tpu)), q)))
    rows.append(("attention 1573tok xla", timeit(
        jax.jit(lambda q: attention_reference(q, q, q, 32**-0.5)), q)))

    # sNet forward + full train step
    for dt, lbl in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        snet = SNet(128, dtype=dt)
        xs = jnp.asarray(rng.standard_normal((B, *SHAPE, 1)), jnp.float32)
        v = snet.init(jax.random.key(0), xs)
        rows.append((f"sNet fwd {lbl}", timeit(
            jax.jit(lambda v, x: snet.apply(v, x)), v, xs)))

        model = build_model("ad", dim=128, depth=3, heads=4, dtype=dt)
        tx, _ = build_optimizer("Adam", 1e-4, steps_per_epoch=1)
        batch = {
            "MRI": jnp.asarray(rng.standard_normal((B, *SHAPE)), jnp.float32),
            "PET": jnp.asarray(rng.standard_normal((B, *SHAPE)), jnp.float32),
            "label": jnp.asarray(rng.integers(0, 2, B), jnp.int32),
        }
        state = create_state(model, tx, [batch["MRI"][..., None],
                                         batch["PET"][..., None]],
                             jax.random.key(0))
        step = make_train_step(("MRI", "PET"), True, None)
        st, aux = step(state, batch, jax.random.key(1))
        _ = float(aux["loss"])
        t0 = time.perf_counter()
        for _ in range(10):
            st, aux = step(st, batch, jax.random.key(1))
        _ = float(aux["loss"])
        dtm = (time.perf_counter() - t0) / 10
        rows.append((f"train step {lbl}", dtm))
        rows.append((f"  -> volumes/s {lbl}", B / dtm))

    print(f"\nbackend: {jax.default_backend()}  batch: {B}  shape: {SHAPE}")
    for name, v in rows:
        unit = "" if "volumes" in name else " ms"
        val = v if "volumes" in name else v * 1e3
        print(f"{name:32s} {val:10.2f}{unit}")
