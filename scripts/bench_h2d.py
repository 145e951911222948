"""Attribute the streamed-epoch ceiling: framework pipeline vs raw link.

The round-4 verdict flagged `stream_epoch_vols_per_sec` (~13.6) at ~1/10
of the device rate. This script decides WHOSE ceiling that is:

 1. raw H2D link rate, synchronous (one transfer, value-fetch sync) and
    pipelined (many transfers in flight — what a double-buffered feed
    actually achieves), at batch-sized payloads;
 2. the real streamed epoch (VolumeSource -> Loader -> DeviceFeed ->
    production train step) and its implied bytes/s;
 3. feed efficiency = streamed bytes/s divided by the pipelined raw link
    rate. ~1.0 means the feed machinery fully overlaps host work and the
    LINK is the ceiling; << 1.0 means the framework is leaving link
    bandwidth on the table.

Run `JAX_PLATFORMS=cpu python scripts/bench_h2d.py` for the on-host
control: there "H2D" is a memcpy, so the same pipeline's epoch rate shows
the framework overhead floor with the link removed.

Findings live in docs/PERFORMANCE.md "Streamed-feed ceiling".
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    jax.config.update("jax_platforms", "cpu")  # CLAUDE.md: plugin rewrites env

import jax.numpy as jnp
import numpy as np

BATCH = int(os.environ.get("BENCH_BATCH", 8))
SHAPE = (91, 109, 91)


def _sync(x):
    return float(np.asarray(x).ravel()[0])  # value fetch (never block_until_ready)


def raw_link(payload_mb=29, n=6, pipelined=True):
    """MB/s for `n` transfers of one batch-sized payload."""
    bufs = [np.random.default_rng(i).standard_normal(
        int(payload_mb * 2**20 // 4)).astype(np.float32) for i in range(3)]
    _sync(jnp.asarray(bufs[0]))  # warm the path
    t0 = time.perf_counter()
    if pipelined:
        devs = [jnp.asarray(bufs[i % 3]) for i in range(n)]
        for d in devs:
            _sync(d)
    else:
        for i in range(n):
            _sync(jnp.asarray(bufs[i % 3]))
    dt = time.perf_counter() - t0
    return n * payload_mb / dt


def streamed_epoch(dtype, steps=True):
    """The real pipeline at `dtype`; returns (vols/s, bytes/s)."""
    from transmf_ad_tpu.data.adni import ADNI
    from transmf_ad_tpu.data.pipeline import DeviceFeed, Loader, VolumeSource
    from transmf_ad_tpu.data.synthetic import make_synthetic_adni
    from transmf_ad_tpu.data.transforms import AugmentConfig
    from transmf_ad_tpu.models import build_model
    from transmf_ad_tpu.train.optim import build_optimizer
    from transmf_ad_tpu.train.steps import (create_state, dequantize_input,
                                            make_train_step)

    root = os.environ.get("BENCH_ADNI_ROOT", "/tmp/bench_adni_full")
    if not os.path.isdir(os.path.join(root, "MRI")):
        make_synthetic_adni(root, n_per_group=28, shape=SHAPE, seed=0)
    recs = ADNI(root, "ADNI.csv", "ADCN").data_dict
    src = VolumeSource(recs, dtype=dtype)
    loader = Loader(src, batch_size=BATCH, shuffle=True, drop_last=True,
                    seed=0)
    for i in range(len(src)):  # pre-fill RAM cache (decode excluded)
        src[i]
    bytes_per_vol = int(np.prod(SHAPE)) * np.dtype(src.dtype).itemsize * 2

    on_tpu = jax.default_backend() == "tpu"
    model = build_model("ad", dim=128, depth=3, heads=4,
                        use_pallas=on_tpu,
                        dtype=jnp.bfloat16 if on_tpu else "float32")
    tx, _ = build_optimizer("Adam", 1e-4, 0.0, 1)
    sample = loader.peek()
    inputs = [dequantize_input(jnp.asarray(sample[k][..., None]))
              for k in ("MRI", "PET")]
    state = create_state(model, tx, inputs, jax.random.key(0))
    step = make_train_step(("MRI", "PET"), adversarial=True,
                           aug_cfg=AugmentConfig())

    @jax.jit
    def consume(batch):  # feed-only mode: touch every byte, no model
        return sum(jnp.sum(dequantize_input(batch[k]).astype(jnp.float32))
                   for k in ("MRI", "PET"))

    key = jax.random.key(1)
    times = []
    for ep in range(4):
        t0 = time.perf_counter()
        n = 0
        out = None
        for b in DeviceFeed(loader, depth=2, pad_to=BATCH):
            b.pop("_n_real", None)
            if steps:
                state, aux = step(state, b, key)
                out = aux["loss"]
            else:
                out = consume(b)
            n += BATCH
        _sync(out)
        dt = time.perf_counter() - t0
        if ep:  # epoch 0 = compile warmup
            times.append(dt)
    dt = float(np.median(times))
    return n / dt, n * bytes_per_vol / dt


def main():
    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")
    batch_mb = int(np.prod(SHAPE)) * 2 * BATCH * 2 / 2**20  # bf16 dual-mod

    sync_rate = raw_link(payload_mb=29, pipelined=False)
    pipe_rate = raw_link(payload_mb=29, pipelined=True)
    print(f"raw H2D link, batch-sized ({batch_mb:.0f} MB bf16 equivalent):")
    print(f"  synchronous: {sync_rate:.1f} MB/s")
    print(f"  pipelined:   {pipe_rate:.1f} MB/s")

    # on the CPU backend the model step is minutes — feed-only is the
    # control there (the link is a memcpy, so this measures pure feed
    # machinery overhead)
    with_steps = jax.default_backend() == "tpu" and not os.environ.get(
        "BENCH_H2D_FEED_ONLY")
    if with_steps:
        for dtype, name in ((jnp.bfloat16, "bfloat16"), (np.uint8, "uint8")):
            vps, bps = streamed_epoch(dtype, steps=True)
            eff = bps / 2**20 / pipe_rate
            print(f"streamed epoch ({name}, train steps): {vps:.1f} vols/s "
                  f"= {bps / 2**20:.1f} MB/s "
                  f"({100 * eff:.0f}% of pipelined link)")

    vps, bps = streamed_epoch(jnp.bfloat16, steps=False)
    print(f"feed-only epoch (bfloat16, no model): {vps:.1f} vols/s "
          f"= {bps / 2**20:.1f} MB/s")


if __name__ == "__main__":
    main()
