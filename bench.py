#!/usr/bin/env python
"""Benchmark harness: flagship training throughput on the current backend.

Prints ONE JSON line. The primary metric (unchanged since round 1 for
cross-round comparability) is MRI+PET volumes/sec/chip for a full ModelAd
training step (fwd+bwd+optimizer, batch 8, ADNI shape 91x109x91 — the
BASELINE.json north-star metric), measured with the legacy dispatch loop:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

vs_baseline divides by the PyTorch-CPU reference throughput measured by
scripts/measure_torch_baseline.py (recorded in BASELINE_MEASURED.json; the
reference repo publishes no numbers of its own — see BASELINE.md).

Extra fields report the axes the dispatch metric is blind to (each is
None if its measurement fails, e.g. during a tunnel outage):
  - trace_ms_per_step: device truth for the same step via the profiler's
    XLA Modules track (scripts/profile_step.py method).
  - achieved_tf_per_sec: XLA cost_analysis dense FLOPs of the compiled
    step divided by the device step time — the self-auditing "is this
    actually fast" number (vs_baseline alone compares against a 1-core
    CPU and is easy to inflate).
  - roofline_tf_per_sec / pct_of_roofline: the MEASURED bf16 matmul
    peak of THIS chip (8192^3 GEMM, slope-timed) and the step's
    percentage of it. The step cannot hit 100%: ~15% of its time is
    VPU/bandwidth-bound pooling/BN/layout work (docs/PERFORMANCE.md).
  - fullres_vols_per_sec: full-resolution 182x218x182 training at the
    measured batch-6 optimum (z-blocked banded stem + banded body
    convs; the round-4 f32-chain fixes freed the HBM that made batch 6
    fit remat-off).
  - cached_epoch_vols_per_sec: DELIVERED real-data throughput — wall
    epochs over decoded NIfTI files with the HBM-resident dataset cache
    (data/device_cache.py), the feed a user actually experiences.
  - stream_epoch_vols_per_sec: same epochs through the round-3 streaming
    host feed (DeviceFeed), for the A/B delta. Through the axon tunnel
    this is H2D-bandwidth-bound at ~40 MB/s (scripts/bench_feed.py
    measures the raw link; docs/PERFORMANCE.md "Streamed-feed ceiling").
  - hybrid_epoch_vols_per_sec: same epochs through the hot/cold HBM tier
    (HybridCachedFeed) at the documented ~89%-hot operating point — the
    over-HBM-budget/first-epoch story (docs/PERFORMANCE.md).
Skip knobs: BENCH_FULLRES=0, BENCH_CACHED=0.
"""

import json
import os
import time

BATCH = int(os.environ.get("BENCH_BATCH", 8))
SHAPE = (91, 109, 91)
FULLRES_SHAPE = (182, 218, 182)
FULLRES_BATCH = int(os.environ.get("BENCH_FULLRES_BATCH", 6))
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


def _build(batch_size, shape, remat=False):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from transmf_ad_tpu.data.transforms import AugmentConfig
    from transmf_ad_tpu.models import build_model
    from transmf_ad_tpu.train.optim import build_optimizer
    from transmf_ad_tpu.train.steps import create_state, make_train_step

    rng = np.random.default_rng(0)
    batch = {
        "MRI": jnp.asarray(rng.standard_normal((batch_size, *shape)),
                           jnp.bfloat16),
        "PET": jnp.asarray(rng.standard_normal((batch_size, *shape)),
                           jnp.bfloat16),
        "label": jnp.asarray(rng.integers(0, 2, batch_size), jnp.int32),
    }
    # bf16 activations/compute with f32 params: the TPU-idiomatic training
    # mode (halves step time vs f32; see docs/PERFORMANCE.md).
    model = build_model("ad", dim=128, depth=3, heads=4, dtype=jnp.bfloat16,
                        remat=remat)
    tx, _ = build_optimizer("Adam", 1e-4, steps_per_epoch=1)
    state = create_state(
        model, tx, [batch["MRI"][..., None], batch["PET"][..., None]],
        jax.random.key(0),
    )
    # Augmentation ON: the production training step. Device-side banded-
    # matmul augmentation adds ~1 ms, so this matches the aug-off
    # (torch-comparable) number within noise — see docs/PERFORMANCE.md.
    step = make_train_step(("MRI", "PET"), adversarial=True,
                           aug_cfg=AugmentConfig())
    return state, step, batch


def bench_legacy(state, step, batch):
    """Round-1 dispatch-loop metric (kept for cross-round comparability)."""
    import jax

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
    # the step donates its input state, so callers must use the returned
    # one — the original buffers are gone
    return BATCH / dt, state


def bench_trace(state, step, batch):
    """Device ms/step: profile 5 runs of the ALREADY-COMPILED step and read
    the XLA Modules track (the round-2/3 device-truth method). Deliberately
    not slope timing here: a full-train-step lax.scan is a fresh executable
    whose compile through the tunnel can exceed the whole bench budget."""
    import collections
    import glob
    import gzip
    import json
    import tempfile

    import jax

    key = jax.random.key(1)
    d = tempfile.mkdtemp(prefix="bench_trace_")
    with jax.profiler.trace(d):
        for _ in range(5):
            state, aux = step(state, batch, key)
        float(aux["loss"])
    paths = sorted(glob.glob(
        os.path.join(d, "plugins/profile/*/*.trace.json.gz")))
    evs = json.load(gzip.open(paths[-1]))["traceEvents"]
    tname = {}
    for e in evs:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tname[(e["pid"], e["tid"])] = e["args"]["name"]
    groups = collections.defaultdict(list)
    for e in evs:
        if (e.get("ph") == "X"
                and tname.get((e["pid"], e["tid"])) == "XLA Modules"):
            groups[e["name"]].append(e.get("dur", 0))
    if not groups:
        return None, state
    durs = max(groups.values(), key=sum)  # the train-step executable
    return sum(durs) / len(durs) / 1e3, state


def bench_fullres():
    """Full-resolution training at the measured batch optimum
    (docs/PERFORMANCE.md 'Full-resolution training')."""
    import jax

    state, step, batch = _build(FULLRES_BATCH, FULLRES_SHAPE, remat=False)
    key = jax.random.key(1)
    for _ in range(2):
        state, aux = step(state, batch, key)
    float(aux["loss"])
    t0 = time.perf_counter()
    n = 5
    for _ in range(n):
        state, aux = step(state, batch, key)
    float(aux["loss"])
    dt = (time.perf_counter() - t0) / n
    return FULLRES_BATCH / dt


def bench_epochs(state, step, time_left=lambda need: True):
    """Delivered real-data epochs: decoded NIfTI files -> HBM-cached vs
    streaming vs hybrid hot/cold feed, wall-clock volumes/s (median of 5
    epochs; 3 for the hybrid arm). The hybrid arm runs only if `time_left`
    says the full-res phase's reserve still fits afterwards."""
    import numpy as np

    import jax

    from transmf_ad_tpu.data.adni import ADNI
    from transmf_ad_tpu.data.device_cache import DeviceCachedFeed
    from transmf_ad_tpu.data.pipeline import DeviceFeed, Loader, VolumeSource
    from transmf_ad_tpu.data.synthetic import make_synthetic_adni

    root = os.environ.get("BENCH_ADNI_ROOT", "/tmp/bench_adni_full")
    if not os.path.isdir(os.path.join(root, "MRI")):
        make_synthetic_adni(root, n_per_group=28, shape=SHAPE, seed=0)
    recs = ADNI(root, "ADNI.csv", "ADCN").data_dict
    import jax.numpy as jnp

    src = VolumeSource(recs, dtype=jnp.bfloat16)
    loader = Loader(src, batch_size=BATCH, shuffle=True, drop_last=True,
                    seed=0)
    for i in range(len(src)):  # pre-fill RAM cache (decode excluded)
        src[i]
    key = jax.random.key(1)

    def run_epochs(feed, n_epochs=5):
        times = []
        for _ in range(n_epochs):
            t0 = time.perf_counter()
            n = 0
            for b in feed:
                b.pop("_n_real", None)  # host-only dispatch metadata
                state2, aux = step(_state[0], b, key)
                _state[0] = state2
                n += BATCH
            float(np.asarray(aux["loss"]))  # value-fetch sync
            times.append(time.perf_counter() - t0)
        return n / float(np.median(times))

    _state = [state]
    cached = run_epochs(DeviceCachedFeed(loader, mesh=None, pad_to=BATCH))
    streamed = run_epochs(DeviceFeed(loader, depth=2, pad_to=BATCH))
    # hybrid hot/cold tier at the documented ~89%-hot operating point
    # (budget forced below the dataset so the tier engages): per batch
    # only the cold rows cross the link (docs/PERFORMANCE.md). Skipped
    # (None) if running it would eat the full-res phase's 420 s reserve.
    hybrid = None
    if time_left(500):
        from transmf_ad_tpu.data.device_cache import (HybridCachedFeed,
                                                      cache_bytes)
        hybrid_feed = HybridCachedFeed(
            loader, pad_to=BATCH, budget=int(0.9 * cache_bytes(loader, None)))
        hybrid = run_epochs(hybrid_feed, n_epochs=3)
    return cached, streamed, hybrid


def _start_watchdog(budget: float, partial: dict):
    """The wall budget only guards phases that HAVEN'T started; a hung TPU
    tunnel (FAILED_PRECONDITION outages sometimes block instead of
    erroring) would stall the primary phase forever and the driver would
    get no JSON line at all. This timer guarantees one: past
    budget + grace it prints a line carrying every field measured SO FAR
    (phases stash results into `partial` as they complete, so a hang in
    an optional late phase no longer discards the primary metric) and
    hard-exits (os._exit: the main thread is stuck in a device wait)."""
    import threading

    def fire():
        line = {
            "metric": "model_ad_train_volumes_per_sec_per_chip",
            "value": None,
            "unit": "volumes/s",
            "vs_baseline": None,
        }
        line.update(partial)
        line["error"] = (f"bench exceeded {budget:.0f}s wall budget "
                         "(TPU tunnel outage?); reporting phases that "
                         "completed")
        print(json.dumps(line), flush=True)
        os._exit(2)

    t = threading.Timer(budget + 120, fire)
    t.daemon = True
    t.start()
    return t


def _step_flops(state, step, batch):
    """Dense-FLOP estimate of ONE compiled train step via XLA cost
    analysis (the executable is already in the jit cache, so lowering +
    compiling here is a cache hit, not a recompile)."""
    import jax

    key = jax.random.key(1)
    compiled = step.lower(state, batch, key).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):  # older jax returns [dict]
        cost = cost[0]
    return float(cost["flops"])


def bench_roofline():
    """Measured bf16 MXU peak of THIS chip: an 8192^3 GEMM inside one
    jitted lax.scan at two lengths (slope cancels dispatch/fetch
    overheads — scripts/_timing.py method)."""
    import jax
    import jax.numpy as jnp

    n = 8192
    a = jnp.ones((n, n), jnp.bfloat16)

    import functools

    @functools.partial(jax.jit, static_argnums=1)
    def run(x, steps):
        def body(c, _):
            c = jnp.tanh(c @ a)  # tanh blocks A*A^k strength reduction
            return c, ()
        c, _ = jax.lax.scan(body, x, (), length=steps)
        return jnp.float32(c.sum())

    x0 = jnp.ones((n, n), jnp.bfloat16)

    def timed(steps):
        t0 = time.perf_counter()
        float(run(x0, steps))
        return time.perf_counter() - t0

    timed(2)  # compile both lengths' shared executable? lengths differ ->
    timed(8)  # compile; then measure
    t2, t8 = timed(2), timed(8)
    dt = (t8 - t2) / 6
    return 2 * n**3 / dt / 1e12


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    t_start = time.perf_counter()
    # 1200s default: a fully cold compile cache (first run after a code
    # change) needs ~300s more than the warm-path 900s to fit the
    # full-res phase; the watchdog still guarantees the JSON line.
    budget = float(os.environ.get("BENCH_BUDGET_S", 1200))
    partial: dict = {}
    watchdog = _start_watchdog(budget, partial)

    def time_left(need):
        return (time.perf_counter() - t_start) < (budget - need)

    state, step, batch = _build(BATCH, SHAPE)
    vols_per_sec, state = bench_legacy(state, step, batch)
    base = _baseline_volumes_per_sec()
    vs = vols_per_sec / base if base == base else None  # NaN-safe
    partial["value"] = round(vols_per_sec, 3)
    partial["vs_baseline"] = round(vs, 2) if vs is not None else None

    # Extra phases run inside the remaining wall budget so the JSON line
    # ALWAYS prints (a phase that cannot fit is skipped -> null field);
    # each stashes its result into `partial` so a later hang still
    # reports everything measured so far (see _start_watchdog).
    trace_ms = fullres = cached = streamed = hybrid = None
    achieved_tf = roofline_tf = pct = None
    try:
        ms, state = bench_trace(state, step, batch)
        trace_ms = round(ms, 2) if ms is not None else None
        partial["trace_ms_per_step"] = trace_ms
    except Exception:
        pass
    try:
        # self-audit: dense FLOPs / device-step time vs the chip's own
        # measured matmul peak — "fast" falsifiable from this line alone
        flops = _step_flops(state, step, batch)
        step_s = (trace_ms / 1e3 if trace_ms else BATCH / vols_per_sec)
        achieved_tf = round(flops / step_s / 1e12, 1)
        roofline_tf = round(bench_roofline(), 1)
        pct = round(100 * achieved_tf / roofline_tf, 1)
        partial.update(achieved_tf_per_sec=achieved_tf,
                       roofline_tf_per_sec=roofline_tf,
                       pct_of_roofline=pct)
    except Exception:
        pass
    if os.environ.get("BENCH_CACHED", "1") != "0" and time_left(180):
        try:
            cached, streamed, hybrid = bench_epochs(state, step, time_left)
            cached, streamed = round(cached, 1), round(streamed, 1)
            hybrid = round(hybrid, 1) if hybrid is not None else None
            partial.update(cached_epoch_vols_per_sec=cached,
                           stream_epoch_vols_per_sec=streamed,
                           hybrid_epoch_vols_per_sec=hybrid)
        except Exception:
            pass
    # full-res last: its first compile is the most expensive (~2-5 min
    # through the tunnel; cached after)
    if os.environ.get("BENCH_FULLRES", "1") != "0" and time_left(420):
        try:
            fullres = round(bench_fullres(), 2)
            partial["fullres_vols_per_sec"] = fullres
        except Exception:
            pass

    watchdog.cancel()
    print(json.dumps({
        "metric": "model_ad_train_volumes_per_sec_per_chip",
        "value": round(vols_per_sec, 3),
        "unit": "volumes/s",
        "vs_baseline": round(vs, 2) if vs is not None else None,
        "trace_ms_per_step": trace_ms,
        "achieved_tf_per_sec": achieved_tf,
        "roofline_tf_per_sec": roofline_tf,
        "pct_of_roofline": pct,
        "fullres_vols_per_sec": fullres,
        "fullres_batch": FULLRES_BATCH,
        "cached_epoch_vols_per_sec": cached,
        "stream_epoch_vols_per_sec": streamed,
        "hybrid_epoch_vols_per_sec": hybrid,
    }))


if __name__ == "__main__":
    main()
