#!/usr/bin/env python
"""Ceiling checks on the live chip: dispatch-free op timing via lax.scan.

Times each op inside ONE jitted scan of ITERS steps (loop-carried epsilon
keeps XLA from hoisting the op), so per-dispatch tunnel latency is excluded.
Reports conv strategies per sNet stage, raw GEMMs at the im2col shapes, and
an HBM copy pass.
"""
import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

B = 8
ITERS = 30
ONLY = set(sys.argv[1:])  # e.g. "mem gemm conv" sections; empty = all


def want(section):
    return not ONLY or section in ONLY


def timed_scan(op, *args):
    """Time op(*args) inside one jit: scan ITERS times, loop-carried eps."""

    def make(n):
        @jax.jit
        def f(*a):
            def b(eps, _):
                out = op(a[0] + eps, *a[1:])
                # full-reduction carry: consumes EVERY output element so XLA
                # cannot slice the op down to one element inside the loop
                return (jnp.sum(jnp.asarray(out, jnp.float32)) * 1e-30
                        ).astype(a[0].dtype), None
            return jax.lax.scan(b, jnp.zeros((), a[0].dtype), None,
                                length=n)[0]
        return f

    # Slope timing: (t(4*ITERS) - t(ITERS)) / (3*ITERS) cancels the tunnel
    # round-trip (~27 ms) that otherwise swamps small ops.
    f1, f4 = make(ITERS), make(4 * ITERS)
    float(f1(*args)), float(f4(*args))  # compile+warm
    ts = []
    for f, n in [(f1, ITERS), (f4, 4 * ITERS)] * 2:
        t0 = time.perf_counter()
        float(f(*args))
        ts.append((time.perf_counter() - t0, n))
    t1 = min(t for t, n in ts if n == ITERS)
    t4 = min(t for t, n in ts if n == 4 * ITERS)
    return max((t4 - t1) / (3 * ITERS), 1e-9)


def conv3d(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def conv2d_folded(x, w3):
    b, X, Y, Z, ci = x.shape
    co = w3.shape[-1]
    xf = x.reshape(b * X, Y, Z, ci)
    us = [jax.lax.conv_general_dilated(
        xf, w3[dx], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")).reshape(b, X, Y, Z, co)
        for dx in range(3)]
    zrow = jnp.zeros_like(us[0][:, :1])
    return (jnp.concatenate([zrow, us[0][:, :-1]], 1) + us[1]
            + jnp.concatenate([us[2][:, 1:], zrow], 1))


def main():
    # the Pallas body-conv kernel was removed in round 3 (lost to XLA at
    # every body stage — docs/PERFORMANCE.md); its ceiling row is skipped
    _conv_pallas = None

    rng = np.random.default_rng(0)

    if want("mem"):
        print("== HBM bandwidth (copy+scale of 256 MB) ==")
        big = jnp.asarray(rng.standard_normal((128, 1024, 1024)),
                          jnp.bfloat16)
        dt = timed_scan(lambda a: a * 1.0001, big)
        gb = big.size * 2 * 2 / 1e9
        print(f"  {dt*1e3:.2f} ms  {gb/dt:.0f} GB/s", flush=True)

    gemms = [(874800, 288, 32), (874800, 288, 64), (104544, 576, 128),
             (12584, 1152, 256), (4096, 4096, 4096)]
    if not want("gemm"):
        gemms = []
    print("== raw GEMMs (im2col shapes) ==")
    for M, K, N in gemms:
        a = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
        bm = jnp.asarray(rng.standard_normal((K, N)), jnp.bfloat16)
        dt = timed_scan(lambda p, q: p @ q, a, bm)
        gf = 2 * M * K * N / 1e9
        print(f"  M={M:7d} K={K:4d} N={N:4d}  {dt*1e3:7.2f} ms "
              f"{gf/dt/1e3:6.1f} TF/s", flush=True)

    print("== conv stages (scan-timed) ==")
    stages = [("s2a", (45, 54, 45), 32, 32), ("s2b", (45, 54, 45), 32, 64),
              ("s3a", (22, 27, 22), 64, 64), ("s3b", (22, 27, 22), 64, 128),
              ("s4a", (11, 13, 11), 128, 256)]
    if not want("conv"):
        stages = []
    for name, (X, Y, Z), ci, co in stages:
        x = jnp.asarray(rng.standard_normal((B, X, Y, Z, ci)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((3, 3, 3, ci, co)) * .05,
                        jnp.bfloat16)
        gf = 2 * 27 * ci * co * B * X * Y * Z / 1e9
        for label, fn in [("xla3d", conv3d), ("dx3", conv2d_folded),
                          *([("pallas", _conv_pallas)]
                            if _conv_pallas else [])]:
            dt = timed_scan(fn, x, w)
            print(f"  {name} {label:7s} {dt*1e3:7.2f} ms  "
                  f"{gf/dt/1e3:6.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()
