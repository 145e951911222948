"""Tunnel-immune device timing helpers.

The axon TPU tunnel adds a ~27 ms round-trip to every synchronous fetch and
several ms to each async dispatch, so per-dispatch timing over-reports small
ops ~10x. These helpers time ops INSIDE one jitted `lax.scan` and use slope
timing (t(4n) - t(n)) / 3n so both the round-trip and the scan prologue
cancel. The scan carry consumes a FULL reduction of every output so XLA
cannot dead-code-eliminate or slice the op inside the loop.
"""
import time

import jax
import jax.numpy as jnp


def _consume(out):
    """Reduce an arbitrary pytree to one f32 scalar consuming every leaf."""
    leaves = [jnp.sum(jnp.asarray(l, jnp.float32))
              for l in jax.tree_util.tree_leaves(out)
              if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.number)]
    return sum(leaves) if leaves else jnp.float32(0)


def scan_slope_time(op, *args, iters=30, reps=2):
    """Device seconds per op(*args) call, excluding dispatch/fetch overhead.

    op's first argument is perturbed by a loop-carried epsilon (~1e-30) to
    keep iterations data-dependent; its full output is reduced into the
    carry so every element is computed.
    """

    def make(n):
        @jax.jit
        def f(*a):
            def body(eps, _):
                out = op(a[0] + eps.astype(a[0].dtype), *a[1:])
                return _consume(out) * 1e-30, None
            return jax.lax.scan(body, jnp.float32(0), None, length=n)[0]
        return f

    f1, f4 = make(iters), make(4 * iters)
    float(f1(*args)), float(f4(*args))  # compile + warm
    ts = {iters: [], 4 * iters: []}
    for _ in range(reps):
        for f, n in ((f1, iters), (f4, 4 * iters)):
            t0 = time.perf_counter()
            float(f(*args))
            ts[n].append(time.perf_counter() - t0)
    return max((min(ts[4 * iters]) - min(ts[iters])) / (3 * iters), 1e-9)


def scan_slope_time_state(step, state, *args, iters=20, reps=2):
    """Like scan_slope_time for train-step-shaped fns: step(state, *args)
    -> (new_state, aux). The state is the scan carry (real recurrence)."""

    def make(n):
        @jax.jit
        def f(st, *a):
            def body(st, _):
                new_st, aux = step(st, *a)
                return new_st, _consume(aux)
            st, ys = jax.lax.scan(body, st, None, length=n)
            return _consume(st.params if hasattr(st, "params") else st) + \
                jnp.sum(ys)
        return f

    f1, f4 = make(iters), make(4 * iters)
    float(f1(state, *args)), float(f4(state, *args))
    ts = {iters: [], 4 * iters: []}
    for _ in range(reps):
        for f, n in ((f1, iters), (f4, 4 * iters)):
            t0 = time.perf_counter()
            float(f(state, *args))
            ts[n].append(time.perf_counter() - t0)
    return max((min(ts[4 * iters]) - min(ts[iters])) / (3 * iters), 1e-9)
