"""Chained on-device timing for round-3 microbenches.

Two tunnel artifacts poison naive timings here:
  1. Per-dispatch overhead varies by episode (0.5-15 ms measured) — single
     sub-20ms ops are dispatch-bound.
  2. ``np.asarray(out)`` TRANSFERS the whole array to host through the
     tunnel (~100s of MB/s): materializing a 51MB activation adds ~300-900ms
     and silently dominates the figure. ``block_until_ready`` does NOT block
     under the axon platform, so it can't replace the transfer.

``chain_timed`` therefore runs the op CHAIN times back-to-back inside one
jit (lax.scan feeding the output into the next input) and reduces the final
output to ONE scalar on-device, so each dispatch transfers 4 bytes and the
per-op figure divides the dispatch overhead by CHAIN.
Requires fn: (x, *consts) -> same-shape-as-x.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def probe_ms():
    """Trivial-matmul round-trip time: the tunnel health number to print
    alongside every measurement (see MEMORY: degraded episodes poison
    microbenches)."""
    x = jnp.ones((1024, 1024), jnp.bfloat16)
    f = jax.jit(lambda a: a @ a)
    np.asarray(f(x))
    t0 = time.perf_counter()
    for _ in range(5):
        out = f(x)
    np.asarray(out)
    return (time.perf_counter() - t0) / 5 * 1e3


def chain_timed(fn, x, *consts, chain=24, reps=5, dtype_cast=None):
    """Median per-application ms of ``fn`` chained ``chain`` times on-device.

    fn(x, *consts) must return an array of x's shape; if its dtype differs
    (e.g. fp32 accumulator out), pass dtype_cast to re-cast between links.
    """

    def link(c, _):
        y = fn(c, *consts)
        if dtype_cast is not None:
            y = y.astype(dtype_cast)
        return y, ()

    @jax.jit
    def chained(x0):
        y, _ = jax.lax.scan(link, x0, None, length=chain)
        return y.astype(jnp.float32).sum()  # 4-byte host transfer

    np.asarray(chained(x))  # compile + one run
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(chained(x))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2] / chain * 1e3


def timed_scalar(fn, *args, reps=5):
    """Median ms of ``fn(*args)`` where fn's jitted output is reduced to a
    scalar on-device (wraps fn in jit + .sum()); one 4-byte transfer/rep."""
    f = jax.jit(lambda *a: jax.tree.reduce(
        lambda acc, t: acc + t.astype(jnp.float32).sum(), fn(*a), 0.0))
    np.asarray(f(*args))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(f(*args))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2] * 1e3


def timed_batch(fn, *args, iters=10):
    """Whole-model throughput timing: warm twice, run ``iters`` dispatches,
    fence ONCE on the last output (block_until_ready under-reports on this
    environment's tunneled backend — see bench.py's timing notes). Returns
    seconds per call. The shared form of the helper the round-4 tuning
    scripts each carried locally."""
    np.asarray(fn(*args))
    np.asarray(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / iters
