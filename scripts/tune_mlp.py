"""Sweep fused-MLP block sizes vs XLA at ViT-L shapes."""

import time

import jax
import jax.numpy as jnp

from vit_tpu.ops.fused_mlp import fused_mlp, reference_mlp

T, D, F = 25216, 1024, 4096
LOOP = 24


def timeit(fn, *args, iters=10):
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def loop(fn, x, iters=LOOP):
    def body(i, x):
        return fn(x).astype(x.dtype)
    return jax.lax.fori_loop(0, iters, body, x)


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (T, D), jnp.bfloat16)
    w1 = jax.random.normal(key, (D, F), jnp.bfloat16) * 0.02
    w2 = jax.random.normal(key, (F, D), jnp.bfloat16) * 0.02
    g = jnp.ones((D,), jnp.bfloat16)
    bl = jnp.zeros((D,), jnp.bfloat16)
    flops = 4 * T * D * F

    xla = jax.jit(lambda x: loop(lambda t: reference_mlp(t, w1, None, w2, None, g, bl), x))
    t_x = timeit(xla, x) / LOOP
    print(f"xla                         {t_x*1e3:.3f} ms  {flops/t_x*1e-12:.1f} TF/s")

    for bt in (256, 512, 1024):
        for bf in (512, 1024, 2048):
            fn = jax.jit(lambda x, bt=bt, bf=bf: loop(
                lambda t: fused_mlp(t, w1, None, w2, None, g, bl, block_t=bt, block_f=bf), x))
            try:
                tt = timeit(fn, x) / LOOP
                print(f"pallas bt={bt:4d} bf={bf:4d}    {tt*1e3:.3f} ms  {flops/tt*1e-12:.1f} TF/s")
            except Exception as e:
                print(f"pallas bt={bt:4d} bf={bf:4d}    FAILED {type(e).__name__}: {str(e)[:100]}")


if __name__ == "__main__":
    main()
