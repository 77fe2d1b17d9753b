"""Component-level ViT-L/16 profiling on the real TPU.

Times (a) full model pallas vs xla backends, (b) attention core and MLP
block in isolation under in-graph loops (dispatch amortized), to locate
where the 2x-vs-baseline budget goes.
"""

import time

import jax
import jax.numpy as jnp

from vit_tpu import ops
from vit_tpu.models import ViT
from vit_tpu.ops.flash_attention import flash_attention, reference_attention
from vit_tpu.ops.fused_mlp import fused_mlp, reference_mlp

B, N, H, D, DIM, F = 128, 197, 16, 64, 1024, 4096
LOOP = 24


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def loop(fn, x, *consts):
    def body(i, x):
        return fn(x, *consts).astype(x.dtype)
    return jax.lax.fori_loop(0, LOOP, body, x)


def main():
    key = jax.random.PRNGKey(0)
    print("=== attention core (B,H,N,D) =", (B, H, N, D))
    q = jax.random.normal(key, (B, H, N, D), jnp.bfloat16)

    pal = jax.jit(lambda q: loop(lambda x: flash_attention(x, x, x), q))
    xla = jax.jit(lambda q: loop(lambda x: reference_attention(x, x, x), q))
    t_p, t_x = timeit(pal, q), timeit(xla, q)
    per_p, per_x = t_p / LOOP * 1e3, t_x / LOOP * 1e3
    flops = 4 * B * H * N * N * D
    print(f"pallas {per_p:.3f} ms ({flops/per_p*1e-9:.1f} TF/s)   "
          f"xla {per_x:.3f} ms ({flops/per_x*1e-9:.1f} TF/s)")

    print("=== mlp block (T,DIM,F) =", (B * N, DIM, F))
    x = jax.random.normal(key, (B * N, DIM), jnp.bfloat16)
    w1 = jax.random.normal(key, (DIM, F), jnp.bfloat16) * 0.02
    w2 = jax.random.normal(key, (F, DIM), jnp.bfloat16) * 0.02
    g = jnp.ones((DIM,), jnp.bfloat16)
    bl = jnp.zeros((DIM,), jnp.bfloat16)

    pal = jax.jit(lambda x: loop(lambda t: fused_mlp(t, w1, None, w2, None, g, bl), x))
    xla = jax.jit(lambda x: loop(lambda t: reference_mlp(t, w1, None, w2, None, g, bl), x))
    t_p, t_x = timeit(pal, x), timeit(xla, x)
    per_p, per_x = t_p / LOOP * 1e3, t_x / LOOP * 1e3
    flops = 4 * B * N * DIM * F
    print(f"pallas {per_p:.3f} ms ({flops/per_p*1e-9:.1f} TF/s)   "
          f"xla {per_x:.3f} ms ({flops/per_x*1e-9:.1f} TF/s)")

    print("=== full ViT-L forward, batch", B)
    model = ViT(image_size=224, patch_size=16, num_classes=1000, dim=DIM,
                depth=24, heads=16, mlp_dim=F, dtype=jnp.bfloat16)
    img = jax.random.normal(key, (B, 224, 224, 3), jnp.bfloat16)
    variables = jax.jit(lambda: model.init({"params": key}, img[:1]))()

    for mode in ("pallas", "xla"):
        with ops.force_backend(mode):
            fn = jax.jit(lambda v, x: model.apply(v, x))
            t = timeit(fn, variables, img, iters=10)
        print(f"{mode}: {t*1e3:.1f} ms/batch  {B/t:.0f} img/s")


if __name__ == "__main__":
    main()
