"""Quick compiled-kernel smoke + microbench on the real TPU.

Usage: python scripts/tpu_smoke.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from vit_tpu.ops.flash_attention import flash_attention, reference_attention
from vit_tpu.ops.fused_mlp import fused_mlp, reference_mlp


def timeit(fn, *args, iters=50):
    fn(*args)[0].block_until_ready() if isinstance(fn(*args), tuple) else fn(*args).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    out.block_until_ready()
    return (time.perf_counter() - t0) / iters


def main():
    print("backend:", jax.default_backend(), jax.devices())

    # ViT-L/16 @224 geometry: N=197, H=16, D=64, batch 64.
    b, h, n, d = 64, 16, 197, 64
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (b, h, n, d), jnp.bfloat16)
    k = jax.random.normal(key, (b, h, n, d), jnp.bfloat16)
    v = jax.random.normal(key, (b, h, n, d), jnp.bfloat16)

    out = flash_attention(q, k, v)
    ref = reference_attention(q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32))
    err = np.max(np.abs(out.astype(np.float32) - np.asarray(ref)))
    print(f"attention max err vs fp32 ref: {err:.4f}")

    t_pallas = timeit(lambda: flash_attention(q, k, v))
    t_xla = timeit(lambda: jax.jit(reference_attention)(q, k, v))
    print(f"attention pallas {t_pallas*1e6:.1f}us  xla {t_xla*1e6:.1f}us  speedup {t_xla/t_pallas:.2f}x")

    # ViT-L MLP: dim 1024, hidden 4096, tokens 64*197.
    t, dim, f = b * n, 1024, 4096
    x = jax.random.normal(key, (t, dim), jnp.bfloat16)
    w1 = jax.random.normal(key, (dim, f), jnp.bfloat16) * 0.02
    b1 = jnp.zeros((f,), jnp.bfloat16)
    w2 = jax.random.normal(key, (f, dim), jnp.bfloat16) * 0.02
    b2 = jnp.zeros((dim,), jnp.bfloat16)
    g = jnp.ones((dim,), jnp.bfloat16)
    bl = jnp.zeros((dim,), jnp.bfloat16)

    out = fused_mlp(x, w1, b1, w2, b2, g, bl)
    ref = reference_mlp(x, w1, b1, w2, b2, g, bl)
    err = np.max(np.abs(out.astype(np.float32) - np.asarray(ref, np.float32)))
    print(f"mlp max err vs xla: {err:.4f}")

    t_pallas = timeit(lambda: fused_mlp(x, w1, b1, w2, b2, g, bl))
    t_xla = timeit(jax.jit(lambda *a: reference_mlp(*a)), x, w1, b1, w2, b2, g, bl)
    print(f"mlp pallas {t_pallas*1e6:.1f}us  xla {t_xla*1e6:.1f}us  speedup {t_xla/t_pallas:.2f}x")


if __name__ == "__main__":
    main()
