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




def smoke_block_kernels():
    """Correctness smoke of the fused block kernels vs their XLA twins on
    the real chip (the per-op microbench above is dispatch-floor-bound;
    see PERFORMANCE.md 'Timing methodology')."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vit_tpu.ops.block_attention import fused_attention_block, xla_attention_block
    from vit_tpu.ops.reattention_block import (
        fused_reattention_block, fused_talking_heads_block,
        xla_reattention_block, xla_talking_heads_block,
    )

    key = lambda i: jax.random.PRNGKey(i)
    b, n, dim, heads, d = 8, 197, 256, 4, 64
    hd = heads * d
    x = jax.random.normal(key(0), (b, n, dim), jnp.bfloat16)
    ls = jnp.ones((dim,), jnp.float32)
    lb = jnp.zeros((dim,), jnp.float32)
    wqkv = jax.random.normal(key(1), (dim, 3 * hd), jnp.bfloat16) * 0.05
    wout = jax.random.normal(key(2), (hd, dim), jnp.bfloat16) * 0.05
    bout = jnp.zeros((dim,), jnp.float32)
    mix = jax.random.normal(key(3), (heads, heads)) * 0.3
    ones_h = jnp.ones((heads,), jnp.float32)
    zeros_h = jnp.zeros((heads,), jnp.float32)

    def err(a, b_):
        return float(np.max(np.abs(np.asarray(a, np.float32) - np.asarray(b_, np.float32))))

    e1 = err(fused_attention_block(x, ls, lb, wqkv, wout, bout, heads),
             xla_attention_block(x, ls, lb, wqkv, wout, bout, heads, d**-0.5))
    e2 = err(fused_reattention_block(x, ls, lb, wqkv, wout, bout, mix, ones_h, zeros_h, heads),
             xla_reattention_block(x, ls, lb, wqkv, wout, bout, mix, ones_h, zeros_h, heads, d**-0.5))
    e3 = err(fused_talking_heads_block(x, ls, lb, wqkv, wout, bout, mix, mix, heads),
             xla_talking_heads_block(x, ls, lb, wqkv, wout, bout, mix, mix, heads, d**-0.5))
    print(f"block kernel vs xla (padded n=197): {e1:.5f}")
    # Re-attention's LayerNorm-over-heads is ill-conditioned at bf16: the
    # head values are similar, so tiny score-rounding differences divide
    # by a tiny std. Measured on this chip both the kernel and the XLA
    # path sit ~0.16-0.20 from the fp64 gold (kernel slightly closer),
    # ~0.25 from each other - two equally-valid rounding orders, not a
    # kernel defect (see PARITY.md).
    print(f"reattention kernel vs xla:          {e2:.5f} (ill-conditioned op, see comment)")
    print(f"talking-heads kernel vs xla:        {e3:.5f}")
    assert max(e1, e3) < 0.05, (e1, e3)
    assert e2 < 0.6, e2


if __name__ == "__main__":
    main()
    smoke_block_kernels()
