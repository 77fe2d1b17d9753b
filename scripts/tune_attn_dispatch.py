"""Microbench: Pallas flash kernel vs XLA batched einsum on the zoo's real
attention shapes, to set the dispatch rules in ops.attention from data.

Shapes (batch 128 zoo configs):
- levit_s1:  self-attn 196 tokens, 4 heads, d 32/64, per-head bias
- cvt_s1:    cross-attn q 4096 / kv 1024, 1 head, d 64
- cvt_s2:    cross-attn q 1024 / kv 256, 3 heads, d 64
- twins_gsa: cross-attn q 3136 / kv 49, 2 heads, d 64
- vit_l:     self-attn 197 tokens, 16 heads, d 64 (flagship sanity)

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/tune_attn_dispatch.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from vit_tpu.ops.flash_attention import flash_attention, reference_attention

B = 128
CASES = [
    # name, heads, nq, nk, d, bias?
    ("levit_s1", 4, 196, 196, 64, True),
    ("levit_s2ds", 6, 49, 196, 16, True),
    ("cvt_s1", 1, 4096, 1024, 64, False),
    ("cvt_s2", 3, 1024, 256, 64, False),
    ("twins_gsa", 2, 3136, 49, 64, False),
    ("vit_l", 16, 197, 197, 64, False),
]


def timed(fn, *args, iters=10):
    np.asarray(fn(*args))
    np.asarray(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jnp.sum(out))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    key = jax.random.PRNGKey(0)
    for name, h, nq, nk, d, has_bias in CASES:
        q = jax.random.normal(key, (B, h, nq, d), jnp.bfloat16)
        k = jax.random.normal(key, (B, h, nk, d), jnp.bfloat16)
        v = jax.random.normal(key, (B, h, nk, d), jnp.bfloat16)
        bias = (
            jax.random.normal(key, (1, h, nq, nk), jnp.float32) if has_bias else None
        )
        f_flash = jax.jit(lambda q, k, v: flash_attention(q, k, v, bias))
        f_xla = jax.jit(lambda q, k, v: reference_attention(q, k, v, bias))
        try:
            t_flash = timed(f_flash, q, k, v)
        except Exception as e:  # noqa: BLE001
            t_flash = float("nan")
            print(f"{name}: flash failed: {type(e).__name__}", file=sys.stderr)
        t_xla = timed(f_xla, q, k, v)
        win = "flash" if t_flash < t_xla else "xla"
        print(
            f"{name:12s} h={h:2d} nq={nq:5d} nk={nk:5d} d={d:3d} bias={has_bias} | "
            f"flash {t_flash:8.2f}ms  xla {t_xla:8.2f}ms  -> {win}",
            flush=True,
        )


if __name__ == "__main__":
    main()
