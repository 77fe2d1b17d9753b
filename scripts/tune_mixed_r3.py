"""Round-3 mixed-precision diagnosis (VERDICT r2 item 1).

The mixed mode (fp32 residual stream, bf16 MXU) measures 124 ms vs bf16's
110 ms at ViT-L/16 @224 batch 128. The *fundamental* cost of an fp32 stream
is only ~6.4 ms (2 extra stream round-trips x 24 layers x 128 samples at
~819 GB/s), so ~7.6 ms is overhead to find: unfused converts, the fp32
input image, VMEM-driven batch-tile differences, embed/head differences.

Measurements:
  1. full-model bf16 vs mixed (sanity, current numbers)
  2. depth sweep at both modes -> per-layer slope + embed/head intercept
  3. isolated attention-block kernel and MLP at bf16-stream vs fp32-stream
  4. mixed with the input image pre-cast to bf16

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/tune_mixed_r3.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from vit_tpu import ops
from vit_tpu.models import ViT

B = 128
N, DIM, HEADS, MLP = 197, 1024, 16, 4096
ITERS = 20


def timed(fn, *args, iters=ITERS):
    np.asarray(fn(*args))
    np.asarray(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def probe():
    x = jnp.ones((2048, 2048), jnp.bfloat16)
    ms = timed(jax.jit(lambda a: a @ a), x, iters=10)
    print(f"probe matmul: {ms:.2f} ms (expect ~1-2; degraded service poisons all numbers)",
          flush=True)


def full_model():
    key = jax.random.PRNGKey(0)
    img = jax.random.normal(key, (B, 224, 224, 3), jnp.float32)
    cfg = dict(image_size=224, patch_size=16, num_classes=1000,
               dim=DIM, depth=24, heads=HEADS, mlp_dim=MLP)

    bf16 = ViT(**cfg, dtype=jnp.bfloat16)
    params = jax.jit(lambda: bf16.init({"params": jax.random.PRNGKey(1)}, img[:1]))()
    t_bf16 = timed(jax.jit(lambda p, x: bf16.apply(p, x)), params, img.astype(jnp.bfloat16))
    print(f"bf16 full: {t_bf16:.1f} ms ({B/t_bf16*1e3:.0f} img/s)", flush=True)

    mixed = ViT(**cfg, dtype=jnp.bfloat16, residual_dtype=jnp.float32)
    t_mixed = timed(jax.jit(lambda p, x: mixed.apply(p, x)), params, img)
    print(f"mixed full: {t_mixed:.1f} ms ({B/t_mixed*1e3:.0f} img/s)", flush=True)
    t_mixed_b = timed(jax.jit(lambda p, x: mixed.apply(p, x)), params, img.astype(jnp.bfloat16))
    print(f"mixed, bf16 input img: {t_mixed_b:.1f} ms", flush=True)
    return params, img


def depth_sweep(img):
    key = jax.random.PRNGKey(0)
    for label, kwargs in (("bf16", dict(dtype=jnp.bfloat16)),
                          ("mixed", dict(dtype=jnp.bfloat16, residual_dtype=jnp.float32))):
        ts = {}
        for depth in (4, 12, 24):
            m = ViT(image_size=224, patch_size=16, num_classes=1000,
                    dim=DIM, depth=depth, heads=HEADS, mlp_dim=MLP, **kwargs)
            p = jax.jit(lambda m=m: m.init({"params": jax.random.PRNGKey(1)}, img[:1]))()
            x = img if label == "mixed" else img.astype(jnp.bfloat16)
            ts[depth] = timed(jax.jit(lambda p, x, m=m: m.apply(p, x)), p, x)
        per_layer = (ts[24] - ts[4]) / 20
        print(f"{label}: depth sweep {ts} -> {per_layer:.3f} ms/layer, "
              f"embed+head intercept {ts[4] - 4*per_layer:.1f} ms", flush=True)


def isolated_blocks():
    key = jax.random.PRNGKey(0)
    wqkv = jax.random.normal(key, (DIM, 3 * DIM), jnp.bfloat16) * 0.02
    wout = jax.random.normal(key, (DIM, DIM), jnp.bfloat16) * 0.02
    ln_s, ln_b = jnp.ones((DIM,)), jnp.zeros((DIM,))
    bout = jnp.zeros((DIM,))
    w1 = jax.random.normal(key, (DIM, MLP), jnp.bfloat16) * 0.02
    w2 = jax.random.normal(key, (MLP, DIM), jnp.bfloat16) * 0.02
    b1, b2 = jnp.zeros((MLP,)), jnp.zeros((DIM,))

    from vit_tpu.ops import fused_mlp

    for label, dt in (("bf16", jnp.bfloat16), ("fp32", jnp.float32)):
        x = jax.random.normal(key, (B, N, DIM), dt)
        t_attn = timed(jax.jit(lambda x: ops.attention_block(
            x, ln_s, ln_b, wqkv, wout, bout, HEADS)), x)
        t_mlp = timed(jax.jit(lambda x: x + ops.mlp(
            x, w1, b1, w2, b2, ln_s, ln_b, residual=False)), x)
        t_mlp_pl = timed(jax.jit(lambda x: fused_mlp(
            x, w1, b1, w2, b2, ln_s, ln_b, residual=True)), x)
        print(f"{label}-stream isolated: attn_block {t_attn:.2f} ms  "
              f"mlp-xla {t_mlp:.2f} ms  mlp-pallas {t_mlp_pl:.2f} ms", flush=True)


if __name__ == "__main__":
    probe()
    params, img = full_model()
    depth_sweep(img)
    isolated_blocks()
