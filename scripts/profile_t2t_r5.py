"""Round-5 T2T decomposition (VERDICT r4 #8): per-stage table for the
1.19x family — is the remaining gap a lever or the roofline?

Zoo config (224, dim 512, depth 5, heads 8, mlp 512,
t2t_layers ((7,4),(3,2),(3,2))) decomposes into:

  soft-splits   in-graph overlapping-patch gathers (3 of them)
  t2t stage 0   1-head depth-1 transformer at n=3136, dim 147
  t2t stage 1   1-head depth-1 transformer at n=784, dim 1323
  proj          Dense 11907 -> 512 at n=196
  encoder       5-layer 8-head transformer at n=197, dim 512

FLOP model per image: stage0 ~6.5 GF (attention n^2 d dominates, and its
d=147 pads to 256 lanes), stage1 ~20 GF (the qkv/out/mlp GEMMs at dim
1323 dominate; 1323 pads to 1408 lanes), proj 2.4 GF, encoder ~4.5 GF —
the tokenizer IS the model. If the measured phase times sit near the
chip's bf16 roofline the 1.19x is shape-bound and closed-by-nature (the
reference pays the same lane padding); otherwise the slow phase is the
lever.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_t2t_r5.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vit_tpu import ops
from vit_tpu.models import T2TViT
from vit_tpu.nn.blocks import Transformer

B = 128
ITERS = 10
PEAK_TFLOPS = 197.0


def timed_ms(fn, *args):
    np.asarray(fn(*args))
    np.asarray(fn(*args))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / ITERS * 1e3


def attn_phase_gflops(n, dim, inner, mlp, depth):
    """fwd GFLOPs per batch for a transformer phase (2 FLOPs/MAC)."""
    per_layer = (
        2 * n * dim * 3 * inner      # qkv
        + 4 * n * n * inner          # QK^T + PV
        + 2 * n * inner * dim        # out proj
        + 4 * n * dim * mlp          # mlp pair
    )
    return depth * per_layer * B / 1e9


def report(name, ms, gflops=None):
    if gflops is None:
        print(f"{name}: {ms:.2f} ms", flush=True)
    else:
        tf = gflops / ms
        print(f"{name}: {ms:.2f} ms  ({gflops:.0f} GF -> {tf:.0f} TF/s, "
              f"{tf / PEAK_TFLOPS * 100:.0f}% of peak)", flush=True)


def main():
    dtype = jnp.bfloat16
    img = jax.random.normal(jax.random.PRNGKey(0), (B, 224, 224, 3),
                            jnp.float32)
    cfg = dict(dim=512, image_size=224, depth=5, heads=8, mlp_dim=512,
               num_classes=1000, t2t_layers=((7, 4), (3, 2), (3, 2)))

    model = T2TViT(**cfg, dtype=dtype)
    variables = jax.jit(
        lambda: model.init({"params": jax.random.PRNGKey(1)}, img[:1])
    )()
    fn = jax.jit(lambda v, a: model.apply(v, a))
    ms_total = timed_ms(fn, variables, img)
    report("model", ms_total)

    # soft-splits alone (all three gathers, fused back to back)
    def splits(a):
        x, side, layer_dim = a, 224, 3
        from vit_tpu.core.utils import conv_output_size
        for kernel, stride in cfg["t2t_layers"]:
            layer_dim *= kernel ** 2
            side = conv_output_size(side, kernel, stride, stride // 2)
            x = ops.extract_patches(x, kernel, stride, padding="SAME")
            x = x.reshape(B, side, side, layer_dim)
        return x.sum()

    report("soft-splits-x3", timed_ms(jax.jit(splits), img.astype(dtype)))

    # tokenizer transformer stages, isolated at their true shapes
    for label, n, d in (("t2t-stage0", 3136, 147), ("t2t-stage1", 784, 1323)):
        x = jax.random.normal(jax.random.PRNGKey(2), (B, n, d), dtype)
        tr = Transformer(dim=d, depth=1, heads=1, dim_head=d, mlp_dim=d,
                         norm_eps=1e-5, dtype=dtype)
        p = jax.jit(lambda tr=tr, x=x: tr.init({"params": jax.random.PRNGKey(3)}, x))()
        ms = timed_ms(jax.jit(lambda v, a, tr=tr: tr.apply(v, a).sum()), p, x)
        report(label, ms, attn_phase_gflops(n, d, d, d, 1))

    # projection Dense 11907 -> 512
    x = jax.random.normal(jax.random.PRNGKey(4), (B, 196, 11907), dtype)
    proj = nn.Dense(512, dtype=dtype)
    p = jax.jit(lambda: proj.init(jax.random.PRNGKey(5), x))()
    report("proj-11907->512",
           timed_ms(jax.jit(lambda v, a: proj.apply(v, a).sum()), p, x),
           2 * 196 * 11907 * 512 * B / 1e9)

    # encoder, isolated — 14x14 final grid + cls = 197 tokens
    x = jax.random.normal(jax.random.PRNGKey(6), (B, 197, 512), dtype)
    enc = Transformer(dim=512, depth=5, heads=8, dim_head=64, mlp_dim=512,
                      norm_eps=1e-5, dtype=dtype)
    p = jax.jit(lambda: enc.init({"params": jax.random.PRNGKey(7)}, x))()
    ms = timed_ms(jax.jit(lambda v, a: enc.apply(v, a).sum()), p, x)
    report("encoder-x5", ms, attn_phase_gflops(197, 512, 512, 512, 5))


if __name__ == "__main__":
    main()
