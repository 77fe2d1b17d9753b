"""Round-4 zoo-tail study (VERDICT r3 item 5): why do vit/deepvit/simple_vit
cap at 1.06-1.08x at reference-README scale (depth 6, 65 tokens, dim 1024)?

Hypothesis: the block-kernel dispatch rule tests the REAL token count
(true_n=65 -> "XLA's fast 65..127 bucket") — but with whole-stack padding
(Transformer.auto_pad) the stream arrives already tile-aligned at n=80 and
the kernel pays NO pad/unpad copies, so the measured "XLA wins at unaligned
65..127" reasoning does not apply. Times both backends at the padded shape,
plus the whole model each way.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/tune_zoo_tail_r4.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import jax
import jax.numpy as jnp
import numpy as np

from r3util import chain_timed, probe_ms
from vit_tpu.ops.block_attention import fused_attention_block, xla_attention_block
from vit_tpu.ops.fused_mlp import _activate, _layer_norm_f32

B, TRUE_N, N, DIM, HEADS, D, F = 128, 65, 80, 1024, 16, 64, 2048
HD = HEADS * D
SCALE = D**-0.5

ks = jax.random.split(jax.random.PRNGKey(0), 8)
W = dict(
    ln_s=jnp.ones((DIM,), jnp.float32), ln_b=jnp.zeros((DIM,), jnp.float32),
    wqkv=(jax.random.normal(ks[0], (DIM, 3 * HD)) * 0.02).astype(jnp.bfloat16),
    wout=(jax.random.normal(ks[1], (HD, DIM)) * 0.02).astype(jnp.bfloat16),
    bout=jnp.zeros((DIM,), jnp.float32),
    w1=(jax.random.normal(ks[2], (DIM, F)) * 0.02).astype(jnp.bfloat16),
    b1=jnp.zeros((F,), jnp.float32),
    w2=(jax.random.normal(ks[3], (F, DIM)) * 0.02).astype(jnp.bfloat16),
    b2=jnp.zeros((DIM,), jnp.float32),
)


def mlp(x):
    xn = _layer_norm_f32(x.astype(jnp.float32), W["ln_s"], W["ln_b"]).astype(
        jnp.bfloat16
    )
    h = jnp.matmul(xn, W["w1"], preferred_element_type=jnp.float32) + W["b1"]
    h = _activate(h, "gelu")
    return x + (jnp.matmul(h.astype(jnp.bfloat16), W["w2"],
                           preferred_element_type=jnp.float32) + W["b2"]).astype(x.dtype)


def attn_kernel(x):
    return fused_attention_block(
        x, W["ln_s"], W["ln_b"], W["wqkv"], W["wout"], W["bout"], HEADS,
        scale=SCALE, true_n=TRUE_N,
    )


def attn_xla(x):
    return xla_attention_block(
        x, W["ln_s"], W["ln_b"], W["wqkv"], W["wout"], W["bout"], HEADS,
        SCALE, 1e-6, TRUE_N,
    )


def timed_model(fn, *args, iters=10):
    np.asarray(fn(*args)); np.asarray(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / iters


def main():
    print(f"# probe {probe_ms():.1f} ms  B={B} N={N}(true {TRUE_N}) dim={DIM}",
          flush=True)
    x = (jax.random.normal(ks[4], (B, N, DIM)) * 0.5).astype(jnp.bfloat16)
    print(f"attn_xla@80     {chain_timed(attn_xla, x):7.3f} ms/layer", flush=True)
    print(f"attn_kernel@80  {chain_timed(attn_kernel, x):7.3f} ms/layer", flush=True)
    print(f"mlp@80          {chain_timed(mlp, x):7.3f} ms/layer", flush=True)
    print(f"layer_xla       {chain_timed(lambda c: mlp(attn_xla(c)), x):7.3f}",
          flush=True)
    print(f"layer_kernel    {chain_timed(lambda c: mlp(attn_kernel(c)), x):7.3f}",
          flush=True)

    # whole model, README scale, both dispatch choices
    import os

    from vit_tpu.models import ViT

    model = ViT(image_size=256, patch_size=32, num_classes=1000, dim=1024,
                depth=6, heads=16, mlp_dim=2048, dtype=jnp.bfloat16)
    img = jax.random.normal(ks[5], (B, 256, 256, 3), jnp.bfloat16)
    variables = jax.jit(
        lambda: model.init({"params": jax.random.PRNGKey(1)}, img[:1])
    )()
    for tag, env in (("auto(xla@65)", None), ("forced-pallas", "pallas")):
        if env:
            os.environ["VIT_TPU_BACKEND"] = env
        else:
            os.environ.pop("VIT_TPU_BACKEND", None)
        fn = jax.jit(lambda v, im: model.apply(v, im))
        dt = timed_model(fn, variables, img)
        print(f"model[{tag:14s}] {dt * 1e3:7.2f} ms/batch  {B / dt:8.1f} img/s",
              flush=True)
    os.environ.pop("VIT_TPU_BACKEND", None)


if __name__ == "__main__":
    main()
