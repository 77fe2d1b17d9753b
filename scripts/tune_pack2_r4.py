"""Round-4 pack-2 validation + A/B on the real chip.

The cls token makes the README-scale ViT n=65, which the bf16 kernels pad
to 80 rows (23% pad tax) while padless simple_vit runs 1.25x. Pack-2 lays
two samples per kernel row (65 -> stride 72, 144 rows/pair, 11% tax) with
a block-diagonal attention mask (ops/block_attention.py).

This script (a) checks the Mosaic compile + numerics of the packed kernel
at the zoo shape, (b) A/Bs the whole model packed vs pad-80 on the exact
zoo vit config.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/tune_pack2_r4.py
"""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import jax
import jax.numpy as jnp
import numpy as np

from r3util import probe_ms

BATCH, ITERS = 128, 10


from r3util import timed_batch


def main():
    from vit_tpu.ops.block_attention import (
        fused_attention_block, xla_attention_block,
    )
    from vit_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    print(f"# probe {probe_ms():.1f} ms", flush=True)

    # (a) kernel numerics at the packed zoo shape: 2x65 -> 144, bf16
    n, stride, dim, heads, d = 65, 72, 1024, 16, 64
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    x = (jax.random.normal(ks[0], (4, n, dim)) * 0.5).astype(jnp.bfloat16)
    ln_s = jnp.ones((dim,), jnp.float32)
    ln_b = jnp.zeros((dim,), jnp.float32)
    wqkv = (jax.random.normal(ks[1], (dim, 3 * heads * d)) * 0.02).astype(jnp.bfloat16)
    wout = (jax.random.normal(ks[2], (heads * d, dim)) * 0.02).astype(jnp.bfloat16)
    bout = jnp.zeros((dim,), jnp.float32)
    gold = xla_attention_block(x, ln_s, ln_b, wqkv, wout, bout, heads, d**-0.5)
    xp = jnp.pad(x, ((0, 0), (0, stride - n), (0, 0))).reshape(2, 2 * stride, dim)
    got = fused_attention_block(
        xp, ln_s, ln_b, wqkv, wout, bout, heads, true_n=n, block_tokens=stride
    )
    got = got.reshape(4, stride, dim)[:, :n]
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - gold.astype(jnp.float32))))
    print(f"packed kernel vs solo-XLA max err {err:.2e} (bf16 tol ~2e-2)", flush=True)
    assert err < 2e-2

    # (b) whole-model A/B at the zoo vit config
    from vit_tpu.models import ViT

    model = ViT(image_size=256, patch_size=32, num_classes=1000, dim=1024,
                depth=6, heads=16, mlp_dim=2048, dtype=jnp.bfloat16)
    img = jax.random.normal(ks[3], (BATCH, 256, 256, 3), jnp.float32)
    variables = jax.jit(
        lambda: model.init({"params": jax.random.PRNGKey(1)}, img[:1])
    )()
    import os

    fn = jax.jit(lambda v, im: model.apply(v, im))
    dt = timed_batch(fn, variables, img)  # packed (auto)
    print(f"packed  {dt * 1e3:7.2f} ms/batch  {BATCH / dt:8.1f} img/s", flush=True)
    lp = np.asarray(fn(variables, img[:8]))
    os.environ["VIT_TPU_NO_PACK"] = "1"
    try:
        fn_u = jax.jit(lambda v, im: model.apply(v, im) + 0)  # distinct cache key
        dt_u = timed_batch(fn_u, variables, img)
        print(f"pad-80  {dt_u * 1e3:7.2f} ms/batch  {BATCH / dt_u:8.1f} img/s",
              flush=True)
        lu = np.asarray(fn_u(variables, img[:8]))
    finally:
        os.environ.pop("VIT_TPU_NO_PACK", None)
    print(f"logit err packed-vs-pad80 {np.abs(lp - lu).max():.4f}", flush=True)


if __name__ == "__main__":
    main()
