"""Round-3c: where does the mixed-precision FULL MODEL lose time?

Standalone kernels say mixed should cost +0.19 ms/layer over bf16
(attn fp32-stream 2.848 vs 2.674; XLA MLP equal within noise), i.e.
~115 ms vs 110 — yet BENCH_r02 recorded 124 ms. Either the gap lives
outside the per-layer kernels or it was episode variance. Time the full
ViT-L apply both ways with the 4-byte-transfer harness, plus ablations.
"""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import jax
import jax.numpy as jnp
import numpy as np

from r3util import probe_ms, timed_scalar
from vit_tpu.models import ViT

CFG = dict(
    image_size=224, patch_size=16, num_classes=1000,
    dim=1024, depth=24, heads=16, mlp_dim=4096,
)
B = 128


def main():
    print(f"probe: {probe_ms():.2f} ms/dispatch", flush=True)
    key = jax.random.PRNGKey(0)
    img = jax.random.normal(key, (B, 224, 224, 3), jnp.float32)

    bf16 = ViT(**CFG, dtype=jnp.bfloat16)
    params = bf16.init({"params": key}, img[:1])

    variants = [
        ("bf16", ViT(**CFG, dtype=jnp.bfloat16)),
        ("mixed (fp32 stream)", ViT(**CFG, dtype=jnp.bfloat16, residual_dtype=jnp.float32)),
    ]
    for name, model in variants:
        t = timed_scalar(lambda p, x: model.apply(p, x), params, img)
        ips = B / (t / 1e3)
        print(f"{name}: {t:.2f} ms  ({ips:.0f} img/s)", flush=True)


if __name__ == "__main__":
    main()
