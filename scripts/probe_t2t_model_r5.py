"""Quick A/B: t2t whole-model ms/batch only (for iterating on the
soft-split formulation without recompiling the full phase suite).

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/probe_t2t_model_r5.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from vit_tpu.models import T2TViT

B = 128
ITERS = 10


def timed_ms(fn, *args):
    np.asarray(fn(*args))
    np.asarray(fn(*args))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / ITERS * 1e3


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
    ms = timed_ms(fn, variables, img)
    print(f"model: {ms:.2f} ms ({B/ms*1e3:.0f} img/s)", flush=True)


if __name__ == "__main__":
    main()
