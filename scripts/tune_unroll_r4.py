"""Round-4: does partially unrolling the 24-deep scanned encoder buy the
mixed mode anything at ViT-L scale? ``scan_unroll_for`` keeps deep stacks
as a loop (O(1) compile); unroll windows give XLA straight-line spans to
overlap across layers (weight prefetch of layer i+1 during layer i's MLP).

Times the FULL mixed-precision and bf16 ViT-L forward (batch 128) at
unroll 1 / 4 / 8 / 24, one sync per run (the bench's timing discipline).

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/tune_unroll_r4.py
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import jax
import jax.numpy as jnp
import numpy as np

from r3util import probe_ms

CFG = dict(image_size=224, patch_size=16, num_classes=1000,
           dim=1024, depth=24, heads=16, mlp_dim=4096)
BATCH = 128
ITERS = 10


def timed(fn, *args):
    np.asarray(fn(*args))
    np.asarray(fn(*args))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / ITERS


def main():
    from vit_tpu.models import ViT
    from vit_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    print(f"# probe {probe_ms():.1f} ms", flush=True)
    img = jax.random.normal(jax.random.PRNGKey(0), (BATCH, 224, 224, 3),
                            jnp.float32)
    variables = None
    for tag, kwargs in (
        ("mixed", dict(dtype=jnp.bfloat16, residual_dtype=jnp.float32)),
        ("bf16", dict(dtype=jnp.bfloat16)),
    ):
        model = ViT(**CFG, **kwargs)
        x = img if tag == "mixed" else img.astype(jnp.bfloat16)
        if variables is None:
            variables = jax.jit(
                lambda m=model: m.init({"params": jax.random.PRNGKey(1)}, x[:1])
            )()
        base = None
        for unroll in (1, 4, 8, 24):
            os.environ["VIT_TPU_SCAN_UNROLL"] = str(unroll)
            fn = jax.jit(lambda v, im, m=model: m.apply(v, im))
            try:
                dt = timed(fn, variables, x)
            except Exception as e:
                print(f"{tag} unroll={unroll:2d}  FAIL {type(e).__name__}: "
                      f"{str(e)[:100]}", flush=True)
                continue
            base = base or dt
            print(f"{tag} unroll={unroll:2d}  {dt * 1e3:7.2f} ms/batch  "
                  f"{BATCH / dt:7.1f} img/s  ({dt / base:5.3f}x of unroll1)",
                  flush=True)
        os.environ.pop("VIT_TPU_SCAN_UNROLL", None)


if __name__ == "__main__":
    main()
