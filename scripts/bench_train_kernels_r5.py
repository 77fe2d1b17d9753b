"""Round-5 probe: GSPMD train step with the Pallas kernels IN the
partitioned program (ops/partitioning.py) vs the round-4 paths, real TPU.

Through round 4 the kernels could only train via the shard_map step (573
img/s) while the GSPMD+remat XLA step did 720 img/s (PERFORMANCE.md
Training). With partitioning rules the GSPMD step can now trace
``backend='pallas'`` — this script measures every combination on the
ViT-B/16 @224 batch-64 config so VERDICT r4 items 1/3 get real numbers.

Run: PYTHONPATH=/root/repo python scripts/bench_train_kernels_r5.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from vit_tpu.models import ViT
from vit_tpu.parallel import make_mesh
from vit_tpu.train import (
    create_train_state,
    make_shard_map_train_step,
    make_train_step,
)

B = 64


def main():
    model = ViT(
        image_size=224, patch_size=16, num_classes=1000, dim=768,
        depth=12, heads=12, mlp_dim=3072, dim_head=64, dtype=jnp.bfloat16,
    )
    img = jax.random.normal(jax.random.PRNGKey(0), (B, 224, 224, 3), jnp.bfloat16)
    labels = jnp.arange(B) % 1000

    mesh = make_mesh(n_data=1, n_model=1)
    runs = [
        ("gspmd-remat-xla", make_train_step(model), False),
        ("gspmd-remat-pallas", make_train_step(model, backend="pallas"), False),
        ("gspmd-noremat-pallas",
         make_train_step(model, backend="pallas", remat=False), False),
        ("shardmap-pallas", make_shard_map_train_step(model, mesh), True),
    ]
    for name, step_fn, on_mesh in runs:
        try:
            state = create_train_state(
                model, jax.random.PRNGKey(1), img[:1],
                mesh=mesh if on_mesh else None,
            )
            state, loss = step_fn(state, img, labels)  # compile
            np.asarray(loss)
            state, loss = step_fn(state, img, labels)
            np.asarray(loss)
            t0 = time.perf_counter()
            iters = 10
            for _ in range(iters):
                state, loss = step_fn(state, img, labels)
            np.asarray(loss)
            dt = (time.perf_counter() - t0) / iters
            print(f"{name}: {B/dt:.1f} img/s ({dt*1e3:.1f} ms/step, "
                  f"loss {float(loss):.3f})", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
