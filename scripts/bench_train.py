"""Train-step throughput on the real TPU chip, Pallas kernels ON
(VERDICT r1 item 6: measure the kernels-on training path, not just test it).

Config: ViT-B/16-ish @224 (ViT-L's 24-layer train state + optimizer
doesn't fit 16GB HBM with fp32 adam moments at batch 128), batch 64,
bf16 compute / fp32 params, cross-entropy, adamw.

Compares:
  kernels-on  - single-device shard_map step (make_shard_map_train_step
                on a 1-device mesh; per-device program keeps the fused
                Pallas kernels and their custom VJPs — whose XLA-recompute
                backward is built-in rematerialization)
  gspmd-remat - the GSPMD step (make_train_step): XLA op path with
                per-block jax.checkpoint (without it this OOMs at this
                batch: 16.68G/15.75G HBM)

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench_train.py
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
    for name, step_fn, state in (
        ("kernels-on", make_shard_map_train_step(model, mesh),
         create_train_state(model, jax.random.PRNGKey(1), img[:1], mesh=mesh)),
        ("gspmd-remat", make_train_step(model),
         create_train_state(model, jax.random.PRNGKey(1), img[:1])),
    ):
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
        print(
            f"{name}: {B/dt:.1f} img/s  ({dt*1e3:.1f} ms/step, loss {float(loss):.3f})",
            flush=True,
        )


def converge(steps: int = 200):
    """Convergence smoke (VERDICT r2 item 7): ~200 steps on a learnable
    synthetic task — 10 class templates + noise — with the full training
    ergonomics stack (warmup+cosine schedule, grad clipping), checking
    train loss falls and held-out top-1 rises well above chance.

    Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench_train.py converge
    """
    from vit_tpu.train import make_eval_step, make_optimizer, warmup_cosine_schedule

    model = ViT(image_size=64, patch_size=8, num_classes=10, dim=256,
                depth=6, heads=4, mlp_dim=512, dim_head=64, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    templates = jax.random.normal(key, (10, 64, 64, 3))

    def batch(k, n=64):
        k1, k2 = jax.random.split(k)
        labels = jax.random.randint(k1, (n,), 0, 10)
        imgs = templates[labels] + 0.5 * jax.random.normal(k2, (n, 64, 64, 3))
        return imgs.astype(jnp.bfloat16), labels

    tx = make_optimizer(
        warmup_cosine_schedule(3e-4, total_steps=steps, warmup_steps=20),
        grad_clip_norm=1.0,
    )
    state = create_train_state(model, jax.random.PRNGKey(1),
                               jnp.zeros((1, 64, 64, 3), jnp.bfloat16), optimizer=tx)
    step = make_train_step(model, optimizer=tx)
    eval_step = make_eval_step(model)
    eval_imgs, eval_labels = batch(jax.random.PRNGKey(999), 256)  # held out

    t0 = time.perf_counter()
    first_loss = None
    for i in range(steps):
        imgs, labels = batch(jax.random.fold_in(key, i))
        state, loss = step(state, imgs, labels)
        if i == 0:
            first_loss = float(loss)
        if (i + 1) % 50 == 0:
            ev_loss, ev_top1 = eval_step({"params": state.params}, eval_imgs, eval_labels)
            print(f"step {i+1}: train_loss {float(loss):.3f}  "
                  f"eval_loss {float(ev_loss):.3f}  eval_top1 {float(ev_top1):.3f}",
                  flush=True)
    ev_loss, ev_top1 = eval_step({"params": state.params}, eval_imgs, eval_labels)
    print(f"converged in {time.perf_counter()-t0:.0f}s: "
          f"train loss {first_loss:.3f} -> {float(loss):.3f}, "
          f"held-out top-1 {float(ev_top1):.3f} (chance 0.10)", flush=True)
    assert float(loss) < first_loss and float(ev_top1) > 0.5, "did not converge"


if __name__ == "__main__":
    if "converge" in sys.argv[1:]:
        converge()
    else:
        main()
