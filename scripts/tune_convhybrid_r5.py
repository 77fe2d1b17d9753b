"""Round-5 conv-hybrid dtype study (VERDICT r4 #4): attack cvt 1.16x /
levit 1.10x with a structural lever instead of the fp32 fallback.

Round 3 measured whole-model bf16 SLOWER than fp32 for the conv hybrids
("bf16 depthwise/BN pipelines lose more to conversions than the GEMMs
save") and shipped fp32. But the zoo ships fold_bn=True graphs (no BN at
inference) and flax keeps params fp32 with per-op casts — so the
conversions are (a) per-op param casts and (b) any BN that survived. This
script measures, zoo-style (batch 128, pull-last-output sync):

  fp32-fold     what ships today (PERF_ZOO comparator)
  bf16-fold     dtype=bf16, fp32 params cast per-op (the round-3 loser)
  bf16-w16      dtype=bf16 AND params pre-cast to bf16 (halves weight HBM
                traffic, deletes every per-op cast at the source)

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/tune_convhybrid_r5.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from vit_tpu import models as M
from vit_tpu.utils import fold_batch_norm

B = 128
ITERS = 10


def timed(fn, *args):
    np.asarray(fn(*args))
    np.asarray(fn(*args))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / ITERS
    return B / dt


def study(name, cls, cfg, img_side):
    img = jax.random.normal(jax.random.PRNGKey(0), (B, img_side, img_side, 3),
                            jnp.float32)

    rows = {}
    ref_logits = None
    for mode, dtype, cast_params in (
        ("fp32-fold", None, False),
        ("bf16-fold", jnp.bfloat16, False),
        ("bf16-w16", jnp.bfloat16, True),
    ):
        model = cls(**cfg, dtype=dtype)
        variables = jax.jit(
            lambda m=model: m.init({"params": jax.random.PRNGKey(1)}, img[:1])
        )()
        model, variables = fold_batch_norm(model, jax.device_get(variables))
        if cast_params:
            variables = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if getattr(x, "dtype", None) == np.float32 else x, variables
            )
        variables = jax.device_put(variables)
        x = img.astype(dtype) if dtype is not None else img
        fn = jax.jit(lambda v, a, m=model: m.apply(v, a))
        out = jax.eval_shape(fn, variables, x)
        if isinstance(out, tuple):
            fn0 = fn
            fn = jax.jit(lambda v, a: fn0(v, a)[0])
        ips = timed(fn, variables, x)
        logits = np.asarray(fn(variables, x[:8]), np.float32)
        if ref_logits is None:
            ref_logits = logits
            err = 0.0
        else:
            err = float(np.max(np.abs(logits - ref_logits)))
        rows[mode] = ips
        print(f"{name} {mode}: {ips:.1f} img/s  max_logit_err={err:.4f}",
              flush=True)
    best = max(rows, key=rows.get)
    print(f"{name} best: {best} ({rows[best]:.1f} img/s, "
          f"{rows[best]/rows['fp32-fold']:.3f}x vs ship)", flush=True)


def main():
    study("cvt", M.CvT, dict(num_classes=1000), 256)
    study(
        "levit", M.LeViT,
        dict(image_size=224, num_classes=1000, stages=3, dim=(256, 384, 512),
             depth=4, heads=(4, 6, 8), mlp_mult=2, dropout=0.0),
        224,
    )


if __name__ == "__main__":
    main()
