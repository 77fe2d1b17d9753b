"""Round-5 CaiT decomposition (VERDICT r4 #8): where do the 21 ms/batch go,
and does the fused talking-heads kernel actually win its shape?

Zoo config (256/32, dim 1024, heads 16, depth 12 + cls 2): the patch stage
is n=64 — ALREADY sublane-aligned, so the round-4 padded-stream lever
(saving per-layer pad/slice) does not exist here. What remains is the
dispatch question: ``talking_heads_block`` routes to the fused kernel
whenever the backend isn't 'xla', with NO shape gating (ops/__init__.py)
— unlike attention_block, whose kernel-vs-XLA rule was measured per
shape. This script measures, zoo-style (batch 128, bf16):

  model-pallas / model-xla   whole model under each backend
  stage-pallas / stage-xla   the 12-layer talking-heads stage alone
  cls-stage                  the 2-layer class-attention stage alone
  embed                      patchify + pos add alone

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_cait_r5.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from vit_tpu import ops
from vit_tpu.models import CaiT
from vit_tpu.models.cait import _CaiTStage

B = 128
ITERS = 10
CFG = dict(image_size=256, patch_size=32, num_classes=1000, dim=1024,
           depth=12, cls_depth=2, heads=16, mlp_dim=2048)


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
    img = jax.random.normal(jax.random.PRNGKey(0), (B, 256, 256, 3),
                            jnp.float32)

    model = CaiT(**CFG, dtype=dtype)
    variables = jax.jit(
        lambda: model.init({"params": jax.random.PRNGKey(1)}, img[:1])
    )()

    ref_logits = None
    for mode in ("pallas", "xla"):
        def fwd(v, a, m=mode):
            with ops.force_backend(m):
                return model.apply(v, a)

        fn = jax.jit(fwd)
        ms = timed_ms(fn, variables, img)
        logits = np.asarray(fn(variables, img[:8]), np.float32)
        if ref_logits is None:
            ref_logits = logits
            err = 0.0
        else:
            err = float(np.max(np.abs(logits - ref_logits)))
        print(f"model-{mode}: {ms:.2f} ms/batch "
              f"({B/ms*1e3:.0f} img/s) err={err:.4f}", flush=True)

    # isolated stages on a pre-embedded stream
    x = jax.random.normal(jax.random.PRNGKey(2), (B, 64, 1024), dtype)
    stage = _CaiTStage(dim=1024, depth=12, heads=16, dim_head=64,
                       mlp_dim=2048, model_depth=14, dtype=dtype)
    sp = jax.jit(lambda: stage.init({"params": jax.random.PRNGKey(3)}, x))()
    for mode in ("pallas", "xla"):
        def sfwd(v, a, m=mode):
            with ops.force_backend(m):
                return stage.apply(v, a).sum()

        ms = timed_ms(jax.jit(sfwd), sp, x)
        print(f"stage12-{mode}: {ms:.2f} ms ({ms/12:.3f} ms/layer)",
              flush=True)

    cls_stage = _CaiTStage(dim=1024, depth=2, heads=16, dim_head=64,
                           mlp_dim=2048, model_depth=14, dtype=dtype)
    cls_tok = jax.random.normal(jax.random.PRNGKey(4), (B, 1, 1024), dtype)
    cp = jax.jit(
        lambda: cls_stage.init({"params": jax.random.PRNGKey(5)}, cls_tok, x)
    )()
    ms = timed_ms(jax.jit(lambda v, c, a: cls_stage.apply(v, c, a).sum()),
                  cp, cls_tok, x)
    print(f"cls-stage2: {ms:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
