"""Does unrolling the mixed-mode encoder tighten parity to the reference?

PARITY.md traces the residual 1.5e-2 to fusion-neighborhood differences:
the jitted reference unrolls 24 distinct layers (each fused differently,
each with its own f32-ulp LN reduction order), while our scanned stack
compiles ONE block body reused 24 times. Hypothesis: VIT_TPU_SCAN_UNROLL=24
(straight-line HLO like the reference) re-correlates per-layer rounding
with the golden's and drops max-logit err below the 0.0153 self-noise.

Also times both (chained full-model apply) to check what unroll costs.

Run: VIT_TPU_SCAN_UNROLL=24 is set inside; uses ViT-L/16 @224 with
reference-imported weights, 8 images, like bench.py's parity leg.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from vit_tpu.utils import (
    enable_compilation_cache,
    import_reference_vit_params,
    max_logit_err,
)

CFG = dict(image_size=224, patch_size=16, num_classes=1000,
           dim=1024, depth=24, heads=16, mlp_dim=4096)


def main():
    enable_compilation_cache()
    key = jax.random.PRNGKey(0)
    img = jax.random.normal(key, (8, 224, 224, 3), jnp.float32)

    sys.path.insert(0, "/root/reference/vit_flax")
    import vit as ref_vit

    ref_model = ref_vit.ViT(**CFG, dropout=0.0, emb_dropout=0.0)
    rngs = {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2),
            "emb_dropout": jax.random.PRNGKey(3)}
    ref_params = jax.jit(lambda: ref_model.init(rngs, img[:1]))()
    ref_apply = jax.jit(lambda p, x: ref_model.apply(p, x, rngs=rngs))
    ref_logits = np.asarray(ref_apply(ref_params, img))

    from vit_tpu.models import ViT

    our_params = import_reference_vit_params(ref_params, CFG["depth"])

    for unroll in ("1", "4", "24"):
        os.environ["VIT_TPU_SCAN_UNROLL"] = unroll
        model = ViT(**CFG, dtype=jnp.bfloat16, residual_dtype=jnp.float32)
        apply = jax.jit(lambda p, x: model.apply(p, x))
        t0 = time.perf_counter()
        logits = np.asarray(apply(our_params, img))
        compile_s = time.perf_counter() - t0
        err = max_logit_err(logits, ref_logits)
        # quick timing at batch 128 (pipelined mean like bench.py)
        big = jax.random.normal(key, (128, 224, 224, 3), jnp.float32)
        np.asarray(apply(our_params, big))
        t0 = time.perf_counter()
        for _ in range(10):
            out = apply(our_params, big)
        np.asarray(out)
        ms = (time.perf_counter() - t0) / 10 * 1e3
        print(f"unroll={unroll}: max_logit_err={err:.5f}  "
              f"batch128 {ms:.1f} ms ({128 / ms * 1e3:.0f} img/s)  "
              f"first-call {compile_s:.0f}s", flush=True)
        jax.clear_caches()


if __name__ == "__main__":
    main()
