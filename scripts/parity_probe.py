"""Decompose the ViT-L logit-parity error vs the jit-compiled reference.

Runs several precision configurations of our model against the reference and
against a HIGHEST-precision run of the reference itself, to show which
component (reference's own default-precision rounding, our bf16 stream, our
bf16 MXU internals, patch embed) contributes what.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

CFG = dict(
    image_size=224, patch_size=16, num_classes=1000,
    dim=1024, depth=24, heads=16, mlp_dim=4096,
)
BATCH = 8


def err(a, b):
    return float(np.max(np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32))))


def main():
    from vit_tpu.models import ViT
    from vit_tpu.utils import import_reference_vit_params

    img = jax.random.normal(jax.random.PRNGKey(0), (BATCH, 224, 224, 3), jnp.float32)

    sys.path.insert(0, "/root/reference/vit_flax")
    import vit as ref_vit

    ref_model = ref_vit.ViT(**CFG, dropout=0.0, emb_dropout=0.0)
    rngs = {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2),
            "emb_dropout": jax.random.PRNGKey(3)}
    ref_params = jax.jit(lambda: ref_model.init(rngs, img[:1]))()

    ref_default = jax.jit(lambda p, x: ref_model.apply(p, x, rngs=rngs))(ref_params, img)
    with jax.default_matmul_precision("highest"):
        ref_highest = jax.jit(lambda p, x: ref_model.apply(p, x, rngs=rngs))(ref_params, img)
    print(f"ref default-vs-highest precision self-error: {err(ref_default, ref_highest):.5f}")
    print(f"max |logit|: {float(np.max(np.abs(np.asarray(ref_default)))):.3f}")

    our_params = import_reference_vit_params(ref_params, CFG["depth"])

    def run(tag, **kw):
        model = ViT(**CFG, **kw)
        with jax.default_matmul_precision("highest"):
            ours = jax.jit(lambda p, x: model.apply(p, x))(our_params, img)
        e_def = err(ours, ref_default)
        e_hi = err(ours, ref_highest)
        print(f"{tag:50s} vs ref-default {e_def:.5f}  vs ref-highest {e_hi:.5f}")
        return ours

    run("ours fp32 (HIGHEST kernels)", dtype=jnp.float32)
    run("ours bf16 + fp32 residual (mixed)", dtype=jnp.bfloat16, residual_dtype=jnp.float32)
    run("ours bf16 (full)", dtype=jnp.bfloat16)


if __name__ == "__main__":
    main()
