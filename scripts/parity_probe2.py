"""Probe 2: which component's bf16 rounding drives the mixed-mode error
vs the reference's exact math (ref @ HIGHEST)?

Technique: run the model at dtype=f32 (all kernels HIGHEST) but surgically
downgrade one component to bf16 MXU by wrapping the ops dispatcher.
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
    from vit_tpu import ops
    from vit_tpu.models import ViT
    from vit_tpu.utils import import_reference_vit_params

    img = jax.random.normal(jax.random.PRNGKey(0), (BATCH, 224, 224, 3), jnp.float32)

    sys.path.insert(0, "/root/reference/vit_flax")
    import vit as ref_vit

    ref_model = ref_vit.ViT(**CFG, dropout=0.0, emb_dropout=0.0)
    rngs = {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2),
            "emb_dropout": jax.random.PRNGKey(3)}
    ref_params = jax.jit(lambda: ref_model.init(rngs, img[:1]))()
    with jax.default_matmul_precision("highest"):
        ref_highest = jax.jit(lambda p, x: ref_model.apply(p, x, rngs=rngs))(ref_params, img)

    our_params = import_reference_vit_params(ref_params, CFG["depth"])
    model = ViT(**CFG, dtype=jnp.float32)

    orig_block = ops.attention_block
    orig_mlp = ops.mlp

    def bf16_block(x, ln_scale, ln_bias, wqkv, wout, bout, heads, **kw):
        return orig_block(
            x, ln_scale, ln_bias,
            wqkv.astype(jnp.bfloat16), wout.astype(jnp.bfloat16),
            bout.astype(jnp.bfloat16), heads, **kw,
        )

    def bf16_mlp(x, w1, b1, w2, b2, ln_scale=None, ln_bias=None, **kw):
        c = lambda t: None if t is None else t.astype(jnp.bfloat16)
        return orig_mlp(x, c(w1), c(b1), c(w2), c(b2), ln_scale, ln_bias, **kw)

    def run(tag, attn_bf16=False, mlp_bf16=False):
        ops.attention_block = bf16_block if attn_bf16 else orig_block
        ops.mlp = bf16_mlp if mlp_bf16 else orig_mlp
        # patch the re-exported names used by modules
        import vit_tpu.nn.attention as A
        import vit_tpu.nn.blocks as B
        A.ops = ops
        B.ops = ops
        with jax.default_matmul_precision("highest"):
            out = jax.jit(lambda p, x: model.apply(p, x))(our_params, img)
        print(f"{tag:40s} vs ref-highest: {err(out, ref_highest):.5f}")

    run("all fp32 (sanity)")
    run("attention bf16 only", attn_bf16=True)
    run("mlp bf16 only", mlp_bf16=True)
    run("both bf16 (fp32 stream/embed/head)", attn_bf16=True, mlp_bf16=True)


if __name__ == "__main__":
    main()
