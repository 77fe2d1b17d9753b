"""Quick parity measurement: our ViT-L (bf16 and mixed) vs the jitted
reference, on the bench's exact inputs. Also reports the reference's own
execution noise (batch-8 jit vs batch-128 jit sliced) and both sides'
distance from an fp64 host-computed golden — the context that makes the
parity number interpretable (see PARITY.md).
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

CFG = dict(
    image_size=224, patch_size=16, num_classes=1000,
    dim=1024, depth=24, heads=16, mlp_dim=4096,
)


def fp64_forward(params, img):
    """Exact fp64 reference math on host numpy (the true function)."""
    from vit_tpu.utils import fp64_vit_forward

    return fp64_vit_forward(
        params, img,
        patch_size=CFG["patch_size"], depth=CFG["depth"], heads=CFG["heads"],
    )


def main():
    from vit_tpu.models import ViT
    from vit_tpu.utils import import_reference_vit_params

    sys.path.insert(0, "/root/reference/vit_flax")
    import vit as ref_vit

    key = jax.random.PRNGKey(0)
    img = jax.random.normal(key, (128, 224, 224, 3), jnp.float32)

    ref_model = ref_vit.ViT(**CFG, dropout=0.0, emb_dropout=0.0)
    rngs = {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2),
            "emb_dropout": jax.random.PRNGKey(3)}
    ref_params = jax.jit(lambda: ref_model.init(rngs, img[:1]))()
    ref_apply = jax.jit(lambda p, x: ref_model.apply(p, x, rngs=rngs))
    ref8 = np.asarray(ref_apply(ref_params, img[:8]))
    ref128 = np.asarray(ref_apply(ref_params, img))[:8]
    print(f"reference self-noise (batch-8 jit vs batch-128 jit, same inputs): "
          f"{np.max(np.abs(ref8 - ref128)):.5f}", flush=True)

    params = import_reference_vit_params(ref_params, CFG["depth"])

    for name, kw, in_dtype in [
        ("ours bf16", dict(dtype=jnp.bfloat16), jnp.bfloat16),
        ("ours mixed", dict(dtype=jnp.bfloat16, residual_dtype=jnp.float32), jnp.float32),
    ]:
        model = ViT(**CFG, **kw)
        apply = jax.jit(lambda p, x, m=model: m.apply(p, x))
        ours = np.asarray(apply(params, img[:8].astype(in_dtype)), np.float32)
        print(f"{name:11s} vs reference-jit(batch8): {np.max(np.abs(ours - ref8)):.5f}",
              flush=True)

    golden64 = fp64_forward(jax.device_get(ref_params), np.asarray(img[:8]))
    print(f"reference-jit vs fp64 exact: {np.max(np.abs(ref8 - golden64)):.5f}")
    model = ViT(**CFG, dtype=jnp.bfloat16, residual_dtype=jnp.float32)
    ours = np.asarray(jax.jit(lambda p, x: model.apply(p, x))(params, img[:8]), np.float32)
    print(f"ours-mixed    vs fp64 exact: {np.max(np.abs(ours - golden64)):.5f}")


if __name__ == "__main__":
    main()
