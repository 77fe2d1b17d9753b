"""Where does the 0.015 logit divergence enter? Compare the residual stream
of the reference ViT-L (fp32, jit, capture_intermediates) against the
numerically-parallel study forward, layer by layer.

If divergence starts ~f32-ulp and grows smoothly -> chaotic amplification
(floor). If it jumps at one site -> structural mismatch (fixable).
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from scripts.precision_study import CFG, LN_FLAX, forward, ln, gemm  # noqa: E402


def study_stream(params, img):
    """Replica of precision_study.forward (bf16 sites, flax-LN) that also
    returns the residual stream after every layer."""
    enc = params["encoder"]["blocks"]
    heads = CFG["heads"]
    HEAD_DIM = 64
    b = img.shape[0]
    p = CFG["patch_size"]
    h = w = CFG["image_size"] // p
    patches = img.reshape(b, h, p, w, p, 3).transpose(0, 1, 3, 2, 4, 5).reshape(
        b, h * w, p * p * 3
    )
    pe = params["patch_embed"]["proj"]
    x = gemm(patches, pe["kernel"], False).astype(jnp.float32) + pe["bias"]
    cls = jnp.broadcast_to(params["cls"].astype(jnp.float32), (b, 1, CFG["dim"]))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embedding"].astype(jnp.float32)
    x0 = x

    def layer(x, lp):
        ap, fp = lp
        xn = ln(x, ap["norm_scale"], ap["norm_bias"])
        qkv = gemm(xn, ap["qkv_kernel"], False)
        n = x.shape[1]
        qkv = qkv.reshape(b, n, 3, heads, HEAD_DIM).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        s = jnp.einsum("bhid,bhjd->bhij", q.astype(jnp.bfloat16),
                       k.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
        s = s.astype(jnp.float32) * HEAD_DIM ** -0.5
        probs = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhij,bhjd->bhid", probs.astype(jnp.bfloat16),
                       v.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
        o = o.transpose(0, 2, 1, 3).reshape(b, n, heads * HEAD_DIM)
        o = gemm(o, ap["out_kernel"], False).astype(jnp.float32) + ap["out_bias"]
        x = x + o
        mid = x
        xn = ln(x, fp["ln_scale"], fp["ln_bias"])
        hdn = gemm(xn, fp["w1"], False).astype(jnp.float32)
        hdn = jax.nn.gelu(hdn + fp["b1"].astype(jnp.float32))
        o = gemm(hdn, fp["w2"], False).astype(jnp.float32) + fp["b2"]
        return x + o, (mid, x + o)

    x, streams = jax.lax.scan(layer, x, (enc["attn"], enc["ff"]))
    return x0, streams


def main():
    sys.path.insert(0, "/root/reference/vit_flax")
    import vit as ref_vit

    from vit_tpu.utils import import_reference_vit_params

    LN_FLAX[0] = True
    key = jax.random.PRNGKey(0)
    img = jax.random.normal(key, (8, 224, 224, 3), jnp.float32)

    ref_model = ref_vit.ViT(**CFG, dropout=0.0, emb_dropout=0.0)
    rngs = {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2),
            "emb_dropout": jax.random.PRNGKey(3)}
    ref_params = jax.jit(lambda: ref_model.init(rngs, img[:1]))()

    _, inter = jax.jit(
        lambda p, x: ref_model.apply(
            p, x, rngs=rngs, capture_intermediates=True, mutable=["intermediates"]
        )
    )(ref_params, img)
    inter = inter["intermediates"]
    tr = inter["Transformer_0"]
    # Residual_{2i} = after attention of layer i; Residual_{2i+1} = after FF.
    ref_streams = []
    for i in range(CFG["depth"]):
        ref_streams.append(np.asarray(tr[f"Residual_{2 * i}"]["__call__"][0]))
        ref_streams.append(np.asarray(tr[f"Residual_{2 * i + 1}"]["__call__"][0]))

    params = import_reference_vit_params(ref_params, CFG["depth"])["params"]
    x0, (mid, post) = jax.jit(study_stream)(params, img)
    mid, post = np.asarray(mid), np.asarray(post)

    print("layer | after-attn max|Δ| (rel)   | after-ff max|Δ| (rel)")
    for i in range(CFG["depth"]):
        ra, rf = ref_streams[2 * i], ref_streams[2 * i + 1]
        da = np.max(np.abs(mid[i] - ra)) / (np.max(np.abs(ra)) + 1e-9)
        df = np.max(np.abs(post[i] - rf)) / (np.max(np.abs(rf)) + 1e-9)
        print(f"{i:5d} | {np.max(np.abs(mid[i] - ra)):.3e} ({da:.1e}) | "
              f"{np.max(np.abs(post[i] - rf)):.3e} ({df:.1e})", flush=True)


if __name__ == "__main__":
    main()
