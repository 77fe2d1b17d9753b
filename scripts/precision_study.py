"""Attribute ViT-L bf16 logit error to individual GEMM sites.

Builds the reference ViT-L (fp32, jit) as golden, imports its params, and
runs a standalone forward where every GEMM site can independently run in
bf16 (operands rounded to bf16, fp32 accumulation — the MXU fast path) or
fp32 (HIGHEST). The residual stream is held fp32 throughout (the mixed
mode). Output: max-logit error per configuration, printed as a table.

Usage:  python scripts/precision_study.py
"""

from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np

CFG = dict(
    image_size=224, patch_size=16, num_classes=1000,
    dim=1024, depth=24, heads=16, mlp_dim=4096,
)
HEAD_DIM = 64

SITES = ("patch", "qkv", "scores", "pv", "out", "mlp_up", "mlp_down")


def gemm(a, b, fp32: bool, algorithm=None):
    """Matmul with per-site precision: bf16 operands w/ fp32 accum, or f32."""
    if algorithm is not None:
        return jnp.matmul(
            a.astype(jnp.float32), b.astype(jnp.float32), precision=algorithm
        )
    if fp32:
        return jnp.matmul(
            a.astype(jnp.float32), b.astype(jnp.float32),
            precision=jax.lax.Precision.HIGHEST,
        )
    return jnp.matmul(
        a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )


LN_FLAX = [False]  # mutated per-config: mimic flax fast-variance LayerNorm


def ln(x, scale, bias, eps=1e-6):
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    if LN_FLAX[0]:
        # flax.linen.LayerNorm: use_fast_variance=True computes
        # var = mean(x^2) - mean^2, and folds the learned scale into the
        # rsqrt multiplier before applying to (x - mean).
        var = jnp.maximum(
            0.0, jnp.mean(jnp.square(x), axis=-1, keepdims=True) - jnp.square(mean)
        )
        mul = jax.lax.rsqrt(var + eps) * scale
        return (x - mean) * mul + bias
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def forward(params, img, fp32_sites: frozenset, algos_items: tuple):
    """Standalone ViT forward, stream fp32, per-site precision knobs."""
    algos = dict(algos_items)
    f = lambda s: s in fp32_sites
    a = lambda s: algos.get(s)
    enc = params["encoder"]["blocks"]
    attn, ff = enc["attn"], enc["ff"]
    heads = CFG["heads"]

    b = img.shape[0]
    p = CFG["patch_size"]
    h = w = CFG["image_size"] // p
    patches = img.reshape(b, h, p, w, p, 3).transpose(0, 1, 3, 2, 4, 5).reshape(
        b, h * w, p * p * 3
    )
    pe = params["patch_embed"]["proj"]
    x = gemm(patches, pe["kernel"], f("patch"), a("patch")).astype(jnp.float32)
    x = x + pe["bias"].astype(jnp.float32)

    cls = jnp.broadcast_to(params["cls"].astype(jnp.float32), (b, 1, CFG["dim"]))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embedding"].astype(jnp.float32)

    def layer(x, lp):
        ap, fp = lp
        xn = ln(x, ap["norm_scale"], ap["norm_bias"])
        qkv = gemm(xn, ap["qkv_kernel"], f("qkv"), a("qkv"))
        n = x.shape[1]
        qkv = qkv.reshape(b, n, 3, heads, HEAD_DIM).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        if a("scores") is not None:
            s = jnp.einsum("bhid,bhjd->bhij", q.astype(jnp.float32),
                           k.astype(jnp.float32), precision=a("scores"))
        elif f("scores"):
            s = jnp.einsum("bhid,bhjd->bhij", q.astype(jnp.float32),
                           k.astype(jnp.float32),
                           precision=jax.lax.Precision.HIGHEST)
        else:
            s = jnp.einsum("bhid,bhjd->bhij", q.astype(jnp.bfloat16),
                           k.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
        s = s.astype(jnp.float32) * HEAD_DIM ** -0.5
        probs = jax.nn.softmax(s, axis=-1)
        if a("pv") is not None:
            o = jnp.einsum("bhij,bhjd->bhid", probs, v.astype(jnp.float32),
                           precision=a("pv"))
        elif f("pv"):
            o = jnp.einsum("bhij,bhjd->bhid", probs, v.astype(jnp.float32),
                           precision=jax.lax.Precision.HIGHEST)
        else:
            o = jnp.einsum("bhij,bhjd->bhid", probs.astype(jnp.bfloat16),
                           v.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
        o = o.transpose(0, 2, 1, 3).reshape(b, n, heads * HEAD_DIM)
        o = gemm(o, ap["out_kernel"], f("out"), a("out")).astype(jnp.float32)
        o = o + ap["out_bias"].astype(jnp.float32)
        x = x + o

        xn = ln(x, fp["ln_scale"], fp["ln_bias"])
        hdn = gemm(xn, fp["w1"], f("mlp_up"), a("mlp_up")).astype(jnp.float32)
        hdn = jax.nn.gelu(hdn + fp["b1"].astype(jnp.float32))
        o = gemm(hdn, fp["w2"], f("mlp_down"), a("mlp_down")).astype(jnp.float32)
        o = o + fp["b2"].astype(jnp.float32)
        return x + o, None

    x, _ = jax.lax.scan(layer, x, (attn, ff))
    x = x[:, 0]
    hn = params["head_norm"]
    x = ln(x, hn["scale"], hn["bias"])
    hd = params["head"]
    return x @ hd["kernel"] + hd["bias"]


def main():
    sys.path.insert(0, "/root/reference/vit_flax")
    import vit as ref_vit

    sys.path.insert(0, "/root/repo")
    from vit_tpu.utils import import_reference_vit_params

    key = jax.random.PRNGKey(0)
    img = jax.random.normal(key, (8, 224, 224, 3), jnp.float32)

    ref_model = ref_vit.ViT(**CFG, dropout=0.0, emb_dropout=0.0)
    rngs = {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2),
            "emb_dropout": jax.random.PRNGKey(3)}
    ref_params = jax.jit(lambda: ref_model.init(rngs, img[:1]))()
    ref_logits = np.asarray(
        jax.jit(lambda p, x: ref_model.apply(p, x, rngs=rngs))(ref_params, img)
    )
    print(f"golden max|logit| = {np.max(np.abs(ref_logits)):.3f}", flush=True)

    params = import_reference_vit_params(ref_params, CFG["depth"])["params"]

    fwd = jax.jit(forward, static_argnames=("fp32_sites", "algos_items"))

    X3 = jax.lax.DotAlgorithmPreset.BF16_BF16_F32_X3

    configs = [
        ("all bf16", frozenset(), {}, False),
        ("all bf16 + flax-LN", frozenset(), {}, True),
        ("all fp32 + flax-LN", frozenset(SITES), {}, True),
        ("flax-LN +f32 scores+pv", frozenset({"scores", "pv"}), {}, True),
        ("flax-LN +x3 qkv", frozenset(), {"qkv": X3}, True),
    ]
    for name, sites, algos, ln_flax in configs:
        LN_FLAX[0] = ln_flax
        try:
            ours = np.asarray(
                fwd(params, img, fp32_sites=sites,
                    algos_items=tuple(sorted(algos.items())) + (("_lnflax", ln_flax),))
            )
            err = np.max(np.abs(ours - ref_logits))
            print(f"{name:38s} max_err = {err:.5f}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:38s} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
