"""ScalableViT stage profile, chained on-device timing (VERDICT r2 item 3).

The bench config (dim 64, depth (2,2,20,2), reduction (8,4,2,1),
window (64,32,None,None), img 256, batch 64) puts every IWSA at a
full-fmap window (window >= fmap side), so IWSA is plain global attention
at 4096/1024/256/64 tokens. Stage 2 (fmap 16, dim 256, x20 blocks)
carries most of the depth. This measures each stage's SSA / IWSA /
ConvMLP in isolation with the chained harness (r3util.chain_timed: 16
applications inside one jit, scalar reduce — per-dispatch tunnel noise
divided out), then candidate levers:

  iwsa-fused-qkv   one qkv GEMM + zero-copy kernel instead of 3 Dense
  ssa-s2d          SSA k/v reduction conv as space-to-depth + one GEMM

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_scalable2.py
"""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import jax
import jax.numpy as jnp
import numpy as np

from r3util import chain_timed, probe_ms, timed_scalar
from vit_tpu import ops
from vit_tpu.models.scalable_vit import _IWSA, _SSA
from vit_tpu.nn.conv import ConvMLP

B = 64
DT = jnp.bfloat16

# stage s: (fmap, dim, heads, ssa_dk, red, iwsa_dk, window)
STAGES = [
    (64, 64, 2, 40, 8, 32, 64),
    (32, 128, 4, 40, 4, 32, 32),
    (16, 256, 8, 40, 2, 32, None),
    (8, 512, 16, 32, 1, 32, None),
]
DEPTHS = [2, 2, 20, 2]


def main():
    print(f"probe: {probe_ms():.2f} ms/dispatch", flush=True)
    key = jax.random.PRNGKey(0)
    total = 0.0
    for s, (fmap, dim, heads, ssa_dk, red, iwsa_dk, window) in enumerate(STAGES):
        x = jax.random.normal(key, (B, fmap, fmap, dim), DT)

        ssa = _SSA(dim, heads, ssa_dk, ssa_dk, 0.0, red, dtype=DT)
        pv = ssa.init({"params": key}, x)
        t_ssa = chain_timed(lambda c: ssa.apply(pv, c), x, chain=16)

        iwsa = _IWSA(dim, window, heads, iwsa_dk, iwsa_dk, 0.0, dtype=DT)
        pw = iwsa.init({"params": key}, x)
        t_iwsa = chain_timed(lambda c: iwsa.apply(pw, c), x, chain=16)

        mlp = ConvMLP(dim, 4, dtype=DT)
        pm = mlp.init({"params": key}, x)
        t_mlp = chain_timed(lambda c: mlp.apply(pm, c), x, chain=16)

        per_block = t_ssa + t_iwsa + 2 * t_mlp
        stage_t = per_block * DEPTHS[s]
        total += stage_t
        print(f"stage {s} (fmap {fmap} dim {dim} x{DEPTHS[s]}): "
              f"ssa {t_ssa:.3f}  iwsa {t_iwsa:.3f}  mlp {t_mlp:.3f} "
              f"-> {per_block:.3f} ms/block, {stage_t:.1f} ms/stage", flush=True)
    print(f"sum of isolated stages: {total:.1f} ms", flush=True)

    # Lever A: IWSA attention core — 3 separate Dense projections + flash
    # vs ONE fused qkv GEMM + the zero-copy kernel (dk == dv here).
    for s, (fmap, dim, heads, _sdk, _red, iwsa_dk, window) in enumerate(STAGES):
        n = fmap * fmap
        x = jax.random.normal(key, (B, n, dim), DT)
        wq = (jax.random.normal(key, (dim, heads * iwsa_dk)) * 0.05).astype(DT)
        wk = (jax.random.normal(jax.random.PRNGKey(1), (dim, heads * iwsa_dk)) * 0.05).astype(DT)
        wv = (jax.random.normal(jax.random.PRNGKey(2), (dim, heads * iwsa_dk)) * 0.05).astype(DT)
        wqkv = jnp.concatenate([wq, wk, wv], axis=1)
        wout = (jax.random.normal(jax.random.PRNGKey(3), (heads * iwsa_dk, dim)) * 0.05).astype(DT)

        from vit_tpu.nn.attention import mha_tokens

        def three_gemm(x):
            q, k, v = x @ wq, x @ wk, x @ wv
            return mha_tokens(q, k, v, heads, scale=iwsa_dk**-0.5) @ wout

        def fused_qkv(x):
            qkv = jnp.matmul(x, wqkv, preferred_element_type=jnp.float32).astype(DT)
            return ops.qkv_attention(qkv, heads, scale=iwsa_dk**-0.5) @ wout

        t3 = chain_timed(three_gemm, x, chain=16)
        tf = chain_timed(fused_qkv, x, chain=16)
        print(f"stage {s} iwsa core (n={n}, hd={heads*iwsa_dk}): "
              f"3-GEMM+flash {t3:.3f} ms  fused-qkv {tf:.3f} ms", flush=True)

    # Lever B: SSA k/v reduction — strided (r,r) conv vs space-to-depth +
    # one GEMM over both k and v (one (r*r*dim, 2*hd) contraction).
    for s, (fmap, dim, heads, ssa_dk, red, _idk, _w) in enumerate(STAGES):
        if red == 1:
            continue
        hd = heads * ssa_dk
        x = jax.random.normal(key, (B, fmap, fmap, dim), DT)
        wk_conv = (jax.random.normal(key, (red, red, dim, hd)) * 0.05).astype(DT)
        wv_conv = (jax.random.normal(jax.random.PRNGKey(1), (red, red, dim, hd)) * 0.05).astype(DT)

        def conv_kv(x):
            k = jax.lax.conv_general_dilated(
                x, wk_conv, (red, red), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            v = jax.lax.conv_general_dilated(
                x, wv_conv, (red, red), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            # same-shape output for chaining: broadcast-add reduced maps back
            up = jax.image.resize(k + v, x.shape[:3] + (hd,), "nearest")
            return up[..., :dim] if hd >= dim else jnp.pad(up, ((0,0),(0,0),(0,0),(0,dim-hd)))

        w2 = jnp.concatenate(
            [wk_conv.reshape(red * red * dim, hd), wv_conv.reshape(red * red * dim, hd)],
            axis=1)

        def s2d_kv(x):
            b, h, w_, c = x.shape
            xs = x.reshape(b, h // red, red, w_ // red, red, c).transpose(0, 1, 3, 2, 4, 5)
            xs = xs.reshape(b, h // red, w_ // red, red * red * c)
            kv = jnp.matmul(xs, w2, preferred_element_type=jnp.float32).astype(DT)
            k, v = kv[..., :hd], kv[..., hd:]
            up = jax.image.resize(k + v, x.shape[:3] + (hd,), "nearest")
            return up[..., :dim] if hd >= dim else jnp.pad(up, ((0,0),(0,0),(0,0),(0,dim-hd)))

        tc = chain_timed(conv_kv, x, chain=16)
        ts = chain_timed(s2d_kv, x, chain=16)
        print(f"stage {s} ssa kv-reduce (r={red}): conv {tc:.3f} ms  s2d+GEMM {ts:.3f} ms",
              flush=True)

    # whole model, both orders of magnitude check
    from vit_tpu.models import ScalableViT
    img = jax.random.normal(key, (B, 256, 256, 3), jnp.float32)
    model = ScalableViT(
        num_classes=1000, dim=64, heads=(2, 4, 8, 16), depth=(2, 2, 20, 2),
        ssa_dim_key=(40, 40, 40, 32), reduction_factor=(8, 4, 2, 1),
        window_size=(64, 32, None, None), dropout=0.0, dtype=DT)
    params = model.init({"params": key}, img[:1])
    t = timed_scalar(lambda p, x: model.apply(p, x), params, img)
    print(f"whole model: {t:.1f} ms ({B / (t / 1e3):.0f} img/s)", flush=True)


if __name__ == "__main__":
    main()
