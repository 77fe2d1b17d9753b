"""ScalableViT stage profile (VERDICT r2 item 3: get it off 1.00x).

The bench config (dim 64, depth (2,2,20,2), reduction (8,4,2,1),
window (64,32,None,None), img 256, batch 64) puts every IWSA at a
full-fmap window (window >= fmap side), so IWSA is plain global attention
at 4096/1024/256/64 tokens and the multi-window kernel is irrelevant here.
This measures where the 81 ms/batch actually goes: each stage's SSA, IWSA
and ConvMLP in isolation at its true fmap/dim/batch, plus op-level
variants (fused single qkv GEMM for IWSA, flash vs XLA attention per
stage) to find a lever.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_scalable.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from vit_tpu import ops
from vit_tpu.models.scalable_vit import _IWSA, _SSA
from vit_tpu.nn.conv import ConvMLP

B = 64
ITERS = 10
DT = jnp.bfloat16

# stage s: (fmap, dim, heads, ssa_dk, red, iwsa_dk, window)
STAGES = [
    (64, 64, 2, 40, 8, 32, 64),
    (32, 128, 4, 40, 4, 32, 32),
    (16, 256, 8, 40, 2, 32, None),
    (8, 512, 16, 32, 1, 32, None),
]
DEPTHS = [2, 2, 20, 2]


def timed(fn, *args):
    np.asarray(fn(*args))
    np.asarray(fn(*args))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / ITERS * 1e3


def main():
    probe = jax.jit(lambda a: a @ a)
    print(f"probe matmul: {timed(probe, jnp.ones((2048, 2048), DT)):.2f} ms", flush=True)

    key = jax.random.PRNGKey(0)
    total = 0.0
    for s, (fmap, dim, heads, ssa_dk, red, iwsa_dk, window) in enumerate(STAGES):
        x = jax.random.normal(key, (B, fmap, fmap, dim), DT)

        ssa = _SSA(dim, heads, ssa_dk, ssa_dk, 0.0, red, dtype=DT)
        pv = ssa.init({"params": key}, x)
        t_ssa = timed(jax.jit(lambda v, x: ssa.apply(v, x)), pv, x)

        iwsa = _IWSA(dim, window, heads, iwsa_dk, iwsa_dk, 0.0, dtype=DT)
        pw = iwsa.init({"params": key}, x)
        t_iwsa = timed(jax.jit(lambda v, x: iwsa.apply(v, x)), pw, x)

        mlp = ConvMLP(dim, 4, dtype=DT)
        pm = mlp.init({"params": key}, x)
        t_mlp = timed(jax.jit(lambda v, x: mlp.apply(v, x)), pm, x)

        per_block = t_ssa + t_iwsa + 2 * t_mlp
        stage_t = per_block * DEPTHS[s]
        total += stage_t
        print(f"stage {s} (fmap {fmap} dim {dim} x{DEPTHS[s]}): "
              f"ssa {t_ssa:.2f}  iwsa {t_iwsa:.2f}  mlp {t_mlp:.2f} "
              f"-> {per_block:.2f} ms/block, {stage_t:.1f} ms/stage", flush=True)
    print(f"sum of isolated stages: {total:.1f} ms "
          f"(whole model measured ~81 ms at this batch)", flush=True)

    # Variant: IWSA's three Dense projections as ONE fused GEMM + in-kernel
    # attention (the ops.qkv_attention zero-copy path) — same math when
    # dk == dv; measures whether the 3-GEMM + transpose pipeline is the cost.
    for s, (fmap, dim, heads, _sdk, _red, iwsa_dk, window) in enumerate(STAGES):
        n = fmap * fmap
        x = jax.random.normal(key, (B, n, dim), DT)
        wq = (jax.random.normal(key, (dim, heads * iwsa_dk)) * 0.05).astype(DT)
        wk = (jax.random.normal(key, (dim, heads * iwsa_dk)) * 0.05).astype(DT)
        wv = (jax.random.normal(key, (dim, heads * iwsa_dk)) * 0.05).astype(DT)
        wqkv = jnp.concatenate([wq, wk, wv], axis=1)

        def three_gemm(x):
            from vit_tpu.nn.attention import mha_tokens
            q, k, v = x @ wq, x @ wk, x @ wv
            return mha_tokens(q, k, v, heads, scale=iwsa_dk**-0.5)

        def fused_qkv(x):
            qkv = jnp.matmul(x, wqkv, preferred_element_type=jnp.float32).astype(DT)
            return ops.qkv_attention(qkv, heads, scale=iwsa_dk**-0.5)

        t3 = timed(jax.jit(three_gemm), x)
        tf = timed(jax.jit(fused_qkv), x)
        print(f"stage {s} iwsa core (n={n}): 3-GEMM+flash {t3:.2f} ms  "
              f"fused-qkv kernel {tf:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
