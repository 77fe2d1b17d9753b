"""CvT stage/component profile, chained on-device timing (round 3: get the
folded-BN inference mode past 1.10x).

Bench config (defaults, img 256, batch 128): stage fmaps 64/32/16, dims
64/192/384, depths 1/2/10, kv stride 2. Per-component cost via
r3util.chain_timed, plus attention-core variants:

  xla-fp32     mha_tokens as-is on the fp32 stream (what ships today)
  flash-bf16   cast q/k/v to bf16 -> flash kernel -> cast back

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_cvt.py
"""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import jax
import jax.numpy as jnp
import numpy as np

from r3util import chain_timed, probe_ms
from vit_tpu.models.cvt import _ConvAttention
from vit_tpu.nn.conv import ConvMLP
from vit_tpu.nn.attention import mha_tokens

B = 128

# stage: (fmap, dim, heads, depth)
STAGES = [(64, 64, 1, 1), (32, 192, 3, 2), (16, 384, 6, 10)]


def main():
    print(f"probe: {probe_ms():.2f} ms/dispatch", flush=True)
    key = jax.random.PRNGKey(0)
    total = 0.0
    for s, (fmap, dim, heads, depth) in enumerate(STAGES, start=1):
        x = jax.random.normal(key, (B, fmap, fmap, dim), jnp.float32)

        attn = _ConvAttention(dim, 3, 2, heads=heads, fold_bn=True)
        pa = attn.init({"params": key}, x)
        t_attn = chain_timed(lambda c: attn.apply(pa, c), x, chain=8)

        mlp = ConvMLP(dim, 4)
        pm = mlp.init({"params": key}, x)
        t_mlp = chain_timed(lambda c: mlp.apply(pm, c), x, chain=8)

        per_block = t_attn + t_mlp
        total += per_block * depth
        print(f"stage {s} (fmap {fmap} dim {dim} x{depth}): attn {t_attn:.3f}  "
              f"mlp {t_mlp:.3f} -> {per_block:.3f} ms/block, "
              f"{per_block * depth:.1f} ms/stage", flush=True)
    print(f"sum of isolated blocks: {total:.1f} ms (embeds/head excluded)", flush=True)

    # attention-core variants per stage (token layout, conv projections done)
    for s, (fmap, dim, heads, depth) in enumerate(STAGES, start=1):
        inner = heads * 64
        nq = fmap * fmap
        nk = (fmap // 2) * (fmap // 2)
        q = jax.random.normal(key, (B, nq, inner), jnp.float32)
        k = jax.random.normal(jax.random.PRNGKey(1), (B, nk, inner), jnp.float32)
        v = jax.random.normal(jax.random.PRNGKey(2), (B, nk, inner), jnp.float32)

        def xla_fp32(q):
            return mha_tokens(q, k, v, heads, scale=64**-0.5)

        def flash_bf16(q):
            o = mha_tokens(q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                           v.astype(jnp.bfloat16), heads, scale=64**-0.5)
            return o.astype(jnp.float32)

        t_x = chain_timed(xla_fp32, q, chain=8)
        t_f = chain_timed(flash_bf16, q, chain=8)
        print(f"stage {s} attn core (nq={nq} nk={nk} heads={heads}): "
              f"xla-fp32 {t_x:.3f} ms  flash-bf16 {t_f:.3f} ms  "
              f"(x{depth} depth -> saves {(t_x - t_f) * depth:.2f} ms)", flush=True)


if __name__ == "__main__":
    main()
