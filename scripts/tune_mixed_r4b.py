"""Round-4 mixed-mode MLP variants (follow-up to tune_mixed_r4.py, which
isolated the ENTIRE mixed-vs-bf16 gap to the XLA MLP's fp32-stream traffic:
attn kernel 2.754 vs 2.774 ms/layer, MLP 3.477 vs 3.834).

All variants keep the residual ACCUMULATION fp32 (the parity-critical
property); they differ in what feeds the LN/GEMM1 read path:

  cur   x + gemms(LN(x_f32))              — shipped (reads the fp32 stream
                                            for LN stats + GEMM1 prologue)
  B     x + gemms(LN(bf16(x)))            — LN input rounded to bf16: all
                                            compute-side reads are 2-byte;
                                            the only fp32 traffic left is
                                            the residual add epilogue
  C     x + gemms(xn_precomputed_bf16)    — upper bound for emitting the
                                            MLP's LN from the attention
                                            kernel (xn arrives as an input;
                                            no LN work, no stats pass)
  layerB  attn_kernel -> B, chained       — full mixed layer with B

Numerics note: GEMM1's operand is ALREADY bf16(LN(x)) in the shipped path;
B moves the rounding before the LN (stats over rounded values). The parity
cost is measured end-to-end by bench.py on the wired variant, not here.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/tune_mixed_r4b.py
"""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import jax
import jax.numpy as jnp

from r3util import chain_timed, probe_ms
from vit_tpu.ops.block_attention import fused_attention_block
from vit_tpu.ops.fused_mlp import _activate, _layer_norm_f32

B, TRUE_N, DIM, HEADS, D, F = 128, 197, 1024, 16, 64, 4096
N = 208
HD = HEADS * D
SCALE = D**-0.5

ks = jax.random.split(jax.random.PRNGKey(0), 8)
W = dict(
    ln1_s=jnp.ones((DIM,), jnp.float32), ln1_b=jnp.zeros((DIM,), jnp.float32),
    wqkv=(jax.random.normal(ks[0], (DIM, 3 * HD)) * 0.02).astype(jnp.bfloat16),
    wout=(jax.random.normal(ks[1], (HD, DIM)) * 0.02).astype(jnp.bfloat16),
    bout=jnp.zeros((DIM,), jnp.float32),
    ln2_s=jnp.ones((DIM,), jnp.float32), ln2_b=jnp.zeros((DIM,), jnp.float32),
    w1=(jax.random.normal(ks[2], (DIM, F)) * 0.02).astype(jnp.bfloat16),
    b1=jnp.zeros((F,), jnp.float32),
    w2=(jax.random.normal(ks[3], (F, DIM)) * 0.02).astype(jnp.bfloat16),
    b2=jnp.zeros((DIM,), jnp.float32),
)


def gemms(xn):
    """bf16 GEMM pair with fp32 accumulators — shared by every variant."""
    h = jnp.matmul(xn, W["w1"], preferred_element_type=jnp.float32) + W["b1"]
    h = _activate(h, "gelu")
    return jnp.matmul(
        h.astype(jnp.bfloat16), W["w2"], preferred_element_type=jnp.float32
    ) + W["b2"]


def mlp_cur(x):
    xn = _layer_norm_f32(
        x.astype(jnp.float32), W["ln2_s"], W["ln2_b"]
    ).astype(jnp.bfloat16)
    return x + gemms(xn).astype(x.dtype)


def mlp_B(x):
    xb = x.astype(jnp.bfloat16)
    xn = _layer_norm_f32(
        xb.astype(jnp.float32), W["ln2_s"], W["ln2_b"]
    ).astype(jnp.bfloat16)
    return x + gemms(xn).astype(x.dtype)


def attn_fn(x):
    return fused_attention_block(
        x, W["ln1_s"], W["ln1_b"], W["wqkv"], W["wout"], W["bout"], HEADS,
        scale=SCALE, true_n=TRUE_N,
    )


def main():
    print(f"# probe {probe_ms():.1f} ms", flush=True)
    x = (jax.random.normal(ks[4], (B, N, DIM)) * 0.5).astype(jnp.float32)
    xn_pre = _layer_norm_f32(
        x.astype(jnp.float32), W["ln2_s"], W["ln2_b"]
    ).astype(jnp.bfloat16)

    print(f"mlp_cur      {chain_timed(mlp_cur, x):7.3f} ms/layer", flush=True)
    print(f"mlp_B        {chain_timed(mlp_B, x):7.3f} ms/layer", flush=True)
    t_c = chain_timed(lambda c: c + gemms(xn_pre).astype(c.dtype), x)
    print(f"mlp_C(xn in) {t_c:7.3f} ms/layer", flush=True)
    print(f"layer_cur    {chain_timed(lambda c: mlp_cur(attn_fn(c)), x):7.3f} "
          "ms/layer", flush=True)
    print(f"layer_B      {chain_timed(lambda c: mlp_B(attn_fn(c)), x):7.3f} "
          "ms/layer", flush=True)
    # bf16 reference points (the ceiling)
    xb = x.astype(jnp.bfloat16)
    print(f"mlp[bf16]    {chain_timed(mlp_cur, xb):7.3f} ms/layer", flush=True)
    print(f"layer[bf16]  {chain_timed(lambda c: mlp_cur(attn_fn(c)), xb):7.3f} "
          "ms/layer", flush=True)


if __name__ == "__main__":
    main()
