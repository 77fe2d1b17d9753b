"""Round-3b mixed-precision + kernel-phase diagnosis (chained timing).

Part A — attention-block kernel ablation at ViT-L shapes: time the kernel
with pieces removed to attribute the gap between 2.7 ms measured and
~1.3 ms roofline (qkv GEMM / scores / softmax / PV / epilogue).

Part B — MLP in bf16 vs fp32 streams, XLA vs Pallas: the mixed mode's
+0.38 ms/layer MLP overhead vs a +0.13 ms bandwidth fundamental.

All numbers are median per-application ms over a 24-link on-device chain
(one dispatch, 4-byte host transfer — see r3util docstring).
"""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from r3util import chain_timed, probe_ms
from vit_tpu.ops.block_attention import _ln_f32
from vit_tpu.ops import fused_mlp, reference_mlp

B, TRUE_N, DIM, HEADS, D = 128, 197, 1024, 16, 64
N = 208
HD = HEADS * D
MLP = 4096
SCALE = D**-0.5


def _softmax_rows(s):
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    return p / jnp.sum(p, axis=-1, keepdims=True)


def _mask_cols(s, true_n):
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, s.ndim - 1)
    return jnp.where(col < true_n, s, -1e30)


def make_kernel(phase):
    """phase: 'qkv' | 'scores' | 'noexp' | 'full'."""

    def kernel(x_ref, ln_s, ln_b, wqkv_ref, wout_ref, bout_ref, o_ref):
        x = x_ref[0]
        xn = _ln_f32(
            x.astype(jnp.float32), ln_s[0].astype(jnp.float32),
            ln_b[0].astype(jnp.float32), 1e-6,
        ).astype(wqkv_ref.dtype)
        qkv = jax.lax.dot(xn, wqkv_ref[:], preferred_element_type=jnp.float32
                          ).astype(wqkv_ref.dtype)
        if phase == "qkv":
            o_ref[0] = (qkv[:, :DIM] + x).astype(o_ref.dtype)
            return
        parts = []
        for h in range(HEADS):
            q = qkv[:, h * D:(h + 1) * D]
            k = qkv[:, HD + h * D:HD + (h + 1) * D]
            v = qkv[:, 2 * HD + h * D:2 * HD + (h + 1) * D]
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32) * SCALE
            if phase == "scores":
                parts.append(s[:, :D].astype(wout_ref.dtype))
                continue
            if phase == "noexp":
                p = s * (1.0 / TRUE_N)  # skip exp/max/sum, keep shape
            else:
                p = _softmax_rows(_mask_cols(s, TRUE_N))
            parts.append(jax.lax.dot(p.astype(v.dtype), v,
                                     preferred_element_type=jnp.float32
                                     ).astype(wout_ref.dtype))
        attn_out = jnp.concatenate(parts, axis=-1)
        out = jax.lax.dot(attn_out, wout_ref[:], preferred_element_type=jnp.float32)
        out += bout_ref[0].astype(jnp.float32)
        out += x.astype(jnp.float32)
        o_ref[0] = out.astype(o_ref.dtype)

    return kernel


def build(kernel, out_dtype=jnp.bfloat16):
    specs = [
        pl.BlockSpec((1, N, DIM), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, DIM), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, DIM), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((DIM, 3 * HD), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((HD, DIM), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, DIM), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    return lambda x, *c: pl.pallas_call(
        kernel, grid=(B,), in_specs=specs,
        out_specs=pl.BlockSpec((1, N, DIM), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, DIM), out_dtype),
    )(x, *c)


def part_a():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, N, DIM), jnp.bfloat16)
    ln_s = jnp.ones((1, DIM)); ln_b = jnp.zeros((1, DIM))
    wqkv = (jax.random.normal(key, (DIM, 3 * HD)) * 0.02).astype(jnp.bfloat16)
    wout = (jax.random.normal(key, (HD, DIM)) * 0.02).astype(jnp.bfloat16)
    bout = jnp.zeros((1, DIM))
    consts = (ln_s, ln_b, wqkv, wout, bout)
    for phase in ("qkv", "scores", "noexp", "full"):
        t = chain_timed(build(make_kernel(phase)), x, *consts)
        print(f"attn kernel phase={phase}: {t:.3f} ms", flush=True)


def part_b():
    key = jax.random.PRNGKey(0)
    w1 = (jax.random.normal(key, (DIM, MLP)) * 0.02).astype(jnp.bfloat16)
    b1 = jnp.zeros((MLP,))
    w2 = (jax.random.normal(key, (MLP, DIM)) * 0.02).astype(jnp.bfloat16)
    b2 = jnp.zeros((DIM,))
    ln_s = jnp.ones((DIM,)); ln_b = jnp.zeros((DIM,))
    for label, dt in (("bf16", jnp.bfloat16), ("fp32", jnp.float32)):
        x = jax.random.normal(key, (B, TRUE_N, DIM), dt)
        t_x = chain_timed(
            lambda x: reference_mlp(x, w1, b1, w2, b2, ln_s, ln_b, residual=True), x)
        t_p = chain_timed(
            lambda x: fused_mlp(x, w1, b1, w2, b2, ln_s, ln_b, residual=True), x)
        print(f"mlp {label}-stream: xla {t_x:.3f} ms   pallas {t_p:.3f} ms", flush=True)


if __name__ == "__main__":
    print(f"probe: {probe_ms():.2f} ms/dispatch", flush=True)
    part_a()
    part_b()
