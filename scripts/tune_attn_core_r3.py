"""Round-3 attack on the fused attention-block kernel's MXU fill
(VERDICT r2 item 4): the per-head (N,64)@(64,N) score and (N,N)@(N,64) PV
GEMMs run the MXU at half fill, capping the kernel at ~77% of peak
(PERFORMANCE.md). Variants measured here, full pallas_call at ViT-L shapes
(B=128, N=197->208, H=16, D=64, dim=1024), bf16 stream:

  v0-loop      current shipped core: python loop over heads, slices from the
               fused qkv panel, per-head concat assembly.
  v1-batched   one batched dot_general over all heads (H,N,D)x(H,N,D) —
               Mosaic sees the whole contraction; fewer, bigger ops + no
               concat chains (scratch assembly).
  v2-pair      two heads per score GEMM via the staggered K=128 layout
               q2=[q_h1|q_h2] (N,128), k2 block-diag (2N,128) -> [S1 S2].
               Expected *no* gain — the zeros stream through the MXU, same
               cycles — measured to document the negative result.
  v3-scratch   v0's loop but head outputs written into a VMEM scratch
               (no concat copies); isolates the assembly cost.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/tune_attn_core_r3.py
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vit_tpu.ops.block_attention import _ln_f32, fused_attention_block

import os

if os.environ.get("TUNE_TINY"):  # CPU interpret-mode validation shapes
    B, TRUE_N, DIM, HEADS, D = 2, 13, 64, 4, 16
    N = 16
    INTERPRET = True
else:
    B, TRUE_N, DIM, HEADS, D = 128, 197, 1024, 16, 64
    N = 208  # 16-row padded
    INTERPRET = False
HD = HEADS * D
SCALE = D**-0.5
ITERS = 20


def _softmax_rows(s):
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    return p / jnp.sum(p, axis=-1, keepdims=True)


def _mask_cols(s, true_n):
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, s.ndim - 1)
    return jnp.where(col < true_n, s, -1e30)


def _prologue(x_ref, ln_s_ref, ln_b_ref, wqkv_ref):
    x = x_ref[0]
    xn = _ln_f32(
        x.astype(jnp.float32), ln_s_ref[0].astype(jnp.float32),
        ln_b_ref[0].astype(jnp.float32), 1e-6,
    ).astype(wqkv_ref.dtype)
    qkv = jax.lax.dot(xn, wqkv_ref[:], preferred_element_type=jnp.float32)
    return x, qkv.astype(wqkv_ref.dtype)


def _epilogue(o_ref, attn_out, wout_ref, bout_ref, x):
    out = jax.lax.dot(attn_out, wout_ref[:], preferred_element_type=jnp.float32)
    out += bout_ref[0].astype(jnp.float32)
    out += x.astype(jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def kernel_v0(x_ref, ln_s, ln_b, wqkv_ref, wout_ref, bout_ref, o_ref):
    x, qkv = _prologue(x_ref, ln_s, ln_b, wqkv_ref)
    parts = []
    for h in range(HEADS):
        q = qkv[:, h * D:(h + 1) * D]
        k = qkv[:, HD + h * D:HD + (h + 1) * D]
        v = qkv[:, 2 * HD + h * D:2 * HD + (h + 1) * D]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * SCALE
        p = _softmax_rows(_mask_cols(s, TRUE_N))
        parts.append(jax.lax.dot(p.astype(v.dtype), v,
                                 preferred_element_type=jnp.float32).astype(wout_ref.dtype))
    _epilogue(o_ref, jnp.concatenate(parts, axis=-1), wout_ref, bout_ref, x)


def kernel_v1(x_ref, ln_s, ln_b, wqkv_ref, wout_ref, bout_ref, o_ref):
    x, qkv = _prologue(x_ref, ln_s, ln_b, wqkv_ref)
    # (N, 3HD) -> (3, H, N, D) without data movement beyond one transpose
    qkv3 = qkv.reshape(N, 3, HEADS, D).transpose(1, 2, 0, 3)
    q, k, v = qkv3[0], qkv3[1], qkv3[2]  # (H, N, D)
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ) * SCALE  # (H, N, N)
    p = _softmax_rows(_mask_cols(s, TRUE_N))
    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (H, N, D)
    attn_out = pv.transpose(1, 0, 2).reshape(N, HD).astype(wout_ref.dtype)
    _epilogue(o_ref, attn_out, wout_ref, bout_ref, x)


def kernel_v2(x_ref, ln_s, ln_b, wqkv_ref, wout_ref, bout_ref, o_ref):
    x, qkv = _prologue(x_ref, ln_s, ln_b, wqkv_ref)
    parts = [None] * HEADS
    for h0 in range(0, HEADS, 2):
        h1 = h0 + 1
        q2 = jnp.concatenate(
            [qkv[:, h0 * D:(h0 + 1) * D], qkv[:, h1 * D:(h1 + 1) * D]], axis=1
        )  # (N, 128)
        k_a = qkv[:, HD + h0 * D:HD + (h0 + 1) * D]
        k_b = qkv[:, HD + h1 * D:HD + (h1 + 1) * D]
        zeros = jnp.zeros_like(k_a)
        k2 = jnp.concatenate(
            [jnp.concatenate([k_a, zeros], axis=1),
             jnp.concatenate([zeros, k_b], axis=1)], axis=0
        )  # (2N, 128) block-diag
        s2 = jax.lax.dot_general(q2, k2, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) * SCALE  # (N, 2N)
        for i, h in enumerate((h0, h1)):
            s = s2[:, i * N:(i + 1) * N]
            p = _softmax_rows(_mask_cols(s, TRUE_N))
            v = qkv[:, 2 * HD + h * D:2 * HD + (h + 1) * D]
            parts[h] = jax.lax.dot(p.astype(v.dtype), v,
                                   preferred_element_type=jnp.float32).astype(wout_ref.dtype)
    _epilogue(o_ref, jnp.concatenate(parts, axis=-1), wout_ref, bout_ref, x)


def kernel_v3(x_ref, ln_s, ln_b, wqkv_ref, wout_ref, bout_ref, o_ref, attn_scratch):
    x, qkv = _prologue(x_ref, ln_s, ln_b, wqkv_ref)
    for h in range(HEADS):
        q = qkv[:, h * D:(h + 1) * D]
        k = qkv[:, HD + h * D:HD + (h + 1) * D]
        v = qkv[:, 2 * HD + h * D:2 * HD + (h + 1) * D]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * SCALE
        p = _softmax_rows(_mask_cols(s, TRUE_N))
        attn_scratch[:, h * D:(h + 1) * D] = jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        ).astype(attn_scratch.dtype)
    _epilogue(o_ref, attn_scratch[:], wout_ref, bout_ref, x)


def build(kernel, scratch=False):
    specs = [
        pl.BlockSpec((1, N, DIM), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, DIM), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, DIM), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((DIM, 3 * HD), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((HD, DIM), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, DIM), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    kwargs = dict(
        grid=(B,),
        in_specs=specs,
        out_specs=pl.BlockSpec((1, N, DIM), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, DIM), jnp.bfloat16),
    )
    if scratch:
        kwargs["scratch_shapes"] = [pltpu.VMEM((N, HD), jnp.bfloat16)]
    kwargs["interpret"] = INTERPRET
    return jax.jit(lambda *a: pl.pallas_call(kernel, **kwargs)(*a))


def timed(fn, *args):
    np.asarray(fn(*args))
    np.asarray(fn(*args))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / ITERS * 1e3


def main():
    key = jax.random.PRNGKey(0)
    probe = jax.jit(lambda a: a @ a)
    xp = jnp.ones((2048, 2048), jnp.bfloat16)
    print(f"probe matmul: {timed(probe, xp):.2f} ms", flush=True)

    x = jax.random.normal(key, (B, N, DIM), jnp.bfloat16)
    ln_s = jnp.ones((1, DIM))
    ln_b = jnp.zeros((1, DIM))
    wqkv = (jax.random.normal(key, (DIM, 3 * HD)) * 0.02).astype(jnp.bfloat16)
    wout = (jax.random.normal(key, (HD, DIM)) * 0.02).astype(jnp.bfloat16)
    bout = jnp.zeros((1, DIM))
    args = (x, ln_s, ln_b, wqkv, wout, bout)

    # shipped kernel for reference (includes its own padding logic)
    t_ship = timed(
        jax.jit(lambda x: fused_attention_block(
            x[:, :TRUE_N], ln_s[0], ln_b[0], wqkv, wout, bout[0], HEADS,
            interpret=INTERPRET)), x)
    print(f"shipped fused_attention_block: {t_ship:.2f} ms", flush=True)

    outs = {}
    for name, kern, scr in (("v0-loop", kernel_v0, False),
                            ("v1-batched", kernel_v1, False),
                            ("v2-pair", kernel_v2, False),
                            ("v3-scratch", kernel_v3, True)):
        try:
            fn = build(kern, scratch=scr)
            t = timed(fn, *args)
            outs[name] = np.asarray(fn(*args), np.float32)
            print(f"{name}: {t:.2f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)

    ref = outs.get("v0-loop")
    if ref is not None:
        for name, o in outs.items():
            err = float(np.max(np.abs(o[:, :TRUE_N] - ref[:, :TRUE_N])))
            print(f"{name} max|diff vs v0| = {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
