"""Round-3 attention-core variants, chained on-device timing (see r3util).

Variants (full pallas_call at ViT-L shapes, B=128, N=208 padded, H=16,
D=64, dim=1024, bf16 stream):
  shipped      ops/block_attention.py as dispatched today (bb auto)
  v0-loop      per-head python loop, concat assembly (the shipped core)
  v1-batched   one batched dot_general over all heads (H,N,D)
  v3-scratch   v0 loop writing head outputs to a VMEM scratch (no concats)
  fp32-stream  shipped kernel with an fp32 HBM stream (mixed-precision mode)

Each prints median per-application ms over a 24-link on-device chain.
"""

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from r3util import chain_timed, probe_ms
from vit_tpu.ops.block_attention import _ln_f32, fused_attention_block

B, TRUE_N, DIM, HEADS, D = 128, 197, 1024, 16, 64
N = 208
HD = HEADS * D
SCALE = D**-0.5


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
    return lambda x, *consts: pl.pallas_call(kernel, **kwargs)(x, *consts)


def main():
    print(f"probe: {probe_ms():.2f} ms/dispatch", flush=True)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, N, DIM), jnp.bfloat16)
    ln_s = jnp.ones((1, DIM))
    ln_b = jnp.zeros((1, DIM))
    wqkv = (jax.random.normal(key, (DIM, 3 * HD)) * 0.02).astype(jnp.bfloat16)
    wout = (jax.random.normal(key, (HD, DIM)) * 0.02).astype(jnp.bfloat16)
    bout = jnp.zeros((1, DIM))
    consts = (ln_s, ln_b, wqkv, wout, bout)

    ship = lambda x, ln_s, ln_b, wqkv, wout, bout: fused_attention_block(
        x[:, :TRUE_N], ln_s[0], ln_b[0], wqkv, wout, bout[0], HEADS
    )
    pad = lambda y: jnp.pad(y, ((0, 0), (0, N - TRUE_N), (0, 0)))
    t = chain_timed(lambda x, *c: pad(ship(x, *c)), x, *consts)
    print(f"shipped (bb auto): {t:.3f} ms", flush=True)

    outs = {}
    for name, kern, scr in (("v0-loop", kernel_v0, False),
                            ("v1-batched", kernel_v1, False),
                            ("v3-scratch", kernel_v3, True)):
        try:
            fn = build(kern, scratch=scr)
            t = chain_timed(fn, x, *consts)
            outs[name] = np.asarray(jax.jit(fn)(x, *consts), np.float32)
            print(f"{name}: {t:.3f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)

    # fp32 stream through the shipped kernel (the mixed-precision mode)
    xf = x.astype(jnp.float32)
    t = chain_timed(lambda x, *c: pad(ship(x, *c)), xf, *consts)
    print(f"shipped, fp32 stream: {t:.3f} ms", flush=True)

    ref = outs.get("v0-loop")
    if ref is not None:
        for name, o in outs.items():
            err = float(np.max(np.abs(o[:, :TRUE_N] - ref[:, :TRUE_N])))
            print(f"{name} max|diff vs v0| = {err:.2e}", flush=True)


if __name__ == "__main__":
    main()


# ---- round-3b additions: phase-separated cores ----

def kernel_v4(x_ref, ln_s, ln_b, wqkv_ref, wout_ref, bout_ref, o_ref,
              s_scratch, attn_scratch):
    """Phase-separated: all score GEMMs -> one vectorized softmax -> all PV
    GEMMs. Separating the MXU and VPU phases lets Mosaic batch the 16 small
    GEMMs back-to-back (no per-head VPU dependency between them) and runs
    the softmax as one (H*N, N) block."""
    x, qkv = _prologue(x_ref, ln_s, ln_b, wqkv_ref)
    for h in range(HEADS):
        q = qkv[:, h * D:(h + 1) * D]
        k = qkv[:, HD + h * D:HD + (h + 1) * D]
        s_scratch[h * N:(h + 1) * N, :] = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * SCALE
    p = _softmax_rows(_mask_cols(s_scratch[:], TRUE_N)).astype(jnp.bfloat16)
    for h in range(HEADS):
        v = qkv[:, 2 * HD + h * D:2 * HD + (h + 1) * D]
        attn_scratch[:, h * D:(h + 1) * D] = jax.lax.dot(
            p[h * N:(h + 1) * N, :], v, preferred_element_type=jnp.float32
        ).astype(attn_scratch.dtype)
    _epilogue(o_ref, attn_scratch[:], wout_ref, bout_ref, x)


def kernel_v5(x_ref, ln_s, ln_b, wqkv_ref, wout_ref, bout_ref, o_ref,
              attn_scratch):
    """Pairwise interleave: scores for two heads, one paired softmax, two PV
    GEMMs — half the VPU/MXU dependency stalls of the sequential loop with
    half of v4's scratch."""
    x, qkv = _prologue(x_ref, ln_s, ln_b, wqkv_ref)
    for h0 in range(0, HEADS, 2):
        ss = []
        for h in (h0, h0 + 1):
            q = qkv[:, h * D:(h + 1) * D]
            k = qkv[:, HD + h * D:HD + (h + 1) * D]
            ss.append(jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * SCALE)
        p2 = _softmax_rows(_mask_cols(jnp.concatenate(ss, axis=0), TRUE_N)
                           ).astype(jnp.bfloat16)
        for i, h in enumerate((h0, h0 + 1)):
            v = qkv[:, 2 * HD + h * D:2 * HD + (h + 1) * D]
            attn_scratch[:, h * D:(h + 1) * D] = jax.lax.dot(
                p2[i * N:(i + 1) * N, :], v, preferred_element_type=jnp.float32
            ).astype(attn_scratch.dtype)
    _epilogue(o_ref, attn_scratch[:], wout_ref, bout_ref, x)


def main_v45():
    print(f"probe: {probe_ms():.2f} ms/dispatch", flush=True)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, N, DIM), jnp.bfloat16)
    ln_s = jnp.ones((1, DIM)); ln_b = jnp.zeros((1, DIM))
    wqkv = (jax.random.normal(key, (DIM, 3 * HD)) * 0.02).astype(jnp.bfloat16)
    wout = (jax.random.normal(key, (HD, DIM)) * 0.02).astype(jnp.bfloat16)
    bout = jnp.zeros((1, DIM))
    consts = (ln_s, ln_b, wqkv, wout, bout)

    def build2(kernel, scratches):
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
            out_shape=jax.ShapeDtypeStruct((B, N, DIM), jnp.bfloat16),
            scratch_shapes=scratches,
        )(x, *c)

    v0 = build(kernel_v0)
    ref = np.asarray(jax.jit(v0)(x, *consts), np.float32)
    for name, kern, scr in (
        ("v4-phase", kernel_v4, [pltpu.VMEM((HEADS * N, N), jnp.float32),
                                 pltpu.VMEM((N, HD), jnp.bfloat16)]),
        ("v5-pairs", kernel_v5, [pltpu.VMEM((N, HD), jnp.bfloat16)]),
    ):
        try:
            fn = build2(kern, scr)
            t = chain_timed(fn, x, *consts)
            o = np.asarray(jax.jit(fn)(x, *consts), np.float32)
            err = float(np.max(np.abs(o[:, :TRUE_N] - ref[:, :TRUE_N])))
            print(f"{name}: {t:.3f} ms   max|diff vs v0| = {err:.2e}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)
