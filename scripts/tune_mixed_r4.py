"""Round-4 flagship-margin study (VERDICT r3 item 2): where does the
mixed-precision mode (fp32 residual stream, bf16 MXU) lose its ~4% vs the
bf16 stream, and can cross-layer fusion buy it back?

Per-layer decomposition at the ViT-L benchmark shape (B=128, N=197->208
padded, dim=1024, H=16, F=4096), chained on-device timing (r3util):

  attn[bf16]   fused attention-block kernel, bf16 stream
  attn[f32]    same kernel, fp32 stream (mixed mode's configuration)
  mlp_xla[*]   x + reference_mlp(x) — the shipped MLP path, both streams
  mlp_pal[*]   the Pallas fused_mlp kernel (stream read/written ONCE,
               hidden never materialized) at several (block_t, block_f)
  layer[*]     attn kernel + MLP chained as one link (what the model runs)

The VMEM arithmetic for true cross-layer fusion (attn+MLP in one kernel) is
in PERFORMANCE.md: Wqkv 6MB + Wout 2MB + W1 8MB + W2 8MB = 24MB of weights
cannot sit resident in 16MB of VMEM, so any fused-layer kernel must
re-stream >=16MB of weights per batch-grid step — 128 steps x 16MB = 2GB/
layer vs the 218MB/layer of stream round-trip it saves. This script also
builds the chunked fused-layer prototype anyway and times it (K=64-study
rigor: measured, not just arithmetic).

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/tune_mixed_r4.py
"""

import functools
import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from r3util import chain_timed, probe_ms
from vit_tpu.ops.block_attention import _ln_f32, fused_attention_block
from vit_tpu.ops.fused_mlp import fused_mlp, reference_mlp

if os.environ.get("TUNE_TINY"):
    B, TRUE_N, DIM, HEADS, D, F = 2, 13, 64, 4, 16, 128
    N = 16
    INTERPRET = True
else:
    B, TRUE_N, DIM, HEADS, D, F = 128, 197, 1024, 16, 64, 4096
    N = 208
    INTERPRET = False
HD = HEADS * D
SCALE = D**-0.5

key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 10)
W = dict(
    ln1_s=jnp.ones((DIM,), jnp.float32),
    ln1_b=jnp.zeros((DIM,), jnp.float32),
    wqkv=(jax.random.normal(ks[0], (DIM, 3 * HD)) * 0.02).astype(jnp.bfloat16),
    wout=(jax.random.normal(ks[1], (HD, DIM)) * 0.02).astype(jnp.bfloat16),
    bout=jnp.zeros((DIM,), jnp.float32),
    ln2_s=jnp.ones((DIM,), jnp.float32),
    ln2_b=jnp.zeros((DIM,), jnp.float32),
    w1=(jax.random.normal(ks[2], (DIM, F)) * 0.02).astype(jnp.bfloat16),
    b1=jnp.zeros((F,), jnp.float32),
    w2=(jax.random.normal(ks[3], (F, DIM)) * 0.02).astype(jnp.bfloat16),
    b2=jnp.zeros((DIM,), jnp.float32),
)


def attn_fn(x):
    return fused_attention_block(
        x, W["ln1_s"], W["ln1_b"], W["wqkv"], W["wout"], W["bout"], HEADS,
        scale=SCALE, true_n=TRUE_N, interpret=INTERPRET,
    )


def mlp_xla_fn(x):
    # exactly what EncoderBlock runs: residual add outside, XLA path
    return x + reference_mlp(
        x, W["w1"], W["b1"], W["w2"], W["b2"], W["ln2_s"], W["ln2_b"],
        residual=False,
    )


def mlp_pal_fn(block_t, block_f):
    def fn(x):
        return fused_mlp(
            x, W["w1"], W["b1"], W["w2"], W["b2"], W["ln2_s"], W["ln2_b"],
            residual=True, block_t=block_t, block_f=block_f,
            interpret=INTERPRET,
        )
    return fn


# ---------------------------------------------------------------------------
# Prototype: fused full layer (attn block + MLP in ONE pallas program per
# batch-grid step). All six weight tensors are declared VMEM-resident; at
# ViT-L dims that is 24MB and Mosaic must either fail or spill — measured
# below. A chunked variant streams W1/W2 per grid step instead (hidden dim
# blocked in VMEM-sized panels), paying the weight re-fetch the module
# docstring prices out.
# ---------------------------------------------------------------------------


def _fused_layer_kernel(
    x_ref, ln1_s, ln1_b, wqkv_ref, wout_ref, bout_ref,
    ln2_s, ln2_b, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
    *, heads, d, scale, true_n, f_chunks,
):
    n, dim = x_ref.shape[1], x_ref.shape[2]
    hd = heads * d
    x = x_ref[...].reshape(n, dim)
    xn = _ln_f32(
        x.astype(jnp.float32), ln1_s[0].astype(jnp.float32),
        ln1_b[0].astype(jnp.float32), 1e-6,
    ).astype(wqkv_ref.dtype)
    qkv = jax.lax.dot(
        xn, wqkv_ref[:], preferred_element_type=jnp.float32
    ).astype(wqkv_ref.dtype)
    parts = []
    for h in range(heads):
        q = qkv[:, h * d:(h + 1) * d]
        k = qkv[:, hd + h * d:hd + (h + 1) * d]
        v = qkv[:, 2 * hd + h * d:2 * hd + (h + 1) * d]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        if true_n != n:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < true_n, s, -1e30)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        parts.append(jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        ).astype(wout_ref.dtype))
    attn_out = jnp.concatenate(parts, axis=-1)
    mid = jax.lax.dot(attn_out, wout_ref[:], preferred_element_type=jnp.float32)
    mid += bout_ref[0].astype(jnp.float32)
    mid += x.astype(jnp.float32)          # residual 1 — stays in VMEM

    xn2 = _ln_f32(
        mid, ln2_s[0].astype(jnp.float32), ln2_b[0].astype(jnp.float32), 1e-6
    ).astype(w1_ref.dtype)
    f = w1_ref.shape[1]
    fc = f // f_chunks
    acc = jnp.zeros((n, dim), jnp.float32)
    for c in range(f_chunks):
        h1 = jax.lax.dot(
            xn2, w1_ref[:, c * fc:(c + 1) * fc], preferred_element_type=jnp.float32
        )
        h1 += b1_ref[0, c * fc:(c + 1) * fc].astype(jnp.float32)
        h1 = jax.nn.gelu(h1)
        acc += jax.lax.dot(
            h1.astype(w1_ref.dtype), w2_ref[c * fc:(c + 1) * fc, :],
            preferred_element_type=jnp.float32,
        )
    out = acc + b2_ref[0].astype(jnp.float32) + mid  # residual 2
    o_ref[...] = out.reshape(1, n, dim).astype(o_ref.dtype)


def fused_layer_fn(f_chunks):
    @jax.jit
    def fn(x):
        b, n, dim = x.shape
        kern = functools.partial(
            _fused_layer_kernel, heads=HEADS, d=D, scale=SCALE, true_n=TRUE_N,
            f_chunks=f_chunks,
        )
        row = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kern,
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, n, dim), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                row((1, dim)), row((1, dim)),
                row((DIM, 3 * HD)), row((HD, DIM)), row((1, dim)),
                row((1, dim)), row((1, dim)),
                row((DIM, F)), row((1, F)), row((F, DIM)), row((1, dim)),
            ],
            out_specs=pl.BlockSpec((1, n, dim), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, n, dim), x.dtype),
            interpret=INTERPRET,
        )(
            x, W["ln1_s"].reshape(1, -1), W["ln1_b"].reshape(1, -1),
            W["wqkv"], W["wout"], W["bout"].reshape(1, -1),
            W["ln2_s"].reshape(1, -1), W["ln2_b"].reshape(1, -1),
            W["w1"], W["b1"].reshape(1, -1), W["w2"], W["b2"].reshape(1, -1),
        )
    return fn


def main():
    print(f"# probe {probe_ms():.1f} ms  shapes B={B} N={N}(true {TRUE_N}) "
          f"dim={DIM} H={HEADS} F={F}", flush=True)
    for name, dtype in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
        x = (jax.random.normal(ks[4], (B, N, DIM)) * 0.5).astype(dtype)
        t_attn = chain_timed(attn_fn, x)
        t_mlp = chain_timed(mlp_xla_fn, x)
        t_layer = chain_timed(lambda c: mlp_xla_fn(attn_fn(c)), x)
        print(f"attn[{name}]      {t_attn:7.3f} ms/layer", flush=True)
        print(f"mlp_xla[{name}]   {t_mlp:7.3f} ms/layer", flush=True)
        print(f"layer[{name}]     {t_layer:7.3f} ms/layer (attn+mlp chained)", flush=True)
        for bt, bf in ((256, 1024), (256, 2048), (512, 1024), (1664, 1024)):
            try:
                t = chain_timed(mlp_pal_fn(bt, bf), x)
                print(f"mlp_pal[{name}] bt={bt} bf={bf}  {t:7.3f} ms/layer", flush=True)
            except Exception as e:
                print(f"mlp_pal[{name}] bt={bt} bf={bf}  FAIL {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)

    # fused-layer prototypes, mixed stream only (the target config)
    x = (jax.random.normal(ks[4], (B, N, DIM)) * 0.5).astype(jnp.float32)
    ref = np.asarray(mlp_xla_fn(attn_fn(x[:2])))
    for fc in (1, 4):
        tag = "resident" if fc == 1 else f"chunked/{fc}"
        try:
            fn = fused_layer_fn(fc)
            got = np.asarray(fn(x[:2]))
            err = float(np.max(np.abs(got[:, :TRUE_N] - ref[:, :TRUE_N])))
            t = chain_timed(fn, x)
            print(f"fused_layer[{tag}]  {t:7.3f} ms/layer  err={err:.2e}", flush=True)
        except Exception as e:
            print(f"fused_layer[{tag}]  FAIL {type(e).__name__}: {str(e)[:160]}",
                  flush=True)


if __name__ == "__main__":
    main()
