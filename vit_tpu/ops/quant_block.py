"""Fully-fused W8A8 attention block kernel: LN -> per-token int8 quant ->
int8 qkv GEMM -> softmax-attention -> int8 out GEMM -> +residual, one
Pallas call.

The int8 twin of ``ops/block_attention.py``: both projection GEMMs run as
int8 x int8 -> int32 on the MXU (v5e: 394 TOPS vs 197 bf16), weights sit
VMEM-resident at HALF the float kernel's footprint (int8 tables), and the
activation quantization (per-row max / round / clip) happens on the VPU in
VMEM — the XLA W8A8 path (utils/quantize.py) pays an HBM round trip for
each quantize/dequantize pair, this kernel pays none. Attention itself
(scores, softmax, PV) stays bf16/fp32: its GEMMs are activation-activation
(no static scales), and the softmax needs fp32 anyway.

Status: numerics are validated in interpret mode (tests/test_quant.py);
the Mosaic TPU lowering of int8 dots is measured by scripts/bench_quant.py
on hardware. Until that measurement lands, the model-level dispatcher does
not auto-route here — call ``fused_quant_attention_block`` directly or set
``VIT_TPU_QUANT_KERNEL=1``.

No reference counterpart (conceptofmind/vit-flax has no quantization).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vit_tpu.ops.block_attention import _ln_f32
from vit_tpu.ops.quant import quantize_rows as _quant_rows_f32  # one recipe repo-wide


def _kernel(
    x_ref,         # (bb, N, D) float stream
    ln_scale_ref,  # (1, D)
    ln_bias_ref,   # (1, D)
    wqkv_ref,      # (D, 3*H*Dh) int8
    sqkv_ref,      # (1, 3*H*Dh) fp32 per-out-channel scales
    wout_ref,      # (H*Dh, D) int8
    sout_ref,      # (1, D) fp32
    bout_ref,      # (1, D) fp32
    o_ref,         # (bb, N, D)
    *,
    heads: int,
    d: int,
    scale: float,
    ln_eps: float,
    batch_tile: int,
    true_n: int,
    acc_dtype,
):
    hd = heads * d
    n, dim = x_ref.shape[1], x_ref.shape[2]
    x = x_ref[...].reshape(batch_tile * n, dim)
    xn = _ln_f32(
        x.astype(jnp.float32),
        ln_scale_ref[0].astype(jnp.float32),
        ln_bias_ref[0].astype(jnp.float32),
        ln_eps,
    )
    x_i8, s_row = _quant_rows_f32(xn)
    qkv_acc = jax.lax.dot(
        x_i8, wqkv_ref[:], preferred_element_type=jnp.int32
    )  # int8 MXU path
    qkv = (
        qkv_acc.astype(jnp.float32) * s_row * sqkv_ref[0]
    ).astype(acc_dtype)  # (bb*N, 3*H*Dh)

    attn_out_parts = []
    for e in range(batch_tile):
        row0 = e * n
        head_parts = []
        for h in range(heads):
            q = qkv[row0 : row0 + n, h * d : (h + 1) * d]
            k = qkv[row0 : row0 + n, hd + h * d : hd + (h + 1) * d]
            v = qkv[row0 : row0 + n, 2 * hd + h * d : 2 * hd + (h + 1) * d]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s *= scale
            if true_n != n:
                col_ids = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                s = jnp.where(col_ids < true_n, s, -1e30)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            p = p / l
            head_parts.append(
                jax.lax.dot(
                    p.astype(v.dtype), v, preferred_element_type=jnp.float32
                )
            )
        attn_out_parts.append(jnp.concatenate(head_parts, axis=-1))
    attn_out = jnp.concatenate(attn_out_parts, axis=0)  # (bb*N, H*Dh) fp32

    a_i8, s_row2 = _quant_rows_f32(attn_out)
    out_acc = jax.lax.dot(a_i8, wout_ref[:], preferred_element_type=jnp.int32)
    out = out_acc.astype(jnp.float32) * s_row2 * sout_ref[0]
    out += bout_ref[0].astype(jnp.float32)
    out += x.astype(jnp.float32)  # residual, fused
    o_ref[...] = out.reshape(batch_tile, n, dim).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("heads", "scale", "ln_eps", "true_n", "interpret")
)
def _impl(
    x, ln_scale, ln_bias, wqkv_i8, sqkv, wout_i8, sout, bout,
    heads, scale, ln_eps, true_n, interpret,
):
    b, n_in, dim = x.shape
    if true_n is None:
        true_n = n_in
    three_hd = wqkv_i8.shape[1]
    hd = three_hd // 3
    d = hd // heads
    acc_dtype = x.dtype  # attention q/k/v panel dtype follows the stream

    sublanes = 32 if x.dtype.itemsize < 4 else 8  # int8 tiles want (32,128)
    n = (n_in + sublanes - 1) // sublanes * sublanes
    if n != n_in:
        x = jnp.pad(x, ((0, 0), (0, n - n_in), (0, 0)))

    import os

    bb = 1
    weights_bytes = (dim * three_hd + hd * dim) * 1 + (three_hd + dim) * 4
    per_sample = (
        2 * n * dim * x.dtype.itemsize            # x tile + out tile
        + n * dim * 5                              # fp32 xn + int8 rows
        + n * three_hd * (4 + jnp.dtype(acc_dtype).itemsize)  # i32 acc + qkv
        + n * n * 4                                # fp32 scores (per head, reused)
        + n * hd * 4                               # fp32 attn_out
    )
    budget = 14 * 1024 * 1024 - weights_bytes
    while bb < 8 and b % (bb * 2) == 0 and per_sample * (bb * 2) <= budget:
        bb *= 2
    override = os.environ.get("VIT_TPU_QUANT_BLOCK_BB")
    if override:
        bb = int(override)
        assert b % bb == 0

    grid = (b // bb,)
    out = pl.pallas_call(
        functools.partial(
            _kernel, heads=heads, d=d, scale=float(scale), ln_eps=ln_eps,
            batch_tile=bb, true_n=true_n, acc_dtype=acc_dtype,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bb, n, dim), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dim, three_hd), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, three_hd), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hd, dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, n, dim), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, dim), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * dim * three_hd
            + 4 * b * heads * n * n * d
            + 2 * b * n * hd * dim,
            bytes_accessed=2 * x.size * x.dtype.itemsize
            + wqkv_i8.size + wout_i8.size,
            transcendentals=b * heads * n * n,
        ),
        interpret=interpret,
    )(
        x,
        ln_scale.reshape(1, dim),
        ln_bias.reshape(1, dim),
        wqkv_i8,
        sqkv.reshape(1, three_hd),
        wout_i8,
        sout.reshape(1, dim),
        bout.reshape(1, dim),
    )
    return out[:, :n_in] if n != n_in else out


def _mlp_kernel(
    x_ref,        # (T, D) float stream tile
    ln_scale_ref,  # (1, D)
    ln_bias_ref,   # (1, D)
    w1_ref,        # (D, M) int8
    s1_ref,        # (1, M) fp32
    b1_ref,        # (1, M) fp32
    w2_ref,        # (M, D) int8
    s2_ref,        # (1, D) fp32
    b2_ref,        # (1, D) fp32
    o_ref,         # (T, D)
    *,
    activation: str,
    ln_eps: float,
):
    x = x_ref[:].astype(jnp.float32)
    xn = _ln_f32(
        x, ln_scale_ref[0].astype(jnp.float32),
        ln_bias_ref[0].astype(jnp.float32), ln_eps,
    )
    x_i8, s_row = _quant_rows_f32(xn)
    h = jax.lax.dot(x_i8, w1_ref[:], preferred_element_type=jnp.int32)
    h = h.astype(jnp.float32) * s_row * s1_ref[0] + b1_ref[0]
    if activation == "gelu":
        h = jax.nn.gelu(h)
    elif activation == "gelu_exact":
        h = jax.nn.gelu(h, approximate=False)
    else:
        raise ValueError(activation)
    h_i8, s_row2 = _quant_rows_f32(h)
    out = jax.lax.dot(h_i8, w2_ref[:], preferred_element_type=jnp.int32)
    out = out.astype(jnp.float32) * s_row2 * s2_ref[0] + b2_ref[0]
    o_ref[:] = (out + x).astype(o_ref.dtype)  # residual, fused


@functools.partial(
    jax.jit, static_argnames=("activation", "ln_eps", "interpret")
)
def _mlp_impl(
    x, ln_scale, ln_bias, w1_i8, s1, b1, w2_i8, s2, b2,
    activation, ln_eps, interpret,
):
    b, n, dim = x.shape
    m = w1_i8.shape[1]
    rows = b * n
    xf = x.reshape(rows, dim)
    # token tile: weights (D*M + M*D int8) stay resident; per-tile fp32
    # stream/hidden panels bound T. 256 keeps (T*M fp32 = 4MB @ M=4096)
    # comfortable; round rows up to the tile.
    block_t = 256 if rows >= 256 else max(32, (rows + 31) // 32 * 32)
    pad = (block_t - rows % block_t) % block_t
    if pad:
        xf = jnp.pad(xf, ((0, pad), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_mlp_kernel, activation=activation, ln_eps=ln_eps),
        grid=((rows + pad) // block_t,),
        in_specs=[
            pl.BlockSpec((block_t, dim), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dim, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_t, dim), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows + pad, dim), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * rows * dim * m,
            bytes_accessed=2 * rows * dim * x.dtype.itemsize
            + w1_i8.size + w2_i8.size,
            transcendentals=rows * m,
        ),
        interpret=interpret,
    )(
        xf,
        ln_scale.reshape(1, dim),
        ln_bias.reshape(1, dim),
        w1_i8,
        s1.reshape(1, m),
        b1.reshape(1, m),
        w2_i8,
        s2.reshape(1, dim),
        b2.reshape(1, dim),
    )
    return out[:rows].reshape(b, n, dim)


def fused_quant_mlp(
    x: jax.Array,
    ln_scale: jax.Array,
    ln_bias: jax.Array,
    w1_i8: jax.Array,
    s1: jax.Array,
    b1: jax.Array,
    w2_i8: jax.Array,
    s2: jax.Array,
    b2: jax.Array,
    *,
    activation: str = "gelu",
    ln_eps: float = 1e-6,
    interpret: bool = False,
) -> jax.Array:
    """``x + W2_i8(gelu(W1_i8(quant(LN(x)))))`` in one kernel — the int8
    MLP twin (inference-only; see module docstring for status)."""
    return _mlp_impl(
        x, ln_scale, ln_bias, w1_i8, s1, b1, w2_i8, s2, b2,
        activation, ln_eps, interpret,
    )


def fused_quant_attention_block(
    x: jax.Array,
    ln_scale: jax.Array,
    ln_bias: jax.Array,
    wqkv_i8: jax.Array,
    sqkv: jax.Array,
    wout_i8: jax.Array,
    sout: jax.Array,
    bout: jax.Array,
    heads: int,
    *,
    scale: Optional[float] = None,
    ln_eps: float = 1e-6,
    true_n: Optional[int] = None,
    interpret: bool = False,
) -> jax.Array:
    """``x + out_proj_i8(attention(qkv_proj_i8(quant(LN(x)))))`` in one
    kernel. Inference-only (no custom VJP — quantized training is out of
    scope). Same contract as ``fused_attention_block`` with int8 weight
    tables + per-output-channel scales in place of float kernels.
    """
    if scale is None:
        scale = (wqkv_i8.shape[1] // 3 // heads) ** -0.5
    return _impl(
        x, ln_scale, ln_bias, wqkv_i8, sqkv, wout_i8, sout, bout,
        heads, float(scale), ln_eps, true_n, interpret,
    )
