"""Zero-copy fused-QKV self-attention kernel.

The generic kernel (flash_attention.py) takes ``[B, H, N, D]`` tensors,
which costs three head-split transposes, pad copies to lane multiples, and
an output transpose per layer — HBM round-trips XLA cannot fuse into the
opaque pallas call. Profiling ViT-L showed that glue, not the math, losing
to plain XLA (scripts/profile_vitl.py).

This kernel instead consumes the fused qkv projection ``[B, N, 3*H*D]``
exactly as the Dense produces it. The grid is (batch, q-tiles); each
program holds the full fused row panel in VMEM and loops over heads with
static column slices (the head count is a Python constant), so per layer
the attention reads the qkv array once and writes ``[B, N, H*D]`` once —
no transposes, no padding copies, nothing else touches HBM.

TPU lowering constraint honored: every block's last two dims are either
full array dims or (8, 128)-aligned; head panels are sliced in-register,
not in the BlockSpec.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(
    q_ref,      # (1, block_q, 3*H*D) — q tile of the fused array
    kv_ref,     # (1, N, 3*H*D)       — full fused array row panel
    bias_ref,   # (1, H|1, N, N) fp32 or unused
    o_ref,      # (1, block_q, H*D)
    *,
    heads: int,
    d: int,
    scale: float,
    has_bias: bool,
    bias_per_head: bool,
):
    precision = (
        jax.lax.Precision.HIGHEST
        if q_ref.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    hd = heads * d
    for h in range(heads):
        q = q_ref[0, :, h * d : (h + 1) * d]
        k = kv_ref[0, :, hd + h * d : hd + (h + 1) * d]
        v = kv_ref[0, :, 2 * hd + h * d : 2 * hd + (h + 1) * d]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        s *= scale
        if has_bias:
            s += bias_ref[0, h if bias_per_head else 0].astype(jnp.float32)
        # Division matches jax.nn.softmax's op sequence (rounding alignment
        # with the XLA reference).
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        p = p / l
        o_ref[0, :, h * d : (h + 1) * d] = jax.lax.dot(
            p.astype(v.dtype), v,
            preferred_element_type=jnp.float32, precision=precision,
        ).astype(o_ref.dtype)


def xla_qkv_attention(qkv, heads, bias=None, *, scale=None):
    """Plain-XLA self-attention on the fused layout — numerical reference,
    CPU fallback, and the recompute used by the custom backward pass."""
    b, n, three_hd = qkv.shape
    hd = three_hd // 3
    d = hd // heads
    if scale is None:
        scale = d**-0.5
    q, k, v = jnp.split(qkv, 3, axis=-1)
    split = lambda t: t.reshape(b, n, heads, d).transpose(0, 2, 1, 3)
    q, k, v = split(q), split(k), split(v)
    s = jnp.einsum("bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32)
    s = s * scale
    if bias is not None:
        s = s + bias.astype(s.dtype)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhij,bhjd->bhid", p.astype(v.dtype), v)
    return out.transpose(0, 2, 1, 3).reshape(b, n, hd)


@functools.lru_cache(maxsize=None)
def _partitioned_qkv(heads, scale, block_q, interpret, bias_pattern):
    """Mesh-partitionable forward (ops/partitioning.py): batch-sharded in
    place. The fused last axis is [q|k|v] x all heads — slicing it across
    'model' would split at the wrong boundaries, so it (and any bias) is
    need-replication; head-parallel TP should use the [B, H, N, D] flash
    kernels instead."""
    from vit_tpu.ops.partitioning import partitioned

    if bias_pattern is None:

        def fn(qkv):
            return _fused_qkv_attention_impl(
                qkv, heads, None, scale=scale, block_q=block_q,
                interpret=interpret,
            )

        return partitioned(fn, (("b", "n", "f"),), ("b", "n", "g"))

    bias_b = bias_pattern

    def fn(qkv, bias):
        return _fused_qkv_attention_impl(
            qkv, heads, bias, scale=scale, block_q=block_q, interpret=interpret
        )

    bias_roles = ("b" if bias_b else "u0", "u1", "n", "m")
    return partitioned(fn, (("b", "n", "f"), bias_roles), ("b", "n", "g"))


def _qkv_call(qkv, heads, bias, scale, block_q, interpret):
    pattern = None if bias is None else (bias.shape[0] == qkv.shape[0])
    p = _partitioned_qkv(heads, scale, block_q, interpret, pattern)
    return p(qkv) if bias is None else p(qkv, bias)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 3, 4, 5))
def _qkv_attention_ad(qkv, heads, bias, scale, block_q, interpret):
    return _qkv_call(qkv, heads, bias, scale, block_q, interpret)


def _qkv_attention_fwd(qkv, heads, bias, scale, block_q, interpret):
    out = _qkv_call(qkv, heads, bias, scale, block_q, interpret)
    return out, (qkv, bias)


def _qkv_attention_bwd(heads, scale, block_q, interpret, res, g):
    # flash-style rematerialization: recompute attention under XLA's autodiff
    # (exact gradients; the n x n matrix only exists inside this backward).
    qkv, bias = res
    if bias is None:
        _, vjp = jax.vjp(lambda a: xla_qkv_attention(a, heads, None, scale=scale), qkv)
        (dqkv,) = vjp(g)
        return (dqkv, None)
    _, vjp = jax.vjp(lambda a, b: xla_qkv_attention(a, heads, b, scale=scale), qkv, bias)
    dqkv, dbias = vjp(g)
    return (dqkv, dbias)


_qkv_attention_ad.defvjp(_qkv_attention_fwd, _qkv_attention_bwd)


def fused_qkv_attention(
    qkv: jax.Array,
    heads: int,
    bias: Optional[jax.Array] = None,
    *,
    scale: Optional[float] = None,
    block_q: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """Differentiable wrapper: Pallas forward, XLA-recompute backward."""
    if scale is None:
        scale = (qkv.shape[-1] // 3 // heads) ** -0.5
    return _qkv_attention_ad(qkv, heads, bias, float(scale), block_q, interpret)


@functools.partial(
    jax.jit, static_argnames=("heads", "scale", "block_q", "interpret")
)
def _fused_qkv_attention_impl(
    qkv: jax.Array,
    heads: int,
    bias: Optional[jax.Array] = None,
    *,
    scale: Optional[float] = None,
    block_q: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """Self-attention straight off the fused qkv projection.

    Args:
      qkv: ``[B, N, 3*H*D]`` — the fused Dense output, laid out [q | k | v].
      heads: H.
      bias: optional additive logits bias ``[1|B, 1|H, N, N]``.
      block_q: Q tile rows for long sequences; tiles are exact-N when
        ``N <= block_q`` (the final ragged tile relies on Pallas store
        masking otherwise).

    Returns ``[B, N, H*D]``.
    """
    b, n, three_hd = qkv.shape
    hd = three_hd // 3
    d = hd // heads
    if scale is None:
        scale = d**-0.5

    # cap the fp32 scores tile (block_q x N) at ~4MB of VMEM
    max_rows = max(128, (4 * 1024 * 1024 // (n * 4)) // 128 * 128)
    block_q = min(block_q, max_rows, n)
    n_q = pl.cdiv(n, block_q)
    grid = (b, n_q)

    in_specs = [
        pl.BlockSpec((1, block_q, three_hd), lambda bi, qi: (bi, qi, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n, three_hd), lambda bi, qi: (bi, 0, 0), memory_space=pltpu.VMEM),
    ]

    has_bias = bias is not None
    bias_per_head = False
    if has_bias:
        bb, bh, bnq, bnk = bias.shape
        assert bnq == n and bnk == n, "bias must be [*, *, N, N]"
        bias_per_head = bh > 1
        biasf = bias.astype(jnp.float32)
        if bb == 1:
            bias_idx = lambda bi, qi: (0, 0, qi, 0)
        else:
            bias_idx = lambda bi, qi: (bi, 0, qi, 0)
        in_specs.append(
            pl.BlockSpec((1, bh, block_q, n), bias_idx, memory_space=pltpu.VMEM)
        )
        args = (qkv, qkv, biasf)
    else:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        args = (qkv, qkv, jnp.zeros((1, 1), jnp.float32))

    return pl.pallas_call(
        functools.partial(
            _kernel,
            heads=heads,
            d=d,
            scale=float(scale),
            has_bias=has_bias,
            bias_per_head=bias_per_head,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, block_q, hd), lambda bi, qi: (bi, qi, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, n, hd), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * heads * n * n * d,
            bytes_accessed=qkv.size * qkv.dtype.itemsize,
            transcendentals=b * heads * n * n,
        ),
        interpret=interpret,
    )(*args)
