"""Fully-fused attention block kernel: LN -> qkv GEMM -> softmax-attention
-> out GEMM -> +residual, one Pallas call.

The per-op pipeline costs ~600MB of HBM traffic per ViT-L layer (LN write,
qkv write, attention in/out, out-proj in/out, residual); this kernel reads
the residual stream once and writes it once (~112MB), with both weight
matrices resident in VMEM across the whole batch grid (constant index maps)
and all intermediates — normalized activations, fused qkv, attention
probabilities — living only in VMEM/registers.

Serves the vanilla self-attention block family (ViT/SimpleViT/CaiT-patch/
PiT/T2T encoders...): pre-norm, fused qkv without bias (the reference's
convention, vit.py:68), biasless softmax, projection with bias, residual.
Variants with logit bias / masking / head mixing use the standalone
attention kernels.

VMEM budget at ViT-L (D=1024, H=16): Wqkv 6MB + Wout 2MB + per-step x/qkv/
out panels ~2.5MB + fp32 scores tile — comfortably inside 16MB for N<=1024.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln_f32(x, scale, bias, eps=1e-6):
    # Matches flax.linen.LayerNorm exactly (use_fast_variance=True, scale
    # folded into the rsqrt multiplier): the reference zoo normalizes with
    # flax LayerNorm, and reproducing its op sequence keeps the bf16
    # rounding decisions downstream bit-aligned with the jitted reference.
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.maximum(
        0.0, jnp.mean(jnp.square(x), axis=-1, keepdims=True) - jnp.square(mean)
    )
    mul = jax.lax.rsqrt(var + eps) * scale
    return (x - mean) * mul + bias


def _kernel(
    x_ref,        # (bb, N, D)
    ln_scale_ref,  # (1, D)
    ln_bias_ref,   # (1, D)
    wqkv_ref,      # (D, 3*H*Dh)
    wout_ref,      # (H*Dh, D)
    bout_ref,      # (1, D)
    o_ref,         # (bb, N, D)
    *,
    heads: int,
    d: int,
    scale: float,
    ln_eps: float,
    batch_tile: int,
    true_n: int,
    block_tokens: int,
):
    precision = (
        jax.lax.Precision.HIGHEST
        if wqkv_ref.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    hd = heads * d
    n, dim = x_ref.shape[1], x_ref.shape[2]
    # Flatten the batch tile into the GEMM M dimension (MXU fill: tiling
    # more than one sample per grid step lifts M past the 197-token fmap).
    x = x_ref[...].reshape(batch_tile * n, dim)
    xn = _ln_f32(
        x.astype(jnp.float32),
        ln_scale_ref[0].astype(jnp.float32),
        ln_bias_ref[0].astype(jnp.float32),
        ln_eps,
    ).astype(wqkv_ref.dtype)

    qkv = jax.lax.dot(
        xn, wqkv_ref[:], preferred_element_type=jnp.float32, precision=precision
    ).astype(wqkv_ref.dtype)  # (bb*N, 3*H*Dh)

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
                preferred_element_type=jnp.float32, precision=precision,
            )
            s *= scale
            if true_n != block_tokens or block_tokens != n:
                # Token padding (16-row Mosaic alignment): padded key
                # columns must not receive attention mass. Padded query
                # rows produce garbage that the caller slices off.
                # Sample packing (block_tokens < n): the row carries
                # n // block_tokens samples, each padded to block_tokens
                # rows with true_n real tokens — a key column is visible
                # only to queries of ITS sample (block-diagonal mask).
                col_ids = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                ok = col_ids % block_tokens < true_n
                if block_tokens != n:
                    row_ids = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
                    ok &= (col_ids // block_tokens) == (row_ids // block_tokens)
                s = jnp.where(ok, s, -1e30)
            # jax.nn.softmax's exact op sequence (division, not
            # reciprocal-multiply) — see _ln_f32 note on rounding alignment.
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            p = p / l
            head_parts.append(
                jax.lax.dot(
                    p.astype(v.dtype), v,
                    preferred_element_type=jnp.float32, precision=precision,
                ).astype(wout_ref.dtype)
            )
        attn_out_parts.append(jnp.concatenate(head_parts, axis=-1))
    attn_out = jnp.concatenate(attn_out_parts, axis=0)  # (bb*N, H*Dh)

    out = jax.lax.dot(
        attn_out, wout_ref[:], preferred_element_type=jnp.float32, precision=precision
    )
    out += bout_ref[0].astype(jnp.float32)
    out += x.astype(jnp.float32)  # residual, fused
    o_ref[...] = out.reshape(batch_tile, n, dim).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "heads", "scale", "ln_eps", "true_n", "block_tokens", "interpret"
    ),
)
def _attention_block_impl(
    x, ln_scale, ln_bias, wqkv, wout, bout, heads, scale, ln_eps, true_n,
    block_tokens, interpret,
):
    b, n_in, dim = x.shape
    if block_tokens is not None:
        # Packed stream: the caller laid out n_in // block_tokens samples
        # per row-block, already tile-aligned; true_n is the per-sample
        # real token count.
        assert true_n is not None and n_in % block_tokens == 0
    if true_n is None:
        true_n = n_in
    three_hd = wqkv.shape[1]
    hd = three_hd // 3
    d = hd // heads

    # Pad tokens to the Mosaic sublane tile: a 16-aligned M dim measured 5%
    # faster even with the extra rows (ViT-L 197 -> 208: 2.77 vs 2.92 ms),
    # and alignment is what legalizes the in-kernel (bb, n, d) -> (bb*n, d)
    # collapse batch tiling needs (unaligned collapses are unsupported
    # shape casts — hit at CrossViT's 257-token branch). Padded key columns
    # are masked out of the softmax in-kernel; padded query rows are
    # sliced off below.
    #
    # Callers that keep the WHOLE residual stream padded across the encoder
    # (models/vit.py pads once after the position add) pass the padded x
    # plus the real token count as ``true_n`` — then no pad/slice round
    # trip happens here at all, which removes a full-stream HBM copy pair
    # per layer (the round-3 flagship lever).
    sublanes = 16 if x.dtype.itemsize < 4 else 8
    n = (n_in + sublanes - 1) // sublanes * sublanes
    if n != n_in:
        x = jnp.pad(x, ((0, 0), (0, n - n_in), (0, 0)))

    # Batch tile: lift the GEMM M dim past one sample's token count while
    # keeping (weights + tile activations + scores) inside ~14MB of VMEM.
    import os

    bb = 1
    weights_bytes = (dim * three_hd + hd * dim) * wqkv.dtype.itemsize
    per_sample = (
        2 * n * dim * x.dtype.itemsize          # x tile + out tile
        + 2 * n * three_hd * wqkv.dtype.itemsize  # xn + qkv (bf16)
        + n * three_hd * 4                        # fp32 qkv GEMM accumulator
        + n * n * 4                               # fp32 scores (per head, reused)
    )
    budget = 14 * 1024 * 1024 - weights_bytes
    while bb < 8 and b % (bb * 2) == 0 and per_sample * (bb * 2) <= budget:
        bb *= 2
    override = os.environ.get("VIT_TPU_BLOCK_BB")
    if override:
        bb = int(override)
        assert b % bb == 0

    grid = (b // bb,)
    out = pl.pallas_call(
        functools.partial(
            _kernel, heads=heads, d=d, scale=float(scale), ln_eps=ln_eps,
            batch_tile=bb, true_n=true_n,
            block_tokens=block_tokens if block_tokens is not None else n,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bb, n, dim), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dim, three_hd), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hd, dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, n, dim), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, dim), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * dim * three_hd
            + 4 * b * heads * n * n * d
            + 2 * b * n * hd * dim,
            bytes_accessed=2 * x.size * x.dtype.itemsize
            + (wqkv.size + wout.size) * wqkv.dtype.itemsize,
            transcendentals=b * heads * n * n,
        ),
        interpret=interpret,
    )(
        x,
        ln_scale.reshape(1, dim),
        ln_bias.reshape(1, dim),
        wqkv,
        wout,
        bout.reshape(1, dim),
    )
    return out[:, :n_in] if n != n_in else out


def xla_attention_block(
    x, ln_scale, ln_bias, wqkv, wout, bout, heads, scale, ln_eps=1e-6,
    true_n=None, block_tokens=None,
):
    """Plain-XLA equivalent — reference, CPU fallback, and the recompute for
    the custom backward. ``true_n`` masks padded key columns out of the
    softmax when the caller keeps a padded residual stream (exactly the
    in-kernel rule, so padded and unpadded streams produce identical real
    rows in every backend). ``block_tokens`` enables the packed-stream
    block-diagonal mask (see ``fused_attention_block``)."""
    b, n, dim = x.shape
    hd = wqkv.shape[1] // 3
    d = hd // heads
    xn = _ln_f32(
        x.astype(jnp.float32), ln_scale.astype(jnp.float32),
        ln_bias.astype(jnp.float32), ln_eps,
    ).astype(wqkv.dtype)
    qkv = jnp.einsum("bnd,df->bnf", xn, wqkv, preferred_element_type=jnp.float32)
    qkv = qkv.astype(wqkv.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    split = lambda t: t.reshape(b, n, heads, d).transpose(0, 2, 1, 3)
    q, k, v = split(q), split(k), split(v)
    s = jnp.einsum("bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32) * scale
    bt = block_tokens if block_tokens is not None else n
    if (true_n is not None and true_n != bt) or bt != n:
        col_ids = jax.lax.broadcasted_iota(jnp.int32, s.shape, 3)
        ok = col_ids % bt < (true_n if true_n is not None else bt)
        if bt != n:
            row_ids = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
            ok &= (col_ids // bt) == (row_ids // bt)
        s = jnp.where(ok, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhij,bhjd->bhid", p.astype(v.dtype), v)
    o = o.transpose(0, 2, 1, 3).reshape(b, n, hd).astype(wout.dtype)
    out = jnp.einsum("bnf,fd->bnd", o, wout, preferred_element_type=jnp.float32)
    out = out + bout.astype(jnp.float32) + x.astype(jnp.float32)
    return out.astype(x.dtype)


@functools.lru_cache(maxsize=None)
def _partitioned_impl(heads, scale, ln_eps, true_n, block_tokens, interpret):
    """Mesh-partitionable forward (ops/partitioning.py): the batch grid is
    sharded in place; every other dim (tokens, model dim, the whole-dim
    weights) is need-replication, so a TP-sharded weight reaching this
    fused whole-dim kernel is gathered by the compiler."""
    from vit_tpu.ops.partitioning import partitioned

    def fn(x, ln_scale, ln_bias, wqkv, wout, bout):
        return _attention_block_impl(
            x, ln_scale, ln_bias, wqkv, wout, bout, heads, scale, ln_eps,
            true_n, block_tokens, interpret,
        )

    return partitioned(
        fn,
        roles_in=(
            ("b", "n", "d"), ("d",), ("d",), ("d", "f"), ("g", "d"), ("d",),
        ),
        roles_out=("b", "n", "d"),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11))
def _attention_block_ad(
    x, ln_scale, ln_bias, wqkv, wout, bout, heads, scale, ln_eps, true_n,
    block_tokens, interpret,
):
    return _partitioned_impl(heads, scale, ln_eps, true_n, block_tokens, interpret)(
        x, ln_scale, ln_bias, wqkv, wout, bout
    )


def _ab_fwd(
    x, ln_scale, ln_bias, wqkv, wout, bout, heads, scale, ln_eps, true_n,
    block_tokens, interpret,
):
    out = _partitioned_impl(heads, scale, ln_eps, true_n, block_tokens, interpret)(
        x, ln_scale, ln_bias, wqkv, wout, bout
    )
    return out, (x, ln_scale, ln_bias, wqkv, wout, bout)


def _ab_bwd(heads, scale, ln_eps, true_n, block_tokens, interpret, res, g):
    def f(*diff_args):
        return xla_attention_block(
            *diff_args, heads, scale, ln_eps, true_n, block_tokens
        )

    _, vjp = jax.vjp(f, *res)
    return vjp(g.astype(res[0].dtype))


_attention_block_ad.defvjp(_ab_fwd, _ab_bwd)


def fused_attention_block(
    x: jax.Array,
    ln_scale: jax.Array,
    ln_bias: jax.Array,
    wqkv: jax.Array,
    wout: jax.Array,
    bout: jax.Array,
    heads: int,
    *,
    scale: Optional[float] = None,
    ln_eps: float = 1e-6,
    true_n: Optional[int] = None,
    block_tokens: Optional[int] = None,
    interpret: bool = False,
) -> jax.Array:
    """``x + out_proj(attention(qkv_proj(LN(x))))`` in one kernel.

    Differentiable (Pallas forward, XLA-recompute backward). Returns the
    residual-added stream, same shape/dtype as ``x``.

    ``true_n``: real token count when ``x`` arrives pre-padded to the Mosaic
    sublane tile (padded key columns are masked out of the softmax; padded
    query rows come back as don't-care values). Passing it skips the
    per-call pad/slice of the full stream.

    ``block_tokens``: sample-packed stream mode (round 4). The caller lays
    out k = n // block_tokens samples per batch row, each padded to
    ``block_tokens`` rows with ``true_n`` real tokens, so an unaligned
    token count pays the sublane pad tax once per k samples instead of
    once per sample (65 tokens: 80 padded rows/sample solo vs 72 packed
    at k=2). Attention is masked block-diagonally — queries only see keys
    of their own sample — and every row-wise op (LN, MLP) is unaffected.
    """
    if scale is None:
        scale = (wqkv.shape[1] // 3 // heads) ** -0.5
    return _attention_block_ad(
        x, ln_scale, ln_bias, wqkv, wout, bout, heads, float(scale), ln_eps,
        true_n, block_tokens, interpret,
    )
