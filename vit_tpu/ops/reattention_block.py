"""Fused DeepViT re-attention block kernel.

DeepViT (reference deepvit.py:46-89) inserts a learned head re-mixing of
the attention map followed by a LayerNorm over the head axis between
softmax and PV:

    p   = softmax(q k^T * scale)             per head
    r_g = sum_h reattn[h, g] * p_h           head mix (deepvit.py:69)
    r'  = LayerNorm_over_heads(r)            (deepvit.py:70-72)
    out = r' v

The reference (and this repo's XLA fallback) materializes p in HBM and
transposes (b, h, i, j) -> (b, i, j, h) for the LayerNorm. In-kernel both
steps are tile-wise over the per-head (N, N) score tiles held in VMEM:
the head mix is a weighted sum of tiles, and the LayerNorm-over-heads is
elementwise across the 16 tiles (mean/var per (i, j) position) — no
transposes, no HBM round trip, one kernel for the whole block
(LN -> qkv -> re-attention -> out proj -> +residual).

Numerics follow flax LayerNorm's op order (fast variance, scale folded
into the rsqrt multiplier) and jax.nn.softmax's division, like the other
kernels in this package.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vit_tpu.ops.block_attention import _ln_f32


def _kernel(
    x_ref,          # (BB, N, D)
    ln_scale_ref,   # (1, D)
    ln_bias_ref,    # (1, D)
    wqkv_ref,       # (D, 3*H*Dh)
    wout_ref,       # (H*Dh, D)
    bout_ref,       # (1, D)
    mix_ref,        # (H, H) re-attention head mix
    rln_scale_ref,  # (1, H)
    rln_bias_ref,   # (1, H)
    o_ref,          # (BB, N, D)
    *,
    heads: int,
    d: int,
    scale: float,
    ln_eps: float,
    reattn_eps: float,
    true_n: int,
    bb: int = 1,
):
    """``bb`` samples per grid step (see _th_kernel): the qkv/out GEMMs run
    on ``bb*n`` rows for MXU M-occupancy; the per-sample score pipeline is
    a static python loop."""
    precision = (
        jax.lax.Precision.HIGHEST
        if wqkv_ref.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    hd = heads * d
    n = x_ref.shape[1]
    x = x_ref[...].reshape(bb * n, x_ref.shape[2])
    xn = _ln_f32(
        x.astype(jnp.float32),
        ln_scale_ref[0].astype(jnp.float32),
        ln_bias_ref[0].astype(jnp.float32),
        ln_eps,
    ).astype(wqkv_ref.dtype)

    qkv = jax.lax.dot(
        xn, wqkv_ref[:], preferred_element_type=jnp.float32, precision=precision
    ).astype(wqkv_ref.dtype)

    col_valid = None
    if true_n != n:
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
        col_valid = col_ids < true_n

    mix = mix_ref[...].astype(jnp.float32)
    rln_scale = rln_scale_ref[0].astype(jnp.float32)
    rln_bias = rln_bias_ref[0].astype(jnp.float32)
    inv_h = 1.0 / heads

    attn_rows = []
    for s_i in range(bb):
        rows = slice(s_i * n, (s_i + 1) * n)
        # per-head softmax'd score tiles, fp32, resident in VMEM
        ps = []
        for h in range(heads):
            q = qkv[rows, h * d : (h + 1) * d]
            k = qkv[rows, hd + h * d : hd + (h + 1) * d]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            )
            s *= scale
            if col_valid is not None:
                s = jnp.where(col_valid, s, -1e30)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            ps.append(p / jnp.sum(p, axis=-1, keepdims=True))

        # head re-mix: r_g = sum_h mix[h, g] * p_h — weighted sums of tiles
        rs = [
            sum(mix[h, g] * ps[h] for h in range(heads)) for g in range(heads)
        ]

        # LayerNorm over the head axis, elementwise across tiles (flax op
        # order: fast variance, scale folded into the rsqrt multiplier)
        mean = sum(rs) * inv_h
        var = sum(r * r for r in rs) * inv_h - mean * mean
        var = jnp.maximum(var, 0.0)
        mul = jax.lax.rsqrt(var + reattn_eps)

        outs = []
        for g in range(heads):
            rg = (rs[g] - mean) * (mul * rln_scale[g]) + rln_bias[g]
            if col_valid is not None:
                # the LN bias resurrects padded key columns (0 -> bias_g);
                # they must contribute nothing to PV
                rg = jnp.where(col_valid, rg, 0.0)
            v = qkv[rows, 2 * hd + g * d : 2 * hd + (g + 1) * d]
            outs.append(
                jax.lax.dot(
                    rg.astype(v.dtype), v,
                    preferred_element_type=jnp.float32, precision=precision,
                ).astype(wout_ref.dtype)
            )
        attn_rows.append(jnp.concatenate(outs, axis=-1))
    attn_out = attn_rows[0] if bb == 1 else jnp.concatenate(attn_rows, axis=0)

    out = jax.lax.dot(
        attn_out, wout_ref[:], preferred_element_type=jnp.float32, precision=precision
    )
    out += bout_ref[0].astype(jnp.float32)
    out += x.astype(jnp.float32)
    o_ref[...] = out.astype(o_ref.dtype).reshape(bb, n, o_ref.shape[2])


def _th_kernel(
    x_ref,          # (BB, N, D)
    ln_scale_ref,   # (1, D)
    ln_bias_ref,    # (1, D)
    wqkv_ref,       # (D, 3*H*Dh)
    wout_ref,       # (H*Dh, D)
    bout_ref,       # (1, D)
    pre_ref,        # (H, H) pre-softmax head mix
    post_ref,       # (H, H) post-softmax head mix
    o_ref,          # (BB, N, D)
    *,
    heads: int,
    d: int,
    scale: float,
    ln_eps: float,
    residual: bool,
    true_n: int,
    bb: int = 1,
):
    """CaiT talking-heads block (cait.py:87-107): scores -> pre-softmax
    head mix -> softmax -> post-softmax head mix -> PV, the mixes tile-wise
    over per-head score tiles in VMEM. Padded key columns are masked AFTER
    the pre-mix (mixing -1e30 placeholders through signed weights would
    corrupt them) and carry zero mass through the post-mix.

    ``bb`` samples per grid step: CaiT's patch stage is n=64 at dim 1024,
    so a one-sample step feeds the MXU 64-row GEMMs — batch-blocking the
    qkv/out projections to ``bb*n`` rows restores M-occupancy (round-5
    measurement: the stage ran at ~46% of bf16 peak with bb=1). The
    per-sample score pipeline stays a python loop (static, small)."""
    precision = (
        jax.lax.Precision.HIGHEST
        if wqkv_ref.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    hd = heads * d
    n = x_ref.shape[1]
    x = x_ref[...].reshape(bb * n, x_ref.shape[2])
    xn = _ln_f32(
        x.astype(jnp.float32),
        ln_scale_ref[0].astype(jnp.float32),
        ln_bias_ref[0].astype(jnp.float32),
        ln_eps,
    ).astype(wqkv_ref.dtype)

    qkv = jax.lax.dot(
        xn, wqkv_ref[:], preferred_element_type=jnp.float32, precision=precision
    ).astype(wqkv_ref.dtype)

    pre = pre_ref[...].astype(jnp.float32)
    post = post_ref[...].astype(jnp.float32)
    col_valid = None
    if true_n != n:
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
        col_valid = col_ids < true_n

    attn_rows = []
    for s_i in range(bb):
        rows = slice(s_i * n, (s_i + 1) * n)
        ss = []
        for h in range(heads):
            q = qkv[rows, h * d : (h + 1) * d]
            k = qkv[rows, hd + h * d : hd + (h + 1) * d]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            )
            ss.append(s * scale)

        mixed = [sum(pre[h, g] * ss[h] for h in range(heads)) for g in range(heads)]
        if col_valid is not None:
            mixed = [jnp.where(col_valid, s, -1e30) for s in mixed]

        ps = []
        for s in mixed:
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            ps.append(p / jnp.sum(p, axis=-1, keepdims=True))

        outs = []
        for g in range(heads):
            pg = sum(post[h, g] * ps[h] for h in range(heads))
            v = qkv[rows, 2 * hd + g * d : 2 * hd + (g + 1) * d]
            outs.append(
                jax.lax.dot(
                    pg.astype(v.dtype), v,
                    preferred_element_type=jnp.float32, precision=precision,
                ).astype(wout_ref.dtype)
            )
        attn_rows.append(jnp.concatenate(outs, axis=-1))
    attn_out = attn_rows[0] if bb == 1 else jnp.concatenate(attn_rows, axis=0)

    out = jax.lax.dot(
        attn_out, wout_ref[:], preferred_element_type=jnp.float32, precision=precision
    )
    out += bout_ref[0].astype(jnp.float32)
    if residual:
        out += x.astype(jnp.float32)
    o_ref[...] = out.astype(o_ref.dtype).reshape(bb, n, o_ref.shape[2])


@functools.partial(
    jax.jit,
    static_argnames=("heads", "scale", "ln_eps", "residual", "interpret"),
)
def _talking_heads_block_impl(
    x, ln_scale, ln_bias, wqkv, wout, bout, mix_pre, mix_post,
    heads, scale, ln_eps, residual, interpret,
):
    b, true_n, dim = x.shape
    three_hd = wqkv.shape[1]
    hd = three_hd // 3
    d = hd // heads

    sublanes = 16 if x.dtype.itemsize < 4 else 8
    n = (true_n + sublanes - 1) // sublanes * sublanes
    if n != true_n:
        x = jnp.pad(x, ((0, 0), (0, n - true_n), (0, 0)))

    # Batch-block short-sequence calls so the qkv/out GEMMs see bb*n rows
    # (MXU M-occupancy; see _th_kernel docstring). Score tiles cost
    # bb*heads*n^2 fp32 words twice over — gate at the measured-win shape
    # (n<=64; at n=80 the re-attention sibling measured a regression from
    # the same blocking — VMEM pressure from the live tile lists).
    bb = 1
    if n <= 64:
        for cand in (4, 2):
            if b % cand == 0 and cand * heads * n * n * 4 * 2 <= 4 * 1024 * 1024:
                bb = cand
                break

    out = pl.pallas_call(
        functools.partial(
            _th_kernel, heads=heads, d=d, scale=float(scale), ln_eps=ln_eps,
            residual=residual, true_n=true_n, bb=bb,
        ),
        grid=(b // bb,),
        in_specs=[
            pl.BlockSpec((bb, n, dim), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dim, three_hd), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hd, dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((heads, heads), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((heads, heads), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, n, dim), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, dim), x.dtype),
        interpret=interpret,
    )(
        x,
        ln_scale.reshape(1, dim),
        ln_bias.reshape(1, dim),
        wqkv,
        wout,
        bout.reshape(1, dim),
        mix_pre,
        mix_post,
    )
    return out[:, :true_n] if n != true_n else out


def xla_talking_heads_block(
    x, ln_scale, ln_bias, wqkv, wout, bout, mix_pre, mix_post,
    heads, scale, ln_eps=1e-5, residual=False,
):
    """Plain-XLA equivalent (cait.py:87-107 semantics)."""
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
    s = jnp.einsum("bhij,hg->bgij", s, mix_pre.astype(s.dtype))
    p = jax.nn.softmax(s, axis=-1)
    p = jnp.einsum("bhij,hg->bgij", p, mix_post.astype(p.dtype))
    o = jnp.einsum("bhij,bhjd->bhid", p.astype(v.dtype), v)
    o = o.transpose(0, 2, 1, 3).reshape(b, n, hd).astype(wout.dtype)
    out = jnp.einsum("bnf,fd->bnd", o, wout, preferred_element_type=jnp.float32)
    out = out + bout.astype(jnp.float32)
    if residual:
        out = out + x.astype(jnp.float32)
    return out.astype(x.dtype)


@functools.lru_cache(maxsize=None)
def _partitioned_th(heads, scale, ln_eps, residual, interpret):
    """Mesh-partitionable forward (ops/partitioning.py): batch grid sharded
    in place; weights and head-mix tables need-replication."""
    from vit_tpu.ops.partitioning import partitioned

    def fn(x, ln_scale, ln_bias, wqkv, wout, bout, mix_pre, mix_post):
        return _talking_heads_block_impl(
            x, ln_scale, ln_bias, wqkv, wout, bout, mix_pre, mix_post,
            heads, scale, ln_eps, residual, interpret,
        )

    return partitioned(
        fn,
        roles_in=(
            ("b", "n", "d"), ("d",), ("d",), ("d", "f"), ("g", "d"), ("d",),
            ("h1", "h2"), ("h3", "h4"),
        ),
        roles_out=("b", "n", "d"),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12))
def _th_ad(x, ln_scale, ln_bias, wqkv, wout, bout, mix_pre, mix_post,
           heads, scale, ln_eps, residual, interpret):
    return _partitioned_th(heads, scale, ln_eps, residual, interpret)(
        x, ln_scale, ln_bias, wqkv, wout, bout, mix_pre, mix_post
    )


def _th_fwd(x, ln_scale, ln_bias, wqkv, wout, bout, mix_pre, mix_post,
            heads, scale, ln_eps, residual, interpret):
    out = _partitioned_th(heads, scale, ln_eps, residual, interpret)(
        x, ln_scale, ln_bias, wqkv, wout, bout, mix_pre, mix_post
    )
    return out, (x, ln_scale, ln_bias, wqkv, wout, bout, mix_pre, mix_post)


def _th_bwd(heads, scale, ln_eps, residual, interpret, res, g):
    def f(*diff_args):
        return xla_talking_heads_block(
            *diff_args, heads, scale, ln_eps, residual
        )

    _, vjp = jax.vjp(f, *res)
    return vjp(g.astype(res[0].dtype))


_th_ad.defvjp(_th_fwd, _th_bwd)


def fused_talking_heads_block(
    x: jax.Array,
    ln_scale: jax.Array,
    ln_bias: jax.Array,
    wqkv: jax.Array,
    wout: jax.Array,
    bout: jax.Array,
    mix_pre: jax.Array,
    mix_post: jax.Array,
    heads: int,
    *,
    scale: Optional[float] = None,
    ln_eps: float = 1e-5,
    residual: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """``out_proj(talking_heads_attention(qkv_proj(LN(x))))`` in one kernel
    (+x if ``residual``). Differentiable (XLA-recompute backward)."""
    if scale is None:
        scale = (wqkv.shape[1] // 3 // heads) ** -0.5
    return _th_ad(
        x, ln_scale, ln_bias, wqkv, wout, bout, mix_pre, mix_post,
        heads, float(scale), ln_eps, residual, interpret,
    )


@functools.partial(
    jax.jit, static_argnames=("heads", "scale", "ln_eps", "reattn_eps", "interpret")
)
def _reattention_block_impl(
    x, ln_scale, ln_bias, wqkv, wout, bout, mix, rln_scale, rln_bias,
    heads, scale, ln_eps, reattn_eps, interpret,
):
    b, true_n, dim = x.shape
    three_hd = wqkv.shape[1]
    hd = three_hd // 3
    d = hd // heads

    sublanes = 16 if x.dtype.itemsize < 4 else 8
    n = (true_n + sublanes - 1) // sublanes * sublanes
    if n != true_n:
        x = jnp.pad(x, ((0, 0), (0, n - true_n), (0, 0)))

    # Same short-sequence batch-blocking as the talking-heads kernel, but
    # gated tighter: at the DeepViT zoo shape (padded n=80, heads 16) bb=4
    # measured a ~10% whole-model REGRESSION (re-attention keeps ps+rs
    # tile lists live simultaneously — 80^2 fp32 tiles spill VMEM where
    # CaiT's 64^2 fit), so only clean n<=64 blocks.
    bb = 1
    if n <= 64:
        for cand in (4, 2):
            if b % cand == 0 and cand * heads * n * n * 4 * 2 <= 4 * 1024 * 1024:
                bb = cand
                break

    out = pl.pallas_call(
        functools.partial(
            _kernel, heads=heads, d=d, scale=float(scale), ln_eps=ln_eps,
            reattn_eps=reattn_eps, true_n=true_n, bb=bb,
        ),
        grid=(b // bb,),
        in_specs=[
            pl.BlockSpec((bb, n, dim), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dim, three_hd), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hd, dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((heads, heads), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, heads), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, heads), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, n, dim), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, dim), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * dim * three_hd
            + 4 * b * heads * n * n * d
            + 2 * b * n * hd * dim
            + 4 * b * heads * heads * n * n,
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
        mix,
        rln_scale.reshape(1, heads),
        rln_bias.reshape(1, heads),
    )
    return out[:, :true_n] if n != true_n else out


def xla_reattention_block(
    x, ln_scale, ln_bias, wqkv, wout, bout, mix, rln_scale, rln_bias,
    heads, scale, ln_eps=1e-6, reattn_eps=1e-6,
):
    """Plain-XLA equivalent (reference deepvit.py:60-77 semantics):
    numerical reference, CPU fallback, and the recompute for backward."""
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
    p = jax.nn.softmax(s, axis=-1)
    r = jnp.einsum("bhij,hg->bgij", p, mix.astype(p.dtype))
    r = _ln_f32(
        r.transpose(0, 2, 3, 1),
        rln_scale.astype(jnp.float32),
        rln_bias.astype(jnp.float32),
        reattn_eps,
    ).transpose(0, 3, 1, 2)
    o = jnp.einsum("bhij,bhjd->bhid", r.astype(v.dtype), v)
    o = o.transpose(0, 2, 1, 3).reshape(b, n, hd).astype(wout.dtype)
    out = jnp.einsum("bnf,fd->bnd", o, wout, preferred_element_type=jnp.float32)
    out = out + bout.astype(jnp.float32) + x.astype(jnp.float32)
    return out.astype(x.dtype)


@functools.lru_cache(maxsize=None)
def _partitioned_reattn(heads, scale, ln_eps, reattn_eps, interpret):
    """Mesh-partitionable forward (ops/partitioning.py): batch grid sharded
    in place; weights, head mix, and re-attention LN params need-replication."""
    from vit_tpu.ops.partitioning import partitioned

    def fn(x, ln_scale, ln_bias, wqkv, wout, bout, mix, rln_scale, rln_bias):
        return _reattention_block_impl(
            x, ln_scale, ln_bias, wqkv, wout, bout, mix, rln_scale, rln_bias,
            heads, scale, ln_eps, reattn_eps, interpret,
        )

    return partitioned(
        fn,
        roles_in=(
            ("b", "n", "d"), ("d",), ("d",), ("d", "f"), ("g", "d"), ("d",),
            ("h1", "h2"), ("h3",), ("h4",),
        ),
        roles_out=("b", "n", "d"),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12, 13))
def _reattn_ad(x, ln_scale, ln_bias, wqkv, wout, bout, mix, rln_scale, rln_bias,
               heads, scale, ln_eps, reattn_eps, interpret):
    return _partitioned_reattn(heads, scale, ln_eps, reattn_eps, interpret)(
        x, ln_scale, ln_bias, wqkv, wout, bout, mix, rln_scale, rln_bias
    )


def _reattn_fwd(x, ln_scale, ln_bias, wqkv, wout, bout, mix, rln_scale, rln_bias,
                heads, scale, ln_eps, reattn_eps, interpret):
    out = _partitioned_reattn(heads, scale, ln_eps, reattn_eps, interpret)(
        x, ln_scale, ln_bias, wqkv, wout, bout, mix, rln_scale, rln_bias
    )
    return out, (x, ln_scale, ln_bias, wqkv, wout, bout, mix, rln_scale, rln_bias)


def _reattn_bwd(heads, scale, ln_eps, reattn_eps, interpret, res, g):
    def f(*diff_args):
        return xla_reattention_block(
            *diff_args, heads, scale, ln_eps, reattn_eps
        )

    _, vjp = jax.vjp(f, *res)
    return vjp(g.astype(res[0].dtype))


_reattn_ad.defvjp(_reattn_fwd, _reattn_bwd)


def fused_reattention_block(
    x: jax.Array,
    ln_scale: jax.Array,
    ln_bias: jax.Array,
    wqkv: jax.Array,
    wout: jax.Array,
    bout: jax.Array,
    mix: jax.Array,
    rln_scale: jax.Array,
    rln_bias: jax.Array,
    heads: int,
    *,
    scale: Optional[float] = None,
    ln_eps: float = 1e-6,
    reattn_eps: float = 1e-6,
    interpret: bool = False,
) -> jax.Array:
    """``x + out_proj(reattention(qkv_proj(LN(x))))`` in one kernel.

    Differentiable (Pallas forward, XLA-recompute backward). Returns the
    residual-added stream, same shape/dtype as ``x``.
    """
    if scale is None:
        scale = (wqkv.shape[1] // 3 // heads) ** -0.5
    return _reattn_ad(
        x, ln_scale, ln_bias, wqkv, wout, bout, mix, rln_scale, rln_bias,
        heads, float(scale), ln_eps, reattn_eps, interpret,
    )
