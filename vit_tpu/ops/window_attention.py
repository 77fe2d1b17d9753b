"""Fused multi-window attention block kernel.

Window attention in the zoo runs at 4-64-token windows (crossformer.py:139,
twins_svt.py:120, nest.py:183, scalable_vit.py:195, region_vit_flax.py:158)
— far below MXU tile size, so per-window kernels are launch-bound and the
XLA batched-einsum path is bandwidth-bound (measured r2: the attention
chain is 61% of CrossFormer's runtime, mostly HBM round-trips between LN,
qkv projection, partition, scores, softmax, merge, out-projection).

This kernel packs G windows per grid program and fuses the WHOLE block:

    LN -> qkv GEMM -> block-diagonal attention (+shared bias) -> out GEMM

One read of the windowed tokens, one write. The G windows' scores are one
(G*Sp, G*Sp) MXU matmul with a static block-diagonal mask (-inf off-block)
and the shared per-window bias tiled across the diagonal with
``pltpu.repeat``: at these window sizes the G-fold score waste is noise
next to the projections (window attention is ~3% of model FLOPs) and it
keeps every dot MXU-shaped instead of G*H tiny dots.

Mosaic layout constraints honored: windows are padded to a 16-multiple
``Sp`` and flattened to 2-D OUTSIDE the kernel (a collapse of unaligned
dims inside the kernel is an unsupported shape cast); every kernel block is
2-D with lane-aligned rows.

Numerics follow the rest of the framework (PARITY.md): fp32 LN (flax-exact
fast variance), bf16 GEMM operands with fp32 accumulation rounded once,
fp32 softmax via division, fp32 bias adds.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vit_tpu.core.utils import round_up
from vit_tpu.ops.flash_attention import MASK_VALUE


def _ln_f32(x, scale, bias, eps):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.maximum(
        0.0, jnp.mean(jnp.square(x), axis=-1, keepdims=True) - jnp.square(mean)
    )
    mul = jax.lax.rsqrt(var + eps) * scale
    return (x - mean) * mul + bias


def _kernel(
    x_ref,        # (G*Sp, C) — G padded windows, flattened
    ln_scale_ref,  # (1, C)
    ln_bias_ref,   # (1, C)
    wqkv_ref,      # (C, 3*H*D)
    wout_ref,      # (H*D, C)
    bout_ref,      # (1, C)
    bias_ref,      # (Hb, Sp, Sp) fp32, Hb in {1, H}; or unused
    o_ref,         # (G*Sp, C)
    *,
    heads: int,
    d: int,
    scale: float,
    ln_eps: float,
    g: int,
    sp: int,
    s: int,
    has_bias: bool,
    interpret: bool,
):
    precision = (
        jax.lax.Precision.HIGHEST
        if wqkv_ref.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    c = x_ref.shape[1]
    hd = heads * d
    gs = g * sp

    x = x_ref[...]
    xn = _ln_f32(
        x.astype(jnp.float32),
        ln_scale_ref[0].astype(jnp.float32),
        ln_bias_ref[0].astype(jnp.float32),
        ln_eps,
    ).astype(wqkv_ref.dtype)

    qkv = jax.lax.dot(
        xn, wqkv_ref[:], preferred_element_type=jnp.float32, precision=precision
    ).astype(wqkv_ref.dtype)  # (gs, 3*H*D)

    # static block-diagonal validity: same window AND key is a real token
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (gs, gs), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (gs, gs), 1)
    valid = jnp.logical_and(row_ids // sp == col_ids // sp, col_ids % sp < s)

    head_outs = []
    for h in range(heads):
        q = qkv[:, h * d : (h + 1) * d]
        k = qkv[:, hd + h * d : hd + (h + 1) * d]
        v = qkv[:, 2 * hd + h * d : 2 * hd + (h + 1) * d]
        sc = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )  # (gs, gs)
        sc *= scale
        if has_bias:
            # shared per-window bias tile repeated along the diagonal grid;
            # off-diagonal copies vanish under the mask below
            btile = bias_ref[h if bias_ref.shape[0] > 1 else 0].astype(jnp.float32)
            if interpret:  # pltpu.repeat is TPU-only; numerics-equal fallback
                tiled = jnp.tile(btile, (g, g))
            else:
                tiled = pltpu.repeat(pltpu.repeat(btile, g, 0), g, 1)
            sc += tiled
        sc = jnp.where(valid, sc, MASK_VALUE)
        m = jnp.max(sc, axis=-1, keepdims=True)
        p = jnp.exp(sc - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        p = p / l
        head_outs.append(
            jax.lax.dot(
                p.astype(v.dtype), v,
                preferred_element_type=jnp.float32, precision=precision,
            ).astype(wout_ref.dtype)
        )
    attn_out = jnp.concatenate(head_outs, axis=-1)  # (gs, H*D)

    out = jax.lax.dot(
        attn_out, wout_ref[:], preferred_element_type=jnp.float32, precision=precision
    )
    out += bout_ref[0].astype(jnp.float32)
    o_ref[...] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("heads", "scale", "ln_eps", "interpret")
)
def _window_attention_block_impl(
    xw, ln_scale, ln_bias, wqkv, wout, bout, bias, heads, scale, ln_eps, interpret
):
    nw, s, c = xw.shape
    three_hd = wqkv.shape[1]
    hd = three_hd // 3
    d = hd // heads

    # pad windows to a Mosaic-aligned row count and pack G of them per
    # program. Group size trades MXU shape (bigger gs = fuller tiles for
    # the qkv/out GEMMs) against VPU softmax waste (the масked (gs, gs)
    # scores cost gs/s times the exps of a per-window softmax); measured
    # optimum on v5e at s=49..64 is gs ~ 256.
    import os

    sp = round_up(s, 16)
    target_gs = int(os.environ.get("VIT_TPU_WINDOW_GS", "256"))
    g = max(1, target_gs // sp)
    nw_pad = round_up(nw, g)
    xp = xw
    if sp != s or nw_pad != nw:
        xp = jnp.pad(xw, ((0, nw_pad - nw), (0, sp - s), (0, 0)))
    x2d = xp.reshape(nw_pad * sp, c)

    grid = (nw_pad // g,)
    gs = g * sp
    in_specs = [
        pl.BlockSpec((gs, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((c, three_hd), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((hd, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    has_bias = bias is not None
    if has_bias:
        bias = bias.reshape(-1, s, s).astype(jnp.float32)  # (1|H, S, S)
        if sp != s:
            # MASK_VALUE fill so padded keys stay masked even if the
            # in-kernel validity mask is ever refactored away
            bias = jnp.pad(
                bias, ((0, 0), (0, sp - s), (0, sp - s)),
                constant_values=MASK_VALUE,
            )
        in_specs.append(
            pl.BlockSpec(
                (bias.shape[0], sp, sp), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
            )
        )
        args = (x2d, ln_scale.reshape(1, c), ln_bias.reshape(1, c), wqkv, wout,
                bout.reshape(1, c), bias)
    else:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        args = (x2d, ln_scale.reshape(1, c), ln_bias.reshape(1, c), wqkv, wout,
                bout.reshape(1, c), jnp.zeros((1, 1), jnp.float32))

    flops = (
        2 * nw_pad * sp * c * three_hd        # qkv
        + 4 * nw_pad * heads * gs * sp * d    # block-diag attention (incl waste)
        + 2 * nw_pad * sp * hd * c            # out proj
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel, heads=heads, d=d, scale=float(scale), ln_eps=ln_eps,
            g=g, sp=sp, s=s, has_bias=has_bias, interpret=interpret,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((gs, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nw_pad * sp, c), xw.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * x2d.size * x2d.dtype.itemsize
            + (wqkv.size + wout.size) * wqkv.dtype.itemsize,
            transcendentals=nw_pad * heads * sp * gs,
        ),
        interpret=interpret,
    )(*args)

    out = out.reshape(nw_pad, sp, c)
    return out[:nw, :s]


def xla_window_attention_block(
    xw, ln_scale, ln_bias, wqkv, wout, bout, heads, bias=None, *, scale=None,
    ln_eps=1e-5,
):
    """Plain-XLA equivalent: reference, CPU fallback, and the recompute for
    the custom backward."""
    nw, s, c = xw.shape
    hd = wqkv.shape[1] // 3
    d = hd // heads
    if scale is None:
        scale = d**-0.5
    xn = _ln_f32(
        xw.astype(jnp.float32), ln_scale.astype(jnp.float32),
        ln_bias.astype(jnp.float32), ln_eps,
    ).astype(wqkv.dtype)
    qkv = jnp.einsum("wsc,cf->wsf", xn, wqkv, preferred_element_type=jnp.float32)
    qkv = qkv.astype(wqkv.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    split = lambda t: t.reshape(nw, s, heads, d).transpose(0, 2, 1, 3)
    q, k, v = split(q), split(k), split(v)
    sc = jnp.einsum("whid,whjd->whij", q, k, preferred_element_type=jnp.float32)
    sc = sc.astype(jnp.float32) * scale
    if bias is not None:
        sc = sc + bias.reshape(1, -1, s, s).astype(jnp.float32)
    p = jax.nn.softmax(sc, axis=-1)
    o = jnp.einsum("whij,whjd->whid", p.astype(v.dtype), v)
    o = o.transpose(0, 2, 1, 3).reshape(nw, s, hd).astype(wout.dtype)
    out = jnp.einsum("wsf,fc->wsc", o, wout, preferred_element_type=jnp.float32)
    out = out + bout.astype(jnp.float32)
    return out.astype(xw.dtype)


@functools.lru_cache(maxsize=None)
def _partitioned_window(heads, scale, ln_eps, interpret, bias_rank):
    """Mesh-partitionable forward (ops/partitioning.py): the window axis
    (batch x windows, the grid axis) is sharded in place — a batch-sharded
    fmap stays sharded through partition/kernel/unpartition under dp. The
    per-window bias table and the whole-dim weights are need-replication."""
    from vit_tpu.ops.partitioning import partitioned, unique_roles

    w_roles = (
        ("b", "s", "c"), ("c",), ("c",), ("c", "f"), ("g", "c"), ("c",),
    )
    if bias_rank is None:

        def fn(xw, ln_scale, ln_bias, wqkv, wout, bout):
            return _window_attention_block_impl(
                xw, ln_scale, ln_bias, wqkv, wout, bout, None,
                heads, scale, ln_eps, interpret,
            )

        return partitioned(fn, w_roles, ("b", "s", "c"))

    def fn(xw, ln_scale, ln_bias, wqkv, wout, bout, bias):
        return _window_attention_block_impl(
            xw, ln_scale, ln_bias, wqkv, wout, bout, bias,
            heads, scale, ln_eps, interpret,
        )

    return partitioned(
        fn, w_roles + (unique_roles(bias_rank, "u"),), ("b", "s", "c")
    )


def _wab_call(xw, ln_scale, ln_bias, wqkv, wout, bout, bias, heads, scale,
              ln_eps, interpret):
    p = _partitioned_window(
        heads, scale, ln_eps, interpret, None if bias is None else bias.ndim
    )
    args = (xw, ln_scale, ln_bias, wqkv, wout, bout)
    return p(*args) if bias is None else p(*args, bias)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def _window_attention_block_ad(
    xw, ln_scale, ln_bias, wqkv, wout, bout, bias, heads, scale, ln_eps, interpret
):
    return _wab_call(
        xw, ln_scale, ln_bias, wqkv, wout, bout, bias, heads, scale, ln_eps,
        interpret,
    )


def _wab_fwd(xw, ln_scale, ln_bias, wqkv, wout, bout, bias, heads, scale, ln_eps, interpret):
    out = _wab_call(
        xw, ln_scale, ln_bias, wqkv, wout, bout, bias, heads, scale, ln_eps,
        interpret,
    )
    return out, (xw, ln_scale, ln_bias, wqkv, wout, bout, bias)


def _wab_bwd(heads, scale, ln_eps, interpret, res, g):
    xw = res[0]

    def f(xw, ln_scale, ln_bias, wqkv, wout, bout, bias):
        return xla_window_attention_block(
            xw, ln_scale, ln_bias, wqkv, wout, bout, heads, bias,
            scale=scale, ln_eps=ln_eps,
        )

    _, vjp = jax.vjp(f, *res)
    return vjp(g.astype(xw.dtype))


_window_attention_block_ad.defvjp(_wab_fwd, _wab_bwd)


def fused_window_attention_block(
    xw: jax.Array,
    ln_scale: jax.Array,
    ln_bias: jax.Array,
    wqkv: jax.Array,
    wout: jax.Array,
    bout: jax.Array,
    heads: int,
    bias: Optional[jax.Array] = None,
    *,
    scale: Optional[float] = None,
    ln_eps: float = 1e-5,
    interpret: bool = False,
) -> jax.Array:
    """``out_proj(window_attention(qkv_proj(LN(xw))))`` in one kernel.

    Args:
      xw: ``[NW, S, C]`` windowed tokens (NW = batch * windows).
      bias: optional shared per-window additive bias ``[1|H, S, S]``
        (or any shape reshapeable to it, e.g. ``[1, H, S, S]``).
      heads: attention heads; head dim is ``wqkv.shape[1] // 3 // heads``.

    Returns ``[NW, S, C]`` — residual NOT included (caller adds).
    Differentiable (Pallas forward, XLA-recompute backward).
    """
    hd = wqkv.shape[1] // 3
    if scale is None:
        scale = (hd // heads) ** -0.5
    return _window_attention_block_ad(
        xw, ln_scale, ln_bias, wqkv, wout, bout, bias,
        heads, float(scale), float(ln_eps), bool(interpret),
    )
