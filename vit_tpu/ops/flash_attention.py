"""Pallas TPU fused softmax-attention kernel.

This single kernel covers the reference zoo's entire attention surface
(SURVEY.md §2.2 row 5, §2.4 item 1-2):

- global fused-QKV MHSA            (reference vit.py:55 and ten clones)
- cross / context attention        (cait.py:90-99, cross_vit.py:55-56)
- additive attention bias          (levit.py:107-138, region_vit_flax.py:94,
                                    crossformer.py:154-158 — rel-pos tables)
- diagonal self-masking (LSA)      (vit_small_datasets.py:97-99)
- window / dilated-window attention: window partitions fold windows into the
  batch*heads grid axis outside the kernel (crossformer.py:139-141 etc.), so
  the same kernel serves SDA/LDA/Twins-local/NesT/IWSA/RegionViT.

Design: ViT-family sequence lengths are small (65-3,200 tokens), so K and V
for one (batch, head) live entirely in VMEM; the grid is (batch*heads,
q_blocks) and each program computes one Q tile against all of K/V with a
single fused fp32 softmax. The n² score matrix only ever exists one
(block_q, Nk) tile at a time in VMEM — the reference materializes the full
matrix in HBM at every layer (vit.py:73-75). For longer sequences
``flash_attention_kv_blocked`` (below) streams K/V one block at a time with
the online-softmax running state — the auto dispatcher routes shapes whose
K/V bust the VMEM budget onto it, and its kv loop is the ring dimension a
multi-chip ring-attention would rotate over ICI (SURVEY.md §2.3).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vit_tpu.core.utils import cdiv, round_up

# -0.7 * float32 max: large negative that survives exp() without NaN.
MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)

_LANES = 128


def _attn_kernel(
    q_ref,
    k_ref,
    v_ref,
    bias_ref,
    o_ref,
    *,
    scale: float,
    true_nq: int,
    true_nk: int,
    block_q: int,
    mask_self: bool,
    has_bias: bool,
):
    """One Q tile vs. the full K/V for one (batch*head) slice."""
    qi = pl.program_id(1)

    # For bf16 inputs the MXU computes natively; for fp32 inputs request
    # full fp32 (the TPU default would decompose to one bf16 pass).
    precision = (
        jax.lax.Precision.HIGHEST
        if q_ref.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )

    q = q_ref[0]  # [block_q, d]
    k = k_ref[0]  # [nk_pad, d]

    # Q @ K^T on the MXU, fp32 accumulation.
    s = jax.lax.dot_general(
        q,
        k,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )  # [block_q, nk_pad]
    s *= scale

    if has_bias:
        s += bias_ref[0].astype(jnp.float32)

    nk_pad = k.shape[0]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (block_q, nk_pad), 1)
    mask = col_ids < true_nk
    if mask_self:
        # LSA diagonal self-mask (vit_small_datasets.py:97-99): token i must
        # not attend to itself. Global row index = qi * block_q + local row.
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (block_q, nk_pad), 0)
        row_ids = row_ids + qi * block_q
        mask = jnp.logical_and(mask, col_ids != row_ids)
    s = jnp.where(mask, s, MASK_VALUE)

    # Numerically-stable fused softmax in fp32 (never leaves VMEM).
    # Division (not reciprocal-multiply) matches jax.nn.softmax's op
    # sequence so rounding decisions stay aligned with the XLA reference.
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    p = p / l

    v = v_ref[0]
    o = jax.lax.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32, precision=precision
    )  # [block_q, d]
    o_ref[0] = o.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "mask_self", "block_q", "interpret"),
)
def _flash_attention_impl(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array] = None,
    *,
    scale: Optional[float] = None,
    mask_self: bool = False,
    block_q: int = 256,
    interpret: bool = False,
) -> jax.Array:
    b, h, nq, d = q.shape
    nk = k.shape[2]
    dv = v.shape[-1]  # value head dim may differ (levit.py:56, scalable_vit.py:104)
    if scale is None:
        scale = d**-0.5

    block_q = min(block_q, round_up(nq, _LANES))
    nq_pad = round_up(nq, block_q)
    nk_pad = round_up(nk, _LANES)

    qf = q.reshape(b * h, nq, d)
    kf = k.reshape(b * h, nk, d)
    vf = v.reshape(b * h, nk, dv)
    if nq_pad != nq:
        qf = jnp.pad(qf, ((0, 0), (0, nq_pad - nq), (0, 0)))
    if nk_pad != nk:
        kf = jnp.pad(kf, ((0, 0), (0, nk_pad - nk), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, nk_pad - nk), (0, 0)))

    grid = (b * h, cdiv(nq_pad, block_q))

    in_specs = [
        pl.BlockSpec((1, block_q, d), lambda bh, qi: (bh, qi, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nk_pad, d), lambda bh, qi: (bh, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nk_pad, dv), lambda bh, qi: (bh, 0, 0), memory_space=pltpu.VMEM),
    ]

    has_bias = bias is not None
    if has_bias:
        # Canonicalize to [G, Nq_pad, Nk_pad] with G in {1, H, B*H}; the
        # index map folds broadcasting over batch and/or heads.
        bb, bh_, bnq, bnk = bias.shape
        assert bnq == nq and bnk == nk, "bias must match (Nq, Nk)"
        g = bb * bh_
        biasf = bias.reshape(g, nq, nk).astype(jnp.float32)
        biasf = jnp.pad(biasf, ((0, 0), (0, nq_pad - nq), (0, nk_pad - nk)))
        if g == 1:
            bias_index = lambda bh, qi: (0, qi, 0)
        elif bb == 1:  # per-head bias shared over batch
            bias_index = lambda bh, qi: (bh % h, qi, 0)
        elif bh_ == 1:  # per-batch bias shared over heads
            bias_index = lambda bh, qi: (bh // h, qi, 0)
        else:
            bias_index = lambda bh, qi: (bh, qi, 0)
        in_specs.append(
            pl.BlockSpec((1, block_q, nk_pad), bias_index, memory_space=pltpu.VMEM)
        )
        args = (qf, kf, vf, biasf)
    else:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        args = (qf, kf, vf, jnp.zeros((1, 1), dtype=jnp.float32))

    kernel = functools.partial(
        _attn_kernel,
        scale=float(scale),
        true_nq=nq,
        true_nk=nk,
        block_q=block_q,
        mask_self=mask_self,
        has_bias=has_bias,
    )

    flops = 4 * b * h * nq * nk * d
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, block_q, dv), lambda bh, qi: (bh, qi, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, nq_pad, dv), v.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(qf.size + kf.size + vf.size) * qf.dtype.itemsize,
            transcendentals=b * h * nq * nk,
        ),
        interpret=interpret,
    )(*args)

    return out[:, :nq, :].reshape(b, h, nq, dv)


def _kv_blocked_kernel(
    q_ref,      # (1, block_q, d)
    k_ref,      # (1, block_k, d)
    v_ref,      # (1, block_k, dv)
    bias_ref,
    o_ref,      # (1, block_q, dv)
    m_scratch,  # (block_q, _LANES) f32
    l_scratch,  # (block_q, _LANES) f32
    acc_scratch,  # (block_q, dv) f32
    *,
    scale: float,
    true_nk: int,
    block_q: int,
    block_k: int,
    n_kv: int,
    mask_self: bool,
    has_bias: bool,
):
    """Online-softmax flash: one (b*h, q_block) pair accumulates over the
    sequential kv-block grid axis — K/V never need to fit VMEM at once.

    This is the long-context form of the resident-KV kernel above
    (SURVEY.md §2.3's documented extension point): the kv loop is the ring
    dimension a multi-chip ring-attention would rotate over ICI.
    """
    qi, ki = pl.program_id(1), pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    precision = (
        jax.lax.Precision.HIGHEST
        if q_ref.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    q = q_ref[0]
    k = k_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )  # (block_q, block_k)
    s *= scale
    if has_bias:
        s += bias_ref[0].astype(jnp.float32)

    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * block_k
    mask = col < true_nk
    if mask_self:
        row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + qi * block_q
        mask = jnp.logical_and(mask, col != row)
    s = jnp.where(mask, s, MASK_VALUE)

    m_prev = m_scratch[:, :1]  # (block_q, 1)
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)  # rescale of the running state
    p = jnp.exp(s - m_new)
    l_new = alpha * l_scratch[:, :1] + jnp.sum(p, axis=-1, keepdims=True)

    v = v_ref[0]
    pv = jax.lax.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32, precision=precision
    )
    acc_scratch[...] = acc_scratch[...] * alpha + pv
    m_scratch[...] = jnp.broadcast_to(m_new, m_scratch.shape)
    l_scratch[...] = jnp.broadcast_to(l_new, l_scratch.shape)

    @pl.when(ki == n_kv - 1)
    def _epilogue():
        # l is positive: every q row sees at least one unmasked key column
        # (true_nk >= 1; with mask_self there is always an off-diagonal
        # column at the zoo's nk >= 2).
        o_ref[0] = (acc_scratch[...] / l_scratch[:, :1]).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "mask_self", "block_q", "block_k", "interpret"),
)
def _flash_attention_kv_blocked_impl(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array] = None,
    *,
    scale: Optional[float] = None,
    mask_self: bool = False,
    block_q: int = 256,
    block_k: int = 512,
    interpret: bool = False,
) -> jax.Array:
    b, h, nq, d = q.shape
    nk = k.shape[2]
    dv = v.shape[-1]
    if scale is None:
        scale = d**-0.5

    block_q = min(block_q, round_up(nq, _LANES))
    block_k = min(block_k, round_up(nk, _LANES))
    nq_pad = round_up(nq, block_q)
    nk_pad = round_up(nk, block_k)

    qf = q.reshape(b * h, nq, d)
    kf = k.reshape(b * h, nk, d)
    vf = v.reshape(b * h, nk, dv)
    if nq_pad != nq:
        qf = jnp.pad(qf, ((0, 0), (0, nq_pad - nq), (0, 0)))
    if nk_pad != nk:
        kf = jnp.pad(kf, ((0, 0), (0, nk_pad - nk), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, nk_pad - nk), (0, 0)))

    n_kv = cdiv(nk_pad, block_k)
    grid = (b * h, cdiv(nq_pad, block_q), n_kv)

    in_specs = [
        pl.BlockSpec((1, block_q, d), lambda bh, qi, ki: (bh, qi, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_k, d), lambda bh, qi, ki: (bh, ki, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_k, dv), lambda bh, qi, ki: (bh, ki, 0), memory_space=pltpu.VMEM),
    ]
    has_bias = bias is not None
    if has_bias:
        bb, bh_, bnq, bnk = bias.shape
        assert bnq == nq and bnk == nk, "bias must match (Nq, Nk)"
        g = bb * bh_
        biasf = bias.reshape(g, nq, nk).astype(jnp.float32)
        biasf = jnp.pad(biasf, ((0, 0), (0, nq_pad - nq), (0, nk_pad - nk)))
        if g == 1:
            bias_index = lambda bh, qi, ki: (0, qi, ki)
        elif bb == 1:
            bias_index = lambda bh, qi, ki: (bh % h, qi, ki)
        elif bh_ == 1:
            bias_index = lambda bh, qi, ki: (bh // h, qi, ki)
        else:
            bias_index = lambda bh, qi, ki: (bh, qi, ki)
        in_specs.append(
            pl.BlockSpec((1, block_q, block_k), bias_index, memory_space=pltpu.VMEM)
        )
        args = (qf, kf, vf, biasf)
    else:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        args = (qf, kf, vf, jnp.zeros((1, 1), dtype=jnp.float32))

    kernel = functools.partial(
        _kv_blocked_kernel,
        scale=float(scale),
        true_nk=nk,
        block_q=block_q,
        block_k=block_k,
        n_kv=n_kv,
        mask_self=mask_self,
        has_bias=has_bias,
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, block_q, dv), lambda bh, qi, ki: (bh, qi, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, nq_pad, dv), v.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, _LANES), jnp.float32),
            pltpu.VMEM((block_q, _LANES), jnp.float32),
            pltpu.VMEM((block_q, dv), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * nq * nk * d,
            bytes_accessed=(qf.size + kf.size + vf.size) * qf.dtype.itemsize,
            transcendentals=b * h * nq * nk,
        ),
        interpret=interpret,
    )(*args)
    return out[:, :nq, :].reshape(b, h, nq, dv)


def _bias_pattern(q, bias):
    """(batch-is-full, heads-is-full) broadcast pattern, or None."""
    if bias is None:
        return None
    return (bias.shape[0] == q.shape[0], bias.shape[1] == q.shape[1])


@functools.lru_cache(maxsize=None)
def _partitioned_flash(kind, scale, mask_self, block_q, interpret, bias_pattern):
    """Mesh-partitionable forward (ops/partitioning.py). The [B, H, N, D]
    layout is embarrassingly parallel over batch AND heads, so both data
    parallelism and head-parallel TP shard this kernel with zero
    communication; sequence/head-dim factors are need-replication."""
    from vit_tpu.ops.partitioning import partitioned

    impl = (
        _flash_attention_impl
        if kind == "resident"
        else _flash_attention_kv_blocked_impl
    )
    q_roles = ("b", "h", "n", "d")
    k_roles = ("b", "h", "m", "d")
    v_roles = ("b", "h", "m", "e")
    out_roles = ("b", "h", "n", "e")
    if bias_pattern is None:

        def fn(q, k, v):
            return impl(
                q, k, v, None,
                scale=scale, mask_self=mask_self, block_q=block_q,
                interpret=interpret,
            )

        return partitioned(fn, (q_roles, k_roles, v_roles), out_roles)

    bias_b, bias_h = bias_pattern
    bias_roles = (
        "b" if bias_b else "u0",
        "h" if bias_h else "u1",
        "n",
        "m",
    )

    def fn(q, k, v, bias):
        return impl(
            q, k, v, bias,
            scale=scale, mask_self=mask_self, block_q=block_q,
            interpret=interpret,
        )

    return partitioned(fn, (q_roles, k_roles, v_roles, bias_roles), out_roles)


def _flash_call(kind, q, k, v, bias, scale, mask_self, block_q, interpret):
    p = _partitioned_flash(
        kind, scale, mask_self, block_q, interpret, _bias_pattern(q, bias)
    )
    return p(q, k, v) if bias is None else p(q, k, v, bias)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _flash_kv_blocked_ad(q, k, v, bias, scale, mask_self, block_q, interpret):
    return _flash_call(
        "kv_blocked", q, k, v, bias, scale, mask_self, block_q, interpret
    )


def _flash_kv_blocked_fwd(q, k, v, bias, scale, mask_self, block_q, interpret):
    out = _flash_call(
        "kv_blocked", q, k, v, bias, scale, mask_self, block_q, interpret
    )
    return out, (q, k, v, bias, out)


# the Q-chunked recompute backward is shape-agnostic — shared with the
# resident-KV kernel (defined below)
def _flash_kv_blocked_bwd(scale, mask_self, block_q, interpret, res, g):
    return _flash_bwd(scale, mask_self, block_q, interpret, res, g)


def flash_attention_kv_blocked(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array] = None,
    *,
    scale: Optional[float] = None,
    mask_self: bool = False,
    block_q: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Online-softmax flash attention with blocked K/V.

    Unlike :func:`flash_attention` (which keeps one (b, h)'s full K/V
    resident in VMEM — the right call at the zoo's <=3.2k tokens), this
    streams K/V one block at a time with the classic running (m, l, acc)
    rescaling, so sequence length is bounded by HBM only. Same hooks
    (bias, diagonal mask, cross dims), same Q-chunked recompute backward.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    return _flash_kv_blocked_ad(
        q, k, v, bias, float(scale), bool(mask_self), int(block_q), bool(interpret)
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _flash_attention_ad(q, k, v, bias, scale, mask_self, block_q, interpret):
    return _flash_call(
        "resident", q, k, v, bias, scale, mask_self, block_q, interpret
    )


def _flash_fwd(q, k, v, bias, scale, mask_self, block_q, interpret):
    out = _flash_call(
        "resident", q, k, v, bias, scale, mask_self, block_q, interpret
    )
    # out is saved for the chunked backward's delta = rowsum(dO ∘ O) —
    # it replaces the per-row softmax statistics flash backwards need.
    return out, (q, k, v, bias, out)


def _flash_bwd(scale, mask_self, block_q, interpret, res, g):
    """Q-chunked recompute backward.

    A plain ``jax.vjp(reference_attention)`` recompute materializes the
    full ``B*H*Nq*Nk`` fp32 score tensor — at exactly the both-sides-long
    shapes the auto-dispatcher reserves for flash (T2T's 3136² stage is
    ~5 GB at batch 128), which negates the kernel's memory advantage in
    training. This backward recomputes scores one Q chunk at a time
    (``lax.scan``): peak extra memory is ``B*H*chunk*Nk`` fp32.

    Math (per b,h):  P = softmax(scale·QKᵀ + bias);  O = P V
      dV = Pᵀ dO
      dP = dO Vᵀ;   dS = P ∘ (dP − rowsum(dO ∘ O))
      dQ = scale · dS K;   dK = scale · dSᵀ Q;   dbias = Σ_broadcast dS
    """
    q, k, v, bias, out = res
    b, h, nq, d = q.shape
    nk = k.shape[2]
    dv = v.shape[-1]

    chunk = min(block_q, nq)
    n_chunks = -(-nq // chunk)
    nq_pad = n_chunks * chunk
    pad = nq_pad - nq

    f32 = jnp.float32
    qf = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0))) if pad else q
    gf = jnp.pad(g, ((0, 0), (0, 0), (0, pad), (0, 0))) if pad else g
    of = jnp.pad(out, ((0, 0), (0, 0), (0, pad), (0, 0))) if pad else out
    # (n_chunks, b, h, chunk, ·)
    q_c = qf.reshape(b, h, n_chunks, chunk, d).transpose(2, 0, 1, 3, 4)
    g_c = gf.astype(f32).reshape(b, h, n_chunks, chunk, dv).transpose(2, 0, 1, 3, 4)
    o_c = of.astype(f32).reshape(b, h, n_chunks, chunk, dv).transpose(2, 0, 1, 3, 4)

    has_bias = bias is not None
    if has_bias and pad:
        # pad the query axis so the per-chunk dynamic_slice never clamps
        # at the boundary (a clamped start silently re-reads earlier rows)
        bias = jnp.pad(bias, ((0, 0), (0, 0), (0, pad), (0, 0)))

    def one_chunk(carry, xs):
        dk_acc, dv_acc = carry[:2]
        ci, qc, gc, oc = xs
        s = jnp.einsum("bhid,bhjd->bhij", qc, k, preferred_element_type=f32)
        s = s * scale
        if has_bias:
            bchunk = jax.lax.dynamic_slice_in_dim(
                bias.astype(f32), ci * chunk, chunk, axis=2
            )
            s = s + bchunk
        if mask_self:
            row = jax.lax.broadcasted_iota(jnp.int32, (chunk, nk), 0) + ci * chunk
            col = jax.lax.broadcasted_iota(jnp.int32, (chunk, nk), 1)
            s = jnp.where(row == col, MASK_VALUE, s)
        p = jax.nn.softmax(s, axis=-1)
        dv_acc = dv_acc + jnp.einsum("bhij,bhie->bhje", p, gc, preferred_element_type=f32)
        dp = jnp.einsum("bhie,bhje->bhij", gc, v.astype(f32), preferred_element_type=f32)
        delta = jnp.sum(gc * oc, axis=-1, keepdims=True)  # rowsum(dO∘O)
        ds = p * (dp - delta)
        dq_chunk = scale * jnp.einsum("bhij,bhjd->bhid", ds, k.astype(f32), preferred_element_type=f32)
        dk_acc = dk_acc + scale * jnp.einsum(
            "bhij,bhid->bhjd", ds, qc.astype(f32), preferred_element_type=f32
        )
        if has_bias:
            # reduce over the bias's broadcast dims (B|1, H|1)
            db_chunk = ds
            if bias.shape[0] == 1:
                db_chunk = jnp.sum(db_chunk, axis=0, keepdims=True)
            if bias.shape[1] == 1:
                db_chunk = jnp.sum(db_chunk, axis=1, keepdims=True)
            return (dk_acc, dv_acc), (dq_chunk, db_chunk)
        return (dk_acc, dv_acc), (dq_chunk, jnp.zeros((), f32))

    carry0 = (
        jnp.zeros((b, h, nk, d), f32),
        jnp.zeros((b, h, nk, dv), f32),
    )
    (dk, dvv), (dq_chunks, db_chunks) = jax.lax.scan(
        one_chunk, carry0, (jnp.arange(n_chunks), q_c, g_c, o_c)
    )
    dq = dq_chunks.transpose(1, 2, 0, 3, 4).reshape(b, h, nq_pad, d)[:, :, :nq]
    if has_bias:
        bb, bh = bias.shape[0], bias.shape[1]
        db = db_chunks.transpose(1, 2, 0, 3, 4).reshape(bb, bh, nq_pad, nk)[:, :, :nq]
        db = db.astype(bias.dtype)
    else:
        db = None
    return dq.astype(q.dtype), dk.astype(k.dtype), dvv.astype(v.dtype), db


_flash_attention_ad.defvjp(_flash_fwd, _flash_bwd)
_flash_kv_blocked_ad.defvjp(_flash_kv_blocked_fwd, _flash_kv_blocked_bwd)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array] = None,
    *,
    scale: Optional[float] = None,
    mask_self: bool = False,
    block_q: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Fused multi-head attention.

    Differentiable: Pallas forward, XLA-recompute backward (custom VJP —
    same scheme as ``fused_qkv_attention``/``fused_mlp``), so
    ``jax.grad`` through ``ops.attention``'s Pallas path works for every
    window/pyramid family and cross-attention.

    Args:
      q: ``[B, H, Nq, D]`` queries.
      k: ``[B, H, Nk, D]`` keys.
      v: ``[B, H, Nk, D]`` values.
      bias: optional additive logits bias, broadcastable ``[B|1, H|1, Nq, Nk]``.
      scale: logit scale; defaults to ``D ** -0.5``.
      mask_self: mask the q==k diagonal (LSA).
      block_q: Q tile size (rounded to the padded Nq).
      interpret: run the kernel in Pallas interpreter mode (CPU testing).

    Returns:
      ``[B, H, Nq, D]`` attention output in the dtype of ``v``.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    return _flash_attention_ad(
        q, k, v, bias, float(scale), bool(mask_self), int(block_q), bool(interpret)
    )


def reference_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array] = None,
    *,
    scale: Optional[float] = None,
    mask_self: bool = False,
) -> jax.Array:
    """Plain-XLA attention: numerical reference and CPU/GPU fallback."""
    d = q.shape[-1]
    if scale is None:
        scale = d**-0.5
    s = jnp.einsum("bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32)
    s = s * scale
    if bias is not None:
        s = s + bias.astype(s.dtype)
    if mask_self:
        nq, nk = s.shape[-2:]
        eye = jnp.eye(nq, nk, dtype=bool)
        s = jnp.where(eye, MASK_VALUE, s)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhij,bhjd->bhid", p.astype(v.dtype), v)
