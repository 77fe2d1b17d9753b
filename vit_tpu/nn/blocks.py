"""Feed-forward and encoder-stack modules shared by every model family.

The reference copy-pastes ``FeedForward`` into ten files (vit.py:41 clones,
SURVEY.md §2.2 row 3) and a per-file ``Transformer`` loop (vit.py:89-112).
Here: one FeedForward that lowers to the Pallas fused-MLP kernel, one
standard pre-norm residual encoder, and in-graph stochastic depth replacing
the reference's host-side structural layer-dropout (cait.py:16-30, bug
register #5).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from vit_tpu import ops
from vit_tpu.nn.attention import Attention


class FeedForward(nn.Module):
    """Pre-norm MLP block: ``LN -> Dense -> GELU -> Dense`` (+dropout).

    Inference path lowers the whole block (including the LayerNorm prologue)
    to the Pallas ``fused_mlp`` kernel; the residual add stays with the
    caller so parity with the reference block structure is 1:1.
    """

    dim: int
    hidden_dim: int
    dropout: float = 0.0
    pre_norm: bool = True
    norm_bias: bool = True
    dense_bias: bool = True
    activation: str = "gelu"
    ln_eps: float = 1e-6
    dim_out: Optional[int] = None  # output width; None = dim
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        dim_out = self.dim_out or self.dim
        w1 = self.param(
            "w1", nn.initializers.lecun_normal(), (self.dim, self.hidden_dim), jnp.float32
        )
        b1 = (
            self.param("b1", nn.initializers.zeros, (self.hidden_dim,), jnp.float32)
            if self.dense_bias
            else None
        )
        w2 = self.param(
            "w2", nn.initializers.lecun_normal(), (self.hidden_dim, dim_out), jnp.float32
        )
        b2 = (
            self.param("b2", nn.initializers.zeros, (dim_out,), jnp.float32)
            if self.dense_bias
            else None
        )
        if self.pre_norm:
            ln_scale = self.param("ln_scale", nn.initializers.ones, (self.dim,), jnp.float32)
            ln_bias = (
                self.param("ln_bias", nn.initializers.zeros, (self.dim,), jnp.float32)
                if self.norm_bias
                else None
            )
        else:
            ln_scale = ln_bias = None

        dtype = self.dtype or x.dtype
        cast = lambda p: None if p is None else p.astype(dtype)

        # Only the GEMM operands (weights) are cast to the MXU dtype; biases
        # and norm parameters stay fp32 — the reference adds them on the
        # fp32 accumulator, and pre-casting them to bf16 was a systematic
        # per-layer offset (round-2 numerics study).
        if self.dropout > 0.0 and not deterministic:
            # Training path: dropout between the activations (XLA).
            h = x
            if self.pre_norm:
                h = _layer_norm(h, ln_scale, ln_bias, self.ln_eps)
            h = jnp.matmul(h.astype(dtype), cast(w1), preferred_element_type=jnp.float32)
            if b1 is not None:
                h = h + b1
            h = _activate(h, self.activation)
            h = nn.Dropout(self.dropout, name="drop1")(h, deterministic=False)
            h = jnp.matmul(h.astype(dtype), cast(w2), preferred_element_type=jnp.float32)
            if b2 is not None:
                h = h + b2
            h = nn.Dropout(self.dropout, name="drop2")(h, deterministic=False)
            return h.astype(x.dtype)

        out = ops.mlp(
            x,
            cast(w1),
            b1,
            cast(w2),
            b2,
            ln_scale,
            ln_bias,
            activation=self.activation,
            residual=False,
            ln_eps=self.ln_eps,
        )
        return out


def _activate(h, activation):
    if activation == "gelu":
        return nn.gelu(h)
    if activation == "gelu_exact":  # erf-based, HF/timm ViTs (interop)
        return nn.gelu(h, approximate=False)
    if activation == "hard_swish":
        return h * nn.relu6(h + 3.0) / 6.0
    raise ValueError(activation)


def _layer_norm(x, scale, bias, eps=1e-6):
    # flax.linen.LayerNorm's exact op sequence (fast variance, fp32 stats,
    # scale folded into the rsqrt multiplier).
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.maximum(
        0.0, jnp.mean(jnp.square(x), axis=-1, keepdims=True) - jnp.square(mean)
    )
    mul = jax.lax.rsqrt(var + eps) * scale
    y = (x - mean) * mul
    if bias is not None:
        y = y + bias
    return y


_remat_enabled: "contextvars.ContextVar[bool]" = None  # set below


def remat_scope():
    """Enable per-block rematerialization for model applies traced inside
    this context (``jax.checkpoint`` on each scanned encoder block): the
    backward pass recomputes block activations instead of keeping them
    alive, trading ~1/3 more FLOPs for O(depth) less live memory. The
    GSPMD train step uses this — without it a ViT-B/64-batch backward
    keeps every layer's attention intermediates in HBM (measured OOM,
    16.68G/15.75G; see PERFORMANCE.md)."""
    return _remat_ctx()


import contextlib
import contextvars

_remat_enabled = contextvars.ContextVar("vit_tpu_remat", default=False)


@contextlib.contextmanager
def _remat_ctx():
    token = _remat_enabled.set(True)
    try:
        yield
    finally:
        _remat_enabled.reset(token)


def scan_unroll_for(depth: int) -> int:
    """Unroll policy for scanned encoder stacks: keep the scan LOOP
    (unroll=1) from depth 5 up, full unroll only for very short stacks.

    Measured on the real chip at the reference-README scale (depth 6,
    B=128, dim 1024, 65->80 padded tokens — the zoo's vit/simple_vit/
    deepvit configs), the loop beats straight-line HLO in BOTH dispatch
    modes: block-kernel 10982 vs 9610 img/s, XLA 9985 vs 9776
    (measurements/r4/tune_zoo_tail_r4b.log). One compiled block re-entered
    per layer keeps its VMEM working set and pipeline state hot, where the
    unrolled program re-stages each layer's weights cold; the same held at
    ViT-L/24 across unroll 1/4/8/24 (measurements/r4/tune_unroll_r4.log).
    Depth <= 4 (PiT/CrossViT stages, hierarchical stage stubs) stays
    unrolled: loop-carry setup isn't amortized over 2-4 iterations and
    those configs measured healthy as straight-line. ``VIT_TPU_SCAN_UNROLL``
    overrides."""
    import os

    env = os.environ.get("VIT_TPU_SCAN_UNROLL")
    if env is not None:
        return max(1, min(int(env), depth))
    return depth if depth <= 4 else 1


class EncoderBlock(nn.Module):
    """One pre-norm residual block: attention + feed-forward. The scan cell
    the encoder stacks (one compiled block regardless of depth) — returns
    the ``(carry, ())`` pair nn.scan expects."""

    dim: int
    heads: int
    dim_head: int
    mlp_dim: int
    dropout: float = 0.0
    reattention: bool = False
    mask_self: bool = False
    learned_temperature: bool = False
    qkv_bias: bool = False
    activation: str = "gelu"
    true_tokens: Optional[int] = None  # padded-stream mode (see Attention)
    block_tokens: Optional[int] = None  # sample-packed stride (see Attention)
    norm_eps: float = 1e-6
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        x = Attention(
            dim=self.dim,
            heads=self.heads,
            dim_head=self.dim_head,
            dropout=self.dropout,
            reattention=self.reattention,
            mask_self=self.mask_self,
            learned_temperature=self.learned_temperature,
            qkv_bias=self.qkv_bias,
            true_tokens=self.true_tokens,
            block_tokens=self.block_tokens,
            fuse_residual=True,  # residual add fuses into the block kernel
            norm_eps=self.norm_eps,
            dtype=self.dtype,
            name="attn",
        )(x, deterministic=deterministic)
        x = x + FeedForward(
            self.dim, self.mlp_dim, self.dropout, ln_eps=self.norm_eps,
            activation=self.activation,
            dtype=self.dtype, name="ff"
        )(x, deterministic=deterministic)
        return x, ()


class Transformer(nn.Module):
    """Standard pre-norm residual encoder with the zoo's variant hooks.

    Covers the vanilla stack (vit.py:89-112), DeepViT (reattention),
    ParallelViT (``parallel_branches`` summed branches per depth,
    parallel_vit.py:99-107), in-graph stochastic ``layer_dropout``
    (replacing cait.py:16-30's host-side structural dropout), and LSA
    (``mask_self`` + learned temperature). CaiT's LayerScale-gated blocks
    live in models/cait.py (model-depth epsilon banding, paper §3).

    ``scan=True`` (default for homogeneous stacks without context/branch/
    layer-scale hooks) rolls the depth into ``nn.scan`` so XLA traces and
    compiles ONE block — compile time is O(1) in depth instead of O(depth),
    which matters at ViT-L/24 and ScalableViT's 20-deep stage.

    ``scan_unroll`` (default: the scan loop from depth 5 up, full unroll
    below — see ``scan_unroll_for`` for the on-chip measurements behind
    the flip) keeps the stacked parameter layout (checkpoint/importer-
    compatible) either way. ``VIT_TPU_SCAN_UNROLL`` overrides.
    """

    dim: int
    depth: int
    heads: int
    dim_head: int
    mlp_dim: int
    dropout: float = 0.0
    reattention: bool = False
    mask_self: bool = False
    learned_temperature: bool = False
    talking_heads: bool = False
    # HF/timm-style blocks (interop): bias on the qkv projections and the
    # erf GELU. qkv_bias routes attention off the fused raw-param kernel
    # onto the flax+flash path (the kernels' qkv GEMM has no bias input).
    qkv_bias: bool = False
    activation: str = "gelu"
    layer_dropout: float = 0.0
    parallel_branches: int = 1
    final_norm: bool = False
    scan: bool = True
    scan_unroll: Optional[int] = None  # None = scan_unroll_for's policy
    # (the scan loop from depth 5 up; full unroll below)
    # Real token count when the caller keeps the stream padded to the Mosaic
    # sublane tile across the whole stack — removes the fused kernel's
    # per-layer pad/slice of the full stream. Usually left None: with
    # ``auto_pad`` the stack pads/slices internally.
    true_tokens: Optional[int] = None
    # Pad the stream to the sublane tile once at stack entry and slice once
    # at exit (instead of a full-stream pad/slice round trip inside the
    # fused attention kernel every layer — 2x stream HBM traffic per layer,
    # 4x on an fp32 stream; the round-3 ViT-L flagship lever). Padded key
    # columns are masked out of every softmax identically in the Pallas
    # kernel and the XLA fallback, so real-row logits are unchanged.
    # Applies to plain self-attention stacks; variants whose kernels don't
    # mask padded columns (talking-heads, re-attention, LSA) are excluded.
    auto_pad: bool = True
    norm_eps: float = 1e-6
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        context: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        true_tokens = self.true_tokens
        block_tokens = None
        slice_back = None
        unpack = None
        if (
            self.auto_pad
            and true_tokens is None
            and context is None
            and not self.talking_heads
            and not self.reattention
            and not self.mask_self
            and not self.learned_temperature
            # the qkv-bias (flax) attention path doesn't mask padded keys
            and not self.qkv_bias
        ):
            b, n = x.shape[0], x.shape[1]
            sublanes = 16 if jnp.dtype(x.dtype).itemsize < 4 else 8
            n_pad = -(-n // sublanes) * sublanes
            # Pack-2 (round 4): two samples per batch row, each padded to a
            # HALF-sublane stride, when that beats padding each to a full
            # tile (attention is masked block-diagonally in both backends;
            # numerics exact vs the solo computation, err 0.0e0 on-chip —
            # measurements/r4/pack2_tpu.log). Gated to widths whose PACKED
            # score tile stays within one 128-lane Mosaic tile: at the
            # README-scale n=65 (stride 72, 144 packed) the score tile
            # lane-pads 144->256 where solo pads 80->128, and the inflated
            # softmax/score phase measured a 28% whole-model LOSS
            # (16.26 vs 11.72 ms/batch) despite the 10% GEMM-row saving —
            # so packing only engages when 2*stride <= 128. Deterministic
            # passes only: row-wise dropout on packed rows is fine, but
            # stochastic-depth/per-sample gates see sample PAIRS.
            import os

            stride = -(-n // (sublanes // 2)) * (sublanes // 2)
            if (
                stride < n_pad
                and 2 * stride <= 128
                and b % 2 == 0
                and deterministic
                and self.layer_dropout == 0.0
                and not os.environ.get("VIT_TPU_NO_PACK")
            ):
                x = jnp.pad(x, ((0, 0), (0, stride - n), (0, 0)))
                x = x.reshape(b // 2, 2 * stride, x.shape[2])
                true_tokens = n
                block_tokens = stride
                unpack = (b, stride, n)
            elif n_pad != n:
                x = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))
                true_tokens = n
                slice_back = n
        use_scan = (
            self.scan
            and context is None
            and not self.talking_heads
            and self.layer_dropout == 0.0
            and self.parallel_branches == 1
            and self.depth > 1
        )
        if use_scan:
            unroll = (
                self.scan_unroll
                if self.scan_unroll is not None
                else scan_unroll_for(self.depth)
            )
            cell = EncoderBlock
            if _remat_enabled.get():
                # deterministic is a static python bool. argnums count
                # `self` as 0 (linen's checkpoint subtracts 1 before
                # passing them to jax.checkpoint), so (x, deterministic)
                # are (1, 2) — marking 1 would freeze the scan carry.
                cell = nn.remat(cell, static_argnums=(2,))
            stacked = nn.scan(
                cell,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                length=self.depth,
                in_axes=nn.broadcast,
                unroll=min(unroll, self.depth),
            )(
                dim=self.dim,
                heads=self.heads,
                dim_head=self.dim_head,
                mlp_dim=self.mlp_dim,
                dropout=self.dropout,
                reattention=self.reattention,
                mask_self=self.mask_self,
                learned_temperature=self.learned_temperature,
                qkv_bias=self.qkv_bias,
                activation=self.activation,
                true_tokens=true_tokens,
                block_tokens=block_tokens,
                norm_eps=self.norm_eps,
                dtype=self.dtype,
                name="blocks",
            )
            x, _ = stacked(x, deterministic)
            if self.final_norm:
                x = nn.LayerNorm(epsilon=self.norm_eps, dtype=self.dtype, name="final_norm")(x)
            if unpack is not None:
                b, stride, n = unpack
                x = x.reshape(b, stride, x.shape[2])[:, :n]
            return x[:, :slice_back] if slice_back is not None else x
        attn_kwargs = dict(
            dim=self.dim,
            heads=self.heads,
            dim_head=self.dim_head,
            dropout=self.dropout,
            reattention=self.reattention,
            mask_self=self.mask_self,
            learned_temperature=self.learned_temperature,
            talking_heads=self.talking_heads,
            qkv_bias=self.qkv_bias,
            true_tokens=true_tokens,
            block_tokens=block_tokens,
            norm_eps=self.norm_eps,
            dtype=self.dtype,
        )

        def residual(x, delta, layer_idx, kind):
            if self.layer_dropout > 0.0 and not deterministic:
                # In-graph stochastic depth: per-sample bernoulli gate
                # (replaces the reference's fixed-key structural dropout,
                # cait.py:21,27).
                rng = self.make_rng("dropout")
                keep = jax.random.bernoulli(
                    rng, 1.0 - self.layer_dropout, (x.shape[0], 1, 1)
                )
                delta = delta * keep.astype(delta.dtype) / (1.0 - self.layer_dropout)
            return x + delta

        for i in range(self.depth):
            if self.parallel_branches == 1:
                a = Attention(**attn_kwargs, name=f"attn_{i}")(
                    x, context=context, deterministic=deterministic
                )
                x = residual(x, a, i, "attn")
                f = FeedForward(
                    self.dim, self.mlp_dim, self.dropout, ln_eps=self.norm_eps,
                    activation=self.activation,
                    dtype=self.dtype, name=f"ff_{i}"
                )(x, deterministic=deterministic)
                x = residual(x, f, i, "ff")
            else:
                # ParallelViT: sum of N attention branches, then sum of N FF
                # branches, each applied to the same input (parallel_vit.py:99-107).
                a = sum(
                    Attention(**attn_kwargs, name=f"attn_{i}_{b}")(
                        x, context=context, deterministic=deterministic
                    )
                    for b in range(self.parallel_branches)
                )
                x = residual(x, a, i, "attn")
                f = sum(
                    FeedForward(
                        self.dim, self.mlp_dim, self.dropout, dtype=self.dtype, name=f"ff_{i}_{b}"
                    )(x, deterministic=deterministic)
                    for b in range(self.parallel_branches)
                )
                x = residual(x, f, i, "ff")

        if self.final_norm:
            x = nn.LayerNorm(epsilon=self.norm_eps, dtype=self.dtype, name="final_norm")(x)
        if unpack is not None:
            b, stride, n = unpack
            x = x.reshape(b, stride, x.shape[2])[:, :n]
        return x[:, :slice_back] if slice_back is not None else x
