"""Kernel layer: Pallas TPU kernels with XLA fallbacks and a dispatch policy.

Backend selection (``VIT_TPU_BACKEND`` env var):
  - ``auto`` (default): Pallas kernels when running on TPU, XLA elsewhere.
  - ``pallas``: force compiled Pallas kernels.
  - ``interpret``: Pallas kernels in interpreter mode (CPU kernel testing).
  - ``xla``: force the plain-XLA reference implementations.
"""

from __future__ import annotations

import contextlib
import contextvars
import os
from typing import Optional

import jax

from vit_tpu.ops.block_attention import fused_attention_block, xla_attention_block
from vit_tpu.ops.reattention_block import (
    fused_reattention_block,
    fused_talking_heads_block,
    xla_reattention_block,
    xla_talking_heads_block,
)
from vit_tpu.ops.flash_attention import (
    flash_attention,
    flash_attention_kv_blocked,
    reference_attention,
)
from vit_tpu.ops.window_attention import (
    fused_window_attention_block,
    xla_window_attention_block,
)
from vit_tpu.ops.fused_mlp import fused_mlp, reference_mlp
from vit_tpu.ops.qkv_attention import fused_qkv_attention
from vit_tpu.ops.patch_embed import (  # noqa: F401
    extract_patches,
    patchify,
    posemb_sincos_2d,
    spt_shifts,
    unpatchify,
)
from vit_tpu.ops.windows import (  # noqa: F401
    block_partition,
    block_unpartition,
    dilated_partition,
    dilated_unpartition,
    window_partition,
    window_unpartition,
)

__all__ = [
    "attention",
    "mlp",
    "flash_attention",
    "flash_attention_kv_blocked",
    "reference_attention",
    "fused_mlp",
    "reference_mlp",
    "patchify",
    "unpatchify",
    "extract_patches",
    "spt_shifts",
    "posemb_sincos_2d",
    "backend_mode",
]


_backend_override: contextvars.ContextVar[Optional[str]] = contextvars.ContextVar(
    "vit_tpu_backend_override", default=None
)


@contextlib.contextmanager
def force_backend(mode: str):
    """Temporarily force the kernel backend (``pallas``/``xla``/``interpret``).

    Used by the GSPMD tensor-parallel and training paths, which trace through
    XLA so the partitioner can shard and differentiate the compute (Pallas
    custom-calls carry no partitioning or autodiff rules yet)."""
    token = _backend_override.set(mode)
    try:
        yield
    finally:
        _backend_override.reset(token)


def _resolved_mode() -> tuple[str, bool]:
    """Resolved backend mode and whether it came from ``auto``.

    The shape heuristics below (``_MIN_PALLAS_SEQ``) apply only to
    auto-resolved modes: an explicit ``pallas`` (env var or
    ``force_backend``) is honored unconditionally so kernel tests and
    benchmarks measure what they ask for."""
    override = _backend_override.get()
    if override is not None:
        return override, False
    mode = os.environ.get("VIT_TPU_BACKEND", "auto")
    if mode == "auto":
        return ("pallas" if jax.default_backend() == "tpu" else "xla"), True
    return mode, False


def backend_mode() -> str:
    return _resolved_mode()[0]


# Legacy floor for the fused-qkv kernel (batch-axis grid): below this the
# sequence fits XLA's fast einsum buckets and the kernel's q-tiling can't
# help (window families at 49-64 tokens ride their own packed kernel).
_MIN_PALLAS_SEQ = 128

# The fused attention-block kernel rides the batch grid axis (one program
# per sample), so short sequences don't fragment the launch — and XLA has
# a measured slow bucket at n<=64 (2.10ms vs 1.55ms at n=65, B=128
# dim-1024 h16). The kernel wins from n=64 up: 1.25ms at n=64 (1.68x),
# 1.48ms at 65, 1.50 vs 2.21 at 96 (scripts/tune_attn_dispatch.py sweep).
_MIN_BLOCK_SEQ = 64


def _block_kernel_wins(n: int) -> bool:
    """Auto-dispatch rule for the fused block kernel, from the measured
    sweep: XLA is slow exactly at n<=64 and degrades again from ~128
    (2.42ms at 128); between 65 and 127 it sits in its fast bucket
    (1.55ms at 65) where the kernel's 16-row token padding would add both
    pad/unpad copies and wasted rows. So: kernel for tile-aligned n >= 64
    (no padding needed) and for everything >= 128 (padding measured a net
    win there — ViT-L 197->208 runs 2.77 vs 2.92ms); XLA for unaligned
    65..127."""
    return (n % 16 == 0 and n >= _MIN_BLOCK_SEQ) or n >= 128


def _flash_vmem_fits(q_shape, k_shape, v_shape, has_bias, itemsize, block_q=256):
    """Scoped-VMEM estimate for the flash kernel's per-program working set.

    The resident-KV kernel holds one Q tile plus ALL of K/V for one (b, h)
    in VMEM (flash_attention.py:15-22) — fine for the zoo's <=3.2k-token
    shapes, but a long-context call (long kv x wide dv) would Mosaic-fail
    rather than compile. Shapes failing this estimate stream K/V through
    the online-softmax ``flash_attention_kv_blocked`` kernel instead."""
    nq, d = q_shape[2], q_shape[3]
    nk, dv = k_shape[2], v_shape[3]
    bq = min(block_q, (nq + 127) // 128 * 128)
    nk_pad = (nk + 127) // 128 * 128
    est = 2 * (bq * d + nk_pad * d + nk_pad * dv + bq * dv) * itemsize
    est += bq * nk_pad * 4  # fp32 score tile
    if has_bias:
        est += 2 * bq * nk_pad * 4
    return est <= 12 * 1024 * 1024


def attention(
    q,
    k,
    v,
    bias=None,
    *,
    scale: Optional[float] = None,
    mask_self: bool = False,
):
    """Dispatching multi-head attention: ``[B, H, N, D]`` in/out."""
    mode, auto = _resolved_mode()
    nq_, nk_ = q.shape[2], k.shape[2]
    # Measured (scripts/tune_attn_dispatch.py shapes, B=128, bf16): flash
    # wins whenever both sides carry real blocked work — cvt 4096/1024:
    # 5.45 vs 8.73ms; cvt 1024/256: 3.97 vs 4.36; vit-l 197/197: 5.95 vs
    # 6.43; t2t 3136/3136: 12 vs 42 (XLA's 5GB score tensor is pure HBM
    # traffic); RegionViT quirks 785-token windows: 1923 vs 995 img/s
    # whole-model. XLA keeps the short-kv cases where per-(b,h) programs
    # degenerate (twins-GSA 3136/49: 4.48 vs 6.88ms), everything tiny
    # (windows at 49-64 tokens), and ALL fp32 inputs: the kernel requests
    # Precision.HIGHEST there (a deliberate fidelity choice) which runs
    # 3-pass bf16 — measured in-model cvt 0.99x -> 0.88x, levit 1.11x ->
    # 0.69x when fp32 streams were routed to flash.
    fits = _flash_vmem_fits(q.shape, k.shape, v.shape, bias is not None, q.dtype.itemsize)
    use_flash = q.dtype.itemsize < 4 and nq_ >= 128 and nk_ >= 128
    # fp32 streams with a LARGE score tensor: XLA materializes the fp32
    # (b,h,nq,nk) scores in HBM (CvT stage 1 at batch 128: 2.1 GB written
    # and re-read), which dominates the op. Casting the operands to bf16 is
    # bitwise the operand rounding XLA's DEFAULT fp32 matmul already
    # performs on the MXU (PARITY.md), so routing the cast tensors through
    # the flash kernel (fp32 score/softmax accumulators, never materialized)
    # keeps DEFAULT fidelity and removes the traffic. Measured at the CvT
    # stage-1 shape (nq=4096, nk=1024, h=1, B=128): 13.9 -> 7.3 ms; the
    # smaller stages (nq*nk <= 256k) measured faster on XLA and keep it.
    if (
        auto
        and mode == "pallas"
        and not use_flash
        and q.dtype.itemsize == 4
        and nq_ >= 128
        and nk_ >= 128
        and nq_ * nk_ >= (1 << 21)
    ):
        out = attention(
            q.astype("bfloat16"), k.astype("bfloat16"), v.astype("bfloat16"),
            None if bias is None else bias, scale=scale, mask_self=mask_self,
        )
        return out.astype(q.dtype)
    if mode == "xla" or (auto and mode == "pallas" and not use_flash):
        return reference_attention(q, k, v, bias, scale=scale, mask_self=mask_self)
    if not fits:
        # K/V too large to sit resident in VMEM: stream them through the
        # online-softmax kv-blocked kernel (the long-context path) instead
        # of failing Mosaic compile.
        return flash_attention_kv_blocked(
            q, k, v, bias, scale=scale, mask_self=mask_self,
            interpret=(mode == "interpret"),
        )
    return flash_attention(
        q, k, v, bias, scale=scale, mask_self=mask_self, interpret=(mode == "interpret")
    )


def attention_block(
    x, ln_scale, ln_bias, wqkv, wout, bout, heads: int, *, scale=None, ln_eps=1e-6,
    true_n=None, block_tokens=None,
):
    """Dispatching fully-fused attention block (LN -> qkv -> attention ->
    out-proj -> +residual); XLA fallback off-TPU.

    ``true_n``: real token count when the caller keeps the residual stream
    pre-padded to the sublane tile (see fused_attention_block) — both
    backends mask padded key columns identically. ``block_tokens``: the
    per-sample stride of a sample-packed stream (block-diagonal attention;
    see fused_attention_block) — both backends apply the same mask."""
    mode, auto = _resolved_mode()
    # Dispatch on the width the kernel would actually process: a caller that
    # keeps the stream pre-padded to the sublane tile (true_n set — the
    # whole-encoder padding models/vit.py uses) hands the kernel an ALIGNED
    # width with no pad/unpad copies, so the "XLA's fast unaligned 65..127
    # bucket" rule does not apply — judge by the padded width instead.
    # Measured at README scale (n=65 -> 80 padded, B=128, dim 1024) in the
    # 4-arm dispatch x trunk-regime A/B: kernel 1.81 vs XLA 1.99 ms/layer,
    # and in the SCANNED trunk the models now default to (blocks.py
    # scan_unroll_for) whole-model 10982 vs 9985 img/s
    # (measurements/r4/tune_zoo_tail_r4b.log) — the round-4 zoo-tail lift.
    n_disp = x.shape[1]
    if mode == "xla" or (auto and mode == "pallas" and not _block_kernel_wins(n_disp)):
        if scale is None:
            scale = (wqkv.shape[1] // 3 // heads) ** -0.5
        return xla_attention_block(
            x, ln_scale, ln_bias, wqkv, wout, bout, heads, scale, ln_eps, true_n,
            block_tokens,
        )
    return fused_attention_block(
        x, ln_scale, ln_bias, wqkv, wout, bout, heads,
        scale=scale, ln_eps=ln_eps, true_n=true_n, block_tokens=block_tokens,
        interpret=(mode == "interpret"),
    )


def reattention_block(
    x, ln_scale, ln_bias, wqkv, wout, bout, mix, rln_scale, rln_bias,
    heads: int, *, scale=None, ln_eps=1e-6, reattn_eps=1e-6,
):
    """Dispatching fused DeepViT re-attention block (LN -> qkv -> per-head
    softmax -> head mix + LN-over-heads, tile-wise in VMEM -> PV -> out
    proj -> +residual). The XLA fallback materializes the score tensor and
    transposes for the head LayerNorm, so the kernel wins even at the
    65-token DeepViT shape where the plain block kernel defers to XLA."""
    mode, _auto = _resolved_mode()
    if scale is None:
        scale = (wqkv.shape[1] // 3 // heads) ** -0.5
    if mode == "xla":
        return xla_reattention_block(
            x, ln_scale, ln_bias, wqkv, wout, bout, mix, rln_scale, rln_bias,
            heads, scale, ln_eps, reattn_eps,
        )
    return fused_reattention_block(
        x, ln_scale, ln_bias, wqkv, wout, bout, mix, rln_scale, rln_bias,
        heads, scale=scale, ln_eps=ln_eps, reattn_eps=reattn_eps,
        interpret=(mode == "interpret"),
    )


def talking_heads_block(
    x, ln_scale, ln_bias, wqkv, wout, bout, mix_pre, mix_post,
    heads: int, *, scale=None, ln_eps=1e-5, residual=False,
):
    """Dispatching fused CaiT talking-heads block: pre/post-softmax head
    mixes are tile-wise over the per-head score tiles in VMEM (no
    materialized (b,h,i,j) tensor, no head-mix einsum round trips)."""
    mode, _auto = _resolved_mode()
    if scale is None:
        scale = (wqkv.shape[1] // 3 // heads) ** -0.5
    if mode == "xla":
        return xla_talking_heads_block(
            x, ln_scale, ln_bias, wqkv, wout, bout, mix_pre, mix_post,
            heads, scale, ln_eps, residual,
        )
    return fused_talking_heads_block(
        x, ln_scale, ln_bias, wqkv, wout, bout, mix_pre, mix_post,
        heads, scale=scale, ln_eps=ln_eps, residual=residual,
        interpret=(mode == "interpret"),
    )


def window_attention_block(
    xw, ln_scale, ln_bias, wqkv, wout, bout, heads: int, bias=None,
    *, scale=None, ln_eps: float = 1e-5,
):
    """Dispatching fused multi-window attention block over windowed tokens
    ``[NW, S, C]`` — LN -> qkv -> block-diagonal attention (+bias) -> out
    projection, one kernel (the small-window answer the _MIN_PALLAS_SEQ
    heuristic routes around for the per-window kernels).

    Windows below 32 tokens (e.g. CrossFormer's deep-stage 2x2/1x1 dilated
    LDA windows) stay on the XLA path even in auto mode: padding them to
    the 16-row Mosaic tile wastes up to (16/S)^2 of the score/softmax work,
    measured slower than XLA's batched einsum."""
    mode, auto = _resolved_mode()
    if mode == "xla" or (auto and mode == "pallas" and xw.shape[1] < 32):
        if scale is None:
            scale = (wqkv.shape[1] // 3 // heads) ** -0.5
        return xla_window_attention_block(
            xw, ln_scale, ln_bias, wqkv, wout, bout, heads, bias,
            scale=scale, ln_eps=ln_eps,
        )
    return fused_window_attention_block(
        xw, ln_scale, ln_bias, wqkv, wout, bout, heads, bias,
        scale=scale, ln_eps=ln_eps, interpret=(mode == "interpret"),
    )


def qkv_attention(qkv, heads: int, bias=None, *, scale: Optional[float] = None):
    """Dispatching self-attention on the fused qkv layout ``[B, N, 3*H*D]``.

    The TPU path is the zero-copy head-sliced kernel; the XLA path splits
    heads explicitly (the compiler fuses those transposes into the GEMMs).
    """
    mode, auto = _resolved_mode()
    small_seq = auto and qkv.shape[1] < _MIN_PALLAS_SEQ
    # The zero-copy kernel holds one sample's full fused [q|k|v] row panel
    # (plus a per-q-block bias panel) in VMEM, double-buffered across the
    # grid. Long sequences x wide fused dims (T2T's tokenizer stages) or
    # big per-head bias tables (RegionViT quirks joint windows) bust the
    # ~16MB budget — estimate the scoped usage and route oversized shapes
    # through the per-head flash kernel (small, blocked panels) instead.
    b_, n_, f_ = qkv.shape
    item = qkv.dtype.itemsize
    bq_est = min(1024, max(128, (4 * 1024 * 1024 // (n_ * 4)) // 128 * 128), n_)
    bias_blk = 0
    if bias is not None:
        bias_blk = bias.shape[1] * bq_est * n_ * 4
    vmem_est = (
        2 * (bq_est * f_ * item + n_ * f_ * item + bias_blk + bq_est * (f_ // 3) * item)
        + bq_est * n_ * 4
    )
    if (
        (mode == "interpret" or (mode == "pallas" and not small_seq))
        and vmem_est <= 10 * 1024 * 1024
    ):
        return fused_qkv_attention(
            qkv, heads, bias, scale=scale, interpret=(mode == "interpret")
        )
    import jax.numpy as jnp

    b, n, three_hd = qkv.shape
    hd = three_hd // 3
    d = hd // heads
    q, k, v = jnp.split(qkv, 3, axis=-1)
    split = lambda t: t.reshape(b, n, heads, d).transpose(0, 2, 1, 3)
    out = attention(split(q), split(k), split(v), bias, scale=scale)
    return out.transpose(0, 2, 1, 3).reshape(b, n, hd)


def mlp(
    x,
    w1,
    b1,
    w2,
    b2,
    ln_scale=None,
    ln_bias=None,
    *,
    activation: str = "gelu",
    residual: bool = True,
    ln_eps: float = 1e-6,
):
    """Dispatching fused MLP block over tokens ``[..., T, D]``.

    ``VIT_TPU_MLP`` (pallas/xla/interpret) overrides the backend for this op
    alone. Default on TPU is the XLA path: in the full model XLA fuses the
    residual adds and neighboring elementwise into the GEMMs and measures
    ~10% faster than the fused Pallas kernel at ViT-L shapes (1109 vs 1007
    img/s; scripts/tune_mlp.py + combo bench). The Pallas kernel remains one
    env var away and is the path for future in-kernel fusion work.
    """
    mode = os.environ.get("VIT_TPU_MLP")
    if mode is None:
        mode = backend_mode()
        if mode == "pallas":
            mode = "xla"
    if mode == "xla":
        return reference_mlp(
            x, w1, b1, w2, b2, ln_scale, ln_bias,
            activation=activation, residual=residual, ln_eps=ln_eps,
        )
    return fused_mlp(
        x, w1, b1, w2, b2, ln_scale, ln_bias,
        activation=activation, residual=residual, ln_eps=ln_eps,
        interpret=(mode == "interpret"),
    )
