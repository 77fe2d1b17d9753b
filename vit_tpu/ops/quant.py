"""Int8 quantized GEMM primitives (post-training quantization).

The v5e MXU advertises 2x int8 throughput over bf16 (394 vs 197 TOPS), and
independent of whether XLA reaches that peak, int8 weights halve the weight
HBM footprint and traffic — the dominant term at serving batch sizes
(ViT-L weights ~610MB fp32 / ~305MB bf16; a batch-1 forward is weight-bound).
``scripts/probe_int8.py`` measures what the int8 ``dot_general`` path
actually delivers on this chip; the model-level transform lives in
``vit_tpu/utils/quantize.py``.

Scheme (the standard W8A8 dynamic recipe):
  - weights: symmetric per-output-channel int8, scale = amax/127 over the
    contraction dim (zero-point-free keeps the GEMM a plain int8 dot);
  - activations: symmetric per-row (per-token) dynamic int8 — the row max
    is computed in-graph, so no calibration set is needed;
  - accumulation in int32 (``preferred_element_type``), fp32 epilogue
    ``acc * (s_row * s_col) + bias``.

No reference counterpart: the reference (conceptofmind/vit-flax) has no
quantization story at all.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def quantize_channelwise(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Symmetric per-output-channel int8 quantization of a GEMM weight.

    ``w``: (..., K, N) — quantized along everything but the last axis, one
    scale per output channel (per trailing-axis slice). Leading axes (e.g.
    the scan depth axis of stacked encoder weights) keep independent scales
    per (leading, N) pair.

    Returns ``(w_i8, scale)`` with ``w ~= w_i8 * scale`` and ``scale``
    shaped like ``w`` with the contraction axis reduced to 1.
    """
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=-2, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    w_i8 = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return w_i8, scale.astype(jnp.float32)


def dequantize(w_i8: jax.Array, scale: jax.Array, dtype=jnp.float32) -> jax.Array:
    return (w_i8.astype(jnp.float32) * scale).astype(dtype)


def quantize_rows(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Symmetric per-row (per-token) dynamic int8 quantization of an
    activation ``(..., K)``. Returns ``(x_i8, row_scale (...,1) fp32)``."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    s = jnp.maximum(amax, 1e-12) / 127.0
    x_i8 = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    return x_i8, s


def int8_matmul(
    x: jax.Array,
    w_i8: jax.Array,
    w_scale: jax.Array,
    bias: Optional[jax.Array] = None,
    out_dtype: Optional[jnp.dtype] = None,
) -> jax.Array:
    """``x @ dequant(w)`` executed as an int8 x int8 -> int32 GEMM.

    ``x``: (..., K) float; quantized per-row in-graph (dynamic). ``w_i8``:
    (K, N) int8 with ``w_scale`` (1, N). The int32 accumulator picks up the
    fp32 epilogue ``* (s_row * s_col) [+ bias]``; bias (fp32) is added on
    the fp32 accumulator exactly like the non-quantized blocks do.
    """
    x_i8, s_row = quantize_rows(x)
    acc = jax.lax.dot_general(
        x_i8,
        w_i8,
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * s_row * w_scale.reshape(-1)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(out_dtype or x.dtype)
