"""Pallas TPU fused transformer-MLP kernel: LN -> GEMM -> act -> GEMM -> +res.

Covers the reference's ``FeedForward`` (Dense-GELU-Dense, vit.py:41 and nine
clones) and the conv-1x1 ``MLP`` flavor (cvt.py:42 etc. — a 1x1 conv over
NHWC is the same GEMM over flattened tokens), per SURVEY.md §2.2 rows 3-4 and
§2.4 item 4. The pre-norm wrapper (``PreNorm``, vit.py:26 + 12 clones) fuses
into the kernel prologue and the residual add into the epilogue, so one HBM
round-trip serves the whole block.

Tiling: grid = (token_tiles, hidden_tiles). The hidden dimension is blocked
so the two weight matrices stream through VMEM one column/row panel at a
time; partial products accumulate in an fp32 VMEM scratch and the output
tile is written once on the last hidden tile.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vit_tpu.core.utils import cdiv, round_up

_LANES = 128


def _layer_norm_f32(x, scale, bias, eps=1e-6):
    # flax.linen.LayerNorm's exact op sequence (fast variance, scale folded
    # into the rsqrt multiplier) — keeps bf16 rounding decisions downstream
    # aligned with the jitted reference.
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.maximum(
        0.0, jnp.mean(jnp.square(x), axis=-1, keepdims=True) - jnp.square(mean)
    )
    mul = jax.lax.rsqrt(var + eps) * scale
    return (x - mean) * mul + bias


def _activate(h, activation: str):
    if activation == "gelu":
        return jax.nn.gelu(h)
    if activation == "gelu_exact":  # erf-based, HF/timm ViTs (interop)
        return jax.nn.gelu(h, approximate=False)
    if activation == "hard_swish":  # LeViT MLP flavor (levit.py:40)
        return h * jax.nn.relu6(h + 3.0) / 6.0
    raise ValueError(activation)


def _mlp_kernel(
    x_ref,
    ln_scale_ref,
    ln_bias_ref,
    w1_ref,
    b1_ref,
    w2_ref,
    b2_ref,
    o_ref,
    xn_scratch,
    acc_scratch,
    *,
    activation: str,
    residual: bool,
    has_ln: bool,
    ln_eps: float,
    n_f: int,
):
    fj = pl.program_id(1)

    @pl.when(fj == 0)
    def _prologue():
        x = x_ref[:].astype(jnp.float32)
        if has_ln:
            x = _layer_norm_f32(
                x, ln_scale_ref[0].astype(jnp.float32), ln_bias_ref[0].astype(jnp.float32), ln_eps
            )
        xn_scratch[:] = x.astype(xn_scratch.dtype)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    # GEMM precision follows the weight dtype: bf16 weights run natively on
    # the MXU; fp32 weights request full precision (the TPU default would
    # decompose fp32 to one bf16 pass). The mixed-precision policy (fp32
    # residual stream, bf16 MXU) enters here as fp32 x with bf16 weights —
    # the normalized activations are cast once, in VMEM.
    precision = (
        jax.lax.Precision.HIGHEST
        if w1_ref.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    xn = xn_scratch[:]
    h = jax.lax.dot(xn, w1_ref[:], preferred_element_type=jnp.float32, precision=precision)
    h += b1_ref[0].astype(jnp.float32)
    h = _activate(h, activation)
    acc_scratch[:] += jax.lax.dot(
        h.astype(xn.dtype), w2_ref[:], preferred_element_type=jnp.float32, precision=precision
    )

    @pl.when(fj == n_f - 1)
    def _epilogue():
        out = acc_scratch[:] + b2_ref[0].astype(jnp.float32)
        if residual:
            out += x_ref[:].astype(jnp.float32)
        o_ref[:] = out.astype(o_ref.dtype)


@functools.lru_cache(maxsize=None)
def _partitioned_mlp(ndim, presence, activation, residual, ln_eps, block_t,
                     block_f, interpret):
    """Mesh-partitionable forward (ops/partitioning.py): the leading token/
    batch dim shards in place (every row is independent through LN -> MLP ->
    residual); weights/biases are need-replication, so a TP column/row-
    sharded w1/w2 pair reaching this whole-dim kernel is gathered by the
    compiler (use the XLA path for TP-sharded MLPs — it psums instead)."""
    from vit_tpu.ops.partitioning import partitioned

    has_b1, has_b2, has_lns, has_lnb = presence
    x_roles = ("b",) + tuple(f"t{i}" for i in range(ndim - 2)) + ("d",)
    roles = [x_roles, ("d", "f")]
    if has_b1:
        roles.append(("f",))
    roles.append(("f", "d"))
    if has_b2:
        roles.append(("d",))
    if has_lns:
        roles.append(("d",))
    if has_lnb:
        roles.append(("d",))

    def fn(*args):
        it = iter(args)
        x, w1 = next(it), next(it)
        b1 = next(it) if has_b1 else None
        w2 = next(it)
        b2 = next(it) if has_b2 else None
        lns = next(it) if has_lns else None
        lnb = next(it) if has_lnb else None
        return _fused_mlp_impl(
            x, w1, b1, w2, b2, lns, lnb,
            activation=activation, residual=residual, ln_eps=ln_eps,
            block_t=block_t, block_f=block_f, interpret=interpret,
        )

    return partitioned(fn, tuple(roles), x_roles)


def _mlp_call(x, w1, b1, w2, b2, ln_scale, ln_bias,
              activation, residual, ln_eps, block_t, block_f, interpret):
    presence = (
        b1 is not None, b2 is not None,
        ln_scale is not None, ln_bias is not None,
    )
    p = _partitioned_mlp(
        x.ndim, presence, activation, residual, ln_eps, block_t, block_f,
        interpret,
    )
    args = [a for a in (x, w1, b1, w2, b2, ln_scale, ln_bias) if a is not None]
    return p(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12))
def _mlp_ad(x, w1, b1, w2, b2, ln_scale, ln_bias,
            activation, residual, ln_eps, block_t, block_f, interpret):
    return _mlp_call(
        x, w1, b1, w2, b2, ln_scale, ln_bias,
        activation, residual, ln_eps, block_t, block_f, interpret,
    )


def _mlp_fwd(x, w1, b1, w2, b2, ln_scale, ln_bias,
             activation, residual, ln_eps, block_t, block_f, interpret):
    out = _mlp_call(
        x, w1, b1, w2, b2, ln_scale, ln_bias,
        activation, residual, ln_eps, block_t, block_f, interpret,
    )
    return out, (x, w1, b1, w2, b2, ln_scale, ln_bias)


def _mlp_bwd(activation, residual, ln_eps, block_t, block_f, interpret, res, g):
    # rematerializing backward through the XLA reference (exact gradients;
    # the hidden activations only exist inside this backward pass).
    args = res

    def f(*diff_args):
        return reference_mlp(
            *diff_args, activation=activation, residual=residual, ln_eps=ln_eps
        )

    _, vjp = jax.vjp(f, *args)
    return vjp(g.astype(args[0].dtype))


_mlp_ad.defvjp(_mlp_fwd, _mlp_bwd)


def fused_mlp(
    x: jax.Array,
    w1: jax.Array,
    b1: Optional[jax.Array],
    w2: jax.Array,
    b2: Optional[jax.Array],
    ln_scale: Optional[jax.Array] = None,
    ln_bias: Optional[jax.Array] = None,
    *,
    activation: str = "gelu",
    residual: bool = True,
    ln_eps: float = 1e-6,
    block_t: int = 256,
    block_f: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """Differentiable wrapper: Pallas forward, XLA-recompute backward."""
    return _mlp_ad(
        x, w1, b1, w2, b2, ln_scale, ln_bias,
        activation, residual, ln_eps, block_t, block_f, interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "activation",
        "residual",
        "ln_eps",
        "block_t",
        "block_f",
        "interpret",
    ),
)
def _fused_mlp_impl(
    x: jax.Array,
    w1: jax.Array,
    b1: Optional[jax.Array],
    w2: jax.Array,
    b2: Optional[jax.Array],
    ln_scale: Optional[jax.Array] = None,
    ln_bias: Optional[jax.Array] = None,
    *,
    activation: str = "gelu",
    residual: bool = True,
    ln_eps: float = 1e-6,
    block_t: int = 256,
    block_f: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """Fused ``(LN ->) x@W1+b1 -> act -> @W2+b2 (-> +x)`` over tokens.

    Args:
      x: ``[..., T, D]`` tokens (leading dims are flattened internally).
      w1: ``[D, F]``; b1: ``[F]`` or None.
      w2: ``[F, D]``; b2: ``[D]`` or None.
      ln_scale/ln_bias: optional pre-norm parameters ``[D]``.

    Returns ``[..., T, D]`` in the dtype of ``x``.
    """
    orig_shape = x.shape
    d = orig_shape[-1]
    f = w1.shape[1]
    t = 1
    for s in orig_shape[:-1]:
        t *= s
    xf = x.reshape(t, d)

    has_ln = ln_scale is not None
    if ln_scale is None:
        ln_scale = jnp.ones((d,), x.dtype)
    if ln_bias is None:
        ln_bias = jnp.zeros((d,), x.dtype)
    if b1 is None:
        b1 = jnp.zeros((f,), x.dtype)
    if b2 is None:
        b2 = jnp.zeros((d,), x.dtype)

    block_t = min(block_t, round_up(t, 8))
    block_f = min(block_f, round_up(f, _LANES))
    f_pad = round_up(f, block_f)

    # token tiles may be ragged (Pallas masks the stores); the hidden dim is
    # zero-padded so padded columns contribute exactly zero to the second GEMM
    w1p = jnp.pad(w1, ((0, 0), (0, f_pad - f))) if f_pad != f else w1
    w2p = jnp.pad(w2, ((0, f_pad - f), (0, 0))) if f_pad != f else w2
    b1p = jnp.pad(b1, (0, f_pad - f)) if f_pad != f else b1

    n_t = cdiv(t, block_t)
    n_f = cdiv(f_pad, block_f)
    grid = (n_t, n_f)

    kernel = functools.partial(
        _mlp_kernel,
        activation=activation,
        residual=residual,
        has_ln=has_ln,
        ln_eps=ln_eps,
        n_f=n_f,
    )

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_t, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, block_f), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_f), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_f, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_t, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, d), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_t, d), w1.dtype),  # normalized x, in MXU dtype
            pltpu.VMEM((block_t, d), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * t * d * f,
            bytes_accessed=(xf.size * 2 + w1p.size + w2p.size) * x.dtype.itemsize,
            transcendentals=t * f,
        ),
        interpret=interpret,
    )(
        xf,
        ln_scale.reshape(1, d),
        ln_bias.reshape(1, d),
        w1p,
        b1p.reshape(1, f_pad),
        w2p,
        b2.reshape(1, d),
    )

    return out.reshape(orig_shape)


def reference_mlp(
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
    """Plain-XLA path: numerical reference and CPU/GPU fallback."""
    h = x.astype(jnp.float32)
    if ln_scale is not None:
        lb = ln_bias if ln_bias is not None else jnp.zeros_like(ln_scale)
        h = _layer_norm_f32(h, ln_scale.astype(jnp.float32), lb.astype(jnp.float32), ln_eps)
    h = h.astype(w1.dtype)  # MXU dtype follows the weights (mixed precision)
    h = jnp.dot(h, w1, preferred_element_type=jnp.float32)
    if b1 is not None:
        h = h + b1.astype(h.dtype)
    h = _activate(h, activation)
    h = jnp.dot(h.astype(w2.dtype), w2, preferred_element_type=jnp.float32)
    if b2 is not None:
        h = h + b2.astype(h.dtype)
    if residual:
        h = h + x.astype(h.dtype)
    return h.astype(x.dtype)
