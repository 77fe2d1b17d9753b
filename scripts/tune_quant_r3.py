"""Round-3 int8 kernel tuning: where does the w8a8_kernel's time go?

The measured model is 75.6 ms (1694 img/s) at ViT-L/16 @224 b128; the int8
roofline estimate is ~62 ms (MLP 423 GF/layer at ~85% of 394 TOPS ≈ 1.3 ms,
projections 211 GF ≈ 0.7 ms, bf16 attention core ≈ 0.5 ms, + embed/head).
This script phase-ablates both fused kernels at flagship shapes with the
chained on-device harness (r3util.chain_timed — tunnel dispatch divided
out) and sweeps the MLP token tile.

Run on a healthy-ish service window: ratios within a run are trustworthy.
"""

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo/scripts")
sys.path.insert(0, "/root/repo")
from r3util import chain_timed, probe_ms  # noqa: E402

from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from vit_tpu.ops.block_attention import _ln_f32  # noqa: E402
from vit_tpu.ops.quant_block import (  # noqa: E402
    _quant_rows_f32,
    fused_quant_attention_block,
    fused_quant_mlp,
)

B, N, DIM, HEADS, D, MLP = 128, 224, 1024, 16, 64, 4096
HD = HEADS * D


def _phase_kernel(
    x_ref, ln_s_ref, ln_b_ref, wqkv_ref, sqkv_ref, wout_ref, sout_ref,
    bout_ref, o_ref, *, phase: str,
):
    """Attention-block kernel truncated after `phase` (output filled from
    whatever the last computed tensor is, so Mosaic can't DCE the work)."""
    n, dim = x_ref.shape[1], x_ref.shape[2]
    x = x_ref[...].reshape(n, dim)
    xn = _ln_f32(
        x.astype(jnp.float32), ln_s_ref[0].astype(jnp.float32),
        ln_b_ref[0].astype(jnp.float32), 1e-6,
    )
    x_i8, s_row = _quant_rows_f32(xn)
    if phase == "ln_quant":
        o_ref[...] = (x_i8.astype(jnp.float32) * s_row).reshape(1, n, dim).astype(o_ref.dtype)
        return
    qkv_acc = jax.lax.dot(x_i8, wqkv_ref[:], preferred_element_type=jnp.int32)
    qkv = (qkv_acc.astype(jnp.float32) * s_row * sqkv_ref[0]).astype(jnp.bfloat16)
    if phase == "qkv":
        o_ref[...] = qkv[:, :dim].reshape(1, n, dim).astype(o_ref.dtype)
        return
    head_parts = []
    for h in range(HEADS):
        q = qkv[:, h * D : (h + 1) * D]
        k = qkv[:, HD + h * D : HD + (h + 1) * D]
        v = qkv[:, 2 * HD + h * D : 2 * HD + (h + 1) * D]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * (D ** -0.5)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        head_parts.append(
            jax.lax.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        )
    attn = jnp.concatenate(head_parts, axis=-1)
    if phase == "attn":
        o_ref[...] = attn.reshape(1, n, dim).astype(o_ref.dtype)
        return
    a_i8, s2 = _quant_rows_f32(attn)
    out = jax.lax.dot(a_i8, wout_ref[:], preferred_element_type=jnp.int32)
    outf = out.astype(jnp.float32) * s2 * sout_ref[0] + bout_ref[0]
    o_ref[...] = (outf + x.astype(jnp.float32)).reshape(1, n, dim).astype(o_ref.dtype)


def phase_block(phase):
    @jax.jit
    def run(x, ln_s, ln_b, wqkv, sqkv, wout, sout, bout):
        return pl.pallas_call(
            functools.partial(_phase_kernel, phase=phase),
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, N, DIM), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, DIM), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, DIM), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((DIM, 3 * HD), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3 * HD), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((HD, DIM), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, DIM), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, DIM), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, N, DIM), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, N, DIM), x.dtype),
        )(x, ln_s, ln_b, wqkv, sqkv, wout, sout, bout)

    return run


def main():
    print(f"probe {probe_ms():.1f} ms", flush=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (B, N, DIM)), jnp.bfloat16)
    ln_s = jnp.ones((1, DIM), jnp.float32)
    ln_b = jnp.zeros((1, DIM), jnp.float32)
    wqkv = jnp.asarray(rng.integers(-127, 128, (DIM, 3 * HD)), jnp.int8)
    sqkv = jnp.full((1, 3 * HD), 1e-2, jnp.float32)
    wout = jnp.asarray(rng.integers(-127, 128, (HD, DIM)), jnp.int8)
    sout = jnp.full((1, DIM), 1e-2, jnp.float32)
    bout = jnp.zeros((1, DIM), jnp.float32)

    # shipped kernels first
    f_attn = jax.jit(
        lambda x: fused_quant_attention_block(
            x, ln_s[0], ln_b[0], wqkv, sqkv[0], wout, sout[0], bout[0],
            HEADS, ln_eps=1e-6, true_n=197,
        ).astype(x.dtype)
    )
    ms = chain_timed(f_attn, x)
    print(f"shipped attn block        {ms:7.3f} ms/layer", flush=True)

    for phase in ("ln_quant", "qkv", "attn", "full"):
        f = phase_block(phase)
        ms = chain_timed(
            lambda t: f(t, ln_s, ln_b, wqkv, sqkv, wout, sout, bout).astype(t.dtype),
            x,
        )
        print(f"phase {phase:9s}          {ms:7.3f} ms/layer", flush=True)

    # MLP tile sweep
    w1 = jnp.asarray(rng.integers(-127, 128, (DIM, MLP)), jnp.int8)
    s1 = jnp.full((1, MLP), 1e-2, jnp.float32)
    b1 = jnp.zeros((1, MLP), jnp.float32)
    w2 = jnp.asarray(rng.integers(-127, 128, (MLP, DIM)), jnp.int8)
    s2 = jnp.full((1, DIM), 1e-2, jnp.float32)
    b2 = jnp.zeros((1, DIM), jnp.float32)

    for block_t in (256, 512, 1024, 2048):
        if block_t == 256:
            f_mlp = jax.jit(
                lambda t: fused_quant_mlp(
                    t, ln_s[0], ln_b[0], w1, s1[0], b1, w2, s2[0], b2,
                    ln_eps=1e-6,
                ).astype(t.dtype)
            )
            ms = chain_timed(f_mlp, x)
            print(f"shipped mlp (block_t 256) {ms:7.3f} ms/layer", flush=True)
            continue

        def mlp_kernel(x_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
                       ls_ref, lb_ref, o_ref):
            xx = x_ref[:].astype(jnp.float32)
            xn = _ln_f32(xx, ls_ref[0].astype(jnp.float32),
                         lb_ref[0].astype(jnp.float32), 1e-6)
            x_i8, s_row = _quant_rows_f32(xn)
            h = jax.lax.dot(x_i8, w1_ref[:], preferred_element_type=jnp.int32)
            h = h.astype(jnp.float32) * s_row * s1_ref[0] + b1_ref[0]
            h = jax.nn.gelu(h)
            h_i8, sr2 = _quant_rows_f32(h)
            out = jax.lax.dot(h_i8, w2_ref[:], preferred_element_type=jnp.int32)
            o_ref[:] = (out.astype(jnp.float32) * sr2 * s2_ref[0] + b2_ref[0] + xx).astype(o_ref.dtype)

        rows = B * N

        @jax.jit
        def f_var(t, block_t=block_t, mlp_kernel=mlp_kernel):
            xf = t.reshape(rows, DIM)
            return pl.pallas_call(
                mlp_kernel,
                grid=(rows // block_t,),
                in_specs=[
                    pl.BlockSpec((block_t, DIM), lambda i: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((DIM, MLP), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, MLP), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, MLP), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((MLP, DIM), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, DIM), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, DIM), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, DIM), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, DIM), lambda i: (0, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((block_t, DIM), lambda i: (i, 0), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((rows, DIM), t.dtype),
            )(xf, w1, s1, b1, w2, s2, b2, ln_s, ln_b).reshape(B, N, DIM)

        try:
            ms = chain_timed(f_var, x)
            print(f"mlp block_t {block_t:5d}       {ms:7.3f} ms/layer", flush=True)
        except Exception as e:
            print(f"mlp block_t {block_t:5d}       FAILED {type(e).__name__}", flush=True)

    # --- floor probe: pure copy kernels at several grid sizes -------------
    def copy_kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...]

    for gb in (1, 2, 4, 8):
        @jax.jit
        def f_copy(t, gb=gb):
            return pl.pallas_call(
                copy_kernel,
                grid=(B // gb,),
                in_specs=[pl.BlockSpec((gb, N, DIM), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((gb, N, DIM), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((B, N, DIM), t.dtype),
            )(t)

        ms = chain_timed(f_copy, x)
        print(f"copy grid {B//gb:4d} programs  {ms:7.3f} ms", flush=True)

    # --- MLP: hidden-chunked variant (h never fully resident; bf16 gelu) --
    # h computed in CH-wide column chunks of w1, quantized per chunk, each
    # chunk's int8 panel contracted against its w2 row block into one int32
    # accumulator: halves/quarters the h footprint so block_t can grow and
    # the program count shrinks.
    for block_t, ch in ((512, 2048), (1024, 2048), (1024, 1024), (2048, 1024)):
        n_ch = MLP // ch

        def mlp_chunk_kernel(x_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref,
                             b2_ref, ls_ref, lb_ref, o_ref, *, block_t=block_t,
                             ch=ch, n_ch=n_ch):
            xx = x_ref[:].astype(jnp.float32)
            xn = _ln_f32(xx, ls_ref[0].astype(jnp.float32),
                         lb_ref[0].astype(jnp.float32), 1e-6)
            x_i8, s_row = _quant_rows_f32(xn)
            acc = jnp.zeros((block_t, DIM), jnp.float32)
            for c in range(n_ch):
                h = jax.lax.dot(x_i8, w1_ref[:, c * ch:(c + 1) * ch],
                                preferred_element_type=jnp.int32)
                h = (h.astype(jnp.float32) * s_row * s1_ref[0, c * ch:(c + 1) * ch]
                     + b1_ref[0, c * ch:(c + 1) * ch])
                h = jax.nn.gelu(h.astype(jnp.bfloat16)).astype(jnp.float32)
                h_i8, sr2 = _quant_rows_f32(h)
                part = jax.lax.dot(h_i8, w2_ref[c * ch:(c + 1) * ch, :],
                                   preferred_element_type=jnp.int32)
                acc = acc + part.astype(jnp.float32) * sr2
            o_ref[:] = (acc * s2_ref[0] + b2_ref[0] + xx).astype(o_ref.dtype)

        rows = B * N

        @jax.jit
        def f_chunk(t, block_t=block_t, mlp_chunk_kernel=mlp_chunk_kernel):
            xf = t.reshape(rows, DIM)
            return pl.pallas_call(
                mlp_chunk_kernel,
                grid=(rows // block_t,),
                in_specs=[
                    pl.BlockSpec((block_t, DIM), lambda i: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((DIM, MLP), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, MLP), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, MLP), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((MLP, DIM), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, DIM), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, DIM), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, DIM), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, DIM), lambda i: (0, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((block_t, DIM), lambda i: (i, 0), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((rows, DIM), t.dtype),
            )(xf, w1, s1, b1, w2, s2, b2, ln_s, ln_b).reshape(B, N, DIM)

        try:
            ms = chain_timed(f_chunk, x)
            print(f"mlp chunked bt={block_t:4d} ch={ch:4d}  {ms:7.3f} ms/layer",
                  flush=True)
        except Exception as e:
            print(f"mlp chunked bt={block_t:4d} ch={ch:4d}  FAILED "
                  f"{type(e).__name__}", flush=True)

    # roofline context
    gf_mlp = 4 * B * N * DIM * MLP / 1e9
    gf_proj = 2 * B * N * DIM * (3 * HD + HD) / 1e9
    print(f"(mlp {gf_mlp:.0f} GF/layer, projections {gf_proj:.0f} GF/layer; "
          f"int8 roofline 394 TOPS)", flush=True)


if __name__ == "__main__":
    main()
