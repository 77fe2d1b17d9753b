"""Is the v5e's int8 MXU path (2x bf16 peak on paper) reachable from jnp?

Times bf16 vs int8 (and int4 if supported) GEMMs at ViT-L-ish shapes with
the chained on-device harness (dispatch divided out). If int8 measures
near 2x, a quantized inference mode is worth building; if XLA converts to
bf16 internally (~1x), that's the negative result.

Run on a HEALTHY service only (probe printed first; see MEMORY).
"""

import jax
import jax.numpy as jnp
import numpy as np

from r3util import chain_timed, probe_ms


def main():
    print(f"probe {probe_ms():.1f} ms")
    m, k, n = 26624, 1024, 1024  # 128 samples x 208 tokens, ViT-L qkv-ish
    flops = 2 * m * k * n

    x32 = jax.random.normal(jax.random.PRNGKey(0), (m, k))
    w32 = jax.random.normal(jax.random.PRNGKey(1), (k, n))

    # bf16 baseline
    xb, wb = x32.astype(jnp.bfloat16), w32.astype(jnp.bfloat16)
    ms = chain_timed(lambda c, w: jnp.dot(c, w, preferred_element_type=jnp.float32),
                     xb, wb, dtype_cast=jnp.bfloat16)
    print(f"bf16   {ms:7.3f} ms  {flops / ms / 1e9:8.1f} GF/s")

    # int8 -> int32 accumulate; requantize between links so the chain stays int8
    xi = (x32 * 16).astype(jnp.int8)
    wi = (w32 * 16).astype(jnp.int8)

    def int8_gemm(c, w):
        acc = jax.lax.dot_general(
            c, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
        return (acc >> 8).astype(jnp.int8)  # cheap requant to keep shape/dtype

    ms = chain_timed(int8_gemm, xi, wi)
    print(f"int8   {ms:7.3f} ms  {flops / ms / 1e9:8.1f} GF(op)/s")

    # int8 x int8 -> fp32 scale epilogue (the realistic inference epilogue)
    def int8_gemm_f32(c, w):
        acc = jax.lax.dot_general(
            c, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * (1.0 / 256.0)).astype(jnp.bfloat16)

    xi8 = xi
    ms = chain_timed(lambda c, w: int8_gemm_f32((c * 127).astype(jnp.int8), w),
                     xb, wi, dtype_cast=jnp.bfloat16)
    print(f"int8+quant-epilogue (from bf16 stream) {ms:7.3f} ms  {flops / ms / 1e9:8.1f} GF(op)/s")

    # mixed int8 weight x bf16 activation (weight-only quant)
    ms = chain_timed(lambda c, w: jnp.dot(c, w.astype(jnp.bfloat16),
                                          preferred_element_type=jnp.float32),
                     xb, wi, dtype_cast=jnp.bfloat16)
    print(f"int8-weight bf16-act {ms:7.3f} ms  {flops / ms / 1e9:8.1f} GF/s")

    # Mosaic int8: does pallas lower an int8 x int8 -> int32 dot at all,
    # and at what rate? (gates ops/quant_block.py's kernel path)
    try:
        import functools

        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        mm, kk, nn = 4096, 1024, 1024

        def _k(a_ref, b_ref, o_ref):
            o_ref[:] = jax.lax.dot(
                a_ref[:], b_ref[:], preferred_element_type=jnp.int32
            )

        def pallas_i8(a, b):
            return pl.pallas_call(
                _k,
                in_specs=[
                    pl.BlockSpec((mm, kk), lambda: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((kk, nn), lambda: (0, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((mm, nn), lambda: (0, 0), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((mm, nn), jnp.int32),
            )(a, b)

        ai = (x32[:mm, :kk] * 16).astype(jnp.int8)
        bi = (w32[:kk, :nn] * 16).astype(jnp.int8)
        fl = 2 * mm * kk * nn
        ms = chain_timed(
            lambda c, w: (pallas_i8(c, w) >> 8).astype(jnp.int8), ai, bi
        )
        print(f"pallas int8 dot {ms:7.3f} ms  {fl / ms / 1e9:8.1f} GF(op)/s")
    except Exception as e:
        print(f"pallas int8 dot: FAILED to lower/run ({type(e).__name__}: "
              f"{str(e)[:200]})")


if __name__ == "__main__":
    main()
