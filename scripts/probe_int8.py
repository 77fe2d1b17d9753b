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


if __name__ == "__main__":
    main()
