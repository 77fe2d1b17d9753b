"""Round-5 follow-up: where do the remaining ~2.6 ms of the CaiT class
stage go after the low-query reassociation? Times the reassociated
attention einsums alone, the FF-on-1-token, and einsum formulation
alternatives at the exact cls-stage shapes (B=128, h=16, d=1024, e=64,
n_kv=65).

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/probe_cls_stage_r5.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

B, H, D, E, J = 128, 16, 1024, 64, 65
ITERS = 20


def timed_ms(fn, *args):
    np.asarray(fn(*args))
    np.asarray(fn(*args))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / ITERS * 1e3


def main():
    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, H, 1, E), dtype)
    c = jax.random.normal(key, (B, J, D), dtype)
    wk = jax.random.normal(key, (D, H, E), dtype) * 0.02
    wv = jax.random.normal(key, (D, H, E), dtype) * 0.02
    mix = jax.random.normal(key, (H, H), jnp.float32) * 0.02

    def attn_core(q, c, wk, wv, mix):
        t = jnp.einsum("bhqe,dhe->bhqd", q, wk,
                       preferred_element_type=jnp.float32).astype(dtype)
        s = jnp.einsum("bhqd,bjd->bhqj", t, c,
                       preferred_element_type=jnp.float32)
        s = s * (E ** -0.5)
        s = jnp.einsum("bhqj,hg->bgqj", s, mix)
        p = jax.nn.softmax(s, axis=-1)
        p = jnp.einsum("bhqj,hg->bgqj", p, mix)
        u = jnp.einsum("bhqj,bjd->bhqd", p.astype(dtype), c,
                       preferred_element_type=jnp.float32).astype(dtype)
        return jnp.einsum("bhqd,dhe->bhqe", u, wv,
                          preferred_element_type=jnp.float32).astype(dtype)

    print(f"attn-core: {timed_ms(jax.jit(lambda *a: attn_core(*a).sum()), q, c, wk, wv, mix):.3f} ms",
          flush=True)

    # piecewise
    t_fn = jax.jit(lambda q, wk: jnp.einsum(
        "bhqe,dhe->bhqd", q, wk, preferred_element_type=jnp.float32).astype(dtype).sum())
    print(f"  t = qWk^T        : {timed_ms(t_fn, q, wk):.3f} ms", flush=True)
    t = jnp.einsum("bhqe,dhe->bhqd", q, wk,
                   preferred_element_type=jnp.float32).astype(dtype)
    s_fn = jax.jit(lambda t, c: jnp.einsum(
        "bhqd,bjd->bhqj", t, c, preferred_element_type=jnp.float32).sum())
    print(f"  s = tC^T         : {timed_ms(s_fn, t, c):.3f} ms", flush=True)
    p = jax.nn.softmax(jnp.einsum("bhqd,bjd->bhqj", t, c), axis=-1).astype(dtype)
    u_fn = jax.jit(lambda p, c: jnp.einsum(
        "bhqj,bjd->bhqd", p, c, preferred_element_type=jnp.float32).astype(dtype).sum())
    print(f"  u = pC           : {timed_ms(u_fn, p, c):.3f} ms", flush=True)
    u = jnp.einsum("bhqj,bjd->bhqd", p, c).astype(dtype)
    o_fn = jax.jit(lambda u, wv: jnp.einsum(
        "bhqd,dhe->bhqe", u, wv, preferred_element_type=jnp.float32).astype(dtype).sum())
    print(f"  o = uWv          : {timed_ms(o_fn, u, wv):.3f} ms", flush=True)

    # alternative: fold (h, q=1) into one row axis so t/o become single GEMMs
    q2 = q.reshape(B, H * E)          # (b, h*e) — block-structure lost; need per-head
    wk_hd = jnp.transpose(wk, (1, 2, 0)).reshape(H * E, D)  # (h*e, d) block rows

    def t_blockgemm(q2, wk_hd):
        # per-head GEMV as one dense GEMM with block-diagonal masking baked
        # into the weights is wrong; instead: h-batched (b,e)@(e,d)
        qh = q.reshape(B, H, E).transpose(1, 0, 2)          # (h, b, e)
        wk_t = jnp.transpose(wk, (1, 2, 0))                 # (h, e, d)
        return jax.lax.dot_general(
            qh, wk_t, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(dtype)

    print(f"  t h-batched GEMM : {timed_ms(jax.jit(lambda *a: t_blockgemm(*a).sum()), q2, wk_hd):.3f} ms",
          flush=True)

    # FF on one token (dim 1024 -> 2048 -> 1024), the cls block's other half
    w1 = jax.random.normal(key, (D, 2 * D), dtype) * 0.02
    w2 = jax.random.normal(key, (2 * D, D), dtype) * 0.02
    x1 = jax.random.normal(key, (B, 1, D), dtype)

    def ff(x1, w1, w2):
        h = jax.nn.gelu(jnp.matmul(x1, w1, preferred_element_type=jnp.float32).astype(dtype))
        return jnp.matmul(h, w2, preferred_element_type=jnp.float32).astype(dtype)

    print(f"ff-1tok: {timed_ms(jax.jit(lambda *a: ff(*a).sum()), x1, w1, w2):.3f} ms", flush=True)


if __name__ == "__main__":
    main()
