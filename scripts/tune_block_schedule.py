"""Microbench: in-kernel schedules for the attention core of the fused
block kernel (scores -> softmax -> PV per head). The per-head K=64/N=64
GEMMs cap MXU fill at 50% and the qk->softmax->pv dependency chain stalls
the MXU during VPU softmax; this compares:

  interleave - current production schedule (per head: qk, softmax, pv)
  phased     - all 16 qk GEMMs, then all softmaxes, then all pv GEMMs
               (bigger independent instruction groups for the scheduler)
  batched    - one dot_general with a head batch dim (Mosaic's own
               batched-GEMM lowering)

Timing includes the ~1.1ms per-dispatch tunnel floor; compare deltas.
Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/tune_block_schedule.py
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, N, DIM, HEADS, D = 128, 208, 1024, 16, 64
HD = HEADS * D


def _softmax(s):
    m = jnp.max(s, -1, keepdims=True)
    p = jnp.exp(s - m)
    return p / jnp.sum(p, -1, keepdims=True)


def make(schedule):
    def kernel(x_ref, wqkv_ref, wout_ref, o_ref):
        xr = x_ref[0]
        qkv = jax.lax.dot(
            xr, wqkv_ref[:], preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16)

        if schedule == "batched":
            qkvh = qkv.reshape(N, 3, HEADS, D)
            q = qkvh[:, 0].transpose(1, 0, 2)  # (H, N, D)
            k = qkvh[:, 1].transpose(1, 0, 2)
            v = qkvh[:, 2].transpose(1, 0, 2)
            s = jax.lax.dot_general(
                q, k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (H, N, N)
            p = _softmax(s)
            o = jax.lax.dot_general(
                p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (H, N, D)
            attn = o.transpose(1, 0, 2).reshape(N, HD).astype(jnp.bfloat16)
        elif schedule == "phased":
            ss = []
            for h in range(HEADS):
                q = qkv[:, h * D : (h + 1) * D]
                k = qkv[:, HD + h * D : HD + (h + 1) * D]
                ss.append(
                    jax.lax.dot_general(
                        q, k, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                )
            ps = [_softmax(s) for s in ss]
            outs = []
            for h in range(HEADS):
                v = qkv[:, 2 * HD + h * D : 2 * HD + (h + 1) * D]
                outs.append(
                    jax.lax.dot(
                        ps[h].astype(v.dtype), v, preferred_element_type=jnp.float32
                    ).astype(jnp.bfloat16)
                )
            attn = jnp.concatenate(outs, -1)
        else:  # interleave
            outs = []
            for h in range(HEADS):
                q = qkv[:, h * D : (h + 1) * D]
                k = qkv[:, HD + h * D : HD + (h + 1) * D]
                v = qkv[:, 2 * HD + h * D : 2 * HD + (h + 1) * D]
                s = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                p = _softmax(s)
                outs.append(
                    jax.lax.dot(
                        p.astype(v.dtype), v, preferred_element_type=jnp.float32
                    ).astype(jnp.bfloat16)
                )
            attn = jnp.concatenate(outs, -1)

        o = jax.lax.dot(attn, wout_ref[:], preferred_element_type=jnp.float32)
        o_ref[0] = (o + xr.astype(jnp.float32)).astype(o_ref.dtype)

    f = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, N, DIM), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((DIM, 3 * HD), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((HD, DIM), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, N, DIM), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, DIM), jnp.bfloat16),
    )
    return f


def timed(f, *a, iters=20):
    np.asarray(jnp.sum(f(*a)))
    np.asarray(jnp.sum(f(*a)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*a)
    np.asarray(jnp.sum(out))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, N, DIM), jnp.bfloat16)
    wqkv = jax.random.normal(key, (DIM, 3 * HD), jnp.bfloat16) * 0.02
    wout = jax.random.normal(key, (HD, DIM), jnp.bfloat16) * 0.02
    gold = None
    for schedule in sys.argv[1:] or ("interleave", "phased", "batched"):
        f = jax.jit(functools.partial(make(schedule)), static_argnums=())
        try:
            t = timed(f, x, wqkv, wout)
            out = np.asarray(f(x, wqkv, wout)[0, :4, :4], np.float32)
            if gold is None:
                gold = out
            err = float(np.max(np.abs(out - gold)))
            print(f"{schedule:11s} {t:7.3f}ms  (spot err vs first: {err:.2e})", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{schedule:11s} FAIL {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
