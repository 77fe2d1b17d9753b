"""t2t stage-0 transformer (n=3136, dim 147, 1 head) under each backend —
is the 22%-of-peak phase a kernel misroute at the lane-hostile d=147?

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/probe_t2t_stage0_r5.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from vit_tpu import ops
from vit_tpu.nn.blocks import Transformer

B = 128
ITERS = 10


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
    for label, n, d in (("stage0", 3136, 147), ("stage1", 784, 1323)):
        x = jax.random.normal(jax.random.PRNGKey(2), (B, n, d), dtype)
        tr = Transformer(dim=d, depth=1, heads=1, dim_head=d, mlp_dim=d,
                         norm_eps=1e-5, dtype=dtype)
        p = jax.jit(lambda tr=tr, x=x: tr.init({"params": jax.random.PRNGKey(3)}, x))()
        for mode in ("pallas", "xla"):
            def fwd(v, a, tr=tr, m=mode):
                with ops.force_backend(m):
                    return tr.apply(v, a).sum()
            ms = timed_ms(jax.jit(fwd), p, x)
            print(f"{label}-{mode}: {ms:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
