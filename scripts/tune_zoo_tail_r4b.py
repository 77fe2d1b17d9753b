"""Round-4 zoo-tail follow-up: clean same-process A/B of the block-kernel
dispatch at README scale (65->80 tokens, depth 6), isolating ONLY the
attention-block backend choice — the first experiment (tune_zoo_tail_r4.py)
forced the whole backend (patch-embed path moved too) and timed the layer
in the scanned regime, but depth-6 stacks fully UNROLL in-model where XLA
fuses across layer boundaries.

Arms (zoo vit config, batch 128, bf16, fp32 input like bench_zoo):
  kernel+unroll    current dispatch (block kernel at padded n=80), unroll 6
  xla+unroll       _block_kernel_wins patched False (the pre-round-4 rule)
  kernel+scan      kernel dispatch, VIT_TPU_SCAN_UNROLL=1
  xla+scan         xla dispatch, scan

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/tune_zoo_tail_r4b.py
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import jax
import jax.numpy as jnp
import numpy as np

from r3util import probe_ms

import vit_tpu.ops as O
from vit_tpu.models import ViT

BATCH, ITERS = 128, 10


def timed(fn, *args):
    np.asarray(fn(*args)); np.asarray(fn(*args))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / ITERS


def main():
    from vit_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    print(f"# probe {probe_ms():.1f} ms", flush=True)
    model = ViT(image_size=256, patch_size=32, num_classes=1000, dim=1024,
                depth=6, heads=16, mlp_dim=2048, dtype=jnp.bfloat16)
    img = jax.random.normal(jax.random.PRNGKey(0), (BATCH, 256, 256, 3),
                            jnp.float32)
    variables = jax.jit(
        lambda: model.init({"params": jax.random.PRNGKey(1)}, img[:1])
    )()

    orig = O._block_kernel_wins
    rows = []
    for unroll in ("6", "1"):
        os.environ["VIT_TPU_SCAN_UNROLL"] = unroll
        for arm, rule in (("kernel", orig), ("xla", lambda n: False)):
            O._block_kernel_wins = rule
            try:
                fn = jax.jit(lambda v, im: model.apply(v, im))
                dt = timed(fn, variables, img)
                rows.append((arm, unroll, dt))
                print(f"{arm:6s} unroll={unroll}  {dt * 1e3:7.2f} ms/batch  "
                      f"{BATCH / dt:8.1f} img/s", flush=True)
            finally:
                O._block_kernel_wins = orig
    os.environ.pop("VIT_TPU_SCAN_UNROLL", None)


if __name__ == "__main__":
    main()
