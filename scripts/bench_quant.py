"""W8A8 quantized ViT-L inference vs the float paths, on the real TPU.

Rows: bf16 kernel path (the flagship), XLA bf16, W8A8 (XLA int8 GEMMs),
plus max-logit divergence of W8A8 vs the bf16 forward. Run probe_int8.py
first — if the raw int8 GEMM doesn't beat bf16, the model-level number
can't either (weight-HBM savings only matter at small batch; there's a
batch-1 row for exactly that).

Run on a HEALTHY service only (probe printed first; see MEMORY).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo/scripts")
from r3util import probe_ms

CFG = dict(
    image_size=224, patch_size=16, num_classes=1000,
    dim=1024, depth=24, heads=16, mlp_dim=4096,
)


def timed(fn, *args, iters=10):
    np.asarray(fn(*args))
    np.asarray(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / iters


def main():
    # "sweep": batch sweep across the w8a8-vs-kernel crossover, to pin
    # utils/quantize.py's W8A8_KERNEL_MIN_BATCH from data (the headline
    # table only brackets it: XLA wins at 8, kernel at 128).
    batches = (128, 8, 1)
    if len(sys.argv) > 1 and sys.argv[1] == "sweep":
        batches = (8, 16, 24, 32, 48, 64)

    print(f"probe {probe_ms():.1f} ms", flush=True)
    from vit_tpu.models import ViT
    from vit_tpu.utils.quantize import quantize_vit, vit_apply_w8a8

    model = ViT(**CFG, dtype=jnp.bfloat16)
    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0)}, jnp.ones((1, 224, 224, 3), jnp.bfloat16)
    )
    qvars = quantize_vit(variables)
    apply_f = jax.jit(model.apply)
    apply_q = jax.jit(lambda v, x: vit_apply_w8a8(model, v, x))
    apply_w8 = jax.jit(lambda v, x: vit_apply_w8a8(model, v, x, mode="w8"))
    apply_qk = jax.jit(
        lambda v, x: vit_apply_w8a8(model, v, x, mode="w8a8_kernel")
    )

    for batch in batches:
        img = jnp.asarray(
            np.random.default_rng(0).normal(0, 1, (batch, 224, 224, 3)), jnp.bfloat16
        )
        dt_f = timed(apply_f, variables, img)
        dt_q = timed(apply_q, qvars, img)
        dt_w8 = timed(apply_w8, qvars, img)
        try:
            dt_qk = timed(apply_qk, qvars, img)
            qk = f"  w8a8-kernel {batch/dt_qk:8.1f} img/s ({dt_f/dt_qk:4.2f}x)"
        except Exception as e:  # Mosaic int8 lowering unproven on HW
            qk = f"  w8a8-kernel FAILED ({type(e).__name__})"
        print(
            f"B={batch:4d}  bf16-kernels {batch/dt_f:8.1f} img/s ({dt_f*1e3:7.2f} ms)"
            f"  w8a8 {batch/dt_q:8.1f} img/s ({dt_q*1e3:7.2f} ms, {dt_f/dt_q:4.2f}x)"
            f"  w8 {batch/dt_w8:8.1f} img/s ({dt_w8*1e3:7.2f} ms, {dt_f/dt_w8:4.2f}x)"
            + qk,
            flush=True,
        )

    img = jnp.asarray(
        np.random.default_rng(1).normal(0, 1, (8, 224, 224, 3)), jnp.bfloat16
    )
    ref = np.asarray(apply_f(variables, img), np.float32)
    got = np.asarray(apply_q(qvars, img), np.float32)
    print(f"w8a8 vs bf16 max|dlogit| {np.abs(got - ref).max():.4f} "
          f"(logit range {np.abs(ref).max():.2f})")


if __name__ == "__main__":
    main()
