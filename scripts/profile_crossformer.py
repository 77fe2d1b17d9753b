"""Per-component timing of CrossFormer at its default config (batch 32,
bf16): which parts of a stage actually cost time? Drives the multi-window
kernel design (VERDICT r1 item 3).

Run: PYTHONPATH=/root/repo python scripts/profile_crossformer.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from vit_tpu.models.crossformer import CrossFormer, _LSDAttention
from vit_tpu.nn.conv import ConvMLP, CrossEmbedLayer

B = 32
DIMS = (64, 128, 256, 512)
DEPTHS = (2, 2, 8, 2)
FMAPS = (56, 28, 14, 7)
GWSZ = (8, 4, 2, 1)
LWSZ = 7
DTYPE = jnp.bfloat16


def bench(fn, *args, iters=20):
    import numpy as np

    # sync via host pull of the last output — block_until_ready is
    # unreliable on this environment's tunneled backend (see bench.py)
    np.asarray(fn(*args))
    np.asarray(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def time_module(mod, x):
    vars_ = jax.jit(lambda: mod.init({"params": jax.random.PRNGKey(0)}, x))()
    fn = jax.jit(lambda v, x: mod.apply(v, x))
    return bench(fn, vars_, x)


def main():
    total_components = 0.0
    key = jax.random.PRNGKey(0)
    print(f"batch {B}, dtype {DTYPE.__name__}", flush=True)
    prev_dim = 3
    fmap_in = 224
    for s in range(4):
        x_in = jax.random.normal(key, (B, fmap_in, fmap_in, prev_dim), DTYPE)
        ks = ((4, 8, 16, 32), (2, 4), (2, 4), (2, 4))[s]
        st = (4, 2, 2, 2)[s]
        t_embed = time_module(
            CrossEmbedLayer(DIMS[s], ks, st, dtype=DTYPE), x_in
        )
        x = jax.random.normal(key, (B, FMAPS[s], FMAPS[s], DIMS[s]), DTYPE)
        t_sda = time_module(
            _LSDAttention(DIMS[s], "short", LWSZ, dtype=DTYPE), x
        )
        t_lda = time_module(
            _LSDAttention(DIMS[s], "long", GWSZ[s], dtype=DTYPE), x
        )
        t_mlp = time_module(ConvMLP(DIMS[s], dtype=DTYPE), x)
        per_block = t_sda + t_lda + 2 * t_mlp
        stage = t_embed + DEPTHS[s] * per_block
        total_components += stage
        print(
            f"stage {s}: embed {t_embed:6.2f}  sda {t_sda:6.2f}  "
            f"lda {t_lda:6.2f}  mlp {t_mlp:6.2f}  "
            f"block {per_block:6.2f} x{DEPTHS[s]}  stage {stage:7.2f} ms",
            flush=True,
        )
        prev_dim = DIMS[s]
        fmap_in = FMAPS[s]

    img = jax.random.normal(key, (B, 224, 224, 3), DTYPE)
    model = CrossFormer(dtype=DTYPE)
    t_full = time_module(model, img)
    print(f"sum of components: {total_components:.2f} ms")
    print(f"full model       : {t_full:.2f} ms  ({B / t_full * 1e3:.0f} img/s)")


if __name__ == "__main__":
    main()
