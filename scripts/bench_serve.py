"""Serving benchmark: JPEG bytes -> logits on the real TPU (the
PERFORMANCE.md serving table).

Measures, on synthetic 480x320 (and optionally larger) JPEGs:
  1. host decode+resize alone (the host-bound ceiling), exact and fast
  2. classify_jpegs       (decode, then infer — serial)
  3. classify_jpeg_stream (decode batch k+1 while the TPU runs batch k)

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench_serve.py [HxW]
"""

from __future__ import annotations

import io
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from vit_tpu.data import JpegDecoder, classify_jpeg_stream, classify_jpegs
from vit_tpu.models import ViT
from vit_tpu.pipeline import InferencePipeline

BATCH = 128
N_BATCHES = 6


def make_jpegs(h, w, n):
    rng = np.random.default_rng(0)
    out = []
    for i in range(n):
        y, x = np.mgrid[0:h, 0:w]
        arr = (127 + 80 * np.sin(x / 31.0 + i) * np.cos(y / 23.0)
               + rng.normal(0, 8, (h, w, 3))).clip(0, 255).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="JPEG", quality=85)
        out.append(buf.getvalue())
    return out


def main():
    h, w = (480, 320)
    if len(sys.argv) > 1:
        h, w = (int(s) for s in sys.argv[1].lower().split("x"))

    jpegs = make_jpegs(h, w, BATCH)
    batches = [jpegs] * N_BATCHES

    model = ViT(image_size=224, patch_size=16, num_classes=1000, dim=1024,
                depth=24, heads=16, mlp_dim=4096, dtype=jnp.bfloat16)
    variables = jax.jit(lambda: model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 224, 224, 3), jnp.bfloat16)))()
    pipe = InferencePipeline(model, variables, image_size=224,
                             batch_size=BATCH)

    results = {}
    for fast in (False, True):
        dec = JpegDecoder(size=256, fast=fast)
        tag = "fast" if fast else "exact"
        assert dec.backend == "native", "native decoder required for the bench"

        dec(jpegs)  # warm
        t0 = time.perf_counter()
        for _ in range(3):
            dec(jpegs)
        results[f"decode_{tag}"] = BATCH / ((time.perf_counter() - t0) / 3)

        np.asarray(classify_jpegs(pipe, jpegs, decoder=dec))  # compile+warm
        t0 = time.perf_counter()
        for b in batches:
            np.asarray(classify_jpegs(pipe, b, decoder=dec))
        results[f"serial_{tag}"] = BATCH * N_BATCHES / (time.perf_counter() - t0)

        t0 = time.perf_counter()
        for out in classify_jpeg_stream(pipe, batches, decoder=dec):
            pass
        results[f"stream_{tag}"] = BATCH * N_BATCHES / (time.perf_counter() - t0)

    print(f"source {h}x{w}, batch {BATCH}, ViT-L/16 @224 bf16, "
          f"{N_BATCHES} batches:")
    for k, v in results.items():
        print(f"  {k:14s} {v:8.1f} img/s")


if __name__ == "__main__":
    main()
