"""In-process A/B of soft-split formulations inside the whole t2t model:
  conv    jax.lax.conv_general_dilated_patches + (c,k2)->(k2,c) swap
  slices  k^2 strided slices + channel concat (+ optimization barrier)
Same process, same episode, one compile each.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/probe_softsplit_ab_r5.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from vit_tpu import ops
from vit_tpu.models import t2t as t2t_mod
from vit_tpu.models import T2TViT

B = 128
ITERS = 10


def conv_extract(x, kernel, stride, padding="SAME"):
    c = x.shape[-1]
    patches = jax.lax.conv_general_dilated_patches(
        x, filter_shape=(kernel, kernel), window_strides=(stride, stride),
        padding=padding, dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    b, ho, wo, _ = patches.shape
    patches = patches.reshape(b, ho, wo, c, kernel * kernel)
    patches = jnp.swapaxes(patches, -1, -2)
    return patches.reshape(b, ho, wo, kernel * kernel * c)


def slice_extract(x, kernel, stride, padding="SAME"):
    b, h, w, c = x.shape
    ho = -(-h // stride)
    wo = -(-w // stride)
    pad_h = max((ho - 1) * stride + kernel - h, 0)
    pad_w = max((wo - 1) * stride + kernel - w, 0)
    pt, pl = pad_h // 2, pad_w // 2
    x = jnp.pad(x, ((0, 0), (pt, pad_h - pt), (pl, pad_w - pl), (0, 0)))
    pieces = []
    for ki in range(kernel):
        for kj in range(kernel):
            pieces.append(
                x[:, ki : ki + (ho - 1) * stride + 1 : stride,
                  kj : kj + (wo - 1) * stride + 1 : stride, :])
    return jax.lax.optimization_barrier(jnp.concatenate(pieces, axis=-1))


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
    img = jax.random.normal(jax.random.PRNGKey(0), (B, 224, 224, 3),
                            jnp.float32)
    cfg = dict(dim=512, image_size=224, depth=5, heads=8, mlp_dim=512,
               num_classes=1000, t2t_layers=((7, 4), (3, 2), (3, 2)))
    model = T2TViT(**cfg, dtype=dtype)

    def hybrid_extract(x, kernel, stride, padding="SAME"):
        impl = conv_extract if kernel >= 5 else slice_extract
        return impl(x, kernel, stride, padding)

    ref = None
    for name, impl in (("conv", conv_extract), ("slices", slice_extract),
                       ("hybrid", hybrid_extract)):
        t2t_mod.ops.extract_patches = impl  # the model reads ops.extract_patches
        variables = jax.jit(
            lambda: model.init({"params": jax.random.PRNGKey(1)}, img[:1])
        )()
        fn = jax.jit(lambda v, a: model.apply(v, a))
        ms = timed_ms(fn, variables, img)
        out = np.asarray(fn(variables, img[:4]), np.float32)
        if ref is None:
            ref = out
            err = 0.0
        else:
            err = float(np.max(np.abs(out - ref)))
        print(f"{name}: {ms:.2f} ms ({B/ms*1e3:.0f} img/s) err={err:.5f}",
              flush=True)


if __name__ == "__main__":
    main()
