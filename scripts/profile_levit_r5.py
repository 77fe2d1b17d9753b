"""Round-5 LeViT decomposition (VERDICT r4 #4): why does bf16 lose here
when it now wins for CvT (tune_convhybrid_r5.py)?

Hypotheses measured:
  1. dispatch interplay: bf16 makes mha_tokens eligible for the flash
     kernel at LeViT's tiny 196/49-token shapes with bias — the known
     misroute regime ("levit 1.11x -> 0.69x when fp32 was misrouted to
     flash", PERFORMANCE.md Dispatch rules). bf16-xla forces the XLA op
     path with everything else unchanged.
  2. the conv stem: 4 stride-2 3x3 convs at 224^2..28^2 — VPU/MXU conv
     behavior under bf16, isolated.
Also prints logit magnitudes to calibrate the bf16 error.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_levit_r5.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vit_tpu import ops
from vit_tpu.models import LeViT
from vit_tpu.utils import fold_batch_norm

B = 128
ITERS = 10
CFG = dict(image_size=224, num_classes=1000, stages=3, dim=(256, 384, 512),
           depth=4, heads=(4, 6, 8), mlp_mult=2)


def timed(fn, *args):
    np.asarray(fn(*args))
    np.asarray(fn(*args))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    np.asarray(out)
    return B / ((time.perf_counter() - t0) / ITERS)


class _Stem(nn.Module):
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        for i, feat in enumerate((32, 64, 128, 256)):
            x = nn.Conv(feat, (3, 3), strides=2, padding="SAME",
                        dtype=self.dtype, name=f"stem_{i}")(x)
        return x


def main():
    img = jax.random.normal(jax.random.PRNGKey(0), (B, 224, 224, 3),
                            jnp.float32)

    ref_logits = None
    for mode, dtype, cast_w, backend in (
        ("fp32-fold", None, False, None),
        ("bf16-w16", jnp.bfloat16, True, None),
        ("bf16-w16-xla", jnp.bfloat16, True, "xla"),
    ):
        model = LeViT(**CFG, dtype=dtype)
        variables = jax.jit(
            lambda m=model: m.init({"params": jax.random.PRNGKey(1)}, img[:1])
        )()
        model, variables = fold_batch_norm(model, jax.device_get(variables))
        if cast_w:
            variables = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if getattr(x, "dtype", None) == np.float32 else x, variables
            )
        variables = jax.device_put(variables)
        x = img.astype(dtype) if dtype is not None else img

        def fwd(v, a, m=model, be=backend):
            ctx = ops.force_backend(be) if be else None
            if ctx:
                with ctx:
                    out = m.apply(v, a)
            else:
                out = m.apply(v, a)
            return out[0] if isinstance(out, tuple) else out

        fn = jax.jit(fwd)
        ips = timed(fn, variables, x)
        logits = np.asarray(fn(variables, x[:8]), np.float32)
        if ref_logits is None:
            ref_logits = logits
            err = 0.0
        else:
            err = float(np.max(np.abs(logits - ref_logits)))
        print(f"levit {mode}: {ips:.1f} img/s  err={err:.3f}  "
              f"|logits| max={float(np.abs(logits).max()):.1f}", flush=True)

    # stem isolation
    for dtype in (None, jnp.bfloat16):
        stem = _Stem(dtype=dtype)
        p = jax.jit(lambda: stem.init(jax.random.PRNGKey(2), img[:1]))()
        if dtype is not None:
            p = jax.tree.map(lambda x: x.astype(jnp.bfloat16), p)
        x = img.astype(dtype) if dtype is not None else img
        fn = jax.jit(lambda v, a: stem.apply(v, a))
        ips = timed(fn, p, x)
        print(f"stem {'fp32' if dtype is None else 'bf16'}: {ips:.1f} img/s "
              f"({B/ips*1e3:.2f} ms)", flush=True)


if __name__ == "__main__":
    main()
