"""Round-4 statistical int8 accuracy (VERDICT r3 item 4).

Round 3's int8 accuracy evidence was contract-level (max|dlogit| on a few
small test inputs). This script measures, over >=1,024 DIVERSE inputs:

  * top-1 agreement rate vs the bf16 forward, and mean/max |dlogit|,
    for every execution mode: w8 (weight-only), w8a8 (XLA int8),
    w8a8_kernel (fused Pallas encoder), and the QAT fake-quant forward vs
    its deployed w8a8 counterpart (the QAT contract).
  * the batch-8 auto-mode crossover, re-pinned from >=5 timing runs per
    mode with a confidence interval (PERFORMANCE.md noted the single-run
    sweep flipped between runs).

Input diversity: procedural 224x224 scenes (low-frequency color fields +
shapes + oriented texture + noise, varied brightness/contrast), round-
tripped through REAL JPEG encode (PIL q85) and the native decoder
(vit_tpu.data.JpegDecoder — the serving path), then the augment pipeline
(hflip/crop/color-jitter) for per-sample variation. Weights are the
benchmark config's random init (no pretrained ViT-L exists in this
offline environment); agreement on random weights is the CONSERVATIVE
measure — random logit margins are tighter than trained ones, so trained
agreement can only be higher. The trained-model agreement companion is
scripts/convergence_r4.py (small ViT trained on the procedural task, int8
agreement + accuracy delta on its val set).

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/int8_accuracy_r4.py
"""

import io
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from vit_tpu.data import JpegDecoder

CFG = dict(image_size=224, patch_size=16, num_classes=1000,
           dim=1024, depth=24, heads=16, mlp_dim=4096)
N_INPUTS = 1024
BATCH = 128
TIMING_REPS = 5


def synth_scene(rng: np.random.Generator, h=224, w=224) -> np.ndarray:
    """One procedural uint8 scene: color field + shapes + texture + noise."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.zeros((h, w, 3), np.float32)
    # low-frequency color field
    for c in range(3):
        fx, fy = rng.uniform(0.3, 3.0, 2)
        ph = rng.uniform(0, 2 * np.pi, 2)
        img[..., c] = 0.5 + 0.35 * np.sin(2 * np.pi * fx * xx / w + ph[0]) * \
            np.sin(2 * np.pi * fy * yy / h + ph[1])
    # rectangles / ellipses
    for _ in range(rng.integers(2, 6)):
        cx, cy = rng.uniform(0, w), rng.uniform(0, h)
        rw, rh = rng.uniform(10, 90, 2)
        color = rng.uniform(0, 1, 3)
        if rng.random() < 0.5:
            m = (np.abs(xx - cx) < rw) & (np.abs(yy - cy) < rh)
        else:
            m = ((xx - cx) / rw) ** 2 + ((yy - cy) / rh) ** 2 < 1.0
        img[m] = 0.6 * img[m] + 0.4 * color
    # oriented texture
    th = rng.uniform(0, np.pi)
    freq = rng.uniform(4, 24)
    tex = 0.5 + 0.5 * np.sin(
        2 * np.pi * freq * (np.cos(th) * xx + np.sin(th) * yy) / w
    )
    img += rng.uniform(0.03, 0.15) * (tex[..., None] - 0.5)
    # brightness / contrast / noise
    img = (img - 0.5) * rng.uniform(0.6, 1.4) + 0.5 + rng.uniform(-0.15, 0.15)
    img += rng.normal(0, rng.uniform(0.005, 0.04), img.shape)
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def make_inputs(n: int, seed=0) -> np.ndarray:
    """n diverse images through real JPEG encode + the NATIVE decoder +
    the augment pipeline; float32 [0,1] NHWC."""
    rng = np.random.default_rng(seed)
    jpegs = []
    for _ in range(n):
        buf = io.BytesIO()
        Image.fromarray(synth_scene(rng)).save(
            buf, format="JPEG", quality=int(rng.integers(70, 96))
        )
        jpegs.append(buf.getvalue())
    dec = JpegDecoder(size=224)
    arr = np.zeros((n, 224, 224, 3), np.uint8)
    for i in range(0, n, 64):
        arr[i:i + 64] = dec(jpegs[i:i + 64])
    x = arr.astype(np.float32) / 255.0

    from vit_tpu.augment import color_jitter, random_crop, random_hflip

    @jax.jit
    def aug(k, imgs):
        k1, k2, k3 = jax.random.split(k, 3)
        imgs = random_hflip(k1, imgs)
        imgs = random_crop(k2, imgs, padding=8)
        return color_jitter(k3, imgs)

    out = np.zeros_like(x)
    for i in range(0, n, 128):
        out[i:i + 128] = np.asarray(
            aug(jax.random.fold_in(jax.random.PRNGKey(7), i),
                jnp.asarray(x[i:i + 128]))
        )
    return out


def batched_logits(fn, vars_, x: np.ndarray) -> np.ndarray:
    outs = []
    for i in range(0, len(x), BATCH):
        outs.append(np.asarray(fn(vars_, jnp.asarray(x[i:i + BATCH]))))
    return np.concatenate(outs, 0)


def agreement(golden: np.ndarray, probe: np.ndarray) -> dict:
    d = np.abs(probe.astype(np.float64) - golden.astype(np.float64))
    return {
        "n": int(len(golden)),
        "top1_agree": float(np.mean(probe.argmax(-1) == golden.argmax(-1))),
        "mean_abs_dlogit": float(d.mean()),
        "max_abs_dlogit": float(d.max()),
        "golden_logit_range": float(golden.max() - golden.min()),
    }


def main():
    sys.path.insert(0, "/root/repo/scripts")
    from r3util import probe_ms

    from vit_tpu.models import ViT
    from vit_tpu.utils import enable_compilation_cache
    from vit_tpu.utils.quantize import quantize_vit, vit_apply_qat, vit_apply_w8a8

    enable_compilation_cache()
    print(f"# probe {probe_ms():.1f} ms", flush=True)

    t0 = time.time()
    x = make_inputs(N_INPUTS)
    print(f"# {N_INPUTS} jpeg-roundtripped augmented inputs in "
          f"{time.time() - t0:.0f}s  (px mean {x.mean():.3f} std {x.std():.3f})",
          flush=True)

    model = ViT(**CFG, dtype=jnp.bfloat16)
    variables = jax.jit(
        lambda: model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 224, 224, 3), jnp.bfloat16))
    )()
    qvars = quantize_vit(variables)

    bf16_fn = jax.jit(lambda v, im: model.apply(v, im.astype(jnp.bfloat16)))
    golden = batched_logits(bf16_fn, variables, x)
    print(f"# golden bf16 logits: range {golden.max() - golden.min():.3f} "
          f"std {golden.std():.3f}", flush=True)

    results = {}
    for mode in ("w8", "w8a8", "w8a8_kernel"):
        fn = jax.jit(lambda v, im, m=mode: vit_apply_w8a8(
            model, v, im.astype(jnp.bfloat16), mode=m))
        stats = agreement(golden, batched_logits(fn, qvars, x))
        results[mode] = stats
        print(f"{mode:13s} top1_agree {stats['top1_agree']:.4f}  "
              f"mean|dlogit| {stats['mean_abs_dlogit']:.4f}  "
              f"max|dlogit| {stats['max_abs_dlogit']:.4f}", flush=True)

    # QAT contract: the fake-quant training forward vs its deployed w8a8
    qat_fn = jax.jit(lambda v, im: vit_apply_qat(model, v, im.astype(jnp.bfloat16)))
    dep_fn = jax.jit(lambda v, im: vit_apply_w8a8(
        model, v, im.astype(jnp.bfloat16), mode="w8a8"))
    qat_logits = batched_logits(qat_fn, variables, x)
    dep_logits = batched_logits(dep_fn, qvars, x)
    stats = agreement(dep_logits, qat_logits)
    results["qat_vs_deployed_w8a8"] = stats
    print(f"{'qat~deployed':13s} top1_agree {stats['top1_agree']:.4f}  "
          f"mean|dlogit| {stats['mean_abs_dlogit']:.4f}  "
          f"max|dlogit| {stats['max_abs_dlogit']:.4f}", flush=True)

    # --- batch-8 auto crossover: >=5 fenced timing runs per mode ---
    img8 = jnp.asarray(x[:8], jnp.bfloat16)
    xover = {}
    for mode in ("w8a8", "w8a8_kernel"):
        fn = jax.jit(lambda v, im, m=mode: vit_apply_w8a8(model, v, im, mode=m))
        np.asarray(fn(qvars, img8))  # compile+warm
        np.asarray(fn(qvars, img8))
        ips = []
        for _ in range(TIMING_REPS):
            t0 = time.perf_counter()
            for _ in range(10):
                out = fn(qvars, img8)
            np.asarray(out)
            ips.append(8 * 10 / (time.perf_counter() - t0))
        ips = np.asarray(ips)
        xover[mode] = {"mean_ips": float(ips.mean()), "std_ips": float(ips.std()),
                       "runs": [round(float(v), 1) for v in ips]}
        print(f"batch8[{mode}] {ips.mean():.0f} ± {ips.std():.0f} img/s "
              f"({TIMING_REPS} runs)", flush=True)

    print(json.dumps({"n_inputs": N_INPUTS, "agreement": results,
                      "batch8_crossover": xover}), flush=True)


if __name__ == "__main__":
    main()
