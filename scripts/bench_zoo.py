"""Per-family throughput: every reference model (its own __main__ config,
dropout 0, jit-compiled, fp32) vs this framework (same architecture, bf16).

VERDICT r1 item 4: a single flagship number can hide regressions; this
benches all 17 families. Timing syncs by pulling the last output to host
(block_until_ready under-reports on this environment's tunneled backend).

Conv hybrids: CvT runs bf16 with FOLDED BN and pre-cast bf16 weights —
round 5 (scripts/tune_convhybrid_r5.py) measured 4521 img/s vs 4129 fp32
once the BN fold removes the normalize ops and the pre-cast removes
flax's per-op param casts (round 3's "bf16 loses" held only for the
unfolded, fp32-param graph). LeViT stays fp32: its 196/49-token
attention is in the flash-misroute regime at bf16 and the stem/1x1-conv
pipeline measures faster under fp32 (scripts/profile_levit_r5.py).
Twins runs bf16: with its local attention on the fused multi-window
kernel, bf16 measures 1674 img/s vs 817 fp32.

Reference comparators need the same minimal shims as the parity tests:
- Array.split method restore (simple_vit / parallel_vit / patch_merger
  crash at init on modern JAX, bug register #12)
- in-graph tf.image.extract_patches (t2t / pit host-call blocks jit;
  ops.extract_patches is bit-exact per tests/test_ops.py)
- TPU clamped-gather is native here (region_vit)
efficient.py cannot run at all (undefined self.emb_dropout,
efficient.py:47) — ours-only.

Run: PYTHONPATH=/root/repo python scripts/bench_zoo.py [family ...]
Writes PERF_ZOO.json (one JSON object per family line).
"""

from __future__ import annotations

import json
import sys
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/reference/vit_flax")

from vit_tpu import ops  # noqa: E402

BATCH = 128  # throughput regime — the tiny __main__ configs are dispatch-
# bound at small batch (65-token ViT @ batch 32 is 2k tokens/batch)
ITERS = 10
DTYPE = jnp.bfloat16
RNGS = {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2),
        "emb_dropout": jax.random.PRNGKey(3)}


def _patch_array_split():
    import jax.numpy as _jnp
    from jax._src.array import ArrayImpl
    from jax._src.core import Tracer

    ArrayImpl.split = lambda self, n, axis=0: _jnp.split(self, n, axis=axis)
    Tracer.split = lambda self, n, axis=0: _jnp.split(self, n, axis=axis)


class _TFImageShim:
    @staticmethod
    def extract_patches(images, sizes, strides, rates=None, padding="SAME"):
        k, s = sizes[1], strides[1]
        return ops.extract_patches(images, k, s, padding)


class _TFShim:
    image = _TFImageShim()


def timed(fn, *args, iters=ITERS, batch=None):
    np.asarray(fn(*args))  # compile + warm
    np.asarray(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / iters
    return (batch or BATCH) / dt


def bench_family(name, ref_fn, ours_fn):
    row = {"family": name}
    t0 = time.perf_counter()
    try:
        row["ours_img_s"] = round(ours_fn(), 1)
    except Exception as e:  # noqa: BLE001
        row["ours_error"] = f"{type(e).__name__}: {e}"
        traceback.print_exc()
    try:
        if ref_fn is not None:
            row["ref_img_s"] = round(ref_fn(), 1)
    except Exception as e:  # noqa: BLE001
        row["ref_error"] = f"{type(e).__name__}: {e}"
        traceback.print_exc()
    if "ours_img_s" in row and "ref_img_s" in row:
        row["speedup"] = round(row["ours_img_s"] / row["ref_img_s"], 2)
    row["bench_seconds"] = round(time.perf_counter() - t0, 1)
    print(json.dumps(row), flush=True)
    return row


def make_ref_runner(module_name, cls_name, cfg, img, *, mutable=(), shims=()):
    batch = img.shape[0]
    def run():
        if "split" in shims:
            _patch_array_split()
        mod = __import__(module_name)
        if "tf" in shims:
            mod.tf = _TFShim()
        model = getattr(mod, cls_name)(**cfg)
        params = jax.jit(lambda: model.init(RNGS, img[:1]))()
        if mutable:
            fn = jax.jit(lambda p, x: model.apply(p, x, rngs=RNGS, mutable=list(mutable))[0])
        else:
            fn = jax.jit(lambda p, x: model.apply(p, x, rngs=RNGS))
        # tuple outputs (LeViT distill head): detect without executing
        if isinstance(jax.eval_shape(fn, params, img), tuple):
            fn0 = fn
            fn = jax.jit(lambda p, x: fn0(p, x)[0])
        return timed(fn, params, img, batch=batch)

    return run


def make_ours_runner(cls, cfg, img, *, mutable=(), tuple_out=False, dtype="default",
                     fold_bn=False, weights_dtype=None):
    batch = img.shape[0]
    def run():
        model = cls(**cfg, dtype=(DTYPE if dtype == "default" else dtype))
        params = jax.jit(lambda: model.init({"params": jax.random.PRNGKey(1)}, img[:1]))()
        use_mutable = mutable
        if fold_bn:
            # Inference transform: BNs folded into their convs at load time
            # (utils/bn_folding.py) — the op disappears from the graph.
            from vit_tpu.utils import fold_batch_norm
            model, params = fold_batch_norm(model, jax.device_get(params))
            # fold works on host numpy; put the folded tree back on device —
            # leaving numpy leaves makes every timed call re-upload the whole
            # param tree through the tunnel (measured: cvt 3300 -> 95 img/s)
            params = jax.device_put(params)
            use_mutable = ()
        if weights_dtype is not None:
            # round 5 (tune_convhybrid_r5.py): serving the weights pre-cast
            # halves weight HBM traffic and deletes flax's per-op casts —
            # the lever that flips CvT from fp32-fastest to bf16-fastest
            # (4129 -> 4521 img/s with folded BN)
            params = jax.tree.map(
                lambda x: x.astype(weights_dtype)
                if x.dtype == jnp.float32 else x, params
            )
        if use_mutable:
            fn = jax.jit(lambda p, x: model.apply(p, x, mutable=list(use_mutable))[0])
        else:
            fn = jax.jit(lambda p, x: model.apply(p, x))
        if tuple_out:
            fn0 = fn
            fn = jax.jit(lambda p, x: fn0(p, x)[0])
        return timed(fn, params, img, batch=batch)

    return run


def main():
    only = set(sys.argv[1:])
    from vit_tpu import models as M

    key = jax.random.PRNGKey(0)

    def img(size, batch=BATCH, nchw=False):
        shape = (batch, 3, size, size) if nchw else (batch, size, size, 3)
        return jax.random.normal(key, shape, jnp.float32)

    vit_cfg = dict(image_size=256, patch_size=32, num_classes=1000, dim=1024,
                   depth=6, heads=16, mlp_dim=2048)
    families = [
        ("vit", make_ref_runner("vit", "ViT", {**vit_cfg, "dropout": 0.0, "emb_dropout": 0.0}, img(256)),
         make_ours_runner(M.ViT, vit_cfg, img(256))),
        ("simple_vit",
         make_ref_runner("simple_vit", "SimpleViT", vit_cfg, img(256, nchw=True), shims=("split",)),
         make_ours_runner(M.SimpleViT, vit_cfg, img(256))),
        ("deepvit",
         make_ref_runner("deepvit", "DeepViT", {**vit_cfg, "dropout": 0.0, "emb_dropout": 0.0}, img(256)),
         make_ours_runner(M.DeepViT, vit_cfg, img(256))),
        ("cait",
         make_ref_runner("cait", "CaiT",
                         dict(image_size=256, patch_size=32, num_classes=1000, dim=1024,
                              depth=12, cls_depth=2, heads=16, mlp_dim=2048,
                              dropout=0.0, emb_dropout=0.0, layer_dropout=0.0),
                         img(256)),
         make_ours_runner(M.CaiT,
                          dict(image_size=256, patch_size=32, num_classes=1000, dim=1024,
                               depth=12, cls_depth=2, heads=16, mlp_dim=2048),
                          img(256))),
        ("parallel_vit",
         make_ref_runner("parallel_vit", "ViT",
                         dict(image_size=256, patch_size=16, num_classes=1000, dim=1024,
                              depth=6, heads=8, mlp_dim=2048, num_parallel_branches=2,
                              dropout=0.0, emb_dropout=0.0),
                         img(256), shims=("split",)),
         make_ours_runner(M.ParallelViT,
                          dict(image_size=256, patch_size=16, num_classes=1000, dim=1024,
                               depth=6, heads=8, mlp_dim=2048, num_parallel_branches=2),
                          img(256))),
        ("patch_merger",
         make_ref_runner("patch_merger", "ViT",
                         dict(image_size=256, patch_size=16, num_classes=1000, dim=1024,
                              depth=12, heads=8, patch_merge_layer=6, mlp_dim=2048,
                              dropout=0.0, emb_dropout=0.0),
                         img(256), shims=("split",)),
         make_ours_runner(M.PatchMergerViT,
                          dict(image_size=256, patch_size=16, num_classes=1000, dim=1024,
                               depth=12, heads=8, patch_merge_layer=6, mlp_dim=2048),
                          img(256))),
        ("vit_small_datasets",
         make_ref_runner("vit_small_datasets", "ViT",
                         dict(image_size=256, patch_size=16, num_classes=1000, dim=1024,
                              depth=6, heads=16, mlp_dim=2048, dropout=0.0, emb_dropout=0.0),
                         img(256)),
         make_ours_runner(M.ViTSmallDatasets,
                          dict(image_size=256, patch_size=16, num_classes=1000, dim=1024,
                               depth=6, heads=16, mlp_dim=2048),
                          img(256))),
        ("cross_vit",
         make_ref_runner("cross_vit", "CrossViT",
                         dict(image_size=256, num_classes=1000, depth=4,
                              sm_dim=192, sm_patch_size=16, sm_enc_depth=2, sm_enc_heads=8, sm_enc_mlp_dim=2048,
                              lg_dim=384, lg_patch_size=64, lg_enc_depth=3, lg_enc_heads=8, lg_enc_mlp_dim=2048,
                              cross_attn_depth=2, cross_attn_heads=8,
                              dropout=0.0, emb_dropout=0.0),
                         img(256)),
         make_ours_runner(M.CrossViT,
                          dict(image_size=256, num_classes=1000, depth=4,
                               sm_dim=192, sm_patch_size=16, sm_enc_depth=2, sm_enc_heads=8, sm_enc_mlp_dim=2048,
                               lg_dim=384, lg_patch_size=64, lg_enc_depth=3, lg_enc_heads=8, lg_enc_mlp_dim=2048,
                               cross_attn_depth=2, cross_attn_heads=8),
                          img(256))),
        ("cvt",
         make_ref_runner("cvt", "CvT", dict(num_classes=1000, dropout=0.0), img(256),
                         mutable=("batch_stats",)),
         make_ours_runner(M.CvT, dict(num_classes=1000), img(256), dtype=DTYPE,
                          fold_bn=True, weights_dtype=DTYPE)),
        ("levit",
         make_ref_runner("levit", "LeViT",
                         dict(image_size=224, num_classes=1000, stages=3, dim=(256, 384, 512),
                              depth=4, heads=(4, 6, 8), mlp_mult=2, dropout=0.0),
                         img(224), mutable=("batch_stats",)),
         make_ours_runner(M.LeViT,
                          dict(image_size=224, num_classes=1000, stages=3, dim=(256, 384, 512),
                               depth=4, heads=(4, 6, 8), mlp_mult=2),
                          img(224), dtype=None, fold_bn=True)),
        ("nest",
         make_ref_runner("nest", "NesT",
                         dict(image_size=224, patch_size=4, dim=96, heads=3,
                              num_hierarchies=3, block_repeats=(2, 2, 8), num_classes=1000),
                         img(224)),
         make_ours_runner(M.NesT,
                          dict(image_size=224, patch_size=4, dim=96, heads=3,
                               num_hierarchies=3, block_repeats=(2, 2, 8), num_classes=1000),
                          img(224))),
        ("pit",
         make_ref_runner("pit", "PiT",
                         dict(image_size=224, patch_size=14, dim=256, num_classes=1000,
                              depth=(3, 3, 3), heads=16, mlp_dim=2048,
                              dropout=0.0, emb_dropout=0.0),
                         img(224), shims=("tf",)),
         make_ours_runner(M.PiT,
                          dict(image_size=224, patch_size=14, dim=256, num_classes=1000,
                               depth=(3, 3, 3), heads=16, mlp_dim=2048),
                          img(224))),
        ("t2t",
         make_ref_runner("t2t", "T2TViT",
                         dict(dim=512, image_size=224, depth=5, heads=8, mlp_dim=512,
                              num_classes=1000, t2t_layers=((7, 4), (3, 2), (3, 2))),
                         img(224), shims=("tf",)),
         make_ours_runner(M.T2TViT,
                          dict(dim=512, image_size=224, depth=5, heads=8, mlp_dim=512,
                               num_classes=1000, t2t_layers=((7, 4), (3, 2), (3, 2))),
                          img(224))),
        ("twins_svt",
         make_ref_runner("twins_svt", "TwinsSVT", dict(num_classes=1000, dropout=0.0), img(224)),
         make_ours_runner(M.TwinsSVT, dict(num_classes=1000), img(224))),
        ("scalable_vit",
         make_ref_runner("scalable_vit", "ScalableViT",
                         dict(num_classes=1000, dim=64, heads=(2, 4, 8, 16), depth=(2, 2, 20, 2),
                              ssa_dim_key=(40, 40, 40, 32), reduction_factor=(8, 4, 2, 1),
                              window_size=(64, 32, None, None), dropout=0.0),
                         # fp32 reference OOMs HBM at batch 128 (16.34G > 15.75G)
                         img(256, batch=64)),
         make_ours_runner(M.ScalableViT,
                          dict(num_classes=1000, dim=64, heads=(2, 4, 8, 16), depth=(2, 2, 20, 2),
                               ssa_dim_key=(40, 40, 40, 32), reduction_factor=(8, 4, 2, 1),
                               window_size=(64, 32, None, None)),
                          img(256, batch=64))),
        ("region_vit",
         make_ref_runner("region_vit_flax", "RegionViT",
                         dict(dim=(64, 128, 256, 512), depth=(2, 2, 8, 2), window_size=7,
                              num_classes=1000, tokenize_local_3_conv=False, use_peg=False),
                         img(224)),
         make_ours_runner(M.RegionViT,
                          dict(dim=(64, 128, 256, 512), depth=(2, 2, 8, 2), window_size=7,
                               num_classes=1000, reference_quirks=True),
                          img(224))),
        ("crossformer",
         make_ref_runner("crossformer", "CrossFormer",
                         dict(dim=(64, 128, 256, 512), depth=(2, 2, 8, 2),
                              global_window_size=(8, 4, 2, 1), local_window_size=7),
                         img(224)),
         make_ours_runner(M.CrossFormer,
                          dict(dim=(64, 128, 256, 512), depth=(2, 2, 8, 2),
                               global_window_size=(8, 4, 2, 1), local_window_size=7),
                          img(224))),
        # efficient.py is broken as-published (undefined self.emb_dropout,
        # efficient.py:47) — ours-only, with a vanilla 6-deep injected encoder
        ("efficient", None,
         make_ours_runner(
             M.EfficientViT,
             dict(image_size=256, patch_size=32, num_classes=1000, dim=512,
                  transformer=__import__("vit_tpu.nn.blocks", fromlist=["Transformer"]).Transformer(
                      dim=512, depth=6, heads=8, dim_head=64, mlp_dim=2048, dtype=DTYPE)),
             img(256))),
    ]

    rows = []
    for name, ref_fn, ours_fn in families:
        if only and name not in only:
            continue
        rows.append(bench_family(name, ref_fn, ours_fn))

    # merge-rewrite: one row per family, newest wins — append mode left
    # stale contradictory generations in the committed artifact
    path = "/root/repo/PERF_ZOO.json"
    merged = {}
    try:
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line:
                    d = json.loads(line)
                    merged[d["family"]] = d
    except FileNotFoundError:
        pass
    for r in rows:
        merged[r["family"]] = r
    with open(path, "w") as f:
        for r in merged.values():
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
