import os, sys
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/scripts")
import jax, jax.numpy as jnp
from r3util import probe_ms
from vit_tpu.utils import enable_compilation_cache
enable_compilation_cache()
print(f"# probe {probe_ms():.1f} ms", flush=True)
from vit_tpu.models import CrossViT, PatchMergerViT

BATCH, ITERS = 128, 10
from r3util import timed_batch

cfgs = {
  "cross_vit": (CrossViT, dict(image_size=256, num_classes=1000, depth=4,
      sm_dim=192, sm_patch_size=16, sm_enc_depth=2, sm_enc_heads=8, sm_enc_mlp_dim=2048,
      lg_dim=384, lg_patch_size=64, lg_enc_depth=3, lg_enc_heads=8, lg_enc_mlp_dim=2048,
      cross_attn_depth=2, cross_attn_heads=8, dtype=jnp.bfloat16), 256),
  "patch_merger": (PatchMergerViT, dict(image_size=256, patch_size=16, num_classes=1000,
      dim=1024, depth=12, heads=8, mlp_dim=2048, patch_merge_layer=6,
      patch_merge_num_tokens=8, dtype=jnp.bfloat16), 256),
}
for name, (cls, kw, sz) in cfgs.items():
    model = cls(**kw)
    img = jax.random.normal(jax.random.PRNGKey(0), (BATCH, sz, sz, 3), jnp.float32)
    v = jax.jit(lambda: model.init({"params": jax.random.PRNGKey(1)}, img[:1]))()
    f_pack = jax.jit(lambda p, x: model.apply(p, x))
    dt = timed_batch(f_pack, v, img, iters=ITERS)
    print(f"{name:13s} packed   {dt*1e3:7.2f} ms  {BATCH/dt:8.1f} img/s", flush=True)
    os.environ["VIT_TPU_NO_PACK"] = "1"
    try:
        f_nopack = jax.jit(lambda p, x: model.apply(p, x) + 0)
        dt = timed_batch(f_nopack, v, img, iters=ITERS)
        print(f"{name:13s} unpacked {dt*1e3:7.2f} ms  {BATCH/dt:8.1f} img/s", flush=True)
    finally:
        os.environ.pop("VIT_TPU_NO_PACK", None)
