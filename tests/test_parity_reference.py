"""Logit parity against the reference implementation on identical weights.

The reference runs in this environment (SURVEY.md §6.2); its ViT params are
imported into our layout and logits compared with dropout 0 (the reference
hardcodes training-mode dropout, so rate must be 0 for determinism)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "/root/reference/vit_flax")

from vit_tpu.models import ViT
from vit_tpu.utils import import_reference_vit_params

CFG = dict(image_size=64, patch_size=16, num_classes=10, dim=64, depth=3,
           heads=4, mlp_dim=128)


@pytest.fixture(scope="module")
def reference_vit():
    ref_vit = pytest.importorskip("vit")
    model = ref_vit.ViT(**CFG, dropout=0.0, emb_dropout=0.0)
    img = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3))
    rngs = {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2),
            "emb_dropout": jax.random.PRNGKey(3)}
    params = model.init(rngs, img)
    logits = model.apply(params, img, rngs=rngs)
    return params, img, logits


def test_vit_logit_parity(reference_vit):
    ref_params, img, ref_logits = reference_vit
    ours = ViT(**CFG)
    params = import_reference_vit_params(ref_params, CFG["depth"])
    our_logits = ours.apply(params, img)
    np.testing.assert_allclose(
        np.asarray(our_logits), np.asarray(ref_logits), atol=2e-5, rtol=2e-4
    )


def test_deepvit_logit_parity():
    ref_mod = pytest.importorskip("deepvit")
    from vit_tpu.models import DeepViT
    from vit_tpu.utils import import_reference_deepvit_params

    cfg = dict(image_size=64, patch_size=16, num_classes=10, dim=64, depth=2,
               heads=4, mlp_dim=128)
    model = ref_mod.DeepViT(**cfg, dropout=0.0, emb_dropout=0.0)
    img = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3))
    rngs = {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)}
    ref_params = model.init(rngs, img)
    ref_logits = model.apply(ref_params, img, rngs=rngs)

    ours = DeepViT(**cfg)
    params = import_reference_deepvit_params(ref_params, cfg["depth"])
    our_logits = ours.apply(params, img)
    np.testing.assert_allclose(
        np.asarray(our_logits), np.asarray(ref_logits), atol=2e-5, rtol=2e-4
    )


def test_lsa_spt_logit_parity():
    ref_mod = pytest.importorskip("vit_small_datasets")
    from vit_tpu.models import ViTSmallDatasets
    from vit_tpu.utils import import_reference_lsa_params

    cfg = dict(image_size=64, patch_size=16, num_classes=10, dim=64, depth=2,
               heads=4, mlp_dim=128)
    model = ref_mod.ViT(**cfg, dropout=0.0, emb_dropout=0.0)
    img = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3))
    rngs = {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)}
    ref_params = model.init(rngs, img)
    ref_logits = model.apply(ref_params, img, rngs=rngs)

    ours = ViTSmallDatasets(**cfg)
    params = import_reference_lsa_params(ref_params, cfg["depth"], dim_head=64)
    our_logits = ours.apply(params, img)
    # reference PreNorm eps is 1e-5 vs our 1e-6; tolerance covers it
    np.testing.assert_allclose(
        np.asarray(our_logits), np.asarray(ref_logits), atol=5e-4, rtol=1e-3
    )


def test_simple_vit_logit_parity():
    """The reference simple_vit crashes on modern JAX (removed Array.split
    method, bug register #12); a shim restores it so the obvious-intent
    behavior can serve as the parity golden (SURVEY.md §4)."""
    import jax.numpy as _jnp
    from jax._src.array import ArrayImpl
    from jax._src.core import Tracer

    ArrayImpl.split = lambda self, n, axis=0: _jnp.split(self, n, axis=axis)
    Tracer.split = lambda self, n, axis=0: _jnp.split(self, n, axis=axis)

    ref_mod = pytest.importorskip("simple_vit")
    from vit_tpu.models import SimpleViT
    from vit_tpu.utils import import_reference_simple_vit_params

    cfg = dict(image_size=64, patch_size=16, num_classes=10, dim=64, depth=2,
               heads=4, mlp_dim=128)
    model = ref_mod.SimpleViT(**cfg)
    img_nchw = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 64, 64))
    ref_params = model.init({"params": jax.random.PRNGKey(1)}, img_nchw)
    ref_logits = model.apply(ref_params, img_nchw)

    ours = SimpleViT(**cfg, channels_first=True)
    params = import_reference_simple_vit_params(ref_params, cfg["depth"])
    our_logits = ours.apply(params, img_nchw)
    np.testing.assert_allclose(
        np.asarray(our_logits), np.asarray(ref_logits), atol=5e-4, rtol=1e-3
    )


def _patch_array_split():
    import jax.numpy as _jnp
    from jax._src.array import ArrayImpl
    from jax._src.core import Tracer

    ArrayImpl.split = lambda self, n, axis=0: _jnp.split(self, n, axis=axis)
    Tracer.split = lambda self, n, axis=0: _jnp.split(self, n, axis=axis)


def test_parallel_vit_logit_parity():
    _patch_array_split()
    ref_mod = pytest.importorskip("parallel_vit")
    from vit_tpu.models import ParallelViT
    from vit_tpu.utils.importer import import_reference_parallel_vit_params

    cfg = dict(image_size=64, patch_size=16, num_classes=10, dim=64, depth=2,
               heads=4, mlp_dim=128, num_parallel_branches=2)
    model = ref_mod.ViT(**cfg, dropout=0.0, emb_dropout=0.0)
    img = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3))
    rngs = {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)}
    ref_params = model.init(rngs, img)
    ref_logits = model.apply(ref_params, img, rngs=rngs)

    ours = ParallelViT(**cfg)
    params = import_reference_parallel_vit_params(ref_params, cfg["depth"], 2)
    our_logits = ours.apply(params, img)
    np.testing.assert_allclose(
        np.asarray(our_logits), np.asarray(ref_logits), atol=5e-4, rtol=1e-3
    )


def test_patch_merger_logit_parity():
    _patch_array_split()
    ref_mod = pytest.importorskip("patch_merger")
    from vit_tpu.models import PatchMergerViT
    from vit_tpu.utils.importer import import_reference_patch_merger_params

    cfg = dict(image_size=64, patch_size=16, num_classes=10, dim=64, depth=2,
               heads=4, mlp_dim=128, patch_merge_layer=1, patch_merge_num_tokens=4)
    model = ref_mod.ViT(**cfg, dropout=0.0, emb_dropout=0.0)
    img = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3))
    rngs = {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)}
    ref_params = model.init(rngs, img)
    ref_logits = model.apply(ref_params, img, rngs=rngs)

    ours = PatchMergerViT(**cfg)
    params = import_reference_patch_merger_params(ref_params, cfg["depth"], 1, 4)
    our_logits = ours.apply(params, img)
    np.testing.assert_allclose(
        np.asarray(our_logits), np.asarray(ref_logits), atol=5e-4, rtol=1e-3
    )


def test_cait_logit_parity():
    ref_mod = pytest.importorskip("cait")
    from vit_tpu.models import CaiT
    from vit_tpu.utils.importer import import_reference_cait_params

    cfg = dict(image_size=64, patch_size=16, num_classes=10, dim=64, depth=2,
               cls_depth=2, heads=4, mlp_dim=128)
    model = ref_mod.CaiT(**cfg, dropout=0.0, emb_dropout=0.0, layer_dropout=0.0)
    img = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3))
    rngs = {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)}
    ref_params = model.init(rngs, img)
    ref_logits = model.apply(ref_params, img, rngs=rngs)

    ours = CaiT(**cfg)
    params = import_reference_cait_params(ref_params, cfg["depth"], cfg["cls_depth"])
    our_logits = ours.apply(params, img)
    np.testing.assert_allclose(
        np.asarray(our_logits), np.asarray(ref_logits), atol=5e-4, rtol=1e-3
    )


def test_t2t_logit_parity():
    """End-to-end check that the in-graph overlapping-patch gather matches
    the reference's host-side tf.image.extract_patches exactly (the
    tokenizer output feeds the same weights)."""
    ref_mod = pytest.importorskip("t2t")
    from vit_tpu.models import T2TViT
    from vit_tpu.utils.importer import import_reference_t2t_params

    cfg = dict(image_size=64, num_classes=10, dim=64, depth=2, heads=2,
               mlp_dim=128)
    model = ref_mod.T2TViT(**cfg, dropout=0.0, emb_dropout=0.0)
    img = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3))
    rngs = {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)}
    ref_params = model.init(rngs, img)
    ref_logits = model.apply(ref_params, img, rngs=rngs)

    ours = T2TViT(**cfg)
    params = import_reference_t2t_params(ref_params, cfg["depth"])
    our_logits = ours.apply(params, img)
    np.testing.assert_allclose(
        np.asarray(our_logits), np.asarray(ref_logits), atol=5e-4, rtol=1e-3
    )


def test_pit_logit_parity_single_stage():
    ref_mod = pytest.importorskip("pit")
    from vit_tpu.models import PiT
    from vit_tpu.utils.importer import import_reference_pit_params

    cfg = dict(image_size=64, patch_size=8, num_classes=10, dim=64,
               depth=(2,), heads=2, mlp_dim=128)
    model = ref_mod.PiT(**cfg, dropout=0.0, emb_dropout=0.0)
    img = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3))
    rngs = {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)}
    ref_params = model.init(rngs, img)
    ref_logits = model.apply(ref_params, img, rngs=rngs)

    ours = PiT(**cfg)
    params = import_reference_pit_params(ref_params, 2)
    our_logits = ours.apply(params, img)
    np.testing.assert_allclose(
        np.asarray(our_logits), np.asarray(ref_logits), atol=5e-4, rtol=1e-3
    )


def test_cross_vit_logit_parity():
    ref_mod = pytest.importorskip("cross_vit")
    from vit_tpu.models import CrossViT
    from vit_tpu.utils.importer import import_reference_cross_vit_params

    cfg = dict(image_size=64, num_classes=10, sm_dim=32, lg_dim=64, sm_patch_size=8,
               lg_patch_size=16, sm_enc_depth=1, lg_enc_depth=2, sm_enc_mlp_dim=64,
               lg_enc_mlp_dim=128, cross_attn_depth=2, depth=1, sm_enc_heads=2,
               lg_enc_heads=2, cross_attn_heads=2, sm_enc_dim_head=16,
               lg_enc_dim_head=16, cross_attn_dim_head=16)
    model = ref_mod.CrossViT(**cfg, dropout=0.0, emb_dropout=0.0)
    img = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3))
    rngs = {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)}
    ref_params = model.init(rngs, img)
    ref_logits = model.apply(ref_params, img, rngs=rngs)

    ours = CrossViT(**cfg)
    params = import_reference_cross_vit_params(
        ref_params, depth=1, sm_enc_depth=1, lg_enc_depth=2, cross_attn_depth=2
    )
    our_logits = ours.apply(params, img)
    np.testing.assert_allclose(
        np.asarray(our_logits), np.asarray(ref_logits), atol=5e-4, rtol=1e-3
    )


def test_twins_svt_logit_parity():
    ref_mod = pytest.importorskip("twins_svt")
    from vit_tpu.models import TwinsSVT
    from vit_tpu.utils.importer import import_reference_twins_params

    cfg = dict(num_classes=10, s1_emb_dim=16, s1_depth=1, s2_emb_dim=16,
               s2_depth=1, s3_emb_dim=32, s3_depth=1, s4_emb_dim=32, s4_depth=1)
    model = ref_mod.TwinsSVT(**cfg)
    img = jax.random.normal(jax.random.PRNGKey(0), (1, 224, 224, 3))
    rngs = {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)}
    ref_params = model.init(rngs, img)
    ref_logits = model.apply(ref_params, img, rngs=rngs)

    ours = TwinsSVT(**cfg)
    params = import_reference_twins_params(ref_params, depths=(1, 1, 1, 1))
    our_logits = ours.apply(params, img)
    np.testing.assert_allclose(
        np.asarray(our_logits), np.asarray(ref_logits), atol=1e-3, rtol=2e-3
    )


def test_nest_logit_parity():
    ref_mod = pytest.importorskip("nest")
    from vit_tpu.models import NesT
    from vit_tpu.utils.importer import import_reference_nest_params

    cfg = dict(image_size=32, patch_size=4, num_classes=10, dim=32, heads=2,
               num_hierarchies=2, block_repeats=(1, 1))
    model = ref_mod.NesT(**cfg)
    img = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3))
    rngs = {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)}
    ref_params = model.init(rngs, img)
    ref_logits = model.apply(ref_params, img, rngs=rngs)

    ours = NesT(**cfg)
    params = import_reference_nest_params(ref_params, 2, (1, 1), (4, 4))
    our_logits = ours.apply(params, img)
    np.testing.assert_allclose(
        np.asarray(our_logits), np.asarray(ref_logits), atol=1e-3, rtol=2e-3
    )


def test_scalable_vit_logit_parity():
    ref_mod = pytest.importorskip("scalable_vit")
    from vit_tpu.models import ScalableViT
    from vit_tpu.utils.importer import import_reference_scalable_vit_params

    cfg = dict(num_classes=10, dim=32, depth=(1, 1), heads=(2, 4),
               reduction_factor=(2, 1), window_size=(4, None),
               ssa_dim_key=16, ssa_dim_value=16, iwsa_dim_key=16, iwsa_dim_value=16)
    model = ref_mod.ScalableViT(**cfg)
    img = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3))
    rngs = {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)}
    ref_params = model.init(rngs, img)
    ref_logits = model.apply(ref_params, img, rngs=rngs)

    # reference_block_order reproduces the tuple-unpack execution order
    ours = ScalableViT(**cfg, reference_block_order=True)
    params = import_reference_scalable_vit_params(ref_params, (1, 1))
    our_logits = ours.apply(params, img)
    np.testing.assert_allclose(
        np.asarray(our_logits), np.asarray(ref_logits), atol=1e-3, rtol=2e-3
    )


def test_cvt_logit_parity_train_mode_bn():
    ref_mod = pytest.importorskip("cvt")
    from vit_tpu.models import CvT
    from vit_tpu.utils.importer import import_reference_cvt_params

    cfg = dict(num_classes=10, s1_emb_dim=16, s1_depth=1, s2_emb_dim=32,
               s2_depth=1, s3_emb_dim=32, s3_depth=1, s3_heads=2)
    model = ref_mod.CvT(**cfg)
    img = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    rngs = {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)}
    ref_vars = model.init(rngs, img)
    ref_logits, _ = model.apply(ref_vars, img, mutable=["batch_stats"], rngs=rngs)

    ours = CvT(**cfg)
    variables = import_reference_cvt_params(ref_vars, depths=(1, 1, 1))
    our_logits, _ = ours.apply(
        variables, img, True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(3)},
    )
    np.testing.assert_allclose(
        np.asarray(our_logits), np.asarray(ref_logits), atol=1e-3, rtol=2e-3
    )


def test_levit_logit_parity_train_mode_bn():
    ref_mod = pytest.importorskip("levit")
    from vit_tpu.models import LeViT
    from vit_tpu.utils.importer import import_reference_levit_params

    cfg = dict(image_size=64, num_classes=10, stages=2, dim=(16, 16), depth=1,
               heads=(1, 2), mlp_mult=2, dim_key=16, dim_value=16,
               num_distill_classes=5)
    model = ref_mod.LeViT(**cfg)
    img = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3))
    rngs = {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)}
    ref_vars = model.init(rngs, img)
    (ref_out, ref_distill), _ = model.apply(
        ref_vars, img, mutable=["batch_stats"], rngs=rngs
    )

    ours = LeViT(**cfg)
    variables = import_reference_levit_params(ref_vars, 2, (1, 1), dim_key=16)
    (our_out, our_distill), _ = ours.apply(
        variables, img, True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(3)},
    )
    np.testing.assert_allclose(np.asarray(our_out), np.asarray(ref_out),
                               atol=1e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(our_distill), np.asarray(ref_distill),
                               atol=1e-3, rtol=2e-3)


def test_scalable_vit_logit_parity_scanned_depth():
    """Depth > 2 exercises the scanned stage blocks + stacked import."""
    ref_mod = pytest.importorskip("scalable_vit")
    from vit_tpu.models import ScalableViT
    from vit_tpu.utils.importer import import_reference_scalable_vit_params

    cfg = dict(num_classes=10, dim=32, depth=(3,), heads=(2,),
               reduction_factor=(2,), window_size=(4,),
               ssa_dim_key=16, ssa_dim_value=16, iwsa_dim_key=16, iwsa_dim_value=16)
    model = ref_mod.ScalableViT(**cfg)
    img = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3))
    rngs = {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)}
    ref_params = model.init(rngs, img)
    ref_logits = model.apply(ref_params, img, rngs=rngs)

    ours = ScalableViT(**cfg, reference_block_order=True)
    params = import_reference_scalable_vit_params(ref_params, (3,))
    our_logits = ours.apply(params, img)
    np.testing.assert_allclose(
        np.asarray(our_logits), np.asarray(ref_logits), atol=1e-3, rtol=2e-3
    )


def test_twins_svt_logit_parity_scanned_depth():
    """Stage depth > 1 exercises the scanned Twins layers + stacked import."""
    ref_mod = pytest.importorskip("twins_svt")
    from vit_tpu.models import TwinsSVT
    from vit_tpu.utils.importer import import_reference_twins_params

    cfg = dict(num_classes=10, s1_emb_dim=16, s1_depth=1, s2_emb_dim=16,
               s2_depth=1, s3_emb_dim=32, s3_depth=2, s4_emb_dim=32, s4_depth=2)
    model = ref_mod.TwinsSVT(**cfg)
    img = jax.random.normal(jax.random.PRNGKey(0), (1, 224, 224, 3))
    rngs = {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)}
    ref_params = model.init(rngs, img)
    ref_logits = model.apply(ref_params, img, rngs=rngs)

    ours = TwinsSVT(**cfg)
    params = import_reference_twins_params(ref_params, depths=(1, 1, 2, 2))
    our_logits = ours.apply(params, img)
    np.testing.assert_allclose(
        np.asarray(our_logits), np.asarray(ref_logits), atol=1e-3, rtol=2e-3
    )


def test_crossformer_logit_parity_reference_quirks():
    """reference_quirks=True reproduces the reference's DPB (scalar bias,
    misindexed offset gather) so imported weights match exactly."""
    ref_mod = pytest.importorskip("crossformer")
    from vit_tpu.models import CrossFormer
    from vit_tpu.utils.importer import import_reference_crossformer_params

    cfg = dict(num_classes=10, dim=(32, 64, 64, 64), depth=(1, 2, 1, 1),
               global_window_size=(4, 2, 2, 1), local_window_size=7)
    model = ref_mod.CrossFormer(**cfg)
    img = jax.random.normal(jax.random.PRNGKey(0), (1, 224, 224, 3))
    rngs = {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)}
    ref_params = model.init(rngs, img)
    ref_logits = model.apply(ref_params, img, rngs=rngs)

    ours = CrossFormer(**cfg, reference_quirks=True)
    params = import_reference_crossformer_params(ref_params, depths=(1, 2, 1, 1))
    our_logits = ours.apply(params, img)
    np.testing.assert_allclose(
        np.asarray(our_logits), np.asarray(ref_logits), atol=1e-3, rtol=2e-3
    )


def test_vit_logit_parity_bf16(reference_vit):
    """bf16 compute on imported fp32 weights: max-logit error within the
    BASELINE.json tolerance (<=1e-2 scale; tiny-config logits are O(1))."""
    ref_params, img, ref_logits = reference_vit
    ours = ViT(**CFG, dtype=jnp.bfloat16)
    params = import_reference_vit_params(ref_params, CFG["depth"])
    our_logits = ours.apply(params, img.astype(jnp.bfloat16))
    err = np.max(np.abs(np.asarray(our_logits, np.float32) - np.asarray(ref_logits)))
    assert err <= 5e-2, f"bf16 max-logit error {err}"


def test_region_vit_reference_is_nan_on_modern_jax_ours_is_finite():
    """The reference's rel-pos gather indexes its 169-entry table far out
    of range (window ratio is 4x the table's window,
    region_vit_flax.py:130-149); modern JAX on CPU fills out-of-bounds
    gathers with NaN, so the un-shimmed reference returns all-NaN logits
    (with the wrong rank, region_vit_flax.py:254-256) here. On TPU the
    gather clamps instead — that execution is reproduced and parity-tested
    by test_region_vit_logit_parity_reference_quirks below; the default
    build fixes the architecture (finite 2-D logits)."""
    ref_mod = pytest.importorskip("region_vit_flax")
    from vit_tpu.models import RegionViT

    cfg = dict(dim=(16, 16, 32, 32), depth=(1, 1, 1, 1), window_size=7, num_classes=10)
    img = jax.random.normal(jax.random.PRNGKey(0), (1, 224, 224, 3))
    rngs = {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)}
    ref_model = ref_mod.RegionViT(**cfg)
    ref_out = ref_model.apply(ref_model.init(rngs, img), img, rngs=rngs)
    assert ref_out.ndim == 4  # broken rank (bug register #3)
    assert bool(jnp.isnan(ref_out).all())  # NaN everywhere (OOB gather fill)

    ours = RegionViT(**cfg)
    out = ours.apply(ours.init({"params": jax.random.PRNGKey(1)}, img), img)
    assert out.shape == (1, 10)
    assert bool(jnp.isfinite(out).all())


def test_region_vit_logit_parity_reference_quirks():
    """Imported-weight parity for the 17th family (VERDICT r1 item 5).

    The reference's rel-pos gather runs far out of its 169-entry table
    (window ratio is 4x the declared window, region_vit_flax.py:130-149).
    On TPU, XLA gathers CLAMP out-of-bounds indices — the reference
    executes there with finite (wrong-rank) logits (SURVEY §6.2) — while
    modern JAX on CPU fills NaN. This test emulates the TPU execution on
    the CPU test mesh by clamping the reference's embed lookups (a shim on
    the reference module's `nn` symbol only), then checks our
    ``reference_quirks=True`` model on imported weights reproduces those
    logits, including the 4-D unpooled logit map."""
    ref_mod = pytest.importorskip("region_vit_flax")
    import flax.linen as fnn

    from vit_tpu.models import RegionViT
    from vit_tpu.utils.importer import import_reference_region_vit_params

    class Embed(fnn.Embed):  # noqa: N801 — must auto-name params "Embed_0"
        """nn.Embed with TPU gather semantics (clamp, not NaN-fill)."""

        def __call__(self, inputs):
            inputs = jnp.clip(inputs, 0, self.num_embeddings - 1)
            return super().__call__(inputs)

    _clamped_embed = Embed

    class _NNShim:
        Embed = _clamped_embed

        def __getattr__(self, name):
            return getattr(fnn, name)

    cfg = dict(dim=(16, 16, 32, 32), depth=(1, 1, 2, 1), window_size=7,
               num_classes=10)
    img = jax.random.normal(jax.random.PRNGKey(0), (1, 224, 224, 3))
    rngs = {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)}

    old_nn = ref_mod.nn
    ref_mod.nn = _NNShim()
    try:
        ref_model = ref_mod.RegionViT(**cfg)
        ref_params = ref_model.init(rngs, img)
        ref_logits = ref_model.apply(ref_params, img, rngs=rngs)
    finally:
        ref_mod.nn = old_nn
    assert ref_logits.ndim == 4  # the reference's unpooled logit map
    assert bool(jnp.isfinite(ref_logits).all())  # clamped = TPU behavior

    ours = RegionViT(**cfg, reference_quirks=True)
    params = import_reference_region_vit_params(ref_params, depths=cfg["depth"])
    our_logits = ours.apply(params, img)
    assert our_logits.shape == ref_logits.shape
    np.testing.assert_allclose(
        np.asarray(our_logits), np.asarray(ref_logits), atol=1e-3, rtol=2e-3
    )
