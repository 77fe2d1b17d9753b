"""Model zoo: the 17 reference families, one framework.

Constructor signatures mirror the reference files (SURVEY.md §2.1) so
reference users can switch by changing the import. ``MODEL_REGISTRY`` maps
reference-style names to (class, tiny smoke config, image size) tuples used
by the test suite and benchmarks.
"""

from vit_tpu.models.cait import CaiT
from vit_tpu.models.cross_vit import CrossViT
from vit_tpu.models.crossformer import CrossFormer
from vit_tpu.models.cvt import CvT
from vit_tpu.models.deepvit import DeepViT
from vit_tpu.models.efficient import EfficientViT
from vit_tpu.models.levit import LeViT
from vit_tpu.models.nest import NesT
from vit_tpu.models.parallel_vit import ParallelViT
from vit_tpu.models.patch_merger import PatchMergerViT
from vit_tpu.models.pit import PiT
from vit_tpu.models.region_vit import RegionViT
from vit_tpu.models.scalable_vit import ScalableViT
from vit_tpu.models.simple_vit import SimpleViT
from vit_tpu.models.t2t import T2TViT
from vit_tpu.models.twins_svt import TwinsSVT
from vit_tpu.models.vit import ViT
from vit_tpu.models.vit_small_datasets import ViTSmallDatasets
from vit_tpu.nn.blocks import Transformer as _Transformer
from vit_tpu.nn.embed import SPT, PatchMerger

__all__ = [
    "CaiT",
    "CrossFormer",
    "CrossViT",
    "CvT",
    "DeepViT",
    "EfficientViT",
    "LeViT",
    "NesT",
    "ParallelViT",
    "PatchMerger",
    "PatchMergerViT",
    "PiT",
    "RegionViT",
    "SPT",
    "ScalableViT",
    "SimpleViT",
    "T2TViT",
    "TwinsSVT",
    "ViT",
    "ViTSmallDatasets",
    "MODEL_REGISTRY",
]

# name -> (class, tiny smoke config, image size)
MODEL_REGISTRY = {
    "vit": (
        ViT,
        dict(image_size=64, patch_size=16, num_classes=10, dim=64, depth=2, heads=4,
             mlp_dim=128, dim_head=16),
        64,
    ),
    "simple_vit": (
        SimpleViT,
        dict(image_size=64, patch_size=16, num_classes=10, dim=64, depth=2, heads=4,
             mlp_dim=128, dim_head=16),
        64,
    ),
    "deepvit": (
        DeepViT,
        dict(image_size=64, patch_size=16, num_classes=10, dim=64, depth=2, heads=4,
             mlp_dim=128, dim_head=16),
        64,
    ),
    "parallel_vit": (
        ParallelViT,
        dict(image_size=64, patch_size=16, num_classes=10, dim=64, depth=2, heads=4,
             mlp_dim=128, dim_head=16, num_parallel_branches=2),
        64,
    ),
    "patch_merger_vit": (
        PatchMergerViT,
        dict(image_size=64, patch_size=16, num_classes=10, dim=64, depth=4, heads=4,
             mlp_dim=128, dim_head=16, patch_merge_layer=2, patch_merge_num_tokens=4),
        64,
    ),
    "cait": (
        CaiT,
        dict(image_size=64, patch_size=16, num_classes=10, dim=64, depth=2, cls_depth=1,
             heads=4, mlp_dim=128, dim_head=16),
        64,
    ),
    "vit_small_datasets": (
        ViTSmallDatasets,
        dict(image_size=64, patch_size=16, num_classes=10, dim=64, depth=2, heads=4,
             mlp_dim=128, dim_head=16),
        64,
    ),
    "cross_vit": (
        CrossViT,
        dict(image_size=64, num_classes=10, sm_dim=32, lg_dim=64, sm_patch_size=8,
             lg_patch_size=16, sm_enc_depth=1, lg_enc_depth=1, sm_enc_mlp_dim=64,
             lg_enc_mlp_dim=128, cross_attn_depth=1, depth=1, sm_enc_heads=2,
             lg_enc_heads=2, cross_attn_heads=2, sm_enc_dim_head=16, lg_enc_dim_head=16,
             cross_attn_dim_head=16, dropout=0.0, emb_dropout=0.0),
        64,
    ),
    "crossformer": (
        CrossFormer,
        dict(num_classes=10, dim=(32, 64), depth=(1, 1), global_window_size=(4, 2),
             local_window_size=7, cross_embed_kernel_sizes=((4, 8), (2, 4)),
             cross_embed_strides=(4, 2)),
        112,
    ),
    "twins_svt": (
        TwinsSVT,
        dict(num_classes=10, s1_emb_dim=16, s1_depth=1, s1_local_patch_size=4,
             s1_global_k=4, s2_emb_dim=16, s2_depth=1, s2_local_patch_size=4,
             s2_global_k=4, s3_emb_dim=32, s3_depth=1, s3_local_patch_size=4,
             s3_global_k=2, s4_emb_dim=32, s4_depth=1, s4_global_k=2),
        64,
    ),
    "nest": (
        NesT,
        dict(image_size=32, patch_size=4, num_classes=10, dim=32, heads=2,
             num_hierarchies=2, block_repeats=(1, 1)),
        32,
    ),
    "scalable_vit": (
        ScalableViT,
        dict(num_classes=10, dim=32, depth=(1, 1), heads=(2, 4),
             reduction_factor=(2, 1), window_size=(4, None),
             ssa_dim_key=16, ssa_dim_value=16, iwsa_dim_key=16, iwsa_dim_value=16),
        64,
    ),
    "region_vit": (
        RegionViT,
        dict(num_classes=10, dim=(32, 64), depth=(1, 1), window_size=7,
             local_patch_size=4, use_peg=True),
        112,
    ),
    "cvt": (
        CvT,
        dict(num_classes=10, s1_emb_dim=16, s1_depth=1, s2_emb_dim=32, s2_depth=1,
             s3_emb_dim=32, s3_depth=1, s3_heads=2),
        32,
    ),
    "levit": (
        LeViT,
        dict(image_size=64, num_classes=10, stages=3, dim=(32, 32, 32), depth=1,
             heads=(1, 2, 4), mlp_mult=2, dim_key=16, dim_value=16),
        64,
    ),
    "pit": (
        PiT,
        dict(image_size=64, patch_size=8, num_classes=10, dim=32, depth=(1, 1),
             heads=2, mlp_dim=64, dim_head=16),
        64,
    ),
    "t2t": (
        T2TViT,
        dict(image_size=64, num_classes=10, dim=64, depth=1, heads=2, mlp_dim=128,
             t2t_layers=((7, 4), (3, 2), (3, 2))),
        64,
    ),
    # The dependency-injected shell (reference efficient.py:15-59, fixed —
    # bug register #1). Any encoder callable plugs in; the smoke config
    # injects a small vanilla Transformer.
    "efficient": (
        EfficientViT,
        dict(image_size=64, patch_size=16, num_classes=10, dim=64,
             transformer=_Transformer(dim=64, depth=2, heads=4, dim_head=16, mlp_dim=128)),
        64,
    ),
}


# Reference-scale presets live in a submodule (imported last: presets pulls
# the constructors from this package, which is fully defined by here).
from vit_tpu.models.presets import REFERENCE_PRESETS, create  # noqa: E402

__all__ += ["REFERENCE_PRESETS", "create"]
