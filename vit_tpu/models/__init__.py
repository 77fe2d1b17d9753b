"""Model zoo: the 17 reference families, one framework.

Constructor signatures mirror the reference files (SURVEY.md §2.1) so
reference users can switch by changing the import. ``MODEL_REGISTRY`` maps
reference-style names to (class, smoke-test config) pairs.
"""

from vit_tpu.models.cait import CaiT
from vit_tpu.models.cross_vit import CrossViT
from vit_tpu.models.deepvit import DeepViT
from vit_tpu.models.efficient import EfficientViT
from vit_tpu.models.parallel_vit import ParallelViT
from vit_tpu.models.patch_merger import PatchMergerViT
from vit_tpu.models.simple_vit import SimpleViT
from vit_tpu.models.vit import ViT
from vit_tpu.models.vit_small_datasets import ViTSmallDatasets
from vit_tpu.nn.embed import SPT, PatchMerger

__all__ = [
    "CaiT",
    "CrossViT",
    "DeepViT",
    "EfficientViT",
    "ParallelViT",
    "PatchMerger",
    "PatchMergerViT",
    "SPT",
    "SimpleViT",
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
}
