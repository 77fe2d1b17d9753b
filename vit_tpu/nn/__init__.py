from vit_tpu.nn.attention import Attention, merge_heads, split_heads  # noqa: F401
from vit_tpu.nn.bias import (  # noqa: F401
    DynamicPositionBias,
    LeViTAttentionBias,
    WindowRelPosBias,
)
from vit_tpu.nn.blocks import FeedForward, Transformer  # noqa: F401
from vit_tpu.nn.conv import (  # noqa: F401
    Aggregate,
    ConvMLP,
    CrossEmbedLayer,
    DepthWiseConv2d,
    Downsample,
    PatchEmbedding,
    PEG,
    Pool,
)
from vit_tpu.nn.embed import SPT, PatchEmbed, PatchMerger, ProjectInOut  # noqa: F401
from vit_tpu.nn.identity import Identity  # noqa: F401
