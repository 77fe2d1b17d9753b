"""vit-tpu: a TPU-native Vision-Transformer framework.

Rebuilds the capability surface of ``conceptofmind/vit-flax`` (17 ViT-family
classifiers, see /root/reference) as one idiomatic JAX/XLA/Pallas framework:

- ``vit_tpu.ops``      — Pallas TPU kernels (flash attention, fused MLP,
                         patch embedding) with XLA fallbacks.
- ``vit_tpu.nn``       — shared Flax module layer (the reference copy-pastes
                         these primitives into every file; built once here).
- ``vit_tpu.models``   — the 17 model families with reference-compatible
                         constructor signatures.
- ``vit_tpu.parallel`` — mesh construction, data/tensor-parallel sharding.
- ``vit_tpu.train``    — GSPMD train step (augment/distill/QAT/accum hooks),
                         optimizers, schedules, eval.
- ``vit_tpu.augment``  — in-graph mixup/cutmix/flip/erasing, EMA,
                         distillation loss.
- ``vit_tpu.data``     — native JPEG decode; serving stream + training
                         dataset (decode/step overlap).
- ``vit_tpu.serving``  — dynamic request batching onto the compiled batch.
- ``vit_tpu.pipeline`` — device-fused preprocess + forward.
"""

from vit_tpu.models import *  # noqa: F401,F403

__version__ = "0.1.0"
