"""Checkpoint/resume via orbax (SURVEY.md §5 — the reference has none;
params live only in the Python process there).

Standard JAX checkpointing: save/restore param pytrees (and TrainState),
plus the one-way reference importer in vit_tpu.utils.importer for loading
reference-layout trees.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def save_checkpoint(path: str, tree: Any, *, force: bool = True) -> None:
    """Save a pytree (params / TrainState) to ``path`` (absolute dir)."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=force)
    ckptr.wait_until_finished()


def restore_checkpoint(path: str, target: Optional[Any] = None) -> Any:
    """Restore a pytree from ``path``; ``target`` (a matching abstract or
    concrete pytree) restores dtypes/shardings exactly."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if target is not None:
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
        return ckptr.restore(path, abstract)
    return ckptr.restore(path)
