"""Device-mesh construction (SURVEY.md §2.3 — the reference has no
parallelism code; this is the build's sharding layer).

The communication backend is XLA itself: collectives are inserted by the
compiler from sharding annotations and ride ICI within a slice. This module
owns mesh construction and the canonical axis names:

  - ``data``: batch-sharded data parallelism (the primary strategy for
    ViT-scale inference and training).
  - ``model``: optional tensor parallelism — attention heads and MLP hidden
    dim sharded; XLA inserts the psum on out/down projections.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ``(data, model)`` mesh over the available devices.

    With ``n_data=None`` the data axis absorbs all devices not claimed by
    the model axis. ``n_model=1`` (default) gives pure data parallelism —
    right-sized for every model in the zoo, all of which fit on one chip.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n_data is None:
        if n % n_model != 0:
            raise ValueError(
                f"{n} available device(s) not divisible by n_model={n_model}"
            )
        n_data = n // n_model
    if n_data * n_model > n:
        raise ValueError(
            f"mesh needs n_data*n_model = {n_data}*{n_model} = {n_data * n_model} "
            f"devices but only {n} available ({devices[0].platform}). For a "
            "virtual multi-device mesh, start the process with "
            "JAX_PLATFORMS=cpu and XLA_FLAGS=--xla_force_host_platform_device_count=N "
            "(see tests/conftest.py), or use __graft_entry__.dryrun_multichip "
            "which self-provisions one."
        )
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def make_hybrid_mesh(
    n_model: int = 1,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
    slice_index_fn=None,
) -> Mesh:
    """A ``(data, model)`` mesh for MULTI-SLICE topologies (several
    ICI-connected TPU slices joined by data-center network).

    Collective placement is the whole point (scaling-book recipe): the
    ``model`` axis — whose psum/all-gather fire on *every* layer — is laid
    out strictly WITHIN one slice so tp collectives ride ICI; the ``data``
    axis spans slices, so the only traffic crossing DCN is the once-per-step
    gradient all-reduce (or nothing at inference). The returned mesh is a
    drop-in for ``make_mesh``'s — same axis names, same partition rules.

    Slice membership comes from each device's ``slice_index`` attribute
    (present on multi-slice TPU deployments; single-slice and CPU devices
    fall back to slice 0 — then this degenerates to ``make_mesh``).
    ``slice_index_fn`` overrides it (used by the CPU-mesh tests).
    """
    devices = list(devices if devices is not None else jax.devices())
    get_slice = slice_index_fn or (lambda d: getattr(d, "slice_index", 0) or 0)
    slices: dict = {}
    for d in devices:
        slices.setdefault(get_slice(d), []).append(d)
    rows = []  # each row: n_model devices from ONE slice (a tp group)
    for s in sorted(slices):
        group = slices[s]
        if len(group) % n_model != 0:
            raise ValueError(
                f"slice {s} has {len(group)} device(s), not divisible by "
                f"n_model={n_model} — a model group must not straddle a "
                "slice boundary (tp collectives would cross DCN)"
            )
        for k in range(len(group) // n_model):
            rows.append(group[k * n_model:(k + 1) * n_model])
    grid = np.asarray(rows).reshape(len(rows), n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding for image/logit arrays."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
