from vit_tpu.utils.importer import (  # noqa: F401
    import_reference_deepvit_params,
    import_reference_lsa_params,
    import_reference_simple_vit_params,
    import_reference_vit_params,
)
from vit_tpu.utils.aot import (  # noqa: F401
    ExportedServing,
    export_forward,
    export_serving,
    load_forward,
)
from vit_tpu.utils.bn_folding import fold_batch_norm  # noqa: F401
from vit_tpu.utils.debug import checked, debug_nans, kernel_sanitizer  # noqa: F401
from vit_tpu.utils.health import (  # noqa: F401
    enable_compilation_cache,
    memory_stats,
    probe_devices,
    with_retry,
)
from vit_tpu.utils.interop import (  # noqa: F401
    export_vit_to_hf,
    hf_vit_config,
    import_hf_vit_params,
    vit_from_hf,
)
from vit_tpu.utils.parity import fp64_vit_forward, max_logit_err  # noqa: F401
from vit_tpu.utils.quantize import (  # noqa: F401
    quantize_vit,
    resolve_quant_mode,
    simple_vit_apply_w8a8,
    vit_apply_w8a8,
)
from vit_tpu.utils.pos_embed import (  # noqa: F401
    adapt_vit_resolution,
    interpolate_pos_embedding,
)

# Checkpoint symbols stay lazy: importing vit_tpu.utils for profiling/health
# must not eagerly pull in orbax and its background machinery (ADVICE r4).
_CHECKPOINT_SYMBOLS = (
    "CheckpointManager",
    "abstract_train_state",
    "restore_checkpoint",
    "save_checkpoint",
)


def __getattr__(name):
    if name in _CHECKPOINT_SYMBOLS:
        from vit_tpu.utils import checkpoint as _ckpt

        return getattr(_ckpt, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
