from vit_tpu.utils.importer import (  # noqa: F401
    import_reference_deepvit_params,
    import_reference_lsa_params,
    import_reference_simple_vit_params,
    import_reference_vit_params,
)
