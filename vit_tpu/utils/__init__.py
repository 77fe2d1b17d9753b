from vit_tpu.utils.importer import import_reference_vit_params  # noqa: F401
