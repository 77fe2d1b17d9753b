"""Test configuration: force an 8-device virtual CPU mesh.

Distributed/sharding code is tested the standard JAX way (SURVEY.md §4):
a single process with 8 virtual CPU devices. Pallas kernels run in
interpreter mode on CPU; the module layer takes the XLA fallback path here.

Note: this environment registers an ``axon`` PJRT plugin from
``sitecustomize`` that force-selects the TPU via ``jax.config`` (env
``JAX_PLATFORMS`` alone is overridden), so the CPU pin must also go
through ``jax.config.update``.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: repeat suite runs skip most XLA compiles
jax.config.update("jax_compilation_cache_dir", "/tmp/vit_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
