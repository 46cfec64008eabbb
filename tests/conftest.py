"""Test env: force CPU with 8 virtual devices.

The container's sitecustomize imports jax at interpreter startup with
JAX_PLATFORMS=axon (the TPU tunnel), so env-var edits here are too late;
``jax.config.update`` still works because backends initialize lazily.
Running the suite over the tunnel would be pathologically slow (~2s/op),
and 8 virtual CPU devices is the standard way to exercise
`jax.sharding.Mesh`/`pjit` code without a pod.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")
