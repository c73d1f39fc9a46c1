"""Test harness: run everything on a virtual 8-device CPU mesh.

The standard fake-backend trick for exercising mesh/collective code without
TPU hardware: force the CPU platform and split it into 8 virtual devices.
Must run before any JAX backend initialization, hence here in conftest.
"""

import os

os.environ.setdefault("AMCPY_TPU_TEST", "1")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
