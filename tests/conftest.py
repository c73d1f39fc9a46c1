"""Test harness: run everything on a virtual 8-device CPU mesh.

The standard fake-backend trick for exercising mesh/collective code without
TPU hardware: force the CPU platform and split it into 8 virtual devices.
Must run before any JAX backend initialization, hence here in conftest.

Setting ``AMCPY_TEST_TPU=1`` skips the CPU forcing so the suite (in
particular ``tests/tpu/``) runs against the real TPU backend — this is how
the compiled-Mosaic conformance tests execute on hardware:

    AMCPY_TEST_TPU=1 python -m pytest tests/tpu/ -q
"""

import os

os.environ.setdefault("AMCPY_TPU_TEST", "1")

import jax

if not os.environ.get("AMCPY_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
