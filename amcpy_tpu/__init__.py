"""amcpy_tpu — TPU-native Automatic Modulation Classification framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the reference
``amcpy`` project (see SURVEY.md): batched fused feature extraction,
sharded multi-device execution, data-parallel classifier training,
per-SNR evaluation, Q-format quantization for ARM deployment, and
visualization — designed TPU-first.
"""

__version__ = "0.1.0"

from amcpy_tpu.config import Config

__all__ = ["Config", "__version__"]
