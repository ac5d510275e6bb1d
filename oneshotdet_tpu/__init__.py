"""oneshotdet_tpu — a TPU-native (JAX/XLA/Pallas/pjit) one-shot object detection
framework with the capabilities of RyanXLi/OneshotDet.

The public API mirrors the reference (reference: maskrcnn_benchmark/*):

    from oneshotdet_tpu.config import cfg
    from oneshotdet_tpu.models import build_detection_model

but the implementation is a from-scratch TPU-first design: padded static
shapes, functional flax modules, XLA-vectorized postprocessing, data-parallel
`jax.sharding.Mesh` training, and Pallas kernels on the hot paths.
"""

__version__ = "0.1.0"
