"""accunet_tpu — a TPU-native (JAX / XLA / Pallas / pjit) medical-image
segmentation framework with the capabilities of the ACC-UNet / UNeXt reference
repo (prashantkul366/ACC-UNet-Unext), re-designed TPU-first.

Layout conventions (differ deliberately from the PyTorch reference):
  * images are NHWC (TPU conv native), not NCHW
  * parameters are float32; compute dtype is configurable (bfloat16 default on
    TPU hot paths)
  * all models are pure functions of (params, batch_stats, inputs) via
    flax.linen; batch statistics are explicit state, not hidden mutation
"""

__version__ = "0.1.0"

from accunet_tpu.models import registry as model_registry  # noqa: F401
