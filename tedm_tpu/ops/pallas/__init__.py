"""Hand-written Pallas TPU kernels — the framework's native layer.

The reference has no native components (SURVEY §2.2): its performance
surface is stock PyTorch kernels. Here the MXU-targeting Pallas kernels
take that role:

* ``linear_attention`` — fused softmax(q)/softmax(k) + context matmul for
  the O(N) attention used at every UNet stage (reference:
  models/unet_model.py:178-210). Avoids materializing softmax
  intermediates in HBM at N=16384.
* ``flash_attention`` — blockwise quadratic attention for the mid stage
  so resolutions beyond 128² stay feasible (reference:
  models/unet_model.py:213-241).

All kernels run compiled on TPU and fall back to interpreter mode (or a
reference jnp path) on CPU so the test suite runs anywhere.
"""

import jax


def on_tpu() -> bool:
    return jax.default_backend() == "tpu"
