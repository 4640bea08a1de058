"""tedm_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for semi-supervised
chest-X-ray lung segmentation with denoising diffusion models.

Re-designed from scratch with the capabilities of the mmr12/TEDM reference
(see /root/repo/SURVEY.md): DDPM backbone training, LEDM/LEDMe/TEDM
frozen-feature pixel classifiers, supervised and contrastive baselines,
evaluation harnesses, and serving — built TPU-first:

* NHWC layouts and bf16-capable compute paths targeting the MXU;
* the 1000-step reverse-diffusion sampler as a single jitted ``lax.scan``;
* decoder features returned as first-class UNet outputs (no hooks, no
  host round-trips), fused with the pixel classifier in one jit;
* data-parallel (and optionally tensor-parallel) execution over a
  ``jax.sharding.Mesh`` with XLA collectives;
* Pallas kernels as the native layer: fused linear attention (fwd +
  analytic VJP) and blockwise flash cosine attention for extreme
  resolutions (elementwise chains like GroupNorm+FiLM+SiLU are left to
  XLA, which was measured to fuse them at parity with hand kernels).
"""

__version__ = "0.1.0"

from tedm_tpu.config import Config, build_parser, config_from_args  # noqa: F401
