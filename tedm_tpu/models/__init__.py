"""Model definitions: DDPM UNet, diffusion process, feature segmenters, CL heads."""

from tedm_tpu.models.unet import Unet, count_params
from tedm_tpu.models.diffusion import (
    ddim_sample_loop,
    dpmpp2m_sample_loop,
    q_sample,
    sample_loop,
    sample_loop_with_snapshots,
    train_loss,
    val_loss,
)
from tedm_tpu.models.segmentation import (
    LinearProbe,
    PixelClassifier,
    extract_features,
)
from tedm_tpu.models.contrastive import GlobalCL, LocalCL
