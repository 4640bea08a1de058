"""Model definitions: DDPM UNet, diffusion process, feature segmenters, CL heads."""
