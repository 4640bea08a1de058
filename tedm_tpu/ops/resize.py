"""Image resize ops with PyTorch-compatible semantics, in NHWC.

* ``nearest_resize`` matches ``torch.nn.functional.interpolate(mode='nearest')``
  (source index = floor(dst * src/dst)) — the mode the reference uses to put
  decoder features into image space (models/datasetDM_model.py:81, default
  mode) and for the UNet's 2x Upsample (models/unet_model.py:39-44).
* ``bilinear_resize`` matches torch bilinear with align_corners=False.

Integral upscales reduce to ``jnp.repeat``, which XLA lowers to a cheap
broadcast — used on the hot feature-extraction path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array


def nearest_upsample_2x(x: Array) -> Array:
    """(B, H, W, C) -> (B, 2H, 2W, C), exact nearest for factor 2."""
    x = jnp.repeat(x, 2, axis=1)
    return jnp.repeat(x, 2, axis=2)


def nearest_resize(x: Array, out_h: int, out_w: int) -> Array:
    """torch F.interpolate(mode='nearest') semantics on (B, H, W, C)."""
    b, h, w, c = x.shape
    if out_h % h == 0 and out_w % w == 0:
        x = jnp.repeat(x, out_h // h, axis=1)
        return jnp.repeat(x, out_w // w, axis=2)
    rows = jnp.floor(jnp.arange(out_h) * (h / out_h)).astype(jnp.int32)
    cols = jnp.floor(jnp.arange(out_w) * (w / out_w)).astype(jnp.int32)
    return x[:, rows][:, :, cols]


def bilinear_resize(x: Array, out_h: int, out_w: int) -> Array:
    """torch bilinear, align_corners=False, on (B, H, W, C)."""
    return jax.image.resize(
        x, (x.shape[0], out_h, out_w, x.shape[3]), method="bilinear"
    )
