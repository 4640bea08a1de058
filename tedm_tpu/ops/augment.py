"""SimCLR-style augmentations, jit-friendly.

Reference semantics (trainers/train_global_cl.py:23-33 and
trainers/utils.py:179-228 ``crop_batch``): per-sample random crop with
origin in [0, 32)², box size in [96, img-origin), resized back to
img_size (bilinear), labels rounded after resize; brightness shift in
[-0.3, 0.3] and contrast scale in [0.7, 1.3] applied as
``(x + brightness) * contrast``.

The reference's per-sample Python loop + dynamic-shape crops become a
vmapped ``jax.image.scale_and_translate`` — crop-then-resize is exactly an
affine resample with scale = img/box and translation = -origin*scale, so
shapes stay static under jit.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import Array


def _crop_resize_one(img: Array, origin: Array, box: Array, out_size: int) -> Array:
    """img (H, W, C); origin/box (2,) float arrays. Bilinear resample of the
    crop [ox, ox+bh) x [oy, oy+bw) to (out_size, out_size)."""
    scale = out_size / box
    translation = -origin * scale
    return jax.image.scale_and_translate(
        img,
        (out_size, out_size, img.shape[-1]),
        (0, 1),
        scale.astype(jnp.float32),
        translation.astype(jnp.float32),
        method="bilinear",
        antialias=False,
    )


def crop_batch(
    rng: Array,
    imgs: Array,
    labels: Optional[Array] = None,
    box_min: int = 96,
    origin_max: int = 32,
):
    """Per-sample random crop-resize on (B, H, W, C); optionally the same
    geometry applied to labels (rounded), like the reference's two-list
    mode (trainers/utils.py:179-228).

    Documented deviation: the reference draws integer box sizes
    (randint); this draws CONTINUOUS sizes from the same range so the
    whole batch augments in one vmapped scale_and_translate with static
    shapes (integer boxes would need per-sample dynamic slicing, which
    recompiles or gathers). Distributionally it is the continuous
    relaxation of the same law; bilinear resampling quantizes geometry
    anyway."""
    b, h, w, c = imgs.shape
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    ox = jax.random.randint(k1, (b,), 0, origin_max).astype(jnp.float32)
    oy = jax.random.randint(k2, (b,), 0, origin_max).astype(jnp.float32)
    # box size ~ U[box_min, img - origin) per sample (continuous; see above)
    ux = jax.random.uniform(k3, (b,))
    uy = jax.random.uniform(k4, (b,))
    bx = box_min + ux * (h - ox - box_min)
    by = box_min + uy * (w - oy - box_min)
    origin = jnp.stack([ox, oy], axis=1)
    box = jnp.stack([bx, by], axis=1)

    crop = jax.vmap(_crop_resize_one, in_axes=(0, 0, 0, None))
    out = crop(imgs, origin, box, h)
    if labels is None:
        return out
    lab = crop(labels, origin, box, h)
    return out, jnp.round(lab)


def brightness_contrast(rng: Array, x: Array) -> Array:
    """(x + U[-.3,.3]) * U[.7,1.3], per sample
    (reference: train_global_cl.py:25-28)."""
    b = x.shape[0]
    k1, k2 = jax.random.split(rng)
    brightness = jax.random.uniform(k1, (b, 1, 1, 1)) * 0.6 - 0.3
    contrast = jax.random.uniform(k2, (b, 1, 1, 1)) * 0.6 + 0.7
    return (x + brightness) * contrast


def augment(rng: Array, x: Array) -> Array:
    k1, k2 = jax.random.split(rng)
    return brightness_contrast(k2, crop_batch(k1, x))


def augment_and_concat(rng: Array, x: Array) -> Array:
    """Two independent views stacked on the batch axis: (2B, H, W, C)
    (reference: train_global_cl.py:30-33)."""
    k1, k2 = jax.random.split(rng)
    return jnp.concatenate([augment(k1, x), augment(k2, x)], axis=0)
