"""Mask pipeline: pixel mask -> latent-grid mask, and pixel-space blending.

TPU-native equivalents of the reference mask utilities
(reference src/LanPaint/nodes.py:20-84 `reshape_mask`/`prepare_mask` and
nodes.py:416-477 `MaskBlend`), with torch's `nearest-exact` interpolation
reimplemented index-exactly (gather with half-pixel centers) so latent masks
binarize identically.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import lax


def _nearest_exact_indices(out_size: int, in_size: int) -> jnp.ndarray:
    """torch 'nearest-exact' source index: floor((i + 0.5) * in/out)."""
    i = jnp.arange(out_size)
    src = jnp.floor((i + 0.5) * (in_size / out_size)).astype(jnp.int32)
    return jnp.clip(src, 0, in_size - 1)


def resize_nearest_exact(x: jnp.ndarray, size) -> jnp.ndarray:
    """Resize the trailing len(size) spatial dims with nearest-exact."""
    nsp = len(size)
    for axis_off, target in enumerate(size):
        axis = x.ndim - nsp + axis_off
        idx = _nearest_exact_indices(target, x.shape[axis])
        x = jnp.take(x, idx, axis=axis)
    return x


def repeat_to_batch_size(x: jnp.ndarray, batch: int) -> jnp.ndarray:
    """Tile / trim the leading dim to `batch` (comfy.utils.repeat_to_batch_size)."""
    if x.shape[0] == batch:
        return x
    if x.shape[0] > batch:
        return x[:batch]
    reps = -(-batch // x.shape[0])
    return jnp.tile(x, (reps,) + (1,) * (x.ndim - 1))[:batch]


def reshape_mask(input_mask: jnp.ndarray, output_shape, video: bool = False) -> jnp.ndarray:
    """Normalize an input mask to the latent grid `output_shape`.

    Accepts 2D (H, W), 3D (B, H, W) or 4D (B, C, H, W) masks for images, and
    4D/5D for video; resizes with nearest-exact, repeats channels and batch.
    `output_shape` is (B, C, H, W) or (B, C, F, H, W).
    """
    m = jnp.asarray(input_mask)
    if m.ndim == 2:
        m = m[None, None]
    elif m.ndim == 3:
        m = m[:, None]

    if len(output_shape) == 5:
        if video:
            if m.ndim == 4:
                # (F, C, H, W) frame stack -> (1, C, F, H, W)
                m = jnp.transpose(m, (1, 0, 2, 3))[None]
            m = resize_nearest_exact(m, tuple(output_shape[2:]))
        else:
            if m.ndim == 4:
                m = m[:, :, None]  # (B, C, 1, H, W)
            m = resize_nearest_exact(m, tuple(output_shape[2:]))
        if m.shape[1] < output_shape[1]:
            m = jnp.tile(m, (1, output_shape[1], 1, 1, 1))[:, : output_shape[1]]
    else:
        m = resize_nearest_exact(m, tuple(output_shape[2:]))
        if m.shape[1] < output_shape[1]:
            m = jnp.tile(m, (1, output_shape[1]) + (1,) * (m.ndim - 2))[:, : output_shape[1]]
    return repeat_to_batch_size(m, output_shape[0])


def prepare_mask(noise_mask, shape, video: bool = False) -> jnp.ndarray:
    return reshape_mask(noise_mask, shape, video).astype(jnp.float32)


def gaussian_kernel(kernel_size: int) -> jnp.ndarray:
    """2D Gaussian kernel, sigma = (k-1)/4, normalized (nodes.py:463-477)."""
    sigma = max((kernel_size - 1) / 4.0, 1e-6)
    coords = jnp.arange(kernel_size, dtype=jnp.float32) - kernel_size // 2
    xg, yg = jnp.meshgrid(coords, coords, indexing="ij")
    k = jnp.exp(-(xg**2 + yg**2) / (2 * sigma**2))
    return k / jnp.sum(k)


def _max_pool2d(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Same-stride-1 max pool with padding k//2 (mask dilation)."""
    pad = k // 2
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, k, k), (1, 1, 1),
        ((0, 0), (pad, pad), (pad, pad)),
    )


def mask_blend(image1: jnp.ndarray, image2: jnp.ndarray, mask: jnp.ndarray,
               blend_overlap: int = 1) -> jnp.ndarray:
    """Pixel-space post blend: dilate mask, Gaussian-feather, lerp images.

    `image1`/`image2` are (B, H, W, C) images (before / after inpaint);
    `mask` is (B, H, W).  Mirrors MaskBlend.blend_images (nodes.py:436-461).
    """
    if image1.shape[1] != image2.shape[1] or image1.shape[2] != image2.shape[2]:
        raise ValueError(
            "Image size mismatch: both images must share dimensions (and be "
            f"multiples of 8 for VAE decode); got {image1.shape} vs {image2.shape}"
        )
    m = mask.astype(jnp.float32)
    m = _max_pool2d(m, blend_overlap)
    k = gaussian_kernel(blend_overlap)[None, None]  # OIHW
    pad = blend_overlap // 2
    m = lax.conv_general_dilated(
        m[:, None], k, (1, 1), ((pad, pad), (pad, pad)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[:, 0]
    m = m[..., None]
    return image1 * (1.0 - m) + image2 * m


def checkerboard_noise_mask(shape, scale: int = 2) -> jnp.ndarray:
    """Upscale helper: every `scale`-th pixel known (reference
    LanPaint_UpSale_LatentNoiseMask, nodes.py:270-289; disabled node kept for
    component parity)."""
    b, _, h, w = shape
    m = np.ones((b, 1, h, w), np.float32)
    m[:, :, ::scale, ::scale] = 0.0
    return jnp.asarray(m)
