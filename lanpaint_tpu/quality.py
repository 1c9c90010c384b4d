"""Masked-region quality metrics: PSNR, SSIM, LPIPS.

The rebuild's quality north star (BASELINE.json) is "masked-region LPIPS
within 1% of reference"; the reference benches quality externally via the
LanPaintBench repo (reference README.md:22) and ships no metric code.  This
module makes that target measurable in-repo the day real weights are
available, and gives the examples/serving layer cheap masked PSNR/SSIM
immediately.

Conventions: images are (B, C, H, W) float in [-1, 1] (the VAE decode
range); masks are (H, W) or broadcastable, 1 = inpainted region.  All
metrics are jittable; mask-weighted aggregation keeps everything
shape-static (no boolean indexing).

LPIPS follows Zhang et al. 2018 (arXiv 1801.03924): VGG16 features from
relu1_2/relu2_2/relu3_3/relu4_3/relu5_3, channel-unit-normalized, squared
difference, learned non-negative 1x1 linear head per stage, spatial mean,
summed over stages.  `load_lpips_params` imports the torchvision VGG16
backbone + official LPIPS linear calibration from .pth files (torch-cpu is
available in this image); `init_lpips_params` random-inits the same
structure for offline tests.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

# LPIPS input scaling (Zhang et al. reference implementation): images in
# [-1, 1] are shifted/scaled per channel before VGG.
_LPIPS_SHIFT = (-0.030, -0.088, -0.188)
_LPIPS_SCALE = (0.458, 0.448, 0.450)

# VGG16 feature config: conv channel widths, "M" = 2x2 max pool.  LPIPS
# taps the activation AFTER the relu preceding each pool (and the last).
_VGG16_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
              512, 512, 512, "M", 512, 512, 512)
_TAP_AFTER_CONV = (1, 3, 6, 9, 12)   # conv indices of relu1_2..relu5_3
_STAGE_CHANNELS = (64, 128, 256, 512, 512)


def _prep_mask(mask, shape):
    """Broadcast a pixel mask to (B, 1, H, W) float32."""
    m = jnp.asarray(mask, jnp.float32)
    while m.ndim < 4:
        m = m[None]
    return jnp.broadcast_to(m[:, :1], (shape[0], 1, shape[2], shape[3]))


def masked_mse(a, b, mask=None):
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    se = (a - b) ** 2
    if mask is None:
        return jnp.mean(se)
    m = _prep_mask(mask, a.shape)
    return jnp.sum(se * m) / jnp.maximum(jnp.sum(m) * a.shape[1], 1e-8)


def masked_psnr(a, b, mask=None, data_range: float = 2.0):
    """PSNR over the masked region (dB).  data_range=2 for [-1, 1] images."""
    mse = masked_mse(a, b, mask)
    return 10.0 * jnp.log10(data_range**2 / jnp.maximum(mse, 1e-12))


def _gaussian_window(size: int = 11, sigma: float = 1.5):
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x**2) / (2 * sigma**2))
    g = g / jnp.sum(g)
    return jnp.outer(g, g)


def _depthwise_filter(img, window):
    """(B, C, H, W) x (k, k) -> same-shape depthwise 'valid' convolution."""
    c = img.shape[1]
    k = window.shape[0]
    w = jnp.tile(window[None, None], (c, 1, 1, 1))  # (C, 1, k, k)
    return jax.lax.conv_general_dilated(
        img, w, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"), feature_group_count=c,
    ), k


def masked_ssim(a, b, mask=None, data_range: float = 2.0,
                window_size: int = 11, sigma: float = 1.5):
    """SSIM (Wang et al. 2004) with Gaussian window, aggregated over the
    masked region (mask average-pooled to the valid-conv grid)."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    win = _gaussian_window(window_size, sigma)
    mu_a, k = _depthwise_filter(a, win)
    mu_b, _ = _depthwise_filter(b, win)
    saa, _ = _depthwise_filter(a * a, win)
    sbb, _ = _depthwise_filter(b * b, win)
    sab, _ = _depthwise_filter(a * b, win)
    va = saa - mu_a**2
    vb = sbb - mu_b**2
    cab = sab - mu_a * mu_b
    ssim_map = ((2 * mu_a * mu_b + c1) * (2 * cab + c2)) / (
        (mu_a**2 + mu_b**2 + c1) * (va + vb + c2))
    if mask is None:
        return jnp.mean(ssim_map)
    m = _prep_mask(mask, a.shape)
    # center-crop the mask to the valid-conv grid, then weight
    off = (k - 1) // 2
    mh = ssim_map.shape[2]
    mw = ssim_map.shape[3]
    m = jax.lax.dynamic_slice(m, (0, 0, off, off), (m.shape[0], 1, mh, mw))
    return jnp.sum(ssim_map * m) / jnp.maximum(
        jnp.sum(m) * ssim_map.shape[1], 1e-8)


# ---------------------------------------------------------------------------
# LPIPS


def _vgg16_features(params, x):
    """Run VGG16 convs on (B, 3, H, W) in VGG input space; return the 5
    LPIPS tap activations (post-relu)."""
    taps = []
    conv_i = 0
    h = x
    for item in _VGG16_CFG:
        if item == "M":
            h = jax.lax.reduce_window(
                h, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID")
            continue
        p = params[f"conv{conv_i}"]
        h = jax.lax.conv_general_dilated(
            h, p["kernel"], (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        ) + p["bias"][None, :, None, None]
        h = jax.nn.relu(h)
        if conv_i in _TAP_AFTER_CONV:
            taps.append(h)
        conv_i += 1
    return taps


def _unit_normalize(f, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(f**2, axis=1, keepdims=True))
    return f / (norm + eps)


def lpips_maps(params, a, b) -> Sequence[jnp.ndarray]:
    """Per-stage (B, 1, H_s, W_s) LPIPS distance maps for images in [-1,1]."""
    shift = jnp.asarray(_LPIPS_SHIFT, jnp.float32)[None, :, None, None]
    scale = jnp.asarray(_LPIPS_SCALE, jnp.float32)[None, :, None, None]
    xa = (jnp.asarray(a, jnp.float32) - shift) / scale
    xb = (jnp.asarray(b, jnp.float32) - shift) / scale
    fa = _vgg16_features(params["vgg"], xa)
    fb = _vgg16_features(params["vgg"], xb)
    maps = []
    for i, (u, v) in enumerate(zip(fa, fb)):
        d = (_unit_normalize(u) - _unit_normalize(v)) ** 2
        w = jax.nn.relu(params["lin"][f"lin{i}"])  # non-negative calibration
        maps.append(jnp.sum(d * w[None, :, None, None], axis=1, keepdims=True))
    return maps


def lpips(params, a, b, mask=None):
    """LPIPS distance; with `mask`, each stage's map is aggregated over the
    mask average-pooled to that stage's resolution (masked-region LPIPS —
    the BASELINE.json north-star metric)."""
    maps = lpips_maps(params, a, b)
    total = 0.0
    for d in maps:
        if mask is None:
            total = total + jnp.mean(d, axis=(1, 2, 3))
        else:
            m = _prep_mask(mask, (d.shape[0], 1) + jnp.asarray(a).shape[2:])
            m = jax.image.resize(m, d.shape[:2] + d.shape[2:], "linear")
            total = total + (jnp.sum(d * m, axis=(1, 2, 3))
                             / jnp.maximum(jnp.sum(m, axis=(1, 2, 3)), 1e-8))
    return total


def init_lpips_params(key, dtype=jnp.float32):
    """Random-init the LPIPS parameter structure (offline tests; real
    evaluation requires load_lpips_params)."""
    vgg = {}
    cin = 3
    conv_i = 0
    for item in _VGG16_CFG:
        if item == "M":
            continue
        key, k1 = jax.random.split(key)
        vgg[f"conv{conv_i}"] = {
            "kernel": jax.random.normal(k1, (item, cin, 3, 3), dtype)
            * (2.0 / np.sqrt(9 * cin)),
            "bias": jnp.zeros((item,), dtype),
        }
        cin = item
        conv_i += 1
    lin = {}
    for i, ch in enumerate(_STAGE_CHANNELS):
        key, k1 = jax.random.split(key)
        lin[f"lin{i}"] = jax.random.uniform(k1, (ch,), dtype, 0.0, 2.0 / ch)
    return {"vgg": vgg, "lin": lin}


def load_lpips_params(vgg_pth: str, lpips_pth: Optional[str] = None):
    """Import LPIPS weights from torch checkpoints.

    `vgg_pth`: torchvision VGG16 state dict (vgg16-397923af.pth) — keys
    `features.{idx}.weight/bias` with idx the Sequential position.
    `lpips_pth`: the official LPIPS v0.1 VGG calibration (`vgg.pth`) — keys
    `lin{i}.model.1.weight` of shape (1, C, 1, 1).  If omitted, uniform
    1/C calibration is used (un-calibrated perceptual distance).
    """
    import torch

    sd = torch.load(vgg_pth, map_location="cpu", weights_only=True)
    # torchvision Sequential indices of the 13 convs in VGG16.features
    conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    vgg = {}
    for i, idx in enumerate(conv_idx):
        w = sd[f"features.{idx}.weight"].numpy()
        b = sd[f"features.{idx}.bias"].numpy()
        vgg[f"conv{i}"] = {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}
    lin = {}
    if lpips_pth is not None:
        ld = torch.load(lpips_pth, map_location="cpu", weights_only=True)
        for i, ch in enumerate(_STAGE_CHANNELS):
            lin[f"lin{i}"] = jnp.asarray(
                ld[f"lin{i}.model.1.weight"].numpy().reshape(ch))
    else:
        for i, ch in enumerate(_STAGE_CHANNELS):
            lin[f"lin{i}"] = jnp.full((ch,), 1.0 / ch, jnp.float32)
    return {"vgg": vgg, "lin": lin}


def quality_report(original, inpainted, mask, lpips_params=None) -> dict:
    """Masked-region quality summary for an inpainting result.

    Returns {"masked_psnr", "masked_ssim"} (+ "masked_lpips" when params are
    supplied).  `original`/`inpainted` are (B, 3, H, W) in [-1, 1].
    """
    out = {
        "masked_psnr": float(masked_psnr(original, inpainted, mask)),
        "masked_ssim": float(masked_ssim(original, inpainted, mask)),
    }
    if lpips_params is not None:
        out["masked_lpips"] = float(
            jnp.mean(lpips(lpips_params, original, inpainted, mask)))
    return out
