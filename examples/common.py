"""Shared helpers for the example scripts.

Each example mirrors one of the reference's example workflows
(reference example_workflows/*.json): same model family, same LanPaint
hyperparameters as the workflow's widget values.  Without a checkpoint path
the examples run in --smoke mode: random-init weights at a small latent so
the full pipeline is exercised end-to-end on any machine.
"""

from __future__ import annotations

import argparse
import os
import sys

# allow `python examples/<name>.py` from anywhere (the package lives at the
# repo root, one level up from this file)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# honor JAX_PLATFORMS even where site config pre-selects a platform (the
# env var alone does not win against sitecustomize on some machines)
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np


def example_argparser(name: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=name)
    p.add_argument("--checkpoint", default=None,
                   help="safetensors checkpoint; omit for --smoke random init")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--think-steps", type=int, default=5)
    p.add_argument("--smoke", action="store_true",
                   help="tiny latent + random weights (no checkpoint needed)")
    return p


def center_square_mask(h: int, w: int, frac: float = 0.5) -> jnp.ndarray:
    """Pixel mask repainting a centered square (1 = repaint)."""
    m = np.zeros((h, w), np.float32)
    dh, dw = int(h * frac / 2), int(w * frac / 2)
    m[h // 2 - dh: h // 2 + dh, w // 2 - dw: w // 2 + dw] = 1.0
    return jnp.asarray(m)


def outpaint_mask(h: int, w: int, border_frac: float = 0.25) -> jnp.ndarray:
    """Pixel mask repainting an outer border (outpainting, reference
    Qwen_Image_Outpainting workflow)."""
    m = np.ones((h, w), np.float32)
    bh, bw = int(h * border_frac), int(w * border_frac)
    m[bh: h - bh, bw: w - bw] = 0.0
    return jnp.asarray(m)


def report(name: str, out, original=None, mask=None,
           lpips_params=None) -> None:
    """Print output stats; with `original` + `mask` also the masked-region
    quality metrics (lanpaint_tpu.quality) — pass `lpips_params`
    (quality.load_lpips_params) for the LPIPS north-star metric.

    One-flag LPIPS: set LANPAINT_LPIPS_VGG=/path/to/vgg16.pth (optionally
    LANPAINT_LPIPS_LIN=/path/to/lpips_vgg.pth for the trained linear heads)
    and every example that reports with original+mask on 3-channel images
    also prints the masked LPIPS — the BASELINE.json "masked-region LPIPS
    within 1%" harness, live the day real weights exist on the machine."""
    o = np.asarray(out, np.float32)
    line = (f"{name}: output {o.shape}, finite={np.isfinite(o).all()}, "
            f"mean={o.mean():.4f}, std={o.std():.4f}")
    if original is not None and mask is not None:
        from lanpaint_tpu.quality import load_lpips_params, quality_report

        vgg = os.environ.get("LANPAINT_LPIPS_VGG")
        if lpips_params is None and vgg and o.shape[1] == 3:
            lpips_params = load_lpips_params(
                vgg, os.environ.get("LANPAINT_LPIPS_LIN"))
        q = quality_report(original, out, mask, lpips_params=lpips_params)
        line += " | " + ", ".join(f"{k}={v:.4f}" for k, v in q.items())
    print(line)
