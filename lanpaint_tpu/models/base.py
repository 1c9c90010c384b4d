"""Denoiser protocol: the model contract the sampler consumes.

The engine is model-agnostic (like the reference, which works with any
ComfyUI backbone through `inner_model`, reference src/LanPaint/lanpaint.py:14,
117): it only needs an x0-prediction function.  Prediction-type conversion
(eps / v / x0 / flow velocity) happens here, mirroring ComfyUI's
`calculate_denoised` wrappers, so the rest of the framework never branches on
prediction type.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax.numpy as jnp

from ..config import ModelKind


def _bc(t, ndim):
    t = jnp.asarray(t)
    return t.reshape(t.shape[:1] + (1,) * (ndim - 1))


def x0_from_eps(raw: Callable) -> Callable:
    """eps-prediction -> x0: x0 = x - sigma * eps  (VE sigma space)."""

    def apply(x, sigma, cond):
        return x - _bc(sigma, x.ndim) * raw(x, sigma, cond)

    return apply


def x0_from_v(raw: Callable) -> Callable:
    """v-prediction -> x0: x0 = x/(1+sigma^2) - sigma/sqrt(1+sigma^2) * v."""

    def apply(x, sigma, cond):
        s = _bc(sigma, x.ndim)
        return x / (1.0 + s**2) - s / jnp.sqrt(1.0 + s**2) * raw(x, sigma, cond)

    return apply


def x0_from_flow_velocity(raw: Callable) -> Callable:
    """Rectified-flow velocity -> x0: x0 = x - t * v  (v = noise - x0)."""

    def apply(x, t, cond):
        return x - _bc(t, x.ndim) * raw(x, t, cond)

    return apply


@dataclasses.dataclass
class Denoiser:
    """A diffusion backbone packaged for the sampler.

    apply(x, t, cond) must return the x0 prediction; use the x0_from_*
    adapters for native eps/v/velocity models.  `sigma_table` supplies the
    model-based schedulers (lanpaint_tpu.sigmas); `is_flux` triggers the
    cfg_big = 1.0 rule (reference nodes.py:217-218).
    """

    apply: Callable[[jnp.ndarray, jnp.ndarray, Any], jnp.ndarray]
    kind: ModelKind
    sigma_table: Any = None
    is_flux: bool = False
    name: str = "denoiser"
    latent_channels: int = 4
    # Optional latent post-processing (comfy process_latent_out analogue).
    process_latent_out: Optional[Callable] = None
    # Weight-as-argument path: raw_apply(params, x, t, cond) plus the param
    # tree.  When present, the sampler passes `params` through jit as an
    # ARGUMENT instead of capturing them as closure constants — closure
    # capture serializes the full weights into the HLO, which (measured)
    # stalls the remote TPU compiler for many minutes on SDXL.
    raw_apply: Optional[Callable] = None
    params: Any = None
    # Optional run-constant conditioning precompute: (params, cond) -> cond.
    # The sampler applies it ONCE per launch, inside jit but outside the
    # solver/think loops, so per-run-constant projections of the text
    # context (e.g. every cross-attention k/v in the UNet — see
    # zoo.unet_precompute_kv) are computed once instead of once per model
    # forward.  Must be identity-safe: the enriched cond must also produce
    # correct results if a caller passes it straight to apply().
    precompute: Optional[Callable[[Any, Any], Any]] = None

    def bind(self, params=None):
        """Return an apply(x, t, cond) bound to `params` (or self.params)."""
        if self.raw_apply is None:
            return self.apply
        p = self.params if params is None else params
        return lambda x, t, cond: self.raw_apply(p, x, t, cond)
