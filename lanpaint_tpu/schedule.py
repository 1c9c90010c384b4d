"""Schedule unification and noise scaling across backbone families.

Maps any backbone's native time variable to the common triple
(VE sigma, abar_t, flow t) the LanPaint math is written in
(reference src/LanPaint/nodes.py:150-166), and provides the
noise-scaling / inverse-noise-scaling pair of the replace step
(reference lanpaint.py:55-60, nodes.py:221, 248).

Relations (exact, not approximations):
    EPS/VE:  abt = 1 / (1 + sigma^2),   t = sqrt(1-abt) / (sqrt(1-abt) + sqrt(abt))
    FLOW:    abt = (1-t)^2 / ((1-t)^2 + t^2),   sigma = t / (1-t)
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .config import ModelKind


class Times(NamedTuple):
    """Unified time coordinates, one scalar per batch element (shape [B])."""

    ve_sigma: jnp.ndarray
    abt: jnp.ndarray
    flow_t: jnp.ndarray


def unify_times(sigma, kind: ModelKind) -> Times:
    """Map the sampler's native time (sigma or flow-t) to unified coords."""
    sigma = jnp.asarray(sigma)
    if kind is ModelKind.FLOW:
        t = sigma
        one_m_t = 1.0 - t
        abt = one_m_t**2 / (one_m_t**2 + t**2)
        ve_sigma = t / one_m_t
        return Times(ve_sigma, abt, t)
    ve_sigma = sigma
    abt = 1.0 / (1.0 + ve_sigma**2)
    sq1mabt = jnp.sqrt(1.0 - abt)
    flow_t = sq1mabt / (sq1mabt + jnp.sqrt(abt))
    return Times(ve_sigma, abt, flow_t)


def bcast_to(arr, ndim: int):
    """Broadcast a [B] per-batch scalar to [B, 1, ..., 1] with `ndim` dims.

    Equivalent of the reference's add_none_dims (lanpaint.py:22-25).
    """
    arr = jnp.asarray(arr)
    return arr.reshape(arr.shape[:1] + (1,) * (ndim - 1))


def noise_scaling(kind: ModelKind, sigma, noise, latent_image, max_denoise: bool = False):
    """Forward noise scaling: produce the noisy latent of the known region.

    EPS (VE sigma space): latent + sigma * noise  (sqrt(1+sigma^2) * noise at
    max denoise, matching k-diffusion's initial-noise convention).
    FLOW: t * noise + (1 - t) * latent (rectified-flow interpolation).
    """
    sigma = bcast_to(sigma, jnp.ndim(noise))
    if kind is ModelKind.FLOW:
        return sigma * noise + (1.0 - sigma) * latent_image
    if max_denoise:
        return latent_image + noise * jnp.sqrt(1.0 + sigma**2)
    return latent_image + noise * sigma


def inverse_noise_scaling(kind: ModelKind, sigma, latent):
    """Undo the terminal scaling at the end of sampling.

    Identity for EPS; divides by (1 - t) for FLOW (inert when the schedule
    ends at t = 0, but required for leftover-noise / partial runs).
    """
    if kind is ModelKind.FLOW:
        sigma = bcast_to(sigma, jnp.ndim(latent))
        return latent / (1.0 - sigma)
    return latent


def to_vp(kind: ModelKind, x, times: Times, ndim: int):
    """Native sampler coords -> variance-preserving x_t (lanpaint.py:62-65)."""
    if kind is ModelKind.FLOW:
        abt = bcast_to(times.abt, ndim)
        return x * (jnp.sqrt(abt) + jnp.sqrt(1.0 - abt))
    sig = bcast_to(times.ve_sigma, ndim)
    return x / jnp.sqrt(1.0 + sig**2)


def from_vp(kind: ModelKind, x_t, times: Times, ndim: int):
    """Variance-preserving x_t -> native sampler coords (lanpaint.py:110-113)."""
    if kind is ModelKind.FLOW:
        abt = bcast_to(times.abt, ndim)
        return x_t / (jnp.sqrt(abt) + jnp.sqrt(1.0 - abt))
    sig = bcast_to(times.ve_sigma, ndim)
    return x_t * jnp.sqrt(1.0 + sig**2)


def vp_to_model_coords(kind: ModelKind, x_t, times: Times, ndim: int):
    """VP x_t -> the coordinates the denoiser consumes, plus its time input.

    EPS models eat VE x (x0 + sigma*noise) at time sigma; FLOW models eat the
    rectified-flow x at time t (lanpaint.py:127-137).  Returns (x_model, t).
    """
    if kind is ModelKind.FLOW:
        abt = bcast_to(times.abt, ndim)
        return x_t / (jnp.sqrt(abt) + jnp.sqrt(1.0 - abt)), times.flow_t
    sig = bcast_to(times.ve_sigma, ndim)
    return x_t * jnp.sqrt(1.0 + sig**2), times.ve_sigma
