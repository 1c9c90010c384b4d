"""Exact stochastic-harmonic-oscillator (SHO) exponential integrator.

TPU-native equivalent of the reference integrator
(reference: src/LanPaint/utils.py:203-300).  The process is

    dy = q dt
    dq = -Gamma * A * y dt + Gamma * C dt + Gamma * D dw - Gamma * q dt

with the numerically-stable velocity variable v = q / sqrt(Gamma).  The exact
one-step transition is a 2D Gaussian in (y, v); we compute its mean and a
manual 2x2 Cholesky factor and sample with threaded `jax.random` keys instead
of torch's global-RNG MultivariateNormal.

Everything here is pointwise over the latent, fp32 math, and fully fusible by
XLA; the Pallas fused path (`lanpaint_tpu.ops.fused`) reuses the same
coefficient functions.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .stable import sig11, sig22, zeta1, zeta2

CHOL_TOL = 1e-8


class SHOCoeffs(NamedTuple):
    """Per-branch scalar coefficients of the exact SHO transition over time t.

    The coefficients depend only on (Gamma, A, D, t) — NOT on the state or the
    drift C — so for LanPaint's two regions (known / unknown) they are computed
    once per inner step as a handful of scalar transcendentals and broadcast
    over the latent.  `y(t) = mean(y0, v0, C) + L @ eps`.
    """

    # mean map: y_mean = y0 + wy_cy*(C - A*y0) + wy_v*v0
    wy_cy: jax.Array
    wy_v: jax.Array
    # v_mean = wv_cy*(C - A*y0) + wv_v*v0
    wv_cy: jax.Array
    wv_v: jax.Array
    # Cholesky of the (y, v) covariance: [[l_yy, 0], [l_vy, l_vv]]
    l_yy: jax.Array
    l_vy: jax.Array
    l_vv: jax.Array


def sho_coeffs(gamma, a, d, t) -> SHOCoeffs:
    """Compute the exact transition coefficients (fp32 recommended).

    Mirrors the mean/covariance algebra of the reference `dynamics`
    (utils.py:230-288) but factored so that the state only enters linearly.
    """
    delta = 1.0 - 4.0 * a / gamma
    gamma_hat = gamma * t
    z1 = zeta1(gamma_hat, delta)
    z2 = zeta2(gamma_hat, delta)
    ee = 1.0 - gamma_hat * z2
    sqrt_gamma = jnp.sqrt(gamma)

    wy_cy = (1.0 - z1) * t
    wy_v = z2 * sqrt_gamma * t
    wv_cy = (1.0 - ee) / sqrt_gamma
    wv_v = ee - a * t * (1.0 - z1)

    cov_yy = d * d * t * sig22(gamma_hat, delta)
    cov_vv = d * d * sig11(gamma_hat, delta) / 2.0
    cov_yv = (z2 * gamma_hat * d) ** 2 / 2.0 / sqrt_gamma

    cov_yy = jnp.maximum(cov_yy, CHOL_TOL)
    l_yy = jnp.sqrt(cov_yy)
    l_vy = cov_yv / l_yy
    l_vv = jnp.sqrt(jnp.maximum(cov_vv - cov_yv * cov_yv / cov_yy, CHOL_TOL))

    return SHOCoeffs(wy_cy, wy_v, wv_cy, wv_v, l_yy, l_vy, l_vv)


def sho_apply(coeffs: SHOCoeffs, y0, v0, a, c, eps_y, eps_v):
    """Apply a precomputed SHO transition to state (y0, v0) with noise (eps_y, eps_v).

    Returns (y_t, v_t).  `a` must match the `a` used to build `coeffs` (it
    also appears in the drift term C - A*y0).
    """
    drive = c - a * y0
    y_mean = y0 + coeffs.wy_cy * drive + coeffs.wy_v * v0
    v_mean = coeffs.wv_cy * drive + coeffs.wv_v * v0
    y_t = y_mean + coeffs.l_yy * eps_y
    v_t = v_mean + coeffs.l_vy * eps_y + coeffs.l_vv * eps_v
    return y_t, v_t


def sho_dynamics(y0, v0, t, gamma, a, c, d, key):
    """One exact SHO step; the standalone (non-fused) entry point.

    If `v0` is None the velocity is initialized from its stationary
    distribution `N(0, D^2/2)` (reference utils.py:253-254).  Consumes exactly
    three subkeys (v-init, eps_y, eps_v) regardless of the v0 branch so RNG
    draw order is static under jit.
    """
    k_v0, k_y, k_v = jax.random.split(key, 3)
    if v0 is None:
        v0 = jax.random.normal(k_v0, jnp.shape(y0), jnp.result_type(y0)) * d / jnp.sqrt(2.0)
    coeffs = sho_coeffs(gamma, a, d, t)
    eps_y = jax.random.normal(k_y, jnp.shape(y0), jnp.result_type(y0))
    eps_v = jax.random.normal(k_v, jnp.shape(y0), jnp.result_type(y0))
    return sho_apply(coeffs, y0, v0, a, c, eps_y, eps_v)


class OUCoeffs(NamedTuple):
    """Coefficients of the overdamped (Gamma -> inf) OU limit over time t.

    x_t = decay * x0 + k * C + noise_scale * eps
    (reference lanpaint.py:187-209).
    """

    decay: jax.Array
    k: jax.Array
    noise_scale: jax.Array


def ou_coeffs(a, d, t, eps: float = 1e-8) -> OUCoeffs:
    """Exact OU transition: dx = -A x dt + C dt + D dW."""
    a_dt = a * t
    decay = jnp.exp(-a_dt)
    small = jnp.abs(a) < eps
    k = jnp.where(small, t, -jnp.expm1(-a_dt) / jnp.where(small, 1.0, a))
    k2 = jnp.where(small, t, -jnp.expm1(-2.0 * a_dt) / jnp.where(small, 1.0, 2.0 * a))
    noise_scale = d * jnp.sqrt(jnp.maximum(k2, 0.0))
    return OUCoeffs(decay, k, noise_scale)


def ou_apply(coeffs: OUCoeffs, x0, c, eps):
    """Apply a precomputed OU transition with standard-normal noise `eps`."""
    return coeffs.decay * x0 + coeffs.k * c + coeffs.noise_scale * eps
