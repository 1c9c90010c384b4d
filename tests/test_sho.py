"""SHO exact-integrator validation.

The (y, q) process is a linear SDE:
    dy = q dt
    dq = (-Gamma*A*y + Gamma*C - Gamma*q) dt + Gamma*D dW
so its mean obeys m' = F m + u and its covariance P' = F P + P F^T + G G^T
with F = [[0, 1], [-Gamma*A, -Gamma]], u = [0, Gamma*C], G = [0, Gamma*D].
We integrate these moment ODEs with scipy at tight tolerance and require the
closed-form transition implied by `sho_coeffs` (mean map + Cholesky factor)
to match — a derivation-independent golden test the reference lacks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.integrate import solve_ivp

from lanpaint_tpu.ops.sho import ou_apply, ou_coeffs, sho_apply, sho_coeffs, sho_dynamics


def _moments_ode(gamma, a, c, d, t, y0, q0):
    """Integrate mean and covariance ODEs of the (y, q) linear SDE."""
    F = np.array([[0.0, 1.0], [-gamma * a, -gamma]])
    u = np.array([0.0, gamma * c])
    GGt = np.array([[0.0, 0.0], [0.0, (gamma * d) ** 2]])

    def rhs(_, s):
        m = s[:2]
        P = s[2:].reshape(2, 2)
        dm = F @ m + u
        dP = F @ P + P @ F.T + GGt
        return np.concatenate([dm, dP.ravel()])

    s0 = np.concatenate([[y0, q0], np.zeros(4)])
    sol = solve_ivp(rhs, (0.0, t), s0, rtol=1e-10, atol=1e-12, method="LSODA")
    m = sol.y[:2, -1]
    P = sol.y[2:, -1].reshape(2, 2)
    return m, P


CASES = [
    # (gamma, a, c, d, t) spanning overdamped (Delta>0), critical, oscillatory
    (20.0, 1.0, 0.7, np.sqrt(2.0), 0.3),
    (4.0, 1.0, -0.5, np.sqrt(2.0), 0.5),   # Delta = 0 exactly
    (1.0, 5.0, 0.2, 1.0, 0.8),             # Delta < 0 (oscillatory)
    (200.0, 3.0, 0.0, np.sqrt(2.0), 0.05), # stiff / near-overdamped
    (15.0**2 * 0.2 / 0.1 / 2, 1.0 / 0.3, 0.1, np.sqrt(2.0), 0.2 * 0.3),  # LanPaint defaults
]


@pytest.mark.parametrize("gamma,a,c,d,t", CASES)
def test_sho_transition_matches_moment_odes(gamma, a, c, d, t):
    y0, q0 = 1.3, -0.4
    v0 = q0 / np.sqrt(gamma)
    m, P = _moments_ode(gamma, a, c, d, t, y0, q0)

    with jax.enable_x64():
        coef = sho_coeffs(
            jnp.float64(gamma), jnp.float64(a), jnp.float64(d), jnp.float64(t)
        )
        y_mean, v_mean = sho_apply(
            coef, jnp.float64(y0), jnp.float64(v0), jnp.float64(a),
            jnp.float64(c), jnp.float64(0.0), jnp.float64(0.0),
        )
        # Covariance from the Cholesky factor: cov = L @ L.T (in (y, v) coords).
        L = np.array([[float(coef.l_yy), 0.0], [float(coef.l_vy), float(coef.l_vv)]])
    cov = L @ L.T

    # scipy moments are in (y, q); convert to (y, v): v = q / sqrt(gamma).
    sg = np.sqrt(gamma)
    np.testing.assert_allclose(float(y_mean), m[0], rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(float(v_mean), m[1] / sg, rtol=1e-6, atol=1e-9)
    P_yv = np.array([[P[0, 0], P[0, 1] / sg], [P[0, 1] / sg, P[1, 1] / gamma]])
    # The integrator drops the sign of cov_yv (it squares zeta2,
    # reference utils.py:264); |cov_yv| still matches and the marginals are
    # exact.  Compare magnitudes, and diagonals exactly.
    np.testing.assert_allclose(cov[0, 0], P_yv[0, 0], rtol=5e-5, atol=1e-8)
    np.testing.assert_allclose(cov[1, 1], P_yv[1, 1], rtol=5e-5, atol=1e-8)
    np.testing.assert_allclose(abs(cov[1, 0]), abs(P_yv[1, 0]), rtol=5e-4, atol=1e-7)


def test_sho_sampling_statistics(key):
    gamma, a, c, d, t = 20.0, 1.0, 0.7, np.sqrt(2.0), 0.3
    n = 400_000
    y0 = jnp.full((n,), 1.3, jnp.float32)
    v0 = jnp.full((n,), -0.1, jnp.float32)
    y, v = jax.jit(sho_dynamics, static_argnames=())(
        y0, v0, jnp.float32(t), jnp.float32(gamma), jnp.float32(a),
        jnp.float32(c), jnp.float32(d), key,
    )
    coef = sho_coeffs(jnp.float32(gamma), jnp.float32(a), jnp.float32(d), jnp.float32(t))
    ym, vm = sho_apply(coef, 1.3, -0.1, a, c, 0.0, 0.0)
    # 5-sigma bounds on the MC error of the mean.
    se_y = float(coef.l_yy) / np.sqrt(n)
    se_v = float(np.hypot(coef.l_vy, coef.l_vv)) / np.sqrt(n)
    assert abs(float(jnp.mean(y)) - float(ym)) < 5 * se_y
    assert abs(float(jnp.mean(v)) - float(vm)) < 5 * se_v
    np.testing.assert_allclose(float(jnp.std(y)), float(coef.l_yy), rtol=2e-2)
    cov_yv = float(jnp.mean((y - jnp.mean(y)) * (v - jnp.mean(v))))
    np.testing.assert_allclose(cov_yv, float(coef.l_yy * coef.l_vy), rtol=5e-2, atol=1e-4)


def test_sho_v0_none_draws_stationary_velocity(key):
    # v0=None must initialize v ~ N(0, D^2/2) and still produce finite output.
    y0 = jnp.zeros((1000,), jnp.float32)
    y, v = sho_dynamics(y0, None, 0.2, 30.0, 1.0, 0.0, jnp.sqrt(2.0), key)
    assert bool(jnp.all(jnp.isfinite(y))) and bool(jnp.all(jnp.isfinite(v)))


def test_ou_transition_exact():
    # OU: x_t = e^{-At} x0 + C(1-e^{-At})/A + noise, var = D^2 (1-e^{-2At})/(2A)
    a, c, d, t = 3.0, 0.5, 1.2, 0.4
    co = ou_coeffs(jnp.float32(a), jnp.float32(d), jnp.float32(t))
    x = ou_apply(co, jnp.float32(2.0), jnp.float32(c), jnp.float32(0.0))
    want = np.exp(-a * t) * 2.0 + c * (1 - np.exp(-a * t)) / a
    np.testing.assert_allclose(float(x), want, rtol=1e-5)
    want_sd = d * np.sqrt((1 - np.exp(-2 * a * t)) / (2 * a))
    np.testing.assert_allclose(float(co.noise_scale), want_sd, rtol=1e-5)


def test_ou_a_to_zero_limit():
    co = ou_coeffs(jnp.float32(0.0), jnp.float32(1.0), jnp.float32(0.7))
    np.testing.assert_allclose(float(co.k), 0.7, rtol=1e-6)
    np.testing.assert_allclose(float(co.noise_scale), np.sqrt(0.7), rtol=1e-6)
    np.testing.assert_allclose(float(co.decay), 1.0, rtol=1e-6)


def test_sho_large_gamma_approaches_overdamped():
    # For Gamma >> A the y-marginal of the SHO transition approaches the OU
    # transition with the same (A, C, D).
    a, c, d, t = 1.0, 0.3, np.sqrt(2.0), 0.5
    gamma = 1e5
    with jax.enable_x64():
        coef = sho_coeffs(jnp.float64(gamma), jnp.float64(a), jnp.float64(d), jnp.float64(t))
        y, _ = sho_apply(coef, jnp.float64(1.0), jnp.float64(0.0), jnp.float64(a),
                         jnp.float64(c), jnp.float64(0.0), jnp.float64(0.0))
        co = ou_coeffs(jnp.float64(a), jnp.float64(d), jnp.float64(t))
        x = ou_apply(co, jnp.float64(1.0), jnp.float64(c), jnp.float64(0.0))
    np.testing.assert_allclose(float(y), float(x), rtol=1e-3)
    np.testing.assert_allclose(float(coef.l_yy), float(co.noise_scale), rtol=1e-3)
