"""Independent-replay parity test for the think-loop engine.

Reconstructs the LanPaint inner-step math in straight-line numpy — with SHO
transition mean/covariance obtained from scipy integration of the moment ODEs
(NOT from lanpaint_tpu.ops.stable) and the exact same standard-normal draws
the engine consumes (regenerated from the documented key tree, docs/rng.md) —
and requires the engine's refined latent to match step-for-step.

This is the strongest correctness statement available offline: every piece of
the update (region mixing, step-size/friction parameterization, bidirectional
score, C drift, half-step/kick/half-step splitting, RNG threading) is
validated against an implementation that shares no code with the engine's
coefficient path.  (Seed-for-seed parity vs. the torch reference is
impossible by construction — it uses torch global RNG; see docs/rng.md.)
"""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.integrate import solve_ivp

from lanpaint_tpu.config import LanPaintConfig, ModelKind
from lanpaint_tpu.engine import lanpaint_update
from lanpaint_tpu.schedule import unify_times

LAMB = 16.0
STEP = 0.2
BETA = 1.0
FRICTION = 15.0


def sho_transition_scipy(gamma, a, d, t):
    """Exact (mean-map, cholesky) of the SHO step via moment-ODE integration.

    Returns coefficients of: y' = y + wy_cy*(C - A y) + wy_v * v + L @ eps.
    """
    F = np.array([[0.0, 1.0], [-gamma * a, -gamma]])
    GGt = np.array([[0.0, 0.0], [0.0, (gamma * d) ** 2]])

    def rhs(_, s):
        M = s[:4].reshape(2, 2)       # fundamental matrix dM/dt = F M
        P = s[4:].reshape(2, 2)
        return np.concatenate([(F @ M).ravel(), (F @ P + P @ F.T + GGt).ravel()])

    s0 = np.concatenate([np.eye(2).ravel(), np.zeros(4)])
    sol = solve_ivp(rhs, (0, t), s0, rtol=1e-12, atol=1e-14, method="LSODA")
    M = sol.y[:4, -1].reshape(2, 2)
    P = sol.y[4:, -1].reshape(2, 2)
    # particular solution for constant forcing u = [0, gamma*C]:
    # y_p = int_0^t M(t-s) u ds; for C=1: k = int M ds @ [0, gamma]
    solk = solve_ivp(
        lambda _, s: np.concatenate([(F @ s[:4].reshape(2, 2)).ravel()]),
        (0, t), np.eye(2).ravel(), rtol=1e-12, atol=1e-14, dense_output=True,
        method="LSODA",
    )
    import scipy.integrate as si

    kvec = np.array([
        si.quad(lambda s: solk.sol(s).reshape(2, 2)[i, 1] * gamma, 0, t,
                epsabs=1e-13, epsrel=1e-12)[0]
        for i in range(2)
    ])
    sg = np.sqrt(gamma)
    # convert (y, q) to (y, v): v = q/sqrt(gamma)
    conv = np.diag([1.0, 1.0 / sg])
    M_yv = conv @ M @ np.linalg.inv(conv)
    P_yv = conv @ P @ conv.T
    k_yv = conv @ kvec
    # engine parameterization: drive = C - A*y
    #   y_mean = M00 y + M01 v + k0 C  ==  y + wy_cy (C - A y) + wy_v v
    # holds exactly because M00 = 1 - A*k0_int... verify numerically instead:
    wy_cy, wy_v = k_yv[0], M_yv[0, 1]
    wv_cy, wv_v = k_yv[1], M_yv[1, 1]
    # consistency of the drive-form rewrite
    assert abs((1 - wy_cy * a) - M_yv[0, 0]) < 1e-6
    assert abs((-wv_cy * a) - M_yv[1, 0]) < 1e-6
    L = np.linalg.cholesky(P_yv + 1e-16 * np.eye(2))
    return (wy_cy, wy_v, wv_cy, wv_v), L


def test_engine_matches_independent_numpy_replay(key):
    shape = (1, 1, 4, 4)
    sigma = jnp.ones((1,), jnp.float32)       # abt = 0.5
    n_steps = 3
    cfg = LanPaintConfig(n_steps=n_steps, lamb=LAMB, step_size=STEP,
                         beta=BETA, friction=FRICTION)
    times = unify_times(sigma, ModelKind.EPS)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape), jnp.float32)
    latent = jnp.asarray(rng.normal(size=shape), jnp.float32)
    noise = jnp.asarray(rng.normal(size=shape), jnp.float32)
    mask_np = np.zeros(shape, np.float32)
    mask_np[..., :2] = 1.0                     # left half known
    mask = jnp.asarray(mask_np)

    def denoiser(xm, t):                       # exact N(0,I)-prior denoiser
        tb = t.reshape((-1, 1, 1, 1))
        x0 = xm / (1.0 + tb**2)
        return x0, x0

    out, x_ref, aux = lanpaint_update(
        denoiser, x, latent_image=latent, noise=noise, latent_mask=mask,
        sigma=sigma, times=times, n_steps=jnp.int32(n_steps), config=cfg,
        kind=ModelKind.EPS, key=key,
    )

    # ---------------- independent numpy replay ----------------
    abt = 0.5
    ve_sigma = 1.0
    xn = np.asarray(x, np.float64)
    lat = np.asarray(latent, np.float64)
    nz = np.asarray(noise, np.float64)
    m = mask_np.astype(np.float64)

    # replace step + VP transform (reference lanpaint.py:55-65)
    xn = xn * (1 - m) + (lat + ve_sigma * nz) * m
    x_t = xn / np.sqrt(1 + ve_sigma**2)

    # per-region parameters (reference lanpaint.py:255-288)
    step_eff = STEP * (1 - abt)
    dt_x, dt_y = step_eff * 1.0, step_eff * BETA
    gam_hat = FRICTION**2 * STEP / 0.1 / 2.0
    gamma_x, gamma_y = gam_hat / dt_x, gam_hat * BETA / dt_y
    a_x, a_y = 1 / (1 - abt), (1 + LAMB) / (1 - abt)
    D = np.sqrt(2.0)

    co_half_x = sho_transition_scipy(gamma_x, a_x, D, dt_x / 2)
    co_half_y = sho_transition_scipy(gamma_y, a_y, D, dt_y / 2)
    co_full_x = sho_transition_scipy(gamma_x, a_x, D, dt_x)
    co_full_y = sho_transition_scipy(gamma_y, a_y, D, dt_y)

    def mix(cx, cy):
        return cx * (1 - m) + cy * m

    A = mix(a_x, a_y)
    DT = mix(dt_x, dt_y)
    SG_DT = mix(np.sqrt(gamma_x) * dt_x, np.sqrt(gamma_y) * dt_y)

    def apply_sho(co_x, co_y, y0, v0, c, ey, ev):
        (wy_cy_x, wy_v_x, wv_cy_x, wv_v_x), Lx = co_x
        (wy_cy_y, wy_v_y, wv_cy_y, wv_v_y), Ly = co_y
        drive = c - A * y0
        y = y0 + mix(wy_cy_x, wy_cy_y) * drive + mix(wy_v_x, wy_v_y) * v0 \
            + mix(Lx[0, 0], Ly[0, 0]) * ey
        v = mix(wv_cy_x, wv_cy_y) * drive + mix(wv_v_x, wv_v_y) * v0 \
            + mix(Lx[1, 0], Ly[1, 0]) * ey + mix(Lx[1, 1], Ly[1, 1]) * ev
        return y, v

    def model_c(x_eval):
        x_model = x_eval * np.sqrt(1 + ve_sigma**2)
        x0 = x_model / (1 + ve_sigma**2)
        score_x = -(x_eval - x0)
        score_y = -(1 + LAMB) * (x_eval - lat) + LAMB * (x_eval - x0)
        score = score_x * (1 - m) + score_y * m
        x0_eff = x_eval + score
        c = (np.sqrt(abt) * x0_eff - x_eval) / (1 - abt) + A * x_eval
        return c, x0_eff

    # regenerate the engine's exact normal draws (docs/rng.md key tree)
    _, k_loop = jax.random.split(key)
    v = np.zeros_like(x_t)
    c_old = np.zeros_like(x_t)
    for j in range(n_steps):
        k_j = jax.random.fold_in(k_loop, j)
        ks = jax.random.split(k_j, 5)
        ey1, ev1, ey2, ev2, ev0 = [
            np.asarray(jax.random.normal(k, shape, jnp.float32), np.float64)
            for k in ks
        ]
        v_stat = ev0 * D / np.sqrt(2.0)
        if j == 0:
            c_new, _ = model_c(x_t)
            x_t, v = apply_sho(co_full_x, co_full_y, x_t, v_stat, c_new, ey1, ev1)
        else:
            xh, vh = apply_sho(co_half_x, co_half_y, x_t, v, c_old, ey1, ev1)
            c_new, _ = model_c(xh)
            vk = vh + SG_DT * (c_new - c_old)
            x_t, v = apply_sho(co_half_x, co_half_y, xh, vk, c_old, ey2, ev2)
        c_old = c_new

    x_replay = x_t * np.sqrt(1 + ve_sigma**2)   # VP -> native

    np.testing.assert_allclose(
        np.asarray(x_ref, np.float64), x_replay, rtol=5e-4, atol=5e-4,
        err_msg="engine diverged from independent numpy replay",
    )
