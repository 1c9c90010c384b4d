"""Solver-suite tests against analytic solutions.

For unit-Gaussian data the exact posterior denoiser is D(x, sigma) =
x / (1 + sigma^2); the probability-flow ODE then has the closed form
x(0) = x(sigma0) / sqrt(1 + sigma0^2), and any exact SDE/ancestral sampler
maps N(0, (1+sigma0^2) I) to N(0, I).  ODE solvers are checked against the
closed form (with order-appropriate tolerances), stochastic solvers against
the output marginal statistics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lanpaint_tpu import samplers
from lanpaint_tpu.sigmas import karras


def model(x, sigma, key):
    den = x / (1.0 + sigma**2)
    return den, x


SIGMA_MAX = 10.0
ODE_SOLVERS = {
    "euler": 0.05,
    "heun": 0.01,
    # heunpp2's public sigma-ratio weights (w_k = sigma/k*sigma0) put it
    # between Euler and Heun in accuracy on this ladder; exactness is
    # checked by the replay test below.
    "heunpp2": 0.05,
    "dpm_2": 0.01,
    "dpmpp_2m": 0.01,
    "res_multistep": 0.02,
    "gradient_estimation": 0.05,
    "deis": 0.01,
    "dpm_fast": 0.02,
}


@pytest.mark.parametrize("name,tol", sorted(ODE_SOLVERS.items()))
def test_ode_solver_matches_closed_form(name, tol, key):
    x0 = jax.random.normal(key, (2, 4, 8, 8), jnp.float32) * SIGMA_MAX
    sig = jnp.asarray(karras(30, 0.03, SIGMA_MAX), jnp.float32)
    out, den_all = jax.jit(
        lambda x: samplers.sample(model, x, sig, sampler=name, key=jax.random.PRNGKey(1))
    )(x0)
    want = np.asarray(x0) / np.sqrt(1 + SIGMA_MAX**2)
    err = np.abs(np.asarray(out) - want).max() / np.abs(want).max()
    assert err < tol, f"{name}: rel err {err:.4f}"
    if name != "dpm_fast":  # dpm_fast integrates on its own uniform-t grid
        assert den_all.shape[0] == 30


SDE_SOLVERS = [
    "euler_ancestral",
    "dpm_2_ancestral",
    "ddpm",
    "dpmpp_sde",
    "dpmpp_2m_sde",
    "dpmpp_3m_sde",
    "res_multistep_ancestral",
    "er_sde",
    "seeds_2",
    "seeds_3",
]


def test_seeds_eta0_deterministic_order(key):
    """With eta=0 SEEDS reduces to deterministic exponential RK; both stages
    must hit the closed form tightly (validates the drift coefficients
    independently of the noise path)."""
    import functools

    from lanpaint_tpu.samplers import _SOLVERS, _seeds_2, _seeds_3

    _SOLVERS["_seeds_2_ode"] = functools.partial(_seeds_2, eta=0.0)
    _SOLVERS["_seeds_3_ode"] = functools.partial(_seeds_3, eta=0.0)
    try:
        x0 = jax.random.normal(key, (1, 2, 8, 8), jnp.float32) * SIGMA_MAX
        sig = jnp.asarray(karras(30, 0.03, SIGMA_MAX), jnp.float32)
        want = np.asarray(x0) / np.sqrt(1 + SIGMA_MAX**2)
        for name, tol in [("_seeds_2_ode", 0.01), ("_seeds_3_ode", 0.01)]:
            out, _ = samplers.sample(model, x0, sig, sampler=name,
                                     key=jax.random.PRNGKey(3))
            err = np.abs(np.asarray(out) - want).max() / np.abs(want).max()
            assert err < tol, f"{name}: rel err {err:.5f}"
    finally:
        _SOLVERS.pop("_seeds_2_ode")
        _SOLVERS.pop("_seeds_3_ode")


@pytest.mark.parametrize("name", SDE_SOLVERS)
def test_sde_solver_output_statistics(name, key):
    n = (8, 4, 32, 32)  # 32768 samples
    x0 = jax.random.normal(key, n, jnp.float32) * np.sqrt(1 + SIGMA_MAX**2)
    sig = jnp.asarray(karras(50, 0.02, SIGMA_MAX), jnp.float32)
    out, _ = jax.jit(
        lambda x: samplers.sample(model, x, sig, sampler=name, key=jax.random.PRNGKey(2))
    )(x0)
    o = np.asarray(out)
    assert np.isfinite(o).all(), name
    assert abs(o.mean()) < 0.05, f"{name}: mean {o.mean():.4f}"
    np.testing.assert_allclose(o.std(), 1.0, rtol=0.08, err_msg=name)


def test_solver_uses_refined_x(key):
    """Solvers must continue from the x returned by the model (the
    functional equivalent of reference lanpaint.py:122's in-place copy)."""

    def refining_model(x, sigma, key):
        x_new = jnp.full_like(x, 7.0)
        return jnp.zeros_like(x), x_new

    x0 = jnp.ones((1, 2, 4, 4), jnp.float32)
    sig = jnp.asarray([1.0, 0.0], jnp.float32)
    out, _ = samplers.sample(refining_model, x0, sig, sampler="euler",
                             key=jax.random.PRNGKey(0))
    # euler: x = x_new + (x_new - 0)/1 * (0 - 1) = 7 - 7 = 0
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def _np_model(x, sigma):
    return x / (1.0 + sigma**2)


def test_heunpp2_matches_public_algorithm_replay(key):
    """Independent numpy replay of k-diffusion sample_heunpp2 (the
    1/2/3-stage branches with sigma-ratio weights) must match the scanned
    solver exactly (deterministic method)."""
    x0 = np.asarray(jax.random.normal(key, (1, 2, 6, 6), jnp.float32)) * SIGMA_MAX
    sig = np.asarray(karras(12, 0.03, SIGMA_MAX), np.float32)

    x = x0.copy()
    s_end = sig[-1]
    for i in range(len(sig) - 1):
        den = _np_model(x, sig[i])
        d = (x - den) / sig[i]
        dt = sig[i + 1] - sig[i]
        if sig[i + 1] == s_end:
            x = x + d * dt
        elif sig[i + 2] == s_end:
            x_2 = x + d * dt
            d_2 = (x_2 - _np_model(x_2, sig[i + 1])) / sig[i + 1]
            w2 = sig[i + 1] / (2 * sig[0])
            x = x + (d * (1 - w2) + d_2 * w2) * dt
        else:
            x_2 = x + d * dt
            d_2 = (x_2 - _np_model(x_2, sig[i + 1])) / sig[i + 1]
            x_3 = x_2 + d_2 * (sig[i + 2] - sig[i + 1])
            d_3 = (x_3 - _np_model(x_3, sig[i + 2])) / sig[i + 2]
            w2 = sig[i + 1] / (3 * sig[0])
            w3 = sig[i + 2] / (3 * sig[0])
            x = x + ((1 - w2 - w3) * d + w2 * d_2 + w3 * d_3) * dt

    out, _ = samplers.sample(model, jnp.asarray(x0), jnp.asarray(sig),
                             sampler="heunpp2", key=jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(out), x, rtol=2e-4, atol=1e-5)


def test_er_sde_drift_matches_public_algorithm_replay(key, monkeypatch):
    """Independent numpy replay of k-diffusion sample_er_sde (VE
    ER-SDE-Solver-3: stage selection min(3, i+1), 200-point quadratures,
    divided-difference history) must match the scanned solver with the
    noise injection stripped (s_noise = 0 equivalent)."""
    monkeypatch.setattr(samplers, "_noise_like",
                        lambda x, key: jnp.zeros_like(x))
    x0 = np.asarray(jax.random.normal(key, (1, 2, 6, 6), jnp.float32)) * SIGMA_MAX
    sig = np.asarray(karras(10, 0.03, SIGMA_MAX), np.float64)

    def psi(s):
        s = np.asarray(s, np.float64)
        return s * (np.exp(np.maximum(s, 1e-10) ** 0.3) + 10.0)

    x = x0.astype(np.float64)
    old_den, old_den_d = None, None
    pts = np.arange(200, dtype=np.float64)
    for i in range(len(sig) - 1):
        den = _np_model(x, sig[i])
        stage = min(3, i + 1)
        if sig[i + 1] == 0:
            x = den
        else:
            r = psi(sig[i + 1]) / psi(sig[i])
            x = r * x + (1 - r) * den
            if stage >= 2:
                dt = sig[i + 1] - sig[i]
                step_sz = -dt / 200.0
                sigma_pos = sig[i + 1] + pts * step_sz
                scaled_pos = psi(sigma_pos)
                s_int = np.sum(1.0 / scaled_pos) * step_sz
                den_d = (den - old_den) / (sig[i] - sig[i - 1])
                x = x + (dt + s_int * psi(sig[i + 1])) * den_d
                if stage >= 3:
                    s_u = np.sum((sigma_pos - sig[i]) / scaled_pos) * step_sz
                    den_u = (den_d - old_den_d) / ((sig[i] - sig[i - 2]) / 2)
                    x = x + (dt**2 / 2 + s_u * psi(sig[i + 1])) * den_u
                old_den_d = den_d
        old_den = den

    out, _ = samplers.sample(model, jnp.asarray(x0),
                             jnp.asarray(sig, jnp.float32),
                             sampler="er_sde", key=jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(out), x, rtol=5e-4, atol=5e-4)


def test_unknown_sampler_raises():
    with pytest.raises(ValueError, match="unknown sampler"):
        samplers.get_solver("nope")


def test_gpu_aliases_present():
    for n in ["dpmpp_sde_gpu", "dpmpp_2m_sde_gpu", "dpmpp_3m_sde_gpu"]:
        samplers.get_solver(n)


def test_single_model_instance_per_solver_step():
    """Structural invariant behind TPU compile time: every solver step must
    contain exactly ONE model call site (samplers._staged), because each
    instantiation of the model embeds the full LanPaint think loop + backbone
    in the compiled program (engine.py "one backbone instance per program";
    the r4 multi-call solvers carried 2-4 and compiled up to 2x slower —
    scripts/measure_solver_compile.py).  The model stand-in contains one
    lax.while_loop, so counting `while` primitives in the step jaxpr counts
    model instantiations."""
    import lanpaint_tpu.samplers as S

    from jax import lax

    def model(x, s, k):
        def body(c):
            i, xx = c
            return i + 1, xx * 0.9 + 0.01 * s

        _, out = lax.while_loop(lambda c: c[0] < 3, body, (0, x))
        return out, out * 0.99

    def count_whiles(jaxpr):
        n = 0
        for eqn in jaxpr.eqns:
            if eqn.primitive.name == "while":
                n += 1
            for v in eqn.params.values():
                if hasattr(v, "jaxpr"):  # ClosedJaxpr
                    n += count_whiles(v.jaxpr)
                elif isinstance(v, (list, tuple)):
                    for item in v:
                        if hasattr(item, "jaxpr"):
                            n += count_whiles(item.jaxpr)
        return n

    x = jnp.zeros((1, 4, 8, 8))
    key = jax.random.PRNGKey(0)
    for name in ["euler", "heun", "heunpp2", "dpm_2", "dpm_2_ancestral",
                 "dpmpp_sde", "seeds_2", "seeds_3", "dpmpp_2m",
                 "dpmpp_2m_sde", "er_sde", "res_multistep"]:
        fn = S.get_solver(name)
        c = S.init_carry(x)
        kw = ({"ctx": {"sigmas": jnp.asarray([1.0, 0.5, 0.25, 0.0])}}
              if getattr(fn, "needs_ctx", False) else {})
        jaxpr = jax.make_jaxpr(
            lambda c, s, sn: fn(model, c, s, sn, 0, key, **kw))(
            c, jnp.float32(1.0), jnp.float32(0.5))
        n = count_whiles(jaxpr.jaxpr)
        assert n == 1, f"{name}: {n} model instances in the step program"

    # dpm_fast assembles groups at the python level: one scanned 3-call
    # group body + at most one tail group + the final denoise = <= 3
    # instances for any ladder (was ~6 before _dpm2/_dpm3 used _staged)
    sig = jnp.asarray([14.0, 6.0, 2.4, 1.0, 0.5, 0.25, 0.1, 0.05, 0.0])
    jaxpr = jax.make_jaxpr(
        lambda x0: S.sample(model, x0, sig, sampler="dpm_fast", key=key)[0])(x)
    n = count_whiles(jaxpr.jaxpr)
    assert n <= 3, f"dpm_fast: {n} model instances"
